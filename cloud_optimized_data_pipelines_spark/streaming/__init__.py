"""Streaming / resumable pipeline mode (SURVEY section 2.8)."""
