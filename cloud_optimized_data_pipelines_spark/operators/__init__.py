"""Pipeline operators: routing, transfer, STAC assembly, dedup,
similarity search, multimodal processing."""
