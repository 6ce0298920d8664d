"""Discovery sources: inventory scans, CMR catalog, config tables."""
