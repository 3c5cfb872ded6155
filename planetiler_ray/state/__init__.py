"""Cross-stage state helpers: broadcast handles, progress counters, lineage."""
