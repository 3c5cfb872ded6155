"""End-to-end Ray Data pipelines (the Planetiler-equivalent build flows)."""
