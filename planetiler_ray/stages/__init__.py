"""Batch transform stages (map_batches bodies + actor-pool classes)."""
