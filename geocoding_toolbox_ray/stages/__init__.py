"""Batch-transform stages (map_batches bodies) for Dataset pipelines."""
