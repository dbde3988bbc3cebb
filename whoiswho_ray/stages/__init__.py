"""Ray Data pipeline stages (map_batches / groupby building blocks)."""
