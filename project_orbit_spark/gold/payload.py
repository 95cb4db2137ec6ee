"""Gold-layer assembly — filled in batch 5."""
