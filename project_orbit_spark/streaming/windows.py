"""Event-time windows — filled in batch 4."""
