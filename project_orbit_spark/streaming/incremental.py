"""Incremental change detection — filled in batch 4."""
