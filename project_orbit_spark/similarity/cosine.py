"""Cosine similarity & ANN — filled in batch 3."""
