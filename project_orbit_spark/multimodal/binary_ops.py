"""Multimodal binary plumbing — filled in batch 5."""
