"""Text quality / language-ID / fingerprinting — filled in batch 2."""
