"""Data layer: one-time ingest of perception pickles into dense arrays,
array-native batching, annotation parsing, and synthetic fixtures."""
