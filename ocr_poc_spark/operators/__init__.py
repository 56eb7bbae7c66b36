"""Spark operator library: parse stage, relational cascade, dedup,
similarity search, text stats, multimodal plumbing."""
