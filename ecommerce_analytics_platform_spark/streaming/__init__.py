"""Structured Streaming ingest (SURVEY §2.8)."""
