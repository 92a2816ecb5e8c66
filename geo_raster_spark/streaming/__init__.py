"""Structured Streaming: incremental ingest of the images table."""
