"""Structured-Streaming wrappers for incremental ingest."""
