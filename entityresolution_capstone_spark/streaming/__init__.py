"""Structured-streaming ingest for transcript turns."""
