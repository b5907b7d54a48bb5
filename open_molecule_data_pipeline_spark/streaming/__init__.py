"""Structured Streaming jobs: incremental ingestion + event-time analytics."""
