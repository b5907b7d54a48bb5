"""Sinks: gzip NDJSON batches + Markdown run report."""
