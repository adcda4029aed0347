"""Structured Streaming surface.

The reference is pure batch (SURVEY §2.10); its natural streaming seam
is JSONL review ingestion, implemented here as a file-source stream
with watermarked dedup and windowed aggregation."""
