"""Sources & sinks: CSV (with repair pre-pass), JSONL, SQLite ingest,
MediaWiki XML listings parser — the reference's S1–S12 scan surface,
Spark-native."""
