"""Streaming review ingestion (the §2.10 seam): JSONL file source →
dedup on review_id → watermarked windowed counts per place.

Batch and streaming share the same transformation functions — the
DataFrame code is identical; only read/write change. Use
`trigger(availableNow=True)` for batch-like draining in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

STREAM_SCHEMA = T.StructType([
    T.StructField("review_id", T.StringType(), False),
    T.StructField("place_id", T.StringType()),
    T.StructField("rating", T.DoubleType()),
    T.StructField("text", T.StringType()),
    T.StructField("event_time", T.TimestampType()),
])


def read_review_stream(spark: SparkSession, path: str) -> DataFrame:
    return spark.readStream.schema(STREAM_SCHEMA).json(path)


def dedup_reviews(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once-per-review within the watermark horizon: state is
    bounded (old review_ids age out) — the scalable form of the
    reference's in-memory `seen` sets.

    Keyed on review_id ALONE: a re-arrival with a different event_time
    is still the same review and must be dropped.
    ``dropDuplicatesWithinWatermark`` evicts state by watermark without
    needing the event-time column in the dedup key."""
    return stream.withWatermark("event_time", watermark).dropDuplicatesWithinWatermark(
        ["review_id"]
    )


def windowed_place_counts(stream: DataFrame, window: str = "10 minutes") -> DataFrame:
    """Tumbling-window review counts + mean rating per place; late data
    handled by the watermark."""
    return (
        stream.groupBy(F.window("event_time", window).alias("w"), F.col("place_id"))
        .agg(
            F.count(F.lit(1)).alias("n_reviews"),
            F.avg("rating").alias("avg_rating"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "place_id",
            "n_reviews",
            "avg_rating",
        )
    )


def run_to_sink(
    windowed: DataFrame, out_path: str, checkpoint: str, available_now: bool = True
):
    """Drain the stream to parquet (append mode) with checkpointing."""
    q = (
        windowed.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        q = q.trigger(availableNow=True)
    return q.start()
