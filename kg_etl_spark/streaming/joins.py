"""Stream-stream interval join: click attribution (§2.10 beyond-parity,
like the rest of the streaming family).

Impressions and clicks arrive as independent streams; a click is
attributed to an impression for the same user if it lands within
``max_delay`` after the impression. The event-time range predicate +
watermarks on BOTH sides is what lets Spark bound the join state: each
side's buffered rows are dropped once the other side's watermark passes
the end of their join window — state ∝ traffic within the delay
horizon, not history. The same expression tree runs as a plain batch
join (tests assert parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMPRESSION_SCHEMA = T.StructType([
    T.StructField("imp_id", T.LongType(), False),
    T.StructField("user_id", T.LongType()),
    T.StructField("campaign", T.StringType()),
    T.StructField("imp_time", T.TimestampType()),
])

CLICK_SCHEMA = T.StructType([
    T.StructField("click_id", T.LongType(), False),
    T.StructField("user_id", T.LongType()),
    T.StructField("click_time", T.TimestampType()),
])


def read_impression_stream(spark: SparkSession, path: str) -> DataFrame:
    return spark.readStream.schema(IMPRESSION_SCHEMA).json(path)


def read_click_stream(spark: SparkSession, path: str) -> DataFrame:
    return spark.readStream.schema(CLICK_SCHEMA).json(path)


def attribute_clicks(
    impressions: DataFrame,
    clicks: DataFrame,
    max_delay: str = "30 minutes",
    imp_watermark: str = "1 hour",
    click_watermark: str = "2 hours",
) -> DataFrame:
    """Inner interval join: (imp_id, campaign, user_id, click_id,
    delay_s). Works identically on batch DataFrames (no watermark
    applied there by Spark; the range predicate alone defines the
    semantics)."""
    imp = impressions
    clk = clicks.withColumnRenamed("user_id", "click_user")
    if impressions.isStreaming:
        imp = imp.withWatermark("imp_time", imp_watermark)
        clk = clk.withWatermark("click_time", click_watermark)
    cond = (
        (F.col("click_user") == F.col("user_id"))
        & (F.col("click_time") >= F.col("imp_time"))
        & (F.col("click_time") <= F.col("imp_time") + F.expr(f"INTERVAL {max_delay}"))
    )
    return imp.join(clk, cond).select(
        "imp_id",
        "campaign",
        "user_id",
        "click_id",
        (F.unix_timestamp("click_time") - F.unix_timestamp("imp_time")).alias("delay_s"),
    )
