"""Streaming sketch maintenance: HLL registers are MAX-mergeable, so
Spark's native streaming max-aggregate IS the sketch-update operator —
no custom state, no Python. Each micro-batch folds its rows into the
(group, register) maxima; the finalize runs over the (tiny) register
table whenever an estimate is needed.

This is the 100-TB shape for "distinct users per key, live": state is
O(groups × m) regardless of stream volume, and the same register
stream unions across shards/clusters by another max."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kg_etl_spark.operators.sketches import hll_rho_projection


def hll_register_stream(
    events: DataFrame, group_col: str = "event_type", key_col: str = "user_id", m: int = 64
) -> DataFrame:
    """(group, reg, mx) streaming aggregate — complete/update-mode
    compatible (max is commutative + idempotent, so replays and late
    data can only re-assert, never corrupt)."""
    return (
        hll_rho_projection(events, group_col, key_col, m=m)
        .groupBy(group_col, "reg")
        .agg(F.max("rho").alias("mx"))
    )
