"""Custom stateful streaming operator via applyInPandasWithState:
running per-user session aggregates over an event stream.

This is the streaming form of the batch `sessionize` query: state per
user (event count, value sum, last event time) survives across
micro-batches; an idle-timeout closes the session and evicts state, so
memory is bounded by *active* users — the scalable replacement for any
driver-side dict of sessions.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("ts", T.TimestampType()),
])

SESSION_OUTPUT = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
    T.StructField("closed", T.BooleanType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
])


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    return spark.readStream.schema(EVENT_SCHEMA).json(path)


def windowed_event_agg(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of the batch `hourly_event_agg` query: tumbling
    per-(window, event_type) counts and value sums with late data
    handled by the watermark. The SAME groupBy/agg expression tree as
    the batch plan — readStream/writeStream are the only difference,
    which is the whole §2.10 argument: one declarative definition, two
    execution modes."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(28,6)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("hour_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize_stateful(
    events: DataFrame, idle_timeout_ms: int = 30_000
) -> DataFrame:
    """Per-user running session aggregate; emits an updated row per
    user per micro-batch, and a final `closed=true` row when the idle
    timeout fires (state evicted)."""

    def update(
        key: tuple[Any, ...], batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            n, total = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, n, total, True)],
                columns=["user_id", "n_events", "total_value", "closed"],
            )
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            [(user_id, n, total, False)],
            columns=["user_id", "n_events", "total_value", "closed"],
        )

    return events.groupBy(F.col("user_id")).applyInPandasWithState(
        update,
        outputStructType=SESSION_OUTPUT,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def session_window_agg(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native session windows (Spark's `session_window` dynamic-gap
    windowing): events of a user group into one session while
    consecutive gaps stay under `gap`; the watermark closes and evicts
    sessions whose end precedes it. This is the declarative twin of
    `sessionize_stateful` — same semantics for the common case, no
    Python in the loop, state handled by the built-in streaming
    session-window operator (mergeable partial sessions, so map-side
    partials apply before the keyed shuffle).

    Works identically over a batch frame (parity-tested), which is the
    §2.10 argument again: one expression tree, two execution modes.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.col("user_id"), F.session_window("ts", gap).alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(28,6)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start")).alias("session_start_us"),
            F.unix_micros(F.col("sw.end")).alias("session_end_us"),
            "n_events",
            "sum_value",
        )
    )


def sliding_window_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window (overlapping) per-type counts — the trending-
    topics shape: each event contributes to window/slide overlapping
    windows (Spark expands it map-side into that many window rows; no
    extra shuffle vs tumbling). Emits (win_start_us, event_type,
    n_events, sum_value); ranking the top type per window is a
    downstream batch/foreachBatch concern, kept out of the stream so
    the state store holds only the running aggregates."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window, slide).alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(28,6)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("win_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
