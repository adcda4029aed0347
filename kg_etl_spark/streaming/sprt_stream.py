"""Streaming SPRT monitor — the structured-streaming twin of the
batch `sprt_conversion` catalog query (queries/analytic.py): Wald's
sequential test evaluated at every micro-batch commit, with the
decision STICKY once a boundary is crossed (the defining property of
a sequential test — you stop at the first crossing, later data never
un-decides it).

State is one (n_obs, n_treat, first_cross_batch, decision) row kept in
the same versioned-parquet scheme as `rollup_stream` (v=<batch_id>
directories, atomic rename, replay of batch N merges against the
version strictly below N — idempotent under checkpoint replay).  The
totals merge is additive, so state cost is O(1) per batch regardless
of history; the crossing check is one driver-side expression on the
merged totals.

Batch-grain semantics: the monitor checks the boundary at batch
commits (the deployable cadence — a per-event first-crossing index
needs the batch's internal order, which the BATCH query computes
exactly via the rank devices; stream and batch agree whenever the
crossing lands on a batch boundary, which the parity test pins).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from kg_etl_spark.streaming.rollup_stream import _VERSION_PREFIX, _latest_version

# identical pre-rounded literals as the batch query: ln(1.1), ln(0.9),
# ln(19) at 6dp — no runtime ln, no JVM-vs-libm ulp drift
SPRT_C1, SPRT_C0, SPRT_THRESH = 0.09531, -0.105361, 2.944439

_SCHEMA = (
    "n_obs long, n_treat long, first_cross_batch long, decision string"
)


def _llr(n_obs: int, n_treat: int) -> float:
    return n_treat * SPRT_C1 + (n_obs - n_treat) * SPRT_C0


def sprt_upsert_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    state_root: str,
    keep_versions: int = 3,
) -> None:
    """One versioned state step: totals += batch's (purchases, treated);
    if no decision yet and |LLR(totals)| crosses the boundary, record
    (batch_id, decision) — sticky thereafter."""
    part = (
        batch_df.filter(F.col("event_type") == "purchase")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.pmod(F.col("user_id"), F.lit(2))).cast("long").alias("t"),
        )
        .collect()[0]
    )
    dn, dt = int(part["n"] or 0), int(part["t"] or 0)
    prev_v = _latest_version(state_root, below=int(batch_id))
    if prev_v is not None:
        prev = spark.read.parquet(
            f"{state_root}/{_VERSION_PREFIX}{prev_v}"
        ).collect()[0]
        n_obs, n_treat = prev["n_obs"] + dn, prev["n_treat"] + dt
        cross, decision = prev["first_cross_batch"], prev["decision"]
    else:
        n_obs, n_treat = dn, dt
        cross, decision = 0, "continue"
    if decision == "continue" and n_obs > 0:
        llr = _llr(n_obs, n_treat)
        if abs(llr) >= SPRT_THRESH:
            cross = int(batch_id)
            decision = "accept_h1" if llr > 0 else "accept_h0"
    merged = spark.createDataFrame(
        [Row(n_obs=n_obs, n_treat=n_treat, first_cross_batch=cross,
             decision=decision)],
        _SCHEMA,
    )
    os.makedirs(state_root, exist_ok=True)
    tmp = f"{state_root}/.tmp-{_VERSION_PREFIX}{int(batch_id)}"
    final = f"{state_root}/{_VERSION_PREFIX}{int(batch_id)}"
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.isdir(final):
        shutil.rmtree(final)  # checkpoint replay of the same batch
    os.rename(tmp, final)
    versions = sorted(
        int(d[len(_VERSION_PREFIX):])
        for d in os.listdir(state_root)
        if d.startswith(_VERSION_PREFIX)
    )
    keep = set(versions[-keep_versions:])
    if prev_v is not None:
        keep.add(prev_v)
    for v in versions:
        if v not in keep:
            shutil.rmtree(f"{state_root}/{_VERSION_PREFIX}{v}",
                          ignore_errors=True)


def sprt_stream(
    events: DataFrame,
    state_root: str,
    checkpoint_dir: str,
):
    """Start the monitor (availableNow-compatible)."""
    spark = events.sparkSession

    def body(batch_df: DataFrame, batch_id: int) -> None:
        sprt_upsert_batch(spark, batch_df, batch_id, state_root)

    return (
        events.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def sprt_state_decision(spark: SparkSession, state_root: str) -> DataFrame:
    """Serve the latest committed monitor state as a 1-row frame with
    the final LLR attached (same rounding as the batch query)."""
    v = _latest_version(state_root)
    if v is None:
        raise ValueError(f"no committed SPRT state under {state_root}")
    st = spark.read.parquet(f"{state_root}/{_VERSION_PREFIX}{v}")
    final_llr = F.col("n_treat").cast("double") * F.lit(SPRT_C1) + (
        F.col("n_obs") - F.col("n_treat")
    ).cast("double") * F.lit(SPRT_C0)
    return st.select(
        "n_obs",
        "n_treat",
        F.round(final_llr, 6).alias("final_llr"),
        "first_cross_batch",
        "decision",
    )
