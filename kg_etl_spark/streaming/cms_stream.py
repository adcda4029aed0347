"""Streaming Count-Min heavy-hitter maintenance: per micro-batch CMS
cells merged into the versioned on-disk state — the sketch-maintenance
pattern next to rollup_stream (mergeable rollups) and the incremental
MinHash-LSH index.

Why it scales: the per-batch partial is the batch's CMS cell grid —
d·w cells REGARDLESS of batch size (map-side combined) — and the merge
is cell-wise addition against the previous version, so stream state
and per-batch shuffle are both O(d·w). Exactness of the maintenance:
CMS cells are linear (cnt(A ∪ B) = cnt(A) + cnt(B) per cell), so the
streamed sketch is BIT-IDENTICAL to a batch sketch over the union of
all rows — asserted in tests. Crash/replay safety, version pruning and
checkpoint-ownership guarding are inherited from
rollup_stream.upsert_rollup_batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kg_etl_spark.operators.sketches import _CMS_A, _CMS_B, _h32, cms_build
from kg_etl_spark.streaming.rollup_stream import (
    read_rollup_state,
    upsert_rollup_batch,
)


def cms_upsert_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    key_col: str,
    state_root: str,
    ckpt_key: str,
    d: int = 4,
    w: int = 256,
) -> None:
    """foreachBatch body: batch rows → d·w-cell partial → versioned
    cell-wise merge (sum_v carries the count)."""
    cells = cms_build(batch_df, key_col, d=d, w=w)
    upsert_rollup_batch(
        spark,
        cells,
        batch_id,
        keys=["row", "bucket"],
        value_col="cnt",
        state_root=state_root,
        ckpt_key=ckpt_key,
    )


def cms_stream(
    events: DataFrame,
    key_col: str,
    state_root: str,
    checkpoint_dir: str,
    d: int = 4,
    w: int = 256,
):
    """Start the maintenance stream (availableNow-compatible)."""
    spark = events.sparkSession

    def body(batch_df: DataFrame, batch_id: int) -> None:
        cms_upsert_batch(
            spark, batch_df, batch_id, key_col, state_root, checkpoint_dir, d=d, w=w
        )

    return (
        events.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def cms_state_estimate(
    spark: SparkSession,
    state_root: str,
    keys: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """Point-query the MAINTAINED sketch (min over the d rows of the
    state's cell counts) — the serving side; broadcast state, never a
    raw-history scan."""
    state = read_rollup_state(spark, state_root)
    if state is None:
        raise ValueError(f"no committed CMS state under {state_root}")
    cells = state.select(
        "row", "bucket", F.col("sum_v").cast("long").alias("cnt")
    )
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        F.pmod(
                            _h32(F.col(key_col), _CMS_A[j], _CMS_B[j]), F.lit(w)
                        ).alias("bucket"),
                    )
                    for j in range(d)
                ]
            )
        ).alias("_rb"),
    ).select(key_col, "_rb.row", "_rb.bucket")
    return (
        probes.join(F.broadcast(cells), ["row", "bucket"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("cms_estimate"))
    )
