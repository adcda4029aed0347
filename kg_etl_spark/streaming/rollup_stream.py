"""Streaming refresh of a materialized rollup: each micro-batch's
partial aggregate is merged into the persisted state via
`operators.incremental` — the streaming twin of the batch
`incremental_rollup` catalog query.

foreachBatch (not a streaming agg) because the state is an external
parquet table other readers query between refreshes. Exactly-once comes
from the checkpoint: a replayed batch re-merges into the PREVIOUS
state version, not on top of its own earlier merge — versioned state
directories keyed by batch id make the swap atomic and idempotent
(re-running batch N overwrites version N, never double-counts).

At 100 TB the merge cost is O(batch + rollup), independent of history —
the whole point of mergeable aggregate state.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from kg_etl_spark.operators.incremental import merge_rollups, partial_rollup

_VERSION_PREFIX = "v="
_OWNER_MARKER = ".checkpoint"


def _latest_version(state_root: str, below: int | None = None) -> int | None:
    if not os.path.isdir(state_root):
        return None
    versions = [
        int(d[len(_VERSION_PREFIX):])
        for d in os.listdir(state_root)
        if d.startswith(_VERSION_PREFIX)
    ]
    if below is not None:
        versions = [v for v in versions if v < below]
    return max(versions) if versions else None


def read_rollup_state(spark: SparkSession, state_root: str) -> DataFrame | None:
    """Latest committed rollup state, or None before the first batch."""
    v = _latest_version(state_root)
    return None if v is None else spark.read.parquet(f"{state_root}/{_VERSION_PREFIX}{v}")


def upsert_rollup_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    keys: list[str],
    value_col: str,
    state_root: str,
    ckpt_key: str,
    keep_versions: int = 3,
) -> None:
    """One versioned state merge — the foreachBatch body, exposed at
    module level so crash/replay sequences are directly testable
    (re-running the same batch_id must be a no-op merge against the
    SAME parent, never a double-count).

    Steps: ownership guard → merge(prev below batch_id, batch partial)
    → tmp-write + atomic rename of `v=<batch_id>` → prune to the newest
    `keep_versions` dirs plus the merge parent."""
    # Ownership guard: refuse any checkpoint other than the one that
    # created this state_root — batch ids reset to 0 under a fresh
    # checkpoint would silently fork or destroy history, and version
    # numbers alone cannot distinguish a legitimate replay of batch 0
    # from a fresh stream clobbering v=0.
    os.makedirs(state_root, exist_ok=True)
    marker = f"{state_root}/{_OWNER_MARKER}"
    latest = _latest_version(state_root)
    if os.path.exists(marker):
        owner = open(marker).read()
        if owner != ckpt_key:
            raise ValueError(
                f"rollup state at {state_root} belongs to checkpoint "
                f"{owner!r} but this stream runs {ckpt_key!r}: the "
                "checkpoint was reset against existing state. Use a "
                "fresh state_root or keep the original checkpoint_dir."
            )
    elif latest is not None:
        raise ValueError(
            f"rollup state at {state_root} has versions but no "
            f"{_OWNER_MARKER} marker (unknown provenance); refusing to "
            "merge into it. Use a fresh state_root."
        )
    else:
        tmp_marker = f"{state_root}/.tmp-{_OWNER_MARKER}"
        with open(tmp_marker, "w") as f:
            f.write(ckpt_key)
        os.rename(tmp_marker, marker)
    # Same-checkpoint sanity: batch ids only ever replay the LAST
    # batch, so a version strictly above batch_id is corruption.
    if latest is not None and latest > int(batch_id):
        raise ValueError(
            f"rollup state at {state_root} is already at v={latest} but "
            f"this stream is writing batch {batch_id}: refusing to "
            "rewind committed state."
        )
    new_part = partial_rollup(batch_df, keys, value_col)
    prev_v = _latest_version(state_root, below=int(batch_id))
    if prev_v is not None:
        prev = spark.read.parquet(f"{state_root}/{_VERSION_PREFIX}{prev_v}")
        merged = merge_rollups([prev, new_part], keys)
    else:
        merged = new_part
    # write to a hidden tmp dir, then one os.rename — so a version
    # directory only ever appears fully written (listdir filters the
    # dot-prefixed tmp), making the swap actually atomic for
    # concurrent read_rollup_state callers
    tmp = f"{state_root}/.tmp-{_VERSION_PREFIX}{int(batch_id)}"
    final = f"{state_root}/{_VERSION_PREFIX}{int(batch_id)}"
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.isdir(final):
        shutil.rmtree(final)  # checkpoint replay of the same batch
    os.rename(tmp, final)
    # Prune superseded versions down to the newest `keep_versions`
    # plus the merge parent (needed if THIS batch replays after a
    # crash before the checkpoint commits). Older dirs are fair game:
    # readers get keep_versions-1 refresh intervals to finish.
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
            shutil.rmtree(f"{state_root}/{_VERSION_PREFIX}{v}", ignore_errors=True)


def rollup_stream(
    stream: DataFrame,
    keys: list[str],
    value_col: str,
    state_root: str,
    checkpoint_dir: str,
    available_now: bool = True,
    keep_versions: int = 3,
):
    """Start the refresh query. Each batch writes state version
    `v=<batch_id>` = merge(previous version strictly below batch_id,
    this batch's partial) — idempotent under checkpoint replay; see
    `upsert_rollup_batch` for the ownership guard and pruning policy.
    """
    spark = stream.sparkSession
    ckpt_key = os.path.abspath(checkpoint_dir)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        upsert_rollup_batch(
            spark, batch_df, batch_id, keys, value_col,
            state_root, ckpt_key, keep_versions,
        )

    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = q.trigger(availableNow=True)
    return q.start()
