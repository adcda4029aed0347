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

from pyspark.sql import DataFrame, SparkSession

from kg_etl_spark.operators.incremental import merge_rollups, partial_rollup

_VERSION_PREFIX = "v="


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


def rollup_stream(
    stream: DataFrame,
    keys: list[str],
    value_col: str,
    state_root: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start the refresh query. Each batch writes state version
    `v=<batch_id>` = merge(previous version strictly below batch_id,
    this batch's partial) — idempotent under checkpoint replay."""
    spark = stream.sparkSession

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        # Guard against checkpoint/state divergence: batch ids only ever
        # replay the LAST batch, so an existing version strictly above
        # batch_id means this stream was restarted with a fresh checkpoint
        # (ids reset to 0) against old state — merging would silently fork
        # history (new merges ignore it, readers keep seeing the stale
        # higher version). Refuse loudly instead.
        latest = _latest_version(state_root)
        if latest is not None and latest > int(batch_id):
            raise ValueError(
                f"rollup state at {state_root} is already at v={latest} but "
                f"this stream is writing batch {batch_id}: the checkpoint "
                "was reset against existing state. Use a fresh state_root "
                "or keep the original checkpoint_dir."
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
            import shutil

            shutil.rmtree(final)  # checkpoint replay of the same batch
        os.rename(tmp, final)
        # Prune superseded versions, keeping this batch and its merge
        # parent (prev_v is still needed if THIS batch replays after a
        # crash before the checkpoint commits). Without pruning the
        # state_root grows one full rollup copy per batch forever.
        import shutil

        keep = {int(batch_id)} | ({prev_v} if prev_v is not None else set())
        for d in os.listdir(state_root):
            if d.startswith(_VERSION_PREFIX) and int(d[len(_VERSION_PREFIX):]) not in keep:
                shutil.rmtree(f"{state_root}/{d}", ignore_errors=True)

    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = q.trigger(availableNow=True)
    return q.start()
