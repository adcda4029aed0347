"""Slowly-changing-dimension type-2 merge (warehouse upsert with
history): given the current SCD2 table and an update batch, expire
changed rows, append new versions, and keep history immutable.

Spark shape: ONE full-outer join between the current slice and the
update batch on the business key decides everything (expired /
unchanged / new-version / brand-new); history rows pass through
untouched. At 100 TB the dimension is bucketed/partitioned on the key,
so the join co-locates; the update batch is usually small enough to
broadcast — exactly the MERGE INTO pattern lakehouse formats run, but
expressed as pure DataFrame algebra with deterministic integer
versioning (batch ids, not wall-clock), so an ANSI-SQL oracle can
replay it bit-for-bit.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_init(snapshot: DataFrame, key: str, tracked: Sequence[str], batch_id: int = 0) -> DataFrame:
    """Bootstrap an SCD2 table from a plain snapshot: every row current
    as of ``batch_id`` (valid_to NULL = open)."""
    return snapshot.select(
        key,
        *tracked,
        F.lit(batch_id).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
    )


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: Sequence[str],
    batch_id: int,
) -> DataFrame:
    """Apply one upsert batch. Updates carry (key, tracked...); a row
    whose tracked values differ from the open version expires it
    (valid_to = batch_id) and opens a new version; identical rows are
    no-ops; unseen keys insert. Deletes are out of scope (soft-delete
    via a tracked flag)."""
    cur = dim.filter(F.col("valid_to").isNull())
    hist = dim.filter(F.col("valid_to").isNotNull())

    u = updates.select(
        F.col(key).alias("_uk"), *[F.col(c).alias(f"_u_{c}") for c in tracked]
    )
    j = cur.join(u, cur[key] == u["_uk"], "full_outer")

    changed = F.lit(False)
    for c in tracked:
        changed = changed | ~(
            F.col(c).eqNullSafe(F.col(f"_u_{c}"))
        )
    has_cur = F.col(key).isNotNull()
    has_upd = F.col("_uk").isNotNull()

    # open rows that survive this batch unchanged
    unchanged = j.filter(has_cur & (~has_upd | ~changed)).select(
        key, *tracked, "valid_from", "valid_to"
    )
    # open rows superseded by a differing update -> closed at batch_id
    expired = j.filter(has_cur & has_upd & changed).select(
        key, *tracked, "valid_from", F.lit(batch_id).cast("long").alias("valid_to")
    )
    # new versions: differing updates + brand-new keys
    opened = j.filter(has_upd & (~has_cur | changed)).select(
        F.col("_uk").alias(key),
        *[F.col(f"_u_{c}").alias(c) for c in tracked],
        F.lit(batch_id).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
    )
    return hist.unionByName(unchanged).unionByName(expired).unionByName(opened)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Classify rows between two snapshots of the same table:
    'added' (key only in new), 'removed' (key only in old),
    'changed' (key in both, any compare col differs — NULL-safe),
    'unchanged'. The primitive behind incremental syncs, CDC
    backfills, and regression diffs of pipeline outputs.

    One full-outer join on the key; comparison is map-side NULL-safe
    equality. Output keeps the key plus per-side values of the first
    differing column for triage.
    """
    o = old.select(
        *[F.col(c).alias(f"_o_{c}") for c in key_cols + compare_cols]
    )
    n = new.select(
        *[F.col(c).alias(f"_n_{c}") for c in key_cols + compare_cols]
    )
    cond = [o[f"_o_{c}"] == n[f"_n_{c}"] for c in key_cols]
    j = o.join(n, cond, "full_outer")

    in_old = F.col(f"_o_{key_cols[0]}").isNotNull()
    in_new = F.col(f"_n_{key_cols[0]}").isNotNull()
    any_diff = F.lit(False)
    for c in compare_cols:
        any_diff = any_diff | ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    status = (
        F.when(in_old & ~in_new, F.lit("removed"))
        .when(~in_old & in_new, F.lit("added"))
        .when(any_diff, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    first_diff = F.lit(None).cast("string")
    for c in reversed(compare_cols):
        first_diff = F.when(
            ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")), F.lit(c)
        ).otherwise(first_diff)
    return j.select(
        *[
            F.coalesce(F.col(f"_o_{c}"), F.col(f"_n_{c}")).alias(c)
            for c in key_cols
        ],
        status.alias("diff_status"),
        F.when(status == "changed", first_diff).alias("first_diff_col"),
    )


def cdc_apply(
    base: DataFrame,
    oplog: DataFrame,
    key: str,
    seq_col: str,
    op_col: str,
    payload: Sequence[str],
) -> DataFrame:
    """Apply a CDC operation log (Debezium-style after-images) to a
    base table: per key, the max-`seq_col` op wins — 'D' deletes the
    key, 'I'/'U' upsert the full after-image payload; keys without ops
    keep their base row. `seq_col` must be unique per key (the CDC
    offset/LSN contract); deterministic given that.

    Shape: ONE max_by aggregate over the log (map-side combined — never
    a row_number sort-window over the full log), one anti-join to drop
    keyed base rows, one union. The base table shuffles once (the
    anti-join); at 100 TB base and log both arrive bucketed by key and
    the joins are co-located.
    """
    last = oplog.groupBy(key).agg(
        F.max_by(
            F.struct(F.col(op_col).alias("_op"), *[F.col(c) for c in payload]),
            F.col(seq_col),
        ).alias("_last")
    )
    survivors_from_log = last.filter(F.col("_last._op") != "D").select(
        key, *[F.col(f"_last.{c}").alias(c) for c in payload]
    )
    untouched = base.join(last.select(key), key, "left_anti").select(key, *payload)
    return untouched.unionByName(survivors_from_log)


def scd2_pit_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    time_col: str,
) -> DataFrame:
    """Point-in-time (as-of) join of facts against an SCD2 dimension:
    each fact row picks the version valid at its `time_col`
    (valid_from <= t AND (valid_to IS NULL OR t < valid_to)) — the
    "what did the dimension say when this fact happened" query.

    Plan shape: EQUI-join on the key with the validity predicate as a
    post-join filter — per key there are only a handful of versions, so
    the filter prunes a constant factor, never a cross product. At
    100 TB both sides arrive bucketed by key; the join is co-located.
    """
    t = facts[time_col]
    return facts.join(dim, key).filter(
        (dim["valid_from"] <= t) & (dim["valid_to"].isNull() | (t < dim["valid_to"]))
    )
