"""Temporal join operators Spark lacks natively: as-of join and
point-in-interval (range) join.

- as-of join: the merge-sort formulation — union both sides tagged,
  one window pass per key ordered by time carrying the last seen right
  row forward. ONE shuffle on the key, no inequality join, no
  per-left-row probe. This is how kdb/QuestDB-style asof semantics map
  onto a shuffle engine.
- range join: 1-D interval blocking, the temporal twin of the spatial
  grid join — intervals explode to the fixed-width buckets they cover,
  points map to one bucket, equi-join on (key, bucket), exact BETWEEN
  filter after. A naive theta-join is O(n·m) and plans as a
  nested-loop; blocking keeps it equi-join shaped at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: tuple[str, ...] = (),
    tolerance_s: float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_ts <= left_ts for the same `on` key (strictly backward-looking,
    ties included). Right payload columns arrive as <col><suffix>, plus
    <right_ts><suffix>; unmatched lefts keep nulls.

    tolerance_s: optional max staleness — matches older than this many
    seconds are nulled out (kdb `tolerance` semantics).

    Plan shape: union(left, right) → window(partitionBy key, orderBy
    ts, right-before-left on equal ts) with last(..., ignoreNulls) →
    filter left rows. One shuffle total; both inputs stream through a
    single sort — at 100 TB this beats any per-row backward probe and
    never degenerates into an inequality join.
    """
    lt = F.col("_t")
    payload = tuple(right_cols) or tuple(
        c for c in right.columns if c not in (on, right_ts)
    )
    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(
            right.select(
                F.struct(
                    F.col(right_ts).alias("_rts"), *[F.col(c) for c in payload]
                ).alias("s")
            ).schema["s"].dataType
        ).alias("_rrow"),
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tag.schema["_lrow"].dataType).alias("_lrow"),
        F.struct(F.col(right_ts).alias("_rts"), *[F.col(c) for c in payload]).alias("_rrow"),
    )
    # _side asc ⇒ at equal timestamps the right row sorts first and IS
    # visible to the left row (<= semantics); tie-break inside right
    # rows by _t so "latest" is total.
    # _rrow as the final key totalizes the order among right rows that
    # share a timestamp (struct comparison) — "latest" is deterministic
    # under any partitioning.
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_side").asc(), F.col("_rrow").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l_tag.unionByName(r_tag)
        .withColumn("_match", F.last("_rrow", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if tolerance_s is not None:
        carried = carried.withColumn(
            "_match",
            F.when(
                lt.cast("double") - F.col("_match")["_rts"].cast("double")
                <= F.lit(float(tolerance_s)),
                F.col("_match"),
            ),
        )
    out_cols = [F.col("_lrow")[c].alias(c) for c in left.columns]
    out_cols.append(F.col("_match")["_rts"].alias(f"{right_ts}{suffix}"))
    out_cols += [F.col("_match")[c].alias(f"{c}{suffix}") for c in payload]
    return carried.select(*out_cols)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | None,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
) -> DataFrame:
    """All (point, interval) pairs with start <= point < end (and equal
    `on` key when given). `bucket_width` should be on the order of the
    typical interval length: each interval explodes to ~len/width
    buckets, each point to exactly one, and the join is a pure
    equi-join on (key, bucket) with the exact BETWEEN applied after.

    Output: all point columns + all interval columns (caller aliases
    collisions beforehand).
    """
    pbucket = F.floor(F.col(point_col).cast("double") / bucket_width).cast("long")
    s = F.floor(F.col(start_col).cast("double") / bucket_width).cast("long")
    e = F.floor(
        (F.col(end_col).cast("double") - F.lit(1e-9)) / bucket_width
    ).cast("long")
    iv = intervals.withColumn("_b", F.explode(F.sequence(s, F.greatest(e, s))))
    pt = points.withColumn("_b", pbucket)
    keys = ["_b"] if on is None else [on, "_b"]
    return (
        pt.join(iv, keys)
        .filter(
            (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col))
        )
        .drop("_b")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: str | None,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: int,
) -> DataFrame:
    """All (left, right) interval pairs that OVERLAP (half-open:
    l_start < r_end AND r_start < l_end), with equal `on` key when
    given — the interval-interval companion to `range_join`'s
    point-interval containment.

    Blocking: both sides explode their [start, end) span into
    `bucket_width`-wide cells and equi-join on (key, cell). A pair
    sharing several cells would duplicate, so each pair is emitted ONLY
    in its first common cell — `greatest(cell(l_start), cell(r_start))`
    (both intervals provably cover the cell of `max(l_start, r_start)`
    when they overlap) — which makes the join duplicate-free WITHOUT a
    distinct pass. The exact overlap predicate is applied after the
    equi-join.

    Scale: shuffle is the equi-join on (key, cell); each interval
    contributes ~ceil(len/bucket_width) rows, so pick bucket_width on
    the order of the typical interval length. No cartesian, no
    broadcast requirement — both sides may be huge.

    Columns: start/end are NUMERIC (e.g. integer epoch-µs from
    unix_micros); caller aliases collisions beforehand.
    """
    lcell = F.floor(F.col(left_start) / bucket_width).cast("long")
    rcell = F.floor(F.col(right_start) / bucket_width).cast("long")
    lspan = F.sequence(
        lcell,
        F.greatest(
            F.floor((F.col(left_end) - 1) / bucket_width).cast("long"), lcell
        ),
    )
    rspan = F.sequence(
        rcell,
        F.greatest(
            F.floor((F.col(right_end) - 1) / bucket_width).cast("long"), rcell
        ),
    )
    lv = left.withColumn("_lc", lcell).withColumn("_b", F.explode(lspan))
    rv = right.withColumn("_rc", rcell).withColumn("_b", F.explode(rspan))
    keys = ["_b"] if on is None else [on, "_b"]
    return (
        lv.join(rv, keys)
        .filter(
            (F.col("_b") == F.greatest(F.col("_lc"), F.col("_rc")))
            & (F.col(left_start) < F.col(right_end))
            & (F.col(right_start) < F.col(left_end))
        )
        .drop("_b", "_lc", "_rc")
    )


def temporal_earliest_arrival(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    rounds: int = 3,
) -> DataFrame:
    """Time-respecting earliest-arrival relaxation — the temporal-
    network reachability primitive (Holme & Saramäki, Phys. Rep. 2012)
    static reachability gets wrong: an edge (src, dst, t) may only be
    taken AT or AFTER the arrival time at src, so paths must be
    time-ordered.

    `edges`: (src, dst, t) with t a long timestamp; `seeds`:
    (node, ea) initial arrivals. Fixed `rounds` synchronous
    relaxations, each ONE edge-keyed shuffle (min over t of edges
    with t >= ea(src)) + a full-outer merge; earliest-arrival is
    monotone, so a fixed-round prefix is well-defined (and SQL-
    unrollable — the catalog oracle replays the same rounds as CTEs).
    At 100 TB each round's state frame is (node, ea) — never larger
    than the vertex set — and the checkpoint per round caps plan
    depth exactly as the other fixpoint operators do."""
    ea = seeds.select("node", F.col("ea").cast("long").alias("ea"))
    for _ in range(rounds):
        relax = (
            edges.join(
                ea.select(F.col("node").alias("src"), F.col("ea").alias("_t0")),
                "src",
            )
            .filter(F.col("t") >= F.col("_t0"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("t").alias("_cand"))
        )
        # full_outer merge; least() ignores NULLs, so a node seen on
        # only one side keeps that side's arrival
        ea = (
            ea.join(relax, "node", "full_outer")
            .select("node", F.least("ea", "_cand").alias("ea"))
            .lineage_cut(eager=True)
        )
    return ea
