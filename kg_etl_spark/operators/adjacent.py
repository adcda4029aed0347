"""Scale-safe LEAD() over LOW-cardinality stream partitions.

``Window.partitionBy(group).orderBy(...)`` with a bounded-cardinality
group key (the catalog's event streams: ``event_type`` has ~5 values)
sorts n/|groups| rows in ONE task — the same single-task-sort failure
class the two-phase rank device (operators/rankdev.py) eliminates for
partition-less windows.  This module is the grouped counterpart, built
on the same range-bucketing idea:

1. the order key is bucketed into ``num_ranges`` fixed-width value
   ranges (a map-side expression; equal keys share a range, so range
   order == key order and ties never split across cells);
2. each (group, range) CELL sorts locally — |groups| x num_ranges
   parallel sorts instead of |groups| giant ones — and an ordinary
   ``lead()`` fills every row except the last of each cell;
3. the FIRST row of every cell (a ``min_by`` hash aggregate consuming
   the SAME explicit cell-key exchange the window sorts on — one
   corpus shuffle total) forms a |groups| x num_ranges-row carry
   frame; a lead over THAT tiny frame yields, per cell, the successor
   of the cell's last row, broadcast-joined back on (group, range).

The concatenation of cells in range order, each sorted by
(order, tiebreaks), IS the per-group total order — the result is
bit-identical to the single window's ``lead()`` at any scale, so the
catalog oracles (which spell the window form in SQL) keep passing
unchanged.

Contract: the group key has LOW cardinality (the carry frame,
|groups| x num_ranges rows, must broadcast — that is exactly the
regime where the plain window is a scale-killer; high-cardinality
groups should keep the plain window, which already parallelizes).
``order_col`` must be non-null and (order, tiebreaks) a total order
per group for a deterministic successor.

Degenerate guard: a constant order key lands every row in range 0 and
the device degrades to the single window it replaces (the event
streams' timestamps span the full corpus range, so this never binds).

Reference parity: the reference derives consecutive-event transitions
with a single-process pandas sort (chaayagirimon/kg-etl
etl/transform/graph.py builds edge frames in-memory); this device
exists because Spark's distributed model makes the per-stream total
order the thing you must never ask one task to produce.
"""

from __future__ import annotations

import weakref
from typing import Optional, Sequence, Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kg_etl_spark.operators.rankdev import _range_expr

# Per-DataFrame memo of order-key bounds — the programmatic stand-in
# for the zone-map/column statistics a table format (Delta/Iceberg)
# serves for free at scan time. The catalog's inputs are memoized
# static scans (session.read_table), so min/max of an immutable column
# is a dataset constant: computing it once per session instead of once
# per query removes one full-scan job from every device invocation.
# Weak-keyed: frames die, entries follow. Callers that mutate an
# sf_dir mid-session already must clear the read memo (session.
# clear_read_memo), which drops the memoized frame and with it this
# entry. Wrong bounds could only skew CELL SIZES, never results (the
# range expression clamps and stays monotone), but stale entries
# cannot occur for the static bench/test dirs this serves.
_BOUNDS_MEMO: "weakref.WeakKeyDictionary[DataFrame, dict]" = weakref.WeakKeyDictionary()


def _order_bounds(df: DataFrame, order_col: str):
    try:
        memo = _BOUNDS_MEMO.setdefault(df, {})
    except TypeError:  # non-weakrefable frame stub
        memo = {}
    if order_col in memo:
        return memo[order_col]
    b = df.agg(
        F.min(F.col(order_col).cast("double")).alias("lo"),
        F.max(F.col(order_col).cast("double")).alias("hi"),
    ).collect()[0]
    val = None if b["lo"] is None else (float(b["lo"]), float(b["hi"]))
    memo[order_col] = val
    return val


def with_next(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    tiebreaks: Sequence[str],
    next_cols: Sequence[str],
    *,
    num_ranges: int = 64,
    prefix: str = "next_",
) -> DataFrame:
    """LEAD(c) OVER (PARTITION BY group_cols ORDER BY order_col,
    tiebreaks) for each c in ``next_cols``, emitted as ``next_<c>`` —
    without any single-task per-group sort.  Value-identical to the
    window form (the range bucketing is a monotone function of the
    order key, so cell concatenation preserves the total order)."""
    group_cols = list(group_cols)
    tiebreaks = [t for t in tiebreaks if t != order_col]
    next_cols = list(next_cols)
    out_types = {c: df.schema[c].dataType for c in next_cols}

    bounds = _order_bounds(df, order_col)
    if bounds is None:  # empty frame
        out = df
        for c in next_cols:
            out = out.withColumn(prefix + c, F.lit(None).cast(out_types[c]))
        return out
    lo, hi = bounds

    # cast-to-double is monotone non-decreasing, so even a rounding
    # collision only MERGES adjacent keys into one cell — never reorders
    ranged = df.withColumn(
        "_apr", _range_expr(F.col(order_col).cast("double"), lo, hi, num_ranges)
    )
    # explicit hash exchange on the cell key: the window below finds its
    # distribution requirement satisfied (no extra exchange + in-place
    # sort) and the carry aggregate consumes the SAME exchange as a
    # sort-free hash agg — one corpus shuffle, one sort, total
    ranged = ranged.repartition(*(group_cols + ["_apr"]))
    order = [F.col(order_col).asc()] + [F.col(t).asc() for t in tiebreaks]
    w = Window.partitionBy(*group_cols, "_apr").orderBy(*order)
    local = ranged
    for c in next_cols:
        local = local.withColumn("_apl_" + c, F.lead(c).over(w))
    # last row of its cell <=> the local lead ran off the cell
    local = local.withColumn("_aplast", F.lead(F.lit(1)).over(w).isNull())

    # first row per cell (map-side-free hash agg over the shared
    # exchange; struct min_by keys on the identical total order)
    firsts = ranged.groupBy(*group_cols, "_apr").agg(
        F.min_by(
            F.struct(*[F.col(c) for c in next_cols]),
            F.struct(F.col(order_col), *[F.col(t) for t in tiebreaks]),
        ).alias("_apf")
    )
    # per cell, the NEXT populated cell's first row = successor of this
    # cell's last row (missing/empty cells simply aren't rows here, so
    # lead skips them correctly) — |groups| x num_ranges rows total
    cw = Window.partitionBy(*group_cols).orderBy("_apr")
    carry = firsts.withColumn("_apnext", F.lead("_apf").over(cw)).select(
        *group_cols, "_apr", "_apnext"
    )

    out = local.join(F.broadcast(carry), group_cols + ["_apr"], "left")
    for c in next_cols:
        out = out.withColumn(
            prefix + c,
            F.when(F.col("_aplast"), F.col("_apnext").getField(c)).otherwise(
                F.col("_apl_" + c)
            ),
        )
    # pin the original column order (the join moved its keys first)
    return out.select(*df.columns, *[prefix + c for c in next_cols])


def stream_lead(
    ev: DataFrame, next_cols: Sequence[str] = ("user_id",), *, num_ranges: int = 64
) -> DataFrame:
    """The catalog's event-stream successor: LEAD(c) OVER (PARTITION BY
    event_type ORDER BY ts, event_id) for each requested column —
    scale-safe (event_type has ~5 values; the naive window sorts n/5
    rows in one task)."""
    return with_next(
        ev, ["event_type"], "ts", ["event_id"], next_cols, num_ranges=num_ranges
    )


def transition_edges(ev: DataFrame, *, with_ts: bool = False) -> DataFrame:
    """Directed user-transition edges: u -> v when v's event directly
    follows u's within one event_type stream (ordered ts, event_id) —
    the shared derivation of the graph family, de-duplicated by the
    CALLER (some sites keep multiplicities or timestamps).  With
    ``with_ts`` the edge carries t = the successor event's epoch-micros
    (temporal-reachability grain).  NOT distinct."""
    cols = ["user_id", "ts"] if with_ts else ["user_id"]
    led = stream_lead(ev, cols)
    sel = [F.col("user_id").alias("src"), F.col("next_user_id").alias("dst")]
    if with_ts:
        sel.append(F.unix_micros("next_ts").alias("t"))
    return led.select(*sel).filter(
        F.col("dst").isNotNull() & (F.col("src") != F.col("dst"))
    )


def undirected_transition_edges(ev: DataFrame) -> DataFrame:
    """Symmetrized distinct user-transition edges (a < b) — the shared
    graph grain of the ml family."""
    e = transition_edges(ev)
    return e.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()


def transition_edges_cut(ev: DataFrame) -> DataFrame:
    """DISTINCT directed transition edges, localCheckpointed (lazy) —
    the multi-consumer cut for iterative kernels (scc/walks/hits/...),
    which consume the edge frame once per round: without the cut the
    whole derivation (scan + device) re-executes per action. The
    checkpoint holds |E| distinct edges — state those kernels
    materialize anyway. Use the un-checkpointed builders for
    single-pass queries (plans stay inspectable)."""
    return transition_edges(ev).distinct().localCheckpoint(eager=False)


def undirected_transition_edges_cut(ev: DataFrame) -> DataFrame:
    """`undirected_transition_edges` at a lazy localCheckpoint cut —
    same rationale as :func:`transition_edges_cut`."""
    return undirected_transition_edges(ev).localCheckpoint(eager=False)


def with_prefix_max(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    tiebreaks: Sequence[str],
    value_col: str,
    *,
    num_ranges: int = 64,
    out_col: str = "prefix_max_excl",
) -> DataFrame:
    """EXCLUSIVE running MAX(value) OVER (PARTITION BY group ORDER BY
    order, tiebreaks ROWS UNBOUNDED PRECEDING TO 1 PRECEDING) for
    LOW-cardinality groups — the running-aggregate sibling of
    :func:`with_next`, same cells + carry shape: each (group, range)
    cell computes its local exclusive prefix max in parallel; the
    per-cell maxes (a |groups| x num_ranges frame off the same
    exchange) take an exclusive running max over cells and broadcast
    back; the row value is greatest(local, carry).  Bit-identical to
    the single window at any scale (max is associative and the cells
    concatenate in order).  NULL where no prior row exists."""
    group_cols = list(group_cols)
    tiebreaks = [t for t in tiebreaks if t != order_col]
    bounds = _order_bounds(df, order_col)
    if bounds is None:
        return df.withColumn(out_col, F.lit(None).cast(df.schema[value_col].dataType))
    lo, hi = bounds
    ranged = df.withColumn(
        "_apr", _range_expr(F.col(order_col).cast("double"), lo, hi, num_ranges)
    ).repartition(*(group_cols + ["_apr"]))
    order = [F.col(order_col).asc()] + [F.col(t).asc() for t in tiebreaks]
    w = (
        Window.partitionBy(*group_cols, "_apr")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn("_apl", F.max(value_col).over(w))
    cellmax = ranged.groupBy(*group_cols, "_apr").agg(
        F.max(value_col).alias("_apm")
    )
    cw = (
        Window.partitionBy(*group_cols)
        .orderBy("_apr")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = cellmax.withColumn("_apc", F.max("_apm").over(cw)).select(
        *group_cols, "_apr", "_apc"
    )
    out = local.join(F.broadcast(carry), group_cols + ["_apr"], "left")
    out = out.withColumn(
        out_col,
        F.when(
            F.col("_apl").isNotNull() & F.col("_apc").isNotNull(),
            F.greatest("_apl", "_apc"),
        ).otherwise(F.coalesce("_apl", "_apc")),
    )
    return out.select(*df.columns, out_col)


def stream_state(ev: DataFrame) -> DataFrame:
    """Per-type LAST event (by ts, event_id) — the carry state of the
    incremental derivation: one map-side-combinable max_by aggregate,
    |types| rows."""
    return ev.groupBy("event_type").agg(
        F.max_by(
            F.struct("user_id", "ts", "event_id"), F.struct("ts", "event_id")
        ).alias("_last")
    ).select(
        "event_type",
        F.col("_last.user_id").alias("user_id"),
        F.col("_last.ts").alias("ts"),
        F.col("_last.event_id").alias("event_id"),
    )


def transition_edges_incremental(
    batch: DataFrame, state: Optional[DataFrame] = None
) -> Tuple[DataFrame, DataFrame]:
    """Incremental user-transition maintenance: given a NEW event batch
    and the per-type last-event ``state`` of everything already
    processed, return (delta_edges, new_state) such that the union of
    all batches' delta edges equals :func:`transition_edges` over the
    full stream (property-tested) — the pattern that makes a 100 TB
    transition graph maintainable per-batch instead of re-derived per
    refresh (the minhash_index discipline applied to the graph family).

    Contract: batches arrive in stream order — every event of the new
    batch sorts AFTER the state's last event within its type (true for
    append-only event logs; violating it produces edges of a different
    interleaving, not an error).

    Cost: the scale-safe stream lead over the batch + one |types|-row
    broadcast union; state is |types| rows."""
    full = batch if state is None else state.select(
        "event_type", "user_id", "ts", "event_id"
    ).unionByName(batch.select("event_type", "user_id", "ts", "event_id"))
    led = stream_lead(full, ["user_id"])
    edges = led.select(
        F.col("user_id").alias("src"), F.col("next_user_id").alias("dst")
    ).filter(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
    return edges, stream_state(full)
