"""Scale-safe EXACT global ranking — the shared two-phase device.

Spark's ``Window.orderBy(...)`` with no ``partitionBy`` moves the whole
frame to ONE task ("No Partition Defined for Window operation"), which is
the canonical 100-TB scale-killer.  This module provides the exact
replacement used across the catalog (the `quantile_normalize` /
`pack_concat_chunk` pattern, operators/datapipe.py:530,
operators/packing.py:83), generalized:

1. the numeric sort key is bucketed into ``num_ranges`` fixed-width
   value ranges (a map-side expression — every row with an equal key
   lands in the same range, so range order == key order);
2. each range ranks/cumsums LOCALLY with an ordinary partitioned window
   (``num_ranges`` parallel sorts instead of one global sort);
3. the per-range row counts (or partial sums) — ``num_ranges`` rows, a
   model-sized frame — come to the driver once, a running prefix turns
   them into per-range OFFSETS, and a broadcast map literal shifts every
   local rank/cumsum to its exact global value.

Cost at any scale: one extra min/max aggregate + one ``num_ranges``-row
collect; the data itself shuffles once (hash by range) and never
concentrates.  Exactness: ranks are integer-derived, so results are
bit-identical to the single-partition window — oracles keep passing
unchanged.

Degenerate guard: if the key is constant (hi == lo) every row falls in
range 0 and the device degrades to the single window it replaces; pass
``subkey`` (a second numeric column, e.g. the unique tie-break id) and
the bucketing switches to it automatically in that case.

No reference-counterpart: the reference (chaayagirimon/kg-etl) is
single-node pandas where global sorts are free; this device exists
because Spark's distributed model makes the global total order the one
thing you must never ask a single task to produce.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _range_expr(key: Column, lo: float, hi: float, num_ranges: int) -> Column:
    width = max((hi - lo) / num_ranges, 1e-12)
    return F.least(
        F.greatest(
            ((key.cast("double") - F.lit(lo)) / F.lit(width)).cast("long"),
            F.lit(0),
        ),
        F.lit(num_ranges - 1),
    )


def _offset_map(pairs: dict) -> Column:
    return F.create_map(*[F.lit(x) for kv in pairs.items() for x in kv])


def global_row_number(
    df: DataFrame,
    key: str,
    *,
    ascending: bool = True,
    tiebreaks: Sequence[str] = (),
    out_col: str = "rn",
    num_ranges: int = 64,
    subkey: Optional[str] = None,
) -> Tuple[DataFrame, int]:
    """Exact global ROW_NUMBER() OVER (ORDER BY key [DESC], tiebreaks...)
    without a single-partition window.  ``tiebreaks`` sort ascending (the
    catalog's unique-id total-order contract).  Returns ``(frame with
    out_col, n_total)`` — ``n_total`` is free (the sum of the per-range
    counts the device already collects) and feeds :func:`ntile_expr`.
    """
    bounds = df.agg(
        F.min(F.col(key).cast("double")).alias("lo"),
        F.max(F.col(key).cast("double")).alias("hi"),
    ).collect()[0]
    if bounds["lo"] is None:  # empty frame
        return df.withColumn(out_col, F.lit(None).cast("long")), 0
    lo, hi = float(bounds["lo"]), float(bounds["hi"])
    bucket_key = key
    if hi == lo and subkey is not None:
        sb = df.agg(
            F.min(F.col(subkey).cast("double")).alias("lo"),
            F.max(F.col(subkey).cast("double")).alias("hi"),
        ).collect()[0]
        lo, hi, bucket_key = float(sb["lo"]), float(sb["hi"]), subkey

    rng = _range_expr(F.col(bucket_key), lo, hi, num_ranges)
    # Range ids ascend with the bucket key; for a DESC sort the offsets
    # accumulate from the highest range down so offset+local stays global.
    # EXCEPT in the constant-key subkey fallback: a constant key
    # contributes nothing to the total order, so the effective global
    # order is subkey ASC (the tie-break contract) REGARDLESS of
    # `ascending` — offsets must then accumulate in ascending range
    # order to match the subkey-ASC local windows.
    ranged = df.withColumn("_rdrng", rng)
    order = [F.col(key).asc() if ascending else F.col(key).desc()]
    if bucket_key != key:
        order.append(F.col(bucket_key).asc())
    order += [F.col(t).asc() for t in tiebreaks if t != bucket_key]
    w = Window.partitionBy("_rdrng").orderBy(*order)
    local = ranged.withColumn("_rdlrn", F.row_number().over(w).cast("long"))

    counts = sorted(
        ranged.groupBy("_rdrng").agg(F.count(F.lit(1)).alias("_n")).collect(),
        key=lambda r: r["_rdrng"],
        reverse=(not ascending) and bucket_key == key,
    )
    offsets, running = {}, 0
    for r in counts:
        offsets[r["_rdrng"]] = running
        running += r["_n"]
    out = local.withColumn(
        out_col, F.col("_rdlrn") + F.element_at(_offset_map(offsets), F.col("_rdrng"))
    ).drop("_rdrng", "_rdlrn")
    return out, running


def grouped_row_number(
    df: DataFrame,
    group_cols: Sequence[str],
    key: str,
    tiebreaks: Sequence[str] = (),
    *,
    out_col: str = "rn",
    count_col: str = "n_in_group",
    num_ranges: int = 64,
) -> DataFrame:
    """Exact ROW_NUMBER() OVER (PARTITION BY group_cols ORDER BY key,
    tiebreaks) + the per-group row count, for LOW-cardinality groups,
    without a single-task per-group sort — the grouped sibling of
    :func:`global_row_number` (the exact-median feed for per-group
    order statistics like the Theil–Sen slope).

    Same two-phase shape: fixed-width value ranges of ``key`` (global
    bounds — one scalar aggregate; equal keys share a range so range
    order == key order), one explicit hash exchange on the (group,
    range) cell key that BOTH the per-cell window (in-place sort) and
    the sort-free cell-count hash agg consume, then per-cell offsets
    from the tiny cells frame.  The cells frame is
    |groups| x num_ranges rows, broadcast back — the low-cardinality
    contract; high-cardinality groups should keep the plain window,
    which already parallelizes.

    Degenerate guard: a constant key lands every row in range 0 and
    the device degrades to the plain per-group window it replaces.
    """
    group_cols = list(group_cols)
    tiebreaks = [t for t in tiebreaks if t != key]
    bounds = df.agg(
        F.min(F.col(key).cast("double")).alias("lo"),
        F.max(F.col(key).cast("double")).alias("hi"),
    ).collect()[0]
    if bounds["lo"] is None:  # empty frame
        return df.withColumn(out_col, F.lit(None).cast("long")).withColumn(
            count_col, F.lit(None).cast("long")
        )
    lo, hi = float(bounds["lo"]), float(bounds["hi"])
    ranged = df.withColumn(
        "_grr", _range_expr(F.col(key).cast("double"), lo, hi, num_ranges)
    )
    # explicit hash exchange on the cell key: the window finds its
    # distribution requirement satisfied (in-place sort) and the cell
    # counts come from a sort-free hash agg over the SAME exchange
    ranged = ranged.repartition(*(group_cols + ["_grr"]))
    w = Window.partitionBy(*group_cols, "_grr").orderBy(
        F.col(key).asc(), *[F.col(t).asc() for t in tiebreaks]
    )
    local = ranged.withColumn("_grl", F.row_number().over(w).cast("long"))
    cells = ranged.groupBy(*group_cols, "_grr").agg(
        F.count(F.lit(1)).cast("long").alias("_cn")
    )
    cw = (
        Window.partitionBy(*group_cols)
        .orderBy("_grr")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = cells.withColumn(
        "_off", F.coalesce(F.sum("_cn").over(cw), F.lit(0)).cast("long")
    ).withColumn(
        count_col,
        F.sum("_cn").over(Window.partitionBy(*group_cols)).cast("long"),
    )
    out = local.join(
        F.broadcast(offs.select(*group_cols, "_grr", "_off", count_col)),
        group_cols + ["_grr"],
    )
    out = out.withColumn(out_col, F.col("_grl") + F.col("_off"))
    return out.select(*df.columns, out_col, count_col)


def global_row_number_by(
    df: DataFrame,
    order_cols: Sequence[str],
    *,
    out_col: str = "rn",
    num_parts: Optional[int] = None,
) -> DataFrame:
    """Exact global ROW_NUMBER() OVER (ORDER BY order_cols) for an
    ARBITRARY orderable key tuple — strings included, where the
    numeric range-bucket device (:func:`global_row_number`) cannot
    bucket. Range-repartition on the key (contiguous ordered
    partitions), rank locally per partition, shift by broadcast
    per-partition offsets (partition ids follow range order).

    ``order_cols`` must form a TOTAL order: rank VALUES are then
    independent of where the sampled range boundaries fall, so results
    are partition-count-deterministic (the determinism gate's 7-vs-32
    contract) even though the boundaries themselves are sampled.

    Note one extra exchange versus the numeric device: the local-rank
    window hashes on the partition id (range partitioning does not
    satisfy a hash-distribution requirement); both shuffles stay
    row-proportional and no task ever sorts more than ~n/num_parts
    rows."""
    num_parts = num_parts or df.sparkSession.sparkContext.defaultParallelism
    d = df.repartitionByRange(num_parts, *[F.col(c).asc() for c in order_cols])
    d = d.withColumn("_rbp", F.spark_partition_id())
    w = Window.partitionBy("_rbp").orderBy(*[F.col(c).asc() for c in order_cols])
    local = d.withColumn("_rbl", F.row_number().over(w).cast("long"))
    counts = sorted(
        d.groupBy("_rbp").agg(F.count(F.lit(1)).alias("_n")).collect(),
        key=lambda r: r["_rbp"],
    )
    offsets, running = {}, 0
    for r in counts:
        offsets[r["_rbp"]] = running
        running += r["_n"]
    if not offsets:  # empty frame
        return df.withColumn(out_col, F.lit(None).cast("long"))
    out = local.withColumn(
        out_col, F.col("_rbl") + F.element_at(_offset_map(offsets), F.col("_rbp"))
    )
    return out.select(*df.columns, out_col)


def ntile_expr(rn: Column, n_total: int, k: int) -> Column:
    """SQL NTILE(k) from an exact global row number: the first
    ``n_total % k`` tiles get ``n_total//k + 1`` rows, the rest get
    ``n_total//k`` — a map-side integer formula once the global rank
    exists (no window at all)."""
    if n_total <= 0:
        return F.lit(None).cast("int")
    q, r = divmod(n_total, k)
    big = r * (q + 1)  # rows covered by the (q+1)-sized tiles
    if q == 0:
        return rn.cast("int")  # n_total < k: tile == row number
    return (
        F.when(rn <= F.lit(big), ((rn - 1) / F.lit(q + 1)).cast("int") + 1)
        .otherwise(F.lit(r) + ((rn - 1 - F.lit(big)) / F.lit(q)).cast("int") + 1)
        .cast("int")
    )


def ntile_col_expr(rn: Column, n: Column, k: int) -> Column:
    """:func:`ntile_expr` with the group size as a COLUMN — the
    per-group sibling (feeds :func:`grouped_row_number`'s count_col).
    Tile arithmetic is exact integer division via decimal-backed
    ``floor`` (no double truncation at any group size a long can
    hold), centralizing the NTILE formula the query layer used to
    hand-roll."""

    def idiv(a: Column, b: Column) -> Column:
        # decimal(38,0)/decimal(20,0) divides exactly for any realistic
        # long inputs; floor then truncates exactly (double division
        # would round at >2^53)
        return F.floor(a.cast("decimal(38,0)") / b.cast("decimal(20,0)")).cast(
            "long"
        )

    q = idiv(n, F.lit(k))
    r = n % F.lit(k)
    big = r * (q + 1)  # rows covered by the (q+1)-sized tiles
    return (
        F.when(q == F.lit(0), rn)  # n < k: tile == row number
        .when(rn <= big, idiv(rn - 1, q + 1) + 1)
        .otherwise(r + idiv(rn - 1 - big, q) + 1)
        .cast("long")
    )


def global_ntile(
    df: DataFrame,
    key: str,
    k: int,
    *,
    ascending: bool = True,
    tiebreaks: Sequence[str] = (),
    out_col: str = "tile",
    num_ranges: int = 64,
    subkey: Optional[str] = None,
) -> DataFrame:
    """NTILE(k) OVER (ORDER BY key [DESC], tiebreaks) via the two-phase
    exact rank — value-identical to the window form at any scale."""
    ranked, n = global_row_number(
        df, key, ascending=ascending, tiebreaks=tiebreaks,
        out_col="_rdgrn", num_ranges=num_ranges, subkey=subkey,
    )
    return ranked.withColumn(out_col, ntile_expr(F.col("_rdgrn"), n, k)).drop("_rdgrn")


def global_cumsum(
    df: DataFrame,
    order_col: str,
    sum_cols: Sequence[str],
    *,
    num_ranges: int = 64,
    prefix: str = "cum_",
) -> DataFrame:
    """Exact running SUM(col) OVER (ORDER BY order_col ROWS UNBOUNDED
    PRECEDING) for each ``sum_col`` — per-range local cumsums plus
    broadcast per-range partial-sum offsets (``num_ranges`` rows to the
    driver).  ``order_col`` is assumed unique per row (the caller
    pre-aggregates to distinct order values, as a CDF computation does);
    ties would be summed in nondeterministic intra-tie order otherwise.
    """
    bounds = df.agg(
        F.min(F.col(order_col).cast("double")).alias("lo"),
        F.max(F.col(order_col).cast("double")).alias("hi"),
    ).collect()[0]
    if bounds["lo"] is None:
        out = df
        for c in sum_cols:
            out = out.withColumn(prefix + c, F.col(c))
        return out
    lo, hi = float(bounds["lo"]), float(bounds["hi"])
    ranged = df.withColumn("_rdrng", _range_expr(F.col(order_col), lo, hi, num_ranges))
    w = Window.partitionBy("_rdrng").orderBy(F.col(order_col).asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    local = ranged
    for c in sum_cols:
        local = local.withColumn(prefix + c, F.sum(c).over(w))

    partials = sorted(
        ranged.groupBy("_rdrng")
        .agg(*[F.sum(c).alias(c) for c in sum_cols])
        .collect(),
        key=lambda r: r["_rdrng"],
    )
    out = local
    for c in sum_cols:
        offsets, running = {}, 0
        for r in partials:
            offsets[r["_rdrng"]] = running
            running += r[c] or 0
        out = out.withColumn(
            prefix + c,
            F.col(prefix + c) + F.element_at(_offset_map(offsets), F.col("_rdrng")),
        )
    return out.drop("_rdrng")
