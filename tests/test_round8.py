"""Round-8 device hardening: exact NTILE division at large tiles,
broadcast offset lookup above the inline threshold, memoized rankdev
statistics, and heavy-tie splitting (the r7 verdict directives + the
r7 high-severity advice item).

The bit-identity contract remains the invariant under test: any
monotone bucketing of the order/rank key — now including the tiebreak
sub-bucketing WITHIN a dominant tie value — must reproduce the plain
window exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from kg_etl_spark.operators import adjacent as adj
from kg_etl_spark.operators import rankdev as rd


def _rows(df):
    def k(t):
        return tuple((v is None, v) for v in t)

    return sorted((tuple(r) for r in df.collect()), key=k)


# ---- exact NTILE at large tile sizes (r7 advice, high) -------------------


def test_ntile_col_expr_exact_at_large_tiles(spark):
    # decimal(38,0)/decimal(20,0) resolves to decimal(38,6) and
    # HALF_UP-rounds the quotient to 6dp BEFORE floor: rn=2000001,
    # n=20000001, k=10 computed floor(round(2000000/2000001)) =
    # floor(1.000000) = 1 -> tile 2; correct NTILE is 1.
    df = spark.createDataFrame([(2_000_001, 20_000_001)], "rn long, n long")
    got = df.select(
        rd.ntile_col_expr(F.col("rn"), F.col("n"), 10).alias("t")
    ).collect()[0]["t"]
    assert got == 1


def test_ntile_col_expr_matches_driver_formula_on_boundaries(spark):
    # every tile-boundary row (last of tile t, first of tile t+1) for
    # tile sizes well past the 2e6 rounding hazard, plus the n<k and
    # tiny-n regimes — the column form must agree with the driver-side
    # integer formula (ntile_expr) everywhere
    cases = []
    for n, k in [(20_000_001, 10), (6_000_004, 3), (9, 4), (3, 10), (1, 1)]:
        q, r = divmod(n, k)
        rns = {1, n}
        for t in range(1, k + 1):
            hi = t * q + min(t, r)  # last row of tile t
            for rn in (hi, hi + 1):
                if 1 <= rn <= n:
                    rns.add(rn)
        cases += [(rn, n, k) for rn in sorted(rns)]
    df = spark.createDataFrame(cases, "rn long, n long, k long")
    for n, k in {(n, k) for _, n, k in cases}:
        sub = df.filter((F.col("n") == n) & (F.col("k") == k))
        got = sub.select(
            "rn", rd.ntile_col_expr(F.col("rn"), F.col("n"), k).alias("t")
        )
        want = sub.select(
            "rn", rd.ntile_expr(F.col("rn"), n, k).cast("long").alias("t")
        )
        assert _rows(got) == _rows(want), (n, k)
