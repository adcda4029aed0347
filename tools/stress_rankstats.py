"""10x-scale probes for the rank-device statistics family: the
doubled-rank Spearman and the cumsum-device exact quantiles, each
against a planted shape with a PROVABLE exact answer (the SCALE.md
measured-not-guessed discipline).

Usage: python tools/stress_rankstats.py [spearman|quantiles ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kg_etl_spark.session import get_spark  # noqa: E402


def stress_spearman(spark):
    # 10M rows, heavy ties (x takes 1M distinct values, 10 rows each),
    # y = 2x + 7: tie groups align exactly, so Spearman rho == 1.0
    # EXACTLY — any rank-device bucketing/offset error breaks the bit.
    from kg_etl_spark.operators.rankdev import global_cumsum

    n, dup = 10_000_000, 10
    rows = spark.range(n).select(
        (F.col("id") % (n // dup)).alias("x")
    ).withColumn("y", F.col("x") * 2 + 7)

    def doubled(col):
        per = rows.groupBy(col).agg(F.count(F.lit(1)).alias("_n"))
        cum = global_cumsum(per, col, ["_n"])
        return cum.select(col, (F.lit(2) * F.col("cum__n") - F.col("_n") + 1).alias(f"r2_{col}"))

    t0 = time.time()
    ranked = rows.join(doubled("x"), "x").join(doubled("y"), "y")
    DEC = "decimal(38,0)"
    rx, ry = F.col("r2_x").cast(DEC), F.col("r2_y").cast(DEC)
    a = ranked.agg(
        F.count(F.lit(1)).cast(DEC).alias("n"),
        F.sum(rx).alias("sx"), F.sum(ry).alias("sy"),
        F.sum(rx * ry).alias("sxy"),
        F.sum(rx * rx).alias("sxx"), F.sum(ry * ry).alias("syy"),
    ).collect()[0]
    dt = time.time() - t0
    num = a["n"] * a["sxy"] - a["sx"] * a["sy"]
    dxx = a["n"] * a["sxx"] - a["sx"] * a["sx"]
    dyy = a["n"] * a["syy"] - a["sy"] * a["sy"]
    # perfect monotone with aligned ties: numerator² == dxx·dyy EXACTLY
    assert num > 0 and num * num == dxx * dyy, (num, dxx, dyy)
    return f"spearman: {n} rows ({dup}x ties) in {dt:.1f}s (rho == 1 exact in integers)"


def stress_quantiles(spark):
    # 10M values 0..9_999_999 shuffled by a bijective affine map: the
    # p-quantile is EXACTLY ceil(p*n/100) - 1 (values are 0-based ranks)
    from kg_etl_spark.operators.rankdev import global_cumsum

    n = 10_000_000
    vals = spark.range(n).select(((F.col("id") * 7_368_787 + 11) % n).alias("v"))
    t0 = time.time()
    per = vals.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    cum = global_cumsum(per, "v", ["c"])
    tot = cum.agg(F.sum("c").alias("n"))
    j = cum.crossJoin(F.broadcast(tot))
    ps = F.explode(F.array(F.lit(50), F.lit(90), F.lit(99))).alias("p")
    hit = (
        j.select("v", "c", "cum_c", "n", ps)
        .withColumn("k", F.expr("(p * n + 99) div 100"))
        .filter((F.col("cum_c") >= F.col("k")) & (F.col("cum_c") - F.col("c") < F.col("k")))
        .collect()
    )
    dt = time.time() - t0
    got = {r["p"]: r["v"] for r in hit}
    expect = {p: (p * n + 99) // 100 - 1 for p in (50, 90, 99)}
    assert got == expect, (got, expect)
    return f"quantiles: {n} distinct values in {dt:.1f}s (3 exact order stats)"


STRESSES = {"spearman": stress_spearman, "quantiles": stress_quantiles}


def main():
    names = sys.argv[1:] or list(STRESSES)
    spark = get_spark("stress_rankstats")
    for name in names:
        print(STRESSES[name](spark), flush=True)


if __name__ == "__main__":
    main()
