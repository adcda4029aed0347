"""Pair-classifier evaluation: precision/recall/F1 of a predicted pair
set against a ground-truth pair set — the harness that turns dedup/ER
thresholds from guesses into measured operating points.

Scale shape: one full-outer equi-join on the (a, b) pair key (both
sides are pair lists, already small relative to the corpus), one
count aggregate — output is a single row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pair_metrics(
    predicted: DataFrame,
    truth: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
) -> DataFrame:
    """(tp, fp, fn, precision, recall, f1) of `predicted` vs `truth`,
    both as undirected pair frames with a_col < b_col (canonical
    orientation is the caller's contract — assert upstream).

    Ratios are single IEEE divides of exact counts, rounded at output;
    empty denominators yield 0.0 (not NULL) so the row is total.
    """
    p = predicted.select(a_col, b_col).distinct().withColumn("_p", F.lit(1))
    t = truth.select(a_col, b_col).distinct().withColumn("_t", F.lit(1))
    j = p.join(t, [a_col, b_col], "full_outer")
    agg = j.agg(
        F.sum((F.col("_p").isNotNull() & F.col("_t").isNotNull()).cast("long")).alias("tp"),
        F.sum((F.col("_p").isNotNull() & F.col("_t").isNull()).cast("long")).alias("fp"),
        F.sum((F.col("_p").isNull() & F.col("_t").isNotNull()).cast("long")).alias("fn"),
    )
    prec = F.when(
        (F.col("tp") + F.col("fp")) > 0,
        F.col("tp").cast("double") / (F.col("tp") + F.col("fp")).cast("double"),
    ).otherwise(F.lit(0.0))
    rec = F.when(
        (F.col("tp") + F.col("fn")) > 0,
        F.col("tp").cast("double") / (F.col("tp") + F.col("fn")).cast("double"),
    ).otherwise(F.lit(0.0))
    f1 = F.when(
        (2 * F.col("tp") + F.col("fp") + F.col("fn")) > 0,
        (2 * F.col("tp")).cast("double")
        / (2 * F.col("tp") + F.col("fp") + F.col("fn")).cast("double"),
    ).otherwise(F.lit(0.0))
    return agg.select(
        "tp",
        "fp",
        "fn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )
