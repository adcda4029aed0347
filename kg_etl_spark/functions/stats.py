"""Per-group statistical scoring (reference A10–A12).

z-score with sample stddev (σ=0 → z=0), blended scores, bucketing —
window expressions, no shuffle beyond the partitioning key.

Determinism note: for oracle-comparable output we compute μ/σ from
exact decimal sums (sum and sum-of-squares) so the result is
bit-identical regardless of partition order — a plain float
`stddev_samp` is order-dependent in the last ulps.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def group_zscore(df: DataFrame, group_col: str, value_col: str, out_col: str = "z") -> DataFrame:
    """z = (x-μ)/σ over a group window; σ=0 (or n=1) → z=0.

    Uses decimal sum/sumsq for order-independent μ/σ.
    """
    w = Window.partitionBy(group_col)
    dec = F.col(value_col).cast("decimal(18,6)")
    n = F.count(value_col).over(w).cast("double")
    s = F.sum(dec).over(w).cast("double")
    ss = F.sum(dec * dec).over(w).cast("double")
    mu = s / n
    var = F.when(n > 1, (ss - s * s / n) / (n - 1)).otherwise(F.lit(0.0))
    sigma = F.sqrt(F.greatest(var, F.lit(0.0)))
    z = F.when(sigma > 0, (F.col(value_col) - mu) / sigma).otherwise(F.lit(0.0))
    return df.withColumn(out_col, z)


def blend(z_a: Column, z_b: Column, w_a: float = 0.6, w_b: float = 0.4) -> Column:
    """Blended popularity score (reference: 0.6*z_listings + 0.4*z_reviews)."""
    return F.lit(w_a) * z_a + F.lit(w_b) * z_b


def bucket(z: Column) -> Column:
    """z≥1→'high', z≥0→'medium', else 'low' (reference A12)."""
    return F.when(z >= 1, "high").when(z >= 0, "medium").otherwise("low")
