"""ER spot-check diagnostics (SURVEY §5, reference
`diagnostics/spotcheck.py:187-386`): data-quality review tables over
the candidate/link space, plus accept-rule promotion suggestions.

Inputs are the same DataFrames the ER engine produces — candidates
from `candidate_links` (with sources carried) and accepted links —
so the diagnostics share kernels with production exactly as the
reference's spotcheck re-runs its accept rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kg_etl_spark.operators.er import banded_accept


def _unlinked(cands: DataFrame, links: DataFrame) -> DataFrame:
    return cands.join(links.select("a_id", "b_id"), ["a_id", "b_id"], "left_anti")


def borderline_pairs(
    cands: DataFrame, links: DataFrame, lo_m: float = 100.0, hi_m: float = 120.0
) -> DataFrame:
    """Unlinked cross-source pairs in the borderline distance band —
    the ones a human should eyeball."""
    return (
        _unlinked(cands, links)
        .filter((F.col("meters") >= lo_m) & (F.col("meters") <= hi_m))
        .filter(F.col("a_source") != F.col("b_source"))
        .orderBy(F.col("meters").asc(), F.col("a_id").asc(), F.col("b_id").asc())
    )


def riskiest_pairs(
    cands: DataFrame, links: DataFrame, max_m: float = 120.0, max_sim: float = 0.30
) -> DataFrame:
    """Very close but textually dissimilar — likely distinct places
    that blocking put together; false-positive risk if thresholds
    loosen."""
    return (
        _unlinked(cands, links)
        .filter((F.col("meters") <= max_m) & (F.col("name_jac") <= max_sim))
        .orderBy(F.col("meters").asc(), F.col("a_id").asc(), F.col("b_id").asc())
    )


def same_source_near_dupes(cands: DataFrame, min_sim: float = 0.5) -> DataFrame:
    """Within-source near-duplicates (the reference treats same-source
    matches more strictly) — ingest-quality signal."""
    return (
        cands.filter(F.col("a_source") == F.col("b_source"))
        .filter(F.col("name_jac") >= min_sim)
        .orderBy(F.col("name_jac").desc(), F.col("a_id").asc(), F.col("b_id").asc())
    )


def promotion_suggestions(
    cands: DataFrame, links: DataFrame, relaxed_bands: list[tuple[float, float]]
) -> DataFrame:
    """Unlinked pairs that WOULD be accepted under relaxed bands —
    re-runs the production accept rule (not a reimplementation), like
    the reference's spotcheck promotion pass."""
    return _unlinked(cands, links).filter(
        banded_accept(F.col("meters"), F.col("name_jac"), relaxed_bands)
    )


def cluster_stats(assignments: DataFrame) -> DataFrame:
    """Cluster-size distribution: n_clusters, singletons, max size —
    the sanity counters of `diagnostics/spotcheck.py:288-293`."""
    sizes = assignments.groupBy("canonical_id").agg(F.count(F.lit(1)).alias("size"))
    return sizes.agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum(F.when(F.col("size") == 1, 1).otherwise(0)).alias("n_singletons"),
        F.max("size").alias("max_cluster_size"),
        F.round(F.avg("size"), 6).alias("avg_cluster_size"),
    )
