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


def suggest_aliases(
    curated: DataFrame,
    staged: DataFrame,
    cities: DataFrame,
    source: str = "wikivoyage",
    near_km: float = 35.0,
    min_count: int = 8,
) -> DataFrame:
    """Alias-suggestion recall diagnostic (reference
    `diagnostics/suggest_wv_aliases.py:14-71`): curated rows of a
    source that did NOT survive staging (city assignment) but sit
    within `near_km` of a city center propose their page title
    (city_hint, lowercased) as an alias for that city; only titles seen
    ≥ `min_count` times are suggested.

    Spark-first shape: the unassigned set is a left_anti join on
    place_id; city centers are a broadcast dim (cities are always
    tiny), so the geo test is a map-side cross with the broadcast —
    no corpus shuffle. Output: (slug, alias, n_hits), n_hits desc.
    """
    from kg_etl_spark.functions.geo import haversine_m

    wv = curated.filter(F.col("source") == source).na.drop(
        subset=["lat", "lon", "city_hint"]
    )
    miss = wv.join(
        staged.filter(F.col("source") == source).select("place_id"),
        "place_id",
        "left_anti",
    )
    centers = cities.select(
        "slug", F.col("center_lat").alias("_clat"), F.col("center_lon").alias("_clon")
    ).na.drop(subset=["_clat", "_clon"])
    hits = (
        miss.select(F.lower(F.trim("city_hint")).alias("alias"), "lat", "lon")
        .filter(F.col("alias") != "")
        .join(F.broadcast(centers))
        .filter(
            haversine_m(F.col("_clat"), F.col("_clon"), F.col("lat"), F.col("lon"))
            <= near_km * 1000.0
        )
    )
    return (
        hits.groupBy("slug", "alias")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .filter(F.col("n_hits") >= min_count)
        .orderBy(F.col("slug").asc(), F.col("n_hits").desc(), F.col("alias").asc())
    )


def stage_trace(
    stages: dict[str, DataFrame], source_col: str = "source"
) -> DataFrame:
    """Pipeline-stage tracer (reference
    `diagnostics/check_wikivoyage.py:37-132`): per-stage row counts
    broken down by source, so a stage that silently drops one source's
    rows is visible in a single table.

    `stages` maps stage name → the DataFrame at that point (e.g.
    {"parsed": ..., "curated": ..., "staged": ...}). Stages without the
    source column count under source='(all)'. Output:
    (stage, source, n_rows) in the given stage order.

    Each per-stage count is a map-side partial aggregate; the union of
    tiny per-stage summaries is driver-free.
    """
    outs = []
    for i, (name, df) in enumerate(stages.items()):
        if source_col in df.columns:
            g = df.groupBy(F.col(source_col).alias("source"))
        else:
            g = df.withColumn("source", F.lit("(all)")).groupBy("source")
        outs.append(
            g.agg(F.count(F.lit(1)).alias("n_rows")).select(
                F.lit(i).alias("_ord"), F.lit(name).alias("stage"), "source", "n_rows"
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("_ord", "source").drop("_ord")


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
