"""k-center greedy (Gonzalez / maximin) diversity selection over an
embedding column — the standard coreset picker for training-data
diversity sampling ("pick k maximally spread exemplars").

Reference parity: beyond-reference (the reference engine has no vector
ops); extends the data-selection family (stratified/quota/DSIR) with a
geometry-driven selector.

Spark-first design: the classic distributed formulation — k-1 passes,
each a pure map-side distance expression (chosen centers inlined as
literals) followed by a top-1 TakeOrderedAndProject (per-partition
1-element heap + driver merge; the corpus NEVER shuffles and no global
sort is planned). Driver state is the k chosen vectors only. At 100 TB
the corpus should be `.persist()`ed by the caller so the k scans hit
memory/disk cache rather than source parquet.

Determinism: start = lowest id; each round picks argmax of the running
min-distance with (dist desc, id asc) total order. Distances are
min-folds of per-center L2s — min is exact and order-independent in
double, and each L2 is the same sequential fold DuckDB's list_reduce
computes, so the whole trajectory is engine-portable: the catalog
oracle replays all k rounds as unrolled SQL CTEs (queries/vector.py).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _l2(a: Column, center: list[float]) -> Column:
    c = F.lit(np.asarray(center, dtype="float64"))
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, c, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def kcenter_greedy(
    spark: SparkSession,
    corpus: DataFrame,
    *,
    k: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Select k maximin exemplars; returns (sel_round 1..k, vec_id,
    maximin_dist) where maximin_dist is the distance-to-selected-set at
    selection time (NULL for the seed), rounded to 6 dp.
    """
    first = (
        corpus.orderBy(id_col)
        .limit(1)
        .select(id_col, vec_col)
        .collect()[0]
    )
    chosen: list[tuple[int, float | None, list[float]]] = [
        (first[id_col], None, [float(x) for x in first[vec_col]])
    ]

    for _ in range(k - 1):
        centers = [c[2] for c in chosen]
        mind = F.least(*[_l2(F.col(vec_col), c) for c in centers]) if len(centers) > 1 else _l2(
            F.col(vec_col), centers[0]
        )
        nxt = (
            corpus.select(F.col(id_col), F.col(vec_col), mind.alias("d"))
            .orderBy(F.col("d").desc(), F.col(id_col).asc())
            .limit(1)
            .collect()[0]
        )
        chosen.append((nxt[id_col], float(nxt["d"]), [float(x) for x in nxt[vec_col]]))

    rows = [(i + 1, cid, d) for i, (cid, d, _) in enumerate(chosen)]
    # Round via F.round (HALF_UP, matching DuckDB ROUND) — NOT Python's
    # banker's-rounding round().
    return spark.createDataFrame(
        rows, "sel_round long, vec_id long, maximin_dist double"
    ).withColumn("maximin_dist", F.round("maximin_dist", 6))
