"""K-means (Lloyd) over an embedding column, the Spark way.

Shape per iteration (the same reduce-collect loop MLlib's KMeans runs):

1. **Assign** — map-side only. The k×d centroid matrix is inlined as ONE
   2-D array literal (one Literal node per centroid row — the scalar-
   per-literal form costs ~10 s of Catalyst analysis at 256×64, see
   operators/similarity.py); per-row nearest centroid is
   ``array_position(dists, array_min(dists))`` over an ordered
   ``zip_with`` fold. No join, no window, no corpus shuffle.
2. **Update** — one groupBy with d avg-columns + count. Map-side partial
   aggregation means the shuffle carries k rows × d columns, NOT
   |corpus|×d exploded rows.
3. **Collect** — k×d doubles (the model, not the data) return to the
   driver to become the next iteration's literals.

100 TB reasoning: the corpus is touched exactly ``iterations`` times,
each a single codegen'd scan + tiny-key aggregate; driver traffic is
k×d floats per iteration regardless of corpus size.

Cross-engine determinism (DuckDB oracle): per-row distances are
sequential dim-order folds (bit-identical both engines); argmin ties
break to the smallest cluster id on both sides; centroid means are
rounded to 6 dp after EVERY update so engine-specific sum fold order
cannot drift across iterations.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _assign_expr(centers: list[list[float]], vec_col: str) -> F.Column:
    """0-based nearest-centroid id as a pure map-side expression."""
    v = F.col(vec_col).cast("array<double>")
    cent_lit = F.array(*[F.lit(np.asarray(c, dtype="float64")) for c in centers])
    dists = F.transform(
        cent_lit,
        lambda c: F.aggregate(
            F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("long")


def _fit_centers(
    corpus: DataFrame,
    k: int,
    iterations: int,
    id_col: str,
    vec_col: str,
) -> tuple[list[list[float]], list[int]]:
    """The Lloyd reduce-collect loop (see module docstring): returns
    (centers, member counts) after `iterations` updates from the
    deterministic k-lowest-id seed.

    Seeding note: orderBy(id).limit(k) plans as TakeOrderedAndProject —
    an O(k) heap per partition + driver merge, NOT a full sort — so the
    ordering dependency costs nothing at scale. A hash-min seed
    (orderBy(xxhash64(id))) would decorrelate seeds from id order but
    was deliberately rejected: the engine-portable SQL oracle replays
    the seed as `vec_id < k` and DuckDB has no xxhash64, so hash
    seeding would trade a value-checked contract for an unverifiable
    one."""
    init = corpus.orderBy(id_col).limit(k).select(vec_col).collect()
    centers = [[float(x) for x in r[vec_col]] for r in init]
    d = len(centers[0])
    counts = [0] * k

    for _ in range(iterations):
        assigned = corpus.select(
            _assign_expr(centers, vec_col).alias("cluster_id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        agg = assigned.groupBy("cluster_id").agg(
            F.count(F.lit(1)).alias("n"),
            *[F.round(F.avg(F.col("v")[i]), 6).alias(f"m{i}") for i in range(d)],
        )
        counts = [0] * k
        for row in agg.collect():  # ≤ k rows: model state, not data
            cid = int(row["cluster_id"])
            counts[cid] = int(row["n"])
            centers[cid] = [row[f"m{i}"] for i in range(d)]
    return centers, counts


def kmeans_lloyd(
    spark: SparkSession,
    corpus: DataFrame,
    *,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run ``iterations`` Lloyd steps from a deterministic init (the k
    lowest-id vectors) and return the fitted model in long form:
    (cluster_id, dim, centroid_val, n_members), dim 1-based, centroid
    values rounded to 6 dp, n_members from the final assignment.

    Empty clusters keep their previous centroid (n_members = 0).

    Seed scan: ``orderBy(id).limit(k)`` physically plans as
    TakeOrderedAndProject — a per-partition k-element heap + driver
    merge of k·num_partitions rows, NOT a global sort; the corpus never
    shuffles. The id-ordered seed is kept (vs a hash-based pick) because
    the fitted model is oracle-checked and must be reproducible from
    the spec "k lowest-id vectors".
    """
    centers, counts = _fit_centers(corpus, k, iterations, id_col, vec_col)
    d = len(centers[0])
    rows = [
        (cid, dim + 1, centers[cid][dim], counts[cid])
        for cid in range(k)
        for dim in range(d)
    ]
    return spark.createDataFrame(
        rows, "cluster_id long, dim long, centroid_val double, n_members long"
    )


def semantic_dedup(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iterations: int = 2,
    threshold: float = 0.95,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): embedding-space deduplication at
    corpus scale. K-means partitions the space (Lloyd, deterministic
    seed); cosine pairs are generated ONLY within a cluster (the
    cluster-keyed equi-self-join below — never all-pairs); pairs at
    cosine >= threshold become edges; each connected component keeps
    its min-id member.

    Output: (id, cluster_id, group_id, is_kept) — group_id = min id of
    the semantic-duplicate group (own id for singletons), is_kept =
    (id == group_id).

    100 TB shape: assignment is map-side against k×d broadcast
    literals; the self-join shuffles once on cluster_id and its cost is
    Σ|cluster|² — k must grow with the corpus (SemDeDup's own premise)
    so clusters stay task-sized; components run on the (sparse) edge
    list, not the corpus. The assigned frame is checkpointed once: it
    feeds both join sides and the final output.

    Duplicates ACROSS cluster boundaries are missed by design (the
    SemDeDup trade-off); identical vectors always share a cluster
    (identical distance vectors → identical argmin), which is what the
    planted-recall oracle twin pins down.
    """
    from kg_etl_spark.operators.components import connected_components

    centers, _ = _fit_centers(corpus, k, iterations, id_col, vec_col)
    assigned = corpus.select(
        F.col(id_col),
        _assign_expr(centers, vec_col).alias("cluster_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).lineage_cut(eager=True)

    from kg_etl_spark.operators.similarity import cosine

    a = assigned.select(
        F.col("cluster_id"), F.col(id_col).alias("_aid"), F.col("_v").alias("_va")
    )
    b = assigned.select(
        F.col("cluster_id"), F.col(id_col).alias("_bid"), F.col("_v").alias("_vb")
    )
    edges = (
        a.join(b, "cluster_id")
        .filter(F.col("_aid") < F.col("_bid"))
        .filter(cosine(F.col("_va"), F.col("_vb")) >= F.lit(threshold))
        .select(F.col("_aid").alias("src"), F.col("_bid").alias("dst"))
    )
    comp = connected_components(edges)
    return (
        assigned.join(comp, assigned[id_col] == comp["node"], "left")
        .select(
            F.col(id_col),
            "cluster_id",
            F.coalesce(F.col("comp"), F.col(id_col)).alias("group_id"),
            (F.coalesce(F.col("comp"), F.col(id_col)) == F.col(id_col)).alias("is_kept"),
        )
    )


def kmeans_inertia(corpus: DataFrame, centers: list[list[float]], vec_col: str = "embedding") -> float:
    """Σ min-distance² over the corpus (model quality): one scan, one
    scalar back — used by tests to assert Lloyd monotonicity."""
    v = F.col(vec_col).cast("array<double>")
    cent_lit = F.array(*[F.lit(np.asarray(c, dtype="float64")) for c in centers])
    dists = F.transform(
        cent_lit,
        lambda c: F.aggregate(
            F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return corpus.select(F.sum(F.array_min(dists)).alias("s")).collect()[0]["s"]
