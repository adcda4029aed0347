"""K-means Lloyd tests (operators/clustering.py): exact centroids on a
separable toy set, inertia monotonicity, and the empty-cluster
keep-previous fallback."""

from __future__ import annotations

import math

from kg_etl_spark.operators.clustering import kmeans_inertia, kmeans_lloyd

# two tight groups on a line; ids 0 and 1 seed one centroid in each
TOY = [
    (0, [0.0, 0.0]),
    (1, [10.0, 10.0]),
    (2, [1.0, 0.0]),
    (3, [0.0, 1.0]),
    (4, [11.0, 10.0]),
    (5, [10.0, 11.0]),
]


def _df(spark):
    return spark.createDataFrame(TOY, ["vec_id", "embedding"])


def test_separable_groups_converge_to_means(spark):
    out = kmeans_lloyd(spark, _df(spark), k=2, iterations=2).collect()
    cent = {(r["cluster_id"], r["dim"]): r["centroid_val"] for r in out}
    n = {r["cluster_id"]: r["n_members"] for r in out}
    assert n == {0: 3, 1: 3}
    # cluster 0 = mean of (0,0),(1,0),(0,1); cluster 1 = mean of the 10s
    assert math.isclose(cent[(0, 1)], 1.0 / 3, abs_tol=1e-6)
    assert math.isclose(cent[(0, 2)], 1.0 / 3, abs_tol=1e-6)
    assert math.isclose(cent[(1, 1)], 31.0 / 3, abs_tol=1e-6)
    assert math.isclose(cent[(1, 2)], 31.0 / 3, abs_tol=1e-6)


def test_inertia_never_increases(spark):
    df = spark.createDataFrame(
        [(i, [float((i * 7) % 13), float((i * 3) % 11)]) for i in range(40)],
        ["vec_id", "embedding"],
    )
    def centers_after(iters):
        out = kmeans_lloyd(spark, df, k=4, iterations=iters).collect()
        cs = {}
        for r in out:
            cs.setdefault(r["cluster_id"], {})[r["dim"]] = r["centroid_val"]
        return [[cs[c][d] for d in sorted(cs[c])] for c in sorted(cs)]

    i1 = kmeans_inertia(df, centers_after(1))
    i3 = kmeans_inertia(df, centers_after(3))
    assert i3 <= i1 + 1e-9


def test_empty_cluster_keeps_seed_centroid(spark):
    # seed 1 sits alone far away, but seed 0's group swallows everything
    # closer to it; with k=2 and all points nearer seed 0 than seed 1's
    # position after the first update, cluster 1 can empty out — the
    # centroid must then stay put instead of going NaN.
    df = spark.createDataFrame(
        [(0, [0.0]), (1, [100.0]), (2, [1.0]), (3, [2.0])], ["vec_id", "embedding"]
    )
    out = kmeans_lloyd(spark, df, k=2, iterations=3).collect()
    cent = {(r["cluster_id"], r["dim"]): r["centroid_val"] for r in out}
    for v in cent.values():
        assert not math.isnan(v)


def test_semantic_dedup_groups_and_keepers(spark):
    """Two near-identical pairs in opposite corners + a lone vector:
    each pair collapses to its min-id keeper, the loner survives."""
    from kg_etl_spark.operators.clustering import semantic_dedup

    rows = [
        (0, [1.0, 0.0]),
        (7, [1.0, 1e-9]),      # ~cos 1.0 with id 0
        (1, [0.0, 1.0]),
        (9, [1e-9, 1.0]),      # ~cos 1.0 with id 1
        (5, [-1.0, -1.0]),     # alone
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r["vec_id"]: r for r in semantic_dedup(df, k=2, threshold=0.99).collect()}
    assert out[0]["group_id"] == out[7]["group_id"] == 0
    assert out[1]["group_id"] == out[9]["group_id"] == 1
    assert out[5]["group_id"] == 5
    assert {i for i, r in out.items() if r["is_kept"]} == {0, 1, 5}


def test_mmr_diversifies_planted_clusters(spark):
    # two tight clusters near the query; λ=0.5 must interleave them
    # while λ=0.4 must interleave (below 0.5, the less-penalized cluster wins)
    from kg_etl_spark.operators.similarity import mmr_rerank
    from pyspark.sql import functions as F

    def vec(base, eps):
        v = [0.0] * 8
        v[base] = 1.0
        v[(base + 1) % 8] = eps
        return v

    rows = [(0, [1.0, 0.05, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])]  # query
    # cluster A: nearly identical to the query
    rows += [(i, vec(0, 0.04 + i / 1000)) for i in range(1, 5)]
    # cluster B: orthogonal-ish but nonzero relevance
    rows += [(i, [0.3, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, i / 100]) for i in range(5, 9)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    rel = mmr_rerank(emb, queries, k=4, lam=1.0, pool=8)
    div = mmr_rerank(emb, queries, k=4, lam=0.4, pool=8)
    rel_ids = [r["neighbor_id"] for r in rel.orderBy("mmr_rank").collect()]
    div_ids = [r["neighbor_id"] for r in div.orderBy("mmr_rank").collect()]
    assert all(i < 5 for i in rel_ids)  # pure relevance: cluster A only
    assert any(i >= 5 for i in div_ids[:2])  # diversity pulls B in early


def test_pca_power_top_is_near_eigenvector(spark):
    import numpy as np

    from kg_etl_spark.queries.vector import QUERIES as VQ
    from kg_etl_spark.session import read_table

    sf = "/root/testdata/sf0.001"
    load = {r["dim"]: r["loading"] for r in VQ["pca_power_top"](spark, sf).collect()}
    x = np.array([load[i] for i in range(64)])
    emb = read_table(spark, sf, "embeddings").select("embedding").toPandas()
    M = np.array([list(map(float, e)) for e in emb["embedding"]])
    C = np.cov(M, rowvar=False, bias=True)
    y = C @ x
    cos = abs(y @ x) / (np.linalg.norm(y) * np.linalg.norm(x))
    # 8 power iterations approach the top eigenvector (the synthetic
    # corpus is near-isotropic, so the eigengap is small)
    assert cos > 0.99, cos
    lam = (x @ C @ x) / (x @ x)
    ev = np.linalg.eigvalsh(C)
    # near-isotropic spectrum: 8 iterations reach ≥85% of the top
    # eigenvalue and sit far above the average direction
    assert lam > 0.85 * ev[-1], (lam, ev[-1])
    assert lam > 1.5 * ev.mean(), (lam, ev.mean())
