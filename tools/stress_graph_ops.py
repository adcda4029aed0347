"""10×-style scale probes for the graph/clustering/search operators
added in round 2: PageRank, triangle counting, k-means, BM25.

Each probe synthesizes inputs ~10× the sf0.1 shapes (the repo's
standard scale probe; see SCALE.md) and times the operator end-to-end,
so the SCALE.md claims are measured, not guessed.

Usage: python tools/stress_graph_ops.py [pagerank|triangles|kmeans|bm25 ...]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from kg_etl_spark.session import get_spark


def stress_pagerank(spark):
    # ~1.5M directed edges over 300k nodes (sf0.1 trade graph is ~150k)
    n, deg = 300_000, 5
    base = spark.range(n * deg)
    edges = base.select(
        (F.col("id") % n).cast("string").alias("src"),
        # mix the copy index in with a second constant so each of the
        # `deg` copies lands on a different target (j*n*A ≡ 0 mod n)
        (((F.col("id") % n) * 2654435761 + (F.col("id") / n).cast("long") * 2246822519 + 17) % n)
        .cast("string")
        .alias("dst"),
    ).filter(F.col("src") != F.col("dst")).distinct().localCheckpoint(eager=True)
    ne = edges.count()
    from kg_etl_spark.operators.pagerank import pagerank

    t0 = time.time()
    out = pagerank(edges, iterations=3)
    total = out.agg(F.sum("rank")).collect()[0][0]
    return f"pagerank: {ne} edges, 3 iters in {time.time()-t0:.1f}s (mass={total:.4f})"


def stress_triangles(spark):
    # ~100k-node graph with ~1M edges and real triangle density:
    # connect i -> i+1, i+2, i*7%n (wheel-ish overlaps)
    n = 100_000
    df = spark.range(n)
    e = None
    for off in (1, 2):
        part = df.select(F.col("id").alias("a_id"), ((F.col("id") + off) % n).alias("b_id"))
        e = part if e is None else e.union(part)
    e = e.union(df.select(F.col("id").alias("a_id"), ((F.col("id") * 7) % n).alias("b_id")))
    e = (
        e.filter(F.col("a_id") != F.col("b_id"))
        .select(F.least("a_id", "b_id").alias("a_id"), F.greatest("a_id", "b_id").alias("b_id"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    ne = e.count()
    from kg_etl_spark.operators.triangles import triangle_counts

    t0 = time.time()
    total = triangle_counts(e).agg(F.sum("n_triangles")).collect()[0][0]
    return f"triangles: {ne} edges in {time.time()-t0:.1f}s (3*n_tri={total})"


def stress_kmeans(spark):
    # 500k vectors × 32 dims (sf0.1 embeddings = 5k × 64)
    n, d, k = 500_000, 32, 8
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(d)),
        lambda i: ((F.col("id") * 2654435761 % 1000003) * i % 997).cast("double") / 997.0,
    )
    df = spark.range(n).select(F.col("id").alias("vec_id"), vec.alias("embedding"))
    df = df.localCheckpoint(eager=True)
    from kg_etl_spark.operators.clustering import kmeans_lloyd

    t0 = time.time()
    out = kmeans_lloyd(spark, df, k=k, iterations=2)
    rows = out.count()
    return f"kmeans: {n}x{d}, k={k}, 2 iters in {time.time()-t0:.1f}s ({rows} model rows)"


def stress_bm25(spark):
    # 500k synthetic docs (sf0.1 documents = 5k)
    n = 500_000
    words = "spark join window scan filter merge sort hash table group".split()
    arr = F.array(*[F.lit(w) for w in words])
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(1), (F.col("id") % 50 + 20).cast("int")),
            lambda i: F.element_at(arr, ((F.col("id") + i * 7) % 10 + 1).cast("int")),
        ),
        " ",
    )
    df = spark.range(n).select(F.col("id").alias("doc_id"), text.alias("text"))
    df = df.localCheckpoint(eager=True)
    from kg_etl_spark.operators.search import bm25_topk

    t0 = time.time()
    rows = bm25_topk(df, ["spark", "join", "window"], k=25).count()
    return f"bm25: {n} docs in {time.time()-t0:.1f}s ({rows} results)"


STRESSES = {
    "pagerank": stress_pagerank,
    "triangles": stress_triangles,
    "kmeans": stress_kmeans,
    "bm25": stress_bm25,
}


def main():
    names = sys.argv[1:] or list(STRESSES)
    spark = get_spark("stress_graph_ops")
    for name in names:
        print(STRESSES[name](spark), flush=True)


if __name__ == "__main__":
    main()
