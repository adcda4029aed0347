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


def stress_scc(spark):
    # adversarial condensation: 10k disjoint 5-cycles (50k nodes) in a
    # CONNECTED id-ordered DAG of hash cross edges — the shape that
    # broke both the min-label variant (sources-only settling) and the
    # min-id pivot (id-correlated splits). Probe checks the component
    # COUNT, not just wall time.
    k, cyc = 10_000, 5
    base = spark.range(k * cyc)
    cycle = base.select(
        F.col("id").alias("src"),
        (((F.col("id") % cyc) + 1) % cyc + (F.col("id") - F.col("id") % cyc)).alias("dst"),
    )
    cross = spark.range(k * cyc).select(
        F.col("id").alias("src"),
        ((F.col("id") * 2654435761 + 17) % (k * cyc)).alias("dst"),
    ).filter(F.col("dst") > F.col("src") + cyc)  # strictly forward: acyclic
    edges = cycle.union(cross).distinct().localCheckpoint(eager=True)
    ne = edges.count()
    from kg_etl_spark.operators.scc import strongly_connected_components

    t0 = time.time()
    out = strongly_connected_components(edges)
    n_comp = out.select("scc_id").distinct().count()
    expect = k  # every node sits in exactly one planted cycle
    return (f"scc: {ne} edges in {time.time()-t0:.1f}s "
            f"({n_comp} components, expected {expect})")


def stress_mis(spark):
    # ~1M undirected edges over 500k nodes (hash graph, avg degree 4)
    n = 500_000
    edges = spark.range(n * 2).select(
        (F.col("id") % n).alias("src"),
        ((F.col("id") * 2654435761 + (F.col("id") / n).cast("long") * 97531 + 29) % n).alias("dst"),
    ).filter(F.col("src") != F.col("dst")).distinct().localCheckpoint(eager=True)
    ne = edges.count()
    from kg_etl_spark.operators.mis import luby_mis

    t0 = time.time()
    out = luby_mis(edges)
    n_sel = out.filter(F.col("selected")).count()
    rounds = out.agg(F.max("round")).collect()[0][0] + 1
    return f"mis: {ne} edges in {time.time()-t0:.1f}s ({n_sel} selected, {rounds} rounds)"


def stress_walks(spark):
    # walk corpus over the same 1M-edge hash graph, length 5
    n = 500_000
    edges = spark.range(n * 2).select(
        (F.col("id") % n).alias("src"),
        ((F.col("id") * 2654435761 + (F.col("id") / n).cast("long") * 97531 + 29) % n).alias("dst"),
    ).filter(F.col("src") != F.col("dst")).distinct().localCheckpoint(eager=True)
    ne = edges.count()
    from kg_etl_spark.operators.walks import deterministic_walks

    t0 = time.time()
    out = deterministic_walks(edges, length=5)
    rows = out.count()
    return f"walks: {ne} edges, length 5 in {time.time()-t0:.1f}s ({rows} corpus rows)"


def stress_hierarchy(spark):
    # 1M-node forest, parent = id div 10 (depth ~ 7)
    n = 1_000_000
    from kg_etl_spark.operators.hierarchy import ancestor_paths

    nodes = spark.range(1, n + 1).select(F.col("id").alias("node"))
    parents = nodes.select(
        "node",
        F.when(F.expr("node div 10") >= 1, F.expr("node div 10")).alias("parent"),
    ).localCheckpoint(eager=True)
    t0 = time.time()
    out = ancestor_paths(parents)
    mx = out.agg(F.max("depth")).collect()[0][0]
    return f"hierarchy: {n} nodes in {time.time()-t0:.1f}s (max depth {mx})"




def stress_scc_web(spark):
    # web-graph shape: one giant SCC (250k-node ring + 250k chords)
    # plus a 250k-node DAG periphery feeding into it (trim peels it)
    n = 250_000
    ring = spark.range(n).select(
        F.col("id").alias("src"), ((F.col("id") + 1) % n).alias("dst")
    )
    chords = spark.range(n).select(
        F.col("id").alias("src"),
        ((F.col("id") * 2654435761 + 7) % n).alias("dst"),
    )
    periphery = spark.range(n).select(
        (F.col("id") + n).alias("src"),
        ((F.col("id") * 97531 + 3) % n).alias("dst"),
    )
    edges = ring.union(chords).union(periphery).filter(
        F.col("src") != F.col("dst")
    ).distinct().localCheckpoint(eager=True)
    ne = edges.count()
    from kg_etl_spark.operators.scc import strongly_connected_components

    t0 = time.time()
    out = strongly_connected_components(edges)
    from pyspark.sql import functions as _F
    giant = (
        out.groupBy("scc_id").count().agg(_F.max("count")).collect()[0][0]
    )
    return f"scc_web: {ne} edges in {time.time()-t0:.1f}s (giant SCC size {giant})"




def stress_scc_dist(spark):
    # forces the DISTRIBUTED FW-BW phase (cutover lowered to 50k):
    # same web shape as scc_web — trim peels the 250k-node periphery,
    # the first pivot swallows the giant SCC, the residual tail cuts
    # over. Measures the fixpoint-round path the 100 TB case runs.
    n = 250_000
    ring = spark.range(n).select(
        F.col("id").alias("src"), ((F.col("id") + 1) % n).alias("dst")
    )
    chords = spark.range(n).select(
        F.col("id").alias("src"),
        ((F.col("id") * 2654435761 + 7) % n).alias("dst"),
    )
    periphery = spark.range(n).select(
        (F.col("id") + n).alias("src"),
        ((F.col("id") * 97531 + 3) % n).alias("dst"),
    )
    edges = ring.union(chords).union(periphery).filter(
        F.col("src") != F.col("dst")
    ).distinct().localCheckpoint(eager=True)
    ne = edges.count()
    from kg_etl_spark.operators.scc import strongly_connected_components

    t0 = time.time()
    out = strongly_connected_components(edges, cutover_edges=50_000)
    from pyspark.sql import functions as _F
    giant = out.groupBy("scc_id").count().agg(_F.max("count")).collect()[0][0]
    n_nodes = out.count()
    return (f"scc_dist: {ne} edges (cutover 50k) in {time.time()-t0:.1f}s "
            f"(giant SCC {giant}, {n_nodes} nodes)")


STRESSES = {
    "pagerank": stress_pagerank,
    "triangles": stress_triangles,
    "kmeans": stress_kmeans,
    "bm25": stress_bm25,
    "scc": stress_scc,
    "scc_web": stress_scc_web,
    "scc_dist": stress_scc_dist,
    "mis": stress_mis,
    "walks": stress_walks,
    "hierarchy": stress_hierarchy,
}


def main():
    names = sys.argv[1:] or list(STRESSES)
    spark = get_spark("stress_graph_ops")
    for name in names:
        print(STRESSES[name](spark), flush=True)


if __name__ == "__main__":
    main()
