"""Fixed-depth BFS (multi-source shortest hops) as iterated joins.

Per hop: frontier ⋈ edges (shuffle on the node key), then a min-
aggregate folds newly-reached nodes into the distance table — the
Pregel BFS lowered to DataFrame algebra, with constant lineage depth
because hops is a small Python constant. Integer-only, so the unrolled
SQL oracle matches exactly.

100 TB shape: each hop touches only the frontier × its edges (not the
whole graph); distances/edges share the node-key partitioning across
hops. For huge diameters use iterate-with-localCheckpoint like
operators/components.py's iterative path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_hops(edges: DataFrame, sources: DataFrame, max_hops: int = 3) -> DataFrame:
    """Min-hop distance (≤ max_hops) from any source: (node, dist).
    ``edges``: unique undirected (a_id, b_id); ``sources``: (node)."""
    sym = edges.select(F.col("a_id").alias("u"), F.col("b_id").alias("v")).union(
        edges.select(F.col("b_id").alias("u"), F.col("a_id").alias("v"))
    )
    dist = sources.select("node", F.lit(0).cast("long").alias("dist"))
    frontier = dist
    for h in range(1, max_hops + 1):
        nxt = (
            sym.join(frontier, sym["u"] == frontier["node"])
            .select(F.col("v").alias("node"), F.lit(h).cast("long").alias("dist"))
            .distinct()
        )
        dist = dist.unionByName(nxt).groupBy("node").agg(F.min("dist").alias("dist"))
        frontier = dist.filter(F.col("dist") == h)
    return dist


def sssp_rounds(
    edges: DataFrame, sources: DataFrame, rounds: int = 3
) -> DataFrame:
    """Weighted single-source(-set) shortest paths, Bellman-Ford style:
    `rounds` relaxations bound the result to min-cost paths of ≤ rounds
    edges. ``edges``: unique undirected (a_id, b_id, w); ``sources``:
    (node). Returns (node, dist) for every node reached.

    Same DataFrame lowering as bfs_hops — per round, distance table ⋈
    edges (shuffle on the node key) then a min-aggregate — but carrying
    a float path cost instead of the hop counter. Every candidate value
    is the same IEEE sum of the same edge weights in any engine, so min
    over candidates is reproducible and the unrolled SQL oracle matches
    bit-for-bit (the changepoint/blocked-pairs float discipline).

    100 TB shape: each round touches the full distance table × its
    edges; distances and edges share node-key partitioning across
    rounds, and lineage stays constant because rounds is a small Python
    constant. For large round counts, localCheckpoint per round like
    operators/components.py.
    """
    sym = (
        edges.select(F.col("a_id").alias("u"), F.col("b_id").alias("v"), F.col("w"))
        .union(
            edges.select(F.col("b_id").alias("u"), F.col("a_id").alias("v"), F.col("w"))
        )
        # every round joins sym — without this cut the edge-generation
        # subtree (often a blocked spatial self-join) replays per round
        .lineage_cut(eager=True)
    )
    dist = sources.select("node", F.lit(0.0).alias("dist"))
    for k in range(rounds):
        relaxed = sym.join(dist, sym["u"] == dist["node"]).select(
            F.col("v").alias("node"), (F.col("dist") + F.col("w")).alias("dist")
        )
        dist = (
            dist.unionByName(relaxed).groupBy("node").agg(F.min("dist").alias("dist"))
        )
        if k < rounds - 1:
            # cut the cumulative lineage: without this, round k replays
            # rounds 1..k-1's joins (the components.py iterate pattern)
            dist = dist.lineage_cut(eager=True)
    return dist


def sssp_per_source(
    edges: DataFrame, sources: DataFrame, rounds: int = 3
) -> DataFrame:
    """Per-source bounded shortest paths: (source, node, dist) for each
    source — the primitive behind sampled centrality measures. Same
    Bellman-Ford lowering as sssp_rounds with the source id carried in
    the aggregate key; state size is |reached| × |sources|, so sources
    are a SAMPLE (landmark set) at scale — exactly how harmonic /
    closeness centrality is estimated on large graphs."""
    sym = (
        edges.select(F.col("a_id").alias("u"), F.col("b_id").alias("v"), F.col("w"))
        .union(
            edges.select(F.col("b_id").alias("u"), F.col("a_id").alias("v"), F.col("w"))
        )
        .lineage_cut(eager=True)
    )
    dist = sources.select(
        F.col("node").alias("source"), F.col("node"), F.lit(0.0).alias("dist")
    )
    for k in range(rounds):
        relaxed = sym.join(dist, sym["u"] == dist["node"]).select(
            "source", F.col("v").alias("node"), (F.col("dist") + F.col("w")).alias("dist")
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("source", "node")
            .agg(F.min("dist").alias("dist"))
        )
        if k < rounds - 1:
            dist = dist.lineage_cut(eager=True)
    return dist


def harmonic_centrality(
    edges: DataFrame, sources: DataFrame, rounds: int = 3
) -> DataFrame:
    """Harmonic centrality (landmark-sampled, distance-bounded):
    C(v) = Σ_{s ≠ v, d(s,v) < ∞} 1 / d(s,v) over the source sample.
    Per-term reciprocals are rounded then decimal-summed
    (order-independent) per the catalog float contract."""
    per = sssp_per_source(edges, sources, rounds)
    term = F.round(F.lit(1.0) / F.col("dist"), 9).cast("decimal(28,9)")
    return (
        per.filter(F.col("dist") > 0.0)
        .groupBy("node")
        .agg(
            F.count(F.lit(1)).alias("n_reached_from"),
            F.round(F.sum(term).cast("double"), 6).alias("harmonic"),
        )
    )
