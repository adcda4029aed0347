"""Fixed-iteration PageRank as pure DataFrame algebra.

Reference parity: the reference's graph side (Cypher over the KG) has
degree/centrality-flavored readouts; this operator generalizes them to
a real iterative link-analysis kernel the Spark way — no driver-side
graph object, no vertex programs, just joins:

    per iteration:  contrib = edges ⋈ ranks   (shuffle on src)
                    agg     = Σ contrib by dst (shuffle on dst)
                    ranks   = nodes ⟕ agg      (map-side after agg)

100 TB reasoning: every iteration is two key-shuffles of the edge
list — the same shape GraphX/Pregel lowers to. Ranks and edges are
co-partitioned by key across iterations (Catalyst reuses the exchange),
the rank vector is never collected to the driver (only the node COUNT,
one scalar, is), and lineage is fixed-depth because iterations are a
Python-level loop over a small constant. Skewed high-degree nodes are
exactly the AQE skew-join case; the salting helper in operators/skew.py
composes if needed.

Cross-engine float determinism (for the DuckDB oracle): a group-by SUM
of doubles has engine/partition-dependent fold order. With
``deterministic=True`` the per-node sum becomes a sequential left fold
over contributions sorted by source id — bit-identical to the oracle's
``list_reduce(list(... ORDER BY src))``. That path materializes one
array per node (memory ∝ in-degree), so production runs keep the
default plain ``F.sum``; numerically the two differ at ~1e-16.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    iterations: int = 3,
    damping: float = 0.85,
    deterministic: bool = False,
    teleport: DataFrame | None = None,
) -> DataFrame:
    """Rank nodes of a directed graph given as distinct (src, dst)
    string-id edges. Returns (node, pagerank) for every node, where
    ``pagerank`` is the raw (unrounded) rank after ``iterations``
    synchronous updates from a uniform 1/N start.

    Dangling nodes (no out-edges) leak their mass, as in the plain
    power-iteration formulation; feed a symmetrized edge list if the
    graph should conserve mass.
    """
    edges = edges.select("src", "dst")
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = edges.select(F.col("src").alias("node")).union(
        edges.select(F.col("dst").alias("node"))
    ).distinct()
    n = nodes.count()  # one scalar to the driver — not a data collect

    # weighted edge list built once; every iteration reuses it
    e = edges.join(out_deg, "src")
    if teleport is None:
        tele = nodes.select("node", F.lit(1.0 / n).alias("t"))
    else:
        # personalized: teleport mass uniform over the source set S —
        # r0 = e_S, and every iteration restarts (1-d) of the walk at S.
        srcs = teleport.select(F.col(teleport.columns[0]).alias("node")).distinct()
        ns = srcs.count()
        tele = nodes.join(srcs.withColumn("_in", F.lit(1)), "node", "left").select(
            "node",
            F.when(F.col("_in").isNotNull(), F.lit(1.0 / ns)).otherwise(F.lit(0.0)).alias("t"),
        )
    ranks = tele.select("node", F.col("t").alias("rank"))

    for _ in range(iterations):
        contrib = e.join(ranks, e["src"] == ranks["node"]).select(
            "dst", "src", (F.col("rank") / F.col("outdeg")).alias("c")
        )
        if deterministic:
            agg = contrib.groupBy("dst").agg(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("src", "c"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["c"],
                ).alias("s")
            )
        else:
            agg = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        # restart term: the uniform case keeps the legacy single-divide
        # literal ((1-d)/n) so existing oracles stay bit-identical; the
        # personalized case scales the teleport column.
        restart = (
            F.lit((1.0 - damping) / n)
            if teleport is None
            else F.lit(1.0 - damping) * F.col("t")
        )
        ranks = tele.join(agg, tele["node"] == agg["dst"], "left").select(
            "node",
            (restart + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))).alias("rank"),
        )
    return ranks
