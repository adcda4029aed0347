"""K-core decomposition (iterative peel): the maximal subgraph where
every node keeps degree ≥ k.

Per round: one degree aggregate + one semi-join to drop under-degree
nodes — both keyed on the node, reusing the same partitioning. The
driver loop stops at the fixpoint (no rows removed) or ``max_iter``;
each round's survivor set is localCheckpointed so lineage stays flat
(the components/BFS discipline). Engine-specific iteration ORDER never
matters: the k-core is unique, so results are deterministic even
though no SQL oracle can express the unbounded fixpoint (this operator
is rows-only in the catalog sense — property-tested instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kcore(edges: DataFrame, k: int, max_iter: int = 50) -> DataFrame:
    """Nodes of the k-core of an undirected graph given as unique
    (a_id, b_id) pairs: returns (node, degree) with the node's degree
    WITHIN the core."""
    sym = edges.select(F.col("a_id").alias("u"), F.col("b_id").alias("v")).union(
        edges.select(F.col("b_id").alias("u"), F.col("a_id").alias("v"))
    ).lineage_cut(eager=True)

    for _ in range(max_iter):
        deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("degree"))
        # fixpoint probe on the DEGREE frame (node-scale, early-out
        # limit) instead of counting the full edge list twice per
        # round: any under-degree node means another peel is needed
        if deg.filter(F.col("degree") < k).limit(1).count() == 0:
            break
        keep = deg.filter(F.col("degree") >= k).select("u")
        sym = (
            sym.join(keep, "u", "left_semi")
            .join(keep.withColumnRenamed("u", "v"), "v", "left_semi")
            .lineage_cut(eager=True)
        )
    return sym.groupBy("u").agg(F.count(F.lit(1)).alias("degree")).select(
        F.col("u").alias("node"), "degree"
    ).filter(F.col("degree") >= k)
