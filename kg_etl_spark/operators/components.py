"""Connected components over an edge list (reference A7/X6:
per-city union-find, `etl/er.py:205-222`).

Two strategies, both deterministic (component id = min node id in the
component, independent of edge iteration order — fixing the
reference's order-dependent root identity, SURVEY §7.4):

1. `components_iterative` — distributed min-label propagation
   (alternating large-star/small-star style), O(log n) joins. This is
   the 100 TB path: no single group ever has to fit in one task.
2. `components_grouped_unionfind` — `applyInPandas` union-find per
   partition key (city), exact parity with the reference when groups
   are small (a city's POIs fit trivially in one task).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def components_iterative(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 50
) -> DataFrame:
    """(node, component) with component = min reachable node id.

    Works on string or numeric ids. Each iteration: every node adopts
    the min label in its closed neighborhood; converged when no label
    changes. Checkpoint-free for moderate iteration counts; `localCheckpoint`
    every few rounds to truncate lineage.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    sym = e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d"))).distinct()
    sym.cache()

    labels = (
        sym.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )

    for i in range(max_iter):
        # neighborhood min: for each node, min(comp of node, comp of neighbors)
        nbr_min = (
            sym.join(labels.withColumnRenamed("node", "d").withColumnRenamed("comp", "ncomp"), "d")
            .groupBy("s")
            .agg(F.min("ncomp").alias("nbr_comp"))
            .withColumnRenamed("s", "node")
        )
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))).alias("comp"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels


def components_grouped_unionfind(
    edges: DataFrame, src: str, dst: str, group_col: str
) -> DataFrame:
    """Union-find per group via applyInPandas (exact reference parity
    for small per-group graphs). Output: (group_col, node, comp)."""

    out_schema = f"{group_col} string, node string, comp string"

    def uf(pdf: pd.DataFrame) -> pd.DataFrame:
        parent: dict[str, str] = {}

        def find(x: str) -> str:
            while parent[x] != x:
                parent[x] = parent[parent[x]]  # path halving
                x = parent[x]
            return x

        for a, b in zip(pdf[src], pdf[dst]):
            for n in (a, b):
                if n not in parent:
                    parent[n] = n
            ra, rb = find(a), find(b)
            if ra != rb:
                # deterministic: smaller id wins as root
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        rows = [(pdf[group_col].iloc[0], n, find(n)) for n in parent]
        return pd.DataFrame(rows, columns=[group_col, "node", "comp"])

    return edges.groupBy(group_col).applyInPandas(uf, schema=out_schema)
