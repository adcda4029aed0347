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

    for _ in range(max_iter):
        # neighborhood min: for each node, min(comp of node, comp of neighbors)
        nbr_min = (
            sym.join(labels.withColumnRenamed("node", "d").withColumnRenamed("comp", "ncomp"), "d")
            .groupBy("s")
            .agg(F.min("ncomp").alias("nbr_comp"))
            .withColumnRenamed("s", "node")
        )
        # carry a changed flag so convergence needs no extra join
        stepped = labels.join(nbr_min, "node", "left").select(
            "node",
            F.least(F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))).alias("comp"),
            (F.coalesce(F.col("nbr_comp"), F.col("comp")) < F.col("comp")).alias("_changed"),
        )
        # pointer jumping: comp ← comp(comp), collapsing label chains so
        # convergence is O(log diameter) instead of O(diameter)
        lookup = stepped.select(F.col("node").alias("_c"), F.col("comp").alias("_cc"))
        stepped = (
            stepped.join(lookup, stepped.comp == lookup._c, "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("_cc"), F.col("comp"))).alias("comp"),
                "_changed",
            )
        )
        stepped = stepped.lineage_cut(eager=True)
        changed = stepped.filter(F.col("_changed")).limit(1).count()
        labels = stepped.drop("_changed")
        if changed == 0:
            break
    sym.unpersist()
    return labels


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    small_threshold: int = 2_000_000,
) -> DataFrame:
    """Size-adaptive components: below `small_threshold` edges the whole
    edge list fits one task → exact union-find via applyInPandas (a
    coarsened local solve, the standard cutover trick); above it, the
    distributed min-label iteration. Both return (node, comp) with
    comp = min node id — identical, order-independent semantics.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    # localCheckpoint, not cache: the caller's actions run after this
    # function returns, and an unpersisted cache would silently re-run
    # the (possibly expensive) edge-producing lineage on every one.
    e = e.lineage_cut(eager=True)
    n = e.count()
    if n > small_threshold:
        return components_iterative(e)

    node_type = dict(e.dtypes)["src"]

    def uf(pdf: pd.DataFrame) -> pd.DataFrame:
        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(pdf["src"], pdf["dst"]):
            for v in (a, b):
                if v not in parent:
                    parent[v] = v
            ra, rb = find(a), find(b)
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        # second pass: full path compression → min-id roots
        rows = [(v, find(v)) for v in parent]
        return pd.DataFrame(rows, columns=["node", "comp"])

    return (
        e.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(uf, schema=f"node {node_type}, comp {node_type}")
    )


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
