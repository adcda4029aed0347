"""Hierarchy traversal (root + depth per node) by POINTER DOUBLING —
Spark's answer to `WITH RECURSIVE` ancestor walks.

A recursive CTE walks parent links one level per iteration: O(depth)
self-joins. Pointer doubling keeps, per node, its currently-known
highest ancestor plus the distance to it, and each round replaces that
ancestor with the ANCESTOR'S known ancestor — the pointer distance
doubles every round, so a depth-d forest resolves in ⌈log₂ d⌉ joins
(path-halving, the same device operators/components.py uses for
union-find). At 100 TB: each round is ONE equi-join of the state frame
with itself on the ancestor key + a done-count scalar; lineage is cut
per round with localCheckpoint; a billion-node forest of depth 10⁶
still needs only ~20 rounds.

The DuckDB oracle runs the same semantics as a linear WITH RECURSIVE —
the point of the catalog query: identical results, logarithmic vs
linear round complexity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ancestor_paths(
    parents: DataFrame, *, max_doublings: int = 20
) -> DataFrame:
    """(node, root, depth) for every node of a (node, parent) forest;
    `parent` NULL marks a root. Cycles are a caller contract violation
    (bounded by max_doublings, never an infinite loop)."""
    state = parents.select(
        "node",
        F.coalesce("parent", F.col("node")).alias("anc"),
        F.when(F.col("parent").isNull(), F.lit(0)).otherwise(F.lit(1)).alias("depth"),
        F.col("parent").isNull().alias("done"),
    ).lineage_cut(eager=True)
    # roots' lookup rows: (anc=self, +0 hops, done) — already in state.
    for _ in range(max_doublings):
        if state.filter(~F.col("done")).limit(1).count() == 0:
            break
        lookup = state.select(
            F.col("node").alias("anc"),
            F.col("anc").alias("_anc2"),
            F.col("depth").alias("_d2"),
            F.col("done").alias("_done2"),
        )
        state = (
            state.join(lookup, "anc", "left")
            .select(
                "node",
                F.when(F.col("done"), F.col("anc"))
                .otherwise(F.coalesce("_anc2", F.col("anc")))
                .alias("anc"),
                F.when(F.col("done"), F.col("depth"))
                .otherwise(F.col("depth") + F.coalesce("_d2", F.lit(0)))
                .alias("depth"),
                (F.col("done") | F.coalesce("_done2", F.lit(False))).alias("done"),
            )
            .lineage_cut(eager=True)
        )
    return state.select("node", F.col("anc").alias("root"), "depth")
