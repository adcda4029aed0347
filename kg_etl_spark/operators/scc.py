"""Strongly connected components of a directed graph as pure DataFrame
algebra — the directed counterpart of operators/components.py.

Algorithm: Trim + Forward-Backward coloring (the standard distributed
SCC scheme — Orzan's coloring / FW-BW-Trim of Slota, Rajamanickam &
Madduri, "BFS and Coloring-Based Parallel Algorithms for Strongly
Connected Components", IPDPS'14 — re-expressed as joins):

  repeat until no active vertices:
    1. TRIM to fixpoint: a vertex with no in-edges or no out-edges in
       the active subgraph is a singleton SCC — settle it. (Handles
       DAG-like regions, which would otherwise cost one round each.)
    2. COLOR: propagate min vertex id forward (F) and backward (B) to
       fixpoint. Reachability into/out of an SCC is uniform across its
       members, so F and B are constant on each SCC; the vertices with
       F(v) == B(v) == c form EXACTLY the SCC of c (c reaches v and v
       reaches c), and c is that SCC's minimum id. Settle them; at
       least the SCC of the minimum active id settles every round.
    3. Drop settled vertices and their edges; repeat.

Scale shape: each propagation step is one shuffle of the active edge
list joined against the label frame (same plan as PageRank's
contrib/agg pair); localCheckpoint truncates lineage per step, and
early-exit is a changed-count scalar per step — the driver never holds
vertex data. Active-set shrinkage means later rounds touch only the
not-yet-settled subgraph. High-out-degree hubs are the AQE skew-join
case, same as every graph kernel here.

Reference parity: the reference has no directed-graph analytics; this
extends the graph family (components/pagerank/bfs/kcore) to directed
reachability, needed for dependency/citation/link graphs in a training
-data pipeline (e.g. crawl link-graph spam sinks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _propagate_min(
    nodes: DataFrame, edges: DataFrame, *, reverse: bool, max_iters: int = 30
) -> DataFrame:
    """Min-label propagation to fixpoint: lbl(v) = min over ids with a
    directed path to v (reverse=False) / from v (reverse=True).
    (node, lbl) out. Early-exits on a zero changed-count."""
    src, dst = ("dst", "src") if reverse else ("src", "dst")
    labels = nodes.select("node", F.col("node").alias("lbl")).localCheckpoint(
        eager=True
    )
    for _ in range(max_iters):
        cand = (
            edges.join(
                labels.select(F.col("node").alias(src), F.col("lbl").alias("_in")),
                src,
            )
            .groupBy(F.col(dst).alias("node"))
            .agg(F.min("_in").alias("_cand"))
        )
        stepped = (
            labels.join(cand, "node", "left")
            .select(
                "node",
                F.least(F.col("lbl"), F.coalesce("_cand", F.col("lbl"))).alias("lbl"),
                (F.col("_cand") < F.col("lbl")).alias("_chg"),
            )
        ).localCheckpoint(eager=True)
        changed = stepped.filter(F.col("_chg")).limit(1).count()
        labels = stepped.select("node", "lbl")
        if changed == 0:
            break
    return labels


def strongly_connected_components(
    edges: DataFrame,
    *,
    max_outer: int = 10,
    max_prop_iters: int = 30,
) -> DataFrame:
    """(node, scc_id) for every vertex of the (src, dst) long-id edge
    list; scc_id is the minimum vertex id of the component. Self-loops
    and duplicate edges are tolerated (deduped; self-loops don't affect
    SCC membership)."""
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    active = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    settled_parts = []

    for _ in range(max_outer):
        # 1. trim to fixpoint: no in-edges or no out-edges -> singleton
        while True:
            has_out = e.select(F.col("src").alias("node")).distinct()
            has_in = e.select(F.col("dst").alias("node")).distinct()
            interior = active.join(has_out, "node", "left_semi").join(
                has_in, "node", "left_semi"
            )
            trimmed = active.join(interior, "node", "left_anti").localCheckpoint(
                eager=True
            )
            n_trimmed = trimmed.limit(1).count()
            if n_trimmed == 0:
                break
            settled_parts.append(
                trimmed.select("node", F.col("node").alias("scc_id"))
            )
            active = interior.localCheckpoint(eager=True)
            e = (
                e.join(active.withColumnRenamed("node", "src"), "src", "left_semi")
                .join(active.withColumnRenamed("node", "dst"), "dst", "left_semi")
                .localCheckpoint(eager=True)
            )
        if active.limit(1).count() == 0:
            break
        # 2. color: forward and backward min-label fixpoints
        fwd = _propagate_min(active, e, reverse=False, max_iters=max_prop_iters)
        bwd = _propagate_min(active, e, reverse=True, max_iters=max_prop_iters)
        settled = (
            fwd.join(bwd.withColumnRenamed("lbl", "_b"), "node")
            .filter(F.col("lbl") == F.col("_b"))
            .select("node", F.col("lbl").alias("scc_id"))
            .localCheckpoint(eager=True)
        )
        settled_parts.append(settled)
        # 3. shrink the active subgraph
        active = active.join(settled, "node", "left_anti").localCheckpoint(eager=True)
        if active.limit(1).count() == 0:
            break
        e = (
            e.join(active.withColumnRenamed("node", "src"), "src", "left_semi")
            .join(active.withColumnRenamed("node", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )

    out = settled_parts[0]
    for p in settled_parts[1:]:
        out = out.union(p)
    # any still-active vertices after max_outer (pathological chains of
    # giant SCCs) settle as their own id — documented bound, not silent
    leftover = active.join(out, "node", "left_anti").select(
        "node", F.col("node").alias("scc_id")
    )
    return out.union(leftover)


def scc_sizes(scc: DataFrame) -> DataFrame:
    """(node, scc_id, scc_size) from a (node, scc_id) frame — one
    hash-agg + broadcast-back join."""
    sizes = scc.groupBy("scc_id").agg(F.count(F.lit(1)).alias("scc_size"))
    return scc.join(sizes, "scc_id").select("node", "scc_id", "scc_size")
