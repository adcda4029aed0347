"""Maximal independent set via Luby's algorithm with DETERMINISTIC
hash priorities — the classic O(log n)-round parallel MIS (Luby,
SIAM J. Comput. 1986), with the random priorities replaced by a
per-round multiplicative hash of the vertex id, so the result is a
pure function of the graph (re-runnable, and a fixed-round prefix is
value-checkable against unrolled SQL).

Round r:
  priority p_r(v) = (A·v + C·r) mod P          (P = 2^31−1)
  select v if p_r(v) < p_r(u) for EVERY active neighbor u
           (ties impossible: v ↦ A·v mod P is injective on id ranges
            < P, and neighbors are distinct ids)
  deactivate selected ∪ neighbors(selected); repeat.

Every selected set is independent by construction; on termination
(no active vertices) it is maximal: a vertex only deactivates by
being selected or adjacent to a selected vertex.

Scale shape: each round is one edge-keyed shuffle (min neighbor
priority per vertex — a hash-agg over the active edge list) + a
changed-count scalar; the active subgraph shrinks geometrically in
expectation (Luby's analysis carries over to hash priorities acting
pairwise-independently here). Same per-round budget as PageRank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_A = 1_103_515_245
_C = 1_013_904_223
_P = 2_147_483_647


def _prio(node, r: int):
    return (F.lit(_A) * node + F.lit(_C * (r + 1))) % F.lit(_P)


def luby_mis(edges: DataFrame, *, max_rounds: int = 30) -> DataFrame:
    """(node, selected, round) for every vertex of the undirected
    (src, dst) long-id edge list (each edge may be given once in
    either direction; it is symmetrized internally). `round` is the
    Luby round at which the vertex was settled (selected or
    dominated); isolated vertices don't appear (no edges)."""
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct().localCheckpoint(eager=True)
    active = sym.select(F.col("src").alias("node")).distinct().localCheckpoint(eager=True)
    settled_parts = []
    adj = sym
    for r in range(max_rounds):
        if active.limit(1).count() == 0:
            break
        min_nbr = (
            adj.select(
                "src", _prio(F.col("dst"), r).alias("_np")
            )
            .groupBy("src")
            .agg(F.min("_np").alias("_mn"))
        )
        marked = (
            active.join(min_nbr.withColumnRenamed("src", "node"), "node", "left")
            .select(
                "node",
                (
                    F.col("_mn").isNull()  # isolated in active subgraph
                    | (_prio(F.col("node"), r) < F.col("_mn"))
                ).alias("_sel"),
            )
            .localCheckpoint(eager=True)
        )
        selected = marked.filter(F.col("_sel")).select("node")
        dominated = (
            adj.join(selected.withColumnRenamed("node", "src"), "src", "left_semi")
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        settled_parts.append(
            selected.select(
                "node", F.lit(True).alias("selected"), F.lit(r).alias("round")
            ).union(
                dominated.join(selected, "node", "left_anti").select(
                    "node", F.lit(False).alias("selected"), F.lit(r).alias("round")
                )
            ).localCheckpoint(eager=True)
        )
        gone = settled_parts[-1].select("node")
        active = active.join(gone, "node", "left_anti").localCheckpoint(eager=True)
        adj = (
            adj.join(active.withColumnRenamed("node", "src"), "src", "left_semi")
            .join(active.withColumnRenamed("node", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
    out = settled_parts[0]
    for p in settled_parts[1:]:
        out = out.union(p)
    return out
