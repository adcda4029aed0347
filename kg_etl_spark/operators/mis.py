"""Maximal independent set via Luby's algorithm with DETERMINISTIC
hash priorities — the classic O(log n)-round parallel MIS (Luby,
SIAM J. Comput. 1986), with the random priorities replaced by a
per-round multiplicative hash of the vertex id, so the result is a
pure function of the graph (re-runnable, and a fixed-round prefix is
value-checkable against unrolled SQL).

Round r:
  priority p_r(v) = (A^(r+1)·(v mod P) + C) mod P     (P = 2^31−1)
  select v if (p_r(v), v) <lex (p_r(u), u) for EVERY active neighbor
           u — the node id breaks priority ties (ids ≥ P or congruent
           mod P can collide in p_r; the lexicographic struct
           comparison keeps the selection a strict total order, so no
           adjacent pair can deadlock across rounds)
  deactivate selected ∪ neighbors(selected); repeat.

The round enters MULTIPLICATIVELY (A^(r+1) mod P, computed in Python
per round): per-round priority orders decorrelate, preserving Luby's
geometric-shrink expectation — an additive round shift would cancel
in every comparison and freeze one global order, degenerating to
sequential greedy MIS on adversarial chains. Round 0 reduces to
(A·v + C) mod P, which is what the planted-recall oracle unrolls.
(v mod P) is applied before the multiply so the arithmetic stays
within 64 bits for any long id: (P−1)² < 2⁶³.

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
    a = pow(_A, r + 1, _P)  # Python-side: r is a loop constant
    return (F.lit(a) * F.pmod(node, F.lit(_P)) + F.lit(_C)) % F.lit(_P)


def _prio_key(node, r: int):
    """Lexicographic (priority, id) — the tie-broken total order."""
    return F.struct(_prio(node, r).alias("p"), node.alias("n"))


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
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct().lineage_cut(eager=True)
    active = sym.select(F.col("src").alias("node")).distinct().lineage_cut(eager=True)
    settled_parts = []
    adj = sym
    for r in range(max_rounds):
        if active.limit(1).count() == 0:
            break
        min_nbr = (
            adj.select(
                "src", _prio_key(F.col("dst"), r).alias("_np")
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
                    | (_prio_key(F.col("node"), r) < F.col("_mn"))
                ).alias("_sel"),
            )
            .lineage_cut(eager=True)
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
            ).lineage_cut(eager=True)
        )
        gone = settled_parts[-1].select("node")
        active = active.join(gone, "node", "left_anti").lineage_cut(eager=True)
        adj = (
            adj.join(active.withColumnRenamed("node", "src"), "src", "left_semi")
            .join(active.withColumnRenamed("node", "dst"), "dst", "left_semi")
            .lineage_cut(eager=True)
        )
    if not settled_parts:  # empty input / self-loops only: no vertices
        return active.select(
            "node",
            F.lit(True).alias("selected"),
            F.lit(0).alias("round"),
        ).limit(0)
    out = settled_parts[0]
    for p in settled_parts[1:]:
        out = out.union(p)
    return out
