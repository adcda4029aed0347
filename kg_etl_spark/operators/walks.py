"""Deterministic random walks over a directed graph — the
DeepWalk/node2vec corpus-generation stage (Perozzi et al., KDD'14),
made reproducible: the "random" neighbor at step t of the walk started
at `origin` is chosen by a hash of (origin, t, current), so the walk
corpus is a pure function of the graph — re-runnable, diffable, and
value-checkable against a SQL oracle (no RNG state, no seed plumbing
across executors).

Step rule: neighbors of `cur` ranked by dst id; pick
    rank = H(origin, t, cur) mod outdeg(cur) + 1
    H(o, t, c) = (A·(o&M) + B·(c&M) + C·t) mod P
(P = 2^31−1 prime; M = the low-31-bit mask, so every product stays
below 2^63 — no overflow in either engine at any id, one bitwise op
per operand). Dead ends absorb (walk stays at a sink node).

Scale shape: the neighbor table (src, dst, rank, deg) is built once —
one window pass over the edge list. Each of the `length` steps is ONE
equi-join of the walk frontier against it on (cur = src, rank) — both
sides hash-partitioned on the node key, so Catalyst reuses the
partitioning across steps; the frontier never exceeds |V| rows. At
100 TB this is `length` edge-keyed shuffles, the same budget as
`length` PageRank iterations, and the emitted corpus streams to the
sink without ever concentrating on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_A = 1_315_423_911
_B = 2_654_435_761
_C = 97_531
_D = 40_503
_P = 2_147_483_647


_MASK = 0x7FFFFFFF  # low 31 bits


def _m31(x):
    # ids reduce to their low 31 bits BEFORE the multiply: raw _B * id
    # overflows a long for ids above ~3.4e9 and Spark wraps silently
    # while DuckDB raises. The bitwise mask (identical two's-complement
    # semantics in both engines, negatives included) keeps the weighted
    # sum below (A+B+D)·(2³¹−1) + C·t ≈ 8.53e18 < 2^63 — exact
    # everywhere — at ONE bitwise op per operand. An earlier
    # F.pmod-per-operand form cost 8 long divisions per row and slowed
    # node2vec_corpus 1.98 s → 2.91 s at sf0.1; the mask restores the
    # raw-formula speed. The masked sum is non-negative, so the outer
    # plain % is already the canonical residue.
    return x.bitwiseAND(F.lit(_MASK))


def _pick(origin, t: int, cur):
    return (_A * _m31(origin) + _B * _m31(cur) + F.lit(_C * t)) % F.lit(_P)


def _pick2(origin, t: int, cur, prev):
    # second-order variant: the choice must depend on the edge
    # (prev, cur), not cur alone, or every visit to a node from any
    # predecessor would repeat the same successor
    return (
        _A * _m31(origin) + _B * _m31(cur) + _D * _m31(prev) + F.lit(_C * t)
    ) % F.lit(_P)


def deterministic_walks(
    edges: DataFrame, *, length: int = 3, checkpoint_every: int = 4
) -> DataFrame:
    """(origin, step, node) walk corpus: one walk of `length` steps
    from every vertex of the (src, dst) long-id edge list (step 0 is
    the origin itself).

    Lineage: the frontier is checkpointed only every
    `checkpoint_every` steps — short walks keep the whole chain lazy
    (one job, Catalyst fuses the per-step joins; measured 2.5 s → 1.1 s
    at sf0.1 for length 3), long walks cut lineage periodically so the
    recompute-per-emitted-step branch stays O(checkpoint_every) deep."""
    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    w = Window.partitionBy("src").orderBy("dst")
    # dedup (src, dst) INSIDE the window's own src-partitioning via a
    # lag filter instead of a standalone .distinct(): duplicates sort
    # adjacent, so this removes the extra (src, dst)-keyed exchange +
    # hash-dedup the distinct would add before the rank/deg windows
    # (the windows re-count AFTER the filter — same exchange, same
    # sort, so rank/deg are exactly the distinct-edge-list values)
    nbrs = (
        e.withColumn("_dup", F.lag("dst").over(w).eqNullSafe(F.col("dst")))
        .filter(~F.col("_dup"))
        .select(
            "src",
            "dst",
            F.row_number().over(w).alias("rank"),
            F.count(F.lit(1)).over(
                Window.partitionBy("src").rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ).alias("deg"),
        )
        .lineage_cut(eager=True)
    )
    # derive the vertex set from the MATERIALIZED cut, not the raw
    # edge input — the upstream edge lineage (often a window over an
    # event log) is then computed exactly once per walk build
    nodes = (
        nbrs.select(F.col("src").alias("node"))
        .union(nbrs.select(F.col("dst").alias("node")))
        .distinct()
    )
    frontier = nodes.select(F.col("node").alias("origin"), F.col("node").alias("cur"))
    out = [frontier.select("origin", F.lit(0).alias("step"), F.col("cur").alias("node"))]
    for t in range(1, length + 1):
        step = (
            frontier.join(
                nbrs.withColumnRenamed("src", "cur"), "cur", "left"
            )
            .filter(
                F.col("rank").isNull()
                | (
                    F.col("rank")
                    == _pick(F.col("origin"), t, F.col("cur")) % F.col("deg") + 1
                )
            )
            .select(
                "origin",
                F.coalesce("dst", F.col("cur")).alias("cur"),
            )
        )
        frontier = (
            step.lineage_cut(eager=True)
            if (t % checkpoint_every == 0 and t < length)
            else step
        )
        out.append(
            frontier.select(
                "origin", F.lit(t).alias("step"), F.col("cur").alias("node")
            )
        )
    corpus = out[0]
    for part in out[1:]:
        corpus = corpus.union(part)
    return corpus


def node2vec_walks(
    edges: DataFrame,
    *,
    length: int = 3,
    return_weight: int = 500,
    out_weight: int = 2000,
    checkpoint_every: int = 4,
) -> DataFrame:
    """(origin, step, node) SECOND-ORDER biased walk corpus — the
    node2vec step rule (Grover & Leskovec, KDD'16 §3.2), deterministic
    like `deterministic_walks`: the transition at step t depends on
    (prev, cur), weighting each candidate successor x of cur by

        return_weight   if x == prev            (node2vec 1/p)
        1000            if edge prev→x exists   (distance 1)
        out_weight      otherwise               (node2vec 1/q)

    Integer milli-weights keep the selection exact in both engines:
    candidates are ranked by dst id, weights prefix-summed, and the
    pick is the candidate whose cumulative interval contains
    H(origin, t, cur, prev) mod Σw. Step 1 has no predecessor and is
    uniform (the first-order `_pick` rule, identical to
    `deterministic_walks`). Dead ends absorb.

    Scale shape: per step, ONE equi-join of the frontier against the
    neighbor table on the node key, ONE broadcast-free equi-join of
    the candidate set against the edge set on (prev, dst) for the
    distance-1 marker, and ONE window over the per-origin candidate
    group (size = outdeg(cur)) for the prefix sums — 3 edge-keyed
    shuffles per step instead of plain DeepWalk's 1, the documented
    cost of second-order bias. The frontier never exceeds |V| rows;
    lineage is cut every `checkpoint_every` steps as in
    `deterministic_walks`."""
    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    w = Window.partitionBy("src").orderBy("dst")
    # same in-partition lag dedup as deterministic_walks: duplicates
    # sort adjacent under the windows' own (src, dst) order, so the
    # standalone .distinct() exchange is redundant
    nbrs = (
        e.withColumn("_dup", F.lag("dst").over(w).eqNullSafe(F.col("dst")))
        .filter(~F.col("_dup"))
        .select(
            "src",
            "dst",
            F.row_number().over(w).alias("rank"),
            F.count(F.lit(1)).over(
                Window.partitionBy("src").rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ).alias("deg"),
        )
        .lineage_cut(eager=True)
    )
    # marker/nodes read the MATERIALIZED deduped cut: marker must be
    # duplicate-free (a dup (prev, dst) row would fan out the _d1
    # left join), and neither needs a second pass over the raw edge
    # lineage
    marker = nbrs.select(F.col("src").alias("prev"), F.col("dst"), F.lit(1).alias("_d1"))
    nodes = (
        nbrs.select(F.col("src").alias("node"))
        .union(nbrs.select(F.col("dst").alias("node")))
        .distinct()
    )

    # step 1: uniform (no predecessor), same rule as deterministic_walks
    frontier = nodes.select(F.col("node").alias("origin"), F.col("node").alias("cur"))
    out = [frontier.select("origin", F.lit(0).alias("step"), F.col("cur").alias("node"))]
    step1 = (
        frontier.join(nbrs.withColumnRenamed("src", "cur"), "cur", "left")
        .filter(
            F.col("rank").isNull()
            | (F.col("rank") == _pick(F.col("origin"), 1, F.col("cur")) % F.col("deg") + 1)
        )
        .select(
            "origin",
            F.col("cur").alias("prev"),
            F.coalesce("dst", F.col("cur")).alias("cur"),
        )
    )
    frontier = step1
    out.append(frontier.select("origin", F.lit(1).alias("step"), F.col("cur").alias("node")))

    for t in range(2, length + 1):
        cand = frontier.join(
            nbrs.select(F.col("src").alias("cur"), F.col("dst"), F.col("deg")),
            "cur",
            "left",
        ).join(marker, ["prev", "dst"], "left")
        weight = (
            F.when(F.col("dst") == F.col("prev"), F.lit(return_weight))
            .when(F.col("_d1").isNotNull(), F.lit(1000))
            .otherwise(F.lit(out_weight))
        )
        ww = Window.partitionBy("origin").orderBy("dst")
        csum = cand.select(
            "origin",
            "prev",
            "cur",
            "dst",
            F.sum(weight).over(ww).alias("_hi"),
            (F.sum(weight).over(ww) - weight).alias("_lo"),
            F.sum(weight).over(
                Window.partitionBy("origin").rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ).alias("_tot"),
        )
        # materialize the hash pick ONCE: inlining it into both range
        # comparisons doubles the (mod-P-reduced, 4-modulo) expression
        # per candidate row — measured 2.5 s → 1.8 s at sf0.1
        step = (
            csum.withColumn(
                "_r", _pick2(F.col("origin"), t, F.col("cur"), F.col("prev")) % F.col("_tot")
            )
            .filter(
                F.col("dst").isNull()
                | ((F.col("_lo") <= F.col("_r")) & (F.col("_r") < F.col("_hi")))
            )
            .select(
                "origin",
                F.col("cur").alias("prev"),
                F.coalesce("dst", F.col("cur")).alias("cur"),
            )
        )
        frontier = (
            step.lineage_cut(eager=True)
            if (t % checkpoint_every == 0 and t < length)
            else step
        )
        out.append(
            frontier.select("origin", F.lit(t).alias("step"), F.col("cur").alias("node"))
        )
    corpus = out[0]
    for part in out[1:]:
        corpus = corpus.union(part)
    return corpus
