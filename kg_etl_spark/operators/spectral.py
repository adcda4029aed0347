"""Spectral graph bisection by deflated power iteration — the
classic normalized-cut relaxation (Shi & Malik, PAMI 2000; Fiedler
1973): iterate v ← D⁻¹A v on the random-walk matrix, deflate the
trivial all-ones eigenvector by removing the degree-weighted mean, and
split nodes by the sign of the resulting approximate second
eigenvector.

Every iterate is DETERMINISTIC and therefore value-checkable by an
unrolled SQL oracle, despite distributed float work: iterate values are
9 dp-rounded doubles, and every corpus-scale sum runs through the
scaled-long device (sum of round(v·10⁹) as BIGINT — exact and
order-independent on any partitioning; queries/vector.py PCA idiom),
with the two per-round scalars (degree-weighted mean numerator, max
|component|) in exact decimal / plain max. All remaining arithmetic is
IEEE +,-,×,÷ over identical values in a pinned order — bit-equal in
Spark and DuckDB.

100 TB shape: per iteration ONE edge-keyed join + node-keyed hash
aggregate (the same budget as a PageRank step) plus two 1-row
aggregates broadcast back; state is one double per node. Degree table
and symmetrized edge list build once.

No reference counterpart file: the reference (chaayagirimon/kg-etl)
has no spectral methods; this extends its graph family (components,
communities) with the standard spectral partitioning primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 1.0e9


def _exact_sum(col):
    """Order-independent exact sum of a 9dp-rounded double column:
    scale to the underlying integer and sum as LONG (PCA idiom —
    round(v·10⁹) sits within 1e-5 of its integer, recovered exactly
    on both engines)."""
    return F.sum(F.round(col * F.lit(_SCALE), 0).cast("long"))


def spectral_bisection(
    edges: DataFrame, *, iterations: int = 3, edges_distinct: bool = False
) -> DataFrame:
    """(node, val, side) — approximate Fiedler-vector bisection of the
    undirected graph given as (a_id, b_id) pairs (symmetrized and
    dedup'd internally). `val` is the iterate after `iterations`
    deflated power steps (6 dp), `side` its sign.

    Start vector: v₀ = ±1 by node parity (deterministic, never
    d-orthogonal to a nontrivial component in practice; parity is the
    catalog's seedless-determinism contract).

    ``edges_distinct``: the caller asserts ``edges`` is ALREADY a
    distinct strict a_id < b_id pair frame at a reusable
    materialization (the catalog's shared undirected-edge cut) — the
    two-direction union is then duplicate- and self-loop-free by
    construction, so the per-call distinct exchange + |E| checkpoint
    copy are skipped and every consumer re-derives the cheap
    projection over the shared cut's blocks instead (the r11
    hits/betweenness contract, r12)."""
    e = edges.select(
        F.col("a_id").cast("long").alias("s"), F.col("b_id").cast("long").alias("t")
    ).union(
        edges.select(
            F.col("b_id").cast("long").alias("s"), F.col("a_id").cast("long").alias("t")
        )
    )
    if not edges_distinct:
        e = e.filter(F.col("s") != F.col("t")).distinct().lineage_cut(eager=True)
    # the degree table is consumed ~5x per call (v0, tot, and the
    # per-iteration left join) and per-consumer pruning kept
    # ReuseExchange from firing — each consumer re-ran the |E| degree
    # aggregate (r12; guide §1.2). LAZY cut: |V| rows, the first
    # consumer materializes it inline. Interleaved A/B at sf0.1
    # (with edges_distinct): 2.81 -> 2.20 s, bit-identical.
    deg = (
        e.groupBy(F.col("s").alias("node"))
        .agg(F.count(F.lit(1)).alias("d"))
        .lineage_cut(eager=False)
    )
    # total degree = 2|E| — a constant across iterations, one scalar agg
    tot = deg.agg(F.sum("d").alias("td"))

    v = deg.select(
        "node", "d", (F.pmod(F.col("node"), F.lit(2)) * 2 - 1).cast("double").alias("v")
    )
    for _ in range(iterations):
        # s_i = Σ_{j ~ i} v_j  (exact scaled-long sum), u_i = s_i / d_i
        sums = (
            e.join(v.select(F.col("node").alias("t"), "v"), "t")
            .groupBy(F.col("s").alias("node"))
            .agg(_exact_sum(F.col("v")).alias("sv"))
        )
        u = (
            deg.join(sums, "node", "left")
            .select(
                "node",
                "d",
                (
                    (F.coalesce("sv", F.lit(0)).cast("double") / F.lit(_SCALE))
                    / F.col("d").cast("double")
                ).alias("u"),
            )
            # three consumers per iteration (the mnum scalar, the mx
            # scalar via centered, and the next iterate) — without a
            # cut each broadcast build re-runs the e ⋈ v join+agg, so
            # the one corpus-scale join of the step ran 3x. LAZY: the
            # mnum job materializes it inline, no standalone round.
            .lineage_cut(eager=False)
        )
        # deflate the trivial eigenvector: m = Σ dᵢuᵢ / Σ dᵢ. The
        # numerator scales at 10⁶ (not 10⁹): per-row magnitude is ≤ dᵢ,
        # so the long partial sums stay exact through Σd = 2|E| ≤ 4.6e12
        # edges; deflation only needs µ-precision, determinism is what
        # matters and the scaled integer gives it on any partitioning.
        mnum = u.agg(
            F.sum(F.round(F.col("d") * F.col("u") * F.lit(1.0e6), 0).cast("long")).alias("mn")
        )
        centered = (
            u.crossJoin(F.broadcast(mnum))
            .crossJoin(F.broadcast(tot))
            .select(
                "node",
                "d",
                (
                    F.col("u")
                    - (F.col("mn").cast("double") / F.lit(1.0e6))
                    / F.col("td").cast("double")
                ).alias("c"),
            )
        )
        # normalize by max |c| so iterates stay in [-1, 1]
        mx = centered.agg(F.max(F.abs(F.col("c"))).alias("mx"))
        v = (
            centered.crossJoin(F.broadcast(mx))
            .select(
                "node",
                "d",
                F.when(
                    F.col("mx") > 0, F.round(F.col("c") / F.col("mx"), 9)
                ).otherwise(F.lit(0.0)).alias("v"),
            )
            # lazy: lineage still cut at first materialization (inside
            # the next iteration's scalar-aggregate job) without paying
            # a standalone job per step
            .lineage_cut(eager=False)
        )
    return v.select(
        "node",
        F.round(F.col("v"), 6).alias("val"),
        (F.col("v") >= 0).alias("side"),
    )
