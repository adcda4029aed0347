"""GNN-style scalar feature propagation (graph smoothing): r rounds of
    x_r(v) = blend(x_{r-1}(v), mean_{u∈N(v)} x_{r-1}(u))

— the label/feature-smoothing primitive used to densify node features
before training (a batch analog of one GCN mean-aggregate layer per
round, without the learned weights).

Spark-first: each round is one groupBy(dst) aggregate over the edge
list joined to the current features — partial map-side aggregation, a
single shuffle per round keyed by node. Nodes with no neighbors keep
their own feature.

Determinism — FIXED-POINT, not float: features ride as integer
micro-units (1e-6). Neighbor means and the α-blend are computed with
explicit half-up integer rounding,
    mean  = floor((2·Σ + c) / (2c)),
    blend = floor((2·(q-p)·x + 2·p·m + q) / (2q))   for α = p/q,
so every intermediate is an exact integer on every engine — no
float-summation order, no ROUND-at-half divergence (a first draft
blended 6-dp doubles and hit exactly the 5·10⁻⁷ half-boundary where
Spark's BigDecimal HALF_UP and DuckDB's double ROUND disagree; means
of k-dp values land on such boundaries CONSTANTLY, so fixed-point is
the only stable contract). All intermediates stay < 2^53, so the
double-division-then-floor evaluation is exact. The SQL oracle
replays the same integer trajectory (queries/relational.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _half_up_div(num: Column, den: Column) -> Column:
    """floor((2·num + den) / (2·den)) = round-half-up(num/den); exact
    while |2·num + den| < 2^53."""
    return F.floor((2 * num + den) / (2 * den)).cast("long")


def feature_propagation(
    edges: DataFrame,
    feats: DataFrame,
    *,
    rounds: int = 2,
    alpha_num: int = 1,
    alpha_den: int = 2,
    node_col: str = "node",
    feat_col: str = "feat_micro",
) -> DataFrame:
    """edges: (src, dst) directed — include both directions for an
    undirected graph. feats: (node, feat_micro bigint) — the feature
    in 1e-6 fixed-point. Returns (node, feat_micro) after `rounds`
    smoothing rounds with α = alpha_num/alpha_den."""
    p, q = alpha_num, alpha_den
    cur = feats.select(F.col(node_col), F.col(feat_col).cast("long").alias(feat_col))
    for _ in range(rounds):
        nb = (
            edges.join(cur, edges["src"] == cur[node_col])
            .groupBy(edges["dst"].alias("_n"))
            .agg(
                F.sum(F.col(feat_col)).alias("_s"),
                F.count(F.lit(1)).alias("_c"),
            )
            .select(F.col("_n"), _half_up_div(F.col("_s"), F.col("_c")).alias("_mean"))
        )
        blended = F.floor(
            (2 * (q - p) * F.col(feat_col) + 2 * p * F.col("_mean") + q) / (2 * q)
        ).cast("long")
        cur = cur.join(nb, cur[node_col] == nb["_n"], "left").select(
            F.col(node_col),
            F.when(F.col("_mean").isNotNull(), blended)
            .otherwise(F.col(feat_col))
            .alias(feat_col),
        )
    return cur
