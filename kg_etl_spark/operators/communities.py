"""Synchronous label propagation (community detection) as DataFrame
algebra, with a deterministic tie rule so runs — and the DuckDB oracle
— are reproducible (classic LPA breaks frequency ties randomly; here
ties go to the smallest label).

Per iteration: one join (neighbor labels), one count aggregate, one
window argmax — all shuffles keyed on node, re-using the same
partitioning every round. Integer-only arithmetic: no float
determinism caveats anywhere. Like the PageRank twin, lineage depth is
a small constant (synchronous updates, driver loop).

At 100 TB the count aggregate is the skew point (a celebrity node
aggregates one row per distinct neighbor label); AQE skew-join plus
the bounded label alphabet after a few rounds keep it tractable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_propagation(edges: DataFrame, iterations: int = 2) -> DataFrame:
    """Communities for an undirected graph given as unique (a_id, b_id)
    pairs: returns (node, label) after ``iterations`` synchronous
    rounds from label = own id. A node adopts its neighborhood's most
    frequent label (ties → smallest label)."""
    sym = edges.select(F.col("a_id").alias("u"), F.col("b_id").alias("v")).union(
        edges.select(F.col("b_id").alias("u"), F.col("a_id").alias("v"))
    )
    labels = sym.select(F.col("u").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(iterations):
        nb = sym.join(labels, sym["v"] == labels["node"]).select(
            F.col("u").alias("n"), "label"
        )
        cnt = nb.groupBy("n", "label").agg(F.count(F.lit(1)).alias("c"))
        w = Window.partitionBy("n").orderBy(F.col("c").desc(), F.col("label").asc())
        labels = (
            cnt.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("n").alias("node"), "label")
        )
    return labels


def modularity(edges: DataFrame, assignment: DataFrame) -> DataFrame:
    """Newman modularity of a community assignment over an undirected
    graph: per-community contribution rows plus the grand total.

    ``edges``: unique (a_id, b_id) pairs, no self-loops/duplicates.
    ``assignment``: (node, community) — every edge endpoint must be
    assigned exactly once.

    Q = sum_c [ e_c / m  -  (d_c / (2m))^2 ]  where m = |E|, e_c =
    intra-community edge count, d_c = total degree of community c.
    Returns (community, intra_edges, degree_sum, contribution) plus a
    community = NULL row carrying Q in `contribution`.

    All inputs to the float division are exact integer aggregates
    (counts and degree sums), so the result is order-independent and a
    plain SQL oracle replays it bit-for-bit. Execution: two broadcast-
    or hash-joins to tag edge endpoints with communities, one edge
    hash-agg, one node hash-agg, one 1-row total cross — no windows,
    no iteration. At 100 TB: the joins key on node ids (the same
    partitioning label-propagation already uses); the rollup output is
    one row per community."""
    asg_a = assignment.select(F.col("node").alias("a_id"), F.col("community").alias("ca"))
    asg_b = assignment.select(F.col("node").alias("b_id"), F.col("community").alias("cb"))
    # the tagged edge list is the multi-consumer cut (m, intra, deg all
    # read it): materialize ONCE so an expensive upstream edge plan —
    # a blocked spatial self-join, an LSH band join — is not re-executed
    # per consumer. LAZY (r12): the count() right below is the first
    # consumer and materializes it inline — the eager form paid a whole
    # standalone scheduling round for the same blocks (guide §5,
    # the e0d3c28 pattern).
    tagged = edges.join(asg_a, "a_id").join(asg_b, "b_id").lineage_cut(eager=False)

    # m from the TAGGED frame: edges with an unassigned endpoint drop
    # out of the inner joins and must not count toward 2m either
    m = tagged.count()
    if m == 0:
        raise ValueError("modularity of an empty edge set is undefined")

    intra = (
        tagged.filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("community"))
        .agg(F.count(F.lit(1)).alias("intra_edges"))
    )
    # degree sums: each edge contributes 1 to each endpoint's community
    deg = (
        tagged.select(F.col("ca").alias("community"))
        .union(tagged.select(F.col("cb").alias("community")))
        .groupBy("community")
        .agg(F.count(F.lit(1)).alias("degree_sum"))
    )
    # explicit ratio*ratio (not **2): POWER() routes through libm pow
    # on one engine and exact squaring on the other — multiplication is
    # IEEE-identical everywhere
    ratio = F.col("degree_sum") / F.lit(2.0 * m)
    per_c = (
        deg.join(intra, "community", "left")
        .fillna(0, subset=["intra_edges"])
        .withColumn(
            "contribution",
            F.round(F.col("intra_edges") / F.lit(float(m)) - ratio * ratio, 6),
        )
    )
    # the grand total from EXACT integer/decimal sums only (the repo's
    # order-independence discipline): Q = sum(e_c)/m - sum(d_c^2)/(2m)^2
    total = per_c.agg(
        F.lit(None).cast(per_c.schema["community"].dataType).alias("community"),
        F.sum("intra_edges").alias("intra_edges"),
        F.sum("degree_sum").alias("degree_sum"),
        F.round(
            (
                F.sum("intra_edges").cast("decimal(38,0)").cast("double") / F.lit(float(m))
            )
            - (
                F.sum(F.col("degree_sum").cast("decimal(38,0)") * F.col("degree_sum"))
                .cast("double")
                / F.lit(float(2 * m) * float(2 * m))
            ),
            6,
        ).alias("contribution"),
    )
    return per_c.unionByName(total)
