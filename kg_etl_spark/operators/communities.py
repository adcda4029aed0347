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
