"""Stress the connected-components cutover (VERDICT r1 item 6).

Builds synthetic ER-shaped edge lists (many ~10-node clusters — the
shape resolve_entities feeds components) at several sizes and times the
single-task union-find path vs the distributed min-label iteration, so
`small_threshold` is set from measurement instead of guesswork.

Usage: python tools/stress_components.py [n_edges ...]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from kg_etl_spark.operators.components import components_iterative, connected_components
from kg_etl_spark.session import get_spark


def make_edges(spark, n_edges: int, cluster: int = 10):
    # nodes 0..N-1 in clusters of `cluster`; edges chain each cluster and
    # add one intra-cluster extra edge per node (ER-accept-like density)
    n_nodes = n_edges  # ~1 edge per node at this density
    df = spark.range(n_nodes).withColumn("c", (F.col("id") / cluster).cast("long"))
    chain = df.filter((F.col("id") + 1) % cluster != 0).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    extra = df.filter(F.col("id") % cluster >= 2).select(
        F.col("id").alias("src"), (F.col("id") - 2).alias("dst")
    )
    return chain.union(extra).localCheckpoint(eager=True)


def main():
    sizes = [int(x) for x in sys.argv[1:]] or [200_000, 1_000_000, 2_000_000, 5_000_000]
    spark = get_spark("stress_components")
    print(f"{'edges':>10} {'single-task uf':>15} {'iterative':>10}")
    for n in sizes:
        e = make_edges(spark, n)
        ne = e.count()

        t0 = time.time()
        r1 = connected_components(e, small_threshold=10**12)  # force single-task
        c1 = r1.groupBy().agg(F.countDistinct("comp").alias("k")).collect()[0]["k"]
        t1 = time.time() - t0

        t0 = time.time()
        r2 = components_iterative(e)
        c2 = r2.groupBy().agg(F.countDistinct("comp").alias("k")).collect()[0]["k"]
        t2 = time.time() - t0

        assert c1 == c2, f"component counts differ: {c1} vs {c2}"
        print(f"{ne:>10} {t1:>14.1f}s {t2:>9.1f}s   ({c1} comps)")


if __name__ == "__main__":
    main()
