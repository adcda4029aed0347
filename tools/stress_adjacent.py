"""50M-event stress probe for the scale-safe stream lead
(operators/adjacent.py) — the r5 VERDICT directive #1 acceptance test.

Shape: 50M synthetic events over 5 event types (the catalog's exact
low-cardinality regime), so the NAIVE Window.partitionBy(event_type)
form must sort 10M rows in ONE task while with_next spreads the same
work over 5 x num_ranges cells.  The probe:

1. runs the transition-edge derivation through with_next and times it;
2. runs the naive single-window form on the same frame;
3. asserts an EXACT aggregate signature match (count + hash-sums of
   (src, dst)) — the bit-identity contract at 50x the bench SF;
4. reports both wall times (the device must not be slower than the
   straggler form even on local[32], where the naive form's single
   task still fits in memory — at cluster scale it simply dies).

Usage: python tools/stress_adjacent.py [n_events]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from kg_etl_spark.operators.adjacent import transition_edges  # noqa: E402
from kg_etl_spark.session import get_spark  # noqa: E402


def synth_events(spark, n: int):
    # deterministic scramble: ts order differs from id order per type,
    # so the sort actually has to work; user ids collide across types
    ev = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.concat(F.lit("t"), (F.col("id") % 5).cast("string")).alias("event_type"),
        ((F.col("id") * 2654435761) % 1000003).alias("user_id"),
        F.timestamp_micros(
            (F.col("id") * 1315423911 % 4000000000).cast("long")
        ).alias("ts"),
    )
    return ev


def signature(edges):
    e = edges.select(
        F.col("src").cast("long").alias("s"), F.col("dst").cast("long").alias("d")
    )
    return e.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("s") * 31 + F.col("d")) % 1000000007).alias("h1"),
        F.sum((F.col("s") + F.col("d") * 131) % 998244353).alias("h2"),
    ).collect()[0]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    one_type = "--one-type" in sys.argv
    spark = get_spark("stress-adjacent")
    ev = synth_events(spark, n).localCheckpoint(eager=True)
    if one_type:
        # worst case: the ENTIRE stream is one group (cardinality 1 —
        # the naive window would sort all n rows in a single task);
        # the device still splits into num_ranges ts cells
        ev = ev.withColumn("event_type", F.lit("t0")).localCheckpoint(eager=True)

    t0 = time.time()
    sig_dev = signature(transition_edges(ev))
    t_dev = time.time() - t0

    w = Window.partitionBy("event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    naive = (
        ev.select(
            F.col("user_id").alias("src"), F.lead("user_id").over(w).alias("dst")
        )
        .filter(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
    )
    t0 = time.time()
    sig_naive = signature(naive)
    t_naive = time.time() - t0

    assert tuple(sig_dev) == tuple(sig_naive), (
        f"signature mismatch: device={tuple(sig_dev)} naive={tuple(sig_naive)}"
    )
    label = "one-type " if one_type else ""
    print(
        f"OK {label}n={n}: edges={sig_dev['n']} device={t_dev:.1f}s "
        f"naive_single_task_window={t_naive:.1f}s"
    )


if __name__ == "__main__":
    main()
