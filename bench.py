"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion (count triggers the full plan;
results are not collected to the driver). A short warmup query spins up
the JVM/codegen so timings reflect steady-state execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kg_etl_spark.queries import QUERIES  # noqa: E402
from kg_etl_spark.session import get_spark  # noqa: E402

# Headline set: one per capability family (relational agg, multi-hop
# join, window/top-k, z-score, spatial blocking, NN join, components,
# ER chain, text dedup x2, similarity search, sessionization).
HEADLINE = [
    "pricing_summary",
    "multi_hop_revenue",
    "topk_per_group",
    "zscore_bucket",
    "blocked_spatial_pairs",
    "nearest_supplier",
    "spatial_components",
    "er_canonical",
    "exact_dedup",
    "ngram_jaccard_dedup",
    "minhash_lsh_dedup",
    "embedding_topk",
    "embedding_neardup",
    "media_features",
    "sessionize",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("bench")

    # warmup: JVM + parquet footer caches
    QUERIES["filter_project"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        n = QUERIES[name](spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
