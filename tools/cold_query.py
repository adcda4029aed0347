"""Cold-session single-query timing — the r11 verdict's adjudication
protocol for rows whose official numbers contradict the interleaved
A/B pins ("the warm interleaved instrument flatters state a cold
official never sees").

Reproduces the official bench's per-row conditions exactly, for ONE
query, in a FRESH process: same session factory, same 32g driver heap
default, warmup of that query at sf0.001 (codegen/JIT), then min-of-N
timed attempts at the target SF with the bench's state flush between
attempts. Because the process is cold and runs one query, nothing
warm-process (page cache of prior queries, memoized shared cuts,
JIT from 96 other plans) flatters the number.

Usage: python tools/cold_query.py <name> [sf_dir] [attempts]
Prints one line: <name>: min=<s> attempts=[...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

from kg_etl_spark.queries import QUERIES  # noqa: E402
from kg_etl_spark.session import get_spark  # noqa: E402

WARMUP_SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n_attempts = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    import bench  # noqa: E402 - reuse the bench's flush helper

    spark = get_spark("cold-query")
    bench._SPARK = spark
    QUERIES["filter_project"](spark, WARMUP_SF_DIR).count()
    QUERIES[name](spark, WARMUP_SF_DIR).count()
    bench._drop_query_state()

    attempts: list[float] = []
    for _ in range(n_attempts):
        t0 = time.time()
        QUERIES[name](spark, sf_dir).count()
        attempts.append(round(time.time() - t0, 3))
        bench._drop_query_state()
    print(
        f"{name}: min={min(attempts)} attempts={attempts} "
        f"load1m={os.getloadavg()[0]:.2f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
