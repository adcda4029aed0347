"""Interleaved min-of-N timing for a set of catalog queries — the
bench-noise protocol's per-query A/B instrument (r7 verdict #4).

Cross-RUN comparisons on this box are unreliable (co-tenant load
spikes mid-run inflate untouched map-side controls 3-4x), so suspected
regressions are re-measured here: all queries interleave round-robin
in ONE process (so a load burst hits every query equally), each gets
min-of-N, and the 1-minute load average is stamped before and after.
Read the results against the controls — if a control moved, it was the
box.

Usage: python tools/ab_queries.py [sf_dir] name [name...]
       (default sf_dir /root/testdata/sf0.1; 3 rounds; the three
        map-side noise controls are always appended)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kg_etl_spark.queries import QUERIES  # noqa: E402
from kg_etl_spark.session import get_spark  # noqa: E402

CONTROLS = ["gopher_quality", "exact_dedup", "char_entropy"]
ROUNDS = 3


def main():
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    names = list(dict.fromkeys(args + CONTROLS))
    spark = get_spark("ab-queries")
    # warm the scans + JVM so round 1 is steady-state
    for name in names:
        QUERIES[name](spark, sf_dir).count()
    load0 = os.getloadavg()[0]
    best: dict = {}
    for _ in range(ROUNDS):
        for name in names:
            t0 = time.time()
            QUERIES[name](spark, sf_dir).count()
            dt = time.time() - t0
            best[name] = min(best.get(name, dt), dt)
    load1 = os.getloadavg()[0]
    print(f"# load_1m start={load0:.2f} end={load1:.2f} rounds={ROUNDS}")
    for name in names:
        tag = " (control)" if name in CONTROLS and name not in args else ""
        print(f"{name}: {best[name]:.3f}s{tag}")


if __name__ == "__main__":
    main()
