"""Partitioning-determinism gate (catalog contract item: double-run
under different shuffle.partitions).

The oracle check runs each query once, so a value that depends on
partition count / partition order (unrounded float aggregation order,
a missing rank tie-break, first()/head() semantics) can pass it and
still flap between environments — exactly the class the driver's
value-hash would catch one round later. This gate runs every catalog
query TWICE in the same JVM, in two sessions whose only difference is
`spark.sql.shuffle.partitions` (7 vs 32 — coprime, so hash placement
differs for every key), and diffs the full sorted value sets.

Usage: python tools/check_determinism.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import sys
import time


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    name_filter = argv[1:]

    sys.path.insert(0, ".")
    from check_oracle import frame_repr  # reuse the dtype-faithful repr

    from kg_etl_spark.queries import QUERIES
    from kg_etl_spark.session import get_spark

    s1 = get_spark("determinism_a", shuffle_partitions="7")
    s2 = s1.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "32")

    failures = 0
    for name, fn in QUERIES.items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        t0 = time.time()
        try:
            a = fn(s1, sf_dir).toPandas()
            b = fn(s2, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: error: {e}")
            failures += 1
            continue
        ca, ra = frame_repr(list(a.columns), list(a.itertuples(index=False, name=None)))
        cb, rb = frame_repr(list(b.columns), list(b.itertuples(index=False, name=None)))
        if ca != cb or ra != rb:
            ndiff = sum(1 for x, y in zip(ra, rb) if x != y) + abs(len(ra) - len(rb))
            print(f"FAIL  {name}: differs across partitionings ({ndiff} rows)")
            failures += 1
        else:
            print(f"ok    {name}: rows={len(ra)} [{time.time()-t0:.1f}s]")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
