"""Local replica of the driver's correctness gate.

For each catalog query: run the Spark plan and the DuckDB oracle at the
given SF, compare row count, column names, and an order-insensitive
value comparison (columns sorted by name, rows sorted, values
stringified). Prints one line per query.

Usage: python tools/check_oracle.py [--vanilla] [sf_dir] [name_filter...]

--vanilla builds a bare SparkSession (no get_spark configs), replicating
the external driver's injected session — catches configs our queries
wrongly assume were set at builder time.
"""

from __future__ import annotations

import sys
import time

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(bool(v)).lower()
    return str(v)


def frame_repr(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def main():
    argv = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    name_filter = argv[1:]

    sys.path.insert(0, ".")
    from kg_etl_spark.queries import ORACLES, QUERIES
    from kg_etl_spark.session import get_spark

    if vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("oracle_check_vanilla")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name, fn in QUERIES.items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in ORACLES:
            print(f"ok*   {name}: rows={len(srows)} (no oracle, rows-only) [{time.time()-t0:.1f}s]")
            if len(srows) == 0:
                print(f"      WARN: zero rows from {name}")
            continue
        try:
            res = con.execute(ORACLES[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            failures += 1
            continue
        sc, sr = frame_repr(scols, srows)
        oc, orr = frame_repr(ocols, orows)
        status = []
        if len(srows) != len(orows):
            status.append(f"rowcount {len(srows)} != {len(orows)}")
        if sc != oc:
            status.append(f"cols {sc} != {oc}")
        if not status and sr != orr:
            ndiff = sum(1 for a, b in zip(sr, orr) if a != b)
            for a, b in zip(sr, orr):
                if a != b:
                    status.append(f"values differ ({ndiff} rows; first: {a} vs {b})")
                    break
        if status:
            print(f"FAIL  {name}: {'; '.join(status)} [{time.time()-t0:.1f}s]")
            failures += 1
        else:
            print(f"ok    {name}: rows={len(srows)} [{time.time()-t0:.1f}s]")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
