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
    """Dtype-faithful stringification.

    Must be at least as strict as the external driver: the driver reads the
    DuckDB oracle through pandas, where an uncast integer SUM (HUGEINT)
    lands as float64 — so a float-typed 7973.0 must NOT collapse to the
    same string as a bigint 7973.  (Round-2 lesson: the old norm_cell did
    collapse them and masked 3 driver-red oracles.)
    """
    import math

    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v)).lower()
    if isinstance(v, (float, np.floating)):
        v = float(v)
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if isinstance(v, np.integer):
        return str(int(v))
    if isinstance(v, np.ndarray):
        return "[" + ", ".join(norm_cell(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(norm_cell(x) for x in v) + "]"
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
            # Both sides go through pandas, like the driver: a NULL-bearing
            # int column becomes float64 with NaN on BOTH sides (Spark
            # toPandas and DuckDB .df() agree), while an uncast DuckDB
            # HUGEINT sum becomes float64 against Spark's int64 — the
            # exact asymmetry the driver's hash sees.
            spdf = sdf.toPandas()
            srows = list(spdf.itertuples(index=False, name=None))
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
            # Go through pandas (.df()) like the external driver does, so
            # DuckDB HUGEINT/DECIMAL dtype artifacts surface identically
            # (uncast SUM -> HUGEINT -> float64, not Python int).
            odf = con.execute(ORACLES[name]).df()
            ocols = list(odf.columns)
            orows = list(odf.itertuples(index=False, name=None))
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
