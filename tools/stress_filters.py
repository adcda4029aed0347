"""Measured stress run of the zero-shuffle corpus filters over the
synthetic DataSource (no input files — rows generated in executors).

Usage: python tools/stress_filters.py [rows] [partitions]
Prints docs/s per filter; results are deterministic functions of
`rows`, so numbers across machines compare like-for-like.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kg_etl_spark.operators.filters import (  # noqa: E402
    duplicate_span_flags,
    gopher_quality_flags,
    source_cap_sample,
)
from kg_etl_spark.session import get_spark  # noqa: E402
from kg_etl_spark.sources.synthdocs import SynthDocsDataSource  # noqa: E402


def main() -> None:
    rows = int(float(sys.argv[1])) if len(sys.argv) > 1 else 2_000_000
    parts = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark("stress_filters")
    spark.dataSource.register(SynthDocsDataSource)
    docs = (
        spark.read.format("synthdocs")
        .option("rows", str(rows))
        .option("numPartitions", str(parts))
        .load()
    )
    # Materialize once: measuring filters THROUGH the Python generator
    # would bound every number at the generator's speed; on parquet the
    # filters run JVM-side at scan speed — the claim under test.
    import tempfile

    cache = os.path.join(tempfile.gettempdir(), f"synthdocs_{rows}.parquet")
    t0 = time.time()
    if not os.path.exists(cache):
        docs.write.mode("overwrite").parquet(cache)
    docs = spark.read.parquet(cache)
    n = docs.count()
    gen_s = time.time() - t0
    print(f"generate+materialize: {n} docs in {gen_s:.1f}s")

    for name, frame in [
        ("gopher_quality_flags", gopher_quality_flags(docs).select(F.sum(F.col("pass_gopher").cast("long")))),
        ("source_cap_sample", source_cap_sample(docs, cap=1000).select(F.count(F.lit(1)))),
        ("duplicate_span_flags(hash)", duplicate_span_flags(docs, hash_spans=True).select(F.sum("n_dup_spans"))),
    ]:
        t0 = time.time()
        val = frame.collect()[0][0]
        dt = time.time() - t0
        print(f"{name}: result={val} in {dt:.1f}s ({n/dt:,.0f} docs/s)")


if __name__ == "__main__":
    main()
