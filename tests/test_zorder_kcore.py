"""Z-order layout export, k-core decomposition, and schema-evolution
reads."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from kg_etl_spark.operators.kcore import kcore
from kg_etl_spark.sinks import write_zordered_parquet, zorder_key


def test_zorder_key_interleaves_bits(spark):
    df = spark.range(1).select(
        zorder_key(F.lit(0b101), F.lit(0b011), bits=3).alias("z")
    )
    # x bits (101) at even positions, y bits (011) at odd:
    # z = y2 x2 y1 x1 y0 x0 = 0 1 1 0 1 1 = 0b011011
    assert df.collect()[0]["z"] == 0b011011


def test_zordered_export_clusters_both_dims(spark, tmp_path):
    path = str(tmp_path / "zout")
    n = 4096
    df = spark.range(n).select(
        (F.col("id") % 64).alias("x"),
        ((F.col("id") * 2654435761) % 64).alias("y"),
        F.col("id").alias("payload"),
    )
    write_zordered_parquet(df, path, "x", "y", num_files=16, bits=6)
    files = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    assert len(files) > 4
    # both dimensions must be clustered: every file's x-range AND
    # y-range span well under the global 0..63 extent on average
    spans_x, spans_y = [], []
    for f in files:
        t = pq.read_table(f, columns=["x", "y"])
        xs, ys = t.column("x").to_pylist(), t.column("y").to_pylist()
        spans_x.append(max(xs) - min(xs))
        spans_y.append(max(ys) - min(ys))
    assert sum(spans_x) / len(spans_x) < 48
    assert sum(spans_y) / len(spans_y) < 48
    assert spark.read.parquet(path).count() == n


def test_kcore_peels_to_fixpoint(spark):
    # K4 (a 3-core) plus a tail 4-5-6 hanging off node 1: the tail
    # peels away for k=2 and k=3; K4 survives both
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    tail = [(1, 5), (5, 6)]
    df = spark.createDataFrame(k4 + tail, ["a_id", "b_id"])
    core3 = {r["node"]: r["degree"] for r in kcore(df, k=3).collect()}
    assert core3 == {1: 3, 2: 3, 3: 3, 4: 3}
    core2 = {r["node"] for r in kcore(df, k=2).collect()}
    assert core2 == {1, 2, 3, 4}
    # a pure path has no 2-core at all
    path = spark.createDataFrame([(i, i + 1) for i in range(1, 6)], ["a_id", "b_id"])
    assert kcore(path, k=2).count() == 0
    # core property: every member's in-core degree >= k
    assert all(d >= 3 for d in core3.values())


def test_schema_evolution_merge_read(spark, tmp_path):
    # old files lack a column added later: mergeSchema unions them,
    # old rows surface NULL for the new column
    p = str(tmp_path / "evolving")
    spark.range(3).select(F.col("id"), F.lit("a").alias("v1")).write.parquet(p + "/d=1")
    spark.range(2).select(
        F.col("id"), F.lit("b").alias("v1"), F.lit(9).alias("v2")
    ).write.parquet(p + "/d=2")
    df = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(df.columns) == {"id", "v1", "v2", "d"} or set(df.columns) == {"id", "v1", "v2"}
    rows = df.collect()
    assert len(rows) == 5
    by_v1 = {}
    for r in rows:
        by_v1.setdefault(r["v1"], set()).add(r["v2"])
    assert by_v1["a"] == {None} and by_v1["b"] == {9}
