"""JSONL source/sink (reference S10/K3/K4).

The reference's fresh-file append (`_write_jsonl`: unlink + chunked
appends) and read-concat-rewrite parquet append are replaced by native
`mode("overwrite"/"append")` writers — the scalable path the reference
couldn't take single-process.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """K4: JSONL sink (fresh-file semantics = overwrite mode)."""
    df.write.mode(mode).json(path)


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_col: str = "city_slug", mode: str = "overwrite"
) -> None:
    """K2/K3: per-partition parquet. Hive layout (the reference avoided
    it only due to a pyarrow bug, `etl/reviews_jsonl.py:59-60`); append
    mode replaces the reference's read-concat-rewrite anti-pattern."""
    df.write.mode(mode).partitionBy(partition_col).parquet(path)
