"""S9 — parquet dataset scan tolerant of the three layouts the
reference supports (`etl/er.py:253-291`): Hive-partitioned
(`root/city_slug=X/…`), per-city subdirectories of plain files
(`root/<slug>/data.parquet`), and flat files carrying `city_slug` as a
data column. Hive discovery is native; the per-city layout infers the
slug from the parent folder name via input_file_name()."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_places_dataset(spark: SparkSession, root: str) -> DataFrame:
    try:
        df = spark.read.parquet(root)
        if "city_slug" in df.columns:
            return df
    except Exception:
        pass
    # non-hive nested layout: recursive listing (disables partition
    # discovery), slug = parent directory name
    df = spark.read.option("recursiveFileLookup", "true").parquet(root)
    if "city_slug" in df.columns:
        return df
    return df.withColumn(
        "city_slug",
        F.regexp_extract(F.input_file_name(), r"([^/]+)/[^/]+$", 1),
    )


def read_resilient(
    spark: SparkSession,
    path: str,
    ignore_corrupt: bool = True,
    ignore_missing: bool = True,
) -> DataFrame:
    """Scan a parquet dataset tolerating the two file-level failures a
    100 TB lake actually has: corrupt files (truncated uploads, bad
    blocks) and files deleted between listing and read (compaction
    racing a reader). Both are per-file skip decisions made by the
    scan — the query completes with every healthy file's rows instead
    of dying mid-stage hours in.

    Uses the standard per-read datasource options (not session-wide
    conf, so one tolerant reader doesn't silently relax every other
    query's guarantees).
    """
    return (
        spark.read.option("ignoreCorruptFiles", str(ignore_corrupt).lower())
        .option("ignoreMissingFiles", str(ignore_missing).lower())
        .parquet(path)
    )
