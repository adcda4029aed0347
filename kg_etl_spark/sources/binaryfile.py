"""Binary-file ingest for multimodal corpora: a directory (or glob) of
opaque media blobs becomes (media_id, path, length, content) rows via
Spark's built-in ``binaryFile`` datasource.

100 TB reasoning: ``binaryFile`` is a real FileFormat — file listing is
distributed, each file is read by the executor that gets its split (no
driver I/O), `pathGlobFilter`/`recursiveFileLookup` prune at listing
time, and `content` stays a binary column until a downstream
mapInPandas (operators/multimodal.py) consumes it Arrow-batched. The
per-file row model matches media corpora (one blob = one record); the
4 MB+ objects that dominate such corpora amortize the per-row overhead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_binary_dir(
    spark: SparkSession,
    path: str,
    *,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Scan binary files under ``path`` into the multimodal contract:
    (media_id, path, length, content). ``media_id`` is the file's base
    name without extension — stable across re-scans and moves between
    stores, unlike the full path."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.load(path)
    base = F.element_at(F.split(F.col("path"), "/"), -1)
    media_id = F.regexp_replace(base, r"\.[^.]*$", "")
    return df.select(
        media_id.alias("media_id"),
        "path",
        F.col("length").cast("long").alias("length"),
        "content",
    )
