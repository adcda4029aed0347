"""CSV ingestion (reference S7/S8: `etl/airbnb/staging.py:16-47`,
`etl/airbnb/reviews_jsonl.py:44-57`).

- glob lists are native to spark.read.csv;
- identifier columns forced to string + '123.0'-tail canonicalization
  (F16) instead of pandas dtype hacks;
- the malformed-quoting repair pre-pass is a distributed text→
  regexp_replace→from_csv stage, not a temp-file rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kg_etl_spark.functions.ids import canonical_id_str


def read_csv(
    spark: SparkSession,
    paths: list[str] | str,
    schema: T.StructType | None = None,
    id_cols: tuple[str, ...] = (),
    required: tuple[str, ...] = (),
) -> DataFrame:
    """Multi-file CSV scan with schema, required-column assertion and
    id canonicalization."""
    reader = spark.read.option("header", True).option("multiLine", True).option("escape", '"')
    df = reader.csv(paths, schema=schema) if schema else reader.csv(paths)
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise ValueError(f"missing required columns: {missing}; have {df.columns}")
    for c in id_cols:
        if c in df.columns:
            df = df.withColumn(c, canonical_id_str(F.col(c)))
    return df


def read_csv_repaired(
    spark: SparkSession, paths: list[str] | str, schema: T.StructType
) -> DataFrame:
    """Repair-then-parse for malformed quoting (the reference rewrites
    `'" ,'`→`'",'` and CRLF→LF into a temp file; here it's a distributed
    text scan + regexp_replace + from_csv — no temp files, splittable)."""
    txt = spark.read.text(paths)
    fixed = txt.select(
        F.regexp_replace(F.regexp_replace(F.col("value"), '" ,', '",'), "\r$", "").alias("line")
    )
    header = F.lit(",".join(f.name for f in schema.fields))
    parsed = fixed.filter(F.col("line") != header).select(
        F.from_csv(F.col("line"), schema.simpleString()).alias("rec")
    )
    return parsed.select("rec.*")
