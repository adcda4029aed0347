"""SQLite ingestion (reference S1–S4: `etl/sources/yelp_sqlite.py`,
`etl/sources/reddit_sqlite.py`, joined review reads in
`etl/reviews_jsonl.py:198-256`).

Strategy: one-shot driver-side sqlite3 → Arrow → DataFrame bootstrap
(SQLite is a single local file; a distributed read buys nothing), then
everything downstream is Spark. On a cluster with a real RDBMS the same
call sites switch to `spark.read.format("jdbc")` with
partitionColumn/numPartitions — the chunked-cursor streaming the
reference hand-rolled is Spark's native partitioned read.

NULL-pruning pushdown (`WHERE latitude IS NOT NULL ...`) is kept in the
extraction SQL, same as the reference; for JDBC Catalyst pushes these
automatically.
"""

from __future__ import annotations

import sqlite3

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kg_etl_spark.functions.ids import prefixed_id


def read_sqlite(spark: SparkSession, db_path: str, sql: str) -> DataFrame:
    """One-shot extraction of a SQLite query into a DataFrame (Arrow path)."""
    with sqlite3.connect(db_path) as conn:
        pdf = pd.read_sql_query(sql, conn)
    return spark.createDataFrame(pdf)


def load_pois(
    spark: SparkSession,
    db_path: str,
    table: str,
    id_col: str,
    source: str,
    name_col: str = "name",
    lat_col: str = "latitude",
    lon_col: str = "longitude",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Generic POI scan with source-prefixed ids and NULL pruning —
    covers both the yelp and reddit shapes of the reference."""
    cols = ", ".join([id_col, name_col, lat_col, lon_col, *extra_cols])
    sql = (
        f"SELECT {cols} FROM {table} "
        f"WHERE {lat_col} IS NOT NULL AND {lon_col} IS NOT NULL AND {name_col} IS NOT NULL"
    )
    df = read_sqlite(spark, db_path, sql)
    return (
        df.withColumn("place_id", prefixed_id(source, F.col(id_col)))
        .withColumn("source", F.lit(source))
        .withColumnRenamed(name_col, "name")
        .withColumnRenamed(lat_col, "lat")
        .withColumnRenamed(lon_col, "lon")
    )


def load_reviews_joined(
    spark: SparkSession,
    db_path: str,
    reviews_table: str,
    places_table: str,
    join_key: str,
    source: str,
    rating_col: str = "rating",
    text_col: str = "review_text",
) -> DataFrame:
    """Reviews ⋈ places. The reference joins inside SQLite (S4); here
    both tables land as DataFrames and Catalyst plans the join
    (broadcast-hash for the small dim side) — same result, and the join
    strategy survives a move to a distributed source."""
    reviews = read_sqlite(spark, db_path, f"SELECT * FROM {reviews_table}")
    places = read_sqlite(spark, db_path, f"SELECT * FROM {places_table}")
    return (
        reviews.join(F.broadcast(places), on=join_key, how="inner")
        .withColumn("place_id", prefixed_id(source, F.col(join_key)))
        .withColumn("source", F.lit(source))
        .withColumn("rating", F.col(rating_col).try_cast("double"))
        .withColumnRenamed(text_col, "text")
    )
