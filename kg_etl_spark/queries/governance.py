"""Data-governance catalog: deletion propagation (right-to-be-forgotten)
and related retention audits.

Reference parity: the reference's graph upsert/delete maintenance
(etl/graph.py merge/detach paths) covers single-entity removal; a
training-data platform additionally needs *cascading* erasure across
fact tables keyed off the forgotten entity. Implemented Spark-first:
the forget set is a filter over the dimension, every cascade level is a
semi-join (broadcast when small, sort-merge + AQE otherwise), and the
audit only ever materializes per-table COUNTS — the 100 TB fact tables
are never collected or rewritten to answer "what would this erasure
touch".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kg_etl_spark.session import read_table

# Deterministic demo forget-set: ~1% of customers. A real pipeline
# feeds an explicit key list; the cascade below is independent of how
# the set is produced.
FORGET_MOD = 97


def q_forget_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erasure-impact audit for a customer forget-set: per table, how
    many rows the cascade deletes (customer → orders → lineitem) and
    how many remain.

    Scale shape: the forget keys and the cascaded order keys flow into
    LEFT SEMI joins — Spark broadcasts them while small and AQE falls
    back to shuffled semi-joins when the forget set is fact-scale; the
    three per-table aggregates are single map-side-combined counts. No
    fact row is ever widened or collected; the output is 3 rows.
    """
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")

    forget = cust.filter(F.pmod(F.col("c_custkey"), F.lit(FORGET_MOD)) == 0).select(
        F.col("c_custkey").alias("k")
    )
    orders_del = orders.join(
        forget.withColumnRenamed("k", "o_custkey"), "o_custkey", "left_semi"
    )
    del_okeys = orders_del.select(F.col("o_orderkey").alias("l_orderkey"))
    li_del = li.join(del_okeys, "l_orderkey", "left_semi")

    def summarize(name: str, total_df: DataFrame, del_df: DataFrame) -> DataFrame:
        t = total_df.agg(F.count(F.lit(1)).alias("n_total"))
        d = del_df.agg(F.count(F.lit(1)).alias("n_delete"))
        return t.crossJoin(d).select(
            F.lit(name).alias("table_name"),
            F.col("n_delete"),
            (F.col("n_total") - F.col("n_delete")).alias("n_remain"),
        )

    out = (
        summarize("customer", cust, forget)
        .unionByName(summarize("orders", orders, orders_del))
        .unionByName(summarize("lineitem", li, li_del))
    )
    return out


ORACLE_FORGET_CASCADE = f"""
WITH forget AS (
  SELECT c_custkey FROM customer WHERE c_custkey % {FORGET_MOD} = 0
),
odel AS (
  SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM forget)
)
SELECT 'customer' AS table_name,
       CAST((SELECT COUNT(*) FROM forget) AS BIGINT) AS n_delete,
       CAST((SELECT COUNT(*) FROM customer) - (SELECT COUNT(*) FROM forget) AS BIGINT) AS n_remain
UNION ALL
SELECT 'orders',
       CAST((SELECT COUNT(*) FROM odel) AS BIGINT),
       CAST((SELECT COUNT(*) FROM orders) - (SELECT COUNT(*) FROM odel) AS BIGINT)
UNION ALL
SELECT 'lineitem',
       CAST((SELECT COUNT(*) FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM odel)) AS BIGINT),
       CAST((SELECT COUNT(*) FROM lineitem) -
            (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM odel)) AS BIGINT)
"""


QUERIES = {
    "forget_cascade": q_forget_cascade,
}
ORACLES = {
    "forget_cascade": ORACLE_FORGET_CASCADE,
}
