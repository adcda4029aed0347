"""Semantic checks for the governance family beyond the oracle hash:
the forget cascade is internally consistent (delete+remain = table
total, cascade levels reference-closed) and the weekday seasonal
decomposition actually partitions days by weekday with a zero-sum
residual per (type, dow) group.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kg_etl_spark.queries import QUERIES
from kg_etl_spark.queries.governance import FORGET_MOD
from kg_etl_spark.session import read_table

SF = "/root/testdata/sf0.001"


def test_forget_cascade_counts_consistent(spark):
    rows = {r["table_name"]: r for r in QUERIES["forget_cascade"](spark, SF).collect()}
    assert set(rows) == {"customer", "orders", "lineitem"}

    cust = read_table(spark, SF, "customer")
    orders = read_table(spark, SF, "orders")
    li = read_table(spark, SF, "lineitem")
    for name, df in (("customer", cust), ("orders", orders), ("lineitem", li)):
        r = rows[name]
        assert r["n_delete"] + r["n_remain"] == df.count()
        assert r["n_delete"] > 0, f"fixture produced an empty forget set for {name}"

    # cascade closure: every order of a forgotten customer is deleted,
    # and no order of a kept customer is
    forget_keys = {
        r["c_custkey"]
        for r in cust.filter(F.pmod("c_custkey", F.lit(FORGET_MOD)) == 0).collect()
    }
    n_orders_of_forgotten = orders.filter(F.col("o_custkey").isin(forget_keys)).count()
    assert rows["orders"]["n_delete"] == n_orders_of_forgotten


def test_weekday_seasonal_residuals_zero_sum(spark):
    out = QUERIES["weekday_seasonal_anomaly"](spark, SF)
    # dow derived from day by the documented shift
    bad = out.filter(F.pmod(F.col("day") + 4, F.lit(7)).cast("int") != F.col("dow")).count()
    assert bad == 0
    # residuals of a mean-centered decomposition sum to ~0 per group
    sums = (
        out.groupBy("event_type", "dow")
        .agg(F.sum("resid").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sums
    for r in sums:
        assert abs(r["s"]) < 1e-3 * r["n"], (r["event_type"], r["dow"], r["s"])
