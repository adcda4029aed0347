"""Catalog-statistics / CBO surface: ANALYZE TABLE feeds the optimizer
row counts, and a table that fits the broadcast threshold gets a
broadcast join chosen FROM STATS (not from a hint and not from AQE's
runtime re-plan) — the stats-driven planning path a warehouse relies
on at 100 TB, where wrong stats mean wrong join sides."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_analyze_table_stats_drive_broadcast(spark, tmp_path):
    # warehouse.dir is static — use the session default location and
    # clean the tables up instead
    spark.sql("DROP TABLE IF EXISTS cbo_dim")
    spark.sql("DROP TABLE IF EXISTS cbo_fact")
    spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
    ).write.mode("overwrite").saveAsTable("cbo_dim")
    spark.range(100_000).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("v")
    ).write.mode("overwrite").saveAsTable("cbo_fact")

    spark.sql("ANALYZE TABLE cbo_dim COMPUTE STATISTICS")
    spark.sql("ANALYZE TABLE cbo_fact COMPUTE STATISTICS")

    # stats recorded and visible in the catalog
    desc = {
        r["col_name"]: r["data_type"]
        for r in spark.sql("DESCRIBE TABLE EXTENDED cbo_dim").collect()
    }
    assert "Statistics" in desc and "100 rows" in desc["Statistics"]

    plan = (
        spark.table("cbo_fact")
        .join(spark.table("cbo_dim"), "k")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the OPTIMIZED (pre-AQE) plan already sizes cbo_dim under the
    # broadcast threshold from its analyzed stats
    phys = (
        spark.table("cbo_fact").join(spark.table("cbo_dim"), "k")._jdf
        .queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in phys or "BroadcastExchange" in phys
    n = spark.table("cbo_fact").join(spark.table("cbo_dim"), "k").count()
    assert n == 100_000
    spark.sql("DROP TABLE cbo_dim")
    spark.sql("DROP TABLE cbo_fact")
