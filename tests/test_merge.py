"""merge_into operator semantics on a hand-built target/source pair."""

from __future__ import annotations

from pyspark.sql import functions as F

from kg_etl_spark.operators.merge import merge_into


def test_merge_all_three_clauses(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, name string, v double"
    )
    source = spark.createDataFrame(
        [(2, 5.0), (3, 99.0), (4, 7.0)], "k long, dv double"
    )
    out = {
        r["k"]: (r["name"], r["v"])
        for r in merge_into(
            target,
            source,
            "k",
            matched_delete=F.col("src_dv") > 50,     # deletes k=3
            matched_update={"v": F.col("v") + F.col("src_dv")},  # k=2 -> 25
            not_matched_insert={
                "k": F.col("__sk"),
                "name": F.lit("new"),
                "v": F.col("src_dv"),
            },  # inserts k=4
        ).collect()
    }
    assert out == {1: ("a", 10.0), 2: ("b", 25.0), 4: ("new", 7.0)}


def test_merge_without_insert_keeps_target_only_semantics(spark):
    target = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double")
    source = spark.createDataFrame([(2, 10.0), (9, 9.0)], "k long, dv double")
    out = {
        r["k"]: r["v"]
        for r in merge_into(
            target, source, "k",
            matched_update={"v": F.col("src_dv")},
        ).collect()
    }
    # no insert clause: unmatched source rows dropped
    assert out == {1: 1.0, 2: 10.0}
