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


def test_merge_null_target_key_retained(spark):
    # standard MERGE: a NULL-keyed target row never matches -> retained
    target = spark.createDataFrame([(None, 1.0), (2, 2.0)], "k long, v double")
    source = spark.createDataFrame([(2, 10.0)], "k long, dv double")
    out = sorted(
        ((r["k"], r["v"]) for r in merge_into(
            target, source, "k", matched_update={"v": F.col("src_dv")}
        ).collect()),
        key=lambda t: (t[0] is None, t[0] or 0),
    )
    assert out == [(2, 10.0), (None, 1.0)]


def test_merge_null_delete_condition_falls_through_to_update(spark):
    # WHEN MATCHED AND cond THEN DELETE with cond=NULL does NOT delete;
    # the row falls through to the UPDATE clause
    target = spark.createDataFrame([(1, 1.0)], "k long, v double")
    source = spark.createDataFrame([(1, None)], "k long, dv double")
    out = merge_into(
        target,
        source,
        "k",
        matched_delete=F.col("src_dv") > 50,  # NULL > 50 -> NULL
        matched_update={"v": F.lit(-1.0)},
    ).collect()
    assert [(r["k"], r["v"]) for r in out] == [(1, -1.0)]


def test_merge_null_source_key_inserted(spark):
    # WHEN NOT MATCHED inserts even a NULL-keyed source row
    target = spark.createDataFrame([(1, 1.0)], "k long, v double")
    source = spark.createDataFrame([(None, 9.0)], "k long, dv double")
    out = sorted(
        ((r["k"], r["v"]) for r in merge_into(
            target, source, "k",
            not_matched_insert={"k": F.col("__sk"), "v": F.col("src_dv")},
        ).collect()),
        key=lambda t: (t[0] is None, t[0] or 0),
    )
    assert out == [(1, 1.0), (None, 9.0)]
