"""interval_overlap_join and delta join maintenance: brute-force
equivalence on randomized-but-seeded inputs, duplicate-freedom, and
plan shape (equi-join, no cartesian)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from kg_etl_spark.operators.incremental import (
    delta_join_insert_only,
    maintained_join_view,
)
from kg_etl_spark.operators.temporal import interval_overlap_join
from kg_etl_spark.plans import physical_plan


def _intervals(spark, seed: int, n: int, name: str):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        s = rng.randrange(0, 1000)
        rows.append((i, rng.randrange(0, 4), s, s + rng.randrange(1, 120)))
    return spark.createDataFrame(rows, f"{name}_id long, k long, {name}_s long, {name}_e long")


def test_interval_overlap_matches_brute_force(spark):
    left = _intervals(spark, 1, 80, "a")
    right = _intervals(spark, 2, 80, "b")
    got = sorted(
        (r["a_id"], r["b_id"])
        for r in interval_overlap_join(
            left, right, on="k", left_start="a_s", left_end="a_e",
            right_start="b_s", right_end="b_e", bucket_width=50,
        ).collect()
    )
    want = sorted(
        (r["a_id"], r["b_id"])
        for r in left.join(right, "k")
        .filter((F.col("a_s") < F.col("b_e")) & (F.col("b_s") < F.col("a_e")))
        .collect()
    )
    assert got == want  # equality also proves duplicate-freedom


def test_interval_overlap_long_intervals_still_unique(spark):
    """Intervals spanning many cells must still emit each pair once
    (the first-common-cell rule)."""
    left = spark.createDataFrame([(1, 0, 0, 1000)], "a_id long, k long, a_s long, a_e long")
    right = spark.createDataFrame([(2, 0, 500, 2000)], "b_id long, k long, b_s long, b_e long")
    out = interval_overlap_join(
        left, right, on="k", left_start="a_s", left_end="a_e",
        right_start="b_s", right_end="b_e", bucket_width=10,
    ).collect()
    assert len(out) == 1


def test_interval_overlap_plan_is_equi_join(spark):
    left = _intervals(spark, 3, 10, "a")
    right = _intervals(spark, 4, 10, "b")
    plan = physical_plan(
        interval_overlap_join(
            left, right, on="k", left_start="a_s", left_end="a_e",
            right_start="b_s", right_end="b_e", bucket_width=50,
        )
    )
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def _split(df, col, frac_new_mod: int):
    return (
        df.filter(F.col(col) % 10 >= frac_new_mod),
        df.filter(F.col(col) % 10 < frac_new_mod),
    )


def test_delta_join_equals_full_recompute(spark):
    a = spark.createDataFrame(
        [(i, i % 7, f"a{i}") for i in range(200)], "k long, g long, pa string"
    )
    b = spark.createDataFrame(
        [(i % 60, i, f"b{i}") for i in range(300)], "k long, j long, pb string"
    )
    a_old, a_new = _split(a, "g", 3)
    b_old, b_new = _split(b, "j", 3)
    got = sorted(
        tuple(r)
        for r in maintained_join_view(a_old, a_new, b_old, b_new, on="k").collect()
    )
    want = sorted(tuple(r) for r in a.join(b, "k").collect())
    assert got == want


def test_delta_join_delta_disjoint_from_old(spark):
    """ΔJ must contain no old⋈old rows: every ΔJ row involves at least
    one delta-side tuple."""
    a = spark.createDataFrame([(1, "old"), (2, "new")], "k long, pa string")
    b = spark.createDataFrame([(1, "OLD"), (2, "NEW")], "k long, pb string")
    dj = delta_join_insert_only(
        a.filter(F.col("pa") == "old"),
        a.filter(F.col("pa") == "new"),
        b.filter(F.col("pb") == "OLD"),
        b.filter(F.col("pb") == "NEW"),
        on="k",
    ).collect()
    assert sorted((r["pa"], r["pb"]) for r in dj) == [("new", "NEW")]
