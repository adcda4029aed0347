"""Audit operator tests (operators/audit.py): orphan detection actually
fires, NULL keys are excluded, profiling counts are exact, histogram
buckets partition the range with the max folded into the last bucket."""

from __future__ import annotations

from kg_etl_spark.operators.audit import (
    column_profile,
    equi_width_histogram,
    fk_orphan_counts,
)


def test_fk_orphans_detects_and_ignores_nulls(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], ["id", "fk"]
    )
    parent = spark.createDataFrame([(10,), (20,)], ["pk"])
    out = fk_orphan_counts([("child->parent", child, "fk", parent, "pk")]).collect()
    assert len(out) == 1
    r = out[0]
    assert r["relationship"] == "child->parent"
    assert r["n_child"] == 4
    assert r["n_orphans"] == 1  # fk=99; the NULL fk is not an orphan


def test_column_profile_exact(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (4, "b")], ["k", "v"]
    )
    rows = {r["column_name"]: r for r in column_profile(df).collect()}
    assert rows["k"]["n_rows"] == 4 and rows["k"]["n_nulls"] == 0 and rows["k"]["n_distinct"] == 4
    assert rows["v"]["n_nulls"] == 1 and rows["v"]["n_distinct"] == 2


def test_histogram_covers_range_and_counts(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], ["x"])
    out = sorted(equi_width_histogram(df, "x", n_buckets=10).collect(), key=lambda r: r["bucket"])
    assert [r["bucket"] for r in out] == list(range(10))
    assert sum(r["n"] for r in out) == 100
    # max value (99.0) folds into bucket 9, which spans [89.1, 99.0]
    assert out[-1]["n"] == 10 and out[-1]["hi"] == 99.0
    # equal widths
    assert all(abs((r["hi"] - r["lo"]) - 9.9) < 1e-9 for r in out)


def test_quarantine_split_routing(spark):
    from pyspark.sql import functions as F

    from kg_etl_spark.operators.audit import quarantine_split

    df = spark.createDataFrame(
        [(1, 10, 0.0), (2, 100, 0.0), (3, 10, 0.9), (4, None, 0.0)],
        "id long, qty long, disc double",
    )
    rules = {
        "a_qty": F.col("qty") <= 50,
        "b_disc": F.col("disc") <= 0.5,
    }
    good, bad = quarantine_split(df, rules)
    assert {r["id"] for r in good.collect()} == {1}
    routed = {r["id"]: r["failed_rule"] for r in bad.collect()}
    # first failing rule in sorted-name order; NULL predicate = failure
    assert routed == {2: "a_qty", 3: "b_disc", 4: "a_qty"}


def test_psi_drift_detects_shift(spark):
    from kg_etl_spark.operators.audit import psi_drift

    ref = spark.createDataFrame([(float(i % 100),) for i in range(1000)], "v double")
    same = spark.createDataFrame([(float((i * 7) % 100),) for i in range(500)], "v double")
    shifted = spark.createDataFrame([(float(50 + i % 100),) for i in range(500)], "v double")
    psi_same = sum(r["psi_term"] for r in psi_drift(ref, same, "v").collect())
    psi_shift = sum(r["psi_term"] for r in psi_drift(ref, shifted, "v").collect())
    assert psi_same < 0.05
    assert psi_shift > 0.25
    assert psi_shift > psi_same


def test_chi_square_independent_vs_dependent(spark):
    from kg_etl_spark.operators.audit import chi_square

    # perfectly independent 2x2: chi2 == 0
    ind = spark.createDataFrame(
        [("x", "u")] * 4 + [("x", "v")] * 4 + [("y", "u")] * 4 + [("y", "v")] * 4,
        "a string, b string",
    )
    r = chi_square(ind, "a", "b").collect()[0]
    assert r["chi2"] == 0.0 and r["dof"] == 1 and r["n"] == 16

    # perfectly dependent 2x2 (a determines b): chi2 == n
    dep = spark.createDataFrame(
        [("x", "u")] * 8 + [("y", "v")] * 8, "a string, b string"
    )
    r2 = chi_square(dep, "a", "b").collect()[0]
    assert r2["chi2"] == 16.0 and r2["dof"] == 1
