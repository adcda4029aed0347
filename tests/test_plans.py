"""Physical-plan assertions (SURVEY §4 discipline): pushdown, pruning,
and broadcast choices must actually appear in the optimized plans —
regressions here are silent at small scale and fatal at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from kg_etl_spark.plans import (
    has_broadcast_join,
    has_pushed_filters,
    has_whole_stage_codegen,
    physical_plan,
)
from kg_etl_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_filter_pushdown_reaches_scan(spark):
    df = QUERIES["filter_project"](spark, SF)
    assert has_pushed_filters(df)


def test_column_pruning(spark):
    df = QUERIES["pricing_summary"](spark, SF)
    plan = physical_plan(df)
    # lineitem has 7 columns; the scan must not read orderkey
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]


def test_dim_joins_broadcast(spark):
    assert has_broadcast_join(QUERIES["multi_hop_revenue"](spark, SF))
    assert has_broadcast_join(QUERIES["broadcast_dim_join"](spark, SF))


def test_no_python_in_relational_hot_paths(spark):
    for name in ("pricing_summary", "multi_hop_revenue", "zscore_bucket", "sessionize",
                 "blocked_spatial_pairs", "nearest_supplier"):
        plan = physical_plan(QUERIES[name](spark, SF))
        assert "EvalPython" not in plan, f"{name} has a Python UDF in the plan"


def test_whole_stage_codegen_present(spark):
    assert has_whole_stage_codegen(QUERIES["pricing_summary"](spark, SF))
