"""Plan inspection helpers: assert pushdown/pruning/broadcast actually
happened — the at-scale discipline SURVEY §4 calls for."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def assert_in_plan(df: DataFrame, *needles: str) -> None:
    plan = physical_plan(df)
    missing = [n for n in needles if n not in plan]
    if missing:
        raise AssertionError(f"plan missing {missing}:\n{plan}")


def has_pushed_filters(df: DataFrame) -> bool:
    return "PushedFilters: [" in physical_plan(df) and "PushedFilters: []" not in physical_plan(df)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)
