"""Semantic checks for the time-series family beyond the oracle hash:
LOCF actually carries values across real gaps, and the session-level
table is consistent with the per-user sessionize aggregate."""

from __future__ import annotations

from pyspark.sql import functions as F

from kg_etl_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_gapfill_locf_carries_last_observation(spark):
    rows = QUERIES["gapfill_locf"](spark, SF).orderBy("event_type", "day").collect()
    assert any(not r["observed"] for r in rows), "fixture has no gaps — LOCF untested"
    last_seen = {}
    for r in rows:
        key = r["event_type"]
        if r["observed"]:
            last_seen[key] = r["filled_value"]
        else:
            # a gap day must carry the previous observation (or stay
            # null before the first one, which can't happen: the grid
            # starts at each type's first observed day)
            assert key in last_seen
            assert r["filled_value"] == last_seen[key]


def test_session_stats_consistent_with_sessionize(spark):
    sess = QUERIES["session_stats"](spark, SF)
    per_user = sess.groupBy("user_id").agg(
        F.max("session_id").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
    )
    expect = {
        (r["user_id"]): (r["n_sessions"], r["n_events"])
        for r in QUERIES["sessionize"](spark, SF).collect()
    }
    got = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in per_user.collect()}
    assert got == expect
    # durations are non-negative and sessions are disjoint in time per user
    bad = sess.filter(F.col("duration_us") < 0).count()
    assert bad == 0


def test_active_sessions_cover_every_session_hour(spark):
    sess = QUERIES["session_stats"](spark, SF)
    hourly = QUERIES["active_sessions_per_hour"](spark, SF)
    # sum of per-hour active counts == sum over sessions of hours spanned
    spanned = sess.select(
        F.sum(
            ((F.col("start_us") + F.col("duration_us")) / (3600 * 1_000_000)).cast("long")
            - (F.col("start_us") / (3600 * 1_000_000)).cast("long")
            + 1
        ).alias("s")
    ).collect()[0]["s"]
    counted = hourly.select(F.sum("n_active_sessions").alias("s")).collect()[0]["s"]
    assert counted == spanned


def test_holt_forecast_matches_python_fold(spark):
    from kg_etl_spark.queries.events import _daily_totals

    out = {r["event_type"]: r for r in QUERIES["holt_forecast"](spark, SF).collect()}
    daily = (
        _daily_totals(spark, SF)
        .orderBy("event_type", "day")
        .collect()
    )
    series = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append(r["day_value"])
    assert set(out) == set(series)
    for et, ys in series.items():
        l, b = ys[0], 0.0
        for y in ys[1:]:
            ln = 0.5 * y + 0.5 * (l + b)
            b = 0.3 * (ln - l) + 0.7 * b
            l = ln
        got = out[et]
        assert got["n_days"] == len(ys)
        assert abs(got["level"] - round(l, 6)) < 1e-9
        assert abs(got["trend"] - round(b, 6)) < 1e-9
        assert abs(got["forecast_7d"] - round(l + 7.0 * b, 6)) < 1e-9


def test_ols_trend_recovers_planted_slope(spark):
    # run the catalog query and cross-check one group against numpy
    import numpy as np

    from kg_etl_spark.queries.events import _daily_totals

    out = {r["event_type"]: r for r in QUERIES["ols_trend"](spark, SF).collect()}
    daily = _daily_totals(spark, SF).collect()
    xs, ys = {}, {}
    for r in daily:
        xs.setdefault(r["event_type"], []).append(float(r["day"]))
        ys.setdefault(r["event_type"], []).append(r["day_value"])
    for et in out:
        slope, intercept = np.polyfit(xs[et], ys[et], 1)
        assert abs(out[et]["slope"] - slope) < 1e-4 * max(1.0, abs(slope))
        assert abs(out[et]["intercept"] - intercept) < 1e-3 * max(1.0, abs(intercept))
