"""Tests: S9 layout-fallback parquet scan, S12 geocode utility
(offline, injected transport), ER spot-check diagnostics."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from kg_etl_spark.diagnostics import (
    borderline_pairs,
    cluster_stats,
    promotion_suggestions,
    riskiest_pairs,
    same_source_near_dupes,
    stage_trace,
    suggest_aliases,
)
from kg_etl_spark.operators.er import candidate_links, resolve_entities
from kg_etl_spark.sources.parquet_dataset import read_places_dataset
from tools.geocode import fetch_bbox


def _places(spark):
    rows = [
        # cluster: p1/p2 ~44m apart, similar names, cross-source
        ("p1", "yelp", "grand hotel", 50.0000, 8.0000),
        ("p2", "wikivoyage", "hotel grand", 50.0004, 8.0000),
        # borderline: ~111m apart, cross-source, zero token overlap → unlinked
        ("p3", "yelp", "blue cafe", 50.0010, 8.0000),
        ("p4", "reddit", "azul bistro", 50.0020, 8.0000),
        # riskiest: ~55m apart, dissimilar names
        ("p5", "yelp", "north tower", 50.0100, 8.0000),
        ("p6", "reddit", "fish market", 50.0105, 8.0000),
        # same-source near-dupe: ~78m, same source, same name
        ("p7", "yelp", "city museum", 50.0200, 8.0000),
        ("p8", "yelp", "city museum", 50.0207, 8.0000),
    ]
    return spark.createDataFrame(
        rows, "place_id string, source string, name string, lat double, lon double"
    )


def test_spotcheck_diagnostics(spark):
    places = _places(spark)
    cands = candidate_links(places, "place_id", "name", carry_cols=("source",))
    links, asg = resolve_entities(places, "place_id", "name")

    bl = borderline_pairs(cands, links).collect()
    assert {(r["a_id"], r["b_id"]) for r in bl} == {("p3", "p4")}

    risky = riskiest_pairs(cands, links).collect()
    assert ("p5", "p6") in {(r["a_id"], r["b_id"]) for r in risky}

    ss = same_source_near_dupes(cands).collect()
    assert {(r["a_id"], r["b_id"]) for r in ss} == {("p7", "p8")}

    # relaxing the distance/sim bands promotes the borderline pair
    promos = promotion_suggestions(cands, links, [(150.0, 0.0)]).collect()
    assert ("p3", "p4") in {(r["a_id"], r["b_id"]) for r in promos}

    stats = cluster_stats(asg).collect()[0]
    assert stats["n_clusters"] >= 4 and stats["max_cluster_size"] >= 2


def test_suggest_aliases_recall(spark):
    # 9 unassigned WV rows titled "Mainhattan" near alpha's center and
    # 2 titled "Elseburg" → only the ≥8-count title is proposed, and
    # only for the city whose center is within near_km.
    curated_rows = (
        [(f"w{i}", "wikivoyage", f"poi {i}", 50.0 + i * 1e-4, 8.0, "Mainhattan") for i in range(9)]
        + [(f"x{i}", "wikivoyage", f"poi x{i}", 50.001, 8.001, "Elseburg") for i in range(2)]
        + [("y0", "yelp", "not wv", 50.0, 8.0, "Mainhattan")]
        + [("w9", "wikivoyage", "assigned one", 50.0, 8.0, "Mainhattan")]
        + [("far", "wikivoyage", "far away", 10.0, 10.0, "Mainhattan")]
    )
    curated = spark.createDataFrame(
        curated_rows,
        "place_id string, source string, name string, lat double, lon double, city_hint string",
    )
    staged = spark.createDataFrame(
        [("w9", "wikivoyage")], "place_id string, source string"
    )
    cities = spark.createDataFrame(
        [("alpha", 50.0, 8.0), ("omega", 30.0, 30.0)],
        "slug string, center_lat double, center_lon double",
    )
    got = suggest_aliases(curated, staged, cities, min_count=8).collect()
    assert [(r["slug"], r["alias"], r["n_hits"]) for r in got] == [("alpha", "mainhattan", 9)]


def test_stage_trace(spark):
    parsed = spark.createDataFrame(
        [("a", "wikivoyage"), ("b", "wikivoyage"), ("c", "yelp")], "id string, source string"
    )
    staged = spark.createDataFrame([("a", "wikivoyage")], "id string, source string")
    nosrc = spark.createDataFrame([(1,), (2,)], "v int")
    rows = stage_trace({"parsed": parsed, "staged": staged, "other": nosrc}).collect()
    got = [(r["stage"], r["source"], r["n_rows"]) for r in rows]
    assert got == [
        ("parsed", "wikivoyage", 2), ("parsed", "yelp", 1),
        ("staged", "wikivoyage", 1),
        ("other", "(all)", 2),
    ]


def test_read_places_dataset_layouts(spark, tmp_path):
    df = spark.createDataFrame(
        [("p1", "alpha", 1.0), ("p2", "beta", 2.0)],
        "place_id string, city_slug string, score double",
    )
    # hive layout
    hive = str(tmp_path / "hive")
    df.write.partitionBy("city_slug").parquet(hive)
    got = read_places_dataset(spark, hive)
    assert {r["city_slug"] for r in got.collect()} == {"alpha", "beta"}

    # per-city subdirs WITHOUT the column in the files
    percity = tmp_path / "percity"
    for slug in ("alpha", "beta"):
        sub = df.filter(F.col("city_slug") == slug).drop("city_slug")
        sub.coalesce(1).write.parquet(str(percity / slug))
    got2 = read_places_dataset(spark, str(percity))
    m = {r["place_id"]: r["city_slug"] for r in got2.collect()}
    assert m == {"p1": "alpha", "p2": "beta"}

    # flat with the column inline
    flat = str(tmp_path / "flat")
    df.write.parquet(flat)
    got3 = read_places_dataset(spark, flat)
    assert got3.count() == 2 and "city_slug" in got3.columns


def test_geocode_cached_rate_limited(tmp_path):
    calls = []

    def fake_fetch(url):
        calls.append(url)
        if len(calls) == 1:
            return 429, ""
        return 200, json.dumps(
            [{"boundingbox": ["49.9", "50.1", "7.9", "8.1"], "lat": "50.0", "lon": "8.0"}]
        )

    out = fetch_bbox("Alpha City", str(tmp_path), fetch_fn=fake_fetch, min_interval_s=0.0)
    assert out == {"bbox": [49.9, 7.9, 50.1, 8.1], "center": {"lat": 50.0, "lon": 8.0}}
    assert len(calls) == 2  # one 429 retry then success

    # cache hit: no new calls
    out2 = fetch_bbox("Alpha City", str(tmp_path), fetch_fn=fake_fetch, min_interval_s=0.0)
    assert out2 == out and len(calls) == 2

    # empty result -> None, not cached
    def empty_fetch(url):
        return 200, "[]"

    assert fetch_bbox("Nowhere", str(tmp_path), fetch_fn=empty_fetch) is None
