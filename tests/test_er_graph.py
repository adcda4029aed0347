"""ER pipeline + graph layer + city assignment tests on hand-built
fixtures with known expected clusters (SURVEY §5 strategy)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kg_etl_spark.operators.cityassign import assign_city, geometry_guard
from kg_etl_spark.operators.er import resolve_entities
from kg_etl_spark.operators.graph import (
    lift_reviews,
    listings_nearby_counts,
    merge_upsert,
    multi_hop,
    poi_cards,
    popularity_scores,
    priority_coalesced_coords,
    validate_unique_keys,
)
from kg_etl_spark.schemas import CITIES


def test_er_known_clusters(spark):
    # two true duplicates ~50m apart w/ shared tokens; one distinct
    places = spark.createDataFrame(
        [
            (1, "central cafe", 50.0000, 8.0000),
            (2, "cafe central", 50.0004, 8.0000),   # ~44 m, jaccard 1.0
            (3, "city museum", 50.0004, 8.0002),    # near but dissimilar name
            (4, "far away diner", 51.0, 9.0),
        ],
        "id long, name string, lat double, lon double",
    )
    links, asg = resolve_entities(places, "id", "name")
    got = {r["id"]: (r["canonical_id"], r["canonical_name"], r["n_members"]) for r in asg.collect()}
    # equal-length names → lexicographic tie-break picks "cafe central"
    assert got[1] == (1, "cafe central", 2)
    assert got[2] == (1, "cafe central", 2)
    assert got[3][2] == 1 and got[4][2] == 1  # singletons


def _cities(spark):
    rows = [
        (
            "alpha", "Alpha City", "XX", ["alphatown"],
            50.0, 8.0, 10.0,
            49.9, 7.9, 50.1, 8.1,
            [(49.95, 7.95), (49.95, 8.05), (50.05, 8.05), (50.05, 7.95)],
        ),
        (
            "beta", "Beta City", "XX", [],
            52.0, 9.0, 10.0,
            51.9, 8.9, 52.1, 9.1,
            None,
        ),
    ]
    return spark.createDataFrame(rows, CITIES)


def test_assign_city_cascade(spark):
    cities = _cities(spark)
    places = spark.createDataFrame(
        [
            ("p_poly", 50.0, 8.0, None),      # inside alpha polygon
            ("p_bbox", 50.08, 8.08, None),    # outside polygon, inside alpha bbox
            ("p_radius", 52.15, 9.0, None),   # outside beta bbox, within 20km.. no: radius 10km → 16km away → unassigned
            ("p_hint", None, None, "Alphatown"),  # coordless alias match
            ("p_none", 0.0, 0.0, None),
        ],
        "place_id string, lat double, lon double, city_hint string",
    )
    got = {r["place_id"]: r["city_slug"] for r in assign_city(places, cities).collect()}
    assert got["p_poly"] == "alpha"
    assert got["p_bbox"] == "alpha"
    assert got["p_radius"] is None
    assert got["p_hint"] == "alpha"
    assert got["p_none"] is None


def test_geometry_guard(spark):
    df = spark.createDataFrame(
        [("a", "alpha", "alpha"), ("b", "beta", "alpha"), ("c", None, "alpha")],
        "id string, hint string, city_slug string",
    )
    kept = {r["id"] for r in geometry_guard(df, "hint").collect()}
    assert kept == {"a", "c"}


def test_merge_upsert_null_preserving(spark):
    existing = spark.createDataFrame([("n1", "Old", 1.0)], "id string, name string, score double")
    incoming = spark.createDataFrame([("n1", None, 2.0), ("n2", "New", None)],
                                     "id string, name string, score double")
    got = {r["id"]: (r["name"], r["score"]) for r in merge_upsert(existing, incoming, "id").collect()}
    assert got["n1"] == ("Old", 2.0)  # NULL incoming name keeps old
    assert got["n2"] == ("New", None)


def test_validate_unique_keys(spark):
    ok = spark.createDataFrame([("a",), ("b",)], "id string")
    validate_unique_keys(ok, "id")
    bad = spark.createDataFrame([("a",), ("a",)], "id string")
    try:
        validate_unique_keys(bad, "id")
        raise AssertionError("expected failure")
    except ValueError:
        pass


def test_multi_hop_and_lift(spark):
    listings = spark.createDataFrame([("l1",), ("l2",)], "listing_id string")
    near = spark.createDataFrame([("l1", "sp1"), ("l2", "sp2")], "listing_id string, place_id string")
    variant = spark.createDataFrame(
        [("sp1", "cp1"), ("sp2", "cp1")], "source_place_id string, canonical_id string"
    )
    hop = multi_hop(listings, [(near, "listing_id", "place_id")])
    assert hop.count() == 2
    counts = listings_nearby_counts(near, variant).collect()
    assert counts[0]["canonical_id"] == "cp1" and counts[0]["listings_nearby"] == 2

    reviews = spark.createDataFrame(
        [("r1", "sp1", "good", "yelp"), ("r2", "spX", "bad", "yelp")],
        "review_id string, place_id string, text string, source string",
    )
    lifted = lift_reviews(reviews, variant)
    assert [r["canonical_id"] for r in lifted.collect()] == ["cp1"]


def test_priority_coalesced_coords(spark):
    places = spark.createDataFrame(
        [
            ("cp1", "yelp", 10.0, 20.0),
            ("cp1", "reddit", 99.0, 99.0),
            ("cp2", "reddit", 1.0, 2.0),
        ],
        "canonical_id string, source string, lat double, lon double",
    )
    got = {r["canonical_id"]: (r["canonical_lat"], r["canonical_lon"])
           for r in priority_coalesced_coords(places).collect()}
    assert got["cp1"] == (10.0, 20.0)  # yelp wins over reddit
    assert got["cp2"] == (1.0, 2.0)    # fallback to any


def test_popularity_and_cards(spark):
    canon = spark.createDataFrame(
        [
            ("cp1", "c", 10.0, 100.0, "Cafe One"),
            ("cp2", "c", 0.0, 0.0, "Cafe Two"),
            ("cp3", "c", 5.0, 50.0, "Cafe Three"),
        ],
        "canonical_id string, city_slug string, listings_nearby double, reviews_count double, canonical_name string",
    )
    scored = popularity_scores(canon)
    flags = {r["canonical_id"]: r["flag"] for r in scored.collect()}
    assert flags["cp1"] == "high" and flags["cp2"] == "low"

    reviews = spark.createDataFrame(
        [("r1", "cp1", "yelp", "nice spot"), ("r2", "cp1", "reddit", "x" * 500)],
        "review_id string, canonical_id string, source string, text string",
    )
    cards = poi_cards(scored, reviews).collect()
    card1 = next(r for r in cards if r["canonical_id"] == "cp1")
    assert '"name":"Cafe One"' in card1["card"]
    assert len(card1["quotes"]) == 2
    assert len(card1["quotes"][1]["txt"]) == 220  # truncation


def test_sssp_takes_cheaper_two_hop_path(spark):
    from kg_etl_spark.operators.bfs import sssp_rounds
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        [(1, 2, 10.0), (1, 3, 2.0), (3, 2, 3.0), (2, 4, 1.0), (9, 10, 1.0)],
        "a_id long, b_id long, w double",
    )
    sources = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["dist"] for r in sssp_rounds(edges, sources, rounds=3).collect()}
    assert got[1] == 0.0
    assert got[3] == 2.0
    assert got[2] == 5.0   # 1→3→2 beats the direct 10.0 edge
    assert got[4] == 6.0   # 1→3→2→4 within 3 rounds
    assert 9 not in got and 10 not in got  # disconnected component unreached


def test_harmonic_centrality_center_of_path(spark):
    from kg_etl_spark.operators.bfs import harmonic_centrality

    # path 1-2-3 with unit weights, sources = all nodes: the middle
    # node is reachable at distance 1 from both ends -> harmonic 2.0;
    # the ends get 1 + 1/2 = 1.5
    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0)], "a_id long, b_id long, w double"
    )
    sources = spark.createDataFrame([(1,), (2,), (3,)], "node long")
    got = {r["node"]: r for r in harmonic_centrality(edges, sources, rounds=3).collect()}
    assert got[2]["harmonic"] == 2.0 and got[2]["n_reached_from"] == 2
    assert got[1]["harmonic"] == 1.5 and got[3]["harmonic"] == 1.5
