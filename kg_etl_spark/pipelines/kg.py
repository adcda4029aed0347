"""End-to-end KG pipeline (SURVEY §3 lifecycle, Spark-first).

The reference runs this as four sequential processes with CSV/Parquet
file handoffs (`scripts/run_all.py`, `scripts/run_airbnb.py`, then the
01-99 Cypher sequence). Here the whole thing is ONE DataFrame DAG per
stage; the file handoffs remain only as *export contracts*, not as the
IR between stages — Catalyst sees each stage end-to-end.

Stages (reference mapping):
  1. stage     — coerce + city-assignment cascade + guard
                 (`etl/staging.py:22-83`, `etl/utils.py:163-207`)
  2. er        — blocked candidate pairs → accept rule → components →
                 canonical representative (`etl/er.py:152-248`)
  3. reviews   — semi-join valid places, surrogate ids, lift to
                 canonical (`etl/reviews_jsonl.py`, cypher 13)
  4. near      — listing → nearest place ≤ threshold
                 (`scripts/run_airbnb.py:33-71`, cypher 08/10)
  5. analytics — canonical coords, listings_nearby (A16), review
                 counts, per-city z-scores + blend + bucket, POI cards
                 (cypher 11/12/13b/20)

At 100 TB: every stage shuffles at most once on its natural key
(place_id / canonical_id / city_slug+grid-bin); the cities table is
broadcast; exports that must be single-file are export-sized by
construction (canonical places, links), while row-scale outputs
(reviews) go to partitioned Parquet/JSONL.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kg_etl_spark.functions.coerce import parse_bool, parse_price
from kg_etl_spark.functions.ids import sha1_id
from kg_etl_spark.operators.cityassign import assign_city, geometry_guard
from kg_etl_spark.operators.er import resolve_entities
from kg_etl_spark.operators.graph import (
    lift_reviews,
    listings_nearby_counts,
    poi_cards,
    popularity_scores,
    priority_coalesced_coords,
)
from kg_etl_spark.operators.nearest import nearest_within
from kg_etl_spark.sinks import write_contract_csv, write_jsonl, write_nested_json


def run_kg_pipeline(
    spark: SparkSession,
    places_raw: DataFrame,
    cities: DataFrame,
    reviews_raw: DataFrame | None = None,
    listings: DataFrame | None = None,
    out_dir: str | None = None,
    near_threshold_m: float = 300.0,
    max_city_km: float = 80.0,
) -> dict[str, DataFrame]:
    """Run the full pipeline; returns every intermediate as a DataFrame.

    places_raw: place_id, source, name, lat, lon[, city_hint, address, type]
    cities:     slug, name, aliases, center_lat, center_lon, radius_km,
                bbox_south/west/north/east, polygon (array<struct<lat,lon>>)
    reviews_raw: source, place_id, rating, text, scraped_at[, review_id]
    listings:   listing_id, lat, lon[, ...props]

    When out_dir is set, the reference's export contracts are written:
    places.csv, place_links.csv, place_canonical_map.csv,
    listing_near_place.csv, place_reviews.jsonl, poi_cards.json.
    """
    out: dict[str, DataFrame] = {}

    # -- 1. stage: coerce, assign, guard ------------------------------
    hint = "city_hint" if "city_hint" in places_raw.columns else None
    staged = (
        places_raw.withColumn("lat", F.col("lat").cast("double"))
        .withColumn("lon", F.col("lon").cast("double"))
        .filter(F.col("name").isNotNull())
    )
    staged = assign_city(staged, cities, hint_col=hint, max_km=max_city_km)
    if hint:
        staged = geometry_guard(staged.withColumnRenamed(hint, "_hint"), "_hint").drop("_hint")
    staged = staged.filter(F.col("city_slug").isNotNull()).cache()
    out["staged_places"] = staged

    # -- 2. entity resolution per city --------------------------------
    links, assignments = resolve_entities(
        staged,
        id_col="place_id",
        name_col="name",
        partition_col="city_slug",
        # carried through the pair join so place_links.csv can emit the
        # reference's 7-column contract (schemas.PLACE_LINKS).
        carry_cols=("source", "city_slug"),
    )
    variant_of = assignments.select(
        F.col("id").alias("source_place_id"), "canonical_id", "canonical_name"
    )
    places_out = staged.join(
        variant_of.withColumnRenamed("source_place_id", "place_id").withColumnRenamed(
            "canonical_id", "place_canonical_id"
        ),
        "place_id",
    )
    out["links"] = links
    out["places"] = places_out

    # -- 3. reviews: semi-join valid places, ids, lift ----------------
    lifted = None
    if reviews_raw is not None:
        # No broadcast hint: staged places are export-scale here but
        # unbounded in general, and a forced hint overrides Catalyst even
        # when the side is huge. AQE picks broadcast when it is small.
        valid = staged.select("place_id", "city_slug")
        revs = reviews_raw.join(valid, "place_id", "inner")
        if "review_id" not in revs.columns:
            revs = revs.withColumn(
                "review_id",
                sha1_id(F.col("source"), F.col("place_id"), F.col("text"), text_trunc=512),
            )
        revs = revs.filter(F.col("text").isNotNull() & (F.trim("text") != ""))
        lifted = lift_reviews(revs, variant_of)
        out["reviews"] = revs
        out["lifted_reviews"] = lifted

    # -- 4. listings: stage (messy-field coercion F15/F24), city attach,
    #       hosts distinct, NEAR join -----------------------------------
    near = None
    hosts = None
    listing_city = None
    if listings is not None:
        lst = (
            listings.withColumn("lat", F.col("lat").cast("double"))
            .withColumn("lon", F.col("lon").cast("double"))
            .na.drop(subset=["lat", "lon"])
        )
        if "price" in lst.columns:
            lst = lst.withColumn("price", parse_price(F.col("price")))
        if "host_is_superhost" in lst.columns:
            lst = lst.withColumn("host_is_superhost", parse_bool(F.col("host_is_superhost")))
        lst = assign_city(lst, cities, id_col="listing_id", hint_col=None, max_km=max_city_km)
        listing_city = lst.filter(F.col("city_slug").isNotNull()).select(
            "listing_id", "city_slug"
        )
        if "host_id" in lst.columns:
            host_cols = [c for c in ("host_id", "host_name", "host_is_superhost") if c in lst.columns]
            hosts = lst.select(*host_cols).dropDuplicates(["host_id"])
            out["hosts"] = hosts
        out["staged_listings"] = lst
        out["listing_city"] = listing_city
        near = nearest_within(
            lst,
            staged.select("place_id", "lat", "lon"),
            left_id="listing_id",
            right_id="place_id",
            threshold_m=near_threshold_m,
        )
        out["listing_near_place"] = near

    # -- 5. graph analytics -------------------------------------------
    coords = priority_coalesced_coords(places_out, canonical_col="place_canonical_id").select(
        F.col("place_canonical_id").alias("canonical_id"), "canonical_lat", "canonical_lon"
    )
    canon = (
        places_out.groupBy(
            F.col("place_canonical_id").alias("canonical_id"), "city_slug"
        )
        .agg(F.max("name").alias("_any"))
        .drop("_any")
        .join(
            variant_of.select("canonical_id", "canonical_name").dropDuplicates(["canonical_id"]),
            "canonical_id",
        )
        .join(coords, "canonical_id", "left")
    )
    nearby = (
        listings_nearby_counts(near, variant_of)
        if near is not None
        else spark.createDataFrame([], "canonical_id string, listings_nearby long")
    )
    rc = (
        lifted.groupBy("canonical_id").agg(F.count(F.lit(1)).alias("reviews_count"))
        if lifted is not None
        else spark.createDataFrame([], "canonical_id string, reviews_count long")
    )
    canon = (
        canon.join(nearby, "canonical_id", "left")
        .join(rc, "canonical_id", "left")
        .na.fill({"listings_nearby": 0, "reviews_count": 0})
    )
    canon = popularity_scores(canon)
    out["canonical_places"] = canon

    if lifted is not None:
        cards = poi_cards(canon, lifted.select("canonical_id", "review_id", "source", "text"))
        out["poi_cards"] = cards

    # -- exports -------------------------------------------------------
    if out_dir:
        write_contract_csv(
            places_out.select(
                "place_id", "source", "name", "lat", "lon", "city_slug", "place_canonical_id"
            ),
            os.path.join(out_dir, "places.csv"),
            order_by=["city_slug", "place_id"],
        )
        write_contract_csv(
            links.select(
                F.col("a_id").alias("a"),
                F.col("b_id").alias("b"),
                F.col("a_source").alias("src_a"),
                F.col("b_source").alias("src_b"),
                F.col("name_jac").alias("name_sim"),
                F.round("meters", 2).alias("meters"),
                F.col("a_city_slug").alias("city_slug"),
            ),
            os.path.join(out_dir, "place_links.csv"),
            order_by=["a", "b"],
        )
        write_contract_csv(
            variant_of.join(
                staged.select(F.col("place_id").alias("source_place_id"), "city_slug"),
                "source_place_id",
            ).select("source_place_id", "canonical_id", "canonical_name", "city_slug"),
            os.path.join(out_dir, "place_canonical_map.csv"),
            order_by=["city_slug", "source_place_id"],
        )
        if near is not None:
            write_contract_csv(
                near.select("listing_id", "place_id", F.round("meters", 2).alias("meters")),
                os.path.join(out_dir, "listing_near_place.csv"),
                order_by=["listing_id"],
            )
            write_contract_csv(
                listing_city,
                os.path.join(out_dir, "listing_city.csv"),
                order_by=["listing_id"],
            )
            if hosts is not None:
                write_contract_csv(
                    hosts, os.path.join(out_dir, "hosts.csv"), order_by=["host_id"]
                )
        if lifted is not None:
            write_jsonl(
                lifted.select(
                    "review_id", "source", "place_id", "canonical_id", "rating", "text", "city_slug"
                ),
                os.path.join(out_dir, "place_reviews.jsonl"),
            )
            write_nested_json(
                out["poi_cards"].select("canonical_id", "card"),
                os.path.join(out_dir, "poi_cards.json"),
                order_by=["canonical_id"],
            )
    return out
