"""Nearest-neighbor within threshold (reference J5/J9/W1:
`scripts/run_airbnb.py:40-58`, Cypher 08:82-103).

The reference loops every left row against ALL right rows per city.
Here: grid-block both sides so each left row only meets right rows in
its 3×3 bin neighborhood, then a window rank-1 with a total tie-break
(meters, then right id) — deterministic where np.argmin was
order-dependent.

Longitude degrees shrink with cos(lat), so lon bins are widened by
1/cos(max_abs_lat) to keep the 3×3 neighborhood a superset of the
search radius anywhere below that latitude.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kg_etl_spark.functions.geo import DEG_KM, equirect_m
from kg_etl_spark.operators.util import spread


def radius_bins(threshold_m: float, max_abs_lat: float = 66.0) -> tuple[float, float]:
    """(lat_bin_deg, lon_bin_deg) guaranteeing 3×3 coverage of the
    radius for |lat| ≤ max_abs_lat."""
    lat_deg = threshold_m / 1000.0 / DEG_KM * 1.05
    lon_deg = lat_deg / max(math.cos(math.radians(max_abs_lat)), 0.01)
    return lat_deg, lon_deg


def _bin_cols(lat, lon, lat_deg: float, lon_deg: float):
    return (
        F.floor(lat / lat_deg).cast("long"),
        F.floor(lon / lon_deg).cast("long"),
    )


def _explode_neighbors(lat_bin, lon_bin):
    offs = [(i, j) for i in (-1, 0, 1) for j in (-1, 0, 1)]
    return F.explode(
        F.array(*[F.struct((lat_bin + i).alias("b_lat"), (lon_bin + j).alias("b_lon")) for i, j in offs])
    )


def radius_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    threshold_m: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    partition_col: str | None = None,
    max_abs_lat: float = 66.0,
) -> DataFrame:
    """All (left, right) pairs with equirect distance ≤ threshold.
    Output: <left_id>, <right_id>, meters. One shuffle on the bin key."""
    lat_deg, lon_deg = radius_bins(threshold_m, max_abs_lat)

    # spread the exploded/streamed side: single-split inputs would
    # otherwise run the whole pair-filter pass in one task
    left = spread(left, F.col(left_id))

    lb, nb = _bin_cols(F.col(lat_col), F.col(lon_col), lat_deg, lon_deg)
    lft = left.withColumn("_nb", _explode_neighbors(lb, nb)).select(
        F.col(left_id).alias("_lid"),
        F.col(lat_col).alias("_llat"),
        F.col(lon_col).alias("_llon"),
        *([F.col(partition_col).alias("_jp")] if partition_col else []),
        F.col("_nb.b_lat").alias("_jb_lat"),
        F.col("_nb.b_lon").alias("_jb_lon"),
    )
    r_lb, r_nb = _bin_cols(F.col(lat_col), F.col(lon_col), lat_deg, lon_deg)
    rgt = right.select(
        F.col(right_id).alias("_rid"),
        F.col(lat_col).alias("_rlat"),
        F.col(lon_col).alias("_rlon"),
        *([F.col(partition_col).alias("_jp")] if partition_col else []),
        r_lb.alias("_jb_lat"),
        r_nb.alias("_jb_lon"),
    )

    # partition_col is part of the equi-join key: the shuffle hashes on
    # (partition, bin) so a hot bin shared by many partitions spreads
    # across reducers instead of post-join filtering one fat bucket.
    on = (["_jp"] if partition_col else []) + ["_jb_lat", "_jb_lon"]
    joined = lft.join(rgt, on, "inner")
    return (
        joined.withColumn(
            "meters", equirect_m(F.col("_llat"), F.col("_llon"), F.col("_rlat"), F.col("_rlon"))
        )
        .filter(F.col("meters") <= threshold_m)
        .select(F.col("_lid").alias(left_id), F.col("_rid").alias(right_id), "meters")
    )


def nearest_within(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    threshold_m: float = 300.0,
    lat_col: str = "lat",
    lon_col: str = "lon",
    partition_col: str | None = None,
    max_abs_lat: float = 66.0,
) -> DataFrame:
    """For each left row, the single nearest right row ≤ threshold.
    Output: <left_id>, <right_id>, meters."""
    pairs = radius_join(
        left, right, left_id, right_id, threshold_m, lat_col, lon_col, partition_col, max_abs_lat
    )
    w = Window.partitionBy(left_id).orderBy(F.col("meters").asc(), F.col(right_id).asc())
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
