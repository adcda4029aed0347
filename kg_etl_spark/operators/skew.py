"""Skew mitigation: salted joins for hot keys.

AQE's skew-join handles most runtime skew; salting is the explicit
tool for *known* pathological keys (a city with half the POIs, a
stop-shingle matching every document). Pattern: replicate the build
side R times, scatter the probe side across R salt values — the hot
key's work spreads over R tasks instead of one straggler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `probe ⋈ build` on `on`, with the build side
    replicated `salt`× and the probe side scattered by a deterministic
    per-row salt. Result equals a plain join (same rows, no dupes) —
    only the physical distribution changes.

    Use when one side is small enough to replicate but too big (or the
    key too hot) to broadcast outright.

    Restricted to inner/left/left_semi: for right/full outer joins the
    unmatched *build* rows would surface once per salt replica, so the
    plain-join equivalence would not hold.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "semi"}
    if how not in allowed:
        raise ValueError(f"salted_join supports {sorted(allowed)}, got {how!r}")
    salted_build = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    salted_probe = probe.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(salt)).cast("int"),
    )
    return salted_probe.join(salted_build, [on, "_salt"], how).drop("_salt")
