"""Messy-input coercion kernels (reference F14-F16, F23-F24):
null-on-failure numerics, price strings, CSV float-tail ids, lenient
booleans — all native expressions."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_TRUE_TOKENS = ("t", "true", "1", "yes")


def parse_price(col: Column) -> Column:
    """F15 — '$1,234.50 / night' → 1234.5 (first number after comma
    strip; NULL when no number)."""
    cleaned = F.regexp_replace(col.cast("string"), ",", "")
    num = F.regexp_extract(cleaned, r"([0-9]+(\.[0-9]+)?)", 1)
    return F.nullif(num, F.lit("")).cast("double")


def parse_bool(col: Column) -> Column:
    """F24 — 't'/'True'/'1'/'yes' (any case) → true, NULL/'' → NULL,
    anything else → false."""
    s = F.lower(F.trim(col.cast("string")))
    return F.when(s.isNull() | (s == ""), F.lit(None).cast("boolean")).otherwise(
        s.isin(*_TRUE_TOKENS)
    )


def coerce_double(col: Column) -> Column:
    """F14 — numeric coercion with NULL on failure (try_cast)."""
    return col.cast("string").try_cast("double")


def empty_to_null(col: Column) -> Column:
    """Empty-string-vs-NULL normalization at ingest."""
    return F.nullif(F.trim(col.cast("string")), F.lit(""))
