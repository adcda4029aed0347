"""Surrogate-id kernel (reference F12/F13/F16).

sha1-over-fields with a \\x1f separator and truncated text, prefix-concat
ids, and id canonicalization — all native expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SEP = "\x1f"


def sha1_id(*parts: Column, text_trunc: int | None = None) -> Column:
    """sha1(concat_ws(sep, parts...)); optionally truncate the last part
    (the reference truncates review text to 512/256/120 before hashing)."""
    cols = list(parts)
    if text_trunc is not None and cols:
        cols[-1] = F.substring(cols[-1], 1, text_trunc)
    return F.sha1(F.concat_ws(SEP, *[F.coalesce(c.cast("string"), F.lit("")) for c in cols]))


def prefixed_id(prefix: str, col: Column) -> Column:
    """'yelp:' + business_id style source-prefixed ids."""
    return F.concat(F.lit(prefix + ":"), col.cast("string"))


def canonical_id_str(col: Column) -> Column:
    """Strip float tails ('123.0'→'123') and whitespace; NULL if empty."""
    c = F.regexp_replace(F.trim(col.cast("string")), r"\.0+$", "")
    return F.nullif(c, F.lit(""))
