"""MediaWiki XML dump → POI listings (reference S5/S6/X3:
`etl/sources/wikivoyage_xml.py`).

Spark-first shape: read the dump as text, split into <page> blocks
inside mapPartitions (streaming, namespace-agnostic), parse each page's
wikitext listing templates ({{see|do|eat|...}}) with a regex parser,
and explode to one row per listing. The reference's lxml.iterparse
memory hygiene is unnecessary — partitions bound memory.

For a single giant .xml.bz2 (not splittable as text) decompress first
or use a spark-xml package build; the parser itself is identical either
way. Pages never span partition boundaries in well-formed dumps when
splitting on '</page>' markers within whole-file partitions
(wholeTextFiles-style); for the common multi-file dump layout plain
text partitioning per file applies.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

LISTING_TEMPLATES = ("see", "do", "eat", "drink", "sleep", "buy", "listing", "marker")

_PAGE_RE = re.compile(r"<page[ >].*?</page>", re.DOTALL)
_TITLE_RE = re.compile(r"<title>(.*?)</title>", re.DOTALL)
_NS_RE = re.compile(r"<ns>(\d+)</ns>")
_REDIRECT_RE = re.compile(r"<redirect\b")
_TEXT_RE = re.compile(r"<text[^>]*>(.*?)</text>", re.DOTALL)
_TEMPLATE_RE = re.compile(
    r"\{\{\s*(" + "|".join(LISTING_TEMPLATES) + r")\s*\|(.*?)\}\}",
    re.DOTALL | re.IGNORECASE,
)
_FLOAT_RE = re.compile(r"-?\d+(?:\.\d+)?")

SCHEMA = T.StructType([
    T.StructField("page_title", T.StringType()),
    T.StructField("listing_type", T.StringType()),
    T.StructField("name", T.StringType()),
    T.StructField("lat", T.DoubleType()),
    T.StructField("lon", T.DoubleType()),
    T.StructField("address", T.StringType()),
    T.StructField("desc", T.StringType()),
])


def _first_float(s: str | None) -> float | None:
    """First float-looking number, tolerating '48.2°N'-style text
    (reference F19)."""
    if not s:
        return None
    m = _FLOAT_RE.search(s)
    return float(m.group(0)) if m else None


def parse_listing_kv(body: str) -> dict[str, str]:
    """k=v pairs of a listing template; positional junk ignored."""
    out: dict[str, str] = {}
    for part in body.split("|"):
        if "=" in part:
            k, _, v = part.partition("=")
            out[k.strip().lower()] = v.strip()
    return out


def parse_page(page_xml: str) -> list[dict]:
    """One <page> → list of listing rows. Skips ns≠0 and redirects
    (reference P10)."""
    ns = _NS_RE.search(page_xml)
    if ns and ns.group(1) != "0":
        return []
    if _REDIRECT_RE.search(page_xml):
        return []
    title_m = _TITLE_RE.search(page_xml)
    text_m = _TEXT_RE.search(page_xml)
    if not title_m or not text_m:
        return []
    title = title_m.group(1)
    rows = []
    for m in _TEMPLATE_RE.finditer(text_m.group(1)):
        kv = parse_listing_kv(m.group(2))
        name = kv.get("name")
        if not name:
            continue
        rows.append(
            {
                "page_title": title,
                "listing_type": m.group(1).lower(),
                "name": name,
                "lat": _first_float(kv.get("lat")),
                "lon": _first_float(kv.get("long") or kv.get("lon")),
                "address": kv.get("address"),
                "desc": kv.get("content") or kv.get("description"),
            }
        )
    return rows


def load_wikivoyage_listings(spark: SparkSession, path: str) -> DataFrame:
    """Distributed parse: whole-file text → page split → template rows."""

    def parse_partition(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf: list[str] = []
        for pdf in it:
            for chunk in pdf["value"]:
                buf.append(chunk)
        blob = "\n".join(buf)
        rows: list[dict] = []
        for pm in _PAGE_RE.finditer(blob):
            rows.extend(parse_page(pm.group(0)))
        yield pd.DataFrame(rows, columns=[f.name for f in SCHEMA.fields])

    # one whole file per partition so <page> blocks never split
    txt = spark.read.option("wholetext", True).text(path)
    return txt.mapInPandas(parse_partition, schema=SCHEMA)
