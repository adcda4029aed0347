"""Query catalog: every implemented operator exposed as a
(spark, sf_dir) -> DataFrame callable plus a DuckDB oracle SQL string.

Determinism contract (so the driver's value-hash matches):
- every computed column aliased identically in Spark and SQL;
- double aggregates computed from decimal sums (order-independent),
  then cast to double;
- rounding applied at output on anything float-derived;
- every top-k / rank has a total tie-break on a unique id.
"""

from __future__ import annotations

from kg_etl_spark.queries import (
    analytic,
    er,
    events,
    filters,
    geo,
    governance,
    media,
    ml,
    pipeline,
    quality,
    relational,
    sketchq,
    textq,
    vector,
)

QUERIES = {}
ORACLES = {}
for mod in (
    relational,
    geo,
    er,
    textq,
    vector,
    events,
    media,
    pipeline,
    quality,
    filters,
    sketchq,
    governance,
    analytic,
    ml,
):
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)
