"""Generic MERGE INTO semantics (ANSI SQL:2003 / Delta-style upsert)
as one full-outer join — the engine-completeness primitive behind
`operators/graph.py`'s node upsert and `operators/scd.py`'s SCD2
merge, exposed generally:

    WHEN MATCHED [AND cond] THEN DELETE
    WHEN MATCHED            THEN UPDATE SET col = expr, ...
    WHEN NOT MATCHED        THEN INSERT (col = expr, ...)

Plan: ONE full-outer hash join on the merge key, then per-row CASE
projection — no second pass, no per-clause re-join. At 100 TB both
sides shuffle once on the key (or zero times if the target is
bucketed by it — sinks.write_bucketed); AQE demotes to broadcast when
the source delta is small, which is the common CDC shape.

Cross-engine contract: the same semantics in SQL is a FULL OUTER JOIN
with CASE arms — the oracle form — since DuckDB's MERGE and Spark's
MERGE INTO both require writable tables, while this operator stays a
pure DataFrame transform.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: str,
    *,
    matched_delete: Column | None = None,
    matched_update: dict[str, Column] | None = None,
    not_matched_insert: dict[str, Column] | None = None,
) -> DataFrame:
    """Returns the merged target. `matched_update` / `not_matched_insert`
    map target column names to expressions over the joined row (target
    columns under their names, source columns under ``src_<name>``).
    Clause order follows the standard: DELETE is tested before UPDATE.
    """
    # Row-origin markers, NOT key nullability: a NULL merge key never
    # equi-joins, so a NULL-keyed target row must land in the
    # unmatched-target arm (standard MERGE retains it) — but after the
    # full-outer join its __tk is NULL too, indistinguishable from a
    # source-only row by key columns alone.
    src = source.select(
        F.col(on).alias("__sk"),
        F.lit(True).alias("__is_s"),
        *[F.col(c).alias(f"src_{c}") for c in source.columns if c != on],
    )
    j = (
        target.withColumn("__tk", F.col(on))
        .withColumn("__is_t", F.lit(True))
        .join(src, F.col("__tk") == F.col("__sk"), "full_outer")
    )
    matched = F.col("__is_t").isNotNull() & F.col("__is_s").isNotNull()
    target_only = F.col("__is_t").isNotNull() & F.col("__is_s").isNull()
    source_only = F.col("__is_t").isNull() & F.col("__is_s").isNotNull()

    keep = target_only
    if matched_delete is not None:
        # SQL WHEN MATCHED AND cond THEN DELETE: a NULL condition does
        # NOT fire the clause — the row falls through to UPDATE.
        keep = keep | (matched & ~F.coalesce(matched_delete, F.lit(False)))
    else:
        keep = keep | matched
    if not_matched_insert is not None:
        keep = keep | source_only

    out_cols = []
    for c in target.columns:
        expr = F.col(c)
        if matched_update is not None and c in matched_update:
            expr = F.when(matched, matched_update[c]).otherwise(expr)
        if not_matched_insert is not None:
            if c not in not_matched_insert:
                raise ValueError(f"not_matched_insert missing column {c}")
            expr = F.when(source_only, not_matched_insert[c]).otherwise(expr)
        out_cols.append(expr.alias(c))
    return j.filter(keep).select(*out_cols)
