"""Catalog-wide physical-plan audit for the 100-TB failure classes.

Runs every catalog query's optimized plan (no execution beyond the
driver-side scalars some builders collect) and flags:

1. ROW-AT-A-TIME Python (`BatchEvalPython`) — hard zero; the repo's
   only Python sites are Arrow-vectorized.
2. `CartesianProduct` — hard zero (1-row scalar crosses plan as
   BroadcastNestedLoopJoin, which is separately allowlisted where the
   cross is the documented intent).
3. LOW-CARDINALITY corpus windows: a `windowspecdefinition` whose
   PARTITION keys are only known low-cardinality columns (event_type,
   lang, source, market segment, order status/priority, returnflag /
   linestatus, split) without a device cell column (_apr/_grr) — the
   n/|groups| single-task-sort class of the r5 verdict. Static plans
   cannot distinguish a corpus-scale input from a model-sized one
   (daily aggregates, device cells frames, tournament survivors), so
   legitimately-flagged queries live in ALLOW_LOWCARD with their
   reason; anything NEW outside the list fails the paired pytest.
4. PARTITION-LESS windows (r7): an empty partition spec moves ALL rows
   to one task — the global-window class. Device carry frames
   self-identify via the cell column in the order spec; model-sized
   frames live in ALLOW_PARTITIONLESS with their reason. (This scan
   found pareto_orders' per-distinct-price running-min window, ~1 row
   per order at scale — now on the group-free prefix device.)
5. Device cell column WITHOUT its repartition exchange (r7): a window
   excused by `_apr`/`_grr` must be accompanied by a hashpartitioning
   exchange on that column, so a refactor cannot silently drop the
   explicit repartition and reintroduce a skinny exchange.

Usage: python tools/audit_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kg_etl_spark.plans import physical_plan  # noqa: E402
from kg_etl_spark.queries import QUERIES  # noqa: E402

LOW_CARD_COLS = (
    "event_type", "lang", "source", "split", "c_mktsegment",
    "o_orderstatus", "o_orderpriority", "l_returnflag", "l_linestatus",
)

# Queries whose PARTITION-LESS windows (empty partition spec — the
# "all data to one task" class, r7 audit extension) run over
# MODEL-SIZED frames. Device carry frames self-identify by their cell
# column (_apr/_grr) in the order spec and need no entry.
ALLOW_PARTITIONLESS = {
    # ≤|nations|-row p-value frame (BH step-up needs the full ranking)
    "bh_fdr_nations": "per-nation p-value frame",
    # ≤|nations|-row p-value frame (Holm step-down, same class)
    "holm_bonferroni_nations": "per-nation p-value frame",
    # fused top-k search-result frame (post-LIMIT per retriever)
    "hybrid_rrf_search": "top-k result frame",
    # top-100 token frame (post-LIMIT TakeOrdered)
    "zipf_tail_fit": "top-100 token frame",
}

# Queries whose low-card-partitioned windows run over MODEL-SIZED
# frames (the static plan can't see the frame size; the reason is the
# review contract).
ALLOW_LOWCARD = {
    # windows over the calendar-bounded daily-aggregate frame
    "changepoint_scores": "daily-aggregate frame",
    "cumulative_distinct_users": "per-(type, day) first-seen frame",
    "cusum_drift": "daily-aggregate frame",
    "dod_change": "daily-aggregate frame",
    "gapfill_locf": "daily-aggregate frame",
    "linear_interpolate": "daily-aggregate frame",
    "range_frame_sum": "daily-aggregate frame",
    "rolling_correlation": "daily-aggregate frame",
    "rolling_daily_value": "daily-aggregate frame",
    "durbin_watson_daily": "daily-aggregate frame",
    "weekday_seasonal_anomaly": "daily-aggregate frame",
    # ≤|flag|x|status| aggregate (8 rows)
    "sql_window_rank": "grouped-aggregate frame",
    # grouped rank device: offsets/count windows over the cells frame
    "theil_sen_trend": "grouped_row_number cells frame",
    "customer_deciles": "grouped_row_number cells frame",
    # grouped_topk tournament: phase-2 window over <= k*partitions rows
    "topk_per_group": "grouped_topk survivors frame",
    "quota_sample": "grouped_topk survivors frame",
    "source_cap": "grouped_topk survivors frame",
}


def check_plan(name: str, plan: str):
    """Violation classes for ONE optimized plan (unit-testable).

    Returns a dict of booleans: row_python / cartesian / lowcard
    (a low-cardinality corpus window with no device cell column) /
    partitionless (r7: an EMPTY partition spec — the one-task global
    window class — outside the device carry frames, which
    self-identify by their cell column in the order spec, and the
    reasoned model-sized allowlist) / device_no_exchange (r7: a window is excused by the device cell
    column ``_apr``/``_grr``, but the plan has NO hash-partitioning
    exchange on that column — i.e. a refactor kept the column name
    while silently dropping the explicit ``repartition`` that spreads
    the sort over cells, reintroducing a skinny exchange)."""
    out = {
        "row_python": bool(re.search(r"\(\d+\) BatchEvalPython", plan)),
        "cartesian": "CartesianProduct" in plan,
        "lowcard": False,
        "device_no_exchange": False,
        "partitionless": False,
    }
    for m in re.finditer(r"windowspecdefinition\(([^)]*)", plan):
        head = re.split(r" ASC| DESC|specifiedwindowframe", m.group(1))[0]
        first = m.group(1).split(",")[0]
        if (
            (" ASC" in first or " DESC" in first)  # no partition keys at all
            and "_apr" not in first
            and "_grr" not in first
            and "_rdrng" not in first
            and "_rbp" not in first
            and name not in ALLOW_PARTITIONLESS
        ):
            out["partitionless"] = True
        for cell_col in ("_apr", "_grr"):
            if cell_col in head and not re.search(
                r"hashpartitioning\([^)]*" + cell_col, plan
            ):
                out["device_no_exchange"] = True
        if (
            any(c in head for c in LOW_CARD_COLS)
            and "_apr" not in head
            and "_grr" not in head
            and name not in ALLOW_LOWCARD
        ):
            out["lowcard"] = True
    return out


def audit(spark, sf_dir: str):
    """Returns dict of violation lists; empty lists == clean."""
    row_python, cartesian, lowcard_new, device_no_exchange = [], [], [], []
    partitionless = []
    errors = []
    for name, fn in QUERIES.items():
        try:
            plan = physical_plan(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001 - collect, don't abort the audit
            errors.append((name, str(e)[:120]))
            continue
        v = check_plan(name, plan)
        if v["row_python"]:
            row_python.append(name)
        if v["cartesian"]:
            cartesian.append(name)
        if v["lowcard"]:
            lowcard_new.append(name)
        if v["device_no_exchange"]:
            device_no_exchange.append(name)
        if v["partitionless"]:
            partitionless.append(name)
    return {
        "row_python": sorted(set(row_python)),
        "cartesian": sorted(set(cartesian)),
        "lowcard_new": sorted(set(lowcard_new)),
        "device_no_exchange": sorted(set(device_no_exchange)),
        "partitionless": sorted(set(partitionless)),
        "errors": errors,
    }


def main() -> None:
    from kg_etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    result = audit(get_spark("audit_plans"), sf_dir)
    for k, v in result.items():
        print(f"{k}: {v}")
    if any(
        result[k]
        for k in (
            "row_python",
            "cartesian",
            "lowcard_new",
            "device_no_exchange",
            "partitionless",
        )
    ):
        sys.exit(1)
    print(f"AUDIT CLEAN ({len(QUERIES)} queries)")


if __name__ == "__main__":
    main()
