"""Analytic-SQL breadth + advanced-analytics catalog: distribution
window functions (NTILE / PERCENT_RANK / CUME_DIST), set operations
(INTERSECT), gaps-and-islands streaks, explicit GROUPING SETS,
deterministic mode, RANK-with-ties top-k, rolling correlation,
cumulative COUNT(DISTINCT), linear interpolation; directed-graph
algorithms (SCC, pointer-doubling hierarchy traversal, deterministic
random walks, Luby MIS); ML feature engineering (WOE binning,
leave-one-fold-out target encoding, sequence patterns, isotonic
calibration); statistics (exact moments, KS test, Welch t-test, EWMA,
Kaplan-Meier survival); governance (l-diversity, Laplace-noised
counts); MERGE INTO; Benford + floor-clamped-balance audits.

Reference parity: the reference's analytics layer ranks and buckets
entities per city (kg-etl analysis queries, see `etl/analytics.py`);
these queries re-express that family through the full ANSI window /
set-operation surface so a reference user has the complete analytic
vocabulary, not just RANK.

Determinism contract (kg_etl_spark.queries.__init__): every ORDER BY
inside a window carries a unique-id total tie-break; double outputs
rounded at the edge; identical aliases both sides.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kg_etl_spark.session import read_table, register_views

DAY_US = 86_400 * 1_000_000

QUERIES = {}
ORACLES = {}


# --- distribution window functions ------------------------------------


def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(4) / PERCENT_RANK / CUME_DIST per nation over customer
    balances — one window sort per nation partition (single shuffle on
    c_nationkey; at 100 TB the per-nation partitions are the skew unit,
    but distribution functions need the full partition ordered anyway —
    this is the minimal plan).

    ORDER BY (c_acctbal, c_custkey): the unique-key tie-break makes
    every rank-derived value deterministic.
    """
    cust = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return cust.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).cast("int").alias("bal_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("bal_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("bal_cume_dist"),
    )


ORACLE_WINDOW_DISTRIBUTION = """
SELECT c_custkey, c_nationkey,
       CAST(NTILE(4) OVER w AS INT) AS bal_quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS bal_pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS bal_cume_dist
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
"""

QUERIES["window_distribution"] = q_window_distribution
ORACLES["window_distribution"] = ORACLE_WINDOW_DISTRIBUTION


# --- set operations: INTERSECT ----------------------------------------


def q_priority_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with BOTH an urgent and a low-priority order —
    INTERSECT of two key sets. Spark lowers INTERSECT to a left-semi
    hash join over distinct keys: two pruned scans of the same table,
    one shuffle each, no row explosion. (The alternative — self-join
    then distinct — shuffles the wide rows; INTERSECT shuffles keys
    only, which is what survives at 100 TB.)
    """
    orders = read_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("custkey")
    )
    return urgent.intersect(low)


ORACLE_PRIORITY_INTERSECT = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '5-LOW'
"""

QUERIES["priority_intersect"] = q_priority_intersect
ORACLES["priority_intersect"] = ORACLE_PRIORITY_INTERSECT


# --- gaps and islands: longest consecutive-day streak ------------------


def q_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user (gaps-and-
    islands): distinct active days → island id = day − row_number()
    (constant within a consecutive run) → per-island length/start →
    rank-1 per user (longest, then earliest).

    Day arithmetic in integer epoch-micros div 86400e6 (tz-free; see
    events._trunc_us rationale). Plan: one distinct shuffle on
    (user, day), then all three window/agg steps reuse the same
    user-hash partitioning — Catalyst collapses them into a single
    sort-based stage per user partition, no extra exchange.
    """
    ev = read_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        (F.unix_micros(F.col("ts")) / F.lit(DAY_US)).cast("long").alias("day"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    runs = days.withColumn("grp", F.col("day") - F.row_number().over(w))
    islands = runs.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("streak_len"),
        F.min("day").alias("streak_start_day"),
    )
    pick = Window.partitionBy("user_id").orderBy(
        F.col("streak_len").desc(), F.col("streak_start_day").asc()
    )
    return (
        islands.withColumn("_rn", F.row_number().over(pick))
        .filter(F.col("_rn") == 1)
        .select("user_id", "streak_len", "streak_start_day")
    )


# epoch_us(ts) // 86400000000: positive epochs, so DuckDB floor-div and
# Spark's cast-to-long truncation agree.
ORACLE_ACTIVITY_STREAKS = """
WITH d AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
), r AS (
  SELECT user_id, day,
         day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM d
), s AS (
  SELECT user_id, grp, COUNT(*) AS streak_len, MIN(day) AS streak_start_day
  FROM r GROUP BY user_id, grp
)
SELECT user_id, streak_len, streak_start_day
FROM (
  SELECT user_id, streak_len, streak_start_day,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY streak_len DESC, streak_start_day) AS rn
  FROM s
) WHERE rn = 1
"""

QUERIES["activity_streaks"] = q_activity_streaks
ORACLES["activity_streaks"] = ORACLE_ACTIVITY_STREAKS


# --- explicit GROUPING SETS with GROUPING() flags ----------------------

# One-text SQL (same string runs verbatim in Spark SQL and DuckDB, like
# SQL_EXISTS_AGG): explicit GROUPING SETS — detail, per-flag subtotal,
# grand total — with GROUPING() null-vs-subtotal disambiguation flags.
# Spark computes all three sets in a single Expand+hash-agg pass (one
# shuffle, rows×3 expand — cheaper than 3 scans at any scale).
SQL_GROUPING_SETS = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


def q_grouping_sets_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_GROUPING_SETS)


QUERIES["grouping_sets_profile"] = q_grouping_sets_profile
ORACLES["grouping_sets_profile"] = SQL_GROUPING_SETS


# --- deterministic per-group mode --------------------------------------


def q_modal_segment_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent market segment per nation — mode with an explicit
    total tie-break (highest count, then lexicographically smallest
    segment), because bare mode()/arg_max() is nondeterministic on
    ties in both engines. Plan: hash-agg on (nation, segment) — 25×5
    groups, partials map-side — then a 125-row window; nothing here
    grows with table size.
    """
    cust = read_table(spark, sf_dir, "customer")
    counts = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n")
    )
    pick = Window.partitionBy("c_nationkey").orderBy(
        F.col("n").desc(), F.col("c_mktsegment").asc()
    )
    return (
        counts.withColumn("_rn", F.row_number().over(pick))
        .filter(F.col("_rn") == 1)
        .select(
            "c_nationkey",
            F.col("c_mktsegment").alias("modal_segment"),
            F.col("n").alias("modal_count"),
        )
    )


ORACLE_MODAL_SEGMENT = """
WITH c AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
  FROM customer GROUP BY c_nationkey, c_mktsegment
)
SELECT c_nationkey, c_mktsegment AS modal_segment, n AS modal_count
FROM (
  SELECT c_nationkey, c_mktsegment, n,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY n DESC, c_mktsegment) AS rn
  FROM c
) WHERE rn = 1
"""

QUERIES["modal_segment_per_nation"] = q_modal_segment_per_nation
ORACLES["modal_segment_per_nation"] = ORACLE_MODAL_SEGMENT


# --- time-series linear interpolation ----------------------------------

DEC = "decimal(28,6)"


def q_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill by LINEAR interpolation (the timescale
    `interpolate()` counterpart of the LOCF fill in
    events.q_gapfill_locf): densify each event type's sparse daily
    series to its full day span, then fill each gap day from the
    bracketing observations:

        v = prev + (next − prev) · (day − prev_day)/(next_day − prev_day)

    Bracketing values via last(...ignorenulls) over the preceding frame
    and first(...ignorenulls) over the following frame — two frames on
    the SAME per-type sort, so Catalyst evaluates both in one window
    stage; the only shuffles are the daily hash-agg and the per-type
    window exchange. Grid explode is map-side. At 100 TB the unit of
    parallelism is the series key (event_type here); day spans are
    bounded (years ≈ thousands of rows per series), so no partition
    outgrows memory.

    Determinism: daily means from exact decimal sums / counts cast to
    double, identical IEEE arithmetic both engines, rounded at output.
    """
    ev = read_table(spark, sf_dir, "events").filter(F.col("value") > 180)
    daily = ev.groupBy(
        "event_type",
        (F.unix_micros("ts") / F.lit(DAY_US)).cast("long").alias("day"),
    ).agg(
        (F.sum(F.col("value").cast(DEC)).cast("double") / F.count(F.lit(1))).alias(
            "day_value"
        )
    )
    span = daily.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = span.select("event_type", F.explode(F.sequence("d0", "d1")).alias("day"))
    wp = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("day_value").isNotNull(), F.col("day"))
    j = grid.join(daily, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        F.col("day_value").isNotNull().alias("observed"),
        F.last("day_value", ignorenulls=True).over(wp).alias("_pv"),
        F.last(obs_day, ignorenulls=True).over(wp).alias("_pd"),
        F.first("day_value", ignorenulls=True).over(wn).alias("_nv"),
        F.first(obs_day, ignorenulls=True).over(wn).alias("_nd"),
    )
    interp = F.when(
        F.col("_pd").isNotNull() & F.col("_nd").isNotNull() & (F.col("_nd") != F.col("_pd")),
        F.col("_pv")
        + (F.col("_nv") - F.col("_pv"))
        * ((F.col("day") - F.col("_pd")).cast("double") / (F.col("_nd") - F.col("_pd")).cast("double")),
    ).otherwise(F.coalesce("_pv", "_nv"))
    return j.select(
        "event_type", "day", "observed", F.round(interp, 6).alias("filled_value")
    )


ORACLE_LINEAR_INTERPOLATE = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS day_value
  FROM events WHERE value > 180 GROUP BY 1, 2
), span AS (
  SELECT event_type, MIN(day) AS d0, MAX(day) AS d1 FROM d GROUP BY 1
), grid AS (
  SELECT event_type, UNNEST(generate_series(d0, d1)) AS day FROM span
), j AS (
  SELECT g.event_type, g.day,
         d.day_value IS NOT NULL AS observed,
         LAST_VALUE(d.day_value IGNORE NULLS) OVER wp AS pv,
         LAST_VALUE(CASE WHEN d.day_value IS NOT NULL THEN g.day END IGNORE NULLS) OVER wp AS pd,
         FIRST_VALUE(d.day_value IGNORE NULLS) OVER wn AS nv,
         FIRST_VALUE(CASE WHEN d.day_value IS NOT NULL THEN g.day END IGNORE NULLS) OVER wn AS nd
  FROM grid g LEFT JOIN d ON g.event_type = d.event_type AND g.day = d.day
  WINDOW wp AS (PARTITION BY g.event_type ORDER BY g.day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY g.event_type ORDER BY g.day
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, day, observed,
       ROUND(CASE WHEN pd IS NOT NULL AND nd IS NOT NULL AND nd <> pd
                  THEN pv + (nv - pv) * (CAST(day - pd AS DOUBLE) / CAST(nd - pd AS DOUBLE))
                  ELSE COALESCE(pv, nv) END, 6) AS filled_value
FROM j
"""

QUERIES["linear_interpolate"] = q_linear_interpolate
ORACLES["linear_interpolate"] = ORACLE_LINEAR_INTERPOLATE


# --- strongly connected components -------------------------------------


def q_scc_user_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCCs of the user-transition graph: edge u→v when v's event
    directly follows u's within one event_type stream (ordered by
    ts, event_id — deterministic). Mutually-reachable user groups =
    behavioral loops. Hash/fixpoint-free oracle impossible on real
    data (reachability isn't SQL-expressible) → rows-only; the
    value-checked twin is `scc_planted_recall`."""
    from kg_etl_spark.operators.adjacent import transition_edges_cut
    from kg_etl_spark.operators.scc import scc_sizes, strongly_connected_components

    ev = read_table(spark, sf_dir, "events")
    edges = transition_edges_cut(ev)
    scc = strongly_connected_components(edges)
    return scc_sizes(scc).select("node", "scc_id", "scc_size")


QUERIES["scc_user_transitions"] = q_scc_user_transitions
# rows-only: reachability fixpoint not SQL-expressible; twin below is
# the value gate.


def q_scc_planted_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted-provable twin of `scc_user_transitions` (pattern of
    minhash_identical_recall): per nation, the ≤4 smallest customer
    ids form a directed CYCLE — one SCC per nation, id = min member —
    plus ONE acyclic cross edge (global-min cycle's min → max-min
    cycle's min). The cross edge proves DAG edges never merge SCCs and
    forces a second outer FW-BW round (its target cycle sees
    F = global-min ≠ B until the source cycle settles); everything is
    enumerable in SQL without a reachability fixpoint. 1-customer
    nations yield a filtered self-loop → no edges → excluded on both
    sides (the operator's domain is vertices with edges)."""
    from kg_etl_spark.operators.scc import scc_sizes, strongly_connected_components

    cust = read_table(spark, sf_dir, "customer")
    wr = Window.partitionBy("c_nationkey").orderBy("c_custkey")
    picked = (
        cust.select("c_custkey", "c_nationkey", F.row_number().over(wr).alias("rn"))
        .filter(F.col("rn") <= 4)
        .lineage_cut(eager=True)
    )
    wc = Window.partitionBy("c_nationkey").orderBy("rn")
    cycle = picked.select(
        F.col("c_custkey").alias("src"),
        F.coalesce(
            F.lead("c_custkey").over(wc),
            F.first("c_custkey").over(
                wc.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            ),
        ).alias("dst"),
    )
    # cross-edge endpoints only from nations with >= 2 picked customers
    # (= nations that actually form a cycle): a 1-customer nation's
    # self-loop is filtered inside the operator, so a cross edge touching
    # it would emit a singleton SCC the oracle's g.m >= 2 gate omits
    mins = (
        picked.groupBy("c_nationkey")
        .agg(F.min("c_custkey").alias("mn"), F.count(F.lit(1)).alias("_m"))
        .filter(F.col("_m") >= 2)
    )
    cross = mins.agg(
        F.min("mn").alias("src"), F.max("mn").alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    scc = strongly_connected_components(cycle.union(cross))
    return scc_sizes(scc).select("node", "scc_id", "scc_size")


ORACLE_SCC_PLANTED = """
WITH ranked AS (
  SELECT c_custkey, c_nationkey,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn
  FROM customer
), picked AS (
  SELECT c_custkey, c_nationkey FROM ranked WHERE rn <= 4
), g AS (
  SELECT c_nationkey, MIN(c_custkey) AS mn, COUNT(*) AS m
  FROM picked GROUP BY c_nationkey
)
SELECT p.c_custkey AS node, g.mn AS scc_id, g.m AS scc_size
FROM picked p JOIN g ON p.c_nationkey = g.c_nationkey
WHERE g.m >= 2
"""

QUERIES["scc_planted_recall"] = q_scc_planted_recall
ORACLES["scc_planted_recall"] = ORACLE_SCC_PLANTED


# --- rolling correlation (windowed power sums) -------------------------


def q_rolling_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling Pearson correlation between two derived daily
    series (mean value vs event count) per event type — the windowed
    feature a monitoring/feature-engineering pipeline computes.

    Cross-engine exactness: Spark slides window aggregates
    incrementally while DuckDB uses a segment tree — double sums would
    differ in fold order. So the rolling Σx, Σy, Σxy, Σx², Σy² are
    taken over DECIMAL daily terms (x = mean rounded to 6 dp): decimal
    addition is exact in any order, and the final corr is one double
    expression over identical exact sums. One shuffle (daily agg);
    the window reuses the type-hash partitioning.
    """
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        (F.unix_micros(F.col("ts")) / F.lit(DAY_US)).cast("long").alias("day"),
    ).agg(
        F.round(
            F.sum(F.col("value").cast(DEC)).cast("double") / F.count(F.lit(1)), 6
        )
        .cast("decimal(18,6)")
        .alias("x"),
        F.count(F.lit(1)).cast("decimal(18,6)").alias("y"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    n = F.count(F.lit(1)).over(w).cast("double")
    sx = F.sum("x").over(w).cast("double")
    sy = F.sum("y").over(w).cast("double")
    sxy = F.sum((F.col("x") * F.col("y")).cast("decimal(38,12)")).over(w).cast("double")
    sxx = F.sum((F.col("x") * F.col("x")).cast("decimal(38,12)")).over(w).cast("double")
    syy = F.sum((F.col("y") * F.col("y")).cast("decimal(38,12)")).over(w).cast("double")
    den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    corr = F.when(den > 0, (n * sxy - sx * sy) / den)
    return daily.select(
        "event_type",
        "day",
        F.round(corr, 6).alias("rolling_corr"),
        n.cast("long").alias("n_window"),
    )


ORACLE_ROLLING_CORRELATION = """
WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6)
              AS DECIMAL(18,6)) AS x,
         CAST(COUNT(*) AS DECIMAL(18,6)) AS y
  FROM events GROUP BY 1, 2
), s AS (
  SELECT event_type, day,
         CAST(COUNT(*) OVER w AS DOUBLE) AS n,
         CAST(SUM(x) OVER w AS DOUBLE) AS sx,
         CAST(SUM(y) OVER w AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * y AS DECIMAL(38,12))) OVER w AS DOUBLE) AS sxy,
         CAST(SUM(CAST(x * x AS DECIMAL(38,12))) OVER w AS DOUBLE) AS sxx,
         CAST(SUM(CAST(y * y AS DECIMAL(38,12))) OVER w AS DOUBLE) AS syy
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT event_type, day,
       ROUND(CASE WHEN sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) > 0
                  THEN (n * sxy - sx * sy)
                       / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
             END, 6) AS rolling_corr,
       CAST(n AS BIGINT) AS n_window
FROM s
"""

QUERIES["rolling_correlation"] = q_rolling_correlation
ORACLES["rolling_correlation"] = ORACLE_ROLLING_CORRELATION


# --- top-k per group WITH ties (RANK vs ROW_NUMBER) --------------------


def q_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 order-count customers per nation INCLUDING ties — RANK()
    keeps tied peers (the WITH TIES semantics), where the row_number
    variant (`topk_per_group`) would drop them arbitrarily. The
    rank input (n_orders) is discrete so ties are real; output is
    still deterministic because the SET of kept rows is tie-closed.
    """
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .join(cust.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey"), "o_custkey")
    )
    w = Window.partitionBy("c_nationkey").orderBy(F.col("n_orders").desc())
    return (
        per_cust.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "c_nationkey",
            F.col("o_custkey").alias("custkey"),
            "n_orders",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


ORACLE_TOPK_WITH_TIES = """
WITH per_cust AS (
  SELECT o.o_custkey AS custkey, c.c_nationkey, COUNT(*) AS n_orders
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY o.o_custkey, c.c_nationkey
)
SELECT c_nationkey, custkey, n_orders,
       CAST(rnk AS INT) AS rnk
FROM (
  SELECT c_nationkey, custkey, n_orders,
         RANK() OVER (PARTITION BY c_nationkey ORDER BY n_orders DESC) AS rnk
  FROM per_cust
) WHERE rnk <= 3
"""

QUERIES["topk_with_ties"] = q_topk_with_ties
ORACLES["topk_with_ties"] = ORACLE_TOPK_WITH_TIES


# --- cumulative COUNT(DISTINCT) over a window --------------------------


def q_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct-user count per event type by day — the
    cumulative-uniques curve (DAU→CAU). COUNT(DISTINCT) isn't a
    window aggregate in either engine; the scalable form is the
    first-occurrence trick: mark each (type, user)'s FIRST day (one
    hash-agg), count firsts per day, running-sum them. Two narrow
    shuffles, no per-day distinct re-scan — at 100 TB the naive
    per-day COUNT(DISTINCT user) would re-shuffle the fact table once
    per day; this shuffles it once total."""
    ev = read_table(spark, sf_dir, "events")
    first_day = ev.groupBy("event_type", "user_id").agg(
        F.min((F.unix_micros(F.col("ts")) / F.lit(DAY_US)).cast("long")).alias("day")
    )
    per_day = first_day.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return per_day.select(
        "event_type",
        "day",
        "new_users",
        F.sum("new_users").over(w).alias("cum_distinct_users"),
    )


ORACLE_CUMULATIVE_DISTINCT = """
WITH first_day AS (
  SELECT event_type, user_id, MIN(epoch_us(ts) // 86400000000) AS day
  FROM events GROUP BY event_type, user_id
), per_day AS (
  SELECT event_type, day, COUNT(*) AS new_users
  FROM first_day GROUP BY event_type, day
)
SELECT event_type, day, new_users,
       CAST(SUM(new_users) OVER (PARTITION BY event_type ORDER BY day
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_distinct_users
FROM per_day
"""

QUERIES["cumulative_distinct_users"] = q_cumulative_distinct_users
ORACLES["cumulative_distinct_users"] = ORACLE_CUMULATIVE_DISTINCT


# --- recursive hierarchy traversal (pointer doubling) ------------------


def q_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Root + depth for every node of a deterministic forest over
    customer keys (parent = custkey div 10 when that key exists — a
    digits-deep hierarchy), resolved in ⌈log₂ depth⌉ joins via pointer
    doubling (operators/hierarchy.py) where the oracle's WITH RECURSIVE
    needs depth linear iterations. The capability Spark lacks as
    syntax, expressed as the scalable plan."""
    from kg_etl_spark.operators.hierarchy import ancestor_paths

    keys = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("node")
    )
    # parent = node div 10 — except node 0, whose div-parent is itself
    # (self-loop = cycle): NULL it to a root on both sides
    cand = keys.select(
        "node",
        F.when(F.expr("node div 10") != F.col("node"), F.expr("node div 10")).alias(
            "_p"
        ),
    )
    parents = cand.join(
        keys.select(F.col("node").alias("_p")).distinct(),
        "_p",
        "left_semi",
    ).select("node", F.col("_p").alias("parent")).unionByName(
        cand.join(
            keys.select(F.col("node").alias("_p")).distinct(), "_p", "left_anti"
        ).select("node", F.lit(None).cast("long").alias("parent"))
    )
    return ancestor_paths(parents)


ORACLE_HIERARCHY_ROLLUP = """
WITH RECURSIVE keys AS (
  SELECT c_custkey AS k FROM customer
), par AS (
  SELECT k.k AS node,
         CASE WHEN k.k // 10 <> k.k
                   AND EXISTS (SELECT 1 FROM keys p WHERE p.k = k.k // 10)
              THEN k.k // 10 END AS parent
  FROM keys k
), up AS (
  SELECT node AS origin, node AS cur, 0 AS depth FROM par
  UNION ALL
  SELECT u.origin, p.parent, u.depth + 1
  FROM up u JOIN par p ON p.node = u.cur
  WHERE p.parent IS NOT NULL
)
SELECT origin AS node, cur AS root, depth
FROM (
  SELECT origin, cur, depth,
         ROW_NUMBER() OVER (PARTITION BY origin ORDER BY depth DESC) AS rn
  FROM up
) WHERE rn = 1
"""

QUERIES["hierarchy_rollup"] = q_hierarchy_rollup
ORACLES["hierarchy_rollup"] = ORACLE_HIERARCHY_ROLLUP


# --- deterministic random-walk corpus (DeepWalk stage) -----------------


def q_walk_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-step deterministic random walks from every node of the user-
    transition graph (operators/walks.py) — the DeepWalk/node2vec
    corpus-generation stage with hash-derived (reproducible) neighbor
    choices, so the full walk corpus is VALUE-checkable: the oracle
    unrolls the same 3 steps as SQL CTEs."""
    from kg_etl_spark.operators.adjacent import transition_edges_cut
    from kg_etl_spark.operators.walks import deterministic_walks

    ev = read_table(spark, sf_dir, "events")
    edges = transition_edges_cut(ev)
    return deterministic_walks(edges, length=3)


_WALK_CTES = """
WITH e AS (
  SELECT DISTINCT src, dst FROM (
    SELECT user_id AS src,
           LEAD(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS dst
    FROM events
  ) WHERE dst IS NOT NULL AND src <> dst
), nbrs AS (
  SELECT src, dst,
         ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS rnk,
         COUNT(*) OVER (PARTITION BY src) AS deg
  FROM e
), nodes AS (
  SELECT src AS node FROM e UNION SELECT dst FROM e
), s0 AS (
  SELECT node AS origin, node AS cur FROM nodes
), s1 AS (
  SELECT s.origin, COALESCE(n.dst, s.cur) AS cur
  FROM s0 s LEFT JOIN nbrs n
    ON n.src = s.cur
   AND n.rnk = (1315423911 * (s.origin & 2147483647)
                + 2654435761 * (s.cur & 2147483647) + 97531 * 1)
               % 2147483647 % n.deg + 1
), s2 AS (
  SELECT s.origin, COALESCE(n.dst, s.cur) AS cur
  FROM s1 s LEFT JOIN nbrs n
    ON n.src = s.cur
   AND n.rnk = (1315423911 * (s.origin & 2147483647)
                + 2654435761 * (s.cur & 2147483647) + 97531 * 2)
               % 2147483647 % n.deg + 1
), s3 AS (
  SELECT s.origin, COALESCE(n.dst, s.cur) AS cur
  FROM s2 s LEFT JOIN nbrs n
    ON n.src = s.cur
   AND n.rnk = (1315423911 * (s.origin & 2147483647)
                + 2654435761 * (s.cur & 2147483647) + 97531 * 3)
               % 2147483647 % n.deg + 1
), walk AS (
  SELECT origin, 0 AS step, cur AS node FROM s0
  UNION ALL SELECT origin, 1 AS step, cur FROM s1
  UNION ALL SELECT origin, 2 AS step, cur FROM s2
  UNION ALL SELECT origin, 3 AS step, cur FROM s3
)
"""

ORACLE_WALK_CORPUS = _WALK_CTES + """
SELECT origin, step, node FROM walk
"""

QUERIES["walk_corpus"] = q_walk_corpus
ORACLES["walk_corpus"] = ORACLE_WALK_CORPUS


def q_node2vec_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-step SECOND-ORDER (node2vec) biased walks over the same
    user-transition graph as `walk_corpus` — return weight 500 (p=2),
    out weight 2000 (q=0.5). The hash-derived picks make the biased
    corpus a pure function of the graph, so even the second-order
    rule is VALUE-checkable: the oracle unrolls each biased step as a
    candidate-join + distance-1-marker + window-prefix-sum CTE."""
    from kg_etl_spark.operators.adjacent import transition_edges_cut
    from kg_etl_spark.operators.walks import node2vec_walks

    ev = read_table(spark, sf_dir, "events")
    edges = transition_edges_cut(ev)
    return node2vec_walks(edges, length=3, return_weight=500, out_weight=2000)


def _n2v_step_sql(t: int) -> str:
    """One biased node2vec step as SQL CTEs (weights 500/1000/2000)."""
    return f"""c{t} AS (
  SELECT s.origin, s.prev, s.cur, n.dst,
         CASE WHEN n.dst = s.prev THEN 500
              WHEN m.src IS NOT NULL THEN 1000
              ELSE 2000 END AS w
  FROM s{t - 1} s LEFT JOIN nbrs n ON n.src = s.cur
  LEFT JOIN e m ON m.src = s.prev AND m.dst = n.dst
), p{t} AS (
  SELECT origin, prev, cur, dst,
         CAST(SUM(w) OVER (PARTITION BY origin ORDER BY dst) AS BIGINT) AS hi,
         CAST(SUM(w) OVER (PARTITION BY origin ORDER BY dst) - w AS BIGINT) AS lo,
         CAST(SUM(w) OVER (PARTITION BY origin) AS BIGINT) AS tot
  FROM c{t}
), s{t} AS (
  SELECT origin, cur AS prev, COALESCE(dst, cur) AS cur
  FROM p{t}
  WHERE dst IS NULL
     OR (lo <= (1315423911 * (origin & 2147483647)
                + 2654435761 * (cur & 2147483647)
                + 40503 * (prev & 2147483647)
                + 97531 * {t}) % 2147483647 % tot
         AND (1315423911 * (origin & 2147483647)
              + 2654435761 * (cur & 2147483647)
              + 40503 * (prev & 2147483647)
              + 97531 * {t}) % 2147483647 % tot < hi)
)"""


ORACLE_NODE2VEC_CORPUS = f"""
WITH e AS (
  SELECT DISTINCT src, dst FROM (
    SELECT user_id AS src,
           LEAD(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS dst
    FROM events
  ) WHERE dst IS NOT NULL AND src <> dst
), nbrs AS (
  SELECT src, dst,
         ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS rnk,
         COUNT(*) OVER (PARTITION BY src) AS deg
  FROM e
), nodes AS (
  SELECT src AS node FROM e UNION SELECT dst FROM e
), s0 AS (
  SELECT node AS origin, node AS cur FROM nodes
), s1 AS (
  SELECT s.origin, s.cur AS prev, COALESCE(n.dst, s.cur) AS cur
  FROM s0 s LEFT JOIN nbrs n
    ON n.src = s.cur
   AND n.rnk = (1315423911 * (s.origin & 2147483647)
                + 2654435761 * (s.cur & 2147483647) + 97531 * 1)
               % 2147483647 % n.deg + 1
), {_n2v_step_sql(2)}, {_n2v_step_sql(3)}
SELECT origin, 0 AS step, cur AS node FROM s0
UNION ALL SELECT origin, 1 AS step, cur FROM s1
UNION ALL SELECT origin, 2 AS step, cur FROM s2
UNION ALL SELECT origin, 3 AS step, cur FROM s3
"""

QUERIES["node2vec_corpus"] = q_node2vec_corpus
ORACLES["node2vec_corpus"] = ORACLE_NODE2VEC_CORPUS


# --- ML feature engineering: WOE binning -------------------------------


def q_woe_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence per balance decile (credit-scoring feature
    prep): customers deciled by account balance (total-order tie-break
    on custkey), label = has ≥1 urgent order (semi-join flag), WOE =
    ln of the Laplace-smoothed odds ratio vs the global odds. The
    decile is the scale-safe two-phase exact rank (rankdev.global_ntile:
    range-bucketed parallel windows + broadcast prefix offsets — no
    single-partition window); the label semi-join shuffles keys only.
    All inputs to the single ln() are exact integer ratios, rounded at
    output — the float-oracle idiom."""
    from kg_etl_spark.operators.rankdev import global_ntile

    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    labeled = cust.join(urgent, "c_custkey", "left_semi").select(
        "c_custkey", F.lit(1).alias("y")
    ).unionByName(
        cust.join(urgent, "c_custkey", "left_anti").select(
            "c_custkey", F.lit(0).alias("y")
        )
    ).join(cust.select("c_custkey", "c_acctbal"), "c_custkey")
    labeled = labeled.lineage_cut(eager=True)  # device re-reads it 3×
    binned = global_ntile(
        labeled, "c_acctbal", 10, tiebreaks=["c_custkey"],
        out_col="decile", subkey="c_custkey",
    ).select("y", "decile")
    per_bin = binned.groupBy("decile").agg(
        F.sum("y").alias("n_pos"),
        F.sum(F.lit(1) - F.col("y")).alias("n_neg"),
    )
    tot = per_bin.agg(
        F.sum("n_pos").alias("tp"), F.sum("n_neg").alias("tn")
    )
    woe = F.log(
        ((F.col("n_pos") + F.lit(0.5)) / (F.col("n_neg") + F.lit(0.5)))
        / ((F.col("tp") + F.lit(0.5)) / (F.col("tn") + F.lit(0.5)))
    )
    return per_bin.crossJoin(F.broadcast(tot)).select(
        "decile",
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        F.round(woe, 6).alias("woe"),
    )


ORACLE_WOE_BINNING = """
WITH labeled AS (
  SELECT c.c_custkey, c.c_acctbal,
         CASE WHEN EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey
                             AND o.o_orderpriority = '1-URGENT')
              THEN 1 ELSE 0 END AS y
  FROM customer c
), binned AS (
  SELECT y, CAST(NTILE(10) OVER (ORDER BY c_acctbal, c_custkey) AS INT) AS decile
  FROM labeled
), per_bin AS (
  SELECT decile,
         CAST(SUM(y) AS BIGINT) AS n_pos,
         CAST(SUM(1 - y) AS BIGINT) AS n_neg
  FROM binned GROUP BY decile
), tot AS (
  SELECT CAST(SUM(n_pos) AS BIGINT) AS tp, CAST(SUM(n_neg) AS BIGINT) AS tn
  FROM per_bin
)
SELECT decile, n_pos, n_neg,
       ROUND(ln(((n_pos + 0.5) / (n_neg + 0.5)) / ((tp + 0.5) / (tn + 0.5))), 6) AS woe
FROM per_bin, tot
"""

QUERIES["woe_binning"] = q_woe_binning
ORACLES["woe_binning"] = ORACLE_WOE_BINNING


# --- ML feature engineering: leave-one-fold-out target encoding --------


def q_target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe target encoding of c_mktsegment: each customer's
    encoding is the urgent-order rate of its segment computed WITHOUT
    its own fold (fold = custkey mod 5) — the K-fold mean-target
    scheme that avoids self-leakage at training time. Two hash-aggs
    (segment×fold, then segment) + a broadcast-back join; exact
    integer arithmetic until the final divide."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    labeled = cust.join(urgent, "c_custkey", "left_semi").select(
        "c_custkey", "c_mktsegment", F.lit(1).alias("y")
    ).unionByName(
        cust.join(urgent, "c_custkey", "left_anti").select(
            "c_custkey", "c_mktsegment", F.lit(0).alias("y")
        )
    ).withColumn("fold", (F.col("c_custkey") % 5).cast("int"))
    seg_fold = labeled.groupBy("c_mktsegment", "fold").agg(
        F.sum("y").alias("f_pos"), F.count(F.lit(1)).alias("f_n")
    )
    seg = seg_fold.groupBy("c_mktsegment").agg(
        F.sum("f_pos").alias("s_pos"), F.sum("f_n").alias("s_n")
    )
    enc = (
        labeled.join(F.broadcast(seg_fold), ["c_mktsegment", "fold"])
        .join(F.broadcast(seg), "c_mktsegment")
    )
    te = F.when(
        (F.col("s_n") - F.col("f_n")) > 0,
        (F.col("s_pos") - F.col("f_pos")).cast("double")
        / (F.col("s_n") - F.col("f_n")).cast("double"),
    )
    return enc.select(
        "c_custkey",
        "c_mktsegment",
        "fold",
        F.round(te, 6).alias("target_enc"),
    )


ORACLE_TARGET_ENCODE = """
WITH labeled AS (
  SELECT c.c_custkey, c.c_mktsegment,
         CAST(c.c_custkey % 5 AS INT) AS fold,
         CASE WHEN EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey
                             AND o.o_orderpriority = '1-URGENT')
              THEN 1 ELSE 0 END AS y
  FROM customer c
), seg_fold AS (
  SELECT c_mktsegment, fold,
         CAST(SUM(y) AS BIGINT) AS f_pos, COUNT(*) AS f_n
  FROM labeled GROUP BY c_mktsegment, fold
), seg AS (
  SELECT c_mktsegment,
         CAST(SUM(f_pos) AS BIGINT) AS s_pos,
         CAST(SUM(f_n) AS BIGINT) AS s_n
  FROM seg_fold GROUP BY c_mktsegment
)
SELECT l.c_custkey, l.c_mktsegment, l.fold,
       ROUND(CASE WHEN (s.s_n - sf.f_n) > 0
                  THEN CAST(s.s_pos - sf.f_pos AS DOUBLE)
                       / CAST(s.s_n - sf.f_n AS DOUBLE) END, 6) AS target_enc
FROM labeled l
JOIN seg_fold sf ON l.c_mktsegment = sf.c_mktsegment AND l.fold = sf.fold
JOIN seg s ON l.c_mktsegment = s.c_mktsegment
"""

QUERIES["target_encode_loo"] = q_target_encode_loo
ORACLES["target_encode_loo"] = ORACLE_TARGET_ENCODE


# --- sequence pattern matching (MATCH_RECOGNIZE-lite) ------------------


def q_sequence_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral pattern detection: does the user's event
    sequence contain view → click → purchase as a SUBSEQUENCE (other
    events may interleave)? The MATCH_RECOGNIZE shape expressed as
    order-preserving aggregation + one regex: sort-struct collect per
    user (array_sort on (ts, event_id) makes the aggregation order-
    independent — collect_list alone is partition-order-dependent!),
    project to the type string, regex for the subsequence. One
    shuffle; the regex is per-row codegen."""
    ev = read_table(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("_s")
    )
    types = F.concat_ws(
        ",", F.transform("_s", lambda s: s.getField("event_type"))
    )
    return seq.select(
        "user_id",
        F.size("_s").cast("long").alias("n_events"),
        types.rlike("view.*click.*purchase").alias("matched"),
    )


ORACLE_SEQUENCE_PATTERN = """
SELECT user_id,
       COUNT(*) AS n_events,
       regexp_matches(string_agg(event_type, ',' ORDER BY ts, event_id),
                      'view.*click.*purchase') AS matched
FROM events
GROUP BY user_id
"""

QUERIES["sequence_pattern_match"] = q_sequence_pattern_match
ORACLES["sequence_pattern_match"] = ORACLE_SEQUENCE_PATTERN


# --- survival analysis: Kaplan-Meier retention -------------------------


def q_kaplan_meier_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of user lifetime (days between
    first and last event), right-censored at the observation edge:
    users whose last event falls in the final 7 days of the dataset
    are censored (still alive), earlier last-events are churn events.
    Cohorts = first-seen event type (total-order pick on (ts,
    event_id)).

    KM estimator: at each lifetime t with d churns out of n at-risk,
    S(t) = Π (1 − d/n). The running product is exp(Σ ln factor) with
    per-step terms rounded then decimal-summed — the order-independent
    float idiom — and S snaps to exact 0 from the first step where the
    whole risk set churns. Two hash-aggs + one cohort window; the
    at-risk count comes from a cumulative sum, not a per-t re-scan."""
    ev = read_table(spark, sf_dir, "events")
    day = (F.unix_micros(F.col("ts")) / F.lit(DAY_US)).cast("long")
    w1 = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    per_user = (
        ev.select(
            "user_id",
            day.alias("day"),
            F.row_number().over(w1).alias("_rn"),
            F.col("event_type"),
        )
        .groupBy("user_id")
        .agg(
            F.min("day").alias("first_day"),
            F.max("day").alias("last_day"),
            F.max(F.when(F.col("_rn") == 1, F.col("event_type"))).alias("cohort"),
        )
    )
    max_day = per_user.agg(F.max("last_day").alias("mx"))
    lab = per_user.crossJoin(F.broadcast(max_day)).select(
        "cohort",
        (F.col("last_day") - F.col("first_day")).alias("t"),
        F.when(F.col("last_day") <= F.col("mx") - 7, F.lit(1))
        .otherwise(F.lit(0))
        .alias("churn"),
    )
    per_t = lab.groupBy("cohort", "t").agg(
        F.sum("churn").alias("d"), F.count(F.lit(1)).alias("exits")
    )
    tot = lab.groupBy("cohort").agg(F.count(F.lit(1)).alias("n_cohort"))
    wt = Window.partitionBy("cohort").orderBy("t")
    km = (
        per_t.join(F.broadcast(tot), "cohort")
        .withColumn(
            "n_at_risk",
            F.col("n_cohort")
            - F.coalesce(
                F.sum("exits").over(wt.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .withColumn(
            "_term",
            F.when(
                F.col("d") < F.col("n_at_risk"),
                F.round(
                    F.log(
                        (F.col("n_at_risk") - F.col("d")).cast("double")
                        / F.col("n_at_risk").cast("double")
                    ),
                    8,
                ).cast("decimal(28,8)"),
            ),
        )
        .withColumn(
            "_dead",
            F.max((F.col("d") >= F.col("n_at_risk")).cast("int")).over(
                wt.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn(
            "_cum",
            F.sum("_term").over(wt.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    surv = F.when(F.col("_dead") == 1, F.lit(0.0)).otherwise(
        F.exp(F.col("_cum").cast("double"))
    )
    return km.select(
        "cohort",
        "t",
        F.col("n_at_risk").cast("long").alias("n_at_risk"),
        F.col("d").cast("long").alias("n_churned"),
        F.round(surv, 6).alias("survival"),
    )


ORACLE_KAPLAN_MEIER = """
WITH ranked AS (
  SELECT user_id, event_type, epoch_us(ts) // 86400000000 AS day,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), pu AS (
  SELECT user_id,
         MIN(day) AS first_day,
         MAX(day) AS last_day,
         MAX(CASE WHEN rn = 1 THEN event_type END) AS cohort
  FROM ranked GROUP BY user_id
), mx AS (
  SELECT MAX(last_day) AS mx FROM pu
), lab AS (
  SELECT cohort, last_day - first_day AS t,
         CASE WHEN last_day <= mx - 7 THEN 1 ELSE 0 END AS churn
  FROM pu, mx
), per_t AS (
  SELECT cohort, t, CAST(SUM(churn) AS BIGINT) AS d, COUNT(*) AS exits
  FROM lab GROUP BY cohort, t
), tot AS (
  SELECT cohort, COUNT(*) AS n_cohort FROM lab GROUP BY cohort
), km AS (
  SELECT p.cohort, p.t, p.d,
         tot.n_cohort
         - COALESCE(SUM(p.exits) OVER (PARTITION BY p.cohort ORDER BY p.t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS n_at_risk
  FROM per_t p JOIN tot ON p.cohort = tot.cohort
), terms AS (
  SELECT cohort, t, d, n_at_risk,
         CASE WHEN d < n_at_risk
              THEN CAST(ROUND(ln(CAST(n_at_risk - d AS DOUBLE)
                                 / CAST(n_at_risk AS DOUBLE)), 8)
                        AS DECIMAL(28,8)) END AS term,
         MAX(CASE WHEN d >= n_at_risk THEN 1 ELSE 0 END)
             OVER (PARTITION BY cohort ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead
  FROM km
)
SELECT cohort, t, CAST(n_at_risk AS BIGINT) AS n_at_risk, d AS n_churned,
       ROUND(CASE WHEN dead = 1 THEN 0.0
                  ELSE exp(CAST(SUM(term) OVER (PARTITION BY cohort ORDER BY t
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS DOUBLE)) END, 6) AS survival
FROM terms
"""

QUERIES["kaplan_meier_retention"] = q_kaplan_meier_retention
ORACLES["kaplan_meier_retention"] = ORACLE_KAPLAN_MEIER


# --- maximal independent set (Luby, deterministic priorities) ----------


def q_mis_user_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luby MIS over the (symmetrized) user-transition graph — the
    parallel-scheduling primitive (conflict-free subset selection).
    Convergence round count is graph-dependent → rows-only; the
    value-checked twin is `mis_planted_recall` (matching graph, round
    1 provably resolves everything)."""
    from kg_etl_spark.operators.adjacent import transition_edges_cut
    from kg_etl_spark.operators.mis import luby_mis

    ev = read_table(spark, sf_dir, "events")
    edges = transition_edges_cut(ev)
    return luby_mis(edges)


QUERIES["mis_user_graph"] = q_mis_user_graph
# rows-only: settle-round depends on the convergence trajectory; the
# planted twin below is the value gate.


def q_mis_planted_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted-provable twin of `mis_user_graph`: a PERFECT MATCHING
    (disjoint edges — consecutive customers by key rank). On a
    matching, Luby round 0 fully resolves: each edge independently
    selects its smaller-priority endpoint and dominates the other, so
    the exact output — including the hash comparisons — is enumerable
    in SQL with the same (A·v + C) mod P arithmetic."""
    from kg_etl_spark.operators.mis import luby_mis

    cust = read_table(spark, sf_dir, "customer")
    w = Window.orderBy("c_custkey")  # global rank: planted input, OK
    ranked = cust.select(
        "c_custkey", F.row_number().over(w).alias("rn")
    ).lineage_cut(eager=True)
    left = ranked.filter(F.col("rn") % 2 == 1).select(
        F.col("c_custkey").alias("src"), ((F.col("rn") + 1) / 2).cast("long").alias("_pair")
    )
    right = ranked.filter(F.col("rn") % 2 == 0).select(
        F.col("c_custkey").alias("dst"), (F.col("rn") / 2).cast("long").alias("_pair")
    )
    edges = left.join(right, "_pair").select("src", "dst")
    return luby_mis(edges)


ORACLE_MIS_PLANTED = """
WITH ranked AS (
  SELECT c_custkey, ROW_NUMBER() OVER (ORDER BY c_custkey) AS rn
  FROM customer
), pairs AS (
  SELECT l.c_custkey AS src, r.c_custkey AS dst
  FROM ranked l JOIN ranked r ON r.rn = l.rn + 1
  WHERE l.rn % 2 = 1
), pri AS (
  SELECT src, dst,
         (1103515245 * src + 1013904223) % 2147483647 AS ps,
         (1103515245 * dst + 1013904223) % 2147483647 AS pd
  FROM pairs
)
SELECT src AS node,
       (ps < pd OR (ps = pd AND src < dst)) AS selected, 0 AS round FROM pri
UNION ALL
SELECT dst AS node,
       (pd < ps OR (pd = ps AND dst < src)) AS selected, 0 AS round FROM pri
"""

QUERIES["mis_planted_recall"] = q_mis_planted_recall
ORACLES["mis_planted_recall"] = ORACLE_MIS_PLANTED


# --- isotonic regression (PAV calibration) -----------------------------


def q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotone (isotonic) fit of daily mean value per event type —
    PAV calibration over the daily series (operators/isotonic.py).
    The pooling recursion isn't SQL-expressible → rows-only; the
    value gate is `isotonic_planted_recall`."""
    from kg_etl_spark.operators.isotonic import isotonic_fit

    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        (F.unix_micros(F.col("ts")) / F.lit(DAY_US)).cast("long").alias("day"),
    ).agg(
        F.round(
            F.sum(F.col("value").cast(DEC)).cast("double") / F.count(F.lit(1)), 6
        ).alias("day_value")
    )
    return isotonic_fit(daily, "event_type", "day", "day_value", "day")


QUERIES["isotonic_calibration"] = q_isotonic_calibration
# rows-only: PAV pooling is sequential; planted twin below is the gate.


def q_isotonic_planted_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted-provable twin of `isotonic_calibration`: per nation,
    customers ranked by key form the x-axis; EVEN nations get a
    strictly increasing y (PAV is the identity — zero pooling), ODD
    nations a strictly decreasing y (PAV collapses to ONE pool — the
    group mean everywhere). Both extremes are enumerable in SQL, and
    together they pin the two boundary behaviors of the pooling rule."""
    from kg_etl_spark.operators.isotonic import isotonic_fit

    cust = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_custkey")
    planted = cust.select(
        "c_nationkey",
        F.row_number().over(w).alias("x"),
    ).withColumn(
        "y",
        F.when(
            F.col("c_nationkey") % 2 == 0, F.col("x").cast("double")
        ).otherwise(-F.col("x").cast("double")),
    )
    return isotonic_fit(planted, "c_nationkey", "x", "y", "x")


ORACLE_ISOTONIC_PLANTED = """
WITH planted AS (
  SELECT c_nationkey,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS x
  FROM customer
), y AS (
  SELECT c_nationkey, x,
         CASE WHEN c_nationkey % 2 = 0 THEN CAST(x AS DOUBLE)
              ELSE -CAST(x AS DOUBLE) END AS y
  FROM planted
), g AS (
  SELECT c_nationkey, CAST(SUM(y) AS DOUBLE) / COUNT(*) AS mean_y
  FROM y GROUP BY c_nationkey
)
SELECT y.c_nationkey, y.x, y.y,
       ROUND(CASE WHEN y.c_nationkey % 2 = 0 THEN y.y ELSE g.mean_y END, 6)
         AS y_fit
FROM y JOIN g ON y.c_nationkey = g.c_nationkey
"""

QUERIES["isotonic_planted_recall"] = q_isotonic_planted_recall
ORACLES["isotonic_planted_recall"] = ORACLE_ISOTONIC_PLANTED


# --- governance: l-diversity audit -------------------------------------


def q_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity check (Machanavajjhala et al., ICDE'06) on the
    (nation, segment) quasi-identifier groups with balance sign as the
    sensitive attribute: a group where every member shares one
    sensitive value (n_sensitive < 2) is re-identifiable even when
    k-anonymous — the audit k_anonymity alone misses. One hash-agg."""
    cust = read_table(spark, sf_dir, "customer")
    sens = F.when(F.col("c_acctbal") >= 0, F.lit("nonneg")).otherwise(F.lit("neg"))
    return (
        cust.select("c_nationkey", "c_mktsegment", sens.alias("_s"))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.countDistinct("_s").alias("n_sensitive"),
        )
        .withColumn("l_diverse", F.col("n_sensitive") >= 2)
    )


ORACLE_L_DIVERSITY = """
SELECT c_nationkey, c_mktsegment,
       COUNT(*) AS group_size,
       COUNT(DISTINCT CASE WHEN c_acctbal >= 0 THEN 'nonneg' ELSE 'neg' END)
         AS n_sensitive,
       COUNT(DISTINCT CASE WHEN c_acctbal >= 0 THEN 'nonneg' ELSE 'neg' END) >= 2
         AS l_diverse
FROM customer
GROUP BY c_nationkey, c_mktsegment
"""

QUERIES["l_diversity_audit"] = q_l_diversity_audit
ORACLES["l_diversity_audit"] = ORACLE_L_DIVERSITY


# --- governance: noisy counts (Laplace mechanism, fixed seed) ----------


def q_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism noisy per-nation counts (sensitivity 1,
    ε = 1): noise = −b·sign(u−½)·ln(1−2|u−½|) with u inverse-CDF-
    sampled from a HASH of the group key instead of an RNG. The
    mechanism arithmetic is the real one; the fixed hash seed makes
    runs reproducible and cross-engine checkable — a production
    release would swap the hash for a fresh random draw per release
    (noted; determinism is the catalog contract here). One hash-agg +
    map-side noise."""
    cust = read_table(spark, sf_dir, "customer")
    counts = cust.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("true_count"))
    u = (
        (F.lit(1103515245) * F.col("c_nationkey").cast("long") + F.lit(1013904223))
        % F.lit(2147483647)
    ).cast("double") / F.lit(2147483647.0)
    c = u - F.lit(0.5)
    noise = -F.signum(c) * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(c))
    return counts.select(
        "c_nationkey",
        F.col("true_count").cast("long").alias("true_count"),
        F.round(F.col("true_count") + noise, 6).alias("noisy_count"),
    )


ORACLE_DP_NOISY = """
WITH counts AS (
  SELECT c_nationkey, COUNT(*) AS true_count FROM customer GROUP BY c_nationkey
), u AS (
  SELECT c_nationkey, true_count,
         CAST((1103515245 * CAST(c_nationkey AS BIGINT) + 1013904223)
              % 2147483647 AS DOUBLE)
           / 2147483647.0 - 0.5 AS c
  FROM counts
)
SELECT c_nationkey, true_count,
       ROUND(true_count + (-sign(c) * ln(1.0 - 2.0 * abs(c))), 6) AS noisy_count
FROM u
"""

QUERIES["dp_noisy_counts"] = q_dp_noisy_counts
ORACLES["dp_noisy_counts"] = ORACLE_DP_NOISY


# --- MERGE INTO upsert/delete ------------------------------------------


def q_merge_upsert_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MERGE INTO semantics in one full-outer join
    (operators/merge.py): a CDC-style source (per-customer order
    stats, plus synthetic NEW keys for heavy customers) merged into
    the customer dimension —
      WHEN MATCHED AND n_orders >= 20 THEN DELETE
      WHEN MATCHED THEN UPDATE balance += n_orders
      WHEN NOT MATCHED THEN INSERT (new key, balance = n_orders).
    """
    from kg_etl_spark.operators.merge import merge_into

    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    stats = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    src = stats.select(
        F.col("o_custkey").alias("c_custkey"), "n_orders"
    ).unionByName(
        stats.filter(F.col("n_orders") >= 15).select(
            (F.col("o_custkey") + 1_000_000).alias("c_custkey"), "n_orders"
        )
    )
    merged = merge_into(
        cust,
        src,
        "c_custkey",
        matched_delete=F.col("src_n_orders") >= 20,
        matched_update={
            "c_acctbal": F.round(
                F.col("c_acctbal") + F.col("src_n_orders").cast("double"), 6
            )
        },
        not_matched_insert={
            "c_custkey": F.col("__sk"),
            "c_name": F.lit("new-customer"),
            "c_nationkey": F.lit(-1),
            "c_acctbal": F.col("src_n_orders").cast("double"),
            "c_mktsegment": F.lit("UNKNOWN"),
        },
    )
    return merged.withColumn("c_acctbal", F.round("c_acctbal", 6))


ORACLE_MERGE_UPSERT = """
WITH stats AS (
  SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
), src AS (
  SELECT o_custkey AS k, n_orders FROM stats
  UNION ALL
  SELECT o_custkey + 1000000 AS k, n_orders FROM stats WHERE n_orders >= 15
), j AS (
  SELECT c.*, s.k, s.n_orders
  FROM customer c FULL OUTER JOIN src s ON c.c_custkey = s.k
)
SELECT COALESCE(c_custkey, k) AS c_custkey,
       CASE WHEN c_custkey IS NULL THEN 'new-customer' ELSE c_name END AS c_name,
       CASE WHEN c_custkey IS NULL THEN -1 ELSE c_nationkey END AS c_nationkey,
       ROUND(CASE WHEN c_custkey IS NULL THEN CAST(n_orders AS DOUBLE)
                  WHEN k IS NOT NULL THEN c_acctbal + n_orders
                  ELSE c_acctbal END, 6) AS c_acctbal,
       CASE WHEN c_custkey IS NULL THEN 'UNKNOWN' ELSE c_mktsegment END
         AS c_mktsegment
FROM j
WHERE NOT (c_custkey IS NOT NULL AND k IS NOT NULL AND n_orders >= 20)
"""

QUERIES["merge_upsert_delete"] = q_merge_upsert_delete
ORACLES["merge_upsert_delete"] = ORACLE_MERGE_UPSERT


# --- statistics: exact distribution moments ----------------------------


def q_distribution_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean / variance / skewness / kurtosis per event type computed
    from EXACT power sums — not the built-in skewness()/kurtosis()
    aggregates, whose bias conventions differ between engines (Spark:
    population g1/g2; DuckDB: sample-corrected). Per-row powers are
    rounded to 6 dp and decimal-summed (order-independent), then the
    raw-moment formulas run in identical double arithmetic both
    sides. One hash-agg; map-side partials."""
    ev = read_table(spark, sf_dir, "events")
    v = F.col("value")
    p = lambda k: F.round(v ** k, 6).cast("decimal(28,6)")
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(p(1)).cast("double").alias("s1"),
        F.sum(p(2)).cast("double").alias("s2"),
        F.sum(p(3)).cast("double").alias("s3"),
        F.sum(p(4)).cast("double").alias("s4"),
    )
    n = F.col("n").cast("double")
    mean = F.col("s1") / n
    m2 = F.col("s2") / n - mean * mean
    m3 = F.col("s3") / n - 3 * mean * F.col("s2") / n + 2 * mean ** 3
    m4 = (
        F.col("s4") / n
        - 4 * mean * F.col("s3") / n
        + 6 * mean * mean * F.col("s2") / n
        - 3 * mean ** 4
    )
    return agg.select(
        "event_type",
        "n",
        F.round(mean, 6).alias("mean"),
        F.round(m2, 6).alias("variance"),
        F.round(m3 / (m2 ** F.lit(1.5)), 6).alias("skewness"),
        F.round(m4 / (m2 * m2) - 3, 6).alias("excess_kurtosis"),
    )


ORACLE_DISTRIBUTION_MOMENTS = """
WITH s AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(CAST(ROUND(value, 6)          AS DECIMAL(28,6))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(ROUND(value * value, 6)  AS DECIMAL(28,6))) AS DOUBLE) AS s2,
         CAST(SUM(CAST(ROUND(value * value * value, 6) AS DECIMAL(28,6))) AS DOUBLE) AS s3,
         CAST(SUM(CAST(ROUND(value * value * value * value, 6) AS DECIMAL(28,6))) AS DOUBLE) AS s4
  FROM events GROUP BY event_type
)
SELECT event_type, n,
       ROUND(s1 / n, 6) AS mean,
       ROUND(s2 / n - (s1/n) * (s1/n), 6) AS variance,
       ROUND((s3/n - 3 * (s1/n) * s2/n + 2 * pow(s1/n, 3))
             / pow(s2/n - (s1/n)*(s1/n), 1.5), 6) AS skewness,
       ROUND((s4/n - 4*(s1/n)*s3/n + 6*(s1/n)*(s1/n)*s2/n - 3*pow(s1/n, 4))
             / pow(s2/n - (s1/n)*(s1/n), 2) - 3, 6) AS excess_kurtosis
FROM s
"""

QUERIES["distribution_moments"] = q_distribution_moments
ORACLES["distribution_moments"] = ORACLE_DISTRIBUTION_MOMENTS


# --- statistics: two-sample Kolmogorov-Smirnov -------------------------


def q_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS statistic between 'click' and 'view' value
    distributions: D = sup |F1 − F2| over the pooled sample. Exact:
    per distinct value, cumulative per-group counts over the value
    order via the scale-safe two-phase cumsum (rankdev.global_cumsum:
    per-range local cumsums + broadcast per-range partial-sum offsets —
    no single-partition window), D from integer rationals.
    Deterministic, one row out."""
    from kg_etl_spark.operators.rankdev import global_cumsum

    ev = read_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    per_v = ev.groupBy("value").agg(
        F.sum((F.col("event_type") == "click").cast("long")).alias("c1"),
        F.sum((F.col("event_type") == "view").cast("long")).alias("c2"),
    ).lineage_cut(eager=True)  # device re-reads it 2×
    tot = per_v.agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    cdf = global_cumsum(per_v, "value", ["c1", "c2"], prefix="_a").select(
        F.col("_ac1").alias("a1"), F.col("_ac2").alias("a2")
    )
    d = cdf.crossJoin(F.broadcast(tot)).select(
        F.abs(
            F.col("a1").cast("double") / F.col("n1").cast("double")
            - F.col("a2").cast("double") / F.col("n2").cast("double")
        ).alias("_d"),
        "n1",
        "n2",
    )
    return d.groupBy("n1", "n2").agg(F.round(F.max("_d"), 6).alias("d_stat")).select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        "d_stat",
    )


ORACLE_KS_TWO_SAMPLE = """
WITH per_v AS (
  SELECT value,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM events WHERE event_type IN ('click', 'view')
  GROUP BY value
), tot AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2 FROM per_v
), cdf AS (
  SELECT CAST(SUM(c1) OVER w AS BIGINT) AS a1, CAST(SUM(c2) OVER w AS BIGINT) AS a2
  FROM per_v
  WINDOW w AS (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT n1, n2,
       ROUND(MAX(abs(CAST(a1 AS DOUBLE)/n1 - CAST(a2 AS DOUBLE)/n2)), 6) AS d_stat
FROM cdf, tot
GROUP BY n1, n2
"""

QUERIES["ks_two_sample"] = q_ks_two_sample
ORACLES["ks_two_sample"] = ORACLE_KS_TWO_SAMPLE


# --- statistics: Welch's t-test ----------------------------------------


def q_welch_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t statistic + Welch–Satterthwaite df
    between 'purchase' and 'error' values — exact decimal power sums,
    sample variances, one double expression. (No p-value: neither
    engine has a portable student-t CDF; t + df are the mergeable
    cluster-side outputs, the CDF lookup is a driver-side constant
    table at any scale.)"""
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "error")
    )
    p = lambda k: F.round(F.col("value") ** k, 6).cast("decimal(28,6)")
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(p(1)).cast("double").alias("s1"),
        F.sum(p(2)).cast("double").alias("s2"),
    )
    stats = agg.select(
        "event_type",
        "n",
        (F.col("s1") / F.col("n")).alias("_m"),
        (
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("_v"),
    )
    a = stats.filter(F.col("event_type") == "purchase").select(
        F.col("n").alias("n1"), F.col("_m").alias("m1"), F.col("_v").alias("v1")
    )
    b = stats.filter(F.col("event_type") == "error").select(
        F.col("n").alias("n2"), F.col("_m").alias("m2"), F.col("_v").alias("v2")
    )
    j = a.crossJoin(F.broadcast(b))
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    df_w = (se2 * se2) / (
        (F.col("v1") / F.col("n1")) ** 2 / (F.col("n1") - 1)
        + (F.col("v2") / F.col("n2")) ** 2 / (F.col("n2") - 1)
    )
    return j.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.round((F.col("m1") - F.col("m2")) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(df_w, 6).alias("df"),
    )


ORACLE_WELCH_T = """
WITH s AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(28,6))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(ROUND(value * value, 6) AS DECIMAL(28,6))) AS DOUBLE) AS s2
  FROM events WHERE event_type IN ('purchase', 'error')
  GROUP BY event_type
), st AS (
  SELECT event_type, n, s1 / n AS m, (s2 - s1 * s1 / n) / (n - 1) AS v FROM s
), a AS (SELECT n AS n1, m AS m1, v AS v1 FROM st WHERE event_type = 'purchase'),
b AS (SELECT n AS n2, m AS m2, v AS v2 FROM st WHERE event_type = 'error')
SELECT n1, n2,
       ROUND((m1 - m2) / sqrt(v1/n1 + v2/n2), 6) AS t_stat,
       ROUND(pow(v1/n1 + v2/n2, 2)
             / (pow(v1/n1, 2)/(n1-1) + pow(v2/n2, 2)/(n2-1)), 6) AS df
FROM a, b
"""

QUERIES["welch_t_test"] = q_welch_t_test
ORACLES["welch_t_test"] = ORACLE_WELCH_T


# --- time series: EWMA via sequential fold -----------------------------


def q_ewma_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of each type's daily
    series, alpha = 0.3 — the recursive smoother. A window SUM of
    pow-weights would fight engine fold order; instead BOTH engines
    run the SAME sequential left fold over the day-ordered array
    (Spark: array_sort + aggregate HOF; DuckDB: list(ORDER BY) +
    list_reduce) — bit-identical recursion, the deterministic-fold
    idiom from pagerank's oracle path. Emits the final smoothed level
    per type. Fold state is one double; the array lives on the
    executor (per-series length bound, as with sessionize)."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        (F.unix_micros(F.col("ts")) / F.lit(DAY_US)).cast("long").alias("day"),
    ).agg(
        F.round(
            F.sum(F.col("value").cast(DEC)).cast("double") / F.count(F.lit(1)), 6
        ).alias("v")
    )
    series = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "v"))).alias("_s"),
        F.count(F.lit(1)).alias("n_days"),
    )
    vals = F.transform("_s", lambda s: s.getField("v"))
    ewma = F.aggregate(
        vals,
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x).otherwise(
            F.lit(0.3) * x + F.lit(0.7) * acc
        ),
    )
    return series.select(
        "event_type", "n_days", F.round(ewma, 6).alias("ewma")
    )


ORACLE_EWMA = """
WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6) AS v
  FROM events GROUP BY 1, 2
)
SELECT event_type, COUNT(*) AS n_days,
       ROUND(list_reduce(list(v ORDER BY day),
                         (acc, x) -> 0.3 * x + 0.7 * acc), 6) AS ewma
FROM daily GROUP BY event_type
"""

QUERIES["ewma_final"] = q_ewma_final
ORACLES["ewma_final"] = ORACLE_EWMA


# --- audit: Benford first-digit law ------------------------------------


def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the
    classic fabricated-numbers detector. First significant digit via
    floor(x / 10^floor(log10 x)); per-digit observed vs expected
    log10(1 + 1/d) counts and the per-digit chi-square contribution.
    One hash-agg on a 9-value key."""
    orders = read_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digit = F.floor(
        F.col("o_totalprice") / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
    ).cast("int")
    per_d = orders.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("observed")
    )
    tot = per_d.agg(F.sum("observed").alias("n"))
    exp = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")) * F.col("n")
    return per_d.crossJoin(F.broadcast(tot)).select(
        "digit",
        F.col("observed").cast("long").alias("observed"),
        F.round(exp, 6).alias("expected"),
        F.round((F.col("observed") - exp) ** 2 / exp, 6).alias("chi2_term"),
    )


ORACLE_BENFORD = """
WITH d AS (
  SELECT CAST(floor(o_totalprice / pow(10.0, floor(log10(o_totalprice)))) AS INT)
           AS digit
  FROM orders WHERE o_totalprice > 0
), per_d AS (
  SELECT digit, COUNT(*) AS observed FROM d GROUP BY digit
), tot AS (
  SELECT CAST(SUM(observed) AS BIGINT) AS n FROM per_d
)
SELECT digit, observed,
       ROUND(log10(1.0 + 1.0 / digit) * n, 6) AS expected,
       ROUND(pow(observed - log10(1.0 + 1.0 / digit) * n, 2)
             / (log10(1.0 + 1.0 / digit) * n), 6) AS chi2_term
FROM per_d, tot
"""

QUERIES["benford_audit"] = q_benford_audit
ORACLES["benford_audit"] = ORACLE_BENFORD


# --- inventory: floor-clamped running balance (sequential fold) --------


def q_stock_running_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Floor-clamped running stock level per supplier: daily net
    quantity deltas (shipments negative on odd days — a deterministic
    in/out signal), folded as level = max(0, level + delta). The
    clamp makes this NON-window-expressible (the reset propagates
    recursively) — the sequential-fold idiom again: both engines run
    the identical day-ordered left fold (aggregate HOF vs
    list_reduce). Emits the final level per supplier."""
    li = read_table(spark, sf_dir, "lineitem")
    day = (F.unix_micros(F.col("l_shipdate")) / F.lit(DAY_US)).cast("long")
    daily = li.groupBy(
        "l_suppkey", day.alias("day")
    ).agg(
        F.sum(
            F.when(day % 2 == 1, -F.col("l_quantity")).otherwise(F.col("l_quantity"))
            .cast(DEC)
        )
        .cast("double")
        .alias("delta")
    )
    series = daily.groupBy("l_suppkey").agg(
        F.array_sort(F.collect_list(F.struct("day", "delta"))).alias("_s"),
        F.count(F.lit(1)).alias("n_days"),
    )
    deltas = F.transform("_s", lambda s: s.getField("delta"))
    level = F.aggregate(
        deltas,
        F.lit(0.0),
        lambda acc, x: F.greatest(F.lit(0.0), acc + x),
    )
    return series.select(
        "l_suppkey", "n_days", F.round(level, 6).alias("final_level")
    )


ORACLE_STOCK_FLOOR = """
WITH daily AS (
  SELECT l_suppkey, epoch_us(l_shipdate) // 86400000000 AS day,
         CAST(SUM(CAST(CASE WHEN (epoch_us(l_shipdate) // 86400000000) % 2 = 1
                            THEN -l_quantity ELSE l_quantity END
                       AS DECIMAL(28,6))) AS DOUBLE) AS delta
  FROM lineitem GROUP BY 1, 2
)
SELECT l_suppkey, COUNT(*) AS n_days,
       ROUND(list_reduce(list_prepend(0.0, list(delta ORDER BY day)),
                         (acc, x) -> greatest(0.0, acc + x)), 6) AS final_level
FROM daily GROUP BY l_suppkey
"""

QUERIES["stock_running_floor"] = q_stock_running_floor
ORACLES["stock_running_floor"] = ORACLE_STOCK_FLOOR


# --- statistics: two-proportion z-test (A/B) ---------------------------


def q_ab_test_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on a deterministic A/B split (variant =
    user_id mod 2): conversion = user ever purchased. Pooled-variance
    z statistic from exact integer counts — one hash-agg per variant,
    a 2-row broadcast cross. The experimentation-readout primitive."""
    ev = read_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("converted")
    )
    per_variant = per_user.groupBy(
        (F.col("user_id") % 2).cast("int").alias("variant")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("converted").alias("conv"),
    )
    a = per_variant.filter(F.col("variant") == 0).select(
        F.col("n").alias("n1"), F.col("conv").alias("c1")
    )
    b = per_variant.filter(F.col("variant") == 1).select(
        F.col("n").alias("n2"), F.col("conv").alias("c2")
    )
    j = a.crossJoin(F.broadcast(b))
    p1 = F.col("c1").cast("double") / F.col("n1").cast("double")
    p2 = F.col("c2").cast("double") / F.col("n2").cast("double")
    pp = (F.col("c1") + F.col("c2")).cast("double") / (
        F.col("n1") + F.col("n2")
    ).cast("double")
    se = F.sqrt(
        pp * (F.lit(1.0) - pp)
        * (F.lit(1.0) / F.col("n1") + F.lit(1.0) / F.col("n2"))
    )
    return j.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("c1").cast("long").alias("c1"),
        F.col("n2").cast("long").alias("n2"),
        F.col("c2").cast("long").alias("c2"),
        F.round(p1 - p2, 6).alias("rate_diff"),
        F.round(F.when(se > 0, (p1 - p2) / se), 6).alias("z_stat"),
    )


ORACLE_AB_TEST = """
WITH per_user AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
), pv AS (
  SELECT CAST(user_id % 2 AS INT) AS variant, COUNT(*) AS n,
         CAST(SUM(converted) AS BIGINT) AS conv
  FROM per_user GROUP BY 1
), a AS (SELECT n AS n1, conv AS c1 FROM pv WHERE variant = 0),
b AS (SELECT n AS n2, conv AS c2 FROM pv WHERE variant = 1)
SELECT n1, c1, n2, c2,
       ROUND(CAST(c1 AS DOUBLE)/n1 - CAST(c2 AS DOUBLE)/n2, 6) AS rate_diff,
       ROUND(CASE WHEN sqrt((CAST(c1+c2 AS DOUBLE)/(n1+n2))
                            * (1.0 - CAST(c1+c2 AS DOUBLE)/(n1+n2))
                            * (1.0/n1 + 1.0/n2)) > 0
                  THEN (CAST(c1 AS DOUBLE)/n1 - CAST(c2 AS DOUBLE)/n2)
                       / sqrt((CAST(c1+c2 AS DOUBLE)/(n1+n2))
                              * (1.0 - CAST(c1+c2 AS DOUBLE)/(n1+n2))
                              * (1.0/n1 + 1.0/n2)) END, 6) AS z_stat
FROM a, b
"""

QUERIES["ab_test_proportions"] = q_ab_test_proportions
ORACLES["ab_test_proportions"] = ORACLE_AB_TEST


# --- time series: autocorrelation function -----------------------------


def q_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACF at lags 1–7 of each type's daily mean series — the
    seasonality/persistence readout. Per lag: a self-join of the
    daily frame on (type, day+lag) — the join key reuses the daily
    hash partitioning, so the 7 lags are 7 cheap co-partitioned
    joins (one plan via the lag dimension explode, not 7 scans).
    Numerator/denominator from exact decimal sums of rounded daily
    values; mean-centering uses the same exact mean both sides."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        (F.unix_micros(F.col("ts")) / F.lit(DAY_US)).cast("long").alias("day"),
    ).agg(
        F.round(
            F.sum(F.col("value").cast(DEC)).cast("double") / F.count(F.lit(1)), 6
        ).alias("v")
    ).lineage_cut(eager=True)
    stats = daily.groupBy("event_type").agg(
        (F.sum(F.col("v").cast(DEC)).cast("double") / F.count(F.lit(1))).alias("_mu"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,12)")).cast("double").alias("_s2"),
        F.count(F.lit(1)).alias("_n"),
    )
    lags = daily.select(
        "event_type", "day", "v", F.explode(F.sequence(F.lit(1), F.lit(7))).alias("lag")
    )
    nxt = daily.select(
        "event_type",
        (F.col("day")).alias("_d2"),
        F.col("v").alias("_v2"),
    )
    pairs = lags.join(
        nxt,
        (lags.event_type == nxt.event_type) & (F.col("_d2") == F.col("day") + F.col("lag")),
    ).select(lags.event_type.alias("event_type"), "lag", "v", "_v2")
    prod = pairs.groupBy("event_type", "lag").agg(
        F.sum((F.col("v") * F.col("_v2")).cast("decimal(38,12)")).cast("double").alias("_sxy"),
        F.sum(F.col("v").cast(DEC)).cast("double").alias("_sx"),
        F.sum(F.col("_v2").cast(DEC)).cast("double").alias("_sy"),
        F.count(F.lit(1)).alias("_k"),
    )
    j = prod.join(F.broadcast(stats), "event_type")
    num = F.col("_sxy") - F.col("_mu") * (F.col("_sx") + F.col("_sy")) + F.col("_k") * F.col("_mu") * F.col("_mu")
    den = F.col("_s2") - F.lit(2.0) * F.col("_mu") * F.col("_mu") * F.col("_n") + F.col("_n") * F.col("_mu") * F.col("_mu")
    return j.select(
        "event_type",
        F.col("lag").cast("int").alias("lag"),
        F.col("_k").cast("long").alias("n_pairs"),
        F.round(F.when(den > 0, num / den), 6).alias("acf"),
    )


ORACLE_AUTOCORRELATION = """
WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6) AS v
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT event_type,
         CAST(SUM(CAST(v AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS mu,
         CAST(SUM(CAST(v * v AS DECIMAL(38,12))) AS DOUBLE) AS s2,
         COUNT(*) AS n
  FROM daily GROUP BY event_type
), lags AS (
  SELECT d.event_type, l.lag, d.v, d2.v AS v2
  FROM daily d
  JOIN (SELECT UNNEST(generate_series(1, 7)) AS lag) l ON TRUE
  JOIN daily d2 ON d2.event_type = d.event_type AND d2.day = d.day + l.lag
), prod AS (
  SELECT event_type, lag,
         CAST(SUM(CAST(v * v2 AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(v AS DECIMAL(28,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(v2 AS DECIMAL(28,6))) AS DOUBLE) AS sy,
         COUNT(*) AS k
  FROM lags GROUP BY event_type, lag
)
SELECT p.event_type, CAST(p.lag AS INT) AS lag, p.k AS n_pairs,
       ROUND(CASE WHEN (s.s2 - 2.0*s.mu*s.mu*s.n + s.n*s.mu*s.mu) > 0
                  THEN (p.sxy - s.mu*(p.sx + p.sy) + p.k*s.mu*s.mu)
                       / (s.s2 - 2.0*s.mu*s.mu*s.n + s.n*s.mu*s.mu)
             END, 6) AS acf
FROM prod p JOIN stats s ON p.event_type = s.event_type
"""

QUERIES["autocorrelation"] = q_autocorrelation
ORACLES["autocorrelation"] = ORACLE_AUTOCORRELATION


# --- temporal graph: earliest-arrival reachability ---------------------


def q_temporal_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-respecting (temporal) reachability: earliest-arrival time
    from a seed user over the transition graph where each edge u→v
    carries the timestamp of v's event and may only be taken AT or
    AFTER arriving at u — the temporal-network primitive (Holme &
    Saramäki, Phys. Rep. 2012) that static reachability gets wrong
    (paths must be time-ordered).

    Fixed 3 relaxation rounds on BOTH sides (each round is one
    edge-keyed shuffle: min arrival per head over tails satisfying
    t ≥ ea(tail)), so the oracle unrolls the identical 3 rounds as
    CTEs and the result is fully value-checked. Earliest-arrival
    relaxation is monotone, so fixed-round prefixes are well-defined.
    Seed = the global minimum user id, ea = 0."""
    from kg_etl_spark.operators.adjacent import transition_edges

    ev = read_table(spark, sf_dir, "events")
    edges = (
        transition_edges(ev, with_ts=True)
        .groupBy("src", "dst")
        .agg(F.min("t").alias("t"))  # keep earliest copy of each edge
        .lineage_cut(eager=True)
    )
    from kg_etl_spark.operators.temporal import temporal_earliest_arrival

    seed = edges.select(F.least(F.min("src"), F.min("dst")).alias("node"))
    ea = temporal_earliest_arrival(
        edges, seed.select("node", F.lit(0).cast("long").alias("ea")), rounds=3
    )
    return ea.select("node", F.col("ea").alias("earliest_arrival_us"))


ORACLE_TEMPORAL_REACHABILITY = """
WITH raw AS (
  SELECT user_id AS src,
         LEAD(user_id) OVER w AS dst,
         LEAD(epoch_us(ts)) OVER w AS t
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), e AS (
  SELECT src, dst, MIN(t) AS t FROM raw
  WHERE dst IS NOT NULL AND src <> dst GROUP BY src, dst
), seed AS (
  SELECT LEAST(MIN(src), MIN(dst)) AS node, CAST(0 AS BIGINT) AS ea FROM e
), r1 AS (
  SELECT node, MIN(ea) AS ea FROM (
    SELECT node, ea FROM seed
    UNION ALL
    SELECT e.dst AS node, MIN(e.t) AS ea
    FROM e JOIN seed s ON e.src = s.node AND e.t >= s.ea
    GROUP BY e.dst
  ) GROUP BY node
), r2 AS (
  SELECT node, MIN(ea) AS ea FROM (
    SELECT node, ea FROM r1
    UNION ALL
    SELECT e.dst AS node, MIN(e.t) AS ea
    FROM e JOIN r1 s ON e.src = s.node AND e.t >= s.ea
    GROUP BY e.dst
  ) GROUP BY node
), r3 AS (
  SELECT node, MIN(ea) AS ea FROM (
    SELECT node, ea FROM r2
    UNION ALL
    SELECT e.dst AS node, MIN(e.t) AS ea
    FROM e JOIN r2 s ON e.src = s.node AND e.t >= s.ea
    GROUP BY e.dst
  ) GROUP BY node
)
SELECT node, ea AS earliest_arrival_us FROM r3
"""

QUERIES["temporal_reachability"] = q_temporal_reachability
ORACLES["temporal_reachability"] = ORACLE_TEMPORAL_REACHABILITY


# --- SQL surface: correlated scalar subqueries -------------------------

# One-text SQL (runs verbatim in Spark SQL and DuckDB): correlated
# scalar subqueries in the SELECT list + EXISTS/IN disjunction in the
# WHERE — Catalyst decorrelates all three into outer joins + aggregates
# (visible in PLANS.md: no per-row re-execution, unlike a naive
# tuple-at-a-time engine).
SQL_CORRELATED_SCALARS = """
SELECT c.c_custkey,
       c.c_nationkey,
       (SELECT COUNT(*) FROM orders o
        WHERE o.o_custkey = c.c_custkey) AS n_orders,
       (SELECT CAST(MAX(o_totalprice) AS DOUBLE) FROM orders o
        WHERE o.o_custkey = c.c_custkey) AS max_price
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT')
   OR c.c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
"""


def q_sql_correlated_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_CORRELATED_SCALARS)


QUERIES["sql_correlated_scalars"] = q_sql_correlated_scalars
ORACLES["sql_correlated_scalars"] = SQL_CORRELATED_SCALARS


# --- business analytics: Gini coefficient ------------------------------


def q_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer revenue (inequality audit):
    G = 2·Σ(rank·x) / (n·Σx) − (n+1)/n over revenue sorted ascending
    (rank tie-broken by custkey — a total order, so the rank·x sum is
    deterministic). Revenue and the rank-weighted sum are exact
    decimal aggregates; the rank is the scale-safe two-phase exact
    rank (rankdev.global_row_number — range-bucketed parallel windows
    + broadcast prefix offsets; no single-partition window)."""
    from kg_etl_spark.operators.rankdev import global_row_number

    orders = read_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(DEC)).alias("rev")
    ).lineage_cut(eager=True)  # device re-reads it 3×
    ranked, _n = global_row_number(
        per_cust, "rev", tiebreaks=["o_custkey"], out_col="rnk",
        subkey="o_custkey",
    )
    ranked = ranked.select("rev", F.col("rnk").cast("long").alias("rnk"))
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rev").cast("double").alias("s"),
        F.sum((F.col("rnk") * F.col("rev")).cast("decimal(38,6)"))
        .cast("double")
        .alias("rs"),
    )
    n = F.col("n").cast("double")
    gini = F.lit(2.0) * F.col("rs") / (n * F.col("s")) - (n + 1) / n
    return agg.select(
        F.col("n").cast("long").alias("n_customers"),
        F.round(F.col("s"), 2).alias("total_revenue"),
        F.round(gini, 6).alias("gini"),
    )


ORACLE_REVENUE_GINI = """
WITH per_cust AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS rev
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT rev,
         CAST(ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS BIGINT) AS rnk
  FROM per_cust
), agg AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(rev) AS DOUBLE) AS s,
         CAST(SUM(CAST(rnk * rev AS DECIMAL(38,6))) AS DOUBLE) AS rs
  FROM ranked
)
SELECT n AS n_customers,
       ROUND(s, 2) AS total_revenue,
       ROUND(2.0 * rs / (n * s) - (CAST(n AS DOUBLE) + 1) / n, 6) AS gini
FROM agg
"""

QUERIES["revenue_gini"] = q_revenue_gini
ORACLES["revenue_gini"] = ORACLE_REVENUE_GINI


# --- business analytics: RFM segmentation ------------------------------


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency (days since last order, relative to
    the dataset max day), frequency (order count), monetary (revenue)
    — each scored into quintiles with total tie-breaks, concatenated
    into the classic 3-digit segment code. Each quintile is the
    scale-safe two-phase exact rank (rankdev.global_row_number +
    ntile_expr — range-bucketed parallel windows + broadcast prefix
    offsets; no single-partition window); the max-day scalar
    broadcasts."""
    from kg_etl_spark.operators.rankdev import (
        global_row_number,
        ntile_expr,
        prime_stats,
    )

    orders = read_table(spark, sf_dir, "orders")
    day = (F.unix_micros(F.col("o_orderdate")) / F.lit(DAY_US)).cast("long")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max(day).alias("last_day"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("monetary"),
    )
    mx = per_cust.agg(F.max("last_day").alias("mxd"))
    base = per_cust.crossJoin(F.broadcast(mx)).withColumn(
        "recency_days", F.col("mxd") - F.col("last_day")
    ).lineage_cut(eager=True)  # three rank devices re-read it
    # one bounds job for all three rank keys; the memo rides each
    # device's output, so the chained devices schedule no stats probes
    prime_stats(base, ["recency_days", "freq", "monetary"])
    # recency: LOWER is better → score 5 for the most recent quintile
    base, n = global_row_number(
        base, "recency_days", tiebreaks=["o_custkey"], out_col="_rr",
        subkey="o_custkey",
    )
    base, _ = global_row_number(
        base, "freq", ascending=False, tiebreaks=["o_custkey"],
        out_col="_rf", subkey="o_custkey",
    )
    base, _ = global_row_number(
        base, "monetary", ascending=False, tiebreaks=["o_custkey"],
        out_col="_rm", subkey="o_custkey",
    )
    inv = lambda q: F.lit(6) - q  # ntile 1 (best) -> score 5
    return base.select(
        "o_custkey",
        F.col("recency_days").cast("long").alias("recency_days"),
        F.col("freq").cast("long").alias("freq"),
        F.round("monetary", 2).alias("monetary"),
        inv(ntile_expr(F.col("_rr"), n, 5)).cast("int").alias("r_score"),
        inv(ntile_expr(F.col("_rf"), n, 5)).cast("int").alias("f_score"),
        inv(ntile_expr(F.col("_rm"), n, 5)).cast("int").alias("m_score"),
    )


ORACLE_RFM = """
WITH per_cust AS (
  SELECT o_custkey,
         MAX(epoch_us(o_orderdate) // 86400000000) AS last_day,
         COUNT(*) AS freq,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS monetary
  FROM orders GROUP BY o_custkey
), mx AS (SELECT MAX(last_day) AS mxd FROM per_cust)
SELECT o_custkey,
       CAST(mxd - last_day AS BIGINT) AS recency_days,
       freq,
       ROUND(monetary, 2) AS monetary,
       CAST(6 - NTILE(5) OVER (ORDER BY mxd - last_day, o_custkey) AS INT) AS r_score,
       CAST(6 - NTILE(5) OVER (ORDER BY freq DESC, o_custkey) AS INT) AS f_score,
       CAST(6 - NTILE(5) OVER (ORDER BY monetary DESC, o_custkey) AS INT) AS m_score
FROM per_cust, mx
"""

QUERIES["rfm_segments"] = q_rfm_segments
ORACLES["rfm_segments"] = ORACLE_RFM


# --- business analytics: cohort LTV curve ------------------------------


def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue per acquisition cohort by age (30-day
    periods since first order) — the LTV curve. Two hash-aggs + one
    cumsum window per cohort; cohort sizes come from the first agg, so
    the per-customer normalization never rescans orders."""
    orders = read_table(spark, sf_dir, "orders")
    day = (F.unix_micros(F.col("o_orderdate")) / F.lit(DAY_US)).cast("long")
    with_day = orders.select("o_custkey", day.alias("day"), "o_totalprice")
    firsts = with_day.groupBy("o_custkey").agg(F.min("day").alias("first_day"))
    cohorted = with_day.join(firsts, "o_custkey").select(
        (F.col("first_day") / 30).cast("long").alias("cohort"),
        ((F.col("day") - F.col("first_day")) / 30).cast("long").alias("age"),
        "o_totalprice",
        "o_custkey",
    )
    sizes = cohorted.groupBy("cohort").agg(
        F.countDistinct("o_custkey").alias("cohort_size")
    )
    per_age = cohorted.groupBy("cohort", "age").agg(
        F.sum(F.col("o_totalprice").cast(DEC)).alias("rev")
    )
    w = Window.partitionBy("cohort").orderBy("age").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        per_age.withColumn("cum_rev", F.sum("rev").over(w).cast("double"))
        .join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "age",
            "cohort_size",
            F.round("cum_rev", 2).alias("cum_revenue"),
            F.round(F.col("cum_rev") / F.col("cohort_size"), 6).alias("ltv_per_user"),
        )
    )


ORACLE_COHORT_LTV = """
WITH wd AS (
  SELECT o_custkey, epoch_us(o_orderdate) // 86400000000 AS day, o_totalprice
  FROM orders
), firsts AS (
  SELECT o_custkey, MIN(day) AS first_day FROM wd GROUP BY o_custkey
), cohorted AS (
  SELECT f.first_day // 30 AS cohort, (w.day - f.first_day) // 30 AS age,
         w.o_totalprice, w.o_custkey
  FROM wd w JOIN firsts f ON w.o_custkey = f.o_custkey
), sizes AS (
  SELECT cohort, COUNT(DISTINCT o_custkey) AS cohort_size FROM cohorted GROUP BY cohort
), per_age AS (
  SELECT cohort, age, SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS rev
  FROM cohorted GROUP BY cohort, age
), cum AS (
  SELECT cohort, age,
         CAST(SUM(rev) OVER (PARTITION BY cohort ORDER BY age
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_rev
  FROM per_age
)
SELECT c.cohort, c.age, s.cohort_size,
       ROUND(c.cum_rev, 2) AS cum_revenue,
       ROUND(c.cum_rev / s.cohort_size, 6) AS ltv_per_user
FROM cum c JOIN sizes s ON c.cohort = s.cohort
"""

QUERIES["cohort_ltv"] = q_cohort_ltv
ORACLES["cohort_ltv"] = ORACLE_COHORT_LTV


# --- business analytics: Lorenz curve ----------------------------------


def q_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve behind `revenue_gini`: customers deciled by
    revenue ascending (total tie-break), per-decile revenue share and
    cumulative share — the concentration readout ("bottom 50% of
    customers hold X% of revenue"). Exact decimal sums; the decile is
    the scale-safe two-phase exact rank (rankdev.global_ntile — no
    single-partition window); the only remaining window runs over the
    10-row decile frame."""
    from kg_etl_spark.operators.rankdev import global_ntile

    orders = read_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(DEC)).alias("rev")
    ).lineage_cut(eager=True)  # device re-reads it 3×
    deciled = global_ntile(
        per_cust, "rev", 10, tiebreaks=["o_custkey"],
        out_col="decile", subkey="o_custkey",
    ).select("decile", "rev")
    per_d = deciled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("rev").alias("rev"),
    )
    tot = per_d.agg(F.sum("rev").alias("t"))
    # cumulative share over the 10-row decile frame: broadcast triangular
    # self-join (≤ k² cells) instead of an unpartitioned window — keeps
    # the whole query free of single-partition WindowExec.
    cum = (
        per_d.select(F.col("decile").alias("_d"), F.col("rev").alias("_r"))
        .join(F.broadcast(per_d.select("decile")), F.col("_d") <= F.col("decile"))
        .groupBy("decile")
        .agg(F.sum("_r").alias("cum_rev"))
    )
    return (
        per_d.join(F.broadcast(cum), "decile")
        .crossJoin(F.broadcast(tot))
        .select(
            "decile",
            F.col("n_customers").cast("long").alias("n_customers"),
            F.round((F.col("rev") / F.col("t")).cast("double"), 6).alias("rev_share"),
            F.round((F.col("cum_rev") / F.col("t")).cast("double"), 6).alias(
                "cum_share"
            ),
        )
    )


ORACLE_LORENZ = """
WITH per_cust AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS rev
  FROM orders GROUP BY o_custkey
), deciled AS (
  SELECT CAST(NTILE(10) OVER (ORDER BY rev, o_custkey) AS INT) AS decile, rev
  FROM per_cust
), per_d AS (
  SELECT decile, COUNT(*) AS n_customers, SUM(rev) AS rev
  FROM deciled GROUP BY decile
), tot AS (SELECT SUM(rev) AS t FROM per_d)
SELECT decile, n_customers,
       ROUND(CAST(rev / t AS DOUBLE), 6) AS rev_share,
       ROUND(CAST(SUM(rev) OVER (ORDER BY decile
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / t AS DOUBLE), 6)
         AS cum_share
FROM per_d, tot
"""

QUERIES["lorenz_curve"] = q_lorenz_curve
ORACLES["lorenz_curve"] = ORACLE_LORENZ


# --- Fellegi–Sunter record linkage with EM-estimated weights -----------


_FS_ITERS = 8
_FS_FIELDS = ["seg", "dig", "bal"]
# Deterministic per-block member cap (reference precedent: per-bin
# comparison caps in diagnostics/spotcheck.py:146). Block membership
# grows linearly with the corpus, so UNCAPPED upper-triangle pairs grow
# quadratically — at 100× data each block would do 10,000× the work.
# Keeping the first CAP members by custkey bounds every block at
# CAP·(CAP−1)/2 pairs; EM over the ≤8 pattern COUNTS is insensitive to
# a deterministic subsample, and the cap is pinned into the oracle's
# pair CTE so both engines see the identical pair set.
_FS_BLOCK_CAP = 200


def fellegi_sunter_em(cust_raw: DataFrame) -> DataFrame:
    """Fellegi–Sunter probabilistic record linkage (JASA 1969) with
    UNSUPERVISED weight estimation: blocked candidate pairs are
    reduced to binary agreement patterns (same mktsegment / same
    custkey-mod-10 digit / account balance within 100), and the
    (λ, m_f, u_f) parameters come from 8 fixed EM iterations over the
    ≤2³ pattern-count table (Winkler's classic formulation).

    Scale shape: the ONLY distributed work is the blocked self-join
    ((nationkey, ⌊acctbal/1000⌋) equi-block, each block CAPPED at its
    first `_FS_BLOCK_CAP` members by custkey — one row_number window
    per block, so pairs per block are bounded at CAP²/2 no matter how
    the corpus grows; total drops are counted in one tiny aggregate
    and reported loudly) and the 8-row pattern-count aggregate; EM
    runs on the driver over MODEL STATE (≤8 pattern counts), the
    documented scalar-scale exception. Every floating-point step is
    pinned to a left-fold order over patterns sorted by (g1,g2,g3),
    so the unrolled SQL oracle (DuckDB list_reduce folds, QUALIFY'd
    to the same cap) reproduces the IEEE arithmetic bit-for-bit;
    outputs round at 6 dp.

    Takes the raw customer frame (c_custkey, c_nationkey,
    c_mktsegment, c_acctbal) so the hot-block stress probe can drive
    it directly."""
    cust = cust_raw.select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        "c_acctbal",
        (F.col("c_custkey") % 10).alias("_dig"),
        F.floor(F.col("c_acctbal") / 1000.0).alias("_blk"),
    )
    # the dropped-count probe rides the pattern-count job below as one
    # extra union branch (r12; guide §5 — each standalone collect is a
    # full serial scheduling round): see the `probe` union after `pat`.
    dropped_agg = (
        cust.groupBy("c_nationkey", "_blk")
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(F.sum(F.greatest(F.col("_n") - _FS_BLOCK_CAP, F.lit(0))).alias("_d"))
    )
    wb = Window.partitionBy("c_nationkey", "_blk").orderBy("c_custkey")
    cust = (
        cust.withColumn("_rnb", F.row_number().over(wb))
        .filter(F.col("_rnb") <= _FS_BLOCK_CAP)
        .drop("_rnb")
    )
    def bare(c: str) -> str:
        return c[2:] if c.startswith(("c_", "__")) else c.lstrip("_")

    a = cust.select(*[F.col(c).alias("a_" + bare(c)) for c in cust.columns])
    b = cust.select(*[F.col(c).alias("b_" + bare(c)) for c in cust.columns])
    pairs = a.join(
        b,
        (F.col("a_nationkey") == F.col("b_nationkey"))
        & (F.col("a_blk") == F.col("b_blk"))
        & (F.col("a_custkey") < F.col("b_custkey")),
    )
    pat = (
        pairs.select(
            (F.col("a_mktsegment") == F.col("b_mktsegment")).alias("g1"),
            (F.col("a_dig") == F.col("b_dig")).alias("g2"),
            (F.abs(F.col("a_acctbal") - F.col("b_acctbal")) < 100.0).alias("g3"),
        )
        .groupBy("g1", "g2", "g3")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # ONE job for both model-sized frames: the ≤8 pattern counts plus a
    # marker row carrying the dropped count (was a standalone collect —
    # one full serial round — before the pattern job; r12)
    probe = pat.select(F.lit(False).alias("_m"), "g1", "g2", "g3", "n").unionByName(
        dropped_agg.select(
            F.lit(True).alias("_m"),
            F.lit(None).cast("boolean").alias("g1"),
            F.lit(None).cast("boolean").alias("g2"),
            F.lit(None).cast("boolean").alias("g3"),
            F.coalesce(F.col("_d"), F.lit(0)).alias("n"),
        )
    ).collect()
    dropped = next(int(r["n"]) for r in probe if r["_m"])
    if dropped:
        warnings.warn(
            f"fellegi_sunter_em: {dropped} customers beyond the per-block "
            f"cap of {_FS_BLOCK_CAP} excluded from pair generation "
            "(deterministic first-by-custkey subsample; EM pattern "
            "frequencies are insensitive to the cap)",
            RuntimeWarning,
            stacklevel=2,
        )
    rows = sorted(
        [((r["g1"], r["g2"], r["g3"]), r["n"]) for r in probe if not r["_m"]],
        key=lambda kv: kv[0],
    )
    gs = [k for k, _ in rows]
    ns = [float(n) for _, n in rows]

    def fold(vals):
        acc = vals[0]
        for v in vals[1:]:
            acc = acc + v
        return acc

    N = fold(ns)
    G = [fold([n * (1.0 if g[f] else 0.0) for g, n in zip(gs, ns)]) for f in range(3)]
    lam, m, u = 0.01, [0.9, 0.9, 0.9], [0.1, 0.1, 0.1]
    for _ in range(_FS_ITERS):
        ws = []
        for g in gs:
            A = (m[0] if g[0] else 1.0 - m[0])
            A = A * (m[1] if g[1] else 1.0 - m[1])
            A = A * (m[2] if g[2] else 1.0 - m[2])
            B = (u[0] if g[0] else 1.0 - u[0])
            B = B * (u[1] if g[1] else 1.0 - u[1])
            B = B * (u[2] if g[2] else 1.0 - u[2])
            ws.append((lam * A) / (lam * A + (1.0 - lam) * B))
        S = fold([n * w for n, w in zip(ns, ws)])
        Sg = [
            fold([n * w * (1.0 if g[f] else 0.0) for g, n, w in zip(gs, ns, ws)])
            for f in range(3)
        ]
        lam = S / N
        m = [Sg[f] / S for f in range(3)]
        u = [(G[f] - Sg[f]) / (N - S) for f in range(3)]
    out = [("lambda", round(lam, 6))]
    for f, name in enumerate(_FS_FIELDS):
        out.append((f"m_{name}", round(m[f], 6)))
        out.append((f"u_{name}", round(u[f], 6)))
    return cust_raw.sparkSession.createDataFrame(out, "param string, value double")


def q_fellegi_sunter_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog entry: :func:`fellegi_sunter_em` over the customer
    table (see that docstring for semantics and the block cap)."""
    return fellegi_sunter_em(read_table(spark, sf_dir, "customer"))


def _fs_oracle_sql() -> str:
    ordered = "ORDER BY g1, g2, g3"
    sql = f"""
WITH c AS (
  SELECT c_custkey, c_nationkey, c_mktsegment, c_acctbal,
         c_custkey % 10 AS dig, FLOOR(c_acctbal / 1000.0) AS blk
  FROM customer
), c2 AS (
  SELECT * FROM c
  QUALIFY ROW_NUMBER() OVER (PARTITION BY c_nationkey, blk
                             ORDER BY c_custkey) <= {_FS_BLOCK_CAP}
), pat AS (
  SELECT a.c_mktsegment = b.c_mktsegment AS g1,
         a.dig = b.dig AS g2,
         ABS(a.c_acctbal - b.c_acctbal) < 100.0 AS g3,
         COUNT(*) AS n
  FROM c2 a JOIN c2 b
    ON a.c_nationkey = b.c_nationkey AND a.blk = b.blk
   AND a.c_custkey < b.c_custkey
  GROUP BY 1, 2, 3
), consts AS (
  SELECT list_reduce(list(CAST(n AS DOUBLE) {ordered}), (a, b) -> a + b) AS N,
         list_reduce(list(n * (CASE WHEN g1 THEN 1.0 ELSE 0.0 END) {ordered}), (a, b) -> a + b) AS G1,
         list_reduce(list(n * (CASE WHEN g2 THEN 1.0 ELSE 0.0 END) {ordered}), (a, b) -> a + b) AS G2,
         list_reduce(list(n * (CASE WHEN g3 THEN 1.0 ELSE 0.0 END) {ordered}), (a, b) -> a + b) AS G3
  FROM pat
), em0 AS (
  SELECT 0.01 AS lam, 0.9 AS m1, 0.9 AS m2, 0.9 AS m3,
         0.1 AS u1, 0.1 AS u2, 0.1 AS u3
)"""
    A = (
        "(CASE WHEN g1 THEN e.m1 ELSE 1.0 - e.m1 END)"
        " * (CASE WHEN g2 THEN e.m2 ELSE 1.0 - e.m2 END)"
        " * (CASE WHEN g3 THEN e.m3 ELSE 1.0 - e.m3 END)"
    )
    B = (
        "(CASE WHEN g1 THEN e.u1 ELSE 1.0 - e.u1 END)"
        " * (CASE WHEN g2 THEN e.u2 ELSE 1.0 - e.u2 END)"
        " * (CASE WHEN g3 THEN e.u3 ELSE 1.0 - e.u3 END)"
    )
    for k in range(1, _FS_ITERS + 1):
        w = f"(e.lam * {A}) / (e.lam * {A} + (1.0 - e.lam) * {B})"
        sql += f""", s{k} AS (
  SELECT list_reduce(list(n * {w} {ordered}), (a, b) -> a + b) AS S,
         list_reduce(list(n * {w} * (CASE WHEN g1 THEN 1.0 ELSE 0.0 END) {ordered}), (a, b) -> a + b) AS Sg1,
         list_reduce(list(n * {w} * (CASE WHEN g2 THEN 1.0 ELSE 0.0 END) {ordered}), (a, b) -> a + b) AS Sg2,
         list_reduce(list(n * {w} * (CASE WHEN g3 THEN 1.0 ELSE 0.0 END) {ordered}), (a, b) -> a + b) AS Sg3
  FROM pat, em{k - 1} e GROUP BY ALL
), em{k} AS (
  SELECT s.S / c.N AS lam,
         s.Sg1 / s.S AS m1, s.Sg2 / s.S AS m2, s.Sg3 / s.S AS m3,
         (c.G1 - s.Sg1) / (c.N - s.S) AS u1,
         (c.G2 - s.Sg2) / (c.N - s.S) AS u2,
         (c.G3 - s.Sg3) / (c.N - s.S) AS u3
  FROM s{k} s, consts c
)"""
    last = f"em{_FS_ITERS}"
    sel = [("lambda", "lam")]
    for i, name in enumerate(_FS_FIELDS, start=1):
        sel.append((f"m_{name}", f"m{i}"))
        sel.append((f"u_{name}", f"u{i}"))
    unions = "\nUNION ALL ".join(
        f"SELECT '{p}' AS param, ROUND({c}, 6) AS value FROM {last}" for p, c in sel
    )
    return sql + "\n" + unions


ORACLE_FELLEGI_SUNTER = _fs_oracle_sql()

QUERIES["fellegi_sunter_em"] = q_fellegi_sunter_em
ORACLES["fellegi_sunter_em"] = ORACLE_FELLEGI_SUNTER


# --- sampled betweenness centrality ------------------------------------


def q_betweenness_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-pivot Brandes betweenness over the symmetrized user-transition
    graph (operators/centrality.py). Path-count ratios make the full
    output non-SQL-expressible in general → rows-only; the planted
    star twin below value-checks the identical kernel on a shape where
    σ ≡ 1 keeps every δ integral."""
    from kg_etl_spark.operators.adjacent import undirected_transition_edges_cut
    from kg_etl_spark.operators.centrality import betweenness_sampled

    ev = read_table(spark, sf_dir, "events")
    # the SHARED undirected cut (a < b, distinct, memoized across the
    # ml/graph family): symmetrizing it as und ∪ rev(und) is
    # duplicate-free BY CONSTRUCTION (a < b strictly), so the kernel's
    # per-call distinct exchange + |E| re-checkpoint are skipped via
    # the edges_distinct contract — the same edge SET the directed-cut
    # symmetrization produced, bit-identical results (r11)
    und = undirected_transition_edges_cut(ev)
    sym = und.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    return betweenness_sampled(sym, k_pivots=8, max_depth=6, edges_distinct=True)


_BETW_K = 8


def q_betweenness_star_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted-provable twin for `betweenness_sampled`: a star graph
    (center = MAX custkey, every other customer a leaf). From a leaf
    pivot, depth-1 = {center} and depth-2 = the other leaves with
    σ ≡ 1, so Brandes gives δ(center) = n−2 exactly and 0 for leaves;
    with the k lowest ids as pivots (all leaves), bc(center) must be
    EXACTLY k·(n−2) and every leaf 0 — any drift in the σ aggregate,
    the successor join, or the backward accumulation breaks equality."""
    from kg_etl_spark.operators.centrality import betweenness_sampled

    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("node")
    )
    mx = cust.agg(F.max("node").alias("m"))
    leaves = cust.join(mx, cust["node"] == mx["m"], "left_anti")
    edges = leaves.crossJoin(F.broadcast(mx)).select(
        F.col("node").alias("src"), F.col("m").alias("dst")
    )
    sym = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return betweenness_sampled(sym, k_pivots=_BETW_K, max_depth=4)


ORACLE_BETWEENNESS_STAR = f"""
WITH n AS (SELECT COUNT(*) AS n, MAX(c_custkey) AS center FROM customer)
SELECT CAST(center AS BIGINT) AS node,
       ROUND({_BETW_K} * (n - 2) * 1.0, 6) AS bc
FROM n
UNION ALL
SELECT CAST(c_custkey AS BIGINT) AS node, 0.0 AS bc
FROM customer, n WHERE c_custkey <> center
"""

QUERIES["betweenness_sampled"] = q_betweenness_sampled
QUERIES["betweenness_star_recall"] = q_betweenness_star_recall
ORACLES["betweenness_star_recall"] = ORACLE_BETWEENNESS_STAR


# --- HITS hubs/authorities (integer iterates) --------------------------


def q_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS over the DIRECTED user-transition graph, 2 unnormalized
    rounds (operators/centrality.py `hits_scores`): the iterates are
    exact alternating-path counts, so the full iteration is
    value-checked by an unrolled SQL oracle with integer sums — an
    iterative graph op with a bit-exact oracle, no planted twin
    needed."""
    from kg_etl_spark.operators.adjacent import transition_edges_cut
    from kg_etl_spark.operators.centrality import hits_scores

    ev = read_table(spark, sf_dir, "events")
    edges = transition_edges_cut(ev)
    # the shared transition-edge cut is already a distinct materialized
    # (src, dst) frame — skip the operator's defensive re-distinct +
    # second checkpoint (r11)
    out = hits_scores(edges, iterations=2, edges_distinct=True)
    # the operator accumulates/returns exact decimal(38,0) (overflow-
    # safe default); the catalog contract casts back to long for the
    # DuckDB side-by-side — DuckDB's pandas bridge renders DECIMAL as
    # float64, which the dtype-faithful compare rejects. Catalog-graph
    # counts are << 2^63; the operator's loud probe guards the general
    # case.
    return out.withColumn("hub", F.col("hub").cast("long")).withColumn(
        "auth", F.col("auth").cast("long")
    )


ORACLE_HITS = """
WITH e AS (
  SELECT DISTINCT src, dst FROM (
    SELECT user_id AS src,
           LEAD(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS dst
    FROM events
  ) WHERE dst IS NOT NULL AND src <> dst
), nodes AS (
  SELECT src AS node FROM e UNION SELECT dst FROM e
), a1 AS (
  SELECT n.node, CAST(COALESCE(x.s, 0) AS BIGINT) AS a FROM nodes n
  LEFT JOIN (SELECT dst AS node, COUNT(*) AS s FROM e GROUP BY dst) x USING (node)
), h1 AS (
  SELECT n.node, CAST(COALESCE(x.s, 0) AS BIGINT) AS h FROM nodes n
  LEFT JOIN (SELECT e.src AS node, SUM(a1.a) AS s FROM e JOIN a1 ON a1.node = e.dst
             GROUP BY e.src) x USING (node)
), a2 AS (
  SELECT n.node, CAST(COALESCE(x.s, 0) AS BIGINT) AS a FROM nodes n
  LEFT JOIN (SELECT e.dst AS node, SUM(h1.h) AS s FROM e JOIN h1 ON h1.node = e.src
             GROUP BY e.dst) x USING (node)
), h2 AS (
  SELECT n.node, CAST(COALESCE(x.s, 0) AS BIGINT) AS h FROM nodes n
  LEFT JOIN (SELECT e.src AS node, SUM(a2.a) AS s FROM e JOIN a2 ON a2.node = e.dst
             GROUP BY e.src) x USING (node)
), tot AS (
  SELECT CAST(SUM(h2.h) AS BIGINT) AS th, CAST(SUM(a2.a) AS BIGINT) AS ta
  FROM h2 JOIN a2 USING (node)
)
SELECT h2.node, h2.h AS hub, a2.a AS auth,
       ROUND(CAST(h2.h AS DOUBLE) / CAST(tot.th AS DOUBLE), 6) AS hub_share,
       ROUND(CAST(a2.a AS DOUBLE) / CAST(tot.ta AS DOUBLE), 6) AS auth_share
FROM h2 JOIN a2 USING (node), tot
"""

QUERIES["hits_scores"] = q_hits_scores
ORACLES["hits_scores"] = ORACLE_HITS


# --- Spearman rank correlation (exact tie-averaged ranks) ---------------


def q_spearman_balance_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rho between account balance and total customer spend
    — Pearson over tie-averaged ranks, with ranks built EXACTLY: per
    distinct value v the average rank is (cum_before + (cnt+1)/2), so
    the integer 2·r̄(v) = 2·cum(v) − cnt(v) + 1 rides the two-phase
    exact cumsum device (rankdev.global_cumsum — no single-partition
    window) and every distributed sum is an exact decimal of
    integers. The factor 2 cancels in the correlation, so rho is
    computed from the doubled ranks verbatim; only the final
    √/÷ touch doubles (correctly rounded), 6 dp out.

    100 TB shape: two distinct-value hash aggregates (domain-bounded
    cents), two cumsum devices on those value tables, two value-keyed
    rank attaches back to the row stream, ONE 1-row aggregate of 6
    decimal sums. Nothing quadratic, no corpus-scale window."""
    from kg_etl_spark.operators.rankdev import global_cumsum

    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    spend = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100.0, 0).cast("long")).alias("y")
    )
    # rows is the multi-consumer cut (both rank builds + the final
    # attach read it): materialize once so the orders aggregate +
    # customer join never re-execute per consumer
    rows = (
        cust.join(spend, "c_custkey", "left")
        .select(
            F.round(F.col("c_acctbal") * 100.0, 0).cast("long").alias("x"),
            F.coalesce(F.col("y"), F.lit(0)).alias("y"),
        )
        .lineage_cut(eager=True)
    )

    def doubled_ranks(col: str) -> DataFrame:
        # no cut on `per`: its upstream is already the `rows` cut, so
        # the device's stats re-reads are cheap re-aggregates of
        # materialized blocks — an extra eager cut here measured
        # slower (two standalone jobs) than the re-aggregation
        per = rows.groupBy(col).agg(F.count(F.lit(1)).alias("_n"))
        cum = global_cumsum(per, col, ["_n"])
        return cum.select(
            col,
            (F.lit(2) * F.col("cum__n") - F.col("_n") + 1).alias(f"r2_{col}"),
        )

    # the two rank builds are independent pipelines over the same cut:
    # construct them from a thread pool so their device probe collects
    # (bounds + partials per device) overlap instead of serializing
    # (guide §2.6 back-fill — the cumsum devices collect four small
    # jobs between them during CONSTRUCTION)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        rx_df, ry_df = pool.map(doubled_ranks, ("x", "y"))
    ranked = rows.join(rx_df, "x").join(ry_df, "y")
    DEC = "decimal(38,0)"
    rx, ry = F.col("r2_x").cast(DEC), F.col("r2_y").cast(DEC)
    agg = ranked.agg(
        F.count(F.lit(1)).cast(DEC).alias("n"),
        F.sum(rx).alias("sx"),
        F.sum(ry).alias("sy"),
        F.sum(rx * ry).alias("sxy"),
        F.sum(rx * rx).alias("sxx"),
        F.sum(ry * ry).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
    dy = F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    rho = F.when((dx > 0) & (dy > 0), F.round(num / dx / dy, 6)).otherwise(F.lit(0.0))
    return agg.select(F.col("n").cast("long").alias("n_cust"), rho.alias("spearman_rho"))


ORACLE_SPEARMAN = """
WITH spend AS (
  SELECT o_custkey AS c_custkey,
         SUM(CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT)) AS y
  FROM orders GROUP BY 1
), rows_ AS (
  SELECT CAST(ROUND(c.c_acctbal * 100.0, 0) AS BIGINT) AS x,
         COALESCE(s.y, 0) AS y
  FROM customer c LEFT JOIN spend s USING (c_custkey)
), rkx AS (
  SELECT x, 2 * SUM(n) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) - n + 1 AS r2_x
  FROM (SELECT x, COUNT(*) AS n FROM rows_ GROUP BY x)
), rky AS (
  SELECT y, 2 * SUM(n) OVER (ORDER BY y ROWS UNBOUNDED PRECEDING) - n + 1 AS r2_y
  FROM (SELECT y, COUNT(*) AS n FROM rows_ GROUP BY y)
), ranked AS (
  SELECT CAST(rkx.r2_x AS DECIMAL(38,0)) AS rx, CAST(rky.r2_y AS DECIMAL(38,0)) AS ry
  FROM rows_ r JOIN rkx ON rkx.x = r.x JOIN rky ON rky.y = r.y
), agg AS (
  SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
         SUM(rx) AS sx, SUM(ry) AS sy, SUM(rx * ry) AS sxy,
         SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy
  FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_cust,
       CASE WHEN SQRT(CAST(n * sxx - sx * sx AS DOUBLE)) > 0
             AND SQRT(CAST(n * syy - sy * sy AS DOUBLE)) > 0
            THEN ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                       / SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                       / SQRT(CAST(n * syy - sy * sy AS DOUBLE)), 6)
            ELSE 0.0 END AS spearman_rho
FROM agg
"""

QUERIES["spearman_balance_spend"] = q_spearman_balance_spend
ORACLES["spearman_balance_spend"] = ORACLE_SPEARMAN


# --- Kruskal-Wallis H across market segments ----------------------------


def q_kruskal_wallis_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis rank ANOVA (JASA 1952): does customer spend
    differ across market segments? Tie-averaged ranks via the same
    doubled-rank identity as spearman_balance_spend (2·r̄ = 2·cum −
    cnt + 1 on the exact cumsum device); per-group rank sums R2_g and
    the tie term Σ(t³−t) are exact decimals. With R_g = R2_g/2,
        H = 12/(N(N+1)) · Σ R_g²/n_g − 3(N+1)
          = 3/(N(N+1)) · Σ R2_g²/n_g − 3(N+1),
    tie-corrected H' = H / (1 − Σ(t³−t)/(N³−N)). The ≤|segments|
    per-group terms fold in segment order via an explicit sorted
    array fold — the catalog's pinned-fold discipline — so the only
    unpinned work is correctly-rounded ÷/√-free scalar IEEE.

    100 TB shape: one distinct-value aggregate + cumsum device, one
    value-keyed rank attach, one segment-keyed aggregate (≤5 rows),
    one 1-row fold. No corpus-scale window, nothing quadratic."""
    from kg_etl_spark.operators.rankdev import global_cumsum

    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    spend = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100.0, 0).cast("long")).alias("y")
    )
    # rows feeds both the distinct-value build and the rank attach;
    # per_v feeds the cumsum device and the tie term — cut both once
    rows = (
        cust.join(spend, "c_custkey", "left")
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.coalesce(F.col("y"), F.lit(0)).alias("y"),
        )
        .lineage_cut(eager=True)
    )
    per_v = rows.groupBy("y").agg(F.count(F.lit(1)).alias("_n")).lineage_cut(
        eager=True
    )
    cum = global_cumsum(per_v, "y", ["_n"])
    ranks = cum.select(
        "y", (F.lit(2) * F.col("cum__n") - F.col("_n") + 1).alias("r2")
    )
    DEC = "decimal(38,0)"
    groups = (
        rows.join(ranks, "y")
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).alias("ng"),
            F.sum(F.col("r2").cast(DEC)).alias("rs2"),
        )
    )
    # per-group R2_g²/n_g, folded in segment order (pinned). rs2 casts
    # to double BEFORE squaring: decimal(38,0)² overflows 38 digits
    # once R2_g passes ~1e19, while the double square is correctly
    # rounded and engine-identical.
    rsd = F.col("rs2").cast("double")
    term = rsd * rsd / F.col("ng").cast("double")
    folded = groups.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("seg"), term.alias("t")))),
            F.lit(0.0),
            lambda acc, s: acc + s["t"],
        ).alias("s"),
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("ng").cast(DEC)).alias("n"),
    )
    ties = per_v.agg(
        F.sum(
            (F.col("_n").cast(DEC) * F.col("_n") * F.col("_n") - F.col("_n")).cast(DEC)
        ).alias("tt")
    )
    j = folded.crossJoin(F.broadcast(ties))
    nN = F.col("n").cast("double")
    h = F.lit(3.0) / (nN * (nN + 1.0)) * F.col("s") - 3.0 * (nN + 1.0)
    corr = 1.0 - F.col("tt").cast("double") / (nN * nN * nN - nN)
    return j.select(
        F.col("n").cast("long").alias("n_cust"),
        (F.col("k") - 1).cast("long").alias("dof"),
        F.round(h, 6).alias("h"),
        F.when(corr > 0, F.round(h / corr, 6)).otherwise(F.lit(None)).alias("h_tie_corrected"),
    )


ORACLE_KRUSKAL = """
WITH spend AS (
  SELECT o_custkey AS c_custkey,
         SUM(CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT)) AS y
  FROM orders GROUP BY 1
), rows_ AS (
  SELECT c.c_mktsegment AS seg, COALESCE(s.y, 0) AS y
  FROM customer c LEFT JOIN spend s USING (c_custkey)
), per_v AS (SELECT y, COUNT(*) AS n FROM rows_ GROUP BY y),
ranks AS (
  SELECT y, 2 * SUM(n) OVER (ORDER BY y ROWS UNBOUNDED PRECEDING) - n + 1 AS r2
  FROM per_v
), groups AS (
  SELECT seg, COUNT(*) AS ng, SUM(CAST(r.r2 AS DECIMAL(38,0))) AS rs2
  FROM rows_ JOIN ranks r ON r.y = rows_.y
  GROUP BY seg
), folded AS (
  SELECT list_reduce(
           list_prepend(0.0, list(CAST(rs2 AS DOUBLE) * CAST(rs2 AS DOUBLE)
                                  / CAST(ng AS DOUBLE) ORDER BY seg)),
           (acc, t) -> acc + t) AS s,
         COUNT(*) AS k,
         SUM(CAST(ng AS DECIMAL(38,0))) AS n
  FROM groups
), ties AS (
  SELECT SUM(CAST(CAST(n AS DECIMAL(38,0)) * n * n - n AS DECIMAL(38,0))) AS tt
  FROM per_v
)
SELECT CAST(n AS BIGINT) AS n_cust,
       CAST(k - 1 AS BIGINT) AS dof,
       ROUND(3.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) * s
             - 3.0 * (CAST(n AS DOUBLE) + 1.0), 6) AS h,
       CASE WHEN 1.0 - CAST(tt AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                    - CAST(n AS DOUBLE)) > 0
            THEN ROUND((3.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) * s
                        - 3.0 * (CAST(n AS DOUBLE) + 1.0))
                       / (1.0 - CAST(tt AS DOUBLE)
                          / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                             - CAST(n AS DOUBLE))), 6)
            END AS h_tie_corrected
FROM folded CROSS JOIN ties
"""

QUERIES["kruskal_wallis_spend"] = q_kruskal_wallis_spend
ORACLES["kruskal_wallis_spend"] = ORACLE_KRUSKAL


# --- Exact corpus-scale quantiles on the cumsum device -------------------


_GQ_PS = (50, 90, 99)  # percents


def q_exact_global_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT type-1 (lower order-statistic) global quantiles of the
    extended price over ALL of lineitem — the one-giant-group case
    where `percentile()` materializes the whole column per group and
    dies at corpus scale. Here: distinct cents values (domain-
    bounded) → the two-phase exact cumsum device → the p-quantile is
    the unique value whose cumulative range covers ⌈p·N⌉. No
    interpolation, no sort of corpus-sized data, no per-group array.

    Determinism: all-integer; ⌈p·N⌉ computed as (p·N + 99) div 100 in
    exact integer arithmetic on both engines.

    100 TB shape: one hash aggregate to the bounded value domain, one
    cumsum device (range-bucketed local windows + broadcast offsets),
    one 1-row N scalar cross, one model-state filter — the
    percentile() contrast case the catalog's SCALE.md argues."""
    from kg_etl_spark.operators.rankdev import global_cumsum

    li = read_table(spark, sf_dir, "lineitem")
    per = (
        li.select(F.round(F.col("l_extendedprice") * 100.0, 0).cast("long").alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("c"))
        .lineage_cut(eager=True)  # the cumsum device re-reads it
    )
    cum = global_cumsum(per, "v", ["c"])
    n = cum.agg(F.sum("c").alias("n"))
    j = cum.crossJoin(F.broadcast(n))
    ps = F.explode(F.array(*[F.lit(p) for p in _GQ_PS])).alias("p")
    hit = (
        j.select("v", "c", "cum_c", "n", ps)
        .withColumn("k", F.expr("(p * n + 99) div 100"))
        .filter((F.col("cum_c") >= F.col("k")) & (F.col("cum_c") - F.col("c") < F.col("k")))
    )
    return hit.select(
        F.col("p").cast("int").alias("percent"),
        (F.col("v").cast("double") / 100.0).alias("price"),
        F.col("k").alias("order_stat"),
    )


ORACLE_EXACT_QUANTILES = f"""
WITH per AS (
  SELECT CAST(ROUND(l_extendedprice * 100.0, 0) AS BIGINT) AS v, COUNT(*) AS c
  FROM lineitem GROUP BY 1
), cum AS (
  SELECT v, c, SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_c
  FROM per
), n AS (SELECT SUM(c) AS n FROM per),
px AS (SELECT unnest([{', '.join(str(p) for p in _GQ_PS)}]) AS p)
SELECT CAST(px.p AS INT) AS percent,
       CAST(cum.v AS DOUBLE) / 100.0 AS price,
       CAST((px.p * n.n + 99) // 100 AS BIGINT) AS order_stat
FROM cum CROSS JOIN n CROSS JOIN px
WHERE cum.cum_c >= (px.p * n.n + 99) // 100
  AND cum.cum_c - cum.c < (px.p * n.n + 99) // 100
"""

QUERIES["exact_global_quantiles"] = q_exact_global_quantiles
ORACLES["exact_global_quantiles"] = ORACLE_EXACT_QUANTILES


# --- Skip-gram (center, context) pairs + PMI from the walk corpus ------


_SKIPGRAM_WINDOW = 2
_SKIPGRAM_TOP = 200


def q_walk_skipgram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The word2vec data-prep stage DeepWalk feeds: (center, context)
    co-occurrence pairs within a ±2 window over every deterministic
    walk, with shifted-PMI scoring ln(c_pair·T / (c_center·c_ctx)) —
    what a downstream SGNS/GloVe trainer consumes. Top-200 pairs by
    (count, pair) keeps the readout bounded; counts are exact and the
    single ln rides the catalog's 6 dp libm rounding.

    100 TB shape: the walk frame self-joins keyed on the WALK ID
    (origin) with fan-out bounded by walk_length × window — never
    corpus-quadratic; margins are one tiny aggregate each; the final
    top-N is a TakeOrdered."""
    from kg_etl_spark.operators.adjacent import transition_edges_cut
    from kg_etl_spark.operators.walks import deterministic_walks

    ev = read_table(spark, sf_dir, "events")
    edges = transition_edges_cut(ev)
    walks = deterministic_walks(edges, length=3).lineage_cut(eager=True)
    a = walks.select("origin", F.col("step").alias("i"), F.col("node").alias("center"))
    b = walks.select("origin", F.col("step").alias("j"), F.col("node").alias("context"))
    # cut once (lazy — it materializes inside the first consumer's job):
    # the two margins, the total and the scored join would otherwise
    # each re-run the walk self-join + pair aggregate (the per-consumer
    # column pruning makes the four subtrees non-identical, so
    # ReuseExchange never fires — 4 SortMergeJoin+agg passes in one plan)
    pairs = (
        a.join(b, "origin")
        .filter(
            (F.col("i") != F.col("j"))
            & (F.abs(F.col("i") - F.col("j")) <= _SKIPGRAM_WINDOW)
        )
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("c"))
        .lineage_cut(eager=False)
    )
    ctr = pairs.groupBy("center").agg(F.sum("c").alias("cc"))
    ctx = pairs.groupBy("context").agg(F.sum("c").alias("cx"))
    tot = pairs.agg(F.sum("c").alias("t"))
    DEC = "decimal(38,0)"
    # margins are |V|-sized — NEVER broadcast them at corpus scale;
    # only the 1-row total crosses
    scored = (
        pairs.join(ctr, "center")
        .join(ctx, "context")
        .crossJoin(F.broadcast(tot))
        .select(
            "center",
            "context",
            "c",
            F.round(
                F.log(
                    (F.col("c").cast(DEC) * F.col("t").cast(DEC)).cast("double")
                    / (F.col("cc").cast(DEC) * F.col("cx").cast(DEC)).cast("double")
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.col("c").desc(), F.col("center").asc(), F.col("context").asc()
    ).limit(_SKIPGRAM_TOP)


ORACLE_WALK_SKIPGRAM = _WALK_CTES + f"""
, pairs AS (
  SELECT a.node AS center, b.node AS context, COUNT(*) AS c
  FROM walk a JOIN walk b
    ON a.origin = b.origin AND a.step <> b.step
   AND ABS(a.step - b.step) <= {_SKIPGRAM_WINDOW}
  GROUP BY 1, 2
), ctr AS (SELECT center, SUM(c) AS cc FROM pairs GROUP BY center),
ctx AS (SELECT context, SUM(c) AS cx FROM pairs GROUP BY context),
tot AS (SELECT SUM(c) AS t FROM pairs)
SELECT p.center, p.context, p.c,
       ROUND(ln(CAST(CAST(p.c AS DECIMAL(38,0)) * CAST(tot.t AS DECIMAL(38,0)) AS DOUBLE)
                / CAST(CAST(ctr.cc AS DECIMAL(38,0)) * CAST(ctx.cx AS DECIMAL(38,0)) AS DOUBLE)), 6) AS pmi
FROM pairs p
JOIN ctr ON ctr.center = p.center
JOIN ctx ON ctx.context = p.context
CROSS JOIN tot
ORDER BY p.c DESC, p.center ASC, p.context ASC
LIMIT {_SKIPGRAM_TOP}
"""

QUERIES["walk_skipgram_pmi"] = q_walk_skipgram_pmi
ORACLES["walk_skipgram_pmi"] = ORACLE_WALK_SKIPGRAM


# --- Leave-one-group-out influence (data-valuation readout) --------------


def q_loo_group_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-group-out influence of each nation on the global
    average order value — the group-level data-valuation primitive
    (the exact, closed-form cousin of Shapley-style contribution
    scoring): influence(g) = mean_without(g) − mean_all, computed
    EXACTLY from one pass of per-group decimal sums:
    mean_without(g) = (S − S_g)/(N − n_g). A positive influence means
    dropping the group would RAISE the global mean (the group drags
    it down).

    100 TB shape: ONE nation-keyed aggregate of exact cent decimals +
    a 1-row global cross onto |nations| rows; the subtraction trick
    means no second corpus pass per group — the whole sweep is
    closed-form."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    DEC = "decimal(38,0)"
    per = (
        orders.join(cust.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey"),
                    "o_custkey")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast(DEC).alias("ng"),
            F.sum(F.round(F.col("o_totalprice") * 100.0, 0).cast("long"))
            .cast(DEC)
            .alias("sg"),
        )
    )
    tot = per.agg(F.sum("ng").alias("n"), F.sum("sg").alias("s"))
    j = per.crossJoin(F.broadcast(tot))
    mean_all = F.col("s").cast("double") / (F.lit(100.0) * F.col("n").cast("double"))
    mean_wo = F.when(
        F.col("n") > F.col("ng"),
        (F.col("s") - F.col("sg")).cast("double")
        / (F.lit(100.0) * (F.col("n") - F.col("ng")).cast("double")),
    )
    return j.select(
        "c_nationkey",
        F.col("ng").cast("long").alias("n_orders"),
        F.round(mean_wo - mean_all, 6).alias("influence_dollars"),
    )


ORACLE_LOO_INFLUENCE = """
WITH per AS (
  SELECT c.c_nationkey,
         CAST(COUNT(*) AS DECIMAL(38,0)) AS ng,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 100.0, 0) AS BIGINT))
              AS DECIMAL(38,0)) AS sg
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1
), tot AS (SELECT SUM(ng) AS n, SUM(sg) AS s FROM per)
SELECT c_nationkey, CAST(ng AS BIGINT) AS n_orders,
       ROUND(CASE WHEN n > ng
                  THEN CAST(s - sg AS DOUBLE) / (100.0 * CAST(n - ng AS DOUBLE))
             END
             - CAST(s AS DOUBLE) / (100.0 * CAST(n AS DOUBLE)), 6) AS influence_dollars
FROM per CROSS JOIN tot
"""

QUERIES["loo_group_influence"] = q_loo_group_influence
ORACLES["loo_group_influence"] = ORACLE_LOO_INFLUENCE


# --- Rolling-origin forecast backtest (naive vs seasonal-naive) ----------


def q_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin backtest of the two classical baselines every
    forecasting system must beat: naive (ŷ_d = y_{d−1}) and
    seasonal-naive (ŷ_d = y_{d−7}) over the daily event counts, MAE
    per event type across every day with both predecessors. The
    winner column is the standard "which baseline is the bar"
    readout. Predecessors are CALENDAR-keyed (d−1 / d−7 self-joins on
    the day index), so a gap in the series excludes the day rather
    than silently comparing against an older row. All-integer
    errors; two divisions at output.

    100 TB shape: daily series is calendar-bounded model state; two
    self-joins and one ≤|types|-row aggregate on it — corpus-scale
    work is the one daily hash aggregate."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        (F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long").alias("day"),
    ).agg(F.count(F.lit(1)).alias("c"))
    # CALENDAR-keyed predecessors (self-joins on day-1 / day-7), not
    # row lags: with a gap in the daily series LAG(c, 7) would reach
    # 8+ calendar days back and silently stop measuring the weekly
    # baseline. Days with either predecessor missing are excluded.
    p1 = daily.select("event_type", (F.col("day") + 1).alias("day"), F.col("c").alias("p1"))
    p7 = daily.select("event_type", (F.col("day") + 7).alias("day"), F.col("c").alias("p7"))
    lagged = daily.join(p1, ["event_type", "day"]).join(p7, ["event_type", "day"])
    DEC = "decimal(38,0)"
    agg = lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.abs(F.col("c") - F.col("p1")).cast(DEC)).alias("e1"),
        F.sum(F.abs(F.col("c") - F.col("p7")).cast(DEC)).alias("e7"),
    )
    mae1 = F.col("e1").cast("double") / F.col("n_days").cast("double")
    mae7 = F.col("e7").cast("double") / F.col("n_days").cast("double")
    return agg.select(
        "event_type",
        "n_days",
        F.round(mae1, 6).alias("mae_naive"),
        F.round(mae7, 6).alias("mae_snaive"),
        F.when(F.col("e7") < F.col("e1"), F.lit("seasonal_naive"))
        .otherwise(F.lit("naive"))
        .alias("winner"),
    )


ORACLE_FORECAST_BACKTEST = """
WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS c
  FROM events GROUP BY 1, 2
), lagged AS (
  SELECT d.event_type, d.c, p1.c AS p1, p7.c AS p7
  FROM daily d
  JOIN daily p1 ON p1.event_type = d.event_type AND p1.day = d.day - 1
  JOIN daily p7 ON p7.event_type = d.event_type AND p7.day = d.day - 7
), agg AS (
  SELECT event_type, COUNT(*) AS n_days,
         SUM(CAST(ABS(c - p1) AS DECIMAL(38,0))) AS e1,
         SUM(CAST(ABS(c - p7) AS DECIMAL(38,0))) AS e7
  FROM lagged
  GROUP BY event_type
)
SELECT event_type, n_days,
       ROUND(CAST(e1 AS DOUBLE) / n_days, 6) AS mae_naive,
       ROUND(CAST(e7 AS DOUBLE) / n_days, 6) AS mae_snaive,
       CASE WHEN e7 < e1 THEN 'seasonal_naive' ELSE 'naive' END AS winner
FROM agg
"""

QUERIES["forecast_backtest"] = q_forecast_backtest
ORACLES["forecast_backtest"] = ORACLE_FORECAST_BACKTEST


# --- One-pass deterministic bootstrap CI for the mean --------------------


_BOOT_R = 64
_BOOT_A = 1_315_423_911
_BOOT_B = 2_654_435_761
_BOOT_P = 2_147_483_647


def q_bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap confidence interval for the mean order value via
    64 deterministic HALF-SAMPLE replicates (m-out-of-n bootstrap with
    m ≈ n/2; Bickel–Götze–van Zwet lineage) computed in ONE corpus
    pass: replicate j includes an order iff a pair-keyed hash bit
    fires, so all 64 replicate (sum, count) pairs are columns of a
    single hash aggregate — no resampled copies of the data, no
    rand(), no second scan. The CI is the 2nd / 63rd order statistic
    of the 64 replicate means (ceil(0.025·64) / ceil(0.975·64)).

    Determinism: membership is ((A·(key&2³¹−1) + B·j) % P) & 1;
    replicate sums are exact cent decimals; the 64 means sort in a
    64-element array (model state) — engine-identical.

    100 TB shape: ONE aggregate with 129 columns (map-side combine);
    the 64-value sort is driver-free model state. The textbook
    at-scale bootstrap."""
    orders = read_table(spark, sf_dir, "orders")
    # the 129 replicate aggregates are built as SQL expression STRINGS
    # (one JVM parse each) rather than py4j Column algebra: the former
    # Column form cost ~15 driver round-trips per node over 64
    # replicates — ~3.4s of pure query-CONSTRUCTION time per bench
    # attempt, 20x the job's own execution (guide §5: the driver should
    # do almost no work). The parsed expressions are identical.
    base = orders.select(
        F.expr("o_orderkey & 2147483647").alias("_k"),
        F.expr("CAST(ROUND(o_totalprice * 100.0, 0) AS LONG)").alias("_cents"),
    )
    aggs = [
        F.expr("COUNT(1)").alias("n"),
        F.expr("SUM(CAST(_cents AS DECIMAL(38,0)))").alias("s"),
    ]
    for j in range(1, _BOOT_R + 1):
        inb = f"(({_BOOT_A} * _k + {_BOOT_B * j}) % {_BOOT_P}) % 2 = 0"
        aggs.append(
            F.expr(
                f"SUM(CAST(CASE WHEN {inb} THEN _cents ELSE 0 END"
                " AS DECIMAL(38,0)))"
            ).alias(f"s{j}")
        )
        aggs.append(
            F.expr(
                f"CAST(SUM(CAST(({inb}) AS LONG)) AS DECIMAL(38,0))"
            ).alias(f"n{j}")
        )
    a = base.agg(*aggs)
    means = F.expr(
        "array_sort(array("
        + ", ".join(
            f"CAST(s{j} AS DOUBLE) / (100.0D * CAST(n{j} AS DOUBLE))"
            for j in range(1, _BOOT_R + 1)
        )
        + "))"
    )
    lo_i = max(1, int(0.025 * _BOOT_R + 0.999999))  # ceil
    hi_i = int(0.975 * _BOOT_R + 0.999999)
    return a.select(
        F.col("n").alias("n_orders"),
        F.round(
            F.col("s").cast("double") / (F.lit(100.0) * F.col("n").cast("double")), 6
        ).alias("mean_dollars"),
        F.round(F.element_at(means, lo_i), 6).alias("ci_lo"),
        F.round(F.element_at(means, hi_i), 6).alias("ci_hi"),
        F.lit(_BOOT_R).cast("long").alias("n_replicates"),
    )


def _boot_sql() -> str:
    reps_s = ",\n         ".join(
        f"SUM(CAST(CASE WHEN (({_BOOT_A} * (o_orderkey & 2147483647) "
        f"+ {_BOOT_B * j}) % {_BOOT_P}) % 2 = 0 THEN cents ELSE 0 END "
        f"AS DECIMAL(38,0))) AS s{j},\n         "
        f"CAST(SUM(CASE WHEN (({_BOOT_A} * (o_orderkey & 2147483647) "
        f"+ {_BOOT_B * j}) % {_BOOT_P}) % 2 = 0 THEN 1 ELSE 0 END) "
        f"AS DECIMAL(38,0)) AS n{j}"
        for j in range(1, _BOOT_R + 1)
    )
    means = ", ".join(
        f"CAST(s{j} AS DOUBLE) / (100.0 * CAST(n{j} AS DOUBLE))"
        for j in range(1, _BOOT_R + 1)
    )
    lo_i = max(1, int(0.025 * _BOOT_R + 0.999999))
    hi_i = int(0.975 * _BOOT_R + 0.999999)
    return f"""
WITH base AS (
  SELECT o_orderkey, CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT) AS cents
  FROM orders
), agg AS (
  SELECT COUNT(*) AS n, SUM(CAST(cents AS DECIMAL(38,0))) AS s,
         {reps_s}
  FROM base
), arr AS (
  SELECT n, s, list_sort([{means}]) AS means FROM agg
)
SELECT CAST(n AS BIGINT) AS n_orders,
       ROUND(CAST(s AS DOUBLE) / (100.0 * CAST(n AS DOUBLE)), 6) AS mean_dollars,
       ROUND(means[{lo_i}], 6) AS ci_lo,
       ROUND(means[{hi_i}], 6) AS ci_hi,
       CAST({_BOOT_R} AS BIGINT) AS n_replicates
FROM arr
"""


ORACLE_BOOTSTRAP_CI = _boot_sql()

QUERIES["bootstrap_ci_mean"] = q_bootstrap_ci_mean
ORACLES["bootstrap_ci_mean"] = ORACLE_BOOTSTRAP_CI


# --- Cochran-Mantel-Haenszel pooled odds ratio ---------------------------


def q_cmh_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran–Mantel–Haenszel common odds ratio (JNCI 1959) for
    "BUILDING-segment customers place 1-URGENT orders" POOLED ACROSS
    NATION STRATA — the stratified-confounding companion to
    propensity_matching:
        OR_MH = Σ_i (a_i·d_i / n_i) / Σ_i (b_i·c_i / n_i)
    over per-nation 2×2 tables (a=building∧urgent, b=building∧other,
    c=other∧urgent, d=neither). Counts are exact; each stratum term
    rounds to 9 dp into decimal so the two sums are ORDER-FREE, then
    one division at output (6 dp).

    100 TB shape: one custkey distinct-reduction of orders, one
    customer join, ONE nation-keyed 4-count aggregate (|nations|
    rows), one 1-row fold. Nothing after the scans exceeds model
    state."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    base = cust.join(urgent.withColumn("_u", F.lit(1)), "c_custkey", "left").select(
        "c_nationkey",
        (F.col("c_mktsegment") == "BUILDING").cast("long").alias("t"),
        F.coalesce(F.col("_u"), F.lit(0)).alias("y"),
    )
    per = base.groupBy("c_nationkey").agg(
        F.sum(((F.col("t") == 1) & (F.col("y") == 1)).cast("long")).alias("a"),
        F.sum(((F.col("t") == 1) & (F.col("y") == 0)).cast("long")).alias("b"),
        F.sum(((F.col("t") == 0) & (F.col("y") == 1)).cast("long")).alias("c"),
        F.sum(((F.col("t") == 0) & (F.col("y") == 0)).cast("long")).alias("d"),
    )
    n = (F.col("a") + F.col("b") + F.col("c") + F.col("d")).cast("double")
    DEC12 = "decimal(28,12)"
    # cast BEFORE multiplying: a·d in longs wraps once strata pass
    # ~3e9 rows; the double product is correctly rounded and
    # engine-identical
    num_t = F.round(F.col("a").cast("double") * F.col("d").cast("double") / n, 9).cast(DEC12)
    den_t = F.round(F.col("b").cast("double") * F.col("c").cast("double") / n, 9).cast(DEC12)
    agg = per.agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.sum("a").alias("n_exposed_cases"),
        F.sum(num_t).alias("num"),
        F.sum(den_t).alias("den"),
    )
    return agg.select(
        "n_strata",
        F.col("n_exposed_cases").cast("long").alias("n_exposed_cases"),
        F.when(
            F.col("den") > 0,
            F.round(F.col("num").cast("double") / F.col("den").cast("double"), 6),
        ).alias("or_mh"),
    )


ORACLE_CMH = """
WITH urgent AS (
  SELECT DISTINCT o_custkey AS c_custkey FROM orders
  WHERE o_orderpriority = '1-URGENT'
), base AS (
  SELECT c.c_nationkey,
         CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS t,
         CASE WHEN u.c_custkey IS NULL THEN 0 ELSE 1 END AS y
  FROM customer c LEFT JOIN urgent u USING (c_custkey)
), per AS (
  SELECT c_nationkey,
         SUM(CASE WHEN t = 1 AND y = 1 THEN 1 ELSE 0 END) AS a,
         SUM(CASE WHEN t = 1 AND y = 0 THEN 1 ELSE 0 END) AS b,
         SUM(CASE WHEN t = 0 AND y = 1 THEN 1 ELSE 0 END) AS c,
         SUM(CASE WHEN t = 0 AND y = 0 THEN 1 ELSE 0 END) AS d
  FROM base GROUP BY c_nationkey
), agg AS (
  SELECT COUNT(*) AS n_strata,
         SUM(a) AS n_exposed_cases,
         SUM(CAST(ROUND(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
                        / CAST(a + b + c + d AS DOUBLE), 9)
                  AS DECIMAL(28,12))) AS num,
         SUM(CAST(ROUND(CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
                        / CAST(a + b + c + d AS DOUBLE), 9)
                  AS DECIMAL(28,12))) AS den
  FROM per
)
SELECT n_strata,
       CAST(n_exposed_cases AS BIGINT) AS n_exposed_cases,
       CASE WHEN den > 0
            THEN ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6)
       END AS or_mh
FROM agg
"""

QUERIES["cmh_odds_ratio"] = q_cmh_odds_ratio
ORACLES["cmh_odds_ratio"] = ORACLE_CMH


# --- CUPED variance reduction (pre-period covariate adjustment) ----------


_CUPED_SPLIT_DAY = 15  # first 15 days = pre-period


def q_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Deng et al., WSDM'13): reduce the variance of the
    per-user purchase metric using the user's PRE-PERIOD activity as
    a control covariate — Y* = Y − θ(X − X̄) with θ = cov(X,Y)/var(X).
    Emits the experiment-readout row: n_users, θ, var(Y), var(Y*),
    and the variance-reduction percentage (= ρ² by construction).

    Determinism: per-user X (pre-period value sum) and Y (post-period
    value sum) round to 6 dp into decimal; all five power sums are
    exact decimal aggregates (order-free); θ and the variances come
    out of the pinned population-moment identities with divisions at
    the very end, 6 dp out.

    100 TB shape: one user-keyed conditional aggregate (map-side
    combine), ONE 1-row aggregate of five power sums. The adjusted
    metric itself never materializes — var(Y*) = var(Y) − cov²/var(X)
    in closed form, so CUPED costs one pass."""
    ev = read_table(spark, sf_dir, "events")
    day0 = ev.agg(
        (F.min(F.unix_micros("ts")) / F.lit(86_400_000_000)).cast("long").alias("d0")
    )
    per = (
        ev.crossJoin(F.broadcast(day0))
        .select(
            "user_id",
            (
                (F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long") - F.col("d0")
            ).alias("rel_day"),
            F.col("value"),
        )
        .groupBy("user_id")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("rel_day") < _CUPED_SPLIT_DAY, F.col("value")).otherwise(
                        0.0
                    ).cast("decimal(28,6)")
                ),
                6,
            )
            .cast("decimal(28,6)")
            .alias("x"),
            F.round(
                F.sum(
                    F.when(F.col("rel_day") >= _CUPED_SPLIT_DAY, F.col("value")).otherwise(
                        0.0
                    ).cast("decimal(28,6)")
                ),
                6,
            )
            .cast("decimal(28,6)")
            .alias("y"),
        )
    )
    D4 = "decimal(38,12)"
    a = per.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(D4)).alias("sx"),
        F.sum(F.col("y").cast(D4)).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(D4)).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(D4)).alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast(D4)).alias("sxy"),
    )
    nD = F.col("n").cast("double")
    mx = F.col("sx").cast("double") / nD
    my = F.col("sy").cast("double") / nD
    varx = F.col("sxx").cast("double") / nD - mx * mx
    vary = F.col("syy").cast("double") / nD - my * my
    cov = F.col("sxy").cast("double") / nD - mx * my
    theta = F.when(varx > 0, cov / varx)
    var_adj = F.when(varx > 0, vary - cov * cov / varx).otherwise(vary)
    return a.select(
        F.col("n").alias("n_users"),
        F.round(theta, 6).alias("theta"),
        F.round(vary, 6).alias("var_y"),
        F.round(var_adj, 6).alias("var_y_adj"),
        F.when(
            vary > 0, F.round(F.lit(100.0) * (vary - var_adj) / vary, 6)
        ).alias("var_reduction_pct"),
    )


ORACLE_CUPED = f"""
WITH d0 AS (
  SELECT MIN(epoch_us(ts)) // 86400000000 AS d0 FROM events
), per AS (
  SELECT user_id,
         CAST(ROUND(SUM(CASE WHEN epoch_us(ts) // 86400000000 - d0.d0
                                  < {_CUPED_SPLIT_DAY}
                             THEN CAST(value AS DECIMAL(28,6)) ELSE 0 END), 6)
              AS DECIMAL(28,6)) AS x,
         CAST(ROUND(SUM(CASE WHEN epoch_us(ts) // 86400000000 - d0.d0
                                  >= {_CUPED_SPLIT_DAY}
                             THEN CAST(value AS DECIMAL(28,6)) ELSE 0 END), 6)
              AS DECIMAL(28,6)) AS y
  FROM events CROSS JOIN d0
  GROUP BY user_id
), a AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(x AS DECIMAL(38,12))) AS sx,
         SUM(CAST(y AS DECIMAL(38,12))) AS sy,
         SUM(CAST(x * x AS DECIMAL(38,12))) AS sxx,
         SUM(CAST(y * y AS DECIMAL(38,12))) AS syy,
         SUM(CAST(x * y AS DECIMAL(38,12))) AS sxy
  FROM per
)
SELECT CAST(n AS BIGINT) AS n_users,
       CASE WHEN CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n) > 0
            THEN ROUND((CAST(sxy AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
                       / (CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)), 6)
       END AS theta,
       ROUND(CAST(syy AS DOUBLE) / n - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n), 6) AS var_y,
       ROUND(CASE WHEN CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n) > 0
                  THEN (CAST(syy AS DOUBLE) / n - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
                       - (CAST(sxy AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
                         * (CAST(sxy AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
                         / (CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
                  ELSE CAST(syy AS DOUBLE) / n - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)
             END, 6) AS var_y_adj,
       CASE WHEN CAST(syy AS DOUBLE) / n - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n) > 0
            THEN ROUND(100.0 *
                 (CASE WHEN CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n) > 0
                       THEN (CAST(sxy AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
                            * (CAST(sxy AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
                            / (CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
                       ELSE 0.0 END)
                 / (CAST(syy AS DOUBLE) / n - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)), 6)
       END AS var_reduction_pct
FROM a
"""

QUERIES["cuped_adjustment"] = q_cuped_adjustment
ORACLES["cuped_adjustment"] = ORACLE_CUPED


# --- Simpson's paradox audit (stratum vs pooled association) -------------


def q_simpsons_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox screen for the same BUILDING×URGENT
    association cmh_odds_ratio pools: the pooled odds ratio from the
    summed 2×2 table, against the per-nation association DIRECTIONS
    (sign of a·d − b·c, the exact cross-product test — no division,
    no undefined ORs on zero cells). Reports how many strata agree /
    disagree with the pooled direction and how many are flat — the
    audit every stratified readout should ship with (a disagree
    majority is the paradox signature).

    Determinism: all-integer; cross products compare in
    decimal(38,0) so a·d never wraps a long; the one division (the
    pooled OR) happens on decimal-exact operands, 6 dp.

    100 TB shape: the identical one-aggregate shape as
    cmh_odds_ratio — one distinct-reduction + join, one nation-keyed
    4-count aggregate, one 1-row rollup of |nations| sign flags."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    base = cust.join(urgent.withColumn("_u", F.lit(1)), "c_custkey", "left").select(
        "c_nationkey",
        (F.col("c_mktsegment") == "BUILDING").cast("long").alias("t"),
        F.coalesce(F.col("_u"), F.lit(0)).alias("y"),
    )
    per = base.groupBy("c_nationkey").agg(
        F.sum(((F.col("t") == 1) & (F.col("y") == 1)).cast("long")).alias("a"),
        F.sum(((F.col("t") == 1) & (F.col("y") == 0)).cast("long")).alias("b"),
        F.sum(((F.col("t") == 0) & (F.col("y") == 1)).cast("long")).alias("c"),
        F.sum(((F.col("t") == 0) & (F.col("y") == 0)).cast("long")).alias("d"),
    )
    DEC = "decimal(38,0)"
    cross = F.col("a").cast(DEC) * F.col("d").cast(DEC) - F.col("b").cast(DEC) * F.col(
        "c"
    ).cast(DEC)
    tot = per.agg(
        F.sum("a").cast(DEC).alias("ta"),
        F.sum("b").cast(DEC).alias("tb"),
        F.sum("c").cast(DEC).alias("tc"),
        F.sum("d").cast(DEC).alias("td"),
        F.sum((cross > 0).cast("long")).alias("n_pos"),
        F.sum((cross < 0).cast("long")).alias("n_neg"),
        F.sum((cross == 0).cast("long")).alias("n_flat"),
    )
    pooled_cross = F.col("ta") * F.col("td") - F.col("tb") * F.col("tc")
    pooled_dir = F.when(pooled_cross > 0, 1).when(pooled_cross < 0, -1).otherwise(0)
    pooled_or = F.when(
        (F.col("tb") > 0) & (F.col("tc") > 0),
        F.round(
            (F.col("ta") * F.col("td")).cast("double")
            / (F.col("tb") * F.col("tc")).cast("double"),
            6,
        ),
    )
    agree = F.when(pooled_dir > 0, F.col("n_pos")).when(
        pooled_dir < 0, F.col("n_neg")
    ).otherwise(F.col("n_flat"))
    disagree = F.when(pooled_dir > 0, F.col("n_neg")).when(
        pooled_dir < 0, F.col("n_pos")
    ).otherwise(F.col("n_pos") + F.col("n_neg"))
    return tot.select(
        pooled_or.alias("pooled_or"),
        pooled_dir.cast("int").alias("pooled_direction"),
        agree.cast("long").alias("n_strata_agree"),
        disagree.cast("long").alias("n_strata_disagree"),
        F.col("n_flat").cast("long").alias("n_strata_flat"),
    )


ORACLE_SIMPSONS = """
WITH urgent AS (
  SELECT DISTINCT o_custkey AS c_custkey FROM orders
  WHERE o_orderpriority = '1-URGENT'
), base AS (
  SELECT c.c_nationkey,
         CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS t,
         CASE WHEN u.c_custkey IS NULL THEN 0 ELSE 1 END AS y
  FROM customer c LEFT JOIN urgent u USING (c_custkey)
), per AS (
  SELECT c_nationkey,
         SUM(CASE WHEN t = 1 AND y = 1 THEN 1 ELSE 0 END) AS a,
         SUM(CASE WHEN t = 1 AND y = 0 THEN 1 ELSE 0 END) AS b,
         SUM(CASE WHEN t = 0 AND y = 1 THEN 1 ELSE 0 END) AS c,
         SUM(CASE WHEN t = 0 AND y = 0 THEN 1 ELSE 0 END) AS d
  FROM base GROUP BY c_nationkey
), tot AS (
  SELECT CAST(SUM(a) AS DECIMAL(38,0)) AS ta, CAST(SUM(b) AS DECIMAL(38,0)) AS tb,
         CAST(SUM(c) AS DECIMAL(38,0)) AS tc, CAST(SUM(d) AS DECIMAL(38,0)) AS td,
         SUM(CASE WHEN CAST(a AS DECIMAL(38,0)) * d - CAST(b AS DECIMAL(38,0)) * c > 0
                  THEN 1 ELSE 0 END) AS n_pos,
         SUM(CASE WHEN CAST(a AS DECIMAL(38,0)) * d - CAST(b AS DECIMAL(38,0)) * c < 0
                  THEN 1 ELSE 0 END) AS n_neg,
         SUM(CASE WHEN CAST(a AS DECIMAL(38,0)) * d - CAST(b AS DECIMAL(38,0)) * c = 0
                  THEN 1 ELSE 0 END) AS n_flat
  FROM per
)
SELECT CASE WHEN tb > 0 AND tc > 0
            THEN ROUND(CAST(ta * td AS DOUBLE) / CAST(tb * tc AS DOUBLE), 6) END AS pooled_or,
       CAST(CASE WHEN ta * td - tb * tc > 0 THEN 1
                 WHEN ta * td - tb * tc < 0 THEN -1 ELSE 0 END AS INT) AS pooled_direction,
       CAST(CASE WHEN ta * td - tb * tc > 0 THEN n_pos
                 WHEN ta * td - tb * tc < 0 THEN n_neg
                 ELSE n_flat END AS BIGINT) AS n_strata_agree,
       CAST(CASE WHEN ta * td - tb * tc > 0 THEN n_neg
                 WHEN ta * td - tb * tc < 0 THEN n_pos
                 ELSE n_pos + n_neg END AS BIGINT) AS n_strata_disagree,
       CAST(n_flat AS BIGINT) AS n_strata_flat
FROM tot
"""

QUERIES["simpsons_audit"] = q_simpsons_audit
ORACLES["simpsons_audit"] = ORACLE_SIMPSONS


# --- Benjamini–Hochberg FDR over per-nation mean shifts -----------------


def q_bh_fdr_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple-testing control: per-nation z-scores of mean customer
    balance against the global mean, converted to conservative
    Chebyshev-bound p-values p = min(1, 1/z²), then Benjamini–Hochberg
    step-up at q = 0.10 — reject H_(1..k) where
    k = max{i : p_(i) ≤ q·i/m} (Benjamini & Hochberg, JRSS-B 1995).
    The Chebyshev bound (not a normal CDF) keeps every comparison
    RATIONAL double arithmetic — exact IEEE on both engines, so the
    discrete reject set is bit-stable cross-engine (a libm erf would
    ulp-flip boundary decisions).

    100 TB shape: one nation-keyed decimal power-sum aggregate (exact,
    order-free), a 1-row global roll-up of those ≤|nations| rows, and
    BH windows over the m = |nations| MODEL-SIZED frame (the documented
    partition-less-window exception class, like the Pareto q-values)."""
    cust = read_table(spark, sf_dir, "customer")
    p6 = lambda k: F.round(F.col("c_acctbal") ** k, 6).cast("decimal(28,6)")
    per = cust.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(p6(1)).alias("s1"),
        F.sum(p6(2)).alias("s2"),
    )
    glob = per.agg(
        F.sum("n").alias("_N"), F.sum("s1").alias("_S1"), F.sum("s2").alias("_S2")
    )
    j = per.crossJoin(F.broadcast(glob))
    gm = F.col("_S1").cast("double") / F.col("_N").cast("double")
    gvar = F.col("_S2").cast("double") / F.col("_N").cast("double") - gm * gm
    z = (F.col("s1").cast("double") / F.col("n").cast("double") - gm) / F.sqrt(
        gvar / F.col("n").cast("double")
    )
    scored = j.select(
        "c_nationkey",
        F.col("n").cast("long").alias("n_cust"),
        z.alias("_z"),
    ).withColumn(
        "_p",
        F.when(F.col("_z") * F.col("_z") > 1.0, 1.0 / (F.col("_z") * F.col("_z"))).otherwise(
            F.lit(1.0)
        ),
    )
    m = 25  # TPC-H nation domain — fixed test count, pinned in the oracle
    wr = Window.orderBy(F.col("_p").asc(), F.col("c_nationkey").asc())
    ranked = scored.withColumn("rk", F.row_number().over(wr).cast("long"))
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    k = F.max(
        F.when(F.col("_p") <= F.lit(0.10) * F.col("rk") / F.lit(m), F.col("rk"))
    ).over(wall)
    return ranked.select(
        "c_nationkey",
        "n_cust",
        F.round("_z", 6).alias("z"),
        F.round("_p", 6).alias("p_bound"),
        "rk",
        (F.col("rk") <= F.coalesce(k, F.lit(0))).alias("rejected"),
    )


ORACLE_BH_FDR = """
WITH per AS (
  SELECT c_nationkey, COUNT(*) AS n,
         SUM(CAST(ROUND(c_acctbal, 6) AS DECIMAL(28,6))) AS s1,
         SUM(CAST(ROUND(c_acctbal * c_acctbal, 6) AS DECIMAL(28,6))) AS s2
  FROM customer GROUP BY c_nationkey
), gtot AS (
  SELECT SUM(n) AS N, SUM(s1) AS S1, SUM(s2) AS S2 FROM per
), scored AS (
  SELECT p.c_nationkey, p.n,
         (CAST(p.s1 AS DOUBLE) / CAST(p.n AS DOUBLE)
          - CAST(g.S1 AS DOUBLE) / CAST(g.N AS DOUBLE))
         / SQRT((CAST(g.S2 AS DOUBLE) / CAST(g.N AS DOUBLE)
                 - (CAST(g.S1 AS DOUBLE) / CAST(g.N AS DOUBLE))
                   * (CAST(g.S1 AS DOUBLE) / CAST(g.N AS DOUBLE)))
                / CAST(p.n AS DOUBLE)) AS z
  FROM per p, gtot g
), pv AS (
  SELECT c_nationkey, n,
         z,
         CASE WHEN z * z > 1.0 THEN 1.0 / (z * z) ELSE 1.0 END AS p
  FROM scored
), ranked AS (
  SELECT c_nationkey, n, z, p,
         ROW_NUMBER() OVER (ORDER BY p ASC, c_nationkey ASC) AS rk
  FROM pv
), kk AS (
  SELECT MAX(CASE WHEN p <= 0.10 * rk / 25 THEN rk END) AS k FROM ranked
)
SELECT r.c_nationkey, CAST(r.n AS BIGINT) AS n_cust,
       ROUND(r.z, 6) AS z, ROUND(r.p, 6) AS p_bound,
       CAST(r.rk AS BIGINT) AS rk,
       r.rk <= COALESCE(k.k, 0) AS rejected
FROM ranked r, kk k
"""

QUERIES["bh_fdr_nations"] = q_bh_fdr_nations
ORACLES["bh_fdr_nations"] = ORACLE_BH_FDR


# --- Mann–Kendall trend test (significance companion of Theil–Sen) -----


def q_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall S with tie-corrected variance and the standard
    continuity-corrected z per event type over the daily count series
    (Mann 1945, Kendall 1975) — the nonparametric significance test
    that pairs with `theil_sen_trend`'s slope estimate.

    S = Σ_{i<j} sign(c_j − c_i) over time-ordered days; Var(S) =
    [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18 over the value-tie groups.
    All counts are exact integers in decimal; z's one √/÷ is IEEE.

    100 TB shape: the daily series is calendar-bounded MODEL STATE, so
    the D² pair frame keeps theil_sen_trend's documented contract; S is
    one pair aggregate, the tie term one value group-by. Corpus-scale
    work is the single daily hash aggregate."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        (F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long").alias("day"),
    ).agg(F.count(F.lit(1)).alias("c"))
    a = daily.select("event_type", F.col("day").alias("d1"), F.col("c").alias("c1"))
    b = daily.select("event_type", F.col("day").alias("d2"), F.col("c").alias("c2"))
    s = (
        a.join(b, "event_type")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("event_type")
        .agg(
            F.sum(F.signum((F.col("c2") - F.col("c1")).cast("double")).cast("long")).alias(
                "s"
            )
        )
    )
    n = daily.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    ties = (
        daily.groupBy("event_type", "c")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                (F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)).cast("long")
            ).alias("tie_term")
        )
    )
    j = s.join(n, "event_type").join(ties, "event_type")
    var_s = (
        (F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tie_term"))
        .cast("double")
        / 18.0
    )
    sd = F.sqrt(var_s)
    z = (
        F.when((F.col("s") > 0) & (sd > 0), (F.col("s") - 1).cast("double") / sd)
        .when((F.col("s") < 0) & (sd > 0), (F.col("s") + 1).cast("double") / sd)
        .otherwise(F.lit(0.0))
    )
    return j.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.col("s").alias("s_stat"),
        F.round(var_s, 6).alias("var_s"),
        F.round(z, 6).alias("z"),
    )


ORACLE_MANN_KENDALL = """
WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS c
  FROM events GROUP BY 1, 2
), s AS (
  SELECT a.event_type,
         SUM(CAST(SIGN(CAST(b.c - a.c AS DOUBLE)) AS BIGINT)) AS s
  FROM daily a JOIN daily b ON a.event_type = b.event_type AND a.day < b.day
  GROUP BY 1
), n AS (SELECT event_type, COUNT(*) AS n FROM daily GROUP BY 1),
ties AS (
  SELECT event_type, SUM(t * (t - 1) * (2 * t + 5)) AS tie_term
  FROM (SELECT event_type, c, COUNT(*) AS t FROM daily GROUP BY 1, 2)
  GROUP BY 1
)
SELECT s.event_type, CAST(n.n AS BIGINT) AS n_days, CAST(s.s AS BIGINT) AS s_stat,
       ROUND(CAST(n.n * (n.n - 1) * (2 * n.n + 5) - t.tie_term AS DOUBLE) / 18.0, 6)
         AS var_s,
       ROUND(CASE
         WHEN s.s > 0 AND CAST(n.n * (n.n - 1) * (2 * n.n + 5) - t.tie_term AS DOUBLE) > 0
           THEN CAST(s.s - 1 AS DOUBLE)
                / SQRT(CAST(n.n * (n.n - 1) * (2 * n.n + 5) - t.tie_term AS DOUBLE) / 18.0)
         WHEN s.s < 0 AND CAST(n.n * (n.n - 1) * (2 * n.n + 5) - t.tie_term AS DOUBLE) > 0
           THEN CAST(s.s + 1 AS DOUBLE)
                / SQRT(CAST(n.n * (n.n - 1) * (2 * n.n + 5) - t.tie_term AS DOUBLE) / 18.0)
         ELSE 0.0 END, 6) AS z
FROM s JOIN n USING (event_type) JOIN ties t USING (event_type)
"""

QUERIES["mann_kendall_trend"] = q_mann_kendall_trend
ORACLES["mann_kendall_trend"] = ORACLE_MANN_KENDALL


# --- Inverse-propensity-weighted ATE (Horvitz–Thompson) -----------------


def q_ipw_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity-weighted average treatment effect (the
    Horvitz–Thompson estimator): treatment = customer placed ≥1 URGENT
    order, outcome = account balance, propensity e(x) = the observed
    treatment rate within the customer's market segment.
    ATE = (1/N) Σ [T·Y/ê − (1−T)·Y/(1−ê)]. Completes the causal
    family (CMH / CUPED / propensity-ATT / Simpson audit) with the
    weighting estimator. Segments with ê ∈ {0, 1} have no overlap and
    are EXCLUDED (positivity violation — the pinned contract; their
    rows cannot be weighted), with N counting included rows only.

    Determinism: segment counts are exact; ê is one IEEE division;
    per-row weighted outcomes round to 6 dp into decimal BEFORE the
    global sum, so the aggregate is order-free and bit-identical
    cross-engine (the RA-term discipline of user_link_prediction).

    100 TB shape: one orders distinct-reduction + broadcast segment-
    rate attach + ONE decimal aggregate; nothing quadratic."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    ).distinct()
    t = cust.join(urgent, "c_custkey", "left_semi").select(
        "c_custkey", F.lit(1).alias("treated")
    )
    base = cust.join(t, "c_custkey", "left").select(
        "c_custkey",
        "c_mktsegment",
        F.col("c_acctbal").alias("y"),
        F.coalesce("treated", F.lit(0)).alias("treated"),
    )
    rates = base.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_seg"), F.sum("treated").alias("n_treat")
    )
    j = base.join(F.broadcast(rates), "c_mktsegment").filter(
        (F.col("n_treat") > 0) & (F.col("n_treat") < F.col("n_seg"))
    )
    e = F.col("n_treat").cast("double") / F.col("n_seg").cast("double")
    term = F.when(
        F.col("treated") == 1, F.col("y") / e
    ).otherwise(-F.col("y") / (F.lit(1.0) - e))
    agg = j.agg(
        F.count(F.lit(1)).alias("n_used"),
        F.sum(F.round(term, 6).cast("decimal(28,6)")).alias("s"),
        F.sum("treated").alias("n_treated"),
    )
    return agg.select(
        F.col("n_used").cast("long").alias("n_used"),
        F.col("n_treated").cast("long").alias("n_treated"),
        F.round(F.col("s").cast("double") / F.col("n_used").cast("double"), 6).alias(
            "ate_ipw"
        ),
    )


ORACLE_IPW_ATE = """
WITH urgent AS (
  SELECT DISTINCT o_custkey AS c_custkey FROM orders
  WHERE o_orderpriority = '1-URGENT'
), base AS (
  SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal AS y,
         CASE WHEN u.c_custkey IS NULL THEN 0 ELSE 1 END AS treated
  FROM customer c LEFT JOIN urgent u USING (c_custkey)
), rates AS (
  SELECT c_mktsegment, COUNT(*) AS n_seg, SUM(treated) AS n_treat
  FROM base GROUP BY 1
), j AS (
  SELECT b.y, b.treated,
         CAST(r.n_treat AS DOUBLE) / CAST(r.n_seg AS DOUBLE) AS e
  FROM base b JOIN rates r USING (c_mktsegment)
  WHERE r.n_treat > 0 AND r.n_treat < r.n_seg
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_used,
       CAST(SUM(treated) AS BIGINT) AS n_treated,
       ROUND(CAST(SUM(CAST(ROUND(
           CASE WHEN treated = 1 THEN y / e ELSE -y / (1.0 - e) END, 6)
         AS DECIMAL(28,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS ate_ipw
FROM j
"""

QUERIES["ipw_ate"] = q_ipw_ate
ORACLES["ipw_ate"] = ORACLE_IPW_ATE


# --- Nelson–Aalen cumulative hazard (companion of Kaplan–Meier) ---------


def q_nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimator H(t) = Σ_{s≤t} d_s/n_s
    over the same user-lifetime grain as `kaplan_meier_retention`
    (Nelson 1972, Aalen 1978) — the additive counterpart of KM's
    product-limit curve, the quantity hazard-model diagnostics plot.

    Per-step hazards d/n round to 8 dp into decimal BEFORE the running
    sum (the catalog's order-independent float idiom), so the cumsum
    is exact decimal addition; only the final readout casts to double.

    100 TB shape: identical to KM — two hash-aggs over the corpus, and
    the running sum is one window over the (cohort, t) MODEL-SIZED
    frame (lifetimes are calendar-bounded)."""
    ev = read_table(spark, sf_dir, "events")
    day = (F.unix_micros(F.col("ts")) / F.lit(DAY_US)).cast("long")
    w1 = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    per_user = (
        ev.select(
            "user_id",
            day.alias("day"),
            F.row_number().over(w1).alias("_rn"),
            F.col("event_type"),
        )
        .groupBy("user_id")
        .agg(
            F.min("day").alias("first_day"),
            F.max("day").alias("last_day"),
            F.max(F.when(F.col("_rn") == 1, F.col("event_type"))).alias("cohort"),
        )
    )
    max_day = per_user.agg(F.max("last_day").alias("mx"))
    lab = per_user.crossJoin(F.broadcast(max_day)).select(
        "cohort",
        (F.col("last_day") - F.col("first_day")).alias("t"),
        F.when(F.col("last_day") <= F.col("mx") - 7, F.lit(1))
        .otherwise(F.lit(0))
        .alias("churn"),
    )
    per_t = lab.groupBy("cohort", "t").agg(
        F.sum("churn").alias("d"), F.count(F.lit(1)).alias("exits")
    )
    tot = lab.groupBy("cohort").agg(F.count(F.lit(1)).alias("n_cohort"))
    wt = Window.partitionBy("cohort").orderBy("t")
    na = (
        per_t.join(F.broadcast(tot), "cohort")
        .withColumn(
            "n_at_risk",
            F.col("n_cohort")
            - F.coalesce(
                F.sum("exits").over(wt.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .withColumn(
            "_term",
            F.round(
                F.col("d").cast("double") / F.col("n_at_risk").cast("double"), 8
            ).cast("decimal(28,8)"),
        )
        .withColumn(
            "_cum", F.sum("_term").over(wt.rowsBetween(Window.unboundedPreceding, 0))
        )
    )
    return na.select(
        "cohort",
        "t",
        F.col("n_at_risk").cast("long").alias("n_at_risk"),
        F.col("d").cast("long").alias("n_churned"),
        F.round(F.col("_cum").cast("double"), 6).alias("cum_hazard"),
    )


ORACLE_NELSON_AALEN = """
WITH ranked AS (
  SELECT user_id, event_type, epoch_us(ts) // 86400000000 AS day,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), pu AS (
  SELECT user_id, MIN(day) AS first_day, MAX(day) AS last_day,
         MAX(CASE WHEN rn = 1 THEN event_type END) AS cohort
  FROM ranked GROUP BY user_id
), mx AS (SELECT MAX(last_day) AS mx FROM pu),
lab AS (
  SELECT cohort, last_day - first_day AS t,
         CASE WHEN last_day <= mx - 7 THEN 1 ELSE 0 END AS churn
  FROM pu, mx
), per_t AS (
  SELECT cohort, t, CAST(SUM(churn) AS BIGINT) AS d, COUNT(*) AS exits
  FROM lab GROUP BY cohort, t
), tot AS (SELECT cohort, COUNT(*) AS n_cohort FROM lab GROUP BY cohort),
na AS (
  SELECT p.cohort, p.t, p.d,
         tot.n_cohort
         - COALESCE(SUM(p.exits) OVER (PARTITION BY p.cohort ORDER BY p.t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS n_at_risk,
         p.exits
  FROM per_t p JOIN tot USING (cohort)
), terms AS (
  SELECT cohort, t, d, n_at_risk,
         CAST(ROUND(CAST(d AS DOUBLE) / CAST(n_at_risk AS DOUBLE), 8)
              AS DECIMAL(28,8)) AS term
  FROM na
)
SELECT cohort, t, CAST(n_at_risk AS BIGINT) AS n_at_risk,
       CAST(d AS BIGINT) AS n_churned,
       ROUND(CAST(SUM(term) OVER (PARTITION BY cohort ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6)
         AS cum_hazard
FROM terms
"""

QUERIES["nelson_aalen_hazard"] = q_nelson_aalen_hazard
ORACLES["nelson_aalen_hazard"] = ORACLE_NELSON_AALEN


# --- Difference-in-differences -------------------------------------------


_DID_PIVOT = "1998-01-01"


def q_diff_in_differences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences on order totals: treatment group =
    BUILDING-segment customers, pre/post pivot pinned at 1998-01-01
    (mid-range of the order-date domain).
    DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre) — the 2×2
    parallel-trends estimator completing the causal family. Exact
    cent-level decimal sums per cell; four IEEE divisions + three
    subtractions at the end.

    100 TB shape: one broadcast segment attach + ONE 4-cell decimal
    aggregate; nothing else touches the fact table."""
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", (F.col("c_mktsegment") == "BUILDING").alias("treated")
    )
    orders = read_table(spark, sf_dir, "orders")
    j = orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
    cells = j.groupBy(
        "treated", (F.col("o_orderdate") >= F.lit(_DID_PIVOT).cast("timestamp")).alias("post")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("o_totalprice"), 2).cast("decimal(28,2)")).alias("s"),
    )
    m = F.col("s").cast("double") / F.col("n").cast("double")
    # assemble the 2x2 via conditional aggregation: one row out
    agg = cells.agg(
        F.sum(F.when(F.col("treated") & F.col("post"), m)).alias("t_post"),
        F.sum(F.when(F.col("treated") & ~F.col("post"), m)).alias("t_pre"),
        F.sum(F.when(~F.col("treated") & F.col("post"), m)).alias("c_post"),
        F.sum(F.when(~F.col("treated") & ~F.col("post"), m)).alias("c_pre"),
        F.sum("n").alias("n_orders"),
    )
    return agg.select(
        F.col("n_orders").cast("long").alias("n_orders"),
        F.round("t_pre", 6).alias("treated_pre"),
        F.round("t_post", 6).alias("treated_post"),
        F.round("c_pre", 6).alias("control_pre"),
        F.round("c_post", 6).alias("control_post"),
        F.round(
            (F.col("t_post") - F.col("t_pre")) - (F.col("c_post") - F.col("c_pre")), 6
        ).alias("did"),
    )


ORACLE_DID = f"""
WITH j AS (
  SELECT o.o_totalprice, o.o_orderdate,
         c.c_mktsegment = 'BUILDING' AS treated,
         o.o_orderdate >= TIMESTAMP '{_DID_PIVOT}' AS post
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), cells AS (
  SELECT treated, post, COUNT(*) AS n,
         SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(28,2))) AS s
  FROM j GROUP BY 1, 2
)
SELECT CAST(SUM(n) AS BIGINT) AS n_orders,
       ROUND(SUM(CASE WHEN treated AND NOT post
                      THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END), 6)
         AS treated_pre,
       ROUND(SUM(CASE WHEN treated AND post
                      THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END), 6)
         AS treated_post,
       ROUND(SUM(CASE WHEN NOT treated AND NOT post
                      THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END), 6)
         AS control_pre,
       ROUND(SUM(CASE WHEN NOT treated AND post
                      THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END), 6)
         AS control_post,
       ROUND(SUM(CASE WHEN treated AND post
                      THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END)
             - SUM(CASE WHEN treated AND NOT post
                        THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END)
             - (SUM(CASE WHEN NOT treated AND post
                         THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END)
                - SUM(CASE WHEN NOT treated AND NOT post
                           THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END)), 6)
         AS did
FROM cells
"""

QUERIES["diff_in_differences"] = q_diff_in_differences
ORACLES["diff_in_differences"] = ORACLE_DID


# --- statistics: Mann-Whitney U (rank-sum) test (round 10) ---------------


def q_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) between 'click' and 'view'
    values — the nonparametric two-sample location test that pairs
    with ks_two_sample (distribution shape) and welch_t_test
    (parametric): U1, plus the tie-corrected normal z.  Completes the
    classical two-sample trio over the same event frames.

    Exactness: average ranks never materialize — per distinct value v
    with counts (c1, c2, n = c1+c2) and INCLUSIVE rank-sum prefix an,
    2*R1 accumulates c1*(2*an - n + 1), an INTEGER (the .5 average
    ranks cancel), summed as decimal(38,0); the tie term sums
    n^3 - n the same way; U/z are then one shared IEEE expression
    tree, so both engines round identical doubles.

    100 TB shape: same as ks_two_sample — one per-value count
    aggregate, the two-phase exact cumsum device (per-range local
    sums + broadcast offsets, no single-task window), one 1-row
    aggregate.  Row count through the device is |distinct values|."""
    from kg_etl_spark.operators.rankdev import global_cumsum

    DEC38 = "decimal(38,0)"
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    per_v = (
        ev.groupBy("value")
        .agg(
            F.sum((F.col("event_type") == "click").cast("long")).alias("c1"),
            F.sum((F.col("event_type") == "view").cast("long")).alias("c2"),
        )
        .withColumn("n", F.col("c1") + F.col("c2"))
    ).lineage_cut(eager=True)  # the cumsum device re-reads it
    cum = global_cumsum(per_v, "value", ["n"], prefix="_a")
    agg = cum.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
        F.sum(
            F.col("c1").cast(DEC38)
            * (2 * F.col("_an") - F.col("n") + 1).cast(DEC38)
        ).alias("_two_r1"),
        F.sum(
            (F.col("n").cast(DEC38) * F.col("n") * F.col("n") - F.col("n")).cast(
                DEC38
            )
        ).alias("_tie"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = n1d + n2d
    u1 = (F.col("_two_r1").cast("double") - n1d * (n1d + F.lit(1.0))) / F.lit(2.0)
    mu = n1d * n2d / F.lit(2.0)
    sig2 = (
        n1d
        * n2d
        / F.lit(12.0)
        * ((nd + F.lit(1.0)) - F.col("_tie").cast("double") / (nd * (nd - F.lit(1.0))))
    )
    return agg.select(
        "n1",
        "n2",
        F.round(u1, 6).alias("u_stat"),
        F.round((u1 - mu) / F.sqrt(sig2), 6).alias("z_score"),
    )


ORACLE_MANN_WHITNEY = """
WITH per_v AS (
  SELECT value,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM events WHERE event_type IN ('click', 'view')
  GROUP BY value
), cum AS (
  SELECT c1, c2, c1 + c2 AS n,
         SUM(c1 + c2) OVER (ORDER BY value
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS an
  FROM per_v
), agg AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1,
         CAST(SUM(c2) AS BIGINT) AS n2,
         SUM(CAST(c1 AS HUGEINT) * (2 * an - n + 1)) AS two_r1,
         SUM(CAST(n AS HUGEINT) * n * n - n) AS tie
  FROM cum
)
SELECT n1, n2,
       ROUND((CAST(two_r1 AS DOUBLE)
              - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0)) / 2.0, 6)
         AS u_stat,
       ROUND(((CAST(two_r1 AS DOUBLE)
               - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0)) / 2.0
              - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
             / SQRT(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
                    * ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1.0)
                       - CAST(tie AS DOUBLE)
                         / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                            * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0)))),
             6) AS z_score
FROM agg
"""

QUERIES["mann_whitney_u"] = q_mann_whitney_u
ORACLES["mann_whitney_u"] = ORACLE_MANN_WHITNEY


# --- sequential testing: SPRT on the purchase stream (round 10) ----------


def q_sprt_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test over the time-ordered
    purchase stream: is variant B (user_id odd — the deterministic
    assignment) over-represented among purchases?  H0 p=0.5 vs H1
    p=0.55, alpha = beta = 0.05 — the experimentation-platform op that
    lets a test STOP at the first decisive observation instead of a
    fixed horizon (Wald 1945).  Reports the final LLR, the first
    boundary-crossing observation index, and the decision at that
    crossing.

    Exactness: the per-observation LLR increments are the PRE-ROUNDED
    6dp literals ln(1.1) -> 0.09531 and ln(0.9) -> -0.105361 (computing
    ln at runtime would race JVM StrictMath vs libm ulps), so
    LLR(n) = cx*c1 + (n-cx)*c0 is the same IEEE tree in both engines;
    the ln(19) = 2.944439 boundary likewise.  The stream order is the
    total (ts, event_id) order.

    100 TB shape: the observation index is global_row_number and the
    running treat-count is global_cumsum — BOTH on the two-phase
    range device (per-range local work + broadcast offsets), so there
    is no single-task ORDER BY the whole stream anywhere; one filtered
    1-row crossing aggregate + one 1-row totals aggregate cross at the
    end."""
    from kg_etl_spark.operators.rankdev import global_cumsum, global_row_number

    C1, C0, THRESH = 0.09531, -0.105361, 2.944439
    obs = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.unix_micros("ts").alias("_tsu"),
            "event_id",
            F.pmod(F.col("user_id"), F.lit(2)).cast("long").alias("x"),
        )
    )
    ranked, n_total = global_row_number(
        obs, "_tsu", tiebreaks=["event_id"], out_col="_rn"
    )
    cum = global_cumsum(ranked, "_rn", ["x"], prefix="_c")
    llr = F.col("_cx").cast("double") * F.lit(C1) + (
        F.col("_rn") - F.col("_cx")
    ).cast("double") * F.lit(C0)
    crossing = (
        cum.select("_rn", llr.alias("_llr"))
        .filter(F.abs(F.col("_llr")) >= F.lit(THRESH))
        .agg(
            F.min("_rn").alias("_first"),
            F.min_by(
                F.when(F.col("_llr") > 0, F.lit(1)).otherwise(F.lit(-1)), F.col("_rn")
            ).alias("_sgn"),
        )
    )
    tot = obs.agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum("x").cast("long").alias("n_treat"),
    )
    out = tot.crossJoin(F.broadcast(crossing))
    final_llr = F.col("n_treat").cast("double") * F.lit(C1) + (
        F.col("n_obs") - F.col("n_treat")
    ).cast("double") * F.lit(C0)
    return out.select(
        "n_obs",
        "n_treat",
        F.round(final_llr, 6).alias("final_llr"),
        F.coalesce(F.col("_first"), F.lit(0)).cast("long").alias("first_cross_n"),
        F.when(F.col("_first").isNull(), "continue")
        .when(F.col("_sgn") > 0, "accept_h1")
        .otherwise("accept_h0")
        .alias("decision"),
    )


ORACLE_SPRT = """
WITH obs AS (
  SELECT event_id, ts, CAST(user_id % 2 AS BIGINT) AS x
  FROM events WHERE event_type = 'purchase'
), r AS (
  SELECT ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn,
         SUM(x) OVER (ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cx
  FROM obs
), l AS (
  SELECT rn,
         CAST(cx AS DOUBLE) * CAST(0.09531 AS DOUBLE)
           + CAST(rn - cx AS DOUBLE) * CAST(-0.105361 AS DOUBLE) AS llr
  FROM r
), crossing AS (
  SELECT MIN(rn) AS first_n,
         arg_min(CASE WHEN llr > 0 THEN 1 ELSE -1 END, rn) AS sgn
  FROM l WHERE ABS(llr) >= CAST(2.944439 AS DOUBLE)
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_obs, CAST(SUM(x) AS BIGINT) AS n_treat
  FROM obs
)
SELECT n_obs, n_treat,
       ROUND(CAST(n_treat AS DOUBLE) * CAST(0.09531 AS DOUBLE)
             + CAST(n_obs - n_treat AS DOUBLE) * CAST(-0.105361 AS DOUBLE), 6)
         AS final_llr,
       CAST(COALESCE(first_n, 0) AS BIGINT) AS first_cross_n,
       CASE WHEN first_n IS NULL THEN 'continue'
            WHEN sgn > 0 THEN 'accept_h1'
            ELSE 'accept_h0' END AS decision
FROM tot LEFT JOIN crossing ON TRUE
"""

QUERIES["sprt_conversion"] = q_sprt_conversion
ORACLES["sprt_conversion"] = ORACLE_SPRT


# --- grouped 10% trimmed mean on the rank device (round 10) --------------


def q_trimmed_mean_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-trimmed mean account balance per market segment — the
    robust-location sibling of winsorize (drop the tails instead of
    clamping them): per group, discard the floor(n/10) lowest- and
    highest-ranked rows under the unique (balance, custkey) total
    order and average the rest.

    100 TB shape: the per-segment rank is grouped_row_number (the
    two-phase cell device — a plain 5-partition window sorts n/5 rows
    in one task at scale); the trim bounds are pure expressions of the
    (rank, group count) columns the device already carries, so no
    second pass, no quantile probe.  Sum exactness: balances are exact
    2dp — the round-6 decimal(28,6) sum is order-independent."""
    from kg_etl_spark.operators.rankdev import grouped_row_number

    cust = read_table(spark, sf_dir, "customer")
    ranked = grouped_row_number(
        cust, ["c_mktsegment"], "c_acctbal", ["c_custkey"],
        out_col="_rn", count_col="_n",
    )
    k = F.floor(F.col("_n") / F.lit(10))
    kept = ranked.filter((F.col("_rn") > k) & (F.col("_rn") <= F.col("_n") - k))
    return (
        kept.groupBy("c_mktsegment")
        .agg(
            F.max("_n").cast("long").alias("n_total"),
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.round(
                F.sum(F.round(F.col("c_acctbal"), 6).cast("decimal(28,6)"))
                .cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("trimmed_mean"),
        )
        .orderBy("c_mktsegment")
    )


ORACLE_TRIMMED_MEAN = """
WITH r AS (
  SELECT c_mktsegment, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal ASC, c_custkey ASC) AS rn,
         COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM customer
)
SELECT c_mktsegment,
       CAST(MAX(n) AS BIGINT) AS n_total,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       ROUND(CAST(SUM(CAST(ROUND(c_acctbal, 6) AS DECIMAL(28,6))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS trimmed_mean
FROM r
WHERE rn > CAST(FLOOR(n / 10) AS BIGINT)
  AND rn <= n - CAST(FLOOR(n / 10) AS BIGINT)
GROUP BY c_mktsegment
"""

QUERIES["trimmed_mean_segment"] = q_trimmed_mean_segment
ORACLES["trimmed_mean_segment"] = ORACLE_TRIMMED_MEAN


# --- regression discontinuity at a balance cutoff (round 10) -------------


def q_rdd_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharp regression-discontinuity estimate: customers just below
    vs just above the 5000 account-balance cutoff (bandwidth 2000),
    outcome = order count; fit a local line on EACH side by
    closed-form OLS over centered balance and report the jump of the
    two intercepts at the cutoff — the quasi-experimental effect
    estimator when treatment is a threshold rule (Thistlethwaite &
    Campbell 1960).

    100 TB shape: one orders count-aggregate, one bandwidth-filtered
    customer scan LEFT-joined to it (zero-order customers count as
    y=0), ONE 2-row power-sum aggregate (n, Σx, Σy, Σxy, Σx² per
    side) — the per-side OLS is pure closed-form arithmetic on those
    five sums.  Exactness: x is exact 2dp (decimal sums), y integer;
    the slope/intercept/jump expressions are one shared IEEE tree."""
    DECP = "decimal(28,6)"
    cust = read_table(spark, sf_dir, "customer").filter(
        (F.col("c_acctbal") >= 3000.0) & (F.col("c_acctbal") < 7000.0)
    )
    per_cust = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("_ny"))
    )
    base = cust.join(
        per_cust, cust.c_custkey == per_cust.o_custkey, "left"
    ).select(
        (F.col("c_acctbal") - F.lit(5000.0)).alias("x"),
        F.coalesce("_ny", F.lit(0)).cast("long").alias("y"),
        (F.col("c_acctbal") >= 5000.0).cast("int").alias("side"),
    )
    p6 = lambda c: F.round(c, 6).cast(DECP)  # noqa: E731
    sums = base.groupBy("side").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(p6(F.col("x"))).cast("double").alias("sx"),
        F.sum(F.col("y")).cast("double").alias("sy"),
        F.sum(p6(F.col("x") * F.col("y"))).cast("double").alias("sxy"),
        F.sum(p6(F.col("x") * F.col("x"))).cast("double").alias("sxx"),
    )
    nD = F.col("n").cast("double")
    slope = (nD * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        nD * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    icept = (F.col("sy") - slope * F.col("sx")) / nD
    fitted = sums.select("side", "n", slope.alias("b"), icept.alias("a"))
    lo = fitted.filter(F.col("side") == 0).select(
        F.col("n").cast("long").alias("n_left"),
        F.col("a").alias("_al"),
        F.col("b").alias("_bl"),
    )
    hi = fitted.filter(F.col("side") == 1).select(
        F.col("n").cast("long").alias("n_right"),
        F.col("a").alias("_ar"),
        F.col("b").alias("_br"),
    )
    return lo.crossJoin(F.broadcast(hi)).select(
        "n_left",
        "n_right",
        F.round(F.col("_ar") - F.col("_al"), 6).alias("jump"),
        F.round("_bl", 6).alias("slope_left"),
        F.round("_br", 6).alias("slope_right"),
    )


ORACLE_RDD = """
WITH base AS (
  SELECT c.c_acctbal - 5000.0 AS x,
         COALESCE(o.ny, 0) AS y,
         CASE WHEN c.c_acctbal >= 5000.0 THEN 1 ELSE 0 END AS side
  FROM customer c
  LEFT JOIN (SELECT o_custkey, COUNT(*) AS ny FROM orders GROUP BY 1) o
    ON c.c_custkey = o.o_custkey
  WHERE c.c_acctbal >= 3000.0 AND c.c_acctbal < 7000.0
), sums AS (
  SELECT side, COUNT(*) AS n,
         CAST(SUM(CAST(ROUND(x, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sx,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(CAST(ROUND(x * y, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(ROUND(x * x, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sxx
  FROM base GROUP BY side
), fitted AS (
  SELECT side, n,
         (CAST(n AS DOUBLE) * sxy - sx * sy)
           / (CAST(n AS DOUBLE) * sxx - sx * sx) AS b,
         (sy - (CAST(n AS DOUBLE) * sxy - sx * sy)
                 / (CAST(n AS DOUBLE) * sxx - sx * sx) * sx)
           / CAST(n AS DOUBLE) AS a
  FROM sums
)
SELECT CAST(l.n AS BIGINT) AS n_left, CAST(r.n AS BIGINT) AS n_right,
       ROUND(r.a - l.a, 6) AS jump,
       ROUND(l.b, 6) AS slope_left,
       ROUND(r.b, 6) AS slope_right
FROM fitted l JOIN fitted r ON l.side = 0 AND r.side = 1
"""

QUERIES["rdd_effect"] = q_rdd_effect
ORACLES["rdd_effect"] = ORACLE_RDD


# --- governance: t-closeness audit (round 10) ----------------------------


def q_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness (Li, Li & Venkatasubramanian, ICDE'07) on the
    (nation, segment) quasi-identifier groups with account balance as
    the ORDERED sensitive attribute — completes the release-gate trio
    (k_anonymity: group size; l_diversity: sensitive variety;
    t-closeness: sensitive DISTRIBUTION distance, the attack both
    miss when a group's values are diverse but skewed).  Distance is
    the ordered-bucket EMD of the paper: balance binned into 10
    equal-width global bins, D(c) = (1/(B−1))·Σ_{b<B−1}
    |Σ_{k<=b}(p_ck − q_k)|.

    Exactness: per-(class, bin) share diffs are single IEEE divides,
    rounded to 9dp and decimal-summed for the cumulative (order-free);
    the final mean rounds to 6dp — rounding error bound ~5e-9, four
    orders below the reported precision.

    100 TB shape: ONE corpus aggregate to (class, bin) counts; every
    frame after it is domain-bounded (|nations|x|segments|x10 rows),
    cumulated via a 10-row triangular bin join — no windows, no
    unbounded groupBy broadcasts."""
    DEC9 = "decimal(28,9)"
    cust = read_table(spark, sf_dir, "customer")
    mm = cust.agg(
        F.min("c_acctbal").alias("_lo"), F.max("c_acctbal").alias("_hi")
    )
    binned = cust.crossJoin(F.broadcast(mm)).select(
        "c_nationkey",
        "c_mktsegment",
        F.least(
            F.lit(9),
            F.floor(
                (F.col("c_acctbal") - F.col("_lo"))
                * 10.0
                / (F.col("_hi") - F.col("_lo"))
            ),
        )
        .cast("long")
        .alias("_b"),
    )
    class_bin = binned.groupBy("c_nationkey", "c_mktsegment", "_b").agg(
        F.count(F.lit(1)).alias("_ncb")
    )
    class_tot = binned.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("_nc")
    )
    glob_bin = binned.groupBy("_b").agg(F.count(F.lit(1)).alias("_nb"))
    glob_tot = binned.agg(F.count(F.lit(1)).alias("_n"), F.max("_b").alias("_bmax"))
    # full class x bin grid so empty (class, bin) cells contribute -q_k
    grid = (
        class_tot.crossJoin(F.broadcast(glob_bin.select("_b")))
        .join(class_bin, ["c_nationkey", "c_mktsegment", "_b"], "left")
        .join(glob_bin, "_b")
        .crossJoin(F.broadcast(glob_tot))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "_b",
            "_nc",
            "_bmax",
            F.round(
                F.coalesce(F.col("_ncb"), F.lit(0)).cast("double")
                / F.col("_nc").cast("double")
                - F.col("_nb").cast("double") / F.col("_n").cast("double"),
                9,
            )
            .cast(DEC9)
            .alias("_d"),
        )
    )
    bins = glob_bin.select(F.col("_b").alias("_b2"))
    cum = (
        grid.join(F.broadcast(bins), F.col("_b") <= F.col("_b2"))
        .filter(F.col("_b2") < F.col("_bmax"))
        .groupBy("c_nationkey", "c_mktsegment", "_nc", "_bmax", "_b2")
        .agg(F.sum("_d").alias("_cd"))
    )
    return (
        cum.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.max("_nc").cast("long").alias("class_size"),
            F.round(
                F.sum(F.abs(F.col("_cd")).cast(DEC9)).cast("double")
                / F.max("_bmax").cast("double"),
                6,
            ).alias("t_distance"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


ORACLE_T_CLOSENESS = """
WITH mm AS (SELECT MIN(c_acctbal) AS lo, MAX(c_acctbal) AS hi FROM customer),
b AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(LEAST(9, FLOOR((c_acctbal - lo) * 10.0 / (hi - lo))) AS BIGINT) AS bin
  FROM customer, mm
),
class_bin AS (
  SELECT c_nationkey, c_mktsegment, bin, COUNT(*) AS ncb
  FROM b GROUP BY 1, 2, 3
),
class_tot AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS nc FROM b GROUP BY 1, 2
),
glob_bin AS (SELECT bin, COUNT(*) AS nb FROM b GROUP BY 1),
glob_tot AS (SELECT COUNT(*) AS n, MAX(bin) AS bmax FROM b),
grid AS (
  SELECT ct.c_nationkey, ct.c_mktsegment, gb.bin, ct.nc, gt.bmax,
         CAST(ROUND(CAST(COALESCE(cb.ncb, 0) AS DOUBLE) / CAST(ct.nc AS DOUBLE)
                    - CAST(gb.nb AS DOUBLE) / CAST(gt.n AS DOUBLE), 9)
              AS DECIMAL(28,9)) AS d
  FROM class_tot ct
  CROSS JOIN glob_bin gb
  LEFT JOIN class_bin cb
    ON cb.c_nationkey = ct.c_nationkey
   AND cb.c_mktsegment = ct.c_mktsegment AND cb.bin = gb.bin
  CROSS JOIN glob_tot gt
),
cum AS (
  SELECT g.c_nationkey, g.c_mktsegment, g.nc, g.bmax, b2.bin AS b2,
         SUM(g.d) AS cd
  FROM grid g JOIN (SELECT bin FROM glob_bin) b2 ON g.bin <= b2.bin
  WHERE b2.bin < g.bmax
  GROUP BY 1, 2, 3, 4, 5
)
SELECT c_nationkey, c_mktsegment,
       CAST(MAX(nc) AS BIGINT) AS class_size,
       ROUND(CAST(SUM(CAST(ABS(cd) AS DECIMAL(28,9))) AS DOUBLE)
             / CAST(MAX(bmax) AS DOUBLE), 6) AS t_distance
FROM cum GROUP BY 1, 2
"""

QUERIES["t_closeness_audit"] = q_t_closeness_audit
ORACLES["t_closeness_audit"] = ORACLE_T_CLOSENESS


# --- One-way ANOVA F across market segments (round 11) ------------------


def q_anova_oneway_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F: does mean account balance differ across market
    segments? Classic sum-of-squares identity on EXACT scaled-int
    decimal sums — SSB = Σ_g S_g²/n_g − S²/N, SSW = Q − Σ_g S_g²/n_g
    with S_g = Σy, Q = Σy² (y = balance·100 as int, so every per-group
    sum is exact; the scale factor cancels in F and η²). The ≤|segments|
    per-group terms fold in pinned segment order (the catalog's fold
    discipline); everything after is correctly-rounded scalar IEEE.

    100 TB shape: ONE map-side-combined segment aggregate (≤5 rows)
    and a 1-row fold. No window, no join, nothing quadratic."""
    cust = read_table(spark, sf_dir, "customer")
    DEC = "decimal(38,0)"
    y = F.round(F.col("c_acctbal") * 100.0, 0).cast("long")
    g = cust.select(F.col("c_mktsegment").alias("seg"), y.alias("y")).groupBy(
        "seg"
    ).agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum(F.col("y").cast(DEC)).alias("sg"),
        F.sum((F.col("y") * F.col("y")).cast(DEC)).alias("qg"),
    )
    sgd = F.col("sg").cast("double")
    term = sgd * sgd / F.col("ng").cast("double")
    folded = g.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("seg"), term.alias("t")))),
            F.lit(0.0),
            lambda acc, s: acc + s["t"],
        ).alias("sb_terms"),
        F.count(F.lit(1)).alias("k"),
        F.sum("ng").alias("n"),
        F.sum("sg").alias("s"),
        F.sum("qg").alias("q"),
    )
    nD = F.col("n").cast("double")
    sD = F.col("s").cast("double")
    ssb = F.col("sb_terms") - sD * sD / nD
    ssw = F.col("q").cast("double") - F.col("sb_terms")
    fstat = (ssb / (F.col("k") - 1).cast("double")) / (
        ssw / (nD - F.col("k").cast("double"))
    )
    return folded.select(
        F.col("n").cast("long").alias("n_cust"),
        (F.col("k") - 1).cast("long").alias("dof_between"),
        (F.col("n") - F.col("k")).cast("long").alias("dof_within"),
        F.round(fstat, 6).alias("f_stat"),
        F.round(ssb / (ssb + ssw), 6).alias("eta_sq"),
    )


ORACLE_ANOVA = """
WITH g AS (
  SELECT c_mktsegment AS seg, COUNT(*) AS ng,
         SUM(CAST(CAST(ROUND(c_acctbal * 100.0, 0) AS BIGINT) AS DECIMAL(38,0))) AS sg,
         SUM(CAST(CAST(ROUND(c_acctbal * 100.0, 0) AS BIGINT)
                  * CAST(ROUND(c_acctbal * 100.0, 0) AS BIGINT) AS DECIMAL(38,0))) AS qg
  FROM customer GROUP BY 1
), folded AS (
  SELECT list_reduce(
           list_prepend(0.0, list(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                                  / CAST(ng AS DOUBLE) ORDER BY seg)),
           (acc, t) -> acc + t) AS sb_terms,
         COUNT(*) AS k, SUM(ng) AS n, SUM(sg) AS s, SUM(qg) AS q
  FROM g
)
SELECT CAST(n AS BIGINT) AS n_cust,
       CAST(k - 1 AS BIGINT) AS dof_between,
       CAST(n - k AS BIGINT) AS dof_within,
       ROUND((sb_terms - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             / CAST(k - 1 AS DOUBLE)
             / ((CAST(q AS DOUBLE) - sb_terms) / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 6) AS f_stat,
       ROUND((sb_terms - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             / ((sb_terms - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                + (CAST(q AS DOUBLE) - sb_terms)), 6) AS eta_sq
FROM folded
"""

QUERIES["anova_oneway_balance"] = q_anova_oneway_balance
ORACLES["anova_oneway_balance"] = ORACLE_ANOVA


# --- Brown–Forsythe (median-based Levene) homogeneity test (round 11) ---


def q_brown_forsythe_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe test (Levene with the median center): are
    balance VARIANCES homogeneous across market segments? Per-group
    LOWER MEDIAN (the exact order statistic at rank (n+1) div 2 —
    engine-identical, no interpolation) via the grouped rank device,
    then one-way ANOVA F on z = |y − med_g| in the exact scaled-int
    domain (z is an int, so all sums are exact decimals and the scale
    cancels in F).

    100 TB shape: the device replaces the per-segment n/|segments|
    single-task sort (slope-bucketed parallel cells); the ≤|segments|
    median frame re-attaches via an unhinted equi-join the planner
    broadcasts; the F fold is the pinned ≤5-term array fold. Cites
    rankdev.grouped_row_number — same contract as theil_sen_trend."""
    from kg_etl_spark.operators.rankdev import grouped_row_number

    cust = read_table(spark, sf_dir, "customer")
    DEC = "decimal(38,0)"
    rows = cust.select(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_custkey").alias("cid"),
        F.round(F.col("c_acctbal") * 100.0, 0).cast("long").alias("y"),
    ).lineage_cut(eager=True)
    ranked = grouped_row_number(
        rows, ["seg"], "y", ["cid"], out_col="rn", count_col="ng"
    )
    med = ranked.filter(F.col("rn") == F.expr("(ng + 1) div 2")).select(
        "seg", F.col("y").alias("med")
    )
    z = rows.join(med, "seg").select(
        "seg", F.abs(F.col("y") - F.col("med")).alias("z")
    )
    g = z.groupBy("seg").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum(F.col("z").cast(DEC)).alias("sg"),
        F.sum((F.col("z") * F.col("z")).cast(DEC)).alias("qg"),
    )
    sgd = F.col("sg").cast("double")
    term = sgd * sgd / F.col("ng").cast("double")
    folded = g.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("seg"), term.alias("t")))),
            F.lit(0.0),
            lambda acc, s: acc + s["t"],
        ).alias("sb_terms"),
        F.count(F.lit(1)).alias("k"),
        F.sum("ng").alias("n"),
        F.sum("sg").alias("s"),
        F.sum("qg").alias("q"),
    )
    nD = F.col("n").cast("double")
    sD = F.col("s").cast("double")
    ssb = F.col("sb_terms") - sD * sD / nD
    ssw = F.col("q").cast("double") - F.col("sb_terms")
    fstat = (ssb / (F.col("k") - 1).cast("double")) / (
        ssw / (nD - F.col("k").cast("double"))
    )
    return folded.select(
        F.col("n").cast("long").alias("n_cust"),
        (F.col("k") - 1).cast("long").alias("dof_between"),
        (F.col("n") - F.col("k")).cast("long").alias("dof_within"),
        F.round(fstat, 6).alias("bf_stat"),
    )


ORACLE_BROWN_FORSYTHE = """
WITH rows_ AS (
  SELECT c_mktsegment AS seg, c_custkey AS cid,
         CAST(ROUND(c_acctbal * 100.0, 0) AS BIGINT) AS y
  FROM customer
), ranked AS (
  SELECT seg, y,
         ROW_NUMBER() OVER (PARTITION BY seg ORDER BY y, cid) AS rn,
         COUNT(*) OVER (PARTITION BY seg) AS ng
  FROM rows_
), med AS (
  SELECT seg, y AS med FROM ranked WHERE rn = (ng + 1) // 2
), z AS (
  SELECT r.seg, ABS(r.y - m.med) AS z FROM rows_ r JOIN med m USING (seg)
), g AS (
  SELECT seg, COUNT(*) AS ng,
         SUM(CAST(z AS DECIMAL(38,0))) AS sg,
         SUM(CAST(z * z AS DECIMAL(38,0))) AS qg
  FROM z GROUP BY 1
), folded AS (
  SELECT list_reduce(
           list_prepend(0.0, list(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                                  / CAST(ng AS DOUBLE) ORDER BY seg)),
           (acc, t) -> acc + t) AS sb_terms,
         COUNT(*) AS k, SUM(ng) AS n, SUM(sg) AS s, SUM(qg) AS q
  FROM g
)
SELECT CAST(n AS BIGINT) AS n_cust,
       CAST(k - 1 AS BIGINT) AS dof_between,
       CAST(n - k AS BIGINT) AS dof_within,
       ROUND((sb_terms - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             / CAST(k - 1 AS DOUBLE)
             / ((CAST(q AS DOUBLE) - sb_terms) / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 6) AS bf_stat
FROM folded
"""

QUERIES["brown_forsythe_balance"] = q_brown_forsythe_balance
ORACLES["brown_forsythe_balance"] = ORACLE_BROWN_FORSYTHE


# --- Kendall tau-b daily trend per event type (round 11) ----------------


def q_kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall rank correlation (tau-b) between day and daily event
    count per event type — the concordance-based sibling of
    `theil_sen_trend` (same calendar-bounded D² pair frame) and the
    third rank-correlation family member next to Spearman. Days are
    distinct within a type, so T_x = 0 and
        tau_b = (C − D) / sqrt(n0 · (n0 − T_y)),
    with C/D/T_y counted directly on the d1 < d2 pair stream (T_y =
    Σ t(t−1)/2 over tied counts, equal by construction to the tied
    pairs the stream sees). Integer-exact until the final √/÷.

    100 TB shape: the daily series is calendar-bounded MODEL STATE, so
    the per-type pair fan-out is D² bounded by the calendar — the
    theil_sen/holt contract; corpus-scale work is the one daily hash
    aggregate, and the pair stream reduces in ONE map-side-combined
    per-type aggregate (no window, no device needed)."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        (F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long").alias("day"),
    ).agg(F.count(F.lit(1)).alias("c"))
    a = daily.select("event_type", F.col("day").alias("d1"), F.col("c").alias("c1"))
    b = daily.select("event_type", F.col("day").alias("d2"), F.col("c").alias("c2"))
    pairs = a.join(b, "event_type").filter(F.col("d1") < F.col("d2"))
    agg = pairs.groupBy("event_type").agg(
        F.sum((F.col("c2") > F.col("c1")).cast("long")).alias("cc"),
        F.sum((F.col("c2") < F.col("c1")).cast("long")).alias("dd"),
        F.sum((F.col("c2") == F.col("c1")).cast("long")).alias("ty"),
        F.count(F.lit(1)).alias("n0"),
    )
    num = (F.col("cc") - F.col("dd")).cast("double")
    den = F.sqrt(F.col("n0").cast("double")) * F.sqrt(
        (F.col("n0") - F.col("ty")).cast("double")
    )
    return agg.select(
        "event_type",
        F.col("n0").alias("n_pairs"),
        F.when(den > 0, F.round(num / den, 6)).alias("tau_b"),
    ).orderBy("event_type")


ORACLE_KENDALL = """
WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS c
  FROM events GROUP BY 1, 2
), pairs AS (
  SELECT a.event_type, a.c AS c1, b.c AS c2
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.day < b.day
), agg AS (
  SELECT event_type,
         SUM(CASE WHEN c2 > c1 THEN 1 ELSE 0 END) AS cc,
         SUM(CASE WHEN c2 < c1 THEN 1 ELSE 0 END) AS dd,
         SUM(CASE WHEN c2 = c1 THEN 1 ELSE 0 END) AS ty,
         COUNT(*) AS n0
  FROM pairs GROUP BY 1
)
SELECT event_type, CAST(n0 AS BIGINT) AS n_pairs,
       CASE WHEN SQRT(CAST(n0 AS DOUBLE)) * SQRT(CAST(n0 - ty AS DOUBLE)) > 0
            THEN ROUND(CAST(cc - dd AS DOUBLE)
                       / (SQRT(CAST(n0 AS DOUBLE)) * SQRT(CAST(n0 - ty AS DOUBLE))), 6)
            END AS tau_b
FROM agg ORDER BY event_type
"""

QUERIES["kendall_tau_daily"] = q_kendall_tau_daily
ORACLES["kendall_tau_daily"] = ORACLE_KENDALL


# --- Friedman test over month blocks x order priorities (round 11) ------


def q_friedman_priority_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test (JASA 1937): do order priorities differ in
    mean order value, treating each calendar month as a matched block?
    Observation = per-(month, priority) mean total price (exact
    decimal sum → correctly-rounded double division, engine-exact);
    only COMPLETE blocks (all k priorities present) enter, per the
    test's matched design. Within-block average-ranks are computed
    over the collected k-element array with higher-order functions —
    rank_j = 1 + #{v < v_j} + (#{v = v_j} − 1)/2 — so there is NO
    window anywhere; ranks are multiples of 0.5 (binary-exact), rank
    sums R_j are exact doubles, and
        chi2_F = 12/(n·k·(k+1)) · Σ R_j² − 3·n·(k+1),
        W = chi2_F / (n·(k−1))   (Kendall's concordance).
    The Σ R_j² fold is the pinned ≤k-term array fold.

    100 TB shape: months × priorities is calendar-bounded MODEL STATE
    (the theil_sen contract); corpus-scale work is ONE hash aggregate.
    The global treatment count k attaches as a 1-row broadcast
    scalar."""
    orders = read_table(spark, sf_dir, "orders")
    DEC = "decimal(38,0)"
    # NOTE (r12, measured and REJECTED): cutting `cells` lazily and
    # deriving k from it removed the duplicate corpus aggregate but ran
    # 0.58 -> 0.75 s at sf0.1 — the k1 scan previously overlapped the
    # cells aggregate as an independent AQE stage, and the cut
    # serialized them (guide §1.3: the parallel duplicate stays).
    cells = orders.groupBy(
        F.trunc("o_orderdate", "month").alias("m"),
        F.col("o_orderpriority").alias("prio"),
    ).agg(
        (
            F.sum(F.round(F.col("o_totalprice") * 100.0, 0).cast("long").cast(DEC))
            .cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("v")
    )
    k1 = orders.agg(
        F.count_distinct("o_orderpriority").cast("long").alias("k")
    )
    blocks = (
        cells.groupBy("m")
        .agg(F.collect_list(F.struct("prio", "v")).alias("arr"))
        .crossJoin(F.broadcast(k1))
        .filter(F.size("arr") == F.col("k"))
    )
    ranked = blocks.select(
        "m",
        "k",
        F.explode(
            F.transform(
                "arr",
                lambda s: F.struct(
                    s["prio"].alias("prio"),
                    (
                        F.lit(1.0)
                        + F.size(
                            F.filter(F.col("arr"), lambda x: x["v"] < s["v"])
                        ).cast("double")
                        + (
                            F.size(
                                F.filter(F.col("arr"), lambda x: x["v"] == s["v"])
                            ).cast("double")
                            - 1.0
                        )
                        / 2.0
                    ).alias("r"),
                ),
            )
        ).alias("pr"),
    )
    per_t = ranked.groupBy(F.col("pr.prio").alias("prio")).agg(
        F.sum("pr.r").alias("rj"), F.count(F.lit(1)).alias("n"), F.max("k").alias("k")
    )
    folded = per_t.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("prio"), (F.col("rj") * F.col("rj")).alias("t"))
                )
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["t"],
        ).alias("sr2"),
        F.max("n").alias("n"),
        F.max("k").alias("k"),
    )
    nD, kD = F.col("n").cast("double"), F.col("k").cast("double")
    chi2 = F.lit(12.0) / (nD * kD * (kD + 1.0)) * F.col("sr2") - 3.0 * nD * (
        kD + 1.0
    )
    return folded.select(
        F.col("n").cast("long").alias("n_blocks"),
        F.col("k").cast("long").alias("k_treatments"),
        F.round(chi2, 6).alias("chi2_f"),
        F.round(chi2 / (nD * (kD - 1.0)), 6).alias("kendall_w"),
    )


ORACLE_FRIEDMAN = """
WITH cells AS (
  SELECT date_trunc('month', o_orderdate) AS m, o_orderpriority AS prio,
         CAST(SUM(CAST(CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT)
                       AS DECIMAL(38,0))) AS DOUBLE) / COUNT(*) AS v
  FROM orders GROUP BY 1, 2
), k1 AS (SELECT COUNT(DISTINCT o_orderpriority) AS k FROM orders),
blocks AS (
  SELECT m, list({'prio': prio, 'v': v}) AS arr FROM cells GROUP BY m
), complete AS (
  SELECT m, arr, k FROM blocks CROSS JOIN k1 WHERE len(arr) = k
), ranked AS (
  SELECT m, k,
         unnest(list_transform(arr, s -> {'prio': s.prio,
           'r': 1.0 + len(list_filter(arr, x -> x.v < s.v))
               + (len(list_filter(arr, x -> x.v = s.v)) - 1.0) / 2.0
         })) AS pr
  FROM complete
), per_t AS (
  SELECT pr.prio AS prio, SUM(pr.r) AS rj, COUNT(*) AS n, MAX(k) AS k
  FROM ranked GROUP BY 1
), folded AS (
  SELECT list_reduce(list_prepend(0.0, list(rj * rj ORDER BY prio)),
                     (acc, t) -> acc + t) AS sr2,
         MAX(n) AS n, MAX(k) AS k
  FROM per_t
)
SELECT CAST(n AS BIGINT) AS n_blocks, CAST(k AS BIGINT) AS k_treatments,
       ROUND(12.0 / (n * k * (k + 1.0)) * sr2 - 3.0 * n * (k + 1.0), 6) AS chi2_f,
       ROUND((12.0 / (n * k * (k + 1.0)) * sr2 - 3.0 * n * (k + 1.0))
             / (n * (k - 1.0)), 6) AS kendall_w
FROM folded
"""

QUERIES["friedman_priority_months"] = q_friedman_priority_months
ORACLES["friedman_priority_months"] = ORACLE_FRIEDMAN


# --- Log-rank test between user arms (round 11) -------------------------


def q_log_rank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank (Mantel–Cox) test between two user arms (user_id
    parity — the deterministic A/B assignment) on the same
    churn-lifetime construction as `q_kaplan_meier_retention` (t =
    days between first and last event; the final 7 days are
    right-censored): at every pooled churn time, observed arm-A
    deaths vs the hypergeometric expectation E = d·n_A/n and variance
    d·(n_A/n)(1−n_A/n)(n−d)/(n−1), summed into the classic
        chi2 = (O_A − E_A)² / V.
    Per-time double terms fold in pinned time order (the catalog's
    fold discipline); counts stay integers until the E/V divisions.

    100 TB shape: per-user aggregate → lifetime-grain frame (t is
    calendar-bounded MODEL STATE, the KM contract); the at-risk
    counts come from ONE cumulative window over the ≤2·|lifetimes|
    grid, not a per-time re-scan."""
    ev = read_table(spark, sf_dir, "events")
    day = (F.unix_micros(F.col("ts")) / F.lit(DAY_US)).cast("long")
    # the per-user lifetime aggregate feeds THREE consumers (the
    # max-day scalar, exits via lab, tot via lab) — without a cut the
    # corpus aggregate ran once per consumer (r12; guide §1.2). LAZY:
    # the max-day broadcast build materializes it inline.
    per_user = ev.select(
        "user_id", day.alias("day")
    ).groupBy("user_id").agg(
        F.min("day").alias("first_day"), F.max("day").alias("last_day")
    ).lineage_cut(eager=False)
    max_day = per_user.agg(F.max("last_day").alias("mx"))
    lab = per_user.crossJoin(F.broadcast(max_day)).select(
        (F.col("user_id") % 2).alias("grp"),
        (F.col("last_day") - F.col("first_day")).alias("t"),
        F.when(F.col("last_day") <= F.col("mx") - 7, F.lit(1))
        .otherwise(F.lit(0))
        .alias("churn"),
    )
    # LAZY (r12): exits' two consumers (pooled grid, at-risk join) sit
    # inside the query's one action — eager paid a standalone
    # scheduling round for the same blocks
    exits = lab.groupBy("grp", "t").agg(
        F.count(F.lit(1)).alias("exits"), F.sum("churn").alias("d")
    ).lineage_cut(eager=False)
    tot = lab.groupBy("grp").agg(F.count(F.lit(1)).alias("n_grp"))
    pooled = exits.select("t").distinct()
    grid = pooled.join(tot)  # |lifetimes| x 2 model-sized cross
    wt = Window.partitionBy("grp").orderBy("t")
    atrisk = (
        grid.join(exits, ["grp", "t"], "left")
        .select(
            "grp",
            "t",
            "n_grp",
            F.coalesce(F.col("exits"), F.lit(0)).alias("exits"),
            F.coalesce(F.col("d"), F.lit(0)).alias("d"),
        )
        .withColumn(
            "n_at_risk",
            F.col("n_grp")
            - F.coalesce(
                F.sum("exits").over(
                    wt.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
    )
    per_t = atrisk.groupBy("t").agg(
        F.sum("d").alias("dt"),
        F.sum("n_at_risk").alias("nt"),
        F.sum(F.when(F.col("grp") == 0, F.col("d")).otherwise(F.lit(0))).alias("da"),
        F.sum(
            F.when(F.col("grp") == 0, F.col("n_at_risk")).otherwise(F.lit(0))
        ).alias("na"),
    ).filter(F.col("dt") > 0)
    dtD, ntD, naD = (
        F.col("dt").cast("double"),
        F.col("nt").cast("double"),
        F.col("na").cast("double"),
    )
    e_term = dtD * naD / ntD
    v_term = F.when(
        F.col("nt") > 1,
        dtD
        * (naD / ntD)
        * (1.0 - naD / ntD)
        * (ntD - dtD)
        / (ntD - 1.0),
    ).otherwise(F.lit(0.0))
    folded = per_t.agg(
        F.sum("da").alias("o1"),
        F.count(F.lit(1)).alias("n_times"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("t"), e_term.alias("e"), v_term.alias("v"))
                )
            ),
            F.struct(F.lit(0.0).alias("e"), F.lit(0.0).alias("v")),
            lambda acc, s: F.struct(
                (acc["e"] + s["e"]).alias("e"), (acc["v"] + s["v"]).alias("v")
            ),
        ).alias("ev"),
    )
    o1D = F.col("o1").cast("double")
    return folded.select(
        F.col("o1").cast("long").alias("observed_a"),
        F.round(F.col("ev.e"), 6).alias("expected_a"),
        F.col("n_times").cast("long").alias("n_churn_times"),
        F.round(
            (o1D - F.col("ev.e")) * (o1D - F.col("ev.e")) / F.col("ev.v"), 6
        ).alias("chi2"),
    )


ORACLE_LOG_RANK = """
WITH per_user AS (
  SELECT user_id, MIN(epoch_us(ts) // 86400000000) AS first_day,
         MAX(epoch_us(ts) // 86400000000) AS last_day
  FROM events GROUP BY user_id
), mx AS (SELECT MAX(last_day) AS mx FROM per_user),
lab AS (
  SELECT user_id % 2 AS grp, last_day - first_day AS t,
         CASE WHEN last_day <= mx - 7 THEN 1 ELSE 0 END AS churn
  FROM per_user CROSS JOIN mx
), exits AS (
  SELECT grp, t, COUNT(*) AS exits, SUM(churn) AS d FROM lab GROUP BY 1, 2
), tot AS (SELECT grp, COUNT(*) AS n_grp FROM lab GROUP BY grp),
pooled AS (SELECT DISTINCT t FROM exits),
grid AS (SELECT p.t, tt.grp, tt.n_grp FROM pooled p CROSS JOIN tot tt),
atrisk AS (
  SELECT g.grp, g.t, g.n_grp,
         COALESCE(e.exits, 0) AS exits, COALESCE(e.d, 0) AS d,
         g.n_grp - COALESCE(SUM(COALESCE(e.exits, 0)) OVER (
           PARTITION BY g.grp ORDER BY g.t
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_at_risk
  FROM grid g LEFT JOIN exits e ON e.grp = g.grp AND e.t = g.t
), per_t AS (
  SELECT t, SUM(d) AS dt, SUM(n_at_risk) AS nt,
         SUM(CASE WHEN grp = 0 THEN d ELSE 0 END) AS da,
         SUM(CASE WHEN grp = 0 THEN n_at_risk ELSE 0 END) AS na
  FROM atrisk GROUP BY t HAVING SUM(d) > 0
), folded AS (
  SELECT SUM(da) AS o1, COUNT(*) AS n_times,
         list_reduce(list_prepend(0.0,
           list(CAST(dt AS DOUBLE) * na / nt ORDER BY t)), (a, b) -> a + b) AS e1,
         list_reduce(list_prepend(0.0,
           list(CASE WHEN nt > 1
                     THEN CAST(dt AS DOUBLE) * (CAST(na AS DOUBLE) / nt)
                          * (1.0 - CAST(na AS DOUBLE) / nt)
                          * (nt - CAST(dt AS DOUBLE)) / (nt - 1.0)
                     ELSE 0.0 END ORDER BY t)), (a, b) -> a + b) AS v
  FROM per_t
)
SELECT CAST(o1 AS BIGINT) AS observed_a,
       ROUND(e1, 6) AS expected_a,
       CAST(n_times AS BIGINT) AS n_churn_times,
       ROUND((o1 - e1) * (o1 - e1) / v, 6) AS chi2
FROM folded
"""

QUERIES["log_rank_test"] = q_log_rank_test
ORACLES["log_rank_test"] = ORACLE_LOG_RANK


# --- Anderson-Darling two-sample (tie-aware midrank form; round 11) -----


def q_anderson_darling_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Anderson–Darling statistic (Scholz–Stephens 1987,
    the tie-aware midrank form A²_akN, k=2) between the 'click' and
    'view' value distributions — KS's tail-sensitive sibling on the
    IDENTICAL scale path (`q_ks_two_sample`'s distinct-value aggregate
    + the two-phase exact cumsum device): per distinct pooled value z
    with multiplicities m₁/m₂ (l = m₁+m₂), inclusive cumulatives
    a₁/a₂ (b = a₁+a₂), midranks Mᵢ = aᵢ − mᵢ/2 and B = b − l/2,
        A² = (N−1)/N · Σ_z (l/N) Σᵢ (N·Mᵢ − nᵢ·B)² / nᵢ
                               / (B(N−B) − N·l/4).
    Midranks are integer halves (binary-exact); the per-value double
    terms round to 9 dp and sum as DECIMAL(38,9) — the KM/chi-square
    order-independent float idiom, required here because the value
    grain is corpus-scale (a pinned collect-fold would not be).

    100 TB shape: identical to ks_two_sample — one distinct-value
    aggregate, the cumsum device, one decimal total. No window beyond
    the device's range cells, nothing collected."""
    from kg_etl_spark.operators.rankdev import global_cumsum

    ev = read_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    per_v = ev.groupBy("value").agg(
        F.sum((F.col("event_type") == "click").cast("long")).alias("m1"),
        F.sum((F.col("event_type") == "view").cast("long")).alias("m2"),
    ).lineage_cut(eager=True)
    tot = per_v.agg(F.sum("m1").alias("n1"), F.sum("m2").alias("n2"))
    cum = global_cumsum(per_v, "value", ["m1", "m2"], prefix="_a")
    j = cum.crossJoin(F.broadcast(tot))
    n1D, n2D = F.col("n1").cast("double"), F.col("n2").cast("double")
    nD = n1D + n2D
    lD = (F.col("m1") + F.col("m2")).cast("double")
    m1D, m2D = F.col("m1").cast("double"), F.col("m2").cast("double")
    b = (F.col("_am1") + F.col("_am2")).cast("double") - lD / 2.0
    M1 = F.col("_am1").cast("double") - m1D / 2.0
    M2 = F.col("_am2").cast("double") - m2D / 2.0
    den = b * (nD - b) - nD * lD / 4.0
    inner = (
        (nD * M1 - n1D * b) * (nD * M1 - n1D * b) / n1D
        + (nD * M2 - n2D * b) * (nD * M2 - n2D * b) / n2D
    )
    term = F.when(den > 0, (lD / nD) * inner / den).otherwise(F.lit(0.0))
    totals = j.groupBy("n1", "n2").agg(
        F.sum(F.round(term, 9).cast("decimal(38,9)")).alias("s")
    )
    nD2 = (F.col("n1") + F.col("n2")).cast("double")
    return totals.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.round((nD2 - 1.0) / nD2 * F.col("s").cast("double"), 6).alias(
            "a2_akn"
        ),
    )


ORACLE_ANDERSON_DARLING = """
WITH per_v AS (
  SELECT value,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS m1,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS m2
  FROM events WHERE event_type IN ('click', 'view')
  GROUP BY value
), tot AS (SELECT CAST(SUM(m1) AS BIGINT) AS n1, CAST(SUM(m2) AS BIGINT) AS n2 FROM per_v),
cum AS (
  SELECT m1, m2,
         CAST(SUM(m1) OVER w AS BIGINT) AS a1, CAST(SUM(m2) OVER w AS BIGINT) AS a2
  FROM per_v
  WINDOW w AS (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), terms AS (
  SELECT n1, n2,
         CAST(ROUND(
           CASE WHEN (a1 + a2 - (m1 + m2) / 2.0)
                     * (n1 + n2 - (a1 + a2 - (m1 + m2) / 2.0))
                     - (n1 + n2) * (m1 + m2) / 4.0 > 0
                THEN (CAST(m1 + m2 AS DOUBLE) / (n1 + n2))
                     * (((n1 + n2) * (a1 - m1 / 2.0) - n1 * (a1 + a2 - (m1 + m2) / 2.0))
                        * ((n1 + n2) * (a1 - m1 / 2.0) - n1 * (a1 + a2 - (m1 + m2) / 2.0)) / n1
                        + ((n1 + n2) * (a2 - m2 / 2.0) - n2 * (a1 + a2 - (m1 + m2) / 2.0))
                        * ((n1 + n2) * (a2 - m2 / 2.0) - n2 * (a1 + a2 - (m1 + m2) / 2.0)) / n2)
                     / ((a1 + a2 - (m1 + m2) / 2.0)
                        * (n1 + n2 - (a1 + a2 - (m1 + m2) / 2.0))
                        - (n1 + n2) * (m1 + m2) / 4.0)
                ELSE 0.0 END, 9) AS DECIMAL(38,9)) AS term
  FROM cum CROSS JOIN tot
)
SELECT n1, n2,
       ROUND((n1 + n2 - 1.0) / (n1 + n2) * CAST(SUM(term) AS DOUBLE), 6) AS a2_akn
FROM terms GROUP BY n1, n2
"""

QUERIES["anderson_darling_two_sample"] = q_anderson_darling_two_sample
ORACLES["anderson_darling_two_sample"] = ORACLE_ANDERSON_DARLING


# --- Holm-Bonferroni step-down over nations (round 11) ------------------


def q_holm_bonferroni_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holm–Bonferroni step-down (Holm 1979) on the same per-nation
    Chebyshev-bound p-values as `q_bh_fdr_nations` — the FWER control
    next to BH's FDR control, completing the multiple-testing family:
    walk p-values ascending; the FIRST rank j with p_(j) > α/(m−j+1)
    stops the procedure and everything before it is rejected. The
    Chebyshev bound keeps every comparison rational IEEE (no libm erf
    ulp-flips), so the discrete reject set is bit-stable cross-engine.

    100 TB shape: one nation-keyed decimal power-sum aggregate, a
    1-row roll-up, and step-down windows over the m = |nations|
    MODEL-SIZED frame (the documented partition-less exception class,
    same as BH)."""
    cust = read_table(spark, sf_dir, "customer")
    p6 = lambda k: F.round(F.col("c_acctbal") ** k, 6).cast("decimal(28,6)")
    per = cust.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(p6(1)).alias("s1"),
        F.sum(p6(2)).alias("s2"),
    )
    glob = per.agg(
        F.sum("n").alias("_N"), F.sum("s1").alias("_S1"), F.sum("s2").alias("_S2")
    )
    j = per.crossJoin(F.broadcast(glob))
    gm = F.col("_S1").cast("double") / F.col("_N").cast("double")
    gvar = F.col("_S2").cast("double") / F.col("_N").cast("double") - gm * gm
    z = (F.col("s1").cast("double") / F.col("n").cast("double") - gm) / F.sqrt(
        gvar / F.col("n").cast("double")
    )
    scored = j.select(
        "c_nationkey",
        F.col("n").cast("long").alias("n_cust"),
        z.alias("_z"),
    ).withColumn(
        "_p",
        F.when(
            F.col("_z") * F.col("_z") > 1.0, 1.0 / (F.col("_z") * F.col("_z"))
        ).otherwise(F.lit(1.0)),
    )
    m = 25  # TPC-H nation domain — fixed test count, pinned in the oracle
    alpha = 0.10
    wr = Window.orderBy(F.col("_p").asc(), F.col("c_nationkey").asc())
    ranked = scored.withColumn("rk", F.row_number().over(wr).cast("long"))
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    thresh = F.lit(alpha) / (F.lit(m) - F.col("rk") + 1).cast("double")
    first_fail = F.min(F.when(F.col("_p") > thresh, F.col("rk"))).over(wall)
    return ranked.select(
        "c_nationkey",
        "n_cust",
        F.round("_z", 6).alias("z"),
        F.round("_p", 6).alias("p_bound"),
        "rk",
        F.round(thresh, 6).alias("holm_alpha"),
        (F.col("rk") < F.coalesce(first_fail, F.lit(m + 1))).alias("rejected"),
    )


ORACLE_HOLM = """
WITH per AS (
  SELECT c_nationkey, COUNT(*) AS n,
         SUM(CAST(ROUND(c_acctbal, 6) AS DECIMAL(28,6))) AS s1,
         SUM(CAST(ROUND(c_acctbal * c_acctbal, 6) AS DECIMAL(28,6))) AS s2
  FROM customer GROUP BY c_nationkey
), gtot AS (
  SELECT SUM(n) AS N, SUM(s1) AS S1, SUM(s2) AS S2 FROM per
), scored AS (
  SELECT p.c_nationkey, p.n,
         (CAST(p.s1 AS DOUBLE) / CAST(p.n AS DOUBLE)
          - CAST(g.S1 AS DOUBLE) / CAST(g.N AS DOUBLE))
         / SQRT((CAST(g.S2 AS DOUBLE) / CAST(g.N AS DOUBLE)
                 - (CAST(g.S1 AS DOUBLE) / CAST(g.N AS DOUBLE))
                   * (CAST(g.S1 AS DOUBLE) / CAST(g.N AS DOUBLE)))
                / CAST(p.n AS DOUBLE)) AS z
  FROM per p, gtot g
), pv AS (
  SELECT c_nationkey, n, z,
         CASE WHEN z * z > 1.0 THEN 1.0 / (z * z) ELSE 1.0 END AS p
  FROM scored
), ranked AS (
  SELECT c_nationkey, n, z, p,
         ROW_NUMBER() OVER (ORDER BY p ASC, c_nationkey ASC) AS rk
  FROM pv
), ff AS (
  SELECT MIN(CASE WHEN p > 0.10 / (25 - rk + 1) THEN rk END) AS first_fail
  FROM ranked
)
SELECT c_nationkey, CAST(n AS BIGINT) AS n_cust,
       ROUND(z, 6) AS z, ROUND(p, 6) AS p_bound, CAST(rk AS BIGINT) AS rk,
       ROUND(0.10 / (25 - rk + 1), 6) AS holm_alpha,
       rk < COALESCE(first_fail, 26) AS rejected
FROM ranked CROSS JOIN ff
"""

QUERIES["holm_bonferroni_nations"] = q_holm_bonferroni_nations
ORACLES["holm_bonferroni_nations"] = ORACLE_HOLM


# --- Durbin-Watson autocorrelation diagnostic (round 11) ----------------


def q_durbin_watson_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin–Watson statistic on the residuals of the per-type daily
    OLS trend (the `ols_trend` construction): DW = Σ(e_t − e_{t−1})² /
    Σ e_t² over consecutive days — the standard "are my trend
    residuals serially correlated" regression diagnostic (≈2 = none,
    →0 positive, →4 negative). Slope/intercept come closed-form from
    exact integer sums; residuals are correctly-rounded doubles; both
    quadratic sums round per-term to 6 dp and fold as DECIMAL(38,6)
    (order-independent).

    100 TB shape: the daily frame is calendar-bounded MODEL STATE —
    one corpus hash aggregate, then a per-type lag window over the
    daily grain (the documented daily-aggregate window class)."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        (F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long").alias("day"),
    ).agg(F.count(F.lit(1)).alias("c"))
    DEC = "decimal(38,0)"
    sums = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("day").cast(DEC)).alias("sx"),
        F.sum(F.col("c").cast(DEC)).alias("sy"),
        F.sum((F.col("day") * F.col("day")).cast(DEC)).alias("sxx"),
        F.sum((F.col("day") * F.col("c")).cast(DEC)).alias("sxy"),
    )
    nD = F.col("n").cast("double")
    b = (
        nD * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / (
        nD * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    a = (F.col("sy").cast("double") - b * F.col("sx").cast("double")) / nD
    fitted = daily.join(
        sums.select("event_type", b.alias("_b"), a.alias("_a")), "event_type"
    ).select(
        "event_type",
        "day",
        (
            F.col("c").cast("double")
            - (F.col("_a") + F.col("_b") * F.col("day").cast("double"))
        ).alias("e"),
    )
    wl = Window.partitionBy("event_type").orderBy("day")
    lagged = fitted.withColumn("e_prev", F.lag("e").over(wl))
    DEC6 = "decimal(38,6)"
    agg = lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.round(F.col("e") * F.col("e"), 6).cast(DEC6)).alias("sse"),
        F.sum(
            F.round(
                (F.col("e") - F.col("e_prev")) * (F.col("e") - F.col("e_prev")), 6
            ).cast(DEC6)
        ).alias("sdd"),
    )
    return agg.select(
        "event_type",
        F.col("n_days").cast("long").alias("n_days"),
        F.round(
            F.col("sdd").cast("double") / F.col("sse").cast("double"), 6
        ).alias("dw"),
    ).orderBy("event_type")


ORACLE_DURBIN_WATSON = """
WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS c
  FROM events GROUP BY 1, 2
), sums AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(CAST(day AS DECIMAL(38,0))) AS sx,
         SUM(CAST(c AS DECIMAL(38,0))) AS sy,
         SUM(CAST(day * day AS DECIMAL(38,0))) AS sxx,
         SUM(CAST(day * c AS DECIMAL(38,0))) AS sxy
  FROM daily GROUP BY event_type
), coef AS (
  SELECT event_type,
         (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b,
         (CAST(sy AS DOUBLE)
          - (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            * CAST(sx AS DOUBLE)) / n AS a
  FROM sums
), resid AS (
  SELECT d.event_type, d.day,
         CAST(d.c AS DOUBLE) - (coef.a + coef.b * d.day) AS e
  FROM daily d JOIN coef USING (event_type)
), lagged AS (
  SELECT event_type, e,
         LAG(e) OVER (PARTITION BY event_type ORDER BY day) AS e_prev
  FROM resid
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(CAST(SUM(CAST(ROUND((e - e_prev) * (e - e_prev), 6) AS DECIMAL(38,6))) AS DOUBLE)
             / CAST(SUM(CAST(ROUND(e * e, 6) AS DECIMAL(38,6))) AS DOUBLE), 6) AS dw
FROM lagged GROUP BY event_type ORDER BY event_type
"""

QUERIES["durbin_watson_daily"] = q_durbin_watson_daily
ORACLES["durbin_watson_daily"] = ORACLE_DURBIN_WATSON
