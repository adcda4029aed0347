"""Relational operator catalog (SURVEY §2.3–2.9) over the TPC-H-ish
testdata, each with a DuckDB oracle.

Determinism: money aggregates go through decimal sums (order-independent
under Spark's arbitrary partial-agg order) and are cast to double at the
edge; ranks always carry a unique-id tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kg_etl_spark.functions.ids import SEP
from kg_etl_spark.functions.stats import bucket, group_zscore
from kg_etl_spark.functions.text import slugify
from kg_etl_spark.session import read_table

DEC = "decimal(28,6)"
DECP = "decimal(18,6)"  # for products: (18,6)x(18,6)=(37,12) fits precision 38 in both engines


def _dsum(c) -> F.Column:
    """Order-independent sum of a double column, returned as double."""
    return F.sum(F.col(c).cast(DEC)).cast("double")


# --- Q: pricing summary (TPC-H Q1 shape; A2/A13, F14) -----------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    disc_price = (F.col("l_extendedprice").cast(DECP) * (F.lit(1).cast(DECP) - F.col("l_discount").cast(DECP)))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity").alias("sum_qty"),
            _dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            (F.sum(F.col("l_quantity").cast(DEC)).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


ORACLE_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS avg_price,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# --- filter + project (P1–P3) -----------------------------------------


def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice").cast(DECP) * (F.lit(1).cast(DECP) - F.col("l_discount").cast(DECP)))
    return (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 10)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(rev, 2).cast("double").alias("revenue"),
        )
    )


ORACLE_FILTER_PROJECT = """
SELECT l_orderkey, l_linenumber,
       CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 10
"""


# --- semi / anti joins (P4, J10, J11, U2) ------------------------------


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    big = read_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    return orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


ORACLE_SEMI = """
SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
"""


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    pending = read_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return cust.join(pending, cust.c_custkey == pending.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


ORACLE_ANTI = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
"""


# --- broadcast dim join (J1/J3) ---------------------------------------


def q_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice").cast(DECP) * (F.lit(1).cast(DECP) - F.col("l_discount").cast(DECP)))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(rev), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


ORACLE_BROADCAST = """
SELECT p_brand,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


# --- multi-hop join (J8; TPC-H Q5 shape) ------------------------------


def q_multi_hop_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = read_table(spark, sf_dir, "region")
    nation = read_table(spark, sf_dir, "nation")
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice").cast(DECP) * (F.lit(1).cast(DECP) - F.col("l_discount").cast(DECP)))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(rev), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


ORACLE_MULTI_HOP = """
SELECT r_name, n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# --- top-k per group (W1/W3/O1/O4) ------------------------------------


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 orders per market segment. c_mktsegment has cardinality 5,
    so the rank rides the two-phase grouped_topk tournament
    (operators/topk.py) — a plain per-segment window would sort n/5 of
    the FACT table in one task at scale (r6 self-audit finding)."""
    from kg_etl_spark.operators.topk import grouped_topk

    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    j = orders.join(cust.select("c_custkey", "c_mktsegment"), orders.o_custkey == F.col("c_custkey"))
    top = grouped_topk(
        j,
        ["c_mktsegment"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        5,
        out_rank="rank",
    )
    return top.select(
        "c_mktsegment", "o_orderkey", "o_totalprice", F.col("rank").cast("long").alias("rank")
    )


ORACLE_TOPK = """
SELECT c_mktsegment, o_orderkey, o_totalprice, rank FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
  FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rank <= 5
"""


# --- nearest-per-entity / min_by (W1) ---------------------------------


def q_min_item_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(F.col("l_extendedprice").asc(), F.col("l_linenumber").asc())
    return (
        li.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


ORACLE_MIN_ITEM = """
SELECT l_orderkey, l_linenumber, l_extendedprice FROM (
  SELECT l_orderkey, l_linenumber, l_extendedprice,
         ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_extendedprice ASC, l_linenumber ASC) AS rn
  FROM lineitem
) WHERE rn = 1
"""


# --- per-group z-score + bucketing (A10–A12, W4) -----------------------


def q_zscore_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    z = group_zscore(cust, "c_nationkey", "c_acctbal", out_col="z")
    return z.select(
        "c_custkey",
        "c_nationkey",
        "z",
        bucket(F.col("z")).alias("tier"),
    )


ORACLE_ZSCORE = """
WITH s AS (
  SELECT c_custkey, c_nationkey, c_acctbal,
         COUNT(*) OVER w AS n,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) OVER w AS DOUBLE) AS s,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(19,6)) * CAST(c_acctbal AS DECIMAL(19,6))) OVER w AS DOUBLE) AS ss
  FROM customer WINDOW w AS (PARTITION BY c_nationkey)
)
SELECT c_custkey, c_nationkey,
       z,
       CASE WHEN z >= 1 THEN 'high' WHEN z >= 0 THEN 'medium' ELSE 'low' END AS tier
FROM (
  SELECT c_custkey, c_nationkey,
         CASE WHEN n > 1 AND (ss - s*s/n) / (n-1) > 0
              THEN (c_acctbal - s/n) / SQRT(GREATEST((ss - s*s/n) / (n-1), 0.0))
              ELSE 0.0 END AS z
  FROM s
)
"""


# --- representative-per-group (A4/O2) ---------------------------------


def q_longest_name_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.length("c_name").desc(), F.col("c_name").asc())
    return (
        cust.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("c_nationkey", F.col("c_name").alias("rep_name"))
    )


ORACLE_LONGEST_NAME = """
SELECT c_nationkey, c_name AS rep_name FROM (
  SELECT c_nationkey, c_name,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY LENGTH(c_name) DESC, c_name ASC) AS rn
  FROM customer
) WHERE rn = 1
"""


# --- distinct / dedup-groupBy (A5) ------------------------------------


def q_distinct_status_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey", "o_orderstatus").agg(
        F.min("o_orderkey").alias("first_order"),
        F.count(F.lit(1)).alias("n_orders"),
    )


ORACLE_DISTINCT_PAIRS = """
SELECT o_custkey, o_orderstatus, MIN(o_orderkey) AS first_order, COUNT(*) AS n_orders
FROM orders GROUP BY o_custkey, o_orderstatus
"""


# --- countDistinct (A6) -----------------------------------------------


def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.count(F.lit(1)).alias("n_orders"),
        _dsum("o_totalprice").alias("total"),
    )


ORACLE_COUNT_DISTINCT = """
SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total
FROM orders GROUP BY o_orderstatus
"""


# --- union of heterogeneous sources (U1, F13) --------------------------


def q_union_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer").select(
        F.concat(F.lit("cust:"), F.col("c_custkey").cast("string")).alias("entity_id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("source"),
    )
    supp = read_table(spark, sf_dir, "supplier").select(
        F.concat(F.lit("supp:"), F.col("s_suppkey").cast("string")).alias("entity_id"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("source"),
    )
    return cust.unionByName(supp)


ORACLE_UNION = """
SELECT 'cust:' || CAST(c_custkey AS VARCHAR) AS entity_id, c_name AS name, c_acctbal AS acctbal, 'customer' AS source FROM customer
UNION ALL
SELECT 'supp:' || CAST(s_suppkey AS VARCHAR) AS entity_id, s_name AS name, s_acctbal AS acctbal, 'supplier' AS source FROM supplier
"""


# --- sorted collect_list (A3) -----------------------------------------


def q_collect_names_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = read_table(spark, sf_dir, "supplier")
    return supp.groupBy("s_nationkey").agg(
        F.concat_ws("|", F.array_sort(F.collect_list("s_name"))).alias("names"),
        F.count(F.lit(1)).alias("n"),
    )


ORACLE_COLLECT = """
SELECT s_nationkey, STRING_AGG(s_name, '|' ORDER BY s_name) AS names, COUNT(*) AS n
FROM supplier GROUP BY s_nationkey
"""


# --- conditional cast / coalesce / json extract (F14/F20/F23, S10) ----


def q_try_cast_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        F.when(F.col("value") > 100, "big").otherwise("small").alias("size_tier"),
        F.col("event_type").isin("signup", "purchase").alias("is_conversion"),
        F.coalesce(F.col("value"), F.lit(0.0)).alias("value_filled"),
    )


ORACLE_TRY_CAST = """
SELECT event_id,
       TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
       CASE WHEN value > 100 THEN 'big' ELSE 'small' END AS size_tier,
       event_type IN ('signup', 'purchase') AS is_conversion,
       COALESCE(value, 0.0) AS value_filled
FROM events
"""


# --- slugify / name normalization (F2/F3) ------------------------------


def q_slugify_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        slugify(F.col("p_name")).alias("name_slug"),
        slugify(F.col("p_type")).alias("type_slug"),
    )


ORACLE_SLUGIFY = r"""
SELECT p_partkey,
       substr(regexp_replace(regexp_replace(regexp_replace(regexp_replace(lower(trim(p_name)), '[/\\]', '-', 'g'), '[^0-9a-z\s-]', '', 'g'), '\s+', '-', 'g'), '-+', '-', 'g'), 1, 120) AS name_slug,
       substr(regexp_replace(regexp_replace(regexp_replace(regexp_replace(lower(trim(p_type)), '[/\\]', '-', 'g'), '[^0-9a-z\s-]', '', 'g'), '\s+', '-', 'g'), '-+', '-', 'g'), 1, 120) AS type_slug
FROM part
"""


# --- regex extraction (F15/F19) ---------------------------------------


def q_extract_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.regexp_extract("o_orderpriority", r"([0-9]+)", 1).cast("int").alias("prio_num"),
    )


ORACLE_EXTRACT = """
SELECT o_orderkey, TRY_CAST(regexp_extract(o_orderpriority, '([0-9]+)', 1) AS INTEGER) AS prio_num
FROM orders
"""


# --- surrogate ids (F12/F13) ------------------------------------------


def q_surrogate_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.md5(
            F.concat_ws(SEP, F.col("o_orderkey").cast("string"), F.col("o_custkey").cast("string"))
        ).alias("sid"),
    )


ORACLE_SURROGATE = """
SELECT o_orderkey, md5(CAST(o_orderkey AS VARCHAR) || chr(31) || CAST(o_custkey AS VARCHAR)) AS sid
FROM orders
"""


# --- priority-coalesced group average (A8) -----------------------------


def q_priority_coalesced_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")

    def seg_avg(seg: str):
        s = F.sum(F.when(F.col("c_mktsegment") == seg, F.col("c_acctbal").cast(DEC))).cast("double")
        n = F.count(F.when(F.col("c_mktsegment") == seg, F.lit(1)))
        return F.when(n > 0, s / n)

    any_avg = F.sum(F.col("c_acctbal").cast(DEC)).cast("double") / F.count(F.lit(1))
    return cust.groupBy("c_nationkey").agg(
        F.coalesce(seg_avg("BUILDING"), seg_avg("AUTOMOBILE"), any_avg).alias("canonical_bal")
    )


ORACLE_PRIORITY_AVG = """
SELECT c_nationkey,
       COALESCE(
         CASE WHEN COUNT(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 END) > 0
              THEN CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN CAST(c_acctbal AS DECIMAL(28,6)) END) AS DOUBLE)
                         / COUNT(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 END) END,
         CASE WHEN COUNT(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 END) > 0
              THEN CAST(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN CAST(c_acctbal AS DECIMAL(28,6)) END) AS DOUBLE)
                         / COUNT(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 END) END,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)
       ) AS canonical_bal
FROM customer GROUP BY c_nationkey
"""


# --- SQL surface (SURVEY §7.2 step 9): one SQL text, both engines -----

# ANSI SQL that parses identically in Spark SQL and DuckDB: the Spark
# side registers the testdata tables as temp views and runs THIS string
# verbatim — demonstrating the spark.sql(...) surface over the same
# pushdown/pruned scans the DataFrame path uses.
SQL_EXISTS_AGG = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45
)
GROUP BY o_orderpriority
"""


def q_sql_exists_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kg_etl_spark.session import register_views

    register_views(spark, sf_dir)
    return spark.sql(SQL_EXISTS_AGG)


# Second one-text query: windows OVER aggregates (rank of each line
# status within its return flag by row count, plus the flag total via a
# windowed re-aggregate) — parses and evaluates identically in Spark
# SQL and DuckDB; total tie-break on l_linestatus.
SQL_WINDOW_RANK = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n,
       CAST(SUM(COUNT(*)) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n_flag,
       RANK() OVER (PARTITION BY l_returnflag ORDER BY COUNT(*) DESC, l_linestatus) AS rnk
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def q_sql_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kg_etl_spark.session import register_views

    register_views(spark, sf_dir)
    return spark.sql(SQL_WINDOW_RANK)


_Q3_CUTOFF = "1998-06-01 00:00:00"


def _ts_lit(df: DataFrame, col: str) -> F.Column:
    """Cutoff literal typed to match the scanned column (parquet ms
    timestamps surface as TIMESTAMP_NTZ under Spark 4's NTZ inference;
    an LTZ-configured session would surface TIMESTAMP) — a typed
    literal keeps the comparison pushable to the scan."""
    t = dict(df.dtypes)[col]
    kind = "TIMESTAMP_NTZ" if t == "timestamp_ntz" else "TIMESTAMP"
    return F.expr(f"{kind} '{_Q3_CUTOFF}'")


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 still-unshipped BUILDING-segment orders by
    revenue. Filters push to all three scans before the joins; the
    top-10 is TakeOrdered on the (exact decimal) revenue. The order
    date is emitted as a formatted wall-clock string — tz-free on both
    engines."""
    cust = read_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = read_table(spark, sf_dir, "orders")
    orders = orders.filter(F.col("o_orderdate") < _ts_lit(orders, "o_orderdate"))
    li = read_table(spark, sf_dir, "lineitem")
    li = li.filter(F.col("l_shipdate") > _ts_lit(li, "l_shipdate"))
    rev = F.col("l_extendedprice").cast(DECP) * (F.lit(1).cast(DECP) - F.col("l_discount").cast(DECP))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
            "o_orderpriority",
        )
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select("l_orderkey", "revenue", "o_date", "o_orderpriority")
    )


ORACLE_SHIPPING_PRIORITY = f"""
SELECT l_orderkey,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '{_Q3_CUTOFF}'
  AND l_shipdate > TIMESTAMP '{_Q3_CUTOFF}'
GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration PageRank over the symmetrized customer↔supplier
    trade graph (who-bought-from-whom via orders⋈lineitem). The
    deterministic fold makes per-node sums bit-identical to the
    oracle's unrolled iterations (see operators/pagerank.py)."""
    from kg_etl_spark.operators.pagerank import pagerank

    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("a"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("b"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    ranks = pagerank(edges, iterations=3, damping=0.85, deterministic=True)
    return ranks.select("node", F.round("rank", 6).alias("pagerank"))


def _pagerank_oracle(iterations: int = 3) -> str:
    """Unrolled power iterations; per-node sums left-fold over
    contributions ordered by src, matching Spark's deterministic path."""
    head = """
WITH pairs AS (
  SELECT DISTINCT 'c:' || o_custkey AS a, 's:' || l_suppkey AS b
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION ALL
  SELECT b AS src, a AS dst FROM pairs
),
outd AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM edges UNION SELECT dst FROM edges),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
r0 AS (SELECT node, 1.0 / n AS rank FROM nodes CROSS JOIN nn)"""
    steps = []
    for i in range(1, iterations + 1):
        steps.append(f""",
c{i} AS (
  SELECT e.dst AS node,
         list_reduce(list_prepend(0.0, list(r.rank / o.outdeg ORDER BY e.src)),
                     (acc, x) -> acc + x) AS s
  FROM edges e JOIN r{i-1} r ON e.src = r.node JOIN outd o ON e.src = o.src
  GROUP BY e.dst
),
r{i} AS (
  SELECT nodes.node, (1.0 - 0.85) / n + 0.85 * coalesce(c{i}.s, 0.0) AS rank
  FROM nodes CROSS JOIN nn LEFT JOIN c{i} ON nodes.node = c{i}.node
)""")
    return head + "".join(steps) + f"""
SELECT node, ROUND(rank, 6) AS pagerank FROM r{iterations}
"""


ORACLE_PAGERANK = _pagerank_oracle(3)


def q_scd2_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 merge (operators/scd.py): bootstrap the customer dimension
    at batch 0, then apply a deterministic update batch (balance bumps
    for key%10==0, no-op re-sends for key%10==1, brand-new keys for
    key%97==0) at batch 1. Returns the full versioned table."""
    from kg_etl_spark.operators.scd import scd2_apply, scd2_init

    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    dim = scd2_init(cust, "c_custkey", ["c_acctbal", "c_mktsegment"], batch_id=0)
    mods = cust.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        (F.col("c_acctbal") + F.lit(100.0)).alias("c_acctbal"),
        "c_mktsegment",
    )
    noops = cust.filter(F.col("c_custkey") % 10 == 1)
    news = cust.filter(F.col("c_custkey") % 97 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
    )
    updates = mods.unionByName(noops).unionByName(news)
    return scd2_apply(dim, updates, "c_custkey", ["c_acctbal", "c_mktsegment"], batch_id=1)


ORACLE_SCD2 = """
WITH cur AS (
  SELECT c_custkey, c_acctbal, c_mktsegment, CAST(0 AS BIGINT) AS valid_from FROM customer
),
upd AS (
  SELECT c_custkey AS uk, c_acctbal + 100.0 AS u_bal, c_mktsegment AS u_seg
  FROM customer WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT c_custkey, c_acctbal, c_mktsegment FROM customer WHERE c_custkey % 10 = 1
  UNION ALL
  SELECT c_custkey + 1000000, 0.0, 'NEW' FROM customer WHERE c_custkey % 97 = 0
),
j AS (
  SELECT cur.c_custkey, cur.c_acctbal, cur.c_mktsegment, cur.valid_from,
         upd.uk, upd.u_bal, upd.u_seg,
         NOT (cur.c_acctbal IS NOT DISTINCT FROM upd.u_bal
              AND cur.c_mktsegment IS NOT DISTINCT FROM upd.u_seg) AS changed
  FROM cur FULL OUTER JOIN upd ON cur.c_custkey = upd.uk
)
SELECT c_custkey, c_acctbal, c_mktsegment, valid_from, CAST(NULL AS BIGINT) AS valid_to
FROM j WHERE c_custkey IS NOT NULL AND (uk IS NULL OR NOT changed)
UNION ALL
SELECT c_custkey, c_acctbal, c_mktsegment, valid_from, CAST(1 AS BIGINT)
FROM j WHERE c_custkey IS NOT NULL AND uk IS NOT NULL AND changed
UNION ALL
SELECT uk, u_bal, u_seg, CAST(1 AS BIGINT), CAST(NULL AS BIGINT)
FROM j WHERE uk IS NOT NULL AND (c_custkey IS NULL OR changed)
"""


def q_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): HAVING-filtered
    aggregate on the fact table, then join the tiny survivor set back
    to orders/customer. The heavy groupBy happens FIRST so the joins
    only move the ~1% of orders that pass — at 100 TB the post-filter
    side is broadcast-able and AQE picks that up automatically."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("_qty"))
        .filter(F.col("_qty") > 200)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
            "o_totalprice",
            F.col("_qty").cast("double").alias("sum_qty"),
        )
    )


ORACLE_LARGE_VOLUME = """
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_totalprice,
       CAST(q.qty AS DOUBLE) AS sum_qty
FROM (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(28,6))) AS qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(28,6))) > 200
) q
JOIN orders   ON q.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q_status_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority) with grouping_id — all four grains
    (detail, per-status, per-priority, grand total) in one Expand +
    partial-agg pass; no union of four scans. gid is the standard bit
    vector (2·grouping(status) + grouping(priority))."""
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            _dsum("o_totalprice").alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            "gid",
            "n_orders",
            "total",
        )
    )


ORACLE_CUBE = """
SELECT COALESCE(o_orderstatus, '(all)') AS status,
       COALESCE(o_orderpriority, '(all)') AS priority,
       CAST(2 * GROUPING(o_orderstatus) + GROUPING(o_orderpriority) AS BIGINT) AS gid,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def q_part_metrics_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt) of per-part metrics via the native
    DataFrame.unpivot — lowers to a single Expand (each input row
    emitted k times map-side), zero shuffle, zero UDF."""
    part = read_table(spark, sf_dir, "part")
    wide = part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    )
    return wide.unpivot("p_partkey", ["size", "retailprice"], "metric", "value")


ORACLE_UNPIVOT = """
SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
UNION ALL
SELECT p_partkey, 'retailprice', p_retailprice FROM part
"""


def q_customer_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile + cume_dist per market segment (unique total order via the
    custkey tie-break, so both engines bucket identically).
    c_mktsegment has cardinality 5, so the per-segment rank rides
    grouped_row_number (operators/rankdev.py) — a plain per-segment
    window would sort n/5 of the customer table in one task at scale
    (r6 self-audit finding). ntile comes from the exact integer
    formula over (rank, group size); cume_dist = rank/n exactly
    because the order tuple is unique (no value ties)."""
    from kg_etl_spark.operators.rankdev import grouped_row_number, ntile_col_expr

    cust = read_table(spark, sf_dir, "customer").withColumn(
        "_negbal", -F.col("c_acctbal")
    )
    ranked = grouped_row_number(
        cust, ["c_mktsegment"], "_negbal", ["c_custkey"], out_col="_rn",
        count_col="_n",
    )
    # NTILE(10) from the exact rank + per-group count (the shared
    # integer formula — exact div, no double truncation)
    decile = ntile_col_expr(F.col("_rn"), F.col("_n"), 10)
    return ranked.select(
        "c_custkey",
        "c_mktsegment",
        decile.alias("decile"),
        F.round(F.col("_rn").cast("double") / F.col("_n").cast("double"), 6).alias("cd"),
    )


ORACLE_DECILES = """
SELECT c_custkey, c_mktsegment,
       NTILE(10) OVER w AS decile,
       ROUND(CUME_DIST() OVER w, 6) AS cd
FROM customer WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
"""


def q_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-ledger reconciliation via FULL OUTER join: every customer vs
    their aggregated order spend; rows flag which side is missing.
    The order side is pre-aggregated to one row per key before the
    join, so the full-outer shuffle moves |customers| + |custkeys|
    rows, not the raw fact table."""
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    spend = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(_dsum("o_totalprice").alias("total_spend"), F.count(F.lit(1)).alias("n_orders"))
    )
    j = cust.join(spend, cust.c_custkey == spend.o_custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.col("c_custkey").isNull().alias("missing_customer"),
        F.col("o_custkey").isNull().alias("no_orders"),
        F.coalesce("c_acctbal", F.lit(0.0)).alias("acctbal"),
        F.coalesce("total_spend", F.lit(0.0)).alias("total_spend"),
        F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
    )


ORACLE_FULL_OUTER = """
WITH spend AS (
  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_spend,
         COUNT(*) AS n_orders
  FROM orders GROUP BY o_custkey
)
SELECT COALESCE(c_custkey, o_custkey) AS custkey,
       c_custkey IS NULL AS missing_customer,
       o_custkey IS NULL AS no_orders,
       COALESCE(c_acctbal, 0.0) AS acctbal,
       COALESCE(total_spend, 0.0) AS total_spend,
       COALESCE(n_orders, 0) AS n_orders
FROM customer FULL OUTER JOIN spend ON c_custkey = o_custkey
"""


def q_measure_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + sample covariance of (quantity, price) per
    return flag, computed from decimal-exact partial sums (Σx Σy Σxy
    Σx² Σy² as decimals → one double expression at the edge). Unlike
    F.corr/covar_samp's streaming co-moments, the decimal partials are
    order-independent, so the result is bit-identical across engines
    and across shuffle layouts — the pattern for any second-moment
    statistic at scale."""
    li = read_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast(DECP)
    y = F.col("l_extendedprice").cast(DECP)
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (
        F.col("sxy").cast("double"),
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
    )
    cov = (sxy - sx * sy / n) / (n - 1)
    corr = (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return agg.select(
        "l_returnflag",
        "n",
        F.round(cov, 4).alias("covar_qty_price"),
        F.round(corr, 6).alias("corr_qty_price"),
    )


ORACLE_CORRELATIONS = """
WITH a AS (
  SELECT l_returnflag, COUNT(*) AS n,
         SUM(CAST(l_quantity AS DECIMAL(19,6))) AS sx,
         SUM(CAST(l_extendedprice AS DECIMAL(19,6))) AS sy,
         SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS sxy,
         SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_quantity AS DECIMAL(19,6))) AS sxx,
         SUM(CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       ROUND((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1), 4) AS covar_qty_price,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS corr_qty_price
FROM a
"""


def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (correlated scalar-aggregate subquery,
    decorrelated): per-part average quantity computed once as a
    groupBy, broadcast back onto the brand-filtered fact rows, filter
    l_quantity < 0.2·avg, one global sum. The correlated subquery a
    row-engine would re-run per row becomes a single extra aggregate +
    broadcast join. avg is decimal-sum/count so the 0.2·avg threshold
    is bit-identical on both engines."""
    li = read_table(spark, sf_dir, "lineitem")
    brand_parts = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    per_part = li.groupBy("l_partkey").agg(
        (F.sum(F.col("l_quantity").cast(DEC)).cast("double") / F.count(F.lit(1))).alias("avg_qty")
    )
    # restrict the per-part averages to the brand's parts BEFORE the
    # fact join — |brand parts| rows, not |parts|.  No hints: a brand
    # slice of part is still SF-SCALED (|part|/25 ≈ 8e7 rows at 100 TB),
    # so the planner's size-based choice must stay in charge (BHJ at
    # bench SF — plan-verified — shuffle at scale).
    pp_brand = per_part.join(
        brand_parts, per_part.l_partkey == brand_parts.p_partkey
    ).select("l_partkey", "avg_qty")
    return (
        li.join(brand_parts, li.l_partkey == brand_parts.p_partkey)
        .join(pp_brand, "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast(DEC)) / 7.0, 2)
            .cast("double")
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


ORACLE_SMALL_QTY = """
WITH pp AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) / 7.0, 2) AS DOUBLE) AS avg_yearly,
       COUNT(*) AS n_rows
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pp   ON pp.l_partkey = lineitem.l_partkey
WHERE p_brand = 'Brand#23' AND l_quantity < 0.2 * avg_qty
"""


def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (view + scalar max): supplier revenue in a
    quarter, then the supplier(s) achieving the maximum. The max is a
    1-row aggregate broadcast into an equi-filter — no re-scan of the
    fact table, no correlated subquery. Revenue stays decimal until
    the final compare so max-equality is exact."""
    li = read_table(spark, sf_dir, "lineitem")
    li = li.filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.col("l_extendedprice").cast(DECP)
            * (F.lit(1).cast(DECP) - F.col("l_discount").cast(DECP))
        ).alias("_rev")
    )
    mx = rev.agg(F.max("_rev").alias("_mx"))
    supp = read_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev._rev == mx._mx)
        .join(supp, rev.l_suppkey == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("_rev"), 2).cast("double").alias("total_rev"),
        )
    )


ORACLE_TOP_SUPPLIER = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))) AS r
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(ROUND(r, 2) AS DOUBLE) AS total_rev
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE r = (SELECT MAX(r) FROM rev)
"""


# --- TPC-H Q7 shape: one dim in two roles (nation pairs) --------------


def q_nation_pair_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (the same dimension joined in two roles):
    supplier-nation → customer-nation trade volume by ship year,
    cross-border rows only. nation is broadcast TWICE under different
    aliases — role-specific broadcasts, not a self-join of the fact.
    The fact shuffles only for the final (pair, year) aggregate;
    revenue stays decimal until the output round."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    supp_nation = nation.select(
        F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation")
    )
    cust_nation = nation.select(
        F.col("n_nationkey").alias("_cnk"), F.col("n_name").alias("cust_nation")
    )
    rev = F.col("l_extendedprice").cast(DECP) * (
        F.lit(1).cast(DECP) - F.col("l_discount").cast(DECP)
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("_snk"))
        .join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("_cnk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.round(F.sum(rev), 2).cast("double").alias("volume"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


ORACLE_NATION_PAIR = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       year(l_shipdate) AS ship_year,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS volume,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name <> cn.n_name
GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
"""


# --- TPC-H Q9 shape: filtered part profit by nation and year ----------


def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on 'red' parts per supplier nation per
    ship year. The selective p_name filter lands on the small dim and
    is broadcast so partition pruning happens at the fact join, not
    after; amount is a multi-column decimal expression (price net of
    discount minus a retail-cost proxy) aggregated exactly."""
    li = read_table(spark, sf_dir, "lineitem")
    part = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("red"))
        .select("p_partkey", "p_retailprice")
    )
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice").cast(DECP) * (
        F.lit(1).cast(DECP) - F.col("l_discount").cast(DECP)
    ) - F.col("p_retailprice").cast(DECP) * F.col("l_quantity").cast(DECP)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.round(F.sum(amount), 2).cast("double").alias("profit"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


ORACLE_PRODUCT_PROFIT = """
SELECT n_name AS nation, year(l_shipdate) AS ship_year,
       CAST(ROUND(SUM(
         CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))
         - CAST(p_retailprice AS DECIMAL(18,6)) * CAST(l_quantity AS DECIMAL(18,6))
       ), 2) AS DOUBLE) AS profit,
       COUNT(*) AS n_items
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(l_shipdate)
"""


# --- TPC-H Q12 shape: conditional bucket counts -----------------------


def q_priority_shipping_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per return-flag, how many line items belong to
    urgent/high-priority orders vs not — the two-way conditional
    aggregate (sum-of-CASE) pattern. One fact pass, order priority
    arrives by broadcast join; no second scan for the complement
    bucket."""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(urgent.cast("long")).alias("high_line_count"),
            F.sum((~urgent).cast("long")).alias("low_line_count"),
        )
    )


ORACLE_PRIORITY_BUCKETS = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_returnflag
"""


# --- TPC-H Q14 shape: conditional revenue share -----------------------


def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo-type parts' share of one month's revenue
    — a conditional-numerator / total-denominator ratio in ONE
    aggregate (no second scan, no self-join). Decimal sums; the ratio
    goes double only at the end."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-03-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    rev = F.col("l_extendedprice").cast(DECP) * (
        F.lit(1).cast(DECP) - F.col("l_discount").cast(DECP)
    )
    promo = F.col("p_name").startswith("new")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(promo, rev).otherwise(F.lit(0).cast(DECP))).cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


ORACLE_PROMO_SHARE = """
SELECT ROUND(
         100.0 * CAST(SUM(CASE WHEN p_name LIKE 'new%'
                   THEN CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))
                   ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE)
       , 6) AS promo_revenue_pct,
       COUNT(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
"""


# --- TPC-H Q19 shape: disjunctive multi-attribute predicate -----------


def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of three conjunctive
    brand/size/quantity clauses — the disjunctive-predicate pattern
    that tests whether the common conjunct (the join itself) stays
    shared while per-clause conditions evaluate post-join in one pass."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    rev = F.col("l_extendedprice").cast(DECP) * (
        F.lit(1).cast(DECP) - F.col("l_discount").cast(DECP)
    )
    clause = (
        ((F.col("p_brand") == "Brand#12") & (F.col("p_size") <= 5) & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 11))
        | ((F.col("p_brand") == "Brand#23") & (F.col("p_size") <= 10) & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 20))
        | ((F.col("p_brand") == "Brand#34") & (F.col("p_size") <= 15) & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 30))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(clause)
        .agg(
            F.round(F.sum(rev), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


ORACLE_DISJUNCTIVE = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size <= 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#23' AND p_size <= 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size <= 15 AND l_quantity BETWEEN 20 AND 30)
"""


# --- TPC-H Q21 shape: exists + not-exists decorrelated ----------------


def q_blamed_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (EXISTS + NOT EXISTS over the same fact,
    decorrelated): suppliers solely responsible for a return in
    multi-supplier finished orders. A row engine re-probes lineitem
    twice per candidate row (exists: another supplier in the order;
    not-exists: another supplier who also returned); here both
    predicates collapse into per-order WINDOW aggregates over the
    (order, supplier) grain — no per-order aggregate table, no join
    back, no lineage cut (the grain stream is consumed exactly once).
    r12 A/B: window 0.98 s vs eager-cut join form 1.08 vs lazy-cut
    1.16 (the cut's two consumers race without a shared exchange),
    bit-identical top-25.

    At 100 TB: the order-grain window rides the natural orderkey
    partition; ≤7 lines per order means no window skew; no fact-table
    re-scan, no correlated probe storm. Top-25 suppliers by
    blamed-order count, name tie-break.
    """
    li = read_table(spark, sf_dir, "lineitem")
    finished = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    # ONE pass over the fact: collapse to (order, supplier, returned?)
    # grain, then both exists/not-exists predicates as window counts
    w = Window.partitionBy("l_orderkey")
    per_os = (
        li.groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("_ret"))
        .select(
            "l_orderkey",
            "l_suppkey",
            "_ret",
            F.count(F.lit(1)).over(w).alias("n_supp"),
            F.sum("_ret").over(w).alias("n_supp_ret"),
        )
    )
    blamed = per_os.filter(
        (F.col("_ret") == 1) & (F.col("n_supp") >= 2) & (F.col("n_supp_ret") == 1)
    ).join(finished, F.col("l_orderkey") == F.col("o_orderkey"))
    supp = read_table(spark, sf_dir, "supplier")
    return (
        blamed.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(25)
    )


ORACLE_BLAMED = """
WITH per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_supp_ret
  FROM lineitem GROUP BY l_orderkey
), blamed AS (
  SELECT DISTINCT l.l_orderkey, l.l_suppkey
  FROM lineitem l
  JOIN per_order p ON l.l_orderkey = p.l_orderkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'R' AND p.n_supp >= 2 AND p.n_supp_ret = 1
    AND o.o_orderstatus = 'F'
)
SELECT s_name, COUNT(*) AS numwait
FROM blamed JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 25
"""


# --- TPC-H Q22 shape: scalar subquery threshold + anti-join -----------

_Q22_SEGMENTS = ("BUILDING", "MACHINERY", "AUTOMOBILE")
_Q22_CUTOFF = "2000-01-01 00:00:00"


def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (scalar-aggregate subquery + NOT EXISTS):
    customers in target segments with above-average positive balance
    and no orders since the lapse cutoff. The scalar average is a 1-row
    aggregate broadcast into the filter (not a per-row subquery); the
    NOT EXISTS is a native left_anti join against the (pre-filtered,
    deduped) recent-orders keys. Balance math stays decimal until the
    final round so the threshold compare is bit-identical on both
    engines."""
    cust = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin(*_Q22_SEGMENTS)
    )
    thr = cust.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(F.col("c_acctbal").cast(DEC)) / F.count(F.lit(1))).alias("_thr")
    )
    orders = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _Q22_CUTOFF)
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(thr), F.col("c_acctbal").cast(DEC) > F.col("_thr"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast(DEC)), 2).cast("double").alias("totacctbal"),
        )
    )


ORACLE_IDLE_RICH = f"""
WITH seg AS (
  SELECT * FROM customer
  WHERE c_mktsegment IN {_Q22_SEGMENTS!r}
), thr AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(28,6))) / COUNT(*) AS t
  FROM seg WHERE c_acctbal > 0
)
SELECT c_mktsegment,
       COUNT(*) AS numcust,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(28,6))), 2) AS DOUBLE) AS totacctbal
FROM seg, thr
WHERE CAST(c_acctbal AS DECIMAL(28,6)) > thr.t
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '{_Q22_CUTOFF}'
  )
GROUP BY c_mktsegment
"""


# --- remaining TPC-H shapes (Q2/Q8/Q11/Q13/Q16/Q20 analogs) -----------
# The testdata has no partsupp table; lineitem is the part↔supplier
# bridge, so supply cost/availability derive from shipped line items —
# the SHAPES (correlated-min decorrelation, conditional market share,
# scalar-threshold HAVING, left-join distribution, distinct-count
# grouping, nested semi-join) are the TPC-H ones.


def q_cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per part (one type slice), the supplier offering
    the minimum unit price — the correlated-min subquery decorrelated
    into one per-(part, supplier) aggregate + a min-per-part join-back;
    supplier/nation dims arrive by broadcast. Total tie-break on
    s_suppkey."""
    part = read_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    unit = (F.col("l_extendedprice").cast(DECP) / F.col("l_quantity").cast(DECP))
    offer = (
        li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.round(F.min(unit), 6).cast("double").alias("unit_cost"))
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.col("unit_cost").asc(), F.col("l_suppkey").asc()
    )
    best = offer.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    return (
        best.join(supp, best.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("s_name"),
            F.col("n_name"),
            "unit_cost",
        )
    )


ORACLE_CHEAPEST_SUPPLIER = """
WITH offer AS (
  SELECT l_partkey, l_suppkey,
         CAST(ROUND(MIN(CAST(l_extendedprice AS DECIMAL(18,6)) / CAST(l_quantity AS DECIMAL(18,6))), 6) AS DOUBLE) AS unit_cost
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'STANDARD'
  GROUP BY l_partkey, l_suppkey
), best AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY l_partkey ORDER BY unit_cost ASC, l_suppkey ASC) AS rn
  FROM offer
)
SELECT l_partkey AS p_partkey, s_name, n_name, unit_cost
FROM best JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
WHERE rn = 1
"""


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_0 suppliers' share of ASIA-region customer
    revenue per order year — the conditional-numerator share over a
    5-way join, computed in ONE aggregate (no second scan)."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    cnation = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    snation = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("sn_name")
    )
    rev = (F.col("l_extendedprice").cast(DECP) * (F.lit(1).cast(DECP) - F.col("l_discount").cast(DECP)))
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cnation), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(snation), supp.s_nationkey == F.col("sn_key"))
    )
    num = F.when(F.col("sn_name") == "NATION_0", rev).otherwise(F.lit(0).cast(DECP))
    return (
        j.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(num).cast("double") / F.sum(rev).cast("double"), 6
            ).alias("mkt_share")
        )
    )


ORACLE_MARKET_SHARE = """
SELECT year(o_orderdate) AS o_year,
       ROUND(CAST(SUM(CASE WHEN sn.n_name = 'NATION_0'
                           THEN CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))
                           ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 6) AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region ON cn.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE r_name = 'ASIA'
GROUP BY year(o_orderdate)
"""


_Q11_FRACTION = 0.001


def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose supplied value (from NATION_1
    suppliers) exceeds a fraction of that nation's total supplied value
    — a grouped aggregate HAVING against a scalar computed from the
    SAME aggregate (one pass + a 1-row broadcast), not a re-scan."""
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    val = F.col("l_extendedprice").cast(DECP)
    per_part = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .filter(F.col("n_name") == "NATION_1")
        .groupBy("l_partkey")
        .agg(F.sum(val).alias("_v"))
    )
    total = per_part.agg(F.sum("_v").alias("_t"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("_v") > F.col("_t") * F.lit(_Q11_FRACTION))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("_v"), 2).cast("double").alias("supplied_value"),
        )
    )


ORACLE_IMPORTANT_PARTS = f"""
WITH pp AS (
  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS v
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_1'
  GROUP BY l_partkey
), t AS (SELECT SUM(v) AS tv FROM pp)
SELECT l_partkey AS p_partkey,
       CAST(ROUND(v, 2) AS DOUBLE) AS supplied_value
FROM pp, t WHERE v > tv * {_Q11_FRACTION!r}
"""


def q_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count,
    including zero-order customers — LEFT join + double aggregate (the
    join-then-histogram pattern); urgent orders excluded to make the
    left side meaningfully filtered."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


ORACLE_CUSTDIST = """
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust GROUP BY c_count
"""


def q_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers ship each
    (brand, type, size) combination, excluding one brand — a
    countDistinct over the lineitem bridge with broadcast part dim."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


ORACLE_SUPPLIER_PART_COUNTS = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
GROUP BY p_brand, p_type, p_size
"""


_Q20_START = "1997-01-01 00:00:00"
_Q20_END = "1998-01-01 00:00:00"


def q_overstock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped more than 30% of a
    part's total 1997 volume for any Brand#2 part — the nested
    EXISTS-over-aggregate decorrelated into per-(part, supplier) sums
    joined against per-part thresholds (both from ONE scan), then a
    distinct supplier projection with the dim joined broadcast."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _Q20_START) & (F.col("l_shipdate") < _Q20_END)
    )
    part = read_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2")
    supp = read_table(spark, sf_dir, "supplier")
    bridged = li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
    qty = F.col("l_quantity").cast(DECP)
    per_ps = bridged.groupBy("l_partkey", "l_suppkey").agg(F.sum(qty).alias("_sq"))
    per_p = bridged.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum(qty).alias("_tq")
    )
    # per_p is a per-part aggregate over the brand slice — SF-scaled,
    # not model state: unhinted (planner picks BHJ at bench SF itself)
    hot = (
        per_ps.join(per_p, per_ps.l_partkey == F.col("_pk"))
        .filter(F.col("_sq") > F.col("_tq") * F.lit(0.3).cast(DECP))
        .select("l_suppkey")
        .distinct()
    )
    return (
        hot.join(supp, hot.l_suppkey == supp.s_suppkey)
        .select(F.col("s_suppkey"), F.col("s_name"))
    )


ORACLE_OVERSTOCK = f"""
WITH b AS (
  SELECT l_partkey, l_suppkey, CAST(l_quantity AS DECIMAL(18,6)) AS q
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#2'
    AND l_shipdate >= TIMESTAMP '{_Q20_START}' AND l_shipdate < TIMESTAMP '{_Q20_END}'
), per_ps AS (
  SELECT l_partkey, l_suppkey, SUM(q) AS sq FROM b GROUP BY l_partkey, l_suppkey
), per_p AS (
  SELECT l_partkey, SUM(q) AS tq FROM b GROUP BY l_partkey
)
SELECT DISTINCT s_suppkey, s_name
FROM per_ps JOIN per_p USING (l_partkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE sq > tq * CAST(0.3 AS DECIMAL(18,6))
"""


QUERIES = {
    "pricing_summary": q_pricing_summary,
    "filter_project": q_filter_project,
    "semi_join": q_semi_join,
    "anti_join": q_anti_join,
    "broadcast_dim_join": q_broadcast_dim_join,
    "multi_hop_revenue": q_multi_hop_revenue,
    "topk_per_group": q_topk_per_group,
    "min_item_per_order": q_min_item_per_order,
    "zscore_bucket": q_zscore_bucket,
    "longest_name_per_nation": q_longest_name_per_nation,
    "distinct_status_pairs": q_distinct_status_pairs,
    "count_distinct": q_count_distinct,
    "union_entities": q_union_entities,
    "collect_names_per_nation": q_collect_names_per_nation,
    "try_cast_json": q_try_cast_json,
    "slugify_parts": q_slugify_parts,
    "extract_priority": q_extract_priority,
    "surrogate_ids": q_surrogate_ids,
    "priority_coalesced_avg": q_priority_coalesced_avg,
    "sql_exists_agg": q_sql_exists_agg,
    "pagerank": q_pagerank,
    "shipping_priority": q_shipping_priority,
    "scd2_customer": q_scd2_customer,
    "large_volume_orders": q_large_volume_orders,
    "status_priority_cube": q_status_priority_cube,
    "part_metrics_unpivot": q_part_metrics_unpivot,
    "customer_deciles": q_customer_deciles,
    "full_outer_reconcile": q_full_outer_reconcile,
    "measure_correlations": q_measure_correlations,
    "small_quantity_revenue": q_small_quantity_revenue,
    "top_supplier_revenue": q_top_supplier_revenue,
    "blamed_suppliers": q_blamed_suppliers,
    "idle_rich_customers": q_idle_rich_customers,
    "cheapest_supplier_per_part": q_cheapest_supplier_per_part,
    "market_share": q_market_share,
    "important_parts": q_important_parts,
    "custdist": q_custdist,
    "supplier_part_counts": q_supplier_part_counts,
    "overstock_suppliers": q_overstock_suppliers,
    "nation_pair_trade": q_nation_pair_trade,
    "product_profit": q_product_profit,
    "priority_shipping_buckets": q_priority_shipping_buckets,
    "promo_revenue_share": q_promo_revenue_share,
    "disjunctive_revenue": q_disjunctive_revenue,
    "sql_window_rank": q_sql_window_rank,
}

ORACLES = {
    "pricing_summary": ORACLE_PRICING,
    "filter_project": ORACLE_FILTER_PROJECT,
    "semi_join": ORACLE_SEMI,
    "anti_join": ORACLE_ANTI,
    "broadcast_dim_join": ORACLE_BROADCAST,
    "multi_hop_revenue": ORACLE_MULTI_HOP,
    "topk_per_group": ORACLE_TOPK,
    "min_item_per_order": ORACLE_MIN_ITEM,
    "zscore_bucket": ORACLE_ZSCORE,
    "longest_name_per_nation": ORACLE_LONGEST_NAME,
    "distinct_status_pairs": ORACLE_DISTINCT_PAIRS,
    "count_distinct": ORACLE_COUNT_DISTINCT,
    "union_entities": ORACLE_UNION,
    "collect_names_per_nation": ORACLE_COLLECT,
    "try_cast_json": ORACLE_TRY_CAST,
    "slugify_parts": ORACLE_SLUGIFY,
    "extract_priority": ORACLE_EXTRACT,
    "surrogate_ids": ORACLE_SURROGATE,
    "priority_coalesced_avg": ORACLE_PRIORITY_AVG,
    "sql_exists_agg": SQL_EXISTS_AGG,
    "pagerank": ORACLE_PAGERANK,
    "shipping_priority": ORACLE_SHIPPING_PRIORITY,
    "scd2_customer": ORACLE_SCD2,
    "large_volume_orders": ORACLE_LARGE_VOLUME,
    "status_priority_cube": ORACLE_CUBE,
    "part_metrics_unpivot": ORACLE_UNPIVOT,
    "customer_deciles": ORACLE_DECILES,
    "full_outer_reconcile": ORACLE_FULL_OUTER,
    "measure_correlations": ORACLE_CORRELATIONS,
    "small_quantity_revenue": ORACLE_SMALL_QTY,
    "top_supplier_revenue": ORACLE_TOP_SUPPLIER,
    "blamed_suppliers": ORACLE_BLAMED,
    "idle_rich_customers": ORACLE_IDLE_RICH,
    "cheapest_supplier_per_part": ORACLE_CHEAPEST_SUPPLIER,
    "market_share": ORACLE_MARKET_SHARE,
    "important_parts": ORACLE_IMPORTANT_PARTS,
    "custdist": ORACLE_CUSTDIST,
    "supplier_part_counts": ORACLE_SUPPLIER_PART_COUNTS,
    "overstock_suppliers": ORACLE_OVERSTOCK,
    "nation_pair_trade": ORACLE_NATION_PAIR,
    "product_profit": ORACLE_PRODUCT_PROFIT,
    "priority_shipping_buckets": ORACLE_PRIORITY_BUCKETS,
    "promo_revenue_share": ORACLE_PROMO_SHARE,
    "disjunctive_revenue": ORACLE_DISJUNCTIVE,
    "sql_window_rank": SQL_WINDOW_RANK,
}


def q_expectations_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion data-quality gate over lineitem: range, nullness,
    domain, and referential expectations evaluated in one scan (plus
    one broadcast semi-probe for the FK rule)."""
    from kg_etl_spark.operators.audit import check_expectations

    li = read_table(spark, sf_dir, "lineitem")
    # orders is SF-SCALED (1.5e9 keys at TPC-H-proportioned 100 TB) —
    # the FK probe must stay an unhinted equi-join (broadcast at bench
    # SF by the planner's own choice, shuffle at scale)
    order_keys = read_table(spark, sf_dir, "orders").select("o_orderkey")
    with_fk = li.join(
        order_keys, li.l_orderkey == order_keys.o_orderkey, "left"
    ).withColumn("_fk_ok", F.col("o_orderkey").isNotNull())
    rules = {
        "quantity_in_range": (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 50),
        "price_positive": F.col("l_extendedprice") > 0,
        "discount_unit_interval": (F.col("l_discount") >= 0) & (F.col("l_discount") <= 1),
        "shipdate_not_null": F.col("l_shipdate").isNotNull(),
        "returnflag_domain": F.col("l_returnflag").isin("A", "N", "R"),
        "orderkey_fk_resolves": F.col("_fk_ok"),
    }
    return check_expectations(with_fk, rules)


ORACLE_EXPECTATIONS = """
WITH j AS (
  SELECT l.*, (o.o_orderkey IS NOT NULL) AS fk_ok
  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
), agg AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CASE WHEN l_discount >= 0 AND l_discount <= 1 THEN 0 ELSE 1 END) AS BIGINT) AS v_discount,
         CAST(SUM(CASE WHEN fk_ok THEN 0 ELSE 1 END) AS BIGINT) AS v_fk,
         CAST(SUM(CASE WHEN l_extendedprice > 0 THEN 0 ELSE 1 END) AS BIGINT) AS v_price,
         CAST(SUM(CASE WHEN l_quantity >= 1 AND l_quantity <= 50 THEN 0 ELSE 1 END) AS BIGINT) AS v_qty,
         CAST(SUM(CASE WHEN l_returnflag IN ('A','N','R') THEN 0 ELSE 1 END) AS BIGINT) AS v_flag,
         CAST(SUM(CASE WHEN l_shipdate IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) AS v_ship
  FROM j
)
SELECT 'discount_unit_interval' AS rule, v_discount AS n_violations, n AS n_rows FROM agg
UNION ALL SELECT 'orderkey_fk_resolves', v_fk, n FROM agg
UNION ALL SELECT 'price_positive', v_price, n FROM agg
UNION ALL SELECT 'quantity_in_range', v_qty, n FROM agg
UNION ALL SELECT 'returnflag_domain', v_flag, n FROM agg
UNION ALL SELECT 'shipdate_not_null', v_ship, n FROM agg
"""

QUERIES["expectations_lineitem"] = q_expectations_lineitem
ORACLES["expectations_lineitem"] = ORACLE_EXPECTATIONS


# --- TPC-H Q6 shape: pure multi-range-predicate scan ------------------


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the simplest benchmark query is the purest
    pushdown test — three range predicates (date window, discount band,
    quantity cap) must ALL reach the parquet scan, then one map-side
    product-sum. No join, no window; if this plans anything beyond
    scan→filter→partial agg→exchange→final agg, pushdown broke."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast(DECP) * F.col("l_discount").cast(DECP)), 2
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


ORACLE_FORECAST = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# --- TPC-H Q10 shape: returned-item customer ranking ------------------


def q_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in
    a quarter — fact filtered early (returnflag + date window pushed to
    the scans), customer/nation dims broadcast, one aggregate, total
    tie-break for the LIMIT."""
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice").cast(DECP) * (
        F.lit(1).cast(DECP) - F.col("l_discount").cast(DECP)
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("lost_revenue"))
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


ORACLE_RETURNED_CUSTOMERS = """
SELECT c_custkey, c_name, n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS lost_revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY lost_revenue DESC, c_custkey ASC
LIMIT 20
"""

QUERIES["forecast_revenue"] = q_forecast_revenue
ORACLES["forecast_revenue"] = ORACLE_FORECAST
QUERIES["returned_item_customers"] = q_returned_item_customers
ORACLES["returned_item_customers"] = ORACLE_RETURNED_CUSTOMERS


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot change classification (operators/scd.py
    `snapshot_diff`): the 'new' customer snapshot is synthesized
    deterministically — ids %97==0 deleted, %13==0 rebalanced, a
    shifted-id block inserted — so every status fires on real rows."""
    from kg_etl_spark.operators.scd import snapshot_diff

    old = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    kept = old.filter(F.col("c_custkey") % 97 != 0)
    mutated = kept.withColumn(
        "c_acctbal",
        F.when(
            F.col("c_custkey") % 13 == 0, F.round(F.col("c_acctbal") + 100.0, 2)
        ).otherwise(F.col("c_acctbal")),
    )
    inserted = old.filter(F.col("c_custkey") % 101 == 0).select(
        (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
        "c_acctbal",
        "c_mktsegment",
    )
    new = mutated.unionByName(inserted)
    diff = snapshot_diff(old, new, ["c_custkey"], ["c_acctbal", "c_mktsegment"])
    return diff.groupBy("diff_status", "first_diff_col").agg(
        F.count(F.lit(1)).alias("n"), F.sum("c_custkey").alias("key_sum")
    )


ORACLE_SNAPSHOT_DIFF = """
WITH old AS (SELECT c_custkey, c_acctbal, c_mktsegment FROM customer),
new AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 13 = 0 THEN ROUND(c_acctbal + 100.0, 2)
              ELSE c_acctbal END AS c_acctbal,
         c_mktsegment
  FROM customer WHERE c_custkey % 97 <> 0
  UNION ALL
  SELECT c_custkey + 1000000, c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey % 101 = 0
),
j AS (
  SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
         CASE WHEN o.c_custkey IS NOT NULL AND n.c_custkey IS NULL THEN 'removed'
              WHEN o.c_custkey IS NULL AND n.c_custkey IS NOT NULL THEN 'added'
              WHEN o.c_acctbal IS DISTINCT FROM n.c_acctbal
                   OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment THEN 'changed'
              ELSE 'unchanged' END AS diff_status,
         CASE WHEN o.c_custkey IS NOT NULL AND n.c_custkey IS NOT NULL
                   AND (o.c_acctbal IS DISTINCT FROM n.c_acctbal
                        OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment)
              THEN CASE WHEN o.c_acctbal IS DISTINCT FROM n.c_acctbal THEN 'c_acctbal'
                        ELSE 'c_mktsegment' END
              END AS first_diff_col
  FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
)
SELECT diff_status, first_diff_col, COUNT(*) AS n,
       CAST(SUM(c_custkey) AS BIGINT) AS key_sum
FROM j GROUP BY diff_status, first_diff_col
"""

QUERIES["snapshot_diff"] = q_snapshot_diff
ORACLES["snapshot_diff"] = ORACLE_SNAPSHOT_DIFF


_COP_MIN_SUPPORT = 3
_COP_TOPN = 20


def q_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs appearing in the same
    order, support >= 3, top-20 by (support desc, pair asc) — the
    pairwise kernel of frequent-itemset mining. The self-join is keyed
    on l_orderkey, so pair fan-out is bounded by order size (≤7 items
    in TPC-H shapes) — per-key quadratic, globally linear; a mega-basket
    outlier would hit the AQE skew-join path like any hot key."""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= _COP_MIN_SUPPORT)
    )
    return pairs.orderBy(
        F.col("support").desc(), F.col("part_a").asc(), F.col("part_b").asc()
    ).limit(_COP_TOPN)


ORACLE_COPURCHASE = f"""
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS support
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY a.l_partkey, b.l_partkey
HAVING COUNT(*) >= {_COP_MIN_SUPPORT}
ORDER BY support DESC, part_a ASC, part_b ASC LIMIT {_COP_TOPN}
"""

QUERIES["copurchase_pairs"] = q_copurchase_pairs
ORACLES["copurchase_pairs"] = ORACLE_COPURCHASE


def q_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules from the co-purchase pairs: for each frequent
    pair, confidence(a→b) = support(ab)/count(a-orders) and
    lift = N·support(ab)/(count(a)·count(b)) — the rule-quality layer
    over the basket kernel. Per-part order counts broadcast onto the
    20-row pair frame; scalar N via a 1-row broadcast."""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pairs = q_copurchase_pairs(spark, sf_dir)
    per_part = (
        li.select("l_partkey", "l_orderkey")
        .distinct()
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_ord"))
    )
    n_orders = li.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("n_total")
    )
    # per_part is |parts| rows (SF-scaled) while pairs is the top-20
    # frame: no hints — the planner builds on the 20-row side, which is
    # the right plan at every scale (forcing per_part was backwards)
    out = (
        pairs.join(
            per_part.select(F.col("l_partkey").alias("part_a"), F.col("n_ord").alias("n_a")),
            "part_a",
        )
        .join(
            per_part.select(F.col("l_partkey").alias("part_b"), F.col("n_ord").alias("n_b")),
            "part_b",
        )
        .crossJoin(F.broadcast(n_orders))
    )
    return out.select(
        "part_a",
        "part_b",
        "support",
        F.round(F.col("support").cast("double") / F.col("n_a").cast("double"), 6).alias(
            "confidence_a_to_b"
        ),
        F.round(
            (F.col("n_total") * F.col("support")).cast("double")
            / (F.col("n_a") * F.col("n_b")).cast("double"),
            6,
        ).alias("lift"),
    )


ORACLE_ASSOC_RULES = f"""
WITH pairs AS ({ORACLE_COPURCHASE.strip()}),
pp AS (
  SELECT l_partkey, COUNT(*) AS n_ord FROM (
    SELECT DISTINCT l_partkey, l_orderkey FROM lineitem
  ) GROUP BY l_partkey
),
tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n_total FROM lineitem)
SELECT p.part_a, p.part_b, p.support,
       ROUND(CAST(p.support AS DOUBLE) / a.n_ord, 6) AS confidence_a_to_b,
       ROUND(CAST(tot.n_total * p.support AS DOUBLE) / (a.n_ord * b.n_ord), 6) AS lift
FROM pairs p
JOIN pp a ON p.part_a = a.l_partkey
JOIN pp b ON p.part_b = b.l_partkey, tot
"""

QUERIES["association_rules"] = q_association_rules
ORACLES["association_rules"] = ORACLE_ASSOC_RULES


_APRIORI_L1_MIN = 5  # item must appear in >= 5 baskets to enter pairing
_APRIORI_TOP = 50  # emit the top-N triples by support (total tie-break)


def q_apriori_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemsets from order baskets — the A-priori level-3
    step (Agrawal & Srikant, VLDB'94): items below the L1 support
    floor are pruned BEFORE any pairing (downward closure), then
    triples are enumerated inside each basket by two ordered
    self-joins on the basket key and counted.

    100 TB shape: the L1 prune is a broadcast semi-join (frequent-item
    list is model state), and the two self-joins key on the basket id
    — fan-out is C(|basket|,3), bounded by basket size, never by
    corpus size; the count is one hash aggregate on the triple key.
    Output contract: the TOP-50 triples by (support desc, triple asc)
    — an absolute support floor goes degenerate as the part domain
    grows with corpus size (at sf0.1 no triple repeats at all), while
    top-N with a total tie-break is deterministic and non-empty at
    every scale; the enumeration cost is identical and the final
    top-N is a TakeOrdered, not a sort."""
    li = read_table(spark, sf_dir, "lineitem")
    # the distinct (order, part) stream feeds TWO consumers — the L1
    # support counts and the semi-join's probe side — and per-consumer
    # pruning kept ReuseExchange from firing, so the corpus scan +
    # distinct exchange ran twice per call (r12; guide §1.2). LAZY cut:
    # the first consumer materializes it inline. Interleaved A/B at
    # sf0.1: 2.49 → 2.05 s (r8 join form 2.24 s in the same process),
    # bit-identical top-50.
    b = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        .lineage_cut(eager=False)
    )
    l1 = (
        b.groupBy("p")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= _APRIORI_L1_MIN)
        .select("p")
    )
    # l1 uses an ABSOLUTE >= 5-basket threshold, so at 100 TB nearly
    # every part qualifies (|l1| -> |part|, SF-scaled — NOT model
    # state): unhinted semi-join, planner broadcasts at bench SF
    bf = b.join(l1, "p", "left_semi")
    # enumerate the C(|basket|,3) ordered triples INSIDE each basket:
    # one per-basket collect + a map-side nested-slice fan-out instead
    # of the former two basket-keyed self-joins (which scanned the
    # pruned basket stream three times and ran two join executions for
    # the same fan-out). The basket array is distinct and sorted, so
    # positions i<j<k enumerate exactly the pa<pb<pc triples.
    baskets = bf.groupBy("o").agg(F.sort_array(F.collect_list("p")).alias("ps"))
    triples = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (a, i) ->"
                " flatten(transform(slice(ps, i + 2, size(ps)), (b, j) ->"
                "  transform(slice(ps, i + j + 3, size(ps)), c ->"
                "   struct(a AS pa, b AS pb, c AS pc))))))"
            )
        ).alias("t")
    ).select("t.pa", "t.pb", "t.pc")
    return (
        triples.groupBy("pa", "pb", "pc")
        .agg(F.count(F.lit(1)).alias("support"))
        .orderBy(
            F.col("support").desc(),
            F.col("pa").asc(),
            F.col("pb").asc(),
            F.col("pc").asc(),
        )
        .limit(_APRIORI_TOP)
    )


ORACLE_APRIORI_TRIPLES = f"""
WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
l1 AS (SELECT p FROM b GROUP BY p HAVING COUNT(*) >= {_APRIORI_L1_MIN}),
bf AS (SELECT b.o, b.p FROM b SEMI JOIN l1 ON l1.p = b.p)
SELECT a.p AS pa, c.p AS pb, d.p AS pc, COUNT(*) AS support
FROM bf a JOIN bf c ON c.o = a.o AND c.p > a.p
          JOIN bf d ON d.o = a.o AND d.p > c.p
GROUP BY 1, 2, 3
ORDER BY support DESC, pa ASC, pb ASC, pc ASC
LIMIT {_APRIORI_TOP}
"""

QUERIES["apriori_triples"] = q_apriori_triples
ORACLES["apriori_triples"] = ORACLE_APRIORI_TRIPLES


def q_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank: random walks restarting at the customer
    seed set (custkey % 50 == 0) — 'importance relative to THESE
    customers', the recommender-side variant of q_pagerank. Same
    deterministic fold; teleport vector e_S instead of uniform."""
    from kg_etl_spark.operators.pagerank import pagerank

    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    cust = read_table(spark, sf_dir, "customer")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("a"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("b"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    seeds = cust.filter(F.col("c_custkey") % 50 == 0).select(
        F.concat(F.lit("c:"), F.col("c_custkey")).alias("node")
    )
    ranks = pagerank(
        edges, iterations=3, damping=0.85, deterministic=True, teleport=seeds
    )
    return ranks.select("node", F.round("rank", 6).alias("ppr"))


def _ppr_oracle(iterations: int = 3) -> str:
    """Unrolled personalized power iterations: r0 = e_S and the restart
    term is (1-d)·e_S; per-node sums fold in src order like the base
    oracle. Seeds restricted to nodes actually present in the graph,
    matching the operator's nodes∩S teleport construction — BUT the
    mass normalizer |S| counts the full seed set exactly as the
    operator's `srcs.count()` does."""
    head = """
WITH pairs AS (
  SELECT DISTINCT 'c:' || o_custkey AS a, 's:' || l_suppkey AS b
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION ALL
  SELECT b AS src, a AS dst FROM pairs
),
outd AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM edges UNION SELECT dst FROM edges),
seeds AS (SELECT DISTINCT 'c:' || c_custkey AS node FROM customer WHERE c_custkey % 50 = 0),
ns AS (SELECT CAST(count(*) AS DOUBLE) AS ns FROM seeds),
tele AS (
  SELECT nodes.node,
         CASE WHEN seeds.node IS NOT NULL THEN 1.0 / ns.ns ELSE 0.0 END AS t
  FROM nodes CROSS JOIN ns LEFT JOIN seeds ON nodes.node = seeds.node
),
r0 AS (SELECT node, t AS rank FROM tele)"""
    steps = []
    for i in range(1, iterations + 1):
        steps.append(f""",
c{i} AS (
  SELECT e.dst AS node,
         list_reduce(list_prepend(0.0, list(r.rank / o.outdeg ORDER BY e.src)),
                     (acc, x) -> acc + x) AS s
  FROM edges e JOIN r{i-1} r ON e.src = r.node JOIN outd o ON e.src = o.src
  GROUP BY e.dst
),
r{i} AS (
  SELECT tele.node, (1.0 - 0.85) * tele.t + 0.85 * coalesce(c{i}.s, 0.0) AS rank
  FROM tele LEFT JOIN c{i} ON tele.node = c{i}.node
)""")
    return head + "".join(steps) + f"""
SELECT node, ROUND(rank, 6) AS ppr FROM r{iterations}
"""


QUERIES["personalized_pagerank"] = q_personalized_pagerank
ORACLES["personalized_pagerank"] = _ppr_oracle(3)


def q_cdc_apply_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC op-log apply (operators/scd.py `cdc_apply`): base = customer
    balances; the order stream acts as a Debezium-style after-image log
    (seq = o_orderkey; status P→delete, else upsert bal=o_totalprice).
    Final state per customer after replaying the log."""
    from kg_etl_spark.operators.scd import cdc_apply

    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", F.round(F.col("c_acctbal"), 2).alias("bal")
    )
    oplog = read_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderstatus") == "P", F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.round(F.col("o_totalprice"), 2).alias("bal"),
    )
    return cdc_apply(cust, oplog, "c_custkey", "seq", "op", ["bal"])


ORACLE_CDC_APPLY = """
WITH oplog AS (
  SELECT o_custkey AS c_custkey, o_orderkey AS seq,
         CASE WHEN o_orderstatus = 'P' THEN 'D' ELSE 'U' END AS op,
         ROUND(o_totalprice, 2) AS bal
  FROM orders
), last AS (
  SELECT c_custkey, op, bal
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY seq DESC) AS rn
        FROM oplog)
  WHERE rn = 1
)
SELECT c.c_custkey, ROUND(c.c_acctbal, 2) AS bal
FROM customer c LEFT JOIN last l ON c.c_custkey = l.c_custkey
WHERE l.c_custkey IS NULL
UNION ALL
SELECT c_custkey, bal FROM last WHERE op <> 'D'
"""

QUERIES["cdc_apply_balance"] = q_cdc_apply_balance
ORACLES["cdc_apply_balance"] = ORACLE_CDC_APPLY


def q_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join against the versioned customer dimension of
    `scd2_customer` (operators/scd.py `scd2_pit_join`): each order
    queries the dimension at pseudo-time o_orderkey % 2, returning the
    balance/segment that version carried."""
    from kg_etl_spark.operators.scd import scd2_pit_join

    dim = q_scd2_customer(spark, sf_dir)
    facts = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("c_custkey"),
        F.pmod("o_orderkey", F.lit(2)).cast("long").alias("t"),
    )
    out = scd2_pit_join(facts, dim, "c_custkey", "t")
    return out.select(
        "o_orderkey", "c_custkey", "t",
        F.round("c_acctbal", 2).alias("bal_at_t"), "c_mktsegment",
    )


ORACLE_SCD2_PIT = f"""
WITH scd2 AS ({ORACLE_SCD2}),
facts AS (
  SELECT o_orderkey, o_custkey AS c_custkey, o_orderkey % 2 AS t FROM orders
)
SELECT f.o_orderkey, f.c_custkey, CAST(f.t AS BIGINT) AS t,
       ROUND(s.c_acctbal, 2) AS bal_at_t, s.c_mktsegment
FROM facts f JOIN scd2 s ON f.c_custkey = s.c_custkey
WHERE s.valid_from <= f.t AND (s.valid_to IS NULL OR f.t < s.valid_to)
"""

QUERIES["scd2_point_in_time"] = q_scd2_point_in_time
ORACLES["scd2_point_in_time"] = ORACLE_SCD2_PIT


# --- GNN-style feature smoothing (operators/propagation.py) -----------

_FP_ROUNDS = 2


def q_feature_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2 rounds of mean-neighbor smoothing of supplier account balance
    (α=1/2) over the same-nation supplier graph, in integer
    MICRO-UNITS with explicit half-up division (operators/
    propagation.py) — a float-free trajectory both engines replay
    bit-exactly. One node-keyed shuffle per round."""
    from kg_etl_spark.operators.propagation import feature_propagation

    supp = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )
    a = supp.alias("a")
    b = supp.alias("b")
    edges = a.join(b, "s_nationkey").filter(
        F.col("a.s_suppkey") != F.col("b.s_suppkey")
    ).select(F.col("a.s_suppkey").alias("src"), F.col("b.s_suppkey").alias("dst"))
    feats = supp.select(
        F.col("s_suppkey").alias("node"),
        # s_acctbal has 2 decimals: ×1e6 is exact after decimal cast
        (F.col("s_acctbal").cast("decimal(12,2)") * 1_000_000).cast("long").alias(
            "feat_micro"
        ),
    )
    out = feature_propagation(edges, feats, rounds=_FP_ROUNDS)
    return out.select(
        F.col("node").alias("s_suppkey"), F.col("feat_micro").alias("smoothed_micro")
    )


def _feature_prop_oracle(rounds: int) -> str:
    head = """
WITH edges AS (
  SELECT a.s_suppkey AS src, b.s_suppkey AS dst
  FROM supplier a JOIN supplier b ON a.s_nationkey = b.s_nationkey
  WHERE a.s_suppkey <> b.s_suppkey
),
x0 AS (SELECT s_suppkey AS node,
              CAST(CAST(s_acctbal AS DECIMAL(12,2)) * 1000000 AS BIGINT) AS feat
       FROM supplier)"""
    steps = []
    for i in range(1, rounds + 1):
        steps.append(f""",
nb{i} AS (
  SELECT e.dst AS node,
         CAST(FLOOR((2 * CAST(SUM(x.feat) AS BIGINT) + COUNT(*)) / (2.0 * COUNT(*))) AS BIGINT) AS m
  FROM edges e JOIN x{i-1} x ON e.src = x.node
  GROUP BY e.dst
),
x{i} AS (
  SELECT x.node,
         CASE WHEN nb{i}.m IS NOT NULL
              THEN CAST(FLOOR((2 * x.feat + 2 * nb{i}.m + 2) / 4.0) AS BIGINT)
              ELSE x.feat END AS feat
  FROM x{i-1} x LEFT JOIN nb{i} ON x.node = nb{i}.node
)""")
    return head + "".join(steps) + f"""
SELECT node AS s_suppkey, feat AS smoothed_micro FROM x{rounds}
"""


ORACLE_FEATURE_PROP = _feature_prop_oracle(_FP_ROUNDS)

QUERIES["feature_propagation"] = q_feature_propagation
ORACLES["feature_propagation"] = ORACLE_FEATURE_PROP


# --- salted join (explicit skew mitigation, value-checked) ---------------


def q_salted_status_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders enriched with per-status stats through operators/skew.py
    `salted_join` — o_orderstatus has 3 values over the whole table,
    the canonical pathological-key shape where one reducer would
    otherwise take the entire probe side. The build side (3 rows) is
    replicated 8x and the probe scattered by a row hash, so each hot
    key spreads over 8 tasks; the oracle is the PLAIN join — salting
    must be invisible in the values. above_avg compares through the
    exact decimal sum (price > avg as double division of the decimal
    total — identical IEEE ops both engines)."""
    from kg_etl_spark.operators.skew import salted_join

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    stats = orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("status_n"),
        F.sum(F.col("o_totalprice").cast(DEC)).alias("_tot"),
    )
    joined = salted_join(orders, stats, on="o_orderstatus", salt=8)
    return joined.select(
        "o_orderkey",
        "o_orderstatus",
        "status_n",
        F.round(F.col("_tot").cast("double") / F.col("status_n"), 6).alias("status_avg"),
        (
            F.col("o_totalprice") > F.col("_tot").cast("double") / F.col("status_n")
        ).alias("above_avg"),
    )


ORACLE_SALTED_STATUS = """
WITH s AS (
  SELECT o_orderstatus, COUNT(*) AS status_n,
         SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS tot
  FROM orders GROUP BY o_orderstatus
)
SELECT o.o_orderkey, o.o_orderstatus, s.status_n,
       ROUND(CAST(s.tot AS DOUBLE) / s.status_n, 6) AS status_avg,
       (o.o_totalprice > CAST(s.tot AS DOUBLE) / s.status_n) AS above_avg
FROM orders o JOIN s USING (o_orderstatus)
"""

QUERIES["salted_status_join"] = q_salted_status_join
ORACLES["salted_status_join"] = ORACLE_SALTED_STATUS


# --- item-item cosine similarity (co-occurrence recommender kernel) ------

_COS_MIN_SUPPORT = 3
_COS_TOPN = 20


def q_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item cosine over order baskets: for part pairs co-occurring
    in >= 3 orders, cosine = support / sqrt(n_a * n_b) on binary
    basket-membership vectors — the similarity kernel of item-based
    collaborative filtering (the co-occurrence counts are
    copurchase_pairs'; this normalizes them by item popularity). The
    pair join keys on l_orderkey so fan-out is bounded by basket size;
    frequencies attach by two broadcast-size joins. sqrt/division are
    single IEEE ops on exact integers — bit-identical cross-engine."""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    freq = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    a = li.alias("a")
    b = li.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= _COS_MIN_SUPPORT)
    )
    scored = (
        pairs.join(freq.select(F.col("l_partkey").alias("part_a"), F.col("n").alias("n_a")), "part_a")
        .join(freq.select(F.col("l_partkey").alias("part_b"), F.col("n").alias("n_b")), "part_b")
        .withColumn(
            "cosine",
            F.round(
                F.col("support") / F.sqrt((F.col("n_a") * F.col("n_b")).cast("double")), 6
            ),
        )
    )
    return scored.select("part_a", "part_b", "support", "n_a", "n_b", "cosine").orderBy(
        F.col("cosine").desc(), F.col("part_a").asc(), F.col("part_b").asc()
    ).limit(_COS_TOPN)


ORACLE_ITEM_COSINE = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
f AS (SELECT l_partkey, COUNT(*) AS n FROM li GROUP BY l_partkey),
p AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS support
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {_COS_MIN_SUPPORT}
)
SELECT part_a, part_b, support, fa.n AS n_a, fb.n AS n_b,
       ROUND(support / sqrt(CAST(fa.n * fb.n AS DOUBLE)), 6) AS cosine
FROM p JOIN f fa ON fa.l_partkey = part_a JOIN f fb ON fb.l_partkey = part_b
ORDER BY cosine DESC, part_a ASC, part_b ASC LIMIT {_COS_TOPN}
"""

QUERIES["item_cosine"] = q_item_cosine
ORACLES["item_cosine"] = ORACLE_ITEM_COSINE


def q_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bucket equi-depth histogram of l_extendedprice (count/min/max
    per bucket) — the boundary summary an optimizer/partitioner derives
    before range-partitioning a key (the round-7 device theme as a
    user-facing query). NTILE over the unique total order (price,
    orderkey, linenumber) rides the two-phase exact rank
    (rankdev.global_ntile), so both engines bucket identically and no
    single-partition window exists. Only order-free aggregates
    (count/min/max) are published: the prices are doubles and a SUM
    would be association-order-dependent."""
    from kg_etl_spark.operators.rankdev import global_ntile

    li = read_table(spark, sf_dir, "lineitem")
    t = global_ntile(
        li,
        "l_extendedprice",
        16,
        tiebreaks=["l_orderkey", "l_linenumber"],
        out_col="tile",
    )
    return t.groupBy(F.col("tile").cast("long").alias("tile")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_extendedprice").alias("lo_price"),
        F.max("l_extendedprice").alias("hi_price"),
    )


ORACLE_EQUIDEPTH_HIST = """
WITH t AS (
  SELECT l_extendedprice,
         NTILE(16) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS tile
  FROM lineitem
)
SELECT CAST(tile AS BIGINT) AS tile, CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(l_extendedprice) AS lo_price, MAX(l_extendedprice) AS hi_price
FROM t GROUP BY tile
"""

QUERIES["equidepth_histogram"] = q_equidepth_histogram
ORACLES["equidepth_histogram"] = ORACLE_EQUIDEPTH_HIST
