"""Data-quality audit catalog (operators/audit.py): referential
integrity across every TPC-H-ish FK edge, single-pass column profiling,
and an equi-width price histogram. The pre-flight checks a 100 TB
ingest runs before heavier processing."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kg_etl_spark.operators.audit import (
    column_profile,
    equi_width_histogram,
    fk_orphan_counts,
)
from kg_etl_spark.queries.relational import DECP
from kg_etl_spark.session import read_table

_FK_EDGES = (
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
)


def q_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = [
        (name, read_table(spark, sf_dir, child), ck, read_table(spark, sf_dir, parent), pk)
        for name, child, ck, parent, pk in _FK_EDGES
    ]
    return fk_orphan_counts(pairs)


ORACLE_FK_ORPHANS = "\nUNION ALL\n".join(
    f"""SELECT '{name}' AS relationship,
       (SELECT count(*) FROM {child}) AS n_child,
       (SELECT count(*) FROM {child} c
         WHERE c.{ck} IS NOT NULL
           AND NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pk} = c.{ck})) AS n_orphans"""
    for name, child, ck, parent, pk in _FK_EDGES
)


_PROFILE_COLS = ("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return column_profile(orders, _PROFILE_COLS)


ORACLE_PROFILE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column_name, count(*) AS n_rows,
       count(*) - count({c}) AS n_nulls,
       count(DISTINCT {c}) AS n_distinct
FROM orders"""
    for c in _PROFILE_COLS
)


def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return equi_width_histogram(orders, "o_totalprice", n_buckets=10)


ORACLE_HISTOGRAM = """
WITH s AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders),
b AS (
  SELECT least(CAST(floor((o_totalprice - s.lo) / ((s.hi - s.lo) / 10.0)) AS BIGINT), 9) AS bucket,
         s.lo AS glo, (s.hi - s.lo) / 10.0 AS width
  FROM orders CROSS JOIN s
)
SELECT bucket,
       min(ROUND(glo + bucket * width, 6)) AS lo,
       min(ROUND(glo + (bucket + 1) * width, 6)) AS hi,
       count(*) AS n
FROM b
GROUP BY bucket
"""


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection on the skewed event-value stream:
    |x − median| > 3·1.4826·MAD. Two one-row aggregates (exact
    interpolated medians, same semantics as DuckDB quantile_cont)
    broadcast back over the scan; at 100 TB swap the exact percentile
    for percentile_approx — the filter shape is unchanged."""
    from pyspark.sql import functions as F

    ev = read_table(spark, sf_dir, "events").select("event_id", "value")
    med = ev.agg(F.expr("percentile(value, 0.5)").alias("med"))
    j = ev.crossJoin(F.broadcast(med))
    mad = j.agg(F.expr("percentile(abs(value - med), 0.5)").alias("mad"))
    dev = F.abs(F.col("value") - F.col("med"))
    return (
        j.crossJoin(F.broadcast(mad))
        .filter(dev > F.lit(3.0) * F.lit(1.4826) * F.col("mad"))
        .select("event_id", "value", F.round(dev, 6).alias("deviation"))
    )


ORACLE_MAD = """
WITH m AS (SELECT quantile_cont(value, 0.5) AS med FROM events),
d AS (SELECT event_id, value, abs(value - m.med) AS dev FROM events, m),
s AS (SELECT quantile_cont(dev, 0.5) AS mad FROM d)
SELECT event_id, value, ROUND(dev, 6) AS deviation
FROM d, s WHERE dev > 3.0 * 1.4826 * s.mad
"""


def q_grouped_numeric_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped numeric column profile — n/mean/stddev/min/max plus
    EXACT interpolated p50/p95/p99 per return flag, one aggregate pass.
    Mean and stddev come from decimal power sums (order-independent,
    the measure_correlations idiom); percentiles are Spark `percentile`
    = DuckDB `quantile_cont` (verified value-identical). At 100 TB swap
    percentile for percentile_approx (t-digest) — the plan shape (one
    grouped aggregate, no join) is unchanged."""
    from pyspark.sql import functions as F

    li = read_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    dec = F.col("l_extendedprice").cast("decimal(19,6)")
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).alias("_sx"),
        F.sum(dec * dec).alias("_sxx"),
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.95)), 6).alias("p95"),
        F.round(F.percentile("l_extendedprice", F.lit(0.99)), 6).alias("p99"),
        F.round(F.min("l_extendedprice"), 6).alias("min_v"),
        F.round(F.max("l_extendedprice"), 6).alias("max_v"),
    )
    sx = F.col("_sx").cast("double")
    sxx = F.col("_sxx").cast("double")
    n = F.col("n").cast("double")
    return g.select(
        "l_returnflag",
        "n",
        F.round(sx / n, 6).alias("mean_v"),
        F.round(F.sqrt((sxx - sx * sx / n) / (n - F.lit(1.0))), 6).alias("stddev_v"),
        "p50", "p95", "p99", "min_v", "max_v",
    )


ORACLE_GROUPED_PROFILE = """
WITH a AS (
  SELECT l_returnflag, COUNT(*) AS n,
         SUM(CAST(l_extendedprice AS DECIMAL(19,6))) AS sx,
         SUM(CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS sxx,
         ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
         ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS p95,
         ROUND(quantile_cont(l_extendedprice, 0.99), 6) AS p99,
         ROUND(MIN(l_extendedprice), 6) AS min_v,
         ROUND(MAX(l_extendedprice), 6) AS max_v
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       ROUND(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_v,
       ROUND(SQRT((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                  / (CAST(n AS DOUBLE) - 1.0)), 6) AS stddev_v,
       p50, p95, p99, min_v, max_v
FROM a
"""


def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile winsorization: clip event values into [p01, p99] —
    the standard tail-taming step before training-statistics. One
    one-row exact-percentile aggregate broadcast over the scan; clip is
    map-side (swap percentile_approx at full scale)."""
    from pyspark.sql import functions as F

    ev = read_table(spark, sf_dir, "events").select("event_id", "value")
    pct = ev.agg(
        F.expr("percentile(value, 0.01)").alias("p_lo"),
        F.expr("percentile(value, 0.99)").alias("p_hi"),
    )
    return ev.crossJoin(F.broadcast(pct)).select(
        "event_id",
        "value",
        F.round(F.least(F.greatest(F.col("value"), F.col("p_lo")), F.col("p_hi")), 6).alias(
            "clipped"
        ),
    )


ORACLE_WINSORIZE = """
WITH p AS (
  SELECT quantile_cont(value, 0.01) AS p_lo, quantile_cont(value, 0.99) AS p_hi FROM events
)
SELECT event_id, value, ROUND(least(greatest(value, p_lo), p_hi), 6) AS clipped
FROM events, p
"""


QUERIES = {
    "fk_orphans": q_fk_orphans,
    "column_profile": q_column_profile,
    "price_histogram": q_price_histogram,
    "mad_outliers": q_mad_outliers,
    "winsorize": q_winsorize,
    "grouped_numeric_profile": q_grouped_numeric_profile,
}

ORACLES = {
    "fk_orphans": ORACLE_FK_ORPHANS,
    "column_profile": ORACLE_PROFILE,
    "price_histogram": ORACLE_HISTOGRAM,
    "mad_outliers": ORACLE_MAD,
    "winsorize": ORACLE_WINSORIZE,
    "grouped_numeric_profile": ORACLE_GROUPED_PROFILE,
}


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-anonymity audit of customers over (nationkey, mktsegment)
    quasi-identifiers (operators/audit.py `k_anonymity`)."""
    from kg_etl_spark.operators.audit import k_anonymity

    cust = read_table(spark, sf_dir, "customer")
    return k_anonymity(cust, ["c_nationkey", "c_mktsegment"], k=10)


ORACLE_K_ANONYMITY = """
SELECT c_nationkey, c_mktsegment, COUNT(*) AS class_size,
       COUNT(*) >= 10 AS meets_k
FROM customer GROUP BY c_nationkey, c_mktsegment
"""


def q_k_anonymity_suppress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enforcement: rows surviving k=10 suppression (broadcast
    semi-join of passing classes; the data never shuffles)."""
    from kg_etl_spark.operators.audit import k_anonymity_suppress

    cust = read_table(spark, sf_dir, "customer")
    return k_anonymity_suppress(cust, ["c_nationkey", "c_mktsegment"], k=10).select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )


ORACLE_K_ANON_SUPPRESS = """
SELECT c_custkey, c_nationkey, c_mktsegment FROM customer
WHERE (c_nationkey, c_mktsegment) IN (
  SELECT (c_nationkey, c_mktsegment) FROM customer
  GROUP BY c_nationkey, c_mktsegment HAVING COUNT(*) >= 10
)
"""

QUERIES["k_anonymity"] = q_k_anonymity
ORACLES["k_anonymity"] = ORACLE_K_ANONYMITY
QUERIES["k_anonymity_suppress"] = q_k_anonymity_suppress
ORACLES["k_anonymity_suppress"] = ORACLE_K_ANON_SUPPRESS


_PSI_CUT = "1996-01-01"


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability drift of order totals: pre-1996 orders are
    the reference snapshot, the rest the current one (operators/audit.py
    `psi_drift`; exact reference-quantile buckets, 6-dp edges)."""
    from kg_etl_spark.operators.audit import psi_drift

    orders = read_table(spark, sf_dir, "orders")
    ref = orders.filter(F.col("o_orderdate") < _PSI_CUT)
    cur = orders.filter(F.col("o_orderdate") >= _PSI_CUT)
    return psi_drift(ref, cur, "o_totalprice", n_buckets=10)


_PSI_PROBS = "[" + ", ".join(str(i / 10) for i in range(1, 10)) + "]"

ORACLE_PSI = f"""
WITH ref AS (SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders WHERE o_orderdate < '{_PSI_CUT}'),
cur AS (SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders WHERE o_orderdate >= '{_PSI_CUT}'),
e AS (
  SELECT list_transform(quantile_cont(v, {_PSI_PROBS}), x -> ROUND(x, 6)) AS edges
  FROM ref
),
nref AS (SELECT COUNT(*) AS n FROM ref),
ncur AS (SELECT COUNT(*) AS n FROM cur),
rh AS (
  SELECT len(list_filter(e.edges, t -> v > t)) AS bucket, COUNT(*) AS c
  FROM ref, e GROUP BY 1
),
ch AS (
  SELECT len(list_filter(e.edges, t -> v > t)) AS bucket, COUNT(*) AS c
  FROM cur, e GROUP BY 1
),
b AS (SELECT unnest(range(0, 10)) AS bucket),
shares AS (
  SELECT b.bucket,
         CASE WHEN rh.c IS NOT NULL THEN greatest(CAST(rh.c AS DOUBLE), 0.5) / nref.n
              ELSE 0.5 / nref.n END AS ref_share,
         CASE WHEN ch.c IS NOT NULL THEN greatest(CAST(ch.c AS DOUBLE), 0.5) / ncur.n
              ELSE 0.5 / ncur.n END AS cur_share
  FROM b LEFT JOIN rh ON b.bucket = rh.bucket
         LEFT JOIN ch ON b.bucket = ch.bucket, nref, ncur
)
SELECT CAST(bucket AS INT) AS bucket,
       ROUND(ref_share, 6) AS ref_share,
       ROUND(cur_share, 6) AS cur_share,
       ROUND((cur_share - ref_share) * ln(cur_share / ref_share), 6) AS psi_term
FROM shares
"""

QUERIES["psi_drift"] = q_psi_drift
ORACLES["psi_drift"] = ORACLE_PSI


def q_quarantine_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level quarantine: lineitem rows routed by their first
    failing rule (sorted-name order); output is the per-queue census
    including the clean queue (operators/audit.py `quarantine_split`)."""
    from kg_etl_spark.operators.audit import quarantine_split

    li = read_table(spark, sf_dir, "lineitem")
    rules = {
        "discount_low": F.col("l_discount") <= 0.05,
        "quantity_sane": F.col("l_quantity") <= 45,
        "tax_low": F.col("l_tax") <= 0.03,
    }
    good, bad = quarantine_split(li, rules)
    census = bad.groupBy("failed_rule").agg(F.count(F.lit(1)).alias("n"))
    clean = good.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("__clean__").alias("failed_rule"), "n"
    )
    return census.unionByName(clean)


ORACLE_QUARANTINE = """
WITH tagged AS (
  SELECT CASE
    WHEN NOT COALESCE(l_discount <= 0.05, FALSE) THEN 'discount_low'
    WHEN NOT COALESCE(l_quantity <= 45, FALSE) THEN 'quantity_sane'
    WHEN NOT COALESCE(l_tax <= 0.03, FALSE) THEN 'tax_low'
    ELSE '__clean__' END AS failed_rule
  FROM lineitem
)
SELECT failed_rule, COUNT(*) AS n FROM tagged GROUP BY failed_rule
"""

QUERIES["quarantine_split"] = q_quarantine_split
ORACLES["quarantine_split"] = ORACLE_QUARANTINE


def q_lang_mix_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source language-mix drift: KL(P(lang|source) || P(lang)) —
    how far each source's language distribution sits from the corpus
    mix; the profiling signal behind mixture rebalancing. Exact count
    ratios, one grouped aggregate + a broadcast of the |langs|-row
    global distribution; KL terms rounded then decimal-summed."""
    docs = read_table(spark, sf_dir, "documents")
    per = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n_sl"))
    per_source = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    glob = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    n_total = docs.count()
    j = per.join(F.broadcast(per_source), "source").join(F.broadcast(glob), "lang")
    p = F.col("n_sl").cast("double") / F.col("n_s").cast("double")
    q = F.col("n_l").cast("double") / F.lit(float(n_total))
    term = F.round(p * F.log(p / q), 6).cast("decimal(28,6)")
    return (
        j.withColumn("_t", term)
        .groupBy("source")
        .agg(F.round(F.sum("_t").cast("double"), 6).alias("kl_divergence"))
    )


ORACLE_LANG_KL = """
WITH per AS (SELECT source, lang, COUNT(*) AS n_sl FROM documents GROUP BY source, lang),
ps AS (SELECT source, COUNT(*) AS n_s FROM documents GROUP BY source),
gl AS (SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY lang),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
t AS (
  SELECT per.source,
         CAST(ROUND(
           (CAST(n_sl AS DOUBLE) / n_s)
           * ln((CAST(n_sl AS DOUBLE) / n_s) / (CAST(n_l AS DOUBLE) / tot.n)), 6)
         AS DECIMAL(28,6)) AS term
  FROM per JOIN ps ON per.source = ps.source JOIN gl ON per.lang = gl.lang, tot
)
SELECT source, ROUND(CAST(SUM(term) AS DOUBLE), 6) AS kl_divergence
FROM t GROUP BY source
"""

QUERIES["lang_mix_divergence"] = q_lang_mix_divergence
ORACLES["lang_mix_divergence"] = ORACLE_LANG_KL


def q_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of revenue across suppliers,
    per nation: HHI = Σ share_i² over the nation's suppliers (1/n =
    perfectly even, 1 = monopolized) — the dependency-risk profile of
    the supply graph. Decimal revenue sums; shares squared then
    rounded+decimal-summed for order independence."""
    li = read_table(spark, sf_dir, "lineitem")
    sup = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    rev = F.col("l_extendedprice").cast(DECP) * (
        F.lit(1).cast(DECP) - F.col("l_discount").cast(DECP)
    )
    # supplier is SF-SCALED (1e9 rows at TPC-H-proportioned 100 TB) —
    # exactly hint class (a) the r7 audit removed: unhinted join
    per_sup = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .groupBy("s_nationkey", "s_suppkey")
        .agg(F.sum(rev).alias("_r"))
    )
    per_nation = per_sup.groupBy("s_nationkey").agg(
        F.sum("_r").alias("_tot"), F.count(F.lit(1)).alias("n_suppliers")
    )
    j = per_sup.join(per_nation, "s_nationkey")
    share2 = F.round(
        (F.col("_r").cast("double") / F.col("_tot").cast("double"))
        * (F.col("_r").cast("double") / F.col("_tot").cast("double")),
        9,
    ).cast("decimal(28,9)")
    return (
        j.withColumn("_s2", share2)
        .groupBy("s_nationkey", "n_suppliers")
        .agg(F.round(F.sum("_s2").cast("double"), 6).alias("hhi"))
    )


ORACLE_HHI = """
WITH per_sup AS (
  SELECT s.s_nationkey, s.s_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,6))
             * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))) AS r
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY s.s_nationkey, s.s_suppkey
),
per_nation AS (
  SELECT s_nationkey, SUM(r) AS tot, COUNT(*) AS n_suppliers
  FROM per_sup GROUP BY s_nationkey
),
t AS (
  SELECT p.s_nationkey, n.n_suppliers,
         CAST(ROUND((CAST(p.r AS DOUBLE) / CAST(n.tot AS DOUBLE))
                    * (CAST(p.r AS DOUBLE) / CAST(n.tot AS DOUBLE)), 9)
              AS DECIMAL(28,9)) AS s2
  FROM per_sup p JOIN per_nation n ON p.s_nationkey = n.s_nationkey
)
SELECT s_nationkey, n_suppliers, ROUND(CAST(SUM(s2) AS DOUBLE), 6) AS hhi
FROM t GROUP BY s_nationkey, n_suppliers
"""

QUERIES["revenue_concentration"] = q_revenue_concentration
ORACLES["revenue_concentration"] = ORACLE_HHI


def q_chi_square_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence of order priority × order status
    (operators/audit.py `chi_square`)."""
    from kg_etl_spark.operators.audit import chi_square

    orders = read_table(spark, sf_dir, "orders")
    return chi_square(orders, "o_orderpriority", "o_orderstatus")


ORACLE_CHI_SQUARE = """
WITH cells AS (
  SELECT o_orderpriority AS a, o_orderstatus AS b, COUNT(*) AS obs
  FROM orders GROUP BY 1, 2
), rt AS (SELECT a, SUM(obs) AS rt FROM cells GROUP BY a),
   ct AS (SELECT b, SUM(obs) AS ct FROM cells GROUP BY b),
   n AS (SELECT CAST(SUM(obs) AS BIGINT) AS n,
                COUNT(DISTINCT a) AS na, COUNT(DISTINCT b) AS nb
         FROM cells),
   contrib AS (
  -- grid = marginals' cross product: unobserved cells contribute exp
  SELECT CAST(ROUND(
           (CAST(COALESCE(cells.obs, 0) AS DOUBLE) - CAST(rt.rt * ct.ct AS DOUBLE) / CAST(n.n AS DOUBLE))
           * (CAST(COALESCE(cells.obs, 0) AS DOUBLE) - CAST(rt.rt * ct.ct AS DOUBLE) / CAST(n.n AS DOUBLE))
           / (CAST(rt.rt * ct.ct AS DOUBLE) / CAST(n.n AS DOUBLE)), 6) AS DECIMAL(28,6)) AS c
  FROM rt CROSS JOIN ct LEFT JOIN cells ON cells.a = rt.a AND cells.b = ct.b, n
)
SELECT ROUND(CAST(SUM(c) AS DOUBLE), 6) AS chi2,
       CAST((n.na - 1) * (n.nb - 1) AS BIGINT) AS dof,
       n.n
FROM contrib, n GROUP BY n.na, n.nb, n.n
"""

QUERIES["chi_square_priority_status"] = q_chi_square_priority_status
ORACLES["chi_square_priority_status"] = ORACLE_CHI_SQUARE


def q_quantile_normalize_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source n_chars distributions mapped onto the global
    distribution (operators/datapipe.py `quantile_normalize`)."""
    from kg_etl_spark.operators.datapipe import quantile_normalize

    docs = read_table(spark, sf_dir, "documents")
    return quantile_normalize(docs, "n_chars", "source", "doc_id")


ORACLE_QUANTILE_NORM = """
WITH base AS (
  SELECT doc_id, source, CAST(n_chars AS DOUBLE) AS v
  FROM documents WHERE n_chars IS NOT NULL
), n AS (SELECT COUNT(*) AS nt FROM base),
gl AS (
  SELECT v AS gv, ROW_NUMBER() OVER (ORDER BY v, doc_id) AS grn FROM base
), grp AS (
  SELECT doc_id, source, v,
         CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY v, doc_id) - 1 AS DOUBLE) AS r0,
         CAST(GREATEST(COUNT(*) OVER (PARTITION BY source) - 1, 1) AS DOUBLE) AS d
  FROM base
)
SELECT g.doc_id, g.source, g.v AS n_chars,
       ROUND(g.r0 / g.d, 6) AS pr,
       gl.gv AS norm_value
FROM grp g CROSS JOIN n JOIN gl ON CAST(ROUND(g.r0 / g.d * (n.nt - 1), 0) AS BIGINT) + 1 = gl.grn
"""

QUERIES["quantile_normalize_chars"] = q_quantile_normalize_chars
ORACLES["quantile_normalize_chars"] = ORACLE_QUANTILE_NORM


# --- Calibration: binned reliability + per-bin Brier --------------------


_RELI_STOPS = ["the", "a", "an", "and", "or", "of", "in", "on", "at", "to", "is"]


def q_brier_reliability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + per-bin Brier for the classic zero-shot
    quality classifier "stopword fraction predicts English": score
    s = |stopword tokens| / |tokens| per document, label y = (lang =
    'en'), 10 equal-width score bins. Per bin: count, mean score,
    empirical rate, Brier contribution mean((s−y)²) — the calibration
    readout every corpus-filter classifier ships with (pairs with
    isotonic_calibration, which FITS the correction this DIAGNOSES).

    Determinism: s is one IEEE divide of exact integers (bit-identical
    cross-engine); binning floors s·10 on identical doubles; bin
    aggregates sum 9 dp-rounded decimals (order-free) with one divide
    + 6 dp round at output.

    100 TB shape: map-side score projection, ONE ≤10-row hash
    aggregate. Corpus-bandwidth-bound."""
    docs = read_table(spark, sf_dir, "documents")
    from kg_etl_spark.operators.textquality import ws_tokens

    toks = ws_tokens(F.col("text"))
    stops = F.array(*[F.lit(s) for s in _RELI_STOPS])
    scored = docs.select(
        (F.col("lang") == "en").cast("long").alias("y"),
        F.size(F.filter(toks, lambda t: F.array_contains(stops, t))).alias("ns"),
        F.size(toks).alias("nt"),
    ).filter(F.col("nt") > 0)
    s = F.col("ns").cast("double") / F.col("nt").cast("double")
    binned = scored.select(
        "y",
        F.least(F.floor(s * 10).cast("int"), F.lit(9)).alias("bin"),
        F.round(s, 9).cast("decimal(28,12)").alias("s9"),
        F.round((s - F.col("y").cast("double")) * (s - F.col("y").cast("double")), 9)
        .cast("decimal(28,12)")
        .alias("b9"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("s9").cast("double") / F.count(F.lit(1)).cast("double"), 6).alias(
                "avg_score"
            ),
            F.round(F.sum("y").cast("double") / F.count(F.lit(1)).cast("double"), 6).alias(
                "rate"
            ),
            F.round(F.sum("b9").cast("double") / F.count(F.lit(1)).cast("double"), 6).alias(
                "brier"
            ),
        )
    )


_RELI_STOPS_SQL = "[" + ", ".join(f"'{w}'" for w in _RELI_STOPS) + "]"

ORACLE_BRIER_RELIABILITY = f"""
WITH t AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                     x -> len(x) > 0) AS toks
  FROM documents
), sc AS (
  SELECT y,
         CAST(len(list_filter(toks, x -> list_contains({_RELI_STOPS_SQL}, x)))
              AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS s
  FROM t WHERE len(toks) > 0
), b AS (
  SELECT y, LEAST(CAST(FLOOR(s * 10) AS INT), 9) AS bin,
         CAST(ROUND(s, 9) AS DECIMAL(28,12)) AS s9,
         CAST(ROUND((s - y) * (s - y), 9) AS DECIMAL(28,12)) AS b9
  FROM sc
)
SELECT bin, COUNT(*) AS n,
       ROUND(CAST(SUM(s9) AS DOUBLE) / COUNT(*), 6) AS avg_score,
       ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS rate,
       ROUND(CAST(SUM(b9) AS DOUBLE) / COUNT(*), 6) AS brier
FROM b GROUP BY bin
"""

QUERIES["brier_reliability"] = q_brier_reliability
ORACLES["brier_reliability"] = ORACLE_BRIER_RELIABILITY


def q_cramers_v_segment_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V (+ Bergsma bias-corrected Ṽ) between customer
    market segment and nation — the effect-size companion to the
    chi-square independence audit (operators/audit.py `cramers_v`;
    r11). A dataset-card correlation number that, unlike raw χ²,
    is comparable across table sizes."""
    from kg_etl_spark.operators.audit import cramers_v

    cust = read_table(spark, sf_dir, "customer")
    return cramers_v(cust, "c_mktsegment", "c_nationkey")


ORACLE_CRAMERS_V = """
WITH cells AS (
  SELECT c_mktsegment AS a, c_nationkey AS b, COUNT(*) AS obs
  FROM customer GROUP BY 1, 2
), rt AS (SELECT a, SUM(obs) AS rt FROM cells GROUP BY a),
   ct AS (SELECT b, SUM(obs) AS ct FROM cells GROUP BY b),
   n AS (SELECT CAST(SUM(obs) AS BIGINT) AS n,
                COUNT(DISTINCT a) AS na, COUNT(DISTINCT b) AS nb
         FROM cells),
   contrib AS (
  SELECT CAST(ROUND(
           (CAST(COALESCE(cells.obs, 0) AS DOUBLE) - CAST(rt.rt * ct.ct AS DOUBLE) / CAST(n.n AS DOUBLE))
           * (CAST(COALESCE(cells.obs, 0) AS DOUBLE) - CAST(rt.rt * ct.ct AS DOUBLE) / CAST(n.n AS DOUBLE))
           / (CAST(rt.rt * ct.ct AS DOUBLE) / CAST(n.n AS DOUBLE)), 6) AS DECIMAL(28,6)) AS c
  FROM rt CROSS JOIN ct LEFT JOIN cells ON cells.a = rt.a AND cells.b = ct.b, n
), folded AS (
  SELECT CAST(SUM(c) AS DOUBLE) AS chi2, MAX(n.n) AS n, MAX(n.na) AS na, MAX(n.nb) AS nb
  FROM contrib, n
)
SELECT ROUND(chi2, 6) AS chi2,
       CAST(n AS BIGINT) AS n,
       ROUND(SQRT(chi2 / n / LEAST(na - 1.0, nb - 1.0)), 6) AS cramers_v,
       ROUND(SQRT(GREATEST(0.0, chi2 / n - (na - 1.0) * (nb - 1.0) / (n - 1.0))
                  / LEAST(na - (na - 1.0) * (na - 1.0) / (n - 1.0) - 1.0,
                          nb - (nb - 1.0) * (nb - 1.0) / (n - 1.0) - 1.0)), 6) AS cramers_v_corrected
FROM folded
"""

QUERIES["cramers_v_segment_nation"] = q_cramers_v_segment_nation
ORACLES["cramers_v_segment_nation"] = ORACLE_CRAMERS_V
