"""Classical-ML query family: training and applying small models with
aggregate-only distributed work and exact cross-engine arithmetic.

Reference parity: the reference (chaayagirimon/kg-etl) ships scoring /
classification helpers as pandas post-processing over its ETL output
(diagnostics + enrichment stages); here each model is re-expressed
Spark-first — train = a handful of hash aggregates whose outputs are
MODEL STATE (broadcastable, bounded by cardinality not corpus size),
apply = broadcast joins + map-side expressions. Nothing iterates over
``collect()``-ed corpus data.

Determinism contract (catalog-wide): every floating-point expression
uses ONLY IEEE +,-,×,÷ over exactly-representable integers in a pinned
association order — bit-identical in Spark and DuckDB — never libm
(ln/exp/pow), so the oracles replay scores exactly. Ranks/argmaxes all
carry total tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kg_etl_spark.session import read_table

QUERIES = {}
ORACLES = {}


# --- Naive Bayes: train on half the customers, confusion matrix -------


def q_naive_bayes_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes predicting `c_mktsegment` from two
    categorical features (nation, ⌊acctbal/2000⌋ bucket), trained on
    even custkeys and evaluated on odd — output is the test confusion
    matrix (actual, predicted, n).

    Laplace-smoothed posterior score per class c:
        s(c) = (n_c+1)/(N+C) · (n_{c,f1}+1)/(n_c+K1) · (n_{c,f2}+1)/(n_c+K2)
    computed as left-associated double products of double quotients of
    exact integers — IEEE-identical in both engines, so the argmax
    (ties → lexicographically LAST class, the struct-max order) is
    value-checkable with no planted twin.

    100 TB shape: training is three hash aggregates whose outputs are
    bounded by |classes|·|feature values| (model state, broadcast);
    scoring fans each test row out |classes|× via a broadcast join and
    reduces with one hash aggregate keyed by the row id — no shuffle
    ever carries more than |classes|× the test rows, and the final
    confusion matrix is |classes|² rows."""
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_mktsegment").alias("actual"),
        F.col("c_nationkey").alias("f1"),
        F.floor(F.col("c_acctbal") / 2000.0).cast("long").alias("f2"),
    )
    train = cust.filter(F.col("c_custkey") % 2 == 0)
    test = cust.filter(F.col("c_custkey") % 2 == 1)

    cls = train.groupBy(F.col("actual").alias("cls")).agg(
        F.count(F.lit(1)).alias("n_c")
    )
    consts = train.agg(
        F.count(F.lit(1)).alias("nn"),
        F.count_distinct("actual").alias("cc"),
        F.count_distinct("f1").alias("k1"),
        F.count_distinct("f2").alias("k2"),
    )
    f1c = train.groupBy(F.col("actual").alias("cls"), "f1").agg(
        F.count(F.lit(1)).alias("n1")
    )
    f2c = train.groupBy(F.col("actual").alias("cls"), "f2").agg(
        F.count(F.lit(1)).alias("n2")
    )

    p0 = (F.col("n_c") + 1).cast("double") / (F.col("nn") + F.col("cc")).cast("double")
    p1 = (F.coalesce("n1", F.lit(0)) + 1).cast("double") / (
        F.col("n_c") + F.col("k1")
    ).cast("double")
    p2 = (F.coalesce("n2", F.lit(0)) + 1).cast("double") / (
        F.col("n_c") + F.col("k2")
    ).cast("double")
    scored = (
        test.crossJoin(F.broadcast(cls))
        .join(F.broadcast(f1c), ["cls", "f1"], "left")
        .join(F.broadcast(f2c), ["cls", "f2"], "left")
        .crossJoin(F.broadcast(consts))
        .select(
            "c_custkey",
            "actual",
            "cls",
            ((p0 * p1) * p2).alias("score"),
        )
    )
    pred = scored.groupBy("c_custkey", "actual").agg(
        F.max(F.struct("score", "cls"))["cls"].alias("predicted")
    )
    return pred.groupBy("actual", "predicted").agg(F.count(F.lit(1)).alias("n"))


ORACLE_NAIVE_BAYES = """
WITH c AS (
  SELECT c_custkey, c_mktsegment AS actual, c_nationkey AS f1,
         CAST(FLOOR(c_acctbal / 2000.0) AS BIGINT) AS f2
  FROM customer
), train AS (SELECT * FROM c WHERE c_custkey % 2 = 0),
test AS (SELECT * FROM c WHERE c_custkey % 2 = 1),
cls AS (SELECT actual AS cls, COUNT(*) AS n_c FROM train GROUP BY actual),
consts AS (
  SELECT COUNT(*) AS nn, COUNT(DISTINCT actual) AS cc,
         COUNT(DISTINCT f1) AS k1, COUNT(DISTINCT f2) AS k2
  FROM train
),
f1c AS (SELECT actual AS cls, f1, COUNT(*) AS n1 FROM train GROUP BY actual, f1),
f2c AS (SELECT actual AS cls, f2, COUNT(*) AS n2 FROM train GROUP BY actual, f2),
scored AS (
  SELECT t.c_custkey, t.actual, cl.cls,
         ((CAST(cl.n_c + 1 AS DOUBLE) / CAST(co.nn + co.cc AS DOUBLE))
          * (CAST(COALESCE(a.n1, 0) + 1 AS DOUBLE) / CAST(cl.n_c + co.k1 AS DOUBLE)))
         * (CAST(COALESCE(b.n2, 0) + 1 AS DOUBLE) / CAST(cl.n_c + co.k2 AS DOUBLE))
           AS score
  FROM test t
  CROSS JOIN cls cl
  LEFT JOIN f1c a ON a.cls = cl.cls AND a.f1 = t.f1
  LEFT JOIN f2c b ON b.cls = cl.cls AND b.f2 = t.f2
  CROSS JOIN consts co
),
pred AS (
  SELECT c_custkey, actual, cls AS predicted
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey
                                 ORDER BY score DESC, cls DESC) AS rn
    FROM scored
  ) WHERE rn = 1
)
SELECT actual, predicted, COUNT(*) AS n FROM pred GROUP BY actual, predicted
"""

QUERIES["naive_bayes_segment"] = q_naive_bayes_segment
ORACLES["naive_bayes_segment"] = ORACLE_NAIVE_BAYES


# --- Decision stump: best Gini split on account balance ---------------


_STUMP_THRESHOLDS = list(range(0, 10))  # balance thresholds 0..9 (×1000)


def q_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-rule decision stump: the best single threshold on
    ⌊c_acctbal/1000⌋ predicting "customer has ≥1 URGENT order",
    scored by weighted Gini impurity over a fixed 10-threshold grid.

    Output: one row per candidate threshold with its split counts and
    weighted Gini (6 dp), plus `is_best` marking the (gini, threshold)
    lexicographic minimum — all arithmetic is IEEE ×/÷ over exact
    integer counts in a pinned order, so both engines agree bitwise
    before the rounding.

    100 TB shape: ONE hash aggregate to ≤12 balance-bucket rows
    (bucket clipped to [-1, 9]) after a left join against the distinct
    urgent-customer set; the 10-threshold evaluation is a constant-size
    cross of that model-state frame (≤120 rows) — corpus size only
    affects the first aggregate."""
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.least(
            F.greatest(F.floor(F.col("c_acctbal") / 1000.0), F.lit(-1)), F.lit(9)
        ).cast("long").alias("bkt"),
    )
    urgent = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("_u", F.lit(1))
    )
    lab = cust.join(urgent, "c_custkey", "left").select(
        "bkt", F.coalesce("_u", F.lit(0)).alias("y")
    )
    bux = lab.groupBy("bkt").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    thr = F.explode(F.array(*[F.lit(t) for t in _STUMP_THRESHOLDS])).alias("thr")
    crossed = bux.select("bkt", "n", "pos", thr)
    splits = crossed.groupBy("thr").agg(
        F.sum(F.when(F.col("bkt") < F.col("thr"), F.col("n")).otherwise(0)).alias("n_l"),
        F.sum(F.when(F.col("bkt") < F.col("thr"), F.col("pos")).otherwise(0)).alias("p_l"),
        F.sum(F.when(F.col("bkt") >= F.col("thr"), F.col("n")).otherwise(0)).alias("n_r"),
        F.sum(F.when(F.col("bkt") >= F.col("thr"), F.col("pos")).otherwise(0)).alias("p_r"),
    )

    def gini(n, p):
        # 1 - p² - q² with q = 1-p, as (guarded) exact double ops
        frac = p.cast("double") / n.cast("double")
        g = F.lit(1.0) - frac * frac - (F.lit(1.0) - frac) * (F.lit(1.0) - frac)
        return F.when(n > 0, g).otherwise(F.lit(0.0))

    tot = (F.col("n_l") + F.col("n_r")).cast("double")
    w = (
        F.col("n_l").cast("double") / tot * gini(F.col("n_l"), F.col("p_l"))
        + F.col("n_r").cast("double") / tot * gini(F.col("n_r"), F.col("p_r"))
    )
    sc = splits.withColumn("gini_w", w)
    best = sc.agg(F.min(F.struct("gini_w", "thr")).alias("b")).select(
        F.col("b")["thr"].alias("_bt")
    )
    return (
        sc.crossJoin(F.broadcast(best))
        .select(
            "thr",
            "n_l",
            F.col("p_l").cast("long").alias("p_l"),
            "n_r",
            F.col("p_r").cast("long").alias("p_r"),
            F.round("gini_w", 6).alias("gini_w"),
            (F.col("thr") == F.col("_bt")).alias("is_best"),
        )
    )


ORACLE_DECISION_STUMP = """
WITH c AS (
  SELECT c_custkey,
         CAST(LEAST(GREATEST(FLOOR(c_acctbal / 1000.0), -1), 9) AS BIGINT) AS bkt
  FROM customer
), u AS (
  SELECT DISTINCT o_custkey AS c_custkey FROM orders
  WHERE o_orderpriority = '1-URGENT'
), lab AS (
  SELECT c.bkt, CASE WHEN u.c_custkey IS NULL THEN 0 ELSE 1 END AS y
  FROM c LEFT JOIN u USING (c_custkey)
), bux AS (
  SELECT bkt, COUNT(*) AS n, SUM(y) AS pos FROM lab GROUP BY bkt
), thr AS (SELECT UNNEST(range(0, 10)) AS thr),
splits AS (
  SELECT t.thr,
         CAST(SUM(CASE WHEN b.bkt < t.thr THEN b.n ELSE 0 END) AS BIGINT) AS n_l,
         CAST(SUM(CASE WHEN b.bkt < t.thr THEN b.pos ELSE 0 END) AS BIGINT) AS p_l,
         CAST(SUM(CASE WHEN b.bkt >= t.thr THEN b.n ELSE 0 END) AS BIGINT) AS n_r,
         CAST(SUM(CASE WHEN b.bkt >= t.thr THEN b.pos ELSE 0 END) AS BIGINT) AS p_r
  FROM bux b CROSS JOIN thr t GROUP BY t.thr
), sc AS (
  SELECT *,
         (CASE WHEN n_l > 0 THEN CAST(n_l AS DOUBLE) / CAST(n_l + n_r AS DOUBLE)
                    * (1.0 - (CAST(p_l AS DOUBLE) / CAST(n_l AS DOUBLE))
                             * (CAST(p_l AS DOUBLE) / CAST(n_l AS DOUBLE))
                           - (1.0 - CAST(p_l AS DOUBLE) / CAST(n_l AS DOUBLE))
                             * (1.0 - CAST(p_l AS DOUBLE) / CAST(n_l AS DOUBLE)))
               ELSE 0.0 END)
         + (CASE WHEN n_r > 0 THEN CAST(n_r AS DOUBLE) / CAST(n_l + n_r AS DOUBLE)
                    * (1.0 - (CAST(p_r AS DOUBLE) / CAST(n_r AS DOUBLE))
                             * (CAST(p_r AS DOUBLE) / CAST(n_r AS DOUBLE))
                           - (1.0 - CAST(p_r AS DOUBLE) / CAST(n_r AS DOUBLE))
                             * (1.0 - CAST(p_r AS DOUBLE) / CAST(n_r AS DOUBLE)))
               ELSE 0.0 END) AS gini_w
  FROM splits
), b AS (SELECT thr AS bt FROM sc ORDER BY gini_w, thr LIMIT 1)
SELECT thr, n_l, p_l, n_r, p_r, ROUND(gini_w, 6) AS gini_w,
       thr = b.bt AS is_best
FROM sc, b
"""

QUERIES["decision_stump"] = q_decision_stump
ORACLES["decision_stump"] = ORACLE_DECISION_STUMP


# --- Split-conformal upper bound on customer spend --------------------


def q_conformal_spend_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal 90% upper bound on per-customer total spend,
    per market segment: calibration = even custkeys, q̂ = the k-th
    smallest calibration spend with k = (n+1) − ⌊(n+1)/10⌋ (the exact
    integer form of ⌈0.9(n+1)⌉, clipped to n), then the coverage of
    spend ≤ q̂ on the odd-custkey test split. Classic distribution-free
    uncertainty quantification (Vovk et al.; split form per Lei et al.
    JASA 2018) — the whole computation is exact: decimal spend sums,
    integer ranks, one double division at the end.

    100 TB shape: one orders aggregate (hash by custkey), one
    customer join, per-segment rank windows over hash-partitioned
    segments (|segments| bounded), and a broadcast of the ≤|segments|
    q̂ rows back onto the test side."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    spend = (
        orders.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.sum("o_totalprice").alias("spend"))
        .join(cust, "c_custkey")
    )
    cal = spend.filter(F.col("c_custkey") % 2 == 0)
    tst = spend.filter(F.col("c_custkey") % 2 == 1)

    nk = cal.groupBy("segment").agg(F.count(F.lit(1)).alias("n_cal"))
    k = F.least(
        (F.col("n_cal") + 1) - F.floor((F.col("n_cal") + 1) / 10).cast("long"),
        F.col("n_cal"),
    ).alias("k")
    nk = nk.select("segment", "n_cal", k)

    w = Window.partitionBy("segment").orderBy(F.col("spend").asc(), F.col("c_custkey").asc())
    ranked = cal.withColumn("rn", F.row_number().over(w))
    qhat = (
        ranked.join(F.broadcast(nk), "segment")
        .filter(F.col("rn") == F.col("k"))
        .select("segment", "n_cal", F.col("spend").alias("qhat"))
    )
    cov = (
        tst.join(F.broadcast(qhat), "segment")
        .groupBy("segment", "n_cal", "qhat")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(F.when(F.col("spend") <= F.col("qhat"), 1).otherwise(0)).alias(
                "n_covered"
            ),
        )
    )
    return cov.select(
        "segment",
        "n_cal",
        F.round(F.col("qhat").cast("double"), 2).alias("qhat"),
        "n_test",
        F.col("n_covered").cast("long").alias("n_covered"),
        F.round(
            F.col("n_covered").cast("double") / F.col("n_test").cast("double"), 6
        ).alias("coverage"),
    )


ORACLE_CONFORMAL = """
WITH spend AS (
  SELECT o.o_custkey AS c_custkey, c.c_mktsegment AS segment,
         SUM(o.o_totalprice) AS spend
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY o.o_custkey, c.c_mktsegment
), cal AS (SELECT * FROM spend WHERE c_custkey % 2 = 0),
tst AS (SELECT * FROM spend WHERE c_custkey % 2 = 1),
nk AS (
  SELECT segment, COUNT(*) AS n_cal,
         LEAST((COUNT(*) + 1) - CAST(FLOOR((COUNT(*) + 1) / 10) AS BIGINT),
               COUNT(*)) AS k
  FROM cal GROUP BY segment
), ranked AS (
  SELECT segment, spend,
         ROW_NUMBER() OVER (PARTITION BY segment
                            ORDER BY spend ASC, c_custkey ASC) AS rn
  FROM cal
), qh AS (
  SELECT r.segment, n.n_cal, r.spend AS qhat
  FROM ranked r JOIN nk n ON n.segment = r.segment AND r.rn = n.k
)
SELECT q.segment, q.n_cal, ROUND(CAST(q.qhat AS DOUBLE), 2) AS qhat,
       COUNT(*) AS n_test,
       CAST(SUM(CASE WHEN t.spend <= q.qhat THEN 1 ELSE 0 END) AS BIGINT)
         AS n_covered,
       ROUND(CAST(SUM(CASE WHEN t.spend <= q.qhat THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS coverage
FROM tst t JOIN qh q USING (segment)
GROUP BY q.segment, q.n_cal, q.qhat
"""

QUERIES["conformal_spend_bound"] = q_conformal_spend_bound
ORACLES["conformal_spend_bound"] = ORACLE_CONFORMAL


# --- Spectral bisection of the user-transition graph ------------------


def q_spectral_split_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate Fiedler-vector bisection of the (undirected)
    user-transition graph — 3 deflated power steps on the random-walk
    matrix (operators/spectral.py). Iterative distributed linear
    algebra with a FULL value oracle: every corpus-scale sum is a
    scaled-long exact integer and every remaining op is pinned IEEE
    double arithmetic, so the unrolled 3-step SQL replays the iterates
    bit-for-bit."""
    from kg_etl_spark.operators.adjacent import undirected_transition_edges_cut
    from kg_etl_spark.operators.spectral import spectral_bisection

    ev = read_table(spark, sf_dir, "events")
    pairs = undirected_transition_edges_cut(ev).select(
        F.col("a").alias("a_id"), F.col("b").alias("b_id")
    )
    # the shared undirected cut is distinct strict a<b by construction
    # (operators/adjacent.py:307 least/greatest + src!=dst + distinct),
    # so the kernel's re-distinct + per-call |E| checkpoint are skipped
    return spectral_bisection(pairs, iterations=3, edges_distinct=True)


def _spectral_step_sql(t: int) -> str:
    """One deflated power step as SQL CTEs (scaled-long exact sums).
    Scalars join in via 1-row CROSS JOINs against MATERIALIZED CTEs —
    scalar subqueries would re-evaluate the whole upstream chain per
    row in DuckDB (measured 36 s → 1 s at sf0.01)."""
    return f"""s{t} AS MATERIALIZED (
  SELECT e.s AS node, SUM(CAST(ROUND(v.v * 1000000000.0, 0) AS BIGINT)) AS sv
  FROM e JOIN v{t - 1} v ON v.node = e.t GROUP BY e.s
), u{t} AS MATERIALIZED (
  SELECT d.node, d.d,
         (CAST(COALESCE(s.sv, 0) AS DOUBLE) / 1000000000.0)
           / CAST(d.d AS DOUBLE) AS u
  FROM deg d LEFT JOIN s{t} s USING (node)
), m{t} AS MATERIALIZED (
  SELECT SUM(CAST(ROUND(d * u * 1000000.0, 0) AS BIGINT)) AS mn FROM u{t}
), c{t} AS MATERIALIZED (
  SELECT node, d,
         u - ((CAST(m.mn AS DOUBLE) / 1000000.0) / CAST(tt.td AS DOUBLE)) AS c
  FROM u{t}, m{t} m, tot tt
), x{t} AS MATERIALIZED (SELECT MAX(ABS(c)) AS mx FROM c{t}),
v{t} AS MATERIALIZED (
  SELECT node, d,
         CASE WHEN x.mx > 0 THEN ROUND(c / x.mx, 9) ELSE 0.0 END AS v
  FROM c{t}, x{t} x
)"""


ORACLE_SPECTRAL = f"""
WITH raw AS (
  SELECT user_id AS src,
         LEAD(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS dst
  FROM events
), p AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM raw WHERE dst IS NOT NULL AND src <> dst
), e AS MATERIALIZED (
  SELECT a AS s, b AS t FROM p UNION SELECT b AS s, a AS t FROM p
), deg AS MATERIALIZED (SELECT s AS node, COUNT(*) AS d FROM e GROUP BY s),
tot AS MATERIALIZED (SELECT SUM(d) AS td FROM deg),
v0 AS MATERIALIZED (
  SELECT node, d, CAST((node % 2) * 2 - 1 AS DOUBLE) AS v FROM deg
), {_spectral_step_sql(1)}, {_spectral_step_sql(2)}, {_spectral_step_sql(3)}
SELECT node, ROUND(v, 6) AS val, v >= 0 AS side FROM v3
"""

QUERIES["spectral_split_users"] = q_spectral_split_users
ORACLES["spectral_split_users"] = ORACLE_SPECTRAL


# --- Huber robust location (IRLS) per nation --------------------------


_HUBER_C = 1000.0
_HUBER_ITERS = 3


def _huber_step_exprs(m_col):
    """Per-row Huber weight at the current center, and the two
    scaled-long partial sums (PCA idiom: round(·10⁶) summed as BIGINT
    — exact and order-independent; |w·x| ≤ 10⁴ so longs hold through
    ~10¹² rows per nation)."""
    r = F.abs(F.col("x") - m_col)
    w = F.when(r <= _HUBER_C, F.lit(1.0)).otherwise(F.lit(_HUBER_C) / r)
    swx = F.sum(F.round(w * F.col("x") * F.lit(1.0e6), 0).cast("long"))
    sw = F.sum(F.round(w * F.lit(1.0e6), 0).cast("long"))
    return swx, sw


def q_huber_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Huber M-estimate of account balance — 3 IRLS
    iterations with weights w = min(1, c/|x−m|), c = 1000 (Huber 1964;
    the standard robust location under outliers). Start m₀ is the
    exact cent-scaled mean.

    Determinism: every corpus-scale sum runs through the scaled-long
    exact device (round(·10⁶) summed as BIGINT, order-independent on
    any partitioning); weights and the per-iteration ratio are IEEE
    doubles from identical inputs — the unrolled 3-step SQL oracle
    replays bit-for-bit.

    100 TB shape: 1+3 hash aggregates keyed by nation (map-side
    partial combine; 25 output rows each) over one cached projection —
    nothing else moves; no windows, no joins after the first."""
    cust = read_table(spark, sf_dir, "customer").select(
        "c_nationkey", F.col("c_acctbal").cast("double").alias("x")
    ).lineage_cut(eager=False)
    m0 = cust.groupBy("c_nationkey").agg(
        (
            F.sum(F.round(F.col("x") * 100.0, 0).cast("long")).cast("double")
            / (F.lit(100.0) * F.count(F.lit(1)).cast("double"))
        ).alias("m")
    )
    m = m0
    for _ in range(_HUBER_ITERS):
        joined = cust.join(F.broadcast(m), "c_nationkey")
        swx, sw = _huber_step_exprs(F.col("m"))
        m = joined.groupBy("c_nationkey").agg(
            (swx.cast("double") / sw.cast("double")).alias("m")
        )
    return m.select("c_nationkey", F.round(F.col("m"), 6).alias("huber_mean"))


def _huber_oracle_sql() -> str:
    sql = """
WITH c AS MATERIALIZED (
  SELECT c_nationkey, CAST(c_acctbal AS DOUBLE) AS x FROM customer
), m0 AS MATERIALIZED (
  SELECT c_nationkey,
         CAST(SUM(CAST(ROUND(x * 100.0, 0) AS BIGINT)) AS DOUBLE)
           / (100.0 * CAST(COUNT(*) AS DOUBLE)) AS m
  FROM c GROUP BY c_nationkey
)"""
    for k in range(1, _HUBER_ITERS + 1):
        sql += f""", m{k} AS MATERIALIZED (
  SELECT c.c_nationkey,
         CAST(SUM(CAST(ROUND(
           (CASE WHEN ABS(c.x - p.m) <= {_HUBER_C} THEN 1.0
                 ELSE {_HUBER_C} / ABS(c.x - p.m) END) * c.x * 1000000.0,
           0) AS BIGINT)) AS DOUBLE)
         / CAST(SUM(CAST(ROUND(
           (CASE WHEN ABS(c.x - p.m) <= {_HUBER_C} THEN 1.0
                 ELSE {_HUBER_C} / ABS(c.x - p.m) END) * 1000000.0,
           0) AS BIGINT)) AS DOUBLE) AS m
  FROM c JOIN m{k - 1} p USING (c_nationkey) GROUP BY c.c_nationkey
)"""
    return sql + f"""
SELECT c_nationkey, ROUND(m, 6) AS huber_mean FROM m{_HUBER_ITERS}
"""


ORACLE_HUBER = _huber_oracle_sql()

QUERIES["huber_location"] = q_huber_location
ORACLES["huber_location"] = ORACLE_HUBER


# --- Degree assortativity of the user-transition graph ----------------


def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman's degree assortativity coefficient (PRL 2002) of the
    symmetrized user-transition graph: the Pearson correlation of
    (deg(u), deg(v)) over all directed edge slots,
        r = (M·Σxy − Σx·Σy) / √(M·Σx² − (Σx)²) / √(M·Σy² − (Σy)²).
    Every sum is an exact decimal of integer products (order-
    independent), the subtractions happen IN decimal, and only the
    final √/÷ touch doubles — IEEE sqrt is correctly rounded by
    spec, so both engines produce the identical bits before the 6 dp
    round. By symmetry Σx = Σy, but both are computed as written so
    the oracle matches term for term.

    100 TB shape: one degree aggregate, two degree attaches as PLAIN
    equi-joins keyed by the edge endpoints (the degree table is |V|
    rows — corpus-scale, so it must never carry a broadcast hint; AQE
    still broadcasts it at small actual sizes, and at 1e9 nodes the
    join shuffles row-proportionally — r7 broadcast-site review), one
    global 1-row aggregate — no windows, nothing quadratic."""
    from kg_etl_spark.operators.adjacent import undirected_transition_edges_cut

    ev = read_table(spark, sf_dir, "events")
    e0 = undirected_transition_edges_cut(ev)
    e = e0.select(F.col("a").alias("s"), F.col("b").alias("t")).union(
        e0.select(F.col("b").alias("s"), F.col("a").alias("t"))
    )
    deg = e.groupBy(F.col("s").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    ed = (
        e.join(deg.select(F.col("node").alias("s"), F.col("d").alias("dx")), "s")
        .join(deg.select(F.col("node").alias("t"), F.col("d").alias("dy")), "t")
    )
    DEC = "decimal(38,0)"
    agg = ed.agg(
        F.count(F.lit(1)).cast(DEC).alias("m"),
        F.sum(F.col("dx").cast(DEC)).alias("sx"),
        F.sum(F.col("dy").cast(DEC)).alias("sy"),
        F.sum((F.col("dx") * F.col("dy")).cast(DEC)).alias("sxy"),
        F.sum((F.col("dx") * F.col("dx")).cast(DEC)).alias("sxx"),
        F.sum((F.col("dy") * F.col("dy")).cast(DEC)).alias("syy"),
    )
    num = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = F.sqrt((F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
    deny = F.sqrt((F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    # zero degree variance (regular graph) leaves r undefined — report
    # 0.0 by convention (and keep ANSI division-by-zero unreachable)
    r = F.when((denx > 0) & (deny > 0), F.round(num / denx / deny, 6)).otherwise(
        F.lit(0.0)
    )
    return agg.select(
        F.col("m").cast("long").alias("n_edge_slots"),
        r.alias("assortativity"),
    )


ORACLE_ASSORTATIVITY = """
WITH raw AS (
  SELECT user_id AS src,
         LEAD(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS dst
  FROM events
), p AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM raw WHERE dst IS NOT NULL AND src <> dst
), e AS (
  SELECT a AS s, b AS t FROM p UNION ALL SELECT b AS s, a AS t FROM p
), deg AS (SELECT s AS node, COUNT(*) AS d FROM e GROUP BY s),
ed AS (
  SELECT dx.d AS dx, dy.d AS dy
  FROM e JOIN deg dx ON dx.node = e.s JOIN deg dy ON dy.node = e.t
), agg AS (
  SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS m,
         SUM(CAST(dx AS DECIMAL(38,0))) AS sx,
         SUM(CAST(dy AS DECIMAL(38,0))) AS sy,
         SUM(CAST(dx * dy AS DECIMAL(38,0))) AS sxy,
         SUM(CAST(dx * dx AS DECIMAL(38,0))) AS sxx,
         SUM(CAST(dy * dy AS DECIMAL(38,0))) AS syy
  FROM ed
)
SELECT CAST(m AS BIGINT) AS n_edge_slots,
       CASE WHEN SQRT(CAST(m * sxx - sx * sx AS DOUBLE)) > 0
             AND SQRT(CAST(m * syy - sy * sy AS DOUBLE)) > 0
            THEN ROUND(CAST(m * sxy - sx * sy AS DOUBLE)
                       / SQRT(CAST(m * sxx - sx * sx AS DOUBLE))
                       / SQRT(CAST(m * syy - sy * sy AS DOUBLE)), 6)
            ELSE 0.0 END AS assortativity
FROM agg
"""

QUERIES["degree_assortativity"] = q_degree_assortativity
ORACLES["degree_assortativity"] = ORACLE_ASSORTATIVITY


# --- Exact 4-cycle (rectangle) census ---------------------------------


def q_four_cycle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count of 4-cycles in the symmetrized user-transition
    graph via the common-neighbor identity: for every unordered node
    pair (x, z), w(x,z) = |N(x) ∩ N(z)| common neighbors contribute
    C(w,2) rectangles through that diagonal, and every 4-cycle has
    exactly TWO diagonals — so C4 = Σ C(w,2) / 2 (Chiba & Nishizeki,
    SIAM J. Comput. 1985 lineage). All-integer arithmetic end to end.

    100 TB shape: the wedge self-join keys on the CENTER node, so
    fan-out is Σ deg(y)² — the documented hub-skew hazard of any exact
    rectangle count; AQE skew-join splits hot centers, and the
    follow-up is one (x,z)-keyed hash aggregate plus a 1-row sum.
    Counts accumulate in decimal(38,0) (w² sums exit long range long
    before 38 digits)."""
    from kg_etl_spark.operators.adjacent import undirected_transition_edges_cut

    ev = read_table(spark, sf_dir, "events")
    e0 = undirected_transition_edges_cut(ev)
    e = e0.select(F.col("a").alias("y"), F.col("b").alias("x")).union(
        e0.select(F.col("b").alias("y"), F.col("a").alias("x"))
    )
    wedges = (
        e.join(e.withColumnRenamed("x", "z"), "y")
        .filter(F.col("x") < F.col("z"))
        .groupBy("x", "z")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    # C4 = Σ C(w,2) / 2 = (Σw² − Σw) / 4 — exact integer arithmetic in
    # decimal (the difference is divisible by 4 by construction); the
    # oracle mirrors it in HUGEINT (DuckDB decimals cannot multiply at
    # width 38×38).
    DEC = "decimal(38,0)"
    return wedges.agg(
        (
            (
                F.sum(F.col("w").cast(DEC) * F.col("w").cast(DEC))
                - F.sum(F.col("w").cast(DEC))
            )
            / 4
        ).cast("long").alias("n_c4"),
        F.count(F.lit(1)).alias("n_diagonal_pairs"),
    )


ORACLE_FOUR_CYCLE = """
WITH raw AS (
  SELECT user_id AS src,
         LEAD(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS dst
  FROM events
), p AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM raw WHERE dst IS NOT NULL AND src <> dst
), e AS (
  SELECT a AS y, b AS x FROM p UNION ALL SELECT b AS y, a AS x FROM p
), wedges AS (
  SELECT e1.x, e2.x AS z, COUNT(*) AS w
  FROM e e1 JOIN e e2 ON e2.y = e1.y AND e1.x < e2.x
  GROUP BY e1.x, e2.x
)
SELECT CAST((SUM(CAST(w AS HUGEINT) * CAST(w AS HUGEINT))
             - SUM(CAST(w AS HUGEINT))) // 4 AS BIGINT) AS n_c4,
       COUNT(*) AS n_diagonal_pairs
FROM wedges
"""

QUERIES["four_cycle_count"] = q_four_cycle_count
ORACLES["four_cycle_count"] = ORACLE_FOUR_CYCLE


# --- Two-feature OLS per nation (normal equations, Cramer) ------------


def q_ols2_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation multiple regression: customer total spend on
    (account balance, order count) solved in closed form from the 3×3
    normal equations via Cramer's rule — the distributed-regression
    pattern where ALL corpus-scale work is one aggregate of exact
    power sums per group, and the solve is a constant-size formula.

    Determinism: x₁ (balance, 2 dp), x₂ (order count, integer), and y
    (spend, 2 dp) make every power sum an exact decimal; the sums
    convert to doubles once and the 3×3 determinants expand in a
    pinned literal order — bit-identical across engines, 6 dp output.
    Singular systems (|det| = 0) yield NULL coefficients rather than
    an ANSI divide error.

    100 TB shape: one orders aggregate + one customer join + ONE
    nation-keyed aggregate of 9 sums (map-side combine; |nations|
    output rows). The solve adds zero distributed work."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    per = (
        orders.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.count(F.lit(1)).alias("x2"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("y"),
        )
        .join(cust, "c_custkey")
    )
    x1 = F.col("c_acctbal").cast("decimal(12,2)")
    x2 = F.col("x2").cast("decimal(12,0)")
    yy = F.col("y").cast("decimal(18,2)")
    sums = per.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x1).cast("double").alias("s1"),
        F.sum(x2).cast("double").alias("s2"),
        F.sum((x1 * x1).cast("decimal(38,4)")).cast("double").alias("s11"),
        F.sum((x2 * x2).cast("decimal(38,4)")).cast("double").alias("s22"),
        F.sum((x1 * x2).cast("decimal(38,4)")).cast("double").alias("s12"),
        F.sum(yy).cast("double").alias("sy"),
        F.sum((x1 * yy).cast("decimal(38,4)")).cast("double").alias("s1y"),
        F.sum((x2 * yy).cast("decimal(38,4)")).cast("double").alias("s2y"),
    )

    def det3(a, b, c, d, e, f, g, h, i):
        # pinned expansion along the first row, left-associated
        return (
            a * (e * i - f * h) - b * (d * i - f * g)
        ) + c * (d * h - e * g)

    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    s11, s22, s12 = F.col("s11"), F.col("s22"), F.col("s12")
    sy, s1y, s2y = F.col("sy"), F.col("s1y"), F.col("s2y")
    det = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    d0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22)
    d1 = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22)
    d2 = det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y)
    sol = lambda dd: F.when(F.abs(det) > 0, F.round(dd / det, 6))
    return sums.select(
        "c_nationkey",
        n.cast("long").alias("n_cust"),
        sol(d0).alias("beta0"),
        sol(d1).alias("beta1"),
        sol(d2).alias("beta2"),
    )


ORACLE_OLS2 = """
WITH per AS (
  SELECT o.o_custkey AS c_custkey, c.c_nationkey,
         CAST(c.c_acctbal AS DECIMAL(12,2)) AS x1,
         CAST(COUNT(*) AS DECIMAL(12,0)) AS x2,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS y
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY o.o_custkey, c.c_nationkey, c.c_acctbal
), sums AS (
  SELECT c_nationkey,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x1) AS DOUBLE) AS s1,
         CAST(SUM(x2) AS DOUBLE) AS s2,
         CAST(SUM(CAST(x1 * x1 AS DECIMAL(38,4))) AS DOUBLE) AS s11,
         CAST(SUM(CAST(x2 * x2 AS DECIMAL(38,4))) AS DOUBLE) AS s22,
         CAST(SUM(CAST(x1 * x2 AS DECIMAL(38,4))) AS DOUBLE) AS s12,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x1 * y AS DECIMAL(38,4))) AS DOUBLE) AS s1y,
         CAST(SUM(CAST(x2 * y AS DECIMAL(38,4))) AS DOUBLE) AS s2y
  FROM per GROUP BY c_nationkey
), solved AS (
  SELECT c_nationkey, n,
         (n  * (s11 * s22 - s12 * s12) - s1 * (s1  * s22 - s12 * s2))
           + s2 * (s1  * s12 - s11 * s2) AS det,
         (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y))
           + s2 * (s1y * s12 - s11 * s2y) AS d0,
         (n  * (s1y * s22 - s12 * s2y) - sy * (s1  * s22 - s12 * s2))
           + s2 * (s1  * s2y - s1y * s2) AS d1,
         (n  * (s11 * s2y - s1y * s12) - s1 * (s1  * s2y - s1y * s2))
           + sy * (s1  * s12 - s11 * s2) AS d2
  FROM sums
)
SELECT c_nationkey, CAST(n AS BIGINT) AS n_cust,
       CASE WHEN ABS(det) > 0 THEN ROUND(d0 / det, 6) END AS beta0,
       CASE WHEN ABS(det) > 0 THEN ROUND(d1 / det, 6) END AS beta1,
       CASE WHEN ABS(det) > 0 THEN ROUND(d2 / det, 6) END AS beta2
FROM solved
"""

QUERIES["ols2_spend"] = q_ols2_spend
ORACLES["ols2_spend"] = ORACLE_OLS2

# --- ROC AUC via the Mann-Whitney rank statistic -----------------------


def q_roc_auc_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC of "extended price predicts a return" over
    lineitem, through the tie-corrected Mann-Whitney identity:
    grouping rows by distinct score s with pos(s)/neg(s) counts,
        2·U = Σ_s pos(s) · (2·neg_below(s) + neg(s)),
        AUC  = 2U / (2·n₁·n₀),
    which equals the probability a random positive outscores a random
    negative (ties count ½) — the standard rank-sum AUC (Hanley &
    McNeil 1982). All counts are exact; the single division happens
    once in IEEE double on decimal-exact operands.

    100 TB shape: one hash aggregate to distinct scores (domain-
    bounded: cents in a fixed price range), then the running
    neg-below prefix via the two-phase exact-rank cumsum device
    (operators/rankdev.global_cumsum — range-bucketed local windows +
    broadcast per-range offsets; NO single-partition global window),
    then a 1-row aggregate. Products are cast to decimal(38,0) BEFORE
    multiplying so pos·cum_neg (~n² at corpus scale) never wraps a
    long.

    Reference parity: the reference scores its linkage/match output
    with pandas rank-based AUC in diagnostics; re-expressed here as
    the distributed rank-sum form.
    """
    from kg_etl_spark.operators.rankdev import global_cumsum

    li = read_table(spark, sf_dir, "lineitem")
    per = (
        li.select(
            F.round(F.col("l_extendedprice") * 100.0, 0).cast("long").alias("score"),
            (F.col("l_returnflag") == "R").cast("long").alias("y"),
        )
        .groupBy("score")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos"))
        .withColumn("neg", F.col("n") - F.col("pos"))
        # LAZY (r12): the cumsum device's first stats probe is the
        # first consumer and materializes it inline — eager paid a
        # standalone round (jobs 8 -> 7, A/B 1.48 -> 1.46 s)
        .lineage_cut(eager=False)  # the cumsum device re-reads it
    )
    cum = global_cumsum(per, "score", ["neg"])  # cum_neg INCLUDES this row
    DEC = "decimal(38,0)"
    agg = cum.agg(
        F.sum("pos").cast(DEC).alias("n1"),
        F.sum("neg").cast(DEC).alias("n0"),
        F.sum(
            F.col("pos").cast(DEC)
            * (F.lit(2) * (F.col("cum_neg") - F.col("neg")) + F.col("neg")).cast(DEC)
        ).alias("u2"),
    )
    auc = F.when(
        (F.col("n1") > 0) & (F.col("n0") > 0),
        F.round(
            F.col("u2").cast("double")
            / (F.lit(2).cast(DEC) * F.col("n1") * F.col("n0")).cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.5))
    return agg.select(
        F.col("n1").cast("long").alias("n_pos"),
        F.col("n0").cast("long").alias("n_neg"),
        auc.alias("auc"),
    )


ORACLE_ROC_AUC = """
WITH sc AS (
  SELECT CAST(ROUND(l_extendedprice * 100.0, 0) AS BIGINT) AS score,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
  FROM lineitem
), per AS (
  SELECT score, COUNT(*) AS n, SUM(y) AS pos FROM sc GROUP BY score
), cum AS (
  SELECT score, pos, n - pos AS neg,
         SUM(n - pos) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) AS cum_neg
  FROM per
), agg AS (
  SELECT SUM(CAST(pos AS DECIMAL(38,0))) AS n1,
         SUM(CAST(neg AS DECIMAL(38,0))) AS n0,
         SUM(CAST(pos AS DECIMAL(38,0))
             * CAST(2 * (cum_neg - neg) + neg AS DECIMAL(38,0))) AS u2
  FROM cum
)
SELECT CAST(n1 AS BIGINT) AS n_pos,
       CAST(n0 AS BIGINT) AS n_neg,
       CASE WHEN n1 > 0 AND n0 > 0
            THEN ROUND(CAST(u2 AS DOUBLE)
                       / CAST(CAST(2 AS DECIMAL(38,0)) * n1 * n0 AS DOUBLE), 6)
            ELSE 0.5 END AS auc
FROM agg
"""

QUERIES["roc_auc_price"] = q_roc_auc_price
ORACLES["roc_auc_price"] = ORACLE_ROC_AUC


# --- Cohen's kappa between two deterministic raters --------------------


def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-rater agreement (Cohen 1960) between two deterministic
    document-quality raters: rater A flags length (n_chars >= 300),
    rater B flags whitespace volume (>= 55 spaces). Kappa from exact
    integer marginals in the 2x2 rational form
        kappa = (N·Σagree − Σ_k row_k·col_k) / (N² − Σ_k row_k·col_k)
    — one IEEE division over decimal-exact operands, 6 dp.

    100 TB shape: one map-side projection + ONE 4-row hash aggregate
    (the contingency table is model state); nothing shuffles more
    than 4 rows after the scan."""
    docs = read_table(spark, sf_dir, "documents")
    rated = docs.select(
        (F.col("n_chars") >= 300).cast("long").alias("a"),
        (
            (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))))
            >= 55
        )
        .cast("long")
        .alias("b"),
    )
    DEC = "decimal(38,0)"
    agg = rated.agg(
        F.count(F.lit(1)).cast(DEC).alias("n"),
        F.sum((F.col("a") == F.col("b")).cast("long")).cast(DEC).alias("agree"),
        F.sum("a").cast(DEC).alias("a1"),
        F.sum("b").cast(DEC).alias("b1"),
    )
    # chance-agreement cross term: a1·b1 + (n−a1)·(n−b1)
    pe = F.col("a1") * F.col("b1") + (F.col("n") - F.col("a1")) * (
        F.col("n") - F.col("b1")
    )
    denom = F.col("n") * F.col("n") - pe
    kappa = F.when(
        denom != 0,
        F.round((F.col("n") * F.col("agree") - pe).cast("double") / denom.cast("double"), 6),
    ).otherwise(F.lit(1.0))
    return agg.select(
        F.col("n").cast("long").alias("n_docs"),
        F.col("agree").cast("long").alias("n_agree"),
        kappa.alias("kappa"),
    )


ORACLE_KAPPA = """
WITH rated AS (
  SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS a,
         CASE WHEN LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) >= 55
              THEN 1 ELSE 0 END AS b
  FROM documents
), agg AS (
  SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
         CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS DECIMAL(38,0)) AS agree,
         CAST(SUM(a) AS DECIMAL(38,0)) AS a1,
         CAST(SUM(b) AS DECIMAL(38,0)) AS b1
  FROM rated
)
SELECT CAST(n AS BIGINT) AS n_docs,
       CAST(agree AS BIGINT) AS n_agree,
       CASE WHEN n * n - (a1 * b1 + (n - a1) * (n - b1)) <> 0
            THEN ROUND(CAST(n * agree - (a1 * b1 + (n - a1) * (n - b1)) AS DOUBLE)
                       / CAST(n * n - (a1 * b1 + (n - a1) * (n - b1)) AS DOUBLE), 6)
            ELSE 1.0 END AS kappa
FROM agg
"""

QUERIES["cohens_kappa"] = q_cohens_kappa
ORACLES["cohens_kappa"] = ORACLE_KAPPA

# --- Mutual information feature ranking --------------------------------


_MI_BAND = "least(greatest(floor(c_acctbal / 1000.0), -1), 9)"


def q_mutual_info_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(feature; label) in nats for three
    candidate categorical features (market segment, nation, account-
    balance band) against "customer placed at least one 1-URGENT
    order" — the classic filter-method feature ranking. Each cell
    contributes (c/N)·ln(c·N/(c_x·c_y)); empty cells contribute 0 and
    never materialize.

    Determinism: counts are exact longs; each cell term is computed
    with the pinned expression (c/N)·ln((c·N)/(c_x·c_y)) — two exact
    decimal→double casts, one correctly-rounded divide, one libm ln
    whose ulp noise is absorbed by an 8 dp round into decimal BEFORE
    the (order-free) decimal sum — then 6 dp at output (the
    catalog-wide libm discipline, cf. unigram_surprisal).

    100 TB shape: one distinct-custkey semi-reduction of orders, one
    customer join, then per feature ONE hash aggregate to a model-
    state contingency table (≤ 25×2 cells) joined against its own
    broadcast margins. Nothing beyond the scans is corpus-sized."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    # base is read once per feature (3x): materialize the orders
    # distinct + customer join at this multi-consumer cut
    base = (
        cust.join(urgent.withColumn("_u", F.lit(1)), "c_custkey", "left")
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.col("c_nationkey").cast("string").alias("nation"),
            F.expr(_MI_BAND).cast("long").cast("string").alias("band"),
            F.coalesce(F.col("_u"), F.lit(0)).alias("y"),
        )
        .lineage_cut(eager=True)
    )

    def mi_for(col: str) -> DataFrame:
        cells = base.groupBy(F.col(col).alias("level"), "y").agg(
            F.count(F.lit(1)).alias("c")
        )
        margx = cells.groupBy("level").agg(F.sum("c").alias("cx"))
        margy = cells.groupBy("y").agg(F.sum("c").alias("cy"))
        tot = cells.agg(F.sum("c").alias("n"))
        DEC = "decimal(38,0)"
        term = F.round(
            (F.col("c").cast("double") / F.col("n").cast("double"))
            * F.log(
                (F.col("c").cast(DEC) * F.col("n").cast(DEC)).cast("double")
                / (F.col("cx").cast(DEC) * F.col("cy").cast(DEC)).cast("double")
            ),
            8,
        ).cast("decimal(28,8)")
        joined = (
            cells.join(F.broadcast(margx), "level")
            .join(F.broadcast(margy), "y")
            .crossJoin(F.broadcast(tot))
        )
        return joined.agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.round(F.sum(term).cast("double"), 6).alias("mi_nats"),
        ).select(F.lit(col).alias("feature"), "n_cells", "mi_nats")

    return mi_for("segment").unionByName(mi_for("nation")).unionByName(mi_for("band"))


def _mi_sql(col_expr: str, name: str) -> str:
    return f"""
  SELECT '{name}' AS feature, COUNT(*) AS n_cells,
         ROUND(CAST(SUM(CAST(ROUND(
             (CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
             * ln(CAST(CAST(c AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)) AS DOUBLE)
                  / CAST(CAST(cx AS DECIMAL(38,0)) * CAST(cy AS DECIMAL(38,0)) AS DOUBLE)),
             8) AS DECIMAL(28,8))) AS DOUBLE), 6) AS mi_nats
  FROM (
    SELECT level, y, c,
           SUM(c) OVER (PARTITION BY level) AS cx,
           SUM(c) OVER (PARTITION BY y) AS cy,
           SUM(c) OVER () AS n
    FROM (SELECT {col_expr} AS level, y, COUNT(*) AS c FROM mi_base GROUP BY 1, 2)
  )
"""


ORACLE_MI = (
    """
WITH urgent AS (
  SELECT DISTINCT o_custkey AS c_custkey FROM orders
  WHERE o_orderpriority = '1-URGENT'
), mi_base AS (
  SELECT c.c_mktsegment AS segment,
         CAST(c.c_nationkey AS VARCHAR) AS nation,
         CAST(CAST(LEAST(GREATEST(FLOOR(c.c_acctbal / 1000.0), -1), 9) AS BIGINT)
              AS VARCHAR) AS band,
         CASE WHEN u.c_custkey IS NULL THEN 0 ELSE 1 END AS y
  FROM customer c LEFT JOIN urgent u USING (c_custkey)
)
"""
    + _mi_sql("segment", "segment")
    + "UNION ALL"
    + _mi_sql("nation", "nation")
    + "UNION ALL"
    + _mi_sql("band", "band")
)

QUERIES["mutual_info_features"] = q_mutual_info_features
ORACLES["mutual_info_features"] = ORACLE_MI


# --- Theil–Sen robust trend ---------------------------------------------


def q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per event type: the (lower) median of
    all pairwise slopes (count_j − count_i)/(day_j − day_i) over the
    daily event-count series — the classic 29%-breakdown robust
    slope (Sen 1968). Slopes are single IEEE divisions of exact
    integers (correctly rounded, bit-identical cross-engine); the
    median is an exact order statistic under the total order
    (slope, day_i, day_j).

    100 TB shape: the daily series is calendar-bounded MODEL STATE
    (#days grows with time span, not corpus size), so the per-type
    pair fan-out is D², bounded by the calendar — the same contract
    as holt_forecast / changepoint_scores. Corpus-scale work is the
    one daily hash aggregate. The median rank rides the grouped rank
    device (operators/rankdev.py grouped_row_number: slope-bucketed
    parallel cells, no single-task D²-row sort — a 10-year daily
    series is ~6.6M pairs per type, too big for one window
    partition)."""
    from kg_etl_spark.operators.rankdev import grouped_row_number

    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        (F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long").alias("day"),
    ).agg(F.count(F.lit(1)).alias("c"))
    a = daily.select("event_type", F.col("day").alias("d1"), F.col("c").alias("c1"))
    b = daily.select("event_type", F.col("day").alias("d2"), F.col("c").alias("c2"))
    pairs = a.join(b, "event_type").filter(F.col("d1") < F.col("d2"))
    slope = (F.col("c2") - F.col("c1")).cast("double") / (
        F.col("d2") - F.col("d1")
    ).cast("double")
    # cut the pair frame before ranking: the device's bounds aggregate
    # and main action would otherwise each re-run the daily aggregate +
    # pair join (measured 0.84s -> 0.64s at sf0.1, min of 3); the cut
    # holds model-sized state (D^2 x |types| calendar pairs)
    ranked = grouped_row_number(
        pairs.withColumn("slope", slope).lineage_cut(eager=False),
        ["event_type"],
        "slope",
        ["d1", "d2"],
        out_col="rn",
        count_col="np",
    )
    return (
        ranked.filter(F.col("rn") == F.expr("(np + 1) div 2"))
        .select(
            "event_type",
            F.col("np").alias("n_pairs"),
            F.round(F.col("slope"), 6).alias("sen_slope"),
        )
    )


ORACLE_THEIL_SEN = """
WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS c
  FROM events GROUP BY 1, 2
), pairs AS (
  SELECT a.event_type,
         CAST(b.c - a.c AS DOUBLE) / CAST(b.day - a.day AS DOUBLE) AS slope,
         a.day AS d1, b.day AS d2
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.day < b.day
), ranked AS (
  SELECT event_type, slope,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY slope ASC, d1 ASC, d2 ASC) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS np
  FROM pairs
)
SELECT event_type, np AS n_pairs, ROUND(slope, 6) AS sen_slope
FROM ranked WHERE rn = (np + 1) // 2
"""

QUERIES["theil_sen_trend"] = q_theil_sen_trend
ORACLES["theil_sen_trend"] = ORACLE_THEIL_SEN

# --- Link prediction: common-neighbor family ---------------------------


_LP_HUB_CAP = 256  # max center degree expanded into wedges


def _user_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetrized distinct user-transition edges (a < b) — the shared
    graph grain of the ml family (same build as degree_assortativity).
    Derivation rides the scale-safe stream lead (operators/adjacent.py):
    bit-identical to the naive event_type window, but no n/|types|
    single-task sort."""
    from kg_etl_spark.operators.adjacent import undirected_transition_edges_cut

    return undirected_transition_edges_cut(read_table(spark, sf_dir, "events"))


def q_user_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over the user graph: for every non-adjacent
    pair with >= 1 common neighbor, the three classic scores —
    common neighbors (CN, exact int), preferential attachment
    (PA = deg·deg, exact decimal product), and resource allocation
    (RA = Σ_z 1/deg(z), Zhou/Lü/Zhang 2009). Top 100 candidates by
    (CN desc, pair asc).

    Hub cap: wedge expansion only routes through centers with
    deg(z) <= 256 — the standard RA/AA practice of discounting hubs
    made into a hard fan-out bound (deg² <= 65536 per center), applied
    IDENTICALLY in the oracle. Without it one celebrity center emits
    deg² wedges — the quadratic blow-up this catalog never ships.

    Determinism: each RA term 1/deg(z) rounds to 12 dp into decimal
    BEFORE the per-pair sum, so the aggregate is ORDER-FREE (plain
    codegen SUM, no interpreted array fold) and bit-identical
    cross-engine; ≤ cap terms keep the rounding error under 1e-10,
    invisible at the 6 dp output.

    100 TB shape: one degree aggregate, a center-keyed wedge join
    bounded by the cap, one (x,y) hash aggregate whose RA term is the
    order-free decimal SUM above (plain codegen SUM, no interpreted
    array fold), an anti join against the edge list, two degree
    attaches, TakeOrdered(100)."""
    return link_scores_from_edges(_user_graph(spark, sf_dir), edges_cut=True)


def link_scores_from_edges(
    e0: DataFrame, hub_cap: int = _LP_HUB_CAP, *, edges_cut: bool = False
) -> DataFrame:
    """CN/PA/RA link-prediction scores for the top non-adjacent pairs
    of an undirected edge frame (a < b, distinct) — the reusable core
    of q_user_link_prediction (planted-graph tests feed it directly).

    ``edges_cut``: the caller asserts ``e0`` is ALREADY materialized at
    a reusable lineage cut (the catalog's shared undirected-edge cut) —
    skips a redundant per-call re-checkpoint of the identical |E| rows
    (one serial scheduling round + one block copy; the hits/betweenness
    edges_distinct contract, r11)."""
    if not edges_cut:
        # e0 is the multi-consumer cut (slots x2, the anti join):
        # materialize once so the corpus-scale window that built it
        # never re-executes
        e0 = e0.lineage_cut(eager=True)
    slots = e0.select(F.col("a").alias("s"), F.col("b").alias("t")).union(
        e0.select(F.col("b").alias("s"), F.col("a").alias("t"))
    )
    deg = slots.groupBy(F.col("s").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    # wedges through bounded-degree centers z: (x — z — y), x < y
    ctr = (
        slots.join(
            deg.filter(F.col("d") <= hub_cap).select(
                F.col("node").alias("s"), F.col("d").alias("dc")
            ),
            "s",
        )
        .select(F.col("s").alias("z"), F.col("t").alias("x"), "dc")
    )
    # pre-fanout spread: AQE sizes the wedge stage off the TINY
    # pre-explosion slot frame and would run the deg-squared explosion
    # in 1-2 coalesced tasks (the pca_power_top lesson, commit
    # a0df24b) — spread the centers to session parallelism BEFORE the
    # fan-out (never a hardcoded width; a 100-core cluster should not
    # run its heaviest stage in 32 tasks)
    from kg_etl_spark.operators.util import spread

    ctr = spread(ctr, F.col("z"))
    other = ctr.select(F.col("z"), F.col("x").alias("y"))
    wedges = (
        ctr.join(other, "z")
        .filter(F.col("x") < F.col("y"))
        .select("x", "y", "z", "dc")
    )
    cand = wedges.groupBy("x", "y").agg(
        F.count(F.lit(1)).alias("cn"),
        F.round(
            F.sum(
                F.round(F.lit(1.0) / F.col("dc").cast("double"), 12).cast(
                    "decimal(28,12)"
                )
            ).cast("double"),
            6,
        ).alias("ra"),
    )
    fresh = cand.join(
        e0, (cand["x"] == e0["a"]) & (cand["y"] == e0["b"]), "left_anti"
    )
    # TakeOrdered FIRST: the ranking keys (cn, pair) never touch the
    # degrees, so the PA attach joins run on the 100 surviving rows
    # instead of the full candidate-pair stream (two corpus-scale
    # joins dropped to model-state joins; (cn, x, y) is a total order,
    # so the selected subset is identical)
    top = fresh.orderBy(
        F.col("cn").desc(), F.col("x").asc(), F.col("y").asc()
    ).limit(100)
    DEC = "decimal(38,0)"
    scored = (
        top.join(deg.select(F.col("node").alias("x"), F.col("d").alias("dx")), "x")
        .join(deg.select(F.col("node").alias("y"), F.col("d").alias("dy")), "y")
        .select(
            F.col("x").alias("u"),
            F.col("y").alias("v"),
            "cn",
            (F.col("dx").cast(DEC) * F.col("dy").cast(DEC)).cast("double").alias("pa"),
            "ra",
        )
    )
    return scored.orderBy(F.col("cn").desc(), F.col("u").asc(), F.col("v").asc())


ORACLE_LINK_PREDICTION = f"""
WITH raw AS (
  SELECT user_id AS src,
         LEAD(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS dst
  FROM events
), e0 AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM raw WHERE dst IS NOT NULL AND src <> dst
), slots AS (
  SELECT a AS s, b AS t FROM e0 UNION ALL SELECT b AS s, a AS t FROM e0
), deg AS (SELECT s AS node, COUNT(*) AS d FROM slots GROUP BY s),
ctr AS (
  SELECT sl.s AS z, sl.t AS x, dg.d AS dc
  FROM slots sl JOIN deg dg ON dg.node = sl.s
  WHERE dg.d <= {_LP_HUB_CAP}
), wedges AS (
  SELECT c1.x AS x, c2.x AS y, c1.z, c1.dc
  FROM ctr c1 JOIN ctr c2 ON c1.z = c2.z AND c1.x < c2.x
), cand AS (
  SELECT x, y, COUNT(*) AS cn,
         ROUND(CAST(SUM(CAST(ROUND(1.0 / CAST(dc AS DOUBLE), 12)
                             AS DECIMAL(28,12))) AS DOUBLE), 6) AS ra
  FROM wedges GROUP BY x, y
), fresh AS (
  SELECT c.* FROM cand c ANTI JOIN e0 ON e0.a = c.x AND e0.b = c.y
)
SELECT f.x AS u, f.y AS v, f.cn,
       CAST(CAST(dx.d AS DECIMAL(38,0)) * CAST(dy.d AS DECIMAL(38,0)) AS DOUBLE) AS pa,
       f.ra
FROM fresh f
JOIN deg dx ON dx.node = f.x
JOIN deg dy ON dy.node = f.y
ORDER BY f.cn DESC, u ASC, v ASC
LIMIT 100
"""

QUERIES["user_link_prediction"] = q_user_link_prediction
ORACLES["user_link_prediction"] = ORACLE_LINK_PREDICTION


# --- Louvain first-sweep move scan --------------------------------------


def q_louvain_move_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The gain scan of Louvain's first sweep (Blondel et al. 2008)
    from the singleton partition, synchronous variant: for node u and
    a singleton neighbor community {v}, the modularity gain of the
    move scaled by 2m² is exactly
        g(u→{v}) = 2m − deg(u)·deg(v)
    (k_{u,C}=1, Σ_tot(C)=deg(v)); u takes the best positive-gain
    neighbor — argmax g = argmin deg(v), ties to the smallest v — or
    stays put. Emits the per-node move decision with its exact
    integer gain: the primitive that dominates distributed Louvain's
    cost at scale.

    Determinism: all-integer; the argmin rides ONE struct-min
    aggregate (min (deg(v), v) is exactly the documented tie-break).
    Positive gains always fit a long (g > 0 ⇒ g < 2m < 2⁶³).

    Theorem (why every node moves on a simple graph): the argmin
    target satisfies 2m = Σ_w deg(w) ≥ deg(u) + Σ_{v∈N(u)} deg(v)
    ≥ deg(u) + deg(u)·dv_min > deg(u)·dv_min, so the best gain is
    strictly positive from the singleton partition. The moved=0
    branch is therefore provably unreachable here; it stays as the
    formula's guard for callers that feed multigraph-shaped inputs
    where the degree inequality no longer holds.

    100 TB shape: one degree aggregate, one node-keyed join+aggregate
    over the edge slots, one 1-row scalar (2m) broadcast — no
    windows, nothing quadratic, the same shape as one label-prop
    round."""
    return louvain_moves_from_edges(_user_graph(spark, sf_dir))


def louvain_moves_from_edges(e0: DataFrame) -> DataFrame:
    """Singleton-partition Louvain move decisions for an undirected
    edge frame (a < b, distinct) — the reusable core of
    q_louvain_move_scan (planted-graph tests feed it directly)."""
    # two slot consumers (deg, 2m) plus the best-move join read e0:
    # materialize the cut once (communities.modularity idiom)
    e0 = e0.lineage_cut(eager=True)
    slots = e0.select(F.col("a").alias("s"), F.col("b").alias("t")).union(
        e0.select(F.col("b").alias("s"), F.col("a").alias("t"))
    )
    deg = slots.groupBy(F.col("s").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    two_m = slots.agg((F.count(F.lit(1))).alias("m2"))  # slot count == 2m
    best = (
        slots.join(deg.select(F.col("node").alias("t"), F.col("d").alias("dt")), "t")
        .groupBy(F.col("s").alias("node"))
        .agg(F.min(F.struct(F.col("dt"), F.col("t"))).alias("bv"))
        .select("node", F.col("bv.dt").alias("dbest"), F.col("bv.t").alias("vbest"))
    )
    DEC = "decimal(38,0)"
    out = (
        best.join(deg, "node")
        .crossJoin(F.broadcast(two_m))
        .withColumn(
            "gain_dec",
            F.col("m2").cast(DEC) - F.col("d").cast(DEC) * F.col("dbest").cast(DEC),
        )
    )
    moved = F.col("gain_dec") > 0
    return out.select(
        F.col("node").alias("u"),
        F.when(moved, F.col("vbest")).otherwise(F.col("node")).alias("community"),
        moved.cast("int").alias("moved"),
        F.when(moved, F.col("gain_dec").cast("long")).otherwise(F.lit(0)).alias("gain"),
    )


ORACLE_LOUVAIN_MOVE = """
WITH raw AS (
  SELECT user_id AS src,
         LEAD(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS dst
  FROM events
), e0 AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM raw WHERE dst IS NOT NULL AND src <> dst
), slots AS (
  SELECT a AS s, b AS t FROM e0 UNION ALL SELECT b AS s, a AS t FROM e0
), deg AS (SELECT s AS node, COUNT(*) AS d FROM slots GROUP BY s),
m AS (SELECT COUNT(*) AS m2 FROM slots),
best AS (
  SELECT sl.s AS node, dt.d AS dbest, sl.t AS vbest,
         ROW_NUMBER() OVER (PARTITION BY sl.s ORDER BY dt.d ASC, sl.t ASC) AS rn
  FROM slots sl JOIN deg dt ON dt.node = sl.t
)
SELECT b.node AS u,
       CASE WHEN CAST(m.m2 AS DECIMAL(38,0))
                 - CAST(dg.d AS DECIMAL(38,0)) * CAST(b.dbest AS DECIMAL(38,0)) > 0
            THEN b.vbest ELSE b.node END AS community,
       CASE WHEN CAST(m.m2 AS DECIMAL(38,0))
                 - CAST(dg.d AS DECIMAL(38,0)) * CAST(b.dbest AS DECIMAL(38,0)) > 0
            THEN 1 ELSE 0 END AS moved,
       CASE WHEN CAST(m.m2 AS DECIMAL(38,0))
                 - CAST(dg.d AS DECIMAL(38,0)) * CAST(b.dbest AS DECIMAL(38,0)) > 0
            THEN CAST(m.m2 - CAST(dg.d AS DECIMAL(38,0)) * b.dbest AS BIGINT)
            ELSE 0 END AS gain
FROM best b JOIN deg dg ON dg.node = b.node CROSS JOIN m
WHERE b.rn = 1
"""

QUERIES["louvain_move_scan"] = q_louvain_move_scan
ORACLES["louvain_move_scan"] = ORACLE_LOUVAIN_MOVE

# --- Propensity-style matched-pairs ATT ---------------------------------


def q_propensity_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matched-pairs treatment-effect readout: BUILDING-segment
    customers (treated) match the nearest non-BUILDING control with
    account balance <= theirs WITHIN THE SAME NATION (exact-match
    stratum + 1-D nearest-backward on the covariate — the greedy
    caliper-free variant of propensity matching on one observed
    covariate). ATT per nation = mean(treated spend − matched control
    spend) over exact cent sums; unmatched treated are counted but
    excluded from the effect.

    Backward matching rides operators/temporal.asof_join with balance
    cents as the 'time' axis: union → ONE window per nation → filter —
    never an inequality join. Ties (equal cents) resolve to the
    largest (cents, control key) struct — the device's documented
    total order, replicated verbatim in the oracle.

    100 TB shape: one custkey-keyed orders aggregate, one nation-keyed
    sort-window (the as-of), one nation-keyed aggregate; |nations|
    output rows. No pair fan-out at all."""
    from kg_etl_spark.operators.temporal import asof_join

    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    spend = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100.0, 0).cast("long")).alias("spend_c")
    )
    base = (
        cust.join(spend, "c_custkey", "left")
        .select(
            "c_custkey",
            "c_nationkey",
            F.round(F.col("c_acctbal") * 100.0, 0).cast("long").alias("bal_c"),
            F.coalesce(F.col("spend_c"), F.lit(0)).alias("spend_c"),
            (F.col("c_mktsegment") == "BUILDING").alias("treated"),
        )
    )
    t = base.filter(F.col("treated")).select(
        "c_custkey", "c_nationkey", "bal_c", "spend_c"
    )
    c = base.filter(~F.col("treated")).select(
        F.col("c_nationkey"),
        F.col("bal_c"),
        F.col("c_custkey").alias("ctl_key"),
        F.col("spend_c").alias("ctl_spend"),
    )
    matched = asof_join(
        t, c, on="c_nationkey", left_ts="bal_c", right_ts="bal_c",
        right_cols=("ctl_key", "ctl_spend"),
    )
    DEC = "decimal(38,0)"
    agg = matched.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_treated"),
        F.sum(F.col("ctl_key_asof").isNotNull().cast("long")).alias("n_matched"),
        F.sum(
            F.when(F.col("ctl_key_asof").isNotNull(), F.col("spend_c"))
            .otherwise(0)
            .cast(DEC)
        ).alias("ts"),
        F.sum(F.coalesce(F.col("ctl_spend_asof"), F.lit(0)).cast(DEC)).alias("cs"),
    )
    att = F.when(
        F.col("n_matched") > 0,
        F.round(
            (F.col("ts") - F.col("cs")).cast("double")
            / (F.lit(100.0) * F.col("n_matched").cast("double")),
            2,
        ),
    )
    return agg.select(
        "c_nationkey",
        "n_treated",
        "n_matched",
        att.alias("att_dollars"),
    )


ORACLE_PROPENSITY = """
WITH spend AS (
  SELECT o_custkey AS c_custkey,
         SUM(CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT)) AS spend_c
  FROM orders GROUP BY 1
), base AS (
  SELECT c.c_custkey, c.c_nationkey,
         CAST(ROUND(c.c_acctbal * 100.0, 0) AS BIGINT) AS bal_c,
         COALESCE(s.spend_c, 0) AS spend_c,
         c.c_mktsegment = 'BUILDING' AS treated
  FROM customer c LEFT JOIN spend s USING (c_custkey)
), t AS (SELECT * FROM base WHERE treated),
c AS (SELECT * FROM base WHERE NOT treated),
m AS (
  SELECT t.c_custkey, t.c_nationkey, t.spend_c,
         c.c_custkey AS ctl_key, c.spend_c AS ctl_spend,
         ROW_NUMBER() OVER (PARTITION BY t.c_custkey
                            ORDER BY c.bal_c DESC, c.c_custkey DESC) AS rn
  FROM t LEFT JOIN c
    ON c.c_nationkey = t.c_nationkey AND c.bal_c <= t.bal_c
)
SELECT c_nationkey,
       COUNT(*) AS n_treated,
       CAST(SUM(CASE WHEN ctl_key IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
       CASE WHEN SUM(CASE WHEN ctl_key IS NOT NULL THEN 1 ELSE 0 END) > 0
            THEN ROUND(CAST(SUM(CAST(CASE WHEN ctl_key IS NOT NULL
                                          THEN spend_c ELSE 0 END AS DECIMAL(38,0)))
                            - SUM(CAST(COALESCE(ctl_spend, 0) AS DECIMAL(38,0)))
                            AS DOUBLE)
                       / (100.0 * SUM(CASE WHEN ctl_key IS NOT NULL THEN 1 ELSE 0 END)), 2)
            END AS att_dollars
FROM (SELECT * FROM m WHERE rn = 1 OR rn IS NULL)
GROUP BY c_nationkey
"""

QUERIES["propensity_matching"] = q_propensity_matching
ORACLES["propensity_matching"] = ORACLE_PROPENSITY

# --- GraphSAGE-style deterministic neighbor-sampling plan ---------------


_SAGE_F1 = 5  # hop-1 fanout
_SAGE_F2 = 3  # hop-2 fanout
_SAGE_A = 1_315_423_911
_SAGE_B = 2_654_435_761
_SAGE_P = 2_147_483_647


def _sage_rank(src, dst, hop: int):
    # 31-bit masked multiplicative hash (the walks.py overflow lesson):
    # ranks neighbors deterministically per (seed-hop, neighbor)
    return (
        F.lit(_SAGE_A) * src.bitwiseAND(F.lit(0x7FFFFFFF))
        + F.lit(_SAGE_B) * dst.bitwiseAND(F.lit(0x7FFFFFFF))
        + F.lit(97_531 * hop)
    ) % F.lit(_SAGE_P)


def _sage_plan(e0: DataFrame):
    """(hop1, hop2) fixed-fanout sample frames for an undirected edge
    frame — the ONE definition both q_sage_sampling_plan and
    q_gnn_prep_manifest run, so a fanout or hash tweak can never
    desynchronize the manifest from the standalone plan."""
    slots = e0.select(F.col("a").alias("s"), F.col("b").alias("t")).union(
        e0.select(F.col("b").alias("s"), F.col("a").alias("t"))
    )
    w1 = Window.partitionBy("s").orderBy(
        _sage_rank(F.col("s"), F.col("t"), 1).asc(), F.col("t").asc()
    )
    hop1 = (
        slots.withColumn("rk", F.row_number().over(w1))
        .filter(F.col("rk") <= _SAGE_F1)
        .select(F.col("s").alias("seed"), F.col("t").alias("node"), "rk")
    )
    nb = slots.select(F.col("s").alias("node"), F.col("t").alias("nxt"))
    w2 = Window.partitionBy("seed", "node").orderBy(
        _sage_rank(F.col("seed"), F.col("nxt"), 2).asc(), F.col("nxt").asc()
    )
    hop2 = (
        hop1.join(nb, "node")
        .filter(F.col("nxt") != F.col("seed"))
        .withColumn("rk2", F.row_number().over(w2))
        .filter(F.col("rk2") <= _SAGE_F2)
    )
    return hop1, hop2


def q_sage_sampling_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic GraphSAGE neighbor-sampling plan (Hamilton et
    al., NeurIPS'17 §3.1): for every seed node of the user graph,
    sample 5 hop-1 neighbors and 3 hop-2 neighbors per hop-1 node —
    fanouts and choices fixed by a hash ranking, so the minibatch
    plan is reproducible across epochs and engines (the hash-split
    discipline applied to GNN data prep). Emits
    (seed, hop, parent, node, rk).

    Determinism: neighbor choice = the rk-smallest hash rank with
    (rank, neighbor) total tie order; all-integer, 31-bit masked
    inputs so products never wrap.

    100 TB shape: two node-keyed window ranks over the adjacency
    (per-node frames are degree-bounded; a celebrity hub costs one
    deg·log deg local sort — the documented cost of any fixed-fanout
    sampler) and one edge-keyed join to expand hop 2. Fan-out is
    capped at 5 + 5·3 rows per seed by construction."""
    # _user_graph is already an eagerly-materialized shared cut (r8
    # memo) — a second lineage_cut would only copy the blocks
    e0 = _user_graph(spark, sf_dir)
    hop1, hop2 = _sage_plan(e0)
    out1 = hop1.select(
        "seed", F.lit(1).alias("hop"), F.col("seed").alias("parent"), "node",
        F.col("rk").cast("long").alias("rk"),
    )
    out2 = hop2.select(
        "seed", F.lit(2).alias("hop"), F.col("node").alias("parent"),
        F.col("nxt").alias("node"), F.col("rk2").cast("long").alias("rk"),
    )
    return out1.unionByName(out2)


ORACLE_SAGE = f"""
WITH raw AS (
  SELECT user_id AS src,
         LEAD(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS dst
  FROM events
), e0 AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM raw WHERE dst IS NOT NULL AND src <> dst
), slots AS (
  SELECT a AS s, b AS t FROM e0 UNION ALL SELECT b AS s, a AS t FROM e0
), hop1 AS (
  SELECT s AS seed, t AS node, rk FROM (
    SELECT s, t,
           ROW_NUMBER() OVER (PARTITION BY s ORDER BY
             ({_SAGE_A} * (s & 2147483647) + {_SAGE_B} * (t & 2147483647)
              + {97_531 * 1}) % {_SAGE_P} ASC, t ASC) AS rk
    FROM slots
  ) WHERE rk <= {_SAGE_F1}
), hop2 AS (
  SELECT seed, node AS parent, nxt AS node, rk2 AS rk FROM (
    SELECT h.seed, h.node, nb.t AS nxt,
           ROW_NUMBER() OVER (PARTITION BY h.seed, h.node ORDER BY
             ({_SAGE_A} * (h.seed & 2147483647) + {_SAGE_B} * (nb.t & 2147483647)
              + {97_531 * 2}) % {_SAGE_P} ASC, nb.t ASC) AS rk2
    FROM hop1 h JOIN slots nb ON nb.s = h.node
    WHERE nb.t <> h.seed
  ) WHERE rk2 <= {_SAGE_F2}
)
SELECT seed, 1 AS hop, seed AS parent, node, CAST(rk AS BIGINT) AS rk FROM hop1
UNION ALL
SELECT seed, 2 AS hop, parent, node, CAST(rk AS BIGINT) AS rk FROM hop2
"""

QUERIES["sage_sampling_plan"] = q_sage_sampling_plan
ORACLES["sage_sampling_plan"] = ORACLE_SAGE

# --- E2E GNN data-prep manifest (SAGE + walks + skip-gram in one DAG) ---


def q_gnn_prep_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end GNN data-prep readout: ONE DAG that takes every
    seed node of the user graph through (a) the fixed-fanout SAGE
    sampling plan, (b) the deterministic walk corpus, and (c) the
    skip-gram pair stage, and emits the per-seed manifest a training
    job consumes: hop-1/hop-2 sample counts, the walk endpoint, and
    the seed's skip-gram pair count. The composition twin of
    training_pipeline_e2e for the graph-ML family — every stage is
    the SAME operator the standalone queries run, so the manifest is
    value-checkable by composing their unrolled oracles.

    100 TB shape: the three stages share one edge scan and join on
    the SEED key only (counts, no fan-out beyond each stage's own
    documented bound); the final assembly is three seed-keyed
    aggregates + two joins."""
    from kg_etl_spark.operators.walks import deterministic_walks

    # _user_graph is already an eagerly-materialized shared cut (r8
    # memo) — a second lineage_cut would only copy the blocks
    e0 = _user_graph(spark, sf_dir)
    # stage a: the SHARED SAGE plan (_sage_plan — one definition)
    hop1, hop2 = _sage_plan(e0)
    c1 = hop1.groupBy("seed").agg(F.count(F.lit(1)).alias("n_hop1"))
    c2 = hop2.groupBy("seed").agg(F.count(F.lit(1)).alias("n_hop2"))
    # stage b+c fused: walk endpoint AND seed-centered skip-gram pair
    # count from ONE origin-keyed aggregate.  The ±2 skip-gram window
    # over the fixed positions 0..3 is closed-form: a step i whose node
    # IS the origin contributes |{j != i, |i-j| <= 2}| = [2,3,3,2][i]
    # pairs — identical to the former walks-self-join + center==origin
    # filter + count, without the self-join's exchange or the 10x
    # pair fan-out (every origin emits all 4 steps, so the aggregate
    # covers the same seed domain the two old left joins did)
    edges = e0.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
        e0.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    walks = deterministic_walks(edges, length=3)
    _pair_w = F.when(F.col("step").isin(0, 3), F.lit(1)).otherwise(F.lit(2)) + 1
    wagg = walks.groupBy(F.col("origin").alias("seed")).agg(
        F.max(F.when(F.col("step") == 3, F.col("node"))).alias("walk_end"),
        F.sum(
            F.when(F.col("node") == F.col("origin"), _pair_w).otherwise(F.lit(0))
        ).alias("n_center_pairs"),
    )
    return (
        c1.join(c2, "seed", "left")
        .join(wagg, "seed", "left")
        .select(
            "seed",
            "n_hop1",
            F.coalesce(F.col("n_hop2"), F.lit(0)).alias("n_hop2"),
            "walk_end",
            F.coalesce(F.col("n_center_pairs"), F.lit(0)).alias("n_center_pairs"),
        )
    )


ORACLE_GNN_PREP = f"""
WITH raw AS (
  SELECT user_id AS src,
         LEAD(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS dst
  FROM events
), e0 AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM raw WHERE dst IS NOT NULL AND src <> dst
), slots AS (
  SELECT a AS s, b AS t FROM e0 UNION ALL SELECT b AS s, a AS t FROM e0
), hop1 AS (
  SELECT s AS seed, t AS node FROM (
    SELECT s, t,
           ROW_NUMBER() OVER (PARTITION BY s ORDER BY
             ({_SAGE_A} * (s & 2147483647) + {_SAGE_B} * (t & 2147483647)
              + {97_531 * 1}) % {_SAGE_P} ASC, t ASC) AS rk
    FROM slots
  ) WHERE rk <= {_SAGE_F1}
), hop2 AS (
  SELECT seed, node, nxt FROM (
    SELECT h.seed, h.node, nb.t AS nxt,
           ROW_NUMBER() OVER (PARTITION BY h.seed, h.node ORDER BY
             ({_SAGE_A} * (h.seed & 2147483647) + {_SAGE_B} * (nb.t & 2147483647)
              + {97_531 * 2}) % {_SAGE_P} ASC, nb.t ASC) AS rk2
    FROM hop1 h JOIN slots nb ON nb.s = h.node
    WHERE nb.t <> h.seed
  ) WHERE rk2 <= {_SAGE_F2}
), nbrs AS (
  SELECT src, dst,
         ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS rnk,
         COUNT(*) OVER (PARTITION BY src) AS deg
  FROM (SELECT s AS src, t AS dst FROM slots)
), nodes AS (SELECT DISTINCT s AS node FROM slots),
s0 AS (SELECT node AS origin, node AS cur FROM nodes),
s1 AS (
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
), sgc AS (
  SELECT a.origin AS seed, COUNT(*) AS n_center_pairs
  FROM walk a JOIN walk b
    ON a.origin = b.origin AND a.step <> b.step AND ABS(a.step - b.step) <= 2
  WHERE a.node = a.origin
  GROUP BY 1
)
SELECT c1.seed,
       c1.n_hop1,
       COALESCE(c2.n_hop2, 0) AS n_hop2,
       e.walk_end,
       COALESCE(sgc.n_center_pairs, 0) AS n_center_pairs
FROM (SELECT seed, COUNT(*) AS n_hop1 FROM hop1 GROUP BY seed) c1
LEFT JOIN (SELECT seed, COUNT(*) AS n_hop2 FROM hop2 GROUP BY seed) c2
  ON c2.seed = c1.seed
LEFT JOIN (SELECT origin AS seed, cur AS walk_end FROM s3) e ON e.seed = c1.seed
LEFT JOIN sgc ON sgc.seed = c1.seed
"""

QUERIES["gnn_prep_manifest"] = q_gnn_prep_manifest
ORACLES["gnn_prep_manifest"] = ORACLE_GNN_PREP

# --- Deterministic negative-EDGE sampling (GNN contrastive prep) --------


_NEG_TRIALS = 8
_NEG_KEEP = 3


def q_negative_edge_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural negative sampling for link-prediction/GNN training:
    per seed node, up to 3 NON-neighbors drawn by hash from the node
    universe (8 rejection trials; real edges and self-pairs are
    rejected by an anti join against the adjacency — the part
    embedding-space negative_samples cannot do; colliding trials
    collapse to the earliest, so kept negatives are DISTINCT nodes).
    Node indexing rides
    the two-phase exact-rank device, so the trial→node mapping is
    identical under any partitioning and in the oracle.

    100 TB shape: one rank device over the node set, a trial explode
    (8 rows/seed), one idx-keyed join, one edge anti join, one
    seed-partitioned window over ≤8 rows — nothing quadratic, no
    rand()."""
    from kg_etl_spark.operators.rankdev import global_row_number

    # _user_graph is already an eagerly-materialized shared cut (r8
    # memo) — a second lineage_cut would only copy the blocks
    e0 = _user_graph(spark, sf_dir)
    slots = e0.select(F.col("a").alias("s"), F.col("b").alias("t")).union(
        e0.select(F.col("b").alias("s"), F.col("a").alias("t"))
    )
    nodes = slots.select(F.col("s").alias("node")).distinct()
    idxed, n_v = global_row_number(nodes, "node", out_col="idx")
    trials = nodes.select(
        F.col("node").alias("seed"),
        F.explode(F.sequence(F.lit(1), F.lit(_NEG_TRIALS))).alias("trial"),
    )
    h = (
        F.lit(_SAGE_A) * F.col("seed").bitwiseAND(F.lit(0x7FFFFFFF))
        + F.lit(_SAGE_B) * F.col("trial")
    ) % F.lit(_SAGE_P)
    cand = trials.withColumn("idx", h % F.lit(n_v) + 1).join(idxed, "idx").select(
        "seed", "trial", F.col("node").alias("neg")
    )
    fresh = (
        cand.filter(F.col("neg") != F.col("seed"))
        .join(
            slots.select(F.col("s").alias("seed"), F.col("t").alias("neg")),
            ["seed", "neg"],
            "left_anti",
        )
        # two trials can hash to the same node — collapse to the
        # EARLIEST trial so the kept negatives are distinct nodes
        .groupBy("seed", "neg")
        .agg(F.min("trial").alias("trial"))
    )
    w = Window.partitionBy("seed").orderBy(F.col("trial").asc())
    return (
        fresh.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _NEG_KEEP)
        .select("seed", F.col("rk").cast("long").alias("rk"), F.col("trial").cast("long").alias("trial"), "neg")
    )


ORACLE_NEG_EDGES = f"""
WITH raw AS (
  SELECT user_id AS src,
         LEAD(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS dst
  FROM events
), e0 AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM raw WHERE dst IS NOT NULL AND src <> dst
), slots AS (
  SELECT a AS s, b AS t FROM e0 UNION ALL SELECT b AS s, a AS t FROM e0
), nodes AS (SELECT DISTINCT s AS node FROM slots),
idxed AS (
  SELECT node, ROW_NUMBER() OVER (ORDER BY node ASC) AS idx FROM nodes
), nv AS (SELECT COUNT(*) AS n FROM nodes),
trials AS (
  SELECT n.node AS seed, unnest(range(1, {_NEG_TRIALS + 1})) AS trial FROM nodes n
), cand AS (
  SELECT t.seed, t.trial, i.node AS neg
  FROM trials t CROSS JOIN nv
  JOIN idxed i
    ON i.idx = ({_SAGE_A} * (t.seed & 2147483647) + {_SAGE_B} * t.trial)
               % {_SAGE_P} % nv.n + 1
), fresh AS (
  SELECT seed, neg, MIN(trial) AS trial FROM (
    SELECT c.seed, c.trial, c.neg FROM cand c
    ANTI JOIN slots sl ON sl.s = c.seed AND sl.t = c.neg
    WHERE c.neg <> c.seed
  ) GROUP BY seed, neg
)
SELECT seed, CAST(rk AS BIGINT) AS rk, trial, neg FROM (
  SELECT seed, trial, neg,
         ROW_NUMBER() OVER (PARTITION BY seed ORDER BY trial ASC) AS rk
  FROM fresh
) WHERE rk <= {_NEG_KEEP}
"""

QUERIES["negative_edge_samples"] = q_negative_edge_samples
ORACLES["negative_edge_samples"] = ORACLE_NEG_EDGES


# --- k-fold cross-validation manifest + out-of-fold evaluation ----------


def q_cv_fold_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validation in ONE pass: customers land in stable
    hash folds (knuth_h32 — the catalog's reproducible substitute for
    rand(), identical in the oracle), and each fold is scored with the
    OUT-OF-FOLD global-mean predictor via the power-sum identity
        mse_f = (s2_f − 2·μ₋f·s1_f + n_f·μ₋f²) / n_f,
    where μ₋f = (S1 − s1_f)/(N − n_f) — the complement-mean trick of
    loo_group_influence applied to squared error, so CV needs NO second
    data pass per fold (k passes → 1 at any k).

    100 TB shape: one fold-keyed decimal power-sum aggregate (5 rows),
    a 1-row rollup of those, a broadcast scalar join. Nothing else
    touches the corpus."""
    from kg_etl_spark.operators.datapipe import hash_bucket

    cust = read_table(spark, sf_dir, "customer")
    p6 = lambda k: F.round(F.col("c_acctbal") ** k, 6).cast("decimal(28,6)")
    per = cust.groupBy(hash_bucket(F.col("c_custkey"), 5).alias("fold")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(p6(1)).alias("s1"),
        F.sum(p6(2)).alias("s2"),
    )
    tot = per.agg(
        F.sum("n").alias("_N"), F.sum("s1").alias("_S1"), F.sum("s2").alias("_S2")
    )
    j = per.crossJoin(F.broadcast(tot))
    pred = (F.col("_S1") - F.col("s1")).cast("double") / (
        F.col("_N") - F.col("n")
    ).cast("double")
    s1d, s2d, nd = (
        F.col("s1").cast("double"),
        F.col("s2").cast("double"),
        F.col("n").cast("double"),
    )
    mse = (s2d - 2 * pred * s1d + nd * pred * pred) / nd
    return j.select(
        F.col("fold").cast("long").alias("fold"),
        F.col("n").cast("long").alias("n_rows"),
        F.round(s1d / nd, 6).alias("fold_mean"),
        F.round(pred, 6).alias("oof_pred"),
        F.round(mse, 6).alias("oof_mse"),
    )


_CV_FOLD_SQL = "(c_custkey * 2654435761) % 4294967296 % 5"

ORACLE_CV_FOLD = f"""
WITH per AS (
  SELECT {_CV_FOLD_SQL} AS fold, COUNT(*) AS n,
         SUM(CAST(ROUND(c_acctbal, 6) AS DECIMAL(28,6))) AS s1,
         SUM(CAST(ROUND(c_acctbal * c_acctbal, 6) AS DECIMAL(28,6))) AS s2
  FROM customer GROUP BY 1
), tot AS (
  SELECT SUM(n) AS N, SUM(s1) AS S1, SUM(s2) AS S2 FROM per
)
SELECT CAST(p.fold AS BIGINT) AS fold, CAST(p.n AS BIGINT) AS n_rows,
       ROUND(CAST(p.s1 AS DOUBLE) / CAST(p.n AS DOUBLE), 6) AS fold_mean,
       ROUND(CAST(t.S1 - p.s1 AS DOUBLE) / CAST(t.N - p.n AS DOUBLE), 6) AS oof_pred,
       ROUND((CAST(p.s2 AS DOUBLE)
              - 2 * (CAST(t.S1 - p.s1 AS DOUBLE) / CAST(t.N - p.n AS DOUBLE))
                  * CAST(p.s1 AS DOUBLE)
              + CAST(p.n AS DOUBLE)
                  * (CAST(t.S1 - p.s1 AS DOUBLE) / CAST(t.N - p.n AS DOUBLE))
                  * (CAST(t.S1 - p.s1 AS DOUBLE) / CAST(t.N - p.n AS DOUBLE)))
             / CAST(p.n AS DOUBLE), 6) AS oof_mse
FROM per p, tot t
"""

QUERIES["cv_fold_metrics"] = q_cv_fold_metrics
ORACLES["cv_fold_metrics"] = ORACLE_CV_FOLD


# --- Per-edge neighborhood-Jaccard features (GNN edge features) ---------


def q_edge_jaccard_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood Jaccard |N(a)∩N(b)| / |N(a)∪N(b)| for every EDGE of
    the user-transition graph — the classic edge feature a link-level
    GNN/EdgeConv consumes (the companion of `user_link_prediction`,
    which scores NON-edges). Common neighbors come from the same
    hub-capped wedge expansion (centers with deg ≤ 256, cap applied
    identically in the oracle); edges whose every common neighbor is a
    super-hub report cn = 0 — the documented cap semantics.
    |N(a)∪N(b)| = deg(a)+deg(b)−cn (neighbor sets include the partner
    endpoint; no self loops exist).

    100 TB shape: one degree aggregate, the capped center-keyed wedge
    join, one (x, y) hash aggregate SEMI-joined to the edge list, two
    broadcast-degree attaches; all-integer until the final division."""
    from kg_etl_spark.operators.adjacent import undirected_transition_edges_cut

    e0 = undirected_transition_edges_cut(read_table(spark, sf_dir, "events"))
    slots = e0.select(F.col("a").alias("s"), F.col("b").alias("t")).union(
        e0.select(F.col("b").alias("s"), F.col("a").alias("t"))
    )
    deg = slots.groupBy(F.col("s").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    ctr = slots.join(
        deg.filter(F.col("d") <= _LP_HUB_CAP).select(F.col("node").alias("s")), "s"
    ).select(F.col("s").alias("z"), F.col("t").alias("x"))
    other = ctr.select(F.col("z"), F.col("x").alias("y"))
    cn = (
        ctr.join(other, "z")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    feat = (
        e0.join(
            cn, (e0["a"] == cn["x"]) & (e0["b"] == cn["y"]), "left"
        )
        .select("a", "b", F.coalesce("cn", F.lit(0)).alias("cn"))
        .join(deg.select(F.col("node").alias("a"), F.col("d").alias("deg_a")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("d").alias("deg_b")), "b")
    )
    return feat.select(
        "a",
        "b",
        "cn",
        F.col("deg_a").cast("long").alias("deg_a"),
        F.col("deg_b").cast("long").alias("deg_b"),
        F.round(
            F.col("cn").cast("double")
            / (F.col("deg_a") + F.col("deg_b") - F.col("cn")).cast("double"),
            6,
        ).alias("jaccard"),
    )


ORACLE_EDGE_JACCARD = f"""
WITH raw AS (
  SELECT user_id AS src,
         LEAD(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS dst
  FROM events
), e0 AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM raw WHERE dst IS NOT NULL AND src <> dst
), slots AS (
  SELECT a AS s, b AS t FROM e0 UNION ALL SELECT b AS s, a AS t FROM e0
), deg AS (SELECT s AS node, COUNT(*) AS d FROM slots GROUP BY s),
ctr AS (
  SELECT sl.s AS z, sl.t AS x
  FROM slots sl JOIN deg dg ON dg.node = sl.s
  WHERE dg.d <= {_LP_HUB_CAP}
), cn AS (
  SELECT c1.x AS x, c2.x AS y, COUNT(*) AS cn
  FROM ctr c1 JOIN ctr c2 ON c1.z = c2.z AND c1.x < c2.x
  GROUP BY 1, 2
)
SELECT e.a, e.b, CAST(COALESCE(cn.cn, 0) AS BIGINT) AS cn,
       CAST(da.d AS BIGINT) AS deg_a, CAST(db.d AS BIGINT) AS deg_b,
       ROUND(CAST(COALESCE(cn.cn, 0) AS DOUBLE)
             / CAST(da.d + db.d - COALESCE(cn.cn, 0) AS DOUBLE), 6) AS jaccard
FROM e0 e
LEFT JOIN cn ON cn.x = e.a AND cn.y = e.b
JOIN deg da ON da.node = e.a
JOIN deg db ON db.node = e.b
"""

QUERIES["edge_jaccard_features"] = q_edge_jaccard_features
ORACLES["edge_jaccard_features"] = ORACLE_EDGE_JACCARD
