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
    from kg_etl_spark.operators.spectral import spectral_bisection

    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    pairs = (
        ev.select(
            F.col("user_id").alias("src"),
            F.lead("user_id").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
        .select(
            F.least("src", "dst").alias("a_id"), F.greatest("src", "dst").alias("b_id")
        )
        .distinct()
    )
    return spectral_bisection(pairs, iterations=3)


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
    ).localCheckpoint(eager=False)
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

    100 TB shape: one degree aggregate, two broadcast-joined degree
    attaches keyed by the edge endpoints, one global 1-row aggregate —
    no windows, nothing quadratic."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    e0 = (
        ev.select(
            F.col("user_id").alias("src"),
            F.lead("user_id").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
        .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
    )
    e = e0.select(F.col("a").alias("s"), F.col("b").alias("t")).union(
        e0.select(F.col("b").alias("s"), F.col("a").alias("t"))
    )
    deg = e.groupBy(F.col("s").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    ed = (
        e.join(F.broadcast(deg.select(F.col("node").alias("s"), F.col("d").alias("dx"))), "s")
        .join(F.broadcast(deg.select(F.col("node").alias("t"), F.col("d").alias("dy"))), "t")
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
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    e0 = (
        ev.select(
            F.col("user_id").alias("src"),
            F.lead("user_id").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
        .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
    )
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
