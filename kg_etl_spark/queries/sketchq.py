"""Sketch catalog: Count-Min heavy hitters, HyperLogLog distincts, and
JL random projection — all on deterministic cross-engine arithmetic, so
the full sketch state (not just the API) is value-hash-verified against
DuckDB. Complements `sketch_stats` (Spark's built-in approx functions,
engine-specific → rows-only) with from-scratch verifiable twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kg_etl_spark.operators.sketches import (
    _CMS_A,
    _CMS_B,
    _M32,
    cms_estimate,
    hll_distinct,
    jl_project,
)
from kg_etl_spark.session import read_table

# --- Count-Min heavy hitters ------------------------------------------

_CMS_W = 256
_CMS_TOPN = 10


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top customers by order count, with their Count-Min estimates.
    The estimate can only overestimate (collisions add), which the
    boolean column witnesses — a property the oracle re-derives from
    the identical sketch."""
    orders = read_table(spark, sf_dir, "orders")
    true_counts = (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.col("true_cnt").desc(), F.col("o_custkey").asc())
        .limit(_CMS_TOPN)
    )
    est = cms_estimate(orders, true_counts, "o_custkey", w=_CMS_W)
    return (
        true_counts.join(est, "o_custkey")
        .select(
            "o_custkey",
            "true_cnt",
            F.col("cms_estimate").cast("long").alias("cms_estimate"),
            (F.col("cms_estimate") >= F.col("true_cnt")).alias("is_overestimate"),
        )
    )


def _bucket_sql(key: str, j: int) -> str:
    return f"((({key} % {_M32}) * {_CMS_A[j]} + {_CMS_B[j]}) % {_M32}) % {_CMS_W}"


ORACLE_CMS = f"""
WITH cells AS (
  {" UNION ALL ".join(f"SELECT {j} AS row, {_bucket_sql('o_custkey', j)} AS bucket FROM orders" for j in range(4))}
),
sketch AS (SELECT row, bucket, COUNT(*) AS c FROM cells GROUP BY row, bucket),
true_c AS (
  SELECT o_custkey, COUNT(*) AS true_cnt FROM orders GROUP BY o_custkey
  ORDER BY true_cnt DESC, o_custkey ASC LIMIT {_CMS_TOPN}
),
probes AS (
  {" UNION ALL ".join(f"SELECT t.o_custkey, t.true_cnt, s.c FROM true_c t JOIN sketch s ON s.row = {j} AND s.bucket = {_bucket_sql('t.o_custkey', j)}" for j in range(4))}
)
SELECT o_custkey, CAST(true_cnt AS BIGINT) AS true_cnt,
       CAST(MIN(c) AS BIGINT) AS cms_estimate,
       MIN(c) >= true_cnt AS is_overestimate
FROM probes GROUP BY o_custkey, true_cnt
"""


# --- HyperLogLog distinct users per event type ------------------------

_HLL_M = 64
_HLL_ALPHA_M2 = 0.709 * _HLL_M * _HLL_M


def q_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_true")
    )
    hll = hll_distinct(events, "event_type", "user_id", m=_HLL_M)
    return exact.join(hll, "event_type").select(
        "event_type", "n_true", "hll_estimate", "n_registers_hit"
    )


ORACLE_HLL = f"""
WITH h AS (
  SELECT event_type,
         (((user_id % {_M32}) * {_CMS_A[0]} + {_CMS_B[0]}) % {_M32}) AS hv
  FROM events
),
r AS (
  SELECT event_type, hv % {_HLL_M} AS reg,
         CASE WHEN CAST(floor(hv / {_HLL_M}) AS BIGINT) > 0
              THEN instr(lpad(bin(CAST(floor(hv / {_HLL_M}) AS BIGINT)), 26, '0'), '1')
              ELSE 27 END AS rho
  FROM h
),
mx AS (SELECT event_type, reg, MAX(rho) AS mx FROM r GROUP BY event_type, reg),
s AS (
  SELECT event_type,
         SUM(CAST(power(2.0, -mx) AS DECIMAL(38,30))) AS _s,
         COUNT(*) AS hit
  FROM mx GROUP BY event_type
),
est AS (
  SELECT event_type, hit,
         {_HLL_ALPHA_M2!r} / (CAST(_s AS DOUBLE) + {float(_HLL_M)!r} - hit) AS raw
  FROM s
),
exact AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_true
  FROM events GROUP BY event_type
)
SELECT e.event_type, n_true,
       ROUND(CASE WHEN raw < {2.5 * _HLL_M!r} AND hit < {_HLL_M}
                  THEN {float(_HLL_M)!r} * ln({float(_HLL_M)!r} / ({_HLL_M} - hit))
                  ELSE raw END, 6) AS hll_estimate,
       CAST(hit AS BIGINT) AS n_registers_hit
FROM est e JOIN exact USING (event_type)
"""


# --- JL random projection ---------------------------------------------

_JL_DOUT = 16


def q_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    return jl_project(emb, d_out=_JL_DOUT)


_JL_A = _CMS_A[0]
_JL_B = _CMS_B[1]

ORACLE_JL = f"""
WITH dims AS (SELECT unnest(range(0, {_JL_DOUT})) AS out_dim),
proj AS (
  SELECT vec_id, out_dim,
         list_reduce(
           list_transform(
             list_zip(embedding, range(0, 64)),
             p -> CAST(p[1] AS DOUBLE) *
                  (CASE WHEN ((p[2] * {_JL_A} + out_dim * {_JL_B}) % {_M32} // 256) % 2 = 1
                        THEN 1.0 ELSE -1.0 END)
           ),
           (x, y) -> x + y
         ) * 0.25 AS raw
  FROM embeddings, dims
)
SELECT vec_id, CAST(out_dim AS BIGINT) AS out_dim, ROUND(raw, 6) AS value
FROM proj
"""


QUERIES = {
    "cms_heavy_hitters": q_cms_heavy_hitters,
    "hll_distinct_users": q_hll_distinct_users,
    "jl_projection": q_jl_projection,
}

ORACLES = {
    "cms_heavy_hitters": ORACLE_CMS,
    "hll_distinct_users": ORACLE_HLL,
    "jl_projection": ORACLE_JL,
}


def q_hll_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimation via HLL set algebra: clicking users
    vs purchasing users (operators/sketches.py `hll_overlap` — union =
    register max, intersection by inclusion-exclusion)."""
    from kg_etl_spark.operators.sketches import hll_overlap

    ev = read_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return hll_overlap(a, b, "user_id", m=_HLL_M)


_RHO_SQL = f"""
  SELECT (((user_id % {_M32}) * {_CMS_A[0]} + {_CMS_B[0]}) % {_M32}) % {_HLL_M} AS reg,
         CASE WHEN CAST(floor((((user_id % {_M32}) * {_CMS_A[0]} + {_CMS_B[0]}) % {_M32}) / {_HLL_M}) AS BIGINT) > 0
              THEN instr(lpad(bin(CAST(floor((((user_id % {_M32}) * {_CMS_A[0]} + {_CMS_B[0]}) % {_M32}) / {_HLL_M}) AS BIGINT)), 26, '0'), '1')
              ELSE 27 END AS rho
  FROM events WHERE event_type = '{{etype}}'
"""


def _est_sql(regs_cte: str, out_name: str) -> str:
    return f"""
  SELECT ROUND(CASE WHEN raw < {2.5 * _HLL_M!r} AND hit < {_HLL_M}
                    THEN {float(_HLL_M)!r} * ln({float(_HLL_M)!r} / ({_HLL_M} - hit))
                    ELSE raw END, 6) AS {out_name}
  FROM (
    SELECT hit, {_HLL_ALPHA_M2!r} / (CAST(s AS DOUBLE) + {float(_HLL_M)!r} - hit) AS raw
    FROM (
      SELECT SUM(CAST(power(2.0, -mx) AS DECIMAL(38,30))) AS s, COUNT(*) AS hit
      FROM {regs_cte}
    )
  )
"""


ORACLE_HLL_OVERLAP = f"""
WITH ha AS ({_RHO_SQL.format(etype='click')}),
hb AS ({_RHO_SQL.format(etype='purchase')}),
ra AS (SELECT reg, MAX(rho) AS mx FROM ha GROUP BY reg),
rb AS (SELECT reg, MAX(rho) AS mx FROM hb GROUP BY reg),
ru AS (SELECT reg, MAX(mx) AS mx FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb) GROUP BY reg),
ea AS ({_est_sql('ra', 'est_a')}),
eb AS ({_est_sql('rb', 'est_b')}),
eu AS ({_est_sql('ru', 'est_union')})
SELECT est_a, est_b, est_union,
       ROUND(est_a + est_b - est_union, 6) AS est_intersection,
       ROUND(ROUND(est_a + est_b - est_union, 6) / est_union, 6) AS jaccard_est
FROM ea, eb, eu
"""

QUERIES["hll_overlap"] = q_hll_overlap
ORACLES["hll_overlap"] = ORACLE_HLL_OVERLAP


def q_cms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer ⋈ orders join-cardinality estimate from two Count-Min
    sketches (operators/sketches.py `cms_join_size`) next to the exact
    count — the optimizer-style cardinality probe that never runs the
    join."""
    from kg_etl_spark.operators.sketches import cms_join_size

    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    est = cms_join_size(cust, orders, "c_custkey", "o_custkey", d=4, w=256)
    exact = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .agg(F.count(F.lit(1)).alias("true_join_size"))
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "est_join_size", "true_join_size", "d", "w",
        (F.col("est_join_size") >= F.col("true_join_size")).alias("is_overestimate"),
    )


ORACLE_CMS_JOIN_SIZE = f"""
WITH ca AS (
  {" UNION ALL ".join(f"SELECT {j} AS row, {_bucket_sql('c_custkey', j)} AS bucket FROM customer" for j in range(4))}
), cb AS (
  {" UNION ALL ".join(f"SELECT {j} AS row, {_bucket_sql('o_custkey', j)} AS bucket FROM orders" for j in range(4))}
),
sa AS (SELECT row, bucket, COUNT(*) AS c FROM ca GROUP BY row, bucket),
sb AS (SELECT row, bucket, COUNT(*) AS c FROM cb GROUP BY row, bucket),
ip AS (
  SELECT sa.row, SUM(sa.c * sb.c) AS p
  FROM sa JOIN sb ON sa.row = sb.row AND sa.bucket = sb.bucket
  GROUP BY sa.row
),
tj AS (
  SELECT COUNT(*) AS t FROM customer JOIN orders ON c_custkey = o_custkey
)
SELECT CAST(MIN(ip.p) AS BIGINT) AS est_join_size,
       CAST(tj.t AS BIGINT) AS true_join_size,
       CAST(4 AS BIGINT) AS d, CAST(256 AS BIGINT) AS w,
       MIN(ip.p) >= tj.t AS is_overestimate
FROM ip, tj GROUP BY tj.t
"""

QUERIES["cms_join_size"] = q_cms_join_size
ORACLES["cms_join_size"] = ORACLE_CMS_JOIN_SIZE


# --- Q-digest quantile sketch (operators/qdigest.py) ------------------

_QD_LOG_U = 6  # l_quantity domain 1..50 < 64


def q_qdigest_exact_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No-compression q-digest twin (●): with k ≥ n the fold threshold
    floor(n/k) is 0, so compression provably does nothing and the
    digest state IS the exact leaf histogram (node = value + 2^L) — a
    plain SQL GROUP BY. Proves the build path (domain filter, leaf
    numbering, histogram) end-to-end."""
    from kg_etl_spark.operators.qdigest import qdigest_build

    li = read_table(spark, sf_dir, "lineitem")
    return qdigest_build(li, "l_quantity", log_u=_QD_LOG_U, k=2_000_000_000)


ORACLE_QDIGEST_EXACT = f"""
SELECT CAST(l_quantity AS BIGINT) + {1 << _QD_LOG_U} AS node,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM lineitem
WHERE CAST(l_quantity AS BIGINT) >= 0 AND CAST(l_quantity AS BIGINT) < {1 << _QD_LOG_U}
GROUP BY 1
"""

QUERIES["qdigest_exact_state"] = q_qdigest_exact_state
ORACLES["qdigest_exact_state"] = ORACLE_QDIGEST_EXACT


_QDB_LOG_U = 17  # l_extendedprice in whole dollars < 131072
_QDB_K = 2048
_QDB_QS = [0.25, 0.5, 0.75, 0.95, 0.99]


def q_qdigest_quantile_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-digest rank-error guarantee as an oracle row (●): for each
    quantile q, the estimate from the COMPRESSED digest (k=2048 over
    whole-dollar prices) must satisfy the theorem
        #{v <= est} >= ceil(q·n)   and
        #{v <  est} <= ceil(q·n) + (L+1)·floor(n/k)
    (every internal node holds < floor(n/k) mass by construction; at
    most L ancestors span the estimate, plus the stopping node). The
    two ranks are computed EXACTLY on the corpus, so `within_bound`
    is a theorem-backed constant-true oracle — a wrong compression,
    walk order, or threshold shows up as false/hash-mismatch."""
    from kg_etl_spark.operators.qdigest import (
        qdigest_build,
        qdigest_quantile,
        qdigest_state_dict,
    )

    li = read_table(spark, sf_dir, "lineitem").select(
        F.floor("l_extendedprice").cast("long").alias("v")
    ).filter((F.col("v") >= 0) & (F.col("v") < (1 << _QDB_LOG_U)))
    state = qdigest_state_dict(
        qdigest_build(li, "v", log_u=_QDB_LOG_U, k=_QDB_K)
    )  # digest: <= 3k rows of model state
    n = sum(state.values())
    thr = n // _QDB_K
    ests = {q: qdigest_quantile(state, q, _QDB_LOG_U) for q in _QDB_QS}

    aggs = []
    for i, q in enumerate(_QDB_QS):
        target = -(-int(q * n * 1_000_000) // 1_000_000)  # ceil, float-drift-free
        aggs.append(
            (
                (F.sum((F.col("v") <= ests[q]).cast("long")) >= target)
                & (
                    F.sum((F.col("v") < ests[q]).cast("long"))
                    <= target + (_QDB_LOG_U + 1) * thr
                )
            ).alias(f"b{i}")
        )
    row = li.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(F.lit(q).alias("q"), F.col(f"b{i}").alias("within_bound"))
            for i, q in enumerate(_QDB_QS)
        ]
    )
    return (
        row.select(F.explode(pairs).alias("s"))
        .select(F.col("s.q").alias("q"), F.col("s.within_bound").alias("within_bound"))
    )


ORACLE_QDIGEST_BOUND = "SELECT q, CAST(true AS BOOLEAN) AS within_bound FROM (VALUES " + ", ".join(
    f"(CAST({q} AS DOUBLE))" for q in _QDB_QS
) + ") t(q)"

QUERIES["qdigest_quantile_bound"] = q_qdigest_quantile_bound
ORACLES["qdigest_quantile_bound"] = ORACLE_QDIGEST_BOUND
