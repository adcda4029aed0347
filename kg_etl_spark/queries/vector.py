"""Embedding similarity-search catalog over the `embeddings` table.

Scores are computed as a sequential left fold in double on both engines
(Spark F.aggregate vs DuckDB list_reduce) so dot products are
bit-identical; output rounded to 6 as belt-and-suspenders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kg_etl_spark.operators.clustering import kmeans_lloyd
from kg_etl_spark.operators.similarity import (
    brute_force_topk,
    cosine_neardup_pairs_adaptive,
    hyperplane_lsh_neardup_pairs,
    ivf_topk,
)
from kg_etl_spark.session import read_table

_N_QUERIES = 8
_K = 5

_SQL_DOT = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)"
)
_SQL_NORM = (
    "sqrt(list_reduce(list_transform({a}, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y))"
)


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return brute_force_topk(emb, queries, k=_K)


ORACLE_TOPK = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < {_N_QUERIES}),
s AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {_SQL_DOT.format(a='q.qe', b='e.embedding')}
           / ({_SQL_NORM.format(a='q.qe')} * {_SQL_NORM.format(a='e.embedding')}) AS score
  FROM q, embeddings e WHERE e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, rank, ROUND(score, 6) AS score FROM (
  SELECT query_id, neighbor_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM s
) WHERE rank <= {_K}
"""


def q_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    ex = emb.select("label", F.posexplode("embedding").alias("pos", "v"))
    return (
        ex.groupBy("label", (F.col("pos") + 1).alias("dim"))
        .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("centroid_val"))
    )


ORACLE_CENTROID = """
SELECT label, dim, ROUND(AVG(v), 6) AS centroid_val FROM (
  SELECT label, d.dim AS dim, CAST(embedding[d.dim] AS DOUBLE) AS v
  FROM embeddings, (SELECT unnest(range(1, 65)) AS dim) d
) GROUP BY label, dim
"""


def q_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN (IVF buckets) — Spark-only, rows-only check."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(emb, queries, k=_K, n_centroids=16, nprobe=4)


_NEARDUP_T = 0.35


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (dedup family, vector leg).

    Size-adaptive: exact broadcast-matmul below 1M vectors (the regime
    this oracle checks — bit-identical), hyperplane-LSH + exact verify
    above (no driver collect of the corpus)."""
    emb = read_table(spark, sf_dir, "embeddings")
    return cosine_neardup_pairs_adaptive(emb, threshold=_NEARDUP_T)


# Oracle uses the SAME sequential left-fold dot/norm as the Spark side
# (not list_cosine_similarity, whose summation order is unspecified) so
# scores are bit-identical before rounding.
ORACLE_NEARDUP = f"""
WITH n AS (
  SELECT vec_id, embedding, {_SQL_NORM.format(a='embedding')} AS nrm FROM embeddings
)
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       ROUND({_SQL_DOT.format(a='a.embedding', b='b.embedding')} / (a.nrm * b.nrm), 6) AS score
FROM n a, n b
WHERE a.vec_id < b.vec_id
  AND {_SQL_DOT.format(a='a.embedding', b='b.embedding')} / (a.nrm * b.nrm) >= {_NEARDUP_T}
"""


def q_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH near-dup pairs — the sub-quadratic scale path of
    embedding_neardup (approximate recall → Spark-only, rows-only).

    The synthetic embeddings contain no true near-dups (max pairwise
    cosine ≈ 0.5, below the regime sign-LSH can block), so the query
    plants one deterministic near-dup per vector: a copy with ±1%
    per-dimension perturbation (cos ≈ 0.9999). The operator must
    recover essentially all planted pairs at threshold 0.9."""
    emb = read_table(spark, sf_dir, "embeddings")
    jitter = F.transform(
        F.col("embedding"),
        lambda x, i: x + x * (F.pmod(F.xxhash64(F.col("vec_id") * 1000 + i), F.lit(100)) - 50).cast("double") / F.lit(5000.0),
    )
    planted = emb.select((F.col("vec_id") + 10_000_000).alias("vec_id"), jitter.alias("embedding"))
    corpus = emb.select("vec_id", "embedding").unionByName(planted)
    return hyperplane_lsh_neardup_pairs(corpus, threshold=0.9)


_KM_K = 8
_KM_ITERS = 2
_KM_D = 64


def q_kmeans_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-iteration Lloyd k-means (k=8) from the k lowest-vec_id init;
    returns the fitted centroids in long form. Oracle unrolls the same
    iterations; init cluster ids coincide with vec_id 0..k-1 because
    testdata ids are contiguous from 0."""
    emb = read_table(spark, sf_dir, "embeddings")
    return kmeans_lloyd(spark, emb, k=_KM_K, iterations=_KM_ITERS)


def _kmeans_oracle(k: int, iterations: int, d: int) -> str:
    """Unrolled Lloyd steps; distance folds and 6-dp centroid rounding
    mirror operators/clustering.py exactly."""
    dist = (
        f"list_reduce(list_prepend(0.0, list_transform(range(1, {d + 1}), "
        "i -> (e.v[i] - c.c[i]) * (e.v[i] - c.c[i]))), (acc, x) -> acc + x)"
    )
    sql = f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
c0 AS (SELECT vec_id AS cid, v AS c FROM e WHERE vec_id < {k})"""
    for it in range(1, iterations + 1):
        prev = f"c{it - 1}"
        mexprs = ", ".join(f"ROUND(AVG(v[{i}]), 6) AS m{i}" for i in range(1, d + 1))
        newlist = "[" + ", ".join(f"u{it}.m{i}" for i in range(1, d + 1)) + "]"
        sql += f""",
a{it} AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY {dist}, c.cid) AS rn
    FROM e CROSS JOIN {prev} c
  ) WHERE rn = 1
),
u{it} AS (SELECT cid, count(*) AS n, {mexprs} FROM a{it} GROUP BY cid),
c{it} AS (
  SELECT {prev}.cid, CASE WHEN u{it}.cid IS NULL THEN {prev}.c ELSE {newlist} END AS c
  FROM {prev} LEFT JOIN u{it} ON {prev}.cid = u{it}.cid
)"""
    sql += f"""
SELECT c{iterations}.cid AS cluster_id, dd.dim AS dim,
       c{iterations}.c[dd.dim] AS centroid_val, COALESCE(u{iterations}.n, 0) AS n_members
FROM c{iterations}
CROSS JOIN (SELECT unnest(range(1, {d + 1})) AS dim) dd
LEFT JOIN u{iterations} ON c{iterations}.cid = u{iterations}.cid
"""
    return sql


ORACLE_KMEANS = _kmeans_oracle(_KM_K, _KM_ITERS, _KM_D)


QUERIES = {
    "embedding_topk": q_embedding_topk,
    "embedding_neardup": q_embedding_neardup,
    "embedding_neardup_lsh": q_embedding_neardup_lsh,
    "centroid_per_label": q_centroid_per_label,
    "ivf_ann_topk": q_ivf_ann_topk,
    "kmeans_centroids": q_kmeans_centroids,
}

ORACLES = {
    "embedding_topk": ORACLE_TOPK,
    "embedding_neardup": ORACLE_NEARDUP,
    "centroid_per_label": ORACLE_CENTROID,
    "kmeans_centroids": ORACLE_KMEANS,
}


def q_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 vector compression manifest for the whole embeddings table."""
    from kg_etl_spark.operators.similarity import quantize_embeddings

    emb = read_table(spark, sf_dir, "embeddings")
    return quantize_embeddings(emb)


ORACLE_QUANTIZE = """
WITH v AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
  FROM embeddings
), n AS (
  SELECT vec_id, dv,
         sqrt(list_reduce(list_prepend(0.0::DOUBLE, dv), (a, x) -> a + x * x)) AS nrm
  FROM v
)
SELECT vec_id, round(nrm, 6) AS l2_norm,
       list_transform(dv, x -> greatest(-127, least(127, CAST(floor((x / nrm) * 127 + 0.5) AS INT)))) AS qvec
FROM n WHERE nrm > 0
"""

QUERIES["quantize_embeddings"] = q_quantize_embeddings
ORACLES["quantize_embeddings"] = ORACLE_QUANTIZE


def q_embedding_identical_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH provable-recall oracle: identical vectors have
    identical sign bits under every hyperplane → identical band keys →
    guaranteed candidates, and their verified cosine rounds to 1.0 —
    so with vectors 0..19 re-planted under ids +100000 the output at
    threshold 0.999999 is exactly the planted pairs (max organic
    pairwise cosine in this corpus is ~0.51). A pure recall gate for
    the 100-TB ANN path: one missed pair = row-count mismatch."""
    emb = read_table(spark, sf_dir, "embeddings")
    copies = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 100_000).alias("vec_id"), "embedding", "label"
    )
    pairs = hyperplane_lsh_neardup_pairs(
        emb.unionByName(copies), threshold=0.999999, max_bucket=None
    )
    return pairs.filter(F.col("b_id") == F.col("a_id") + 100_000).select(
        "a_id", "b_id", F.round("score", 2).alias("score")
    )


ORACLE_EMBEDDING_IDENTICAL = """
SELECT vec_id AS a_id, vec_id + 100000 AS b_id, CAST(1.0 AS DOUBLE) AS score
FROM embeddings WHERE vec_id < 20
"""

QUERIES["embedding_identical_recall"] = q_embedding_identical_recall
ORACLES["embedding_identical_recall"] = ORACLE_EMBEDDING_IDENTICAL


def q_ivf_identical_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF provable-recall oracle: a planted identical copy shares the
    query vector's nearest centroid (identical bucket ranking), so the
    probe always scans its bucket and it must surface as rank 1 with
    cosine rounding to 1.0 (max organic cosine ~0.51). One missed or
    misranked copy = value mismatch."""
    emb = read_table(spark, sf_dir, "embeddings")
    copies = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 100_000).alias("vec_id"), "embedding", "label"
    )
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_topk(emb.unionByName(copies), queries, k=1, n_centroids=16, nprobe=4)
    return out.select("query_id", "neighbor_id", "rank", "score")


ORACLE_IVF_IDENTICAL = """
SELECT vec_id AS query_id, vec_id + 100000 AS neighbor_id,
       CAST(1 AS BIGINT) AS rank, CAST(1.0 AS DOUBLE) AS score
FROM embeddings WHERE vec_id < 20
"""

QUERIES["ivf_identical_recall"] = q_ivf_identical_recall
ORACLES["ivf_identical_recall"] = ORACLE_IVF_IDENTICAL


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embedding table (operators/clustering.py
    `semantic_dedup`): cluster-blocked cosine groups, min-id keeper.
    Rows-only by documented design — k-means cluster boundaries and the
    cosine cutoff are float-sensitive, so the full output has no stable
    SQL mirror; the recall twin below carries the value-hash oracle."""
    from kg_etl_spark.operators.clustering import semantic_dedup

    emb = read_table(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, k=8, iterations=2, threshold=0.95)


def q_semantic_dedup_identical_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup provable-recall oracle (planted twin): vectors 0..19
    re-planted under ids +100000. An identical vector produces an
    identical distance row → the same argmin cluster, and its cosine to
    the original is 1.0 >= any threshold → the pair is always an edge,
    so the planted copy's component contains the original's smaller id
    and the copy can NEVER be the keeper. One planted row with
    is_kept=true (or a missing row) = hash mismatch."""
    from kg_etl_spark.operators.clustering import semantic_dedup

    emb = read_table(spark, sf_dir, "embeddings")
    copies = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 100_000).alias("vec_id"), "embedding", "label"
    )
    out = semantic_dedup(
        emb.unionByName(copies), k=8, iterations=2, threshold=0.95
    )
    return out.filter(F.col("vec_id") >= 100_000).select("vec_id", "is_kept")


ORACLE_SEMANTIC_DEDUP_IDENTICAL = """
SELECT vec_id + 100000 AS vec_id, CAST(false AS BOOLEAN) AS is_kept
FROM embeddings WHERE vec_id < 20
"""

QUERIES["semantic_dedup"] = q_semantic_dedup
QUERIES["semantic_dedup_identical_recall"] = q_semantic_dedup_identical_recall
ORACLES["semantic_dedup_identical_recall"] = ORACLE_SEMANTIC_DEDUP_IDENTICAL


_NEG_K = 5
_NEG_ANCHORS = 20
_NEG_MIX = 100_003  # prime pair-mixing factor

from kg_etl_spark.operators.datapipe import _KNUTH_A, _M32  # noqa: E402


def q_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for
    each anchor vector, k pseudo-random candidates with a DIFFERENT
    label, chosen by a pair-keyed Knuth hash (reproducible across runs,
    partitionings, and engines — no rand()). Anchors broadcast; the
    corpus never shuffles except the per-anchor top-k window."""
    from pyspark.sql import Window

    emb = read_table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < _NEG_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"), F.col("label").alias("anchor_label")
    )
    cands = emb.select(F.col("vec_id").alias("neg_id"), F.col("label").alias("neg_label"))
    paired = cands.join(
        F.broadcast(anchors), F.col("neg_label") != F.col("anchor_label")
    )
    h = F.pmod(
        (F.col("anchor_id") * F.lit(_NEG_MIX) + F.col("neg_id")) * F.lit(_KNUTH_A),
        F.lit(_M32),
    )
    w = Window.partitionBy("anchor_id").orderBy(h.asc(), F.col("neg_id").asc())
    return (
        paired.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _NEG_K)
        .select("anchor_id", "neg_id", "neg_label", "rk")
    )


ORACLE_NEGATIVE_SAMPLES = f"""
WITH anchors AS (
  SELECT vec_id AS anchor_id, label AS anchor_label FROM embeddings WHERE vec_id < {_NEG_ANCHORS}
), paired AS (
  SELECT a.anchor_id, e.vec_id AS neg_id, e.label AS neg_label,
         ((a.anchor_id * {_NEG_MIX} + e.vec_id) * {_KNUTH_A}) % {_M32} AS h
  FROM embeddings e JOIN anchors a ON e.label <> a.anchor_label
)
SELECT anchor_id, neg_id, neg_label,
       ROW_NUMBER() OVER (PARTITION BY anchor_id ORDER BY h ASC, neg_id ASC) AS rk
FROM paired
QUALIFY rk <= {_NEG_K}
"""

QUERIES["negative_samples"] = q_negative_samples
ORACLES["negative_samples"] = ORACLE_NEGATIVE_SAMPLES


_MMR_POOL = 50
_MMR_K = 10


def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-aware MMR re-ranking (λ=0.5) of the top-50 cosine pool
    for 4 queries (operators/similarity.py `mmr_rerank`). Interior λ is
    greedy/float — rows-only; the λ=1 boundary twin below carries the
    value oracle."""
    from kg_etl_spark.operators.similarity import mmr_rerank

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return mmr_rerank(emb, queries, k=_MMR_K, lam=0.5, pool=_MMR_POOL)


def q_mmr_relevance_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted-provable MMR twin: at λ=1 the diversity penalty is
    multiplied by exactly 0.0, so greedy MMR provably degenerates to
    relevance ranking over the pool — SQL-enumerable (pool membership
    by unrounded rank, re-rank by the 6-dp score the operator sees)."""
    from kg_etl_spark.operators.similarity import mmr_rerank

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return mmr_rerank(emb, queries, k=_MMR_K, lam=1.0, pool=_MMR_POOL)


ORACLE_MMR_BOUNDARY = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 4),
s AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {_SQL_DOT.format(a='q.qe', b='e.embedding')}
           / ({_SQL_NORM.format(a='q.qe')} * {_SQL_NORM.format(a='e.embedding')}) AS score
  FROM q, embeddings e WHERE e.vec_id <> q.query_id
),
pool AS (
  SELECT query_id, neighbor_id, ROUND(score, 6) AS score FROM (
    SELECT query_id, neighbor_id, score,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
    FROM s
  ) WHERE rank <= {_MMR_POOL}
)
SELECT query_id, neighbor_id, mmr_rank, score FROM (
  SELECT query_id, neighbor_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS mmr_rank
  FROM pool
) WHERE mmr_rank <= {_MMR_K}
"""

QUERIES["mmr_rerank"] = q_mmr_rerank
QUERIES["mmr_relevance_boundary"] = q_mmr_relevance_boundary
ORACLES["mmr_relevance_boundary"] = ORACLE_MMR_BOUNDARY


# --- Product quantization ANN (operators/pq.py) -----------------------

_PQ_M = 8
_PQ_KSUB = 16
_PQ_ITERS = 2


def q_pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC approximate top-k (operators/pq.py): codebooks trained on
    the corpus, 8-byte codes, per-query LUT scoring, exact rerank of a
    50-candidate shortlist. Rows-only by documented design — shortlist
    membership under quantization has no stable SQL mirror; the
    provable core (identical vectors ⇒ identical codes) is the
    `pq_identical_recall` twin, and recall vs brute force is
    property-tested (tests/test_pq_kcenter.py)."""
    from kg_etl_spark.operators.pq import pq_ann_topk, pq_train_codebooks

    emb = read_table(spark, sf_dir, "embeddings")
    books = pq_train_codebooks(emb, m=_PQ_M, ksub=_PQ_KSUB, iterations=_PQ_ITERS)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return pq_ann_topk(emb, queries, books, k=_K, shortlist=50)


def q_pq_identical_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ provable-recall oracle (planted twin): vectors 0..19
    re-planted under ids +100000. Identical vectors have identical
    subspace slices → identical per-centroid distances → the same
    first-minimum argmin in every subspace (array_position picks the
    FIRST minimum, deterministically) → byte-identical codes and equal
    norms. One planted pair with differing codes = hash mismatch."""
    from kg_etl_spark.operators.pq import pq_encode, pq_train_codebooks

    emb = read_table(spark, sf_dir, "embeddings")
    books = pq_train_codebooks(emb, m=_PQ_M, ksub=_PQ_KSUB, iterations=_PQ_ITERS)
    copies = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 100_000).alias("vec_id"), "embedding", "label"
    )
    enc = pq_encode(emb.unionByName(copies), books)
    a = enc.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("a_id"), F.col("codes").alias("_ca"), F.col("norm").alias("_na")
    )
    b = enc.filter(F.col("vec_id") >= 100_000).select(
        (F.col("vec_id") - 100_000).alias("a_id"),
        F.col("vec_id").alias("b_id"),
        F.col("codes").alias("_cb"),
        F.col("norm").alias("_nb"),
    )
    return a.join(b, "a_id").select(
        "a_id",
        "b_id",
        (F.col("_ca") == F.col("_cb")).alias("codes_match"),
        (F.col("_na") == F.col("_nb")).alias("norm_match"),
    )


ORACLE_PQ_IDENTICAL = """
SELECT vec_id AS a_id, vec_id + 100000 AS b_id,
       CAST(true AS BOOLEAN) AS codes_match,
       CAST(true AS BOOLEAN) AS norm_match
FROM embeddings WHERE vec_id < 20
"""

QUERIES["pq_ann_topk"] = q_pq_ann_topk
QUERIES["pq_identical_recall"] = q_pq_identical_recall
ORACLES["pq_identical_recall"] = ORACLE_PQ_IDENTICAL


# --- k-center greedy diversity selection (operators/kcenter.py) -------

_KC_K = 6

_SQL_L2 = (
    "sqrt(list_reduce(list_transform(list_zip({a}, {b}), "
    "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), "
    "(x, y) -> x + y))"
)


def q_kcenter_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-center greedy exemplars (operators/kcenter.py). Fully oracled:
    the k-round maximin trajectory is replayed in DuckDB as unrolled
    CTEs — same seed (lowest id), same left-fold L2, same
    (dist desc, id asc) argmax tie-break, so every selected id and its
    6-dp selection distance must match."""
    from kg_etl_spark.operators.kcenter import kcenter_greedy

    emb = read_table(spark, sf_dir, "embeddings")
    return kcenter_greedy(spark, emb, k=_KC_K)


def _kcenter_oracle(k: int) -> str:
    l2 = _SQL_L2
    ctes = [
        "e AS (SELECT vec_id, embedding FROM embeddings)",
        "c1 AS (SELECT vec_id, embedding FROM e ORDER BY vec_id LIMIT 1)",
        f"d1 AS (SELECT e.vec_id, e.embedding, {l2.format(a='e.embedding', b='c1.embedding')} AS d FROM e, c1)",
    ]
    for r in range(2, k + 1):
        ctes.append(
            f"c{r} AS (SELECT vec_id, embedding, d FROM d{r-1} ORDER BY d DESC, vec_id ASC LIMIT 1)"
        )
        if r < k:
            ctes.append(
                f"d{r} AS (SELECT t.vec_id, t.embedding, "
                f"LEAST(t.d, {l2.format(a='t.embedding', b=f'c{r}.embedding')}) AS d "
                f"FROM d{r-1} t, c{r})"
            )
    selects = ["SELECT 1 AS sel_round, vec_id, CAST(NULL AS DOUBLE) AS maximin_dist FROM c1"]
    for r in range(2, k + 1):
        selects.append(f"SELECT {r} AS sel_round, vec_id, ROUND(d, 6) AS maximin_dist FROM c{r}")
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(selects)


ORACLE_KCENTER = _kcenter_oracle(_KC_K)

QUERIES["kcenter_select"] = q_kcenter_select
ORACLES["kcenter_select"] = ORACLE_KCENTER


# --- PCA top component via power iteration -----------------------------


_PCA_ITERS = 8
_DEC12 = "decimal(28,12)"


def q_pca_power_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding corpus by power
    iteration — value-checked END TO END despite being an iterative
    ML primitive:

    - the centered covariance accumulates as exact LONG sums of
      per-row products rounded at 9 dp then scaled by 1e9 (the
      integer is recovered exactly — the double sits within 1e-5 of
      it — so the sum is order-independent like the decimal device
      but ~3x faster through codegen); one vec_id-keyed self-join of
      the exploded (row, dim, value) frame with map-side partial
      aggregation — the only distributed work, one shuffle of 4096
      keys. Only the UPPER triangle (j >= i) is aggregated — the
      rounded product commutes bit-exactly (d*e == e*d in IEEE, so
      round(round(d*e,9)*1e9) is the same integer both ways) and the
      lower triangle is mirrored on the driver, halving the product
      fan-out (r11; attaching the means as a collected literal map
      instead of the broadcast join was measured SLOWER — the extra
      serial collect job costs more than the join).
      The centered frame is explicitly repartitioned by vec_id
      BEFORE the 64x fan-out: AQE sizes the stage by the small
      pre-explosion input and would otherwise run the 8M-row
      product aggregation in one task (measured 18.4 s -> ~2 s);
    - the 64×64 matrix is MODEL STATE (collected, documented scalar-
      scale exception); 8 L1-normalized power iterations run on the
      driver with every sum a pinned left fold over dims in order,
      mirrored in the oracle via DuckDB list_reduce — bit-identical
      IEEE arithmetic, outputs rounded at 6 dp.

    At 100 TB the d² shuffle keys are constant and the exploded
    self-join is d× row-proportional — the covariance pass scales; the
    driver never sees more than d² values."""
    emb = read_table(spark, sf_dir, "embeddings")
    n = emb.count()
    ex = emb.select("vec_id", F.posexplode("embedding").alias("i", "x")).select(
        "vec_id", "i", F.round(F.col("x").cast("double"), 9).alias("x")
    )
    means = ex.groupBy("i").agg(
        (F.sum(F.col("x").cast(_DEC12)).cast("double") / F.lit(float(n))).alias("m")
    )
    # checkpoint the centered frame: both sides of the outer-product
    # self-join read it, and without the cut each side re-runs the
    # means broadcast subtree (recompute + a planner stall observed)
    d = (
        ex.join(F.broadcast(means), "i")
        .select("vec_id", "i", (F.col("x") - F.col("m")).alias("d"))
        .repartition(spark.sparkContext.defaultParallelism, "vec_id")
        .lineage_cut(eager=True)
    )
    b = d.select("vec_id", F.col("i").alias("j"), F.col("d").alias("e"))
    # sum(round(round(d*e,9)*1e9)) as LONG: the scaled product is
    # within 1e-5 of its integer, so the outer round recovers it
    # exactly on both engines; long partial sums stay exact up to
    # ~9e18 (n*|d*e|*1e9 — fine through corpus scale, and the sum is
    # the same integer on every partitioning). j >= i only: the
    # rounded product is symmetric bit-for-bit, mirror on the driver.
    cov = (
        d.join(b, "vec_id")
        .where(F.col("j") >= F.col("i"))
        .groupBy("i", "j")
        .agg(
            F.sum(
                F.round(F.round(F.col("d") * F.col("e"), 9) * F.lit(1.0e9), 0).cast("long")
            ).alias("s")
        )
    )
    rows = cov.collect()
    C = {(r["i"], r["j"]): (float(r["s"]) / 1.0e9) / float(n) for r in rows}
    for (i, j), v in list(C.items()):
        if i != j:
            C[(j, i)] = v
    dims = sorted({r["i"] for r in rows})
    x = {i: 1.0 / float(len(dims)) for i in dims}

    def fold(vals):
        acc = vals[0]
        for v in vals[1:]:
            acc = acc + v
        return acc

    for _ in range(_PCA_ITERS):
        y = {i: fold([C[(i, j)] * x[j] for j in dims]) for i in dims}
        l1 = fold([abs(y[i]) for i in dims])
        x = {i: y[i] / l1 for i in dims}
    out = [(int(i), round(x[i], 6)) for i in dims]
    return spark.createDataFrame(out, "dim int, loading double")


def _pca_oracle_sql() -> str:
    sql = """
WITH p AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
         ROUND(CAST(unnest(embedding) AS DOUBLE), 9) AS x
  FROM embeddings
), nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM embeddings),
means AS (
  SELECT i, CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / (SELECT n FROM nn) AS m
  FROM p GROUP BY i
), d AS (
  SELECT p.vec_id, p.i, p.x - m.m AS d FROM p JOIN means m USING (i)
), cov AS MATERIALIZED (
  SELECT a.i AS i, b.i AS j,
         CAST(SUM(CAST(ROUND(ROUND(a.d * b.d, 9) * CAST(1000000000 AS DOUBLE), 0) AS BIGINT)) AS DOUBLE)
           / CAST(1000000000 AS DOUBLE) / (SELECT n FROM nn) AS c
  FROM d a JOIN d b USING (vec_id) GROUP BY a.i, b.i
), x0 AS (
  SELECT i AS dim, 1.0 / (SELECT CAST(COUNT(*) AS DOUBLE) FROM means) AS v FROM means
)"""
    for k in range(1, _PCA_ITERS + 1):
        sql += f""", y{k} AS MATERIALIZED (
  SELECT c.i AS dim, list_reduce(list(c.c * x.v ORDER BY c.j), (a, b) -> a + b) AS y
  FROM cov c JOIN x{k - 1} x ON x.dim = c.j GROUP BY c.i
), n{k} AS MATERIALIZED (
  SELECT list_reduce(list(abs(y) ORDER BY dim), (a, b) -> a + b) AS l1 FROM y{k}
), x{k} AS MATERIALIZED (
  SELECT dim, y / (SELECT l1 FROM n{k}) AS v FROM y{k}
)"""
    return sql + f"\nSELECT CAST(dim AS INT) AS dim, ROUND(v, 6) AS loading FROM x{_PCA_ITERS}"


ORACLE_PCA_POWER = _pca_oracle_sql()

QUERIES["pca_power_top"] = q_pca_power_top
ORACLES["pca_power_top"] = ORACLE_PCA_POWER


# --- Davies-Bouldin cluster quality over the labeled embeddings --------


def q_cluster_quality_db(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Davies–Bouldin readout (TPAMI 1979) of the embedding labels as
    a clustering: per label the within-cluster scatter S (RMS distance
    to the centroid via the variance identity E[x²] − m², never a
    second corpus pass), and the worst similarity ratio
    R = max_{b≠a} (S_a + S_b)/‖c_a − c_b‖ — the per-cluster term whose
    average is the DB index (lower = tighter/better separated).

    Determinism (the PCA scale-exception device, vector.py:564): float
    components round to 9 dp; per-dim sums accumulate in decimal —
    s1 exactly, x² exactly in decimal(38,18) — so every distributed
    aggregate is order-free; the variance/distance terms are then
    12 dp-rounded decimals summed over the FIXED 64 dims, and only the
    final sqrt/÷ touch IEEE doubles (correctly rounded by spec).
    Rounding can leave a −1e-12 variance ghost: clamped at zero before
    the sqrt on both engines.

    100 TB shape: ONE (label, dim)-keyed hash aggregate over the
    exploded corpus (d× row-proportional, map-side combine); the
    centroid matrix (|labels|·d rows) is model state and every
    pairwise step runs on it."""
    emb = read_table(spark, sf_dir, "embeddings")
    ex = emb.select("label", F.posexplode("embedding").alias("i", "x")).select(
        "label", "i", F.round(F.col("x").cast("double"), 9).alias("x")
    )
    D9 = "decimal(19,9)"
    per = ex.groupBy("label", "i").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(_DEC12)).alias("s1"),
        F.sum(F.col("x").cast(D9) * F.col("x").cast(D9)).alias("s2"),
    )
    m = F.col("s1").cast("double") / F.col("n").cast("double")
    var12 = F.round(
        F.col("s2").cast("double") / F.col("n").cast("double") - m * m, 12
    ).cast(_DEC12)
    dims = per.select("label", "i", F.col("n"), m.alias("m"), var12.alias("v"))
    stats = (
        dims.groupBy("label")
        .agg(
            F.max("n").alias("n_vecs"),
            F.sqrt(F.greatest(F.sum("v").cast("double"), F.lit(0.0))).alias("s"),
        )
    )
    a = dims.select(F.col("label").alias("la"), "i", F.col("m").alias("ma"))
    b = dims.select(F.col("label").alias("lb"), "i", F.col("m").alias("mb"))
    dist = (
        a.join(b, "i")
        .filter(F.col("la") != F.col("lb"))
        .groupBy("la", "lb")
        .agg(
            F.sqrt(
                F.greatest(
                    F.sum(
                        F.round(
                            (F.col("ma") - F.col("mb")) * (F.col("ma") - F.col("mb")), 12
                        ).cast(_DEC12)
                    ).cast("double"),
                    F.lit(0.0),
                )
            ).alias("d")
        )
    )
    sa = stats.select(F.col("label").alias("la"), F.col("s").alias("sca"))
    sb = stats.select(F.col("label").alias("lb"), F.col("s").alias("scb"))
    r = (
        dist.join(sa, "la")
        .join(sb, "lb")
        .filter(F.col("d") > 0)
        .select(
            "la",
            "lb",
            ((F.col("sca") + F.col("scb")) / F.col("d")).alias("r"),
        )
    )
    worst = (
        r.groupBy(F.col("la").alias("label"))
        # negated lb: at an exact r tie the SMALLEST other label wins,
        # matching the oracle's ORDER BY r DESC, lb ASC
        .agg(F.max(F.struct(F.col("r"), (-F.col("lb")).alias("nlb"))).alias("w"))
        .select(
            "label",
            (-F.col("w.nlb")).cast("int").alias("worst_other"),
            F.round(F.col("w.r"), 6).alias("db_term"),
        )
    )
    return (
        stats.join(worst, "label")
        .select(
            "label",
            "n_vecs",
            F.round(F.col("s"), 6).alias("scatter"),
            "worst_other",
            "db_term",
        )
    )


ORACLE_CLUSTER_QUALITY_DB = """
WITH ex AS (
  SELECT label, generate_subscripts(embedding, 1) - 1 AS i,
         ROUND(CAST(unnest(embedding) AS DOUBLE), 9) AS x
  FROM embeddings
), per AS (
  SELECT label, i, COUNT(*) AS n,
         SUM(CAST(x AS DECIMAL(28,12))) AS s1,
         SUM(CAST(x AS DECIMAL(19,9)) * CAST(x AS DECIMAL(19,9))) AS s2
  FROM ex GROUP BY 1, 2
), dims AS (
  SELECT label, i, n,
         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m,
         CAST(ROUND(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                    - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                      * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)), 12)
              AS DECIMAL(28,12)) AS v
  FROM per
), stats AS (
  SELECT label, MAX(n) AS n_vecs,
         SQRT(GREATEST(CAST(SUM(v) AS DOUBLE), 0.0)) AS s
  FROM dims GROUP BY label
), dist AS (
  SELECT a.label AS la, b.label AS lb,
         SQRT(GREATEST(CAST(SUM(CAST(ROUND((a.m - b.m) * (a.m - b.m), 12)
                                     AS DECIMAL(28,12))) AS DOUBLE), 0.0)) AS d
  FROM dims a JOIN dims b ON a.i = b.i AND a.label <> b.label
  GROUP BY 1, 2
), r AS (
  SELECT d.la, d.lb, (sa.s + sb.s) / d.d AS r
  FROM dist d JOIN stats sa ON sa.label = d.la
              JOIN stats sb ON sb.label = d.lb
  WHERE d.d > 0
), worst AS (
  SELECT la AS label, lb AS worst_other, ROUND(r, 6) AS db_term,
         ROW_NUMBER() OVER (PARTITION BY la ORDER BY r DESC, lb ASC) AS rn
  FROM r
)
SELECT s.label, s.n_vecs, ROUND(s.s, 6) AS scatter, w.worst_other, w.db_term
FROM stats s JOIN worst w ON w.label = s.label AND w.rn = 1
"""

QUERIES["cluster_quality_db"] = q_cluster_quality_db
ORACLES["cluster_quality_db"] = ORACLE_CLUSTER_QUALITY_DB


# --- Matryoshka truncation eval: recall@k of prefix dims ---------------


_MRL_QUERIES = 32
_MRL_K = 10
_MRL_DIMS = 16


def q_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation eval (Kusupati et al., NeurIPS'22
    lineage): per query, recall@10 of brute-force cosine top-10 using
    only the FIRST 16 of 64 dims against the full-dim top-10 — the
    readout that decides how far a deployment can truncate its
    embeddings before ANN quality collapses.

    Determinism: both retrieval passes are the exact brute_force_topk
    device (score desc, id asc total order); recall counts are exact
    integers over the joined rank lists; one divide at output.

    100 TB shape: two broadcast-query scans of the corpus (the corpus
    NEVER shuffles — same posture as embedding_topk), one
    (query, neighbor)-keyed join of two k-row-per-query lists, one
    ≤|queries|-row aggregate."""
    from pyspark.sql import Window

    from kg_etl_spark.operators.similarity import cosine

    emb = read_table(spark, sf_dir, "embeddings")
    qf = emb.filter(F.col("vec_id") < _MRL_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("_qvec")
    )
    # ONE fused corpus pass (formerly two brute_force_topk scans): each
    # (query, candidate) row carries BOTH the full-dim and the
    # truncated cosine, the two rank windows share the same
    # query-keyed exchange, and the rank-list intersection join
    # collapses into a conditional sum — the rank definitions (score
    # desc on the UNROUNDED cosine, id asc) are exactly the device's
    scored = (
        emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("_cvec"))
        .join(F.broadcast(qf))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("_sf", cosine(F.col("_qvec"), F.col("_cvec")))
        .withColumn(
            "_st",
            cosine(
                F.slice(F.col("_qvec"), 1, _MRL_DIMS),
                F.slice(F.col("_cvec"), 1, _MRL_DIMS),
            ),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("_sf").desc(), F.col("neighbor_id").asc()
    )
    wt = Window.partitionBy("query_id").orderBy(
        F.col("_st").desc(), F.col("neighbor_id").asc()
    )
    ranked = scored.withColumn("_rf", F.row_number().over(wf)).withColumn(
        "_rt", F.row_number().over(wt)
    )
    return (
        ranked.filter(F.col("_rf") <= _MRL_K)
        .groupBy("query_id")
        .agg(F.sum((F.col("_rt") <= _MRL_K).cast("long")).alias("n_hits"))
        .select(
            "query_id",
            "n_hits",
            F.round(F.col("n_hits").cast("double") / F.lit(float(_MRL_K)), 6).alias(
                "recall_at_k"
            ),
        )
    )


ORACLE_MATRYOSHKA = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe, embedding[1:{_MRL_DIMS}] AS qt
  FROM embeddings WHERE vec_id < {_MRL_QUERIES}
), fulltop AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
             {_SQL_DOT.format(a='q.qe', b='e.embedding')}
               / ({_SQL_NORM.format(a='q.qe')} * {_SQL_NORM.format(a='e.embedding')}) DESC,
             e.vec_id ASC) AS rank
    FROM q, embeddings e WHERE e.vec_id <> q.query_id
  ) WHERE rank <= {_MRL_K}
), trunctop AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
             {_SQL_DOT.format(a='q.qt', b='e.embedding[1:' + str(_MRL_DIMS) + ']')}
               / ({_SQL_NORM.format(a='q.qt')} * {_SQL_NORM.format(a='e.embedding[1:' + str(_MRL_DIMS) + ']')}) DESC,
             e.vec_id ASC) AS rank
    FROM q, embeddings e WHERE e.vec_id <> q.query_id
  ) WHERE rank <= {_MRL_K}
)
SELECT f.query_id,
       COALESCE(h.n_hits, 0) AS n_hits,
       ROUND(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / {_MRL_K}.0, 6) AS recall_at_k
FROM (SELECT DISTINCT query_id FROM fulltop) f
LEFT JOIN (
  SELECT f.query_id, COUNT(*) AS n_hits
  FROM fulltop f JOIN trunctop t
    ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
  GROUP BY f.query_id
) h ON h.query_id = f.query_id
"""

QUERIES["matryoshka_recall"] = q_matryoshka_recall
ORACLES["matryoshka_recall"] = ORACLE_MATRYOSHKA
