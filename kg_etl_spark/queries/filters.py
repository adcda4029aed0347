"""Corpus-filter catalog: Gopher quality rules, C4 line cleaning,
duplicate-span flags, source frequency capping, surprisal tertiles,
and hybrid BM25+embedding retrieval (reciprocal-rank fusion).

No reference counterpart (chaayagirimon/kg-etl has no corpus filters)
— this is the training-data-pipeline surface. Determinism follows the
catalog contract (`kg_etl_spark/queries/__init__.py`): ratios are
single IEEE divides of exact integers, rounded at output; every rank
has a total (score, id) tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kg_etl_spark.operators.datapipe import _KNUTH_A, _M32
from kg_etl_spark.operators.filters import (
    c4_line_filter,
    duplicate_span_flags,
    duplicate_span_profile,
    gopher_quality_flags,
    remove_duplicate_spans,
    source_cap_sample,
    surprisal_tertile_buckets,
)
from kg_etl_spark.operators.search import bm25_topk
from kg_etl_spark.operators.similarity import brute_force_topk
from kg_etl_spark.queries.textq import _SQL_TOKS
from kg_etl_spark.session import read_table


# --- Gopher document-quality rules ------------------------------------


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return gopher_quality_flags(docs).select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "symbol_ratio",
        "alpha_frac",
        "stop_hits",
        "r_word_count",
        "r_mean_word_len",
        "r_symbol_ratio",
        "r_alpha_frac",
        "r_stopwords",
        "pass_gopher",
    )


_GOPHER_STOPS_SQL = " + ".join(
    f"CAST(list_contains(toks, '{s}') AS INT)"
    for s in ["the", "be", "to", "of", "and", "that", "have", "with"]
)

ORACLE_GOPHER = f"""
WITH t AS (SELECT doc_id, text, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_words,
         CAST(COALESCE(list_sum(list_transform(toks, x -> len(x))), 0) AS BIGINT) AS sum_len,
         CAST((length(text) - length(replace(text, '#', ''))) AS BIGINT)
           + CAST((length(text) - length(replace(text, '...', ''))) / 3 AS BIGINT) AS n_symbols,
         CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS n_alpha,
         CAST({_GOPHER_STOPS_SQL} AS BIGINT) AS stop_hits
  FROM t
),
r AS (
  SELECT doc_id, n_words, stop_hits,
         CASE WHEN n_words > 0 THEN CAST(sum_len AS DOUBLE) / n_words ELSE 0.0 END AS mean_word_len,
         CASE WHEN n_words > 0 THEN CAST(n_symbols AS DOUBLE) / n_words ELSE 0.0 END AS symbol_ratio,
         CASE WHEN n_words > 0 THEN CAST(n_alpha AS DOUBLE) / n_words ELSE 0.0 END AS alpha_frac
  FROM m
)
SELECT doc_id, n_words,
       ROUND(mean_word_len, 6) AS mean_word_len,
       ROUND(symbol_ratio, 6) AS symbol_ratio,
       ROUND(alpha_frac, 6) AS alpha_frac,
       stop_hits,
       (n_words >= 50 AND n_words <= 100000) AS r_word_count,
       (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS r_mean_word_len,
       (symbol_ratio <= 0.1) AS r_symbol_ratio,
       (alpha_frac >= 0.8) AS r_alpha_frac,
       (stop_hits >= 2) AS r_stopwords,
       ((n_words >= 50 AND n_words <= 100000)
        AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
        AND (symbol_ratio <= 0.1)
        AND (alpha_frac >= 0.8)
        AND (stop_hits >= 2)) AS pass_gopher
FROM r
"""


# --- C4 line-level cleaning -------------------------------------------
# documents.text is single-line synthetic prose, so (as with
# q_clean_wikitext's markup) a deterministic multi-line layout is
# synthesized from the tokens: lines of 6 tokens, a terminal '.' on
# every line where (doc_id + line_idx) % 3 == 0, and a cookie-notice
# boilerplate line prepended for doc_id % 7 == 0 — so every C4 rule
# (punctuation, min-words, banned-marker) decides real rows.

_COOKIE_LINE = "please accept our cookie policy now."


def _synth_lines(docs: DataFrame) -> DataFrame:
    from kg_etl_spark.operators.textquality import ws_tokens

    toks = ws_tokens(F.col("text"))
    n_lines = F.greatest(F.ceil(F.size(toks) / F.lit(6.0)).cast("int"), F.lit(1))
    idx = F.sequence(F.lit(0), n_lines - 1)
    line = lambda i: F.concat(  # noqa: E731
        F.concat_ws(" ", F.slice(toks, i * 6 + 1, 6)),
        F.when((F.col("doc_id") + i) % 3 == 0, F.lit(".")).otherwise(F.lit("")),
    )
    arr = F.transform(idx, line)
    arr = F.when(
        F.col("doc_id") % 7 == 0, F.concat(F.array(F.lit(_COOKIE_LINE)), arr)
    ).otherwise(arr)
    return docs.select("doc_id", F.concat_ws("\n", arr).alias("text"))


def q_c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return c4_line_filter(_synth_lines(docs))


_SQL_LINE_TOKS = r"list_filter(string_split_regex(trim(lower(l)), '\s+'), x -> len(x) > 0)"

ORACLE_C4_LINES = rf"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
built AS (
  SELECT doc_id,
         list_transform(
           range(0, greatest(CAST(ceil(len(toks) / 6.0) AS BIGINT), 1)),
           i -> array_to_string(list_slice(toks, i * 6 + 1, i * 6 + 6), ' ')
                || CASE WHEN (doc_id + i) % 3 = 0 THEN '.' ELSE '' END
         ) AS ls0
  FROM t
),
lined AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN ['{_COOKIE_LINE}'] || ls0 ELSE ls0 END AS ls
  FROM built
),
kept AS (
  SELECT doc_id, ls,
         list_filter(ls, l ->
           regexp_matches(lower(l), '[.!?"]$')
           AND len({_SQL_LINE_TOKS}) >= 5
           AND strpos(lower(l), 'javascript') = 0
           AND strpos(lower(l), 'lorem ipsum') = 0
           AND strpos(lower(l), 'cookie') = 0
         ) AS kl
  FROM lined
)
SELECT doc_id,
       CAST(len(ls) AS BIGINT) AS n_lines,
       CAST(len(kl) AS BIGINT) AS n_kept,
       ROUND(CASE WHEN len(ls) > 0
                  THEN CAST(len(kl) AS DOUBLE) / len(ls) ELSE 0.0 END, 6) AS kept_ratio,
       md5(COALESCE(array_to_string(kl, chr(10)), '')) AS kept_md5
FROM kept
"""


# --- Cross-document duplicate spans -----------------------------------


def q_dup_span_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return duplicate_span_flags(docs, n=5, min_df=2)


ORACLE_DUP_SPANS = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(toks) - 4, 0) + 1),
           i -> array_to_string(list_slice(toks, i, i + 4), ' ')))) AS span
  FROM t
),
dfp AS (SELECT span, COUNT(*) AS c FROM g GROUP BY span),
pd AS (
  SELECT g.doc_id, COUNT(*) AS n_spans,
         CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
  FROM g JOIN dfp USING (span) GROUP BY g.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(n_spans, 0) AS BIGINT) AS n_spans,
       CAST(COALESCE(n_dup, 0) AS BIGINT) AS n_dup_spans,
       ROUND(CASE WHEN COALESCE(n_spans, 0) > 0
                  THEN CAST(n_dup AS DOUBLE) / n_spans ELSE 0.0 END, 6) AS dup_ratio
FROM documents d LEFT JOIN pd USING (doc_id)
"""


# --- Cross-document duplicate-span REMOVAL (Lee et al. excision) -------


def q_remove_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return remove_duplicate_spans(docs, n=5, min_df=2).select(
        "doc_id",
        "n_tokens",
        "n_kept",
        "removed_ratio",
        F.md5("clean_text").alias("clean_md5"),
    )


ORACLE_REMOVE_DUP_SPANS = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(toks) - 4, 0) + 1),
           i -> array_to_string(list_slice(toks, i, i + 4), ' ')))) AS span
  FROM t
),
dupset AS (SELECT span FROM (SELECT span, COUNT(*) AS c FROM g GROUP BY span)
           WHERE c >= 2),
ps AS (
  SELECT doc_id, i
  FROM (SELECT doc_id, toks,
               unnest(range(1, greatest(len(toks) - 4, 0) + 1)) AS i
        FROM t)
  WHERE array_to_string(list_slice(toks, i, i + 4), ' ')
        IN (SELECT span FROM dupset)
),
cov AS (SELECT DISTINCT doc_id, u AS j
        FROM (SELECT doc_id, unnest(range(i, i + 5)) AS u FROM ps)),
words AS (
  SELECT doc_id, j, toks[j] AS w
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS j FROM t)
),
keptw AS (
  SELECT w.doc_id, w.j, w.w
  FROM words w LEFT JOIN cov ON w.doc_id = cov.doc_id AND w.j = cov.j
  WHERE cov.j IS NULL
),
agg AS (
  SELECT doc_id,
         array_to_string(list(w ORDER BY j), ' ') AS clean_text,
         COUNT(*) AS n_kept
  FROM keptw GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(COALESCE(n_kept, 0) AS BIGINT) AS n_kept,
       ROUND(CASE WHEN len(toks) > 0
                  THEN CAST(len(toks) - COALESCE(n_kept, 0) AS DOUBLE) / len(toks)
                  ELSE 0.0 END, 6) AS removed_ratio,
       md5(COALESCE(clean_text, '')) AS clean_md5
FROM t LEFT JOIN agg USING (doc_id)
"""


# --- Duplicate-span PROFILE (longest duplicated run per doc) ----------


def q_dup_span_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplication profile: covered-token count and the
    LONGEST contiguous duplicated run (Lee et al.'s longest-duplicated-
    substring curation signal) over the same 5-gram/min_df=2 span
    predicate as `remove_dup_spans` — operators/filters.py
    `duplicate_span_profile` (r8 verdict directive #5)."""
    docs = read_table(spark, sf_dir, "documents")
    return duplicate_span_profile(docs, n=5, min_df=2)


ORACLE_DUP_SPAN_PROFILE = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(toks) - 4, 0) + 1),
           i -> array_to_string(list_slice(toks, i, i + 4), ' ')))) AS span
  FROM t
),
dupset AS (SELECT span FROM (SELECT span, COUNT(*) AS c FROM g GROUP BY span)
           WHERE c >= 2),
ps AS (
  SELECT doc_id, i
  FROM (SELECT doc_id, toks,
               unnest(range(1, greatest(len(toks) - 4, 0) + 1)) AS i
        FROM t)
  WHERE array_to_string(list_slice(toks, i, i + 4), ' ')
        IN (SELECT span FROM dupset)
),
cov AS (SELECT DISTINCT doc_id, u AS j
        FROM (SELECT doc_id, unnest(range(i, i + 5)) AS u FROM ps)),
runs AS (
  SELECT doc_id, j,
         j - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY j) AS grp
  FROM cov
),
mr AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_covered,
         CAST(MAX(c) AS BIGINT) AS max_dup_run
  FROM (SELECT doc_id, grp, COUNT(*) AS c FROM runs GROUP BY doc_id, grp)
  GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(COALESCE(n_covered, 0) AS BIGINT) AS n_covered,
       CAST(COALESCE(max_dup_run, 0) AS BIGINT) AS max_dup_run,
       ROUND(CASE WHEN len(toks) > 0
                  THEN CAST(COALESCE(n_covered, 0) AS DOUBLE) / len(toks)
                  ELSE 0.0 END, 6) AS covered_ratio
FROM t LEFT JOIN mr USING (doc_id)
"""


# --- Source frequency capping -----------------------------------------

_CAP = 12


def q_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return source_cap_sample(docs, cap=_CAP).select(
        "doc_id", "source", F.col("keep_rank").cast("long").alias("keep_rank")
    )


ORACLE_SOURCE_CAP = f"""
SELECT doc_id, source, keep_rank FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY (doc_id * {_KNUTH_A}) % {_M32} ASC, doc_id ASC
         ) AS keep_rank
  FROM documents
) WHERE keep_rank <= {_CAP}
"""


# --- Surprisal tertile buckets (CCNet-style) --------------------------


def q_surprisal_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return surprisal_tertile_buckets(docs)


def _oracle_surprisal_buckets() -> str:
    from kg_etl_spark.queries.textq import ORACLE_UNIGRAM_SURPRISAL

    return f"""
SELECT doc_id, n_tokens, avg_surprisal,
       CASE NTILE(3) OVER (ORDER BY avg_surprisal ASC, doc_id ASC)
            WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
FROM ({ORACLE_UNIGRAM_SURPRISAL.strip()}) AS base
"""


# --- Hybrid retrieval: BM25 + embedding cosine via RRF ----------------

_RRF_TERMS = ("spark", "join", "window")
_RRF_DEPTH = 50
_RRF_K0 = 60
_RRF_OUT = 25


def q_hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+dense retrieval: BM25 rank list over `documents`
    fused with a cosine rank list over the 1:1-aligned `embeddings`
    (query = vector of doc 0) by reciprocal-rank fusion
    rrf = Σ 1/(k0 + rank). The standard two-tower search combiner —
    both rank lists are depth-50 top-k frames (tiny), so the fusion
    join is trivially broadcast; the heavy lifting is the two scoring
    passes, each a single corpus scan.

    Rank parity: both engines rank on the 6-dp-ROUNDED bm25 with a
    doc_id tie-break, so membership of the depth-50 cut is identical;
    the cosine side ranks on unrounded scores exactly like
    `embedding_topk`'s proven oracle.
    """
    docs = read_table(spark, sf_dir, "documents")
    emb = read_table(spark, sf_dir, "embeddings")

    bm_all = bm25_topk(docs, _RRF_TERMS, k=_RRF_DEPTH)
    w_bm = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    bm = bm_all.select("doc_id", "bm25").withColumn(
        "bm25_rank", F.row_number().over(w_bm).cast("long")
    )

    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ev = brute_force_topk(emb, queries, k=_RRF_DEPTH).select(
        F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("emb_rank")
    )

    fused = (
        bm.select("doc_id", "bm25_rank")
        .join(ev, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce(F.col("bm25_rank"), F.lit(-1)).cast("long").alias("bm25_rank"),
            F.coalesce(F.col("emb_rank"), F.lit(-1)).cast("long").alias("emb_rank"),
            F.round(
                F.when(
                    F.col("bm25_rank").isNotNull(),
                    F.lit(1.0) / (F.lit(_RRF_K0) + F.col("bm25_rank")),
                ).otherwise(F.lit(0.0))
                + F.when(
                    F.col("emb_rank").isNotNull(),
                    F.lit(1.0) / (F.lit(_RRF_K0) + F.col("emb_rank")),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("rrf"),
        )
    )
    return fused.orderBy(F.col("rrf").desc(), F.col("doc_id").asc()).limit(_RRF_OUT)


def _oracle_hybrid_rrf() -> str:
    from kg_etl_spark.queries.textq import _BM25_PARTS, _BM25_TERMS, _tf_sql
    from kg_etl_spark.queries.vector import _SQL_DOT, _SQL_NORM

    tf_cols = ", ".join(_tf_sql(i, t) for i, t in enumerate(_BM25_TERMS))
    df_cols = ", ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1.0 ELSE 0.0 END) AS df_{i}"
        for i in range(len(_BM25_TERMS))
    )
    cos = (
        f"{_SQL_DOT.format(a='q.qe', b='e.embedding')}"
        f" / ({_SQL_NORM.format(a='q.qe')} * {_SQL_NORM.format(a='e.embedding')})"
    )
    return f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
s AS (
  SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl, {tf_cols} FROM t
),
g AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs, CAST(sum(dl) AS DOUBLE) AS sum_dl,
         {df_cols}
  FROM s
),
bmscore AS (
  SELECT doc_id, ROUND(0.0 + {_BM25_PARTS}, 6) AS bm25 FROM s, g
),
bm AS (
  SELECT doc_id, bm25_rank FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS bm25_rank
    FROM bmscore
  ) WHERE bm25_rank <= {_RRF_DEPTH}
),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
es AS (
  SELECT e.vec_id AS doc_id, {cos} AS score
  FROM embeddings e, q WHERE e.vec_id <> 0
),
ev AS (
  SELECT doc_id, emb_rank FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS emb_rank
    FROM es
  ) WHERE emb_rank <= {_RRF_DEPTH}
)
SELECT COALESCE(bm.doc_id, ev.doc_id) AS doc_id,
       CAST(COALESCE(bm.bm25_rank, -1) AS BIGINT) AS bm25_rank,
       CAST(COALESCE(ev.emb_rank, -1) AS BIGINT) AS emb_rank,
       ROUND(COALESCE(1.0 / ({_RRF_K0} + bm.bm25_rank), 0.0)
             + COALESCE(1.0 / ({_RRF_K0} + ev.emb_rank), 0.0), 6) AS rrf
FROM bm FULL OUTER JOIN ev ON bm.doc_id = ev.doc_id
ORDER BY rrf DESC, doc_id ASC LIMIT {_RRF_OUT}
"""


QUERIES = {
    "gopher_quality": q_gopher_quality,
    "c4_line_filter": q_c4_line_filter,
    "dup_span_flags": q_dup_span_flags,
    "remove_dup_spans": q_remove_dup_spans,
    "dup_span_profile": q_dup_span_profile,
    "source_cap": q_source_cap,
    "surprisal_buckets": q_surprisal_buckets,
    "hybrid_rrf_search": q_hybrid_rrf_search,
}

ORACLES = {
    "gopher_quality": ORACLE_GOPHER,
    "c4_line_filter": ORACLE_C4_LINES,
    "dup_span_flags": ORACLE_DUP_SPANS,
    "remove_dup_spans": ORACLE_REMOVE_DUP_SPANS,
    "dup_span_profile": ORACLE_DUP_SPAN_PROFILE,
    "source_cap": ORACLE_SOURCE_CAP,
    "surprisal_buckets": _oracle_surprisal_buckets(),
    "hybrid_rrf_search": _oracle_hybrid_rrf(),
}


def q_pareto_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict Pareto frontier over orders — max o_totalprice, min
    order_day (epoch day): "the biggest order at every recency budget"
    (operators/filters.py `pareto_frontier_2d`, window formulation —
    never the quadratic NOT-EXISTS self-join the oracle uses)."""
    from kg_etl_spark.operators.filters import pareto_frontier_2d

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        (F.unix_micros("o_orderdate") / F.lit(86_400_000_000)).cast("long").alias("order_day"),
    )
    return pareto_frontier_2d(orders, "o_totalprice", "order_day", "o_orderkey")


ORACLE_PARETO = """
WITH b AS (
  SELECT o_orderkey, o_totalprice,
         epoch_us(o_orderdate) // 86400000000 AS order_day
  FROM orders
)
SELECT p.o_orderkey, p.o_totalprice, p.order_day
FROM b p
WHERE NOT EXISTS (
  SELECT 1 FROM b d
  WHERE (d.o_totalprice >= p.o_totalprice AND d.order_day < p.order_day)
     OR (d.o_totalprice > p.o_totalprice AND d.order_day <= p.order_day)
)
"""

QUERIES["pareto_orders"] = q_pareto_orders
ORACLES["pareto_orders"] = ORACLE_PARETO
