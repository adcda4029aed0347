"""Text-analysis + dedup catalog over the `documents` table: token
counting, quality scoring, language-ID, fingerprinting, exact dedup,
n-gram-Jaccard near-dup pairs (oracle-checked), MinHash-LSH and SimHash
(Spark-only: hash functions are engine-specific → rows-only check),
and the greedy top-k-distinct picker (reference X5, Spark-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kg_etl_spark.operators.dedup import (
    ngram_jaccard_pairs_adaptive,
    ngram_jaccard_pairs_prefix,
    exact_dedup,
    minhash_lsh_pairs,
    neardup_canonical,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from kg_etl_spark.operators.textquality import (
    bpe_ish_token_count,
    fingerprint,
    language_id,
    quality_features,
    token_count,
    ws_tokens,
)
from kg_etl_spark.operators.search import bm25_topk, tfidf_topk
from kg_etl_spark.operators.topk import topk_distinct_texts
from kg_etl_spark.session import read_table

# shared DuckDB snippets mirroring ws_tokens / shingles
_SQL_TOKS = r"list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> len(x) > 0)"


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("n_tokens"),
        bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens"),
    )


ORACLE_TOKEN_STATS = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)
SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(list_sum(list_transform(toks, x -> CAST(ceil(length(x)/4.0) AS BIGINT))) AS BIGINT) AS n_bpe_tokens
FROM t
"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return quality_features(docs).select(
        "doc_id", "n_tokens", "punct_ratio", "stopword_ratio", "mean_token_len", "quality_score"
    )


_STOP_SQL = "['the','a','an','and','or','of','in','on','at','to','is']"
ORACLE_QUALITY = f"""
WITH t AS (
  SELECT doc_id, text, length(text) AS n_chars, {_SQL_TOKS} AS toks,
         length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct
  FROM documents
), u AS (
  SELECT doc_id, n_chars, len(toks) AS n_tokens, n_punct,
         CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END AS punct_ratio,
         len(list_filter(toks, x -> list_contains({_STOP_SQL}, x))) AS n_stop,
         CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) AS tok_chars
  FROM t
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       ROUND(punct_ratio, 6) AS punct_ratio,
       ROUND(CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END, 6) AS stopword_ratio,
       ROUND(CASE WHEN n_tokens > 0 THEN tok_chars / n_tokens ELSE 0.0 END, 6) AS mean_token_len,
       ROUND(
         least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0) * 0.4
         + (1.0 - least(punct_ratio * 4.0, 1.0)) * 0.3
         + least(CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END * 5.0, 1.0) * 0.3
       , 6) AS quality_score
FROM u
"""


def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.col("lang").alias("lang_given"), language_id(F.col("text")).alias("lang_pred"))


_M = {
    "de": "['der','die','das','und','ist']",
    "en": "['the','and','of','is','to']",
    "es": "['el','los','las','es','y']",
    "fr": "['le','la','les','et','est']",
}
ORACLE_LANG = f"""
WITH t AS (SELECT doc_id, lang, {_SQL_TOKS} AS toks FROM documents),
h AS (
  SELECT doc_id, lang,
         len(list_filter(toks, x -> list_contains({_M['de']}, x))) AS h_de,
         len(list_filter(toks, x -> list_contains({_M['en']}, x))) AS h_en,
         len(list_filter(toks, x -> list_contains({_M['es']}, x))) AS h_es,
         len(list_filter(toks, x -> list_contains({_M['fr']}, x))) AS h_fr
  FROM t
)
SELECT doc_id, lang AS lang_given,
       CASE WHEN greatest(h_de, h_en, h_es, h_fr) > 0 THEN
         CASE WHEN h_de >= greatest(h_en, h_es, h_fr) THEN 'de'
              WHEN h_en >= greatest(h_es, h_fr) THEN 'en'
              WHEN h_es >= h_fr THEN 'es'
              ELSE 'fr' END
       ELSE 'und' END AS lang_pred
FROM h
"""


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return exact_dedup(docs, "doc_id").select("fp", "keeper_id", "n_dups")


ORACLE_EXACT_DEDUP = r"""
SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
       MIN(doc_id) AS keeper_id, COUNT(*) AS n_dups
FROM documents
GROUP BY 1
"""


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        fingerprint(F.col("text"), "md5").alias("fp_md5"),
        fingerprint(F.col("text"), "sha256").alias("fp_sha256"),
    )


ORACLE_FINGERPRINTS = r"""
SELECT doc_id,
       md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp_md5,
       sha256(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp_sha256
FROM documents
"""


def q_word_freq_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(ws_tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(20)
    )


ORACLE_WORD_FREQ = f"""
SELECT word, COUNT(*) AS n FROM (
  SELECT unnest({_SQL_TOKS}) AS word FROM documents
) GROUP BY word ORDER BY n DESC, word ASC LIMIT 20
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, "doc_id", n=3, threshold=0.8)


ORACLE_NGRAM_JACCARD = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
s AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
  FROM t WHERE len(toks) >= 3
),
p AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         len(list_intersect(a.sh, b.sh)) AS n_common,
         len(a.sh) AS a_sz, len(b.sh) AS b_sz
  FROM s a JOIN s b ON a.doc_id < b.doc_id
)
SELECT a_id, b_id, CAST(n_common AS BIGINT) AS n_common,
       ROUND(CAST(n_common AS DOUBLE) / (a_sz + b_sz - n_common), 6) AS jaccard
FROM p
WHERE n_common > 0 AND CAST(n_common AS DOUBLE) / (a_sz + b_sz - n_common) >= 0.8
"""


def q_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path of ngram_jaccard: shingles whose document frequency
    exceeds max_df are dropped before the inverted-index self-join (a
    shingle in d docs yields d² candidate rows, so boilerplate dominates
    quadratically). Jaccard is over the capped shingle universe."""
    docs = read_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, "doc_id", n=3, threshold=0.5, max_df=5)


ORACLE_NGRAM_JACCARD_CAPPED = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
s AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
  FROM t WHERE len(toks) >= 3
),
e AS (SELECT doc_id, unnest(sh) AS sg FROM s),
keep AS (SELECT sg FROM e GROUP BY sg HAVING COUNT(*) <= 5),
f AS (SELECT e.doc_id, e.sg FROM e JOIN keep USING (sg)),
sz AS (SELECT doc_id, COUNT(*) AS _sz FROM f GROUP BY doc_id),
c AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_common
  FROM f a JOIN f b ON a.sg = b.sg AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id, CAST(n_common AS BIGINT) AS n_common,
       ROUND(CAST(n_common AS DOUBLE) / (sa._sz + sb._sz - n_common), 6) AS jaccard
FROM c JOIN sz sa ON sa.doc_id = c.a_id JOIN sz sb ON sb.doc_id = c.b_id
WHERE CAST(n_common AS DOUBLE) / (sa._sz + sb._sz - n_common) >= 0.5
"""


# --- Spark-only (engine-specific hashes / stateful greedy): rows-only --


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, "doc_id", n=3, num_hashes=64, bands=16, threshold=0.5)


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return simhash_pairs(docs, "doc_id", max_hamming=3, bands=4)


def q_topk_distinct_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").withColumn(
        "grp", F.concat_ws("_", "lang", "source")
    )
    picked = topk_distinct_texts(docs, "grp", "text", k=2, sim_cutoff=0.90)
    return picked.select("grp", F.concat_ws("␟", "texts").alias("texts_joined"))


_BPE_TOP = 50


def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One merge round of BPE tokenizer training: adjacent character
    pairs counted across the corpus, weighted by word frequency — the
    top pair is exactly what a BPE trainer would merge next. The heavy
    corpus pass collapses to DISTINCT WORDS first (one aggregate), so
    pair explosion runs over the vocabulary, not the token stream —
    at 100 TB that's the difference between |tokens| and |types| rows.
    Total tie-break (count DESC, pair ASC) pins the LIMIT boundary on
    both engines."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(ws_tokens(F.col("text"))).alias("t"))
    wc = toks.groupBy("t").agg(F.count(F.lit(1)).alias("n")).filter(F.length("t") >= 2)
    pairs = wc.select(
        "n",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("t") - 1),
                lambda i: F.col("t").substr(i, F.lit(2)),
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), F.col("pair").asc())
        .limit(_BPE_TOP)
    )


ORACLE_BPE_PAIRS = f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                            x -> len(x) > 0)) AS t
  FROM documents
), wc AS (
  SELECT t, COUNT(*) AS n FROM toks GROUP BY t HAVING LENGTH(t) >= 2
), pairs AS (
  SELECT n, unnest(list_transform(range(1, length(t)), i -> substr(t, i, 2))) AS pair
  FROM wc
)
SELECT pair, CAST(SUM(n) AS BIGINT) AS pair_count
FROM pairs GROUP BY pair
ORDER BY pair_count DESC, pair ASC LIMIT {_BPE_TOP}
"""


_SURPRISAL_V = 2000


def q_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style quality filter: mean smoothed-unigram surprisal
    per document (operators/textquality.py `unigram_surprisal`)."""
    from kg_etl_spark.operators.textquality import unigram_surprisal

    docs = read_table(spark, sf_dir, "documents")
    return unigram_surprisal(docs, vocab_size=_SURPRISAL_V)


ORACLE_UNIGRAM_SURPRISAL = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                            x -> len(x) > 0)) AS tok
  FROM documents
), counts AS (
  SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
), tot AS (
  SELECT CAST(SUM(c) AS BIGINT) + {_SURPRISAL_V} + 1 AS denom FROM counts
), vocab AS (
  SELECT tok, c FROM counts ORDER BY c DESC, tok ASC LIMIT {_SURPRISAL_V}
), scored AS (
  SELECT t.doc_id,
         CAST(ROUND(-ln(CAST(COALESCE(v.c + 1, 1) AS DOUBLE)
                        / CAST(tot.denom AS DOUBLE)), 6) AS DECIMAL(28,6)) AS s
  FROM toks t LEFT JOIN vocab v USING (tok), tot
)
SELECT doc_id, COUNT(*) AS n_tokens,
       ROUND(CAST(SUM(s) AS DOUBLE) / COUNT(*), 6) AS avg_surprisal
FROM scored GROUP BY doc_id
"""


def q_topk_distinct_boundary_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted-provable twin of `topk_distinct_texts` (the
    minhash_identical_recall pattern): at sim_cutoff = 1.5 EVERY
    candidate passes the suppression test (any kernel's sim is ≤ 1.0),
    so the greedy loop provably degenerates to plain top-k by
    (-length, text); at sim_cutoff = 0.0 NOTHING after the first
    passes (sim ≥ 0.0), so exactly the longest text survives. Both
    boundaries are kernel-independent, so the greedy machinery —
    longest-first ordering, the k bound, suppression against every
    kept text, applyInPandas group fan-out — gets a full value-hash
    oracle; only the kernel's mid-range values stay rows-only (covered
    by the base query and unit tests).

    Parity guard: rows with NULL/empty text or NULL group parts are
    excluded HERE, mirroring the oracle's WHERE, because the operator
    emits an empty-texts row for an all-filtered group while SQL's
    grouping drops it (and concat_ws skips NULLs where `||`
    propagates them) — benign on current testdata, but the twin must
    not depend on that."""
    docs = (
        read_table(spark, sf_dir, "documents")
        .filter(
            F.col("text").isNotNull()
            & (F.col("text") != "")
            & F.col("lang").isNotNull()
            & F.col("source").isNotNull()
        )
        .withColumn("grp", F.concat_ws("_", "lang", "source"))
    )
    loose = topk_distinct_texts(docs, "grp", "text", k=2, sim_cutoff=1.5).select(
        "grp",
        F.lit("all_pass").alias("phase"),
        F.concat_ws("␟", "texts").alias("texts_joined"),
    )
    strict = topk_distinct_texts(docs, "grp", "text", k=2, sim_cutoff=0.0).select(
        "grp",
        F.lit("first_only").alias("phase"),
        F.concat_ws("␟", "texts").alias("texts_joined"),
    )
    return loose.unionByName(strict)


ORACLE_TOPK_DISTINCT_BOUNDARY = """
WITH t AS (
  SELECT lang || '_' || source AS grp, text,
         ROW_NUMBER() OVER (
           PARTITION BY lang || '_' || source
           ORDER BY LENGTH(text) DESC, text ASC
         ) AS rn
  FROM documents
  WHERE text IS NOT NULL AND text <> ''
    AND lang IS NOT NULL AND source IS NOT NULL
)
SELECT grp, 'all_pass' AS phase,
       string_agg(text, '␟' ORDER BY rn) AS texts_joined
FROM t WHERE rn <= 2 GROUP BY grp
UNION ALL
SELECT grp, 'first_only' AS phase,
       string_agg(text, '␟' ORDER BY rn) AS texts_joined
FROM t WHERE rn <= 1 GROUP BY grp
"""


def q_clean_wikitext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17/F18 — wikitext cleanup + newline normalization over a
    synthesized wiki-markup column (documents.text carries no markup,
    so markup is constructed deterministically from data columns)."""
    from kg_etl_spark.functions.text import clean_wikitext, normalize_newlines

    docs = read_table(spark, sf_dir, "documents")
    wiki = F.concat(
        F.lit("See [[City|"), F.col("source"), F.lit("]] and [[") , F.col("lang"),
        F.lit("]] {{tmpl|x}}\r\n"), F.substring("text", 1, 80),
    )
    return docs.select(
        "doc_id", clean_wikitext(normalize_newlines(wiki)).alias("clean")
    )


# DuckDB mirrors: RE2 backrefs are \1 and replacement needs the 'g'
# flag (Spark replaces globally by default).
ORACLE_CLEAN_WIKITEXT = r"""
WITH w AS (
  SELECT doc_id,
         'See [[City|' || source || ']] and [[' || lang || ']] {{tmpl|x}}' || chr(13) || chr(10) || substr(text, 1, 80) AS wiki
  FROM documents
)
SELECT doc_id,
       trim(regexp_replace(
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(regexp_replace(wiki, chr(13) || chr(10), chr(10), 'g'), chr(13), chr(10), 'g'),
               '\[\[[^\]|]*\|([^\]]*)\]\]', '\1', 'g'),
             '\[\[([^\]]*)\]\]', '\1', 'g'),
           '\{\{[^}]*\}\}', '', 'g'),
         '\s+', ' ', 'g')) AS clean
FROM w
"""


def q_posting_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: (term, df, sorted posting list). One
    explode of per-doc DISTINCT terms + one groupBy — the standard
    index-construction shuffle, partitioned by term. At 100 TB the
    posting arrays for stop-word-like terms are the skew risk: cap with
    a df filter (cf. max_df in the dedup family) or store postings as
    bucketed term-sharded tables instead of in-row arrays."""
    docs = read_table(spark, sf_dir, "documents")
    ex = docs.select(
        "doc_id", F.explode(F.array_distinct(ws_tokens(F.col("text")))).alias("term")
    )
    return ex.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
    )


ORACLE_POSTING = f"""
WITH t AS (SELECT doc_id, list_distinct({_SQL_TOKS}) AS toks FROM documents),
u AS (SELECT doc_id, unnest(toks) AS term FROM t)
SELECT term, count(*) AS df, list_sort(list(doc_id)) AS doc_ids
FROM u GROUP BY term
"""


_KW_K = 3


def q_doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-3 terms by tf·idf (smoothed
    idf, cf. tfidf_search). Shape: one explode → (doc, term) counts →
    tiny term-stats aggregate broadcast back → one window over the
    doc partitioning. The explode is the posting-list shuffle; the
    rank never re-shuffles the corpus."""
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(ws_tokens(F.col("text"))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    stats = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    ndocs = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    # stats is the per-TERM df table — a Heaps'-law corpus vocabulary,
    # NOT a bounded aggregate: unhinted join (the planner broadcasts it
    # at bench SF on its own; at 100 TB it shuffles row-proportionally)
    j = tf.join(stats, "term").crossJoin(F.broadcast(ndocs))
    score = F.col("tf").cast("double") * F.log(
        F.lit(1.0) + F.col("n_docs") / F.col("df").cast("double")
    )
    w = Window.partitionBy("doc_id").orderBy(score.desc(), F.col("term").asc())
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _KW_K)
        .select("doc_id", "rank", "term", "tf", F.round(score, 6).alias("score"))
    )


ORACLE_KEYWORDS = f"""
WITH t AS (SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
st AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
nd AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
s AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         CAST(tf.tf AS DOUBLE) * ln(1.0 + nd.n_docs / CAST(st.df AS DOUBLE)) AS score
  FROM tf JOIN st ON tf.term = st.term CROSS JOIN nd
)
SELECT doc_id, rank, term, tf, ROUND(score, 6) AS score FROM (
  SELECT doc_id, term, tf, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank
  FROM s
) WHERE rank <= {_KW_K}
"""


def q_neardup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup collapse keeping the best-quality doc per cluster
    (pairs → components → argmax window; operators/dedup.py)."""
    docs = read_table(spark, sf_dir, "documents")
    return neardup_canonical(docs, "doc_id", n=3, threshold=0.8)


# quality-score CTE identical to ORACLE_QUALITY's math (rounded 6dp,
# matching the rounded quality_score column the Spark window orders by)
_SQL_QSCORE_CTE = f"""
qt AS (
  SELECT doc_id, text, length(text) AS n_chars, {_SQL_TOKS} AS toks,
         length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct
  FROM documents
), qu AS (
  SELECT doc_id, len(toks) AS n_tokens,
         CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END AS punct_ratio,
         len(list_filter(toks, x -> list_contains({_STOP_SQL}, x))) AS n_stop
  FROM qt
), q AS (
  SELECT doc_id, ROUND(
    least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0) * 0.4
    + (1.0 - least(punct_ratio * 4.0, 1.0)) * 0.3
    + least(CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END * 5.0, 1.0) * 0.3
  , 6) AS quality_score
  FROM qu
)"""

ORACLE_NEARDUP_CANON = f"""
WITH RECURSIVE t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
s AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
  FROM t WHERE len(toks) >= 3
),
p AS (
  SELECT a_id, b_id FROM (
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           len(list_intersect(a.sh, b.sh)) AS n_common,
           len(a.sh) AS a_sz, len(b.sh) AS b_sz
    FROM s a JOIN s b ON a.doc_id < b.doc_id
  ) WHERE n_common > 0 AND CAST(n_common AS DOUBLE) / (a_sz + b_sz - n_common) >= 0.8
),
edges AS (SELECT a_id AS s, b_id AS d FROM p UNION ALL SELECT b_id, a_id FROM p),
reach(node, r) AS (
  SELECT DISTINCT s, s FROM edges
  UNION
  SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.node
),
comp AS (SELECT node, MIN(r) AS comp FROM reach GROUP BY node),
{_SQL_QSCORE_CTE},
asg AS (
  SELECT q.doc_id, COALESCE(comp.comp, q.doc_id) AS cluster_id, q.quality_score
  FROM q LEFT JOIN comp ON q.doc_id = comp.node
),
canon AS (
  SELECT cluster_id, doc_id AS canonical_id FROM (
    SELECT cluster_id, doc_id,
           ROW_NUMBER() OVER (PARTITION BY cluster_id ORDER BY quality_score DESC, doc_id ASC) AS rn
    FROM asg
  ) WHERE rn = 1
)
SELECT asg.doc_id, asg.cluster_id, canon.canonical_id, asg.quality_score,
       asg.doc_id = canon.canonical_id AS is_kept
FROM asg JOIN canon ON asg.cluster_id = canon.cluster_id
"""


_BM25_TERMS = ("spark", "join", "window")


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-25 retrieval for a fixed 3-term query (reference has no
    search operator — this is a training-data-pipeline capability; see
    operators/search.py for the no-explode scale shape)."""
    docs = read_table(spark, sf_dir, "documents")
    return bm25_topk(docs, _BM25_TERMS, k=25)


def q_tfidf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return tfidf_topk(docs, _BM25_TERMS, k=25)


def _tf_sql(i: int, term: str) -> str:
    return f"CAST(len(list_filter(toks, x -> x = '{term}')) AS DOUBLE) AS tf_{i}"


_BM25_PARTS = " + ".join(
    f"(ln(1.0 + (n_docs - df_{i} + 0.5) / (df_{i} + 0.5))"
    f" * (tf_{i} * 2.2) / (tf_{i} + 1.2 * (0.25 + 0.75 * dl / (sum_dl / n_docs))))"
    for i in range(3)
)

ORACLE_BM25 = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
s AS (
  SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
         {", ".join(_tf_sql(i, t) for i, t in enumerate(_BM25_TERMS))}
  FROM t
),
g AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs, CAST(sum(dl) AS DOUBLE) AS sum_dl,
         {", ".join(f"sum(CASE WHEN tf_{i} > 0 THEN 1.0 ELSE 0.0 END) AS df_{i}" for i in range(3))}
  FROM s
)
SELECT doc_id, CAST(dl AS BIGINT) AS n_tokens,
       {", ".join(f"CAST(tf_{i} AS BIGINT) AS tf_{i}" for i in range(3))},
       ROUND(0.0 + {_BM25_PARTS}, 6) AS bm25
FROM s, g
ORDER BY bm25 DESC, doc_id
LIMIT 25
"""

_TFIDF_PARTS = " + ".join(
    f"(CASE WHEN tf_{i} > 0 THEN (1.0 + ln(tf_{i})) * ln(1.0 + n_docs / df_{i}) ELSE 0.0 END)"
    for i in range(3)
)

ORACLE_TFIDF = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
s AS (
  SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
         {", ".join(_tf_sql(i, t) for i, t in enumerate(_BM25_TERMS))}
  FROM t
),
g AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs, CAST(sum(dl) AS DOUBLE) AS sum_dl,
         {", ".join(f"sum(CASE WHEN tf_{i} > 0 THEN 1.0 ELSE 0.0 END) AS df_{i}" for i in range(3))}
  FROM s
)
SELECT doc_id,
       {", ".join(f"CAST(tf_{i} AS BIGINT) AS tf_{i}" for i in range(3))},
       ROUND(0.0 + {_TFIDF_PARTS}, 6) AS tfidf
FROM s, g
ORDER BY tfidf DESC, doc_id
LIMIT 25
"""




_PLANT_OFFSET = 100_000


def _planted_copies(docs: DataFrame) -> DataFrame:
    """Docs 0..19 re-planted under ids +_PLANT_OFFSET — the shared
    plant of the four identical-recall twins. The offset is pinned
    (the oracles spell `+ 100000` in SQL), so the id space is guarded
    LOUDLY: if the corpus ever contains doc_ids >= the offset, the
    union would mint duplicate ids and coincidental (a, a+offset)
    pairs the fixed oracles do not list — fail here instead of
    silently going red (r5 ADVICE item)."""
    mx = docs.agg(F.max("doc_id").alias("m")).collect()[0]["m"]
    if mx is not None and mx >= _PLANT_OFFSET:
        raise ValueError(
            f"planted-twin id space collides: max doc_id {mx} >= "
            f"{_PLANT_OFFSET} — raise _PLANT_OFFSET and the twin oracles' "
            "literal offset together"
        )
    return docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + _PLANT_OFFSET).alias("doc_id"), "text"
    )


def q_minhash_identical_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable oracle for the LSH path on its PROVABLE subset:
    documents with identical distinct-trigram sets have identical
    MinHash signatures, hence identical band keys, hence are guaranteed
    candidates — so at threshold 1.0 (and no bucket cap) the LSH output
    restricted to jaccard == 1.0 must equal exactly the
    identical-shingle-set pairs, which plain SQL can enumerate. This
    turns the probabilistic operator's deterministic core into a full
    value-hash CORRECTNESS row (recall on near-dup jaccard < 1 remains
    covered by the seeded unit tests).

    Docs 0..19 are re-planted under ids +100000 so the corpus contains
    known identical pairs at every SF (sf0.01 has no organic ones)."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = _planted_copies(docs)
    return minhash_lsh_pairs(
        docs.unionByName(copies), "doc_id", n=3, num_hashes=64, bands=16,
        threshold=1.0, max_bucket=None,
    )


ORACLE_MINHASH_IDENTICAL = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 20
), tk AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> length(x) > 0) AS t
  FROM corpus
), sh AS (
  SELECT doc_id,
         list_sort(list_distinct(
           list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
         )) AS s
  FROM tk
), keyed AS (
  SELECT doc_id, array_to_string(s, chr(31)) AS k FROM sh WHERE len(s) > 0
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(1.0 AS DOUBLE) AS jaccard
FROM keyed a JOIN keyed b ON a.k = b.k AND a.doc_id < b.doc_id
"""




def q_simhash_identical_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash provable-recall oracle: identical token multisets →
    identical per-bit votes → identical simhash → every band chunk
    shared → guaranteed candidate at Hamming 0 — so with docs 0..19
    re-planted under ids +100000, the max_hamming=0 output equals the
    planted (i, i+100000) pairs exactly — a pure recall gate: one
    missing pair is a row-count mismatch. (Output is restricted to the
    planted pairs because near-dup docs can organically collide to the
    same 64-bit simhash, which SQL cannot enumerate.)"""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = _planted_copies(docs)
    pairs = simhash_pairs(docs.unionByName(copies), "doc_id", max_hamming=0, bands=4)
    return pairs.filter(F.col("b_id") == F.col("a_id") + 100_000)


ORACLE_SIMHASH_IDENTICAL = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 20
), tk AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> length(x) > 0) AS t
  FROM corpus
)
SELECT doc_id AS a_id, doc_id + 100000 AS b_id, 0 AS hamming
FROM tk WHERE doc_id < 20 AND len(t) > 0
"""


def q_bpe_encode_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted-provable oracle for the BPE-encode plumbing: with an
    EMPTY merge table the greedy loop provably degenerates to
    character splitting, so n_pieces and the order-faithful piece
    fingerprint are SQL-enumerable. The merge loop itself is
    unit-tested on known merge tables (`tests/test_filters.py`), and
    `bpe_encode_trained` exercises it end-to-end (rows-only)."""
    from kg_etl_spark.operators.bpe import bpe_encode

    docs = read_table(spark, sf_dir, "documents")
    return bpe_encode(docs, merges=[])


ORACLE_BPE_ENCODE_CHARS = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
enc AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_words,
         CAST(COALESCE(list_sum(list_transform(toks, w -> length(w))), 0) AS BIGINT) AS n_pieces,
         md5(array_to_string(
           list_transform(toks, w -> array_to_string(
             list_transform(range(1, length(w) + 1), i -> substr(w, i, 1)), '␟')),
           ' ')) AS pieces_md5
  FROM t
)
SELECT doc_id, n_words, n_pieces, pieces_md5 FROM enc WHERE n_words > 0
"""


_BPE_N_MERGES = 8


def q_bpe_encode_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full tokenizer loop: take the top merge candidates from the
    corpus's own pair counts (q_bpe_pair_counts) as the merge table and
    encode every document with them. The greedy merge application is
    not SQL-expressible → rows-only; the char-degenerate twin above
    value-checks the identical plumbing."""
    from kg_etl_spark.operators.bpe import bpe_encode

    docs = read_table(spark, sf_dir, "documents")
    top = q_bpe_pair_counts(spark, sf_dir).limit(_BPE_N_MERGES).collect()
    merges = [(r["pair"][0], r["pair"][1]) for r in top]
    return bpe_encode(docs, merges=merges)


QUERIES = {
    "token_stats": q_token_stats,
    "bpe_encode_chars": q_bpe_encode_chars,
    "bpe_encode_trained": q_bpe_encode_trained,
    "clean_wikitext": q_clean_wikitext,
    "quality_score": q_quality_score,
    "language_id": q_language_id,
    "exact_dedup": q_exact_dedup,
    "fingerprints": q_fingerprints,
    "word_freq_top20": q_word_freq_top20,
    "ngram_jaccard_dedup": q_ngram_jaccard,
    "ngram_jaccard_capped": q_ngram_jaccard_capped,
    "minhash_lsh_dedup": q_minhash_lsh,
    "minhash_identical_recall": q_minhash_identical_recall,
    "simhash_identical_recall": q_simhash_identical_recall,
    "simhash_dedup": q_simhash_pairs,
    "topk_distinct_texts": q_topk_distinct_texts,
    "topk_distinct_boundary_recall": q_topk_distinct_boundary_recall,
    "unigram_surprisal": q_unigram_surprisal,
    "bpe_pair_counts": q_bpe_pair_counts,
    "bm25_search": q_bm25_search,
    "tfidf_search": q_tfidf_search,
    "neardup_canonical": q_neardup_canonical,
    "posting_lists": q_posting_lists,
    "doc_keywords": q_doc_keywords,
}

ORACLES = {
    "minhash_identical_recall": ORACLE_MINHASH_IDENTICAL,
    "simhash_identical_recall": ORACLE_SIMHASH_IDENTICAL,
    "token_stats": ORACLE_TOKEN_STATS,
    "clean_wikitext": ORACLE_CLEAN_WIKITEXT,
    "quality_score": ORACLE_QUALITY,
    "language_id": ORACLE_LANG,
    "exact_dedup": ORACLE_EXACT_DEDUP,
    "fingerprints": ORACLE_FINGERPRINTS,
    "word_freq_top20": ORACLE_WORD_FREQ,
    "ngram_jaccard_dedup": ORACLE_NGRAM_JACCARD,
    "ngram_jaccard_capped": ORACLE_NGRAM_JACCARD_CAPPED,
    # minhash/simhash/topk_distinct: engine-specific → rows-only check
    "topk_distinct_boundary_recall": ORACLE_TOPK_DISTINCT_BOUNDARY,
    "unigram_surprisal": ORACLE_UNIGRAM_SURPRISAL,
    "bpe_pair_counts": ORACLE_BPE_PAIRS,
    "bpe_encode_chars": ORACLE_BPE_ENCODE_CHARS,
    # bpe_encode_trained: greedy merge loop not SQL-expressible → rows-only
    "bm25_search": ORACLE_BM25,
    "tfidf_search": ORACLE_TFIDF,
    "neardup_canonical": ORACLE_NEARDUP_CANON,
    "posting_lists": ORACLE_POSTING,
    "doc_keywords": ORACLE_KEYWORDS,
}


def q_html_strip_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML stripping + URL extraction (C4/CCNet crawl pre-pass) over a
    deterministically synthesized markup layout (documents.text carries
    no markup — same device as q_clean_wikitext)."""
    from kg_etl_spark.functions.text import extract_urls, strip_html

    docs = read_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<p>"), F.substring("text", 1, 60),
        F.lit('</p> see <a href="https://ex.org/'), F.col("source"),
        F.lit("/"), F.col("lang"), F.lit('">x</a> & more at http://'),
        F.col("source"), F.lit(".test/page"),
    )
    return docs.select(
        "doc_id",
        strip_html(html).alias("clean"),
        F.concat_ws(" ", extract_urls(html)).alias("urls"),
        F.size(extract_urls(html)).cast("long").alias("n_urls"),
    )


ORACLE_HTML_STRIP = r"""
WITH h AS (
  SELECT doc_id,
         '<p>' || substr(text, 1, 60) || '</p> see <a href="https://ex.org/'
           || source || '/' || lang || '">x</a> & more at http://'
           || source || '.test/page' AS html
  FROM documents
)
SELECT doc_id,
       trim(regexp_replace(regexp_replace(html, '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')) AS clean,
       array_to_string(regexp_extract_all(html, 'https?://[^\s"<>]+'), ' ') AS urls,
       CAST(len(regexp_extract_all(html, 'https?://[^\s"<>]+')) AS BIGINT) AS n_urls
FROM h
"""

QUERIES["html_strip_urls"] = q_html_strip_urls
ORACLES["html_strip_urls"] = ORACLE_HTML_STRIP


def q_dedup_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluation harness demo: n-gram-Jaccard near-dup pairs (>= 0.8)
    scored against exact-duplicate truth (normalized-md5 groups) —
    precision/recall/F1 as one row. Both sides are SQL-expressible, so
    the METRICS operator itself gets a full value-hash oracle."""
    from kg_etl_spark.operators.evaluation import pair_metrics

    docs = read_table(spark, sf_dir, "documents")
    pred = ngram_jaccard_pairs(docs, "doc_id", n=3, threshold=0.8).select("a_id", "b_id")
    fp = F.md5(F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " "))
    keyed = docs.select("doc_id", fp.alias("_fp"))
    truth = (
        keyed.alias("x")
        .join(keyed.alias("y"), "_fp")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a_id"), F.col("y.doc_id").alias("b_id"))
    )
    return pair_metrics(pred, truth)


ORACLE_DEDUP_EVAL = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks, text FROM documents),
s AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
  FROM t WHERE len(toks) >= 3
),
pred AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM s a JOIN s b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.sh, b.sh)) > 0
    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8
),
keyed AS (
  SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
  FROM documents
),
truth AS (
  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
  FROM keyed x JOIN keyed y ON x.fp = y.fp AND x.doc_id < y.doc_id
),
j AS (
  SELECT COALESCE(p.a_id, t2.a_id) AS a_id, COALESCE(p.b_id, t2.b_id) AS b_id,
         p.a_id IS NOT NULL AS in_p, t2.a_id IS NOT NULL AS in_t
  FROM pred p FULL OUTER JOIN truth t2 ON p.a_id = t2.a_id AND p.b_id = t2.b_id
),
c AS (
  SELECT CAST(SUM(CASE WHEN in_p AND in_t THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN in_p AND NOT in_t THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN NOT in_p AND in_t THEN 1 ELSE 0 END) AS BIGINT) AS fn
  FROM j
)
SELECT tp, fp, fn,
       ROUND(CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp) ELSE 0.0 END, 6) AS precision,
       ROUND(CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn) ELSE 0.0 END, 6) AS recall,
       ROUND(CASE WHEN 2*tp + fp + fn > 0 THEN CAST(2*tp AS DOUBLE) / (2*tp + fp + fn) ELSE 0.0 END, 6) AS f1
FROM c
"""

QUERIES["dedup_eval"] = q_dedup_eval
ORACLES["dedup_eval"] = ORACLE_DEDUP_EVAL


def q_doc_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTER canonicalization — the operator a curation run
    uses the pair detector FOR: n-gram-Jaccard pairs (>= 0.8) close
    into connected components (transitive duplicate groups), each
    group keeps its lowest doc_id as the canonical representative, and
    the payoff is quantified as chars_freed (total chars minus the
    keeper's).  One row per multi-document group (singletons never
    enter the pair stream).

    Scale shape: the pair stream is the SIZE-ADAPTIVE generator
    (ngram_jaccard_pairs_adaptive): the plain inverted-index join
    below 100k docs (the prefix pipeline's ~5 s fixed stage cost
    dominates small corpora — measured 2.0 s vs 7.5 s at sf0.1), the
    prefix-filtered ssjoin above it (only each document's
    (l − ⌈t·l⌉ + 1) globally-rarest shingles enter the candidate
    self-join, shrinking Σdf² to the prefix terms; same output
    contract, property-tested row-identical, so the oracle applies to
    both branches).  Components are the size-adaptive union-find
    (operators/components.py — local solve at these pair counts, the
    label-propagation iteration above 2M edges); the per-group fold is
    one hash aggregate on |dup docs| rows.  Nothing concentrates.

    Reference parity: the keep-one policy of near-dup curation
    (Lee et al. 2022 §4); the reference's pandas ER derives canonical
    ids per union-find component the same way (chaayagirimon/kg-etl
    etl/er.py:204-243 — union-find then one canonical per
    component)."""
    from kg_etl_spark.operators.components import connected_components

    docs = read_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs_adaptive(docs, "doc_id", n=3, threshold=0.8).select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    )
    comp = connected_components(pairs)  # (node, comp), comp = min id
    sized = comp.join(
        docs.select(F.col("doc_id").alias("node"), "n_chars"), "node"
    )
    return (
        sized.groupBy(F.col("comp").alias("keeper_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("chars_total"),
            # the keeper IS the component id, so its chars are excluded
            # by predicate — no order-sensitive min_by on tied sizes
            F.sum(
                F.when(F.col("node") == F.col("comp"), F.lit(0)).otherwise(
                    F.col("n_chars")
                )
            ).cast("long").alias("chars_freed"),
        )
    )


# components via recursive reachability on the SAME pair predicate the
# dedup_eval oracle spells (DuckDB recursive CTE — the
# spatial_components oracle pattern applied to the text pair stream)
ORACLE_DOC_DUP_GROUPS = f"""
WITH RECURSIVE t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
s AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
  FROM t WHERE len(toks) >= 3
),
pred AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM s a JOIN s b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.sh, b.sh)) > 0
    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8
),
edges AS (SELECT a_id AS st, b_id AS d FROM pred UNION ALL SELECT b_id, a_id FROM pred),
reach(node, r) AS (
  SELECT DISTINCT st, st FROM edges
  UNION
  SELECT e.d, reach.r FROM reach JOIN edges e ON e.st = reach.node
),
comp AS (SELECT node, MIN(r) AS comp FROM reach GROUP BY node),
sized AS (
  SELECT c.node, c.comp, d.n_chars
  FROM comp c JOIN documents d ON d.doc_id = c.node
)
SELECT comp AS keeper_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars_total,
       CAST(SUM(CASE WHEN node = comp THEN 0 ELSE n_chars END) AS BIGINT) AS chars_freed
FROM sized
GROUP BY comp
"""

QUERIES["doc_dup_groups"] = q_doc_dup_groups
ORACLES["doc_dup_groups"] = ORACLE_DOC_DUP_GROUPS


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup: docs < 250 are 'history' (their
    fingerprint store), the rest arrive as the new batch; output is the
    batch's fresh keepers (operators/incremental.py
    `incremental_exact_dedup`)."""
    from kg_etl_spark.operators.incremental import incremental_exact_dedup

    docs = read_table(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") < 250)
    batch = docs.filter(F.col("doc_id") >= 250)
    seen = hist.select(fingerprint(F.col("text"), "md5").alias("fp")).distinct()
    fresh, _ = incremental_exact_dedup(batch, seen)
    return fresh.select("doc_id", "source", "lang")


ORACLE_INCREMENTAL_DEDUP = r"""
WITH fps AS (
  SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
  FROM documents
),
hist AS (SELECT DISTINCT fp FROM fps WHERE doc_id < 250),
keepers AS (
  SELECT fp, MIN(doc_id) AS doc_id FROM fps WHERE doc_id >= 250 GROUP BY fp
)
SELECT d.doc_id, d.source, d.lang
FROM documents d
JOIN keepers k ON d.doc_id = k.doc_id
WHERE k.fp NOT IN (SELECT fp FROM hist)
"""

QUERIES["incremental_dedup"] = q_incremental_dedup
ORACLES["incremental_dedup"] = ORACLE_INCREMENTAL_DEDUP


def q_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup maintenance: the corpus is split into a
    stored part (doc_id % 10 != 0, pre-indexed) and a new batch
    (doc_id % 10 == 0); output is every near-dup pair touching the new
    batch, produced WITHOUT re-banding or self-joining the stored side
    (`operators/dedup.py` minhash_lsh_pairs_incremental). Hash-family
    values are engine-specific → rows-only; equivalence with the full
    operator is property-tested and its deterministic core is the
    `minhash_incremental_recall` ● twin."""
    from kg_etl_spark.operators.dedup import minhash_index, minhash_lsh_pairs_incremental

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    stored = docs.filter(F.pmod("doc_id", F.lit(10)) != 0)
    new = docs.filter(F.pmod("doc_id", F.lit(10)) == 0)
    idx = minhash_index(stored, "doc_id", n=3, num_hashes=64, bands=16)
    return minhash_lsh_pairs_incremental(
        new, idx, "doc_id", n=3, num_hashes=64, bands=16, threshold=0.5, max_bucket=64
    )


def q_minhash_incremental_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted-provable twin of `minhash_incremental` (the
    minhash_identical_recall pattern, across the batch boundary):
    stored = the full corpus, new batch = docs 0..19 re-planted under
    ids +100000. Identical distinct-trigram sets band identically under
    the SHARED _band_table definition, so at threshold 1.0 with no cap
    the incremental output equals exactly the identical-shingle-set
    pairs with a new-side member — SQL-enumerable, so the incremental
    path's recall gets a full value-hash row."""
    from kg_etl_spark.operators.dedup import minhash_index, minhash_lsh_pairs_incremental

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    new = _planted_copies(docs)
    idx = minhash_index(docs, "doc_id", n=3, num_hashes=64, bands=16)
    return minhash_lsh_pairs_incremental(
        new, idx, "doc_id", n=3, num_hashes=64, bands=16, threshold=1.0, max_bucket=None
    )


ORACLE_MINHASH_INCREMENTAL_RECALL = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 20
), tk AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> length(x) > 0) AS t
  FROM corpus
), sh AS (
  SELECT doc_id,
         list_sort(list_distinct(
           list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
         )) AS s
  FROM tk
), keyed AS (
  SELECT doc_id, array_to_string(s, chr(31)) AS k FROM sh WHERE len(s) > 0
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(1.0 AS DOUBLE) AS jaccard
FROM keyed a JOIN keyed b ON a.k = b.k AND a.doc_id < b.doc_id
WHERE b.doc_id >= 100000
"""

QUERIES["minhash_incremental"] = q_minhash_incremental
QUERIES["minhash_incremental_recall"] = q_minhash_incremental_recall
ORACLES["minhash_incremental_recall"] = ORACLE_MINHASH_INCREMENTAL_RECALL


def q_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contextual perplexity filter: mean smoothed-bigram surprisal per
    document (operators/textquality.py `bigram_surprisal`)."""
    from kg_etl_spark.operators.textquality import bigram_surprisal

    docs = read_table(spark, sf_dir, "documents")
    return bigram_surprisal(docs)


ORACLE_BIGRAM_SURPRISAL = """
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                     x -> len(x) > 0) AS t
  FROM documents
), bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)),
                               i -> struct_pack(w1 := t[i], w2 := t[i+1]))) AS b
  FROM tk
), bge AS (
  SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg
), uni AS (
  SELECT unnest(t) AS w1 FROM tk
), cuni AS (
  SELECT w1, COUNT(*) AS c1 FROM uni GROUP BY w1
), v AS (
  SELECT COUNT(*) AS n FROM cuni
), cbi AS (
  SELECT w1, w2, COUNT(*) AS c2 FROM bge GROUP BY w1, w2
), scored AS (
  SELECT b.doc_id,
         CAST(ROUND(-ln(CAST(cbi.c2 + 1 AS DOUBLE)
                        / CAST(cuni.c1 + v.n AS DOUBLE)), 6) AS DECIMAL(28,6)) AS s
  FROM bge b JOIN cbi USING (w1, w2) JOIN cuni USING (w1), v
)
SELECT doc_id, COUNT(*) AS n_bigrams,
       ROUND(CAST(SUM(s) AS DOUBLE) / COUNT(*), 6) AS avg_bigram_surprisal
FROM scored GROUP BY doc_id
"""

QUERIES["bigram_surprisal"] = q_bigram_surprisal
ORACLES["bigram_surprisal"] = ORACLE_BIGRAM_SURPRISAL


def q_token_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations by document-level PMI
    (operators/search.py `token_pmi_pairs`)."""
    from kg_etl_spark.operators.search import token_pmi_pairs

    docs = read_table(spark, sf_dir, "documents")
    # the synthetic corpus has a ~31-type vocabulary with near-uniform
    # df, so the stop-word cap is set unbinding here; on real crawl text
    # it is the blowup guard (see operator docstring)
    return token_pmi_pairs(docs, min_df=5, max_df=1_000_000, k=20)


ORACLE_TOKEN_PMI = """
WITH tk AS (
  SELECT doc_id,
         unnest(list_distinct(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                          x -> len(x) > 0))) AS t
  FROM documents
), n AS (
  SELECT COUNT(DISTINCT doc_id) AS nd FROM documents
), dfc AS (
  SELECT t, COUNT(*) AS df FROM tk GROUP BY t
), win AS (
  SELECT t, df FROM dfc WHERE df >= 5 AND df <= 1000000
), toks AS (
  SELECT tk.doc_id, tk.t, win.df FROM tk JOIN win USING (t)
), pairs AS (
  SELECT a.t AS w1, b.t AS w2,
         COUNT(*) AS n_docs_together,
         ANY_VALUE(a.df) AS dfa, ANY_VALUE(b.df) AS dfb
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND a.t < b.t
  GROUP BY a.t, b.t
  HAVING COUNT(*) >= 5
)
SELECT w1, w2, n_docs_together,
       ROUND(ln(CAST(n.nd AS DOUBLE) * CAST(n_docs_together AS DOUBLE)
                / CAST(dfa * dfb AS DOUBLE)), 6) AS pmi
FROM pairs, n
ORDER BY pmi DESC, w1 ASC, w2 ASC
LIMIT 20
"""

QUERIES["token_pmi"] = q_token_pmi
ORACLES["token_pmi"] = ORACLE_TOKEN_PMI


def q_ngram_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered ssjoin variant of ngram_jaccard_dedup — same
    result contract (same oracle text), candidates generated from each
    doc's rarest (l − ⌈t·l⌉ + 1) shingles only
    (operators/dedup.py `ngram_jaccard_pairs_prefix`)."""
    docs = read_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs_prefix(docs, "doc_id", n=3, threshold=0.8)


QUERIES["ngram_jaccard_prefix"] = q_ngram_jaccard_prefix
ORACLES["ngram_jaccard_prefix"] = ORACLE_NGRAM_JACCARD


def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-entropy quality signal per document (bits/char) plus
    alphabet size — shuffle-free map pass (see
    operators/textquality.py `char_entropy`).

    Domain: non-empty texts, filtered EXPLICITLY on the Spark side so
    both engines drop the same rows (the oracle's per-char join drops
    empty texts implicitly). BMP-only contract: Spark's split("")
    yields UTF-16 code units while DuckDB string_split yields
    codepoints — identical for BMP text (the documents fixture), they
    diverge on surrogate pairs; documented, not special-cased."""
    from kg_etl_spark.operators.textquality import char_entropy

    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    chars = F.filter(F.split(F.col("text"), ""), lambda x: x != F.lit(""))
    return docs.select(
        "doc_id",
        F.size(chars).cast("long").alias("n_chars_counted"),
        F.size(F.array_distinct(chars)).cast("long").alias("n_distinct_chars"),
        char_entropy(F.col("text")).alias("char_entropy"),
    )


# Same math as the Spark side: per-(doc,char) counts, p = cnt/n, term
# rounded to 6 dp, decimal-summed (order-independent) → double.
ORACLE_CHAR_ENTROPY = """
WITH ch AS (
  SELECT doc_id, UNNEST(string_split(text, '')) AS c FROM documents
), cc AS (
  SELECT doc_id, c, COUNT(*) AS cnt FROM ch WHERE c <> '' GROUP BY doc_id, c
), tot AS (
  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n, COUNT(*) AS n_distinct_chars
  FROM cc GROUP BY doc_id
)
SELECT t.doc_id,
       t.n AS n_chars_counted,
       t.n_distinct_chars,
       CAST(SUM(ROUND(-(CAST(cc.cnt AS DOUBLE) / CAST(t.n AS DOUBLE))
                      * log2(CAST(cc.cnt AS DOUBLE) / CAST(t.n AS DOUBLE)), 6)
                :: DECIMAL(28,6)) AS DOUBLE) AS char_entropy
FROM cc JOIN tot t ON cc.doc_id = t.doc_id
GROUP BY t.doc_id, t.n, t.n_distinct_chars
"""

QUERIES["char_entropy"] = q_char_entropy
ORACLES["char_entropy"] = ORACLE_CHAR_ENTROPY


# --- readability scoring (Flesch-style, exact arithmetic) ---------------


def q_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-style reading-ease per document from three exact counts:
    whitespace words, sentence delimiters ([.!?]+ runs), and vowel-group
    "syllables" ([aeiouy]+ runs over the lowered text) — the standard
    cheap readability signal in LLM corpus filtering (reference parity:
    the quality-feature family, SURVEY §2 F-group; this adds the
    classic score the reference's quality filters approximate).
    score = 206.835 - 1.015*(words/sentences) - 84.6*(syllables/words),
    every input an integer count, every op a single IEEE double op in
    the same order both engines, rounded at the edge. Zero guards via
    greatest(x, 1); NULL texts filtered identically both sides.
    Map-side only: one parquet scan, no shuffle, fully codegen."""
    docs = read_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    w = F.greatest(token_count(F.col("text")).cast("long"), F.lit(1).cast("long"))
    s = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.!?]+"), 0)).cast("long"),
        F.lit(1).cast("long"),
    )
    y = F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[aeiouy]+"), 0)).cast("long")
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (w.cast("double") / s.cast("double"))
        - F.lit(84.6) * (y.cast("double") / w.cast("double"))
    )
    return docs.select(
        "doc_id",
        w.alias("n_words"),
        s.alias("n_sentences"),
        y.alias("n_syllables"),
        F.round(flesch, 6).alias("flesch"),
    )


ORACLE_READABILITY = f"""
WITH t AS (
  SELECT doc_id,
         GREATEST(CAST(len({_SQL_TOKS}) AS BIGINT), 1) AS n_words,
         GREATEST(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT), 1) AS n_sentences,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       ROUND(
         CAST(206.835 AS DOUBLE)
         - CAST(1.015 AS DOUBLE) * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
         - CAST(84.6 AS DOUBLE) * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)), 6
       ) AS flesch
FROM t
"""

QUERIES["readability_scores"] = q_readability_scores
ORACLES["readability_scores"] = ORACLE_READABILITY


# --- Winnowing (MOSS) fingerprint dedup --------------------------------


def q_winnowing_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional near-dup pairs by winnowing-fingerprint overlap
    (operators/dedup.winnowing_fingerprints, k=5-gram hashes, w=4
    windows, ratio >= 0.5) — the substring-robust member of the dedup
    family: any shared run of >= w+k-1 tokens is guaranteed to share
    a fingerprint, which MinHash's set-sampling cannot promise.
    Fingerprints are engine-specific xxhash64 values → rows-only; the
    `winnowing_identical_recall` twin value-checks recall and the
    pytest property check plants the substring guarantee."""
    from kg_etl_spark.operators.dedup import winnowing_pairs

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return winnowing_pairs(docs, "doc_id", k=5, w=4, threshold=0.5, max_df=64)


def q_winnowing_identical_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted-provable twin of `winnowing_dedup` (the
    minhash_incremental_recall pattern): docs 0..19 re-planted under
    ids +100000 produce IDENTICAL k-gram hash sequences, hence
    identical fingerprint sets — every planted pair with >= k+w-1
    tokens MUST surface at ratio exactly 1.0. Output restricted to
    the planted diagonal so the row set is SQL-enumerable."""
    from kg_etl_spark.operators.dedup import winnowing_pairs

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = _planted_copies(docs)
    pairs = winnowing_pairs(
        docs.unionByName(planted), "doc_id", k=5, w=4, threshold=1.0, max_df=None
    )
    return pairs.filter(
        (F.col("b_id") == F.col("a_id") + 100_000) & (F.col("b_id") >= 100_000)
    ).select("a_id", "b_id", "ratio")


ORACLE_WINNOWING_RECALL = r"""
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> length(x) > 0) AS t
  FROM documents WHERE doc_id < 20
)
SELECT doc_id AS a_id, doc_id + 100000 AS b_id, CAST(1.0 AS DOUBLE) AS ratio
FROM tk WHERE len(t) >= 8
"""

QUERIES["winnowing_dedup"] = q_winnowing_dedup
QUERIES["winnowing_identical_recall"] = q_winnowing_identical_recall
ORACLES["winnowing_identical_recall"] = ORACLE_WINNOWING_RECALL


# --- n-gram containment (snippet-inclusion) dedup ------------------------


def q_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup pairs by shingle containment
    |A∩B| / min(|A|, |B|) >= 0.6 (operators/dedup.
    ngram_containment_pairs) — catches a short doc embedded inside a
    long one, which symmetric Jaccard misses (scores ~|A|/|B|). Same
    inverted-index single-shuffle shape as ngram_jaccard_dedup at
    bench SF; above 100k docs the size-adaptive dispatch (r10) routes
    to the prefix × full ssjoin — the containment twin of the Jaccard
    family's scale path, property-tested row-identical."""
    from kg_etl_spark.operators.dedup import ngram_containment_pairs_adaptive

    docs = read_table(spark, sf_dir, "documents")
    return ngram_containment_pairs_adaptive(docs, "doc_id", n=3, threshold=0.6)


ORACLE_CONTAINMENT = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
s AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
  FROM t WHERE len(toks) >= 3
),
p AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         len(list_intersect(a.sh, b.sh)) AS n_common,
         len(a.sh) AS a_sz, len(b.sh) AS b_sz
  FROM s a JOIN s b ON a.doc_id < b.doc_id
)
SELECT a_id, b_id, CAST(n_common AS BIGINT) AS n_common,
       ROUND(CAST(n_common AS DOUBLE) / LEAST(a_sz, b_sz), 6) AS containment
FROM p
WHERE n_common > 0 AND CAST(n_common AS DOUBLE) / LEAST(a_sz, b_sz) >= 0.6
"""

QUERIES["containment_dedup"] = q_containment_dedup
ORACLES["containment_dedup"] = ORACLE_CONTAINMENT


# --- Jensen–Shannon divergence of each source vs the corpus -------------


def q_source_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distribution drift: Jensen–Shannon divergence (nats)
    between each source's unigram distribution P and the corpus-wide
    distribution G — the standard mixture-audit readout before
    reweighting training sources (Lin, IEEE-IT 1991).

    Only tokens PRESENT in the source need explicit terms: for t with
    P(t)=0, the G-side contribution collapses to G(t)·ln 2, so
      JSD = ½ Σ_{t∈s} [P ln(P/M) + G ln(G/M)] + ½ ln2 · (1 − Σ_{t∈s} G)
    with M = (P+G)/2 — the vocab×sources cross frame never
    materializes. Each ln term rounds to 8 dp into decimal before the
    sum (the KM order-independent float idiom).

    100 TB shape: one (source, token) hash aggregate (the only
    corpus-scale shuffle), a token-keyed global rollup of THAT frame,
    one broadcast totals attach, one per-source aggregate."""
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(ws_tokens(F.col("text"))).alias("t"))
    st = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("c"))
    gt = st.groupBy("t").agg(F.sum("c").alias("g"))
    tot_s = st.groupBy("source").agg(F.sum("c").alias("ns"))
    tot = gt.agg(F.sum("g").alias("ng"))
    j = (
        st.join(gt, "t")
        .join(F.broadcast(tot_s), "source")
        .crossJoin(F.broadcast(tot))
    )
    p = F.col("c").cast("double") / F.col("ns").cast("double")
    g = F.col("g").cast("double") / F.col("ng").cast("double")
    m = (p + g) / F.lit(2.0)
    term = F.round(p * F.log(p / m) + g * F.log(g / m), 8).cast("decimal(28,8)")
    gmass = F.round(g, 8).cast("decimal(28,8)")
    agg = j.groupBy("source").agg(
        F.max("ns").alias("n_tokens"),
        F.sum(term).alias("_t"),
        F.sum(gmass).alias("_gm"),
    )
    ln2 = 0.6931471805599453
    jsd = 0.5 * F.col("_t").cast("double") + 0.5 * ln2 * (
        F.lit(1.0) - F.col("_gm").cast("double")
    )
    return agg.select(
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(jsd, 6).alias("jsd_nats"),
    )


ORACLE_SOURCE_JSD = f"""
WITH tok AS (
  SELECT source, unnest({_SQL_TOKS}) AS t FROM documents
), st AS (
  SELECT source, t, COUNT(*) AS c FROM tok GROUP BY 1, 2
), gt AS (SELECT t, SUM(c) AS g FROM st GROUP BY 1),
tot_s AS (SELECT source, SUM(c) AS ns FROM st GROUP BY 1),
tot AS (SELECT SUM(g) AS ng FROM gt),
j AS (
  SELECT st.source, st.c, gt.g, ts.ns, tt.ng
  FROM st JOIN gt USING (t) JOIN tot_s ts USING (source), tot tt
), terms AS (
  SELECT source, ns,
         CAST(ROUND(
           (CAST(c AS DOUBLE) / ns) * LN((CAST(c AS DOUBLE) / ns)
             / ((CAST(c AS DOUBLE) / ns + CAST(g AS DOUBLE) / ng) / 2.0))
           + (CAST(g AS DOUBLE) / ng) * LN((CAST(g AS DOUBLE) / ng)
             / ((CAST(c AS DOUBLE) / ns + CAST(g AS DOUBLE) / ng) / 2.0)), 8)
           AS DECIMAL(28,8)) AS term,
         CAST(ROUND(CAST(g AS DOUBLE) / ng, 8) AS DECIMAL(28,8)) AS gmass
  FROM j
)
SELECT source, CAST(MAX(ns) AS BIGINT) AS n_tokens,
       ROUND(0.5 * CAST(SUM(term) AS DOUBLE)
             + 0.5 * 0.6931471805599453 * (1.0 - CAST(SUM(gmass) AS DOUBLE)), 6)
         AS jsd_nats
FROM terms GROUP BY source
"""

QUERIES["source_js_divergence"] = q_source_js_divergence
ORACLES["source_js_divergence"] = ORACLE_SOURCE_JSD


def q_zipf_tail_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law diagnostic of the token frequency distribution: OLS
    slope of ln(freq) on ln(rank) over the top-100 tokens (natural
    text ≈ −1; template-generated or degenerate corpora drift hard) —
    a standard corpus-quality gate before training. The corpus-scale
    work is ONE token hash aggregate; the top-100 come from the
    TakeOrdered per-partition tournament and the rank + regression run
    on that 100-row frame (model-sized — never a corpus window). ln()
    appears only in VALUES feeding 6dp-rounded output (the repo's
    libm discipline)."""
    docs = read_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(ws_tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(100)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n").desc(), F.col("word").asc())
    ranked = freq.withColumn("rank", F.row_number().over(w))
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("n").cast("double"))
    s = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_top"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * y).alias("_sxy"),
        F.sum(x * x).alias("_sxx"),
    )
    k = F.col("n_top").cast("double")
    slope = (k * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / (
        k * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    )
    return s.select("n_top", F.round(slope, 6).alias("zipf_slope"))


ORACLE_ZIPF = f"""
WITH f AS (
  SELECT word, COUNT(*) AS n FROM (
    SELECT unnest({_SQL_TOKS}) AS word FROM documents
  ) GROUP BY word ORDER BY n DESC, word ASC LIMIT 100
), r AS (
  SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, word ASC) AS rank FROM f
), s AS (
  SELECT COUNT(*) AS k, SUM(LN(rank)) AS sx, SUM(LN(n)) AS sy,
         SUM(LN(rank) * LN(n)) AS sxy, SUM(LN(rank) * LN(rank)) AS sxx
  FROM r
)
SELECT CAST(k AS BIGINT) AS n_top,
       ROUND((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) AS zipf_slope
FROM s
"""

QUERIES["zipf_tail_fit"] = q_zipf_tail_fit
ORACLES["zipf_tail_fit"] = ORACLE_ZIPF


# --- PMI collocations (round 9) ----------------------------------------


def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 ADJACENT-bigram collocations by pointwise mutual
    information (Church & Hanks 1990), min bigram count 5 — the
    sequence-level phrase-detection statistic behind tokenizer-merge
    candidates (word2vec's phrase pass, BPE-adjacent).  Distinct from
    `token_pmi`, which scores DOCUMENT-level co-occurrence (topical
    association) via a per-doc token self-join: here only positionally
    adjacent pairs count, normalized by the bigram total B, and the
    bigram stream is a map-side zip of each token array with its own
    tail — NO self-join exists to cap.
    pmi = ln((c_ab/B) / ((c_a/T)(c_b/T))) over exact integer counts;
    ties by bigram text asc.

    Shape: two hash aggregates (unigrams, adjacent bigrams — both
    map-side combinable), two UNHINTED equi-joins of the unigram
    table onto the bigram table, one 1-row total cross, and a
    TakeOrdered(20).  The unigram vocabulary is NOT domain-bounded —
    a whitespace-token vocab grows with the corpus (Heaps' law), so
    forcing a broadcast of it is the hint class (c) the r7 audit
    removed from bpe_encode (SCALE.md r7 ledger): at bench SF the
    static planner still picks BHJ on its own (plan-verified), and at
    100 TB the equi-join shuffles row-proportionally instead of
    OOMing the driver.  Only the cab >= 5-filtered BIGRAM side is
    frequency-bounded."""
    docs = read_table(spark, sf_dir, "documents")
    toks = ws_tokens(F.col("text"))
    uni = (
        docs.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
    ).lineage_cut(eager=False)
    big = (
        docs.select(
            F.explode(
                F.zip_with(
                    F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
                    F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                )
            ).alias("p")
        )
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cab"))
        .filter(F.col("cab") >= 5)
    )
    # _tot_* names: Spark's default case-insensitive resolution would
    # collide a total named "B" with the bigram column "b"
    totals = uni.agg(
        F.sum("cw").cast("double").alias("_tot_t")
    ).crossJoin(
        docs.select(
            F.sum(F.greatest(F.size(toks) - 1, F.lit(0)))
            .cast("double")
            .alias("_tot_b")
        )
    )
    ua = uni.select(F.col("w").alias("a"), F.col("cw").alias("ca"))
    ub = uni.select(F.col("w").alias("b"), F.col("cw").alias("cb"))
    scored = (
        big.join(ua, "a")
        .join(ub, "b")
        .crossJoin(F.broadcast(totals))
        .select(
            F.concat_ws(" ", "a", "b").alias("bigram"),
            F.col("cab").cast("long").alias("n_pair"),
            F.log(
                (F.col("cab") / F.col("_tot_b"))
                / (
                    (F.col("ca") / F.col("_tot_t"))
                    * (F.col("cb") / F.col("_tot_t"))
                )
            ).alias("_pmi"),
        )
    )
    return (
        scored.orderBy(F.col("_pmi").desc(), F.col("bigram").asc())
        .limit(20)
        .select("bigram", "n_pair", F.round("_pmi", 6).alias("pmi"))
    )


ORACLE_PMI = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
uni AS (
  SELECT word AS w, COUNT(*) AS cw
  FROM (SELECT unnest(toks) AS word FROM t) GROUP BY 1
),
big AS (
  SELECT a, b, COUNT(*) AS cab FROM (
    SELECT unnest(list_transform(range(1, len(toks)),
                  i -> toks[i])) AS a,
           unnest(list_transform(range(1, len(toks)),
                  i -> toks[i + 1])) AS b
    FROM t WHERE len(toks) >= 2
  ) GROUP BY 1, 2 HAVING COUNT(*) >= 5
),
tot AS (
  SELECT (SELECT SUM(cw) FROM uni) AS tot_t,
         (SELECT SUM(greatest(len(toks) - 1, 0)) FROM t) AS tot_b
),
s AS (
  SELECT a || ' ' || b AS bigram, cab,
         LN((cab / CAST(tot_b AS DOUBLE))
            / ((ca / CAST(tot_t AS DOUBLE)) * (cb / CAST(tot_t AS DOUBLE)))) AS pmi
  FROM big
  JOIN (SELECT w AS a, cw AS ca FROM uni) USING (a)
  JOIN (SELECT w AS b, cw AS cb FROM uni) USING (b)
  CROSS JOIN tot
)
SELECT bigram, n_pair, ROUND(pmi, 6) AS pmi FROM (
  -- rank on the UNROUNDED pmi (DuckDB binds a bare ORDER BY pmi to
  -- the rounded SELECT alias, which can pick a different top-20 set
  -- at the rank-20 boundary than the Spark side's unrounded sort)
  SELECT bigram, CAST(cab AS BIGINT) AS n_pair, pmi
  FROM s ORDER BY pmi DESC, bigram ASC LIMIT 20
)
"""

QUERIES["pmi_collocations"] = q_pmi_collocations
ORACLES["pmi_collocations"] = ORACLE_PMI


# --- Span document-frequency histogram (round 9) -----------------------


def q_span_df_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2 histogram of 5-gram span document frequencies — the
    dedup-pressure diagnostic of the span family (how much of the
    span vocabulary is df=1 noise vs heavy boilerplate): one row per
    floor(log2(df)) bucket with distinct-span and total-occurrence
    counts.  Same span grain as duplicate_span_flags (distinct spans
    per doc, so span count == document frequency).

    Shape: the span DF aggregate is the one corpus shuffle; the
    histogram is a second model-sized aggregate over the |span
    vocabulary| frame.  Nothing concentrates."""
    from kg_etl_spark.functions.text import word_shingles
    from kg_etl_spark.operators.textquality import ws_tokens as _wt

    docs = read_table(spark, sf_dir, "documents")
    # tokenize ONCE per row: word_shingles over an inline ws_tokens gets
    # the split/trim/lower subtree re-inlined 2n+1 times (once per
    # slice/size argument — generator inputs see no codegen subexpr
    # elimination; measured 1.72→1.29 s at sf0.1); the separate token
    # projection survives CollapseProject (non-cheap, multi-referenced)
    toks = docs.select(_wt(F.col("text")).alias("_toks"))
    spans = toks.select(
        F.explode(word_shingles(F.col("_toks"), 5)).alias("_span"),
    )
    dfreq = spans.groupBy("_span").agg(F.count(F.lit(1)).alias("df"))
    return (
        dfreq.groupBy(
            F.floor(F.log2("df")).cast("long").alias("log2_df_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum("df").cast("long").alias("n_occurrences"),
        )
        .orderBy("log2_df_bucket")
    )


ORACLE_SPAN_DF_HIST = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(toks) - 4, 0) + 1),
           i -> array_to_string(list_slice(toks, i, i + 4), ' ')))) AS span
  FROM t
),
dfp AS (SELECT span, COUNT(*) AS df FROM g GROUP BY span)
SELECT CAST(FLOOR(LOG2(df)) AS BIGINT) AS log2_df_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(df) AS BIGINT) AS n_occurrences
FROM dfp GROUP BY 1 ORDER BY 1
"""

QUERIES["span_df_histogram"] = q_span_df_histogram
ORACLES["span_df_histogram"] = ORACLE_SPAN_DF_HIST


# --- Content-defined chunking dedup profile (round 10) ------------------


def q_cdc_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined-chunking dedup profile — the storage-dedup
    member of the fingerprint family (FastCDC/LBFS lineage: Muthitacharoen
    et al., SOSP'01), at token grain: a chunk boundary falls AFTER
    token i whenever the rolling 4-token window ending at i hashes
    into a 1/8 target band (md5 last hex in {0,1} — expected ~8-token
    chunks), so an insertion early in a document shifts positions but
    boundaries re-synchronize and the shared suffix still dedups —
    the property positional/fixed-width chunking lacks.  Output is the
    corpus dedup summary: total/distinct/duplicated chunk counts, the
    share of chunk occurrences that are duplicates, and the mean chunk
    length.

    Reference parity: the reference fingerprints whole rows with md5
    over normalized text (diagnostics/spotcheck.py); this is the
    sub-document member of that family alongside winnowing (positional
    k-grams), MinHash (set overlap) and the span family (Lee et al.).

    100 TB shape: posexplode -> ONE doc-partitioned shuffle carrying
    BOTH window passes (the rolling-hash lag-concat and the exclusive
    boundary prefix-sum share the (doc, pos) sort, same spread()-reused
    partitioning as winnowing) -> per-(doc, chunk) hash aggregate ->
    per-chunk-text df aggregate -> one 1-row summary.  Everything is
    row-proportional; chunk texts are ~8 tokens so the chunk aggregate
    carries ~n_tokens/8 rows.  Cross-engine exactness: md5 of the
    space-joined window string is byte-identical in both engines; the
    two ratios are single IEEE divides of exact longs, rounded to 6dp."""
    from pyspark.sql import Window

    from kg_etl_spark.operators.util import spread

    k = 4
    d = spread(read_table(spark, sf_dir, "documents"), F.col("doc_id"))
    tok = d.select(
        "doc_id", F.posexplode(ws_tokens(F.col("text"))).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    lags = [F.lag("tok", j).over(w) for j in range(k - 1, 0, -1)] + [F.col("tok")]
    win_str = F.concat_ws(" ", *lags)
    boundary = F.when(
        lags[0].isNotNull()
        & F.substring(F.md5(win_str), 32, 1).isin("0", "1"),
        F.lit(1),
    ).otherwise(F.lit(0))
    marked = tok.withColumn("_b", boundary)
    chunked = marked.withColumn(
        "chunk",
        F.coalesce(
            F.sum("_b").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    )
    chunks = chunked.groupBy("doc_id", "chunk").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("chunk_text"),
        F.count(F.lit(1)).alias("_clen"),
    )
    per_chunk = chunks.groupBy("chunk_text").agg(
        F.count(F.lit(1)).alias("df"), F.max("_clen").alias("_clen")
    )
    return per_chunk.agg(
        F.sum("df").cast("long").alias("n_chunks"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_chunks"),
        F.sum((F.col("df") >= 2).cast("long")).cast("long").alias("n_dup_chunks"),
        F.round(
            F.sum(F.when(F.col("df") >= 2, F.col("df")).otherwise(0)).cast("double")
            / F.sum("df").cast("double"),
            6,
        ).alias("dup_occurrence_share"),
        F.round(
            F.sum(F.col("df") * F.col("_clen")).cast("double")
            / F.sum("df").cast("double"),
            6,
        ).alias("avg_chunk_tokens"),
    )


ORACLE_CDC_CHUNKS = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
p AS (
  SELECT doc_id,
         unnest(range(1, len(toks) + 1)) AS pos,
         unnest(toks) AS tok,
         unnest(list_transform(range(1, len(toks) + 1),
           i -> CASE WHEN i >= 4 AND right(md5(
                  array_to_string(list_slice(toks, i - 3, i), ' ')), 1)
                  IN ('0', '1') THEN 1 ELSE 0 END)) AS b
  FROM t
),
c AS (
  SELECT doc_id, pos, tok,
         COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk
  FROM p
),
chunks AS (
  SELECT doc_id, chunk,
         string_agg(tok, ' ' ORDER BY pos) AS chunk_text,
         COUNT(*) AS clen
  FROM c GROUP BY doc_id, chunk
),
per_chunk AS (
  SELECT chunk_text, COUNT(*) AS df, MAX(clen) AS clen
  FROM chunks GROUP BY chunk_text
)
SELECT CAST(SUM(df) AS BIGINT) AS n_chunks,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_chunks,
       CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
       ROUND(CAST(SUM(CASE WHEN df >= 2 THEN df ELSE 0 END) AS DOUBLE)
             / CAST(SUM(df) AS DOUBLE), 6) AS dup_occurrence_share,
       ROUND(CAST(SUM(df * clen) AS DOUBLE) / CAST(SUM(df) AS DOUBLE), 6)
         AS avg_chunk_tokens
FROM per_chunk
"""

QUERIES["cdc_chunk_stats"] = q_cdc_chunk_stats
ORACLES["cdc_chunk_stats"] = ORACLE_CDC_CHUNKS


# --- Split-level LM eval: cross-entropy + OOV (round 10) ----------------

_LM_BUCKET_SQL = "(doc_id * 2654435761) % 4294967296 % 100"


def q_split_lm_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out unigram-LM evaluation of the standard hash split — the
    sanity gate a data pipeline runs before burning compute: train a
    +1-smoothed unigram model on the train split and score the val
    split (cross-entropy in nats and OOV rate).  A leaky or skewed
    split shows up here before the real training run does.

    p(w) = (c_train(w) + 1) / (T + V + 1), OOV p = 1 / (T + V + 1)
    (V = train vocab size) — the unigram_surprisal smoothing, applied
    cross-split.

    100 TB shape: split assignment is map-side (Knuth hash on doc_id);
    ONE token-count aggregate over the train split; the val token
    stream left-joins the train vocab UNHINTED (a Heaps'-law table —
    the r10 broadcast-gate class: the planner broadcasts it at bench
    SF, shuffles row-proportionally at scale); two 1-row scalars
    (T+V, n_val) cross as broadcasts.  Cross-engine exactness: the
    established round-6-then-DECIMAL(28,6)-sum idiom makes the token
    surprisal sum order-independent."""
    from kg_etl_spark.operators.datapipe import train_val_test_split

    docs = train_val_test_split(read_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "split", F.explode(ws_tokens(F.col("text"))).alias("tok")
    )
    train_counts = (
        toks.filter(F.col("split") == "train")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    ).lineage_cut(eager=False)
    consts = train_counts.agg(
        (F.sum("c") + F.count(F.lit(1)) + F.lit(1)).cast("double").alias("denom"),
        F.sum("c").cast("long").alias("n_train_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
    )
    val = toks.filter(F.col("split") == "val").join(train_counts, "tok", "left")
    p = F.coalesce((F.col("c") + 1).cast("double"), F.lit(1.0)) / F.col("denom")
    scored = val.crossJoin(F.broadcast(consts)).select(
        "n_train_tokens",
        "vocab_size",
        F.round(-F.log(p), 6).cast("decimal(28,6)").alias("_s"),
        F.col("c").isNull().cast("long").alias("_oov"),
    )
    return scored.groupBy("n_train_tokens", "vocab_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_val_tokens"),
        F.sum("_oov").cast("long").alias("oov_tokens"),
        F.round(
            F.sum("_oov").cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("oov_rate"),
        F.round(
            F.sum("_s").cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("cross_entropy"),
    )


ORACLE_SPLIT_LM_EVAL = f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN {_LM_BUCKET_SQL} < 10 THEN 'test'
              WHEN {_LM_BUCKET_SQL} < 20 THEN 'val'
              ELSE 'train' END AS split,
         {_SQL_TOKS} AS toks
  FROM documents
),
toks AS (SELECT split, unnest(toks) AS tok FROM d),
train_counts AS (
  SELECT tok, COUNT(*) AS c FROM toks WHERE split = 'train' GROUP BY tok
),
consts AS (
  SELECT CAST(SUM(c) + COUNT(*) + 1 AS DOUBLE) AS denom,
         CAST(SUM(c) AS BIGINT) AS n_train_tokens,
         CAST(COUNT(*) AS BIGINT) AS vocab_size
  FROM train_counts
),
scored AS (
  SELECT consts.n_train_tokens, consts.vocab_size,
         CAST(ROUND(-ln(CAST(COALESCE(tc.c + 1, 1) AS DOUBLE) / consts.denom),
                    6) AS DECIMAL(28,6)) AS s,
         CASE WHEN tc.c IS NULL THEN 1 ELSE 0 END AS oov
  FROM toks t LEFT JOIN train_counts tc USING (tok), consts
  WHERE t.split = 'val'
)
SELECT n_train_tokens, vocab_size,
       CAST(COUNT(*) AS BIGINT) AS n_val_tokens,
       CAST(SUM(oov) AS BIGINT) AS oov_tokens,
       ROUND(CAST(SUM(oov) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS oov_rate,
       ROUND(CAST(SUM(s) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS cross_entropy
FROM scored GROUP BY 1, 2
"""

QUERIES["split_lm_eval"] = q_split_lm_eval
ORACLES["split_lm_eval"] = ORACLE_SPLIT_LM_EVAL


# --- Vocabulary growth curve (Heaps' law, round 10) ----------------------


def q_vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth diagnostic: sweep the corpus in
    doc-id order, bucket it into 10 equal id-range deciles, and report
    per decile how many NEW token types first appear there alongside
    the decile's token volume — the saturation curve that tells a
    curation run whether more data still buys vocabulary (and
    calibrates BPE vocab sizing).  A type's first appearance is
    min(doc_id) over its occurrences — exact, order-free, and
    incremental-friendly.

    100 TB shape: ONE min-aggregate over the exploded token stream
    (map-side combinable) + one token-volume aggregate per decile; the
    10-row join stays unhinted (planner broadcasts).  No windows, no
    driver state."""
    docs = read_table(spark, sf_dir, "documents")
    n_docs = docs.agg((F.max("doc_id") + 1).alias("n"))
    toks = docs.select("doc_id", F.explode(ws_tokens(F.col("text"))).alias("tok"))
    first_seen = toks.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    dec = lambda c: F.least(F.lit(9), F.floor(c * 10 / F.col("n"))).cast("long")  # noqa: E731
    new_types = (
        first_seen.crossJoin(F.broadcast(n_docs))
        .groupBy(dec(F.col("first_doc")).alias("decile"))
        .agg(F.count(F.lit(1)).cast("long").alias("new_types"))
    )
    volume = (
        toks.crossJoin(F.broadcast(n_docs))
        .groupBy(dec(F.col("doc_id")).alias("decile"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"))
    )
    return (
        volume.join(new_types, "decile", "left")
        .select(
            "decile",
            "n_tokens",
            F.coalesce("new_types", F.lit(0)).cast("long").alias("new_types"),
        )
        .orderBy("decile")
    )


ORACLE_VOCAB_GROWTH = f"""
WITH n AS (SELECT MAX(doc_id) + 1 AS n FROM documents),
toks AS (SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents),
first_seen AS (SELECT tok, MIN(doc_id) AS first_doc FROM toks GROUP BY tok),
new_types AS (
  SELECT LEAST(9, CAST(FLOOR(first_doc * 10 / n.n) AS BIGINT)) AS decile,
         CAST(COUNT(*) AS BIGINT) AS new_types
  FROM first_seen, n GROUP BY 1
),
volume AS (
  SELECT LEAST(9, CAST(FLOOR(doc_id * 10 / n.n) AS BIGINT)) AS decile,
         CAST(COUNT(*) AS BIGINT) AS n_tokens
  FROM toks, n GROUP BY 1
)
SELECT v.decile, v.n_tokens,
       CAST(COALESCE(nt.new_types, 0) AS BIGINT) AS new_types
FROM volume v LEFT JOIN new_types nt USING (decile)
"""

QUERIES["vocab_growth_curve"] = q_vocab_growth_curve
ORACLES["vocab_growth_curve"] = ORACLE_VOCAB_GROWTH


# --- Train/eval split near-dup leakage audit (round 10) ------------------


def q_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split contamination audit: near-duplicate pairs (the
    ngram-Jaccard >= 0.8 detector) classified by which hash-split
    sides they straddle — a train/val or train/test row is EVAL
    LEAKAGE (the eval score is partly memorization), the single most
    common silent failure of random splits over near-dup-heavy crawls
    (Lee et al. 2022 §6.2 measure exactly this).  Output: one row per
    unordered split pair with the pair count.

    100 TB shape: the pair stream is the SIZE-ADAPTIVE generator
    (plain inverted index at bench SF, prefix ssjoin above 100k docs —
    branches property-tested row-identical, so the oracle applies to
    both); split labels attach map-side (Knuth hash of doc_id — no
    join against the docs table is needed on the pair side because the
    split is a pure function of the id the pair already carries); one
    |splits|x|splits| aggregate."""
    from kg_etl_spark.operators.datapipe import hash_bucket

    docs = read_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs_adaptive(docs, "doc_id", n=3, threshold=0.8)

    def split_of(idcol):
        b = hash_bucket(F.col(idcol))
        return (
            F.when(b < 10, "test").when(b < 20, "val").otherwise("train")
        )

    labeled = pairs.select(
        split_of("a_id").alias("_sa"), split_of("b_id").alias("_sb")
    ).select(
        F.least("_sa", "_sb").alias("split_a"),
        F.greatest("_sa", "_sb").alias("split_b"),
    )
    return (
        labeled.groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .orderBy("split_a", "split_b")
    )


ORACLE_SPLIT_LEAKAGE = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
s AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
  FROM t WHERE len(toks) >= 3
),
p AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         len(list_intersect(a.sh, b.sh)) AS n_common,
         len(a.sh) AS a_sz, len(b.sh) AS b_sz
  FROM s a JOIN s b ON a.doc_id < b.doc_id
),
q AS (
  SELECT a_id, b_id FROM p
  WHERE n_common > 0
    AND CAST(n_common AS DOUBLE) / (a_sz + b_sz - n_common) >= 0.8
),
lab AS (
  SELECT CASE WHEN (a_id * 2654435761) % 4294967296 % 100 < 10 THEN 'test'
              WHEN (a_id * 2654435761) % 4294967296 % 100 < 20 THEN 'val'
              ELSE 'train' END AS sa,
         CASE WHEN (b_id * 2654435761) % 4294967296 % 100 < 10 THEN 'test'
              WHEN (b_id * 2654435761) % 4294967296 % 100 < 20 THEN 'val'
              ELSE 'train' END AS sb
  FROM q
)
SELECT LEAST(sa, sb) AS split_a, GREATEST(sa, sb) AS split_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM lab GROUP BY 1, 2
"""

QUERIES["split_leakage_audit"] = q_split_leakage_audit
ORACLES["split_leakage_audit"] = ORACLE_SPLIT_LEAKAGE


# --- Filter yield curve (round 10) ---------------------------------------


def q_filter_yield_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yield curve of the Gopher-style minimum-length filter: for each
    candidate threshold, the share of DOCUMENTS and of TOKENS that
    survive `n_tokens >= t` — the first chart a curation run draws
    before committing to a cutoff (is the knee at 32 or 128 tokens,
    and how much token mass does each step burn?).

    100 TB shape: ONE token-count projection, exploded against the
    5-row threshold array (map-side, 5x row fan-out into a map-side
    combinable aggregate), one 1-row corpus-totals cross.  No joins
    against corpus-scale frames."""
    thresholds = [16, 32, 64, 128, 256]
    docs = read_table(spark, sf_dir, "documents")
    per_doc = docs.select(F.size(ws_tokens(F.col("text"))).alias("_nt"))
    tot = per_doc.agg(
        F.count(F.lit(1)).cast("long").alias("_nd"),
        F.sum("_nt").cast("long").alias("_ntok"),
    )
    fanned = per_doc.select(
        "_nt", F.explode(F.array(*[F.lit(t) for t in thresholds])).alias("threshold")
    )
    surv = fanned.groupBy("threshold").agg(
        F.sum((F.col("_nt") >= F.col("threshold")).cast("long"))
        .cast("long")
        .alias("docs_surviving"),
        F.sum(
            F.when(F.col("_nt") >= F.col("threshold"), F.col("_nt")).otherwise(0)
        )
        .cast("long")
        .alias("tokens_surviving"),
    )
    return (
        surv.crossJoin(F.broadcast(tot))
        .select(
            F.col("threshold").cast("long").alias("threshold"),
            "docs_surviving",
            "tokens_surviving",
            F.round(
                F.col("docs_surviving").cast("double") / F.col("_nd").cast("double"),
                6,
            ).alias("doc_share"),
            F.round(
                F.col("tokens_surviving").cast("double")
                / F.col("_ntok").cast("double"),
                6,
            ).alias("token_share"),
        )
        .orderBy("threshold")
    )


ORACLE_YIELD_CURVE = f"""
WITH per_doc AS (SELECT len({_SQL_TOKS}) AS nt FROM documents),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nd, CAST(SUM(nt) AS BIGINT) AS ntok
  FROM per_doc
),
f AS (
  SELECT nt, unnest([16, 32, 64, 128, 256]) AS threshold FROM per_doc
),
surv AS (
  SELECT threshold,
         CAST(SUM(CASE WHEN nt >= threshold THEN 1 ELSE 0 END) AS BIGINT)
           AS docs_surviving,
         CAST(SUM(CASE WHEN nt >= threshold THEN nt ELSE 0 END) AS BIGINT)
           AS tokens_surviving
  FROM f GROUP BY threshold
)
SELECT CAST(threshold AS BIGINT) AS threshold, docs_surviving, tokens_surviving,
       ROUND(CAST(docs_surviving AS DOUBLE) / CAST(nd AS DOUBLE), 6)
         AS doc_share,
       ROUND(CAST(tokens_surviving AS DOUBLE) / CAST(ntok AS DOUBLE), 6)
         AS token_share
FROM surv, tot
"""

QUERIES["filter_yield_curve"] = q_filter_yield_curve
ORACLES["filter_yield_curve"] = ORACLE_YIELD_CURVE


# --- Duplicate-span attribution per source (round 10) --------------------


def q_dup_span_source_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHICH source ships the boilerplate: per source, the share of
    its 5-gram spans (distinct per doc — the span family's grain)
    whose corpus document-frequency is >= 2.  The actionable
    counterpart of span_df_histogram: the histogram says HOW MUCH
    dedup pressure exists; this says WHERE to point the cleaner.

    100 TB shape: one span-DF aggregate (the corpus shuffle), then the
    span stream re-joins the DF table UNHINTED (a Heaps'-law span
    vocabulary — the r10 broadcast-gate class; planner broadcasts at
    bench SF, shuffles at scale), one |sources|-row aggregate."""
    from kg_etl_spark.functions.text import word_shingles

    docs = read_table(spark, sf_dir, "documents")
    # tokenize once per row (see span_df_histogram: an inline ws_tokens
    # is re-inlined 2n+1 times into the shingle generator)
    spans = (
        docs.select("source", ws_tokens(F.col("text")).alias("_toks"))
        .select("source", F.explode(word_shingles(F.col("_toks"), 5)).alias("_span"))
        .lineage_cut(eager=False)
    )
    # only the df>=2 MEMBERSHIP matters per instance, so the span
    # stream never joins the full Heaps'-law DF table: totals come from
    # a map-side-partial aggregate with no join at all, and dup counts
    # from a semi-join against the far smaller duplicated-span set
    # (the flags/excision operators' established shape — planner
    # broadcasts it at bench SF, shuffles at scale)
    dup_set = (
        spans.groupBy("_span")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") >= 2)
        .select("_span")
    )
    totals = spans.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans")
    )
    dups = (
        spans.join(dup_set, "_span", "left_semi")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("dup_spans"))
    )
    return (
        totals.join(dups, "source", "left")
        .select(
            "source",
            "n_spans",
            F.coalesce(F.col("dup_spans"), F.lit(0)).cast("long").alias("dup_spans"),
            F.round(
                F.coalesce(F.col("dup_spans"), F.lit(0)).cast("double")
                / F.col("n_spans").cast("double"),
                6,
            ).alias("dup_share"),
        )
        .orderBy("source")
    )


ORACLE_DUP_SPAN_SOURCE = f"""
WITH t AS (SELECT source, {_SQL_TOKS} AS toks FROM documents),
g AS (
  SELECT source,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(toks) - 4, 0) + 1),
           i -> array_to_string(list_slice(toks, i, i + 4), ' ')))) AS span
  FROM t
),
dfp AS (SELECT span, COUNT(*) AS df FROM g GROUP BY span)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_spans,
       ROUND(CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS dup_share
FROM g JOIN dfp USING (span)
GROUP BY source
"""

QUERIES["dup_span_source_attribution"] = q_dup_span_source_attribution
ORACLES["dup_span_source_attribution"] = ORACLE_DUP_SPAN_SOURCE


# --- Unigram-LM (SentencePiece-style) tokenizer (round 10) ---------------


def q_unigram_lm_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EM-trained unigram-LM piece vocabulary (Kudo 2018) over the
    corpus — the second tokenizer family next to BPE: seed with the
    weighted substring candidates, concentrate probability by
    Viterbi-EM over the distinct-word table, prune to the target
    size.  Output: (piece, logp) for the final vocabulary.

    No SQL oracle (iterative EM; the rows-only check applies) — the
    encode half's value oracle is `unigram_lm_char_boundary`, and the
    convergence/segmentation properties are pytest-planted
    (whole-word concentration, char-degeneracy, determinism gate)."""
    from kg_etl_spark.operators.unigram_lm import unigram_lm_train

    docs = read_table(spark, sf_dir, "documents")
    vocab = unigram_lm_train(
        docs, vocab_size=64, seed_size=400, n_iters=2, max_piece_len=6
    )
    return spark.createDataFrame(
        [(p, round(lp, 6)) for p, lp in vocab], "piece string, logp double"
    )


QUERIES["unigram_lm_vocab"] = q_unigram_lm_vocab  # rows-only by design


def q_unigram_lm_char_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted-provable oracle of the unigram-LM ENCODE plumbing (the
    bpe_encode pattern): with a single-characters-only vocabulary the
    Viterbi segmentation provably degenerates to characters (any
    multi-char path would need pieces the vocab lacks), so n_pieces ==
    total characters of all words — SQL-expressible, full value-hash
    oracle over the explode → mapInPandas-over-vocab → unhinted
    re-join → per-doc aggregate pipeline."""
    from kg_etl_spark.operators.unigram_lm import (
        _word_counts,
        unigram_lm_encode,
        unigram_lm_train,
    )

    docs = read_table(spark, sf_dir, "documents")
    # seed_size=0, n_iters=0 -> vocabulary = exactly the corpus's
    # single characters (uniform logp); train and encode share ONE
    # materialized distinct-word table (the encode side otherwise pays
    # a second full corpus tokenize + distinct exchange)
    wc = _word_counts(docs, "text")
    vocab = unigram_lm_train(
        docs, vocab_size=0, seed_size=0, n_iters=0, word_counts=wc
    )
    return (
        unigram_lm_encode(docs, vocab, words=wc)
        .select("doc_id", "n_words", "n_pieces")
        .orderBy("doc_id")
    )


ORACLE_UNIGRAM_LM_CHARS = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
w AS (SELECT doc_id, unnest(toks) AS tok FROM t)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(len(tok)) AS BIGINT) AS n_pieces
FROM w GROUP BY doc_id
"""

QUERIES["unigram_lm_char_boundary"] = q_unigram_lm_char_boundary
ORACLES["unigram_lm_char_boundary"] = ORACLE_UNIGRAM_LM_CHARS


# --- Dedup threshold-sweep curve (round 11) -----------------------------


def q_dedup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-selection curve for near-dup dedup: one verified
    Jaccard pair stream at the lowest candidate threshold (0.5),
    bucketed into 0.1-wide similarity bands, with the cumulative pair
    count at-or-above each band — i.e. "how many pairs would a dedup
    run at threshold t act on", the curve a curation engineer reads
    before picking t (the filter_yield_curve sibling for dedup). Band
    assignment floor(jaccard·10) runs on the 6dp-rounded jaccard both
    engines already agree on bit-for-bit.

    100 TB shape: rides the size-adaptive pair generator (plain
    inverted index below 100k docs, prefix ssjoin above — the
    doc_dup_groups dispatch); the band rollup is ONE ≤6-row aggregate
    and the cumulative is a higher-order fold over the collected band
    array — no window, no second pass over the pair stream."""
    from kg_etl_spark.operators.dedup import ngram_jaccard_pairs_adaptive

    docs = read_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs_adaptive(docs, "doc_id", n=3, threshold=0.5)
    bands = pairs.groupBy(
        F.floor(F.col("jaccard") * 10.0).cast("long").alias("db")
    ).agg(F.count(F.lit(1)).alias("n_pairs"))
    one = bands.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("db"), F.col("n_pairs").alias("n")))
        ).alias("arr")
    )
    return (
        one.select(
            F.explode(
                F.transform(
                    F.col("arr"),
                    lambda s: F.struct(
                        s["db"].alias("db"),
                        s["n"].alias("n_pairs"),
                        F.aggregate(
                            F.filter(
                                F.col("arr"), lambda x: x["db"] >= s["db"]
                            ),
                            F.lit(0).cast("long"),
                            lambda acc, x: acc + x["n"],
                        ).alias("cum_pairs"),
                    ),
                )
            ).alias("s")
        )
        .select(
            (F.col("s.db").cast("double") / 10.0).alias("band"),
            F.col("s.n_pairs").alias("n_pairs"),
            F.col("s.cum_pairs").alias("cum_pairs"),
        )
        .orderBy("band")
    )


ORACLE_DEDUP_CURVE = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
s AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
  FROM t WHERE len(toks) >= 3
),
p AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         len(list_intersect(a.sh, b.sh)) AS n_common,
         len(a.sh) AS a_sz, len(b.sh) AS b_sz
  FROM s a JOIN s b ON a.doc_id < b.doc_id
),
j AS (
  SELECT ROUND(CAST(n_common AS DOUBLE) / (a_sz + b_sz - n_common), 6) AS jac
  FROM p
  WHERE n_common > 0
    AND CAST(n_common AS DOUBLE) / (a_sz + b_sz - n_common) >= 0.5
),
bands AS (
  SELECT CAST(FLOOR(jac * 10.0) AS BIGINT) AS db, COUNT(*) AS n_pairs
  FROM j GROUP BY 1
)
SELECT CAST(b.db AS DOUBLE) / 10.0 AS band,
       CAST(b.n_pairs AS BIGINT) AS n_pairs,
       CAST((SELECT SUM(b2.n_pairs) FROM bands b2 WHERE b2.db >= b.db) AS BIGINT) AS cum_pairs
FROM bands b ORDER BY band
"""

QUERIES["dedup_threshold_curve"] = q_dedup_threshold_curve
ORACLES["dedup_threshold_curve"] = ORACLE_DEDUP_CURVE


# --- Corpus novelty / duplication provenance (round 11) -----------------


def q_ngram_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novel-trigram curve by corpus decile: split the corpus into 10
    contiguous doc-id buckets (ingestion order) and report, per
    bucket, how many distinct word 3-grams it contains and what
    fraction of them FIRST appear there — the saturation curve that
    tells a data-acquisition team when new crawl slices stop adding
    novel text (the corpus twin of vocab_growth_curve, at shingle
    grain with a first-seen attribution).

    100 TB shape: ONE shingle-keyed shuffle (collect_set of the ≤10
    bucket ids per shingle, deduped map-side by partial aggregation)
    + a 10-row rollup; the bucket bound is an integer division against
    the 1-row max-id broadcast scalar. Nothing quadratic, no window."""
    from kg_etl_spark.functions.text import word_shingles

    docs = read_table(spark, sf_dir, "documents")
    mx = docs.agg(F.max("doc_id").alias("mx"))
    b = (F.col("doc_id") * 10 / (F.col("mx") + 1)).cast("long").alias("b")
    # ONE corpus exchange: collect the (≤10-element) bucket set per
    # shingle straight off the raw explode — partial aggregation
    # dedups map-side, so this subsumes the former distinct + eager
    # cut + two cut scans + bucket join. n_distinct(b) = #shingles
    # whose set contains b; a shingle is novel in its set's minimum
    # bucket — same values as the old per-bucket/first-seen pair.
    g = (
        docs.crossJoin(F.broadcast(mx))
        # tokenize once per row (see span_df_histogram: an inline
        # ws_tokens is re-inlined 2n+1 times into the shingle generator)
        .select(b, ws_tokens(F.col("text")).alias("_toks"))
        .select("b", F.explode(word_shingles(F.col("_toks"), 3)).alias("s"))
        .groupBy("s")
        .agg(F.collect_set("b").alias("bs"))
    )
    return (
        g.select(F.array_min("bs").alias("mb"), F.explode("bs").alias("b"))
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(
                F.when(F.col("b") == F.col("mb"), F.lit(1)).otherwise(F.lit(0))
            ).alias("n_novel"),
        )
        .select(
            F.col("b").alias("bucket"),
            "n_distinct",
            "n_novel",
            F.round(
                F.col("n_novel").cast("double") / F.col("n_distinct").cast("double"),
                6,
            ).alias("novelty_rate"),
        )
        .orderBy("bucket")
    )


ORACLE_NOVELTY = f"""
WITH mx AS (SELECT MAX(doc_id) AS mx FROM documents),
t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
pres AS (
  SELECT DISTINCT CAST(FLOOR(d.doc_id * 10.0 / (mx.mx + 1)) AS BIGINT) AS b, s.s
  FROM t d CROSS JOIN mx,
       unnest(list_transform(range(1, len(d.toks) - 1),
              i -> d.toks[i] || ' ' || d.toks[i+1] || ' ' || d.toks[i+2])) AS s(s)
  WHERE len(d.toks) >= 3
), per_bucket AS (
  SELECT b, COUNT(*) AS n_distinct FROM pres GROUP BY b
), novel AS (
  SELECT b, COUNT(*) AS n_novel
  FROM (SELECT s, MIN(b) AS b FROM pres GROUP BY s) GROUP BY b
)
SELECT p.b AS bucket, CAST(p.n_distinct AS BIGINT) AS n_distinct,
       CAST(COALESCE(n.n_novel, 0) AS BIGINT) AS n_novel,
       ROUND(CAST(COALESCE(n.n_novel, 0) AS DOUBLE) / p.n_distinct, 6) AS novelty_rate
FROM per_bucket p LEFT JOIN novel n ON p.b = n.b
ORDER BY bucket
"""

QUERIES["ngram_novelty_curve"] = q_ngram_novelty_curve
ORACLES["ngram_novelty_curve"] = ORACLE_NOVELTY


def q_dup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate cluster-size histogram: per cluster size s, how
    many normalized-fingerprint clusters have exactly s members, how
    many documents they hold, and how many a keep-one dedup would
    remove — the one-glance duplication profile (is duplication a few
    mega-clusters or a long tail of pairs?) that sizes the win before
    running the dedup itself.

    The synthetic corpus is dup-free by construction, so the query
    PLANTS its duplication (the flagship's footer pattern): every 5th
    document is re-issued once and every 15th once more — expected
    cluster sizes 1, 2 and 3 with exactly known counts, making the
    oracle value-bearing instead of a single all-singletons row.

    100 TB shape: two hash aggregates (fingerprint → size →
    histogram), both map-side combined; output ≤ max cluster size."""
    from kg_etl_spark.operators.dedup import normalized_fingerprint

    base = read_table(spark, sf_dir, "documents")
    docs = (
        base.select("text")
        .unionAll(base.filter(F.col("doc_id") % 5 == 0).select("text"))
        .unionAll(base.filter(F.col("doc_id") % 15 == 0).select("text"))
    )
    sizes = docs.groupBy(
        normalized_fingerprint(F.col("text")).alias("fp")
    ).agg(F.count(F.lit(1)).alias("s"))
    return (
        sizes.groupBy("s")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            F.col("s").alias("cluster_size"),
            "n_clusters",
            (F.col("s") * F.col("n_clusters")).alias("n_docs"),
            ((F.col("s") - 1) * F.col("n_clusters")).alias("n_removable"),
        )
        .orderBy("cluster_size")
    )


ORACLE_DUP_HISTOGRAM = """
WITH corpus AS (
  SELECT text FROM documents
  UNION ALL SELECT text FROM documents WHERE doc_id % 5 = 0
  UNION ALL SELECT text FROM documents WHERE doc_id % 15 = 0
), sizes AS (
  SELECT md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp,
         COUNT(*) AS s
  FROM corpus GROUP BY 1
)
SELECT CAST(s AS BIGINT) AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(s * COUNT(*) AS BIGINT) AS n_docs,
       CAST((s - 1) * COUNT(*) AS BIGINT) AS n_removable
FROM sizes GROUP BY s ORDER BY cluster_size
"""

QUERIES["dup_cluster_size_histogram"] = q_dup_cluster_size_histogram
ORACLES["dup_cluster_size_histogram"] = ORACLE_DUP_HISTOGRAM


def q_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-overlap matrix on exact-dedup fingerprints:
    for every source pair, the count of normalized fingerprints both
    contain and their fingerprint-set Jaccard — the provenance view
    of cross-source duplication (which feeds license auditing and
    "drop the mirror, keep the original" curation calls;
    `dup_span_source_attribution` is the span-grain sibling).

    100 TB shape: one (source, fp) distinct, one fp-keyed self-join
    whose per-key fan-out is bounded by |sources| (≤ S² rows per
    fingerprint), and ≤ S² output rows; per-source set sizes attach
    via unhinted model-sized joins.

    The synthetic corpus has no cross-source duplication, so the
    query PLANTS a partial mirror: every 4th document re-enters under
    source 'mirror' — every real source then overlaps 'mirror' on
    exactly its doc_id%4==0 fingerprints, and real-source pairs stay
    at zero overlap (asserting the ABSENCE of organic cross-source
    dups is part of the contract)."""
    from kg_etl_spark.operators.dedup import normalized_fingerprint

    base = read_table(spark, sf_dir, "documents")
    docs = base.select("source", "text").unionAll(
        base.filter(F.col("doc_id") % 4 == 0).select(
            F.lit("mirror").alias("source"), "text"
        )
    )
    sfp = docs.select(
        "source", normalized_fingerprint(F.col("text")).alias("fp")
    ).distinct().lineage_cut(eager=True)
    sizes = sfp.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    pairs = (
        sfp.alias("a")
        .join(sfp.alias("b"), "fp")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    na = sizes.select(F.col("source").alias("src_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("source").alias("src_b"), F.col("n").alias("nb"))
    return (
        pairs.join(na, "src_a")
        .join(nb, "src_b")
        .select(
            "src_a",
            "src_b",
            "n_shared",
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_shared")).cast("double"),
                6,
            ).alias("fp_jaccard"),
        )
        .orderBy("src_a", "src_b")
    )


ORACLE_SOURCE_OVERLAP = """
WITH corpus AS (
  SELECT source, text FROM documents
  UNION ALL SELECT 'mirror' AS source, text FROM documents WHERE doc_id % 4 = 0
), sfp AS (
  SELECT DISTINCT source,
         md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
  FROM corpus
), sizes AS (SELECT source, COUNT(*) AS n FROM sfp GROUP BY source),
pairs AS (
  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_shared
  FROM sfp a JOIN sfp b ON a.fp = b.fp AND a.source < b.source
  GROUP BY 1, 2
)
SELECT p.src_a, p.src_b, CAST(p.n_shared AS BIGINT) AS n_shared,
       ROUND(CAST(p.n_shared AS DOUBLE) / (sa.n + sb.n - p.n_shared), 6) AS fp_jaccard
FROM pairs p JOIN sizes sa ON p.src_a = sa.source
             JOIN sizes sb ON p.src_b = sb.source
ORDER BY src_a, src_b
"""

QUERIES["source_overlap_matrix"] = q_source_overlap_matrix
ORACLES["source_overlap_matrix"] = ORACLE_SOURCE_OVERLAP
