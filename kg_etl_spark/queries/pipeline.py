"""Training-data pipeline catalog over `documents`: PII redaction,
deterministic splits/samples, domain quota mixing, repetition stats,
benchmark contamination.

Sampling/splitting uses Knuth multiplicative hashing on doc_id — pure
BIGINT arithmetic, bit-identical in Spark and DuckDB (no rand()), so
every query here has a full value-hash oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kg_etl_spark.operators.datapipe import (
    _KNUTH_A,
    _M32,
    benchmark_contamination,
    quota_sample,
    redact_pii,
    repetition_stats,
    stratified_sample,
    train_val_test_split,
    weighted_sample,
)
from kg_etl_spark.session import read_table

_BUCKET_SQL = f"(doc_id * {_KNUTH_A}) % {_M32} % 100"

_PII_TAIL = " contact bob@example.com or +1 555-123-4567"


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plant a deterministic PII tail on every 7th doc, then redact;
    checks masking and per-doc counts."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(_PII_TAIL)))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    red = redact_pii(docs)
    return red.select("doc_id", F.col("text").alias("redacted"), "n_emails", "n_phones")


ORACLE_PII = f"""
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || '{_PII_TAIL}' ELSE text END AS text
  FROM documents
)
SELECT doc_id,
       regexp_replace(
         regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
         '\\+?\\d{{3}}[- ]\\d{{3}}[- ]\\d{{4}}', '<PHONE>', 'g') AS redacted,
       len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS n_emails,
       len(regexp_extract_all(text, '\\+?\\d{{3}}[- ]\\d{{3}}[- ]\\d{{4}}')) AS n_phones
FROM planted
"""


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable train/val/test assignment + per-split counts."""
    docs = read_table(spark, sf_dir, "documents")
    return (
        train_val_test_split(docs)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


ORACLE_SPLIT = f"""
SELECT CASE WHEN {_BUCKET_SQL} < 10 THEN 'test'
            WHEN {_BUCKET_SQL} < 20 THEN 'val'
            ELSE 'train' END AS split,
       COUNT(*) AS n_docs
FROM documents GROUP BY 1
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~20% deterministic sample, proportional within each lang."""
    docs = read_table(spark, sf_dir, "documents")
    samp = stratified_sample(docs, "lang", pct=20)
    return samp.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"), F.sum("doc_id").alias("id_sum")
    )


ORACLE_STRATIFIED = f"""
SELECT lang, COUNT(*) AS n_sampled, CAST(SUM(doc_id) AS BIGINT) AS id_sum
FROM documents WHERE {_BUCKET_SQL} < 20 GROUP BY lang
"""


_QUOTA = 15


def q_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixing: cap every source at _QUOTA docs, hash-ordered."""
    docs = read_table(spark, sf_dir, "documents")
    return quota_sample(docs, "source", quota=_QUOTA).select("doc_id", "source")


ORACLE_QUOTA = f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY (doc_id * {_KNUTH_A}) % {_M32} ASC, doc_id ASC
         ) AS rn
  FROM documents
) WHERE rn <= {_QUOTA}
"""


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition features per doc."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return repetition_stats(docs).select("doc_id", "dup_trigram_frac", "top_word_frac")


# DuckDB mirror: same whitespace tokens, word trigrams via range() list
# comprehension, top token share via unnest + max count.
ORACLE_REPETITION = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> len(t) > 0) AS tk
  FROM documents
), tri AS (
  SELECT doc_id, tk,
         list_transform(range(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) AS tg
  FROM toks
), dup AS (
  SELECT doc_id,
         CASE WHEN len(tg) > 0
              THEN ROUND(1.0 - CAST(len(list_distinct(tg)) AS DOUBLE) / len(tg), 6)
              ELSE 0.0 END AS dup_trigram_frac
  FROM tri
), flat AS (
  SELECT doc_id, unnest(tk) AS tok FROM toks
), top AS (
  SELECT doc_id, MAX(c) AS topc FROM (
    SELECT doc_id, tok, COUNT(*) AS c FROM flat GROUP BY doc_id, tok
  ) GROUP BY doc_id
)
SELECT toks.doc_id AS doc_id, dup.dup_trigram_frac,
       CASE WHEN len(toks.tk) > 0
            THEN ROUND(CAST(COALESCE(top.topc, 0) AS DOUBLE) / len(toks.tk), 6)
            ELSE 0.0 END AS top_word_frac
FROM toks JOIN dup ON toks.doc_id = dup.doc_id
LEFT JOIN top ON toks.doc_id = top.doc_id
"""

_N_BENCH = 5
_PLANT_EVERY = 97
_PROBE_CHARS = 50


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination sweep: benchmark = docs 0..4; every 97th corpus
    doc gets a planted probe suffix; the operator must flag exactly the
    planted (and any organic) containments."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") < _N_BENCH).select(
        F.col("doc_id").alias("bench_id"),
        F.substring("text", 1, _PROBE_CHARS).alias("probe_text"),
    )
    corpus = (
        docs.filter(F.col("doc_id") >= _N_BENCH)
        .withColumn("_b", F.col("doc_id") % _PLANT_EVERY)
        .join(
            F.broadcast(bench.withColumnRenamed("bench_id", "_b")),
            "_b",
            "left",
        )
        .select(
            "doc_id",
            F.when(
                (F.col("doc_id") % _PLANT_EVERY < _N_BENCH) & F.col("probe_text").isNotNull(),
                F.concat(F.col("text"), F.lit(" "), F.col("probe_text")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    bench_full = docs.filter(F.col("doc_id") < _N_BENCH).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    return benchmark_contamination(
        corpus, bench_full, probe_chars=_PROBE_CHARS
    ).select("doc_id", "bench_id")


ORACLE_CONTAMINATION = f"""
WITH bench AS (
  SELECT doc_id AS bench_id, text, substr(text, 1, {_PROBE_CHARS}) AS probe
  FROM documents WHERE doc_id < {_N_BENCH}
), corpus AS (
  SELECT c.doc_id,
         CASE WHEN c.doc_id % {_PLANT_EVERY} < {_N_BENCH}
              THEN c.text || ' ' || (SELECT probe FROM bench b WHERE b.bench_id = c.doc_id % {_PLANT_EVERY})
              ELSE c.text END AS text
  FROM documents c WHERE c.doc_id >= {_N_BENCH}
)
SELECT corpus.doc_id, bench.bench_id
FROM corpus, bench
WHERE position(bench.probe IN corpus.text) > 0
"""

_NG_N = 13
_NG_PLANT_TOKENS = 16


def _planted_contaminated(spark: SparkSession, sf_dir: str):
    """(corpus, bench) with known contamination: benchmark = docs 0..4;
    every 97th corpus doc gets a 16-token span copied from its matching
    benchmark doc, so a sweep must flag those pairs (plus any organic
    13-gram overlaps, e.g. exact duplicates)."""
    from kg_etl_spark.operators.textquality import ws_tokens

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") < _N_BENCH)
    probes = bench.select(
        F.col("doc_id").alias("_b"),
        F.array_join(F.slice(ws_tokens(F.col("text")), 1, _NG_PLANT_TOKENS), " ").alias("_probe"),
    )
    corpus = (
        docs.filter(F.col("doc_id") >= _N_BENCH)
        .withColumn("_b", F.col("doc_id") % _PLANT_EVERY)
        .join(F.broadcast(probes), "_b", "left")
        .select(
            "doc_id",
            F.when(
                (F.col("doc_id") % _PLANT_EVERY < _N_BENCH) & F.col("_probe").isNotNull(),
                F.concat(F.col("text"), F.lit(" "), F.col("_probe")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    return corpus, bench.select(F.col("doc_id").alias("bench_id"), "text")


def q_ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3-style 13-gram decontamination over the planted corpus."""
    from kg_etl_spark.operators.datapipe import ngram_contamination

    corpus, bench = _planted_contaminated(spark, sf_dir)
    return ngram_contamination(corpus, bench, n=_NG_N)


def q_bloom_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same sweep through the native Bloom prefilter (map-side
    bitmap probe, exact verify on survivors) — output bit-identical to
    `ngram_contamination`, so it shares ORACLE_NGRAM_CONTAMINATION."""
    from kg_etl_spark.operators.datapipe import bloom_ngram_contamination

    corpus, bench = _planted_contaminated(spark, sf_dir)
    return bloom_ngram_contamination(
        corpus, bench, n=_NG_N, m_bits=1 << 16, n_probes=4
    )


ORACLE_NGRAM_CONTAMINATION = f"""
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> len(x) > 0) AS t
  FROM documents
), bench_probe AS (
  SELECT doc_id AS b, array_to_string(t[1 : {_NG_PLANT_TOKENS}], ' ') AS probe
  FROM tk WHERE doc_id < {_N_BENCH}
), corpus AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % {_PLANT_EVERY} < {_N_BENCH}
              THEN d.text || ' ' || (SELECT probe FROM bench_probe p WHERE p.b = d.doc_id % {_PLANT_EVERY})
              ELSE d.text END AS text
  FROM documents d WHERE d.doc_id >= {_N_BENCH}
), ctk AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> len(x) > 0) AS t
  FROM corpus
), cgrams AS (
  SELECT doc_id, unnest(list_distinct(
    list_transform(range(1, greatest(len(t) - {_NG_N - 2}, 1)),
                   i -> array_to_string(t[i : i + {_NG_N - 1}], ' ')))) AS gram
  FROM ctk
), bgrams AS (
  SELECT doc_id AS bench_id, unnest(list_distinct(
    list_transform(range(1, greatest(len(t) - {_NG_N - 2}, 1)),
                   i -> array_to_string(t[i : i + {_NG_N - 1}], ' ')))) AS gram
  FROM tk WHERE doc_id < {_N_BENCH}
)
SELECT c.doc_id, b.bench_id, COUNT(DISTINCT c.gram) AS n_shared
FROM cgrams c JOIN bgrams b USING (gram)
GROUP BY c.doc_id, b.bench_id
HAVING COUNT(DISTINCT c.gram) >= 1
"""


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights with target = the English slice
    (operators/datapipe.py `dsir_weights`, exact string-feature mode —
    the hashed-bucket scale mode is unit-tested for consistency)."""
    from kg_etl_spark.operators.datapipe import dsir_weights

    docs = read_table(spark, sf_dir, "documents")
    return dsir_weights(docs, is_target=F.col("lang") == "en")


ORACLE_DSIR = """
WITH tk AS (
  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS t,
         list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> len(x) > 0) AS w
  FROM documents
), feats AS (
  SELECT doc_id, t, unnest(list_concat(
    w, list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
  )) AS g
  FROM tk
), counts AS (
  SELECT g, COUNT(*) AS cr, CAST(SUM(t) AS BIGINT) AS ct FROM feats GROUP BY g
), tot AS (
  SELECT CAST(SUM(cr) AS BIGINT) AS nr, CAST(SUM(ct) AS BIGINT) AS nt,
         COUNT(*) AS v
  FROM counts
), ratios AS (
  SELECT g,
         CAST(ROUND(LN(CAST(ct + 1 AS DOUBLE) / CAST(nt + v AS DOUBLE))
                  - LN(CAST(cr + 1 AS DOUBLE) / CAST(nr + v AS DOUBLE)), 6)
              AS DECIMAL(28,6)) AS lr
  FROM counts, tot
)
SELECT f.doc_id, COUNT(*) AS n_feats,
       ROUND(CAST(SUM(r.lr) AS DOUBLE), 6) AS dsir_weight
FROM feats f JOIN ratios r USING (g)
GROUP BY f.doc_id
"""


def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card rollup: per (split, lang) document and token totals
    plus each cell's share of the corpus — the summary table a training
    run's data config is written from. One map-side split/token pass,
    one aggregate; the share denominator is a 1-row broadcast window
    over the (tiny) aggregate, never a corpus re-scan."""
    from kg_etl_spark.operators.textquality import token_count

    docs = read_table(spark, sf_dir, "documents")
    per = (
        train_val_test_split(docs)
        .withColumn("_nt", token_count(F.col("text")))
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_nt").alias("total_tokens"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy()
    return per.select(
        "split",
        "lang",
        "n_docs",
        "total_tokens",
        F.round(F.col("n_docs").cast("double") / F.sum("n_docs").over(w), 6).alias("doc_share"),
        F.round(
            F.col("total_tokens").cast("double") / F.sum("total_tokens").over(w), 6
        ).alias("token_share"),
    )


ORACLE_DATASET_CARD = f"""
WITH t AS (
  SELECT CASE WHEN {_BUCKET_SQL} < 10 THEN 'test'
              WHEN {_BUCKET_SQL} < 20 THEN 'val'
              ELSE 'train' END AS split,
         lang,
         len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> length(x) > 0)) AS nt
  FROM documents
), per AS (
  SELECT split, lang, COUNT(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS total_tokens
  FROM t GROUP BY split, lang
)
SELECT split, lang, n_docs, total_tokens,
       ROUND(CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (), 6) AS doc_share,
       ROUND(CAST(total_tokens AS DOUBLE) / SUM(total_tokens) OVER (), 6) AS token_share
FROM per
"""

_FUNNEL_MIN_TOKENS = 8
_FUNNEL_MIN_QUALITY = 0.5
_FUNNEL_MAX_DUP = 0.2


def q_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-funnel observability: ONE pass over the corpus emitting a
    single row of per-rule rejection counts (too short / low quality /
    repetitive) and the survivor count — the report a pipeline owner
    reads before committing thresholds. All rules evaluate as
    conditional aggregates in the same plan, so adding a rule costs an
    expression, not a scan."""
    from kg_etl_spark.operators.textquality import quality_features

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    feats = repetition_stats(quality_features(docs))
    short = F.col("n_tokens") < _FUNNEL_MIN_TOKENS
    lowq = F.col("quality_score") < _FUNNEL_MIN_QUALITY
    rep = F.col("dup_trigram_frac") > _FUNNEL_MAX_DUP
    return feats.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(short.cast("long")).alias("n_short"),
        F.sum(lowq.cast("long")).alias("n_low_quality"),
        F.sum(rep.cast("long")).alias("n_repetitive"),
        F.sum((~short & ~lowq & ~rep).cast("long")).alias("n_survivors"),
    )


ORACLE_FILTER_FUNNEL = f"""
WITH q AS ({{_QUALITY_SQL}}),
scored AS (
  SELECT doc_id, text, n_tokens,
         least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0) * 0.4
         + (1.0 - least(punct_ratio * 4.0, 1.0)) * 0.3
         + least(CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END * 5.0, 1.0) * 0.3
           AS quality_score
  FROM q
), toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> len(t) > 0) AS tk
  FROM documents
), tri AS (
  SELECT doc_id,
         list_transform(range(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) AS tg
  FROM toks
), dup AS (
  SELECT doc_id,
         CASE WHEN len(tg) > 0
              THEN ROUND(1.0 - CAST(len(list_distinct(tg)) AS DOUBLE) / len(tg), 6)
              ELSE 0.0 END AS dup_frac
  FROM tri
)
SELECT COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN s.n_tokens < {_FUNNEL_MIN_TOKENS} THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
       CAST(SUM(CASE WHEN ROUND(s.quality_score, 6) < {_FUNNEL_MIN_QUALITY} THEN 1 ELSE 0 END) AS BIGINT) AS n_low_quality,
       CAST(SUM(CASE WHEN d.dup_frac > {_FUNNEL_MAX_DUP} THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive,
       CAST(SUM(CASE WHEN s.n_tokens >= {_FUNNEL_MIN_TOKENS}
                 AND ROUND(s.quality_score, 6) >= {_FUNNEL_MIN_QUALITY}
                 AND d.dup_frac <= {_FUNNEL_MAX_DUP} THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors
FROM scored s JOIN dup d ON s.doc_id = d.doc_id
"""


_MIN_QUALITY = 0.5


def q_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship composition: the end-to-end corpus-prep DAG as ONE
    Catalyst plan — quality gate → exact dedup (keep min-id doc per
    normalized fingerprint) → deterministic split → per-(split, lang)
    counts. Everything before the dedup groupBy is map-side; the dedup
    shuffle and the final count aggregate are the only exchanges."""
    from kg_etl_spark.operators.dedup import normalized_fingerprint
    from kg_etl_spark.operators.textquality import quality_features

    docs = read_table(spark, sf_dir, "documents")
    good = quality_features(docs).filter(F.col("quality_score") >= _MIN_QUALITY)
    keep = (
        good.withColumn("fp", normalized_fingerprint(F.col("text")))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        # lang re-attached by joining the keeper ids back (deterministic,
        # unlike first() over a grouped agg)
        .join(docs.select("doc_id", "lang"), "doc_id")
    )
    return (
        train_val_test_split(keep)
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("doc_id").alias("id_sum"))
    )


_QUALITY_SQL = """
  SELECT doc_id, lang, text,
         len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> len(t) > 0)) AS n_tokens,
         CASE WHEN length(text) > 0
              THEN CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE) / length(text)
              ELSE 0.0 END AS punct_ratio,
         len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
             t -> list_contains(['the','a','an','and','or','of','in','on','at','to','is'], t))) AS n_stop
  FROM documents
"""

# _QUALITY_SQL is defined below the funnel oracle's textual position;
# splice it in now that it exists
ORACLE_FILTER_FUNNEL = ORACLE_FILTER_FUNNEL.replace("{_QUALITY_SQL}", _QUALITY_SQL)

ORACLE_CORPUS_PREP = f"""
WITH q AS ({_QUALITY_SQL}),
scored AS (
  SELECT doc_id, lang, text,
         least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0) * 0.4
         + (1.0 - least(punct_ratio * 4.0, 1.0)) * 0.3
         + least(CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END * 5.0, 1.0) * 0.3
           AS quality_score
  FROM q
),
good AS (SELECT * FROM scored WHERE ROUND(quality_score, 6) >= {_MIN_QUALITY}),
keep AS (
  SELECT MIN(doc_id) AS doc_id
  FROM good GROUP BY md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
),
split AS (
  SELECT k.doc_id, d.lang,
         CASE WHEN {_BUCKET_SQL.replace('doc_id', 'k.doc_id')} < 10 THEN 'test'
              WHEN {_BUCKET_SQL.replace('doc_id', 'k.doc_id')} < 20 THEN 'val'
              ELSE 'train' END AS split
  FROM keep k JOIN documents d ON k.doc_id = d.doc_id
)
SELECT split, lang, COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS id_sum
FROM split GROUP BY split, lang
"""


_WS_K = 50


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted corpus sample (A-ES): longer documents enter the
    sample proportionally more often, deterministically."""
    docs = read_table(spark, sf_dir, "documents")
    return weighted_sample(docs, "n_chars", k=_WS_K).select(
        "doc_id", "n_chars", F.round("sample_key", 6).alias("sample_key")
    )


ORACLE_WEIGHTED_SAMPLE = f"""
SELECT doc_id, n_chars, ROUND(raw_key, 6) AS sample_key FROM (
  SELECT doc_id, n_chars,
         ln(CAST((doc_id * {_KNUTH_A}) % {_M32} + 1 AS DOUBLE) / {float(_M32 + 1)})
           / CAST(n_chars AS DOUBLE) AS raw_key
  FROM documents WHERE n_chars > 0
) ORDER BY raw_key DESC, doc_id ASC LIMIT {_WS_K}
"""


_CHUNK_W, _CHUNK_S = 32, 16


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: overlapping 32-token windows every 16."""
    from kg_etl_spark.operators.packing import chunk_documents

    docs = read_table(spark, sf_dir, "documents")
    return chunk_documents(docs, window=_CHUNK_W, stride=_CHUNK_S)


ORACLE_CHUNK = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> length(x) > 0) AS toks
  FROM documents
), n AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
s AS (SELECT doc_id, toks, n, unnest(range(0, n, {_CHUNK_S})) AS start FROM n)
SELECT doc_id, start // {_CHUNK_S} AS chunk_id,
       array_to_string(toks[start+1 : start+{_CHUNK_W}], ' ') AS chunk_text,
       least({_CHUNK_W}, n - start) AS n_tokens
FROM s
"""

_PACK_CAP = 256


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing manifest into 256-token bins."""
    from kg_etl_spark.operators.packing import pack_concat_chunk

    docs = read_table(spark, sf_dir, "documents")
    return pack_concat_chunk(docs, cap=_PACK_CAP)


ORACLE_PACK = f"""
WITH t AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> length(x) > 0)) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
         CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT) AS cb
  FROM t WHERE n_tokens > 0
)
SELECT doc_id, n_tokens, cb // {_PACK_CAP} AS first_bin,
       (cb + n_tokens - 1) // {_PACK_CAP} AS last_bin,
       cb % {_PACK_CAP} AS offset_in_bin
FROM c
"""

_N_SHARDS = 8


def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle: (shard, position) per document."""
    from kg_etl_spark.operators.packing import shard_manifest

    docs = read_table(spark, sf_dir, "documents")
    return shard_manifest(docs, n_shards=_N_SHARDS)


ORACLE_SHARDS = f"""
SELECT doc_id, h % {_N_SHARDS} AS shard,
       ROW_NUMBER() OVER (PARTITION BY h % {_N_SHARDS} ORDER BY h ASC, doc_id ASC) - 1 AS position
FROM (SELECT doc_id, (doc_id * {_KNUTH_A}) % {_M32} AS h FROM documents)
"""


_BATCH_TOKEN_BUDGET = 4096


def q_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching plan: documents grouped into power-of-two
    token-length buckets (the standard padding-efficiency trick), with
    per-bucket doc/token totals and the number of fixed-token-budget
    batches each bucket yields. floor(log2(n)) is computed as
    LENGTH(bin(n)) - 1 — pure integer arithmetic, identical in both
    engines (a float log2 can round 2^k to k-epsilon and flip the
    floor). Map-side bucket assignment, one aggregate."""
    from kg_etl_spark.operators.textquality import token_count

    docs = read_table(spark, sf_dir, "documents")
    nt = token_count(F.col("text"))
    b = (F.length(F.bin(nt)) - 1).cast("long")
    return (
        docs.select(nt.alias("_nt"), b.alias("bucket"))
        .filter(F.col("_nt") >= 1)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_nt").alias("total_tokens"),
        )
        .select(
            "bucket",
            "n_docs",
            "total_tokens",
            # integer `div`, not float division: exact at any magnitude
            F.expr(
                f"(total_tokens + {_BATCH_TOKEN_BUDGET - 1}) div {_BATCH_TOKEN_BUDGET}"
            ).alias("n_batches"),
        )
    )


ORACLE_LENGTH_BUCKETS = f"""
WITH t AS (
  SELECT len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> length(x) > 0)) AS nt
  FROM documents
)
SELECT LENGTH(bin(nt)) - 1 AS bucket,
       COUNT(*) AS n_docs,
       CAST(SUM(nt) AS BIGINT) AS total_tokens,
       CAST((SUM(nt) + {_BATCH_TOKEN_BUDGET} - 1) // {_BATCH_TOKEN_BUDGET} AS BIGINT) AS n_batches
FROM t WHERE nt >= 1
GROUP BY LENGTH(bin(nt)) - 1
"""


def q_curriculum_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum schedule: i.i.d. hash shards, in-shard order by
    document length (easy→hard proxy), id tie-break."""
    from kg_etl_spark.operators.packing import curriculum_manifest

    docs = read_table(spark, sf_dir, "documents")
    return curriculum_manifest(docs, score_col="n_chars", n_shards=_N_SHARDS)


ORACLE_CURRICULUM = f"""
SELECT doc_id, (doc_id * {_KNUTH_A}) % {_M32} % {_N_SHARDS} AS shard,
       ROW_NUMBER() OVER (PARTITION BY (doc_id * {_KNUTH_A}) % {_M32} % {_N_SHARDS}
                          ORDER BY n_chars ASC, doc_id ASC) - 1 AS position
FROM documents
"""

# Exact powers-of-two weights: every wn_s, n/wn_s, and wn_s*t product is
# exact in IEEE double, so the Spark (driver-python) and DuckDB rate
# arithmetic is bit-identical and no boundary row can flip.
_MIX_WEIGHTS = {"en": 0.5, "de": 0.25, "fr": 0.125, "es": 0.0625, "zh": 0.0625}


def q_dataset_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture balancing: thin languages to 8:4:2:1:1 target
    proportions, keeping the binding language whole; report per-lang
    survivors."""
    from kg_etl_spark.operators.packing import dataset_mixture

    docs = read_table(spark, sf_dir, "documents")
    keep = dataset_mixture(docs, "lang", _MIX_WEIGHTS)
    return keep.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"), F.sum("doc_id").alias("id_sum")
    )


_MIX_CASE = " ".join(
    f"WHEN '{s}' THEN {w!r}" for s, w in sorted(_MIX_WEIGHTS.items())
)

ORACLE_MIXTURE = f"""
WITH w AS (
  SELECT lang, COUNT(*) AS n, CASE lang {_MIX_CASE} END AS wt
  FROM documents GROUP BY lang
), t AS (
  SELECT MIN(n / (wt / 1.0)) AS t_max FROM w WHERE wt IS NOT NULL
), rates AS (
  SELECT w.lang, (w.wt / 1.0) * t.t_max / w.n AS rate FROM w, t WHERE w.wt IS NOT NULL
)
SELECT d.lang, COUNT(*) AS n_kept, CAST(SUM(d.doc_id) AS BIGINT) AS id_sum
FROM documents d JOIN rates r ON d.lang = r.lang
WHERE CAST((d.doc_id * {_KNUTH_A}) % {_M32} AS DOUBLE) < r.rate * {float(_M32)!r}
GROUP BY d.lang
"""


_FOOTER_A = "Subscribe to our newsletter!"
_FOOTER_B = "(c) 2026 Example Corp"


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate removal: plant newsletter/copyright footer
    lines (one behind a blank line) on periodic docs, then cross-doc
    line dedup must strip exactly the lines shared by >= 2 documents
    — planted footers plus any organically duplicated bodies."""
    from kg_etl_spark.operators.datapipe import dedup_lines

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("\n" + _FOOTER_A)).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 == 0, F.lit("\n\n" + _FOOTER_B)).otherwise(F.lit("")),
        ).alias("text"),
    )
    return dedup_lines(docs)


ORACLE_LINE_DEDUP = f"""
WITH planted AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0 THEN chr(10) || '{_FOOTER_A}' ELSE '' END
         || CASE WHEN doc_id % 5 = 0 THEN chr(10) || chr(10) || '{_FOOTER_B}' ELSE '' END AS text
  FROM documents
), split AS (
  SELECT doc_id, string_split(text, chr(10)) AS ls FROM planted
), lines AS (
  SELECT doc_id, idx, ls[idx] AS line
  FROM (SELECT doc_id, ls, unnest(range(1, len(ls) + 1)) AS idx FROM split)
), dup AS (
  SELECT line FROM lines WHERE trim(line) <> ''
  GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 2
), kept AS (
  SELECT l.doc_id, l.idx, l.line FROM lines l
  WHERE trim(l.line) = '' OR NOT EXISTS (SELECT 1 FROM dup d WHERE d.line = l.line)
), rebuilt AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY idx) AS text, COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
), totals AS (
  SELECT doc_id, len(string_split(text, chr(10))) AS n_total FROM planted
)
SELECT t.doc_id, COALESCE(r.text, '') AS text,
       t.n_total - COALESCE(r.n_kept, 0) AS n_removed_lines
FROM totals t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
"""


_E2E_CAP = 256


def q_training_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data story as ONE lazily-composed DAG:
    plant boilerplate → cross-doc line dedup → quality gate → exact
    dedup (min-id keeper per normalized fingerprint) → deterministic
    split → per-split concat-and-chunk packing. Output: one row per
    split with doc/token totals and the packed bin count — the numbers
    a trainer's data config is written from.

    Every stage is a tested operator; Catalyst sees the whole lineage,
    so column pruning flows through all six stages (e.g. the final
    rollup never materializes chunk text)."""
    from kg_etl_spark.operators.datapipe import dedup_lines
    from kg_etl_spark.operators.dedup import normalized_fingerprint
    from kg_etl_spark.operators.packing import pack_concat_chunk
    from kg_etl_spark.operators.textquality import quality_features

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("\n" + _FOOTER_A)).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 == 0, F.lit("\n\n" + _FOOTER_B)).otherwise(F.lit("")),
        ).alias("text"),
    )
    cleaned = dedup_lines(docs).select("doc_id", "text")
    good = quality_features(cleaned).filter(F.col("quality_score") >= _MIN_QUALITY)
    keep = (
        good.withColumn("fp", normalized_fingerprint(F.col("text")))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .join(cleaned, "doc_id")
    )
    # cut the lineage once: the three per-split packs (each with its own
    # bounds/totals actions) would otherwise re-run the whole 6-stage
    # upstream DAG per split (measured 33 Exchanges → 7)
    split = train_val_test_split(keep).lineage_cut()
    out = []
    for name in ("train", "val", "test"):
        part = split.filter(F.col("split") == name)
        manifest = pack_concat_chunk(part, cap=_E2E_CAP)
        out.append(
            manifest.agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tokens").alias("total_tokens"),
                (F.max("last_bin") + 1).alias("n_bins"),
            ).select(F.lit(name).alias("split"), "n_docs", "total_tokens", "n_bins")
        )
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    # empty splits produce (name, 0, NULL, NULL) from the agg; the
    # oracle's GROUP BY omits them — drop to match (the all-boilerplate
    # stress case really does empty splits)
    return res.filter(F.col("n_docs") > 0)


ORACLE_TRAINING_E2E = f"""
WITH planted AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0 THEN chr(10) || '{_FOOTER_A}' ELSE '' END
         || CASE WHEN doc_id % 5 = 0 THEN chr(10) || chr(10) || '{_FOOTER_B}' ELSE '' END AS text
  FROM documents
), split_lines AS (
  SELECT doc_id, string_split(text, chr(10)) AS ls FROM planted
), lines AS (
  SELECT doc_id, idx, ls[idx] AS line
  FROM (SELECT doc_id, ls, unnest(range(1, len(ls) + 1)) AS idx FROM split_lines)
), dupl AS (
  SELECT line FROM lines WHERE trim(line) <> ''
  GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 2
), keptl AS (
  SELECT l.doc_id, l.idx, l.line FROM lines l
  WHERE trim(l.line) = '' OR NOT EXISTS (SELECT 1 FROM dupl d WHERE d.line = l.line)
), rebuilt AS (
  SELECT t.doc_id, COALESCE(r.text, '') AS text
  FROM (SELECT DISTINCT doc_id FROM planted) t
  LEFT JOIN (SELECT doc_id, string_agg(line, chr(10) ORDER BY idx) AS text
             FROM keptl GROUP BY doc_id) r ON t.doc_id = r.doc_id
), q AS (
  SELECT doc_id, text,
         len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> len(t) > 0)) AS n_tokens,
         CASE WHEN length(text) > 0
              THEN CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE) / length(text)
              ELSE 0.0 END AS punct_ratio,
         len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
             t -> list_contains(['the','a','an','and','or','of','in','on','at','to','is'], t))) AS n_stop
  FROM rebuilt
), good AS (
  SELECT doc_id, text FROM q
  WHERE ROUND(least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0) * 0.4
        + (1.0 - least(punct_ratio * 4.0, 1.0)) * 0.3
        + least(CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END * 5.0, 1.0) * 0.3
        , 6) >= {_MIN_QUALITY}
), keep AS (
  SELECT MIN(doc_id) AS doc_id
  FROM good GROUP BY md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
), sized AS (
  SELECT k.doc_id,
         CASE WHEN {_BUCKET_SQL.replace('doc_id', 'k.doc_id')} < 10 THEN 'test'
              WHEN {_BUCKET_SQL.replace('doc_id', 'k.doc_id')} < 20 THEN 'val'
              ELSE 'train' END AS split,
         len(list_filter(string_split_regex(trim(lower(r.text)), '\\s+'), t -> len(t) > 0)) AS nt
  FROM keep k JOIN rebuilt r ON k.doc_id = r.doc_id
)
SELECT split, COUNT(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS total_tokens,
       CAST((SUM(nt) + {_E2E_CAP} - 1) // {_E2E_CAP} AS BIGINT) AS n_bins
FROM sized WHERE nt > 0
GROUP BY split
"""


def q_training_pipeline_tokenized_e2e(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The flagship's sibling with a TOKENIZER stage (r10 verdict
    directive #4): exact dedup (min-id keeper) → quality gate →
    deterministic split → unigram-LM encode → pack by PIECE count —
    the packing cap is now denominated in tokenizer pieces, the unit a
    trainer actually bins by, instead of whitespace words.

    The vocabulary is the chars-degenerate unigram LM (seed_size=0,
    n_iters=0 → exactly the corpus's single characters), so the
    Viterbi piece count per doc provably equals its total word
    characters — the same planted boundary `unigram_lm_char_boundary`
    value-proves — which keeps this composition fully SQL-expressible
    end-to-end while exercising the real encode plumbing (explode →
    mapInPandas over the distinct-word vocab → unhinted re-join →
    per-doc aggregate) INSIDE a six-stage pipeline.  Output: one row
    per split with doc/piece totals and the packed bin count."""
    from kg_etl_spark.operators.dedup import normalized_fingerprint
    from kg_etl_spark.operators.packing import pack_concat_chunk
    from kg_etl_spark.operators.textquality import quality_features
    from kg_etl_spark.operators.unigram_lm import (
        _word_counts,
        unigram_lm_encode,
        unigram_lm_train,
    )

    from concurrent.futures import ThreadPoolExecutor

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    good = quality_features(docs).filter(F.col("quality_score") >= _MIN_QUALITY)

    # tokenizer trained on the RAW corpus (the realistic order: the
    # vocab predates per-run curation); model-sized (|charset| rows).
    # Its charset scan is independent of the curation chain, so it runs
    # on a driver thread while the keep cut materializes — two jobs
    # overlapping instead of back-to-back (the scheduler back-fills the
    # keep job's tail with the scan's tasks).  The RAW distinct-word
    # cut it builds doubles as the encode's Viterbi side below (a
    # superset of keep's words — the inner re-attach join drops the
    # rest), so the encode never re-tokenizes the curated corpus.
    def _train_with_words():
        wc = _word_counts(docs, "text")
        return wc, unigram_lm_train(
            docs, vocab_size=0, seed_size=0, n_iters=0, word_counts=wc
        )

    with ThreadPoolExecutor(max_workers=1) as trainer:
        train_fut = trainer.submit(_train_with_words)
        # cut once: the encode's token-stream join probe and the doc_id
        # re-join below would each re-run the whole quality+dedup
        # subtree otherwise
        keep = (
            good.withColumn("fp", normalized_fingerprint(F.col("text")))
            .groupBy("fp")
            .agg(F.min("doc_id").alias("doc_id"))
            .join(docs, "doc_id")
            .select("doc_id", "text")
            .lineage_cut(eager=True)
        )
        words, vocab = train_fut.result()
    enc = unigram_lm_encode(keep, vocab, words=words).select(
        "doc_id", "n_pieces"
    )
    # cut once: three per-split packs each run bounds/totals actions
    # that would otherwise re-execute dedup + encode per split (the
    # flagship's measured 33→7 Exchange lesson)
    split = train_val_test_split(keep.join(enc, "doc_id")).lineage_cut()

    def _pack(name: str) -> DataFrame:
        part = split.filter(F.col("split") == name)
        manifest = pack_concat_chunk(part, cap=_E2E_CAP, count_col="n_pieces")
        return manifest.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_pieces"),
            (F.max("last_bin") + 1).alias("n_bins"),
        ).select(
            F.lit(name).alias("split"), "n_docs", "total_pieces", "n_bins"
        )

    # the three splits' packing plans are independent (each runs its own
    # bounds/totals actions over the SAME materialized cut): build them
    # concurrently so the six small driver-collect jobs overlap instead
    # of serializing (guide-§2.6 back-fill; result order is pinned by
    # the map order, not completion order)
    with ThreadPoolExecutor(max_workers=3) as pool:
        out = list(pool.map(_pack, ("train", "val", "test")))
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res.filter(F.col("n_docs") > 0)


ORACLE_TRAINING_TOKENIZED = f"""
WITH q AS (
  SELECT doc_id, text,
         len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> len(t) > 0)) AS n_tokens,
         CASE WHEN length(text) > 0
              THEN CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE) / length(text)
              ELSE 0.0 END AS punct_ratio,
         len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
             t -> list_contains(['the','a','an','and','or','of','in','on','at','to','is'], t))) AS n_stop
  FROM documents
), good AS (
  SELECT doc_id, text FROM q
  WHERE ROUND(least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0) * 0.4
        + (1.0 - least(punct_ratio * 4.0, 1.0)) * 0.3
        + least(CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END * 5.0, 1.0) * 0.3
        , 6) >= {_MIN_QUALITY}
), keep AS (
  SELECT MIN(doc_id) AS doc_id
  FROM good GROUP BY md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
), pieces AS (
  SELECT k.doc_id,
         (SELECT COALESCE(SUM(len(tok)), 0)
          FROM unnest(list_filter(string_split_regex(trim(lower(d.text)), '\\s+'),
                                  t -> len(t) > 0)) AS u(tok)) AS np
  FROM keep k JOIN documents d ON k.doc_id = d.doc_id
), sized AS (
  SELECT doc_id,
         CASE WHEN {_BUCKET_SQL} < 10 THEN 'test'
              WHEN {_BUCKET_SQL} < 20 THEN 'val'
              ELSE 'train' END AS split,
         np
  FROM pieces
)
SELECT split, COUNT(*) AS n_docs, CAST(SUM(np) AS BIGINT) AS total_pieces,
       CAST((SUM(np) + {_E2E_CAP} - 1) // {_E2E_CAP} AS BIGINT) AS n_bins
FROM sized WHERE np > 0
GROUP BY split
"""


QUERIES = {
    "corpus_prep": q_corpus_prep,
    "pii_redact": q_pii_redact,
    "hash_split": q_hash_split,
    "stratified_sample": q_stratified_sample,
    "quota_sample": q_quota_sample,
    "repetition_stats": q_repetition_stats,
    "contamination": q_contamination,
    "weighted_sample": q_weighted_sample,
    "chunk_documents": q_chunk_documents,
    "pack_sequences": q_pack_sequences,
    "shard_manifest": q_shard_manifest,
    "curriculum_manifest": q_curriculum_manifest,
    "length_buckets": q_length_buckets,
    "dataset_mixture": q_dataset_mixture,
    "line_dedup": q_line_dedup,
    "ngram_contamination": q_ngram_contamination,
    "bloom_contamination": q_bloom_contamination,
    "dsir_weights": q_dsir_weights,
    "dataset_card": q_dataset_card,
    "filter_funnel": q_filter_funnel,
    "training_pipeline_e2e": q_training_pipeline_e2e,
    "training_pipeline_tokenized_e2e": q_training_pipeline_tokenized_e2e,
}

ORACLES = {
    "corpus_prep": ORACLE_CORPUS_PREP,
    "pii_redact": ORACLE_PII,
    "hash_split": ORACLE_SPLIT,
    "stratified_sample": ORACLE_STRATIFIED,
    "quota_sample": ORACLE_QUOTA,
    "repetition_stats": ORACLE_REPETITION,
    "contamination": ORACLE_CONTAMINATION,
    "weighted_sample": ORACLE_WEIGHTED_SAMPLE,
    "chunk_documents": ORACLE_CHUNK,
    "pack_sequences": ORACLE_PACK,
    "shard_manifest": ORACLE_SHARDS,
    "curriculum_manifest": ORACLE_CURRICULUM,
    "length_buckets": ORACLE_LENGTH_BUCKETS,
    "dataset_mixture": ORACLE_MIXTURE,
    "line_dedup": ORACLE_LINE_DEDUP,
    "ngram_contamination": ORACLE_NGRAM_CONTAMINATION,
    "bloom_contamination": ORACLE_NGRAM_CONTAMINATION,
    "dsir_weights": ORACLE_DSIR,
    "dataset_card": ORACLE_DATASET_CARD,
    "filter_funnel": ORACLE_FILTER_FUNNEL,
    "training_pipeline_e2e": ORACLE_TRAINING_E2E,
    "training_pipeline_tokenized_e2e": ORACLE_TRAINING_TOKENIZED,
}


def q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-rebalanced language mixture (alpha=0.5): weights
    derived from the corpus itself as n^alpha, then hash-thinned;
    per-lang survivors + id checksum."""
    from kg_etl_spark.operators.packing import temperature_mixture

    docs = read_table(spark, sf_dir, "documents")
    keep = temperature_mixture(docs, "lang", alpha=0.5)
    return keep.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"), F.sum("doc_id").alias("id_sum")
    )


ORACLE_TEMPERATURE_MIXTURE = f"""
WITH w AS (
  SELECT lang, COUNT(*) AS n, ROUND(power(COUNT(*), 0.5), 6) AS wt
  FROM documents GROUP BY lang
),
tot AS (SELECT list_reduce(list(wt ORDER BY lang), (x, y) -> x + y) AS tw FROM w),
t AS (SELECT MIN(n / (wt / tw)) AS t_max FROM w, tot),
rates AS (
  SELECT w.lang, (w.wt / tot.tw) * t.t_max / w.n AS rate FROM w, tot, t
)
SELECT d.lang, COUNT(*) AS n_kept, CAST(SUM(d.doc_id) AS BIGINT) AS id_sum
FROM documents d JOIN rates r ON d.lang = r.lang
WHERE CAST((d.doc_id * {_KNUTH_A}) % {_M32} AS DOUBLE) < r.rate * {float(_M32)!r}
GROUP BY d.lang
"""

QUERIES["temperature_mixture"] = q_temperature_mixture
ORACLES["temperature_mixture"] = ORACLE_TEMPERATURE_MIXTURE


# --- Deterministic epoch shuffle (training-data ordering) -------------

_EP_EPOCHS = 2
_EP_SHARDS = 8
_EP_MIX = 1_000_003  # prime epoch-mixing factor


def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible per-epoch training-data order: each (epoch, doc)
    gets a shuffle key h = knuth_h32(doc_id + epoch·P), documents land
    in shard = h % n_shards and are ordered inside the shard by
    (h, doc_id). Different epochs therefore see different, but exactly
    reproducible, permutations — no global sort: ordering is
    established per shard (window partitioned by (epoch, shard)), so
    at 100 TB each shard is an independent, bounded sort. One shuffle
    (the window partition)."""
    from pyspark.sql import Window

    from kg_etl_spark.operators.datapipe import knuth_h32

    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    ep = docs.withColumn(
        "epoch", F.explode(F.sequence(F.lit(0), F.lit(_EP_EPOCHS - 1)))
    )
    h = knuth_h32(F.col("doc_id") + F.col("epoch") * _EP_MIX)
    keyed = ep.select(
        "doc_id",
        "epoch",
        h.alias("_h"),
        F.pmod(h, F.lit(_EP_SHARDS)).alias("shard"),
    )
    w = Window.partitionBy("epoch", "shard").orderBy(
        F.col("_h").asc(), F.col("doc_id").asc()
    )
    return keyed.select(
        "epoch",
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
        "doc_id",
    )


_EP_H = f"(((doc_id + epoch * {_EP_MIX}) * {_KNUTH_A}) % {_M32})"

ORACLE_EPOCH_SHUFFLE = f"""
WITH ep AS (
  SELECT doc_id, epoch
  FROM documents, (VALUES (0), (1)) e(epoch)
),
keyed AS (
  SELECT doc_id, epoch, {_EP_H} AS h, {_EP_H} % {_EP_SHARDS} AS shard FROM ep
)
SELECT epoch, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY epoch, shard ORDER BY h ASC, doc_id ASC) AS BIGINT) AS pos,
       doc_id
FROM keyed
"""

QUERIES["epoch_shuffle"] = q_epoch_shuffle
ORACLES["epoch_shuffle"] = ORACLE_EPOCH_SHUFFLE


# --- T5-style span-corruption plan (denoising objective data prep) ------


_SPAN_RATE_PCT = 15  # corrupt ~15% of tokens
_SPAN_LEN = 3        # mean/fixed span length (T5 defaults)
_SPAN_A = 1_315_423_911
_SPAN_C = 97_531
_SPAN_P = 2_147_483_647


def q_span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic T5-style span-corruption plan (Raffel et al.,
    JMLR'20 §3.1.4): per document, n_spans = max(1, (15%·n_tokens)
    div 3) length-3 spans placed ONE PER EQUAL SEGMENT at a
    hash-derived offset — non-overlapping by construction (the
    determinism-first stand-in for T5's random non-overlapping
    sampling; assignments never change as the corpus grows, the
    hash-split discipline). Emits one row per span:
    (doc_id, span_id, start, span_len) — what a denoising collator
    consumes — plus the per-doc sentinel bookkeeping (n_tokens,
    n_spans).

    Determinism: all-integer; offsets use the catalog's multiplicative
    hash ((A·(doc&2³¹−1) + C·(j+1)) % P) with 31-bit masked inputs so
    the product never wraps a long (the walks.py lesson).

    100 TB shape: map-side token count, a sequence() explode bounded
    by n_spans (≤ n_tokens/20), zero joins, zero shuffles —
    corpus-bandwidth-bound like the split/sample family."""
    from kg_etl_spark.operators.textquality import ws_tokens

    docs = read_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", F.size(ws_tokens(F.col("text"))).cast("long").alias("n_tokens")
    ).filter(F.col("n_tokens") >= _SPAN_LEN)
    n_spans = F.greatest(
        F.lit(1).cast("long"),
        F.expr(f"(n_tokens * {_SPAN_RATE_PCT} div 100) div {_SPAN_LEN}"),
    )
    planned = base.withColumn("n_spans", n_spans).withColumn(
        "span_id", F.explode(F.sequence(F.lit(0).cast("long"), F.col("n_spans") - 1))
    )
    seg = F.expr("n_tokens div n_spans")
    slack = F.greatest(F.lit(1).cast("long"), seg - _SPAN_LEN + 1)
    h = (
        F.lit(_SPAN_A) * F.col("doc_id").bitwiseAND(F.lit(0x7FFFFFFF))
        + F.lit(_SPAN_C) * (F.col("span_id") + 1)
    ) % F.lit(_SPAN_P)
    start = F.col("span_id") * seg + (h % slack)
    return planned.select(
        "doc_id",
        "n_tokens",
        "n_spans",
        "span_id",
        start.alias("start"),
        F.least(F.lit(_SPAN_LEN).cast("long"), F.col("n_tokens") - start).alias("span_len"),
    )


ORACLE_SPAN_CORRUPTION = f"""
WITH base AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                              x -> len(x) > 0)) AS BIGINT) AS n_tokens
  FROM documents
), planned AS (
  SELECT doc_id, n_tokens,
         GREATEST(1, (n_tokens * {_SPAN_RATE_PCT} // 100) // {_SPAN_LEN}) AS n_spans
  FROM base WHERE n_tokens >= {_SPAN_LEN}
), ex AS (
  SELECT doc_id, n_tokens, n_spans, unnest(range(0, n_spans)) AS span_id
  FROM planned
)
SELECT doc_id, n_tokens, n_spans, CAST(span_id AS BIGINT) AS span_id,
       span_id * (n_tokens // n_spans)
         + (({_SPAN_A} * (doc_id & 2147483647) + {_SPAN_C} * (span_id + 1)) % {_SPAN_P})
           % GREATEST(1, n_tokens // n_spans - {_SPAN_LEN} + 1) AS start,
       LEAST({_SPAN_LEN},
             n_tokens - (span_id * (n_tokens // n_spans)
               + (({_SPAN_A} * (doc_id & 2147483647) + {_SPAN_C} * (span_id + 1)) % {_SPAN_P})
                 % GREATEST(1, n_tokens // n_spans - {_SPAN_LEN} + 1))) AS span_len
FROM ex
"""

QUERIES["span_corruption_plan"] = q_span_corruption_plan
ORACLES["span_corruption_plan"] = ORACLE_SPAN_CORRUPTION


# --- Deterministic weighted priority sample (per-lang top-k) ------------


def q_weighted_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus subsampling, reproducibly: per language, keep
    the k=3 documents with the smallest priority
    hash₃₂(doc_id) / n_chars — the catalog's deterministic stand-in
    for weighted random sampling (longer docs win proportionally; the
    hash replaces rand() so re-runs and the oracle agree bit-for-bit;
    the transform is rational double arithmetic, no libm in the
    ordering).

    100 TB shape: lang has cardinality ~5, so a plain top-k window
    would sort n/|langs| rows in ONE task — the priority rank rides
    grouped_row_number (operators/rankdev.py: priority-bucketed
    parallel cells + broadcast offsets) instead."""
    from kg_etl_spark.operators.datapipe import knuth_h32
    from kg_etl_spark.operators.rankdev import grouped_row_number

    docs = read_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    scored = docs.select(
        "lang",
        "doc_id",
        "n_chars",
        (
            knuth_h32(F.col("doc_id")).cast("double")
            / F.col("n_chars").cast("double")
        ).alias("_prio"),
    )
    ranked = grouped_row_number(
        scored, ["lang"], "_prio", ["doc_id"], out_col="rk", count_col="_n"
    )
    return (
        ranked.filter(F.col("rk") <= 3)
        .select("lang", "doc_id", "n_chars", F.col("rk").cast("long").alias("rk"))
    )


ORACLE_WEIGHTED_PRIORITY = f"""
WITH scored AS (
  SELECT lang, doc_id, n_chars,
         CAST((doc_id * {_KNUTH_A}) % {_M32} AS DOUBLE) / CAST(n_chars AS DOUBLE)
           AS prio
  FROM documents WHERE n_chars > 0
)
SELECT lang, doc_id, n_chars, CAST(rk AS BIGINT) AS rk FROM (
  SELECT lang, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY prio ASC, doc_id ASC) AS rk
  FROM scored
) WHERE rk <= 3
"""

QUERIES["weighted_priority_sample"] = q_weighted_priority_sample
ORACLES["weighted_priority_sample"] = ORACLE_WEIGHTED_PRIORITY


def q_token_budget_unimax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax-style token-budget allocation (Chung et al. 2023's
    budget-constrained uniform sampling, the waterfilling form): given
    per-source token counts T_s, a total training budget B = Σ T_s
    (one corpus-epoch) and a per-source repeat cap of 2 epochs
    (cap_s = 2·T_s), allocate the budget as uniformly as possible —
    sources are filled to a common water level L, small sources
    saturate at their cap, and the leftover re-levels among the rest:
        sort by cap asc;  source i saturates iff
        cap_i·(S−i+1) + Σ_{j<i} cap_j ≤ B   (a prefix, by exchange
        argument);  L = (B − Σ_sat cap) / (S − m);  a_s = min(cap_s, L).
    Integer-exact until L's single division.

    100 TB shape: corpus-scale work is ONE map-side token-count
    aggregate; the waterfilling runs entirely in higher-order array
    expressions over the ≤|sources|-row frame (sorted collect_list +
    transform/aggregate) — NO window, NO driver loop, no collect."""
    from kg_etl_spark.operators.textquality import ws_tokens

    docs = read_table(spark, sf_dir, "documents")
    w = docs.groupBy("source").agg(
        F.sum(F.size(ws_tokens(F.col("text"))).cast("long")).alias("toks")
    )
    one = w.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    (F.lit(2) * F.col("toks")).alias("cap"),
                    F.col("source").alias("source"),
                    F.col("toks").alias("toks"),
                )
            )
        ).alias("arr"),
        F.sum("toks").alias("budget"),
    )
    arr, bud = F.col("arr"), F.col("budget")
    S = F.size(arr)
    prefix = lambda n: F.aggregate(  # noqa: E731 - Σ cap over arr[1..n]
        F.slice(arr, 1, n), F.lit(0).cast("long"), lambda acc, x: acc + x["cap"]
    )
    sat = F.transform(
        F.sequence(F.lit(1), S),
        lambda i: (
            F.element_at(arr, i)["cap"] * (S - i + 1).cast("long") + prefix(i - 1)
        )
        <= bud,
    )
    staged = one.select(
        arr,
        bud,
        F.size(F.filter(sat, lambda x: x)).alias("m"),
    )
    m = F.col("m")
    level = (bud - prefix(m)).cast("double") / (S - m).cast("double")
    rows = staged.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(arr)),
                lambda i: F.struct(
                    F.element_at(arr, i)["source"].alias("source"),
                    F.element_at(arr, i)["toks"].alias("n_tokens"),
                    F.element_at(arr, i)["cap"].alias("cap_tokens"),
                    F.when(
                        i <= m, F.element_at(arr, i)["cap"].cast("double")
                    )
                    .otherwise(level)
                    .alias("alloc"),
                ),
            )
        ).alias("s")
    )
    return rows.select(
        F.col("s.source").alias("source"),
        F.col("s.n_tokens").alias("n_tokens"),
        F.col("s.cap_tokens").alias("cap_tokens"),
        F.round(F.col("s.alloc"), 6).alias("alloc_tokens"),
        F.round(F.col("s.alloc") / F.col("s.n_tokens").cast("double"), 6).alias(
            "epochs"
        ),
    ).orderBy("source")


ORACLE_TOKEN_BUDGET = """
WITH w AS (
  SELECT source,
         SUM(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                             t -> len(t) > 0))) AS toks
  FROM documents GROUP BY source
), b AS (SELECT SUM(toks) AS budget FROM w),
sorted AS (
  SELECT source, toks, 2 * toks AS cap,
         ROW_NUMBER() OVER (ORDER BY 2 * toks, source) AS i,
         COUNT(*) OVER () AS s,
         COALESCE(SUM(2 * toks) OVER (ORDER BY 2 * toks, source
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p_prev
  FROM w
), sat AS (
  SELECT sorted.*, budget,
         CASE WHEN cap * (s - i + 1) + p_prev <= budget THEN 1 ELSE 0 END AS is_sat
  FROM sorted CROSS JOIN b
), msum AS (
  SELECT SUM(is_sat) AS m, COALESCE(SUM(CASE WHEN is_sat = 1 THEN cap END), 0) AS pm
  FROM sat
)
SELECT source, CAST(toks AS BIGINT) AS n_tokens, CAST(cap AS BIGINT) AS cap_tokens,
       ROUND(CASE WHEN is_sat = 1 THEN CAST(cap AS DOUBLE)
                  ELSE CAST(budget - pm AS DOUBLE) / CAST(s - m AS DOUBLE) END, 6) AS alloc_tokens,
       ROUND(CASE WHEN is_sat = 1 THEN CAST(cap AS DOUBLE)
                  ELSE CAST(budget - pm AS DOUBLE) / CAST(s - m AS DOUBLE) END
             / CAST(toks AS DOUBLE), 6) AS epochs
FROM sat CROSS JOIN msum
ORDER BY source
"""

QUERIES["token_budget_unimax"] = q_token_budget_unimax
ORACLES["token_budget_unimax"] = ORACLE_TOKEN_BUDGET
