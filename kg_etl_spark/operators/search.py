"""Full-text relevance search over a document corpus: BM25 and TF-IDF
top-k retrieval for a fixed query-term set.

Spark-first shape (100 TB reasoning):

* Per-document term frequencies come from ``F.filter`` over the
  already-materialized token array — a map-side expression, **no
  explode and no shuffle** for the corpus. A posting-list explode of a
  100 TB corpus would shuffle ~every token; counting only the handful
  of query terms per row keeps the hot path in whole-stage codegen.
* Corpus statistics (N, Σdl, per-term document frequency) are ONE
  aggregate row — bytes, not rows — broadcast back over the corpus
  with a broadcast cross-join. No driver collect.
* Top-k is ``ORDER BY … LIMIT k``: Spark executes TakeOrderedAndProject
  (per-partition heap + driver merge of k rows), so the full scored
  corpus is never globally sorted or shuffled.

Determinism for the DuckDB oracle: the per-document score is a
FIXED-ORDER sum over the query terms (t1 + t2 + …, not a group-by sum
whose fold order floats), ranking uses the 6-dp-rounded score with
``doc_id`` as total tie-break, and all math is double-precision ln/fma
expressible identically in ANSI SQL.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kg_etl_spark.operators.textquality import ws_tokens


def _term_tf(toks: Column, term: str) -> Column:
    """tf of one literal term: map-side count inside the token array."""
    return F.size(F.filter(toks, lambda t: t == F.lit(term))).cast("double")


def corpus_stats(tokenized: DataFrame, terms: Sequence[str]) -> DataFrame:
    """One-row corpus aggregate: N, total token count, and per-term
    document frequency (column ``df_{i}``). The only shuffle in the
    whole operator, and it reduces to a single row."""
    aggs = [
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum("dl").cast("double").alias("sum_dl"),
    ]
    for i, _t in enumerate(terms):
        aggs.append(F.sum((F.col(f"tf_{i}") > 0).cast("double")).alias(f"df_{i}"))
    return tokenized.agg(*aggs)


def bm25_topk(
    docs: DataFrame,
    terms: Sequence[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k: score every document against ``terms``, return the k
    best as (id, n_tokens, per-term tfs…, bm25).

    IDF uses the Robertson–Sparck-Jones "+1" smoothing
    ``ln(1 + (N - df + 0.5) / (df + 0.5))`` so uniform-df corpora still
    score positively.
    """
    toks = ws_tokens(F.col(text_col))
    scored = docs.select(
        F.col(id_col),
        toks.alias("toks"),
    ).select(
        id_col,
        F.size("toks").cast("double").alias("dl"),
        *[_term_tf(F.col("toks"), t).alias(f"tf_{i}") for i, t in enumerate(terms)],
    )
    stats = corpus_stats(scored, terms)

    j = scored.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl") / F.col("n_docs")
    score: Column = F.lit(0.0)
    for i, _t in enumerate(terms):
        tf = F.col(f"tf_{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5)) / (F.col(f"df_{i}") + F.lit(0.5))
        )
        part = idf * (tf * (k1 + 1.0)) / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl))
        # fixed left-fold order: ((t0 + t1) + t2) … so the oracle's
        # identical fold is bit-compatible before rounding
        score = score + part
    out = j.select(
        id_col,
        F.col("dl").cast("long").alias("n_tokens"),
        *[F.col(f"tf_{i}").cast("long").alias(f"tf_{i}") for i in range(len(terms))],
        F.round(score, 6).alias("bm25"),
    )
    return out.orderBy(F.col("bm25").desc(), F.col(id_col)).limit(k)


def tfidf_topk(
    docs: DataFrame,
    terms: Sequence[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
) -> DataFrame:
    """TF-IDF top-k with the same no-explode shape:
    weight = (1 + ln(tf)) * ln(1 + N / df) for tf > 0, summed in fixed
    term order. The smoothed idf keeps scores informative even when a
    term appears in every document (df = N ⇒ idf = ln 2, not 0) —
    smaller cousin of :func:`bm25_topk` without length normalization."""
    toks = ws_tokens(F.col(text_col))
    scored = docs.select(F.col(id_col), toks.alias("toks")).select(
        id_col,
        F.size("toks").cast("double").alias("dl"),
        *[_term_tf(F.col("toks"), t).alias(f"tf_{i}") for i, t in enumerate(terms)],
    )
    stats = corpus_stats(scored, terms)
    j = scored.crossJoin(F.broadcast(stats))
    score: Column = F.lit(0.0)
    for i, _t in enumerate(terms):
        tf = F.col(f"tf_{i}")
        w = F.when(
            tf > 0,
            (F.lit(1.0) + F.log(tf)) * F.log(F.lit(1.0) + F.col("n_docs") / F.col(f"df_{i}")),
        ).otherwise(F.lit(0.0))
        score = score + w
    out = j.select(
        id_col,
        *[F.col(f"tf_{i}").cast("long").alias(f"tf_{i}") for i in range(len(terms))],
        F.round(score, 6).alias("tfidf"),
    )
    return out.orderBy(F.col("tfidf").desc(), F.col(id_col)).limit(k)


def token_pmi_pairs(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 5,
    max_df: int = 200,
    k: int = 20,
) -> DataFrame:
    """Top-k co-occurring token pairs by pointwise mutual information
    over document-level co-occurrence — the collocation/phrase-mining
    primitive (new-terminology detection, tokenizer-merge candidates).

    PMI(x,y) = ln( N·df(x,y) / (df(x)·df(y)) ) over distinct-token doc
    sets. The pair generator is the inverted-index self-join on doc_id
    — per-doc quadratic in its DISTINCT df-windowed tokens, which the
    [min_df, max_df] window bounds: rare tokens can't reach min_df
    support anyway, and stop-word-like tokens above max_df are the
    classic blowup (the dedup family's max_df cap, reused). One
    df-aggregate, one windowed-token self-join, one pair-count
    aggregate; N is the only driver scalar.
    """
    from kg_etl_spark.operators.textquality import ws_tokens

    dt = corpus.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(ws_tokens(F.col(text_col)))).alias("_t"),
    )
    n_docs = corpus.select(id_col).distinct().count()
    df_counts = dt.groupBy("_t").agg(F.count(F.lit(1)).alias("_df"))
    windowed = df_counts.filter(
        (F.col("_df") >= min_df) & (F.col("_df") <= max_df)
    )
    # plain equi-join: the windowed vocabulary is corpus-vocab-scale
    # (all mid-frequency tokens), so no broadcast hint — AQE broadcasts
    # it when actually small (r7 broadcast-site review)
    toks = dt.join(windowed, "_t")

    a = toks.select("_id", F.col("_t").alias("w1"), F.col("_df").alias("_dfa"))
    b = toks.select("_id", F.col("_t").alias("w2"), F.col("_df").alias("_dfb"))
    pairs = (
        a.join(b, "_id")
        .filter(F.col("w1") < F.col("w2"))
        .groupBy("w1", "w2")
        .agg(
            F.count(F.lit(1)).alias("n_docs_together"),
            F.first("_dfa").alias("_dfa"),
            F.first("_dfb").alias("_dfb"),
        )
        .filter(F.col("n_docs_together") >= min_df)
    )
    pmi = F.round(
        F.log(
            (F.lit(n_docs).cast("double") * F.col("n_docs_together").cast("double"))
            / (F.col("_dfa") * F.col("_dfb")).cast("double")
        ),
        6,
    )
    out = pairs.select("w1", "w2", "n_docs_together", pmi.alias("pmi"))
    return out.orderBy(F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc()).limit(k)
