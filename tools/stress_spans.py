"""Measured 50M-token stress legs for the round-8 span operators
(r8 verdict directive #3): `remove_duplicate_spans` under a
flagged-fraction sweep, and `doc_dup_groups`'s pair-stream→components
→fold pipeline at real edge counts.

Planted-structure protocol (the rankdev/stress_dedup lesson): the
corpus is a deterministic function of its parameters with analytically
known outputs, so every leg carries an EXACT signature check — not a
smoke test — while the sizes exercise the scale hazards the operators
were shaped around:

- `span_sweep`: 2.5M docs x 20 tokens (50M tokens). Each doc is
  `a` globally-unique tokens + the corpus-shared `b`-token template
  (a+b=20): every all-template 5-gram is duplicated corpus-wide,
  every span touching a unique token has df=1. Covered positions are
  EXACTLY the template block, so per doc n_kept == a (templated) or
  20 (plain) — checked via one aggregate over the full output. The
  sweep (1%, 50%, 95% of corpus tokens covered) walks the covered
  explode from negligible to ~n x corpus rows (the pathological
  regime the r8 verdict flagged: most spans duplicated).
- `dup_groups`: 500k docs in 50k planted 10-cliques (identical text
  within a cluster, salted across clusters) -> 2.25M exact-duplicate
  pairs — ABOVE the components operator's 2M local-solve threshold,
  so the distributed label-propagation path runs, not the driver
  fallback. Exact check: 50k groups, every n_docs == 10, keeper ==
  min doc id, chars_freed == 9 x cluster doc length, summed.

Usage: python tools/stress_spans.py [leg ...]
       legs: span_sweep span_profile dup_groups   (default: all)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kg_etl_spark.session import get_spark  # noqa: E402

N_DOCS = 2_500_000  # x 20 tokens = 50M tokens
DOC_LEN = 20
NGRAM = 5


def _sweep_corpus(spark, frac_templated: float, b: int):
    """Deterministic corpus: `frac_templated` of docs are `a` unique
    tokens + the shared `b`-token template; the rest are fully unique.
    Unique tokens salt with doc_id (globally unique -> df=1)."""
    a = DOC_LEN - b
    d = spark.range(N_DOCS)
    is_t = (F.col("id") % 1000) < int(1000 * frac_templated)
    uniq = F.transform(
        F.sequence(F.lit(0), F.lit(DOC_LEN - 1)),
        lambda j: F.concat(F.lit("u"), F.col("id"), F.lit("x"), j),
    )
    tmpl = F.concat(
        F.slice(uniq, 1, a),
        F.array(*[F.lit(f"t{j}") for j in range(b)]),
    )
    return d.select(
        F.col("id").alias("doc_id"),
        is_t.alias("is_t"),
        F.concat_ws(" ", F.when(is_t, tmpl).otherwise(uniq)).alias("text"),
    )


def stress_span_sweep(spark):
    from kg_etl_spark.operators.filters import remove_duplicate_spans

    out = []
    # (frac of docs templated, template len) -> corpus covered fraction
    # = frac * b / 20: 1%, 50%, 95%
    for tag, frac, b in [
        ("1%", 0.016, 12),  # 0.016*12/20 ≈ 1.0% of tokens covered
        ("50%", 1.0, 10),  # all docs, half of each covered
        ("95%", 1.0, 19),  # the pathological most-spans-duplicated regime
    ]:
        a = DOC_LEN - b
        corpus = _sweep_corpus(spark, frac, b).localCheckpoint(eager=True)
        n_t = corpus.filter("is_t").count()
        t0 = time.time()
        res = remove_duplicate_spans(
            corpus, n=NGRAM, min_df=2, hash_spans=True
        ).agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum("n_tokens").alias("sum_tok"),
            F.sum("n_kept").alias("sum_kept"),
            F.count_distinct("n_kept").alias("kept_vals"),
        ).collect()[0]
        dt = time.time() - t0
        # exact signature: templated docs keep exactly `a` tokens,
        # plain docs keep all 20; two distinct n_kept values (one when
        # every doc is templated)
        want_kept = n_t * a + (N_DOCS - n_t) * DOC_LEN
        assert res["rows"] == N_DOCS, res
        assert res["sum_tok"] == N_DOCS * DOC_LEN, res
        assert res["sum_kept"] == want_kept, (res, want_kept)
        assert res["kept_vals"] == (1 if frac >= 1.0 else 2), res
        cov = (N_DOCS * DOC_LEN - want_kept) / (N_DOCS * DOC_LEN)
        # covered explode rows = 5 x (b-4) per templated doc
        expl = n_t * NGRAM * (b - NGRAM + 1)
        line = (
            f"span_sweep[{tag}]: {N_DOCS} docs x {DOC_LEN} tokens, "
            f"covered {cov:.1%} of corpus, covered-explode {expl / 1e6:.0f}M "
            f"rows ({expl / (N_DOCS * DOC_LEN):.1f}x corpus tokens), "
            f"{dt:.1f}s — exact signature OK"
        )
        print(line, flush=True)
        out.append(line)
        # drop the leg's checkpoint blocks before the next corpus
        for _jid, jrdd in spark.sparkContext._jsc.getPersistentRDDs().items():
            jrdd.unpersist(True)
    return "\n".join(out)


def stress_span_profile(spark):
    """`duplicate_span_profile` at 50M tokens on the pathological
    95%-covered corpus: every templated doc's covered set is exactly
    the contiguous b-token template block, so n_covered == b and
    max_dup_run == b for ALL of them — the longest-run fold is checked
    exactly at full scale, including the collect_set explode (188M
    covered rows into 2.5M per-doc sets)."""
    from kg_etl_spark.operators.filters import duplicate_span_profile

    b = 19
    corpus = _sweep_corpus(spark, 1.0, b).localCheckpoint(eager=True)
    t0 = time.time()
    res = duplicate_span_profile(
        corpus, n=NGRAM, min_df=2, hash_spans=True
    ).agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum("n_covered").alias("cov"),
        F.min("max_dup_run").alias("mn"),
        F.max("max_dup_run").alias("mx"),
    ).collect()[0]
    dt = time.time() - t0
    assert res["rows"] == N_DOCS, res
    assert res["cov"] == N_DOCS * b, res
    assert res["mn"] == res["mx"] == b, res
    return (
        f"span_profile[95%]: {N_DOCS} docs, every max_dup_run == {b} exactly, "
        f"{dt:.1f}s"
    )


GROUP_DOCS = 500_000  # patchable for smoke runs


def stress_dup_groups(spark):
    from kg_etl_spark.operators.components import connected_components
    from kg_etl_spark.operators.dedup import ngram_jaccard_pairs_prefix

    n_docs, csize = GROUP_DOCS, 10
    n_clusters = n_docs // csize
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(29)),
        lambda j: F.concat(F.lit("c"), F.col("cl"), F.lit("w"), j),
    )
    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"), (F.col("id") / csize).cast("long").alias("cl")
        )
        .select("doc_id", "cl", F.concat_ws(" ", toks).alias("text"))
        .withColumn("n_chars", F.length("text").cast("long"))
        .localCheckpoint(eager=True)
    )
    # docs are identical WITHIN a cluster but lengths vary across
    # clusters (cluster-id digit count): freed = 9 x one doc per
    # cluster = 9/10 of all chars
    total_chars = docs.select(F.sum("n_chars")).collect()[0][0]
    t0 = time.time()
    pairs = ngram_jaccard_pairs_prefix(docs, "doc_id", n=3, threshold=0.8).select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    )
    comp = connected_components(pairs)
    sized = comp.join(
        docs.select(F.col("doc_id").alias("node"), "n_chars"), "node"
    )
    groups = sized.groupBy(F.col("comp").alias("keeper_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(
            F.when(F.col("node") == F.col("comp"), F.lit(0)).otherwise(
                F.col("n_chars")
            )
        ).cast("long").alias("chars_freed"),
    )
    res = groups.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("n_docs").alias("mn"),
        F.max("n_docs").alias("mx"),
        F.sum("chars_freed").alias("freed"),
        F.sum(F.when(F.col("keeper_id") % csize == 0, 1).otherwise(0)).alias(
            "keeper_ok"
        ),
    ).collect()[0]
    dt = time.time() - t0
    n_edges = n_clusters * (csize * (csize - 1) // 2)
    assert res["n_groups"] == n_clusters, res
    assert res["mn"] == res["mx"] == csize, res
    assert res["freed"] * csize == total_chars * (csize - 1), (res, total_chars)
    assert res["keeper_ok"] == n_clusters, res  # keeper = cluster min id
    return (
        f"dup_groups: {n_docs} docs, {n_clusters} planted 10-cliques -> "
        f"{n_edges / 1e6:.2f}M pairs (> 2M distributed-components path), "
        f"{dt:.1f}s — groups/keepers/chars_freed exact"
    )


LEGS = {
    "span_sweep": stress_span_sweep,
    "span_profile": stress_span_profile,
    "dup_groups": stress_dup_groups,
}


def main() -> None:
    names = sys.argv[1:] or list(LEGS)
    spark = get_spark("stress_spans")
    for name in names:
        print(LEGS[name](spark), flush=True)


if __name__ == "__main__":
    main()
