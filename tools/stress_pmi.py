"""Measured 50M-token stress legs for the round-9 corpus-scale text
aggregates (r9 verdict directive #4): `pmi_collocations` with a
REAL-SIZED unigram vocabulary (the frame whose forced broadcast was
the r9 scale-killer, removed in r10 — this leg verifies the unhinted
shuffled vocab join's behavior at real |vocab|), and
`span_df_histogram` at the same scale.

Planted-structure protocol (stress_spans/stress_dedup lesson): the
corpus is a deterministic function of its parameters with analytically
known outputs, so both legs carry EXACT signature checks.

- `pmi`: 2.5M docs x 20 tokens (50M tokens).  Interior positions
  alternate globally-unique tokens (u{id}x{j} — the hapax tail that
  makes the vocab Heaps'-large, ~25M types) and a lowest-set-bit
  geometric head (h{2^k} with mass ~2^-(k+1) — the Zipf-shaped skew
  that makes the unigram groupBy carry real heavy keys).  The first
  980 docs append one of 40 planted bigrams (p{k} q{k}) with exact
  corpus counts c_k = 5+k; p/q tokens occur nowhere else, so
  ca = cb = cab = c_k and pmi_k = ln((c_k/B)/((c_k/T)^2)) exactly,
  strictly decreasing in c_k.  Every non-planted bigram either has
  cab < 5 (anything touching a unique token) or pmi <~ ln(5) (head
  tokens adjacent to planted/head tokens — ca is in the millions), so
  the top-20 is EXACTLY pairs k=0..19 with bit-identical pmi (the
  expected values replicate the query's IEEE expression tree).
  The leg runs the SHIPPED q_pmi_collocations (read_table patched to
  serve the synthetic frame), so the unhinted join plan is exercised
  verbatim: |vocab| ~= 25M rows through BOTH sides of the
  bigram<-unigram attach — several GiB that the removed F.broadcast
  hints would have forced into every executor and the driver.
- `span_hist`: `span_df_histogram` on the stress_spans sweep corpus
  (50% templated, 19-token template): templated docs contribute 15
  corpus-shared spans (df = 1.25M) + 1 hapax, plain docs 16 hapaxes —
  a two-bucket histogram checked exactly (buckets 0 and
  floor(log2(1.25M)) = 20).

Usage: python tools/stress_pmi.py [leg ...]
       legs: pmi span_hist   (default: all)
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kg_etl_spark.session import get_spark  # noqa: E402

N_DOCS = 2_500_000  # x 20 tokens = 50M tokens
DOC_LEN = 20
N_PAIRS = 40  # planted counts 5..44; top-20 = counts 5..24


def _pmi_corpus(spark):
    """doc i: 18 interior tokens alternating unique/head; docs whose id
    falls in pair k's contiguous range append 'p{k} q{k}', all others
    keep the alternating pattern through position 19."""
    counts = [5 + k for k in range(N_PAIRS)]
    bounds = []  # doc-id ranges per pair
    lo = 0
    for c in counts:
        bounds.append((lo, lo + c))
        lo += c
    n_planted = lo  # 980

    d = spark.range(N_DOCS)
    uniq = lambda j: F.concat(F.lit("u"), F.col("id"), F.lit("x"), F.lit(j))  # noqa: E731
    # geometric head: lowest set bit of a position-salted LCG draw
    head = lambda j: F.concat(  # noqa: E731
        F.lit("h"),
        (
            F.pmod(F.col("id") * 2654435761 + j * 40503, F.lit(1 << 20)) + 1
        ).bitwiseAND(
            -(F.pmod(F.col("id") * 2654435761 + j * 40503, F.lit(1 << 20)) + 1)
        ),
    )
    interior = [uniq(j) if j % 2 == 0 else head(j) for j in range(DOC_LEN)]
    # pair index for planted docs: element_at over a 980-entry literal
    # index clamped so ANSI element_at never sees an OOB id (the When
    # guard below selects planted docs; the clamp keeps the expression
    # total for every row regardless of branch-evaluation order)
    pair_k = F.element_at(
        F.array(*[F.lit(k) for k, (a, b) in enumerate(bounds) for _ in range(b - a)]),
        (F.least(F.col("id"), F.lit(n_planted - 1)) + 1).cast("int"),
    )
    planted_tail = [
        F.concat(F.lit("p"), pair_k.cast("string")),
        F.concat(F.lit("q"), pair_k.cast("string")),
    ]
    is_planted = F.col("id") < n_planted
    toks = [
        F.when(is_planted, planted_tail[j - 18]).otherwise(interior[j])
        if j >= 18
        else interior[j]
        for j in range(DOC_LEN)
    ]
    return d.select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *toks).alias("text"),
    ), counts


def _expected_top20(counts):
    """Replicates q_pmi_collocations' IEEE expression tree exactly:
    pmi = log((cab/B) / ((ca/T)*(cb/T))) on doubles, rounded to 6dp."""
    T = float(N_DOCS * DOC_LEN)
    B = float(N_DOCS * (DOC_LEN - 1))
    rows = []
    for k, c in enumerate(counts):
        pmi = math.log((c / B) / ((c / T) * (c / T)))
        rows.append((f"p{k} q{k}", c, round(pmi, 6)))
    rows.sort(key=lambda r: (-r[2], r[0]))
    return rows[:20]


def stress_pmi(spark):
    from kg_etl_spark.queries import textq

    corpus, counts = _pmi_corpus(spark)
    corpus = corpus.localCheckpoint(eager=True)
    real_read = textq.read_table
    t0 = time.time()
    try:
        textq.read_table = lambda _s, _d, _n: corpus
        got = [
            (r["bigram"], r["n_pair"], r["pmi"])
            for r in textq.q_pmi_collocations(spark, "<synthetic>").collect()
        ]
    finally:
        textq.read_table = real_read
    dt = time.time() - t0
    want = _expected_top20(counts)
    assert got == want, (got[:3], want[:3])
    # vocab-size context for the ledger (hapax tail + head + planted)
    line = (
        f"pmi[50M]: {N_DOCS} docs x {DOC_LEN} tokens, ~25M-type vocab "
        f"through the UNHINTED unigram joins, top-20 bit-exact "
        f"(counts 5..24), {dt:.1f}s"
    )
    print(line, flush=True)
    return line


def stress_span_hist(spark):
    from tools.stress_spans import _sweep_corpus

    from kg_etl_spark.queries import textq

    corpus = _sweep_corpus(spark, 0.5, 19).localCheckpoint(eager=True)
    n_t = N_DOCS // 2  # (id % 1000) < 500, N_DOCS divisible by 1000
    real_read = textq.read_table
    t0 = time.time()
    try:
        textq.read_table = lambda _s, _d, _n: corpus
        got = {
            r["log2_df_bucket"]: (r["n_spans"], r["n_occurrences"])
            for r in textq.q_span_df_histogram(spark, "<synthetic>").collect()
        }
    finally:
        textq.read_table = real_read
    dt = time.time() - t0
    # templated doc: 16 spans, 15 all-template (shared corpus-wide,
    # df = n_t) + 1 touching its unique token (df=1); plain doc: 16
    # hapax spans
    want = {
        0: (n_t * 1 + (N_DOCS - n_t) * 16, n_t * 1 + (N_DOCS - n_t) * 16),
        int(math.floor(math.log2(n_t))): (15, 15 * n_t),
    }
    assert got == want, (got, want)
    line = (
        f"span_hist[50M]: {N_DOCS} docs, two-bucket histogram exact "
        f"(df=1 tail {want[0][0]} spans; 15 boilerplate spans at "
        f"df={n_t}), {dt:.1f}s"
    )
    print(line, flush=True)
    return line


def stress_cdc(spark):
    """`cdc_chunk_stats` at 50M tokens via the R-copies invariant:
    500k distinct 20-token base docs (tokens globally unique per base,
    so base docs are pairwise chunk-disjoint) x 5 exact copies each.
    Chunk boundaries are md5-dependent and not predictable, but the
    copy structure forces exact integer identities through the WHOLE
    pipeline (per-doc rolling-hash windows -> boundary prefix sums ->
    chunk aggregate -> df aggregate): identical docs chunk
    identically, so EVERY distinct chunk has df == R — n_chunks must
    equal R * n_distinct_chunks, n_dup_chunks == n_distinct_chunks,
    dup_occurrence_share == 1.0 exactly, and avg_chunk_tokens must
    reproduce total_tokens / n_chunks."""
    from kg_etl_spark.queries import textq

    n_base, copies = N_DOCS // 5, 5
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(DOC_LEN - 1)),
        lambda j: F.concat(F.lit("b"), F.col("base"), F.lit("t"), j),
    )
    corpus = (
        spark.range(N_DOCS)
        .select(F.col("id").alias("doc_id"), (F.col("id") % n_base).alias("base"))
        .select("doc_id", F.concat_ws(" ", toks).alias("text"))
        .localCheckpoint(eager=True)
    )
    real_read = textq.read_table
    t0 = time.time()
    try:
        textq.read_table = lambda _s, _d, _n: corpus
        r = textq.q_cdc_chunk_stats(spark, "<synthetic>").collect()[0]
    finally:
        textq.read_table = real_read
    dt = time.time() - t0
    assert r["n_chunks"] == copies * r["n_distinct_chunks"], r
    assert r["n_dup_chunks"] == r["n_distinct_chunks"], r
    assert r["dup_occurrence_share"] == 1.0, r
    total_tokens = N_DOCS * DOC_LEN
    assert abs(r["avg_chunk_tokens"] - total_tokens / r["n_chunks"]) <= 5e-7, r
    line = (
        f"cdc[50M]: {N_DOCS} docs ({n_base} bases x {copies} copies), "
        f"{r['n_distinct_chunks']} distinct chunks each at df={copies} "
        f"exactly (dup share 1.0), {dt:.1f}s"
    )
    print(line, flush=True)
    return line


LEGS = {"pmi": stress_pmi, "span_hist": stress_span_hist, "cdc": stress_cdc}


def main():
    names = sys.argv[1:] or list(LEGS)
    spark = get_spark("stress_pmi")
    out = []
    for n in names:
        out.append(LEGS[n](spark))
        for _jid, jrdd in spark.sparkContext._jsc.getPersistentRDDs().items():
            jrdd.unpersist(True)
    print("\nALL LEGS OK")
    for line in out:
        print(line)


if __name__ == "__main__":
    main()
