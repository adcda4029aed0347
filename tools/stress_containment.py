"""50M-token planted-structure stress leg for the containment-family
prefix ssjoin (r10 verdict directive #3): `ngram_containment_pairs_prefix`
gets the same exact-signature treatment the Jaccard prefix path and the
span family already have.

Corpus (deterministic, 2.5M docs x 20 tokens = 50M tokens):
  - organic docs 0..N-1: 10 doc-salted unique tokens + (every 2nd doc)
    a shared 10-token template. Template 5-grams carry df = N/2 — the
    boilerplate regime whose Σdf² candidate blowup the prefix rule
    exists to dodge — but they are the COMMONEST shingles, so they
    never enter any doc's (l − ⌈t·l⌉ + 1)-rarest prefix: the organic
    corpus contributes the full scan/df/sort load and EXACTLY ZERO
    candidate pairs (organic-organic containment tops out at 6/16 =
    0.375 < t).
  - snippet-inclusion triples i = 0..999 at id offsets +10M/+11M/+12M,
    tokens salted per i (disjoint from organic and from each other):
      A_i = 20 unique tokens                (16 shingles at n=5)
      B_i = A's first c+4 tokens + (10−c) junk, c = 8 (even i) / 7 (odd)
            → |B| = 10 shingles, c common with A
      C_i = A's first 12 tokens             (8 shingles, all ⊂ A and,
            for the first min(c,8), ⊂ B)
    Exact expected output at t = 0.8 — EVERY value pinned:
      (A,B) even i only:  containment = 8/10  = 0.8   (AT threshold),
                          n_common 8; odd i = 7/10 = 0.7 < t (excluded,
                          and its B-prefix correctly misses A — the
                          theorem only covers qualifying pairs)
      (A,C) every i:      8/min(16,8) = 1.0, n_common 8
      (B,C) even i:       8/min(10,8) = 1.0, n_common 8
            odd  i:       7/min(10,8) = 0.875, n_common 7
    Total = 500 + 1000 + 1000 = 2500 rows, and the operator's FULL
    output must equal this set bit-for-bit (ids, n_common, containment)
    — any drift in the prefix rule, the ceil guard, df ranking, or the
    verify join breaks equality.

Usage: python tools/stress_containment.py [n_docs]   (default 2.5M)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kg_etl_spark.operators.dedup import ngram_containment_pairs_prefix  # noqa: E402
from kg_etl_spark.session import get_spark  # noqa: E402

DOC_LEN = 20
NGRAM = 5
THRESHOLD = 0.8
PLANTED = 1000
A_OFF, B_OFF, C_OFF = 10_000_000, 11_000_000, 12_000_000


def build_corpus(spark, n_docs: int):
    d = spark.range(n_docs)
    uniq = F.transform(
        F.sequence(F.lit(0), F.lit(DOC_LEN - 1)),
        lambda j: F.concat(F.lit("u"), F.col("id"), F.lit("x"), j),
    )
    tmpl = F.concat(
        F.slice(uniq, 1, 10), F.array(*[F.lit(f"t{j}") for j in range(10)])
    )
    organic = d.select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", F.when(F.col("id") % 2 == 0, tmpl).otherwise(uniq)
        ).alias("text"),
    )

    p = spark.range(PLANTED)
    atoks = F.transform(
        F.sequence(F.lit(0), F.lit(DOC_LEN - 1)),
        lambda j: F.concat(F.lit("p"), F.col("id"), F.lit("w"), j),
    )
    c = F.when(F.col("id") % 2 == 0, F.lit(8)).otherwise(F.lit(7))
    junk = F.transform(
        F.sequence(F.lit(1), F.lit(10) - c),
        lambda j: F.concat(F.lit("j"), F.col("id"), F.lit("y"), j),
    )
    a = p.select(
        (F.col("id") + A_OFF).alias("doc_id"),
        F.concat_ws(" ", atoks).alias("text"),
    )
    b = p.select(
        (F.col("id") + B_OFF).alias("doc_id"),
        F.concat_ws(" ", F.concat(F.slice(atoks, F.lit(1), c + 4), junk)).alias(
            "text"
        ),
    )
    cc = p.select(
        (F.col("id") + C_OFF).alias("doc_id"),
        F.concat_ws(" ", F.slice(atoks, 1, 12)).alias("text"),
    )
    return organic.unionByName(a).unionByName(b).unionByName(cc)


def expected_pairs() -> set:
    want = set()
    for i in range(PLANTED):
        if i % 2 == 0:
            want.add((A_OFF + i, B_OFF + i, 8, 0.8))
            want.add((B_OFF + i, C_OFF + i, 8, 1.0))
        else:
            want.add((B_OFF + i, C_OFF + i, 7, 0.875))
        want.add((A_OFF + i, C_OFF + i, 8, 1.0))
    return want


def main() -> None:
    n_docs = int(float(sys.argv[1])) if len(sys.argv) > 1 else 2_500_000
    spark = get_spark("stress_containment")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = build_corpus(spark, n_docs).localCheckpoint(eager=True)
    sc = spark.sparkContext
    sc.setJobGroup("stress_containment", "prefix ssjoin probe")
    t0 = time.time()
    got = {
        (r["a_id"], r["b_id"], r["n_common"], r["containment"])
        for r in ngram_containment_pairs_prefix(
            corpus,
            "doc_id",
            n=NGRAM,
            threshold=THRESHOLD,
            hash_shingles=True,
        ).collect()
    }
    dt = time.time() - t0
    jobs = len(sc.statusTracker().getJobIdsForGroup("stress_containment"))
    sc.setJobGroup(None, None)
    want = expected_pairs()
    missing, extra = want - got, got - want
    assert not missing, f"{len(missing)} expected pairs missing, e.g. {sorted(missing)[:5]}"
    assert not extra, f"{len(extra)} unexpected pairs, e.g. {sorted(extra)[:5]}"
    print(
        f"containment_prefix: {n_docs} docs x {DOC_LEN} tokens "
        f"(+{3 * PLANTED} planted, t={THRESHOLD}, n={NGRAM}) in {dt:.1f}s, "
        f"{jobs} jobs; output EXACTLY the {len(want)} expected pairs "
        f"(500 at-threshold 0.8 + 1000 full-inclusion 1.0 + "
        f"500 @1.0 + 500 @0.875 B/C pairs) — bit-exact signature OK",
        flush=True,
    )


if __name__ == "__main__":
    main()
