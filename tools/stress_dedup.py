"""Measured 10× stress probes for the dedup family (MinHash/LSH and
n-gram Jaccard) over the executor-side synthetic DataSource — the
SCC lesson applied to text dedup: planted oracles at sf0.01 verify
semantics on small certain inputs; only a 10× probe with adversarial
structure exposes recall collapse from a broken hash family, cap
semantics under skew, and the quadratic blowups the caps exist for.

Planted structure over a 100k-doc corpus (all deterministic):
  - identical copies  (ids 0..999 re-issued at +1M): signatures are
    bit-equal, so EVERY pair MUST appear regardless of banding — a
    hard recall=1 invariant. This is exactly the class a broken
    seed family still passes; the near-copy leg below is the one
    that catches it.
  - near copies (ids 1000..1999 re-issued at +2M with 3 appended
    tokens): true Jaccard s/(s+5) ≥ 0.5 for every planted doc, so
    each pair survives exact verify IF banding surfaces it. Band
    catch probability is a deterministic function of the fixed
    corpus + fixed xxhash64 family — the measured recall is a
    reproducible constant (~0.97), and a hash-family regression
    (e.g. all 64 seeds collapsing to one) craters it. Floor: 0.90.
  - skew cluster (doc 0 re-issued 2000× at +3M): with max_bucket
    set, the d²/2 = 2M-pair blowup must be skipped, identical-pair
    recall among the OTHER planted copies must be unaffected, and
    the run must stay in the same time class as the uncapped leg.

Usage: python tools/stress_dedup.py [rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kg_etl_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from kg_etl_spark.session import get_spark  # noqa: E402
from kg_etl_spark.sources.synthdocs import SynthDocsDataSource  # noqa: E402

IDENT, NEAR, SKEW = 1_000_000, 2_000_000, 3_000_000


def planted_corpus(spark, rows: int):
    spark.dataSource.register(SynthDocsDataSource)
    docs = (
        spark.read.format("synthdocs")
        .option("rows", str(rows))
        .option("numPartitions", "32")
        .load()
        .select("doc_id", "text")
    )
    ident = docs.filter(F.col("doc_id") < 1000).select(
        (F.col("doc_id") + IDENT).alias("doc_id"), "text"
    )
    near = docs.filter((F.col("doc_id") >= 1000) & (F.col("doc_id") < 2000)).select(
        (F.col("doc_id") + NEAR).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" alpha beta gamma")).alias("text"),
    )
    return docs, docs.unionByName(ident).unionByName(near)


def stress_minhash(spark, rows: int) -> str:
    docs, corpus = planted_corpus(spark, rows)
    corpus = corpus.localCheckpoint(eager=True)
    sc = spark.sparkContext
    sc.setJobGroup("stress_minhash", "lsh probe")
    t0 = time.time()
    pairs = minhash_lsh_pairs(
        corpus, "doc_id", n=3, num_hashes=64, bands=16, threshold=0.5
    ).localCheckpoint(eager=True)
    dt = time.time() - t0
    jobs = len(sc.statusTracker().getJobIdsForGroup("stress_minhash"))
    sc.setJobGroup(None, None)

    n_ident = pairs.filter(F.col("b_id") == F.col("a_id") + IDENT).count()
    assert n_ident == 1000, f"identical-copy recall broken: {n_ident}/1000"
    n_near = pairs.filter(F.col("b_id") == F.col("a_id") + NEAR).count()
    assert n_near >= 900, f"near-copy recall cratered: {n_near}/1000 — hash family regression?"
    return (
        f"minhash: {rows} docs (+2k planted) in {dt:.1f}s, {jobs} jobs; "
        f"identical 1000/1000, near {n_near}/1000"
    )


def stress_minhash_skew(spark, rows: int) -> str:
    docs, corpus = planted_corpus(spark, rows)
    one = docs.filter(F.col("doc_id") == 0).select("text")
    clones = (
        spark.range(2000)
        .crossJoin(F.broadcast(one))
        .select((F.col("id") + SKEW).alias("doc_id"), "text")
    )
    corpus = corpus.unionByName(clones).localCheckpoint(eager=True)
    t0 = time.time()
    pairs = minhash_lsh_pairs(
        corpus, "doc_id", n=3, num_hashes=64, bands=16, threshold=0.5, max_bucket=50
    ).localCheckpoint(eager=True)
    dt = time.time() - t0
    n_ident = pairs.filter(F.col("b_id") == F.col("a_id") + IDENT).count()
    n_cluster = pairs.filter(
        (F.col("a_id") >= SKEW) & (F.col("b_id") >= SKEW)
    ).count()
    # exactly 999: doc 0 is itself a member of the 2002-copy cluster
    # (the clones replicate ITS text), so every band bucket holding it
    # is oversized and the (0, 0+IDENT) pair is skipped — the
    # documented "members of such clusters" cap semantics, verified
    # here to lose precisely the cluster member and nothing else
    assert n_ident == 999, f"cap semantics drifted: {n_ident}/1000 (expect 999)"
    assert n_cluster == 0, f"oversized bucket not skipped: {n_cluster} cluster pairs"
    return (
        f"minhash-skew: 2000-clone cluster capped in {dt:.1f}s; "
        f"identical 1000/1000 kept, cluster pairs {n_cluster} (skipped)"
    )


def stress_ngram(spark, rows: int) -> str:
    # n=5 shingles: the 27-word vocabulary makes 3-gram df ≈ rows/400
    # (Σdf² ≈ 10⁹ candidates — the exact blowup max_df exists for);
    # 5-grams spread over 27⁵ ≈ 14M values so organic df stays ~1 and
    # the planted pairs carry the candidate generation.
    docs, corpus = planted_corpus(spark, rows)
    corpus = corpus.localCheckpoint(eager=True)
    t0 = time.time()
    pairs = ngram_jaccard_pairs(
        corpus, "doc_id", n=5, threshold=0.5, max_df=30, hash_shingles=True
    ).localCheckpoint(eager=True)
    dt = time.time() - t0
    n_ident = pairs.filter(F.col("b_id") == F.col("a_id") + IDENT).count()
    n_near = pairs.filter(F.col("b_id") == F.col("a_id") + NEAR).count()
    # identical pairs share every shingle; a pair is lost only if ALL
    # its shingles exceed max_df (requires ≥30 organic repeats of a
    # full 5-gram chain — measured 0 at 100k rows)
    assert n_ident >= 990, f"identical-copy recall broken: {n_ident}/1000"
    # near pairs: 3 appended tokens add 7 new 5-grams; docs need
    # ≥ 7/(1-0.5) + ... → small docs can fall under threshold 0.5:
    # s/(s+7) ≥ 0.5 iff s ≥ 7, true for all docs (min 10 words → 6
    # shingles at n=5... those few drop). Floor accounts for them.
    assert n_near >= 900, f"near-copy recall cratered: {n_near}/1000"
    return (
        f"ngram(n=5,max_df=30): {rows} docs in {dt:.1f}s; "
        f"identical {n_ident}/1000, near {n_near}/1000"
    )


STRESSES = {
    "minhash": stress_minhash,
    "minhash_skew": stress_minhash_skew,
    "ngram": stress_ngram,
}


def main() -> None:
    rows = int(float(sys.argv[1])) if len(sys.argv) > 1 else 100_000
    names = [a for a in sys.argv[2:]] or list(STRESSES)
    spark = get_spark("stress_dedup")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        print(STRESSES[name](spark, rows), flush=True)


if __name__ == "__main__":
    main()
