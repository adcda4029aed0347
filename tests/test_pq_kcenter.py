"""PQ ANN and k-center greedy: recall, determinism, and trajectory
properties the SQL oracles can't see (shortlist pruning quality,
partition-count independence of codes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kg_etl_spark.operators.kcenter import kcenter_greedy
from kg_etl_spark.operators.pq import pq_ann_topk, pq_encode, pq_train_codebooks
from kg_etl_spark.operators.similarity import brute_force_topk
from kg_etl_spark.session import read_table

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return read_table(spark, SF, "embeddings")


def test_pq_codes_shape_and_range(spark):
    emb = _emb(spark)
    books = pq_train_codebooks(emb, m=8, ksub=16, iterations=1)
    assert len(books) == 8 and all(len(b) == 16 for b in books)
    assert all(len(c) == 8 for b in books for c in b)
    enc = pq_encode(emb, books)
    stats = enc.select(
        F.min(F.array_min("codes")).alias("lo"),
        F.max(F.array_max("codes")).alias("hi"),
        F.min(F.size("codes")).alias("m_lo"),
        F.max(F.size("codes")).alias("m_hi"),
        F.count("*").alias("n"),
    ).collect()[0]
    assert stats["lo"] >= 0 and stats["hi"] < 16
    assert stats["m_lo"] == 8 and stats["m_hi"] == 8
    assert stats["n"] == emb.count()


def test_pq_codes_partition_independent(spark):
    """Codes must not depend on how the corpus is partitioned — the
    determinism contract behind the planted-recall oracle."""
    emb = _emb(spark)
    books = pq_train_codebooks(emb, m=8, ksub=16, iterations=1)
    a = pq_encode(emb.repartition(1), books).orderBy("vec_id").collect()
    b = pq_encode(emb.repartition(7, "vec_id"), books).orderBy("vec_id").collect()
    assert [(r["vec_id"], r["codes"]) for r in a] == [
        (r["vec_id"], r["codes"]) for r in b
    ]


def test_pq_recall_vs_brute_force(spark):
    """ADC shortlist (50 of ~500) + exact rerank must recover most of
    the true top-5; the pipeline is deterministic so this is a stable
    number, thresholded with slack."""
    emb = _emb(spark)
    books = pq_train_codebooks(emb, m=8, ksub=16, iterations=2)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_ann_topk(emb, queries, books, k=5, shortlist=50).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"recall@5 {recall:.2f}"
    # rerank scores of recovered pairs are exact => subset of exact pairs
    # implies matching ranks would too; pair-level recall is the gate.


def test_pq_full_shortlist_equals_brute_force(spark):
    """With shortlist >= corpus size the ADC stage can prune nothing
    and the exact rerank must reproduce brute force bit-for-bit."""
    emb = _emb(spark).filter(F.col("vec_id") < 120)
    books = pq_train_codebooks(emb, m=8, ksub=16, iterations=1)
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = sorted(
        tuple(r) for r in brute_force_topk(emb, queries, k=5).collect()
    )
    approx = sorted(
        tuple(r) for r in pq_ann_topk(emb, queries, books, k=5, shortlist=10_000).collect()
    )
    assert exact == approx


def test_kcenter_trajectory_properties(spark):
    emb = _emb(spark)
    rows = kcenter_greedy(spark, emb, k=6).orderBy("sel_round").collect()
    assert rows[0]["vec_id"] == emb.agg(F.min("vec_id")).collect()[0][0]
    assert rows[0]["maximin_dist"] is None
    ids = [r["vec_id"] for r in rows]
    assert len(set(ids)) == 6
    dists = [r["maximin_dist"] for r in rows[1:]]
    assert all(d > 0 for d in dists)
    # Gonzalez invariant: the maximin radius is non-increasing.
    assert all(a >= b for a, b in zip(dists, dists[1:]))


def test_kcenter_planted_far_point_picked_second(spark):
    """A planted point at 100× the data's scale is provably the
    farthest from the seed, so round 2 must select it."""
    emb = _emb(spark).limit(50)
    far = emb.limit(1).select(
        F.lit(999_999).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(0.0) + F.lit(1000.0)).alias(
            "embedding"
        ),
        F.lit(0).alias("label"),
    )
    rows = (
        kcenter_greedy(spark, emb.unionByName(far), k=3)
        .orderBy("sel_round")
        .collect()
    )
    assert rows[1]["vec_id"] == 999_999
