"""BM25 / TF-IDF retrieval tests (operators/search.py): hand-checked
scores on a tiny corpus, ranking invariants, and the no-shuffle shape
(tf counting must not explode the corpus)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kg_etl_spark.operators.search import bm25_topk, tfidf_topk

DOCS = [
    (1, "spark join window spark spark"),
    (2, "join join join filter scan"),
    (3, "window window table table table table"),
    (4, "scan filter merge sort hash"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_bm25_hand_checked(spark):
    out = bm25_topk(_df(spark), ["spark"], k=4).collect()
    # N=4, df=1, avgdl=(5+5+6+5)/4=5.25
    idf = math.log(1.0 + (4 - 1 + 0.5) / (1 + 0.5))
    tf, dl = 3.0, 5.0
    expected = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / 5.25))
    rows = {r["doc_id"]: r for r in out}
    assert rows[1]["bm25"] == round(expected, 6)
    assert rows[1]["tf_0"] == 3
    # docs without the term score exactly 0
    assert rows[2]["bm25"] == 0.0 and rows[4]["bm25"] == 0.0
    # top hit first
    assert out[0]["doc_id"] == 1


def test_bm25_length_normalization_orders_equal_tf(spark):
    # same tf, shorter doc wins under b > 0
    docs = spark.createDataFrame(
        [(1, "spark join"), (2, "spark join filter scan merge sort hash table")],
        ["doc_id", "text"],
    )
    out = bm25_topk(docs, ["spark"], k=2).collect()
    assert [r["doc_id"] for r in out] == [1, 2]


def test_tfidf_hand_checked(spark):
    out = {r["doc_id"]: r for r in tfidf_topk(_df(spark), ["join"], k=4).collect()}
    # df=2, N=4 → idf=ln(1+2)=ln 3; doc 2: tf=3 → (1+ln 3)·ln 3
    assert out[2]["tfidf"] == round((1 + math.log(3.0)) * math.log(3.0), 6)
    assert out[1]["tfidf"] == round(1.0 * math.log(3.0), 6)
    assert out[3]["tfidf"] == 0.0


def test_bm25_plan_has_no_explode_or_extra_shuffle(spark):
    plan = bm25_topk(_df(spark), ["spark", "join"], k=2)._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan  # no explode of the corpus
    # one aggregate round-trip + broadcast back; top-k never global-sorts
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_token_pmi_finds_planted_collocation(spark):
    from kg_etl_spark.operators.search import token_pmi_pairs

    # "neural network" co-occurs in 6 docs; filler words co-occur with
    # everything; "rare" appears once (below min_df, excluded)
    rows = [(i, "neural network the of and extra%d" % i) for i in range(6)]
    rows += [
        (10 + i, "the of and filler%d%s" % (i % 2, " rare" if i == 0 else ""))
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = token_pmi_pairs(df, min_df=3, max_df=100, k=5).collect()
    assert out, "no pairs found"
    top = out[0]
    assert {top["w1"], top["w2"]} == {"network", "neural"}
    assert top["n_docs_together"] == 6
    # perfect collocation: PMI = ln(N * 6 / (6*6)) = ln(12/6) = ln 2
    import math
    assert abs(top["pmi"] - round(math.log(12 * 6 / 36), 6)) < 1e-9
    # the df window drops sub-min_df tokens entirely
    assert all("rare" not in (r["w1"], r["w2"]) for r in out)
