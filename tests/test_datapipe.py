"""Training-data pipeline operator tests (datapipe.py): determinism of
hash splits/samples, quota binding, PII masking, repetition features,
contamination flagging."""

from __future__ import annotations

from pyspark.sql import functions as F

from kg_etl_spark.operators.datapipe import (
    benchmark_contamination,
    hash_bucket,
    quota_sample,
    redact_pii,
    repetition_stats,
    stratified_sample,
    train_val_test_split,
)


def test_hash_split_stable_and_partitioned(spark):
    df = spark.range(0, 10_000).withColumnRenamed("id", "doc_id")
    out = train_val_test_split(df)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    # pseudo-uniform: each 10% slice within a tolerance band
    assert 800 < counts["test"] < 1200 and 800 < counts["val"] < 1200
    # stability: same assignment on a subset (growth never reshuffles)
    sub = train_val_test_split(df.filter(F.col("doc_id") < 100))
    full = {r["doc_id"]: r["split"] for r in out.filter(F.col("doc_id") < 100).collect()}
    for r in sub.collect():
        assert full[r["doc_id"]] == r["split"]


def test_stratified_sample_proportional(spark):
    df = spark.range(0, 10_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 4).cast("string").alias("lang")
    )
    samp = stratified_sample(df, "lang", pct=20)
    per = {r["lang"]: r["n"] for r in samp.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in per.items():
        assert 350 < n < 650, (lang, n)  # ~500 each


def test_quota_sample_binds_deterministically(spark):
    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).cast("string").alias("source")
    )
    out = quota_sample(df, "source", quota=10)
    per = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per == {"0": 10, "1": 10, "2": 10}
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in quota_sample(df.repartition(13), "source", quota=10).collect())
    assert a == b  # partitioning-independent pick


def test_redact_pii(spark):
    df = spark.createDataFrame(
        [(1, "mail me at a.b+c@example.org or call 555-123-4567 now"),
         (2, "clean text")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert "<EMAIL>" in rows[1]["text"] and "<PHONE>" in rows[1]["text"]
    assert "example.org" not in rows[1]["text"]
    assert rows[1]["n_emails"] == 1 and rows[1]["n_phones"] == 1
    assert rows[2]["text"] == "clean text" and rows[2]["n_emails"] == 0


def test_repetition_stats(spark):
    df = spark.createDataFrame(
        [(1, "spam spam spam spam spam"),      # one token repeated
         (2, "all words here are unique now"),
         (3, "hi")],                           # < 3 tokens → no trigrams
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    # 3 trigrams, all "spam spam spam" → dup 1 - 1/3; top word 5/5
    assert abs(rows[1]["dup_trigram_frac"] - (1 - 1 / 3)) < 1e-6
    assert rows[1]["top_word_frac"] == 1.0
    assert rows[2]["dup_trigram_frac"] == 0.0
    assert abs(rows[2]["top_word_frac"] - 1 / 6) < 1e-6
    assert rows[3]["dup_trigram_frac"] == 0.0 and rows[3]["top_word_frac"] == 1.0


def test_benchmark_contamination(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "bench_id long, text string",
    )
    corpus = spark.createDataFrame(
        [(1, "prefix text the quick brown fox jumps over the lazy dog suffix"),
         (2, "totally unrelated content with nothing shared at all")],
        "doc_id long, text string",
    )
    got = {(r["doc_id"], r["bench_id"]) for r in
           benchmark_contamination(corpus, bench, probe_chars=20).collect()}
    assert got == {(1, 100)}


def test_hash_bucket_range(spark):
    df = spark.range(0, 1000).select(hash_bucket(F.col("id")).alias("b"))
    mm = df.agg(F.min("b").alias("lo"), F.max("b").alias("hi")).collect()[0]
    assert 0 <= mm["lo"] and mm["hi"] <= 99


def test_hash_bucket_large_ids_ansi_safe(spark):
    """Ids past 2^63/A (~3.5e9) must not overflow under ANSI mode (the
    default in Spark 4, and what the external driver's session runs),
    and must equal the reference (id mod 2^32)*A mod 2^32 formula."""
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    ids = [0, 1, 5_000_000_000, 2**32 - 1, 2**40 + 7, 2**62, 2**63 - 1]
    df = spark.createDataFrame([(i,) for i in ids], ["id"])
    got = {
        r["id"]: r["b"]
        for r in df.select("id", hash_bucket(F.col("id")).alias("b")).collect()
    }
    a, m = 2654435761, 2**32
    for i in ids:
        assert got[i] == ((i % m) * a) % m % 100, i


def test_neardup_canonical_keeps_best_quality(spark):
    from kg_etl_spark.operators.dedup import neardup_canonical

    near_a = "the quick brown fox jumps over the lazy dog again and again ok"
    near_b = "the quick brown fox jumps over the lazy dog again and again"
    other = "completely different content about databases and query planning"
    df = spark.createDataFrame(
        [(1, near_a), (2, near_b), (3, other)], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in neardup_canonical(df, threshold=0.5).collect()}
    # 1 and 2 cluster together under min-id label; 3 is a singleton
    assert out[1]["cluster_id"] == out[2]["cluster_id"] == 1
    assert out[3]["cluster_id"] == 3 and out[3]["is_kept"]
    # exactly one keeper per cluster, and it's the argmax-quality member
    keep = [r for r in out.values() if r["is_kept"]]
    assert len(keep) == 2
    best = max((out[1], out[2]), key=lambda r: (r["quality_score"], -r["doc_id"]))
    assert out[best["doc_id"]]["is_kept"]


def test_weighted_sample_prefers_heavy_rows(spark):
    from kg_etl_spark.operators.datapipe import weighted_sample

    # weight 1000 vs weight 1: heavy rows should dominate a small sample
    rows = [(i, 1000 if i % 2 == 0 else 1) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    out = weighted_sample(df, "w", k=20).collect()
    heavy = sum(1 for r in out if r["w"] == 1000)
    assert heavy >= 15  # inclusion odds proportional to weight
    # deterministic: same sample on re-run
    again = weighted_sample(df, "w", k=20).collect()
    assert [r["doc_id"] for r in out] == [r["doc_id"] for r in again]
    # non-positive weights never sampled
    df2 = spark.createDataFrame([(1, 0), (2, -5), (3, 7)], ["doc_id", "w"])
    ids = [r["doc_id"] for r in weighted_sample(df2, "w", k=3).collect()]
    assert ids == [3]


def test_dedup_lines_removes_cross_doc_boilerplate(spark):
    from kg_etl_spark.operators.datapipe import dedup_lines

    docs = spark.createDataFrame(
        [
            (1, "unique body one\nFOOTER\n\nlast line one"),
            (2, "unique body two\nFOOTER"),
            (3, "solo doc, untouched"),
            (4, "FOOTER"),  # every line removed -> empty text
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup_lines(docs).collect()}
    assert out[1]["text"] == "unique body one\n\nlast line one"
    assert out[1]["n_removed_lines"] == 1
    assert out[2]["text"] == "unique body two"
    assert out[3]["text"] == "solo doc, untouched"
    assert out[3]["n_removed_lines"] == 0
    assert out[4]["text"] == "" and out[4]["n_removed_lines"] == 1


def test_dedup_lines_min_docs_threshold(spark):
    from kg_etl_spark.operators.datapipe import dedup_lines

    docs = spark.createDataFrame(
        [(1, "shared"), (2, "shared"), (3, "shared")], "doc_id long, text string"
    )
    # min_docs=4: nothing removed
    kept = dedup_lines(docs, min_docs=4).filter("n_removed_lines > 0").count()
    assert kept == 0


def test_bloom_contamination_matches_exact(spark):
    """The Bloom prefilter must be pair-identical to the exact sweep —
    even with a deliberately tiny, collision-heavy filter (false
    positives die in the verify join; no false negatives exist)."""
    from kg_etl_spark.operators.datapipe import (
        bloom_ngram_contamination,
        ngram_contamination,
    )

    words = lambda lo, hi: " ".join(f"w{i}" for i in range(lo, hi))
    corpus = spark.createDataFrame(
        [(1, words(0, 20)), (2, words(100, 120)), (3, words(5, 18))],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(50, words(0, 16)), (51, words(200, 216))], ["bench_id", "text"]
    )
    exact = {
        tuple(r) for r in ngram_contamination(corpus, bench, n=13).collect()
    }
    assert exact  # doc 1 shares 13-grams with bench 50
    for m_bits in (1 << 16, 64):  # honest size and a collision trap
        got = {
            tuple(r)
            for r in bloom_ngram_contamination(
                corpus, bench, n=13, m_bits=m_bits
            ).collect()
        }
        assert got == exact, m_bits


def test_unigram_surprisal_ranks_rare_words_higher(spark):
    from kg_etl_spark.operators.textquality import unigram_surprisal

    common = "the cat sat on the mat " * 5
    rows = [(1, common), (2, common), (3, common), (4, "zyx qwv jkl pnm")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in unigram_surprisal(df, vocab_size=100).collect()}
    assert out[4]["n_tokens"] == 4
    # doc of corpus-rare words must be strictly more surprising
    assert out[4]["avg_surprisal"] > out[1]["avg_surprisal"]
    # identical docs score identically
    assert out[1]["avg_surprisal"] == out[2]["avg_surprisal"] == out[3]["avg_surprisal"]


def test_dsir_weights_favor_target_like_docs(spark):
    from kg_etl_spark.operators.datapipe import dsir_weights

    target_text = "clean prose about science and method " * 3
    rows = [
        (1, target_text, 1),
        (2, target_text, 1),
        (3, "clean prose about science and method once more", 0),  # target-like
        (4, "zz yy xx ww vv uu tt ss", 0),                         # target-unlike
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "is_en"])
    exact = {
        r["doc_id"]: r
        for r in dsir_weights(df, is_target=F.col("is_en") == 1).collect()
    }
    assert exact[3]["dsir_weight"] > exact[4]["dsir_weight"]

    # hashed-bucket scale mode agrees with the exact mode when the
    # bucket space is collision-free for this vocabulary
    bucketed = {
        r["doc_id"]: r
        for r in dsir_weights(
            df, is_target=F.col("is_en") == 1, n_buckets=1 << 30
        ).collect()
    }
    for d in exact:
        assert bucketed[d]["n_feats"] == exact[d]["n_feats"]
        # same ordering and near-equal values (smoothing denominator
        # differs: |buckets| vs |gram types|)
        assert (bucketed[3]["dsir_weight"] > bucketed[4]["dsir_weight"])


def test_incremental_dedup_idempotent_and_cross_batch(spark):
    from kg_etl_spark.operators.incremental import incremental_exact_dedup

    hist = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    from kg_etl_spark.operators.textquality import fingerprint
    from pyspark.sql import functions as F

    seen = hist.select(fingerprint(F.col("text"), "md5").alias("fp")).distinct()
    batch = spark.createDataFrame(
        [
            (10, "alpha  beta"),   # dup of history (whitespace-normalized)
            (11, "epsilon zeta"),  # fresh
            (12, "epsilon zeta"),  # in-batch dup of 11
            (13, "ETA theta"),     # fresh (case-normalized unique)
        ],
        "doc_id long, text string",
    )
    fresh, new_fps = incremental_exact_dedup(batch, seen)
    assert sorted(r["doc_id"] for r in fresh.collect()) == [11, 13]
    assert new_fps.count() == 2
    # replay: with the store updated, the same batch yields nothing
    seen2 = seen.unionByName(new_fps).distinct()
    fresh2, _ = incremental_exact_dedup(batch, seen2)
    assert fresh2.count() == 0


def test_bigram_surprisal_flags_scrambled_word_order(spark):
    from kg_etl_spark.operators.textquality import bigram_surprisal

    natural = "the cat sat on the mat and the dog sat on the rug"
    # same unigram profile, adjacencies never seen in the natural docs
    scrambled = "mat the on dog sat rug the and cat the on sat the"
    rows = [(1, natural), (2, natural), (3, natural), (4, scrambled), (5, "solo")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in bigram_surprisal(df).collect()}
    # <2 tokens → no bigrams → excluded
    assert 5 not in out
    assert out[1]["n_bigrams"] == len(natural.split()) - 1
    # the unigram-identical scramble must score strictly higher
    assert out[4]["avg_bigram_surprisal"] > out[1]["avg_bigram_surprisal"]
    assert out[1]["avg_bigram_surprisal"] == out[2]["avg_bigram_surprisal"]


def test_quantile_normalize_aligns_shifted_sources(spark):
    from kg_etl_spark.operators.datapipe import quantile_normalize

    # source B is source A shifted by +100: after normalization the
    # k-th ranked doc of each source maps to the same global quantile
    rows = [(i, "A", float(i)) for i in range(10)]
    rows += [(100 + i, "B", 100.0 + i) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, score double")
    out = quantile_normalize(df, "score", "source", "doc_id").collect()
    by_src = {}
    for r in sorted(out, key=lambda r: (r["source"], r["score"])):
        by_src.setdefault(r["source"], []).append(r)
    assert len(by_src["A"]) == len(by_src["B"]) == 10
    for ra, rb in zip(by_src["A"], by_src["B"]):
        assert ra["pr"] == rb["pr"]
        assert ra["norm_value"] == rb["norm_value"]
    # normalized values come from the GLOBAL sorted values
    globals_sorted = sorted(r[2] for r in rows)
    for r in out:
        assert r["norm_value"] in globals_sorted
    # extremes map to global extremes
    a = by_src["A"]
    assert a[0]["norm_value"] == globals_sorted[0]
    assert a[-1]["norm_value"] == globals_sorted[-1]
