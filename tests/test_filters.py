"""Corpus-filter pack: Gopher rules, C4 line cleaning, duplicate spans,
source capping, surprisal tertiles, RRF fusion."""

from __future__ import annotations

from pyspark.sql import functions as F

from kg_etl_spark.operators.filters import (
    c4_line_filter,
    duplicate_span_flags,
    gopher_quality_flags,
    source_cap_sample,
    surprisal_tertile_buckets,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gopher_rules_fire_individually(spark):
    long_good = " ".join(["the", "cat", "sat", "and", "ran"] * 12)  # 60 words
    rows = [
        (1, long_good),  # passes everything
        (2, "the and of"),  # too few words
        (3, " ".join(["extraordinarily"] * 60)),  # mean len 15 > 10, no stops
        (4, " ".join(["the", "of"] * 30) + " " + " ".join(["#"] * 10)),  # symbols+alpha
    ]
    out = {
        r["doc_id"]: r
        for r in gopher_quality_flags(_docs(spark, rows)).collect()
    }
    assert out[1]["pass_gopher"] and out[1]["r_word_count"] and out[1]["r_stopwords"]
    assert not out[2]["r_word_count"] and out[2]["r_stopwords"]
    assert not out[3]["r_mean_word_len"] and not out[3]["r_stopwords"]
    assert not out[4]["r_symbol_ratio"]  # 10 symbols / 70 words > 0.1
    assert out[4]["alpha_frac"] < 1.0  # the 10 '#' words carry no letter
    assert out[4]["stop_hits"] == 2  # 'the' and 'of'


def test_gopher_symbol_occurrences_count_ellipsis_blocks(spark):
    out = gopher_quality_flags(_docs(spark, [(1, "a ... b ...... c #")])).collect()[0]
    # '...' twice in the 6-dot run + once standalone, plus one '#'
    assert out["symbol_ratio"] > 0


def test_c4_line_filter_rules(spark):
    text = "\n".join(
        [
            "this line has five good words.",  # kept
            "short line.",  # < 5 words
            "this line has no terminal punctuation here",  # no punct
            "this javascript line would otherwise be kept.",  # banned
            'a quoted ending also counts as terminal."',  # kept
        ]
    )
    out = c4_line_filter(_docs(spark, [(1, text)])).collect()[0]
    assert out["n_lines"] == 5
    assert out["n_kept"] == 2
    assert abs(out["kept_ratio"] - 0.4) < 1e-9


def test_c4_empty_keep_is_stable_md5(spark):
    out = c4_line_filter(_docs(spark, [(1, "nothing survives here")])).collect()[0]
    assert out["n_kept"] == 0
    assert out["kept_md5"] == "d41d8cd98f00b204e9800998ecf8427e"  # md5("")


def test_duplicate_span_flags_planted(spark):
    shared = "alpha beta gamma delta epsilon"  # one shared 5-gram
    rows = [
        (1, shared + " zeta eta theta iota kappa"),
        (2, shared + " one two three four five"),
        (3, "totally unique words without any overlap at all"),
        (4, "tiny doc"),  # < 5 tokens -> zero spans
    ]
    out = {r["doc_id"]: r for r in duplicate_span_flags(_docs(spark, rows)).collect()}
    assert out[1]["n_dup_spans"] == 1 and out[2]["n_dup_spans"] == 1
    assert out[3]["n_dup_spans"] == 0 and out[3]["n_spans"] == 4
    assert out[4]["n_spans"] == 0 and out[4]["dup_ratio"] == 0.0
    assert len(out) == 4


def test_source_cap_deterministic_across_partitioning(spark):
    rows = [(i, f"src{i % 3}", f"text {i}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    a = source_cap_sample(df, cap=5).select("doc_id", "keep_rank").collect()
    b = (
        source_cap_sample(df.repartition(7), cap=5)
        .select("doc_id", "keep_rank")
        .collect()
    )
    assert sorted((r["doc_id"], r["keep_rank"]) for r in a) == sorted(
        (r["doc_id"], r["keep_rank"]) for r in b
    )
    per_src = (
        source_cap_sample(df, cap=5).groupBy("source").count().collect()
    )
    assert all(r["count"] == 5 for r in per_src)


def test_surprisal_buckets_tertiles(spark):
    rows = [(i, ("common " * 20) if i < 6 else ("rare%d " % i) * 20) for i in range(9)]
    out = surprisal_tertile_buckets(_docs(spark, rows)).collect()
    buckets = {r["bucket"] for r in out}
    assert buckets == {"head", "middle", "tail"}
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r["avg_surprisal"])
    assert max(by_bucket["head"]) <= min(by_bucket["tail"])


def test_rrf_query_shape(spark):
    from kg_etl_spark.queries.filters import q_hybrid_rrf_search

    out = q_hybrid_rrf_search(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert 0 < len(rows) <= 25
    assert rows == sorted(rows, key=lambda r: (-r["rrf"], r["doc_id"]))
    # every row carries at least one real rank
    assert all(r["bm25_rank"] > 0 or r["emb_rank"] > 0 for r in rows)


def test_pair_metrics_confusion_counts(spark):
    from kg_etl_spark.operators.evaluation import pair_metrics

    pred = spark.createDataFrame([(1, 2), (3, 4), (5, 6)], "a_id long, b_id long")
    truth = spark.createDataFrame([(1, 2), (3, 4), (7, 8)], "a_id long, b_id long")
    m = pair_metrics(pred, truth).collect()[0]
    assert (m["tp"], m["fp"], m["fn"]) == (2, 1, 1)
    assert abs(m["precision"] - 2 / 3) < 1e-6
    assert abs(m["recall"] - 2 / 3) < 1e-6
    assert abs(m["f1"] - 2 / 3) < 1e-6


def test_pair_metrics_empty_sides(spark):
    from kg_etl_spark.operators.evaluation import pair_metrics

    empty = spark.createDataFrame([], "a_id long, b_id long")
    truth = spark.createDataFrame([(1, 2)], "a_id long, b_id long")
    m = pair_metrics(empty, truth).collect()[0]
    assert (m["tp"], m["fp"], m["fn"]) == (0, 0, 1)
    assert m["precision"] == 0.0 and m["f1"] == 0.0


def test_pareto_frontier_strict_domination_and_ties(spark):
    from kg_etl_spark.operators.filters import pareto_frontier_2d

    rows = [
        (1, 10.0, 5.0),   # frontier (best q)
        (2, 10.0, 7.0),   # dominated: same q, higher c
        (3, 8.0, 3.0),    # frontier
        (4, 8.0, 3.0),    # duplicate point: also survives
        (5, 7.0, 3.0),    # dominated by 3 (q' > q, c' <= c)
        (6, 6.0, 2.0),    # frontier
        (7, 5.0, 5.0),    # dominated by 1/3/6
    ]
    df = spark.createDataFrame(rows, "id long, q double, c double")
    got = sorted(r["id"] for r in pareto_frontier_2d(df, "q", "c", "id").collect())
    assert got == [1, 3, 4, 6]
