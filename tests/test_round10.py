"""Round-10 regression tests: the r9 ADVICE fixes (cut-frame
finalizer, memoized dispatch probe, PMI oracle ordering) and the
broadcast-hint removals' result-invariance."""

from __future__ import annotations

import gc

from pyspark.sql import functions as F


def test_externally_held_cut_survives_source_death(spark):
    """r9 ADVICE #2: the shared-cut finalizer is registered on the CUT
    frame, so a consumer holding the cut past the source's lifetime
    must keep the blocks alive (localCheckpoint has no recompute path)
    — and the blocks must release once the LAST handle drops."""
    from kg_etl_spark.cutpoint import SHARED_CUT_RDD_IDS, is_shared_cut
    from kg_etl_spark.operators.adjacent import undirected_transition_edges_cut

    sc = spark.sparkContext

    def build():
        before = {
            i for app, i in SHARED_CUT_RDD_IDS if app == sc.applicationId
        }
        ev = spark.range(1200).select(
            F.col("id").alias("event_id"),
            F.concat(F.lit("t"), (F.col("id") % 3).cast("string")).alias(
                "event_type"
            ),
            (F.col("id") * 37 % 101).alias("user_id"),
            F.timestamp_seconds(F.col("id") * 7 % 99_991).alias("ts"),
        )
        cut = undirected_transition_edges_cut(ev)
        cut.count()
        mine = {
            i for app, i in SHARED_CUT_RDD_IDS if app == sc.applicationId
        } - before
        ids = {
            int(jid)
            for jid in sc._jsc.getPersistentRDDs().keys()
            if int(jid) in mine
        }
        return cut, ids  # SOURCE ev dies here; the cut survives

    cut, ids = build()
    assert ids, "shared cut registered no persisted blocks"
    gc.collect()  # source frame is gone; cut is still externally held
    live = {int(jid) for jid in sc._jsc.getPersistentRDDs().keys()}
    assert ids <= live, (
        f"blocks of an externally-held cut were released: {ids - live}"
    )
    for i in ids:
        assert is_shared_cut(sc, i), f"held cut id {i} lost its shield"
    # the held frame must still be usable (no block-not-found)
    assert cut.count() >= 0
    del cut
    gc.collect()  # last handle gone -> finalizer fires
    for i in ids:
        assert not is_shared_cut(sc, i), f"dead cut id {i} still shielded"
    live = {int(jid) for jid in sc._jsc.getPersistentRDDs().keys()}
    assert not (ids & live), f"dead cut blocks still persisted: {ids & live}"


def test_adaptive_dispatch_count_memoized(spark):
    """r9 ADVICE #3: the size-dispatch probe must run at most one
    count job per source frame — warm calls reuse the weak memo, and a
    caller-supplied n_docs skips the probe entirely."""
    from kg_etl_spark.operators import dedup as dd

    df = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i}") for i in range(60)],
        "doc_id long, text string",
    )
    calls = {"n": 0}
    real_count = type(df).count

    def counting_count(self):
        calls["n"] += 1
        return real_count(self)

    try:
        type(df).count = counting_count
        dd.ngram_jaccard_pairs_adaptive(df, "doc_id", threshold=0.5)
        dd.ngram_jaccard_pairs_adaptive(df, "doc_id", threshold=0.5)
        dd.ngram_jaccard_pairs_adaptive(df, "doc_id", threshold=0.5)
    finally:
        type(df).count = real_count
    assert calls["n"] == 1, f"dispatch probe ran {calls['n']} count jobs"
    assert dd._NDOCS_MEMO.get(df) == 60
    # explicit n_docs must not touch the probe at all
    df2 = df.filter(F.col("doc_id") >= 0)
    try:
        type(df).count = counting_count
        out = dd.ngram_jaccard_pairs_adaptive(
            df2, "doc_id", threshold=0.5, n_docs=60
        )
    finally:
        type(df).count = real_count
    assert calls["n"] == 1
    assert out.columns == ["a_id", "b_id", "n_common", "jaccard"]


def test_adaptive_dispatch_branches_still_row_identical(spark, monkeypatch):
    """The memo must not change WHICH branch runs: force the prefix
    threshold down and confirm both branches still agree (the r9
    property, re-checked through the memoized path)."""
    from kg_etl_spark.operators import dedup as dd

    docs = []
    for i in range(40):
        if i % 4 == 0:
            # near-dups: 8 shared tokens + 1 unique -> jaccard 5/9
            toks = ["dup", "span", "body", "here", "now",
                    "common", "shared", "tail", f"u{i}"]
        else:
            toks = [f"w{i}a", f"w{i}b", f"w{i}c", f"w{i}d", f"w{i}e"]
        docs.append((i, " ".join(toks)))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def rows(out):
        return sorted(
            (r["a_id"], r["b_id"], r["n_common"], r["jaccard"])
            for r in out.collect()
        )

    plain = rows(dd.ngram_jaccard_pairs_adaptive(df, "doc_id", threshold=0.5))
    monkeypatch.setattr(dd, "PREFIX_JOIN_MIN_DOCS", 1)
    pref = rows(dd.ngram_jaccard_pairs_adaptive(df, "doc_id", threshold=0.5))
    assert plain and plain == pref
