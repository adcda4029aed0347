"""Round-6 catalog additions: brute-force / property cross-checks
(the COVERAGE.md discipline — every oracle row also carries an
independent in-process check)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kg_etl_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_global_type_transitions_brute_force(spark):
    rows = QUERIES["global_type_transitions"](spark, SF).collect()
    assert rows
    ev = sorted(
        spark.read.parquet(SF + "/events.parquet")
        .select("ts", "event_id", "event_type")
        .collect(),
        key=lambda r: (r["ts"], r["event_id"]),
    )
    from collections import Counter

    pairs = Counter(
        (ev[i]["event_type"], ev[i + 1]["event_type"]) for i in range(len(ev) - 1)
    )
    k = len({r["event_type"] for r in ev})
    tot = Counter()
    for (f, _t), n in pairs.items():
        tot[f] += n
    got = {(r["from_type"], r["to_type"]): (r["n_trans"], r["prob"]) for r in rows}
    assert set(got) == set(pairs)
    for key, n in pairs.items():
        gn, gp = got[key]
        assert gn == n
        assert abs(gp - (n + 1) / (tot[key[0]] + k)) < 1e-6
    # Laplace-smoothed rows of the FULL matrix sum to 1: observed rows
    # cover (n+1) terms; the k - |observed| missing cells add 1/(tot+k)
    for f in tot:
        seen = sum((n + 1) / (tot[f] + k) for (a, _b), n in pairs.items() if a == f)
        missing = (k - sum(1 for (a, _b) in pairs if a == f)) / (tot[f] + k)
        assert abs(seen + missing - 1.0) < 1e-9


def test_containment_planted_snippet(spark):
    # a short doc fully embedded in a longer one must score exactly 1.0
    # even though its Jaccard is well under any symmetric threshold
    from kg_etl_spark.operators.dedup import ngram_containment_pairs, ngram_jaccard_pairs

    snippet = "alpha beta gamma delta epsilon zeta"
    long_doc = "zero one two three " + snippet + " four five six seven eight nine ten"
    df = spark.createDataFrame(
        [(1, long_doc), (2, snippet), (3, "unrelated words only here today")],
        "doc_id long, text string",
    )
    got = {
        (r["a_id"], r["b_id"]): r["containment"]
        for r in ngram_containment_pairs(df, "doc_id", n=3, threshold=0.9).collect()
    }
    assert got == {(1, 2): 1.0}
    jac = ngram_jaccard_pairs(df, "doc_id", n=3, threshold=0.5).collect()
    assert not jac  # symmetric Jaccard misses the inclusion


def test_bh_fdr_brute_force(spark):
    rows = QUERIES["bh_fdr_nations"](spark, SF01).collect()
    assert len(rows) == 25
    # recompute BH from the reported (p, rank): reject exactly ranks <= k
    ranked = sorted(rows, key=lambda r: r["rk"])
    ks = [r["rk"] for r in ranked if r["p_bound"] <= 0.10 * r["rk"] / 25]
    k = max(ks) if ks else 0
    for r in ranked:
        assert r["rejected"] == (r["rk"] <= k)
    # p is the Chebyshev bound of z (6 dp rounding tolerance)
    for r in rows:
        want = min(1.0, 1.0 / (r["z"] ** 2)) if abs(r["z"]) > 1 else 1.0
        assert abs(r["p_bound"] - want) < 1e-3


def test_cv_fold_metrics_pandas_cross_check(spark):
    rows = QUERIES["cv_fold_metrics"](spark, SF).collect()
    assert {r["fold"] for r in rows} == set(range(5))
    cust = spark.read.parquet(SF + "/customer.parquet").select(
        "c_custkey", "c_acctbal"
    ).collect()
    A, M = 2654435761, 1 << 32
    folds = {}
    for r in cust:
        folds.setdefault((r["c_custkey"] * A) % M % 5, []).append(
            round(r["c_acctbal"], 6)
        )
    tot_n = sum(len(v) for v in folds.values())
    tot_s = sum(sum(v) for v in folds.values())
    for r in rows:
        v = folds[r["fold"]]
        assert r["n_rows"] == len(v)
        assert math.isclose(r["fold_mean"], sum(v) / len(v), abs_tol=1e-4)
        pred = (tot_s - sum(v)) / (tot_n - len(v))
        assert math.isclose(r["oof_pred"], pred, abs_tol=1e-4)
        mse = sum((x - pred) ** 2 for x in v) / len(v)
        assert math.isclose(r["oof_mse"], mse, rel_tol=1e-4)
