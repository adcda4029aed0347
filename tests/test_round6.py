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


def test_mann_kendall_brute_force(spark):
    rows = {r["event_type"]: r for r in QUERIES["mann_kendall_trend"](spark, SF).collect()}
    ev = spark.read.parquet(SF + "/events.parquet").select("event_type", "ts").collect()
    from collections import Counter

    daily = Counter()
    for r in ev:
        us = int(r["ts"].timestamp() * 1_000_000)
        daily[(r["event_type"], us // 86_400_000_000)] += 1
    series = {}
    for (et, day), c in daily.items():
        series.setdefault(et, []).append((day, c))
    for et, pts in series.items():
        pts.sort()
        cs = [c for _d, c in pts]
        n = len(cs)
        s = sum(
            (cs[j] > cs[i]) - (cs[j] < cs[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        tie = sum(
            t * (t - 1) * (2 * t + 5) for t in Counter(cs).values()
        )
        var = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
        r = rows[et]
        assert r["n_days"] == n and r["s_stat"] == s
        assert math.isclose(r["var_s"], var, abs_tol=1e-6)
        if s > 0 and var > 0:
            z = (s - 1) / math.sqrt(var)
        elif s < 0 and var > 0:
            z = (s + 1) / math.sqrt(var)
        else:
            z = 0.0
        assert math.isclose(r["z"], z, abs_tol=1e-6)


def test_ipw_ate_brute_force(spark):
    got = QUERIES["ipw_ate"](spark, SF).collect()[0]
    cust = spark.read.parquet(SF + "/customer.parquet").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    ).collect()
    orders = spark.read.parquet(SF + "/orders.parquet").select(
        "o_custkey", "o_orderpriority"
    ).collect()
    urgent = {r["o_custkey"] for r in orders if r["o_orderpriority"] == "1-URGENT"}
    from collections import Counter

    n_seg, n_treat = Counter(), Counter()
    for r in cust:
        n_seg[r["c_mktsegment"]] += 1
        n_treat[r["c_mktsegment"]] += r["c_custkey"] in urgent
    terms, n_used, n_treated = [], 0, 0
    for r in cust:
        seg = r["c_mktsegment"]
        if n_treat[seg] == 0 or n_treat[seg] == n_seg[seg]:
            continue
        e = n_treat[seg] / n_seg[seg]
        t = r["c_custkey"] in urgent
        terms.append(round(r["c_acctbal"] / e, 6) if t else round(-r["c_acctbal"] / (1 - e), 6))
        n_used += 1
        n_treated += t
    assert got["n_used"] == n_used and got["n_treated"] == n_treated
    assert math.isclose(got["ate_ipw"], sum(terms) / n_used, abs_tol=1e-4)


def test_weighted_priority_sample_brute_force(spark):
    got = sorted(
        tuple(r) for r in QUERIES["weighted_priority_sample"](spark, SF).collect()
    )
    docs = spark.read.parquet(SF + "/documents.parquet").select(
        "lang", "doc_id", "n_chars"
    ).collect()
    A, M = 2654435761, 1 << 32
    per = {}
    for r in docs:
        if r["n_chars"] and r["n_chars"] > 0:
            prio = ((r["doc_id"] * A) % M) / r["n_chars"]
            per.setdefault(r["lang"], []).append((prio, r["doc_id"], r["n_chars"]))
    want = []
    for lang, lst in per.items():
        lst.sort()
        for i, (_p, did, nc) in enumerate(lst[:3], start=1):
            want.append((lang, did, nc, i))
    assert got == sorted(want)


def test_nelson_aalen_brute_force(spark):
    rows = QUERIES["nelson_aalen_hazard"](spark, SF).collect()
    assert rows
    ev = spark.read.parquet(SF + "/events.parquet").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    per = {}
    for r in sorted(ev, key=lambda r: (r["ts"], r["event_id"])):
        day = int(r["ts"].timestamp() * 1_000_000) // 86_400_000_000
        u = per.setdefault(r["user_id"], {"first": day, "last": day, "cohort": r["event_type"]})
        u["first"] = min(u["first"], day)
        u["last"] = max(u["last"], day)
    mx = max(u["last"] for u in per.values())
    from collections import defaultdict

    cells = defaultdict(lambda: [0, 0])  # (cohort, t) -> [d, exits]
    totals = defaultdict(int)
    for u in per.values():
        t = u["last"] - u["first"]
        cells[(u["cohort"], t)][0] += u["last"] <= mx - 7
        cells[(u["cohort"], t)][1] += 1
        totals[u["cohort"]] += 1
    import decimal

    want = {}
    for cohort in totals:
        at_risk = totals[cohort]
        cum = decimal.Decimal(0)
        for t in sorted(t for (c, t) in cells if c == cohort):
            d, exits = cells[(cohort, t)]
            cum += decimal.Decimal(str(round(d / at_risk, 8)))
            want[(cohort, t)] = (at_risk, d, round(float(cum), 6))
            at_risk -= exits
    got = {(r["cohort"], r["t"]): (r["n_at_risk"], r["n_churned"], r["cum_hazard"]) for r in rows}
    assert got == want


def test_diff_in_differences_brute_force(spark):
    got = QUERIES["diff_in_differences"](spark, SF).collect()[0]
    cust = {
        r["c_custkey"]: r["c_mktsegment"] == "BUILDING"
        for r in spark.read.parquet(SF + "/customer.parquet").collect()
    }
    import datetime

    pivot = datetime.datetime(1998, 1, 1)
    from collections import defaultdict

    cells = defaultdict(lambda: [0, 0.0])
    for r in spark.read.parquet(SF + "/orders.parquet").collect():
        key = (cust[r["o_custkey"]], r["o_orderdate"] >= pivot)
        cells[key][0] += 1
        cells[key][1] += round(r["o_totalprice"], 2)
    m = {k: v[1] / v[0] for k, v in cells.items()}
    did = (m[(True, True)] - m[(True, False)]) - (m[(False, True)] - m[(False, False)])
    assert got["n_orders"] == sum(v[0] for v in cells.values())
    assert math.isclose(got["did"], did, abs_tol=1e-4)
    assert math.isclose(got["treated_pre"], m[(True, False)], abs_tol=1e-4)


def test_source_jsd_brute_force_and_bounds(spark):
    rows = QUERIES["source_js_divergence"](spark, SF).collect()
    assert len(rows) == 20
    docs = spark.read.parquet(SF + "/documents.parquet").select("source", "text").collect()
    from collections import Counter

    per, glob = {}, Counter()
    for r in docs:
        toks = [t for t in r["text"].lower().strip().split() if t]
        per.setdefault(r["source"], Counter()).update(toks)
        glob.update(toks)
    ng = sum(glob.values())
    ln2 = math.log(2.0)
    for r in rows:
        cnt = per[r["source"]]
        ns = sum(cnt.values())
        assert r["n_tokens"] == ns
        jsd = 0.0
        gmass = 0.0
        for t, c in cnt.items():
            p, g = c / ns, glob[t] / ng
            mmix = (p + g) / 2
            jsd += 0.5 * (p * math.log(p / mmix) + g * math.log(g / mmix))
            gmass += g
        jsd += 0.5 * ln2 * (1 - gmass)
        assert math.isclose(r["jsd_nats"], jsd, abs_tol=1e-5)
        assert -1e-9 <= r["jsd_nats"] <= ln2 + 1e-9


def test_edge_jaccard_brute_force(spark):
    rows = QUERIES["edge_jaccard_features"](spark, SF01).collect()
    assert rows
    from kg_etl_spark.queries.ml import _LP_HUB_CAP, _user_graph

    edges = {(r["a"], r["b"]) for r in _user_graph(spark, SF01).collect()}
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    got = {(r["a"], r["b"]): (r["cn"], r["deg_a"], r["deg_b"], r["jaccard"]) for r in rows}
    assert set(got) == edges
    for (a, b), (cn, da, db, jac) in got.items():
        want_cn = sum(
            1 for z in adj[a] & adj[b] if len(adj[z]) <= _LP_HUB_CAP
        )
        assert cn == want_cn
        assert (da, db) == (len(adj[a]), len(adj[b]))
        assert abs(jac - want_cn / (da + db - want_cn)) < 1e-6


def test_grouped_topk_matches_plain_window(spark):
    from kg_etl_spark.operators.topk import grouped_topk, topk_per_group

    df = spark.range(5000).select(
        (F.col("id") % 3).alias("g"),
        ((F.col("id") * 48271) % 1009).alias("v"),
        F.col("id").alias("tid"),
    ).repartition(13)  # arbitrary physical layout
    order = [F.col("v").desc(), F.col("tid").asc()]
    got = grouped_topk(df, ["g"], order, 7, out_rank="rk")
    want = topk_per_group(df, ["g"], order, 7, out_rank="rk")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
