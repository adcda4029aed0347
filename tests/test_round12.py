"""Round-12 optimization contracts.

Pins the operator-internal changes of the second optimization round:
the chunked betweenness emptiness probes (trailing-empty trim must
land exactly where the old per-level break did), the spectral
edges_distinct caller contract (and its failure mode when the caller
lies — the r11 ADVICE ask, mirrored from the hits/betweenness
precedent), and the fellegi dropped-count probe riding the pattern
job (the warning and its count must survive the fusion).
"""

import warnings

import pytest


def _sym(spark, pairs):
    e = spark.createDataFrame(pairs, ["src", "dst"])
    return e.union(e.select(e.dst.alias("src"), e.src.alias("dst")))


def test_betweenness_chunk_trim_on_p4(spark):
    """P4 path, default max_depth=6: BFS exhausts at depth 4 — the
    SECOND probe chunk (levels 4-6) is entirely empty and must be
    trimmed whole, reproducing the old per-level break exactly.
    Exact values: node i of P_n carries 2·i·(n−1−i) with σ ≡ 1."""
    from kg_etl_spark.operators.centrality import betweenness_sampled

    sym = _sym(spark, [(i, i + 1) for i in range(3)])
    bc = {r["node"]: r["bc"] for r in betweenness_sampled(sym, k_pivots=4).collect()}
    assert bc == {0: 0.0, 1: 4.0, 2: 4.0, 3: 0.0}


def test_betweenness_exhausts_mid_chunk(spark):
    """Star K1,3: depth 2 from leaf pivots — exhaustion lands INSIDE
    the first probe chunk (level 3 of 3 empty), trimming one level of
    a kept chunk. Center carries all 6 ordered leaf pairs."""
    from kg_etl_spark.operators.centrality import betweenness_sampled

    sym = _sym(spark, [(0, 1), (0, 2), (0, 3)])
    bc = {r["node"]: r["bc"] for r in betweenness_sampled(sym, k_pivots=4).collect()}
    assert bc == {0: 6.0, 1: 0.0, 2: 0.0, 3: 0.0}


def test_betweenness_max_depth_ends_chunk_loop(spark):
    """P5 with max_depth=4: the second chunk holds ONE non-empty level
    and the loop must end on the max_depth bound, not a trim."""
    from kg_etl_spark.operators.centrality import betweenness_sampled

    sym = _sym(spark, [(i, i + 1) for i in range(4)])
    bc = {
        r["node"]: r["bc"]
        for r in betweenness_sampled(sym, k_pivots=5, max_depth=4).collect()
    }
    assert bc == {0: 0.0, 1: 6.0, 2: 8.0, 3: 6.0, 4: 0.0}


def test_spectral_edges_distinct_contract_equivalence(spark):
    """For a genuinely distinct strict a<b frame, edges_distinct=True
    must be a pure optimization: bit-identical output."""
    from kg_etl_spark.operators.spectral import spectral_bisection

    pairs = [(1, 2), (2, 3), (3, 4), (1, 4), (4, 5), (5, 6), (5, 7), (6, 7)]
    df = spark.createDataFrame(pairs, ["a_id", "b_id"])
    base = sorted(map(tuple, spectral_bisection(df, iterations=3).collect()))
    fast = sorted(
        map(tuple, spectral_bisection(df, iterations=3, edges_distinct=True).collect())
    )
    assert base == fast


def test_spectral_edges_distinct_lie_changes_values(spark):
    """Failure-mode pin (r11 ADVICE pattern): a caller passing a
    DUPLICATED pair frame with edges_distinct=True silently
    double-counts degrees and neighbor sums — the output must differ
    from the deduplicated truth, documenting that the flag is a real
    caller-asserted invariant, not a no-op."""
    from kg_etl_spark.operators.spectral import spectral_bisection

    # the duplicated edge must weight a neighbor whose start-vector
    # parity differs from the node's other neighbors, else the ±1
    # parity seed makes the inflated sums cancel (measured: symmetric
    # duplicates leave every iterate bit-identical on small graphs)
    clean = [(1, 2), (1, 3), (2, 3), (3, 4)]
    dirty = clean + [(1, 2)]
    truth = sorted(
        map(
            tuple,
            spectral_bisection(
                spark.createDataFrame(clean, ["a_id", "b_id"]), iterations=3
            ).collect(),
        )
    )
    lied = sorted(
        map(
            tuple,
            spectral_bisection(
                spark.createDataFrame(dirty, ["a_id", "b_id"]),
                iterations=3,
                edges_distinct=True,
            ).collect(),
        )
    )
    assert truth != lied


def test_fellegi_dropped_warning_survives_probe_fusion(spark):
    """The dropped-count probe now rides the pattern-count job as a
    union branch; the RuntimeWarning and its exact count must be
    unchanged. 250 customers in one (nation, balance-block) block with
    a 200 cap -> 50 dropped."""
    from kg_etl_spark.queries.analytic import fellegi_sunter_em

    rows = [(i, 0, "SEG%d" % (i % 3), 500.0 + (i % 7)) for i in range(1, 251)]
    cust = spark.createDataFrame(
        rows, ["c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"]
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = fellegi_sunter_em(cust).collect()
    assert len(out) == 7  # lambda + 3 m + 3 u
    dropped_warnings = [
        w for w in caught if issubclass(w.category, RuntimeWarning)
        and "beyond the per-block cap" in str(w.message)
    ]
    assert len(dropped_warnings) == 1
    assert "50 customers" in str(dropped_warnings[0].message)


def test_fellegi_no_warning_under_cap(spark):
    from kg_etl_spark.queries.analytic import fellegi_sunter_em

    rows = [(i, i % 5, "S%d" % (i % 2), 100.0 * i) for i in range(1, 41)]
    cust = spark.createDataFrame(
        rows, ["c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"]
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = fellegi_sunter_em(cust).collect()
    assert len(out) == 7
    assert not [
        w for w in caught if "beyond the per-block cap" in str(w.message)
    ]
