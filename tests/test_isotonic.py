"""PAV isotonic-fit tests against a brute-force reference."""

from __future__ import annotations

from kg_etl_spark.operators.isotonic import _pav, isotonic_fit


def _brute_pav(y):
    # O(n^2) reference: repeatedly merge adjacent violating pools
    pools = [[v] for v in y]
    changed = True
    while changed:
        changed = False
        for i in range(len(pools) - 1):
            m1 = sum(pools[i]) / len(pools[i])
            m2 = sum(pools[i + 1]) / len(pools[i + 1])
            if m1 > m2:
                pools[i] = pools[i] + pools[i + 1]
                del pools[i + 1]
                changed = True
                break
    out = []
    for p in pools:
        out.extend([sum(p) / len(p)] * len(p))
    return out


def test_pav_matches_brute_force():
    cases = [
        [3.0, 1.0, 2.0, 5.0, 4.0],
        [5.0, 4.0, 3.0, 2.0, 1.0],
        [1.0, 2.0, 3.0],
        [2.0, 2.0, 1.0, 3.0, 1.0, 4.0],
        [1.0],
    ]
    for y in cases:
        got = _pav(list(y), [1.0] * len(y))
        want = _brute_pav(y)
        assert all(abs(a - b) < 1e-12 for a, b in zip(got, want)), (y, got, want)
        # fit is nondecreasing
        assert all(got[i] <= got[i + 1] + 1e-12 for i in range(len(got) - 1))


def test_isotonic_fit_dataframe(spark):
    rows = [("a", 1, 3.0), ("a", 2, 1.0), ("a", 3, 2.0), ("b", 1, 1.0), ("b", 2, 2.0)]
    df = spark.createDataFrame(rows, "g string, x int, y double")
    got = {
        (r["g"], r["x"]): r["y_fit"]
        for r in isotonic_fit(df, "g", "x", "y", "x").collect()
    }
    assert got[("a", 1)] == got[("a", 2)] == got[("a", 3)] == 2.0
    assert got[("b", 1)] == 1.0 and got[("b", 2)] == 2.0
