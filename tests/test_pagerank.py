"""PageRank tests (operators/pagerank.py): cycle fixed point, star-graph
ordering, mass conservation on out-edge-complete graphs, and agreement
between the deterministic-fold and plain-sum paths."""

from __future__ import annotations

import math

from kg_etl_spark.operators.pagerank import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_cycle_is_fixed_point(spark):
    # on a directed 4-cycle the uniform vector is exact at every iteration
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
    out = {r["node"]: r["rank"] for r in pagerank(e, iterations=3).collect()}
    for v in out.values():
        assert math.isclose(v, 0.25, rel_tol=1e-12)


def test_star_center_dominates(spark):
    # spokes all point at the hub (and back, so nothing dangles)
    spokes = [f"s{i}" for i in range(5)]
    pairs = [(s, "hub") for s in spokes] + [("hub", s) for s in spokes]
    out = {r["node"]: r["rank"] for r in pagerank(_edges(spark, pairs), iterations=3).collect()}
    assert out["hub"] > max(out[s] for s in spokes)
    # total mass conserved: every node has out-edges
    assert math.isclose(sum(out.values()), 1.0, rel_tol=1e-9)


def test_deterministic_fold_matches_plain_sum(spark):
    pairs = [(f"n{i}", f"n{(i * 7 + j) % 23}") for i in range(23) for j in range(1, 4)]
    pairs = list({p for p in pairs if p[0] != p[1]})
    e = _edges(spark, pairs)
    plain = {r["node"]: r["rank"] for r in pagerank(e, iterations=3).collect()}
    det = {r["node"]: r["rank"] for r in pagerank(e, iterations=3, deterministic=True).collect()}
    assert set(plain) == set(det)
    for k in plain:
        assert math.isclose(plain[k], det[k], rel_tol=1e-12, abs_tol=1e-12)


def test_dangling_mass_leaks(spark):
    # b has no out-edges: total rank sinks below 1 by design
    e = _edges(spark, [("a", "b"), ("c", "b"), ("b2", "a")])
    total = sum(r["rank"] for r in pagerank(e, iterations=2).collect())
    assert total < 1.0
