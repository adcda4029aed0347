"""feature_propagation: hand-checked tiny-graph trajectory, isolated
nodes, and the half-up fixed-point rules."""

from __future__ import annotations

from kg_etl_spark.operators.propagation import feature_propagation


def _run(spark, edges, feats, rounds=1):
    e = spark.createDataFrame(edges, "src long, dst long")
    f = spark.createDataFrame(feats, "node long, feat_micro long")
    out = feature_propagation(e, f, rounds=rounds)
    return {r["node"]: r["feat_micro"] for r in out.collect()}


def test_one_round_hand_computed(spark):
    # 1 -- 2 (mutual), features 0 and 1_000_000; α = 1/2
    # mean(1) = 1_000_000, blend = (0 + 1_000_000) / 2 = 500_000
    got = _run(
        spark,
        [(1, 2), (2, 1)],
        [(1, 0), (2, 1_000_000)],
    )
    assert got == {1: 500_000, 2: 500_000}


def test_half_up_rounding_on_odd_sums(spark):
    # node 1's neighbors: 0 and 1 micro -> mean = round_half_up(1/2) = 1
    # blend = floor((2*0 + 2*1 + 2)/4) = 1
    got = _run(
        spark,
        [(2, 1), (3, 1)],
        [(1, 0), (2, 0), (3, 1)],
    )
    assert got[1] == 1


def test_isolated_node_keeps_feature(spark):
    got = _run(spark, [(1, 2), (2, 1)], [(1, 10), (2, 10), (99, 777)])
    assert got[99] == 777


def test_two_rounds_converge_toward_neighborhood(spark):
    # star: center 1 <-> leaves 2,3; leaves also see only the center
    got = _run(
        spark,
        [(1, 2), (2, 1), (1, 3), (3, 1)],
        [(1, 0), (2, 4_000_000), (3, 4_000_000)],
        rounds=2,
    )
    # r1: c = blend(0, 4M) = 2M; leaves = blend(4M, 0) = 2M
    # r2: all neighbors at 2M -> everything stays 2M
    assert got == {1: 2_000_000, 2: 2_000_000, 3: 2_000_000}
