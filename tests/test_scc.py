"""SCC operator unit tests on hand-built graphs with known components
(the FW-BW-Trim kernel itself, independent of the catalog queries)."""

from __future__ import annotations

from kg_etl_spark.operators.scc import scc_sizes, strongly_connected_components


def _run(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    rows = strongly_connected_components(df).collect()
    comp = {}
    for r in rows:
        comp.setdefault(r["scc_id"], set()).add(r["node"])
    return set(frozenset(s) for s in comp.values()), {
        r["node"]: r["scc_id"] for r in rows
    }


def test_scc_textbook_graph(spark):
    # two cycles bridged by DAG edges + a tail chain
    edges = [
        (1, 2), (2, 3), (3, 1),          # SCC {1,2,3}
        (3, 4),                           # bridge
        (4, 5), (5, 6), (6, 4),          # SCC {4,5,6}
        (6, 7), (7, 8),                   # chain of singletons
    ]
    comps, ids = _run(spark, edges)
    assert comps == {
        frozenset({1, 2, 3}),
        frozenset({4, 5, 6}),
        frozenset({7}),
        frozenset({8}),
    }
    # scc_id is the min member
    assert ids[2] == 1 and ids[5] == 4 and ids[7] == 7


def test_scc_nested_back_edge(spark):
    # one big SCC formed only through a long back edge
    edges = [(1, 2), (2, 3), (3, 4), (4, 1), (2, 5)]
    comps, _ = _run(spark, edges)
    assert comps == {frozenset({1, 2, 3, 4}), frozenset({5})}


def test_scc_self_loops_and_dups(spark):
    edges = [(1, 1), (1, 2), (1, 2), (2, 1), (3, 3), (2, 4)]
    comps, _ = _run(spark, edges)
    # 3 only appears via a self-loop -> dropped with it (no edges left)
    assert comps == {frozenset({1, 2}), frozenset({4})}


def test_scc_sizes_consistent(spark):
    df = spark.createDataFrame([(1, 2), (2, 1), (2, 3)], ["src", "dst"])
    out = {
        r["node"]: (r["scc_id"], r["scc_size"])
        for r in scc_sizes(strongly_connected_components(df)).collect()
    }
    assert out == {1: (1, 2), 2: (1, 2), 3: (3, 1)}
