"""Triangle-count tests (operators/triangles.py): hand-checked counts
on K4, a braced square, and triangle-free graphs (star, cycle)."""

from __future__ import annotations

from kg_etl_spark.operators.triangles import triangle_counts


def _run(spark, pairs):
    df = spark.createDataFrame(pairs, ["a_id", "b_id"])
    return {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}


def test_k4_every_node_in_three_triangles(spark):
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    out = _run(spark, k4)
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_braced_square(spark):
    # square 1-2-3-4 plus diagonal 1-3: triangles (1,2,3) and (1,3,4)
    out = _run(spark, [(1, 2), (2, 3), (3, 4), (1, 4), (1, 3)])
    assert out == {1: 2, 2: 1, 3: 2, 4: 1}


def test_star_and_cycle_are_triangle_free(spark):
    star = [(1, i) for i in range(2, 12)]
    assert _run(spark, star) == {}
    cycle = [(i, i + 1) for i in range(1, 6)] + [(1, 6)]
    assert _run(spark, cycle) == {}


def test_label_propagation_two_cliques(spark):
    from kg_etl_spark.operators.communities import label_propagation

    # two triangles bridged by one edge: labels converge within cliques
    clique1 = [(1, 2), (1, 3), (2, 3)]
    clique2 = [(7, 8), (7, 9), (8, 9)]
    bridge = [(3, 7)]
    df = spark.createDataFrame(clique1 + clique2 + bridge, ["a_id", "b_id"])
    out = {r["node"]: r["label"] for r in label_propagation(df, iterations=3).collect()}
    # min-label tie rule pulls both cliques toward small ids, and
    # every clique-1 member ends on the same label
    assert out[1] == out[2] == out[3]
    assert out[8] == out[9]
    # deterministic across runs
    again = {r["node"]: r["label"] for r in label_propagation(df, iterations=3).collect()}
    assert out == again


def test_bfs_hops_path_graph(spark):
    from kg_etl_spark.operators.bfs import bfs_hops

    # path 1-2-3-4-5-6, source {1}: dist caps at max_hops
    edges = spark.createDataFrame([(i, i + 1) for i in range(1, 6)], ["a_id", "b_id"])
    src = spark.createDataFrame([(1,)], ["node"])
    out = {r["node"]: r["dist"] for r in bfs_hops(edges, src, max_hops=3).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 3}
    # multi-source takes the min over sources
    src2 = spark.createDataFrame([(1,), (5,)], ["node"])
    out2 = {r["node"]: r["dist"] for r in bfs_hops(edges, src2, max_hops=2).collect()}
    assert out2 == {1: 0, 2: 1, 3: 2, 4: 1, 5: 0, 6: 1}
