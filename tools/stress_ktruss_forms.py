"""Scale leg for the r11 k-truss rewrite (r11 verdict directive #4):
old form (r10 — symmetric-frame degree attach + 3-way tri_edges union
that re-executes the wedge join per branch) vs new form (r11/r12 —
canonical-frame conditional-swap orientation + ONE explode over a
single triangle stream) on a planted ~1M-edge graph with real triangle
density, old/new interleaved in one process, results bit-compared
before timing.

The r11 plan claim this leg is meant to prove at scale: Exchange
86 -> 6, joins 48 -> 4 held at sf0.1 plan shape; here the same forms
run on input ~10-30x the sf0.1 graph so the ratio reflects executed
work, not scheduling constants.

Usage: python tools/stress_ktruss_forms.py [n_nodes] [rounds]
       (default 300k nodes -> ~0.9M edges, 3 rounds)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

from pyspark.sql import functions as F  # noqa: E402

from kg_etl_spark.session import get_spark  # noqa: E402
from kg_etl_spark.operators import ktruss as new_mod  # noqa: E402


def old_triangle_support(edges):
    """r10 form (git 6a1c89a~1), verbatim shape: symmetric 2|E| frame,
    filter-orientation, 3-way union of the triangle stream."""
    sym = edges.select(F.col("u"), F.col("v")).union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    ranked = (
        sym.join(deg.withColumnRenamed("u", "u_"), F.col("u") == F.col("u_"))
        .drop("u_")
        .withColumnRenamed("deg", "du")
        .join(
            deg.select(F.col("u").alias("v_"), F.col("deg").alias("dv")),
            F.col("v") == F.col("v_"),
        )
        .drop("v_")
    )
    key_u = F.struct(F.col("du").alias("d"), F.col("u").alias("i"))
    key_v = F.struct(F.col("dv").alias("d"), F.col("v").alias("i"))
    oriented = ranked.filter(key_u < key_v).select("u", "v", key_v.alias("vk"))
    wedges = (
        oriented.alias("e1")
        .join(oriented.alias("e2"), F.col("e1.u") == F.col("e2.u"))
        .filter(F.col("e1.vk") < F.col("e2.vk"))
        .select(
            F.col("e1.u").alias("x"),
            F.col("e1.v").alias("y"),
            F.col("e2.v").alias("z"),
        )
    )
    tri = wedges.join(
        oriented.select(F.col("u").alias("y"), F.col("v").alias("z")),
        ["y", "z"],
        "left_semi",
    )
    tri_edges = (
        tri.select(F.least("x", "y").alias("u"), F.greatest("x", "y").alias("v"))
        .union(tri.select(F.least("x", "z").alias("u"), F.greatest("x", "z").alias("v")))
        .union(tri.select(F.least("y", "z").alias("u"), F.greatest("y", "z").alias("v")))
    )
    return tri_edges.groupBy("u", "v").agg(F.count(F.lit(1)).alias("support"))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    span = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark("stress-ktruss-forms")

    # planted graph with real triangle density: i -> i+1..i+span (strip
    # cliques — span controls wedge density, the quantity the wedge
    # join's cost is quadratic in) plus i -> i*7%n overlaps (the
    # stress_graph_ops shape)
    df = spark.range(n)
    e = None
    for off in range(1, span + 1):
        part = df.select(
            F.col("id").alias("a_id"), ((F.col("id") + off) % n).alias("b_id")
        )
        e = part if e is None else e.union(part)
    e = e.union(
        df.select(F.col("id").alias("a_id"), ((F.col("id") * 7) % n).alias("b_id"))
    )
    e = (
        e.filter(F.col("a_id") != F.col("b_id"))
        .select(
            F.least("a_id", "b_id").alias("u"), F.greatest("a_id", "b_id").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    ne = e.count()
    print(f"# planted graph: {n} nodes, {ne} canonical edges", flush=True)

    pairs = e.select(F.col("u").alias("a_id"), F.col("v").alias("b_id"))

    def old_full():
        # r10 ktruss(k=3): eager canonical cut + old support kernel
        cur = pairs.select(
            F.least("a_id", "b_id").alias("u"), F.greatest("a_id", "b_id").alias("v")
        ).lineage_cut(eager=True)
        return old_triangle_support(cur)

    forms = {
        "old": old_full,
        "new": lambda: new_mod.ktruss(pairs, k=3),
    }
    # bit-exact check first
    h = {
        k: f().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v", "support").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        for k, f in forms.items()
    }
    assert (h["old"]["n"], h["old"]["h"]) == (h["new"]["n"], h["new"]["h"]), h
    print(f"# results bit-exact: {h['new']['n']} support rows, "
          f"xxhash-sum {h['new']['h']}", flush=True)

    best: dict = {}
    for r in range(rounds):
        for k in (["old", "new"] if r % 2 == 0 else ["new", "old"]):
            t0 = time.time()
            forms[k]().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best[k] = min(best.get(k, dt), dt)
            print(f"# round {r + 1} {k}: {dt:.2f}s", flush=True)
    print(
        f"ktruss support forms @ {ne} edges: old {best['old']:.2f}s, "
        f"new {best['new']:.2f}s, ratio {best['new'] / best['old']:.3f} "
        f"(load1m {os.getloadavg()[0]:.1f})",
        flush=True,
    )


if __name__ == "__main__":
    main()
