"""Sampled betweenness centrality — Brandes' dependency accumulation
(Brandes, J. Math. Sociol. 2001) from k deterministic pivots, batched:
all pivots advance through ONE level-synchronous BFS keyed by
(pivot, node), then ONE backward sweep per depth level. Betweenness
from a pivot subset is the standard unbiased building block (Brandes &
Pich 2007 estimate = n/k × the sampled sum; this operator returns the
raw sampled sum and leaves scaling to the caller).

Per forward level: frontier ⋈ edges on the node key + one
(pivot, node) hash-agg summing path counts σ. Per backward level:
level-d nodes ⋈ edges ⋈ level-(d+1) nodes — the successor join —
and a hash-agg accumulating Brandes' δ(v) = Σ_w σv/σw·(1+δw).
Everything is keyed by (pivot, node); with k pivots the state is at
most k·|V| rows, and the per-level frames are kept (bounded by
max_depth) so the backward sweep never re-filters the settled set.

σ path counts are exact integers; δ is rational — on planted twin
shapes (star/path: σ ≡ 1) δ stays integral, which is what makes the
catalog recall twin SQL-enumerable despite the float division here.

100 TB shape: 2·max_depth edge-keyed shuffles total (NOT per pivot —
pivots ride the same joins), frontier bounded by k·|V|, localCheckpoint
every other level caps lineage. max_depth truncates to k-bounded
betweenness (documented variant); raise it toward the diameter for the
exact-from-pivots quantity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Forward-BFS levels probed per emptiness-check job (see the chunked
# probe note inside betweenness_sampled). 3 = at most 2 probe jobs for
# the default max_depth=6, at most 2 wasted empty-input level joins.
_PROBE_BATCH = 3


def betweenness_sampled(
    edges: DataFrame,
    *,
    k_pivots: int = 8,
    max_depth: int = 6,
    edges_distinct: bool = False,
) -> DataFrame:
    """(node, bc): raw sampled betweenness — Σ over the k lowest-id
    pivots of Brandes' dependency δ_pivot(node). ``edges``: directed
    (src, dst) long ids; symmetrize upstream for undirected graphs.
    Pivots are the k LOWEST node ids (TakeOrderedAndProject — an O(k)
    heap per partition, not a sort; the id-deterministic choice keeps
    planted twins engine-replayable, the `clustering.py` seeding
    contract).

    ``edges_distinct``: the caller asserts ``edges`` is ALREADY a
    distinct edge frame derived from a reusable materialization (the
    catalog's shared undirected-edge cut, symmetrized as a
    duplicate-free union of the two directions) — skips the redundant
    distinct exchange + a per-call |E| checkpoint, the same contract
    as ``hits_scores`` (r11). The per-level joins then re-derive the
    cheap projection over the shared cut's blocks instead of scanning
    a second copy."""
    if edges_distinct:
        e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    else:
        e = edges.select(
            F.col("src").cast("long"), F.col("dst").cast("long")
        ).distinct().lineage_cut(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    pivots = nodes.orderBy("node").limit(k_pivots)

    # forward: level-synchronous BFS counting shortest paths
    # lazy (r11): the first level's count job materializes the k-row
    # frontier inline — an EAGER cut of k rows paid a whole serial
    # scheduling round for nothing (measured ~0.4s of the query's
    # wall at bench SF, pure driver latency)
    frontier = pivots.select(
        F.col("node").alias("pivot"),
        F.col("node"),
        F.lit(1).cast("long").alias("sigma"),
    ).lineage_cut(eager=False)
    levels = [frontier]  # levels[d] = (pivot, node, sigma) at depth d
    seen = frontier.select("pivot", "node")
    # Chunked emptiness probes (r12; the r11 verdict's top structural
    # item): the former per-level `nxt.count()` was one serial
    # scheduling + Catalyst planning round per level — the ~1.7 s/call
    # floor at bench SF — and each of those jobs re-shuffled `e` for
    # its level join (exchange reuse is per-job). Levels are now built
    # lazily in chunks of `_PROBE_BATCH` and ONE tagged-union count
    # per chunk materializes every chunk level's lazy cut inline,
    # shares one exchange of `e` across the chunk's level joins, and
    # answers all the chunk's emptiness probes at once. Levels past
    # BFS exhaustion are empty by construction (BFS from an empty
    # frontier is empty — no gaps possible), so at most
    # `_PROBE_BATCH - 1` empty-input level joins are built, inside a
    # job whose exchanges they share; they are trimmed exactly where
    # the per-level loop broke. A full unroll to max_depth (zero
    # probes until the end) was measured SLOWER at bench SF (3.72 s vs
    # 3.23 s old vs 2.6 s chunked) — the BFS here exhausts at depth 3,
    # so the unroll paid 3 whole wasted level joins.
    d = 1
    exhausted = False
    while d <= max_depth and not exhausted:
        chunk = []
        while d <= max_depth and len(chunk) < _PROBE_BATCH:
            nxt = (
                levels[-1]
                .join(e.withColumnRenamed("src", "node"), "node")
                .select("pivot", F.col("dst").alias("node"), "sigma")
                .groupBy("pivot", "node")
                .agg(F.sum("sigma").alias("sigma"))
                .join(seen, ["pivot", "node"], "left_anti")
                .lineage_cut(eager=False)
            )
            chunk.append(nxt)
            levels.append(nxt)
            seen = seen.union(nxt.select("pivot", "node"))
            if d % 2 == 0:
                # lazy: the chunk's probe job materializes the capped
                # union inline with everything else
                seen = seen.lineage_cut(eager=False)
            d += 1
        tagged = chunk[0].select(F.lit(0).alias("_i"))
        for i in range(1, len(chunk)):
            tagged = tagged.union(chunk[i].select(F.lit(i).alias("_i")))
        cnt = {
            int(r["_i"]): int(r["n"])
            for r in tagged.groupBy("_i").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        n_keep = 0
        while n_keep < len(chunk) and cnt.get(n_keep, 0) > 0:
            n_keep += 1
        if n_keep < len(chunk):
            del levels[len(levels) - (len(chunk) - n_keep):]
            exhausted = True

    # backward: accumulate δ from the deepest level inward
    deltas = [None] * len(levels)
    deltas[-1] = levels[-1].select("pivot", "node", F.lit(0.0).alias("delta"))
    for d in range(len(levels) - 2, -1, -1):
        succ = (
            deltas[d + 1]
            .join(levels[d + 1].select("pivot", "node", "sigma"), ["pivot", "node"])
            .select(
                "pivot",
                F.col("node").alias("dst"),
                ((F.lit(1.0) + F.col("delta")) / F.col("sigma")).alias("_t"),
            )
        )
        contrib = (
            levels[d]
            .join(e.withColumnRenamed("src", "node"), "node")
            .join(succ, ["pivot", "dst"])
            .groupBy("pivot", "node", "sigma")
            .agg(F.sum("_t").alias("_s"))
            .select("pivot", "node", (F.col("sigma") * F.col("_s")).alias("delta"))
        )
        deltas[d] = (
            levels[d]
            .select("pivot", "node")
            .join(contrib, ["pivot", "node"], "left")
            .select("pivot", "node", F.coalesce("delta", F.lit(0.0)).alias("delta"))
            # lazy: materializes inside the next level's job, reused by
            # the final union — no standalone materialization job
            .lineage_cut(eager=False)
        )

    acc = None
    for d in range(1, len(levels)):  # depth 0 is the pivot itself: excluded
        part = deltas[d].select("node", "delta")
        acc = part if acc is None else acc.unionByName(part)
    if acc is None:
        return nodes.select("node", F.lit(0.0).alias("bc")).limit(0)
    return acc.groupBy("node").agg(F.round(F.sum("delta"), 6).alias("bc"))


def hits_scores(
    edges: DataFrame, *, iterations: int = 2, edges_distinct: bool = False
) -> DataFrame:
    """(node, hub, auth, hub_share, auth_share) — HITS (Kleinberg,
    JACM 1999) run UNNORMALIZED for a fixed number of rounds: after k
    rounds auth(v) counts the alternating in-paths of length 2k−1 and
    hub(v) the out-paths of length 2k — exact decimal(38,0) integers,
    so the whole iteration is value-checkable with order-independent
    integer sums (no per-round L2 normalization, whose float sums
    would not be). The shares divide by the exact global totals at the
    end — one double division per row off two exact decimals.

    Per round: two edge-keyed join+hash-aggs (in-sum then out-sum),
    each followed by a left join against the node set so sinks/sources
    keep explicit zeros. 100 TB shape: state is one decimal(38,0) per
    node per side — counts grow like deg^(2k), which exits LONG range
    at deg ≈ 55k for the default 2 iterations (a single celebrity
    node), and non-ANSI Spark would WRAP silently. decimal(38,0)
    accumulation (r4 directive #3) holds exact counts to 10³⁸ —
    deg ≤ 10⁹ is safe through iterations=4 — at negligible cost for
    per-node state; the share divisions cast to double explicitly.

    ``edges_distinct``: the caller asserts ``edges`` is ALREADY a
    distinct (src, dst) edge frame at a reusable materialization (the
    catalog's shared transition-edge cut) — skips the redundant
    distinct exchange + a second |E| checkpoint per call (r11)."""
    DEC = "decimal(38,0)"
    if edges_distinct:
        e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    else:
        e = edges.select(
            F.col("src").cast("long"), F.col("dst").cast("long")
        ).distinct().lineage_cut(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .lineage_cut(eager=True)
    )
    # Loud overflow discipline (scc.py settled-clean idiom): a decimal
    # sum that exits 38 digits goes NULL under non-ANSI Spark, and the
    # sink-zero coalesce below would silently turn it into 0. The cheap
    # a-priori bound |iterate| ≤ maxdeg^(2k) ≤ |E|^(2k) decides whether
    # overflow is even REACHABLE — (|E|+1)^(2k+1) < 10^38 covers every
    # per-node value AND the grand totals, so the common case adds zero
    # jobs. Only past that bound does each round pay an exact
    # pre-coalesce null probe (a real overflow, not the bound, raises).
    n_e = e.count()
    probe_overflow = bool(n_e) and (n_e + 1) ** (2 * iterations + 1) >= 10 ** 38

    def _no_overflow(agg: DataFrame, cols, rnd: int) -> DataFrame:
        if not probe_overflow:
            return agg
        agg = agg.lineage_cut(eager=True)
        null_any = None
        for c in cols:
            cond = F.col(c).isNull()
            null_any = cond if null_any is None else (null_any | cond)
        if agg.filter(null_any).limit(1).count() > 0:
            raise ValueError(
                f"hits_scores: {'/'.join(cols)} sum exceeded decimal(38,0) "
                f"at round {rnd} — unnormalized path counts this deep are "
                "not exactly representable; reduce iterations"
            )
        return agg

    h = nodes.select("node", F.lit(1).cast(DEC).alias("h"))
    a = None
    for r in range(iterations):
        a_in = _no_overflow(
            e.join(h.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("h").alias("a")),
            ["a"],
            r,
        )
        a = nodes.join(a_in, "node", "left").select(
            "node", F.coalesce("a", F.lit(0)).cast(DEC).alias("a")
        )
        h_out = _no_overflow(
            e.join(a.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("a").alias("h")),
            ["h"],
            r,
        )
        h = nodes.join(h_out, "node", "left").select(
            "node", F.coalesce("h", F.lit(0)).cast(DEC).alias("h")
        )
    # NOTE (r11): the final (node, h, a) join feeds both the totals
    # aggregate and the share projection; a lazy lineage cut here was
    # measured SLOWER at bench SF (1.49s vs 1.18s old vs 0.75s with
    # edges_distinct alone) — the checkpoint overhead exceeds the
    # duplicated-DAG cost, which AQE's broadcast joins keep cheap.
    tot = _no_overflow(
        h.join(a, "node").agg(
            F.sum("h").cast(DEC).alias("_th"), F.sum("a").cast(DEC).alias("_ta")
        ),
        ["_th", "_ta"],
        iterations,
    )
    return (
        h.join(a, "node")
        .crossJoin(F.broadcast(tot))
        .select(
            "node",
            F.col("h").cast(DEC).alias("hub"),
            F.col("a").cast(DEC).alias("auth"),
            F.round(F.col("h").cast("double") / F.col("_th").cast("double"), 6).alias("hub_share"),
            F.round(F.col("a").cast("double") / F.col("_ta").cast("double"), 6).alias("auth_share"),
        )
    )
