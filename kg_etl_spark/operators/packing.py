"""Context-window preparation for LLM training: document chunking,
concat-and-chunk sequence packing, deterministic global shuffle →
shard manifests, and multi-source mixture balancing.

These are the steps between a cleaned corpus and the tensors a trainer
reads: slice documents into overlapping token windows, assign every
document a position in fixed-capacity token bins, give each row a
reproducible (shard, position) address, and down-sample sources to hit
target mixture proportions.

Everything is native Column arithmetic (JVM codegen) — no Python in the
row loop. Determinism everywhere comes from Knuth multiplicative
hashing on the numeric id (never rand()), so each operator has an
exact ANSI-SQL oracle.

Scale notes (100 TB):
- chunking is map-side only (explode of per-row slices; no shuffle).
- packing needs a *global* ordered prefix sum — implemented as the
  classic two-pass: range-partition by id, partition-local cumsum,
  then a driver-side prefix over the per-partition totals (one tiny
  collect of num-partitions rows, never data).
- shard manifest shuffles once on the shard key (that shuffle IS the
  global shuffle being asked for).
- mixture balancing collects only per-source counts (a handful of
  rows), then filters map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kg_etl_spark.operators.datapipe import _M32, knuth_h32
from kg_etl_spark.operators.textquality import ws_tokens


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 128,
    stride: int = 64,
) -> DataFrame:
    """Slice each document's whitespace tokens into windows of `window`
    tokens every `stride` tokens (overlapping when stride < window) —
    the standard context-window preparation for embedding / pretraining
    pipelines.

    Output: (id, chunk_id, chunk_text, n_tokens), one row per chunk;
    empty documents produce no rows; the final chunk may be short.

    Map-side only: tokens → per-row array of chunk structs → explode.
    No shuffle, no Python. At 100 TB this runs at scan speed and the
    explode fan-out is bounded by ~n_tokens/stride per document.
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    toked = df.select(
        F.col(id_col), ws_tokens(F.col(text_col)).alias("_tk")
    ).filter(F.size("_tk") > 0)
    tk = F.col("_tk")
    n = F.size(tk)
    starts = F.sequence(F.lit(0), n - 1, F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            (s / stride).cast("long").alias("chunk_id"),
            F.concat_ws(" ", F.slice(tk, s + 1, F.lit(window))).alias("chunk_text"),
            F.least(F.lit(window), n - s).cast("long").alias("n_tokens"),
        ),
    )
    return (
        toked.select(F.col(id_col), F.explode(chunks).alias("_c"))
        .select(
            id_col,
            F.col("_c.chunk_id").alias("chunk_id"),
            F.col("_c.chunk_text").alias("chunk_text"),
            F.col("_c.n_tokens").alias("n_tokens"),
        )
    )


def pack_concat_chunk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cap: int = 2048,
    num_partitions: "int | None" = None,
    count_col: "str | None" = None,
) -> DataFrame:
    """GPT-style concat-and-chunk packing manifest: documents are laid
    end-to-end in id order and cut into fixed `cap`-token bins; a
    document may span a bin boundary. Output per document:
    (id, n_tokens, first_bin, last_bin, offset_in_bin).

    The global ordered prefix sum is the only hard part at scale. A
    single-partition window would serialize 100 TB through one task;
    instead: split the id space into fixed-width contiguous ranges
    (deterministic — NOT repartitionByRange, whose sampled boundaries
    could diverge between the two executions of this plan), compute
    the range-local cumsum with a per-range window, collect only the
    per-range TOTALS (num_partitions rows), prefix them on the driver,
    and add the offsets back via a dense array literal. One narrow
    shuffle of (id, n_tokens) and two tiny collects — no corpus-scale
    driver data.

    ``num_partitions=None`` (default) sizes from the id SPAN
    (clamp(ceil(span/1M), 32, 4×shuffle-width)) — span ≈ n for the
    dense surrogate ids this packs, it is data-deterministic (no
    sampled boundaries), and an over-estimate from sparse ids merely
    leaves empty ranges, which cost nothing (r7: same
    parallelism-ceiling fix as the rank device family).
    """
    # ``count_col`` (r11): pack by a PRE-COMPUTED per-doc length — e.g.
    # a tokenizer's piece count — instead of the whitespace token count
    # derived from ``text_col``; the bin math is length-source-agnostic
    # (output column stays ``n_tokens``, the manifest contract)
    size_expr = (
        F.col(count_col)
        if count_col is not None
        else F.size(ws_tokens(F.col(text_col)))
    )
    base = df.select(F.col(id_col), size_expr.alias("n_tokens")).filter(
        F.col("n_tokens") > 0
    )
    bounds = base.agg(
        F.min(id_col).alias("lo"), F.max(id_col).alias("hi")
    ).collect()[0]
    if bounds["lo"] is None:
        return base.select(
            id_col,
            "n_tokens",
            F.lit(0).cast("long").alias("first_bin"),
            F.lit(0).cast("long").alias("last_bin"),
            F.lit(0).cast("long").alias("offset_in_bin"),
        )
    if num_partitions is None:
        from kg_etl_spark.operators.rankdev import TARGET_CELL_ROWS, _max_ranges

        span = int(bounds["hi"]) - int(bounds["lo"]) + 1
        num_partitions = int(
            min(
                max(_max_ranges(df.sparkSession), 32),
                max(32, -(-span // TARGET_CELL_ROWS)),
            )
        )
    width = max(1, (int(bounds["hi"]) - int(bounds["lo"])) // num_partitions + 1)
    ranged = base.withColumn(
        "_pid", ((F.col(id_col) - F.lit(int(bounds["lo"]))) / width).cast("long")
    )
    w = Window.partitionBy("_pid").orderBy(id_col)
    local = ranged.withColumn("_lcum", F.sum("n_tokens").over(w))
    totals = sorted(
        local.groupBy("_pid").agg(F.max("_lcum").alias("_tot")).collect(),
        key=lambda r: r["_pid"],
    )
    offsets, running = {}, 0
    for r in totals:
        offsets[r["_pid"]] = running
        running += r["_tot"]
    from kg_etl_spark.operators.rankdev import _shift_columns

    # dense O(1) array lookup below the inline threshold; broadcast
    # offsets join above it (the array literal is a plan-size hazard
    # at cluster shuffle widths — shared device policy,
    # rankdev._shift_columns)
    if offsets:
        local = _shift_columns(
            local,
            "_pid",
            num_partitions,
            {"_off": (F.lit(0).cast("long"), offsets)},
        )
        off_expr = F.col("_off")
    else:
        off_expr = F.lit(0)
    cum_before = (F.col("_lcum") - F.col("n_tokens") + off_expr).alias("_cb")
    packed = local.select(id_col, "n_tokens", cum_before)
    cb = F.col("_cb")
    return packed.select(
        id_col,
        "n_tokens",
        (cb / cap).cast("long").alias("first_bin"),
        ((cb + F.col("n_tokens") - 1) / cap).cast("long").alias("last_bin"),
        (cb % cap).alias("offset_in_bin"),
    )


def shard_manifest(
    df: DataFrame, id_col: str = "doc_id", n_shards: int = 8
) -> DataFrame:
    """Deterministic global shuffle → shard manifest: every row gets a
    reproducible (shard, position) training address. Shard = Knuth hash
    mod n_shards; position = rank within the shard ordered by the full
    32-bit hash (id tie-break), i.e. a pseudo-random but fully
    reproducible read order.

    One shuffle on the shard key — which is exactly the physical global
    shuffle a training pipeline wants anyway. Positions within a shard
    come from a per-shard window (shards are ~corpus/n_shards; choose
    n_shards so a shard's (id, hash) pairs fit a task — the window only
    carries 16 bytes/row).
    """
    # overflow-free under ANSI mode for any int64 id — see knuth_h32
    h = knuth_h32(F.col(id_col))
    with_shard = df.select(F.col(id_col), h.alias("_h"), F.pmod(h, F.lit(n_shards)).alias("shard"))
    w = Window.partitionBy("shard").orderBy(F.col("_h").asc(), F.col(id_col).asc())
    return with_shard.select(
        id_col,
        "shard",
        (F.row_number().over(w) - 1).cast("long").alias("position"),
    )


def curriculum_manifest(
    df: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    n_shards: int = 8,
) -> DataFrame:
    """Curriculum-ordered training addresses: shard = Knuth hash of the
    id (shards stay i.i.d. slices of the corpus), position WITHIN a
    shard = ascending difficulty score (easy→hard, id tie-break) — the
    standard curriculum-learning schedule where every worker reads its
    own shard front to back and all workers progress easy→hard in
    lockstep.

    Same plan as `shard_manifest` (one shuffle on the shard key, which
    IS the physical shuffle a training pipeline wants; per-shard window
    carries score+id only); only the in-shard sort key differs.
    """
    h = knuth_h32(F.col(id_col))
    with_shard = df.select(
        F.col(id_col), F.col(score_col).alias("_s"), F.pmod(h, F.lit(n_shards)).alias("shard")
    )
    w = Window.partitionBy("shard").orderBy(F.col("_s").asc(), F.col(id_col).asc())
    return with_shard.select(
        id_col,
        "shard",
        (F.row_number().over(w) - 1).cast("long").alias("position"),
    )


def dataset_mixture(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float],
    id_col: str = "doc_id",
) -> DataFrame:
    """Down-sample sources so the surviving corpus hits target mixture
    proportions (e.g. {'web': 0.5, 'books': 0.3, 'code': 0.2}) while
    keeping as many documents as possible: the binding source (largest
    n/weight deficit) is kept whole and every other source is
    hash-thinned to match.

    Rates come from one per-source count aggregate (a handful of rows
    collected); the filter itself is map-side Knuth-hash thresholding —
    deterministic, so growing one source never resamples another except
    through the recomputed rate.

    Sources absent from `weights` are dropped (weight 0).
    """
    total_w = float(sum(weights.values()))
    counts = {
        r[source_col]: r["n"]
        for r in df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n")).collect()
        if r[source_col] in weights
    }
    if not counts:
        return df.filter(F.lit(False))
    # largest total corpus T s.t. every source can supply wn_s * T docs
    t_max = min(counts[s] / (weights[s] / total_w) for s in counts)
    rate = {s: (weights[s] / total_w) * t_max / counts[s] for s in counts}
    h = knuth_h32(F.col(id_col))
    rate_expr = None
    for s, r in sorted(rate.items()):
        clause = F.when(F.col(source_col) == s, F.lit(r))
        rate_expr = clause if rate_expr is None else rate_expr.when(
            F.col(source_col) == s, F.lit(r)
        )
    rate_expr = rate_expr.otherwise(F.lit(-1.0))
    return df.filter(h.cast("double") < rate_expr * F.lit(float(_M32)))


def temperature_mixture(
    df: DataFrame,
    source_col: str,
    alpha: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based mixture rebalancing (the multilingual-corpus
    standard, e.g. mT5/XLM-R): target weights derived from the data as
    n_s^alpha — alpha=1 keeps natural proportions, alpha→0 approaches
    uniform — then thinned exactly like `dataset_mixture`.

    Determinism discipline: weights are rounded to 6 dp and summed in
    sorted-source order (a fixed left fold), so the driver-side floats
    are reproducible bit-exactly by the SQL oracle's ordered
    list_reduce — data order never touches the arithmetic.
    """
    counts = {
        r[source_col]: r["n"]
        for r in df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    weights = {s: round(counts[s] ** alpha, 6) for s in sorted(counts)}
    return dataset_mixture(df, source_col, weights, id_col)
