"""Product quantization (PQ) ANN: train per-subspace codebooks, encode
the corpus as m small integer codes, score queries by asymmetric
distance computation (ADC: per-query lookup tables over the codes),
then exact-rerank a small ADC shortlist.

Reference parity: the reference engine has no PQ; this extends the
similarity-search family (SURVEY §2 beyond-reference: ANN over
embedding columns) with the standard memory-compressed scale path —
64-dim float32 vectors (256 B) become m=8 one-byte codes (8 B + norm),
a ~30× corpus-memory cut, which is what makes 100 TB-scale
candidate generation feasible before an exact rerank.

Spark-first design:
- The codebook model rides as a ONE-ROW broadcast DataFrame
  (`books array<array<array<double>>>`, a few KB) cross-joined onto
  the corpus; every per-row computation is a single indexed
  `F.transform` lambda over that column. (An earlier draft inlined
  m×ksub centroid literals into the plan — Catalyst analysis of that
  tree cost ~7 s per pass; the broadcast-column form plans in
  milliseconds and evaluates identically.)
- Codebook training is Lloyd over each subspace SLICE, all m subspaces
  fitted in ONE aggregate pass per iteration: explode each row into m
  (subspace, cluster, subvector) structs, groupBy (subspace, cluster)
  with per-dim avg. Partial (map-side) aggregation keeps the shuffle
  at O(partitions × m × ksub × dsub) values; the corpus itself never
  shuffles.
- Encoding is map-side (broadcast codebooks, per-subspace argmin).
- ADC scoring broadcasts a tiny per-query LUT table (query_id,
  m×ksub lookup matrix, norm) against the encoded corpus — one scan
  scores all queries; only (queries × corpus) CODE rows (≈24 B each)
  ever reach the shortlist window, and only (queries × shortlist)
  rows reach the exact rerank.

Determinism: seeds are the ksub lowest-id vectors per subspace (same
contract as clustering.kmeans_lloyd); distance folds are sequential
left-to-right in double and argmin takes the FIRST minimum
(array_position), so codes are partition-count independent. Identical
input vectors therefore ALWAYS get identical codes — the provable core
behind the `pq_identical_recall` oracle twin (queries/vector.py).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kg_etl_spark.operators.similarity import cosine


def _l2sq(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _books_df(spark, books: list[list[list[float]]]) -> DataFrame:
    return spark.createDataFrame([(books,)], "books array<array<array<double>>>")


def _vec_double(vec_col: str) -> Column:
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def _sub_slice(v: Column, j: Column, dsub: int) -> Column:
    """Subspace j (0-based Column) of double-vector v (1-based slice)."""
    return F.slice(v, (j * dsub + 1).cast("int"), dsub)


def _argmin_code(bj: Column, sub: Column) -> Column:
    """0-based nearest-centroid code; ties break to the lowest centroid
    index (array_position returns the FIRST minimum)."""
    dists = F.transform(bj, lambda c: _l2sq(sub, c))
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def pq_train_codebooks(
    corpus: DataFrame,
    *,
    m: int = 8,
    ksub: int = 16,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Fit m sub-codebooks of ksub centroids each. Returns
    codebooks[j][c] = centroid c of subspace j (floats rounded to 6 dp
    like kmeans_lloyd, so the model is loggable and engine-portable).
    Empty clusters keep their previous centroid.
    """
    spark = corpus.sparkSession
    d = corpus.select(F.size(vec_col).alias("d")).limit(1).collect()[0]["d"]
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    dsub = d // m

    seed_rows = corpus.orderBy(id_col).limit(ksub).select(vec_col).collect()
    assert len(seed_rows) >= ksub, "corpus smaller than ksub"
    books: list[list[list[float]]] = [
        [[float(x) for x in r[vec_col][j * dsub : (j + 1) * dsub]] for r in seed_rows]
        for j in range(m)
    ]

    v = _vec_double(vec_col)
    structs = F.transform(
        F.col("books"),
        lambda bj, j: F.struct(
            j.alias("j"),
            _argmin_code(bj, _sub_slice(v, j, dsub)).alias("c"),
            _sub_slice(v, j, dsub).alias("sub"),
        ),
    )
    for _ in range(iterations):
        exploded = (
            corpus.crossJoin(F.broadcast(_books_df(spark, books)))
            .select(F.explode(structs).alias("s"))
            .select("s.j", "s.c", "s.sub")
        )
        agg = exploded.groupBy("j", "c").agg(
            *[F.round(F.avg(F.col("sub")[i]), 6).alias(f"m{i}") for i in range(dsub)]
        )
        for row in agg.collect():  # ≤ m×ksub rows: model state, not data
            books[int(row["j"])][int(row["c"])] = [row[f"m{i}"] for i in range(dsub)]
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int> of length m, norm double) — map-side over
    the broadcast codebook row. `norm` is the exact vector L2 norm,
    kept so ADC dot products can be ranked as cosine without revisiting
    the raw vectors."""
    spark = corpus.sparkSession
    d = corpus.select(F.size(vec_col).alias("d")).limit(1).collect()[0]["d"]
    dsub = d // len(codebooks)
    v = _vec_double(vec_col)
    codes = F.transform(
        F.col("books"), lambda bj, j: _argmin_code(bj, _sub_slice(v, j, dsub))
    )
    norm = F.sqrt(
        F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    return corpus.crossJoin(F.broadcast(_books_df(spark, codebooks))).select(
        F.col(id_col), codes.alias("codes"), norm.alias("norm")
    )


def _adc_lut(qvec: list[float], codebooks: list[list[list[float]]]) -> np.ndarray:
    """LUT[j][c] = dot(q_subspace_j, codebook[j][c]) in float64."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    q = np.asarray(qvec, dtype="float64")
    return np.stack(
        [
            np.asarray(codebooks[j], dtype="float64") @ q[j * dsub : (j + 1) * dsub]
            for j in range(m)
        ]
    )


def pq_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
    shortlist: int = 50,
) -> DataFrame:
    """Approximate top-k cosine neighbors per query: ADC shortlist of
    `shortlist` candidates on the codes, then exact cosine rerank of
    (queries × shortlist) rows only. Self-matches are excluded.
    """
    enc = pq_encode(corpus, codebooks, id_col=id_col, vec_col=vec_col)

    # Per-query LUTs as a TINY broadcast table — ONE scan of the
    # encoded corpus scores every query.
    qrows = queries.select(query_id_col, vec_col).collect()  # query set: small by contract
    spark = corpus.sparkSession
    lut_rows = []
    for r in qrows:
        lut = _adc_lut(list(r[vec_col]), codebooks)
        qnorm = float(np.linalg.norm(np.asarray(r[vec_col], dtype="float64")))
        lut_rows.append(
            (int(r[query_id_col]), [[float(x) for x in row] for row in lut], qnorm)
        )
    luts = spark.createDataFrame(
        lut_rows, f"{query_id_col} long, lut array<array<double>>, qnorm double"
    )

    adc = F.aggregate(
        F.zip_with(F.col("codes"), F.col("lut"), lambda c, row: F.element_at(row, c + 1)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = (
        enc.join(F.broadcast(luts))
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            F.col(id_col).alias("neighbor_id"),
            (adc / (F.col("norm") * F.col("qnorm"))).alias("adc_score"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("adc_score").desc(), F.col("neighbor_id").asc()
    )
    cand = scored.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= shortlist)

    # Exact rerank: broadcast the small candidate set against the corpus.
    qv = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qvec"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec"))
    rer = (
        cand.select(query_id_col, "neighbor_id")
        .join(F.broadcast(qv), query_id_col)
        .join(cv, "neighbor_id")
        .withColumn("score", cosine(F.col("_qvec"), F.col("_cvec")))
    )
    w2 = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        rer.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", F.round("score", 6).alias("score"))
    )
