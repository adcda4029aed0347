"""Unigram-LM (SentencePiece-style) tokenizer: EM-trained piece
vocabulary + Viterbi encoding (Kudo 2018, "Subword Regularization") —
the second tokenizer family next to BPE (operators/bpe.py): BPE builds
pieces bottom-up by merge frequency; the unigram LM starts from a
LARGE candidate vocabulary and lets EM concentrate probability mass on
the pieces that segment the corpus best, then prunes.

Scale shape mirrors bpe.py exactly: every Python step runs over the
DISTINCT-WORD vocabulary in Arrow batches (|types| work), never the
token stream; per-iteration piece counts are MODEL-sized (<= the
seeded candidate vocabulary, a few thousand rows) and collect to the
driver like any centroid/codebook state; the corpus-side encode
re-attach is a plain unhinted equi-join of the encoded vocab onto the
exploded token stream (Heaps'-law frame — broadcast-gate class, the
planner decides).

Determinism: the Viterbi tie-break is total (max score, then fewest
pieces, then lexicographically smallest piece sequence), seed and
prune rankings order by (count desc, piece asc), and EM arithmetic is
plain IEEE on driver-collected exact counts — partition-count
invariant end to end (7-vs-32 gated like every catalog query).

Reference parity: the reference has no tokenizer; this extends the
training-pipeline family per the brief (tokenizer-prep alongside
token counting / BPE).
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kg_etl_spark.operators.textquality import ws_tokens

_SEP = "␟"  # symbol-for-unit-separator, same witness glyph as bpe


def viterbi_word(word: str, logp: dict[str, float], max_len: int) -> list[str]:
    """Best segmentation of one word under piece log-probabilities:
    maximize the summed logp; ties prefer FEWER pieces, then the
    lexicographically smallest piece sequence — a total order, so the
    segmentation is deterministic for any vocab.  Requires every
    character of `word` to be in the vocab (the train/encode contract
    keeps single characters unprunable); raises KeyError-like
    ValueError otherwise rather than silently dropping text."""
    n = len(word)
    # best[j] = (score, neg_pieces, pieces_tuple) for word[:j]; compare
    # by (score, neg_pieces, reversed-ordering on tuple) via explicit
    # candidate comparison
    best: list[tuple[float, int, tuple[str, ...]] | None] = [None] * (n + 1)
    best[0] = (0.0, 0, ())
    for j in range(1, n + 1):
        cand = None
        for i in range(max(0, j - max_len), j):
            if best[i] is None:
                continue
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None:
                continue
            s, k, seq = best[i]
            c = (s + lp, k + 1, seq + (piece,))
            if (
                cand is None
                or c[0] > cand[0] + 1e-12
                or (
                    abs(c[0] - cand[0]) <= 1e-12
                    and (c[1] < cand[1] or (c[1] == cand[1] and c[2] < cand[2]))
                )
            ):
                cand = c
        best[j] = cand
    if best[n] is None:
        raise ValueError(f"word {word!r} not segmentable with given vocab")
    return list(best[n][2])


def _word_counts(corpus: DataFrame, text_col: str) -> DataFrame:
    toks = corpus.select(F.explode(ws_tokens(F.col(text_col))).alias("_w"))
    return toks.groupBy("_w").agg(F.count(F.lit(1)).alias("_n")).lineage_cut(
        eager=True
    )  # the EM working set: reused by seeding and every iteration


def unigram_lm_train(
    corpus: DataFrame,
    vocab_size: int = 256,
    seed_size: int = 1500,
    n_iters: int = 3,
    max_piece_len: int = 8,
    text_col: str = "text",
    word_counts: DataFrame | None = None,
) -> list[tuple[str, float]]:
    """EM-train a unigram piece vocabulary; returns [(piece, logp)]
    sorted by (logp desc, piece asc).

    Steps (each distributed part is over the distinct-word table):
    1. SEED: count every substring of length 1..max_piece_len of every
       word (weighted by word frequency); keep the top `seed_size` by
       (count desc, piece asc) plus ALL single characters (unprunable
       — they guarantee segmentability of any word forever).
    2. EM x n_iters: E = Viterbi-segment every word under current
       logp, accumulate piece usage x word frequency (one aggregate,
       model-sized result); M = re-normalize p(piece) = c/Σc on the
       driver.  Pieces with zero usage keep a floor count of 1 (the
       +1 class of smoothing) so single chars never hit -inf.
    3. PRUNE to `vocab_size` by (count desc, piece asc), single chars
       always retained, then renormalize.

    ``word_counts`` lets a caller that ALSO encodes the same corpus
    share one materialized (_w, _n) table (see
    :func:`unigram_lm_encode`'s ``words``) instead of tokenizing the
    corpus twice."""
    wc = word_counts if word_counts is not None else _word_counts(corpus, text_col)

    def substrings(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for w, n in zip(pdf["_w"], pdf["_n"]):
                ln = len(w)
                for i in range(ln):
                    for j in range(i + 1, min(i + max_piece_len, ln) + 1):
                        rows.append((w[i:j], int(n)))
            yield pd.DataFrame(rows, columns=["p", "n"])

    seed_rows = (
        wc.mapInPandas(substrings, schema="p string, n long")
        .groupBy("p")
        .agg(F.sum("n").alias("c"))
        .orderBy(F.col("c").desc(), F.col("p").asc())
        .limit(int(seed_size))
        .collect()
    )
    chars = {
        r["_w"]: 0
        for r in wc.select(
            F.explode(F.split("_w", "")).alias("_w")
        ).filter(F.length("_w") > 0).distinct().collect()
    }
    counts: dict[str, float] = {r["p"]: float(r["c"]) for r in seed_rows}
    for ch in chars:
        counts.setdefault(ch, 1.0)

    def norm_logp(cnts: dict[str, float]) -> dict[str, float]:
        total = sum(cnts.values())
        return {p: math.log(c / total) for p, c in cnts.items()}

    logp = norm_logp(counts)
    for _ in range(int(n_iters)):
        frozen = dict(logp)  # close over a stable snapshot

        def usage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                acc: dict[str, int] = {}
                for w, n in zip(pdf["_w"], pdf["_n"]):
                    for piece in viterbi_word(w, frozen, max_piece_len):
                        acc[piece] = acc.get(piece, 0) + int(n)
                yield pd.DataFrame(
                    {"p": list(acc.keys()), "n": list(acc.values())}
                )

        used = (
            wc.mapInPandas(usage, schema="p string, n long")
            .groupBy("p")
            .agg(F.sum("n").alias("c"))
            .collect()
        )  # model-sized: <= |seeded vocab| rows
        counts = {r["p"]: float(r["c"]) for r in used}
        for p in logp:
            if len(p) == 1:
                counts.setdefault(p, 1.0)  # unprunable floor
        logp = norm_logp(counts)

    # prune to vocab_size (count order == prob order), single chars kept
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    kept = {p: c for p, c in ranked[: int(vocab_size)]}
    for p, c in counts.items():
        if len(p) == 1:
            kept.setdefault(p, c)
    final = norm_logp(kept)
    return sorted(final.items(), key=lambda kv: (-kv[1], kv[0]))


def unigram_lm_encode(
    corpus: DataFrame,
    vocab: list[tuple[str, float]],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece_len: int = 8,
    words: DataFrame | None = None,
) -> DataFrame:
    """Viterbi-encode every document with a fixed vocabulary; returns
    (id, n_words, n_pieces, pieces_md5) — the same witness contract as
    `bpe_encode`, so the two tokenizer families are directly
    comparable.  With a single-characters-only vocab the encoding
    provably degenerates to characters (n_pieces == total characters),
    which is the SQL-expressible planted oracle for the plumbing.

    ``words`` (optional): a distinct-word frame (column ``_w``) for the
    Viterbi side — a caller that trained on the same (or a SUPERSET)
    corpus already holds the materialized distinct-word cut, and
    passing it here skips a second full corpus tokenize + distinct
    exchange.  Any word set covering the corpus's words is
    value-identical (the re-attach is an inner equi-join, so extra
    rows never match) as long as every extra word is itself
    segmentable under ``vocab`` — guaranteed when vocab and word table
    derive from the same training corpus, the sharing contract."""
    logp = dict(vocab)

    toks = corpus.select(
        F.col(id_col),
        F.posexplode(ws_tokens(F.col(text_col))).alias("_pos", "_w"),
    )
    vocab_words = (
        words.select("_w") if words is not None else toks.select("_w").distinct()
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            words = pdf["_w"]
            enc = [viterbi_word(w, logp, max_piece_len) for w in words]
            yield pd.DataFrame(
                {
                    "_w": words,
                    "_n_pieces": [len(e) for e in enc],
                    "_enc": [_SEP.join(e) for e in enc],
                }
            )

    encoded = vocab_words.mapInPandas(
        encode, schema="_w string, _n_pieces long, _enc string"
    )
    # plain equi-join: the encoded vocab is corpus-vocab-scale — no
    # broadcast hint (gate class (c)); the planner decides
    joined = toks.join(encoded, "_w")
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("_n_pieces").alias("n_pieces"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_pos"), F.col("_enc")))
                    ),
                    lambda s: s["_enc"],
                ),
            )
        ).alias("pieces_md5"),
    )
