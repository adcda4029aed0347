"""Python UDTFs (Spark 4 user-defined TABLE functions) — the lateral
one-row-to-many-rows extension surface.

The engine's own operators stay native (`operators/packing.py`
chunk_documents is the production chunker: transform+explode, zero
Python). This module exists because a user extending the engine needs
the UDTF path for logic that genuinely can't be a column expression —
and the chunker makes a perfect conformance target: `ChunkText` must
reproduce chunk_documents row-for-row (asserted in
tests/test_functions.py), so the example is verified, not decorative.

UDTF execution: one Python worker call per input row, rows yielded
lazily; Spark parallelizes per-partition like any map — at scale the
cost over a native expression is the Python round-trip, which is why
the hot path stays native.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_id: bigint, chunk_text: string, n_tokens: int")
class ChunkText:
    """Lateral chunker: (text, window, stride) → one row per token
    window. Tokenization mirrors operators/textquality.ws_tokens
    (trim, lower, split on whitespace, drop empties) so outputs align
    with the native chunker bit-for-bit."""

    def eval(self, text: str, window: int, stride: int):  # noqa: D102
        if window is None or stride is None or window <= 0 or stride <= 0:
            raise ValueError("window and stride must be positive")
        toks = [t for t in (text or "").strip().lower().split() if t]
        for ci, start in enumerate(range(0, len(toks), stride)):
            piece = toks[start : start + window]
            yield ci, " ".join(piece), len(piece)


def register_udtfs(spark) -> None:
    """Expose the UDTFs to SQL: `SELECT d.doc_id, c.* FROM docs d,
    LATERAL chunk_text(d.text, 128, 64) c`."""
    spark.udtf.register("chunk_text", ChunkText)
