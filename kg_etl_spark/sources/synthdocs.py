"""Deterministic synthetic-document generator as a Spark 4 Python
DataSource: each partition materializes its own id range on the
executor — no input files, no driver bottleneck — so operator stress
runs can scale to any row count on any cluster size.

    spark.dataSource.register(SynthDocsDataSource)
    docs = (spark.read.format("synthdocs")
            .option("rows", "5000000")
            .option("numPartitions", "64")
            .load())   # (doc_id, text, lang, source, n_chars)

Determinism: content is a pure function of doc_id (multiplicative hash
chain over a fixed vocabulary), so any two runs — and any two cluster
layouts — produce identical rows. That makes stress output checkable:
e.g. token counts at rows=N are reproducible constants.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_VOCAB = (
    "spark scan table row value key join merge sort window agg hash part "
    "batch line fast slow the a of and data query plan file block cache"
).split()
_LANGS = ["en", "de", "fr", "es", "zh"]
_A = 2654435761
_M32 = 4_294_967_296


def synth_doc(doc_id: int) -> tuple[int, str, str, str, int]:
    """Pure function doc_id -> row (the executor-side kernel)."""
    h = (doc_id * _A + 12345) % _M32
    n_words = 10 + h % 90
    words = []
    x = h
    for _ in range(n_words):
        x = (x * _A + 1) % _M32
        words.append(_VOCAB[x % len(_VOCAB)])
    text = " ".join(words)
    lang = _LANGS[h % len(_LANGS)]
    source = f"src{h % 20}"
    return (doc_id, text, lang, source, len(text))


class _IdRange(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo = lo
        self.hi = hi


class SynthDocsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(float(options.get("rows", "1000")))
        self.n = int(options.get("numPartitions", "32") or "32")

    def partitions(self):
        n = max(1, min(self.n, self.rows)) if self.rows else 1
        step = (self.rows + n - 1) // n if self.rows else 1
        return [
            _IdRange(i * step, min((i + 1) * step, self.rows))
            for i in range(n)
            if i * step < self.rows
        ] or [_IdRange(0, 0)]

    def read(self, partition: _IdRange) -> Iterator[tuple]:
        for i in range(partition.lo, partition.hi):
            yield synth_doc(i)


class SynthDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return "doc_id bigint, text string, lang string, source string, n_chars bigint"

    def reader(self, schema) -> SynthDocsReader:
        return SynthDocsReader(self.options)
