"""Deterministic synthetic EVENT STREAM as a Spark 4 Python streaming
DataSource (`simpleStreamReader` API) — the streaming twin of
sources/synthdocs.py.

Offsets are a plain row counter: micro-batch k serves ids
[k·batch_rows, (k+1)·batch_rows) until `total_rows` is exhausted, then
empty batches at a fixed offset. Rows are a pure function of the id
(same multiplicative-hash device as synthdocs), so:

- `readBetweenOffsets(start, end)` — the recovery/replay path Spark
  calls after a restart — regenerates EXACTLY the rows the original
  batch produced (deterministic replay is what makes the source
  exactly-once under checkpoint recovery, tested in
  tests/test_sources_streaming.py);
- two runs of the same stream produce identical event sequences.

    spark.dataSource.register(SynthEventsDataSource)
    s = (spark.readStream.format("synthevents")
         .option("total_rows", "100").option("batch_rows", "25").load())

100 TB note: the reader is partition-less by design (SimpleStream —
driver-side iteration) and exists as the deterministic test/bootstrap
source; production streams come from Kafka/files where Spark's
partitioned readers apply. The operator surface downstream is
identical either way.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

_A = 2654435761
_M32 = 4_294_967_296
_TYPES = ["view", "click", "purchase", "signup", "error"]


def synth_event(i: int) -> tuple[int, int, str, float]:
    h = (i * _A + 77_777) % _M32
    user = h % 50
    etype = _TYPES[(h >> 8) % len(_TYPES)]
    value = float((h >> 16) % 1000) / 10.0
    return (i, user, etype, value)


class SynthEventsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.total = int(options.get("total_rows", "100"))
        self.batch = max(1, int(options.get("batch_rows", "25")))

    def initialOffset(self) -> dict:
        return {"row": 0}

    def read(self, start: dict):
        lo = int(start["row"])
        hi = min(lo + self.batch, self.total)
        return (iter([synth_event(i) for i in range(lo, hi)]), {"row": hi})

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter(
            [synth_event(i) for i in range(int(start["row"]), int(end["row"]))]
        )


class SynthEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthevents"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, event_type string, value double"

    def simpleStreamReader(self, schema) -> SynthEventsStreamReader:
        return SynthEventsStreamReader(self.options)
