"""Distributed SQLite scan via Spark 4's Python DataSource API
(reference S1–S4 upgraded: `etl/sources/yelp_sqlite.py` streams chunked
cursors on one machine; this registers a real Spark source whose
partitions read rowid ranges IN EXECUTORS).

Usage:
    spark.dataSource.register(SQLiteDataSource)
    df = (spark.read.format("sqlite_rows")
          .option("path", "/data/reviews.db")
          .option("table", "reviews")
          .option("numPartitions", "8")
          .load())

Each partition opens the database file read-only and scans
`rowid BETWEEN lo AND hi` — embarrassingly parallel because SQLite
readers don't block each other (and the file is immutable in an ETL
context). The db file must be visible on every executor (shared FS /
distributed cache); in local mode that is trivially true. Falls back
to a single partition when the table has no usable rowid (WITHOUT
ROWID tables).

This complements `sqlite_src.read_sqlite` (one-shot driver bootstrap,
right for small dims): the DataSource path is the 100-GB-sqlite-file
shape, where a single-machine cursor is the bottleneck the reference's
chunked reader worked around.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_TYPE_MAP = {
    "INTEGER": "bigint",
    "INT": "bigint",
    "BIGINT": "bigint",
    "REAL": "double",
    "FLOAT": "double",
    "DOUBLE": "double",
    "TEXT": "string",
    "VARCHAR": "string",
    "BLOB": "binary",
    "NUMERIC": "double",
    "BOOLEAN": "boolean",
}


def _sqlite_schema(path: str, table: str) -> str:
    import sqlite3

    with sqlite3.connect(f"file:{path}?mode=ro", uri=True) as conn:
        cols = conn.execute(f'PRAGMA table_info("{table}")').fetchall()
    if not cols:
        raise ValueError(f"table {table!r} not found in {path}")
    parts = []
    for _cid, name, decl, *_ in cols:
        decl_u = (decl or "").upper()
        spark_t = "string"
        for k, v in _TYPE_MAP.items():
            if k in decl_u:
                spark_t = v
                break
        parts.append(f"`{name}` {spark_t}")
    return ", ".join(parts)


class _RowidRange(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo = lo
        self.hi = hi


class SQLiteReader(DataSourceReader):
    def __init__(self, schema, options):
        self.schema_obj = schema
        self.path = options.get("path")
        self.table = options.get("table")
        self.n = int(options.get("numPartitions", "4") or "4")
        if not self.path or not self.table:
            raise ValueError("sqlite_rows requires 'path' and 'table' options")

    def partitions(self):
        import sqlite3

        try:
            with sqlite3.connect(f"file:{self.path}?mode=ro", uri=True) as conn:
                row = conn.execute(
                    f'SELECT MIN(rowid), MAX(rowid) FROM "{self.table}"'
                ).fetchone()
        except sqlite3.OperationalError:  # WITHOUT ROWID table
            return [_RowidRange(0, -1)]
        lo, hi = row
        if lo is None:  # empty table
            return [_RowidRange(1, 0)]
        n = max(1, min(self.n, hi - lo + 1))
        step = (hi - lo + 1 + n - 1) // n
        return [
            _RowidRange(lo + i * step, min(lo + (i + 1) * step - 1, hi))
            for i in range(n)
        ]

    def read(self, partition: _RowidRange) -> Iterator[tuple]:
        import sqlite3

        names = [f.name for f in self.schema_obj.fields]
        cols = ", ".join(f'"{c}"' for c in names)
        with sqlite3.connect(f"file:{self.path}?mode=ro", uri=True) as conn:
            if partition.lo == 0 and partition.hi == -1:  # no-rowid fallback
                cur = conn.execute(f'SELECT {cols} FROM "{self.table}"')
            else:
                cur = conn.execute(
                    f'SELECT {cols} FROM "{self.table}" '
                    f"WHERE rowid BETWEEN ? AND ?",
                    (partition.lo, partition.hi),
                )
            yield from cur


class SQLiteDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "sqlite_rows"

    def schema(self) -> str:
        return _sqlite_schema(self.options.get("path"), self.options.get("table"))

    def reader(self, schema) -> SQLiteReader:
        return SQLiteReader(schema, self.options)
