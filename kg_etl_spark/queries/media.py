"""Multimodal-column catalog: binary payload plumbing exercised
end-to-end (attach payload → Arrow-batched mapInPandas decode →
features), oracle-checked.

The decode kernel is the deterministic fake from
`kg_etl_spark.operators.multimodal` (real codecs aren't in this
container): width/height/feature derive from sha256(payload). DuckDB
mirrors the scalar outputs exactly — sha256(VARCHAR) hashes the same
utf-8 bytes the Spark side encodes — so the whole mapInPandas path
(schema, Arrow batches, binary columns) is value-hash-verified, not
just rows-counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kg_etl_spark.operators.multimodal import attach_binary_payload, extract_features
from kg_etl_spark.session import read_table


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    media = attach_binary_payload(docs, text_col="text", id_col="doc_id")
    feats = extract_features(media, fake=True)
    return feats.select(
        "media_id",
        "n_bytes",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
    )


# hex pair -> byte value, mirroring h[0] / h[1] of the digest
def _hexbyte(hx: str, i: int) -> str:
    d = "0123456789abcdef"
    hi = f"(strpos('{d}', substr({hx}, {2 * i + 1}, 1)) - 1)"
    lo = f"(strpos('{d}', substr({hx}, {2 * i + 2}, 1)) - 1)"
    return f"({hi} * 16 + {lo})"


ORACLE_MEDIA = f"""
WITH h AS (
  SELECT CAST(doc_id AS VARCHAR) AS media_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         sha256(text) AS hx
  FROM documents
)
SELECT media_id, n_bytes,
       CAST(1 + {_hexbyte('hx', 0)} % 64 AS INTEGER) AS width,
       CAST(1 + {_hexbyte('hx', 1)} % 64 AS INTEGER) AS height
FROM h
"""

QUERIES = {"media_features": q_media_features}
ORACLES = {"media_features": ORACLE_MEDIA}
