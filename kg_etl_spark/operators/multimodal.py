"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The decode/feature kernels are STUBBED (this container ships no
image/audio libraries): `decode_image_batch` raises NotImplementedError
unless `fake=True`, in which case a deterministic fake decoder produces
stable features so the Spark-side plumbing — schema, batch shape,
partitioning — is real and testable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("media_type", T.StringType()),  # image|audio|video
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def attach_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a media table from any table (payload = utf8 bytes of a
    column) — used by tests/bench to exercise binary-column plumbing on
    the synthetic corpus."""
    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.create_map(F.lit("codec"), F.lit("fake")).alias("meta"),
    )


def _fake_decode(payload: bytes, dim: int = 8) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for a real decoder: 'dimensions' and a
    feature vector derived from a sha256 of the payload."""
    h = hashlib.sha256(payload or b"").digest()
    width = 1 + h[0] % 64
    height = 1 + h[1] % 64
    feat = [((h[i] / 255.0) * 2.0 - 1.0) for i in range(2, 2 + dim)]
    return width, height, feat


def extract_features(df: DataFrame, fake: bool = False, dim: int = 8) -> DataFrame:
    """Decode + featurize media rows via mapInPandas (Arrow batches).

    Real decode requires image/audio libs not present in this
    environment → NotImplementedError unless fake=True. The distributed
    plumbing (batch iteration, schema, partition preservation) is the
    same code path a real decoder would use.
    """
    if not fake:
        raise NotImplementedError(
            "real media decoding needs PIL/av/soundfile — not available; pass fake=True"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, feat = _fake_decode(bytes(payload) if payload is not None else b"", dim)
                rows.append((mid, len(payload or b""), w, h, feat))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_bytes", "width", "height", "feature"]
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(
    df: DataFrame, target_w: int, target_h: int, fake: bool = False
) -> DataFrame:
    """Resize every image payload to (target_w, target_h) via
    mapInPandas; output keeps MEDIA_SCHEMA with meta recording the new
    dimensions. Real resizing needs PIL → NotImplementedError unless
    fake=True (deterministic byte resampling that preserves payload
    identity: same input ⇒ same output).
    """
    if not fake:
        raise NotImplementedError(
            "real image resize needs PIL — not available; pass fake=True"
        )
    n_out = max(1, (target_w * target_h) // 64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mtype, payload, meta in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"], pdf["meta"]
            ):
                b = bytes(payload) if payload is not None else b""
                # deterministic "resample": stride-sample/zero-pad bytes
                step = max(1, len(b) // n_out)
                out = b[::step][:n_out].ljust(n_out, b"\0")
                m = dict(meta or {})
                m.update({"width": str(target_w), "height": str(target_h)})
                rows.append((mid, mtype, out, m))
            yield pd.DataFrame(
                rows, columns=["media_id", "media_type", "payload", "meta"]
            )

    return df.mapInPandas(run, schema=MEDIA_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame", T.BinaryType()),
])


def sample_frames(df: DataFrame, every_n: int = 2, fake: bool = False) -> DataFrame:
    """UDTF-shaped frame sampling: one video row → every_n-th frame as
    its own row (media_id, frame_idx, frame). Real demuxing needs av →
    NotImplementedError unless fake=True (payload split into
    deterministic pseudo-frames). The one-to-many Arrow batch shape is
    exactly what a real demuxer emits."""
    if not fake:
        raise NotImplementedError(
            "real video demux needs av — not available; pass fake=True"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                n_frames = 1 + (len(b) % 7)
                size = max(1, len(b) // n_frames)
                frames = [b[i * size:(i + 1) * size] for i in range(n_frames)]
                for idx in range(0, n_frames, every_n):
                    rows.append((mid, idx, frames[idx]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return df.mapInPandas(run, schema=FRAME_SCHEMA)
