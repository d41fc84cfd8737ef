"""Multimodal column plumbing: opaque binary payloads with typed metadata.

Convention: a multimodal asset is a row with

- ``payload``   binary        — the raw bytes (image/audio/video/file)
- ``media_type`` string       — MIME-ish tag ("image/png", "audio/wav", ...)
- ``meta``      struct        — typed metadata (byte_len, sha256, ...)

The Spark-side plumbing (schemas, partition-friendly batch shapes,
Arrow-batched UDF signatures) is real and tested; the actual media
decoding is STUBBED — this container has no image/audio libraries, so
``decode_image`` raises NotImplementedError unless ``fake=True``, in
which case a deterministic fake decoder derives (width, height, format)
from the payload bytes. A deployment swaps the fake for Pillow/ffmpeg
inside the same mapInPandas iterator.

Scale notes: payload work uses mapInPandas (per-partition Arrow batch
iterator) so bytes never round-trip through Python row-at-a-time; binary
metadata (length, hash) stays JVM-side as native expressions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("media_type", StringType(), True),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("byte_len", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("format", StringType(), True),
    ]
)


def attach_binary_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """JVM-side metadata for a binary column: byte length + sha256 hex.

    Native expressions — no Python; at 100 TB this is the cheap first
    pass that dedups payloads (group on sha256) before any decoding.
    """
    return df.withColumn("byte_len", F.length(payload_col).cast("long")).withColumn(
        "sha256", F.sha2(F.col(payload_col), 256)
    )


def texts_as_assets(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Adapt a text table into the asset convention (for plumbing tests)."""
    return df.select(
        F.col(id_col).alias("asset_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic fake decoder: dims derived from payload bytes."""
    if not payload:
        return 0, 0, "empty"
    w = 1 + payload[0] % 64
    h = 1 + payload[-1] % 64
    fmt = "fake-rgb" if len(payload) % 2 == 0 else "fake-gray"
    return w, h, fmt


def decode_assets(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode binary payloads to typed metadata via mapInPandas.

    STUB: real decoding needs media libraries not present in this
    container. ``fake=True`` routes to the deterministic fake decoder so
    the distributed plumbing (Arrow batches, schema, partitioning) is
    exercised end-to-end; ``fake=False`` raises NotImplementedError the
    way the real integration point would surface a missing codec.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decoding requires image/audio libraries; "
                    "use fake=True for plumbing tests"
                )
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                }
            )
            decoded = pdf["payload"].map(lambda b: _fake_decode(b if b is not None else b""))
            out["width"] = [d[0] for d in decoded]
            out["height"] = [d[1] for d in decoded]
            out["format"] = [d[2] for d in decoded]
            yield out.astype(
                {"asset_id": "int64", "byte_len": "int64", "width": "int32", "height": "int32"}
            )

    return df.mapInPandas(decode_batches, DECODED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("frame_no", LongType(), False),
        StructField("ts_ms", LongType(), False),
    ]
)


def sample_frames(
    df: DataFrame, every_ms: int = 1000, max_frames: int = 8, fake: bool = False
) -> DataFrame:
    """Sample frames from video payloads: one output row per frame.

    The one-to-many mapInPandas shape for frame extraction — each Arrow
    batch of payloads yields a larger batch of (asset_id, frame_no,
    ts_ms) rows. STUB like ``decode_assets``: real extraction needs
    ffmpeg; ``fake=True`` derives the frame count from the payload byte
    length (1 + byte_len % max_frames), so the distributed plumbing and
    fan-out are exercised end-to-end and SQL-verifiable.
    """

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "frame extraction requires ffmpeg; use fake=True for plumbing tests"
                )
            ids, frames, tss = [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                n = 1 + (len(payload) if payload is not None else 0) % max_frames
                for f in range(n):
                    ids.append(aid)
                    frames.append(f)
                    tss.append(f * every_ms)
            yield pd.DataFrame(
                {"asset_id": ids, "frame_no": frames, "ts_ms": tss}, dtype="int64"
            )

    return df.mapInPandas(frame_batches, FRAME_SCHEMA)
