"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode/feature-extract kernels are STUBS (image/audio libs are not
in this container — clearly marked below); everything Spark-side is
real and tested: schemas, Arrow batch shapes, mapInPandas plumbing,
and partition sizing.  Swap `_decode_image_stub` for a real PIL/ffmpeg
call and nothing else changes.

Scale notes: binary payloads ride in parquet as BINARY; keep
`spark.sql.files.maxPartitionBytes` modest (128 MB default) so a
partition of payloads fits executor memory; mapInPandas streams Arrow
batches so peak memory is one batch, not one partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),       # image | audio | video
    StructField("payload", BinaryType()),    # opaque encoded bytes
    StructField("mime", StringType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", IntegerType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("checksum", StringType()),
])


def _decode_image_stub(payload: bytes) -> tuple[int, int]:
    """STUB: a real implementation would PIL-decode and return (w, h).
    Deterministic fake derived from the payload so tests are stable."""
    if payload is None:
        return (0, 0)
    h = int.from_bytes(payload[:8].ljust(8, b"\0"), "little")
    return (64 + h % 512, 64 + (h >> 16) % 512)


def extract_features(df: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over binary media columns.

    Arrow-batched: each pandas batch holds `spark.sql.execution.arrow.
    maxRecordsPerBatch` rows; per-row Python cost is the decode call
    only.  The returned frame matches FEATURE_SCHEMA exactly.
    """
    import hashlib

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["payload"].map(_decode_image_stub)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)).astype("int32"),
                "width": dims.map(lambda d: d[0]).astype("int32"),
                "height": dims.map(lambda d: d[1]).astype("int32"),
                "checksum": pdf["payload"].map(
                    lambda b: hashlib.md5(b or b"").hexdigest()),
            })

    return df.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """STUB pipeline stage: would re-encode payloads at (width, height).
    Raises until a codec library is available — the Spark plumbing
    (signature, schema passthrough) is the tested part."""
    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image codec not available in this environment; "
            "swap in PIL/libvips here")
        yield  # pragma: no cover

    return df.mapInPandas(_resize, schema=df.schema)


FRAME_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame_payload", BinaryType()),
    StructField("frame_offset", IntegerType()),
])


def frame_sample(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Sample ``n_frames`` evenly spaced frames per media item as a
    one-to-many mapInPandas (one output row per frame).

    The frame *extraction* is a STUB — a real implementation would
    ffmpeg-seek per timestamp; here a frame is a deterministic byte
    window of the payload so tests pin the exact plumbing: schema,
    fan-out row counts, Arrow batch boundaries.  At scale this is the
    shape that matters: frames explode row counts n_frames x, so
    repartition AFTER sampling, never before, and keep frame payloads
    in their own column so downstream column pruning drops them.
    """
    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_payload": [],
                    "frame_offset": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = payload or b""
                step = max(len(data) // max(n_frames, 1), 1)
                for i in range(n_frames):
                    off = min(i * step, max(len(data) - 1, 0))
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    # STUB: byte window in lieu of a decoded frame
                    rows["frame_payload"].append(data[off:off + step])
                    rows["frame_offset"].append(off)
            yield pd.DataFrame(rows)

    return df.mapInPandas(_frames, schema=FRAME_SCHEMA)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (no codec needed)."""
    rows = [(i, ("image", "audio", "video")[i % 3],
             bytes([(i * 7 + j) % 256 for j in range(32 + i % 64)]),
             "application/octet-stream") for i in range(n)]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
