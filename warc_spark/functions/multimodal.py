"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, with decode/feature steps as Arrow-batched mapInPandas stages.

The container has no image/audio codecs, so the decode kernels are
deterministic fakes behind ``fake=True`` (clearly marked) or raise
``NotImplementedError`` when a real decode is requested — the Spark-side
plumbing (schema, batch shape, partitioning) is real and tested. At scale
the decode stage is map-only over binary cells: no shuffle, Arrow batches
bound memory, and `spark.sql.files.maxPartitionBytes` bounds task input.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),        # image | audio | video
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def _fake_decode(blob: bytes, kind: str) -> dict:
    """Deterministic stand-in for a codec: metadata + an 8-dim 'feature'
    derived from the sha256 of the bytes. NOT a real decode."""
    h = hashlib.sha256(blob).digest()
    vals = np.frombuffer(h[:32], dtype=np.uint8).astype(np.float32) / 255.0
    return {
        "media_id": h.hex()[:16],
        "kind": kind,
        "mime": {"image": "image/unknown", "audio": "audio/unknown", "video": "video/unknown"}[kind],
        "width": int(h[0]) + 1 if kind != "audio" else None,
        "height": int(h[1]) + 1 if kind != "audio" else None,
        "duration_ms": (int.from_bytes(h[2:4], "big") if kind != "image" else None),
        "feature": vals[:8].tolist(),
    }


def decode_media(
    df: DataFrame, bytes_col: str, kind: str = "image", fake: bool = True
) -> DataFrame:
    """binary column -> MEDIA_META_SCHEMA rows (map-only, Arrow-batched).

    ``fake=False`` raises NotImplementedError: real codecs are not available
    in this environment; slot a Pillow/ffmpeg kernel here on a real cluster.
    """
    if not fake:
        raise NotImplementedError(
            "real media decode requires codec libraries not present in this "
            "container; use fake=True for plumbing tests"
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_fake_decode(bytes(b), kind) for b in pdf[bytes_col]]
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_META_SCHEMA.fields])

    return df.select(bytes_col).mapInPandas(gen, MEDIA_META_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Plumbing for a resize stage: passes metadata through with the new
    dims recorded; the pixel transform itself needs a codec
    (NotImplementedError on fake=False path in decode_media)."""
    return df.withColumn("width", F.lit(width)).withColumn("height", F.lit(height))


def frame_sample_stub(df: DataFrame, every_ms: int) -> DataFrame:
    """Frame-sampling plumbing for video rows: expands duration into frame
    timestamps with built-in sequence() — shuffle-free, codegen'd."""
    return df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
