"""Multimodal columns: image/audio/video as opaque binary + typed metadata,
with decode / feature-extract / resize / frame-sample as Arrow-batched
mapInPandas stages.

REAL decode paths (no external codec libraries needed — pure numpy/stdlib):

- **netpbm P5/P6** (PGM/PPM binary): header parse + ``np.frombuffer``.
- **BMP** (uncompressed BI_RGB 24/32-bit): struct parse of the file/info
  headers, bottom-up row order, 4-byte row padding.
- **WAV** (PCM): stdlib ``wave`` + ``np.frombuffer`` — sample rate,
  channels, duration, RMS/zero-crossing features.

Codec-encumbered formats (JPEG/PNG/H.264...) raise a clear
``unsupported format`` error per record (the ``error`` column in lax mode);
``fake=True`` keeps the deterministic hash-based stand-in for plumbing
tests over arbitrary bytes. At scale every stage is map-only over binary
cells: no shuffle, Arrow batches bound memory, and
``spark.sql.files.maxPartitionBytes`` bounds task input.
"""

from __future__ import annotations

import hashlib
import io
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
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
        StructField("format", StringType()),      # ppm | pgm | bmp | wav | fake
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("error", StringType()),
    ]
)


# ---------------------------------------------------------------------------
# pure kernels: decode / encode / resize / features (no Spark, unit-testable)
# ---------------------------------------------------------------------------

def decode_netpbm(blob: bytes) -> np.ndarray:
    """P5 (gray) / P6 (rgb) binary netpbm -> uint8 array (h, w, c)."""
    if blob[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm (P5/P6) image")
    # header: magic, width, height, maxval — whitespace/comment separated
    tokens: list[bytes] = []
    pos = 2
    while len(tokens) < 3:
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if blob[pos : pos + 1] == b"#":  # comment to EOL
            pos = blob.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        tokens.append(blob[start:pos])
    pos += 1  # single whitespace after maxval
    w, h, maxval = int(tokens[0]), int(tokens[1]), int(tokens[2])
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    c = 3 if blob[:2] == b"P6" else 1
    need = w * h * c
    data = np.frombuffer(blob, dtype=np.uint8, count=need, offset=pos)
    return data.reshape(h, w, c)


def encode_netpbm(arr: np.ndarray) -> bytes:
    """uint8 (h, w, 1|3) -> P5/P6 bytes (deterministic header)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    magic = b"P6" if c == 3 else b"P5"
    return magic + b"\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def decode_bmp(blob: bytes) -> np.ndarray:
    """Uncompressed BI_RGB 24/32-bit BMP -> uint8 array (h, w, 3) in RGB."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP file")
    data_offset = struct.unpack_from("<I", blob, 10)[0]
    header_size = struct.unpack_from("<I", blob, 14)[0]
    if header_size < 40:
        raise ValueError("BITMAPCOREHEADER not supported")
    w, h_raw = struct.unpack_from("<ii", blob, 18)
    planes, bpp = struct.unpack_from("<HH", blob, 26)
    compression = struct.unpack_from("<I", blob, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (compression={compression}, bpp={bpp})")
    bottom_up = h_raw > 0
    h = abs(h_raw)
    bytes_pp = bpp // 8
    row_stride = (w * bytes_pp + 3) & ~3  # rows pad to 4 bytes
    rows = np.frombuffer(
        blob, dtype=np.uint8, count=row_stride * h, offset=data_offset
    ).reshape(h, row_stride)[:, : w * bytes_pp].reshape(h, w, bytes_pp)
    if bottom_up:
        rows = rows[::-1]
    # BMP stores BGR(A): reorder to RGB, drop alpha
    return np.ascontiguousarray(rows[:, :, 2::-1])


def encode_bmp(arr: np.ndarray) -> bytes:
    """uint8 (h, w, 3) RGB -> 24-bit bottom-up BI_RGB BMP bytes."""
    h, w, _ = arr.shape
    row_stride = (w * 3 + 3) & ~3
    img = np.zeros((h, row_stride), dtype=np.uint8)
    img[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    pixel_bytes = img.tobytes()
    file_header = struct.pack("<2sIHHI", b"BM", 54 + len(pixel_bytes), 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_bytes), 2835, 2835, 0, 0
    )
    return file_header + info_header + pixel_bytes


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV -> (samples float32 in [-1, 1] shaped (n, channels), rate)."""
    import wave

    with wave.open(io.BytesIO(blob), "rb") as wf:
        rate = wf.getframerate()
        n = wf.getnframes()
        ch = wf.getnchannels()
        width = wf.getsampwidth()
        raw = wf.readframes(n)
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    return samples.reshape(-1, ch), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """float32 (n, channels) in [-1, 1] -> 16-bit PCM WAV bytes."""
    import wave

    if samples.ndim == 1:
        samples = samples[:, None]
    pcm = np.clip(samples * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize (deterministic, pure numpy index sampling)."""
    h, w = arr.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return arr[ys][:, xs]


def image_features(arr: np.ndarray) -> list[float]:
    """Per-channel mean + 8-bin luminance histogram (fractions): a real,
    deterministic 11-dim feature vector. Means are NOT rounded — for
    pixel counts ≤ 2^16 they are dyadic rationals exact in float32, which
    is what makes the decode pipeline SQL-oracle-checkable bit-for-bit."""
    a = arr.astype(np.float64)
    if a.ndim == 2:
        a = a[:, :, None]
    means = a.mean(axis=(0, 1))
    means = np.pad(means, (0, 3 - len(means)), constant_values=means.mean())[:3]
    lum = a.mean(axis=2)
    hist, _ = np.histogram(lum, bins=8, range=(0, 256))
    hist = hist / max(1, lum.size)
    return [float(x) for x in (*means, *hist)]


def audio_features(samples: np.ndarray) -> list[float]:
    """RMS, peak, zero-crossing rate per clip (mono-folded)."""
    mono = samples.mean(axis=1)
    rms = float(np.sqrt((mono**2).mean())) if mono.size else 0.0
    peak = float(np.abs(mono).max()) if mono.size else 0.0
    zcr = float((np.diff(np.signbit(mono)) != 0).mean()) if mono.size > 1 else 0.0
    return [round(rms, 6), round(peak, 6), round(zcr, 6)]


def _decode_one(blob: bytes) -> dict:
    """Sniff + decode one media blob -> MEDIA_META_SCHEMA dict."""
    out = {f.name: None for f in MEDIA_META_SCHEMA.fields}
    out["media_id"] = hashlib.sha256(blob).hexdigest()[:16]
    try:
        if blob[:2] in (b"P5", b"P6"):
            arr = decode_netpbm(blob)
            out.update(
                kind="image",
                format="ppm" if blob[:2] == b"P6" else "pgm",
                mime="image/x-portable-pixmap" if blob[:2] == b"P6" else "image/x-portable-graymap",
                width=arr.shape[1], height=arr.shape[0], channels=arr.shape[2],
                feature=image_features(arr),
            )
        elif blob[:2] == b"BM":
            arr = decode_bmp(blob)
            out.update(
                kind="image", format="bmp", mime="image/bmp",
                width=arr.shape[1], height=arr.shape[0], channels=arr.shape[2],
                feature=image_features(arr),
            )
        elif blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
            samples, rate = decode_wav(blob)
            out.update(
                kind="audio", format="wav", mime="audio/wav",
                channels=samples.shape[1], sample_rate=rate,
                duration_ms=int(round(1000.0 * len(samples) / rate)),
                feature=audio_features(samples),
            )
        else:
            out["error"] = "unsupported format (magic %r)" % blob[:4]
    except Exception as e:  # lax mode: per-record error, never a dead stage
        out["error"] = f"{type(e).__name__}: {e}"
    return out


def _fake_decode(blob: bytes, kind: str) -> dict:
    """Deterministic stand-in for plumbing tests over arbitrary bytes:
    metadata + an 8-dim 'feature' from the sha256. NOT a real decode."""
    h = hashlib.sha256(blob).digest()
    vals = np.frombuffer(h[:32], dtype=np.uint8).astype(np.float32) / 255.0
    out = {f.name: None for f in MEDIA_META_SCHEMA.fields}
    out.update(
        media_id=h.hex()[:16],
        kind=kind,
        format="fake",
        mime={"image": "image/unknown", "audio": "audio/unknown", "video": "video/unknown"}[kind],
        width=int(h[0]) + 1 if kind != "audio" else None,
        height=int(h[1]) + 1 if kind != "audio" else None,
        duration_ms=(int.from_bytes(h[2:4], "big") if kind != "image" else None),
        feature=vals[:8].tolist(),
    )
    return out


# ---------------------------------------------------------------------------
# Spark stages
# ---------------------------------------------------------------------------

def decode_media(
    df: DataFrame,
    bytes_col: str,
    kind: str = "image",
    fake: bool = False,
    keep: list[str] | None = None,
) -> DataFrame:
    """binary column -> MEDIA_META_SCHEMA rows (map-only, Arrow-batched).

    Real decode for netpbm/BMP/WAV (magic-sniffed; codec-free formats);
    unsupported formats get a per-record ``error``. ``fake=True`` keeps the
    hash-based stand-in for plumbing tests over arbitrary bytes. ``keep``
    carries key columns through the stage (no join needed downstream)."""
    keep = keep or []
    meta_cols = [f.name for f in MEDIA_META_SCHEMA.fields]
    out_schema = StructType(
        [df.schema[c] for c in keep] + list(MEDIA_META_SCHEMA.fields)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _fake_decode(bytes(b), kind) if fake else _decode_one(bytes(b))
                for b in pdf[bytes_col]
            ]
            meta = pd.DataFrame(rows, columns=meta_cols)
            yield pd.concat(
                [pdf[keep].reset_index(drop=True), meta.reset_index(drop=True)],
                axis=1,
            )

    return df.select([*keep, bytes_col]).mapInPandas(gen, out_schema)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("image", BinaryType()),
        StructField("error", StringType()),
    ]
)


def resize_images(df: DataFrame, bytes_col: str, width: int, height: int) -> DataFrame:
    """Real distributed resize: decode (netpbm/BMP) -> nearest-neighbor
    sample -> re-encode as netpbm. Map-only; the binary crosses the Arrow
    boundary once each way."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[bytes_col]:
                blob = bytes(b)
                row = {
                    "media_id": hashlib.sha256(blob).hexdigest()[:16],
                    "width": width, "height": height, "image": None, "error": None,
                }
                try:
                    arr = decode_bmp(blob) if blob[:2] == b"BM" else decode_netpbm(blob)
                    row["image"] = encode_netpbm(resize_nearest(arr, width, height))
                except Exception as e:
                    row["error"] = f"{type(e).__name__}: {e}"
                rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return df.select(bytes_col).mapInPandas(gen, RESIZED_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int) -> DataFrame:
    """Frame-sampling for video rows: expands duration into frame
    timestamps with built-in sequence() — shuffle-free, codegen'd. The
    per-frame pixel fetch would slot a video codec here (none is
    codec-free; see module docstring)."""
    return df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


# back-compat aliases (r1 names)
resize_stub = resize_images
frame_sample_stub = frame_sample
