"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata; the
Spark-side plumbing — schema, partitioning, Arrow batch shape, Pandas
UDF signatures over ``mapInPandas`` — is real and tested.

Codec coverage: **uncompressed containers decode for real, in pure
NumPy** — 24-bit BI_RGB BMP (:func:`decode_bmp`/:func:`encode_bmp`) and
PCM-16 mono WAV (:func:`decode_wav`/:func:`encode_wav`) — so
``decode_stub=False`` runs a genuine decode → feature/resize kernel for
those formats (golden-tested against known pixels/samples). Compressed
codecs (JPEG/PNG/MP4...) require libraries not present in this
environment and still raise ``NotImplementedError`` at the point the
codec would run. ``decode_stub=True`` (default) keeps the deterministic
byte-derived fake for schema/plumbing tests regardless of format.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("feature", ArrayType(DoubleType())),
        StructField("n_bytes", LongType()),
    ]
)


# ------------------------------------------------------------ real codecs
def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit BI_RGB BMP (bottom-up rows, BGR,
    4-byte row padding) — the standard uncompressed container, written
    with NumPy + struct only."""
    import struct

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row_bytes = (w * 3 + 3) // 4 * 4
    img_size = row_bytes * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP → (h, w, 3) uint8 RGB. Pure NumPy."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", payload, 10)
    size, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only 24-bit BI_RGB BMP supported (bpp={bpp}, comp={comp})")
    flip = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) // 4 * 4
    arr = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * h, offset=offset)
    px = arr.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR→RGB
    return px[::-1] if flip else px


def encode_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """int16 mono samples → PCM-16 RIFF/WAVE container."""
    import struct

    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16)
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data), b"WAVE")
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM-16 mono RIFF/WAVE → (int16 samples, sample_rate). Walks the
    chunk list, so extra chunks (LIST, fact...) are tolerated."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(payload):
        cid, sz = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise NotImplementedError(
                    f"only PCM-16 mono WAV supported (fmt={audio_fmt}, "
                    f"ch={channels}, bits={bits})"
                )
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + sz + (sz & 1)
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return samples, rate


def synthesize_media(
    spark, n: int = 64, seed: int = 42, real_codecs: bool = False
) -> DataFrame:
    """Deterministic fake media table. ``real_codecs=True`` emits valid
    24-bit BMP image payloads and PCM-16 WAV audio payloads (video stays
    seeded bytes — no uncompressed video container here) so the
    ``decode_stub=False`` path exercises the real decoders end-to-end."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        w = 64 + i % 32 if kind != "audio" else None
        h = 48 + i % 16 if kind != "audio" else None
        dur = (1000 + 10 * i) if kind != "image" else None
        if real_codecs and kind == "image":
            payload = encode_bmp(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
            mime = "image/bmp"
        elif real_codecs and kind == "audio":
            n_samp = 16 * dur  # 16 kHz, duration_ms samples
            payload = encode_wav(
                rng.integers(-(2**15), 2**15, n_samp, dtype=np.int64).astype(np.int16)
            )
            mime = "audio/wav"
        else:
            payload = rng.integers(0, 256, 128 + (i % 64), dtype=np.uint8).tobytes()
            mime = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind]
        rows.append((i, kind, payload, mime, w, h, dur))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _stub_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake feature: byte histogram folded to ``dim``."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
    norm = np.linalg.norm(hist)
    return hist / norm if norm > 0 else hist


def _l2(v: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def _real_feature(payload: bytes, kind: str, dim: int) -> np.ndarray:
    """Decoded-pixel/sample feature for the uncompressed containers.

    image (BMP): L2-normalized ``dim``-bin luminance histogram;
    audio (WAV): L2-normalized per-window RMS over ``dim`` windows.
    Anything else (JPEG/PNG/MP4...) needs a codec library → raise."""
    if kind == "image" and bytes(payload[:2]) == b"BM":
        px = decode_bmp(payload)
        lum = (
            0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
        ).ravel()
        hist, _ = np.histogram(lum, bins=dim, range=(0.0, 256.0))
        return _l2(hist.astype(np.float64))
    if kind == "audio" and bytes(payload[:4]) == b"RIFF":
        samples, _rate = decode_wav(payload)
        x = samples.astype(np.float64) / 2**15
        edges = np.linspace(0, len(x), dim + 1).astype(np.int64)
        rms = np.array(
            [
                np.sqrt(np.mean(x[a:b] ** 2)) if b > a else 0.0
                for a, b in zip(edges[:-1], edges[1:])
            ]
        )
        return _l2(rms)
    raise NotImplementedError(
        f"no pure-NumPy decoder for this {kind} payload — only uncompressed "
        "BMP/WAV decode without codec libraries; run with decode_stub=True"
    )


def extract_features(
    media: DataFrame, dim: int = 16, decode_stub: bool = True
) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow-batched).

    The batch shape is (media_id, kind, payload) → (media_id, kind,
    feature[dim], n_bytes); at scale the input should be partitioned by
    a storage-locality key before this pass (payloads dominate I/O).
    ``decode_stub=False`` runs the real decoders (BMP/WAV; golden-tested)
    and raises on formats that need codec libraries.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub:
                feats = [_stub_feature(p, dim) for p in pdf["payload"]]
            else:
                feats = [
                    _real_feature(p, k, dim)
                    for p, k in zip(pdf["payload"], pdf["kind"])
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": [f.tolist() for f in feats],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(fn, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Expand each video into per-frame sampling rows (timestamps only —
    the decode itself is the stubbed stage). Pure expressions."""
    v = media.where(F.col("kind") == "video")
    return v.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ms"),
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_images(
    media: DataFrame,
    target_w: int,
    target_h: int,
    decode_stub: bool = True,
) -> DataFrame:
    """Resize pass over image rows via ``mapInPandas``.

    ``decode_stub=False`` runs the real kernel for BMP payloads:
    decode → nearest-neighbor resample to (target_w, target_h) →
    re-encode BMP (golden-tested pixel-exact); formats that need codec
    libraries raise. ``decode_stub=True`` (default) keeps the
    shape-faithful byte resampling for plumbing tests (schema, filter
    pushdown to the image rows, Arrow batch shape, payload-size
    scaling).
    """

    def _nn_resize(px: np.ndarray) -> np.ndarray:
        h, w, _ = px.shape
        yi = (np.arange(target_h) * h // target_h).clip(0, h - 1)
        xi = (np.arange(target_w) * w // target_w).clip(0, w - 1)
        return px[yi][:, xi]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payloads = []
            for p, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                if not decode_stub:
                    if bytes(p[:2]) != b"BM":
                        raise NotImplementedError(
                            "no pure-NumPy decoder for this image payload — "
                            "only uncompressed BMP resizes without codec "
                            "libraries; run with decode_stub=True"
                        )
                    out_payloads.append(encode_bmp(_nn_resize(decode_bmp(p))))
                    continue
                arr = np.frombuffer(p, dtype=np.uint8)
                in_px = max(1, int(w or 1) * int(h or 1))
                out_len = max(1, int(len(arr) * (target_w * target_h) / in_px))
                idx = (np.arange(out_len) * len(arr) // out_len).clip(0, len(arr) - 1)
                out_payloads.append(arr[idx].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": out_payloads,
                    "width": np.full(len(pdf), target_w, dtype=np.int32),
                    "height": np.full(len(pdf), target_h, dtype=np.int32),
                }
            )

    imgs = media.where(F.col("kind") == "image").select(
        "media_id", "kind", "payload", "width", "height"
    )
    return imgs.mapInPandas(fn, RESIZED_SCHEMA)
