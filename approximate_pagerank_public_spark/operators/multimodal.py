"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata; the
Spark-side plumbing — schema, partitioning, Arrow batch shape, Pandas
UDF signatures over ``mapInPandas`` — is real and tested. The actual
codec work (image decode, resampling, frame extraction) requires
libraries not present in this environment, so the decode core is
STUBBED: ``decode_stub=True`` (default) produces deterministic fake
features derived from the payload bytes; ``decode_stub=False`` raises
``NotImplementedError`` at the point a real codec would run.
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


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, 128 + (i % 64), dtype=np.uint8).tobytes()
        rows.append(
            (
                i,
                kind,
                payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + i % 32 if kind != "audio" else None,
                48 + i % 16 if kind != "audio" else None,
                (1000 + 10 * i) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _stub_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake feature: byte histogram folded to ``dim``."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
    norm = np.linalg.norm(hist)
    return hist / norm if norm > 0 else hist


def extract_features(
    media: DataFrame, dim: int = 16, decode_stub: bool = True
) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow-batched).

    The batch shape is (media_id, kind, payload) → (media_id, kind,
    feature[dim], n_bytes); at scale the input should be partitioned by
    a storage-locality key before this pass (payloads dominate I/O).
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires codec libraries not present "
                    "in this environment; run with decode_stub=True"
                )
            feats = [_stub_feature(p, dim) for p in pdf["payload"]]
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

    Real decode→resize→encode needs codec libraries absent here, so the
    pixel work is STUBBED deterministically: the output payload is the
    input bytes resampled (nearest-index) to a length proportional to
    the target pixel count — shape-faithful for testing the Spark-side
    plumbing (schema, filter pushdown to the image rows, Arrow batch
    shape, payload-size scaling). ``decode_stub=False`` raises where a
    real codec would run.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real image resize requires codec libraries not present "
                    "in this environment; run with decode_stub=True"
                )
            out_payloads = []
            for p, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
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
