"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode/feature libraries (PIL, ffmpeg, torchaudio…) are NOT in this
container, so the decode kernels are STUBBED — either raising
NotImplementedError (production placeholder) or producing a
deterministic fake (test mode). Everything Spark-side is REAL and
tested: schemas, Arrow batch shape, mapInPandas signatures, partition
behavior — swap the kernel body and the pipeline is production-shaped.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, StringType, StructField, StructType,
)

MEDIA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), False),  # opaque encoded bytes
        StructField("meta", StructType([
            StructField("mime", StringType(), True),
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
            StructField("duration_ms", IntegerType(), True),
        ]), True),
    ]
)

FEATURES = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("features", ArrayType(FloatType(), False), False),
    ]
)


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in feature vector derived from payload bytes —
    stable across runs/executors, so tests can assert exact values."""
    h = np.frombuffer(payload[: dim * 4].ljust(dim * 4, b"\0"), dtype=np.uint32)
    return (h % 1000).astype(np.float32) / 1000.0


def extract_features(media: DataFrame, dim: int = 16, fake: bool = False) -> DataFrame:
    """binary payload → feature vector via Arrow-batched mapInPandas.

    With fake=False this raises NotImplementedError at task time — the
    clearly-marked decode stub (image/audio libs absent in this
    environment). With fake=True a deterministic byte-derived vector is
    produced so the full Spark plumbing is exercised end-to-end.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires image/audio libraries not present "
                    "in this environment; run with fake=True for plumbing tests"
                )
            feats = [ _fake_features(p, dim).tolist() for p in b["payload"] ]
            yield pd.DataFrame(
                {"media_id": b["media_id"], "kind": b["kind"], "features": feats}
            )

    return media.mapInPandas(run, schema=FEATURES)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts) —
    pure column ops on metadata; the decode of each frame is the stubbed
    kernel above. Shows the explode-then-decode shape a real pipeline uses."""
    n_frames = F.greatest((F.col("meta.duration_ms") / every_ms).cast("int"), F.lit(1))
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).select("media_id", "frame_idx", (F.col("frame_idx") * every_ms).alias("frame_ts_ms"))


def synthetic_media(spark, n: int = 32) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes([(i * 7 + j) % 256 for j in range(128)])
        rows.append(
            (f"m{i:04d}", kind, payload,
             {"mime": f"x/{kind}", "width": 64 if kind == "image" else None,
              "height": 64 if kind == "image" else None,
              "duration_ms": 3500 if kind != "image" else None})
        )
    return spark.createDataFrame(rows, schema=MEDIA)
