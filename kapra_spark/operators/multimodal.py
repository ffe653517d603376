"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The container ships no codec libraries, so the decode kernels are
STUBBED (deterministic fake decode, clearly marked) — but all the
Spark-side machinery is real and tested: schema, partition-friendly
layout, Arrow batch shapes, UDF signatures, frame sampling, and
feature extraction run exactly as they would with a real decoder
swapped in (the ``decoder`` argument).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("mime", T.StringType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
    T.StructField("payload", T.BinaryType(), False),     # opaque bytes
])

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.IntegerType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), False),
])


def fake_media_df(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        size = int(rng.integers(256, 4096))
        rows.append((
            f"m{i:06d}", kind,
            {"image": "image/png", "audio": "audio/wav",
             "video": "video/mp4"}[kind],
            int(rng.integers(32, 1024)) if kind != "audio" else None,
            int(rng.integers(32, 1024)) if kind != "audio" else None,
            int(rng.integers(1000, 60000)) if kind != "image" else None,
            bytes(rng.integers(0, 256, size=size, dtype=np.uint8)),
        ))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def stub_decoder(payload: bytes, kind: str) -> np.ndarray:
    """STUB decode — the real pipeline would call PIL/librosa/ffmpeg
    here. Deterministic fake: interpret bytes as a uint8 stream and
    produce an 8-dim byte-histogram embedding. Raises for unknown
    kinds exactly like a real decoder would."""
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for kind={kind!r}")
    b = np.frombuffer(payload, dtype=np.uint8)
    hist, _ = np.histogram(b, bins=8, range=(0, 256))
    return (hist / max(1, len(b))).astype(np.float32)


def extract_features(media_df: DataFrame, decoder=stub_decoder,
                     batch_kind: str | None = None) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches of
    binary payloads -> float feature vectors). Swap ``decoder`` for a
    real codec without touching the Spark plumbing."""

    def fn(batches):
        for pdf in batches:
            feats = [decoder(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "feature": feats,
            })

    df = media_df
    if batch_kind:
        df = df.filter(F.col("kind") == batch_kind)
    return df.mapInPandas(fn, FEATURES_SCHEMA)


def sample_frames(media_df: DataFrame, every_ms: int = 5000) -> DataFrame:
    """Frame-sampling plumbing for video: one output row per sampled
    frame offset (sequence+explode on metadata — no decode needed to
    plan the work, which is what matters for partitioning at scale).
    The frame pixel decode itself is the stubbed part."""
    vids = media_df.filter(F.col("kind") == "video")
    return (vids.select(
        "media_id", "payload",
        F.explode(F.sequence(F.lit(0), F.col("duration_ms"),
                             F.lit(every_ms))).alias("frame_ms")))
