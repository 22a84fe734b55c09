"""Multimodal binary-column plumbing (driver mandate).

Images/audio/video ride as opaque ``binary`` columns with a typed
metadata struct — the Spark-side schema, partitioning, UDF signatures and
Arrow batch shapes are real and tested; the actual media decode is STUBBED
(the decode libraries are not in this container): ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, in which case a clearly
deterministic fake decoder (seeded from the payload bytes) produces stable
feature vectors so the distributed plumbing is exercisable end-to-end.

Scale notes: media payloads dominate row size → ``media`` tables should be
read with the payload column pruned except in the decode stage;
``decode_features`` uses ``mapInPandas`` so one Arrow batch holds many
payloads and the (future, real) decoder amortizes per-batch setup.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("url", T.StringType(), True),
    T.StructField("kind", T.StringType(), False),     # image | audio | video
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("mime", T.StringType(), True),
    ]), True),
])

FEATURE_DIM = 16


def make_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (binary payloads + metadata)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 512)),
                               dtype=np.uint8).tobytes()
        rows.append((i, f"https://example.org/media/{i}", kind, payload,
                     (int(rng.integers(16, 1024)), int(rng.integers(16, 1024)),
                      int(rng.integers(100, 60000)), f"x/{kind}")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic fake 'decoder': features from the payload digest."""
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16)
    return (raw.astype(np.float32) / 65535.0)


def decode_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """payload binary → feature vector array<float> via mapInPandas.

    Real decode is NOT implemented in this container; call with
    ``fake=True`` for the deterministic stand-in (tests/bench) —
    the Spark plumbing (schema, batching, pruning) is identical.
    """

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            if not fake:
                raise NotImplementedError(
                    "media decode requires image/audio libs absent from "
                    "this container; pass fake=True for the deterministic "
                    "stand-in")
            feats = [
                _fake_decode(bytes(p)).tolist() if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(np.int64),
                "kind": pdf["kind"],
                "features": feats,
            })

    return media.select("media_id", "kind", "payload").mapInPandas(
        kernel, schema="media_id long, kind string, features array<float>")


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per frame timestamp to decode —
    pure column expressions (sequence/explode), no payload touched, so the
    planner output is cheap to shuffle to decode executors."""
    return (media.filter(F.col("kind") == "video")
            .select("media_id",
                    F.explode(F.sequence(
                        F.lit(0),
                        F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                        F.lit(every_ms))).alias("frame_ts_ms")))
