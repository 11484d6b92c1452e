"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The Spark-side plumbing is real and tested: schema contract, partition-sized
Arrow batching through ``mapInPandas``, deterministic feature extraction over
raw bytes. The *codec* step (JPEG/PNG decode, audio resample, video frame
sampling) is STUBBED — the decode libraries (Pillow/librosa/av) are not in
this container — behind ``decode_stub``: a clearly-marked deterministic fake
that derives a fixed-shape array from the bytes, so the pipeline shape
(batch sizes, UDF signatures, schema evolution) is exercised end to end and
a real codec drops in by replacing one function.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, LongType, StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_DIM = 16


def decode_stub(payload: bytes, kind: str):
    """STUB for the real codec. Deterministic fake: folds the bytes into a
    FEATURE_DIM-float vector by column-wise byte sums scaled by 1/256.
    Sums are < 2^24 and the scale is a power of two, so every feature value
    is **exact in float32** — which is what lets the DuckDB oracle reproduce
    the pipeline bit-for-bit. Replace with PIL/librosa/av decode in a
    container that ships them."""
    import numpy as np

    if payload is None or len(payload) == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    pad = (-len(arr)) % FEATURE_DIM
    if pad:
        arr = np.concatenate([arr, np.zeros(pad)])
    folded = arr.reshape(-1, FEATURE_DIM).sum(axis=0) / 256.0
    return folded.astype(np.float32)


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """(media_id, kind, payload, …) → (media_id, kind, feature array<float>,
    n_bytes). Arrow-batched; one NumPy pass per batch, no per-row Python
    beyond the stubbed codec call."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = [decode_stub(p, k).tolist() for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(
        kernel, "media_id long, kind string, feature array<float>, n_bytes long"
    )


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for pipeline tests (payload bytes are a
    pure function of media_id)."""
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        size = 64 + (i * 37 + seed) % 512
        payload = bytes(((i * 131 + j * 17 + seed) % 256) for j in range(size))
        rows.append(
            (
                i,
                kinds[i % 3],
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kinds[i % 3]],
                payload,
                64 if kinds[i % 3] == "image" else None,
                64 if kinds[i % 3] == "image" else None,
                1000 if kinds[i % 3] != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
