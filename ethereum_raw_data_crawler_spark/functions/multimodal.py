"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode step is STUBBED (the sandbox image ships no imaging/audio
libraries): ``decode_media`` raises NotImplementedError unless the
deterministic fake decoder is selected. Everything Spark-side is REAL and
tested — schema, partitioning, Arrow batch shapes, mapInPandas signatures
— so dropping in a real decoder (PIL/libav) is a one-function change.

At 100 TB the media bytes dominate row size: the operators here keep the
binary column out of shuffles (feature extraction happens map-side before
any wide operation) and emit fixed-width float features that are ~1000x
smaller than the payload.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_DIM = 16

FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)


def decode_media(payload: bytes, kind: str, fake: bool = True) -> np.ndarray:
    """Decode media bytes into a feature vector.

    ``fake=True`` (default in this environment): a deterministic
    hash-derived pseudo-feature — stable across runs and partitions, so
    the distributed plumbing is fully testable. ``fake=False`` is the
    production hook for a real decoder.
    """
    if not fake:
        raise NotImplementedError(
            "real media decoding requires imaging/audio libraries not "
            "present in this environment; plug a decoder in here"
        )
    import hashlib

    digest = hashlib.sha256(bytes(payload) + kind.encode()).digest()
    raw = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16)
    return (raw.astype(np.float32) / 65535.0)[:FEATURE_DIM]


def extract_media_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """media(media_id, kind, payload, meta) -> fixed-width features.
    One Arrow pass; the heavy binary column never reaches a shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            feats = [
                decode_media(p, k, fake=fake)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len),
                    "features": [f.tolist() for f in feats],
                }
            )

    return media.mapInPandas(run, FEATURES)


def gen_media(n: int = 200, seed: int = 42) -> pd.DataFrame:
    """Deterministic synthetic media table (binary payloads + meta)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    rows = []
    for i in range(n):
        size = int(rng.integers(200, 2000))
        payload = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        rows.append(
            (
                i,
                str(kinds[i]),
                payload,
                {"w": str(int(rng.integers(16, 512))), "codec": "fake"},
            )
        )
    return pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])
