"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partition-preserving
``mapInPandas`` batch shape, Arrow transfer of binary columns, metadata
structs. The actual decode (PIL/ffmpeg/librosa) is NOT available in this
container, so the decode kernel is stubbed: ``decoder="fake"`` produces a
deterministic feature vector from the bytes (so pipelines are end-to-end
testable); ``decoder="real"`` raises NotImplementedError at the exact
point where a decode library would plug in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def gen_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, int(rng.integers(64, 4096)), dtype=np.uint8).tobytes()
        meta = {
            "width": int(rng.integers(16, 1024)) if kind != "audio" else None,
            "height": int(rng.integers(16, 1024)) if kind != "audio" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "n_frames": int(rng.integers(1, 300)) if kind == "video" else None,
            "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
        }
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def _fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in for decode+feature-extract: 16 floats
    derived from an md5 stream over the payload."""
    if payload is None:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    h = hashlib.md5(kind.encode() + payload).digest()
    arr = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
    return np.resize(arr / 255.0, FEATURE_DIM)


def extract_features(
    df: DataFrame, decoder: str = "fake", batch_hint: int | None = None
) -> DataFrame:
    """Decode + featurize every media row via ``mapInPandas``.

    Partition-preserving (no shuffle); payload bytes move executor→Python
    worker as Arrow binary batches; output is a typed feature table ready
    for the similarity operators (``operators.similarity``).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real decoders (PIL/ffmpeg/librosa) are not installed in "
                    "this container; plug the decode call in here"
                )
            feats = [
                _fake_decode(p, k).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return df.mapInPandas(op, schema=_FEATURE_SCHEMA)


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def resize_images(
    df: DataFrame, max_dim: int = 256, decoder: str = "fake"
) -> DataFrame:
    """Image-resize plumbing via ``mapInPandas`` (no shuffle).

    The fake kernel computes the aspect-preserving target dimensions
    (longest side → ``max_dim``, never upscales) and passes the payload
    through; ``decoder="real"`` raises at the exact point a PIL
    ``Image.open(...).thumbnail(...)`` call would plug in. Non-image
    rows are filtered JVM-side before the Python stage."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real image decode/resize (PIL) is not installed in "
                    "this container; plug Image.open().thumbnail() in here"
                )
            ws, hs = [], []
            for w, h in zip(pdf["width"], pdf["height"]):
                if w is None or h is None or w <= 0 or h <= 0:
                    ws.append(None)
                    hs.append(None)
                    continue
                scale = min(1.0, max_dim / max(w, h))
                ws.append(max(1, int(w * scale)))
                hs.append(max(1, int(h * scale)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"],
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                }
            )

    imgs = df.where(F.col("kind") == "image").select(
        "media_id",
        "payload",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    return imgs.mapInPandas(op, schema=_RESIZE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plan: explode frame indexes 0, n, 2n, …
    (metadata-only — JVM-side sequence; the per-frame decode would reuse
    ``extract_features``)."""
    return (
        df.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.n_frames") - 1, F.lit(0)),
                    F.lit(every_n),
                )
            ).alias("frame_idx"),
        )
    )
