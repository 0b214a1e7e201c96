"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side contract is fully real — schemas, Arrow batch shapes,
``mapInPandas`` partitioning, metadata structs; only the *codec* step is
stubbed (this container ships no image/audio libraries): ``decode_image``
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic byte-level pseudo-decode stands in so the distributed
plumbing is testable end-to-end. Swap ``_fake_decode`` for PIL/ffmpeg in
production; nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha1", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("byte_entropy", T.DoubleType(), False),
        T.StructField("histogram", T.ArrayType(T.LongType()), False),
    ]
)


def attach_media_metadata(df: DataFrame, binary_col: str, media_type: str) -> DataFrame:
    """Typed metadata struct beside the opaque binary (JVM-side)."""
    return df.withColumn(
        f"{binary_col}_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.length(F.col(binary_col)).cast("long").alias("n_bytes"),
            F.sha1(F.col(binary_col)).alias("sha1"),
        ),
    )


def _fake_decode(buf: bytes) -> np.ndarray:
    """Deterministic stand-in decode: bytes → uint8 'pixel' array."""
    return np.frombuffer(buf, dtype=np.uint8)


def decode_image(buf: bytes, fake: bool = False) -> np.ndarray:
    if fake:
        return _fake_decode(buf)
    raise NotImplementedError(
        "image codecs unavailable in this container — pass fake=True for the "
        "deterministic test decode, or plug PIL/cv2 here in production"
    )


def extract_features(
    df: DataFrame, key_col: str, binary_col: str, n_bins: int = 16, fake: bool = True
) -> DataFrame:
    """Distributed feature extraction over binary media via mapInPandas:
    per-batch numpy (byte histogram + entropy as the stand-in for real
    embeddings). The batch shape/schema is exactly what a real
    decode+featurize would use."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, buf in zip(pdf[key_col], pdf[binary_col]):
                arr = decode_image(bytes(buf), fake=fake)
                hist, _ = np.histogram(arr, bins=n_bins, range=(0, 256))
                p = hist / max(arr.size, 1)
                nz = p[p > 0]
                entropy = float(-(nz * np.log2(nz)).sum()) if nz.size else 0.0
                rows.append((str(key), int(arr.size), round(entropy, 6), hist.tolist()))
            yield pd.DataFrame(
                rows, columns=["key", "n_bytes", "byte_entropy", "histogram"]
            )

    return df.select(
        F.col(key_col).alias(key_col), F.col(binary_col).alias(binary_col)
    ).mapInPandas(featurize, FEATURE_SCHEMA)


def frame_sample(
    df: DataFrame, key_col: str, binary_col: str, every_n: int = 1024, width: int = 64
) -> DataFrame:
    """'Frame sampling' plumbing: slice fixed-width windows every N bytes
    (stand-in for video frame extraction) → one row per (key, frame_no)."""
    schema = T.StructType(
        [
            T.StructField("key", T.StringType(), False),
            T.StructField("frame_no", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), False),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, buf in zip(pdf[key_col], pdf[binary_col]):
                b = bytes(buf)
                for i, off in enumerate(range(0, len(b), every_n)):
                    rows.append((str(key), i, b[off : off + width]))
            yield pd.DataFrame(rows, columns=["key", "frame_no", "frame"])

    return df.select(key_col, binary_col).mapInPandas(sample, schema)
