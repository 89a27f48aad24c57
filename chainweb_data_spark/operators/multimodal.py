"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode step is STUBBED:
``decode_image`` raises ``NotImplementedError`` unless a known deterministic
fake format (see ``fake_image_bytes``) is detected, in which case a
deterministic fake decode runs.  Everything Spark-side — schema, batch
iteration, partitioning, UDF signatures — is real and tested.

At 100 TB: binaries ride in their own column (Parquet keeps them in separate
column chunks → metadata-only queries never read the bytes); feature
extraction is ``mapInPandas`` so one Arrow batch of binaries is processed per
Python call, and ``spark.sql.files.maxPartitionBytes`` bounds task memory.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),  # fake-rgb8|png|wav|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)

FAKE_MAGIC = b"FKE1"


def fake_image_bytes(seed: int, width: int = 8, height: int = 8) -> bytes:
    """Deterministic fake 'image': FKE1 | w | h | seed-derived RGB8 payload."""
    rng = np.random.default_rng(seed)
    payload = rng.integers(0, 256, size=width * height * 3, dtype=np.uint8)
    return FAKE_MAGIC + struct.pack("<HH", width, height) + payload.tobytes()


def decode_image(data: bytes) -> np.ndarray:
    """Decode a binary image payload to HxWx3 uint8.

    Real codecs (PIL/libvips/ffmpeg) are unavailable in this container —
    only the deterministic fake format decodes; anything else raises, which
    is the documented stub boundary.
    """
    if data[:4] == FAKE_MAGIC:
        w, h = struct.unpack("<HH", data[4:8])
        return np.frombuffer(data[8 : 8 + w * h * 3], dtype=np.uint8).reshape(h, w, 3)
    raise NotImplementedError(
        "real image codecs not available in this environment; "
        "plug PIL/turbojpeg here in production"
    )


def attach_fake_media(df: DataFrame, id_col: str) -> DataFrame:
    """Derive a deterministic fake media column + metadata from an id column
    (test/bench harness for the binary pipeline)."""

    @F.pandas_udf(T.BinaryType())
    def _mk(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: fake_image_bytes(int(i)))

    return df.withColumn("media", _mk(F.col(id_col))).withColumn(
        "media_meta",
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake-rgb8").alias("format"),
            F.lit(8).alias("width"),
            F.lit(8).alias("height"),
            F.lit(1).alias("n_frames"),
            F.lit(0).cast("int").alias("sample_rate"),
        ),
    )


IMAGE_FEATURE_SCHEMA = "id long, sha16 string, n_bytes long, mean_r double, mean_g double, mean_b double"


def image_features(df: DataFrame, id_col: str, media_col: str = "media") -> DataFrame:
    """Per-image features via mapInPandas (Arrow batches of binaries →
    vectorized numpy).  Pattern generalizes to resize / frame-sample /
    embedding extraction — swap the body, keep the plumbing."""
    id_c, media_c = id_col, media_col

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, data in zip(pdf[id_c], pdf[media_c]):
                img = decode_image(bytes(data))
                rows.append(
                    {
                        "id": int(i),
                        "sha16": hashlib.sha256(bytes(data)).hexdigest()[:16],
                        "n_bytes": len(data),
                        "mean_r": float(img[:, :, 0].mean()),
                        "mean_g": float(img[:, :, 1].mean()),
                        "mean_b": float(img[:, :, 2].mean()),
                    }
                )
            yield pd.DataFrame(rows, columns=["id", "sha16", "n_bytes", "mean_r", "mean_g", "mean_b"])

    return df.select(id_c, media_c).mapInPandas(_extract, IMAGE_FEATURE_SCHEMA)
