"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so compressed-format decode
paths are pluggable registry entries: ``decode_image`` raises
``NotImplementedError`` unless a registered codec matches the payload
magic.  Registered here: the deterministic fake formats
(``fake_image_bytes`` et al.) AND one REAL pure-stdlib codec per modality
— PNG for images (``operators/png.py``: zlib + the five scanline filters,
CRC-verified), RIFF/WAVE integer PCM for audio (``operators/wav.py``),
and YUV4MPEG2 for video (``operators/y4m.py``, whose fixed frame stride
also backs the seek-sampling fast path in ``video_frame_sample``).
JPEG/MP3/H.264 remain the documented pluggable boundary.  Everything
Spark-side — schema, batch iteration, partitioning, UDF signatures — is
real and tested.

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

# ---------------------------------------------------------------------------
# codec registry: {(media_type, magic) -> decoder}.  The production swap is
# DATA, not code edits: register_codec("image", b"\x89PNG", pil_decode) and
# every pipeline below decodes PNGs — the fake formats register through the
# exact same door at import.  Spark kernels snapshot the registry into their
# closure at plan-build time (cloudpickle ships the snapshot — including
# decoders registered at runtime — to executors, where a module-global dict
# would arrive import-fresh without them).
# ---------------------------------------------------------------------------

from typing import Callable

_CODECS: dict[tuple[str, bytes], Callable[[bytes], object]] = {}


def register_codec(
    media_type: str, magic: bytes, decoder: Callable[[bytes], object]
) -> None:
    """Route payloads of ``media_type`` whose bytes start with ``magic``
    through ``decoder``.  Re-registering a (type, magic) pair replaces the
    decoder."""
    _CODECS[(media_type, magic)] = decoder


def unregister_codec(media_type: str, magic: bytes) -> None:
    _CODECS.pop((media_type, magic), None)


def _registry_snapshot() -> dict[tuple[str, bytes], Callable[[bytes], object]]:
    return dict(_CODECS)


def _decode(
    codecs: dict[tuple[str, bytes], Callable[[bytes], object]],
    media_type: str,
    data: bytes,
):
    for (mt, magic), fn in codecs.items():
        if mt == media_type and data[: len(magic)] == magic:
            return fn(data)
    raise NotImplementedError(
        f"no registered {media_type} codec matches the payload magic; "
        "real codecs (PIL/turbojpeg/ffmpeg/soundfile) are unavailable in "
        "this environment — register_codec() them here in production"
    )


def fake_image_bytes(seed: int, width: int = 8, height: int = 8) -> bytes:
    """Deterministic fake 'image': FKE1 | w | h | seed-derived RGB8 payload."""
    rng = np.random.default_rng(seed)
    payload = rng.integers(0, 256, size=width * height * 3, dtype=np.uint8)
    return FAKE_MAGIC + struct.pack("<HH", width, height) + payload.tobytes()


def _decode_fake_image(data: bytes) -> np.ndarray:
    w, h = struct.unpack("<HH", data[4:8])
    return np.frombuffer(data[8 : 8 + w * h * 3], dtype=np.uint8).reshape(h, w, 3)


def decode_image(data: bytes) -> np.ndarray:
    """Decode a binary image payload to HxWx3 uint8 via the codec registry
    (only the deterministic fake format is registered in this container;
    anything else raises — the documented stub boundary)."""
    return _decode(_CODECS, "image", data)


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


FAKE_VIDEO_MAGIC = b"FKV1"
FAKE_AUDIO_MAGIC = b"FKA1"


def fake_video_bytes(
    seed: int, width: int = 8, height: int = 6, n_frames: int = 12
) -> bytes:
    """Deterministic fake 'video': FKV1 | w | h | n | RGB8 frame payload."""
    rng = np.random.default_rng(seed * 7919 + 1)
    payload = rng.integers(0, 256, size=n_frames * width * height * 3, dtype=np.uint8)
    return (
        FAKE_VIDEO_MAGIC
        + struct.pack("<HHH", width, height, n_frames)
        + payload.tobytes()
    )


def _decode_fake_video(data: bytes) -> np.ndarray:
    w, h, n = struct.unpack("<HHH", data[4:10])
    return np.frombuffer(data[10 : 10 + n * w * h * 3], dtype=np.uint8).reshape(
        n, h, w, 3
    )


def decode_video(data: bytes) -> np.ndarray:
    """Binary video payload → (n_frames, H, W, 3) uint8 via the codec
    registry (same stub boundary as decode_image — register ffmpeg/pyav in
    production)."""
    return _decode(_CODECS, "video", data)


def fake_audio_bytes(seed: int, n_samples: int = 1600, sample_rate: int = 16000) -> bytes:
    """Deterministic fake 'audio': FKA1 | rate | n | int16 PCM payload."""
    rng = np.random.default_rng(seed * 104729 + 2)
    samples = rng.integers(-(2**15), 2**15, size=n_samples, dtype=np.int16)
    return (
        FAKE_AUDIO_MAGIC
        + struct.pack("<IH", sample_rate, n_samples)
        + samples.tobytes()
    )


def _decode_fake_audio(data: bytes) -> tuple[int, np.ndarray]:
    rate, n = struct.unpack("<IH", data[4:10])
    return rate, np.frombuffer(data[10 : 10 + 2 * n], dtype=np.int16)


def decode_audio(data: bytes) -> tuple[int, np.ndarray]:
    """Binary audio payload → (sample_rate, int16 samples) via the codec
    registry."""
    return _decode(_CODECS, "audio", data)


# the deterministic fakes register through the same door production codecs
# would — the registry, not special cases in the decode functions
register_codec("image", FAKE_MAGIC, _decode_fake_image)
register_codec("video", FAKE_VIDEO_MAGIC, _decode_fake_video)
register_codec("audio", FAKE_AUDIO_MAGIC, _decode_fake_audio)

# ... and one REAL codec registers through it too (round-7 advice #4): the
# pure-stdlib PNG decoder (operators/png.py — zlib + the five scanline
# filters, 8-bit non-interlaced profile, CRC-verified).  PNG payloads in a
# media column now actually decode; JPEG/ffmpeg/soundfile remain the
# documented pluggable boundary for environments that have them.
from .png import PNG_MAGIC, decode_png, encode_png  # noqa: E402

register_codec("image", PNG_MAGIC, decode_png)

# ... r9 completes the set: one REAL pure-stdlib codec per modality.
# WAV (operators/wav.py — RIFF/WAVE integer PCM) for audio and YUV4MPEG2
# (operators/y4m.py — fixed-stride planar YUV) for video register through
# the same door; compressed formats (JPEG/MP3/H.264) remain the documented
# pluggable boundary for environments that carry the libraries.
from .wav import WAV_MAGIC, decode_wav, encode_wav  # noqa: E402
from .y4m import (  # noqa: E402
    Y4M_MAGIC,
    decode_y4m,
    encode_y4m,
    y4m_sample_frames,
)

register_codec("audio", WAV_MAGIC, decode_wav)
register_codec("video", Y4M_MAGIC, decode_y4m)

#: magic -> sampler(data, every_k) -> [(frame_idx, HxWx3 RGB)].  A format
#: whose container supports frame SEEKING (y4m: fixed stride) registers
#: here so video_frame_sample touches only the sampled frames' bytes; the
#: fallback is decode-everything-then-stride through the codec registry.
_FRAME_SAMPLERS: dict[bytes, Callable[[bytes, int], list]] = {}


def register_frame_sampler(
    magic: bytes, sampler: Callable[[bytes, int], list]
) -> None:
    _FRAME_SAMPLERS[magic] = sampler


register_frame_sampler(Y4M_MAGIC, y4m_sample_frames)


def png_image_bytes(seed: int, width: int = 8, height: int = 8) -> bytes:
    """A REAL PNG (RGB8, filter-0 scanlines) with seed-derived pixels —
    the deterministic fixture for exercising the genuine decode path
    end-to-end without any third-party imaging library."""
    rng = np.random.default_rng(seed * 31337 + 5)
    px = rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)
    return encode_png(px)


def attach_png_media(df: DataFrame, id_col: str) -> DataFrame:
    """Derive a deterministic REAL-PNG media column from an id column
    (same plumbing as attach_fake_media, genuine codec underneath)."""

    @F.pandas_udf(T.BinaryType())
    def _mk(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: png_image_bytes(int(i)))

    return df.withColumn("media", _mk(F.col(id_col))).withColumn(
        "media_meta",
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("png").alias("format"),
            F.lit(8).alias("width"),
            F.lit(8).alias("height"),
            F.lit(1).alias("n_frames"),
            F.lit(0).cast("int").alias("sample_rate"),
        ),
    )


def wav_audio_bytes(
    seed: int, n_samples: int = 1600, sample_rate: int = 16000
) -> bytes:
    """A REAL WAV clip (PCM16 mono) with seed-derived samples — the
    deterministic fixture for the genuine audio decode path."""
    rng = np.random.default_rng(seed * 104729 + 11)
    x = rng.integers(-32768, 32768, size=n_samples, dtype=np.int16)
    return encode_wav(sample_rate, x)


def attach_wav_media(df: DataFrame, id_col: str) -> DataFrame:
    """Derive a deterministic REAL-WAV media column from an id column
    (same plumbing as attach_fake_audio, genuine codec underneath)."""

    @F.pandas_udf(T.BinaryType())
    def _mk(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: wav_audio_bytes(int(i)))

    return df.withColumn("media", _mk(F.col(id_col)))


def y4m_video_bytes(
    seed: int, width: int = 8, height: int = 6, n_frames: int = 12
) -> bytes:
    """A REAL y4m clip (C420jpeg planar YUV) with seed-derived planes —
    the deterministic fixture for the genuine video decode/seek path."""
    rng = np.random.default_rng(seed * 7907 + 3)
    y = rng.integers(0, 256, size=(n_frames, height, width), dtype=np.uint8)
    u = rng.integers(
        0, 256, size=(n_frames, height // 2, width // 2), dtype=np.uint8
    )
    v = rng.integers(
        0, 256, size=(n_frames, height // 2, width // 2), dtype=np.uint8
    )
    return encode_y4m(y, u, v)


def attach_y4m_media(df: DataFrame, id_col: str) -> DataFrame:
    """Derive a deterministic REAL-y4m media column from an id column."""

    @F.pandas_udf(T.BinaryType())
    def _mk(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: y4m_video_bytes(int(i)))

    return df.withColumn("media", _mk(F.col(id_col)))


def attach_fake_video(df: DataFrame, id_col: str) -> DataFrame:
    @F.pandas_udf(T.BinaryType())
    def _mk(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: fake_video_bytes(int(i)))

    return df.withColumn("media", _mk(F.col(id_col)))


def attach_fake_audio(df: DataFrame, id_col: str) -> DataFrame:
    @F.pandas_udf(T.BinaryType())
    def _mk(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: fake_audio_bytes(int(i)))

    return df.withColumn("media", _mk(F.col(id_col)))


IMAGE_FEATURE_SCHEMA = "id long, sha16 string, n_bytes long, mean_r double, mean_g double, mean_b double"


def image_features(df: DataFrame, id_col: str, media_col: str = "media") -> DataFrame:
    """Per-image features via mapInPandas (Arrow batches of binaries →
    vectorized numpy).  Pattern generalizes to resize / frame-sample /
    embedding extraction — swap the body, keep the plumbing."""
    id_c, media_c = id_col, media_col
    codecs = _registry_snapshot()  # ship runtime-registered codecs too

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, data in zip(pdf[id_c], pdf[media_c]):
                img = _decode(codecs, "image", bytes(data))
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


# ---------------------------------------------------------------------------
# resize / frame-sample / audio features — same plumbing, different kernels
# ---------------------------------------------------------------------------


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure integer index math (deterministic across
    platforms — no interpolation rounding to disagree about)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return img[ys][:, xs]


RESIZE_SCHEMA = (
    "id long, width int, height int, sha16 string, "
    "mean_r double, mean_g double, mean_b double"
)


def image_resize(
    df: DataFrame, id_col: str, out_w: int, out_h: int, media_col: str = "media"
) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode; emits the resized
    image's identity (sha16 of the re-encoded bytes) + channel means.  One
    Arrow batch of binaries per Python call; swap the kernel for a real
    resampler in production, the plumbing stays."""
    id_c, media_c = id_col, media_col
    codecs = _registry_snapshot()

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, data in zip(pdf[id_c], pdf[media_c]):
                img = resize_nearest(
                    _decode(codecs, "image", bytes(data)), out_w, out_h
                )
                reenc = (
                    FAKE_MAGIC
                    + struct.pack("<HH", out_w, out_h)
                    + img.tobytes()
                )
                rows.append(
                    {
                        "id": int(i),
                        "width": out_w,
                        "height": out_h,
                        "sha16": hashlib.sha256(reenc).hexdigest()[:16],
                        "mean_r": float(img[:, :, 0].mean()),
                        "mean_g": float(img[:, :, 1].mean()),
                        "mean_b": float(img[:, :, 2].mean()),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["id", "width", "height", "sha16", "mean_r", "mean_g", "mean_b"],
            )

    return df.select(id_c, media_c).mapInPandas(_resize, RESIZE_SCHEMA)


FRAME_SAMPLE_SCHEMA = "id long, frame_idx int, mean_luma double"


def video_frame_sample(
    df: DataFrame, id_col: str, every_k: int = 4, media_col: str = "media"
) -> DataFrame:
    """Sample every k-th frame and emit one row per sampled frame with its
    BT.601 luma mean — the fan-out (one binary → many frame rows) shape a
    real frame-dedup / shot-detect pipeline needs.  Containers with a
    registered frame SAMPLER (y4m: fixed frame stride) are sampled by
    offset arithmetic — the skipped frames' bytes are never copied or
    color-converted; other formats fall back to full decode + stride,
    bit-identical output either way (tested)."""
    id_c, media_c = id_col, media_col
    codecs = _registry_snapshot()
    samplers = dict(_FRAME_SAMPLERS)

    def _frames(data: bytes):
        for magic, fn in samplers.items():
            if data[: len(magic)] == magic:
                for fidx, fr in fn(data, every_k):
                    yield fidx, fr.astype(np.float64)
                return
        vid = _decode(codecs, "video", data).astype(np.float64)
        for fidx in range(0, vid.shape[0], every_k):
            yield fidx, vid[fidx]

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, data in zip(pdf[id_c], pdf[media_c]):
                for fidx, fr in _frames(bytes(data)):
                    luma = (
                        0.299 * fr[:, :, 0] + 0.587 * fr[:, :, 1] + 0.114 * fr[:, :, 2]
                    )
                    rows.append(
                        {
                            "id": int(i),
                            "frame_idx": int(fidx),
                            "mean_luma": float(luma.mean()),
                        }
                    )
            yield pd.DataFrame(rows, columns=["id", "frame_idx", "mean_luma"])

    return df.select(id_c, media_c).mapInPandas(_sample, FRAME_SAMPLE_SCHEMA)


AUDIO_FEATURE_SCHEMA = (
    "id long, sample_rate int, n_samples int, duration_s double, rms double, peak int"
)


def audio_features(df: DataFrame, id_col: str, media_col: str = "media") -> DataFrame:
    """Per-clip audio features (rate, length, RMS, peak) — the audio leg of
    the binary-column pipeline."""
    id_c, media_c = id_col, media_col
    codecs = _registry_snapshot()

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, data in zip(pdf[id_c], pdf[media_c]):
                rate, samples = _decode(codecs, "audio", bytes(data))
                x = samples.astype(np.float64)
                # a zero-frame clip is spec-legal WAV: decode succeeds,
                # features are the empty-signal fixpoints (NOT a numpy
                # reduction error killing the whole Spark task)
                empty = len(samples) == 0
                rows.append(
                    {
                        "id": int(i),
                        "sample_rate": int(rate),
                        "n_samples": int(len(samples)),
                        "duration_s": float(len(samples) / rate),
                        "rms": 0.0 if empty else float(np.sqrt(np.mean(x * x))),
                        "peak": 0 if empty else int(np.max(np.abs(x))),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id",
                    "sample_rate",
                    "n_samples",
                    "duration_s",
                    "rms",
                    "peak",
                ],
            )

    return df.select(id_c, media_c).mapInPandas(_extract, AUDIO_FEATURE_SCHEMA)
