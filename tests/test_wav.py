"""Pure-stdlib WAV codec (operators/wav.py): round-trips against the
stdlib ``wave`` module as an independent oracle, hand-built headers,
tamper/truncation refusal, unsupported-profile refusal, and the registry
integration that makes real WAV bytes flow through the multimodal
mapInPandas pipeline."""

import io
import struct
import wave

import numpy as np
import pytest

from chainweb_data_spark.operators.wav import (
    WavFormatError,
    decode_wav,
    encode_wav,
)


def test_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(11)
    mono = rng.integers(-32768, 32768, size=500, dtype=np.int16)
    rate, out = decode_wav(encode_wav(8000, mono))
    assert rate == 8000 and out.shape == (500,)
    assert (out == mono).all()
    stereo = rng.integers(-32768, 32768, size=(300, 2), dtype=np.int16)
    rate, out = decode_wav(encode_wav(44100, stereo))
    assert rate == 44100 and out.shape == (300, 2)
    assert (out == stereo).all()


def test_against_stdlib_wave_oracle():
    """Bytes written by the INDEPENDENT stdlib wave module must decode
    identically, and our encoder's bytes must read back through it."""
    rng = np.random.default_rng(13)
    x = rng.integers(-32768, 32768, size=400, dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(x.tobytes())
    rate, out = decode_wav(buf.getvalue())
    assert rate == 16000
    assert (out == x).all()

    with wave.open(io.BytesIO(encode_wav(22050, x)), "rb") as r:
        assert r.getframerate() == 22050
        assert r.getnchannels() == 1
        assert r.getsampwidth() == 2
        back = np.frombuffer(r.readframes(r.getnframes()), dtype="<i2")
    assert (back == x).all()


def test_8bit_unsigned_centered():
    # hand-built 8-bit mono file: samples 0, 128, 255 map to centered
    # int16 (-32768, 0, 32512 after <<8)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    pcm = bytes([0, 128, 255])
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
        + b"\x00"
    )
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, out = decode_wav(data)
    assert rate == 8000
    assert list(out) == [-32768, 0, 32512]


def test_refusals_never_misdecode():
    x = np.zeros(10, dtype=np.int16)
    good = encode_wav(8000, x)
    with pytest.raises(WavFormatError, match="signature"):
        decode_wav(b"JUNK" + good[4:])
    with pytest.raises(WavFormatError, match="WAVE"):
        decode_wav(good[:8] + b"AVI " + good[12:])
    with pytest.raises(WavFormatError, match="overruns"):
        decode_wav(good[:-4])
    # truncated chunk body behind a consistent RIFF size
    fmt16 = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    short = b"WAVE" + b"fmt " + struct.pack("<I", 64) + fmt16
    with pytest.raises(WavFormatError, match="truncated"):
        decode_wav(b"RIFF" + struct.pack("<I", len(short)) + short)
    # float PCM refused (format tag 3)
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 4) + b"\0\0\0\0"
    )
    with pytest.raises(WavFormatError, match="format tag"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    # self-contradictory block_align refused
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 4, 16)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 4) + b"\0\0\0\0"
    )
    with pytest.raises(WavFormatError, match="inconsistent"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    # partial frame refused
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 6) + b"\0" * 6
    )
    with pytest.raises(WavFormatError, match="whole number"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_registry_routes_wav_through_decode_audio():
    from chainweb_data_spark.operators import multimodal as mm

    data = mm.wav_audio_bytes(5)
    rate, samples = mm.decode_audio(data)
    assert rate == 16000
    assert samples.dtype == np.int16 and len(samples) == 1600


def test_wav_features_end_to_end(spark):
    from chainweb_data_spark.operators import multimodal as mm

    df = spark.range(4).withColumnRenamed("id", "doc_id")
    feats = mm.audio_features(
        mm.attach_wav_media(df, "doc_id"), "doc_id"
    ).orderBy("id")
    rows = feats.collect()
    assert len(rows) == 4
    for r in rows:
        rate, x = mm.decode_audio(mm.wav_audio_bytes(r["id"]))
        xf = x.astype(np.float64)
        assert r["sample_rate"] == rate
        assert r["n_samples"] == len(x)
        assert r["rms"] == pytest.approx(float(np.sqrt(np.mean(xf * xf))))
        assert r["peak"] == int(np.max(np.abs(xf)))


def test_zero_frame_clip_features_are_fixpoints(spark):
    """r9 review find: a zero-frame WAV is spec-legal; audio_features
    must emit the empty-signal fixpoints (rms 0.0, peak 0) instead of a
    numpy reduction error killing the Spark task."""
    from chainweb_data_spark.operators import multimodal as mm

    empty = encode_wav(8000, np.zeros(0, dtype=np.int16))
    rate, x = decode_wav(empty)
    assert rate == 8000 and len(x) == 0

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    df = spark.range(1).select(
        F.col("id").alias("doc_id"),
        F.lit(bytearray(empty)).cast(T.BinaryType()).alias("media"),
    )
    row = mm.audio_features(df, "doc_id").collect()[0]
    assert row["n_samples"] == 0
    assert row["duration_s"] == 0.0
    assert row["rms"] == 0.0 and row["peak"] == 0
