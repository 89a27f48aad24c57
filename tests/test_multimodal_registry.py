"""Codec registry for the multimodal pipelines: the production swap
(register a real PNG/ffmpeg decoder) must be pure data — a register_codec
call — with every Spark kernel routing through the registry, including
decoders registered at RUNTIME (the kernels snapshot the registry into
their closures, because executor processes import the module fresh and
would otherwise miss driver-side registrations)."""

import struct

import numpy as np
import pytest

from pyspark.sql import functions as F

from chainweb_data_spark.operators import multimodal as mm

ALT_MAGIC = b"FKE2"  # an alternate format: FKE2 | w | h | single gray byte


def alt_image_bytes(seed: int, width: int = 4, height: int = 4) -> bytes:
    return ALT_MAGIC + struct.pack("<HH", width, height) + bytes([seed % 256])


def decode_alt(data: bytes) -> np.ndarray:
    w, h = struct.unpack("<HH", data[4:8])
    return np.full((h, w, 3), data[8], dtype=np.uint8)


@pytest.fixture
def alt_codec():
    mm.register_codec("image", ALT_MAGIC, decode_alt)
    yield
    mm.unregister_codec("image", ALT_MAGIC)


def test_unknown_magic_raises_stub_boundary():
    with pytest.raises(NotImplementedError, match="register_codec"):
        mm.decode_image(b"\x89PNG----")


def test_runtime_registration_and_removal(alt_codec):
    img = mm.decode_image(alt_image_bytes(7))
    assert img.shape == (4, 4, 3) and img[0, 0, 0] == 7
    mm.unregister_codec("image", ALT_MAGIC)
    with pytest.raises(NotImplementedError):
        mm.decode_image(alt_image_bytes(7))
    mm.register_codec("image", ALT_MAGIC, decode_alt)  # fixture cleanup runs


def test_builtin_fakes_still_decode():
    """Routing the fakes through the registry must not change their
    output (the multimodal oracle hashes depend on it)."""
    img = mm.decode_image(mm.fake_image_bytes(3))
    assert img.shape == (8, 8, 3)
    vid = mm.decode_video(mm.fake_video_bytes(3))
    assert vid.shape == (12, 6, 8, 3)
    rate, samples = mm.decode_audio(mm.fake_audio_bytes(3))
    assert rate == 16000 and len(samples) == 1600


def test_alternate_format_flows_through_spark_kernel(spark, alt_codec):
    """An alternate format registered at runtime must work through the
    distributed mapInPandas path — same plumbing, zero code edits."""

    @F.pandas_udf("binary")
    def _mk(ids):
        return ids.map(lambda i: alt_image_bytes(int(i)))

    df = spark.range(0, 50).select(F.col("id"), _mk(F.col("id")).alias("media"))
    out = mm.image_features(df, "id").orderBy("id")
    rows = out.collect()
    assert len(rows) == 50
    for r in rows:
        # constant-gray alt image: all three channel means equal the seed
        assert r["mean_r"] == r["mean_g"] == r["mean_b"] == float(r["id"])
        assert r["n_bytes"] == 9


def test_mixed_formats_in_one_batch(spark, alt_codec):
    """Formats are sniffed per payload, so one column can mix them."""

    @F.pandas_udf("binary")
    def _mk(ids):
        return ids.map(
            lambda i: alt_image_bytes(int(i))
            if i % 2
            else mm.fake_image_bytes(int(i))
        )

    df = spark.range(0, 20).select(F.col("id"), _mk(F.col("id")).alias("media"))
    rows = mm.image_features(df, "id").orderBy("id").collect()
    assert len(rows) == 20
    for r in rows:
        if r["id"] % 2:
            assert r["mean_r"] == float(r["id"])  # alt gray
        else:
            assert r["n_bytes"] == 8 + 8 * 8 * 3  # fake-rgb8 payload
