"""Pure-stdlib PNG codec (operators/png.py): hand-computed filter
vectors for all five scanline filters, round-trips for every supported
color type, tamper/truncation refusal, and unsupported-profile refusal —
plus the registry integration that makes real PNG bytes flow through the
multimodal mapInPandas pipeline."""

import struct
import zlib

import numpy as np
import pytest

from chainweb_data_spark.operators.png import (
    PNG_MAGIC,
    PngFormatError,
    _chunk,
    decode_png,
    encode_png,
)


def _png(ihdr_fields, raw, extra=b""):
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", *ihdr_fields))
        + extra
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def test_roundtrip_all_color_types():
    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    assert (decode_png(encode_png(rgb)) == rgb).all()
    rgba = rng.integers(0, 256, size=(3, 4, 4), dtype=np.uint8)
    assert (decode_png(encode_png(rgba)) == rgba).all()
    gray = rng.integers(0, 256, size=(4, 4), dtype=np.uint8)
    out = decode_png(encode_png(gray))
    assert out.shape == (4, 4, 3)
    assert all((out[:, :, c] == gray).all() for c in range(3))
    ga = rng.integers(0, 256, size=(2, 3, 2), dtype=np.uint8)
    out = decode_png(encode_png(ga))
    assert out.shape == (2, 3, 4)
    assert (out[:, :, 0] == ga[:, :, 0]).all()
    assert (out[:, :, 3] == ga[:, :, 1]).all()


def test_sub_and_up_filters_hand_vectors():
    # 2x2 RGB.  Row 0 Sub-filtered: first pixel raw, second stores the
    # delta; row 1 Up-filtered: stores the delta against row 0's
    # reconstruction.  Expected pixels computed by hand from the spec.
    raw = bytes([1, 10, 20, 30, 30, 30, 30]) + bytes([2, 1, 2, 3, 4, 5, 6])
    out = decode_png(_png((2, 2, 8, 2, 0, 0, 0), raw))
    exp = np.array(
        [[[10, 20, 30], [40, 50, 60]], [[11, 22, 33], [44, 55, 66]]],
        dtype=np.uint8,
    )
    assert (out == exp).all()


def test_average_and_paeth_filters_hand_vectors():
    # 2x2 gray.  Row 0 Average: x0 = 5 + ((0+0)>>1) = 5,
    # x1 = 10 + ((5+0)>>1) = 12.  Row 1 Paeth: x0 predictor is up (5) →
    # 6; x1 has a=6, b=12, c=5 → p=13 picks b → 14.
    raw = bytes([3, 5, 10]) + bytes([4, 1, 2])
    out = decode_png(_png((2, 2, 8, 0, 0, 0, 0), raw))
    assert (out[:, :, 0] == np.array([[5, 12], [6, 14]], dtype=np.uint8)).all()


def test_palette_expansion():
    plte = _chunk(b"PLTE", bytes([255, 0, 0, 0, 255, 0]))
    raw = bytes([0, 0, 1]) + bytes([0, 1, 0])
    out = decode_png(_png((2, 2, 8, 3, 0, 0, 0), raw, extra=plte))
    assert (out[0, 0] == [255, 0, 0]).all()
    assert (out[0, 1] == [0, 255, 0]).all()
    assert (out[1, 0] == [0, 255, 0]).all()


def test_corruption_refused_never_misdecoded():
    good = encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    flipped = bytearray(good)
    flipped[40] ^= 1
    with pytest.raises(PngFormatError):
        decode_png(bytes(flipped))
    with pytest.raises(PngFormatError):
        decode_png(good[:-6])
    with pytest.raises(PngFormatError):
        decode_png(b"\x89PNO" + good[4:])


def test_unsupported_profiles_refused():
    with pytest.raises(PngFormatError, match="bit depth"):
        decode_png(_png((2, 2, 16, 2, 0, 0, 0), b""))
    with pytest.raises(PngFormatError, match="interlacing"):
        decode_png(_png((2, 2, 8, 2, 0, 0, 1), b""))
    with pytest.raises(PngFormatError, match="color type"):
        decode_png(_png((2, 2, 8, 5, 0, 0, 0), b""))
    # wrong decompressed length (truncated scanlines) refuses too
    with pytest.raises(PngFormatError, match="length"):
        decode_png(_png((4, 4, 8, 2, 0, 0, 0), bytes(5)))


def test_registry_routes_png_through_decode_image():
    from chainweb_data_spark.operators.multimodal import (
        decode_image,
        png_image_bytes,
    )

    data = png_image_bytes(3)
    img = decode_image(data)  # dispatches on the \x89PNG magic
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8
    rng = np.random.default_rng(3 * 31337 + 5)
    assert (img == rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)).all()


def test_png_features_end_to_end(spark):
    from pyspark.sql import functions as F

    from chainweb_data_spark.operators.multimodal import (
        attach_png_media,
        decode_png,
        image_features,
        png_image_bytes,
    )

    docs = spark.range(0, 12).select(F.col("id").alias("doc_id"))
    feats = image_features(attach_png_media(docs, "doc_id"), "doc_id")
    rows = {r["id"]: r for r in feats.collect()}
    assert len(rows) == 12
    for i in (0, 5, 11):
        img = decode_png(png_image_bytes(i))
        assert rows[i]["mean_r"] == float(img[:, :, 0].mean())
        assert rows[i]["n_bytes"] == len(png_image_bytes(i))


def test_trns_palette_applied_as_rgba():
    # palette of 3 entries; tRNS covers the first two (0, 128) — the
    # third is padded opaque per the spec's short-table rule
    plte = _chunk(b"PLTE", bytes([255, 0, 0, 0, 255, 0, 0, 0, 255]))
    trns = _chunk(b"tRNS", bytes([0, 128]))
    raw = bytes([0, 0, 1]) + bytes([0, 2, 2])
    out = decode_png(_png((2, 2, 8, 3, 0, 0, 0), raw, extra=plte + trns))
    assert out.shape == (2, 2, 4)
    assert (out[0, 0] == [255, 0, 0, 0]).all()
    assert (out[0, 1] == [0, 255, 0, 128]).all()
    assert (out[1, 0] == [0, 0, 255, 255]).all()


def test_trns_gray_and_rgb_key_color():
    # gray: key level 10 becomes alpha 0, everything else opaque
    raw = bytes([0, 10, 20])
    trns = _chunk(b"tRNS", struct.pack(">H", 10))
    out = decode_png(_png((2, 1, 8, 0, 0, 0, 0), raw, extra=trns))
    assert out.shape == (1, 2, 4)
    assert (out[0, 0] == [10, 10, 10, 0]).all()
    assert (out[0, 1] == [20, 20, 20, 255]).all()
    # RGB: only an exact 3-sample match keys out
    raw = bytes([0, 1, 2, 3, 1, 2, 4])
    trns = _chunk(b"tRNS", struct.pack(">HHH", 1, 2, 3))
    out = decode_png(_png((2, 1, 8, 2, 0, 0, 0), raw, extra=trns))
    assert (out[0, 0] == [1, 2, 3, 0]).all()
    assert (out[0, 1] == [1, 2, 4, 255]).all()


def test_trns_invalid_forms_refused():
    # tRNS with a full alpha channel (color types 4/6) is spec-invalid
    rng = np.random.default_rng(3)
    rgba = rng.integers(0, 256, size=(2, 2, 4), dtype=np.uint8)
    good = encode_png(rgba)
    # splice a tRNS chunk before IDAT
    ihdr_end = 8 + 12 + 13
    bad = good[:ihdr_end] + _chunk(b"tRNS", b"\0\0") + good[ihdr_end:]
    with pytest.raises(PngFormatError, match="tRNS"):
        decode_png(bad)
    # wrong-length key for RGB
    raw = bytes([0, 1, 2, 3])
    bad_trns = _chunk(b"tRNS", b"\0\0")
    with pytest.raises(PngFormatError, match="tRNS"):
        decode_png(_png((1, 1, 8, 2, 0, 0, 0), raw, extra=bad_trns))
    # 16-bit key value out of range for depth 8
    raw = bytes([0, 7])
    big = _chunk(b"tRNS", struct.pack(">H", 300))
    with pytest.raises(PngFormatError, match="bit depth"):
        decode_png(_png((1, 1, 8, 0, 0, 0, 0), raw, extra=big))
    # tRNS longer than the palette
    plte = _chunk(b"PLTE", bytes([1, 2, 3]))
    t4 = _chunk(b"tRNS", bytes([0, 0, 0, 0]))
    with pytest.raises(PngFormatError, match="longer than"):
        decode_png(_png((1, 1, 8, 3, 0, 0, 0), bytes([0, 0]), extra=plte + t4))
