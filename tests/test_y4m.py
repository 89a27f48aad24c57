"""Pure-stdlib YUV4MPEG2 codec (operators/y4m.py): YUV round-trips,
hand-computed BT.601 conversion vectors, seek-sampling equivalence with
the full decode, refusal of malformed/unsupported streams, and the
registry + frame-sampler integration in the multimodal pipeline."""

import numpy as np
import pytest

from chainweb_data_spark.operators.y4m import (
    Y4mFormatError,
    decode_y4m,
    encode_y4m,
    parse_y4m_header,
    y4m_sample_frames,
)


def _rand_clip(seed, t=6, h=4, w=4, mode="C420"):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 256, size=(t, h, w), dtype=np.uint8)
    if mode == "Cmono":
        return encode_y4m(y)
    if mode == "C444":
        u = rng.integers(0, 256, size=(t, h, w), dtype=np.uint8)
        v = rng.integers(0, 256, size=(t, h, w), dtype=np.uint8)
        return encode_y4m(y, u, v)
    u = rng.integers(0, 256, size=(t, h // 2, w // 2), dtype=np.uint8)
    v = rng.integers(0, 256, size=(t, h // 2, w // 2), dtype=np.uint8)
    return encode_y4m(y, u, v, colorspace="C420jpeg")


def test_header_parse_and_frame_geometry():
    data = _rand_clip(1, t=3, h=4, w=6)
    hdr = parse_y4m_header(data)
    assert (hdr["width"], hdr["height"]) == (6, 4)
    assert hdr["colorspace"] == "C420jpeg"
    assert hdr["frame_bytes"] == 6 * 4 + 2 * 3 * 2
    out = decode_y4m(data)
    assert out.shape == (3, 4, 6, 3) and out.dtype == np.uint8


def test_mono_roundtrip_exact():
    rng = np.random.default_rng(2)
    y = rng.integers(0, 256, size=(5, 3, 4), dtype=np.uint8)
    out = decode_y4m(encode_y4m(y))
    # mono decode replicates Y into RGB — all three channels equal Y
    for c in range(3):
        assert (out[:, :, :, c] == y).all()


def test_bt601_conversion_hand_vector():
    # one 2x2 C444 frame, all-identical pixels: Y=81, U=90, V=240 is the
    # textbook limited-range red (≈ 255,0,0 after BT.601 inversion)
    y = np.full((1, 2, 2), 81, dtype=np.uint8)
    u = np.full((1, 2, 2), 90, dtype=np.uint8)
    v = np.full((1, 2, 2), 240, dtype=np.uint8)
    out = decode_y4m(encode_y4m(y, u, v))
    px = out[0, 0, 0].astype(int)
    assert abs(px[0] - 255) <= 2 and px[1] <= 3 and px[2] <= 3
    # grey point: Y=126, U=V=128 → R=G=B exactly (chroma terms vanish)
    y = np.full((1, 2, 2), 126, dtype=np.uint8)
    n = np.full((1, 2, 2), 128, dtype=np.uint8)
    out = decode_y4m(encode_y4m(y, n, n))
    assert (out[0, :, :, 0] == out[0, :, :, 1]).all()
    assert (out[0, :, :, 1] == out[0, :, :, 2]).all()


def test_chroma_upsampling_is_nearest():
    # C420 with distinct chroma per 2x2 block: each block's 4 pixels must
    # share the block's U/V after nearest upsampling
    y = np.full((1, 2, 4), 128, dtype=np.uint8)
    u = np.array([[[64, 192]]], dtype=np.uint8)
    v = np.array([[[128, 128]]], dtype=np.uint8)
    out = decode_y4m(encode_y4m(y, u, v, colorspace="C420jpeg"))
    left, right = out[0, :, :2], out[0, :, 2:]
    assert (left == left[0, 0]).all() and (right == right[0, 0]).all()
    assert not (left[0, 0] == right[0, 0]).all()


def test_seek_sampling_equals_full_decode():
    for mode in ("C420", "C444", "Cmono"):
        data = _rand_clip(7, t=10, h=4, w=4, mode=mode)
        full = decode_y4m(data)
        for k in (1, 3, 4):
            sampled = y4m_sample_frames(data, k)
            assert [i for i, _ in sampled] == list(range(0, 10, k))
            for i, fr in sampled:
                assert (fr == full[i]).all()


def test_refusals_never_misdecode():
    with pytest.raises(Y4mFormatError, match="signature"):
        decode_y4m(b"NOTY4M anything")
    good = _rand_clip(3, t=2, h=4, w=4)
    with pytest.raises(Y4mFormatError, match="truncated frame"):
        decode_y4m(good[:-5])
    # corrupt a FRAME marker
    idx = good.find(b"FRAME")
    with pytest.raises(Y4mFormatError, match="FRAME marker"):
        decode_y4m(good[:idx] + b"FARME" + good[idx + 5 :])
    with pytest.raises(Y4mFormatError, match="interlaced"):
        parse_y4m_header(b"YUV4MPEG2 W4 H4 F25:1 It C420jpeg\n")
    # unknown interlacing ("I?") must refuse too, not decode as progressive
    with pytest.raises(Y4mFormatError, match="unknown-interlacing"):
        parse_y4m_header(b"YUV4MPEG2 W4 H4 F25:1 I? C420jpeg\n")
    with pytest.raises(Y4mFormatError, match="colorspace"):
        parse_y4m_header(b"YUV4MPEG2 W4 H4 F25:1 C411\n")
    with pytest.raises(Y4mFormatError, match="divisible"):
        parse_y4m_header(b"YUV4MPEG2 W5 H4 F25:1 C420jpeg\n")
    with pytest.raises(Y4mFormatError, match="missing W or H"):
        parse_y4m_header(b"YUV4MPEG2 F25:1 C420jpeg\n")


def test_registry_routes_y4m_through_decode_video():
    from chainweb_data_spark.operators import multimodal as mm

    data = mm.y4m_video_bytes(4)
    vid = mm.decode_video(data)
    assert vid.shape == (12, 6, 8, 3) and vid.dtype == np.uint8


def test_frame_sample_uses_seek_path_and_matches_fallback(spark):
    """video_frame_sample over y4m media must produce exactly the rows the
    full-decode fallback would — and must go through the seek sampler
    (asserted by poisoning the full decoder for y4m payloads)."""
    from chainweb_data_spark.operators import multimodal as mm

    df = spark.range(3).withColumnRenamed("id", "doc_id")
    media = mm.attach_y4m_media(df, "doc_id")
    rows = sorted(
        (r["id"], r["frame_idx"], round(r["mean_luma"], 9))
        for r in mm.video_frame_sample(media, "doc_id", every_k=4).collect()
    )
    # expected via full decode + stride (the fallback semantics)
    exp = []
    for i in range(3):
        vid = mm.decode_video(mm.y4m_video_bytes(i)).astype(np.float64)
        for fidx in range(0, vid.shape[0], 4):
            fr = vid[fidx]
            luma = 0.299 * fr[:, :, 0] + 0.587 * fr[:, :, 1] + 0.114 * fr[:, :, 2]
            exp.append((i, fidx, round(float(luma.mean()), 9)))
    assert rows == sorted(exp)

    # poison the codec-registry decoder for video: the seek path must
    # keep the pipeline working without ever calling it
    def _boom(data):
        raise AssertionError("full decode called despite seek sampler")

    mm.register_codec("video", mm.Y4M_MAGIC, _boom)
    try:
        n = mm.video_frame_sample(media, "doc_id", every_k=4).count()
        assert n == 3 * 3  # 12 frames, every 4th
    finally:
        mm.register_codec("video", mm.Y4M_MAGIC, mm.decode_y4m)


def test_negative_dimensions_refused_never_hang():
    """r9 review find: a negative W made frame_bytes negative and walked
    the frame scan backward forever — must refuse at header parse."""
    with pytest.raises(Y4mFormatError, match="non-positive"):
        parse_y4m_header(b"YUV4MPEG2 W-6 H1 F25:1 Ip Cmono\nFRAME\n")
    with pytest.raises(Y4mFormatError, match="non-positive"):
        parse_y4m_header(b"YUV4MPEG2 W4 H0 F25:1 C444\n")


def test_encoder_refuses_contradictory_colorspace():
    """r9 review find: an explicit colorspace that disagrees with the
    chroma plane shapes would write a header contradicting its payload —
    a stream that can never decode.  Refuse at encode time."""
    y = np.zeros((1, 4, 4), dtype=np.uint8)
    full = np.zeros((1, 4, 4), dtype=np.uint8)
    quarter = np.zeros((1, 2, 2), dtype=np.uint8)
    with pytest.raises(ValueError, match="disagrees"):
        encode_y4m(y, full, full, colorspace="C420jpeg")
    with pytest.raises(ValueError, match="disagrees"):
        encode_y4m(y, quarter, quarter, colorspace="C444")
    # same-layout siting variant stays legal
    out = decode_y4m(encode_y4m(y, quarter, quarter, colorspace="C420mpeg2"))
    assert out.shape == (1, 4, 4, 3)
