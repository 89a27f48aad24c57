"""Pure-stdlib YUV4MPEG2 (.y4m) video codec for the multimodal pipeline.

The third leg of the PNG/WAV move: a REAL video container decodable from
public knowledge with zero third-party code.  YUV4MPEG2 is the
uncompressed interchange format of the mjpegtools/ffmpeg ecosystem — an
ASCII header line (``YUV4MPEG2 W<w> H<h> F<n>:<d> ... C<colorspace>``)
followed by ``FRAME``-delimited planar YUV payloads of FIXED size.  That
fixed frame stride is what makes it the honest scale story for video
sampling: selecting every k-th frame is pointer arithmetic over the
binary, so :func:`y4m_sample_frames` materializes and color-converts ONLY
the sampled frames — the skipped ones are never copied, never converted.

Supported profile: colorspaces C420 / C420jpeg / C420mpeg2 / C420paldv
(identical plane layout; they differ only in chroma siting, which does
not move bytes), C444 and Cmono, 8-bit, progressive.  Everything else —
interlaced flags other than ``Ip``, 16-bit ``p`` variants, C411, XYSCSS
contradictions, truncated frames — is REFUSED loudly rather than
mis-decoded, the same contract as ``operators/png.py`` / ``wav.py``.

RGB conversion is BT.601 limited-range (the format's broadcast lineage;
documented so features computed here are reproducible), vectorized over
whole planes.  The encoder writes C444/Cmono/C420 from planar arrays so
tests and gated queries build REAL y4m bytes deterministically and
``decode(encode(x))`` is exact on the YUV path.

At scale this runs as the kernel inside ``mapInPandas``
(``multimodal.video_frame_sample``) — one Arrow batch of binaries per
Python call.
"""

from __future__ import annotations

import numpy as np

Y4M_MAGIC = b"YUV4MPEG2"

#: colorspace -> (chroma subsample x, y); plane bytes follow from it
_SUBSAMPLE = {
    "C420": (2, 2),
    "C420jpeg": (2, 2),
    "C420mpeg2": (2, 2),
    "C420paldv": (2, 2),
    "C444": (1, 1),
    "Cmono": None,
}


class Y4mFormatError(ValueError):
    """Malformed, truncated, or unsupported-profile y4m bytes — never
    silently mis-decoded."""


def parse_y4m_header(data: bytes) -> dict:
    """Parse the stream header: ``{width, height, fps_num, fps_den,
    colorspace, header_len, frame_bytes}``.  Refuses missing W/H, odd
    dimensions under 4:2:0 subsampling, interlaced content, and unknown
    colorspaces."""
    if data[: len(Y4M_MAGIC)] != Y4M_MAGIC:
        raise Y4mFormatError("not a y4m stream: bad signature")
    nl = data.find(b"\n")
    if nl < 0:
        raise Y4mFormatError("unterminated stream header")
    w = h = None
    fps_num, fps_den = 0, 0
    colorspace = "C420jpeg"  # the spec's default when C is absent
    for tok in data[len(Y4M_MAGIC) : nl].split(b" "):
        if not tok:
            continue
        tag, val = chr(tok[0]), tok[1:].decode("ascii", "replace")
        if tag == "W":
            w = int(val)
        elif tag == "H":
            h = int(val)
        elif tag == "F":
            num, _, den = val.partition(":")
            fps_num, fps_den = int(num), int(den or "1")
        elif tag == "I":
            # "I?" (unknown) is refused too: interlaced content tagged
            # unknown would silently decode as combed progressive frames,
            # corrupting every luma feature downstream — the contract is
            # refuse-never-misdecode, and unknown is not progressive
            if val != "p":
                raise Y4mFormatError(
                    f"interlaced or unknown-interlacing content (I{val}) "
                    "unsupported"
                )
        elif tag == "C":
            colorspace = "C" + val
        elif tag in ("A", "X"):
            continue  # aspect ratio / comments: no effect on bytes
        else:
            raise Y4mFormatError(f"unknown stream-header tag {tag!r}")
    if w is None or h is None:
        raise Y4mFormatError("stream header missing W or H")
    if w <= 0 or h <= 0:
        # a negative dimension would make frame_bytes negative and walk
        # the frame scan BACKWARD forever — refuse, never hang
        raise Y4mFormatError(f"non-positive dimensions {w}x{h}")
    sub = _SUBSAMPLE.get(colorspace, "missing")
    if sub == "missing":
        raise Y4mFormatError(
            f"unsupported colorspace {colorspace} (C420*/C444/Cmono only)"
        )
    if sub is None:
        frame_bytes = w * h
    else:
        sx, sy = sub
        if w % sx or h % sy:
            raise Y4mFormatError(
                f"{colorspace} requires dimensions divisible by "
                f"{sx}x{sy}, got {w}x{h}"
            )
        frame_bytes = w * h + 2 * (w // sx) * (h // sy)
    return {
        "width": w,
        "height": h,
        "fps_num": fps_num,
        "fps_den": fps_den,
        "colorspace": colorspace,
        "header_len": nl + 1,
        "frame_bytes": frame_bytes,
    }


def _frame_payloads(data: bytes, hdr: dict):
    """Yield ``(frame_idx, start_offset)`` for every frame WITHOUT
    touching payload bytes: read the FRAME marker line, then hop
    ``frame_bytes`` — O(1) work per frame regardless of resolution."""
    off = hdr["header_len"]
    idx = 0
    n = len(data)
    while off < n:
        if data[off : off + 5] != b"FRAME":
            raise Y4mFormatError(
                f"expected FRAME marker at offset {off}, found "
                f"{data[off : off + 5]!r}"
            )
        nl = data.find(b"\n", off + 5)
        if nl < 0:
            raise Y4mFormatError("unterminated FRAME header line")
        start = nl + 1
        if start + hdr["frame_bytes"] > n:
            raise Y4mFormatError(
                f"truncated frame {idx}: need {hdr['frame_bytes']} bytes, "
                f"have {n - start}"
            )
        yield idx, start
        off = start + hdr["frame_bytes"]
        idx += 1


def _frame_rgb(data: bytes, start: int, hdr: dict) -> np.ndarray:
    """Materialize ONE frame's H×W×3 RGB uint8 from its payload offset."""
    w, h = hdr["width"], hdr["height"]
    cs = hdr["colorspace"]
    y = np.frombuffer(data, np.uint8, w * h, start).reshape(h, w)
    if cs == "Cmono":
        return np.repeat(y[:, :, None], 3, axis=2)
    sx, sy = _SUBSAMPLE[cs]
    cw, ch = w // sx, h // sy
    u = np.frombuffer(data, np.uint8, cw * ch, start + w * h).reshape(ch, cw)
    v = np.frombuffer(
        data, np.uint8, cw * ch, start + w * h + cw * ch
    ).reshape(ch, cw)
    if sx > 1:
        u = u.repeat(sy, axis=0).repeat(sx, axis=1)
        v = v.repeat(sy, axis=0).repeat(sx, axis=1)
    # BT.601 limited range: Y in [16,235], C centered on 128 in [16,240]
    yf = (y.astype(np.float64) - 16.0) * (255.0 / 219.0)
    uf = (u.astype(np.float64) - 128.0) * (255.0 / 224.0)
    vf = (v.astype(np.float64) - 128.0) * (255.0 / 224.0)
    rgb = np.stack(
        [
            yf + 1.402 * vf,
            yf - 0.344136 * uf - 0.714136 * vf,
            yf + 1.772 * uf,
        ],
        axis=2,
    )
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def decode_y4m(data: bytes) -> np.ndarray:
    """y4m bytes → (n_frames, H, W, 3) uint8 RGB — the ``decode_video``
    registry contract."""
    hdr = parse_y4m_header(data)
    frames = [_frame_rgb(data, s, hdr) for _i, s in _frame_payloads(data, hdr)]
    if not frames:
        raise Y4mFormatError("stream contains no frames")
    return np.stack(frames)


def y4m_sample_frames(
    data: bytes, every_k: int
) -> list[tuple[int, np.ndarray]]:
    """``[(frame_idx, H×W×3 RGB)]`` for every k-th frame, materializing
    ONLY those frames — the skipped ones cost a marker check and an
    offset hop, no copy and no color conversion.  Bit-identical to
    ``decode_y4m(data)[::k]`` (tested), cheaper by the sampling factor."""
    if every_k < 1:
        raise ValueError("every_k must be >= 1")
    hdr = parse_y4m_header(data)
    out = []
    for idx, start in _frame_payloads(data, hdr):
        if idx % every_k == 0:
            out.append((idx, _frame_rgb(data, start, hdr)))
    if not out:
        raise Y4mFormatError("stream contains no frames")
    return out


def encode_y4m(
    y: np.ndarray,
    u: np.ndarray | None = None,
    v: np.ndarray | None = None,
    fps: tuple[int, int] = (25, 1),
    colorspace: str | None = None,
) -> bytes:
    """Planar YUV → y4m bytes.  ``y`` is (T, H, W) uint8; ``u``/``v``
    are None for Cmono, (T, H, W) for C444, or (T, H/2, W/2) for C420.
    The YUV payload round-trips exactly (RGB conversion happens only at
    decode)."""
    y = np.asarray(y)
    if y.ndim != 3 or y.dtype != np.uint8:
        raise ValueError("encode_y4m: y must be (T, H, W) uint8")
    t, h, w = y.shape
    if (u is None) != (v is None):
        raise ValueError("encode_y4m: u and v must be given together")
    if u is None:
        cs = colorspace or "Cmono"
        if cs != "Cmono":
            raise ValueError(f"no chroma planes given for {cs}")
        planes = [y]
    else:
        u, v = np.asarray(u), np.asarray(v)
        if u.shape != v.shape or u.dtype != np.uint8 or v.dtype != np.uint8:
            raise ValueError("encode_y4m: u/v must match and be uint8")
        if u.shape == (t, h, w):
            inferred = "C444"
        elif u.shape == (t, h // 2, w // 2) and h % 2 == 0 and w % 2 == 0:
            inferred = "C420jpeg"
        else:
            raise ValueError(
                f"encode_y4m: chroma shape {u.shape} fits neither C444 "
                f"nor C420 for {t}x{h}x{w} luma"
            )
        cs = colorspace or inferred
        if cs not in _SUBSAMPLE:
            raise ValueError(
                f"encode_y4m: unsupported colorspace {cs} "
                "(C420*/C444/Cmono only)"
            )
        # an explicit colorspace must AGREE with the plane shapes — a
        # header that contradicts its payload is a stream that can never
        # decode, and the failure would surface as a baffling FRAME-marker
        # error far from the bug
        if _SUBSAMPLE[cs] != _SUBSAMPLE[inferred]:
            raise ValueError(
                f"encode_y4m: colorspace {cs} disagrees with chroma shape "
                f"{u.shape} (inferred {inferred})"
            )
        planes = [y, u, v]
    head = (
        f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 "
        f"{cs}\n".encode()
    )
    body = bytearray(head)
    for i in range(t):
        body += b"FRAME\n"
        for p in planes:
            body += p[i].tobytes()
    return bytes(body)
