"""Pure-stdlib PNG codec (decode + encode) for the multimodal pipeline.

This closes the repo's last ``NotImplementedError``: the multimodal codec
registry (``operators/multimodal.py``) was a documented pluggable boundary
because the container has no image libraries — but a baseline PNG decoder
is public knowledge over stdlib ``zlib`` alone (RFC 2083 / the W3C PNG
spec): parse chunks, inflate the IDAT stream, and invert the five scanline
filters (None/Sub/Up/Average/Paeth).  The decoder below supports the
overwhelmingly-common profile — 8-bit depth, color types 0 (gray),
2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), non-interlaced — and
REFUSES anything else loudly (16-bit, sub-byte depths, Adam7) rather than
mis-decoding.  CRCs are verified: a truncated or bit-flipped chunk raises,
never returns wrong pixels — the same tamper-evidence discipline as the
shard-export manifests.

The encoder writes the same profile (filter 0 scanlines, one IDAT), which
is what lets tests and the gated query build REAL PNG bytes
deterministically without any third-party library, and makes
decode(encode(x)) == x a property test.

At scale this runs as the kernel inside ``mapInPandas`` — one Arrow batch
of binaries per Python call (``multimodal.image_features``); the registry
ships it to executors via the plan closure snapshot.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: color type -> raw channels per pixel (8-bit depth)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngFormatError(ValueError):
    """Malformed, corrupt, or truncated PNG bytes — never silently
    mis-decoded."""


def _chunks(data: bytes):
    if data[:8] != PNG_MAGIC:
        raise PngFormatError("not a PNG: bad signature")
    off = 8
    while off < len(data):
        if off + 8 > len(data):
            raise PngFormatError("truncated chunk header")
        (length,) = struct.unpack(">I", data[off : off + 4])
        ctype = data[off + 4 : off + 8]
        body = data[off + 8 : off + 8 + length]
        if len(body) != length or off + 12 + length > len(data):
            raise PngFormatError(f"truncated {ctype!r} chunk")
        (crc,) = struct.unpack(
            ">I", data[off + 8 + length : off + 12 + length]
        )
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise PngFormatError(f"CRC mismatch in {ctype!r} chunk")
        yield ctype, body
        off += 12 + length
        if ctype == b"IEND":
            return
    raise PngFormatError("missing IEND chunk")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, w: int, h: int, bpp: int) -> np.ndarray:
    """Invert the per-scanline filters.  Row-sequential by necessity (each
    row's filter references the prior reconstructed row), but vectorized
    across the row for the three filters that allow it; Sub/Paeth carry a
    per-pixel dependency so they run as a tight loop over the row's
    ``w`` pixels — still O(pixels) total."""
    stride = w * bpp
    if len(raw) != h * (1 + stride):
        raise PngFormatError(
            f"decompressed length {len(raw)} != expected {h * (1 + stride)}"
        )
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint16)
    for y in range(h):
        ftype = raw[y * (1 + stride)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (1 + stride) + 1
        ).astype(np.uint16)
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((int(left) + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (cur[x] + _paeth(a, b, c)) & 0xFF
        else:
            raise PngFormatError(f"unknown filter type {ftype} in row {y}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → H×W×C uint8 array (C = 3 for gray/palette/RGB inputs
    expanded to RGB, 4 when the source carries alpha — including via a
    ``tRNS`` transparency chunk, which is APPLIED per the spec: per-entry
    alpha for palette images, a key color mapped to alpha 0 for gray/RGB;
    tRNS alongside color types 4/6 is spec-invalid and refused).
    Supported profile: 8-bit, color types {0, 2, 3, 4, 6}, non-interlaced;
    anything else raises :class:`PngFormatError` (refuse, never
    mis-decode)."""
    ihdr = None
    palette = None
    trns = None
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = body
        elif ctype == b"IDAT":
            idat.extend(body)
    if ihdr is None:
        raise PngFormatError("missing IHDR chunk")
    w, h, depth, ctype_, comp, filt, interlace = ihdr
    if depth != 8:
        raise PngFormatError(f"unsupported bit depth {depth} (8 only)")
    if ctype_ not in _CHANNELS:
        raise PngFormatError(f"unsupported color type {ctype_}")
    if comp != 0 or filt != 0:
        raise PngFormatError("nonstandard compression/filter method")
    if interlace != 0:
        raise PngFormatError("Adam7 interlacing unsupported")
    if not idat:
        raise PngFormatError("missing IDAT chunk")
    if w == 0 or h == 0:
        raise PngFormatError("zero-dimension image")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise PngFormatError(f"IDAT inflate failed: {e}") from None
    if trns is not None and ctype_ in (4, 6):
        # the spec prohibits tRNS alongside a full alpha channel — a file
        # carrying both is malformed, so refuse rather than pick one
        raise PngFormatError(
            f"tRNS chunk is invalid for color type {ctype_}"
        )
    bpp = _CHANNELS[ctype_]
    planes = _unfilter(raw, w, h, bpp).reshape(h, w, bpp)
    if ctype_ == 2:  # RGB (tRNS: one 16-bit-per-sample key color -> alpha)
        if trns is None:
            return planes
        if len(trns) != 6:
            raise PngFormatError("malformed tRNS for RGB (need 6 bytes)")
        key = np.array(struct.unpack(">HHH", trns), dtype=np.uint16)
        if (key > 255).any():
            # a key outside the 8-bit sample range can never match — but
            # it is also spec-invalid at depth 8, so refuse
            raise PngFormatError("tRNS key sample exceeds bit depth 8")
        alpha = np.where(
            (planes == key.astype(np.uint8)).all(axis=2), 0, 255
        ).astype(np.uint8)[:, :, None]
        return np.concatenate([planes, alpha], axis=2)
    if ctype_ == 6:  # RGBA
        return planes
    if ctype_ == 0:  # gray -> RGB (tRNS: one 16-bit key level -> alpha)
        g3 = np.repeat(planes, 3, axis=2)
        if trns is None:
            return g3
        if len(trns) != 2:
            raise PngFormatError("malformed tRNS for gray (need 2 bytes)")
        (key,) = struct.unpack(">H", trns)
        if key > 255:
            raise PngFormatError("tRNS key sample exceeds bit depth 8")
        alpha = np.where(planes[:, :, 0] == key, 0, 255).astype(np.uint8)
        return np.concatenate([g3, alpha[:, :, None]], axis=2)
    if ctype_ == 4:  # gray+alpha -> RGBA
        g = np.repeat(planes[:, :, :1], 3, axis=2)
        return np.concatenate([g, planes[:, :, 1:]], axis=2)
    # palette (tRNS: per-entry alpha, short table padded with opaque)
    if palette is None:
        raise PngFormatError("palette image without PLTE chunk")
    idx = planes[:, :, 0]
    if int(idx.max(initial=0)) >= len(palette):
        raise PngFormatError("palette index out of range")
    if trns is None:
        return palette[idx]
    if len(trns) > len(palette):
        raise PngFormatError("tRNS longer than palette")
    pal_alpha = np.full(len(palette), 255, dtype=np.uint8)
    pal_alpha[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
    rgba = np.concatenate([palette, pal_alpha[:, None]], axis=1)
    return rgba[idx]


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """H×W×C uint8 array → PNG bytes (C: 1=gray, 2=gray+alpha, 3=RGB,
    4=RGBA; filter 0 scanlines, one IDAT).  ``decode_png(encode_png(x))``
    returns ``x`` expanded to 3/4 channels."""
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_png: need an HxWxC uint8 array")
    h, w, c = arr.shape
    ctype_ = {1: 0, 2: 4, 3: 2, 4: 6}.get(c)
    if ctype_ is None:
        raise ValueError(f"encode_png: unsupported channel count {c}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype_, 0, 0, 0)
    row0 = np.zeros((h, 1), dtype=np.uint8)  # filter byte 0 per scanline
    raw = np.concatenate([row0, arr.reshape(h, w * c)], axis=1).tobytes()
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )
