"""Pure-stdlib WAV (RIFF/WAVE) codec for the multimodal pipeline.

The PNG move applied to audio: the container has no soundfile/ffmpeg, but
a baseline PCM WAV codec is public knowledge over ``struct`` alone (the
RIFF container format + the WAVE fmt/data chunk layout — multimedia
programming interface standards published by Microsoft/IBM, same profile
stdlib ``wave`` reads).  The decoder below supports the
overwhelmingly-common profile — integer PCM (format tag 1), 8-bit
unsigned or 16-bit signed little-endian samples, any channel count and
sample rate — and REFUSES everything else loudly (ADPCM, IEEE float,
a-law/µ-law, WAVE_FORMAT_EXTENSIBLE, truncated or inconsistent chunks)
rather than mis-decoding: wrong audio features poison a quality filter
silently, a raised error does not.

The encoder writes the same profile, which lets tests and the gated query
build REAL WAV bytes deterministically (``decode(encode(rate, x)) ==
(rate, x)`` is a property test) without any third-party audio library.

At scale this runs as the kernel inside ``mapInPandas``
(``multimodal.audio_features``) — one Arrow batch of binaries per Python
call; decoding is a header parse + one ``np.frombuffer`` view, so the
per-clip cost is O(bytes) with no Python-loop inner path.
"""

from __future__ import annotations

import struct

import numpy as np

WAV_MAGIC = b"RIFF"

#: fmt chunk format tags this codec understands (integer PCM only)
_FORMAT_PCM = 1


class WavFormatError(ValueError):
    """Malformed, truncated, or unsupported-profile WAV bytes — never
    silently mis-decoded."""


def _chunks(data: bytes):
    """Yield (chunk_id, body) over the RIFF chunk stream, enforcing the
    spec's structure: 'RIFF' <size> 'WAVE' then a sequence of
    <id><size><body[pad to even]> chunks."""
    if data[:4] != WAV_MAGIC:
        raise WavFormatError("not a RIFF container: bad signature")
    if len(data) < 12:
        raise WavFormatError("truncated RIFF header")
    (riff_size,) = struct.unpack("<I", data[4:8])
    if data[8:12] != b"WAVE":
        raise WavFormatError(
            f"RIFF form type {data[8:12]!r} is not WAVE (AVI and other "
            "RIFF forms are refused, not guessed at)"
        )
    if riff_size + 8 > len(data):
        raise WavFormatError(
            f"RIFF size field {riff_size} overruns the payload "
            f"({len(data)} bytes)"
        )
    off = 12
    end = 8 + riff_size
    while off + 8 <= end:
        cid = data[off : off + 4]
        (size,) = struct.unpack("<I", data[off + 4 : off + 8])
        body = data[off + 8 : off + 8 + size]
        if len(body) != size:
            raise WavFormatError(f"truncated {cid!r} chunk")
        yield cid, body
        off += 8 + size + (size & 1)  # chunks are word-aligned


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → ``(sample_rate, samples)`` with samples an int16 array
    shaped ``(n_frames,)`` for mono or ``(n_frames, n_channels)``
    otherwise (8-bit inputs are centered and scaled to int16 so every
    caller sees one sample domain).  Supported profile: integer PCM,
    8/16-bit; anything else raises :class:`WavFormatError`."""
    fmt = None
    pcm = None
    for cid, body in _chunks(data):
        if cid == b"fmt ":
            if len(body) < 16:
                raise WavFormatError("fmt chunk shorter than 16 bytes")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            if fmt is None:
                raise WavFormatError("data chunk precedes fmt chunk")
            pcm = body
            break  # spec: one data chunk; trailing metadata is ignorable
    if fmt is None:
        raise WavFormatError("missing fmt chunk")
    if pcm is None:
        raise WavFormatError("missing data chunk")
    tag, n_ch, rate, byte_rate, block_align, bits = fmt
    if tag != _FORMAT_PCM:
        raise WavFormatError(
            f"unsupported format tag {tag} (integer PCM only — float/"
            "ADPCM/a-law/extensible are refused, not approximated)"
        )
    if n_ch == 0 or rate == 0:
        raise WavFormatError("zero channels or sample rate")
    if bits not in (8, 16):
        raise WavFormatError(f"unsupported bit depth {bits} (8/16 only)")
    frame = n_ch * (bits // 8)
    if block_align != frame or byte_rate != rate * frame:
        raise WavFormatError(
            "inconsistent fmt chunk: block_align/byte_rate disagree with "
            "channels x depth x rate — refusing a self-contradictory file"
        )
    if len(pcm) % frame != 0:
        raise WavFormatError(
            f"data length {len(pcm)} is not a whole number of "
            f"{frame}-byte frames"
        )
    if bits == 16:
        samples = np.frombuffer(pcm, dtype="<i2").astype(np.int16)
    else:  # 8-bit WAV is UNSIGNED, centered at 128 per the spec
        samples = (
            (np.frombuffer(pcm, dtype=np.uint8).astype(np.int16) - 128) << 8
        )
    if n_ch > 1:
        samples = samples.reshape(-1, n_ch)
    return int(rate), samples


def encode_wav(rate: int, samples: np.ndarray) -> bytes:
    """``(rate, int16 samples)`` → WAV bytes (PCM16, interleaved).
    Accepts ``(n,)`` mono or ``(n, ch)``; ``decode_wav(encode_wav(r, x))``
    returns ``(r, x)`` exactly."""
    arr = np.asarray(samples)
    if arr.dtype != np.int16:
        raise ValueError("encode_wav: need int16 samples")
    if arr.ndim == 1:
        n_ch = 1
    elif arr.ndim == 2:
        n_ch = arr.shape[1]
    else:
        raise ValueError("encode_wav: need (n,) or (n, channels)")
    if rate <= 0 or n_ch == 0:
        raise ValueError("encode_wav: rate and channels must be positive")
    pcm = arr.astype("<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", _FORMAT_PCM, n_ch, rate, rate * n_ch * 2, n_ch * 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
        + (b"\x00" if len(pcm) & 1 else b"")
    )
    return WAV_MAGIC + struct.pack("<I", len(body)) + body
