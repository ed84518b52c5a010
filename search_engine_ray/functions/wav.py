"""Vendored minimal WAV (RIFF/WAVE PCM) codec — stdlib ``struct`` + numpy.

The container ships no audio library, but PCM WAV is a plain RIFF
container: this gives the multimodal stages a REAL audio decode path
(bytes -> sample array + rate) instead of a deterministic fake, and a
writer so tests can generate inputs without any third-party codec.
Scope (asserted, not silently wrong): integer PCM at 8/16/32 bits
(format tag 1, or WAVE_FORMAT_EXTENSIBLE wrapping PCM), any channel
count and rate. Float PCM and compressed formats raise ``ValueError``
loudly. The decoder walks RIFF chunks properly — unknown chunks
(LIST/fact/cue) are skipped by their declared size, with the spec's
odd-size pad byte — rather than assuming the 44-byte canonical layout.

Spec: the public RIFF/WAVE format description (Microsoft/IBM
multimedia programming interface, as mirrored in RFC 2361's waveformat
registry). Cross-checked in tests against the stdlib ``wave`` module
in both directions.
"""

from __future__ import annotations

import struct

import numpy as np

WAV_MAGIC = b"RIFF"

_PCM_DTYPE = {8: np.dtype("u1"), 16: np.dtype("<i2"), 32: np.dtype("<i4")}


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Serialize an int16 sample array to a canonical PCM WAV payload.
    1-D arrays are mono; 2-D ``(n_frames, n_channels)`` arrays are
    interleaved frame-major, exactly how the ``data`` chunk stores
    multi-channel PCM."""
    s = np.asarray(samples)
    if s.dtype != np.int16:
        raise ValueError(f"encode_wav writes 16-bit PCM, got {s.dtype}")
    if s.ndim == 1:
        n_ch = 1
    elif s.ndim == 2:
        n_ch = s.shape[1]
    else:
        raise ValueError("samples must be 1-D (mono) or 2-D (frames, channels)")
    raw = s.astype("<i2").tobytes()
    block_align = 2 * n_ch
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, sample_rate * block_align,
        block_align, 16,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(raw)) + raw
        + (b"\x00" if len(raw) % 2 else b"")
    )
    return WAV_MAGIC + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Parse a RIFF/WAVE PCM payload -> (samples, sample_rate). Mono
    decodes to 1-D; multi-channel to ``(n_frames, n_channels)``. 8-bit
    PCM (unsigned per spec) is re-centered to signed values so all
    widths share a zero-centered convention."""
    if payload[:4] != WAV_MAGIC or len(payload) < 12 or payload[8:12] != b"WAVE":
        raise ValueError("payload is not a RIFF/WAVE container")
    pos, end = 12, 8 + struct.unpack("<I", payload[4:8])[0]
    end = min(end, len(payload))
    fmt = data = None
    while pos + 8 <= end:
        tag = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            fmt = body
        elif tag == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError("fmt chunk too short")
    tag, n_ch, rate, _brate, _balign, bits = struct.unpack("<HHIIHH", fmt[:16])
    if tag == 0xFFFE and len(fmt) >= 26:  # WAVE_FORMAT_EXTENSIBLE
        tag = struct.unpack("<H", fmt[24:26])[0]
    if tag != 1:
        raise ValueError(f"unsupported WAV format tag {tag} (PCM only)")
    if bits not in _PCM_DTYPE:
        raise ValueError(f"unsupported PCM bit depth {bits}")
    width = bits // 8
    n = len(data) // (width * max(n_ch, 1))
    s = np.frombuffer(data[: n * width * n_ch], dtype=_PCM_DTYPE[bits])
    if bits == 8:  # spec stores 8-bit PCM unsigned, zero at 128
        s = s.astype(np.int16) - 128
    else:
        s = s.astype(s.dtype.newbyteorder("="), copy=False)
    if n_ch > 1:
        s = s.reshape(n, n_ch)
    return s, rate
