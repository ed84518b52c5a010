"""Vendored minimal AVI (RIFF 'AVI ') codec — stdlib ``struct`` + numpy.

The container ships no video library, but uncompressed AVI is a plain
RIFF container carrying DIB (BITMAPINFOHEADER) frames: this gives the
multimodal stages a REAL video decode path (bytes -> frame array +
fps) instead of byte-offset fakes, and a writer so tests can generate
inputs without any third-party codec. Scope (asserted, not silently
wrong): one 'vids' stream of 24-bit BI_RGB (uncompressed) frames, any
dimensions and frame rate. Compressed fourccs raise ``ValueError``
loudly. The decoder walks RIFF chunks properly — it parses the 'hdrl'
LIST (avih + the first video stream's strh/strf), collects '..db' /
'..dc' frame chunks from the 'movi' LIST including frames nested in
'rec ' grouping LISTs, honors the spec's odd-size pad byte, and
reconstructs pixels from the DIB layout (bottom-up row order, rows
padded to 4-byte boundaries, BGR channel order).

Spec: the public Microsoft RIFF AVI file-format description
(AVIMAINHEADER / AVISTREAMHEADER / BITMAPINFOHEADER layouts as
documented in the Win32 multimedia reference; same RIFF chunk grammar
as ``functions/wav.py``). The decoder is additionally pinned in tests
against a hand-built AVI byte blob constructed independently of
``encode_avi``.

Reference analog: the reference engine has no video path (its corpus
is crawled HTML); this extends the opaque-binary-column model to the
video modality the brief's training-data pipelines need.
"""

from __future__ import annotations

import struct

import numpy as np

AVI_MAGIC = b"RIFF"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return tag + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) % 2 else b"")


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """Serialize a ``(n_frames, height, width, 3)`` uint8 RGB array to
    an uncompressed 24-bit BI_RGB AVI payload. Each frame is stored as
    a DIB: bottom-up rows, each row zero-padded to a 4-byte boundary,
    channels in BGR order — exactly how '00db' chunks carry
    uncompressed video."""
    f = np.asarray(frames)
    if f.dtype != np.uint8 or f.ndim != 4 or f.shape[3] != 3:
        raise ValueError("frames must be uint8 with shape (n, h, w, 3)")
    n, h, w, _ = f.shape
    if n < 1 or h < 1 or w < 1:
        raise ValueError("need at least one frame with nonzero dimensions")
    row_bytes = (w * 3 + 3) & ~3
    frame_size = row_bytes * h
    # RGB -> BGR, top-down -> bottom-up, pad rows to 4-byte multiples
    dib = np.zeros((n, h, row_bytes), np.uint8)
    dib[:, :, : w * 3] = f[:, ::-1, :, ::-1].reshape(n, h, w * 3)
    movi_frames = b"".join(_chunk(b"00db", fr.tobytes()) for fr in dib)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // max(fps, 1),   # dwMicroSecPerFrame
        frame_size * fps,           # dwMaxBytesPerSec
        0,                          # dwPaddingGranularity
        0,                          # dwFlags (no idx1 index is written)
        n,                          # dwTotalFrames
        0,                          # dwInitialFrames
        1,                          # dwStreams
        frame_size,                 # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ",
        0, 0, 0, 0,                 # flags, priority, language, initial frames
        1, max(fps, 1),             # dwScale / dwRate -> fps
        0, n,                       # dwStart, dwLength (frames)
        frame_size, 0xFFFFFFFF & (1 << 31), frame_size,  # bufsize, quality(-1), sample size
        0, 0, w, h,                 # rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, 24, 0,         # biSize, biWidth, biHeight(+ = bottom-up), planes, bpp, BI_RGB
        frame_size, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", movi_frames)
    body = b"AVI " + hdrl + movi
    return AVI_MAGIC + struct.pack("<I", len(body)) + body


def _walk(payload: bytes, pos: int, end: int):
    """Yield (tag, body_start, body_size) for each RIFF chunk in
    [pos, end); LIST chunks yield their 4-byte kind as the tag with the
    body positioned after it."""
    while pos + 8 <= end:
        tag = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body_start = pos + 8
        if tag == b"LIST" and size >= 4:
            yield payload[body_start:body_start + 4], body_start + 4, size - 4
        else:
            yield tag, body_start, size
        pos = body_start + size + (size % 2)  # chunks pad to even offsets


def decode_avi(payload: bytes) -> tuple[np.ndarray, int]:
    """Parse an uncompressed 24-bit AVI payload -> (frames, fps) with
    frames shaped ``(n, h, w, 3)`` uint8 RGB, top-down row order."""
    if payload[:4] != AVI_MAGIC or len(payload) < 12 or payload[8:12] != b"AVI ":
        raise ValueError("payload is not a RIFF/AVI container")
    end = min(8 + struct.unpack("<I", payload[4:8])[0], len(payload))
    w = h = bpp = compression = None
    fps = 0
    raw_frames: list[bytes] = []
    in_video_stream = False

    def scan(pos: int, stop: int) -> None:
        nonlocal w, h, bpp, compression, fps, in_video_stream
        for tag, start, size in _walk(payload, pos, stop):
            body = payload[start:start + size]
            if tag in (b"hdrl", b"strl", b"rec "):
                scan(start, start + size)
            elif tag == b"strh" and size >= 56:
                fcc_type = body[:4]
                in_video_stream = fcc_type == b"vids" and w is None
                if in_video_stream:
                    scale, rate = struct.unpack("<II", body[20:28])
                    fps = rate // max(scale, 1)
            elif tag == b"strf" and in_video_stream and size >= 40:
                _bi_size, bw, bh, _planes, bbpp, bcomp = struct.unpack("<IiiHHI", body[:20])
                w, h, bpp, compression = bw, bh, bbpp, bcomp
                in_video_stream = False
            elif tag == b"movi":
                collect_frames(start, start + size)

    def collect_frames(pos: int, stop: int) -> None:
        for ftag, fstart, fsize in _walk(payload, pos, stop):
            if ftag == b"rec ":  # grouping LIST: frames nest one level in
                collect_frames(fstart, fstart + fsize)
            elif ftag[2:4] in (b"db", b"dc") and fsize > 0:
                raw_frames.append(payload[fstart:fstart + fsize])

    scan(12, end)
    if w is None or h is None:
        raise ValueError("missing video stream headers (strh/strf)")
    if compression != 0 or bpp != 24:
        raise ValueError(
            f"unsupported AVI encoding (compression={compression}, bpp={bpp}; "
            "only uncompressed 24-bit BI_RGB is supported)"
        )
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    frame_size = row_bytes * h
    frames = np.zeros((len(raw_frames), h, w, 3), np.uint8)
    for i, raw in enumerate(raw_frames):
        if len(raw) < frame_size:
            raise ValueError(f"frame {i}: {len(raw)} bytes < DIB size {frame_size}")
        dib = np.frombuffer(raw[:frame_size], np.uint8).reshape(h, row_bytes)
        rows = dib[:, : w * 3].reshape(h, w, 3)
        if bottom_up:
            rows = rows[::-1]
        frames[i] = rows[:, :, ::-1]  # BGR -> RGB
    return frames, fps
