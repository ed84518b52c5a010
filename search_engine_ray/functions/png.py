"""Vendored minimal PNG codec — stdlib ``zlib`` + numpy only.

The container ships no image library (no PIL/opencv), but PNG's
container format is simple enough to implement honestly: this module
gives the multimodal stages a REAL decode path (bytes -> pixel array)
instead of a deterministic fake, and a writer so tests can generate
inputs without any third-party codec. Scope (asserted, not silently
wrong): 8-bit samples, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA), no interlacing. That covers what a
feature-extraction stage meets in practice; Adam7 and 16-bit raise
``ValueError`` loudly.

Spec: the public PNG specification (RFC 2083 / W3C PNG). Filters and
the Paeth predictor follow the spec's reconstruction functions;
Sub-filter reconstruction is a byte-wise prefix sum with stride bpp,
done with one uint8 ``np.cumsum`` per row (uint8 addition wraps mod
256 exactly as the spec requires).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_MODE = {0: "L", 2: "RGB", 3: "P", 4: "LA", 6: "RGBA"}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + tag + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """8-bit PNG bytes from an (H, W) gray or (H, W, C) C in {2,3,4}
    array. ``filter_type`` applies one filter to every scanline
    (0/1/2/3/4 — tests use this to exercise every decoder branch)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        h, w, c = a.shape[0], a.shape[1], 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] in (2, 3, 4):
        h, w, c = a.shape
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    rows = a.reshape(h, w * c)
    bpp = c
    out = bytearray()
    prior = np.zeros(w * c, dtype=np.uint8)
    for y in range(h):
        row = rows[y]
        if filter_type == 0:
            filt = row
        elif filter_type == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]]) if w * c > bpp else np.zeros_like(row)
            filt = row - left
        elif filter_type == 2:  # Up
            filt = row - prior
        elif filter_type == 3:  # Average
            left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]]) if w * c > bpp else np.zeros_like(row)
            filt = row - ((left.astype(np.uint16) + prior.astype(np.uint16)) // 2).astype(np.uint8)
        elif filter_type == 4:  # Paeth
            left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]]) if w * c > bpp else np.zeros_like(row)
            ul = np.concatenate([np.zeros(bpp, np.uint8), prior[:-bpp]]) if w * c > bpp else np.zeros_like(row)
            filt = row - _paeth(left, prior, ul)
        else:
            raise ValueError(f"unknown filter {filter_type}")
        out.append(filter_type)
        out.extend(filt.tobytes())
        prior = row
    idat = zlib.compress(bytes(out), 6)
    return (
        PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor over int16 copies (spec: nearest of
    left/up/upper-left to p = a + b - c, ties a, then b)."""
    a16, b16, c16 = (x.astype(np.int16) for x in (a, b, c))
    p = a16 + b16 - c16
    pa, pb, pc = np.abs(p - a16), np.abs(p - b16), np.abs(p - c16)
    out = np.where((pa <= pb) & (pa <= pc), a16, np.where(pb <= pc, b16, c16))
    return out.astype(np.uint8)


def parse_ihdr(data: bytes) -> dict:
    """Header-only parse (no decompression): width/height/bit depth/
    color type/interlace straight from the IHDR chunk — what a
    magic-number sniff + dimension probe costs at scale (25 bytes read
    per payload)."""
    if data[:8] != PNG_MAGIC or len(data) < 33 or data[12:16] != b"IHDR":
        raise ValueError("not a PNG")
    w, h, depth, color, _comp, _filt, interlace = struct.unpack(
        ">IIBBBBB", data[16:29]
    )
    return {
        "width": int(w), "height": int(h), "bit_depth": int(depth),
        "color_type": int(color), "interlace": int(interlace),
        "channels": _CHANNELS.get(color, 0), "mode": _MODE.get(color, "?"),
    }


def decode_png(data: bytes) -> tuple[np.ndarray, str]:
    """(pixels, mode): pixels is (H, W) for gray / (H, W, C) otherwise,
    uint8; palette images are expanded to RGB through their PLTE. Real
    decompression + per-scanline unfiltering — the genuine codec work,
    not a header sniff."""
    hdr = parse_ihdr(data)
    if hdr["bit_depth"] != 8:
        raise ValueError(f"bit depth {hdr['bit_depth']} unsupported (8 only)")
    if hdr["interlace"]:
        raise ValueError("Adam7 interlacing unsupported")
    if hdr["color_type"] not in _CHANNELS:
        raise ValueError(f"color type {hdr['color_type']} unsupported")
    w, h, c = hdr["width"], hdr["height"], hdr["channels"]

    idat = bytearray()
    plte = None
    pos = 8
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        if tag == b"IDAT":
            idat.extend(body)
        elif tag == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    raw = zlib.decompress(bytes(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch (truncated or non-8-bit)")
    buf = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    filters = buf[:, 0]
    rows = buf[:, 1:]
    out = np.empty((h, stride), np.uint8)
    bpp = c
    prior = np.zeros(stride, np.uint8)
    for y in range(h):
        f = int(filters[y])
        row = rows[y]
        if f == 0:
            rec = row.copy()
        elif f == 1:  # Sub: prefix sum with stride bpp (mod-256 wrap;
            # stride = w*c is always a multiple of bpp = c)
            rec = np.cumsum(
                row.reshape(-1, bpp), axis=0, dtype=np.uint8
            ).reshape(-1)
        elif f == 2:  # Up
            rec = row + prior
        elif f == 3:  # Average: sequential in x (depends on own output)
            rec = _seq_unfilter(row, prior, bpp, f)
        elif f == 4:  # Paeth: sequential in x
            rec = _seq_unfilter(row, prior, bpp, f)
        else:
            raise ValueError(f"bad filter byte {f}")
        out[y] = rec
        prior = rec
    if hdr["color_type"] == 3:
        if plte is None:
            raise ValueError("palette image without PLTE")
        return plte[out.reshape(h, w)], "RGB"
    if c == 1:
        return out.reshape(h, w), hdr["mode"]
    return out.reshape(h, w, c), hdr["mode"]


def _seq_unfilter(row: np.ndarray, prior: np.ndarray, bpp: int, f: int) -> np.ndarray:
    """Average/Paeth reconstruction — inherently sequential along the
    scanline (each byte depends on the just-reconstructed left byte).
    Plain loop over the row; rows are short relative to decompression
    cost and the writer never emits these, so this path is paid only on
    foreign PNGs."""
    rec = np.zeros(len(row), np.int32)
    pr = prior.astype(np.int32)
    rw = row.astype(np.int32)
    for x in range(len(row)):
        a = rec[x - bpp] if x >= bpp else 0
        b = pr[x]
        if f == 3:
            rec[x] = (rw[x] + (a + b) // 2) & 0xFF
        else:
            cc = pr[x - bpp] if x >= bpp else 0
            p = a + b - cc
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            rec[x] = (rw[x] + pred) & 0xFF
    return rec.astype(np.uint8)
