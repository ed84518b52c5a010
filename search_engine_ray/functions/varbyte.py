"""Delta-gap + varbyte posting-list compression (vectorized numpy).

Replaces the reference's ``url^tf p1 p2 …~…`` delimited posting strings
(`/root/reference/src/cis5550/jobs/Indexer.java:252-283`) with the
standard IR encoding: doc_ids are stored as ascending gaps, each
non-negative integer as 1-10 base-128 bytes, 7 payload bits per byte,
high bit set on the LAST byte of each value (classic varbyte).

Encode and decode are fully vectorized: no Python per-value loop.
"""

from __future__ import annotations

import numpy as np


def encode(values: np.ndarray) -> bytes:
    """Varbyte-encode a 1-D array of non-negative integers."""
    return encode_concat([values])[0]


def encode_concat(arrays: list[np.ndarray]) -> list[bytes]:
    """Encode many arrays in one vectorized pass; returns bytes per array."""
    if not arrays:
        return []
    lens = [len(a) for a in arrays]
    if sum(lens) == 0:
        return [b""] * len(arrays)
    v = np.concatenate([np.asarray(a, dtype=np.uint64) for a in arrays])
    # bytes needed per value: ceil(bitlength/7), min 1
    nbytes = np.ones(len(v), dtype=np.int64)
    for i in range(1, 10):
        over = v >= np.uint64(1 << (7 * i))
        if not over.any():
            break
        nbytes[over] += 1

    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    # byte slot i (0-based from value start) holds bits 7*(nbytes-1-i)..
    # i.e. big-endian base-128 digits; last byte gets the continuation bit.
    max_n = int(nbytes.max())
    for i in range(max_n):
        mask = nbytes > i
        shift = ((nbytes[mask] - 1 - i) * 7).astype(np.uint64)
        digit = ((v[mask] >> shift) & np.uint64(0x7F)).astype(np.uint8)
        last = nbytes[mask] - 1 == i
        digit[last] |= 0x80
        out[starts[mask] + i] = digit

    blob = out.tobytes()
    byte_ends = np.cumsum([int(nbytes[s:e].sum()) for s, e in _spans(lens)])
    res = []
    prev = 0
    for be in byte_ends:
        res.append(blob[prev:be])
        prev = be
    return res


def binary_column(blob: bytes, byte_offsets: np.ndarray):
    """LargeBinaryArray over ``encode_offsets`` output with ZERO per-
    group copies: the (blob, byte_offsets) pair IS the Arrow layout, so
    the column is two buffer wraps — never a Python loop slicing one
    bytes object per group (the hottest-stage cost that loop was)."""
    import pyarrow as pa

    offs = np.ascontiguousarray(byte_offsets, dtype=np.int64)
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), len(offs) - 1,
        [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(blob)],
    )


def encode_offsets(values: np.ndarray, offsets: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode ``values`` once; return (blob, byte_offsets) where
    ``blob[byte_offsets[i]:byte_offsets[i+1]]`` is the encoding of
    ``values[offsets[i]:offsets[i+1]]``. ``offsets`` must start at 0 and
    end at ``len(values)``. Fully vectorized except the final slicing
    done by the caller."""
    if len(values) == 0:
        return b"", np.zeros(len(offsets), dtype=np.int64)
    v = np.asarray(values, dtype=np.uint64)
    nbytes = np.ones(len(v), dtype=np.int64)
    for i in range(1, 10):
        over = v >= np.uint64(1 << (7 * i))
        if not over.any():
            break
        nbytes[over] += 1
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    for i in range(int(nbytes.max())):
        mask = nbytes > i
        shift = ((nbytes[mask] - 1 - i) * 7).astype(np.uint64)
        digit = ((v[mask] >> shift) & np.uint64(0x7F)).astype(np.uint8)
        digit[nbytes[mask] - 1 == i] |= 0x80
        out[starts[mask] + i] = digit
    cum = np.concatenate([[0], ends])
    byte_offsets = cum[np.asarray(offsets, dtype=np.int64)]
    return out.tobytes(), byte_offsets


def encode_single(value: int) -> bytes:
    return encode(np.array([value], dtype=np.uint64))


def first_varint_len(blob: bytes) -> int:
    """Byte length of the first encoded value (terminator = high bit)."""
    for i, byte in enumerate(blob[:10]):
        if byte & 0x80:
            return i + 1
    raise ValueError("malformed varbyte blob")


def first_varint(blob: bytes) -> int:
    out = 0
    for byte in blob[:10]:
        out = (out << 7) | (byte & 0x7F)
        if byte & 0x80:
            return out
    raise ValueError("malformed varbyte blob")


def rebase_first(blob: bytes, new_first: int) -> bytes:
    """Replace the first encoded value of ``blob`` with ``new_first`` —
    used when concatenating doc-gap streams (the first value of each
    partial is absolute; on concat it becomes a gap)."""
    return encode_single(new_first) + blob[first_varint_len(blob):]


def _spans(lens):
    pos = 0
    for n in lens:
        yield pos, pos + n
        pos += n


def decode(blob: bytes, count: int | None = None) -> np.ndarray:
    """Decode a varbyte blob back to a uint64 array (vectorized)."""
    raw = np.frombuffer(blob, dtype=np.uint8)
    if raw.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (raw & 0x80) != 0
    n_values = int(is_last.sum())
    digits = (raw & 0x7F).astype(np.uint64)
    ends = np.flatnonzero(is_last)
    starts = np.concatenate([[0], ends[:-1] + 1])
    nb = ends - starts + 1  # bytes per value
    out = np.zeros(n_values, dtype=np.uint64)
    # fold byte slots most-significant-first: slot i contributes to the
    # values with more than i bytes via a buffered shift-or gather. At
    # most 10 iterations, each a plain mask+take — unlike np.add.at,
    # whose unbuffered scatter was the dominant cost of hot-term
    # re-decode on the serving path (the LRU exists to amortize it)
    for i in range(int(nb.max())):
        sel = nb > i
        out[sel] = (out[sel] << np.uint64(7)) | digits[starts[sel] + i]
    if count is not None and n_values != count:
        raise ValueError(f"decoded {n_values} values, expected {count}")
    return out


def delta_encode(doc_ids: np.ndarray) -> np.ndarray:
    """Ascending doc_ids -> gaps (first value kept absolute)."""
    d = np.asarray(doc_ids, dtype=np.int64)
    if d.size == 0:
        return d.astype(np.uint64)
    gaps = np.empty_like(d)
    gaps[0] = d[0]
    np.subtract(d[1:], d[:-1], out=gaps[1:])
    if d.size > 1 and (gaps[1:] <= 0).any():
        raise ValueError("doc_ids must be strictly ascending")
    return gaps.astype(np.uint64)


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(gaps.astype(np.int64))


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes]:
    """(ascending doc_ids, tfs) -> (doc_blob, tf_blob)."""
    doc_blob, tf_blob = encode_concat([delta_encode(doc_ids), np.asarray(tfs, dtype=np.uint64)])
    return doc_blob, tf_blob


def decode_postings(doc_blob: bytes, tf_blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    doc_ids = delta_decode(decode(doc_blob))
    tfs = decode(tf_blob).astype(np.int64)
    return doc_ids, tfs
