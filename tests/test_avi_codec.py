"""Vendored AVI codec + real video-decode multimodal stages.

Pins the RIFF/AVI round trip across shapes (incl. non-multiple-of-4
row widths, which exercise DIB row padding), pins the DECODER against
a hand-built AVI byte blob constructed independently of ``encode_avi``
(bottom-up rows, BGR order, '00dc' ids, 'rec ' grouping LISTs, odd-size
pad bytes), exercises the loud failure paths, and pins the end-to-end
Ray encode->decode stage pair against direct numpy plus the SQL oracle
shape on the real sf0.001 documents table.
"""

import struct

import numpy as np
import pyarrow as pa
import pytest

from search_engine_ray.functions.avi import AVI_MAGIC, decode_avi, encode_avi
from search_engine_ray.ops.multimodal import (
    _VID_EVERY, _VID_FPS, AviEncoder, VideoStatsExtractor, _video_dims,
)


@pytest.mark.parametrize("shape,fps", [((1, 1, 1), 10), ((3, 5, 7), 24),
                                       ((2, 16, 3), 1), ((4, 2, 2), 30),
                                       ((2, 3, 6), 15), ((5, 4, 5), 12)])
def test_roundtrip(shape, fps):
    rng = np.random.default_rng(sum(shape))
    f = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    out, got_fps = decode_avi(encode_avi(f, fps))
    assert got_fps == fps
    assert np.array_equal(out, f)


def _hand_built_avi(frames_rgb: np.ndarray, fps: int, frame_tag: bytes,
                    wrap_rec: bool = False, splice_junk: bool = False) -> bytes:
    """Build an AVI independently of encode_avi: explicit struct packing
    of avih/strh/strf and hand-padded bottom-up BGR DIB rows."""
    n, h, w, _ = frames_rgb.shape
    row_bytes = (w * 3 + 3) & ~3

    def chunk(tag, body):
        return tag + struct.pack("<I", len(body)) + body + (b"\0" if len(body) % 2 else b"")

    dibs = []
    for fr in frames_rgb:
        rows = b""
        for y in range(h - 1, -1, -1):           # bottom-up
            row = fr[y, :, ::-1].tobytes()        # BGR
            rows += row + b"\0" * (row_bytes - len(row))
        dibs.append(chunk(frame_tag, rows))
    movi_body = b"".join(dibs)
    if wrap_rec:
        movi_body = chunk(b"LIST", b"rec " + movi_body)
    if splice_junk:  # odd-size unknown chunk between frames exercises padding
        movi_body = chunk(b"JUNK", b"xyzzy") + movi_body

    avih = struct.pack("<IIIIIIIIII4I", 1_000_000 // fps, 0, 0, 0, n, 0, 1,
                       0, w, h, 0, 0, 0, 0)
    strh = struct.pack("<4s4sIHHIIIIIIIIhhhh", b"vids", b"DIB ", 0, 0, 0, 0,
                       1, fps, 0, n, 0, 0, 0, 0, 0, w, h)
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, row_bytes * h,
                       0, 0, 0, 0)
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih)
                 + chunk(b"LIST", b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = chunk(b"LIST", b"movi" + movi_body)
    body = b"AVI " + hdrl + movi
    return AVI_MAGIC + struct.pack("<I", len(body)) + body


@pytest.mark.parametrize("frame_tag", [b"00db", b"00dc"])
@pytest.mark.parametrize("wrap_rec", [False, True])
def test_decoder_against_hand_built_blob(frame_tag, wrap_rec):
    rng = np.random.default_rng(3)
    f = rng.integers(0, 256, (3, 4, 5, 3), dtype=np.uint8)  # w=5 -> padded rows
    payload = _hand_built_avi(f, 12, frame_tag, wrap_rec=wrap_rec,
                              splice_junk=True)
    out, fps = decode_avi(payload)
    assert fps == 12
    assert np.array_equal(out, f)


def test_unsupported_fails_loudly():
    with pytest.raises(ValueError, match="RIFF/AVI"):
        decode_avi(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    rng = np.random.default_rng(0)
    f = rng.integers(0, 256, (1, 2, 2, 3), dtype=np.uint8)
    p = bytearray(encode_avi(f))
    i = p.find(b"strf")
    struct.pack_into("<I", p, i + 8 + 16, 0x44495658)  # biCompression='XVID'
    with pytest.raises(ValueError, match="compression"):
        decode_avi(bytes(p))
    p = bytearray(encode_avi(f))
    struct.pack_into("<H", p, p.find(b"strf") + 8 + 14, 8)  # biBitCount=8
    with pytest.raises(ValueError, match="bpp"):
        decode_avi(bytes(p))
    with pytest.raises(ValueError, match="uint8"):
        encode_avi(np.zeros((1, 2, 2, 3), np.float32))
    # truncated frame chunk fails loudly, not silently short
    good = encode_avi(f)
    j = good.find(b"00db")
    bad = bytearray(good)
    struct.pack_into("<I", bad, j + 4, 3)  # declared size < DIB size
    with pytest.raises(ValueError, match="DIB size"):
        decode_avi(bytes(bad))


def _expected_rows(text: str) -> list[dict]:
    b = np.frombuffer(text.encode(), np.uint8)
    n = len(b)
    w, h, f = _video_dims(n)
    rows = []
    for k in range(0, f, _VID_EVERY):
        if n == 0:
            px = 0
        else:
            i = np.arange(w * h * 3, dtype=np.int64)
            px = int(b[(i + k) % n].astype(np.int64).sum())
        rows.append({"frame_idx": k, "width": w, "height": h,
                     "n_frames": f, "fps": _VID_FPS, "px_sum": px})
    return rows


def test_encode_decode_stage_pair_matches_numpy():
    texts = ["", "short", "a" * 40, "mixed 123 éé", "x" * 300, "\x01\x7f" * 9]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = VideoStatsExtractor()(AviEncoder()(t)).to_pydict()
    pos = 0
    for doc_id, s in enumerate(texts):
        for exp in _expected_rows(s):
            assert out["doc_id"][pos] == doc_id
            for k, want in exp.items():
                assert out[k][pos] == want, (k, s)
            pos += 1
    assert pos == len(out["doc_id"])


def test_video_stats_pipeline_matches_oracle(ray_session):
    """The aux gate entry over the real sf0.001 documents table, checked
    value-for-value against its own DuckDB oracle (the same comparison
    the driver gate runs at sf0.01)."""
    import duckdb
    import pandas as pd

    from search_engine_ray.ops.multimodal import SQL_VIDEO_STATS, video_stats

    sf_dir = "/root/testdata/sf0.001"
    got = (video_stats(sf_dir).to_pandas()
           .sort_values(["doc_id", "frame_idx"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    exp = (con.execute(SQL_VIDEO_STATS).df()
           .sort_values(["doc_id", "frame_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  exp[got.columns].astype("int64"))
