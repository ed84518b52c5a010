"""Multimodal (binary-payload) stages — real Ray plumbing, REAL codecs
for all three modalities (PNG image, RIFF/PCM WAV audio, RIFF/AVI video).

Large-scale training-data pipelines treat image/audio/video as opaque
``binary`` columns with typed metadata; the decode / feature-extract /
frame-sample stages are stateful actor-pool ``map_batches`` stages with
SMALL batch sizes (a batch x concurrency of multi-MB payloads must fit
a worker heap). The container ships no image library, so the codec is
the vendored pure-Python PNG implementation (``functions/png.py`` —
stdlib zlib + numpy, full unfilter pipeline): ``decode_image`` prefers
PIL when importable and otherwise decodes PNG payloads for real;
payloads that are not a decodable image fall back to the deterministic
fake featurizer so the gate entry (whose payloads are UTF-8 text
bytes, ``CAST(text AS BLOB)`` on the oracle side) is byte-stable. The
``image_stats`` op exercises the real path end-to-end inside Ray: a
deterministic PNG is ENCODED from each document's text bytes by one
actor-pool stage and DECODED back to pixel statistics by the next.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.avi import decode_avi, encode_avi
from ..functions.png import PNG_MAGIC, decode_png, encode_png, parse_ihdr
from ..functions.wav import decode_wav, encode_wav
from ..io import read_parquet_light

_FRAME = 1000   # bytes per fake "frame"
_EVERY = 3      # sample every k-th frame


def _payloads(sf_dir: str) -> "ray.data.Dataset":
    ds = read_parquet_light(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "payload": pc.cast(t["text"], pa.large_binary()),
            }
        ),
        batch_format="pyarrow",
    )


def decode_image(payload: bytes) -> tuple[np.ndarray, str]:
    """REAL image decode: PIL when importable (any format it knows),
    else the vendored PNG decoder (``functions/png.py``). Returns
    (pixels uint8 array, mode). Raises ``ValueError`` for payloads in
    no decodable format — callers that must not fail route those to the
    deterministic fake featurizer instead (``MediaFeatureExtractor``)."""
    try:  # pragma: no cover - PIL absent in this container
        import PIL.Image
        import io

        img = PIL.Image.open(io.BytesIO(payload))
        return np.asarray(img), img.mode
    except ImportError:
        pass
    if payload[:8] == PNG_MAGIC:
        return decode_png(payload)
    raise ValueError("payload is not a PNG and no image library is available")


class MediaFeatureExtractor:
    """Actor-pool stage: codec probe once per actor in __init__,
    vectorized feature extraction per batch in __call__. PNG payloads
    get a REAL header parse (width/height straight from IHDR — what a
    production dimension probe reads, 25 bytes per payload); payloads
    in no known image format get the deterministic fake featurizer
    (dimensions derived from size) so text-derived gate payloads keep
    a stable, oracle-reproducible output."""

    def __init__(self):
        try:  # pragma: no cover - PIL absent in this container
            import PIL  # noqa: F401

            self.pil = True
        except ImportError:
            self.pil = False

    def __call__(self, t: pa.Table) -> pa.Table:
        payload = t["payload"].combine_chunks()
        n_bytes = pc.cast(pc.binary_length(payload), pa.int64())
        nb = n_bytes.to_numpy()
        # fake-path dimensions (size-derived); real parses overwrite
        width = nb % 512
        height = (nb // 512) % 512
        # vectorized: slice the 8-byte head with an Arrow kernel, then
        # hex-encode the fixed-width buffers via numpy (no per-row
        # as_py() materialization in the hot stage)
        heads = pc.binary_slice(payload, 0, 8)
        head_np = heads.to_numpy(zero_copy_only=False)
        head_hex = [None if v is None else v.hex().upper() for v in head_np]
        # real magic-number sniff: IHDR header parse for the PNG rows
        # only (the 33-byte header slice, not the pixel stream)
        is_png = np.fromiter(
            (v is not None and v[:8] == PNG_MAGIC for v in head_np),
            dtype=bool, count=len(head_np),
        )
        if is_png.any():
            hdr_np = pc.binary_slice(payload, 0, 33).to_numpy(zero_copy_only=False)
            for i in np.flatnonzero(is_png):
                try:
                    hdr = parse_ihdr(bytes(hdr_np[i]))
                    width[i], height[i] = hdr["width"], hdr["height"]
                except ValueError:
                    pass  # truncated header: keep the fake dims
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bytes": n_bytes,
                "head_hex": pa.array(head_hex, pa.string()),
                "width": pa.array(width, pa.int64()),
                "height": pa.array(height, pa.int64()),
            }
        )


def multimodal_features(sf_dir: str):
    return _payloads(sf_dir).map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=64,          # binary payloads: keep batches small
        concurrency=(1, 4),
    )


SQL_MULTIMODAL_FEATURES = """
SELECT doc_id,
       octet_length(CAST(text AS BLOB)) AS n_bytes,
       upper(substring(hex(CAST(text AS BLOB)), 1, 16)) AS head_hex,
       octet_length(CAST(text AS BLOB)) % 512 AS width,
       (octet_length(CAST(text AS BLOB)) // 512) % 512 AS height
FROM documents
"""


def frame_sample(sf_dir: str):
    """Video-style frame sampling: payload -> fixed-size frames, keep
    every k-th (flat_map shape: one row in, many out)."""

    def sample(t: pa.Table) -> pa.Table:
        # vectorized repeat/arange arithmetic — no per-row Python loop
        payload = t["payload"].combine_chunks()
        nb = pc.fill_null(pc.binary_length(payload), 0).to_numpy().astype(np.int64)
        doc_ids = t["doc_id"].to_numpy()
        n_frames = (nb + _FRAME - 1) // _FRAME
        n_kept = (n_frames + _EVERY - 1) // _EVERY
        doc_out = np.repeat(doc_ids, n_kept)
        nb_out = np.repeat(nb, n_kept)
        excl = np.concatenate([[0], np.cumsum(n_kept)[:-1]])
        idx = (np.arange(n_kept.sum(), dtype=np.int64) - np.repeat(excl, n_kept)) * _EVERY
        frame_bytes = np.minimum(_FRAME, nb_out - idx * _FRAME)
        return pa.table(
            {
                "doc_id": pa.array(doc_out, pa.int64()),
                "frame_idx": pa.array(idx, pa.int64()),
                "frame_bytes": pa.array(frame_bytes, pa.int64()),
            }
        )

    return _payloads(sf_dir).map_batches(
        sample, batch_format="pyarrow", batch_size=64
    )


SQL_FRAME_SAMPLE = f"""
WITH p AS (
    SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n FROM documents
)
SELECT p.doc_id, f.f AS frame_idx,
       CASE WHEN p.n - f.f * {_FRAME} < {_FRAME} THEN p.n - f.f * {_FRAME}
            ELSE {_FRAME} END AS frame_bytes
FROM p, LATERAL (
    SELECT unnest(range(0, CAST((p.n + {_FRAME} - 1) // {_FRAME} AS BIGINT), {_EVERY})) AS f
) f
WHERE p.n > 0
"""


class PngEncoder:
    """Actor-pool encode stage: each document's text bytes become a
    deterministic grayscale PNG (width/height from n_chars, pixels =
    the bytes tiled row-major, zero-padded). Per-row loop is inherent —
    a codec serializes one payload at a time — so the batch is small
    and the pool wide; the zlib/cumsum work inside is C."""

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].to_numpy(zero_copy_only=False)
        payloads = []
        for s in texts:
            b = ("" if s is None else s).encode()
            w = len(b) % 16 + 1
            h = (len(b) // 16) % 16 + 1
            arr = np.frombuffer(b[: w * h].ljust(w * h, b"\0"), np.uint8)
            payloads.append(encode_png(arr.reshape(h, w)))
        return pa.table(
            {"doc_id": t["doc_id"],
             "payload": pa.array(payloads, pa.large_binary())}
        )


class ImageStatsExtractor:
    """Actor-pool REAL-decode stage: every payload goes through the
    actual codec (PIL or the vendored PNG pipeline — decompress,
    unfilter, reconstruct pixels) and out come pixel statistics. This
    is the genuine decode work a 100 TB image pipeline pays; batches
    stay small (decoded pixels are the memory hot spot, not the
    compressed payloads)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_numpy(zero_copy_only=False)
        out = {"width": [], "height": [], "channels": [],
               "mean_px_ppm": [], "px_sum": []}
        for p in payloads:
            pix, _mode = decode_image(bytes(p))
            h, w = pix.shape[:2]
            c = 1 if pix.ndim == 2 else pix.shape[2]
            flat = pix.reshape(-1).astype(np.int64)
            out["width"].append(w)
            out["height"].append(h)
            out["channels"].append(c)
            # integer ppm mean: order-independent, hash-stable
            out["mean_px_ppm"].append(
                int(flat.sum() * 1_000_000 // max(flat.size, 1))
            )
            out["px_sum"].append(int(flat.sum()))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                **{k: pa.array(v, pa.int64()) for k, v in out.items()},
            }
        )


def image_stats(sf_dir: str):
    """End-to-end REAL codec round trip inside Ray: text bytes ->
    deterministic PNG (encode actor pool) -> pixel statistics (decode
    actor pool). Rows-only aux entry: the decode side is not
    SQL-expressible; correctness is pytest-pinned against direct numpy
    on the same deterministic arrays (tests/test_multimodal_codec.py)."""
    ds = read_parquet_light(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    encoded = ds.map_batches(
        PngEncoder, batch_format="pyarrow", batch_size=64, concurrency=(1, 4)
    )
    return encoded.map_batches(
        ImageStatsExtractor, batch_format="pyarrow", batch_size=64,
        concurrency=(1, 4),
    )


class WavEncoder:
    """Actor-pool audio encode stage: each document's text bytes become
    a deterministic 16-bit PCM mono WAV (samples = zero-centered byte
    values scaled to the int16 range, 8 kHz). Per-row loop is inherent
    to a codec; the sample synthesis inside is numpy."""

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].to_numpy(zero_copy_only=False)
        payloads = []
        for s in texts:
            b = np.frombuffer(("" if s is None else s).encode(), np.uint8)
            samples = (b.astype(np.int16) - 128) * 256
            payloads.append(encode_wav(samples, sample_rate=8000))
        return pa.table(
            {"doc_id": t["doc_id"],
             "payload": pa.array(payloads, pa.large_binary())}
        )


class AudioFeatureExtractor:
    """Actor-pool REAL audio-decode stage: every payload goes through
    the actual RIFF/PCM parser (``functions/wav.py``) and out come the
    standard first-pass audio-quality features — duration, energy, zero
    crossings — as order-stable integers. This is the decode work a
    100 TB audio pipeline pays before any model sees a sample; batches
    stay small (decoded sample arrays are the memory hot spot).

    Reference analog: the reference has no audio path (its corpus is
    crawled HTML, /root/reference/src/cis5550/jobs/Crawler.java); this
    extends the engine's opaque-binary-column model to the audio
    modality the brief's training-data pipelines need."""

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_numpy(zero_copy_only=False)
        out = {"n_samples": [], "sample_rate": [], "channels": [],
               "duration_ms": [], "energy": [], "zero_crossings": []}
        for p in payloads:
            s, rate = decode_wav(bytes(p))
            n = s.shape[0]
            ch = 1 if s.ndim == 1 else s.shape[1]
            flat = s.reshape(-1).astype(np.int64)
            mono = flat if ch == 1 else flat.reshape(-1, ch)[:, 0]
            out["n_samples"].append(n)
            out["sample_rate"].append(rate)
            out["channels"].append(ch)
            out["duration_ms"].append(int(n * 1000 // max(rate, 1)))
            out["energy"].append(int((flat * flat).sum()))
            out["zero_crossings"].append(
                int(np.count_nonzero(mono[1:] * mono[:-1] < 0))
            )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                **{k: pa.array(v, pa.int64()) for k, v in out.items()},
            }
        )


def audio_stats(sf_dir: str):
    """End-to-end REAL audio codec round trip inside Ray: text bytes ->
    deterministic PCM WAV (encode actor pool) -> sample statistics
    (decode actor pool). Aux entry WITH a full oracle: the synthesized
    samples are a pure function of the text bytes, so energy and zero
    crossings are SQL-expressible over the byte stream (per-byte
    LATERAL unnest — fine at gate scale, the Ray side is the one built
    for volume)."""
    ds = read_parquet_light(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    encoded = ds.map_batches(
        WavEncoder, batch_format="pyarrow", batch_size=64, concurrency=(1, 4)
    )
    return encoded.map_batches(
        AudioFeatureExtractor, batch_format="pyarrow", batch_size=64,
        concurrency=(1, 4),
    )


# The WAV round trip is exactly recoverable in SQL: sample_i =
# (byte_i - 128) * 256 over the UTF-8 byte stream, so n_samples =
# octet_length, energy = sum(sample^2), and zero crossings count sign
# flips between consecutive nonzero-product samples. DuckDB walks the
# bytes with a LATERAL range over octet_length (blob indexing via
# substring + ascii of the single-byte slice).
SQL_AUDIO_STATS = """
WITH b AS (
    SELECT doc_id, hex(CAST(coalesce(text, '') AS BLOB)) AS hx,
           octet_length(CAST(coalesce(text, '') AS BLOB)) AS n
    FROM documents
),
s AS (
    SELECT b.doc_id, i.i,
           (('0x' || substring(b.hx, CAST(i.i * 2 + 1 AS INTEGER), 2))::INTEGER
            - 128) * 256 AS v
    FROM b, LATERAL (SELECT unnest(range(0, b.n)) AS i) i
),
s2 AS (
    SELECT doc_id, v,
           lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
    FROM s
),
agg AS (
    SELECT doc_id,
           CAST(SUM(CAST(v AS BIGINT) * v) AS BIGINT) AS energy,
           CAST(SUM(CASE WHEN pv IS NOT NULL AND CAST(v AS BIGINT) * pv < 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
    FROM s2 GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(b.n AS BIGINT) AS n_samples,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST(1 AS BIGINT) AS channels,
       CAST(b.n * 1000 // 8000 AS BIGINT) AS duration_ms,
       COALESCE(a.energy, 0) AS energy,
       COALESCE(a.zero_crossings, 0) AS zero_crossings
FROM b LEFT JOIN agg a USING (doc_id)
"""


_VID_FPS = 10    # synthesized video frame rate
_VID_EVERY = 2   # video_stats samples every k-th decoded frame


def _video_dims(n: int) -> tuple[int, int, int]:
    """Deterministic (width, height, n_frames) for a synthesized video
    of an ``n``-byte document — small enough that the per-doc pixel
    walk stays SQL-expressible at gate scale."""
    return n % 8 + 1, (n // 8) % 8 + 1, n % 5 + 2


class AviEncoder:
    """Actor-pool video encode stage: each document's text bytes become
    a deterministic uncompressed 24-bit AVI (dimensions and frame count
    from n_bytes; frame ``k``'s flat pixel ``i`` is byte ``(i+k) % n``,
    so every frame is a distinct rotation of the byte stream). Per-row
    loop is inherent to a codec; the DIB packing inside is numpy."""

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].to_numpy(zero_copy_only=False)
        payloads = []
        for s in texts:
            b = np.frombuffer(("" if s is None else s).encode(), np.uint8)
            n = b.size
            w, h, f = _video_dims(n)
            if n == 0:
                frames = np.zeros((f, h, w, 3), np.uint8)
            else:
                i = np.arange(w * h * 3, dtype=np.int64)
                k = np.arange(f, dtype=np.int64)[:, None]
                frames = b[(i[None, :] + k) % n].reshape(f, h, w, 3)
            payloads.append(encode_avi(frames, fps=_VID_FPS))
        return pa.table(
            {"doc_id": t["doc_id"],
             "payload": pa.array(payloads, pa.large_binary())}
        )


class VideoStatsExtractor:
    """Actor-pool REAL video-decode stage: every payload goes through
    the actual RIFF/AVI parser (``functions/avi.py`` — header walk, DIB
    unpadding, bottom-up flip, BGR->RGB) and out comes one row per
    SAMPLED frame (every ``_VID_EVERY``-th) with its pixel sum — the
    decode + frame-sample work a 100 TB video pipeline pays before any
    model sees a frame. Batches stay small: decoded frames, not the
    compressed payloads, are the memory hot spot."""

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_numpy(zero_copy_only=False)
        doc_ids = t["doc_id"].to_numpy()
        out = {"doc_id": [], "frame_idx": [], "width": [], "height": [],
               "n_frames": [], "fps": [], "px_sum": []}
        for d, p in zip(doc_ids, payloads):
            frames, fps = decode_avi(bytes(p))
            n, h, w, _ = frames.shape
            kept = np.arange(0, n, _VID_EVERY, dtype=np.int64)
            sums = frames[kept].reshape(kept.size, -1).astype(np.int64).sum(axis=1)
            out["doc_id"].extend([int(d)] * kept.size)
            out["frame_idx"].extend(kept.tolist())
            out["width"].extend([w] * kept.size)
            out["height"].extend([h] * kept.size)
            out["n_frames"].extend([n] * kept.size)
            out["fps"].extend([fps] * kept.size)
            out["px_sum"].extend(sums.tolist())
        return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})


def video_stats(sf_dir: str):
    """End-to-end REAL video codec round trip inside Ray: text bytes ->
    deterministic uncompressed AVI (encode actor pool) -> per-sampled-
    frame pixel statistics (decode actor pool). Aux entry WITH a full
    oracle: the synthesized pixels are a pure function of the text
    bytes (frame k pixel i = byte (i+k) mod n), so the sampled frames'
    pixel sums are SQL-expressible over the byte stream — fine at gate
    scale, the Ray side is the one built for volume."""
    ds = read_parquet_light(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    encoded = ds.map_batches(
        AviEncoder, batch_format="pyarrow", batch_size=64, concurrency=(1, 4)
    )
    return encoded.map_batches(
        VideoStatsExtractor, batch_format="pyarrow", batch_size=64,
        concurrency=(1, 4),
    )


# The AVI round trip is exactly recoverable in SQL: frame k's flat
# pixel i equals byte (i+k) mod n of the UTF-8 stream, dimensions and
# frame count are fixed functions of n, and the sampler keeps every
# _VID_EVERY-th frame. DuckDB walks the sampled frames' pixels with
# two LATERAL ranges (<= ~600 byte lookups per doc at these dims).
SQL_VIDEO_STATS = f"""
WITH b AS (
    SELECT doc_id, hex(CAST(coalesce(text, '') AS BLOB)) AS hx,
           octet_length(CAST(coalesce(text, '') AS BLOB)) AS n
    FROM documents
),
dims AS (
    SELECT doc_id, hx, n,
           n % 8 + 1 AS w, (n // 8) % 8 + 1 AS h, n % 5 + 2 AS f
    FROM b
),
fr AS (
    SELECT d.*, k.k AS frame_idx
    FROM dims d, LATERAL (SELECT unnest(range(0, d.f, {_VID_EVERY})) AS k) k
),
px AS (
    SELECT fr.doc_id, fr.frame_idx,
           SUM(CASE WHEN fr.n = 0 THEN 0
               ELSE ('0x' || substring(fr.hx,
                        CAST(((i.i + fr.frame_idx) % fr.n) * 2 + 1 AS INTEGER),
                        2))::INTEGER END) AS px_sum
    FROM fr, LATERAL (SELECT unnest(range(0, fr.w * fr.h * 3)) AS i) i
    GROUP BY fr.doc_id, fr.frame_idx
)
SELECT fr.doc_id,
       CAST(fr.frame_idx AS BIGINT) AS frame_idx,
       CAST(fr.w AS BIGINT) AS width,
       CAST(fr.h AS BIGINT) AS height,
       CAST(fr.f AS BIGINT) AS n_frames,
       CAST({_VID_FPS} AS BIGINT) AS fps,
       CAST(px.px_sum AS BIGINT) AS px_sum
FROM fr JOIN px USING (doc_id, frame_idx)
"""


RAY_QUERIES = {
    "multimodal_features": multimodal_features,
    "frame_sample": frame_sample,
}

# rows-only aux entry: real PNG encode->decode round trip (the decode
# is not SQL-expressible; pytest pins pixel stats against numpy).
# audio_stats carries a full oracle — see SQL_AUDIO_STATS.
RAY_QUERIES_AUX = {
    "image_stats": image_stats,
    "audio_stats": audio_stats,
    "video_stats": video_stats,
}

ORACLE_SQL_AUX = {
    "audio_stats": SQL_AUDIO_STATS,
    "video_stats": SQL_VIDEO_STATS,
}

ORACLE_SQL = {
    "multimodal_features": SQL_MULTIMODAL_FEATURES,
    "frame_sample": SQL_FRAME_SAMPLE,
}
