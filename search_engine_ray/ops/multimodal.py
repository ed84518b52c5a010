"""Multimodal (binary-payload) stages — real Ray plumbing, stubbed codecs.

Large-scale training-data pipelines treat image/audio/video as opaque
``binary`` columns with typed metadata; the decode / feature-extract /
frame-sample stages are stateful actor-pool ``map_batches`` stages with
SMALL batch sizes (a batch x concurrency of multi-MB payloads must fit
a worker heap). The image/audio libraries are not in this container, so
the codec itself is STUBBED: ``MediaFeatureExtractor`` probes for PIL
in ``__init__`` (once per actor — where a real model/codec load
belongs) and, absent it, uses a deterministic fake decoder so the
schema, actor signature, batching and output layout are real and
gate-checked. The driver tables carry no binary column, so payloads
are derived deterministically from ``documents.text`` (UTF-8 bytes;
``CAST(text AS BLOB)`` on the oracle side).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

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


def decode_image(payload: bytes):
    """Real decode path — requires an image library this container
    doesn't ship. The pipeline never calls it unless PIL is present."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv (not available in this "
        "environment); MediaFeatureExtractor falls back to the "
        "deterministic fake decoder"
    )


class MediaFeatureExtractor:
    """Actor-pool stage: codec probe/load once per actor in __init__,
    vectorized feature extraction per batch in __call__. If a real
    codec is importable but its decode path is not implemented, the
    stage logs once and falls back to the deterministic fake decoder
    instead of failing the pipeline."""

    def __init__(self):
        try:  # pragma: no cover - PIL absent in this container
            import PIL  # noqa: F401

            self.real = True
        except ImportError:
            self.real = False
        self._warned = False

    def __call__(self, t: pa.Table) -> pa.Table:
        payload = t["payload"].combine_chunks()
        n_bytes = pc.cast(pc.binary_length(payload), pa.int64())
        if self.real and not self._warned:  # pragma: no cover
            import logging

            logging.getLogger(__name__).warning(
                "real image decode path not implemented; using the "
                "deterministic fake decoder"
            )
            self._warned = True
        # deterministic fake "decode": dimensions derived from size,
        # header = first 8 bytes hex (what a real magic-number sniff reads)
        nb = n_bytes.to_numpy()
        width = nb % 512
        height = (nb // 512) % 512
        # vectorized: slice the 8-byte head with an Arrow kernel, then
        # hex-encode the fixed-width buffers via numpy (no per-row
        # as_py() materialization in the hot stage)
        heads = pc.binary_slice(payload, 0, 8)
        head_np = heads.to_numpy(zero_copy_only=False)
        head_hex = [None if v is None else v.hex().upper() for v in head_np]
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


RAY_QUERIES = {
    "multimodal_features": multimodal_features,
    "frame_sample": frame_sample,
}

ORACLE_SQL = {
    "multimodal_features": SQL_MULTIMODAL_FEATURES,
    "frame_sample": SQL_FRAME_SAMPLE,
}
