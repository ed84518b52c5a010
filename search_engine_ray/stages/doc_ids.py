"""Stable dense doc_id assignment.

Normative semantics (SURVEY.md §7.0): doc_id = rank of
``(conv_id, turn_idx)`` under ascending sort — deterministic across
runs and parallelism levels. Replaces the reference's SHA-1 row keys
(`/root/reference/src/cis5550/tools/Hasher.java:27-38`) with dense
int64 ids suitable for delta-gap compression.

Implementation: distributed ``Dataset.sort`` (the one unavoidable
all-to-all of the build), then a per-block prefix-sum zip: block row
counts -> driver-side cumulative offsets (one int per block — tiny) ->
a task per block adds ``doc_id = offset + arange``. The per-block tasks
also compute ``doclen`` (non-empty token count) in the same pass so the
doc-stats sink needs no second tokenization scan.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..config import IndexConfig
from ..functions.analysis import split_tokens


@ray.remote
def _nrows(table: pa.Table) -> int:
    return table.num_rows


@ray.remote
def _add_ids(table: pa.Table, offset: int, cfg: IndexConfig, compute_doclen: bool) -> pa.Table:
    doc_id = pa.array(offset + np.arange(table.num_rows, dtype=np.int64), pa.int64())
    out = table.append_column("doc_id", doc_id)
    if compute_doclen:
        *_, doclens = split_tokens(table["text"].combine_chunks(), cfg)
        out = out.append_column("doclen", pa.array(doclens, pa.int32()))
    return out


def assign_doc_ids(
    ds: "ray.data.Dataset",
    cfg: IndexConfig | None = None,
    compute_doclen: bool = True,
) -> "ray.data.Dataset":
    """Sort by (conv_id, turn_idx) and attach dense ``doc_id`` (and
    ``doclen``). Returns a dataset over materialized blocks — consuming
    it repeatedly does not recompute the sort or the doclens."""
    cfg = cfg or IndexConfig()
    sorted_ds = ds.sort(["conv_id", "turn_idx"])
    refs = sorted_ds.to_arrow_refs()
    if not refs:
        return sorted_ds
    counts = ray.get([_nrows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    new_refs = [
        _add_ids.remote(r, int(off), cfg, compute_doclen)
        for r, off in zip(refs, offsets)
    ]
    return ray.data.from_arrow_refs(new_refs)
