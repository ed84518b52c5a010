"""Stable dense doc_id assignment.

Normative semantics (SURVEY.md §7.0): doc_id = rank of
``(conv_id, turn_idx)`` under ascending sort — deterministic across
runs and parallelism levels. Replaces the reference's SHA-1 row keys
(`/root/reference/src/cis5550/tools/Hasher.java:27-38`) with dense
int64 ids suitable for delta-gap compression.

Two paths (SURVEY.md §7.2 step 3):

- **Prefix-sum fast path** (``assign_doc_ids_files``): when the input
  files are already globally (conv_id, turn_idx)-ordered — the common
  shape for exported transcripts — doc_id is ``file_row_offset +
  row_index``: an embarrassingly parallel task per file with NO
  all-to-all. Applicability is decided up front by a cheap distributed
  scan of just the two key columns (order check per file + boundary
  check across files).
- **Sort path** (``assign_doc_ids``): distributed ``Dataset.sort``
  (the one unavoidable all-to-all) followed by a per-block prefix-sum
  zip of block row counts.

Both paths also compute ``doclen`` (non-empty token count) in the same
pass so the doc-stats sink needs no second tokenization scan.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..config import PARQUET_ARGS, IndexConfig
from ..functions.analysis import count_tokens_arrow


@ray.remote
def _nrows(table: pa.Table) -> int:
    return table.num_rows


@ray.remote
def _add_ids(table: pa.Table, offset: int, cfg: IndexConfig, compute_doclen: bool) -> pa.Table:
    return _add_ids_local(table, offset, cfg, compute_doclen)


@ray.remote
def _file_order_info(path: str) -> dict:
    """(rows, first/last key, is-sorted) of one file — reads only the
    two key columns."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["conv_id", "turn_idx"])
    n = t.num_rows
    if n == 0:
        return {"rows": 0, "first": None, "last": None, "sorted": True}
    conv = t["conv_id"].combine_chunks()
    turn = t["turn_idx"].combine_chunks()
    if conv.null_count or turn.null_count:
        # null keys defeat the pairwise check below (pc.all skips
        # null comparisons -> a misordered file would read as sorted)
        # and a null boundary key would TypeError in the cross-file
        # compare; declare unsorted so the sort fallback owns the order
        return {"rows": n, "first": None, "last": None, "sorted": False}
    c0, c1 = conv.slice(0, n - 1), conv.slice(1)
    t0, t1 = turn.slice(0, n - 1), turn.slice(1)
    lex_ok = pc.all(
        pc.or_(
            pc.greater(c1, c0),
            pc.and_(pc.equal(c1, c0), pc.greater_equal(t1, t0)),
        )
    ).as_py()
    return {
        "rows": n,
        "first": (conv[0].as_py(), turn[0].as_py()),
        "last": (conv[n - 1].as_py(), turn[n - 1].as_py()),
        "sorted": bool(lex_ok if lex_ok is not None else True),
    }


@ray.remote
def _file_with_ids(path: str, offset: int, cfg: IndexConfig, compute_doclen: bool) -> pa.Table:
    import pyarrow.parquet as pq

    return _add_ids_local(pq.read_table(path), offset, cfg, compute_doclen)


def _add_ids_local(table: pa.Table, offset: int, cfg: IndexConfig, compute_doclen: bool) -> pa.Table:
    doc_id = pa.array(offset + np.arange(table.num_rows, dtype=np.int64), pa.int64())
    out = table.append_column("doc_id", doc_id)
    if compute_doclen:
        # count-only kernel: stage A needs just doclen, never the
        # tokens — the full split here doubled build tokenization cost
        doclens = count_tokens_arrow(table["text"].combine_chunks(), cfg)
        out = out.append_column("doclen", pa.array(doclens, pa.int32()))
    return out


def _ordered_offsets(files: list[str], offset: int) -> "np.ndarray | None":
    """Per-file doc_id offsets when the files are globally
    (conv_id, turn_idx)-ordered, else None (cheap distributed scan of
    just the two key columns)."""
    infos = ray.get([_file_order_info.remote(f) for f in files])
    prev_last = None
    for info in infos:
        if not info["sorted"]:
            return None
        if info["rows"] == 0:
            continue
        if prev_last is not None and info["first"] < prev_last:
            return None
        prev_last = info["last"]
    rows = np.asarray([i["rows"] for i in infos], dtype=np.int64)
    offsets = offset + np.concatenate([[0], np.cumsum(rows)[:-1]])
    # zero-row files keep a placeholder offset; callers skip them
    return np.where(rows > 0, offsets, -1)


def assign_doc_ids_files(
    files: list[str],
    cfg: IndexConfig | None = None,
    compute_doclen: bool = True,
    offset: int = 0,
) -> "ray.data.Dataset | None":
    """Prefix-sum fast path over already-ordered files; returns None
    when the input is not globally ordered (caller falls back to the
    sort path). ``offset`` shifts all assigned ids (used by
    ``extend_index`` to continue at the existing N)."""
    cfg = cfg or IndexConfig()
    if not files:
        return None
    offsets = _ordered_offsets(files, offset)
    if offsets is None:
        return None
    refs = [
        _file_with_ids.remote(f, int(off), cfg, compute_doclen)
        for f, off in zip(files, offsets)
        if off >= 0
    ]
    if not refs:
        return None
    return ray.data.from_arrow_refs(refs)


@ray.remote
def _file_write_ids(
    path: str, out_path: str, offset: int, cfg: IndexConfig, compute_doclen: bool
) -> tuple[int, int]:
    import pyarrow.parquet as pq

    t = _add_ids_local(pq.read_table(path), offset, cfg, compute_doclen)
    pq.write_table(t, out_path, **PARQUET_ARGS)
    sum_dl = (
        int(np.sum(t["doclen"].to_numpy(), dtype=np.int64)) if compute_doclen else 0
    )
    return t.num_rows, sum_dl


def assign_doc_ids_files_to(
    files: list[str],
    out_dir: str,
    cfg: IndexConfig | None = None,
    compute_doclen: bool = True,
    offset: int = 0,
) -> "tuple[int, int] | None":
    """Prefix-sum fast path that WRITES the docs store directly from
    each file task and returns ``(n_docs, sum_doclen)`` — no
    table ever transits the object store and no second pass re-reads
    the output to count it. At 24M turns the dataset-shaped variant
    pinned ~7 GB of result tables (forcing spill under a capped store)
    and then re-read every written file for its stats; this shape is
    file -> file, embarrassingly parallel, O(1) driver memory. Returns
    None when the input is not globally ordered (caller falls back to
    the sort path)."""
    import os

    cfg = cfg or IndexConfig()
    if not files:
        return None
    offsets = _ordered_offsets(files, offset)
    if offsets is None:
        return None
    refs = [
        _file_write_ids.remote(
            f, os.path.join(out_dir, f"docs-{i:05d}.parquet"),
            int(off), cfg, compute_doclen,
        )
        for i, (f, off) in enumerate(zip(files, offsets))
        if off >= 0
    ]
    if not refs:
        return None
    results = ray.get(refs)
    return (
        int(sum(r[0] for r in results)),
        int(sum(r[1] for r in results)),
    )


def assign_doc_ids(
    ds: "ray.data.Dataset",
    cfg: IndexConfig | None = None,
    compute_doclen: bool = True,
    offset: int = 0,
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
    offsets = offset + np.concatenate([[0], np.cumsum(counts)[:-1]])
    new_refs = [
        _add_ids.remote(r, int(off), cfg, compute_doclen)
        for r, off in zip(refs, offsets)
    ]
    return ray.data.from_arrow_refs(new_refs)
