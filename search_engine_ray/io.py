"""Parquet read helper shared by every pipeline.

``read_parquet_clean`` is ``ray.data.read_parquet`` with the schema's
key/value metadata stripped (and pruned to the requested columns).
Parquet written through pandas/pyarrow carries a ``b'pandas'`` schema
metadata blob; Ray Data's block-schema deduplication tries to
``hash()`` schemas and logs a noisy
"Failed to hash the schemas (for deduplication)" warning per block
when metadata is present. Supplying an explicit metadata-free schema
keeps the read zero-copy, prunes columns at the scan, and makes block
schemas hashable.
"""

from __future__ import annotations

import glob as _glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def _first_file(path) -> str:
    if isinstance(path, (list, tuple)):
        return _first_file(path[0])
    if os.path.isdir(path):
        hits = sorted(
            _glob.glob(os.path.join(path, "*.parquet"))
            or _glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        )
        if hits:
            return hits[0]
    return path


def clean_schema(path, columns=None) -> pa.Schema:
    full = pq.read_schema(_first_file(path)).remove_metadata()
    if columns is None:
        return full
    return pa.schema([full.field(c) for c in columns])


def read_parquet_clean(path, columns=None, **kwargs) -> "ray.data.Dataset":
    return ray.data.read_parquet(
        path, columns=columns, schema=clean_schema(path, columns), **kwargs
    )


def docs_path(source: str) -> str:
    """Resolve a documents-table source: an sf-style directory
    (containing ``documents.parquet``), a direct ``.parquet`` file, or
    a directory of parquet shards. Lets the gate ops and the ``prep``
    CLI share one reader contract."""
    cand = os.path.join(source, "documents.parquet")
    if not source.endswith(".parquet") and os.path.exists(cand):
        return cand
    return source


_SMALL_BLOCK_TARGET = 4 << 20  # 4 MiB of parquet per block for light ops


def _total_bytes(path) -> int | None:
    if isinstance(path, (list, tuple)):
        sizes = [_total_bytes(p) for p in path]
        return None if any(s is None for s in sizes) else sum(sizes)
    if os.path.isdir(path):
        hits = _glob.glob(os.path.join(path, "*.parquet")) or _glob.glob(
            os.path.join(path, "**", "*.parquet"), recursive=True
        )
        return sum(os.path.getsize(h) for h in hits) if hits else None
    return os.path.getsize(path) if os.path.exists(path) else None


def small_input_blocks(path) -> int | None:
    """Block-count override for reads feeding LIGHT per-row work
    (hashing, banding, matmul-per-batch): Ray's read fan-out is sized
    by CPU count (~2 blocks/CPU) regardless of input size, so a few-MB
    table becomes 64 tiny blocks and every downstream groupby/sort pays
    64+ task launches of pure scheduling latency (measured 25 s -> 8 s
    on dedup_minhash_lsh at sf0.1 by coalescing to 8 blocks). Returns
    ceil(bytes / 4 MiB) clamped to [max(2, cpus/4), 2*cpus], or None
    (keep Ray's default) when the input is large enough — > 128 MiB per
    CPU — that the default heuristics are the right ones. Block count
    never affects op RESULTS, only task granularity."""
    total = _total_bytes(path)
    if total is None:
        return None
    cpus = int(ray.cluster_resources().get("CPU", 8))
    if total > 2 * cpus * (64 << 20):
        return None
    want = -(-total // _SMALL_BLOCK_TARGET)
    return int(min(2 * cpus, max(2, cpus // 4, want)))


def read_parquet_light(path, columns=None) -> "ray.data.Dataset":
    """Pruned read with the size-aware block count — the ONE place the
    light-work read policy lives (see small_input_blocks); op modules
    alias this instead of re-inlining the incantation."""
    return read_parquet_clean(
        path, columns=columns, override_num_blocks=small_input_blocks(path)
    )


def parquet_rows(path) -> int | None:
    """Exact row count from parquet footers only (no data read, no Ray
    execution) — the free ``rows_hint`` source for reductions whose
    input is one-row-per-source-row (content hashes, doc keys). Returns
    None when the source isn't resolvable to parquet files."""
    import pyarrow.parquet as pq

    if isinstance(path, (list, tuple)):
        subs = [parquet_rows(p) for p in path]
        return None if any(s is None for s in subs) else sum(subs)
    if os.path.isdir(path):
        hits = _glob.glob(os.path.join(path, "*.parquet")) or _glob.glob(
            os.path.join(path, "**", "*.parquet"), recursive=True
        )
        return sum(pq.read_metadata(h).num_rows for h in hits) if hits else None
    if os.path.exists(path):
        try:
            return pq.read_metadata(path).num_rows
        except Exception:  # noqa: BLE001 - not a parquet file
            return None
    return None


def empty_dataset(schema: pa.Schema) -> "ray.data.Dataset":
    """A one-empty-block dataset with an explicit schema — the typed
    empty result ops return when a guard detects there is nothing to
    compute. (A dataset whose last op produced zero blocks loses its
    schema in Ray 2.49, so ops must construct empties explicitly.)"""
    return ray.data.from_arrow(schema.empty_table())


def join_np(n_small: int, want: int) -> int:
    """Partition count for ``Dataset.join`` given the smaller side's
    row count. Ray 2.49's hash-shuffle join crashes when a partition
    receives zero blocks from one side (``JoinAggregator.finalize``
    rebuilds it as a 0-column table and pyarrow rejects the key
    FieldRef), so a side must be large enough that every partition
    statistically sees rows: cap the partition count at
    ``n_small // 32`` (graceful, not a cliff to 1 — collapsing a join
    whose OTHER side is corpus-sized into one partition would
    serialize it and concentrate the big side's bytes in one task).
    Callers guard the truly-empty case separately (the op early-exits
    with ``empty_dataset`` before any join). The row-count heuristic
    assumes high-cardinality join keys — true for every call site here
    (content hashes, shingles, terms, doc ids)."""
    return max(1, min(want, n_small // 32))


def collect_sorted_i64(ds, col: str) -> "np.ndarray":
    """Materialize one int64 column of a (small, size-gated by the
    caller) dataset into a sorted numpy array — the broadcast side of a
    zero-shuffle membership probe."""
    import numpy as np

    parts = [b[col].to_numpy() for b in ds.iter_batches(batch_format="pyarrow")]
    return np.sort(np.concatenate(parts or [np.empty(0, np.int64)]))


def sorted_member(keys: "np.ndarray", probes: "np.ndarray") -> "np.ndarray":
    """Vectorized exact membership of ``probes`` in the SORTED int64
    ``keys`` (searchsorted + equality check) — the probe side of the
    broadcast-instead-of-shuffle-join pattern."""
    import numpy as np

    if len(keys) == 0:
        return np.zeros(len(probes), dtype=bool)
    pos = np.searchsorted(keys, probes)
    return (pos < len(keys)) & (keys[np.minimum(pos, len(keys) - 1)] == probes)
