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
