"""End-to-end index build: transcripts -> docs store + posting segments.

Layout of an index directory::

    <index_dir>/
      docs/                  doc-id-assigned transcript turns + doclen
        _MANIFEST.json       { N, avgdl, fingerprint, ... }
        *.parquet            (conv_id, turn_idx, role, tool, ts, text, doc_id, doclen)
      segments/
        part=K/              one doc-range partition of the build
          _MANIFEST.json     lineage: input files, rows, segments, seconds
          *.parquet          SEGMENT_SCHEMA rows
      dictionary/            term -> global df, n_segments, max_tf
        _MANIFEST.json
        *.parquet
      meta.json              config, N, avgdl, stage timings

Resumability: each stage / partition commits atomically via
``state.checkpoint.atomic_dir`` (write temp dir -> fsync manifest ->
rename) and is skipped on re-run when its manifest is present with a
matching input fingerprint. Partitions are doc-range slices of the
docs store, so a resumed build never re-reads finished partitions —
partitioned output, never one giant file. Mirrors (and upgrades) the
reference's incremental-skip behavior
(`/root/reference/src/cis5550/jobs/Indexer.java:196-231`).
"""

from __future__ import annotations

import glob as _glob
import hashlib
import json
import os
import time

import numpy as np
import ray
import ray.data

from ..config import IndexConfig
from ..stages.doc_ids import assign_doc_ids
from ..stages.index_build import PartialIndexBuilder
from ..stages.merge import merge_partials
from ..state.checkpoint import atomic_dir, is_complete, read_manifest


class BuildAborted(RuntimeError):
    """Raised by the stop_after_partition test hook (simulated kill)."""


def _expand(source) -> list[str]:
    paths = [source] if isinstance(source, str) else list(source)
    out: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            out.extend(sorted(_glob.glob(os.path.join(p, "*.parquet"))))
        elif any(ch in p for ch in "*?["):
            out.extend(sorted(_glob.glob(p)))
        else:
            out.append(p)
    return out


def _fingerprint(items) -> str:
    h = hashlib.sha1()
    if isinstance(items, str):
        h.update(items.encode())
    else:
        for p in sorted(items):
            st = os.stat(p)
            h.update(f"{p}:{st.st_size}".encode())
    return h.hexdigest()


def build_index(
    source,
    index_dir: str,
    cfg: IndexConfig | None = None,
    n_partitions: int = 4,
    stop_after_partition: int | None = None,
    concurrency=None,
) -> dict:
    """Build (or resume building) an index; returns the meta dict.

    ``source``: parquet path / glob / list of paths, or a
    ray.data.Dataset of transcript turns. ``stop_after_partition``:
    test hook that aborts after N segment partitions (simulated kill
    for the resume test).
    """
    cfg = cfg or IndexConfig()
    os.makedirs(index_dir, exist_ok=True)
    timings: dict[str, float] = {}

    # ---- stage A: doc-id assignment -> docs store ----
    docs_dir = os.path.join(index_dir, "docs")
    if isinstance(source, (str, list)):
        fp = _fingerprint(_expand(source))
    else:
        fp = _fingerprint(f"dataset:{source.count()}")
    if not is_complete(docs_dir, fp):
        t0 = time.monotonic()
        ds = ray.data.read_parquet(_expand(source)) if isinstance(source, (str, list)) else source
        with atomic_dir(docs_dir, fp, stage="docs") as ck:
            ids = assign_doc_ids(ds, cfg)
            ids.write_parquet(ck.tmp)
            n_docs = int(ids.count() or 0)
            sum_dl = int(ids.sum("doclen") or 0) if n_docs else 0
            ck.commit(N=n_docs, sum_doclen=sum_dl)
        timings["docs"] = round(time.monotonic() - t0, 3)

    docs_manifest = read_manifest(docs_dir)
    N = docs_manifest["N"]
    avgdl = (docs_manifest["sum_doclen"] / N) if N else 0.0
    docs_files = sorted(_glob.glob(os.path.join(docs_dir, "*.parquet")))

    # ---- stage B: per-partition build + merge -> segments ----
    seg_root = os.path.join(index_dir, "segments")
    os.makedirs(seg_root, exist_ok=True)
    groups = [list(g) for g in np.array_split(docs_files, min(n_partitions, max(1, len(docs_files)))) if len(g)]
    import shutil

    for stale in _glob.glob(os.path.join(seg_root, "*.tmp")):
        shutil.rmtree(stale, ignore_errors=True)
    for d in _glob.glob(os.path.join(seg_root, "part=*")):
        try:
            k = int(os.path.basename(d).split("=")[1])
        except (IndexError, ValueError):
            k = -1
        if k < 0 or k >= len(groups):
            shutil.rmtree(d, ignore_errors=True)
    seg_fps = []
    for k, files in enumerate(groups):
        part_dir = os.path.join(seg_root, f"part={k:05d}")
        part_fp = _fingerprint(list(files))
        seg_fps.append(part_fp)
        if is_complete(part_dir, part_fp):
            continue
        if stop_after_partition is not None and k >= stop_after_partition:
            raise BuildAborted(f"aborted before partition {k} (test hook)")
        t0 = time.monotonic()
        if concurrency is None:
            ncpu = int(ray.cluster_resources().get("CPU", 4))
            concurrency = (1, max(1, ncpu))
        part_ds = ray.data.read_parquet(files, columns=["doc_id", "doclen", "text", "role", "tool"])
        partials = part_ds.map_batches(
            PartialIndexBuilder,
            fn_constructor_kwargs={"cfg": cfg},
            batch_format="pyarrow",
            batch_size=None,
            concurrency=concurrency,
        )
        merged = merge_partials(partials, cfg)
        with atomic_dir(
            part_dir, part_fp, stage="segments", inputs=[os.path.basename(f) for f in files]
        ) as ck:
            merged.write_parquet(ck.tmp)
            n_segments = sum(_pq_rows(f) for f in _glob.glob(os.path.join(ck.tmp, "*.parquet")))
            ck.commit(n_segments=int(n_segments))
        timings[f"segments[{k}]"] = round(time.monotonic() - t0, 3)

    # ---- stage C: dictionary (global term stats) ----
    dict_dir = os.path.join(index_dir, "dictionary")
    dict_fp = _fingerprint("|".join(seg_fps))
    if not is_complete(dict_dir, dict_fp):
        t0 = time.monotonic()
        from ray.data.aggregate import Sum, Max, Count

        seg_ds = ray.data.read_parquet(
            os.path.join(index_dir, "segments"),
            columns=["term", "df", "max_tf"],
        )
        dictionary = seg_ds.groupby("term").aggregate(
            Sum("df", alias_name="df"),
            Max("max_tf", alias_name="max_tf"),
            Count(alias_name="n_segments"),
        )
        with atomic_dir(dict_dir, dict_fp, stage="dictionary") as ck:
            dictionary.write_parquet(ck.tmp)
            ck.commit()
        timings["dictionary"] = round(time.monotonic() - t0, 3)

    meta = {
        "N": N,
        "avgdl": avgdl,
        "config": cfg.to_json(),
        "n_partitions": len(groups),
        "timings": timings,
    }
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


def _pq_rows(path: str) -> int:
    import pyarrow.parquet as pq

    return pq.read_metadata(path).num_rows
