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
from ..stages.doc_ids import assign_doc_ids, assign_doc_ids_files
from ..stages.index_build import PartialIndexBuilder, build_partials_task
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


# Bump when the on-disk index layout or segment schema changes — part of
# every stage fingerprint, so resume never trusts stale-format output.
FORMAT_VERSION = 2


def _fingerprint(items, cfg: IndexConfig | None = None) -> str:
    h = hashlib.sha1()
    h.update(f"fmt{FORMAT_VERSION}:".encode())
    if cfg is not None:
        h.update(json.dumps(cfg.to_json(), sort_keys=True).encode())
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
    builder: str = "tasks",
) -> dict:
    """Build (or resume building) an index; returns the meta dict.

    ``source``: parquet path / glob / list of paths, or a
    ray.data.Dataset of transcript turns. ``stop_after_partition``:
    test hook that aborts after N segment partitions (simulated kill
    for the resume test). ``builder``: "tasks" (default; stemmer cache
    as worker global, reuses prestarted workers) or "actors"
    (PartialIndexBuilder pool, for heavy per-worker state).
    """
    cfg = cfg or IndexConfig()
    os.makedirs(index_dir, exist_ok=True)
    timings: dict[str, float] = {}

    # ---- stage A: doc-id assignment -> docs store ----
    docs_dir = os.path.join(index_dir, "docs")
    if isinstance(source, (str, list)):
        fp = _fingerprint(_expand(source), cfg)
    else:
        fp = _fingerprint(f"dataset:{source.count()}", cfg)
    if not is_complete(docs_dir, fp):
        t0 = time.monotonic()
        ids = None
        if isinstance(source, (str, list)):
            # prefix-sum fast path: no all-to-all when files are already
            # (conv_id, turn_idx)-ordered (SURVEY.md §7.2 step 3)
            ids = assign_doc_ids_files(_expand(source), cfg)
            if ids is not None:
                timings["docs_path"] = "prefix_sum"
        with atomic_dir(docs_dir, fp, stage="docs") as ck:
            if ids is None:
                timings["docs_path"] = "sort"
                ds = (
                    ray.data.read_parquet(_expand(source))
                    if isinstance(source, (str, list))
                    else source
                )
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

    # ---- stage B: wave build of incomplete partitions -> segments ----
    # All incomplete doc-range partitions are built by ONE pipeline (one
    # actor pool, one term-keyed merge shuffle) and then committed
    # per-partition — sequential per-partition pipelines pay actor-pool
    # startup + shuffle setup once per partition and scale negatively.
    # At cluster scale, cap a wave with ``partitions_per_wave`` so a
    # mid-wave failure bounds the redone work.
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

    part_bounds = _part_first_docs(groups)
    seg_fps = [_fingerprint(list(files), cfg) for files in groups]
    todo = [
        k for k in range(len(groups))
        if not is_complete(os.path.join(seg_root, f"part={k:05d}"), seg_fps[k])
    ]
    aborting = False
    if stop_after_partition is not None and any(k >= stop_after_partition for k in todo):
        aborting = True
        todo = [k for k in todo if k < stop_after_partition]

    if todo:
        t0 = time.monotonic()
        files = [f for k in todo for f in groups[k]]
        wave_ds = ray.data.read_parquet(files, columns=["doc_id", "doclen", "text", "role", "tool"])
        if builder == "actors":
            if concurrency is None:
                ncpu = int(ray.cluster_resources().get("CPU", 4))
                concurrency = (1, max(1, ncpu))
            partials = wave_ds.map_batches(
                PartialIndexBuilder,
                fn_constructor_kwargs={"cfg": cfg, "part_bounds": part_bounds},
                batch_format="pyarrow",
                batch_size=None,
                concurrency=concurrency,
            )
        else:
            partials = wave_ds.map_batches(
                build_partials_task,
                fn_kwargs={"cfg": cfg, "part_bounds": part_bounds},
                batch_format="pyarrow",
                batch_size=None,
            )
        merged = merge_partials(partials, cfg)
        wave_tmp = os.path.join(seg_root, "_wave.tmp")
        shutil.rmtree(wave_tmp, ignore_errors=True)
        merged.write_parquet(wave_tmp, partition_cols=["part"])
        wave_s = round(time.monotonic() - t0, 3)
        for k in todo:
            src = os.path.join(wave_tmp, f"part={k}")
            os.makedirs(src, exist_ok=True)  # partition with zero postings
            n_segments = sum(_pq_rows(f) for f in _glob.glob(os.path.join(src, "*.parquet")))
            manifest = {
                "fingerprint": seg_fps[k],
                "stage": "segments",
                "inputs": [os.path.basename(f) for f in groups[k]],
                "n_segments": int(n_segments),
                "seconds": wave_s,
                "wave": todo,
            }
            mpath = os.path.join(src, "_MANIFEST.json")
            with open(mpath, "w") as mf:
                json.dump(manifest, mf, indent=1)
                mf.flush()
                os.fsync(mf.fileno())
            final = os.path.join(seg_root, f"part={k:05d}")
            if os.path.exists(final):
                shutil.rmtree(final)
            os.rename(src, final)
        shutil.rmtree(wave_tmp, ignore_errors=True)
        timings["segments_wave"] = wave_s
        timings["segments_parts"] = len(todo)
    if aborting:
        raise BuildAborted(
            f"aborted before partition {stop_after_partition} (test hook)"
        )

    # ---- stage C: dictionary (global term stats) ----
    dict_dir = os.path.join(index_dir, "dictionary")
    dict_fp = _fingerprint("|".join(seg_fps), cfg)
    if not is_complete(dict_dir, dict_fp):
        t0 = time.monotonic()
        seg_files = _glob.glob(os.path.join(index_dir, "segments", "part=*", "*.parquet"))
        seg_bytes = sum(os.path.getsize(f) for f in seg_files)
        if seg_bytes <= 128 * 1024 * 1024:
            # small index: one driver-side Arrow group_by beats a whole
            # distributed job (a groupby job's fixed cost is seconds)
            import pyarrow.parquet as _pq

            seg_t = _pq.read_table(seg_files, columns=["term", "df", "max_tf"]) if seg_files else None
            if seg_t is None or seg_t.num_rows == 0:
                import pyarrow as _pa

                dict_t = _pa.table(
                    {"term": _pa.array([], _pa.string()),
                     "df": _pa.array([], _pa.int64()),
                     "max_tf": _pa.array([], _pa.int32()),
                     "n_segments": _pa.array([], _pa.int64())}
                )
            else:
                agg = seg_t.group_by("term").aggregate(
                    [("df", "sum"), ("max_tf", "max"), ("df", "count")]
                )
                dict_t = agg.rename_columns(["term", "df", "max_tf", "n_segments"])
            with atomic_dir(dict_dir, dict_fp, stage="dictionary") as ck:
                import pyarrow.parquet as _pq2

                _pq2.write_table(dict_t, os.path.join(ck.tmp, "dictionary.parquet"))
                ck.commit()
        else:
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


def _file_doc_range(path: str) -> tuple[int, int]:
    """(min, max) doc_id of one docs file, from parquet row-group stats
    (metadata-only; falls back to a column read when stats are absent)."""
    import pyarrow.parquet as pq

    md = pq.read_metadata(path)
    mn, mx = None, None
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for c in range(row_group.num_columns):
            col = row_group.column(c)
            if col.path_in_schema == "doc_id" and col.statistics is not None:
                s = col.statistics
                if s.has_min_max:
                    mn = s.min if mn is None else min(mn, s.min)
                    mx = s.max if mx is None else max(mx, s.max)
    if mn is None:
        ids = pq.read_table(path, columns=["doc_id"])["doc_id"]
        import pyarrow.compute as pc

        mn, mx = pc.min(ids).as_py(), pc.max(ids).as_py()
    return int(mn), int(mx)


def _part_first_docs(groups: list[list[str]]) -> np.ndarray:
    """First doc_id of each partition; validates that docs files form
    ascending, non-overlapping doc ranges (they do — the docs store is
    written from the (conv_id, turn_idx)-sorted dataset)."""
    bounds, prev_max = [], -1
    for files in groups:
        gmin = gmax = None
        for f in files:
            mn, mx = _file_doc_range(f)
            gmin = mn if gmin is None else min(gmin, mn)
            gmax = mx if gmax is None else max(gmax, mx)
        if gmin is None or gmin <= prev_max:
            raise ValueError(
                "docs files are not ascending disjoint doc ranges; "
                "cannot form doc-range checkpoint partitions"
            )
        bounds.append(gmin)
        prev_max = gmax
    return np.asarray(bounds, dtype=np.int64)
