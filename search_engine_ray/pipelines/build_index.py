"""End-to-end index build: transcripts -> docs store + posting segments.

Layout of an index directory::

    <index_dir>/
      docs/                  doc-id-assigned transcript turns + doclen
        _MANIFEST.json       { N, sum_doclen, fingerprint, extensions, ... }
        *.parquet            (conv_id, turn_idx, role, tool, ts, text, doc_id, doclen)
      segments/
        part=K/              one doc-range partition of the build
          _MANIFEST.json     lineage: input files, fingerprint, rows, seconds
          *.parquet          SEGMENT_SCHEMA rows
      dictionary/            term -> global df, n_segments, max_tf
        _MANIFEST.json
        *.parquet
      meta.json              config, N, avgdl, stage timings

Resumability: each stage / partition commits atomically via
``state.checkpoint.atomic_dir`` (write temp dir -> fsync manifest ->
rename) and is skipped on re-run when its manifest is present with a
matching input fingerprint. Segment partitions are INVENTORY-based:
any committed ``part=K`` whose recorded input files still fingerprint-
match is kept as-is; only uncovered docs files are (re)partitioned and
built — this one mechanism serves fresh builds, crash resume, and
incremental extension (``extend_index``). Partitioned output, never
one giant file. Mirrors (and upgrades) the reference's
incremental-skip behavior
(`/root/reference/src/cis5550/jobs/Indexer.java:196-231`).
"""

from __future__ import annotations

import glob as _glob
import hashlib
import json
import os
import shutil
import time

import numpy as np
import ray
import ray.data

from ..io import read_parquet_clean

from ..config import PARQUET_ARGS, IndexConfig
from ..stages.doc_ids import assign_doc_ids, assign_doc_ids_files_to
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
FORMAT_VERSION = 4  # v4: roletool dl stream counts the augmented token stream

# term-stat bytes at or below this build the dictionary with one
# driver-side Arrow group_by; above it, the distributed partition-
# vectorized reduction (tests force the distributed path by lowering it)
DICT_LOCAL_STAT_BYTES = 256 * 1024 * 1024


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
            # mtime_ns: size alone misses a same-size in-place rewrite
            # (fixed-width re-exports), which would silently resume over
            # stale data
            h.update(f"{p}:{st.st_size}:{st.st_mtime_ns}".encode())
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
    timings: dict = {}

    # ---- stage A: doc-id assignment -> docs store ----
    docs_dir = os.path.join(index_dir, "docs")
    if isinstance(source, (str, list)):
        fp = _fingerprint(_expand(source), cfg)
    else:
        # count alone would let same-cardinality different data reuse a
        # stale docs store; mix in the schema and a sample-row digest
        # (still cheap — not a full content hash, documented in README)
        import hashlib as _hl

        sample = source.take(3)
        sig = _hl.md5(
            repr([sorted(r.items()) for r in sample]).encode()
        ).hexdigest()[:16]
        fp = _fingerprint(
            f"dataset:{source.count()}:{','.join(source.schema().names)}:{sig}", cfg
        )
    if not is_complete(docs_dir, fp):
        t0 = time.monotonic()
        if isinstance(source, (str, list)):
            n_input = sum(_pq_rows(f) for f in _expand(source))
        else:
            n_input = int(source.count() or 0)
        if n_input == 0:
            # empty corpus: commit an empty docs store (an empty sort
            # yields schema-less blocks downstream stages can't read)
            with atomic_dir(docs_dir, fp, stage="docs") as ck:
                ck.commit(N=0, sum_doclen=0)
            timings["docs"] = round(time.monotonic() - t0, 3)
            return _finish_build(
                index_dir, cfg, n_partitions, stop_after_partition, concurrency, builder, timings
            )
        with atomic_dir(docs_dir, fp, stage="docs") as ck:
            res = None
            if isinstance(source, (str, list)):
                # prefix-sum fast path: no all-to-all when files are
                # already (conv_id, turn_idx)-ordered (SURVEY.md §7.2
                # step 3); tasks write straight into the checkpoint tmp
                # and return their counts (no object-store transit, no
                # second counting pass)
                res = assign_doc_ids_files_to(_expand(source), ck.tmp, cfg)
            if res is not None:
                timings["docs_path"] = "prefix_sum"
                n_docs, sum_dl = res
            else:
                timings["docs_path"] = "sort"
                ds = (
                    read_parquet_clean(_expand(source))
                    if isinstance(source, (str, list))
                    else source
                )
                ids = assign_doc_ids(ds, cfg)
                ids.write_parquet(ck.tmp, **PARQUET_ARGS)
                n_docs, sum_dl = _count_docs_files(ck.tmp)
            ck.commit(N=n_docs, sum_doclen=sum_dl)
        timings["docs"] = round(time.monotonic() - t0, 3)

    return _finish_build(
        index_dir, cfg, n_partitions, stop_after_partition, concurrency, builder, timings
    )


def extend_index(
    index_dir: str,
    new_source,
    n_partitions: int = 4,
    concurrency=None,
    builder: str = "tasks",
) -> dict:
    """Incremental indexing: append new transcript turns to an existing
    index WITHOUT touching its finished partitions (the Ray analog of
    the reference's incremental skip via ``crawl_old`` / ``load_index``,
    `/root/reference/src/cis5550/jobs/Indexer.java:196-231`, `:229`).

    Constraint (validated): every new ``(conv_id, turn_idx)`` must sort
    strictly after every existing key — the append-only stream shape —
    so dense doc_ids keep the global-rank semantics by continuing at N.
    Idempotent: re-running with an already-applied source is a no-op
    for stage A and resumes any unfinished segment partitions. After an
    extension, keep maintaining the index through ``extend_index`` /
    ``_finish_build`` — re-running ``build_index`` with the original
    source would see a changed docs fingerprint and rebuild from
    scratch.
    """
    with open(os.path.join(index_dir, "meta.json")) as f:
        cfg = IndexConfig.from_json(json.load(f)["config"])
    docs_dir = os.path.join(index_dir, "docs")
    manifest = read_manifest(docs_dir)
    new_files = _expand(new_source)
    ext_fp = _fingerprint(new_files, cfg)
    timings: dict = {"extended": True}

    _sweep_orphan_extensions(docs_dir, manifest)

    if ext_fp not in manifest.get("extensions", []):
        t0 = time.monotonic()
        n_old = int(manifest["N"])
        if sum(_pq_rows(f) for f in new_files) == 0:
            # all-empty extension: record it as applied and finish —
            # the fallback path would sort an empty dataset whose
            # schema-less blocks poison the docs dir (same guard as
            # build_index's stage A)
            manifest.setdefault("extensions", []).append(ext_fp)
            mpath = os.path.join(docs_dir, "_MANIFEST.json")
            with open(mpath + ".tmp", "w") as mf:
                json.dump(manifest, mf, indent=1)
                mf.flush()
                os.fsync(mf.fileno())
            os.replace(mpath + ".tmp", mpath)
            timings["docs_ext"] = round(time.monotonic() - t0, 3)
            return _finish_build(
                index_dir, cfg, n_partitions, None, concurrency, builder, timings
            )
        last_key = _last_key(docs_dir)
        first_key = _first_key_of(new_files)
        if last_key is not None and first_key is not None and first_key <= last_key:
            raise ValueError(
                f"extension keys must sort after existing keys: "
                f"new first {first_key} <= existing last {last_key}"
            )
        # crash-safe apply: target names derive deterministically from
        # ext_fp, so a rerun after a mid-apply crash overwrites the same
        # files instead of appending duplicates; any files from a crash
        # of a DIFFERENT (never-committed) extension were swept above.
        ext_tag = f"ext-{ext_fp[:12]}"
        stage = os.path.join(docs_dir, "_ext.tmp")
        shutil.rmtree(stage, ignore_errors=True)
        os.makedirs(stage)
        res = assign_doc_ids_files_to(new_files, stage, cfg, offset=n_old)
        if res is not None:
            n_new, sum_new = res
        else:
            ids = assign_doc_ids(
                read_parquet_clean(new_files), cfg, offset=n_old
            )
            ids.write_parquet(stage, **PARQUET_ARGS)
            n_new, sum_new = _count_docs_files(stage)
        staged = sorted(_glob.glob(os.path.join(stage, "*.parquet")))
        for i, f in enumerate(staged):
            os.replace(f, os.path.join(docs_dir, f"{ext_tag}-{i:05d}.parquet"))
        shutil.rmtree(stage, ignore_errors=True)
        manifest["N"] = n_old + n_new
        manifest["sum_doclen"] = int(manifest["sum_doclen"]) + sum_new
        manifest.setdefault("extensions", []).append(ext_fp)
        manifest["fingerprint"] = _fingerprint(
            manifest["fingerprint"] + "|" + ext_fp, cfg
        )
        mpath = os.path.join(docs_dir, "_MANIFEST.json")
        with open(mpath + ".tmp", "w") as mf:
            json.dump(manifest, mf, indent=1)
            mf.flush()
            os.fsync(mf.fileno())
        os.replace(mpath + ".tmp", mpath)
        timings["docs_ext"] = round(time.monotonic() - t0, 3)

    return _finish_build(
        index_dir, cfg, n_partitions, None, concurrency, builder, timings
    )


def compact_index(
    index_dir: str,
    n_partitions: int = 4,
    concurrency=None,
    builder: str = "tasks",
) -> dict:
    """Rebuild the segment layout from the (unchanged) docs store into
    ``n_partitions`` fresh partitions. After many ``extend_index``
    calls an index accumulates one small partition per extension —
    query-time segment concatenation and per-partition overhead grow
    with each; compaction restores the target layout. Logical postings
    are unchanged (tested); the docs store and its doc_ids are not
    touched. Crash-safe: the new layout is built in a STAGING segment
    root while the old partitions keep serving (a refresh/restart during
    the minutes-long rebuild still sees a complete index); the cutover
    is two directory renames. A kill mid-build leaves the old layout
    fully intact; a kill between the renames leaves no segment root,
    which the next ``_finish_build`` repairs by rebuilding from the docs
    store (and sweeping the stale staging dirs)."""
    with open(os.path.join(index_dir, "meta.json")) as f:
        cfg = IndexConfig.from_json(json.load(f)["config"])
    seg_root = os.path.join(index_dir, "segments")
    staging = os.path.join(index_dir, "segments.compact.tmp")
    retired = os.path.join(index_dir, "segments.old.tmp")
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(retired, ignore_errors=True)
    meta = _finish_build(
        index_dir, cfg, n_partitions, None, concurrency, builder,
        {"compacted": True}, seg_root=staging,
    )
    if os.path.exists(seg_root):
        os.rename(seg_root, retired)
    os.rename(staging, seg_root)
    shutil.rmtree(retired, ignore_errors=True)
    return meta


def _sweep_orphan_extensions(docs_dir: str, manifest: dict) -> None:
    """Delete ``ext-<fp12>-*.parquet`` docs files whose fingerprint is
    not recorded in ``manifest['extensions']`` — leftovers of an apply
    that crashed before its manifest commit. Without this sweep those
    rows would be double-counted when the same extension re-runs."""
    committed = {e[:12] for e in manifest.get("extensions", [])}
    for f in _glob.glob(os.path.join(docs_dir, "ext-*.parquet")):
        fp12 = os.path.basename(f)[4:16]
        if fp12 not in committed:
            os.remove(f)


def _inventory_parts(seg_root: str, docs_dir: str, cfg: IndexConfig) -> list[tuple[int, list[str]]]:
    """Committed partitions whose recorded inputs still exist and
    fingerprint-match; anything else is removed (stale / reconfigured)."""
    parts: list[tuple[int, list[str]]] = []
    for d in sorted(_glob.glob(os.path.join(seg_root, "part=*"))):
        ok = False
        try:
            k = int(os.path.basename(d).split("=")[1])
            m = read_manifest(d)
            files = [os.path.join(docs_dir, b) for b in m.get("inputs", [])]
            ok = (
                k >= 0
                and bool(files)
                and all(os.path.exists(f) for f in files)
                and m.get("fingerprint") == _fingerprint(files, cfg)
            )
        except (ValueError, IndexError, OSError, json.JSONDecodeError):
            ok = False
        if ok:
            parts.append((k, files))
        else:
            shutil.rmtree(d, ignore_errors=True)
    return parts


def _finish_build(
    index_dir: str,
    cfg: IndexConfig,
    n_partitions: int,
    stop_after_partition: int | None = None,
    concurrency=None,
    builder: str = "tasks",
    timings: dict | None = None,
    seg_root: str | None = None,
) -> dict:
    """Stages B (segment wave) + C (dictionary) + meta, over whatever
    the docs store currently holds. ``seg_root`` overrides the segment
    output root (compact_index stages into a side directory and swaps)."""
    timings = timings if timings is not None else {}
    if seg_root is None:
        # sweep staging/retired roots from a compaction killed between
        # its cutover renames (never when WE are the staging build)
        for stale in ("segments.compact.tmp", "segments.old.tmp"):
            shutil.rmtree(os.path.join(index_dir, stale), ignore_errors=True)
    docs_dir = os.path.join(index_dir, "docs")
    docs_manifest = read_manifest(docs_dir)
    # orphaned ext-* files (an extend that crashed between staging its
    # files and committing the manifest) must never be indexed here:
    # their doc_ids sit at >= manifest N, so segments built over them
    # would send query-time accumulators out of bounds
    _sweep_orphan_extensions(docs_dir, docs_manifest)
    N = docs_manifest["N"]
    avgdl = (docs_manifest["sum_doclen"] / N) if N else 0.0
    docs_files = sorted(_glob.glob(os.path.join(docs_dir, "*.parquet")))

    # ---- stage B: wave build of uncovered partitions -> segments ----
    # All uncovered doc-range partitions are built by ONE pipeline (one
    # task/actor pool, one term-keyed merge shuffle) and then committed
    # per-partition — sequential per-partition pipelines pay pool
    # startup + shuffle setup once per partition and scale negatively.
    if seg_root is None:
        seg_root = os.path.join(index_dir, "segments")
    os.makedirs(seg_root, exist_ok=True)
    for stale in _glob.glob(os.path.join(seg_root, "*.tmp")):
        shutil.rmtree(stale, ignore_errors=True)

    existing = _inventory_parts(seg_root, docs_dir, cfg)
    covered = {f for _, fs in existing for f in fs}
    # zero-row docs files (empty corpus / empty write artifacts) carry
    # no postings and may lack the full schema — never partition them
    uncovered = [f for f in docs_files if f not in covered and _pq_rows(f) > 0]
    # order by DOC RANGE (footer stats), never by filename: extension
    # files ('ext-…') sort lexically before the ~1/16 of Ray's
    # uuid-named base files starting with 'f', so a name sort can place
    # high-doc-id extension files ahead of base files — array_split
    # would then form overlapping partition ranges, and compaction (or
    # any rebuild) of an extended index would abort on the disjointness
    # check
    uncovered.sort(key=lambda f: _file_doc_range(f)[0])
    new_parts: list[tuple[int, list[str]]] = []
    if uncovered:
        next_id = max((k for k, _ in existing), default=-1) + 1
        groups = np.array_split(uncovered, min(n_partitions, len(uncovered)))
        new_parts = [(next_id + i, list(g)) for i, g in enumerate(groups) if len(g)]

    aborting = False
    if stop_after_partition is not None:
        kept = [(k, g) for k, g in new_parts if k < stop_after_partition]
        aborting = len(kept) < len(new_parts)
        new_parts = kept

    all_parts = sorted(existing + new_parts)
    part_bounds, part_ids = _part_bounds(all_parts)
    part_fps = {k: _fingerprint(files, cfg) for k, files in all_parts}

    if new_parts:
        t0 = time.monotonic()
        # adaptive bucket size ONLY for corpora smaller than ~2 buckets:
        # a single bucket defeats bucket-major byte balancing and makes
        # every hive-write task emit a file per partition. Corpora with
        # plenty of natural buckets keep the configured size — extra
        # buckets would just multiply segment rows and query-time
        # segment concatenation.
        import dataclasses

        if int(N) <= 2 * cfg.doc_bucket_size:
            eff_bucket = max(1024, -(-int(N) // 16))
            cfg_eff = dataclasses.replace(cfg, doc_bucket_size=eff_bucket)
        else:
            cfg_eff = cfg
        files = [f for _, g in new_parts for f in g]
        wave_ds = read_parquet_clean(files, columns=["doc_id", "doclen", "text", "role", "tool"])
        if builder == "actors":
            if concurrency is None:
                ncpu = int(ray.cluster_resources().get("CPU", 4))
                concurrency = (1, max(1, ncpu))
            partials = wave_ds.map_batches(
                PartialIndexBuilder,
                fn_constructor_kwargs={"cfg": cfg_eff, "part_bounds": part_bounds, "part_ids": part_ids},
                batch_format="pyarrow",
                batch_size=None,
                concurrency=concurrency,
            )
        else:
            partials = wave_ds.map_batches(
                build_partials_task,
                fn_kwargs={"cfg": cfg_eff, "part_bounds": part_bounds, "part_ids": part_ids},
                batch_format="pyarrow",
                batch_size=None,
            )
        merged = merge_partials(partials)
        wave_tmp = os.path.join(seg_root, "_wave.tmp")
        shutil.rmtree(wave_tmp, ignore_errors=True)
        merged.write_parquet(wave_tmp, partition_cols=["part"], **PARQUET_ARGS)
        wave_s = round(time.monotonic() - t0, 3)
        for k, group_files in new_parts:
            src = os.path.join(wave_tmp, f"part={k}")
            os.makedirs(src, exist_ok=True)  # partition with zero postings
            part_files = _glob.glob(os.path.join(src, "*.parquet"))
            n_segments = sum(_pq_rows(f) for f in part_files)
            manifest = {
                "fingerprint": part_fps[k],
                "stage": "segments",
                "inputs": [os.path.basename(f) for f in group_files],
                "input_bytes": int(sum(os.path.getsize(f) for f in group_files)),
                "n_segments": int(n_segments),
                "output_bytes": int(sum(os.path.getsize(f) for f in part_files)),
                "seconds": wave_s,
                "wave": [k2 for k2, _ in new_parts],
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
        timings["segments_parts"] = len(new_parts)
    if aborting:
        raise BuildAborted(
            f"aborted before partition {stop_after_partition} (test hook)"
        )

    # ---- stage C: dictionary (global term stats) ----
    dict_dir = os.path.join(index_dir, "dictionary")
    dict_fp = _fingerprint("|".join(part_fps[k] for k, _ in all_parts), cfg)
    if not is_complete(dict_dir, dict_fp):
        t0 = time.monotonic()
        seg_files = _glob.glob(os.path.join(seg_root, "part=*", "*.parquet"))
        # decide local-vs-distributed on the bytes of the COLUMNS the
        # dictionary actually reads (term/df/max_tf) — total file size
        # is dominated by posting blobs the read prunes away (a 195 MB
        # segment set carries ~3 MB of term stats; the distributed
        # groupby's fixed job cost is seconds)
        stat_bytes = _column_bytes(seg_files, ("term", "df", "max_tf"))
        if stat_bytes <= DICT_LOCAL_STAT_BYTES:
            # small term-stats: one driver-side Arrow group_by
            import pyarrow as pa
            import pyarrow.parquet as pq

            seg_t = pq.read_table(seg_files, columns=["term", "df", "max_tf"]) if seg_files else None
            if seg_t is None or seg_t.num_rows == 0:
                dict_t = pa.table(
                    {"term": pa.array([], pa.string()),
                     "df": pa.array([], pa.int64()),
                     "max_tf": pa.array([], pa.int32()),
                     "n_segments": pa.array([], pa.int64())}
                )
            else:
                agg = seg_t.group_by("term").aggregate(
                    [("df", "sum"), ("max_tf", "max"), ("df", "count")]
                )
                # select by generated name, not position — aggregate
                # column order differs across pyarrow versions
                dict_t = pa.table(
                    {
                        "term": agg["term"],
                        "df": agg["df_sum"],
                        "max_tf": agg["max_tf_max"],
                        "n_segments": agg["df_count"],
                    }
                )
            with atomic_dir(dict_dir, dict_fp, stage="dictionary") as ck:
                pq.write_table(dict_t, os.path.join(ck.tmp, "dictionary.parquet"), **PARQUET_ARGS)
                ck.commit()
        else:
            # vocabulary-sized group count: partition-vectorized (one
            # Arrow-sorted combine per hash partition) instead of
            # Ray's per-group Python aggregate — see dedup._reduce_keyed
            from ..ops.dedup import _npart, _reduce_keyed

            seg_ds = read_parquet_clean(
                seg_root, columns=["term", "df", "max_tf"]
            )
            dictionary = _reduce_keyed(seg_ds, "term", _npart() * 8, _dict_part)
            with atomic_dir(dict_dir, dict_fp, stage="dictionary") as ck:
                dictionary.write_parquet(ck.tmp, **PARQUET_ARGS)
                ck.commit()
        timings["dictionary"] = round(time.monotonic() - t0, 3)

    meta = {
        "N": N,
        "avgdl": avgdl,
        "config": cfg.to_json(),
        "n_partitions": len(all_parts),
        "timings": timings,
    }
    # tmp + fsync + rename: meta.json is read by live serving actors
    # (refresh / restart) and by extend/compact — a truncating in-place
    # write would expose partial JSON to concurrent readers and a crash
    # mid-write would corrupt the index's entry point
    mpath = os.path.join(index_dir, "meta.json")
    with open(mpath + ".tmp", "w") as f:
        json.dump(meta, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(mpath + ".tmp", mpath)
    return meta


def _dict_part(g):
    """One hash partition of segment (term, df, max_tf) rows -> one
    dictionary row per term, vectorized (Arrow sort + reduceat) — the
    distributed dictionary path's combine."""
    import pyarrow as pa
    import pyarrow.compute as pc

    term = g["term"].combine_chunks()
    idx = pc.sort_indices(term)
    term = term.take(idx)
    order = idx.to_numpy()
    neq = pc.not_equal(
        term.slice(1), term.slice(0, max(len(term) - 1, 0))
    ).to_numpy(zero_copy_only=False).astype(bool)
    starts = np.flatnonzero(np.concatenate([[True], neq]))
    df = g["df"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    mtf = g["max_tf"].to_numpy(zero_copy_only=False)[order]
    return pa.table(
        {
            "term": term.take(pa.array(starts, pa.int64())),
            "df": pa.array(np.add.reduceat(df, starts), pa.int64()),
            "max_tf": pa.array(np.maximum.reduceat(mtf, starts)).cast(
                g["max_tf"].type
            ),
            "n_segments": pa.array(
                np.diff(np.concatenate([starts, [len(order)]])).astype(np.int64),
                pa.int64(),
            ),
        }
    )


def _count_docs_files(d: str) -> tuple[int, int]:
    """(rows, sum_doclen) of the docs files in ``d`` — the sort
    fallback's counting pass (the prefix-sum fast path returns counts
    from its write tasks instead; counting the lazy dataset would
    re-execute the whole doc-id pipeline)."""
    import pyarrow.parquet as pq

    n_docs = 0
    sum_dl = 0
    for f in _glob.glob(os.path.join(d, "*.parquet")):
        n_docs += pq.read_metadata(f).num_rows
        dl = pq.read_table(f, columns=["doclen"])["doclen"]
        sum_dl += int(np.sum(dl.to_numpy())) if len(dl) else 0
    return n_docs, sum_dl


def _pq_rows(path: str) -> int:
    import pyarrow.parquet as pq

    return pq.read_metadata(path).num_rows


def _column_bytes(files: list[str], columns: tuple[str, ...]) -> int:
    """Total compressed bytes of the given columns across parquet files
    (footer metadata only — no data read)."""
    import pyarrow.parquet as pq

    total = 0
    for f in files:
        md = pq.read_metadata(f)
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for c in range(row_group.num_columns):
                col = row_group.column(c)
                if col.path_in_schema in columns:
                    total += col.total_compressed_size
    return total


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


def _part_bounds(parts: list[tuple[int, list[str]]]) -> tuple[np.ndarray, np.ndarray]:
    """(first-doc bounds ascending, aligned part ids); validates that
    partitions form disjoint doc ranges (they do — the docs store is
    written from the sorted/prefix-sum-assigned dataset)."""
    ranges = []
    for k, files in parts:
        gmin = gmax = None
        for f in files:
            mn, mx = _file_doc_range(f)
            gmin = mn if gmin is None else min(gmin, mn)
            gmax = mx if gmax is None else max(gmax, mx)
        if gmin is None:
            raise ValueError(f"partition {k} has no rows")
        ranges.append((gmin, gmax, k))
    ranges.sort()
    prev_max = -1
    for gmin, gmax, k in ranges:
        if gmin <= prev_max:
            raise ValueError(
                "docs partitions are not disjoint doc ranges; "
                "cannot form doc-range checkpoint partitions"
            )
        prev_max = gmax
    return (
        np.asarray([r[0] for r in ranges], dtype=np.int64),
        np.asarray([r[2] for r in ranges], dtype=np.int64),
    )


def _last_key(docs_dir: str):
    """Largest (conv_id, turn_idx) in the docs store = key of doc N-1."""
    import pyarrow.parquet as pq

    files = sorted(_glob.glob(os.path.join(docs_dir, "*.parquet")))
    if not files:
        return None
    best = max(files, key=lambda f: _file_doc_range(f)[1])
    t = pq.read_table(best, columns=["doc_id", "conv_id", "turn_idx"])
    i = int(np.argmax(t["doc_id"].to_numpy()))
    return (t["conv_id"][i].as_py(), t["turn_idx"][i].as_py())


def _first_key_of(files: list[str]):
    """Smallest (conv_id, turn_idx) across a set of transcript files."""
    import pyarrow.parquet as pq

    best = None
    for f in files:
        t = pq.read_table(f, columns=["conv_id", "turn_idx"])
        if t.num_rows == 0:
            continue
        conv = t["conv_id"].to_numpy(zero_copy_only=False)
        turn = t["turn_idx"].to_numpy()
        order = np.lexsort((turn, conv))
        key = (conv[order[0]], int(turn[order[0]]))
        best = key if best is None or key < best else best
    return best
