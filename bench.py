"""Benchmark entry point (driver contract + scaling evidence).

Default mode: one Ray session at ``$RAY_GRAFT_CPUS`` (default 32) CPUs
over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1); times the
headline pipelines and prints ONE JSON line::

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N,
     "turns": T, "turns_per_sec": ..., "query_p95_ms": ...}

``--scaling``: runs the headline index build twice in FRESH processes
(num_cpus=8 then num_cpus=32) over the SAME pre-materialized corpus and
reports both throughputs + scaling efficiency ``(thr32/thr8)/4``
(sandbox stand-in for the N->4N-node criterion, SURVEY.md §4).

Headline input is the deterministic synthetic transcript corpus
(FIXTURES.md §1; corpus.make_transcripts) scaled by sf — the
``input_hint`` shape has no counterpart in the driver tables — plus a
set of representative gate ops timed directly over $GRAFT_SF_DIR.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

os.environ.setdefault("RAY_DATA_DISABLE_PROGRESS_BARS", "1")

BENCH_ROOT = "/tmp/seray_bench"
N_QUERIES = 50


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _quiet_ray(num_cpus: int, namespace: str | None = None):
    import logging

    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
            namespace=namespace,  # explicit -> named actors cross-job visible
        )
    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    return ray


def ensure_corpus(sf: float, scale: int = 1) -> tuple[str, int]:
    """Materialize (once) the synthetic bench corpus scaled by sf:
    sf=0.1 -> 120k turns (scale multiplies further — the scaling bench
    passes scale=20 (2.4M turns) so fixed per-job costs don't mask compute scaling). Cached
    under /tmp, shared by scaling runs."""
    from search_engine_ray.corpus import write_transcripts

    n_convs = max(200, int(12_000 * sf / 0.1)) * scale
    turns = n_convs * 10
    out = os.path.join(BENCH_ROOT, f"corpus-{turns}")
    write_transcripts(out, n_convs=n_convs, turns_per_conv=10, n_files=64)
    return out, turns


def _burn(k: int) -> float:
    t0 = time.monotonic()
    x = 0
    for i in range(k):
        x += i * i
    return time.monotonic() - t0


def host_calibration(procs: int = 32, n: int = 3_000_000) -> dict:
    """~2s pure-Python CPU burn (no Ray): single-core time + aggregate
    multiple at ``procs`` processes. This VM's effective capacity swings
    with hypervisor steal (measured 25.1x at round-1 calibration vs
    9.2x under heavy steal), so every bench payload carries the
    capacity it ran under — absolute numbers across rounds must be
    normalized by this, and the scaling pair is only meaningful when
    both levels sit inside the linear region."""
    import multiprocessing as mp

    t0 = time.monotonic()
    _burn(n)
    one = time.monotonic() - t0
    t0 = time.monotonic()
    with mp.Pool(procs) as pool:
        pool.map(_burn, [n] * procs)
    agg = procs * one / (time.monotonic() - t0)
    return {"one_core_s": round(one, 3), f"agg{procs}_x": round(agg, 1)}


def pair_ceiling(cpus_lo: int, cpus_hi: int) -> dict:
    """Hardware ceiling for a scaling pair, measured AT THE LEG SIZES:
    the burn test's aggregate multiple at cpus_lo and cpus_hi processes
    bounds what a PERFECTLY scaling engine could read —
    ``(cap_hi / cap_lo) / (cpus_hi / cpus_lo)``. The 32-proc aggregate
    alone misleads here: this VM has been observed to deliver only
    ~5.9x at 8 procs (vs 8.2x at round 1) while still reading ~15x at
    32 procs, so a mid-size leg hits steal the wide calibration never
    sees."""
    cap_lo = host_calibration(procs=cpus_lo)[f"agg{cpus_lo}_x"]
    cap_hi = host_calibration(procs=cpus_hi)[f"agg{cpus_hi}_x"]
    ceiling = min(1.0, (cap_hi / cap_lo) / (cpus_hi / cpus_lo))
    return {
        f"burn_agg{cpus_lo}_x": cap_lo,
        f"burn_agg{cpus_hi}_x": cap_hi,
        "ceiling": round(ceiling, 3),
    }


def _warm_workers():
    """Force Ray worker-process startup + package import before timing —
    steady-state throughput is the metric; one-time cluster warmup is
    amortized over hours at real scale."""
    import ray.data

    from search_engine_ray.stages.index_build import build_partials_task  # noqa: F401

    ray.data.range(10_000, override_num_blocks=64).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).materialize()


def bench_build(corpus_dir: str, run_tag: str, n_partitions: int = 8) -> float:
    """Fresh full stemmed index build; returns seconds."""
    from search_engine_ray.config import IndexConfig
    from search_engine_ray.pipelines.build_index import build_index

    _warm_workers()
    idx = os.path.join(BENCH_ROOT, f"idx-{run_tag}")
    shutil.rmtree(idx, ignore_errors=True)
    t0 = time.monotonic()
    build_index(corpus_dir, idx, IndexConfig(), n_partitions=n_partitions)
    return time.monotonic() - t0


def _serving_latencies(idx: str, n_shards: int, warm_passes: int = 2,
                       timed_passes: int = 4) -> dict:
    """Steady-state doc-sharded serving latency: warm passes populate
    the actor-side decode/score memos, then ``timed_passes`` x 50
    sequential queries give a 200-sample p95 (the r3 driver record's
    43 ms vs same-round 17 ms self-checks was a 50-sample estimation
    artifact, not a serving regression)."""
    import numpy as np

    from search_engine_ray.corpus import make_queries
    from search_engine_ray.pipelines.search import DocShardedSearcher

    qdf = make_queries(N_QUERIES)
    searcher = DocShardedSearcher(idx, n_shards=n_shards)
    try:
        for _ in range(warm_passes):
            for q, k in zip(qdf["query"], qdf["k"]):
                searcher.search(q, int(k), mode="OR", result_cache=False)
        lat = []
        # steady-state SCORING path (result cache bypassed): the
        # round-over-round comparable metric — term decode/score memos
        # warm, final top-k recomputed per query
        for _ in range(timed_passes):
            for q, k in zip(qdf["query"], qdf["k"]):
                t0 = time.monotonic()
                searcher.search(q, int(k), mode="OR", result_cache=False)
                lat.append(time.monotonic() - t0)
        # production path (per-shard result cache ON, deterministic ->
        # bit-identical): one populating pass, then timed hits
        for q, k in zip(qdf["query"], qdf["k"]):
            searcher.search(q, int(k), mode="OR")
        lat_rc = []
        for _ in range(timed_passes):
            for q, k in zip(qdf["query"], qdf["k"]):
                t0 = time.monotonic()
                searcher.search(q, int(k), mode="OR")
                lat_rc.append(time.monotonic() - t0)
    finally:
        searcher.close()
    return {
        "serving_p95_ms": round(float(np.percentile(lat, 95)) * 1000, 2),
        "serving_p50_ms": round(float(np.percentile(lat, 50)) * 1000, 2),
        "serving_mean_ms": round(float(np.mean(lat)) * 1000, 2),
        "serving_samples": len(lat),
        "serving_result_cache_p95_ms": round(float(np.percentile(lat_rc, 95)) * 1000, 2),
        "serving_result_cache_p50_ms": round(float(np.percentile(lat_rc, 50)) * 1000, 2),
    }


def bench_queries(run_tag: str) -> dict:
    """Batch-eval throughput + per-query p95 latency over the index
    built by bench_build (same run_tag)."""
    import numpy as np
    import ray.data

    from search_engine_ray.corpus import make_queries
    from search_engine_ray.pipelines.search import DocShardedSearcher, evaluate_queries

    idx = os.path.join(BENCH_ROOT, f"idx-{run_tag}")
    qdf = make_queries(N_QUERIES)

    t0 = time.monotonic()
    evaluate_queries(
        ray.data.from_pandas(qdf), idx, mode="OR", concurrency=(2, 8)
    ).materialize()
    batch_s = time.monotonic() - t0

    # latency through the doc-range-sharded tier (the serving config:
    # O(k) per-query transfer); full warm pass first — p95 is a
    # steady-state metric
    searcher = DocShardedSearcher(idx, n_shards=4)
    # result_cache=False: query_p95_ms is the round-over-round WARM
    # SCORING metric (same policy as _serving_latencies) — with the
    # per-shard result memo on, every timed repeat would be a
    # bit-identical cache hit and a scoring regression would be masked
    for q, k in zip(qdf["query"], qdf["k"]):
        searcher.search(q, int(k), mode="OR", result_cache=False)
    lat = []
    for q, k in zip(qdf["query"], qdf["k"]):
        t0 = time.monotonic()
        searcher.search(q, int(k), mode="OR", result_cache=False)
        lat.append(time.monotonic() - t0)
    return {
        "query_batch": round(batch_s, 3),
        "query_p95_ms": round(float(np.percentile(lat, 95)) * 1000, 2),
        "query_mean_ms": round(float(np.mean(lat)) * 1000, 2),
    }


GATE_OPS = [
    "bm25_topk_or", "term_stats", "dedup_minhash_lsh", "knn_cosine",
    "events_windows", "dup_span_fraction", "dup_span_approx",
    "unigram_logprob", "conv_dedup",
]


def bench_gate_ops(sf_dir: str) -> dict:
    import __ray_entry__ as e

    qs = e.queries()
    out = {}
    for name in GATE_OPS:
        t0 = time.monotonic()
        res = qs[name](sf_dir)
        # consume lazily-returned datasets
        if hasattr(res, "materialize"):
            res.materialize()
        out[name] = round(time.monotonic() - t0, 3)
    return out


def bench_big() -> dict:
    """2.4M-turn section (same corpus the scaling bench uses): fresh
    full build throughput + doc-sharded serving p95 at 20x the default
    size — catches regressions that only show at depth (BASELINE.md
    previously carried these numbers out-of-band). Runs on the
    caller's already-initialized Ray session. Closes with the
    incremental-maintenance depth rep (extend + compact + post-compact
    parity, VERDICT r4 item 6) — which leaves the cached index at
    2.52M turns for any LATER standalone --qps reuse (5% bigger;
    rebuilt fresh by the next full bench run)."""
    corpus_dir, turns = ensure_corpus(0.1, scale=20)
    tag = f"big-{turns}"
    build_s = bench_build(corpus_dir, tag)
    idx = os.path.join(BENCH_ROOT, f"idx-{tag}")
    out = {
        "turns": turns,
        "build_sec": round(build_s, 3),
        "turns_per_sec": round(turns / build_s, 1),
    }
    out.update(_serving_latencies(idx, n_shards=8))
    try:
        out["query_surface"] = bench_query_surface(idx, n_shards=8)
    except Exception as ex:  # noqa: BLE001 - best-effort subsection
        out["query_surface"] = {"error": f"{type(ex).__name__}: {ex}"}
    try:
        out["extend_compact"] = bench_extend_compact(idx, turns)
    except Exception as ex:  # noqa: BLE001 - best-effort subsection
        out["extend_compact"] = {"error": f"{type(ex).__name__}: {ex}"}
    return out


def bench_query_surface(idx: str, n_shards: int, warm_passes: int = 2,
                        timed_passes: int = 4) -> dict:
    """Widened-query-surface latency at depth: wildcard (multi-term
    rewrite), boolean-NOT (exclusion pushdown), fuzzy (Damerau-1
    rewrite), boosted (^W weighting) and quoted-phrase-clause paths
    through the doc-sharded tier, measured with the same
    warm-scoring-path policy as ``_serving_latencies``. Query sets
    derive deterministically from the reference mix: wildcard queries
    prefix-ify the first token (first 4 chars + '*'); exclusion
    queries negate the last token; fuzzy queries swap the first
    token's last two chars + '~'; boosted queries weight the first
    token ^2; quoted queries wrap two-token queries in quotes."""
    import numpy as np

    from search_engine_ray.corpus import make_queries
    from search_engine_ray.pipelines.search import DocShardedSearcher

    qdf = make_queries(N_QUERIES)
    classes: dict[str, list] = {
        "wildcard": [], "exclusion": [], "fuzzy": [], "boosted": [],
        "quoted": [],
    }
    for q, k in zip(qdf["query"], qdf["k"]):
        toks = str(q).split()
        if not toks:
            continue
        k = int(k)
        head = toks[0][:4] if len(toks[0]) >= 4 else toks[0]
        classes["wildcard"].append((" ".join([head + "*"] + toks[1:]), k))
        t0_ = toks[0]
        typo = (t0_[:-2] + t0_[-1] + t0_[-2]) if len(t0_) >= 4 else t0_
        classes["fuzzy"].append((" ".join([typo + "~"] + toks[1:]), k))
        classes["boosted"].append((" ".join([t0_ + "^2"] + toks[1:]), k))
        if len(toks) > 1:
            classes["exclusion"].append(
                (" ".join(toks[:-1]) + " -" + toks[-1], k))
            classes["quoted"].append((f'"{toks[0]} {toks[1]}"', k))
    # one positions-loaded searcher serves every class (quoted clauses
    # need the position blocks)
    searcher = DocShardedSearcher(idx, n_shards=n_shards,
                                  load_positions=True)
    out = {}
    try:
        for label, qs in classes.items():
            for _ in range(warm_passes):
                for q, k in qs:
                    searcher.search(q, k, mode="OR", result_cache=False)
            lat = []
            for _ in range(timed_passes):
                for q, k in qs:
                    t0 = time.monotonic()
                    searcher.search(q, k, mode="OR", result_cache=False)
                    lat.append(time.monotonic() - t0)
            out[f"{label}_p95_ms"] = round(float(np.percentile(lat, 95)) * 1000, 2)
            out[f"{label}_p50_ms"] = round(float(np.percentile(lat, 50)) * 1000, 2)
            out[f"{label}_samples"] = len(lat)
    finally:
        searcher.close()
    return out


def bench_extend_compact(idx: str, turns: int, delta_convs: int = 12_000) -> dict:
    """Incremental indexing at depth: append a 5% delta (120k turns)
    to the freshly built 2.4M index, measure extend throughput, then
    compact back to the target partition layout and verify POST-COMPACT
    QUERY PARITY (bit-identical top-k to post-extend — compaction only
    regroups segments) plus post-compact serving p95."""
    import numpy as np
    import pyarrow.parquet as pq_

    from search_engine_ray.corpus import make_queries, make_transcripts
    from search_engine_ray.pipelines.build_index import compact_index, extend_index
    from search_engine_ray.pipelines.search import DocShardedSearcher

    delta_dir = os.path.join(BENCH_ROOT, f"delta-{turns}")
    delta_file = os.path.join(delta_dir, "delta.parquet")
    if not os.path.exists(delta_file):
        os.makedirs(delta_dir, exist_ok=True)
        t = make_transcripts(
            n_convs=delta_convs, turns_per_conv=10, seed=99,
            conv_offset=turns // 10,  # keys sort strictly after existing
        )
        pq_.write_table(t, delta_file + ".tmp")
        os.replace(delta_file + ".tmp", delta_file)
    delta_turns = delta_convs * 10

    t0 = time.monotonic()
    extend_index(idx, delta_file, n_partitions=8)
    extend_s = time.monotonic() - t0

    qdf = make_queries(N_QUERIES)
    queries = [(q, int(k)) for q, k in zip(qdf["query"], qdf["k"])]
    out = {
        "delta_turns": delta_turns,
        "extend_sec": round(extend_s, 3),
        "extend_turns_per_sec": round(delta_turns / extend_s, 1),
    }
    searcher = DocShardedSearcher(idx, n_shards=8)
    try:
        post_extend = [
            searcher.search(q, k, mode="OR", result_cache=False)
            for q, k in queries
        ]
        t0 = time.monotonic()
        compact_index(idx, n_partitions=8)
        out["compact_sec"] = round(time.monotonic() - t0, 3)
        searcher.refresh()
        post_compact = [
            searcher.search(q, k, mode="OR", result_cache=False)
            for q, k in queries
        ]
        out["post_compact_parity"] = all(
            a[0].tolist() == b[0].tolist() and a[1].tolist() == b[1].tolist()
            for a, b in zip(post_extend, post_compact)
        )
        lat = []
        for _ in range(2):
            for q, k in queries:
                t0 = time.monotonic()
                searcher.search(q, k, mode="OR", result_cache=False)
                lat.append(time.monotonic() - t0)
        out["post_compact_p95_ms"] = round(
            float(np.percentile(lat, 95)) * 1000, 2
        )
    finally:
        searcher.close()
    return out


def ensure_documents(corpus_dir: str, turns: int) -> str:
    """documents-shaped table derived deterministically from the cached
    transcript corpus (turn text as documents, doc_id = conv_num * 10 +
    turn_idx): the dedup family's input at depth. One Ray job, cached."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from search_engine_ray.io import read_parquet_clean

    out = os.path.join(BENCH_ROOT, f"docs-{turns}")
    done = out + ".done"  # marker OUTSIDE the dir: readers glob it whole
    if os.path.exists(done):
        return out

    def to_docs(t: pa.Table) -> pa.Table:
        conv_num = pc.cast(
            pc.utf8_slice_codeunits(t["conv_id"], 5, 13), pa.int64()
        )
        doc_id = pc.add(
            pc.multiply(conv_num, 10), pc.cast(t["turn_idx"], pa.int64())
        )
        return pa.table({"doc_id": doc_id, "text": t["text"]})

    shutil.rmtree(out, ignore_errors=True)
    read_parquet_clean(corpus_dir).map_batches(
        to_docs, batch_format="pyarrow"
    ).write_parquet(out)
    with open(done, "w") as f:
        f.write(str(turns))
    return out


_BIG_DEDUP_OPS = ("dedup_exact", "dedup_minhash_lsh", "dup_span_fraction",
                  "dup_span_approx")


def bench_big_dedup() -> dict:
    """Dedup family at 2.4M documents (VERDICT r4 item 3): the Bloom
    vs broadcast-exact A/B where per-op scheduling overhead no longer
    dominates (at sf0.1 both read ~0.8 s and the A/B is meaningless)."""
    corpus_dir, turns = ensure_corpus(0.1, scale=20)
    docs_dir = ensure_documents(corpus_dir, turns)
    import __ray_entry__ as e

    qs = e.queries()
    out: dict = {"docs": turns}
    for name in _BIG_DEDUP_OPS:
        t0 = time.monotonic()
        try:  # one op failing must not cost the section's other numbers
            res = qs[name](docs_dir)
            if hasattr(res, "materialize"):
                res.materialize()
            out[name] = round(time.monotonic() - t0, 3)
        except Exception as ex:  # noqa: BLE001
            out[name] = {"error": f"{type(ex).__name__}: {ex}"}
    if isinstance(out.get("dup_span_approx"), float) and isinstance(
        out.get("dup_span_fraction"), float
    ) and out["dup_span_approx"]:
        out["bloom_speedup_x"] = round(
            out["dup_span_fraction"] / out["dup_span_approx"], 2
        )
    return out


def bench_ann(n_vectors: int = 131_072, dim: int = 64, reps: int = 50) -> dict:
    """Persistent ANN serving tier at depth: build-once cost for the
    sharded NSW index over a deterministic synthetic embedding table,
    then steady-state query latency through the long-lived shard
    actors (5 queries broadcast per call, p95 over ``reps`` calls)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from search_engine_ray.ops.knn import _load_queries
    from search_engine_ray.pipelines.ann_index import (
        AnnSearcher, build_ann_index,
    )

    emb_dir = os.path.join(BENCH_ROOT, f"emb-{n_vectors}")
    emb_file = os.path.join(emb_dir, "embeddings.parquet")
    if not os.path.exists(emb_file):
        os.makedirs(emb_dir, exist_ok=True)
        rng = np.random.default_rng(7)
        # clustered vectors (ANN on uniform noise is degenerate)
        centers = rng.standard_normal((256, dim)) * 2.0
        vecs = (
            centers[np.arange(n_vectors) % 256]
            + rng.standard_normal((n_vectors, dim)) * 0.3
        ).astype(np.float32)
        pq_.write_table(
            pa.table(
                {
                    "vec_id": pa.array(range(n_vectors), pa.int64()),
                    "embedding": pa.FixedSizeListArray.from_arrays(
                        pa.array(vecs.reshape(-1), pa.float32()), dim
                    ),
                }
            ),
            emb_file,
        )
    idx = os.path.join(BENCH_ROOT, f"ann-{n_vectors}")
    shutil.rmtree(idx, ignore_errors=True)  # build-once COST is the metric
    t0 = time.monotonic()
    meta = build_ann_index(emb_dir, idx, max_shard_rows=8_192)
    build_s = time.monotonic() - t0
    qids, qmat = _load_queries(emb_dir)

    def steady_state(index_dir, n_probe=None):
        searcher = AnnSearcher(index_dir)
        try:
            for _ in range(3):  # warm: actor import + first plasma fetch
                searcher.search_matrix(qids, qmat, n_probe=n_probe)
            lat = []
            for _ in range(reps):
                t1 = time.monotonic()
                last = searcher.search_matrix(qids, qmat, n_probe=n_probe)
                lat.append(time.monotonic() - t1)
        finally:
            searcher.close()
        return lat, last

    lat, _ = steady_state(idx)
    out = {
        "n_vectors": n_vectors,
        "n_shards": meta["n_shards"],
        "build_sec": round(build_s, 3),
        "build_vectors_per_sec": round(n_vectors / build_s, 1),
        "query_batch5_p95_ms": round(float(np.percentile(lat, 95)) * 1000, 2),
        "query_batch5_p50_ms": round(float(np.percentile(lat, 50)) * 1000, 2),
        "query_calls": reps,
    }
    # memory-tight store A/B: uint8 codes + graph in actor RAM, exact
    # vectors memmapped for rerank — same graph build, so the build
    # delta is quantize+sidecar write and the query delta is the
    # dequantizing navigation + rerank reads
    idx8 = os.path.join(BENCH_ROOT, f"ann-{n_vectors}-q8")
    shutil.rmtree(idx8, ignore_errors=True)
    t0 = time.monotonic()
    build_ann_index(emb_dir, idx8, max_shard_rows=8_192, store="q8")
    build8_s = time.monotonic() - t0
    lat8, _ = steady_state(idx8)
    npz_bytes = sum(
        os.path.getsize(os.path.join(idx, f))
        for f in os.listdir(idx) if f.endswith(".npz")
    )
    npz8_bytes = sum(
        os.path.getsize(os.path.join(idx8, f))
        for f in os.listdir(idx8) if f.endswith(".npz")
    )
    out["q8"] = {
        "build_sec": round(build8_s, 3),
        "query_batch5_p95_ms": round(float(np.percentile(lat8, 95)) * 1000, 2),
        "query_batch5_p50_ms": round(float(np.percentile(lat8, 50)) * 1000, 2),
        "actor_ram_bytes_f64": npz_bytes,
        "actor_ram_bytes_q8": npz8_bytes,
        "ram_shrink_x": round(npz_bytes / max(npz8_bytes, 1), 2),
    }
    shutil.rmtree(idx8, ignore_errors=True)
    # incremental maintenance: a 6.25% delta must cost a small fraction
    # of the full build (touched-shards-only rebuild; result parity
    # with a full rebuild is pytest-pinned, not re-proven here)
    from search_engine_ray.pipelines.ann_index import extend_ann_index

    delta_dir = os.path.join(BENCH_ROOT, f"emb-delta-{n_vectors}")
    delta_file = os.path.join(delta_dir, "embeddings.parquet")
    n_delta = n_vectors // 16
    if not os.path.exists(delta_file):
        os.makedirs(delta_dir, exist_ok=True)
        rng = np.random.default_rng(11)
        centers = rng.standard_normal((256, dim)) * 2.0
        dvecs = (
            centers[np.arange(n_delta) % 256]
            + rng.standard_normal((n_delta, dim)) * 0.3
        ).astype(np.float32)
        pq_.write_table(
            pa.table(
                {
                    "vec_id": pa.array(
                        range(n_vectors, n_vectors + n_delta), pa.int64()
                    ),
                    "embedding": pa.FixedSizeListArray.from_arrays(
                        pa.array(dvecs.reshape(-1), pa.float32()), dim
                    ),
                }
            ),
            delta_file,
        )
    t0 = time.monotonic()
    ext = extend_ann_index(idx, delta_dir)
    extend_s = time.monotonic() - t0
    out["extend"] = {
        "delta_vectors": n_delta,
        "extend_sec": round(extend_s, 3),
        "touched_shards": len(ext["touched_shards"]),
        "extend_vs_build_x": round(build_s / max(extend_s, 1e-9), 2),
    }
    # fan-out-pruning A/B: centroid-routed shards, each query probing
    # only its 2 nearest-centroid shards vs broadcasting to all 16 —
    # the per-query cost model of the 1000-shard deployment. Recall is
    # pruned-vs-broadcast on the same index (probe-width trade only).
    idxv = os.path.join(BENCH_ROOT, f"ann-{n_vectors}-ivf")
    shutil.rmtree(idxv, ignore_errors=True)
    t0 = time.monotonic()
    metav = build_ann_index(emb_dir, idxv, max_shard_rows=8_192,
                            routing="ivf")
    buildv_s = time.monotonic() - t0
    latv, resv = steady_state(idxv, n_probe=2)
    _, resb = steady_state(idxv)  # broadcast baseline on the same index
    pruned = {(int(a), int(b)) for a, b in zip(resv[0], resv[1])}
    full = {(int(a), int(b)) for a, b in zip(resb[0], resb[1])}
    out["ivf_routing"] = {
        "n_shards": metav["n_shards"],
        "n_probe": 2,
        "build_sec": round(buildv_s, 3),
        "query_batch5_p95_ms": round(float(np.percentile(latv, 95)) * 1000, 2),
        "query_batch5_p50_ms": round(float(np.percentile(latv, 50)) * 1000, 2),
        "recall_vs_broadcast": round(
            len(pruned & full) / max(len(full), 1), 4
        ),
    }
    shutil.rmtree(idxv, ignore_errors=True)
    return out


_BIG24_STORE_GB = 4.0  # object store cap for the memory-pressure run


def bench_big24(num_cpus: int) -> dict:
    """24M-turn (10x the big section) build + serving in a FRESH child
    process whose object store is capped at ~4 GB — well under the
    shuffle's working set, so the run exercises real spill-to-disk
    backpressure rather than fitting in RAM (VERDICT r3 item 1: convert
    the 100 TB design claims into measured evidence). The corpus is
    generated once here (parallel chunk tasks) and cached; the child
    reports build throughput, steady-state serving p95, and the
    raylet's own spill counters."""
    corpus_dir, turns = ensure_corpus(0.1, scale=200)
    out = os.path.join(BENCH_ROOT, "big24.json")
    subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--big24-child",
         "--corpus", corpus_dir, "--cpus", str(num_cpus), "--out", out],
        check=True, cwd=os.path.dirname(os.path.abspath(__file__)),
        stdout=subprocess.DEVNULL,
    )
    with open(out) as f:
        payload = json.load(f)
    payload["turns"] = turns
    return payload


def _session_spill_stats() -> dict:
    """Parse the current session raylet's cumulative spill line
    ('Spilled N MiB, M objects, ...')."""
    import glob as glob_
    import re

    try:
        import ray

        sess = ray._private.worker._global_node.get_session_dir_path()
    except Exception:  # noqa: BLE001 - fall back to newest session dir
        cands = sorted(glob_.glob(os.path.join(
            os.environ.get("RAY_TMPDIR", "/tmp/ray"), "ray", "session_2*")))
        sess = cands[-1] if cands else None
    out = {"spilled_mib": 0, "spilled_objects": 0}
    if not sess:
        return out
    raylet = os.path.join(sess, "logs", "raylet.out")
    if not os.path.exists(raylet):
        return out
    last = None
    with open(raylet, errors="ignore") as f:
        for line in f:
            m = re.search(r"Spilled (\d+) MiB, (\d+) objects", line)
            if m:
                last = m
    if last:
        out = {"spilled_mib": int(last.group(1)),
               "spilled_objects": int(last.group(2))}
    return out


def run_big24_child(corpus_dir: str, num_cpus: int, out_path: str) -> None:
    """Child: fresh Ray with a ~4 GB object store, full build at 10x
    depth + serving; records spill counters as the memory-pressure
    evidence."""
    import logging

    # serving-actor memo sized to the 10x shard depth (set BEFORE
    # ray.init so workers inherit it): the default 1 GiB budget
    # eviction-thrashes on this query mix's hot-term working set
    os.environ.setdefault("SERAY_CACHE_BUDGET_BYTES", str(4 << 30))

    import ray
    from ray.data import DataContext

    ray.init(
        address="local", num_cpus=num_cpus, include_dashboard=False,
        logging_level="ERROR",
        object_store_memory=int(_BIG24_STORE_GB * 2**30),
    )
    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    tag = "big24"
    t0 = time.monotonic()
    build_s = bench_build(corpus_dir, tag, n_partitions=16)
    idx = os.path.join(BENCH_ROOT, f"idx-{tag}")
    import pyarrow.parquet as pq

    turns = sum(
        pq.read_metadata(f).num_rows
        for f in __import__("glob").glob(os.path.join(corpus_dir, "*.parquet"))
    )
    payload = {
        "build_sec": round(build_s, 3),
        "turns_per_sec": round(turns / build_s, 1),
        "object_store_gb": _BIG24_STORE_GB,
        "wall_sec": round(time.monotonic() - t0, 3),
    }
    # shard count scales with depth (16 at 10x the big section): on a
    # real cluster this corpus spans more nodes, and per-query latency
    # is bounded by the largest shard's posting decode
    payload.update(_serving_latencies(idx, n_shards=16))
    payload.update(_session_spill_stats())
    with open(out_path, "w") as f:
        json.dump(payload, f)
    shutil.rmtree(idx, ignore_errors=True)  # 10x index: don't hoard /tmp
    ray.shutdown()


def scaling_small(pair: str = "4,16") -> dict:
    """One-rep CPU pair on the default (120k-turn) corpus, in fresh
    child processes — a cheap per-round regression signal for the
    scaling criterion. The authoritative 2.4M-turn pair (min of 2 reps)
    stays in `bench.py --scaling` / BASELINE.md; the small corpus is
    fixed-cost-heavier, so this efficiency reads a little lower.

    Capacity-aware: the VM's effective capacity swings with hypervisor
    steal (observed 5.7x-25.1x aggregate for 32 procs). A 16-CPU leg
    on a 6-effective-core host cannot run 4x faster than a 4-CPU leg
    no matter what the engine does, so the payload always embeds the
    pre-run calibration plus the leg-size-specific hardware ceiling
    (``pair_ceiling`` — the best efficiency a PERFECTLY scaling engine
    could read) and ``efficiency_vs_ceiling``. Pair
    downgrade is deliberately NOT done here: on the small corpus the
    (1,4)/(2,8) pairs are fixed-cost-dominated (measured 0.26 at
    (1,4)) and under-read worse than the ceiling-annotated 4,16;
    `bench.py --scaling` owns the downgrade path with its
    proportionally scaled corpus."""
    corpus_dir, turns = ensure_corpus(0.1)
    cpus_lo, cpus_hi = (int(x) for x in pair.split(","))
    calib = host_calibration()
    # min of 2 INTERLEAVED legs (lo, hi, lo, hi), same as --scaling:
    # host capacity drifts on minute timescales, so a single rep per
    # leg reads whatever steal window it happened to land in (the r3
    # driver payload's 0.783 vs same-round clean 0.876)
    secs = {n: float("inf") for n in (cpus_lo, cpus_hi)}
    for rep in range(2):
        for n in (cpus_lo, cpus_hi):
            out = os.path.join(BENCH_ROOT, f"scale-small-{n}-r{rep}.json")
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 "--corpus", corpus_dir, "--cpus", str(n), "--out", out,
                 "--reps", "1"],
                check=True, cwd=os.path.dirname(os.path.abspath(__file__)),
                stdout=subprocess.DEVNULL,
            )
            with open(out) as f:
                secs[n] = min(secs[n], json.load(f)["seconds"])
    eff = (secs[cpus_lo] / secs[cpus_hi]) / (cpus_hi / cpus_lo)
    # leg-size-specific ceiling (see pair_ceiling): the 32-proc
    # aggregate overstates what an 8- or 16-proc leg can actually get
    ceil = pair_ceiling(cpus_lo, cpus_hi)
    return {
        "pair": [cpus_lo, cpus_hi],
        "turns": turns,
        "seconds": {str(n): round(s, 3) for n, s in secs.items()},
        "efficiency": round(eff, 3),
        "host_calibration_before": calib,
        "pair_hardware_ceiling": ceil,
        "efficiency_vs_ceiling": round(min(eff / ceil["ceiling"], 1.0), 3),
    }


def run_main(sf_dir: str, num_cpus: int, fast: bool = False) -> None:
    ray = _quiet_ray(num_cpus)
    sf = _sf_of(sf_dir)
    corpus_dir, turns = ensure_corpus(sf)
    tag = f"main-{turns}"

    queries: dict[str, float] = {}
    build_s = bench_build(corpus_dir, tag)
    queries["index_build"] = round(build_s, 3)
    queries.update(bench_queries(tag))
    queries.update(bench_gate_ops(sf_dir))
    # deep sections are best-effort: a failure there must never cost
    # the one-JSON-line contract for the sections that did run
    big = scaling = big24 = big_dedup = ann = None
    if not fast:
        try:
            big = bench_big()
        except Exception as ex:  # noqa: BLE001
            big = {"error": f"{type(ex).__name__}: {ex}"}
        try:
            big_dedup = bench_big_dedup()
        except Exception as ex:  # noqa: BLE001
            big_dedup = {"error": f"{type(ex).__name__}: {ex}"}
        try:
            ann = bench_ann()
        except Exception as ex:  # noqa: BLE001
            ann = {"error": f"{type(ex).__name__}: {ex}"}
        try:
            # parallel chunk generation uses the LIVE parent session;
            # the memory-pressure child itself runs after shutdown so
            # it doesn't fight a parked 32-CPU session for cores
            ensure_corpus(0.1, scale=200)
        except Exception as ex:  # noqa: BLE001
            big24 = {"error": f"corpus: {type(ex).__name__}: {ex}"}
    ray.shutdown()
    hash_delta = None
    if not fast:
        if big24 is None:
            try:
                big24 = bench_big24(num_cpus)
            except Exception as ex:  # noqa: BLE001
                big24 = {"error": f"{type(ex).__name__}: {ex}"}
        try:
            scaling = scaling_small()
        except Exception as ex:  # noqa: BLE001
            scaling = {"error": f"{type(ex).__name__}: {ex}"}
        try:
            hash_delta = fast_hash_delta(sf_dir, num_cpus, queries)
        except Exception as ex:  # noqa: BLE001
            hash_delta = {"error": f"{type(ex).__name__}: {ex}"}

    # "value" stays the small-section total (comparable across rounds);
    # the deep sections ride alongside without inflating it
    total = sum(v for k, v in queries.items() if not k.endswith("_ms"))
    payload = {
        "metric": "index-build + BM25 query over transcript corpus",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": num_cpus,
        "turns": turns,
        "turns_per_sec": round(turns / build_s, 1),
        "query_p95_ms": queries["query_p95_ms"],
    }
    if big is not None:
        payload["big_2p4m"] = big
    if big_dedup is not None:
        payload["big_2p4m_dedup"] = big_dedup
    if ann is not None:
        payload["ann_serving"] = ann
    if big24 is not None:
        payload["big_24m"] = big24
    if scaling is not None:
        payload["scaling_small"] = scaling
    if hash_delta is not None:
        payload["fast_hash"] = hash_delta
    payload["host_calibration"] = host_calibration()
    print(json.dumps(payload))


_FAST_HASH_OPS = ("dedup_minhash_lsh", "dup_span_fraction")


def run_hash_child(sf_dir: str, num_cpus: int, out_path: str) -> None:
    """Child process for the fast-hash delta: SERAY_FAST_HASH is set in
    the environment BEFORE this process starts Ray, so the xxhash path
    engages in every worker (the flag travels via config's env read at
    module import — a driver-side attribute flip does not propagate)."""
    ray = _quiet_ray(num_cpus)
    import __ray_entry__ as e

    qs = e.queries()
    res = {}
    for name in _FAST_HASH_OPS:
        t0 = time.monotonic()
        r = qs[name](sf_dir)
        if hasattr(r, "materialize"):
            r.materialize()
        res[name] = round(time.monotonic() - t0, 3)
    with open(out_path, "w") as f:
        json.dump(res, f)
    ray.shutdown()


def _hash_kernel_rates(n: int = 1_000_000) -> dict:
    """Single-process rows/sec of the two content-hash kernels over n
    synthetic shingle-sized strings — isolates the kernel cost that
    op-level wall times hide (at sf scales the dedup ops are
    shuffle/scheduling-dominated, so the per-row md5 loop is invisible
    there; at 100 TB it is not)."""
    import pyarrow as pa

    import search_engine_ray.config as config
    from search_engine_ray.ops.dedup import _hash60

    # an Arrow string array, exactly what the batch kernels hand in —
    # a numpy object array would charge the xxhash leg an Arrow
    # conversion the real pipeline never pays
    strs = pa.array(
        [f"tok{i % 997} tok{i % 89} tok{i % 7}" for i in range(n)], pa.string()
    )
    out = {}
    warm = strs.slice(0, 1000)
    for label, flag in (("md5_60", False), ("xxhash", True)):
        prev = config.FAST_CONTENT_HASH
        config.FAST_CONTENT_HASH = flag  # driver-local flip is fine here
        try:
            _hash60(warm)  # amortize one-time import/init out of the rate
            t0 = time.monotonic()
            _hash60(strs)
            out[label] = round(n / (time.monotonic() - t0), 0)
        finally:
            config.FAST_CONTENT_HASH = prev
    out["speedup"] = round(out["xxhash"] / out["md5_60"], 1)
    return out


def fast_hash_delta(sf_dir: str, num_cpus: int, md5_times: dict) -> dict:
    """Production-hash evidence, per VERDICT r2 item 6: (a) the kernel
    rate of md5-60 vs vectorized xxhash (the real per-row win), and (b)
    an op-level A/B — the hash-heaviest gate ops timed in fresh,
    BACK-TO-BACK child processes for both hash configs (one leg each,
    adjacent in time): earlier rounds compared the xx child against
    md5 numbers from minutes earlier in the run, and host-capacity
    drift dwarfed the delta. At sf benchmark sizes (b) is still mostly
    shuffle/scheduling; (a) is what scales."""
    legs = {}
    for label, flag in (("md5_60", "0"), ("xxhash", "1")):
        out = os.path.join(BENCH_ROOT, f"fast-hash-{label}.json")
        env = dict(os.environ)
        env["SERAY_FAST_HASH"] = flag
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--hash-child",
             "--sf-dir", sf_dir, "--cpus", str(num_cpus), "--out", out],
            check=True, cwd=os.path.dirname(os.path.abspath(__file__)),
            stdout=subprocess.DEVNULL, env=env,
        )
        with open(out) as f:
            legs[label] = json.load(f)
    return {
        "kernel_rows_per_sec": _hash_kernel_rates(),
        "in_run_md5_60": {k: md5_times[k] for k in _FAST_HASH_OPS if k in md5_times},
        "md5_60": legs["md5_60"],
        "xxhash": legs["xxhash"],
    }


def run_child(corpus_dir: str, num_cpus: int, out_path: str, reps: int = 2) -> None:
    """Child process: fresh Ray at num_cpus, min-of-reps build time."""
    ray = _quiet_ray(num_cpus)
    tag = f"scale-{num_cpus}"
    secs = min(bench_build(corpus_dir, f"{tag}-{r}") for r in range(reps))
    for r in range(reps):
        shutil.rmtree(os.path.join(BENCH_ROOT, f"idx-{tag}-{r}"), ignore_errors=True)
    with open(out_path, "w") as f:
        json.dump({"num_cpus": num_cpus, "seconds": round(secs, 3)}, f)
    ray.shutdown()


def run_scaling(sf_dir: str, pair: str) -> None:
    """Same input, fresh process per parallelism level (N vs 4N CPUs),
    min of 2 INTERLEAVED builds per level (lo, hi, lo, hi — see the
    leg loop). Default pair 4,16: a pure-CPU burn test
    shows this VM saturates at ~25x single-core throughput for 32
    processes, so an 8->32 pair measures hardware saturation (ceiling
    ~0.77), not the engine; 4 and 16 both sit in the linear region —
    see BASELINE.md for the full curve and both pairs.

    The VM's effective capacity also swings with hypervisor steal
    (observed 6.8x-25.1x): when the pre-run calibration shows fewer
    effective cores than ~1.5x the high level, the requested pair is
    physically unmeasurable (a 16-CPU run on a 7-core-capacity host
    cannot go 4x faster than a 4-CPU run), so the pair auto-steps down
    (4,16)->(2,8)->(1,4) with a proportionally smaller corpus, and the
    payload records both the calibration and any downgrade."""
    sf = _sf_of(sf_dir)
    cpus_lo, cpus_hi = (int(x) for x in pair.split(","))
    calib = host_calibration()
    capacity = calib["agg32_x"]
    requested = (cpus_lo, cpus_hi)
    # corpus scale keeps the low-level build ~2 min: ~5k turns/sec/core
    ladder = {(4, 16): 20, (2, 8): 10, (1, 4): 5}
    # halve only while both levels stay positive — an off-ladder pair
    # (e.g. 6,24) must bottom out at (1, hi) rather than reach
    # num_cpus=0 and hang the child
    while capacity < 1.5 * cpus_hi and cpus_lo >= 2 and cpus_hi >= 8:
        cpus_lo, cpus_hi = cpus_lo // 2, cpus_hi // 2
    # off-ladder pairs scale the corpus by the high level so the low
    # leg stays ~2 min instead of inheriting the (4,16) corpus
    scale = ladder.get((cpus_lo, cpus_hi), max(5, cpus_hi))
    # 20x the default corpus at the 4,16 pair: the engine builds ~5k
    # turns/sec/core, so a smaller input is fixed-cost-dominated and
    # understates scaling
    corpus_dir, turns = ensure_corpus(sf, scale=scale)
    # INTERLEAVED legs (lo, hi, lo, hi), min per leg: the host's
    # capacity drifts on minute timescales (observed 10x-27x within one
    # session), so two consecutive reps of the same leg share the same
    # drift and bias the ratio — alternating legs exposes both to the
    # same capacity trajectory and the per-leg min picks each leg's
    # healthiest window
    results = {n: float("inf") for n in (cpus_lo, cpus_hi)}
    for rep in range(2):
        for n in (cpus_lo, cpus_hi):
            out = os.path.join(BENCH_ROOT, f"scale-{n}-r{rep}.json")
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 "--corpus", corpus_dir, "--cpus", str(n), "--out", out,
                 "--reps", "1"],
                check=True, cwd=os.path.dirname(os.path.abspath(__file__)),
                stdout=subprocess.DEVNULL,
            )
            with open(out) as f:
                results[n] = min(results[n], json.load(f)["seconds"])
    thr = {n: turns / s for n, s in results.items()}
    eff = (thr[cpus_hi] / thr[cpus_lo]) / (cpus_hi / cpus_lo)
    ceil = pair_ceiling(cpus_lo, cpus_hi)
    print(json.dumps({
        "metric": "index-build scaling efficiency (N vs 4N CPUs, fresh sessions)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "queries": {f"build_cpus{n}": round(results[n], 3) for n in results},
        "sf": sf,
        "num_cpus": cpus_hi,
        "turns": turns,
        "throughput_turns_per_sec": {str(n): round(t, 1) for n, t in thr.items()},
        "scaling_efficiency": round(eff, 3),
        "host_calibration_before": calib,
        "host_calibration_after": host_calibration(),
        "pair_hardware_ceiling": ceil,
        "efficiency_vs_ceiling": round(min(eff / ceil["ceiling"], 1.0), 3),
        "requested_pair": list(requested),
        "measured_pair": [cpus_lo, cpus_hi],
    }))


def run_qps(num_cpus: int) -> None:
    """Serving THROUGHPUT under concurrent clients (the latency bench
    is sequential): N driver threads fire the reference query mix at a
    doc-sharded searcher over the 2.4M-turn index; reports QPS and
    in-flight p95 per concurrency level, scoring path and result-cache
    path. The searcher is the same object serve.py hands to its
    ThreadingHTTPServer, so this measures the production concurrency
    path (locked byte-budget LRU, pipelined per-shard calls)."""
    import threading

    import numpy as np

    from search_engine_ray.corpus import make_queries
    from search_engine_ray.pipelines.search import DocShardedSearcher

    ray = _quiet_ray(num_cpus, namespace="seray-qps")
    corpus_dir, turns = ensure_corpus(0.1, scale=20)
    tag = f"big-{turns}"
    idx = os.path.join(BENCH_ROOT, f"idx-{tag}")
    if not os.path.exists(os.path.join(idx, "meta.json")):
        bench_build(corpus_dir, tag)
    qdf = make_queries(N_QUERIES)
    queries = [(q, int(k)) for q, k in zip(qdf["query"], qdf["k"])]
    out: dict = {"turns": turns, "n_shards": 8, "levels": {}}
    for n_replicas in (1, 4):
        searcher = DocShardedSearcher(idx, n_shards=8, n_replicas=n_replicas)
        try:
            # warm EVERY replica set directly (round-robin with 50
            # queries mod 4 replicas only ever touches 2 of the 4 —
            # gcd(50,4)=2 — leaving cold replicas in the timed passes)
            for rs in searcher._replica_sets:
                for q, k in queries:
                    ray.get([s.search.remote(q, k, "OR", False) for s in rs])
            for result_cache in (False, True):
                if result_cache:
                    for rs in searcher._replica_sets:  # populate caches
                        for q, k in queries:
                            ray.get([s.search.remote(q, k, "OR", True) for s in rs])
                for n_threads in (1, 4, 16):
                    passes = 4 if n_threads == 1 else 2 * n_threads
                    lat: list = []
                    lock = threading.Lock()

                    def client(tid: int):
                        local = []
                        for _ in range(passes // n_threads or 1):
                            for q, k in queries:
                                t0 = time.monotonic()
                                searcher.search(
                                    q, k, mode="OR", result_cache=result_cache
                                )
                                local.append(time.monotonic() - t0)
                        with lock:
                            lat.extend(local)

                    threads = [
                        threading.Thread(target=client, args=(i,))
                        for i in range(n_threads)
                    ]
                    t0 = time.monotonic()
                    for t in threads:
                        t.start()
                    for t in threads:
                        t.join()
                    wall = time.monotonic() - t0
                    key = (
                        f"{'cache' if result_cache else 'score'}"
                        f"_r{n_replicas}_c{n_threads}"
                    )
                    out["levels"][key] = {
                        "qps": round(len(lat) / wall, 1),
                        "p95_ms": round(float(np.percentile(lat, 95)) * 1000, 2),
                        "p50_ms": round(float(np.percentile(lat, 50)) * 1000, 2),
                        "samples": len(lat),
                    }
        finally:
            searcher.close()
    try:
        out["frontends"] = _qps_frontends(ray, idx, queries)
    except Exception as ex:  # noqa: BLE001 - best-effort subsection
        out["frontends"] = {"error": f"{type(ex).__name__}: {ex}"}
    out["host_calibration"] = host_calibration()
    ray.shutdown()
    print(json.dumps(out))


def _qps_frontends(ray, idx: str, queries: list) -> dict:
    """Multi-process frontends over ONE shared shard-actor set
    (VERDICT r4 item 4): the single-driver QPS ceiling (~150-225) is
    the frontend process itself — GIL + submission lock — while the
    shard actors idle; serve.py holds no index state, so frontends
    replicate for free. One owner process registers NAMED actors
    (n_replicas=4 so the actor side is not the bottleneck); 1, 2 and 4
    sibling processes attach via FrontendAttachedSearcher and hammer
    the same query mix at 16 total client threads. Moves-the-ceiling
    evidence = qps(k frontends) / qps(1 frontend) — the curve, not one
    ratio, is the cluster-scale story (frontends replicate for free on
    separate nodes; here they contend for the same 32 CPUs)."""
    from search_engine_ray.pipelines.search import DocShardedSearcher

    owner = DocShardedSearcher(idx, n_shards=8, n_replicas=4,
                               name_prefix="qpsfe")
    gcs = ray.get_runtime_context().gcs_address
    out: dict = {}
    try:
        # warm every replica set's scoring memos directly
        for rs in owner._replica_sets:
            for q, k in queries:
                ray.get([s.search.remote(q, k, "OR", False) for s in rs])
        names = owner.actor_names()
        for n_frontends in (1, 2, 4):
            threads_per = 16 // n_frontends
            spec = {
                "gcs": gcs, "namespace": "seray-qps", "index_dir": idx,
                "names": names, "n_threads": threads_per,
                "passes": 2 * threads_per, "queries": queries,
                "result_cache": False,
            }
            procs = []
            for fi in range(n_frontends):
                spec_f = os.path.join(BENCH_ROOT, f"qpsfe-spec-{fi}.json")
                out_f = os.path.join(BENCH_ROOT, f"qpsfe-out-{fi}.json")
                with open(spec_f, "w") as f:
                    json.dump({**spec, "out": out_f}, f)
                env = dict(os.environ)
                env.pop("RAY_ADDRESS", None)  # would force a new cluster
                procs.append((subprocess.Popen(
                    [sys.executable, os.path.abspath(__file__),
                     "--qps-frontend", "--spec", spec_f],
                    stdout=subprocess.DEVNULL, env=env,
                    cwd=os.path.dirname(os.path.abspath(__file__)),
                ), out_f))
            results = []
            for p, out_f in procs:
                rc = p.wait(timeout=600)
                if rc == 0:
                    with open(out_f) as f:
                        results.append(json.load(f))
            key = f"fe{n_frontends}_c16"
            out[key] = {
                "qps": round(sum(r["qps"] for r in results), 1),
                "p95_ms": round(max(r["p95_ms"] for r in results), 2),
                "frontends_ok": len(results),
            }
        base = out.get("fe1_c16", {}).get("qps")
        if base:
            out["ceiling_moved_x"] = round(out["fe2_c16"]["qps"] / base, 2)
            if out.get("fe4_c16", {}).get("qps"):
                out["ceiling_moved_x4"] = round(out["fe4_c16"]["qps"] / base, 2)
    finally:
        owner.close()
    return out


def run_qps_frontend(spec_path: str) -> None:
    """Child frontend process: attach to the owner's named shard
    actors on the SAME cluster (explicit GCS address + namespace) and
    run the client thread loop; writes {qps, p95_ms} to spec['out']."""
    import threading

    import numpy as np
    import ray

    from search_engine_ray.pipelines.search import FrontendAttachedSearcher

    with open(spec_path) as f:
        spec = json.load(f)
    ray.init(address=spec["gcs"], namespace=spec["namespace"],
             logging_level="ERROR")
    fe = FrontendAttachedSearcher(spec["index_dir"], spec["names"])
    queries = [(q, int(k)) for q, k in spec["queries"]]
    n_threads, passes = int(spec["n_threads"]), int(spec["passes"])
    rc_flag = bool(spec["result_cache"])
    for q, k in queries:  # per-process warmup (import/first-call costs)
        fe.search(q, k, mode="OR", result_cache=rc_flag)
    lat: list = []
    lock = threading.Lock()

    def client(_tid: int):
        local = []
        for _ in range(passes // n_threads or 1):
            for q, k in queries:
                t0 = time.monotonic()
                fe.search(q, k, mode="OR", result_cache=rc_flag)
                local.append(time.monotonic() - t0)
        with lock:
            lat.extend(local)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(n_threads)]
    t0 = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0
    with open(spec["out"], "w") as f:
        json.dump({
            "qps": round(len(lat) / wall, 1),
            "p95_ms": round(float(np.percentile(lat, 95)) * 1000, 2),
            "samples": len(lat),
            "wall": round(wall, 3),
        }, f)
    fe.close()
    ray.shutdown()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scaling", action="store_true")
    p.add_argument("--pair", default="4,16",
                   help="scaling mode: 'N,4N' CPU counts (see run_scaling)")
    p.add_argument("--child", action="store_true")
    p.add_argument("--hash-child", action="store_true")
    p.add_argument("--big24-child", action="store_true")
    p.add_argument("--corpus")
    p.add_argument("--out")
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--fast", action="store_true",
                   help="skip the 2.4M-turn and small-scaling sections")
    p.add_argument("--qps", action="store_true",
                   help="serving throughput under concurrent clients")
    p.add_argument("--qps-frontend", action="store_true",
                   help="internal: attached-frontend child (see --qps)")
    p.add_argument("--spec", help="spec json for --qps-frontend")
    p.add_argument("--cpus", type=int,
                   default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    p.add_argument("--sf-dir", default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    a = p.parse_args()
    os.makedirs(BENCH_ROOT, exist_ok=True)
    if a.child:
        run_child(a.corpus, a.cpus, a.out, a.reps)
    elif a.big24_child:
        run_big24_child(a.corpus, a.cpus, a.out)
    elif a.hash_child:
        run_hash_child(a.sf_dir, a.cpus, a.out)
    elif a.qps_frontend:
        run_qps_frontend(a.spec)
    elif a.qps:
        run_qps(a.cpus)
    elif a.scaling:
        run_scaling(a.sf_dir, a.pair)
    else:
        run_main(a.sf_dir, a.cpus, a.fast)


if __name__ == "__main__":
    main()
