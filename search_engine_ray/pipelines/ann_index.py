"""Persistent ANN serving tier: build-once per-shard NSW graphs hosted
by long-lived actors (VERDICT r4 item 1 — the vector twin of the text
tier's ``DocShardActor``, `pipelines/search.py:156`).

Reference analog: the reference keeps its index resident in the KVS
and serves point-gets against it
(`/root/reference/src/cis5550/jobs/Search.java:236`); ``knn_hnsw``'s
per-invocation ``map_groups`` rebuild is the batch analog. This module
completes the serving story:

- ``build_ann_index``: one Ray job shards the vectors by
  ``vec_id & (n_shards - 1)`` (auto-sized: power-of-two ceil of
  rows / max_shard_rows — the same auto-scaling contract as dedup's
  ``_emb_rows_for``, fixing the fixed-``_HNSW_SHARDS`` scale killer),
  builds ONE independent NSW graph per shard inside ``map_groups``,
  and WRITES each graph from its own task (``.npz``: sorted vec_ids,
  unit-normalized float64 vectors, int32 neighbor lists) — the driver
  never holds a graph. Resumable layout: one file per shard under a
  manifest, so a re-run skips finished shards (fingerprint-checked).
- ``VecShardActor``: loads its shard file ONCE in ``__init__``
  (restart-safe: plain-path constructor args) and answers a query
  batch with its local top-k — per-query network is O(k) rows.
- ``AnnSearcher``: driver-side scatter-gather. The query matrix ships
  once per call via ``ray.put`` (zero-copy plasma fetch per actor, not
  re-serialized per task); the merge is the same deterministic
  (sim desc, vec_id asc) kernel the batch path uses, so actor-served
  results are BIT-IDENTICAL to ``knn_hnsw``'s map_groups path at the
  same (n_shards, m, ef) — pinned by tests/test_ann_serving.py.

Scale notes (100 TB): shard files live on shared storage like the text
index's segments; each actor holds one shard's vectors + graph
(~(dim*8 + m*4) bytes/vector — float64 here for bit-parity with the
exact-cosine scorer). The memory-tight deployment is ``store="q8"``:
the actor's RAM holds uint8 codes (+ per-vector affine scalars, the
``ops/knn.embedding_quantize`` scheme) and the graph — ~(dim + 16 +
m*4) bytes/vector, 8x smaller on the vector payload — while the exact
unit vectors stay ON DISK (one ``.vec.npy`` per shard, memmapped).
Beam navigation runs over dequantized approximations; the final
candidate pool (top k*refine) is reranked by O(k*refine) memmap row
reads against the exact vectors, so reported sims remain EXACT
cosines — quantization can only cost recall, never corrupt a score
(pytest: sims equal brute-force cosines bitwise after rounding;
recall >= 0.9 vs the f64 tier on clustered data).

Fan-out: with the default ``routing="hash"`` every query broadcasts to
all shards — fine at tens of shards, wasteful at thousands.
``routing="ivf"`` assigns vectors to their nearest coarse centroid
(``ops/knn.train_ivf_centroids`` — sampled distributed k-means, driver
holds k x dim only) instead of hashing ids, persists the centroid
matrix beside the shards, and ``AnnSearcher`` then routes each query
to only its ``n_probe`` nearest-centroid cells: per-query work is
O(n_probe), independent of the shard count, which is what keeps the
tier queryable when a 100 TB corpus needs thousands of shards. The
trade is the standard IVF one: recall depends on the probe width
(pytest-bounded on clustered data). Cell sizes follow the data's
cluster structure, so the shard-size bound is enforced two-level: a
cell whose EXACT row count (one pruned counting scan) exceeds
``max_shard_rows`` splits into vec_id-hashed sub-shards, each bounded;
probing a cell probes all its sub-shards, so splitting bounds build
task time and actor memory under cluster skew without ever narrowing
the candidate set (pytest: skewed corpus, per-shard bound + sub-shard
union + recall pinned).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..ops.knn import (
    _HNSW_EF, _HNSW_M, _MAX_SHARD_ROWS, _TOP_K, _emb_matrix, _load_queries,
    _nsw_build, _nsw_search, _read_emb, hnsw_shards_for,
)


def _shard_file(index_dir: str, shard: int) -> str:
    return os.path.join(index_dir, f"shard-{shard}.npz")


def _vec_file(index_dir: str, shard: int) -> str:
    """Exact-vector sidecar for ``store="q8"`` shards: memmapped by the
    actor for rerank row reads, never loaded whole."""
    return os.path.join(index_dir, f"shard-{shard}.vec.npy")


class _Q8View:
    """Duck-typed matrix over uint8 codes + per-row affine scalars:
    ``view[idx]`` dequantizes just those rows, which is all
    ``_nsw_search`` needs (``v[entry]``, ``v[neigh]``). Keeps the one
    beam-search kernel shared between the f64 and q8 stores."""

    __slots__ = ("codes", "qmin", "qscale")

    def __init__(self, codes: np.ndarray, qmin: np.ndarray, qscale: np.ndarray):
        self.codes, self.qmin, self.qscale = codes, qmin, qscale

    def __getitem__(self, idx):
        c = self.codes[idx].astype(np.float64)
        if c.ndim == 1:
            return c * self.qscale[idx] + self.qmin[idx]
        return c * self.qscale[idx, None] + self.qmin[idx, None]


_Q8_REFINE = 4  # rerank pool = k * refine approx candidates (ops/knn._PQ_REFINE)


def _centroid_file(index_dir: str) -> str:
    return os.path.join(index_dir, "centroids.npy")


def _sub_shard(vid: np.ndarray, nsub_of_cell: np.ndarray) -> np.ndarray:
    """Sub-shard offset within a split cell: a raw ``vid % nsub`` would
    inherit any stride structure in the id space (ids assigned
    round-robin across sources land on one residue), so mix first
    (splitmix64 multiply-shift), then mod."""
    h = (vid.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(17)
    return (h % nsub_of_cell.astype(np.uint64)).astype(np.int64)


def _cell_counts(sf_dir: str, centroids: np.ndarray) -> np.ndarray:
    """EXACT per-cell row counts (one pruned scan of the embeddings
    table; each batch returns a partial bincount, reduced by a tiny
    k-row groupby) — the sampled k-means counts are approximate and a
    skew-proof shard-size bound needs the real ones. Driver holds
    O(n_cells), never the table."""
    from ray.data.aggregate import Sum

    k = len(centroids)
    cref = ray.put(centroids)

    def partial(t: pa.Table) -> pa.Table:
        v = _emb_matrix(t["embedding"])
        v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        bc = np.bincount(np.argmax(v @ ray.get(cref).T, axis=1), minlength=k)
        return pa.table({"cell": pa.array(range(k), pa.int32()),
                         "n": pa.array(bc.astype(np.int64), pa.int64())})

    rows = (
        _read_emb(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )  # O(n_cells) tiny rows
    counts = np.zeros(k, np.int64)
    for r in rows:
        counts[int(r["cell"])] = int(r["n"])
    return counts


def build_ann_index(sf_dir: str, index_dir: str, *, n_shards: int | None = None,
                    m: int = _HNSW_M, ef: int = _HNSW_EF,
                    max_shard_rows: int = _MAX_SHARD_ROWS,
                    store: str = "f64", routing: str = "hash") -> dict:
    """Build (or resume) the persistent NSW index over
    ``{sf_dir}/embeddings.parquet``. Graphs are written from the
    map_groups tasks (atomic tmp+rename per shard); a finished shard
    is skipped on re-run when the meta fingerprint matches. Returns
    the meta dict. ``store="q8"`` writes int8-quantized codes to the
    npz and the exact vectors to a memmap sidecar (see module
    docstring); the graph itself is always built over the EXACT unit
    vectors, so quantization never degrades graph topology."""
    from ..io import parquet_rows

    assert store in ("f64", "q8"), store
    assert routing in ("hash", "ivf"), routing
    src = os.path.join(sf_dir, "embeddings.parquet")
    n_rows = parquet_rows(src) or 0
    if n_shards is None:
        n_shards = hnsw_shards_for(n_rows, max_shard_rows)
    assert n_shards & (n_shards - 1) == 0, "n_shards must be a power of 2"
    meta = {"kind": "nsw", "n_shards": int(n_shards), "m": int(m),
            "ef": int(ef), "source_rows": int(n_rows), "source": src,
            "store": store, "routing": routing,
            "max_shard_rows": int(max_shard_rows)}
    os.makedirs(index_dir, exist_ok=True)
    meta_path = os.path.join(index_dir, "meta.json")
    old = None
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            old = json.load(f)

    cref = None
    if routing == "ivf":
        # Two-level layout: n_shards is the CELL count; a cell whose
        # exact row count exceeds max_shard_rows splits into
        # ceil(count / max_shard_rows) vec_id-hashed sub-shards, so the
        # per-shard build task and actor memory stay bounded under
        # cluster skew (the hash tier's guarantee, kept here). Probing
        # a cell probes all its sub-shards — the candidate set is
        # identical to the unsplit cell's, so splitting never costs
        # recall. Layout is computed BEFORE the meta fingerprint
        # because the total shard count is data-dependent.
        cpath = _centroid_file(index_dir)
        fixed = {k: meta[k] for k in ("kind", "source_rows", "source",
                                      "routing", "max_shard_rows")}
        reuse = (
            old is not None and os.path.exists(cpath)
            and {k: old.get(k) for k in fixed} == fixed
            and old.get("n_cells") == n_shards and "cell_sub" in old
        )
        if reuse:  # resume MUST reuse assignments
            centroids = np.load(cpath)
            nsub = np.asarray(old["cell_sub"], np.int64)
        else:
            from ..ops.knn import train_ivf_centroids

            centroids = train_ivf_centroids(sf_dir, n_lists=n_shards)
            if len(centroids) < n_shards:  # tiny table: pad with copies
                pad = np.repeat(centroids[:1], n_shards - len(centroids), 0)
                centroids = np.vstack([centroids, pad])
            counts = _cell_counts(sf_dir, centroids)
            # 12.5% headroom: sub-shard membership is hash-split, so
            # the per-shard bound is statistical — sizing to 7/8 of the
            # cap keeps hash-balance deviation inside max_shard_rows
            nsub = np.maximum(
                1, -(-counts // max(1, max_shard_rows * 7 // 8))
            )
            with open(cpath + ".tmp", "wb") as f:
                np.save(f, centroids)
            os.replace(cpath + ".tmp", cpath)
        base = np.concatenate(([0], np.cumsum(nsub)))[:-1]
        meta["n_cells"] = int(n_shards)
        meta["n_shards"] = int(nsub.sum())
        meta["cell_sub"] = [int(x) for x in nsub]
        cref = ray.put((centroids, base, nsub))
    n_total = int(meta["n_shards"])

    done = set()
    if old is not None:
        if {k: old.get(k) for k in meta} == meta:
            done = {
                s for s in range(n_total)
                if os.path.exists(_shard_file(index_dir, s))
                and (store != "q8" or os.path.exists(_vec_file(index_dir, s)))
            }
            if routing == "ivf" and not reuse:
                # shards on disk were assigned by a centroid file that
                # no longer exists; a retrain (even a deterministic
                # one) cannot vouch for them — rebuild everything
                done = set()
            if len(done) == n_total:
                return old
        else:  # config/source changed: rebuild everything (the centroid
            # file is NOT removed — it was just validated or rewritten)
            for s in range(max(n_total, int(old.get("n_shards", 0)))):
                for p in (_shard_file(index_dir, s), _vec_file(index_dir, s)):
                    try:
                        os.remove(p)
                    except FileNotFoundError:
                        pass

    def add_shard(t: pa.Table) -> pa.Table:
        if routing == "ivf":
            v = _emb_matrix(t["embedding"])
            v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            c, b, ns = ray.get(cref)
            cell = np.argmax(v @ c.T, axis=1)
            vid = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False),
                             np.int64)
            shard = pa.array(
                (b[cell] + _sub_shard(vid, ns[cell])).astype(np.int32),
                pa.int32(),
            )
        else:
            shard = pc.cast(
                pc.bit_wise_and(t["vec_id"], n_shards - 1), pa.int32()
            )
        t = t.append_column("shard", shard)
        if done:  # resumed run: finished shards never enter the shuffle
            t = t.filter(
                pc.invert(pc.is_in(t["shard"],
                                   pa.array(sorted(done), pa.int32())))
            )
        return t

    def build_and_write(group: pa.Table) -> pa.Table:
        shard = int(group["shard"][0].as_py())
        if shard in done:  # resumed run: this shard is already on disk
            return pa.table({"shard": pa.array([shard], pa.int32()),
                             "n_rows": pa.array([-1], pa.int64())})
        vids = group["vec_id"].to_numpy()
        order = np.argsort(vids, kind="stable")  # deterministic inserts
        vids = vids[order]
        v = _emb_matrix(group["embedding"])[order]
        v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        nbr = _nsw_build(v, m=m, ef=ef)
        path = _shard_file(index_dir, shard)
        tmp = path + f".tmp-{os.getpid()}"
        if store == "q8":
            mn = v.min(axis=1)
            scale = np.maximum(v.max(axis=1) - mn, 1e-12) / 255.0
            codes = np.floor(
                (v - mn[:, None]) / scale[:, None] + 0.5
            ).astype(np.uint8)
            vpath = _vec_file(index_dir, shard)
            vtmp = vpath + f".tmp-{os.getpid()}"
            with open(vtmp, "wb") as f:
                np.save(f, v)  # exact vectors: rerank sidecar, memmapped
            os.replace(vtmp, vpath)
            with open(tmp, "wb") as f:  # file object: savez appends no suffix
                np.savez(f, vids=vids, codes=codes, qmin=mn, qscale=scale,
                         nbr=nbr)
        else:
            with open(tmp, "wb") as f:
                np.savez(f, vids=vids, v=v, nbr=nbr)
        os.replace(tmp, path)
        return pa.table({"shard": pa.array([shard], pa.int32()),
                         "n_rows": pa.array([len(vids)], pa.int64())})

    stats = (
        _read_emb(sf_dir)
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(build_and_write, batch_format="pyarrow")
        .take_all()
    )  # O(n_shards) tiny rows
    built = {int(r["shard"]) for r in stats}
    # shards with NO vectors (sparse id space) still need a file so the
    # actor tier can start uniformly
    for s in range(n_total):
        if s not in built and s not in done:
            path = _shard_file(index_dir, s)
            empty = {"vids": np.empty(0, np.int64),
                     "nbr": np.empty((0, m), np.int32)}
            if store == "q8":
                empty.update(codes=np.empty((0, 0), np.uint8),
                             qmin=np.empty(0, np.float64),
                             qscale=np.empty(0, np.float64))
                vpath = _vec_file(index_dir, s)
                with open(vpath + ".tmp", "wb") as f:
                    np.save(f, np.empty((0, 0), np.float64))
                os.replace(vpath + ".tmp", vpath)
            else:
                empty["v"] = np.empty((0, 0), np.float64)
            with open(path + ".tmp", "wb") as f:
                np.savez(f, **empty)
            os.replace(path + ".tmp", path)
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, meta_path)
    return meta


@ray.remote(max_restarts=2, max_task_retries=1)
class VecShardActor:
    """Holds one shard's vectors + NSW graph, loaded once. Constructor
    args are plain paths/ints so a crashed actor restarts from disk and
    the in-flight query retries transparently (same contract as
    DocShardActor)."""

    def __init__(self, index_dir: str, shard_id: int):
        with open(os.path.join(index_dir, "meta.json")) as f:
            meta = json.load(f)
        self.ef = int(meta["ef"])
        self.store = meta.get("store", "f64")
        z = np.load(_shard_file(index_dir, shard_id))
        self.vids = z["vids"]
        self.nbr = z["nbr"]
        if self.store == "q8":
            # RAM: codes + scalars + graph; exact vectors stay on disk,
            # memmapped for O(k*refine) rerank row reads per query
            self.v = _Q8View(z["codes"], z["qmin"], z["qscale"])
            self.vex = np.load(_vec_file(index_dir, shard_id), mmap_mode="r")
        else:
            self.v = z["v"]
            self.vex = None

    def query(self, payload, k: int, exclude_self: bool = True):
        """(qids, unit-normalized query matrix) -> per-shard top-k
        candidate arrays (qid, vec_id, sim) — O(n_queries * k) returned
        bytes, never O(shard)."""
        q_ids, q = payload
        n = len(self.vids)
        out_q, out_v, out_s = [], [], []
        kk = k + 1 if exclude_self else k
        for qi_pos, qi in enumerate(q_ids):
            if n == 0:
                continue
            if self.store == "q8":
                # navigate on approx sims, rerank the pool exactly
                idx, _ = _nsw_search(self.v, self.nbr, q[qi_pos], self.ef,
                                     n, kk * _Q8_REFINE)
                sims = np.asarray(self.vex[idx]) @ q[qi_pos]
                order = np.lexsort((idx, -sims))[:kk]
                idx, sims = idx[order], sims[order]
            else:
                idx, sims = _nsw_search(self.v, self.nbr, q[qi_pos],
                                        self.ef, n, kk)
            if exclude_self:
                keep = self.vids[idx] != qi
                idx, sims = idx[keep], sims[keep]
            out_q.append(np.full(idx.size, qi, np.int64))
            out_v.append(self.vids[idx])
            out_s.append(np.round(sims, 6))
        if not out_q:
            return (np.empty(0, np.int64), np.empty(0, np.int64),
                    np.empty(0, np.float64))
        return (np.concatenate(out_q), np.concatenate(out_v),
                np.concatenate(out_s))

    def get_vecs(self, ids):
        """Point-get of EXACT unit vectors by vec_id (searchsorted over
        the shard's sorted vids) — the /knn HTTP route's query-by-id
        lookup. O(len(ids) * log shard) work, O(hits * dim) returned."""
        ids = np.asarray(ids, np.int64)
        n = len(self.vids)
        if n == 0 or ids.size == 0:
            return (np.empty(0, np.int64),
                    np.empty((0, 0), np.float64))
        pos = np.searchsorted(self.vids, ids)
        ok = (pos < n) & (self.vids[np.minimum(pos, n - 1)] == ids)
        sel = pos[ok]
        if self.store == "q8":  # exact vectors live in the memmap
            vecs = np.asarray(self.vex[sel], np.float64)
        else:
            vecs = np.asarray(self.v[sel], np.float64)
        return ids[ok], vecs

    def ping(self) -> bool:
        return True


class AnnSearcher:
    """Driver-side scatter-gather over the persistent vector shards."""

    def __init__(self, index_dir: str):
        self._index_dir = index_dir
        with open(os.path.join(index_dir, "meta.json")) as f:
            self.meta = json.load(f)
        self.centroids = (
            np.load(_centroid_file(index_dir))
            if self.meta.get("routing") == "ivf" else None
        )
        if self.centroids is not None:
            # shard -> owning cell (identity when no cell ever split)
            nsub = np.asarray(
                self.meta.get("cell_sub", [1] * len(self.centroids)),
                np.int64,
            )
            self.cell_of_shard = np.repeat(np.arange(len(nsub)), nsub)
        self.shards = [
            VecShardActor.remote(index_dir, s)
            for s in range(int(self.meta["n_shards"]))
        ]
        ray.get([s.ping.remote() for s in self.shards])

    def probe_sets(self, qnorm: np.ndarray, n_probe: int) -> list[np.ndarray]:
        """IVF routing plan: for each shard, the query positions that
        probe it. A query probes its ``n_probe`` nearest-centroid CELLS
        — every sub-shard of a split (hot) cell, so splitting never
        narrows the candidate set. Per-query work is O(n_probe cells),
        independent of the total shard count."""
        assert self.centroids is not None, "probe routing needs routing='ivf'"
        sims_c = qnorm @ self.centroids.T
        # clamp: a negative argpartition kth silently selects from the
        # END of the sim order (the FARTHEST cells), so n_probe < 1
        # must never reach it
        n_probe = max(1, min(n_probe, sims_c.shape[1]))
        top = np.argpartition(-sims_c, n_probe - 1, axis=1)[:, :n_probe]
        return [
            np.flatnonzero((top == self.cell_of_shard[s]).any(axis=1))
            for s in range(len(self.shards))
        ]

    def search_matrix(self, qids: np.ndarray, qmat: np.ndarray,
                      k: int = _TOP_K, exclude_self: bool = True,
                      n_probe: int | None = None):
        """Top-k per query; (qid, vec_id, sim) arrays sorted (qid asc,
        sim desc, vec_id asc) — the exact merge the batch path's
        ``_topk_per_qid`` finisher applies, so hash-routed results are
        bit-identical to ``knn_hnsw`` at the same build params. With
        ``routing="ivf"`` and ``n_probe`` set, each query ships only to
        its n_probe nearest-centroid shards (fan-out pruning; recall is
        the standard IVF probe trade, pytest-bounded)."""
        qids64 = np.asarray(qids, np.int64)
        qnorm = qmat / np.maximum(
            np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12
        )
        if (n_probe is not None and self.centroids is not None
                and n_probe < len(self.centroids)):
            futs = []
            for s, qsel in enumerate(self.probe_sets(qnorm, n_probe)):
                if qsel.size:
                    futs.append(self.shards[s].query.remote(
                        (qids64[qsel], qnorm[qsel]), k, exclude_self))
            parts = ray.get(futs) if futs else []
        else:
            ref = ray.put((qids64, qnorm))
            parts = ray.get([
                s.query.remote(ref, k, exclude_self) for s in self.shards
            ])
        if not parts:
            return (np.empty(0, np.int64), np.empty(0, np.int64),
                    np.empty(0, np.float64))
        qs = np.concatenate([p[0] for p in parts])
        vs = np.concatenate([p[1] for p in parts])
        ss = np.concatenate([p[2] for p in parts])
        # ONE lexsort over all candidates, then O(log n) slice lookups
        # per query (not a full qs == qi scan per query — that merge is
        # quadratic when the query batch is large)
        order_all = np.lexsort((vs, -ss, qs))
        qs, vs, ss = qs[order_all], vs[order_all], ss[order_all]
        out_q, out_v, out_s = [], [], []
        for qi in np.asarray(qids, np.int64):
            lo = np.searchsorted(qs, qi, side="left")
            hi = min(np.searchsorted(qs, qi, side="right"), lo + k)
            out_q.append(qs[lo:hi])
            out_v.append(vs[lo:hi])
            out_s.append(ss[lo:hi])
        return (np.concatenate(out_q) if out_q else np.empty(0, np.int64),
                np.concatenate(out_v) if out_v else np.empty(0, np.int64),
                np.concatenate(out_s) if out_s else np.empty(0, np.float64))

    def get_vectors(self, vec_ids):
        """(found_ids, exact unit-vector matrix) for the given ids.
        Broadcast id probe: under ivf routing a vector's shard is a
        function of its VALUE, so by-id lookup asks every shard —
        each answers a searchsorted miss in O(log shard)."""
        ids = np.asarray(vec_ids, np.int64)
        parts = ray.get([s.get_vecs.remote(ids) for s in self.shards])
        found = [p for p in parts if p[0].size]
        if not found:
            return np.empty(0, np.int64), np.empty((0, 0), np.float64)
        fids = np.concatenate([p[0] for p in found])
        mats = np.vstack([p[1] for p in found])
        order = np.argsort(fids, kind="stable")
        return fids[order], mats[order]

    def search_table(self, qids, qmat, k: int = _TOP_K,
                     exclude_self: bool = True,
                     n_probe: int | None = None) -> pa.Table:
        q, v, s = self.search_matrix(qids, qmat, k, exclude_self, n_probe)
        return pa.table({"qid": pa.array(q, pa.int64()),
                         "vec_id": pa.array(v, pa.int64()),
                         "sim": pa.array(s, pa.float64())})

    def refresh(self) -> None:
        """Blue-green pickup of on-disk index changes (an
        ``extend_ann_index``): spawn a FULL fresh actor set from the
        current files, then retire the old one — concurrent queries
        see old-or-new shards, never a partial mix (the text tier's
        ``DocShardedSearcher.refresh`` contract)."""
        old = self.shards
        with open(os.path.join(self._index_dir, "meta.json")) as f:
            self.meta = json.load(f)
        if self.meta.get("routing") == "ivf":
            self.centroids = np.load(_centroid_file(self._index_dir))
            nsub = np.asarray(
                self.meta.get("cell_sub", [1] * len(self.centroids)),
                np.int64,
            )
            self.cell_of_shard = np.repeat(np.arange(len(nsub)), nsub)
        fresh = [
            VecShardActor.remote(self._index_dir, s)
            for s in range(int(self.meta["n_shards"]))
        ]
        ray.get([s.ping.remote() for s in fresh])
        self.shards = fresh
        for a in old:
            try:
                ray.kill(a)
            except Exception:  # noqa: BLE001 - actor may already be dead
                pass

    def close(self) -> None:
        for a in self.shards:
            try:
                ray.kill(a)
            except Exception:  # noqa: BLE001 - actor may already be dead
                pass
        self.shards = []

    def __del__(self):  # best-effort; explicit close() preferred
        # same no-ray.kill rule as DocShardedSearcher.__del__
        try:
            self.shards = []
        except Exception:  # noqa: BLE001 - interpreter teardown
            pass


def extend_ann_index(index_dir: str, delta_sf_dir: str) -> dict:
    """Incremental vector indexing: add ``{delta_sf_dir}/
    embeddings.parquet`` to an existing index, rebuilding ONLY the
    shards that receive new vectors (the vector twin of the text
    tier's ``extend_index``, `pipelines/build_index.py:181`).

    Because graph builds insert in sorted-vec_id order, the extended
    index is BIT-IDENTICAL to a full rebuild over the combined corpus
    at the same layout (pytest-pinned) — extend never trades result
    quality. Cost per touched shard: when the delta's vec_ids all sort
    after the shard's existing ones (the append-only stream shape, the
    text tier's same constraint), the saved graph warm-starts the
    insert loop and extension costs O(delta) inserts; interleaved ids
    fall back to an O(shard) re-sorted rebuild of just that shard. Layout (shard count, centroids, cell splits) is
    FROZEN from the existing meta: under ivf routing a hot delta can
    push a cell past its size headroom, so like the text tier, heavy
    extension ends in a periodic full ``build_ann_index`` (the
    compaction analog). New vec_ids must not collide with indexed ones
    (validated per shard). After an extension, a ``build_ann_index``
    call with the ORIGINAL source sees a changed fingerprint and
    rebuilds from that source alone — keep maintaining an extended
    index through this function."""
    meta_path = os.path.join(index_dir, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    assert meta.get("kind") == "nsw", meta
    from ..io import parquet_rows

    store = meta.get("store", "f64")
    routing = meta.get("routing", "hash")
    m, ef = int(meta["m"]), int(meta["ef"])
    n_total = int(meta["n_shards"])
    if routing == "ivf":
        centroids = np.load(_centroid_file(index_dir))
        nsub = np.asarray(meta["cell_sub"], np.int64)
        base = np.concatenate(([0], np.cumsum(nsub)))[:-1]
        cref = ray.put((centroids, base, nsub))
    n_hash = int(meta.get("n_cells", n_total)) if routing == "ivf" else n_total

    def assign(t: pa.Table) -> pa.Table:
        if routing == "ivf":
            v = _emb_matrix(t["embedding"])
            v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            c, b, ns = ray.get(cref)
            cell = np.argmax(v @ c.T, axis=1)
            vid = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False),
                             np.int64)
            shard = pa.array(
                (b[cell] + _sub_shard(vid, ns[cell])).astype(np.int32),
                pa.int32(),
            )
        else:
            shard = pc.cast(
                pc.bit_wise_and(t["vec_id"], n_hash - 1), pa.int32()
            )
        return t.append_column("shard", shard)

    def rebuild_shard(group: pa.Table) -> pa.Table:
        shard = int(group["shard"][0].as_py())
        new_vids = group["vec_id"].to_numpy()
        new_v = _emb_matrix(group["embedding"])
        z = np.load(_shard_file(index_dir, shard))
        old_vids = z["vids"]
        if np.intersect1d(old_vids, new_vids).size:
            raise ValueError(
                f"shard {shard}: delta vec_ids collide with indexed ones"
            )
        if store == "q8":  # exact olds live in the sidecar
            old_v = np.load(_vec_file(index_dir, shard))
        else:
            old_v = z["v"]
        new_v = new_v / np.maximum(
            np.linalg.norm(new_v, axis=1, keepdims=True), 1e-12
        )
        if old_v.size == 0:  # previously-empty shard: adopt delta dim
            old_v = old_v.reshape(0, new_v.shape[1])
        order_new = np.argsort(new_vids, kind="stable")
        new_vids, new_v = new_vids[order_new], new_v[order_new]
        if old_vids.size == 0 or new_vids[0] > old_vids[-1]:
            # append-only delta (old vids are stored sorted): continue
            # the insert loop from the saved graph — O(delta) inserts,
            # bit-identical to a from-scratch build (nbr0 contract)
            vids = np.concatenate([old_vids, new_vids])
            v = np.vstack([old_v, new_v])
            nbr = _nsw_build(v, m=m, ef=ef,
                             nbr0=z["nbr"] if old_vids.size else None)
        else:
            # interleaved ids: the full-rebuild insert order differs
            # from any warm start, so re-sort and rebuild the shard
            vids = np.concatenate([old_vids, new_vids])
            v = np.vstack([old_v, new_v])
            order = np.argsort(vids, kind="stable")
            vids, v = vids[order], v[order]
            nbr = _nsw_build(v, m=m, ef=ef)
        path = _shard_file(index_dir, shard)
        tmp = path + f".tmp-{os.getpid()}"
        if store == "q8":
            mn = v.min(axis=1)
            scale = np.maximum(v.max(axis=1) - mn, 1e-12) / 255.0
            codes = np.floor(
                (v - mn[:, None]) / scale[:, None] + 0.5
            ).astype(np.uint8)
            vpath = _vec_file(index_dir, shard)
            vtmp = vpath + f".tmp-{os.getpid()}"
            with open(vtmp, "wb") as f:
                np.save(f, v)
            os.replace(vtmp, vpath)
            with open(tmp, "wb") as f:
                np.savez(f, vids=vids, codes=codes, qmin=mn, qscale=scale,
                         nbr=nbr)
        else:
            with open(tmp, "wb") as f:
                np.savez(f, vids=vids, v=v, nbr=nbr)
        os.replace(tmp, path)
        return pa.table({"shard": pa.array([shard], pa.int32()),
                         "n_new": pa.array([len(new_vids)], pa.int64())})

    stats = (
        _read_emb(delta_sf_dir)
        .map_batches(assign, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(rebuild_shard, batch_format="pyarrow")
        .take_all()
    )  # O(touched shards) tiny rows
    delta_src = os.path.join(delta_sf_dir, "embeddings.parquet")
    meta["source_rows"] = int(meta["source_rows"]) + int(
        parquet_rows(delta_src) or 0
    )
    meta.setdefault("extends", []).append(delta_src)
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, meta_path)
    return {
        "touched_shards": sorted(int(r["shard"]) for r in stats),
        "new_rows": int(sum(r["n_new"] for r in stats)),
    }


def _served_table(sf_dir: str, store: str, routing: str = "hash",
                  n_probe: int | None = None):
    """Build-once (cached under /tmp keyed by source + store + routing),
    serve one query batch through long-lived shard actors, tear down."""
    import hashlib

    src = os.path.join(sf_dir, "embeddings.parquet")
    key = hashlib.md5(
        f"{os.path.abspath(src)}:{os.path.getmtime(src)}:{store}:{routing}"
        .encode()
    ).hexdigest()[:12]
    index_dir = os.path.join("/tmp/seray_cache", f"ann-{key}")
    build_ann_index(sf_dir, index_dir, store=store, routing=routing)
    qids, qmat = _load_queries(sf_dir)
    searcher = AnnSearcher(index_dir)
    try:
        return searcher.search_table(qids, qmat, n_probe=n_probe)
    finally:
        searcher.close()


def knn_hnsw_served(sf_dir: str):
    """Aux gate entry: the SERVED graph-ANN path — build-once, long-
    lived shard actors, query broadcast. Bit-identical to ``knn_hnsw``
    (pytest-pinned); rows-only aux like its batch twin."""
    return _served_table(sf_dir, "f64")


def knn_hnsw_served_q8(sf_dir: str):
    """Aux gate entry: the memory-tight served path — uint8 codes in
    actor RAM, exact vectors memmapped for rerank. Reported sims are
    exact cosines (rerank contract); recall vs the f64 tier is
    pytest-bounded; rows-only aux."""
    return _served_table(sf_dir, "q8")


def knn_hnsw_served_ivf(sf_dir: str):
    """Aux gate entry: the fan-out-pruned served path — vectors sharded
    by nearest coarse centroid, each query probing only its n_probe
    nearest-centroid shards (O(n_probe) per query, independent of shard
    count — the 1000-shard deployment shape). Recall vs the broadcast
    tier is pytest-bounded; rows-only aux."""
    return _served_table(sf_dir, "f64", routing="ivf", n_probe=2)
