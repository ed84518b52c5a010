"""Similarity search over the ``embeddings`` table.

- ``knn_cosine``: brute-force cosine top-k — numpy matmul per batch
  against a broadcast (ray.put once) query matrix; ranking by
  (cosine rounded to 6 desc, vec_id asc) so the DuckDB oracle ranks
  identically regardless of float summation order.
- ``knn_lsh``: random-hyperplane LSH variant — the scale path: bucket
  by sign-pattern (groupby shuffle), exact-rerank only within buckets.
  Deterministic (seeded planes) and reproduced verbatim by its oracle.
- ``knn_ivf``: inverted-file variant with SQL-reproducible data-row
  centroids; ``train_ivf_centroids`` is the quality path (sampled
  distributed k-means, O(k*dim) driver memory).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ..io import read_parquet_clean, read_parquet_light

_N_QUERIES = 5
_TOP_K = 5



_read_light = read_parquet_light


def _read_emb(sf_dir: str):
    """The (vec_id, embedding) read every vector op starts from, with
    null embeddings dropped on BOTH twins (each SQL twin filters
    ``embedding IS NOT NULL``): a null row would break the zero-copy
    flatten/reshape decode in _emb_matrix, and vector semantics for a
    missing vector are "absent", not "zero"."""
    return _read_light(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(
        lambda t: t.filter(pc.is_valid(t["embedding"])), batch_format="pyarrow"
    )

def _emb_matrix(col, dim: int = 0) -> np.ndarray:
    """Decode a ``list<float>`` Arrow column to an (n, dim) float64
    matrix WITHOUT per-row Python objects: ``flatten()`` yields the
    child values buffer (zero-copy to numpy), one reshape recovers the
    matrix. ``np.stack(col.to_pylist())`` — the naive form — would
    materialize every row as a Python list first; at 100x scale that is
    the first thing these stages would choke on.

    ``dim`` shapes the 0-row case: a (0, 0) result would crash every
    downstream matmul/reduction on an empty block (empty parquet
    fragments and post-filter blocks do occur), while (0, dim)
    broadcasts cleanly through them."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        if not dim and pa.types.is_fixed_size_list(arr.type):
            dim = arr.type.list_size
        return np.empty((0, dim), np.float64)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(n, -1)


def _load_queries(sf_dir: str):
    # filters push down to row-group pruning: the driver reads only the
    # groups containing the handful of query rows, never the full
    # N x dim matrix (this runs once per gate entry)
    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", _N_QUERIES)],
    )
    ids = tbl["vec_id"].to_numpy()
    sel = np.flatnonzero(ids < _N_QUERIES)
    q = _emb_matrix(tbl["embedding"].take(pa.array(sel)))
    return ids[sel], q


def make_partial_topk_scorer(ref, k_keep: int):
    """Per-batch cosine partial-top-k kernel, shared by ``knn_cosine``
    and ``search_ops.hybrid_rrf`` (one copy — the tie-at-threshold
    superset argument below is subtle and must not drift between
    callers). ``ref`` is a ``ray.put`` of (query_ids, L2-normalized
    query matrix); every task fetches it zero-copy from local plasma.

    Per-batch partial top-k: the final top-k shuffle moves O(nq x k)
    rows per batch, not O(nq x batch). k_keep+1 because the finisher
    drops the self-match; keeping every candidate tied with the
    boundary value makes the emitted set a superset of the global
    top-k under ANY tie-break, so the final selection is unchanged."""

    def score(t: pa.Table, _ref=ref) -> pa.Table:
        q_ids, q = ray.get(_ref)
        vids = t["vec_id"].to_numpy()
        v = _emb_matrix(t["embedding"], q.shape[1])
        v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        sims = np.round(q @ v.T, 6)  # (nq, batch)
        nq, nb = sims.shape
        kk = k_keep + 1
        if nb > kk:
            thresh = np.partition(sims, nb - kk, axis=1)[:, nb - kk]
            keep_i, keep_j = np.nonzero(sims >= thresh[:, None])
        else:
            keep_i, keep_j = np.nonzero(np.ones_like(sims, dtype=bool))
        return pa.table(
            {
                "qid": pa.array(q_ids[keep_i], pa.int64()),
                "vec_id": pa.array(vids[keep_j], pa.int64()),
                "sim": pa.array(sims[keep_i, keep_j], pa.float64()),
            }
        )

    return score


def knn_cosine(sf_dir: str):
    qids, qmat = _load_queries(sf_dir)
    qnorm = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    # broadcast once (ray.put) — every task fetches the query matrix
    # zero-copy from the local plasma store. A plain-function stage,
    # not an actor pool: the only "state" is this one ray.get, so pool
    # spin-up would cost more than it amortizes (actor pools are for
    # EXPENSIVE init — model load, codec probe; see ops/multimodal.py)
    ref = ray.put((qids, qnorm))
    score = make_partial_topk_scorer(ref, _TOP_K)

    ds = _read_emb(sf_dir)
    scored = ds.map_batches(score, batch_format="pyarrow")

    # per-batch partial top-k would go here at scale; at sf sizes a
    # global sort+group head is simpler and still distributed
    def topk(group: pa.Table) -> pa.Table:
        sims = group["sim"].to_numpy()
        vids = group["vec_id"].to_numpy()
        mask = vids != group["qid"][0].as_py()
        sims, vids = sims[mask], vids[mask]
        order = np.lexsort((vids, -sims))[:_TOP_K]
        return pa.table(
            {
                "qid": pa.array(np.repeat(group["qid"][0].as_py(), len(order)), pa.int64()),
                "vec_id": pa.array(vids[order], pa.int64()),
                "sim": pa.array(sims[order], pa.float64()),
            }
        )

    return scored.groupby("qid").map_groups(topk, batch_format="pyarrow")


SQL_KNN_COSINE = f"""
WITH q AS (
    SELECT vec_id AS qid, embedding AS qe FROM embeddings
    WHERE vec_id < {_N_QUERIES} AND embedding IS NOT NULL
),
s AS (
    -- cast to DOUBLE[] so both the arithmetic and the output dtype
    -- match the Ray side's float64 (FLOAT[] would yield a float32 sim)
    SELECT q.qid, e.vec_id,
           CAST(round(list_cosine_similarity(
               list_transform(q.qe, x -> CAST(x AS DOUBLE)),
               list_transform(e.embedding, x -> CAST(x AS DOUBLE))), 6) AS DOUBLE) AS sim
    FROM q CROSS JOIN embeddings e
    WHERE e.vec_id <> q.qid AND e.embedding IS NOT NULL
),
r AS (
    SELECT qid, vec_id, sim,
           row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS rn
    FROM s
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(vec_id AS BIGINT) AS vec_id, sim
FROM r WHERE rn <= {_TOP_K}
"""


def _planes(n_planes: int, dim: int) -> np.ndarray:
    return np.random.RandomState(7).standard_normal((n_planes, dim))


def _planes_sql(n_planes: int, dim: int) -> str:
    """The seeded hyperplanes inlined as SQL VALUES rows (i, DOUBLE[]);
    scientific-notation literals parse as DOUBLE and round-trip the
    exact float64 values, so the SQL signature computation is
    bit-comparable with the numpy one."""
    planes = _planes(n_planes, dim)
    rows = ", ".join(
        "({}, [{}])".format(i, ", ".join(format(x, ".17e") for x in planes[i]))
        for i in range(n_planes)
    )
    return f"planes(i, p) AS (VALUES {rows})"


def _topk_per_qid(scored):
    def topk(group: pa.Table) -> pa.Table:
        sims = group["sim"].to_numpy()
        vids = group["vec_id"].to_numpy()
        order = np.lexsort((vids, -sims))[:_TOP_K]
        return pa.table(
            {
                "qid": pa.array(np.repeat(group["qid"][0].as_py(), len(order)), pa.int64()),
                "vec_id": pa.array(vids[order], pa.int64()),
                "sim": pa.array(sims[order], pa.float64()),
            }
        )

    return scored.groupby("qid").map_groups(topk, batch_format="pyarrow")


_N_PLANES = 8
_EMB_DIM = 64


def knn_lsh(sf_dir: str, n_planes: int = _N_PLANES):
    """Approximate top-k: random-hyperplane signatures bucket the
    vectors (groupby shuffle), exact cosine rerank within the query's
    bucket only. Deterministic seeded planes, shared verbatim with the
    SQL oracle; signatures use the RAW float64 vectors (sign of the dot
    is scale-invariant) so numpy and DuckDB compute identical buckets."""
    qids, qmat = _load_queries(sf_dir)
    planes = _planes(n_planes, qmat.shape[1])
    qnorm = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    qsig = (qmat @ planes.T > 0) @ (1 << np.arange(n_planes))
    ref = ray.put((qids, qnorm, qsig, planes))

    def bucket_score(t: pa.Table, _ref=ref) -> pa.Table:
        # plain-function stage over a broadcast ref (zero-copy plasma
        # fetch per task — see knn_cosine's note on why not a pool)
        q_ids, q, q_sig, pl = ray.get(_ref)
        vids = t["vec_id"].to_numpy()
        raw = _emb_matrix(t["embedding"], pl.shape[1])
        sig = (raw @ pl.T > 0) @ (1 << np.arange(pl.shape[0]))
        v = raw / np.maximum(np.linalg.norm(raw, axis=1, keepdims=True), 1e-12)
        out = {"qid": [], "vec_id": [], "sim": []}
        for qi, qs in zip(q_ids, q_sig):
            hit = np.flatnonzero((sig == qs) & (vids != qi))
            if hit.size:
                sims = np.round(v[hit] @ q[qi == q_ids][0], 6)
                out["qid"].extend([int(qi)] * hit.size)
                out["vec_id"].extend(vids[hit].tolist())
                out["sim"].extend(sims.tolist())
        return pa.table(
            {
                "qid": pa.array(out["qid"], pa.int64()),
                "vec_id": pa.array(out["vec_id"], pa.int64()),
                "sim": pa.array(out["sim"], pa.float64()),
            }
        )

    ds = _read_emb(sf_dir)
    scored = ds.map_batches(bucket_score, batch_format="pyarrow")
    return _topk_per_qid(scored)


SQL_KNN_LSH = f"""
WITH {_planes_sql(_N_PLANES, _EMB_DIM)},
e AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
    FROM embeddings WHERE embedding IS NOT NULL
),
sig AS (
    SELECT vec_id,
           CAST(SUM(CASE WHEN list_dot_product(e.e, pl.p) > 0
                         THEN (1 << pl.i) ELSE 0 END) AS BIGINT) AS s
    FROM e CROSS JOIN planes pl GROUP BY vec_id
),
q AS (SELECT vec_id AS qid, s FROM sig WHERE vec_id < {_N_QUERIES}),
cand AS (
    SELECT q.qid, v.vec_id FROM q JOIN sig v ON v.s = q.s AND v.vec_id <> q.qid
),
scored AS (
    SELECT c.qid, c.vec_id,
           CAST(round(list_cosine_similarity(qe.e, ve.e), 6) AS DOUBLE) AS sim
    FROM cand c
    JOIN e qe ON qe.vec_id = c.qid
    JOIN e ve ON ve.vec_id = c.vec_id
),
r AS (
    SELECT qid, vec_id, sim,
           row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS rn
    FROM scored
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(vec_id AS BIGINT) AS vec_id, sim
FROM r WHERE rn <= {_TOP_K}
"""


_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Full-width popcount over uint64 (byte-table folded 8x) — correct
    for ANY n_planes <= 64, unlike a low-byte-only mask which silently
    truncates Hamming distances when n_planes > 8."""
    x = x.astype(np.uint64)
    out = np.zeros(x.shape, np.int64)
    for shift in range(0, 64, 8):
        out += _POPCNT8[(x >> np.uint64(shift)).astype(np.int64) & 0xFF]
    return out


def knn_lsh_multiprobe(sf_dir: str, n_planes: int = _N_PLANES):
    """Multi-probe variant of ``knn_lsh``: a vector is a candidate for
    a query when their sign signatures differ in AT MOST ONE bit
    (probing all one-bit-flip buckets) — recall rises steeply for a
    ~(n_planes+1)x candidate budget. Deterministic; the oracle mirrors
    the probe with bit_count(xor(s_v, s_q)) <= 1."""
    qids, qmat = _load_queries(sf_dir)
    planes = _planes(n_planes, qmat.shape[1])
    qnorm = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    qsig = (qmat @ planes.T > 0) @ (1 << np.arange(n_planes))
    ref = ray.put((qids, qnorm, qsig, planes))

    def probe_buckets(t: pa.Table, _ref=ref) -> pa.Table:
        q_ids, q, q_sig, pl = ray.get(_ref)
        vids = t["vec_id"].to_numpy()
        raw = _emb_matrix(t["embedding"], pl.shape[1])
        sig = (raw @ pl.T > 0) @ (1 << np.arange(pl.shape[0]))
        v = raw / np.maximum(np.linalg.norm(raw, axis=1, keepdims=True), 1e-12)
        out = {"qid": [], "vec_id": [], "sim": []}
        for qi, qs in zip(q_ids, q_sig):
            ham = _popcount64(np.bitwise_xor(sig.astype(np.uint64), np.uint64(qs)))
            hit = np.flatnonzero((ham <= 1) & (vids != qi))
            if hit.size:
                sims = np.round(v[hit] @ q[qi == q_ids][0], 6)
                out["qid"].extend([int(qi)] * hit.size)
                out["vec_id"].extend(vids[hit].tolist())
                out["sim"].extend(sims.tolist())
        return pa.table(
            {
                "qid": pa.array(out["qid"], pa.int64()),
                "vec_id": pa.array(out["vec_id"], pa.int64()),
                "sim": pa.array(out["sim"], pa.float64()),
            }
        )

    ds = _read_emb(sf_dir)
    scored = ds.map_batches(probe_buckets, batch_format="pyarrow")
    return _topk_per_qid(scored)


SQL_KNN_LSH_MULTIPROBE = f"""
WITH {_planes_sql(_N_PLANES, _EMB_DIM)},
e AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
    FROM embeddings WHERE embedding IS NOT NULL
),
sig AS (
    SELECT vec_id,
           CAST(SUM(CASE WHEN list_dot_product(e.e, pl.p) > 0
                         THEN (1 << pl.i) ELSE 0 END) AS BIGINT) AS s
    FROM e CROSS JOIN planes pl GROUP BY vec_id
),
q AS (SELECT vec_id AS qid, s FROM sig WHERE vec_id < {_N_QUERIES}),
cand AS (
    SELECT q.qid, v.vec_id FROM q JOIN sig v
    ON bit_count(xor(v.s, q.s)) <= 1 AND v.vec_id <> q.qid
),
scored AS (
    SELECT c.qid, c.vec_id,
           CAST(round(list_cosine_similarity(qe.e, ve.e), 6) AS DOUBLE) AS sim
    FROM cand c
    JOIN e qe ON qe.vec_id = c.qid
    JOIN e ve ON ve.vec_id = c.vec_id
),
r AS (
    SELECT qid, vec_id, sim,
           row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS rn
    FROM scored
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(vec_id AS BIGINT) AS vec_id, sim
FROM r WHERE rn <= {_TOP_K}
"""


_IVF_MOD = 7
_IVF_RESIDUE = 3


def _ivf_centroids(sf_dir: str, n_lists: int):
    """Deterministic data-row centroids: the first ``n_lists``
    embeddings with vec_id % {_IVF_MOD} == {_IVF_RESIDUE} (ascending) — a rule the
    SQL oracle reproduces verbatim. For a quality-tuned index use
    ``train_ivf_centroids`` (distributed sampled k-means) instead."""
    # two-step pruned read: the id column alone (8 bytes/row) finds the
    # n_lists target ids, then a row-group-pruned read fetches just
    # their embedding rows — the driver never holds the N x dim matrix
    ids = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id"]
    )["vec_id"].to_numpy()
    targets = np.sort(ids[ids % _IVF_MOD == _IVF_RESIDUE])[:n_lists]
    if targets.size == 0:
        raise ValueError(
            f"no vec_id satisfies %{_IVF_MOD}=={_IVF_RESIDUE}; "
            "cannot seed IVF centroids"
        )
    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filters=[("vec_id", "<=", int(targets[-1]))],
    )
    tids = tbl["vec_id"].to_numpy()
    sel = np.flatnonzero(np.isin(tids, targets))
    sel = sel[np.argsort(tids[sel])]
    return _emb_matrix(tbl["embedding"].take(pa.array(sel)))


def knn_ivf(sf_dir: str, n_lists: int = 8, n_probe: int = 2):
    """IVF-style ANN — the other scale path beside LSH: vectors are
    bucketed by their max-cosine centroid, queries exact-rerank only
    inside their ``n_probe`` closest lists. The gate variant uses
    deterministic data-row centroids (SQL-reproducible, see
    ``_ivf_centroids``); the quality path trains centroids with
    ``train_ivf_centroids`` — a sampled distributed k-means whose
    driver memory is O(n_lists x dim), independent of table size."""
    centroids = _ivf_centroids(sf_dir, n_lists)
    cnorm = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    qids, qmat = _load_queries(sf_dir)
    qnorm = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    # stable argsort: ties broken toward the smaller centroid index
    qlists = np.argsort(-(qnorm @ cnorm.T), axis=1, kind="stable")[:, :n_probe]
    ref = ray.put((qids, qnorm, qlists, cnorm))

    def probe_score(t: pa.Table, _ref=ref) -> pa.Table:
        q_ids, q, q_lists, cn = ray.get(_ref)
        vids = t["vec_id"].to_numpy()
        v = _emb_matrix(t["embedding"], cn.shape[1])
        v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        vlist = np.argmax(v @ cn.T, axis=1)  # first max = smallest cid
        out = {"qid": [], "vec_id": [], "sim": []}
        for qi, probe in zip(q_ids, q_lists):
            hit = np.flatnonzero(np.isin(vlist, probe) & (vids != qi))
            if hit.size:
                sims = np.round(v[hit] @ q[qi == q_ids][0], 6)
                out["qid"].extend([int(qi)] * hit.size)
                out["vec_id"].extend(vids[hit].tolist())
                out["sim"].extend(sims.tolist())
        return pa.table(
            {
                "qid": pa.array(out["qid"], pa.int64()),
                "vec_id": pa.array(out["vec_id"], pa.int64()),
                "sim": pa.array(out["sim"], pa.float64()),
            }
        )

    ds = _read_emb(sf_dir)
    scored = ds.map_batches(probe_score, batch_format="pyarrow")
    return _topk_per_qid(scored)


SQL_KNN_IVF = f"""
WITH e AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
    FROM embeddings WHERE embedding IS NOT NULL
),
cents AS (
    SELECT vec_id AS cid, e AS ce FROM e
    WHERE vec_id % {_IVF_MOD} = {_IVF_RESIDUE} ORDER BY vec_id LIMIT 8
),
assign AS (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
               ORDER BY list_cosine_similarity(v.e, c.ce) DESC, c.cid ASC) AS rn
    FROM e v CROSS JOIN cents c
),
vlist AS (SELECT vec_id, cid FROM assign WHERE rn = 1),
qprobe AS (SELECT vec_id AS qid, cid FROM assign WHERE vec_id < {_N_QUERIES} AND rn <= 2),
cand AS (
    SELECT q.qid, v.vec_id FROM qprobe q JOIN vlist v
    ON v.cid = q.cid AND v.vec_id <> q.qid
),
scored AS (
    SELECT c.qid, c.vec_id,
           CAST(round(list_cosine_similarity(qe.e, ve.e), 6) AS DOUBLE) AS sim
    FROM cand c
    JOIN e qe ON qe.vec_id = c.qid
    JOIN e ve ON ve.vec_id = c.vec_id
),
r AS (
    SELECT qid, vec_id, sim,
           row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS rn
    FROM scored
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(vec_id AS BIGINT) AS vec_id, sim
FROM r WHERE rn <= {_TOP_K}
"""


def train_ivf_centroids(
    sf_dir: str, n_lists: int = 8, n_iters: int = 5,
    sample_fraction: float = 0.25, seed: int = 13,
):
    """Distributed sampled k-means (cosine/spherical) for IVF training.

    Scale shape: trains on a ``random_sample`` of the embeddings table;
    each Lloyd iteration is one map_batches pass emitting per-batch
    partial sums as (cid, dim, s, n) rows, reduced by a tiny
    groupby — the driver only ever holds the (n_lists x dim) centroid
    matrix, never the table. Returns the normalized centroid matrix."""
    from ray.data.aggregate import Sum

    ds = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    sample = ds.random_sample(sample_fraction, seed=seed).materialize()
    init = sample.limit(n_lists).take_all()
    if not init:
        raise ValueError(
            "empty training sample — raise sample_fraction or check the table"
        )
    if len(init) < n_lists:
        # fewer sampled rows than requested lists: clamp (the acc/cnt
        # arrays below are sized to the centroid count, so a short init
        # would otherwise IndexError on the nonempty mask)
        n_lists = len(init)
    centroids = np.stack([r["embedding"] for r in init]).astype(np.float64)
    centroids /= np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    dim = centroids.shape[1]

    for _ in range(n_iters):
        ref = ray.put(centroids)

        def partial(t: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref)
            v = _emb_matrix(t["embedding"], c.shape[1])
            v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            a = np.argmax(v @ c.T, axis=1)
            k = c.shape[0]
            sums = np.zeros((k, v.shape[1]))
            np.add.at(sums, a, v)
            counts = np.bincount(a, minlength=k)
            cid = np.repeat(np.arange(k), v.shape[1])
            return pa.table(
                {
                    "cid": pa.array(cid, pa.int32()),
                    "dim": pa.array(np.tile(np.arange(v.shape[1]), k), pa.int32()),
                    "s": pa.array(sums.reshape(-1), pa.float64()),
                    "n": pa.array(np.repeat(counts, v.shape[1]), pa.int64()),
                }
            )

        rows = (
            sample.map_batches(partial, batch_format="pyarrow")
            .groupby(["cid", "dim"])
            .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
            .take_all()
        )  # exactly n_lists * dim tiny rows
        new = centroids.copy()
        acc = np.zeros((n_lists, dim))
        cnt = np.zeros(n_lists)
        for r in rows:
            acc[r["cid"], r["dim"]] = r["s"]
            if r["dim"] == 0:  # n is replicated per dim row
                cnt[r["cid"]] = r["n"]
        nonempty = cnt > 0
        new[nonempty] = acc[nonempty] / cnt[nonempty, None]
        norms = np.maximum(np.linalg.norm(new, axis=1, keepdims=True), 1e-12)
        centroids = new / norms
    return centroids


# ---- product quantization: compressed-domain ANN (the memory-scale
#      lever beyond IVF/LSH — a 64-dim float32 vector becomes m=8
#      uint8 codes, 32x smaller, scanned via per-query lookup tables) ----

_PQ_M = 8          # subspaces
_PQ_K = 16         # centroids per subspace (codes fit uint8 with room)
_PQ_REFINE = 4     # rerank pool = _TOP_K * _PQ_REFINE approx candidates


def train_pq_codebooks(
    sf_dir: str, m: int = _PQ_M, k: int = _PQ_K, n_iters: int = 5,
    sample_fraction: float = 0.5, seed: int = 17,
):
    """Per-subspace k-means over a sample (product quantization, Jégou
    et al. 2011): the same distributed partial-sums shape as
    ``train_ivf_centroids`` but keyed (sub, cid, dim) — one map_batches
    pass per Lloyd iteration, one tiny groupby reduce; the driver holds
    only the (m, k, dim/m) codebook tensor. Vectors are L2-normalized
    BEFORE splitting so PQ-approximate dot products estimate cosine."""
    from ray.data.aggregate import Sum

    ds = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(
        lambda t: t.filter(pc.is_valid(t["embedding"])), batch_format="pyarrow"
    )
    sample = ds.random_sample(sample_fraction, seed=seed).materialize()
    init = sample.limit(k).take_all()
    if not init:
        raise ValueError("empty training sample")
    mat = np.stack([r["embedding"] for r in init]).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    dim = mat.shape[1]
    while dim % m:
        m -= 1  # largest feasible subspace count <= requested
    dsub = dim // m
    k_eff = min(k, mat.shape[0])
    # init: the first k sampled (normalized) rows, per subspace
    books = np.stack([mat[:k_eff, s * dsub:(s + 1) * dsub] for s in range(m)])

    for _ in range(n_iters):
        ref = ray.put(books)

        def partial(t: pa.Table, _ref=ref) -> pa.Table:
            b = ray.get(_ref)  # (m, k, dsub)
            v = _emb_matrix(t["embedding"], b.shape[0] * b.shape[2])
            v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            mm, kk, dd = b.shape
            cols = {"sub": [], "cid": [], "dim": [], "s": [], "n": []}
            for s in range(mm):
                vs = v[:, s * dd:(s + 1) * dd]
                # L2 assignment: argmin ||x - c||^2 = argmax (x.c - |c|^2/2)
                a = np.argmax(vs @ b[s].T - 0.5 * (b[s] ** 2).sum(1)[None, :], axis=1)
                sums = np.zeros((kk, dd))
                np.add.at(sums, a, vs)
                counts = np.bincount(a, minlength=kk)
                cols["sub"].append(np.full(kk * dd, s))
                cols["cid"].append(np.repeat(np.arange(kk), dd))
                cols["dim"].append(np.tile(np.arange(dd), kk))
                cols["s"].append(sums.reshape(-1))
                cols["n"].append(np.repeat(counts, dd))
            return pa.table(
                {
                    "sub": pa.array(np.concatenate(cols["sub"]), pa.int32()),
                    "cid": pa.array(np.concatenate(cols["cid"]), pa.int32()),
                    "dim": pa.array(np.concatenate(cols["dim"]), pa.int32()),
                    "s": pa.array(np.concatenate(cols["s"]), pa.float64()),
                    "n": pa.array(np.concatenate(cols["n"]), pa.int64()),
                }
            )

        rows = (
            sample.map_batches(partial, batch_format="pyarrow")
            .groupby(["sub", "cid", "dim"])
            .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
            .take_all()
        )  # m * k * dsub tiny rows
        new = books.copy()
        acc = np.zeros((m, k_eff, dsub))
        cnt = np.zeros((m, k_eff))
        for r in rows:
            acc[r["sub"], r["cid"], r["dim"]] = r["s"]
            if r["dim"] == 0:
                cnt[r["sub"], r["cid"]] = r["n"]
        nz = cnt > 0
        new[nz] = acc[nz] / cnt[nz][:, None]
        books = new
    return books


def pq_encode(ds, books: np.ndarray):
    """(vec_id, codes) with codes a fixed_size_list<uint8, m> — the
    32x-compressed index a PQ deployment stores instead of the float
    vectors. Stateless map over a broadcast codebook tensor."""
    ref = ray.put(books)
    mm, _kk, dd = books.shape

    def enc(t: pa.Table, _ref=ref) -> pa.Table:
        b = ray.get(_ref)
        v = _emb_matrix(t["embedding"], mm * dd)
        v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        codes = np.empty((len(v), mm), dtype=np.uint8)
        for s in range(mm):
            vs = v[:, s * dd:(s + 1) * dd]
            codes[:, s] = np.argmax(
                vs @ b[s].T - 0.5 * (b[s] ** 2).sum(1)[None, :], axis=1
            ).astype(np.uint8)
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "codes": pa.FixedSizeListArray.from_arrays(
                    pa.array(codes.reshape(-1), pa.uint8()), mm
                ),
            }
        )

    return ds.map_batches(enc, batch_format="pyarrow")


def knn_pq(sf_dir: str, refine: int = _PQ_REFINE):
    """PQ-ANN over the STORED codes: ``pq_encode`` materializes the
    uint8 code table once (the 32x-compressed index a deployment keeps
    instead of the float vectors), the scan touches ONLY codes — per
    query an (m x k) lookup table of subspace dot products, summed by
    integer indexing (what a compressed-domain scan costs at 100 TB) —
    and the pooled top ``refine * k`` candidates per batch are exact-
    reranked from a row-group-pruned point read of just their float
    rows, so reported sims are true cosines. Rows-only entry
    (approximation quality is pytest-bounded vs brute force)."""
    books = train_pq_codebooks(sf_dir)
    qids, qmat = _load_queries(sf_dir)
    qnorm = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    mm, kk, dd = books.shape
    # (n_queries, m, k) LUT: lut[q, s, c] = q_sub(s) . codebook[s, c]
    lut = np.einsum("qsd,scd->qsc", qnorm.reshape(len(qnorm), mm, dd), books)
    ref = ray.put((qids, lut))
    pool = _TOP_K * refine

    def scan(t: pa.Table, _ref=ref) -> pa.Table:
        q_ids, lut_b = ray.get(_ref)
        vids = t["vec_id"].to_numpy()
        arr = t["codes"].combine_chunks()
        codes = (
            arr.flatten().to_numpy(zero_copy_only=False)
            .astype(np.int64).reshape(len(vids), mm)
        )
        out = {"qid": [], "vec_id": [], "approx": []}
        sub_idx = np.arange(mm)
        for qi_pos, qi in enumerate(q_ids):
            approx = lut_b[qi_pos][sub_idx[None, :], codes].sum(axis=1)
            approx[vids == qi] = -np.inf
            n_keep = min(pool, len(approx))
            cand = np.argpartition(-approx, n_keep - 1)[:n_keep]
            cand = cand[np.isfinite(approx[cand])]
            if cand.size == 0:
                continue
            out["qid"].extend([int(qi)] * cand.size)
            out["vec_id"].extend(vids[cand].tolist())
            out["approx"].extend(approx[cand].tolist())
        return pa.table(
            {
                "qid": pa.array(out["qid"], pa.int64()),
                "vec_id": pa.array(out["vec_id"], pa.int64()),
                "approx": pa.array(out["approx"], pa.float64()),
            }
        )

    codes_ds = pq_encode(_read_emb(sf_dir), books)
    cand = codes_ds.map_batches(scan, batch_format="pyarrow").to_pandas()
    empty = pa.table(
        {"qid": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
         "sim": pa.array([], pa.float64())}
    )
    if cand.empty:
        return empty
    # global per-query pool cut before paying the exact fetch — the
    # driver holds only O(queries x pool) candidate rows
    cand = (
        cand.sort_values(["qid", "approx"], ascending=[True, False])
        .groupby("qid").head(pool)
    )
    need = sorted(int(v) for v in cand["vec_id"].unique())
    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", need)],
    )
    tbl = tbl.filter(pc.is_valid(tbl["embedding"]))
    fetched = tbl["vec_id"].to_numpy()
    v = _emb_matrix(tbl["embedding"], mm * dd)
    v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
    row_of = {int(x): i for i, x in enumerate(fetched)}
    out = {"qid": [], "vec_id": [], "sim": []}
    for qi_pos, qi in enumerate(qids):
        sub = cand[cand["qid"] == qi]
        rows = np.asarray([row_of[int(x)] for x in sub["vec_id"] if int(x) in row_of])
        if rows.size == 0:
            continue
        vv = np.asarray([int(x) for x in sub["vec_id"] if int(x) in row_of])
        sims = np.round(v[rows] @ qnorm[qi_pos], 6)  # exact rerank
        order = np.lexsort((vv, -sims))[:_TOP_K]
        out["qid"].extend([int(qi)] * len(order))
        out["vec_id"].extend(vv[order].tolist())
        out["sim"].extend(sims[order].tolist())
    return pa.table(
        {
            "qid": pa.array(out["qid"], pa.int64()),
            "vec_id": pa.array(out["vec_id"], pa.int64()),
            "sim": pa.array(out["sim"], pa.float64()),
        }
    )


def embedding_quantize(sf_dir: str):
    """Per-vector int8 scalar quantization (min/max affine) — the
    memory-scale path for ANN: 4x smaller than float32, 8x smaller than
    float64. Returns (vec_id, qmin, qscale, code_sum) where code_sum is
    the deterministic checksum of the uint8 codes (the codes themselves
    are what a real index stores; the scalar triple is what the oracle
    can hash). Rounding is floor(x + 0.5) on BOTH sides — numpy's
    half-even and SQL's half-away would disagree on boundary values.
    Dequantization error/recall is pytest-checked."""

    def quant(t: pa.Table) -> pa.Table:
        v = _emb_matrix(t["embedding"])
        return pa.table(
            {
                "vec_id": pa.array(t["vec_id"].to_numpy().astype(np.int64), pa.int64()),
                **_quant_cols(v),
            }
        )

    ds = _read_emb(sf_dir)
    return ds.map_batches(quant, batch_format="pyarrow")


def _quant_cols(v: np.ndarray) -> dict:
    """Shared kernel for the min/max affine int8 quantization columns —
    the floor(x+0.5) rounding rule lives in exactly one place (both
    ``embedding_quantize`` and the consolidated ``embedding_stats``
    verify against the one SQL_EMBEDDING_QUANTIZE twin)."""
    mn = v.min(axis=1)
    mx = v.max(axis=1)
    scale = np.maximum(mx - mn, 1e-12) / 255.0
    codes = np.floor((v - mn[:, None]) / scale[:, None] + 0.5).astype(np.int64)
    return {
        "qmin": pa.array(np.round(mn, 6), pa.float64()),
        "qscale": pa.array(np.round(scale, 6), pa.float64()),
        "code_sum": pa.array(codes.sum(axis=1), pa.int64()),
    }


def _norm_col(v: np.ndarray) -> pa.Array:
    """Shared kernel for the rounded L2-norm column (embedding_norms +
    embedding_stats, one SQL_EMBEDDING_NORMS twin)."""
    return pa.array(np.round(np.linalg.norm(v, axis=1), 6), pa.float64())


def dequantize_codes(codes: np.ndarray, qmin: np.ndarray, qscale: np.ndarray) -> np.ndarray:
    """Inverse of embedding_quantize's code computation."""
    return codes.astype(np.float64) * qscale[:, None] + qmin[:, None]


SQL_EMBEDDING_QUANTIZE = """
WITH e AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
    FROM embeddings WHERE embedding IS NOT NULL
),
mm AS (
    SELECT vec_id, e, list_min(e) AS mn,
           greatest(list_max(e) - list_min(e), 1e-12) / 255.0 AS sc
    FROM e
)
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(round(mn, 6) AS DOUBLE) AS qmin,
       CAST(round(sc, 6) AS DOUBLE) AS qscale,
       CAST(list_sum(list_transform(e, x -> CAST(floor((x - mn) / sc + 0.5) AS BIGINT))) AS BIGINT) AS code_sum
FROM mm
"""


def embedding_norms(sf_dir: str):
    def norms(t: pa.Table) -> pa.Table:
        v = _emb_matrix(t["embedding"])
        return pa.table(
            {
                "vec_id": pa.array(t["vec_id"].to_numpy().astype(np.int64), pa.int64()),
                "l2_norm": _norm_col(v),
            }
        )

    ds = _read_emb(sf_dir)
    return ds.map_batches(norms, batch_format="pyarrow")


SQL_EMBEDDING_NORMS = """
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm
FROM embeddings WHERE embedding IS NOT NULL
"""


# ---- consolidated gate entries (the driver evaluates at most 50
#      queries() entries; closely-related operators share one entry,
#      each code path still runs — see relational.py's note) ----


def knn_lsh_modes(sf_dir: str):
    """Single-probe (exact bucket) + multi-probe (Hamming <= 1) LSH
    top-k, mode-tagged in one result; both operators run unchanged."""

    def tag(mode: str):
        return lambda t: pa.table(
            {
                "mode": pa.array([mode] * t.num_rows, pa.string()),
                "qid": t["qid"],
                "vec_id": t["vec_id"],
                "sim": t["sim"],
            }
        )

    exact = knn_lsh(sf_dir).map_batches(tag("exact"), batch_format="pyarrow")
    probe = knn_lsh_multiprobe(sf_dir).map_batches(tag("probe1"), batch_format="pyarrow")
    return exact.union(probe)


SQL_KNN_LSH_MODES = f"""
SELECT 'exact' AS mode, qid, vec_id, sim FROM ({SQL_KNN_LSH})
UNION ALL
SELECT 'probe1' AS mode, qid, vec_id, sim FROM ({SQL_KNN_LSH_MULTIPROBE})
"""


def embedding_stats(sf_dir: str):
    """Per-vector L2 norm + int8 scalar quantization parameters in one
    pass (consolidates the embedding_norms / embedding_quantize gate
    entries; see their docstrings for semantics)."""

    def stats(t: pa.Table) -> pa.Table:
        v = _emb_matrix(t["embedding"])
        return pa.table(
            {
                "vec_id": pa.array(t["vec_id"].to_numpy().astype(np.int64), pa.int64()),
                "l2_norm": _norm_col(v),
                **_quant_cols(v),
            }
        )

    ds = _read_emb(sf_dir)
    return ds.map_batches(stats, batch_format="pyarrow")


_HNSW_M = 8          # neighbor-list width per node
_HNSW_EF = 32        # beam width (build and search)
_MAX_SHARD_ROWS = 65_536  # ~42 s sequential build, ~35 MB resident / shard
_SHARD_FLOOR = 4     # never fewer than the historical fixed count


def hnsw_shards_for(n_rows: int, max_shard_rows: int = _MAX_SHARD_ROWS,
                    floor: int = _SHARD_FLOOR) -> int:
    """Power-of-two shard count with BOUNDED per-shard rows — the same
    auto-scaling contract as dedup's ``_emb_rows_for``: the NSW insert
    loop is inherently sequential per shard, so shard size (not corpus
    size) must bound the single-task build time (measured ~1.6k
    rows/s/shard at dim 64) and the per-actor memory. Used by both the
    batch ``knn_hnsw`` and the persistent tier's ``build_ann_index``."""
    need = -(-max(int(n_rows), 1) // max_shard_rows)
    s = max(1, floor)
    while s < need:
        s <<= 1
    return s


def _nsw_search(v: np.ndarray, nbr: np.ndarray, q: np.ndarray, ef: int,
                n_active: int, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Greedy beam search over a navigable-small-world graph: expand
    the best unexpanded candidate, score its unvisited neighbors in ONE
    vectorized matvec, keep an ef-wide beam. Returns the beam's top-k
    (indices, sims) by (sim desc, index asc) — deterministic. ``v``
    rows must be unit-normalized; sims are exact cosines, so only
    RECALL is approximate, never the reported scores."""
    import heapq

    if n_active <= 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    entry = 0
    visited = np.zeros(n_active, dtype=bool)
    visited[entry] = True
    s0 = float(v[entry] @ q)
    # max-heap on sim (negated); ties broken by index for determinism
    beam = [(-s0, entry)]     # expansion frontier
    best = [(s0, -entry)]     # min-heap of the ef best seen
    while beam:
        neg_s, node = heapq.heappop(beam)
        if len(best) >= ef and -neg_s < best[0][0]:
            break  # the frontier can no longer improve the beam
        neigh = nbr[node]
        neigh = neigh[neigh >= 0]
        neigh = neigh[~visited[neigh]]
        if neigh.size == 0:
            continue
        visited[neigh] = True
        sims = v[neigh] @ q
        for j, s in zip(neigh.tolist(), sims.tolist()):
            if len(best) < ef:
                heapq.heappush(best, (s, -j))
                heapq.heappush(beam, (-s, j))
            elif s > best[0][0]:
                heapq.heapreplace(best, (s, -j))
                heapq.heappush(beam, (-s, j))
    out = sorted(((s, -nj) for s, nj in best), key=lambda t: (-t[0], t[1]))[:k]
    return (np.asarray([j for _, j in out], np.int64),
            np.asarray([s for s, _ in out], np.float64))


def _nsw_build(v: np.ndarray, m: int = _HNSW_M, ef: int = _HNSW_EF,
               *, nbr0: np.ndarray | None = None) -> np.ndarray:
    """Sequential NSW construction (Malkov et al.): insert points in
    order, link each to its beam-searched m nearest, add pruned
    back-links (replace the worst neighbor when the new node is
    closer). Single layer: at per-shard sizes the hop count is already
    logarithmic-ish and the HNSW hierarchy adds constant factor only.
    O(n * ef * m * dim) sequential — the DISTRIBUTION axis is sharding
    (one independent graph per vec_id hash shard), not parallel insert,
    which is also how production ANN services scale graphs.

    ``nbr0`` warm-starts from an existing graph over ``v[:len(nbr0)]``:
    because construction is a pure function of insert order, continuing
    the loop at ``len(nbr0)`` yields BIT-IDENTICAL output to a from-
    scratch build over all of ``v`` — inserting an append-only delta
    costs O(delta), not O(shard) (``extend_ann_index``'s fast path)."""
    n = len(v)
    nbr = np.full((n, m), -1, np.int32)
    start = 1
    if nbr0 is not None:
        start = max(1, len(nbr0))
        nbr[: len(nbr0)] = nbr0
    for i in range(start, n):
        cand, sims = _nsw_search(v, nbr, v[i], ef, n_active=i, k=m)
        nbr[i, : cand.size] = cand
        for j, s in zip(cand.tolist(), sims.tolist()):
            row = nbr[j]
            slot = np.flatnonzero(row == -1)
            if slot.size:
                row[slot[0]] = i
            else:
                back = v[row] @ v[j]
                w = int(np.argmin(back))
                if s > back[w]:
                    row[w] = i
    return nbr


def knn_hnsw(sf_dir: str, n_shards: int | None = None, m: int = _HNSW_M,
             ef: int = _HNSW_EF):
    """Graph-based ANN (the HNSW/NSW family): vectors hash-shard by
    vec_id; ``map_groups`` builds one independent beam-search graph per
    shard and answers every query from it; the finisher merges
    per-shard candidates to the global top-k. ``n_shards`` auto-sizes
    with the corpus (``hnsw_shards_for``: power-of-two ceil of
    rows / 64k) so the sequential per-shard insert loop stays a bounded
    single-task cost at any scale; each shard's graph + vectors fit one
    worker. The PERSISTENT twin (`pipelines/ann_index.py`) builds the
    same graphs once, stores them, and hosts them in long-lived actors
    (the DocShardActor shape) with queries broadcast and O(k) rows
    returned per shard — bit-identical results, pytest-pinned. Sims are
    exact cosines (graph affects recall only); rows-only aux entry,
    recall vs brute force pytest-bounded."""
    if n_shards is None:
        from ..io import parquet_rows

        n_shards = hnsw_shards_for(
            parquet_rows(f"{sf_dir}/embeddings.parquet") or 0
        )
    qids, qmat = _load_queries(sf_dir)
    qnorm = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((qids, qnorm))
    kk = _TOP_K + 1  # self-match dropped by the finisher

    def add_shard(t: pa.Table) -> pa.Table:
        shard = pc.cast(
            pc.bit_wise_and(t["vec_id"], n_shards - 1), pa.int32()
        )
        return t.append_column("shard", shard)

    def build_and_query(group: pa.Table, _ref=ref) -> pa.Table:
        q_ids, q = ray.get(_ref)
        vids = group["vec_id"].to_numpy()
        order = np.argsort(vids, kind="stable")  # deterministic inserts
        vids = vids[order]
        v = _emb_matrix(group["embedding"], q.shape[1])[order]
        v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        nbr = _nsw_build(v, m=m, ef=ef)
        out = {"qid": [], "vec_id": [], "sim": []}
        for qi_pos, qi in enumerate(q_ids):
            idx, sims = _nsw_search(v, nbr, q[qi_pos], ef, len(v), kk)
            keep = vids[idx] != qi  # self-match lives in exactly one shard
            idx, sims = idx[keep], sims[keep]
            out["qid"].extend([int(qi)] * idx.size)
            out["vec_id"].extend(vids[idx].tolist())
            out["sim"].extend(np.round(sims, 6).tolist())
        return pa.table(
            {
                "qid": pa.array(out["qid"], pa.int64()),
                "vec_id": pa.array(out["vec_id"], pa.int64()),
                "sim": pa.array(out["sim"], pa.float64()),
            }
        )

    assert n_shards & (n_shards - 1) == 0, "n_shards must be a power of 2"
    ds = _read_emb(sf_dir).map_batches(add_shard, batch_format="pyarrow")
    scored = ds.groupby("shard").map_groups(build_and_query, batch_format="pyarrow")
    return _topk_per_qid(scored)


SQL_EMBEDDING_STATS = f"""
SELECT n.vec_id, n.l2_norm, q.qmin, q.qscale, q.code_sum
FROM ({SQL_EMBEDDING_NORMS}) n JOIN ({SQL_EMBEDDING_QUANTIZE}) q USING (vec_id)
"""


RAY_QUERIES = {
    "knn_cosine": knn_cosine,
    "knn_lsh": knn_lsh_modes,
    "knn_ivf": knn_ivf,
    "embedding_stats": embedding_stats,
}

def _knn_hnsw_served(sf_dir: str):
    """Lazy import: pipelines.ann_index imports this module, so the
    aux registration must not import it back at module load."""
    from ..pipelines.ann_index import knn_hnsw_served

    return knn_hnsw_served(sf_dir)


def _knn_hnsw_served_q8(sf_dir: str):
    from ..pipelines.ann_index import knn_hnsw_served_q8

    return knn_hnsw_served_q8(sf_dir)


def _knn_hnsw_served_ivf(sf_dir: str):
    from ..pipelines.ann_index import knn_hnsw_served_ivf

    return knn_hnsw_served_ivf(sf_dir)


# rows-only aux entries (no SQL twin; recall vs brute force is
# pytest-bounded, and the served path is pytest-pinned bit-identical
# to the batch path)
RAY_QUERIES_AUX = {
    "knn_pq": knn_pq,
    "knn_hnsw": knn_hnsw,
    "knn_hnsw_served": _knn_hnsw_served,
    "knn_hnsw_served_q8": _knn_hnsw_served_q8,
    "knn_hnsw_served_ivf": _knn_hnsw_served_ivf,
}

ORACLE_SQL = {
    "knn_cosine": SQL_KNN_COSINE,
    "knn_lsh": SQL_KNN_LSH_MODES,
    "knn_ivf": SQL_KNN_IVF,
    "embedding_stats": SQL_EMBEDDING_STATS,
}
