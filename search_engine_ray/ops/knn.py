"""Similarity search over the ``embeddings`` table.

- ``knn_cosine``: brute-force cosine top-k — numpy matmul per batch
  against a broadcast (ray.put once) query matrix; ranking by
  (cosine rounded to 6 desc, vec_id asc) so the DuckDB oracle ranks
  identically regardless of float summation order.
- ``knn_lsh``: random-hyperplane LSH variant — the scale path: bucket
  by sign-pattern (groupby shuffle), exact-rerank only within buckets.
  Approximate; rows-only check.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..io import read_parquet_clean

_N_QUERIES = 5
_TOP_K = 5


def _load_queries(sf_dir: str):
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = tbl["vec_id"].to_numpy()
    sel = np.flatnonzero(ids < _N_QUERIES)
    q = np.stack(tbl["embedding"].take(pa.array(sel)).to_pylist()).astype(np.float64)
    return ids[sel], q


def knn_cosine(sf_dir: str):
    qids, qmat = _load_queries(sf_dir)
    qnorm = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((qids, qnorm))

    class Score:
        def __init__(self):
            self.qids, self.q = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            vids = t["vec_id"].to_numpy()
            v = np.stack(t["embedding"].to_pylist()).astype(np.float64)
            v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            sims = np.round(self.q @ v.T, 6)  # (nq, batch)
            nq, nb = sims.shape
            return pa.table(
                {
                    "qid": pa.array(np.repeat(self.qids, nb), pa.int64()),
                    "vec_id": pa.array(np.tile(vids, nq), pa.int64()),
                    "sim": pa.array(sims.ravel(), pa.float64()),
                }
            )

    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    scored = ds.map_batches(Score, batch_format="pyarrow", concurrency=(1, 4))

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
    SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < {_N_QUERIES}
),
s AS (
    -- cast to DOUBLE[] so both the arithmetic and the output dtype
    -- match the Ray side's float64 (FLOAT[] would yield a float32 sim)
    SELECT q.qid, e.vec_id,
           CAST(round(list_cosine_similarity(
               list_transform(q.qe, x -> CAST(x AS DOUBLE)),
               list_transform(e.embedding, x -> CAST(x AS DOUBLE))), 6) AS DOUBLE) AS sim
    FROM q CROSS JOIN embeddings e
    WHERE e.vec_id <> q.qid
),
r AS (
    SELECT qid, vec_id, sim,
           row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS rn
    FROM s
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(vec_id AS BIGINT) AS vec_id, sim
FROM r WHERE rn <= {_TOP_K}
"""


def knn_lsh(sf_dir: str, n_planes: int = 8):
    """Approximate top-k: random-hyperplane signatures bucket the
    vectors (groupby shuffle), exact cosine rerank within the query's
    bucket only. Deterministic planes (seeded)."""
    qids, qmat = _load_queries(sf_dir)
    dim = qmat.shape[1]
    planes = np.random.RandomState(7).standard_normal((n_planes, dim))
    qnorm = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    qsig = (qnorm @ planes.T > 0) @ (1 << np.arange(n_planes))
    ref = ray.put((qids, qnorm, qsig, planes))

    class BucketScore:
        def __init__(self):
            self.qids, self.q, self.qsig, self.planes = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            vids = t["vec_id"].to_numpy()
            v = np.stack(t["embedding"].to_pylist()).astype(np.float64)
            v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            sig = (v @ self.planes.T > 0) @ (1 << np.arange(self.planes.shape[0]))
            out = {"qid": [], "vec_id": [], "sim": []}
            for qi, qs in zip(self.qids, self.qsig):
                hit = np.flatnonzero((sig == qs) & (vids != qi))
                if hit.size:
                    sims = np.round(v[hit] @ self.q[qi == self.qids][0], 6)
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

    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    scored = ds.map_batches(BucketScore, batch_format="pyarrow", concurrency=(1, 4))

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


def knn_ivf(sf_dir: str, n_lists: int = 8, n_probe: int = 2):
    """IVF-style ANN — the other scale path beside LSH: vectors are
    bucketed by nearest centroid (one groupby-shaped pass), queries
    exact-rerank only inside their ``n_probe`` closest lists.
    Centroids are a deterministic seeded sample of the data refined by
    a few Lloyd iterations computed once on the driver (at scale: a
    sampled distributed k-means); the vector scan is a broadcast-state
    actor-pool ``map_batches``."""
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    all_ids = tbl["vec_id"].to_numpy()
    mat = np.stack(tbl["embedding"].to_pylist()).astype(np.float64)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)

    rng = np.random.RandomState(13)
    centroids = mat[rng.choice(len(mat), size=min(n_lists, len(mat)), replace=False)]
    for _ in range(5):  # Lloyd refinement (cosine ~ dot on unit vectors)
        assign = np.argmax(mat @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = mat[assign == c]
            if len(members):
                m = members.mean(axis=0)
                centroids[c] = m / max(np.linalg.norm(m), 1e-12)

    qids, qmat = _load_queries(sf_dir)
    qnorm = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    qlists = np.argsort(-(qnorm @ centroids.T), axis=1)[:, :n_probe]
    ref = ray.put((qids, qnorm, qlists, centroids))

    class ProbeScore:
        def __init__(self):
            self.qids, self.q, self.qlists, self.centroids = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            vids = t["vec_id"].to_numpy()
            v = np.stack(t["embedding"].to_pylist()).astype(np.float64)
            v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            vlist = np.argmax(v @ self.centroids.T, axis=1)
            out = {"qid": [], "vec_id": [], "sim": []}
            for qi, probe in zip(self.qids, self.qlists):
                hit = np.flatnonzero(np.isin(vlist, probe) & (vids != qi))
                if hit.size:
                    sims = np.round(v[hit] @ self.q[qi == self.qids][0], 6)
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

    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    scored = ds.map_batches(ProbeScore, batch_format="pyarrow", concurrency=(1, 4))

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


def embedding_norms(sf_dir: str):
    def norms(t: pa.Table) -> pa.Table:
        v = np.stack(t["embedding"].to_pylist()).astype(np.float64)
        return pa.table(
            {
                "vec_id": pa.array(t["vec_id"].to_numpy().astype(np.int64), pa.int64()),
                "l2_norm": pa.array(np.round(np.linalg.norm(v, axis=1), 6), pa.float64()),
            }
        )

    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return ds.map_batches(norms, batch_format="pyarrow")


SQL_EMBEDDING_NORMS = """
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm
FROM embeddings
"""


RAY_QUERIES = {
    "knn_cosine": knn_cosine,
    "knn_lsh": knn_lsh,
    "knn_ivf": knn_ivf,
    "embedding_norms": embedding_norms,
}

ORACLE_SQL = {
    "knn_cosine": SQL_KNN_COSINE,
    "embedding_norms": SQL_EMBEDDING_NORMS,
}
