"""Deduplication operators over the ``documents`` table.

Extends the reference's two dedup mechanisms — exact RDD ``distinct``
via key collision (`/root/reference/homework_code/flame/Worker.java:463-491`)
and the crawler's exact-content ``canonicalURL`` check
(`/root/reference/src/cis5550/jobs/Crawler.java:1348-1386`) — with the
near-dup family a training-data pipeline needs: MinHash+LSH, SimHash,
n-gram Jaccard, embedding cosine.

All hashing is seeded/stable (crc32 / fixed LCG constants), so results
are deterministic across runs and parallelism levels.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..io import read_parquet_clean

from ..config import IndexConfig
from ..functions.analysis import split_tokens

_CFG = IndexConfig(stemming=False)

# ---- exact dedup: hash-partition on content + per-group first ----

def dedup_exact(sf_dir: str):
    """Groups identical texts; keeps the smallest doc_id (the analog of
    KVS key collision where last-write-wins — made deterministic)."""
    from ray.data.aggregate import Min, Count

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return (
        ds.groupby("text")
        .aggregate(Min("doc_id", alias_name="keep_doc_id"), Count(alias_name="n_copies"))
        .drop_columns(["text"])
    )


SQL_DEDUP_EXACT = """
SELECT MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY text
"""


# ---- shingles + MinHash signatures (shared helpers) ----

_N_PERM = 64
_BANDS = 16  # 16 bands x 4 rows
_ROWS = _N_PERM // _BANDS
_MERSENNE = (1 << 61) - 1
_rng = np.random.RandomState(4242)
_PERM_A = _rng.randint(1, _MERSENNE, size=_N_PERM).astype(np.uint64)
_PERM_B = _rng.randint(0, _MERSENNE, size=_N_PERM).astype(np.uint64)


def _shingle_hashes(tokens: list[str], k: int = 3) -> np.ndarray:
    """crc32 hashes of k-word shingles (distinct)."""
    if len(tokens) < k:
        joined = [" ".join(tokens)] if tokens else []
    else:
        joined = [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]
    return np.unique(
        np.fromiter((zlib.crc32(s.encode()) for s in joined), dtype=np.uint64, count=len(joined))
    )


def _minhash(sh: np.ndarray) -> np.ndarray:
    """64-perm MinHash signature of a shingle-hash set (vectorized)."""
    if sh.size == 0:
        return np.full(_N_PERM, np.iinfo(np.uint64).max, dtype=np.uint64)
    # (a*x + b) mod p, computed in python-int free uint64 via float-safe trick:
    # values < 2^32 and a,b < 2^61 -> a*x can overflow; use object? No:
    # split multiply mod with uint64 via (a mod p * x) needs 93 bits.
    # Use np.uint64 with p=2^61-1 and x<2^32, a<2^29 to stay in range.
    a = (_PERM_A >> np.uint64(32))[:, None]  # < 2^29
    b = _PERM_B[:, None]
    vals = (a * sh[None, :] + b) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


def _tokens_per_doc(t: pa.Table):
    doc_idx, tok, *_ = split_tokens(t["text"].combine_chunks(), _CFG)
    n = t.num_rows
    bounds = np.searchsorted(doc_idx, np.arange(n + 1))
    return [list(tok[bounds[d] : bounds[d + 1]]) for d in range(n)]


# ---- MinHash + LSH near-dup pairs, verified with exact Jaccard ----

def dedup_minhash_lsh(sf_dir: str, jaccard_threshold: float = 0.5):
    """shingle -> minhash -> band buckets (groupby shuffle) ->
    candidate pairs -> exact-Jaccard verify. Banding keys the shuffle,
    so at scale only same-bucket docs meet (no all-pairs). The verify
    step re-reads the two docs' shingle sets via a broadcast map (small
    candidate count); at 100 TB the verify would be a second
    hash-partitioned join on doc_id instead. Returns
    (doc_a, doc_b, jaccard_r6) for verified pairs."""

    def signatures(t: pa.Table) -> pa.Table:
        toks = _tokens_per_doc(t)
        doc_ids = t["doc_id"].to_numpy()
        rows_doc, rows_band, rows_hash = [], [], []
        for d, tk in enumerate(toks):
            sig = _minhash(_shingle_hashes(tk))
            for band in range(_BANDS):
                chunk = sig[band * _ROWS : (band + 1) * _ROWS]
                h = zlib.crc32(chunk.tobytes())
                rows_doc.append(doc_ids[d])
                rows_band.append(band)
                rows_hash.append(h)
        return pa.table(
            {
                "doc_id": pa.array(rows_doc, pa.int64()),
                "band": pa.array(rows_band, pa.int32()),
                "band_hash": pa.array(rows_hash, pa.int64()),
            }
        )

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    buckets = ds.map_batches(signatures, batch_format="pyarrow")

    def pairs(group: pa.Table) -> pa.Table:
        ids = np.unique(group["doc_id"].to_numpy())
        if len(ids) < 2:
            return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
        a, b = np.triu_indices(len(ids), k=1)
        return pa.table({"doc_a": pa.array(ids[a], pa.int64()), "doc_b": pa.array(ids[b], pa.int64())})

    cand = (
        buckets.groupby(["band", "band_hash"])
        .map_groups(pairs, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
    )
    cand_tbl = cand.to_pandas()

    # exact verify with a broadcast shingle map (candidates are few)
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    sh_map = {}
    for t in docs.iter_batches(batch_size=4096, batch_format="pyarrow"):
        toks = _tokens_per_doc(t)
        for d, tk in zip(t["doc_id"].to_numpy(), toks):
            sh_map[int(d)] = _shingle_hashes(tk)
    out_a, out_b, out_j = [], [], []
    for _, row in cand_tbl.iterrows():
        sa, sb = sh_map[int(row["doc_a"])], sh_map[int(row["doc_b"])]
        if sa.size == 0 and sb.size == 0:
            j = 1.0
        else:
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            j = inter / (sa.size + sb.size - inter)
        if j >= jaccard_threshold:
            out_a.append(int(row["doc_a"]))
            out_b.append(int(row["doc_b"]))
            out_j.append(round(j, 6))
    return pa.table(
        {
            "doc_a": pa.array(out_a, pa.int64()),
            "doc_b": pa.array(out_b, pa.int64()),
            "jaccard": pa.array(out_j, pa.float64()),
        }
    )


# ---- exact n-gram Jaccard (pairs via shared-shingle join) ----

def dedup_ngram_jaccard(sf_dir: str, threshold: float = 0.4, k: int = 3):
    """Exact word-trigram Jaccard for every pair sharing >= 1 shingle —
    pair generation by a shingle-keyed groupby (docs sharing nothing
    have Jaccard 0 and can never pass the threshold), so no all-pairs
    scan. Shingles stay strings to match the SQL oracle exactly; at
    scale they would be hashed (crc64) and hot shingles df-capped."""
    from ray.data.aggregate import Count

    def shingles(t: pa.Table) -> pa.Table:
        toks = _tokens_per_doc(t)
        doc_ids = t["doc_id"].to_numpy()
        out_doc, out_sh = [], []
        for d, tk in enumerate(toks):
            if len(tk) < k:
                continue
            sh = {" ".join(tk[i : i + k]) for i in range(len(tk) - k + 1)}
            out_doc.extend([doc_ids[d]] * len(sh))
            out_sh.extend(sorted(sh))
        return pa.table(
            {"doc_id": pa.array(out_doc, pa.int64()), "sh": pa.array(out_sh, pa.string())}
        )

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    sh_ds = ds.map_batches(shingles, batch_format="pyarrow")

    sizes = {
        int(r["doc_id"]): int(r["n"])
        for r in sh_ds.groupby("doc_id").aggregate(Count(alias_name="n")).take_all()
    }

    def pairs(group: pa.Table) -> pa.Table:
        ids = np.unique(group["doc_id"].to_numpy())
        if len(ids) < 2:
            return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
        a, b = np.triu_indices(len(ids), k=1)
        return pa.table({"doc_a": pa.array(ids[a], pa.int64()), "doc_b": pa.array(ids[b], pa.int64())})

    inter = (
        sh_ds.groupby("sh")
        .map_groups(pairs, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="inter"))
        .to_pandas()
    )
    ja = inter["inter"] / (
        inter["doc_a"].map(sizes) + inter["doc_b"].map(sizes) - inter["inter"]
    )
    keep = ja >= threshold
    out = inter[keep].copy()
    out["jaccard"] = np.round(ja[keep], 6)
    return pa.table(
        {
            "doc_a": pa.array(out["doc_a"].to_numpy(), pa.int64()),
            "doc_b": pa.array(out["doc_b"].to_numpy(), pa.int64()),
            "inter": pa.array(out["inter"].to_numpy().astype(np.int64), pa.int64()),
            "jaccard": pa.array(out["jaccard"].to_numpy(), pa.float64()),
        }
    )


SQL_NGRAM_JACCARD = """
WITH arrs AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(substr(text, 1, 10000)), '[^0-9a-z]+'),
                       x -> x <> '') AS arr
    FROM documents
),
tri AS (
    SELECT DISTINCT doc_id,
           arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2] AS sh
    FROM arrs, UNNEST(range(1, len(arr) - 1)) t(i)
    WHERE len(arr) >= 3
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM tri GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
    FROM tri a JOIN tri b ON a.sh = b.sh AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, i.inter,
       round(i.inter * 1.0 / (sa.n + sb.n - i.inter), 6) AS jaccard
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE i.inter * 1.0 / (sa.n + sb.n - i.inter) >= 0.4
"""


# ---- SimHash (64-bit) ----

def dedup_simhash(sf_dir: str):
    """64-bit SimHash over tokens (tf-weighted bit votes); returns
    (doc_id, simhash hex). Hamming-near docs are near-dups."""

    def sim(t: pa.Table) -> pa.Table:
        toks = _tokens_per_doc(t)
        out = []
        for tk in toks:
            votes = np.zeros(64, dtype=np.int64)
            uniq, counts = np.unique(np.array(tk, dtype=object), return_counts=True)
            for w, c in zip(uniq, counts):
                h = np.uint64(zlib.crc32(w.encode()) | (zlib.crc32(w[::-1].encode()) << 32))
                bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                votes += np.where(bits.astype(bool), c, -c)
            h64 = 0
            for i in range(64):
                if votes[i] > 0:
                    h64 |= 1 << i
            out.append(f"{h64:016x}")
        return pa.table({"doc_id": t["doc_id"], "simhash": pa.array(out, pa.string())})

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(sim, batch_format="pyarrow")


# ---- embedding cosine near-dup ----

def dedup_embedding(sf_dir: str, threshold: float = 0.4):
    """Pairs of embeddings with cosine >= threshold. Brute-force matmul
    per batch against the (broadcast) normalized matrix — the baseline;
    the scale path buckets by LSH first (see knn.knn_lsh)."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = tbl["vec_id"].to_numpy()
    mat = np.stack(tbl["embedding"].to_pylist()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, mat))

    class Scan:
        def __init__(self):
            self.ids, self.mat = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            vids = t["vec_id"].to_numpy()
            v = np.stack(t["embedding"].to_pylist()).astype(np.float64)
            v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            sims = v @ self.mat.T
            out_a, out_b, out_s = [], [], []
            for i in range(len(vids)):
                hits = np.flatnonzero((sims[i] >= threshold) & (self.ids > vids[i]))
                out_a.extend([int(vids[i])] * len(hits))
                out_b.extend(self.ids[hits].tolist())
                out_s.extend(np.round(sims[i][hits], 6).tolist())
            return pa.table(
                {
                    "vec_a": pa.array(out_a, pa.int64()),
                    "vec_b": pa.array(out_b, pa.int64()),
                    "cosine": pa.array(out_s, pa.float64()),
                }
            )

    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return ds.map_batches(Scan, batch_format="pyarrow", concurrency=(1, 4))


RAY_QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
    "dedup_embedding": dedup_embedding,
}

ORACLE_SQL = {
    "dedup_exact": SQL_DEDUP_EXACT,
    "dedup_ngram_jaccard": SQL_NGRAM_JACCARD,
}
