"""Oracle checks for the rows-only dedup / ANN ops (the SQL gate can't
express them): MinHash-LSH pairs vs exact Jaccard, SimHash locality,
LSH-ANN vs brute-force cosine. Inputs are tiny synthetic parquet tables
in the driver's sf_dir shape."""

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_ray.ops import dedup, knn


def _write_documents(path, texts):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(path / "documents.parquet"),
    )


def _exact_jaccard(a: str, b: str, k: int = 3) -> float:
    """Independent oracle: crc32 k-word shingle sets + set Jaccard."""

    def sh(text):
        toks = [t for t in "".join(c if c.isalnum() else " " for c in text.lower()).split() if t]
        if len(toks) < k:
            joined = [" ".join(toks)] if toks else []
        else:
            joined = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        return {zlib.crc32(s.encode()) for s in joined}

    sa, sb = sh(a), sh(b)
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


@pytest.fixture(scope="module")
def doc_dir(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("dedup_docs")
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    texts = [
        base,
        base + " extra",                          # near-dup of 0
        "completely different words about ray data pipelines and arrow batches",
        "completely different words about ray data pipelines and arrow batches",  # exact dup of 2
        "unrelated short text one two three four five six seven eight nine ten",
        "another standalone document with its own vocabulary and no overlap at all",
    ]
    _write_documents(d, texts)
    return str(d), texts


def test_minhash_lsh_pairs_match_exact_jaccard(doc_dir):
    sf_dir, texts = doc_dir
    got = dedup.dedup_minhash_lsh(sf_dir, jaccard_threshold=0.5).to_pandas()
    pairs = {(int(a), int(b)): j for a, b, j in zip(got["doc_a"], got["doc_b"], got["jaccard"])}
    # the two known near/exact dup pairs are found
    assert (0, 1) in pairs
    assert (2, 3) in pairs
    # reported jaccard equals the independent exact computation
    for (a, b), j in pairs.items():
        assert abs(j - _exact_jaccard(texts[a], texts[b])) < 1e-6
        assert j >= 0.5
    # no unrelated pair sneaks in
    assert (4, 5) not in pairs


def test_verify_tail_join_fallback_matches_broadcast(doc_dir, monkeypatch):
    """Above the pair/vocab broadcast budgets the Jaccard verify tails
    fall back to shuffle joins (the 100 TB dup-heavy shape); both paths
    must produce identical pair tables for minhash AND ngram-jaccard."""
    import pandas as pd

    sf_dir, _ = doc_dir

    def frame(ds, cols):
        return (
            ds.to_pandas()[cols]
            .sort_values(cols[:2])
            .reset_index(drop=True)
        )

    mh_bcast = frame(dedup.dedup_minhash_lsh(sf_dir, jaccard_threshold=0.5),
                     ["doc_a", "doc_b", "jaccard"])
    ng_bcast = frame(dedup.dedup_ngram_jaccard(sf_dir, threshold=0.4),
                     ["doc_a", "doc_b", "inter", "jaccard"])
    assert len(mh_bcast) and len(ng_bcast)

    # middle shape: pair gate on, but the shingle-broadcast verify off
    # (pre-filtered joins — the 100 TB shape for huge pair-doc sets)
    monkeypatch.setattr(dedup, "_BCAST_VERIFY_SH_ROWS", -1)
    mh_mid = frame(dedup.dedup_minhash_lsh(sf_dir, jaccard_threshold=0.5),
                   ["doc_a", "doc_b", "jaccard"])
    pd.testing.assert_frame_equal(mh_bcast, mh_mid)

    monkeypatch.setattr(dedup, "_BCAST_PAIR_ROWS", -1)   # force verify joins
    monkeypatch.setattr(dedup, "_BCAST_DUP_KEYS", -1)    # force df-cap join
    mh_join = frame(dedup.dedup_minhash_lsh(sf_dir, jaccard_threshold=0.5),
                    ["doc_a", "doc_b", "jaccard"])
    ng_join = frame(dedup.dedup_ngram_jaccard(sf_dir, threshold=0.4),
                    ["doc_a", "doc_b", "inter", "jaccard"])
    pd.testing.assert_frame_equal(mh_bcast, mh_join)
    pd.testing.assert_frame_equal(ng_bcast, ng_join)


def test_simhash_locality(doc_dir):
    sf_dir, texts = doc_dir
    got = dedup.dedup_simhash(sf_dir).to_pandas().set_index("doc_id")["simhash"]
    h = {i: int(got.loc[i]) for i in range(len(texts))}
    assert h[2] == h[3]  # identical docs -> identical simhash
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(h[0], h[1]) <= 12          # near-dups are hamming-near
    assert ham(h[0], h[2]) > ham(h[0], h[1])  # unrelated docs farther


@pytest.fixture(scope="module")
def emb_dir(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("emb")
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((5, 16)) * 3
    vecs, ids = [], []
    for i in range(60):
        c = centers[i % 5]
        vecs.append((c + rng.standard_normal(16) * 0.01).astype(np.float32))
        ids.append(i)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    return str(d), np.stack(vecs).astype(np.float64)


def test_knn_lsh_matches_bruteforce_on_clusters(emb_dir):
    sf_dir, mat = emb_dir
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = norm @ norm.T
    exact = {}
    for q in range(5):
        s = np.round(sims[q], 6)
        cand = np.arange(len(mat))
        mask = cand != q
        order = np.lexsort((cand[mask], -s[mask]))[:5]
        exact[q] = set(cand[mask][order].tolist())
    got = knn.knn_lsh(sf_dir).to_pandas()
    # reported sims are true cosines
    for _, r in got.iterrows():
        assert abs(r["sim"] - round(sims[int(r["qid"]), int(r["vec_id"])], 6)) < 1e-6
    # tight clusters -> LSH recall of exact top-5 is high
    recalls = []
    for q in range(5):
        approx = set(got[got["qid"] == q]["vec_id"].astype(int))
        recalls.append(len(approx & exact[q]) / 5)
    assert np.mean(recalls) >= 0.8, recalls


def test_dedup_embedding_matches_numpy(emb_dir):
    sf_dir, mat = emb_dir
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = norm @ norm.T
    want = {
        (a, b): round(float(sims[a, b]), 6)
        for a in range(len(mat))
        for b in range(a + 1, len(mat))
        if sims[a, b] >= 0.4
    }
    got = dedup.dedup_embedding(sf_dir, threshold=0.4).to_pandas()
    got_pairs = {(int(a), int(b)): c for a, b, c in zip(got["vec_a"], got["vec_b"], got["cosine"])}
    assert set(got_pairs) == set(want)
    for k in want:
        assert abs(got_pairs[k] - want[k]) < 2e-6, k


def test_dedup_embedding_tiling_matches_brute(emb_dir):
    """The distributed chunk-pair tiling (gate entry) must produce the
    identical pair set + cosines as the single-broadcast brute baseline
    at an odd chunk count (exercises uneven i!=j tiles)."""
    sf_dir, _ = emb_dir

    def norm(ds):
        df = ds.to_pandas().sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
        return df

    tiled = norm(dedup.dedup_embedding(sf_dir, threshold=0.4, chunks=3))
    brute = norm(dedup._dedup_embedding_brute(sf_dir, threshold=0.4))
    assert tiled["vec_a"].tolist() == brute["vec_a"].tolist()
    assert tiled["vec_b"].tolist() == brute["vec_b"].tolist()
    assert np.allclose(tiled["cosine"], brute["cosine"], atol=1e-9)


def test_knn_ivf_matches_bruteforce_on_clusters(emb_dir):
    sf_dir, mat = emb_dir
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = norm @ norm.T
    exact = {}
    for q in range(5):
        s = np.round(sims[q], 6)
        cand = np.arange(len(mat))
        mask = cand != q
        order = np.lexsort((cand[mask], -s[mask]))[:5]
        exact[q] = set(cand[mask][order].tolist())
    got = knn.knn_ivf(sf_dir).to_pandas()
    for _, r in got.iterrows():
        assert abs(r["sim"] - round(sims[int(r["qid"]), int(r["vec_id"])], 6)) < 1e-6
    recalls = [len(set(got[got["qid"] == q]["vec_id"].astype(int)) & exact[q]) / 5 for q in range(5)]
    assert np.mean(recalls) >= 0.8, recalls


def test_train_ivf_centroids_distributed_kmeans(emb_dir):
    """Sampled distributed k-means: driver holds only the (k x dim)
    matrix; on the 5-cluster fixture the trained centroids must induce
    a high-purity assignment (each true cluster maps to one list)."""
    sf_dir, mat = emb_dir
    cents = knn.train_ivf_centroids(sf_dir, n_lists=8, n_iters=4, sample_fraction=1.0)
    assert cents.shape == (8, mat.shape[1])
    assert np.allclose(np.linalg.norm(cents, axis=1), 1.0, atol=1e-9)
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    assign = np.argmax(norm @ cents.T, axis=1)
    labels = np.arange(len(mat)) % 5  # fixture: vec i belongs to cluster i%5
    # purity: within each assigned list, one true cluster dominates
    purity_num = sum(
        np.bincount(labels[assign == c]).max()
        for c in np.unique(assign)
    )
    assert purity_num / len(mat) >= 0.9


def test_embedding_quantize_roundtrip(emb_dir):
    """int8 scalar quantization: dequantized vectors preserve cosine
    top-5 neighbors (recall >= 0.8) and per-component error <= scale/2."""
    sf_dir, mat = emb_dir
    got = knn.embedding_quantize(sf_dir).to_pandas().sort_values("vec_id")
    mn = got["qmin"].to_numpy()
    sc = got["qscale"].to_numpy()
    # recompute codes exactly as the op does, then dequantize
    mn_x = mat.min(axis=1)
    sc_x = np.maximum(mat.max(axis=1) - mn_x, 1e-12) / 255.0
    codes = np.floor((mat - mn_x[:, None]) / sc_x[:, None] + 0.5)
    assert np.allclose(mn, np.round(mn_x, 6))
    assert np.allclose(sc, np.round(sc_x, 6))
    assert got["code_sum"].to_numpy().tolist() == codes.sum(axis=1).astype(int).tolist()
    deq = knn.dequantize_codes(codes, mn_x, sc_x)
    assert np.abs(deq - mat).max() <= sc_x.max() / 2 + 1e-9
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    dnorm = deq / np.linalg.norm(deq, axis=1, keepdims=True)
    sims, dsims = norm @ norm.T, dnorm @ dnorm.T
    # quantization perturbs cosines by far less than the cluster gap
    assert np.abs(dsims - sims).max() < 0.01
    # so top-5 under dequantized sims stays inside the query's cluster
    # (exact top-5 are near-ties within a cluster; order among them is
    # not preserved by design, membership is)
    for q in range(5):
        d = dsims[q].copy()
        d[q] = -2
        approx = np.argsort(-d)[:5]
        assert all(int(a) % 5 == q % 5 for a in approx), (q, approx)


def test_dedup_clusters_transitive(ray_session, tmp_path):
    """A~B and B~C near-dups must land in ONE cluster labeled min(id),
    even when A~C alone would not pair (transitivity via label
    propagation)."""
    base = "the quick brown fox jumps over the lazy dog near the river bank today again"
    texts = [
        base,                                   # 0
        base + " extra",                        # 1 ~ 0
        base + " extra more",                   # 2 ~ 1
        "totally different content about ray data pipelines and arrow compute kernels",
        "totally different content about ray data pipelines and arrow compute kernels",  # 4 == 3
    ]
    _write_documents(tmp_path, texts)
    got = dedup.dedup_clusters(str(tmp_path)).to_pandas()
    cl = dict(zip(got["doc_id"], got["cluster_id"]))
    assert cl[0] == cl[1] == cl[2] == 0
    assert cl[3] == cl[4] == 3


def test_dedup_clusters_join_fallback_matches_broadcast(
    ray_session, tmp_path, monkeypatch
):
    """Above the pair gate label propagation runs as dataset joins (the
    dup-heavy 100 TB shape); both paths must reach the same fixpoint."""
    import pandas as pd

    base = "the quick brown fox jumps over the lazy dog near the river bank today again"
    texts = [
        base, base + " extra", base + " extra more",
        "totally different content about ray data pipelines and arrow compute kernels",
        "totally different content about ray data pipelines and arrow compute kernels",
    ]
    _write_documents(tmp_path, texts)

    def frame(ds):
        return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)

    bcast = frame(dedup.dedup_clusters(str(tmp_path)))
    monkeypatch.setattr(dedup, "_BCAST_PAIR_ROWS", -1)
    joined = frame(dedup.dedup_clusters(str(tmp_path)))
    pd.testing.assert_frame_equal(bcast, joined)


def test_knn_lsh_multiprobe_recall_dominates(emb_dir):
    """Hamming<=1 probing must find at least everything the exact-bucket
    variant finds, with recall of exact top-5 at least as high."""
    sf_dir, mat = emb_dir
    plain = knn.knn_lsh(sf_dir).to_pandas()
    multi = knn.knn_lsh_multiprobe(sf_dir).to_pandas()
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = norm @ norm.T
    for q in range(5):
        s = np.round(sims[q], 6)
        cand = np.arange(len(mat)); mask = cand != q
        exact = set(cand[mask][np.lexsort((cand[mask], -s[mask]))[:5]].tolist())
        p = set(plain[plain["qid"] == q]["vec_id"].astype(int))
        m = set(multi[multi["qid"] == q]["vec_id"].astype(int))
        assert len(m & exact) >= len(p & exact), q


def test_emb_lsh_recall_on_near_dups(emb_dir):
    """Banded LSH must recover the tight same-cluster pairs (cosine
    ~1.0): near-identical vectors agree on every hyperplane, so every
    band buckets them together regardless of rows-per-band."""
    sf_dir, mat = emb_dir
    # emb_lsh_pairs directly: the algorithm under test accepts any dim;
    # the dedup_embedding_lsh gate wrapper is pinned to the oracle's
    # 64-dim plane matrix and rejects this 16-dim fixture by design
    from search_engine_ray.io import read_parquet_clean

    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    got = dedup.emb_lsh_pairs(
        ds, 0.99, dedup._EMB_BANDS, dedup._EMB_ROWS, dim=mat.shape[1]
    ).to_pandas()
    pairs = {tuple(p) for p in got[["vec_a", "vec_b"]].itertuples(index=False)}
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = norm @ norm.T
    a, b = np.triu_indices(len(mat), k=1)
    truth = {(i, j) for i, j in zip(a[sims[a, b] >= 0.9999], b[sims[a, b] >= 0.9999])}
    assert truth, "fixture should contain tight near-dup pairs"
    assert truth <= pairs


def test_emb_lsh_candidates_scale_linearly(ray_session, tmp_path_factory):
    """The scale property the banding exists for: with rows-per-band
    auto-sized to ~log2(N), doubling a random corpus should ~double the
    candidate-pair count (a fixed 16-bucket scheme would quadruple it)."""
    import ray.data

    def count_candidates(n, seed=5):
        rng = np.random.default_rng(seed)
        mat = rng.standard_normal((n, 16)).astype(np.float32)
        tbl = pa.table(
            {
                "vec_id": pa.array(np.arange(n), pa.int64()),
                "embedding": pa.array([v.tolist() for v in mat], pa.list_(pa.float32())),
            }
        )
        pairs = dedup.emb_lsh_pairs(
            ray.data.from_arrow(tbl), threshold=-1.0,
            n_bands=4, n_rows=dedup._emb_rows_for(n), dim=16,
        )
        return pairs.count()

    c_small = count_candidates(256)
    c_big = count_candidates(512)
    assert c_big <= 3 * max(c_small, 1), (c_small, c_big)


def test_fast_content_hash_preserves_dedup_semantics(doc_dir):
    """config.FAST_CONTENT_HASH swaps md5-60 for vectorized xxhash64;
    hash VALUES change but dedup results (which never expose the hash)
    must not: same exact-dup groups, same verified near-dup pairs."""
    import search_engine_ray.config as config

    sf_dir, _texts = doc_dir

    def run():
        exact = dedup.dedup_exact(sf_dir).to_pandas()
        exact = set(map(tuple, exact[["keep_doc_id", "n_copies"]].itertuples(index=False)))
        near = dedup.dedup_minhash_lsh(sf_dir).to_pandas()
        near = set(map(tuple, near[["doc_a", "doc_b"]].itertuples(index=False)))
        return exact, near

    slow = run()
    config.FAST_CONTENT_HASH = True
    try:
        fast = run()
    finally:
        config.FAST_CONTENT_HASH = False
    assert slow == fast


def test_emb_matrix_empty_block_shapes():
    """A 0-row block must yield (0, dim) — a (0, 0) matrix crashes
    every downstream matmul/reduction (empty parquet fragments and
    post-filter blocks occur in practice)."""
    from search_engine_ray.ops.knn import _emb_matrix

    empty_list = pa.array([], pa.list_(pa.float32()))
    assert _emb_matrix(empty_list, 64).shape == (0, 64)
    empty_fsl = pa.array([], pa.list_(pa.float32(), 16))
    assert _emb_matrix(empty_fsl).shape == (0, 16)
    # and the downstream ops survive it
    q = np.ones((5, 64))
    v = _emb_matrix(empty_list, 64)
    assert (q @ v.T).shape == (5, 0)


def test_emb_lsh_null_embeddings_do_not_blank_pairs(ray_session, tmp_path):
    """Null embedding rows — including row 0 — must neither
    short-circuit dedup_embedding_lsh to zero pairs (real duplicates
    elsewhere would silently survive) nor break the zero-copy
    flatten/reshape decode; nulls drop on both twins and the valid
    near-dup pair is still found. All-null input returns the typed
    empty table."""
    rng = np.random.default_rng(5)
    base = rng.standard_normal(64)
    vecs = [
        None,
        base + rng.standard_normal(64) * 1e-3,
        None,
        base + rng.standard_normal(64) * 1e-3,
        rng.standard_normal(64) * 2,
    ]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(
                    [None if v is None else [float(x) for x in v] for v in vecs],
                    pa.list_(pa.float32()),
                ),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    got = dedup.dedup_embedding_lsh(str(tmp_path), threshold=0.99).to_pandas()
    assert (1, 3) in {tuple(p) for p in got[["vec_a", "vec_b"]].itertuples(index=False)}

    # the shared _read_emb drop applies to every vector op
    stats = knn.embedding_stats(str(tmp_path)).to_pandas()
    assert set(stats["vec_id"]) == {1, 3, 4}  # null rows absent, not zeroed

    allnull = tmp_path / "allnull"
    allnull.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 1], pa.int64()),
                "embedding": pa.array([None, None], pa.list_(pa.float32())),
            }
        ),
        str(allnull / "embeddings.parquet"),
    )
    empty = dedup.dedup_embedding_lsh(str(allnull))
    assert empty.count() == 0
    assert empty.schema().names == ["vec_a", "vec_b", "cosine"]


def test_fast_hash_env_reaches_ray_workers(tmp_path):
    """SERAY_FAST_HASH=1 must flip the content hash INSIDE Ray workers:
    the batch UDFs pickle by module reference, so each worker re-imports
    config and re-reads the env it inherited at cluster launch — a
    driver-side `config.FAST_CONTENT_HASH = True` does NOT travel. The
    production fast path only counts if it engages distributed."""
    import os
    import subprocess
    import sys

    script = r"""
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
import pyarrow as pa
import search_engine_ray.config as config
from search_engine_ray.ops.dedup import hash_content_batch
assert config.FAST_CONTENT_HASH, "env did not reach the driver import"
t = pa.table({"doc_id": pa.array([0], pa.int64()),
              "text": pa.array(["hello world"], pa.string())})
local = int(hash_content_batch(t)["h"][0].as_py())
remote = int(ray.data.from_arrow(t).map_batches(
    hash_content_batch, batch_format="pyarrow").to_pandas()["h"][0])
config.FAST_CONTENT_HASH = False
md5 = int(hash_content_batch(t)["h"][0].as_py())
print("OK" if (remote == local and remote != md5) else "MISMATCH", local, remote, md5)
ray.shutdown()
"""
    env = dict(os.environ)
    env["SERAY_FAST_HASH"] = "1"
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.strip().startswith("OK"), (out.stdout, out.stderr[-1000:])


def test_knn_pq_recall_and_compression(emb_dir):
    """PQ-ANN: asymmetric-distance scan + exact rerank recalls the
    brute-force top-5 on the clustered fixture; reported sims are true
    cosines; pq_encode emits the 1-byte-per-subspace compressed codes."""
    sf_dir, mat = emb_dir
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = norm @ norm.T
    exact = {}
    for q in range(5):
        s = np.round(sims[q], 6)
        cand = np.arange(len(mat))
        mask = cand != q
        order = np.lexsort((cand[mask], -s[mask]))[:5]
        exact[q] = set(cand[mask][order].tolist())
    got = knn.knn_pq(sf_dir).to_pandas()
    for _, r in got.iterrows():
        assert abs(r["sim"] - round(sims[int(r["qid"]), int(r["vec_id"])], 6)) < 1e-6
    recalls = [len(set(got[got["qid"] == q]["vec_id"].astype(int)) & exact[q]) / 5 for q in range(5)]
    assert np.mean(recalls) >= 0.8, recalls

    books = knn.train_pq_codebooks(sf_dir)
    ds = knn._read_emb(sf_dir)
    codes = knn.pq_encode(ds, books).to_pandas()
    assert len(codes) == len(mat)
    m = books.shape[0]
    assert all(len(c) == m for c in codes["codes"])
    assert all(0 <= int(x) < books.shape[1] for c in codes["codes"] for x in c)


def test_knn_hnsw_recall_on_clusters(emb_dir):
    """Graph ANN (sharded NSW beam search): recalls the brute-force
    top-5 on the clustered fixture; reported sims are exact cosines."""
    sf_dir, mat = emb_dir
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = norm @ norm.T
    exact = {}
    for q in range(5):
        s = np.round(sims[q], 6)
        cand = np.arange(len(mat))
        mask = cand != q
        order = np.lexsort((cand[mask], -s[mask]))[:5]
        exact[q] = set(cand[mask][order].tolist())
    got = knn.knn_hnsw(sf_dir).to_pandas()
    for _, r in got.iterrows():
        assert abs(r["sim"] - round(sims[int(r["qid"]), int(r["vec_id"])], 6)) < 1e-6
        assert int(r["vec_id"]) != int(r["qid"])  # self dropped
    recalls = [len(set(got[got["qid"] == q]["vec_id"].astype(int)) & exact[q]) / 5
               for q in range(5)]
    assert np.mean(recalls) >= 0.8, recalls


def test_nsw_graph_search_exact_on_line():
    """Deterministic unit check of the graph kernel itself: on points
    along a line, beam search from a full build returns the true
    nearest neighbors with exact sims."""
    rng = np.random.default_rng(3)
    base = rng.standard_normal(8)
    base /= np.linalg.norm(base)
    other = rng.standard_normal(8)
    other -= (other @ base) * base
    other /= np.linalg.norm(other)
    # unit vectors fanning from base toward other: angle i*5 degrees
    angles = np.deg2rad(np.arange(20) * 5)
    v = np.outer(np.cos(angles), base) + np.outer(np.sin(angles), other)
    nbr = knn._nsw_build(v, m=4, ef=16)
    idx, s = knn._nsw_search(v, nbr, v[0], ef=16, n_active=len(v), k=3)
    assert idx.tolist() == [0, 1, 2]
    assert np.allclose(s, np.cos(angles[:3]))


def test_minhash_boilerplate_guard_keeps_true_pairs(ray_session, tmp_path_factory):
    """Signature-side df-cap (the minhash analog of the ngram path's
    _DF_CAP): a corpus where every doc shares a boilerplate sentence
    (shingle df >> _DF_CAP, so the hot-set filter ENGAGES) but pairwise
    Jaccard stays far below threshold must yield exactly the one true
    near-dup pair — the guard changes candidate volume, never the
    verified output."""
    d = tmp_path_factory.mktemp("boiler_docs")
    boiler = "please review the attached weekly report summary carefully"
    texts = [
        boiler + " " + " ".join(f"u{i}w{j}" for j in range(15))
        for i in range(200)
    ]
    tail = " ".join(f"dupw{j}" for j in range(15))
    texts.append(boiler + " " + tail + " alpha")   # doc 200
    texts.append(boiler + " " + tail + " beta")    # doc 201: near-dup of 200
    _write_documents(d, texts)
    # the boilerplate trigrams really are hot (df = 202 > _DF_CAP)
    assert len(texts) > dedup._DF_CAP
    got = dedup.dedup_minhash_lsh(str(d), jaccard_threshold=0.5).to_pandas()
    pairs = {(int(a), int(b)) for a, b in zip(got["doc_a"], got["doc_b"])}
    assert pairs == {(200, 201)}
    j = float(got["jaccard"].iloc[0])
    assert abs(j - _exact_jaccard(texts[200], texts[201])) < 1e-6


def test_bands_from_docs_hot_filter_drops_boilerplate_only_docs(ray_session):
    """Mechanism unit check: a doc whose EVERY shingle is in the hot
    set emits no band rows (nothing distinctive to match on), while an
    unfiltered call still bands it."""
    import ray

    t = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array(["alpha beta gamma delta epsilon"], pa.string()),
        }
    )
    all_sh = np.sort(dedup._shingle_batch(t, hashed=True)["sh"].to_numpy())
    assert len(all_sh) > 0
    unfiltered = dedup._bands_from_docs(t)
    assert unfiltered.num_rows > 0
    filtered = dedup._bands_from_docs(t, hot_ref=ray.put(all_sh))
    assert filtered.num_rows == 0


def test_perm_hash_full_range_multiplier_is_unbiased():
    """Regression for the piecewise-linear permutation defect: with
    a < 2^29 multipliers, (a*x+b) mod (2^61-1) wraps at most once, so
    every perm's minimum lands on a doc's smallest shingle values and
    unrelated docs sharing one small shingle agree on ~half the perms
    (measured at 2.4M docs: 12.8M LSH candidates, 10 real). The fixed
    family must (1) match exact big-int modular math, (2) stay fully
    reduced below the modulus, and (3) give E[min-match] ~ jaccard for
    a low-jaccard pair instead of ~0.5."""
    M = (1 << 61) - 1
    rng = np.random.default_rng(11)
    x = rng.integers(0, 1 << 32, size=50_000, dtype=np.uint64)
    for p in (0, 31, 63):
        got = dedup._perm_hash(p, x)
        assert int(got.max()) < M
        a, b = int(dedup._PERM_A[p]), int(dedup._PERM_B[p])
        want = np.array([(a * int(v) + b) % M for v in x[:500]], dtype=np.uint64)
        assert (got[:500] == want).all()
        assert int(dedup._PERM_A[p]) >= (1 << 32)  # full-range multiplier
    # adversarial low-j pair: shared smallest value, 1/20 true jaccard
    shared = np.array([3], dtype=np.uint64)  # tiny shingle value
    a_set = np.concatenate([shared, rng.integers(1 << 20, 1 << 32, 10, dtype=np.uint64)])
    b_set = np.concatenate([shared, rng.integers(1 << 20, 1 << 32, 10, dtype=np.uint64)])
    j = 1 / 21
    matches = sum(
        int(dedup._perm_hash(p, a_set).min() == dedup._perm_hash(p, b_set).min())
        for p in range(dedup._N_PERM)
    )
    # E[matches] = 64*j ~ 3; the defective family read ~30+ here
    assert matches <= 16, matches


def test_minhash_size_gate_drops_only_impossible_pairs(ray_session, tmp_path):
    """The size-ratio pre-filter (j <= min/max) must not change the
    verified output: corpus with a true near-dup pair of similar sizes
    plus a shared-shingle pair of very different sizes (which can never
    reach the threshold and is dropped before verify)."""
    d = tmp_path
    base = " ".join(f"sz{i}" for i in range(20))
    texts = [
        base + " tail one",
        base + " tail two",                       # near-dup of 0
        "sz0 sz1 sz2",                            # shares shingles, tiny
        base + " " + " ".join(f"q{i}" for i in range(60)),  # shares, huge
    ]
    _write_documents(d, texts)
    got = dedup.dedup_minhash_lsh(str(d), jaccard_threshold=0.5).to_pandas()
    pairs = {(int(a), int(b)) for a, b in zip(got["doc_a"], got["doc_b"])}
    assert pairs == {(0, 1)}
    j = float(got["jaccard"].iloc[0])
    assert abs(j - _exact_jaccard(texts[0], texts[1])) < 1e-6
