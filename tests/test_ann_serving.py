"""Persistent ANN serving tier (pipelines/ann_index.py).

Pins VERDICT r4 item 1: build-once per-shard NSW graphs hosted by
long-lived actors must be BIT-IDENTICAL to the batch ``knn_hnsw``
map_groups path, the shard count must auto-size with the corpus, and
the build must resume (finished shards skipped, config changes force a
rebuild)."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_ray.ops import knn
from search_engine_ray.pipelines.ann_index import (
    AnnSearcher, build_ann_index, knn_hnsw_served, knn_hnsw_served_ivf,
    knn_hnsw_served_q8,
)


@pytest.fixture(scope="module")
def emb_sf(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("annsf")
    rng = np.random.default_rng(23)
    centers = rng.standard_normal((6, 16)) * 3
    vecs = [
        (centers[i % 6] + rng.standard_normal(16) * 0.01).astype(np.float32)
        for i in range(90)
    ]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(90), pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.list_(pa.float32())
                ),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    return str(d), np.stack(vecs).astype(np.float64)


def test_shards_auto_size_power_of_two():
    from search_engine_ray.ops.knn import hnsw_shards_for

    assert hnsw_shards_for(0) == 4
    assert hnsw_shards_for(60) == 4
    assert hnsw_shards_for(65_536) == 4
    assert hnsw_shards_for(65_537) == 4  # need=2 < floor
    assert hnsw_shards_for(5 * 65_536) == 8
    assert hnsw_shards_for(100 * 65_536) == 128
    assert hnsw_shards_for(1000, max_shard_rows=100) == 16  # need=10 -> 16


def test_served_bit_identical_to_map_groups(emb_sf, tmp_path):
    sf_dir, _mat = emb_sf
    idx = str(tmp_path / "ann")
    meta = build_ann_index(sf_dir, idx)
    assert meta["n_shards"] == 4  # floor at this size
    batch = (
        knn.knn_hnsw(sf_dir).to_pandas()
        .sort_values(["qid", "sim", "vec_id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    searcher = AnnSearcher(idx)
    try:
        served = (
            searcher.search_table(*knn._load_queries(sf_dir)).to_pandas()
            .sort_values(["qid", "sim", "vec_id"], ascending=[True, False, True])
            .reset_index(drop=True)
        )
    finally:
        searcher.close()
    # BIT identity: same rows, same float64 scores, same order
    assert len(served) == len(batch)
    assert (served["qid"].to_numpy() == batch["qid"].to_numpy()).all()
    assert (served["vec_id"].to_numpy() == batch["vec_id"].to_numpy()).all()
    assert (served["sim"].to_numpy() == batch["sim"].to_numpy()).all()


def test_build_resumes_and_rebuilds_on_config_change(emb_sf, tmp_path):
    sf_dir, _ = emb_sf
    idx = str(tmp_path / "ann")
    build_ann_index(sf_dir, idx)
    files = sorted(f for f in os.listdir(idx) if f.endswith(".npz"))
    assert files == [f"shard-{s}.npz" for s in range(4)]
    mtimes = {f: os.path.getmtime(os.path.join(idx, f)) for f in files}

    # delete one shard; re-run rebuilds ONLY that shard
    os.remove(os.path.join(idx, "shard-2.npz"))
    build_ann_index(sf_dir, idx)
    for f in files:
        if f == "shard-2.npz":
            assert os.path.exists(os.path.join(idx, f))
        else:
            assert os.path.getmtime(os.path.join(idx, f)) == mtimes[f]

    # changed build params: meta mismatch forces a full rebuild
    build_ann_index(sf_dir, idx, ef=16)
    with open(os.path.join(idx, "meta.json")) as f:
        assert json.load(f)["ef"] == 16


def test_empty_shards_and_sparse_ids(ray_session, tmp_path):
    """A shard with no vectors (sparse id space) still gets a file and
    a servable actor; results only come from populated shards."""
    d = tmp_path / "sparse"
    d.mkdir()
    rng = np.random.default_rng(5)
    ids = [0, 1, 2, 3, 4, 8, 16, 24]  # ids 5,6,7 mod 8 never occur
    vecs = rng.standard_normal((len(ids), 8)).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.list_(pa.float32())
                ),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    idx = str(tmp_path / "annsparse")
    build_ann_index(str(d), idx, n_shards=8)
    searcher = AnnSearcher(idx)
    try:
        q, v, s = searcher.search_matrix(
            np.array([0], np.int64), vecs[:1].astype(np.float64), k=3
        )
    finally:
        searcher.close()
    assert q.size == 3 and (v != 0).all()


def test_vec_shard_actor_restart_serves_identically(emb_sf, tmp_path):
    """VecShardActor declares max_restarts/max_task_retries and plain
    (index_dir, shard_id) constructor args so a crashed actor restarts
    from disk — kill one shard and the next query batch must come back
    bit-identical (the DocShardActor restart contract, extended to the
    vector tier)."""
    import ray as ray_

    sf_dir, _ = emb_sf
    idx = str(tmp_path / "annrestart")
    build_ann_index(sf_dir, idx)
    qids, qmat = knn._load_queries(sf_dir)
    searcher = AnnSearcher(idx)
    try:
        before = searcher.search_table(qids, qmat).to_pandas()
        ray_.kill(searcher.shards[0], no_restart=False)
        after = searcher.search_table(qids, qmat).to_pandas()
    finally:
        searcher.close()
    assert before.equals(after)


def test_knn_hnsw_served_gate_entry(emb_sf):
    sf_dir, _ = emb_sf
    t = knn_hnsw_served(sf_dir)
    assert t.num_rows == 5 * 5
    assert t.column_names == ["qid", "vec_id", "sim"]


def test_q8_store_sims_exact_and_recall(emb_sf, tmp_path):
    """store="q8": reported sims must be EXACT cosines of the returned
    (query, vec) pairs (the memmap rerank contract — quantization may
    cost recall, never corrupt a score), and recall vs the f64 tier
    must stay high on clustered data."""
    sf_dir, mat = emb_sf
    idx8 = str(tmp_path / "annq8")
    meta = build_ann_index(sf_dir, idx8, store="q8")
    assert meta["store"] == "q8"

    # RAM payload is codes, not floats: npz holds uint8 codes and no
    # "v"; exact vectors live in the .vec.npy sidecar
    z = np.load(os.path.join(idx8, "shard-0.npz"))
    assert "v" not in z.files and z["codes"].dtype == np.uint8
    assert os.path.exists(os.path.join(idx8, "shard-0.vec.npy"))

    qids, qmat = knn._load_queries(sf_dir)
    searcher = AnnSearcher(idx8)
    try:
        served = searcher.search_table(qids, qmat).to_pandas()
    finally:
        searcher.close()

    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    qunit = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    qpos = {int(q): i for i, q in enumerate(qids)}
    for r in served.itertuples():
        exact = float(unit[int(r.vec_id)] @ qunit[qpos[int(r.qid)]])
        assert abs(r.sim - round(exact, 6)) < 1e-12

    f64 = knn_hnsw_served(sf_dir).to_pandas()
    got = {(int(r.qid), int(r.vec_id)) for r in served.itertuples()}
    want = {(int(r.qid), int(r.vec_id)) for r in f64.itertuples()}
    assert len(got & want) / len(want) >= 0.9


def test_ivf_routing_probe_plan_and_recall(emb_sf, tmp_path):
    """routing="ivf": centroids persist beside the shards, each query's
    probe plan touches exactly n_probe shards, and probing 2 of 4
    shards keeps recall high on clustered data (neighbors share the
    query's centroid cell)."""
    sf_dir, _mat = emb_sf
    idx = str(tmp_path / "annivf")
    meta = build_ann_index(sf_dir, idx, routing="ivf")
    assert meta["routing"] == "ivf"
    cents = np.load(os.path.join(idx, "centroids.npy"))
    assert cents.shape[0] == meta["n_shards"]

    qids, qmat = knn._load_queries(sf_dir)
    qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    searcher = AnnSearcher(idx)
    try:
        plan = searcher.probe_sets(qnorm, n_probe=2)
        # every query probes exactly 2 distinct shards
        counts = np.zeros(len(qids), np.int64)
        for qsel in plan:
            counts[qsel] += 1
        assert (counts == 2).all()

        pruned = searcher.search_table(qids, qmat, n_probe=2).to_pandas()
        full = searcher.search_table(qids, qmat).to_pandas()
    finally:
        searcher.close()
    got = {(int(r.qid), int(r.vec_id)) for r in pruned.itertuples()}
    want = {(int(r.qid), int(r.vec_id)) for r in full.itertuples()}
    assert len(want) == 5 * 5
    assert len(got & want) / len(want) >= 0.9


def test_ivf_resume_requires_centroids(emb_sf, tmp_path):
    """Resume of an ivf index without its centroid file must rebuild
    everything: shard assignments are unknowable without it."""
    sf_dir, _ = emb_sf
    idx = str(tmp_path / "annivfr")
    build_ann_index(sf_dir, idx, routing="ivf")
    m0 = os.path.getmtime(os.path.join(idx, "shard-0.npz"))
    os.remove(os.path.join(idx, "centroids.npy"))
    build_ann_index(sf_dir, idx, routing="ivf")
    assert os.path.exists(os.path.join(idx, "centroids.npy"))
    assert os.path.getmtime(os.path.join(idx, "shard-0.npz")) > m0

    t = knn_hnsw_served_ivf(sf_dir)
    assert t.column_names == ["qid", "vec_id", "sim"]
    assert t.num_rows >= int(5 * 5 * 0.9)  # probe-width recall trade


def test_ivf_hot_cell_splits_bounded(ray_session, tmp_path):
    """Cluster skew: one cluster holds ~87% of the corpus, so its cell
    must split into vec_id-hashed sub-shards. Every shard stays within
    max_shard_rows (the hash tier's bound, kept under ivf routing), a
    query probing the hot cell fans out to ALL its sub-shards (the
    candidate set never narrows), and recall vs brute force holds."""
    d = tmp_path / "skew"
    d.mkdir()
    rng = np.random.default_rng(41)
    dim, n_hot, n_cold = 16, 700, 100
    centers = rng.standard_normal((5, dim)) * 4
    hot = centers[0] + rng.standard_normal((n_hot, dim)) * 0.5
    cold = (
        centers[1 + np.arange(n_cold) % 4]
        + rng.standard_normal((n_cold, dim)) * 0.05
    )
    mat = np.vstack([hot, cold]).astype(np.float32)
    # planted EXACT duplicates: identical vectors always share a cell,
    # but their differing vec_ids may hash to DIFFERENT sub-shards of
    # it — the probe must still find them (cell = union of sub-shards)
    twins = [(0, 351), (1, 353), (2, 355), (3, 407), (4, 409), (5, 411)]
    for a, b in twins:
        mat[b] = mat[a]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(mat)), pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in mat], pa.list_(pa.float32())
                ),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    idx = str(tmp_path / "annskew")
    cap = 128
    meta = build_ann_index(str(d), idx, n_shards=4, routing="ivf",
                           max_shard_rows=cap)
    nsub = np.asarray(meta["cell_sub"])
    assert nsub.max() >= 2, "the hot cell must have split"
    assert meta["n_shards"] == int(nsub.sum()) > meta["n_cells"] == 4
    for s in range(meta["n_shards"]):  # the bound held for EVERY shard
        z = np.load(os.path.join(idx, f"shard-{s}.npz"))
        assert len(z["vids"]) <= cap

    searcher = AnnSearcher(idx)
    try:
        # a hot-cluster query must probe every sub-shard of its cell
        q = (hot[:1] / np.linalg.norm(hot[:1])).astype(np.float64)
        plan = searcher.probe_sets(q, n_probe=1)
        probed = [s for s, qsel in enumerate(plan) if qsel.size]
        cents = np.load(os.path.join(idx, "centroids.npy"))
        hot_cell = int(np.argmax(q[0] @ cents.T))
        want = np.flatnonzero(searcher.cell_of_shard == hot_cell)
        assert sorted(probed) == sorted(want.tolist())
        assert len(probed) == nsub[hot_cell]

        qids = np.array([a for a, _ in twins], np.int64)
        res = searcher.search_table(
            qids, mat[qids].astype(np.float64), k=5, n_probe=1
        ).to_pandas()
    finally:
        searcher.close()
    # every planted duplicate is recovered at sim 1.0 through the probe
    got = {(int(r.qid), int(r.vec_id)) for r in res.itertuples()}
    sims = {(int(r.qid), int(r.vec_id)): float(r.sim) for r in res.itertuples()}
    for a, b in twins:
        assert (a, b) in got, f"duplicate {b} of query {a} not recovered"
        assert sims[(a, b)] == 1.0
    # the union property was actually exercised: at least one twin pair
    # landed in different sub-shards of the same (split) cell
    from search_engine_ray.pipelines.ann_index import _sub_shard

    unit = mat.astype(np.float64)
    unit /= np.linalg.norm(unit, axis=1, keepdims=True)
    cell = np.argmax(unit @ cents.T, axis=1)
    base = np.concatenate(([0], np.cumsum(nsub)))[:-1]
    vids = np.arange(len(mat), dtype=np.int64)
    shard_of = base[cell] + _sub_shard(vids, nsub[cell])
    assert any(shard_of[a] != shard_of[b] for a, b in twins)


def test_q8_resume_requires_sidecar(emb_sf, tmp_path):
    """Resume treats a q8 shard as done only when BOTH the npz and the
    vec sidecar exist; a missing sidecar rebuilds that shard."""
    sf_dir, _ = emb_sf
    idx8 = str(tmp_path / "annq8r")
    build_ann_index(sf_dir, idx8, store="q8")
    os.remove(os.path.join(idx8, "shard-1.vec.npy"))
    build_ann_index(sf_dir, idx8, store="q8")
    assert os.path.exists(os.path.join(idx8, "shard-1.vec.npy"))

    t = knn_hnsw_served_q8(sf_dir)
    assert t.num_rows == 5 * 5
    assert t.column_names == ["qid", "vec_id", "sim"]


def _write_emb(path, ids, mat):
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in np.asarray(mat, np.float32)],
                    pa.list_(pa.float32()),
                ),
            }
        ),
        os.path.join(path, "embeddings.parquet"),
    )


@pytest.mark.parametrize("store", ["f64", "q8"])
def test_extend_ann_index_bit_identical_to_full_rebuild(
    ray_session, tmp_path, store
):
    """extend_ann_index rebuilds only the touched shards, and because
    graph inserts run in sorted-vec_id order, the extended index is
    BIT-IDENTICAL (files and served results) to a full build over the
    combined corpus at the same layout."""
    from search_engine_ray.pipelines.ann_index import extend_ann_index

    rng = np.random.default_rng(77)
    dim = 12
    centers = rng.standard_normal((4, dim)) * 3
    old_ids = list(range(80))
    old = centers[np.arange(80) % 4] + rng.standard_normal((80, dim)) * 0.1
    new_ids = list(range(100, 112))  # sparse: only some shards touched
    new = centers[np.arange(12) % 4] + rng.standard_normal((12, dim)) * 0.1

    d_old = tmp_path / "old"; d_old.mkdir()
    d_new = tmp_path / "new"; d_new.mkdir()
    d_all = tmp_path / "all"; d_all.mkdir()
    _write_emb(str(d_old), old_ids, old)
    _write_emb(str(d_new), new_ids, new)
    _write_emb(str(d_all), old_ids + new_ids, np.vstack([old, new]))

    idx_ext = str(tmp_path / "ext")
    build_ann_index(str(d_old), idx_ext, n_shards=4, store=store)
    before = {
        s: os.path.getmtime(os.path.join(idx_ext, f"shard-{s}.npz"))
        for s in range(4)
    }
    res = extend_ann_index(idx_ext, str(d_new))
    assert res["new_rows"] == 12
    touched = set(res["touched_shards"])
    assert touched  # something was extended
    for s in range(4):  # untouched shards were not rewritten
        mt = os.path.getmtime(os.path.join(idx_ext, f"shard-{s}.npz"))
        assert (mt > before[s]) == (s in touched)

    idx_full = str(tmp_path / "full")
    build_ann_index(str(d_all), idx_full, n_shards=4, store=store)
    for s in range(4):  # per-shard file payloads are bit-identical
        ze = np.load(os.path.join(idx_ext, f"shard-{s}.npz"))
        zf = np.load(os.path.join(idx_full, f"shard-{s}.npz"))
        assert sorted(ze.files) == sorted(zf.files)
        for key in ze.files:
            np.testing.assert_array_equal(ze[key], zf[key])

    qids = np.array([0, 1, 100], np.int64)
    qmat = np.vstack([old[:2], new[:1]]).astype(np.float64)
    se, sf = AnnSearcher(idx_ext), AnnSearcher(idx_full)
    try:
        te = se.search_table(qids, qmat).to_pandas()
        tf = sf.search_table(qids, qmat).to_pandas()
    finally:
        se.close(); sf.close()
    assert te.equals(tf)
    # extended vectors are served (qid 100 self-excludes, but other
    # delta ids rank for it and for the old queries)
    assert (te["vec_id"] >= 100).any()


def test_extend_ann_index_rejects_collisions_and_refresh(
    ray_session, tmp_path
):
    from search_engine_ray.pipelines.ann_index import extend_ann_index

    rng = np.random.default_rng(3)
    d0 = tmp_path / "s0"; d0.mkdir()
    d1 = tmp_path / "s1"; d1.mkdir()
    _write_emb(str(d0), list(range(40)), rng.standard_normal((40, 8)))
    _write_emb(str(d1), [8, 200], rng.standard_normal((2, 8)))  # 8 collides
    idx = str(tmp_path / "idx")
    build_ann_index(str(d0), idx, n_shards=4)
    with pytest.raises(Exception, match="collide"):
        extend_ann_index(idx, str(d1))

    # refresh(): a live searcher picks up an extension blue-green
    d2 = tmp_path / "s2"; d2.mkdir()
    newv = rng.standard_normal((1, 8))
    _write_emb(str(d2), [300], newv)
    searcher = AnnSearcher(idx)
    try:
        extend_ann_index(idx, str(d2))
        searcher.refresh()
        t = searcher.search_table(
            np.array([300], np.int64), newv.astype(np.float64),
            k=3, exclude_self=False,
        ).to_pandas()
    finally:
        searcher.close()
    assert int(t.iloc[0]["vec_id"]) == 300 and t.iloc[0]["sim"] == 1.0


def test_extend_ann_index_interleaved_ids_still_identical(
    ray_session, tmp_path
):
    """A delta whose vec_ids sort BELOW existing ones can't warm-start
    the insert loop — that shard re-sorts and rebuilds — but the result
    must still be bit-identical to a full build over the union."""
    from search_engine_ray.pipelines.ann_index import extend_ann_index

    rng = np.random.default_rng(15)
    old_ids = [i for i in range(60) if i != 20]
    old = rng.standard_normal((len(old_ids), 8))
    new_ids = [20, 300]  # 20 interleaves below 59; 300 appends
    new = rng.standard_normal((2, 8))

    d_old = tmp_path / "o"; d_old.mkdir()
    d_new = tmp_path / "n"; d_new.mkdir()
    d_all = tmp_path / "a"; d_all.mkdir()
    _write_emb(str(d_old), old_ids, old)
    _write_emb(str(d_new), new_ids, new)
    _write_emb(str(d_all), old_ids + new_ids, np.vstack([old, new]))

    idx_ext = str(tmp_path / "e")
    build_ann_index(str(d_old), idx_ext, n_shards=4)
    extend_ann_index(idx_ext, str(d_new))
    idx_full = str(tmp_path / "f")
    build_ann_index(str(d_all), idx_full, n_shards=4)
    for s in range(4):
        ze = np.load(os.path.join(idx_ext, f"shard-{s}.npz"))
        zf = np.load(os.path.join(idx_full, f"shard-{s}.npz"))
        for key in ze.files:
            np.testing.assert_array_equal(ze[key], zf[key])
