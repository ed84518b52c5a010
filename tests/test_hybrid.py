"""Hybrid BM25 + vector retrieval fused by reciprocal-rank fusion.
Value-level parity runs in the oracle gate (hybrid_rrf); this pins the
fusion's structural properties."""

import numpy as np

from search_engine_ray.ops.search_ops import (
    _BM25_QUERIES,
    _HY_K,
    _RRF_K,
    hybrid_rrf,
)


def test_hybrid_rrf_structure(ray_session):
    t = hybrid_rrf("/root/testdata/sf0.001").to_pandas()
    assert set(t.columns) == {"query_id", "doc_id", "rrf"}
    assert set(t["query_id"]) == {qid for qid, _ in _BM25_QUERIES}
    for qid, g in t.groupby("query_id"):
        assert len(g) <= _HY_K
        # per-query order: rrf desc, doc asc; no duplicate docs
        r = g["rrf"].to_numpy()
        assert (np.diff(r) <= 1e-12).all()
        assert g["doc_id"].is_unique
        # a doc in both systems' top lists beats the single-system
        # ceiling 1/(k+1); every score is in (0, 2/(k+1)]
        assert (r > 0).all() and (r <= 2 / (_RRF_K + 1) + 1e-9).all()
        # rank-1 fusion: the top fused doc must score at least the
        # best single-system contribution of rank 1
        assert r[0] >= 1 / (_RRF_K + 1) - 1e-9


def test_http_hybrid_endpoint(ray_session, tmp_path_factory):
    """POST /hybrid fuses the text tier's BM25 ranks with the ANN
    tier's cosine ranks by RRF, bit-identical to recomputing the
    fusion from the two tiers directly; 501 without an ANN index."""
    import json as json_
    import urllib.error
    import urllib.request

    import pyarrow as pa
    import pyarrow.parquet as pq_

    from search_engine_ray.config import IndexConfig, RRF_K
    from search_engine_ray.corpus import write_transcripts
    from search_engine_ray.pipelines.ann_index import (
        AnnSearcher, build_ann_index,
    )
    from search_engine_ray.pipelines.build_index import build_index
    from search_engine_ray.pipelines.search import DocShardedSearcher
    from search_engine_ray.serve import SearchServer

    root = tmp_path_factory.mktemp("hyserve")
    src = str(root / "tr")
    write_transcripts(src, n_convs=40, turns_per_conv=3, seed=5, n_files=2)
    idx = str(root / "idx")
    build_index(src, idx, IndexConfig(doc_bucket_size=512), n_partitions=1)

    rng = np.random.default_rng(3)
    mat = rng.standard_normal((120, 8)).astype(np.float32)
    pq_.write_table(
        pa.table({
            "vec_id": pa.array(range(120), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in mat], pa.list_(pa.float32())
            ),
        }),
        str(root / "embeddings.parquet"),
    )
    ann_dir = str(root / "ann")
    build_ann_index(str(root), ann_dir)
    ann = AnnSearcher(ann_dir)
    searcher = DocShardedSearcher(idx, n_shards=2)
    srv = SearchServer(idx, searcher, spellcheck=False, ann=ann).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        vec = mat[0].astype(np.float64).tolist()
        body = json_.dumps(
            {"query": "running meetings", "vector": vec, "k": 10,
             "k_sys": 20}
        ).encode()
        req = urllib.request.Request(
            f"{base}/hybrid", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as resp:
            payload = json_.loads(resp.read())
        # recompute the fusion from the tiers directly
        t_ids, _ = searcher.search("running meetings", k=20, mode="OR")
        _q, v_ids, _s = ann.search_matrix(
            np.zeros(1, np.int64),
            np.asarray(vec, np.float64)[None, :], k=20, exclude_self=False,
        )
        fused = {}
        for ranked in (t_ids.tolist(), v_ids.tolist()):
            for rank, d in enumerate(ranked, 1):
                fused[d] = fused.get(d, 0.0) + 1.0 / (RRF_K + rank)
        docs = np.fromiter(fused, np.int64, count=len(fused))
        vals = np.round(
            np.fromiter((fused[int(d)] for d in docs), np.float64,
                        count=len(docs)), 6)
        order = np.lexsort((docs, -vals))[:10]
        assert [r["doc_id"] for r in payload["results"]] == docs[order].tolist()
        assert np.allclose(
            [r["rrf"] for r in payload["results"]], vals[order]
        )
        assert all("snippet" in r for r in payload["results"])

        # malformed requests 400
        for bad in ({"query": "x"}, {"vector": vec},
                    {"query": "x", "vector": vec, "k": 0},
                    {"query": "", "vector": vec}):
            req = urllib.request.Request(
                f"{base}/hybrid", data=json_.dumps(bad).encode(),
                headers={"Content-Type": "application/json"},
            )
            try:
                urllib.request.urlopen(req)
                raise AssertionError(f"{bad} should 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400, (bad, e.code)
    finally:
        srv.stop()
        searcher.close()

    # without an ANN index the route answers 501
    srv2 = SearchServer(idx, DocShardedSearcher(idx, n_shards=1),
                        spellcheck=False).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv2.port}/hybrid",
            data=json_.dumps({"query": "x", "vector": [1.0]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req)
            raise AssertionError("should 501")
        except urllib.error.HTTPError as e:
            assert e.code == 501
    finally:
        srv2.stop()


def test_http_hybrid_get_by_vec_id(ray_session, tmp_path_factory):
    """GET /hybrid?query=&vec_id= fuses text ranks with the stored
    seed vector's neighbors (seed excluded from the vector list)."""
    import json as json_
    import urllib.error
    import urllib.parse
    import urllib.request

    import pyarrow as pa
    import pyarrow.parquet as pq_

    from search_engine_ray.config import IndexConfig, RRF_K
    from search_engine_ray.corpus import write_transcripts
    from search_engine_ray.pipelines.ann_index import (
        AnnSearcher, build_ann_index,
    )
    from search_engine_ray.pipelines.build_index import build_index
    from search_engine_ray.pipelines.search import DocShardedSearcher
    from search_engine_ray.serve import SearchServer

    root = tmp_path_factory.mktemp("hyget")
    src = str(root / "tr")
    write_transcripts(src, n_convs=30, turns_per_conv=3, seed=6, n_files=2)
    idx = str(root / "idx")
    build_index(src, idx, IndexConfig(doc_bucket_size=512), n_partitions=1)
    rng = np.random.default_rng(4)
    mat = rng.standard_normal((90, 8)).astype(np.float32)
    pq_.write_table(
        pa.table({
            "vec_id": pa.array(range(90), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in mat], pa.list_(pa.float32())
            ),
        }),
        str(root / "embeddings.parquet"),
    )
    ann_dir = str(root / "ann")
    build_ann_index(str(root), ann_dir)
    ann = AnnSearcher(ann_dir)
    searcher = DocShardedSearcher(idx, n_shards=2)
    srv = SearchServer(idx, searcher, spellcheck=False, ann=ann).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        q = urllib.parse.quote("running meetings")
        url = f"{base}/hybrid?query={q}&vec_id=3&k=10&k_sys=15&mode=OR"
        with urllib.request.urlopen(url) as resp:
            payload = json_.loads(resp.read())
        assert payload["vec_id"] == 3
        # recompute directly
        t_ids, _ = searcher.search("running meetings", k=15, mode="OR")
        ids, qmat = ann.get_vectors([3])
        _qq, v_ids, _s = ann.search_matrix(
            np.asarray([3], np.int64), qmat, k=15, exclude_self=True,
        )
        assert 3 not in v_ids.tolist()
        fused = {}
        for ranked in (t_ids.tolist(), v_ids.tolist()):
            for rank, d in enumerate(ranked, 1):
                fused[d] = fused.get(d, 0.0) + 1.0 / (RRF_K + rank)
        docs = np.fromiter(fused, np.int64, count=len(fused))
        vals = np.round(
            np.fromiter((fused[int(d)] for d in docs), np.float64,
                        count=len(docs)), 6)
        order = np.lexsort((docs, -vals))[:10]
        assert [r["doc_id"] for r in payload["results"]] == docs[order].tolist()

        # unknown vec_id -> 404; missing query -> 400
        try:
            urllib.request.urlopen(f"{base}/hybrid?query={q}&vec_id=99999")
            raise AssertionError("should 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
        try:
            urllib.request.urlopen(f"{base}/hybrid?vec_id=3")
            raise AssertionError("should 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.stop()
        searcher.close()
