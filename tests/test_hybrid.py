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
