"""BM25 scoring — THE shared scoring module.

Used by both the single-process oracle and the distributed query path so
that "rank-identical to the reference" is operationally "identical to
this module" (SURVEY.md §7.0; the reference's tf-idf formulas at
`/root/reference/src/cis5550/jobs_archive/Ranker.java:146-177` and
`/root/reference/src/cis5550/jobs/Search.java:100` are superseded by
BM25 per the north rule).

All math in float64; per-doc scores are summed over query terms in a
FIXED term order (query analyzer output order) so parallel and serial
evaluation agree bit-for-bit.
"""

from __future__ import annotations

import numpy as np

from ..config import BM25_K1, BM25_B


def bm25_idf(N: int, df: np.ndarray | float) -> np.ndarray | float:
    """idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1) — non-negative."""
    return np.log((N - np.asarray(df, dtype=np.float64) + 0.5) / (np.asarray(df, dtype=np.float64) + 0.5) + 1.0)


def bm25_tf_component(
    tf: np.ndarray,
    doclen: np.ndarray,
    avgdl: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> np.ndarray:
    """tf*(k1+1) / (tf + k1*(1 - b + b*doclen/avgdl))."""
    tf = np.asarray(tf, dtype=np.float64)
    doclen = np.asarray(doclen, dtype=np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * doclen / avgdl))


def bm25_term_scores(
    tf: np.ndarray,
    doclen: np.ndarray,
    N: int,
    df: int,
    avgdl: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> np.ndarray:
    return float(bm25_idf(N, df)) * bm25_tf_component(tf, doclen, avgdl, k1, b)


def bm25_upper_bound(
    max_tf: int, min_doclen: int, N: int, df: int, avgdl: float,
    k1: float = BM25_K1, b: float = BM25_B,
) -> float:
    """Block-max upper bound on any term score within a posting segment.

    The tf-component is increasing in tf and decreasing in doclen, so
    (max_tf, min_doclen) of a segment bounds every posting in it; used
    by the WAND-style pruning in the query engine.
    """
    return float(
        bm25_idf(N, df) * bm25_tf_component(np.float64(max_tf), np.float64(min_doclen), avgdl, k1, b)
    )


def topk_indices(scores: np.ndarray, doc_ids: np.ndarray, k: int) -> np.ndarray:
    """Indices of the top-k by (score desc, doc_id asc) — the normative
    deterministic tie-break (SURVEY.md §2.3; replaces the reference's
    nondeterministic HashSet grouping, Ranker.java:209-219).

    O(n + k log k): argpartition selects the score threshold, the
    boundary tie is resolved by doc_id asc, and only the k winners are
    sorted — bit-identical to a full lexsort."""
    n = len(scores)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    k = min(k, n)
    if k * 4 >= n:
        return np.lexsort((doc_ids, -scores))[:k]
    part = np.argpartition(-scores, k - 1)[:k]
    thresh = scores[part].min()
    above = np.flatnonzero(scores > thresh)
    ties = np.flatnonzero(scores == thresh)
    need = k - above.size
    ties_sel = ties[np.argsort(doc_ids[ties], kind="stable")[:need]]
    sel = np.concatenate([above, ties_sel])
    return sel[np.lexsort((doc_ids[sel], -scores[sel]))]
