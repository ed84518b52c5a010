"""Single-process oracle: tokenize -> postings -> BM25 top-k, no Ray.

An independent, row-at-a-time implementation of the normative semantics
(SURVEY.md §5, §7.0) used as the golden reference for the distributed
engine. Tokenization here is deliberately written as a plain per-doc
Python loop over ``re.split`` output — a different code path from the
vectorized Arrow tokenizer — so the two implementations cross-check
each other. Scoring reuses the shared ``functions.scoring`` module (the
single source of truth for BM25 math).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from .config import IndexConfig, SKIP_WORDS, STOPWORD_PENALTY
from .functions.stemmer import porter_stem
from .functions import scoring
from .functions.analysis import analyze_query

_SPLIT_RE = re.compile(r"[^0-9a-z]+")


def oracle_tokenize(text: str, cfg: IndexConfig | None = None):
    """Per-doc tokenization.

    Returns ``(terms, doclen)`` where ``terms`` is a dict
    ``term -> (tf, [positions])`` covering raw terms and (when stemming)
    stemmed terms that differ from their raw form, and ``doclen`` is the
    count of non-empty tokens.
    """
    cfg = cfg or IndexConfig()
    text = (text or "")[: cfg.max_text_len]
    if cfg.strip_html:
        # truncate-then-strip, matching split_tokens_arrow's order —
        # without this the oracle indexes tag/attribute tokens and a
        # strip_html=True cross-check reports false mismatches
        from .functions.analysis import strip_html

        text = strip_html(text)
    text = text.lower()
    terms: dict[str, list] = {}
    pos = 0
    for tok in _SPLIT_RE.split(text):
        if not tok:
            continue
        pos += 1
        if len(tok) > cfg.max_word_len or tok in SKIP_WORDS:
            continue
        entry = terms.setdefault(tok, [0, []])
        entry[0] += 1
        entry[1].append(pos)
        if cfg.stemming:
            stem = porter_stem(tok)
            if stem != tok:
                sentry = terms.setdefault(stem, [0, []])
                sentry[0] += 1
                sentry[1].append(pos)
    return {t: (tf, p) for t, (tf, p) in terms.items()}, pos


@dataclass
class OracleIndex:
    """In-memory inverted index over a transcript DataFrame."""

    postings: dict[str, list]          # term -> [(doc_id, tf, positions)] doc_id asc
    doc_stats: pd.DataFrame            # doc_id, conv_id, turn_idx, doclen
    N: int
    avgdl: float
    cfg: IndexConfig = field(default_factory=IndexConfig)

    def df(self, term: str) -> int:
        return len(self.postings.get(term, ()))


def build_oracle_index(transcripts: pd.DataFrame, cfg: IndexConfig | None = None) -> OracleIndex:
    """Build the golden index.

    ``transcripts`` must have columns conv_id, turn_idx, text (role/tool
    optional). doc_id = rank under ascending (conv_id, turn_idx) sort —
    the normative dense id assignment (SURVEY.md §7.0).
    """
    cfg = cfg or IndexConfig()
    df = transcripts.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    postings: dict[str, list] = {}
    doclens = np.zeros(len(df), dtype=np.int64)
    for doc_id, text in enumerate(df["text"].tolist()):
        terms, doclen = oracle_tokenize(text, cfg)
        doclens[doc_id] = doclen
        for term, (tf, pos) in terms.items():
            postings.setdefault(term, []).append((doc_id, tf, pos))
    doc_stats = pd.DataFrame(
        {
            "doc_id": np.arange(len(df), dtype=np.int64),
            "conv_id": df["conv_id"].to_numpy(),
            "turn_idx": df["turn_idx"].to_numpy(),
            "doclen": doclens,
        }
    )
    N = len(df)
    avgdl = float(doclens.mean()) if N else 0.0
    return OracleIndex(postings=postings, doc_stats=doc_stats, N=N, avgdl=avgdl, cfg=cfg)


def oracle_search(
    index: OracleIndex,
    query: str,
    k: int = 200,
    mode: str = "AND",
) -> pd.DataFrame:
    """BM25 top-k. mode="AND": conjunctive (posting intersection, the
    north-star default); mode="OR": disjunctive accumulation (the
    reference Search/Ranker behavior). Tie-break (score desc, doc_id
    asc). Returns columns (rank, doc_id, score)."""
    terms, stopword_only = analyze_query(query, index.cfg)
    doclens = index.doc_stats["doclen"].to_numpy()
    scores: dict[int, float] = {}
    candidate: set[int] | None = None
    per_term = []
    for t in terms:
        plist = index.postings.get(t, [])
        per_term.append((t, plist))
        docs = {d for d, _, _ in plist}
        if mode == "AND":
            candidate = docs if candidate is None else (candidate & docs)
    for t, plist in per_term:
        df_t = len(plist)
        if df_t == 0:
            continue
        idf = float(scoring.bm25_idf(index.N, df_t))
        for doc_id, tf, _pos in plist:
            if mode == "AND" and (candidate is None or doc_id not in candidate):
                continue
            tfc = float(
                scoring.bm25_tf_component(
                    np.float64(tf), np.float64(doclens[doc_id]), index.avgdl,
                    index.cfg.k1, index.cfg.b,
                )
            )
            scores[doc_id] = scores.get(doc_id, 0.0) + idf * tfc
    if not scores:
        return pd.DataFrame(
            {"rank": np.empty(0, np.int32), "doc_id": np.empty(0, np.int64),
             "score": np.empty(0, np.float64)}
        )
    doc_ids = np.fromiter(scores.keys(), dtype=np.int64)
    vals = np.fromiter(scores.values(), dtype=np.float64)
    if stopword_only:
        vals = vals * STOPWORD_PENALTY
    idx = scoring.topk_indices(vals, doc_ids, k)
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(idx) + 1, dtype=np.int32),
            "doc_id": doc_ids[idx],
            "score": vals[idx],
        }
    )
