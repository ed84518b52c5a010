"""Query spell correction against the index dictionary.

The reference corrects query words through the Bing spellcheck API
(`/root/reference/src/cis5550/jobs/Search.java:31` ``v7.0/spellcheck``,
``:206`` applied to the analyzed words, ``:340-341`` corrected words
echoed in the response JSON). This container has no network, and an
external API is the wrong shape for a self-contained engine anyway, so
the rebuild derives corrections from the corpus itself: a
SymSpell-style deletes index over the index DICTIONARY (term -> df),
correcting an unknown query term to the highest-df dictionary term
within edit distance 1 (deletes-of-one on both sides cover
insert/delete/substitute/transpose). Deterministic: ties break to the
lexicographically smallest term.

Scale note: the deletes map is O(vocab * term_len) entries; the
constructor keeps only the ``max_terms`` highest-df terms (misspelled
words want common corrections), so serving-tier memory is bounded
regardless of corpus vocabulary.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow.parquet as pq


def _deletes1(word: str) -> set[str]:
    return {word[:i] + word[i + 1 :] for i in range(len(word))}


def _within1(a: str, b: str) -> bool:
    """Damerau-Levenshtein distance <= 1 (shared-delete candidate
    generation admits a few distance-2 same-length pairs; this is the
    exact filter)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        diff = [i for i in range(la) if a[i] != b[i]]
        if len(diff) == 1:
            return True  # substitution
        return (
            len(diff) == 2
            and diff[1] == diff[0] + 1
            and a[diff[0]] == b[diff[1]]
            and a[diff[1]] == b[diff[0]]
        )  # adjacent transposition
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # b is a plus one inserted char
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


class SpellChecker:
    def __init__(self, terms, dfs, max_terms: int = 1_000_000):
        terms = np.asarray(terms, dtype=object)
        dfs = np.asarray(dfs, dtype=np.int64)
        if len(terms) > max_terms:
            keep = np.argsort(-dfs, kind="stable")[:max_terms]
            terms, dfs = terms[keep], dfs[keep]
        self.df = dict(zip(terms, dfs.tolist()))
        # deletes-of-1 index: variant -> candidate dictionary terms
        self.index: dict[str, list[str]] = {}
        for t in self.df:
            for v in _deletes1(t):
                self.index.setdefault(v, []).append(t)

    @classmethod
    def from_index(cls, index_dir: str, max_terms: int = 1_000_000) -> "SpellChecker":
        files = sorted(glob.glob(os.path.join(index_dir, "dictionary", "*.parquet")))
        t = pq.read_table(files, columns=["term", "df"])
        return cls(
            t["term"].to_numpy(zero_copy_only=False), t["df"].to_numpy(), max_terms
        )

    def correct(self, word: str) -> str:
        """Known words pass through; unknown words map to the best
        edit-distance-1 dictionary term (max df, then lexicographic),
        or pass through unchanged when nothing is within distance 1."""
        if not word or word in self.df:
            return word
        cands: set[str] = set()
        if word in self.index:  # dictionary term is word minus one char
            cands.update(self.index[word])
        for v in _deletes1(word):
            if v in self.df:  # word is dictionary term plus one char
                cands.add(v)
            if v in self.index:  # share a delete: substitute/transpose
                cands.update(self.index[v])
        cands = {c for c in cands if _within1(word, c)}
        if not cands:
            return word
        return sorted(cands, key=lambda c: (-self.df[c], c))[0]

    def correct_query(self, words: list[str]) -> tuple[list[str], bool]:
        out = [self.correct(w) for w in words]
        return out, out != words
