"""Prefix autocomplete over the index dictionary.

The reference frontend submits whole queries to its routed endpoint
(`/root/reference/src/cis5550/jobs/Search.java:198`) and has no
suggest-as-you-type; this module widens the serving surface with the
standard search-engine affordance: for a typed prefix, the k
highest-df dictionary terms extending it (suggestions come from the
corpus itself, like the SymSpell corrections in
``functions/spellcheck.py``).

Data structure: the dictionary's terms sorted lexicographically plus
their df column. A prefix maps to a contiguous term range (two
``searchsorted`` probes, O(log vocab)); the top-k of the range is one
``lexsort`` over the range only. Deterministic tie-break: df desc,
then term asc — the same order the ``suggest_prefix`` gate op and its
DuckDB oracle pin (`ops/text_ops.py`).

Scale note: like ``SpellChecker``, the constructor caps memory at the
``max_terms`` highest-df terms — autocomplete wants common
completions, so dropping the rare tail costs nothing a user would see
while bounding frontend RAM regardless of corpus vocabulary.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow.parquet as pq

# lexicographic upper bound for the prefix range: max unicode scalar,
# so every term extending the prefix sorts strictly below prefix+_HI
_HI = "\U0010ffff"


class PrefixSuggester:
    def __init__(self, terms, dfs, max_terms: int = 2_000_000):
        terms = np.asarray(terms, dtype=object)
        dfs = np.asarray(dfs, dtype=np.int64)
        if len(terms) > max_terms:
            keep = np.argsort(-dfs, kind="stable")[:max_terms]
            terms, dfs = terms[keep], dfs[keep]
        order = np.argsort(terms, kind="stable")
        self.terms = terms[order]
        self.dfs = dfs[order]

    @classmethod
    def from_index(cls, index_dir: str,
                   max_terms: int = 2_000_000) -> "PrefixSuggester":
        files = sorted(glob.glob(os.path.join(index_dir, "dictionary",
                                              "*.parquet")))
        t = pq.read_table(files, columns=["term", "df"])
        return cls(t["term"].to_numpy(zero_copy_only=False),
                   t["df"].to_numpy(), max_terms)

    def suggest(self, prefix: str, k: int = 10) -> list[tuple[str, int]]:
        """Top-``k`` (term, df) completions of ``prefix`` by df desc,
        term asc. The prefix is normalized the way the analyzer
        normalizes terms (lowercase); an empty or unmatched prefix
        returns []."""
        p = prefix.strip().lower()
        if not p:
            return []
        lo = np.searchsorted(self.terms, p)
        hi = np.searchsorted(self.terms, p + _HI)
        if hi <= lo:
            return []
        ts, ds = self.terms[lo:hi], self.dfs[lo:hi]
        sel = np.lexsort((ts, -ds))[: max(0, k)]
        return [(str(ts[i]), int(ds[i])) for i in sel]
