"""BM25 query evaluation over a built index.

Three access paths (SURVEY.md §7.2 step 6):

- ``LocalIndex`` — the in-process core: term -> ordered posting
  segments (decoded lazily, vectorized numpy), BM25 scoring through the
  shared ``functions.scoring`` module, conjunctive (posting-list
  intersection — the north-star default) or disjunctive (the
  reference ``Search``/``Ranker`` accumulation,
  `/root/reference/src/cis5550/jobs_archive/Ranker.java:162-168`)
  candidate generation, deterministic (score desc, doc_id asc)
  tie-break, and segment-level block-max pruning for conjunctive
  queries (skip segments whose doc range cannot intersect the current
  candidate range; upper-bound via (max_tf, min_doclen)).
- ``IndexShardActor`` — an actor hosting a term-range shard of the
  index, loaded once in ``__init__`` (the analog of the reference's
  index-resident-in-KVS, `/root/reference/src/cis5550/jobs/Search.java:236`).
- ``ShardedSearcher`` — driver-side fan-out: terms are routed to their
  shards, per-term score contributions come back as arrays, and the
  final top-k is computed with the same shared scoring module, so
  sharded and local evaluation are bit-identical.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import (
    IndexConfig,
    DEFAULT_TOP_K,
    STOPWORD_PENALTY,
    STOPWORDS,
    WILDCARD_MAX_EXPANSIONS,
)
from ..functions import scoring
from ..functions import varbyte as vb
from ..functions.analysis import analyze_query


class _LRUBytes:
    """Byte-budgeted LRU for serving-actor memos (decoded postings and
    per-term score arrays). Without a bound, a long-lived actor on a
    varied query stream accumulates full-posting float64 arrays
    indefinitely; with it, steady-state memory is capped."""

    def __init__(self, budget_bytes: int):
        import threading
        from collections import OrderedDict

        self._d: "OrderedDict[object, tuple]" = OrderedDict()
        self._bytes = 0
        self._budget = budget_bytes
        # serve.py's ThreadingHTTPServer drives LocalIndex/Sharded
        # searchers from concurrent request threads; unlocked compound
        # pop/insert/evict would corrupt the byte accounting and the
        # budget would never evict again
        self._lock = threading.Lock()

    def get(self, key):
        with self._lock:
            hit = self._d.get(key)
            if hit is None:
                return None
            self._d.move_to_end(key)
            return hit[0]

    def put(self, key, value, nbytes: int):
        with self._lock:
            old = self._d.pop(key, None)
            if old is not None:
                self._bytes -= old[1]
            self._d[key] = (value, nbytes)
            self._bytes += nbytes
            while self._bytes > self._budget and len(self._d) > 1:
                _, (_, nb) = self._d.popitem(last=False)
                self._bytes -= nb

    # dict-style interface used by score_decoded_terms
    def __setitem__(self, key, arr):
        self.put(key, arr, int(getattr(arr, "nbytes", 64)))


# default per-LocalIndex memo budget (scores + decoded postings).
# Sized for a serving actor owning a few GB of heap: hot-term decoded
# postings are ~24 B/posting and score arrays 8 B/posting, so 1 GB
# holds the working set of a 50-query reference mix over millions of
# docs; a too-small budget causes eviction thrash (re-decoding a hot
# term costs seconds at 10^6 postings). Env-tunable: a serving actor
# over a 10x-deep doc shard needs a proportionally bigger memo or the
# warm working set no longer fits (size it to shard df volume).
def _cache_budget_from_env() -> int:
    """Parse SERAY_CACHE_BUDGET_BYTES defensively: a malformed value
    must not crash module import in every Ray worker, and a
    non-positive one must not silently disable the memo (evict-on-
    every-put). Falls back to the 1 GiB default with a floor."""
    raw = os.environ.get("SERAY_CACHE_BUDGET_BYTES", "")
    try:
        val = int(raw)
    except ValueError:
        val = 0
    return val if val >= (1 << 20) else (1 << 30)


CACHE_BUDGET_BYTES = _cache_budget_from_env()

# OR-mode strategy thresholds — shared by score_decoded_terms (the
# branch predicates) and LocalIndex.explain (the reported strategy), so
# the two cannot silently diverge.
# Largest N for which O(N) dense MaxScore accumulators are allowed.
MAXSCORE_MAX_N = 1 << 26
# Below this N dense accumulation is always cheap enough.
DENSE_MIN_N = 1 << 24
# Above DENSE_MIN_N, dense/MaxScore requires posting volume >= N/this.
DENSE_VOLUME_FACTOR = 4


class _TermSegments:
    """All posting segments of one term, ordered by first_doc (doc
    ranges are disjoint, so first_doc alone orders them)."""

    __slots__ = ("df", "first_doc", "last_doc", "seg_df", "max_tf", "min_doclen",
                 "doc_bytes", "tf_bytes", "dl_bytes", "pos_bytes", "pr_bytes",
                 "_cache", "_key", "_ub")

    def __init__(self, df, first_doc, last_doc, seg_df, max_tf, min_doclen, doc_bytes, tf_bytes,
                 dl_bytes=None, pos_bytes=None, pr_bytes=None):
        self.df = df
        self.first_doc = first_doc
        self.last_doc = last_doc
        self.seg_df = seg_df
        self.max_tf = max_tf
        self.min_doclen = min_doclen
        self.doc_bytes = doc_bytes
        self.tf_bytes = tf_bytes
        self.dl_bytes = dl_bytes
        self.pos_bytes = pos_bytes
        self.pr_bytes = pr_bytes
        self._cache: _LRUBytes | None = None
        self._key = None
        self._ub: float | None = None

    def attach_cache(self, cache: "_LRUBytes", term: str) -> None:
        self._cache = cache
        self._key = ("post", term)

    def decode(self, lo: int | None = None, hi: int | None = None):
        """-> (doc_ids, tfs, doclens); optionally only segments
        overlapping the doc-id range [lo, hi] (block skipping). The
        per-posting doclen stream makes scoring self-contained (no
        global doclen table). Full decodes are memoized in the owning
        index's byte-bounded LRU — the actor-resident hot-term cache
        (decoded postings are ~2x the varbyte bytes)."""
        if lo is None and hi is None:
            full = self._cache.get(self._key) if self._cache is not None else None
            if full is None:
                full = self._decode_range(range(len(self.seg_df)))
                if self._cache is not None:
                    self._cache.put(
                        self._key, full, int(sum(a.nbytes for a in full))
                    )
            return full
        sel = [
            i for i in range(len(self.seg_df))
            if self.last_doc[i] >= lo and self.first_doc[i] <= hi
        ]
        if len(sel) == len(self.seg_df):
            # the range covers every segment (common for the terms that
            # DEFINE an AND query's [lo, hi]): take the memoized full
            # decode instead of re-decoding the whole posting list
            return self.decode()
        return self._decode_range(sel)

    def _decode_range(self, sel):
        if not len(sel):
            e = np.empty(0, np.int64)
            return e, e, e
        ids = [vb.delta_decode(vb.decode(self.doc_bytes[i])) for i in sel]
        tfs = [vb.decode(self.tf_bytes[i]).astype(np.int64) for i in sel]
        dls = [vb.decode(self.dl_bytes[i]).astype(np.int64) for i in sel]
        return np.concatenate(ids), np.concatenate(tfs), np.concatenate(dls)

    def upper_bound(self, N: int, avgdl: float, k1: float, b: float) -> float:
        """Max possible BM25 contribution of this term to any doc —
        block-max metadata (max_tf, min_doclen) per segment, global df
        for the idf. Used by the MaxScore OR-mode pruning. Memoized:
        (N, avgdl, k1, b) are fixed for the life of the index."""
        if self._ub is None:
            self._ub = max(
                scoring.bm25_upper_bound(self.max_tf[i], self.min_doclen[i], N, self.df, avgdl, k1, b)
                for i in range(len(self.max_tf))
            )
        return self._ub

    def decode_priors(self):
        """Per-posting doc priors, aligned with a full ``decode()`` —
        the reference's pagerank-in-posting payload
        (Search.java:89-108). Requires an index built with
        ``store_prior`` (the index1000 analog: each shard scores the
        combined 0.95*ln(tfidf)+0.05*ln(prior) rank locally, no
        corpus-wide prior table anywhere)."""
        if self.pr_bytes is None or self.pr_bytes[0] is None:
            raise ValueError("index built without store_prior")
        return np.concatenate(
            [vb.decode(self.pr_bytes[i]).astype(np.int64)
             for i in range(len(self.pr_bytes))]
        )

    def decode_positions(self):
        """(doc_ids, tfs, pos_starts, pos_values): positions of entry i
        are ``pos_values[pos_starts[i]:pos_starts[i+1]]`` (ascending).
        Requires the index loaded with positions. Memoized in the same
        byte-bounded LRU as ``decode()`` — a serving actor answering
        repeated phrase queries over hot terms must not re-pay the
        varbyte + segmented-cumsum cost per query."""
        if self.pos_bytes is None or self.pos_bytes[0] is None:
            raise ValueError("index loaded without positions")
        key = ("pos", self._key[1])
        if self._cache is not None:
            full = self._cache.get(key)
            if full is not None:
                return full
        ids, tfs, _dls = self.decode()
        gaps = np.concatenate([
            vb.decode(self.pos_bytes[i]).astype(np.int64)
            for i in range(len(self.pos_bytes))
        ])
        ends = np.cumsum(tfs)
        starts = ends - tfs
        # segmented cumsum: gaps reset to absolute at each entry start
        total = np.cumsum(gaps)
        base = np.zeros(len(tfs), dtype=np.int64)
        nz = starts > 0
        base[nz] = total[starts[nz] - 1]
        values = total - np.repeat(base, tfs)
        full = (ids, tfs, np.concatenate([starts, [len(gaps)]]), values)
        if self._cache is not None:
            self._cache.put(key, full, int(sum(a.nbytes for a in full)))
        return full


class LocalIndex:
    """Loads an index directory into memory (terms optionally
    restricted to a shard predicate) and evaluates BM25 queries."""

    def __init__(self, index_dir: str, term_filter=None, load_positions: bool = False,
                 parts: list[int] | None = None, global_df: dict | None = None):
        """``parts``: restrict to those segment partitions (a doc-range
        shard — used by DocShardedSearcher); requires ``global_df``
        (term -> corpus-wide df from the dictionary) so idf stays
        global and scores remain identical to unsharded evaluation."""
        if parts is not None and global_df is None:
            # shard-local df would silently inflate idf and break the
            # "scores identical to unsharded evaluation" contract
            raise ValueError("parts= requires global_df (corpus-wide term dfs)")
        with open(os.path.join(index_dir, "meta.json")) as f:
            self.meta = json.load(f)
        self.cfg = IndexConfig.from_json(self.meta["config"])
        self.N = int(self.meta["N"])
        self.avgdl = float(self.meta["avgdl"])
        self.terms: dict[str, _TermSegments] = {}
        self.has_positions = load_positions and self.cfg.positions
        self.has_priors = bool(getattr(self.cfg, "store_prior", False))
        if parts is not None:
            want = {f"part={p:05d}" for p in parts}
            seg_files = sorted(
                f for f in glob.glob(os.path.join(index_dir, "segments", "part=*", "*.parquet"))
                if os.path.basename(os.path.dirname(f)) in want
            )
        else:
            seg_files = sorted(
                glob.glob(os.path.join(index_dir, "segments", "part=*", "*.parquet"))
            )
        self._global_df = global_df
        # NOTE: "bucket" deliberately absent — segment ordering uses
        # first_doc alone (disjoint ranges), so the column would be a
        # dead read on the serving-actor startup path
        cols = ["term", "first_doc", "last_doc", "df", "max_tf",
                "min_doclen", "doc_bytes", "tf_bytes", "dl_bytes"]
        if self.has_positions:
            cols.append("pos_bytes")
        if self.has_priors:
            cols.append("pr_bytes")
        # vectorized ingest: one concat -> dictionary-encode terms ->
        # lexsort (term, bucket, first_doc) -> slice per-term groups;
        # no per-row python dict work (startup cost is what a restarted
        # serving actor pays)
        if seg_files:
            # one threaded dataset read — the wave write produces many
            # small files (one per task x partition) and sequential
            # opens dominate load time otherwise
            t = pq.read_table(seg_files, columns=cols)
        else:
            t = None
        if t is not None and t.num_rows:
            term_arr = t["term"].combine_chunks()
            denc = term_arr.dictionary_encode()
            code = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            vocab = denc.dictionary.to_pylist()
            first = t["first_doc"].to_numpy()
            # order segments per term by first_doc alone: doc ranges are
            # disjoint, so first_doc fully orders them — robust to
            # differing (adaptive) bucket sizes across build waves
            order = np.lexsort((first, code))
            code = code[order]
            first = first[order].tolist()
            last = t["last_doc"].to_numpy()[order].tolist()
            df = t["df"].to_numpy()[order].tolist()
            mtf = t["max_tf"].to_numpy()[order].tolist()
            mdl = t["min_doclen"].to_numpy()[order].tolist()
            take = pa.array(order)
            db = t["doc_bytes"].combine_chunks().take(take).to_pylist()
            tb = t["tf_bytes"].combine_chunks().take(take).to_pylist()
            dlb = t["dl_bytes"].combine_chunks().take(take).to_pylist()
            pb = (
                t["pos_bytes"].combine_chunks().take(take).to_pylist()
                if self.has_positions else None
            )
            prb = (
                t["pr_bytes"].combine_chunks().take(take).to_pylist()
                if self.has_priors else None
            )
            change = np.empty(len(code), dtype=bool)
            change[0] = True
            np.not_equal(code[1:], code[:-1], out=change[1:])
            starts = np.flatnonzero(change)
            ends = np.concatenate([starts[1:], [len(code)]])
            for s, e in zip(starts, ends):
                term = vocab[code[s]]
                if term_filter is not None and not term_filter(term):
                    continue
                seg_df = df[s:e]
                self.terms[term] = _TermSegments(
                    df=(
                        int(self._global_df[term])
                        if self._global_df is not None
                        else sum(seg_df)
                    ),
                    first_doc=first[s:e],
                    last_doc=last[s:e],
                    seg_df=seg_df,
                    max_tf=mtf[s:e],
                    min_doclen=mdl[s:e],
                    doc_bytes=db[s:e],
                    tf_bytes=tb[s:e],
                    dl_bytes=dlb[s:e],
                    pos_bytes=pb[s:e] if pb is not None else None,
                    pr_bytes=prb[s:e] if prb is not None else None,
                )
        # one byte-bounded LRU per index for BOTH decoded-posting and
        # per-term-score memos (namespaced keys) — caps steady-state
        # serving-actor memory on varied query streams
        self._memo = _LRUBytes(CACHE_BUDGET_BYTES)
        for term, ts in self.terms.items():
            ts.attach_cache(self._memo, term)
        self._tscores = self._memo
        self._index_dir = index_dir
        self._doclen: np.ndarray | None = None
        # wildcard-expansion vocabulary (sorted terms + aligned dfs),
        # built lazily on the first 'prefix*' query
        self._wc_vocab: tuple[np.ndarray, np.ndarray, np.ndarray] | None = None

    @property
    def doclen(self) -> np.ndarray:
        """Doclen-per-doc_id flat array, loaded lazily — only the
        phrase/tf-idf paths need it (BM25 uses the per-posting stream),
        so doc-shard actors never pay the O(N) load."""
        if self._doclen is None:
            self._doclen = np.zeros(self.N, dtype=np.int32)
            for f in sorted(glob.glob(os.path.join(self._index_dir, "docs", "*.parquet"))):
                t = pq.read_table(f, columns=["doc_id", "doclen"])
                self._doclen[t["doc_id"].to_numpy()] = t["doclen"].to_numpy()
        return self._doclen

    # ---- scoring ----

    def term_postings(self, term: str):
        ts = self.terms.get(term)
        if ts is None:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        ids, tfs, _dls = ts.decode()
        return ids, tfs

    def search(self, query: str, k: int = DEFAULT_TOP_K, mode: str = "AND",
               doc_filter=None, result_cache: bool = True):
        """Returns (doc_ids, scores) of the top-k. Query tokens
        starting with ``-`` are EXCLUSIONS ('hash -join': docs
        containing any analyzed exclusion term are dropped before the
        top-k cut; scores of survivors are unchanged).
        ``doc_filter``: an
        optional vectorized predicate ``ndarray[int64] -> ndarray[bool]``
        applied to candidate doc_ids BEFORE the top-k cut (faceted /
        metadata-restricted retrieval); scores of surviving docs are
        unchanged, so a filtered search equals post-filtering an
        unfiltered full ranking.

        ``result_cache``: memoize the final (doc_ids, scores) per
        (query, k, mode) in the byte-bounded LRU — the serving-tier
        result cache (scoring is deterministic, so a hit is
        bit-identical to recomputation; ~3 KB per entry at k=200).
        The memo dies with the LocalIndex, so reload-after-extend
        invalidates it. Pass False to force the scoring path (the
        bench's steady-state scoring metric does). Unfiltered queries
        only — doc_filter results depend on the predicate identity."""
        rkey = None
        # k guard: full-ranking callers (k=10**9 batch ops) would cache
        # whole candidate sets — serving uses k<=a few hundred
        if result_cache and doc_filter is None and k <= 10_000:
            rkey = ("res", query, k, mode)
            hit = self._memo.get(rkey)
            if hit is not None:
                # copies: cached arrays must survive a caller mutating
                # its result (k is small, so this is ~microseconds)
                return hit[0].copy(), hit[1].copy()
        ids_sc = self._search_uncached(query, k, mode, doc_filter)
        if rkey is not None:
            self._memo.put(
                rkey, ids_sc, int(ids_sc[0].nbytes + ids_sc[1].nbytes + 64)
            )
            return ids_sc[0].copy(), ids_sc[1].copy()
        return ids_sc

    @staticmethod
    def _split_exclusions(query: str) -> tuple[str, str]:
        """``'hash join -window'`` -> ``('hash join', 'window')``: a
        whitespace token starting with ``-`` is an exclusion. Hyphens
        INSIDE words ('state-of-the-art') are untouched — the
        analyzer's non-alphanumeric split owns those; a bare '-' is
        ignored."""
        pos, neg = [], []
        for w in query.split():
            (neg if (w.startswith("-") and len(w) > 1) else pos).append(w)
        return " ".join(pos), " ".join(w[1:] for w in neg)

    @staticmethod
    def _split_wildcards(query: str) -> tuple[str, list[tuple[str, str]]]:
        """``'merge vec* jion~'`` -> ``('merge', [('prefix', 'vec'),
        ('fuzzy', 'jion')])``: a whitespace token ending in ``*`` is a
        wildcard (prefix) rewrite, one ending in ``~`` a fuzzy
        (edit-distance-1) rewrite. The body is normalized like any
        query token (lowercase, alphanumerics only); a bare marker or
        a body that normalizes to empty is dropped. Everything else
        passes through to the analyzer."""
        rest, groups = [], []
        for w in query.split():
            kind = None
            if w.endswith("*") and len(w) > 1:
                kind = "prefix"
            elif w.endswith("~") and len(w) > 1:
                kind = "fuzzy"
            if kind is not None:
                p = "".join(c for c in w[:-1].lower() if c.isalnum())
                if p:
                    groups.append((kind, p))
                continue
            if w in ("*", "~"):
                continue
            rest.append(w)
        return " ".join(rest), groups

    def _expand_group(self, kind: str, body: str) -> list[str]:
        return (
            self.expand_prefix(body) if kind == "prefix"
            else self.expand_fuzzy(body)
        )

    @staticmethod
    def _split_phrases(query: str) -> tuple[str, list[str], list[str]]:
        """``'"hash join" filter -"group by"'`` ->
        ``('filter', ['hash join'], ['group by'])``: a double-quoted
        span is an exact-phrase clause; a ``-"..."`` span is an
        EXCLUDED phrase (docs containing it drop). Unbalanced or empty
        quotes are dropped (the leftover character is stripped by the
        analyzer's non-alphanumeric split)."""
        import re

        pos, neg = [], []
        for sign, body in re.findall(r'(-?)"([^"]*)"', query):
            body = body.strip()
            if body:
                (neg if sign else pos).append(body)
        rest = re.sub(r'-?"[^"]*"', " ", query)
        return rest, pos, neg

    @staticmethod
    def _split_boosts(query: str) -> tuple[str, list[tuple[str, float]]]:
        """``'hash join^2'`` -> ``('hash', [('join', 2.0)])``: a token
        ``body^W`` with a positive float W is a BOOSTED term — its
        BM25 contribution is scaled by W (Lucene's ``^`` syntax).
        A malformed weight leaves the token alone (the analyzer's
        non-alphanumeric split then treats '^' as a separator)."""
        rest, boosts = [], []
        for w in query.split():
            if "^" in w[1:]:
                body, _, wt = w.rpartition("^")
                try:
                    f = float(wt)
                except ValueError:
                    rest.append(w)
                    continue
                if f > 0 and body:
                    boosts.append((body, f))
                    continue
            rest.append(w)
        return " ".join(rest), boosts

    def _vocab(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Sorted rewrite vocabulary (terms, dfs, lengths), built
        lazily on the first wildcard/fuzzy query from the GLOBAL
        dictionary when one is installed (doc-range shards), else the
        local term dict."""
        if self._wc_vocab is None:
            src = (
                self._global_df
                if self._global_df is not None
                else {t: ts.df for t, ts in self.terms.items()}
            )
            terms = np.array(sorted(src), dtype=object)
            dfs = np.fromiter(
                (src[t] for t in terms), dtype=np.int64, count=len(terms)
            )
            lens = np.fromiter(
                (len(t) for t in terms), dtype=np.int64, count=len(terms)
            )
            self._wc_vocab = (terms, dfs, lens)
        return self._wc_vocab

    def expand_prefix(self, prefix: str) -> list[str]:
        """Dictionary terms starting with ``prefix``, the engine's
        multi-term rewrite (the batch analog is
        ``ops.search_ops.bm25_topk_wildcard``'s SQL twin). Stopwords
        are never re-admitted (the analyzer drops them from mixed
        queries, so a wildcard must not smuggle them back), and the
        set is capped at ``WILDCARD_MAX_EXPANSIONS`` by (df desc,
        term asc). Expansion runs over the GLOBAL dictionary when one
        is installed (doc-range shards), so every shard derives the
        SAME expansion set even when the cap binds — the
        sharded == unsharded bit-identity contract holds.

        Expansion sets are memoized in the index's byte-bounded LRU
        (the dictionary is immutable for an index generation; the memo
        dies with the LocalIndex on reload-after-extend), so a
        repeated rewrite costs a dict hit, not a dictionary scan."""
        mkey = ("wcx", prefix)
        hit = self._memo.get(mkey)
        if hit is not None:
            return list(hit)
        terms, dfs, _lens = self._vocab()
        lo = np.searchsorted(terms, prefix)
        hi = np.searchsorted(terms, prefix + chr(0x10FFFF))
        cand, cdf = terms[lo:hi], dfs[lo:hi]
        keep = np.fromiter(
            (t not in STOPWORDS for t in cand), dtype=bool, count=len(cand)
        )
        cand, cdf = cand[keep], cdf[keep]
        if len(cand) > WILDCARD_MAX_EXPANSIONS:
            # deterministic rewrite cap: highest-df first, term asc on
            # ties (cand is term-sorted, so stable argsort on -df is
            # exactly that order)
            order = np.argsort(-cdf, kind="stable")[:WILDCARD_MAX_EXPANSIONS]
            cand = cand[order]
        out = sorted(cand.tolist())
        self._memo.put(mkey, tuple(out), 64 + 8 * sum(len(t) for t in out))
        return out

    def expand_fuzzy(self, word: str) -> list[str]:
        """Dictionary terms within Damerau-Levenshtein distance 1 of
        ``word`` — the fuzzy (``term~``) rewrite. Same policy as
        ``expand_prefix``: global dictionary (shard-identical sets),
        stopwords never re-admitted, capped at
        ``WILDCARD_MAX_EXPANSIONS`` by (df desc, term asc). Candidate
        generation prunes to terms whose length differs by <= 1 (a
        necessary condition at distance 1) before the exact
        ``_within1`` check, so per-query cost is the size of three
        length buckets, not the vocabulary."""
        from ..functions.spellcheck import _within1

        mkey = ("fzx", word)
        hit = self._memo.get(mkey)
        if hit is not None:
            return list(hit)
        terms, dfs, lens = self._vocab()
        L = len(word)
        near = np.flatnonzero(np.abs(lens - L) <= 1)
        keep = [
            i for i in near
            if terms[i] not in STOPWORDS
            and (terms[i] == word or _within1(word, terms[i]))
        ]
        cand = terms[keep]
        cdf = dfs[keep]
        if len(cand) > WILDCARD_MAX_EXPANSIONS:
            order = np.argsort(-cdf, kind="stable")[:WILDCARD_MAX_EXPANSIONS]
            cand = cand[order]
        out = sorted(cand.tolist())
        # the Damerau scan is the expensive rewrite (a length-bucket
        # python loop); the memo makes repeats a dict hit
        self._memo.put(mkey, tuple(out), 64 + 8 * sum(len(t) for t in out))
        return out

    def _search_wildcard(self, lit_q: str, prefixes: list[str], k: int,
                         mode: str, doc_filter, boosts: list | None = None):
        """Wildcard retrieval: each ``prefix*`` token is a GROUP of
        dictionary expansions. AND mode: a doc must contain every
        literal term and >= 1 expansion of every group (a group with
        no dictionary match means no doc can satisfy it -> empty).
        OR mode: literals and all expansions accumulate as usual.
        Matched terms score once each (first mention wins across
        literals/groups), summed through ``score_decoded_terms``'s
        OR branch on candidate-restricted postings — same formula,
        rounding and tie-break as every other path. The stopword-only
        penalty never applies here (a wildcard group is never a
        stopword, so the query is not stopword-only by construction).

        Distribution: expansion sets come from the global dictionary
        (see ``expand_prefix``) and candidate logic uses only local
        postings, so ``DocShardedSearcher`` needs no coordination —
        each shard's wildcard result is exactly its slice of the
        unsharded ranking."""
        empty = np.empty(0, np.int64), np.empty(0, np.float64)
        lit_terms, _sw_only = analyze_query(lit_q, self.cfg) if lit_q else ([], False)
        groups = [self._expand_group(kind, body) for kind, body in prefixes]
        if mode == "AND" and any(not g for g in groups):
            return empty
        # boosted terms analyze like literals (stem, stopword drop) and
        # are REQUIRED in AND mode; weights of duplicate mentions add
        # (Lucene's additive clauses): 'join join^2' weighs join 3x
        weights: dict[str, float] = {}
        boosted_terms: list[str] = []
        for body, wt in (boosts or ()):
            # a body may analyze to several terms ('hash-join^2'):
            # every one is boosted and (in AND mode) required — a
            # [0]-only pick would silently drop the rest from the query
            for t in analyze_query(body, self.cfg)[0]:
                if t not in weights:
                    boosted_terms.append(t)
                weights[t] = weights.get(t, 0.0) + wt
        for t in lit_terms:
            weights[t] = weights.get(t, 0.0) + 1.0
        req_terms = lit_terms + [
            t for t in boosted_terms if t not in lit_terms
        ]

        # decode each distinct term ONCE (the candidate pass and the
        # scoring pass share these; the LRU would usually make the
        # second decode a hit, but not under budget pressure)
        dec: dict[str, tuple] = {}

        def decode_once(t: str):
            d = dec.get(t)
            if d is None:
                ts = self.terms.get(t)
                d = ts.decode() if ts is not None else None
                dec[t] = d
            return d

        # candidate set (AND only): literals intersect; each group
        # contributes the union of its locally-present expansions
        cand = None
        if mode == "AND":
            for t in req_terms:
                d = decode_once(t)
                if d is None:
                    return empty
                cand = d[0] if cand is None else _intersect_sorted(cand, d[0])
                if cand is not None and cand.size == 0:
                    return empty
            for g in groups:
                arrs = []
                for t in g:
                    d = decode_once(t)
                    if d is not None and d[0].size:
                        arrs.append(d[0])
                if not arrs:
                    return empty
                u = (np.unique(np.concatenate(arrs))
                     if len(arrs) > 1 else arrs[0])
                cand = u if cand is None else _intersect_sorted(cand, u)
                if cand.size == 0:
                    return empty
            if doc_filter is not None and cand is not None:
                cand = cand[doc_filter(cand)]
                if cand.size == 0:
                    return empty

        # fixed scoring order: literals in analyzer order, then groups
        # in query order with expansions lexicographic; each distinct
        # term contributes once (dedup depends only on global sets, so
        # shards agree)
        term_order: list[str] = []
        seen: set[str] = set()
        for t in req_terms:
            if t not in seen:
                seen.add(t)
                term_order.append(t)
        for g in groups:
            for t in g:
                if t not in seen:
                    seen.add(t)
                    term_order.append(t)

        decoded = []
        for t in term_order:
            d = decode_once(t)
            if d is None:
                continue
            ids, tfs, dls = d
            if cand is not None:
                loc = np.searchsorted(ids, cand)
                ok = (loc < ids.size) & (ids[np.minimum(loc, ids.size - 1)] == cand)
                sel = loc[ok]
                ids, tfs, dls = cand[ok], tfs[sel], dls[sel]
            elif doc_filter is not None:
                keep = doc_filter(ids)
                ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
            if ids.size:
                decoded.append(
                    (t, ids, tfs, dls, self.terms[t].df,
                     weights.get(t, 1.0))
                )
        if not decoded:
            return empty
        if all(w == 1.0 for *_rest, w in decoded):
            if cand is None and doc_filter is None:
                # unrestricted OR rewrite: the decoded arrays are FULL
                # posting lists, so they may share the per-term score
                # memo and MaxScore upper bounds with the plain OR
                # path — warm wildcard/fuzzy queries degenerate to
                # gathers like every other warm query (the 2.4M
                # query_surface p95 tail was exactly this re-scoring)
                ubs = [
                    self.terms[t].upper_bound(
                        self.N, self.avgdl, self.cfg.k1, self.cfg.b
                    )
                    for t, *_r in decoded
                ]
                return score_decoded_terms(
                    [d[:5] for d in decoded],
                    self.N, self.avgdl, self.cfg, k, "OR", False,
                    score_cache=self._tscores, upper_bounds=ubs,
                )
            # unweighted: the ONE shared kernel (bit-identical to the
            # committed wildcard/fuzzy semantics); restricted postings
            # must not feed the full-array score memo
            return score_decoded_terms(
                [d[:5] for d in decoded],
                self.N, self.avgdl, self.cfg, k, "OR", False,
            )
        # weighted accumulation: sum_i w_i * bm25_i per doc in the
        # SAME fixed term order and tie-break as the kernel's dense
        # branch (weights stay out of score_decoded_terms so the
        # shared kernel's bit-identity contracts are untouched)
        wsc = []
        for t, ids, tfs, dls, df, w in decoded:
            sc = scoring.bm25_term_scores(
                tfs, dls, self.N, df, self.avgdl, self.cfg.k1, self.cfg.b
            )
            wsc.append(sc * w if w != 1.0 else sc)
        lo = min(int(d[1][0]) for d in decoded)
        hi = max(int(d[1][-1]) for d in decoded)
        n_span = hi - lo + 1
        volume = sum(d[1].size for d in decoded)
        if n_span <= max(DENSE_MIN_N, DENSE_VOLUME_FACTOR * volume):
            acc = np.zeros(n_span, dtype=np.float64)
            for (t, ids, *_r), sc in zip(decoded, wsc):
                acc[ids - lo] += sc
            doc_ids = np.flatnonzero(acc) + lo
            scores = acc[doc_ids - lo]
        else:
            # sorted-merge fallback (the kernel's own volume gate):
            # rare terms spanning a huge id range must not pay an
            # O(span) zeroed accumulator per query
            ids_c = np.concatenate([d[1] for d in decoded])
            sc_c = np.concatenate(wsc)
            doc_ids, inv = np.unique(ids_c, return_inverse=True)
            scores = np.zeros(doc_ids.size, dtype=np.float64)
            np.add.at(scores, inv, sc_c)
        idx = scoring.topk_indices(scores, doc_ids, k)
        return doc_ids[idx], scores[idx]

    def _phrase_exclusion_filter(self, neg_phrases: list[str], base):
        """doc_filter dropping every doc containing ANY excluded
        phrase (position-verified, like positive phrase clauses) —
        shard-local for the same reason as ``_exclusion_filter``.
        Memoized per phrase set like the word-exclusion filter —
        repeats must not re-pay the full postings+positions scan."""
        ekey = ("exph", tuple(neg_phrases))
        ex = self._memo.get(ekey)
        if ex is None:
            ids_list = []
            for p in neg_phrases:
                ids_p, _sc = self._phrase_uncached(p, 10**9)
                if ids_p.size:
                    ids_list.append(np.sort(ids_p))
            if not ids_list:
                return base
            ex = (np.unique(np.concatenate(ids_list))
                  if len(ids_list) > 1 else ids_list[0])
            self._memo.put(ekey, ex, int(ex.nbytes) + 64)
        if not ex.size:
            return base
        return _sorted_member_filter(ex, base)

    def _search_with_phrases(self, rest_q: str, phrases: list[str],
                             k: int, mode: str, doc_filter):
        """Mixed queries with quoted exact-phrase clauses: each phrase
        is an independent clause matching the docs where its tokens
        occur adjacently (position-verified, ``_phrase_uncached``) and
        contributing the phrase terms' summed BM25 on those docs. The
        remainder (which may itself contain wildcards / fuzzies /
        boosts / plain terms) evaluates through its own machinery;
        AND requires the remainder AND every phrase, OR unions all
        clauses. score(d) = remainder(d) + sum of matching phrases'
        scores — a term shared by a phrase and the remainder counts in
        both clauses (Lucene's independent-clause semantics).
        Requires a positions-loaded index (raises otherwise, like
        ``phrase_search``); shard-local end-to-end, so the doc-sharded
        tier stays bit-identical."""
        empty = np.empty(0, np.int64), np.empty(0, np.float64)
        ph = []
        for p in phrases:
            ids_p, sc_p = self._phrase_uncached(p, 10**9)
            order = np.argsort(ids_p)  # id-sorted for set ops
            ids_p, sc_p = ids_p[order], sc_p[order]
            if doc_filter is not None and ids_p.size:
                keep = doc_filter(ids_p)
                ids_p, sc_p = ids_p[keep], sc_p[keep]
            if mode == "AND" and ids_p.size == 0:
                return empty
            ph.append((ids_p, sc_p))
        # "remainder present" means it yields ANALYZABLE content: a
        # remainder of only skip-words / bare punctuation must be
        # IGNORED (like 'hash www' ignores 'www'), not treated as a
        # failing AND clause that empties the phrase matches
        _wc_rest, _wc_groups = self._split_wildcards(rest_q)
        _lit_rest, _boosts = self._split_boosts(_wc_rest)
        _live_boosts = any(
            analyze_query(b, self.cfg)[0] for b, _w in _boosts
        )
        rest_present = bool(
            _wc_groups or _live_boosts
            or analyze_query(_lit_rest, self.cfg)[0]
        )
        r_ids = r_sc = None
        if rest_present:
            r_ids, r_sc = self._search_uncached(rest_q, 10**9, mode, doc_filter)
            ro = np.argsort(r_ids)
            r_ids, r_sc = r_ids[ro], r_sc[ro]
            if mode == "AND" and r_ids.size == 0:
                return empty
        if mode == "AND":
            cand = r_ids if rest_present else None
            for ids_p, _sc in ph:
                cand = ids_p if cand is None else _intersect_sorted(cand, ids_p)
                if cand.size == 0:
                    return empty
        else:
            arrs = [ids_p for ids_p, _sc in ph if ids_p.size]
            if rest_present and r_ids.size:
                arrs.append(r_ids)
            if not arrs:
                return empty
            cand = (np.unique(np.concatenate(arrs))
                    if len(arrs) > 1 else arrs[0])
        # fixed accumulation order: remainder first, then phrases in
        # query order (round-6 on both sides absorbs sub-ulp
        # reassociation vs the SQL twin, as everywhere else)
        scores = np.zeros(cand.size, dtype=np.float64)
        parts = ([(r_ids, r_sc)] if rest_present else []) + ph
        for ids_x, sc_x in parts:
            if not ids_x.size:
                continue
            loc = np.searchsorted(ids_x, cand)
            ok = (loc < ids_x.size) & (
                ids_x[np.minimum(loc, ids_x.size - 1)] == cand
            )
            scores[ok] += sc_x[loc[ok]]
        idx = scoring.topk_indices(scores, cand, k)
        return cand[idx], scores[idx]

    def _exclusion_filter(self, neg_q: str, base):
        """doc_filter dropping every doc that contains ANY excluded
        term, composed over ``base``. Exclusion terms run through the
        same analyzer as positives (stemming etc.), so they match the
        index's vocabulary; the excluded-id set is this index's own
        posting lists — on a doc-range shard that set is exactly the
        shard's slice, which is why '-term' distributes over
        DocShardedSearcher with no driver-side coordination.
        ``-prefix*`` composes: the exclusion expands through the same
        global-dictionary rewrite as positive wildcards, dropping docs
        containing ANY expansion."""
        neg_lit, neg_prefixes = self._split_wildcards(neg_q)
        if neg_prefixes:
            neg_terms, _ = (
                analyze_query(neg_lit, self.cfg) if neg_lit else ([], False)
            )
            neg_terms = list(neg_terms)
            for kind, body in neg_prefixes:
                neg_terms.extend(self._expand_group(kind, body))
        else:
            neg_terms, _ = analyze_query(neg_q, self.cfg)
        # the merged excluded-id set is a pure function of the term
        # set — memoize it (repeat exclusion queries were re-paying
        # the concat+unique over multi-million-id postings)
        ekey = ("excl", tuple(neg_terms))
        ex = self._memo.get(ekey)
        if ex is None:
            ids_list = []
            for t in neg_terms:
                ts = self.terms.get(t)
                if ts is not None:
                    ids_list.append(ts.decode()[0])
            ids_list = [a for a in ids_list if a.size]
            if not ids_list:
                return base
            ex = (np.unique(np.concatenate(ids_list))
                  if len(ids_list) > 1 else ids_list[0])
            self._memo.put(ekey, ex, int(ex.nbytes) + 64)
        if not ex.size:
            return base
        return _sorted_member_filter(ex, base)

    def facet_counts(self, query: str, facet_terms, mode: str = "OR"):
        """Per-facet match counts over the FULL candidate set of
        ``query`` (not the top-k): for each facet label, how many
        matching docs also contain that label's analyzed term(s) — the
        result-page facet histogram (role/tool chips on an
        ``index_role_tool`` build) without materializing any doc. A
        multi-word facet label counts docs containing ANY of its
        analyzed terms. Returns ``{facet_label: count}``.

        On a doc-range shard the counts are shard-local partials and
        ``DocShardedSearcher.facet_counts`` sums them — O(n_facets)
        ints per shard on the wire, never doc ids."""
        ids, _scores = self.search(query, k=10**9, mode=mode,
                                   result_cache=False)
        if ids.size:
            ids = np.sort(ids)
        out: dict[str, int] = {}
        for label in facet_terms:
            terms, _sw = analyze_query(label, self.cfg)
            cnt = 0
            if ids.size and terms:
                member = np.zeros(ids.size, dtype=bool)
                for t in terms:
                    ts = self.terms.get(t)
                    if ts is None:
                        continue
                    fids = ts.decode()[0]
                    pos = np.searchsorted(ids, fids)
                    ok = (pos < ids.size) & (
                        ids[np.minimum(pos, ids.size - 1)] == fids
                    )
                    member[pos[ok]] = True
                cnt = int(member.sum())
            out[label] = cnt
        return out

    def _search_uncached(self, query: str, k: int, mode: str, doc_filter):
        if k <= 0:
            # one guard for EVERY path (filtered, wildcard/boost,
            # phrase-clause): k<=0 means "no results requested", and
            # the inline accumulators call topk_indices directly
            # (the kernel's internal guard covers only itself)
            return np.empty(0, np.int64), np.empty(0, np.float64)
        # quoted clauses split FIRST: whitespace-token exclusion
        # parsing must never see the inside of a "..." span (and
        # -"..." is a phrase exclusion, not word exclusions)
        query, phrases, neg_phrases = self._split_phrases(query)
        query, neg_q = self._split_exclusions(query)
        if neg_q:
            # exclusions ride the doc_filter pushdown: scores of
            # surviving docs are unchanged, so 'a -b' equals dropping
            # b's docs from the full 'a' ranking. The result cache in
            # search() keys on the RAW query string (exclusions
            # included), so cached exclusion queries stay correct.
            doc_filter = self._exclusion_filter(neg_q, doc_filter)
        if neg_phrases:
            doc_filter = self._phrase_exclusion_filter(neg_phrases, doc_filter)
        if phrases:
            return self._search_with_phrases(
                query, phrases, k, mode, doc_filter
            )
        lit_q, wc_prefixes = self._split_wildcards(query)
        lit_q, boosts = self._split_boosts(lit_q)
        if wc_prefixes or boosts:
            return self._search_wildcard(
                lit_q, wc_prefixes, k, mode, doc_filter, boosts
            )
        terms, stopword_only = analyze_query(query, self.cfg)
        contributions = []
        for t in terms:
            ts = self.terms.get(t)
            if ts is None:
                if mode == "AND":
                    return np.empty(0, np.int64), np.empty(0, np.float64)
                continue
            contributions.append((t, ts))
        if not contributions:
            return np.empty(0, np.int64), np.empty(0, np.float64)

        if doc_filter is not None:
            # filter pushdown: per-term contributions of surviving
            # docs are unchanged (global df, per-posting doclen), so
            # this equals post-filtering a full unfiltered ranking
            # without ever ranking the full corpus. Scores come from
            # the FULL arrays (shared per-term score memo — warm
            # filtered/exclusion queries degenerate to gathers) and
            # the mask applies AFTER: bm25_term_scores is elementwise,
            # so mask-then-score and score-then-mask are bit-identical,
            # and both accumulation shapes below sum per doc in
            # analyzer term order exactly like the kernel's branches.
            empty = np.empty(0, np.int64), np.empty(0, np.float64)
            masked = []
            for t, ts in contributions:
                ids, tfs, dls = ts.decode()
                sc = self._tscores.get(t)
                if sc is None:
                    sc = scoring.bm25_term_scores(
                        tfs, dls, self.N, ts.df, self.avgdl,
                        self.cfg.k1, self.cfg.b,
                    )
                    self._tscores[t] = sc
                keep = doc_filter(ids)
                ids_m, sc_m = ids[keep], sc[keep]
                if ids_m.size == 0 and mode == "AND":
                    return empty
                masked.append((ids_m, sc_m))
            if mode == "AND":
                cand = masked[0][0]
                for ids_m, _sc in masked[1:]:
                    cand = _intersect_sorted(cand, ids_m)
                    if cand.size == 0:
                        return empty
                scores = np.zeros(cand.size, dtype=np.float64)
                for ids_m, sc_m in masked:
                    scores += sc_m[np.searchsorted(ids_m, cand)]
                doc_ids = cand
            else:
                masked = [m for m in masked if m[0].size]
                if not masked:
                    return empty
                ids_c = np.concatenate([m[0] for m in masked])
                sc_c = np.concatenate([m[1] for m in masked])
                doc_ids, inv = np.unique(ids_c, return_inverse=True)
                scores = np.zeros(doc_ids.size, dtype=np.float64)
                np.add.at(scores, inv, sc_c)
            if stopword_only:
                scores = scores * STOPWORD_PENALTY
            idx = scoring.topk_indices(scores, doc_ids, k)
            return doc_ids[idx], scores[idx]

        if mode == "AND":
            # candidate range pruning: intersection is bounded by the
            # tightest term's doc range — skip segments outside it
            lo = max(ts.first_doc[0] for _, ts in contributions)
            hi = min(ts.last_doc[-1] for _, ts in contributions)
            if lo > hi:
                return np.empty(0, np.int64), np.empty(0, np.float64)
            decoded = [(t, *ts.decode(lo, hi), ts.df) for t, ts in contributions]
            return score_decoded_terms(
                decoded, self.N, self.avgdl, self.cfg, k, mode, stopword_only
            )
        decoded = [(t, *ts.decode(), ts.df) for t, ts in contributions]
        ubs = [
            ts.upper_bound(self.N, self.avgdl, self.cfg.k1, self.cfg.b)
            for _, ts in contributions
        ]
        return score_decoded_terms(
            decoded, self.N, self.avgdl, self.cfg, k, mode, stopword_only,
            score_cache=self._tscores, upper_bounds=ubs,
        )

    def phrase_search(self, phrase: str, k: int = DEFAULT_TOP_K,
                      result_cache: bool = True):
        """Exact-phrase top-k using the stored position blocks (the
        positions capability of the reference's ``split_page_locs``,
        `/root/reference/src/cis5550/jobs/Indexer.java:129-169`):
        candidate docs by AND-intersection of the phrase's raw tokens,
        then adjacency verification — positions of token i+1 must
        contain (p+1) for a surviving p chain. Matching docs are
        BM25-scored over the phrase terms, tie-break (score desc,
        doc_id asc). ``result_cache``: same memoized-final-result
        policy (and the same LRU) as ``search`` — deterministic, so a
        hit is bit-identical; dies with the index on reload."""
        rkey = None
        if result_cache and k <= 10_000:
            rkey = ("res_ph", phrase, k)
            hit = self._memo.get(rkey)
            if hit is not None:
                return hit[0].copy(), hit[1].copy()
        out = self._phrase_uncached(phrase, k)
        if rkey is not None:
            self._memo.put(rkey, out, int(out[0].nbytes + out[1].nbytes + 64))
            return out[0].copy(), out[1].copy()
        return out

    def _phrase_uncached(self, phrase: str, k: int):
        from ..functions.analysis import analyze_phrase

        empty = np.empty(0, np.int64), np.empty(0, np.float64)
        terms = analyze_phrase(phrase, self.cfg)
        if not terms:
            return empty
        if not self.has_positions:
            # raise, never fabricate a correct-looking "no match": a
            # caller who forgot load_positions=True (or queried a
            # positions=False index) must hear about it
            raise ValueError(
                "phrase_search requires an index loaded with positions "
                "(LocalIndex(..., load_positions=True) on a "
                "positions-built index)"
            )
        segs = []
        for t in terms:
            ts = self.terms.get(t)
            if ts is None:
                return empty
            segs.append(ts)
        # decode each DISTINCT term once ('fox fox' shares one decode)
        dec_by_term: dict = {}
        decoded = [
            dec_by_term.setdefault(t, ts.decode_positions())
            for t, ts in zip(terms, segs)
        ]
        cand = decoded[0][0]
        for ids, *_ in decoded[1:]:
            cand = _intersect_sorted(cand, ids)
            if cand.size == 0:
                return empty
        # VECTORIZED adjacency chain over (doc, position) keys: encode
        # every candidate occurrence of term_i as doc*M + pos (sorted:
        # docs ascending, positions ascending within doc), then
        # chain_i = intersect(chain_{i-1} + 1, keys_i) — one sorted
        # intersection per phrase term instead of a Python loop per
        # candidate doc (a stopword-led phrase over a 2.4M corpus has
        # 10^5 candidates; the per-candidate loop was a >1 s p95 tail).
        # M is sized from the index's own text cap (positions are
        # 1-based token indexes < max_text_len chars), +1 bit so
        # chain+1 can never wrap into the next doc's key space — a
        # fixed 2^21 would silently cross doc boundaries on an index
        # built with a larger max_text_len.
        _M = np.int64(1) << max(21, int(self.cfg.max_text_len).bit_length() + 1)

        def _keys(t_i: int) -> np.ndarray:
            ids, _tfs, pstarts, pvals = decoded[t_i]
            sel = np.searchsorted(ids, cand)
            starts = pstarts[sel].astype(np.int64)
            lens = (pstarts[sel + 1] - pstarts[sel]).astype(np.int64)
            total = int(lens.sum())
            if total == 0:
                return np.empty(0, np.int64)
            base = np.cumsum(lens) - lens
            offs = np.arange(total, dtype=np.int64) - np.repeat(base, lens)
            pos = pvals[np.repeat(starts, lens) + offs].astype(np.int64)
            return np.repeat(cand, lens) * _M + pos

        chain = _keys(0)
        for t_i in range(1, len(decoded)):
            if chain.size == 0:
                return empty
            chain = _intersect_sorted(chain + 1, _keys(t_i))
        if chain.size == 0:
            return empty
        mids = np.unique(chain // _M)
        # score through the ONE shared kernel (score_decoded_terms'
        # AND branch), restricted to the matched docs — doclen from the
        # first term's per-posting stream (no O(N) doclen table), so a
        # scoring change (penalty, tie-break) can never silently leave
        # phrase ranking behind
        ids0, _tf0, dls0 = segs[0].decode()
        dl = dls0[np.searchsorted(ids0, mids)]
        decoded_terms = [
            (t, mids, d[1][np.searchsorted(d[0], mids)], dl, ts.df)
            for t, d, ts in zip(terms, decoded, segs)
        ]
        return score_decoded_terms(
            decoded_terms, self.N, self.avgdl, self.cfg, k, "AND", False
        )

    def explain(self, query: str, mode: str = "AND") -> dict:
        """Query debugging surface: the analyzer's term stream, per-term
        df / segment count / block-max upper bound, and which pruning
        strategy the given mode would use. Read-only; no scoring.

        Caveat on doc-sharded deployments: the volume gate here uses
        dictionary df (corpus-wide when a global dictionary is
        installed), which upper-bounds any one shard's decoded posting
        volume — so a label of "dense-accumulate"/"maxscore" means "at
        most this"; an individual shard whose local volume misses the
        DENSE_* gate still falls back to sorted-merge at decode time
        (same shared constants, evaluated on actual decoded size)."""
        # quoted clauses split FIRST (mirror _search_uncached's
        # routing exactly — the token-wise exclusion parse must never
        # see the inside of a "..." span)
        query, phrases, neg_phrases = self._split_phrases(query)
        query, neg_q = self._split_exclusions(query)
        # mirror _exclusion_filter exactly: '-pre*' / '-word~'
        # exclusions expand through the same rewrite, so the debugging
        # surface reports the terms the search actually excludes
        neg_terms: list[str] = []
        if neg_q:
            neg_lit, neg_groups = self._split_wildcards(neg_q)
            neg_terms = list(
                analyze_query(neg_lit, self.cfg)[0] if neg_lit else []
            )
            for kind, body in neg_groups:
                neg_terms.extend(self._expand_group(kind, body))
        query, wc_prefixes = self._split_wildcards(query)
        query, boosts = self._split_boosts(query)
        boosted = []
        for body, wt in boosts:
            for tb in analyze_query(body, self.cfg)[0]:
                boosted.append({
                    "term": tb, "weight": wt,
                    "df": int(ts.df) if (ts := self.terms.get(tb)) else 0,
                })
        wc_groups = [
            {"kind": kind, "body": body, "expansions": [
                {"term": t,
                 "df": int(ts.df) if (ts := self.terms.get(t)) else 0}
                for t in self._expand_group(kind, body)
            ]}
            for kind, body in wc_prefixes
        ]
        terms, stopword_only = analyze_query(query, self.cfg)
        out_terms = []
        for t in terms:
            ts = self.terms.get(t)
            if ts is None:
                out_terms.append({"term": t, "df": 0, "segments": 0})
                continue
            out_terms.append(
                {
                    "term": t,
                    "df": int(ts.df),
                    "segments": len(ts.seg_df),
                    "upper_bound": round(
                        ts.upper_bound(self.N, self.avgdl, self.cfg.k1, self.cfg.b), 6
                    ),
                    "doc_range": [int(ts.first_doc[0]), int(ts.last_doc[-1])],
                }
            )
        n_present = sum(1 for t in out_terms if t["df"])
        # mirror score_decoded_terms' actual branch order: the large-N
        # multi-term fallback picks dense vs sorted-merge by posting
        # volume at decode time, so label it by that condition rather
        # than claiming dense unconditionally. The kernel gates on the
        # query's decoded doc-id SPAN; N upper-bounds that span, so
        # these labels are conservative — a query whose postings
        # cluster in a narrow id range (or any doc-range shard) can
        # upgrade from sorted-merge to dense/maxscore at decode time.
        total_df = sum(t["df"] for t in out_terms)
        strategy = (
            # quoted queries take the phrase-clause combination path;
            # wildcard/fuzzy/boosted queries take the group path
            "phrase-clauses" if (phrases or neg_phrases) else
            "wildcard-groups" if (wc_groups or boosted) else
            # AND with ANY missing term short-circuits to empty in
            # search() before range skipping can run — label it so
            "empty" if (n_present == 0
                        or (mode == "AND" and n_present < len(out_terms)))
            else "and-range-skip" if mode == "AND"
            else "maxscore" if (
                n_present > 1
                and self.N <= MAXSCORE_MAX_N
                and (self.N <= DENSE_MIN_N
                     or DENSE_VOLUME_FACTOR * total_df >= self.N)
            )
            else "single-term-fast-path" if n_present == 1
            else (
                "dense-accumulate"
                if self.N <= max(DENSE_MIN_N, DENSE_VOLUME_FACTOR * total_df)
                else "sorted-merge-accumulate"
            )
        )
        out = {
            "query": query,
            "mode": mode,
            "terms": out_terms,
            "stopword_only": stopword_only,
            "strategy": strategy,
            "N": self.N,
            "avgdl": round(self.avgdl, 3),
        }
        if wc_groups:
            out["wildcard_groups"] = wc_groups
        if boosted:
            out["boosted_terms"] = boosted
        if phrases:
            out["phrases"] = phrases
        if neg_phrases:
            out["excluded_phrases"] = neg_phrases
        if neg_terms:
            out["excluded_terms"] = [
                {"term": t,
                 "df": int(ts.df) if (ts := self.terms.get(t)) else 0}
                for t in neg_terms
            ]
        return out

    def search_df(self, query: str, k: int = DEFAULT_TOP_K, mode: str = "AND"):
        import pandas as pd

        ids, scores = self.search(query, k, mode)
        return pd.DataFrame(
            {
                "rank": np.arange(1, len(ids) + 1, dtype=np.int32),
                "doc_id": ids,
                "score": scores,
            }
        )


def _span_local_ids(ids: np.ndarray, lo: int, cache, term: str) -> np.ndarray:
    """``ids - lo`` with a serving-path memo: for a doc-range shard the
    query-local ``lo`` of a hot term is stable across queries (it is
    the min first-doc of the query's terms, usually the shard start for
    high-df terms), so the O(df) subtract — pure memory bandwidth, a
    measured ~30 ms/query at 24M-doc shard depth — is paid once. Kept
    as intp: an int32 index array would halve the footprint but numpy
    upcast-copies non-intp fancy indexes on EVERY use, which measured
    slower than the subtract it saved.

    Keyed by TERM ONLY, value ``(lo, loc)``: keying by (term, lo) would
    cache a separate O(df) array per distinct lo — on an unsharded
    index lo varies with the rarest co-queried term, so a hot term
    could pin several df-sized duplicates and evict the decoded
    postings they shadow (whose recompute is the expensive part). One
    entry per term bounds the footprint; a differing lo recomputes and
    REPLACES (byte-accounted), so the stable doc-shard case still hits
    every time and the varying-lo case degrades to the plain subtract."""
    if cache is None:
        return ids - lo
    key = ("loc", term)
    hit = cache.get(key)
    if hit is not None and hit[0] == lo:
        return hit[1]
    loc = ids - lo
    cache.put(key, (lo, loc), int(loc.nbytes + 64))
    return loc


def score_decoded_terms(
    decoded: list,
    N: int,
    avgdl: float,
    cfg: IndexConfig,
    k: int,
    mode: str,
    stopword_only: bool,
    score_cache: dict | None = None,
    upper_bounds: list | None = None,
):
    """Shared final-scoring kernel: ``decoded`` is
    ``[(term, doc_ids_sorted, tfs, doclens, global_df), ...]`` in
    analyzer term order (doclens are the per-posting stream stored in
    the segments — no global doclen table needed). Both the in-process
    and the sharded path end here, so their results are bit-identical
    (fixed term order, float64 everywhere, (score desc, doc_id asc)
    tie-break — SURVEY.md §7.4)."""
    if not decoded or k <= 0:
        # k <= 0 means "no results requested" — a raw np.partition /
        # argpartition would raise (k=0) or silently mis-rank (k<0);
        # callers like evaluate_queries feed k from unvalidated data
        return np.empty(0, np.int64), np.empty(0, np.float64)
    # Accumulators and the dense-vs-merge gates are sized by the doc-id
    # SPAN of this query's postings, not the corpus N (which stays the
    # BM25 idf/avgdl input): a doc-range shard of a 24M-doc corpus
    # holds ids in a ~N/shards window, so global-N sizing allocated a
    # 192 MB zeroed accumulator per query per shard AND pushed shards
    # into the sorted-merge fallback (shard volume never reaches
    # N_global/4). Bit-exactness is unaffected — every branch sums
    # per-doc contributions in analyzer term order.
    nonempty = [d for d in decoded if d[1].size]
    if nonempty:
        lo = min(int(d[1][0]) for d in nonempty)
        hi = max(int(d[1][-1]) for d in nonempty)
        n_span = hi - lo + 1
    else:
        lo, n_span = 0, 0
    if mode == "AND":
        cand = decoded[0][1]
        for _, ids, _, _, _ in decoded[1:]:
            cand = _intersect_sorted(cand, ids)
            if cand.size == 0:
                return np.empty(0, np.int64), np.empty(0, np.float64)
        scores = np.zeros(cand.size, dtype=np.float64)
        pos0 = np.searchsorted(decoded[0][1], cand)
        dl = decoded[0][3][pos0]
        for _, ids, tfs, _dls, df in decoded:
            pos = np.searchsorted(ids, cand)
            scores += scoring.bm25_term_scores(
                tfs[pos], dl, N, df, avgdl, cfg.k1, cfg.b
            )
        doc_ids = cand
    elif (
        upper_bounds is not None
        and len(decoded) > 1
        and n_span <= MAXSCORE_MAX_N
        and (
            n_span <= DENSE_MIN_N
            or DENSE_VOLUME_FACTOR * sum(d[1].size for d in decoded) >= n_span
        )
        # volume gate: a few-rare-terms query spanning a huge id range
        # must not pay O(span) zeroed accumulators + per-term
        # seen-scans — the sorted-merge fallback below is exact and
        # O(V log V)
    ):
        # ---- MaxScore (the OR-mode analog of block-max WAND): process
        # terms in descending upper-bound order; once the best possible
        # total of any doc not yet seen (the remaining terms' ub sum)
        # is strictly below a LOWER BOUND on the final kth-best score,
        # remaining terms are NON-ESSENTIAL — they contribute only to
        # already-seen candidates, never adding new ones. Exact: an
        # unseen doc's total is <= that remaining sum < the bound <=
        # the true kth score, so it can neither reach nor tie the kth
        # result. The bound is the best single-term kth value among
        # admitted terms (totals only grow, so the kth final score >=
        # the kth-best contribution of any one admitted term), cached
        # per term as its sorted top scores. A true partial-sum kth
        # would stop earlier on some streams, but costs an O(span)
        # boolean gather + partition per admitted term — measured ~2x
        # this whole branch warm at 24M-doc shard depth. Admitting
        # MORE terms is always exact: the enlarged seen set only adds
        # candidates scoring strictly below the kth result. ----
        ubs = np.asarray(upper_bounds, dtype=np.float64)
        order = np.argsort(-ubs, kind="stable")
        seen = np.zeros(n_span, dtype=bool)
        rem = float(ubs.sum())
        n_seen = 0
        kth_lb = -np.inf
        admitting = True
        locs: list = [None] * len(decoded)  # span-local ids, reused below
        scs: list = [None] * len(decoded)
        for oi in order:
            term, ids, tfs, dls, df = decoded[oi]
            rem -= float(ubs[oi])
            if not admitting:
                # non-essential: scored against the seen candidates in
                # the accumulation pass below (locs[oi] stays None)
                continue
            loc = _span_local_ids(ids, lo, score_cache, term)
            locs[oi] = loc
            sc = score_cache.get(term) if score_cache is not None else None
            if sc is None:
                sc = scoring.bm25_term_scores(tfs, dls, N, df, avgdl, cfg.k1, cfg.b)
                if score_cache is not None:
                    score_cache[term] = sc
            scs[oi] = sc
            if n_seen < k:
                # incremental: count only the docs this term adds,
                # never a full O(span) seen.sum() scan per term
                n_seen += int(np.count_nonzero(~seen[loc]))
            seen[loc] = True
            if n_seen >= k and ids.size >= k:
                tkey = ("topv", term)
                tv = score_cache.get(tkey) if score_cache is not None else None
                if tv is None or (tv.size < k and tv.size < ids.size):
                    nt = min(max(k, DEFAULT_TOP_K), ids.size)
                    tv = np.sort(np.partition(sc, ids.size - nt)[ids.size - nt:])[::-1]
                    if score_cache is not None:
                        score_cache[tkey] = tv
                if k <= tv.size:
                    kth_lb = max(kth_lb, float(tv[k - 1]))
                if rem < kth_lb:
                    admitting = False
        doc_ids = np.flatnonzero(seen) + lo
        # ONE accumulation pass in the FIXED analyzer term order: the
        # ub-descending loop above decides ADMISSION only. Float
        # addition is order-sensitive at the ulp level, and the
        # module's contracts (filtered == post-filtered unfiltered,
        # doc-sharded == unsharded, bit-for-bit) hold only if every
        # path sums per-doc contributions in the same order as the
        # dense/sorted-merge branches. Span-local SCATTER throughout
        # (posting ids are unique within a term, so fancy += is exact);
        # an admitted term's postings are all in `seen`, so it needs no
        # mask at all.
        acc = np.zeros(n_span, dtype=np.float64)
        for i, (term, ids, tfs, dls, df) in enumerate(decoded):
            if locs[i] is not None:
                acc[locs[i]] += scs[i]
                continue
            loc = _span_local_ids(ids, lo, score_cache, term)
            mask = seen[loc]
            if not mask.any():
                continue
            sc = score_cache.get(term) if score_cache is not None else None
            if sc is None and score_cache is not None:
                # serving path: compute + cache the FULL array once (the
                # same policy as every other branch), so a warm query
                # stream degenerates to pure gathers
                sc = scoring.bm25_term_scores(tfs, dls, N, df, avgdl, cfg.k1, cfg.b)
                score_cache[term] = sc
            if sc is not None:
                sc_m = sc[mask]
            else:
                sc_m = scoring.bm25_term_scores(
                    tfs[mask], dls[mask], N, df, avgdl, cfg.k1, cfg.b
                )
            acc[loc[mask]] += sc_m
        scores = acc[doc_ids - lo]
    else:
        all_ids = [ids for _, ids, _, _, _ in decoded]
        all_scores = []
        for t, ids, tfs, dls, df in decoded:
            sc = score_cache.get(t) if score_cache is not None else None
            if sc is None:
                sc = scoring.bm25_term_scores(tfs, dls, N, df, avgdl, cfg.k1, cfg.b)
                if score_cache is not None:
                    score_cache[t] = sc
            all_scores.append(sc)
        if len(decoded) == 1:
            # single-term: the posting list IS the candidate set —
            # no accumulation pass at all
            doc_ids, scores = all_ids[0], all_scores[0]
        else:
            volume = sum(a.size for a in all_ids)
            if n_span <= max(DENSE_MIN_N, DENSE_VOLUME_FACTOR * volume):
                # dense accumulation by per-term SCATTER (posting ids
                # are unique within a term, so fancy += is exact and
                # sums per doc in analyzer term order — bit-identical
                # to the previous concat+bincount, which summed in
                # concatenation order). Skipping the id/score
                # concatenations saves two O(V) copies per query —
                # at 24M-doc shard depth that was ~half this branch's
                # warm cost. Per-query memory is O(span): a doc-range
                # shard pays its own width, never the corpus N. BM25
                # term scores are strictly positive, so nonzero
                # accumulated score == hit.
                acc = np.zeros(n_span, dtype=np.float64)
                for ids_t, sc_t in zip(all_ids, all_scores):
                    acc[ids_t - lo] += sc_t
                doc_ids = np.flatnonzero(acc) + lo
                scores = acc[doc_ids - lo]
            else:
                ids = np.concatenate(all_ids)
                sc = np.concatenate(all_scores)
                doc_ids, inv = np.unique(ids, return_inverse=True)
                scores = np.zeros(doc_ids.size, dtype=np.float64)
                np.add.at(scores, inv, sc)
    if stopword_only:
        scores = scores * STOPWORD_PENALTY
    idx = scoring.topk_indices(scores, doc_ids, k)
    return doc_ids[idx], scores[idx]


def shard_of(term: str, n_shards: int) -> int:
    """Deterministic term -> shard routing (stable across processes;
    not Python hash(), which is seed-randomized)."""
    import zlib

    return zlib.crc32(term.encode("utf-8")) % n_shards


def load_logical_postings(index_dir: str, with_positions: bool = True) -> dict:
    """Decode the entire index to its logical form
    ``term -> (doc_ids, tfs, positions_list)`` — the canonical
    representation used by conformance tests (physical segment
    boundaries are an execution detail and may differ between runs;
    the logical index may not)."""
    out: dict[str, list] = {}
    seg_files = sorted(glob.glob(os.path.join(index_dir, "segments", "part=*", "*.parquet")))
    for f in seg_files:
        t = pq.read_table(f)
        for i in range(t.num_rows):
            term = t["term"][i].as_py()
            out.setdefault(term, []).append(
                (
                    int(t["bucket"][i].as_py()),
                    int(t["first_doc"][i].as_py()),
                    t["doc_bytes"][i].as_py(),
                    t["tf_bytes"][i].as_py(),
                    t["pos_bytes"][i].as_py(),
                )
            )
    result = {}
    for term, segs in out.items():
        segs.sort(key=lambda s: s[1])  # first_doc orders disjoint ranges
        ids = np.concatenate([vb.delta_decode(vb.decode(s[2])) for s in segs])
        tfs = np.concatenate([vb.decode(s[3]).astype(np.int64) for s in segs])
        positions = None
        if with_positions and segs[0][4] is not None:
            pgaps = np.concatenate([vb.decode(s[4]).astype(np.int64) for s in segs])
            # per-doc spans given by tfs; cumsum with reset at span starts
            ends = np.cumsum(tfs)
            starts = ends - tfs
            positions = [
                [int(x) for x in np.cumsum(pgaps[s:e])] for s, e in zip(starts, ends)
            ]
        result[term] = (ids, tfs, positions)
    return result


def _sorted_member_filter(ex: np.ndarray, base):
    """doc_filter dropping every id present in the SORTED unique
    array ``ex``, composed over an optional ``base`` filter — the ONE
    membership closure behind both word- and phrase-exclusions (two
    drifting copies of the searchsorted+clamp idiom is how silent
    wrong-neighbor reads happen)."""

    def flt(ids, _ex=ex, _base=base):
        pos = np.searchsorted(_ex, ids)
        member = (pos < _ex.size) & (
            _ex[np.minimum(pos, _ex.size - 1)] == ids
        )
        keep = ~member
        if _base is not None:
            keep &= _base(ids)
        return keep

    return flt


def _intersect_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Intersection of two sorted unique int arrays (galloping via
    searchsorted — the vectorized analog of the reference's
    ``Set.retainAll`` candidate intersection,
    `/root/reference/src/cis5550/jobs/RankerCharles.java:264-265`)."""
    if a.size == 0 or b.size == 0:
        return np.empty(0, dtype=a.dtype)
    if a.size > b.size:
        a, b = b, a
    pos = np.searchsorted(b, a)
    pos[pos == b.size] = 0
    return a[b[pos] == a]
