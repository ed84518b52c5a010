"""HTTP query serving — the network-facing tier.

Parity with the reference's routed webserver endpoint
(`/root/reference/src/cis5550/jobs/Search.java:198` ``GET /search`` →
JSON with CORS headers, results materialized per hit from the KVS,
`Search.java:330-345`), rebuilt on the Ray serving stack: the route
handler fans the query out through a ``DocShardedSearcher`` (actors
hold the index shards; per-query network is O(k)) and materializes
snippets with row-group-pruned parquet point reads — no O(N) doc
table lives in the web tier.

Stdlib ``ThreadingHTTPServer`` only (no external framework in this
container); at cluster scale the same handler body drops into any
HTTP front end (e.g. Ray Serve) unchanged.
"""

from __future__ import annotations

import glob
import json
import os
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np
import pyarrow.parquet as pq

from .config import DEFAULT_TOP_K, RRF_K
from .functions.analysis import _SPLIT_PATTERN


# Minimal static search page (parity with the reference's HTML/JS
# client, `/root/reference/src/cis5550/client/` — served by the same
# process rather than a separate static host).
_FRONTEND = """<!doctype html>
<html><head><meta charset="utf-8"><title>transcript search</title>
<style>
 body{font-family:system-ui,sans-serif;max-width:48rem;margin:2rem auto;padding:0 1rem}
 input[type=text]{width:70%;padding:.5rem;font-size:1rem}
 button{padding:.5rem 1rem;font-size:1rem}
 .hit{margin:.8rem 0;padding:.5rem;border-left:3px solid #888}
 .meta{color:#666;font-size:.85rem}
 .spell{color:#a40;margin:.5rem 0}
 mark{background:#ffe08a;padding:0 .1em}
</style></head>
<body>
<h1>transcript search</h1>
<form id="f"><input type="text" id="q" placeholder="query" autofocus
 list="sugg" autocomplete="off">
<datalist id="sugg"></datalist>
<button>Search</button></form>
<div id="spell" class="spell"></div><div id="out"></div>
<script>
const esc = s => String(s).replace(/[&<>"']/g,
  c => ({'&':'&amp;','<':'&lt;','>':'&gt;','"':'&quot;',"'":'&#39;'}[c]));
// highlight query terms in a snippet: match on the RAW text (matching
// after esc() would split HTML entities — query 'q*' must not corrupt
// '&quot;'), then escape each segment separately and wrap matches in
// <mark>. One combined whole-word regex, single left-to-right pass (no
// nesting when one term prefixes another); 'prefix*' wildcards
// highlight any word with that prefix, '-exclusions' are skipped
const hi = (text, q) => {
  const parts = q.split(/\\s+/)
    .filter(w => w && !w.startsWith('-'))
    .map(w => {
      const wc = w.endsWith('*');
      const body = (wc ? w.slice(0, -1) : w).replace(/[^0-9a-zA-Z]/g, '');
      return body ? body + (wc ? '[0-9a-zA-Z]*' : '') : null;
    })
    .filter(Boolean);
  const s = String(text);
  if (!parts.length) return esc(s);
  const re = new RegExp('\\\\b(' + parts.join('|') + ')\\\\b', 'gi');
  let out = '', last = 0, m;
  while ((m = re.exec(s)) !== null) {
    out += esc(s.slice(last, m.index)) + '<mark>' + esc(m[0]) + '</mark>';
    last = m.index + m[0].length;
  }
  return out + esc(s.slice(last));
};
const qEl = document.getElementById('q');
qEl.addEventListener('input', async () => {
  // complete the word being typed via the dictionary-backed /suggest
  // route ('-exclusions' are left alone)
  const tail = qEl.value.split(/\\s+/).pop();
  if (!tail || tail.startsWith('-')) return;
  const r = await fetch('/suggest?q=' + encodeURIComponent(tail) + '&k=8');
  if (!r.ok) return;
  const j = await r.json();
  const head = qEl.value.slice(0, qEl.value.length - tail.length);
  document.getElementById('sugg').innerHTML = (j.suggestions || []).map(s =>
    '<option value="' + esc(head + s.term) + '">').join('');
});
document.getElementById('f').addEventListener('submit', async (ev) => {
  ev.preventDefault();
  const q = qEl.value;
  const r = await fetch('/search?query=' + encodeURIComponent(q) + '&k=20');
  const j = await r.json();
  document.getElementById('spell').textContent =
    j.spellcheck ? 'searched instead for: ' + j.spellcheck.join(' ') : '';
  // highlight against the query that actually ran (the corrected one
  // when spellcheck rewrote it)
  const effQ = j.spellcheck ? j.spellcheck.join(' ') : q;
  document.getElementById('out').innerHTML = (j.results || []).map(h =>
    '<div class="hit"><div class="meta">#' + esc(h.rank) + ' doc ' + esc(h.doc_id) +
    ' (' + esc(h.conv_id || '') + ' / turn ' + esc(h.turn_idx ?? '') + ') score ' +
    esc(h.score.toFixed(4)) + '</div><div>' +
    hi(h.snippet || '', effQ) + '</div></div>').join('') ||
    '<p>no results</p>';
});
</script></body></html>
"""


# largest k a single HTTP request may ask for — beyond this a query
# materializes corpus-scale results in one response; paginate instead
MAX_K = 1000


class DocStore:
    """doc_id -> (conv_id, turn_idx, snippet) via parquet point reads.

    Keeps only (file, min_doc, max_doc) ranges in memory; each lookup
    reads just the row groups whose doc_id statistics overlap the
    requested ids (``filters=`` push-down), so web-tier memory is
    independent of corpus size."""

    def __init__(self, index_dir: str, snippet_len: int = 160):
        self.snippet_len = snippet_len
        self.ranges: list[tuple[int, int, str]] = []
        for f in sorted(glob.glob(os.path.join(index_dir, "docs", "*.parquet"))):
            md = pq.read_metadata(f)
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                row_group = md.row_group(rg)
                for c in range(row_group.num_columns):
                    col = row_group.column(c)
                    if col.path_in_schema == "doc_id" and col.statistics and col.statistics.has_min_max:
                        s = col.statistics
                        lo = s.min if lo is None else min(lo, s.min)
                        hi = s.max if hi is None else max(hi, s.max)
            if lo is None:
                t = pq.read_table(f, columns=["doc_id"])
                if t.num_rows == 0:
                    continue
                ids = t["doc_id"].to_numpy()
                lo, hi = int(ids.min()), int(ids.max())
            self.ranges.append((int(lo), int(hi), f))
        self.ranges.sort()

    def lookup(self, doc_ids: np.ndarray) -> dict[int, dict]:
        out: dict[int, dict] = {}
        want = np.sort(np.asarray(doc_ids, dtype=np.int64))
        for lo, hi, f in self.ranges:
            sel = want[(want >= lo) & (want <= hi)]
            if sel.size == 0:
                continue
            t = pq.read_table(
                f,
                columns=["doc_id", "conv_id", "turn_idx", "text"],
                filters=[("doc_id", "in", sel.tolist())],
            )
            for i in range(t.num_rows):
                did = int(t["doc_id"][i].as_py())
                out[did] = {
                    "conv_id": t["conv_id"][i].as_py(),
                    "turn_idx": int(t["turn_idx"][i].as_py()),
                    "snippet": (t["text"][i].as_py() or "")[: self.snippet_len],
                }
        return out


def _positions_enabled(index_dir: str) -> bool:
    with open(os.path.join(index_dir, "meta.json")) as f:
        return bool(json.load(f)["config"].get("positions", False))


def _rrf_fuse(t_ids, v_ids, k: int):
    """Reciprocal-rank fusion of the text and vector rankings (shared
    by POST and GET /hybrid): rrf(d) = sum over systems of
    1/(RRF_K + rank), rounded to 6, top-k by (rrf desc, doc asc) —
    the serving twin of ops.search_ops.hybrid_rrf's fusion step."""
    fused: dict = {}
    for ranked in (t_ids.tolist(), v_ids.tolist()):
        for rank, d in enumerate(ranked, 1):
            fused[d] = fused.get(d, 0.0) + 1.0 / (RRF_K + rank)
    if not fused:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    docs = np.fromiter(fused, np.int64, count=len(fused))
    vals = np.round(
        np.fromiter((fused[int(d)] for d in docs), np.float64,
                    count=len(docs)), 6,
    )
    order = np.lexsort((docs, -vals))[:k]
    return docs[order], vals[order]


def _knn_payload(ann, vec_id, qmat, k, n_probe, *, exclude_self):
    """Shared /knn response body: run one query vector through the
    AnnSearcher and shape neighbors like /search results. The query id
    0 is a placeholder — with exclude_self=False it never filters."""
    qid = np.asarray([vec_id if vec_id is not None else 0], np.int64)
    _, vids, sims = ann.search_matrix(
        qid, qmat, k=k, exclude_self=exclude_self, n_probe=n_probe
    )
    payload = {
        "neighbors": [
            {"rank": r + 1, "vec_id": int(v), "sim": float(s)}
            for r, (v, s) in enumerate(zip(vids, sims))
        ]
    }
    if vec_id is not None:
        payload["vec_id"] = vec_id
    if n_probe is not None:
        payload["n_probe"] = n_probe
    return payload


class SearchServer:
    """``GET /search?query=...&k=...&mode=AND|OR`` -> JSON
    ``{"query": ..., "results": [{rank, doc_id, score, conv_id,
    turn_idx, snippet}, ...]}`` (plus ``"spellcheck": [...]`` when the
    query was corrected, mirroring the reference response shape,
    `Search.java:340-341`); ``GET /phrase?query=...&k=...`` -> the
    same result shape via exact-phrase matching over the stored
    positions (no spellcheck — a phrase query is exact by contract);
    ``GET /suggest?q=...&k=...`` -> prefix autocomplete from the index
    dictionary (top-k by df; ``functions/suggest.py``);
    ``GET /healthz`` -> ok. With an ``ann`` (AnnSearcher) attached,
    ``GET /knn?vec_id=...&k=...[&n_probe=...]`` returns the nearest
    neighbors of an indexed vector and ``POST /knn`` accepts
    ``{"vector": [...], "k": ...}`` for a raw query vector — the
    vector tier served through the same frontend as text search."""

    def __init__(self, index_dir: str, searcher=None, port: int = 0,
                 spellcheck: bool = True, ann=None):
        if searcher is None:
            from .pipelines.search import DocShardedSearcher

            # load positions when the index stores them, so /phrase
            # works out of the box on a default-built index
            searcher = DocShardedSearcher(
                index_dir, load_positions=_positions_enabled(index_dir)
            )
        self.searcher = searcher
        self.ann = ann  # optional AnnSearcher: enables GET/POST /knn
        self._index_dir = index_dir
        self._spellcheck = spellcheck
        self.docs = DocStore(index_dir)
        self.speller = None
        if spellcheck:
            from .functions.spellcheck import SpellChecker

            self.speller = SpellChecker.from_index(index_dir)
        # autocomplete shares the dictionary's availability with
        # spellcheck (both are corpus-derived query aids)
        self.suggester = None
        if spellcheck:
            from .functions.suggest import PrefixSuggester

            self.suggester = PrefixSuggester.from_index(index_dir)
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _json(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                # CORS parity with the reference route (Search.java:201-202)
                self.send_header("Access-Control-Allow-Origin", "*")
                self.send_header("Access-Control-Allow-Credentials", "true")
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                try:
                    self._route_get()
                except (BrokenPipeError, ConnectionResetError):
                    pass  # client went away mid-response
                except Exception as ex:  # noqa: BLE001 - HTTP boundary
                    # a backend error (dead shard actor mid-refresh, a
                    # parquet read failure) must answer 500 JSON, not
                    # slam the connection shut with no response
                    try:
                        self._json(500, {"error": f"{type(ex).__name__}: {ex}"})
                    except Exception:  # noqa: BLE001 - headers already sent
                        pass

            def do_POST(self):
                try:
                    self._route_post()
                except (BrokenPipeError, ConnectionResetError):
                    pass
                except Exception as ex:  # noqa: BLE001 - HTTP boundary
                    try:
                        self._json(500, {"error": f"{type(ex).__name__}: {ex}"})
                    except Exception:  # noqa: BLE001
                        pass

            def _route_get(self):
                u = urlparse(self.path)
                if u.path == "/healthz":
                    self._json(200, {"ok": True})
                    return
                if u.path in ("/", "/index.html"):
                    body = _FRONTEND.encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html; charset=utf-8")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                if u.path == "/explain":
                    qs = parse_qs(u.query)
                    query = (qs.get("query") or [""])[0]
                    mode = (qs.get("mode") or ["OR"])[0].upper()
                    if mode not in ("AND", "OR"):
                        self._json(400, {"error": "mode must be AND or OR"})
                        return
                    exp = getattr(outer.searcher, "explain", None)
                    if exp is None:
                        self._json(501, {"error": "searcher has no explain"})
                    else:
                        self._json(200, exp(query, mode=mode))
                    return
                if u.path == "/phrase":
                    qs = parse_qs(u.query)
                    query = (qs.get("query") or [""])[0]
                    if not query:
                        self._json(400, {"error": "missing query parameter"})
                        return
                    try:
                        k = int((qs.get("k") or [DEFAULT_TOP_K])[0])
                    except ValueError:
                        self._json(400, {"error": "k must be an integer"})
                        return
                    if not 1 <= k <= MAX_K:
                        self._json(400, {"error": f"k must be in [1, {MAX_K}]"})
                        return
                    ph = getattr(outer.searcher, "phrase", None)
                    if ph is None:
                        self._json(501, {"error": "searcher has no phrase support"})
                        return
                    try:
                        ids, scores = ph(query, k=k)
                    except ValueError as ex:
                        # only the DRIVER-side positions precondition is
                        # a client error; a shard-side ValueError (e.g.
                        # a corrupted positions block) arrives wrapped
                        # as RayTaskError(ValueError) and must surface
                        # as a 500 through the outer handler
                        import ray as _ray

                        if isinstance(ex, _ray.exceptions.RayTaskError):
                            raise
                        self._json(400, {"error": str(ex)})
                        return
                    meta = outer.docs.lookup(ids)
                    results = [
                        {
                            "rank": r + 1,
                            "doc_id": int(d),
                            "score": float(s),
                            **meta.get(int(d), {}),
                        }
                        for r, (d, s) in enumerate(zip(ids, scores))
                    ]
                    self._json(200, {"query": query, "results": results})
                    return
                if u.path == "/knn":
                    # nearest neighbors of an INDEXED vector, by id —
                    # the vector tier's twin of /search (vector
                    # fetched from the shard actors, never a client
                    # payload; POST /knn takes a raw vector instead)
                    if outer.ann is None:
                        self._json(501, {"error": "no ANN index attached"})
                        return
                    qs = parse_qs(u.query)
                    try:
                        vec_id = int((qs.get("vec_id") or [""])[0])
                        k = int((qs.get("k") or [DEFAULT_TOP_K])[0])
                        n_probe = qs.get("n_probe")
                        n_probe = int(n_probe[0]) if n_probe else None
                    except ValueError:
                        self._json(
                            400,
                            {"error": "vec_id, k, n_probe must be integers"},
                        )
                        return
                    if not 1 <= k <= MAX_K:
                        self._json(400, {"error": f"k must be in [1, {MAX_K}]"})
                        return
                    ids, mat = outer.ann.get_vectors([vec_id])
                    if ids.size == 0:
                        self._json(404, {"error": f"vec_id {vec_id} not indexed"})
                        return
                    self._json(200, _knn_payload(
                        outer.ann, vec_id, mat, k, n_probe,
                        exclude_self=True,
                    ))
                    return
                if u.path == "/hybrid":
                    # hybrid by INDEXED seed vector: 'more like doc X,
                    # constrained by this text query'. The vector list
                    # excludes the seed itself (as GET /knn does); the
                    # text ranking is untouched, so the seed can still
                    # surface via its text rank alone.
                    if outer.ann is None:
                        self._json(501, {"error": "no ANN index attached"})
                        return
                    qs = parse_qs(u.query)
                    query = (qs.get("query") or [""])[0]
                    if not query:
                        self._json(400, {"error": "missing query parameter"})
                        return
                    try:
                        vec_id = int((qs.get("vec_id") or [""])[0])
                        k = int((qs.get("k") or ["20"])[0])
                        k_sys = int((qs.get("k_sys") or ["50"])[0])
                    except ValueError:
                        self._json(
                            400,
                            {"error": "vec_id, k, k_sys must be integers"},
                        )
                        return
                    mode = (qs.get("mode") or ["OR"])[0].upper()
                    if mode not in ("AND", "OR"):
                        self._json(400, {"error": "mode must be AND or OR"})
                        return
                    if not (1 <= k <= MAX_K and 1 <= k_sys <= MAX_K):
                        self._json(
                            400,
                            {"error": f"k and k_sys must be in [1, {MAX_K}]"},
                        )
                        return
                    ids, mat = outer.ann.get_vectors([vec_id])
                    if ids.size == 0:
                        self._json(404, {"error": f"vec_id {vec_id} not indexed"})
                        return
                    t_ids, _tsc = outer.searcher.search(query, k=k_sys, mode=mode)
                    _q, v_ids, _vs = outer.ann.search_matrix(
                        np.asarray([vec_id], np.int64), mat, k=k_sys,
                        exclude_self=True,
                    )
                    docs, vals = _rrf_fuse(t_ids, v_ids, k)
                    meta = outer.docs.lookup(docs)
                    self._json(200, {
                        "query": query,
                        "vec_id": vec_id,
                        "results": [
                            {
                                "rank": r + 1,
                                "doc_id": int(d),
                                "rrf": float(v),
                                **meta.get(int(d), {}),
                            }
                            for r, (d, v) in enumerate(zip(docs, vals))
                        ],
                    })
                    return
                if u.path == "/stats":
                    self._json(200, outer.stats())
                    return
                if u.path == "/facets":
                    # facet histogram over the query's FULL match set
                    # (comma-separated facet labels) — the result-page
                    # chip counts, O(n_facets) ints from each shard
                    qs = parse_qs(u.query)
                    query = (qs.get("query") or [""])[0]
                    raw = (qs.get("facets") or [""])[0]
                    facets = [f.strip() for f in raw.split(",") if f.strip()]
                    if not query or not facets:
                        self._json(
                            400,
                            {"error": "need query and facets parameters"},
                        )
                        return
                    if len(facets) > 64:
                        self._json(400, {"error": "at most 64 facets"})
                        return
                    mode = (qs.get("mode") or ["OR"])[0].upper()
                    if mode not in ("AND", "OR"):
                        self._json(400, {"error": "mode must be AND or OR"})
                        return
                    fc = getattr(outer.searcher, "facet_counts", None)
                    if fc is None:
                        self._json(
                            501, {"error": "searcher has no facet support"}
                        )
                        return
                    self._json(200, {"query": query, "mode": mode,
                                     "facets": fc(query, facets, mode=mode)})
                    return
                if u.path == "/suggest":
                    qs = parse_qs(u.query)
                    q = (qs.get("q") or qs.get("query") or [""])[0]
                    if not q.strip():
                        self._json(400, {"error": "missing q parameter"})
                        return
                    try:
                        k = int((qs.get("k") or [10])[0])
                    except ValueError:
                        self._json(400, {"error": "k must be an integer"})
                        return
                    if not 1 <= k <= MAX_K:
                        self._json(400, {"error": f"k must be in [1, {MAX_K}]"})
                        return
                    if outer.suggester is None:
                        self._json(501, {"error": "suggestions disabled"})
                        return
                    self._json(200, {
                        "q": q,
                        "suggestions": [
                            {"term": t, "df": d}
                            for t, d in outer.suggester.suggest(q, k)
                        ],
                    })
                    return
                if u.path != "/search":
                    self._json(404, {"error": "unknown route"})
                    return
                qs = parse_qs(u.query)
                query = (qs.get("query") or [""])[0]
                if not query:
                    self._json(400, {"error": "missing query parameter"})
                    return
                try:
                    k = int((qs.get("k") or [DEFAULT_TOP_K])[0])
                except ValueError:
                    self._json(400, {"error": "k must be an integer"})
                    return
                if k < 1:
                    self._json(400, {"error": "k must be >= 1"})
                    return
                if k > MAX_K:
                    # unbounded k lets one request rank-and-materialize
                    # the whole corpus (full parquet reads, multi-GB
                    # JSON); paginate instead
                    self._json(400, {"error": f"k must be <= {MAX_K}"})
                    return
                mode = (qs.get("mode") or ["OR"])[0].upper()
                if mode not in ("AND", "OR"):
                    # an unknown mode would silently behave as OR —
                    # semantically wrong results with no signal
                    self._json(400, {"error": "mode must be AND or OR"})
                    return
                # pagination: offset skips the first N ranks. The
                # deterministic ranking (and the result cache keying on
                # (query, k, mode)) makes page N+1 consistent with page
                # N — same ordering, no duplicates across pages. The
                # depth bound applies to offset+k: one deep page costs
                # what one big-k request would, never more.
                try:
                    offset = int((qs.get("offset") or ["0"])[0])
                except ValueError:
                    self._json(400, {"error": "offset must be an integer"})
                    return
                if offset < 0:
                    self._json(400, {"error": "offset must be >= 0"})
                    return
                if offset + k > MAX_K:
                    self._json(
                        400, {"error": f"offset + k must be <= {MAX_K}"}
                    )
                    return
                corrected = None
                run_query = query
                if outer.speller is not None:
                    # correct only FREE TEXT, preserving the exact
                    # structure: quoted spans pass through verbatim
                    # (interior phrase words like '"john smyth
                    # report"' -> 'smyth' must never be rewritten),
                    # whitespace and punctuation adjacency survive
                    # the rebuild (so '-"a b"' keeps its '-' glued to
                    # the quote and stays a phrase EXCLUSION), and
                    # only plain optionally-'-'-prefixed word tokens
                    # are candidates — wildcard/fuzzy/boost markers,
                    # stray quotes and punctuation-adorned tokens are
                    # never touched. (Reference parity: Search.java
                    # spellchecks the analyzed words; the dictionary
                    # holds analyzed lowercase tokens, so correction
                    # runs on tok.lower().)
                    changed_any = False
                    out_parts: list[str] = []
                    for seg in re.split(r'("(?:[^"]*)")', query):
                        if seg.startswith('"') and seg.endswith('"') \
                                and len(seg) >= 2:
                            out_parts.append(seg)
                            continue
                        for ch in re.split(r"(\s+)", seg):
                            if not ch or ch.isspace() or not re.fullmatch(
                                r"-?[0-9A-Za-z]+", ch
                            ):
                                out_parts.append(ch)
                                continue
                            neg = ch.startswith("-")
                            body = (ch[1:] if neg else ch).lower()
                            fixed, changed = outer.speller.correct_query(
                                [body]
                            )
                            changed_any = changed_any or changed
                            out_parts.append(
                                " ".join(
                                    ("-" + w) if neg else w for w in fixed
                                ) or ch
                            )
                    if changed_any:
                        run_query = "".join(out_parts)
                        corrected = run_query.split()
                try:
                    ids, scores = outer.searcher.search(
                        run_query, k=offset + k, mode=mode
                    )
                except Exception as ex:  # noqa: BLE001
                    import ray as _ray

                    # careful classification: Ray wraps shard-side
                    # errors as RayTaskError.as_instanceof_cause(),
                    # which IS an instance of the cause type — a bare
                    # `except ValueError` would misroute every
                    # shard-side ValueError to 400. Client errors are:
                    # a DRIVER-side ValueError (positions precondition
                    # from an in-process searcher), or a shard-side
                    # ValueError on a QUOTED query (the same
                    # precondition raised inside shard actors). Any
                    # other shard-side error stays a 500, as on
                    # /phrase.
                    is_rte = isinstance(ex, _ray.exceptions.RayTaskError)
                    if not is_rte and isinstance(ex, ValueError):
                        self._json(400, {"error": str(ex)})
                        return
                    if (is_rte and '"' in run_query
                            and isinstance(getattr(ex, "cause", None),
                                           ValueError)):
                        self._json(400, {"error": str(ex.cause)})
                        return
                    raise
                ids, scores = ids[offset:], scores[offset:]
                meta = outer.docs.lookup(ids)
                results = [
                    {
                        "rank": offset + r + 1,
                        "doc_id": int(d),
                        "score": float(s),
                        **meta.get(int(d), {}),
                    }
                    for r, (d, s) in enumerate(zip(ids, scores))
                ]
                payload = {"query": query, "results": results}
                if corrected is not None:
                    # reference parity: corrected words echoed only when
                    # they differ from the query (Search.java:340-341)
                    payload["spellcheck"] = corrected
                self._json(200, payload)

            def _route_post(self):
                u = urlparse(self.path)
                if u.path == "/knn":
                    # nearest neighbors of a CLIENT-SUPPLIED vector
                    if outer.ann is None:
                        self._json(501, {"error": "no ANN index attached"})
                        return
                    try:
                        n = int(self.headers.get("Content-Length", "0"))
                        req = json.loads(self.rfile.read(n))
                        vec = np.asarray(req["vector"], np.float64)
                        k = int(req.get("k", DEFAULT_TOP_K))
                        n_probe = req.get("n_probe")
                        n_probe = int(n_probe) if n_probe is not None else None
                        if vec.ndim != 1 or vec.size == 0:
                            raise ValueError("vector must be a flat list")
                        if not 1 <= k <= MAX_K:
                            raise ValueError(f"k must be in [1, {MAX_K}]")
                    except (KeyError, TypeError, ValueError,
                            json.JSONDecodeError) as ex:
                        self._json(400, {"error": f"bad knn request: {ex}"})
                        return
                    self._json(200, _knn_payload(
                        outer.ann, None, vec[None, :], k, n_probe,
                        exclude_self=False,
                    ))
                    return
                if u.path == "/hybrid":
                    # text+vector hybrid: BM25 ranks and cosine ranks
                    # fused by reciprocal-rank fusion (the serving twin
                    # of ops.search_ops.hybrid_rrf). Requires the ANN
                    # index to share the text tier's doc_id space.
                    if outer.ann is None:
                        self._json(501, {"error": "no ANN index attached"})
                        return
                    try:
                        n = int(self.headers.get("Content-Length", "0"))
                        req = json.loads(self.rfile.read(n))
                        query = req["query"]
                        if not isinstance(query, str) or not query:
                            raise ValueError("query must be a non-empty string")
                        vec = np.asarray(req["vector"], np.float64)
                        k = int(req.get("k", 20))
                        k_sys = int(req.get("k_sys", 50))
                        mode = str(req.get("mode", "OR")).upper()
                        if vec.ndim != 1 or vec.size == 0:
                            raise ValueError("vector must be a flat list")
                        if not 1 <= k <= MAX_K:
                            raise ValueError(f"k must be in [1, {MAX_K}]")
                        if not 1 <= k_sys <= MAX_K:
                            raise ValueError(f"k_sys must be in [1, {MAX_K}]")
                        if mode not in ("AND", "OR"):
                            raise ValueError("mode must be AND or OR")
                    except (KeyError, TypeError, ValueError,
                            json.JSONDecodeError) as ex:
                        self._json(400, {"error": f"bad hybrid request: {ex}"})
                        return
                    t_ids, _tsc = outer.searcher.search(
                        query, k=k_sys, mode=mode
                    )
                    _q, v_ids, _vs = outer.ann.search_matrix(
                        np.zeros(1, np.int64), vec[None, :], k=k_sys,
                        exclude_self=False,
                    )
                    docs, vals = _rrf_fuse(t_ids, v_ids, k)
                    meta = outer.docs.lookup(docs)
                    self._json(200, {
                        "query": query,
                        "results": [
                            {
                                "rank": r + 1,
                                "doc_id": int(d),
                                "rrf": float(v),
                                **meta.get(int(d), {}),
                            }
                            for r, (d, v) in enumerate(zip(docs, vals))
                        ],
                    })
                    return
                if u.path != "/batch":
                    self._json(404, {"error": "unknown route"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    req = json.loads(self.rfile.read(n))
                    queries = [
                        (q["query"], int(q.get("k", DEFAULT_TOP_K)))
                        for q in req["queries"]
                    ]
                    mode = str(req.get("mode", "OR")).upper()
                    if mode not in ("AND", "OR"):
                        raise ValueError("mode must be AND or OR")
                    if any(k < 1 for _, k in queries):
                        raise ValueError("k must be >= 1")
                    if any(k > MAX_K for _, k in queries):
                        raise ValueError(f"k must be <= {MAX_K}")
                    if any(not isinstance(q, str) for q, _ in queries):
                        raise ValueError("query must be a string")
                except (KeyError, TypeError, ValueError, json.JSONDecodeError) as ex:
                    self._json(400, {"error": f"bad batch request: {ex}"})
                    return
                if hasattr(outer.searcher, "search_many"):
                    batch = outer.searcher.search_many(queries, mode=mode)
                else:  # plain searcher: sequential fallback
                    batch = [outer.searcher.search(q, k=k, mode=mode) for q, k in queries]
                out = []
                for (q, _k), (ids, scores) in zip(queries, batch):
                    out.append(
                        {
                            "query": q,
                            "results": [
                                {"rank": r + 1, "doc_id": int(d), "score": float(s)}
                                for r, (d, s) in enumerate(zip(ids, scores))
                            ],
                        }
                    )
                self._json(200, {"batches": out})

        self.httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self.port = self.httpd.server_address[1]
        self._thread: threading.Thread | None = None

    def start(self) -> "SearchServer":
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)

    def stats(self) -> dict:
        """Operational snapshot for ``GET /stats``: corpus stats from
        the index meta, vocabulary size from parquet FOOTERS (row
        counts only — no column data read), on-disk bytes per store,
        and the serving-tier shape. Computed per request so it tracks
        extend/compact without a refresh; everything here is O(files),
        never O(corpus)."""
        import glob as _glob

        import pyarrow.parquet as _pq

        with open(os.path.join(self._index_dir, "meta.json")) as f:
            meta = json.load(f)
        vocab = 0
        for p in _glob.glob(
            os.path.join(self._index_dir, "dictionary", "*.parquet")
        ):
            vocab += _pq.ParquetFile(p).metadata.num_rows

        def _du(sub: str) -> int:
            total = 0
            for root, _dirs, files in os.walk(
                os.path.join(self._index_dir, sub)
            ):
                for fn in files:
                    try:
                        total += os.path.getsize(os.path.join(root, fn))
                    except OSError:  # file swapped mid-walk
                        pass
            return total

        return {
            "index_dir": self._index_dir,
            "N": int(meta["N"]),
            "avgdl": round(float(meta["avgdl"]), 3),
            "vocab_terms": int(vocab),
            "bytes": {s: _du(s) for s in ("segments", "docs", "dictionary")},
            "config": meta.get("config", {}),
            "n_shards": getattr(self.searcher, "n_shards", None),
            "n_replicas": getattr(self.searcher, "n_replicas", None),
            "spellcheck": self.speller is not None,
            "suggest": self.suggester is not None,
            "ann": self.ann.meta if self.ann is not None else None,
        }

    def refresh(self) -> bool:
        """Pick up on-disk index changes across the WHOLE serving
        stack: the searcher's shard layout (blue-green), the DocStore
        ranges (so extended doc_ids get conv_id/turn_idx/snippets),
        and the spellcheck dictionary (so new vocabulary stops being
        'corrected' away). Each piece is rebuilt fully before its
        attribute is swapped, so concurrent requests see old-or-new,
        never partial state."""
        if hasattr(self.searcher, "refresh"):
            self.searcher.refresh()
        self.docs = DocStore(self._index_dir)
        if self._spellcheck:
            from .functions.spellcheck import SpellChecker
            from .functions.suggest import PrefixSuggester

            self.speller = SpellChecker.from_index(self._index_dir)
            self.suggester = PrefixSuggester.from_index(self._index_dir)
        return True


def serve(index_dir: str, port: int = 8080, n_shards: int = 4,
          n_replicas: int = 1, ann_dir: str | None = None):
    """Blocking entry point: build the sharded searcher and serve.
    ``ann_dir`` (a ``build_ann_index`` output) additionally mounts the
    vector tier's GET/POST ``/knn`` routes."""
    from .pipelines.search import DocShardedSearcher

    ann = None
    if ann_dir is not None:
        from .pipelines.ann_index import AnnSearcher

        ann = AnnSearcher(ann_dir)
    srv = SearchServer(
        index_dir,
        DocShardedSearcher(
            index_dir, n_shards, load_positions=_positions_enabled(index_dir),
            n_replicas=n_replicas,
        ),
        port,
        ann=ann,
    )
    print(f"serving index {index_dir} on http://127.0.0.1:{srv.port}/search")
    try:
        srv.httpd.serve_forever()
    except KeyboardInterrupt:
        srv.stop()
