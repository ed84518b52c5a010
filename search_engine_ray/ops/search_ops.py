"""Search-engine operators for the correctness gate.

The driver's tables contain no transcripts, so these ops derive a
transcript table deterministically from ``documents`` (the mapping is
reproduced verbatim in the oracle SQL CTE — see
``corpus.TRANSCRIPTS_FROM_DOCUMENTS_SQL``), build a real index with the
full Ray pipeline (doc-id sort, actor-pool partial build, term-shuffle
merge, varbyte segments), and answer through the real query engine.

The raw-mode BM25 entries mirror the analyzer directly in SQL; the
stemmed path (``bm25_stemmed_topk``) gets its oracle from an inline
(term, stem) VALUES map over the gate corpus's fixed vocabulary
(guarded by tests/test_gate_vocab.py). Scores are
rounded to 6 decimals and re-ranked (score_r6 desc, doc_id asc) on
BOTH sides so float summation order cannot flip the comparison.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..io import empty_dataset, read_parquet_clean, read_parquet_light

from ..config import IndexConfig, SKIP_WORDS
from .dedup import _MD5_SQL
from ..corpus import (
    TRANSCRIPTS_FROM_DOCUMENTS_SQL,
    transcripts_from_documents_batch,
)
from ..pipelines.build_index import build_index
from ..pipelines.search import evaluate_queries, materialize_results
from ..stages.query import LocalIndex
from ..state.checkpoint import atomic_dir, is_complete

_CACHE_ROOT = "/tmp/seray_cache"

_SKIP_SQL = ",".join(f"'{w}'" for w in sorted(SKIP_WORDS))

# doc_id = rank under ascending (conv_id, turn_idx) — computed with
# row_number so the oracle does not assume documents.doc_id is dense.
_TR_CTE = f"""
tr0 AS ({TRANSCRIPTS_FROM_DOCUMENTS_SQL}),
tr AS (
    SELECT row_number() OVER (ORDER BY conv_id, turn_idx) - 1 AS doc_id, *
    FROM tr0
),
toks AS (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(substr(text, 1, 10000)), '[^0-9a-z]+')) AS term
    FROM tr
),
toks_ne AS (SELECT * FROM toks WHERE term <> ''),
toks_idx AS (
    SELECT * FROM toks_ne
    WHERE length(term) <= 20 AND term NOT IN ({_SKIP_SQL})
),
docstats AS (
    SELECT tr.doc_id, COUNT(t.term) AS doclen
    FROM tr LEFT JOIN toks_ne t ON tr.doc_id = t.doc_id
    GROUP BY tr.doc_id
),
corpus AS (SELECT COUNT(*) AS N, AVG(doclen * 1.0) AS avgdl FROM docstats)
"""


def _fingerprint_file(path: str) -> str:
    st = os.stat(path)
    return hashlib.sha1(f"{path}:{st.st_size}:{st.st_mtime_ns}".encode()).hexdigest()[:16]


def transcripts_dir(sf_dir: str) -> str:
    """Materialize the derived transcript table once per sf_dir."""
    fp = _fingerprint_file(f"{sf_dir}/documents.parquet")
    out = os.path.join(_CACHE_ROOT, f"tr-{fp}")
    if not is_complete(out, fp):
        os.makedirs(_CACHE_ROOT, exist_ok=True)
        ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        with atomic_dir(out, fp, stage="transcripts") as ck:
            ds.map_batches(
                transcripts_from_documents_batch, batch_format="pyarrow"
            ).write_parquet(ck.tmp)
            import glob as _glob

            if not _glob.glob(os.path.join(ck.tmp, "*.parquet")):
                # empty source: write_parquet emits NO files, leaving a
                # dir later reads reject — pin the schema with one
                # zero-row file (the same contract as an empty index)
                import pyarrow.parquet as _pq

                _pq.write_table(
                    transcripts_from_documents_batch(
                        pa.table({"doc_id": pa.array([], pa.int64()),
                                  "text": pa.array([], pa.string())})
                    ),
                    os.path.join(ck.tmp, "empty.parquet"),
                )
            ck.commit()
    return out


def ensure_index(sf_dir: str, variant: str = "raw") -> str:
    """Build (once, resume-aware) the index over the derived
    transcripts. variant: 'raw' (no stemming — SQL-comparable) or
    'stemmed' (full reference semantics)."""
    cfg = {
        "raw": IndexConfig(stemming=False, positions=False),
        "rawpos": IndexConfig(stemming=False, positions=True),
        "roletool": IndexConfig(stemming=False, positions=False, index_role_tool=True),
        "prior": IndexConfig(stemming=False, positions=False, store_prior=True),
        "stemmed": IndexConfig(),
    }[variant]
    tdir = transcripts_dir(sf_dir)
    idx = os.path.join(_CACHE_ROOT, f"idx-{os.path.basename(tdir)[3:]}-{variant}")
    build_index(tdir, idx, cfg, n_partitions=2)
    return idx


# ---- doc-id assignment + doclen as a checkable op ----

def transcripts_docids(sf_dir: str):
    idx = ensure_index(sf_dir, "raw")
    import glob

    import pyarrow.parquet as pq

    t = pq.read_table(
        sorted(glob.glob(os.path.join(idx, "docs", "*.parquet"))),
        columns=["conv_id", "turn_idx", "doc_id", "doclen"],
    )
    return t.set_column(
        t.schema.get_field_index("doclen"), "doclen", t["doclen"].cast(pa.int64())
    )


SQL_TRANSCRIPTS_DOCIDS = f"""
WITH {_TR_CTE}
SELECT tr.conv_id, tr.turn_idx, tr.doc_id, ds.doclen
FROM tr JOIN docstats ds ON tr.doc_id = ds.doc_id
"""


# ---- decoded postings of probe terms, straight from the segments ----

_PROBE_TERMS = ["hash", "join", "scan", "window", "vector", "customer"]


def postings_probe(sf_dir: str):
    idx = ensure_index(sf_dir, "raw")
    li = LocalIndex(idx)
    terms_out, docs_out, tfs_out = [], [], []
    for term in _PROBE_TERMS:
        ids, tfs = li.term_postings(term)
        terms_out.extend([term] * len(ids))
        docs_out.extend(ids.tolist())
        tfs_out.extend(tfs.tolist())
    return pa.table(
        {
            "term": pa.array(terms_out, pa.string()),
            "doc_id": pa.array(docs_out, pa.int64()),
            "tf": pa.array(tfs_out, pa.int64()),
        }
    )


SQL_POSTINGS_PROBE = f"""
WITH {_TR_CTE}
SELECT term, doc_id, COUNT(*) AS tf
FROM toks_idx
WHERE term IN ({",".join(f"'{t}'" for t in _PROBE_TERMS)})
GROUP BY term, doc_id
"""


# ---- filtered (faceted) retrieval: BM25 restricted by metadata ----

def bm25_topk_filtered(sf_dir: str):
    """BM25 OR top-k restricted to USER turns (doc_id % 3 == 0 in the
    derived transcripts — the role facet): the doc_filter predicate
    runs before the top-k cut, so a filtered search equals
    post-filtering the full ranking — faceted retrieval without
    per-facet indexes."""
    idx = ensure_index(sf_dir, "raw")
    li = LocalIndex(idx)
    qid_out, doc_out, score_out = [], [], []
    user_turns = lambda ids: ids % 3 == 0
    for qid, q in _BM25_QUERIES:
        ids, scores = li.search(q, k=10**9, mode="OR", doc_filter=user_turns)
        r6 = np.round(scores, 6)
        order = np.lexsort((ids, -r6))[:_K]
        qid_out.extend([qid] * len(order))
        doc_out.extend(ids[order].tolist())
        score_out.extend(r6[order].tolist())
    return pa.table(
        {
            "query_id": pa.array(qid_out, pa.int64()),
            "doc_id": pa.array(doc_out, pa.int64()),
            "score": pa.array(score_out, pa.float64()),
        }
    )


def _bm25_filtered_sql() -> str:
    """The OR-mode skeleton with the user-turn facet applied before the
    per-query rank cut (mirrors doc_filter-before-topk)."""
    base = _bm25_sql(False)
    marker = "FROM scored \n)"
    assert marker in base, "bm25 skeleton changed"
    return base.replace(marker, "FROM scored WHERE doc_id % 3 = 0\n)")


# ---- role/tool-token indexing (URL-token analog) as a checkable op ----

_RT_PROBE = ["user", "assistant", "tool", "search", "hash"]


def postings_probe_roletool(sf_dir: str):
    """Decoded postings of probe terms from an index built with
    ``index_role_tool=True`` — the analog of the reference's URL-token
    indexing (host/path tokens prepended to the page text,
    Indexer.java:236-238): every turn's role and tool ride in its token
    stream, so facet-style queries ("assistant", "search") hit real
    posting lists."""
    idx = ensure_index(sf_dir, "roletool")
    li = LocalIndex(idx)
    terms_out, docs_out, tfs_out = [], [], []
    for term in _RT_PROBE:
        ids, tfs = li.term_postings(term)
        terms_out.extend([term] * len(ids))
        docs_out.extend(ids.tolist())
        tfs_out.extend(tfs.tolist())
    return pa.table(
        {
            "term": pa.array(terms_out, pa.string()),
            "doc_id": pa.array(docs_out, pa.int64()),
            "tf": pa.array(tfs_out, pa.int64()),
        }
    )


# tokens come from 'role tool text' joined with single spaces, with the
# 10k-char truncation applied to the JOINED string (the engine prepends
# before tokenization)
SQL_POSTINGS_ROLETOOL = f"""
WITH tr0 AS ({TRANSCRIPTS_FROM_DOCUMENTS_SQL}),
tr AS (
    SELECT row_number() OVER (ORDER BY conv_id, turn_idx) - 1 AS doc_id,
           role || ' ' || tool || ' ' || text AS rt_text
    FROM tr0
),
toks AS (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(substr(rt_text, 1, 10000)), '[^0-9a-z]+')) AS term
    FROM tr
),
toks_idx AS (
    SELECT * FROM toks
    WHERE term <> '' AND length(term) <= 20 AND term NOT IN ({_SKIP_SQL})
)
SELECT term, doc_id, COUNT(*) AS tf
FROM toks_idx
WHERE term IN ({",".join(f"'{t}'" for t in _RT_PROBE)})
GROUP BY term, doc_id
"""


# ---- faceted result counts: per-facet histogram over a query's FULL
#      match set (role/tool chips on the result page) ----

_FACET_LABELS = ["user", "assistant", "search", "hash"]
_FACET_QUERIES = [(0, "hash join"), (1, "scan window vector"),
                  (2, "data stream"), (3, "merge batch filter")]


def facet_counts(sf_dir: str):
    """For each query, how many of its OR-mode matches contain each
    facet token, through the role/tool-indexed build (roles and tools
    ride in the token stream, so facet membership is a posting-list
    intersection — counted shard-locally in the serving tier,
    ``stages/query.py facet_counts``)."""
    idx = ensure_index(sf_dir, "roletool")
    li = LocalIndex(idx)
    qid_out, facet_out, n_out = [], [], []
    for qid, q in _FACET_QUERIES:
        fc = li.facet_counts(q, _FACET_LABELS, mode="OR")
        for f in _FACET_LABELS:
            qid_out.append(qid)
            facet_out.append(f)
            n_out.append(fc[f])
    return pa.table(
        {
            "query_id": pa.array(qid_out, pa.int64()),
            "facet": pa.array(facet_out, pa.string()),
            "n": pa.array(n_out, pa.int64()),
        }
    )


def _facet_sql() -> str:
    qvals = ", ".join(
        f"({qid}, '{term}')" for qid, q in _FACET_QUERIES for term in q.split()
    )
    fvals = ", ".join(f"('{f}')" for f in _FACET_LABELS)
    return f"""
WITH tr0 AS ({TRANSCRIPTS_FROM_DOCUMENTS_SQL}),
tr AS (
    SELECT row_number() OVER (ORDER BY conv_id, turn_idx) - 1 AS doc_id,
           role || ' ' || tool || ' ' || text AS rt_text
    FROM tr0
),
toks AS (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(substr(rt_text, 1, 10000)), '[^0-9a-z]+')) AS term
    FROM tr
),
toks_idx AS (
    SELECT * FROM toks
    WHERE term <> '' AND length(term) <= 20 AND term NOT IN ({_SKIP_SQL})
),
qterms(query_id, term) AS (VALUES {qvals}),
facets(facet) AS (VALUES {fvals}),
cand AS (
    SELECT DISTINCT q.query_id, t.doc_id
    FROM qterms q JOIN toks_idx t USING (term)
),
hit AS (
    SELECT DISTINCT c.query_id, f.facet, c.doc_id
    FROM cand c
    JOIN toks_idx t2 ON t2.doc_id = c.doc_id
    JOIN facets f ON t2.term = f.facet
),
agg AS (
    SELECT query_id, facet, COUNT(*) AS n FROM hit GROUP BY query_id, facet
)
SELECT CAST(q.query_id AS BIGINT) AS query_id, f.facet,
       CAST(COALESCE(a.n, 0) AS BIGINT) AS n
FROM (SELECT DISTINCT query_id FROM qterms) q
CROSS JOIN facets f
LEFT JOIN agg a ON a.query_id = q.query_id AND a.facet = f.facet
"""


# ---- incremental indexing (extend_index) as a checkable op ----

_EXT_FRAC = 0.6  # share of conversations in the base build


def _split_transcripts(sf_dir: str) -> tuple[str, str]:
    """Cache a prefix/suffix split of the derived transcripts in
    (conv_id, turn_idx) order: ``base`` holds the first ~60% of
    conversations, ``ext`` the rest — the append-only stream shape
    ``extend_index`` requires (every new key sorts after every old
    key). Boundary picking reads one row per CONVERSATION via
    ``unique`` (at 100 TB the boundary comes from partition stats or a
    sample instead; the split itself stays a streamed filter+write)."""
    fp = _fingerprint_file(f"{sf_dir}/documents.parquet")
    base = os.path.join(_CACHE_ROOT, f"trbase-{fp}")
    ext = os.path.join(_CACHE_ROOT, f"trext-{fp}")
    if is_complete(base, fp) and is_complete(ext, fp):
        return base, ext
    tdir = transcripts_dir(sf_dir)
    convs = sorted(read_parquet_light(tdir, columns=["conv_id"]).unique("conv_id"))
    boundary = convs[max(1, int(len(convs) * _EXT_FRAC))] if len(convs) > 1 else None

    def side(keep_base: bool):
        ds = read_parquet_clean(tdir)
        if boundary is None:  # single conversation: everything is base
            if keep_base:
                return ds
            return ds.map_batches(lambda t: t.slice(0, 0), batch_format="pyarrow")
        op = pc.less if keep_base else pc.greater_equal
        return ds.map_batches(
            lambda t: t.filter(op(t["conv_id"], pa.scalar(boundary))),
            batch_format="pyarrow",
        )

    os.makedirs(_CACHE_ROOT, exist_ok=True)
    for out, keep_base in ((base, True), (ext, False)):
        if not is_complete(out, fp):
            with atomic_dir(out, fp, stage="trsplit") as ck:
                side(keep_base).write_parquet(ck.tmp)
                ck.commit()
    return base, ext


def ensure_extended_index(sf_dir: str) -> str:
    """Index built on the base split then ``extend_index``-ed with the
    tail — the incremental-indexing analog of the reference's
    load_index/crawl_old skip (`Indexer.java:196-231`). Cached behind a
    marker: an extended index must never be re-fed to ``build_index``
    (its docs fingerprint changed by design), so a partial cache is
    rebuilt from scratch instead of resumed."""
    import shutil

    from ..pipelines.build_index import extend_index

    fp = _fingerprint_file(f"{sf_dir}/documents.parquet")
    idx = os.path.join(_CACHE_ROOT, f"idxext-{fp}")
    marker = os.path.join(idx, ".gate_extended")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == fp:
                return idx
    base, ext = _split_transcripts(sf_dir)
    shutil.rmtree(idx, ignore_errors=True)
    cfg = IndexConfig(stemming=False, positions=False)
    build_index(base, idx, cfg, n_partitions=2)
    extend_index(idx, ext, n_partitions=1)
    with open(marker + ".tmp", "w") as f:
        f.write(fp)
    os.replace(marker + ".tmp", marker)
    return idx


def postings_extend(sf_dir: str):
    """Decoded postings of the probe terms from the EXTENDED index —
    gate-checked against the same full-corpus oracle as
    ``postings_probe``, so build-on-subset + extend must be
    postings-identical to a full rebuild (doc_ids keep the global
    (conv_id, turn_idx)-rank semantics by continuing at N)."""
    idx = ensure_extended_index(sf_dir)
    li = LocalIndex(idx)
    terms_out, docs_out, tfs_out = [], [], []
    for term in _PROBE_TERMS:
        ids, tfs = li.term_postings(term)
        terms_out.extend([term] * len(ids))
        docs_out.extend(ids.tolist())
        tfs_out.extend(tfs.tolist())
    return pa.table(
        {
            "term": pa.array(terms_out, pa.string()),
            "doc_id": pa.array(docs_out, pa.int64()),
            "tf": pa.array(tfs_out, pa.int64()),
        }
    )


# ---- BM25 top-k through the real engine, SQL-mirrored ----

_BM25_QUERIES = [
    (0, "hash join"),
    (1, "scan window vector"),
    (2, "data stream"),
    (3, "merge batch filter"),
]
_K = 200


def _bm25(sf_dir: str, mode: str):
    idx = ensure_index(sf_dir, "raw")
    li = LocalIndex(idx)
    qid_out, doc_out, score_out = [], [], []
    for qid, q in _BM25_QUERIES:
        ids, scores = li.search(q, k=10**9, mode=mode)
        r6 = np.round(scores, 6)
        order = np.lexsort((ids, -r6))[:_K]
        qid_out.extend([qid] * len(order))
        doc_out.extend(ids[order].tolist())
        score_out.extend(r6[order].tolist())
    return pa.table(
        {
            "query_id": pa.array(qid_out, pa.int64()),
            "doc_id": pa.array(doc_out, pa.int64()),
            "score": pa.array(score_out, pa.float64()),
        }
    )


def bm25_topk_and(sf_dir: str):
    return _bm25(sf_dir, "AND")


def bm25_topk_or(sf_dir: str):
    return _bm25(sf_dir, "OR")


# ---- NOT-term (exclusion) retrieval: 'a b -c' drops every doc
#      containing c before the top-k cut (boolean-NOT widening of the
#      engine's AND/OR surface; exclusions are parsed by
#      LocalIndex._split_exclusions and ride the doc_filter pushdown,
#      so they distribute shard-locally over DocShardedSearcher) ----

_NOT_QUERIES = [
    (0, "hash join -window"),
    (1, "scan vector -merge"),
    (2, "data stream -customer"),
    (3, "merge batch -filter -sort"),
]


def bm25_topk_not(sf_dir: str):
    idx = ensure_index(sf_dir, "raw")
    li = LocalIndex(idx)
    qid_out, doc_out, score_out = [], [], []
    for qid, q in _NOT_QUERIES:
        ids, scores = li.search(q, k=10**9, mode="OR")
        r6 = np.round(scores, 6)
        order = np.lexsort((ids, -r6))[:_K]
        qid_out.extend([qid] * len(order))
        doc_out.extend(ids[order].tolist())
        score_out.extend(r6[order].tolist())
    return pa.table(
        {
            "query_id": pa.array(qid_out, pa.int64()),
            "doc_id": pa.array(doc_out, pa.int64()),
            "score": pa.array(score_out, pa.float64()),
        }
    )


def _bm25_not_sql() -> str:
    pos_vals, neg_vals = [], []
    for qid, q in _NOT_QUERIES:
        for w in q.split():
            (neg_vals if w.startswith("-") else pos_vals).append(
                f"({qid}, '{w.lstrip('-')}')"
            )
    return f"""
WITH {_TR_CTE},
qterms(query_id, term) AS (VALUES {", ".join(pos_vals)}),
nterms(query_id, term) AS (VALUES {", ".join(neg_vals)}),
tf AS (
    SELECT q.query_id, t.term, t.doc_id, COUNT(*) AS tf
    FROM qterms q JOIN toks_idx t ON q.term = t.term
    GROUP BY q.query_id, t.term, t.doc_id
),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks_idx GROUP BY term),
excl AS (
    SELECT DISTINCT n.query_id, t.doc_id
    FROM nterms n JOIN toks_idx t ON n.term = t.term
),
contrib AS (
    SELECT tf.query_id, tf.doc_id,
           ln((c.N - df.df + 0.5) / (df.df + 0.5) + 1)
           * (tf.tf * (1.2 + 1)) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * ds.doclen / c.avgdl)) AS s
    FROM tf
    JOIN df ON tf.term = df.term
    JOIN docstats ds ON tf.doc_id = ds.doc_id
    CROSS JOIN corpus c
),
scored AS (
    SELECT query_id, doc_id, round(SUM(s), 6) AS score
    FROM contrib GROUP BY query_id, doc_id
),
ranked AS (
    SELECT s.query_id, s.doc_id, s.score,
           row_number() OVER (PARTITION BY s.query_id
                              ORDER BY s.score DESC, s.doc_id ASC) AS rn
    FROM scored s
    WHERE NOT EXISTS (SELECT 1 FROM excl e
                      WHERE e.query_id = s.query_id AND e.doc_id = s.doc_id)
)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score FROM ranked WHERE rn <= {_K}
"""


# ---- wildcard (prefix*) retrieval: each 'p*' token is a GROUP of
#      dictionary expansions (cap WILDCARD_MAX_EXPANSIONS by df desc /
#      term asc, stopwords never re-admitted — the engine's multi-term
#      rewrite, LocalIndex.expand_prefix). AND mode: every literal AND
#      >= 1 expansion per group; matched terms score once each. The
#      't*' probe exercises the stopword drop ('the' never expands). ----

_WC_QUERIES = [
    # (query_id, [literal terms], [group prefixes])
    (0, ["hash"], ["j"]),
    (1, ["merge"], ["s"]),
    (2, ["data"], ["v"]),
    (3, ["query"], ["t"]),
    (4, ["order"], ["c", "f"]),
]


def bm25_topk_wildcard(sf_dir: str):
    idx = ensure_index(sf_dir, "raw")
    li = LocalIndex(idx)
    qid_out, doc_out, score_out = [], [], []
    for qid, lits, prefs in _WC_QUERIES:
        q = " ".join(lits + [p + "*" for p in prefs])
        ids, scores = li.search(q, k=10**9, mode="AND")
        r6 = np.round(scores, 6)
        order = np.lexsort((ids, -r6))[:_K]
        qid_out.extend([qid] * len(order))
        doc_out.extend(ids[order].tolist())
        score_out.extend(r6[order].tolist())
    return pa.table(
        {
            "query_id": pa.array(qid_out, pa.int64()),
            "doc_id": pa.array(doc_out, pa.int64()),
            "score": pa.array(score_out, pa.float64()),
        }
    )


def _bm25_wildcard_sql() -> str:
    from ..config import STOPWORDS, WILDCARD_MAX_EXPANSIONS

    # SQL-escape: the reference stoplist contains "it's"
    stop_sql = ",".join("'{}'".format(w.replace("'", "''")) for w in sorted(STOPWORDS))
    lit_vals = ", ".join(
        f"({qid}, '{t}')" for qid, lits, _p in _WC_QUERIES for t in lits
    )
    nlit_vals = ", ".join(f"({qid}, {len(lits)})" for qid, lits, _p in _WC_QUERIES)
    grp_vals = ", ".join(
        f"({qid}, {gi}, '{p}')"
        for qid, _l, prefs in _WC_QUERIES
        for gi, p in enumerate(prefs)
    )
    ngrp_vals = ", ".join(f"({qid}, {len(prefs)})" for qid, _l, prefs in _WC_QUERIES)
    return f"""
WITH {_TR_CTE},
qlit(query_id, term) AS (VALUES {lit_vals}),
nlit(query_id, n) AS (VALUES {nlit_vals}),
qgrp(query_id, gid, prefix) AS (VALUES {grp_vals}),
ngrp(query_id, n) AS (VALUES {ngrp_vals}),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks_idx GROUP BY term),
expansions AS (
    SELECT query_id, gid, term FROM (
        SELECT q.query_id, q.gid, d.term,
               row_number() OVER (PARTITION BY q.query_id, q.gid
                                  ORDER BY d.df DESC, d.term ASC) AS rn
        FROM qgrp q JOIN df d ON d.term LIKE q.prefix || '%'
        WHERE d.term NOT IN ({stop_sql})
    ) WHERE rn <= {WILDCARD_MAX_EXPANSIONS}
),
lit_hits AS (
    SELECT l.query_id, t.doc_id, COUNT(DISTINCT l.term) AS c
    FROM qlit l JOIN toks_idx t ON l.term = t.term
    GROUP BY l.query_id, t.doc_id
),
lit_ok AS (
    SELECT h.query_id, h.doc_id
    FROM lit_hits h JOIN nlit n ON n.query_id = h.query_id AND h.c = n.n
),
grp_hits AS (
    SELECT DISTINCT e.query_id, e.gid, t.doc_id
    FROM expansions e JOIN toks_idx t ON e.term = t.term
),
grp_ok AS (
    SELECT g.query_id, g.doc_id
    FROM (SELECT query_id, doc_id, COUNT(DISTINCT gid) AS c
          FROM grp_hits GROUP BY query_id, doc_id) g
    JOIN ngrp n ON n.query_id = g.query_id AND g.c = n.n
),
cand AS (
    SELECT l.query_id, l.doc_id
    FROM lit_ok l JOIN grp_ok g
      ON g.query_id = l.query_id AND g.doc_id = l.doc_id
),
terms_all AS (
    SELECT DISTINCT query_id, term FROM (
        SELECT query_id, term FROM qlit
        UNION ALL
        SELECT query_id, term FROM expansions
    )
),
tf AS (
    SELECT q.query_id, t.term, t.doc_id, COUNT(*) AS tf
    FROM terms_all q
    JOIN toks_idx t ON q.term = t.term
    JOIN cand c ON c.query_id = q.query_id AND c.doc_id = t.doc_id
    GROUP BY q.query_id, t.term, t.doc_id
),
contrib AS (
    SELECT tf.query_id, tf.doc_id,
           ln((c.N - df.df + 0.5) / (df.df + 0.5) + 1)
           * (tf.tf * (1.2 + 1)) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * ds.doclen / c.avgdl)) AS s
    FROM tf
    JOIN df ON tf.term = df.term
    JOIN docstats ds ON tf.doc_id = ds.doc_id
    CROSS JOIN corpus c
),
scored AS (
    SELECT query_id, doc_id, round(SUM(s), 6) AS score
    FROM contrib GROUP BY query_id, doc_id
),
ranked AS (
    SELECT query_id, doc_id, score,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id ASC) AS rn
    FROM scored
)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score FROM ranked WHERE rn <= {_K}
"""


# ---- quoted-phrase clauses inside general queries: '"hash join"
#      filter' requires the exact phrase (position-verified) AND the
#      literal, scoring phrase terms + literals together
#      (stages/query.py _search_with_phrases). The SQL twin matches
#      phrases by regex over the raw text (the independent mechanism
#      _phrase_sql pioneered) and sums the same contributions. Probe
#      terms never overlap between a phrase and the remainder, so the
#      oracle's per-(term, doc) tf collapse is exact. ----

_QUOTED_QUERIES = [
    # (query_id, [phrases], [literal terms])
    (0, ["hash join"], ["filter"]),
    (1, ["group by"], []),                 # phrase-only
    (2, ["sort merge join"], ["batch"]),
    (3, ["the data"], ["scan"]),           # stopword-bearing phrase
]


def bm25_topk_quoted(sf_dir: str):
    idx = ensure_index(sf_dir, "rawpos")
    li = LocalIndex(idx, load_positions=True)
    qid_out, doc_out, score_out = [], [], []
    for qid, phrases, lits in _QUOTED_QUERIES:
        q = " ".join([f'"{p}"' for p in phrases] + lits)
        ids, scores = li.search(q, k=10**9, mode="AND")
        r6 = np.round(scores, 6)
        order = np.lexsort((ids, -r6))[:_K]
        qid_out.extend([qid] * len(order))
        doc_out.extend(ids[order].tolist())
        score_out.extend(r6[order].tolist())
    return pa.table(
        {
            "query_id": pa.array(qid_out, pa.int64()),
            "doc_id": pa.array(doc_out, pa.int64()),
            "score": pa.array(score_out, pa.float64()),
        }
    )


def _bm25_quoted_sql() -> str:
    lit_vals = ", ".join(
        f"({qid}, '{t}')"
        for qid, _p, lits in _QUOTED_QUERIES for t in lits
    ) or "(-1, '')"
    nlit_vals = ", ".join(
        f"({qid}, {len(lits)})" for qid, _p, lits in _QUOTED_QUERIES
    )
    ph_vals, pt_vals, nph_vals = [], [], []
    for qid, phrases, _l in _QUOTED_QUERIES:
        nph_vals.append(f"({qid}, {len(phrases)})")
        for pid, p in enumerate(phrases):
            toks = p.lower().split()
            pat = "(^|[^0-9a-z])" + "[^0-9a-z]+".join(toks) + "([^0-9a-z]|$)"
            ph_vals.append(f"({qid}, {pid}, '{pat}')")
            pt_vals.extend(f"({qid}, '{t}')" for t in toks)
    return f"""
WITH {_TR_CTE},
qlit(query_id, term) AS (VALUES {lit_vals}),
nlit(query_id, n) AS (VALUES {nlit_vals}),
qph(query_id, pid, pattern) AS (VALUES {", ".join(ph_vals)}),
nph(query_id, n) AS (VALUES {", ".join(nph_vals)}),
qpterms(query_id, term) AS (VALUES {", ".join(pt_vals)}),
ph_match AS (
    SELECT p.query_id, p.pid, tr.doc_id
    FROM qph p
    JOIN tr ON regexp_matches(lower(substring(tr.text, 1, 10000)), p.pattern)
),
ph_ok AS (
    SELECT m.query_id, m.doc_id
    FROM (SELECT query_id, doc_id, COUNT(DISTINCT pid) AS c
          FROM ph_match GROUP BY query_id, doc_id) m
    JOIN nph n ON n.query_id = m.query_id AND m.c = n.n
),
lit_hits AS (
    SELECT l.query_id, t.doc_id, COUNT(DISTINCT l.term) AS c
    FROM qlit l JOIN toks_idx t ON l.term = t.term
    GROUP BY l.query_id, t.doc_id
),
cand AS (
    SELECT p.query_id, p.doc_id
    FROM ph_ok p
    JOIN nlit nl ON nl.query_id = p.query_id
    LEFT JOIN lit_hits lh
      ON lh.query_id = p.query_id AND lh.doc_id = p.doc_id
    WHERE nl.n = 0 OR lh.c = nl.n
),
all_terms AS (
    SELECT query_id, term FROM qlit
    UNION ALL
    SELECT query_id, term FROM qpterms
),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks_idx GROUP BY term),
tf AS (
    SELECT a.query_id, a.term, t.doc_id, COUNT(*) AS tf
    FROM (SELECT DISTINCT query_id, term FROM all_terms) a
    JOIN toks_idx t ON a.term = t.term
    JOIN cand c ON c.query_id = a.query_id AND c.doc_id = t.doc_id
    GROUP BY a.query_id, a.term, t.doc_id
),
contrib AS (
    SELECT tf.query_id, tf.doc_id,
           ln((c.N - df.df + 0.5) / (df.df + 0.5) + 1)
           * (tf.tf * (1.2 + 1)) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * ds.doclen / c.avgdl)) AS s
    FROM tf
    JOIN df ON tf.term = df.term
    JOIN docstats ds ON tf.doc_id = ds.doc_id
    CROSS JOIN corpus c
),
scored AS (
    SELECT query_id, doc_id, round(SUM(s), 6) AS score
    FROM contrib GROUP BY query_id, doc_id
),
ranked AS (
    SELECT query_id, doc_id, score,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id ASC) AS rn
    FROM scored
)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score FROM ranked WHERE rn <= {_K}
"""


# ---- boosted (term^W) retrieval: Lucene's '^' syntax — a boosted
#      term's BM25 contribution scales by W; membership semantics
#      (AND requirement) are unchanged. Weights ride outside the
#      shared kernel (stages/query.py weighted accumulator), and the
#      SQL twin multiplies each contribution by the same literal. ----

_BOOST_QUERIES = [
    # (query_id, [(term, weight)]) — weight 1.0 renders as a plain term
    (0, [("hash", 1.0), ("join", 2.0)]),
    (1, [("merge", 1.0), ("scan", 0.5)]),
    (2, [("data", 1.0), ("vector", 3.0), ("stream", 1.0)]),
    (3, [("window", 2.0), ("filter", 0.5)]),
]


def bm25_topk_boosted(sf_dir: str):
    idx = ensure_index(sf_dir, "raw")
    li = LocalIndex(idx)
    qid_out, doc_out, score_out = [], [], []
    for qid, terms in _BOOST_QUERIES:
        q = " ".join(
            t if w == 1.0 else f"{t}^{w!r}" for t, w in terms
        )
        ids, scores = li.search(q, k=10**9, mode="AND")
        r6 = np.round(scores, 6)
        order = np.lexsort((ids, -r6))[:_K]
        qid_out.extend([qid] * len(order))
        doc_out.extend(ids[order].tolist())
        score_out.extend(r6[order].tolist())
    return pa.table(
        {
            "query_id": pa.array(qid_out, pa.int64()),
            "doc_id": pa.array(doc_out, pa.int64()),
            "score": pa.array(score_out, pa.float64()),
        }
    )


def _bm25_boosted_sql() -> str:
    values = ", ".join(
        f"({qid}, '{t}', {w!r})"
        for qid, terms in _BOOST_QUERIES
        for t, w in terms
    )
    return f"""
WITH {_TR_CTE},
qterms(query_id, term, w) AS (VALUES {values}),
qsize AS (SELECT query_id, COUNT(*) AS nt FROM qterms GROUP BY query_id),
tf AS (
    SELECT q.query_id, t.term, t.doc_id, COUNT(*) AS tf
    FROM qterms q JOIN toks_idx t ON q.term = t.term
    GROUP BY q.query_id, t.term, t.doc_id
),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks_idx GROUP BY term),
contrib AS (
    SELECT tf.query_id, tf.doc_id,
           ln((c.N - df.df + 0.5) / (df.df + 0.5) + 1)
           * (tf.tf * (1.2 + 1)) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * ds.doclen / c.avgdl))
           * q.w AS s
    FROM tf
    JOIN qterms q ON q.query_id = tf.query_id AND q.term = tf.term
    JOIN df ON tf.term = df.term
    JOIN docstats ds ON tf.doc_id = ds.doc_id
    CROSS JOIN corpus c
),
scored AS (
    SELECT query_id, doc_id, round(SUM(s), 6) AS score, COUNT(*) AS nterms
    FROM contrib GROUP BY query_id, doc_id
),
ranked AS (
    SELECT s.query_id, s.doc_id, s.score,
           row_number() OVER (PARTITION BY s.query_id
                              ORDER BY s.score DESC, s.doc_id ASC) AS rn
    FROM scored s JOIN qsize USING (query_id) WHERE nterms = qsize.nt
)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score FROM ranked WHERE rn <= {_K}
"""


# ---- fuzzy (term~) retrieval: each 'w~' token is a GROUP of
#      dictionary terms within Damerau-Levenshtein distance 1 (same
#      group-AND semantics, stopword drop and df-desc/term-asc cap as
#      the wildcard rewrite; LocalIndex.expand_fuzzy). The oracle's
#      damerau_levenshtein() mirrors functions.spellcheck._within1
#      (both count a transposition as one edit). ----

_FZ_QUERIES = [
    # (query_id, [literal terms], [fuzzy words])
    (0, ["hash"], ["jion"]),      # transposition of 'join'
    (1, ["merge"], ["scann"]),    # insertion on 'scan'
    (2, ["data"], ["vektor"]),    # substitution on 'vector'
    (3, ["window"], ["quer"]),    # deletion of 'query'
]


def bm25_topk_fuzzy(sf_dir: str):
    idx = ensure_index(sf_dir, "raw")
    li = LocalIndex(idx)
    qid_out, doc_out, score_out = [], [], []
    for qid, lits, words in _FZ_QUERIES:
        q = " ".join(lits + [w + "~" for w in words])
        ids, scores = li.search(q, k=10**9, mode="AND")
        r6 = np.round(scores, 6)
        order = np.lexsort((ids, -r6))[:_K]
        qid_out.extend([qid] * len(order))
        doc_out.extend(ids[order].tolist())
        score_out.extend(r6[order].tolist())
    return pa.table(
        {
            "query_id": pa.array(qid_out, pa.int64()),
            "doc_id": pa.array(doc_out, pa.int64()),
            "score": pa.array(score_out, pa.float64()),
        }
    )


def _bm25_fuzzy_sql() -> str:
    from ..config import STOPWORDS, WILDCARD_MAX_EXPANSIONS

    stop_sql = ",".join("'{}'".format(w.replace("'", "''")) for w in sorted(STOPWORDS))
    lit_vals = ", ".join(
        f"({qid}, '{t}')" for qid, lits, _w in _FZ_QUERIES for t in lits
    )
    nlit_vals = ", ".join(f"({qid}, {len(lits)})" for qid, lits, _w in _FZ_QUERIES)
    grp_vals = ", ".join(
        f"({qid}, {gi}, '{w}')"
        for qid, _l, words in _FZ_QUERIES
        for gi, w in enumerate(words)
    )
    ngrp_vals = ", ".join(f"({qid}, {len(words)})" for qid, _l, words in _FZ_QUERIES)
    return f"""
WITH {_TR_CTE},
qlit(query_id, term) AS (VALUES {lit_vals}),
nlit(query_id, n) AS (VALUES {nlit_vals}),
qgrp(query_id, gid, word) AS (VALUES {grp_vals}),
ngrp(query_id, n) AS (VALUES {ngrp_vals}),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks_idx GROUP BY term),
expansions AS (
    SELECT query_id, gid, term FROM (
        SELECT q.query_id, q.gid, d.term,
               row_number() OVER (PARTITION BY q.query_id, q.gid
                                  ORDER BY d.df DESC, d.term ASC) AS rn
        FROM qgrp q JOIN df d ON damerau_levenshtein(d.term, q.word) <= 1
        WHERE d.term NOT IN ({stop_sql})
    ) WHERE rn <= {WILDCARD_MAX_EXPANSIONS}
),
lit_hits AS (
    SELECT l.query_id, t.doc_id, COUNT(DISTINCT l.term) AS c
    FROM qlit l JOIN toks_idx t ON l.term = t.term
    GROUP BY l.query_id, t.doc_id
),
lit_ok AS (
    SELECT h.query_id, h.doc_id
    FROM lit_hits h JOIN nlit n ON n.query_id = h.query_id AND h.c = n.n
),
grp_hits AS (
    SELECT DISTINCT e.query_id, e.gid, t.doc_id
    FROM expansions e JOIN toks_idx t ON e.term = t.term
),
grp_ok AS (
    SELECT g.query_id, g.doc_id
    FROM (SELECT query_id, doc_id, COUNT(DISTINCT gid) AS c
          FROM grp_hits GROUP BY query_id, doc_id) g
    JOIN ngrp n ON n.query_id = g.query_id AND g.c = n.n
),
cand AS (
    SELECT l.query_id, l.doc_id
    FROM lit_ok l JOIN grp_ok g
      ON g.query_id = l.query_id AND g.doc_id = l.doc_id
),
terms_all AS (
    SELECT DISTINCT query_id, term FROM (
        SELECT query_id, term FROM qlit
        UNION ALL
        SELECT query_id, term FROM expansions
    )
),
tf AS (
    SELECT q.query_id, t.term, t.doc_id, COUNT(*) AS tf
    FROM terms_all q
    JOIN toks_idx t ON q.term = t.term
    JOIN cand c ON c.query_id = q.query_id AND c.doc_id = t.doc_id
    GROUP BY q.query_id, t.term, t.doc_id
),
contrib AS (
    SELECT tf.query_id, tf.doc_id,
           ln((c.N - df.df + 0.5) / (df.df + 0.5) + 1)
           * (tf.tf * (1.2 + 1)) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * ds.doclen / c.avgdl)) AS s
    FROM tf
    JOIN df ON tf.term = df.term
    JOIN docstats ds ON tf.doc_id = ds.doc_id
    CROSS JOIN corpus c
),
scored AS (
    SELECT query_id, doc_id, round(SUM(s), 6) AS score
    FROM contrib GROUP BY query_id, doc_id
),
ranked AS (
    SELECT query_id, doc_id, score,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id ASC) AS rn
    FROM scored
)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score FROM ranked WHERE rn <= {_K}
"""


# ---- hybrid retrieval: BM25 text ranks fused with embedding-cosine
#      ranks by reciprocal-rank fusion (RRF, k=60) — the standard
#      text+vector serving combination. Each hybrid query pairs a
#      _BM25_QUERIES text with the embedding of vec_id == query_id;
#      both per-system rankings reuse the exact tie-break semantics
#      their standalone gate entries already pin, and a two-term IEEE
#      sum is commutative, so the fused scores are deterministic. ----

from ..config import RRF_K as _RRF_K

_HY_K_SYS = 50   # per-system list depth fed into the fusion
_HY_K = 20       # fused results per query
_HY_NQ = 4       # len(_BM25_QUERIES); vector queries are vec_id < 4


def hybrid_rrf(sf_dir: str):
    from .knn import _load_queries, _read_emb, make_partial_topk_scorer

    idx = ensure_index(sf_dir, "raw")
    li = LocalIndex(idx)
    # text system: full OR ranking, (round6 desc, doc asc), top 50
    t_q, t_d, t_rn = [], [], []
    for qid, q in _BM25_QUERIES:
        ids, scores = li.search(q, k=10**9, mode="OR")
        r6 = np.round(scores, 6)
        order = np.lexsort((ids, -r6))[:_HY_K_SYS]
        t_q.extend([qid] * len(order))
        t_d.extend(ids[order].tolist())
        t_rn.extend(range(1, len(order) + 1))

    # vector system: distributed per-batch partial top-k (the
    # knn_cosine shape), finished on the driver (O(nq x k) rows)
    qids_all, qmat = _load_queries(sf_dir)
    sel = qids_all < _HY_NQ
    qids, qmat = qids_all[sel], qmat[sel]
    qnorm = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((qids, qnorm))
    # ONE shared partial-top-k kernel with knn_cosine (ops/knn.py) —
    # the tie-superset emission must not drift between the two callers
    score = make_partial_topk_scorer(ref, _HY_K_SYS)

    vdf = _read_emb(sf_dir).map_batches(score, batch_format="pyarrow").to_pandas()
    v_q, v_d, v_rn = [], [], []
    for qid in qids.tolist():
        g = vdf[(vdf["qid"] == qid) & (vdf["vec_id"] != qid)]
        sims = g["sim"].to_numpy()
        vids = g["vec_id"].to_numpy()
        order = np.lexsort((vids, -sims))[:_HY_K_SYS]
        v_q.extend([qid] * len(order))
        v_d.extend(vids[order].tolist())
        v_rn.extend(range(1, len(order) + 1))

    # fuse: rrf(d) = sum over systems of 1/(60 + rank_d)
    fused: dict = {}
    for qs, ds_, rns in ((t_q, t_d, t_rn), (v_q, v_d, v_rn)):
        for qid, d, rn in zip(qs, ds_, rns):
            key = (qid, d)
            fused[key] = fused.get(key, 0.0) + 1.0 / (_RRF_K + rn)
    qid_out, doc_out, rrf_out = [], [], []
    for qid, _text in _BM25_QUERIES:
        pairs = [(d, v) for (q, d), v in fused.items() if q == qid]
        if not pairs:
            continue
        docs = np.array([d for d, _v in pairs], dtype=np.int64)
        vals = np.round(np.array([v for _d, v in pairs]), 6)
        order = np.lexsort((docs, -vals))[:_HY_K]
        qid_out.extend([qid] * len(order))
        doc_out.extend(docs[order].tolist())
        rrf_out.extend(vals[order].tolist())
    return pa.table(
        {
            "query_id": pa.array(qid_out, pa.int64()),
            "doc_id": pa.array(doc_out, pa.int64()),
            "rrf": pa.array(rrf_out, pa.float64()),
        }
    )


def _hybrid_sql() -> str:
    values = ", ".join(
        f"({qid}, '{term}')" for qid, q in _BM25_QUERIES for term in q.split()
    )
    return f"""
WITH {_TR_CTE},
qterms(query_id, term) AS (VALUES {values}),
tf AS (
    SELECT q.query_id, t.term, t.doc_id, COUNT(*) AS tf
    FROM qterms q JOIN toks_idx t ON q.term = t.term
    GROUP BY q.query_id, t.term, t.doc_id
),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks_idx GROUP BY term),
contrib AS (
    SELECT tf.query_id, tf.doc_id,
           ln((c.N - df.df + 0.5) / (df.df + 0.5) + 1)
           * (tf.tf * (1.2 + 1)) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * ds.doclen / c.avgdl)) AS s
    FROM tf
    JOIN df ON tf.term = df.term
    JOIN docstats ds ON tf.doc_id = ds.doc_id
    CROSS JOIN corpus c
),
t_scored AS (
    SELECT query_id, doc_id, round(SUM(s), 6) AS score
    FROM contrib GROUP BY query_id, doc_id
),
text_ranked AS (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id ASC) AS rn
    FROM t_scored
),
vq AS (
    SELECT vec_id AS query_id, embedding AS qe FROM embeddings
    WHERE vec_id < {_HY_NQ} AND embedding IS NOT NULL
),
vs AS (
    SELECT vq.query_id, e.vec_id AS doc_id,
           CAST(round(list_cosine_similarity(
               list_transform(vq.qe, x -> CAST(x AS DOUBLE)),
               list_transform(e.embedding, x -> CAST(x AS DOUBLE))), 6) AS DOUBLE) AS sim
    FROM vq CROSS JOIN embeddings e
    WHERE e.vec_id <> vq.query_id AND e.embedding IS NOT NULL
),
vec_ranked AS (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, doc_id ASC) AS rn
    FROM vs
),
parts AS (
    SELECT query_id, doc_id, 1.0 / ({_RRF_K} + rn) AS r
    FROM text_ranked WHERE rn <= {_HY_K_SYS}
    UNION ALL
    SELECT query_id, doc_id, 1.0 / ({_RRF_K} + rn) AS r
    FROM vec_ranked WHERE rn <= {_HY_K_SYS}
),
fused AS (
    SELECT query_id, doc_id, round(SUM(r), 6) AS rrf
    FROM parts GROUP BY query_id, doc_id
),
ranked AS (
    SELECT query_id, doc_id, rrf,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY rrf DESC, doc_id ASC) AS rn
    FROM fused
)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, rrf
FROM ranked WHERE rn <= {_HY_K}
"""


def _bm25_sql(conjunctive: bool) -> str:
    values = ", ".join(
        f"({qid}, '{term}')" for qid, q in _BM25_QUERIES for term in q.split()
    )
    and_clause = "JOIN qsize USING (query_id) WHERE nterms = qsize.nt" if conjunctive else ""
    return f"""
WITH {_TR_CTE},
qterms(query_id, term) AS (VALUES {values}),
qsize AS (SELECT query_id, COUNT(*) AS nt FROM qterms GROUP BY query_id),
tf AS (
    SELECT q.query_id, t.term, t.doc_id, COUNT(*) AS tf
    FROM qterms q JOIN toks_idx t ON q.term = t.term
    GROUP BY q.query_id, t.term, t.doc_id
),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks_idx GROUP BY term),
contrib AS (
    SELECT tf.query_id, tf.doc_id,
           ln((c.N - df.df + 0.5) / (df.df + 0.5) + 1)
           * (tf.tf * (1.2 + 1)) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * ds.doclen / c.avgdl)) AS s
    FROM tf
    JOIN df ON tf.term = df.term
    JOIN docstats ds ON tf.doc_id = ds.doc_id
    CROSS JOIN corpus c
),
scored AS (
    SELECT query_id, doc_id, round(SUM(s), 6) AS score, COUNT(*) AS nterms
    FROM contrib GROUP BY query_id, doc_id
),
ranked AS (
    SELECT query_id, doc_id, score,
           row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rn
    FROM scored {and_clause}
)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score FROM ranked WHERE rn <= {_K}
"""


# ---- exact-phrase matching via the stored position blocks ----

_PHRASES = [(0, "hash join"), (1, "group by"), (2, "the data"), (3, "sort merge join")]


def phrase_match(sf_dir: str):
    """All (query_id, doc_id) pairs where the phrase's tokens occur
    adjacently (position-verified through the index; the SQL oracle
    verifies by regex over the raw text — independent mechanisms)."""
    idx = ensure_index(sf_dir, "rawpos")
    li = LocalIndex(idx, load_positions=True)
    qid_out, doc_out = [], []
    for qid, phrase in _PHRASES:
        ids, _scores = li.phrase_search(phrase, k=10**9)
        ids = np.sort(ids)
        qid_out.extend([qid] * len(ids))
        doc_out.extend(ids.tolist())
    return pa.table(
        {
            "query_id": pa.array(qid_out, pa.int64()),
            "doc_id": pa.array(doc_out, pa.int64()),
        }
    )


def _phrase_sql() -> str:
    rows = []
    for qid, phrase in _PHRASES:
        toks = phrase.lower().split()
        pat = "(^|[^0-9a-z])" + "[^0-9a-z]+".join(toks) + "([^0-9a-z]|$)"
        rows.append(f"({qid}, '{pat}')")
    return f"""
WITH {_TR_CTE},
phrases(query_id, pattern) AS (VALUES {", ".join(rows)})
SELECT CAST(p.query_id AS BIGINT) AS query_id, tr.doc_id
FROM phrases p
JOIN tr ON regexp_matches(lower(substring(tr.text, 1, 10000)), p.pattern)
"""


# ---- the reference's OWN tf-idf scoring (capability parity):
#      tf * ln(N/df) / doclen summed per doc over query terms,
#      `/root/reference/src/cis5550/jobs_archive/Ranker.java:146-177`,
#      weights tf-idf 1.0 / pagerank 0.0 (`Ranker.java:28`) ----

def tfidf_topk(sf_dir: str):
    idx = ensure_index(sf_dir, "raw")
    li = LocalIndex(idx)
    qid_out, doc_out, score_out = [], [], []
    for qid, q in _BM25_QUERIES:
        score = np.zeros(li.N, np.float64)
        seen = np.zeros(li.N, bool)
        for term in q.split():
            ts = li.terms.get(term)
            if ts is None:
                continue
            # per-posting doclen stream — no O(N) doclen table
            ids, tfs, dls = ts.decode()
            df = len(ids)
            if df == 0:
                continue
            score[ids] += tfs * np.log(li.N / df) / dls.astype(np.float64)
            seen[ids] = True
        ids = np.flatnonzero(seen)
        r6 = np.round(score[ids], 6)
        order = np.lexsort((ids, -r6))[:_K]
        qid_out.extend([qid] * len(order))
        doc_out.extend(ids[order].tolist())
        score_out.extend(r6[order].tolist())
    return pa.table(
        {
            "query_id": pa.array(qid_out, pa.int64()),
            "doc_id": pa.array(doc_out, pa.int64()),
            "score": pa.array(score_out, pa.float64()),
        }
    )


def _tfidf_sql() -> str:
    values = ", ".join(
        f"({qid}, '{term}')" for qid, q in _BM25_QUERIES for term in q.split()
    )
    return f"""
WITH {_TR_CTE},
qterms(query_id, term) AS (VALUES {values}),
tf AS (
    SELECT q.query_id, t.term, t.doc_id, COUNT(*) AS tf
    FROM qterms q JOIN toks_idx t ON q.term = t.term
    GROUP BY q.query_id, t.term, t.doc_id
),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks_idx GROUP BY term),
contrib AS (
    SELECT tf.query_id, tf.doc_id,
           tf.tf * ln(c.N * 1.0 / df.df) / ds.doclen AS s
    FROM tf
    JOIN df ON tf.term = df.term
    JOIN docstats ds ON tf.doc_id = ds.doc_id
    CROSS JOIN corpus c
),
scored AS (
    SELECT query_id, doc_id, round(SUM(s), 6) AS score
    FROM contrib GROUP BY query_id, doc_id
),
ranked AS (
    SELECT query_id, doc_id, score,
           row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rn
    FROM scored
)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score FROM ranked WHERE rn <= {_K}
"""


# ---- combined ranking: the reference's Search scoring combination
#      ``0.95 * ln(tf_idf) + 0.05 * ln(pagerank)``
#      (`/root/reference/src/cis5550/jobs/Search.java:24`, `:111-114`).
#      Transcripts have no link graph, so the prior slot is filled by a
#      deterministic per-doc prior (n_chars/100 — any per-doc score
#      plugs in; ops/graph.pagerank supplies one when a graph exists) ----

def combined_topk(sf_dir: str):
    """The prior rides IN the posting payload (a varbyte stream beside
    doclen — the reference's ``url^pagerank tf`` format,
    Search.java:89-108), so scoring is fully shard-local: no driver-side
    prior map, no O(N) table load anywhere. The prior value is the
    char length of the turn text (== documents.n_chars, since the
    transcript text is the document text), scaled /100 at score time."""
    idx = ensure_index(sf_dir, "prior")
    li = LocalIndex(idx)
    qid_out, doc_out, score_out = [], [], []
    for qid, q in _BM25_QUERIES:
        tfidf = np.zeros(li.N, np.float64)
        prior = np.ones(li.N, np.float64)
        seen = np.zeros(li.N, bool)
        for term in q.split():
            ts = li.terms.get(term)
            if ts is None:
                continue
            ids, tfs, dls = ts.decode()
            df = len(ids)
            if df == 0:
                continue
            tfidf[ids] += tfs * np.log(li.N / df) / dls.astype(np.float64)
            prior[ids] = ts.decode_priors().astype(np.float64) / 100.0
            seen[ids] = True
        ids = np.flatnonzero(seen)
        score = 0.95 * np.log(tfidf[ids]) + 0.05 * np.log(prior[ids])
        r6 = np.round(score, 6)
        order = np.lexsort((ids, -r6))[:_K]
        qid_out.extend([qid] * len(order))
        doc_out.extend(ids[order].tolist())
        score_out.extend(r6[order].tolist())
    return pa.table(
        {
            "query_id": pa.array(qid_out, pa.int64()),
            "doc_id": pa.array(doc_out, pa.int64()),
            "score": pa.array(score_out, pa.float64()),
        }
    )


def _combined_sql() -> str:
    values = ", ".join(
        f"({qid}, '{term}')" for qid, q in _BM25_QUERIES for term in q.split()
    )
    return f"""
WITH {_TR_CTE},
qterms(query_id, term) AS (VALUES {values}),
tf AS (
    SELECT q.query_id, t.term, t.doc_id, COUNT(*) AS tf
    FROM qterms q JOIN toks_idx t ON q.term = t.term
    GROUP BY q.query_id, t.term, t.doc_id
),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks_idx GROUP BY term),
contrib AS (
    SELECT tf.query_id, tf.doc_id,
           tf.tf * ln(c.N * 1.0 / df.df) / ds.doclen AS s
    FROM tf
    JOIN df ON tf.term = df.term
    JOIN docstats ds ON tf.doc_id = ds.doc_id
    CROSS JOIN corpus c
),
tfidf AS (
    SELECT query_id, doc_id, SUM(s) AS tfidf
    FROM contrib GROUP BY query_id, doc_id
),
scored AS (
    -- prior = char length of the turn text (== documents.n_chars:
    -- the transcript text IS the document text), matching the
    -- per-posting prior stream the Ray side stores at build time
    SELECT t.query_id, t.doc_id,
           round(0.95 * ln(t.tfidf) + 0.05 * ln(length(d.text) / 100.0), 6) AS score
    FROM tfidf t
    JOIN tr d ON t.doc_id = d.doc_id
),
ranked AS (
    SELECT query_id, doc_id, score,
           row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rn
    FROM scored
)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score FROM ranked WHERE rn <= {_K}
"""


# ---- stemmed path (full reference semantics: raw+stem dual index,
#      query terms Porter-stemmed — Indexer.java:256-283,
#      Search.java:59-74). The oracle reproduces the stemming with an
#      inline (term, stem) map over the gate corpus's fixed vocabulary;
#      an unmapped term is treated as stem == raw (no stem posting), so
#      the map below must cover the corpus vocabulary. ----

_STEM_QUERIES = [(0, "hashing joins"), (1, "scanning windows"), (2, "merged batches")]
_STEM_K = 50

# The driver corpus's complete token vocabulary (31 terms, fixed by the
# deterministic generator) + the query-side raw terms.
_GATE_VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
    "hashing", "joins", "scanning", "windows", "merged", "batches",
]


def bm25_stemmed_topk(sf_dir: str):
    idx = ensure_index(sf_dir, "stemmed")
    li = LocalIndex(idx)
    qid_out, rank_out, doc_out, score_out = [], [], [], []
    for qid, q in _STEM_QUERIES:
        ids, scores = li.search(q, k=10**9, mode="OR")
        r6 = np.round(scores, 6)
        order = np.lexsort((ids, -r6))[:_STEM_K]
        qid_out.extend([qid] * len(order))
        rank_out.extend(range(1, len(order) + 1))
        doc_out.extend(ids[order].tolist())
        score_out.extend(r6[order].tolist())
    return pa.table(
        {
            "query_id": pa.array(qid_out, pa.int64()),
            "rank": pa.array(rank_out, pa.int64()),
            "doc_id": pa.array(doc_out, pa.int64()),
            "score": pa.array(score_out, pa.float64()),
        }
    )


def _stemmed_sql() -> str:
    from ..functions.stemmer import CachingStemmer

    st = CachingStemmer()
    stem_rows = ", ".join(
        f"('{w}', '{st.stem(w)}')" for w in sorted(set(_GATE_VOCAB))
    )
    qvalues = ", ".join(
        f"({qid}, '{st.stem(term)}')"
        for qid, q in _STEM_QUERIES
        for term in q.split()
    )
    return f"""
WITH {_TR_CTE},
stem_map(term, stem) AS (VALUES {stem_rows}),
posts AS (
    SELECT doc_id, term FROM toks_idx
    UNION ALL
    SELECT t.doc_id, m.stem AS term
    FROM toks_idx t JOIN stem_map m ON t.term = m.term AND m.stem <> m.term
),
qterms(query_id, term) AS (VALUES {qvalues}),
tf AS (
    SELECT q.query_id, p.term, p.doc_id, COUNT(*) AS tf
    FROM qterms q JOIN posts p ON q.term = p.term
    GROUP BY 1, 2, 3
),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM posts GROUP BY term),
contrib AS (
    SELECT tf.query_id, tf.doc_id,
           ln((c.N - df.df + 0.5) / (df.df + 0.5) + 1)
           * (tf.tf * (1.2 + 1)) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * ds.doclen / c.avgdl)) AS s
    FROM tf
    JOIN df ON tf.term = df.term
    JOIN docstats ds ON tf.doc_id = ds.doc_id
    CROSS JOIN corpus c
),
scored AS (
    SELECT query_id, doc_id, round(SUM(s), 6) AS score
    FROM contrib GROUP BY query_id, doc_id
),
ranked AS (
    SELECT query_id, doc_id, score,
           row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rn
    FROM scored
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rn AS BIGINT) AS rank,
       doc_id, score
FROM ranked WHERE rn <= {_STEM_K}
"""


# ---- conversation-level rollups (the transcript-domain grouped
#      aggregate a training pipeline runs before per-conv sampling) ----

def _conv_bucket_ids(col, n_buckets: int) -> np.ndarray:
    """Bucket ids for a conv_id column — run-internal partition key
    only (never compared to a SQL twin), so the vectorized polars hash
    is safe. Shared by conv_dedup and conv_context_windows so their
    partitioning can never drift apart."""
    import polars as pl

    h = pl.from_arrow(
        col.combine_chunks() if hasattr(col, "combine_chunks") else col
    ).hash(seed=0).to_numpy()
    return (h % n_buckets).astype(np.int64)


def conv_stats(sf_dir: str):

    from ..functions.analysis import split_tokens

    cfg = IndexConfig(stemming=False)
    tdir = transcripts_dir(sf_dir)

    def pre(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        *_, doclens = split_tokens(t["text"].combine_chunks(), cfg)
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "doclen": pa.array(doclens.astype(np.int64), pa.int64()),
                "is_tool": pc.cast(pc.equal(t["role"], pa.scalar("tool")), pa.int64()),
                "turn_idx": pa.array(t["turn_idx"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    from .dedup import _npart, _reduce_keyed

    def stats_part(g: pa.Table) -> pa.Table:
        # one vectorized pass per hash partition of conversations —
        # groupby(conv_id) would pay Ray's per-group Python aggregate
        # cost once per conversation (see dedup._reduce_keyed)
        conv = g["conv_id"].combine_chunks()
        idx = pc.sort_indices(conv)
        conv = conv.take(idx)
        order = idx.to_numpy()
        neq = pc.not_equal(
            conv.slice(1), conv.slice(0, max(len(conv) - 1, 0))
        ).to_numpy(zero_copy_only=False).astype(bool)
        starts = np.flatnonzero(np.concatenate([[True], neq]))
        dl = g["doclen"].to_numpy()[order]
        tool = g["is_tool"].to_numpy()[order]
        ti = g["turn_idx"].to_numpy()[order]
        return pa.table(
            {
                "conv_id": conv.take(pa.array(starts, pa.int64())),
                "n_turns": pa.array(
                    np.diff(np.concatenate([starts, [len(order)]])).astype(np.int64),
                    pa.int64(),
                ),
                "total_tokens": pa.array(np.add.reduceat(dl, starts), pa.int64()),
                "n_tool_turns": pa.array(np.add.reduceat(tool, starts), pa.int64()),
                "first_turn": pa.array(np.minimum.reduceat(ti, starts), pa.int64()),
                "last_turn": pa.array(np.maximum.reduceat(ti, starts), pa.int64()),
            }
        )

    out_schema = pa.schema(
        [("conv_id", pa.string()), ("n_turns", pa.int64()),
         ("total_tokens", pa.int64()), ("n_tool_turns", pa.int64()),
         ("first_turn", pa.int64()), ("last_turn", pa.int64())]
    )
    # typed-empty union: an all-empty map_groups output loses its
    # schema in Ray 2.49, and an empty corpus must still present the
    # op's columns
    return empty_dataset(out_schema).union(
        _reduce_keyed(
            read_parquet_light(tdir).map_batches(pre, batch_format="pyarrow"),
            "conv_id", _npart() * 8, stats_part,
        )
    )


SQL_CONV_STATS = f"""
WITH tr0 AS ({TRANSCRIPTS_FROM_DOCUMENTS_SQL})
SELECT conv_id, COUNT(*) AS n_turns,
       CAST(SUM(len(list_filter(regexp_split_to_array(lower(substr(text, 1, 10000)), '[^0-9a-z]+'),
                           x -> x <> ''))) AS BIGINT) AS total_tokens,
       CAST(SUM(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS BIGINT) AS n_tool_turns,
       MIN(CAST(turn_idx AS BIGINT)) AS first_turn,
       MAX(CAST(turn_idx AS BIGINT)) AS last_turn
FROM tr0 GROUP BY conv_id
"""


# ---- training-context windows: each turn + its trailing context ----

_CTX_TURNS = 2  # preceding turns included in a training example


def conv_context_windows(sf_dir: str):
    """For every turn: the training-example context = the previous
    {_CTX_TURNS} turns of the same conversation + the turn itself,
    joined with single spaces — the example-construction transform an
    SFT pipeline runs before tokenization. Output carries the md5-60
    hash and length of each context so the gate compares exactly
    without shipping megabytes of concatenated text.

    Shape: conversations are hash-bucketed (conv_dedup's pattern) so
    each map_groups call handles a whole PARTITION of conversations
    with array kernels — windows materialize as a flat gather-index
    into the sorted text array (<= (W+1)x duplication, W=_CTX_TURNS),
    one list-offset binary_join builds every context string, and the
    shared _hash60 kernel hashes them. No per-conversation Python task,
    no per-turn Python join."""
    from .dedup import _hash60, _npart

    tdir = transcripts_dir(sf_dir)
    n_buckets = _npart() * 4

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "part", pa.array(_conv_bucket_ids(t["conv_id"], n_buckets), pa.int64())
        )

    def window_bucket(g: pa.Table) -> pa.Table:
        conv = g["conv_id"].to_numpy(zero_copy_only=False)
        if len(conv) == 0:
            return pa.table({"conv_id": pa.array([], pa.string()),
                             "turn_idx": pa.array([], pa.int64()),
                             "context_hash": pa.array([], pa.int64()),
                             "context_chars": pa.array([], pa.int64())})
        idx = g["turn_idx"].to_numpy()
        order = np.lexsort((idx, conv))
        conv, idx = conv[order], idx[order]
        # large_string/LargeList: the gathered window text is up to
        # (W+1)x the bucket's bytes — int32 offsets cap out at 2 GiB
        texts = pc.fill_null(g["text"].combine_chunks(), "").cast(
            pa.large_string()
        ).take(pa.array(order, pa.int64()))
        n = len(conv)
        starts = np.concatenate(
            [[0], np.flatnonzero(conv[1:] != conv[:-1]) + 1]
        )
        conv_start = starts.repeat(np.diff(np.concatenate([starts, [n]])))
        pos = np.arange(n) - conv_start
        lens = np.minimum(pos, _CTX_TURNS) + 1
        # flat gather index: row i's window is rows [i-lens_i+1 .. i]
        offs = np.concatenate([[0], np.cumsum(lens)])
        flat = np.arange(offs[-1]) - offs[:-1].repeat(lens) + (
            np.arange(n) - lens + 1
        ).repeat(lens)
        joined = pc.binary_join(
            pa.LargeListArray.from_arrays(
                pa.array(offs, pa.int64()), texts.take(pa.array(flat, pa.int64()))
            ),
            pa.scalar(" ", pa.large_string()),
        )
        return pa.table(
            {
                "conv_id": pa.array(conv, pa.string()),
                "turn_idx": pa.array(idx.astype(np.int64), pa.int64()),
                "context_hash": pa.array(_hash60(joined), pa.int64()),
                "context_chars": pc.utf8_length(joined).cast(pa.int64()),
            }
        )

    return (
        read_parquet_light(tdir, columns=["conv_id", "turn_idx", "text"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(window_bucket, batch_format="pyarrow")
    )


SQL_CONV_CONTEXT = f"""
WITH tr0 AS ({TRANSCRIPTS_FROM_DOCUMENTS_SQL}),
ctx AS (
    SELECT conv_id, turn_idx,
           string_agg(coalesce(text, ''), ' ') OVER (
               PARTITION BY conv_id ORDER BY turn_idx
               ROWS BETWEEN {_CTX_TURNS} PRECEDING AND CURRENT ROW
           ) AS context
    FROM tr0
)
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
       {_MD5_SQL.format("context")} AS context_hash,
       CAST(length(context) AS BIGINT) AS context_chars
FROM ctx
"""


# ---- conversation-level exact dedup ----

def conv_dedup(sf_dir: str):
    """Exact dedup at CONVERSATION granularity: each conversation's
    turns are concatenated in turn order (single-space join, the
    conv_context_windows convention) and hashed; the smallest conv_id
    per identical stream survives, with the group size alongside. The
    transcript-payload twin of ``dedup.dedup_exact`` — whole-session
    re-logs (retried agent runs, duplicated uploads) dedupe here, not
    at turn level.

    Shape: conversations are hash-bucketed so each map_groups call
    processes a PARTITION of many conversations with vectorized
    kernels (lexsort + list-offset binary_join + the shared _hash60
    content hash) — not one Python task per conversation — and the
    survivor pick is partition-vectorized too (``dedup._reduce_keyed``:
    the hash groups are near-singletons, so a native Min/Count groupby
    would pay Ray's per-group Python cost once per conversation)."""
    from .dedup import _hash60, _npart, _reduce_keyed

    tdir = transcripts_dir(sf_dir)
    n_buckets = _npart() * 4

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "part", pa.array(_conv_bucket_ids(t["conv_id"], n_buckets), pa.int64())
        )

    def hash_bucket(g: pa.Table) -> pa.Table:
        conv = g["conv_id"].to_numpy(zero_copy_only=False)
        if len(conv) == 0:
            return pa.table({"conv_id": pa.array([], pa.string()),
                             "h": pa.array([], pa.int64())})
        order = np.lexsort((g["turn_idx"].to_numpy(), conv))
        conv = conv[order]
        # large_string/LargeList: a bucket's concatenated text can pass
        # 2 GiB at scale, which int32-offset arrays cannot address
        texts = pc.fill_null(g["text"].combine_chunks(), "").cast(
            pa.large_string()
        ).take(pa.array(order, pa.int64()))
        starts = np.concatenate(
            [[0], np.flatnonzero(conv[1:] != conv[:-1]) + 1, [len(conv)]]
        )
        joined = pc.binary_join(
            pa.LargeListArray.from_arrays(pa.array(starts, pa.int64()), texts),
            pa.scalar(" ", pa.large_string()),
        )
        return pa.table(
            {
                "conv_id": pa.array(conv[starts[:-1]], pa.string()),
                "h": pa.array(_hash60(joined), pa.int64()),
            }
        )

    hashed = (
        read_parquet_light(tdir, columns=["conv_id", "turn_idx", "text"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(hash_bucket, batch_format="pyarrow")
    )

    def survivors(g: pa.Table) -> pa.Table:
        # min over the STRING conv_id: Arrow-native multi-key sort,
        # then first-of-run (numpy has no reduceat for strings)
        idx = pc.sort_indices(
            g, sort_keys=[("h", "ascending"), ("conv_id", "ascending")]
        )
        h = g["h"].take(idx).to_numpy()
        conv = g["conv_id"].combine_chunks().take(idx)
        starts = np.flatnonzero(np.concatenate([[True], h[1:] != h[:-1]]))
        counts = np.diff(np.concatenate([starts, [len(h)]]))
        return pa.table(
            {
                "conv_id": conv.take(pa.array(starts, pa.int64())),
                "n_dups": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    out_schema = pa.schema([("conv_id", pa.string()), ("n_dups", pa.int64())])
    return empty_dataset(out_schema).union(
        _reduce_keyed(hashed, "h", n_buckets, survivors)
    )


SQL_CONV_DEDUP = f"""
WITH tr0 AS ({TRANSCRIPTS_FROM_DOCUMENTS_SQL}),
agg AS (
    SELECT conv_id,
           string_agg(coalesce(text, ''), ' ' ORDER BY turn_idx) AS full_text
    FROM tr0 GROUP BY conv_id
),
h AS (
    SELECT conv_id, {_MD5_SQL.format("full_text")} AS h
    FROM agg
)
SELECT min(conv_id) AS conv_id, count(*) AS n_dups FROM h GROUP BY h
"""


# ---- flagship (entry()): full stemmed pipeline + batch evaluation ----

def flagship(sf_dir: str):
    idx = ensure_index(sf_dir, "stemmed")
    queries = pd.DataFrame(
        {
            "query_id": np.arange(6, dtype=np.int32),
            "query": [
                "hash join", "scanning windows", "customer orders",
                "merge batch filter", "the of and", "spark streaming",
            ],
            "k": np.full(6, 20, dtype=np.int32),
        }
    )
    topk = evaluate_queries(
        ray.data.from_pandas(queries), idx, mode="OR", concurrency=(1, 2)
    ).to_pandas()
    return materialize_results(idx, topk)


def postings_probe_both(sf_dir: str):
    """Both posting probes, variant-tagged in one result: 'text' decodes
    probe terms from the plain index, 'roletool' from the
    role/tool-token index (the URL-token analog) — consolidates the two
    gate entries; both index builds + decode paths run unchanged."""

    def tag(variant: str, t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "variant": pa.array([variant] * t.num_rows, pa.string()),
                "term": t["term"],
                "doc_id": t["doc_id"],
                "tf": t["tf"],
            }
        )

    return pa.concat_tables(
        [tag("text", postings_probe(sf_dir)),
         tag("roletool", postings_probe_roletool(sf_dir))]
    )


SQL_POSTINGS_BOTH = f"""
SELECT 'text' AS variant, term, doc_id, tf FROM ({SQL_POSTINGS_PROBE})
UNION ALL
SELECT 'roletool' AS variant, term, doc_id, tf FROM ({SQL_POSTINGS_ROLETOOL})
"""


# ---- group-aware train/val/test split (leakage prevention) ----

_SPLIT_VAL_PPM = 980_000   # train < 980000 <= val < 990000 <= test
_SPLIT_TEST_PPM = 990_000


def train_val_test_split(sf_dir: str):
    """(conv_id, turn_idx, split): deterministic 98/1/1 train/val/test
    assignment keyed on md5-60 of the CONVERSATION id — every turn of a
    conversation lands in the same split, so near-identical context
    windows can never straddle the train/eval boundary (the leakage
    rule group-aware splitting exists for). Stateless per-batch map;
    invariant to row order, partitioning and re-runs."""
    tdir = transcripts_dir(sf_dir)

    def assign(t: pa.Table) -> pa.Table:
        # shared _hash60 kernel: md5-60 by default (oracle-identical);
        # SERAY_FAST_HASH runs get the vectorized xxhash draw — a
        # different but equally valid deterministic assignment
        from .dedup import _hash60

        draw = _hash60(t["conv_id"].combine_chunks()) % 1_000_000
        split = np.where(
            draw < _SPLIT_VAL_PPM, "train",
            np.where(draw < _SPLIT_TEST_PPM, "val", "test"),
        )
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": pa.array(
                    t["turn_idx"].to_numpy().astype(np.int64), pa.int64()
                ),
                "split": pa.array(split.astype(object), pa.string()),
            }
        )

    return read_parquet_light(
        tdir, columns=["conv_id", "turn_idx"]
    ).map_batches(assign, batch_format="pyarrow")


SQL_TRAIN_VAL_TEST = f"""
WITH tr0 AS ({TRANSCRIPTS_FROM_DOCUMENTS_SQL})
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
       CASE WHEN {_MD5_SQL.format("conv_id")} % 1000000 < {_SPLIT_VAL_PPM} THEN 'train'
            WHEN {_MD5_SQL.format("conv_id")} % 1000000 < {_SPLIT_TEST_PPM} THEN 'val'
            ELSE 'test' END AS split
FROM tr0
"""


RAY_QUERIES = {
    "bm25_topk_or": bm25_topk_or,
    "bm25_topk_and": bm25_topk_and,
    "bm25_topk_filtered": bm25_topk_filtered,
    "bm25_stemmed_topk": bm25_stemmed_topk,
    "tfidf_topk": tfidf_topk,
    "combined_topk": combined_topk,
    "phrase_match": phrase_match,
    "transcripts_docids": transcripts_docids,
    "postings_probe": postings_probe_both,
    "postings_extend": postings_extend,
    "conv_stats": conv_stats,
    "conv_context_windows": conv_context_windows,
    "conv_dedup": conv_dedup,
}

ORACLE_SQL = {
    "transcripts_docids": SQL_TRANSCRIPTS_DOCIDS,
    "postings_probe": SQL_POSTINGS_BOTH,
    "postings_extend": SQL_POSTINGS_PROBE,
    "bm25_topk_and": _bm25_sql(True),
    "bm25_topk_or": _bm25_sql(False),
    "bm25_topk_filtered": _bm25_filtered_sql(),
    "bm25_stemmed_topk": _stemmed_sql(),
    "tfidf_topk": _tfidf_sql(),
    "combined_topk": _combined_sql(),
    "phrase_match": _phrase_sql(),
    "conv_stats": SQL_CONV_STATS,
    "conv_context_windows": SQL_CONV_CONTEXT,
    "conv_dedup": SQL_CONV_DEDUP,
}

# past the driver's 50-entry window; tools_verify still checks them
RAY_QUERIES_AUX = {
    "train_val_test_split": train_val_test_split,
    "bm25_topk_not": bm25_topk_not,
    "bm25_topk_wildcard": bm25_topk_wildcard,
    "bm25_topk_fuzzy": bm25_topk_fuzzy,
    "bm25_topk_boosted": bm25_topk_boosted,
    "bm25_topk_quoted": bm25_topk_quoted,
    "hybrid_rrf": hybrid_rrf,
    "facet_counts": facet_counts,
}
ORACLE_SQL_AUX = {
    "train_val_test_split": SQL_TRAIN_VAL_TEST,
    "bm25_topk_not": _bm25_not_sql(),
    "bm25_topk_wildcard": _bm25_wildcard_sql(),
    "bm25_topk_fuzzy": _bm25_fuzzy_sql(),
    "bm25_topk_boosted": _bm25_boosted_sql(),
    "bm25_topk_quoted": _bm25_quoted_sql(),
    "hybrid_rrf": _hybrid_sql(),
    "facet_counts": _facet_sql(),
}
