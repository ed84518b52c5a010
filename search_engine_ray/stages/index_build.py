"""Per-partition inverted-index builder (stateful actor-pool stage).

The Ray-Data-first analog of the reference's indexer dataflow
(`/root/reference/src/cis5550/jobs_archive/IndexerParallel.java:171-201`
``pageToWord`` + the read-modify-write posting appends at
`/root/reference/src/cis5550/jobs/Indexer.java:260-283`): each batch of
transcript turns is tokenized (vectorized Arrow/numpy), aggregated to
``(term, doc_id) -> (tf, positions)`` entries, and emitted as
**partial posting segments** — one row per ``(term, doc-range bucket)``
holding already delta-gap + varbyte-encoded doc/tf/position streams.

Emitting encoded partials per batch is the combiner that keeps the
term-keyed merge shuffle small (~1.5-2 bytes per posting instead of
12+), and the doc-range ``bucket`` is the explicit skew handling: a
stopword-like term's postings are spread over ``doc_id //
doc_bucket_size`` groups, so no single merge group ever exceeds the
bucket size regardless of document frequency (SURVEY.md §7.4).

Invariant relied on by the merge stage: each input batch covers a set
of doc_ids disjoint from every other batch (true because batches are
whole blocks of the doc-id-assigned dataset), so partial segments of
the same (term, bucket) never interleave doc ranges.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import IndexConfig
from ..functions.analysis import tokenize_batch
from ..functions.stemmer import CachingStemmer
from ..functions import varbyte as vb

SEGMENT_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("part", pa.int32()),
        ("bucket", pa.int32()),
        ("first_doc", pa.int64()),
        ("last_doc", pa.int64()),
        ("df", pa.int32()),
        ("max_tf", pa.int32()),
        ("min_doclen", pa.int32()),
        ("doc_bytes", pa.large_binary()),
        ("tf_bytes", pa.large_binary()),
        ("dl_bytes", pa.large_binary()),
        ("pos_bytes", pa.large_binary()),
        ("pr_bytes", pa.large_binary()),
    ]
)


_worker_stemmer: "CachingStemmer | None" = None


def build_partials_task(
    batch: pa.Table, cfg: IndexConfig, part_bounds=None, part_ids=None
) -> pa.Table:
    """Task-pool form of the builder (the default build path).

    The only builder state is the Porter-stemmer memo cache, which
    lives here as a worker-process global — plain tasks reuse Ray's
    prestarted workers, so the cache is as warm as an actor's while
    skipping per-wave actor-pool startup (measured ~4.5 s for a
    32-actor pool, dominating short waves). Use ``PartialIndexBuilder``
    (actor pool) instead when builder state becomes expensive to
    rebuild per worker (e.g. a model or a large side table).
    """
    global _worker_stemmer
    if _worker_stemmer is None:
        _worker_stemmer = CachingStemmer()
    bounds = np.asarray(part_bounds, dtype=np.int64) if part_bounds is not None else None
    pids = np.asarray(part_ids, dtype=np.int64) if part_ids is not None else None
    return build_partials(batch, cfg, _worker_stemmer, bounds, pids)


class PartialIndexBuilder:
    """Callable-class stage for ``map_batches(..., concurrency=N)``.

    Stemmer memo-cache and config live in the actor (``__init__`` runs
    once per actor); ``__call__`` is fully vectorized per batch.
    """

    def __init__(self, cfg: IndexConfig | None = None, part_bounds=None, part_ids=None):
        self.cfg = cfg or IndexConfig()
        self.stemmer = CachingStemmer()
        self.part_bounds = (
            np.asarray(part_bounds, dtype=np.int64) if part_bounds is not None else None
        )
        self.part_ids = (
            np.asarray(part_ids, dtype=np.int64) if part_ids is not None else None
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        return build_partials(batch, self.cfg, self.stemmer, self.part_bounds, self.part_ids)


def build_partials(
    batch: pa.Table,
    cfg: IndexConfig,
    stemmer: CachingStemmer | None = None,
    part_bounds: np.ndarray | None = None,
    part_ids: np.ndarray | None = None,
) -> pa.Table:
    """Tokenize one batch (needs columns text, doc_id, doclen) and emit
    partial posting segments.

    ``part_bounds``: ascending first-doc_id of each checkpoint
    partition; when given, every segment row is tagged with its
    partition and groups never straddle a partition boundary, so one
    wave pipeline can build many partitions at once (one actor pool +
    one merge shuffle instead of one per partition)."""
    doc_ids = batch["doc_id"].to_numpy()
    if len(doc_ids) > 1 and not np.all(doc_ids[1:] > doc_ids[:-1]):
        # the delta encoding below requires ascending doc_ids WITHIN the
        # batch (cross-batch disjointness is the builder's invariant,
        # but a read task may coalesce docs files out of doc-range
        # order); a negative gap would wrap to ~2^64 in the uint64
        # varbyte stream and corrupt the index silently
        order0 = np.argsort(doc_ids, kind="mergesort")
        batch = batch.take(pa.array(order0))
        doc_ids = batch["doc_id"].to_numpy()
    doclens = batch["doclen"].to_numpy()
    texts = batch["text"].combine_chunks()
    if cfg.store_prior:
        # per-doc prior = char length of the UNTRUNCATED raw text (the
        # reference's pagerank slot in the posting payload,
        # Search.java:89-108); measured before any role/tool prepend
        import pyarrow.compute as pc

        # fill_null: a null text row must yield prior 0, not an
        # ArrowInvalid from the zero-copy-only numpy conversion
        priors = (
            pc.fill_null(pc.utf8_length(texts), 0).to_numpy().astype(np.int64)
        )
    else:
        priors = None
    if cfg.index_role_tool:
        # analog of the reference's URL-token indexing (host/path tokens
        # prepended to the page text, Indexer.java:236-238)
        import pyarrow.compute as pc

        # fill_null on every operand: binary_join_element_wise emits
        # null for the WHOLE row if any input is null (a tool=null turn
        # would silently drop the entire document from the index)
        texts = pc.binary_join_element_wise(
            pc.fill_null(batch["role"].combine_chunks(), ""),
            pc.fill_null(batch["tool"].combine_chunks(), ""),
            pc.fill_null(texts, ""),
            " ",
        )
    tb = tokenize_batch(texts, cfg, stemmer)
    if len(tb.term_code) == 0:
        return SEGMENT_SCHEMA.empty_table()
    if cfg.index_role_tool:
        # the stored doclen must count the stream actually indexed —
        # with role/tool prepended, positions run over the augmented
        # stream, and the normative invariant is doclen == max
        # position. The docs-store doclen (text-only) would make BM25
        # normalize role-term tf with a length that excludes the
        # tokens that produced it, and break position <= doclen.
        doclens = tb.doclens.astype(np.int64)

    # ---- aggregate exploded tokens to (term, doc) entries ----
    # (codes group contiguously under lexsort regardless of lexical
    # order — the global term order comes from the merge-stage sort)
    uniq_terms, term_code = tb.dictionary, tb.term_code
    tok_doc_local = tb.doc_idx
    order = np.lexsort((tb.positions, tok_doc_local, term_code))
    tc = term_code[order]
    dl_local = tok_doc_local[order]
    pos_sorted = tb.positions[order].astype(np.int64)

    entry_change = np.empty(len(tc), dtype=bool)
    entry_change[0] = True
    np.logical_or(tc[1:] != tc[:-1], dl_local[1:] != dl_local[:-1], out=entry_change[1:])
    entry_tok_start = np.flatnonzero(entry_change)              # token idx of each entry
    entry_tok_end = np.concatenate([entry_tok_start[1:], [len(tc)]])
    tf = (entry_tok_end - entry_tok_start).astype(np.int64)     # per-entry term frequency

    entry_term = tc[entry_tok_start]
    entry_local = dl_local[entry_tok_start]
    entry_doc = doc_ids[entry_local]
    entry_doclen = doclens[entry_local]

    # ---- group entries by (term, [part,] bucket) ----
    bucket = (entry_doc // cfg.doc_bucket_size).astype(np.int64)
    if part_bounds is not None:
        slot = np.searchsorted(part_bounds, entry_doc, side="right") - 1
        if slot.size and slot.min() < 0:
            # a doc below every bound would WRAP to part_ids[-1] and be
            # committed under the wrong partition with a lying manifest
            raise ValueError(
                f"doc_id {int(entry_doc[slot.argmin()])} below the first "
                f"partition bound {int(part_bounds[0])}"
            )
        part = (part_ids[slot] if part_ids is not None else slot).astype(np.int32)
    else:
        part = np.zeros(len(entry_doc), dtype=np.int32)
    n_entries = len(entry_term)
    grp_change = np.empty(n_entries, dtype=bool)
    grp_change[0] = True
    np.logical_or(
        entry_term[1:] != entry_term[:-1], bucket[1:] != bucket[:-1], out=grp_change[1:]
    )
    np.logical_or(grp_change[1:], part[1:] != part[:-1], out=grp_change[1:])
    grp_start = np.flatnonzero(grp_change)                      # entry idx of group start
    grp_end = np.concatenate([grp_start[1:], [n_entries]])
    n_groups = len(grp_start)

    # per-group stats
    df = (grp_end - grp_start).astype(np.int32)
    first_doc = entry_doc[grp_start]
    last_doc = entry_doc[grp_end - 1]
    max_tf = np.maximum.reduceat(tf, grp_start).astype(np.int32)
    min_doclen = np.minimum.reduceat(entry_doclen, grp_start).astype(np.int32)

    # ---- doc-gap stream (first value of each group absolute) ----
    doc_gaps = np.empty(n_entries, dtype=np.int64)
    doc_gaps[0] = entry_doc[0]
    np.subtract(entry_doc[1:], entry_doc[:-1], out=doc_gaps[1:])
    doc_gaps[grp_start] = entry_doc[grp_start]
    doc_blob, doc_boff = vb.encode_offsets(doc_gaps, np.concatenate([grp_start, [n_entries]]))

    # ---- tf stream ----
    tf_blob, tf_boff = vb.encode_offsets(tf, np.concatenate([grp_start, [n_entries]]))

    # ---- per-posting doclen stream: scoring needs doclen per posting;
    # storing it here (~1 byte/posting) keeps query shards fully
    # self-contained — no O(N) doclen table on the driver or actors ----
    dl_blob, dl_boff = vb.encode_offsets(
        entry_doclen.astype(np.int64), np.concatenate([grp_start, [n_entries]])
    )

    # ---- per-posting prior stream (optional, ~1-2 bytes/posting) ----
    if priors is not None:
        pr_blob, pr_boff = vb.encode_offsets(
            priors[entry_local], np.concatenate([grp_start, [n_entries]])
        )
        pr_col = vb.binary_column(pr_blob, pr_boff)
    else:
        pr_col = pa.nulls(n_groups, pa.large_binary())

    # ---- position stream (gaps reset at each entry) ----
    if cfg.positions:
        pos_gaps = np.empty(len(pos_sorted), dtype=np.int64)
        pos_gaps[0] = pos_sorted[0]
        np.subtract(pos_sorted[1:], pos_sorted[:-1], out=pos_gaps[1:])
        pos_gaps[entry_tok_start] = pos_sorted[entry_tok_start]
        grp_tok_offsets = np.concatenate([entry_tok_start[grp_start], [len(pos_sorted)]])
        pos_blob, pos_boff = vb.encode_offsets(pos_gaps, grp_tok_offsets)
        pos_col = vb.binary_column(pos_blob, pos_boff)
    else:
        pos_col = pa.nulls(n_groups, pa.large_binary())

    return pa.table(
        {
            "term": pa.array(uniq_terms[entry_term[grp_start]], pa.string()),
            "part": pa.array(part[grp_start], pa.int32()),
            "bucket": pa.array(bucket[grp_start].astype(np.int32), pa.int32()),
            "first_doc": pa.array(first_doc, pa.int64()),
            "last_doc": pa.array(last_doc, pa.int64()),
            "df": pa.array(df, pa.int32()),
            "max_tf": pa.array(max_tf, pa.int32()),
            "min_doclen": pa.array(min_doclen, pa.int32()),
            "doc_bytes": vb.binary_column(doc_blob, doc_boff),
            "tf_bytes": vb.binary_column(tf_blob, tf_boff),
            "dl_bytes": vb.binary_column(dl_blob, dl_boff),
            "pos_bytes": pos_col,
            "pr_bytes": pr_col,
        }
    )
