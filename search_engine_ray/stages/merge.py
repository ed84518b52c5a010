"""Posting-segment merge — the term-keyed shuffle.

Ray-Data-first equivalent of the reference's
``foldByKey("", concat)`` posting merge
(`/root/reference/src/cis5550/jobs_archive/IndexerParallel.java:226-248`),
expressed as ``sort(["term","bucket","first_doc"])`` (the all-to-all
exchange, range-partitioned by Ray) followed by a fully-vectorized
``map_batches`` that concatenates all partials of each
``(term, bucket)`` group inside a batch.

Because partial segments are already varbyte streams whose first doc
value is absolute, concatenation is: splice the first varint of each
subsequent blob into a gap relative to the previous segment's
``last_doc`` (``varbyte.rebase_first``) and join the bytes; tf and
position streams concatenate as-is. Merging is associative, so this
stage is idempotent — its output rows have the same schema and can be
re-merged (used for hierarchical compaction and for the per-partition
resume path).

A (term, bucket) group that straddles a sort-block boundary simply
yields more than one final segment row; segments of a term are always
disjoint, ascending doc ranges, so readers concatenate them in
``(bucket, first_doc)`` order. Skew: group size is bounded by
``doc_bucket_size`` postings by construction, so hot terms cannot
create a straggler group.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import IndexConfig
from ..functions import varbyte as vb


def merge_partials(partials, cfg: IndexConfig | None = None):
    """partials: Dataset of SEGMENT_SCHEMA rows -> merged Dataset."""
    s = partials.sort(["term", "bucket", "first_doc"])
    return s.map_batches(merge_segment_batch, batch_format="pyarrow", batch_size=None)


def merge_segment_batch(batch: pa.Table) -> pa.Table:
    """Concatenate consecutive rows with equal (term, bucket).

    The batch must be sorted by (term, bucket, first_doc); doc ranges of
    same-group rows must be disjoint and ascending (guaranteed by the
    builder's block-disjointness invariant; asserted here).
    """
    n = batch.num_rows
    if n == 0:
        return batch
    term = batch["term"].combine_chunks()
    term_code = term.dictionary_encode().indices.to_numpy(zero_copy_only=False)
    bucket = batch["bucket"].to_numpy()
    first_doc = batch["first_doc"].to_numpy()
    last_doc = batch["last_doc"].to_numpy()

    change = np.empty(n, dtype=bool)
    change[0] = True
    np.logical_or(term_code[1:] != term_code[:-1], bucket[1:] != bucket[:-1], out=change[1:])
    if "part" in batch.column_names:
        # checkpoint partitions commit independently — never merge across
        # them (part is monotone in first_doc within a (term, bucket))
        part = batch["part"].to_numpy()
        np.logical_or(change[1:], part[1:] != part[:-1], out=change[1:])
    grp_start = np.flatnonzero(change)
    grp_end = np.concatenate([grp_start[1:], [n]])
    if len(grp_start) == n:
        return batch  # nothing to merge

    within = ~change
    if within.any():
        prev_last = last_doc[np.flatnonzero(within) - 1]
        if not (first_doc[np.flatnonzero(within)] > prev_last).all():
            raise AssertionError("interleaved partial segments for the same (term, bucket)")

    df = np.add.reduceat(batch["df"].to_numpy().astype(np.int64), grp_start)
    max_tf = np.maximum.reduceat(batch["max_tf"].to_numpy(), grp_start)
    min_doclen = np.minimum.reduceat(batch["min_doclen"].to_numpy(), grp_start)

    doc_bytes = batch["doc_bytes"].to_pylist()
    tf_bytes = batch["tf_bytes"].to_pylist()
    pos_bytes = batch["pos_bytes"].to_pylist()
    has_pos = pos_bytes[0] is not None

    out_doc, out_tf, out_pos = [], [], []
    for g in range(len(grp_start)):
        s, e = grp_start[g], grp_end[g]
        if e - s == 1:
            out_doc.append(doc_bytes[s])
            out_tf.append(tf_bytes[s])
            out_pos.append(pos_bytes[s])
            continue
        parts = [doc_bytes[s]]
        for i in range(s + 1, e):
            parts.append(vb.rebase_first(doc_bytes[i], int(first_doc[i] - last_doc[i - 1])))
        out_doc.append(b"".join(parts))
        out_tf.append(b"".join(tf_bytes[s:e]))
        out_pos.append(b"".join(pos_bytes[s:e]) if has_pos else None)

    cols = {
            "term": term.take(pa.array(grp_start)),
            "bucket": batch["bucket"].take(pa.array(grp_start)),
            "first_doc": pa.array(first_doc[grp_start], pa.int64()),
            "last_doc": pa.array(last_doc[grp_end - 1], pa.int64()),
            "df": pa.array(df.astype(np.int32), pa.int32()),
            "max_tf": pa.array(max_tf, pa.int32()),
            "min_doclen": pa.array(min_doclen, pa.int32()),
            "doc_bytes": pa.array(out_doc, pa.large_binary()),
            "tf_bytes": pa.array(out_tf, pa.large_binary()),
            "pos_bytes": pa.array(out_pos, pa.large_binary()),
    }
    if "part" in batch.column_names:
        cols["part"] = batch["part"].take(pa.array(grp_start))
    return pa.table(cols)
