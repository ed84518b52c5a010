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

from ..functions import varbyte as vb


def merge_partials(partials):
    """partials: Dataset of SEGMENT_SCHEMA rows -> merged Dataset.

    BUCKET-major sort key: with term-major order every hot term's byte
    mass lands in one reduce range (measured: a 97 MB reduce block vs
    1.5 MB mean on a 2.4M-turn corpus — an OOM-shaped straggler at
    cluster scale). Bucket-major spreads each hot term across every
    doc-range bucket, balancing ranges by bytes (max block 14 MB on
    the same corpus) — this ordering IS the salting of high-DF terms:
    the shuffle key (bucket, term) splits a skewed term into bounded
    doc-range groups. Merging only needs same-(term,bucket,part) rows
    adjacent, which any grouping order satisfies."""
    s = partials.sort(["bucket", "term", "first_doc"])
    return s.map_batches(merge_segment_batch, batch_format="pyarrow", batch_size=None)


def _binary_parts(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(byte offsets int64[n+1], values uint8) views of a LargeBinaryArray."""
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    buf = arr.buffers()[2]
    data = (
        np.frombuffer(buf, dtype=np.uint8) if buf is not None else np.empty(0, np.uint8)
    )
    return offs, data


def _binary_from(offsets: np.ndarray, values: np.ndarray) -> pa.Array:
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(),
        len(offsets) - 1,
        [None, pa.py_buffer(offsets.astype(np.int64).tobytes()), pa.py_buffer(values.tobytes())],
    )


def _gather_spans(src: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenate many (start, len) spans of ``src`` — one vectorized
    gather, no Python per-span loop."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.uint8)
    dst_ends = np.cumsum(lens)
    dst_starts = dst_ends - lens
    idx = np.arange(total, dtype=np.int64)
    piece = np.searchsorted(dst_ends, idx, side="right")
    return src[starts[piece] + (idx - dst_starts[piece])]


def merge_segment_batch(batch: pa.Table) -> pa.Table:
    """Concatenate consecutive rows with equal (term, bucket[, part]).

    The batch must be sorted by (bucket, term, first_doc) — the
    bucket-major skew-balancing key ``merge_partials`` uses; any order
    that makes same-(term, bucket[, part]) rows adjacent works. Doc
    ranges of same-group rows must be disjoint and ascending
    (guaranteed by the builder's block-disjointness invariant; asserted
    here).

    Vectorized: tf/pos streams of consecutive rows are CONTIGUOUS in
    the Arrow values buffer, so group concatenation is just new
    offsets (zero-copy); the doc-gap stream needs each continuation
    row's first varint rebased from absolute doc_id to a gap, done
    with one vectorized span-gather over the whole batch.
    """
    n = batch.num_rows
    out_order = [
        "term", "bucket", "first_doc", "last_doc", "df", "max_tf",
        "min_doclen", "doc_bytes", "tf_bytes", "dl_bytes", "pos_bytes",
    ] + [c for c in ("pr_bytes", "part") if c in batch.column_names]
    if n == 0:
        # project even the empty block: Ray's sort range-partitioning
        # can emit 0-row blocks, and a field-order mismatch against the
        # non-empty outputs breaks strict schema checks downstream
        return batch.select(out_order)
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
        # nothing to merge — still project to the canonical column
        # order so fast-path and rebuilt blocks share one schema
        return batch.select(out_order)

    w = np.flatnonzero(~change)  # continuation rows
    if len(w):
        if not (first_doc[w] > last_doc[w - 1]).all():
            raise AssertionError("interleaved partial segments for the same (term, bucket)")

    df = np.add.reduceat(batch["df"].to_numpy().astype(np.int64), grp_start)
    max_tf = np.maximum.reduceat(batch["max_tf"].to_numpy(), grp_start)
    min_doclen = np.minimum.reduceat(batch["min_doclen"].to_numpy(), grp_start)

    grp_bounds = np.concatenate([grp_start, [n]])

    # ---- tf / dl / pos: contiguous rows -> group-level offsets, zero-copy ----
    tf_arr = batch["tf_bytes"].combine_chunks().cast(pa.large_binary())
    tf_offs, tf_data = _binary_parts(tf_arr)
    out_tf = _binary_from(tf_offs[grp_bounds], tf_data)

    dl_arr = batch["dl_bytes"].combine_chunks().cast(pa.large_binary())
    dl_offs, dl_data = _binary_parts(dl_arr)
    out_dl = _binary_from(dl_offs[grp_bounds], dl_data)

    pos_arr = batch["pos_bytes"].combine_chunks().cast(pa.large_binary())
    has_pos = pos_arr.null_count < n
    if has_pos:
        pos_offs, pos_data = _binary_parts(pos_arr)
        out_pos = _binary_from(pos_offs[grp_bounds], pos_data)
    else:
        out_pos = pa.nulls(len(grp_start), pa.large_binary())

    # prior stream (optional): plain per-posting values, concat as-is
    if "pr_bytes" in batch.column_names:
        pr_arr = batch["pr_bytes"].combine_chunks().cast(pa.large_binary())
        if pr_arr.null_count < n:
            pr_offs, pr_data = _binary_parts(pr_arr)
            out_pr = _binary_from(pr_offs[grp_bounds], pr_data)
        else:
            out_pr = pa.nulls(len(grp_start), pa.large_binary())
    else:
        out_pr = None

    # ---- doc gaps: rebase each continuation row's first varint ----
    doc_arr = batch["doc_bytes"].combine_chunks().cast(pa.large_binary())
    doc_offs, doc_data = _binary_parts(doc_arr)
    first_len = np.zeros(n, dtype=np.int64)
    if len(w):
        probe_idx = np.minimum(
            doc_offs[w][:, None] + np.arange(10, dtype=np.int64)[None, :],
            len(doc_data) - 1,
        )
        is_end = (doc_data[probe_idx] & 0x80) != 0
        first_len[w] = is_end.argmax(axis=1) + 1
        gaps = (first_doc[w] - last_doc[w - 1]).astype(np.uint64)
        var_blob, var_offs = vb.encode_offsets(
            gaps, np.arange(len(w) + 1, dtype=np.int64)
        )
        var_data = np.frombuffer(var_blob, dtype=np.uint8)
    else:
        var_data = np.empty(0, np.uint8)
        var_offs = np.zeros(1, dtype=np.int64)

    # two pieces per row: [new varint (continuation rows only)] + [body]
    src = np.concatenate([doc_data, var_data])
    starts2 = np.zeros(2 * n, dtype=np.int64)
    lens2 = np.zeros(2 * n, dtype=np.int64)
    if len(w):
        starts2[2 * w] = len(doc_data) + var_offs[:-1]
        lens2[2 * w] = np.diff(var_offs)
    starts2[1::2] = doc_offs[:-1] + first_len
    lens2[1::2] = doc_offs[1:] - starts2[1::2]
    out_doc_values = _gather_spans(src, starts2, lens2)
    row_out_ends = np.cumsum(lens2[0::2] + lens2[1::2])
    out_doc_offs = np.concatenate([[0], row_out_ends[grp_bounds[1:] - 1]])
    out_doc = _binary_from(out_doc_offs, out_doc_values)

    cols = {
            "term": term.take(pa.array(grp_start)),
            "bucket": batch["bucket"].take(pa.array(grp_start)),
            "first_doc": pa.array(first_doc[grp_start], pa.int64()),
            "last_doc": pa.array(last_doc[grp_end - 1], pa.int64()),
            "df": pa.array(df.astype(np.int32), pa.int32()),
            "max_tf": pa.array(max_tf, pa.int32()),
            "min_doclen": pa.array(min_doclen, pa.int32()),
            "doc_bytes": out_doc,
            "tf_bytes": out_tf,
            "dl_bytes": out_dl,
            "pos_bytes": out_pos,
    }
    if out_pr is not None:
        cols["pr_bytes"] = out_pr
    if "part" in batch.column_names:
        cols["part"] = batch["part"].take(pa.array(grp_start))
    return pa.table(cols)
