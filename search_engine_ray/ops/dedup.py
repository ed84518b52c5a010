"""Deduplication operators over the ``documents`` table.

Extends the reference's two dedup mechanisms — exact RDD ``distinct``
via key collision (`/root/reference/homework_code/flame/Worker.java:463-491`)
and the crawler's exact-content ``canonicalURL`` check
(`/root/reference/src/cis5550/jobs/Crawler.java:1348-1386`) — with the
near-dup family a training-data pipeline needs: MinHash+LSH, SimHash,
n-gram Jaccard, embedding cosine.

All hashing is stable and SQL-mirrorable: token/shingle hashes are the
first 60 bits of md5 (DuckDB: ``('0x'||substr(md5(s),1,15))::BIGINT``),
so every operator here has a DuckDB oracle. Nothing materializes the
corpus on the driver: pair generation is a shingle/band-keyed groupby
shuffle, sizes/verification travel as datasets through joins, and the
driver only ever sees the final (small) pair table.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..io import (collect_sorted_i64, docs_path, empty_dataset, join_np,
                  parquet_rows, read_parquet_light, sorted_member)

from ..config import IndexConfig
from ..functions.analysis import split_tokens_arrow
from .knn import _emb_matrix, _read_emb

_CFG = IndexConfig(stemming=False)

_MD5_SQL = "('0x' || substr(md5({0}), 1, 15))::BIGINT"

_read_light = read_parquet_light

def _npart() -> int:
    """Hash-join partition count sized to the cluster: each partition
    pins a 1-CPU aggregator actor, so a count near num_cpus deadlocks
    small clusters when several shuffles run concurrently. Partitioning
    does not affect results."""
    cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(2, min(16, cpus // 4))


def _md5_60(s: str) -> int:
    """First 60 bits of md5 — bit-identical to the SQL twin above."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _md5_60_arr(strings: np.ndarray) -> np.ndarray:
    return np.fromiter(
        (_md5_60(s) for s in strings), dtype=np.int64, count=len(strings)
    )


def _hash60(strings) -> np.ndarray:
    """60-bit content hash of a string column (numpy object array,
    pa.Array or pa.ChunkedArray).

    Default: md5-60 — bit-identical to the SQL twin; every oracle-gated
    entry depends on this path. With ``config.FAST_CONTENT_HASH`` the
    hash is polars' vectorized xxhash64 (top 60 bits) — no per-string
    Python loop, for production runs where SQL mirrorability is not
    needed. Same dedup/shingle semantics either way."""
    from .. import config as _config

    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if _config.FAST_CONTENT_HASH:
        import polars as pl

        arr = strings if isinstance(strings, pa.Array) else pa.array(strings, pa.string())
        h = pl.from_arrow(arr).hash(seed=0).to_numpy().astype(np.uint64)
        return (h >> np.uint64(4)).astype(np.int64)
    obj = (strings.to_numpy(zero_copy_only=False)
           if isinstance(strings, pa.Array) else strings)
    return _md5_60_arr(obj)


def _ss_lookup(keys: np.ndarray, probes: np.ndarray) -> np.ndarray:
    """``searchsorted`` lookup that FAILS LOUDLY on a missing probe.
    The broadcast fast paths rely on the "probe key always present"
    invariant (pair docs always have size/shingle rows; edge endpoints
    are always in the node vector) — a silent miss would read a
    NEIGHBORING key's value, yielding a wrong Jaccard/label with no
    error. Two extra vector compares per batch, trivial next to the
    kernels this guards."""
    idx = np.searchsorted(keys, probes)
    if idx.size:
        bad = (idx >= len(keys)) | (keys[np.minimum(idx, len(keys) - 1)] != probes)
        if bad.any():
            raise AssertionError(
                f"broadcast lookup missed {int(bad.sum())}/{idx.size} probe "
                "key(s): the 'probe key always present' invariant broke "
                "upstream (candidate doc without size/shingle/node rows)"
            )
    return idx


# ---- exact dedup: hash-partition on content + per-group first ----

def hash_content_batch(t: pa.Table) -> pa.Table:
    """(doc_id, h) rows — the shared content-hash kernel for exact
    dedup (here and in prepare.prepare_corpus): null == empty text,
    mirrored by coalesce in both SQL twins."""
    texts = pc.fill_null(t["text"].combine_chunks(), "").to_numpy(zero_copy_only=False)
    return pa.table(
        {"doc_id": t["doc_id"], "h": pa.array(_hash60(texts), pa.int64())}
    )


def min_id_per_hash(g: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(survivor ids, copy counts) for a (doc_id, h) partition — the
    shared exact-dedup survivor kernel (here and in
    prepare.prepare_corpus): smallest doc_id per hash run, vectorized
    lexsort + run detection."""
    h = g["h"].to_numpy()
    ids = g["doc_id"].to_numpy()
    order = np.lexsort((ids, h))
    h, ids = h[order], ids[order]
    starts = np.flatnonzero(np.concatenate([[True], h[1:] != h[:-1]]))
    counts = np.diff(np.concatenate([starts, [len(h)]]))
    return ids[starts], counts.astype(np.int64)


def dedup_exact(sf_dir: str):
    """Groups identical texts; keeps the smallest doc_id (the analog of
    KVS key collision where last-write-wins — made deterministic).
    The shuffle key is the md5-60 content hash computed per batch, not
    the text itself — at 100 TB the groupby would otherwise move every
    document's full bytes through the exchange. The survivor pick is
    partition-vectorized (``_reduce_keyed``): the hash groups are
    near-singletons, so ``groupby(h).aggregate(Min, Count)`` would pay
    Ray's per-group Python cost N times. The oracle groups by the same
    hash."""
    ds = _read_light(docs_path(sf_dir), columns=["doc_id", "text"])
    hashed = ds.map_batches(hash_content_batch, batch_format="pyarrow")

    def survivors(g: pa.Table) -> pa.Table:
        keep, counts = min_id_per_hash(g)
        return pa.table(
            {
                "keep_doc_id": pa.array(keep, pa.int64()),
                "n_copies": pa.array(counts, pa.int64()),
            }
        )

    out_schema = pa.schema([("keep_doc_id", pa.int64()), ("n_copies", pa.int64())])
    # union with a typed empty: an all-empty map_groups output loses
    # its schema in Ray 2.49, and an empty corpus must still present
    # the op's columns
    return empty_dataset(out_schema).union(
        _reduce_keyed(hashed, "h", _npart() * 8, survivors,
                      rows_hint=parquet_rows(docs_path(sf_dir)))
    )


# coalesce: the Ray side folds null texts into the empty-string hash
# group (fill_null in hash_content_batch); md5(NULL) would instead stay
# a separate NULL group and the twins would diverge on null-bearing data
SQL_DEDUP_EXACT = f"""
SELECT MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY {_MD5_SQL.format("coalesce(text, '')")}
"""


# ---- shingling (vectorized, shared by minhash + ngram-jaccard) ----

_SHINGLE_K = 3

# SQL twin of _shingle_batch: word-k-gram strings per doc (distinct);
# docs shorter than k tokens contribute one shingle of all their tokens.
_SQL_SHINGLES = f"""
arrs AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(substr(text, 1, 10000)), '[^0-9a-z]+'),
                       x -> x <> '') AS arr
    FROM documents
),
tri AS (
    SELECT DISTINCT doc_id,
           arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2] AS sh
    FROM arrs, UNNEST(range(1, len(arr) - 1)) t(i)
    WHERE len(arr) >= {_SHINGLE_K}
    UNION
    SELECT doc_id, array_to_string(arr, ' ') AS sh
    FROM arrs WHERE len(arr) < {_SHINGLE_K} AND len(arr) > 0
)
"""


def _shingle_batch(t: pa.Table, hashed: bool) -> pa.Table:
    """(doc_id, sh) rows: DISTINCT word-trigram shingles per doc,
    built with vectorized Arrow kernels (shifted binary_join), no
    per-doc Python loop. ``hashed=True`` emits the md5-60 int instead
    of the string (same identity as the SQL twin's md5 of the string).
    Docs with 0 < n < k tokens emit one whole-doc shingle; empty docs
    emit nothing."""
    doc_idx, flat, _pos, _lens, doclens = split_tokens_arrow(
        t["text"].combine_chunks(), _CFG
    )
    doc_ids = t["doc_id"].to_numpy()
    n = len(flat)
    k = _SHINGLE_K
    parts = []
    if n >= k:
        sh = pc.binary_join_element_wise(
            flat.slice(0, n - k + 1), flat.slice(1, n - k + 1), flat.slice(2, n - k + 1), " "
        )
        valid = doc_idx[: n - k + 1] == doc_idx[k - 1 :]
        parts.append((doc_idx[: n - k + 1][valid],
                      sh.filter(pa.array(valid)).to_numpy(zero_copy_only=False)))
    short = np.flatnonzero((doclens > 0) & (doclens < k))
    if short.size:
        bounds = np.concatenate([[0], np.cumsum(doclens.astype(np.int64))])
        toks = flat.to_numpy(zero_copy_only=False)
        parts.append((short.astype(np.int64),
                      np.array([" ".join(toks[bounds[d]: bounds[d + 1]]) for d in short],
                               dtype=object)))
    if not parts:
        empty_sh = (pa.array([], pa.int64()) if hashed else pa.array([], pa.string()))
        return pa.table({"doc_id": pa.array([], pa.int64()), "sh": empty_sh,
                         "n_sh": pa.array([], pa.int64())})
    own = np.concatenate([p[0] for p in parts])
    sh_all = np.concatenate([p[1] for p in parts])
    # distinct (doc, shingle): lexsort + drop consecutive dups (vectorized)
    h_all = _hash60(sh_all)
    order = np.lexsort((h_all, own))
    own, sh_all, h_all = own[order], sh_all[order], h_all[order]
    first = np.ones(len(own), dtype=bool)
    first[1:] = (own[1:] != own[:-1]) | (h_all[1:] != h_all[:-1])
    own, sh_all, h_all = own[first], sh_all[first], h_all[first]
    sh_col = (pa.array(h_all, pa.int64()) if hashed
              else pa.array(sh_all, pa.string()))
    # per-doc distinct-shingle count, attached to every row: a doc's
    # shingles all come from THIS call, so set sizes need no shuffle
    # (the ngram path recomputes sizes post-df-cap instead)
    n_per_doc = np.bincount(own, minlength=len(doc_ids))
    return pa.table({"doc_id": pa.array(doc_ids[own], pa.int64()), "sh": sh_col,
                     "n_sh": pa.array(n_per_doc[own], pa.int64())})


# ---- MinHash + LSH near-dup pairs, verified with exact Jaccard ----

_N_PERM = 64
_BANDS = 16  # 16 bands x 4 rows
_BAND_BUCKET_CAP = 4096  # max docs per (band, hash) bucket for pair generation
_ROWS = _N_PERM // _BANDS
_MERSENNE = (1 << 61) - 1
_rng = np.random.RandomState(4242)
_PERM_A = _rng.randint(1, _MERSENNE, size=_N_PERM).astype(np.uint64)  # full [1, M)
_PERM_B = _rng.randint(0, _MERSENNE, size=_N_PERM).astype(np.uint64)


def _perm_hash(p: int, x: np.ndarray) -> np.ndarray:
    """(a_p * x + b_p) mod (2^61 - 1), a_p spanning the FULL modulus,
    in pure uint64 numpy (split multiply + Mersenne fold, 2^61 ≡ 1).

    The multiplier range is the point: an earlier version drew
    a < 2^29 so ``a*x`` would fit uint64 directly — but then ``a*x``
    spans at most ~one modulus and the "permutation" is piecewise
    linear with ≤2 segments, so its minimum lands on the doc's
    smallest 1-2 shingle values for EVERY perm. Measured at 2.4M docs:
    unrelated docs sharing one small shingle agreed on ~half of all 64
    perms (true j ~ 0.02), inflating LSH candidates to 12.8M of which
    10 were real. With a full-range multiplier the min-match rate is
    the textbook E[match] = jaccard. ``x`` must be < 2^32 (the low 32
    bits of the 60-bit shingle hash; truncation collisions at 66M
    distinct shingles are ~1e-7 per doc pair, negligible next to the
    banding error itself)."""
    M = np.uint64(_MERSENNE)
    a = _PERM_A[p]
    t1 = (a & np.uint64(0xFFFFFFFF)) * x  # a_lo * x < 2^64
    t1 = (t1 >> np.uint64(61)) + (t1 & M)  # < 2^61 + 8
    t2 = (a >> np.uint64(32)) * x  # a_hi * x < 2^61
    # t2 * 2^32 mod M, via 2^61 ≡ 1: top 29 bits wrap to the bottom
    t2 = (t2 >> np.uint64(29)) + ((t2 & np.uint64((1 << 29) - 1)) << np.uint64(32))
    v = t1 + t2  # < 2^62 + small
    v = (v >> np.uint64(61)) + (v & M)
    v = v + _PERM_B[p]  # < 2^62
    v = (v >> np.uint64(61)) + (v & M)
    return np.where(v >= M, v - M, v)
_BAND_MIX = np.uint64(0x9E3779B97F4A7C15)


def _band_rows(t: pa.Table) -> pa.Table:
    """(doc_id, band, band_hash) rows for a batch of (doc_id, sh-hash)
    shingle rows — fully vectorized: permutation mins via
    np.minimum.reduceat over doc ranges, band hashes via a mix-fold.

    MUST be fed doc-complete batches (all of a doc's shingle rows in
    one call): a doc split across batches would get partial-minimum
    signatures. ``_bands_from_docs`` guarantees this by banding
    straight off the documents table (one input row = one whole doc);
    do not map this over a re-blocked shingle dataset."""
    # low 32 bits of the 60-bit shingle hash: _perm_hash's split
    # multiply needs x < 2^32 (see its docstring for the collision
    # budget at this truncation)
    sh = t["sh"].to_numpy().astype(np.uint64) & np.uint64(0xFFFFFFFF)
    doc = t["doc_id"].to_numpy()
    order = np.argsort(doc, kind="mergesort")
    doc, sh = doc[order], sh[order]
    uniq_docs, starts = np.unique(doc, return_index=True)
    nd = len(uniq_docs)
    # FULL-set shingle count per doc (constant on every row, computed
    # by _shingle_batch BEFORE any hot exclusion): rides on the band
    # rows so pair generation can apply the exact size-ratio filter
    # (j <= min/max) without a size join
    nsh_doc = t["n_sh"].to_numpy(zero_copy_only=False)[order][starts].astype(np.int64)
    sig = np.empty((_N_PERM, nd), dtype=np.uint64)
    for p in range(_N_PERM):  # 64 vectorized passes, no per-doc loop
        sig[p] = np.minimum.reduceat(_perm_hash(p, sh), starts)
    band_hash = np.empty((_BANDS, nd), dtype=np.uint64)
    for b in range(_BANDS):
        acc = np.zeros(nd, dtype=np.uint64)
        for r in range(_ROWS):
            acc = (acc ^ sig[b * _ROWS + r]) * _BAND_MIX
        band_hash[b] = acc
    return pa.table(
        {
            "doc_id": pa.array(np.tile(uniq_docs, _BANDS), pa.int64()),
            "band": pa.array(np.repeat(np.arange(_BANDS, dtype=np.int32), nd), pa.int32()),
            "band_hash": pa.array(band_hash.reshape(-1).view(np.int64), pa.int64()),
            "n_sh": pa.array(np.tile(nsh_doc, _BANDS), pa.int64()),
        }
    )


_PAIRS_SCHEMA = pa.schema(
    [("doc_a", pa.int64()), ("doc_b", pa.int64()),
     ("inter", pa.int64()), ("jaccard", pa.float64())]
)


def _pair_doc_lookup(pairs, sizes, a_col: str = "doc_a", b_col: str = "doc_b"):
    """Bounded per-doc size lookup for a SIZE-GATED pair table: pull
    the pair tables' two int64 id columns (<= 2x pairs, gated by the
    caller), restrict ``sizes`` to exactly those docs with a broadcast
    membership probe (distributed, zero shuffle), and return the
    resulting (sorted doc_ids, n_sh) arrays as one ``ray.put`` object —
    the lookup side of a searchsorted join. Driver peak is O(pairs),
    never O(corpus docs)."""
    cols = []
    for b in pairs.select_columns([a_col, b_col]).iter_batches(batch_format="pyarrow"):
        cols.append(b[a_col].to_numpy())
        cols.append(b[b_col].to_numpy())
    pair_docs = np.unique(np.concatenate(cols))  # sorted by construction
    pref = ray.put(pair_docs)

    def only_pair_docs(t: pa.Table, _ref=pref) -> pa.Table:
        hit = sorted_member(ray.get(_ref), t["doc_id"].to_numpy())
        return t.filter(pa.array(hit))

    d_parts, n_parts = [], []
    for b in sizes.map_batches(only_pair_docs, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        d_parts.append(b["doc_id"].to_numpy())
        n_parts.append(b["n_sh"].to_numpy(zero_copy_only=False))
    d = np.concatenate(d_parts or [np.empty(0, np.int64)])
    n = np.concatenate(n_parts or [np.empty(0, np.int64)]).astype(np.int64)
    order = np.argsort(d)
    return ray.put((d[order], n[order]))


# pair-gated broadcast budget: below this many candidate pairs the
# verify tail ships one bounded lookup instead of shuffle-joining the
# per-doc table (4M pairs -> ~128 MB of driver/plasma arrays worst case)
_BCAST_PAIR_ROWS = 4_000_000


def _sizes_and_threshold(inter, sizes, threshold: float):
    """Shared verify tail: join per-pair intersection counts with the
    two per-doc set sizes (both datasets, never driver state) and
    threshold the Jaccard inside map_batches. Returns
    (doc_a, doc_b, inter, jaccard).

    ``inter`` is materialized here: it is the SMALL output of the big
    pair-generation shuffle, its count guards the empty case (a clean
    corpus has no candidate pairs — Ray 2.49's join crashes on an
    empty side), and the count sizes the join partitioning. ``sizes``
    arrives materialized from the caller (its count is free, and it is
    the smaller side in dup-heavy corpora — a 60-doc clone cluster has
    ~1770 pairs but only 60 size rows); the join outputs stay lazy.

    Under ``_BCAST_PAIR_ROWS`` the two shuffle joins collapse to one
    broadcast (doc_id -> n_sh) lookup probed by searchsorted inside a
    single map over the pair rows — identical rows, two fewer
    all-to-all exchanges; above the gate (a pathologically dup-heavy
    corpus) the join path below is unchanged."""
    inter = inter.materialize()
    n_pairs = inter.count()
    if n_pairs == 0:
        return empty_dataset(_PAIRS_SCHEMA)
    if n_pairs <= _BCAST_PAIR_ROWS:
        lut = _pair_doc_lookup(inter, sizes)

        def finish_bcast(t: pa.Table, _lut=lut) -> pa.Table:
            kd, kn = ray.get(_lut)  # plasma read, shared per node
            da = t["doc_a"].to_numpy()
            db = t["doc_b"].to_numpy()
            # every pair doc has a size row (pairs and sizes derive
            # from the same shingle table); _ss_lookup asserts it
            n_a = kn[_ss_lookup(kd, da)]
            n_b = kn[_ss_lookup(kd, db)]
            inter_n = t["inter"].to_numpy(zero_copy_only=False).astype(np.int64)
            union = n_a + n_b - inter_n
            j = np.round(inter_n / union, 6)
            keep = j >= threshold
            return pa.table(
                {
                    "doc_a": pa.array(da[keep], pa.int64()),
                    "doc_b": pa.array(db[keep], pa.int64()),
                    "inter": pa.array(inter_n[keep], pa.int64()),
                    "jaccard": pa.array(j[keep], pa.float64()),
                }
            )

        return inter.map_batches(finish_bcast, batch_format="pyarrow")
    np_ = join_np(min(n_pairs, sizes.count()), _npart())
    with_a = inter.join(
        sizes, join_type="inner", num_partitions=np_,
        on=("doc_a",), right_on=("doc_id",),
    ).map_batches(
        lambda t: pa.table({"doc_a": t["doc_a"], "doc_b": t["doc_b"],
                            "inter": t["inter"], "n_a": t["n_sh"]}),
        batch_format="pyarrow",
    )
    with_b = with_a.join(
        sizes, join_type="inner", num_partitions=np_,
        on=("doc_b",), right_on=("doc_id",),
    )

    def finish(t: pa.Table) -> pa.Table:
        inter_n = t["inter"].to_numpy().astype(np.int64)
        union = t["n_a"].to_numpy().astype(np.int64) + t["n_sh"].to_numpy().astype(np.int64) - inter_n
        j = np.round(inter_n / union, 6)
        keep = j >= threshold
        return pa.table(
            {
                "doc_a": pa.array(t["doc_a"].to_numpy()[keep], pa.int64()),
                "doc_b": pa.array(t["doc_b"].to_numpy()[keep], pa.int64()),
                "inter": pa.array(inter_n[keep], pa.int64()),
                "jaccard": pa.array(j[keep], pa.float64()),
            }
        )

    return with_b.map_batches(finish, batch_format="pyarrow")


def _bands_from_docs(t: pa.Table, hot_ref=None) -> pa.Table:
    """Band rows straight off a documents batch (doc-complete by
    construction). ``hot_ref`` (optional): a ``ray.put`` sorted int64
    array of boilerplate shingle hashes (df > ``_DF_CAP``) to EXCLUDE
    from signatures — the minhash analog of the ngram path's df cap.
    Without it, a corpus whose token distribution is skewed (measured
    on the 2.4M transcript corpus: trigrams shared by 10^4-10^5 docs)
    makes the per-band minimum collapse to the same hot shingles for
    docs that are NOT near-duplicates, inflating band buckets to 10^4+
    docs and candidate pairs to ~10^9. Filtering only changes
    CANDIDATE RECALL, never the verify: exact Jaccard downstream still
    uses full shingle sets, so the SQL oracle is unchanged. A doc whose
    every shingle is boilerplate emits no bands (it has no distinctive
    content to match on)."""
    s = _shingle_batch(t, hashed=True)
    if hot_ref is not None:
        hot = ray.get(hot_ref)  # zero-copy plasma read, shared per node
        keep = ~sorted_member(hot, s["sh"].to_numpy())
        s = s.filter(pa.array(keep))
    return _band_rows(s)


def _pairs_in_partition(g: pa.Table, cap: int, key: str = "band_hash",
                        sizes_col: str | None = None) -> pa.Table:
    """Candidate pairs for ONE hash partition of band rows, vectorized.

    Grouping by (band, band_hash) directly costs one Python map_groups
    call per bucket — ~16 x n_docs calls, nearly all singletons (the
    measured cost center of the LSH pipeline). Instead the groupby key
    is (band, band_hash % P): complete buckets stay together (equal
    hash -> equal partition), but one call processes a whole partition:
    lexsort by hash, vectorized run detection, singleton runs
    eliminated with one mask, triu pairs only for the few real
    buckets. ``cap`` bounds per-bucket pair blowup as before.
    ``key`` names the bucket-hash column (band_hash for minhash
    banding, sh for the shared-shingle path — one pair row per run
    preserves the per-shingle multiplicity that path counts).
    ``sizes_col`` (optional): a per-doc set-size column to carry onto
    the pairs as ``n_a``/``n_b`` — feeds the exact size-ratio
    pre-filter (j = |A∩B|/|A∪B| <= min(|A|,|B|)/max(|A|,|B|))."""
    h = g[key].to_numpy()
    d = g["doc_id"].to_numpy()
    order = np.lexsort((d, h))
    h, d = h[order], d[order]
    nsh = (g[sizes_col].to_numpy(zero_copy_only=False)[order]
           if sizes_col is not None else None)
    starts = np.flatnonzero(np.concatenate([[True], h[1:] != h[:-1]]))
    ends = np.concatenate([starts[1:], [len(h)]])
    sizes = ends - starts
    sel = np.flatnonzero((sizes >= 2) & (sizes <= cap))
    if sel.size == 0:
        cols = {"doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64())}
        if sizes_col is not None:
            cols["n_a"] = pa.array([], pa.int64())
            cols["n_b"] = pa.array([], pa.int64())
        return pa.table(cols)
    out_a, out_b, out_na, out_nb = [], [], [], []
    for i in sel:  # only the non-singleton buckets (rare)
        ids = d[starts[i]:ends[i]]  # ascending (lexsort secondary key)
        a, b = np.triu_indices(len(ids), k=1)
        out_a.append(ids[a])
        out_b.append(ids[b])
        if nsh is not None:
            ns = nsh[starts[i]:ends[i]]
            out_na.append(ns[a])
            out_nb.append(ns[b])
    cols = {
        "doc_a": pa.array(np.concatenate(out_a), pa.int64()),
        "doc_b": pa.array(np.concatenate(out_b), pa.int64()),
    }
    if nsh is not None:
        cols["n_a"] = pa.array(np.concatenate(out_na).astype(np.int64), pa.int64())
        cols["n_b"] = pa.array(np.concatenate(out_nb).astype(np.int64), pa.int64())
    return pa.table(cols)


_PAIR_MIX = np.int64(-7046029254386353131)  # 2^64 / golden ratio, signed


def _add_pair_part(t: pa.Table, n_sub: int, a_col: str = "doc_a",
                   b_col: str = "doc_b") -> pa.Table:
    """Append ``ppart`` = deterministic hash of the id pair mod
    ``n_sub``: the shuffle key for partition-vectorized pair reduction
    (all rows of one pair land in one partition)."""
    a = t[a_col].to_numpy()
    b = t[b_col].to_numpy()
    part = ((a * _PAIR_MIX) ^ b) % n_sub  # int64 wrap is deterministic
    return t.append_column("ppart", pa.array(part.astype(np.int32), pa.int32()))


def _combine_pairs_partition(g: pa.Table, count_col: str | None = None,
                             out_count: str | None = None,
                             first_cols: tuple = (), min_cols: tuple = (),
                             a_col: str = "doc_a",
                             b_col: str = "doc_b") -> pa.Table:
    """Reduce ONE hash partition of pair rows to one row per distinct
    (a, b), fully vectorized (lexsort + run detection + reduceat).

    This replaces ``groupby([a_col, b_col]).aggregate(...)`` wherever
    the group count is near the row count: Ray 2.49's aggregate pays
    ~100us of Python per GROUP, so a million near-singleton pair
    groups costs ~2 CPU-minutes regardless of data size (measured: the
    ngram verify's pair aggregate at sf0.1 was 120 s of CPU for 20 MB
    of rows). One map_groups call per hash partition makes the cost
    O(partitions) Python calls + O(rows log rows) numpy — the same
    trick ``_pairs_in_partition`` plays for pair GENERATION.

    ``out_count``: emit a row count (or the sum of ``count_col``,
    for re-reducing partials) under this name. ``first_cols``: carry
    the first value per pair (for columns constant within a pair).
    ``min_cols``: per-pair minimum."""
    a = g[a_col].to_numpy()
    b = g[b_col].to_numpy()
    if len(a) == 0:
        cols = {a_col: pa.array([], pa.int64()), b_col: pa.array([], pa.int64())}
        if out_count is not None:
            cols[out_count] = pa.array([], pa.int64())
        for c in (*first_cols, *min_cols):
            cols[c] = g[c].slice(0, 0)
        return pa.table(cols)
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    starts = np.flatnonzero(
        np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
    )
    cols = {a_col: pa.array(a[starts], pa.int64()),
            b_col: pa.array(b[starts], pa.int64())}
    if out_count is not None:
        if count_col is None:
            seg = np.diff(np.concatenate([starts, [len(a)]]))
        else:
            n = g[count_col].to_numpy(zero_copy_only=False).astype(np.int64)[order]
            seg = np.add.reduceat(n, starts)
        cols[out_count] = pa.array(seg.astype(np.int64), pa.int64())
    for c in first_cols:
        cols[c] = pa.array(g[c].to_numpy(zero_copy_only=False)[order][starts])
    for c in min_cols:
        v = g[c].to_numpy(zero_copy_only=False)[order]
        cols[c] = pa.array(np.minimum.reduceat(v, starts))
    return pa.table(cols)


_COMBINE_TARGET_ROWS = 4_000_000  # per-partition combine working set


def _nsub_for(n_sub: int, rows_hint: int | None) -> int:
    """Row-aware partition count: each map_groups combine materializes
    one whole hash partition (~rows / n_sub rows) in one task's heap,
    so the CPU-derived ``_npart()`` floor alone would let per-task
    memory grow linearly with the corpus. When the caller knows the
    input row count (materialized upstream, or parquet metadata), the
    count scales up so partitions stay ~``_COMBINE_TARGET_ROWS`` rows
    (~100-200 MB of int64 columns); capped at 2^14 — at that width the
    shuffle itself, not the combine, is the binding cost. Without a
    hint the CPU sizing stands and the linear-memory bound is the
    documented gate (see _reduce_keyed)."""
    if rows_hint:
        n_sub = max(n_sub, min(1 << 14, -(-int(rows_hint) // _COMBINE_TARGET_ROWS)))
    return n_sub


def _reduce_keyed(ds, key_col: str, n_sub: int, combine,
                  rows_hint: int | None = None):
    """Single-int64-key analog of ``_reduce_pairs``: hash-partition by
    ``key_col`` and run one vectorized ``combine`` per partition
    (which receives every row of each key it owns, plus the transient
    ``kpart`` column). Replaces ``groupby(key).aggregate(...)`` where
    the key is near-unique — content hashes, conversation hashes — so
    Ray's per-GROUP Python aggregate cost (~10-100us x N groups) never
    appears. Per-partition rows are N / n_sub; ``n_sub`` scales with
    the cluster via ``_npart()`` at every call site, the same sizing
    contract as the pair-generation partitions, and additionally with
    ``rows_hint`` (``_nsub_for``) where the caller knows the input row
    count. MEMORY GATE for hint-less call sites: one partition
    (~N / n_sub rows of int64 columns) must fit a worker heap — at the
    CPU floor of 128 partitions that binds around ~10^9 input rows per
    job; pass ``rows_hint`` past that scale.

    String keys hash with polars' vectorized xxhash (fixed seed —
    deterministic across workers within one job, which is all a
    shuffle key needs); integer keys partition by value directly."""
    n_sub = _nsub_for(n_sub, rows_hint)

    def add_kpart(t: pa.Table) -> pa.Table:
        col = t[key_col]
        if pa.types.is_integer(col.type):
            part = col.to_numpy() % n_sub
        else:
            import polars as pl

            part = (
                pl.from_arrow(t.select([key_col]))[key_col]
                .hash(seed=0).to_numpy() % np.uint64(n_sub)
            )
        return t.append_column("kpart", pa.array(part.astype(np.int32), pa.int32()))

    return (
        ds.map_batches(add_kpart, batch_format="pyarrow")
        .groupby("kpart")
        .map_groups(combine, batch_format="pyarrow")
    )


def _keyed_count_combine(key_col: str, count_name: str | None = None,
                         sum_col: str | None = None,
                         sum_name: str | None = None,
                         sums: tuple = ()):
    """Vectorized per-partition combine for ``_reduce_keyed``: run
    counts (and optionally per-key int sums) over the sorted key
    column. ``count_name`` None drops the count column (distinct-keys
    output). ``sums`` is ((src_col, out_name), ...); ``sum_col`` /
    ``sum_name`` is the single-sum shorthand. Integer keys sort with
    numpy; string keys with the Arrow kernel (numpy would fall back to
    per-element PyObject comparisons)."""
    if sum_col is not None:
        sums = ((sum_col, sum_name), *sums)

    def combine(g: pa.Table) -> pa.Table:
        key = g[key_col].combine_chunks()
        if g.num_rows == 0:
            # defensive: map_groups groups are non-empty today, but an
            # empty block must not crash (reduceat rejects empty starts)
            cols = {key_col: key.slice(0, 0)}
            if count_name is not None:
                cols[count_name] = pa.array([], pa.int64())
            for _src, out in sums:
                cols[out] = pa.array([], pa.int64())
            return pa.table(cols)
        if pa.types.is_integer(key.type):
            k = key.to_numpy()
            order = np.argsort(k, kind="stable")
            k = k[order]
            starts = np.flatnonzero(np.concatenate([[True], k[1:] != k[:-1]]))
            cols = {key_col: pa.array(k[starts], key.type)}
        else:
            order_pa = pc.sort_indices(key)
            ks = key.take(order_pa)
            neq = pc.not_equal(
                ks.slice(1), ks.slice(0, max(len(ks) - 1, 0))
            ).to_numpy(zero_copy_only=False).astype(bool)
            starts = np.flatnonzero(np.concatenate([[True], neq]))
            cols = {key_col: ks.take(pa.array(starts, pa.int64()))}
            order = order_pa.to_numpy()
        if count_name is not None:
            counts = np.diff(np.concatenate([starts, [g.num_rows]]))
            cols[count_name] = pa.array(counts.astype(np.int64), pa.int64())
        for src, out in sums:
            v = g[src].to_numpy(zero_copy_only=False).astype(np.int64)[order]
            cols[out] = pa.array(np.add.reduceat(v, starts), pa.int64())
        return pa.table(cols)

    return combine


def _reduce_pairs(ds, n_sub: int, rows_hint: int | None = None, **combine_kw):
    """Distributed pair reduction: hash-partition by the (a, b) pair,
    then one vectorized ``_combine_pairs_partition`` call per
    partition. Exact for any per-pair aggregate the combine supports
    (each pair's rows are co-located by construction). ``rows_hint``
    scales the partition count past the CPU floor (see _nsub_for /
    _reduce_keyed's memory gate)."""
    n_sub = _nsub_for(n_sub, rows_hint)
    a_col = combine_kw.get("a_col", "doc_a")
    b_col = combine_kw.get("b_col", "doc_b")
    return (
        ds.map_batches(
            lambda t: _add_pair_part(t, n_sub, a_col=a_col, b_col=b_col),
            batch_format="pyarrow",
        )
        .groupby("ppart")
        .map_groups(
            lambda g: _combine_pairs_partition(g, **combine_kw),
            batch_format="pyarrow",
        )
    )


# pair-doc shingle rows broadcast instead of joined when at most this
# many (24 B/row -> ~50 MB of plasma arrays at the gate)
_BCAST_VERIFY_SH_ROWS = 2_000_000


def _verify_pairs_bcast(cand, shingles, threshold: float):
    """Exact-Jaccard verify with ZERO exchanges: the (already
    pair-doc-restricted, size-gated) shingle table is collected once
    as doc-sorted arrays + per-doc offsets and ``ray.put``; one map
    over the candidate pairs then computes every |A ∩ B| with a
    vectorized sorted-run kernel — expand both sides' shingles tagged
    by pair index, lexsort by (pair, sh), and count the runs of
    length 2 (shingles are DISTINCT per doc, so a (pair, sh) run has
    at most one row per side)."""
    d_parts, s_parts, n_parts = [], [], []
    for b in shingles.iter_batches(batch_format="pyarrow"):
        d_parts.append(b["doc_id"].to_numpy())
        s_parts.append(b["sh"].to_numpy())
        n_parts.append(b["n_sh"].to_numpy(zero_copy_only=False))
    d = np.concatenate(d_parts)
    s = np.concatenate(s_parts)
    nsh = np.concatenate(n_parts).astype(np.int64)
    order = np.lexsort((s, d))
    d, s, nsh = d[order], s[order], nsh[order]
    starts = np.flatnonzero(np.concatenate([[True], d[1:] != d[:-1]]))
    udoc = d[starts]
    offs = np.concatenate([starts, [len(d)]]).astype(np.int64)
    nsh_doc = nsh[starts]  # constant per doc
    ref = ray.put((udoc, offs, s, nsh_doc))

    def verify(t: pa.Table, _ref=ref) -> pa.Table:
        udoc_, offs_, sh_, nsh_ = ray.get(_ref)  # plasma, shared per node
        da = t["doc_a"].to_numpy()
        db = t["doc_b"].to_numpy()
        if len(da) == 0:
            return _PAIRS_SCHEMA.empty_table()
        ia = _ss_lookup(udoc_, da)  # pair docs always present (asserted)
        ib = _ss_lookup(udoc_, db)
        n_a = nsh_[ia]
        n_b = nsh_[ib]

        def expand(idx):
            lo, hi = offs_[idx], offs_[idx + 1]
            cnt = hi - lo
            pair = np.repeat(np.arange(len(idx), dtype=np.int64), cnt)
            base = np.repeat(np.concatenate([[0], np.cumsum(cnt)[:-1]]), cnt)
            pos = np.arange(int(cnt.sum()), dtype=np.int64) - base + np.repeat(lo, cnt)
            return pair, sh_[pos]

        pa_idx, sa = expand(ia)
        pb_idx, sb = expand(ib)
        pair_all = np.concatenate([pa_idx, pb_idx])
        sh_all = np.concatenate([sa, sb])
        o = np.lexsort((sh_all, pair_all))
        pair_all, sh_all = pair_all[o], sh_all[o]
        # a (pair, sh) run of length 2 == shingle present on BOTH sides
        same = np.concatenate(
            [(pair_all[1:] == pair_all[:-1]) & (sh_all[1:] == sh_all[:-1]), [False]]
        )
        inter = np.bincount(pair_all[same], minlength=len(da)).astype(np.int64)
        union = n_a + n_b - inter
        j = np.round(inter / union, 6)
        keep = j >= threshold
        return pa.table(
            {
                "doc_a": pa.array(da[keep], pa.int64()),
                "doc_b": pa.array(db[keep], pa.int64()),
                "inter": pa.array(inter[keep], pa.int64()),
                "jaccard": pa.array(j[keep], pa.float64()),
            }
        )

    return cand.map_batches(verify, batch_format="pyarrow")


def _jaccard_join(cand, shingles, threshold: float):
    """Distributed exact-Jaccard verify for EXTERNAL candidate pairs
    (LSH banding): join candidates against the (doc_id, sh, n_sh)
    shingle rows twice — intersection counts AND both set sizes fall
    out of one (doc_a, doc_b) groupby over the joined rows (sizes ride
    on every shingle row, computed shuffle-free in the shingle map), so
    no size join and no driver-side state. Returns
    (doc_a, doc_b, inter, jaccard).

    ``shingles`` feeds BOTH joins, so it is materialized (object-store
    blocks, spillable) — without this, Ray re-executes its upstream
    lineage once per consumer and the nested shuffle pools starve each
    other. ``cand`` is materialized too: it is the SMALL output of the
    banding shuffle, and its count both guards the empty case (a clean
    corpus produces no candidates — Ray 2.49's join crashes on an
    empty side) and sizes the join partitioning (min with the shingle
    count: under heavy duplication the per-doc shingle rows can be the
    smaller side).

    Under ``_BCAST_PAIR_ROWS`` the shingle table is first RESTRICTED to
    the docs that appear in any candidate pair — a broadcast membership
    probe (one sorted int64 array in plasma, zero shuffle) — so the two
    intersection joins move O(pair docs x shingles/doc) rows instead of
    the whole corpus's shingle table. When that filtered table ALSO
    fits ``_BCAST_VERIFY_SH_ROWS``, the joins disappear entirely: the
    pair docs' shingle sets broadcast once (doc-sorted arrays +
    offsets) and ONE map over the candidate pairs computes every
    intersection with a vectorized sorted-run kernel — zero exchanges
    past the banding shuffle. Above either gate the distributed joins
    stand; monkeypatched tests pin all three shapes identical."""
    from ray.data.dataset import MaterializedDataset

    if not isinstance(shingles, MaterializedDataset):
        shingles = shingles.materialize()
    cand = cand.materialize()
    n_cand = cand.count()
    if n_cand == 0:
        return empty_dataset(_PAIRS_SCHEMA)
    if n_cand <= _BCAST_PAIR_ROWS:
        cols = []
        for b in cand.select_columns(["doc_a", "doc_b"]).iter_batches(
            batch_format="pyarrow"
        ):
            cols.append(b["doc_a"].to_numpy())
            cols.append(b["doc_b"].to_numpy())
        pref = ray.put(np.unique(np.concatenate(cols)))

        def only_pair_docs(t: pa.Table, _ref=pref) -> pa.Table:
            hit = sorted_member(ray.get(_ref), t["doc_id"].to_numpy())
            return t.filter(pa.array(hit))

        # every pair doc has shingle rows (candidates come from minhash
        # signatures over those same shingles), so the filtered table
        # can never be empty while n_cand > 0
        shingles = shingles.map_batches(
            only_pair_docs, batch_format="pyarrow"
        ).materialize()
        if shingles.count() <= _BCAST_VERIFY_SH_ROWS:
            return _verify_pairs_bcast(cand, shingles, threshold)
    np_ = join_np(min(n_cand, shingles.count()), _npart())
    # intersection per candidate pair: re-key both sides by shingle
    a_side = cand.join(
        shingles, join_type="inner", num_partitions=np_,
        on=("doc_a",), right_on=("doc_id",),
    ).map_batches(
        lambda t: pa.table({"doc_a": t["doc_a"], "doc_b": t["doc_b"],
                            "sh": t["sh"], "n_a": t["n_sh"]}),
        batch_format="pyarrow",
    )
    both = a_side.join(
        shingles.map_batches(
            lambda t: pa.table({"doc_b_": t["doc_id"], "sh_b": t["sh"],
                                "n_b": t["n_sh"]}),
            batch_format="pyarrow",
        ),
        join_type="inner", num_partitions=np_,
        on=("doc_b", "sh"), right_on=("doc_b_", "sh_b"),
    )
    # one row per shared shingle -> one row per pair. Partition-
    # vectorized (_reduce_pairs), NOT groupby([doc_a, doc_b]): the
    # pair groups are near-singletons and Ray's aggregate pays Python
    # per group. n_a/n_b are constant within a pair; first picks them.
    inter = _reduce_pairs(
        both, _npart() * 8, out_count="inter", first_cols=("n_a", "n_b")
    )

    def finish(t: pa.Table) -> pa.Table:
        inter_n = t["inter"].to_numpy().astype(np.int64)
        union = (t["n_a"].to_numpy().astype(np.int64)
                 + t["n_b"].to_numpy().astype(np.int64) - inter_n)
        j = np.round(inter_n / union, 6)
        keep = j >= threshold
        return pa.table(
            {
                "doc_a": pa.array(t["doc_a"].to_numpy()[keep], pa.int64()),
                "doc_b": pa.array(t["doc_b"].to_numpy()[keep], pa.int64()),
                "inter": pa.array(inter_n[keep], pa.int64()),
                "jaccard": pa.array(j[keep], pa.float64()),
            }
        )

    return inter.map_batches(finish, batch_format="pyarrow")


def dedup_minhash_lsh(sf_dir: str, jaccard_threshold: float = 0.5):
    """shingle-hash -> 64-perm MinHash -> 16x4 band buckets (groupby
    shuffle) -> candidate pairs -> DISTRIBUTED exact-Jaccard verify
    (shingle-keyed join; the driver never holds corpus state). Returns
    (doc_a, doc_b, jaccard) for verified pairs.

    The oracle is the exact-Jaccard pair set at the same threshold:
    banding with 16 bands of 4 rows finds a j>=0.9 pair with
    probability 1 - (1-0.9^4)^16 ~ 1 - 4e-8, and the gate corpus's true
    pairs all sit above 0.9, so LSH recall loss cannot perturb the
    comparison; recall itself is property-tested in tests/."""
    ds = _read_light(docs_path(sf_dir), columns=["doc_id", "text"])
    shingles = ds.map_batches(
        lambda t: _shingle_batch(t, hashed=True), batch_format="pyarrow"
    ).materialize()  # consumed by the verify joins AND the df pass
    n_sh_rows = shingles.count()

    # boilerplate guard for SIGNATURES (the minhash analog of the
    # ngram path's _DF_CAP): shingles shared by > sig_df_cap docs are
    # excluded from the minhash permutations, because on skewed corpora
    # the per-band minimum collapses to the same globally-hot shingles
    # for docs that are NOT near-duplicates (measured at 2.4M docs:
    # band buckets of 10^4-10^5 docs, ~10^9 candidate pairs, verify
    # OOM). The cap is deliberately FIXED, not corpus-scaled: an A/B at
    # 2.4M docs read 12.8M candidates at df>128 vs 192M at df>2400 —
    # re-admitting moderately-hot shingles collapses band minima onto
    # them and the candidate factory is 15x worse, so low-df exclusion
    # is the lesser evil (residual false candidates are bounded by the
    # full-range permutation family + the size gate below). The hot set
    # is sublinear and tiny, so it broadcasts; if it ever exceeded the
    # gate we'd rather band unfiltered (correct, slower) than pay a
    # corpus-wide shuffle here. The verify below still uses FULL
    # shingle sets — this affects candidate recall only, so the
    # exact-Jaccard oracle is unchanged.
    hot_ref = None
    sig_df_cap = _DF_CAP
    if n_sh_rows:
        hot = (
            _reduce_keyed(
                shingles, "sh", _npart() * 8, _keyed_count_combine("sh", "df"),
                rows_hint=n_sh_rows,
            )
            .map_batches(
                lambda t: t.filter(
                    pc.greater(t["df"], pa.scalar(sig_df_cap))
                ).select(["sh"]),
                batch_format="pyarrow",
            )
            .materialize()
        )
        n_hot = hot.count()
        if 0 < n_hot <= _BCAST_DUP_KEYS:
            hot_ref = ray.put(collect_sorted_i64(hot, "sh"))

    # band rows come straight off the documents table: each input row
    # is one whole doc, so signatures always see the full shingle set
    # (the materialized shingle dataset may re-block rows mid-doc —
    # see _band_rows' doc-complete requirement)
    # bucket cap: a 10^5-doc duplicate cluster would otherwise emit
    # O(k^2) pairs in EVERY band (the ngram path's _DF_CAP and the
    # embedding path's _EMB_BUCKET_CAP guard the same blowup). Safe for
    # the verify: capping only drops candidates, never corrupts counts,
    # and gate-corpus buckets are far below the cap.
    # bucket partitioning: group by (band, band_hash % P) so one
    # map_groups call handles a whole hash partition of buckets
    # vectorized (see _pairs_in_partition) instead of one Python call
    # per mostly-singleton bucket
    n_sub = _npart() * 8
    threshold_f = float(jaccard_threshold)

    def add_part(t: pa.Table) -> pa.Table:
        part = np.abs(t["band_hash"].to_numpy()) % n_sub
        return t.append_column("part", pa.array(part.astype(np.int32), pa.int32()))

    # exact size-ratio pre-filter: |A∩B| <= min and |A∪B| >= max, so
    # j <= min(|A|,|B|)/max(|A|,|B|) — a candidate whose full-set sizes
    # are more lopsided than the threshold can NEVER verify. Pure
    # necessary condition (small epsilon for float slop), zero recall
    # loss, oracle untouched; it drops banding collisions between docs
    # of very different lengths before they reach the verify joins.
    def size_gate(t: pa.Table, _thr=threshold_f) -> pa.Table:
        na = t["n_a"].to_numpy().astype(np.float64)
        nb = t["n_b"].to_numpy().astype(np.float64)
        keep = np.minimum(na, nb) >= (_thr - 1e-9) * np.maximum(na, nb)
        return pa.table({"doc_a": t["doc_a"].filter(pa.array(keep)),
                         "doc_b": t["doc_b"].filter(pa.array(keep))})

    raw_pairs = (
        ds.map_batches(
            lambda t, _h=hot_ref: _bands_from_docs(t, hot_ref=_h),
            batch_format="pyarrow",
        )
        .map_batches(add_part, batch_format="pyarrow")
        .groupby(["band", "part"])
        .map_groups(
            lambda g: _pairs_in_partition(
                g, cap=_BAND_BUCKET_CAP, sizes_col="n_sh"
            ),
            batch_format="pyarrow",
        )
        .map_batches(size_gate, batch_format="pyarrow")
    )
    # global distinct, partition-vectorized (near-singleton pair groups
    # make groupby([doc_a, doc_b]) pay Python per group — see
    # _combine_pairs_partition)
    cand = _reduce_pairs(raw_pairs, n_sub)
    return _jaccard_join(cand, shingles, jaccard_threshold).drop_columns(["inter"])


SQL_MINHASH_LSH = f"""
WITH {_SQL_SHINGLES},
sizes AS (SELECT doc_id, COUNT(*) AS n FROM tri GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
    FROM tri a JOIN tri b ON a.sh = b.sh AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       CAST(round(i.inter * 1.0 / (sa.n + sb.n - i.inter), 6) AS DOUBLE) AS jaccard
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE i.inter * 1.0 / (sa.n + sb.n - i.inter) >= 0.5
"""


# ---- exact n-gram Jaccard (pairs via shared-shingle join) ----

_DF_CAP = 128  # shingles shared by more docs than this are boilerplate


def dedup_ngram_jaccard(sf_dir: str, threshold: float = 0.4):
    """Exact word-trigram Jaccard for every pair sharing >= 1 shingle —
    pair generation by a shingle-keyed groupby (docs sharing nothing
    have Jaccard 0 and can never pass the threshold), so no all-pairs
    scan. Shingles with document frequency > {_DF_CAP} are dropped from
    the shingle universe BEFORE sizes and intersections (a hot
    boilerplate shingle shared by 10^5 docs would otherwise create
    10^10 candidate pairs); the SQL oracle applies the identical cap.
    Sizes and intersections flow as datasets through joins — the driver
    sees only the final pair table."""
    ds = _read_light(docs_path(sf_dir), columns=["doc_id", "text"])
    shingles = ds.map_batches(
        lambda t: _shingle_batch(t, hashed=True), batch_format="pyarrow"
    ).materialize()  # consumed by the df-cap filter AND the join below
    n_sh_rows = shingles.count()
    if n_sh_rows == 0:  # token-free corpus: no shingles, no pairs
        return empty_dataset(_PAIRS_SCHEMA)

    # df-cap: drop hot shingles from the universe (distributed filter).
    # cold is materialized: its count guards the everything-is-
    # boilerplate edge (empty join side crashes Ray 2.49's join) and it
    # is the vocabulary table — small bytes relative to the shingle rows.
    # df is partition-vectorized (near-unique keys — see _reduce_keyed)
    df = _reduce_keyed(
        shingles, "sh", _npart() * 8, _keyed_count_combine("sh", "df"),
        rows_hint=n_sh_rows,
    )
    cold = df.map_batches(
        lambda t: t.filter(pc.less_equal(t["df"], pa.scalar(_DF_CAP))).select(["sh"]),
        batch_format="pyarrow",
    ).materialize()
    n_cold = cold.count()
    if n_cold == 0:
        return empty_dataset(_PAIRS_SCHEMA)
    if n_cold <= _BCAST_DUP_KEYS:
        # the sub-cap vocabulary (sublinear in corpus size) fits the
        # broadcast budget: ship it once as a sorted int64 array and
        # filter the full shingle table with a vectorized probe inside
        # map_batches — same rows as the sh-keyed inner join, zero
        # shuffle of the corpus-sized side
        cref = ray.put(collect_sorted_i64(cold, "sh"))

        def keep_cold(t: pa.Table, _ref=cref) -> pa.Table:
            hit = sorted_member(ray.get(_ref), t["sh"].to_numpy())
            return t.filter(pa.array(hit))

        shingles = shingles.map_batches(
            keep_cold, batch_format="pyarrow"
        ).materialize()  # consumed by sizes AND pair generation
    else:
        shingles = shingles.join(
            cold, join_type="inner", num_partitions=join_np(min(n_sh_rows, n_cold), _npart()),
            on=("sh",),
        ).materialize()  # consumed by sizes AND pair generation

    # pairs come one-per-shared-shingle, so counting pair rows IS the
    # intersection size — no second shingle join needed here (unlike the
    # LSH path, whose candidates arrive without multiplicity).
    # Partitioned pair generation: one vectorized call per (sh % P)
    # partition instead of one Python call per distinct shingle
    # (~200k calls at sf0.1 — see _pairs_in_partition)
    n_sub = _npart() * 8

    def add_part(t: pa.Table) -> pa.Table:
        part = np.abs(t["sh"].to_numpy()) % n_sub
        return t.append_column("part", pa.array(part.astype(np.int32), pa.int32()))

    raw_pairs = (
        shingles.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            # one pair row per shared shingle; combine the repeats that
            # are LOCAL to this shingle partition in the same call (a
            # per-partition combiner before the pair shuffle)
            lambda g: _combine_pairs_partition(
                _pairs_in_partition(g, cap=_DF_CAP, key="sh"), out_count="n"
            ),
            batch_format="pyarrow",
        )
    )
    # cross-partition combine: sum the partial counts per pair,
    # partition-vectorized (near-singleton pair groups make
    # groupby([doc_a, doc_b]) pay Python per group)
    inter = _reduce_pairs(raw_pairs, n_sub, count_col="n", out_count="inter")
    sizes = _reduce_keyed(
        shingles, "doc_id", _npart() * 8, _keyed_count_combine("doc_id", "n_sh"),
        rows_hint=n_sh_rows,
    ).materialize()
    return _sizes_and_threshold(inter, sizes, threshold)


SQL_NGRAM_JACCARD = f"""
WITH {_SQL_SHINGLES},
df AS (SELECT sh, COUNT(*) AS df FROM tri GROUP BY sh),
tri_f AS (SELECT t.* FROM tri t JOIN df USING (sh) WHERE df.df <= {_DF_CAP}),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM tri_f GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
    FROM tri_f a JOIN tri_f b ON a.sh = b.sh AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, i.inter,
       CAST(round(i.inter * 1.0 / (sa.n + sb.n - i.inter), 6) AS DOUBLE) AS jaccard
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE i.inter * 1.0 / (sa.n + sb.n - i.inter) >= 0.4
"""


# ---- SimHash (60-bit, md5 token hash — SQL-mirrorable) ----

_SIM_BITS = 60


def dedup_simhash(sf_dir: str):
    """60-bit SimHash over the document's non-empty tokens (tf-weighted
    bit votes; bit i of token-md5 votes +tf/-tf). Vectorized: per-batch
    unique-token md5s expand to a (entries x 60) sign matrix folded
    per doc with np.add.reduceat — no per-token Python loop. Returns
    (doc_id, simhash:int64); Hamming-near values are near-dups."""

    bit_idx = np.arange(_SIM_BITS, dtype=np.uint64)

    def sim(t: pa.Table) -> pa.Table:
        doc_idx, flat, _pos, _lens, _dl = split_tokens_arrow(
            t["text"].combine_chunks(), _CFG
        )
        n_docs = t.num_rows
        out = np.zeros(n_docs, dtype=np.int64)
        if len(flat):
            dict_arr = flat.dictionary_encode()
            codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            uniq = dict_arr.dictionary.to_numpy(zero_copy_only=False)
            uh = _hash60(uniq).astype(np.uint64)
            bits = ((uh[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(np.int64)
            signs = bits * 2 - 1  # (n_uniq, 60) in {-1, +1}
            # per (doc, term) counts
            key = doc_idx * len(uniq) + codes
            ukey, counts = np.unique(key, return_counts=True)
            e_doc = ukey // len(uniq)
            e_code = ukey % len(uniq)
            votes_e = signs[e_code] * counts[:, None]  # (entries, 60)
            starts = np.unique(e_doc, return_index=True)
            votes = np.add.reduceat(votes_e, starts[1], axis=0)  # (docs_with_tokens, 60)
            h = ((votes > 0).astype(np.uint64) << bit_idx[None, :]).sum(axis=1)
            out[starts[0]] = h.view(np.int64)
        return pa.table({"doc_id": t["doc_id"], "simhash": pa.array(out, pa.int64())})

    ds = _read_light(docs_path(sf_dir), columns=["doc_id", "text"])
    return ds.map_batches(sim, batch_format="pyarrow")


SQL_SIMHASH = f"""
WITH toks AS (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(substr(text, 1, 10000)), '[^0-9a-z]+')) AS term
    FROM documents
),
counts AS (
    SELECT doc_id, term, COUNT(*) AS c FROM toks WHERE term <> '' GROUP BY 1, 2
),
h AS (SELECT doc_id, c, {_MD5_SQL.format("term")} AS th FROM counts),
votes AS (
    SELECT doc_id, i,
           SUM(CASE WHEN (th >> i) & 1 = 1 THEN c ELSE -c END) AS v
    FROM h CROSS JOIN (SELECT unnest(range({_SIM_BITS})) AS i) bits
    GROUP BY 1, 2
),
sigs AS (
    SELECT doc_id,
           CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS simhash
    FROM votes GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(s.simhash, 0) AS simhash
FROM documents d LEFT JOIN sigs s ON d.doc_id = s.doc_id
"""


# ---- embedding cosine near-dup ----

# number of doc-id chunks for the exact all-pairs tiling: each
# unordered chunk pair (i <= j) becomes one groupby group of ~2N/B
# rows, so B bounds group memory; the shuffle carries N x B rows (each
# row replicated once per pair it participates in)
_XP_CHUNKS = 8


def _pair_empty() -> pa.Table:
    return pa.table(
        {"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64()),
         "cosine": pa.array([], pa.float64())}
    )


def dedup_embedding(sf_dir: str, threshold: float = 0.4, chunks: int = _XP_CHUNKS):
    """EXACT cosine near-dup pairs (cosine >= threshold) as a
    distributed chunk-pair tiling: rows are assigned to ``chunks``
    deterministic chunks, each row is replicated once per unordered
    chunk pair it participates in, and one groupby co-locates every
    (i, j) tile so a worker computes that tile's matmul. The driver
    never reads the table and never holds the matrix; group memory is
    bounded by ~2N/chunks rows. (An LSH-bucketed verify cannot serve
    here: banding misses true pairs near the threshold, so it would not
    reproduce the exact pair set the SQL oracle computes.)

    Exact all-pairs is inherently O(N^2) flops — at 100 TB use
    ``dedup_embedding_lsh``; this op is the exact baseline/oracle
    anchor, kept scale-SAFE (streams, bounded groups) if not
    scale-CHEAP. The single-broadcast brute variant lives in the test
    suite only (``_dedup_embedding_brute``)."""
    ds = _read_emb(sf_dir).materialize()  # reused by count + pipeline
    if ds.count() == 0:
        return ray.data.from_arrow(_pair_empty())

    def tile_keys(t: pa.Table) -> pa.Table:
        vids = t["vec_id"].to_numpy()
        c = (vids % chunks).astype(np.int64)
        reps = []
        for j in range(chunks):
            i = np.minimum(c, j)
            k = np.maximum(c, j)
            reps.append(
                pa.table(
                    {
                        "pid": pa.array(i * chunks + k, pa.int64()),
                        "chunk": pa.array(c, pa.int64()),
                        "vec_id": t["vec_id"],
                        "embedding": t["embedding"],
                    }
                )
            )
        return pa.concat_tables(reps)

    def tile_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows < 2:
            return _pair_empty()
        pid = int(g["pid"][0].as_py())
        i, j = pid // chunks, pid % chunks
        vids = g["vec_id"].to_numpy()
        v = _emb_matrix(g["embedding"])
        v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        if i == j:
            sims = v @ v.T
            a, b = np.triu_indices(len(vids), k=1)
            keep = sims[a, b] >= threshold
            va, vb = vids[a[keep]], vids[b[keep]]
            cos = sims[a[keep], b[keep]]
        else:
            side = g["chunk"].to_numpy() == i
            ai, bi = np.flatnonzero(side), np.flatnonzero(~side)
            sims = v[ai] @ v[bi].T
            hit_a, hit_b = np.nonzero(sims >= threshold)
            xa, xb = vids[ai[hit_a]], vids[bi[hit_b]]
            va, vb = np.minimum(xa, xb), np.maximum(xa, xb)
            cos = sims[hit_a, hit_b]
        return pa.table(
            {
                "vec_a": pa.array(va.astype(np.int64), pa.int64()),
                "vec_b": pa.array(vb.astype(np.int64), pa.int64()),
                "cosine": pa.array(np.round(cos, 6), pa.float64()),
            }
        )

    return (
        ds.map_batches(tile_keys, batch_format="pyarrow")
        .groupby("pid")
        .map_groups(tile_pairs, batch_format="pyarrow")
    )


def _dedup_embedding_brute(sf_dir: str, threshold: float = 0.4):
    """Single-broadcast brute baseline (driver reads the table, ships
    the full normalized matrix once via ray.put) — test-suite oracle
    for ``dedup_embedding``'s tiling; NOT registered as a gate entry
    because the driver-side full-table read is the one shape that
    cannot survive 100 TB (VERDICT r3 item 2)."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    tbl = tbl.filter(pc.is_valid(tbl["embedding"]))
    ids = tbl["vec_id"].to_numpy()
    mat = _emb_matrix(tbl["embedding"])
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, mat))

    def scan(t: pa.Table, _ref=ref) -> pa.Table:
        ids_b, mat_b = ray.get(_ref)
        vids = t["vec_id"].to_numpy()
        v = _emb_matrix(t["embedding"], mat_b.shape[1])
        v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        sims = v @ mat_b.T  # (batch, N)
        hit_i, hit_j = np.nonzero((sims >= threshold) & (ids_b[None, :] > vids[:, None]))
        return pa.table(
            {
                "vec_a": pa.array(vids[hit_i], pa.int64()),
                "vec_b": pa.array(ids_b[hit_j], pa.int64()),
                "cosine": pa.array(np.round(sims[hit_i, hit_j], 6), pa.float64()),
            }
        )

    ds = _read_emb(sf_dir)
    return ds.map_batches(scan, batch_format="pyarrow")


SQL_DEDUP_EMBEDDING = """
WITH n AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
    FROM embeddings WHERE embedding IS NOT NULL
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       CAST(round(list_cosine_similarity(a.e, b.e), 6) AS DOUBLE) AS cosine
FROM n a JOIN n b ON b.vec_id > a.vec_id
WHERE list_cosine_similarity(a.e, b.e) >= 0.4
"""


# ---- near-dup clusters: connected components over verified pairs ----

def _min_offer_per_node(offers_ds, n_sub: int):
    """groupby(node).Min(offer) with near-unique node keys,
    partition-vectorized (see _reduce_keyed)."""

    def min_part(g: pa.Table) -> pa.Table:
        nd = g["node"].to_numpy()
        of = g["offer"].to_numpy(zero_copy_only=False)
        order = np.argsort(nd, kind="stable")
        nd, of = nd[order], of[order]
        starts = np.flatnonzero(np.concatenate([[True], nd[1:] != nd[:-1]]))
        return pa.table(
            {
                "node": pa.array(nd[starts], pa.int64()),
                "offer": pa.array(np.minimum.reduceat(of, starts), pa.int64()),
            }
        )

    return _reduce_keyed(offers_ds, "node", n_sub, min_part)


def _clusters_bcast(edges, max_iters: int):
    """Min-label propagation for a SIZE-GATED pair graph: the node
    label vector (one int64 per dup-graph node, <= 2x pairs — gated by
    the caller at ``_BCAST_PAIR_ROWS``) is ``ray.put`` each round and
    probed by searchsorted inside the offer map, so a round is ONE
    groupby-min over the edge rows instead of two shuffle joins plus
    the groupby. Every node has an incoming edge (edges are
    bidirectional), so the offer table covers every node and the label
    update is a pure vectorized min against the previous round —
    identical dynamics, hence an identical fixpoint, to the join path
    below the gate. The edge table itself stays a dataset; driver peak
    is O(nodes)."""

    node_parts = []
    for b in edges.select_columns(["src"]).iter_batches(batch_format="pyarrow"):
        node_parts.append(b["src"].to_numpy())
    nodes = np.unique(np.concatenate(node_parts))
    nref = ray.put(nodes)
    lab = nodes.copy()

    for _ in range(max_iters):
        lref = ray.put(lab)

        def offers(t: pa.Table, _n=nref, _l=lref) -> pa.Table:
            nd = ray.get(_n)  # plasma reads, shared per node
            lb = ray.get(_l)
            src_lab = lb[_ss_lookup(nd, t["src"].to_numpy())]
            return pa.table(
                {"node": t["dst"], "offer": pa.array(src_lab, pa.int64())}
            )

        offered = _min_offer_per_node(
            edges.map_batches(offers, batch_format="pyarrow"), _npart() * 8
        )
        new = lab.copy()
        for b in offered.iter_batches(batch_format="pyarrow"):
            idx = _ss_lookup(nodes, b["node"].to_numpy())
            off = b["offer"].to_numpy(zero_copy_only=False)
            new[idx] = np.minimum(new[idx], off)
        if (new == lab).all():
            break
        lab = new

    return ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(nodes, pa.int64()),
             "cluster_id": pa.array(lab, pa.int64())}
        )
    )


def dedup_clusters(sf_dir: str, max_iters: int = 16):
    """Groups verified near-dup pairs into components: every doc in a
    pair gets ``cluster_id`` = the smallest doc_id reachable through
    the pair graph (the canonical representative a pipeline keeps).

    Distributed min-label propagation over (bidirectional) edge
    datasets. Under ``_BCAST_PAIR_ROWS`` the per-node label vector
    (<= 2x pairs) is broadcast each round and a round is ONE groupby-
    min over the edges (see ``_clusters_bcast``); above the gate labels
    stay a dataset and each round is one join (edge source -> current
    label), one groupby-min per target, and one label update — no
    driver-side graph ever; the edge table is a dataset on both paths.
    Near-dup components have tiny diameter, so this converges in a few
    rounds (checked via a changed-count aggregate, capped at
    ``max_iters``). The oracle computes the same closure with a
    recursive CTE."""

    pairs = dedup_minhash_lsh(sf_dir).drop_columns(["jaccard"]).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:  # no near-dups: no clusters to report
        return empty_dataset(
            pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())])
        )
    def both_dirs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pa.array(
                    np.concatenate([t["doc_a"].to_numpy(), t["doc_b"].to_numpy()]),
                    pa.int64(),
                ),
                "dst": pa.array(
                    np.concatenate([t["doc_b"].to_numpy(), t["doc_a"].to_numpy()]),
                    pa.int64(),
                ),
            }
        )

    edges = pairs.map_batches(both_dirs, batch_format="pyarrow").materialize()
    if n_pairs <= _BCAST_PAIR_ROWS:
        return _clusters_bcast(edges, max_iters)
    labels = (
        _reduce_keyed(
            edges.select_columns(["src"]), "src", _npart() * 8,
            _keyed_count_combine("src"),
        )
        .map_batches(
            lambda t: pa.table({"node": t["src"], "label": t["src"]}),
            batch_format="pyarrow",
        )
        .materialize()
    )
    # the smaller join side is labels (one row per NODE) — a dense
    # clone cluster has far fewer nodes than pairs, so sizing by
    # n_pairs would leave label-less partitions and crash the join
    np_ = join_np(labels.count(), _npart())

    for _ in range(max_iters):
        # propagate: each node offers its label to every neighbor
        # edges/labels/offered are all nonempty here (pairs > 0), so
        # the plain join is safe once partitioning matches the scale
        offered = _min_offer_per_node(
            edges.join(labels, join_type="inner", num_partitions=np_,
                       on=("src",), right_on=("node",))
            .map_batches(
                lambda t: pa.table({"node": t["dst"], "offer": t["label"]}),
                batch_format="pyarrow",
            ),
            _npart() * 8,
        )
        merged = labels.join(
            offered, join_type="left_outer", num_partitions=np_, on=("node",)
        )

        def take_min(t: pa.Table) -> pa.Table:
            lab = t["label"].to_numpy()
            off = pc.fill_null(t["offer"], np.iinfo(np.int64).max).to_numpy()
            new = np.minimum(lab, off)
            return pa.table(
                {
                    "node": t["node"],
                    "label": pa.array(new, pa.int64()),
                    "changed": pa.array((new != lab).astype(np.int64), pa.int64()),
                }
            )

        updated = merged.map_batches(take_min, batch_format="pyarrow").materialize()
        n_changed = updated.sum("changed") or 0
        labels = updated.drop_columns(["changed"]).materialize()
        if not n_changed:
            break

    return labels.map_batches(
        lambda t: pa.table({"doc_id": t["node"], "cluster_id": t["label"]}),
        batch_format="pyarrow",
    ).sort("doc_id")


SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE {_SQL_SHINGLES},
sizes AS (SELECT doc_id, COUNT(*) AS n FROM tri GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
    FROM tri a JOIN tri b ON a.sh = b.sh AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
vpairs AS (
    SELECT i.doc_a, i.doc_b FROM inter i
    JOIN sizes sa ON i.doc_a = sa.doc_id
    JOIN sizes sb ON i.doc_b = sb.doc_id
    WHERE i.inter * 1.0 / (sa.n + sb.n - i.inter) >= 0.5
),
edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM vpairs
    UNION ALL SELECT doc_b, doc_a FROM vpairs
),
reach(node, label) AS (
    SELECT src, src FROM edges
    UNION
    SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
)
SELECT node AS doc_id, MIN(label) AS cluster_id
FROM reach GROUP BY node ORDER BY doc_id
"""


# ---- embedding near-dup, banded LSH (the scale path) ----

_EMB_BANDS = 4        # independent hash tables (recall: a pair matches if ANY band agrees)
_EMB_ROWS = 8         # planes per band: 2^8 = 256 buckets/band at the gate setting
_EMB_BUCKET_CAP = 4096  # skip degenerate buckets (mirrored by the oracle's HAVING)
_EMB_DIM = 64


def _emb_rows_for(n: int) -> int:
    """Auto-scaled rows-per-band: 2^rows ~ N keeps the EXPECTED random
    bucket load O(1), so total candidate pairs grow ~linearly with the
    corpus instead of quadratically (property-tested in
    tests/test_dedup_knn.py)."""
    return max(_EMB_ROWS, int(np.ceil(np.log2(max(n, 2)))))


def emb_lsh_pairs(ds, threshold: float, n_bands: int, n_rows: int | None = None,
                  cap: int = _EMB_BUCKET_CAP, dim: int = _EMB_DIM):
    """Banded random-hyperplane near-dup: each vector lands in one
    bucket PER BAND (groupby shuffle on (band, sig)); all-pairs cosine
    runs only within a bucket, and a pair found by several bands is
    deduplicated by a tiny (vec_a, vec_b) groupby. With b bands of r
    planes the expected random bucket load is N/2^r — pick r ~ log2(N)
    (``_emb_rows_for``) and per-bucket work stays O(1) per vector.
    Buckets larger than ``cap`` are skipped entirely (boilerplate /
    degenerate regions — same guard as the shingle df-cap; documented
    recall trade, mirrored exactly by the SQL oracle)."""
    from .knn import _planes

    if n_rows is None:
        # production default: r ~ log2(N) (parquet-metadata count, no
        # execution) — the gate entry pins n_rows so its oracle planes
        # stay inlinable
        n_rows = _emb_rows_for(ds.count())
    planes = _planes(n_bands * n_rows, dim)
    pref = ray.put(planes)
    weights = (1 << np.arange(n_rows)).astype(np.int64)

    def band_rows(t: pa.Table) -> pa.Table:
        pl = ray.get(pref)
        v = _emb_matrix(t["embedding"], pl.shape[1])
        bits = (v @ pl.T) > 0  # (n, n_bands * n_rows)
        tables = []
        for b in range(n_bands):
            sig = bits[:, b * n_rows:(b + 1) * n_rows].astype(np.int64) @ weights
            tables.append(
                pa.table(
                    {
                        "band": pa.array(np.full(len(sig), b, np.int32), pa.int32()),
                        "sig": pa.array(sig, pa.int64()),
                        "vec_id": t["vec_id"],
                        "embedding": t["embedding"],
                    }
                )
            )
        return pa.concat_tables(tables)

    def bucket_pairs(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64()),
             "cosine": pa.array([], pa.float64())}
        )
        if g.num_rows < 2 or g.num_rows > cap:
            return empty
        vids = g["vec_id"].to_numpy()
        v = _emb_matrix(g["embedding"], dim)
        v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        order = np.argsort(vids)
        vids, v = vids[order], v[order]
        sims = v @ v.T
        a, b = np.triu_indices(len(vids), k=1)
        keep = sims[a, b] >= threshold
        return pa.table(
            {
                "vec_a": pa.array(vids[a[keep]].astype(np.int64), pa.int64()),
                "vec_b": pa.array(vids[b[keep]].astype(np.int64), pa.int64()),
                "cosine": pa.array(np.round(sims[a[keep], b[keep]], 6), pa.float64()),
            }
        )

    pairs = (
        ds.map_batches(band_rows, batch_format="pyarrow")
        .groupby(["band", "sig"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    # a pair surfaces once per agreeing band with the identical cosine;
    # first/Min just picks it. Partition-vectorized pair reduction —
    # near-singleton pair groups make groupby([vec_a, vec_b]) pay
    # Python per group (see _combine_pairs_partition)
    return _reduce_pairs(
        pairs, _npart() * 8, min_cols=("cosine",), a_col="vec_a", b_col="vec_b"
    )


def dedup_embedding_lsh(sf_dir: str, threshold: float = 0.4):
    """Gate entry: the banded LSH at the FIXED (bands, rows) = (4, 8)
    setting so the seeded planes inline verbatim into the oracle; the
    scale path auto-sizes rows with ``_emb_rows_for`` (see
    ``emb_lsh_pairs``)."""
    import pyarrow.parquet as pq

    # dim comes from the first VALID embedding — an early null row must
    # not blank the whole op (real duplicates elsewhere in the corpus
    # would silently survive dedup while the oracle still reports them)
    dim = None
    for batch in pq.ParquetFile(f"{sf_dir}/embeddings.parquet").iter_batches(
        batch_size=1024, columns=["embedding"]
    ):
        valid = batch["embedding"].drop_null()
        if len(valid):
            dim = len(valid[0])
            break
    if dim is None:
        # empty table / all embeddings null: no pairs, but keep the
        # output schema so downstream unions/writes still line up
        return ray.data.from_arrow(
            pa.table(
                {
                    "vec_a": pa.array([], pa.int64()),
                    "vec_b": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        )
    # the oracle inlines _planes_sql(·, _EMB_DIM) as constants, so a
    # corpus with a different dim must fail loudly here rather than
    # bucket with a plane matrix the SQL side doesn't share
    if dim != _EMB_DIM:
        raise ValueError(
            f"gate entry is pinned to {_EMB_DIM}-dim embeddings (got {dim}); "
            "use emb_lsh_pairs(dim=...) for other widths"
        )
    # null embeddings are dropped on BOTH twins (see knn._read_emb):
    # they would land every null row in the sig-0 bucket — inflating
    # its size toward the cap — and break the zero-copy decode
    ds = _read_emb(sf_dir)
    return emb_lsh_pairs(ds, threshold, _EMB_BANDS, _EMB_ROWS, dim=dim)


def _dedup_embedding_lsh_sql() -> str:
    from .knn import _planes_sql

    return f"""
WITH {_planes_sql(_EMB_BANDS * _EMB_ROWS, _EMB_DIM)},
e AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
    FROM embeddings WHERE embedding IS NOT NULL
),
sigs AS (
    SELECT vec_id, CAST(pl.i // {_EMB_ROWS} AS INTEGER) AS band,
           CAST(SUM(CASE WHEN list_dot_product(e.e, pl.p) > 0
                         THEN (1 << (pl.i % {_EMB_ROWS})) ELSE 0 END) AS BIGINT) AS sig
    FROM e CROSS JOIN planes pl GROUP BY vec_id, pl.i // {_EMB_ROWS}
),
bsize AS (SELECT band, sig, COUNT(*) AS n FROM sigs GROUP BY 1, 2),
cand AS (
    SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM sigs a
    JOIN sigs b ON a.band = b.band AND a.sig = b.sig AND b.vec_id > a.vec_id
    JOIN bsize s ON s.band = a.band AND s.sig = a.sig
    WHERE s.n <= {_EMB_BUCKET_CAP}
)
SELECT c.vec_a, c.vec_b,
       CAST(round(list_cosine_similarity(ea.e, eb.e), 6) AS DOUBLE) AS cosine
FROM cand c
JOIN e ea ON ea.vec_id = c.vec_a
JOIN e eb ON eb.vec_id = c.vec_b
WHERE list_cosine_similarity(ea.e, eb.e) >= 0.4
"""


# ---- duplicated-span fraction (exact-substring dedup signal) ----

# duplicated-shingle keys broadcast instead of hash-joined: 16M int64
# keys = 128 MB, one plasma copy per node
_BCAST_DUP_KEYS = 16_000_000


def dup_span_fraction(sf_dir: str):
    """Per-document duplicated-span fraction — the share of a doc's
    distinct word-trigram shingles that also appear in at least one
    OTHER document (the per-doc signal behind exact-substring training
    -data dedup, Lee et al. 2022 "Deduplicating Training Data Makes
    Language Models Better"). Returns (doc_id, n_sh, n_dup, dup_ppm)
    with dup_ppm an integer parts-per-million (floor(x+0.5) on both
    sides, hash-stable).

    Shape: shingle df via a sh-keyed groupby, the df>=2 verdict shipped
    back onto the (doc_id, sh) rows, then a doc_id groupby. The
    ship-back is SIZE-GATED: when the duplicated-shingle KEY SET (far
    smaller than the distinct-shingle table) fits the broadcast budget
    it is ``ray.put`` once as a sorted int64 array and probed with a
    vectorized searchsorted inside the map — exact membership, one
    exchange total; above the budget it falls back to the sh-keyed
    hash join. At 100 TB the Bloom twin (``dup_span_fraction_approx``)
    replaces even that broadcast with blocked bitmaps."""

    ds = _read_light(docs_path(sf_dir), columns=["doc_id", "text"])
    shingles = (
        ds.map_batches(lambda t: _shingle_batch(t, hashed=True), batch_format="pyarrow")
        .select_columns(["doc_id", "sh"])
        .materialize()  # consumed by the df groupby AND the ship-back
    )

    n_rows = shingles.count()
    if n_rows == 0:  # token-free corpus: no docs to report
        return empty_dataset(
            pa.schema([("doc_id", pa.int64()), ("n_sh", pa.int64()),
                       ("n_dup", pa.int64()), ("dup_ppm", pa.int64())])
        )
    # df (one row per DISTINCT shingle) is the smaller join side — a
    # boilerplate corpus can have thousands of shingle rows over a
    # handful of distinct shingles, so size the join by df's count.
    # Partition-vectorized (near-unique keys — see _reduce_keyed)
    df = _reduce_keyed(
        shingles, "sh", _npart() * 8, _keyed_count_combine("sh", "df"),
        rows_hint=n_rows,
    ).materialize()
    dup_keys = df.map_batches(
        lambda t: t.filter(pc.greater_equal(t["df"], pa.scalar(2))).select(["sh"]),
        batch_format="pyarrow",
    ).materialize()

    if dup_keys.count() <= _BCAST_DUP_KEYS:
        ref = ray.put(collect_sorted_i64(dup_keys, "sh"))

        def flag_bcast(t: pa.Table, _ref=ref) -> pa.Table:
            # plasma read, shared per node
            hit = sorted_member(ray.get(_ref), t["sh"].to_numpy())
            return pa.table(
                {"doc_id": t["doc_id"],
                 "is_dup": pa.array(hit.astype(np.int64), pa.int64())}
            )

        flagged = shingles.map_batches(flag_bcast, batch_format="pyarrow")
    else:
        tagged = shingles.join(
            df, join_type="inner",
            num_partitions=join_np(df.count(), _npart()), on=("sh",),
        )

        def flag(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": t["doc_id"],
                    "is_dup": pc.cast(
                        pc.greater_equal(t["df"], pa.scalar(2)), pa.int64()
                    ),
                }
            )

        flagged = tagged.map_batches(flag, batch_format="pyarrow")

    per_doc = _reduce_keyed(
        flagged, "doc_id", _npart() * 8,
        _keyed_count_combine("doc_id", "n_sh", sum_col="is_dup", sum_name="n_dup"),
        rows_hint=n_rows,
    )

    def ppm(t: pa.Table) -> pa.Table:
        n_sh = t["n_sh"].to_numpy().astype(np.float64)
        n_dup = t["n_dup"].to_numpy(zero_copy_only=False).astype(np.float64)
        out = np.floor(n_dup * 1e6 / n_sh + 0.5).astype(np.int64)
        return t.append_column("dup_ppm", pa.array(out, pa.int64()))

    return per_doc.map_batches(ppm, batch_format="pyarrow")


SQL_DUP_SPAN_FRACTION = f"""
WITH {_SQL_SHINGLES},
df AS (SELECT sh, COUNT(*) AS df FROM tri GROUP BY sh)
SELECT t.doc_id,
       COUNT(*) AS n_sh,
       CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       CAST(floor(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) * 1000000.0
                  / COUNT(*) + 0.5) AS BIGINT) AS dup_ppm
FROM tri t JOIN df USING (sh)
GROUP BY t.doc_id
"""


# ---- approximate dup-span: broadcast Bloom filter of dup shingles ----

_BLOOM_K = 3            # probes per key (Kirsch-Mitzenmacher double hashing)
_BLOOM_BITS_PER_KEY = 16  # ~0.1% theoretical fp at k=3
_BLOOM_MAX_BITS = 1 << 30  # 128 MB broadcast cap; beyond this, block the filter


def _bloom_indices(h: np.ndarray, m: int, i: int) -> np.ndarray:
    """i-th probe index for 60-bit keys: (h_lo + i*h_hi) mod m with m a
    power of two (double hashing — k independent-enough probes from one
    stored hash, no rehash of the strings)."""
    hu = h.astype(np.uint64)
    lo = hu & np.uint64(m - 1)
    hi = (hu >> np.uint64(30)) | np.uint64(1)
    return (lo + np.uint64(i) * hi) & np.uint64(m - 1)


def _bloom_layout(n_keys: int, bits_per_key: int, max_bits: int) -> tuple[int, int]:
    """(n_blocks, m_per_block) for a blocked Bloom filter: enough
    hash-range blocks that each block's bitmap stays under ``max_bits``
    (a power of two), with m the power-of-two roundup of the per-block
    need. With ``max_bits`` a power of two, m <= max_bits always."""
    total = max(1, n_keys) * bits_per_key
    n_blocks = max(1, -(-total // max_bits))
    per_block = -(-max(1, n_keys) // n_blocks) * bits_per_key
    m = 1024
    while m < per_block and m < max_bits:
        m <<= 1
    return int(n_blocks), int(m)


def dup_span_fraction_approx(sf_dir: str, bits_per_key: int = _BLOOM_BITS_PER_KEY,
                             max_bits: int = _BLOOM_MAX_BITS):
    """``dup_span_fraction`` with the second all-to-all exchange
    replaced by a BLOCKED Bloom filter — the 100 TB shape named in
    the exact op's docstring. The df>=2 shingle set (far smaller than
    the shingle stream) is hash-partitioned into blocks of at most
    ``max_bits`` bits; each block is built by one ``map_groups`` task
    over only its own keys and published with its own ``ray.put``.
    Probing happens INSIDE the shingle map — each batch fetches only
    the blocks its rows hash to (plasma shared memory: one copy per
    NODE, not per worker) — so the only wide operations left are the
    df groupby and the final per-doc groupby of int rows. Driver peak
    memory is ONE block (<= max_bits/8 bytes) regardless of corpus
    size; at bench scale the layout degenerates to a single block.

    Error is one-sided: Bloom false positives can only OVERCOUNT
    ``n_dup`` (never undercount), bounded by the sizing (~0.1%
    theoretical at 16 bits/key, k=3). ``n_sh`` stays exact."""

    ds = _read_light(docs_path(sf_dir), columns=["doc_id", "text"])
    shingles = (
        ds.map_batches(lambda t: _shingle_batch(t, hashed=True), batch_format="pyarrow")
        .select_columns(["doc_id", "sh"])
        .materialize()
    )
    n_sh_rows = shingles.count()
    if n_sh_rows == 0:
        return empty_dataset(
            pa.schema([("doc_id", pa.int64()), ("n_sh", pa.int64()),
                       ("n_dup", pa.int64()), ("dup_ppm", pa.int64())])
        )
    dup_sh = (
        _reduce_keyed(
            shingles, "sh", _npart() * 8, _keyed_count_combine("sh", "df"),
            rows_hint=n_sh_rows,
        )
        .map_batches(
            lambda t: t.filter(pc.greater_equal(t["df"], pa.scalar(2))).select(["sh"]),
            batch_format="pyarrow",
        )
        .materialize()
    )
    n_keys = dup_sh.count()
    n_blocks, m = _bloom_layout(n_keys, bits_per_key, max_bits)

    def build_block(t: pa.Table) -> pa.Table:
        """One bitmap from ONE block's keys (map_groups: the group is
        complete, so the OR-reduce is local to this task)."""
        bits = np.zeros(m >> 6, dtype=np.uint64)
        h = t["sh"].to_numpy()
        for i in range(_BLOOM_K):
            idx = _bloom_indices(h, m, i)
            np.bitwise_or.at(bits, (idx >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (idx & np.uint64(63)))
        return pa.table({"block": pa.array([int(t["block"][0].as_py())], pa.int64()),
                         "bm": pa.array([bits.tobytes()], pa.binary())})

    # block id from the key hash (mod, not top bits: the probe offsets
    # already consume bits 0-59, and mod keeps non-power-of-two block
    # counts uniform). Blocks with no dup keys emit no row — probes
    # treat a missing block as all-absent.
    refs: dict[int, "ray.ObjectRef"] = {}
    if n_keys:
        blocked = dup_sh.map_batches(
            lambda t: t.append_column(
                "block",
                pa.array(
                    (t["sh"].to_numpy().astype(np.uint64)
                     % np.uint64(n_blocks)).astype(np.int64),
                    pa.int64(),
                ),
            ),
            batch_format="pyarrow",
        )
        built = blocked.groupby("block").map_groups(
            build_block, batch_format="pyarrow"
        )
        # driver holds ONE block transiently while publishing it
        for part in built.iter_batches(batch_format="pyarrow"):
            for blk, bm in zip(part["block"], part["bm"]):
                refs[int(blk.as_py())] = ray.put(
                    np.frombuffer(bm.as_py(), dtype=np.uint64)
                )

    def probe(t: pa.Table, _refs=refs) -> pa.Table:
        h = t["sh"].to_numpy()
        blk = (h.astype(np.uint64) % np.uint64(n_blocks)).astype(np.int64)
        present = np.zeros(len(h), dtype=bool)
        for b in np.unique(blk):
            ref = _refs.get(int(b))
            if ref is None:  # no dup shingle hashed into this block
                continue
            bits = ray.get(ref)  # zero-copy plasma read, shared per node
            sel = blk == b
            hs = h[sel]
            p = np.ones(len(hs), dtype=bool)
            for i in range(_BLOOM_K):
                idx = _bloom_indices(hs, m, i)
                word = bits[(idx >> np.uint64(6)).astype(np.int64)]
                p &= ((word >> (idx & np.uint64(63))) & np.uint64(1)).astype(bool)
            present[sel] = p
        return pa.table(
            {"doc_id": t["doc_id"], "is_dup": pa.array(present.astype(np.int64), pa.int64())}
        )

    per_doc = _reduce_keyed(
        shingles.map_batches(probe, batch_format="pyarrow"), "doc_id",
        _npart() * 8,
        _keyed_count_combine("doc_id", "n_sh", sum_col="is_dup", sum_name="n_dup"),
        rows_hint=n_sh_rows,
    )

    def ppm(t: pa.Table) -> pa.Table:
        n_sh = t["n_sh"].to_numpy().astype(np.float64)
        n_dup = t["n_dup"].to_numpy(zero_copy_only=False).astype(np.float64)
        out = np.floor(n_dup * 1e6 / n_sh + 0.5).astype(np.int64)
        return t.append_column("dup_ppm", pa.array(out, pa.int64()))

    return per_doc.map_batches(ppm, batch_format="pyarrow")


# ---- incremental dedup: a new batch arriving against an existing
#      corpus (the dedup twin of the index `extend` path). A new doc is
#      dropped if any existing doc shares its content hash; among new
#      docs sharing a hash unseen in the corpus, the smallest doc_id
#      survives. The demo split is deterministic (doc_id % 5 == 4 is
#      "new"); in production the existing side is the corpus's stored
#      hash column, so only hashes — never text — move through the
#      exchange. ----

_INCR_SENTINEL = np.iinfo(np.int64).max


def dedup_incremental(sf_dir: str):
    """(doc_id, status, dup_of) for every NEW doc: status in
    ('dup_existing', 'dup_new', 'keep'); dup_of is the surviving
    doc_id it collided with (-1 for keeps). ONE hash-partitioned
    exchange (``_reduce_keyed``): every row of a content hash lands in
    one partition, so the conditional mins AND the per-new-doc verdict
    are computed together in a vectorized pass — no per-group Python
    aggregate (the hash groups are near-singletons) and no join back
    to the new rows."""
    ds = _read_light(docs_path(sf_dir), columns=["doc_id", "text"])

    def hash_flag(t: pa.Table) -> pa.Table:
        h = hash_content_batch(t)["h"]
        ids = t["doc_id"].to_numpy()
        is_new = ids % 5 == 4
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "h": h,
                "exist_key": pa.array(
                    np.where(is_new, _INCR_SENTINEL, ids), pa.int64()
                ),
                "new_key": pa.array(
                    np.where(is_new, ids, _INCR_SENTINEL), pa.int64()
                ),
            }
        )

    hashed = ds.map_batches(hash_flag, batch_format="pyarrow")

    def verdict_partition(g: pa.Table) -> pa.Table:
        h = g["h"].to_numpy()
        order = np.argsort(h, kind="stable")
        h = h[order]
        ids = g["doc_id"].to_numpy()[order]
        ek = g["exist_key"].to_numpy()[order]
        nk = g["new_key"].to_numpy()[order]
        starts = np.flatnonzero(np.concatenate([[True], h[1:] != h[:-1]]))
        counts = np.diff(np.concatenate([starts, [len(h)]]))
        me = np.minimum.reduceat(ek, starts)  # min existing id per hash
        mn = np.minimum.reduceat(nk, starts)  # min new id per hash
        run = np.repeat(np.arange(len(starts)), counts)
        sel = np.flatnonzero(nk != _INCR_SENTINEL)  # the new rows
        ids_n = ids[sel]
        me_n = me[run[sel]]
        mn_n = mn[run[sel]]
        has_exist = me_n != _INCR_SENTINEL
        is_first_new = ids_n == mn_n
        status = np.where(
            has_exist, "dup_existing", np.where(is_first_new, "keep", "dup_new")
        )
        dup_of = np.where(has_exist, me_n, np.where(is_first_new, -1, mn_n))
        return pa.table(
            {
                "doc_id": pa.array(ids_n, pa.int64()),
                "status": pa.array(status.astype(object), pa.string()),
                "dup_of": pa.array(dup_of, pa.int64()),
            }
        )

    out_schema = pa.schema([("doc_id", pa.int64()), ("status", pa.string()),
                            ("dup_of", pa.int64())])
    return empty_dataset(out_schema).union(
        _reduce_keyed(hashed, "h", _npart() * 8, verdict_partition,
                      rows_hint=parquet_rows(docs_path(sf_dir)))
    )


SQL_DEDUP_INCREMENTAL = f"""
WITH h AS (
    SELECT doc_id, {_MD5_SQL.format("coalesce(text, '')")} AS h,
           doc_id % 5 = 4 AS is_new
    FROM documents
),
agg AS (
    SELECT h,
           MIN(CASE WHEN NOT is_new THEN doc_id END) AS min_exist,
           MIN(CASE WHEN is_new THEN doc_id END) AS min_new
    FROM h GROUP BY h
)
SELECT n.doc_id,
       CASE WHEN a.min_exist IS NOT NULL THEN 'dup_existing'
            WHEN n.doc_id = a.min_new THEN 'keep'
            ELSE 'dup_new' END AS status,
       COALESCE(a.min_exist,
                CASE WHEN n.doc_id = a.min_new THEN -1 ELSE a.min_new END
       ) AS dup_of
FROM h n JOIN agg a USING (h) WHERE n.is_new
"""


RAY_QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
    "dedup_embedding": dedup_embedding,
    "dedup_clusters": dedup_clusters,
    "dedup_embedding_lsh": dedup_embedding_lsh,
    "dup_span_fraction": dup_span_fraction,
    "dedup_incremental": dedup_incremental,
}

# aux entry (after the 50-entry driver window; tools_verify checks it
# against the full oracle below — the blocked-Bloom layout is
# deterministic given the key set, so even the false positives are
# SQL-reproducible)
RAY_QUERIES_AUX = {
    "dup_span_approx": dup_span_fraction_approx,
}

# The approximate op has a FULL oracle: the Bloom layout
# (_bloom_layout) and the Kirsch-Mitzenmacher probe arithmetic
# (_bloom_indices) are pure integer functions of the md5-60 shingle
# hashes, which the SQL twin reproduces exactly — `bits` materializes
# the set positions per block, `probes` recomputes each shingle's 3
# probe positions, and a shingle is flagged dup iff all 3 hit. This
# reproduces the one-sided Bloom error bit-for-bit (false positives
# included), so the driver's value-hash compare holds.
SQL_DUP_SPAN_APPROX = f"""
WITH {_SQL_SHINGLES},
sh60 AS (
    SELECT doc_id, {_MD5_SQL.format("sh")} AS h FROM tri
),
dupk AS (
    SELECT h FROM sh60 GROUP BY h HAVING COUNT(*) >= 2
),
layout AS (
    SELECT n_blocks,
           CASE WHEN per_block <= 1024 THEN 1024
                WHEN per_block >= {_BLOOM_MAX_BITS} THEN {_BLOOM_MAX_BITS}
                ELSE CAST(power(2, ceil(log2(per_block::DOUBLE))) AS BIGINT)
           END AS m
    FROM (
        SELECT n_blocks,
               ((nk + n_blocks - 1) // n_blocks) * {_BLOOM_BITS_PER_KEY} AS per_block
        FROM (
            SELECT nk,
                   (nk * {_BLOOM_BITS_PER_KEY} + {_BLOOM_MAX_BITS - 1}) // {_BLOOM_MAX_BITS} AS n_blocks
            FROM (SELECT GREATEST(1, (SELECT COUNT(*) FROM dupk)) AS nk)
        )
    )
),
bits AS (
    SELECT DISTINCT d.h % l.n_blocks AS block,
           ((d.h & (l.m - 1)) + i.i * ((d.h >> 30) | 1)) & (l.m - 1) AS pos
    FROM dupk d CROSS JOIN layout l
    CROSS JOIN (VALUES (0), (1), (2)) AS i(i)
),
probes AS (
    SELECT s.doc_id, s.h, s.h % l.n_blocks AS block,
           ((s.h & (l.m - 1)) + i.i * ((s.h >> 30) | 1)) & (l.m - 1) AS pos
    FROM sh60 s CROSS JOIN layout l
    CROSS JOIN (VALUES (0), (1), (2)) AS i(i)
),
flag AS (
    SELECT p.doc_id, p.h,
           CASE WHEN COUNT(b.pos) = 3 THEN 1 ELSE 0 END AS is_dup
    FROM probes p LEFT JOIN bits b ON p.block = b.block AND p.pos = b.pos
    GROUP BY p.doc_id, p.h
)
SELECT doc_id, COUNT(*) AS n_sh,
       CAST(SUM(is_dup) AS BIGINT) AS n_dup,
       CAST(floor(SUM(is_dup) * 1000000.0 / COUNT(*) + 0.5) AS BIGINT) AS dup_ppm
FROM flag GROUP BY doc_id
"""

ORACLE_SQL_AUX = {
    "dup_span_approx": SQL_DUP_SPAN_APPROX,
}

ORACLE_SQL = {
    "dedup_exact": SQL_DEDUP_EXACT,
    "dedup_ngram_jaccard": SQL_NGRAM_JACCARD,
    "dedup_minhash_lsh": SQL_MINHASH_LSH,
    "dedup_simhash": SQL_SIMHASH,
    "dedup_embedding": SQL_DEDUP_EMBEDDING,
    "dedup_clusters": SQL_DEDUP_CLUSTERS,
    "dedup_embedding_lsh": _dedup_embedding_lsh_sql(),
    "dup_span_fraction": SQL_DUP_SPAN_FRACTION,
    "dedup_incremental": SQL_DEDUP_INCREMENTAL,
}


