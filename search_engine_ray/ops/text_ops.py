"""Text-analysis operators over the ``documents`` table.

Tokenization semantics are the engine's normative ones (lowercase,
10k-char truncation, ``[^0-9a-z]+`` split, 20-char cap, 12-word skip
list — `/root/reference/src/cis5550/jobs/Indexer.java:33-38,129-169`),
mirrored exactly in the DuckDB oracle SQL. Ratios are rounded to 6
decimals on both sides so value hashes cannot diverge on float noise.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..io import empty_dataset, join_np, read_parquet_light

from ..config import IndexConfig, SKIP_WORDS, STOPWORDS
from ..functions.analysis import split_tokens, split_tokens_arrow
from .dedup import _MD5_SQL

_SKIP_SQL = ",".join("'" + w.replace("'", "''") + "'" for w in sorted(SKIP_WORDS))
_STOP_SQL = ",".join("'" + w.replace("'", "''") + "'" for w in sorted(STOPWORDS))

# Non-English ISO 639-1 language codes (the reference's
# nonEnglishUrlLanguageCodes idea, EnglishFilter.java:30-95 — standard
# public code list, not a copy of its exact membership).
NON_ENGLISH_CODES = frozenset(
    """af am ar az be bg bn bs ca cs cy da de el eo es et eu fa fi fr
    ga gl gu he hi hr hu hy id is it ja ka kk km kn ko ky lo lt lv mk
    ml mn mr ms my ne nl no pa pl ps pt ro ru sd si sk sl sq sr sv sw
    ta te tg th tl tr uk ur uz vi yi zh zu""".split()
)
_CODES_SQL = ",".join(f"'{c}'" for c in sorted(NON_ENGLISH_CODES))

_TOKS_CTE = f"""
toks AS (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(substr(text, 1, 10000)), '[^0-9a-z]+')) AS term
    FROM documents
),
toks_ne AS (SELECT * FROM toks WHERE term <> ''),
toks_idx AS (
    SELECT * FROM toks_ne
    WHERE length(term) <= 20 AND term NOT IN ({_SKIP_SQL})
)
"""


def _docs(sf_dir: str, columns=None):
    # size-aware block count (io.small_input_blocks): tokenization is
    # real per-row work, but blocks stay >= cpus/4 so it still spreads
    path = f"{sf_dir}/documents.parquet"
    return read_parquet_light(path, columns=columns)


# ---- term statistics (df + collection tf) — the dictionary build as a
#      standalone op; pre-aggregated per batch before the term shuffle ----

def term_stats(sf_dir: str):
    cfg = IndexConfig(stemming=False)

    def partial(t: pa.Table) -> pa.Table:
        doc_idx, tok, _pos, lens, _dl = split_tokens(t["text"].combine_chunks(), cfg)
        keep = (lens <= cfg.max_word_len) & ~np.isin(tok, _SKIP_ARR)
        tok, doc_idx = tok[keep], doc_idx[keep]
        if len(tok) == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64()),
                             "tf": pa.array([], pa.int64())})
        uniq, inv = np.unique(tok, return_inverse=True)
        key = inv.astype(np.int64) * (doc_idx.max() + 1) + doc_idx
        _, first_idx, counts = np.unique(key, return_index=True, return_counts=True)
        term_of_entry = inv[first_idx]
        df = np.bincount(term_of_entry, minlength=len(uniq))
        tf = np.bincount(inv)
        return pa.table(
            {"term": pa.array(uniq, pa.string()),
             "df": pa.array(df, pa.int64()),
             "tf": pa.array(tf, pa.int64())}
        )

    # partition-vectorized term reduction (dedup._reduce_keyed): term
    # groups are near-unique after the per-batch combiner, and Ray's
    # aggregate pays Python per group — at web scale that is once per
    # vocabulary entry
    from ..io import empty_dataset
    from .dedup import _keyed_count_combine, _npart, _reduce_keyed

    out_schema = pa.schema(
        [("term", pa.string()), ("df", pa.int64()), ("tf", pa.int64())]
    )
    return empty_dataset(out_schema).union(
        _reduce_keyed(
            _docs(sf_dir, ["text"]).map_batches(partial, batch_format="pyarrow"),
            "term", _npart() * 8,
            _keyed_count_combine("term", sums=(("df", "df"), ("tf", "tf"))),
        )
    )


_SKIP_ARR = np.array(sorted(SKIP_WORDS), dtype=object)

SQL_TERM_STATS = f"""
WITH {_TOKS_CTE}
SELECT term, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS tf
FROM toks_idx GROUP BY term
"""


# ---- per-doc stats (doclen = non-empty token count, pre-filter) ----

def doc_stats(sf_dir: str):
    cfg = IndexConfig(stemming=False)

    def stats(t: pa.Table) -> pa.Table:
        *_, doclens = split_tokens(t["text"].combine_chunks(), cfg)
        return pa.table(
            {"doc_id": t["doc_id"], "doclen": pa.array(doclens.astype(np.int64), pa.int64())}
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(stats, batch_format="pyarrow")


SQL_DOC_STATS = """
SELECT doc_id,
       len(list_filter(regexp_split_to_array(lower(substr(text, 1, 10000)), '[^0-9a-z]+'),
                       x -> x <> '')) AS doclen
FROM documents
"""


# ---- prefix autocomplete (suggest-as-you-type over the corpus
#      vocabulary: top-k terms by df per prefix; the batch twin of the
#      serving tier's dictionary-backed /suggest route,
#      serve.py + functions/suggest.py) ----

# probe prefixes chosen against the synthetic corpus vocabulary so
# each has MANY completions (top-k competition + tie-breaks exercised;
# 'w' additionally matches the long low-df w#### worker-token tail)
_SUGGEST_PREFIXES = ("s", "c", "qu", "f", "b", "w")
_SUGGEST_K = 10


def suggest_prefix(sf_dir: str, k: int = _SUGGEST_K):
    """For each probe prefix, the ``k`` highest-df vocabulary terms
    extending it (tie-break df desc, term asc — the order
    ``PrefixSuggester`` serves live). Built on the fully-reduced
    ``term_stats`` dataset, so each term appears exactly once: the
    per-batch local top-k is a correct combiner (batches are
    term-disjoint) and the final per-prefix merge sees at most
    ``k * n_blocks`` candidate rows. The groupby key space is the
    fixed prefix list (bounded), so the native groupby is the cheap
    shape here."""
    stats = term_stats(sf_dir)

    def local_topk(t: pa.Table) -> pa.Table:
        terms = t["term"].to_numpy(zero_copy_only=False)
        dfs = t["df"].to_numpy()
        parts = []
        for p in _SUGGEST_PREFIXES:
            m = pc.starts_with(t["term"], pattern=p).to_numpy(
                zero_copy_only=False
            )
            if not m.any():
                continue
            ts, ds = terms[m], dfs[m]
            sel = np.lexsort((ts, -ds))[:k]
            parts.append(pa.table({
                "prefix": pa.array([p] * len(sel), pa.string()),
                "term": pa.array(ts[sel], pa.string()),
                "df": pa.array(ds[sel], pa.int64()),
            }))
        if not parts:
            return pa.table({"prefix": pa.array([], pa.string()),
                             "term": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        return pa.concat_tables(parts)

    def final_topk(g: pa.Table) -> pa.Table:
        ts = g["term"].to_numpy(zero_copy_only=False)
        ds = g["df"].to_numpy()
        sel = np.lexsort((ts, -ds))[:k]
        n = len(sel)
        return pa.table({
            "prefix": pa.array([g["prefix"][0].as_py()] * n, pa.string()),
            "term": pa.array(ts[sel], pa.string()),
            "df": pa.array(ds[sel], pa.int64()),
            "rank": pa.array(np.arange(1, n + 1), pa.int64()),
        })

    out_schema = pa.schema([
        ("prefix", pa.string()), ("term", pa.string()),
        ("df", pa.int64()), ("rank", pa.int64()),
    ])
    return empty_dataset(out_schema).union(
        stats.map_batches(local_topk, batch_format="pyarrow")
        .groupby("prefix")
        .map_groups(final_topk, batch_format="pyarrow")
    )


_SUGGEST_VALUES = ", ".join(f"('{p}')" for p in _SUGGEST_PREFIXES)

SQL_SUGGEST_PREFIX = f"""
WITH {_TOKS_CTE},
df_t AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks_idx GROUP BY term),
ranked AS (
    SELECT p.prefix AS prefix, d.term AS term, d.df AS df,
           row_number() OVER (PARTITION BY p.prefix
                              ORDER BY d.df DESC, d.term ASC) AS rank
    FROM (VALUES {_SUGGEST_VALUES}) p(prefix)
    JOIN df_t d ON d.term LIKE p.prefix || '%'
)
SELECT prefix, term, df, rank FROM ranked WHERE rank <= {_SUGGEST_K}
"""


# ---- quality scoring (length / character-class ratios) ----

def text_quality(sf_dir: str):
    cfg = IndexConfig(stemming=False)

    def quality(t: pa.Table) -> pa.Table:
        # fill_null: a null text's utf8_length is NaN, and NaN.astype
        # (int64) is INT64_MIN garbage; null == empty here, mirrored by
        # coalesce in the SQL twin
        text = pc.fill_null(t["text"].combine_chunks(), "")
        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        alpha = pc.utf8_length(
            pc.replace_substring_regex(text, "[^A-Za-z]", "")
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        digit = pc.utf8_length(
            pc.replace_substring_regex(text, "[^0-9]", "")
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        *_, doclens = split_tokens(text, cfg)
        denom = np.maximum(n_chars, 1).astype(np.float64)
        # integer parts-per-million with floor(x + 0.5): numpy's and
        # DuckDB's round() disagree at the ULP level on float64 ratios,
        # which flips the driver's exact value hash — int ppm cannot
        # (same pattern as knn.embedding_quantize)
        alpha_ppm = np.floor(alpha * 1e6 / denom + 0.5).astype(np.int64)
        digit_ppm = np.floor(digit * 1e6 / denom + 0.5).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": pa.array(n_chars, pa.int64()),
                "n_tokens": pa.array(doclens.astype(np.int64), pa.int64()),
                "alpha_ppm": pa.array(alpha_ppm, pa.int64()),
                "digit_ppm": pa.array(digit_ppm, pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(quality, batch_format="pyarrow")


SQL_TEXT_QUALITY = """
WITH d AS (SELECT doc_id, coalesce(text, '') AS text FROM documents)
SELECT doc_id,
       length(text) AS n_chars,
       len(list_filter(regexp_split_to_array(lower(substr(text, 1, 10000)), '[^0-9a-z]+'),
                       x -> x <> '')) AS n_tokens,
       CAST(floor(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) * 1e6
             / greatest(length(text), 1) + 0.5) AS BIGINT) AS alpha_ppm,
       CAST(floor(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) * 1e6
             / greatest(length(text), 1) + 0.5) AS BIGINT) AS digit_ppm
FROM d
"""


# ---- language ID (n-gram/stopword heuristic) ----

def lang_id(sf_dir: str):
    cfg = IndexConfig(stemming=False)
    stop_arr = np.array(sorted(STOPWORDS), dtype=object)

    def lid(t: pa.Table) -> pa.Table:
        doc_idx, tok, _pos, _lens, doclens = split_tokens(t["text"].combine_chunks(), cfg)
        is_stop = np.isin(tok, stop_arr)
        n_stop = np.bincount(doc_idx[is_stop], minlength=t.num_rows).astype(np.int64)
        ratio = np.round(n_stop / np.maximum(doclens, 1), 6)
        pred = np.where(ratio >= 0.05, "en", "unknown")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "stopword_ratio": pa.array(ratio, pa.float64()),
                "lang_pred": pa.array(pred, pa.string()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(lid, batch_format="pyarrow")


SQL_LANG_ID = f"""
WITH {_TOKS_CTE},
per_doc AS (
    SELECT d.doc_id,
           COALESCE(SUM(CASE WHEN t.term IN ({_STOP_SQL}) THEN 1 ELSE 0 END), 0) AS n_stop,
           COUNT(t.term) AS n_tok
    FROM documents d LEFT JOIN toks_ne t ON d.doc_id = t.doc_id
    GROUP BY d.doc_id
)
SELECT doc_id,
       round(n_stop * 1.0 / greatest(n_tok, 1), 6) AS stopword_ratio,
       CASE WHEN n_stop * 1.0 / greatest(n_tok, 1) >= 0.05 THEN 'en' ELSE 'unknown' END AS lang_pred
FROM per_doc
"""


# ---- repetition statistics (Gopher-style n-gram repetition filters) ----

def _ngram_doc_stats(
    doc_idx: np.ndarray, flat: pa.Array, n: int, n_docs: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc (top n-gram count, distinct n-gram count) over the
    non-empty token stream, fully vectorized: adjacent tokens are
    joined with Arrow's binary_join_element_wise (C kernel), n-grams
    crossing doc boundaries are masked out, and per-(doc, gram) counts
    come from one np.unique over a composite int64 key — no Python
    loop over rows or grams."""
    top = np.zeros(n_docs, np.int64)
    dist = np.zeros(n_docs, np.int64)
    L = len(flat)
    if L < n:
        return top, dist
    if n == 1:
        grams, gdoc = flat, doc_idx
    else:
        parts = [flat.slice(i, L - n + 1) for i in range(n)]
        grams = pc.binary_join_element_wise(*parts, " ")
        # an n-gram is in-doc iff its first and last token share a doc
        same = doc_idx[: L - n + 1] == doc_idx[n - 1 :]
        grams = grams.filter(pa.array(same))
        gdoc = doc_idx[: L - n + 1][same]
        if len(grams) == 0:
            return top, dist
    codes = grams.dictionary_encode().indices.to_numpy(zero_copy_only=False)
    key = codes.astype(np.int64) * n_docs + gdoc
    uniq_key, counts = np.unique(key, return_counts=True)
    kdoc = (uniq_key % n_docs).astype(np.int64)
    np.maximum.at(top, kdoc, counts)
    np.add.at(dist, kdoc, 1)
    return top, dist


def _ppm(num: np.ndarray, den: np.ndarray) -> pa.Array:
    # integer parts-per-million with floor(x + 0.5) — the text_quality /
    # embedding_quantize pattern (numpy and DuckDB round() disagree at
    # the ULP on float64; int ppm cannot)
    v = np.floor(num.astype(np.float64) * 1e6 / np.maximum(den, 1) + 0.5)
    return pa.array(v.astype(np.int64), pa.int64())


def repetition_stats(sf_dir: str):
    """Gopher-style repetition quality filters (Rae et al. 2021,
    "Scaling Language Models", App. A1.1 — public): per-doc fraction of
    the token stream covered by the most frequent unigram / bigram /
    trigram plus the duplicate-bigram fraction, over the normative
    token stream (lowercase, 10k-char truncation, non-alnum split).
    High values flag boilerplate and degenerate repetition for removal
    before training. Emits integer ppm so the DuckDB twin hashes
    identically."""
    cfg = IndexConfig(stemming=False)

    def rep(t: pa.Table) -> pa.Table:
        doc_idx, flat, _pos, _lens, doclens = split_tokens_arrow(
            pc.fill_null(t["text"].combine_chunks(), ""), cfg
        )
        n_docs = t.num_rows
        n1 = doclens.astype(np.int64)
        n2 = np.maximum(n1 - 1, 0)
        n3 = np.maximum(n1 - 2, 0)
        top1, _ = _ngram_doc_stats(doc_idx, flat, 1, n_docs)
        top2, dist2 = _ngram_doc_stats(doc_idx, flat, 2, n_docs)
        top3, _ = _ngram_doc_stats(doc_idx, flat, 3, n_docs)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n1, pa.int64()),
                "top_unigram_ppm": _ppm(top1, n1),
                "top_bigram_ppm": _ppm(top2, n2),
                "dup_bigram_ppm": _ppm(n2 - dist2, n2),
                "top_trigram_ppm": _ppm(top3, n3),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(rep, batch_format="pyarrow")


SQL_REPETITION_STATS = """
WITH d AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(substr(coalesce(text,''),1,10000)), '[^0-9a-z]+'),
                     x -> x <> '') AS toks
  FROM documents
),
base AS (SELECT doc_id, toks, len(toks) AS n FROM d),
uc AS (
  SELECT doc_id, g, count(*) AS c
  FROM (SELECT doc_id, unnest(toks) AS g FROM base) GROUP BY 1, 2
),
ustat AS (SELECT doc_id, max(c) AS top1 FROM uc GROUP BY 1),
bc AS (
  SELECT doc_id, g, count(*) AS c
  FROM (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS g
        FROM base, unnest(range(1, n)) AS r(i)) GROUP BY 1, 2
),
bstat AS (SELECT doc_id, max(c) AS top2, count(*) AS dist2 FROM bc GROUP BY 1),
tc AS (
  SELECT doc_id, g, count(*) AS c
  FROM (SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
        FROM base, unnest(range(1, n - 1)) AS r(i)) GROUP BY 1, 2
),
tstat AS (SELECT doc_id, max(c) AS top3 FROM tc GROUP BY 1)
SELECT base.doc_id,
       base.n AS n_tokens,
       CAST(floor(CAST(coalesce(u.top1, 0) AS DOUBLE) * 1e6 / greatest(base.n, 1) + 0.5) AS BIGINT)
           AS top_unigram_ppm,
       CAST(floor(CAST(coalesce(b.top2, 0) AS DOUBLE) * 1e6 / greatest(base.n - 1, 1) + 0.5) AS BIGINT)
           AS top_bigram_ppm,
       CAST(floor(CAST(greatest(base.n - 1, 0) - coalesce(b.dist2, 0) AS DOUBLE) * 1e6
             / greatest(base.n - 1, 1) + 0.5) AS BIGINT) AS dup_bigram_ppm,
       CAST(floor(CAST(coalesce(t.top3, 0) AS DOUBLE) * 1e6 / greatest(base.n - 2, 1) + 0.5) AS BIGINT)
           AS top_trigram_ppm
FROM base
LEFT JOIN ustat u USING (doc_id)
LEFT JOIN bstat b USING (doc_id)
LEFT JOIN tstat t USING (doc_id)
"""


# ---- document fingerprint (rolling polynomial hash over tokens) ----

_FP_MOD = (1 << 61) - 1
_FP_BASE = 1_000_003


def _fingerprint_batch(text: pa.Array, n_rows: int) -> np.ndarray:
    """Shared kernel: polynomial rolling hash of the analyzed token
    stream (md5-60 token hashes folded mod 2^61-1), one int64 per row.
    The single implementation both ``fingerprint`` and
    ``text_features`` call — they share ONE SQL twin
    (``SQL_FINGERPRINT``'s list_reduce), so the fold must live in
    exactly one place."""
    import hashlib

    cfg = IndexConfig(stemming=False)
    doc_idx, tok, *_rest = split_tokens(text, cfg)
    out = np.zeros(n_rows, dtype=np.int64)
    uniq, inv = (
        np.unique(np.asarray(tok, dtype=object), return_inverse=True)
        if len(tok)
        else (np.array([], object), np.array([], np.int64))
    )
    uh = [int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in uniq]
    token_h = [uh[i] for i in inv]
    bounds = np.searchsorted(doc_idx, np.arange(n_rows + 1))
    for d in range(n_rows):
        h = 0
        for v in token_h[bounds[d] : bounds[d + 1]]:
            h = (h * _FP_BASE + v) % _FP_MOD
        out[d] = h
    return out


def _token_count_cols(text: pa.Array) -> dict:
    """Shared kernel: the two token budgets (whitespace + BPE-ish
    pretokenizer), RE2-vectorized; used by ``token_count_bpe`` and
    ``text_features`` against the one ``SQL_TOKEN_COUNT_BPE`` twin."""
    return {
        "n_ws_tokens": pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64()),
        "n_bpe_tokens": pc.cast(pc.count_substring_regex(text, _BPE_PATTERN), pa.int64()),
    }


def fingerprint(sf_dir: str):
    """Deterministic polynomial rolling hash of the token stream
    (md5-60 token hashes folded mod 2^61-1) — content fingerprinting
    for exact-dup detection at scale. Token hashes are computed once
    per unique batch token; the per-doc fold is inherently sequential
    but O(doclen). The DuckDB oracle reproduces it with list_reduce
    over a HUGEINT accumulator."""

    def fp(t: pa.Table) -> pa.Table:
        out = _fingerprint_batch(t["text"].combine_chunks(), t.num_rows)
        return pa.table(
            {"doc_id": t["doc_id"], "fingerprint": pa.array(out, pa.int64())}
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fp, batch_format="pyarrow")


SQL_FINGERPRINT = """
SELECT doc_id,
       CAST(list_reduce(
           list_prepend(
               CAST(0 AS HUGEINT),
               list_transform(
                   list_filter(regexp_split_to_array(lower(substr(text, 1, 10000)), '[^0-9a-z]+'),
                               x -> x <> ''),
                   t -> CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT))),
           (acc, x) -> (acc * 1000003 + x) % 2305843009213693951
       ) AS BIGINT) AS fingerprint
FROM documents
"""


# ---- BPE-ish token counting (training-data budgeting): GPT-2-style
#      pretokenizer regex, simplified to RE2 (no lookahead) so Arrow's
#      count_substring_regex and DuckDB's regexp_extract_all — both
#      RE2 — count identically ----

_BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s']+|\s+"


def token_count_bpe(sf_dir: str):
    """(doc_id, n_ws_tokens, n_bpe_tokens): whitespace-delimited count
    and the BPE-ish pretokenization count — the two token budgets a
    training pipeline tracks. Fully vectorized (RE2 kernels)."""

    def counts(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t["text"].combine_chunks(), "")
        return pa.table({"doc_id": t["doc_id"], **_token_count_cols(text)})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(counts, batch_format="pyarrow")


SQL_TOKEN_COUNT_BPE = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{_BPE_PATTERN.replace("'", "''")}')) AS BIGINT) AS n_bpe_tokens
FROM documents
"""


# ---- sequence packing (concat-and-chunk pretraining layout): a
#      distributed prefix sum over per-doc token counts assigns each
#      doc its global token span and the L-token training sequences it
#      lands in. Pass 1 reduces tiny (bucket, token_sum) rows (bucket =
#      doc_id // span) and the driver turns them into exclusive bucket
#      bases (one int per bucket — broadcast, never per-doc state);
#      pass 2 is a bucket-partitioned map_groups: in-bucket vectorized
#      cumsum + the broadcast base. At 100 TB set span ~1M docs: driver
#      state is N/1e6 ints and each group is a ~16 MB task. The token
#      projection is recomputed for pass 2 (lineage re-executes the
#      pruned 2-column read) — cheaper than materializing N rows. ----

_PACK_L = 512       # tokens per packed training sequence
_PACK_SPAN = 256    # doc_ids per prefix-sum bucket (test-sized; ~1M at scale)


def pack_sequences(sf_dir: str, L: int = _PACK_L, span: int = _PACK_SPAN):
    """(doc_id, n_tokens, tok_start, tok_end, seq_first, seq_last,
    n_seqs) for every non-empty doc under GPT-style concat-and-chunk
    packing in doc_id order; docs straddle sequence boundaries, so a
    doc's sequences are the L-token windows its span overlaps."""

    def toks(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t["text"].combine_chunks(), "")
        n = pc.count_substring_regex(text, _BPE_PATTERN).cast(pa.int64())
        doc = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": n,
                "bucket": pa.array(doc // span, pa.int64()),
            }
        )

    counts = _docs(sf_dir, ["doc_id", "text"]).map_batches(toks, batch_format="pyarrow")

    from ray.data.aggregate import Sum

    sums = (
        counts.groupby("bucket")
        .aggregate(Sum("n_tokens", alias_name="bucket_tokens"))
        .to_pandas()
        .sort_values("bucket")
    )
    per_bucket_tok = sums["bucket_tokens"].to_numpy(dtype=np.int64)
    bases = np.concatenate([[0], np.cumsum(per_bucket_tok)[:-1]]).astype(np.int64)
    base_ref = ray.put(dict(zip(sums["bucket"].astype(int), bases)))

    def span_of_bucket(g: pa.Table, _ref=base_ref) -> pa.Table:
        base = ray.get(_ref)[int(g["bucket"][0].as_py())]
        g = g.take(pc.sort_indices(g, sort_keys=[("doc_id", "ascending")]))
        n = g["n_tokens"].combine_chunks().to_numpy(zero_copy_only=False)
        start = base + np.concatenate([[0], np.cumsum(n)[:-1]]).astype(np.int64)
        end = start + n
        last = np.maximum(end - 1, start)  # n==0 rows filtered below
        out = pa.table(
            {
                "doc_id": g["doc_id"],
                "n_tokens": g["n_tokens"],
                "tok_start": pa.array(start, pa.int64()),
                "tok_end": pa.array(end, pa.int64()),
                "seq_first": pa.array(start // L, pa.int64()),
                "seq_last": pa.array(last // L, pa.int64()),
                "n_seqs": pa.array(last // L - start // L + 1, pa.int64()),
            }
        )
        return out.filter(pa.array(n > 0))

    return counts.groupby("bucket").map_groups(span_of_bucket, batch_format="pyarrow")


SQL_PACK_SEQUENCES = f"""
WITH ptoks AS (
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_BPE_PATTERN.replace("'", "''")}')) AS BIGINT) AS n_tokens
    FROM documents
), pos AS (
    SELECT doc_id, n_tokens,
           CAST(COALESCE(SUM(n_tokens) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS tok_start
    FROM ptoks
)
SELECT doc_id, n_tokens, tok_start, tok_start + n_tokens AS tok_end,
       tok_start // {_PACK_L} AS seq_first,
       (tok_start + n_tokens - 1) // {_PACK_L} AS seq_last,
       (tok_start + n_tokens - 1) // {_PACK_L} - tok_start // {_PACK_L} + 1 AS n_seqs
FROM pos WHERE n_tokens > 0
"""


# ---- unigram-LM quality scoring (KenLM-style perplexity proxy): each
#      doc's log-probability under the corpus's own unigram model.
#      Vocabulary travels as a dataset through a term-keyed join — never
#      broadcast or driver-held — and each (doc, term) contribution is
#      floored to integer micro-nats BEFORE the per-doc sum, so the sum
#      is order-independent (float ln is computed once per joined row
#      from identical integer inputs on both sides; only the one ln
#      carries ULP risk, never the aggregation). ----


def _join_npart() -> int:
    from .dedup import _npart

    return _npart()


def _per_doc_tf(t: pa.Table) -> pa.Table:
    """(doc_id, term, tf) rows for a batch — a doc's text lives in one
    input row, so per-batch tf is already final per (doc, term); any
    downstream groupby only merges across docs."""
    cfg = IndexConfig(stemming=False)
    ids = t["doc_id"].to_numpy()
    doc_idx, tok, _pos, _lens, _dl = split_tokens(t["text"].combine_chunks(), cfg)
    if len(tok) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "term": pa.array([], pa.string()),
                         "tf": pa.array([], pa.int64())})
    uniq, inv = np.unique(tok, return_inverse=True)
    n_docs = len(ids)
    key = inv.astype(np.int64) * n_docs + doc_idx
    ukey, counts = np.unique(key, return_counts=True)
    return pa.table(
        {
            "doc_id": pa.array(ids[ukey % n_docs], pa.int64()),
            "term": pa.array(uniq[ukey // n_docs], pa.string()),
            "tf": pa.array(counts, pa.int64()),
        }
    )


_TF_ROWS_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("term", pa.string()), ("tf", pa.int64())]
)


def _doc_term_tf(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _per_doc_tf, batch_format="pyarrow"
    )


_BCAST_VOCAB_ROWS = 2_000_000  # vocab rows broadcast instead of hash-joined


def _vocab_ref(ds, key: str, val: str):
    """Broadcast a materialized vocab-shaped dataset (term -> int) as
    ``ray.put((keys, vals))``, or None when it exceeds the gate and the
    caller must hash-join instead. Vocabularies grow sublinearly with
    corpus size, so the broadcast is the common case even at 100 TB —
    one plasma copy per node, probed zero-shuffle inside map_batches."""
    if ds.count() > _BCAST_VOCAB_ROWS:
        return None
    # groupby output blocks may disagree on string width (string vs
    # large_string) — promote, then pin one probe type
    vt = pa.concat_tables(ray.get(ds.to_arrow_refs()), promote_options="permissive")
    return ray.put(
        (vt[key].combine_chunks().cast(pa.large_string()), vt[val].to_numpy())
    )


def _vocab_probe(col, payload) -> np.ndarray:
    """Exact string-keyed lookup via the ``pc.index_in`` Arrow kernel.
    Callers guarantee every probe key exists in the vocab (both are
    built from the same token stream), so index_in never yields null."""
    keys, vals = payload
    idx = pc.index_in(pc.cast(col, pa.large_string()), value_set=keys).to_numpy()
    return vals[idx]


def unigram_logprob(sf_dir: str):
    """(doc_id, n_tokens, lp_micro, lp_mean_micro): total and per-token
    corpus-unigram log-probability in integer micro-nats. Low (very
    negative) mean = rare-token-heavy doc; high = boilerplate. Shape:
    per-batch (doc, term, tf) combiner -> term groupby for the global
    unigram table -> tf_global shipped back to the tf rows -> doc
    groupby of integer contributions. The ship-back is SIZE-GATED: a
    vocabulary under ``_BCAST_VOCAB_ROWS`` (sublinear in corpus size —
    the common case even at 100 TB) is broadcast once via ``ray.put``
    and probed with the ``pc.index_in`` Arrow kernel inside the map;
    above the gate it falls back to the term-keyed hash join. Both
    paths hit identical integers: index_in is exact string membership
    and the arithmetic is shared."""
    from .dedup import _keyed_count_combine, _npart as _dnp, _reduce_keyed

    tf_rows = _doc_term_tf(sf_dir).materialize()  # feeds the unigram groupby AND the join
    unigram = _reduce_keyed(
        tf_rows, "term", _dnp() * 8,
        _keyed_count_combine("term", sums=(("tf", "tf_global"),)),
    ).materialize()  # consumed by the total below AND the ship-back
    total = int(unigram.sum(on="tf_global") or 0)
    if total == 0:  # token-free corpus: no docs to score
        return empty_dataset(
            pa.schema(
                [("doc_id", pa.int64()), ("n_tokens", pa.int64()),
                 ("lp_micro", pa.int64()), ("lp_mean_micro", pa.int64())]
            )
        )
    n_vocab = unigram.count()

    def _lp(tf_i64: pa.Array, g: np.ndarray) -> pa.Array:
        tf = tf_i64.to_numpy().astype(np.float64)
        c = np.floor(tf * np.log(g / total) * 1e6).astype(np.int64)
        return pa.array(c, pa.int64())

    ref = _vocab_ref(unigram, "term", "tf_global")
    if ref is not None:

        def contrib_bcast(t: pa.Table, _ref=ref) -> pa.Table:
            g = _vocab_probe(t["term"], ray.get(_ref)).astype(np.float64)
            return pa.table(
                {
                    "doc_id": t["doc_id"],
                    "tf": t["tf"],
                    "lp_micro": _lp(t["tf"], g),
                }
            )

        contributed = tf_rows.map_batches(contrib_bcast, batch_format="pyarrow")
    else:
        np_ = join_np(n_vocab, _join_npart())

        def contrib(t: pa.Table) -> pa.Table:
            g = t["tf_global"].to_numpy().astype(np.float64)
            return pa.table(
                {
                    "doc_id": t["doc_id"],
                    "tf": t["tf"],
                    "lp_micro": _lp(t["tf"], g),
                }
            )

        contributed = tf_rows.join(
            unigram, join_type="inner", num_partitions=np_, on=("term",)
        ).map_batches(contrib, batch_format="pyarrow")

    # doc-keyed reduction: doc groups are near-unique (O(corpus) of
    # them), so this too is partition-vectorized
    per_doc = _reduce_keyed(
        contributed, "doc_id", _dnp() * 8,
        _keyed_count_combine(
            "doc_id", sums=(("tf", "n_tokens"), ("lp_micro", "lp_micro"))
        ),
    )

    def mean_col(t: pa.Table) -> pa.Table:
        lp = t["lp_micro"].to_numpy().astype(np.float64)
        n = t["n_tokens"].to_numpy().astype(np.float64)
        # IEEE division is correctly rounded: identical ints -> identical
        # double -> identical floor on both sides
        mean = np.floor(lp / n).astype(np.int64)
        return t.append_column("lp_mean_micro", pa.array(mean, pa.int64()))

    return per_doc.map_batches(mean_col, batch_format="pyarrow")


SQL_UNIGRAM_LOGPROB = f"""
WITH {_TOKS_CTE},
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks_ne GROUP BY doc_id, term),
unigram AS (SELECT term, SUM(tf) AS tf_global FROM tf GROUP BY term),
tot AS (SELECT CAST(SUM(tf_global) AS BIGINT) AS total FROM unigram),
contrib AS (
    SELECT t.doc_id, t.tf,
           CAST(floor(t.tf * ln(u.tf_global * 1.0 / c.total) * 1000000)
                AS BIGINT) AS lp_micro
    FROM tf t JOIN unigram u USING (term) CROSS JOIN tot c
)
SELECT doc_id,
       CAST(SUM(tf) AS BIGINT) AS n_tokens,
       CAST(SUM(lp_micro) AS BIGINT) AS lp_micro,
       CAST(floor(SUM(lp_micro) * 1.0 / SUM(tf)) AS BIGINT) AS lp_mean_micro
FROM contrib GROUP BY doc_id
"""


# ---- TF-IDF keyword extraction: top-k most distinctive terms per doc.
#      Ranking is fully integer (floored micro-score, term-asc ties) so
#      the Ray and SQL row sets cannot diverge on float noise; the
#      per-doc top-k is one vectorized call per (doc_id % P) partition,
#      not one Python call per doc. ----

_KW_K = 3


def doc_keywords(sf_dir: str, k: int = _KW_K):
    """(doc_id, term, tf, tfidf_micro, rank): each doc's top-k terms by
    tf * ln(N/df) in integer micro-units. df and N travel as datasets /
    one scalar; the join is term-keyed; the grouped top-k runs
    vectorized per hash partition."""
    from .dedup import _keyed_count_combine, _npart as _dnp, _reduce_keyed

    tf_rows = _doc_term_tf(sf_dir).materialize()  # feeds df, N, AND the join
    n_tf = tf_rows.count()
    if n_tf == 0:  # token-free corpus: no docs, no keywords
        return empty_dataset(
            pa.schema([("doc_id", pa.int64()), ("term", pa.string()),
                       ("tf", pa.int64()), ("tfidf_micro", pa.int64()),
                       ("rank", pa.int64())])
        )
    # df_tbl (one row per DISTINCT term) is the smaller join side and
    # sizes the join — small-vocab corpora would otherwise leave
    # df-less partitions and crash Ray 2.49's hash join. Both
    # reductions are partition-vectorized: term and doc groups are
    # near-unique, and distinct-doc COUNTING is just the row count of
    # the distinct-keys reduction (each key lands in one partition)
    df_tbl = _reduce_keyed(
        tf_rows, "term", _dnp() * 8, _keyed_count_combine("term", "df")
    ).materialize()
    n_docs = _reduce_keyed(
        tf_rows, "doc_id", _dnp() * 8, _keyed_count_combine("doc_id")
    ).count()
    n_part = _join_npart() * 4

    def _score_from(t: pa.Table, df: np.ndarray) -> pa.Table:
        tf = t["tf"].to_numpy().astype(np.float64)
        micro = np.floor(tf * np.log(n_docs * 1.0 / df) * 1e6).astype(np.int64)
        ids = t["doc_id"].to_numpy()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "term": t["term"],
                "tf": t["tf"],
                "tfidf_micro": pa.array(micro, pa.int64()),
                "part": pa.array((ids % n_part).astype(np.int32), pa.int32()),
            }
        )

    def score(t: pa.Table) -> pa.Table:
        return _score_from(t, t["df"].to_numpy().astype(np.float64))

    def topk_part(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy()
        terms = g["term"].to_numpy(zero_copy_only=False)
        micro = g["tfidf_micro"].to_numpy()
        order = np.lexsort((terms, -micro, ids))
        ids, terms, micro = ids[order], terms[order], micro[order]
        tf = g["tf"].to_numpy()[order]
        first = np.concatenate([[0], np.flatnonzero(ids[1:] != ids[:-1]) + 1])
        starts = np.zeros(len(ids), bool)
        starts[first] = True
        group_of = np.cumsum(starts) - 1
        rank = np.arange(len(ids)) - first[group_of] + 1
        keep = rank <= k
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "term": pa.array(terms[keep], pa.string()),
                "tf": pa.array(tf[keep], pa.int64()),
                "tfidf_micro": pa.array(micro[keep], pa.int64()),
                "rank": pa.array(rank[keep], pa.int64()),
            }
        )

    ref = _vocab_ref(df_tbl, "term", "df")
    if ref is not None:

        def score_bcast(t: pa.Table, _ref=ref) -> pa.Table:
            return _score_from(
                t, _vocab_probe(t["term"], ray.get(_ref)).astype(np.float64)
            )

        scored = tf_rows.map_batches(score_bcast, batch_format="pyarrow")
    else:
        scored = tf_rows.join(
            df_tbl, join_type="inner",
            num_partitions=join_np(df_tbl.count(), _join_npart()), on=("term",),
        ).map_batches(score, batch_format="pyarrow")

    return scored.groupby("part").map_groups(topk_part, batch_format="pyarrow")


SQL_DOC_KEYWORDS = f"""
WITH {_TOKS_CTE},
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks_ne GROUP BY doc_id, term),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM tf),
scored AS (
    SELECT t.doc_id, t.term, t.tf,
           CAST(floor(t.tf * ln(nd.n * 1.0 / df.df) * 1000000) AS BIGINT) AS tfidf_micro
    FROM tf t JOIN df USING (term) CROSS JOIN nd
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY doc_id
                                 ORDER BY tfidf_micro DESC, term ASC) AS rn
    FROM scored
)
SELECT doc_id, term, tf, tfidf_micro, CAST(rn AS BIGINT) AS rank
FROM ranked WHERE rn <= {_KW_K}
"""


# ---- PMI collocations: the corpus's top-k adjacent-token pairs by
#      pointwise mutual information — the classic phrase-mining /
#      tokenizer-merge-candidate op. Bigram and unigram counts are
#      per-batch-combined before their groupbys; the score join is
#      term-keyed twice (w1 then w2); only the final k rows reach the
#      driver. The score is floored to integer micro-nats computed from
#      identical integer counts on both sides. ----

_PMI_MIN = 5   # minimum bigram count (kills noise + bounds output)
_PMI_K = 50


def _bigram_partial(t: pa.Table, value_set: pa.Array | None = None) -> pa.Table:
    """Per-batch adjacent-bigram counts (tokens stay variable-width
    Arrow end-to-end — a numpy np.char formulation widened EVERY
    bigram slot to the batch's longest token). ``value_set``: keep
    only bigrams whose w1 is in the set (suggest_next's probe filter,
    applied BEFORE the combine so only probe rows ever shuffle).
    Shared by ``pmi_collocations`` and ``suggest_next``."""
    cfg = IndexConfig(stemming=False)
    doc_idx, tok, _pos, _lens, _dl = split_tokens_arrow(
        t["text"].combine_chunks(), cfg
    )
    empty = pa.table({"w1": pa.array([], pa.string()),
                      "w2": pa.array([], pa.string()),
                      "c": pa.array([], pa.int64())})
    if len(tok) < 2:
        return empty
    adj = pa.array(doc_idx[:-1] == doc_idx[1:])
    pairs = pa.table(
        {"w1": tok.slice(0, len(tok) - 1).filter(adj),
         "w2": tok.slice(1).filter(adj)}
    )
    if value_set is not None:
        pairs = pairs.filter(pc.is_in(pairs["w1"], value_set=value_set))
    if pairs.num_rows == 0:
        return empty
    g = pairs.group_by(["w1", "w2"]).aggregate([([], "count_all")])
    return pa.table(
        {
            "w1": g["w1"],
            "w2": g["w2"],
            "c": g["count_all"].cast(pa.int64()),
        }
    )


_SN_PROBES = ["data", "group", "hash", "merge", "sort"]
_SN_K = 5


def suggest_next(sf_dir: str):
    """Next-word suggestions: for each probe word, the top-5 words
    that FOLLOW it (bigram count desc, word asc) — the
    type-ahead-continuation analog of ``suggest_prefix`` (that one
    completes the CURRENT token; this one proposes the next).

    Scale shape: the probe filter applies INSIDE the per-batch
    partial, so only the probe words' bigram rows ever shuffle —
    O(probes x following-vocab) wire volume at any corpus size; the
    final reduce is the shared hash(w1)-partitioned run-sum."""
    probes = pa.array(_SN_PROBES, pa.string())

    def partial(t: pa.Table) -> pa.Table:
        return _bigram_partial(t, value_set=probes)

    from .dedup import _npart as _dnp, _reduce_keyed

    docs = _docs(sf_dir, ["text"])
    bcnt = _reduce_keyed(
        docs.map_batches(partial, batch_format="pyarrow"),
        "w1", _dnp() * 8, _sum_bigrams,
    )
    df = bcnt.to_pandas()  # O(probes x following-vocab) by construction
    if not len(df) or "w1" not in df.columns:
        # no probe word adjacent to anything: an all-empty map_groups
        # output loses its schema in Ray 2.49 (same guard as
        # empty_dataset().union() elsewhere) — return the typed empty
        return pa.table(
            {"w1": pa.array([], pa.string()),
             "w2": pa.array([], pa.string()),
             "c": pa.array([], pa.int64())}
        )
    out_w1, out_w2, out_c = [], [], []
    for w in _SN_PROBES:
        g = df[df["w1"] == w]
        if not len(g):
            continue
        g = g.sort_values(["c", "w2"], ascending=[False, True]).head(_SN_K)
        out_w1.extend([w] * len(g))
        out_w2.extend(g["w2"].tolist())
        out_c.extend(int(x) for x in g["c"])
    return pa.table(
        {
            "w1": pa.array(out_w1, pa.string()),
            "w2": pa.array(out_w2, pa.string()),
            "c": pa.array(out_c, pa.int64()),
        }
    )


SQL_SUGGEST_NEXT = f"""
WITH arrs AS (
    SELECT list_filter(regexp_split_to_array(lower(substr(text, 1, 10000)), '[^0-9a-z]+'),
                       x -> x <> '') AS arr
    FROM documents
),
big AS (
    SELECT arr[i] AS w1, arr[i + 1] AS w2
    FROM arrs, UNNEST(range(1, len(arr))) t(i)
    WHERE len(arr) >= 2
),
bcnt AS (
    SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
    FROM big
    WHERE w1 IN ({", ".join(f"'{w}'" for w in _SN_PROBES)})
    GROUP BY w1, w2
),
ranked AS (
    SELECT w1, w2, c,
           row_number() OVER (PARTITION BY w1 ORDER BY c DESC, w2 ASC) AS rn
    FROM bcnt
)
SELECT w1, w2, c FROM ranked WHERE rn <= {_SN_K}
"""


def _sum_bigrams(g: pa.Table) -> pa.Table:
    """One hash(w1) partition of per-batch bigram partials: all rows
    of a (w1, w2) pair share w1, so they are co-located — Arrow
    two-key sort + run-summed counts, one call per partition (the
    bigram groups are near-unique: groupby([w1, w2]) would pay Ray's
    per-group Python cost once per distinct bigram). Shared by
    ``pmi_collocations`` and ``suggest_next``."""
    idx = pc.sort_indices(
        g.select(["w1", "w2"]),
        sort_keys=[("w1", "ascending"), ("w2", "ascending")],
    )
    w1 = g["w1"].combine_chunks().take(idx)
    w2 = g["w2"].combine_chunks().take(idx)
    c = g["c"].to_numpy(zero_copy_only=False).astype(np.int64)[idx.to_numpy()]
    tail = max(len(w1) - 1, 0)
    neq = pc.or_(
        pc.not_equal(w1.slice(1), w1.slice(0, tail)),
        pc.not_equal(w2.slice(1), w2.slice(0, tail)),
    ).to_numpy(zero_copy_only=False).astype(bool)
    starts = np.flatnonzero(np.concatenate([[True], neq]))
    si = pa.array(starts, pa.int64())
    return pa.table(
        {
            "w1": w1.take(si),
            "w2": w2.take(si),
            "c": pa.array(np.add.reduceat(c, starts), pa.int64()),
        }
    )


def pmi_collocations(sf_dir: str, k: int = _PMI_K):
    """(w1, w2, n_pairs, pmi_micro): global top-k adjacent bigrams by
    PMI = ln(p(xy) / (p(x)p(y))), counts >= {_PMI_MIN}. Total order
    (pmi desc, w1, w2) makes the LIMIT boundary deterministic."""

    from .dedup import _keyed_count_combine, _npart as _dnp, _reduce_keyed

    docs = _docs(sf_dir, ["text"])
    bcnt = (
        _reduce_keyed(
            docs.map_batches(_bigram_partial, batch_format="pyarrow"),
            "w1", _dnp() * 8, _sum_bigrams,
        )
        .map_batches(
            lambda t: t.filter(pc.greater_equal(t["c"], pa.scalar(_PMI_MIN))),
            batch_format="pyarrow",
        )
        .materialize()  # feeds B AND the score joins
    )

    tf_rows = _doc_term_tf(sf_dir).materialize()  # feeds ucnt AND n_docs
    ucnt = _reduce_keyed(
        tf_rows, "term", _dnp() * 8,
        _keyed_count_combine("term", sums=(("tf", "uc"),)),
    ).materialize()  # consumed twice (w1 and w2 joins) AND for T
    T = int(ucnt.sum(on="uc") or 0)
    _empty = pa.schema(
        [("w1", pa.string()), ("w2", pa.string()),
         ("n_pairs", pa.int64()), ("pmi_micro", pa.int64())]
    ).empty_table()
    if T == 0:
        return ray.data.from_arrow(_empty)
    n_bcnt = bcnt.count()
    if n_bcnt == 0:  # every bigram below the min-count floor
        return ray.data.from_arrow(_empty)
    # B counts ALL bigrams, not just the >= _PMI_MIN survivors: per-doc
    # bigram count is doclen-1, so B = T - n_nonempty_docs. tf_rows
    # uses the identical token definition (split_tokens, stemming
    # off, no skip filter), so its distinct doc_id count IS the
    # nonempty-doc count — no third read-and-tokenize pass.
    n_docs = int(
        _reduce_keyed(
            tf_rows, "doc_id", _dnp() * 8, _keyed_count_combine("doc_id")
        ).count()
    )
    B = T - n_docs
    if B <= 0:  # no adjacent pairs anywhere (all docs are 1 token)
        return ray.data.from_arrow(_empty)

    def _score_from(t: pa.Table, c1: np.ndarray, c2: np.ndarray) -> pa.Table:
        c = t["c"].to_numpy().astype(np.float64)
        pmi = np.floor(np.log((c * 1.0 * T * T) / (B * 1.0 * c1 * c2)) * 1e6).astype(np.int64)
        return pa.table(
            {
                "w1": t["w1"],
                "w2": t["w2"],
                "n_pairs": t["c"],
                "pmi_micro": pa.array(pmi, pa.int64()),
            }
        )

    # both bigram endpoints probe the SAME unigram vocabulary — one
    # broadcast replaces two term-keyed shuffle joins
    ref = _vocab_ref(ucnt, "term", "uc")
    if ref is not None:

        def score_bcast(t: pa.Table, _ref=ref) -> pa.Table:
            payload = ray.get(_ref)
            return _score_from(
                t,
                _vocab_probe(t["w1"], payload).astype(np.float64),
                _vocab_probe(t["w2"], payload).astype(np.float64),
            )

        scored = bcnt.map_batches(score_bcast, batch_format="pyarrow")
    else:
        u1 = ucnt.map_batches(
            lambda t: pa.table({"w1_": t["term"], "c1": t["uc"]}),
            batch_format="pyarrow",
        )
        u2 = ucnt.map_batches(
            lambda t: pa.table({"w2_": t["term"], "c2": t["uc"]}),
            batch_format="pyarrow",
        )
        # the unigram vocabulary can be the smaller side (few distinct
        # words, many surviving bigrams) — size the join by the min
        np_ = join_np(min(n_bcnt, ucnt.count()), _join_npart())
        joined = bcnt.join(
            u1, join_type="inner", num_partitions=np_, on=("w1",), right_on=("w1_",)
        ).join(
            u2, join_type="inner", num_partitions=np_, on=("w2",), right_on=("w2_",)
        )

        def score(t: pa.Table) -> pa.Table:
            return _score_from(
                t,
                t["c1"].to_numpy().astype(np.float64),
                t["c2"].to_numpy().astype(np.float64),
            )

        scored = joined.map_batches(score, batch_format="pyarrow")

    return (
        scored.sort(["pmi_micro", "w1", "w2"], descending=[True, False, False])
        .limit(k)
    )


SQL_PMI_COLLOCATIONS = f"""
WITH arrs AS (
    SELECT list_filter(regexp_split_to_array(lower(substr(text, 1, 10000)), '[^0-9a-z]+'),
                       x -> x <> '') AS arr
    FROM documents
),
uni AS (SELECT unnest(arr) AS w FROM arrs),
ucnt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM uni GROUP BY w),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS T FROM uni),
big AS (
    SELECT arr[i] AS w1, arr[i + 1] AS w2
    FROM arrs, UNNEST(range(1, len(arr))) t(i)
    WHERE len(arr) >= 2
),
bcnt AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
         FROM big GROUP BY w1, w2 HAVING COUNT(*) >= {_PMI_MIN}),
btot AS (SELECT CAST(COUNT(*) AS BIGINT) AS B FROM big)
SELECT b.w1, b.w2, b.c AS n_pairs,
       CAST(floor(ln((b.c * 1.0 * t.T * t.T) / (bt.B * 1.0 * u1.c * u2.c))
                  * 1000000) AS BIGINT) AS pmi_micro
FROM bcnt b
JOIN ucnt u1 ON b.w1 = u1.w
JOIN ucnt u2 ON b.w2 = u2.w
CROSS JOIN tot t CROSS JOIN btot bt
ORDER BY pmi_micro DESC, b.w1, b.w2
LIMIT {_PMI_K}
"""


# ---- English filter (the reference rejects non-English docs by
#      country/language-code URL tokens, `/root/reference/src/cis5550/
#      tools/EnglishFilter.java:97-105`; the transcript analog filters
#      on the document's language label) ----

def english_filter(sf_dir: str):
    """Three variants, kind-tagged in one result:

    - ``label``: keep rows whose ``lang`` column says 'en' — the
      metadata path (the transcript analog of a crawl-time language
      tag).
    - ``token``: keep rows the token heuristic predicts English
      (stopword ratio >= 0.05 over the analyzed token stream) — the
      content path (same mechanism as the reference's membership test,
      inverted polarity: accept-by-stopwords).
    - ``url``: the reference's EXACT mechanism
      (`/root/reference/src/cis5550/tools/EnglishFilter.java:97-112`:
      split the URL on non-alphanumerics, REJECT when any component is
      a non-English language/country code) applied to the doc's
      deterministically derived URL ``<source>.<lang>.example.org/doc/<id>``
      — the documents table's analog of the crawl URL, with the lang
      tag in the hostname like ``sv.wikipedia.org``.
    """
    import pyarrow.compute as pc

    cfg = IndexConfig(stemming=False)
    stop_arr = np.array(sorted(STOPWORDS), dtype=object)
    codes_arr = np.array(sorted(NON_ENGLISH_CODES), dtype=object)

    def by_label(t: pa.Table) -> pa.Table:
        kept = t.filter(pc.equal(t["lang"], pa.scalar("en")))["doc_id"]
        return pa.table(
            {"variant": pa.array(["label"] * len(kept), pa.string()), "doc_id": kept}
        )

    def by_token(t: pa.Table) -> pa.Table:
        doc_idx, tok, _pos, _lens, doclens = split_tokens(t["text"].combine_chunks(), cfg)
        is_stop = np.isin(tok, stop_arr)
        n_stop = np.bincount(doc_idx[is_stop], minlength=t.num_rows).astype(np.int64)
        keep = n_stop / np.maximum(doclens, 1) >= 0.05
        kept = t.filter(pa.array(keep))["doc_id"]
        return pa.table(
            {"variant": pa.array(["token"] * len(kept), pa.string()), "doc_id": kept}
        )

    def by_url(t: pa.Table) -> pa.Table:
        # derived URL -> split on non-alnum -> reject on code membership
        # (vectorized: list-flatten + isin + segmented any)
        # null==empty convention (same as every other op here): a null
        # source/lang must not null-propagate into the join and KEEP the
        # row while the SQL twin's `source || ...` nulls out and DROPS it
        url = pc.binary_join_element_wise(
            pc.fill_null(t["source"].combine_chunks().cast(pa.string()), ""),
            pc.fill_null(t["lang"].combine_chunks().cast(pa.string()), ""),
            pa.array(["example.org/doc"] * t.num_rows, pa.string()),
            pc.cast(t["doc_id"].combine_chunks(), pa.string()),
            ".",
        )
        # all-dot joining yields the same non-alnum-split token multiset
        # as the real mixed-separator URL, so membership is identical
        parts = pc.split_pattern_regex(url, "[^0-9a-zA-Z]+")
        offs = parts.offsets.to_numpy(zero_copy_only=False)
        flat = parts.flatten().to_numpy(zero_copy_only=False)
        bad = np.isin(flat, codes_arr)
        # segmented sum via repeat+bincount (same pattern as by_token):
        # reduceat's clipped-index form drops the prior row's last token
        # when the trailing list is empty
        row_idx = np.repeat(np.arange(t.num_rows), np.diff(offs))
        n_bad = np.bincount(row_idx[bad], minlength=t.num_rows).astype(np.int64)
        kept = t.filter(pa.array(n_bad == 0))["doc_id"]
        return pa.table(
            {"variant": pa.array(["url"] * len(kept), pa.string()), "doc_id": kept}
        )

    def all_variants(t: pa.Table) -> pa.Table:
        # ONE scan/decode of the documents table feeding all three
        # variant kernels (three separate read_parquet pipelines would
        # triple the read cost at corpus scale)
        return pa.concat_tables([by_label(t), by_token(t), by_url(t)])

    cols = ["doc_id", "lang", "text", "source"]
    return _docs(sf_dir, cols).map_batches(all_variants, batch_format="pyarrow")


SQL_ENGLISH_FILTER = f"""
SELECT 'label' AS variant, doc_id FROM documents WHERE lang = 'en'
UNION ALL
SELECT 'token' AS variant, doc_id FROM (
    WITH {_TOKS_CTE},
    per_doc AS (
        SELECT d.doc_id,
               COALESCE(SUM(CASE WHEN t.term IN ({_STOP_SQL}) THEN 1 ELSE 0 END), 0) AS n_stop,
               COUNT(t.term) AS n_tok
        FROM documents d LEFT JOIN toks_ne t ON d.doc_id = t.doc_id
        GROUP BY d.doc_id
    )
    SELECT doc_id FROM per_doc WHERE n_stop * 1.0 / greatest(n_tok, 1) >= 0.05
)
UNION ALL
SELECT 'url' AS variant, doc_id FROM documents
WHERE NOT list_has_any(
    regexp_split_to_array(
        coalesce(source, '') || '.' || coalesce(lang, '') || '.' || 'example.org/doc' || '.' || CAST(doc_id AS VARCHAR),
        '[^0-9a-zA-Z]+'
    ),
    [{_CODES_SQL}]
)
"""


# ---- per-doc text features in one pass (fingerprint + the two token
#      budgets) — consolidates the doc_fingerprint and token_count_bpe
#      gate entries into one; both computations run unchanged ----

def text_features(sf_dir: str):
    """Consolidated gate entry: one scan emitting the fingerprint and
    both token budgets, composing the SAME batch kernels the
    standalone ``fingerprint`` / ``token_count_bpe`` ops use."""

    def feats(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t["text"].combine_chunks(), "")
        fp = _fingerprint_batch(text, t.num_rows)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "fingerprint": pa.array(fp, pa.int64()),
                **_token_count_cols(text),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(feats, batch_format="pyarrow")


SQL_TEXT_FEATURES = f"""
SELECT f.doc_id, f.fingerprint, c.n_ws_tokens, c.n_bpe_tokens
FROM ({SQL_FINGERPRINT}) f JOIN ({SQL_TOKEN_COUNT_BPE}) c USING (doc_id)
"""


# ---- deterministic stratified sampling (reproducible train splits):
#      hash-based per-stratum rates — the split is a pure function of
#      doc_id, so reruns/resumes select identical rows on any cluster ----

_SAMPLE_RATES = {"en": 50}   # percent; other languages default below
_SAMPLE_DEFAULT = 10


def stratified_sample(sf_dir: str):
    import hashlib as _hl

    def pick(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        langs = t["lang"].to_numpy(zero_copy_only=False)
        h = np.fromiter(
            (int(_hl.md5(str(int(d)).encode()).hexdigest()[:15], 16) % 100 for d in ids),
            dtype=np.int64, count=len(ids),
        )
        rates = np.array(
            [_SAMPLE_RATES.get(l, _SAMPLE_DEFAULT) for l in langs], dtype=np.int64
        )
        keep = h < rates
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "lang": pa.array(langs[keep], pa.string()),
            }
        )

    return _docs(sf_dir, ["doc_id", "lang"]).map_batches(pick, batch_format="pyarrow")


SQL_STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang FROM documents
WHERE {_MD5_SQL.format("CAST(doc_id AS VARCHAR)")} % 100
      < CASE WHEN lang = 'en' THEN {_SAMPLE_RATES["en"]} ELSE {_SAMPLE_DEFAULT} END
"""


RAY_QUERIES = {
    "term_stats": term_stats,
    "doc_stats": doc_stats,
    "text_quality": text_quality,
    "lang_id": lang_id,
    "text_features": text_features,
    "stratified_sample": stratified_sample,
    "english_filter": english_filter,
    "repetition_stats": repetition_stats,
    "pack_sequences": pack_sequences,
    "unigram_logprob": unigram_logprob,
    "doc_keywords": doc_keywords,
    "pmi_collocations": pmi_collocations,
}

ORACLE_SQL = {
    "term_stats": SQL_TERM_STATS,
    "doc_stats": SQL_DOC_STATS,
    "text_quality": SQL_TEXT_QUALITY,
    "lang_id": SQL_LANG_ID,
    "text_features": SQL_TEXT_FEATURES,
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
    "english_filter": SQL_ENGLISH_FILTER,
    "repetition_stats": SQL_REPETITION_STATS,
    "pack_sequences": SQL_PACK_SEQUENCES,
    "unigram_logprob": SQL_UNIGRAM_LOGPROB,
    "doc_keywords": SQL_DOC_KEYWORDS,
    "pmi_collocations": SQL_PMI_COLLOCATIONS,
}

# auxiliary entries (after the 50-entry driver window)
RAY_QUERIES_AUX = {
    "suggest_prefix": suggest_prefix,
    "suggest_next": suggest_next,
}

ORACLE_SQL_AUX = {
    "suggest_prefix": SQL_SUGGEST_PREFIX,
    "suggest_next": SQL_SUGGEST_NEXT,
}

