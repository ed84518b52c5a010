"""Text analysis: tokenization and query analysis.

Normative semantics (SURVEY.md §7.0), mirroring the reference's
``split_page_locs`` (`/root/reference/src/cis5550/jobs/Indexer.java:129-169`):

- truncate text to ``max_text_len`` chars (Indexer.java:135), lowercase,
  split on runs of non-alphanumerics (``[^0-9a-z]+`` after lowering —
  Java's ``\\P{Alnum}`` is the ASCII POSIX class);
- positions are a 1-based counter over ALL non-empty tokens of the doc
  (Indexer.java:146-160) — the skip-list / length filters do NOT affect
  positions;
- ``doclen`` = total count of non-empty tokens (= max position);
- tokens longer than ``max_word_len`` (20) and the 12-word skip list are
  not indexed (Indexer.java:249);
- every surviving token is indexed raw AND Porter-stemmed
  (Indexer.java:256-283); when the stem equals the raw token only one
  posting is emitted (the reference's second KVS put overwrites the
  first with identical content).

The batch path is vectorized: pyarrow.compute for lower/slice/split,
numpy for the position arithmetic; the only per-string Python work is
stemming the (small, memoized) set of unique tokens per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import IndexConfig, SKIP_WORDS, STOPWORDS
from .stemmer import CachingStemmer

_SPLIT_PATTERN = "[^0-9a-z]+"


def strip_html(text: str) -> str:
    """Tag stripping with the reference's ``extract_html`` semantics
    (`/root/reference/src/cis5550/jobs/Indexer.java:71-105`): a
    bracket-depth counter (clamped at zero) drops everything inside
    ``<...>`` regions — including nested brackets — while a ``>`` seen
    at depth zero stays ordinary text; a tag always acts as a word
    boundary (the reference flushes the current word at every ``<``),
    which blanking tags to spaces preserves through the tokenizer.

    Vectorized: depth is cumsum-with-floor
    (``prefix - running_min(min(prefix, 0))``), no per-char Python."""
    if "<" not in text:
        return text
    arr = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    is_open = arr == ord("<")
    is_close = arr == ord(">")
    prefix = np.cumsum(is_open.astype(np.int64) - is_close.astype(np.int64))
    depth_after = prefix - np.minimum.accumulate(np.minimum(prefix, 0))
    depth_before = np.empty_like(depth_after)
    depth_before[0] = 0
    depth_before[1:] = depth_after[:-1]
    keep = (depth_before == 0) & ~is_open & ~(is_close & (depth_before > 0))
    out = np.where(keep, arr, np.uint32(ord(" ")))
    return out.tobytes().decode("utf-32-le")


def strip_html_array(texts: pa.Array) -> pa.Array:
    """Batch wrapper: skipped entirely for chunks without any '<'."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    has_tag = pc.match_substring(pc.fill_null(texts, ""), "<")
    if not pc.any(has_tag).as_py():
        return texts
    vals = texts.to_pylist()
    return pa.array(
        [None if v is None else strip_html(v) for v in vals], pa.string()
    )


class TokenizedBatch:
    """Exploded token arrays for one batch of documents.

    Attributes (all aligned on the token axis unless noted):
      doc_idx:    int64 — local row index of the owning document
      term_code:  int64 — index into ``dictionary`` (the indexable term)
      dictionary: object ndarray of str — unique terms of this batch
      positions:  int32 — 1-based position in the doc (stem rows share
                  the raw token's position)
      doclens:    int32, one per input row — non-empty token count

    ``terms`` (materialized strings) is provided for tests/debugging;
    the hot path uses codes only.
    """

    __slots__ = ("doc_idx", "term_code", "dictionary", "positions", "doclens")

    def __init__(self, doc_idx, term_code, dictionary, positions, doclens):
        self.doc_idx = doc_idx
        self.term_code = term_code
        self.dictionary = dictionary
        self.positions = positions
        self.doclens = doclens

    @property
    def terms(self) -> np.ndarray:
        return self.dictionary[self.term_code]


def split_tokens_arrow(texts: pa.Array, cfg: IndexConfig):
    """Vectorized lowercase/truncate/split; token column stays Arrow.

    Returns ``(doc_idx, flat_tokens: pa.StringArray, positions, lens,
    doclens)`` for all non-empty tokens (pre skip/length filtering, so
    positions and doclens match the reference's global counter
    semantics)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if len(texts) == 0:
        # 0-row blocks happen (empty part files, post-filter blocks);
        # the starts/doclens broadcast below would raise on them
        return (
            np.empty(0, np.int64),
            pa.array([], pa.string()),
            np.empty(0, np.int32),
            np.empty(0, np.int64),
            np.empty(0, np.int32),
        )
    texts = pc.fill_null(texts, "")
    clipped = pc.utf8_slice_codeunits(texts, 0, cfg.max_text_len)
    if cfg.strip_html:
        # truncate-then-strip, the reference's order
        # (split_page_locs, Indexer.java:133-138)
        clipped = strip_html_array(clipped)
    lowered = pc.utf8_lower(clipped)
    token_lists = pc.split_pattern_regex(lowered, _SPLIT_PATTERN)

    flat = token_lists.flatten()
    parents = pc.list_parent_indices(token_lists).to_numpy(zero_copy_only=False)

    # drop empty tokens (split artifacts at string boundaries)
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    nonempty = lens > 0
    parents = parents[nonempty]
    flat = flat.filter(pa.array(nonempty))
    lens = lens[nonempty]

    # 1-based position within each doc over the non-empty tokens.
    # parents is non-decreasing (list flatten order).
    n_docs = len(texts)
    doclens = np.bincount(parents, minlength=n_docs).astype(np.int32)
    starts = np.concatenate([[0], np.cumsum(doclens[:-1], dtype=np.int64)])
    positions = (np.arange(len(flat), dtype=np.int64) - np.repeat(starts, doclens) + 1).astype(
        np.int32
    )
    return parents.astype(np.int64), flat, positions, lens, doclens


def count_tokens_arrow(texts: pa.Array, cfg: IndexConfig) -> np.ndarray:
    """doclen-only twin of ``split_tokens_arrow``: counts maximal
    ``[0-9a-z]+`` runs after the identical fill/truncate/strip/lower
    chain — one C regex pass, no token materialization. The docs stage
    needs ONLY doclen; at 24M turns the full split (plus numpy-object
    conversion) made stage A cost as much as the entire posting wave.
    Equality with split_tokens_arrow's doclens is property-tested."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if len(texts) == 0:
        return np.empty(0, np.int32)
    texts = pc.fill_null(texts, "")
    clipped = pc.utf8_slice_codeunits(texts, 0, cfg.max_text_len)
    if cfg.strip_html:
        clipped = strip_html_array(clipped)
    lowered = pc.utf8_lower(clipped)
    return (
        pc.count_substring_regex(lowered, "[0-9a-z]+")
        .to_numpy(zero_copy_only=False)
        .astype(np.int32)
    )


def split_tokens(texts: pa.Array, cfg: IndexConfig):
    """Like ``split_tokens_arrow`` but with tokens as a numpy object
    array (for consumers doing python-level set ops on tokens)."""
    parents, flat, positions, lens, doclens = split_tokens_arrow(texts, cfg)
    return parents, flat.to_numpy(zero_copy_only=False), positions, lens, doclens


def tokenize_batch(
    texts: pa.Array, cfg: IndexConfig, stemmer: CachingStemmer | None = None
) -> TokenizedBatch:
    """Full index-time tokenization of a batch of document texts.

    Unique-token work (hashing, stemming) runs on the batch's small
    dictionary via Arrow ``dictionary_encode`` (C hashing) — never a
    numpy object-string sort over the full token axis."""
    doc_idx, flat, positions, lens, doclens = split_tokens_arrow(texts, cfg)

    # posting filters: length cap + skip list (positions unaffected)
    keep = lens <= cfg.max_word_len
    if SKIP_WORDS:
        keep &= ~pc.is_in(flat, value_set=_SKIP_PA).to_numpy(zero_copy_only=False)
    doc_idx = doc_idx[keep]
    flat = flat.filter(pa.array(keep))
    positions = positions[keep]

    dict_arr = flat.dictionary_encode()
    codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = dict_arr.dictionary.to_numpy(zero_copy_only=False)  # small

    if not cfg.stemming:
        return TokenizedBatch(doc_idx, codes, uniq, positions, doclens)

    stemmer = stemmer or CachingStemmer()
    stems = np.array(stemmer.stem_many(list(uniq)), dtype=object)
    differs_u = stems != uniq
    # combined term space: raw dictionary + the differing stems
    combined = np.concatenate([uniq, stems[differs_u]])
    dictionary, comb_code = np.unique(combined, return_inverse=True)  # small
    raw_code = comb_code[: len(uniq)]
    stem_code = np.full(len(uniq), -1, dtype=np.int64)
    stem_code[np.flatnonzero(differs_u)] = comb_code[len(uniq):]

    # emit raw rows for all tokens + stem rows only where stem != raw
    differs_tok = differs_u[codes]
    out_doc = np.concatenate([doc_idx, doc_idx[differs_tok]])
    out_code = np.concatenate([raw_code[codes], stem_code[codes[differs_tok]]])
    out_pos = np.concatenate([positions, positions[differs_tok]])
    return TokenizedBatch(out_doc, out_code, dictionary, out_pos, doclens)


_SKIP_PA = pa.array(sorted(SKIP_WORDS), pa.string())


def analyze_phrase(phrase: str, cfg: IndexConfig | None = None) -> list[str]:
    """Phrase analyzer: the index-time token stream of the phrase IN
    ORDER — raw tokens, no stemming, stopwords kept (an exact phrase is
    literal), index-side filters applied (a skip-listed or >20-char
    token cannot be position-verified because it is not indexed)."""
    cfg = cfg or IndexConfig()
    import re

    raw = [t for t in re.split(_SPLIT_PATTERN, phrase.lower()) if t]
    if any(len(t) > cfg.max_word_len or t in SKIP_WORDS for t in raw):
        return []  # contains an unindexed token -> cannot be verified
    return raw


def analyze_query(query: str, cfg: IndexConfig | None = None) -> tuple[list[str], bool]:
    """Query-side analyzer (``split_stem``, Search.java:59-74 + stopword
    logic Search.java:209-214).

    Lowercase, split on non-alphanumerics, drop empties, Porter-stem
    each term, then remove stopwords (stopword membership tested on the
    RAW token, pre-stem, as the reference checks words before indexing
    lookups). If every term is a stopword the stopwords are kept
    (reference re-enables them with a score penalty).

    Returns ``(terms, stopword_only)``. Terms preserve query order with
    duplicates removed (first occurrence wins).
    """
    cfg = cfg or IndexConfig()
    import re

    raw = [t for t in re.split(_SPLIT_PATTERN, query.lower()) if t]
    raw = [t for t in raw if len(t) <= cfg.max_word_len and t not in SKIP_WORDS]
    kept = [t for t in raw if t not in STOPWORDS]
    stopword_only = not kept and bool(raw)
    use = raw if stopword_only else kept
    stemmer = CachingStemmer()
    seen: dict[str, None] = {}
    for t in use:
        s = stemmer.stem(t) if (cfg.stemming) else t
        if s not in seen:
            seen[s] = None
    return list(seen.keys()), stopword_only
