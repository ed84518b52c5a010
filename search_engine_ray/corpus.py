"""Deterministic synthetic transcript corpus + reference query set.

Implements the FIXTURES.md §1/§2 schemas (the ``input_hint`` shape:
conv_id, turn_idx, role, text, tool, ts) with seed=42. Two producers:

- ``make_transcripts(n_convs, turns_per_conv, seed)`` — seeded Zipf
  token soup with stemming-sensitive forms, mixed case, punctuation,
  skip-list tokens, >20-char tokens, empty strings, and a few
  >10,000-char turns (exercises truncation).
- ``transcripts_from_documents(sf_dir)`` — derives a transcript table
  deterministically from the driver's ``documents.parquet`` so that
  DuckDB oracle SQL (which can only see the pre-registered views) can
  reconstruct the identical table: conv_id = 'conv-' || doc_id // 5
  (zero-padded to 8), turn_idx = doc_id % 5, role cycling
  user/assistant/tool, tool '' unless role='tool'.

Everything is pure/deterministic — no wall-clock, no RNG without seed.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

_ROLES = np.array(["user", "assistant", "tool"], dtype=object)
_TOOLS = np.array(["search", "exec", "browse"], dtype=object)

# ~80-word vocabulary skeleton; expanded with numbered filler words to ~5k.
_BASE_VOCAB = [
    # stemming-sensitive families (Porter test vectors, FIXTURES.md §4)
    "running", "runs", "ran", "run", "caresses", "caress", "ponies", "poni",
    "ties", "cats", "cat", "feed", "agreed", "disabled", "matting", "mating",
    "meeting", "meetings", "milling", "messing", "relational", "conditional",
    "rational", "valenci", "hesitanci", "digitizer", "conformabli", "radicalli",
    "differentli", "vileli", "analogousli", "vietnamization", "predication",
    "operator", "feudalism", "decisiveness", "hopefulness", "callousness",
    "formaliti", "sensitiviti", "sensibiliti", "triplicate", "formative",
    "formalize", "electriciti", "electrical", "hopeful", "goodness",
    # common English incl. stopwords (query-side behavior)
    "the", "of", "and", "a", "to", "in", "is", "you", "that", "it", "he",
    "was", "for", "on", "are", "with", "as", "his", "they", "at", "be",
    "this", "have", "from", "or", "one", "had", "by", "word", "but", "not",
    "what", "all", "were", "we", "when", "your", "can", "said", "there",
    # skip-list tokens (indexed never, positions still counted)
    "http", "https", "com", "www", "org",
    # mixed case / digits / punctuation-joined / oversized
    "Search", "ENGINE", "Ray", "Data", "arrow", "parquet", "bm25", "tf1",
    "x42", "2026", "a-b", "foo.bar", "e.g", "don't",
    "supercalifragilisticexpialidocious", "antidisestablishmentarianism",
]


def _vocab(size: int = 5000) -> np.ndarray:
    extra = [f"w{i:04d}" for i in range(size - len(_BASE_VOCAB))]
    return np.array(_BASE_VOCAB + extra, dtype=object)


def make_transcripts(
    n_convs: int = 200,
    turns_per_conv: int = 5,
    seed: int = 42,
    vocab_size: int = 5000,
    mean_tokens: int = 30,
    long_turn_every: int = 997,
    empty_turn_every: int = 499,
    conv_offset: int = 0,
) -> pa.Table:
    """Seeded transcript table in the input_hint schema, sorted by
    (conv_id, turn_idx). ``conv_offset`` shifts the conversation ids
    (and timestamps) so independently generated chunks concatenate into
    one key-ordered corpus — the chunked/parallel generation path of
    ``write_transcripts`` for corpora too big to build in one table."""
    rng = np.random.default_rng(seed)
    n = n_convs * turns_per_conv
    vocab = _vocab(vocab_size)

    conv_num = np.repeat(np.arange(n_convs) + conv_offset, turns_per_conv)
    turn_idx = np.tile(np.arange(turns_per_conv, dtype=np.int32), n_convs)
    conv_id = np.array([f"conv-{i:08d}" for i in conv_num], dtype=object)
    role = _ROLES[(conv_num + turn_idx) % 3]
    tool = np.where(role == "tool", _TOOLS[(conv_num * 7 + turn_idx) % 3], "")

    # Zipf-distributed token picks, vectorized: one flat sample array.
    n_tok = rng.poisson(mean_tokens, size=n).astype(np.int64)
    n_tok = np.maximum(n_tok, 1)
    n_tok[::empty_turn_every] = 0                      # some empty texts
    total = int(n_tok.sum())
    ranks = rng.zipf(1.3, size=total)
    ranks = np.minimum(ranks, vocab_size) - 1
    words = vocab[ranks]
    offs = np.concatenate([[0], np.cumsum(n_tok)])
    seps = np.array([" ", " ", " ", ", ", "  ", "\n", "! "], dtype=object)
    sep_pick = seps[rng.integers(0, len(seps), size=total)]
    # vectorized join: interleave word/separator into one flat array,
    # blank out each row's trailing separator, list-join with ""
    import pyarrow.compute as pc

    flat = np.empty(2 * total, dtype=object)
    flat[0::2] = words
    flat[1::2] = sep_pick
    trail = 2 * offs[1:] - 1
    flat[trail[trail >= 0]] = ""  # rows with 0 tokens contribute no slot
    la = pa.LargeListArray.from_arrays(
        pa.array(2 * offs, pa.int64()), pa.array(flat, pa.string())
    )
    joined = pc.binary_join(la, "").to_pylist()
    # a few >10,000-char turns to exercise truncation
    for i in range(0, n, long_turn_every):
        joined[i] = (joined[i] + " padzz") * (12_000 // max(1, len(joined[i]) + 6) + 1)

    text = np.array(joined, dtype=object)
    ts = (np.datetime64("2026-01-01T00:00:00", "us")
          + (np.arange(n) + conv_offset * turns_per_conv).astype("timedelta64[s]")
          * 60).astype("datetime64[us]")
    return pa.table(
        {
            "conv_id": pa.array(conv_id, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": pa.array(text, pa.string()),
            "tool": pa.array(tool, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )


def make_queries(n_queries: int = 50, seed: int = 43) -> pd.DataFrame:
    """Reference query set (FIXTURES.md §2)."""
    rng = np.random.default_rng(seed)
    fixed = [
        "the", "running", "meetings search", "the of and",          # stopword-only
        "Ray Data engine", "parquet arrow bm25", "zzzzunknownterm",
        "http com www", "caresses ponies ties", "word one had by",
        "supercalifragilisticexpialidocious", "don't a-b foo.bar",
    ]
    vocab = _vocab(5000)
    qs = list(fixed)
    while len(qs) < n_queries:
        k = int(rng.integers(1, 5))
        words = vocab[rng.integers(0, 300, size=k)]
        qs.append(" ".join(words))
    qs = qs[:n_queries]  # trim BEFORE deriving the aligned columns
    ks = np.full(len(qs), 200, dtype=np.int32)
    ks[::7] = 10
    return pd.DataFrame(
        {"query_id": np.arange(len(qs), dtype=np.int32), "query": qs, "k": ks}
    )


# one generation chunk: bounds single-process memory (a 2.4M-turn chunk
# peaks at a few GB of intermediate object arrays) and sets the unit of
# parallel generation for corpora beyond it
_CHUNK_CONVS = 240_000


def _write_chunk_files(table: pa.Table, out_dir: str, chunk: int, n_files: int) -> None:
    n = table.num_rows
    bounds = np.linspace(0, n, n_files + 1).astype(int)
    for i in range(n_files):
        part = table.slice(bounds[i], bounds[i + 1] - bounds[i])
        pq.write_table(part, os.path.join(out_dir, f"part-{chunk:03d}-{i:05d}.parquet"))


def write_transcripts(
    out_dir: str,
    n_convs: int,
    turns_per_conv: int = 10,
    seed: int = 42,
    n_files: int = 8,
    shuffle_files: bool = False,
) -> str:
    """Materialize a transcript corpus as a directory of parquet files
    (cached: skipped when the directory already exists with a _DONE
    marker). ``shuffle_files`` writes rows in a deterministic non-sorted
    order to exercise the doc-id sort path.

    Corpora beyond ``_CHUNK_CONVS`` conversations are generated as
    parallel Ray tasks, one key-ordered chunk each (``conv_offset``
    keeps ids/timestamps globally ordered, chunk-indexed seeds keep it
    deterministic) — a 24M-turn corpus would otherwise take minutes of
    driver-side single-threaded generation and tens of GB of
    intermediate object arrays in one process."""
    params = f"{n_convs},{turns_per_conv},{seed},{n_files},{shuffle_files}"
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        with open(done) as f:
            if f.read() == params:
                return out_dir
        # parameter change: the cached corpus is stale — regenerate
        import shutil as _sh

        _sh.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    if n_convs <= _CHUNK_CONVS:
        table = make_transcripts(
            n_convs=n_convs, turns_per_conv=turns_per_conv, seed=seed
        )
        n = table.num_rows
        if shuffle_files:
            perm = np.random.default_rng(seed + 1).permutation(n)
            table = table.take(pa.array(perm))
        _write_chunk_files(table, out_dir, 0, n_files)
    else:
        if shuffle_files:
            raise ValueError("shuffle_files is single-chunk only")
        import ray

        if not ray.is_initialized():  # standalone script use
            ray.init(address="local", include_dashboard=False)

        n_chunks = -(-n_convs // _CHUNK_CONVS)
        # NOTE: under chunking the file count is approximate
        # (files_per_chunk * n_chunks); n_files is a layout hint, not a
        # contract — consumers glob the directory.
        files_per_chunk = max(1, n_files // n_chunks)

        # a high num_cpus bounds concurrent chunk generators (each
        # peaks at a few GB of object-array intermediates: a 32-CPU
        # node runs ~4 at a time instead of 10+) — but it must never
        # exceed the session's CPU total or every task is infeasible
        # and ray.get hangs forever on small hosts/test sessions
        task_cpus = max(1, min(8, int(ray.cluster_resources().get("CPU", 1))))

        @ray.remote(num_cpus=task_cpus)
        def gen_chunk(ci: int, lo: int, hi: int) -> int:
            t = make_transcripts(
                n_convs=hi - lo, turns_per_conv=turns_per_conv,
                seed=seed + ci, conv_offset=lo,
            )
            _write_chunk_files(t, out_dir, ci, files_per_chunk)
            return t.num_rows

        futs = [
            gen_chunk.remote(ci, ci * _CHUNK_CONVS, min((ci + 1) * _CHUNK_CONVS, n_convs))
            for ci in range(n_chunks)
        ]
        total = sum(ray.get(futs))
        assert total == n_convs * turns_per_conv, (total, n_convs * turns_per_conv)
    with open(done, "w") as f:
        f.write(params)
    return out_dir


# --- documents.parquet -> transcripts (SQL-reconstructible mapping) ---

TRANSCRIPTS_FROM_DOCUMENTS_SQL = """
    SELECT
        printf('conv-%08d', doc_id // 5) AS conv_id,  -- NOT lpad: lpad TRUNCATES past 8 chars, printf pads-only like Python's {:08d}
        CAST(doc_id % 5 AS INTEGER) AS turn_idx,
        CASE doc_id % 3 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
        text,
        CASE WHEN doc_id % 3 = 2 THEN 'search' ELSE '' END AS tool,
        TIMESTAMP '2026-01-01 00:00:00' + INTERVAL (doc_id) MINUTE AS ts
    FROM documents
"""


def transcripts_from_documents_batch(batch: pa.Table) -> pa.Table:
    """Vectorized Ray-side twin of TRANSCRIPTS_FROM_DOCUMENTS_SQL."""
    doc_id = batch["doc_id"].to_numpy()
    conv_id = np.array([f"conv-{i:08d}" for i in doc_id // 5], dtype=object)
    turn_idx = (doc_id % 5).astype(np.int32)
    role = _ROLES[doc_id % 3]
    tool = np.where(doc_id % 3 == 2, "search", "")
    ts = (np.datetime64("2026-01-01T00:00:00", "us")
          + doc_id.astype("timedelta64[m]")).astype("datetime64[us]")
    return pa.table(
        {
            "conv_id": pa.array(conv_id, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": batch["text"],
            "tool": pa.array(tool, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
