"""clean_corpus (the `prep` CLI path): the written survivors must be
exactly prepare_corpus's id set with every source column preserved."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from search_engine_ray.ops.prepare import clean_corpus, prepare_corpus


def _write_docs(path):
    # mix: non-en, low-quality (digits), exact dups, near dups, clean
    texts = [
        "the quick brown fox jumps over the lazy dog today",       # keep
        "the quick brown fox jumps over the lazy dog today",       # exact dup
        "the quick brown fox jumps over the lazy dog yesterday",   # near dup
        "1234 5678 9012 3456 7890",                                # low alpha
        "short text",                                              # too few tokens
        "completely different content about database query engines and sorting",  # keep
    ]
    langs = ["en", "en", "en", "en", "en", "en"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
                "lang": pa.array(langs, pa.string()),
                "text": pa.array(texts, pa.string()),
                "extra": pa.array([f"x{i}" for i in range(len(texts))], pa.string()),
            }
        ),
        str(path / "documents.parquet"),
    )


def test_clean_corpus_writes_survivors_with_all_columns(ray_session, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_docs(src)
    out = tmp_path / "out"

    info = clean_corpus(str(src), str(out))
    want_ids = sorted(prepare_corpus(str(src)).to_pandas()["doc_id"].tolist())

    files = glob.glob(os.path.join(str(out), "*.parquet"))
    got = pq.read_table(files)
    assert sorted(got["doc_id"].to_pylist()) == want_ids
    # full rows ride through, not just ids
    assert set(got.column_names) >= {"doc_id", "lang", "text", "extra"}
    assert info["kept_rows"] == len(want_ids)
    assert info["input_rows"] == 6
    # the chain actually dropped something (dup/near-dup/quality rows)
    assert 0 < len(want_ids) < 6


def test_clean_corpus_accepts_direct_parquet_path(ray_session, tmp_path):
    src = tmp_path / "src2"
    src.mkdir()
    _write_docs(src)
    out = tmp_path / "out2"
    info = clean_corpus(str(src / "documents.parquet"), str(out))
    assert info["kept_rows"] > 0
