"""Guard: the inline stem-map oracle for bm25_stemmed_topk treats any
term missing from _GATE_VOCAB as stem==raw. If the driver corpus ever
gains vocabulary whose Porter stem differs, the oracle would silently
diverge — this test fails loudly instead."""

import os

import duckdb
import pytest

from search_engine_ray.functions.stemmer import CachingStemmer
from search_engine_ray.ops.search_ops import _GATE_VOCAB

SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.skipif(not os.path.exists(f"{SF_DIR}/documents.parquet"),
                    reason="driver testdata absent")
def test_gate_vocab_covers_corpus_or_stems_are_identity():
    con = duckdb.connect()
    vocab = {
        r[0]
        for r in con.execute(f"""
            SELECT DISTINCT term FROM (
              SELECT unnest(regexp_split_to_array(lower(substr(text, 1, 10000)),
                                                  '[^0-9a-z]+')) AS term
              FROM read_parquet('{SF_DIR}/documents.parquet'))
            WHERE term <> ''
        """).fetchall()
    }
    st = CachingStemmer()
    uncovered = {
        t for t in vocab - set(_GATE_VOCAB) if st.stem(t) != t
    }
    assert not uncovered, (
        f"corpus terms missing from _GATE_VOCAB with non-identity stems: "
        f"{sorted(uncovered)[:20]} — extend _GATE_VOCAB in ops/search_ops.py"
    )
