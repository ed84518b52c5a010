"""Hand-computed cases for the Gopher-style repetition statistics
(ops/text_ops.repetition_stats): top/duplicate n-gram ppm over the
normative token stream, including the empty / one-token / null edge
cases the gate corpus never hits inside a single batch."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_ray.ops import text_ops


def _run(tmp_path, texts):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = text_ops.repetition_stats(str(tmp_path)).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _ppm(num, den):
    return int(np.floor(num * 1e6 / max(den, 1) + 0.5))


def test_repetition_hand_computed(ray_session, tmp_path):
    texts = [
        # 6 tokens; top unigram "a" x4; bigrams [a a, a b, b a, a c, c a]
        # all distinct -> top2 = 1, dup2 = 0
        "a a b a c a",
        # degenerate repetition: 5 tokens "x"; top1=5; bigrams 4x "x x"
        # -> top2=4, dist2=1, dup2=3; trigrams 3x "x x x" -> top3=3
        "x x x x x",
        # punctuation-split + lowercasing: "Go, go GO!" -> [go, go, go]
        "Go, go GO!",
        # empty and null: zero tokens, every ppm 0
        "",
        None,
        # single token: no bigrams/trigrams
        "word",
    ]
    df = _run(tmp_path, texts)

    assert df["n_tokens"].tolist() == [6, 5, 3, 0, 0, 1]

    r0 = df.iloc[0]
    assert r0["top_unigram_ppm"] == _ppm(4, 6)
    assert r0["top_bigram_ppm"] == _ppm(1, 5)
    assert r0["dup_bigram_ppm"] == 0
    assert r0["top_trigram_ppm"] == _ppm(1, 4)

    r1 = df.iloc[1]
    assert r1["top_unigram_ppm"] == 1_000_000
    assert r1["top_bigram_ppm"] == 1_000_000
    assert r1["dup_bigram_ppm"] == _ppm(3, 4)
    assert r1["top_trigram_ppm"] == 1_000_000

    r2 = df.iloc[2]
    assert r2["top_unigram_ppm"] == 1_000_000
    assert r2["top_bigram_ppm"] == 1_000_000
    assert r2["dup_bigram_ppm"] == _ppm(1, 2)
    assert r2["top_trigram_ppm"] == 1_000_000

    for i in (3, 4):
        row = df.iloc[i]
        assert row[["top_unigram_ppm", "top_bigram_ppm",
                    "dup_bigram_ppm", "top_trigram_ppm"]].tolist() == [0, 0, 0, 0]

    r5 = df.iloc[5]
    assert r5["top_unigram_ppm"] == 1_000_000
    assert r5["top_bigram_ppm"] == 0
    assert r5["top_trigram_ppm"] == 0


def test_ngram_never_crosses_doc_boundary(ray_session, tmp_path):
    # adjacent docs ending/starting with the same token must not form a
    # cross-doc bigram: "b a" | "a b" has no "a a" bigram anywhere
    df = _run(tmp_path, ["b a", "a b"])
    # each doc: bigrams {b a} / {a b}, all counts 1
    assert df["top_bigram_ppm"].tolist() == [1_000_000, 1_000_000]
    assert df["dup_bigram_ppm"].tolist() == [0, 0]


def test_repetition_oracle_parity_on_gate_table(ray_session):
    import duckdb

    sf = "/root/testdata/sf0.001"
    got = (
        text_ops.repetition_stats(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = (
        con.execute(text_ops.SQL_REPETITION_STATS)
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (got[want.columns].values == want.values).all()
