"""doc_keywords: each doc's distinctive rare term must outrank the
shared filler vocabulary, ranks are dense 1..k, and ubiquitous terms
(df = N, tfidf = 0) never beat a distinctive one."""

import pyarrow as pa
import pyarrow.parquet as pq

from search_engine_ray.ops.text_ops import doc_keywords


def test_doc_keywords_distinctive_terms(ray_session, tmp_path):
    filler = "the quick brown fox jumps"
    docs = [
        f"{filler} zebra zebra",
        f"{filler} quasar quasar",
        f"{filler} fjord fjord",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(3), pa.int64()),
                "text": pa.array(docs, pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )

    out = doc_keywords(str(tmp_path)).to_pandas()

    top1 = out[out["rank"] == 1].set_index("doc_id")["term"].to_dict()
    assert top1 == {0: "zebra", 1: "quasar", 2: "fjord"}
    # distinctive terms appear twice with df=1 -> positive score;
    # filler terms have df=N -> tfidf_micro exactly 0
    assert (out[out["rank"] == 1]["tfidf_micro"] > 0).all()
    assert (out[out["rank"] > 1]["tfidf_micro"] == 0).all()
    for _, g in out.groupby("doc_id"):
        assert sorted(g["rank"]) == list(range(1, len(g) + 1))
        assert len(g) <= 3
        # within a doc, score non-increasing with rank
        s = g.sort_values("rank")["tfidf_micro"].to_numpy()
        assert (s[:-1] >= s[1:]).all()


def test_doc_keywords_join_fallback_matches_broadcast(ray_session, tmp_path, monkeypatch):
    """Above the vocab broadcast gate the op hash-joins; identical rows."""
    import numpy as np
    import pandas as pd

    from search_engine_ray.ops import text_ops

    rng = np.random.RandomState(11)
    vocab = [f"t{i}" for i in range(80)]
    docs = [" ".join(rng.choice(vocab, size=20)) for _ in range(30)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs, pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    key = lambda d: d.sort_values(  # noqa: E731
        ["doc_id", "rank"]).reset_index(drop=True)
    bcast = text_ops.doc_keywords(str(tmp_path)).to_pandas()
    monkeypatch.setattr(text_ops, "_BCAST_VOCAB_ROWS", -1)
    joined = text_ops.doc_keywords(str(tmp_path)).to_pandas()
    pd.testing.assert_frame_equal(key(bcast), key(joined))
