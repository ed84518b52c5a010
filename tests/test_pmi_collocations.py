"""pmi_collocations: a planted always-together pair must take rank 1
over filler pairs built from independently shuffled common words."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from search_engine_ray.ops.text_ops import _PMI_MIN, pmi_collocations


def test_pmi_planted_collocation(ray_session, tmp_path):
    rng = np.random.RandomState(3)
    common = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    docs = []
    for i in range(30):
        words = list(rng.choice(common, size=20))
        # plant the collocation: 'san francisco' appears as an adjacent
        # pair in every doc; its parts never appear apart
        pos = rng.randint(0, len(words))
        words[pos:pos] = ["san", "francisco"]
        docs.append(" ".join(words))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs, pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )

    out = pmi_collocations(str(tmp_path)).to_pandas()

    assert (out["n_pairs"] >= _PMI_MIN).all()
    top = out.sort_values(
        ["pmi_micro", "w1", "w2"], ascending=[False, True, True]
    ).iloc[0]
    assert (top["w1"], top["w2"]) == ("san", "francisco")
    assert top["n_pairs"] == 30
    # the planted pair's PMI strictly exceeds every filler pair's
    filler = out[(out["w1"] != "san") | (out["w2"] != "francisco")]
    assert (top["pmi_micro"] > filler["pmi_micro"]).all()


def test_pmi_join_fallback_matches_broadcast(ray_session, tmp_path, monkeypatch):
    """Above the vocab broadcast gate PMI hash-joins twice; identical rows."""
    import numpy as np
    import pandas as pd

    from search_engine_ray.ops import text_ops

    rng = np.random.RandomState(13)
    vocab = [f"t{i}" for i in range(12)]
    docs = [" ".join(rng.choice(vocab, size=40)) for _ in range(25)]
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
        ["pmi_micro", "w1", "w2"],
        ascending=[False, True, True]).reset_index(drop=True)
    bcast = text_ops.pmi_collocations(str(tmp_path)).to_pandas()
    monkeypatch.setattr(text_ops, "_BCAST_VOCAB_ROWS", -1)
    joined = text_ops.pmi_collocations(str(tmp_path)).to_pandas()
    pd.testing.assert_frame_equal(key(bcast), key(joined))
