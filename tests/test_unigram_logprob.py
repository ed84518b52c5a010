"""unigram_logprob on a 3-doc fixture small enough to hand-compute:
integer micro-nat contributions match an independent recomputation and
the common-token doc scores a higher (less negative) mean than the
rare-token doc."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from search_engine_ray.ops.text_ops import unigram_logprob


def test_unigram_logprob_exact(ray_session, tmp_path):
    docs = ["a a b", "a c", "a a a"]  # tf_global: a=6, b=1, c=1; T=8
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(3), pa.int64()),
                "text": pa.array(docs, pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )

    out = (
        unigram_logprob(str(tmp_path)).to_pandas().set_index("doc_id").sort_index()
    )

    T = 8.0
    lp = lambda tf, g: int(np.floor(tf * np.log(g / T) * 1e6))
    exp0 = lp(2, 6.0) + lp(1, 1.0)
    exp1 = lp(1, 6.0) + lp(1, 1.0)
    exp2 = lp(3, 6.0)
    assert out.loc[0, "lp_micro"] == exp0 and out.loc[0, "n_tokens"] == 3
    assert out.loc[1, "lp_micro"] == exp1 and out.loc[1, "n_tokens"] == 2
    assert out.loc[2, "lp_micro"] == exp2 and out.loc[2, "n_tokens"] == 3
    assert out.loc[0, "lp_mean_micro"] == int(np.floor(exp0 / 3))
    # all-common-token doc has the highest (least negative) mean
    assert out.loc[2, "lp_mean_micro"] > out.loc[0, "lp_mean_micro"]
    assert out.loc[2, "lp_mean_micro"] > out.loc[1, "lp_mean_micro"]


def test_unigram_join_fallback_matches_broadcast(ray_session, tmp_path, monkeypatch):
    """A vocabulary above the broadcast gate goes through the hash
    join; both ship-back paths must hit identical integers."""
    import pandas as pd

    from search_engine_ray.ops import text_ops

    rng = np.random.RandomState(3)
    vocab = [f"w{i}" for i in range(60)]
    docs = [" ".join(rng.choice(vocab, size=25)) for _ in range(40)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs, pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    bcast = text_ops.unigram_logprob(str(tmp_path)).to_pandas()
    monkeypatch.setattr(text_ops, "_BCAST_VOCAB_ROWS", -1)  # force the join
    joined = text_ops.unigram_logprob(str(tmp_path)).to_pandas()
    key = lambda d: d.sort_values("doc_id").reset_index(drop=True)  # noqa: E731
    pd.testing.assert_frame_equal(key(bcast), key(joined))
