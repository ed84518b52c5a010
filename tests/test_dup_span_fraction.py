"""dup_span_fraction on a fixture with hand-countable shared trigrams:
two docs share a 4-token span (two shared trigrams), a third is fully
unique, a fourth is an exact copy of the first (all shingles dup), and
a two-token doc exercises the whole-doc short-shingle path."""

import pyarrow as pa
import pyarrow.parquet as pq

from search_engine_ray.ops.dedup import dup_span_fraction


def test_dup_span_fraction_counts(ray_session, tmp_path):
    docs = [
        "alpha beta gamma delta epsilon",   # doc 0: 3 shingles
        "zeta alpha beta gamma delta",      # doc 1: shares 'alpha beta gamma',
                                            #        'beta gamma delta' with doc 0
        "one two three four five",          # doc 2: unique
        "alpha beta gamma delta epsilon",   # doc 3: exact copy of doc 0
        "tiny pair",                        # doc 4: short -> one whole-doc shingle
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs, pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )

    out = (
        dup_span_fraction(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )

    assert out.loc[0, "n_sh"] == 3
    # docs 0 and 3 are identical: every shingle duplicated
    assert out.loc[0, "n_dup"] == 3 and out.loc[0, "dup_ppm"] == 1_000_000
    assert out.loc[3, "n_dup"] == 3 and out.loc[3, "dup_ppm"] == 1_000_000
    # doc 1 shares exactly 2 of its 3 shingles with doc 0/3
    assert out.loc[1, "n_sh"] == 3 and out.loc[1, "n_dup"] == 2
    assert out.loc[1, "dup_ppm"] == 666_667  # floor(2/3*1e6 + 0.5)
    # unique and short docs have zero duplicated spans
    assert out.loc[2, "n_dup"] == 0 and out.loc[2, "dup_ppm"] == 0
    assert out.loc[4, "n_sh"] == 1 and out.loc[4, "n_dup"] == 0


def test_dup_span_approx_one_sided_and_tight(ray_session, tmp_path):
    """The broadcast-Bloom path: per-doc n_dup_approx >= n_dup_exact
    (false positives only — a true dup shingle can never be missed),
    n_sh identical, and total overcount bounded well under the sizing's
    theoretical fp rate on a corpus with many unique shingles."""
    import numpy as np

    from search_engine_ray.ops.dedup import dup_span_fraction_approx

    rng = np.random.RandomState(7)
    vocab = [f"w{i:04d}" for i in range(400)]
    docs = [" ".join(rng.choice(vocab, size=30)) for _ in range(120)]
    docs += docs[:10]  # 10 exact copies: every shingle of those is dup
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs, pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    exact = (
        dup_span_fraction(str(tmp_path)).to_pandas().set_index("doc_id").sort_index()
    )
    approx = (
        dup_span_fraction_approx(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert (approx["n_sh"] == exact["n_sh"]).all()
    diff = approx["n_dup"] - exact["n_dup"]
    assert (diff >= 0).all(), "Bloom must never undercount dups"
    total = int(exact["n_sh"].sum())
    assert int(diff.sum()) <= max(2, int(0.01 * total)), (
        f"fp overcount {int(diff.sum())} of {total} probes"
    )
    # the copies must read fully-duplicated through the approx path too
    assert (approx.loc[120:, "dup_ppm"] == 1_000_000).all()

    # blocked layout (max_bits forced tiny -> many hash-range blocks):
    # same one-sided contract, results consistent with the single-block
    # run — this is the >cap shape the 100 TB path relies on
    from search_engine_ray.ops.dedup import _bloom_layout

    n_blocks, m = _bloom_layout(10_000, 16, 1 << 14)
    assert n_blocks == 10 and m <= 1 << 14
    blocked = (
        dup_span_fraction_approx(str(tmp_path), max_bits=1 << 14)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert (blocked["n_sh"] == exact["n_sh"]).all()
    bdiff = blocked["n_dup"] - exact["n_dup"]
    assert (bdiff >= 0).all(), "blocked Bloom must never undercount dups"
    assert int(bdiff.sum()) <= max(2, int(0.01 * total))
    assert (blocked.loc[120:, "dup_ppm"] == 1_000_000).all()


def test_dup_span_join_fallback_matches_broadcast(ray_session, tmp_path, monkeypatch):
    """Above the broadcast budget the exact op falls back to the
    sh-keyed hash join; both paths must produce identical rows."""
    import pandas as pd

    from search_engine_ray.ops import dedup

    docs = [
        "alpha beta gamma delta epsilon",
        "zeta alpha beta gamma delta",
        "one two three four five",
        "alpha beta gamma delta epsilon",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs, pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    bcast = dedup.dup_span_fraction(str(tmp_path)).to_pandas()
    monkeypatch.setattr(dedup, "_BCAST_DUP_KEYS", -1)  # force the join path
    joined = dedup.dup_span_fraction(str(tmp_path)).to_pandas()
    key = lambda d: d.sort_values("doc_id").reset_index(drop=True)  # noqa: E731
    pd.testing.assert_frame_equal(key(bcast), key(joined))


def test_bloom_layout_bounds():
    from search_engine_ray.ops.dedup import _bloom_layout

    # single block while the need fits the cap
    assert _bloom_layout(0, 16, 1 << 30) == (1, 1024)
    n, m = _bloom_layout(1 << 20, 16, 1 << 30)
    assert n == 1 and m == 1 << 24
    # above the cap: blocks multiply, per-block m never exceeds the cap
    for keys in (1 << 26, (1 << 26) + 12345, 1 << 28):
        n, m = _bloom_layout(keys, 16, 1 << 30)
        assert m <= 1 << 30
        assert n * m >= keys * 16  # total capacity preserved
