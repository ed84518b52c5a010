"""decontaminate: the broadcast semi-join/anti-join fast path must
match the shuffle-join fallback exactly, and planted eval contamination
must remove exactly the overlapping train docs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from search_engine_ray.ops import prepare


def _write(tmp_path, docs):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs, pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )


def test_decontaminate_removes_planted_overlap(ray_session, tmp_path):
    # doc 0 is "eval" (doc_id % 50 == 0); docs 50 and 100 are eval too.
    # doc 7 copies doc 0's text -> contaminated; doc 9 is clean. Every
    # other doc uses per-doc-unique tokens so no trigram crosses docs.
    docs = ["the quick brown fox jumps"] + [
        f"u{i}a u{i}b u{i}c u{i}d u{i}e" for i in range(1, 120)
    ]
    docs[7] = "the quick brown fox jumps"  # shares every shingle with eval doc 0
    _write(tmp_path, docs)
    out = prepare.decontaminate(str(tmp_path)).to_pandas()
    got = set(out["doc_id"])
    assert 7 not in got, "doc sharing eval shingles must be removed"
    assert 9 in got
    # eval docs themselves are never in the train output
    assert got.isdisjoint({0, 50, 100})


def test_decontaminate_join_fallback_matches_broadcast(ray_session, tmp_path, monkeypatch):
    rng = np.random.RandomState(5)
    vocab = [f"w{i}" for i in range(150)]
    docs = [" ".join(rng.choice(vocab, size=12)) for _ in range(130)]
    docs[51] = docs[50]  # train doc copying an eval doc (50 % 50 == 0)
    _write(tmp_path, docs)
    bcast = prepare.decontaminate(str(tmp_path)).to_pandas()
    monkeypatch.setattr(prepare, "_BCAST_SEMI_KEYS", -1)  # force both joins
    joined = prepare.decontaminate(str(tmp_path)).to_pandas()
    key = lambda d: d.sort_values("doc_id").reset_index(drop=True)  # noqa: E731
    pd.testing.assert_frame_equal(key(bcast), key(joined))
    assert 51 not in set(bcast["doc_id"])
