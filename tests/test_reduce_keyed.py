"""Property tests for the partition-vectorized reduction helpers
(ops/dedup._reduce_keyed / _reduce_pairs / _keyed_count_combine) — the
replacement for Ray's per-group Python aggregates on near-unique keys.
Random data compared against pandas groupby for int keys, string keys
(polars-hash partitioning + Arrow-sorted combine), pair keys, and the
multi-sum / min / first reducers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from search_engine_ray.ops.dedup import (_keyed_count_combine,
                                         _reduce_keyed, _reduce_pairs)


def _ds_of(df: pd.DataFrame, blocks: int = 5):
    return ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(blocks)


@pytest.mark.parametrize("seed", [0, 1])
def test_reduce_keyed_int_counts_and_sums(ray_session, seed):
    rng = np.random.default_rng(seed)
    n = 3000
    df = pd.DataFrame(
        {
            "k": rng.integers(-50, 2_000, n),  # negative keys too
            "a": rng.integers(0, 100, n),
            "b": rng.integers(-5, 5, n),
        }
    )
    got = (
        _reduce_keyed(
            _ds_of(df), "k", 13,
            _keyed_count_combine("k", "n", sums=(("a", "sa"), ("b", "sb"))),
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        df.groupby("k")
        .agg(n=("k", "size"), sa=("a", "sum"), sb=("b", "sum"))
        .reset_index()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want.astype({"n": "int64", "sa": "int64", "sb": "int64"}))


def test_reduce_keyed_string_keys(ray_session):
    rng = np.random.default_rng(7)
    n = 2500
    keys = np.array([f"key-{i:03d}" for i in rng.integers(0, 400, n)], dtype=object)
    df = pd.DataFrame({"k": keys, "v": rng.integers(0, 10, n)})
    got = (
        _reduce_keyed(
            _ds_of(df), "k", 9, _keyed_count_combine("k", "n", sums=(("v", "sv"),))
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        df.groupby("k").agg(n=("k", "size"), sv=("v", "sum")).reset_index()
        .sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got, want.astype({"n": "int64", "sv": "int64"})
    )
    # distinct-keys mode: one row per key, count column dropped
    distinct = _reduce_keyed(
        _ds_of(df), "k", 9, _keyed_count_combine("k")
    ).to_pandas()
    assert sorted(distinct["k"]) == sorted(df["k"].unique())


def test_reduce_pairs_count_min_first(ray_session):
    rng = np.random.default_rng(3)
    n = 4000
    df = pd.DataFrame(
        {
            "doc_a": rng.integers(0, 60, n),
            "doc_b": rng.integers(0, 60, n),
            "w": rng.integers(1, 9, n),
            "cosine": np.round(rng.random(n), 6),
        }
    )
    # count + sum-of-partials
    got = (
        _reduce_pairs(_ds_of(df), 11, count_col="w", out_count="inter")
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    want = (
        df.groupby(["doc_a", "doc_b"])["w"].sum().rename("inter").reset_index()
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want.astype({"inter": "int64"}))

    # per-pair min (the embedding-LSH cosine pick)
    got_min = (
        _reduce_pairs(_ds_of(df), 11, min_cols=("cosine",))
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    want_min = (
        df.groupby(["doc_a", "doc_b"])["cosine"].min().reset_index()
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_min, want_min)
