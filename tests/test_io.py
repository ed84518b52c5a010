"""read_parquet_clean: metadata stripping + path-shape handling."""

import pandas as pd
import pyarrow.parquet as pq
import pytest

from search_engine_ray.io import clean_schema, read_parquet_clean


@pytest.fixture(scope="module")
def parquet_tree(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("io")
    df = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    flat = root / "flat.parquet"
    df.to_parquet(flat)  # pandas metadata attached
    nested = root / "nested"
    for part in ("part=0", "part=1"):
        (nested / part).mkdir(parents=True)
        df.to_parquet(nested / part / "chunk.parquet")
    return root, flat, nested


def test_clean_schema_strips_metadata(parquet_tree):
    _, flat, _ = parquet_tree
    assert pq.read_schema(str(flat)).metadata  # pandas wrote metadata
    sch = clean_schema(str(flat))
    assert sch.metadata is None
    assert clean_schema(str(flat), ["a"]).names == ["a"]


def test_read_flat_file_and_list(parquet_tree):
    _, flat, _ = parquet_tree
    assert read_parquet_clean(str(flat)).count() == 3
    assert read_parquet_clean([str(flat), str(flat)], columns=["a"]).count() == 6


def test_read_hive_partitioned_dir(parquet_tree):
    """Regression: schema discovery must recurse into part=*/ subdirs
    (the segments layout) — a bare directory path used to be handed to
    pq.read_schema and fail."""
    _, _, nested = parquet_tree
    ds = read_parquet_clean(str(nested), columns=["a", "b"])
    assert ds.count() == 6


def test_small_input_blocks_scales_with_size(parquet_tree, ray_session, monkeypatch):
    """Tiny inputs coalesce to [cpus/4, 2*cpus] blocks; inputs above
    128 MiB/CPU return None (keep Ray's default heuristics); a missing
    path returns None rather than raising."""
    from search_engine_ray import io as io_

    _, flat, nested = parquet_tree
    cpus = int(__import__("ray").cluster_resources().get("CPU", 8))
    n = io_.small_input_blocks(str(flat))
    assert n == max(2, cpus // 4)  # ~1 KB file -> the floor
    assert io_.small_input_blocks(str(nested)) == n  # dir form works
    assert io_.small_input_blocks("/nonexistent/nope.parquet") is None

    # a "huge" input (patched sizes) keeps Ray's default
    monkeypatch.setattr(io_, "_total_bytes", lambda p: 4 * cpus * (64 << 20))
    assert io_.small_input_blocks(str(flat)) is None
    # mid-size: ceil(bytes / 4 MiB), capped at 2*cpus
    monkeypatch.setattr(io_, "_total_bytes", lambda p: 40 << 20)
    assert io_.small_input_blocks(str(flat)) == min(2 * cpus, max(2, cpus // 4, 10))
