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
