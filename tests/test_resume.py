"""Kill/resume: a build aborted mid-run resumes to an identical logical
index without re-running completed partitions (FIXTURES.md §5)."""

import json
import os

import pytest

from search_engine_ray.config import IndexConfig
from search_engine_ray.corpus import write_transcripts
from search_engine_ray.pipelines.build_index import build_index, BuildAborted
from search_engine_ray.stages.query import load_logical_postings


def test_kill_and_resume(ray_session, tmp_path):
    src = str(tmp_path / "transcripts")
    write_transcripts(src, n_convs=80, turns_per_conv=5, seed=42, n_files=6)
    cfg = IndexConfig(doc_bucket_size=256)

    clean_dir = str(tmp_path / "clean")
    build_index(src, clean_dir, cfg, n_partitions=3)

    resumed_dir = str(tmp_path / "resumed")
    with pytest.raises(BuildAborted):
        build_index(src, resumed_dir, cfg, n_partitions=3, stop_after_partition=1)
    # partition 0 finished, 1..2 missing
    assert os.path.exists(f"{resumed_dir}/segments/part=00000/_MANIFEST.json")
    assert not os.path.exists(f"{resumed_dir}/segments/part=00001")

    p0_manifest = f"{resumed_dir}/segments/part=00000/_MANIFEST.json"
    mtime_before = os.path.getmtime(p0_manifest)
    build_index(src, resumed_dir, cfg, n_partitions=3)
    # completed partition not rebuilt
    assert os.path.getmtime(p0_manifest) == mtime_before

    a = load_logical_postings(clean_dir)
    b = load_logical_postings(resumed_dir)
    assert set(a) == set(b)
    for term in a:
        assert a[term][0].tolist() == b[term][0].tolist(), term
        assert a[term][1].tolist() == b[term][1].tolist(), term
        assert a[term][2] == b[term][2], term

    # manifests carry lineage + metrics
    m = json.load(open(p0_manifest))
    assert m["stage"] == "segments" and m["inputs"] and "n_segments" in m


def test_stale_wave_tmp_cleaned(ray_session, tmp_path):
    """A crash mid-wave leaves segments/_wave.tmp; the next build must
    discard it and still produce a correct index."""
    src = str(tmp_path / "transcripts")
    write_transcripts(src, n_convs=60, turns_per_conv=5, seed=42, n_files=4)
    cfg = IndexConfig(doc_bucket_size=256)

    clean_dir = str(tmp_path / "clean")
    build_index(src, clean_dir, cfg, n_partitions=2)

    crashed_dir = str(tmp_path / "crashed")
    wave_tmp = os.path.join(crashed_dir, "segments", "_wave.tmp", "part=0")
    os.makedirs(wave_tmp)
    with open(os.path.join(wave_tmp, "junk.parquet"), "w") as f:
        f.write("not parquet")
    build_index(src, crashed_dir, cfg, n_partitions=2)
    assert not os.path.exists(os.path.join(crashed_dir, "segments", "_wave.tmp"))

    a = load_logical_postings(clean_dir)
    b = load_logical_postings(crashed_dir)
    assert set(a) == set(b)
    for term in a:
        assert a[term][0].tolist() == b[term][0].tolist(), term
