"""Incremental indexing: extend_index over an append-only stream must
equal a from-scratch build over the union, without rebuilding finished
partitions (reference analog: incremental skip,
`/root/reference/src/cis5550/jobs/Indexer.java:196-231`)."""

import glob
import os
import shutil

import pytest

from search_engine_ray.config import IndexConfig
from search_engine_ray.corpus import write_transcripts
from search_engine_ray.pipelines.build_index import build_index, extend_index
from search_engine_ray.stages.query import LocalIndex, load_logical_postings


@pytest.fixture()
def split_corpus(tmp_path):
    full = str(tmp_path / "full")
    write_transcripts(full, n_convs=120, turns_per_conv=5, seed=42, n_files=8)
    files = sorted(glob.glob(f"{full}/*.parquet"))
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    os.makedirs(a), os.makedirs(b)
    for f in files[:5]:
        shutil.copy(f, a)
    for f in files[5:]:
        shutil.copy(f, b)
    return full, a, b


def test_extend_equals_full_build(ray_session, tmp_path, split_corpus):
    full, a, b = split_corpus
    cfg = IndexConfig(doc_bucket_size=128)

    full_dir = str(tmp_path / "idx_full")
    build_index(full, full_dir, cfg, n_partitions=3)

    ext_dir = str(tmp_path / "idx_ext")
    build_index(a, ext_dir, cfg, n_partitions=2)
    part0_manifest = sorted(glob.glob(f"{ext_dir}/segments/part=*/_MANIFEST.json"))[0]
    mtime = os.path.getmtime(part0_manifest)
    meta = extend_index(ext_dir, b, n_partitions=2)
    assert meta["timings"].get("extended") is True
    # finished partitions untouched
    assert os.path.getmtime(part0_manifest) == mtime

    x = load_logical_postings(full_dir)
    y = load_logical_postings(ext_dir)
    assert set(x) == set(y)
    for term in x:
        assert x[term][0].tolist() == y[term][0].tolist(), term
        assert x[term][1].tolist() == y[term][1].tolist(), term

    lf, le = LocalIndex(full_dir), LocalIndex(ext_dir)
    assert lf.N == le.N and abs(lf.avgdl - le.avgdl) < 1e-9
    for q in ["running", "meetings search", "the of and", "caresses ponies"]:
        ids_f, sc_f = lf.search(q, 50, mode="OR")
        ids_e, sc_e = le.search(q, 50, mode="OR")
        assert ids_f.tolist() == ids_e.tolist(), q
        assert abs(sc_f - sc_e).max() < 1e-12 if len(sc_f) else True

    # idempotent: re-applying the same extension is a no-op
    meta2 = extend_index(ext_dir, b, n_partitions=2)
    assert "docs_ext" not in meta2["timings"]


def test_extend_rejects_out_of_order_keys(ray_session, tmp_path, split_corpus):
    _, a, b = split_corpus
    cfg = IndexConfig(doc_bucket_size=128)
    idx = str(tmp_path / "idx_b_first")
    build_index(b, idx, cfg, n_partitions=2)
    with pytest.raises(ValueError, match="must sort after"):
        extend_index(idx, a, n_partitions=2)


def test_compact_after_extends(ray_session, tmp_path, split_corpus):
    """Several extends accumulate small partitions; compaction restores
    the target layout with bit-identical logical postings and results."""
    from search_engine_ray.pipelines.build_index import compact_index

    full, a, b = split_corpus
    cfg = IndexConfig(doc_bucket_size=128)
    idx = str(tmp_path / "idx_compact")
    build_index(a, idx, cfg, n_partitions=2)
    extend_index(idx, b, n_partitions=2)
    parts_before = len(glob.glob(os.path.join(idx, "segments", "part=*")))
    assert parts_before >= 4  # base 2 + extension 2

    before = load_logical_postings(idx)
    li_before = LocalIndex(idx)
    q_before = {q: li_before.search(q, 50, mode="OR") for q in ["running", "the of and"]}

    meta = compact_index(idx, n_partitions=2)
    assert meta["timings"]["compacted"]
    parts_after = len(glob.glob(os.path.join(idx, "segments", "part=*")))
    assert parts_after == 2

    after = load_logical_postings(idx)
    assert set(after) == set(before)
    for term in before:
        assert after[term][0].tolist() == before[term][0].tolist(), term
        assert after[term][1].tolist() == before[term][1].tolist(), term
    li = LocalIndex(idx)
    for q, (ids, sc) in q_before.items():
        ids2, sc2 = li.search(q, 50, mode="OR")
        assert ids2.tolist() == ids.tolist()


def test_search_server_refresh_covers_extension(ray_session, tmp_path, split_corpus):
    """SearchServer.refresh() must rebuild the DocStore (and speller)
    so docs appended by extend_index come back WITH conv_id/snippet
    metadata, not blank hits."""
    import json as json_
    import urllib.request

    import pyarrow.parquet as pq_

    from search_engine_ray.serve import SearchServer
    from search_engine_ray.pipelines.search import DocShardedSearcher

    _, a, b = split_corpus
    idx = str(tmp_path / "srv_idx")
    build_index(a, idx, n_partitions=2)
    n_before = LocalIndex(idx).N
    srv = SearchServer(idx, DocShardedSearcher(idx, n_shards=2)).start()
    try:
        extend_index(idx, b, n_partitions=2)
        srv.refresh()
        # pick a term from the extension and search it over HTTP
        ext_text = pq_.read_table(sorted(glob.glob(f"{b}/*.parquet"))[0], columns=["text"])
        term = next(w for w in ext_text["text"][0].as_py().split() if len(w) > 3)
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/search?query={term}&k=50&mode=OR"
        ) as resp:
            payload = json_.loads(resp.read())
        new_hits = [r for r in payload["results"] if r["doc_id"] >= n_before]
        assert new_hits, "extension docs should be searchable after refresh"
        assert all("conv_id" in r and "snippet" in r for r in new_hits)
    finally:
        srv.stop()


def test_orphan_extension_files_never_indexed(ray_session, tmp_path, split_corpus):
    """An extend that crashed between staging its ext-*.parquet files
    and committing the docs manifest leaves orphans whose doc_ids sit
    at >= manifest N. ANY later build path (not just extend_index) must
    sweep them before partitioning — otherwise segments reference
    doc_ids outside the query-time accumulators."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from search_engine_ray.pipelines.build_index import compact_index
    from search_engine_ray.state.checkpoint import read_manifest

    _, a, _ = split_corpus
    cfg = IndexConfig(doc_bucket_size=128)
    idx = str(tmp_path / "idx")
    build_index(a, idx, cfg, n_partitions=2)
    docs_dir = os.path.join(idx, "docs")
    n = read_manifest(docs_dir)["N"]

    # simulate the crash: staged ext files present, manifest not updated
    orphan = os.path.join(docs_dir, "ext-deadbeef0123-00000.parquet")
    pq.write_table(
        pa.table({
            "doc_id": pa.array([n, n + 1], pa.int64()),
            "doclen": pa.array([3, 3], pa.int64()),
            "text": pa.array(["orphan text rows", "must never index"], pa.string()),
            "conv_id": pa.array(["zz", "zz"], pa.string()),
            "turn_idx": pa.array([0, 1], pa.int64()),
            "role": pa.array(["user", "user"], pa.string()),
            "tool": pa.array(["", ""], pa.string()),
        }),
        orphan,
    )
    compact_index(idx, n_partitions=1)
    assert not os.path.exists(orphan)  # swept, not indexed
    li = LocalIndex(idx)
    assert li.N == n
    ids, _sc = li.search("orphan", k=10, mode="OR")
    assert len(ids) == 0


def test_repartition_orders_docs_files_by_doc_range(ray_session, tmp_path, split_corpus):
    """Partition grouping must order docs files by DOC RANGE, not
    filename: extension files ('ext-…') sort lexically before uuid
    base files starting with 'f', so a name sort can interleave a
    high-doc-id extension among the base files and produce overlapping
    partition ranges — compaction of an extended index would abort.
    Forced deterministically by renaming a low-range docs file to sort
    LAST, invalidating the inventory so everything re-partitions."""
    import pyarrow.parquet as pq

    from search_engine_ray.pipelines.build_index import compact_index

    _full, a, b = split_corpus
    cfg = IndexConfig(doc_bucket_size=128)
    idx = str(tmp_path / "idx_reorder")
    build_index(a, idx, cfg, n_partitions=2)
    extend_index(idx, b, n_partitions=2)
    before = LocalIndex(idx)
    n_before = before.N
    ids_before, _ = before.search("meetings", k=20, mode="OR")

    docs_dir = os.path.join(idx, "docs")
    files = sorted(glob.glob(os.path.join(docs_dir, "*.parquet")))
    lowest = min(files, key=lambda f: pq.read_metadata(f).row_group(0)
                 .column(0).statistics.min)
    renamed = os.path.join(docs_dir, "zzz-renamed-00000.parquet")
    os.rename(lowest, renamed)  # name order now disagrees with doc order

    compact_index(idx, n_partitions=2)  # must re-partition cleanly
    after = LocalIndex(idx)
    assert after.N == n_before
    ids_after, _ = after.search("meetings", k=20, mode="OR")
    assert ids_before.tolist() == ids_after.tolist()


def test_gate_split_has_nonempty_extension(ray_session):
    """The postings_extend gate entry is only evidence if its split
    leaves a real tail to extend with: both sides non-empty, every ext
    key strictly after every base key."""
    import pyarrow.parquet as pq

    from search_engine_ray.ops.search_ops import _split_transcripts

    base, ext = _split_transcripts("/root/testdata/sf0.001")
    b = pq.read_table(base, columns=["conv_id"])
    x = pq.read_table(ext, columns=["conv_id"])
    assert b.num_rows > 0 and x.num_rows > 0
    import pyarrow.compute as pc

    assert pc.max(b["conv_id"]).as_py() < pc.min(x["conv_id"]).as_py()
