"""End-to-end: Ray build vs single-process oracle (SURVEY.md §5)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from search_engine_ray.config import IndexConfig
from search_engine_ray.corpus import make_transcripts, make_queries, write_transcripts
from search_engine_ray.oracle import build_oracle_index, oracle_search
from search_engine_ray.pipelines.build_index import build_index
from search_engine_ray.stages.query import LocalIndex, load_logical_postings


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("idx")
    src = str(root / "transcripts")
    # shuffled file order: exercises the doc-id sort path
    write_transcripts(src, n_convs=120, turns_per_conv=5, seed=42, n_files=6, shuffle_files=True)
    # small bucket so multi-bucket segmentation is exercised
    cfg = IndexConfig(doc_bucket_size=128)
    index_dir = str(root / "index")
    meta = build_index(src, index_dir, cfg, n_partitions=3)
    table = pq.read_table(f"{src}")
    oracle = build_oracle_index(table.to_pandas(), cfg)
    return index_dir, meta, oracle, cfg


def test_doc_stats_match(built):
    index_dir, meta, oracle, _ = built
    assert meta["N"] == oracle.N
    assert abs(meta["avgdl"] - oracle.avgdl) < 1e-9
    import glob

    got = (
        pq.read_table(sorted(glob.glob(f"{index_dir}/docs/*.parquet")))
        .select(["doc_id", "conv_id", "turn_idx", "doclen"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = oracle.doc_stats
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["conv_id"].tolist() == want["conv_id"].tolist()
    assert got["turn_idx"].tolist() == want["turn_idx"].tolist()
    assert got["doclen"].tolist() == want["doclen"].tolist()


def test_text_round_trip(built):
    """Per-turn text byte-equality under stable (conv_id, turn_idx)
    order — the input_hint invariant."""
    index_dir, _, oracle, _ = built
    import glob

    docs = (
        pq.read_table(sorted(glob.glob(f"{index_dir}/docs/*.parquet")))
        .select(["doc_id", "conv_id", "turn_idx", "text"])
        .to_pandas()
        .sort_values("doc_id")
    )
    # doc order must equal ascending (conv_id, turn_idx)
    key = list(zip(docs["conv_id"], docs["turn_idx"]))
    assert key == sorted(key)


def test_postings_match_oracle(built):
    index_dir, _, oracle, _ = built
    got = load_logical_postings(index_dir)
    assert set(got) == set(oracle.postings)
    for term, (ids, tfs, positions) in got.items():
        want = oracle.postings[term]
        want_ids = [d for d, _, _ in want]
        want_tfs = [tf for _, tf, _ in want]
        want_pos = [p for _, _, p in want]
        assert ids.tolist() == want_ids, term
        assert tfs.tolist() == want_tfs, term
        assert positions == want_pos, term


def test_dictionary_df(built):
    index_dir, _, oracle, _ = built
    import glob

    d = pq.read_table(sorted(glob.glob(f"{index_dir}/dictionary/*.parquet"))).to_pandas()
    got = dict(zip(d["term"], d["df"]))
    want = {t: len(p) for t, p in oracle.postings.items()}
    assert got == want


def test_distributed_dictionary_matches_local(built):
    """Above DICT_LOCAL_STAT_BYTES the dictionary builds with the
    distributed partition-vectorized reduction (_reduce_keyed +
    _dict_part); over the SAME segment files it must be row-identical
    to the driver-side Arrow group_by the small path uses. (Two
    separate index BUILDS are not comparable: segment-wave layout is
    execution-dependent, so n_segments differs across builds.)"""
    import glob
    import os

    import pandas as pd

    from search_engine_ray.io import read_parquet_clean
    from search_engine_ray.ops.dedup import _reduce_keyed
    from search_engine_ray.pipelines.build_index import _dict_part

    index_dir, _, _, _ = built
    seg_root = os.path.join(index_dir, "segments")
    files = sorted(glob.glob(os.path.join(seg_root, "part=*", "*.parquet")))
    seg_t = pq.read_table(files, columns=["term", "df", "max_tf"])
    agg = seg_t.group_by("term").aggregate(
        [("df", "sum"), ("max_tf", "max"), ("df", "count")]
    )
    local = pd.DataFrame(
        {
            "term": agg["term"].to_pandas(),
            "df": agg["df_sum"].to_pandas().astype("int64"),
            "max_tf": agg["max_tf_max"].to_pandas(),
            "n_segments": agg["df_count"].to_pandas().astype("int64"),
        }
    ).sort_values("term").reset_index(drop=True)

    dist = (
        _reduce_keyed(
            read_parquet_clean(seg_root, columns=["term", "df", "max_tf"]),
            "term", 16, _dict_part,
        )
        .to_pandas()
        .sort_values("term")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(local, dist)


@pytest.mark.parametrize("mode", ["AND", "OR"])
def test_topk_rank_identical(built, mode):
    index_dir, _, oracle, cfg = built
    idx = LocalIndex(index_dir)
    queries = make_queries(30)
    for _, row in queries.iterrows():
        got_ids, got_scores = idx.search(row["query"], int(row["k"]), mode=mode)
        want = oracle_search(oracle, row["query"], int(row["k"]), mode=mode)
        assert got_ids.tolist() == want["doc_id"].tolist(), row["query"]
        np.testing.assert_allclose(got_scores, want["score"].to_numpy(), atol=1e-9)


def test_salting_equivalence(ray_session, tmp_path, built):
    """Different doc_bucket_size (salting granularity) must not change
    the logical index (FIXTURES.md §5)."""
    index_dir, _, oracle, _ = built
    src_tbl = None  # rebuild from the same corpus with huge buckets
    root = tmp_path
    src = str(root / "transcripts")
    write_transcripts(src, n_convs=120, turns_per_conv=5, seed=42, n_files=6, shuffle_files=True)
    cfg2 = IndexConfig(doc_bucket_size=1 << 30)
    idx2 = str(root / "index2")
    build_index(src, idx2, cfg2, n_partitions=2)
    a = load_logical_postings(index_dir)
    b = load_logical_postings(idx2)
    assert set(a) == set(b)
    for term in a:
        assert a[term][0].tolist() == b[term][0].tolist()
        assert a[term][1].tolist() == b[term][1].tolist()
        assert a[term][2] == b[term][2]


def test_prefix_sum_path_equals_sort_path(ray_session, tmp_path, built):
    """Sorted input files take the no-shuffle prefix-sum doc-id path;
    the resulting logical index must be identical to the sort path's
    (same corpus in shuffled file order)."""
    index_dir, _, _, cfg = built
    src = str(tmp_path / "sorted_transcripts")
    write_transcripts(src, n_convs=120, turns_per_conv=5, seed=42, n_files=6)
    fast_dir = str(tmp_path / "fast_index")
    meta = build_index(src, fast_dir, cfg, n_partitions=3)
    assert meta["timings"].get("docs_path") == "prefix_sum"
    a = load_logical_postings(index_dir)
    b = load_logical_postings(fast_dir)
    assert set(a) == set(b)
    for term in a:
        assert a[term][0].tolist() == b[term][0].tolist(), term
        assert a[term][1].tolist() == b[term][1].tolist(), term
        assert a[term][2] == b[term][2], term


def test_actor_builder_parity(ray_session, tmp_path, built):
    """builder='actors' (PartialIndexBuilder pool) must produce the
    same logical index as the default task-pool path."""
    index_dir, _, _, cfg = built
    src = str(tmp_path / "transcripts")
    write_transcripts(src, n_convs=120, turns_per_conv=5, seed=42, n_files=6, shuffle_files=True)
    actor_dir = str(tmp_path / "actor_index")
    build_index(src, actor_dir, cfg, n_partitions=3, builder="actors", concurrency=(1, 2))
    a = load_logical_postings(index_dir)
    b = load_logical_postings(actor_dir)
    assert set(a) == set(b)
    for term in a:
        assert a[term][0].tolist() == b[term][0].tolist(), term


def test_index_role_tool_tokens(ray_session, tmp_path):
    """index_role_tool=True prepends role/tool tokens (the analog of the
    reference's URL-token indexing, Indexer.java:236-238): role terms
    become searchable with df = count of turns with that role."""
    import pyarrow.parquet as pq_

    src = str(tmp_path / "transcripts_rt")
    write_transcripts(src, n_convs=40, turns_per_conv=5, seed=42, n_files=2)
    cfg = IndexConfig(index_role_tool=True, doc_bucket_size=128)
    idx = str(tmp_path / "index_rt")
    build_index(src, idx, cfg, n_partitions=2)
    li = LocalIndex(idx)
    import glob as glob_

    docs = pq_.read_table(
        sorted(glob_.glob(f"{idx}/docs/*.parquet")), columns=["doc_id", "role"]
    ).to_pandas()
    n_assistant = int((docs["role"] == "assistant").sum())
    ids, _tfs = li.term_postings("assistant")
    assert len(ids) == n_assistant
    want = set(docs[docs["role"] == "assistant"]["doc_id"])
    assert set(ids.tolist()) == want


def test_empty_corpus_builds_empty_index(ray_session, tmp_path):
    """A zero-row corpus builds an empty but loadable index."""
    import pyarrow as pa_
    import pyarrow.parquet as pq_

    src = tmp_path / "empty_src"
    src.mkdir()
    pq_.write_table(
        pa_.table({
            "conv_id": pa_.array([], pa_.string()), "turn_idx": pa_.array([], pa_.int32()),
            "role": pa_.array([], pa_.string()), "text": pa_.array([], pa_.string()),
            "tool": pa_.array([], pa_.string()), "ts": pa_.array([], pa_.timestamp("us")),
        }),
        str(src / "part-0.parquet"),
    )
    idx = str(tmp_path / "empty_idx")
    meta = build_index(str(src), idx, IndexConfig(), n_partitions=2)
    assert meta["N"] == 0
    li = LocalIndex(idx)
    ids, scores = li.search("anything", 10, mode="OR")
    assert len(ids) == 0 and len(scores) == 0


def test_dl_stream_matches_doc_stats(built):
    """Per-posting doclen stream (format v3) must agree with the docs
    store for every posting."""
    index_dir, _, _, _ = built
    li = LocalIndex(index_dir)
    for term, ts in list(li.terms.items())[:50]:
        ids, tfs, dls = ts.decode()
        assert (dls == li.doclen[ids]).all(), term


def test_hot_term_build_and_query(ray_session, tmp_path):
    """A term present in EVERY turn (worst-case skew) still builds
    bounded merge groups and is queryable."""
    import pyarrow as pa_
    import pyarrow.parquet as pq_
    import numpy as np_

    n = 400
    texts = [f"hotword filler{i % 7} w{i % 50}" for i in range(n)]
    src = tmp_path / "hot_src"
    src.mkdir()
    pq_.write_table(
        pa_.table({
            "conv_id": pa_.array([f"conv-{i:08d}" for i in range(n)], pa_.string()),
            "turn_idx": pa_.array(np_.zeros(n, dtype="int32"), pa_.int32()),
            "role": pa_.array(["user"] * n, pa_.string()),
            "text": pa_.array(texts, pa_.string()),
            "tool": pa_.array([""] * n, pa_.string()),
            "ts": pa_.array(np_.zeros(n, dtype="datetime64[us]"), pa_.timestamp("us")),
        }),
        str(src / "part-0.parquet"),
    )
    cfg = IndexConfig(doc_bucket_size=64, stemming=False)  # force many buckets
    idx = str(tmp_path / "hot_idx")
    build_index(str(src), idx, cfg, n_partitions=2)
    li = LocalIndex(idx)
    ids, tfs = li.term_postings("hotword")
    assert len(ids) == n
    # every segment is bounded by the bucket capacity
    ts = li.terms["hotword"]
    assert max(ts.seg_df) <= 64
    top, scores = li.search("hotword filler3", 10, mode="AND")
    assert len(top) == 10


def test_null_role_tool_text_not_dropped(ray_session, tmp_path):
    """A tool=null / role=null / text=null turn must still be indexed
    (binary_join_element_wise would otherwise null the whole row and
    silently drop the doc from the index) and a null prior must be 0."""
    import pyarrow as pa_

    src = tmp_path / "null_src"
    src.mkdir()
    rows = {
        "conv_id": pa_.array([f"c-{i:04d}" for i in range(4)], pa_.string()),
        "turn_idx": pa_.array([0, 0, 0, 0], pa_.int32()),
        "role": pa_.array(["user", None, "user", "user"], pa_.string()),
        "text": pa_.array(["alpha beta", "alpha gamma", None, "alpha delta"], pa_.string()),
        "tool": pa_.array([None, "bash", "bash", "bash"], pa_.string()),
        "ts": pa_.array(np.zeros(4, dtype="datetime64[us]"), pa_.timestamp("us")),
    }
    pq.write_table(pa_.table(rows), str(src / "part-0.parquet"))
    cfg = IndexConfig(stemming=False, index_role_tool=True, store_prior=True)
    idx = str(tmp_path / "null_idx")
    build_index(str(src), idx, cfg, n_partitions=1)
    li = LocalIndex(idx)
    # 'alpha' appears in rows 0, 1, 3 (row 2 has null text but its
    # role/tool tokens still index); each null-field row is present
    ids, _ = li.term_postings("alpha")
    assert len(ids) == 3
    ids_bash, _ = li.term_postings("bash")
    assert len(ids_bash) == 3  # rows 1, 2, 3
    # null text -> prior 0, not a crash
    ts = li.terms["bash"]
    assert int(ts.decode_priors().min()) == 0


def test_null_keys_force_sort_fallback(ray_session, tmp_path):
    """Null (conv_id, turn_idx) keys must disqualify the prefix-sum
    fast path (pc.all skips null comparisons, so a misordered file
    would otherwise read as sorted)."""
    import pyarrow as pa_

    from search_engine_ray.stages.doc_ids import assign_doc_ids_files

    f = tmp_path / "nullkeys.parquet"
    pq.write_table(
        pa_.table(
            {
                "conv_id": pa_.array(["b", None, "a"], pa_.string()),
                "turn_idx": pa_.array([1, 0, 1], pa_.int32()),
                "role": pa_.array(["user"] * 3, pa_.string()),
                "text": pa_.array(["x", "y", "z"], pa_.string()),
                "tool": pa_.array([""] * 3, pa_.string()),
                "ts": pa_.array(np.zeros(3, dtype="datetime64[us]"), pa_.timestamp("us")),
            }
        ),
        str(f),
    )
    assert assign_doc_ids_files([str(f)]) is None


def test_extend_with_empty_source_is_noop(ray_session, tmp_path):
    """An all-empty extension must not poison docs/ with schema-less
    sorted blocks (same guard build_index's stage A has)."""
    import glob as glob_

    import pyarrow as pa_

    from search_engine_ray.pipelines.build_index import extend_index

    src = str(tmp_path / "base")
    write_transcripts(src, n_convs=20, turns_per_conv=3, seed=7, n_files=2)
    idx = str(tmp_path / "ext_idx")
    cfg = IndexConfig(stemming=False)
    meta = build_index(src, idx, cfg, n_partitions=2)
    empty = tmp_path / "empty.parquet"
    schema = pq.read_schema(sorted(glob_.glob(f"{src}/*.parquet"))[0])
    pq.write_table(schema.empty_table(), str(empty))
    before = sorted(glob_.glob(f"{idx}/docs/*.parquet"))
    extend_index(idx, str(empty), n_partitions=2)
    after = sorted(glob_.glob(f"{idx}/docs/*.parquet"))
    assert before == after  # no ext files appeared
    li = LocalIndex(idx)
    assert li.N == meta["N"]
