"""Prefix autocomplete: functions/suggest.py, the /suggest HTTP route,
and the suggest_prefix gate op's tie-break contract."""

import json
import urllib.error
import urllib.request

import numpy as np
import pytest

from search_engine_ray.functions.suggest import PrefixSuggester

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    from search_engine_ray.config import IndexConfig
    from search_engine_ray.corpus import write_transcripts
    from search_engine_ray.pipelines.build_index import build_index

    root = tmp_path_factory.mktemp("suggest")
    src = str(root / "transcripts")
    write_transcripts(src, n_convs=80, turns_per_conv=5, seed=7, n_files=2)
    d = str(root / "index")
    build_index(src, d, IndexConfig(doc_bucket_size=512), n_partitions=2)
    return d


def test_suggester_range_and_tiebreak():
    terms = ["scan", "sort", "stream", "sorted", "query", "quack", "s"]
    dfs = [50, 80, 80, 10, 99, 99, 1]
    s = PrefixSuggester(terms, dfs)
    # df desc, then term asc on ties
    assert s.suggest("s", k=3) == [("sort", 80), ("stream", 80), ("scan", 50)]
    assert s.suggest("sort", k=10) == [("sort", 80), ("sorted", 10)]
    # ties break lexicographically
    assert s.suggest("qu") == [("quack", 99), ("query", 99)]
    # normalization + misses
    assert s.suggest("  SOR  ") == [("sort", 80), ("sorted", 10)]
    assert s.suggest("zz") == []
    assert s.suggest("") == []
    assert s.suggest("   ") == []
    assert s.suggest("s", k=0) == []


def test_suggester_max_terms_keeps_high_df():
    terms = [f"t{i:03d}" for i in range(100)]
    dfs = list(range(100))
    s = PrefixSuggester(terms, dfs, max_terms=10)
    got = s.suggest("t", k=100)
    assert len(got) == 10
    assert got[0] == ("t099", 99)  # highest-df tail survives the cap
    assert all(d >= 90 for _, d in got)


def test_suggester_from_index_matches_dictionary(index_dir):
    """from_index must agree with a brute-force scan of the dictionary
    parquet for every probe prefix."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(index_dir, "dictionary",
                                          "*.parquet")))
    t = pq.read_table(files, columns=["term", "df"])
    terms = t["term"].to_numpy(zero_copy_only=False)
    dfs = t["df"].to_numpy()
    s = PrefixSuggester.from_index(index_dir)
    for prefix in ("r", "s", "me", "the", "zzz"):
        m = np.array([str(x).startswith(prefix) for x in terms])
        want = sorted(
            zip(terms[m], dfs[m]), key=lambda td: (-td[1], td[0])
        )[:5]
        assert s.suggest(prefix, k=5) == [(str(a), int(b)) for a, b in want]


def test_http_suggest_route(index_dir):
    from search_engine_ray.pipelines.search import DocShardedSearcher
    from search_engine_ray.serve import SearchServer

    srv = SearchServer(index_dir,
                       DocShardedSearcher(index_dir, n_shards=2)).start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/suggest?q=r&k=5"
        ) as resp:
            assert resp.status == 200
            payload = json.loads(resp.read())
        want = srv.suggester.suggest("r", k=5)
        assert payload["q"] == "r"
        assert [(r["term"], r["df"]) for r in payload["suggestions"]] == want
        assert len(payload["suggestions"]) >= 1

        # missing q -> 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/suggest")
        assert ei.value.code == 400
        # bad k -> 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/suggest?q=r&k=zero"
            )
        assert ei.value.code == 400
    finally:
        srv.stop()


def test_http_stats_route(index_dir):
    from search_engine_ray.pipelines.search import DocShardedSearcher
    from search_engine_ray.serve import SearchServer

    srv = SearchServer(index_dir,
                       DocShardedSearcher(index_dir, n_shards=2)).start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/stats"
        ) as resp:
            assert resp.status == 200
            payload = json.loads(resp.read())
        assert payload["N"] == 400  # 80 convs x 5 turns
        assert payload["avgdl"] > 0
        assert payload["vocab_terms"] > 0
        assert payload["n_shards"] == 2 and payload["n_replicas"] == 1
        assert payload["spellcheck"] and payload["suggest"]
        assert payload["ann"] is None
        assert all(payload["bytes"][s] > 0
                   for s in ("segments", "docs", "dictionary"))
    finally:
        srv.stop()


def test_suggest_prefix_op_matches_oracle(ray_session, sf_dir=SF_DIR):
    """The batch gate op reproduces its DuckDB oracle bit-for-bit
    (tools_verify runs the same comparison over the full gate; this
    pins it in the suite for the smallest sf)."""
    import duckdb

    from search_engine_ray.ops.text_ops import (
        SQL_SUGGEST_PREFIX, suggest_prefix,
    )

    got = (
        suggest_prefix(sf_dir).to_pandas()
        .sort_values(["prefix", "rank"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = (
        con.execute(SQL_SUGGEST_PREFIX).df()
        .sort_values(["prefix", "rank"]).reset_index(drop=True)
    )
    assert list(got.columns) == ["prefix", "term", "df", "rank"]
    assert got[["prefix", "term"]].values.tolist() == \
        want[["prefix", "term"]].values.tolist()
    assert got["df"].astype("int64").tolist() == \
        want["df"].astype("int64").tolist()
    assert got["rank"].astype("int64").tolist() == \
        want["rank"].astype("int64").tolist()
    # every prefix's block is correctly ranked 1..n
    for _, blk in got.groupby("prefix"):
        assert blk["rank"].tolist() == list(range(1, len(blk) + 1))


def test_suggest_next_handcrafted(ray_session, tmp_path):
    """Next-word top-k: counts from adjacent bigrams, tie-break word
    asc; probes absent from the corpus yield no rows."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from search_engine_ray.ops.text_ops import suggest_next

    texts = [
        "hash join hash join hash scan",   # hash->join x2, hash->scan x1
        "hash aggregate",                  # hash->aggregate x1
        "sort merge",                      # sort->merge
    ]
    n = len(texts)
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["t"] * n),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    t = suggest_next(str(tmp_path)).to_pandas()
    h = t[t["w1"] == "hash"]
    assert h["w2"].tolist() == ["join", "aggregate", "scan"]
    assert h["c"].tolist() == [2, 1, 1]  # tie 1-1 broken word-asc
    s = t[t["w1"] == "sort"]
    assert s["w2"].tolist() == ["merge"]
    assert "data" not in set(t["w1"])  # absent probe -> no rows
