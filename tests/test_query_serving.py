"""Sharded-actor and batch query paths vs LocalIndex vs oracle."""

import numpy as np
import pytest
import ray.data

from search_engine_ray.config import IndexConfig
from search_engine_ray.corpus import make_queries, write_transcripts
from search_engine_ray.pipelines.build_index import build_index
from search_engine_ray.pipelines.search import (
    ShardedSearcher,
    evaluate_queries,
    materialize_results,
)
from search_engine_ray.stages.query import LocalIndex


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    src = str(root / "transcripts")
    write_transcripts(src, n_convs=100, turns_per_conv=5, seed=42, n_files=4)
    d = str(root / "index")
    build_index(src, d, IndexConfig(doc_bucket_size=512), n_partitions=2)
    return d


def test_sharded_matches_local(index_dir):
    local = LocalIndex(index_dir)
    sharded = ShardedSearcher(index_dir, n_shards=3)
    for mode in ("AND", "OR"):
        for q in ["running meetings", "the", "Ray Data engine", "zzznope", "the of and"]:
            a_ids, a_sc = local.search(q, 50, mode=mode)
            b_ids, b_sc = sharded.search(q, 50, mode=mode)
            assert a_ids.tolist() == b_ids.tolist(), (q, mode)
            np.testing.assert_array_equal(a_sc, b_sc)


def test_batch_evaluation(index_dir):
    local = LocalIndex(index_dir)
    queries = make_queries(12)
    ds = ray.data.from_pandas(queries)
    out = evaluate_queries(ds, index_dir, mode="AND", concurrency=(1, 2)).to_pandas()
    for _, row in queries.iterrows():
        ids, sc = local.search(row["query"], int(row["k"]), mode="AND")
        got = out[out["query_id"] == row["query_id"]].sort_values("rank")
        assert got["doc_id"].tolist() == ids.tolist(), row["query"]
        np.testing.assert_array_equal(got["score"].to_numpy(), sc)


def test_materialize_results(index_dir):
    local = LocalIndex(index_dir)
    df = local.search_df("running", 10)
    df["query_id"] = 0
    out = materialize_results(index_dir, df)
    assert {"rank", "doc_id", "conv_id", "turn_idx", "score", "snippet"} <= set(out.columns)
    assert len(out) == len(df)
    assert out["conv_id"].notna().all()


def test_phrase_search(ray_session, tmp_path):
    """Exact-phrase matching via stored position blocks."""
    import pyarrow as pa_
    import pyarrow.parquet as pq_
    import numpy as np_

    from search_engine_ray.config import IndexConfig
    from search_engine_ray.pipelines.build_index import build_index
    from search_engine_ray.stages.query import LocalIndex

    texts = [
        "the quick brown fox",            # 0: phrase present
        "quick the brown fox",            # 1: tokens present, wrong order
        "the quick, brown fox",           # 2: punctuation run still adjacent
        "the quick brown dog",            # 3: prefix only
        "say the quick brown fox again",  # 4: phrase mid-text
        "the quick http brown fox",       # 5: skip-word breaks adjacency
    ]
    src = tmp_path / "phrase_src"
    src.mkdir()
    n = len(texts)
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
    idx = str(tmp_path / "phrase_idx")
    build_index(str(src), idx, IndexConfig(stemming=False), n_partitions=1)
    li = LocalIndex(idx, load_positions=True)
    ids, scores = li.phrase_search("the quick brown fox")
    assert ids.tolist() == sorted([0, 2, 4]) or set(ids.tolist()) == {0, 2, 4}
    assert len(scores) == 3
    ids2, _retry = li.phrase_search("quick brown dog")
    assert ids2.tolist() == [3]
    ids3, _x = li.phrase_search("brown fox the")
    assert ids3.tolist() == []
    # phrase containing a skip-listed token cannot be verified
    ids4, _y = li.phrase_search("quick http brown")
    assert ids4.tolist() == []


def test_exclusion_queries(index_dir):
    """'-term' exclusion semantics: 'a -b' equals the full 'a' ranking
    minus every doc containing an analyzed 'b' term, with survivors'
    scores unchanged; exclusion-only and all-excluded queries return
    empty; the result cache keys on the raw query string so repeat
    exclusion queries hit bit-identically; hyphens inside words stay
    ordinary tokens."""
    local = LocalIndex(index_dir)
    full_ids, full_sc = local.search("running", 10**9, mode="OR")
    ex_ids, ex_sc = local.search("running -meetings", 10**9, mode="OR")
    meet_ids, _m = local.search("meetings", 10**9, mode="OR")
    banned = set(meet_ids.tolist())
    assert banned, "fixture corpus must contain 'meetings'"
    # exactly the unexcluded survivors, scores unchanged
    keep = [i for i, d in enumerate(full_ids.tolist()) if d not in banned]
    assert ex_ids.tolist() == [full_ids[i] for i in keep]
    assert ex_sc.tolist() == [full_sc[i] for i in keep]
    assert set(ex_ids.tolist()).isdisjoint(banned)
    assert len(ex_ids) < len(full_ids)

    # multiple exclusions = union of banned docs
    two_ids, _t = local.search("running -meetings -ponies", 10**9, mode="OR")
    pony_ids, _p = local.search("ponies", 10**9, mode="OR")
    assert set(two_ids.tolist()) == (
        set(full_ids.tolist()) - banned - set(pony_ids.tolist())
    )

    # degenerate shapes
    assert local.search("-running", 50)[0].size == 0  # exclusion-only
    assert local.search("running -running", 50)[0].size == 0
    # a lone '-' is ignored, not an exclusion
    ids_dash, _d = local.search("running -", 50, mode="OR")
    ids_plain, _q = local.search("running", 50, mode="OR")
    assert ids_dash.tolist() == ids_plain.tolist()
    # in-word hyphens split to ordinary OR terms, nothing excluded
    ids_hy, _h = local.search("running-meetings", 10**9, mode="OR")
    assert set(ids_hy.tolist()) >= banned

    # result-cache hit is bit-identical to the cold computation
    c1_ids, c1_sc = local.search("running -meetings", 50, mode="OR")
    c2_ids, c2_sc = local.search("running -meetings", 50, mode="OR")
    assert c1_ids.tolist() == c2_ids.tolist()
    assert c1_sc.tolist() == c2_sc.tolist()
    assert c1_ids.tolist() == ex_ids[:50].tolist()

    # explain surfaces the exclusion terms
    exp = local.explain("running -meetings", mode="OR")
    assert [e["term"] for e in exp["excluded_terms"]] and all(
        e["df"] >= 0 for e in exp["excluded_terms"]
    )


def test_exclusion_sharded_bit_identical(index_dir):
    """Exclusions are shard-local (each doc-range shard drops its own
    slice of the excluded ids), so the sharded tier must equal
    LocalIndex bitwise with no driver coordination."""
    from search_engine_ray.pipelines.search import DocShardedSearcher

    local = LocalIndex(index_dir)
    sharded = DocShardedSearcher(index_dir, n_shards=3)
    try:
        for q in ["running -meetings", "the of -and", "runs -w0017",
                  "-running", "running -zzznope"]:
            for mode in ("OR", "AND"):
                ids_l, sc_l = local.search(q, 50, mode=mode)
                ids_s, sc_s = sharded.search(q, 50, mode=mode)
                assert ids_l.tolist() == ids_s.tolist(), (q, mode)
                assert sc_l.tolist() == sc_s.tolist(), (q, mode)
    finally:
        sharded.close()


def test_facet_counts_local_and_sharded(index_dir):
    """Facet histogram: per-facet counts over the FULL match set equal
    a brute-force intersection of the query's candidate ids with the
    facet's postings; sharded partial counts sum exactly to the local
    numbers (doc ranges partition the corpus)."""
    from search_engine_ray.pipelines.search import DocShardedSearcher

    local = LocalIndex(index_dir)
    facets = ["running", "meetings", "zzznope", "running meetings"]
    fc = local.facet_counts("the", facets, mode="OR")
    ids, _s = local.search("the", 10**9, mode="OR")
    cand = set(ids.tolist())
    run_ids, _r = local.search("running", 10**9, mode="OR")
    meet_ids, _m = local.search("meetings", 10**9, mode="OR")
    assert fc["running"] == len(cand & set(run_ids.tolist()))
    assert fc["meetings"] == len(cand & set(meet_ids.tolist()))
    assert fc["zzznope"] == 0
    # multi-word label counts docs containing ANY of its terms
    assert fc["running meetings"] == len(
        cand & (set(run_ids.tolist()) | set(meet_ids.tolist()))
    )
    # no-match query -> all-zero histogram
    assert set(local.facet_counts("zzznope", facets).values()) == {0}

    sharded = DocShardedSearcher(index_dir, n_shards=3)
    try:
        assert sharded.facet_counts("the", facets, mode="OR") == fc
    finally:
        sharded.close()


def test_http_facets_route(index_dir):
    import json as json_
    import urllib.error
    import urllib.request

    from search_engine_ray.pipelines.search import DocShardedSearcher
    from search_engine_ray.serve import SearchServer

    local = LocalIndex(index_dir)
    srv = SearchServer(index_dir,
                       DocShardedSearcher(index_dir, n_shards=2)).start()
    try:
        url = (f"http://127.0.0.1:{srv.port}/facets"
               f"?query=the&facets=running,meetings&mode=OR")
        with urllib.request.urlopen(url) as resp:
            assert resp.status == 200
            payload = json_.loads(resp.read())
        want = local.facet_counts("the", ["running", "meetings"], mode="OR")
        assert payload["facets"] == want
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/facets?query=the"
            )
        assert ei.value.code == 400
    finally:
        srv.stop()


def test_doc_sharded_matches_local(index_dir):
    """Doc-range-sharded scatter-gather must equal unsharded
    evaluation exactly (global stats; deterministic merge)."""
    from search_engine_ray.pipelines.search import DocShardedSearcher

    local = LocalIndex(index_dir)
    sharded = DocShardedSearcher(index_dir, n_shards=2)
    for q in ["running meetings", "the of and", "caresses ponies ties", "w0017 runs", "zzznope"]:
        for mode in ("OR", "AND"):
            ids_l, sc_l = local.search(q, 50, mode=mode)
            ids_s, sc_s = sharded.search(q, 50, mode=mode)
            assert ids_l.tolist() == ids_s.tolist(), (q, mode)
            # bitwise: every scoring path re-accumulates per-doc sums
            # in the fixed analyzer term order, so no ulp slop needed
            assert sc_l.tolist() == sc_s.tolist(), (q, mode)


def test_doc_sharded_replicas_bit_identical(index_dir):
    """Replicated shard sets (the QPS lever) must return bit-identical
    results no matter which replica the round-robin lands on, and a
    refresh must swap every replica set."""
    from search_engine_ray.pipelines.search import DocShardedSearcher

    local = LocalIndex(index_dir)
    sharded = DocShardedSearcher(index_dir, n_shards=2, n_replicas=3)
    try:
        assert len(sharded._replica_sets) == 3
        for q in ["running meetings", "the of and", "w0017 runs"]:
            for rep in range(6):  # cycles every replica twice
                ids_l, sc_l = local.search(q, 50, mode="OR")
                ids_s, sc_s = sharded.search(q, 50, mode="OR")
                assert ids_l.tolist() == ids_s.tolist(), (q, rep)
                assert sc_l.tolist() == sc_s.tolist(), (q, rep)
        old_ids = {id(a) for rs in sharded._replica_sets for a in rs}
        sharded.refresh()
        assert len(sharded._replica_sets) == 3
        new_ids = {id(a) for rs in sharded._replica_sets for a in rs}
        assert not (old_ids & new_ids)  # full blue-green swap
        ids_l, _sc = local.search("running meetings", 50, mode="OR")
        for rep in range(3):
            ids_s, _s2 = sharded.search("running meetings", 50, mode="OR")
            assert ids_l.tolist() == ids_s.tolist()
    finally:
        sharded.close()


def test_http_search_endpoint(index_dir):
    """GET /search returns the same top-k as LocalIndex, with snippets
    (reference parity: Search.java:198's routed JSON endpoint)."""
    import json as json_
    import urllib.request

    from search_engine_ray.pipelines.search import DocShardedSearcher
    from search_engine_ray.serve import SearchServer

    local = LocalIndex(index_dir)
    srv = SearchServer(index_dir, DocShardedSearcher(index_dir, n_shards=2)).start()
    try:
        for q in ["hash join", "the of and", "running caresses"]:
            url = f"http://127.0.0.1:{srv.port}/search?query={q.replace(' ', '+')}&k=10&mode=OR"
            with urllib.request.urlopen(url) as resp:
                assert resp.status == 200
                assert resp.headers["Access-Control-Allow-Origin"] == "*"
                payload = json_.loads(resp.read())
            ids, scores = local.search(q, k=10, mode="OR")
            got_ids = [r["doc_id"] for r in payload["results"]]
            got_scores = [r["score"] for r in payload["results"]]
            assert got_ids == ids.tolist()
            assert np.allclose(got_scores, scores)
            for r in payload["results"]:
                assert "snippet" in r and "conv_id" in r and "turn_idx" in r
                assert r["rank"] >= 1
        # error + health routes
        with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/healthz") as resp:
            assert json_.loads(resp.read()) == {"ok": True}
        import urllib.error
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/search")
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.stop()


def test_search_many_matches_sequential(index_dir):
    from search_engine_ray.pipelines.search import DocShardedSearcher

    sharded = DocShardedSearcher(index_dir, n_shards=2)
    queries = [("running meetings", 20), ("the of and", 10), ("caresses ponies", 15)]
    batch = sharded.search_many(queries, mode="OR")
    for (q, k), (ids_b, sc_b) in zip(queries, batch):
        ids_s, sc_s = sharded.search(q, k, mode="OR")
        assert ids_b.tolist() == ids_s.tolist(), q
        assert np.allclose(sc_b, sc_s)


def test_doc_sharded_refresh_after_extend(ray_session, tmp_path):
    """build -> serve -> extend -> refresh: the serving tier picks up
    appended docs without restart and stays rank-identical to a fresh
    LocalIndex over the extended index."""
    from search_engine_ray.config import IndexConfig
    from search_engine_ray.corpus import write_transcripts
    from search_engine_ray.pipelines.build_index import build_index, extend_index
    from search_engine_ray.pipelines.search import DocShardedSearcher

    base = str(tmp_path / "base")
    write_transcripts(base, n_convs=40, turns_per_conv=5, seed=42, n_files=2)
    idx = str(tmp_path / "idx")
    build_index(base, idx, IndexConfig(doc_bucket_size=512), n_partitions=2)

    sharded = DocShardedSearcher(idx, n_shards=2)
    before_ids, _ = sharded.search("hash join", k=30, mode="OR")

    # extension: later conv ids (append-only key order)
    ext = str(tmp_path / "ext")
    write_transcripts(ext, n_convs=20, turns_per_conv=5, seed=99, n_files=1)
    import glob as g
    import pyarrow.parquet as pq
    import pyarrow.compute as pc_
    import pyarrow as pa_
    fixed = str(tmp_path / "ext_fixed")
    import os as os_
    os_.makedirs(fixed)
    for f in sorted(g.glob(ext + "/*.parquet")):
        t = pq.read_table(f)
        conv = pc_.replace_substring(t["conv_id"], "conv-000000", "conv-990000")
        t = t.set_column(t.schema.get_field_index("conv_id"), "conv_id", conv)
        pq.write_table(t, fixed + "/" + os_.path.basename(f))
    extend_index(idx, fixed, n_partitions=1)

    assert sharded.refresh()
    after_ids, after_sc = sharded.search("hash join", k=30, mode="OR")
    fresh = LocalIndex(idx)
    want_ids, want_sc = fresh.search("hash join", k=30, mode="OR")
    assert after_ids.tolist() == want_ids.tolist()
    assert np.allclose(after_sc, want_sc)
    # the extension actually changed the result set vs before
    assert fresh.N > 200


def test_doc_filter_pushdown_no_full_ranking(index_dir, monkeypatch):
    """Faceted search must mask postings per term BEFORE accumulation —
    never fall back to ranking the full corpus (the old path recursed
    with k=10**9). Results must still equal post-filtering a full
    unfiltered ranking."""
    li = LocalIndex(index_dir)
    even = lambda ids: ids % 2 == 0

    seen_ks = []
    orig = LocalIndex.search

    def spy(self, query, k=20, mode="AND", doc_filter=None):
        seen_ks.append(k)
        return orig(self, query, k=k, mode=mode, doc_filter=doc_filter)

    monkeypatch.setattr(LocalIndex, "search", spy)
    for mode in ("OR", "AND"):
        seen_ks.clear()
        got_ids, got_sc = li.search("running meetings", k=15, mode=mode, doc_filter=even)
        assert seen_ks == [15], "doc_filter recursed into a full ranking"
        full_ids, full_sc = orig(li, "running meetings", k=10**9, mode=mode)
        keep = even(full_ids)
        want_ids, want_sc = full_ids[keep], full_sc[keep]
        from search_engine_ray.functions import scoring
        idx = scoring.topk_indices(want_sc, want_ids, 15)
        assert got_ids.tolist() == want_ids[idx].tolist()
        assert np.allclose(got_sc, want_sc[idx])
        assert (got_ids % 2 == 0).all()


def test_doc_sharded_refresh_after_shrink(ray_session, tmp_path):
    """compact_index below the serving group count must TRUNCATE the
    actor list on refresh: a surplus actor left serving its stale
    pre-compaction doc range would return duplicate doc_ids."""
    from search_engine_ray.config import IndexConfig
    from search_engine_ray.corpus import write_transcripts
    from search_engine_ray.pipelines.build_index import build_index, compact_index
    from search_engine_ray.pipelines.search import DocShardedSearcher

    base = str(tmp_path / "base")
    write_transcripts(base, n_convs=40, turns_per_conv=5, seed=42, n_files=2)
    idx = str(tmp_path / "idx")
    build_index(base, idx, IndexConfig(doc_bucket_size=512), n_partitions=4)

    sharded = DocShardedSearcher(idx, n_shards=4)
    assert len(sharded.shards) >= 2  # small corpus may yield < 4 parts
    compact_index(idx, n_partitions=1)
    assert sharded.refresh()
    assert len(sharded.shards) == 1

    ids, sc = sharded.search("hash join", k=100, mode="OR")
    assert len(ids) == len(set(ids.tolist())), "duplicate doc_ids from a stale shard"
    fresh = LocalIndex(idx)
    want_ids, want_sc = fresh.search("hash join", k=100, mode="OR")
    assert ids.tolist() == want_ids.tolist()
    assert np.allclose(sc, want_sc)


def test_doc_shard_actor_self_heals(index_dir):
    """Killing a shard actor mid-serving must not break the tier: the
    actor restarts from the checkpointed index (constructor args are
    plain values + on-disk df broadcast) and the retried query returns
    identical results."""
    import ray as ray_

    from search_engine_ray.pipelines.search import DocShardedSearcher

    local = LocalIndex(index_dir)
    sharded = DocShardedSearcher(index_dir, n_shards=2)
    want_ids, want_sc = local.search("running meetings", 20, mode="OR")
    ids0, _ = sharded.search("running meetings", 20, mode="OR")
    assert ids0.tolist() == want_ids.tolist()

    ray_.kill(sharded.shards[0], no_restart=False)
    ids1, sc1 = sharded.search("running meetings", 20, mode="OR")
    assert ids1.tolist() == want_ids.tolist()
    assert np.allclose(sc1, want_sc)


def test_doc_shard_restart_after_refresh_uses_current_layout(ray_session, tmp_path):
    """A Ray actor restart re-runs __init__ with the ORIGINAL args — so
    a shard killed AFTER a refresh() must come back with the refreshed
    layout (read from its layout file), not the constructor-time one.
    Scenario: compact to 1 partition, refresh, kill the surviving
    actor; its restart must serve the post-compaction layout."""
    import ray as ray_

    from search_engine_ray.config import IndexConfig
    from search_engine_ray.corpus import write_transcripts
    from search_engine_ray.pipelines.build_index import build_index, compact_index
    from search_engine_ray.pipelines.search import DocShardedSearcher

    base = str(tmp_path / "base")
    write_transcripts(base, n_convs=40, turns_per_conv=5, seed=42, n_files=2)
    idx = str(tmp_path / "idx")
    build_index(base, idx, IndexConfig(doc_bucket_size=512), n_partitions=4)

    sharded = DocShardedSearcher(idx, n_shards=4)
    compact_index(idx, n_partitions=1)
    assert sharded.refresh()
    assert len(sharded.shards) == 1

    ray_.kill(sharded.shards[0], no_restart=False)
    ids, sc = sharded.search("hash join", k=50, mode="OR")
    fresh = LocalIndex(idx)
    want_ids, want_sc = fresh.search("hash join", k=50, mode="OR")
    assert ids.tolist() == want_ids.tolist()
    assert np.allclose(sc, want_sc)


def test_refresh_preserves_old_generation_layout(ray_session, tmp_path):
    """refresh() must write the NEW layout into a new generation dir and
    leave the retired generation's files intact: a retired actor that
    crashes while an in-flight query still holds it restarts from its
    ORIGINAL layout file, which must therefore still describe the OLD
    partition grouping (not be overwritten with the new one). The
    generation is reclaimed only after its actors are killed (next
    refresh)."""
    import glob
    import json
    import os

    from search_engine_ray.config import IndexConfig
    from search_engine_ray.corpus import write_transcripts
    from search_engine_ray.pipelines.build_index import build_index, compact_index
    from search_engine_ray.pipelines.search import DocShardedSearcher

    base = str(tmp_path / "base")
    write_transcripts(base, n_convs=40, turns_per_conv=5, seed=7, n_files=2)
    idx = str(tmp_path / "idx")
    build_index(base, idx, IndexConfig(doc_bucket_size=512), n_partitions=4)

    sharded = DocShardedSearcher(idx, n_shards=4)
    gen0 = sorted(glob.glob(os.path.join(sharded._layout_dir, "gen-0", "*.json")))
    old_parts = [json.load(open(p))["parts"] for p in gen0]
    assert len(gen0) >= 2  # multiple shard files before compaction

    compact_index(idx, n_partitions=1)
    assert sharded.refresh()
    # old generation untouched, new generation present and different
    assert [json.load(open(p))["parts"] for p in gen0] == old_parts
    gen1 = sorted(glob.glob(os.path.join(sharded._layout_dir, "gen-1", "*.json")))
    assert len(gen1) == 1  # post-compaction grouping: 4 shard files -> 1
    assert json.load(open(gen1[0]))["parts"] == [0]

    # a second refresh within the grace period KEEPS gen-0 (an
    # in-flight batch snapshot may still be using its actors); once the
    # grace expires the reaper kills the generation and reclaims its
    # layout dir — memory is bounded without racing live queries
    assert sharded.refresh()
    assert os.path.exists(os.path.join(sharded._layout_dir, "gen-0"))
    assert len(sharded._retired) == 2
    sharded._retired = [(ts - 10_000, a, g) for ts, a, g in sharded._retired]
    sharded._reap_retired()
    assert sharded._retired == []
    assert not os.path.exists(os.path.join(sharded._layout_dir, "gen-0"))
    assert not os.path.exists(os.path.join(sharded._layout_dir, "gen-1"))
    assert os.path.exists(os.path.join(sharded._layout_dir, "gen-2"))
    sharded.close()


def test_http_frontend_page(index_dir):
    import urllib.request

    from search_engine_ray.serve import SearchServer

    local = LocalIndex(index_dir)

    class LocalSearcher:
        def search(self, q, k, mode):
            return local.search(q, k, mode=mode)

    srv = SearchServer(index_dir, LocalSearcher(), spellcheck=False).start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/") as resp:
            assert resp.status == 200
            body = resp.read().decode()
        assert "<form" in body and "/search?query=" in body
    finally:
        srv.stop()


def test_http_batch_endpoint(index_dir):
    import json as json_
    import urllib.request

    from search_engine_ray.pipelines.search import DocShardedSearcher
    from search_engine_ray.serve import SearchServer

    local = LocalIndex(index_dir)
    srv = SearchServer(index_dir, DocShardedSearcher(index_dir, n_shards=2),
                       spellcheck=False).start()
    try:
        body = json_.dumps({
            "queries": [{"query": "running meetings", "k": 5},
                        {"query": "the of and", "k": 3}],
            "mode": "OR",
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/batch", data=body,
            headers={"Content-Type": "application/json"}, method="POST",
        )
        with urllib.request.urlopen(req) as resp:
            payload = json_.loads(resp.read())
        assert len(payload["batches"]) == 2
        for b in payload["batches"]:
            want_ids, _ = local.search(b["query"], k=5 if "running" in b["query"] else 3, mode="OR")
            assert [r["doc_id"] for r in b["results"]] == want_ids.tolist()

        # non-positive k in ANY batch element -> clean 400 (same
        # contract as GET /search), not a 500 from topk on empty
        import urllib.error

        for bad_body in (
            {"queries": [{"query": "x", "k": 0}]},
            {"queries": [{"query": "x", "k": -3}]},
            {"queries": [{"query": 42, "k": 5}]},  # non-string query
        ):
            bad = json_.dumps(bad_body).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/batch", data=bad,
                headers={"Content-Type": "application/json"}, method="POST",
            )
            try:
                urllib.request.urlopen(req)
                raise AssertionError(f"{bad_body} should 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400, (bad_body, e.code)
    finally:
        srv.stop()


def test_explain(index_dir):
    li = LocalIndex(index_dir)
    ex = li.explain("running meetings", mode="OR")
    assert ex["strategy"] in ("maxscore", "dense-accumulate")
    assert all(t["df"] >= 0 for t in ex["terms"])
    present = [t for t in ex["terms"] if t["df"]]
    assert present and all("upper_bound" in t for t in present)
    assert li.explain("zzznope", mode="OR")["strategy"] == "empty"
    assert li.explain("running", mode="OR")["strategy"] == "single-term-fast-path"
    assert li.explain("running meetings", mode="AND")["strategy"] == "and-range-skip"


def test_http_explain_endpoint(index_dir):
    import json as json_
    import urllib.request

    from search_engine_ray.pipelines.search import DocShardedSearcher
    from search_engine_ray.serve import SearchServer

    srv = SearchServer(index_dir, DocShardedSearcher(index_dir, n_shards=2),
                       spellcheck=False).start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/explain?query=running+meetings&mode=OR"
        ) as resp:
            payload = json_.loads(resp.read())
        assert payload["strategy"] in ("maxscore", "dense-accumulate")
        assert any(t["df"] > 0 for t in payload["terms"])
    finally:
        srv.stop()


def test_refresh_is_atomic_under_concurrent_queries(ray_session, tmp_path):
    """Blue-green refresh: queries racing repeated refresh() calls must
    never see a mixed layout (duplicate doc_ids), a missing doc range
    (wrong result set), or a killed actor (exception). Exercises the
    one-snapshot-per-call + retire-one-generation design."""
    import threading

    from search_engine_ray.config import IndexConfig
    from search_engine_ray.corpus import write_transcripts
    from search_engine_ray.pipelines.build_index import build_index, compact_index
    from search_engine_ray.pipelines.search import DocShardedSearcher

    base = str(tmp_path / "base")
    write_transcripts(base, n_convs=60, turns_per_conv=5, seed=42, n_files=2)
    idx = str(tmp_path / "idx")
    build_index(base, idx, IndexConfig(doc_bucket_size=512), n_partitions=4)
    want_ids, want_sc = LocalIndex(idx).search("hash join", k=100, mode="OR")

    sharded = DocShardedSearcher(idx, n_shards=4)
    errors: list = []
    stop = threading.Event()

    def hammer():
        try:
            while not stop.is_set():
                ids, sc = sharded.search("hash join", k=100, mode="OR")
                assert len(ids) == len(set(ids.tolist())), "duplicate doc_ids"
                assert ids.tolist() == want_ids.tolist(), "wrong result set"
        except Exception as ex:  # noqa: BLE001 - recorded for the main thread
            errors.append(ex)

    threads = [threading.Thread(target=hammer) for _ in range(3)]
    for t in threads:
        t.start()
    try:
        # alternate the on-disk layout between 2 and 4 partitions while
        # queries are in flight; every refresh is a full generation swap
        for parts in (2, 4, 2, 4):
            compact_index(idx, n_partitions=parts)
            assert sharded.refresh()
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=30)
    assert not errors, errors[:3]
    sharded.close()


def test_layout_sweep_is_liveness_based(index_dir):
    """The serving_layout sweep must remove dirs whose same-host owner
    pid is dead (leaked by SIGKILL'd servers) but NEVER a dir owned by
    a live pid — a long-lived searcher serving a static index does not
    rewrite its layouts, so age alone would misclassify it as dead and
    break its shard-actor restarts."""
    import json
    import os
    import socket

    from search_engine_ray.pipelines.search import DocShardedSearcher

    root = os.path.join(index_dir, "serving_layout")
    os.makedirs(root, exist_ok=True)

    def plant(name, pid):
        d = os.path.join(root, name)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "owner.json"), "w") as f:
            json.dump({"host": socket.gethostname(), "pid": pid}, f)
        # an old layout file, as a >24h-idle live searcher would have
        gen = os.path.join(d, "gen-0")
        os.makedirs(gen, exist_ok=True)
        path = os.path.join(gen, "shard-0.json")
        with open(path, "w") as f:
            json.dump({"parts": [0]}, f)
        os.utime(path, (1, 1))
        os.utime(d, (1, 1))
        return d

    # a pid that is certainly dead (max pid space exhausted below this)
    dead_dir = plant("deadbeef0001", 2**22 + 12345)
    live_dir = plant("cafebabe0002", os.getpid())

    s = DocShardedSearcher(index_dir, n_shards=2)
    try:
        assert not os.path.exists(dead_dir), "dead owner's dir must be swept"
        assert os.path.exists(live_dir), "live owner's dir must survive"
        assert os.path.exists(os.path.join(s._layout_dir, "owner.json"))
    finally:
        s.close()


def test_k_zero_and_negative_return_empty(index_dir):
    """k <= 0 must yield an empty result, not a numpy ValueError (the
    batch path feeds k straight from an unvalidated queries column) —
    and MaxScore / filtered / phrase paths all route through the guard."""
    local = LocalIndex(index_dir)
    for k in (0, -1):
        for mode in ("OR", "AND"):
            ids, sc = local.search("running meetings", k, mode=mode)
            assert ids.size == 0 and sc.size == 0
        ids, sc = local.search(
            "running meetings", k, mode="OR", doc_filter=lambda d: d % 2 == 0
        )
        assert ids.size == 0


def test_explain_and_with_missing_term_reports_empty(index_dir):
    """AND with any absent term short-circuits to an empty result in
    search(); explain() must say 'empty', not 'and-range-skip'."""
    local = LocalIndex(index_dir)
    e = local.explain("running zzznope", mode="AND")
    assert e["strategy"] == "empty"
    ids, _ = local.search("running zzznope", 10, mode="AND")
    assert ids.size == 0
    assert local.explain("running meetings", mode="AND")["strategy"] == "and-range-skip"


def test_phrase_without_positions_raises(index_dir):
    """A positions-less load must raise on phrase_search, never return
    a correct-looking empty no-match."""
    import pytest as _pytest

    local = LocalIndex(index_dir)  # load_positions defaults to False
    with _pytest.raises(ValueError, match="positions"):
        local.phrase_search("running meetings")


def test_maxscore_bitwise_matches_filtered_path(index_dir):
    """The MaxScore branch (upper_bounds set) and the doc_filter branch
    (no upper bounds) must produce bitwise-identical scores for the
    surviving docs — the 'filtered == post-filtered unfiltered'
    contract at full float64 precision."""
    local = LocalIndex(index_dir)
    for q in ["running meetings", "caresses ponies ties", "w0017 runs the"]:
        ids_u, sc_u = local.search(q, 10**9, mode="OR")
        ids_f, sc_f = local.search(q, 10**9, mode="OR", doc_filter=lambda d: d >= 0)
        assert ids_u.tolist() == ids_f.tolist(), q
        assert sc_u.tolist() == sc_f.tolist(), q


def test_http_rejects_bad_k_and_mode(index_dir):
    import json as _json
    import urllib.request
    import urllib.error

    from search_engine_ray.serve import SearchServer
    from search_engine_ray.stages.query import LocalIndex

    srv = SearchServer(index_dir, LocalIndex(index_dir)).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        for bad in ("/search?query=x&k=999999999", "/search?query=x&mode=ADN",
                    "/explain?query=x&mode=nope"):
            try:
                urllib.request.urlopen(base + bad)
                raise AssertionError(f"{bad} should 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400, bad
        req = urllib.request.Request(
            base + "/batch",
            data=_json.dumps({"queries": [{"query": "x", "k": 10**9}]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req)
            raise AssertionError("batch should 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.stop()


def test_doc_sharded_phrase_matches_local(index_dir):
    """phrase() through the doc-range shards must be bit-identical to
    LocalIndex.phrase_search over the whole index (global stats; the
    shared deterministic top-k merge)."""
    from search_engine_ray.pipelines.search import DocShardedSearcher

    local = LocalIndex(index_dir, load_positions=True)
    sharded = DocShardedSearcher(index_dir, n_shards=3, load_positions=True)
    try:
        for ph in ["running meetings", "the of", "w0017 runs", "zzznope nothere"]:
            ids_l, sc_l = local.phrase_search(ph, k=25)
            ids_s, sc_s = sharded.phrase(ph, k=25)
            assert ids_l.tolist() == ids_s.tolist(), ph
            assert sc_l.tolist() == sc_s.tolist(), ph
        # a searcher without positions refuses rather than returning a
        # correct-looking empty result
        nopos = DocShardedSearcher(index_dir, n_shards=2)
        try:
            with pytest.raises(ValueError, match="positions"):
                nopos.phrase("running meetings")
        finally:
            nopos.close()
        # phrase survives a blue-green refresh (new generation keeps
        # load_positions)
        sharded.refresh()
        ids_r, sc_r = sharded.phrase("running meetings", k=25)
        ids_l2, _ = local.phrase_search("running meetings", k=25)
        assert ids_r.tolist() == ids_l2.tolist()
    finally:
        sharded.close()


def test_http_phrase_endpoint(index_dir):
    """GET /phrase returns the same top-k as LocalIndex.phrase_search,
    with snippets; bad k and positions-less searchers answer 4xx/501."""
    import json as json_
    import urllib.error
    import urllib.request

    from search_engine_ray.pipelines.search import DocShardedSearcher
    from search_engine_ray.serve import SearchServer

    local = LocalIndex(index_dir, load_positions=True)
    # default searcher: SearchServer reads meta.json and enables
    # positions automatically on a positions-built index
    srv = SearchServer(index_dir).start()
    try:
        for ph in ["running meetings", "the of"]:
            url = (f"http://127.0.0.1:{srv.port}/phrase"
                   f"?query={ph.replace(' ', '+')}&k=10")
            with urllib.request.urlopen(url) as resp:
                assert resp.status == 200
                payload = json_.loads(resp.read())
            ids, scores = local.phrase_search(ph, k=10)
            assert [r["doc_id"] for r in payload["results"]] == ids.tolist()
            assert np.allclose([r["score"] for r in payload["results"]], scores)
            for r in payload["results"]:
                assert "snippet" in r and "conv_id" in r
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/phrase?query=x&k=0")
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.stop()
        srv.searcher.close()
    # a server whose searcher lacks positions answers 400, not 500
    nopos = DocShardedSearcher(index_dir, n_shards=2)
    srv2 = SearchServer(index_dir, nopos).start()
    try:
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{srv2.port}/phrase?query=running+meetings"
            )
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv2.stop()
        nopos.close()


def test_doc_sharding_is_the_default_serving_tier(index_dir):
    """Pointer test for the serving docs: every production entry point
    (SearchServer default, serve()) constructs a DocShardedSearcher;
    the term-sharded ShardedSearcher is a test-only reference-analog
    and must not appear on any production path."""
    import inspect

    from search_engine_ray import serve as serve_mod
    from search_engine_ray.pipelines.search import DocShardedSearcher
    from search_engine_ray.serve import SearchServer

    srv = SearchServer(index_dir, spellcheck=False)
    try:
        assert isinstance(srv.searcher, DocShardedSearcher)
    finally:
        srv.searcher.close()
    src = inspect.getsource(serve_mod)
    assert "DocShardedSearcher" in src
    # the term-sharded analog is never referenced by the serving module
    assert "ShardedSearcher(" not in src.replace("DocShardedSearcher(", "")


def test_result_cache_bit_identical_and_bounded(index_dir):
    """The serving-tier result cache: a hit is bit-identical to the
    scoring path, caller mutation cannot poison it, and full-ranking
    (huge-k) calls are never cached."""
    li = LocalIndex(index_dir)
    q, k = "running meetings", 25
    cold_ids, cold_sc = li.search(q, k, mode="OR", result_cache=False)
    warm1 = li.search(q, k, mode="OR")  # populates
    warm2 = li.search(q, k, mode="OR")  # hits
    assert warm1[0].tolist() == cold_ids.tolist() == warm2[0].tolist()
    assert np.array_equal(warm1[1], cold_sc)
    assert np.array_equal(warm2[1], cold_sc)
    # mutation safety: scribbling on a returned result must not poison
    # the cached copy
    warm2[0][:] = -1
    warm3 = li.search(q, k, mode="OR")
    assert warm3[0].tolist() == cold_ids.tolist()
    # deterministic-tie-break prefix property across distinct-k entries
    top5_ids, _ = li.search(q, 5, mode="OR")
    assert top5_ids.tolist() == cold_ids[:5].tolist()
    # full-ranking callers (k=10**9 batch ops) bypass the cache
    li.search(q, 10**9, mode="OR")
    assert li._memo.get(("res", q, 10**9, "OR")) is None
    assert li._memo.get(("res", q, k, "OR")) is not None


def test_result_cache_through_doc_sharded_tier(index_dir):
    """result_cache flag travels through DocShardedSearcher; cached and
    bypass answers are identical."""
    from search_engine_ray.pipelines.search import DocShardedSearcher

    sharded = DocShardedSearcher(index_dir, n_shards=2)
    try:
        a_ids, a_sc = sharded.search("hash join", k=20, mode="OR",
                                     result_cache=False)
        b_ids, b_sc = sharded.search("hash join", k=20, mode="OR")
        c_ids, c_sc = sharded.search("hash join", k=20, mode="OR")
        assert a_ids.tolist() == b_ids.tolist() == c_ids.tolist()
        assert np.array_equal(a_sc, b_sc)
        assert np.array_equal(a_sc, c_sc)
    finally:
        sharded.close()


def test_phrase_result_cache(ray_session, tmp_path):
    """phrase_search result memo: hit == recompute, bit-identical."""
    import pyarrow as pa_
    import pyarrow.parquet as pq_
    import numpy as np_

    from search_engine_ray.pipelines.build_index import build_index

    texts = ["the quick brown fox", "say the quick brown fox again",
             "quick brown dog here"]
    src = tmp_path / "src"
    src.mkdir()
    n = len(texts)
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
    idx = str(tmp_path / "idx")
    build_index(str(src), idx, IndexConfig(stemming=False), n_partitions=1)
    li = LocalIndex(idx, load_positions=True)
    cold = li.phrase_search("quick brown fox", result_cache=False)
    warm1 = li.phrase_search("quick brown fox")
    warm2 = li.phrase_search("quick brown fox")
    assert cold[0].tolist() == warm1[0].tolist() == warm2[0].tolist()
    assert np.array_equal(cold[1], warm1[1])
    assert np.array_equal(cold[1], warm2[1])


def test_span_local_memo_is_bounded_per_term():
    """The span-local-id memo must hold at most ONE array per term:
    keying by (term, lo) would duplicate an O(df) array per distinct
    lo (on an unsharded index lo follows the rarest co-queried term)
    and evict the decoded postings it shadows."""
    from search_engine_ray.stages.query import _LRUBytes, _span_local_ids

    cache = _LRUBytes(1 << 20)
    ids = np.arange(100, 200, dtype=np.int64)
    a = _span_local_ids(ids, 10, cache, "t")
    assert np.array_equal(a, ids - 10)
    assert _span_local_ids(ids, 10, cache, "t") is a  # stable-lo hit
    c = _span_local_ids(ids, 50, cache, "t")  # new lo REPLACES
    assert np.array_equal(c, ids - 50)
    loc_keys = [k for k in cache._d if isinstance(k, tuple) and k[0] == "loc"]
    assert loc_keys == [("loc", "t")]
    assert _span_local_ids(ids, 7, None, "t").tolist() == (ids - 7).tolist()


def test_search_after_close_returns_empty(index_dir):
    """A late caller (e.g. an HTTP worker thread finishing during
    shutdown) must get the empty-result behavior, not an integer
    modulo-zero crash in _pick_shards (replica sets are [] after
    close)."""
    from search_engine_ray.pipelines.search import DocShardedSearcher

    s = DocShardedSearcher(index_dir, n_shards=2, n_replicas=2)
    s.close()
    ids, scores = s.search("running meetings", 5, mode="OR")
    assert len(ids) == 0 and len(scores) == 0
    assert s.search_many([("running meetings", 5)], mode="OR")[0][0].size == 0


def test_attached_frontend_bit_identical(index_dir):
    """FrontendAttachedSearcher (the multi-process QPS lever): a
    frontend resolving the owner's named shard actors must return
    bit-identical results through the shared merge code. Attach here is
    in-process (same namespace rules as a sibling driver — the
    cross-process path is exercised by bench.py --qps)."""
    from search_engine_ray.pipelines.search import (
        DocShardedSearcher, FrontendAttachedSearcher,
    )

    owner = DocShardedSearcher(
        index_dir, n_shards=2, n_replicas=2, name_prefix="tfe"
    )
    try:
        names = owner.actor_names()
        assert names == [[f"tfe-g0-r{r}-s{s}" for s in range(2)]
                         for r in range(2)]
        fe = FrontendAttachedSearcher(index_dir, names)
        for q in ["running meetings", "the of and", "zzznope", "w0017 runs"]:
            for mode in ("OR", "AND"):
                ids_o, sc_o = owner.search(q, 50, mode=mode)
                ids_f, sc_f = fe.search(q, 50, mode=mode)
                assert ids_o.tolist() == ids_f.tolist(), (q, mode)
                assert sc_o.tolist() == sc_f.tolist(), (q, mode)
        fe.close()
    finally:
        owner.close()


def test_named_refresh_uses_new_generation_names(ray_session, tmp_path):
    """A blue-green refresh under name_prefix must register the fresh
    actor set under generation-stamped names (no collision with the
    retiring set) and actor_names() must track the live generation."""
    from search_engine_ray.corpus import write_transcripts
    from search_engine_ray.pipelines.build_index import build_index
    from search_engine_ray.pipelines.search import DocShardedSearcher

    src = str(tmp_path / "t")
    write_transcripts(src, n_convs=40, turns_per_conv=5, seed=42, n_files=2)
    d = str(tmp_path / "idx")
    build_index(src, d, IndexConfig(doc_bucket_size=512), n_partitions=2)
    s = DocShardedSearcher(d, n_shards=2, name_prefix="tgen")
    try:
        assert s.actor_names()[0][0] == "tgen-g0-r0-s0"
        s.refresh()
        assert s.actor_names()[0][0] == "tgen-g1-r0-s0"
        ids, _ = s.search("running meetings", 5, mode="OR")
        assert ids.size >= 0  # serving still works through gen-1 actors
    finally:
        s.close()


def test_http_knn_endpoint(index_dir, tmp_path_factory):
    """GET /knn (neighbors of an indexed vec_id) and POST /knn (raw
    vector) serve through the same HTTP frontend as text search and
    match AnnSearcher directly; without an attached ANN index the
    routes answer 501."""
    import json as json_
    import urllib.error
    import urllib.request

    import pyarrow as pa
    import pyarrow.parquet as pq_

    from search_engine_ray.pipelines.ann_index import (
        AnnSearcher, build_ann_index,
    )
    from search_engine_ray.pipelines.search import DocShardedSearcher
    from search_engine_ray.serve import SearchServer

    root = tmp_path_factory.mktemp("knnserve")
    rng = np.random.default_rng(9)
    centers = rng.standard_normal((4, 8)) * 3
    mat = (
        centers[np.arange(60) % 4] + rng.standard_normal((60, 8)) * 0.05
    ).astype(np.float32)
    pq_.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(60), pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in mat], pa.list_(pa.float32())
                ),
            }
        ),
        str(root / "embeddings.parquet"),
    )
    idx = str(root / "ann")
    build_ann_index(str(root), idx)
    ann = AnnSearcher(idx)
    srv = SearchServer(
        index_dir, DocShardedSearcher(index_dir, n_shards=2),
        spellcheck=False, ann=ann,
    ).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        with urllib.request.urlopen(f"{base}/knn?vec_id=7&k=5") as resp:
            assert resp.status == 200
            payload = json_.loads(resp.read())
        _, vids, sims = ann.search_matrix(
            np.array([7], np.int64), mat[7:8].astype(np.float64), k=5
        )
        assert [n["vec_id"] for n in payload["neighbors"]] == vids.tolist()
        assert np.allclose([n["sim"] for n in payload["neighbors"]], sims)
        assert payload["vec_id"] == 7
        assert 7 not in [n["vec_id"] for n in payload["neighbors"]]

        req = urllib.request.Request(
            f"{base}/knn",
            data=json_.dumps(
                {"vector": mat[7].tolist(), "k": 3}
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as resp:
            posted = json_.loads(resp.read())
        # raw-vector search does NOT exclude: vec 7 itself leads at 1.0
        assert posted["neighbors"][0]["vec_id"] == 7
        assert posted["neighbors"][0]["sim"] == 1.0
        assert len(posted["neighbors"]) == 3

        for bad, code in (
            ("/knn?vec_id=999999&k=5", 404),
            ("/knn?vec_id=abc&k=5", 400),
            ("/knn?vec_id=7&k=0", 400),
        ):
            try:
                urllib.request.urlopen(base + bad)
                raise AssertionError(f"expected {code} for {bad}")
            except urllib.error.HTTPError as e:
                assert e.code == code
    finally:
        srv.stop()
        ann.close()

    bare = SearchServer(
        index_dir, DocShardedSearcher(index_dir, n_shards=2),
        spellcheck=False,
    ).start()
    try:
        urllib.request.urlopen(
            f"http://127.0.0.1:{bare.port}/knn?vec_id=1&k=5"
        )
        raise AssertionError("expected 501 without an ANN index")
    except urllib.error.HTTPError as e:
        assert e.code == 501
    finally:
        bare.stop()


def test_http_pagination_offset(index_dir):
    """offset skips ranks deterministically: page 2 equals the tail of
    one deep request; bad offsets 400; depth bound covers offset+k."""
    import json as json_
    import urllib.error
    import urllib.request

    from search_engine_ray.serve import SearchServer, MAX_K
    from search_engine_ray.stages.query import LocalIndex

    li = LocalIndex(index_dir)

    class LocalSearcher:
        def search(self, q, k, mode):
            return li.search(q, k, mode=mode)

    srv = SearchServer(index_dir, LocalSearcher()).start()
    try:
        base = f"http://127.0.0.1:{srv.port}/search?query=running&mode=OR"
        with urllib.request.urlopen(base + "&k=10") as resp:
            full = json_.loads(resp.read())["results"]
        with urllib.request.urlopen(base + "&k=5&offset=5") as resp:
            page2 = json_.loads(resp.read())["results"]
        assert page2 == full[5:10]
        assert [r["rank"] for r in page2] == [6, 7, 8, 9, 10]
        # offset past the end of the match set (fixture corpus has far
        # fewer than 900 'running' matches): empty page, not an error
        with urllib.request.urlopen(base + "&k=5&offset=900") as resp:
            assert json_.loads(resp.read())["results"] == []
        for bad in ("abc", "-1", str(MAX_K)):
            try:
                urllib.request.urlopen(base + f"&k=10&offset={bad}")
                raise AssertionError(f"offset={bad} should 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400, (bad, e.code)
    finally:
        srv.stop()
