"""Wildcard ('prefix*') query expansion: semantics, cap, sharding.

The engine's multi-term rewrite (Lucene-style prefix query): a
``prefix*`` token expands against the GLOBAL dictionary to at most
WILDCARD_MAX_EXPANSIONS terms by (df desc, term asc), stopwords never
re-admitted. AND mode treats each wildcard as a group (doc must match
>= 1 expansion per group plus every literal); OR mode accumulates all.
Doc-range shards derive identical expansion sets from the global
dictionary, so sharded results are bit-identical to unsharded.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_ray.config import IndexConfig, WILDCARD_MAX_EXPANSIONS
from search_engine_ray.corpus import write_transcripts
from search_engine_ray.pipelines.build_index import build_index
from search_engine_ray.pipelines.search import DocShardedSearcher
from search_engine_ray.stages.query import LocalIndex


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("wc")
    src = str(root / "transcripts")
    write_transcripts(src, n_convs=100, turns_per_conv=5, seed=11, n_files=4)
    d = str(root / "index")
    # stemming off: expansion semantics are transparent (the dictionary
    # holds raw tokens only)
    build_index(src, d, IndexConfig(stemming=False, doc_bucket_size=512),
                n_partitions=2)
    return d


@pytest.fixture(scope="module")
def prefix_heavy_index(ray_session, tmp_path_factory):
    """71 terms sharing prefix 'qq' with a strict df ladder:
    qq00 in 71 docs, qq01 in 70, ... qq70 in 1 — the 64-term cap must
    select qq00..qq63. Every doc also contains 'anchor'."""
    root = tmp_path_factory.mktemp("wc_cap")
    src = root / "src"
    src.mkdir()
    n = 71
    texts = [
        "anchor " + " ".join(f"qq{i:02d}" for i in range(j + 1))
        for j in range(n)
    ]  # doc j contains qq00..qqj  ->  df(qq_i) = n - i
    pq.write_table(
        pa.table({
            "conv_id": pa.array([f"conv-{i:08d}" for i in range(n)]),
            "turn_idx": pa.array(np.zeros(n, dtype="int32"), pa.int32()),
            "role": pa.array(["user"] * n),
            "text": pa.array(texts),
            "tool": pa.array([""] * n),
            "ts": pa.array(np.zeros(n, dtype="datetime64[us]"),
                           pa.timestamp("us")),
        }),
        str(src / "part-0.parquet"),
    )
    d = str(root / "index")
    build_index(str(src), d, IndexConfig(stemming=False), n_partitions=1)
    return d


def _brute_or(li: LocalIndex, terms, k):
    """Reference: OR-query over an explicit term list (stemming=False
    index, so analyzer terms == dictionary terms)."""
    return li.search(" ".join(terms), k, mode="OR", result_cache=False)


def test_or_equals_expansion_or(index_dir):
    li = LocalIndex(index_dir)
    exp = li.expand_prefix("run")
    assert exp, "fixture corpus must contain run-prefixed terms"
    a_ids, a_sc = li.search("run*", 10**9, mode="OR")
    b_ids, b_sc = _brute_or(li, exp, 10**9)
    assert a_ids.tolist() == b_ids.tolist()
    np.testing.assert_array_equal(a_sc, b_sc)


def test_mixed_literal_and_wildcard_or(index_dir):
    li = LocalIndex(index_dir)
    exp = li.expand_prefix("meet")
    a_ids, a_sc = li.search("running meet*", 10**9, mode="OR")
    b_ids, b_sc = _brute_or(li, ["running"] + exp, 10**9)
    assert a_ids.tolist() == b_ids.tolist()
    np.testing.assert_array_equal(a_sc, b_sc)


def test_and_group_semantics(index_dir):
    """'lit wc*' AND = docs containing lit AND >=1 expansion; scores =
    sum of all matched terms' contributions (equal to the OR ranking
    restricted to qualifying docs)."""
    li = LocalIndex(index_dir)
    exp = li.expand_prefix("meet")
    lit_ids, _ = li.search("running", 10**9, mode="OR")
    grp_ids = set()
    for t in exp:
        grp_ids.update(li.term_postings(t)[0].tolist())
    want = sorted(set(lit_ids.tolist()) & grp_ids)
    a_ids, a_sc = li.search("running meet*", 10**9, mode="AND")
    assert sorted(a_ids.tolist()) == want
    # scores equal the OR-mode scores of the same docs
    o_ids, o_sc = li.search("running meet*", 10**9, mode="OR")
    pos = {d: i for i, d in enumerate(o_ids.tolist())}
    for d, s in zip(a_ids.tolist(), a_sc.tolist()):
        assert s == o_sc[pos[d]]


def test_wildcard_no_match(index_dir):
    li = LocalIndex(index_dir)
    assert li.search("zzznope*", 50, mode="OR")[0].size == 0
    assert li.search("zzznope*", 50, mode="AND")[0].size == 0
    # AND: an unmatchable group empties the result even with a live literal
    assert li.search("running zzznope*", 50, mode="AND")[0].size == 0
    # OR: the dead group contributes nothing, the literal survives
    a_ids, a_sc = li.search("running zzznope*", 10**9, mode="OR")
    b_ids, b_sc = li.search("running", 10**9, mode="OR")
    assert a_ids.tolist() == b_ids.tolist()
    np.testing.assert_array_equal(a_sc, b_sc)


def test_duplicate_terms_score_once(index_dir):
    """A term reachable both literally and via expansion contributes
    exactly once."""
    li = LocalIndex(index_dir)
    exp = li.expand_prefix("run")
    assert "running" in exp
    a_ids, a_sc = li.search("running run*", 10**9, mode="OR")
    b_ids, b_sc = _brute_or(li, exp, 10**9)
    assert a_ids.tolist() == b_ids.tolist()
    np.testing.assert_array_equal(a_sc, b_sc)


def test_exclusion_wildcard(index_dir):
    """'-prefix*' drops every doc containing ANY expansion; survivors'
    scores unchanged."""
    li = LocalIndex(index_dir)
    full_ids, full_sc = li.search("meetings", 10**9, mode="OR")
    ex_ids, ex_sc = li.search("meetings -run*", 10**9, mode="OR")
    banned = set()
    for t in li.expand_prefix("run"):
        banned.update(li.term_postings(t)[0].tolist())
    keep = [i for i, d in enumerate(full_ids.tolist()) if d not in banned]
    assert ex_ids.tolist() == [full_ids[i] for i in keep]
    assert ex_sc.tolist() == [full_sc[i] for i in keep]


def test_expansion_cap_df_desc_term_asc(prefix_heavy_index):
    li = LocalIndex(prefix_heavy_index)
    exp = li.expand_prefix("qq")
    assert len(exp) == WILDCARD_MAX_EXPANSIONS
    # df ladder: highest-df 64 are qq00..qq63 (returned sorted)
    assert exp == [f"qq{i:02d}" for i in range(WILDCARD_MAX_EXPANSIONS)]
    # docs 64..70 contain qq64+ (outside the cap) AND qq00..qq63, so
    # they still match; every doc matches via qq00
    ids, _ = li.search("qq*", 10**9, mode="OR")
    assert ids.size == 71


def test_expansion_drops_stopwords(index_dir):
    li = LocalIndex(index_dir)
    # 'the' is in the fixture vocabulary; 'th*' must not expand to it
    assert "the" in li.terms
    assert "the" not in li.expand_prefix("th")


def test_sharded_bit_identical_with_cap(prefix_heavy_index):
    """Doc-range shards expand against the global dictionary, so the
    binding 64-term cap picks the SAME set on every shard."""
    li = LocalIndex(prefix_heavy_index)
    sh = DocShardedSearcher(prefix_heavy_index, n_shards=3)
    try:
        for q, mode in [("qq*", "OR"), ("anchor qq*", "AND"),
                        ("qq0* qq1*", "AND"), ("anchor -qq6*", "OR")]:
            a_ids, a_sc = li.search(q, 200, mode=mode, result_cache=False)
            b_ids, b_sc = sh.search(q, 200, mode=mode)
            assert a_ids.tolist() == b_ids.tolist(), (q, mode)
            np.testing.assert_array_equal(a_sc, b_sc)
    finally:
        sh.close()


def test_sharded_bit_identical_fixture(index_dir):
    li = LocalIndex(index_dir)
    sh = DocShardedSearcher(index_dir, n_shards=3)
    try:
        for q, mode in [("run*", "OR"), ("running meet*", "AND"),
                        ("meetings -run*", "OR"), ("zz* running", "OR")]:
            a_ids, a_sc = li.search(q, 100, mode=mode, result_cache=False)
            b_ids, b_sc = sh.search(q, 100, mode=mode)
            assert a_ids.tolist() == b_ids.tolist(), (q, mode)
            np.testing.assert_array_equal(a_sc, b_sc)
    finally:
        sh.close()


def test_result_cache_hit_bit_identical(index_dir):
    li = LocalIndex(index_dir)
    c1 = li.search("run* meetings", 50, mode="OR")
    c2 = li.search("run* meetings", 50, mode="OR")
    assert c1[0].tolist() == c2[0].tolist()
    assert c1[1].tolist() == c2[1].tolist()


def test_http_wildcard_passthrough_and_spellcheck(index_dir):
    """HTTP /search: a wildcard query reaches the engine intact, and
    the spellcheck rewrite never touches (or drops) a 'prefix*' token
    even when another token gets corrected."""
    import json as json_
    import urllib.parse
    import urllib.request

    from search_engine_ray.serve import SearchServer

    li = LocalIndex(index_dir)

    class LocalSearcher:  # avoid actor startup for this test
        def search(self, q, k, mode):
            return li.search(q, k, mode=mode)

    srv = SearchServer(index_dir, LocalSearcher()).start()
    try:
        q = urllib.parse.quote("run* meetings")
        url = f"http://127.0.0.1:{srv.port}/search?query={q}&k=20&mode=OR"
        with urllib.request.urlopen(url) as resp:
            payload = json_.loads(resp.read())
        want_ids, _ = li.search("run* meetings", k=20, mode="OR")
        assert [r["doc_id"] for r in payload["results"]] == want_ids.tolist()
        assert "spellcheck" not in payload

        # misspelled literal + wildcard: the literal corrects, the
        # wildcard token survives verbatim
        q = urllib.parse.quote("meetngs run*")
        url = f"http://127.0.0.1:{srv.port}/search?query={q}&k=20&mode=OR"
        with urllib.request.urlopen(url) as resp:
            payload = json_.loads(resp.read())
        assert payload["spellcheck"] == ["meetings", "run*"]
        want_ids, _ = li.search("meetings run*", k=20, mode="OR")
        assert [r["doc_id"] for r in payload["results"]] == want_ids.tolist()
    finally:
        srv.stop()


def test_frontend_page_has_highlighter(index_dir):
    """The search page ships the snippet highlighter: single-pass
    combined whole-word regex over the escaped snippet, with wildcard
    prefixes highlighting any completion."""
    import urllib.request

    from search_engine_ray.serve import SearchServer
    from search_engine_ray.stages.query import LocalIndex

    li = LocalIndex(index_dir)

    class LocalSearcher:
        def search(self, q, k, mode):
            return li.search(q, k, mode=mode)

    srv = SearchServer(index_dir, LocalSearcher(), spellcheck=False).start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/") as resp:
            body = resp.read().decode()
        assert "const hi = (text, q)" in body
        # raw-text matching with per-segment escaping: the highlighter
        # must never run over esc() output (entity corruption)
        assert "'<mark>' + esc(m[0]) + '</mark>'" in body
        # Python escaping renders real JS regex source: literal \s in
        # the split and an escaped \\b inside the RegExp string
        assert "q.split(/\\s+/)" in body
        assert "'\\\\b('" in body
        assert "mark{background" in body
    finally:
        srv.stop()


def test_fuzzy_expansion_within1(index_dir):
    """expand_fuzzy returns exactly the dictionary terms at
    Damerau-Levenshtein distance <= 1 (stopwords dropped), brute-
    checked against _within1 over the whole vocabulary."""
    from search_engine_ray.config import STOPWORDS
    from search_engine_ray.functions.spellcheck import _within1

    li = LocalIndex(index_dir)
    for w in ["runing", "meetngs", "ponies", "zzzz"]:
        want = sorted(
            t for t in li.terms
            if t not in STOPWORDS and (t == w or _within1(w, t))
        )
        assert li.expand_fuzzy(w) == want, w


def test_fuzzy_group_semantics(index_dir):
    """'lit w~' behaves exactly like a wildcard group over the fuzzy
    expansion set: same candidates, same scores."""
    li = LocalIndex(index_dir)
    exp = li.expand_fuzzy("runing")
    assert exp  # fixture corpus contains 'running'
    a_ids, a_sc = li.search("runing~", 10**9, mode="OR")
    b_ids, b_sc = _brute_or(li, exp, 10**9)
    assert a_ids.tolist() == b_ids.tolist()
    np.testing.assert_array_equal(a_sc, b_sc)
    # AND with a literal
    a2, _ = li.search("meetings runing~", 10**9, mode="AND")
    lit_ids, _l = li.search("meetings", 10**9, mode="OR")
    grp = set()
    for t in exp:
        grp.update(li.term_postings(t)[0].tolist())
    assert sorted(a2.tolist()) == sorted(set(lit_ids.tolist()) & grp)


def test_fuzzy_exclusion_and_sharded(index_dir):
    li = LocalIndex(index_dir)
    sh = DocShardedSearcher(index_dir, n_shards=3)
    try:
        for q, mode in [("runing~", "OR"), ("meetings runing~", "AND"),
                        ("meetings -ponis~", "OR"), ("run* ponis~", "OR")]:
            a_ids, a_sc = li.search(q, 100, mode=mode, result_cache=False)
            b_ids, b_sc = sh.search(q, 100, mode=mode)
            assert a_ids.tolist() == b_ids.tolist(), (q, mode)
            np.testing.assert_array_equal(a_sc, b_sc)
    finally:
        sh.close()


def test_boosted_scoring(index_dir):
    """'a b^2' scales b's BM25 contribution by 2; membership (AND)
    unchanged; duplicate mentions add ('b b^2' weighs b 3x)."""
    from search_engine_ray.functions import scoring as _sc

    li = LocalIndex(index_dir)

    def manual(term_weights, k):
        import collections
        acc = collections.defaultdict(float)
        for t, w in term_weights:
            ts = li.terms[t]
            ids, tfs, dls = ts.decode()
            sc = _sc.bm25_term_scores(
                tfs, dls, li.N, ts.df, li.avgdl, li.cfg.k1, li.cfg.b
            )
            for d, s in zip(ids.tolist(), sc.tolist()):
                acc[d] += w * s
        ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return [d for d, _ in ranked], [s for _, s in ranked]

    a_ids, a_sc = li.search("meetings running^2", 10**9, mode="OR",
                            result_cache=False)
    m_ids, m_sc = manual([("meetings", 1.0), ("running", 2.0)], 10**9)
    assert a_ids.tolist() == m_ids
    np.testing.assert_allclose(a_sc, m_sc, rtol=0, atol=1e-9)

    # additive duplicate mentions
    d_ids, d_sc = li.search("running running^2", 10**9, mode="OR",
                            result_cache=False)
    m2_ids, m2_sc = manual([("running", 3.0)], 10**9)
    assert d_ids.tolist() == m2_ids
    np.testing.assert_allclose(d_sc, m2_sc, rtol=0, atol=1e-9)

    # AND membership identical to the unboosted query
    b1, _ = li.search("ponies running^2", 10**9, mode="AND",
                      result_cache=False)
    b2, _ = li.search("ponies running", 10**9, mode="AND",
                      result_cache=False)
    assert sorted(b1.tolist()) == sorted(b2.tolist())

    # malformed weight: token falls back to the analyzer ('^' splits)
    f1, _ = li.search("running^x", 20, mode="OR", result_cache=False)
    f2, _ = li.search("running x", 20, mode="OR", result_cache=False)
    assert f1.tolist() == f2.tolist()


def test_boosted_sharded_bit_identical(index_dir):
    li = LocalIndex(index_dir)
    sh = DocShardedSearcher(index_dir, n_shards=3)
    try:
        for q, mode in [("meetings running^2", "OR"),
                        ("ponies running^0.5", "AND"),
                        ("run* meetings^2", "OR"),
                        ("meetings^3 -ponies", "OR")]:
            a_ids, a_sc = li.search(q, 100, mode=mode, result_cache=False)
            b_ids, b_sc = sh.search(q, 100, mode=mode)
            assert a_ids.tolist() == b_ids.tolist(), (q, mode)
            np.testing.assert_array_equal(a_sc, b_sc)
    finally:
        sh.close()


@pytest.fixture(scope="module")
def pos_index_dir(ray_session, tmp_path_factory):
    """Positions-built fixture for quoted-phrase clause tests."""
    root = tmp_path_factory.mktemp("wc_pos")
    src = str(root / "transcripts")
    write_transcripts(src, n_convs=80, turns_per_conv=5, seed=13, n_files=2)
    d = str(root / "index")
    build_index(src, d, IndexConfig(stemming=False, positions=True,
                                    doc_bucket_size=512), n_partitions=1)
    return d


def test_quoted_phrase_clause_semantics(pos_index_dir):
    """'"a b" c' AND = docs containing the exact phrase AND c; score =
    phrase terms' BM25 + c's BM25; exclusion -"a b" drops exactly the
    phrase-matching docs."""
    li = LocalIndex(pos_index_dir, load_positions=True)
    # find a phrase that actually occurs
    phrase = None
    for cand_phrase in ("running meetings", "the running"):
        ph_ids, ph_sc = li.phrase_search(cand_phrase, k=10**9)
        if ph_ids.size:
            phrase = cand_phrase
            break
    assert phrase, "fixture must contain a probe phrase"
    q_ids, q_sc = li.search(f'"{phrase}"', 10**9, mode="AND",
                            result_cache=False)
    assert sorted(q_ids.tolist()) == sorted(ph_ids.tolist())
    # scores equal phrase_search's scores
    a = dict(zip(q_ids.tolist(), q_sc.tolist()))
    b = dict(zip(ph_ids.tolist(), ph_sc.tolist()))
    for d in a:
        assert abs(a[d] - b[d]) < 1e-12

    # phrase + literal AND: candidates intersect, scores add
    lit_ids, lit_sc = li.search("ponies", 10**9, mode="OR",
                                result_cache=False)
    lit = dict(zip(lit_ids.tolist(), lit_sc.tolist()))
    m_ids, m_sc = li.search(f'"{phrase}" ponies', 10**9, mode="AND",
                            result_cache=False)
    want = sorted(set(ph_ids.tolist()) & set(lit_ids.tolist()))
    assert sorted(m_ids.tolist()) == want
    for d, s in zip(m_ids.tolist(), m_sc.tolist()):
        assert abs(s - (b[d] + lit[d])) < 1e-9

    # exclusion phrase: 'ponies -"<phrase>"' = ponies docs minus
    # phrase docs, scores unchanged
    e_ids, e_sc = li.search(f'ponies -"{phrase}"', 10**9, mode="OR",
                            result_cache=False)
    banned = set(ph_ids.tolist())
    keep = [i for i, d in enumerate(lit_ids.tolist()) if d not in banned]
    assert e_ids.tolist() == [lit_ids[i] for i in keep]
    assert e_sc.tolist() == [lit_sc[i] for i in keep]


def test_quoted_phrase_composes_with_rewrites(pos_index_dir):
    """The remainder of a quoted query may itself contain wildcards:
    '"<phrase>" run*' evaluates the rewrite machinery on the rest."""
    li = LocalIndex(pos_index_dir, load_positions=True)
    ph_ids, _ = li.phrase_search("the running", k=10**9)
    if ph_ids.size == 0:
        pytest.skip("probe phrase absent from fixture")
    a_ids, a_sc = li.search('"the running" meet*', 10**9, mode="OR",
                            result_cache=False)
    r_ids, r_sc = li.search("meet*", 10**9, mode="OR", result_cache=False)
    rest = dict(zip(r_ids.tolist(), r_sc.tolist()))
    ph_ids2, ph_sc2 = li.phrase_search("the running", k=10**9)
    phd = dict(zip(ph_ids2.tolist(), ph_sc2.tolist()))
    assert set(a_ids.tolist()) == set(rest) | set(phd)
    for d, s in zip(a_ids.tolist(), a_sc.tolist()):
        assert abs(s - (rest.get(d, 0.0) + phd.get(d, 0.0))) < 1e-9


def test_quoted_phrase_sharded_bit_identical(pos_index_dir):
    li = LocalIndex(pos_index_dir, load_positions=True)
    sh = DocShardedSearcher(pos_index_dir, n_shards=3, load_positions=True)
    try:
        for q, mode in [('"the running"', "AND"),
                        ('"the running" ponies', "OR"),
                        ('ponies -"the running"', "OR")]:
            a_ids, a_sc = li.search(q, 100, mode=mode, result_cache=False)
            b_ids, b_sc = sh.search(q, 100, mode=mode)
            assert a_ids.tolist() == b_ids.tolist(), (q, mode)
            np.testing.assert_array_equal(a_sc, b_sc)
    finally:
        sh.close()


def test_quoted_phrase_without_positions_raises(index_dir):
    li = LocalIndex(index_dir)  # positions not loaded
    with pytest.raises(ValueError):
        li.search('"running meetings" ponies', 10, mode="AND",
                  result_cache=False)


def test_http_quoted_phrase_with_spellcheck(pos_index_dir):
    """HTTP /search: quoted spans pass through spellcheck VERBATIM
    (interior phrase words are never rewritten — including misspelled
    ones, which the user quoted on purpose) while free text outside
    the quotes still corrects."""
    import json as json_
    import urllib.parse
    import urllib.request

    from search_engine_ray.serve import SearchServer

    li = LocalIndex(pos_index_dir, load_positions=True)

    class LocalSearcher:
        def search(self, q, k, mode):
            return li.search(q, k, mode=mode)

    srv = SearchServer(pos_index_dir, LocalSearcher()).start()
    try:
        # free text corrects, the quoted span survives as typed
        q = urllib.parse.quote('"the running" meetngs')
        url = f"http://127.0.0.1:{srv.port}/search?query={q}&k=20&mode=OR"
        with urllib.request.urlopen(url) as resp:
            payload = json_.loads(resp.read())
        assert payload.get("spellcheck") == ['"the', 'running"', "meetings"]
        want_ids, _ = li.search('"the running" meetings', k=20, mode="OR")
        assert [r["doc_id"] for r in payload["results"]] == want_ids.tolist()

        # a MISSPELLED word inside the quotes is left alone — and a
        # '-' glued to a quote keeps the span an exclusion through
        # the rebuild
        q = urllib.parse.quote('meetngs -"the runnng"')
        url = f"http://127.0.0.1:{srv.port}/search?query={q}&k=20&mode=OR"
        with urllib.request.urlopen(url) as resp:
            payload = json_.loads(resp.read())
        assert payload.get("spellcheck") == ["meetings", '-"the', 'runnng"']
        want_ids, _ = li.search('meetings -"the runnng"', k=20, mode="OR")
        assert [r["doc_id"] for r in payload["results"]] == want_ids.tolist()
    finally:
        srv.stop()


def test_phrase_with_skipword_remainder(pos_index_dir):
    """A remainder of only unanalyzable tokens (skip-words) is IGNORED,
    not treated as a failing AND clause."""
    li = LocalIndex(pos_index_dir, load_positions=True)
    ph_ids, _ = li.phrase_search("the running", k=10**9)
    if ph_ids.size == 0:
        pytest.skip("probe phrase absent from fixture")
    a_ids, _ = li.search('"the running" www', 10**9, mode="AND",
                         result_cache=False)
    b_ids, _ = li.search('"the running"', 10**9, mode="AND",
                         result_cache=False)
    assert a_ids.tolist() == b_ids.tolist()


def test_boost_multiterm_body(index_dir):
    """'hash-join^2' boosts BOTH analyzed terms and requires both in
    AND mode — equal to boosting each separately."""
    li = LocalIndex(index_dir)
    a = li.search("running-meetings^2", 10**9, mode="AND",
                  result_cache=False)
    b = li.search("running^2 meetings^2", 10**9, mode="AND",
                  result_cache=False)
    assert a[0].tolist() == b[0].tolist()
    np.testing.assert_array_equal(a[1], b[1])


def test_explain_quoted_and_boost_surface(pos_index_dir):
    li = LocalIndex(pos_index_dir, load_positions=True)
    exp = li.explain('"the running" ponies -"running meetings"', mode="OR")
    assert exp["phrases"] == ["the running"]
    assert exp["excluded_phrases"] == ["running meetings"]
    assert exp["strategy"] == "phrase-clauses"
    # multi-term boost body reports every term
    exp2 = li.explain("running-meetings^2", mode="OR")
    assert [b["term"] for b in exp2["boosted_terms"]] == [
        "running", "meetings"
    ]


def test_http_search_quoted_without_positions_400(index_dir):
    """A quoted query against a positions-less /search tier answers
    400 (client/config error), not a 500 with a Ray traceback."""
    import urllib.error
    import urllib.parse
    import urllib.request

    from search_engine_ray.serve import SearchServer

    sh = DocShardedSearcher(index_dir, n_shards=2, load_positions=False)
    srv = SearchServer(index_dir, sh, spellcheck=False).start()
    try:
        q = urllib.parse.quote('"running meetings"')
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/search?query={q}&k=5"
            )
            raise AssertionError("should 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400, e.code
    finally:
        srv.stop()
        sh.close()


def test_http_spellcheck_interior_phrase_words_untouched(pos_index_dir):
    """A misspelled word INSIDE a quoted span is never corrected (the
    user quoted it on purpose), while free text outside still is."""
    import json as json_
    import urllib.parse
    import urllib.request

    from search_engine_ray.serve import SearchServer

    li = LocalIndex(pos_index_dir, load_positions=True)

    class LocalSearcher:
        def search(self, q, k, mode):
            return li.search(q, k, mode=mode)

    srv = SearchServer(pos_index_dir, LocalSearcher()).start()
    try:
        q = urllib.parse.quote('"the runnng" meetngs')
        url = f"http://127.0.0.1:{srv.port}/search?query={q}&k=10&mode=OR"
        with urllib.request.urlopen(url) as resp:
            payload = json_.loads(resp.read())
        assert payload.get("spellcheck") == ['"the', 'runnng"', "meetings"]
        want_ids, _ = li.search('"the runnng" meetings', k=10, mode="OR")
        assert [r["doc_id"] for r in payload["results"]] == want_ids.tolist()
    finally:
        srv.stop()


from hypothesis import given, settings, strategies as st


@settings(max_examples=120, deadline=None)
@given(st.text(
    alphabet='abcdefgh "*~^-.123 ', min_size=0, max_size=40,
))
def test_query_parser_never_crashes(pos_index_dir, q):
    """Property: ANY string of letters and query-syntax markers parses
    and searches without raising, in both modes, deterministically (a
    positions-loaded index, so phrase clauses are evaluable)."""
    li = _fuzz_index_cache.setdefault(
        "li", LocalIndex(pos_index_dir, load_positions=True)
    )
    for mode in ("AND", "OR"):
        a = li.search(q, 10, mode=mode, result_cache=False)
        b = li.search(q, 10, mode=mode, result_cache=False)
        assert a[0].tolist() == b[0].tolist()
        assert a[1].tolist() == b[1].tolist()
        assert len(a[0]) == len(a[1]) <= 10


_fuzz_index_cache: dict = {}
