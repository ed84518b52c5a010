"""Dictionary-based query spell correction (the local rebuild of the
reference's Bing-API spellcheck, Search.java:31/:206/:340-341)."""

import numpy as np
import pytest

from search_engine_ray.functions.spellcheck import SpellChecker, _within1


def _sc(pairs):
    terms = [t for t, _ in pairs]
    dfs = [d for _, d in pairs]
    return SpellChecker(terms, dfs)


def test_known_word_passes_through():
    sc = _sc([("hash", 100), ("join", 50)])
    assert sc.correct("hash") == "hash"
    assert sc.correct("") == ""


def test_distance1_variants_corrected():
    sc = _sc([("hash", 100), ("join", 50), ("merge", 10)])
    assert sc.correct("hsh") == "hash"      # deletion
    assert sc.correct("haash") == "hash"    # insertion
    assert sc.correct("hasj") == "hash"     # substitution
    assert sc.correct("ahsh") == "hash"     # transposition
    assert sc.correct("jion") == "join"
    assert sc.correct("zzzzz") == "zzzzz"   # nothing close: unchanged


def test_ties_break_by_df_then_lex():
    sc = _sc([("cat", 10), ("car", 99)])
    assert sc.correct("caX") in ("car",)    # higher df wins
    sc2 = _sc([("cat", 10), ("car", 10)])
    assert sc2.correct("caX") == "car"      # equal df -> lexicographic

def test_distance2_not_corrected():
    sc = _sc([("abcd", 100)])
    # two substitutions away — shared-delete generation would admit it,
    # the exact distance filter must reject
    assert sc.correct("axcy") == "axcy"


def test_within1_exact_filter():
    assert _within1("hash", "hash")
    assert _within1("hash", "hsh")
    assert _within1("hash", "haash")
    assert _within1("hash", "hasj")
    assert _within1("hash", "ahsh")
    assert not _within1("hash", "hs")
    assert not _within1("abxd", "aybd")  # 2 substitutions
    assert not _within1("abcd", "badc")  # 2 transpositions


def test_max_terms_caps_to_top_df():
    terms = [f"w{i}" for i in range(100)] + ["hash"]
    dfs = list(range(100)) + [10_000]
    sc = SpellChecker(terms, dfs, max_terms=10)
    assert "hash" in sc.df and len(sc.df) == 10
    assert sc.correct("hsah") == "hash"


def test_correct_query_flags_changes():
    sc = _sc([("hash", 100), ("join", 50)])
    out, changed = sc.correct_query(["hash", "jion"])
    assert out == ["hash", "join"] and changed
    out, changed = sc.correct_query(["hash", "join"])
    assert out == ["hash", "join"] and not changed


def test_from_index_and_endpoint(ray_session, tmp_path):
    """End-to-end: misspelled HTTP query gets corrected, response carries
    the spellcheck field, results equal the corrected query's results."""
    import json as json_
    import urllib.request

    from search_engine_ray.config import IndexConfig
    from search_engine_ray.corpus import write_transcripts
    from search_engine_ray.pipelines.build_index import build_index
    from search_engine_ray.serve import SearchServer
    from search_engine_ray.stages.query import LocalIndex

    src = str(tmp_path / "tr")
    write_transcripts(src, n_convs=60, turns_per_conv=5, seed=42, n_files=2)
    idx = str(tmp_path / "idx")
    build_index(src, idx, IndexConfig(doc_bucket_size=512), n_partitions=1)

    local = LocalIndex(idx)

    class LocalSearcher:  # avoid actor startup for this test
        def search(self, q, k, mode):
            return local.search(q, k, mode=mode)

    srv = SearchServer(idx, LocalSearcher()).start()
    try:
        url = f"http://127.0.0.1:{srv.port}/search?query=runnng&k=5&mode=OR"
        with urllib.request.urlopen(url) as resp:
            payload = json_.loads(resp.read())
        assert payload["spellcheck"] == ["running"]
        want_ids, _ = local.search("running", k=5, mode="OR")
        assert [r["doc_id"] for r in payload["results"]] == want_ids.tolist()

        # a correctly spelled but CAPITALIZED word must not be
        # "corrected": spellcheck runs on the analyzed (lowercased)
        # terms, which the dictionary holds
        url = f"http://127.0.0.1:{srv.port}/search?query=Running&k=5&mode=OR"
        with urllib.request.urlopen(url) as resp:
            payload = json_.loads(resp.read())
        assert "spellcheck" not in payload
        assert [r["doc_id"] for r in payload["results"]] == want_ids.tolist()

        # a corrected EXCLUSION keeps its '-' through the rewrite: the
        # correction must not flip '-meetngs' into a positive term
        url = (f"http://127.0.0.1:{srv.port}/search"
               f"?query=running+-meetngs&k=50&mode=OR")
        with urllib.request.urlopen(url) as resp:
            payload = json_.loads(resp.read())
        assert payload["spellcheck"] == ["running", "-meetings"]
        want_ids, _x = local.search("running -meetings", k=50, mode="OR")
        banned, _b = local.search("meetings", k=10**9, mode="OR")
        assert banned.size  # fixture corpus contains the term
        got_ids = [r["doc_id"] for r in payload["results"]]
        assert got_ids == want_ids.tolist()
        assert not set(got_ids) & set(banned.tolist())

        # malformed / non-positive k -> clean 400, not a 500
        import urllib.error

        for bad in ("abc", "0", "-3"):
            try:
                urllib.request.urlopen(
                    f"http://127.0.0.1:{srv.port}/search?query=running&k={bad}"
                )
                raise AssertionError(f"k={bad} should 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400, (bad, e.code)
    finally:
        srv.stop()


from hypothesis import given, settings, strategies as st


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet="abcdefgh", min_size=1, max_size=8))
def test_correct_always_within_distance_1(word):
    from search_engine_ray.functions.spellcheck import _within1

    sc = _sc([("abcd", 5), ("efgh", 5), ("abab", 3), ("hash", 9)])
    out = sc.correct(word)
    assert out == word or (_within1(word, out) and out in sc.df)


def test_spellcheck_skips_query_syntax_tokens():
    """Tokens carrying query-syntax markers (wildcard, fuzzy, boost,
    phrase quotes) pass through correction untouched — a rebuild must
    never drop the marker."""
    sc = _sc([("hash", 100), ("join", 50), ("running", 30)])
    fixed, changed = sc.correct_query(["runnng"])
    assert fixed == ["running"] and changed
    # the serve-side loop is what guards markers; emulate its policy
    for tok in ('run*', 'runnng~', 'join^2', '"hash', 'join"'):
        guarded = (tok.endswith(("*", "~")) or "^" in tok[1:]
                   or '"' in tok)
        assert guarded, tok
