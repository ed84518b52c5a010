"""Vectorized tokenizer vs the independent per-doc oracle tokenizer."""

import numpy as np
import pyarrow as pa

from search_engine_ray.config import IndexConfig
from search_engine_ray.functions.analysis import tokenize_batch, analyze_query
from search_engine_ray.oracle import oracle_tokenize
from search_engine_ray.corpus import make_transcripts


def _batch_to_docmaps(tb, n_docs):
    """Collapse exploded arrays to per-doc {term: (tf, positions)}."""
    maps = [dict() for _ in range(n_docs)]
    for d, t, p in zip(tb.doc_idx, tb.terms, tb.positions):
        tf, pos = maps[d].get(t, (0, []))
        maps[d][t] = (tf + 1, pos + [int(p)])
    return [
        {t: (tf, sorted(pos)) for t, (tf, pos) in m.items()}
        for m in maps
    ]


def test_positions_and_filters():
    cfg = IndexConfig()
    texts = pa.array(
        [
            "Hello, World! hello",
            "  leading/trailing..punct  ",
            "http com www indexed",             # skip words counted in positions
            "supercalifragilisticexpialidocious ok",  # >20 chars dropped
            "",
            None,
            "The cat RAN; the cats running",
        ]
    )
    tb = tokenize_batch(texts, cfg)
    maps = _batch_to_docmaps(tb, len(texts))

    assert maps[0]["hello"] == (2, [1, 3])
    assert maps[0]["world"] == (1, [2])
    assert tb.doclens[0] == 3

    assert maps[1]["leading"] == (1, [1])
    assert maps[1]["trailing"] == (1, [2])
    assert maps[1]["punct"] == (1, [3])

    # skip words absent but positions advance past them
    assert "http" not in maps[2] and "com" not in maps[2] and "www" not in maps[2]
    assert maps[2]["indexed"] == (1, [4])
    assert tb.doclens[2] == 4

    assert "supercalifragilisticexpialidocious" not in maps[3]
    assert maps[3]["ok"] == (1, [2])

    assert not maps[4] and tb.doclens[4] == 0
    assert not maps[5] and tb.doclens[5] == 0

    # stemming: raw + stem when different, sharing positions
    m = maps[6]
    assert m["cats"] == (1, [5])
    assert m["cat"] == (2, [2, 5])       # raw 'cat' at 2, stem of 'cats' at 5
    assert m["running"] == (1, [6])
    assert m["run"] == (1, [6])
    assert m["ran"] == (1, [3])
    assert m["the"] == (2, [1, 4])


def test_truncation():
    cfg = IndexConfig()
    text = "aaa " * 3000  # 12000 chars; cut at 10000 -> 2500 full tokens
    tb = tokenize_batch(pa.array([text]), cfg)
    assert tb.doclens[0] == 2500


def test_matches_oracle_on_corpus():
    cfg = IndexConfig()
    table = make_transcripts(n_convs=40, turns_per_conv=5, seed=42)
    texts = table["text"].combine_chunks()
    tb = tokenize_batch(texts, cfg)
    maps = _batch_to_docmaps(tb, len(texts))
    for i in range(len(texts)):
        got = maps[i]
        want_terms, want_doclen = oracle_tokenize(texts[i].as_py(), cfg)
        want = {t: (tf, pos) for t, (tf, pos) in want_terms.items()}
        assert tb.doclens[i] == want_doclen, i
        assert got == want, (i, set(got) ^ set(want))


def test_no_stemming_mode():
    cfg = IndexConfig(stemming=False)
    tb = tokenize_batch(pa.array(["cats running"]), cfg)
    maps = _batch_to_docmaps(tb, 1)
    assert set(maps[0]) == {"cats", "running"}


def test_analyze_query():
    terms, so = analyze_query("Running MEETINGS of the engine")
    # 'of'/'the' are stopwords; rest stemmed
    assert terms == ["run", "meet", "engin"]
    assert not so

    terms, so = analyze_query("the of and")
    assert so and terms  # stopword-only: kept, flagged

    terms, so = analyze_query("http com")  # skip-list only -> nothing
    assert terms == [] and not so

    terms, so = analyze_query("cats CATS cat")
    assert terms == ["cat"]


def test_count_tokens_matches_split(ray_session):
    """The doclen-only count kernel (stage-A fast path) must equal
    split_tokens_arrow's doclens on adversarial strings and on the
    synthetic corpus, for both html-stripping configs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from search_engine_ray.functions.analysis import (
        count_tokens_arrow,
        split_tokens_arrow,
    )

    fixed = pa.array(
        ["", None, "   ", "a", "A!B?c", "héllo wörld", "İstanbul K x",
         "<b>html</b> & <i>tags</i>", "x" * 20_000, "1a2b3c", "\t\n ",
         "ab" * 6_000],
        pa.string(),
    )
    corpus = make_transcripts(n_convs=50, turns_per_conv=5)["text"].combine_chunks()
    for cfg in (IndexConfig(), IndexConfig(strip_html=False)):
        for texts in (fixed, corpus):
            *_, want = split_tokens_arrow(texts, cfg)
            got = count_tokens_arrow(texts, cfg)
            assert np.array_equal(want, got)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.text(max_size=300), max_size=8))
    def prop(texts):
        arr = pa.array(texts, pa.string())
        cfg = IndexConfig()
        *_, want = split_tokens_arrow(arr, cfg)
        assert np.array_equal(want, count_tokens_arrow(arr, cfg))

    prop()
