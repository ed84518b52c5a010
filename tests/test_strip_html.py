"""Golden tests for the bracket-counting HTML stripper
(``extract_html`` semantics, Indexer.java:71-105) and its integration
behind ``IndexConfig.strip_html``."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from search_engine_ray.config import IndexConfig
from search_engine_ray.functions.analysis import split_tokens, strip_html


def _reference_token_stream(page: str) -> list[str]:
    """Independent sequential port of the reference's per-char loop
    (flush word at '<', decrement only when depth>0, non-alnum->space),
    followed by the reference's per-segment alnum split — used as the
    oracle for the vectorized implementation."""
    segments, cur, depth = [], "", 0
    for ch in page:
        if ch == "<":
            if cur:
                segments.append(cur)
                cur = ""
            depth += 1
            continue
        if depth > 0 and ch == ">":
            depth -= 1
            continue
        if depth != 0:
            continue
        cur += ch if ch.isalnum() else " "
    if cur:
        segments.append(cur)
    out = []
    for seg in segments:
        out.extend(w for w in seg.split() if w)
    return out


def _engine_tokens(text: str) -> list[str]:
    cfg = IndexConfig(stemming=False, strip_html=True)
    _idx, toks, *_ = split_tokens(pa.array([text.lower()], pa.string()), cfg)
    return list(toks)


GOLDEN = [
    # (input, expected tokens)
    ("plain text no tags", ["plain", "text", "no", "tags"]),
    ("<b>bold</b> word", ["bold", "word"]),
    ("abc<br>def", ["abc", "def"]),              # tag is a word boundary
    ("a <div class='x'>b</div> c", ["a", "b", "c"]),
    ("5 > 3 and 2 < 4", ["5", "3", "and", "2"]),  # '<' opens a never-closed tag
    ("x > y", ["x", "y"]),                        # '>' at depth 0 is ordinary
    ("<a <nested> still-in-tag> out", ["out"]),   # nested bracket counting
    ("before<tag", ["before"]),                   # unclosed tag drops the rest
    ("", []),
    ("<><><>", []),
]


def test_strip_html_golden_cases():
    for text, want in GOLDEN:
        assert _engine_tokens(text) == want, text
        assert _reference_token_stream(text.lower()) == want, text


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="ab <>/=\"'x1", max_size=80))
def test_strip_html_matches_reference_loop(page):
    got = strip_html(page)
    # tokenizing the stripped text must equal the reference loop's stream
    toks = [w for w in "".join(
        c if c.isalnum() else " " for c in got
    ).split() if w]
    assert toks == _reference_token_stream(page)


def test_strip_html_flag_off_keeps_tags():
    cfg = IndexConfig(stemming=False, strip_html=False)
    _idx, toks, *_ = split_tokens(pa.array(["<b>bold</b>"], pa.string()), cfg)
    assert list(toks) == ["b", "bold", "b"]


def test_strip_html_positions_count_only_visible_tokens():
    cfg = IndexConfig(stemming=False, strip_html=True)
    _idx, toks, pos, _lens, doclens = split_tokens(
        pa.array(["one <b>two</b> three"], pa.string()), cfg
    )
    assert list(toks) == ["one", "two", "three"]
    assert list(pos) == [1, 2, 3]
    assert list(doclens) == [3]
