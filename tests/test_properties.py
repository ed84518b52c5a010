"""Property-based tests (hypothesis) for the codec and merge algebra —
beyond the reference's golden-output-only strategy (SURVEY.md §5)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from search_engine_ray.functions import varbyte as vb
from search_engine_ray.functions.stemmer import CachingStemmer
from search_engine_ray.functions.analysis import analyze_query
from search_engine_ray.config import IndexConfig


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200))
def test_varbyte_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert vb.decode(vb.encode(arr)).tolist() == values


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=100),
       st.data())
def test_varbyte_offsets_slices(values, data):
    """encode_offsets slices must each decode to their sub-array."""
    arr = np.array(values, dtype=np.uint64)
    n_cuts = data.draw(st.integers(min_value=0, max_value=min(5, len(values))))
    cuts = sorted(data.draw(st.lists(
        st.integers(min_value=0, max_value=len(values)),
        min_size=n_cuts, max_size=n_cuts)))
    offsets = np.array([0] + cuts + [len(values)], dtype=np.int64)
    blob, boffs = vb.encode_offsets(arr, offsets)
    for i in range(len(offsets) - 1):
        part = vb.decode(blob[boffs[i]:boffs[i + 1]])
        assert part.tolist() == values[offsets[i]:offsets[i + 1]]


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=50,
                unique=True))
def test_delta_roundtrip(ids):
    ids = sorted(ids)
    arr = np.array(ids, dtype=np.int64)
    assert vb.delta_decode(vb.delta_encode(arr)).tolist() == ids


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**6), min_size=2, max_size=60,
                unique=True))
def test_rebase_concat_equals_whole(ids):
    """Splitting a posting list, encoding the halves, and concatenating
    with rebase_first must equal encoding the whole list — the merge
    stage's core algebra."""
    ids = sorted(ids)
    cut = len(ids) // 2
    whole = vb.encode(vb.delta_encode(np.array(ids, dtype=np.int64)))
    a = vb.encode(vb.delta_encode(np.array(ids[:cut], dtype=np.int64)))
    b = vb.encode(vb.delta_encode(np.array(ids[cut:], dtype=np.int64)))
    joined = a + vb.rebase_first(b, ids[cut] - ids[cut - 1])
    assert joined == whole


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=127), max_size=80))
def test_stemmer_total(word):
    """The stemmer never raises and is idempotent-safe on its own
    output for ascii-lowercase inputs (guard: <=2-char unchanged)."""
    st_ = CachingStemmer()
    w = "".join(c for c in word.lower() if c.isalpha())
    out = st_.stem(w)
    assert isinstance(out, str)
    if len(w) <= 2:
        assert out == w


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=120))
def test_analyze_query_total(q):
    """Query analyzer never raises on arbitrary unicode, returns only
    nonempty lowercase alnum terms within the length cap."""
    cfg = IndexConfig()
    terms, stopword_only = analyze_query(q, cfg)
    for t in terms:
        assert t and len(t) <= cfg.max_word_len
        assert t == t.lower()


def test_shingle_batch_matches_naive():
    """Vectorized Arrow shingling == naive per-doc implementation
    (distinct trigram strings; short docs one whole-doc shingle)."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    from hypothesis import given, settings, strategies as st

    from search_engine_ray.ops.dedup import _shingle_batch

    token = st.text(alphabet="abc12", min_size=1, max_size=4)
    doc = st.lists(token, min_size=0, max_size=12).map(" ".join)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=6))
    def check(texts):
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts)) * 7, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        got = _shingle_batch(t, hashed=True)
        got_sets: dict[int, set] = {}
        for d, h in zip(got["doc_id"].to_pylist(), got["sh"].to_pylist()):
            got_sets.setdefault(d, set()).add(h)
        for i, text in enumerate(texts):
            toks = [w for w in text.lower().split() if w]
            if not toks:
                want = set()
            elif len(toks) < 3:
                want = {" ".join(toks)}
            else:
                want = {" ".join(toks[j:j + 3]) for j in range(len(toks) - 2)}
            want_h = {int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in want}
            assert got_sets.get(i * 7, set()) == want_h, (i, text)

    check()
