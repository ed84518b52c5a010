"""profile_table on a fixture with planted nulls and known distincts;
sample_fixed_k invariance to row order and exact-k contract."""

import pyarrow as pa
import pyarrow.parquet as pq

from search_engine_ray.ops.relational import profile_table, sample_fixed_k


def _write_docs(path, ids, texts, langs, sources, n_chars):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "source": pa.array(sources, pa.string()),
                "n_chars": pa.array(n_chars, pa.int64()),
            }
        ),
        str(path / "documents.parquet"),
    )


def test_profile_table_nulls_and_distincts(ray_session, tmp_path):
    _write_docs(
        tmp_path,
        ids=[0, 1, 2, 3],
        texts=["same", "same", None, "other"],
        langs=["en", "en", "en", None],
        sources=["a", "b", "a", "b"],
        n_chars=[4, 4, None, 5],
    )
    out = profile_table(str(tmp_path)).to_pandas().set_index("col")
    assert (out["n_rows"] == 4).all()
    assert out.loc["text", "n_null"] == 1 and out.loc["text", "n_distinct"] == 2
    assert out.loc["lang", "n_null"] == 1 and out.loc["lang", "n_distinct"] == 1
    assert out.loc["source", "n_null"] == 0 and out.loc["source", "n_distinct"] == 2
    assert out.loc["n_chars", "n_null"] == 1 and out.loc["n_chars", "n_distinct"] == 2
    assert out.loc["doc_id", "n_distinct"] == 4


def test_sample_fixed_k_exact_and_order_invariant(ray_session, tmp_path):
    n = 500
    _write_docs(
        tmp_path,
        ids=list(range(n)),
        texts=["t"] * n,
        langs=["en"] * n,
        sources=["s"] * n,
        n_chars=[1] * n,
    )
    a = sample_fixed_k(str(tmp_path), k=50).to_pandas()
    assert len(a) == 50 and a["doc_id"].is_unique

    # same rows written in reverse order -> identical sample
    rev = tmp_path / "rev"
    rev.mkdir()
    ids = list(reversed(range(n)))
    _write_docs(rev, ids=ids, texts=["t"] * n, langs=["en"] * n,
                sources=["s"] * n, n_chars=[1] * n)
    b = sample_fixed_k(str(rev), k=50).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
