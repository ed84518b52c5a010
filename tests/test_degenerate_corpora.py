"""Join-family ops must not crash on corpora that make intermediate
datasets empty or tiny: a token-free corpus (null/empty/punctuation
texts), a clean corpus with no duplicates (empty candidate-pair sets),
a dup-heavy corpus (many pairs over few docs — the SIZE/label side of
the verify joins is the small one), and a small-vocab template corpus
(many tf rows over few distinct terms). Ray 2.49's hash-shuffle join
crashes when a partition receives zero blocks from one side —
io.empty_dataset + io.join_np (sized by the SMALLER side) guard every
call site."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_ray.ops import dedup, prepare, text_ops


def _write(path, ids, texts):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(ids), pa.string()),
                "source": pa.array([f"src{i % 3}" for i in ids], pa.string()),
                "n_chars": pa.array([len(t or "") for t in texts], pa.int64()),
            }
        ),
        str(path / "documents.parquet"),
    )


OPS = [
    dedup.dedup_minhash_lsh,
    dedup.dedup_ngram_jaccard,
    dedup.dedup_incremental,
    dedup.dup_span_fraction,
    dedup.dedup_clusters,
    prepare.prepare_corpus,
    prepare.decontaminate,
    text_ops.unigram_logprob,
    text_ops.doc_keywords,
    text_ops.pmi_collocations,
]


@pytest.mark.parametrize("op", OPS, ids=lambda f: f.__name__)
def test_token_free_corpus(ray_session, tmp_path, op):
    _write(tmp_path, [0, 1, 2], [None, "", "!!! ???"])
    res = op(str(tmp_path))
    n = res.num_rows if isinstance(res, pa.Table) else res.count()
    assert n >= 0  # no crash; emptiness is the correct answer here


@pytest.mark.parametrize("op", OPS, ids=lambda f: f.__name__)
def test_clean_corpus_no_duplicates(ray_session, tmp_path, op):
    ids = list(range(50))
    texts = [" ".join(f"uniq{i}word{j}" for j in range(20)) for i in ids]
    _write(tmp_path, ids, texts)
    res = op(str(tmp_path))
    n = res.num_rows if isinstance(res, pa.Table) else res.count()
    assert n >= 0
    if op is dedup.dedup_minhash_lsh or op is dedup.dedup_ngram_jaccard:
        assert n == 0  # genuinely no near-dup pairs
    if op is text_ops.unigram_logprob:
        assert n == 50  # every doc scored


@pytest.mark.parametrize("op", OPS, ids=lambda f: f.__name__)
def test_dup_heavy_small_vocab_corpus(ray_session, tmp_path, op):
    """The small-but-nonempty regime: 60 near-identical docs over a
    tiny vocabulary. The candidate-pair table (~1770 rows) outnumbers
    the per-doc sizes/labels table (60 rows) and the tf table
    outnumbers the distinct-term table — joins sized by the BIG side
    would leave small-side-empty partitions and crash Ray's hash
    join. Also pins correctness: the clone cluster must come back."""
    ids = list(range(60))
    base = " ".join(f"common{j}" for j in range(12))
    texts = [base + f" tail{i % 4}" for i in ids]
    _write(tmp_path, ids, texts)
    res = op(str(tmp_path))
    n = res.num_rows if isinstance(res, pa.Table) else res.count()
    if op is dedup.dedup_ngram_jaccard:
        assert n >= 60 * 59 // 4  # dense near-dup pair set survives
    if op is dedup.dedup_clusters:
        df = res.to_pandas()
        assert df["cluster_id"].nunique() <= 4  # ≤ one cluster per tail
    if op is text_ops.doc_keywords:
        assert n == 60 * 3  # top-3 keywords for every doc
    if op is text_ops.unigram_logprob:
        assert n == 60


def test_fully_empty_corpus(ray_session, tmp_path):
    """Zero-row documents table: every doc-table op must return an
    empty result without crashing. Pins the transcripts-cache fix
    (write_parquet of an empty derivation emits NO files, which left
    an unreadable cache dir for conv_stats) and the typed-empty-union
    guards on the survivor/stats reducers."""
    from search_engine_ray.ops import search_ops

    _write(tmp_path, [], [])
    for op in [dedup.dedup_exact, dedup.dedup_minhash_lsh,
               prepare.prepare_corpus, text_ops.unigram_logprob,
               search_ops.conv_stats]:
        res = op(str(tmp_path))
        n = res.num_rows if isinstance(res, pa.Table) else res.count()
        assert n == 0, op.__name__


def test_empty_tpch_tables(ray_session, tmp_path):
    """Zero-row relational inputs: joins must early-exit (Ray 2.49's
    hash-shuffle join crashes when a partition receives zero blocks
    from one side), and a left join against an empty right side must
    still return every left row with the fill value."""
    import os
    from search_engine_ray.ops import relational

    src = "/root/testdata/sf0.001"
    for t in ("customer", "orders", "lineitem"):
        pq.write_table(
            pq.read_table(os.path.join(src, f"{t}.parquet")).slice(0, 0),
            str(tmp_path / f"{t}.parquet"),
        )
    assert relational.analytics_q3(str(tmp_path)).count() == 0
    assert relational.flame_cogroup(str(tmp_path)).count() == 0

    # customers present, orders empty: all customers, n_orders == 0
    pq.write_table(
        pq.read_table(os.path.join(src, "customer.parquet")),
        str(tmp_path / "customer.parquet"),
    )
    df = relational.flame_cogroup(str(tmp_path)).to_pandas()
    assert len(df) == pq.read_metadata(
        os.path.join(src, "customer.parquet")).num_rows
    assert (df["n_orders"] == 0).all()
    assert sorted(df.columns) == ["acctbal_cents", "c_custkey", "n_orders"]
