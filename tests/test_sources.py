"""Multi-format transcript ingestion: jsonl/csv sources produce an
index logically identical to the parquet build."""

import csv
import json

import pyarrow.parquet as pq
import pytest

from search_engine_ray.config import IndexConfig
from search_engine_ray.corpus import write_transcripts
from search_engine_ray.pipelines.build_index import build_index
from search_engine_ray.sources.transcripts import read_transcripts
from search_engine_ray.stages.query import LocalIndex, load_logical_postings


@pytest.fixture(scope="module")
def corpus(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("sources")
    pdir = root / "parquet"
    write_transcripts(str(pdir), n_convs=40, turns_per_conv=5, seed=42, n_files=2)
    rows = []
    for f in sorted(pdir.glob("*.parquet")):
        t = pq.read_table(f)
        for i in range(t.num_rows):
            r = {c: t[c][i].as_py() for c in t.column_names}
            r["ts"] = r["ts"].strftime("%Y-%m-%dT%H:%M:%S")
            rows.append(r)
    jdir = root / "jsonl"
    jdir.mkdir()
    with open(jdir / "part-0.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    cdir = root / "csv"
    cdir.mkdir()
    with open(cdir / "part-0.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    return root


def _build(src_ds_or_path, out):
    build_index(src_ds_or_path, str(out), IndexConfig(doc_bucket_size=512), n_partitions=1)
    return str(out)


def test_jsonl_and_csv_match_parquet(corpus, tmp_path_factory):
    out = tmp_path_factory.mktemp("idx")
    base = _build(str(corpus / "parquet"), out / "parquet")
    want = load_logical_postings(base)
    for fmt in ("jsonl", "csv"):
        ds = read_transcripts(str(corpus / fmt))
        assert ds.count() == 200
        idx = _build(ds, out / fmt)
        got = load_logical_postings(idx)
        assert set(got) == set(want), fmt
        for term in want:
            assert got[term][0].tolist() == want[term][0].tolist(), (fmt, term)
            assert got[term][1].tolist() == want[term][1].tolist(), (fmt, term)
        li = LocalIndex(idx)
        ids, scores = li.search("hash join", k=10, mode="OR")
        base_ids, base_scores = LocalIndex(base).search("hash join", k=10, mode="OR")
        assert ids.tolist() == base_ids.tolist()


def test_missing_column_raises(corpus, ray_session):
    import pyarrow as pa
    from search_engine_ray.sources.transcripts import _coerce

    with pytest.raises(ValueError, match="missing column"):
        _coerce(pa.table({"conv_id": pa.array(["a"], pa.string())}))


def test_coerce_epoch_integers_and_absent_metadata(ray_session):
    """Epoch-integer ts columns must scale by magnitude (a blind
    cast-to-us reads epoch MILLISECONDS as 1970-01-20), and absent
    nullable metadata (tool/role/ts) null-fills instead of crashing —
    JSONL schema inference is per block, so a hard failure would be
    data-placement-dependent."""
    import datetime

    import pyarrow as pa
    from search_engine_ray.sources.transcripts import _coerce

    base = {
        "conv_id": pa.array(["a", "a"], pa.string()),
        "turn_idx": pa.array([0, 1], pa.int64()),
        "text": pa.array(["hello", "world"], pa.string()),
        "role": pa.array(["user", "assistant"], pa.string()),
        "tool": pa.array(["", ""], pa.string()),
    }
    want = datetime.datetime(2024, 8, 18, 16, 53, 20)
    epoch_s = 1724000000
    for vals, unit in ((epoch_s, "s"), (epoch_s * 1000, "ms"),
                      (epoch_s * 1_000_000, "us")):
        t = pa.table({**base, "ts": pa.array([vals, vals], pa.int64())})
        out = _coerce(t)
        assert out["ts"][0].as_py() == want, unit

    # tool/ts absent entirely: null-filled, required columns enforced
    out = _coerce(pa.table({k: v for k, v in base.items() if k != "tool"}))
    assert out["tool"].null_count == 2
    assert out.schema.names == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def test_detect_skips_metadata_files(tmp_path):
    """A checkpoint-committed parquet dir holds _MANIFEST.json, which
    sorts before most uuid shard names — the format probe must skip
    metadata/sidecar files, and unknown extensions must fail loudly."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from search_engine_ray.sources.transcripts import _detect

    pq.write_table(pa.table({"x": pa.array([1])}), str(tmp_path / "aa11_shard.parquet"))
    (tmp_path / "_MANIFEST.json").write_text("{}")
    (tmp_path / "_SUCCESS").write_text("")
    assert _detect(str(tmp_path)) == ("parquet", None)
    with _pytest.raises(ValueError, match="cannot detect"):
        _detect("dump.tsv")


def test_detect_gzip_extension_chain():
    """``.gz`` marks gzip compression; the inner extension carries the
    format. Parquet is internally compressed, so outer .gz is refused
    loudly instead of handing Arrow an unreadable stream."""
    import pytest as _pytest

    from search_engine_ray.sources.transcripts import _detect

    assert _detect("turns.jsonl.gz") == ("jsonl", "gzip")
    assert _detect("turns.ndjson.gz") == ("jsonl", "gzip")
    assert _detect("turns.csv.gz") == ("csv", "gzip")
    assert _detect("turns.csv") == ("csv", None)
    with _pytest.raises(ValueError, match="internally compressed"):
        _detect("turns.parquet.gz")
    with _pytest.raises(ValueError, match="cannot detect"):
        _detect("turns.gz")


def test_gzip_jsonl_and_csv_match_plain(corpus, tmp_path_factory):
    """Gzip-wrapped jsonl/csv stream through Arrow's decompressing
    input inside each read task and coerce to the identical table."""
    import gzip

    root = tmp_path_factory.mktemp("gz")
    for fmt in ("jsonl", "csv"):
        src = corpus / fmt / f"part-0.{fmt}"
        gdir = root / fmt
        gdir.mkdir()
        with open(src, "rb") as fin, gzip.open(
            gdir / f"part-0.{fmt}.gz", "wb"
        ) as fout:
            fout.write(fin.read())
        plain = read_transcripts(str(corpus / fmt)).to_pandas()
        gz = read_transcripts(str(gdir)).to_pandas()
        key = ["conv_id", "turn_idx"]
        assert gz.sort_values(key).reset_index(drop=True).equals(
            plain.sort_values(key).reset_index(drop=True)
        ), fmt
