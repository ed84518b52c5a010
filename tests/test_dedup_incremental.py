"""dedup_incremental on a fixture with planted collisions across the
existing/new split (doc_id % 5 == 4 is 'new'): a new doc duplicating
an existing one drops with dup_of pointing at it, two new docs sharing
a fresh text keep only the smaller id, and unique new docs keep."""

import pyarrow as pa
import pyarrow.parquet as pq

from search_engine_ray.ops.dedup import dedup_incremental


def test_dedup_incremental_statuses(ray_session, tmp_path):
    texts = {
        0: "existing doc alpha",       # existing
        1: "existing doc beta",        # existing
        2: "existing doc gamma",       # existing
        3: "existing doc delta",       # existing
        4: "existing doc alpha",       # NEW, copies doc 0 -> dup_existing
        5: "existing doc epsilon",     # existing
        9: "brand new zeta",           # NEW, unique -> keep
        14: "brand new shared eta",    # NEW, first of a new-only pair -> keep
        19: "brand new shared eta",    # NEW, second -> dup_new of 14
        24: "brand new theta",         # NEW, unique -> keep
    }
    ids = sorted(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([texts[i] for i in ids], pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )

    out = (
        dedup_incremental(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )

    assert set(out.index) == {4, 9, 14, 19, 24}  # only NEW docs reported
    assert out.loc[4, "status"] == "dup_existing" and out.loc[4, "dup_of"] == 0
    assert out.loc[9, "status"] == "keep" and out.loc[9, "dup_of"] == -1
    assert out.loc[14, "status"] == "keep" and out.loc[14, "dup_of"] == -1
    assert out.loc[19, "status"] == "dup_new" and out.loc[19, "dup_of"] == 14
    assert out.loc[24, "status"] == "keep" and out.loc[24, "dup_of"] == -1
