"""conv_dedup must actually collapse duplicate conversations — the
gate corpus has none (every n_dups == 1 there), so the keep-min /
group-count logic needs its own fixture with real whole-conversation
duplicates (doc_id // 5 defines the conversation in the derived
transcript mapping)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from search_engine_ray.ops.search_ops import conv_dedup


def test_conv_dedup_collapses_identical_conversations(ray_session, tmp_path):
    texts5 = [f"turn text number {i} alpha beta" for i in range(5)]
    uniq5 = [f"unique content {i} gamma delta" for i in range(5)]
    texts = texts5 + texts5 + uniq5  # convs 0 and 1 identical, 2 unique
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )

    out = conv_dedup(str(tmp_path)).to_pandas().sort_values("conv_id")
    got = dict(zip(out["conv_id"], out["n_dups"]))
    # the duplicated stream survives once, under the SMALLEST conv_id
    assert got == {"conv-00000000": 2, "conv-00000002": 1}


def test_train_val_test_split_is_conversation_atomic(ray_session):
    """Every turn of a conversation must share one split — the
    group-aware property the op exists for — and the 98/1/1 draw must
    be deterministic across re-runs."""
    from search_engine_ray.ops.search_ops import train_val_test_split

    df = train_val_test_split("/root/testdata/sf0.001").to_pandas()
    per_conv = df.groupby("conv_id")["split"].nunique()
    assert (per_conv == 1).all(), "a conversation straddles splits"
    assert set(df["split"]) <= {"train", "val", "test"}
    again = train_val_test_split("/root/testdata/sf0.001").to_pandas()
    assert df.sort_values(["conv_id", "turn_idx"])["split"].tolist() == \
        again.sort_values(["conv_id", "turn_idx"])["split"].tolist()
