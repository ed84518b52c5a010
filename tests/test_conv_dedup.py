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
