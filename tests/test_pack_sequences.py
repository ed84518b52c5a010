"""pack_sequences invariants on a fixture that crosses prefix-sum
bucket boundaries and contains empty/null docs: the global token
stream must be gapless in doc_id order, and every doc's sequence span
must be exactly the L-token windows its token span overlaps."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from search_engine_ray.ops.text_ops import pack_sequences


def test_pack_sequences_gapless_across_buckets(ray_session, tmp_path):
    rng = np.random.RandomState(11)
    texts = []
    for i in range(40):
        if i % 9 == 0:
            texts.append("" if i % 18 == 0 else None)  # no tokens
        else:
            texts.append(" ".join(f"word{j}" for j in range(rng.randint(1, 30))))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(40), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )

    L, span = 16, 8  # 5 buckets, tiny sequences
    out = (
        pack_sequences(str(tmp_path), L=L, span=span)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    # empty/null docs are excluded
    assert not set(out.doc_id) & {i for i in range(40) if i % 9 == 0}
    # gapless concat stream: starts at 0, each start = previous end
    assert out.tok_start.iloc[0] == 0
    assert (out.tok_start.iloc[1:].to_numpy() == out.tok_end.iloc[:-1].to_numpy()).all()
    assert (out.tok_end - out.tok_start == out.n_tokens).all()
    # sequence windows: exactly the L-windows the span overlaps
    assert (out.seq_first == out.tok_start // L).all()
    assert (out.seq_last == (out.tok_end - 1) // L).all()
    assert (out.n_seqs == out.seq_last - out.seq_first + 1).all()
    assert (out.n_seqs >= 1).all()
