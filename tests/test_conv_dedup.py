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


def test_context_windows_property_random_conversations(ray_session, tmp_path):
    """The vectorized window-gather must equal a naive per-conversation
    reference on randomized structure: variable turn counts (including
    single-turn convs), shuffled row order, null/empty texts, and turn
    indices that don't start at 0."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from search_engine_ray.ops.search_ops import _CTX_TURNS, conv_context_windows
    from search_engine_ray.ops import search_ops

    rng = np.random.default_rng(17)
    rows = []
    for c in range(40):
        n_turns = int(rng.integers(1, 9))
        base = int(rng.integers(0, 5))  # turn_idx need not start at 0
        for j in range(n_turns):
            r = rng.random()
            text = (None if r < 0.15 else "" if r < 0.25
                    else " ".join(f"w{int(x)}" for x in rng.integers(0, 50, 6)))
            rows.append((f"conv{c:03d}", base + j, text))
    rng.shuffle(rows)

    # the op reads transcripts_dir(sf_dir) — write a fake documents
    # table is the gate path; instead call the internals on a direct
    # transcript parquet by monkeypatching transcripts_dir
    tdir = tmp_path / "tr"
    tdir.mkdir()
    pq.write_table(
        pa.table(
            {
                "conv_id": pa.array([r[0] for r in rows], pa.string()),
                "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                "text": pa.array([r[2] for r in rows], pa.string()),
            }
        ),
        str(tdir / "part.parquet"),
    )
    orig = search_ops.transcripts_dir
    search_ops.transcripts_dir = lambda _sf: str(tdir)
    try:
        got = conv_context_windows("ignored").to_pandas()
    finally:
        search_ops.transcripts_dir = orig

    # naive reference
    expected = {}
    by_conv: dict = {}
    for conv, idx, text in rows:
        by_conv.setdefault(conv, []).append((idx, text or ""))
    for conv, turns in by_conv.items():
        turns.sort()
        texts = [t for _, t in turns]
        for i, (idx, _) in enumerate(turns):
            ctx = " ".join(texts[max(0, i - _CTX_TURNS): i + 1])
            expected[(conv, idx)] = (
                int(hashlib.md5(ctx.encode()).hexdigest()[:15], 16), len(ctx)
            )

    assert len(got) == len(expected)
    for r in got.itertuples(index=False):
        exp = expected[(r.conv_id, r.turn_idx)]
        assert (r.context_hash, r.context_chars) == exp, (r.conv_id, r.turn_idx)
