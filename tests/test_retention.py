"""Cohort retention triangle (events_retention): handcrafted truth +
degenerate shapes. Oracle parity runs in the gate (tools_verify)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from search_engine_ray.ops import relational


def _write_events(tmp_path, rows):
    """rows: list of (user_id, iso_ts_string)."""
    n = len(rows)
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(
            pd.to_datetime([ts for _, ts in rows]).astype("datetime64[us]"),
            pa.timestamp("us"),
        ),
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
        "event_type": pa.array(["click"] * n),
        "value": pa.array(np.zeros(n), pa.float64()),
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_retention_handcrafted(ray_session, tmp_path):
    """Two cohorts; weeks start Monday (2026-01-05 is a Monday).
    Cohort A (users 1, 2) first active in week of Jan 5:
      u1 returns week+1 and week+2; u2 returns week+1 only.
    Cohort B (user 3) first active week of Jan 12, returns week+2.
    Duplicate events inside a (user, week) must not double-count."""
    sf = _write_events(tmp_path, [
        (1, "2026-01-05 10:00:00"),   # A offset 0
        (1, "2026-01-07 09:00:00"),   # same week dup
        (2, "2026-01-09 23:59:59"),   # A offset 0 (Fri of week Jan 5)
        (1, "2026-01-12 00:00:00"),   # A offset 1
        (2, "2026-01-14 12:00:00"),   # A offset 1
        (1, "2026-01-19 08:00:00"),   # A offset 2
        (3, "2026-01-12 11:00:00"),   # B offset 0
        (3, "2026-01-26 11:00:00"),   # B offset 2
    ])
    df = relational.events_retention(sf).to_pandas()
    df["cohort_week"] = df["cohort_week"].astype("datetime64[us]")
    got = {
        (str(r.cohort_week.date()), int(r.week_offset)): int(r.n_users)
        for r in df.itertuples()
    }
    assert got == {
        ("2026-01-05", 0): 2,
        ("2026-01-05", 1): 2,
        ("2026-01-05", 2): 1,
        ("2026-01-12", 0): 1,
        ("2026-01-12", 2): 1,
    }


def test_retention_empty_events(ray_session, tmp_path):
    sf = _write_events(tmp_path, [])
    assert relational.events_retention(sf).count() == 0


def test_retention_single_user_single_week(ray_session, tmp_path):
    sf = _write_events(tmp_path, [(7, "2026-03-03 00:00:00"),
                                  (7, "2026-03-04 00:00:00")])
    df = relational.events_retention(sf).to_pandas()
    assert len(df) == 1
    assert int(df["week_offset"].iloc[0]) == 0
    assert int(df["n_users"].iloc[0]) == 1


def test_events_lag_handcrafted(ray_session, tmp_path):
    """Per-user rank + gap: ranks restart per user; first event gap is
    -1; equal timestamps tie-break by event_id."""
    sf = _write_events(tmp_path, [
        (1, "2026-01-05 10:00:00"),
        (1, "2026-01-05 10:00:01"),
        (2, "2026-01-05 09:00:00"),
        (1, "2026-01-05 10:00:01"),   # same ts as event 1: ties on eid
        (2, "2026-01-06 09:00:00"),
    ])
    df = (relational.events_lag(sf).to_pandas()
          .sort_values(["user_id", "ev_rank"]).reset_index(drop=True))
    assert df["event_id"].tolist() == [0, 1, 3, 2, 4]
    assert df["ev_rank"].tolist() == [1, 2, 3, 1, 2]
    assert df["gap_us"].tolist() == [-1, 1_000_000, 0, -1, 86_400_000_000]


def test_events_lag_empty(ray_session, tmp_path):
    sf = _write_events(tmp_path, [])
    assert relational.events_lag(sf).count() == 0


def test_events_hll_accuracy(ray_session, tmp_path):
    """HLL estimate within 5% of truth (std error at m=4096 is ~1.6%),
    across both the linear-counting and raw regimes."""
    rows = []
    # type 'a': 5000 distinct users (raw-estimator regime for m=4096
    # starts ~2.5m=10240, so this is linear counting), each seen twice
    for u in range(5000):
        rows.append((u, "2026-01-05 10:00:00"))
        rows.append((u, "2026-01-06 10:00:00"))
    sf = _write_events(tmp_path, rows)
    # rewrite with event_type split: first 5000 rows 'a', rest 'b'
    import pyarrow.parquet as pq_
    import pyarrow as pa_
    t = pq_.read_table(str(tmp_path / "events.parquet"))
    et = ["a"] * t.num_rows
    t = t.set_column(t.schema.get_field_index("event_type"),
                     "event_type", pa_.array(et))
    pq_.write_table(t, str(tmp_path / "events.parquet"))
    df = relational.events_hll(sf).to_pandas()
    assert len(df) == 1
    est = float(df["hll_distinct"].iloc[0])
    assert abs(est - 5000) / 5000 < 0.05, est


def test_events_hll_duplicates_do_not_inflate(ray_session, tmp_path):
    """The sketch is a pure function of the distinct user set: 100
    events from 3 users estimate ~3."""
    rows = [(u % 3, f"2026-01-05 10:00:{s % 60:02d}") for s, u in
            enumerate(range(100))]
    sf = _write_events(tmp_path, rows)
    df = relational.events_hll(sf).to_pandas()
    est = float(df["hll_distinct"].iloc[0])
    assert 2.5 < est < 3.5, est


def test_events_hll_empty(ray_session, tmp_path):
    sf = _write_events(tmp_path, [])
    assert relational.events_hll(sf).count() == 0


def test_events_cms_point_estimates(ray_session, tmp_path):
    """Count-Min point queries: one-sided (est >= truth), exact on a
    sparse stream (no collisions at this density), zero-ish for absent
    probes."""
    rows = []
    for u, n in [(0, 30), (1, 7), (2, 1)]:
        for i in range(n):
            rows.append((u, f"2026-01-05 10:{i:02d}:00"))
    sf = _write_events(tmp_path, rows)
    df = (relational.events_cms(sf).to_pandas()
          .set_index("user_id")["est_count"])
    assert int(df.loc[0]) >= 30 and int(df.loc[1]) >= 7
    # 38 events into 4x2048 counters: collisions are ~impossible, the
    # estimates are exact
    assert int(df.loc[0]) == 30
    assert int(df.loc[1]) == 7
    assert int(df.loc[2]) == 1
    assert int(df.loc[49]) == 0


def test_events_cms_empty(ray_session, tmp_path):
    sf = _write_events(tmp_path, [])
    df = relational.events_cms(sf).to_pandas()
    assert (df["est_count"] == 0).all() and len(df) == 50


def test_events_quantile_hist_accuracy(ray_session, tmp_path):
    """Histogram deciles track exact quantiles within one bin width on
    a uniform-ish stream; constant columns degenerate to est = value."""
    import pandas as pd

    rows = [(i, f"2026-01-05 10:{i % 60:02d}:00") for i in range(1000)]
    sf = _write_events(tmp_path, rows)
    # overwrite value with a deterministic spread 0..999
    import pyarrow.parquet as pq_
    import pyarrow as pa_
    t = pq_.read_table(str(tmp_path / "events.parquet"))
    vals = np.arange(1000, dtype=np.float64)
    t = t.set_column(t.schema.get_field_index("value"), "value",
                     pa_.array(vals, pa_.float64()))
    pq_.write_table(t, str(tmp_path / "events.parquet"))
    df = relational.events_quantile_hist(sf).to_pandas()
    assert df["q"].tolist() == list(range(1, 10))
    width = 999.0 / 256
    for q, est in zip(df["q"], df["est"]):
        exact = np.quantile(vals, q / 10.0)
        assert abs(est - exact) <= width + 1e-9, (q, est, exact)

    # constant column: every decile equals the constant
    t = t.set_column(t.schema.get_field_index("value"), "value",
                     pa_.array(np.full(1000, 7.5), pa_.float64()))
    pq_.write_table(t, str(tmp_path / "events.parquet"))
    df2 = relational.events_quantile_hist(sf).to_pandas()
    assert (df2["est"] == 7.5).all() and len(df2) == 9


def test_events_quantile_hist_empty(ray_session, tmp_path):
    sf = _write_events(tmp_path, [])
    assert relational.events_quantile_hist(sf).num_rows == 0


def test_events_rollup_levels(ray_session, tmp_path):
    """Three grains: (type, day), (type, ALL), (ALL, ALL); coarser
    levels equal sums of finer ones."""
    rows = [(1, "2026-01-05 10:00:00"), (2, "2026-01-05 11:00:00"),
            (1, "2026-01-06 10:00:00")]
    sf = _write_events(tmp_path, rows)
    df = relational.events_rollup(sf).to_pandas()
    total = df[(df["event_type"] == "ALL") & (df["day"] == "ALL")]
    assert len(total) == 1 and int(total["n"].iloc[0]) == 3
    fine = df[(df["event_type"] != "ALL") & (df["day"] != "ALL")]
    per_type = df[(df["event_type"] != "ALL") & (df["day"] == "ALL")]
    assert int(fine["n"].sum()) == 3
    assert int(per_type["n"].sum()) == 3
    assert int(fine["cents"].sum()) == int(total["cents"].iloc[0])


def test_events_rollup_empty(ray_session, tmp_path):
    sf = _write_events(tmp_path, [])
    assert relational.events_rollup(sf).num_rows == 0
