"""CLI smoke: the job-submission surface must work as a real process
(catches import/arg-wiring regressions no in-process test sees)."""

import json
import os
import subprocess
import sys

import pytest

from search_engine_ray.corpus import write_transcripts


@pytest.mark.parametrize("fmt", ["parquet"])
def test_cli_build_query_compact(tmp_path, fmt):
    src = str(tmp_path / "src")
    write_transcripts(src, n_convs=30, turns_per_conv=5, seed=42, n_files=2)
    idx = str(tmp_path / "idx")
    env = dict(os.environ, RAY_GRAFT_CPUS="4")

    def run(*args):
        return subprocess.run(
            [sys.executable, "-m", "search_engine_ray", *args],
            capture_output=True, text=True, env=env, timeout=900,
            cwd="/root/repo",
        )

    r = run("build", "--source", src, "--index", idx, "-p", "2")
    assert r.returncode == 0, r.stderr[-2000:]
    meta = json.loads(r.stdout[r.stdout.index("{"):])
    assert meta["N"] == 150

    r = run("query", "--index", idx, "running meetings", "-k", "5")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "doc_id" in r.stdout and "snippet" in r.stdout

    r = run("query", "--index", idx, "running meetings", "-k", "5", "--phrase")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "doc_id" in r.stdout

    # composed query syntax in ONE string: quoted clause + boost +
    # wildcard + exclusion (quoted clauses auto-load positions)
    r = run("query", "--index", idx, '"the running" meet* ponies^2 -zzz',
            "-k", "5", "--mode", "OR")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "doc_id" in r.stdout

    r = run("query", "--index", idx, "running -meetings", "-k", "5",
            "--facets", "running,meetings")
    assert r.returncode == 0, r.stderr[-2000:]
    fc = json.loads(r.stdout[r.stdout.index('{\n "facets"'):])
    assert fc["facets"]["running"] > 0 and fc["facets"]["meetings"] == 0

    r = run("suggest", "--index", idx, "run", "-k", "5")
    assert r.returncode == 0, r.stderr[-2000:]
    sg = json.loads(r.stdout[r.stdout.index("{"):])
    assert sg["q"] == "run"
    assert any(s["term"].startswith("run") and s["df"] > 0
               for s in sg["suggestions"])

    r = run("compact", "--index", idx, "-p", "1")
    assert r.returncode == 0, r.stderr[-2000:]
    meta = json.loads(r.stdout[r.stdout.index("{"):])
    assert meta["timings"]["compacted"]

    r = run("stats", idx)
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(r.stdout[r.stdout.index("{"):])
    assert stats["N"] == 150
    assert stats["docs"]["fingerprint"]
    assert stats["partitions"] and all(
        p["files"] > 0 and p["bytes"] > 0 for p in stats["partitions"]
    )


def test_cli_mixture(tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(5)
    n = 40
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(
                    [" ".join(f"w{rng.randint(50)}" for _ in range(10)) for _ in range(n)],
                    pa.string(),
                ),
                "source": pa.array([f"src{i % 5}" for i in range(n)], pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = str(tmp_path / "mix")
    r = subprocess.run(
        [sys.executable, "-m", "search_engine_ray", "mixture",
         "--source", str(tmp_path), "--out", out],
        capture_output=True, text=True, timeout=900, cwd="/root/repo",
        env=dict(os.environ, RAY_GRAFT_CPUS="4"),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    info = json.loads(r.stdout[r.stdout.index("{"):])
    assert info["copy_rows"] > 0
    import pyarrow.dataset as pads
    tbl = pads.dataset(out, format="parquet").to_table()
    assert set(tbl.schema.names) == {"doc_id", "source", "copy_idx"}
    assert tbl.num_rows == info["copy_rows"]
