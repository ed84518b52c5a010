"""Local stand-in for the driver's correctness gate: run each
queries()[name](sf_dir) and oracle_sql()[name] via DuckDB on the same
parquet tables; compare row count, column names, and order-insensitive
values. Usage: python tools_verify.py [sf_dir] [name ...]"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]").astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def arrow_of(obj):
    import pyarrow as pa
    import ray

    if isinstance(obj, pa.Table):
        return obj
    if isinstance(obj, pd.DataFrame):
        return pa.Table.from_pandas(obj, preserve_index=False)
    return pa.concat_tables(
        [ray.get(r) for r in obj.to_arrow_refs()], promote_options="permissive"
    )


def dtype_check(name: str, ga, want_arrow) -> list[str]:
    """Driver-style dtype sensitivity: Ray vs DuckDB arrow types must
    agree per column (int64 vs int128/float32 etc. breaks the hash)."""
    import pyarrow as pa

    problems = []
    for field in want_arrow.schema:
        if field.name not in ga.schema.names:
            continue
        gt = ga.schema.field(field.name).type
        wt = field.type
        norm = lambda t: (
            "ts" if pa.types.is_timestamp(t) else
            "str" if (pa.types.is_string(t) or pa.types.is_large_string(t)) else str(t)
        )
        if norm(gt) != norm(wt):
            problems.append(f"{name}: column {field.name}: dtype ray={gt} sql={wt}")
    return problems


def compare(name: str, got, want) -> list[str]:
    problems = []
    got, want = to_pandas(got), to_pandas(want)
    if sorted(got.columns) != sorted(want.columns):
        return [f"{name}: columns differ: ray={sorted(got.columns)} sql={sorted(want.columns)}"]
    if len(got) != len(want):
        problems.append(f"{name}: row count {len(got)} vs {len(want)}")
    g, w = canon(got), canon(want)
    if len(g) == len(w):
        for c in g.columns:
            a, b = g[c], w[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                import numpy as np

                if not np.allclose(a.astype(float), b.astype(float), atol=1e-9, equal_nan=True):
                    bad = (~np.isclose(a.astype(float), b.astype(float), atol=1e-9)).sum()
                    problems.append(f"{name}: column {c}: {bad} float mismatches")
            elif not a.equals(b):
                bad = (a != b).sum()
                if bad == 0:
                    # values equal but Series.equals is dtype-sensitive:
                    # report the dtype gap instead of "0 mismatches"
                    problems.append(
                        f"{name}: column {c}: values equal but pandas dtype "
                        f"ray={a.dtype} sql={b.dtype}"
                    )
                else:
                    problems.append(f"{name}: column {c}: {bad} mismatches (e.g. {a[a!=b].head(3).tolist()} vs {b[a!=b].head(3).tolist()})")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries = e.queries()
    oracles = e.oracle_sql()
    n_bad = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        # one try around the WHOLE per-op path: lazy Ray datasets raise
        # at materialization (arrow_of/to_pandas), and compare()/canon()
        # can raise on odd columns — any of those must print [FAIL] and
        # move on, never kill the remaining gate run
        try:
            got = fn(sf_dir)
            if name not in oracles:
                df = to_pandas(got)
                print(f"[rows-only] {name}: {len(df)} rows, cols={sorted(df.columns)}")
                continue
            try:
                want_arrow = con.execute(oracles[name]).arrow()
                want = want_arrow.to_pandas()
            except Exception as ex:
                print(f"[FAIL] {name}: SQL raised {type(ex).__name__}: {ex}")
                n_bad += 1
                continue
            got = arrow_of(got)
            problems = compare(name, got, want) + dtype_check(name, got, want_arrow)
        except Exception as ex:
            print(f"[FAIL] {name}: ray raised {type(ex).__name__}: {ex}")
            n_bad += 1
            continue
        if problems:
            n_bad += 1
            for p in problems:
                print(f"[FAIL] {p}")
        else:
            print(f"[ok] {name}: {len(to_pandas(got))} rows")
    ray.shutdown()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
