"""CLI entry points — the analog of the reference's job submissions
(`FlameSubmit ... cis5550.jobs.Indexer` / `Search <kvs> <port>`,
`/root/reference/homework_code/flame/FlameSubmit.java:11-59`,
`/root/reference/src/cis5550/jobs/Search.java:198`)::

    python -m search_engine_ray build  --source DIR --index DIR [-p N]
    python -m search_engine_ray extend --source DIR --index DIR [-p N]
    python -m search_engine_ray query  --index DIR "free text" [-k 10] [--mode OR] [--facets a,b]
    python -m search_engine_ray suggest --index DIR "prefi" [-k 10]
    python -m search_engine_ray batch  --index DIR --queries q.parquet --out o.parquet
    python -m search_engine_ray prep   --source DOCS --out DIR
    python -m search_engine_ray mixture --source DOCS --out DIR
    python -m search_engine_ray serve  --index DIR [--port 8080] [--shards N] [--replicas R] [--ann-index DIR]

Owns the Ray session (the only places allowed to: CLI, bench.py, test
fixture — never library code / __ray_entry__.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray():
    os.environ.setdefault("RAY_DATA_DISABLE_PROGRESS_BARS", "1")
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "0")) or None,
            include_dashboard=False,
            logging_level="ERROR",
        )
    return ray


def cmd_build(a) -> int:
    from .config import IndexConfig
    from .pipelines.build_index import build_index

    cfg = IndexConfig(stemming=not a.no_stemming, positions=not a.no_positions)
    source = a.source
    if a.format and a.format != "parquet":
        from .sources.transcripts import read_transcripts

        source = read_transcripts(a.source, format=a.format)
    meta = build_index(source, a.index, cfg, n_partitions=a.partitions)
    print(json.dumps(meta, indent=1))
    return 0


def cmd_extend(a) -> int:
    from .pipelines.build_index import extend_index

    meta = extend_index(a.index, a.source, n_partitions=a.partitions)
    print(json.dumps(meta, indent=1))
    return 0


def cmd_query(a) -> int:
    from .pipelines.search import DocShardedSearcher, ShardedSearcher, materialize_results
    import pandas as pd

    if a.term_sharded:
        if a.phrase:
            print("--phrase requires the doc-sharded tier (the default)")
            return 2
        searcher = ShardedSearcher(a.index, n_shards=a.shards)
    else:
        # quoted '"..."' clauses in the query string need the
        # position blocks too, not just --phrase — auto-load them
        # whenever the index stores positions and the query (or flag)
        # asks for exact-phrase semantics
        from .serve import _positions_enabled

        if '"' in a.text and not _positions_enabled(a.index):
            print('quoted "..." clauses need a positions-built index '
                  "(rebuild without --no-positions)")
            return 2
        need_pos = a.phrase or ('"' in a.text and _positions_enabled(a.index))
        searcher = DocShardedSearcher(
            a.index, n_shards=a.shards, load_positions=need_pos
        )
    if a.phrase:
        ids, scores = searcher.phrase(a.text, k=a.k)
    else:
        ids, scores = searcher.search(a.text, k=a.k, mode=a.mode)
    topk = pd.DataFrame(
        {"rank": range(1, len(ids) + 1), "doc_id": ids, "score": scores}
    )
    out = materialize_results(a.index, topk)
    print(out.to_string(index=False, max_colwidth=60))
    if a.facets:
        fc = getattr(searcher, "facet_counts", None)
        if fc is None:
            print("--facets requires the doc-sharded tier (the default)")
            return 2
        labels = [f.strip() for f in a.facets.split(",") if f.strip()]
        print(json.dumps(
            {"facets": fc(a.text, labels, mode=a.mode)}, indent=1
        ))
    return 0


def cmd_suggest(a) -> int:
    """Autocomplete probe straight off the dictionary files — no Ray
    work beyond the session the CLI owns anyway."""
    from .functions.suggest import PrefixSuggester

    s = PrefixSuggester.from_index(a.index)
    print(json.dumps(
        {"q": a.prefix,
         "suggestions": [{"term": t, "df": d}
                         for t, d in s.suggest(a.prefix, a.k)]},
        indent=1,
    ))
    return 0


def cmd_batch(a) -> int:
    from .io import read_parquet_clean
    from .pipelines.search import evaluate_queries

    qds = read_parquet_clean(a.queries)
    res = evaluate_queries(qds, a.index, mode=a.mode)
    res.write_parquet(a.out)
    print(f"wrote {a.out}")
    return 0


def cmd_prep(a) -> int:
    """Training-data cleanup pass: language filter + quality gate +
    exact dedup + MinHash-LSH near-dup removal over a documents-shaped
    parquet source; survivors written as partitioned parquet."""
    from .ops.prepare import clean_corpus

    info = clean_corpus(a.source, a.out)
    print(json.dumps(info, indent=1))
    return 0


def cmd_mixture(a) -> int:
    """Training-mixture plan: per-source epoch up/downsampling of a
    documents-shaped parquet source; (doc_id, source, copy_idx) rows
    written as partitioned parquet for the downstream tokenizer."""
    import glob
    import os

    from .ops.prepare import mixture_epochs

    import pyarrow.dataset as pads

    if glob.glob(os.path.join(a.out, "*.parquet")):
        # stale output would be double-counted below and double-read by
        # the downstream tokenizer — refuse rather than silently mix
        print(json.dumps({"error": f"output dir {a.out} already has parquet files"}))
        return 1
    ds = mixture_epochs(a.source)
    ds.write_parquet(a.out)
    n = pads.dataset(a.out, format="parquet").count_rows()
    print(json.dumps({"out": a.out, "copy_rows": int(n)}, indent=1))
    return 0


def cmd_compact(a) -> int:
    from .pipelines.build_index import compact_index

    meta = compact_index(a.index, n_partitions=a.partitions)
    print(json.dumps(meta, indent=1))
    return 0


def cmd_serve(a) -> int:
    from .serve import serve

    serve(a.index, port=a.port, n_shards=a.shards, n_replicas=a.replicas,
          ann_dir=a.ann_index)
    return 0


def cmd_stats(a) -> int:
    """Per-partition lineage + metrics without loading the index:
    docs-store manifest (input fingerprint, rows, timings, extension
    history) plus per-partition segment manifests and on-disk bytes."""
    import glob as glob_
    import os

    from .state.checkpoint import read_manifest

    out: dict = {"index_dir": a.index}
    with open(os.path.join(a.index, "meta.json")) as f:
        meta = json.load(f)
    out["N"] = meta.get("N")
    out["avgdl"] = meta.get("avgdl")
    out["config"] = meta.get("config")
    try:
        out["docs"] = read_manifest(os.path.join(a.index, "docs"))
    except (OSError, ValueError):
        # ValueError covers a half-written/corrupt _MANIFEST.json —
        # stats is the post-crash inspection tool, it must keep going
        out["docs"] = None
    parts = []
    for d in sorted(glob_.glob(os.path.join(a.index, "segments", "part=*"))):
        files = sorted(glob_.glob(os.path.join(d, "*.parquet")))
        entry = {
            "partition": os.path.basename(d),
            "files": len(files),
            "bytes": sum(os.path.getsize(f) for f in files),
        }
        try:
            entry["manifest"] = read_manifest(d)
        except (OSError, ValueError):
            entry["manifest"] = None
        parts.append(entry)
    out["partitions"] = parts
    print(json.dumps(out, indent=1))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="search_engine_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an index from transcript parquet")
    b.add_argument("--source", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("-p", "--partitions", type=int, default=8)
    b.add_argument("--no-stemming", action="store_true")
    b.add_argument("--no-positions", action="store_true")
    b.add_argument("--format", choices=["parquet", "jsonl", "csv"],
                   help="transcript source format (default: parquet)")
    b.set_defaults(fn=cmd_build)

    e = sub.add_parser("extend", help="append new turns to an existing index")
    e.add_argument("--source", required=True)
    e.add_argument("--index", required=True)
    e.add_argument("-p", "--partitions", type=int, default=8)
    e.set_defaults(fn=cmd_extend)

    q = sub.add_parser(
        "query",
        help="BM25 top-k for one query ('-term' excludes, 'pre*' "
             "prefix-expands, 'word~' fuzzy-expands)",
    )
    q.add_argument("--index", required=True)
    q.add_argument("text")
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--mode", choices=["AND", "OR"], default="OR")
    q.add_argument("--shards", type=int, default=4)
    q.add_argument("--phrase", action="store_true",
                   help="exact-phrase match over stored positions")
    q.add_argument("--doc-sharded", action="store_true",
                   help=argparse.SUPPRESS)  # no-op compat: now the default
    q.add_argument("--facets", default=None,
                   help="comma-separated facet labels: also print the "
                        "per-facet histogram of the query's full match set")
    q.add_argument("--term-sharded", action="store_true",
                   help="term-range shards (reference analog; ships O(df) "
                        "posting bytes per query — study only, not serving)")
    q.set_defaults(fn=cmd_query)

    bt = sub.add_parser("batch", help="evaluate a parquet of queries")
    bt.add_argument("--index", required=True)
    bt.add_argument("--queries", required=True)
    bt.add_argument("--out", required=True)
    bt.add_argument("--mode", choices=["AND", "OR"], default="AND")
    bt.set_defaults(fn=cmd_batch)

    pr = sub.add_parser(
        "prep",
        help="corpus cleanup (lang + quality + exact/near dedup) -> parquet",
    )
    pr.add_argument("--source", required=True,
                    help="documents-shaped parquet (doc_id, lang, text, ...)")
    pr.add_argument("--out", required=True)
    pr.set_defaults(fn=cmd_prep)

    mx = sub.add_parser("mixture", help="write a per-source epoch-mixture plan")
    mx.add_argument("--source", required=True, help="dir holding documents.parquet")
    mx.add_argument("--out", required=True)
    mx.set_defaults(fn=cmd_mixture)

    cp = sub.add_parser("compact", help="rebuild segment layout after extends")
    cp.add_argument("--index", required=True)
    cp.add_argument("-p", "--partitions", type=int, default=8)
    cp.set_defaults(fn=cmd_compact)

    st = sub.add_parser("stats", help="index lineage + per-partition metrics")
    st.add_argument("index")

    sg = sub.add_parser(
        "suggest", help="prefix autocomplete from the index dictionary"
    )
    sg.add_argument("--index", required=True)
    sg.add_argument("prefix")
    sg.add_argument("-k", type=int, default=10)
    sg.set_defaults(fn=cmd_suggest)
    st.set_defaults(fn=cmd_stats)

    sv = sub.add_parser("serve", help="HTTP /search endpoint over doc shards")
    sv.add_argument("--index", required=True)
    sv.add_argument("--port", type=int, default=8080)
    sv.add_argument("--shards", type=int, default=4)
    sv.add_argument("--replicas", type=int, default=1,
                    help="shard-set replicas (QPS lever when actors saturate)")
    sv.add_argument("--ann-index", default=None,
                    help="build_ann_index output dir; mounts GET/POST /knn")
    sv.set_defaults(fn=cmd_serve)

    a = p.parse_args(argv)
    ray = _init_ray()
    try:
        return a.fn(a)
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
