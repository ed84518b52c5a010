"""Transcript ingestion from parquet / JSONL / CSV.

The reference ingests from its KVS tables (range-partitioned scan) and
raw HTTP fetches; the rebuild's canonical source is Parquet
(``io.read_parquet_clean``), and this module widens ingestion to the
other formats transcript dumps actually arrive in — newline-delimited
JSON and CSV — normalizing every source to the ``input_hint`` schema::

    conv_id: string, turn_idx: int32, role: string,
    text: string, tool: string, ts: timestamp[us]

All readers are Ray Data native (streaming, no driver materialize);
the coercion runs as a vectorized ``map_batches``. ``build_index``
accepts the returned Dataset directly.
"""

from __future__ import annotations

import glob as _glob
import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..io import read_parquet_clean

SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


_REQUIRED = {"conv_id", "turn_idx", "text"}  # the identity + payload


def _coerce(t: pa.Table) -> pa.Table:
    cols = {}
    for field in SCHEMA:
        if field.name not in t.column_names:
            if field.name in _REQUIRED:
                raise ValueError(
                    f"transcript source missing column {field.name!r}"
                )
            # nullable metadata (tool/role/ts) is legitimately absent
            # from real dumps — and JSONL schema inference is per
            # block, so hard-failing here would make ingestion crash
            # or not depending on which rows landed in which block
            cols[field.name] = pa.nulls(t.num_rows, field.type)
            continue
        col = t[field.name]
        if pa.types.is_timestamp(field.type) and (
            pa.types.is_string(col.type) or pa.types.is_large_string(col.type)
        ):
            # ISO-ish variants seen in real dumps: 'T' or ' ' separator,
            # optional fractional seconds, optional trailing 'Z'. Arrow's
            # timestamp cast handles all of these; fall back to strict
            # strptime formats for anything the cast rejects
            attempts = [
                lambda c: pc.cast(c, pa.timestamp("us")),
                # trailing 'Z': parse as UTC-aware, then drop the zone
                # (values are already UTC wall time)
                lambda c: pc.cast(pc.cast(c, pa.timestamp("us", tz="UTC")), pa.timestamp("us")),
                lambda c: pc.strptime(c, format="%Y-%m-%dT%H:%M:%S", unit="us"),
                lambda c: pc.strptime(c, format="%Y-%m-%d %H:%M:%S", unit="us"),
                lambda c: pc.strptime(c, format="%Y-%m-%d", unit="us"),
            ]
            last_err = None
            for parse in attempts:
                try:
                    col = parse(col)
                    break
                except pa.ArrowInvalid as ex:
                    last_err = ex
            else:
                raise ValueError(
                    f"unparseable ts strings (tried ISO/UTC casts + 3 formats): {last_err}"
                )
        elif pa.types.is_timestamp(field.type) and pa.types.is_integer(col.type):
            # epoch integers: a blind cast to timestamp('us') would
            # reinterpret seconds/millis AS microseconds (1970-01-20
            # instead of 2024). Scale by magnitude — the unit bands are
            # unambiguous for any date between 1971 and 5138.
            mags = pc.abs(pc.cast(col, pa.int64()))
            top = pc.max(mags).as_py() or 0
            if top < 10**11:        # epoch seconds
                factor = 1_000_000
            elif top < 10**14:      # epoch milliseconds
                factor = 1_000
            else:                   # already microseconds
                factor = 1
            col = pc.multiply(pc.cast(col, pa.int64()), pa.scalar(factor, pa.int64()))
        cols[field.name] = pc.cast(col, field.type)
    return pa.table(cols)


def _detect(path: str) -> tuple[str, str | None]:
    """(format, compression) from the file extension chain; a trailing
    ``.gz`` means gzip-compressed text (``turns.jsonl.gz``)."""
    p = path
    if os.path.isdir(path):
        hits = sorted(_glob.glob(os.path.join(path, "*")))
        # metadata/sidecar files (_MANIFEST.json, _SUCCESS, .crc) must
        # never be the format probe: '_' sorts before most uuid shard
        # names, so a checkpoint-committed parquet dir would otherwise
        # nondeterministically detect as jsonl
        files = [
            h for h in hits
            if os.path.isfile(h) and not h.endswith("_DONE")
            and not os.path.basename(h).startswith(("_", "."))
        ]
        if not files:
            raise ValueError(f"no data files under {path}")
        p = files[0]
    stem, ext = os.path.splitext(p)
    ext = ext.lower()
    compression = None
    if ext == ".gz":
        compression = "gzip"
        ext = os.path.splitext(stem)[1].lower()
    fmt = {
        ".parquet": "parquet",
        ".json": "jsonl", ".jsonl": "jsonl", ".ndjson": "jsonl",
        ".csv": "csv",
    }.get(ext)
    if fmt is None:
        raise ValueError(
            f"cannot detect transcript format from {p!r} — pass "
            "format='parquet'|'jsonl'|'csv'"
        )
    if fmt == "parquet" and compression:
        raise ValueError(
            f"{p!r}: parquet is internally compressed — outer .gz "
            "wrapping is not supported"
        )
    return fmt, compression


def read_transcripts(path, format: str | None = None) -> "ray.data.Dataset":
    """Streaming Dataset of transcript turns in the canonical schema.
    ``format``: 'parquet' | 'jsonl' | 'csv'; auto-detected from the
    file extension when omitted. Gzip-compressed text sources
    (``*.jsonl.gz`` / ``*.csv.gz``) are detected from the extension
    chain and streamed through Arrow's gzip-decompressing input stream
    inside each read task — no driver-side decompress, no temp files."""
    probe = path if isinstance(path, str) else path[0]
    if format is None:
        fmt, compression = _detect(probe)
    else:
        # explicit format: never fail on an exotic extension, but still
        # honor a .gz suffix on the path we can see
        fmt = format
        compression = (
            "gzip" if str(probe).lower().endswith(".gz") else None
        )
    open_args = {"compression": compression} if compression else {}
    if fmt == "parquet":
        ds = read_parquet_clean(path)
    elif fmt == "jsonl":
        ds = ray.data.read_json(path, arrow_open_stream_args=open_args)
    elif fmt == "csv":
        ds = ray.data.read_csv(path, arrow_open_stream_args=open_args)
    else:
        raise ValueError(f"unknown transcript format {fmt!r}")
    return ds.map_batches(_coerce, batch_format="pyarrow")
