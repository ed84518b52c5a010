"""Driver contract: entry() smoke, queries() vs oracle_sql() gate.

Ray is initialised by the driver BEFORE this module is imported — no
ray.init()/ray.shutdown() here or in the library code these call.

Every implemented operator from SURVEY.md §2 (plus the training-data
ops) has a ``queries()`` entry; SQL-expressible ones have a matching
``oracle_sql()`` entry with identical column names. Money/float columns
are integer cents or explicitly rounded on BOTH sides so value hashes
cannot diverge on float summation order.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from search_engine_ray.ops import relational
from search_engine_ray.ops import text_ops
from search_engine_ray.ops import dedup
from search_engine_ray.ops import knn
from search_engine_ray.ops import search_ops
from search_engine_ray.ops import graph
from search_engine_ray.ops import multimodal
from search_engine_ray.ops import prepare


def entry() -> Any:
    """Flagship pipeline at sf0.001: build the full inverted index over
    the transcripts derived from ``documents`` and evaluate the
    reference query set with BM25; returns the top-k result table."""
    return search_ops.flagship("/root/testdata/sf0.001")


# Core engine first: the driver's gate evaluates at most 50 entries in
# dict-insertion order, so the search/ranking surface leads and the
# generic dataflow entries close the list. Total is exactly 50
# (closely-related operators share tag-column union entries — see the
# "consolidated gate entries" sections in each ops module).
_MODULES = (search_ops, graph, prepare, multimodal, text_ops, dedup, knn, relational)


def queries() -> dict[str, Callable[[str], Any]]:
    out: dict[str, Callable[[str], Any]] = {}
    for m in _MODULES:
        out.update(m.RAY_QUERIES)
    # auxiliary entries AFTER the 50-entry driver window (never
    # displace a core entry; tools_verify still checks them)
    for m in _MODULES:
        out.update(getattr(m, "RAY_QUERIES_AUX", {}))
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLE_SQL)
    for m in _MODULES:
        out.update(getattr(m, "ORACLE_SQL_AUX", {}))
    return out
