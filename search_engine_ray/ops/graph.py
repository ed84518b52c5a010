"""Graph / iterative operators for the correctness gate (SURVEY.md §2.4).

The reference runs PageRank over its crawl link graph
(`/root/reference/src/cis5550/jobs/PageRank.java`); the driver tables
carry no link graph, so the gate derives a deterministic bipartite one
from ``lineitem``: order-node ``2*l_orderkey`` <-> part-node
``2*l_partkey+1``, edges in both directions (popular parts make hot
nodes — real skew). The gate entry runs a FIXED number of epochs so an
unrolled SQL oracle can reproduce it exactly; the convergence-driven
variant is exercised in tests/test_pagerank.py against a numpy oracle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..io import read_parquet_light

from ..pipelines.pagerank import pagerank

_EPOCHS = 4
# subset keeps the gate fast while preserving skew
_PRED = "l_orderkey % 5 = 0"


def _edges(sf_dir: str) -> "ray.data.Dataset":
    ds = read_parquet_light(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def to_edges(t: pa.Table) -> pa.Table:
        import numpy as np

        ok = t["l_orderkey"].to_numpy()
        pk = t["l_partkey"].to_numpy()
        keep = ok % 5 == 0
        ok, pk = ok[keep], pk[keep]
        order_node = 2 * ok
        part_node = 2 * pk + 1
        return pa.table(
            {
                "src": pa.array(np.concatenate([order_node, part_node]), pa.int64()),
                "dst": pa.array(np.concatenate([part_node, order_node]), pa.int64()),
            }
        )

    return ds.map_batches(to_edges, batch_format="pyarrow")


def pagerank_fixed(sf_dir: str):
    ranks, _ = pagerank(
        _edges(sf_dir), max_epochs=_EPOCHS, conv_p=2.0  # conv_p>1: never early-stop
    )
    return ranks.map_batches(
        lambda t: pa.table(
            {"node": t["node"], "rank_r6": pc.round(t["rank"], 6)}
        ),
        batch_format="pyarrow",
    )


def _sql_pagerank_fixed(epochs: int) -> str:
    head = f"""
WITH raw_edges AS (
    SELECT 2 * l_orderkey AS src, 2 * l_partkey + 1 AS dst
    FROM lineitem WHERE {_PRED}
    UNION ALL
    SELECT 2 * l_partkey + 1 AS src, 2 * l_orderkey AS dst
    FROM lineitem WHERE {_PRED}
),
edges AS (SELECT DISTINCT src, dst FROM raw_edges),
deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM raw_edges
          UNION SELECT DISTINCT dst AS node FROM raw_edges),
r0 AS (SELECT node, 1.0::DOUBLE AS r FROM nodes)"""
    steps = []
    for k in range(1, epochs + 1):
        steps.append(f""",
r{k} AS (
    SELECT n.node,
           0.15 + 0.85 * COALESCE(SUM(p.r / deg.d), 0) AS r
    FROM nodes n
    LEFT JOIN edges e ON e.dst = n.node
    LEFT JOIN r{k - 1} p ON p.node = e.src
    LEFT JOIN deg ON deg.src = e.src
    GROUP BY n.node
)""")
    return head + "".join(steps) + f"""
SELECT node, ROUND(r, 6) AS rank_r6 FROM r{epochs}
"""


RAY_QUERIES = {
    "pagerank_fixed": pagerank_fixed,
}

ORACLE_SQL = {
    "pagerank_fixed": _sql_pagerank_fixed(_EPOCHS),
}
