"""Iterative PageRank as a Ray Data dataflow (SURVEY.md §2.4).

Reference semantics (`/root/reference/src/cis5550/jobs/PageRank.java:193-290`,
parallel variant `jobs_archive/PageRankParallel.java:210-317`):

- init: every node rank 1.0 (`PageRank.java:218-223`);
- epoch: each node sends ``damping * rank / out_degree`` to every
  outlink (`PageRank.java:267`, ``DECAY``=0.85 `:21`); new rank =
  ``(1 - damping) + received`` — the reference literally adds 0.15
  (`PageRank.java:286-289`), nodes without inlinks settle at 0.15, and
  sink nodes simply drop their mass (no dangling redistribution);
- convergence: fraction of nodes with ``|r1 - r0| < conv_thresh``
  (0.01) at least ``conv_p`` (0.95 parallel `PageRankParallel.java:27`),
  epoch cap (`:311`).

Dataflow shape per epoch — the reference's ``flatMapToPair ->
foldByKey -> join`` (`PageRankParallel.java:210-317`) expressed as:
``edges ⋈ ranks -> map_batches(contribution) -> groupby(dst).sum()
-> nodes left-join received``. Each epoch materializes (the reference's
per-operator barrier); the edge+degree table is joined once up front
and reused every epoch.

Partitioning assumption at scale: both epoch joins hash-partition on
the node id — one key reused across all epochs, so only ``ranks``
(small: 16 bytes/node) reshuffles per epoch, never the text corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

DAMPING = 0.85       # PageRank.java:21 DECAY
CONV_THRESH = 0.01   # PageRank.java:21 CONV_THRESH
CONV_P = 0.95        # PageRankParallel.java:27 CONV_P
MAX_EPOCHS = 100     # PageRankParallel.java:311


def pagerank(
    edges: "ray.data.Dataset",
    damping: float = DAMPING,
    conv_thresh: float = CONV_THRESH,
    conv_p: float = CONV_P,
    max_epochs: int = MAX_EPOCHS,
    num_partitions: int = 8,
) -> tuple["ray.data.Dataset", int]:
    """edges: Dataset with int64 columns (src, dst), duplicates allowed
    (deduped here). Returns (ranks Dataset with (node, rank), epochs).
    """
    # all four reductions here key on node/edge ids whose group counts
    # scale with the graph — partition-vectorized (ops.dedup helpers),
    # never Ray's per-group Python aggregate
    from ..ops.dedup import (_keyed_count_combine, _npart, _reduce_keyed,
                             _reduce_pairs)

    n_sub = _npart() * 8
    edges = _reduce_pairs(edges, n_sub, a_col="src", b_col="dst")
    deg = _reduce_keyed(
        edges, "src", n_sub, _keyed_count_combine("src", "out_deg")
    )
    # (src, dst, out_deg) — static across epochs; join once, keep hot
    ed = edges.join(
        deg, join_type="inner", num_partitions=num_partitions, on=("src",)
    ).materialize()

    nodes = _reduce_keyed(
        edges.select_columns(["src"]).rename_columns({"src": "node"})
        .union(edges.select_columns(["dst"]).rename_columns({"dst": "node"})),
        "node", n_sub, _keyed_count_combine("node"),
    ).materialize()
    n_nodes = nodes.count()

    ranks = nodes.map_batches(
        lambda t: t.append_column("rank", pa.array([1.0] * t.num_rows, pa.float64())),
        batch_format="pyarrow",
    ).materialize()

    epochs = 0
    for _ in range(max_epochs):
        epochs += 1
        contrib = ed.join(
            ranks, join_type="inner", num_partitions=num_partitions,
            on=("src",), right_on=("node",),
        ).map_batches(
            lambda t: pa.table(
                {
                    "dst": t["dst"],
                    "c": pc.multiply(
                        pc.divide(t["rank"], pc.cast(t["out_deg"], pa.float64())),
                        pa.scalar(damping),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        def sum_recv(g: pa.Table) -> pa.Table:
            # float sums in sorted-dst reduceat order — deterministic;
            # the gate compares at round-6 (float accumulation order
            # already differs between engines)
            d = g["dst"].to_numpy()
            order = np.argsort(d, kind="stable")
            d = d[order]
            c = g["c"].to_numpy(zero_copy_only=False)[order]
            starts = np.flatnonzero(np.concatenate([[True], d[1:] != d[:-1]]))
            return pa.table(
                {
                    "dst": pa.array(d[starts], pa.int64()),
                    "recv": pa.array(np.add.reduceat(c, starts), pa.float64()),
                }
            )

        recv = _reduce_keyed(contrib, "dst", n_sub, sum_recv)
        new_ranks = nodes.join(
            recv, join_type="left_outer", num_partitions=num_partitions,
            on=("node",), right_on=("dst",),
        ).map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "rank": pc.add(
                        pa.scalar(1.0 - damping),
                        pc.fill_null(t["recv"], 0.0),
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()

        # convergence: fraction of nodes whose rank moved < conv_thresh
        # (conv_p > 1 disables the check -> fixed-epoch mode)
        if conv_p > 1.0:
            ranks = new_ranks
            continue
        both = ranks.rename_columns({"rank": "rank_old"}).join(
            new_ranks, join_type="inner", num_partitions=num_partitions,
            on=("node",), right_on=("node",),
        )
        n_stable = both.map_batches(
            lambda t: pa.table(
                {
                    "stable": pc.cast(
                        pc.less(pc.abs(pc.subtract(t["rank"], t["rank_old"])), pa.scalar(conv_thresh)),
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        ).sum("stable")
        ranks = new_ranks
        if n_nodes and (n_stable or 0) / n_nodes >= conv_p:
            break
    return ranks, epochs
