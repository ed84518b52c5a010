"""PageRank vs a single-process numpy oracle (reference semantics:
rank = 0.15 + 0.85 * sum(in-contribs), convergence = fraction of nodes
moving < 0.01 at least 0.95, `/root/reference/src/cis5550/jobs/PageRank.java:21`,
`:267`, `jobs_archive/PageRankParallel.java:27`)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from search_engine_ray.pipelines.pagerank import pagerank


def _numpy_pagerank(edges, damping=0.85, conv_thresh=0.01, conv_p=0.95, max_epochs=100):
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    out_deg = np.zeros(len(nodes))
    for s, _ in edges:
        out_deg[idx[s]] += 1
    r = np.ones(len(nodes))
    epochs = 0
    for _ in range(max_epochs):
        epochs += 1
        recv = np.zeros(len(nodes))
        for s, d in edges:
            recv[idx[d]] += damping * r[idx[s]] / out_deg[idx[s]]
        r_new = (1 - damping) + recv
        frac = np.mean(np.abs(r_new - r) < conv_thresh)
        r = r_new
        if frac >= conv_p:
            break
    return dict(zip(nodes, r)), epochs


@pytest.fixture(scope="module")
def graph():
    rng = np.random.default_rng(7)
    # skewed graph: node 0 is a hub; includes a sink (no outlinks)
    edges = [(int(i), 0) for i in range(1, 40)]
    edges += [(0, int(i)) for i in range(1, 10)]
    edges += [(int(rng.integers(1, 40)), int(rng.integers(1, 40))) for _ in range(120)]
    edges += [(5, 99)]  # 99 is a sink: receives, never sends
    edges = [(s, d) for s, d in edges if s != d]
    return edges


def test_pagerank_matches_oracle(ray_session, graph):
    want, want_epochs = _numpy_pagerank(graph)
    ds = ray.data.from_pandas(
        pd.DataFrame(graph, columns=["src", "dst"]).astype("int64")
    )
    ranks, epochs = pagerank(ds, num_partitions=4)
    got = {r["node"]: r["rank"] for r in ranks.take_all()}
    assert epochs == want_epochs
    assert set(got) == set(want)
    for n in want:
        assert abs(got[n] - want[n]) < 1e-9, n


def test_pagerank_fixed_epochs(ray_session, graph):
    want, _ = _numpy_pagerank(graph, conv_p=2.0, max_epochs=3)
    ds = ray.data.from_pandas(
        pd.DataFrame(graph, columns=["src", "dst"]).astype("int64")
    )
    ranks, epochs = pagerank(ds, conv_p=2.0, max_epochs=3, num_partitions=4)
    got = {r["node"]: r["rank"] for r in ranks.take_all()}
    assert epochs == 3
    for n in want:
        assert abs(got[n] - want[n]) < 1e-9, n
