"""Push-style (residual) PageRank vs the gather variant and a numpy oracle."""

from __future__ import annotations

import numpy as np
import pytest

from graphscope_spark.algorithms.pagerank import pagerank, pagerank_push
from graphscope_spark.graph import Graph

EDGES = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2), (5, 0)]
N = 7  # vertex 6 is dangling and isolated


@pytest.fixture(scope="module")
def g(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    v = spark.createDataFrame([(x,) for x in range(N)], "id long")
    return Graph(e, v, directed=True, num_partitions=4)


def _series_oracle(rounds, alpha=0.85):
    """rank_R = partial power series with dangling redistribution."""
    outdeg = np.zeros(N)
    for u, _ in EDGES:
        outdeg[u] += 1
    res = np.full(N, (1 - alpha) / N)
    rank = np.zeros(N)
    for _ in range(rounds):
        dang = res[outdeg == 0].sum()
        new = np.full(N, alpha * dang / N)
        for u, v in EDGES:
            new[v] += alpha * res[u] / outdeg[u]
        rank += res
        res = new
    return rank


def test_push_partial_series_exact(spark, g):
    got = {r["id"]: r["rank"]
           for r in pagerank_push(g, max_iter=6).state.collect()}
    want = _series_oracle(6)
    assert np.allclose([got[i] for i in range(N)], want, atol=1e-12)


def test_push_converges_to_gather_fixed_point(spark, g):
    push = {r["id"]: r["rank"]
            for r in pagerank_push(g, max_iter=80).state.collect()}
    gather = {r["id"]: r["rank"]
              for r in pagerank(g, max_iter=80).state.collect()}
    assert np.allclose([push[i] for i in range(N)],
                       [gather[i] for i in range(N)], atol=1e-7)


def test_push_eps_frontier_still_converges(spark, g):
    # positive eps retains sub-threshold residual instead of pushing it;
    # total mass (rank + res) is conserved every round
    # 80 rounds: the α^R series tail is ~1e-7; what remains is the eps
    # floor — residual below eps is retained, bounding per-vertex error
    # by eps/(1-α) ≈ 7e-6
    res = pagerank_push(g, max_iter=80, eps=1e-6)
    rows = res.state.collect()
    total = sum(r["rank"] + r["res"] for r in rows)
    # mass identity: sum over the full series is 1 at convergence; partway,
    # rank+res accounts for everything injected so far minus the tail decay
    gather = {r["id"]: r["rank"]
              for r in pagerank(g, max_iter=80).state.collect()}
    got = {r["id"]: r["rank"] for r in rows}
    assert np.allclose([got[i] for i in range(N)],
                       [gather[i] for i in range(N)], atol=1e-4)
    assert total <= 1.0 + 1e-9
