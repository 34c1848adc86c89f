"""Louvain sanity: planted community structure recovered, modularity
positive and improving (the reference's own test only checks the app runs,
python/graphscope/tests/test_app.py:218-228 — we check structure)."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from graphscope_spark.algorithms.louvain import louvain, modularity
from graphscope_spark.graph import Graph


@pytest.fixture(scope="module")
def clique_graph(spark):
    """Three 8-cliques joined by single bridge edges."""
    edges = []
    for c in range(3):
        ids = [100 * c + i for i in range(8)]
        edges += [(a, b) for a, b in itertools.combinations(ids, 2)]
    edges += [(7, 100), (107, 200)]  # weak bridges
    e = spark.createDataFrame(edges, "src long, dst long")
    return Graph(e, directed=False, num_partitions=4)


def test_louvain_recovers_cliques(clique_graph):
    comm, q = louvain(clique_graph, max_passes=2, max_move_rounds=8)
    got = {r["id"]: r["comm"] for r in comm.collect()}
    # every clique ends up in ONE community
    for c in range(3):
        ids = [100 * c + i for i in range(8)]
        assert len({got[i] for i in ids}) == 1, (c, {i: got[i] for i in ids})
    # the three cliques are distinct communities
    assert len({got[100 * c] for c in range(3)}) == 3
    assert q > 0.5  # strong planted structure


def test_louvain_fixed_recovers_cliques_and_is_deterministic(clique_graph):
    from graphscope_spark.algorithms.louvain import louvain_fixed

    comm = louvain_fixed(clique_graph, passes=2, move_rounds=6)
    got = {r["id"]: r["comm"] for r in comm.collect()}
    for c in range(3):
        ids = [100 * c + i for i in range(8)]
        assert len({got[i] for i in ids}) == 1, (c, {i: got[i] for i in ids})
    assert len({got[100 * c] for c in range(3)}) == 3
    # bit-identical under a different partitioning (the gate contract)
    g2 = Graph(clique_graph.edges, directed=False, num_partitions=1)
    got2 = {
        r["id"]: r["comm"]
        for r in louvain_fixed(g2, passes=2, move_rounds=6).collect()
    }
    assert got == got2


def test_louvain_fixed_extra_rounds_are_noops(clique_graph):
    """Past convergence nothing moves — the property that makes generous
    fixed depths safe for the SQL twin."""
    from graphscope_spark.algorithms.louvain import louvain_fixed

    a = {
        r["id"]: r["comm"]
        for r in louvain_fixed(clique_graph, passes=2,
                               move_rounds=6).collect()
    }
    b = {
        r["id"]: r["comm"]
        for r in louvain_fixed(clique_graph, passes=2,
                               move_rounds=9).collect()
    }
    assert a == b


def test_louvain_runs_on_random(spark):
    from tests.oracles import make_test_graph
    vertices, edges = make_test_graph()
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.createDataFrame([(x,) for x in vertices], "id long")
    g = Graph(e, v, directed=True, num_partitions=8)
    comm, q = louvain(g, max_passes=2, max_move_rounds=6)
    assert comm.count() == len(vertices)
    n_comm = comm.select("comm").distinct().count()
    assert 1 < n_comm < len(vertices)
