"""North-star algorithm parity: PageRank (allclose 1e-6), WCC / CDLP /
triangles (exact) vs driver-side oracles — mirroring the reference's golden
comparison rules (python/graphscope/tests/test_app.py:47-54,136-233)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from graphscope_spark.graph import Graph
from graphscope_spark.algorithms import pagerank, wcc, cdlp, triangles
from graphscope_spark.algorithms.triangles import triangle_count

from tests.oracles import (
    make_test_graph,
    oracle_cdlp,
    oracle_pagerank,
    oracle_triangles,
    oracle_wcc,
    symmetrize,
)


@pytest.fixture(scope="module")
def graph_data():
    return make_test_graph()


@pytest.fixture(scope="module")
def g(spark, graph_data):
    vertices, edges = graph_data
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.createDataFrame([(x,) for x in vertices], "id long")
    return Graph(e, v, directed=True, num_partitions=8)


def _as_dict(df, key, val):
    return {r[key]: r[val] for r in df.collect()}


def test_pagerank_fixed_rounds(g, graph_data):
    vertices, edges = graph_data
    res = pagerank(g, alpha=0.85, max_iter=10)
    got = _as_dict(res.state, "id", "rank")
    want = oracle_pagerank(edges, vertices, alpha=0.85, rounds=10)
    assert set(got) == set(want)
    ids = sorted(want)
    assert np.allclose([got[i] for i in ids], [want[i] for i in ids], atol=1e-9)
    assert abs(sum(got.values()) - 1.0) < 1e-9  # rank mass conserved


def test_pagerank_tolerance_nx_semantics(g, graph_data):
    vertices, edges = graph_data
    res = pagerank(g, alpha=0.85, max_iter=100, tol=1e-6)
    got = _as_dict(res.state, "id", "rank")
    want = oracle_pagerank(edges, vertices, alpha=0.85, rounds=None,
                           tol=1e-6, max_iter=100)
    ids = sorted(want)
    assert np.allclose([got[i] for i in ids], [want[i] for i in ids], atol=1e-6)
    assert res.rounds < 100  # converged, not exhausted
    assert res.metrics[-1]["l1_delta"] < 1e-6 * len(vertices)


def test_wcc_exact(g, graph_data):
    vertices, edges = graph_data
    res = wcc(g)
    got = _as_dict(res.state, "id", "comp")
    want = oracle_wcc(edges, vertices)
    assert got == want
    assert len(set(want.values())) >= 2  # fixture has ≥2 components


def test_cdlp_exact_directed(g, graph_data):
    vertices, edges = graph_data
    res = cdlp(g, max_iter=10)
    got = _as_dict(res.state, "id", "label")
    want = oracle_cdlp(edges, vertices, rounds=10, directed=True)
    assert got == want


def test_cdlp_exact_undirected(spark, g, graph_data):
    vertices, edges = graph_data
    ug = g.to_undirected()
    uv = spark.createDataFrame([(x,) for x in vertices], "id long")
    ug = Graph(ug.edges, uv, directed=False, num_partitions=8)
    res = cdlp(ug, max_iter=10)
    got = _as_dict(res.state, "id", "label")
    want = oracle_cdlp(symmetrize(edges), vertices, rounds=10, directed=False)
    assert got == want


def test_triangles_exact(g, graph_data):
    vertices, edges = graph_data
    got = _as_dict(triangles(g), "id", "tri")
    want = oracle_triangles(edges, vertices)
    assert got == want
    # planted K5 corners have ≥ C(4,2)=6 triangles each
    k5 = [3 * i + 7 for i in range(10, 15)]
    for v in k5:
        assert got[v] >= 6
    assert triangle_count(g) == sum(want.values()) // 3


def test_graph_reports(g, graph_data):
    vertices, edges = graph_data
    assert g.num_vertices == len(vertices)
    assert g.num_edges == len(edges)
    assert g.selfloops_num() == 0
    assert g.has_node(7) and not g.has_node(8)
    s, d = edges[0]
    assert g.has_edge(s, d)
    succs = {r["id"] for r in g.successors(s).collect()}
    assert d in succs
