"""Multi-source BFS / closeness / betweenness / APSP / FLASH primitives vs
driver-side oracles (python Brandes + BFS)."""

from __future__ import annotations

from collections import defaultdict, deque

import pytest
from pyspark.sql import functions as F

from graphscope_spark.algorithms.paths import (
    all_pairs_shortest_path_length, betweenness_centrality,
    closeness_centrality, multi_source_bfs,
)
from graphscope_spark.flash import flash_cc
from graphscope_spark.graph import Graph
from tests.oracles import make_test_graph, oracle_wcc


@pytest.fixture(scope="module")
def graph_data():
    # small slice with a SMALL diameter: the per-level Brandes backward
    # pass and level-synchronous BFS cost one Spark job per level, so a
    # long ring would make this suite diameter-bound, not data-bound.
    vertices, edges = make_test_graph()
    keep = set(v for v in vertices if v < 200)
    edges = [(s, d) for s, d in edges if s in keep and d in keep]
    # add a tiny disjoint ring (second component, diameter 11)
    ring = [10_000 + i for i in range(12)]
    edges += [(ring[i], ring[(i + 1) % 12]) for i in range(12)]
    vertices = sorted(keep | set(ring))
    return vertices, edges


@pytest.fixture(scope="module")
def g(spark, graph_data):
    vertices, edges = graph_data
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.createDataFrame([(x,) for x in vertices], "id long")
    return Graph(e, v, directed=True, num_partitions=8)


def _bfs_all(edges, vertices, directed=True):
    adj = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
        if not directed:
            adj[d].append(s)
    dist = {}
    for s in vertices:
        dq = deque([(s, 0)])
        seen = {s: 0}
        while dq:
            u, du = dq.popleft()
            for v in adj[u]:
                if v not in seen:
                    seen[v] = du + 1
                    dq.append((v, du + 1))
        for v, d in seen.items():
            dist[(s, v)] = d
    return dist


def test_multi_source_bfs(g, graph_data, spark):
    vertices, edges = graph_data
    srcs = [v for v in vertices if v % 30 == 7]
    sdf = spark.createDataFrame([(x,) for x in srcs], "id long")
    got = {(r["src"], r["id"]): r["dist"]
           for r in multi_source_bfs(g, sdf).collect()}
    want_all = _bfs_all(edges, vertices)
    want = {(s, v): d for (s, v), d in want_all.items() if s in set(srcs)}
    assert got == want


def test_apsp(g, graph_data):
    vertices, edges = graph_data
    got = {(r["src"], r["id"]): r["dist"]
           for r in all_pairs_shortest_path_length(g).collect()}
    assert got == _bfs_all(edges, vertices)


def test_closeness_exact(g, graph_data):
    vertices, edges = graph_data
    n = len(vertices)
    dist = _bfs_all(edges, vertices)
    got = {r["id"]: r["closeness"] for r in closeness_centrality(g).collect()}
    into = defaultdict(list)
    for (s, v), d in dist.items():
        if d > 0:
            into[v].append(d)
    for v in vertices:
        ds = into.get(v, [])
        want = (len(ds) / sum(ds)) * (len(ds) / (n - 1)) if ds else 0.0
        assert abs(got[v] - want) < 1e-9, v


def _brandes(edges, vertices, directed=True):
    adj = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
        if not directed:
            adj[d].append(s)
    bc = {v: 0.0 for v in vertices}
    for s in vertices:
        order, pred = [], defaultdict(list)
        sigma = defaultdict(float)
        sigma[s] = 1.0
        dist = {s: 0}
        dq = deque([s])
        while dq:
            u = dq.popleft()
            order.append(u)
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    dq.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
                    pred[w].append(u)
        delta = defaultdict(float)
        for w in reversed(order):
            for v in pred[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
        # bc accumulates dependency of s on w
    return bc


def test_betweenness_exact(g, graph_data):
    vertices, edges = graph_data
    n = len(vertices)
    want_raw = _brandes(edges, vertices)
    denom = (n - 1) * (n - 2)
    got = {r["id"]: r["betweenness"]
           for r in betweenness_centrality(g, normalized=True).collect()}
    for v in vertices:
        assert abs(got[v] - want_raw[v] / denom) < 1e-9, v


def test_flash_cc_matches_wcc(g, graph_data):
    vertices, edges = graph_data
    got = {r["id"]: r["comp"] for r in flash_cc(g).collect()}
    assert got == oracle_wcc(edges, vertices)


def test_sssp_delta_stepping_matches_sssp(spark):
    from graphscope_spark.algorithms.sssp import sssp, sssp_delta_stepping
    from graphscope_spark.graph import Graph
    from tests.oracles import make_test_graph

    vertices, edges = make_test_graph()
    e = spark.createDataFrame(edges, "src long, dst long").withColumn(
        "w", ((F.col("src") * 7 + F.col("dst")) % 9 + 1).cast("double")
    )
    v = spark.createDataFrame([(x,) for x in vertices], "id long")
    g = Graph(e, v, directed=True, num_partitions=8)
    src = vertices[0]
    base = {
        r["id"]: r["dist"]
        for r in sssp(g, src, weight_col="w").state.collect()
    }
    for delta in (2.0, 5.0, None):
        got = {
            r["id"]: r["dist"]
            for r in sssp_delta_stepping(g, src, delta=delta, weight_col="w").collect()
        }
        assert set(got) == set(base)
        for k in base:
            if base[k] is None:
                assert got[k] is None
            else:
                assert abs(got[k] - base[k]) < 1e-9, (k, got[k], base[k])


def test_deep_chain_exercises_settled_fold(spark):
    # 20-vertex directed chain: diameter 19 > FOLD_EVERY, so the settled
    # pair set is folded into one checkpointed df at least twice; distances
    # must be exact end to end across the folds.
    n = 20
    e = spark.createDataFrame([(i, i + 1) for i in range(n - 1)],
                              "src long, dst long")
    g = Graph(e, directed=True, num_partitions=4)
    src = spark.createDataFrame([(0,)], "id long")
    res = multi_source_bfs(g, sources=src).collect()
    got = {(r.src, r.id): r.dist for r in res}
    assert got == {(0, i): i for i in range(n)}


def test_betweenness_endpoints_variant(spark):
    from graphscope_spark.algorithms.paths import betweenness_centrality
    # P3 path: endpoints-unnormalized bc = {0: 2, 1: 3, 2: 2}
    e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    g = Graph(e, directed=False, num_partitions=2)
    got = {r["id"]: r["betweenness"]
           for r in betweenness_centrality(
               g, normalized=False, endpoints=True).collect()}
    assert got == {0: 2.0, 1: 3.0, 2: 2.0}
    # star S3: center 6, leaves 3
    e2 = spark.createDataFrame([(9, 1), (9, 2), (9, 3)], "src long, dst long")
    g2 = Graph(e2, directed=False, num_partitions=2)
    got2 = {r["id"]: r["betweenness"]
            for r in betweenness_centrality(
                g2, normalized=False, endpoints=True).collect()}
    assert got2 == {9: 6.0, 1: 3.0, 2: 3.0, 3: 3.0}
    # connected undirected invariant: bc_ep == bc + (n-1)
    import random
    rng = random.Random(2)
    n = 15
    und = {(i, i + 1) for i in range(n - 1)}
    while len(und) < 25:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            und.add((min(u, v), max(u, v)))
    e3 = spark.createDataFrame(sorted(und), "src long, dst long")
    g3 = Graph(e3, directed=False, num_partitions=4)
    plain = {r["id"]: r["betweenness"]
             for r in betweenness_centrality(
                 g3, normalized=False).collect()}
    ep = {r["id"]: r["betweenness"]
          for r in betweenness_centrality(
              g3, normalized=False, endpoints=True).collect()}
    for v in plain:
        assert abs(ep[v] - plain[v] - (n - 1)) < 1e-9, v
