"""cc_block / cc_opt / cc_pull vs union-find + degree-keyed oracles."""

from __future__ import annotations

import random

from graphscope_spark.algorithms.cc_variants import cc_block, cc_opt, cc_pull
from graphscope_spark.graph import Graph


def _components(vertices, edges):
    parent = {v: v for v in vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent[find(u)] = find(v)
    comp = {}
    for v in vertices:
        comp.setdefault(find(v), []).append(v)
    return {v: min(m) for m in comp.values() for v in m}


def _random_graph(seed=7, n=60):
    rng = random.Random(seed)
    edges = [(i, i + 1) for i in range(0, 20)] + [
        (rng.randrange(25, n), rng.randrange(25, n)) for _ in range(40)
    ]
    return n, [(u, v) for u, v in edges if u != v]


def test_cc_block_matches_union_find(spark):
    n, edges = _random_graph()
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.createDataFrame([(x,) for x in range(n)], "id long")
    g = Graph(e, v, directed=True, num_partitions=4)
    want = _components(range(n), edges)
    got = {r["id"]: r["comp"] for r in cc_block(g).collect()}
    assert got == want


def test_cc_block_isolated_and_empty(spark):
    e = spark.createDataFrame([], "src long, dst long")
    v = spark.createDataFrame([(3,), (5,)], "id long")
    g = Graph(e, v, directed=False, num_partitions=2)
    got = {r["id"]: r["comp"] for r in cc_block(g).collect()}
    assert got == {3: 3, 5: 5}


def _degree_keyed_oracle(n_total, vertices, edges):
    """cid(v) = max over v's component of undirected-deg(u)*n + u."""
    comp = _components(vertices, edges)
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    deg = {v: len(adj.get(v, ())) for v in vertices}
    cid = {v: deg[v] * n_total + v for v in vertices}
    best = {}
    for v in vertices:
        c = comp[v]
        best[c] = max(best.get(c, cid[v]), cid[v])
    return {v: best[comp[v]] for v in vertices}


def test_cc_opt_and_pull_match_degree_keyed_oracle(spark):
    n, edges = _random_graph(seed=13)
    # dedup the undirected edge set so spark-side degrees match the oracle
    und = set()
    for u, v in edges:
        und.add((min(u, v), max(u, v)))
    edges = sorted(und)
    e = spark.createDataFrame(edges, "src long, dst long")
    g = Graph(e, directed=False, num_partitions=4)  # symmetrizes + dedups
    verts = sorted({u for e2 in edges for u in e2})
    want = _degree_keyed_oracle(len(verts), verts, edges)
    got_opt = {r["id"]: r["cid"] for r in cc_opt(g).collect()}
    got_pull = {r["id"]: r["cid"] for r in cc_pull(g).collect()}
    assert got_opt == want
    assert got_pull == want


def test_cc_opt_two_components(spark):
    # two triangles; one has the global-max degree vertex (a star center)
    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12),
             (1, 4), (1, 5)]
    e = spark.createDataFrame(edges, "src long, dst long")
    g = Graph(e, directed=False, num_partitions=2)
    verts = sorted({u for e2 in edges for u in e2})
    want = _degree_keyed_oracle(len(verts), verts, edges)
    got = {r["id"]: r["cid"] for r in cc_opt(g).collect()}
    assert got == want
