"""cc_log (log-round hook+jump CC) vs wcc and a union-find oracle."""

from __future__ import annotations

import random

from graphscope_spark.algorithms.wcc import cc_log, wcc
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
        r = find(v)
        comp.setdefault(r, []).append(v)
    return {v: min(m) for m in comp.values() for v in m}


def test_cc_log_matches_union_find_and_wcc(spark):
    rng = random.Random(31)
    n = 60
    # sparse: long chains force many min-label rounds but few hook+jump ones
    edges = [(i, i + 1) for i in range(0, 25)] + [
        (rng.randrange(30, n), rng.randrange(30, n)) for _ in range(20)
    ]
    edges = [(u, v) for u, v in edges if u != v]
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.createDataFrame([(x,) for x in range(n)], "id long")
    g = Graph(e, v, directed=True, num_partitions=4)

    want = _components(range(n), edges)
    got = {r["id"]: r["comp"] for r in cc_log(g).collect()}
    assert got == want
    got_wcc = {r["id"]: r["comp"] for r in wcc(g).state.collect()}
    assert got == got_wcc


def test_cc_log_empty_and_isolated(spark):
    e = spark.createDataFrame([], "src long, dst long")
    v = spark.createDataFrame([(7,), (9,)], "id long")
    g = Graph(e, v, directed=False, num_partitions=2)
    got = {r["id"]: r["comp"] for r in cc_log(g).collect()}
    assert got == {7: 7, 9: 9}
