"""DFS preorder vs a recursive python oracle (reference dfs.h semantics)."""

from __future__ import annotations

import random

import pytest

from graphscope_spark.algorithms.dfs import dfs, MAX_COLLECT_EDGES
from graphscope_spark.graph import Graph


def _oracle(edges, source):
    adj: dict[int, list[int]] = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
    for u in adj:
        adj[u] = sorted(set(adj[u]))
    rank = {source: 0}
    parent = {source: None}
    counter = [1]

    def visit(v):
        for u in adj.get(v, []):
            if u not in rank:
                rank[u] = counter[0]
                counter[0] += 1
                parent[u] = v
                visit(u)

    visit(source)
    return rank, parent


def test_dfs_matches_recursive_oracle(spark):
    rng = random.Random(7)
    n = 40
    edges = {(rng.randrange(n), rng.randrange(n)) for _ in range(120)}
    edges = [(u, v) for u, v in edges if u != v]
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.createDataFrame([(x,) for x in range(n)], "id long")
    g = Graph(e, v, directed=True, num_partitions=4)

    got = {r["id"]: (r["rank"], r["parent"]) for r in dfs(g, 0).collect()}
    rank, parent = _oracle(edges, 0)
    assert got == {v: (rank[v], parent[v]) for v in rank}


def test_dfs_guard(spark, monkeypatch):
    # `algorithms.dfs` the ATTRIBUTE is the function (re-exported in
    # __init__); import_module returns the module itself
    import importlib
    m = importlib.import_module("graphscope_spark.algorithms.dfs")

    e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    g = Graph(e, directed=True, num_partitions=2)
    monkeypatch.setattr(m, "MAX_COLLECT_EDGES", 1)
    with pytest.raises(ValueError, match="sequential-traversal guard"):
        m.dfs(g, 0)
