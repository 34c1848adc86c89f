"""Biconnectivity (Tarjan–Vishkin dataflow) vs an exact DFS Tarjan oracle.

Oracle: iterative Hopcroft–Tarjan biconnected components (edge stack +
low-link), the textbook sequential algorithm — independent of the Spark
implementation's spanning-tree/Euler-tour machinery.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from graphscope_spark.algorithms.biconnectivity import (
    articulation_points, bcc, bfs_forest, bridges,
)
from graphscope_spark.graph import Graph


def tarjan_bcc(n_vertices: list[int], edge_list: list[tuple[int, int]]):
    """Returns (blocks, bridges, cuts): blocks = set of frozensets of
    canonical (u,v) edges; bridges = set of canonical edges; cuts = set of
    vertex ids."""
    adj: dict[int, list[int]] = {v: [] for v in n_vertices}
    eset = set()
    for u, v in edge_list:
        if u == v:
            continue
        c = (min(u, v), max(u, v))
        if c in eset:
            continue
        eset.add(c)
        adj[u].append(v)
        adj[v].append(u)

    disc: dict[int, int] = {}
    low: dict[int, int] = {}
    blocks: list[frozenset] = []
    cuts: set[int] = set()
    timer = 0
    for root in sorted(adj):
        if root in disc:
            continue
        stack = [(root, None, iter(adj[root]))]
        estack: list[tuple[int, int]] = []
        disc[root] = low[root] = timer
        timer += 1
        root_children = 0
        while stack:
            v, parent, it = stack[-1]
            advanced = False
            for w in it:
                if w == parent:
                    continue  # simple graph: exactly one tree edge back
                if w not in disc:
                    disc[w] = low[w] = timer
                    timer += 1
                    estack.append((v, w))
                    if v == root:
                        root_children += 1
                    stack.append((w, v, iter(adj[w])))
                    advanced = True
                    break
                elif disc[w] < disc[v]:
                    estack.append((v, w))
                    low[v] = min(low[v], disc[w])
            if advanced:
                continue
            stack.pop()
            if stack:
                u = stack[-1][0]
                low[u] = min(low[u], low[v])
                if low[v] >= disc[u]:
                    # pop the block: everything above and including (u,v)
                    blk = set()
                    while estack[-1] != (u, v):
                        a, b = estack.pop()
                        blk.add((min(a, b), max(a, b)))
                    a, b = estack.pop()
                    blk.add((min(a, b), max(a, b)))
                    blocks.append(frozenset(blk))
                    if u != root:
                        cuts.add(u)
        if root_children >= 2:
            cuts.add(root)
    brs = {next(iter(b)) for b in blocks if len(b) == 1}
    return set(blocks), brs, cuts


def _run(spark, verts, edge_list):
    e = spark.createDataFrame(edge_list, "src long, dst long")
    g = Graph(e, spark.createDataFrame([(v,) for v in verts], "id long"),
              directed=False, num_partitions=4)
    lab_df = bcc(g)
    lab = lab_df.collect()
    got_blocks: dict[int, set] = {}
    for r in lab:
        got_blocks.setdefault(r["block"], set()).add((r["src"], r["dst"]))
    got_bridges = {(r["src"], r["dst"])
                   for r in bridges(g, labels=lab_df).collect()}
    got_cuts = {r["id"]
                for r in articulation_points(g, labels=lab_df).collect()}
    return set(map(frozenset, got_blocks.values())), got_bridges, got_cuts


CASES = {
    "path": ([1, 2, 3], [(1, 2), (2, 3)]),
    "cycle_pendant": ([0, 1, 2, 3, 9], [(0, 1), (1, 2), (2, 3), (3, 0), (1, 9)]),
    "barbell": ([1, 2, 3, 4, 5, 6],
                [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4)]),
    "two_components": ([1, 2, 3, 10, 11, 12, 13],
                       [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10),
                        (12, 13)]),
    "k4": ([1, 2, 3, 4], [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_bcc_small(spark, name):
    verts, edge_list = CASES[name]
    want = tarjan_bcc(verts, edge_list)
    got = _run(spark, verts, edge_list)
    assert got == want, f"{name}: {got} != {want}"


def test_bcc_random(spark):
    rng = random.Random(7)
    verts = list(range(48))
    edge_list = []
    # sparse random graph + a pendant chain → mix of blocks and bridges
    for _ in range(60):
        u, v = rng.randrange(40), rng.randrange(40)
        if u != v:
            edge_list.append((u, v))
    edge_list += [(0, 40), (40, 41), (41, 42)]
    want = tarjan_bcc(verts, edge_list)
    got = _run(spark, verts, edge_list)
    assert got == want


def test_bfs_forest_shape(spark):
    verts, edge_list = CASES["two_components"]
    e = spark.createDataFrame(edge_list, "src long, dst long")
    g = Graph(e, spark.createDataFrame([(v,) for v in verts], "id long"),
              directed=False, num_partitions=4)
    f = {r["id"]: r for r in bfs_forest(g).collect()}
    assert f[1]["parent"] is None and f[1]["depth"] == 0
    assert f[10]["parent"] is None
    assert f[3]["root"] == 1 and f[13]["root"] == 10
    # parent is always one BFS level up
    for v, r in f.items():
        if r["parent"] is not None:
            assert f[r["parent"]]["depth"] == r["depth"] - 1
