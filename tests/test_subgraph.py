"""FLASH subgraph-counting family vs brute-force itertools oracles."""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from graphscope_spark.algorithms.subgraph import (
    acyclic_triangle_count,
    cycle_plus_triangle_count,
    cyclic_triangle_count,
    diamond_count,
    densest_subgraph_2approx,
    in_triangle_count,
    k_clique_count,
    out_triangle_count,
    rectangle_count,
    three_path_count,
)
from graphscope_spark.graph import Graph


def _ugraph(spark, edges, n=None):
    vids = sorted({v for e in edges for v in e} | set(range(n or 0)))
    e = spark.createDataFrame(
        [(a, b) for a, b in edges] + [(b, a) for a, b in edges],
        "src long, dst long",
    )
    v = spark.createDataFrame([(i,) for i in vids], "id long")
    return Graph(e, v, directed=False, num_partitions=4, assume_symmetric=True)


def _dgraph(spark, edges):
    vids = sorted({v for e in edges for v in e})
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.createDataFrame([(i,) for i in vids], "id long")
    return Graph(e, v, directed=True, num_partitions=4)


def _random_simple(rng, n, m):
    seen = set()
    while len(seen) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a == b:
            continue
        seen.add((min(a, b), max(a, b)))
    return sorted(seen)


# ------------------------------------------------------------------ #
# brute-force oracles over the simple undirected graph
# ------------------------------------------------------------------ #

def _adj(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


def oracle_rectangles(edges):
    adj = _adj(edges)
    nodes = sorted(adj)
    cnt = 0
    for quad in itertools.combinations(nodes, 4):
        for perm in itertools.permutations(quad[1:]):
            cyc = (quad[0],) + perm
            if all(
                cyc[(i + 1) % 4] in adj[cyc[i]] for i in range(4)
            ):
                cnt += 1
    return cnt // 2  # each 4-cycle found twice (two directions, fixed start)


def oracle_diamonds(edges):
    adj = _adj(edges)
    cnt = 0
    for quad in itertools.combinations(sorted(adj), 4):
        es = sum(
            1 for a, b in itertools.combinations(quad, 2) if b in adj[a]
        )
        if es == 5:
            cnt += 1
        elif es == 6:  # K4 contains 6 diamonds (choose the missing edge... )
            cnt += 6
    return cnt


def oracle_tailed(edges):
    adj = _adj(edges)
    cnt = 0
    for tri in itertools.combinations(sorted(adj), 3):
        a, b, c = tri
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for v in tri:
                cnt += len(adj[v] - set(tri))
    return cnt


def oracle_paths3_exact(edges):
    """Count 4-vertex simple paths (3 edges), each once."""
    adj = _adj(edges)
    cnt = 0
    for a, b in edges:  # middle edge (a,b)
        for x in adj[a] - {b}:
            for y in adj[b] - {a}:
                if x != y:
                    cnt += 1
    return cnt


def oracle_kclique(edges, k):
    adj = _adj(edges)
    return sum(
        1
        for comb in itertools.combinations(sorted(adj), k)
        if all(b in adj[a] for a, b in itertools.combinations(comb, 2))
    )


# ------------------------------------------------------------------ #
# tests
# ------------------------------------------------------------------ #

EDGES_SMALL = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (2, 4), (4, 5),
               (5, 2), (1, 3)]


def test_rectangle_small(spark):
    g = _ugraph(spark, EDGES_SMALL)
    got = rectangle_count(g).first()["rectangles"]
    assert got == oracle_rectangles(EDGES_SMALL)


def test_rectangle_c4(spark):
    e = [(0, 1), (1, 2), (2, 3), (3, 0)]
    assert rectangle_count(_ugraph(spark, e)).first()["rectangles"] == 1


def test_diamond_tailed_paths3_small(spark):
    g = _ugraph(spark, EDGES_SMALL)
    assert diamond_count(g).first()["diamonds"] == oracle_diamonds(EDGES_SMALL)
    from graphscope_spark.algorithms.subgraph import tailed_triangle_count
    assert (
        tailed_triangle_count(g).first()["tailed"]
        == oracle_tailed(EDGES_SMALL)
    )
    assert (
        three_path_count(g).first()["paths3"]
        == oracle_paths3_exact(EDGES_SMALL)
    )


def test_kclique_k4_small(spark):
    e = [(a, b) for a, b in itertools.combinations(range(5), 2)]  # K5
    g = _ugraph(spark, e)
    assert k_clique_count(g, 4).first()["cliques"] == 5  # C(5,4)
    assert k_clique_count(g, 5).first()["cliques"] == 1
    assert k_clique_count(g, 3).first()["cliques"] == 10


def test_random_graph_counts(spark):
    rng = random.Random(7)
    edges = _random_simple(rng, 12, 30)
    g = _ugraph(spark, edges)
    from graphscope_spark.algorithms.subgraph import tailed_triangle_count
    assert rectangle_count(g).first()["rectangles"] == oracle_rectangles(edges)
    assert diamond_count(g).first()["diamonds"] == oracle_diamonds(edges)
    assert (
        tailed_triangle_count(g).first()["tailed"] == oracle_tailed(edges)
    )
    assert (
        three_path_count(g).first()["paths3"] == oracle_paths3_exact(edges)
    )
    assert k_clique_count(g, 4).first()["cliques"] == oracle_kclique(edges, 4)


def test_directed_census(spark):
    edges = [(0, 1), (1, 2), (0, 2),      # acyclic 0→1→2, 0→2
             (3, 4), (4, 5), (5, 3),      # cycle
             (6, 7), (7, 6), (6, 8), (7, 8),   # mutual + common out-nbr
             (9, 6), (9, 7)]              # common in-nbr of mutual pair
    g = _dgraph(spark, edges)
    # 0→1→2/0→2 plus 4 more orderings through the mutual 6↔7 pair
    # ((6,7,8),(7,6,8),(9,6,7),(9,7,6))
    assert acyclic_triangle_count(g).first()["acyclic"] == 5
    assert cyclic_triangle_count(g).first()["cyclic"] == 1
    assert in_triangle_count(g).first()["in_triangles"] == 1
    assert out_triangle_count(g).first()["out_triangles"] == 1


def test_directed_census_random(spark):
    rng = random.Random(11)
    edges = sorted({(rng.randrange(10), rng.randrange(10)) for _ in range(40)})
    edges = [(a, b) for a, b in edges if a != b]
    g = _dgraph(spark, edges)
    es = set(edges)
    nodes = sorted({v for e in edges for v in e})
    acy = sum(
        1
        for a, b, c in itertools.permutations(nodes, 3)
        if (a, b) in es and (b, c) in es and (a, c) in es
    ) // 1
    # each transitive triangle counted once under unique topo order:
    # permutations gives it exactly once as (source, middle, sink)
    cyc = sum(
        1
        for a, b, c in itertools.permutations(nodes, 3)
        if a < b and a < c and (a, b) in es and (b, c) in es and (c, a) in es
    )
    mutual = {(u, v) for u, v in es if (v, u) in es and u < v}
    intri = sum(
        1
        for (u, v) in mutual
        for x in nodes
        if x not in (u, v) and (u, x) in es and (v, x) in es
    )
    outtri = sum(
        1
        for (u, v) in mutual
        for x in nodes
        if x not in (u, v) and (x, u) in es and (x, v) in es
    )
    assert acyclic_triangle_count(g).first()["acyclic"] == acy
    assert cyclic_triangle_count(g).first()["cyclic"] == cyc
    assert in_triangle_count(g).first()["in_triangles"] == intri
    assert out_triangle_count(g).first()["out_triangles"] == outtri
    # cycle+ triangle (cycle-plus-triangle.h update2): per directed edge
    # s→d with d→s present, count x with x→s and d→x
    cplus = sum(
        1
        for (s, d) in es
        if (d, s) in es
        for x in nodes
        if (x, s) in es and (d, x) in es
    )
    assert cycle_plus_triangle_count(g).first()["cycle_plus"] == cplus


def test_densest_subgraph(spark):
    # K4 (density 1.5) + a path tail
    e = [(a, b) for a, b in itertools.combinations(range(4), 2)]
    e += [(3, 4), (4, 5), (5, 6)]
    g = _ugraph(spark, e)
    row = densest_subgraph_2approx(g).first()
    assert row["vertices"] == 4 and row["edges"] == 6
    assert row["density"] == pytest.approx(1.5)
