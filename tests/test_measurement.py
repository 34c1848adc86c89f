"""FLASH measurement family (msf / diameter_approx / k_center) and
coloring / core orderings / harmonic, vs sequential Python oracles."""

from __future__ import annotations

import math
import random
from collections import deque

import pytest
from pyspark.sql import functions as F

from graphscope_spark.algorithms.coloring import color
from graphscope_spark.algorithms.cores import (
    degeneracy_ordering, kshell, onion_layers,
)
from graphscope_spark.algorithms.measurement import (
    diameter_approx, k_center, msf, msf_weight,
)
from graphscope_spark.algorithms.paths import harmonic_centrality
from graphscope_spark.graph import Graph


def _random_weighted(seed: int, n: int = 30, m: int = 60):
    rng = random.Random(seed)
    edges = {}
    while len(edges) < m:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            edges[(min(u, v), max(u, v))] = round(rng.uniform(1, 100), 3)
    return list(range(n)), [(u, v, w) for (u, v), w in sorted(edges.items())]


def _graph(spark, vertices, edges, schema="src long, dst long, weight double"):
    e = spark.createDataFrame(edges, schema)
    v = spark.createDataFrame([(x,) for x in vertices], "id long")
    return Graph(e, v, directed=False, num_partitions=4)


def kruskal(vertices, edges):
    """(total_weight, forest edge set) under the same (w, u, v) total
    order as the Borůvka tiebreak — the unique MSF when keys are distinct."""
    parent = {v: v for v in vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    total, forest = 0.0, set()
    for u, v, w in sorted(edges, key=lambda t: (t[2], t[0], t[1])):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            total += w
            forest.add((u, v))
    return total, forest


def _bfs_dists(adj, src):
    d = {src: 0}
    q = deque([src])
    while q:
        v = q.popleft()
        for w in adj[v]:
            if w not in d:
                d[w] = d[v] + 1
                q.append(w)
    return d


def _adj(vertices, edges):
    adj = {v: set() for v in vertices}
    for e in edges:
        u, v = e[0], e[1]
        adj[u].add(v)
        adj[v].add(u)
    return adj


@pytest.mark.parametrize("seed", [11, 12])
def test_msf_matches_kruskal(spark, seed):
    vertices, edges = _random_weighted(seed)
    g = _graph(spark, vertices, edges)
    got = msf(g, "weight").collect()
    want_total, want_forest = kruskal(vertices, edges)
    got_forest = {(r["src"], r["dst"]) for r in got}
    assert got_forest == want_forest
    assert math.isclose(sum(r["weight"] for r in got), want_total)
    assert math.isclose(msf_weight(g, "weight"), want_total)


def test_msf_disconnected_and_unweighted(spark):
    # two components → forest has n1-1 + n2-1 edges
    edges = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 5.0), (10, 11, 2.0)]
    vertices = [0, 1, 2, 10, 11, 99]  # 99 isolated
    g = _graph(spark, vertices, edges)
    got = msf(g, "weight").collect()
    assert len(got) == 3
    assert math.isclose(msf_weight(g, "weight"), 4.0)


def test_diameter_radius_on_path_graph(spark):
    # path 0-1-2-...-9: diameter 9; the double sweep finds it exactly
    edges = [(i, i + 1, 1.0) for i in range(9)]
    g = _graph(spark, list(range(10)), edges)
    row = diameter_approx(g, k=4, seed=7).first()
    assert row["diameter"] == 9
    assert 1 <= row["radius"] <= 9


def test_k_center_greedy_oracle(spark):
    vertices, edges = _random_weighted(13, n=25, m=45)
    g = _graph(spark, vertices, edges)
    got = {r["id"]: r["dis"] for r in k_center(g, k=3).collect()}

    adj = _adj(vertices, edges)
    INF = (1 << 31) - 1
    deg = {v: len(adj[v]) for v in vertices}
    first = max(vertices, key=lambda v: (deg[v], v))
    dis = {v: INF for v in vertices}
    centers = [first]
    for v, d in _bfs_dists(adj, first).items():
        dis[v] = d
    for _ in range(2):
        nxt = max(vertices, key=lambda v: (dis[v], v))
        centers.append(nxt)
        for v, d in _bfs_dists(adj, nxt).items():
            dis[v] = min(dis[v], d)
    assert got == dis


def test_color_matches_sequential_greedy(spark):
    vertices, edges = _random_weighted(14, n=30, m=70)
    g = _graph(spark, vertices, edges)
    got = {r["id"]: r["color"] for r in color(g).collect()}

    adj = _adj(vertices, edges)
    deg = {v: len(adj[v]) for v in vertices}
    order = sorted(vertices, key=lambda v: (-deg[v], -v))
    want: dict[int, int] = {}
    for v in order:
        used = {want[u] for u in adj[v] if u in want}
        c = 0
        while c in used:
            c += 1
        want[v] = c
    assert got == want
    # proper coloring
    for e in edges:
        assert got[e[0]] != got[e[1]]


def test_onion_layers_and_degeneracy_ordering(spark):
    vertices, edges = _random_weighted(15, n=30, m=70)
    g = _graph(spark, vertices, edges)
    shells = {r["id"]: r["shell"] for r in kshell(g).collect()}
    onion = {r["id"]: (r["layer"], r["core"]) for r in onion_layers(g).collect()}
    assert set(onion) == set(vertices)
    # core column agrees with kshell; layers are a refinement: within one
    # shell, layers increase along the peel; all layers ≥ 1
    for v in vertices:
        assert onion[v][1] == shells[v]
        assert onion[v][0] >= 1
    rank = {r["id"]: r["rank"] for r in degeneracy_ordering(g).collect()}
    assert set(rank) == set(vertices)
    dg = max(shells.values())
    # every vertex peels: rank rounds strip residual degree ≤ degeneracy,
    # which always fires (min residual degree ≤ degeneracy by definition)
    adj = _adj(vertices, edges)
    # oracle: simulate the batched ranking loop
    alive = set(vertices)
    want_rank = {}
    i = 0
    while alive:
        d = {v: len(adj[v] & alive) for v in alive}
        batch = {v for v in alive if d[v] <= dg}
        for v in batch:
            want_rank[v] = i
        alive -= batch
        i += 1
    assert rank == want_rank


def test_harmonic_centrality_exact(spark):
    vertices, edges = _random_weighted(16, n=20, m=35)
    g = _graph(spark, vertices, edges)
    got = {r["id"]: r["harmonic"] for r in harmonic_centrality(g).collect()}
    adj = _adj(vertices, edges)
    for v in vertices:
        want = 0.0
        for s in vertices:
            if s == v:
                continue
            d = _bfs_dists(adj, s).get(v)
            if d:
                want += 1.0 / d
        assert math.isclose(got[v], want, rel_tol=1e-9), v


def test_msf_block_equals_msf_and_kruskal(spark):
    import random
    from graphscope_spark.algorithms.measurement import msf, msf_block
    rng = random.Random(11)
    n = 35
    und = {}
    while len(und) < 70:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            und[(min(u, v), max(u, v))] = float(rng.randrange(1, 40))
    rows = [(u, v, w) for (u, v), w in sorted(und.items())]
    e = spark.createDataFrame(rows, "src long, dst long, w double")
    g = Graph(e, directed=False, num_partitions=4)
    a = {(r["src"], r["dst"], r["weight"])
         for r in msf(g, "w").collect()}
    b = {(r["src"], r["dst"], r["weight"])
         for r in msf_block(g, "w").collect()}
    assert a == b
    # sequential Kruskal in (w, u, v) order — the unique lexicographic MSF
    parent = {x: x for x in range(n)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    want = set()
    for u, v, w in sorted(rows, key=lambda t: (t[2], t[0], t[1])):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            want.add((u, v, w))
    assert b == want
