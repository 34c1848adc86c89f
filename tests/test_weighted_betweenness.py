"""Weighted Brandes betweenness vs an exact sequential Dijkstra oracle."""

from __future__ import annotations

import heapq
import random

from graphscope_spark.algorithms.paths import (
    betweenness_centrality_weighted, multi_source_weighted,
)
from graphscope_spark.graph import Graph


def _brandes_weighted(verts, und_wedges, endpoints=False):
    adj = {v: [] for v in verts}
    for u, v, w in und_wedges:
        adj[u].append((v, w))
        adj[v].append((u, w))
    bc = {v: 0.0 for v in verts}
    for s in verts:
        dist = {}
        sigma = {v: 0.0 for v in verts}
        preds = {v: [] for v in verts}
        sigma[s] = 1.0
        seen = {s: 0.0}
        heap = [(0.0, s)]
        order = []
        while heap:
            d, v = heapq.heappop(heap)
            if v in dist:
                continue
            dist[v] = d
            order.append(v)
            for u, w in adj[v]:
                nd = d + w
                if u not in dist and (u not in seen or nd < seen[u]):
                    seen[u] = nd
                    heapq.heappush(heap, (nd, u))
                    sigma[u] = sigma[v]
                    preds[u] = [v]
                elif u not in dist and nd == seen.get(u):
                    sigma[u] += sigma[v]
                    preds[u].append(v)
        delta = {v: 0.0 for v in verts}
        for w_ in reversed(order):
            for v in preds[w_]:
                delta[v] += sigma[v] / sigma[w_] * (1 + delta[w_])
            if w_ != s:
                bc[w_] += delta[w_] + (1.0 if endpoints else 0.0)
        if endpoints:
            bc[s] += float(len(order) - 1)
    return {v: b * 0.5 for v, b in bc.items()}  # undirected halving


def _graph(spark, seed=23, n=25, m=45):
    rng = random.Random(seed)
    und = {}
    while len(und) < m:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            und[(min(u, v), max(u, v))] = float(rng.randrange(1, 8))
    rows = [(u, v, w) for (u, v), w in sorted(und.items())]
    e = spark.createDataFrame(rows, "src long, dst long, w double")
    verts = spark.createDataFrame([(x,) for x in range(n)], "id long")
    g = Graph(e, verts, directed=False, num_partitions=4)
    return g, list(range(n)), rows


def test_multi_source_weighted_matches_dijkstra(spark):
    g, verts, rows = _graph(spark)
    adj = {v: [] for v in verts}
    for u, v, w in rows:
        adj[u].append((v, w))
        adj[v].append((u, w))
    got = {(r["src"], r["id"]): r["dist"]
           for r in multi_source_weighted(g, None, "w").collect()}
    for s in verts:
        dist = {s: 0.0}
        heap = [(0.0, s)]
        done = set()
        while heap:
            d, v = heapq.heappop(heap)
            if v in done:
                continue
            done.add(v)
            for u, w in adj[v]:
                if d + w < dist.get(u, float("inf")):
                    dist[u] = d + w
                    heapq.heappush(heap, (d + w, u))
        for v, d in dist.items():
            assert got[(s, v)] == d, (s, v)


def test_weighted_betweenness_exact(spark):
    g, verts, rows = _graph(spark)
    want = _brandes_weighted(verts, rows)
    got = {r["id"]: r["betweenness"]
           for r in betweenness_centrality_weighted(
               g, None, "w", normalized=False).collect()}
    for v in verts:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])


def test_weighted_betweenness_endpoints(spark):
    g, verts, rows = _graph(spark, seed=31, n=15, m=25)
    want = _brandes_weighted(verts, rows, endpoints=True)
    got = {r["id"]: r["betweenness"]
           for r in betweenness_centrality_weighted(
               g, None, "w", normalized=False, endpoints=True).collect()}
    for v in verts:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])


def test_weighted_closeness_and_harmonic(spark):
    from graphscope_spark.algorithms.paths import (
        closeness_centrality, harmonic_centrality,
    )
    g, verts, rows = _graph(spark, seed=41, n=18, m=30)
    adj = {v: [] for v in verts}
    for u, v, w in rows:
        adj[u].append((v, w))
        adj[v].append((u, w))

    def dijkstra(s):
        dist = {s: 0.0}
        heap = [(0.0, s)]
        done = set()
        while heap:
            d, v = heapq.heappop(heap)
            if v in done:
                continue
            done.add(v)
            for u, w in adj[v]:
                if d + w < dist.get(u, float("inf")):
                    dist[u] = d + w
                    heapq.heappush(heap, (d + w, u))
        return dist

    n = len(verts)
    want_c = {}
    want_h = {}
    into = {v: [] for v in verts}
    for s in verts:
        for v, d in dijkstra(s).items():
            if d > 0:
                into[v].append(d)
    for v in verts:
        ds = into[v]
        want_c[v] = (len(ds) / sum(ds)) * len(ds) / (n - 1) if ds else 0.0
        want_h[v] = sum(1.0 / d for d in ds)
    got_c = {r["id"]: r["closeness"]
             for r in closeness_centrality(g, None, weight_col="w").collect()}
    got_h = {r["id"]: r["harmonic"]
             for r in harmonic_centrality(g, None, weight_col="w").collect()}
    for v in verts:
        assert abs(got_c[v] - want_c[v]) < 1e-9, v
        assert abs(got_h[v] - want_h[v]) < 1e-9, v
