"""Driver-side reference oracles (pure numpy / python) — the role the gstest
golden files play in the reference's test suite (SURVEY.md §5): analytically
recompute each algorithm's answer on small graphs, compare exact for int
results, allclose for floats (python/graphscope/tests/test_app.py:47-54)."""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np


def oracle_pagerank(
    edges: list[tuple[int, int]],
    vertices: list[int],
    alpha: float = 0.85,
    rounds: int | None = 10,
    tol: float | None = None,
    max_iter: int = 100,
) -> dict[int, float]:
    """Fixed-round when ``rounds`` given; L1-tolerance (pagerank_nx
    semantics) when ``tol`` given."""
    ids = sorted(vertices)
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    outdeg = np.zeros(n)
    src = np.array([idx[s] for s, _ in edges], dtype=np.int64)
    dst = np.array([idx[d] for _, d in edges], dtype=np.int64)
    np.add.at(outdeg, src, 1.0)
    r = np.full(n, 1.0 / n)
    it = 0
    while True:
        it += 1
        dang = r[outdeg == 0].sum()
        base = (1 - alpha) / n + alpha * dang / n
        contrib = np.where(outdeg > 0, r / np.maximum(outdeg, 1.0), 0.0)
        gathered = np.zeros(n)
        np.add.at(gathered, dst, contrib[src])
        new_r = alpha * gathered + base
        eps = np.abs(new_r - r).sum()
        r = new_r
        if rounds is not None and it >= rounds:
            break
        if tol is not None and (eps < tol * n or it >= max_iter):
            break
    return dict(zip(ids, r.tolist()))


def oracle_wcc(edges, vertices) -> dict[int, int]:
    """Component id = min vertex id in the weakly connected component."""
    parent = {v: v for v in vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    return {v: find(v) for v in vertices}


def oracle_cdlp(edges, vertices, rounds: int = 10, directed: bool = True) -> dict[int, int]:
    """LDBC CDLP: most-frequent neighbor label, ties → min, synchronous,
    fixed rounds. ``edges`` for an undirected graph must already be
    symmetrized (both orientations present) with directed=False."""
    nbrs = defaultdict(list)
    for s, d in edges:
        nbrs[d].append(s)
        if directed:
            nbrs[s].append(d)
    labels = {v: v for v in vertices}
    for _ in range(rounds):
        new = {}
        for v in vertices:
            if not nbrs[v]:
                new[v] = labels[v]
                continue
            counts = Counter(labels[u] for u in nbrs[v])
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        labels = new
    return labels


def oracle_triangles(edges, vertices) -> dict[int, int]:
    """Per-vertex triangle counts on the simple undirected graph."""
    adj = defaultdict(set)
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    tri = {v: 0 for v in vertices}
    seen = set()
    for u in vertices:
        for v in adj[u]:
            if v <= u:
                continue
            for w in adj[u] & adj[v]:
                if w > v:
                    key = (u, v, w)
                    if key not in seen:
                        seen.add(key)
                        tri[u] += 1
                        tri[v] += 1
                        tri[w] += 1
    return tri


def make_test_graph(seed: int = 42):
    """Deterministic directed test graph with the shapes FIXTURES.md §2
    demands: ≥2 weakly connected components, dangling vertices, a
    high-degree hub, a planted K5 clique (known triangles), isolated-ish
    fringe, non-contiguous ids."""
    rng = np.random.default_rng(seed)
    # component A: vertices 0..199 (ids 3*i+7), random edges + hub + K5
    ids_a = [3 * i + 7 for i in range(200)]
    edges = set()
    for _ in range(700):
        s, d = rng.choice(200, 2, replace=False)
        edges.add((ids_a[s], ids_a[d]))
    hub = ids_a[0]
    for i in range(1, 120):  # hub with high in-degree (skew)
        edges.add((ids_a[i], hub))
    k5 = ids_a[10:15]
    for i in k5:
        for j in k5:
            if i < j:
                edges.add((i, j))
    # component B: disjoint ids 10_000..10_049, a ring (no triangles)
    ids_b = [10_000 + i for i in range(50)]
    for i in range(50):
        edges.add((ids_b[i], ids_b[(i + 1) % 50]))
    # dangling sink with in-edges only
    sink = 99_999
    for i in range(5):
        edges.add((ids_a[50 + i], sink))
    vertices = sorted(set(ids_a) | set(ids_b) | {sink})
    edges = sorted(edges)
    return vertices, edges


def symmetrize(edges):
    s = set()
    for a, b in edges:
        if a != b:
            s.add((a, b))
            s.add((b, a))
    return sorted(s)


# ------------------------------------------------------------------ #
# oracles for the breadth algorithms (SURVEY.md §2.2 remaining registry)
# ------------------------------------------------------------------ #


def oracle_sssp(edges_w, vertices, source):
    """Dijkstra. ``edges_w`` = [(src, dst, w)] directed."""
    import heapq

    adj = defaultdict(list)
    for s, d, w in edges_w:
        adj[s].append((d, w))
    dist = {source: 0.0}
    pq = [(0.0, source)]
    while pq:
        du, u = heapq.heappop(pq)
        if du > dist.get(u, float("inf")):
            continue
        for v, w in adj[u]:
            nd = du + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return {v: dist.get(v) for v in vertices}


def oracle_clustering(edges, vertices):
    """Per-vertex clustering coefficient on the simple undirected graph."""
    tri = oracle_triangles(edges, vertices)
    adj = defaultdict(set)
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    out = {}
    for v in vertices:
        d = len(adj[v])
        out[v] = 2.0 * tri[v] / (d * (d - 1)) if d >= 2 else 0.0
    return out


def oracle_kcore(edges, vertices, k):
    """Vertex set of the k-core (undirected simple graph)."""
    adj = defaultdict(set)
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    alive = set(vertices)
    changed = True
    while changed:
        drop = {v for v in alive if len(adj[v] & alive) < k}
        changed = bool(drop)
        alive -= drop
    return alive


def oracle_core_number(edges, vertices):
    """shell index per vertex = max k with v in k-core."""
    shell = {v: 0 for v in vertices}
    k = 1
    alive = set(vertices)
    while alive:
        alive = oracle_kcore(edges, [v for v in alive], k)
        for v in alive:
            shell[v] = k
        k += 1
        if k > len(vertices):
            break
    return shell
