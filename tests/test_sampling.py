"""GNN sampling (sampling.py) vs exact sequential Python oracles.

Every "random" pick in the module is a pure function of
(seed, position, vertex) through the portable md5-based 60-bit hash, so the
oracle here replays the identical arithmetic in plain Python — exact
equality, no tolerance (node2vec uses dyadic p/q so even its float
cumulative sums are exact in both engines).
"""

from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from graphscope_spark import sampling as smp
from graphscope_spark.graph import Graph

SEED = 42


def _h(*parts) -> int:
    s = "|".join(str(p) for p in parts)
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _random_edges(seed: int, n: int = 30, m: int = 80):
    rng = random.Random(seed)
    edges = set()
    while len(edges) < m:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            edges.add((u, v))
    return sorted(edges)


@pytest.fixture(scope="module")
def g(spark):
    edges = _random_edges(7)
    df = spark.createDataFrame(edges, "src long, dst long")
    return Graph(df, directed=True, num_partitions=8)


@pytest.fixture(scope="module")
def adj(g):
    rows = g.out_edges.select("src", "dst").distinct().collect()
    a: dict[int, list[int]] = {}
    for r in rows:
        a.setdefault(r.src, []).append(r.dst)
    return {k: sorted(v) for k, v in a.items()}


def test_sample_neighbors_oracle(spark, g, adj):
    seeds = [0, 5, 11]
    fanouts = [3, 2]
    res = smp.sample_neighbors(
        g, spark.createDataFrame([(s,) for s in seeds], "id long"),
        fanouts, seed=SEED,
    )
    got = {(r.root, r.hop, r.src, r.dst) for r in res.collect()}

    expect = set()
    frontier = {s: {s} for s in seeds}  # root -> frontier ids
    for hop, k in enumerate(fanouts, start=1):
        nxt: dict[int, set[int]] = {s: set() for s in seeds}
        # per-vertex pick depends only on (seed, hop, src)
        pick_at: dict[int, list[int]] = {}
        for v in {x for f in frontier.values() for x in f}:
            nbrs = adj.get(v, [])
            ranked = sorted(nbrs, key=lambda d: (_h(SEED, hop, v, d), d))
            pick_at[v] = ranked[:k]
        for root, ids in frontier.items():
            for v in ids:
                for d in pick_at.get(v, []):
                    expect.add((root, hop, v, d))
                    nxt[root].add(d)
        frontier = nxt
    assert got == expect


def test_random_walks_oracle(spark, g, adj):
    starts = [0, 3, 9]
    L = 4
    res = smp.random_walks(
        g, walk_length=L, seed=SEED,
        starts=spark.createDataFrame([(s,) for s in starts], "id long"),
    )
    got = {(r.walk, r.step, r.v) for r in res.collect()}

    expect = set()
    for s in starts:
        v = s
        expect.add((s, 0, s))
        for t in range(1, L + 1):
            nbrs = adj.get(v, [])
            if not nbrs:
                break  # truncated walk at a sink
            v = nbrs[_h(SEED, s, t, v) % len(nbrs)]
            expect.add((s, t, v))
    assert got == expect


def test_random_walks_multi_per_vertex(spark, g, adj):
    starts = [2]
    res = smp.random_walks(
        g, walk_length=2, seed=SEED, walks_per_vertex=3,
        starts=spark.createDataFrame([(s,) for s in starts], "id long"),
    )
    walks = {r.walk for r in res.collect()}
    assert walks == {6, 7, 8}  # id*3 + {0,1,2}


def test_negative_sample_oracle(spark, g, adj):
    sources = [0, 4, 8]
    tries = 6
    res = smp.negative_sample(
        g, tries=tries, seed=SEED,
        sources=spark.createDataFrame([(s,) for s in sources], "id long"),
    )
    got = {(r.src, r.neg) for r in res.collect()}

    verts = {r.id for r in g.vertices.collect()}
    m = max(verts) + 1
    expect = set()
    for s in sources:
        for t in range(tries):
            neg = _h(SEED, s, t) % m
            if neg != s and neg in verts and neg not in adj.get(s, []):
                expect.add((s, neg))
    assert got == expect
    # and they are genuinely non-edges
    for s, neg in got:
        assert neg not in adj.get(s, [])


def test_node2vec_oracle(spark, g, adj):
    # dyadic p/q => every weight/cumsum is exact in binary floating point,
    # so the sequential replay is exact, not approximate
    p, q = 2.0, 0.5
    starts = [0, 6]
    L = 3
    res = smp.node2vec_walks(
        g, walk_length=L, p=p, q=q, seed=SEED,
        starts=spark.createDataFrame([(s,) for s in starts], "id long"),
    )
    got = {(r.walk, r.step, r.v) for r in res.collect()}

    edge_set = {(u, v) for u, nb in adj.items() for v in nb}
    expect = set()
    for s in starts:
        v, prev = s, None
        expect.add((s, 0, s))
        for t in range(1, L + 1):
            nbrs = adj.get(v, [])
            if not nbrs:
                break
            if t == 1:
                ws = [1.0] * len(nbrs)
            else:
                ws = []
                for d in nbrs:
                    if d == prev:
                        ws.append(1.0 / p)
                    elif (prev, d) in edge_set:
                        ws.append(1.0)
                    else:
                        ws.append(1.0 / q)
            total = sum(ws)
            u = (_h(SEED, s, t, v) % (1 << 20)) / float(1 << 20) * total
            cum = 0.0
            nxt = nbrs[-1]
            for d, w in zip(nbrs, ws):
                cum += w
                if cum > u:
                    nxt = d
                    break
            prev, v = v, nxt
            expect.add((s, t, v))
    assert got == expect


def test_sample_neighbors_fanout_bound(spark, g):
    seeds = spark.createDataFrame([(i,) for i in range(10)], "id long")
    res = smp.sample_neighbors(g, seeds, [2, 2], seed=1)
    over = (
        res.groupBy("root", "hop", "src")
        .agg(F.countDistinct("dst").alias("n"))
        .filter(F.col("n") > 2)
        .count()
    )
    assert over == 0


def test_sample_neighbors_weighted_oracle(spark):
    # weighted multigraph: integer multiplicities; exact inverse-CDF replay
    wedges = [(1, 10, 1), (1, 11, 5), (1, 12, 2),
              (2, 10, 7), (2, 13, 1),
              (10, 20, 3), (11, 20, 1), (11, 21, 1), (12, 22, 4)]
    df = spark.createDataFrame(wedges, "src long, dst long, weight long")
    seeds = spark.createDataFrame([(1,), (2,)], "id long")
    fanouts = [3, 2]
    res = smp.sample_neighbors_weighted(df, seeds, fanouts, seed=SEED)
    got = {(r.root, r.hop, r.src, r.dst) for r in res.collect()}

    adj: dict[int, list[tuple[int, int]]] = {}
    for u, v, w in wedges:
        adj.setdefault(u, []).append((v, w))
    for u in adj:
        adj[u].sort()

    def draw(hop, v, k):
        nbrs = adj.get(v, [])
        tot = sum(w for _, w in nbrs)
        picked = set()
        for j in range(1, k + 1):
            r = _h(SEED, hop, v, j) % tot
            lo = 0
            for d, w in nbrs:
                if lo <= r < lo + w:
                    picked.add(d)
                    break
                lo += w
        return picked

    exp = set()
    frontier = {1: {1}, 2: {2}}  # root -> frontier ids
    for hop, k in enumerate(fanouts, start=1):
        nxt: dict[int, set] = {root: set() for root in frontier}
        for root, ids in frontier.items():
            for v in ids:
                if v not in adj:
                    continue
                for d in draw(hop, v, k):
                    exp.add((root, hop, v, d))
                    nxt[root].add(d)
        frontier = nxt
    assert got == exp
    # weight bias sanity: vertex 1's heaviest neighbor (11, w=5) is
    # overwhelmingly likely in 3 draws — and must appear iff the oracle
    # says so (exactness already guaranteed above).
    assert (1, 1, 1, 11) in exp or (1, 1, 1, 11) not in got


def test_ego_network_exact(spark):
    from graphscope_spark.graph import Graph
    from graphscope_spark.sampling import ego_network
    import pyspark.sql.functions as F
    # path 1->2->3->4 plus a back-edge 3->1
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (3, 1)], ["src", "dst"]
    )
    g = Graph(edges, directed=True)
    seeds = spark.createDataFrame([(1,)], ["id"])
    got = {(r.seed, r.src, r.dst)
           for r in ego_network(g, seeds, k=2).collect()}
    # 2-hop reach of 1 = {1,2,3}; induced edges among them
    assert got == {(1, 1, 2), (1, 2, 3), (1, 3, 1)}
    # k=3 adds vertex 4 and edge 3->4
    got3 = {(r.seed, r.src, r.dst)
            for r in ego_network(g, seeds, k=3).collect()}
    assert got3 == got | {(1, 3, 4)}
