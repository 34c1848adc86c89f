"""lcc_directed vs a direct Python evaluation of the LDBC definition."""

from __future__ import annotations

import random

from graphscope_spark.algorithms.clustering import lcc_directed
from graphscope_spark.graph import Graph


def _oracle(verts, dedges):
    nbrs = {v: set() for v in verts}
    eset = set(dedges)
    for u, w in dedges:
        nbrs[u].add(w)
        nbrs[w].add(u)
    out = {}
    for v in verts:
        n = nbrs[v]
        if len(n) < 2:
            out[v] = 0.0
            continue
        num = sum(
            1 for u in n for w in n if u != w and (u, w) in eset
        )
        out[v] = num / (len(n) * (len(n) - 1))
    return out


def test_lcc_directed_matches_definition(spark):
    rng = random.Random(5)
    n = 30
    dedges = set()
    while len(dedges) < 80:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            dedges.add((u, v))
    dedges = sorted(dedges)
    e = spark.createDataFrame(dedges, "src long, dst long")
    v = spark.createDataFrame([(x,) for x in range(n)], "id long")
    g = Graph(e, v, directed=True, num_partitions=4)
    want = _oracle(range(n), dedges)
    got = {r["id"]: r["lcc"] for r in lcc_directed(g).collect()}
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, (k, got[k], want[k])


def test_lcc_directed_reciprocal_pair_counts_twice(spark):
    # v=0 with neighbors 1,2; edges 1->2 and 2->1 both count: lcc(0)=1.0
    dedges = [(0, 1), (0, 2), (1, 2), (2, 1)]
    e = spark.createDataFrame(dedges, "src long, dst long")
    g = Graph(e, directed=True, num_partitions=2)
    got = {r["id"]: r["lcc"] for r in lcc_directed(g).collect()}
    assert got[0] == 1.0
