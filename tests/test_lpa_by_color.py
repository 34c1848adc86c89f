"""lpa_by_color vs an exact sequential-replay oracle (coloring order +
class-sequential Gauss–Seidel relabel, ties → min)."""

from __future__ import annotations

import random
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from graphscope_spark.algorithms.cdlp import lpa_by_color
from graphscope_spark.graph import Graph
from graphscope_spark.replay_oracles import seq_lpa_by_color as _oracle


def test_lpa_by_color_matches_replay(spark):
    rng = random.Random(17)
    n = 40
    und = set()
    for _ in range(70):
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            und.add((min(u, v), max(u, v)))
    und = sorted(und)
    e = spark.createDataFrame(und, "src long, dst long")
    v = spark.createDataFrame([(x,) for x in range(n)], "id long")
    g = Graph(e, v, directed=False, num_partitions=4)
    want = _oracle(range(n), und)
    got = {r["id"]: r["label"] for r in lpa_by_color(g).collect()}
    assert got == want


def test_lpa_by_color_no_oscillation_on_bipartite(spark):
    # synchronous LPA oscillates on K_{2,2}; the color schedule converges
    edges = [(0, 10), (0, 11), (1, 10), (1, 11)]
    e = spark.createDataFrame(edges, "src long, dst long")
    g = Graph(e, directed=False, num_partitions=2)
    got = {r["id"]: r["label"] for r in lpa_by_color(g, max_rounds=10).collect()}
    want = _oracle([0, 1, 10, 11], edges)
    assert got == want
    # converged: one more super-round changes nothing
    got2 = {r["id"]: r["label"]
            for r in lpa_by_color(g, max_rounds=11).collect()}
    assert got2 == got


def test_lpa_by_color_isolated_vertices(spark):
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    v = spark.createDataFrame([(1,), (2,), (9,)], "id long")
    g = Graph(e, v, directed=False, num_partitions=2)
    got = {r["id"]: r["label"] for r in lpa_by_color(g).collect()}
    assert got[9] == 9 and got[1] == got[2] == 1
