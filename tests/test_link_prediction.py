"""Link-prediction scores (algorithms/link_prediction.py) against
hand-computed oracles on a square-with-diagonal and a brute-force Python
replica on the sf0.001 co-purchase graph."""

import math

import pytest
from pyspark.sql import functions as F

from graphscope_spark import tpch_graphs as tg
from graphscope_spark.algorithms.link_prediction import (
    common_neighbors, link_prediction,
)
from graphscope_spark.graph import Graph


def _ugraph(spark, pairs):
    e = spark.createDataFrame(pairs, "src long, dst long")
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return Graph(sym, directed=False, num_partitions=2, assume_symmetric=True)


def test_square_with_diagonal(spark):
    # 1-2-3-4-1 plus diagonal 1-3: only non-adjacent pair is (2, 4)
    g = _ugraph(spark, [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)])
    rows = link_prediction(g).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["u"], r["v"], r["cn"]) == (2, 4, 2)
    assert r["jaccard"] == 1.0           # Γ(2)=Γ(4)={1,3}
    assert r["adamic_adar"] == round(2 / math.log(3), 6)  # deg(1)=deg(3)=3
    assert r["resource_alloc"] == round(2 / 3, 6)
    assert r["pref_attach"] == 4


def test_common_neighbors_surface(spark):
    g = _ugraph(spark, [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)])
    assert {r["id"] for r in common_neighbors(g, 2, 4).collect()} == {1, 3}
    assert {r["id"] for r in common_neighbors(g, 1, 3).collect()} == {2, 4}


def test_max_degree_drops_hub_centers(spark):
    # star center 0 connects 1..5; plus edge 1-2. Without the cap, (u,v)
    # pairs among leaves share center 0; capping max_degree=2 keeps only
    # wedge centers of degree <= 2
    star = [(0, i) for i in range(1, 6)] + [(1, 2)]
    g = _ugraph(spark, star)
    full = link_prediction(g)
    assert full.filter((F.col("u") == 3) & (F.col("v") == 4)).count() == 1
    capped = link_prediction(g, max_degree=2)
    # center 0 (deg 5) excluded: leaf pairs lose their only wedge
    assert capped.filter((F.col("u") == 3) & (F.col("v") == 4)).count() == 0
    # but (u,v) wedges centered at deg-2 vertices survive: 0-1-2? 1 has
    # deg 3 (0, 2 plus the 1-2 edge)... wedge center 2 for pair (0,1) is
    # adjacent both -> (0,1) is an edge, excluded. Check nothing crashes
    # and results are a subset of the uncapped scores.
    fu = {(r["u"], r["v"]) for r in full.collect()}
    cu = {(r["u"], r["v"]) for r in capped.collect()}
    assert cu <= fu


def test_directed_graph_rejected(spark):
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    g = Graph(e, directed=True, num_partitions=2)
    with pytest.raises(ValueError):
        link_prediction(g)


def test_copurchase_brute_force_parity(spark, sf_dir):
    g = tg.copurchase_graph(spark, sf_dir)
    got = {
        (r["u"], r["v"]): (r["cn"], r["jaccard"], r["adamic_adar"],
                           r["resource_alloc"], r["pref_attach"])
        for r in link_prediction(g).collect()
    }
    edges = {(r["src"], r["dst"]) for r in g.edges.collect()}
    nbrs: dict[int, set[int]] = {}
    for s, d in edges:
        nbrs.setdefault(s, set()).add(d)
    expect = {}
    nodes = sorted(nbrs)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            if (u, v) in edges:
                continue
            cn = nbrs[u] & nbrs[v]
            if not cn:
                continue
            expect[(u, v)] = (
                len(cn),
                round(len(cn) / (len(nbrs[u]) + len(nbrs[v]) - len(cn)), 6),
                round(sum(1 / math.log(len(nbrs[w])) for w in cn), 6),
                round(sum(1 / len(nbrs[w]) for w in cn), 6),
                len(nbrs[u]) * len(nbrs[v]),
            )
    assert got == expect
