"""Degenerate-input robustness: empty graphs, single vertices, self-loops
and duplicate edges through the core algorithms (the reference's tests
cover these via NetworkX-parity fixtures; here they guard the DataFrame
compositions' null/empty paths)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphscope_spark.algorithms import cdlp, pagerank, sssp, triangles, wcc
from graphscope_spark.algorithms.triangles import triangle_count
from graphscope_spark.graph import Graph
from graphscope_spark.gremlin import traversal
from graphscope_spark.streaming import merge_components


def _g(spark, edges, vertices=None, directed=True):
    e = spark.createDataFrame(edges, "src long, dst long")
    v = (
        spark.createDataFrame([(x,) for x in vertices], "id long")
        if vertices is not None
        else None
    )
    return Graph(e, v, directed=directed, num_partitions=4)


def test_empty_graph(spark):
    g = _g(spark, [], vertices=[])
    assert pagerank(g, max_iter=3).state.count() == 0
    assert wcc(g).state.count() == 0
    assert cdlp(g, max_iter=3).state.count() == 0
    assert triangle_count(g) == 0
    t = traversal(g)
    assert t.V().count().first()["count"] == 0


def test_isolated_vertices_only(spark):
    g = _g(spark, [], vertices=[1, 5, 9])
    pr = {r["id"]: r["rank"] for r in pagerank(g, max_iter=3).state.collect()}
    # all mass is dangling; uniform distribution, sums to 1
    assert set(pr) == {1, 5, 9}
    assert abs(sum(pr.values()) - 1.0) < 1e-9
    assert all(abs(v - 1 / 3) < 1e-9 for v in pr.values())
    comp = {r["id"]: r["comp"] for r in wcc(g).state.collect()}
    assert comp == {1: 1, 5: 5, 9: 9}
    dist = {r["id"]: r["dist"] for r in sssp(g, 5).state.collect()}
    assert dist == {1: None, 5: 0.0, 9: None}


def test_self_loops_and_duplicates_triangles(spark):
    # K3 with a self-loop and duplicated edges: simple-graph canon must
    # count exactly one triangle either way
    dirty = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1),
             (1, 1), (2, 2), (1, 2), (3, 1)]
    g = _g(spark, dirty, directed=False)
    assert triangle_count(g) == 1
    per_v = {r["id"]: r["tri"] for r in triangles(g).collect()}
    assert all(per_v.get(v, 0) == 1 for v in (1, 2, 3))


def test_self_loop_wcc_and_merge(spark):
    g = _g(spark, [(1, 1), (2, 3)], directed=True)
    comp = {r["id"]: r["comp"] for r in wcc(g).state.collect()}
    assert comp == {1: 1, 2: 2, 3: 2}
    batch = spark.createDataFrame([(1, 1), (2, 3)], "src long, dst long")
    got = {r["id"]: r["comp"] for r in merge_components(None, batch).collect()}
    assert got == comp


def test_single_edge_sssp_unreachable(spark):
    g = _g(spark, [(1, 2)], vertices=[1, 2, 3])
    dist = {r["id"]: r["dist"] for r in sssp(g, 1).state.collect()}
    assert dist == {1: 0.0, 2: 1.0, 3: None}


def test_cypher_degenerate(spark):
    from graphscope_spark.cypher import CypherSession
    # empty graph: MATCH yields nothing, aggregates yield 0/empty
    g0 = _g(spark, [], vertices=[])
    cs0 = CypherSession(g0)
    assert cs0.run("MATCH (a)-[]->(b) RETURN count(*) AS n").first()["n"] == 0
    assert cs0.run(
        "MATCH (a)-[]->(b) WITH a, count(b) AS d WHERE d > 0 RETURN a"
    ).count() == 0
    # self-loop + duplicate edges: simple-graph dedup, WITH agg exact
    g = _g(spark, [(1, 1), (1, 2), (1, 2), (2, 1)])
    cs = CypherSession(g)
    rows = cs.run(
        "MATCH (a)-[]->(b) WITH a, count(b) AS d RETURN a, d ORDER BY a"
    ).collect()
    assert [(r["a"], r["d"]) for r in rows] == [(1, 2), (2, 1)]


def test_weighted_sampling_degenerate(spark):
    from graphscope_spark import sampling as smp
    # empty weighted edge table -> empty block table
    we = spark.createDataFrame([], "src long, dst long, weight long")
    seeds = spark.createDataFrame([(1,)], "id long")
    assert smp.sample_neighbors_weighted(we, seeds, [2], seed=1).count() == 0
    # single neighbor: every draw must pick it
    we1 = spark.createDataFrame([(1, 2, 7)], "src long, dst long, weight long")
    rows = smp.sample_neighbors_weighted(we1, seeds, [3], seed=1).collect()
    assert {(r.root, r.hop, r.src, r.dst) for r in rows} == {(1, 1, 1, 2)}
