"""Batch mutation (MODIFY_VERTICES/EDGES, dag_utils.py:359-411) semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphscope_spark.algorithms import wcc
from graphscope_spark.graph import Graph


def _g(spark, directed=True):
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4)], "src long, dst long"
    )
    v = spark.createDataFrame([(i,) for i in range(5)], "id long")
    return Graph(e, v, directed=directed, num_partitions=4)


def test_add_vertices_first_writer_wins(spark):
    g = _g(spark)
    g2 = g.add_vertices(spark.createDataFrame([(4,), (9,)], "id long"))
    assert {r["id"] for r in g2.vertices.collect()} == {0, 1, 2, 3, 4, 9}
    assert g2.num_edges == g.num_edges


def test_remove_vertices_drops_incident_edges(spark):
    g = _g(spark)
    g2 = g.remove_vertices(spark.createDataFrame([(1,)], "id long"))
    assert {r["id"] for r in g2.vertices.collect()} == {0, 2, 3, 4}
    assert {(r["src"], r["dst"]) for r in g2.edges.collect()} == {(3, 4)}


def test_add_edges_adds_missing_endpoints(spark):
    g = _g(spark)
    g2 = g.add_edges(spark.createDataFrame([(2, 7), (0, 1)], "src long, dst long"))
    assert 7 in {r["id"] for r in g2.vertices.collect()}
    # re-added (0,1) dedups for directed graphs only on undirected canon;
    # directed union keeps multiplicity — count the distinct pairs instead
    pairs = {(r["src"], r["dst"]) for r in g2.edges.collect()}
    assert (2, 7) in pairs and (0, 1) in pairs


def test_remove_edges_undirected_both_orientations(spark):
    g = _g(spark, directed=False)
    g2 = g.remove_edges(spark.createDataFrame([(2, 1)], "src long, dst long"))
    pairs = {(r["src"], r["dst"]) for r in g2.edges.collect()}
    assert (1, 2) not in pairs and (2, 1) not in pairs
    assert (0, 1) in pairs and (1, 0) in pairs


def test_mutation_feeds_algorithms(spark):
    # bridge the two components, WCC collapses to one
    g = _g(spark, directed=False)
    assert wcc(g).state.select("comp").distinct().count() == 2
    g2 = g.add_edges(spark.createDataFrame([(2, 3)], "src long, dst long"))
    assert wcc(g2).state.select("comp").distinct().count() == 1


def test_to_directed_roundtrip(spark):
    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    ug = Graph(e, directed=False, num_partitions=4)
    dg = ug.to_directed()
    assert dg.directed
    # undirected storage is bidirectional; to_directed keeps both arcs
    got = {(r["src"], r["dst"]) for r in dg.edges.collect()}
    assert got == {(1, 2), (2, 1), (2, 3), (3, 2)}
    # already-directed graphs come back unchanged
    assert dg.to_directed() is dg
