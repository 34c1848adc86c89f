"""FLASH matching family vs sequential Python oracles.

Each oracle independently re-derives the reference's deterministic
semantics (priority orders, proposal rules) so the Spark dataflow's
fixpoint must match exactly — plus structural validity checks
(independence/maximality, matching validity, cover validity, domination).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from graphscope_spark.algorithms.matching import (
    maximal_matching, min_dominating_set, min_edge_cover, min_vertex_cover,
    mis,
)
from graphscope_spark.graph import Graph


def _random_graph(seed: int, n: int = 40, m: int = 90):
    rng = random.Random(seed)
    edges = set()
    while len(edges) < m:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            edges.add((min(u, v), max(u, v)))
    return list(range(n)), sorted(edges)


def _adj(vertices, edges):
    adj = {v: set() for v in vertices}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    return adj


def _graph(spark, vertices, edges):
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.createDataFrame([(x,) for x in vertices], "id long")
    return Graph(e, v, directed=False, num_partitions=4)


def seq_mis(vertices, edges):
    """Greedy MIS in increasing r = deg·n + id order (mis.h:50-57)."""
    adj = _adj(vertices, edges)
    n = len(vertices)
    order = sorted(vertices, key=lambda v: len(adj[v]) * n + v)
    chosen: set[int] = set()
    blocked: set[int] = set()
    for v in order:
        if v in blocked:
            continue
        chosen.add(v)
        blocked |= adj[v]
    return chosen


def seq_mm(vertices, edges):
    """Round-synchronous mutual max-id proposals (mm.h:44-80)."""
    adj = _adj(vertices, edges)
    mate: dict[int, int] = {}
    active = set(vertices)
    while True:
        props = {}
        for v in active:
            cand = [u for u in adj[v] if u in active]
            if cand:
                props[v] = max(cand)
        matched = {
            v for v, p in props.items() if props.get(p) == v
        }
        if not matched:
            break
        for v in matched:
            mate[v] = props[v]
        active -= matched
    return mate


@pytest.mark.parametrize("seed", [1, 2])
def test_mis_matches_sequential_greedy(spark, seed):
    vertices, edges = _random_graph(seed)
    g = _graph(spark, vertices, edges)
    got = {
        r["id"] for r in mis(g).filter("in_mis").collect()
    }
    assert got == seq_mis(vertices, edges)
    # structural: independent and maximal
    adj = _adj(vertices, edges)
    for v in got:
        assert not (adj[v] & got)
    for v in set(vertices) - got:
        assert adj[v] & got, f"{v} could be added — not maximal"


@pytest.mark.parametrize("seed", [3, 4])
def test_maximal_matching_matches_reference_rounds(spark, seed):
    vertices, edges = _random_graph(seed)
    g = _graph(spark, vertices, edges)
    got = {r["id"]: r["mate"] for r in maximal_matching(g).collect()}
    assert got == seq_mm(vertices, edges)
    # structural: symmetric, valid edges, maximal
    eset = {(min(u, v), max(u, v)) for u, v in edges}
    for v, m in got.items():
        assert got[m] == v
        assert (min(v, m), max(v, m)) in eset
    unmatched = set(vertices) - set(got)
    adj = _adj(vertices, edges)
    for v in unmatched:
        assert not (adj[v] & unmatched), "two adjacent unmatched vertices"


@pytest.mark.parametrize("seed", [5, 6])
def test_min_vertex_cover_is_valid_cover(spark, seed):
    vertices, edges = _random_graph(seed)
    g = _graph(spark, vertices, edges)
    cover = {r["id"] for r in min_vertex_cover(g).collect()}
    for u, v in edges:
        assert u in cover or v in cover, f"edge ({u},{v}) uncovered"
    # refinement left no locally-redundant vertex: every cover vertex has
    # an uncovered neighbor OR removing it would uncover an edge to a
    # cover vertex that itself has all-covered neighbors (the reference
    # only removes independent sets of redundant vertices, so pairwise
    # redundancy may legitimately remain; check the simple direction)
    adj = _adj(vertices, edges)
    lonely = {v for v in cover if all(u in cover for u in adj[v])}
    for v in lonely:
        assert adj[v] & cover  # dropping v would uncover edges otherwise


def test_min_edge_cover_covers_every_nonisolated(spark):
    vertices, edges = _random_graph(7)
    g = _graph(spark, vertices, edges)
    cov = {(r["src"], r["dst"]) for r in min_edge_cover(g).collect()}
    eset = {(min(u, v), max(u, v)) for u, v in edges}
    assert cov <= eset
    covered = {u for u, _ in cov} | {v for _, v in cov}
    adj = _adj(vertices, edges)
    nonisolated = {v for v in vertices if adj[v]}
    assert covered == nonisolated
    # size bound: |matching| + pendants ≤ #nonisolated (min-edge-cover.h:88-92)
    assert len(cov) <= len(nonisolated)


def test_min_dominating_set_dominates(spark):
    vertices, edges = _random_graph(8)
    g = _graph(spark, vertices, edges)
    ds = {r["id"] for r in min_dominating_set(g).collect()}
    adj = _adj(vertices, edges)
    for v in vertices:
        # isolated vertices are their own 2-hop maxima → self-selected
        assert v in ds or (adj[v] & ds), f"{v} undominated"


def test_mis_empty_graph(spark):
    e = spark.createDataFrame([], "src long, dst long")
    v = spark.createDataFrame([(1,), (2,)], "id long")
    g = Graph(e, v, directed=False, num_partitions=2)
    got = mis(g).collect()
    assert all(r["in_mis"] for r in got)  # no edges → everything selected
