"""k-truss: edges supported by enough triangles.

The k-truss of an undirected graph is the maximal subgraph in which every
edge participates in >= k-2 triangles (support counted WITHIN the
surviving subgraph) — the standard cohesive-subgraph relaxation between
k-core and clique (Cohen 2008). Not in the reference's app registry;
included as the triangle-side counterpart of k-core, built on the same
peeling discipline as cores.py.

Two surfaces:
  * ktruss(g, k)            — peel to fixpoint (the real operator)
  * ktruss_sweeps(g, k, r)  — exactly r peel sweeps (deterministic
    round count), the gate surface whose unrolled DuckDB twin
    (tpch_graphs.ktruss_sql analog in doc_oracles) is exact regardless
    of convergence; pytest proves sweeps(r→∞) == fixpoint.

Scale shape per sweep: support counting is one wedge join keyed by the
shared endpoint (adjacency ⋈ adjacency on the third vertex, the
triangles.py shape) + a map-side-combined (u, v) aggregate; the peel is a
left-anti filter; state (surviving canonical edge list) is
localCheckpoint'd so sweep s+1 sees a flat plan. Everything shuffles
edge/wedge rows, never the full graph per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import Graph

__all__ = ["ktruss", "ktruss_sweeps"]


def _canonical_edges(g: Graph) -> DataFrame:
    e = g.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    return (
        e.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
    )


def _support(edges: DataFrame) -> DataFrame:
    """(u, v, sup) — per-edge triangle support within `edges`."""
    adj = edges.select(F.col("u").alias("x"), F.col("v").alias("w")).union(
        edges.select(F.col("v").alias("x"), F.col("u").alias("w"))
    )
    a = adj.select(F.col("x").alias("u"), "w")
    b = adj.select(F.col("x").alias("v"), "w")
    return (
        edges.join(a, "u")
        .join(b, ["v", "w"])
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("sup"))
    )


def _sweep(edges: DataFrame, k: int) -> DataFrame:
    sup = _support(edges)
    return (
        edges.join(sup, ["u", "v"], "left")
        .filter(F.coalesce(F.col("sup"), F.lit(0)) >= k - 2)
        .select("u", "v")
    )


def ktruss_sweeps(g: Graph, k: int, sweeps: int) -> DataFrame:
    """(u, v) — edges surviving exactly ``sweeps`` support-peel sweeps."""
    edges = _canonical_edges(g).localCheckpoint(eager=True)
    for _ in range(sweeps):
        edges = _sweep(edges, k).localCheckpoint(eager=True)
    return edges


def ktruss(g: Graph, k: int, max_sweeps: int = 1000) -> DataFrame:
    """(u, v) — the k-truss edge set (peel to fixpoint)."""
    edges = _canonical_edges(g).localCheckpoint(eager=True)
    n = edges.count()
    for _ in range(max_sweeps):
        edges = _sweep(edges, k).localCheckpoint(eager=True)
        m = edges.count()
        if m == n:
            break
        n = m
    return edges
