"""Clustering coefficients — LCC, per-vertex clustering, transitivity,
average clustering.

Reference semantics:
* lcc (`lcc` app, libgrape-lite, LDBC Graphalytics definition) and
  clustering (apps/clustering/clustering.h:1-286): coefficient of vertex v =
  2·tri(v) / (deg(v)·(deg(v)−1)) on the undirected simple graph, 0 when
  deg < 2.
* transitivity (apps/clustering/transitivity.h:1-311): global ratio
  3·#triangles / #wedges, wedges = Σ_v deg(v)·(deg(v)−1)/2.
* avg_clustering (apps/clustering/avg_clustering.h:1-260): mean of the
  per-vertex coefficients.

All are arithmetic over the triangle counts + the degree table — one wedge
join (triangles.py) plus scalar aggregations; no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.algorithms.triangles import _undirected_simple_edges, triangles
from graphscope_spark.graph import Graph


def _undirected_degrees(g: Graph) -> DataFrame:
    canon = _undirected_simple_edges(g)
    return (
        canon.select(F.col("u").alias("id"))
        .union(canon.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def clustering(g: Graph) -> DataFrame:
    """(id, cc: double) — per-vertex clustering coefficient."""
    tri = triangles(g)
    deg = _undirected_degrees(g)
    return (
        g.vertices.select("id")
        .join(tri, "id", "left")
        .join(deg, "id", "left")
        .select(
            "id",
            F.when(
                F.coalesce(F.col("deg"), F.lit(0)) >= 2,
                2.0 * F.col("tri") / (F.col("deg") * (F.col("deg") - 1)),
            )
            .otherwise(F.lit(0.0))
            .alias("cc"),
        )
    )


def lcc(g: Graph) -> DataFrame:
    """LDBC LCC — same formula; alias kept for the reference's app name."""
    return clustering(g).withColumnRenamed("cc", "lcc")


def transitivity(g: Graph) -> float:
    """3·triangles / wedges (transitivity.h)."""
    tri_total = triangles(g).agg(F.sum("tri")).first()[0] or 0  # = 3·#triangles
    wedges = (
        _undirected_degrees(g)
        .agg(F.sum(F.col("deg") * (F.col("deg") - 1) / 2))
        .first()[0]
        or 0
    )
    return float(tri_total) / float(wedges) if wedges else 0.0


def average_clustering(g: Graph) -> float:
    """Mean per-vertex coefficient (avg_clustering.h)."""
    return float(clustering(g).agg(F.avg("cc")).first()[0] or 0.0)


def lcc_directed(g: Graph) -> DataFrame:
    """(id, lcc) — LDBC Graphalytics LCC for DIRECTED graphs (the
    registry's `lcc_directed` app, .gs_conf.yaml:95-98 → libgrape-lite
    lcc_directed.h; spec: LDBC Graphalytics).

    N(v) = in∪out neighbors of v (self excluded); lcc(v) = the number of
    ORDERED neighbor pairs (u, w) connected by a directed edge u→w,
    divided by |N(v)|·(|N(v)|−1); 0 when |N(v)| < 2. On an already-
    undirected graph each stored direction counts separately, matching
    the LDBC convention that an undirected edge closes both ordered pairs.

    Dataflow: one symmetrize+distinct for the neighborhood table, then a
    single triangle-style two-hop join — directed edges (u, w) ⋈
    neighbors-of-u ⋈ neighbors-of-w on the shared center v — grouped by
    v. Same shuffle shape (and cost bound) as triangle counting; no
    iteration, no Python.
    """
    de = (
        g.out_edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    und = de.union(
        de.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("d")
    )
    # center v sees ordered pair (u, w) iff v adj u, v adj w, and u→w
    a = und.select(F.col("src").alias("v"), F.col("dst").alias("u"))
    b = und.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    num = (
        de.select(F.col("src").alias("u"), F.col("dst").alias("w"))
        .join(a, "u")
        .join(b, ["v", "w"])
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("num"))
        .withColumnRenamed("v", "id")
    )
    return (
        g.vertices.select("id")
        .join(deg, "id", "left")
        .join(num, "id", "left")
        .select(
            "id",
            F.when(
                F.coalesce(F.col("d"), F.lit(0)) >= 2,
                F.coalesce(F.col("num"), F.lit(0))
                / (F.col("d") * (F.col("d") - 1)),
            )
            .otherwise(F.lit(0.0))
            .alias("lcc"),
        )
    )
