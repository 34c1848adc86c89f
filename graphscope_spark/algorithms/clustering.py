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
