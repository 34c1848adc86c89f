"""Triangle counting — degree-ordered wedge join.

Reference semantics (gs::Triangles,
analytical_engine/apps/clustering/triangles.h:30-159): treat the graph as
undirected and simple; orient each edge u→v iff deg(u) < deg(v), or
deg(u) == deg(v) ∧ id(u) < id(v) (triangles.h:78-91 — the equal-degree
tie-break uses vertex id, SURVEY.md §7.3 hard-part d); count a triangle by
intersecting oriented adjacency (:110-139); every triangle contributes +1 to
all three corners (:129-131); the global count is Σ/3 of per-vertex counts
(python/graphscope/nx/algorithms/builtin.py:554-573).

Spark dataflow — the non-iterative "wedge join" plan:
  oriented ⋈ oriented on wedge midpoint → semi-join the closing edge
  against oriented. Orientation bounds every vertex's oriented out-degree by
  O(sqrt(E)), which is what makes the wedge join feasible at scale; the
  closing join shuffles on the (u,w) pair, which is skew-free after
  orientation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import Graph


def _undirected_simple_edges(g: Graph) -> DataFrame:
    """Canonical undirected simple edge list (src < dst), self-loops dropped
    — the reference runs on a simple projected graph."""
    e = g.edges.select("src", "dst")
    canon = e.select(
        F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
    ).filter(F.col("u") != F.col("v")).distinct()
    return canon


def triangles(g: Graph) -> DataFrame:
    """Per-vertex triangle counts: ``(id: long, tri: long)``, one row per
    vertex of ``g`` (0 for triangle-free vertices)."""
    canon = _undirected_simple_edges(g).persist()

    # undirected degree over the canonical simple graph
    deg = (
        canon.select(F.col("u").alias("id"))
        .union(canon.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )

    both = canon.union(canon.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # orientation: keep u→v iff (deg(u), u) < (deg(v), v) lexicographically
    oriented = (
        both.join(deg.withColumnRenamed("id", "u").withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("id", "v").withColumnRenamed("deg", "dv"), "v")
        .filter(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
        )
        .select("u", "v")
        .persist()
    )

    # wedges a→b, a→c (b≠c) closed by oriented edge b→c (or c→b — but both
    # endpoints of the closing edge are oriented, so exactly one direction
    # exists; joining on the pair finds it).
    e1 = oriented.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = oriented.select(F.col("u").alias("a"), F.col("v").alias("c"))
    wedges = e1.join(e2, "a").filter(F.col("b") < F.col("c"))
    closing = oriented.select(
        F.least("u", "v").alias("b"), F.greatest("u", "v").alias("c")
    )
    tris = wedges.join(closing, ["b", "c"], "inner")  # (a, b, c) triangles

    corner_counts = (
        tris.select(F.col("a").alias("id"))
        .union(tris.select(F.col("b").alias("id")))
        .union(tris.select(F.col("c").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("tri"))
    )
    return (
        g.vertices.select("id")
        .join(corner_counts, "id", "left")
        .select("id", F.coalesce(F.col("tri"), F.lit(0)).alias("tri"))
    )


def triangle_count(g: Graph) -> int:
    """Global triangle count = Σ per-vertex / 3."""
    total = triangles(g).agg(F.sum("tri")).first()[0] or 0
    return int(total) // 3
