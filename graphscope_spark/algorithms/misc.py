"""Boundary / assortativity / degree-connectivity statistics.

Reference semantics:
* node_boundary (apps/boundary/node_boundary.h:1-118): vertices outside S
  with an in-edge from S.
* edge_boundary (apps/boundary/edge_boundary.h:1-123): edges (u, v) with
  u ∈ S, v ∉ S.
* degree_assortativity_coefficient (apps/assortativity/degree_assortativity
  _coefficient.h:1-259): Pearson correlation of (deg(src), deg(dst)) over
  edges — networkx semantics: for directed graphs out-degree of source vs
  in-degree of target; for undirected both endpoints' degrees over the
  symmetrized edge list.
* average_degree_connectivity (apps/assortativity/average_degree_
  connectivity.h:1-250): mean neighbor degree, grouped by source degree.

All are single-pass joins + aggregations — no iteration, fully
Catalyst-optimized (the degree table broadcast when small).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import Graph


def node_boundary(g: Graph, s: DataFrame) -> DataFrame:
    """(id) — node boundary of vertex set ``s`` (a DataFrame with column
    id). edges.filter(src∈S ∧ dst∉S) per SURVEY §2.2."""
    s = s.select("id")
    return (
        g.edges.join(s.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(s.withColumnRenamed("id", "dst"), "dst", "left_anti")
        .select(F.col("dst").alias("id"))
        .distinct()
    )


def edge_boundary(g: Graph, s: DataFrame) -> DataFrame:
    """(src, dst) — edges leaving ``s``."""
    s = s.select("id")
    return (
        g.edges.join(s.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(s.withColumnRenamed("id", "dst"), "dst", "left_anti")
        .select("src", "dst")
    )


def _edge_degree_pairs(g: Graph) -> DataFrame:
    """(x, y) degree pairs per edge: directed → (out_deg(src), in_deg(dst));
    undirected graphs are expected symmetrized already (Graph.to_undirected),
    so both endpoints appear in both roles."""
    deg = g.degrees
    if g.directed:
        sx = deg.select(F.col("id").alias("src"), F.col("out_deg").alias("x"))
        dy = deg.select(F.col("id").alias("dst"), F.col("in_deg").alias("y"))
    else:
        sx = deg.select(F.col("id").alias("src"), F.col("out_deg").alias("x"))
        dy = deg.select(F.col("id").alias("dst"), F.col("out_deg").alias("y"))
    return g.edges.select("src", "dst").join(sx, "src").join(dy, "dst").select("x", "y")


def degree_assortativity_coefficient(g: Graph) -> float:
    """Pearson correlation of degree pairs over edges — corr() is a single
    Spark aggregate (numerically the two-pass-free covariance form)."""
    r = _edge_degree_pairs(g).agg(F.corr("x", "y")).first()[0]
    return float(r) if r is not None else float("nan")


def attribute_assortativity(g: Graph, attr_col: str) -> float:
    """Categorical attribute assortativity
    (apps/assortativity/attribute_assortativity.h:59-90, numeric=false;
    networkx attribute_assortativity_coefficient):
    r = (Σ_i e_ii − Σ_i a_i·b_i) / (1 − Σ_i a_i·b_i) over the mixing
    matrix e_xy = fraction of edges whose endpoints carry attribute values
    (x, y); a = row sums, b = column sums. Vertices must carry
    ``attr_col``. Fully relational: two attribute joins + two small
    aggregations over the (tiny) per-value marginals — no iteration."""
    va = g.vertices.select("id", F.col(attr_col).alias("_a"))
    pairs = (
        g.edges.select("src", "dst")
        .join(va.withColumnRenamed("id", "src")
              .withColumnRenamed("_a", "xa"), "src")
        .join(va.withColumnRenamed("id", "dst")
              .withColumnRenamed("_a", "ya"), "dst")
        .select("xa", "ya")
    )
    m = pairs.count()
    if m == 0:
        return float("nan")
    mix = pairs.groupBy("xa", "ya").agg(
        (F.count(F.lit(1)) / F.lit(float(m))).alias("e")
    ).persist()
    trace = mix.filter(F.col("xa") == F.col("ya")).agg(
        F.coalesce(F.sum("e"), F.lit(0.0))
    ).first()[0]
    a = mix.groupBy("xa").agg(F.sum("e").alias("a"))
    b = mix.groupBy("ya").agg(F.sum("e").alias("b"))
    sum_ab = (
        a.join(b, a["xa"] == b["ya"])
        .agg(F.coalesce(F.sum(F.col("a") * F.col("b")), F.lit(0.0)))
        .first()[0]
    )
    mix.unpersist()
    if sum_ab == 1.0:
        return float("nan")
    return float((trace - sum_ab) / (1.0 - sum_ab))


def numeric_assortativity(g: Graph, attr_col: str) -> float:
    """Numeric assortativity (attribute_assortativity.h numeric=true,
    ProcessMatrix): Pearson correlation of the numeric attribute across
    edge endpoints — one corr() aggregate over the attribute-joined edge
    list."""
    va = g.vertices.select("id", F.col(attr_col).cast("double").alias("_a"))
    pairs = (
        g.edges.select("src", "dst")
        .join(va.withColumnRenamed("id", "src")
              .withColumnRenamed("_a", "x"), "src")
        .join(va.withColumnRenamed("id", "dst")
              .withColumnRenamed("_a", "y"), "dst")
    )
    r = pairs.agg(F.corr("x", "y")).first()[0]
    return float(r) if r is not None else float("nan")


def average_degree_connectivity(g: Graph) -> DataFrame:
    """(deg: long, avg_nbr_deg: double) — mean neighbor degree by source
    degree (average_degree_connectivity.h)."""
    return (
        _edge_degree_pairs(g)
        .groupBy(F.col("x").alias("deg"))
        .agg(F.avg("y").alias("avg_nbr_deg"))
    )


def modularity(g: Graph, assignment: DataFrame) -> DataFrame:
    """One row (m, intra2, deg_sq_sum, modularity) — Newman modularity of
    a community ``assignment`` (id, label) on an undirected graph whose
    edge table holds both directions.

    Exact integer form: with m undirected edges, intra2 = directed-edge
    count inside communities (= 2·Σ e_c) and deg_sq_sum = Σ_c (Σ_i∈c d_i)²,

        Q = (2·m·intra2 − deg_sq_sum) / (4·m²)

    — every term is an exact int64, so the only float op is the final
    division (rounded to 6), and the DuckDB twin is bit-equal. The metric
    the reference's Louvain maximizes, exposed as a first-class evaluator
    for ANY partition (cdlp, louvain, fluid, external labels).

    Scale shape: one label join per edge endpoint (the message-join
    shape), one degree aggregate, one per-label aggregate — all map-side
    combinable; output is a single row."""
    asn = assignment.select("id", F.col(assignment.columns[1]).alias("_c"))
    e = g.edges.select("src", "dst")
    m2 = e.count()  # both directions
    m = m2 // 2
    intra2 = (
        e.join(asn.withColumnRenamed("id", "src")
               .withColumnRenamed("_c", "ca"), "src")
        .join(asn.withColumnRenamed("id", "dst")
              .withColumnRenamed("_c", "cb"), "dst")
        .filter(F.col("ca") == F.col("cb"))
        .count()
    )
    deg = e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("d")
    )
    dc = (
        deg.join(asn, "id")
        .groupBy("_c")
        .agg(F.sum("d").alias("dc"))
        .agg(F.sum(F.col("dc") * F.col("dc")).alias("s"))
    )
    deg_sq_sum = int(dc.first()["s"])
    q = (2 * m * intra2 - deg_sq_sum) / (4.0 * m * m)
    spark = e.sparkSession
    return spark.createDataFrame(
        [(m, intra2, deg_sq_sum, round(q, 6))],
        "m long, intra2 long, deg_sq_sum long, modularity double",
    )
