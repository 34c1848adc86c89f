"""Link-prediction scores over an undirected graph — the classic
common-neighbor family (networkx link_prediction surface; the reference's
NetworkX layer re-exports ``common_neighbors`` from
python/graphscope/nx/classes/function.py:52,71; the score functions extend
that surface the way nx.link_prediction does).

One wedge self-join computes every score at once for all candidate pairs:
  * cn              — |Γ(u) ∩ Γ(v)|                (common_neighbors)
  * jaccard         — cn / |Γ(u) ∪ Γ(v)|           (jaccard_coefficient)
  * adamic_adar     — Σ_w 1/ln(deg w)              (adamic_adar_index)
  * resource_alloc  — Σ_w 1/deg w                  (resource_allocation_index)
  * pref_attach     — deg(u)·deg(v)                (preferential_attachment)

Scale shape: candidates come from the wedge join (edges ⨝ edges on the
shared endpoint), so work is Σ_w deg(w)² — the triangle-counting cost
profile, NOT |V|². Hub vertices dominate that sum; ``max_degree`` drops
wedge centers above a cap (the standard recall-for-cost lever — a hub
shared by millions of pairs carries almost no signal: its adamic_adar
term ~1/ln(d) → 0). The degree table joins broadcast when small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import Graph

ROUND = 6


def link_prediction(
    g: Graph,
    max_degree: int | None = None,
    min_cn: int = 1,
) -> DataFrame:
    """(u, v, cn, jaccard, adamic_adar, resource_alloc, pref_attach) for
    every NON-adjacent pair u < v sharing ≥ ``min_cn`` neighbors.
    Undirected graphs only (the nx definition); the symmetrized edge list
    is the Graph storage convention, so Γ(x) = out-neighbors."""
    if g.directed:
        raise ValueError("link_prediction is defined on undirected graphs")
    e = g.edges.select("src", "dst")
    deg = e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("d")
    )
    centers = deg
    if max_degree is not None:
        centers = deg.filter(F.col("d") <= max_degree)
    # wedge u ← w → v with u < v; carry the center's degree for AA/RA
    e1 = e.select(F.col("src").alias("w"), F.col("dst").alias("u"))
    e2 = e.select(F.col("src").alias("w"), F.col("dst").alias("v"))
    wedges = (
        e1.join(e2, "w")
        .filter(F.col("u") < F.col("v"))
        .join(centers.withColumnRenamed("id", "w"), "w")
    )
    agg = wedges.groupBy("u", "v").agg(
        F.count(F.lit(1)).alias("cn"),
        F.round(F.sum(F.lit(1.0) / F.log(F.col("d"))), ROUND)
        .alias("adamic_adar"),
        F.round(F.sum(F.lit(1.0) / F.col("d")), ROUND)
        .alias("resource_alloc"),
    ).filter(F.col("cn") >= min_cn)
    # predict only non-edges: u < v and the symmetric list holds (u, v)
    nonadj = agg.join(
        e,
        (agg["u"] == e["src"]) & (agg["v"] == e["dst"]),
        "left_anti",
    )
    du = deg.select(F.col("id").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("d").alias("dv"))
    return (
        nonadj.join(du, "u").join(dv, "v")
        .select(
            "u", "v", "cn",
            F.round(
                F.col("cn").cast("double")
                / (F.col("du") + F.col("dv") - F.col("cn")),
                ROUND,
            ).alias("jaccard"),
            "adamic_adar", "resource_alloc",
            (F.col("du") * F.col("dv")).alias("pref_attach"),
        )
    )


def common_neighbors(g: Graph, u: int, v: int) -> DataFrame:
    """(id) — Γ(u) ∩ Γ(v), the nx ``common_neighbors`` surface
    (python/graphscope/nx/classes/function.py:52)."""
    if g.directed:
        raise ValueError("common_neighbors is defined on undirected graphs")
    e = g.edges
    nu = e.filter(F.col("src") == u).select(F.col("dst").alias("id"))
    nv = e.filter(F.col("src") == v).select(F.col("dst").alias("id"))
    return nu.join(nv, "id", "left_semi").distinct()
