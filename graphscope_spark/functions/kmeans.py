"""Distributed quantized k-means over an embedding column.

Lloyd's algorithm re-expressed so EVERY arithmetic step is exact integer
math (or IEEE-deterministic floor division), making the result bit-equal
across engines — the DuckDB twin (doc_oracles.kmeans_sql, an unrolled CTE
per round) value-hash-matches the Spark run at any parallelism. The trick:

  * coordinates are quantized to integer micro-units on read
    (round(x * 1e6) as long — both engines see the same float32 bits, the
    same double product, the same half-away-from-zero rounding);
  * distances are exact integer sums of squared differences (64 dims ×
    (2e6)² ≈ 2.6e14 « 2^63 — no overflow, ANSI-safe);
  * assignment argmin is lexicographic on (dist_u, cluster) — integer
    comparison, tie-breaks cannot flip with partitioning;
  * centroid update is floor(sum / n): sums are exact integer, the double
    division of two < 2^53 integers is IEEE-correctly-rounded identically
    everywhere, and floor of it is deterministic.

The 1-micro-unit centroid quantization per round is the documented
semantic difference from textbook Lloyd (it perturbs centroids by ≤ 1e-6
per coordinate — irrelevant to cluster structure, decisive for
verifiability). Empty clusters die (no row from the update groupBy) in
both engines alike.

Scale shape (100 TB): per round = one broadcast of the k × dim centroid
table (a few KB), one narrow N × k distance computation folded into a
map-side-combinable min aggregate (zip_with/aggregate stay in whole-stage
codegen; the shuffle carries one (vec_id, argmin-struct) row per vector),
then one posexplode + groupBy (cluster, dim) whose map-side partial
aggregation reduces the update shuffle to partitions × k × dim rows. The
k × dim centroid collect per round is the scalar-allreduce analog the
reference performs between supersteps (grape/parallel/parallel_engine.h) —
O(k·dim) data, never O(N).

This is the verifiable counterpart of similarity.ivf_centroids (which
trains on a driver-side numpy sample for speed and is recall-tested, not
hash-tested); downstream IVF/SemDeDup-style consumers can swap either in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graphscope_spark.functions.hashing import hash64

__all__ = ["kmeans", "kmeans_model", "quantized", "centroid_distances"]

SCALE = 1_000_000.0


def quantized(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(vec_id, x: array<long>) — micro-unit coordinates."""
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            F.col(vec_col),
            lambda v: F.round(v.cast("double") * F.lit(SCALE), 0).cast(
                "long"
            ),
        ).alias("x"),
    )


def centroid_distances(pts: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, cid, dist_u) — exact integer squared L2 distance of every
    quantized point to every broadcast centroid (N × k narrow rows, no
    explode)."""
    dist = F.aggregate(
        F.zip_with("x", "c", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return pts.crossJoin(F.broadcast(cent)).select(
        "vec_id", "cid", dist.alias("dist_u")
    )


def _assign(pts: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, cluster, dist_u) — argmin over the broadcast centroids,
    ties to the smaller cluster id via lexicographic struct min."""
    m = F.min(F.struct(F.col("dist_u"), F.col("cid"))).alias("m")
    return (
        centroid_distances(pts, cent)
        .groupBy("vec_id")
        .agg(m)
        .select(
            "vec_id",
            F.col("m.cid").alias("cluster"),
            F.col("m.dist_u").alias("dist_u"),
        )
    )


def kmeans(
    emb: DataFrame,
    k: int = 8,
    rounds: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster, dist_u) after ``rounds`` Lloyd updates.

    Seeds: the ``k`` vectors with the smallest (hash64(vec_id), vec_id) —
    deterministic, engine-portable, and uniformly spread (the same seeding
    family stratified_sample / sample_neighbors use). cluster ids are
    1-based seed ranks. dist_u is the squared L2 distance to the final
    centroid in micro-units² (divide by 1e12 for float² units).
    """
    assign, _ = kmeans_model(emb, k, rounds, id_col, vec_col)
    return assign


def kmeans_model(
    emb: DataFrame,
    k: int = 8,
    rounds: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """(assignments, centroids) — assignments as :func:`kmeans`;
    centroids as (cid, c: array<long>) micro-unit coordinates, the
    reusable model (similarity.ann_ivf_exact probes against it)."""
    spark = SparkSession.getActiveSession()
    pts = quantized(emb, id_col, vec_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    seeds = (
        pts.select(
            "vec_id", "x", hash64(F.col("vec_id").cast("string")).alias("h")
        )
        .orderBy("h", "vec_id")
        .limit(k)  # TakeOrdered — distributed top-k, no global sort
        .collect()
    )
    cent_rows = [(i + 1, list(r["x"])) for i, r in enumerate(seeds)]

    for _ in range(rounds):
        cent = spark.createDataFrame(
            cent_rows, "cid int, c array<long>"
        )
        assign = _assign(pts, cent)
        upd = (
            assign.join(pts, "vec_id")
            .select("cluster", F.posexplode("x").alias("d", "v"))
            .groupBy("cluster", "d")
            .agg(
                F.floor(
                    F.sum("v").cast("double") / F.count(F.lit(1))
                )
                .cast("long")
                .alias("v")
            )
        )
        by_cid: dict[int, dict[int, int]] = {}
        for r in upd.collect():
            by_cid.setdefault(r["cluster"], {})[r["d"]] = r["v"]
        cent_rows = [
            (cid, [dims[i] for i in sorted(dims)])
            for cid, dims in sorted(by_cid.items())
        ]

    cent = spark.createDataFrame(cent_rows, "cid int, c array<long>")
    out = _assign(pts, cent)
    pts.unpersist()
    return out, cent
