"""SSSP / BFS — frontier-driven shortest paths on the superstep kernel.

Reference semantics:
* SSSP (`sssp` app → grape::SSSPOpt; property variant
  analytical_engine/apps/property/sssp_property.h): single source, double
  edge weights, iterative relaxation until no distance improves;
  unreachable vertices keep +inf (reported as a missing/∞ value).
* BFS (`bfs` app → libgrape-lite BFS; apps/bfs/bfs_generic.h): level =
  hop distance from source; equivalent to SSSP with unit weights.
* sssp_average_length (apps/sssp/sssp_average_length.h): avg over reached
  pairs; sssp_has_path (apps/sssp/sssp_has_path.h): reachability predicate.

Spark dataflow per round = relax from the changed frontier only:
``frontier ⋈ edges → groupBy(dst).min(dist+w)`` then keep-smaller join —
one shuffle per round, volume ∝ frontier (the reference's curr/next
modified sets). Termination = empty frontier (scalar count action).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import Graph
from graphscope_spark.pregel import SuperstepRunner, SuperstepResult


def sssp(
    g: Graph,
    source: int,
    weight_col: str | None = None,
    max_iter: int = 10_000,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
    run_id: str | None = None,
    resume: bool = False,
) -> SuperstepResult:
    """Returns state ``(id, dist, changed)``; ``dist`` is NULL for
    unreachable vertices (the reference prints ∞/max — NULL is our
    relational spelling, filter or fillna at the edge).

    ``weight_col=None`` gives unit weights — which *is* BFS levels.
    """
    spark = g.spark
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    # undirected Graphs ALWAYS store both directions (graph.py canonicalizes
    # at construction) — re-symmetrizing here would double per-round message
    # volume (min-agg keeps it correct but wastes half the shuffle).
    edges = g.out_edges.select("src", "dst", w.alias("w"))

    init = g.vertices.select(
        "id",
        F.when(F.col("id") == source, F.lit(0.0)).alias("dist"),
        (F.col("id") == source).alias("changed"),
    )

    def step(state: DataFrame, rnd: int) -> DataFrame:
        frontier = state.filter("changed").select("id", "dist")
        relaxed = (
            edges.join(frontier.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min(F.col("dist") + F.col("w")).alias("cand"))
        )
        return (
            state.select("id", "dist")
            .join(relaxed, "id", "left")
            .select(
                "id",
                F.least(
                    F.coalesce(F.col("dist"), F.lit(float("inf"))),
                    F.coalesce(F.col("cand"), F.lit(float("inf"))),
                ).alias("ndist"),
                (
                    F.col("cand").isNotNull()
                    & (F.col("cand") < F.coalesce(F.col("dist"), F.lit(float("inf"))))
                ).alias("changed"),
            )
            .select(
                "id",
                F.when(F.col("ndist") != float("inf"), F.col("ndist")).alias("dist"),
                "changed",
            )
            .repartition(g.num_partitions, "id")
        )

    def metrics_fn(prev: DataFrame, new: DataFrame, rnd: int) -> dict:
        return {"frontier": int(new.filter("changed").count())}

    runner = SuperstepRunner(
        spark, name="sssp", checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every, run_id=run_id,
    )
    # distance relaxation is monotone — rounds past convergence are no-ops,
    # so the termination vote runs every 2 rounds (pregel.py check_every)
    return runner.run(init, step, max_iter, metrics_fn=metrics_fn,
                      should_stop=lambda m: m["frontier"] == 0, resume=resume,
                      check_every=2)


def bfs(g: Graph, source: int, **kw) -> SuperstepResult:
    """BFS levels (apps/bfs/bfs_generic.h output_format='level'): unit-weight
    SSSP; state ``(id, dist)`` where dist = hop count, NULL = unreachable."""
    return sssp(g, source, weight_col=None, **kw)


def sssp_has_path(g: Graph, source: int, target: int) -> bool:
    """apps/sssp/sssp_has_path.h — reachability predicate."""
    res = sssp(g, source)
    return (
        res.state.filter((F.col("id") == target) & F.col("dist").isNotNull())
        .limit(1).count() > 0
    )


def sssp_average_length(g: Graph, source: int) -> float:
    """apps/sssp/sssp_average_length.h (single-source form): mean distance
    over reached vertices EXCLUDING the source itself — the reference
    averages over ordered pairs (sum / n(n-1), sssp_average_length.h:164),
    i.e. never counts a self-distance of 0; this single-source surface
    applies the same exclusion (denominator = reached vertices − source)."""
    res = sssp(g, source)
    return float(
        res.state.filter(F.col("id") != source).agg(F.avg("dist")).first()[0]
    )


def sssp_path(
    g: Graph,
    source: int,
    weight_col: str | None = None,
    max_iter: int = 10_000,
) -> SuperstepResult:
    """SSSP with predecessor tracking (apps/sssp/sssp_path.h:1-174):
    state ``(id, dist, parent)``; parent = the neighbor the shortest path
    arrives from, ties broken by minimum parent id (the reference documents
    diamond-tie nondeterminism, app_tests.sh:349-356 — we pin the min-id
    choice so results are reproducible). Path reconstruction = walking
    ``parent`` (driver-side or via iterative self-join)."""
    spark = g.spark
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    # undirected Graphs already store both directions (graph.py
    # canonicalizes at construction) — no re-symmetrization needed.
    edges = g.out_edges.select("src", "dst", w.alias("w"))

    init = g.vertices.select(
        "id",
        F.when(F.col("id") == source, F.lit(0.0)).alias("dist"),
        F.lit(None).cast("long").alias("parent"),
        (F.col("id") == source).alias("changed"),
    )

    def step(state: DataFrame, rnd: int) -> DataFrame:
        frontier = state.filter("changed").select("id", "dist")
        relaxed = (
            edges.join(frontier.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(
                F.min(
                    F.struct(
                        (F.col("dist") + F.col("w")).alias("d"),
                        F.col("src").alias("parent"),
                    )
                ).alias("cand")
            )
        )
        better = (
            F.col("cand").isNotNull()
            & (F.col("cand.d") < F.coalesce(F.col("dist"), F.lit(float("inf"))))
        )
        return (
            state.select("id", "dist", "parent")
            .join(relaxed, "id", "left")
            .select(
                "id",
                F.when(better, F.col("cand.d")).otherwise(F.col("dist")).alias("dist"),
                F.when(better, F.col("cand.parent")).otherwise(F.col("parent"))
                .alias("parent"),
                better.alias("changed"),
            )
        )

    def metrics_fn(prev: DataFrame, new: DataFrame, rnd: int) -> dict:
        return {"frontier": int(new.filter("changed").count())}

    runner = SuperstepRunner(spark, name="sssp_path")
    return runner.run(init, step, max_iter, metrics_fn=metrics_fn,
                      should_stop=lambda m: m["frontier"] == 0)
