"""Greedy graph coloring — flash/clustering/color.h.

Reference semantics (analytical_engine/apps/flash/clustering/color.h:43-86):
priority order = (degree, id) descending (check at :57-59); every round each
vertex recomputes its color as the mex (minimum excluded value) of the
current colors of its higher-priority neighbors (:62-72); iterate to the
fixpoint (:76-81). The fixpoint is the Jones–Plassmann coloring, identical
to sequential greedy coloring in decreasing-(deg, id) order — which the
pytest oracle recomputes.

Dataflow per round: one join (higher-priority neighbor colors onto
targets) + one groupBy collecting the forbidden set + a JVM-side mex via
``F.aggregate`` over the sorted distinct color array — no Python UDF. The
number of rounds is bounded by the longest path in the priority DAG
(typically a handful on real graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graphscope_spark.graph import Graph


def color(g: Graph, max_iter: int = 10_000) -> DataFrame:
    """(id, color) — greedy coloring at the Jones–Plassmann fixpoint."""
    e = g.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    if g.directed:
        e = e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    deg = e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("_d")
    )
    # keep only src→dst where src has HIGHER priority (deg, id): dst's
    # color depends on src's (color.h check :57-59)
    down = (
        e.join(deg.withColumnRenamed("id", "src").withColumnRenamed("_d", "_ds"), "src")
        .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("_d", "_dd"), "dst")
        .filter(
            (F.col("_ds") > F.col("_dd"))
            | ((F.col("_ds") == F.col("_dd")) & (F.col("src") > F.col("dst")))
        )
        .select("src", "dst")
        .repartition(g.num_partitions, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    state = g.vertices.select("id", F.lit(0).alias("color")) \
        .localCheckpoint(eager=True)
    rounds = 0
    while rounds < max_iter:
        rounds += 1
        forb = (
            down.join(
                state.select(F.col("id").alias("src"), F.col("color").alias("_c")),
                "src",
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.array_sort(F.collect_set("_c")).alias("_forb"))
        )
        # mex: walk the sorted distinct forbidden colors; the accumulator
        # increments exactly while it collides (color.h local1 :62-72)
        new_state = (
            state.join(forb, "id", "left")
            .select(
                "id",
                F.when(F.col("_forb").isNull(), F.lit(0))
                .otherwise(
                    F.aggregate(
                        F.col("_forb"),
                        F.lit(0),
                        lambda acc, x: F.when(x == acc, acc + 1).otherwise(acc),
                    )
                )
                .alias("_new"),
                "color",
            )
        ).localCheckpoint(eager=True)
        changed = new_state.filter(F.col("_new") != F.col("color")) \
            .limit(1).count()
        state = new_state.select("id", F.col("_new").alias("color"))
        if changed == 0:
            break
    down.unpersist()
    return state
