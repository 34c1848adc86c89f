"""k-core / k-shell decomposition — iterative peeling.

Reference semantics:
* kcore (apps/kcore/kcore.h:1-130): the maximal subgraph where every vertex
  has degree ≥ k (undirected degree); output = membership (we return the
  surviving vertex set).
* kshell (apps/kshell/kshell.h:1-139): shell index per vertex — the largest
  k such that the vertex is in the k-core; computed by peeling k = 1, 2, …

Spark dataflow: each peel round recomputes degrees over the surviving edge
set and filters — `groupBy(src).count` + semi-joins, one shuffle per round,
AQE-coalesced as the graph shrinks. Termination when no vertex was removed
(scalar count vote). Plan growth is truncated by the kernel's
localCheckpoint cadence, which matters here because peeling can run many
rounds on long chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import Graph
from graphscope_spark.pregel import SuperstepRunner


def _sym_edges(g: Graph) -> DataFrame:
    e = g.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    if g.directed:
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    return e


def kcore_vertices(g: Graph, k: int, max_iter: int = 1000) -> DataFrame:
    """(id) — vertices of the k-core. Peels via the superstep kernel so the
    run checkpoints/resumes like every other algorithm."""
    spark = g.spark
    edges = _sym_edges(g).persist()
    init = g.vertices.select("id", F.lit(True).alias("alive"))

    def step(state: DataFrame, rnd: int) -> DataFrame:
        alive = state.filter("alive").select("id")
        surv = (
            edges.join(alive.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(alive.withColumnRenamed("id", "dst"), "dst", "left_semi")
        )
        deg = surv.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("d"))
        keep = deg.filter(F.col("d") >= k).select("id")
        return (
            state.select("id")
            .join(keep.withColumn("alive2", F.lit(True)), "id", "left")
            .select("id", F.coalesce(F.col("alive2"), F.lit(False)).alias("alive"))
            .repartition(g.num_partitions, "id")
        )

    def metrics_fn(prev, new, rnd):
        removed = (
            new.withColumnRenamed("alive", "an")
            .join(prev.withColumnRenamed("alive", "ao"), "id")
            .filter(F.col("ao") & ~F.col("an"))
            .count()
        )
        return {"removed": int(removed)}

    runner = SuperstepRunner(spark, name=f"kcore{k}")
    res = runner.run(init, step, max_iter, metrics_fn=metrics_fn,
                     should_stop=lambda m: m["removed"] == 0)
    out = res.state.filter("alive").select("id")
    edges.unpersist()
    return out


def kcore(g: Graph, k: int) -> Graph:
    """kcore.h — the induced k-core subgraph."""
    keep = kcore_vertices(g, k)
    e = (
        g.edges.join(keep.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(keep.withColumnRenamed("id", "dst"), "dst", "left_semi")
    )
    return Graph(e, keep, g.directed, g.num_partitions)


def kshell(g: Graph, max_k: int = 100) -> DataFrame:
    """(id, shell) — core number per vertex (kshell.h): peel k=1,2,… and
    record the last k at which each vertex survived. Driver loop over k;
    each k reuses the previous survivor set so total work telescopes."""
    spark = g.spark
    edges = _sym_edges(g).persist()
    alive = g.vertices.select("id").persist()
    shell = g.vertices.select("id", F.lit(0).alias("shell"))

    for k in range(1, max_k + 1):
        # peel to the k-core of the current survivor subgraph
        while True:
            surv = (
                edges.join(alive.withColumnRenamed("id", "src"), "src", "left_semi")
                .join(alive.withColumnRenamed("id", "dst"), "dst", "left_semi")
            )
            deg = surv.groupBy(F.col("src").alias("id")).agg(
                F.count(F.lit(1)).alias("d")
            )
            keep = deg.filter(F.col("d") >= k).select("id").localCheckpoint(eager=True)
            n_prev, n_keep = alive.count(), keep.count()
            if n_keep == n_prev:
                break
            old = alive
            alive = keep.persist()
            old.unpersist()
            if n_keep == 0:
                break
        if alive.count() == 0:
            break
        shell = (
            shell.join(alive.withColumn("in_core", F.lit(True)), "id", "left")
            .select(
                "id",
                F.when(F.col("in_core"), F.lit(k)).otherwise(F.col("shell")).alias("shell"),
            )
            .localCheckpoint(eager=True)
        )
    edges.unpersist()
    return shell
