"""CDLP / label propagation — LDBC Graphalytics community detection.

Reference semantics (`lpa` app → grape::CDLP of libgrape-lite, registered at
coordinator/gscoordinator/builtin/app/.gs_conf.yaml:79; LDBC-deterministic
per docs/performance_and_benchmark.md:14; exact-match golden `p2p-31-CDLP`,
python/graphscope/tests/conftest.py:778-781): init label = vertex id; each
synchronous round every vertex adopts the most frequent label among its
neighbors' previous-round labels — for directed graphs the neighbor multiset
is the union of in- and out-edges — with ties broken by the minimum label;
exactly ``max_iter`` rounds (default 10,
python/graphscope/analytical/app/lpa.py:29-55). Neighbor-less vertices keep
their label.

Spark dataflow per round: labels ⋈ edges (both directions) →
groupBy(id, label).count → deterministic argmax via a window ordered by
(count DESC, label ASC) — never `first()` without an order, which would be
partition-order nondeterministic (SURVEY.md §7.3 hard-part b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphscope_spark.graph import Graph
from graphscope_spark.pregel import SuperstepRunner, SuperstepResult


def cdlp(
    g: Graph,
    max_iter: int = 10,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
    run_id: str | None = None,
    resume: bool = False,
) -> SuperstepResult:
    """Returns state ``(id: long, label: long)``."""
    spark = g.spark
    edges = g.out_edges.select("src", "dst")

    init = g.vertices.select("id", F.col("id").alias("label"))

    def step(state: DataFrame, rnd: int) -> DataFrame:
        out_msgs = edges.join(
            state.withColumnRenamed("id", "src"), "src"
        ).select(F.col("dst").alias("id"), "label")
        msgs = out_msgs
        if g.directed:
            in_msgs = edges.join(
                state.withColumnRenamed("id", "dst"), "dst"
            ).select(F.col("src").alias("id"), "label")
            msgs = out_msgs.union(in_msgs)

        counts = msgs.groupBy("id", "label").agg(F.count(F.lit(1)).alias("c"))
        w = Window.partitionBy("id").orderBy(
            F.col("c").desc(), F.col("label").asc()
        )
        top = (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("id", F.col("label").alias("new_label"))
        )
        return (
            state.join(top, "id", "left")
            .select(
                "id",
                F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
            )
            .repartition(g.num_partitions, "id")
        )

    runner = SuperstepRunner(
        spark,
        name="cdlp",
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
        run_id=run_id,
        truncate_every=3,
    )
    return runner.run(init, step, max_iter, resume=resume)
