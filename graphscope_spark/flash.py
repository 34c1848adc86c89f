"""FLASH-style primitives: VertexMap / EdgeMap with dense-sparse switching.

The reference's FLASH substrate (analytical_engine/apps/flash/api.h) builds
~70 algorithms from three primitives; this module re-expresses them on
DataFrames so the same algorithm-breadth is reachable here:

* VertexMap(U, f, m)      (api.h:96-140)  → filter + withColumns
* EdgeMapDense(U, T, f, m)(api.h:144-268) → edges ⋈ U → groupBy(target)
* EdgeMapSparse(U, f, m)  (api.h:272-357) → same join with the frontier
                                            BROADCAST (push from small U)
* EdgeMap auto-switch     (api.h:361-390) → |U| vs THRESHOLD picks the
  two above — Spark's AQE does this implicitly from runtime stats; the
  explicit count-based switch is kept because the frontier df is usually
  already materialized (its size is a free metric from the driver loop).

A vertex set here is a DataFrame with an ``id`` column plus value columns;
an edge map step returns (id, <agg columns>) for the touched targets.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import Graph

#: frontier-fraction below which EdgeMap broadcasts the frontier
SPARSE_THRESHOLD = 0.05


def vertex_map(
    vset: DataFrame,
    f: Column | None = None,
    m: dict[str, Column] | None = None,
) -> DataFrame:
    """VertexMap: keep vertices satisfying ``f``, update columns per ``m``."""
    out = vset.filter(f) if f is not None else vset
    for name, col in (m or {}).items():
        out = out.withColumn(name, col)
    return out


def edge_map_dense(
    frontier: DataFrame,
    g: Graph,
    agg: list[Column],
    direction: str = "out",
) -> DataFrame:
    """Pull/shuffle form: frontier ⋈ edges (shuffle join) → groupBy target.
    ``agg`` aggregates message columns carried on the frontier."""
    e = g.out_edges.select("src", "dst")
    if direction == "both":
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    elif direction == "in":
        e = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    msgs = e.join(frontier.withColumnRenamed("id", "src"), "src")
    return msgs.groupBy(F.col("dst").alias("id")).agg(*agg)


def edge_map_sparse(
    frontier: DataFrame,
    g: Graph,
    agg: list[Column],
    direction: str = "out",
) -> DataFrame:
    """Push form: identical dataflow with the (small) frontier broadcast,
    so the big edge table is never shuffled — the EdgeMapSparse of
    api.h:272-357."""
    e = g.out_edges.select("src", "dst")
    if direction == "both":
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    elif direction == "in":
        e = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    msgs = e.join(F.broadcast(frontier.withColumnRenamed("id", "src")), "src")
    return msgs.groupBy(F.col("dst").alias("id")).agg(*agg)


def edge_map(
    frontier: DataFrame,
    g: Graph,
    agg: list[Column],
    direction: str = "out",
    frontier_size: int | None = None,
) -> DataFrame:
    """Auto dense/sparse switch (api.h:361-390): broadcast the frontier
    when it is a small fraction of the vertex set. Pass ``frontier_size``
    when the driver loop already knows it (frontier counts are the loop's
    termination metric anyway); otherwise one count() is spent."""
    if frontier_size is None:
        frontier_size = frontier.count()
    if frontier_size <= SPARSE_THRESHOLD * max(g.num_vertices, 1):
        return edge_map_sparse(frontier, g, agg, direction)
    return edge_map_dense(frontier, g, agg, direction)


def flash_cc(g: Graph, max_iter: int = 200) -> DataFrame:
    """Connected components on the primitives (the reference's
    flash/connectivity/cc.h:43-58 min-label EdgeMap loop) — demonstrates
    algorithm construction from VertexMap/EdgeMap alone.
    Returns (id, comp)."""
    state = g.vertices.select("id", F.col("id").alias("comp"))
    state = vertex_map(state, m={"changed": F.lit(True)}).persist()
    for _ in range(max_iter):
        frontier = vertex_map(state, f=F.col("changed")).select("id", "comp")
        size = frontier.count()
        if size == 0:
            break
        mins = edge_map(
            frontier, g, [F.min("comp").alias("cand")], direction="both",
            frontier_size=size,
        )
        new = (
            state.select("id", "comp")
            .join(mins, "id", "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce(F.col("cand"), F.col("comp")))
                .alias("comp"),
                (F.coalesce(F.col("cand"), F.col("comp")) < F.col("comp"))
                .alias("changed"),
            )
            # eager truncation every round: the update references state
            # multiple times, so without it plans nest exponentially
            .localCheckpoint(eager=True)
        )
        state.unpersist()
        state = new
    return state.select("id", "comp")


def flash_bfs(
    g: Graph,
    source: int,
    strategy: str = "auto",
    direction: str | None = None,
    max_iter: int = 10_000,
) -> DataFrame:
    """(id, dist) — BFS levels built from the FLASH primitives, exposing
    the reference's per-round join-strategy variants as one surface:
    flash/traversal/bfs.h (auto EdgeMap switch), bfs-push.h
    (EdgeMapSparse — the frontier is broadcast, the edge table never
    shuffles), bfs-pull.h (EdgeMapDense — frontier shuffled onto the edge
    partitioning; ED direction at :60 means messages still flow along
    out-edges, the 'pull' is the dense scan shape), bfs-undirected.h
    (``direction='both'``). All four compute identical levels — the same
    fixed point as sssp.bfs — so they share one value-hash oracle; what
    changes is the physical plan per round, which is the point of the
    family.
    """
    if strategy not in ("auto", "push", "pull"):
        raise ValueError(f"unknown strategy {strategy!r}")
    e = g.out_edges.select("src", "dst")
    if direction == "both" and g.directed:
        e = e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = e.repartition(g.num_partitions, "src")
    e = e.persist()

    from graphscope_spark.graph import materialized_checkpoint

    state = materialized_checkpoint(
        g.vertices.select(
            "id",
            F.when(F.col("id") == source, F.lit(0)).alias("dist"),
        )
    )
    nv = max(g.num_vertices, 1)
    level = 0
    fsize = state.filter(F.col("dist") == 0).count()
    while fsize > 0 and level < max_iter:
        frontier = state.filter(F.col("dist") == level).select(
            F.col("id").alias("src")
        )
        if strategy == "push" or (
            strategy == "auto" and fsize <= SPARSE_THRESHOLD * nv
        ):
            msgs = e.join(F.broadcast(frontier), "src")
        else:
            msgs = e.join(frontier, "src")
        touched = msgs.select(F.col("dst").alias("id")).distinct()
        new = materialized_checkpoint(
            state.join(touched.withColumn("_hit", F.lit(True)), "id", "left")
            .select(
                "id",
                F.coalesce(
                    F.col("dist"),
                    F.when(F.col("_hit"), F.lit(level + 1)),
                ).alias("dist"),
            )
        )
        level += 1
        fsize = new.filter(F.col("dist") == level).count()
        state.unpersist()
        state = new
    e.unpersist()
    return state.select("id", "dist")
