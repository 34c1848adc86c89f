"""Simple-path family + BFS output formats.

Reference semantics:
* all_simple_paths (apps/simple_path/all_simple_paths.h, registry
  .gs_conf.yaml:270): every loop-free path from ``source`` to any vertex
  in ``targets`` with length ≤ cutoff (networkx all_simple_paths).
* is_simple_path (apps/simple_path/is_simple_path.h, registry :278):
  predicate — the given vertex sequence has no repeats and every
  consecutive pair is an edge (networkx is_simple_path).
* bfs_generic output formats (apps/bfs/bfs_generic.h:125-155): besides
  levels, the app can emit the BFS tree as ``predecessors`` (v, parent),
  ``edges`` (parent, v), or ``successors`` (v, child). The reference's
  predecessor is traversal-order dependent; we pin parent = MINIMUM-id
  neighbor at distance−1, so outputs are reproducible.

Spark dataflow: all_simple_paths is PathExpand(SIMPLE) (operators/
traversal.py) from one start — a bounded driver loop of per-hop joins with
array-based revisit filtering; path-count blowup is inherent to the
problem, bounded by ``cutoff`` exactly as the reference bounds it.
is_simple_path joins the (tiny, broadcast) consecutive-pair list against
the edge table. bfs_parents is one extra join over the bfs level table —
for each v at dist d, min id among in-neighbors at dist d−1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphscope_spark.algorithms.sssp import bfs
from graphscope_spark.functions.hashing import hash64
from graphscope_spark.graph import Graph
from graphscope_spark.operators.traversal import path_expand


def all_simple_paths(
    g: Graph,
    source: int,
    targets: list[int] | DataFrame,
    cutoff: int = 10,
) -> DataFrame:
    """(path_str, hops) — every simple path source→target with ≤ cutoff
    hops, serialized as "a->b->c" (a join-key-stable spelling that both
    Spark and SQL oracles can produce)."""
    spark = g.spark
    if not isinstance(targets, DataFrame):
        targets = spark.createDataFrame([(int(t),) for t in targets], "v long")
    start = spark.createDataFrame([(int(source),)], "v long")
    paths = path_expand(
        start, g, min_hops=1, max_hops=cutoff,
        path_opt="simple", result_opt="all_v",
    )
    return (
        paths.join(targets.select(F.col("v")), "v", "left_semi")
        .select(
            F.concat_ws("->", F.transform(F.col("path"),
                                          lambda x: x.cast("string")))
            .alias("path_str"),
            F.col("hops"),
        )
    )


def is_simple_path(g: Graph, path: list[int]) -> bool:
    """True iff ``path`` is a simple path in g (is_simple_path.h /
    networkx): no repeated vertices, every hop an edge. Length-0 → False,
    length-1 → vertex existence (networkx convention)."""
    if len(path) == 0:
        return False
    if len(set(path)) != len(path):
        return False
    if len(path) == 1:
        return g.has_node(path[0])
    spark = g.spark
    hops = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(path, path[1:])], "src long, dst long"
    )
    missing = hops.join(
        g.edges.select("src", "dst"), ["src", "dst"], "left_anti"
    ).count()
    return missing == 0


def bfs_parents(g: Graph, source: int) -> DataFrame:
    """(id, dist, parent) — the BFS tree in ``predecessors`` format
    (bfs_generic.h:138-143); parent = min-id neighbor one level closer,
    NULL for the source and unreachable vertices."""
    levels = bfs(g, source).state.select("id", "dist").localCheckpoint(eager=True)
    e = g.edges.select("src", "dst")
    if not g.directed:
        e = e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    parents = (
        e.join(levels.select(F.col("id").alias("src"),
                             F.col("dist").alias("d_src")), "src")
        .join(levels.select(F.col("id").alias("dst"),
                            F.col("dist").alias("d_dst")), "dst")
        .filter(F.col("d_dst") == F.col("d_src") + 1)
        .groupBy(F.col("dst").alias("id"))
        .agg(F.min("src").alias("parent"))
    )
    return (
        levels.join(parents, "id", "left")
        .select("id", "dist",
                F.when(F.col("id") == source, F.lit(None).cast("long"))
                .otherwise(F.col("parent")).alias("parent"))
    )


def bfs_edges(g: Graph, source: int) -> DataFrame:
    """(parent, id) — the BFS tree in ``edges`` format
    (bfs_generic.h:132-137)."""
    return (
        bfs_parents(g, source)
        .filter(F.col("parent").isNotNull())
        .select("parent", "id")
    )


def bfs_successors(g: Graph, source: int) -> DataFrame:
    """(id, child) — ``successors`` format (bfs_generic.h:144-155): every
    tree child grouped under its parent."""
    return (
        bfs_parents(g, source)
        .filter(F.col("parent").isNotNull())
        .select(F.col("parent").alias("id"), F.col("id").alias("child"))
    )


def sampling_path(
    g: Graph,
    pattern: list,
    vertex_label_col: str = "vlabel",
    edge_label_col: str = "elabel",
    limit: int | None = None,
) -> DataFrame:
    """Label-pattern path enumeration (apps/sampling_path/sampling_path.h:
    43-85): ``pattern`` alternates vertex and edge labels
    ``[v0, e0, v1, e1, v2, …]`` (length 2k+1 → paths of k+1 vertices);
    a path matches when every vertex/edge carries the required label.
    Vertices must carry ``vertex_label_col``; edges ``edge_label_col``.

    Spark dataflow: one join per hop — start set filtered on v0, each hop
    filters the edge table on e_i and the destination on v_{i+1} (the
    reference's per-level adjacency-list label filter, :59-67).

    ``limit`` is the reference's sampling cap (sampling_path.h:112-120),
    but where the reference's cap is execution-order-dependent (workers
    stop when the allreduced count passes the limit), here it is applied
    *deterministically after every hop*: the frontier keeps the ``limit``
    lowest paths ranked by a portable 60-bit hash of the path
    (functions/hashing.py, replayable in SQL oracles). This is also the
    scale story — the frontier is bounded by ``limit`` rows per hop
    regardless of fan-out, so a high-degree labeled graph costs ``hops``
    bounded joins, never a combinatorial path materialization. Catalyst
    compiles the single-ordering window into a partial top-k (map-side
    limit per partition, then one reduced sort of ≤ P·limit rows)."""
    if len(pattern) % 2 == 0 or len(pattern) < 1:
        raise ValueError("pattern must alternate v/e labels, odd length")

    def prune(df: DataFrame) -> DataFrame:
        if limit is None:
            return df
        key = hash64(F.concat_ws("-", F.col("path")))
        w = Window.orderBy(key, F.col("path"))
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= limit)
            .drop("_rn")
        )

    vlab = g.vertices.select("id", F.col(vertex_label_col).alias("_vl"))
    e = g.edges.select("src", "dst", F.col(edge_label_col).alias("_el"))
    cur = prune(
        vlab.filter(F.col("_vl") == pattern[0])
        .select(F.col("id").alias("v"), F.array(F.col("id")).alias("path"))
    )
    n_hops = (len(pattern) - 1) // 2
    for h in range(n_hops):
        el, vl = pattern[2 * h + 1], pattern[2 * h + 2]
        eh = e.filter(F.col("_el") == el).select(
            F.col("src").alias("v"), F.col("dst").alias("_nxt")
        )
        vh = vlab.filter(F.col("_vl") == vl).select(
            F.col("id").alias("_nxt")
        )
        cur = prune(
            cur.join(eh, "v")
            .join(vh, "_nxt", "left_semi")
            .select(
                F.col("_nxt").alias("v"),
                F.concat(F.col("path"), F.array(F.col("_nxt"))).alias("path"),
            )
        )
    return cur.select("path")


def shortest_path_expand(g: Graph, source: int, target: int) -> DataFrame:
    """ALL shortest paths ``source``→``target`` as vertex-id arrays —
    GIE ShortestPathExpand (algebra.proto:358-383; planned/commented in
    the reference — the PathExpand base with hop-count weight, the
    default when no WeightCal is given).

    Dataflow: one BFS gives levels; edges are then restricted to the
    shortest-path DAG (dist(dst) = dist(src)+1) and paths are enumerated
    BACKWARD from the target with dist(target) prepend-joins. Enumerating
    only DAG edges means per-hop work ∝ the number of shortest paths
    (inherent output size), never the all-paths blowup; the level table is
    computed once, checkpoint-truncated by the superstep loop.

    Returns ``(path_str, hops)`` — the same "a->b->c" serialization as
    :func:`all_simple_paths` — empty DataFrame if target is unreachable.
    """
    levels = bfs(g, source).state.filter(F.col("dist").isNotNull())
    levels = levels.persist()
    trow = levels.filter(F.col("id") == target).select("dist").first()
    if trow is None:
        levels.unpersist()
        return g.spark.createDataFrame([], "path_str string, hops long")
    dist_t = int(trow[0])
    # shortest-path DAG: edges that advance the BFS level by exactly one
    dag = (
        g.out_edges.join(
            levels.select(F.col("id").alias("src"),
                          F.col("dist").alias("sd")), "src")
        .join(levels.select(F.col("id").alias("dst"),
                            F.col("dist").alias("dd")), "dst")
        .filter(F.col("dd") == F.col("sd") + 1)
        .select("src", "dst", "sd")
    ).persist()
    paths = g.spark.createDataFrame(
        [(target, [target])], "head long, path array<long>"
    )
    for d in range(dist_t, 0, -1):
        paths = (
            dag.filter(F.col("sd") == d - 1)
            .join(paths, F.col("dst") == F.col("head"))
            .select(
                F.col("src").alias("head"),
                F.concat(F.array(F.col("src")), F.col("path")).alias("path"),
            )
        )
        if d % 8 == 0:  # truncate the growing join lineage on deep paths
            paths = paths.localCheckpoint(eager=True)
    out = paths.select(
        F.concat_ws("->", F.transform(F.col("path"),
                                      lambda x: x.cast("string")))
        .alias("path_str"),
        F.lit(dist_t).cast("long").alias("hops"),
    )
    out = out.localCheckpoint(eager=True)
    levels.unpersist()
    dag.unpersist()
    return out
