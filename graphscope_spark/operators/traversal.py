"""Graph-traversal operators of the GIE algebra — the ones Spark has no
primitive for, implemented as DataFrame compositions.

EdgeExpand / GetV / PathExpand / ExpandIntersect per
interactive_engine/executor/ir/proto/algebra.proto:257-386 and the Rust
runtime (flatmap/edge_expand.rs, map/get_v.rs, map/expand_intersect.rs).

Conventions: a "traversal frame" is a DataFrame whose current head vertex
is column ``v``; tags (As, algebra.proto:280) are just extra columns the
caller keeps. PathExpand accumulates the path in an array column — SIMPLE
paths filter vertex revisits with array_contains; TRAIL filters edge
revisits the same way over an accumulated edge-key array.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import Graph


def edge_expand(
    frame: DataFrame,
    g: Graph,
    direction: str = "out",
    to: str = "v",
    expand_e: bool = False,
) -> DataFrame:
    """EdgeExpand (algebra.proto:285-313; flatmap/edge_expand.rs): from
    head vertices ``v`` to adjacent edges (expand_e) or neighbor vertices
    (ExpandV — the fused ExpandE+GetV of ExpandGetVFusionRule,
    SURVEY.md §4.2). direction ∈ {out, in, both}."""
    e = g.edges.select("src", "dst")
    if direction == "out":
        joined = frame.join(e, frame["v"] == e["src"])
        nxt = F.col("dst")
    elif direction == "in":
        joined = frame.join(e, frame["v"] == e["dst"])
        nxt = F.col("src")
    elif direction == "both":
        both = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        joined = frame.join(both, frame["v"] == both["src"])
        nxt = F.col("dst")
    else:
        raise ValueError(direction)
    if expand_e:
        return joined
    keep = [c for c in frame.columns if c != "v"]
    return joined.select(*keep, nxt.alias(to)).withColumnRenamed(to, "v")


def get_v(edge_frame: DataFrame, which: str = "end") -> DataFrame:
    """GetV (algebra.proto:257-284; map/get_v.rs): edge → endpoint.
    which ∈ {start, end, other} (other requires the caller to carry the
    entry endpoint as column ``v``)."""
    if which == "start":
        col = F.col("src")
    elif which == "end":
        col = F.col("dst")
    elif which == "other":
        col = F.when(F.col("v") == F.col("src"), F.col("dst")).otherwise(F.col("src"))
    else:
        raise ValueError(which)
    keep = [c for c in edge_frame.columns if c not in ("src", "dst", "v")]
    return edge_frame.select(*keep, col.alias("v"))


def path_expand(
    start: DataFrame,
    g: Graph,
    min_hops: int,
    max_hops: int,
    direction: str = "out",
    path_opt: str = "arbitrary",
    result_opt: str = "end_v",
) -> DataFrame:
    """PathExpand (algebra.proto:314-358; Gremlin sugar
    docs/interactive_engine/tinkerpop/supported_gremlin_steps.md:578-709):
    bounded repetition hop ∈ [min_hops, max_hops], path_opt ∈ {arbitrary,
    simple, trail} (simple = no revisited vertex; trail = no revisited
    edge, per algebra.proto path_opt TRAIL — edge identity is the
    underlying stored edge, so under ``both`` one directed edge may not
    be traversed twice even in opposite directions, while reciprocal
    edges (u,v) and (v,u) remain two distinct trail edges),
    result_opt ∈ {end_v, all_v}.

    ``start``: DataFrame with column ``v`` (start vertices). Returns
    (start, v, hops [, path]) — one row per reachable (start, path) per
    the reference's path semantics (duplicates when multiple paths reach
    the same vertex, like the Rust runtime's stream of path records).

    Driver-side bounded loop = the reference's compiled iteration
    (pegasus iteration/{switch,feedback}.rs); each hop is one join stage.
    """
    trail = path_opt == "trail"
    e = g.edges.select("src", "dst")
    if trail:
        # edge identity = the stored edge's ordered (src, dst), stamped
        # BEFORE any reversal so a ``both`` traversal of one edge in
        # either direction carries the same key.
        e = e.withColumn(
            "_ek",
            F.concat_ws(
                "\x01", F.col("src").cast("string"), F.col("dst").cast("string")
            ),
        )
    rev_cols = [F.col("dst").alias("src"), F.col("src").alias("dst")] + (
        [F.col("_ek")] if trail else []
    )
    if direction == "in":
        e = e.select(*rev_cols)
    elif direction == "both":
        e = e.union(e.select(*rev_cols))

    cur = start.select(
        F.col("v").alias("start"),
        F.col("v"),
        F.lit(0).alias("hops"),
        F.array(F.col("v")).alias("path"),
    )
    if trail:
        cur = cur.withColumn("epath", F.array().cast("array<string>"))
    out = [cur.filter(F.lit(min_hops) <= 0)]
    for hop in range(1, max_hops + 1):
        joined = cur.join(e, cur["v"] == e["src"])
        if trail:
            joined = joined.filter(~F.array_contains(F.col("epath"), F.col("_ek")))
        cols = [
            F.col("start"),
            F.col("dst").alias("v"),
            (F.col("hops") + 1).alias("hops"),
            F.concat(F.col("path"), F.array(F.col("dst"))).alias("path"),
        ]
        if trail:
            cols.append(F.concat(F.col("epath"), F.array(F.col("_ek"))).alias("epath"))
        nxt = joined.select(*cols)
        if path_opt == "simple":
            nxt = nxt.filter(
                ~F.array_contains(F.slice(F.col("path"), 1, hop), F.col("v"))
            )
        cur = nxt
        if hop >= min_hops:
            out.append(cur)
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    if result_opt == "end_v":
        return res.select("start", "v", "hops")
    return res.drop("epath") if trail else res


def expand_intersect(
    frame: DataFrame, g: Graph, tags: list[str], direction: str = "out"
) -> DataFrame:
    """ExpandIntersect (map/expand_intersect.rs:956; ExtendIntersectRule
    CBO §4.2): extend each of the tagged vertices by one hop and intersect
    the neighbor sets — the pattern-match primitive behind triangle+
    patterns. Implemented as a multi-way semi-join: neighbors of tags[0]
    ∩ neighbors of tags[1] ∩ … for each frame row.

    Returns the frame with a new column ``v`` = a member of the
    intersection (exploded)."""
    e = g.edges.select("src", "dst")
    if direction == "both":
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    cur = None
    for t in tags:
        nbrs = frame.join(e, frame[t] == e["src"]).select(
            *frame.columns, F.col("dst").alias("cand")
        )
        cur = nbrs if cur is None else cur.join(
            nbrs.select(*[F.col(c) for c in frame.columns], "cand"),
            on=[*frame.columns, "cand"],
            how="inner",
        )
    return cur.withColumnRenamed("cand", "v")
