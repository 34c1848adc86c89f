"""DFS preorder ranks — the reference's `dfs` app.

Reference: analytical_engine/apps/dfs/dfs.h:49-170. The reference algorithm
is inherently sequential: exactly ONE vertex holds the traversal token at
any time; visiting a neighbor on another fragment costs a full superstep
(message + barrier), and backtracking across a fragment boundary costs
another. Its output is a preorder `rank` per reached vertex (source rank 0,
each newly visited vertex gets max_rank+1) with neighbors tried in CSR
adjacency order, i.e. ascending vertex id (docs/frag_intro.md: oe_lists
sorted by lid).

Spark re-expression: a distributed dataflow cannot beat the reference's
one-active-vertex critical path — a faithful shuffle-per-token port would be
strictly slower (2 Spark jobs per edge). So we collect the adjacency lists
(id, sorted neighbor array) to the driver behind an explicit size guard and
run the stack DFS in memory, returning a DataFrame. This preserves the
reference's exact rank/parent semantics at graph sizes where a sequential
algorithm is usable at all; beyond the guard the honest answer is "DFS does
not scale — in the reference either" (SURVEY.md §2.2 lists it as degraded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import Graph

#: refuse to collect adjacency beyond this many edges — past this size the
#: sequential traversal (ours or the reference's) is the wrong tool.
MAX_COLLECT_EDGES = 5_000_000


def dfs(g: Graph, source: int) -> DataFrame:
    """Preorder DFS from ``source`` over out-edges, neighbors in ascending
    id order (the reference's CSR order). Returns ``(id, rank, parent)``
    for reached vertices; source has rank 0 and parent NULL.
    """
    n_edges = g.num_edges
    if n_edges > MAX_COLLECT_EDGES:
        raise ValueError(
            f"dfs: {n_edges} edges exceeds the sequential-traversal guard "
            f"({MAX_COLLECT_EDGES}); DFS is inherently sequential "
            "(reference dfs.h holds one token vertex per superstep) — use "
            "bfs/sssp for scalable traversal"
        )
    adj_rows = (
        g.out_edges.groupBy("src")
        .agg(F.sort_array(F.collect_set("dst")).alias("nbrs"))
        .collect()
    )
    adj = {r["src"]: r["nbrs"] for r in adj_rows}

    rank: dict[int, int] = {source: 0}
    parent: dict[int, int | None] = {source: None}
    # explicit stack of (vertex, next-neighbor-index) — preorder numbering,
    # identical to the reference's token walk with backtrack
    stack: list[tuple[int, int]] = [(source, 0)]
    next_rank = 1
    while stack:
        v, i = stack[-1]
        nbrs = adj.get(v, [])
        while i < len(nbrs) and nbrs[i] in rank:
            i += 1
        if i >= len(nbrs):
            stack.pop()
            continue
        stack[-1] = (v, i + 1)
        u = nbrs[i]
        rank[u] = next_rank
        parent[u] = v
        next_rank += 1
        stack.append((u, 0))

    return g.spark.createDataFrame(
        [(v, r, parent[v]) for v, r in rank.items()],
        "id long, rank int, parent long",
    )
