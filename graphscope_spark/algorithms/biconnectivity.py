"""Biconnectivity: BCC labels, bridges, articulation points.

Reference semantics (SURVEY.md §2.2, FLASH connectivity family):
  * analytical_engine/apps/flash/connectivity/bcc.h — biconnected-component
    label per vertex/edge;
  * bridge.h:46-150 — spanning tree + per-non-tree-edge tree-path walks
    marking covered tree edges; uncovered tree edges are bridges;
  * cut-point.h — articulation points from the same tree structure.

The reference's formulation walks tree paths sequentially per non-tree edge
(bridge.h:108-135, a driver-side loop over neighbors). That does not
distribute. The Spark-first re-expression is the classic PRAM algorithm the
FLASH papers themselves cite as the parallel baseline — Tarjan–Vishkin
(SIAM J. Comput. 1985; presentation follows JáJá, *An Introduction to
Parallel Algorithms*, §5.3):

  1. BFS spanning forest (per-component min-id root, min-id parent ties) —
     frontier-proportional shuffles, one per level.
  2. Euler tour of each tree (arcs (p,v)+(v,p), successor = next neighbor
     in cyclic id-order) ranked by **pointer doubling**: O(log V) rounds of
     self-joins on a 2|V|-row arc table — the PRAM list-ranking primitive
     as a Spark dataflow.  Gives entry/exit positions tin/tout, so
     "w ∈ subtree(v)" is the interval test tin(v) ≤ tin(w) ∧ tout(w) ≤
     tout(v) — no per-pair walks.
  3. low/high per vertex (min/max tin over non-tree partners anywhere in
     the subtree) by level-wise bottom-up aggregation over the BFS depths —
     each vertex touched exactly once across all rounds.
  4. Auxiliary graph on tree edges (keyed by child vertex):
       R1  non-tree edge (u,w), neither an ancestor of the other
           → aux edge (u, w);
       R2  tree edge (v,p), p not a root, and some non-tree edge leaves
           subtree(p) from within subtree(v)
           (low(v) < tin(p) ∨ high(v) > tout(p)) → aux edge (v, p).
     Connected components of the aux graph (log-round :func:`cc_log`) are the
     biconnected components.  A block containing exactly one graph edge is
     a bridge; a vertex incident to ≥2 distinct blocks is an articulation
     point (root/leaf special cases fall out of the same rule).

Scale notes: every step is joins/groupBys on vertex- or edge-sized tables;
the only driver loops are the BFS (diameter rounds — same caveat as every
BFS app in the reference) and the log₂-round pointer doubling. State per
round is localCheckpoint-truncated so plans stay flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.storagelevel import StorageLevel

from graphscope_spark.algorithms.wcc import cc_log, wcc
from graphscope_spark.graph import Graph, materialized_checkpoint

_MEM_DISK = StorageLevel.MEMORY_AND_DISK


def _sym_edges(g: Graph) -> DataFrame:
    """Symmetrized simple edge list (src, dst), no self-loops, deduped."""
    e = g.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    return (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )


def bfs_forest(g: Graph, max_iter: int = 10_000) -> DataFrame:
    """(id, root, parent, depth) — BFS spanning forest, one tree per
    weakly-connected component, rooted at the component's min vertex id
    (the same root convention as the reference's cid seed, bridge.h:53),
    parent ties broken to the min id.  ``parent`` is null at roots."""
    edges = _sym_edges(g).repartition(g.num_partitions, "src").persist(_MEM_DISK)
    comp = cc_log(g).select("id", "comp")
    roots = comp.filter(F.col("id") == F.col("comp")).select(
        "id", F.col("id").alias("root"),
        F.lit(None).cast("long").alias("parent"), F.lit(0).alias("depth"),
    )
    visited = roots.localCheckpoint(eager=True)
    frontier = visited
    depth = 0
    while depth < max_iter:
        depth += 1
        nxt = (
            edges.join(frontier.select(F.col("id").alias("src"), "root"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("src").alias("parent"), F.min("root").alias("root"))
            .join(visited.select("id"), "id", "left_anti")
            .select("id", "root", "parent", F.lit(depth).alias("depth"))
        )
        frontier = nxt.localCheckpoint(eager=True)
        if frontier.isEmpty():
            break
        visited = visited.union(frontier)
        if depth % 8 == 0:
            # coalesce before the snapshot: union concatenates partitions,
            # so 8 accumulated levels × P parts would otherwise give every
            # downstream stage ~8P tasks of near-empty work
            visited = visited.coalesce(g.num_partitions) \
                .localCheckpoint(eager=True)
    edges.unpersist()
    return visited.coalesce(g.num_partitions).localCheckpoint(eager=True)


def _euler_tour_positions(forest: DataFrame) -> DataFrame:
    """(id, tin, tout) from the Euler tour of each tree in ``forest``.

    Arcs are the two directions of every tree edge; succ((u,v)) is
    (v, next neighbor of v after u in cyclic min-id order).  The tour of a
    tree is a single cycle broken at the root's first arc, then ranked by
    pointer doubling (JáJá §3.1): rank(x) ← rank(x) + rank(succ(x));
    succ(x) ← succ(succ(x)) — ⌈log₂ 2|V|⌉ self-joins.

    Positions are per-tree (each component tours independently); interval
    tests are only ever made within one component, so that is sound.
    Roots get tin=-1 / tout=+∞-like sentinels covering their whole tree.
    """
    te = forest.filter(F.col("parent").isNotNull()).select(
        F.col("parent").alias("u"), F.col("id").alias("v")
    )
    # tree adjacency, both directions, neighbor rank in sorted id order
    adj = te.union(te.select(F.col("v").alias("u"), F.col("u").alias("v")))
    w = Window.partitionBy("u").orderBy("v")
    adj = adj.select("u", "v", (F.row_number().over(w) - 1).alias("r"))
    degs = adj.groupBy("u").agg(F.max("r").alias("maxr"))
    # succ of arc (a→b): at vertex b, the neighbor after a (cyclic).
    # adj row (u, v, r) says "v sits at rank r in u's list", i.e. for the
    # arc (v→u) the incoming neighbor v has rank r at u — so _b=u, _a=v.
    rev = adj.select(
        F.col("u").alias("_b"), F.col("v").alias("_a"), F.col("r").alias("_ra")
    )
    nxt = (
        rev.join(degs.select(F.col("u").alias("_b"), "maxr"), "_b")
        .select(
            "_a", "_b",
            F.when(F.col("_ra") == F.col("maxr"), F.lit(0))
            .otherwise(F.col("_ra") + 1).alias("_rn"),
        )
        .join(
            adj.select(F.col("u").alias("_b"), F.col("v").alias("_nv"),
                       F.col("r").alias("_rn")),
            ["_b", "_rn"],
        )
        .select(
            F.col("_a").alias("su"), F.col("_b").alias("sv"),
            F.col("_b").alias("nu"), F.col("_nv").alias("nv"),
        )
    )
    # arcs with their successor; break the cycle where succ re-enters the
    # root's first arc (root→min neighbor)
    root_first = (
        forest.filter(F.col("parent").isNull())
        .select(F.col("id").alias("nu"))
        .join(adj.filter(F.col("r") == 0).select(F.col("u").alias("nu"),
                                                 F.col("v").alias("nv")), "nu")
        .select("nu", "nv", F.lit(True).alias("_brk"))
    )
    arcs = (
        nxt.join(root_first, ["nu", "nv"], "left")
        .select(
            F.col("su").alias("u"), F.col("sv").alias("v"),
            F.when(F.col("_brk"), F.lit(None)).otherwise(F.col("nu")).alias("nu"),
            F.when(F.col("_brk"), F.lit(None)).otherwise(F.col("nv")).alias("nv"),
            F.lit(1).alias("d"),
        )
    ).localCheckpoint(eager=True)

    # pointer doubling: d = distance to list end (inclusive of self).
    # After k rounds every pointer has jumped 2^k arcs, so exactly
    # ⌈log₂(tour length)⌉ rounds null out every successor — run that fixed
    # count with NO per-round emptiness action. Each round SELF-joins the
    # previous round's table, so the state is materialized_checkpoint-ed
    # (a bare localCheckpoint squares the stored size estimate per round —
    # see graph.py::materialized_checkpoint).
    arcs = arcs.persist(_MEM_DISK)
    n_arcs = max(arcs.count(), 1)
    rounds = max(n_arcs.bit_length(), 1)
    for _ in range(rounds):
        succ = arcs.select(
            F.col("u").alias("nu"), F.col("v").alias("nv"),
            F.col("nu").alias("nnu"), F.col("nv").alias("nnv"),
            F.col("d").alias("nd"),
        )
        prev = arcs
        arcs = materialized_checkpoint(
            arcs.join(succ, ["nu", "nv"], "left")
            .select(
                "u", "v",
                F.col("nnu").alias("nu"), F.col("nnv").alias("nv"),
                F.when(F.col("nd").isNotNull(), F.col("d") + F.col("nd"))
                .otherwise(F.col("d")).alias("d"),
            )
        )
        prev.unpersist()

    # per-tree position = (tour length) − d; tour length per component via
    # the root's own entry arcs — equivalently max d within the tree.  Tag
    # arcs by tree root using the forest's root column of the child side.
    child_root = forest.select("id", "root")
    arcs = (
        arcs.join(child_root.select(F.col("id").alias("u"),
                                    F.col("root").alias("_ru")), "u")
        .select("u", "v", "d", F.col("_ru").alias("root"))
    )
    tlen = arcs.groupBy("root").agg(F.max("d").alias("_len"))
    pos = (
        arcs.join(tlen, "root")
        .select("u", "v", (F.col("_len") - F.col("d")).alias("pos"))
    )
    down = forest.filter(F.col("parent").isNotNull()).select(
        F.col("parent").alias("u"), F.col("id").alias("v")
    )
    tin = down.join(pos, ["u", "v"]).select(F.col("v").alias("id"),
                                            F.col("pos").alias("tin"))
    tout = (
        down.select(F.col("v").alias("u"), F.col("u").alias("v"))
        .join(pos, ["u", "v"])
        .select(F.col("u").alias("id"), F.col("pos").alias("tout"))
    )
    roots = forest.filter(F.col("parent").isNull()).select(
        "id", F.lit(-1).alias("tin"), F.lit(1 << 62).alias("tout")
    )
    return tin.join(tout, "id").union(roots).localCheckpoint(eager=True)


def _low_high(
    forest: DataFrame, intervals: DataFrame, nontree: DataFrame
) -> DataFrame:
    """(id, low, high) — min/max tin over non-tree-edge partners of any
    vertex in the subtree (own tin included), by bottom-up level sweep."""
    base = (
        intervals.select("id", "tin")
        .join(
            nontree.groupBy(F.col("src").alias("id"))
            .agg(F.min("ptin").alias("_plo"), F.max("ptin").alias("_phi")),
            "id", "left",
        )
        .select(
            "id",
            F.least(F.col("tin"), F.coalesce(F.col("_plo"), F.col("tin")))
            .alias("low"),
            F.greatest(F.col("tin"), F.coalesce(F.col("_phi"), F.col("tin")))
            .alias("high"),
        )
        .join(forest.select("id", "parent", "depth"), "id")
    ).persist(_MEM_DISK)
    max_depth = base.agg(F.max("depth")).first()[0] or 0
    done = base.filter(F.col("depth") == max_depth).select(
        "id", "parent", "depth", "low", "high"
    ).localCheckpoint(eager=True)
    out = done
    for d in range(max_depth - 1, -1, -1):
        child_agg = (
            done.filter(F.col("depth") == d + 1)
            .groupBy(F.col("parent").alias("id"))
            .agg(F.min("low").alias("_clo"), F.max("high").alias("_chi"))
        )
        done = (
            base.filter(F.col("depth") == d)
            .join(child_agg, "id", "left")
            .select(
                "id", "parent", "depth",
                F.least(F.col("low"), F.coalesce(F.col("_clo"), F.col("low")))
                .alias("low"),
                F.greatest(F.col("high"),
                           F.coalesce(F.col("_chi"), F.col("high")))
                .alias("high"),
            )
        ).localCheckpoint(eager=True)
        out = out.union(done)
    base.unpersist()
    return out.select("id", "low", "high").localCheckpoint(eager=True)


def bcc(g: Graph, max_iter: int = 10_000) -> DataFrame:
    """(src, dst, block) — biconnected-component label per undirected edge
    (canonical src < dst; label = min child-vertex id over the block's tree
    edges).  Reference: flash/connectivity/bcc.h (labels), via
    Tarjan–Vishkin as described in the module docstring."""
    forest = bfs_forest(g, max_iter=max_iter)
    intervals = _euler_tour_positions(forest)

    edges = _sym_edges(g)
    tree = forest.filter(F.col("parent").isNotNull()).select(
        F.col("parent").alias("src"), F.col("id").alias("dst")
    )
    tree_both = tree.union(
        tree.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    nontree_dir = edges.join(tree_both, ["src", "dst"], "left_anti")

    iv_src = intervals.select(F.col("id").alias("src"),
                              F.col("tin").alias("stin"),
                              F.col("tout").alias("stout"))
    iv_dst = intervals.select(F.col("id").alias("dst"),
                              F.col("tin").alias("ptin"),
                              F.col("tout").alias("ptout"))
    nt = (
        nontree_dir.join(iv_src, "src").join(iv_dst, "dst")
        .persist(_MEM_DISK)
    )

    low_high = _low_high(
        forest, intervals,
        nt.select("src", "ptin"),
    )

    # R1: unrelated endpoints → aux edge (src, dst); keep canonical once
    unrelated = (
        (~((F.col("stin") <= F.col("ptin")) & (F.col("ptout") <= F.col("stout"))))
        & (~((F.col("ptin") <= F.col("stin")) & (F.col("stout") <= F.col("ptout"))))
    )
    r1 = (
        nt.filter((F.col("src") < F.col("dst")) & unrelated)
        .select(F.col("src").alias("a"), F.col("dst").alias("b"))
    )
    # R2: tree edge (v,p), p not a root, subtree(v) escapes subtree(p)
    parents = forest.filter(F.col("parent").isNotNull()).select(
        "id", "parent"
    )
    gp = forest.select(F.col("id").alias("parent"),
                       F.col("parent").alias("_gp"))
    r2 = (
        parents.join(gp, "parent")
        .filter(F.col("_gp").isNotNull())
        .join(low_high, "id")
        .join(intervals.select(F.col("id").alias("parent"),
                               F.col("tin").alias("p_tin"),
                               F.col("tout").alias("p_tout")), "parent")
        .filter((F.col("low") < F.col("p_tin"))
                | (F.col("high") > F.col("p_tout")))
        .select(F.col("id").alias("a"), F.col("parent").alias("b"))
    )
    aux_one = r1.union(r2)
    # undirected Graphs store edges bidirectionally (wcc relies on it)
    aux_edges = aux_one.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).union(aux_one.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    # truncate the R1/R2 join lineage BEFORE the Graph: wcc re-embeds the
    # edge plan in every min-label round, and the un-truncated
    # nt⋈low_high⋈intervals tree makes each round's analysis grow without
    # bound (the round-1 corpus plan-growth bug class; 363 s → seconds at
    # sf0.01 with the checkpoint).
    aux_edges = aux_edges.localCheckpoint(eager=True)
    aux_vertices = forest.filter(F.col("parent").isNotNull()).select("id") \
        .localCheckpoint(eager=True)
    aux = Graph(
        aux_edges, vertices=aux_vertices, directed=False,
        num_partitions=g.num_partitions,
    )
    # log-round CC: the aux graph is path-like inside big blocks, so
    # plain min-label propagation would take Θ(block length) rounds
    blocks = cc_log(aux).select("id", F.col("comp").alias("block"))

    # every graph edge → block of its deeper endpoint's tree edge.  For a
    # tree edge (p,v) that is the child v; for a non-tree edge the deeper
    # endpoint (by tin: the descendant when related, either when unrelated
    # — R1 put both tree edges in one block, so either label matches).
    tree_lab = (
        tree.join(blocks.select(F.col("id").alias("dst"), "block"), "dst")
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"), "block",
        )
    )
    nt_lab = (
        nt.filter(F.col("src") < F.col("dst"))
        .select(
            "src", "dst",
            F.when(F.col("stin") >= F.col("ptin"), F.col("src"))
            .otherwise(F.col("dst")).alias("_deep"),
        )
        .join(blocks.select(F.col("id").alias("_deep"), "block"), "_deep")
        .select("src", "dst", "block")
    )
    out = tree_lab.union(nt_lab).localCheckpoint(eager=True)
    nt.unpersist()
    return out


def bridges(
    g: Graph, max_iter: int = 10_000, labels: DataFrame | None = None
) -> DataFrame:
    """(src, dst) bridges (src < dst) — blocks of exactly one edge
    (bridge.h:46-150: tree edges covered by no non-tree edge).
    ``labels`` lets callers reuse a precomputed :func:`bcc` result."""
    lab = bcc(g, max_iter=max_iter) if labels is None else labels
    singles = (
        lab.groupBy("block").agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") == 1)
    )
    return lab.join(singles, "block", "left_semi").select("src", "dst")


def articulation_points(
    g: Graph, max_iter: int = 10_000, labels: DataFrame | None = None
) -> DataFrame:
    """(id) articulation points — vertices incident to ≥2 distinct blocks
    (cut-point.h semantics; root/leaf cases fall out of the same rule).
    ``labels`` lets callers reuse a precomputed :func:`bcc` result."""
    lab = bcc(g, max_iter=max_iter) if labels is None else labels
    incident = lab.select(F.col("src").alias("id"), "block").union(
        lab.select(F.col("dst").alias("id"), "block")
    )
    return (
        incident.groupBy("id")
        .agg(F.countDistinct("block").alias("_nb"))
        .filter(F.col("_nb") >= 2)
        .select("id")
    )


#: canonical undirected-edge key base for :func:`bcc_canonical` — must
#: exceed every vertex id (part keys ≪ 2^21 at all gate SFs; guarded).
_EKEY = 1 << 21


def bcc_canonical(
    g: Graph, max_iter: int = 10_000, labels: DataFrame | None = None
) -> DataFrame:
    """(src, dst, block) with FOREST-INDEPENDENT block labels: the block
    partition is a graph invariant (only :func:`bcc`'s raw label values
    depend on the BFS forest), so relabelling each block by its minimum
    canonical edge key ``least*2^21 + greatest`` makes the whole output a
    deterministic function of the graph — gate-hashable against a DuckDB
    twin that grows its own spanning forest (flash_oracles.bcc_sql)."""
    lab = bcc(g, max_iter=max_iter) if labels is None else labels
    over = lab.filter(
        (F.col("src") >= _EKEY) | (F.col("dst") >= _EKEY)
    ).limit(1).count()
    if over:
        raise ValueError("bcc_canonical: vertex id >= 2^21; raise _EKEY")
    key = F.col("src") * F.lit(_EKEY) + F.col("dst")
    canon = lab.groupBy("block").agg(F.min(key).alias("_cblk"))
    return (
        lab.join(F.broadcast(canon), "block")
        .select("src", "dst", F.col("_cblk").alias("block"))
    )
