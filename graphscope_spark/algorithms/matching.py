"""FLASH matching family: MIS, maximal matching, vertex cover, edge cover,
dominating set.

Reference semantics (analytical_engine/apps/flash/matching/):

* ``mis.h:43-85`` — deterministic greedy MIS with static priority
  ``r(v) = deg(v)·n + id`` (mis.h:50): each round selects every undecided
  vertex with no undecided neighbor of smaller ``r`` (a local minimum of the
  priority order), adds it to the set, and marks its neighbors decided-out.
  The fixpoint equals the sequential greedy MIS taken in increasing-``r``
  order, which the pytest oracle recomputes.
* ``mm.h:44-80`` — maximal matching: each round every unmatched vertex
  proposes ``p(v) = max id over unmatched neighbors`` (mm.h:61); mutual
  proposals (``p(u)=v ∧ p(v)=u``, mm.h:63-64) become matched pairs.
* ``min-cover.h:41-105`` — greedy vertex cover by degree-threshold halving
  (rounds add every live vertex with residual uncovered-degree ≥ n/2^i and
  subtract covered edges from neighbor degrees), then a refinement loop
  that drops redundant cover vertices (all neighbors covered, no higher-id
  redundant neighbor, min-cover.h:77-99).
* ``min-edge-cover.h:42-93`` — maximal matching under min-(deg,id)
  proposals, then every still-uncovered non-isolated vertex covers itself
  with the edge to its min-(deg,id) neighbor (after a maximal matching all
  of an unmatched vertex's neighbors are matched, so the pendant edge is
  always valid; cover size = |M| + #unmatched non-isolated, the count
  min-edge-cover.h:88-92 reports).
* ``min-dominating-set.h:45-97`` — each round the undecided vertices that
  are the (cnt, id)-maximum of their undecided 2-hop neighborhood join the
  dominating set; the set and its neighbors become dominated; ``cnt`` is
  recomputed as the number of undominated neighbors.

All five are driver loops of frontier-shrinking rounds; per round the
dataflow is a bounded number of joins/groupBys on the live-vertex and
live-edge tables, with ``localCheckpoint`` truncating the per-round plans
(the discipline every iterative algorithm in this package follows).
Priorities are pure column expressions (no Python UDFs), so ties are
deterministic across partitionings and reruns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graphscope_spark.graph import Graph, materialized_checkpoint

_MEM_DISK = StorageLevel.MEMORY_AND_DISK


def _sym_simple_edges(g: Graph) -> DataFrame:
    """Undirected simple view (both directions, no self-loops) — the EU
    edge set every flash/matching app runs on."""
    e = g.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    if g.directed:
        e = e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    return e


def mis(g: Graph, max_iter: int = 10_000) -> DataFrame:
    """(id, in_mis: boolean) — deterministic greedy maximal independent set,
    priority r = deg·n + id (mis.h:50; smaller r wins, mis.h:57)."""
    n = g.num_vertices
    edges = _sym_simple_edges(g).repartition(g.num_partitions, "src").persist(
        _MEM_DISK
    )
    deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("_d")
    )
    active = materialized_checkpoint(
        g.vertices.select("id")
        .join(deg, "id", "left")
        .select(
            "id",
            (F.coalesce(F.col("_d"), F.lit(0)) * F.lit(n) + F.col("id"))
            .alias("r"),
        )
    )
    selected_parts: list[DataFrame] = []
    rounds = 0
    while rounds < max_iter and active.limit(1).count() > 0:
        rounds += 1
        # min active-neighbor priority per active vertex (mis.h check:
        # survives iff no undecided neighbor has smaller r)
        live = (
            edges.join(active.select(F.col("id").alias("src"), F.col("r").alias("_rs")), "src")
            .join(active.select(F.col("id").alias("dst")), "dst", "left_semi")
        )
        nbr_min = live.groupBy(F.col("dst").alias("id")).agg(
            F.min("_rs").alias("_nm")
        )
        annotated = active.join(nbr_min, "id", "left")
        sel = annotated.filter(
            F.col("_nm").isNull() | (F.col("r") < F.col("_nm"))
        ).select("id").localCheckpoint(eager=True)
        selected_parts.append(sel)
        # neighbors of the selected set become decided-out (mis.h reduce)
        dominated = (
            edges.join(sel.withColumnRenamed("id", "src"), "src", "left_semi")
            .select(F.col("dst").alias("id"))
            .distinct()
        )
        prev = active
        active = materialized_checkpoint(
            active.join(sel, "id", "left_anti")
            .join(dominated, "id", "left_anti")
        )
        prev.unpersist()
    edges.unpersist()
    in_set = selected_parts[0] if selected_parts else None
    for p in selected_parts[1:]:
        in_set = in_set.union(p)
    out = g.vertices.select("id")
    if in_set is None:
        return out.select("id", F.lit(False).alias("in_mis"))
    return out.join(
        in_set.select("id", F.lit(True).alias("in_mis")), "id", "left"
    ).select("id", F.coalesce(F.col("in_mis"), F.lit(False)).alias("in_mis"))


def _matching_rounds(
    edges: DataFrame,
    vertices: DataFrame,
    by_max_id: bool,
    max_iter: int,
) -> DataFrame:
    """Shared mm loop: unmatched vertices propose to their extreme unmatched
    neighbor (max id for mm.h:61; min (deg, id) for min-edge-cover.h:56-63);
    mutual proposals match. Returns (id, mate) for matched vertices."""
    if not by_max_id:
        deg = edges.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("_d")
        )
    active = materialized_checkpoint(vertices.select("id"))
    matched_parts: list[DataFrame] = []
    rounds = 0
    while rounds < max_iter and active.limit(1).count() > 0:
        rounds += 1
        live = (
            edges.join(active.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(active.withColumnRenamed("id", "dst"), "dst", "left_semi")
        )
        if by_max_id:
            # p(v) = max unmatched neighbor id (mm.h update1)
            prop = live.groupBy(F.col("dst").alias("id")).agg(
                F.max("src").alias("p")
            )
        else:
            # p(v) = unmatched neighbor minimizing (deg, id)
            # (min-edge-cover.h local)
            scored = live.join(
                deg.withColumnRenamed("id", "src").withColumnRenamed("_d", "_ds"),
                "src",
            ).select(
                F.col("dst").alias("id"),
                F.struct(
                    F.col("_ds").alias("d"), F.col("src").alias("nid")
                ).alias("_s"),
            )
            prop = scored.groupBy("id").agg(F.min("_s").alias("_sm")).select(
                "id", F.col("_sm.nid").alias("p")
            )
        # mutual: p(p(v)) == v  (mm.h check2)
        other = prop.select(F.col("id").alias("p"), F.col("p").alias("_pp"))
        mutual = (
            prop.join(other, "p")
            .filter(F.col("_pp") == F.col("id"))
            .select("id", F.col("p").alias("mate"))
            .localCheckpoint(eager=True)
        )
        if mutual.limit(1).count() == 0:
            break
        matched_parts.append(mutual)
        prev = active
        active = materialized_checkpoint(
            active.join(mutual.select("id"), "id", "left_anti")
        )
        prev.unpersist()
    out = None
    for p in matched_parts:
        out = p if out is None else out.union(p)
    if out is None:
        return vertices.sparkSession.createDataFrame([], "id long, mate long")
    return out


def maximal_matching(g: Graph, max_iter: int = 10_000) -> DataFrame:
    """(id, mate) — maximal matching via mutual max-id proposals
    (mm.h:44-80). Every matched vertex appears once; unmatched vertices are
    absent (the reference's v.s = -1)."""
    edges = _sym_simple_edges(g).repartition(g.num_partitions, "src").persist(
        _MEM_DISK
    )
    out = _matching_rounds(edges, g.vertices, by_max_id=True, max_iter=max_iter)
    out = out.localCheckpoint(eager=True)
    edges.unpersist()
    return out


def min_vertex_cover(g: Graph, max_iter: int = 10_000) -> DataFrame:
    """(id) — greedy vertex cover: degree-threshold-halving rounds
    (min-cover.h:55-75) then redundancy refinement (min-cover.h:77-99)."""
    n = g.num_vertices
    edges = _sym_simple_edges(g).repartition(g.num_partitions, "src").persist(
        _MEM_DISK
    )
    deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("d")
    )
    # phase 1: threshold halving. live = uncovered vertices with residual
    # degree (edges to uncovered vertices) > 0.
    live = materialized_checkpoint(deg)  # (id, d) uncovered, d>0
    cover_parts: list[DataFrame] = []
    nowd = max(n // 2, 1)
    rounds = 0
    while rounds < max_iter and live.limit(1).count() > 0:
        rounds += 1
        batch = live.filter(F.col("d") >= nowd).select("id") \
            .localCheckpoint(eager=True)
        cover_parts.append(batch)
        # residual degree shrinks by the number of incident newly-covered
        # endpoints (min-cover.h update/local2)
        covered_inc = (
            edges.join(batch.withColumnRenamed("id", "src"), "src", "left_semi")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        prev = live
        live = materialized_checkpoint(
            live.join(batch, "id", "left_anti")
            .join(covered_inc, "id", "left")
            .select(
                "id",
                (F.col("d") - F.coalesce(F.col("_c"), F.lit(0))).alias("d"),
            )
            .filter(F.col("d") > 0)
        )
        prev.unpersist()
        nowd = max(nowd // 2, 1)
    cover = cover_parts[0] if cover_parts else \
        g.spark.createDataFrame([], "id long")
    for p in cover_parts[1:]:
        cover = cover.union(p)
    cover = cover.distinct().localCheckpoint(eager=True)

    # phase 2: refinement — drop cover vertices whose neighbors are all
    # covered, lowest-id-first among adjacent removable ones.
    while True:
        uncovered_nbr = (
            edges.join(cover.withColumnRenamed("id", "dst"), "dst", "left_anti")
            .select(F.col("src").alias("id"))
            .distinct()
        )
        removable = cover.join(uncovered_nbr, "id", "left_anti")
        # keep v if some removable neighbor has higher id (min-cover.h
        # filter3: remove only local maxima of the removable set)
        blocked = (
            edges.join(removable.withColumnRenamed("id", "src"), "src", "left_semi")
            .filter(F.col("src") > F.col("dst"))
            .select(F.col("dst").alias("id"))
            .distinct()
        )
        drop = removable.join(blocked, "id", "left_anti") \
            .localCheckpoint(eager=True)
        if drop.limit(1).count() == 0:
            break
        cover = cover.join(drop, "id", "left_anti").localCheckpoint(eager=True)
    edges.unpersist()
    return cover.select("id")


def min_edge_cover(g: Graph, max_iter: int = 10_000) -> DataFrame:
    """(src, dst) — edge cover (canonical src < dst): maximal matching
    under min-(deg, id) proposals plus one pendant edge per remaining
    uncovered non-isolated vertex (min-edge-cover.h:42-93)."""
    edges = _sym_simple_edges(g).repartition(g.num_partitions, "src").persist(
        _MEM_DISK
    )
    deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("_d")
    ).localCheckpoint(eager=True)
    matched = _matching_rounds(
        edges, g.vertices, by_max_id=False, max_iter=max_iter
    ).localCheckpoint(eager=True)
    m_edges = matched.filter(F.col("id") < F.col("mate")).select(
        F.col("id").alias("src"), F.col("mate").alias("dst")
    )
    # pendant edges: uncovered vertex -> its min-(deg, id) neighbor
    uncovered = (
        g.vertices.select("id")
        .join(matched.select("id"), "id", "left_anti")
        .join(deg.select("id"), "id", "left_semi")  # non-isolated only
    )
    pend = (
        edges.join(uncovered.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .join(deg.withColumnRenamed("id", "src").withColumnRenamed("_d", "_ds"), "src")
        .select(
            F.col("dst").alias("id"),
            F.struct(F.col("_ds").alias("d"), F.col("src").alias("nid")).alias("_s"),
        )
        .groupBy("id")
        .agg(F.min("_s").alias("_sm"))
        .select(
            F.least(F.col("id"), F.col("_sm.nid")).alias("src"),
            F.greatest(F.col("id"), F.col("_sm.nid")).alias("dst"),
        )
    )
    out = m_edges.union(pend).distinct().localCheckpoint(eager=True)
    edges.unpersist()
    return out


def min_dominating_set(g: Graph, max_iter: int = 10_000) -> DataFrame:
    """(id) — greedy dominating set: 2-hop (cnt, id)-maxima join the set
    each round (min-dominating-set.h:45-97)."""
    edges = _sym_simple_edges(g).repartition(g.num_partitions, "src").persist(
        _MEM_DISK
    )
    deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # undecided (= undominated) vertices with cnt = # undominated neighbors
    und = materialized_checkpoint(
        g.vertices.select("id")
        .join(deg, "id", "left")
        .select("id", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"))
    )
    chosen_parts: list[DataFrame] = []
    rounds = 0
    while rounds < max_iter and und.limit(1).count() > 0:
        rounds += 1
        # two max-propagation hops over undecided neighbors, self included
        # (min-dominating-set.h local ×2)
        cur = und.select(
            "id", F.struct(F.col("cnt").alias("c"), F.col("id").alias("i")).alias("m")
        )
        for _ in range(2):
            nbr = (
                edges.join(cur.withColumnRenamed("id", "src"), "src")
                .join(und.select(F.col("id").alias("dst")), "dst", "left_semi")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.max("m").alias("_nm"))
            )
            cur = cur.join(nbr, "id", "left").select(
                "id",
                F.greatest(F.col("m"), F.coalesce(F.col("_nm"), F.col("m"))).alias("m"),
            )
        sel = cur.filter(F.col("m.i") == F.col("id")).select("id") \
            .localCheckpoint(eager=True)
        if sel.limit(1).count() == 0:
            break
        chosen_parts.append(sel)
        newly_dom = (
            edges.join(sel.withColumnRenamed("id", "src"), "src", "left_semi")
            .select(F.col("dst").alias("id"))
            .distinct()
            .union(sel)
            .distinct()
        )
        remaining = und.select("id").join(newly_dom, "id", "left_anti")
        # cnt = # undominated neighbors, recomputed on the shrunk set
        new_cnt = (
            edges.join(remaining.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(remaining.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        prev = und
        und = materialized_checkpoint(
            remaining.join(new_cnt, "id", "left")
            .select("id", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"))
        )
        prev.unpersist()
    edges.unpersist()
    if not chosen_parts:
        return g.spark.createDataFrame([], "id long")
    out = chosen_parts[0]
    for p in chosen_parts[1:]:
        out = out.union(p)
    return out.distinct()
