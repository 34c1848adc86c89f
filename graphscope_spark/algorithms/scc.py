"""Strongly connected components — forward/backward min-label coloring.

Reference semantics (apps/flash/connectivity/scc.h:42-81): repeat on the
unassigned vertex set A:
  1. fid := own id; propagate min fid along DIRECTED edges restricted to A
     until fixpoint (scc.h:59-66) — fid(v) = min id among A-vertices that
     reach v within A;
  2. pivots = {v : fid(v) = v}; scc(pivot) = pivot (scc.h:68);
  3. propagate assignment BACKWARD (reverse edges, scc.h:70-76): v joins
     scc c when some out-neighbor has scc = c = fid(v) — i.e. v both is
     colored c and reaches the pivot c;
  4. A = still-unassigned; loop until A empty.
Component id = pivot id = the minimum vertex id in its SCC (the pivot is
minimal among vertices reaching its color set and belongs to the SCC).

Scale shape: each inner propagation is the WCC dataflow (frontier join +
min aggregation, shuffle ∝ frontier); the outer loop peels at least one
SCC per pass — real graphs' giant SCC goes in pass 1 and the tail passes
run on the small remainder (the same argument the reference's FLASH
implementation relies on). State is localCheckpoint-truncated every
round through the superstep kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import Graph
from graphscope_spark.pregel import SuperstepRunner


def _propagate_min(
    seed: DataFrame, edges: DataFrame, runner_name: str, spark,
    max_iter: int = 10_000,
) -> DataFrame:
    """Min-label fixpoint of ``seed(id, lab)`` along ``edges(src, dst)``:
    lab(v) := min(lab(v), min_{u→v} lab(u)) until stable. Frontier-driven —
    the EdgeMap(B, …) inner loops of scc.h:59-66,70-76."""
    init = seed.select("id", "lab", F.lit(True).alias("changed"))

    def step(state: DataFrame, rnd: int) -> DataFrame:
        frontier = state.filter("changed").select(
            F.col("id").alias("src"), "lab"
        )
        mins = (
            edges.join(frontier, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("lab").alias("cand"))
        )
        return (
            state.select("id", "lab")
            .join(mins, "id", "left")
            .select(
                "id",
                F.least(F.col("lab"), F.coalesce(F.col("cand"), F.col("lab")))
                .alias("lab"),
                (F.coalesce(F.col("cand"), F.col("lab")) < F.col("lab"))
                .alias("changed"),
            )
        )

    runner = SuperstepRunner(spark, name=runner_name)
    res = runner.run(
        init, step, max_iter,
        metrics_fn=lambda p, n, r: {"frontier": int(n.filter("changed").count())},
        should_stop=lambda m: m["frontier"] == 0,
    )
    return res.state.select("id", "lab")


#: remainder size at which the FW-BW loop hands off to a driver-local
#: Tarjan finish — the standard hybrid (coloring passes resolve one SCC
#: per color region per pass, so a long tail of tiny SCCs costs one full
#: distributed pass EACH; after the giant components are peeled the
#: remainder is collected once and solved exactly). 1M vertices of
#: (id, src, dst) longs is tens of MB on the driver — safe.
LOCAL_FINISH_THRESHOLD = 1_000_000


def _tarjan(vertices: list[int], edges: list[tuple[int, int]]) -> dict[int, int]:
    """Iterative Tarjan; comp = min id of the SCC (driver-local finish)."""
    adj: dict[int, list[int]] = {v: [] for v in vertices}
    for s, d in edges:
        if s != d:
            adj[s].append(d)
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on_stack: set[int] = set()
    stack: list[int] = []
    comp: dict[int, int] = {}
    ctr = 0
    for root in vertices:
        if root in index:
            continue
        work = [(root, iter(adj[root]))]
        index[root] = low[root] = ctr
        ctr += 1
        stack.append(root)
        on_stack.add(root)
        while work:
            v, it = work[-1]
            advanced = False
            for w in it:
                if w not in index:
                    index[w] = low[w] = ctr
                    ctr += 1
                    stack.append(w)
                    on_stack.add(w)
                    work.append((w, iter(adj[w])))
                    advanced = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                low[work[-1][0]] = min(low[work[-1][0]], low[v])
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    members.append(w)
                    if w == v:
                        break
                m = min(members)
                for w in members:
                    comp[w] = m
    return comp


def scc(
    g: Graph,
    max_outer: int = 1000,
    local_threshold: int = LOCAL_FINISH_THRESHOLD,
) -> DataFrame:
    """(id, comp) — comp = min vertex id of the strongly connected
    component. Requires a directed graph (an undirected graph's SCCs are
    its connected components — use wcc).

    Hybrid execution: trim + FW-BW coloring passes (scc.h) peel singleton
    and pivot SCCs distributed; when the unassigned remainder drops to
    ``local_threshold`` vertices the induced subgraph is collected and
    finished with Tarjan on the driver (``local_threshold=0`` forces the
    pure distributed path)."""
    spark = g.spark
    # AQE is disabled for the duration of the FW-BW loops: with adaptive
    # execution on, every query-stage re-plan of these deeply nested
    # checkpoint-join loops regenerates plan strings whose logical-stat
    # products are astronomically large BigIntegers — observed 700 s of
    # driver CPU inside BigInteger.pow formatting ONE plan description.
    # The loops here are many tiny stages; AQE's runtime re-plan buys
    # nothing for them (skew handling matters in the per-round message
    # shuffle of pagerank-shaped jobs, which keep AQE on).
    aqe_prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return _scc_inner(g, max_outer, local_threshold)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_prev)


def _scc_inner(g: Graph, max_outer: int, local_threshold: int) -> DataFrame:
    spark = g.spark
    edges_fwd = g.edges.select("src", "dst").filter(
        F.col("src") != F.col("dst")
    ).repartition(g.num_partitions, "src").persist()

    unassigned = g.vertices.select("id").localCheckpoint(eager=True)
    assigned_parts: list[DataFrame] = []

    for _ in range(max_outer):
        if unassigned.count() == 0:
            break
        # Trim (standard FW-BW preprocessing, not in scc.h but required for
        # DataFrame economics): vertices with no in- or no out-edge within
        # the unassigned subgraph are singleton SCCs — peel them iteratively
        # before coloring, otherwise a DAG-shaped region costs one full
        # coloring pass per chain vertex.
        while True:
            ef0 = (
                edges_fwd.join(unassigned.withColumnRenamed("id", "src"),
                               "src", "left_semi")
                .join(unassigned.withColumnRenamed("id", "dst"), "dst",
                      "left_semi")
            )
            two_sided = (
                unassigned
                .join(ef0.select(F.col("src").alias("id")).distinct(), "id",
                      "left_semi")
                .join(ef0.select(F.col("dst").alias("id")).distinct(), "id",
                      "left_semi")
                .localCheckpoint(eager=True)
            )
            trimmed = unassigned.join(two_sided, "id", "left_anti")
            n_trim = trimmed.count()
            if n_trim == 0:
                break
            assigned_parts.append(
                trimmed.select("id", F.col("id").alias("comp"))
                .localCheckpoint(eager=True)
            )
            unassigned = two_sided
        n_left = unassigned.count()
        if n_left == 0:
            break
        # restrict both edge directions to the unassigned set (EjoinV(…, A))
        ef = (
            edges_fwd.join(unassigned.withColumnRenamed("id", "src"), "src",
                           "left_semi")
            .join(unassigned.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
        if 0 < n_left <= local_threshold:
            # driver-local Tarjan finish on the small remainder
            verts_l = [r["id"] for r in unassigned.collect()]
            edges_l = [(r["src"], r["dst"]) for r in ef.collect()]
            comp_l = _tarjan(verts_l, edges_l)
            assigned_parts.append(
                spark.createDataFrame(
                    sorted(comp_l.items()), "id long, comp long"
                ).repartition(g.num_partitions, "id")
            )
            unassigned = unassigned.limit(0)
            break
        eb = ef.select(F.col("dst").alias("src"), F.col("src").alias("dst"))

        # 1. forward min-label coloring
        colors = _propagate_min(
            unassigned.select("id", F.col("id").alias("lab")), ef,
            "scc_fwd", spark,
        )
        # 2+3. pivots self-assign, then the assignment flows backward but
        # only onto vertices whose color equals the pivot (check2 of
        # scc.h:71-73: s.scc == d.fid). Encoding: run a min-label fixpoint
        # backward seeded with lab = id for pivots / +inf otherwise, then
        # keep vertices where the propagated label equals their color.
        # Propagating the COLOR value backward preserves the restriction
        # because a vertex only accepts a label equal to its own color.
        pivots_seed = colors.select(
            "id",
            F.when(F.col("lab") == F.col("id"), F.col("id"))
            .otherwise(F.lit(None).cast("long")).alias("scc"),
        )
        # backward frontier loop with the color-equality guard
        state = (
            pivots_seed.join(colors.withColumnRenamed("lab", "color"), "id")
            .select("id", "color", "scc",
                    F.col("scc").isNotNull().alias("changed"))
            .localCheckpoint(eager=True)
        )
        while True:
            frontier = state.filter("changed").select(
                F.col("id").alias("src"), F.col("scc").alias("msg")
            )
            # reverse edges: successor → predecessor. The color-equality
            # guard (scc.h:71-73, s.scc == d.fid) is applied BEFORE the
            # aggregation: only the message matching the receiver's color
            # can assign it, so a smaller foreign-color message must not
            # shadow it under min().
            msgs = (
                eb.join(frontier, "src")
                .select(F.col("dst").alias("id"), "msg")
                .join(state.select("id", "color"), "id")
                .filter(F.col("msg") == F.col("color"))
                .select("id").distinct()
                .withColumn("hit", F.lit(True))
            )
            state = (
                state.select("id", "color", "scc")
                .join(msgs, "id", "left")
                .select(
                    "id", "color",
                    F.when(
                        F.col("scc").isNull() & F.col("hit"), F.col("color")
                    ).otherwise(F.col("scc")).alias("scc"),
                    (F.col("scc").isNull() & F.coalesce(F.col("hit"), F.lit(False)))
                    .alias("changed"),
                )
                .localCheckpoint(eager=True)
            )
            if state.filter("changed").count() == 0:
                break
        done = state.filter(F.col("scc").isNotNull()).select(
            "id", F.col("scc").alias("comp")
        ).localCheckpoint(eager=True)
        assigned_parts.append(done)
        unassigned = state.filter(F.col("scc").isNull()).select(
            "id"
        ).localCheckpoint(eager=True)

    out = assigned_parts[0] if assigned_parts else g.vertices.select(
        "id", F.col("id").alias("comp")
    ).limit(0)
    for p in assigned_parts[1:]:
        out = out.union(p)
    edges_fwd.unpersist()
    return out
