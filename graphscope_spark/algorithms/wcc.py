"""Weakly connected components — min-label propagation with a frontier.

Reference semantics (gs::WCCProjected,
analytical_engine/apps/projected/wcc_projected.h:62-183): every vertex
starts labeled with its own id (:76-81); each round takes the min label over
neighbors in BOTH edge directions, tracking a modified-vertex frontier
(:83-121,140-166); terminates when no label changes. Component id therefore
converges to the minimum vertex id reachable in the underlying undirected
graph.

Spark dataflow per round: messages from the *changed frontier only* (the
curr_modified/next_modified DenseVertexSets of :58-59 become a boolean
``changed`` column) along both directions → groupBy(id).min → keep-smaller
join; one scalar count action = the termination vote. Shuffle volume is
proportional to the frontier, not the graph — same property the reference's
frontier sets buy it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import Graph, materialized_checkpoint
from graphscope_spark.pregel import SuperstepRunner, SuperstepResult


def wcc(
    g: Graph,
    max_iter: int = 200,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
    run_id: str | None = None,
    resume: bool = False,
) -> SuperstepResult:
    """Returns state ``(id: long, comp: long, changed: boolean)``; ``comp``
    is the min reachable vertex id. Callers typically select(id, comp)."""
    spark = g.spark
    # both directions, symmetrized ONCE outside the loop — weak
    # connectivity ignores orientation (wcc_projected.h:92-106 iterates
    # out- then in-adjacency; one pre-built union table costs one join per
    # round instead of two).
    e = g.out_edges.select("src", "dst")
    if g.directed:
        both = e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    else:
        # undirected Graphs store the edge list bidirectionally already
        # (to_undirected / copurchase convention) — re-symmetrizing would
        # double per-round message volume (min-agg keeps it correct but
        # wastes half the shuffle).
        both = e
    both = both.repartition(g.num_partitions, "src").persist()

    init = g.vertices.select(
        "id", F.col("id").alias("comp"), F.lit(True).alias("changed")
    )

    def step(state: DataFrame, rnd: int) -> DataFrame:
        frontier = state.filter("changed").select(
            F.col("id").alias("src"), "comp"
        )
        mins = (
            both.join(frontier, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("comp").alias("cand"))
        )
        return (
            state.select("id", "comp")
            .join(mins, "id", "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce(F.col("cand"), F.col("comp")))
                .alias("comp"),
                (F.coalesce(F.col("cand"), F.col("comp")) < F.col("comp"))
                .alias("changed"),
            )
        )

    def metrics_fn(prev: DataFrame, new: DataFrame, rnd: int) -> dict:
        active = new.filter("changed").count()
        return {"frontier": int(active)}

    def should_stop(m: dict) -> bool:
        return m["frontier"] == 0

    runner = SuperstepRunner(
        spark,
        name="wcc",
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
        run_id=run_id,
    )
    # min-label propagation is monotone — rounds past convergence are
    # no-ops, so the termination vote runs every 2 rounds (check_every)
    res = runner.run(init, step, max_iter, metrics_fn=metrics_fn,
                     should_stop=should_stop, resume=resume, check_every=2)
    both.unpersist()
    return res


def cc_log(g: Graph, max_iter: int = 64) -> DataFrame:
    """(id, comp) — connected components in O(log n) rounds via hooking +
    pointer jumping (flash/connectivity/cc-log.h:57-135, the FLASH
    Shiloach–Vishkin app: min-neighbor hook, then jump(A) shortcuts
    ``v.p = GetV(v.p)->p`` until stars).

    Identical output to :func:`wcc` (comp = min reachable vertex id), but
    round count scales with log(diameter) instead of diameter: each round
    is one hook (min neighbor-label exchange — the same one-shuffle message
    pattern as a wcc round) followed by two pointer jumps (self-joins on
    the vertex-sized label table). Use for high-diameter graphs — e.g. the
    Tarjan–Vishkin auxiliary graph, whose path-like blocks make plain
    min-label propagation take Θ(block length) rounds.

    Invariant: comp(v) is always the id of a vertex in v's component and
    only decreases; at the hook fixpoint comps are constant across every
    edge, hence equal to the component minimum.
    """
    e = g.out_edges.select("src", "dst")
    if g.directed:
        both = e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    else:
        both = e
    both = both.repartition(g.num_partitions, "src").persist()

    # the round state is SELF-joined (hook reads comp twice, each jump is a
    # comp⋈comp) — materialized_checkpoint keeps stats bounded (see its
    # docstring for the failure mode a bare localCheckpoint has here)
    comp = materialized_checkpoint(
        g.vertices.select("id", F.col("id").alias("comp"))
    )
    for _ in range(max_iter):
        # hook: comp(v) ← min(comp(v), min over neighbors of comp(u))
        mins = (
            both.join(comp.select(F.col("id").alias("src"), "comp"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("comp").alias("cand"))
        )
        hooked = (
            comp.join(mins, "id", "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce(F.col("cand"), F.col("comp")))
                .alias("comp"),
                (F.coalesce(F.col("cand"), F.col("comp")) < F.col("comp"))
                .alias("_chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = hooked.filter("_chg").limit(1).count()
        prev = comp
        comp = hooked.select("id", "comp")
        if changed == 0:
            break
        # two pointer jumps: comp ← comp[comp] (cc-log.h jump(A))
        for _ in range(2):
            comp = (
                comp.join(
                    comp.select(F.col("id").alias("comp"),
                                F.col("comp").alias("_cc")),
                    "comp", "left",
                )
                .select("id", F.coalesce(F.col("_cc"), F.col("comp"))
                        .alias("comp"))
            )
        comp = materialized_checkpoint(comp)
        prev.unpersist()
    both.unpersist()
    return comp
