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
    hub_salts: int = 0,
    hub_top_n: int = 16,
    hub_isolate: bool = False,
) -> SuperstepResult:
    """Returns state ``(id: long, comp: long, changed: boolean)``; ``comp``
    is the min reachable vertex id. Callers typically select(id, comp).

    ``hub_salts > 1``: statically split the top ``hub_top_n`` hubs' edge
    blocks across salted partitions (operators/skew.py HubSaltedEdges) so
    the per-round frontier join has no single-task hub straggler. Min is
    order-independent, so the salted run is bit-identical to the plain
    one. ``hub_isolate=True``: broadcast-isolate MEASURED hubs instead
    (operators/skew.py HubIsolatedEdges) — no salt re-key, degrades to
    the plain join when no key exceeds a partition's share."""
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
    salted = None
    if hub_isolate:
        from graphscope_spark.operators.skew import HubIsolatedEdges

        # hub set over the symmetrized table: catches in- AND out-hubs
        salted = HubIsolatedEdges(
            both, key="src", top_n=hub_top_n,
            num_partitions=g.num_partitions,
        )
    elif hub_salts > 1:
        from graphscope_spark.operators.skew import HubSaltedEdges

        # hub set over the symmetrized table: catches in- AND out-hubs
        salted = HubSaltedEdges(
            both, key="src", n_salts=hub_salts, top_n=hub_top_n,
            num_partitions=g.num_partitions,
        )
    else:
        both = both.repartition(g.num_partitions, "src").persist()

    init = g.vertices.select(
        "id", F.col("id").alias("comp"), F.lit(True).alias("changed")
    )

    def step(state: DataFrame, rnd: int) -> DataFrame:
        frontier = state.filter("changed").select(
            F.col("id").alias("src"), "comp"
        )
        sent = (
            salted.message_join(frontier)
            if salted is not None
            else both.join(frontier, "src")
        )
        mins = (
            sent.groupBy(F.col("dst").alias("id"))
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
    if salted is not None:
        salted.unpersist()
    else:
        both.unpersist()
    return res


def wcc_block(
    g: Graph,
    max_iter: int = 200,
    num_blocks: int | None = None,
) -> SuperstepResult:
    """WCC over hash-partitioned CSR block DataFrames — identical
    semantics (and fixpoint) to :func:`wcc`, alternative physical plan
    (graphscope_spark/csr.py; see pagerank_block for the architecture).

    Per round the changed frontier (``(blk, id, comp)`` rows) groups by
    block; numpy computes per-destination label MINIMA block-locally
    against the FRAGMENT-LOCAL adjacency (csr.spill_csr_blocks_indexed —
    mmap'd by the worker, edges cross Arrow exactly once at pack time)
    and ships them as ≤B packed binary buffers per source block; the
    receive cogroup merges and keeps-smaller against the current state.
    Row-shaped shuffle per round is Θ(frontier) + Θ(V); per-edge volume
    never crosses a boundary at all after the pack. Terminates when no
    label changes (vote checked every 2 rounds — min-label is monotone,
    late votes are free)."""
    import numpy as np
    import pandas as pd

    from graphscope_spark import csr as csrmod
    from graphscope_spark.csr import block_expr, merge_packed_min

    spark = g.spark
    if g.num_vertices == 0:
        empty = spark.createDataFrame([], "id long, comp long, changed boolean")
        return SuperstepResult(state=empty, rounds=0, metrics=[])

    b = num_blocks or csrmod.default_num_blocks(g)
    sd, _ = csrmod.spill_csr_blocks_indexed(g, b, direction="both")
    init = g.vertices.select(
        "id",
        F.col("id").alias("comp"),
        F.lit(True).alias("changed"),
        block_expr("id", b).alias("blk"),
    )

    def update(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(right) == 0:
            return pd.DataFrame(columns=["id", "comp", "changed", "blk"])
        ids = right["id"].to_numpy(np.int64)
        comp = right["comp"].to_numpy(np.int64)
        new = comp.copy()
        mids, mmins = merge_packed_min(left)
        if mids.size:
            order = np.argsort(ids, kind="mergesort")
            pos = np.searchsorted(ids, mids, sorter=order)
            tgt = order[pos]
            new[tgt] = np.minimum(new[tgt], mmins)
        return pd.DataFrame({
            "id": ids,
            "comp": new,
            "changed": new < comp,
            "blk": right["blk"].to_numpy(np.int32),
        })

    def step(state: DataFrame, rnd: int) -> DataFrame:
        frontier = state.filter("changed").select(
            "blk", "id", F.col("comp").alias("val")
        )
        packed = csrmod.scatter_spilled_min(frontier, sd, b)
        receivers = state.select("blk", "id", "comp")
        return (
            packed.groupby("dblk")
            .cogroup(receivers.groupby("blk"))
            .applyInPandas(update, "id long, comp long, changed boolean, blk int")
        )

    def metrics_fn(prev: DataFrame, new: DataFrame, rnd: int) -> dict:
        return {"frontier": int(new.filter("changed").count())}

    def should_stop(m: dict) -> bool:
        return m["frontier"] == 0

    runner = SuperstepRunner(spark, name="wcc_block", truncate_every=1)
    with csrmod.block_run_confs(spark, b):
        res = runner.run(init, step, max_iter, metrics_fn=metrics_fn,
                         should_stop=should_stop, check_every=2)
    # the per-round truncation already materialized the final state rows;
    # no stage of the returned plan reads the spill files
    csrmod.cleanup_spill(sd)
    return SuperstepResult(
        state=res.state.select("id", "comp", "changed"),
        rounds=res.rounds, metrics=res.metrics, run_id=res.run_id,
    )


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
