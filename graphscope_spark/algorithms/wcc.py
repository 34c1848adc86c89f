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
    skew: str | None = "auto",
) -> SuperstepResult:
    """Returns state ``(id: long, comp: long, changed: boolean)``; ``comp``
    is the min reachable vertex id. Callers typically select(id, comp).

    ``skew="auto"`` (default): measure the hub set once (operators/skew.py
    measured_hub_keys — one count + top-n agg) and, when any key's edge
    block exceeds a partition's fair share, SALT those hubs' blocks.
    Salting — not isolation — is the right remedy for a min-combiner: the
    map-side partial min already collapses hub-destination traffic, so
    the remaining cost is the straggler task owning the hub's source
    block, which only a salt spreads (measured on the 20M skewed bench
    input: plain 83.1 s = isolate 83.1 s with a 106.7 s worst task vs
    salted 63.4 s; see operators/skew.py module docs). On uniform inputs
    the measured hub set is empty and the plan stays plain. Min is
    order-independent, so every variant is bit-identical. Pass
    ``skew=None`` to disable the sensor.

    ``hub_salts > 1``: force-salt the top ``hub_top_n`` hubs
    (operators/skew.py HubSaltedEdges). ``hub_isolate=True``:
    broadcast-isolate MEASURED hubs instead (HubIsolatedEdges) — kept for
    the bench matrix; the sum-combiner remedy, not the right default
    here."""
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
    elif skew == "auto":
        from graphscope_spark.operators.skew import HubSaltedEdges

        # measured-skew auto policy (module docs in operators/skew.py):
        # min-combiner → salt, and only when a hub block exceeds a
        # partition's share; empty hub set (or a graph below the sensor
        # floor) → plain path below. The hub set comes from the CACHED
        # degree-derived sensor (Graph.measured_hubs, mode="sym": the
        # symmetrized table's block per key is out_deg+in_deg when
        # directed, out_deg on bidirectionally-stored undirected Graphs)
        # — no per-call edge aggregation.
        hubs = g.measured_hubs("sym", top_n=hub_top_n)
        if hubs:
            salted = HubSaltedEdges(
                both, key="src", n_salts=8, top_n=hub_top_n,
                num_partitions=g.num_partitions, hub_keys=hubs,
            )
    if salted is None:
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

    The vertex state stays PACKED: B rows ``(blk, n, comps, changed,
    nchanged)`` whose buffers hold the block's component labels (int64)
    and frontier mask (uint8) aligned with the spilled sorted vertex ids
    — Θ(V)·9 bytes of state per round, never row-shaped. Per round each
    block's changed subset scatters per-destination label MINIMA
    block-locally against the FRAGMENT-LOCAL adjacency
    (csr.spill_csr_blocks_indexed — mmap'd by the worker, edges cross
    Arrow exactly once at pack time) as ≤B packed buffers; the receive
    cogroup merges and keeps-smaller. Terminates when no label changes
    (vote checked every 2 rounds via a SUM over B per-block counters —
    min-label is monotone, late votes are free)."""
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

    _STATE_SCHEMA = (
        "blk int, n long, comps binary, changed binary, nchanged long"
    )

    def _init_state(pdf: pd.DataFrame) -> pd.DataFrame:
        # one grouped pass: spill the sorted vertex ids (degs unused by
        # this engine — zeros) AND emit the packed init row
        ids = np.sort(pdf["id"].to_numpy(np.int64), kind="stable")
        blk = int(pdf["blk"].iloc[0])
        csrmod.save_vertex_arrays(
            sd, blk, ids, np.zeros(ids.size, np.int64))
        return pd.DataFrame([{
            "blk": blk,
            "n": int(ids.size),
            "comps": ids.tobytes(),
            "changed": np.ones(ids.size, np.uint8).tobytes(),
            "nchanged": int(ids.size),
        }])

    init = (
        g.vertices.select("id", block_expr("id", b).alias("blk"))
        .groupBy("blk")
        .applyInPandas(_init_state, _STATE_SCHEMA)
        .repartition(b, "blk")
    )

    def gather(key, pdf):
        # the block's single packed state row → min-label messages from
        # its CHANGED subset; adjacency and vertex ids come from the
        # worker-local mmap.
        empty = pd.DataFrame({
            "sblk": pd.Series(dtype=np.int32),
            "dblk": pd.Series(dtype=np.int32),
            "ids": pd.Series(dtype=object),
            "mins": pd.Series(dtype=object),
        })
        blk = int(key[0])
        buf = csrmod.load_spilled_block(sd, blk)
        if buf is None or len(pdf) == 0:
            return empty
        st = pdf.iloc[0]
        if int(st["nchanged"]) == 0:
            return empty
        vb = csrmod.load_spilled_vertices(sd, blk)
        vids = np.asarray(vb["vids"])
        comps = np.frombuffer(st["comps"], np.int64)
        mask = np.frombuffer(st["changed"], np.uint8).view(bool)
        per_edge, inv_m, _ = csrmod._frontier_edges(
            buf, vids[mask], comps[mask]
        )
        if inv_m.size == 0:
            return empty
        sel, mins = csrmod._group_min(inv_m, per_edge)
        rows = csrmod._emit_packed(blk, buf["bounds"], buf["uniq"], sel,
                                   {"mins": mins})
        return pd.DataFrame(rows) if rows else empty

    def update(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(right) == 0:
            return pd.DataFrame(
                columns=["blk", "n", "comps", "changed", "nchanged"])
        st = right.iloc[0]
        blk = int(st["blk"])
        comps = np.frombuffer(st["comps"], np.int64)
        new = comps.copy()
        mids, mmins = merge_packed_min(left)
        if mids.size:
            vids = np.asarray(
                csrmod.load_spilled_vertices(sd, blk)["vids"])
            pos = np.searchsorted(vids, mids)
            # mids are unique (merge_packed_min dedups) → plain fancy min
            new[pos] = np.minimum(new[pos], mmins)
        changed = new < comps
        return pd.DataFrame([{
            "blk": blk,
            "n": int(new.size),
            "comps": new.tobytes(),
            "changed": changed.astype(np.uint8).tobytes(),
            "nchanged": int(changed.sum()),
        }])

    def step(state: DataFrame, rnd: int) -> DataFrame:
        packed = state.groupBy("blk").applyInPandas(
            gather, "sblk int, dblk int, ids binary, mins binary"
        )
        return (
            packed.groupby("dblk")
            .cogroup(state.groupby("blk"))
            .applyInPandas(update, _STATE_SCHEMA)
        )

    def metrics_fn(prev: DataFrame, new: DataFrame, rnd: int) -> dict:
        return {
            "frontier": int(
                new.agg(F.coalesce(F.sum("nchanged"), F.lit(0))).first()[0]
            )
        }

    def should_stop(m: dict) -> bool:
        return m["frontier"] == 0

    runner = SuperstepRunner(spark, name="wcc_block", truncate_every=1)
    with csrmod.block_run_confs(spark, b):
        res = runner.run(init, step, max_iter, metrics_fn=metrics_fn,
                         should_stop=should_stop, check_every=2)

    def _unpack(it):
        for pdf in it:
            for row in pdf.itertuples(index=False):
                vb = csrmod.load_spilled_vertices(sd, int(row.blk))
                yield pd.DataFrame({
                    "id": np.asarray(vb["vids"]),
                    "comp": np.frombuffer(row.comps, np.int64),
                    "changed": np.frombuffer(row.changed, np.uint8)
                    .view(bool),
                })

    state = res.state.mapInPandas(
        _unpack, "id long, comp long, changed boolean"
    ).localCheckpoint(eager=True)
    csrmod.cleanup_spill(sd)
    return SuperstepResult(
        state=state, rounds=res.rounds, metrics=res.metrics,
        run_id=res.run_id,
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
