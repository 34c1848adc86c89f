"""CDLP / label propagation — LDBC Graphalytics community detection.

Reference semantics (`lpa` app → grape::CDLP of libgrape-lite, registered at
coordinator/gscoordinator/builtin/app/.gs_conf.yaml:79; LDBC-deterministic
per docs/performance_and_benchmark.md:14; exact-match golden `p2p-31-CDLP`,
python/graphscope/tests/conftest.py:778-781): init label = vertex id; each
synchronous round every vertex adopts the most frequent label among its
neighbors' previous-round labels — for directed graphs the neighbor multiset
is the union of in- and out-edges — with ties broken by the minimum label;
exactly ``max_iter`` rounds (default 10,
python/graphscope/analytical/app/lpa.py:29-55). Neighbor-less vertices keep
their label.

Spark dataflow per round: labels ⋈ edges (both directions) →
groupBy(id, label).count → deterministic argmax via a window ordered by
(count DESC, label ASC) — never `first()` without an order, which would be
partition-order nondeterministic (SURVEY.md §7.3 hard-part b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphscope_spark.graph import Graph
from graphscope_spark.pregel import SuperstepRunner, SuperstepResult


def _sensor_floor() -> int:
    # read at call time so tests can pin skew.SKEW_SENSOR_MIN_EDGES = 0
    from graphscope_spark.operators import skew as skewmod

    return skewmod.SKEW_SENSOR_MIN_EDGES


def cdlp(
    g: Graph,
    max_iter: int = 10,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
    run_id: str | None = None,
    resume: bool = False,
    skew: str | None = "auto",
) -> SuperstepResult:
    """Returns state ``(id: long, label: long)``.

    ``skew="auto"`` (default): when a measured hub's edge block exceeds a
    partition's fair share (operators/skew.py measured_hub_keys), SALT
    the hub blocks of the per-round label join — CDLP's count-argmax
    combiner partial-aggregates map-side like a min, so the straggler is
    the task owning the hub's edge block, the salting case of the policy
    table in operators/skew.py. Integer counting + deterministic
    (count DESC, label ASC) tie-break → salted runs are bit-identical.
    Empty hub set (uniform input) → plain path. ``skew=None`` disables."""
    spark = g.spark
    edges = g.out_edges.select("src", "dst")
    salted_src = salted_dst = None
    if skew == "auto" and g.num_edges >= _sensor_floor():
        from graphscope_spark.operators.skew import HubSaltedEdges

        # hub sets from the CACHED degree-derived sensor
        # (Graph.measured_hubs) — no per-call edge aggregation
        hubs = g.measured_hubs("out")
        if hubs:
            salted_src = HubSaltedEdges(
                edges, key="src", n_salts=8,
                num_partitions=g.num_partitions, hub_keys=hubs,
            )
        if g.directed:
            # the in-direction join keys on dst — its own sensor + cache
            dhubs = g.measured_hubs("in")
            if dhubs:
                salted_dst = HubSaltedEdges(
                    edges, key="dst", n_salts=8,
                    num_partitions=g.num_partitions, hub_keys=dhubs,
                )

    init = g.vertices.select("id", F.col("id").alias("label"))

    def step(state: DataFrame, rnd: int) -> DataFrame:
        st_src = state.withColumnRenamed("id", "src")
        out_msgs = (
            salted_src.message_join(st_src)
            if salted_src is not None
            else edges.join(st_src, "src")
        ).select(F.col("dst").alias("id"), "label")
        msgs = out_msgs
        if g.directed:
            st_dst = state.withColumnRenamed("id", "dst")
            in_msgs = (
                salted_dst.message_join(st_dst)
                if salted_dst is not None
                else edges.join(st_dst, "dst")
            ).select(F.col("src").alias("id"), "label")
            msgs = out_msgs.union(in_msgs)

        counts = msgs.groupBy("id", "label").agg(F.count(F.lit(1)).alias("c"))
        w = Window.partitionBy("id").orderBy(
            F.col("c").desc(), F.col("label").asc()
        )
        top = (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("id", F.col("label").alias("new_label"))
        )
        return (
            state.join(top, "id", "left")
            .select(
                "id",
                F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
            )
            .repartition(g.num_partitions, "id")
        )

    runner = SuperstepRunner(
        spark,
        name="cdlp",
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
        run_id=run_id,
        truncate_every=3,
    )
    res = runner.run(init, step, max_iter, resume=resume)
    for s in (salted_src, salted_dst):
        if s is not None:
            s.unpersist()
    return res


def cdlp_block(
    g: Graph,
    max_iter: int = 10,
    num_blocks: int | None = None,
) -> SuperstepResult:
    """CDLP over hash-partitioned CSR block DataFrames — identical
    semantics to :func:`cdlp` (LDBC most-frequent-neighbor-label, ties →
    min, synchronous fixed rounds), alternative physical plan
    (graphscope_spark/csr.py; see pagerank_block for the architecture).

    The join engine's per-round ``groupBy(id, label).count`` + window
    argmax shuffles Θ(E) message rows then Θ(distinct (id,label)) count
    rows. Here each block run-length-counts its own (dst, label) pairs
    in numpy against the FRAGMENT-LOCAL mmap'd adjacency
    (csr.spill_csr_blocks_indexed — edges cross Arrow exactly once, at
    pack time), ships them as ≤B packed (ids, labels, counts) buffers
    per block, and the receive cogroup finishes the count-sum +
    (count DESC, label ASC) argmax — integer arithmetic throughout, so
    the result is deterministic and hash-matches the join engine's SQL
    twin exactly."""
    import numpy as np
    import pandas as pd

    from graphscope_spark import csr as csrmod
    from graphscope_spark.csr import argmax_packed_labels, block_expr

    spark = g.spark
    if g.num_vertices == 0:
        empty = spark.createDataFrame([], "id long, label long")
        return SuperstepResult(state=empty, rounds=0, metrics=[])

    b = num_blocks or csrmod.default_num_blocks(g)
    sd, _ = csrmod.spill_csr_blocks_indexed(g, b, direction="both")

    # Message dtype: CDLP labels ARE vertex ids, so when every id fits
    # int32 the (ids, labels, counts) message buffers ship as int32 —
    # HALF the Arrow/shuffle bytes of the int64 spelling. The message
    # volume (distinct (dst, label) pairs ≈ E in the early rounds before
    # labels coalesce) is what makes CDLP the slowest LDBC number for the
    # reference too; at V < 2³¹ this is free. One tiny agg over the
    # cached vertices table decides it for both sides of the exchange.
    _mm = g.vertices.agg(F.min("id"), F.max("id")).first()
    use32 = (_mm[0] is not None and _mm[0] >= 0
             and _mm[1] < 2**31)
    msg_dt = np.int32 if use32 else np.int64

    _STATE_SCHEMA = "blk int, n long, labels binary"

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
            "labels": ids.tobytes(),
        }])

    init = (
        g.vertices.select("id", block_expr("id", b).alias("blk"))
        .groupBy("blk")
        .applyInPandas(_init_state, _STATE_SCHEMA)
        .repartition(b, "blk")
    )

    def gather(key, pdf):
        # the block's packed label row → per-(dst, label) run-length
        # counts against the worker-local mmap'd adjacency.
        #
        # Kernel shape (round-5 pass — the label-histogram scatter was
        # the per-core gap vs pagerank_block, VERDICT r4 #6): labels are
        # DENSE-MAPPED block-locally (≤ n_src distinct — a V-sized
        # unique, not E-sized), each edge's (dest-index, label-index)
        # pair packs into ONE int64 `inv << 32 | lidx`, and a single
        # in-place np.sort + run-length pass replaces the two E-sized
        # stable argsorts + gathers the old path paid per round. Counts
        # are integers and the label order inside each destination run
        # (index asc = label asc, np.unique sorts) is unchanged, so the
        # result is bit-identical.
        empty = pd.DataFrame({
            "sblk": pd.Series(dtype=np.int32),
            "dblk": pd.Series(dtype=np.int32),
            "ids": pd.Series(dtype=object),
            "labels": pd.Series(dtype=object),
            "counts": pd.Series(dtype=object),
        })
        blk = int(key[0])
        buf = csrmod.load_spilled_block(sd, blk)
        if buf is None or len(pdf) == 0:
            return empty
        vb = csrmod.load_spilled_vertices(sd, blk)
        vids = np.asarray(vb["vids"])
        labels = np.frombuffer(pdf.iloc[0]["labels"], np.int64)
        srcs = np.asarray(buf["srcs"])
        counts_e = np.diff(np.asarray(buf["indptr"]))
        pos = np.searchsorted(vids, srcs)
        lab_u, lidx = np.unique(labels, return_inverse=True)
        lidx_src = lidx[pos].astype(np.int32)
        pkey = (np.asarray(buf["inv"]).astype(np.int64) << 32) | np.repeat(
            lidx_src, counts_e)
        if pkey.size == 0:
            return empty
        pkey.sort()
        first = np.concatenate(([True], pkey[1:] != pkey[:-1]))
        starts = np.flatnonzero(first)
        cnt = np.diff(np.append(starts, pkey.size)).astype(msg_dt)
        ksel = pkey[starts]
        rows = csrmod._emit_packed(
            blk, buf["bounds"],
            np.asarray(buf["uniq"]).astype(msg_dt, copy=False),
            ksel >> 32,
            {"labels": lab_u.astype(msg_dt, copy=False)[ksel & 0xFFFFFFFF],
             "counts": cnt},
        )
        return pd.DataFrame(rows) if rows else empty

    def update(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(right) == 0:
            return pd.DataFrame(columns=["blk", "n", "labels"])
        st = right.iloc[0]
        blk = int(st["blk"])
        new = np.frombuffer(st["labels"], np.int64).copy()
        mids, mlabs = argmax_packed_labels(
            left, dtypes=(msg_dt, msg_dt, msg_dt))
        if mids.size:
            vids = np.asarray(
                csrmod.load_spilled_vertices(sd, blk)["vids"])
            new[np.searchsorted(vids, mids)] = mlabs
        return pd.DataFrame([{
            "blk": blk, "n": int(new.size), "labels": new.tobytes(),
        }])

    def step(state: DataFrame, rnd: int) -> DataFrame:
        packed = state.groupBy("blk").applyInPandas(
            gather,
            "sblk int, dblk int, ids binary, labels binary, counts binary",
        )
        return (
            packed.groupby("dblk")
            .cogroup(state.groupby("blk"))
            .applyInPandas(update, _STATE_SCHEMA)
        )

    runner = SuperstepRunner(spark, name="cdlp_block", truncate_every=1)
    with csrmod.block_run_confs(spark, b):
        res = runner.run(init, step, max_iter)

    def _unpack(it):
        for pdf in it:
            for row in pdf.itertuples(index=False):
                vb = csrmod.load_spilled_vertices(sd, int(row.blk))
                yield pd.DataFrame({
                    "id": np.asarray(vb["vids"]),
                    "label": np.frombuffer(row.labels, np.int64),
                })

    state = res.state.mapInPandas(
        _unpack, "id long, label long"
    ).localCheckpoint(eager=True)
    csrmod.cleanup_spill(sd)
    return SuperstepResult(
        state=state, rounds=res.rounds, metrics=res.metrics,
        run_id=res.run_id,
    )


def lpa_by_color(g: Graph, max_rounds: int = 10) -> DataFrame:
    """(id, label) — color-scheduled (Gauss–Seidel) label propagation,
    flash/clustering/lpa-by-color.h:44-146.

    A Jones–Plassmann coloring partitions the vertices into independent
    sets; within each super-round the color classes relabel SEQUENTIALLY,
    each class seeing the labels already updated by earlier classes in the
    same super-round (the reference's ``cset[j]`` loop at :119-137). The
    asynchronous schedule kills the 2-cycle label oscillation synchronous
    LPA suffers on bipartite-ish regions, and because each class is an
    independent set, updates WITHIN a class are order-free — so the
    algorithm stays deterministic and embarrassingly parallel per class.
    Ties break to the minimum label (the LDBC convention our cdlp uses;
    the reference's first-max in CSR order is machine-dependent —
    documented deviation). Stops after a super-round with no change or
    after ``max_rounds`` super-rounds.

    Scale shape: per class step = one frontier-sized join + window argmax;
    the edge table is pre-joined with target colors ONCE and persisted, so
    class filtering is a cached-scan predicate, not a per-step shuffle.
    """
    from graphscope_spark.algorithms.coloring import color as _color
    from graphscope_spark.graph import materialized_checkpoint
    from pyspark.sql import Window

    e = g.out_edges.select("src", "dst")
    both = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        if g.directed else e
    )
    colors = _color(g).localCheckpoint(eager=True)
    classes = sorted(r[0] for r in colors.select("color").distinct().collect())
    # edges annotated with the TARGET's color class, paid once
    ec = (
        both.join(
            colors.select(F.col("id").alias("dst"), F.col("color").alias("tc")),
            "dst",
        )
        .repartition(g.num_partitions, "src")
        .persist()
    )
    ec.count()

    state_ck = materialized_checkpoint(
        g.vertices.select("id", F.col("id").alias("label"))
        .join(colors, "id", "left")
        .fillna(0, ["color"])
        .withColumn("_chg", F.lit(False))
    )
    for _ in range(max_rounds):
        changed_any = 0
        for c in classes:
            state = state_ck.select("id", "label", "color")
            msgs = ec.filter(F.col("tc") == c).join(
                state.select(F.col("id").alias("src"), "label"), "src"
            ).select(F.col("dst").alias("id"), "label")
            counts = msgs.groupBy("id", "label").agg(
                F.count(F.lit(1)).alias("c")
            )
            w = Window.partitionBy("id").orderBy(
                F.col("c").desc(), F.col("label").asc()
            )
            top = (
                counts.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select("id", F.col("label").alias("new_label"))
            )
            new_ck = materialized_checkpoint(
                state.join(top, "id", "left").select(
                    "id",
                    F.coalesce(F.col("new_label"), F.col("label"))
                    .alias("label"),
                    "color",
                    (
                        F.col("new_label").isNotNull()
                        & (F.col("new_label") != F.col("label"))
                    ).alias("_chg"),
                )
            )
            changed_any += new_ck.filter("_chg").limit(1).count()
            state_ck.unpersist()
            state_ck = new_ck
        if changed_any == 0:
            break
    ec.unpersist()
    return state_ck.select("id", "label")
