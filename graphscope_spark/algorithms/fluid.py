"""Fluid communities — flash/clustering/fluid-community.h.

Reference semantics (analytical_engine/apps/flash/clustering/
fluid-community.h:42-105): s seed vertices start one community each
(:48-52); every round each vertex scores every community i by
d[i] = Σ_{u ∈ {v} ∪ N(v), lab(u)=i} 1/cnt[i], where cnt[i] is the
community's size from the previous round (:70-80) — the "fluid density"
damping of Parés et al. (the paper the app implements). The vertex adopts
the best community only if it beats its current one by ε=1e-10 (:81-83);
among equal-density communities the smallest index wins (the reference's
ascending scan with strict >). Unlabeled vertices (lab=-1) adopt the best
available. Rounds stop when no vertex changed, when every changed vertex
merely returned to its label of two rounds ago (the l1/l2 oscillation
damper, :64-66,101-103), or at iter_max (:47).

Determinism: the reference seeds with rand_r(time(NULL)); we pick the s
vertices minimizing (xxhash64(id, seed), id), so runs are reproducible —
the pytest oracle replays the same synchronous update sequentially.

Dataflow per round: one message shuffle (labels along edges) + a groupBy
per (vertex, community) + a struct-max argmax — all JVM-side; community
sizes enter through a join against the k-row cnt table (broadcast by AQE;
no driver collect in the loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graphscope_spark.graph import Graph, materialized_checkpoint

_EPS = 1e-10


def fluid_community(
    g: Graph, k: int = 10, seed: int = 42, max_iter: int = 100
) -> DataFrame:
    """(id, lab) — community index in [0, k) (−1 = never reached)."""
    e = g.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    if g.directed:
        e = e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    edges = e.repartition(g.num_partitions, "src").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # k pseudo-random seed vertices, community index = rank in id order
    # (the reference sorts its seed list, :52, so indexes follow id order)
    seeds = (
        g.vertices.select("id")
        .orderBy(F.xxhash64(F.col("id"), F.lit(seed)), F.col("id"))
        .limit(k)
        .select("id", (F.row_number().over(Window.orderBy("id")) - 1)
                .alias("lab"))
    )
    state = materialized_checkpoint(
        g.vertices.select("id")
        .join(seeds, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("lab"), F.lit(-1)).alias("lab"),
            F.lit(-2).alias("l1"), F.lit(-2).alias("l2"),
        )
    )
    for _ in range(max_iter):
        cnt = (
            state.filter(F.col("lab") >= 0)
            .groupBy("lab")
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        labeled = (
            state.filter(F.col("lab") >= 0)
            .select("id", "lab")
            .join(cnt, "lab")
            .select("id", "lab", (F.lit(1.0) / F.col("_n")).alias("w"))
        )
        # contributions: self + neighbors (fluid-community.h:77-80)
        nbr = (
            edges.join(labeled.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"), "lab", "w")
        )
        scores = (
            labeled.select("id", "lab", "w").union(nbr)
            .groupBy("id", "lab")
            .agg(F.sum("w").alias("d"))
        )
        # best = max d, smallest lab among ties (struct max on (d, -lab))
        best = (
            scores.groupBy("id")
            .agg(F.max(F.struct(F.col("d"),
                                (-F.col("lab")).alias("_nl"))).alias("_b"))
            .select("id", F.col("_b.d").alias("bd"),
                    (-F.col("_b._nl")).cast("int").alias("bl"))
        )
        # the current community's own score, for the ε-hysteresis switch
        cur = scores.select(
            F.col("id").alias("id"), F.col("lab").alias("lab"),
            F.col("d").alias("cd"),
        )
        new_state = (
            state.join(best, "id", "left")
            .join(cur, ["id", "lab"], "left")
            .select(
                "id",
                F.when(
                    F.col("bd").isNotNull()
                    & (
                        (F.col("lab") < 0)
                        | (F.col("bd") > F.coalesce(F.col("cd"), F.lit(0.0))
                           + F.lit(_EPS))
                    ),
                    F.col("bl"),
                ).otherwise(F.col("lab")).alias("lab"),
                F.col("lab").alias("l1"),
                F.col("l1").alias("l2"),
            )
        )
        prev = state
        state = materialized_checkpoint(new_state)
        prev.unpersist()
        # active: changed AND not a 2-cycle oscillation (:101-103)
        active = state.filter(
            (F.col("lab") != F.col("l1")) & (F.col("lab") != F.col("l2"))
        ).limit(1).count()
        if active == 0:
            break
    edges.unpersist()
    return state.select("id", "lab")


def fluid_by_color(
    g: Graph, k: int = 10, seed: int = 42, max_rounds: int = 100
) -> DataFrame:
    """(id, lab) — fluid communities under the color schedule
    (flash/clustering/fluid-by-color.h:44-175).

    Same density-damped update rule as :func:`fluid_community`, but
    scheduled Gauss–Seidel over a Jones–Plassmann coloring: community
    sizes ``cnt`` snapshot ONCE per super-round (the reference's
    ``Reduce(cnt_loc, cnt, ...)`` at :147 syncs once per outer loop),
    then each color class relabels sequentially, seeing labels already
    updated by earlier classes in the same super-round (cset[j] loop at
    :154-172). Classes are independent sets, so within-class updates are
    order-free and the result is deterministic given the seeds — which we
    pick as the k minimizers of (xxhash64(id, seed), id), the same
    reproducible choice fluid_community makes (the reference seeds with
    rand_r(time(NULL)); documented deviation). Stops when a super-round
    changes nothing or after ``max_rounds``.
    """
    from graphscope_spark.algorithms.coloring import color as _color

    e = g.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    if g.directed:
        e = e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    colors = _color(g).localCheckpoint(eager=True)
    classes = sorted(r[0] for r in colors.select("color").distinct().collect())
    # edges annotated with the TARGET's color, paid once
    ec = (
        e.join(colors.select(F.col("id").alias("dst"),
                             F.col("color").alias("tc")), "dst")
        .repartition(g.num_partitions, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ec.count()

    seeds = (
        g.vertices.select("id")
        .orderBy(F.xxhash64(F.col("id"), F.lit(seed)), F.col("id"))
        .limit(k)
        .select("id", (F.row_number().over(Window.orderBy("id")) - 1)
                .alias("lab"))
    )
    state = materialized_checkpoint(
        g.vertices.select("id")
        .join(seeds, "id", "left")
        .join(colors, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("lab"), F.lit(-1)).alias("lab"),
            F.coalesce(F.col("color"), F.lit(0)).alias("color"),
        )
    )
    for _ in range(max_rounds):
        # community sizes: one snapshot per SUPER-round (fluid-by-color.h
        # :147), shared by every class step inside it
        cnt = (
            state.filter(F.col("lab") >= 0)
            .groupBy("lab")
            .agg(F.count(F.lit(1)).alias("_n"))
            .localCheckpoint(eager=True)
        )
        changed_any = 0
        for c in classes:
            labeled = (
                state.filter(F.col("lab") >= 0)
                .select("id", "lab")
                .join(cnt, "lab")
                .select("id", "lab", (F.lit(1.0) / F.col("_n")).alias("w"))
            )
            members = state.filter(F.col("color") == c).select("id")
            nbr = (
                ec.filter(F.col("tc") == c)
                .join(labeled.withColumnRenamed("id", "src"), "src")
                .select(F.col("dst").alias("id"), "lab", "w")
            )
            self_part = labeled.join(members, "id", "left_semi")
            scores = (
                self_part.select("id", "lab", "w").union(nbr)
                .groupBy("id", "lab")
                .agg(F.sum("w").alias("d"))
            )
            best = (
                scores.groupBy("id")
                .agg(F.max(F.struct(F.col("d"),
                                    (-F.col("lab")).alias("_nl"))).alias("_b"))
                .select("id", F.col("_b.d").alias("bd"),
                        (-F.col("_b._nl")).cast("int").alias("bl"))
            )
            cur = scores.select(
                F.col("id").alias("id"), F.col("lab").alias("lab"),
                F.col("d").alias("cd"),
            )
            new_ck = materialized_checkpoint(
                state.join(best.join(members, "id", "left_semi"), "id", "left")
                .join(cur, ["id", "lab"], "left")
                .select(
                    "id",
                    F.when(
                        F.col("bd").isNotNull()
                        & (
                            (F.col("lab") < 0)
                            | (F.col("bd") > F.coalesce(F.col("cd"),
                                                        F.lit(0.0))
                               + F.lit(_EPS))
                        ),
                        F.col("bl"),
                    ).otherwise(F.col("lab")).alias("lab"),
                    "color",
                    (
                        F.col("bd").isNotNull()
                        & (
                            (F.col("lab") < 0)
                            | (F.col("bd") > F.coalesce(F.col("cd"),
                                                        F.lit(0.0))
                               + F.lit(_EPS))
                        )
                        & (F.col("bl") != F.col("lab"))
                    ).alias("_chg"),
                )
            )
            changed_any += new_ck.filter("_chg").limit(1).count()
            state.unpersist()
            state = new_ck
        if changed_any == 0:
            break
    ec.unpersist()
    return state.select("id", "lab")
