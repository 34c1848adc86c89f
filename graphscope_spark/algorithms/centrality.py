"""Centralities: degree, eigenvector, Katz, HITS.

Reference semantics:
* degree_centrality (apps/centrality/degree/degree_centrality.h:1-78):
  deg / (n-1), variants in/out/both.
* eigenvector_centrality (apps/centrality/eigenvector/
  eigenvector_centrality.h:1-185): power iteration x' = A^T x (gather over
  in-edges), L2-normalized each round; stop when Σ|x'-x| < n·tol or
  max_round.
* katz_centrality (apps/centrality/katz/katz_centrality.h:1-186):
  x' = α·(Σ_in x) + β each round, then L2-normalize; stop on Σ|x'-x| < n·tol.
* hits (apps/hits/hits.h:1-205): auth' = Σ_in hub, hub' = Σ_out auth',
  each sum-normalized per round (networkx semantics); stop on L1 < tol.

All share the one-shuffle-per-round join/groupBy dataflow; normalization is
a scalar agg broadcast back into the next round's expression (the
grape::Communicator Sum/Max allreduce analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import Graph
from graphscope_spark.pregel import SuperstepRunner, SuperstepResult


def degree_centrality(g: Graph, kind: str = "both") -> DataFrame:
    """(id, dc) — degree / (n-1). kind ∈ {in, out, both};  'both' counts
    in+out (the reference's default for directed; equals degree for
    undirected symmetrized graphs)."""
    n = g.num_vertices
    deg = g.degrees
    expr = {
        "in": F.col("in_deg"),
        "out": F.col("out_deg"),
        "both": F.col("in_deg") + F.col("out_deg"),
    }[kind]
    denom = float(max(n - 1, 1))
    return deg.select("id", (expr / F.lit(denom)).alias("dc"))


def _power_iteration(
    g: Graph,
    update,  # (gathered_col) -> new value Column, given scalar aggs dict
    init_val: float,
    max_iter: int,
    tol: float | None,
    name: str,
    normalize: str = "l2",
) -> SuperstepResult:
    """Shared power-iteration loop: gather over in-edges, per-round
    normalization, L1 convergence vote."""
    spark = g.spark
    n = g.num_vertices
    edges = g.out_edges.select("src", "dst")
    init = g.vertices.select("id", F.lit(init_val).alias("x"))

    def step(state: DataFrame, rnd: int) -> DataFrame:
        msgs = (
            edges.join(state.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("x").alias("gathered"))
        )
        raw = (
            state.select("id")
            .join(msgs, "id", "left")
            .select("id", update(F.coalesce(F.col("gathered"), F.lit(0.0))).alias("x"))
        )
        # normalization scalar as a broadcast one-row cross join, NOT a
        # driver .first(): fixed-round runs then have no per-round action,
        # so truncate_every supersteps fuse into one Spark job (same
        # driver-critical-path argument as pagerank's dangling mass).
        if normalize == "l2":
            nrm = raw.agg(
                F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("_nrm")
            )
            raw = raw.crossJoin(F.broadcast(nrm)).select(
                "id",
                (F.col("x") / F.when(
                    F.col("_nrm").isNull() | (F.col("_nrm") == 0), F.lit(1.0)
                ).otherwise(F.col("_nrm"))).alias("x"),
            )
        elif normalize == "sum":
            nrm = raw.agg(F.sum(F.abs(F.col("x"))).alias("_nrm"))
            raw = raw.crossJoin(F.broadcast(nrm)).select(
                "id",
                (F.col("x") / F.when(
                    F.col("_nrm").isNull() | (F.col("_nrm") == 0), F.lit(1.0)
                ).otherwise(F.col("_nrm"))).alias("x"),
            )
        # normalize == "none": keep the raw recurrence (Katz)
        return raw.repartition(g.num_partitions, "id")

    metrics_fn = None
    should_stop = None
    if tol is not None:
        def metrics_fn(prev, new, rnd):
            d = (
                new.withColumnRenamed("x", "xn")
                .join(prev.withColumnRenamed("x", "xo"), "id")
                .agg(F.sum(F.abs(F.col("xn") - F.col("xo"))))
                .first()[0]
            )
            return {"l1_delta": float(d)}

        def should_stop(m):
            return m["l1_delta"] < tol * n

    runner = SuperstepRunner(spark, name=name)
    return runner.run(init, step, max_iter, metrics_fn=metrics_fn,
                      should_stop=should_stop)


def eigenvector_centrality(
    g: Graph, max_iter: int = 100, tol: float | None = 1e-6
) -> SuperstepResult:
    """state (id, x): principal eigenvector of A^T, L2-normalized
    (eigenvector_centrality.h power iteration)."""
    return _power_iteration(
        g, update=lambda gathered: gathered, init_val=1.0 / max(g.num_vertices, 1),
        max_iter=max_iter, tol=tol, name="eigenvector", normalize="l2",
    )


def katz_centrality(
    g: Graph, alpha: float = 0.1, beta: float = 1.0,
    max_iter: int = 100, tol: float | None = 1e-6,
) -> SuperstepResult:
    """state (id, x): the Katz recurrence x' = α·Σ_in x + β iterated
    UN-normalized (normalizing mid-iteration would change the fixed point —
    x* = β(I − αAᵀ)⁻¹·1), then L2-normalized once at the end
    (katz_centrality.h:1-186 / networkx convention). Requires α < 1/λ_max
    for convergence."""
    res = _power_iteration(
        g,
        update=lambda gathered: F.lit(alpha) * gathered + F.lit(beta),
        init_val=0.0, max_iter=max_iter, tol=tol, name="katz", normalize="none",
    )
    norm = res.state.agg(F.sqrt(F.sum(F.col("x") * F.col("x")))).first()[0] or 1.0
    res.state = res.state.select("id", (F.col("x") / F.lit(norm)).alias("x"))
    return res


def hits(
    g: Graph, max_iter: int = 100, tol: float | None = 1e-8
) -> SuperstepResult:
    """state (id, hub, auth), both sum-normalized per round (apps/hits/
    hits.h:1-205, networkx convention). Two shuffles per round — one per
    direction — matching the reference's alternating gather phases."""
    spark = g.spark
    n = g.num_vertices
    edges = g.out_edges.select("src", "dst")
    init = g.vertices.select(
        "id", F.lit(1.0 / max(n, 1)).alias("hub"), F.lit(1.0 / max(n, 1)).alias("auth")
    )

    def step(state: DataFrame, rnd: int) -> DataFrame:
        # auth(v) = Σ_{u→v} hub(u)
        auth_raw = (
            edges.join(state.select(F.col("id").alias("src"), "hub"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("hub").alias("a"))
        )
        auth = state.select("id").join(auth_raw, "id", "left").select(
            "id", F.coalesce(F.col("a"), F.lit(0.0)).alias("a")
        )
        # HITS keeps DRIVER-side normalization scalars (unlike pagerank /
        # _power_iteration, which fold the scalar in as a broadcast cross
        # join): the hits round references its state twice per half-step,
        # and a cross join doubles the subtree again — ~14 copies of the
        # state subtree per round, 14^4 ≈ 38k copies at the checkpoint
        # cadence, which OOMs the driver just BUILDING THE PLAN STRING.
        # Two O(1) collects per round is the cheaper side of that trade,
        # and the L1 convergence metric forces per-round actions anyway.
        # (No persist() here: per-round cache entries pile up in the
        # CacheManager — every lookup then plan-compares against all of
        # them, degrading quadratically over rounds.)
        s_a = auth.agg(F.sum("a")).first()[0] or 1.0
        auth = auth.select("id", (F.col("a") / F.lit(float(s_a))).alias("auth"))
        # hub(u) = Σ_{u→v} auth(v)
        hub_raw = (
            edges.join(auth.select(F.col("id").alias("dst"), "auth"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("auth").alias("h"))
        )
        hub = state.select("id").join(hub_raw, "id", "left").select(
            "id", F.coalesce(F.col("h"), F.lit(0.0)).alias("h")
        )
        s_h = hub.agg(F.sum("h")).first()[0] or 1.0
        hub = hub.select("id", (F.col("h") / F.lit(float(s_h))).alias("hub"))
        return (
            hub.join(auth, "id")
            .select("id", "hub", "auth")
            .repartition(g.num_partitions, "id")
        )

    metrics_fn = None
    should_stop = None
    if tol is not None:
        def metrics_fn(prev, new, rnd):
            d = (
                new.select("id", F.col("hub").alias("hn"))
                .join(prev.select("id", F.col("hub").alias("ho")), "id")
                .agg(F.sum(F.abs(F.col("hn") - F.col("ho"))))
                .first()[0]
            )
            return {"l1_delta": float(d)}

        def should_stop(m):
            return m["l1_delta"] < tol

    runner = SuperstepRunner(spark, name="hits")
    return runner.run(init, step, max_iter, metrics_fn=metrics_fn,
                      should_stop=should_stop)


def strength_centrality(
    g: Graph, weight_col: str, mode: str = "both"
) -> DataFrame:
    """(id, strength) — weighted degree (vertex strength): the sum of
    incident edge weights, the weighted-graph analog of
    degree_centrality (mode: out/in/both over the directed edge table).
    One groupBy with map-side combine; weights quantized to integer
    micro-units before the sum so the result is partition-order exact
    (the lm_score discipline) and the DuckDB twin hash-matches."""
    e = g.edges.select(
        "src", "dst",
        F.round(F.col(weight_col) * 1_000_000.0, 0)
        .cast("long")
        .alias("w_u"),
    )
    parts = []
    if mode in ("out", "both"):
        parts.append(e.select(F.col("src").alias("id"), "w_u"))
    if mode in ("in", "both"):
        parts.append(e.select(F.col("dst").alias("id"), "w_u"))
    if not parts:
        raise ValueError("mode must be out, in, or both")
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy("id").agg(
        F.round(
            F.sum("w_u").cast("double") / 1_000_000.0, 6
        ).alias("strength")
    )
