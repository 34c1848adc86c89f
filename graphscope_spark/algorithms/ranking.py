"""Ranking variants beyond vanilla PageRank: PPR, ArticleRank, VoteRank.

Reference semantics:

* **Personalized PageRank** (apps/flash/ranking/ppr.h:41-71): damping 0.5,
  teleport mass goes ONLY to the source —
      r'(v) = 0.5·[v = source] + 0.5·Σ_{u ~ v} r(u)/deg(u)
  over the UNDIRECTED adjacency (EdgeMapDense over EU, ppr.h:62-63), deg =
  undirected degree; init r = [v = source]; exactly ``max_iters`` rounds.

* **ArticleRank** (apps/flash/ranking/articlerank.h:41-72): PageRank with
  the per-edge contribution divided by (outdeg(u) + avg_outdeg) —
      r'(v) = (1−d) + d·Σ_{u→v} r(u)/(outdeg(u) + avg)
  over DIRECTED out-edges (ED), init r = 0, exactly ``max_iters`` rounds
  (so round 1 yields the constant 1−d). No dangling redistribution and no
  1/N normalization — per the reference.

* **VoteRank** (apps/voterank/voterank.h:57-224, LDBC variant): weights
  start 1; each round every unranked vertex scores Σ_{u→v} weight(v) over
  out-edges; the single global max-score vertex is elected (rank = round,
  weight → 0), and each of its out-neighbors loses 1/avg_degree of weight
  (floored at 0, avg_degree = |E|/|V|, voterank.h:94-99). Stops after
  ``num_of_nodes`` rounds or when max score < 1e-8 (voterank.h:179-181).
  The reference tie-breaks equal scores by oid hash (voterank.h:136-146)
  — effectively arbitrary; we pin ties to the MINIMUM vertex id so results
  are reproducible.

Dataflow: ppr/articlerank are one message-exchange shuffle per round on the
superstep kernel (identical plan shape to pagerank.py — the scale story is
shared). voterank is inherently sequential in its election (one winner per
round); each round is one edge-shuffle aggregation plus an O(1) argmax
collect, with the winner's neighborhood update done as a broadcast-joined
column expression — the election loop is the algorithm, not a scale bug.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import Graph
from graphscope_spark.pregel import SuperstepRunner, SuperstepResult


def ppr(
    g: Graph,
    source: int,
    max_iter: int = 10,
    damping: float = 0.5,
) -> SuperstepResult:
    """Personalized PageRank from one source (ppr.h). State:
    ``(id, rank, deg)``; rank is the flash ``val`` after ``max_iter``
    rounds. ``damping=0.5`` is the reference's hard-coded split."""
    spark = g.spark
    # EU: undirected adjacency — symmetrize directed inputs once.
    e = g.edges.select("src", "dst")
    if g.directed:
        e = e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    edges = e.repartition(g.num_partitions, "src").persist()
    deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    init = (
        g.vertices.select("id")
        .join(deg, "id", "left")
        .select(
            "id",
            F.when(F.col("id") == source, F.lit(1.0)).otherwise(F.lit(0.0))
            .alias("rank"),
            F.coalesce(F.col("deg"), F.lit(0)).alias("deg"),
        )
    )

    def step(state: DataFrame, rnd: int) -> DataFrame:
        contribs = state.filter(F.col("deg") > 0).select(
            F.col("id").alias("src"),
            (F.lit(damping) * F.col("rank") / F.col("deg")).alias("contrib"),
        )
        msgs = (
            edges.join(contribs, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("contrib").alias("gathered"))
        )
        return (
            state.select("id", "deg")
            .join(msgs, "id", "left")
            .select(
                "id",
                (
                    F.coalesce(F.col("gathered"), F.lit(0.0))
                    + F.when(F.col("id") == source, F.lit(damping))
                    .otherwise(F.lit(0.0))
                ).alias("rank"),
                "deg",
            )
        )

    runner = SuperstepRunner(spark, name="ppr")
    res = runner.run(init, step, max_iter)
    edges.unpersist()
    return res


def articlerank(
    g: Graph,
    max_iter: int = 10,
    damping: float = 0.85,
) -> SuperstepResult:
    """ArticleRank (articlerank.h). State ``(id, rank, out_deg)``; rank is
    the flash ``val`` after ``max_iter`` rounds (init 0, so one round gives
    the constant 1−d everywhere)."""
    spark = g.spark
    n = g.num_vertices
    edges = g.out_edges.select("src", "dst")
    # avg out-degree — the GetSum allreduce of articlerank.h:54-57
    avg = g.num_edges / float(n) if n else 0.0
    init = (
        g.vertices.select("id")
        .join(g.degrees.select("id", "out_deg"), "id", "left")
        .select(
            "id",
            F.lit(0.0).alias("rank"),
            F.coalesce(F.col("out_deg"), F.lit(0)).alias("out_deg"),
        )
    )

    def step(state: DataFrame, rnd: int) -> DataFrame:
        contribs = state.select(
            F.col("id").alias("src"),
            (
                F.lit(damping) * F.col("rank")
                / (F.col("out_deg") + F.lit(avg))
            ).alias("contrib"),
        )
        msgs = (
            edges.join(contribs, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("contrib").alias("gathered"))
        )
        return (
            state.select("id", "out_deg")
            .join(msgs, "id", "left")
            .select(
                "id",
                (
                    F.coalesce(F.col("gathered"), F.lit(0.0))
                    + F.lit(1.0 - damping)
                ).alias("rank"),
                "out_deg",
            )
        )

    runner = SuperstepRunner(spark, name="articlerank")
    return runner.run(init, step, max_iter)


def voterank(g: Graph, num_of_nodes: int | None = None) -> DataFrame:
    """(id, rank) — rank r means elected in round r (1-based); 0 = never
    elected. ``num_of_nodes`` = how many influencers to elect (default:
    all vertices, the reference's default when the parameter is 0)."""
    n = g.num_vertices
    if num_of_nodes is None or num_of_nodes <= 0:
        num_of_nodes = n
    avg_degree = g.num_edges / float(n) if n else 1.0
    delta = 1.0 / avg_degree if avg_degree else 1.0
    edges = g.out_edges.select("src", "dst").persist()

    state = g.vertices.select(
        "id", F.lit(1.0).alias("weight"), F.lit(0).alias("rank")
    ).localCheckpoint(eager=True)

    for step_no in range(1, num_of_nodes + 1):
        scores = (
            edges.join(
                state.select(F.col("id").alias("dst"),
                             F.col("weight").alias("w_dst")), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("w_dst").alias("score"))
        )
        cand = (
            state.filter(F.col("rank") == 0)
            .join(scores, "id", "left")
            # round before the argmax: the reference treats scores within
            # EPS=1e-8 as tied (voterank.h:138); rounding pins the same
            # behavior independent of float summation order
            .select("id",
                    F.round(F.coalesce(F.col("score"), F.lit(0.0)), 8)
                    .alias("score"))
        )
        # global argmax with min-id tie-break — one tiny collect, the
        # AllReduce(compare) of voterank.h:171-178
        top = cand.agg(
            F.max(F.struct(F.col("score"), (-F.col("id")).alias("neg"),
                           F.col("id"))).alias("m")
        ).select(F.col("m.score"), F.col("m.id")).first()
        if top is None or top[0] is None or top[0] < 1e-8:
            break
        win_score, winner = float(top[0]), int(top[1])
        nbrs = edges.filter(F.col("src") == winner).select(
            F.col("dst").alias("id"), F.lit(True).alias("is_nbr")
        )
        state = (
            state.join(F.broadcast(nbrs), "id", "left")
            .select(
                "id",
                F.when(F.col("id") == winner, F.lit(0.0))
                .when(F.col("is_nbr"),
                      F.greatest(F.col("weight") - F.lit(delta), F.lit(0.0)))
                .otherwise(F.col("weight")).alias("weight"),
                F.when(F.col("id") == winner, F.lit(step_no))
                .otherwise(F.col("rank")).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    edges.unpersist()
    return state.select("id", "rank")


def ppr_batch(
    g: Graph,
    sources: list[int],
    max_iter: int = 10,
    damping: float = 0.5,
) -> DataFrame:
    """(seed, id, rank) — personalized PageRank from MANY seeds at once
    (the batched form GNN feature pipelines and node-similarity services
    run; same per-seed semantics as :func:`ppr` / ppr.h, same damping
    split). State is SPARSE: only (seed, vertex) pairs with nonzero rank
    exist — after r rounds that is the seeds' r-hop neighborhoods, so a
    batch of B seeds costs one message shuffle per round over
    Θ(Σ frontier_b) rows, NOT B full-graph sweeps. Rows never touched by
    a seed's walk are absent (rank 0 by definition).

    Scale shape per round: state ⋈ edges keyed by vertex (one exchange),
    map-side-combined (seed, dst) partial sums, union with the B teleport
    rows, one (seed, id) aggregate; state localCheckpoint'd (flat plans).

    Float determinism: rank is carried in INTEGER pico-units (1e-12) —
    the per-source push ``round(damping * rank_u / d)`` is one double op
    on exactly-representable integers (identical in any IEEE engine),
    and every SUM is over BIGINT, so the result is bit-identical at any
    partitioning (the same discipline as lm_score/strength; a raw double
    F.sum here was the repo's one partition-order-dependent exception).
    Output rank = round(rank_u / 1e12, 8); the DuckDB twin
    (tpch_graphs.ppr_batch_sql) unrolls the same integer recursion."""
    UNIT = 1_000_000_000_000  # pico-units: 10 rounds of /d stay exact to 8dp
    spark = g.spark
    e = g.edges.select("src", "dst")
    if g.directed:
        e = e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    edges = e.repartition(g.num_partitions, "src").persist()
    deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("double").alias("d")
    ).persist()
    teleport_u = int(round(damping * UNIT))
    teleport = spark.createDataFrame(
        [(int(s), int(s), teleport_u) for s in sources],
        "seed long, id long, v long",
    )
    state = spark.createDataFrame(
        [(int(s), int(s), UNIT) for s in sources],
        "seed long, id long, rank_u long",
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        msgs = (
            state.join(deg, "id")
            .select(
                "seed",
                F.col("id").alias("src"),
                F.round(
                    F.lit(damping) * F.col("rank_u") / F.col("d"), 0
                ).cast("long").alias("c"),
            )
            .join(edges, "src")
            .groupBy("seed", F.col("dst").alias("id"))
            .agg(F.sum("c").alias("v"))
        )
        state = (
            msgs.unionByName(teleport)
            .groupBy("seed", "id")
            .agg(F.sum("v").alias("rank_u"))
            .localCheckpoint(eager=True)
        )
    edges.unpersist()
    deg.unpersist()
    return state.select(
        "seed",
        "id",
        F.round(F.col("rank_u").cast("double") / F.lit(float(UNIT)), 8)
        .alias("rank"),
    )


def ppr_sweep(
    g: Graph,
    seed: int,
    max_iter: int = 10,
    damping: float = 0.5,
    max_prefix: int = 200,
) -> DataFrame:
    """(k, id, cut, vol, conductance) — the PPR sweep cut (local
    clustering, Andersen–Chung–Lang 2006): order vertices by
    degree-normalized PPR score from ``seed``, then for every prefix of
    that order report its conductance cut(S)/min(vol(S), vol(V)−vol(S)).
    The best prefix (argmin conductance) is the seed's local community;
    returning the whole sweep keeps the operator composable (and the
    verification total).

    Everything after the PPR vector is exact integer math: with
    both-direction edges, vol_k = Σ prefix out-degrees (cumsum), directed
    internal edges = edges whose BOTH endpoints rank ≤ k (cumsum over
    per-edge max rank), cut_k = vol_k − internal_k. Ordering ties break
    by (score desc, id) on the round-8 score — partition-independent.

    Scale shape: one PPR run (sparse), one rank window over its support
    (≤ support rows, not V), one edge join against the ranked support
    keyed by vertex, two cumulative windows over ≤ max_prefix rows."""
    from pyspark.sql import Window

    spark = g.spark
    p = ppr_batch(g, [seed], max_iter, damping).drop("seed")
    e = g.edges.select("src", "dst")
    if g.directed:
        e = e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    deg = e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("d")
    )
    m2 = e.count()  # directed edge count = vol(V)
    scored = p.join(deg, "id").select(
        "id", "d", (F.col("rank") / F.col("d")).alias("score")
    )
    w = Window.orderBy(F.col("score").desc(), "id")
    ranked = (
        scored.withColumn("k", F.row_number().over(w))
        .filter(F.col("k") <= max_prefix)
        .localCheckpoint(eager=True)
    )
    wk = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    vol = ranked.select("k", "id", F.sum("d").over(wk).alias("vol"))
    r_src = ranked.select(F.col("id").alias("src"), F.col("k").alias("ks"))
    r_dst = ranked.select(F.col("id").alias("dst"), F.col("k").alias("kd"))
    internal_by_m = (
        e.join(r_src, "src")
        .join(r_dst, "dst")
        .groupBy(F.greatest("ks", "kd").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wi = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    out = (
        vol.join(internal_by_m, "k", "left")
        .withColumn(
            "internal",
            F.sum(F.coalesce(F.col("n"), F.lit(0))).over(wi),
        )
        .select(
            "k",
            "id",
            (F.col("vol") - F.col("internal")).alias("cut"),
            "vol",
            F.round(
                (F.col("vol") - F.col("internal")).cast("double")
                / F.least(F.col("vol"), F.lit(m2) - F.col("vol")),
                6,
            ).alias("conductance"),
        )
        .filter(F.col("vol") < m2)  # full-graph prefix has no cut
    )
    return out
