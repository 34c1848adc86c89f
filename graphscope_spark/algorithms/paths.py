"""Multi-source shortest-path substrate + closeness / betweenness / APSP.

Reference semantics:
* closeness_centrality (apps/centrality/closeness/closeness_centrality.h:
  1-143): wf_improved — C(v) = ((r−1)/(n−1)) · ((r−1)/Σ_u d(u,v)) over the
  r vertices that reach v; per-source BFS/SSSP sweeps.
* all_pairs_shortest_path_length (apps/apsp/all_pairs_shortest_path_
  length.h:1-144): n × SSSP.
* betweenness_centrality (apps/centrality/betweenness/*.h, Brandes):
  forward BFS counting σ shortest paths per (source, vertex), then
  per-level backward dependency accumulation
  δ(v) = Σ_{w: v∈pred(w)} σ_v/σ_w · (1 + δ_w).

Spark re-expression — ONE batched loop for ALL sources (instead of the
reference's per-source sweep): state is keyed (src, id), a frontier round
expands every source's frontier in a single join+groupBy. Shuffle volume
is Σ_src |frontier_src| per round — the same total work as n sweeps but in
`diameter` Spark stages instead of n×diameter, which is the difference
between usable and not on a cluster (stage launch overhead amortizes over
sources). ``sources=None`` means exact (all vertices); a sampled subset
gives the standard Brandes/closeness source-sampling approximation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graphscope_spark.graph import Graph


def _edges_for(g: Graph, directed: bool | None = None) -> DataFrame:
    e = g.edges.select("src", "dst")
    if directed is False or (directed is None and not g.directed):
        # Symmetrize + dedup: undirected edge lists are conventionally
        # already stored in both directions (to_undirected / copurchase),
        # so a bare union would double every edge — harmless for min-dist
        # but it doubles sigma per hop (2^dist inflation of the Brandes
        # forward counts). distinct() is one extra shuffle, paid once per
        # call on a table that is then persisted for the whole BFS.
        e = e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    return e


def multi_source_bfs(
    g: Graph,
    sources: DataFrame | None = None,
    max_iter: int = 10_000,
    with_sigma: bool = False,
) -> DataFrame:
    """(src, id, dist[, sigma]) for every reached pair — levelized batched
    BFS from all ``sources`` at once (sources: df with column id; None =
    all vertices). ``with_sigma`` also counts shortest paths per pair
    (σ, the forward pass of Brandes)."""
    spark = g.spark
    edges = _edges_for(g).repartition(g.num_partitions, "src").persist()
    if sources is None:
        sources = g.vertices.select("id")
    cols = [F.col("id").alias("src"), F.col("id"), F.lit(0).alias("dist")]
    if with_sigma:
        cols.append(F.lit(1.0).alias("sigma"))
    f0 = sources.select(*cols).repartition(g.num_partitions, "id").persist()
    f0.count()
    # one cached df per BFS level; "settled" is their LAZY union — narrow
    # over cached parents, so the per-round anti-join reads cache without
    # ever copying the accumulated pair set (copying it every round is
    # quadratic in rounds). On deep-diameter graphs the union itself grows
    # to D scans per round (O(D²) over the run), so every FOLD_EVERY levels
    # the (src, id) pair set is folded into ONE checkpointed df — the
    # anti-join side then reads ≤ FOLD_EVERY+1 scans regardless of depth.
    FOLD_EVERY = 8
    frontiers: list[DataFrame] = [f0]
    frontier = f0
    settled_folds: list[DataFrame] = [f0.select("src", "id")]
    folds_made: list[DataFrame] = []  # checkpointed folds to release at end
    unfolded = 0

    def settled_view() -> DataFrame:
        out = settled_folds[0]
        for fdf in settled_folds[1:]:
            out = out.union(fdf)
        return out

    rnd = 0
    while True:
        rnd += 1
        if rnd > max_iter:
            break
        agg = [F.min(F.lit(rnd)).alias("dist")]
        if with_sigma:
            agg.append(F.sum("sigma").alias("sigma"))
        expanded = (
            frontier.withColumnRenamed("id", "u")
            .join(edges.withColumnRenamed("src", "u"), "u")
            .groupBy("src", F.col("dst").alias("id"))
            .agg(*agg)
        )
        # eager localCheckpoint EVERY round: truncates the new level's
        # logical plan to a flat RDD. With persist() alone each level's
        # plan embeds every earlier level's plan (the anti-join side), so
        # plan size grows exponentially with rounds and the driver dies
        # building plan strings long before any data is large.
        nxt = expanded.join(
            settled_view(), ["src", "id"], "left_anti"
        ).localCheckpoint(eager=True)
        if nxt.count() == 0:
            nxt.unpersist()
            break
        frontiers.append(nxt)
        frontier = nxt
        settled_folds.append(nxt.select("src", "id"))
        unfolded += 1
        if unfolded >= FOLD_EVERY:
            folded = settled_view().localCheckpoint(eager=True)
            for old in folds_made:
                old.unpersist()
            folds_made = [folded]
            settled_folds = [folded]
            unfolded = 0
    result = frontiers[0]
    for fdf in frontiers[1:]:
        result = result.union(fdf)
    # snapshot, then release every level cache — callers iterate over the
    # result many times (closeness agg, betweenness backward levels) and
    # the per-level caches would otherwise pile up across calls until the
    # driver JVM OOMs. Coalesce first: the union concatenates one partition
    # set per BFS level, and diameter × P near-empty tasks per downstream
    # stage is pure scheduler overhead.
    result = result.coalesce(g.num_partitions).localCheckpoint(eager=True)
    for fdf in frontiers:
        fdf.unpersist()
    for fdf in folds_made:
        fdf.unpersist()
    edges.unpersist()
    return result


def all_pairs_shortest_path_length(g: Graph, max_iter: int = 10_000) -> DataFrame:
    """(src, id, dist) — APSP lengths (reached pairs only), the
    all_pairs_shortest_path_length.h surface."""
    return multi_source_bfs(g, None, max_iter)


def closeness_centrality(
    g: Graph, sources: DataFrame | None = None, wf_improved: bool = True,
    weight_col: str | None = None,
) -> DataFrame:
    """(id, closeness) — closeness over incoming shortest paths from
    ``sources`` (exact when sources=None). wf_improved scales by the
    reached fraction (closeness_centrality.h / networkx).
    ``weight_col`` switches distances to weighted shortest paths
    (the Dijkstra branch, via the batched multi_source_weighted pass)."""
    n = g.num_vertices
    pairs = (multi_source_weighted(g, sources, weight_col)
             if weight_col else multi_source_bfs(g, sources))
    into = (
        pairs.filter(F.col("dist") > 0)
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("r"), F.sum("dist").alias("total"))
    )
    c = F.col("r") / F.col("total")
    if wf_improved:
        c = c * F.col("r") / F.lit(float(max(n - 1, 1)))
    return (
        g.vertices.select("id")
        .join(into, "id", "left")
        .select("id", F.coalesce(c, F.lit(0.0)).alias("closeness"))
    )


def harmonic_centrality(
    g: Graph, sources: DataFrame | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """(id, harmonic) — H(v) = Σ_s 1/d(s, v) over incoming shortest paths
    from ``sources`` (flash/centrality/harmonic.h:64-86 accumulates
    d.val += 1/i the round a source's BFS bit first reaches v; exact when
    sources=None, source-sampled otherwise — the reference samples 500
    random sources, harmonic.h:48,62-66). ``weight_col`` switches to
    weighted shortest-path distances."""
    pairs = (multi_source_weighted(g, sources, weight_col)
             if weight_col else multi_source_bfs(g, sources))
    into = (
        pairs.filter(F.col("dist") > 0)
        .groupBy("id")
        .agg(F.sum(F.lit(1.0) / F.col("dist")).alias("_h"))
    )
    return (
        g.vertices.select("id")
        .join(into, "id", "left")
        .select("id", F.coalesce(F.col("_h"), F.lit(0.0)).alias("harmonic"))
    )


def betweenness_centrality(
    g: Graph,
    sources: DataFrame | None = None,
    normalized: bool = True,
    max_iter: int = 10_000,
    endpoints: bool = False,
) -> DataFrame:
    """(id, betweenness) — Brandes: batched forward σ pass, then per-level
    backward dependency accumulation (betweenness/*.h). Exact with
    sources=None; source-sampled approximation otherwise (scaled by
    n/|sources|).

    ``endpoints=True`` is the betweenness_centrality_generic option
    (betweenness_centrality_generic.h:155,165,207,217): every settled pair
    (s, t) additionally credits both its endpoints — the accumulation adds
    +1 per reached pair to t (``... += delta[w] + ctx.endpoints``) and the
    per-source reached count to s; with normalization the denominator
    becomes n(n−1) (directed) / n(n−1)/2 (undirected), pairs now counting
    their endpoints."""
    spark = g.spark
    n = g.num_vertices
    edges = _edges_for(g).persist()
    fwd = multi_source_bfs(g, sources, max_iter, with_sigma=True).persist()
    n_sources = (
        fwd.filter(F.col("dist") == 0).select("src").distinct().count()
    )
    max_d = fwd.agg(F.max("dist")).first()[0] or 0

    # delta starts 0 for every settled pair
    delta = fwd.select("src", "id", "dist", "sigma", F.lit(0.0).alias("delta"))
    delta = delta.persist(StorageLevel.MEMORY_AND_DISK)
    for lev in range(int(max_d), 0, -1):
        w = delta.filter(F.col("dist") == lev).select(
            "src",
            F.col("id").alias("w"),
            F.col("sigma").alias("sigma_w"),
            F.col("delta").alias("delta_w"),
        )
        # contributions flow backward along edges v→w where dist_v = lev-1
        # (edge endpoints renamed v/w up front so the traversal source
        # column "src" never clashes with the edge's src)
        contrib = (
            w.join(
                edges.select(F.col("src").alias("v"), F.col("dst").alias("w")), "w"
            )
            .join(
                delta.filter(F.col("dist") == lev - 1)
                .select("src", F.col("id").alias("v"), F.col("sigma").alias("sigma_v")),
                ["src", "v"],
            )
            .groupBy("src", F.col("v").alias("id"))
            .agg(
                F.sum(
                    F.col("sigma_v") / F.col("sigma_w") * (1.0 + F.col("delta_w"))
                ).alias("dd")
            )
        )
        new_delta = (
            delta.join(contrib, ["src", "id"], "left")
            .select(
                "src", "id", "dist", "sigma",
                (F.col("delta") + F.coalesce(F.col("dd"), F.lit(0.0))).alias("delta"),
            )
            # eager every level: the backward update references delta three
            # times, so plans nest exponentially without truncation
            .localCheckpoint(eager=True)
        )
        delta.unpersist()
        delta = new_delta

    ep = F.lit(1.0) if endpoints else F.lit(0.0)
    bc = (
        delta.filter(F.col("dist") > 0)
        .groupBy("id")
        .agg(F.sum(F.col("delta") + ep).alias("b"))
    )
    if endpoints:
        # each source additionally scores its own reached-pair count
        src_side = (
            delta.filter(F.col("dist") > 0)
            .groupBy(F.col("src").alias("id"))
            .agg(F.count(F.lit(1)).cast("double").alias("b"))
        )
        bc = bc.unionByName(src_side).groupBy("id").agg(
            F.sum("b").alias("b")
        )
    scale = 1.0
    if n_sources and n_sources < n:
        scale *= n / float(n_sources)  # source-sampling extrapolation
    if not g.directed:
        scale *= 0.5  # each undirected pair counted from both endpoints
    if normalized:
        if endpoints:
            denom = n * (n - 1) if g.directed else n * (n - 1) / 2.0
        else:
            denom = (n - 1) * (n - 2) if g.directed \
                else (n - 1) * (n - 2) / 2.0
        scale /= denom if denom else 1.0
    out = (
        g.vertices.select("id")
        .join(bc, "id", "left")
        .select("id", (F.coalesce(F.col("b"), F.lit(0.0)) * F.lit(scale)).alias("betweenness"))
        .localCheckpoint(eager=True)  # snapshot so the caches below can go
    )
    delta.unpersist()
    edges.unpersist()
    fwd.unpersist()
    return out


def random_multi_bfs(g: Graph, k: int = 8, seed: int = 42) -> DataFrame:
    """(src, id, dist) — batched BFS from ``k`` pseudo-random sources
    (random-multi-bfs.h: k rand sources, per-vertex distance vector; the
    triple table here is the unpivoted form of that vector).

    Source pick is deterministic: the k vertices minimizing
    (hash64(seed|id), id) — a distributed TopK (TakeOrderedAndProject),
    not a global sort — so runs are reproducible and the DuckDB twin
    (tpch_graphs.random_multi_bfs_sql) ranks by the identical expression.
    The BFS itself is one frontier-proportional batch over all k sources
    (multi_source_bfs), exactly the reference's bitmask-parallel sweep.
    """
    from graphscope_spark.functions.hashing import hash64
    key = hash64(F.concat(F.lit(f"{seed}|"), F.col("id").cast("string")))
    sources = (
        g.vertices.select("id", key.alias("_h"))
        .orderBy("_h", "id")
        .limit(k)
        .select("id")
    )
    return multi_source_bfs(g, sources=sources)


def _wedges_for(g: Graph, weight_col: str) -> DataFrame:
    e = g.edges.select(
        "src", "dst", F.col(weight_col).cast("double").alias("w")
    ).filter(F.col("src") != F.col("dst"))
    if not g.directed:
        e = e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"),
                     "w")
        ).distinct()
    # parallel edges: keep the lightest (deterministic; also makes the
    # shortest-path DAG well-defined per (src, dst) pair)
    return e.groupBy("src", "dst").agg(F.min("w").alias("w"))


def multi_source_weighted(
    g: Graph,
    sources: DataFrame | None,
    weight_col: str,
    max_iter: int = 10_000,
) -> DataFrame:
    """(src, id, dist) — weighted shortest distances from every source at
    once: the batched Bellman-Ford twin of :func:`multi_source_bfs`
    (the reference's per-source Dijkstra sweep,
    betweenness_centrality_generic.h:72, batched the way every other
    multi-source pass here is). Frontier = pairs improved last round, so
    per-round shuffle is Σ_src |improved_src| — message volume tracks
    convergence, not the pair-set size."""
    from graphscope_spark.graph import materialized_checkpoint

    edges = _wedges_for(g, weight_col) \
        .repartition(g.num_partitions, "src").persist()
    edges.count()
    if sources is None:
        sources = g.vertices.select("id")
    state = materialized_checkpoint(
        sources.select(
            F.col("id").alias("src"), F.col("id"),
            F.lit(0.0).alias("dist"), F.lit(True).alias("changed"),
        )
    )
    for _ in range(max_iter):
        front = state.filter("changed").select(
            "src", F.col("id").alias("u"), "dist"
        )
        cand = (
            front.join(edges.withColumnRenamed("src", "u"), "u")
            .groupBy("src", F.col("dst").alias("id"))
            .agg(F.min(F.col("dist") + F.col("w")).alias("nd"))
        )
        new = materialized_checkpoint(
            state.select("src", "id", "dist")
            .join(cand, ["src", "id"], "full")
            .select(
                "src", "id",
                F.least(
                    F.coalesce(F.col("dist"), F.col("nd")),
                    F.coalesce(F.col("nd"), F.col("dist")),
                ).alias("dist"),
                (
                    F.col("dist").isNull()
                    | (F.coalesce(F.col("nd"), F.col("dist"))
                       < F.col("dist"))
                ).alias("changed"),
            )
        )
        active = new.filter("changed").limit(1).count()
        state.unpersist()
        state = new
        if active == 0:
            break
    edges.unpersist()
    return state.select("src", "id", "dist")


def betweenness_centrality_weighted(
    g: Graph,
    sources: DataFrame | None = None,
    weight_col: str = "w",
    normalized: bool = True,
    endpoints: bool = False,
    max_iter: int = 10_000,
) -> DataFrame:
    """(id, betweenness) — Brandes over WEIGHTED shortest paths: the
    Dijkstra branch of betweenness_centrality_generic.h:69-77. σ counting
    and δ accumulation run over the weighted shortest-path DAG
    (pred(v, w) ⟺ dist(w) = dist(v) + w(v, w)), processed in DAG-hop-level
    order (lev(v) = max #edges on a shortest path to v) — levels replace
    the BFS distance levels of the unweighted pass, since weighted
    distances are not level-indexable. Path-sum equality is exact when
    weights are exactly representable (integers in doubles — the gate's
    weights); arbitrary floats can split σ across ulp-distinct sums, the
    same caveat the reference's double-keyed Dijkstra carries.

    The three fixpoint loops (distance relax, level max, σ/δ by level)
    are each frontier/level-proportional; the DAG is materialized once
    and reused by all three.
    """
    from graphscope_spark.graph import materialized_checkpoint

    n = g.num_vertices
    dist = multi_source_weighted(g, sources, weight_col, max_iter) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    n_sources = dist.filter(F.col("dist") == 0).count()
    wedges = _wedges_for(g, weight_col)
    # the shortest-path DAG per source: v→w iff dist(w) = dist(v) + w(v,w)
    dag = (
        dist.select("src", F.col("id").alias("v"), F.col("dist").alias("dv"))
        .join(wedges.withColumnRenamed("src", "v")
              .withColumnRenamed("dst", "wv"), "v")
        .join(
            dist.select("src", F.col("id").alias("wv"),
                        F.col("dist").alias("dw")),
            ["src", "wv"],
        )
        .filter(F.col("dw") == F.col("dv") + F.col("w"))
        .select("src", "v", F.col("wv").alias("t"))
        .repartition(g.num_partitions, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dag.count()

    # DAG-hop levels: lev = max over preds + 1, frontier-propagated
    lev = materialized_checkpoint(
        dist.filter(F.col("dist") == 0)
        .select("src", "id", F.lit(0).alias("lev"),
                F.lit(True).alias("changed"))
    )
    for _ in range(max_iter):
        front = lev.filter("changed").select(
            "src", F.col("id").alias("v"), "lev"
        )
        cand = (
            front.join(dag, ["src", "v"])
            .groupBy("src", F.col("t").alias("id"))
            .agg((F.max("lev") + 1).alias("nl"))
        )
        new = materialized_checkpoint(
            lev.select("src", "id", "lev")
            .join(cand, ["src", "id"], "full")
            .select(
                "src", "id",
                F.greatest(
                    F.coalesce(F.col("lev"), F.col("nl")),
                    F.coalesce(F.col("nl"), F.col("lev")),
                ).alias("lev"),
                (
                    F.col("lev").isNull()
                    | (F.coalesce(F.col("nl"), F.col("lev"))
                       > F.col("lev"))
                ).alias("changed"),
            )
        )
        active = new.filter("changed").limit(1).count()
        lev.unpersist()
        lev = new
        if active == 0:
            break
    lev = lev.select("src", "id", "lev")
    max_lev = lev.agg(F.max("lev")).first()[0] or 0

    # forward σ in level order: all DAG preds of a level-L vertex sit at
    # lower levels, so their σ is final when L is processed
    sigma = materialized_checkpoint(
        lev.filter(F.col("lev") == 0)
        .select("src", "id", F.lit(1.0).alias("sigma"))
    )
    for L in range(1, int(max_lev) + 1):
        at = lev.filter(F.col("lev") == L).select("src", "id")
        add = (
            sigma.select("src", F.col("id").alias("v"), "sigma")
            .join(dag, ["src", "v"])
            .groupBy("src", F.col("t").alias("id"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(at, ["src", "id"], "left_semi")
        )
        nxt = materialized_checkpoint(sigma.unionByName(add))
        sigma.unpersist()
        sigma = nxt

    # backward δ in descending level order: a vertex's successors all sit
    # at higher levels, so its δ is final when its level is reached
    state = materialized_checkpoint(
        sigma.join(lev, ["src", "id"])
        .select("src", "id", "sigma", "lev", F.lit(0.0).alias("delta"))
    )
    for L in range(int(max_lev), 0, -1):
        wside = state.filter(F.col("lev") == L).select(
            "src", F.col("id").alias("t"),
            F.col("sigma").alias("sigma_w"), F.col("delta").alias("delta_w"),
        )
        contrib = (
            wside.join(dag, ["src", "t"])
            .groupBy("src", F.col("v").alias("id"))
            .agg(F.sum((1.0 + F.col("delta_w")) / F.col("sigma_w"))
                 .alias("part"))
        )
        new = materialized_checkpoint(
            state.join(contrib, ["src", "id"], "left")
            .select(
                "src", "id", "sigma", "lev",
                (F.col("delta")
                 + F.col("sigma") * F.coalesce(F.col("part"), F.lit(0.0)))
                .alias("delta"),
            )
        )
        state.unpersist()
        state = new

    ep = F.lit(1.0) if endpoints else F.lit(0.0)
    bc = (
        state.filter(F.col("lev") > 0)
        .groupBy("id")
        .agg(F.sum(F.col("delta") + ep).alias("b"))
    )
    if endpoints:
        src_side = (
            state.filter(F.col("lev") > 0)
            .groupBy(F.col("src").alias("id"))
            .agg(F.count(F.lit(1)).cast("double").alias("b"))
        )
        bc = bc.unionByName(src_side).groupBy("id").agg(F.sum("b").alias("b"))
    scale = 1.0
    if n_sources and n_sources < n:
        scale *= n / float(n_sources)
    if not g.directed:
        scale *= 0.5
    if normalized:
        if endpoints:
            denom = n * (n - 1) if g.directed else n * (n - 1) / 2.0
        else:
            denom = (n - 1) * (n - 2) if g.directed \
                else (n - 1) * (n - 2) / 2.0
        scale /= denom if denom else 1.0
    out = (
        g.vertices.select("id")
        .join(bc, "id", "left")
        .select("id", (F.coalesce(F.col("b"), F.lit(0.0)) * F.lit(scale))
                .alias("betweenness"))
        .localCheckpoint(eager=True)
    )
    for df in (dist, dag, state, sigma, lev):
        try:
            df.unpersist()
        except Exception:
            pass
    return out


def all_pairs_weighted_shortest_path_length(
    g: Graph, weight_col: str, max_iter: int = 10_000
) -> DataFrame:
    """(src, id, dist) — weighted APSP lengths for reached pairs: the
    weighted twin of all_pairs_shortest_path_length (the reference's
    apsp app runs per-source Dijkstra when the projected graph carries an
    edge property; here one batched multi-source relaxation)."""
    return multi_source_weighted(g, None, weight_col, max_iter)
