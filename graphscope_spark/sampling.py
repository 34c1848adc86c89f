"""GNN training-data sampling — the learning-engine (GLE) analog.

The reference ships a third engine next to GAE/GIE: GLE
(`learning_engine/graph-learn`, vendored client surface
`python/graphscope/learning/graph.py:218-267` — the ``V()``/``E()``
traversal sources that feed GraphLearn's samplers). The submodule itself is
not vendored (SURVEY.md §0), so the semantics here follow the public
GraphLearn sampler taxonomy — k-hop neighbor sampling with per-hop fanouts,
random walks, negative (non-edge) sampling — re-expressed as Spark
DataFrame plans.

Design decisions for 100 TB:

* **Deterministic hash-driven choice, not RNG.** Every "random" pick is a
  function of (seed, position, vertex) through the portable 60-bit md5 hash
  (functions/hashing.py). That makes samples reproducible across runs,
  resumable mid-pipeline, and — because DuckDB computes the identical
  md5 expression — value-hash checkable against a SQL oracle
  (tpch_graphs.sampling oracles). GraphLearn's own samplers accept a seed
  for the same reproducibility reason.
* **Frontier-proportional joins.** Each hop/step is ONE join of the current
  frontier against the cached, src-partitioned edge table — the same
  superstep shape as the Pregel loop (pregel.py), so shuffle volume is
  O(frontier · fanout), never O(V).
* **Per-vertex windows only.** Ranking neighbors uses
  ``Window.partitionBy(src)`` — partitions align with the out-CSR cache, no
  global sort anywhere. Hub vertices make wide windows; the rank is
  computed on (hash, dst) so the window is a streaming top-k after an
  intra-partition sort, and AQE skew-split applies to the preceding join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphscope_spark.functions.hashing import hash64
from graphscope_spark.graph import Graph

__all__ = [
    "sample_neighbors",
    "sample_neighbors_weighted",
    "random_walks",
    "negative_sample",
    "node2vec_walks",
    "ego_network",
]


def _pick_hash(seed: int, *parts) -> "F.Column":
    """Portable deterministic 60-bit hash of '<seed>|p1|p2|…' (md5-based,
    identical expression available in DuckDB — hashing.hash64_sql)."""
    cols = [F.lit(str(seed))]
    for p in parts:
        cols.append(F.lit("|"))
        cols.append(p.cast("string") if hasattr(p, "cast") else F.lit(str(p)))
    return hash64(F.concat(*cols))


def sample_neighbors(
    g: Graph,
    seeds: DataFrame,
    fanouts: list[int],
    seed: int = 42,
) -> DataFrame:
    """K-hop neighborhood sampling with per-hop fanouts (GraphLearn's
    ``g.V(...).outV(k1).outV(k2)`` / NeighborSampler; vendored surface
    python/graphscope/learning/graph.py:218).

    ``seeds`` is a DataFrame with an ``id`` column (the batch of root
    vertices). Returns the sampled block table
    ``(root, hop, src, dst)`` — hop h rows are the edges sampled while
    expanding hop h (1-based), exactly the block format a GNN data loader
    consumes.

    Per-vertex determinism: the sample drawn AT a vertex depends only on
    (seed, hop, src) — two roots whose frontiers meet at the same vertex
    see the same sampled neighbors, which is what makes the result a
    well-defined block table (and keeps the rank window partitioned by
    ``src`` alone, aligned with the out-CSR cache).
    """
    frontier = seeds.select(F.col("id").alias("root"), F.col("id"))
    out: DataFrame | None = None
    for hop, k in enumerate(fanouts, start=1):
        # the per-vertex sample is computed on DISTINCT (src, dst) — never
        # on (root, src, dst) rows, where a vertex reached by many roots
        # would see its neighbor list duplicated and the rank window would
        # split the fanout across roots
        nbrs = (
            frontier.select("id").distinct()
            .join(g.out_edges.select("src", "dst"),
                  F.col("id") == F.col("src"))
            .select("src", "dst")
            .distinct()
        )
        rk = F.row_number().over(
            Window.partitionBy("src").orderBy(
                _pick_hash(seed, F.lit(hop), F.col("src"), F.col("dst")),
                "dst",
            )
        )
        picked_sd = nbrs.withColumn("_rk", rk).filter(F.col("_rk") <= k)
        picked = frontier.join(
            picked_sd, frontier["id"] == picked_sd["src"]
        ).select("root", F.lit(hop).alias("hop"), "src", "dst").distinct()
        out = picked if out is None else out.unionByName(picked)
        frontier = picked.select("root", F.col("dst").alias("id")).distinct()
    return out


def sample_neighbors_weighted(
    edges: DataFrame,
    seeds: DataFrame,
    fanouts: list[int],
    seed: int = 42,
    weight_col: str = "weight",
) -> DataFrame:
    """K-hop neighbor sampling with probability ∝ edge weight — GraphLearn's
    ``edge_weight`` sampler strategy (the public sampler taxonomy next to
    the uniform NeighborSampler; vendored client surface
    python/graphscope/learning/graph.py:218).

    ``edges`` is a weighted edge table ``(src, dst, <weight_col>)`` with
    **integer** weights (a multigraph's edge multiplicities are the natural
    instance). Each hop draws ``fanout`` times WITH replacement per frontier
    vertex via exact integer inverse-CDF: draw j at vertex v picks the
    neighbor whose cumulative-weight interval contains
    ``hash(seed|hop|v|j) mod W(v)`` — integer arithmetic end to end, so a
    SQL oracle reproduces the pick bit-for-bit (no float keys to diverge
    between engines). Duplicated draws collapse in the returned block table
    ``(root, hop, src, dst)`` (same format as :func:`sample_neighbors`), so
    per-vertex distinct fanout is ≤ k, as with any with-replacement sampler.

    Scale shape: the cumulative adjacency is one per-src window (aligned
    with the out-CSR cache); each hop is one equi-join of the distinct
    frontier × k draws against it, filtered to the containing interval —
    shuffle ∝ frontier · deg, the same bound as node2vec's per-walk cumsum
    windows.
    """
    w_dst = Window.partitionBy("src").orderBy("dst")
    cum = (
        edges.groupBy("src", "dst")
        .agg(F.sum(weight_col).cast("long").alias("w"))
        .select(
            "src", "dst",
            (F.sum("w").over(w_dst) - F.col("w")).alias("lo"),
            F.sum("w").over(w_dst).alias("hi"),
            F.sum("w").over(Window.partitionBy("src")).alias("tot"),
        )
        .persist()
    )
    frontier = seeds.select(F.col("id").alias("root"), F.col("id"))
    out: DataFrame | None = None
    for hop, k in enumerate(fanouts, start=1):
        draws = (
            frontier.select("id").distinct()
            .select(F.col("id").alias("src"),
                    F.explode(F.sequence(F.lit(1), F.lit(k))).alias("j"))
        )
        r = F.pmod(
            _pick_hash(seed, F.lit(hop), F.col("src"), F.col("j")),
            F.col("tot"),
        )
        picked_sd = (
            draws.join(cum, "src")
            .filter((r >= F.col("lo")) & (r < F.col("hi")))
            .select("src", "dst")
            .distinct()
        )
        picked = frontier.join(
            picked_sd, frontier["id"] == picked_sd["src"]
        ).select("root", F.lit(hop).alias("hop"), "src", "dst").distinct()
        out = picked if out is None else out.unionByName(picked)
        frontier = picked.select("root", F.col("dst").alias("id")).distinct()
    return out


def _indexed_out_edges(g: Graph) -> DataFrame:
    """(src, dst, idx, deg): each vertex's out-neighbors numbered 0..deg-1
    in dst order — the adjacency-array view every walk step indexes into.
    Window + count are both partitioned by src (aligned with the out-CSR
    cache): no global operation."""
    w = Window.partitionBy("src")
    return (
        g.out_edges.select("src", "dst")
        .distinct()
        .select(
            "src",
            "dst",
            (F.row_number().over(w.orderBy("dst")) - 1).alias("idx"),
            F.count(F.lit(1)).over(w).alias("deg"),
        )
    )


def random_walks(
    g: Graph,
    walk_length: int,
    seed: int = 42,
    starts: DataFrame | None = None,
    walks_per_vertex: int = 1,
) -> DataFrame:
    """Uniform random walks (GraphLearn RandomWalk / DeepWalk input;
    meta-path sampling with a single hop relation).

    One walk per (start vertex × walks_per_vertex). Step t moves from the
    current vertex v to its neighbor number
    ``hash(seed, walk, t, v) mod outdeg(v)`` in dst-sorted adjacency order
    — a uniform pick that is a pure expression of position, so the whole
    walk set is reproducible and oracle-checkable. Walks stop early at
    sinks (no out-edges), matching GraphLearn's truncated-walk behavior.

    Returns ``(walk, step, v)`` with step 0 = the start vertex.
    """
    if starts is None:
        starts = g.vertices.select("id")
    adj = _indexed_out_edges(g)
    walks = starts.select(
        "id",
        F.explode(
            F.array(*[F.lit(i) for i in range(walks_per_vertex)])
        ).alias("_w"),
    ).select(
        (F.col("id") * walks_per_vertex + F.col("_w")).alias("walk"),
        F.col("id").alias("v"),
    )
    state = walks.select("walk", F.lit(0).alias("step"), "v")
    out = state
    for t in range(1, walk_length + 1):
        pick = F.pmod(
            _pick_hash(seed, F.col("walk"), F.lit(t), F.col("v")),
            F.col("deg"),
        )
        state = (
            state.join(adj, state["v"] == adj["src"])
            .filter(F.col("idx") == pick)
            .select("walk", F.lit(t).alias("step"), F.col("dst").alias("v"))
        )
        out = out.unionByName(state)
    return out


def node2vec_walks(
    g: Graph,
    walk_length: int,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 42,
    starts: DataFrame | None = None,
) -> DataFrame:
    """Second-order biased walks (node2vec, Grover & Leskovec KDD'16 —
    the bias GraphLearn's random-walk sampler exposes as p/q).

    Candidate weights from the previous vertex ``prev``:
    return to prev → 1/p; candidate adjacent to prev → 1; else → 1/q.
    The pick is the deterministic inverse-CDF draw: u = hash-fraction of
    the total weight, choose the first candidate whose cumulative weight
    exceeds u — cumulative sums are per-(walk, step) windows over the
    candidate's (dst) order, so the plan stays frontier-proportional with
    one extra semi-join per step (the prev-adjacency test).

    Returns ``(walk, step, v)``.
    """
    if starts is None:
        starts = g.vertices.select("id")
    adj = _indexed_out_edges(g)
    edge_set = g.out_edges.select(
        F.col("src").alias("_ps"), F.col("dst").alias("_pd")
    ).distinct()

    # step 1 is uniform (no prev yet)
    state = starts.select(
        F.col("id").alias("walk"),
        F.col("id").alias("v"),
        F.lit(None).cast("long").alias("prev"),
    )
    out = state.select("walk", F.lit(0).alias("step"), "v")
    for t in range(1, walk_length + 1):
        cand = (
            state.join(adj, state["v"] == adj["src"])
            .select("walk", "prev", "src", "dst")
        )
        if t == 1:
            weighted = cand.withColumn("w", F.lit(1.0))
        else:
            weighted = (
                cand.join(
                    edge_set,
                    (cand["prev"] == edge_set["_ps"])
                    & (cand["dst"] == edge_set["_pd"]),
                    "left",
                )
                .withColumn(
                    "w",
                    F.when(F.col("dst") == F.col("prev"), F.lit(1.0 / p))
                    .when(F.col("_ps").isNotNull(), F.lit(1.0))
                    .otherwise(F.lit(1.0 / q)),
                )
                .select("walk", "prev", "src", "dst", "w")
            )
        wspec = Window.partitionBy("walk").orderBy("dst")
        tot = Window.partitionBy("walk")
        scored = (
            weighted.withColumn("cum", F.sum("w").over(wspec))
            .withColumn("total", F.sum("w").over(tot))
            .withColumn(
                "u",
                (F.pmod(_pick_hash(seed, F.col("walk"), F.lit(t),
                                   F.col("src")), F.lit(1 << 20))
                 / F.lit(float(1 << 20))) * F.col("total"),
            )
        )
        nxt = (
            scored.filter(F.col("cum") > F.col("u"))
            .withColumn(
                "_rk",
                F.row_number().over(Window.partitionBy("walk").orderBy("dst")),
            )
            .filter(F.col("_rk") == 1)
        )
        state = nxt.select(
            "walk",
            F.col("dst").alias("v"),
            F.col("src").alias("prev"),
        )
        out = out.unionByName(
            state.select("walk", F.lit(t).alias("step"), "v")
        )
    return out


def negative_sample(
    g: Graph,
    tries: int = 5,
    seed: int = 42,
    sources: DataFrame | None = None,
) -> DataFrame:
    """Negative (non-edge) sampling for link-prediction training
    (GraphLearn NegativeSampler, strategy="random").

    For each source vertex and try ``t``, propose candidate id
    ``hash(seed, src, t) mod (max_id + 1)``, keep proposals that are real
    vertices and NOT existing out-neighbors of src (and not src itself).
    Deterministic and join-only: O(V · tries) proposals, one semi-join to
    validate the id, one anti-join against the (src-partitioned) edge
    cache. No global window, no collect — the id-space modulus comes from
    one scalar max() aggregate.

    Returns ``(src, neg)`` pairs (≤ ``tries`` per source — collisions with
    real edges are dropped, the standard rejection step).
    """
    if sources is None:
        sources = g.vertices.select("id")
    max_id = g.vertices.agg(F.max("id")).first()[0]
    cand = sources.select(
        F.col("id").alias("src"),
        F.explode(F.array(*[F.lit(t) for t in range(tries)])).alias("t"),
    ).select(
        "src",
        F.pmod(
            _pick_hash(seed, F.col("src"), F.col("t")), F.lit(max_id + 1)
        ).alias("neg"),
    ).filter(F.col("src") != F.col("neg")).distinct()
    real = cand.join(
        g.vertices.select(F.col("id").alias("neg")), "neg", "left_semi"
    )
    return real.join(
        g.out_edges.select("src", F.col("dst").alias("neg")).distinct(),
        ["src", "neg"],
        "left_anti",
    )


def ego_network(g: Graph, seeds: DataFrame, k: int = 2,
                id_col: str = "id") -> DataFrame:
    """(seed, src, dst) — the induced edge set of every seed's k-hop
    out-neighborhood: the GNN mini-batch SubGraph induction step
    (GraphLearn's full-neighbor sampler feeding an induced subgraph; the
    vendored traversal surface is python/graphscope/learning/graph.py:
    218-267). Reach sets are built with k frontier-proportional hops
    (each hop ONE join against the src-partitioned edge cache, expanding
    only the newly reached frontier), then the induced edges come from two
    semi-style joins keyed on (seed, endpoint) — work proportional to
    Σ_seed |ego(seed)|, never O(V·seeds)."""
    edges = g.out_edges.select("src", "dst")
    reach = seeds.select(
        F.col(id_col).alias("seed"), F.col(id_col).alias("v")
    ).distinct()
    frontier = reach
    for _ in range(k):
        nxt = (
            frontier.join(edges.withColumnRenamed("src", "v"), "v")
            .select("seed", F.col("dst").alias("v"))
            .distinct()
            .join(reach, ["seed", "v"], "left_anti")
        )
        reach = reach.unionByName(nxt)
        frontier = nxt
    return (
        edges.join(reach.withColumnRenamed("v", "src"), "src")
        .join(reach.withColumnRenamed("v", "dst"), ["seed", "dst"])
        .select("seed", "src", "dst")
    )
