"""FLASH connected-components strategy variants: block-centric, degree-keyed
push/auto, and dense pull.

The reference ships CC as a *family* of dataflow strategies over the same
fixed point (apps/flash/connectivity/): ``cc.h`` (min-label frontier push —
our :func:`graphscope_spark.flash.flash_cc` / wcc), ``cc-log.h``
(Shiloach–Vishkin — our ``cc_log``), and the three re-expressed here:

* ``cc-block.h:44-66`` — each worker runs a LOCAL union-find over its edge
  block sequentially, then blocks are reduced into one global forest
  (``FLASH_Block(Reduce(...))``). The Spark translation: a per-partition
  union-find via ``mapInPandas`` (genuinely imperative per-partition logic —
  the documented UDF exception), then a min-label fixpoint on the CONTRACTED
  (vertex → local-root) pair graph, whose size is ~V + block-boundary
  duplicates, not E. At 100 TB this is the strategy that wins on low-diameter
  graphs: the expensive global iteration runs on the contraction, and the
  full edge table is scanned exactly once, partition-locally, with no
  shuffle at all in phase 1.

* ``cc-opt.h:47-78`` / ``cc-pull.h:47-75`` — labels are
  ``cid = deg(v)·n + id`` so the highest-degree vertex wins its component;
  phase 0 BFS-stamps the (presumed giant) component of the global max label,
  phase 1 propagates max labels among the rest. ``cc-opt`` uses the
  auto-switching EdgeMap (push from the changed frontier), ``cc-pull`` the
  dense form (every undecided vertex re-gathers over all in-edges each
  round). Both converge to cid(v) = max_{u ∈ comp(v)} (deg(u)·n + u) —
  deterministic, hence value-hash-gated against a DuckDB closure oracle
  (tpch_graphs.cc_opt_sql).

``cc-push.h`` is the frontier-push form already embodied by wcc/flash_cc,
and ``cc-union.h`` the hook-based form embodied by cc_log; ``cc-2`` /
``scc-2`` / ``bcc-2`` / ``bridge-2`` / ``cut-point-2`` are tuning variants
with identical outputs (documented in STATUS.md).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import Graph, materialized_checkpoint


def _both_directions(g: Graph) -> DataFrame:
    e = g.out_edges.select("src", "dst")
    if g.directed:
        return e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    return e


def _local_union_find(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-partition union-find (cc-block.h:52-54's sequential
    ``union_f(f, id, nb_id)`` over the local fragment). Emits
    (id, root) with root = MIN member id of the local component, so the
    output is deterministic regardless of edge order within the block."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    rows_s: list = []
    rows_d: list = []
    for pdf in batches:
        rows_s.append(pdf["src"].to_numpy())
        rows_d.append(pdf["dst"].to_numpy())
    if not rows_s:
        return
    import numpy as np

    src = np.concatenate(rows_s)
    dst = np.concatenate(rows_d)
    for a, b in zip(src.tolist(), dst.tolist()):
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    ids = list(parent)
    roots = [find(x) for x in ids]
    min_of: dict = {}
    for x, r in zip(ids, roots):
        if r not in min_of or x < min_of[r]:
            min_of[r] = x
    yield pd.DataFrame(
        {"id": ids, "root": [min_of[r] for r in roots]}
    ).astype("int64")


def cc_block(g: Graph, max_iter: int = 64) -> DataFrame:
    """(id, comp) — block-centric CC (flash/connectivity/cc-block.h:44-66),
    comp = min reachable vertex id (same output as wcc/flash_cc/cc_log).

    Phase 1 (local): one shuffle-free, partition-local union-find pass over
    the half edge list (src < dst — the symmetric twin adds nothing to
    connectivity), emitting one (vertex, local-root) pair per block the
    vertex appears in. Phase 2 (reduce): the pair list IS a contraction of
    the input graph — every original edge's endpoints share a local root in
    some block — so min-label connected components of the pair graph equal
    those of the input. The global fixpoint therefore iterates over
    ~V + boundary rows instead of E, and uses the O(log n)-round
    Shiloach–Vishkin kernel since the contracted graph can be path-like.
    Isolated vertices keep comp = id.
    """
    from graphscope_spark.algorithms.wcc import cc_log

    half = _both_directions(g).filter(F.col("src") < F.col("dst"))
    pairs = (
        half.repartition(g.num_partitions, "src")
        .mapInPandas(_local_union_find, schema="id long, root long")
        .filter(F.col("id") != F.col("root"))
        .localCheckpoint(eager=True)
    )
    contracted = Graph(
        pairs.select("id", "root").toDF("src", "dst"),
        directed=True,  # cc_log symmetrizes directed inputs itself
        num_partitions=g.num_partitions,
        persist=False,
    )
    comp_map = cc_log(contracted, max_iter=max_iter)
    out = (
        g.vertices.select("id")
        .join(comp_map, "id", "left")
        .select("id", F.coalesce(F.col("comp"), F.col("id")).alias("comp"))
    )
    return out


def _degree_keyed_init(g: Graph) -> tuple[DataFrame, int]:
    """cid₀ = Deg(id)·n + id (cc-opt.h:48-50); Deg is the undirected degree
    of the symmetrized adjacency the EU edge set exposes."""
    n = g.num_vertices
    if g.directed:
        deg = (
            _both_directions(g)
            .groupBy(F.col("src").alias("id"))
            .agg(F.count(F.lit(1)).alias("_deg"))
        )
    else:
        deg = g.degrees.select("id", F.col("out_deg").alias("_deg"))
    init = (
        g.vertices.select("id")
        .join(deg, "id", "left")
        .select(
            "id",
            (F.coalesce(F.col("_deg"), F.lit(0)) * F.lit(n) + F.col("id"))
            .cast("long")
            .alias("cid"),
        )
    )
    return init, n


def _cc_degree_keyed(g: Graph, dense: bool, max_iter: int) -> DataFrame:
    both = _both_directions(g).repartition(g.num_partitions, "src").persist()
    init, _n = _degree_keyed_init(g)
    state = materialized_checkpoint(init)
    v_glb = state.agg(F.max("cid")).first()[0]
    if v_glb is None:
        both.unpersist()
        return state.select("id", "cid")
    # the BFS seed is the single vertex holding the global max label
    # (cc-opt.h:52-54's filter on cid == v_glb)
    state = materialized_checkpoint(
        state.withColumn("changed", F.col("cid") == v_glb)
    )

    # phase 0 (cc-opt.h:56-65): BFS from the global-max vertex, stamping
    # cid = v_glb — frontier-proportional push rounds; 'changed' marks the
    # newly stamped frontier.
    for _ in range(max_iter):
        frontier = state.filter("changed").select(F.col("id").alias("src"))
        touched = (
            both.join(frontier, "src")
            .select(F.col("dst").alias("id"))
            .distinct()
        )
        new = materialized_checkpoint(
            state.select("id", "cid")
            .join(touched.withColumn("_hit", F.lit(True)), "id", "left")
            .select(
                "id",
                F.when(F.col("_hit") & (F.col("cid") != v_glb), F.lit(v_glb))
                .otherwise(F.col("cid"))
                .alias("cid"),
                (F.col("_hit") & (F.col("cid") != v_glb)).alias("changed"),
            )
        )
        remaining = new.filter("changed").limit(1).count()
        state.unpersist()
        state = new
        if remaining == 0:
            break

    # phase 1 (cc-opt.h:67-77): max-label propagation among vertices not in
    # the stamped component. Dense form re-gathers over ALL edges each
    # round (EdgeMapDense, cc-pull.h:73); sparse form pushes only from the
    # changed frontier (EdgeMap, cc-opt.h:75).
    state = materialized_checkpoint(
        state.select("id", "cid").withColumn("changed", F.col("cid") != v_glb)
    )
    for _ in range(max_iter):
        if dense:
            senders = state.filter(F.col("cid") != v_glb)
        else:
            senders = state.filter("changed")
        msgs = (
            both.join(
                senders.select(F.col("id").alias("src"), "cid"), "src"
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.max("cid").alias("cand"))
        )
        new = materialized_checkpoint(
            state.select("id", "cid")
            .join(msgs, "id", "left")
            .select(
                "id",
                F.when(
                    (F.col("cid") != v_glb)
                    & (F.coalesce(F.col("cand"), F.col("cid")) > F.col("cid")),
                    F.col("cand"),
                )
                .otherwise(F.col("cid"))
                .alias("cid"),
                (
                    (F.col("cid") != v_glb)
                    & (F.coalesce(F.col("cand"), F.col("cid")) > F.col("cid"))
                ).alias("changed"),
            )
        )
        active = new.filter("changed").limit(1).count()
        state.unpersist()
        state = new
        if active == 0:
            break
    both.unpersist()
    return state.select("id", "cid")


def cc_opt(g: Graph, max_iter: int = 200) -> DataFrame:
    """(id, cid) — cc-opt.h: degree-keyed labels, giant-component BFS fast
    path, then frontier-push max propagation. cid(v) = max over v's
    component of deg(u)·n + u."""
    return _cc_degree_keyed(g, dense=False, max_iter=max_iter)


def cc_pull(g: Graph, max_iter: int = 200) -> DataFrame:
    """(id, cid) — cc-pull.h: same fixed point as :func:`cc_opt`, but phase
    1 re-gathers densely over every undecided vertex's in-edges each round
    (EdgeMapDense) instead of pushing from the changed frontier. On Spark
    the dense form trades frontier bookkeeping for a constant-shape
    edges⋈state join that AQE can plan once; preferable when the frontier
    stays a large fraction of V (heavy-tailed label churn)."""
    return _cc_degree_keyed(g, dense=True, max_iter=max_iter)
