"""Explicit skew handling — hub-vertex salting.

Two skew regimes and their remedies in this engine:

1. **Adaptive (default)**: AQE skew-join splitting
   (``spark.sql.adaptive.skewJoin.enabled``, on in session.py) splits
   oversized partitions of a shuffle join at runtime. This covers every
   join whose sides arrive through an Exchange.
2. **Static-plan backstop (this module)**: the per-superstep message join
   deliberately AVOIDS an exchange on the edge side (the edge table is
   cached pre-partitioned — graph.py persist_partitioned), and AQE cannot
   split a side it did not shuffle. When one hub vertex's edge block
   dwarfs every other partition, `salted_join` re-keys the big side on
   (key, salt) and replicates the small side ×n_salts, spreading the hub's
   rows over ``n_salts`` tasks at the cost of re-exchanging the big side
   once — the classic salting trade, applied ONLY when the static plan is
   the bottleneck.

Reference analog: GRAPE splits hub work physically — the edge-cut
partitioner spreads a hub's edges across fragments and mirrors the vertex
(docs/frag_intro.md outer vertices), which is exactly what the salt does
to the join key space.

**Which remedy, measured (the AUTO policy).** The skew bench
(scripts/skew_bench.py, BENCH/BASELINE.md skew table, 20M-edge hub-skewed
input) shows the right remedy depends on the superstep's COMBINER, so the
iterative algorithms select it from the measured hub set by default:

* **sum-like combiners (pagerank): hub-ISOLATE.** Every message counts —
  the hub's Θ(deg) messages cannot pre-collapse, so the win is removing
  the hub block from the keyed join entirely (broadcast the ≤top_n hub
  message rows onto an evenly-spread hub-edge cache). Measured 2.9× over
  plain on skewed pagerank; degrades to exactly the plain join on uniform
  inputs (empty measured hub set).
* **min/max-like combiners (wcc, sssp; cdlp's count-argmax): SALT.** The
  map-side partial aggregation already collapses a hub DESTINATION's
  traffic to one row per partition — what remains is the straggler task
  that owns the hub's SOURCE block in the statically-partitioned edge
  cache, which isolation does not touch (wcc skewed: isolate 83.1 s =
  plain 83.1 s, worst-task 106.7 s) but salting spreads (63.4 s).
  Min/max are order-free, so the salted run is bit-identical.
* **neither on uniform inputs**: salting a uniform input is pure overhead
  (1.48× slower — the (key,salt) re-key + per-round replica explode);
  the sensor (:func:`measured_hub_keys` — one count + one top-n agg,
  threshold = a partition's fair share of edges) returns an empty hub
  set and the plan stays plain.

Callers can still force a remedy (``hub_salts`` / ``hub_isolate``) or turn
the sensor off (``skew=None``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """``big ⋈ small on key`` with the big side salted.

    big gets a deterministic per-row salt (hash of the full row — stable
    across retries/recomputation, never spark_partition_id); small is
    replicated once per salt via a generated sequence + explode. The join
    key becomes (key, _salt), so a hub key's rows split across n_salts
    reducers. Result is exactly the plain join's rows (salt columns
    dropped)."""
    if n_salts <= 1:
        return big.join(small, key, how)
    b = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return b.join(s, [key, "_salt"], how).drop("_salt")


def top_degree_keys(edges: DataFrame, key: str = "src", top_n: int = 16) -> DataFrame:
    """The hub set: keys whose row count dominates — candidates for salted
    or broadcast-isolated handling. One aggregation, top-n heap
    (TakeOrderedAndProject)."""
    return (
        edges.groupBy(key)
        .agg(F.count(F.lit(1)).alias("deg"))
        .orderBy(F.col("deg").desc(), F.col(key))
        .limit(top_n)
    )


# Below this edge count the AUTO sensor doesn't even measure: any single
# task finishes a sub-1M-edge block in milliseconds, so no remedy can pay
# for its own re-key — and the sensor's two jobs would tax every tiny
# gate/test graph for nothing. Tests pin it to 0 to exercise the policy
# on small planted-hub inputs.
SKEW_SENSOR_MIN_EDGES = 1_000_000


def measured_hub_keys(
    edges: DataFrame,
    key: str = "src",
    top_n: int = 16,
    num_partitions: int | None = None,
    min_share: float = 1.0,
    total: int | None = None,
) -> list:
    """The measured-skew sensor of the auto policy: keys whose edge block
    exceeds ``min_share`` × (E / num_partitions) — i.e. keys a single
    statically-partitioned task cannot own without becoming the straggler.
    One top-n aggregation (plus a count unless the caller passes the
    already-known ``total`` — every auto-policy caller has ``g.num_edges``
    cached); EMPTY on uniform inputs, so policies keyed on it are no-ops
    there."""
    if num_partitions is None:
        num_partitions = edges.rdd.getNumPartitions()
    if total is None:
        total = edges.count()
    if total == 0:
        return []
    threshold = max(1.0, min_share * total / num_partitions)
    return sorted(
        r[key]
        for r in top_degree_keys(edges, key, top_n).collect()
        if r["deg"] > threshold
    )


def skew_isolated_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    hub_keys: DataFrame,
    how: str = "inner",
) -> DataFrame:
    """Hub-isolation variant: rows with hub keys join via BROADCAST of the
    (tiny) hub slice of ``small``; the long tail joins normally. No
    replication of the whole small side — cheaper than full salting when
    hubs are few and identifiable (the common link-graph case: a handful
    of super-nodes)."""
    hubs = hub_keys.select(key)
    big_hub = big.join(F.broadcast(hubs), key, "left_semi")
    big_rest = big.join(F.broadcast(hubs), key, "left_anti")
    small_hub = small.join(F.broadcast(hubs), key, "left_semi")
    return big_rest.join(small, key, how).unionByName(
        big_hub.join(F.broadcast(small_hub), key, how)
    )


class HubIsolatedEdges:
    """Hub-ISOLATION edge partitioning for iterative message joins — the
    broadcast cousin of :class:`HubSaltedEdges`, and the cheaper remedy
    when hubs are few and extreme (the web super-node case).

    Split at pack time on MEASURED skew: keys whose edge block exceeds
    ``min_share`` × (E / num_partitions) become hubs. Hub edges get their
    own cache spread EVENLY over all partitions (round-robin — since the
    hub join needs no key partitioning at all); tail edges keep the
    standard src-partitioned sorted cache. Per round:

      * tail: plain sort-merge join, messages filtered by a ≤top_n-literal
        predicate (hub messages never shuffle);
      * hub: the ≤top_n hub message rows BROADCAST onto the evenly-spread
        hub cache — perfectly balanced, no replication factor to tune.

    On an input with NO dominant key the hub set is EMPTY and
    ``message_join`` degrades to exactly the plain join — the
    does-not-hurt-uniform property holds by construction, unlike salting
    (whose (key,_salt) re-key + per-round replica explode costs ~45% on a
    uniform 20M-edge input, BENCH/skew_runs.jsonl). Reference analog:
    GRAPE mirrors high-degree vertices across fragments and routes their
    messages by broadcast rather than point-to-point
    (docs/frag_intro.md outer vertices).
    """

    def __init__(
        self,
        edges: DataFrame,
        key: str = "src",
        top_n: int = 16,
        num_partitions: int | None = None,
        min_share: float = 1.0,
        pre_partitioned: bool = False,
        total: int | None = None,
        hub_keys: list | None = None,
    ) -> None:
        from graphscope_spark.graph import persist_partitioned

        self.key = key
        if num_partitions is None:
            num_partitions = edges.rdd.getNumPartitions()
        # pre-measured ``hub_keys`` (Graph.measured_hubs — the cached
        # degree-derived sensor) skips the edge aggregation here; the
        # fallback is the shared sensor (measured_hub_keys), with
        # ``total`` letting callers reuse the cached g.num_edges
        self.hub_keys = hub_keys if hub_keys is not None else measured_hub_keys(
            edges, key, top_n, num_partitions, min_share, total=total)
        if not self.hub_keys:
            # no measured skew: stream the caller's cache untouched
            self.tail = (
                edges if pre_partitioned
                else persist_partitioned(
                    edges.repartition(num_partitions, key)
                    .sortWithinPartitions(key))
            )
            self.hub_edges = None
            return
        is_hub = F.col(key).isin(self.hub_keys)
        # tail keeps (or gets) the standard CSR-contract cache; when the
        # caller's cache is already src-partitioned the filter streams it
        # with partitioning AND ordering preserved — no new tail cache.
        self.tail = (
            edges.filter(~is_hub) if pre_partitioned
            else persist_partitioned(
                edges.filter(~is_hub).repartition(num_partitions, key)
                .sortWithinPartitions(key))
        )
        self.hub_edges = persist_partitioned(
            edges.filter(is_hub).repartition(num_partitions)
        )
        self.hub_edges.count()

    def message_join(self, msgs: DataFrame, how: str = "inner") -> DataFrame:
        """Row-for-row equal to ``edges ⋈ msgs on key`` (union order — and
        hence float partial-sum order downstream — may differ)."""
        if self.hub_edges is None:
            return self.tail.join(msgs, self.key, how)
        is_hub = F.col(self.key).isin(self.hub_keys)
        tail = self.tail.join(msgs.filter(~is_hub), self.key, how)
        hub = self.hub_edges.join(
            F.broadcast(msgs.filter(is_hub)), self.key, how)
        return tail.unionByName(hub)

    def unpersist(self) -> None:
        for df in (self.tail, self.hub_edges):
            if df is not None:
                try:
                    df.unpersist()
                except Exception:
                    pass


class HubSaltedEdges:
    """Statically hub-split edge partitioning for iterative message joins.

    The superstep join ``edges ⋈ messages on src`` streams the edge table
    from a cache partitioned by ``src`` (graph.py persist_partitioned), so
    a hub vertex's entire edge block lands in ONE task per round and AQE
    cannot split it (no exchange on that side). This class re-keys the
    cached edge table on ``(src, _salt)`` where hub rows get
    ``hash(dst) % n_salts`` and tail rows get salt 0 — the hub's edges
    spread over ``n_salts`` tasks *statically, once*, which is exactly
    GRAPE's edge-cut hub splitting (docs/frag_intro.md outer vertices:
    a hub's adjacency is physically divided across fragments and the
    vertex is mirrored). Per round only the ≤``top_n`` hub message rows
    are replicated ×n_salts; the tail joins 1:1. Join output is row-for-
    row identical to the plain join.

    Cost model at 100 TB: the salted repartition is one extra full edge
    shuffle at load time; every subsequent superstep saves
    ``(hub_share − 1/P)·E`` join work on the straggler task. For any run
    of ≥2 rounds on a graph whose top hub exceeds a partition's share,
    the trade wins.
    """

    def __init__(
        self,
        edges: DataFrame,
        key: str = "src",
        n_salts: int = 8,
        top_n: int = 16,
        num_partitions: int | None = None,
        hub_keys: list | None = None,
    ) -> None:
        from graphscope_spark.graph import persist_partitioned

        self.key = key
        self.n_salts = n_salts
        other = [c for c in edges.columns if c != key]
        salt_src = F.xxhash64(*[F.col(c) for c in other]) if other else (
            F.xxhash64(F.col(key)))
        # hub set: the top_n heaviest keys (one agg, top-n heap) — or the
        # caller's pre-measured ``hub_keys`` (the auto policy already paid
        # the aggregation in measured_hub_keys; don't pay it twice) —
        # MATERIALIZED to a literal local DataFrame — it re-enters the
        # plan every round, and an unevaluated lineage would re-aggregate
        # the whole edge table per superstep. ≤ top_n rows, always
        # broadcast.
        hub_rows = (
            [(k,) for k in hub_keys]
            if hub_keys is not None
            else [
                (r[key],)
                for r in top_degree_keys(edges, key, top_n).collect()
            ]
        )
        self.hub_marks = (
            edges.sparkSession.createDataFrame(hub_rows, f"{key} long")
            .select(key, F.lit(True).alias("_h"))
        )
        if num_partitions is None:
            num_partitions = edges.rdd.getNumPartitions()
        salted = (
            edges.join(F.broadcast(self.hub_marks), key, "left")
            .withColumn(
                "_salt",
                F.when(
                    F.col("_h").isNotNull(),
                    F.pmod(salt_src, F.lit(n_salts)).cast("int"),
                ).otherwise(F.lit(0)),
            )
            .drop("_h")
            .repartition(num_partitions, key, "_salt")
            # pre-sort on the join key like Graph.out_edges: without this
            # the per-round sort-merge join re-sorts the WHOLE edge table
            # every superstep (measured at 20M×5 rounds: +82% task-seconds,
            # wiping out the straggler win the salt buys)
            .sortWithinPartitions(key, "_salt")
        )
        self.edges = persist_partitioned(salted)
        self.edges.count()  # materialize: supersteps must stream, not build

    def message_join(self, msgs: DataFrame, how: str = "inner") -> DataFrame:
        """``edges ⋈ msgs on (key, _salt)`` — msgs holds one row per key
        (per-vertex message/state); hub keys' rows are replicated to every
        salt, tail rows get salt 0, so each edge row matches exactly one
        replica and the result equals the plain ``edges ⋈ msgs on key``
        (modulo the extra _salt column, dropped here)."""
        replicated = (
            msgs.join(F.broadcast(self.hub_marks), self.key, "left")
            .withColumn(
                "_salt",
                F.explode(
                    F.when(
                        F.col("_h").isNotNull(),
                        F.sequence(F.lit(0), F.lit(self.n_salts - 1)),
                    ).otherwise(F.array(F.lit(0))).cast("array<int>")
                ),
            )
            .drop("_h")
        )
        return self.edges.join(replicated, [self.key, "_salt"], how).drop("_salt")

    def unpersist(self) -> None:
        self.edges.unpersist()
