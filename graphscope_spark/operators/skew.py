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
