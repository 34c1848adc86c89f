"""Verifiable cardinality / frequency sketches.

At 100 TB, exact per-group distinct counts and full histograms are shuffle
monsters; sketches bound the state. Spark's own approx_count_distinct
(HyperLogLog++) has no cross-engine twin, so these two classical sketches
are built on the portable 60-bit md5 hash (functions/hashing.py) instead —
every number they produce is deterministic and reproducible in DuckDB, so
the driver's value-hash gate applies to the SKETCH ITSELF, not just a
tolerance band.

  * KMV (k-minimum-values, Bar-Yossef et al. 2002): keep the k smallest
    distinct hash values per group; with h_k the k-th smallest on [0, 2^60),
    E[distinct] ≈ (k-1) * 2^60 / h_k. Groups with < k distinct values
    report exactly. State per group = k longs, vs the full distinct set.
  * Count-min (Cormode & Muthukrishnan 2005): depth × width counters,
    row r's bucket = hash64(r || value) % width; point estimate = min over
    rows. One-sided error (never underestimates), state = depth × width
    longs regardless of cardinality.

Scale shape: KMV shuffles (group, hash) pairs once (pre-deduped by the
groupBy, map-side combined) and top-ks within each group — per-group state
is bounded by the distinct count, and the result is k rows per group.
Count-min is a single groupBy over (row, bucket) with map-side partial
sums — the shuffle carries at most partitions × depth × width rows, a
constant, regardless of input size. Both stay in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from graphscope_spark.functions.hashing import hash64
from graphscope_spark.functions.text import FLOAT_DECIMALS

__all__ = ["kmv_distinct", "count_min_sketch", "cm_lookup", "hll_distinct"]

HASH_SPACE = float(1 << 60)


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """(group, n_kept, est_distinct) — KMV distinct-count estimate of
    ``value_col`` within each group. Groups holding fewer than ``k``
    distinct values report the exact count (the sketch IS the distinct
    set there); otherwise the (k-1)·2^60/h_k estimator. est_distinct is
    rounded to FLOAT_DECIMALS; the estimate is deterministic because the
    hash is."""
    hashes = (
        df.select(
            F.col(group_col).alias("grp"),
            hash64(F.col(value_col).cast("string")).alias("h"),
        )
        .groupBy("grp", "h")
        .agg(F.lit(1))  # distinct (group, hash) pairs, map-side combined
        .select("grp", "h")
    )
    w = Window.partitionBy("grp").orderBy("h")
    topk = hashes.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    kth = topk.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("h_k")
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("h_k").cast("double")
    )
    return kth.select(
        F.col("grp").alias(group_col),
        "n_kept",
        F.round(est, FLOAT_DECIMALS).alias("est_distinct"),
    )


def _bucket(row: int, value: Column, width: int) -> Column:
    return F.pmod(hash64(F.concat(F.lit(f"cm{row}|"), value)), F.lit(width))


def count_min_sketch(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """(row, bucket, cnt) — the full depth × width count-min table over
    ``value_col`` occurrences. Each input row increments one bucket per
    sketch row; buckets are salted-hash positions so the DuckDB twin
    reproduces the exact table. Missing (row, bucket) cells are zero (not
    emitted)."""
    v = F.col(value_col).cast("string")
    rb = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"), _bucket(r, v, width).alias("bucket")
            )
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(rb).alias("rb"))  # one scan for all rows
        .select("rb.row", "rb.bucket")
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_lookup(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """(item, est) — count-min point estimates (min over rows) for each
    item. Never underestimates the true occurrence count. ``items`` is
    expected small (a probe list) and is broadcast."""
    probes = items.select(F.col(item_col).alias("item"))
    rb = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                _bucket(r, F.col("item").cast("string"), width).alias(
                    "bucket"
                ),
            )
            for r in range(depth)
        ]
    )
    union = probes.select("item", F.explode(rb).alias("rb")).select(
        "item", "rb.row", "rb.bucket"
    )
    return (
        F.broadcast(union)
        .join(sketch, ["row", "bucket"], "left")
        .fillna(0, subset=["cnt"])
        .groupBy("item")
        .agg(F.min("cnt").alias("est"))
    )


def hll_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    b: int = 6,
) -> DataFrame:
    """(group, n_registers, est_distinct) — HyperLogLog distinct-count
    estimate per group, built on the portable 60-bit hash so the sketch
    itself is value-hash-verifiable in DuckDB (Spark's own
    approx_count_distinct has no cross-engine twin).

    Register j = h mod m (m = 2^b); the geometric observable is the
    TRAILING-zero count of the remaining 54 hash bits (the original
    Flajolet–Martin observable — same ``P(rho ≥ r) = 2^-r`` geometry as
    HLL's leading zeros, but computable exactly in both engines as
    ``log2(w & -w)``: the isolated lowest set bit is an exact power of
    two, so ``log2`` of it is exact in IEEE doubles). The register sum
    ``Σ 2^-M_j`` is carried as the INTEGER ``Σ 2^(55-M_j)`` (≤ 64·2^54,
    exact in int64 — a double sum of dyadics spanning 2^54 would be
    partition-order-dependent at the last ulp); doubles appear only in
    the final α·m²·2^55 / S division and the linear-counting branch.
    Small-range correction per the HLL paper: raw ≤ 2.5·m with empty
    registers → linear counting m·ln(m/V).

    Scale shape: one groupBy over (group, register) with map-side
    combined MAX — state per group is m registers regardless of
    cardinality; the shuffle carries ≤ partitions·m rows per group.
    """
    m = 1 << b
    hx = df.select(
        F.col(group_col).alias("grp"),
        hash64(F.col(value_col).cast("string")).alias("h"),
    )
    # integer `div`, NOT `/`: the float path rounds h's 54 significant
    # bits through a 53-bit mantissa and can move w by ±1 near 2^60,
    # silently diverging from the twin's exact `//`
    w = F.expr(f"h div {m}")
    rho = (
        F.when(w == 0, F.lit(55))
        .otherwise((F.log2((w.bitwiseAND(-w)).cast("double")) + 1).cast("int"))
    )
    regs = (
        hx.select("grp", F.pmod(F.col("h"), F.lit(m)).alias("reg"), rho.alias("rho"))
        .groupBy("grp", "reg")
        .agg(F.max("rho").alias("M"))
    )
    agg = regs.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_registers"),
        F.sum(F.expr("CAST(power(2.0, 55 - M) AS BIGINT)")).alias("s_int"),
    )
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    # empty registers contribute 2^-0 = 1, i.e. 2^55 in integer units
    s_full = F.col("s_int") + (F.lit(m) - F.col("n_registers")) * F.lit(float(2 ** 55))
    raw = alpha * F.lit(float(m * m)) * F.lit(float(2 ** 55)) / s_full
    v_zero = F.lit(m) - F.col("n_registers")
    est = F.when(
        (raw <= 2.5 * m) & (v_zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero.cast("double")),
    ).otherwise(raw)
    return agg.select(
        F.col("grp").alias(group_col),
        "n_registers",
        F.round(est, FLOAT_DECIMALS).alias("est_distinct"),
    )
