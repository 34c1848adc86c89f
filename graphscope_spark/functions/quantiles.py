"""Exact distributed quantiles via value-histogram cumulative ranks.

percentile_approx / approx_percentile have engine-specific sketches and no
cross-engine twin; a naive exact percentile is a global sort. This operator
is the scale-correct exact middle path for columns whose DISTINCT value
count is bounded (lengths, scores, counts — the columns a curation
pipeline thresholds on): aggregate to a (value, count) histogram first
(map-side combined, shuffle ∝ distinct values), then a cumulative-count
window over the histogram (tiny — one row per distinct value), then
nearest-rank selection. Exact order statistics, no global sort of the
data, no floats anywhere until the output q column.

Nearest-rank definition (the classical one): the q-quantile of n values is
the value at 1-based sorted position ceil(q * n), with q = 0 mapping to
position 1 (the minimum). Deterministic for every q, no interpolation —
interpolated definitions re-introduce float averaging of two ranks and
differ between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["exact_quantiles"]


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    qs: list[float],
) -> DataFrame:
    """(q, value) — exact nearest-rank quantiles of ``value_col``.

    The rank threshold ceil(q*n) is computed in exact arithmetic: q enters
    as the literal its decimal string denotes times n, evaluated as
    round(q * 1e6) * n / 1e6 in integer space before the ceiling, so
    engines cannot disagree on boundary ranks (0.25 * 8 must be rank 2,
    not 2.0000000000000004 → rank 3). Null values are excluded (SQL
    aggregate convention).
    """
    hist = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "value", F.sum("cnt").over(w).alias("cum")
    ).crossJoin(hist.agg(F.sum("cnt").alias("n")))
    qdf = df.sparkSession.createDataFrame(
        [(float(q), int(round(q * 1_000_000))) for q in qs],
        "q double, q_u long",
    )
    # target rank = max(1, ceil(q_u * n / 1e6)) in PURE integer math —
    # `div` is Spark's integer division (DuckDB `//`); a double division
    # here would lose exactness once q_u * n crosses 2^53 and could flip
    # a boundary rank at 100 TB row counts
    rank = F.greatest(
        F.lit(1).cast("long"),
        F.expr("(q_u * n + 999999) div 1000000"),
    )
    joined = cum.crossJoin(F.broadcast(qdf)).withColumn("rank", rank)
    # smallest value whose cumulative count reaches the rank
    return (
        joined.filter(F.col("cum") >= F.col("rank"))
        .groupBy("q")
        .agg(F.min("value").alias("value"))
    )


def exact_quantiles_by(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: list[float],
) -> DataFrame:
    """(group, q, value) — :func:`exact_quantiles` within each group.
    Same nearest-rank / integer-rank-arithmetic semantics; the histogram
    and cumulative window are keyed by group, so the only global object
    is the tiny q list (broadcast)."""
    hist = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.col(group_col).alias("grp"), F.col(value_col).alias("value")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("grp").orderBy("value").rowsBetween(
        Window.unboundedPreceding, 0
    )
    totals = hist.groupBy("grp").agg(F.sum("cnt").alias("n"))
    cum = hist.select("grp", "value", F.sum("cnt").over(w).alias("cum")).join(
        totals, "grp"
    )
    qdf = df.sparkSession.createDataFrame(
        [(float(q), int(round(q * 1_000_000))) for q in qs],
        "q double, q_u long",
    )
    rank = F.greatest(
        F.lit(1).cast("long"),
        F.expr("(q_u * n + 999999) div 1000000"),
    )
    joined = cum.crossJoin(F.broadcast(qdf)).withColumn("rank", rank)
    return (
        joined.filter(F.col("cum") >= F.col("rank"))
        .groupBy(F.col("grp").alias(group_col), "q")
        .agg(F.min("value").alias("value"))
    )
