"""Data-layout keys: Z-order (Morton) interleaving for multi-column
locality.

At 100 TB the dominant read cost is how much of the table a scan can
SKIP. Single-column sort gives min/max pruning on one column only;
writing files clustered by a Z-order key gives useful min/max ranges on
EVERY participating column at once (the Delta/Iceberg OPTIMIZE ZORDER
idea) — `df.repartitionByRange(n, "z").sortWithinPartitions("z")
.write.parquet(...)` and the parquet row-group stats on the original
columns become selective for any of them.

Construction: min-max normalize each column to ``bits`` bits with pure
integer arithmetic ((v - min) * (2^bits - 1) div (max - min)), then
interleave bit b of column i into position b * ncols + i. Everything is
exact int64 math in whole-stage codegen (ncols * bits ≤ 63), and the
column min/max enter the plan as a 1-row broadcast aggregate — no driver
collect, no UDF — so the DuckDB twin reproduces keys bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key"]


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    out_col: str = "z",
) -> DataFrame:
    """df + ``out_col`` — the Morton key over ``cols`` (integer columns).

    bits per column; requires len(cols) * bits <= 63 (int64, sign-safe).
    Constant columns normalize to 0 (span clamps to 1). Sorting or
    range-partitioning by ``out_col`` before writing clusters the data so
    min/max pruning works on every input column.
    """
    if len(cols) * bits > 63:
        raise ValueError("len(cols) * bits must be <= 63")
    n = len(cols)
    # (v - min) * (2^bits - 1) must stay inside int64: in non-ANSI mode
    # Spark wraps silently (while the DuckDB twin raises), so a wide
    # column span would make engine and oracle silently diverge. Guard
    # with assert_true — spans beyond the limit (or spans that themselves
    # wrapped negative) raise at execution instead of producing wrong
    # keys.
    limit = (2**63 - 1) // ((1 << bits) - 1)
    stats = df.agg(
        *[F.min(F.col(c).cast("long")).alias(f"_min_{c}") for c in cols],
        *[F.max(F.col(c).cast("long")).alias(f"_max_{c}") for c in cols],
    )
    with_stats = df.crossJoin(F.broadcast(stats))
    norm_exprs = {
        c: F.expr(
            f"CASE WHEN assert_true("
            f"(_max_{c} - _min_{c}) BETWEEN 0 AND {limit}, "
            f"'zorder_key: span of {c} overflows int64 at bits={bits}'"
            f") IS NULL THEN "
            f"((cast({c} as bigint) - _min_{c}) * {(1 << bits) - 1}) div "
            f"greatest(cast(1 as bigint), _max_{c} - _min_{c}) END"
        )
        for c in cols
    }
    normed = with_stats.select(
        *df.columns, *[norm_exprs[c].alias(f"_n_{c}") for c in cols]
    )
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            z = z + (
                F.shiftleft(
                    F.shiftright(F.col(f"_n_{c}"), b) % 2, b * n + i
                )
            ).cast("long")
    return normed.select(*df.columns, z.alias(out_col))
