"""Classic TPC-H analytics (Q1 / Q3 / Q6) over the synthetic tables.

The relational-breadth counterpart of the graph and corpus operators:
pure declarative DataFrame plans Catalyst optimizes end-to-end (predicate
pushdown to the parquet scan, partial aggregation, broadcast of the
filtered customer dimension in Q3 — verified in PLANS.md).

Float discipline: monetary arithmetic casts the parquet doubles to
DECIMAL(18,4) BEFORE any multiplication, so every product and sum is
exact fixed-point — partition/order-independent — and the DuckDB twins
(tpch_queries.qN_sql) hash-match bit-for-bit. Averages divide the exact
decimal sum by the count in double space and round to 6 (one
deterministic float op each). Dates compare in integer epoch-days.

TPC-H is public (tpch.org); these follow the spec's query shapes adapted
to the driver's simplified schemas (no l_shipmode/o_shippriority etc.).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["q1", "q3", "q6", "q1_sql", "q3_sql", "q6_sql"]

DEC = "decimal(18,4)"
DAY_US = 86_400_000_000


def _day(col: str):
    return F.expr(f"unix_micros(cast({col} as timestamp)) div {DAY_US}")


def _epoch_day(date_str: str) -> int:
    import datetime as dt

    d = dt.datetime.strptime(date_str, "%Y-%m-%d").replace(
        tzinfo=dt.timezone.utc
    )
    return int(d.timestamp()) // 86_400


def q1(spark: SparkSession, sf_dir: str, cut: str = "1998-09-02") -> DataFrame:
    """Pricing summary report (TPC-H Q1)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    qty = F.col("l_quantity").cast(DEC)
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    tax = F.col("l_tax").cast(DEC)
    one = F.lit(1).cast(DEC)
    filtered = li.filter(_day("l_shipdate") <= F.lit(_epoch_day(cut)))
    agg = filtered.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).cast("decimal(38,4)").cast("double").alias("sum_qty"),
        F.sum(price).cast("decimal(38,4)").cast("double").alias("sum_base_price"),
        F.sum(price * (one - disc)).cast("decimal(38,8)").cast("double").alias("sum_disc_price"),
        F.sum(price * (one - disc) * (one + tax))
        .cast("decimal(38,12)")
        .cast("double")
        .alias("sum_charge"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        F.round(
            F.col("sum_qty").cast("double") / F.col("count_order"), 6
        ).alias("avg_qty"),
        F.round(
            F.col("sum_base_price").cast("double") / F.col("count_order"), 6
        ).alias("avg_price"),
        "count_order",
    )


def q1_sql(cut: str = "1998-09-02") -> str:
    day = _epoch_day(cut)
    return f"""
WITH f AS (
  SELECT * FROM lineitem
  WHERE epoch_us(l_shipdate) // {DAY_US} <= {day}
),
agg AS (
  SELECT l_returnflag, l_linestatus,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_qty,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_base_price,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
              * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
              AS DECIMAL(38,8)) AS DOUBLE) AS sum_disc_price,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
              * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
              * (CAST(1 AS DECIMAL(18,4)) + CAST(l_tax AS DECIMAL(18,4))))
              AS DECIMAL(38,12)) AS DOUBLE) AS sum_charge,
         count(*) AS count_order
  FROM f GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price,
       sum_disc_price, sum_charge,
       ROUND(CAST(sum_qty AS DOUBLE) / count_order, 6) AS avg_qty,
       ROUND(CAST(sum_base_price AS DOUBLE) / count_order, 6) AS avg_price,
       count_order
FROM agg"""


def q3(
    spark: SparkSession,
    sf_dir: str,
    segment: str = "BUILDING",
    date: str = "1998-03-15",
    top: int = 10,
) -> DataFrame:
    """Shipping-priority (TPC-H Q3): top unshipped-revenue orders."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_mktsegment") == segment
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        _day("o_orderdate") < F.lit(_epoch_day(date))
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        _day("l_shipdate") > F.lit(_epoch_day(date))
    )
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    one = F.lit(1).cast(DEC)
    joined = (
        li.join(
            orders.select("o_orderkey", "o_custkey", "o_orderdate"),
            li["l_orderkey"] == orders["o_orderkey"],
        )
        .join(F.broadcast(cust.select("c_custkey")),
              F.col("o_custkey") == F.col("c_custkey"))
    )
    return (
        joined.groupBy(
            "l_orderkey", _day("o_orderdate").alias("o_orderday")
        )
        .agg(
            F.sum(price * (one - disc))
            .cast("decimal(38,8)")
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(top)
    )


def q3_sql(
    segment: str = "BUILDING", date: str = "1998-03-15", top: int = 10
) -> str:
    day = _epoch_day(date)
    return f"""
SELECT l.l_orderkey,
       epoch_us(o.o_orderdate) // {DAY_US} AS o_orderday,
       CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
            * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4))))
            AS DECIMAL(38,8)) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = '{segment}'
  AND epoch_us(o.o_orderdate) // {DAY_US} < {day}
  AND epoch_us(l.l_shipdate) // {DAY_US} > {day}
GROUP BY l.l_orderkey, o_orderday
ORDER BY revenue DESC, l.l_orderkey
LIMIT {top}"""


def q6(
    spark: SparkSession,
    sf_dir: str,
    year: int = 1997,
    disc_lo: str = "0.03",
    disc_hi: str = "0.07",
    qty_max: int = 24,
) -> DataFrame:
    """Forecast-revenue change (TPC-H Q6): one-row filtered aggregate.
    Discount bounds compare in DECIMAL (exact) — double literals like
    0.05 are NOT exactly representable, so the spec's between-predicate
    is evaluated in fixed point on both engines."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    disc = F.col("l_discount").cast(DEC)
    price = F.col("l_extendedprice").cast(DEC)
    lo = F.lit(disc_lo).cast(DEC)
    hi = F.lit(disc_hi).cast(DEC)
    d0, d1 = _epoch_day(f"{year}-01-01"), _epoch_day(f"{year + 1}-01-01")
    out = (
        li.filter(
            (_day("l_shipdate") >= F.lit(d0))
            & (_day("l_shipdate") < F.lit(d1))
            & (disc >= lo)
            & (disc <= hi)
            & (F.col("l_quantity") < qty_max)
        )
        .agg(
            F.sum(price * disc).cast("decimal(38,8)").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    return out


def q6_sql(
    year: int = 1997,
    disc_lo: str = "0.03",
    disc_hi: str = "0.07",
    qty_max: int = 24,
) -> str:
    d0, d1 = _epoch_day(f"{year}-01-01"), _epoch_day(f"{year + 1}-01-01")
    return f"""
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
       * CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(38,8)) AS DOUBLE) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE epoch_us(l_shipdate) // {DAY_US} >= {d0}
  AND epoch_us(l_shipdate) // {DAY_US} < {d1}
  AND CAST(l_discount AS DECIMAL(18,4)) >= CAST('{disc_lo}' AS DECIMAL(18,4))
  AND CAST(l_discount AS DECIMAL(18,4)) <= CAST('{disc_hi}' AS DECIMAL(18,4))
  AND l_quantity < {qty_max}"""
