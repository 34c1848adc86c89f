"""KMV distinct / count-min sketches — exactness + error-bound properties."""

import pytest

from graphscope_spark.functions.sketches import (
    cm_lookup,
    count_min_sketch,
    kmv_distinct,
)
from graphscope_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark("test-sketches", cpus=4, shuffle_partitions=4)


def test_kmv_exact_below_k(spark):
    rows = [("a", i % 7) for i in range(100)] + [("b", i) for i in range(3)]
    df = spark.createDataFrame(rows, "grp string, v long")
    got = {
        r["grp"]: (r["n_kept"], r["est_distinct"])
        for r in kmv_distinct(df, "grp", "v", k=16).collect()
    }
    # below k the sketch IS the distinct set — exact
    assert got["a"] == (7, 7.0)
    assert got["b"] == (3, 3.0)


def test_kmv_estimate_above_k(spark):
    n = 2000
    df = spark.createDataFrame(
        [("a", i) for i in range(n)], "grp string, v long"
    )
    [(kept, est)] = [
        (r["n_kept"], r["est_distinct"])
        for r in kmv_distinct(df, "grp", "v", k=64).collect()
    ]
    assert kept == 64
    # KMV standard error ~ 1/sqrt(k-1) ≈ 12.6%; allow 4 sigma
    assert abs(est - n) / n < 0.5
    # deterministic: same input, different partitioning, same estimate
    [(k2, e2)] = [
        (r["n_kept"], r["est_distinct"])
        for r in kmv_distinct(df.repartition(7), "grp", "v", k=64).collect()
    ]
    assert (k2, e2) == (kept, est)


def test_count_min_never_underestimates(spark):
    vals = ["x"] * 50 + ["y"] * 7 + [f"z{i}" for i in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    sk = count_min_sketch(df, "v", depth=4, width=32)
    items = spark.createDataFrame([("x",), ("y",), ("absent",)], "v string")
    got = {
        r["item"]: r["est"]
        for r in cm_lookup(sk, items, "v", depth=4, width=32).collect()
    }
    assert got["x"] >= 50 and got["y"] >= 7  # one-sided error
    # total mass bound: overestimate ≤ total_count (trivially) and the
    # sketch total per row equals the input size exactly
    per_row = {}
    for r in sk.collect():
        per_row[r["row"]] = per_row.get(r["row"], 0) + r["cnt"]
    assert all(v == len(vals) for v in per_row.values())
    assert got["absent"] >= 0


def test_count_min_exact_at_full_width(spark):
    # width >> distinct values and depth 4: collisions possible but the
    # MIN over 4 independent rows with 3 values in 1024 buckets is exact
    # with overwhelming probability — assert equality to the true counts
    vals = ["a"] * 5 + ["b"] * 2 + ["c"]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    sk = count_min_sketch(df, "v", depth=4, width=1024)
    items = spark.createDataFrame([("a",), ("b",), ("c",)], "v string")
    got = {
        r["item"]: r["est"]
        for r in cm_lookup(sk, items, "v", depth=4, width=1024).collect()
    }
    assert got == {"a": 5, "b": 2, "c": 1}


def test_hll_distinct_accuracy(spark):
    from graphscope_spark.functions.sketches import hll_distinct
    import pyspark.sql.functions as F

    # big group: 5000 distincts through m=64 registers → standard error
    # ~1.04/sqrt(64) = 13%; assert within 3 sigma. small group: 3
    # distincts → linear-counting branch, ln-based but near-exact.
    df = spark.range(5000).select(
        F.lit("big").alias("g"), F.col("id").cast("string").alias("v")
    ).union(
        spark.range(3).select(
            F.lit("small").alias("g"), F.col("id").cast("string").alias("v")
        )
    )
    got = {r["g"]: r for r in hll_distinct(df, "g", "v").collect()}
    assert abs(got["big"]["est_distinct"] - 5000) / 5000 < 0.40
    assert 1 <= got["small"]["est_distinct"] <= 10
    # duplicates must not move the sketch (distinct-count, not count)
    dup = df.union(df)
    got2 = {r["g"]: r for r in hll_distinct(dup, "g", "v").collect()}
    assert got2["big"]["est_distinct"] == got["big"]["est_distinct"]


def test_hll_rho_log2_exact(spark):
    # rho = log2(w & -w) + 1 must be EXACT for every possible bit
    # position (0..54): log2 of an isolated power of two is exact in
    # IEEE doubles, but an engine computing log2 as log(x)/log(2) could
    # round below the integer and truncate wrong — pin it per position.
    import pyspark.sql.functions as F

    df = spark.range(55).select(
        F.col("id").alias("k"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(id AS INT))").alias("w"),
    )
    got = df.select(
        "k",
        (F.log2((F.col("w").bitwiseAND(-F.col("w"))).cast("double")) + 1)
        .cast("int").alias("rho"),
    ).collect()
    assert all(r["rho"] == r["k"] + 1 for r in got)
