"""GIE expression-surface mappings (expr.proto) pinned against literal
evaluations."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from graphscope_spark.operators import expressions as X


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_membership_and_strings(spark):
    df = spark.createDataFrame(
        [("apple",), ("banana",), ("cherry",)], "s string"
    )
    assert df.filter(X.within("s", ["apple", "cherry"])).count() == 2
    assert df.filter(X.without("s", ["apple"])).count() == 2
    assert df.filter(X.starts_with("s", "ba")).count() == 1
    assert df.filter(X.ends_with("s", "ry")).count() == 1
    assert df.filter(X.regex("s", "an.n")).count() == 1
    assert df.filter(X.is_null("s")).count() == 0


def test_bit_ops_and_case(spark):
    assert _one(spark, X.bit_op("and", F.lit(12), F.lit(10))) == 8
    assert _one(spark, X.bit_op("or", F.lit(12), F.lit(10))) == 14
    assert _one(spark, X.bit_op("xor", F.lit(12), F.lit(10))) == 6
    assert _one(spark, X.bit_op("lshift", F.lit(3), 2)) == 12
    assert _one(spark, X.bit_op("rshift", F.lit(12), 2)) == 3
    c = X.case_when(
        [(F.lit(1) > 2, F.lit("a")), (F.lit(2) > 1, F.lit("b"))], F.lit("z")
    )
    assert _one(spark, c) == "b"


def test_temporal(spark):
    ts = datetime.datetime(2024, 3, 5, 14, 30, 45)
    df = spark.createDataFrame([(ts,)], "t timestamp")
    row = df.select(
        X.extract("year", "t").alias("y"),
        X.extract("month", "t").alias("m"),
        X.extract("day", "t").alias("d"),
        X.extract("hour", "t").alias("h"),
        X.extract("minute", "t").alias("mi"),
        X.extract("second", "t").alias("s"),
    ).first()
    assert (row["y"], row["m"], row["d"], row["h"], row["mi"], row["s"]) == \
        (2024, 3, 5, 14, 30, 45)
    d2 = spark.createDataFrame(
        [(datetime.date(2024, 3, 10), datetime.date(2024, 3, 5))],
        "a date, b date",
    )
    assert d2.select(X.datetime_minus("a", "b").alias("v")).first()["v"] == 5


def test_collections_and_paths(spark):
    df = spark.createDataFrame([(1, 2)], "a long, b long")
    row = df.select(
        X.key_list("a", "b").alias("l"),
        X.key_values(x="a", y="b").alias("m"),
    ).first()
    assert row["l"] == [1, 2] and row["m"] == {"x": 1, "y": 2}
    p = spark.createDataFrame([([1, 2, 3], [4, 5])], "p array<long>, q array<long>")
    row2 = p.select(
        X.length_key("p").alias("n"),
        X.path_concat("p", "q").alias("cat"),
        X.path_function("p", "len").alias("hops"),
        X.path_function("p", "first").alias("f"),
        X.path_function("p", "last").alias("l"),
    ).first()
    assert row2["n"] == 3 and row2["cat"] == [1, 2, 3, 4, 5]
    assert row2["hops"] == 2 and row2["f"] == 1 and row2["l"] == 3
