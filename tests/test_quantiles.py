"""exact_quantiles — nearest-rank semantics against Python order stats."""

import math

import pytest

from graphscope_spark.functions.quantiles import exact_quantiles
from graphscope_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark("test-quantiles", cpus=4, shuffle_partitions=4)


def _oracle(vals, q):
    s = sorted(vals)
    rank = max(1, math.ceil(round(q * 1_000_000) * len(s) / 1_000_000))
    return s[rank - 1]


@pytest.mark.parametrize(
    "vals",
    [
        [5, 1, 9, 3, 3, 7, 2, 8],
        list(range(100)),
        [42],
        [1, 1, 1, 2],
    ],
)
def test_exact_quantiles_nearest_rank(spark, vals):
    qs = [0.0, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r["q"]: r["value"] for r in exact_quantiles(df, "v", qs).collect()}
    assert got == {q: _oracle(vals, q) for q in qs}


def test_exact_quantiles_excludes_nulls(spark):
    df = spark.createDataFrame(
        [(1,), (None,), (3,), (2,)], "v long"
    )
    got = {r["q"]: r["value"] for r in exact_quantiles(df, "v", [0.5]).collect()}
    assert got == {0.5: 2}


def test_exact_quantiles_by_groups(spark):
    from graphscope_spark.functions.quantiles import exact_quantiles_by
    rows = [("a", v) for v in [1, 2, 3, 4]] + [("b", v) for v in [10, 20]]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        (r["g"], r["q"]): r["value"]
        for r in exact_quantiles_by(df, "g", "v", [0.5, 1.0]).collect()
    }
    assert got == {
        ("a", 0.5): 2, ("a", 1.0): 4,
        ("b", 0.5): 10, ("b", 1.0): 20,
    }
