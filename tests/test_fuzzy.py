"""Fuzzy string pairs — exact levenshtein semantics on the candidates."""

import pytest

from graphscope_spark.functions.fuzzy import fuzzy_string_pairs
from graphscope_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark("test-fuzzy", cpus=4, shuffle_partitions=4)


def test_fuzzy_pairs_basic(spark):
    rows = [
        (1, "red widget"),
        (2, "red widgets"),   # dist 1 to 1
        (3, "blue widget"),   # dist 3 to 1 -> out at d=2
        (4, "red widget"),    # dist 0 to 1
        (5, "zzz"),           # shares no gram
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r["a"], r["b"]): r["dist"]
        for r in fuzzy_string_pairs(df, "id", "name", max_distance=2).collect()
    }
    assert got == {(1, 2): 1, (1, 4): 0, (2, 4): 1}


def test_fuzzy_pairs_hub_gram_cap_keeps_exactness(spark):
    rows = [(i, f"prefix{i % 3}") for i in range(9)]
    df = spark.createDataFrame(rows, "id long, name string")
    # 'prefix' grams are hubs (df=9); capping at 3 kills candidate gen for
    # them, but the within-suffix grams (fix0 etc., df=3) still pair the
    # identical strings
    got = fuzzy_string_pairs(
        df, "id", "name", max_distance=1, max_gram_freq=3
    ).collect()
    assert all(r["dist"] == 0 for r in got)
    assert len(got) == 3 * 3  # C(3,2) per identical-name group x 3 groups
