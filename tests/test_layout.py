"""Z-order keys — exact Morton interleave + locality property."""

import pytest

from graphscope_spark.functions.layout import zorder_key
from graphscope_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark("test-layout", cpus=4, shuffle_partitions=4)


def _morton(vals, bits):
    n = len(vals)
    z = 0
    for b in range(bits):
        for i, v in enumerate(vals):
            z |= ((v >> b) & 1) << (b * n + i)
    return z


def test_zorder_exact_formula(spark):
    # x, y already spanning [0, 2^bits - 1] -> normalization is identity
    bits = 4
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {(r["x"], r["y"]): r["z"] for r in
           zorder_key(df, ["x", "y"], bits=bits).collect()}
    for (x, y), z in got.items():
        assert z == _morton([x, y], bits)
    assert len(set(got.values())) == 256  # bijective on the grid


def test_zorder_constant_column(spark):
    df = spark.createDataFrame([(5, 1), (5, 2)], "x long, y long")
    zs = {r["y"]: r["z"] for r in zorder_key(df, ["x", "y"], bits=4).collect()}
    # constant x normalizes to 0 -> z depends on y alone
    assert zs[1] != zs[2]


def test_zorder_locality(spark):
    # neighbours in 2-D space land nearer in z than distant points do on
    # average — the property min/max pruning exploits
    bits = 8
    rows = [(x, y) for x in range(0, 256, 8) for y in range(0, 256, 8)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {(r["x"], r["y"]): r["z"] for r in
           zorder_key(df, ["x", "y"], bits=bits).collect()}
    near = [abs(got[(x, y)] - got[(x + 8, y)])
            for x in range(0, 248, 8) for y in range(0, 256, 8)]
    far = [abs(got[(x, y)] - got[(x + 128, y)])
           for x in range(0, 128, 8) for y in range(0, 256, 8)]
    assert sum(near) / len(near) < sum(far) / len(far)


def test_zorder_bits_overflow_guard(spark):
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(ValueError):
        zorder_key(df, ["x", "y"], bits=32)
