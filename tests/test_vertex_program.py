"""Declarative vertex-centric API (pregel.vertex_program — the @pregel
decorator analog) must reproduce the builtin algorithms: the callbacks are
column expressions lowered onto the same SuperstepRunner kernel."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphscope_spark.algorithms import sssp, wcc
from graphscope_spark.graph import Graph
from graphscope_spark.pregel import vertex_program

EDGES = [(1, 2), (2, 3), (1, 3), (3, 4), (5, 6)]


@pytest.fixture(scope="module")
def gd(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    return Graph(e, directed=True, num_partitions=4)


@pytest.fixture(scope="module")
def gu(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    return Graph(
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))),
        directed=False, num_partitions=4, assume_symmetric=True,
    )


def test_bfs_as_vertex_program(gd):
    res = vertex_program(
        gd,
        init={"dist": F.when(F.col("id") == 1, F.lit(0.0))},
        message=F.col("dist") + F.lit(1.0),
        combine=F.min,
        update={"dist": F.least(F.col("dist"), F.col("msg"))},
        max_rounds=20,
    )
    got = {r["id"]: r["dist"] for r in res.state.collect()}
    exp = {r["id"]: r["dist"] for r in sssp(gd, 1).state.collect()}
    assert got == exp
    # converged via empty frontier, not round exhaustion
    assert res.rounds < 20


def test_wcc_as_vertex_program(gu):
    res = vertex_program(
        gu,
        init={"comp": F.col("id")},
        message=F.col("comp"),
        combine=F.min,
        update={"comp": F.least(F.col("comp"), F.col("msg"))},
        max_rounds=30,
    )
    got = {r["id"]: r["comp"] for r in res.state.collect()}
    exp = {r["id"]: r["comp"] for r in wcc(gu).state.collect()}
    assert got == exp


def test_update_keys_must_match(gd):
    with pytest.raises(ValueError):
        vertex_program(
            gd, init={"x": F.lit(0)}, message=F.lit(1), combine=F.min,
            update={"y": F.lit(0)},
        )
