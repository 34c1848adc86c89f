"""Multi-label property graph: project / flatten / bipartite views vs the
TPC-H tables (the ArrowFragment → ArrowProjectedFragment /
ArrowFlattenFragment contract, SURVEY.md §1.1-1.2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphscope_spark.algorithms import degree_centrality, wcc
from graphscope_spark.property_graph import PropertyGraph


@pytest.fixture(scope="module")
def pg(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("id"), "c_acctbal", "c_mktsegment"
    )
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        F.col("s_suppkey").alias("id"), "s_acctbal"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    purchases = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("src"),
            F.col("l_suppkey").alias("dst"),
            F.col("l_quantity").alias("qty"),
        )
        .distinct()
    )
    # same-label edges for project(): customers who share an order... keep
    # it simple: customer->customer via shared nation (small, deterministic)
    c2 = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("id"), F.col("c_nationkey").alias("nk")
    )
    knows = (
        c2.alias("a")
        .join(c2.alias("b"), (F.col("a.nk") == F.col("b.nk")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
        .filter(F.col("src") % 7 == 0)  # thin it out
    )
    g = PropertyGraph(directed=True)
    g.add_vertices(cust, "customer")
    g.add_vertices(supp, "supplier")
    g.add_edges(purchases, "purchases", "customer", "supplier")
    g.add_edges(knows, "knows", "customer", "customer")
    return g


def test_schema(pg):
    s = pg.schema()
    assert s["vertices"]["customer"] == ["c_acctbal", "c_mktsegment"]
    assert s["vertices"]["supplier"] == ["s_acctbal"]
    assert set(s["edges"]) == {"customer/purchases/supplier", "customer/knows/customer"}
    assert s["edges"]["customer/purchases/supplier"] == ["qty"]


def test_project_simple(pg, spark, sf_dir):
    g = pg.project("customer", "knows", vertex_prop="c_acctbal")
    assert set(g.vertices.columns) == {"id", "c_acctbal"}
    # degree parity with a direct computation
    dc = degree_centrality(g, "out")
    cnt = g.edges.count()
    assert cnt > 0
    got = dc.agg(F.sum("dc")).first()[0]
    n = g.num_vertices
    assert abs(got - cnt / (n - 1)) < 1e-6


def test_project_missing_label_raises(pg):
    with pytest.raises(KeyError):
        pg.project("supplier", "knows")


def test_flatten_counts_and_disjoint_gids(pg):
    flat = pg.flatten(num_partitions=8)
    nv = flat.num_vertices
    want_nv = sum(df.count() for df in pg.vertex_tables.values())
    assert nv == want_nv
    ne = flat.num_edges
    want_ne = sum(df.count() for df in pg.edge_tables.values())
    assert ne == want_ne
    # label partitioning of the gid space: customers in block 0, suppliers in 1
    blocks = sorted(
        r[0] for r in flat.vertices.select(
            (F.col("id") / (1 << 48)).cast("long")
        ).distinct().collect()
    )
    assert blocks == [0, 1]


def test_bipartite_wcc_runs(pg):
    b = pg.bipartite("customer", "purchases", "supplier", num_partitions=8)
    comps = wcc(b, max_iter=50).state
    # every supplier is reachable from some customer at sf0.001 → few comps
    n_comps = comps.select("comp").distinct().count()
    assert 1 <= n_comps < b.num_vertices


def test_consolidate_vertex_columns(pg, spark):
    pg2 = pg.consolidate_columns("customer", ["c_acctbal"], "bals")
    df = pg2.vertex_tables["customer"]
    assert "bals" in df.columns and "c_acctbal" not in df.columns
    row = df.select("id", "bals").orderBy("id").first()
    # array wraps the original values in declaration order
    assert isinstance(row["bals"], list) and len(row["bals"]) == 1
    # original graph untouched
    assert "c_acctbal" in pg.vertex_tables["customer"].columns


def test_consolidate_edge_columns(spark):
    pgx = PropertyGraph(directed=True)
    v = spark.createDataFrame([(1,), (2,)], "id long")
    e = spark.createDataFrame(
        [(1, 2, 0.5, 0.7)], "src long, dst long, w0 double, w1 double"
    )
    pgx.add_vertices(v, "n").add_edges(e, "rel", "n", "n")
    pg2 = pgx.consolidate_columns("rel", ["w0", "w1"], "weight")
    row = pg2.edge_tables[("n", "rel", "n")].first()
    assert row["weight"] == [0.5, 0.7]
    assert "w0" not in pg2.edge_tables[("n", "rel", "n")].columns


def test_consolidate_missing_columns_raises(pg):
    with pytest.raises(KeyError):
        pg.consolidate_columns("customer", ["nope"], "x")
    with pytest.raises(KeyError):
        pg.consolidate_columns("ghost_label", ["c_acctbal"], "x")
