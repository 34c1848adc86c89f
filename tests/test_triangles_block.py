"""triangles_block — packed-CSR intersection kernel (worker-side degree
orientation + offset-k wedge enumeration + sorted-key closing probe) must
count exactly what the wedge-join plan counts, on every graph shape."""

from pyspark.sql import functions as F

from graphscope_spark.graph import Graph
from graphscope_spark.algorithms.triangles import (
    triangle_count, triangles, triangles_block,
)


def _tri_map(df):
    return {r["id"]: r["tri"] for r in df.collect()}


def test_random_graph_matches_join(spark):
    e = spark.range(20_000).select(
        F.pmod(F.xxhash64("id"), F.lit(1500)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1500)).alias("dst"))
    g = Graph(e, directed=False, num_partitions=8)
    assert _tri_map(triangles(g, engine="join")) == _tri_map(
        triangles_block(g, num_blocks=4))


def test_planted_hub_matches_join(spark):
    # a 25%-share hub stresses the orientation (the hub's oriented
    # out-degree must collapse) and the cross-block key probes
    e = spark.range(30_000).select(
        F.when(F.pmod(F.xxhash64("id", F.lit(7)), F.lit(100)) < 25,
               F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(2000))).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(2000)).alias("dst"))
    g = Graph(e, directed=True, num_partitions=8)
    assert _tri_map(triangles(g, engine="join")) == _tri_map(
        triangles_block(g, num_blocks=8))


def test_dirty_edges_and_empty(spark):
    dirty = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1), (1, 1), (1, 2),
         (2, 2)],
        "src long, dst long")
    g = Graph(dirty, directed=False, num_partitions=2)
    assert _tri_map(triangles_block(g)) == {1: 1, 2: 1, 3: 1}
    ge = Graph(spark.createDataFrame([], "src long, dst long"),
               directed=True, num_partitions=2)
    assert triangles_block(ge).count() == 0


def test_negative_ids_no_phantom_triangles(spark):
    # regression: keys packed on max_id alone collide for negative ids —
    # canonical edge (-3,5) and NON-edge (-2,-1) both packed to -13 at
    # K=6, inventing a triangle. Range-offset packing must count zero.
    rows = [(-6, -2), (-6, -1), (-3, 5), (-2, 4), (-1, 4)]
    g = Graph(spark.createDataFrame(rows, "src long, dst long"),
              directed=False, num_partitions=2)
    assert _tri_map(triangles_block(g)) == _tri_map(
        triangles(g, engine="join"))
    assert triangle_count(g, engine="block") == 0


def test_mixed_sign_ids_match_join(spark):
    # random graph over ids centered on 0 (half negative)
    e = spark.range(15_000).select(
        (F.pmod(F.xxhash64("id"), F.lit(1000)) - 500).alias("src"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1000)) - 500).alias("dst"))
    g = Graph(e, directed=False, num_partitions=8)
    assert _tri_map(triangles(g, engine="join")) == _tri_map(
        triangles_block(g, num_blocks=4))


def test_sparse_ids_fall_back_to_join(spark):
    # id RANGE beyond the packable key base (K = mx-mn+1 > _MAX_KEY_BASE):
    # triangles_block must take the K-guard join fallback and still return
    # exact counts — no silent key overflow
    rows = [(0, 4_000_000_000),
            (4_000_000_000, 4_000_000_001),
            (0, 4_000_000_001)]
    g = Graph(spark.createDataFrame(rows, "src long, dst long"),
              directed=False, num_partitions=2)
    assert triangle_count(g, engine="block") == 1


def test_large_but_dense_ids_stay_in_block_kernel(spark):
    # ids far from 0 but with a tiny RANGE (K = 3): the block kernel
    # handles these directly via the mn-offset packing — no fallback
    rows = [(5_000_000_000, 5_000_000_001),
            (5_000_000_001, 5_000_000_002),
            (5_000_000_000, 5_000_000_002)]
    g = Graph(spark.createDataFrame(rows, "src long, dst long"),
              directed=False, num_partitions=2)
    assert _tri_map(triangles_block(g, num_blocks=2)) == {
        5_000_000_000: 1, 5_000_000_001: 1, 5_000_000_002: 1}


def test_auto_dispatch_small_stays_join(spark):
    # tiny graph: auto must not pay the pack; counts identical either way
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long")
    g = Graph(e, directed=False, num_partitions=2)
    assert _tri_map(triangles(g)) == _tri_map(triangles(g, engine="join"))
