"""GraphAr archive roundtrip + layout conformance.

Mirrors the reference's save_to/load_from contract
(python/graphscope/tests/unittest/test_graphar.py:35-58): URI shape,
yaml triple, lossless reload, algorithms run on the reloaded graph.
Layout checks pin the public GraphAr v1 spec: chunk file naming,
chunk-size row bounds, positional internal ids, CSR offset consistency.
"""

import glob
import os

import numpy as np
import pytest
import yaml
from pyspark.sql import functions as F

from graphscope_spark.graph import Graph
from graphscope_spark.sources.graphar import (
    DST_INDEX_COL, OFFSET_COL, SRC_INDEX_COL,
    load_from_graphar, save_to_graphar,
)


@pytest.fixture()
def small_graph(spark):
    edges = spark.createDataFrame(
        [(i, (i * 7 + 3) % 50) for i in range(50) for _ in range(1 + i % 3)],
        "src long, dst long",
    ).distinct()
    verts = spark.range(50).select(
        F.col("id"), (F.col("id") * 2).alias("weight"),
        F.concat(F.lit("v"), F.col("id")).alias("name"),
    )
    return Graph(edges, verts, directed=True, num_partitions=4)


def test_roundtrip_and_uri(small_graph, spark, tmp_path):
    uri = save_to_graphar(small_graph, str(tmp_path / "gar"), name="g1",
                          vertex_chunk_size=16, edge_chunk_size=8)
    assert uri == f"graphar+file://{tmp_path}/gar/g1.graph.yaml"
    g2 = load_from_graphar(spark, uri, num_partitions=4)
    assert g2.directed is True
    a = {(r.src, r.dst) for r in small_graph.edges.collect()}
    b = {(r.src, r.dst) for r in g2.edges.collect()}
    assert a == b
    va = {(r.id, r.weight, r.name) for r in small_graph.vertices.collect()}
    vb = {(r.id, r.weight, r.name) for r in g2.vertices.collect()}
    assert va == vb


def test_layout_conforms_to_spec(small_graph, tmp_path):
    base = str(tmp_path / "gar")
    save_to_graphar(small_graph, base, name="g1", vertex_label="node",
                    edge_label="link", vertex_chunk_size=16,
                    edge_chunk_size=8)
    ginfo = yaml.safe_load(open(f"{base}/g1.graph.yaml"))
    assert ginfo["version"] == "gar/v1"
    assert ginfo["vertices"] == ["node.vertex.yaml"]
    assert ginfo["edges"] == ["node_link_node.edge.yaml"]
    vinfo = yaml.safe_load(open(f"{base}/node.vertex.yaml"))
    assert vinfo["chunk_size"] == 16
    pg = vinfo["property_groups"][0]
    assert pg["file_type"] == "parquet"
    assert [p["name"] for p in pg["properties"]][0] == "id"
    assert pg["properties"][0]["is_primary"] is True
    einfo = yaml.safe_load(open(f"{base}/node_link_node.edge.yaml"))
    assert einfo["adj_lists"][0]["aligned_by"] == "src"
    assert einfo["adj_lists"][0]["prefix"] == "ordered_by_source/"

    # vertex chunks: ceil(50/16)=4 files, each ≤16 rows, ordered ids
    vdir = f"{base}/vertex/node/{pg['prefix'].rstrip('/')}"
    chunks = sorted(glob.glob(f"{vdir}/chunk*"),
                    key=lambda p: int(p.rsplit("chunk", 1)[1]))
    assert len(chunks) == 4
    assert int(open(f"{base}/vertex/node/vertex_count").read()) == 50
    import pyarrow.parquet as pq
    sizes = [pq.read_table(c).num_rows for c in chunks]
    assert sizes == [16, 16, 16, 2]

    # adj list: parts aligned to src vertex chunks, edge chunks ≤8 rows,
    # sorted by (src, dst), src indices within the part's range
    edir = f"{base}/edge/node_link_node/ordered_by_source"
    for part_dir in glob.glob(f"{edir}/adj_list/part*"):
        pidx = int(os.path.basename(part_dir)[len("part"):])
        rows = []
        for c in sorted(glob.glob(f"{part_dir}/chunk*"),
                        key=lambda p: int(p.rsplit("chunk", 1)[1])):
            t = pq.read_table(c)
            assert t.num_rows <= 8
            assert t.column_names == [SRC_INDEX_COL, DST_INDEX_COL]
            rows.append(t.to_pandas())
        import pandas as pd
        part = pd.concat(rows, ignore_index=True)
        assert (part[SRC_INDEX_COL] // 16 == pidx).all()
        key = part[SRC_INDEX_COL] * 1000 + part[DST_INDEX_COL]
        assert key.is_monotonic_increasing
        ecount = int(open(f"{edir}/edge_count{pidx}").read())
        assert ecount == len(part)
        # offsets are the part's CSR indptr
        off = pq.read_table(f"{edir}/offset/chunk{pidx}").to_pandas()
        assert off.columns.tolist() == [OFFSET_COL]
        offs = off[OFFSET_COL].to_numpy()
        assert offs[0] == 0 and offs[-1] == len(part)
        lo = pidx * 16
        degs = np.diff(offs)
        counted = part.groupby(SRC_INDEX_COL).size()
        for local in range(degs.size):
            assert degs[local] == counted.get(lo + local, 0)


def test_reloaded_graph_runs_pagerank(small_graph, spark, tmp_path):
    from graphscope_spark.algorithms import pagerank

    uri = save_to_graphar(small_graph, str(tmp_path / "gar2"),
                          vertex_chunk_size=16, edge_chunk_size=16)
    g2 = load_from_graphar(spark, uri, num_partitions=4)
    r1 = {r.id: r.rank for r in pagerank(small_graph, max_iter=5)
          .state.collect()}
    r2 = {r.id: r.rank for r in pagerank(g2, max_iter=5).state.collect()}
    assert set(r1) == set(r2)
    assert all(abs(r1[k] - r2[k]) < 1e-12 for k in r1)


def test_undirected_roundtrip(spark, tmp_path):
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3)], "src long, dst long")
    g = Graph(edges, directed=False, num_partitions=2)
    uri = save_to_graphar(g, str(tmp_path / "garu"), vertex_chunk_size=4,
                          edge_chunk_size=4)
    g2 = load_from_graphar(spark, uri, num_partitions=2)
    assert g2.directed is False
    a = {(r.src, r.dst) for r in g.edges.collect()}
    b = {(r.src, r.dst) for r in g2.edges.collect()}
    assert a == b


def test_empty_graph(spark, tmp_path):
    g = Graph(spark.createDataFrame([], "src long, dst long"),
              num_partitions=2)
    uri = save_to_graphar(g, str(tmp_path / "gare"), vertex_chunk_size=4)
    g2 = load_from_graphar(spark, uri, num_partitions=2)
    assert g2.edges.count() == 0 and g2.vertices.count() == 0
