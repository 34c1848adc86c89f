"""GraphAr v1 on-disk LAYOUT conformance — pins the archive against the
format the reference documents (docs/storage_engine/graphar.md: yaml file
naming `<name>.graph.yml` / `<label>.vertex.yml` /
`<src>_<edge>_<dst>.edge.yml`, chunked data files, CSR offsets for
ordered_by_source) and the save_to surface its unittest exercises
(python/graphscope/tests/unittest/test_graphar.py:35-58: parquet file
type, vertex/edge chunk sizes, `graphar+file://...graph.yaml` URI).

The roundtrip gate (`graphar_roundtrip`) proves the archive loses
nothing; THIS file proves the bytes on disk are the spec's bytes — yaml
metadata fields, chunk naming and sizing, offset chunk shape — so a
conforming external GraphAr reader could consume the archive."""

import glob
import os

import pytest
import yaml
from pyspark.sql import functions as F

import pyarrow.parquet as pq

from graphscope_spark.graph import Graph
from graphscope_spark.sources.graphar import (
    DST_INDEX_COL, OFFSET_COL, SRC_INDEX_COL, VERSION,
    load_from_graphar, save_to_graphar,
)

VCS = 64    # small chunks so the layout is exercised with MANY chunks
ECS = 128


@pytest.fixture(scope="module")
def archive(spark, tmp_path_factory):
    e = spark.range(4000).select(
        F.pmod(F.xxhash64("id"), F.lit(300)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(300)).alias("dst"))
    g = Graph(e, directed=True, num_partitions=4)
    root = str(tmp_path_factory.mktemp("gar") / "arch")
    uri = save_to_graphar(g, root, name="conf", vertex_label="node",
                          edge_label="link", vertex_chunk_size=VCS,
                          edge_chunk_size=ECS)
    return g, root, uri


def test_uri_and_yaml_naming(archive):
    g, root, uri = archive
    assert uri == f"graphar+file://{root}/conf.graph.yaml"
    assert os.path.exists(os.path.join(root, "conf.graph.yaml"))
    assert os.path.exists(os.path.join(root, "node.vertex.yaml"))
    assert os.path.exists(os.path.join(root, "node_link_node.edge.yaml"))


def test_graph_yaml_fields(archive):
    _, root, _ = archive
    ginfo = yaml.safe_load(open(os.path.join(root, "conf.graph.yaml")))
    assert ginfo["name"] == "conf"
    assert ginfo["prefix"].rstrip("/") == root
    assert ginfo["vertices"] == ["node.vertex.yaml"]
    assert ginfo["edges"] == ["node_link_node.edge.yaml"]
    assert ginfo["version"] == VERSION == "gar/v1"


def test_vertex_yaml_fields_and_chunks(archive):
    g, root, _ = archive
    vinfo = yaml.safe_load(open(os.path.join(root, "node.vertex.yaml")))
    assert vinfo["label"] == "node"
    assert vinfo["chunk_size"] == VCS
    assert vinfo["prefix"] == "vertex/node/"
    assert vinfo["version"] == VERSION
    (pg,) = vinfo["property_groups"]
    assert pg["file_type"] == "parquet"
    names = [p["name"] for p in pg["properties"]]
    assert names[0] == "id"
    (pk,) = [p for p in pg["properties"] if p["is_primary"]]
    assert pk["name"] == "id" and pk["data_type"] == "int64"

    vdir = os.path.join(root, "vertex", "node")
    n = int(open(os.path.join(vdir, "vertex_count")).read())
    assert n == g.num_vertices
    cdir = os.path.join(vdir, pg["prefix"].rstrip("/"))
    chunks = sorted(glob.glob(os.path.join(cdir, "chunk*")),
                    key=lambda p: int(p.rsplit("chunk", 1)[1]))
    # contiguous chunk<i> naming, all full except the last, and the
    # internal index == dense ascending-id order across the chunk files
    assert [int(c.rsplit("chunk", 1)[1]) for c in chunks] == list(
        range(len(chunks)))
    assert len(chunks) == -(-n // VCS)
    all_ids = []
    for i, c in enumerate(chunks):
        t = pq.read_table(c)
        assert len(t) == (VCS if i < len(chunks) - 1 else n - VCS * i)
        all_ids.extend(t.column("id").to_pylist())
    assert all_ids == sorted(all_ids)
    assert len(all_ids) == n


def test_edge_yaml_fields(archive):
    g, root, _ = archive
    einfo = yaml.safe_load(open(
        os.path.join(root, "node_link_node.edge.yaml")))
    assert (einfo["src_label"], einfo["edge_label"], einfo["dst_label"]) \
        == ("node", "link", "node")
    assert einfo["chunk_size"] == ECS
    assert einfo["src_chunk_size"] == einfo["dst_chunk_size"] == VCS
    assert einfo["directed"] is True
    assert einfo["prefix"] == "edge/node_link_node/"
    (al,) = einfo["adj_lists"]
    assert al["ordered"] is True and al["aligned_by"] == "src"
    assert al["file_type"] == "parquet"
    assert al["prefix"] == "ordered_by_source/"
    assert einfo["version"] == VERSION


def test_adj_list_chunking_and_order(archive):
    g, root, _ = archive
    edir = os.path.join(root, "edge", "node_link_node",
                        "ordered_by_source")
    n = int(open(os.path.join(edir, "vertex_count")).read())
    assert n == g.num_vertices
    n_parts = -(-n // VCS)
    total = 0
    for i in range(n_parts):
        pdir = os.path.join(edir, "adj_list", f"part{i}")
        declared = int(open(os.path.join(edir, f"edge_count{i}")).read())
        rows = []
        if os.path.isdir(pdir):
            chunks = sorted(glob.glob(os.path.join(pdir, "chunk*")),
                            key=lambda p: int(p.rsplit("chunk", 1)[1]))
            assert [int(c.rsplit("chunk", 1)[1]) for c in chunks] == list(
                range(len(chunks)))
            for j, c in enumerate(chunks):
                t = pq.read_table(c)
                assert set(t.column_names) >= {SRC_INDEX_COL, DST_INDEX_COL}
                assert len(t) <= ECS
                if j < len(chunks) - 1:
                    assert len(t) == ECS  # only the tail chunk is short
                rows.extend(zip(t.column(SRC_INDEX_COL).to_pylist(),
                                t.column(DST_INDEX_COL).to_pylist()))
        assert len(rows) == declared
        total += len(rows)
        # part i holds exactly src chunk i's edges, (src, dst)-sorted
        assert rows == sorted(rows)
        for s, _ in rows:
            assert i * VCS <= s < (i + 1) * VCS
    assert total == g.num_edges


def test_offset_chunks_are_csr_indptr(archive):
    g, root, _ = archive
    edir = os.path.join(root, "edge", "node_link_node",
                        "ordered_by_source")
    n = g.num_vertices
    n_parts = -(-n // VCS)
    # true per-src-index degree from the graph itself
    spark = g.spark
    vimap = {r["id"]: i for i, r in enumerate(
        sorted(g.vertices.select("id").collect(), key=lambda r: r["id"]))}
    deg = {vimap[r["src"]]: r["c"] for r in
           g.out_edges.groupBy("src").agg(
               F.count(F.lit(1)).alias("c")).collect()}
    for i in range(n_parts):
        c = os.path.join(edir, "offset", f"chunk{i}")
        assert os.path.exists(c)  # EVERY vertex chunk gets an offset file
        t = pq.read_table(c)
        assert t.column_names == [OFFSET_COL]
        offs = t.column(OFFSET_COL).to_pylist()
        size = min(VCS, n - i * VCS)
        assert len(offs) == size + 1  # CSR indptr shape
        assert offs[0] == 0
        assert offs == sorted(offs)  # monotone
        declared = int(open(os.path.join(edir, f"edge_count{i}")).read())
        assert offs[-1] == declared
        for k in range(size):
            assert offs[k + 1] - offs[k] == deg.get(i * VCS + k, 0)


def test_roundtrip_preserves_edges(archive, spark):
    g, _, uri = archive
    g2 = load_from_graphar(spark, uri)
    a = sorted((r["src"], r["dst"]) for r in
               g.out_edges.select("src", "dst").collect())
    b = sorted((r["src"], r["dst"]) for r in
               g2.out_edges.select("src", "dst").collect())
    assert a == b
