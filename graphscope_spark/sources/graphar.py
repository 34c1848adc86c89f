"""GraphAr-format archive — interchange with the reference's save_to/load_from.

The reference archives graphs in Apache GraphAr ("gar") format:
``Graph.save_to(path, format="graphar", graphar_graph_name=...,
graphar_file_type="parquet", graphar_vertex_chunk_size=...,
graphar_edge_chunk_size=...)`` returns ``graphar+file://<path>/<name>.graph.yaml``
and ``Graph.load_from(uri)`` restores it
(python/graphscope/framework/dag_utils.py:1085-1143,
python/graphscope/tests/unittest/test_graphar.py:35-58).

This module emits/consumes the public GraphAr v1 on-disk layout
(https://graphar.apache.org, format spec "gar/v1"):

    <path>/<name>.graph.yaml               graph info
    <path>/<vlabel>.vertex.yaml            vertex info
    <path>/vertex/<vlabel>/<group>/chunk<i>        parquet, chunk_size rows
    <path>/vertex/<vlabel>/vertex_count            text int
    <path>/<src>_<elabel>_<dst>.edge.yaml  edge info
    <path>/edge/<triple>/ordered_by_source/
        adj_list/part<i>/chunk<j>          parquet (_graphAr_srcIndex/_dstIndex)
        offset/chunk<i>                    parquet (_graphAr_offset)
        vertex_count, edge_count<i>        text ints

Internal vertex index (the GraphAr "internal id") is assigned densely by
ascending primary-key order — computed with ONE range shuffle plus a
per-partition offset cumsum (P driver-side values), never a global sort
into one task. Chunk files are written by Spark with ``partitionBy`` and
renamed to the spec's ``chunk<i>`` names — the same strategy as the
upstream GraphAr Spark writer. Scale contract: one adj-list "part" holds
one src vertex chunk's edges; size ``vertex_chunk_size`` so a part fits
one task (the same per-fragment bound as csr.py).

Local filesystem paths only in this sandbox; on a cluster the renames
would go through the Hadoop FileSystem API instead of ``os``.
"""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pandas as pd
import yaml
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphscope_spark.graph import Graph

#: GraphAr GeneralParams column names (public spec constants)
SRC_INDEX_COL = "_graphAr_srcIndex"
DST_INDEX_COL = "_graphAr_dstIndex"
OFFSET_COL = "_graphAr_offset"
VERSION = "gar/v1"

_SPARK_TO_GAR = {
    "bigint": "int64", "long": "int64", "int": "int32",
    "double": "double", "float": "float", "string": "string",
    "boolean": "bool",
}
_GAR_TO_SPARK = {v: k for k, v in _SPARK_TO_GAR.items()}


def _write_text(path: str, text: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(text)


def _dense_index(df: DataFrame, key: str, num_partitions: int) -> DataFrame:
    """``(key, _vi)`` with ``_vi`` = dense 0..n-1 rank of ``key`` ascending.

    One range shuffle; per-partition counts cumsum on the driver (P
    values); offsets broadcast back. No global single-task sort."""
    spark = df.sparkSession
    parts = (
        df.select(key).distinct()
        .repartitionByRange(num_partitions, key)
        .sortWithinPartitions(key)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {r["_pid"]: r["c"] for r in
              parts.groupBy("_pid").agg(F.count("*").alias("c")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    boff = spark.sparkContext.broadcast(offsets)

    def _assign(it):
        seen = 0
        for pdf in it:
            if len(pdf) == 0:
                continue
            base = boff.value[int(pdf["_pid"].iloc[0])]
            yield pd.DataFrame({
                key: pdf[key],
                "_vi": np.arange(seen + base, seen + base + len(pdf),
                                 dtype=np.int64),
            })
            seen += len(pdf)

    out = parts.mapInPandas(_assign, f"{key} long, _vi long").persist()
    out.count()
    parts.unpersist()
    return out


def _rename_chunks(tmp_dir: str, dest_dir: str, part_col: str,
                   prefix: str) -> None:
    """Move ``<tmp>/<part_col>=<i>/part-*.parquet`` → ``<dest>/<prefix><i>``."""
    os.makedirs(dest_dir, exist_ok=True)
    for d in glob.glob(os.path.join(tmp_dir, f"{part_col}=*")):
        idx = int(d.rsplit("=", 1)[1])
        files = sorted(glob.glob(os.path.join(d, "*.parquet")))
        assert len(files) == 1, f"expected 1 file per chunk, got {files}"
        shutil.move(files[0], os.path.join(dest_dir, f"{prefix}{idx}"))
    shutil.rmtree(tmp_dir)


def save_to_graphar(
    g: Graph,
    path: str,
    name: str = "graph",
    vertex_label: str = "vertex",
    edge_label: str = "edge",
    vertex_chunk_size: int = 1 << 18,
    edge_chunk_size: int = 1 << 20,
) -> str:
    """Archive ``g`` in GraphAr v1 layout under ``path``; returns the
    ``graphar+file://...yaml`` URI (the reference's save_to contract,
    test_graphar.py:45-48)."""
    path = path.rstrip("/")
    os.makedirs(path, exist_ok=True)
    props = [c for c in g.vertices.columns if c != "id"]
    vimap = _dense_index(g.vertices, "id", g.num_partitions)
    n = vimap.count()

    # ---- vertex chunks: one property group holding id + all props ----
    group = "_".join(["id"] + props) + "/"
    n_vchunks = max(1, -(-n // vertex_chunk_size))
    vdir = os.path.join(path, "vertex", vertex_label)
    tmp = os.path.join(vdir, "_tmp_chunks")
    (
        g.vertices.join(vimap, "id")
        .withColumn("_chunk", (F.col("_vi") / vertex_chunk_size)
                    .cast("long"))
        .repartition(n_vchunks, "_chunk")
        .sortWithinPartitions("_chunk", "_vi")
        .select("id", *props, "_chunk")
        .write.mode("overwrite").partitionBy("_chunk").parquet(tmp)
    )
    _rename_chunks(tmp, os.path.join(vdir, group.rstrip("/")),
                   "_chunk", "chunk")
    _write_text(os.path.join(vdir, "vertex_count"), str(n))

    # ---- adj list ordered_by_source, partitioned by src vertex chunk ----
    triple = f"{vertex_label}_{edge_label}_{vertex_label}"
    edir = os.path.join(path, "edge", triple, "ordered_by_source")
    e = (
        g.out_edges.select("src", "dst")
        .join(vimap.select(F.col("id").alias("src"),
                           F.col("_vi").alias(SRC_INDEX_COL)), "src")
        .join(vimap.select(F.col("id").alias("dst"),
                           F.col("_vi").alias(DST_INDEX_COL)), "dst")
        .withColumn("_part", (F.col(SRC_INDEX_COL) / vertex_chunk_size)
                    .cast("long"))
        .persist()
    )
    ecs = edge_chunk_size

    def _chunked(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([SRC_INDEX_COL, DST_INDEX_COL],
                              kind="mergesort")
        pdf["_echunk"] = np.arange(len(pdf), dtype=np.int64) // ecs
        return pdf[["_part", "_echunk", SRC_INDEX_COL, DST_INDEX_COL]]

    chunked = e.select("_part", SRC_INDEX_COL, DST_INDEX_COL).groupBy(
        "_part").applyInPandas(
        _chunked,
        f"_part long, _echunk long, {SRC_INDEX_COL} long, "
        f"{DST_INDEX_COL} long",
    )
    tmp = os.path.join(edir, "_tmp_adj")
    (
        chunked.repartition(n_vchunks, "_part")
        .sortWithinPartitions("_part", "_echunk",
                              SRC_INDEX_COL, DST_INDEX_COL)
        .write.mode("overwrite").partitionBy("_part", "_echunk").parquet(tmp)
    )
    adj_dir = os.path.join(edir, "adj_list")
    os.makedirs(adj_dir, exist_ok=True)
    for pd_dir in glob.glob(os.path.join(tmp, "_part=*")):
        pidx = int(pd_dir.rsplit("=", 1)[1])
        _rename_chunks(pd_dir, os.path.join(adj_dir, f"part{pidx}"),
                       "_echunk", "chunk")
    shutil.rmtree(tmp)

    # ---- offsets: per src vertex chunk, CSR indptr over the part ----
    deg = (
        e.groupBy("_part", SRC_INDEX_COL)
        .agg(F.count("*").alias("_d"))
    )
    part_counts = {int(r["_part"]): int(r["c"]) for r in
                   e.groupBy("_part").agg(F.count("*").alias("c")).collect()}
    vcs = vertex_chunk_size
    n_total = n

    def _offsets(key, pdf: pd.DataFrame) -> pd.DataFrame:
        part = int(key[0])
        lo = part * vcs
        size = min(vcs, n_total - lo)
        degs = np.zeros(size, np.int64)
        if len(pdf):
            degs[pdf[SRC_INDEX_COL].to_numpy(np.int64) - lo] = (
                pdf["_d"].to_numpy(np.int64))
        offs = np.concatenate(([0], np.cumsum(degs)))
        return pd.DataFrame({
            "_part": np.full(offs.size, part, np.int64),
            "_pos": np.arange(offs.size, dtype=np.int64),
            OFFSET_COL: offs,
        })

    # every part must emit offsets, including edge-less ones: seed from the
    # full part range so a zero-out-degree vertex chunk still gets a file
    all_parts = g.spark.range(n_vchunks).select(
        F.col("id").alias("_part"),
        F.lit(None).cast("long").alias(SRC_INDEX_COL),
        F.lit(None).cast("long").alias("_d"),
    )
    offsets_df = (
        deg.unionByName(all_parts).filter(F.col("_part") < n_vchunks)
        .groupBy("_part")
        .applyInPandas(
            lambda key, pdf: _offsets(key, pdf.dropna(subset=[SRC_INDEX_COL])),
            f"_part long, _pos long, {OFFSET_COL} long")
    )
    tmp = os.path.join(edir, "_tmp_off")
    (
        offsets_df.repartition(n_vchunks, "_part")
        .sortWithinPartitions("_part", "_pos")
        .select("_part", OFFSET_COL)
        .write.mode("overwrite").partitionBy("_part").parquet(tmp)
    )
    _rename_chunks(tmp, os.path.join(edir, "offset"), "_part", "chunk")
    _write_text(os.path.join(edir, "vertex_count"), str(n))
    for pidx in range(n_vchunks):
        _write_text(os.path.join(edir, f"edge_count{pidx}"),
                    str(part_counts.get(pidx, 0)))
    e.unpersist()
    vimap.unpersist()

    # ---- yaml metadata ----
    vschema = dict(g.vertices.dtypes)
    vinfo = {
        "label": vertex_label,
        "chunk_size": vertex_chunk_size,
        "prefix": f"vertex/{vertex_label}/",
        "property_groups": [{
            "properties": [
                {"name": c, "data_type": _SPARK_TO_GAR.get(vschema[c],
                                                           vschema[c]),
                 "is_primary": c == "id"}
                for c in ["id"] + props
            ],
            "file_type": "parquet",
            "prefix": group,
        }],
        "version": VERSION,
    }
    einfo = {
        "src_label": vertex_label,
        "edge_label": edge_label,
        "dst_label": vertex_label,
        "chunk_size": edge_chunk_size,
        "src_chunk_size": vertex_chunk_size,
        "dst_chunk_size": vertex_chunk_size,
        "directed": bool(g.directed),
        "prefix": f"edge/{triple}/",
        "adj_lists": [{
            "ordered": True,
            "aligned_by": "src",
            "file_type": "parquet",
            "prefix": "ordered_by_source/",
        }],
        "version": VERSION,
    }
    ginfo = {
        "name": name,
        "prefix": path + "/",
        "vertices": [f"{vertex_label}.vertex.yaml"],
        "edges": [f"{triple}.edge.yaml"],
        "version": VERSION,
    }
    _write_text(os.path.join(path, f"{vertex_label}.vertex.yaml"),
                yaml.safe_dump(vinfo, sort_keys=False))
    _write_text(os.path.join(path, f"{triple}.edge.yaml"),
                yaml.safe_dump(einfo, sort_keys=False))
    _write_text(os.path.join(path, f"{name}.graph.yaml"),
                yaml.safe_dump(ginfo, sort_keys=False))
    return f"graphar+file://{path}/{name}.graph.yaml"


def load_from_graphar(spark: SparkSession, uri: str,
                      num_partitions: int | None = None) -> Graph:
    """Restore a Graph from a GraphAr archive (URI or yaml path).

    Vertex internal indices are reconstructed POSITIONALLY — each task
    reads one ``chunk<i>`` file with pyarrow and assigns
    ``_vi = i*chunk_size + row`` — so archives written by OTHER GraphAr
    tools (whose index assignment need not be key-ascending) also load
    correctly. Adj-list internal ids then join back to primary keys."""
    yml = uri
    for pre in ("graphar+file://", "file://"):
        if yml.startswith(pre):
            yml = yml[len(pre):]
    base = os.path.dirname(yml)
    ginfo = yaml.safe_load(open(yml))
    vinfo = yaml.safe_load(open(os.path.join(base, ginfo["vertices"][0])))
    einfo = yaml.safe_load(open(os.path.join(base, ginfo["edges"][0])))

    vcs = vinfo["chunk_size"]
    pg = vinfo["property_groups"][0]
    vdir = os.path.join(base, vinfo["prefix"].rstrip("/"),
                        pg["prefix"].rstrip("/"))
    chunk_files = sorted(glob.glob(os.path.join(vdir, "chunk*")),
                         key=lambda p: int(p.rsplit("chunk", 1)[1]))
    files_df = spark.createDataFrame(
        [(p, int(p.rsplit("chunk", 1)[1])) for p in chunk_files],
        "path string, idx long",
    ).repartition(max(1, len(chunk_files)))
    cols = [p["name"] for p in pg["properties"]]
    schema_str = ", ".join(
        f"`{p['name']}` {_GAR_TO_SPARK.get(p['data_type'], p['data_type'])}"
        for p in pg["properties"]
    ) + ", _vi long"

    def _read_chunks(it):
        import pyarrow.parquet as pq
        for pdf in it:
            for row in pdf.itertuples(index=False):
                t = pq.read_table(row.path).to_pandas()
                t["_vi"] = row.idx * vcs + np.arange(len(t), dtype=np.int64)
                yield t

    vi = files_df.mapInPandas(_read_chunks, schema_str).persist()
    vertices = vi.select(*cols)
    pk = next(p["name"] for p in pg["properties"] if p.get("is_primary"))

    al = einfo["adj_lists"][0]
    edir = os.path.join(base, einfo["prefix"].rstrip("/"),
                        al["prefix"].rstrip("/"), "adj_list")
    adj = (
        spark.read.option("recursiveFileLookup", "true").parquet(edir)
        if glob.glob(os.path.join(edir, "part*", "chunk*")) else
        spark.createDataFrame([],
                              f"{SRC_INDEX_COL} long, {DST_INDEX_COL} long")
    )
    edges = (
        adj.join(vi.select(F.col("_vi").alias(SRC_INDEX_COL),
                           F.col(pk).alias("src")), SRC_INDEX_COL)
        .join(vi.select(F.col("_vi").alias(DST_INDEX_COL),
                        F.col(pk).alias("dst")), DST_INDEX_COL)
        .select("src", "dst")
    )
    directed = bool(einfo.get("directed", True))
    return Graph(edges, vertices.withColumnRenamed(pk, "id"),
                 directed=directed, num_partitions=num_partitions,
                 assume_symmetric=True)
