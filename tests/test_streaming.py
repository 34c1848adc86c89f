"""Structured-Streaming module tests: incremental WCC (batch-fold + real
file-source stream), event-time windowed degree, applyInPandasWithState
running degree — each against batch/python oracles."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from graphscope_spark.streaming import (
    IncrementalWCC,
    edge_stream,
    merge_components,
    running_degree_stateful,
    windowed_degree,
)
from tests.oracles import make_test_graph, oracle_wcc


@pytest.fixture(scope="module")
def data():
    return make_test_graph()


def _chunks(edges, k):
    return [edges[i::k] for i in range(k)]


def test_merge_components_incremental_equals_batch(spark, data):
    vertices, edges = data
    want = oracle_wcc(edges, vertices)
    comps = None
    for chunk in _chunks(edges, 4):
        batch = spark.createDataFrame(chunk, "src long, dst long")
        comps = merge_components(comps, batch)
    got = {r["id"]: r["comp"] for r in comps.collect()}
    # isolated vertices never appear in an edge stream; compare edge-touched
    touched = {v for e in edges for v in e}
    assert got == {v: want[v] for v in touched}


def test_merge_components_batch_order_invariant(spark, data):
    vertices, edges = data
    outs = []
    for k in (2, 7):
        comps = None
        for chunk in _chunks(edges, k):
            comps = merge_components(
                comps, spark.createDataFrame(chunk, "src long, dst long")
            )
        outs.append({r["id"]: r["comp"] for r in comps.collect()})
    assert outs[0] == outs[1]


def test_incremental_wcc_file_stream(spark, data, tmp_path):
    vertices, edges = data
    want = oracle_wcc(edges, vertices)
    src_dir = str(tmp_path / "edges")
    os.makedirs(src_dir)
    base = dt.datetime(2026, 1, 1)
    for i, chunk in enumerate(_chunks(edges, 3)):
        rows = [(s, d, base + dt.timedelta(minutes=i)) for s, d in chunk]
        spark.createDataFrame(rows, "src long, dst long, ts timestamp").coalesce(
            1
        ).write.parquet(f"{src_dir}/batch={i}")
    stream = edge_stream(spark, f"{src_dir}/batch=*")
    inc = IncrementalWCC()
    q = (
        stream.writeStream.foreachBatch(inc)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert inc.batches >= 1
    got = {r["id"]: r["comp"] for r in inc.components.collect()}
    touched = {v for e in edges for v in e}
    assert got == {v: want[v] for v in touched}


def test_windowed_degree(spark, tmp_path):
    base = dt.datetime(2026, 1, 1)
    rows = [
        (1, 2, base),
        (1, 3, base + dt.timedelta(seconds=30)),
        (2, 3, base + dt.timedelta(minutes=1, seconds=10)),
    ]
    src_dir = str(tmp_path / "e")
    spark.createDataFrame(rows, "src long, dst long, ts timestamp").write.parquet(
        src_dir
    )
    stream = edge_stream(spark, src_dir)
    q = (
        windowed_degree(stream, "1 minute", "2 minutes")
        .writeStream.format("memory")
        .queryName("wdeg")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["window_start"], r["id"]): r["degree"]
        for r in spark.sql("select * from wdeg").collect()
    }
    w0, w1 = base, base + dt.timedelta(minutes=1)
    assert got == {
        (w0, 1): 2, (w0, 2): 1, (w0, 3): 1,
        (w1, 2): 1, (w1, 3): 1,
    }


def test_running_degree_stateful(spark, data, tmp_path):
    _, edges = data
    src_dir = str(tmp_path / "e")
    for i, chunk in enumerate(_chunks(edges, 2)):
        spark.createDataFrame(chunk, "src long, dst long").coalesce(1).write.parquet(
            f"{src_dir}/batch={i}"
        )
    stream = edge_stream(spark, f"{src_dir}/batch=*", schema="src long, dst long")
    q = (
        running_degree_stateful(stream)
        .writeStream.format("memory")
        .queryName("rdeg")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # memory sink in update mode appends every update; last one per id wins
    pdf = spark.sql("select * from rdeg").toPandas()
    got = pdf.groupby("id")["total"].max().to_dict()
    want = {}
    for s, d in edges:
        want[s] = want.get(s, 0) + 1
        want[d] = want.get(d, 0) + 1
    assert got == want


def test_merge_triangles_incremental_equals_batch(spark):
    import random
    from graphscope_spark.streaming.incremental import (
        IncrementalTriangles, merge_triangles,
    )
    from graphscope_spark.algorithms.triangles import triangle_count
    from graphscope_spark.graph import Graph

    rng = random.Random(44)
    n = 30
    und = set()
    while len(und) < 90:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            und.add((min(u, v), max(u, v)))
    rows = sorted(und)
    # 4 chained batches, with one duplicated edge to prove idempotence
    chunks = [rows[0:25], rows[25:50], rows[50:70], rows[70:] + rows[0:1]]
    sink = IncrementalTriangles(num_partitions=4)
    prefix = []
    for i, ch in enumerate(chunks):
        sink(spark.createDataFrame(ch, "src long, dst long"), i)
        prefix.extend([e for e in ch if e not in prefix])
        e = spark.createDataFrame(prefix, "src long, dst long")
        g = Graph(e, directed=False, num_partitions=4)
        assert sink.count == triangle_count(g), f"batch {i}"
    # replaying an entire batch is a no-op
    adj, cnt = merge_triangles(
        sink.adj, sink.count,
        spark.createDataFrame(chunks[1], "src long, dst long"), 4,
    )
    assert cnt == sink.count


def test_merge_pagerank_warm_start_matches_and_reconverges_fast(spark):
    import numpy as np
    from graphscope_spark.algorithms.pagerank import pagerank
    from graphscope_spark.graph import Graph
    from graphscope_spark.streaming.incremental import merge_pagerank

    # a 40-vertex ring with chords; the last batch is a SMALL perturbation
    # (2 edges) so warm-start reconvergence must beat the cold solve
    ring = [(i, (i + 1) % 40) for i in range(40)]
    chords = [(i, (i * 7 + 3) % 40) for i in range(0, 40, 4)]
    all_edges = [e for e in ring + chords if e[0] != e[1]]
    b1, b2, b3 = all_edges[:25], all_edges[25:-2], all_edges[-2:]

    edges = ranks = None
    rounds = []
    # the 4th batch replays two ALREADY-INGESTED edges: the graph is
    # unchanged, so the warm start sits at the previous fixpoint
    for b in (b1, b2, b3, all_edges[:2]):
        bdf = spark.createDataFrame(b, ["src", "dst"])
        edges, ranks, r = merge_pagerank(
            edges, ranks, bdf, tol=1e-6, num_partitions=4
        )
        rounds.append(r)

    # same fixpoint as a from-scratch tolerance solve on everything
    g = Graph(spark.createDataFrame(all_edges, ["src", "dst"]),
              directed=True, num_partitions=4)
    cold = pagerank(g, tol=1e-6, max_iter=100)
    got = {r.id: r.rank for r in ranks.collect()}
    want = {r.id: r.rank for r in cold.state.collect()}
    assert set(got) == set(want)
    assert np.allclose(
        [got[k] for k in sorted(got)], [want[k] for k in sorted(want)],
        atol=1e-5,
    )
    # IncEval property: a zero-perturbation batch reconverges from the
    # warm start almost immediately, while the cold solve needs many
    # rounds from uniform init
    assert rounds[-1] <= 3 < cold.rounds
    # mass invariant survives warm starts
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_merge_sssp_matches_cold_solve_and_reconverges_fast(spark):
    from graphscope_spark.algorithms.sssp import sssp
    from graphscope_spark.graph import Graph
    from graphscope_spark.streaming.incremental import merge_sssp

    # weighted chain 0→1→…→19 with shortcut chords; the last batch is a
    # SHORTCUT near the source that improves a long suffix of distances
    chain = [(i, i + 1, 3.0) for i in range(19)]
    chords = [(i, i + 4, 5.0) for i in range(0, 16, 5)]
    shortcut = [(0, 10, 1.0)]
    all_edges = chain + chords + shortcut
    b1, b2, b3 = chain[:12], chain[12:] + chords, shortcut

    edges = dists = None
    rounds = []
    for b in (b1, b2, b3, b2[:2]):  # 4th batch replays ingested edges
        bdf = spark.createDataFrame(b, "src long, dst long, w double")
        edges, dists, r = merge_sssp(edges, dists, bdf, source=0,
                                     num_partitions=4)
        rounds.append(r)

    g = Graph(spark.createDataFrame(all_edges, "src long, dst long, w double"),
              directed=True, num_partitions=4)
    cold = sssp(g, 0, weight_col="w")
    got = {r.id: r.dist for r in dists.collect()}
    want = {r.id: r.dist for r in cold.state.collect()}
    assert got == want  # exact: relaxation adds are order-free float mins
    # the shortcut batch re-relaxed only the improved suffix; the replay
    # batch found an empty improvement frontier and stopped immediately
    assert rounds[-1] <= 2 < cold.rounds
    # the shortcut genuinely improved distances (guards the fixture):
    # 0→10 shortcut (1) + 10→14 chord (5) + 14→15 (3) + 15→19 chord (5)
    assert want[19] == 14.0


def test_merge_sssp_late_arriving_source(spark):
    """The source vertex only appears in the SECOND batch — the warm
    start must still pin it to 0 and solve outward."""
    from graphscope_spark.algorithms.sssp import sssp
    from graphscope_spark.graph import Graph
    from graphscope_spark.streaming.incremental import merge_sssp

    b1 = [(5, 6, 1.0), (6, 7, 1.0)]
    b2 = [(0, 5, 2.0)]
    edges = dists = None
    for b in (b1, b2):
        bdf = spark.createDataFrame(b, "src long, dst long, w double")
        edges, dists, _ = merge_sssp(edges, dists, bdf, source=0,
                                     num_partitions=2)
    g = Graph(spark.createDataFrame(b1 + b2, "src long, dst long, w double"),
              directed=True, num_partitions=2)
    want = {r.id: r.dist for r in sssp(g, 0, weight_col="w").state.collect()}
    got = {r.id: r.dist for r in dists.collect()}
    assert got == want == {0: 0.0, 5: 2.0, 6: 3.0, 7: 4.0}


def test_incremental_sssp_file_stream(spark, tmp_path):
    import pyspark.sql.functions as SF
    from graphscope_spark.algorithms.sssp import sssp
    from graphscope_spark.graph import Graph
    from graphscope_spark.streaming import IncrementalSSSP, edge_stream

    rows = [(i, j, float((i + j) % 5 + 1))
            for i in range(12) for j in range(12) if (i * 7 + j) % 9 == 0
            and i != j]
    srcdir = tmp_path / "edges-in"
    srcdir.mkdir()
    for k in range(3):
        chunk = [r for n, r in enumerate(rows) if n % 3 == k]
        spark.createDataFrame(chunk, "src long, dst long, w double") \
            .coalesce(1).write.mode("overwrite") \
            .parquet(str(srcdir / f"b{k}"))
    # register each batch dir as its own file in one stream source dir
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    import shutil
    for k in range(3):
        src = next((srcdir / f"b{k}").glob("part-*.parquet"))
        shutil.copy(src, stream_dir / f"{k}.parquet")

    inc = IncrementalSSSP(source=0, num_partitions=4)
    q = (edge_stream(spark, str(stream_dir),
                     schema="src long, dst long, w double")
         .writeStream.foreachBatch(inc)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    assert inc.batches >= 1

    g = Graph(spark.createDataFrame(rows, "src long, dst long, w double"),
              directed=True, num_partitions=4)
    want = {r.id: r.dist for r in sssp(g, 0, weight_col="w").state.collect()}
    got = {r.id: r.dist for r in inc.dists.collect()}
    assert got == want
