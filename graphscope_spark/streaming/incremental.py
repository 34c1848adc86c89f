"""Structured-Streaming graph maintenance.

The reference engine is batch-only (SURVEY.md §2.9: no streaming surface);
its incremental story is GRAPE's PIE IncEval — re-evaluate from the
previous fixpoint when the graph changes (the paper's core contribution:
"Parallelizing Sequential Graph Computations", SIGMOD'17). This module is
the Spark-native extension of that idea to continuous ingestion:

  * ``edge_stream``         — file-source readStream of edge batches
  * ``merge_components``    — IncEval for WCC: fold a batch of NEW edges
                              into an existing component assignment by
                              contracting to the component graph first
  * ``IncrementalWCC``      — foreachBatch driver holding the assignment
  * ``windowed_degree``     — event-time windowed degree (watermark + late
                              data handled by the built-in state store)
  * ``running_degree_stateful`` — custom stateful operator via
                              applyInPandasWithState (Arrow-batched)

Scale notes. merge_components never re-touches settled structure: the
per-batch work is O(|batch|) to map endpoints (one join against the
hash-partitioned assignment) + a min-label fixpoint on the CONTRACTED
graph, whose size is #(components bridged this batch), not #vertices —
the IncEval work-proportional-to-change property. State (the assignment)
is localCheckpoint'd per batch so lineage never grows across batches; on
a cluster the same call writes to the checkpoint FS.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from graphscope_spark.graph import Graph


def edge_stream(
    spark: SparkSession,
    path: str,
    schema: str | StructType = "src long, dst long, ts timestamp",
    fmt: str = "parquet",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source edge stream: each file dropped into ``path`` becomes
    (part of) a micro-batch. The schema must be supplied — streaming
    sources do not infer (Spark structured-streaming contract)."""
    return (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )


def merge_components(
    comps: DataFrame | None, new_edges: DataFrame, max_iter: int = 50
) -> DataFrame:
    """Fold a batch of new edges into a component assignment (id, comp).

    Invariant: ``comp`` = min vertex id of the component (the same label
    WCC converges to — wcc_projected.h:76-81 init + min-exchange). Merging
    preserves it: the contracted fixpoint takes mins of mins.

    Plan shape per batch:
      1. endpoints → current comp (left join; unseen vertex = own id)
      2. contracted edges (comp_src ≠ comp_dst), distinct — size is the
         number of component-bridging pairs, NOT the batch size
      3. min-label fixpoint over the contracted graph (wcc on a Graph of
         component ids — frontier-proportional shuffles)
      4. remap: assignment rows whose comp was relabeled + new vertices
    """
    from graphscope_spark.algorithms.wcc import wcc

    verts = (
        new_edges.select(F.col("src").alias("id"))
        .union(new_edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    if comps is None:
        comps = verts.select("id", F.col("id").alias("comp")).limit(0)

    # 1-2. map endpoints through the current assignment, contract
    cmap = comps.select("id", "comp")
    e = (
        new_edges.select("src", "dst")
        .join(cmap.withColumnRenamed("id", "src").withColumnRenamed("comp", "csrc"),
              "src", "left")
        .join(cmap.withColumnRenamed("id", "dst").withColumnRenamed("comp", "cdst"),
              "dst", "left")
        .select(
            F.coalesce("csrc", "src").alias("src"),
            F.coalesce("cdst", "dst").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )

    # new vertices enter with their own id as component
    newv = verts.join(cmap, "id", "left_anti").select(
        "id", F.col("id").alias("comp")
    )
    base = cmap.unionByName(newv)

    if e.isEmpty():
        merged = base
    else:
        # 3. fixpoint on the contracted graph
        spark = new_edges.sparkSession
        parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        cg = Graph(e, directed=True, num_partitions=parts)
        relabel = (
            wcc(cg, max_iter=max_iter).state
            .select(F.col("id").alias("comp"), F.col("comp").alias("new_comp"))
        )
        cg.unpersist()
        # 4. remap the full assignment through the (small) relabel table
        merged = (
            base.join(relabel, "comp", "left")
            .select("id", F.coalesce("new_comp", "comp").alias("comp"))
        )
    # truncate lineage so batch k+1 doesn't re-analyze batches 1..k
    return merged.localCheckpoint(eager=True)


class IncrementalWCC:
    """foreachBatch driver maintaining a WCC assignment across micro-batches.

    Usage::

        inc = IncrementalWCC()
        q = (edge_stream(spark, dir).writeStream
             .foreachBatch(inc)                # callable (df, batch_id)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(); inc.components  # (id, comp)
    """

    def __init__(self, max_iter: int = 50):
        self.components: DataFrame | None = None
        self.max_iter = max_iter
        self.batches = 0

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        prev = self.components
        self.components = merge_components(
            prev, batch_df.select("src", "dst"), self.max_iter
        )
        if prev is not None:
            prev.unpersist()
        self.batches += 1


def windowed_degree(
    stream: DataFrame,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Event-time windowed degree per vertex: both endpoints count, late
    rows beyond the watermark are dropped by the state store (the
    standard watermark + windowed-agg pattern). Output mode `update` or
    `append` (after watermark close)."""
    ends = stream.select(F.col("src").alias("id"), ts_col).union(
        stream.select(F.col("dst").alias("id"), ts_col)
    )
    return (
        ends.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration).alias("w"), "id")
        .agg(F.count(F.lit(1)).alias("degree"))
        .select(F.col("w.start").alias("window_start"), "id", "degree")
    )


_DEG_STATE = "total long"
_DEG_OUT = "id long, total long"


def _running_degree_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState update fn: accumulate per-vertex degree
    across batches. Arrow-batched — the whole group's rows arrive as
    pandas frames, no per-row Python."""
    total = state.get[0] if state.exists else 0
    for pdf in pdfs:
        total += len(pdf)
    state.update((total,))
    yield pd.DataFrame({"id": [key[0]], "total": [total]})


def running_degree_stateful(stream: DataFrame) -> DataFrame:
    """Custom stateful operator: running degree per vertex via
    applyInPandasWithState (GroupState + Arrow batches) — the template for
    reference-style custom incremental operators that windowed aggs can't
    express (e.g. per-vertex monotone fixpoints over a stream)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    ends = stream.select(F.col("src").alias("id")).union(
        stream.select(F.col("dst").alias("id"))
    )
    return ends.groupBy("id").applyInPandasWithState(
        _running_degree_fn,
        outputStructType=_DEG_OUT,
        stateStructType=_DEG_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def merge_triangles(
    adj: DataFrame | None,
    count_so_far: int,
    batch: DataFrame,
    num_partitions: int = 8,
) -> tuple[DataFrame, int]:
    """IncEval for triangle counting: fold a batch of NEW undirected edges
    into a running global triangle count.

    Every triangle gained by the batch contains ≥1 new edge, so the delta
    decomposes by how many of its edges are new (inclusion categories,
    counted without re-touching old-old-old triangles):

      Δ = |{(u,v) new: w adj-old u ∧ w adj-old v}|   (1 new edge)
        + |{(u,v) new, (v,w) new: w adj-old u}|       (2 new edges)
        + triangles(new edges alone)                   (3 new edges)

    computed as three wedge joins against the OLD adjacency / the batch —
    per-batch work is O(|batch| · deg), never a recount of the settled
    graph (the PIE IncEval property). Returns the updated canonical
    adjacency (localCheckpoint'd — flat lineage across batches) and the
    new global count. ``adj=None`` starts empty. Batch edges are
    canonicalized + deduped against the existing adjacency first, so
    replays/duplicates are no-ops.
    """
    spark = batch.sparkSession
    canon_new = (
        batch.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    if adj is None:
        adj = spark.createDataFrame([], "u long, v long") \
            .repartition(num_partitions, "u")
    new = canon_new.join(adj, ["u", "v"], "left_anti") \
        .localCheckpoint(eager=True)

    # symmetric views for wedge joins
    def sym(df):
        return df.select("u", "v").union(
            df.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )

    old_s = sym(adj)
    new_s = sym(new)

    # 1 new edge: old wedge closed by the new edge
    a = old_s.select(F.col("u").alias("x"), F.col("v").alias("w"))
    b = old_s.select(F.col("u").alias("y"), F.col("v").alias("w"))
    d1 = (
        new.join(a.withColumnRenamed("x", "u"), "u")
        .join(b.withColumnRenamed("y", "v"), ["v", "w"])
        .count()
    )
    # 2 new edges sharing vertex v, closed by an old edge (u, w). Count
    # each unordered new-pair once: u < w over the symmetric new view.
    d2 = (
        new_s.select(F.col("u").alias("a1"), F.col("v").alias("mid"))
        .join(
            new_s.select(F.col("u").alias("mid"), F.col("v").alias("b1")),
            "mid",
        )
        .filter(F.col("a1") < F.col("b1"))
        .join(
            old_s.select(F.col("u").alias("a1"), F.col("v").alias("b1")),
            ["a1", "b1"],
            "left_semi",
        )
        .count()
    )
    # 3 new edges: triangles within the batch alone (degree-ordered canon:
    # u<v<w via two joins on the canonical new set)
    d3 = (
        new.select(F.col("u").alias("a1"), F.col("v").alias("b1"))
        .join(new.select(F.col("u").alias("b1"), F.col("v").alias("c1")), "b1")
        .join(
            new.select(F.col("u").alias("a1"), F.col("v").alias("c1")),
            ["a1", "c1"],
            "left_semi",
        )
        .count()
    )
    merged = (
        adj.union(new)
        .repartition(num_partitions, "u")
        .localCheckpoint(eager=True)
    )
    adj.unpersist()
    return merged, count_so_far + int(d1) + int(d2) + int(d3)


class IncrementalTriangles:
    """foreachBatch sink maintaining a global triangle count over an edge
    stream — pair with :func:`edge_stream`. ``.count`` after each batch
    equals a from-scratch recount of everything ingested (pytest-verified
    equivalence in tests/test_streaming.py)."""

    def __init__(self, num_partitions: int = 8):
        self.adj: DataFrame | None = None
        self.count = 0
        self.num_partitions = num_partitions

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        self.adj, self.count = merge_triangles(
            self.adj, self.count, batch_df, self.num_partitions
        )


def merge_pagerank(
    edges: DataFrame | None,
    ranks: DataFrame | None,
    batch: DataFrame,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    num_partitions: int = 8,
) -> tuple[DataFrame, DataFrame, int]:
    """IncEval for PageRank: fold a batch of new directed edges into the
    edge set, then re-run the tolerance power iteration WARM-STARTED from
    the previous ranks (pagerank(init_state=...)). The fixpoint is
    init-independent, so the maintained ranks equal a from-scratch solve
    at the same tolerance; the IncEval win is rounds-to-reconverge
    tracking the perturbation (a small batch near an old fixpoint
    converges in a handful of rounds). Returns (edges, ranks, rounds)."""
    from graphscope_spark.algorithms.pagerank import pagerank

    spark = batch.sparkSession
    new = batch.select("src", "dst").filter(
        F.col("src") != F.col("dst")
    ).distinct()
    if edges is None:
        edges = spark.createDataFrame([], "src long, dst long")
    edges = (
        edges.unionByName(new).distinct()
        .repartition(num_partitions, "src")
        .localCheckpoint(eager=True)
    )
    g = Graph(edges, directed=True, num_partitions=num_partitions)
    res = pagerank(g, alpha=alpha, tol=tol, max_iter=max_iter,
                   init_state=ranks)
    new_ranks = res.state.select("id", "rank").localCheckpoint(eager=True)
    g.unpersist()
    return edges, new_ranks, res.rounds


def merge_sssp(
    edges: DataFrame | None,
    dists: DataFrame | None,
    batch: DataFrame,
    source: int,
    weight_col: str = "w",
    num_partitions: int = 8,
    max_iter: int = 10_000,
) -> tuple[DataFrame, DataFrame, int]:
    """IncEval for SSSP under edge INSERTIONS — the canonical monotone
    incremental computation (the reference's Ingress doc,
    docs/analytical_engine/ingress.md, classifies SSSP as
    memoization-free monotone: old distances stay valid upper bounds
    when edges are added, so re-relaxing only from the new edges'
    sources reaches the new fixpoint).

    Per batch:
      1. fold the batch into the edge set (distinct, checkpoint);
      2. seed frontier = sources of the NEW edges that already have a
         finite distance (an insertion can only improve distances along
         paths that start inside the settled region);
      3. warm-start :func:`sssp` from the previous assignment with that
         frontier — per-batch relaxation work is proportional to the
         region the insertion actually improves, not |V|.

    Correctness: any vertex whose true distance decreased has a new
    shortest path through at least one inserted edge; relaxation from
    that edge's source (seeded, or itself improved by an earlier seed
    and therefore in a later frontier) reaches it — induction over the
    path's inserted edges. Returns (edges, dists, rounds)."""
    from graphscope_spark.algorithms.sssp import sssp

    spark = batch.sparkSession
    new = batch.select(
        "src", "dst", F.col(weight_col).cast("double").alias("w")
    ).distinct()
    if edges is None:
        edges = spark.createDataFrame([], "src long, dst long, w double")
    edges = (
        edges.unionByName(new).distinct()
        .repartition(num_partitions, "src")
        .localCheckpoint(eager=True)
    )
    g = Graph(edges, directed=True, num_partitions=num_partitions)
    init = None
    if dists is not None:
        seeds = new.select(F.col("src").alias("id")).distinct().select(
            "id", F.lit(True).alias("_s")
        )
        init = (
            dists.select("id", "dist")
            .join(seeds, "id", "left")
            .select(
                "id", "dist",
                (F.col("_s").isNotNull()
                 & F.col("dist").isNotNull()).alias("changed"),
            )
        )
    res = sssp(g, source, weight_col="w", max_iter=max_iter,
               init_state=init)
    new_dists = res.state.select("id", "dist").localCheckpoint(eager=True)
    g.unpersist()
    return edges, new_dists, res.rounds


class IncrementalSSSP:
    """foreachBatch sink maintaining single-source distances over a
    weighted edge stream — pair with :func:`edge_stream`. After each
    batch ``.dists`` equals a from-scratch :func:`sssp` fixpoint on
    everything ingested (monotone relaxation from valid upper bounds);
    ``.rounds_last`` exposes the reconvergence cost, which tracks the
    perturbation's reach (the IncEval property, pytest-verified)."""

    def __init__(self, source: int, weight_col: str = "w",
                 num_partitions: int = 8, max_iter: int = 10_000):
        self.edges: DataFrame | None = None
        self.dists: DataFrame | None = None
        self.source, self.weight_col = source, weight_col
        self.num_partitions, self.max_iter = num_partitions, max_iter
        self.rounds_last = 0
        self.batches = 0

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        prev = self.dists
        self.edges, self.dists, self.rounds_last = merge_sssp(
            self.edges, prev, batch_df, self.source, self.weight_col,
            self.num_partitions, self.max_iter,
        )
        if prev is not None:
            prev.unpersist()
        self.batches += 1


class IncrementalPageRank:
    """foreachBatch sink maintaining PageRank over an edge stream — pair
    with :func:`edge_stream`. After each batch ``.ranks`` matches a
    from-scratch tolerance solve on everything ingested (same fixpoint);
    ``.rounds_last`` exposes the reconvergence cost, which shrinks for
    small perturbations (the IncEval property, pytest-verified)."""

    def __init__(self, alpha: float = 0.85, tol: float = 1e-6,
                 max_iter: int = 100, num_partitions: int = 8):
        self.edges: DataFrame | None = None
        self.ranks: DataFrame | None = None
        self.alpha, self.tol, self.max_iter = alpha, tol, max_iter
        self.num_partitions = num_partitions
        self.rounds_last = 0
        self.batches = 0

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        prev = self.ranks
        self.edges, self.ranks, self.rounds_last = merge_pagerank(
            self.edges, prev, batch_df, self.alpha, self.tol,
            self.max_iter, self.num_partitions,
        )
        if prev is not None:
            prev.unpersist()
        self.batches += 1


def merge_dedup(
    index: DataFrame | None,
    pairs: DataFrame | None,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Fold a batch of NEW documents into a maintained MinHash-LSH dedup
    index. Returns (index', pairs'): index = (doc_id, band, key) bucket
    rows for every document seen; pairs = all (a, b) near-duplicate
    candidate pairs (a < b) discovered so far.

    IncEval property: per-batch work is signature computation for the
    BATCH only (one explode + one groupBy over batch shingles), then one
    join keyed by (band, key) whose probe side is only the batch's band
    rows — shuffle ∝ batch size + matched bucket population, never the
    corpus. Settled documents are never re-hashed (their text is never
    re-read; the index holds only band keys). Fold-invariance: the final
    pair set equals one-shot minhash_lsh_pairs on the full corpus for ANY
    chunking, because LSH collision is a per-pair predicate — gate
    `stream_dedup` hash-checks a 4-chunk fold against the relational
    one-shot twin.

    State is localCheckpoint'd per batch (lineage truncation, same as
    merge_components); on a cluster the index would live bucketed by
    (band, key) so the probe join is exchange-free on the index side.
    """
    from graphscope_spark.functions.dedup import lsh_band_keys

    batch = lsh_band_keys(
        new_docs, text_col, id_col, num_hashes, bands, k
    ).localCheckpoint(eager=True)

    # batch-internal pairs + batch-vs-index pairs (both sides normalized
    # a < b; the batch is the probe side — the index is never self-joined)
    b_a = batch.withColumnRenamed(id_col, "a")
    b_b = batch.withColumnRenamed(id_col, "b")
    new_pairs = (
        b_a.join(b_b, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
    )
    if index is not None:
        i_o = index.withColumnRenamed(id_col, "o")
        cross = b_a.join(i_o, ["band", "key"]).select(
            F.least("a", "o").alias("a"), F.greatest("a", "o").alias("b")
        ).filter(F.col("a") != F.col("b"))
        new_pairs = new_pairs.unionByName(cross)

    merged_pairs = new_pairs.distinct()
    if pairs is not None:
        merged_pairs = pairs.unionByName(merged_pairs).distinct()
    merged_pairs = merged_pairs.localCheckpoint(eager=True)

    merged_index = (
        batch if index is None else index.unionByName(batch)
    ).localCheckpoint(eager=True)
    return merged_index, merged_pairs


class IncrementalDedup:
    """foreachBatch driver maintaining the LSH dedup index across document
    micro-batches (usage mirrors IncrementalWCC; read `pairs` /
    `index` after the stream drains)."""

    def __init__(self, num_hashes: int = 16, bands: int = 4, k: int = 3):
        self.index: DataFrame | None = None
        self.pairs: DataFrame | None = None
        self.num_hashes, self.bands, self.k = num_hashes, bands, k
        self.batches = 0

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        prev_i, prev_p = self.index, self.pairs
        self.index, self.pairs = merge_dedup(
            prev_i, prev_p, batch_df,
            num_hashes=self.num_hashes, bands=self.bands, k=self.k,
        )
        for prev in (prev_i, prev_p):
            if prev is not None:
                prev.unpersist()
        self.batches += 1


def _hadoop_fs(spark: SparkSession, path: str):
    """Hadoop FileSystem handle for `path` (works for file://, hdfs://,
    s3a:// alike — the same FS layer every Spark writer uses)."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(hconf), jvm


class DurableIncrementalDedup(IncrementalDedup):
    """IncrementalDedup whose state (index + pairs) is written to parquet
    after every batch, so a crashed/restarted stream resumes from the
    last completed batch instead of re-hashing the corpus — the
    streaming-state counterpart of pregel.py's superstep checkpoints.

    Layout: each snapshot goes to a FRESH versioned directory
    ``{state_dir}/v{N}/{index,pairs}``; after BOTH tables commit, a
    ``_COMMIT`` marker is created in ``v{N}`` and older versions are
    pruned (the previous committed version is kept as a fallback).
    ``load`` reads the highest version carrying the marker, so a crash
    mid-write — the exact scenario the class exists for — can never
    destroy or tear the last durable copy: a half-written ``v{N}`` has
    no marker and is simply skipped, then overwritten on resume.
    On a cluster the same paths live on the checkpoint filesystem. The
    per-batch write is ∝ total state, not batch — callers with huge
    indexes should lower the cadence via ``write_every``."""

    def __init__(self, state_dir: str, write_every: int = 1, **kw):
        super().__init__(**kw)
        self.state_dir = state_dir
        self.write_every = max(1, int(write_every))
        self._version = -1

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        super().__call__(batch_df, batch_id)
        if self.batches % self.write_every == 0:
            self._snapshot(self._version + 1)

    def _snapshot(self, version: int) -> None:
        spark = self.index.sparkSession
        vdir = f"{self.state_dir}/v{version}"
        self.index.write.mode("overwrite").parquet(f"{vdir}/index")
        self.pairs.write.mode("overwrite").parquet(f"{vdir}/pairs")
        fs, jvm = _hadoop_fs(spark, vdir)
        # single manifest committing index+pairs together
        fs.create(
            jvm.org.apache.hadoop.fs.Path(f"{vdir}/_COMMIT"), True
        ).close()
        prev = self._version
        self._version = version
        # prune everything older than the previous committed version
        for n in self._versions(spark):
            if n < prev:
                fs.delete(
                    jvm.org.apache.hadoop.fs.Path(
                        f"{self.state_dir}/v{n}"
                    ),
                    True,
                )

    def _versions(self, spark: SparkSession) -> list:
        fs, jvm = _hadoop_fs(spark, self.state_dir)
        root = jvm.org.apache.hadoop.fs.Path(self.state_dir)
        if not fs.exists(root):
            return []
        out = []
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if name.startswith("v") and name[1:].isdigit() and fs.exists(
                jvm.org.apache.hadoop.fs.Path(
                    f"{self.state_dir}/{name}/_COMMIT"
                )
            ):
                out.append(int(name[1:]))
        return sorted(out)

    @classmethod
    def load(cls, spark: SparkSession, state_dir: str,
             **kw) -> "DurableIncrementalDedup":
        inc = cls(state_dir, **kw)
        committed = inc._versions(spark)
        if not committed:
            raise FileNotFoundError(
                f"no committed dedup snapshot under {state_dir}"
            )
        inc._version = committed[-1]
        vdir = f"{state_dir}/v{inc._version}"
        inc.index = spark.read.parquet(f"{vdir}/index").localCheckpoint(
            eager=True
        )
        inc.pairs = spark.read.parquet(f"{vdir}/pairs").localCheckpoint(
            eager=True
        )
        return inc
