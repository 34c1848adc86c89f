"""Similarity search over an embedding column (array<float>).

* ann_brute_force — exact cosine top-k: the query matrix (small) is
  broadcast into a ``mapInPandas`` pass over the corpus; each Arrow batch
  does ONE numpy GEMM (batch × queries) — the vectorized-UDF slow path used
  exactly where built-ins can't express it. One shuffle (the per-query
  top-k aggregation); corpus is scanned once regardless of #queries.
* ann_lsh — scale path: random-hyperplane (sign-LSH) bucketing with a
  deterministic seed; queries probe only their bucket (multi-probe by
  flipping the lowest-confidence bits). Recall < 1 by design; tested
  against brute force.
* embedding_neardup_pairs — near-duplicate detection: all pairs with
  cosine ≥ τ via bucketed self-join (LSH) or exact within-bucket verify.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

ROUND = 6


#: hard cap on driver-collected query sets — beyond this the broadcast GEMM
#: path stops being "small side fits on the driver"; callers should switch
#: to the bucketed join path (ann_lsh / embedding_neardup_pairs).
MAX_COLLECTED_QUERIES = 100_000


def _collect_matrix(df: DataFrame, id_col: str, vec_col: str):
    rows = df.select(id_col, vec_col).limit(MAX_COLLECTED_QUERIES + 1).collect()
    if len(rows) > MAX_COLLECTED_QUERIES:
        raise ValueError(
            f"query set exceeds {MAX_COLLECTED_QUERIES} rows — the "
            "brute-force path driver-collects and broadcasts the query "
            "matrix; use ann_lsh/embedding_neardup_pairs for large sets"
        )
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return ids, mat / norms[:, None]


def ann_brute_force(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_self: bool = False,
) -> DataFrame:
    """(query_id, neighbor_id, score) — exact cosine top-k of each query
    against the corpus. ``queries`` must be small (driver-collected and
    broadcast); the corpus side streams through Arrow batches."""
    spark = corpus.sparkSession
    q_ids, q_mat = _collect_matrix(queries, id_col, vec_col)
    bc = spark.sparkContext.broadcast((q_ids, q_mat))

    def score_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids, qmat = bc.value
        for pdf in it:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            if len(mat) == 0:
                continue
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            sims = (mat / norms[:, None]) @ qmat.T  # (batch, nq) — one GEMM
            nq = len(qids)
            yield pd.DataFrame({
                "query_id": np.repeat(qids, len(ids)),
                "neighbor_id": np.tile(ids, nq),
                "score": np.round(sims.T.reshape(-1), ROUND),
            })

    scored = corpus.select(id_col, vec_col).mapInPandas(
        score_batches, "query_id long, neighbor_id long, score double"
    )
    if not include_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "score")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Deterministic Rademacher (±1) hyperplanes derived from the portable
    md5 hash — NOT numpy RNG. Sign-LSH with ±1 components is the standard
    random-projection variant (Achlioptas '01: sparse/sign projections
    preserve angles like gaussians); deriving each component from
    md5(seed|plane|j) makes the whole LSH pipeline a pure function of
    (seed, dim) that a DuckDB oracle reproduces expression-for-expression
    (doc_oracles.ann_lsh_sql)."""
    import hashlib

    w = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        for j in range(dim):
            h = int(hashlib.md5(f"{seed}|{p}|{j}".encode())
                    .hexdigest()[:15], 16)
            w[p, j] = 1.0 if h % 2 == 0 else -1.0
    return w


def lsh_bucket_ids(
    df: DataFrame,
    dim: int,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 1,
) -> DataFrame:
    """(id, table, bucket) — sign-LSH bucket per vector per hash table
    (deterministic seed). Multiple independent tables are the standard
    recall lever: a true neighbor only needs to collide in ONE table."""
    spark = df.sparkSession
    planes = np.stack([
        _hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)
    ])  # (tables, planes, dim)
    bc = spark.sparkContext.broadcast(planes)

    def bucketize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pl = bc.value
        n_t, n_p = pl.shape[0], pl.shape[1]
        weights = 1 << np.arange(n_p)
        for pdf in it:
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            if len(mat) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            frames = []
            for t in range(n_t):
                signs = (mat @ pl[t].T) > 0
                bucket = (signs * weights).sum(axis=1)
                frames.append(pd.DataFrame({
                    id_col: ids,
                    "table": np.full(len(ids), t, dtype=np.int64),
                    "bucket": bucket.astype(np.int64),
                }))
            yield pd.concat(frames, ignore_index=True)

    return df.select(id_col, vec_col).mapInPandas(
        bucketize, f"{id_col} long, table long, bucket long"
    )


def ann_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only corpus vectors colliding with the
    query in ≥1 of ``n_tables`` sign-LSH tables. At scale the bucket join
    replaces the full scan; recall is tested against ann_brute_force
    (n_planes ↓ or n_tables ↑ ⇒ recall ↑, candidates ↑)."""
    cb = lsh_bucket_ids(corpus, dim, n_planes, seed, id_col, vec_col, n_tables)
    qb = lsh_bucket_ids(queries, dim, n_planes, seed, id_col, vec_col, n_tables)
    corpus_b = corpus.join(cb, id_col)
    pairs = (
        corpus_b.withColumnRenamed(id_col, "neighbor_id")
        .withColumnRenamed(vec_col, "cvec")
        .join(
            F.broadcast(
                queries.join(qb, id_col)
                .withColumnRenamed(id_col, "query_id")
                .withColumnRenamed(vec_col, "qvec")
            ),
            ["table", "bucket"],
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "cvec", "qvec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    dot = F.aggregate(
        F.zip_with("cvec", "qvec", lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    scored = pairs.select(
        "query_id", "neighbor_id",
        F.round(dot / (norm(F.col("cvec")) * norm(F.col("qvec"))), ROUND).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "score")
    )


def embedding_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(a, b, score) — pairs with cosine ≥ threshold, candidates from a
    multi-table bucketed self-join (shuffle ∝ bucket sizes, not n²).
    Recall bounded by sign-LSH collision probability; n_planes/n_tables
    tune granularity vs candidate volume."""
    cb = lsh_bucket_ids(corpus, dim, n_planes, seed, id_col, vec_col, n_tables)
    withb = corpus.join(cb, id_col)
    a = withb.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"),
                     "table", "bucket")
    b = withb.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"),
                     "table", "bucket")
    pairs = (
        a.join(b, ["table", "bucket"]).filter(F.col("a") < F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    return (
        pairs.select(
            "a", "b",
            F.round(dot / (norm(F.col("va")) * norm(F.col("vb"))), ROUND).alias("score"),
        )
        .filter(F.col("score") >= threshold)
        .distinct()
    )


def semdedup(
    corpus: DataFrame,
    threshold: float = 0.3,
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 64,
) -> DataFrame:
    """(vec_id, cluster_id, keep) — SemDeDup-style semantic deduplication
    (Abbas et al. 2023, arXiv:2303.09540): group embeddings whose cosine
    similarity reaches ``threshold`` and keep ONE representative per
    semantic-duplicate group (min vec_id). Filtering on ``keep`` yields
    the semantically deduplicated corpus.

    The paper clusters with k-means then prunes within clusters; here the
    candidate stage is the deterministic multi-table sign-LSH bucketed
    self-join (:func:`embedding_neardup_pairs`) — same role (never
    all-pairs; shuffle ∝ bucket sizes), but a pure function of
    (seed, dim), so a DuckDB oracle reproduces the exact candidate set
    and the gate value-hash-matches (doc_oracles.semdedup_sql). Dup
    groups = connected components of the pair graph via the
    O(log n)-round hook+jump kernel — pair-graph-sized, orders of
    magnitude below the corpus."""
    from graphscope_spark.algorithms.wcc import cc_log
    from graphscope_spark.graph import Graph

    pairs = embedding_neardup_pairs(
        corpus, threshold, dim, n_planes, n_tables, seed, id_col, vec_col
    )
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    pair_graph = Graph(
        edges.localCheckpoint(eager=True),
        directed=True,  # cc_log symmetrizes
        persist=False,
    )
    comp = cc_log(pair_graph, max_iter=max_iter)
    return (
        corpus.select(F.col(id_col).alias("vec_id"))
        .join(comp.withColumnRenamed("id", "vec_id"), "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce(F.col("comp"), F.col("vec_id")).alias("cluster_id"),
            (F.coalesce(F.col("comp"), F.col("vec_id")) == F.col("vec_id"))
            .alias("keep"),
        )
    )


# --------------------------------------------------------------------- #
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# --------------------------------------------------------------------- #


def ivf_centroids(
    corpus: DataFrame,
    nlist: int = 16,
    iters: int = 5,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_cap: int = 50_000,
) -> np.ndarray:
    """Deterministic coarse quantizer: Lloyd k-means on a BOUNDED,
    hash-ordered sample (standard IVF practice — FAISS trains the
    quantizer on a sample too; at 100 TB the train set stays
    ``sample_cap`` rows no matter the corpus). Determinism: sample =
    first ``sample_cap`` rows by xxhash64(id, seed) order; init = first
    ``nlist`` of those. Returns L2-normalized (nlist, dim)."""
    rows = (
        corpus.select(vec_col)
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
        .limit(sample_cap)
        .collect()
    )
    mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    mat = mat / norms[:, None]
    cent = mat[:nlist].copy()
    for _ in range(iters):
        assign = (mat @ cent.T).argmax(axis=1)
        for c in range(nlist):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                cent[c] = v / (n or 1.0)
    return cent


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, list_id) — nearest ``nprobe`` coarse lists per vector, one
    GEMM per Arrow batch against the broadcast centroid matrix."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(centroids)

    def assign(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cent = bc.value
        for pdf in it:
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            if len(mat) == 0:
                continue
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            sims = (mat / norms[:, None]) @ cent.T
            top = np.argsort(-sims, axis=1)[:, :nprobe]
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            yield pd.DataFrame({
                id_col: np.repeat(ids, nprobe),
                "list_id": top.reshape(-1).astype(np.int64),
            })

    return df.select(id_col, vec_col).mapInPandas(
        assign, f"{id_col} long, list_id long"
    )


def ann_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    iters: int = 5,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in ONE coarse list each;
    each query probes its ``nprobe`` nearest lists and scores only those
    lists' members. Shuffle ∝ probed-list population (candidate join keyed
    by list_id), never n². nprobe = nlist ⇒ exhaustive (= brute force).
    Recall is pytest-verified against ann_brute_force."""
    cent = ivf_centroids(corpus, nlist, iters, seed, id_col, vec_col)
    ca = ivf_assign(corpus, cent, 1, id_col, vec_col)
    qa = ivf_assign(queries, cent, nprobe, id_col, vec_col)
    cand = (
        corpus.join(ca, id_col)
        .withColumnRenamed(id_col, "neighbor_id")
        .withColumnRenamed(vec_col, "cvec")
        .join(
            F.broadcast(
                queries.join(qa, id_col)
                .withColumnRenamed(id_col, "query_id")
                .withColumnRenamed(vec_col, "qvec")
            ),
            "list_id",
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    dot = F.aggregate(
        F.zip_with("cvec", "qvec", lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    scored = cand.select(
        "query_id", "neighbor_id",
        F.round(dot / (norm(F.col("cvec")) * norm(F.col("qvec"))), ROUND).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "score")
    )


def ann_ivf_exact(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 2,
    rounds: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k whose EVERY stage is oracle-verifiable: the coarse
    quantizer is the quantized integer k-means (functions/kmeans.py —
    bit-exact across engines), list assignment and query probing are
    exact integer argmin / top-nprobe, and only the final cosine re-rank
    touches floats (rounded to 6, the ann_lsh-proven parity point). The
    DuckDB twin (doc_oracles.ann_ivf_sql) replays the whole pipeline, so
    the driver hash-checks recall behavior, not just row counts — the
    verifiable counterpart of ann_ivf (whose sampled numpy trainer is
    recall-tested only).

    Scale shape: identical to ann_ivf — candidates come from a join keyed
    by cluster id (shuffle ∝ probed-list population, never n²), queries
    broadcast, one top-k window per query.
    """
    from graphscope_spark.functions.kmeans import (
        centroid_distances,
        kmeans_model,
        quantized,
    )

    assign, cent = kmeans_model(corpus, nlist, rounds, id_col, vec_col)
    qd = centroid_distances(quantized(queries, id_col, vec_col), cent)
    wq = Window.partitionBy("vec_id").orderBy("dist_u", "cid")
    probes = (
        qd.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select(F.col("vec_id").alias("query_id"), F.col("cid"))
    )
    cand = (
        assign.select(F.col("vec_id").alias("neighbor_id"), F.col("cluster").alias("cid"))
        .join(F.broadcast(probes), "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    cvec = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    qvec = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    dot = F.aggregate(
        F.zip_with("cvec", "qvec", lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    scored = (
        cand.join(cvec, "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .select(
            "query_id", "neighbor_id",
            F.round(dot / (norm(F.col("cvec")) * norm(F.col("qvec"))), ROUND)
            .alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "score")
    )


def quantize_embeddings(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, codes: array<int>, lo, span) — per-vector int8-range
    scalar quantization: code_i = round((x_i − lo) · 255 / span) ∈ [0,255]
    with lo = min(x), span = max(x) − min(x) (span 0 → all codes 0).
    4× storage reduction for ANN shortlists at 100 TB; dequantize with
    x̂_i = lo + code_i · span / 255 (max error span/510).

    Pure array expressions in one codegen span — array_min/array_max +
    one transform; no shuffle, no Python. All arithmetic is IEEE doubles
    derived from the same float32 bits in both engines, so the DuckDB
    twin reproduces every code exactly (round-half-away parity, the
    kmeans.py argument)."""
    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    lo = F.array_min(x)
    span = F.array_max(x) - lo
    codes = F.transform(
        x,
        lambda v: F.when(
            span > 0,
            F.round((v - lo) * F.lit(255.0) / span, 0).cast("int"),
        ).otherwise(F.lit(0)),
    )
    return emb.select(
        F.col(id_col).alias("vec_id"),
        codes.alias("codes"),
        F.round(lo, 6).alias("lo"),
        F.round(span, 6).alias("span"),
    )
