"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operator surface over the driver's
TPC-H-ish parquet tables; ``oracle_sql()`` gives the DuckDB-equivalent ANSI
SQL per query (iterative algorithms are unrolled as chained CTEs —
fixed-round semantics, see graphscope_spark/tpch_graphs.py; document
pipeline oracles in graphscope_spark/doc_oracles.py). Floats are ROUND()ed
identically on both sides because Spark/DuckDB sum partial aggregates in
different orders.

Queries WITHOUT an oracle entry (rows-only check, reasons inline):
pagerank_tol (data-dependent round count), kshell (nested data-dependent
peel loops), simhash* (Python-UDF bit votes, not SQL-expressible),
ann_lsh / embedding near-dup (random-hyperplane buckets use numpy RNG),
repo_* (corpus synthesized by vectorized UDF extraction, no SQL twin —
pytest checks a pure-python oracle instead, tests/test_corpus.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from graphscope_spark import corpus as corpus_mod  # noqa: E402
from graphscope_spark import doc_oracles as do  # noqa: E402
from graphscope_spark import tpch_graphs as tg  # noqa: E402
from graphscope_spark.algorithms import (  # noqa: E402
    average_clustering, average_degree_connectivity, bfs, cdlp, clustering,
    degree_assortativity_coefficient, degree_centrality,
    eigenvector_centrality, hits, katz_centrality, kcore_vertices, kshell,
    pagerank, sssp, triangles, wcc,
)
from graphscope_spark.algorithms.triangles import triangle_count  # noqa: E402
from graphscope_spark.functions import (  # noqa: E402
    ann_brute_force, ann_lsh, dedup_exact, doc_stats, documents_as_media,
    fingerprint, lang_id, media_metadata, minhash_signatures,
    ngram_jaccard_pairs, quality_score, simhash64,
)
from graphscope_spark.graph import Graph  # noqa: E402
from graphscope_spark.operators import path_expand  # noqa: E402

RD = tg.FLOAT_DECIMALS  # 8 — graph-side float rounding
DRD = do.FLOAT_DECIMALS  # 6 — document-side float rounding


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank (10 fixed rounds) on the co-purchase graph
    derived from /root/testdata/sf0.001."""
    g = tg.copurchase_graph(spark, "/root/testdata/sf0.001")
    res = pagerank(g, alpha=0.85, max_iter=10)
    return res.state.select(
        "id", F.round("rank", RD).alias("pr")
    ).orderBy("id")


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _min_id(g) -> int:
    return g.vertices.agg(F.min("id")).first()[0]


# --------------------------------------------------------------------- #
# graph queries
# --------------------------------------------------------------------- #


def _q_graph_edges(spark, sf_dir):
    return tg.copurchase_edges(spark, sf_dir)


def _q_graph_degrees(spark, sf_dir):
    g = tg.copurchase_graph(spark, sf_dir)
    return g.degrees.select("id", "out_deg", "in_deg")


def _q_pagerank(spark, sf_dir):
    g = tg.copurchase_graph(spark, sf_dir)
    return pagerank(g, alpha=0.85, max_iter=10).state.select(
        "id", F.round("rank", RD).alias("pr")
    )


def _q_pagerank_directed(spark, sf_dir):
    g = tg.purchase_graph(spark, sf_dir)
    return pagerank(g, alpha=0.85, max_iter=10).state.select(
        "id", F.round("rank", RD).alias("pr")
    )


def _q_pagerank_tol(spark, sf_dir):
    g = tg.copurchase_graph(spark, sf_dir)
    return pagerank(g, alpha=0.85, max_iter=100, tol=1e-6).state.select(
        "id", F.round("rank", RD).alias("pr")
    )


def _q_wcc(spark, sf_dir):
    return wcc(tg.copurchase_graph(spark, sf_dir)).state.select("id", "comp")


def _q_cdlp(spark, sf_dir):
    return cdlp(tg.copurchase_graph(spark, sf_dir), max_iter=10).state.select(
        "id", "label"
    )


def _q_triangles(spark, sf_dir):
    return triangles(tg.copurchase_graph(spark, sf_dir))


def _q_triangle_count(spark, sf_dir):
    n = triangle_count(tg.copurchase_graph(spark, sf_dir))
    return spark.createDataFrame([(n,)], "n_tri long")


def _q_bfs(spark, sf_dir):
    g = tg.copurchase_graph(spark, sf_dir)
    return bfs(g, _min_id(g)).state.select("id", "dist")


def _q_sssp(spark, sf_dir):
    e = tg.copurchase_edges(spark, sf_dir).withColumn(
        "w", ((F.col("src") + F.col("dst")) % 10 + 1).cast("double")
    )
    g = Graph(e, directed=True)  # symmetric edge list already
    return sssp(g, _min_id(g), weight_col="w").state.select("id", "dist")


def _q_degree_centrality(spark, sf_dir):
    g = tg.copurchase_graph(spark, sf_dir)
    return degree_centrality(g, "both").select("id", F.round("dc", RD).alias("dc"))


def _q_clustering(spark, sf_dir):
    g = tg.copurchase_graph(spark, sf_dir)
    return clustering(g).select("id", F.round("cc", RD).alias("cc"))


def _q_transitivity(spark, sf_dir):
    from graphscope_spark.algorithms import transitivity as _tr
    t = round(_tr(tg.copurchase_graph(spark, sf_dir)), RD)
    return spark.createDataFrame([(t,)], "transitivity double")


def _q_avg_clustering(spark, sf_dir):
    v = round(average_clustering(tg.copurchase_graph(spark, sf_dir)), RD)
    return spark.createDataFrame([(v,)], "avg_cc double")


def _q_kcore(spark, sf_dir):
    g = tg.copurchase_graph(spark, sf_dir)
    return kcore_vertices(g, 2)


def _q_kshell(spark, sf_dir):
    g = tg.copurchase_graph(spark, sf_dir)
    return kshell(g, max_k=40)


def _q_assortativity(spark, sf_dir):
    g = tg.copurchase_graph(spark, sf_dir)
    v = round(degree_assortativity_coefficient(g), RD)
    return spark.createDataFrame([(v,)], "assortativity double")


def _q_avg_degree_connectivity(spark, sf_dir):
    g = tg.copurchase_graph(spark, sf_dir)
    return average_degree_connectivity(g).select(
        "deg", F.round("avg_nbr_deg", RD).alias("avg_nbr_deg")
    )


def _q_eigenvector(spark, sf_dir):
    g = tg.copurchase_graph(spark, sf_dir)
    res = eigenvector_centrality(g, max_iter=5, tol=None)
    return res.state.select("id", F.round("x", RD).alias("x"))


def _q_katz(spark, sf_dir):
    g = tg.copurchase_graph(spark, sf_dir)
    res = katz_centrality(g, alpha=0.1, beta=1.0, max_iter=5, tol=None)
    return res.state.select("id", F.round("x", RD).alias("x"))


def _q_hits(spark, sf_dir):
    g = tg.copurchase_graph(spark, sf_dir)
    res = hits(g, max_iter=3, tol=None)
    return res.state.select(
        "id", F.round("hub", RD).alias("hub"), F.round("auth", RD).alias("auth")
    )


def _q_closeness(spark, sf_dir):
    g = tg.copurchase_graph(spark, sf_dir)
    sources = g.vertices.filter(F.col("id") % 20 == 0)
    from graphscope_spark.algorithms.paths import closeness_centrality
    return closeness_centrality(g, sources).select(
        "id", F.round("closeness", RD).alias("closeness")
    )


def _q_apsp(spark, sf_dir):
    """Sampled-source APSP slice (id % 10 == 0) — full APSP is the same
    substrate (tests/test_paths.py runs it exactly on the fixture); the
    sample keeps the gate run time bounded."""
    g = tg.copurchase_graph(spark, sf_dir)
    from graphscope_spark.algorithms.paths import multi_source_bfs
    sources = g.vertices.filter(F.col("id") % 10 == 0)
    return multi_source_bfs(g, sources).select("src", "id", "dist")


def _q_betweenness(spark, sf_dir):
    g = tg.copurchase_graph(spark, sf_dir)
    sources = g.vertices.filter(F.col("id") % 20 == 0)
    from graphscope_spark.algorithms.paths import betweenness_centrality
    return betweenness_centrality(g, sources).select(
        "id", F.round("betweenness", RD).alias("betweenness")
    )


def _q_louvain(spark, sf_dir):
    """Rows-only: community membership (deterministic here, but the
    modularity-greedy fixed point has no tractable SQL twin; the reference
    itself only smoke-tests louvain, test_app.py:218-228)."""
    from graphscope_spark.algorithms import louvain
    g = tg.copurchase_graph(spark, sf_dir)
    comm, q = louvain(g, max_passes=2, max_move_rounds=6)
    return comm


def _q_sssp_path(spark, sf_dir):
    """Rows-only: (id, dist, parent); min-parent tie-break documented in
    algorithms/sssp.py (the reference excludes sssp_path from exact golden
    match for the same diamond-tie reason, app_tests.sh:349-356)."""
    from graphscope_spark.algorithms import sssp_path
    g = tg.copurchase_graph(spark, sf_dir)
    return sssp_path(g, _min_id(g)).state.select("id", "dist", "parent")


def _q_ppr(spark, sf_dir):
    g = tg.copurchase_graph(spark, sf_dir)
    from graphscope_spark.algorithms import ppr as _ppr
    return _ppr(g, _min_id(g), max_iter=10).state.select(
        "id", F.round("rank", RD).alias("r")
    )


def _q_articlerank(spark, sf_dir):
    g = tg.purchase_graph(spark, sf_dir)
    from graphscope_spark.algorithms import articlerank as _ar
    return _ar(g, max_iter=10).state.select(
        "id", F.round("rank", RD).alias("r")
    )


def _q_scc(spark, sf_dir):
    from graphscope_spark.algorithms import scc as _scc
    g = tg.partseq_graph(spark, sf_dir)
    return _scc(g).select("id", "comp")


def _q_lpa_u2i(spark, sf_dir):
    from graphscope_spark.algorithms import lpa_u2i as _lpa
    edges = tg.bipartite_edges(spark, sf_dir)
    users = edges.select(F.col("u").alias("id")).distinct().select(
        "id", (F.col("id") % 7).cast("double") / 6.0
    ).toDF("id", "label")
    out = _lpa(edges, users, ["label"], max_round=4)
    return out.select("id", F.round("label_0", RD).alias("label"))


def _q_attr_assortativity(spark, sf_dir):
    from graphscope_spark.algorithms import attribute_assortativity as _aa
    g = tg.copurchase_graph(spark, sf_dir)
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    gv = g.vertices.join(
        part.select(F.col("p_partkey").alias("id"), F.col("p_brand")), "id"
    )
    from graphscope_spark.graph import Graph
    g2 = Graph(g.edges, gv, directed=g.directed, persist=False)
    v = round(_aa(g2, "p_brand"), RD)
    return spark.createDataFrame([(v,)], "assortativity double")


def _q_voterank(spark, sf_dir):
    from graphscope_spark.algorithms import voterank as _vr
    g = tg.copurchase_graph(spark, sf_dir)
    return _vr(g, num_of_nodes=10)


def _q_all_simple_paths(spark, sf_dir):
    from graphscope_spark.algorithms import all_simple_paths as _asp
    g = tg.copurchase_graph(spark, sf_dir)
    targets = g.vertices.filter(F.col("id") % 3 == 0).select(
        F.col("id").alias("v")
    )
    return _asp(g, _min_id(g), targets, cutoff=4)


def _q_bfs_parents(spark, sf_dir):
    from graphscope_spark.algorithms import bfs_parents as _bp
    g = tg.copurchase_graph(spark, sf_dir)
    return _bp(g, _min_id(g)).select(
        "id", F.col("dist").cast("long").alias("dist"), "parent"
    )


def _q_flash_cc(spark, sf_dir):
    from graphscope_spark.flash import flash_cc
    g = tg.copurchase_graph(spark, sf_dir)
    return flash_cc(g)


def _q_path_expand(spark, sf_dir):
    g = tg.copurchase_graph(spark, sf_dir)
    starts = g.vertices.filter(F.col("id") % 50 == 0).select(F.col("id").alias("v"))
    return path_expand(starts, g, min_hops=1, max_hops=2)


# --------------------------------------------------------------------- #
# corpus (north-star input path) — pytest-verified, rows-only at the gate
# --------------------------------------------------------------------- #


def _corpus_scale(sf_dir: str) -> tuple[int, int]:
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        f = float(sf)
    except ValueError:
        f = 0.01
    n_repos = max(60, int(2000 * f))
    return n_repos, 12


def _q_repo_edges(spark, sf_dir):
    n_repos, files = _corpus_scale(sf_dir)
    g, vertices, repos = corpus_mod.repo_graph(spark, n_repos, files)
    return g.edges.select("src", "dst")


def _q_repo_pagerank(spark, sf_dir):
    n_repos, files = _corpus_scale(sf_dir)
    g, vertices, repos = corpus_mod.repo_graph(spark, n_repos, files)
    return pagerank(g, alpha=0.85, max_iter=10).state.select(
        "id", F.round("rank", RD).alias("pr")
    )


def _q_repo_sha256(spark, sf_dir):
    n_repos, files = _corpus_scale(sf_dir)
    repos = corpus_mod.synthesize_repos(spark, n_repos, files)
    return corpus_mod.content_fingerprints(repos)


# --------------------------------------------------------------------- #
# document-pipeline queries
# --------------------------------------------------------------------- #


def _q_doc_stats(spark, sf_dir):
    return doc_stats(_docs(spark, sf_dir))


def _q_quality(spark, sf_dir):
    return quality_score(_docs(spark, sf_dir))


def _q_lang_id(spark, sf_dir):
    return lang_id(_docs(spark, sf_dir))


def _q_fingerprint(spark, sf_dir):
    return fingerprint(_docs(spark, sf_dir))


def _q_dedup_exact(spark, sf_dir):
    return dedup_exact(_docs(spark, sf_dir))


def _q_minhash(spark, sf_dir):
    sig = minhash_signatures(_docs(spark, sf_dir), num_hashes=16)
    return sig.select(
        "doc_id", F.posexplode("sig").alias("perm", "minhash")
    )


def _q_ngram_jaccard(spark, sf_dir):
    return ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.2).select(
        "a", "b", F.round("jaccard", DRD).alias("jaccard")
    )


def _q_ann_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 10)
    return ann_brute_force(emb, queries, k=5)


def _q_ann_lsh(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 10)
    return ann_lsh(emb, queries, k=5, dim=64, n_planes=4, n_tables=8)


def _q_simhash(spark, sf_dir):
    return simhash64(_docs(spark, sf_dir))


def _q_multimodal_meta(spark, sf_dir):
    return media_metadata(documents_as_media(_docs(spark, sf_dir))).select(
        "media_id", "kind", "n_bytes", "sha256"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # graph substrate + north-star four
        "graph_edges": _q_graph_edges,
        "graph_degrees": _q_graph_degrees,
        "pagerank": _q_pagerank,
        "pagerank_directed": _q_pagerank_directed,
        "pagerank_tol": _q_pagerank_tol,
        "wcc": _q_wcc,
        "cdlp": _q_cdlp,
        "triangles": _q_triangles,
        "triangle_count": _q_triangle_count,
        # breadth algorithms
        "bfs": _q_bfs,
        "sssp": _q_sssp,
        "degree_centrality": _q_degree_centrality,
        "clustering": _q_clustering,
        "transitivity": _q_transitivity,
        "avg_clustering": _q_avg_clustering,
        "kcore": _q_kcore,
        "kshell": _q_kshell,
        "assortativity": _q_assortativity,
        "avg_degree_connectivity": _q_avg_degree_connectivity,
        "eigenvector": _q_eigenvector,
        "katz": _q_katz,
        "hits": _q_hits,
        "closeness": _q_closeness,
        "apsp": _q_apsp,
        "betweenness": _q_betweenness,
        "flash_cc": _q_flash_cc,
        "louvain": _q_louvain,
        "sssp_path": _q_sssp_path,
        "path_expand": _q_path_expand,
        # round-2 additions
        "ppr": _q_ppr,
        "articlerank": _q_articlerank,
        "scc": _q_scc,
        "lpa_u2i": _q_lpa_u2i,
        "attr_assortativity": _q_attr_assortativity,
        "voterank": _q_voterank,
        "all_simple_paths": _q_all_simple_paths,
        "bfs_parents": _q_bfs_parents,
        # corpus input path (north rule)
        "repo_edges": _q_repo_edges,
        "repo_pagerank": _q_repo_pagerank,
        "repo_sha256": _q_repo_sha256,
        # document pipeline
        "doc_stats": _q_doc_stats,
        "quality_score": _q_quality,
        "lang_id": _q_lang_id,
        "doc_fingerprint": _q_fingerprint,
        "dedup_exact": _q_dedup_exact,
        "minhash": _q_minhash,
        "ngram_jaccard": _q_ngram_jaccard,
        "ann_topk": _q_ann_topk,
        "ann_lsh": _q_ann_lsh,
        "simhash": _q_simhash,
        "multimodal_meta": _q_multimodal_meta,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "graph_edges": tg.edges_sql(),
        "graph_degrees": tg.degrees_sql(),
        "pagerank": tg.pagerank_sql(rounds=10, directed=False),
        "pagerank_directed": tg.pagerank_sql(rounds=10, directed=True),
        # pagerank_tol intentionally omitted: data-dependent round count
        "wcc": tg.wcc_sql(),
        "cdlp": tg.cdlp_sql(rounds=10),
        "triangles": tg.triangles_sql(),
        "triangle_count": tg.triangle_count_sql(),
        "bfs": tg.bfs_sql(),
        "sssp": tg.sssp_sql(),
        "degree_centrality": tg.degree_centrality_sql(),
        "clustering": tg.clustering_sql(),
        "transitivity": tg.transitivity_sql(),
        "avg_clustering": tg.avg_clustering_sql(),
        "kcore": tg.kcore_sql(k=2),
        # kshell omitted: nested data-dependent peel loops
        "assortativity": tg.assortativity_sql(),
        "avg_degree_connectivity": tg.avg_degree_connectivity_sql(),
        "eigenvector": tg.eigenvector_sql(rounds=5),
        "katz": tg.katz_sql(rounds=5),
        "hits": tg.hits_sql(rounds=3),
        "closeness": tg.closeness_sql(mod=20),
        "apsp": tg.apsp_sql(mod=10),
        # betweenness omitted: per-level backward joins, data-dependent depth
        "flash_cc": tg.wcc_sql(),  # same min-label fixed point as wcc
        "path_expand": tg.path_expand_sql(mod=50),
        "ppr": tg.ppr_sql(rounds=10),
        "articlerank": tg.articlerank_sql(rounds=10),
        "scc": tg.scc_sql(),
        "lpa_u2i": tg.lpa_u2i_sql(rounds=4),
        "attr_assortativity": tg.attr_assortativity_sql(),
        "voterank": tg.voterank_sql(rounds=10),
        "all_simple_paths": tg.all_simple_paths_sql(cutoff=4, target_mod=3),
        "bfs_parents": tg.bfs_parents_sql(),
        # repo_* omitted: pandas-UDF extraction has no SQL twin
        "doc_stats": do.doc_stats_sql(),
        "quality_score": do.quality_score_sql(),
        "lang_id": do.lang_id_sql(),
        "doc_fingerprint": do.fingerprint_sql(),
        "dedup_exact": do.dedup_exact_sql(),
        "minhash": do.minhash_sql(num_hashes=16),
        "ngram_jaccard": do.ngram_jaccard_sql(threshold=0.2),
        "ann_topk": do.ann_topk_sql(k=5, n_queries=10),
        # ann_lsh / simhash omitted: numpy-RNG buckets / Python bit votes
        "multimodal_meta": do.multimodal_meta_sql(),
    }
