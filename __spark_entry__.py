"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operator surface over the driver's
TPC-H-ish parquet tables; ``oracle_sql()`` gives the DuckDB-equivalent ANSI
SQL per query (iterative algorithms are unrolled as chained CTEs —
fixed-round semantics, see graphscope_spark/tpch_graphs.py). Floats are
ROUND()ed identically on both sides because Spark/DuckDB sum partial
aggregates in different orders.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from graphscope_spark import tpch_graphs as tg  # noqa: E402
from graphscope_spark.algorithms import cdlp, pagerank, triangles, wcc  # noqa: E402
from graphscope_spark.algorithms.triangles import triangle_count  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank (10 fixed rounds) on the co-purchase graph
    derived from /root/testdata/sf0.001."""
    g = tg.copurchase_graph(spark, "/root/testdata/sf0.001")
    res = pagerank(g, alpha=0.85, max_iter=10)
    return res.state.select(
        "id", F.round("rank", tg.FLOAT_DECIMALS).alias("pr")
    ).orderBy("id")


# --------------------------------------------------------------------- #
# queries
# --------------------------------------------------------------------- #


def _q_graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tg.copurchase_edges(spark, sf_dir)


def _q_graph_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tg.copurchase_graph(spark, sf_dir)
    return g.degrees.select("id", "out_deg", "in_deg")


def _q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tg.copurchase_graph(spark, sf_dir)
    res = pagerank(g, alpha=0.85, max_iter=10)
    return res.state.select(
        "id", F.round("rank", tg.FLOAT_DECIMALS).alias("pr")
    )


def _q_pagerank_directed(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tg.purchase_graph(spark, sf_dir)
    res = pagerank(g, alpha=0.85, max_iter=10)
    return res.state.select(
        "id", F.round("rank", tg.FLOAT_DECIMALS).alias("pr")
    )


def _q_pagerank_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pagerank_nx semantics (L1 tol) — convergence round count is data-
    dependent, so no SQL oracle; pytest checks it against a numpy oracle."""
    g = tg.copurchase_graph(spark, sf_dir)
    res = pagerank(g, alpha=0.85, max_iter=100, tol=1e-6)
    return res.state.select(
        "id", F.round("rank", tg.FLOAT_DECIMALS).alias("pr")
    )


def _q_wcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tg.copurchase_graph(spark, sf_dir)
    return wcc(g).state.select("id", "comp")


def _q_cdlp(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tg.copurchase_graph(spark, sf_dir)
    return cdlp(g, max_iter=10).state.select("id", "label")


def _q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tg.copurchase_graph(spark, sf_dir)
    return triangles(g)


def _q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tg.copurchase_graph(spark, sf_dir)
    return spark.createDataFrame([(triangle_count(g),)], "n_tri long")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "graph_edges": _q_graph_edges,
        "graph_degrees": _q_graph_degrees,
        "pagerank": _q_pagerank,
        "pagerank_directed": _q_pagerank_directed,
        "pagerank_tol": _q_pagerank_tol,
        "wcc": _q_wcc,
        "cdlp": _q_cdlp,
        "triangles": _q_triangles,
        "triangle_count": _q_triangle_count,
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
    }
