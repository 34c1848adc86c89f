"""Retrieval scoring over the documents table: BM25 and TF-IDF.

A training-data pipeline uses these two ways: ranking documents against a
fixed query (quality-targeted selection, e.g. "find docs about X to
upsample") and extracting per-document salient terms (topic tagging /
clustering features). Both are pure DataFrame plans over the same
tokenize() convention as functions/text.py.

Scale shape (100 TB): the expensive object is the postings list
(doc, term, tf). For bm25_score the token stream is filtered to the
query's terms BEFORE the groupBy, so the shuffle carries only matching
postings (∝ query-term document frequency, not corpus size). For
tfidf_top_terms the full postings list shuffles once (keyed by term for
the document-frequency join, then by doc for the top-k window) — the same
two-exchange shape as token_histogram. Text never shuffles; only
(doc_id, term, count) triples do.

Float determinism: per-term score contributions are rounded to INTEGER
micro-units (round(x*1e6) as long) before any re-aggregation or ordering,
so sums are exact and order-independent and rank ties are impossible to
flip by partitioning — the DuckDB twins (doc_oracles.bm25_sql /
tfidf_terms_sql) value-hash-match at any parallelism. Same discipline as
text.lm_quality_score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphscope_spark.functions.text import FLOAT_DECIMALS, tokenize

__all__ = ["bm25_score", "tfidf_top_terms", "pmi_pairs"]


def _term_counts(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, token, tf) — per-document term frequencies, pinned.

    Everything downstream (document length, corpus stats, document
    frequency, scoring) derives from this one table, and it is referenced
    3-4 times per plan — without pinning Spark re-executes the corpus
    scan + explode PER REFERENCE (same audit finding as the near-dup
    pinning sweep, dedup.py::_pin). The pinned table is (id, token, count)
    — already aggregated, far smaller than the token stream, no text.

    Pinned via eager localCheckpoint, NOT CacheManager persist: a
    persist here is never unpersisted (the lazy results escape to the
    caller), so repeated bm25/tfidf/pmi calls in one long-lived session
    would leak pinned postings tables until LRU pressure. Checkpoint
    blocks are instead released by the ContextCleaner as soon as the
    caller drops the last reference to the result plan."""
    tf = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokenize(text_col)).alias("token"),
        )
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return tf.localCheckpoint(eager=True)


def bm25_score(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_matched, score) — Okapi BM25 of each document against a
    fixed bag of query terms, Lucene idf variant
    ``ln(1 + (N - df + 0.5) / (df + 0.5))`` (always positive). Documents
    matching no query term are excluded; N and avgdl are computed over
    documents with >= 1 token (a zero-token doc can never match, and
    including empty docs in avgdl would let pure-noise rows deflate every
    length normalization).

    The per-term contribution is rounded to integer micro-units before the
    per-doc sum (module docstring), and the final score is the micro-unit
    sum / 1e6 rounded to FLOAT_DECIMALS.
    """
    per = _term_counts(docs, text_col, id_col)
    dl = per.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    terms = [t for t in query_terms if t]
    tf = per.filter(F.col("token").isin(terms))
    df_t = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    norm = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * F.col("tf") * F.lit(k1 + 1.0) / norm
    scored = (
        tf.join(df_t, "token")
        .join(dl, "doc_id")
        .crossJoin(corpus)
        .select(
            "doc_id",
            F.round(contrib * F.lit(1_000_000.0), 0)
            .cast("long")
            .alias("score_u"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.round(
                F.sum("score_u").cast("double") / F.lit(1_000_000.0),
                FLOAT_DECIMALS,
            ).alias("score"),
        )
    )


def tfidf_top_terms(
    docs: DataFrame,
    top_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, term, rank, tfidf) — each document's top_n terms by
    smoothed TF-IDF, ``tf * (ln((N + 1) / (df + 1)) + 1)`` (the
    add-one-smoothed idf that keeps corpus-universal terms at weight
    tf*1.0 instead of zero). rank is 1-based; ties broken by term
    ascending on the INTEGER micro-unit score, so ordering is exact and
    partition-independent."""
    tf = _term_counts(docs, text_col, id_col)
    df_t = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = tf.select("doc_id").distinct().agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    idf = (
        F.log(
            (F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))
        )
        + F.lit(1.0)
    )
    scored = (
        tf.join(df_t, "token")
        .crossJoin(n_docs)
        .select(
            "doc_id",
            F.col("token").alias("term"),
            F.round(F.col("tf") * idf * F.lit(1_000_000.0), 0)
            .cast("long")
            .alias("score_u"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_u").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select(
            "doc_id",
            "term",
            "rank",
            F.round(
                F.col("score_u").cast("double") / F.lit(1_000_000.0),
                FLOAT_DECIMALS,
            ).alias("tfidf"),
        )
    )


def pmi_pairs(
    docs: DataFrame,
    min_pair_docs: int = 2,
    top_n: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(x, y, n_xy, pmi) — top document-level pointwise mutual information
    token pairs: PMI = ln(N·n_xy / (n_x·n_y)) over document co-occurrence
    (distinct tokens per doc; x < y). The collocation / topic-signal pass
    of corpus analysis. ``min_pair_docs`` prunes the pair tail BEFORE the
    heavy aggregate; ranking is (pmi_u DESC, x, y) on integer micro-nat
    PMI — deterministic at any parallelism.

    Scale shape: per-doc distinct tokens self-join keyed by doc — the
    shuffle is ∝ Σ per-doc distinct-token counts and the pair blowup is
    per-doc-local (bounded by the per-doc vocabulary², not the corpus);
    document frequencies broadcast back onto the surviving pairs."""
    per = _term_counts(docs, text_col, id_col).select("doc_id", "token")
    n_docs = per.select("doc_id").distinct().count()
    df_t = per.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    pairs = (
        per.withColumnRenamed("token", "x")
        .join(per.withColumnRenamed("token", "y"), "doc_id")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n_xy"))
        .filter(F.col("n_xy") >= min_pair_docs)
    )
    scored = (
        pairs.join(df_t.withColumnRenamed("token", "x")
                   .withColumnRenamed("n", "n_x"), "x")
        .join(df_t.withColumnRenamed("token", "y")
              .withColumnRenamed("n", "n_y"), "y")
        .select(
            "x", "y", "n_xy",
            F.round(
                F.log(
                    F.lit(float(n_docs)) * F.col("n_xy")
                    / (F.col("n_x") * F.col("n_y"))
                )
                * F.lit(1_000_000.0),
                0,
            ).cast("long").alias("pmi_u"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("pmi_u").desc(), "x", "y")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_n)
        .select(
            "x", "y", "n_xy",
            F.round(
                F.col("pmi_u").cast("double") / 1_000_000.0, FLOAT_DECIMALS
            ).alias("pmi"),
        )
    )
