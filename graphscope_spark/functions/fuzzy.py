"""Fuzzy (edit-distance) string matching — the entity-resolution join.

`fuzzy_string_pairs` finds all id pairs whose strings are within a
Levenshtein distance bound, without the n² distance matrix: candidates
come from an inverted character-n-gram index (pairs sharing ≥ 1 n-gram),
pre-filtered by the length-difference bound (|len(a) − len(b)| ≤ d is a
lower bound on edit distance), then verified with the exact built-in
levenshtein — JVM-side in Spark, identical semantics in DuckDB, so the
gate twin hash-matches.

Candidate recall: sharing one n-gram is the standard pragmatic filter
(a pair at distance d with both strings ≥ n·(d+1) characters always
shares an n-gram — pigeonhole over d+1 destroyable spans); shorter
strings may slip through the index. The twin applies the SAME candidate
rule, so the operator's contract (and its verification) is exact
w.r.t. its own definition.

Scale shape: the n-gram explode is ∝ total characters; the inverted-index
self-join shuffles (gram, id) postings — hub grams can square, so
``max_gram_freq`` drops stop-grams from candidate GENERATION only (the
verify step stays exact), the same hub-cap discipline as
dedup.ngram_jaccard_pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fuzzy_string_pairs"]


def _grams(df: DataFrame, id_col: str, str_col: str, n: int) -> DataFrame:
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.expr(
                    f"transform(sequence(1, greatest(length({str_col}) - {n - 1}, 1)),"
                    f" i -> substring({str_col}, i, {n}))"
                )
            ).alias("gram"),
        )
        .distinct()
    )


def fuzzy_string_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_distance: int = 2,
    ngram: int = 3,
    max_gram_freq: int | None = None,
) -> DataFrame:
    """(a, b, dist) — id pairs (a < b) with levenshtein ≤ max_distance,
    candidates from the shared-n-gram inverted index."""
    strings = df.select(
        F.col(id_col).alias("id"), F.col(str_col).alias("s")
    )
    grams = _grams(df, id_col, str_col, ngram)
    gen = grams
    if max_gram_freq is not None:
        rare = (
            grams.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_gram_freq)
            .select("gram")
        )
        gen = grams.join(rare, "gram", "left_semi")
    cand = (
        gen.select(F.col("id").alias("a"), "gram")
        .join(gen.select(F.col("id").alias("b"), "gram"), "gram")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    sa = strings.select(F.col("id").alias("a"), F.col("s").alias("sa"))
    sb = strings.select(F.col("id").alias("b"), F.col("s").alias("sb"))
    return (
        cand.join(sa, "a")
        .join(sb, "b")
        .filter(
            F.abs(F.length("sa") - F.length("sb")) <= max_distance
        )
        .select(
            "a", "b", F.levenshtein("sa", "sb").alias("dist")
        )
        .filter(F.col("dist") <= max_distance)
    )
