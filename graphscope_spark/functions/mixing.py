"""Training-data mixture construction — the selection pass that decides
WHICH documents (and how many of each source) enter a pretraining run.

* mixture_sample — temperature-weighted source mixing: per-source keep
  rates from p_s ∝ n_s^T (the multilingual/multi-source temperature
  sampling recipe, e.g. mT5/XLM-R style α-smoothing), applied as a
  deterministic hash filter. One tiny count aggregation + one broadcast
  join + one filter: the corpus text itself never shuffles, so the op is
  100 TB-safe by construction.
* importance_resample — DSIR-style data selection (Xie et al. 2023,
  arXiv:2302.03169): hashed n-gram bag features, importance weight =
  sum of log(p_target/p_raw) over the doc's grams, top-N by weight.
  Feature distributions are two vocabulary-bounded aggregations; the
  per-doc weight is one explode + broadcast join + groupBy(doc) — no
  all-pairs, no model, fully deterministic (portable md5 hashing), so a
  DuckDB twin reproduces it value-for-value (doc_oracles.*_sql).

All float steps round to FLOAT_DECIMALS before comparison/ordering so the
cross-engine value-hash gate is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphscope_spark.functions.hashing import hash64
from graphscope_spark.functions.text import FLOAT_DECIMALS, tokenize

HASH_SPACE = float(1 << 60)


def mixture_rates(
    docs: DataFrame,
    temperature: float,
    target_rows: int,
    strata_col: str = "source",
) -> DataFrame:
    """(stratum, n, rate) — per-stratum keep probability under temperature
    sampling: p_s = n_s^T / Σ n_s^T, rate_s = min(1, target_rows·p_s/n_s).
    T < 1 flattens the mixture (upweights rare sources), T = 1 preserves
    natural proportions, T = 0 is uniform-over-sources. The counts table
    is per-stratum (tiny at any corpus scale); everything is JVM column
    arithmetic."""
    counts = docs.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n")
    )
    powed = counts.withColumn(
        "w", F.pow(F.col("n").cast("double"), F.lit(float(temperature)))
    )
    tot = powed.agg(F.sum("w").alias("tot"))
    return (
        powed.crossJoin(tot)
        .select(
            "stratum", "n",
            F.least(
                F.lit(1.0),
                F.lit(float(target_rows)) * F.col("w") / F.col("tot")
                / F.col("n").cast("double"),
            ).alias("rate"),
        )
    )


def mixture_sample(
    docs: DataFrame,
    temperature: float,
    target_rows: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Temperature-weighted mixture sample: keep each row of stratum s iff
    its portable 60-bit hash of (id, stratum, seed) falls under rate_s of
    the hash space. Expected output size ≈ min(target_rows, achievable
    under per-stratum caps); exactly reproducible across runs and engines
    (md5-based hash + closed-form rates). The filter is a broadcast
    hash-join against the per-stratum rate table — no shuffle of the
    corpus rows. Returns surviving rows unchanged."""
    rates = mixture_rates(docs, temperature, target_rows, strata_col)
    bounds = rates.select(
        "stratum", F.floor(F.col("rate") * F.lit(HASH_SPACE)).alias("bound")
    )
    h = hash64(
        F.concat(
            F.col(id_col).cast("string"), F.lit(":"),
            F.col(strata_col).cast("string"), F.lit(f":{seed}"),
        )
    )
    return (
        docs.join(F.broadcast(bounds), F.col(strata_col) == F.col("stratum"))
        .filter(h < F.col("bound"))
        .drop("stratum", "bound")
    )


def _grams(text_col: str, id_col: str, docs: DataFrame) -> DataFrame:
    """(doc_id, gram) with repetition — whitespace unigrams plus adjacent
    bigrams, the DSIR hashed bag-of-n-grams feature stream. Bigrams are
    built JVM-side from the token array (no Python in the path)."""
    toks = tokenize(text_col)
    uni = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(toks).alias("gram")
    ).filter(F.col("gram") != "")
    bi = (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("t"))
        .select(
            "doc_id",
            F.explode(
                F.when(
                    F.size("t") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("t") - 1),
                        lambda i: F.concat_ws(
                            " ",
                            F.element_at("t", i),
                            F.element_at("t", i + 1),
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("gram"),
        )
        .filter(F.col("gram") != "")
    )
    return uni.unionByName(bi)


def hashed_gram_distribution(
    docs: DataFrame,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(bucket, cnt) — hashed n-gram feature counts: every unigram/bigram
    maps to bucket = hash64(gram) % n_buckets. The aggregation output is
    bounded by ``n_buckets`` regardless of corpus size (map-side partial
    agg makes the shuffle carry at most n_buckets rows per partition)."""
    g = _grams(text_col, id_col, docs)
    return (
        g.select((hash64(F.col("gram")) % n_buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def importance_resample(
    docs: DataFrame,
    target_docs: DataFrame,
    n_select: int,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
) -> DataFrame:
    """(doc_id, weight, rank) — the ``n_select`` raw documents whose hashed
    n-gram features look most like ``target_docs`` (DSIR, arXiv:2302.03169
    §2: importance weight of doc x = Σ_grams log p_target(b)/p_raw(b) under
    two bag-of-hashed-ngrams multinomials, Laplace-smoothed by ``alpha``).

    Scale shape: both feature distributions are ``n_buckets``-row tables
    (broadcast); the per-doc weight is one gram explode + map-side join +
    one groupBy(doc_id) — shuffle carries (doc, bucket-partials), never
    text. Deterministic: md5 bucketing, per-gram log-ratios rounded to
    FLOAT_DECIMALS before the sum and the summed weight rounded again, so
    the DuckDB twin (doc_oracles.importance_resample_sql) hash-matches.
    Ties rank by doc_id. DSIR proper adds Gumbel noise to sample rather
    than top-k; with a deterministic gate the top-k variant is the
    documented choice (noise ⇒ no cross-engine twin)."""
    raw = hashed_gram_distribution(docs, n_buckets, text_col, id_col)
    tgt = hashed_gram_distribution(target_docs, n_buckets, text_col, id_col)
    raw_tot = raw.agg(F.sum("cnt").alias("rt"))
    tgt_tot = tgt.agg(F.sum("cnt").alias("tt"))
    buckets = docs.sparkSession.range(n_buckets).select(
        F.col("id").alias("bucket")
    )
    ratios = (
        buckets.join(raw.withColumnRenamed("cnt", "rc"), "bucket", "left")
        .join(tgt.withColumnRenamed("cnt", "tc"), "bucket", "left")
        .crossJoin(raw_tot).crossJoin(tgt_tot)
        .select(
            "bucket",
            F.round(
                F.log(
                    (F.coalesce(F.col("tc"), F.lit(0)) + F.lit(alpha))
                    / (F.col("tt") + F.lit(alpha * n_buckets))
                )
                - F.log(
                    (F.coalesce(F.col("rc"), F.lit(0)) + F.lit(alpha))
                    / (F.col("rt") + F.lit(alpha * n_buckets))
                ),
                FLOAT_DECIMALS,
            ).alias("lr"),
        )
    )
    doc_buckets = _grams(text_col, id_col, docs).select(
        "doc_id", (hash64(F.col("gram")) % n_buckets).alias("bucket")
    )
    weights = (
        doc_buckets.join(F.broadcast(ratios), "bucket")
        .groupBy("doc_id")
        .agg(F.round(F.sum("lr"), FLOAT_DECIMALS).alias("weight"))
    )
    # top-N first (distributed TakeOrdered — no global sort of the corpus),
    # THEN rank: the single-partition row_number window only ever sees the
    # n_select survivors, not the corpus.
    top = weights.orderBy(
        F.col("weight").desc(), F.col("doc_id").asc()
    ).limit(n_select)
    w = Window.orderBy(F.col("weight").desc(), F.col("doc_id").asc())
    return top.select(
        "doc_id", "weight", F.row_number().over(w).alias("rank")
    )
