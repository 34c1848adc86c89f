"""Deduplication operators: exact, MinHash+LSH, n-gram Jaccard, SimHash,
(embedding near-dup lives in similarity.py).

Scale design per operator:
  * exact        — one hash-groupBy on md5(text): the canonical 100 TB dedup
                   (shuffle carries 16-byte digests, not documents).
  * minhash      — shingle explode → one groupBy computing all H signature
                   mins at once (single shuffle over (doc, shingle) pairs).
  * LSH pairs    — band keys from signature slices → self-join per band
                   (shuffle ∝ #docs × #bands, never all-pairs).
  * ngram_jaccard— inverted-index candidate join (docs sharing ≥1 shingle)
                   → exact Jaccard on candidates only; all-pairs never
                   materializes. Hub shingles (very common n-grams) are the
                   skew risk — AQE skew-join handles it; a stopword-shingle
                   filter (``max_doc_freq``) caps it explicitly.
  * simhash      — vectorized pandas UDF (per-Arrow-batch numpy bit votes);
                   Hamming-ball lookup via 16-bit chunk index (Charikar /
                   Manku et al. WWW'07 style) — chunk equality is a join
                   key, so near-dup lookup is again a join, not a scan.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from pyspark.storagelevel import StorageLevel

from graphscope_spark.functions.hashing import hash64
from graphscope_spark.functions.text import tokenize


def _pin(df: DataFrame) -> DataFrame:
    """Persist a small per-doc derived table that the downstream plan
    references more than once — without it Spark recomputes the whole
    corpus scan+explode PER REFERENCE (plan-audited, PLANS.md:
    ngram_jaccard read the source parquet 6x, minhash-LSH 6x, simhash
    2x). What gets pinned is the derived table (ids + hashes/shingles/
    signatures), orders of magnitude smaller than the text; eviction is
    safe — lineage recomputes."""
    return df.persist(StorageLevel.MEMORY_AND_DISK)

DEFAULT_NUM_HASHES = 16
DEFAULT_BANDS = 4  # 4 bands × 4 rows with 16 hashes


def dedup_exact(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id) — survivor set: the minimum id per exact content digest."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("digest"))
        .agg(F.min(F.col(id_col)).alias(id_col))
        .select(id_col)
    )


def shingles(text: Column | str, k: int = 3) -> Column:
    """Word k-gram shingles (space-joined), 1-based element_at so the SQL
    twin (DuckDB 1-based list indexing) is expression-for-expression equal.
    Docs shorter than k tokens yield their whole token string as one
    shingle (sequence(1, greatest(n-k+1, 1)))."""
    toks = tokenize(text)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1)))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            # try_element_at → NULL past the end (short docs); concat_ws
            # skips NULLs identically in Spark and DuckDB.
            " ", *[F.try_element_at(toks, (i + j).cast("int")) for j in range(k)]
        ),
    )


def exploded_shingles(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """(id, shingle) — one row per shingle occurrence, tokenizing ONCE.

    Evaluation-strategy twin of ``explode(shingles(text_col))``: inlining
    ``shingles()`` makes every ``try_element_at(toks, ·)`` inside the
    transform lambda re-run the regex ``tokenize`` (no common-subexpression
    elimination through higher-order functions — measured 8.1s → 0.6s on
    the 5k-doc bench probe, a 14× win), so the tokens are projected to a
    column first and the lambda reads the attribute."""
    k = int(k)
    toks = docs.select(F.col(id_col), tokenize(text_col).alias("_toks"))
    idx = F.sequence(F.lit(1), F.greatest(F.size("_toks") - (k - 1), F.lit(1)))
    return toks.select(
        F.col(id_col),
        F.explode(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ",
                    *[F.try_element_at(F.col("_toks"), (i + j).cast("int"))
                      for j in range(k)],
                ),
            )
        ).alias("shingle"),
    )


def doc_shingles(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """(id, shingle) distinct — the exploded shingle set."""
    return exploded_shingles(docs, text_col, id_col, k).distinct()


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    k: int = 3,
) -> DataFrame:
    """(id, sig: array<long>) — MinHash signature; permutation h_i(s) =
    hash64(i || ':' || s). One explode + one groupBy computing every min
    simultaneously (single shuffle)."""
    # NOT doc_shingles(): its .distinct() is a full shuffle of every
    # (id, shingle) string, and min() over the shingle MULTISET equals
    # min() over the set — dropping it leaves ONE hash aggregate whose
    # partials combine map-side, so only num_hashes longs per doc cross
    # the wire (measured 2.6× on the 5k-doc bench probe; result
    # identical, the SQL twin is unchanged).
    sh = exploded_shingles(docs, text_col, id_col, k)
    mins = [
        F.min(hash64(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    agg = sh.groupBy(id_col).agg(*mins)
    return agg.select(
        id_col, F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def lsh_band_keys(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    k: int = 3,
) -> DataFrame:
    """(id, band, key) — each document's LSH bucket key per band (the
    signature rows b*r..b*r+r-1 joined with '_'). The unit both the batch
    pair-join (minhash_lsh_pairs) and the streaming index
    (streaming.merge_dedup) build on."""
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sig = _pin(minhash_signatures(docs, text_col, id_col, num_hashes, k))
    return sig.select(
        F.col(id_col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.concat_ws(
                        "_", *[F.element_at(F.col("sig"), b * r + j + 1) for j in range(r)]
                    ).alias("key"),
                )
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.key")


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    k: int = 3,
    verify_threshold: float | None = None,
) -> DataFrame:
    """(a, b) candidate near-duplicate pairs (a < b): docs colliding in ≥1
    LSH band. With ``verify_threshold`` the candidates are verified with
    exact shingle-set Jaccard ≥ threshold (returns (a, b, jaccard))."""
    banded = lsh_band_keys(docs, text_col, id_col, num_hashes, bands, k)
    left = banded.withColumnRenamed(id_col, "a")
    right = banded.withColumnRenamed(id_col, "b")
    cand = (
        left.join(right, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    if verify_threshold is None:
        return cand
    jac = _jaccard_on_pairs(
        cand, _pin(doc_shingles(docs, text_col, id_col, k)), id_col
    )
    return jac.filter(F.col("jaccard") >= verify_threshold)


def _jaccard_on_pairs(pairs: DataFrame, sh: DataFrame, id_col: str) -> DataFrame:
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a_sh = sh.select(F.col(id_col).alias("a"), "shingle")
    b_sh = sh.select(F.col(id_col).alias("b"), "shingle")
    inter = (
        pairs.join(a_sh, "a").join(b_sh, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed(id_col, "a").withColumnRenamed("sz", "sa"), "a")
        .join(sizes.withColumnRenamed(id_col, "b").withColumnRenamed("sz", "sb"), "b")
        .select(
            "a", "b",
            (F.col("inter") / (F.col("sa") + F.col("sb") - F.col("inter")))
            .alias("jaccard"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """(a, b, jaccard) — exact n-gram Jaccard over inverted-index candidates
    (pairs sharing ≥1 shingle). ``max_doc_freq`` drops hub shingles from
    candidate *generation* only (Jaccard itself stays exact), bounding the
    candidate blowup that common n-grams cause at scale."""
    sh = _pin(doc_shingles(docs, text_col, id_col, k))
    gen = sh
    if max_doc_freq is not None:
        rare = (
            sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_doc_freq)
            .select("shingle")
        )
        gen = sh.join(rare, "shingle", "left_semi")
    cand = (
        gen.select(F.col(id_col).alias("a"), "shingle")
        .join(gen.select(F.col(id_col).alias("b"), "shingle"), "shingle")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    return _jaccard_on_pairs(cand, sh, id_col).filter(F.col("jaccard") >= threshold)


# ------------------------------------------------------------------ #
# SimHash
# ------------------------------------------------------------------ #


def _simhash_batch(texts: pd.Series) -> pd.Series:
    """64-bit SimHash per document over whitespace tokens, md5-based token
    hashes (deterministic across processes). Vectorized per Arrow batch:
    token hashing is memoized over the batch vocabulary, bit votes are one
    numpy reduction per doc."""
    vocab: dict[str, int] = {}

    def tok_hash(t: str) -> int:
        h = vocab.get(t)
        if h is None:
            h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
            vocab[t] = h
        return h

    out = np.zeros(len(texts), dtype=np.int64)
    for i, text in enumerate(texts):
        toks = text.split()
        if not toks:
            continue
        hs = np.fromiter((tok_hash(t) for t in toks), dtype=np.uint64, count=len(toks))
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int32
        )
        votes = (2 * bits - 1).sum(axis=0)
        sh = np.uint64(0)
        for b in np.nonzero(votes > 0)[0]:
            sh |= np.uint64(1) << np.uint64(b)
        out[i] = np.int64(sh.astype(np.int64))
    return pd.Series(out)


def simhash64(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, simhash: long)."""
    udf = pandas_udf(_simhash_batch, "long")
    return docs.select(F.col(id_col), udf(F.col(text_col)).alias("simhash"))


def simhash_neardup_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(a, b, hamming) pairs within Hamming distance ``max_hamming``.
    Candidate generation via 16-bit chunk equality (any pair within
    distance 3 shares ≥1 of 4 chunks — pigeonhole, Manku et al. WWW'07);
    verification via bit_count(xor). The 4-chunk scheme guarantees recall
    only for ``max_hamming <= 3`` (a pair at distance 4 can differ in all
    four chunks and never share a bucket) — larger radii are rejected
    rather than silently dropping true pairs; a larger radius needs
    ``max_hamming + 1`` chunks."""
    if max_hamming > 3:
        raise ValueError(
            "max_hamming > 3 breaks the 4x16-bit pigeonhole recall "
            "guarantee (need max_hamming+1 chunks); rebuild with more "
            "chunks instead of silently losing pairs"
        )
    sh = _pin(simhash64(docs, text_col, id_col))
    chunks = sh.select(
        F.col(id_col), "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("chunk"),
                    F.shiftrightunsigned(F.col("simhash"), 16 * c)
                    .bitwiseAND(F.lit(0xFFFF)).alias("key"),
                )
                for c in range(4)
            ])
        ).alias("ck"),
    ).select(id_col, "simhash", "ck.chunk", "ck.key")
    a = chunks.select(F.col(id_col).alias("a"), F.col("simhash").alias("ha"),
                      "chunk", "key")
    b = chunks.select(F.col(id_col).alias("b"), F.col("simhash").alias("hb"),
                      "chunk", "key")
    return (
        a.join(b, ["chunk", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b",
                F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ------------------------------------------------------------------ #
# end-to-end dedup: pairs -> clusters -> keep set
# ------------------------------------------------------------------ #


def dedup_clusters(
    docs: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    method: str = "ngram",
    max_doc_freq: int | None = None,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    max_iter: int = 64,
) -> DataFrame:
    """(doc_id, cluster_id, keep) — the full near-duplicate pipeline a
    training-data run actually executes: candidate pairs → exact-Jaccard
    verify ≥ ``threshold`` → connected components over the pair graph →
    one canonical representative per cluster (min doc_id, ``keep=true``).
    Filtering on ``keep`` yields the deduplicated corpus.

    ``method='ngram'`` generates candidates from the inverted shingle
    index (exact recall at the given threshold; ``max_doc_freq`` caps hub
    shingles); ``method='lsh'`` generates from MinHash-LSH bands (the
    100 TB path — candidate volume bounded by band collisions; recall is
    probabilistic in the banding but every surviving pair is still
    exact-verified). Components run on the PAIR graph — its size is the
    number of near-dup relations, orders of magnitude below the corpus —
    via the O(log n)-round hook+jump kernel, so a pathological dup-chain
    can't stretch rounds. Cluster ids are min member doc_ids:
    deterministic for both methods, value-hash-gated for 'ngram'
    (doc_oracles.dedup_clusters_sql)."""
    from graphscope_spark.algorithms.wcc import cc_log
    from graphscope_spark.graph import Graph

    if method == "ngram":
        pairs = ngram_jaccard_pairs(
            docs, threshold, text_col, id_col, k, max_doc_freq
        )
    elif method == "lsh":
        pairs = minhash_lsh_pairs(
            docs, text_col, id_col, num_hashes, bands, k,
            verify_threshold=threshold,
        )
    else:
        raise ValueError(f"unknown method {method!r}")

    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    pair_graph = Graph(
        edges.localCheckpoint(eager=True),
        directed=True,  # cc_log symmetrizes
        persist=False,
    )
    comp = cc_log(pair_graph, max_iter=max_iter)
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(comp.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("comp"), F.col("doc_id")).alias("cluster_id"),
            (F.coalesce(F.col("comp"), F.col("doc_id")) == F.col("doc_id"))
            .alias("keep"),
        )
    )


def contamination(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    broadcast_eval: bool = True,
) -> DataFrame:
    """(id, hits) per training doc — the count of its distinct word
    k-gram shingles that appear anywhere in ``eval_docs`` (the union of
    eval shingles). Docs with zero overlap are included with hits = 0.

    Benchmark-decontamination for pretraining corpora (the GPT-3
    appendix-C / Dolma recipe): a training doc sharing k-grams with an
    eval set is suspect. 100 TB shape: eval sets are MB-scale next to the
    corpus, so the eval shingle set is BROADCAST — the corpus pays one
    shingle explode + map-side hash-join + one groupBy(id) shuffle; the
    corpus text itself never shuffles. Set ``broadcast_eval=False`` only
    for abnormally large eval unions (falls back to a shuffle join).
    """
    tr = doc_shingles(docs, text_col, id_col, k)
    ev = doc_shingles(eval_docs, text_col, id_col, k).select(
        "shingle"
    ).distinct()
    if broadcast_eval:
        ev = F.broadcast(ev)
    hits = (
        tr.join(ev, "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(id_col, F.coalesce(F.col("hits"), F.lit(0)).alias("hits"))
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_overlaps: int = 1,
    broadcast_eval: bool = True,
) -> DataFrame:
    """(id) — the keep set: training docs sharing fewer than
    ``min_overlaps`` distinct k-gram shingles with the eval set.
    Composition of :func:`contamination`; same broadcast shape."""
    cont = contamination(
        docs, eval_docs, text_col, id_col, k, broadcast_eval
    )
    return cont.filter(F.col("hits") < min_overlaps).select(id_col)


def dup_span_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """(id, total_shingles, dup_shingles, dup_frac) — per-doc distinct
    word k-gram shingles, and how many of them also occur in at least one
    OTHER document. The cross-document duplicated-span signal of Lee et
    al., "Deduplicating Training Data Makes Language Models Better"
    (ACL'22): a high ``dup_frac`` marks boilerplate-heavy documents whose
    spans are repeated across the corpus even when no whole-document
    near-dup fires.

    100 TB shape: shingles cross the shuffle as 60-bit hashes
    (functions/hashing.py), never as text, and the corpus is scanned and
    exploded exactly ONCE: doc-frequency is a window count over the
    shingle-hash partitioning instead of a separate aggregate joined
    back (which would recompute the explode subtree — plan-audited, see
    PLANS.md). Three thin exchanges (distinct, window, per-doc agg), all
    8-byte keys; all-pairs never materializes. Within-doc repeats of a
    shingle count once (distinct shingle set, the ngram_jaccard/minhash
    convention).
    """
    from pyspark.sql import Window

    from graphscope_spark.functions.text import FLOAT_DECIMALS

    sh = (
        exploded_shingles(docs, text_col, id_col, k)
        .select(id_col, hash64(F.col("shingle")).alias("h"))
        .distinct()
    )
    per = sh.select(
        id_col,
        F.count(F.lit(1)).over(Window.partitionBy("h")).alias("df"),
    )
    return (
        per.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("total_shingles"),
            F.count(F.when(F.col("df") >= 2, F.lit(1))).alias("dup_shingles"),
        )
        .select(
            id_col, "total_shingles", "dup_shingles",
            F.round(
                F.col("dup_shingles") / F.col("total_shingles"),
                FLOAT_DECIMALS,
            ).alias("dup_frac"),
        )
    )
