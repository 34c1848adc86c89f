"""Distributed BPE merge learning over the corpus word-frequency table.

Byte-pair-encoding vocabulary induction (Sennrich et al. 2016; the GPT-2 /
sentencepiece training loop) as a pure DataFrame computation: start from
characters, repeatedly (1) count adjacent symbol pairs weighted by word
frequency, (2) pick the most frequent pair, (3) merge its occurrences
greedily left-to-right inside every word. No Python loops over words, no
UDFs — each round is two window passes and one aggregate over the
(word, pos, sym) long-form state.

The subtle bit is step 3's greedy non-overlap semantics. Overlapping
matches exist only when the pair is a run of one symbol (x == y: "aaa"
matches (a,a) at positions 1 and 2 but greedy merges only position 1).
Relationally: group consecutive matches into chains (a match chains to
the previous one iff it starts where that one ended) and apply the
odd-indexed matches of each chain — exactly left-to-right greedy. For
x != y matches can never overlap, and the chain rule degenerates to
"apply all" (every chain has length 1) — one uniform construction, no
special case.

Pair counting is OVERLAPPING (both (a,a) occurrences in "aaa" count) —
the convention of the reference implementations; selection ties break to
the lexicographically smallest (x, y).

Scale shape per round: state is (word, pos, sym, cnt) for DISTINCT words
(long-form; |rows| = Σ word lengths over the vocabulary, shrinking every
round) hash-partitioned by word; pair counting is one in-partition window
(lead) + one map-side-combined aggregate; the argmax is a 1-row driver
collect (the allreduce analog); the merge application is one in-partition
window pass + anti-join/union rebuild, localCheckpoint'd so round r+1
sees a flat plan. Nothing ever shuffles the corpus text — only the
vocabulary table.

The DuckDB twin (doc_oracles.bpe_sql) unrolls the same construction per
round and is exact: every quantity is an integer count or a string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graphscope_spark.functions.text import tokenize

__all__ = ["bpe_train", "bpe_symbol_freq", "bpe_encode"]


def _initial_state(
    docs: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(word, cnt, pos, sym) — every distinct corpus word split into
    1-based character positions (substring — identical in both engines),
    carrying the word's corpus frequency."""
    words = (
        docs.select(F.explode(tokenize(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return words.select(
        "word",
        "cnt",
        F.posexplode(F.split("word", "")).alias("pos0", "sym"),
    ).select(
        "word", "cnt", (F.col("pos0") + 1).alias("pos"), "sym"
    ).filter(F.col("sym") != "")


def _adjacent_pairs(state: DataFrame) -> DataFrame:
    """(word, cnt, pos, nxt_pos, x, y) — consecutive symbol pairs in
    position order (positions keep gaps after merges; lead() defines
    adjacency)."""
    w = Window.partitionBy("word").orderBy("pos")
    return (
        state.select(
            "word",
            "cnt",
            "pos",
            F.col("sym").alias("x"),
            F.lead("pos").over(w).alias("nxt_pos"),
            F.lead("sym").over(w).alias("y"),
        )
        .filter(F.col("y").isNotNull())
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges. Returns (merges, final_state):
    merges = [(round, x, y, pair_count)], final_state = the
    (word, cnt, pos, sym) table after applying them."""
    state = _initial_state(docs, text_col, id_col).localCheckpoint(
        eager=True
    )
    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, n_merges + 1):
        pairs = _adjacent_pairs(state)
        best_rows = (
            pairs.groupBy("x", "y")
            .agg(F.sum("cnt").alias("total"))
            .orderBy(F.col("total").desc(), "x", "y")
            .limit(1)
            .collect()
        )
        if not best_rows:
            break
        bx, by, btotal = (
            best_rows[0]["x"],
            best_rows[0]["y"],
            int(best_rows[0]["total"]),
        )
        merges.append((r, bx, by, btotal))

        matched = pairs.filter(
            (F.col("x") == F.lit(bx)) & (F.col("y") == F.lit(by))
        )
        # chain matches: a match continues the chain iff it starts at the
        # previous match's end position; odd chain ranks are applied
        wm = Window.partitionBy("word").orderBy("pos")
        chained = matched.withColumn(
            "new_chain",
            F.when(
                F.lag("nxt_pos").over(wm) == F.col("pos"), 0
            ).otherwise(1),
        ).withColumn(
            "chain",
            F.sum("new_chain").over(
                wm.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        wc = Window.partitionBy("word", "chain").orderBy("pos")
        applied = (
            chained.withColumn("rnk", F.row_number().over(wc))
            .filter(F.col("rnk") % 2 == 1)
            .select("word", "pos", "nxt_pos")
        )
        removed = applied.select("word", F.col("pos").alias("p")).unionByName(
            applied.select("word", F.col("nxt_pos").alias("p"))
        )
        merged_rows = applied.join(
            state.select("word", "cnt").distinct(), "word"
        ).select(
            "word", "cnt", "pos", F.lit(bx + by).alias("sym")
        )
        state = (
            state.join(
                removed.withColumnRenamed("p", "pos"),
                ["word", "pos"],
                "left_anti",
            )
            .unionByName(merged_rows)
            .localCheckpoint(eager=True)
        )
    return merges, state


def bpe_symbol_freq(
    docs: DataFrame,
    n_merges: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(sym, freq) — corpus symbol frequencies AFTER ``n_merges`` learned
    merges (freq = Σ word_cnt over symbol occurrences). The verifiable
    end-to-end surface: a wrong merge choice or a wrong greedy
    application changes this table."""
    _, state = bpe_train(docs, n_merges, text_col, id_col)
    return state.groupBy("sym").agg(F.sum("cnt").alias("freq"))


def _spark() -> SparkSession:  # pragma: no cover - convenience
    return SparkSession.getActiveSession()


def bpe_encode(
    docs: DataFrame,
    n_merges: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_words, bpe_pieces) — per-document token-piece counts
    under the vocabulary learned by :func:`bpe_train` on the SAME corpus:
    the final merge state is exactly each corpus word's segmentation, so
    application is one broadcast-sized join of the token stream against
    the per-word piece counts (no per-document merge replay). The
    learn→apply loop a tokenizer build runs: train on the corpus, then
    budget every document in learned pieces."""
    _, state = bpe_train(docs, n_merges, text_col, id_col)
    seg = state.groupBy("word").agg(F.count(F.lit(1)).alias("n_pieces"))
    stream = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize(text_col)).alias("word"),
    ).filter(F.col("word") != "")
    return (
        stream.join(seg, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_pieces").alias("bpe_pieces"),
        )
    )
