"""BPE merge learning — hand-computed merges incl. the overlap case."""

import pytest

from graphscope_spark.functions.bpe import bpe_symbol_freq, bpe_train
from graphscope_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark("test-bpe", cpus=4, shuffle_partitions=4)


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_bpe_learns_most_frequent_pair(spark):
    # corpus: "ab" x3, "abc" x2 -> pairs: (a,b)=5, (b,c)=2
    docs = _docs(spark, ["ab ab abc", "ab abc"])
    merges, state = bpe_train(docs, n_merges=2)
    assert merges[0][1:] == ("a", "b", 5)
    # round 2: state is [ab]x3, [ab,c]x2 -> only pair (ab, c)=2
    assert merges[1][1:] == ("ab", "c", 2)
    rows = {(r["word"], r["pos"], r["sym"]) for r in state.collect()}
    assert rows == {("ab", 1, "ab"), ("abc", 1, "abc")}


def test_bpe_greedy_overlap_run(spark):
    # "aaaa": (a,a) appears 3 times overlapping (count=3) but greedy
    # left-to-right merges positions 1-2 and 3-4 -> [aa, aa]
    docs = _docs(spark, ["aaaa"])
    merges, state = bpe_train(docs, n_merges=1)
    assert merges[0][1:] == ("a", "a", 3)  # overlapping count
    rows = sorted((r["pos"], r["sym"]) for r in state.collect())
    assert rows == [(1, "aa"), (3, "aa")]


def test_bpe_greedy_odd_run(spark):
    # "aaa": greedy merges 1-2, leaves trailing a -> [aa, a]
    docs = _docs(spark, ["aaa"])
    _, state = bpe_train(docs, n_merges=1)
    rows = sorted((r["pos"], r["sym"]) for r in state.collect())
    assert rows == [(1, "aa"), (3, "a")]


def test_bpe_tie_break_lexicographic(spark):
    # (a,b) and (c,d) both count 1 -> pick (a,b)
    docs = _docs(spark, ["ab cd"])
    merges, _ = bpe_train(docs, n_merges=1)
    assert merges[0][1:3] == ("a", "b")


def test_bpe_symbol_freq_weights_by_word_count(spark):
    # "ab" occurs 3x, "cd" 1x; merge 1 = (a,b) -> freqs: ab=3, c=1, d=1
    docs = _docs(spark, ["ab ab cd", "ab"])
    got = {r["sym"]: r["freq"] for r in bpe_symbol_freq(docs, 1).collect()}
    assert got == {"ab": 3, "c": 1, "d": 1}


def test_bpe_exhausted_corpus_stops_early(spark):
    # single 1-char word: no pairs at all -> zero merges, state unchanged
    docs = _docs(spark, ["a a a"])
    merges, state = bpe_train(docs, n_merges=3)
    assert merges == []
    assert [(r["word"], r["pos"], r["sym"]) for r in state.collect()] == [
        ("a", 1, "a")
    ]


def test_bpe_encode_piece_counts(spark):
    from graphscope_spark.functions.bpe import bpe_encode
    # merge 1 = (a,b) df... corpus: "ab ab abc", "ab abc" -> after 2
    # merges words segment as ab->[ab] (1 piece), abc->[abc] (1 piece)
    docs = _docs(spark, ["ab ab abc", "ab abc"])
    got = {r["doc_id"]: (r["n_words"], r["bpe_pieces"])
           for r in bpe_encode(docs, n_merges=2).collect()}
    assert got == {0: (3, 3), 1: (2, 2)}
    # with 1 merge only: ab->[ab]=1 piece, abc->[ab, c]=2 pieces
    got1 = {r["doc_id"]: (r["n_words"], r["bpe_pieces"])
            for r in bpe_encode(docs, n_merges=1).collect()}
    assert got1 == {0: (3, 4), 1: (2, 3)}
