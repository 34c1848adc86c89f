"""BM25 / TF-IDF retrieval scoring — exact Python oracles on tiny corpora."""

import math

import pytest

from graphscope_spark.functions.retrieval import bm25_score, tfidf_top_terms
from graphscope_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark("test-retrieval", cpus=4, shuffle_partitions=4)


ROWS = [
    (0, "join join window sort"),
    (1, "join stream"),
    (2, "sort sort sort"),
    (3, ""),
]


def _docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def _bm25_oracle(query, k1=1.2, b=0.75):
    toks = {i: t.split() for i, t in ROWS if t.strip()}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfs = {q: sum(1 for v in toks.values() if q in v) for q in query}
    out = {}
    for i, v in toks.items():
        score_u, matched = 0, 0
        for q in query:
            tf = v.count(q)
            if tf == 0:
                continue
            matched += 1
            idf = math.log(1.0 + (n - dfs[q] + 0.5) / (dfs[q] + 0.5))
            c = idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * len(v) / avgdl))
            score_u += round(c * 1_000_000)
        if matched:
            out[i] = (matched, round(score_u / 1_000_000, 6))
    return out


def test_bm25_exact(spark):
    query = ["join", "stream", "nosuchterm"]
    got = {
        r["doc_id"]: (r["n_matched"], r["score"])
        for r in bm25_score(_docs(spark), query).collect()
    }
    assert got == _bm25_oracle(query)
    # rarer term scores higher: doc 1 has both 'join' (df=2) and
    # 'stream' (df=1); its per-term contributions must favor 'stream'
    assert 2 not in got  # no query term in doc 2
    assert 3 not in got  # empty doc


def test_bm25_rare_term_outranks_common(spark):
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_score(_docs(spark), ["stream"]).collect()
    }
    common = {
        r["doc_id"]: r["score"]
        for r in bm25_score(_docs(spark), ["join"]).collect()
    }
    # 'stream' (df=1) carries more idf than 'join' (df=2) at equal tf/dl
    assert got[1] > common[1]


def test_tfidf_top_terms_exact(spark):
    got = tfidf_top_terms(_docs(spark), top_n=2).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["rank"], r["term"], r["tfidf"])
        )
    for v in by_doc.values():
        v.sort()
    n = 3  # docs with tokens
    def tfidf(tf, df):
        return round(
            round(tf * (math.log((n + 1.0) / (df + 1.0)) + 1.0) * 1e6)
            / 1e6,
            6,
        )
    # doc 0: join tf=2 df=2, window tf=1 df=1, sort tf=1 df=2
    assert by_doc[0] == [
        (1, "join", tfidf(2, 2)),
        (2, "window", tfidf(1, 1)),
    ]
    # doc 2: only 'sort' — a single row, rank 1
    assert by_doc[2] == [(1, "sort", tfidf(3, 2))]
    # tie-break: doc 1 join tf=1 df=2, stream tf=1 df=1 — stream wins on
    # idf, not alphabet
    assert by_doc[1][0][1] == "stream"
    assert 3 not in by_doc


def test_chunk_documents_windows(spark):
    from graphscope_spark.functions.text import chunk_documents
    docs = spark.createDataFrame(
        [(0, " ".join(f"t{i}" for i in range(10))), (1, "a b"), (2, "")],
        "doc_id long, text string",
    )
    got = sorted(
        (r["doc_id"], r["chunk"], r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(docs, chunk_tokens=4, overlap=1).collect()
    )
    # doc 0: 10 tokens, stride 3 -> 1 + ceil((10-4)/3) = 3 chunks at
    # offsets 0,3,6 covering t0..t9 with 1-token overlaps
    assert got == [
        (0, 0, 4, "t0 t1 t2 t3"),
        (0, 1, 4, "t3 t4 t5 t6"),
        (0, 2, 4, "t6 t7 t8 t9"),
        (1, 0, 2, "a b"),
    ]


def test_pmi_pairs_exact(spark):
    from graphscope_spark.functions.retrieval import pmi_pairs
    import math
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a b"), (2, "a c"), (3, "c d")],
        "doc_id long, text string",
    )
    got = {(r["x"], r["y"]): (r["n_xy"], r["pmi"])
           for r in pmi_pairs(docs, min_pair_docs=1, top_n=10).collect()}
    def pmi(nxy, nx, ny):
        u = round(math.log(4.0 * nxy / (nx * ny)) * 1e6)
        return round(u / 1e6, 6)
    # a:3 docs, b:2, c:2, d:1
    assert got[("a", "b")] == (2, pmi(2, 3, 2))
    assert got[("a", "c")] == (1, pmi(1, 3, 2))
    assert got[("c", "d")] == (1, pmi(1, 2, 1))
    # (b, c) never co-occur -> absent
    assert ("b", "c") not in got
    # exclusive pair (c,d) has the highest association
    assert got[("c", "d")][1] == max(v[1] for v in got.values())
