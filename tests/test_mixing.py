"""Mixture construction ops (functions/mixing.py): temperature-weighted
source mixing + DSIR hashed-ngram importance resampling, each checked
against an exact Python replica of its deterministic definition."""

import hashlib
import math

from pyspark.sql import functions as F

from graphscope_spark.functions.mixing import (
    hashed_gram_distribution, importance_resample, mixture_rates,
    mixture_sample,
)

HASH_SPACE = float(1 << 60)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _skewed_docs(spark):
    rows = []
    for i in range(900):
        rows.append((i, f"word{i % 7} common text", "big"))
    for i in range(900, 1000):
        rows.append((i, f"rare{i % 3} tail text", "small"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_mixture_rates_temperature(spark):
    docs = _skewed_docs(spark)
    # target 100 keeps every rate under the min(1, .) cap
    # T=1: natural proportions -> rate identical across strata
    r1 = {r["stratum"]: r["rate"] for r in
          mixture_rates(docs, 1.0, 100).collect()}
    assert abs(r1["big"] - r1["small"]) < 1e-12
    # T=0: uniform over sources -> small stratum rate is 9x big's
    r0 = {r["stratum"]: r["rate"] for r in
          mixture_rates(docs, 0.0, 100).collect()}
    assert abs(r0["small"] / r0["big"] - 9.0) < 1e-9
    # T=0.5 sits in between
    rh = {r["stratum"]: r["rate"] for r in
          mixture_rates(docs, 0.5, 100).collect()}
    assert r1["small"] < rh["small"] < r0["small"]
    # and the cap engages when the target overshoots a stratum
    rc = {r["stratum"]: r["rate"] for r in
          mixture_rates(docs, 0.0, 500).collect()}
    assert rc["small"] == 1.0


def test_mixture_sample_exact_python_oracle(spark):
    docs = _skewed_docs(spark)
    got = {r["doc_id"] for r in mixture_sample(
        docs, temperature=0.5, target_rows=300, seed=3).collect()}
    # replicate: rate per stratum, then the hash filter
    n = {"big": 900, "small": 100}
    tot = sum(v ** 0.5 for v in n.values())
    expect = set()
    for i in range(1000):
        s = "big" if i < 900 else "small"
        rate = min(1.0, 300.0 * (n[s] ** 0.5) / tot / n[s])
        if _h60(f"{i}:{s}:3") < math.floor(rate * HASH_SPACE):
            expect.add(i)
    assert got == expect
    # determinism
    again = {r["doc_id"] for r in mixture_sample(
        docs, temperature=0.5, target_rows=300, seed=3).collect()}
    assert got == again


def _gram_stream(text: str):
    toks = [t for t in text.strip().split() if t != ""]
    yield from toks
    for a, b in zip(toks, toks[1:]):
        yield f"{a} {b}"


def test_hashed_gram_distribution_exact(spark):
    docs = spark.createDataFrame(
        [(0, "a b a"), (1, ""), (2, "c")],
        "doc_id long, text string")
    got = {r["bucket"]: r["cnt"] for r in
           hashed_gram_distribution(docs, n_buckets=8).collect()}
    expect: dict[int, int] = {}
    for t in ["a b a", "", "c"]:
        for g in _gram_stream(t):
            b = _h60(g) % 8
            expect[b] = expect.get(b, 0) + 1
    assert got == expect


def test_importance_resample_selects_target_like_docs(spark):
    # corpus: 50 docs in target dialect, 150 in another; target sample
    # drawn from the dialect -> top-50 must be exactly the dialect docs
    rows = []
    for i in range(50):
        rows.append((i, f"alpha beta gamma delta{i % 5}"))
    for i in range(50, 200):
        rows.append((i, f"omega psi chi phi{i % 5}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = spark.createDataFrame(
        [(1000 + j, f"alpha beta gamma delta{j % 5}") for j in range(10)],
        "doc_id long, text string")
    sel = importance_resample(docs, target, n_select=50, n_buckets=32)
    rows_out = sel.collect()
    assert len(rows_out) == 50
    assert {r["doc_id"] for r in rows_out} == set(range(50))
    assert [r["rank"] for r in sorted(rows_out, key=lambda r: r["rank"])] \
        == list(range(1, 51))


def test_importance_resample_exact_python_oracle(spark):
    rows = [(i, f"tok{i % 4} tok{(i + 1) % 6} filler") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = docs.filter(F.col("doc_id") % 5 == 0)
    nb, alpha = 16, 1.0
    got = [(r["doc_id"], r["weight"], r["rank"])
           for r in importance_resample(
               docs, target, n_select=10, n_buckets=nb).collect()]
    raw: dict[int, int] = {}
    tgt: dict[int, int] = {}
    per_doc: dict[int, list[int]] = {}
    for i, t in rows:
        bs = [_h60(g) % nb for g in _gram_stream(t)]
        per_doc[i] = bs
        for b in bs:
            raw[b] = raw.get(b, 0) + 1
            if i % 5 == 0:
                tgt[b] = tgt.get(b, 0) + 1
    rt, tt = sum(raw.values()), sum(tgt.values())
    lr = {b: round(math.log((tgt.get(b, 0) + alpha) / (tt + alpha * nb))
                   - math.log((raw.get(b, 0) + alpha) / (rt + alpha * nb)), 6)
          for b in range(nb)}
    weights = {i: round(sum(lr[b] for b in bs), 6)
               for i, bs in per_doc.items()}
    order = sorted(weights, key=lambda i: (-weights[i], i))[:10]
    expect = [(i, weights[i], r + 1) for r, i in enumerate(order)]
    assert sorted(got, key=lambda t: t[2]) == expect


def test_lm_quality_score_exact(spark):
    from graphscope_spark.functions.text import lm_quality_score
    rows = [(0, "a a b"), (1, "a zzz"), (2, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["avg_nll"])
           for r in lm_quality_score(docs).collect()}
    # corpus: a=3, b=1, zzz=1 -> total 5, vocab 3, alpha=1
    import math
    def nll(c):
        return round(-math.log((c + 1) / (5 + 3)), 6)
    assert got[0] == (3, round((2 * nll(3) + nll(1)) / 3, 6))
    assert got[1] == (2, round((nll(3) + nll(1)) / 2, 6))
    assert 2 not in got  # empty doc excluded
    # the common token is more "likely": doc 0 scores better than doc 1
    assert got[0][1] < got[1][1]
