"""Pipeline-operator tests over the driver's documents/embeddings tables:
exact dedup, MinHash/LSH (planted near-dups recovered), SimHash, n-gram
Jaccard, ANN brute-force vs numpy oracle, LSH recall, text analysis parity
vs python oracles, multimodal plumbing."""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from graphscope_spark.functions import (
    ann_brute_force, ann_lsh, dedup_exact, doc_stats, documents_as_media,
    embedding_neardup_pairs, fake_decode_meta, fingerprint, frame_sample_plan,
    lang_id, media_metadata, minhash_lsh_pairs, minhash_signatures,
    ngram_jaccard_pairs, quality_score, simhash64, simhash_neardup_pairs,
)
from graphscope_spark.functions.text import STOPWORDS


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def docs_with_dups(spark, docs):
    """documents ∪ planted near/exact duplicates with doc_id offset 1M."""
    base = docs.limit(20)
    exact = base.select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                        "text", "lang", "source", "n_chars")
    # near-dup: append two tokens
    near = base.select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra token")).alias("text"),
        "lang", "source", "n_chars",
    )
    return docs.unionByName(exact).unionByName(near).cache()


def test_dedup_exact(docs_with_dups, docs):
    survivors = dedup_exact(docs_with_dups)
    n_docs = docs.count()
    # every planted exact dup collapses onto its original (min id)
    assert survivors.count() == n_docs + 20  # near-dups survive exact dedup
    assert survivors.filter(F.col("doc_id") >= 1_000_000).count() == 20


def test_minhash_lsh_finds_planted_dups(docs_with_dups):
    pairs = minhash_lsh_pairs(docs_with_dups, verify_threshold=0.8)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    # all 20 exact pairs must be found (jaccard 1.0, identical signatures)
    for i in range(20):
        assert any(a == i and b == i + 1_000_000 for a, b in got), i
    # most near-dup pairs too (jaccard just below 1)
    near_found = sum(
        1 for i in range(20) if any(a == i and b == i + 2_000_000 for a, b in got)
    )
    assert near_found >= 15


def test_minhash_signature_deterministic(docs):
    s1 = minhash_signatures(docs.limit(10)).collect()
    s2 = minhash_signatures(docs.limit(10)).collect()
    assert {r["doc_id"]: r["sig"] for r in s1} == {r["doc_id"]: r["sig"] for r in s2}


def test_ngram_jaccard(docs_with_dups):
    pairs = ngram_jaccard_pairs(docs_with_dups.filter(
        (F.col("doc_id") < 20) | (F.col("doc_id") >= 1_000_000)
    ), threshold=0.9)
    got = {(r["a"], r["b"]): r["jaccard"] for r in pairs.collect()}
    for i in range(20):
        assert math.isclose(got[(i, i + 1_000_000)], 1.0)


def test_simhash_properties(docs_with_dups):
    sh = {r["doc_id"]: r["simhash"] for r in simhash64(docs_with_dups).collect()}
    # exact dups → identical simhash; near-dups → small hamming distance
    for i in range(20):
        assert sh[i] == sh[i + 1_000_000]
        ham = bin((sh[i] ^ sh[i + 2_000_000]) & (2**64 - 1)).count("1")
        assert ham <= 12, (i, ham)
    pairs = simhash_neardup_pairs(docs_with_dups, max_hamming=3)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    for i in range(20):
        assert (i, i + 1_000_000) in got


def test_ann_brute_force_vs_numpy(emb):
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1)[:, None]
    queries = emb.filter(F.col("vec_id") < 5)
    got = ann_brute_force(emb, queries, k=10)
    res = {}
    for r in got.collect():
        res.setdefault(r["query_id"], []).append((r["neighbor_id"], r["score"]))
    sims = mat @ mat.T
    for q in range(5):
        qi = int(np.where(ids == q)[0][0])
        order = sorted(
            [(int(i), round(float(s), 6)) for i, s in zip(ids, sims[qi]) if i != q],
            key=lambda t: (-t[1], t[0]),
        )[:10]
        assert res[q] == order, q


def test_ann_lsh_recall(emb):
    queries = emb.filter(F.col("vec_id") < 20)
    exact = ann_brute_force(emb, queries, k=5)
    approx = ann_lsh(emb, queries, k=5, dim=64, n_planes=4, n_tables=8)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.4, recall  # multi-table sign-LSH on random vectors


def test_embedding_neardup_symmetry(emb):
    pairs = embedding_neardup_pairs(emb, threshold=0.9, n_planes=4, n_tables=4)
    rows = pairs.collect()
    for r in rows:
        assert r["a"] < r["b"]
        assert r["score"] >= 0.9


def test_text_stats_vs_python(docs):
    got = {r["doc_id"]: r for r in doc_stats(docs.limit(50)).collect()}
    for row in docs.limit(50).collect():
        toks = row["text"].strip().split()
        g = got[row["doc_id"]]
        assert g["n_tokens"] == len(toks)
        assert g["n_chars"] == len(row["text"])
        sw = sum(1 for t in toks if t in STOPWORDS["en"])
        assert abs(g["stopword_ratio"] - round(sw / len(toks), 6)) < 1e-9
        punct = len(re.findall(r"[\.,;:!\?]", row["text"]))
        assert abs(g["punct_ratio"] - round(punct / len(row["text"]), 6)) < 1e-9


def test_quality_and_lang_deterministic(docs):
    q1 = {r["doc_id"]: r["quality"] for r in quality_score(docs).collect()}
    q2 = {r["doc_id"]: r["quality"] for r in quality_score(docs).collect()}
    assert q1 == q2
    assert all(0.0 <= v <= 1.0 for v in q1.values())
    langs = {r["lang_guess"] for r in lang_id(docs).collect()}
    assert langs <= set(STOPWORDS)


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "c b a"), (3, "a b c")], "doc_id long, text string"
    )
    fp = {r["doc_id"]: r["fp"] for r in fingerprint(df).collect()}
    assert fp[1] == fp[3]
    assert fp[1] != fp[2]


def test_multimodal_plumbing(docs):
    media = documents_as_media(docs.limit(30))
    meta = media_metadata(media)
    rows = meta.collect()
    assert len(rows) == 30
    by_id = {r["media_id"]: r for r in rows}
    src = {r["doc_id"]: r["text"] for r in docs.limit(30).collect()}
    for mid, r in by_id.items():
        assert r["sha256"] == hashlib.sha256(src[mid].encode()).hexdigest()
        assert r["n_bytes"] == len(src[mid].encode())
    dec = fake_decode_meta(media).collect()
    assert len(dec) == 30
    for r in dec:
        assert 1 <= r["width"] <= 1920 and 1 <= r["height"] <= 1080
    # determinism of the fake decode
    dec2 = fake_decode_meta(media).collect()
    assert sorted(map(tuple, dec)) == sorted(map(tuple, dec2))
    plan = frame_sample_plan(media, every_n=60)
    assert plan.filter(F.col("frame_idx") % 60 != 0).count() == 0


def test_decode_compressed_formats_rejected():
    """Compressed formats need codec libraries absent here — decode_image
    is REAL for PPM/BMP (see the roundtrip tests) and refuses the rest."""
    from graphscope_spark.functions.multimodal import decode_image
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG")


def test_ann_ivf_recall_and_exhaustive(emb):
    from graphscope_spark.functions.similarity import ann_ivf

    queries = emb.filter(F.col("vec_id") < 20)
    exact = ann_brute_force(emb, queries, k=5)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    # probing some lists: partial recall
    approx = ann_ivf(emb, queries, k=5, nlist=8, nprobe=3)
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert len(a & e) / len(e) >= 0.4
    # probing every list: identical to brute force (same tie-breaking)
    full = ann_ivf(emb, queries, k=5, nlist=8, nprobe=8)
    f = {(r["query_id"], r["neighbor_id"], r["score"]) for r in full.collect()}
    ee = {(r["query_id"], r["neighbor_id"], r["score"]) for r in exact.collect()}
    assert f == ee


def test_ann_ivf_deterministic(emb):
    from graphscope_spark.functions.similarity import ann_ivf

    queries = emb.filter(F.col("vec_id") < 5)
    r1 = sorted(map(tuple, ann_ivf(emb, queries, k=3, nlist=8, nprobe=2).collect()))
    r2 = sorted(map(tuple, ann_ivf(emb, queries, k=3, nlist=8, nprobe=2).collect()))
    assert r1 == r2


def test_multimodal_resize_and_features(docs):
    from graphscope_spark.functions.multimodal import (
        documents_as_media, fake_feature_extract, fake_resize_meta,
    )
    from graphscope_spark.functions.similarity import ann_brute_force

    media = documents_as_media(docs.limit(60))
    rs = fake_resize_meta(media, max_side=256).collect()
    assert len(rs) == 60
    for r in rs:
        assert max(r["out_width"], r["out_height"]) <= 256
        assert r["out_width"] >= 1 and r["out_height"] >= 1
        # aspect preserved within rounding
        if r["scale"] < 1.0:
            # rounding error bound ~0.5/min(dim); small dims allow more slack
            assert abs(r["out_width"] / r["width"] - r["out_height"] / r["height"]) < 0.05
    feats = fake_feature_extract(media, dim=16)
    rows = feats.collect()
    assert len(rows) == 60 and all(len(r["embedding"]) == 16 for r in rows)
    # deterministic across recomputation
    again = {r["media_id"]: r["embedding"] for r in fake_feature_extract(media, 16).collect()}
    for r in rows:
        assert again[r["media_id"]] == r["embedding"]
    # feeds the ANN layer directly
    emb = feats.withColumnRenamed("media_id", "vec_id")
    topk = ann_brute_force(emb, emb.filter(F.col("vec_id") < 3), k=2)
    assert topk.count() == 6


def test_dedup_clusters_planted(docs_with_dups):
    from graphscope_spark.functions.dedup import dedup_clusters
    out = dedup_clusters(docs_with_dups, threshold=0.8).cache()
    rows = {r["doc_id"]: (r["cluster_id"], r["keep"]) for r in out.collect()}
    # each planted exact dup (base+1M) clusters with its original under the
    # original's (min) id and is dropped
    for base_id in [d for d in rows if d < 1_000_000 and d + 1_000_000 in rows][:20]:
        dup = base_id + 1_000_000
        if rows[dup][0] == base_id:  # clustered together
            assert rows[dup][1] is False
            assert rows[base_id][1] is True
    # exactly one keeper per cluster, and keepers are their own cluster id
    import collections
    keepers = collections.Counter()
    for d, (c, keep) in rows.items():
        if keep:
            keepers[c] += 1
            assert c == d
    assert all(v == 1 for v in keepers.values())
    # every cluster id has a keeper
    assert set(keepers) == {c for c, _ in rows.values()}


def test_dedup_clusters_lsh_matches_ngram_on_exact_dups(docs_with_dups):
    from graphscope_spark.functions.dedup import dedup_clusters
    ng = dedup_clusters(docs_with_dups, threshold=0.95, method="ngram")
    lsh = dedup_clusters(docs_with_dups, threshold=0.95, method="lsh")
    # exact duplicates collide in every LSH band, so at a high threshold
    # both methods find the identical cluster structure
    a = {(r["doc_id"], r["cluster_id"], r["keep"]) for r in ng.collect()}
    b = {(r["doc_id"], r["cluster_id"], r["keep"]) for r in lsh.collect()}
    assert a == b


def test_token_histogram_counts(spark):
    from graphscope_spark.functions.text import token_histogram
    d = spark.createDataFrame(
        [(1, "a b a"), (2, "b c"), (3, "  ")],
        "doc_id long, text string",
    )
    got = {r["token"]: (r["cnt"], r["docs"])
           for r in token_histogram(d).collect()}
    assert got == {"a": (2, 1), "b": (2, 2), "c": (1, 1)}
    got2 = {r["token"] for r in token_histogram(d, min_count=2).collect()}
    assert got2 == {"a", "b"}


def test_stratified_sample_deterministic_and_proportional(docs):
    from graphscope_spark.functions.text import stratified_sample
    s1 = {r["doc_id"] for r in
          stratified_sample(docs, "lang", 0.5, seed=3).collect()}
    s2 = {r["doc_id"] for r in
          stratified_sample(docs, "lang", 0.5, seed=3).collect()}
    assert s1 == s2  # exactly reproducible
    n = docs.count()
    assert 0.35 * n < len(s1) < 0.65 * n  # concentrates near the fraction
    # different seed → different (but overlapping) sample
    s3 = {r["doc_id"] for r in
          stratified_sample(docs, "lang", 0.5, seed=4).collect()}
    assert s3 != s1


def test_repetition_stats_exact(spark):
    from graphscope_spark.functions.text import repetition_stats
    d = spark.createDataFrame(
        [
            # 4 lines, one duplicated; "a b" bigram appears twice
            (1, "a b c\na b d\na b c\nx y"),
            # no repetition at all
            (2, "p q r s"),
            # single token: no bigrams
            (3, "solo"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in repetition_stats(d).collect()}
    # doc 1: 4 lines, 3 distinct -> 0.25; 11 tokens, 6 distinct
    assert rows[1].dup_line_frac == 0.25
    assert abs(rows[1].dup_word_frac - (1 - 6 / 11)) < 1e-6
    # doc 1 text has 21 chars; top bigram "a b" (len 3) occurs 3 times
    assert abs(rows[1].top_bigram_char_frac - 9 / 21) < 1e-6
    assert rows[2].dup_line_frac == 0.0
    assert rows[2].dup_word_frac == 0.0
    assert rows[3].top_bigram_char_frac == 0.0


def test_gopher_filter_rules(spark):
    from graphscope_spark.functions.text import gopher_filter
    d = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "spam spam spam spam spam spam spam spam"),  # dup words
            (3, "too short"),  # < min_tokens
        ],
        ["doc_id", "text"],
    )
    keep = {r.doc_id: r.keep for r in gopher_filter(d).collect()}
    assert keep[1] is True
    assert keep[2] is False
    assert keep[3] is False


def test_mask_pii_exact(spark):
    from graphscope_spark.functions.text import mask_pii
    d = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@sub.example.org or call 5551234567"),
            (2, "see https://example.com/a?b=1 and http://x.io ok"),
            (3, "clean text with short digits 123"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in mask_pii(d).collect()}
    assert rows[1].masked == "mail me at <EMAIL> or call <ID>"
    assert (rows[1].n_emails, rows[1].n_urls, rows[1].n_ids) == (1, 0, 1)
    assert rows[2].masked == "see <URL> and <URL> ok"
    assert rows[2].n_urls == 2
    assert rows[3].masked == rows[3].masked.replace("<", "<")  # unchanged
    assert (rows[3].n_emails, rows[3].n_urls, rows[3].n_ids) == (0, 0, 0)
    assert rows[3].masked == "clean text with short digits 123"


def test_pack_documents_invariants(docs):
    from graphscope_spark.functions.text import pack_documents
    packed = pack_documents(docs, max_tokens=64, n_shards=4).cache()
    rows = packed.collect()
    assert len(rows) == docs.count()
    # per-shard stream: offsets restart, bins increase with stream position
    by_shard = {}
    for r in rows:
        assert 0 <= r.offset < 64
        assert r.bin >= 0
        by_shard.setdefault(r.shard, []).append(r)
    # replay each shard's stream: start offsets must be the running cumsum
    from graphscope_spark.functions.hashing import hash64
    import pyspark.sql.functions as F
    hcol = hash64(F.concat(F.col("doc_id").cast("string"), F.lit(":0")))
    order = {
        r.doc_id: (r.h, r.doc_id)
        for r in docs.select("doc_id", hcol.alias("h")).collect()
    }
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: order[r.doc_id])
        cum = 0
        for r in rs:
            assert r.bin == cum // 64
            assert r.offset == cum % 64
            cum += r.n_tokens
    # determinism
    again = pack_documents(docs, max_tokens=64, n_shards=4)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


# ------------------------------------------------------------------ #
# contamination / decontaminate (benchmark n-gram decontamination)
# ------------------------------------------------------------------ #


def test_contamination_python_oracle(spark):
    from graphscope_spark.functions.dedup import contamination

    rows = [
        (1, "the cat sat on the mat today"),
        (2, "dogs bark loudly at night always"),
        (3, "completely unrelated words here entirely now"),
    ]
    ev_rows = [(100, "the cat sat on the mat")]  # overlaps doc 1 only
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ev = spark.createDataFrame(ev_rows, "doc_id long, text string")
    got = {r.doc_id: r.hits for r in contamination(docs, ev, k=3).collect()}

    def sh3(t):
        toks = t.split()
        if len(toks) < 3:
            return {" ".join(toks)}
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    ev_sh = set().union(*[sh3(t) for _, t in ev_rows])
    want = {i: len(sh3(t) & ev_sh) for i, t in rows}
    assert got == want
    assert got[3] == 0  # clean doc present with zero hits


def test_decontaminate_keeps_clean_docs(spark):
    from graphscope_spark.functions.dedup import decontaminate

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "zeta eta theta iota")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(9, "alpha beta gamma epsilon")], "doc_id long, text string"
    )
    keep = {r.doc_id for r in decontaminate(docs, ev, k=3).collect()}
    assert keep == {2}
    # min_overlaps above the overlap count keeps everything
    keep2 = {r.doc_id
             for r in decontaminate(docs, ev, k=3, min_overlaps=5).collect()}
    assert keep2 == {1, 2}


def test_contamination_eval_subset_is_fully_contaminated(docs):
    from graphscope_spark.functions.dedup import contamination

    ev = docs.filter(F.col("doc_id") % 97 == 0)
    got = contamination(docs, ev, k=3)
    # every eval doc overlaps itself: hits >= 1 on the eval subset
    n_eval = ev.count()
    n_hit = got.join(ev.select("doc_id"), "doc_id").filter("hits >= 1").count()
    assert n_hit == n_eval
    assert got.count() == docs.select("doc_id").distinct().count()


def test_dup_span_stats_python_oracle(spark):
    from graphscope_spark.functions.dedup import dup_span_stats

    # docs 1 and 2 share the 3-gram span "big red fox jumps"; doc 3 is
    # clean; doc 4 repeats a shingle INTERNALLY only (counts once, not dup)
    rows = [
        (1, "the big red fox jumps over logs"),
        (2, "a big red fox jumps again"),
        (3, "completely unrelated words appear here"),
        (4, "go go go go go"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.total_shingles, r.dup_shingles, r.dup_frac)
           for r in dup_span_stats(docs, k=3).collect()}

    def sh3(t):
        toks = t.split()
        if len(toks) < 3:
            return {" ".join(toks)}
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    sets = {i: sh3(t) for i, t in rows}
    want = {}
    for i, s in sets.items():
        dup = sum(1 for x in s
                  if any(x in o for j, o in sets.items() if j != i))
        want[i] = (len(s), dup, round(dup / len(s), 6))
    assert got == want
    assert got[3][1] == 0  # clean doc has zero duplicated spans
    # internal repeats collapse to ONE distinct shingle and are not dups
    assert got[4] == (1, 0, 0.0)
    assert got[1][1] == 2 and got[2][1] == 2  # "big red fox", "red fox jumps"


# ---------------------------------------------------------------- #
# real multimodal decode (PPM / BMP / WAV — numpy + stdlib only)
# ---------------------------------------------------------------- #


def test_decode_image_ppm_roundtrip():
    import numpy as np
    from graphscope_spark.functions.multimodal import decode_image

    w, h = 5, 3
    px = (np.arange(w * h * 3) % 256).astype(np.uint8)
    payload = b"P6\n# a comment\n%d %d\n255\n" % (w, h) + px.tobytes()
    gw, gh, gc, got = decode_image(payload)
    assert (gw, gh, gc) == (w, h, 3)
    assert np.array_equal(got, px.reshape(h, w, 3))


def test_decode_image_bmp_roundtrip():
    import struct
    import numpy as np
    from graphscope_spark.functions.multimodal import decode_image

    # hand-assemble a 3x2 24-bit BMP (bottom-up rows, 4-byte padded)
    w, h = 3, 2
    rgb = np.arange(w * h * 3, dtype=np.uint8).reshape(h, w, 3)
    stride = (w * 3 + 3) & ~3
    raster = b""
    for row in rgb[::-1]:          # bottom-up
        line = row[:, ::-1].tobytes()  # RGB → BGR
        raster += line + b"\0" * (stride - len(line))
    off = 14 + 40
    header = (b"BM" + struct.pack("<IHHI", off + len(raster), 0, 0, off)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(raster), 2835, 2835, 0, 0))
    gw, gh, gc, got = decode_image(header + raster)
    assert (gw, gh, gc) == (w, h, 3)
    assert np.array_equal(got, rgb)


def test_decode_audio_wav_roundtrip():
    import io
    import wave
    import numpy as np
    from graphscope_spark.functions.multimodal import decode_audio

    s = ((np.arange(400) * 13) % 65536 - 32768).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1); wf.setsampwidth(2); wf.setframerate(8000)
        wf.writeframes(s.tobytes())
    sr, ch, n, got = decode_audio(buf.getvalue())
    assert (sr, ch, n) == (8000, 1, 400)
    assert np.array_equal(got[:, 0], s)


def test_decode_image_rejects_compressed():
    import pytest as pt
    from graphscope_spark.functions.multimodal import decode_image
    with pt.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0fakejpeg")


def test_decode_media_meta_end_to_end(spark):
    from graphscope_spark.functions.multimodal import (
        decode_media_meta, synthesize_media,
    )

    media = synthesize_media(spark, 30)
    meta = {r.media_id: r for r in decode_media_meta(media).collect()}
    assert len(meta) == 30
    for mid, r in meta.items():
        if mid % 2 == 0:  # PPM image: dims from the generator formula
            assert (r.width, r.height, r.n_channels) == (
                8 + mid % 25, 8 + mid % 17, 3)
            assert r.sample_rate is None and r.duration_s is None
        else:             # WAV audio
            n = 800 + mid % 1600
            assert (r.sample_rate, r.n_channels, r.n_samples) == (8000, 1, n)
            assert r.duration_s == round(n / 8000, 6)
            assert r.width is None


def test_decode_media_meta_unknown_format_yields_nulls(spark):
    from graphscope_spark.functions.multimodal import decode_media_meta

    media = spark.createDataFrame(
        [(1, bytearray(b"\x89PNG\r\n\x1a\nnotdecodable"))],
        "media_id long, payload binary")
    r = decode_media_meta(media).collect()[0]
    assert r.media_id == 1 and r.width is None and r.sample_rate is None


def test_image_grid_features_real_pixels(spark):
    import numpy as np
    from graphscope_spark.functions.multimodal import (
        image_grid_features, synthesize_media,
    )

    media = synthesize_media(spark, 10)
    feats = {r.media_id: r.embedding
             for r in image_grid_features(media, grid=4).collect()}
    assert set(feats) == {0, 2, 4, 6, 8}  # images only
    for mid, v in feats.items():
        assert len(v) == 16
        assert abs(np.linalg.norm(v) - 1.0) < 1e-9
    # oracle one embedding exactly: decode id=2's PPM and block-mean it
    from graphscope_spark.functions.multimodal import decode_image
    payload = [r.payload for r in media.filter("media_id = 2").collect()][0]
    w, h, _, px = decode_image(bytes(payload))
    lum = px.mean(axis=2)
    grid = 4
    want = np.zeros(16); cnt = np.zeros(16)
    for y in range(h):
        for x in range(w):
            b = min(y * grid // h, grid - 1) * grid + min(x * grid // w, grid - 1)
            want[b] += lum[y, x]; cnt[b] += 1
    want = want / np.maximum(cnt, 1)
    want = want / np.linalg.norm(want)
    assert np.allclose(feats[2], want, atol=1e-12)


def test_token_counts_python_oracle(spark):
    import re as _re
    from graphscope_spark.functions.text import BPE_PRETOKEN_RE, token_counts

    rows = [
        (1, "Hello world, it's 2024!"),
        (2, "  spaced   out\ttabs\nand newlines  "),
        (3, "no-punct words only here"),
        (4, "12345 67 a1b2c3"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.ws_tokens, r.bpe_tokens, r.chars_per_bpe_token)
           for r in token_counts(docs).collect()}
    for i, t in rows:
        ws = len(t.strip().split())
        bpe = len(_re.findall(BPE_PRETOKEN_RE, t))
        assert got[i] == (ws, bpe, round(len(t) / max(bpe, 1), 6)), i
    # BPE splits "it's" into 3 pieces (it / ' / s) and glues " world" as one
    assert got[1][1] > got[1][0]


def test_semdedup_planted_duplicates(emb, spark):
    """Exact-copy embeddings collide in every LSH table (same buckets) and
    score cosine 1.0, so semdedup must cluster each copy with its original
    and keep only the min vec_id; untouched vectors stay singleton keeps."""
    from graphscope_spark.functions.similarity import semdedup

    base = emb.filter(F.col("vec_id") < 10)
    copies = base.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding", "label"
    )
    corpus = emb.unionByName(copies)
    res = {r["vec_id"]: (r["cluster_id"], r["keep"])
           for r in semdedup(corpus, threshold=0.999).collect()}
    assert len(res) == emb.count() + 10
    for i in range(10):
        assert res[i + 1_000_000] == (i, False), i
        assert res[i][0] == i and res[i][1], i
    # a vector with no planted copy and no accidental 0.999-neighbor
    # remains its own cluster representative
    lonely = [v for v in range(10, 100) if res[v] == (v, True)]
    assert len(lonely) > 50
