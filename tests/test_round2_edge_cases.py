"""Empty/degenerate-input behavior for the round-2 operator families."""

import pytest

from graphscope_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark("test-r2-edges", cpus=4, shuffle_partitions=4)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _ev(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    )


def test_bm25_no_matching_terms(spark):
    from graphscope_spark.functions.retrieval import bm25_score
    docs = _docs(spark, [(0, "a b"), (1, "c d")])
    assert bm25_score(docs, ["zzz"]).count() == 0


def test_tfidf_empty_corpus(spark):
    from graphscope_spark.functions.retrieval import tfidf_top_terms
    docs = _docs(spark, []).filter("doc_id IS NOT NULL")
    assert tfidf_top_terms(docs).count() == 0


def test_kmeans_k_exceeds_n(spark):
    from graphscope_spark.functions.kmeans import kmeans
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = kmeans(emb, k=5, rounds=2).collect()
    # only 2 seeds exist; every point assigned, clusters within 1..2
    assert len(out) == 2
    assert {r["cluster"] for r in out} <= {1, 2}


def test_kmv_empty_and_single(spark):
    from graphscope_spark.functions.sketches import kmv_distinct
    df = spark.createDataFrame([("a", 1)], "grp string, v long")
    [r] = kmv_distinct(df, "grp", "v", k=8).collect()
    assert (r["n_kept"], r["est_distinct"]) == (1, 1.0)
    empty = df.filter("v > 99")
    assert kmv_distinct(empty, "grp", "v", k=8).count() == 0


def test_count_min_empty(spark):
    from graphscope_spark.functions.sketches import count_min_sketch
    df = spark.createDataFrame([("x",)], "v string").filter("v = 'nope'")
    assert count_min_sketch(df, "v").count() == 0


def test_sessionize_empty_and_single_event(spark):
    from graphscope_spark.functions.events import sessionize
    import datetime as dt
    ev = _ev(spark, [(1, dt.datetime(2024, 1, 1), 7, "x", 0.0)])
    [r] = sessionize(ev).collect()
    assert (r["user_id"], r["session"], r["n_events"]) == (7, 1, 1)
    assert sessionize(ev.filter("user_id < 0")).count() == 0


def test_funnel_no_users_reach_first_step(spark):
    from graphscope_spark.functions.events import funnel
    import datetime as dt
    ev = _ev(spark, [(1, dt.datetime(2024, 1, 1), 7, "x", 0.0)])
    got = {r["step_name"]: r["n_users"]
           for r in funnel(ev, ["missing", "x"]).collect()}
    assert got == {"missing": 0, "x": 0}  # strictly-after a never-reached step


def test_asof_join_empty_right(spark):
    from graphscope_spark.functions.events import asof_join
    import datetime as dt
    left = _ev(spark, [(1, dt.datetime(2024, 1, 1), 7, "x", 0.0)]).select(
        "event_id", "user_id", "ts"
    )
    right = _ev(spark, []).filter("event_id IS NOT NULL").select(
        "event_id", "user_id", "value", "ts"
    )
    [r] = asof_join(left, right, "user_id",
                    right_cols=["event_id", "value"]).collect()
    assert r["event_id_right"] is None and r["value_right"] is None


def test_zorder_single_row(spark):
    from graphscope_spark.functions.layout import zorder_key
    df = spark.createDataFrame([(7, 9)], "x long, y long")
    [r] = zorder_key(df, ["x", "y"], bits=4).collect()
    assert r["z"] == 0  # constant columns normalize to 0


def test_fuzzy_pairs_no_shared_grams(spark):
    from graphscope_spark.functions.fuzzy import fuzzy_string_pairs
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "bbbb")], "id long, name string"
    )
    assert fuzzy_string_pairs(df, "id", "name").count() == 0


def test_ktruss_k3_keeps_all_triangle_edges(spark):
    from graphscope_spark.algorithms.truss import ktruss
    from graphscope_spark.graph import Graph
    tri = [(0, 1), (1, 2), (0, 2)]
    sym = tri + [(b, a) for a, b in tri]
    g = Graph(spark.createDataFrame(sym, "src long, dst long"),
              directed=False, num_partitions=2)
    assert ktruss(g, 3).count() == 3
    assert ktruss(g, 4).count() == 0
    g.unpersist()


def test_modularity_known_values(spark):
    from graphscope_spark.algorithms.misc import modularity
    from graphscope_spark.graph import Graph
    # two triangles joined by one bridge edge: the classic 2-community
    # partition has Q = (2m*intra2 - sum_dc^2)/(4m^2), m=7
    tri1 = [(0, 1), (1, 2), (0, 2)]
    tri2 = [(3, 4), (4, 5), (3, 5)]
    bridge = [(2, 3)]
    und = tri1 + tri2 + bridge
    sym = und + [(b, a) for a, b in und]
    g = Graph(spark.createDataFrame(sym, "src long, dst long"),
              directed=False, num_partitions=2)
    asn = spark.createDataFrame(
        [(i, 0) for i in range(3)] + [(i, 1) for i in range(3, 6)],
        "id long, label long",
    )
    [r] = modularity(g, asn).collect()
    m, intra2 = 7, 12  # 6 intra undirected edges x 2 directions
    dsq = (2 + 2 + 3) ** 2 + (3 + 2 + 2) ** 2
    assert (r["m"], r["intra2"], r["deg_sq_sum"]) == (m, intra2, dsq)
    assert r["modularity"] == round((2 * m * intra2 - dsq) / (4.0 * m * m), 6)
    # the all-one-community partition scores 0 by definition: intra2=2m,
    # dsq=(2m)^2 -> numerator 4m^2-4m^2
    one = spark.createDataFrame([(i, 9) for i in range(6)],
                                "id long, label long")
    [r1] = modularity(g, one).collect()
    assert r1["modularity"] == 0.0
    g.unpersist()


def test_normalize_text_stages(spark):
    from graphscope_spark.functions.text import normalize_text
    docs = _docs(spark, [
        (0, "  Hello\t\tWORLD \n"),
        (1, "already clean"),
        (2, "ctrl\x01char"),
    ])
    got = {r["doc_id"]: (r["text"], r["n_changed"])
           for r in normalize_text(docs).collect()}
    assert got[0] == ("hello world", 1)
    assert got[1] == ("already clean", 0)
    assert got[2] == ("ctrlchar", 1)
    trunc = {r["doc_id"]: r["text"]
             for r in normalize_text(docs, max_chars=5).collect()}
    assert trunc[0] == "hello"


def test_corpus_report_counts(spark):
    from graphscope_spark.functions.text import corpus_report
    docs = _docs(spark, [
        (0, "a b c"), (1, "a b c"),  # exact dup pair
        (2, "a a longertext"),
    ])
    [r] = corpus_report(docs).collect()
    assert r["n_docs"] == 3
    assert r["n_tokens"] == 9
    assert r["vocab_size"] == 4  # a b c longertext
    assert r["n_exact_dups"] == 1
    assert r["p50_chars"] == 5  # lengths 5, 5, 14 -> median 5
    assert 0.0 < r["mean_quality"] < 1.0


def test_quantize_embeddings_roundtrip_bound(spark):
    from graphscope_spark.functions.similarity import quantize_embeddings
    emb = spark.createDataFrame(
        [(0, [0.0, 0.5, 1.0]), (1, [2.0, 2.0, 2.0]), (2, [-1.0, 1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: (list(r["codes"]), r["lo"], r["span"])
           for r in quantize_embeddings(emb).collect()}
    assert got[0] == ([0, 128, 255], 0.0, 1.0)  # round(127.5) half-up
    assert got[1] == ([0, 0, 0], 2.0, 0.0)      # constant vector
    codes, lo, span = got[2]
    # dequantization error bounded by span/510
    for orig, c in zip([-1.0, 1.0, 0.0], codes):
        assert abs((lo + c * span / 255.0) - orig) <= span / 510 + 1e-9


def test_ppr_batch_matches_single_source(spark):
    from graphscope_spark.algorithms.ranking import ppr, ppr_batch
    from graphscope_spark.graph import Graph
    und = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3)]
    sym = und + [(b, a) for a, b in und]
    g = Graph(spark.createDataFrame(sym, "src long, dst long"),
              directed=False, num_partitions=2)
    batch = {
        (r["seed"], r["id"]): r["rank"]
        for r in ppr_batch(g, [0, 2], max_iter=6).collect()
    }
    for seed in (0, 2):
        single = {
            r["id"]: round(r["rank"], 8)
            for r in ppr(g, seed, max_iter=6).state.collect()
            if r["rank"] != 0.0
        }
        got = {i: v for (s, i), v in batch.items() if s == seed}
        assert set(got) == set(single)
        for i in got:
            assert abs(got[i] - single[i]) < 1e-9, (seed, i)
    g.unpersist()


def test_ppr_sweep_finds_planted_community(spark):
    from graphscope_spark.algorithms.ranking import ppr_sweep
    from graphscope_spark.graph import Graph
    import itertools
    # a 5-clique (seed side) weakly tied to a 5-path
    clique = list(range(5))
    edges = {tuple(sorted(p)) for p in itertools.combinations(clique, 2)}
    edges |= {(4, 10), (10, 11), (11, 12), (12, 13)}
    sym = list(edges) + [(b, a) for a, b in edges]
    g = Graph(spark.createDataFrame(sym, "src long, dst long"),
              directed=False, num_partitions=2)
    sweep = ppr_sweep(g, seed=0, max_iter=8, max_prefix=12).collect()
    best = min(sweep, key=lambda r: (r["conductance"], r["k"]))
    # the minimum-conductance prefix is exactly the clique (k=5, cut=1)
    assert best["k"] == 5
    assert best["cut"] == 1
    assert best["vol"] == 21  # 4*5 internal directed + 1 outgoing
    g.unpersist()


def test_strength_centrality_modes(spark):
    from graphscope_spark.algorithms.centrality import strength_centrality
    from graphscope_spark.graph import Graph
    e = spark.createDataFrame(
        [(0, 1, 2.5), (1, 0, 2.5), (0, 2, 1.0)],
        "src long, dst long, w double",
    )
    g = Graph(e, directed=True, num_partitions=2)
    out = {r["id"]: r["strength"]
           for r in strength_centrality(g, "w", "out").collect()}
    assert out == {0: 3.5, 1: 2.5}
    both = {r["id"]: r["strength"]
            for r in strength_centrality(g, "w", "both").collect()}
    assert both == {0: 6.0, 1: 5.0, 2: 1.0}
    g.unpersist()


def test_vocab_stats_exact(spark):
    from graphscope_spark.functions.text import vocab_stats
    docs = _docs(spark, [(0, "a a b"), (1, "a c")])
    [r] = vocab_stats(docs).collect()
    assert (r["vocab_size"], r["n_tokens"], r["hapax"]) == (3, 5, 2)
    assert r["top_token"] == "a"
    assert r["top_share"] == round(3 / 5, 6)
