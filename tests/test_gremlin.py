"""Gremlin-subset DSL tests: every step family vs python oracles on the
fixture graph (the role of the reference's gremlin standard-test suites,
interactive_engine/compiler/src/test/.../gremlin — SURVEY.md §5)."""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from graphscope_spark.graph import Graph
from graphscope_spark.gremlin import P, traversal
from tests.oracles import make_test_graph


@pytest.fixture(scope="module")
def data():
    return make_test_graph()


@pytest.fixture(scope="module")
def g(spark, data):
    vertices, edges = data
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.createDataFrame([(x,) for x in vertices], "id long")
    graph = Graph(e, v, directed=True, num_partitions=8)
    props = spark.createDataFrame(
        [(x, x % 7, f"n{x}") for x in vertices], "id long, grp long, name string"
    )
    return traversal(graph, vertex_props=props)


@pytest.fixture(scope="module")
def adj(data):
    _, edges = data
    out, inn = defaultdict(set), defaultdict(set)
    for s, d in edges:
        out[s].add(d)
        inn[d].add(s)
    return out, inn


def test_v_source_and_hasid(g, data):
    vertices, _ = data
    assert g.V().count().first()["count"] == len(vertices)
    got = sorted(r["v"] for r in g.V(7, 10, 13).to_df().collect())
    assert got == [7, 10, 13]
    got2 = sorted(r["v"] for r in g.V().hasId(7, 99_999).to_df().collect())
    assert got2 == [7, 99_999]


def test_e_source(g, data):
    _, edges = data
    assert g.E().count().first()["count"] == len(edges)


def test_out_in_both(g, adj):
    out, inn = adj
    start = 7
    got_out = sorted(r["v"] for r in g.V(start).out().to_df().collect())
    assert got_out == sorted(out[start])
    got_in = sorted(r["v"] for r in g.V(start).in_().to_df().collect())
    assert got_in == sorted(inn[start])
    got_both = sorted(r["v"] for r in g.V(start).both().to_df().collect())
    assert got_both == sorted(list(out[start]) + list(inn[start]))


def test_edge_steps_and_otherv(g, adj):
    out, inn = adj
    start = 10
    # outE().inV() == out()
    a = sorted(r["v"] for r in g.V(start).outE().inV().to_df().collect())
    assert a == sorted(out[start])
    # inE().outV() == in_()
    b = sorted(r["v"] for r in g.V(start).inE().outV().to_df().collect())
    assert b == sorted(inn[start])
    # bothE().otherV() == both()
    c = sorted(r["v"] for r in g.V(start).bothE().otherV().to_df().collect())
    assert c == sorted(list(out[start]) + list(inn[start]))
    # bothV on outE: start appears deg_out times, plus each out-neighbor
    d = sorted(r["v"] for r in g.V(start).outE().bothV().to_df().collect())
    assert d == sorted([start] * len(out[start]) + list(out[start]))


def test_has_values_valuemap(g, data):
    vertices, _ = data
    want = sorted(v for v in vertices if v % 7 == 3)
    got = sorted(r["v"] for r in g.V().has("grp", 3).to_df().collect())
    assert got == want
    got_rng = sorted(
        r["v"] for r in g.V().has("grp", P.inside(1, 4)).to_df().collect()
    )
    assert got_rng == sorted(v for v in vertices if 1 < v % 7 < 4)
    vals = sorted(r["val"] for r in g.V(7, 10).values("grp").to_df().collect())
    assert vals == sorted([0, 3])
    vm = {r["v"]: r["val"] for r in g.V(7).valueMap().to_df().collect()}
    assert vm[7] == {"grp": "0", "name": "n7"}


def test_is_where_tag_dedup(g, adj):
    out, _ = adj
    # 2-cycles via as/where_tag: v -> out -> out == v
    two_cycles = sorted(
        r["v"]
        for r in g.V().as_("a").out().out().where_tag("eq", "a").dedup().to_df().collect()
    )
    want = sorted({s for s in out for d in out[s] if s in out.get(d, set())})
    assert two_cycles == want
    # is_() on scalar head
    big = g.V().id_().is_(P.gte(10_000)).count().first()["count"]
    assert big == 51  # the 50 ring ids + sink 99_999


def test_not_traversal(g, adj):
    out, _ = adj
    # vertices with NO out-edges (Gremlin not(out()))
    got = sorted(r["v"] for r in g.V().not_(lambda t: t.out()).to_df().collect())
    vertices = sorted(r["v"] for r in g.V().to_df().collect())
    want = sorted(v for v in vertices if not out.get(v))
    assert got == want


def test_aggregates(g, data, adj):
    vertices, edges = data
    out, _ = adj
    s = g.V().id_().sum().first()["sum"]
    assert s == sum(vertices)
    mn = g.V().id_().min().first()["min"]
    mx = g.V().id_().max().first()["max"]
    assert (mn, mx) == (min(vertices), max(vertices))
    mean = g.V().id_().mean().first()["mean"]
    assert abs(mean - sum(vertices) / len(vertices)) < 1e-9
    folded = g.V(13, 7, 10).fold().first()["folded"]
    assert folded == [7, 10, 13]
    # groupCount over out-neighbor head = in-degree distribution
    gc = {
        r["key"]: r["count"] for r in g.V().out().group_count().collect()
    }
    want = Counter(d for _, d in edges)
    assert gc == dict(want)
    # group().by(tag).by(count) — out-degree per source via tags
    od = {
        r["a"]: r["deg"]
        for r in g.V().as_("a").out().group("a", F.count(F.lit(1)).alias("deg")).collect()
    }
    assert od == {s: len(out[s]) for s in out}


def test_order_limit_select_constant_label(g, data):
    vertices, _ = data
    top3 = [r["v"] for r in g.V().order(F.col("v").desc(), limit_n=3).to_df().collect()]
    assert top3 == sorted(vertices, reverse=True)[:3]
    lim = g.V().limit(5).count().first()["count"]
    assert lim == 5
    sel = g.V(7).as_("a").out().as_("b").select("a", "b").collect()
    assert all(r["a"] == 7 for r in sel)
    c = g.V(7).constant(42).to_df().first()["val"]
    assert c == 42
    lbl = g.V(7).label().to_df().first()["val"]
    assert lbl == "vertex"


def test_union_and_repeat(g, adj):
    out, inn = adj
    start = 7
    u = sorted(
        r["v"]
        for r in g.V(start).union(lambda t: t.out(), lambda t: t.in_()).to_df().collect()
    )
    assert u == sorted(list(out[start]) + list(inn[start]))
    # repeat(out()).times(2) == out().out()
    a = sorted(r["v"] for r in g.V(start).repeat_times(2).to_df().collect())
    b = sorted(r["v"] for r in g.V(start).out().out().to_df().collect())
    assert a == b
    # simplePath: 2-hop walks that return to start are excluded
    sp = sorted(
        r["v"] for r in g.V(start).repeat_times(2, simple=True).to_df().collect()
    )
    want = sorted(
        v for m in out[start] for v in out.get(m, set()) if v != start and v != m
    )
    assert sp == want


def test_sample_coin_deterministic(g):
    n1 = g.V().sample(10).count().first()["count"]
    assert n1 == 10
    a = sorted(r["v"] for r in g.V().sample(10, seed=1).to_df().collect())
    b = sorted(r["v"] for r in g.V().sample(10, seed=1).to_df().collect())
    assert a == b
    frac = g.V().coin(0.5, seed=3).count().first()["count"]
    assert 0 < frac < 251


def test_subgraph_step(g, adj, data):
    out, _ = adj
    sub = g.V().has("grp", 2).outE().subgraph()
    vertices, edges = data
    want_edges = sorted((s, d) for s, d in edges if s % 7 == 2)
    got_edges = sorted((r["src"], r["dst"]) for r in sub.edges.collect())
    assert got_edges == want_edges
    want_v = sorted({x for e in want_edges for x in e})
    assert sorted(r["id"] for r in sub.vertices.collect()) == want_v


def test_match_triangles(g, data):
    _, edges = data
    es = set(edges)
    got = sorted(
        (r["a"], r["b"], r["c"])
        for r in g.match([("a", "out", "b"), ("b", "out", "c"), ("a", "out", "c")])
        .collect()
    )
    nodes = {v for e in edges for v in e}
    want = sorted(
        (a, b, c)
        for a in nodes
        for b in (d for s, d in es if s == a)
        for c in (d for s, d in es if s == b)
        if (a, c) in es
    )
    assert got == want


def test_match_two_hop_existence(g, adj):
    out, _ = adj
    # a→b with a 2-cycle between them: a→b and b→a
    got = sorted(
        (r["a"], r["b"])
        for r in g.match([("a", "out", "b"), ("b", "out", "a")]).collect()
    )
    want = sorted(
        (a, b) for a in out for b in out[a] if a in out.get(b, set())
    )
    assert got == want


def test_identity_haslabel_elementmap(g, data):
    vertices, _ = data
    n = len(vertices)
    assert g.V().identity().count().first()["count"] == n
    assert g.V().hasLabel("vertex").count().first()["count"] == n
    assert g.V().hasLabel("person").count().first()["count"] == 0
    assert g.E().hasLabel("edge").count().first()["count"] > 0
    row = g.V(7).elementMap().to_df().first()
    m = row["val"]
    assert m["id"] == "7" and m["label"] == "vertex"
    assert m["grp"] == str(7 % 7) and m["name"] == "n7"


def test_unfold_after_fold(g, data, spark):
    vertices, _ = data
    folded = g.V().fold()  # one row, one array column
    arr = folded.first()["folded"]
    assert sorted(arr) == sorted(vertices)
    # unfold(): explode an array-valued head back into records
    t = g.V(7).valueMap("grp")  # head val is a map; build an array head
    df = spark.createDataFrame([([1, 2, 3],)], "val array<long>")
    from graphscope_spark.gremlin import Traversal
    tr = Traversal(g, df, head="val").unfold()
    assert sorted(r["val"] for r in tr.to_df().collect()) == [1, 2, 3]


def test_path_tracking(g, adj):
    out, _ = adj
    start = 7
    got = {r["path_str"]
           for r in g.V(start).track_path().out().out().path().collect()}
    want = {f"{start}->{m}->{e}" for m in out[start] for e in out[m]}
    assert got == want
    # path through outE().inV() appends the resolved endpoint too
    got2 = {r["path_str"]
            for r in g.V(start).track_path().outE().inV().path().collect()}
    assert got2 == {f"{start}->{m}" for m in out[start]}
    with pytest.raises(TypeError):
        g.V(start).out().path()


def test_repeat_range(g, adj):
    out, _ = adj
    start = 7
    want = set()
    one = set(out[start])
    two = {e for m in one for e in out[m]}
    want = one | two
    got = {r["v"] for r in g.V(start).repeat_range(1, 2).to_df().collect()}
    assert got == want
