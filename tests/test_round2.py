"""Round-2 operators: PPR / ArticleRank / VoteRank / SCC / lpa_u2i /
attribute assortativity / simple paths / BFS tree formats / loader /
graph archive — each vs a driver-side python oracle."""

import math
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from graphscope_spark.algorithms import (
    all_simple_paths, articlerank, attribute_assortativity, bfs_parents,
    is_simple_path, lpa_u2i, numeric_assortativity, ppr, scc, voterank,
)
from graphscope_spark.graph import Graph
from graphscope_spark.sources import (
    Loader, graph_from_loaders, load_graph, save_graph,
)
from tests.oracles import make_test_graph, symmetrize


@pytest.fixture(scope="module")
def graph_data():
    return make_test_graph()


@pytest.fixture(scope="module")
def g(spark, graph_data):
    vertices, edges = graph_data
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.createDataFrame([(x,) for x in vertices], "id long")
    return Graph(e, v, directed=True, num_partitions=8)


def _as_dict(df, key, val):
    return {r[key]: r[val] for r in df.collect()}


# ------------------------------------------------------------------ #
# PPR (flash ppr.h) oracle: undirected, damping .5, teleport to source
# ------------------------------------------------------------------ #


def oracle_ppr(edges, vertices, source, rounds=10):
    sym = symmetrize(edges)
    nbrs = {v: [] for v in vertices}
    for s, d in sym:
        nbrs[s].append(d)
    deg = {v: len(nbrs[v]) for v in vertices}
    r = {v: 1.0 if v == source else 0.0 for v in vertices}
    for _ in range(rounds):
        nxt = {v: (0.5 if v == source else 0.0) for v in vertices}
        for u in vertices:
            if deg[u]:
                c = 0.5 * r[u] / deg[u]
                for v in nbrs[u]:
                    nxt[v] += c
        r = nxt
    return r


def test_ppr(g, graph_data):
    vertices, edges = graph_data
    src = min(vertices)
    got = _as_dict(ppr(g, src, max_iter=10).state, "id", "rank")
    want = oracle_ppr(edges, vertices, src)
    for v in vertices:
        assert math.isclose(got[v], want[v], abs_tol=1e-9), v


# ------------------------------------------------------------------ #
# ArticleRank (flash articlerank.h) oracle: directed, init 0
# ------------------------------------------------------------------ #


def oracle_articlerank(edges, vertices, rounds=10, d=0.85):
    out = {v: [] for v in vertices}
    for s, t in edges:
        out[s].append(t)
    odeg = {v: len(out[v]) for v in vertices}
    avg = len(edges) / len(vertices)
    r = {v: 0.0 for v in vertices}
    for _ in range(rounds):
        nxt = {v: 1.0 - d for v in vertices}
        for u in vertices:
            c = d * r[u] / (odeg[u] + avg)
            for v in out[u]:
                nxt[v] += c
        r = nxt
    return r


def test_articlerank(g, graph_data):
    vertices, edges = graph_data
    got = _as_dict(articlerank(g, max_iter=10).state, "id", "rank")
    want = oracle_articlerank(edges, vertices)
    for v in vertices:
        assert math.isclose(got[v], want[v], abs_tol=1e-9), v


# ------------------------------------------------------------------ #
# SCC — Tarjan oracle
# ------------------------------------------------------------------ #


def oracle_scc(edges, vertices):
    """Iterative Tarjan; comp = min id of the SCC."""
    adj = {v: [] for v in vertices}
    for s, d in edges:
        if s != d:
            adj[s].append(d)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    comp = {}
    counter = [0]

    for root in vertices:
        if root in index:
            continue
        work = [(root, iter(adj[root]))]
        index[root] = low[root] = counter[0]
        counter[0] += 1
        stack.append(root)
        on_stack.add(root)
        while work:
            v, it = work[-1]
            advanced = False
            for w in it:
                if w not in index:
                    index[w] = low[w] = counter[0]
                    counter[0] += 1
                    stack.append(w)
                    on_stack.add(w)
                    work.append((w, iter(adj[w])))
                    advanced = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    members.append(w)
                    if w == v:
                        break
                m = min(members)
                for w in members:
                    comp[w] = m
    return comp


def test_scc_planted(spark):
    # two cycles bridged by a DAG path + a tail chain
    edges = [(1, 2), (2, 3), (3, 1),          # SCC {1,2,3}
             (3, 4), (4, 5),                   # bridge
             (5, 6), (6, 7), (7, 5),           # SCC {5,6,7}
             (7, 8), (8, 9),                   # tail (singletons)
             (10, 10)]                         # self-loop → singleton
    vertices = sorted({x for e in edges for x in e})
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.createDataFrame([(x,) for x in vertices], "id long")
    gg = Graph(e, v, directed=True, num_partitions=4)
    want = oracle_scc(edges, vertices)
    # local_threshold=0 forces the pure distributed FW-BW path
    got_dist = _as_dict(scc(gg, local_threshold=0), "id", "comp")
    assert got_dist == want
    # default threshold takes the hybrid driver-local finish
    got_hybrid = _as_dict(scc(gg), "id", "comp")
    assert got_hybrid == want


def test_scc_fixture(g, graph_data):
    # hybrid path: FW-BW peels, driver Tarjan finishes the small tail
    # (the pure distributed path pays one coloring pass per pivot region —
    # exercised on the planted graph above, wasteful on 251 vertices)
    vertices, edges = graph_data
    got = _as_dict(scc(g), "id", "comp")
    want = oracle_scc(edges, vertices)
    assert got == want


# ------------------------------------------------------------------ #
# VoteRank oracle (voterank.h, min-id ties)
# ------------------------------------------------------------------ #


def oracle_voterank(edges, vertices, rounds):
    out = {v: [] for v in vertices}
    for s, d in edges:
        out[s].append(d)
    n = len(vertices)
    avg = len(edges) / n
    delta = 1.0 / avg
    weight = {v: 1.0 for v in vertices}
    rank = {v: 0 for v in vertices}
    for k in range(1, rounds + 1):
        best, best_s = None, -1.0
        for u in sorted(vertices):
            if rank[u]:
                continue
            s = round(sum(weight[v] for v in out[u]), 8)
            if s > best_s:
                best, best_s = u, s
        if best is None or best_s < 1e-8:
            break
        rank[best] = k
        weight[best] = 0.0
        for v in out[best]:
            weight[v] = max(weight[v] - delta, 0.0)
    return rank


def test_voterank(g, graph_data):
    vertices, edges = graph_data
    got = _as_dict(voterank(g, num_of_nodes=5), "id", "rank")
    want = oracle_voterank(edges, vertices, 5)
    assert got == want


# ------------------------------------------------------------------ #
# lpa_u2i oracle (lpa_u2i.h alternating stages)
# ------------------------------------------------------------------ #


def oracle_lpa_u2i(edges, user_labels, rounds):
    out = {}
    for u, i in edges:
        out.setdefault(u, []).append(i)
    idg = {}
    for u, i in edges:
        idg[i] = idg.get(i, 0) + 1
    odeg = {u: len(v) for u, v in out.items()}
    nbrsum = {u: sum(idg[i] for i in out[u]) for u in out}
    ulab = dict(user_labels)
    ilab = {}
    for step in range(rounds):
        if step % 2 == 0:
            ilab = {}
            for u, items in out.items():
                for i in items:
                    ilab[i] = ilab.get(i, 0.0) + ulab[u]
        else:
            new = {}
            for u in ulab:
                lab = ulab[u]
                if lab in (0.0, 1.0) or nbrsum.get(u, 0) == odeg.get(u, 0):
                    new[u] = lab
                    continue
                tmp = sum(ilab.get(i, 0.0) for i in out[u])
                new[u] = (tmp - odeg[u] * lab) / (nbrsum[u] - odeg[u])
            ulab = new
    return ulab


def test_lpa_u2i(spark):
    edges = [(1, 101), (1, 102), (2, 101), (2, 103), (3, 102), (3, 103),
             (4, 103), (4, 104), (5, 104), (6, 101), (6, 104), (7, 102)]
    labels = {1: 0.0, 2: 1.0, 3: 0.5, 4: 0.25, 5: 0.75, 6: 1.0 / 3, 7: 0.8}
    e = spark.createDataFrame(edges, "u long, i long")
    u = spark.createDataFrame(sorted(labels.items()), "id long, lab double")
    got = _as_dict(lpa_u2i(e, u, ["lab"], max_round=4), "id", "label_0")
    want = oracle_lpa_u2i(edges, labels, 4)
    for k, v in want.items():
        assert math.isclose(got[k], v, abs_tol=1e-9), k


# ------------------------------------------------------------------ #
# attribute / numeric assortativity
# ------------------------------------------------------------------ #


def test_attribute_assortativity(spark):
    # two clusters with mostly-internal edges → strong positive r
    edges = [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4), (1, 4)]
    attrs = {1: "a", 2: "a", 3: "a", 4: "b", 5: "b", 6: "b"}
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.createDataFrame(sorted(attrs.items()), "id long, grp string")
    gg = Graph(e, v, directed=True, num_partitions=4)
    got = attribute_assortativity(gg, "grp")
    # mixing matrix by hand: 6/7 on-diagonal (3 aa + 3 bb), 1/7 ab
    m = np.zeros((2, 2))
    for s, d in edges:
        m[0 if attrs[s] == "a" else 1][0 if attrs[d] == "a" else 1] += 1
    m /= m.sum()
    tr = np.trace(m)
    ab = float(m.sum(1) @ m.sum(0))
    want = (tr - ab) / (1 - ab)
    assert math.isclose(got, want, abs_tol=1e-12)


def test_numeric_assortativity(spark):
    edges = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)]
    vals = {1: 1.0, 2: 2.0, 3: 3.0, 4: 4.0}
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.createDataFrame(sorted(vals.items()), "id long, x double")
    gg = Graph(e, v, directed=True, num_partitions=4)
    xs = np.array([vals[s] for s, d in edges])
    ys = np.array([vals[d] for s, d in edges])
    want = float(np.corrcoef(xs, ys)[0, 1])
    assert math.isclose(numeric_assortativity(gg, "x"), want, abs_tol=1e-9)


# ------------------------------------------------------------------ #
# simple paths + BFS tree formats
# ------------------------------------------------------------------ #


def test_all_simple_paths(spark):
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (2, 4), (4, 1)]
    e = spark.createDataFrame(edges, "src long, dst long")
    gg = Graph(e, directed=True, num_partitions=4)
    got = {r["path_str"] for r in all_simple_paths(gg, 1, [4], cutoff=3).collect()}
    want = {"1->2->4", "1->3->4", "1->2->3->4"}
    assert got == want


def test_shortest_path_expand(spark):
    from graphscope_spark.algorithms import shortest_path_expand
    # 1->4 has shortest length 2 via 2 and via 3; the 3-hop 1->2->3->4
    # detour and the 4->5 continuation must both be excluded.
    edges = [(1, 2), (1, 3), (2, 4), (3, 4), (2, 3), (4, 5)]
    e = spark.createDataFrame(edges, "src long, dst long")
    gg = Graph(e, directed=True, num_partitions=4)
    rows = shortest_path_expand(gg, 1, 4).collect()
    assert {r["path_str"] for r in rows} == {"1->2->4", "1->3->4"}
    assert all(r["hops"] == 2 for r in rows)
    # unreachable target -> empty result with the same schema
    empty = shortest_path_expand(gg, 4, 1)
    assert empty.columns == ["path_str", "hops"]
    assert empty.count() == 0


def test_is_simple_path(spark):
    edges = [(1, 2), (2, 3), (3, 4)]
    e = spark.createDataFrame(edges, "src long, dst long")
    gg = Graph(e, directed=True, num_partitions=4)
    assert is_simple_path(gg, [1, 2, 3])
    assert not is_simple_path(gg, [1, 3])        # not an edge
    assert not is_simple_path(gg, [1, 2, 1])     # repeat
    assert not is_simple_path(gg, [])
    assert is_simple_path(gg, [2])


def test_bfs_parents(g, graph_data):
    vertices, edges = graph_data
    src = min(vertices)
    rows = bfs_parents(g, src).collect()
    dist = {r["id"]: r["dist"] for r in rows}
    par = {r["id"]: r["parent"] for r in rows}
    assert par[src] is None and dist[src] == 0
    fwd = {}
    for s, d in edges:
        fwd.setdefault(s, []).append(d)
    for v, p in par.items():
        if p is None:
            continue
        # parent one level closer, edge exists, and is the min such id
        assert dist[p] == dist[v] - 1
        assert v in fwd.get(p, [])
        cands = [u for u in vertices
                 if v in fwd.get(u, []) and dist.get(u) == dist[v] - 1]
        assert p == min(cands)


# ------------------------------------------------------------------ #
# multi_source_bfs sigma (ADVICE: 4-cycle gave sigma=8 pre-fix)
# ------------------------------------------------------------------ #


def test_sigma_on_cycle(spark):
    # undirected 4-cycle stored bidirectionally; two shortest paths from
    # 1 to the opposite corner 3
    sym = symmetrize([(1, 2), (2, 3), (3, 4), (4, 1)])
    e = spark.createDataFrame(sym, "src long, dst long")
    gg = Graph(e, directed=False, num_partitions=4)
    from graphscope_spark.algorithms import multi_source_bfs
    src = spark.createDataFrame([(1,)], "id long")
    rows = multi_source_bfs(gg, src, with_sigma=True).collect()
    sig = {r["id"]: r["sigma"] for r in rows}
    assert sig[1] == 1.0 and sig[2] == 1.0 and sig[4] == 1.0
    assert sig[3] == 2.0


# ------------------------------------------------------------------ #
# loader: CSV == ORC == parquet, graph archive roundtrip
# ------------------------------------------------------------------ #


def test_loader_formats(spark, tmp_path):
    edges = [(f"v{i}", f"v{(i * 3) % 7}", float(i)) for i in range(1, 20)]
    df = spark.createDataFrame(edges, "s string, d string, w double")
    csv_p = str(tmp_path / "e_csv")
    orc_p = str(tmp_path / "e_orc")
    pq_p = str(tmp_path / "e_pq")
    df.coalesce(1).write.option("header", "true").csv(csv_p)
    df.write.orc(orc_p)
    df.write.parquet(pq_p)

    graphs = {}
    for name, loader in {
        "csv": Loader(csv_p, filetype="CSV"),
        "orc": Loader(orc_p, filetype="ORC"),
        "parquet": Loader(pq_p, filetype="PARQUET"),
    }.items():
        gg = graph_from_loaders(
            spark, loader, src_col="s", dst_col="d", dense_ids=True,
            num_partitions=4,
        )
        graphs[name] = {
            (r["src"], r["dst"]) for r in gg.edges.select("src", "dst").collect()
        }
    assert graphs["csv"] == graphs["orc"] == graphs["parquet"]
    assert len(graphs["csv"]) == len({(s, d) for s, d, _ in edges})


def test_loader_options(spark, tmp_path):
    p = str(tmp_path / "opts")
    spark.createDataFrame(
        [(1, "x", 2.5)], "a int, b string, c double"
    ).coalesce(1).write.option("header", "false").option("sep", "|").csv(p)
    df = Loader(p, delimiter="|", header_row=False,
                include_columns=["f0", "f2"],
                column_types={"f2": "string"}).read(spark)
    assert df.columns == ["f0", "f2"]
    assert dict(df.dtypes)["f2"] == "string"
    with pytest.raises(ValueError):
        Loader(p, delimiter="||")
    with pytest.raises(ValueError):
        Loader(p, filetype="AVRO")


def test_graph_archive_roundtrip(spark, g, tmp_path):
    path = str(tmp_path / "gar")
    save_graph(g, path)
    # metadata is a Spark-written JSON dataset (FS-agnostic), not a
    # driver-local file
    assert os.path.isdir(os.path.join(path, "meta"))
    g2 = load_graph(spark, path)
    assert g2.directed == g.directed
    assert (
        {tuple(r) for r in g2.edges.select("src", "dst").collect()}
        == {tuple(r) for r in g.edges.select("src", "dst").collect()}
    )


# ------------------------------------------------------------------ #
# guards (ADVICE low items)
# ------------------------------------------------------------------ #


def test_simhash_hamming_guard(spark):
    from graphscope_spark.functions.dedup import simhash_neardup_pairs
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        simhash_neardup_pairs(docs, max_hamming=4)


def test_collect_matrix_guard(spark):
    from graphscope_spark.functions import similarity as sim
    old = sim.MAX_COLLECTED_QUERIES
    sim.MAX_COLLECTED_QUERIES = 3
    try:
        big = spark.range(10).select(
            F.col("id").alias("vec_id"),
            F.array(F.lit(1.0), F.lit(2.0)).alias("embedding"),
        )
        with pytest.raises(ValueError):
            sim.ann_brute_force(big, big, k=2)
    finally:
        sim.MAX_COLLECTED_QUERIES = old


def test_sssp_average_length_excludes_source(spark):
    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    gg = Graph(e, directed=True, num_partitions=2)
    from graphscope_spark.algorithms import sssp_average_length
    # dists from 1: {2: 1, 3: 2} → mean 1.5 (not 1.0 with the source's 0)
    assert sssp_average_length(gg, 1) == pytest.approx(1.5)


def test_sampling_path(spark):
    from graphscope_spark.algorithms import sampling_path
    # labeled bipartite-ish pattern: user -buys-> item -rel-> item
    edges = [(1, 10, "buys"), (2, 10, "buys"), (10, 11, "rel"),
             (10, 12, "rel"), (11, 12, "rel"), (1, 11, "buys")]
    verts = [(1, "user"), (2, "user"), (10, "item"), (11, "item"), (12, "item")]
    e = spark.createDataFrame(edges, "src long, dst long, elabel string")
    v = spark.createDataFrame(verts, "id long, vlabel string")
    gg = Graph(e, v, directed=True, num_partitions=4)
    got = {tuple(r["path"]) for r in sampling_path(
        gg, ["user", "buys", "item", "rel", "item"]).collect()}
    want = {(1, 10, 11), (1, 10, 12), (2, 10, 11), (2, 10, 12), (1, 11, 12)}
    assert got == want
    with pytest.raises(ValueError):
        sampling_path(gg, ["user", "buys"])
    # deterministic cap: limit=3 keeps the 3 lowest-hash complete paths,
    # identical across repeated runs (no execution-order dependence)
    capped1 = sorted(tuple(r["path"]) for r in sampling_path(
        gg, ["user", "buys", "item", "rel", "item"], limit=3).collect())
    capped2 = sorted(tuple(r["path"]) for r in sampling_path(
        gg, ["user", "buys", "item", "rel", "item"], limit=3).collect())
    assert capped1 == capped2
    assert len(capped1) == 3
    assert set(capped1) <= want


# ------------------------------------------------------------------ #
# k_core_search + random_multi_bfs (remaining FLASH compositions)
# ------------------------------------------------------------------ #


def test_k_core_search(spark, g, graph_data):
    from graphscope_spark.algorithms import k_core_search, kcore_vertices
    for k in (2, 3):
        row = k_core_search(g, k).first()
        assert row.k == k
        assert row.size == kcore_vertices(g, k).count()


def test_random_multi_bfs_oracle(spark, g, graph_data):
    import hashlib
    from graphscope_spark.algorithms import random_multi_bfs

    vertices, edges = graph_data
    res = random_multi_bfs(g, k=4, seed=7)
    got = {(r.src, r.id): r.dist for r in res.collect()}

    def h(i):
        return int(hashlib.md5(f"7|{i}".encode()).hexdigest()[:15], 16)

    srcs = sorted(vertices, key=lambda i: (h(i), i))[:4]
    # multi_source_bfs treats the graph per its direction convention:
    # directed Graph -> directed BFS over out-edges
    adj = {v: set() for v in vertices}
    for s, d in edges:
        adj[s].add(d)
    expect = {}
    for s in srcs:
        dist = {s: 0}
        frontier = [s]
        d = 0
        while frontier:
            d += 1
            nxt = []
            for v in frontier:
                for w in adj[v]:
                    if w not in dist:
                        dist[w] = d
                        nxt.append(w)
            frontier = nxt
        for v, dd in dist.items():
            expect[(s, v)] = dd
    assert got == expect
