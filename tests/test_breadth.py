"""Breadth-algorithm parity (SSSP/BFS, centralities, clustering, cores,
boundaries, assortativity) vs driver-side oracles — exact for int results,
allclose for floats, per the reference's comparison rules
(python/graphscope/tests/test_app.py:47-54)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from graphscope_spark.algorithms import (
    average_clustering, average_degree_connectivity, bfs, clustering,
    degree_assortativity_coefficient, degree_centrality, edge_boundary,
    eigenvector_centrality, hits, katz_centrality, kcore_vertices, kshell,
    node_boundary, sssp, sssp_average_length, sssp_has_path, transitivity,
)
from graphscope_spark.graph import Graph
from tests.oracles import (
    make_test_graph, oracle_clustering, oracle_core_number, oracle_kcore,
    oracle_sssp, symmetrize,
)


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


SOURCE = 7  # first id of component A


def test_bfs_levels(g, graph_data):
    vertices, edges = graph_data
    got = _as_dict(bfs(g, SOURCE).state, "id", "dist")
    want = oracle_sssp([(s, d, 1.0) for s, d in edges], vertices, SOURCE)
    assert got == want


def test_sssp_weighted(spark, graph_data):
    vertices, edges = graph_data
    ew = [(s, d, float((s * 7 + d * 13) % 10 + 1)) for s, d in edges]
    e = spark.createDataFrame(ew, "src long, dst long, w double")
    v = spark.createDataFrame([(x,) for x in vertices], "id long")
    gw = Graph(e, v, directed=True, num_partitions=8)
    got = _as_dict(sssp(gw, SOURCE, weight_col="w").state, "id", "dist")
    want = oracle_sssp(ew, vertices, SOURCE)
    for k in want:
        if want[k] is None:
            assert got[k] is None
        else:
            assert abs(got[k] - want[k]) < 1e-9


def test_sssp_predicates(g, graph_data):
    vertices, edges = graph_data
    want = oracle_sssp([(s, d, 1.0) for s, d in edges], vertices, SOURCE)
    reached = {v for v, d in want.items() if d is not None}
    some_unreached = next(v for v in vertices if v not in reached)
    assert sssp_has_path(g, SOURCE, max(reached))
    assert not sssp_has_path(g, SOURCE, some_unreached)
    avg = sssp_average_length(g, SOURCE)
    # reference averages over ordered pairs excluding self
    # (sssp_average_length.h:164) — the source's own dist=0 is excluded
    want_avg = np.mean([d for v, d in want.items()
                        if d is not None and v != SOURCE])
    assert abs(avg - want_avg) < 1e-9


def test_degree_centrality(g, graph_data):
    vertices, edges = graph_data
    n = len(vertices)
    got = _as_dict(degree_centrality(g, "both"), "id", "dc")
    outd, ind = {}, {}
    for s, d in edges:
        outd[s] = outd.get(s, 0) + 1
        ind[d] = ind.get(d, 0) + 1
    for v in vertices:
        want = (outd.get(v, 0) + ind.get(v, 0)) / (n - 1)
        assert abs(got[v] - want) < 1e-12


def test_eigenvector_fixed_point(g, graph_data):
    """Implementation-independent check: the result is (approximately) an
    eigenvector of A^T with positive eigenvalue, L2-normalized."""
    vertices, edges = graph_data
    res = eigenvector_centrality(g, max_iter=100, tol=1e-9)
    x = _as_dict(res.state, "id", "x")
    ids = sorted(vertices)
    idx = {v: i for i, v in enumerate(ids)}
    vec = np.array([x[v] for v in ids])
    assert abs(np.linalg.norm(vec) - 1.0) < 1e-6
    gathered = np.zeros(len(ids))
    for s, d in edges:
        gathered[idx[d]] += vec[idx[s]]
    lam = vec @ gathered
    assert lam > 0
    # residual small relative to eigenvalue
    assert np.linalg.norm(gathered - lam * vec) < 1e-4 * max(lam, 1.0)


def test_katz_closed_form(g, graph_data):
    vertices, edges = graph_data
    alpha, beta = 0.05, 1.0
    res = katz_centrality(g, alpha=alpha, beta=beta, max_iter=80, tol=1e-10)
    x = _as_dict(res.state, "id", "x")
    ids = sorted(vertices)
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    a = np.zeros((n, n))
    for s, d in edges:
        a[idx[s], idx[d]] = 1.0
    want = np.linalg.solve(np.eye(n) - alpha * a.T, beta * np.ones(n))
    want /= np.linalg.norm(want)
    vec = np.array([x[v] for v in ids])
    assert np.allclose(vec, want, atol=1e-6)


def test_hits_fixed_point(g, graph_data):
    vertices, edges = graph_data
    res = hits(g, max_iter=60, tol=1e-9)
    hub = _as_dict(res.state, "id", "hub")
    auth = _as_dict(res.state, "id", "auth")
    assert abs(sum(hub.values()) - 1.0) < 1e-9
    assert abs(sum(auth.values()) - 1.0) < 1e-9
    # fixed point: auth ∝ Σ_in hub
    raw_auth = {v: 0.0 for v in vertices}
    for s, d in edges:
        raw_auth[d] += hub[s]
    s = sum(raw_auth.values())
    for v in vertices:
        assert abs(auth[v] - raw_auth[v] / s) < 1e-6


def test_clustering_and_transitivity(g, graph_data):
    vertices, edges = graph_data
    got = _as_dict(clustering(g), "id", "cc")
    want = oracle_clustering(edges, vertices)
    for v in vertices:
        assert abs(got[v] - want[v]) < 1e-12
    assert abs(average_clustering(g) - np.mean([want[v] for v in vertices])) < 1e-9
    # transitivity vs direct formula
    sym = symmetrize(edges)
    deg = {}
    for s, d in sym:
        deg[s] = deg.get(s, 0) + 1
    wedges = sum(dv * (dv - 1) / 2 for dv in deg.values())
    from tests.oracles import oracle_triangles
    tri3 = sum(oracle_triangles(edges, vertices).values())
    assert abs(transitivity(g) - tri3 / wedges) < 1e-12


def test_kcore_kshell(g, graph_data):
    vertices, edges = graph_data
    got3 = {r["id"] for r in kcore_vertices(g, 3).collect()}
    assert got3 == oracle_kcore(edges, vertices, 3)
    got_shell = _as_dict(kshell(g, max_k=30), "id", "shell")
    assert got_shell == oracle_core_number(edges, vertices)


def test_boundaries(spark, g, graph_data):
    vertices, edges = graph_data
    s_ids = [v for v in vertices if v < 100]
    s_df = spark.createDataFrame([(x,) for x in s_ids], "id long")
    nb = {r["id"] for r in node_boundary(g, s_df).collect()}
    eb = {(r["src"], r["dst"]) for r in edge_boundary(g, s_df).collect()}
    s_set = set(s_ids)
    want_eb = {(s, d) for s, d in edges if s in s_set and d not in s_set}
    assert eb == want_eb
    assert nb == {d for _, d in want_eb}


def test_assortativity(g, graph_data):
    vertices, edges = graph_data
    outd, ind = {}, {}
    for s, d in edges:
        outd[s] = outd.get(s, 0) + 1
        ind[d] = ind.get(d, 0) + 1
    xs = np.array([outd.get(s, 0) for s, d in edges], dtype=float)
    ys = np.array([ind.get(d, 0) for s, d in edges], dtype=float)
    want = np.corrcoef(xs, ys)[0, 1]
    assert abs(degree_assortativity_coefficient(g) - want) < 1e-9
    adc = _as_dict(average_degree_connectivity(g), "deg", "avg_nbr_deg")
    for dv in set(xs):
        assert abs(adc[int(dv)] - ys[xs == dv].mean()) < 1e-9


def test_sssp_path_parents(spark, g, graph_data):
    from graphscope_spark.algorithms import sssp_path
    vertices, edges = graph_data
    res = sssp_path(g, SOURCE)
    rows = {r["id"]: r for r in res.state.collect()}
    dist = oracle_sssp([(s, d, 1.0) for s, d in edges], vertices, SOURCE)
    eset = set(edges)
    for v in vertices:
        r = rows[v]
        assert r["dist"] == dist[v]
        if v == SOURCE:
            assert r["parent"] is None
        elif dist[v] is not None:
            # parent is a true predecessor on a shortest path, min-id tie
            p = r["parent"]
            assert (p, v) in eset and dist[p] == dist[v] - 1
            cands = [s for s, d in edges if d == v and dist[s] == dist[v] - 1]
            assert p == min(cands)
        else:
            assert r["parent"] is None


def test_flash_bfs_strategies_agree(spark):
    from graphscope_spark.flash import flash_bfs
    from graphscope_spark.algorithms import bfs as _bfs
    import random
    rng = random.Random(3)
    n = 40
    edges = [(i, i + 1) for i in range(12)] + [
        (rng.randrange(n), rng.randrange(n)) for _ in range(50)
    ]
    edges = [(u, v) for u, v in edges if u != v]
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.createDataFrame([(x,) for x in range(n)], "id long")
    g = Graph(e, v, directed=True, num_partitions=4)
    base = {r["id"]: r["dist"]
            for r in _bfs(g, 0).state.select("id", "dist").collect()}
    for strat in ("auto", "push", "pull"):
        got = {r["id"]: r["dist"]
               for r in flash_bfs(g, 0, strategy=strat).collect()}
        assert got == base, strat
    # direction='both' equals BFS on the undirected view of the graph
    g_und = Graph(e, v, directed=False, num_partitions=4)
    und_base = {r["id"]: r["dist"]
                for r in _bfs(g_und, 12).state.select("id", "dist").collect()}
    both = {r["id"]: r["dist"]
            for r in flash_bfs(g, 12, direction="both").collect()}
    assert both == und_base


def test_ktruss_fixpoint_python_oracle(spark):
    from graphscope_spark.algorithms.truss import ktruss, ktruss_sweeps
    from graphscope_spark.graph import Graph
    # two 4-cliques sharing a vertex + a dangling path
    import itertools
    cliques = [list(range(4)), [3, 10, 11, 12]]
    edges = set()
    for c in cliques:
        edges |= {tuple(sorted(p)) for p in itertools.combinations(c, 2)}
    edges |= {(12, 20), (20, 21)}
    sym = list(edges) + [(b, a) for a, b in edges]
    df = spark.createDataFrame(sym, "src long, dst long")
    g = Graph(df, directed=False, num_partitions=4)

    def oracle(k):
        surv = set(edges)
        while True:
            adj = {}
            for a, b in surv:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
            drop = {e for e in surv
                    if len(adj[e[0]] & adj[e[1]]) < k - 2}
            if not drop:
                return surv
            surv -= drop

    for k in (3, 4, 5):
        got = {(r["u"], r["v"]) for r in ktruss(g, k).collect()}
        assert got == oracle(k), k
    # 4-truss = the two cliques' edges; the path is gone
    got4 = {(r["u"], r["v"]) for r in ktruss(g, 4).collect()}
    assert got4 == {tuple(sorted(p)) for c in cliques
                    for p in itertools.combinations(c, 2)}
    # enough sweeps == fixpoint
    sw = {(r["u"], r["v"]) for r in ktruss_sweeps(g, 4, sweeps=6).collect()}
    assert sw == got4
    g.unpersist()
