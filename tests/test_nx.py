"""NetworkX-compat facade tests — nx-shaped return values vs the python
oracles (the role of the reference's nx test suites,
python/graphscope/nx/tests — SURVEY.md §5)."""

from __future__ import annotations

import math

import pytest

from graphscope_spark import nx


@pytest.fixture(scope="module")
def K4():
    G = nx.Graph()
    G.add_edges_from([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)])
    return G


@pytest.fixture(scope="module")
def D():
    # 0->1->2->3, 0->2 plus isolated 9
    G = nx.DiGraph([(0, 1), (1, 2), (2, 3), (0, 2)])
    G.add_node(9)
    return G


def test_classes_mutation_and_views(D):
    G = nx.Graph()
    G.add_edge(1, 2)
    G.add_edge(2, 1)          # same undirected edge
    assert G.number_of_edges() == 1
    assert G.has_edge(2, 1) and 1 in G and len(G) == 2
    G.add_node(7, color="red")
    assert G.nodes == [1, 2, 7]
    G.remove_node(1)
    assert G.number_of_edges() == 0
    assert list(D.successors(0)) == [1, 2]
    assert list(D.predecessors(2)) == [0, 1]
    assert D.out_degree(0) == 2 and D.in_degree(3) == 1
    assert D.degree(2) == 3
    assert list(D.neighbors(0)) == [1, 2]


def test_pagerank_and_centrality(K4):
    pr = nx.pagerank(K4, max_iter=50)
    assert set(pr) == {0, 1, 2, 3}
    assert all(math.isclose(v, 0.25, abs_tol=1e-6) for v in pr.values())
    dc = nx.degree_centrality(K4)
    assert all(math.isclose(v, 2.0, abs_tol=1e-9) for v in dc.values())
    ec = nx.eigenvector_centrality(K4, max_iter=30)
    assert all(math.isclose(v, 0.5, abs_tol=1e-6) for v in ec.values())
    bc = nx.betweenness_centrality(K4)
    assert all(math.isclose(v, 0.0, abs_tol=1e-9) for v in bc.values())
    h, a = nx.hits(K4, max_iter=20)
    assert all(math.isclose(v, 0.25, abs_tol=1e-6) for v in h.values())
    assert all(math.isclose(v, 0.25, abs_tol=1e-6) for v in a.values())


def test_paths_and_components(D):
    assert nx.has_path(D, 0, 3) and not nx.has_path(D, 3, 0)
    d = nx.single_source_dijkstra_path_length(D, 0)
    assert d == {0: 0.0, 1: 1.0, 2: 1.0, 3: 2.0}
    comps = list(nx.weakly_connected_components(D))
    assert comps == [{0, 1, 2, 3}, {9}]
    assert nx.bfs_predecessors(D, 0) == [(1, 0), (2, 0), (3, 2)]
    assert nx.bfs_edges(D, 0) == [(0, 1), (0, 2), (2, 3)]
    assert nx.bfs_successors(D, 0) == [(0, [1, 2]), (2, [3])]
    apl = nx.all_pairs_shortest_path_length(D)
    assert apl[0][3] == 2.0 and 0 not in apl[3]


def test_triangles_clustering_cores(K4):
    t = nx.triangles(K4)
    assert all(v == 3 for v in t.values())
    assert math.isclose(nx.transitivity(K4), 1.0, abs_tol=1e-9)
    assert math.isclose(nx.average_clustering(K4), 1.0, abs_tol=1e-9)
    cn = nx.core_number(K4)
    assert all(v == 3 for v in cn.values())
    H = nx.k_core(K4, 3)
    assert H.number_of_nodes() == 4 and H.number_of_edges() == 6
    # average path length on K4 is 1 (every pair adjacent)
    assert math.isclose(nx.average_shortest_path_length(K4), 1.0,
                        abs_tol=1e-9)


def test_boundaries_simple_paths_voterank(D, K4):
    assert nx.node_boundary(D, [0, 1]) == {2}
    assert nx.edge_boundary(D, [0, 1]) == [(0, 2), (1, 2)]
    assert nx.is_simple_path(D, [0, 1, 2, 3])
    assert not nx.is_simple_path(D, [0, 2, 1])
    paths = nx.all_simple_paths(D, 0, 3, cutoff=4)
    assert paths == [[0, 1, 2, 3], [0, 2, 3]]
    vr = nx.voterank(K4, num_of_nodes=2)
    assert len(vr) == 2 and vr[0] == 0  # min-id tie-break elects 0 first


def test_attribute_assortativity():
    G = nx.Graph()
    for n in range(4):
        G.add_node(n, grp="a" if n < 2 else "b", x=float(n))
    G.add_edges_from([(0, 1), (2, 3)])
    # perfectly assortative by group
    assert math.isclose(
        nx.attribute_assortativity_coefficient(G, "grp"), 1.0, abs_tol=1e-9
    )
    num = nx.numeric_assortativity_coefficient(G, "x")
    assert num == num  # defined (not NaN)


def test_generators():
    P = nx.path_graph(5)
    assert P.number_of_edges() == 4 and P.degree(0) == 1
    C = nx.cycle_graph(5)
    assert all(d == 2 for d in C.degree().values())
    K = nx.complete_graph(4, create_using=nx.DiGraph)
    assert K.number_of_edges() == 12
    S = nx.star_graph(4)
    assert S.degree(0) == 4 and S.number_of_nodes() == 5
    G1 = nx.gnm_random_graph(20, 30, seed=7)
    G2 = nx.gnm_random_graph(20, 30, seed=7)
    assert G1.edges == G2.edges and G1.number_of_edges() == 30
    assert nx.gnm_random_graph(20, 30, seed=8).edges != G1.edges


def test_link_prediction_surface():
    import graphscope_spark.nx as gnx
    G = gnx.Graph()
    G.add_edges_from([(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)])
    assert list(gnx.common_neighbors(G, 2, 4)) == [1, 3]
    jc = list(gnx.jaccard_coefficient(G))
    assert jc == [(2, 4, 1.0)]
    aa = list(gnx.adamic_adar_index(G, [(2, 4)]))
    import math
    assert aa == [(2, 4, round(2 / math.log(3), 6))]
    pa = list(gnx.preferential_attachment(G, [(4, 2)]))
    assert pa == [(2, 4, 4)]
