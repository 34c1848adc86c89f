"""NetworkX-compatible facade — the ``graphscope.nx`` analog.

The reference vendors a networkx-API layer (python/graphscope/nx/) whose
classes mimic ``networkx.Graph``/``DiGraph`` and whose algorithm functions
(python/graphscope/nx/algorithms/builtin.py:87-1095) dispatch to the
engine's built-in apps and convert the result context to dicts/iterators
with networkx's return conventions. This module is that surface over the
Spark engine: thin classes that buffer mutations driver-side and
materialize ONE batch DataFrame graph (fine-grained per-edge mutation is
the documented anti-pattern at scale — the reference pays the same cost
through its DynamicFragment), plus functions that run the
graphscope_spark.algorithms implementations and collect to networkx-shaped
Python values.

Scale note: the *collect* into dicts is inherent to the networkx API
contract (the reference's context_to_dict does exactly this,
builtin.py:58-84); for 100 TB results stay in DataFrames — use the
algorithms module directly. This facade is for the notebook-scale workflow
the reference's nx layer serves.

Node ids must be hashable ints (the dense-id Loader handles string oids
upstream; builtin.py's @project_to_simple applies the same restriction).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

from pyspark.sql import functions as F

from graphscope_spark.graph import Graph as _SparkGraph
from graphscope_spark.session import get_spark

__all__ = [
    "Graph", "DiGraph",
    "pagerank", "hits", "degree_centrality", "in_degree_centrality",
    "out_degree_centrality", "eigenvector_centrality", "katz_centrality",
    "has_path", "single_source_dijkstra_path_length",
    "average_shortest_path_length", "bfs_edges", "bfs_predecessors",
    "bfs_successors", "all_pairs_shortest_path_length",
    "closeness_centrality", "k_core", "core_number", "clustering",
    "triangles", "transitivity", "average_clustering",
    "weakly_connected_components", "connected_components",
    "degree_assortativity_coefficient", "node_boundary", "edge_boundary",
    "average_degree_connectivity", "attribute_assortativity_coefficient",
    "numeric_assortativity_coefficient", "is_simple_path",
    "all_simple_paths", "betweenness_centrality", "voterank",
    "path_graph", "cycle_graph", "complete_graph", "star_graph",
    "gnm_random_graph",
]


class Graph:
    """Undirected graph with the networkx mutation/query surface
    (nx/classes/graph.py of the reference). Mutations buffer in plain
    Python; the Spark graph materializes lazily and is invalidated by the
    next mutation — N add_edge calls cost ONE DataFrame build, not N."""

    directed = False

    def __init__(self, incoming_edges: Iterable[tuple] | None = None):
        self._nodes: dict[int, dict] = {}
        self._edges: set[tuple[int, int]] = set()
        self._sg: _SparkGraph | None = None
        if incoming_edges is not None:
            self.add_edges_from(incoming_edges)

    # ------------------------------------------------------- mutation
    def _key(self, u: int, v: int) -> tuple[int, int]:
        return (u, v) if self.directed or u <= v else (v, u)

    def add_node(self, n: int, **attr) -> None:
        self._nodes.setdefault(int(n), {}).update(attr)
        self._sg = None

    def add_nodes_from(self, ns: Iterable) -> None:
        for n in ns:
            if isinstance(n, tuple):
                self.add_node(n[0], **n[1])
            else:
                self.add_node(n)

    def add_edge(self, u: int, v: int) -> None:
        u, v = int(u), int(v)
        self._nodes.setdefault(u, {})
        self._nodes.setdefault(v, {})
        self._edges.add(self._key(u, v))
        self._sg = None

    def add_edges_from(self, es: Iterable[tuple]) -> None:
        for u, v, *_ in es:
            self.add_edge(u, v)

    def remove_node(self, n: int) -> None:
        n = int(n)
        if n not in self._nodes:
            raise KeyError(n)
        del self._nodes[n]
        self._edges = {e for e in self._edges if n not in e}
        self._sg = None

    def remove_edge(self, u: int, v: int) -> None:
        self._edges.discard(self._key(int(u), int(v)))
        self._sg = None

    # -------------------------------------------------------- queries
    def __len__(self) -> int:
        return len(self._nodes)

    def __contains__(self, n) -> bool:
        return int(n) in self._nodes

    def number_of_nodes(self) -> int:
        return len(self._nodes)

    def number_of_edges(self) -> int:
        return len(self._edges)

    @property
    def nodes(self) -> list[int]:
        return sorted(self._nodes)

    @property
    def edges(self) -> list[tuple[int, int]]:
        return sorted(self._edges)

    def has_node(self, n) -> bool:
        return int(n) in self._nodes

    def has_edge(self, u, v) -> bool:
        return self._key(int(u), int(v)) in self._edges

    def neighbors(self, n: int) -> Iterator[int]:
        n = int(n)
        out = {d for s, d in self._edges if s == n}
        out |= {s for s, d in self._edges if d == n and not self.directed}
        return iter(sorted(out))

    def degree(self, n: int | None = None):
        """degree() → dict {node: degree}; degree(n) → int. (networkx
        returns a DegreeView; the dict is its materialization.)"""
        d = dict.fromkeys(self._nodes, 0)
        for u, v in self._edges:
            d[u] += 1
            if self.directed or u != v:
                d[v] += 1
        return d if n is None else d[int(n)]

    # --------------------------------------------------------- engine
    def _spark_graph(self) -> _SparkGraph:
        """Materialize (and cache) the backend Spark graph."""
        if self._sg is None:
            spark = get_spark()
            e = spark.createDataFrame(
                sorted(self._edges) or [(None, None)], "src long, dst long"
            ).filter(F.col("src").isNotNull())
            v = spark.createDataFrame(
                [(n,) for n in sorted(self._nodes)] or [(None,)], "id long"
            ).filter(F.col("id").isNotNull())
            self._sg = _SparkGraph(e, v, directed=self.directed)
        return self._sg

    def node_attr_df(self, attribute: str):
        spark = get_spark()
        rows = [(n, a.get(attribute)) for n, a in self._nodes.items()]
        typ = "string"
        for _, val in rows:
            if isinstance(val, bool):
                break
            if isinstance(val, (int, float)):
                typ = "double"
                break
        return spark.createDataFrame(
            [(n, None if v is None else
              (float(v) if typ == "double" else str(v))) for n, v in rows],
            f"id long, x {typ}",
        )


class DiGraph(Graph):
    """Directed variant (nx/classes/digraph.py analog)."""

    directed = True

    def in_degree(self, n: int | None = None):
        d = dict.fromkeys(self._nodes, 0)
        for _, v in self._edges:
            d[v] += 1
        return d if n is None else d[int(n)]

    def out_degree(self, n: int | None = None):
        d = dict.fromkeys(self._nodes, 0)
        for u, _ in self._edges:
            d[u] += 1
        return d if n is None else d[int(n)]

    def successors(self, n: int) -> Iterator[int]:
        return iter(sorted(d for s, d in self._edges if s == int(n)))

    def predecessors(self, n: int) -> Iterator[int]:
        return iter(sorted(s for s, d in self._edges if d == int(n)))


# ------------------------------------------------------------------ #
# algorithm functions (builtin.py:87-1095 return conventions)
# ------------------------------------------------------------------ #

def _to_dict(df, key: str, val: str) -> dict:
    return {r[key]: r[val] for r in df.collect()}


def pagerank(G: Graph, alpha: float = 0.85, max_iter: int = 100,
             tol: float = 1.0e-6) -> dict:
    """builtin.py:87-143 (pagerank_nx semantics: L1 tolerance)."""
    from graphscope_spark.algorithms import pagerank as _pr
    res = _pr(G._spark_graph(), alpha=alpha, max_iter=max_iter, tol=tol)
    return _to_dict(res.state, "id", "rank")


def hits(G: Graph, max_iter: int = 100, tol: float = 1.0e-8) -> tuple[dict, dict]:
    from graphscope_spark.algorithms import hits as _hits
    res = _hits(G._spark_graph(), max_iter=max_iter, tol=tol)
    rows = res.state.collect()
    return ({r["id"]: r["hub"] for r in rows},
            {r["id"]: r["auth"] for r in rows})


def degree_centrality(G: Graph) -> dict:
    from graphscope_spark.algorithms import degree_centrality as _dc
    return _to_dict(_dc(G._spark_graph()), "id", "dc")


def in_degree_centrality(G: DiGraph) -> dict:
    from graphscope_spark.algorithms import degree_centrality as _dc
    return _to_dict(_dc(G._spark_graph(), kind="in"), "id", "dc")


def out_degree_centrality(G: DiGraph) -> dict:
    from graphscope_spark.algorithms import degree_centrality as _dc
    return _to_dict(_dc(G._spark_graph(), kind="out"), "id", "dc")


def eigenvector_centrality(G: Graph, max_iter: int = 100,
                           tol: float = 1e-06) -> dict:
    from graphscope_spark.algorithms import eigenvector_centrality as _ec
    res = _ec(G._spark_graph(), max_iter=max_iter, tol=tol)
    return _to_dict(res.state, "id", "x")


def katz_centrality(G: Graph, alpha: float = 0.1, beta: float = 1.0,
                    max_iter: int = 100, tol: float = 1e-06) -> dict:
    from graphscope_spark.algorithms import katz_centrality as _kc
    res = _kc(G._spark_graph(), alpha=alpha, beta=beta, max_iter=max_iter,
              tol=tol)
    return _to_dict(res.state, "id", "x")


def has_path(G: Graph, source: int, target: int) -> bool:
    from graphscope_spark.algorithms.sssp import sssp_has_path
    return sssp_has_path(G._spark_graph(), int(source), int(target))


def single_source_dijkstra_path_length(G: Graph, source: int) -> dict:
    from graphscope_spark.algorithms.sssp import bfs
    st = bfs(G._spark_graph(), int(source)).state
    return {r["id"]: r["dist"] for r in st.collect()
            if r["dist"] is not None}


def average_shortest_path_length(G: Graph) -> float:
    """builtin.py:330-352: mean over ordered reachable pairs (excl self)."""
    from graphscope_spark.algorithms.paths import (
        all_pairs_shortest_path_length as _apsp,
    )
    df = _apsp(G._spark_graph()).filter(F.col("src") != F.col("id"))
    row = df.agg(F.avg("dist")).first()
    return float(row[0]) if row[0] is not None else 0.0


def bfs_edges(G: Graph, source: int) -> list[tuple[int, int]]:
    from graphscope_spark.algorithms import bfs_edges as _be
    return sorted((r["parent"], r["id"])
                  for r in _be(G._spark_graph(), int(source)).collect())


def bfs_predecessors(G: Graph, source: int) -> list[tuple[int, int]]:
    from graphscope_spark.algorithms import bfs_parents as _bp
    return sorted((r["id"], r["parent"])
                  for r in _bp(G._spark_graph(), int(source)).collect()
                  if r["parent"] is not None)


def bfs_successors(G: Graph, source: int) -> list[tuple[int, list[int]]]:
    from graphscope_spark.algorithms import bfs_successors as _bs
    by_parent: dict[int, list[int]] = {}
    for r in _bs(G._spark_graph(), int(source)).collect():
        by_parent.setdefault(r["id"], []).append(r["child"])
    return sorted((p, sorted(cs)) for p, cs in by_parent.items())


def all_pairs_shortest_path_length(G: Graph) -> dict[int, dict[int, float]]:
    from graphscope_spark.algorithms.paths import (
        all_pairs_shortest_path_length as _apsp,
    )
    out: dict[int, dict[int, float]] = {}
    for r in _apsp(G._spark_graph()).collect():
        out.setdefault(r["src"], {})[r["id"]] = r["dist"]
    return out


def closeness_centrality(G: Graph, wf_improved: bool = True) -> dict:
    from graphscope_spark.algorithms.paths import closeness_centrality as _cc
    return _to_dict(_cc(G._spark_graph(), wf_improved=wf_improved),
                    "id", "closeness")


def core_number(G: Graph) -> dict:
    from graphscope_spark.algorithms.cores import kshell
    return _to_dict(kshell(G._spark_graph()), "id", "shell")


def k_core(G: Graph, k: int | None = None) -> Graph:
    """builtin.py:505-532 — the induced subgraph of the k-core (default:
    the main core, max k with a non-empty core)."""
    cn = core_number(G)
    if k is None:
        k = max(cn.values(), default=0)
    keep = {n for n, c in cn.items() if c >= k}
    H = type(G)()
    H.add_nodes_from(keep)
    H.add_edges_from((u, v) for u, v in G.edges if u in keep and v in keep)
    return H


def clustering(G: Graph) -> dict:
    from graphscope_spark.algorithms import clustering as _cl
    return _to_dict(_cl(G._spark_graph()), "id", "cc")


def triangles(G: Graph) -> dict:
    from graphscope_spark.algorithms import triangles as _tr
    return _to_dict(_tr(G._spark_graph()), "id", "tri")


def transitivity(G: Graph) -> float:
    from graphscope_spark.algorithms import transitivity as _t
    return _t(G._spark_graph())


def average_clustering(G: Graph) -> float:
    from graphscope_spark.algorithms import average_clustering as _ac
    return _ac(G._spark_graph())


def weakly_connected_components(G: Graph) -> Iterator[set]:
    """builtin.py:602-618 — yields node sets (deterministic order here:
    by min member)."""
    from graphscope_spark.algorithms import wcc as _wcc
    comps: dict[int, set] = {}
    for r in _wcc(G._spark_graph()).state.collect():
        comps.setdefault(r["comp"], set()).add(r["id"])
    for k in sorted(comps):
        yield comps[k]


def connected_components(G: Graph) -> Iterator[set]:
    return weakly_connected_components(G)


def degree_assortativity_coefficient(G: Graph) -> float:
    from graphscope_spark.algorithms.misc import (
        degree_assortativity_coefficient as _dac,
    )
    return _dac(G._spark_graph())


def _id_df(vals: Iterable):
    return get_spark().createDataFrame(
        [(int(v),) for v in vals], "id long")


def node_boundary(G: Graph, nbunch1: Iterable, nbunch2=None) -> set:
    from graphscope_spark.algorithms.misc import node_boundary as _nb
    got = {r["id"] for r in
           _nb(G._spark_graph(), _id_df(nbunch1)).collect()}
    if nbunch2 is not None:
        got &= {int(v) for v in nbunch2}
    return got


def edge_boundary(G: Graph, nbunch1: Iterable, nbunch2=None) -> list:
    from graphscope_spark.algorithms.misc import edge_boundary as _eb
    got = sorted((r["src"], r["dst"]) for r in
                 _eb(G._spark_graph(), _id_df(nbunch1)).collect())
    if nbunch2 is not None:
        s2 = {int(v) for v in nbunch2}
        got = [(u, v) for u, v in got if v in s2]
    return got


def average_degree_connectivity(G: Graph) -> dict:
    from graphscope_spark.algorithms.misc import (
        average_degree_connectivity as _adc,
    )
    return _to_dict(_adc(G._spark_graph()), "deg", "avg_nbr_deg")


def attribute_assortativity_coefficient(G: Graph, attribute: str) -> float:
    from graphscope_spark.algorithms.misc import attribute_assortativity
    g = G._spark_graph()
    attrs = G.node_attr_df(attribute)
    g2 = _SparkGraph(g.edges, g.vertices.join(attrs, "id"),
                     g.directed, g.num_partitions,
                     assume_symmetric=not g.directed)
    return attribute_assortativity(g2, "x")


def numeric_assortativity_coefficient(G: Graph, attribute: str) -> float:
    from graphscope_spark.algorithms.misc import numeric_assortativity
    g = G._spark_graph()
    attrs = G.node_attr_df(attribute)
    g2 = _SparkGraph(g.edges, g.vertices.join(attrs, "id"),
                     g.directed, g.num_partitions,
                     assume_symmetric=not g.directed)
    return numeric_assortativity(g2, "x")


def common_neighbors(G: Graph, u: int, v: int):
    """nx convention: iterator of nodes (the reference re-exports this
    surface at python/graphscope/nx/classes/function.py:52)."""
    from graphscope_spark.algorithms.link_prediction import (
        common_neighbors as _cn,
    )
    return iter(sorted(r["id"] for r in
                       _cn(G._spark_graph(), u, v).collect()))


def _lp_scores(G: Graph, ebunch, col: str):
    from graphscope_spark.algorithms.link_prediction import link_prediction
    df = link_prediction(G._spark_graph())
    scores = {(r["u"], r["v"]): r[col] for r in df.collect()}
    if ebunch is None:
        pairs = sorted(scores)
    else:
        pairs = [(min(u, v), max(u, v)) for u, v in ebunch]
    return iter([(u, v, scores.get((u, v), 0.0)) for u, v in pairs])


def jaccard_coefficient(G: Graph, ebunch=None):
    """nx convention: iterator of (u, v, score) over non-adjacent pairs."""
    return _lp_scores(G, ebunch, "jaccard")


def adamic_adar_index(G: Graph, ebunch=None):
    return _lp_scores(G, ebunch, "adamic_adar")


def resource_allocation_index(G: Graph, ebunch=None):
    return _lp_scores(G, ebunch, "resource_alloc")


def preferential_attachment(G: Graph, ebunch=None):
    """nx convention; note nx computes deg(u)·deg(v) for ANY pair — this
    surface scores the non-adjacent candidate pairs (ebunch entries
    without a common neighbor score 0, documented divergence)."""
    return _lp_scores(G, ebunch, "pref_attach")


def is_simple_path(G: Graph, nodes: list[int]) -> bool:
    from graphscope_spark.algorithms import is_simple_path as _isp
    return _isp(G._spark_graph(), [int(n) for n in nodes])


def all_simple_paths(G: Graph, source: int, target_nodes,
                     cutoff: int = 10) -> list[list[int]]:
    from graphscope_spark.algorithms import all_simple_paths as _asp
    if not isinstance(target_nodes, (list, tuple, set)):
        target_nodes = [target_nodes]
    df = _asp(G._spark_graph(), int(source),
              [int(t) for t in target_nodes], cutoff=cutoff)
    return sorted([int(x) for x in r["path_str"].split("->")]
                  for r in df.collect())


def betweenness_centrality(G: Graph, normalized: bool = True) -> dict:
    from graphscope_spark.algorithms.paths import betweenness_centrality as _bc
    return _to_dict(_bc(G._spark_graph(), normalized=normalized),
                    "id", "betweenness")


def voterank(G: Graph, num_of_nodes: int = 0) -> list[int]:
    """builtin.py:1095 — elected influencers in election order."""
    from graphscope_spark.algorithms import voterank as _vr
    df = _vr(G._spark_graph(), num_of_nodes=num_of_nodes or None)
    rows = df.filter(F.col("rank") > 0).orderBy("rank").collect()
    return [r["id"] for r in rows]


# ------------------------------------------------------------------ #
# classic generators (nx/generators/classic.py analog — the reference
# vendors networkx's generators over its own classes; these build the
# driver-side class directly, deterministic by construction)
# ------------------------------------------------------------------ #

def path_graph(n: int, create_using=None) -> Graph:
    G = (create_using or Graph)()
    G.add_nodes_from(range(n))
    G.add_edges_from((i, i + 1) for i in range(n - 1))
    return G


def cycle_graph(n: int, create_using=None) -> Graph:
    G = path_graph(n, create_using)
    if n > 1:
        G.add_edge(n - 1, 0)
    return G


def complete_graph(n: int, create_using=None) -> Graph:
    G = (create_using or Graph)()
    G.add_nodes_from(range(n))
    if G.directed:
        G.add_edges_from((i, j) for i in range(n) for j in range(n) if i != j)
    else:
        G.add_edges_from((i, j) for i in range(n) for j in range(i + 1, n))
    return G


def star_graph(n: int) -> Graph:
    """Center 0 plus n leaves (networkx star_graph convention)."""
    G = Graph()
    G.add_nodes_from(range(n + 1))
    G.add_edges_from((0, i) for i in range(1, n + 1))
    return G


def gnm_random_graph(n: int, m: int, seed: int = 42,
                     create_using=None) -> Graph:
    """Deterministic G(n, m): the m lexicographically-hash-smallest vertex
    pairs (md5-driven, engine-portable — no RNG state, same graph on any
    machine; the nx generator's random.sample is replaced by a hash rank
    so results are reproducible across processes, which a distributed
    engine needs)."""
    import hashlib

    G = (create_using or Graph)()
    G.add_nodes_from(range(n))
    pairs = (
        (i, j) for i in range(n)
        for j in range(n if G.directed else i + 1, n) if i != j
    )
    ranked = sorted(
        pairs,
        key=lambda p: hashlib.md5(f"{seed}:{p[0]}:{p[1]}".encode()).hexdigest(),
    )
    G.add_edges_from(ranked[:m])
    return G
