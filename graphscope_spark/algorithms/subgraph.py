"""FLASH subgraph-counting family — non-iterative join dataflows.

Reference semantics (analytical_engine/apps/flash/subgraph/):

* ``rectangle.h``    — 4-cycle (rectangle) count.
* ``diamond.h``      — diamond (K4 minus one edge) count.
* ``tailed-triangle.h`` — triangle + pendant edge count.
* ``3-path.h``       — paths with exactly 3 edges (as subgraphs).
* ``k-clique.h``     — k-clique count via degree-ordered orientation.
* ``acyclic-triangle.h`` — directed triples a→b, b→c, a→c (transitive
  triangles; each counted once — it has a unique topological order).
* ``cyclic-triangle.h``  — directed 3-cycles a→b→c→a, each cycle counted
  once (the reference's (deg,id) orientation picks one representative; we
  fix the rotation with the minimum vertex first — same count).
* ``in-triangle.h``  — mutual pair u↔v with a common out-neighbor x
  (u→x, v→x), one count per unordered mutual pair per x.
* ``out-triangle.h`` — mutual pair u↔v with a common in-neighbor x.
* ``densest-sub-2-approx.h`` — Charikar-style min-degree peeling; we reuse
  the core decomposition (max-core subgraph density is the same 1/2
  approximation guarantee; cores.py already computes the peel).

All counts run on the *simple* undirected projection (canonical u<v edges,
self-loops dropped) or the distinct directed edge set — the reference's
flash fragments are likewise simple.

Scale notes: every dataflow below is a bounded number of joins + one
aggregation — no driver loop (except k_clique's k−2 extension joins, a
fixed small k). The undirected counts route all wedge generation through
the degree-ordered orientation (oriented out-degree is O(sqrt(E))), the
same trick triangles.py uses, so hub vertices do not explode the wedge
join. The closed-form identities (diamond from per-edge triangle counts,
tailed triangle and 3-path from per-vertex counts + degrees) avoid
materializing the larger pattern entirely — each is a triangle-join plus
arithmetic, which is how one would do it at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import Graph
from graphscope_spark.algorithms.triangles import _undirected_simple_edges


def _oriented(canon: DataFrame) -> DataFrame:
    """Degree-ordered orientation of a canonical (u<v) simple edge list:
    keep u→v iff (deg(u), u) < (deg(v), v) — triangles.h:78-91."""
    deg = (
        canon.select(F.col("u").alias("id"))
        .union(canon.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    both = canon.union(
        canon.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    return (
        both.join(deg.withColumnRenamed("id", "u").withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("id", "v").withColumnRenamed("deg", "dv"), "v")
        .filter(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
        )
        .select("u", "v")
    )


def _triangle_rows(canon: DataFrame) -> DataFrame:
    """All triangles as (a, b, c) rows, one row per triangle, via the
    degree-ordered wedge join (same dataflow as triangles.py; b < c in
    vertex order, a is the wedge apex in orientation order)."""
    oriented = _oriented(canon)
    e1 = oriented.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = oriented.select(F.col("u").alias("a"), F.col("v").alias("c"))
    wedges = e1.join(e2, "a").filter(F.col("b") < F.col("c"))
    closing = oriented.select(
        F.least("u", "v").alias("b"), F.greatest("u", "v").alias("c")
    )
    return wedges.join(closing, ["b", "c"], "inner").select("a", "b", "c")


# --------------------------------------------------------------------- #
# undirected counts
# --------------------------------------------------------------------- #


def rectangle_count(g: Graph) -> DataFrame:
    """4-cycle count: ``(rectangles: long)`` single row.

    flash/subgraph/rectangle.h. Identity: every 4-cycle x–m1–y–m2–x is
    determined by its two diagonals; for each unordered pair {x, y} with
    ``p`` common neighbors there are C(p, 2) cycles using {x, y} as one
    diagonal, and each 4-cycle is counted once per diagonal, i.e. twice:

        rectangles = Σ_{x<y} C(cn(x,y), 2) / 2

    The common-neighbor pair counts come from a wedge join through the
    midpoint; orientation is NOT applicable here (we need every wedge),
    so the groupBy on the (x, y) pair is the shuffle — skew-free because
    pair keys are fine-grained even when the midpoint is a hub.
    """
    canon = _undirected_simple_edges(g)
    both = canon.union(
        canon.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    # wedges x–m–y, x < y, grouped to common-neighbour counts per pair
    w1 = both.select(F.col("u").alias("m"), F.col("v").alias("x"))
    w2 = both.select(F.col("u").alias("m"), F.col("v").alias("y"))
    cn = (
        w1.join(w2, "m")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("p"))
    )
    return cn.agg(
        (
            F.coalesce(F.sum(F.col("p") * (F.col("p") - 1) / 2), F.lit(0.0)) / 2
        ).cast("long").alias("rectangles")
    )


def diamond_count(g: Graph) -> DataFrame:
    """Diamond (K4 minus an edge) count: ``(diamonds: long)`` single row.

    flash/subgraph/diamond.h. Identity: a diamond is two triangles sharing
    an edge, so with t_e = triangles containing edge e,

        diamonds = Σ_e C(t_e, 2)
    """
    canon = _undirected_simple_edges(g)
    tris = _triangle_rows(canon)
    edge_tri = (
        tris.select(F.least("a", "b").alias("s"), F.greatest("a", "b").alias("t"))
        .union(tris.select(F.least("a", "c").alias("s"), F.greatest("a", "c").alias("t")))
        .union(tris.select(F.least("b", "c").alias("s"), F.greatest("b", "c").alias("t")))
        .groupBy("s", "t")
        .agg(F.count(F.lit(1)).alias("te"))
    )
    return edge_tri.agg(
        F.coalesce(F.sum(F.col("te") * (F.col("te") - 1) / 2), F.lit(0.0))
        .cast("long")
        .alias("diamonds")
    )


def tailed_triangle_count(g: Graph) -> DataFrame:
    """Tailed-triangle count: ``(tailed: long)`` single row.

    flash/subgraph/tailed-triangle.h. Identity: a tailed triangle is a
    triangle plus a pendant edge at one corner, so with t_v = triangles at
    v and d_v = simple degree,

        tailed = Σ_v t_v · (d_v − 2)
    """
    canon = _undirected_simple_edges(g)
    tris = _triangle_rows(canon)
    per_v = (
        tris.select(F.col("a").alias("id"))
        .union(tris.select(F.col("b").alias("id")))
        .union(tris.select(F.col("c").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("tri"))
    )
    deg = (
        canon.select(F.col("u").alias("id"))
        .union(canon.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    return (
        per_v.join(deg, "id")
        .agg(
            F.coalesce(F.sum(F.col("tri") * (F.col("deg") - 2)), F.lit(0))
            .cast("long")
            .alias("tailed")
        )
    )


def three_path_count(g: Graph) -> DataFrame:
    """Count of paths with exactly 3 edges: ``(paths3: long)`` single row.

    flash/subgraph/3-path.h. Identity over the simple graph: walks
    x–u–v–y with x≠v, y≠u around a middle edge (u,v) number
    (d_u−1)(d_v−1); subtracting the x = y cases (3 per triangle — one per
    choice of middle edge) leaves exactly the 3-edge paths *plus* the
    3-cycles-with-repeat removed; each path is counted once (its middle
    edge is unique):

        paths3 = Σ_{(u,v)∈E} (d_u − 1)(d_v − 1) − 3·triangles
    """
    canon = _undirected_simple_edges(g)
    deg = (
        canon.select(F.col("u").alias("id"))
        .union(canon.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    walks = (
        canon.join(deg.withColumnRenamed("id", "u").withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("id", "v").withColumnRenamed("deg", "dv"), "v")
        .agg(
            F.coalesce(
                F.sum((F.col("du") - 1) * (F.col("dv") - 1)), F.lit(0)
            ).alias("w")
        )
    )
    ntri = _triangle_rows(canon).agg(F.count(F.lit(1)).alias("t"))
    return walks.crossJoin(ntri).select(
        (F.col("w") - 3 * F.col("t")).cast("long").alias("paths3")
    )


def k_clique_count(g: Graph, k: int = 4) -> DataFrame:
    """k-clique count: ``(cliques: long)`` single row.

    flash/subgraph/k-clique.h. Degree-ordered orientation (oriented
    out-degree O(sqrt E)) then k−2 extension joins: grow an oriented
    clique prefix c1→…→ci one vertex at a time, requiring the new vertex
    to be an oriented out-neighbour of *every* prefix vertex. Each clique
    is produced exactly once (its vertices have a unique orientation
    order). k is a small constant — the joins are a fixed-depth dataflow,
    not a driver loop over data.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    canon = _undirected_simple_edges(g)
    oriented = _oriented(canon).persist()
    # prefix: clique c1 → c2 (oriented)
    prefix = oriented.select(F.col("u").alias("c1"), F.col("v").alias("c2"))
    for i in range(3, k + 1):
        new = f"c{i}"
        # candidates: oriented out-neighbours of the last prefix vertex
        cand = oriented.select(
            F.col("u").alias(f"c{i-1}"), F.col("v").alias(new)
        )
        prefix = prefix.join(cand, f"c{i-1}")
        # the new vertex must also be an oriented out-neighbour of every
        # earlier prefix vertex
        for j in range(1, i - 1):
            chk = oriented.select(
                F.col("u").alias(f"c{j}"), F.col("v").alias(new)
            )
            prefix = prefix.join(chk, [f"c{j}", new], "left_semi")
    return prefix.agg(F.count(F.lit(1)).alias("cliques"))


def densest_subgraph_2approx(g: Graph) -> DataFrame:
    """Charikar 2-approximate densest subgraph: one row
    ``(density: double, vertices: long, edges: long)``.

    flash/subgraph/densest-sub-2-approx.h peels the min-degree vertex and
    keeps the densest prefix; the max-core subgraph carries the same 1/2
    approximation guarantee (every vertex of the k_max-core has induced
    degree ≥ k_max ≥ ρ*, so density ≥ k_max/2 ≥ ρ*/2) and falls out of
    the core decomposition we already compute (cores.py single peel loop).
    """
    from graphscope_spark.algorithms.cores import kshell

    cores = kshell(g).persist()
    kmax = cores.agg(F.max("shell")).first()[0]
    if kmax is None:
        return g.spark.createDataFrame(
            [(0.0, 0, 0)], "density double, vertices long, edges long"
        )
    keep = cores.filter(F.col("shell") == kmax).select("id")
    canon = _undirected_simple_edges(g)
    sub = (
        canon.join(keep.withColumnRenamed("id", "u"), "u", "left_semi")
        .join(keep.withColumnRenamed("id", "v"), "v", "left_semi")
    )
    nv = keep.count()
    ne = sub.count()
    return g.spark.createDataFrame(
        [(float(ne) / nv if nv else 0.0, nv, ne)],
        "density double, vertices long, edges long",
    )


# --------------------------------------------------------------------- #
# directed triangle census
# --------------------------------------------------------------------- #


def _directed_simple_edges(g: Graph) -> DataFrame:
    return (
        g.edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def acyclic_triangle_count(g: Graph) -> DataFrame:
    """Transitive (acyclic) directed triangles a→b, b→c, a→c:
    ``(acyclic: long)``. flash/subgraph/acyclic-triangle.h — each such
    triangle has a unique topological order, so the join counts it once."""
    e = _directed_simple_edges(g)
    ab = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ac = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    return (
        ab.join(bc, "b")
        .join(ac, ["a", "c"], "left_semi")
        .filter(F.col("a") != F.col("c"))
        .agg(F.count(F.lit(1)).alias("acyclic"))
    )


def cyclic_triangle_count(g: Graph) -> DataFrame:
    """Directed 3-cycles a→b→c→a: ``(cyclic: long)``; each cycle counted
    once (rotation fixed by requiring a to be the minimum vertex).
    flash/subgraph/cyclic-triangle.h."""
    e = _directed_simple_edges(g)
    ab = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ca = e.select(F.col("src").alias("c"), F.col("dst").alias("a"))
    return (
        ab.join(bc, "b")
        .join(ca, ["c", "a"], "left_semi")
        .filter((F.col("a") < F.col("b")) & (F.col("a") < F.col("c")))
        .agg(F.count(F.lit(1)).alias("cyclic"))
    )


def in_triangle_count(g: Graph) -> DataFrame:
    """Mutual pair u↔v with a common out-neighbour x (u→x and v→x):
    ``(in_triangles: long)``; one count per unordered mutual pair per x.
    flash/subgraph/in-triangle.h (the reference's (deg,id) check likewise
    processes each mutual pair once)."""
    e = _directed_simple_edges(g)
    mutual = (
        e.join(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
            ["src", "dst"],
            "left_semi",
        )
        .filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
    )
    ux = e.select(F.col("src").alias("u"), F.col("dst").alias("x"))
    vx = e.select(F.col("src").alias("v"), F.col("dst").alias("x"))
    return (
        mutual.join(ux, "u")
        .join(vx, ["v", "x"], "left_semi")
        .filter((F.col("x") != F.col("u")) & (F.col("x") != F.col("v")))
        .agg(F.count(F.lit(1)).alias("in_triangles"))
    )


def out_triangle_count(g: Graph) -> DataFrame:
    """Mutual pair u↔v with a common in-neighbour x (x→u and x→v):
    ``(out_triangles: long)``. flash/subgraph/out-triangle.h."""
    e = _directed_simple_edges(g)
    mutual = (
        e.join(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
            ["src", "dst"],
            "left_semi",
        )
        .filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
    )
    xu = e.select(F.col("dst").alias("u"), F.col("src").alias("x"))
    xv = e.select(F.col("dst").alias("v"), F.col("src").alias("x"))
    return (
        mutual.join(xu, "u")
        .join(xv, ["v", "x"], "left_semi")
        .filter((F.col("x") != F.col("u")) & (F.col("x") != F.col("v")))
        .agg(F.count(F.lit(1)).alias("out_triangles"))
    )


def cycle_plus_triangle_count(g: Graph) -> DataFrame:
    """Cycle+ triangles: directed 3-cycles d→x→s→d whose closing pair is
    MUTUAL (s→d and d→s both present) — counted per (s→d mutual-ordered
    edge, x), exactly the reference's per-vertex accumulation summed:
    flash/subgraph/cycle-plus-triangle.h:60-77 (update2: for edge s→d with
    d∈s.in, count x ∈ s.in ∩ d.out). ``(cycle_plus: long)``.

    Plan: mutual-pair semi-join, then one join on s (x→s) and one semi-join
    on (d, x) (d→x) — all equi-joins on the deduped directed edge table,
    no driver loop."""
    e = _directed_simple_edges(g)
    mutual = e.join(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        ["src", "dst"],
        "left_semi",
    ).select(F.col("src").alias("s"), F.col("dst").alias("d"))
    xs = e.select(F.col("dst").alias("s"), F.col("src").alias("x"))  # x→s
    dx = e.select(F.col("src").alias("d"), F.col("dst").alias("x"))  # d→x
    return (
        mutual.join(xs, "s")
        .join(dx, ["d", "x"], "left_semi")
        .agg(F.count(F.lit(1)).alias("cycle_plus"))
    )
