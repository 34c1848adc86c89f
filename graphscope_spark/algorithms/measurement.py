"""FLASH measurement family: minimum spanning forest, approximate
diameter/radius, k-center.

Reference semantics (analytical_engine/apps/flash/measurement/):

* ``msf.h:40-62`` — minimum spanning forest. The reference runs local
  Kruskal per fragment then a sequential merge reduce (msf.h:54-58) — a
  driver-side funnel that does not distribute. The Spark-first
  re-expression is Borůvka: each round every component selects its
  minimum-weight outgoing edge (ties broken on the canonical (u, v) pair,
  so the forest is deterministic and, with distinct keys, unique), the
  chosen edges hook components together, and pointer-doubling collapses
  the hooking forest to component roots — O(log V) rounds of joins on a
  component-sized table. Total weight equals Kruskal's (matroid
  exchange), which the pytest oracle recomputes sequentially.
* ``diameter-approx.h:43-108`` — two k-source BFS sweeps: BFS from k
  pseudo-random sources gives per-vertex eccentricity lower bounds; the k
  vertices with the largest bounds seed a second sweep; diameter = max
  ecc, radius = min nonzero ecc (diameter-approx.h:103-105). The
  reference seeds with rand_r(time(NULL)) (:53); we derive sources from
  the portable 60-bit md5 hash (functions/hashing.py) so runs are
  reproducible AND the DuckDB gate twin can select the same sources.
* ``k-center.h:41-77`` — greedy farthest-point: start from the max-degree
  vertex (:48-54), then k−1 times add the vertex farthest from the
  current centers (:66-75) and relax distances with a BFS from it. Ties
  broken to the larger id (the reference's local traverse keeps the
  first strict maximum; a deterministic total order is required for a
  distributed run to be reproducible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graphscope_spark.graph import Graph, materialized_checkpoint
from graphscope_spark.algorithms.paths import multi_source_bfs
from graphscope_spark.functions.hashing import hash64

_MEM_DISK = StorageLevel.MEMORY_AND_DISK

#: sentinel for "unreached" in k_center (the reference's INT_MAX)
_INF = (1 << 31) - 1


def msf(g: Graph, weight_col: str | None = None) -> DataFrame:
    """(src, dst, weight) — minimum spanning forest, canonical src < dst.

    ``weight_col=None`` treats every edge as weight 1.0 (the forest is
    then a spanning forest minimizing nothing in particular but still
    deterministic via the (weight, src, dst) tiebreak).
    """
    cols = ["src", "dst"] + ([weight_col] if weight_col else [])
    e = g.edges.select(*cols).filter(F.col("src") != F.col("dst"))
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    canon = (
        e.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            w.alias("w"),
        )
        # parallel edges: keep the lightest (deterministic min)
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))
        .repartition(g.num_partitions, "u")
        .persist(_MEM_DISK)
    )
    comp = materialized_checkpoint(
        g.vertices.select("id", F.col("id").alias("comp"))
    )
    forest_parts: list[DataFrame] = []
    while True:
        ce = (
            canon.join(
                comp.select(F.col("id").alias("u"), F.col("comp").alias("cu")), "u"
            )
            .join(
                comp.select(F.col("id").alias("v"), F.col("comp").alias("cv")), "v"
            )
            .filter(F.col("cu") != F.col("cv"))
        )
        # per-component minimum outgoing edge, deterministic by
        # (w, u, v); both directions so every component votes
        cand = ce.select(
            F.col("cu").alias("c"),
            F.struct("w", "u", "v", F.col("cv").alias("oc")).alias("e"),
        ).union(
            ce.select(
                F.col("cv").alias("c"),
                F.struct("w", "u", "v", F.col("cu").alias("oc")).alias("e"),
            )
        )
        sel = cand.groupBy("c").agg(F.min("e").alias("e")) \
            .localCheckpoint(eager=True)
        if sel.limit(1).count() == 0:
            break
        forest_parts.append(
            sel.select("e.u", "e.v", "e.w").distinct()
            .localCheckpoint(eager=True)
        )
        # hooking: parent(c) = other endpoint's component of c's min edge.
        # With distinct (w, u, v) keys the only cycles are mutual pairs;
        # break them toward the smaller component id. Hooking and doubling
        # SELF-join the parent table, so every round state goes through
        # materialized_checkpoint (graph.py) to keep size estimates real.
        parent = sel.select("c", F.col("e.oc").alias("p"))
        p2 = parent.select(F.col("c").alias("p"), F.col("p").alias("pp"))
        parent = materialized_checkpoint(
            parent.join(p2, "p", "left")
            .select(
                "c",
                F.when(
                    (F.col("pp") == F.col("c")) & (F.col("c") < F.col("p")),
                    F.col("c"),
                ).otherwise(F.col("p")).alias("p"),
            )
        )
        # pointer doubling to roots
        while True:
            nxt = parent.alias("a").join(
                parent.select(F.col("c").alias("p"), F.col("p").alias("gp")).alias("b"),
                "p",
                "left",
            ).select(
                F.col("c"), F.coalesce(F.col("gp"), F.col("p")).alias("p"),
                (F.coalesce(F.col("gp"), F.col("p")) != F.col("p")).alias("_moved"),
            )
            nxt = materialized_checkpoint(nxt)
            moved = nxt.filter(F.col("_moved")).limit(1).count()
            parent.unpersist()
            parent = nxt.select("c", "p")
            if moved == 0:
                break
        prev_comp = comp
        comp = materialized_checkpoint(
            comp.join(parent.withColumnRenamed("c", "comp"), "comp", "left")
            .select("id", F.coalesce(F.col("p"), F.col("comp")).alias("comp"))
        )
        prev_comp.unpersist()
    canon.unpersist()
    if not forest_parts:
        return g.spark.createDataFrame([], "src long, dst long, weight double")
    out = forest_parts[0]
    for p in forest_parts[1:]:
        out = out.union(p)
    return out.select(
        F.col("u").alias("src"), F.col("v").alias("dst"),
        F.col("w").alias("weight"),
    ).distinct()


def msf_weight(g: Graph, weight_col: str | None = None) -> float:
    """Scalar total forest weight — msf.h GlobalRes (:43)."""
    row = msf(g, weight_col).agg(F.coalesce(F.sum("weight"), F.lit(0.0))).first()
    return float(row[0])


def _ecc(pairs: DataFrame) -> DataFrame:
    """(id, ecc) — max BFS distance per reached vertex."""
    return pairs.groupBy("id").agg(F.max("dist").alias("ecc"))


def diameter_approx(g: Graph, k: int = 16, seed: int = 42) -> DataFrame:
    """One row ``(diameter: int, radius: int)`` — double-sweep k-source
    approximation (diameter-approx.h:43-108; both are lower/upper *bounds*
    in the reference too)."""
    spark = g.spark
    first = (
        g.vertices.select("id")
        .orderBy(
            hash64(F.concat(F.col("id").cast("string"), F.lit(f":{seed}"))),
            F.col("id"),
        )
        .limit(k)
    )
    d1 = multi_source_bfs(g, first)
    ecc1 = _ecc(d1).persist(_MEM_DISK)
    second = (
        ecc1.orderBy(F.col("ecc").desc(), F.col("id").desc())
        .limit(k)
        .select("id")
    )
    d2 = multi_source_bfs(g, second)
    # eccentricity accumulates across both sweeps (the reference keeps
    # v.ecc across phases, diameter-approx.h:58,99)
    ecc = (
        ecc1.union(_ecc(d2))
        .groupBy("id")
        .agg(F.max("ecc").alias("ecc"))
    )
    row = ecc.agg(
        F.max("ecc").alias("diameter"),
        F.min(F.when(F.col("ecc") > 0, F.col("ecc"))).alias("radius"),
    ).first()
    ecc1.unpersist()
    diam = int(row["diameter"] or 0)
    rad = int(row["radius"] if row["radius"] is not None else 0)
    return spark.createDataFrame([(diam, rad)], "diameter int, radius int")


def k_center(g: Graph, k: int = 4) -> DataFrame:
    """(id, dis) — distance to the nearest of k greedily-chosen centers
    (k-center.h:41-77). dis = 2^31−1 for vertices unreachable from every
    center (the reference's INT_MAX init)."""
    deg = g.degrees.select(
        "id", (F.col("out_deg") + F.col("in_deg")).alias("_d")
    )
    first = deg.orderBy(F.col("_d").desc(), F.col("id").desc()).limit(1) \
        .select("id")
    dis = (
        g.vertices.select("id")
        .join(
            multi_source_bfs(g, first).groupBy("id").agg(F.min("dist").alias("_nd")),
            "id", "left",
        )
        .select("id", F.coalesce(F.col("_nd"), F.lit(_INF)).alias("dis"))
        .localCheckpoint(eager=True)
    )
    for _ in range(k - 1):
        nxt = dis.orderBy(F.col("dis").desc(), F.col("id").desc()).limit(1) \
            .select("id")
        upd = multi_source_bfs(g, nxt).groupBy("id").agg(
            F.min("dist").alias("_nd")
        )
        dis = (
            dis.join(upd, "id", "left")
            .select(
                "id",
                F.least(F.col("dis"), F.coalesce(F.col("_nd"), F.lit(_INF)))
                .alias("dis"),
            )
            .localCheckpoint(eager=True)
        )
    return dis


def _local_kruskal(batches):
    """Per-partition Kruskal in (w, u, v) lexicographic order — the
    FLASH_Block local phase of msf-block.h:55-58. Emits the block's local
    MSF edges; an edge it rejects is the lexicographic-max edge of a cycle
    within the block, hence (cycle property) never in the global
    lexicographic MSF — so this is a lossless candidate filter."""
    import pandas as pd

    dfs = [d for d in batches]
    if not dfs:
        return
    df = pd.concat(dfs).sort_values(["w", "u", "v"])
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    keep = []
    for row in df.itertuples(index=False):
        u, v = int(row.u), int(row.v)
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[rv] = ru
            keep.append((u, v, float(row.w)))
    yield pd.DataFrame(keep, columns=["u", "v", "w"])


def msf_block(g: Graph, weight_col: str | None = None) -> DataFrame:
    """(src, dst, weight) — block-centric MSF (msf-block.h:45-63): a
    partition-local sequential Kruskal pass filters each edge block down
    to its local forest (≤ |block vertices|−1 edges survive — at 100 TB
    this is the step that turns an edge-scale problem into a vertex-scale
    one with ZERO shuffle), then the distributed Borůvka of :func:`msf`
    merges the surviving candidates. The reference's merge is a sequential
    reduce funnel (Reduce + kruskal at :56-58); Borůvka replaces it with
    O(log V) join rounds. Identical output to :func:`msf` (both compute
    the unique lexicographic-(w, src, dst) MSF), so they share one oracle.
    """
    cols = ["src", "dst"] + ([weight_col] if weight_col else [])
    e = g.edges.select(*cols).filter(F.col("src") != F.col("dst"))
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    canon = (
        e.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            w.alias("w"),
        )
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))
    )
    filtered = (
        canon.repartition(g.num_partitions, "u")
        .mapInPandas(_local_kruskal, schema="u long, v long, w double")
        .localCheckpoint(eager=True)
    )
    fg = Graph(
        filtered.select(
            F.col("u").alias("src"), F.col("v").alias("dst"), "w"
        ),
        directed=True,
        num_partitions=g.num_partitions,
        persist=False,
    )
    return msf(fg, "w")
