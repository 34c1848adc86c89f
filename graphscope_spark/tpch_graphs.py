"""Deterministic graphs derived from the driver's TPC-H-ish parquet tables,
plus DuckDB-oracle SQL generators for the iterative algorithms.

Two graphs, both derivable identically in Spark and ANSI SQL so the driver's
DuckDB comparison can value-hash every algorithm end-to-end:

* **co-purchase** (undirected): parts appearing in the same order, both with
  l_quantity >= QMIN. At sf0.01: 1662 vertices / 4736 directed edge rows /
  46 weakly connected components / 447 triangles — calibrated so WCC
  converges in 16 min-label rounds (the SQL oracle unrolls WCC_ROUNDS ≥ that
  with margin).
* **purchase** (directed, customer → supplier via orders+lineitem): supplier
  ids offset by +1_000_000 into the customer id space; suppliers have no
  out-edges, so this graph exercises PageRank's dangling-mass path.

The SQL oracles unroll the synchronous rounds as chained CTEs — the same
fixed-round semantics the reference's `max_round` apps use (SURVEY.md §2.2).
Float results are ROUND()ed to FLOAT_DECIMALS on both sides because Spark and
DuckDB sum partial aggregates in different orders (last-ulp differences).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graphscope_spark.graph import Graph

QMIN = 44
FLOAT_DECIMALS = 8
#: unrolled min-label rounds for the WCC oracle; sf0.01 converges in 16
WCC_ROUNDS = 24

# ---------------------------------------------------------------------- #
# Spark-side constructions
# ---------------------------------------------------------------------- #


def copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-directional (low partkey → high partkey) distinct co-purchase
    pairs — the `pairs` CTE below. As a directed graph this is a DAG
    orientation of the co-purchase graph (triangles survive as acyclic
    triangles), used by the directed-semantics gate queries."""
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_quantity") >= QMIN)
        .select("l_orderkey", "l_partkey")
    )
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
    )


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetrized distinct co-purchase part pairs — must stay expression-
    for-expression equal to COPURCHASE_CTE below."""
    pairs = copurchase_pairs(spark, sf_dir)
    return pairs.union(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


#: per-process memo of the derived test graphs. Each gate query runs in the
#: same JVM and used to rebuild + re-persist the same graph (and every
#: iterative round re-analyzed the lineitem self-join lineage). The memo
#: hands every query the SAME Graph whose edges are localCheckpoint-ed —
#: flat plans, one persist, paid once per gate run.
_GRAPH_MEMO: dict[tuple, Graph] = {}


def _memo_graph(kind: str, sf_dir: str, num_partitions, build) -> Graph:
    key = (kind, sf_dir, num_partitions)
    g = _GRAPH_MEMO.get(key)
    if g is None:
        g = build()
        _GRAPH_MEMO[key] = g
    return g


def copurchase_graph(spark: SparkSession, sf_dir: str,
                     num_partitions: int | None = None) -> Graph:
    return _memo_graph(
        "copurchase", sf_dir, num_partitions,
        lambda: Graph(
            copurchase_edges(spark, sf_dir).localCheckpoint(eager=True),
            directed=False, num_partitions=num_partitions,
            assume_symmetric=True,
        ),
    )


def copurchase_digraph(spark: SparkSession, sf_dir: str,
                       num_partitions: int | None = None) -> Graph:
    """Directed Graph over the DAG-oriented co-purchase pairs."""
    return _memo_graph(
        "copurchase_di", sf_dir, num_partitions,
        lambda: Graph(
            copurchase_pairs(spark, sf_dir).localCheckpoint(eager=True),
            directed=True, num_partitions=num_partitions,
        ),
    )


def supplier_chain_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small weighted test graph: per nation, suppliers ordered by suppkey
    form a path (consecutive, w=1) plus skip edges (distance 2, w=2).
    Every skip edge TIES with its 2-hop path (1+1 = 2), so weighted
    shortest paths genuinely split σ — the property weighted-Brandes
    oracles must exercise. Must stay expression-equal to
    SUPPLIER_CHAIN_CTE below."""
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_nationkey"
    )
    w = Window.partitionBy("s_nationkey").orderBy("s_suppkey")
    r = s.select(
        "s_suppkey", "s_nationkey", F.row_number().over(w).alias("rn")
    )
    a = r.alias("a")
    pairs = []
    for gap, wt in ((1, 1.0), (2, 2.0)):
        b = r.alias(f"b{gap}")
        pairs.append(
            a.join(
                b,
                (F.col("a.s_nationkey") == F.col(f"b{gap}.s_nationkey"))
                & (F.col(f"b{gap}.rn") == F.col("a.rn") + gap),
            ).select(
                F.col("a.s_suppkey").alias("src"),
                F.col(f"b{gap}.s_suppkey").alias("dst"),
                F.lit(wt).alias("w"),
            )
        )
    return pairs[0].unionByName(pairs[1])


def supplier_chain_graph(spark: SparkSession, sf_dir: str,
                         num_partitions: int | None = None) -> Graph:
    return _memo_graph(
        "supplier_chain", sf_dir, num_partitions,
        lambda: Graph(
            supplier_chain_edges(spark, sf_dir).localCheckpoint(eager=True),
            directed=False, num_partitions=num_partitions,
        ),
    )


def purchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed customer → (1_000_000 + supplier) edges; suppliers dangle."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.lit(1_000_000) + F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )


def purchase_graph(spark: SparkSession, sf_dir: str,
                   num_partitions: int | None = None) -> Graph:
    return _memo_graph(
        "purchase", sf_dir, num_partitions,
        lambda: Graph(
            purchase_edges(spark, sf_dir).localCheckpoint(eager=True),
            directed=True, num_partitions=num_partitions,
        ),
    )


# ---------------------------------------------------------------------- #
# DuckDB oracle SQL
# ---------------------------------------------------------------------- #

COPURCHASE_CTE = f"""
pairs AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
   AND a.l_quantity >= {QMIN} AND b.l_quantity >= {QMIN}
),
edges AS (SELECT u AS src, v AS dst FROM pairs UNION ALL SELECT v AS src, u AS dst FROM pairs),
verts AS (SELECT DISTINCT src AS id FROM edges)
"""

PURCHASE_CTE = """
edges AS (
  SELECT DISTINCT o_custkey AS src, 1000000 + l_suppkey AS dst
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
verts AS (SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges)
"""



def _materialized(sql: str) -> str:
    """Force every CTE to materialize. DuckDB 1.x inlines CTEs; with the
    unrolled-round chains below, inlining expands each round's references
    multiplicatively (3^rounds parquet scans → fd exhaustion). MATERIALIZED
    evaluates each round exactly once, like Spark's persisted state."""
    return re.sub(r"(\w+) AS \(", r"\1 AS MATERIALIZED (", sql)


def edges_sql() -> str:
    return _materialized(f"WITH {COPURCHASE_CTE} SELECT src, dst FROM edges")


def degrees_sql() -> str:
    _sql = f"""WITH {COPURCHASE_CTE}
SELECT v.id,
       COALESCE(o.c, 0) AS out_deg,
       COALESCE(i.c, 0) AS in_deg
FROM verts v
LEFT JOIN (SELECT src AS id, count(*) AS c FROM edges GROUP BY src) o ON v.id = o.id
LEFT JOIN (SELECT dst AS id, count(*) AS c FROM edges GROUP BY dst) i ON v.id = i.id"""
    return _materialized(_sql)


def pagerank_sql(rounds: int = 10, alpha: float = 0.85,
                 directed: bool = False) -> str:
    """Unrolled fixed-round PageRank with dangling-mass redistribution —
    the update rule of benchmarks/apps/pagerank/pagerank.h:82-199 expressed
    round-by-round as CTEs."""
    cte = PURCHASE_CTE if directed else COPURCHASE_CTE
    parts = [
        cte.rstrip(),
        ",\nnv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts)",
        ",\ndeg AS (SELECT src AS id, CAST(count(*) AS DOUBLE) AS outdeg"
        " FROM edges GROUP BY src)",
        ",\nr0 AS (SELECT id, 1.0 / (SELECT n FROM nv) AS r FROM verts)",
    ]
    for k in range(1, rounds + 1):
        p = f"r{k-1}"
        parts.append(
            f""",
dang{k} AS (
  SELECT COALESCE(SUM(p.r), 0.0) AS s
  FROM {p} p LEFT JOIN deg d ON p.id = d.id WHERE d.id IS NULL
),
r{k} AS (
  SELECT v.id,
         (1.0 - {alpha}) / (SELECT n FROM nv)
         + {alpha} * ((SELECT s FROM dang{k}) / (SELECT n FROM nv)
                      + COALESCE(m.s, 0.0)) AS r
  FROM verts v
  LEFT JOIN (
    SELECT e.dst AS id, SUM(p.r / d.outdeg) AS s
    FROM edges e JOIN {p} p ON e.src = p.id JOIN deg d ON p.id = d.id
    GROUP BY e.dst
  ) m ON v.id = m.id
)"""
        )
    parts.append(
        f"\nSELECT id, ROUND(r, {FLOAT_DECIMALS}) AS pr FROM r{rounds} ORDER BY id"
    )
    return _materialized("WITH " + "".join(parts))


def pagerank_tol_sql(max_rounds: int = 24, alpha: float = 0.85,
                     tol: float = 1e-6) -> str:
    """L1-tolerance PageRank (pagerank_networkx.h:147 semantics, the
    `pagerank_tol` gate query): unroll ``max_rounds`` fixed rounds, compute
    the per-round L1 delta, and emit the FIRST round whose delta drops
    below tol·N — exactly the state the Spark loop stops at. Safe to twin
    because the decision margins are wide (sf0.01: the last two deltas sit
    3.2% above and 17.5% below threshold — measured — vs ~1e-12 relative
    cross-engine float divergence); convergence is at round 19 < 24."""
    parts = [
        COPURCHASE_CTE.rstrip(),
        ",\nnv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts)",
        ",\ndeg AS (SELECT src AS id, CAST(count(*) AS DOUBLE) AS outdeg"
        " FROM edges GROUP BY src)",
        ",\nr0 AS (SELECT id, 1.0 / (SELECT n FROM nv) AS r FROM verts)",
    ]
    for k in range(1, max_rounds + 1):
        p = f"r{k-1}"
        parts.append(
            f""",
dang{k} AS (
  SELECT COALESCE(SUM(p.r), 0.0) AS s
  FROM {p} p LEFT JOIN deg d ON p.id = d.id WHERE d.id IS NULL
),
r{k} AS (
  SELECT v.id,
         (1.0 - {alpha}) / (SELECT n FROM nv)
         + {alpha} * ((SELECT s FROM dang{k}) / (SELECT n FROM nv)
                      + COALESCE(m.s, 0.0)) AS r
  FROM verts v
  LEFT JOIN (
    SELECT e.dst AS id, SUM(p.r / d.outdeg) AS s
    FROM edges e JOIN {p} p ON e.src = p.id JOIN deg d ON p.id = d.id
    GROUP BY e.dst
  ) m ON v.id = m.id
),
l{k} AS (
  SELECT {k} AS k, SUM(ABS(a.r - b.r)) AS l1
  FROM r{k} a JOIN {p} b ON a.id = b.id
)"""
        )
    ls = "\nUNION ALL ".join(f"SELECT k, l1 FROM l{k}" for k in range(1, max_rounds + 1))
    allr = "\nUNION ALL ".join(
        f"SELECT {k} AS k, id, r FROM r{k}" for k in range(1, max_rounds + 1)
    )
    parts.append(f""",
ls AS (
{ls}
),
mpick AS (
  SELECT COALESCE(MIN(k), {max_rounds}) AS m FROM ls
  WHERE l1 < {tol} * (SELECT n FROM nv)
),
allr AS (
{allr}
)
SELECT id, ROUND(r, {FLOAT_DECIMALS}) AS pr FROM allr
WHERE k = (SELECT m FROM mpick) ORDER BY id""")
    return _materialized("WITH " + "".join(parts))


def pagerank_push_sql(rounds: int = 10, alpha: float = 0.85,
                      directed: bool = False) -> str:
    """Unrolled synchronous forward-push PageRank (eps=0): rank_R is the
    R-term partial power series — the exact output of
    algorithms.pagerank.pagerank_push after ``rounds`` supersteps."""
    cte = PURCHASE_CTE if directed else COPURCHASE_CTE
    parts = [
        cte.rstrip(),
        ",\nnv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts)",
        ",\ndeg AS (SELECT src AS id, CAST(count(*) AS DOUBLE) AS outdeg"
        " FROM edges GROUP BY src)",
        ",\ns0 AS (SELECT id, 0.0 AS rank,"
        f" (1.0 - {alpha}) / (SELECT n FROM nv) AS res FROM verts)",
    ]
    for k in range(1, rounds + 1):
        p = f"s{k-1}"
        parts.append(
            f""",
dang{k} AS (
  SELECT COALESCE(SUM(p.res), 0.0) AS s
  FROM {p} p LEFT JOIN deg d ON p.id = d.id WHERE d.id IS NULL
),
s{k} AS (
  SELECT p.id, p.rank + p.res AS rank,
         {alpha} * (COALESCE(m.s, 0.0)
                    + (SELECT s FROM dang{k}) / (SELECT n FROM nv)) AS res
  FROM {p} p
  LEFT JOIN (
    SELECT e.dst AS id, SUM(q.res / d.outdeg) AS s
    FROM edges e JOIN {p} q ON e.src = q.id JOIN deg d ON q.id = d.id
    GROUP BY e.dst
  ) m ON p.id = m.id
)"""
        )
    parts.append(
        f"\nSELECT id, ROUND(rank, {FLOAT_DECIMALS}) AS pr "
        f"FROM s{rounds} ORDER BY id"
    )
    return _materialized("WITH " + "".join(parts))


def wcc_sql(rounds: int = WCC_ROUNDS) -> str:
    """Unrolled min-label propagation; ``rounds`` must exceed the label-
    propagation diameter of the sf0.01 co-purchase graph (16)."""
    parts = [COPURCHASE_CTE.rstrip(),
             ",\nl0 AS (SELECT id, id AS comp FROM verts)"]
    for k in range(1, rounds + 1):
        p = f"l{k-1}"
        parts.append(
            f""",
l{k} AS (
  SELECT l.id, LEAST(l.comp, COALESCE(m.c, l.comp)) AS comp
  FROM {p} l LEFT JOIN (
    SELECT e.dst AS id, MIN(p.comp) AS c
    FROM edges e JOIN {p} p ON e.src = p.id GROUP BY e.dst
  ) m ON l.id = m.id
)"""
        )
    parts.append(f"\nSELECT id, comp FROM l{rounds} ORDER BY id")
    return _materialized("WITH " + "".join(parts))


def cc_opt_sql(rounds: int = WCC_ROUNDS) -> str:
    """Closure oracle for the degree-keyed CC variants (cc-opt.h /
    cc-pull.h): component membership via the same unrolled min-label
    closure as wcc_sql, then cid(v) = MAX over v's component of
    deg(u)·n + u — the fixed point of the reference's max-label
    propagation over ``cid = Deg(id)·n + id`` initial labels
    (cc-opt.h:48-50)."""
    parts = [COPURCHASE_CTE.rstrip(),
             """,
deg AS (SELECT src AS id, COUNT(*) AS d FROM edges GROUP BY src),
nv AS (SELECT COUNT(*) AS n FROM verts)""",
             ",\nl0 AS (SELECT id, id AS comp FROM verts)"]
    for k in range(1, rounds + 1):
        p = f"l{k-1}"
        parts.append(
            f""",
l{k} AS (
  SELECT l.id, LEAST(l.comp, COALESCE(m.c, l.comp)) AS comp
  FROM {p} l LEFT JOIN (
    SELECT e.dst AS id, MIN(p.comp) AS c
    FROM edges e JOIN {p} p ON e.src = p.id GROUP BY e.dst
  ) m ON l.id = m.id
)"""
        )
    parts.append(f""",
cid0 AS (
  SELECT l.id, l.comp, dg.d * nv.n + l.id AS cid
  FROM l{rounds} l JOIN deg dg ON l.id = dg.id CROSS JOIN nv
),
cmax AS (SELECT comp, MAX(cid) AS cid FROM cid0 GROUP BY comp)
SELECT c.id, m.cid AS cid FROM cid0 c JOIN cmax m ON c.comp = m.comp
ORDER BY c.id""")
    return _materialized("WITH " + "".join(parts))


def _cdlp_ctes(rounds: int) -> list[str]:
    """Unrolled LDBC CDLP round CTEs (most frequent neighbor label,
    ties → min) ending at l{rounds} — shared by cdlp_sql and
    modularity_sql."""
    parts = [COPURCHASE_CTE.rstrip(),
             ",\nl0 AS (SELECT id, id AS label FROM verts)"]
    for k in range(1, rounds + 1):
        p = f"l{k-1}"
        parts.append(
            f""",
cnt{k} AS (
  SELECT e.dst AS id, p.label, count(*) AS c
  FROM edges e JOIN {p} p ON e.src = p.id
  GROUP BY e.dst, p.label
),
top{k} AS (
  SELECT id, label FROM (
    SELECT id, label,
           ROW_NUMBER() OVER (PARTITION BY id ORDER BY c DESC, label ASC) AS rn
    FROM cnt{k}
  ) t WHERE rn = 1
),
l{k} AS (
  SELECT l.id, COALESCE(t.label, l.label) AS label
  FROM {p} l LEFT JOIN top{k} t ON l.id = t.id
)"""
        )
    return parts


def cdlp_sql(rounds: int = 10) -> str:
    """Unrolled LDBC CDLP on the (symmetrized) co-purchase graph: most
    frequent neighbor label, ties → min, exactly ``rounds`` rounds."""
    parts = _cdlp_ctes(rounds)
    parts.append(f"\nSELECT id, label FROM l{rounds} ORDER BY id")
    return _materialized("WITH " + "".join(parts))


TRIANGLES_BODY = """
deg AS (SELECT src AS id, count(*) AS d FROM edges GROUP BY src),
oe AS (
  SELECT e.src AS u, e.dst AS v
  FROM edges e JOIN deg d1 ON e.src = d1.id JOIN deg d2 ON e.dst = d2.id
  WHERE d1.d < d2.d OR (d1.d = d2.d AND e.src < e.dst)
),
tri AS (
  SELECT w.a, w.b, w.c
  FROM (SELECT a.u AS a, a.v AS b, b.v AS c FROM oe a JOIN oe b ON a.v = b.u) w
  JOIN oe x ON x.u = w.a AND x.v = w.c
)"""


def triangles_sql() -> str:
    _sql = f"""WITH {COPURCHASE_CTE}, {TRIANGLES_BODY}
SELECT v.id, COALESCE(t.c, 0) AS tri
FROM verts v LEFT JOIN (
  SELECT id, count(*) AS c FROM (
    SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
  ) corners GROUP BY id
) t ON v.id = t.id ORDER BY v.id"""
    return _materialized(_sql)


def triangle_count_sql() -> str:
    return _materialized(
        f"WITH {COPURCHASE_CTE}, {TRIANGLES_BODY} SELECT count(*) AS n_tri FROM tri"
    )


# ---------------------------------------------------------------------- #
# breadth-algorithm oracles (SSSP/BFS, centralities, clustering, cores,
# assortativity, path expand) — all on the co-purchase graph
# ---------------------------------------------------------------------- #

#: unrolled rounds for distance relaxations (≥ weighted diameter at sf0.01)
SSSP_ROUNDS = 40
#: unrolled peel rounds for the k-core oracle
KCORE_ROUNDS = 16

SOURCE_CTE = ",\nsrc AS (SELECT MIN(id) AS sid FROM verts)"

#: deterministic edge weight derivable on both sides
W_EXPR = "CAST((src + dst) % 10 + 1 AS DOUBLE)"


def bfs_sql(rounds: int = WCC_ROUNDS) -> str:
    """Unrolled BFS level relaxation from the min vertex id."""
    parts = [COPURCHASE_CTE.rstrip(), SOURCE_CTE,
             ",\nd0 AS (SELECT id, CASE WHEN id = (SELECT sid FROM src)"
             " THEN 0.0 END AS dist FROM verts)"]
    for k in range(1, rounds + 1):
        p = f"d{k-1}"
        parts.append(f""",
d{k} AS (
  SELECT v.id, LEAST(COALESCE(v.dist, 1e18), COALESCE(m.c, 1e18)) AS d2,
         CASE WHEN LEAST(COALESCE(v.dist, 1e18), COALESCE(m.c, 1e18)) < 1e18
              THEN LEAST(COALESCE(v.dist, 1e18), COALESCE(m.c, 1e18)) END AS dist
  FROM {p} v LEFT JOIN (
    SELECT e.dst AS id, MIN(p.dist + 1.0) AS c
    FROM edges e JOIN {p} p ON e.src = p.id AND p.dist IS NOT NULL
    GROUP BY e.dst
  ) m ON v.id = m.id
)""")
    parts.append(f"\nSELECT id, dist FROM d{rounds} ORDER BY id")
    return _materialized("WITH " + "".join(parts))


def sssp_path_sql(rounds: int = WCC_ROUNDS) -> str:
    """Unrolled unit-weight BFS dist + min-parent derivation.

    With unit weights every vertex's dist settles in the round equal to its
    hop count, so the engine's min-(dist, parent) struct tie-break reduces
    to parent(v) = MIN{u : edge(u,v) AND dist(u) = dist(v) - 1} — exactly
    expressible once the dist fixpoint is unrolled (algorithms/sssp.py
    sssp_path; the reference excludes sssp_path from byte-exact goldens for
    the diamond-tie reason, app_tests.sh:349-356 — the min-id pin makes it
    deterministic on both sides)."""
    parts = [COPURCHASE_CTE.rstrip(), SOURCE_CTE,
             ",\nd0 AS (SELECT id, CASE WHEN id = (SELECT sid FROM src)"
             " THEN 0.0 END AS dist FROM verts)"]
    for k in range(1, rounds + 1):
        p = f"d{k-1}"
        parts.append(f""",
d{k} AS (
  SELECT v.id,
         CASE WHEN LEAST(COALESCE(v.dist, 1e18), COALESCE(m.c, 1e18)) < 1e18
              THEN LEAST(COALESCE(v.dist, 1e18), COALESCE(m.c, 1e18)) END AS dist
  FROM {p} v LEFT JOIN (
    SELECT e.dst AS id, MIN(p.dist + 1.0) AS c
    FROM edges e JOIN {p} p ON e.src = p.id AND p.dist IS NOT NULL
    GROUP BY e.dst
  ) m ON v.id = m.id
)""")
    parts.append(f""",
par AS (
  SELECT d.id, MIN(e.src) AS parent
  FROM d{rounds} d
  JOIN edges e ON e.dst = d.id
  JOIN d{rounds} u ON u.id = e.src AND u.dist = d.dist - 1.0
  WHERE d.dist IS NOT NULL AND d.dist > 0
  GROUP BY d.id
)
SELECT d.id, d.dist, p.parent
FROM d{rounds} d LEFT JOIN par p ON d.id = p.id ORDER BY d.id""")
    return _materialized("WITH " + "".join(parts))


def sssp_sql(rounds: int = SSSP_ROUNDS) -> str:
    """Unrolled Bellman-Ford with the deterministic (src+dst)%10+1 weight."""
    parts = [COPURCHASE_CTE.rstrip(), SOURCE_CTE,
             f",\nwe AS (SELECT src, dst, {W_EXPR} AS w FROM edges)",
             ",\nd0 AS (SELECT id, CASE WHEN id = (SELECT sid FROM src)"
             " THEN 0.0 END AS dist FROM verts)"]
    for k in range(1, rounds + 1):
        p = f"d{k-1}"
        parts.append(f""",
d{k} AS (
  SELECT v.id,
         CASE WHEN LEAST(COALESCE(v.dist, 1e18), COALESCE(m.c, 1e18)) < 1e18
              THEN LEAST(COALESCE(v.dist, 1e18), COALESCE(m.c, 1e18)) END AS dist
  FROM {p} v LEFT JOIN (
    SELECT e.dst AS id, MIN(p.dist + e.w) AS c
    FROM we e JOIN {p} p ON e.src = p.id AND p.dist IS NOT NULL
    GROUP BY e.dst
  ) m ON v.id = m.id
)""")
    parts.append(f"\nSELECT id, dist FROM d{rounds} ORDER BY id")
    return _materialized("WITH " + "".join(parts))


def degree_centrality_sql() -> str:
    _sql = f"""WITH {COPURCHASE_CTE},
n AS (SELECT CAST(count(*) AS DOUBLE) AS c FROM verts),
od AS (SELECT src AS id, count(*) AS d FROM edges GROUP BY src),
idg AS (SELECT dst AS id, count(*) AS d FROM edges GROUP BY dst)
SELECT v.id,
       ROUND((COALESCE(od.d,0) + COALESCE(idg.d,0)) / ((SELECT c FROM n) - 1),
             {FLOAT_DECIMALS}) AS dc
FROM verts v LEFT JOIN od ON v.id = od.id LEFT JOIN idg ON v.id = idg.id"""
    return _materialized(_sql)


def clustering_sql() -> str:
    """Per-vertex clustering coefficient from the triangles CTE."""
    _sql = f"""WITH {COPURCHASE_CTE}, {TRIANGLES_BODY},
pertri AS (
  SELECT id, count(*) AS c FROM (
    SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
  ) corners GROUP BY id
)
SELECT v.id,
       CASE WHEN COALESCE(d.d, 0) >= 2
            THEN ROUND(2.0 * COALESCE(t.c, 0) / (d.d * (d.d - 1)), {FLOAT_DECIMALS})
            ELSE 0.0 END AS cc
FROM verts v LEFT JOIN deg d ON v.id = d.id LEFT JOIN pertri t ON v.id = t.id"""
    return _materialized(_sql)


def lcc_directed_sql() -> str:
    """LDBC directed LCC on the DAG-oriented co-purchase pairs: N(v) =
    in∪out neighbors, numerator = ordered neighbor pairs (u, w) with a
    directed edge u→w."""
    return _materialized(f"""
WITH {COPURCHASE_CTE},
de AS (SELECT u AS src, v AS dst FROM pairs),
deg AS (SELECT src AS id, COUNT(*) AS d FROM edges GROUP BY src),
num AS (
  SELECT a.src AS id, COUNT(*) AS num
  FROM de e
  JOIN edges a ON a.dst = e.src
  JOIN edges b ON b.src = a.src AND b.dst = e.dst
  GROUP BY a.src
)
SELECT vt.id,
       ROUND(CASE WHEN COALESCE(dg.d, 0) >= 2
             THEN COALESCE(n.num, 0) * 1.0 / (dg.d * (dg.d - 1))
             ELSE 0.0 END, {FLOAT_DECIMALS}) AS lcc
FROM verts vt
LEFT JOIN deg dg ON vt.id = dg.id
LEFT JOIN num n ON vt.id = n.id
ORDER BY vt.id""")


def transitivity_sql() -> str:
    _sql = f"""WITH {COPURCHASE_CTE}, {TRIANGLES_BODY}
SELECT ROUND(
  CAST(3 * (SELECT count(*) FROM tri) AS DOUBLE)
  / (SELECT SUM(d * (d - 1) / 2.0) FROM deg), {FLOAT_DECIMALS}) AS transitivity"""
    return _materialized(_sql)


def avg_clustering_sql() -> str:
    _sql = f"""WITH {COPURCHASE_CTE}, {TRIANGLES_BODY},
pertri AS (
  SELECT id, count(*) AS c FROM (
    SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
  ) corners GROUP BY id
),
cc AS (
  SELECT v.id,
         CASE WHEN COALESCE(d.d, 0) >= 2
              THEN 2.0 * COALESCE(t.c, 0) / (d.d * (d.d - 1))
              ELSE 0.0 END AS cc
  FROM verts v LEFT JOIN deg d ON v.id = d.id LEFT JOIN pertri t ON v.id = t.id
)
SELECT ROUND(AVG(cc), {FLOAT_DECIMALS}) AS avg_cc FROM cc"""
    return _materialized(_sql)


def kcore_sql(k: int = 2, rounds: int = KCORE_ROUNDS) -> str:
    """Unrolled peel: alive_{i+1} = vertices with ≥k alive neighbors."""
    parts = [COPURCHASE_CTE.rstrip(),
             ",\na0 AS (SELECT id FROM verts)"]
    for i in range(1, rounds + 1):
        p = f"a{i-1}"
        parts.append(f""",
a{i} AS (
  SELECT e.src AS id FROM edges e
  JOIN {p} s ON e.src = s.id JOIN {p} d ON e.dst = d.id
  GROUP BY e.src HAVING count(*) >= {k}
)""")
    parts.append(f"\nSELECT id FROM a{rounds} ORDER BY id")
    return _materialized("WITH " + "".join(parts))


def kshell_sql(kmax: int = 6, rounds: int = 20) -> str:
    """Shell index (core number) twin for algorithms.cores.kshell: for each
    k = 1..kmax run the k-peel to fixpoint (peeling is idempotent, so a
    generous fixed unroll IS the fixpoint — same argument as kcore_sql),
    seeding each level from the previous core since (k+1)-core ⊆ k-core;
    shell(v) = the largest k whose core retains v (0 if none). kmax/rounds
    are sized to the sf0.01 gate graph (max core 5, deepest wavefront 16 —
    measured) with margin; an insufficient kmax would show up as a hash
    mismatch, not silently."""
    parts = [COPURCHASE_CTE.rstrip(),
             ",\nc1_0 AS (SELECT id FROM verts)"]
    for k in range(1, kmax + 1):
        if k > 1:
            parts.append(f",\nc{k}_0 AS (SELECT id FROM c{k-1}_{rounds})")
        for i in range(1, rounds + 1):
            p = f"c{k}_{i-1}"
            parts.append(f""",
c{k}_{i} AS (
  SELECT e.src AS id FROM edges e
  JOIN {p} s ON e.src = s.id JOIN {p} d ON e.dst = d.id
  GROUP BY e.src HAVING count(*) >= {k}
)""")
    shells = "\nUNION ALL ".join(
        f"SELECT id, {k} AS k FROM c{k}_{rounds}" for k in range(1, kmax + 1)
    )
    parts.append(f""",
shells AS (
{shells}
)
SELECT v.id, COALESCE(MAX(s.k), 0) AS shell
FROM verts v LEFT JOIN shells s ON v.id = s.id
GROUP BY v.id ORDER BY v.id""")
    return _materialized("WITH " + "".join(parts))


def assortativity_sql() -> str:
    _sql = f"""WITH {COPURCHASE_CTE},
od AS (SELECT src AS id, count(*) AS d FROM edges GROUP BY src),
idg AS (SELECT dst AS id, count(*) AS d FROM edges GROUP BY dst)
SELECT ROUND(corr(CAST(sx.d AS DOUBLE), CAST(dy.d AS DOUBLE)),
             {FLOAT_DECIMALS}) AS assortativity
FROM edges e JOIN od sx ON e.src = sx.id JOIN idg dy ON e.dst = dy.id"""
    return _materialized(_sql)


def avg_degree_connectivity_sql() -> str:
    _sql = f"""WITH {COPURCHASE_CTE},
od AS (SELECT src AS id, count(*) AS d FROM edges GROUP BY src),
idg AS (SELECT dst AS id, count(*) AS d FROM edges GROUP BY dst)
SELECT sx.d AS deg, ROUND(AVG(CAST(dy.d AS DOUBLE)), {FLOAT_DECIMALS}) AS avg_nbr_deg
FROM edges e JOIN od sx ON e.src = sx.id JOIN idg dy ON e.dst = dy.id
GROUP BY sx.d"""
    return _materialized(_sql)


def eigenvector_sql(rounds: int = 5) -> str:
    """Fixed-round power iteration with per-round L2 normalization —
    mirrors algorithms/centrality.py::_power_iteration (tol=None)."""
    parts = [COPURCHASE_CTE.rstrip(),
             ",\nnv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts)",
             ",\nx0 AS (SELECT id, 1.0 / (SELECT n FROM nv) AS x FROM verts)"]
    for r in range(1, rounds + 1):
        p = f"x{r-1}"
        parts.append(f""",
raw{r} AS (
  SELECT v.id, COALESCE(m.s, 0.0) AS x
  FROM verts v LEFT JOIN (
    SELECT e.dst AS id, SUM(p.x) AS s
    FROM edges e JOIN {p} p ON e.src = p.id GROUP BY e.dst
  ) m ON v.id = m.id
),
nrm{r} AS (SELECT SQRT(SUM(x * x)) AS t FROM raw{r}),
x{r} AS (SELECT id, x / (SELECT CASE WHEN t = 0 THEN 1.0 ELSE t END FROM nrm{r}) AS x
         FROM raw{r})""")
    parts.append(
        f"\nSELECT id, ROUND(x, {FLOAT_DECIMALS}) AS x FROM x{rounds} ORDER BY id"
    )
    return _materialized("WITH " + "".join(parts))


def katz_sql(rounds: int = 5, alpha: float = 0.1, beta: float = 1.0) -> str:
    """Un-normalized Katz recurrence, single final L2 normalization —
    mirrors algorithms/centrality.py::katz_centrality."""
    parts = [COPURCHASE_CTE.rstrip(),
             ",\nx0 AS (SELECT id, 0.0 AS x FROM verts)"]
    for r in range(1, rounds + 1):
        p = f"x{r-1}"
        parts.append(f""",
x{r} AS (
  SELECT v.id, {alpha} * COALESCE(m.s, 0.0) + {beta} AS x
  FROM verts v LEFT JOIN (
    SELECT e.dst AS id, SUM(p.x) AS s
    FROM edges e JOIN {p} p ON e.src = p.id GROUP BY e.dst
  ) m ON v.id = m.id
)""")
    parts.append(f""",
fin AS (SELECT SQRT(SUM(x * x)) AS t FROM x{rounds})
SELECT id, ROUND(x / (SELECT CASE WHEN t = 0 THEN 1.0 ELSE t END FROM fin),
                 {FLOAT_DECIMALS}) AS x
FROM x{rounds} ORDER BY id""")
    return _materialized("WITH " + "".join(parts))


def hits_sql(rounds: int = 3) -> str:
    """Fixed-round HITS, sum-normalized each half-step — mirrors
    algorithms/centrality.py::hits."""
    parts = [COPURCHASE_CTE.rstrip(),
             ",\nnv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts)",
             ",\nh0 AS (SELECT id, 1.0 / (SELECT n FROM nv) AS hub FROM verts)"]
    for r in range(1, rounds + 1):
        hp = f"h{r-1}"
        parts.append(f""",
ar{r} AS (
  SELECT v.id, COALESCE(m.s, 0.0) AS a
  FROM verts v LEFT JOIN (
    SELECT e.dst AS id, SUM(p.hub) AS s
    FROM edges e JOIN {hp} p ON e.src = p.id GROUP BY e.dst
  ) m ON v.id = m.id
),
asum{r} AS (SELECT SUM(a) AS t FROM ar{r}),
a{r} AS (SELECT id, a / (SELECT CASE WHEN t = 0 THEN 1.0 ELSE t END FROM asum{r}) AS auth
         FROM ar{r}),
hr{r} AS (
  SELECT v.id, COALESCE(m.s, 0.0) AS h
  FROM verts v LEFT JOIN (
    SELECT e.src AS id, SUM(p.auth) AS s
    FROM edges e JOIN a{r} p ON e.dst = p.id GROUP BY e.src
  ) m ON v.id = m.id
),
hsum{r} AS (SELECT SUM(h) AS t FROM hr{r}),
h{r} AS (SELECT id, h / (SELECT CASE WHEN t = 0 THEN 1.0 ELSE t END FROM hsum{r}) AS hub
         FROM hr{r})""")
    parts.append(f"""
SELECT h.id, ROUND(h.hub, {FLOAT_DECIMALS}) AS hub,
       ROUND(a.auth, {FLOAT_DECIMALS}) AS auth
FROM h{rounds} h JOIN a{rounds} a ON h.id = a.id ORDER BY h.id""")
    return _materialized("WITH " + "".join(parts))


def path_expand_sql(mod: int = 50) -> str:
    """1..2-hop ARBITRARY paths from starts (id % mod == 0) — one row per
    path, matching operators/traversal.py::path_expand(end_v)."""
    _sql = f"""WITH {COPURCHASE_CTE},
starts AS (SELECT id FROM verts WHERE id % {mod} = 0),
h1 AS (
  SELECT s.id AS start, e.dst AS v, 1 AS hops
  FROM starts s JOIN edges e ON e.src = s.id
),
h2 AS (
  SELECT h1.start, e.dst AS v, 2 AS hops
  FROM h1 JOIN edges e ON e.src = h1.v
)
SELECT start, v, hops FROM h1 UNION ALL SELECT start, v, hops FROM h2"""
    return _materialized(_sql)


def path_expand_trail_sql(mod: int = 400) -> str:
    """1..2-hop TRAIL paths (no repeated STORED edge — Cypher relationship
    uniqueness) from starts (id % mod == 0) over the directed purchase
    graph traversed ``both`` ways — matches
    operators/traversal.py::path_expand(path_opt='trail',
    direction='both'): edge identity is the stored edge's original
    (src, dst) stamped before reversal, so the hop-2 bounce-back u→v→u
    via the same stored edge is excluded (the only arbitrary-vs-trail
    difference at 2 hops) while reciprocal stored edges remain two
    distinct trail edges."""
    _sql = f"""WITH {PURCHASE_CTE},
e2 AS (
  SELECT e.src, e.dst, e.src AS os, e.dst AS od FROM edges e
  UNION ALL
  SELECT e.dst AS src, e.src AS dst, e.src AS os, e.dst AS od FROM edges e
),
starts AS (SELECT id FROM verts WHERE id % {mod} = 0),
h1 AS (
  SELECT s.id AS start, e.os AS os1, e.od AS od1, e.dst AS v
  FROM starts s JOIN e2 e ON e.src = s.id
),
h2 AS (
  SELECT h1.start, e.dst AS v
  FROM h1 JOIN e2 e ON e.src = h1.v
  WHERE NOT (e.os = h1.os1 AND e.od = h1.od1)
)
SELECT start, v, 1 AS hops FROM h1
UNION ALL SELECT start, v, 2 AS hops FROM h2"""
    return _materialized(_sql)


# ---------------------------------------------------------------------- #
# multi-source BFS oracles: closeness / APSP (algorithms/paths.py)
# ---------------------------------------------------------------------- #


def _msbfs_cte(rounds: int, source_filter: str) -> str:
    """Unrolled multi-source BFS: state (src, id, dist) relaxed ``rounds``
    times — the SQL twin of algorithms/paths.py::multi_source_bfs."""
    parts = [f",\nd0 AS (SELECT id AS src, id, 0 AS dist FROM verts {source_filter})"]
    for k in range(1, rounds + 1):
        p = f"d{k-1}"
        parts.append(f""",
d{k} AS (
  SELECT src, id, MIN(dist) AS dist FROM (
    SELECT src, id, dist FROM {p}
    UNION ALL
    SELECT p.src, e.dst AS id, p.dist + 1 AS dist
    FROM edges e JOIN {p} p ON e.src = p.id
  ) u GROUP BY src, id
)""")
    return "".join(parts)


def closeness_sql(mod: int = 20, rounds: int = WCC_ROUNDS) -> str:
    """wf_improved closeness from sampled sources (id % mod == 0):
    C(v) = (r/Σd) · (r/(n−1)) over incoming pair distances."""
    _sql = f"""WITH {COPURCHASE_CTE}{_msbfs_cte(rounds, f"WHERE id % {mod} = 0")},
nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
agg AS (
  SELECT id, count(*) AS r, SUM(dist) AS total
  FROM d{rounds} WHERE dist > 0 GROUP BY id
)
SELECT v.id,
       ROUND(COALESCE((a.r / CAST(a.total AS DOUBLE))
             * (a.r / ((SELECT n FROM nv) - 1)), 0.0), {FLOAT_DECIMALS}) AS closeness
FROM verts v LEFT JOIN agg a ON v.id = a.id"""
    return _materialized(_sql)


def harmonic_sql(mod: int = 20, rounds: int = WCC_ROUNDS) -> str:
    """Harmonic centrality from sampled sources (id % mod == 0):
    H(v) = Σ_s 1/d(s, v) — the SQL twin of
    algorithms/paths.py::harmonic_centrality (flash/centrality/harmonic.h)."""
    _sql = f"""WITH {COPURCHASE_CTE}{_msbfs_cte(rounds, f"WHERE id % {mod} = 0")},
agg AS (
  SELECT id, SUM(1.0 / dist) AS h
  FROM d{rounds} WHERE dist > 0 GROUP BY id
)
SELECT v.id,
       ROUND(COALESCE(a.h, 0.0), {FLOAT_DECIMALS}) AS harmonic
FROM verts v LEFT JOIN agg a ON v.id = a.id"""
    return _materialized(_sql)


def betweenness_sql(mod: int = 20, rounds: int = WCC_ROUNDS,
                    endpoints: bool = False) -> str:
    """Brandes betweenness from sampled sources (id % mod == 0) — the SQL
    twin of algorithms/paths.py::betweenness_centrality. Fully unrolled:
    (1) multi-source BFS distances, (2) per-level forward σ accumulation
    (σ_lev(v) = Σ σ over predecessor pairs one level up the BFS DAG),
    (3) per-level backward dependency δ_lev(v) = σ_v·Σ_{v→w} (1+δ_w)/σ_w,
    from the deepest level in. ``rounds`` (24) bounds the BFS depth — the
    sf0.01 graph's sampled eccentricity is 19 (measured); levels past the
    true depth are empty CTEs. Scaling mirrors the Spark side exactly:
    source-sampling extrapolation n/|S|, ×0.5 undirected, normalized by
    (n−1)(n−2)/2."""
    filt = f"WHERE id % {mod} = 0"
    parts = [COPURCHASE_CTE.rstrip(), _msbfs_cte(rounds, filt), f""",
nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
ns AS (SELECT CAST(count(*) AS DOUBLE) AS c FROM verts {filt}),
sg0 AS (SELECT src, id, CAST(1 AS DOUBLE) AS sigma
        FROM d{rounds} WHERE dist = 0)"""]
    for lev in range(1, rounds + 1):
        parts.append(f""",
sg{lev} AS (
  SELECT p.src, d.id, SUM(p.sigma) AS sigma
  FROM sg{lev-1} p
  JOIN edges e ON e.src = p.id
  JOIN d{rounds} d ON d.src = p.src AND d.id = e.dst AND d.dist = {lev}
  GROUP BY p.src, d.id
)""")
    parts.append(f""",
dl{rounds} AS (SELECT src, id, sigma, 0.0 AS delta FROM sg{rounds})""")
    for lev in range(rounds - 1, 0, -1):
        parts.append(f""",
dl{lev} AS (
  SELECT v.src, v.id, v.sigma,
         v.sigma * COALESCE(c.part, 0.0) AS delta
  FROM sg{lev} v
  LEFT JOIN (
    SELECT w.src, e.src AS id, SUM((1.0 + w.delta) / w.sigma) AS part
    FROM dl{lev+1} w JOIN edges e ON e.dst = w.id
    GROUP BY w.src, e.src
  ) c ON c.src = v.src AND c.id = v.id
)""")
    alldel = "\nUNION ALL ".join(
        f"SELECT src, id, delta FROM dl{lev}" for lev in range(1, rounds + 1)
    )
    ep = "+ 1.0" if endpoints else ""
    src_side = """
  UNION ALL
  SELECT src AS id, CAST(COUNT(*) AS DOUBLE) AS d2 FROM ap GROUP BY src
""" if endpoints else ""
    denom = ("(SELECT n FROM nv) * ((SELECT n FROM nv) - 1) / 2.0"
             if endpoints else
             "((SELECT n FROM nv) - 1) * ((SELECT n FROM nv) - 2) / 2.0")
    parts.append(f""",
ap AS (
{alldel}
),
bc AS (
  SELECT id, SUM(d2) AS b FROM (
  SELECT id, delta {ep} AS d2 FROM ap{src_side}
  ) u GROUP BY id
)
SELECT v.id,
       ROUND(COALESCE(bc.b, 0.0)
             * ((((SELECT n FROM nv) / (SELECT c FROM ns)) * 0.5)
                / ({denom})),
             {FLOAT_DECIMALS}) AS betweenness
FROM verts v LEFT JOIN bc ON v.id = bc.id ORDER BY v.id""")
    return _materialized("WITH " + "".join(parts))


def apsp_sql(rounds: int = WCC_ROUNDS, mod: int | None = None) -> str:
    """(src, id, dist) for every reached pair; ``mod`` samples sources
    (id % mod == 0) to bound gate runtime."""
    filt = f"WHERE id % {mod} = 0" if mod else ""
    _sql = f"""WITH {COPURCHASE_CTE}{_msbfs_cte(rounds, filt)}
SELECT src, id, dist FROM d{rounds}"""
    return _materialized(_sql)


# ---------------------------------------------------------------------- #
# round-2 graphs + oracles: partseq (SCC), bipartite (lpa_u2i), and the
# ranking/path/assortativity oracle generators
# ---------------------------------------------------------------------- #

#: quantity floor for the part-sequence graph (sparser than QMIN so SCCs
#: stay non-trivial but the closure oracle stays cheap)
PSEQ_QMIN = 40

PARTSEQ_CTE = f"""
seq AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst,
         a.l_linenumber AS ln
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND b.l_linenumber = a.l_linenumber + 1
  WHERE a.l_partkey <> b.l_partkey
    AND a.l_quantity >= {PSEQ_QMIN} AND b.l_quantity >= {PSEQ_QMIN}
),
edges AS (SELECT src, dst FROM seq
          UNION
          SELECT dst AS src, src AS dst FROM seq WHERE ln % 3 = 0),
verts AS (SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges)
"""

BIPART_CTE = """
edges AS (
  SELECT DISTINCT o_custkey AS u, l_partkey AS i
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  WHERE l_quantity >= 47
),
users AS (SELECT DISTINCT u AS id FROM edges)
"""


def partseq_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed part-sequence graph: consecutive high-quantity line items
    within an order, plus reversed edges for every third line number —
    expression-for-expression the PARTSEQ_CTE (cycles → non-trivial SCCs)."""
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_quantity") >= PSEQ_QMIN)
        .select("l_orderkey", "l_linenumber", "l_partkey")
    )
    a, b = li.alias("a"), li.alias("b")
    seq = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("b.l_linenumber") == F.col("a.l_linenumber") + 1),
        )
        .filter(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
            F.col("a.l_linenumber").alias("ln"),
        )
        .distinct()
    )
    return (
        seq.select("src", "dst")
        .union(seq.filter(F.col("ln") % 3 == 0)
               .select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )


def partseq_graph(spark: SparkSession, sf_dir: str,
                  num_partitions: int | None = None) -> Graph:
    return _memo_graph(
        "partseq", sf_dir, num_partitions,
        lambda: Graph(
            partseq_edges(spark, sf_dir).localCheckpoint(eager=True),
            directed=True, num_partitions=num_partitions,
        ),
    )


def bipartite_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer → part purchase edges (u, i) — the lpa_u2i input shape."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey")
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_quantity") >= 47)
        .select("l_orderkey", "l_partkey")
    )
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("u"), F.col("l_partkey").alias("i"))
        .distinct()
    )


def scc_sql() -> str:
    """SCC oracle: comp(v) = min u with u→*v and v→*u, via a recursive
    reachability closure (tractable because the partseq graph is small and
    sparse at the gate's sf)."""
    return f"""
WITH RECURSIVE {PARTSEQ_CTE.strip()},
reach(a, b) AS (
  SELECT id, id FROM verts
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b
),
comp AS (
  SELECT v.id, MIN(r1.a) AS comp
  FROM verts v
  JOIN reach r1 ON r1.b = v.id
  JOIN reach r2 ON r2.a = v.id AND r2.b = r1.a
  GROUP BY v.id
)
SELECT id, comp FROM comp ORDER BY id"""


def ppr_sql(rounds: int = 10) -> str:
    """Unrolled flash PPR (ppr.h:48-70): damping 0.5, teleport only to the
    min-id source, undirected adjacency, init r = [v = source]."""
    parts = [COPURCHASE_CTE.rstrip(), SOURCE_CTE,
             ",\ndeg AS (SELECT src AS id, CAST(count(*) AS DOUBLE) AS d"
             " FROM edges GROUP BY src)",
             ",\nr0 AS (SELECT id, CASE WHEN id = (SELECT sid FROM src)"
             " THEN 1.0 ELSE 0.0 END AS r FROM verts)"]
    for k in range(1, rounds + 1):
        p = f"r{k-1}"
        parts.append(f""",
r{k} AS (
  SELECT v.id,
         COALESCE(m.s, 0.0)
         + CASE WHEN v.id = (SELECT sid FROM src) THEN 0.5 ELSE 0.0 END AS r
  FROM verts v LEFT JOIN (
    SELECT e.dst AS id, SUM(0.5 * p.r / d.d) AS s
    FROM edges e JOIN {p} p ON e.src = p.id JOIN deg d ON p.id = d.id
    GROUP BY e.dst
  ) m ON v.id = m.id
)""")
    parts.append(
        f"\nSELECT id, ROUND(r, {FLOAT_DECIMALS}) AS r FROM r{rounds} ORDER BY id"
    )
    return _materialized("WITH " + "".join(parts))


def articlerank_sql(rounds: int = 10, damping: float = 0.85) -> str:
    """Unrolled flash ArticleRank (articlerank.h:61-71) on the directed
    purchase graph: r ← (1−d) + d·Σ r(u)/(outdeg(u)+avg), init 0."""
    parts = [PURCHASE_CTE.rstrip(),
             ",\nnv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts)",
             ",\nne AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM edges)",
             ",\navgd AS (SELECT m / (SELECT n FROM nv) AS a FROM ne)",
             ",\ndeg AS (SELECT src AS id, CAST(count(*) AS DOUBLE) AS d"
             " FROM edges GROUP BY src)",
             ",\nr0 AS (SELECT id, 0.0 AS r FROM verts)"]
    for k in range(1, rounds + 1):
        p = f"r{k-1}"
        parts.append(f""",
r{k} AS (
  SELECT v.id, {1.0 - damping} + COALESCE(m.s, 0.0) AS r
  FROM verts v LEFT JOIN (
    SELECT e.dst AS id,
           SUM({damping} * p.r / (d.d + (SELECT a FROM avgd))) AS s
    FROM edges e JOIN {p} p ON e.src = p.id JOIN deg d ON p.id = d.id
    GROUP BY e.dst
  ) m ON v.id = m.id
)""")
    parts.append(
        f"\nSELECT id, ROUND(r, {FLOAT_DECIMALS}) AS r FROM r{rounds} ORDER BY id"
    )
    return _materialized("WITH " + "".join(parts))


def lpa_u2i_sql(rounds: int = 4) -> str:
    """Unrolled lpa_u2i (lpa_u2i.h:164-240) on the customer→part bipartite
    graph, single label prop, init label = (custkey % 7)/6 (hits both the
    0/1 clamp and the degree-corrected average)."""
    parts = [BIPART_CTE.rstrip(), """,
odeg AS (SELECT u, CAST(count(*) AS DOUBLE) AS od FROM edges GROUP BY u),
ideg AS (SELECT i, CAST(count(*) AS DOUBLE) AS idg FROM edges GROUP BY i),
nbrsum AS (
  SELECT e.u, SUM(ideg.idg) AS ns FROM edges e JOIN ideg ON e.i = ideg.i
  GROUP BY e.u
),
ul0 AS (SELECT id, CAST(id % 7 AS DOUBLE) / 6.0 AS label FROM users)"""]
    t = 0
    for step in range(rounds):
        if step % 2 == 0:
            t += 1
            parts.append(f""",
il{t} AS (
  SELECT e.i, SUM(p.label) AS ilabel
  FROM edges e JOIN ul{t-1} p ON e.u = p.id GROUP BY e.i
)""")
        else:
            parts.append(f""",
tmp{t} AS (
  SELECT e.u, SUM(il.ilabel) AS tl
  FROM edges e JOIN il{t} il ON e.i = il.i GROUP BY e.u
),
ul{t} AS (
  SELECT p.id,
         CASE WHEN p.label = 0.0 OR p.label = 1.0 THEN p.label
              WHEN ns.ns = od.od THEN p.label
              ELSE (COALESCE(t.tl, 0.0) - od.od * p.label) / (ns.ns - od.od)
         END AS label
  FROM ul{t-1} p
  JOIN odeg od ON p.id = od.u
  JOIN nbrsum ns ON p.id = ns.u
  LEFT JOIN tmp{t} t ON p.id = t.u
)""")
    parts.append(
        f"\nSELECT id, ROUND(label, {FLOAT_DECIMALS}) AS label FROM ul{t} ORDER BY id"
    )
    return _materialized("WITH " + "".join(parts))


def attr_assortativity_sql() -> str:
    """Categorical assortativity of p_brand over the co-purchase graph —
    the trace formula over the mixing matrix."""
    _sql = f"""WITH {COPURCHASE_CTE},
attr AS (SELECT p_partkey AS id, p_brand AS a FROM part),
apairs AS (
  SELECT sa.a AS xa, da.a AS ya
  FROM edges e JOIN attr sa ON e.src = sa.id JOIN attr da ON e.dst = da.id
),
m AS (SELECT CAST(count(*) AS DOUBLE) AS c FROM apairs),
mix AS (SELECT xa, ya, count(*) / (SELECT c FROM m) AS e FROM apairs GROUP BY xa, ya),
tr AS (SELECT COALESCE(SUM(e), 0.0) AS t FROM mix WHERE xa = ya),
am AS (SELECT xa, SUM(e) AS a FROM mix GROUP BY xa),
bm AS (SELECT ya, SUM(e) AS b FROM mix GROUP BY ya),
ab AS (SELECT COALESCE(SUM(am.a * bm.b), 0.0) AS s
       FROM am JOIN bm ON am.xa = bm.ya)
SELECT ROUND(((SELECT t FROM tr) - (SELECT s FROM ab))
             / (1.0 - (SELECT s FROM ab)), {FLOAT_DECIMALS}) AS assortativity"""
    return _materialized(_sql)


def voterank_sql(rounds: int = 10) -> str:
    """Unrolled VoteRank election (voterank.h:152-224) on the co-purchase
    graph: per round, score = Σ out-neighbor weights (rounded to 8 decimals
    — the EPS=1e-8 tie treatment), winner = max score / min id, winner's
    out-neighbors lose 1/avg_degree."""
    parts = [COPURCHASE_CTE.rstrip(),
             ",\nnv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts)",
             ",\nne AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM edges)",
             ",\ndelta AS (SELECT (SELECT n FROM nv) / (SELECT m FROM ne) AS d)",
             ",\nw0 AS (SELECT id, 1.0 AS weight, 0 AS rank FROM verts)"]
    for k in range(1, rounds + 1):
        p = f"w{k-1}"
        parts.append(f""",
s{k} AS (
  SELECT e.src AS id, ROUND(SUM(w.weight), 8) AS score
  FROM edges e JOIN {p} w ON e.dst = w.id GROUP BY e.src
),
win{k} AS (
  SELECT c.id FROM {p} c LEFT JOIN s{k} s ON c.id = s.id
  WHERE c.rank = 0 AND COALESCE(s.score, 0.0) >= 1e-8
  ORDER BY COALESCE(s.score, 0.0) DESC, c.id ASC LIMIT 1
),
nb{k} AS (SELECT DISTINCT dst AS id FROM edges
          WHERE src = (SELECT id FROM win{k})),
w{k} AS (
  SELECT w.id,
         CASE WHEN w.id = (SELECT id FROM win{k}) THEN 0.0
              WHEN nb.id IS NOT NULL
                THEN GREATEST(w.weight - (SELECT d FROM delta), 0.0)
              ELSE w.weight END AS weight,
         CASE WHEN w.id = (SELECT id FROM win{k}) THEN {k}
              ELSE w.rank END AS rank
  FROM {p} w LEFT JOIN nb{k} nb ON w.id = nb.id
)""")
    parts.append(f"\nSELECT id, rank FROM w{rounds} ORDER BY id")
    return _materialized("WITH " + "".join(parts))


def all_simple_paths_sql(cutoff: int = 3, target_mod: int = 7) -> str:
    """Unrolled simple-path enumeration from the min-id vertex to targets
    (id % target_mod == 0), ≤ cutoff hops, path serialized as a->b->c."""
    parts = [COPURCHASE_CTE.rstrip(), SOURCE_CTE, """,
p1 AS (
  SELECT [e.src, e.dst] AS pl, e.dst AS v, 1 AS hops
  FROM edges e WHERE e.src = (SELECT sid FROM src)
)"""]
    for k in range(2, cutoff + 1):
        parts.append(f""",
p{k} AS (
  SELECT list_append(p.pl, e.dst) AS pl, e.dst AS v, {k} AS hops
  FROM p{k-1} p JOIN edges e ON e.src = p.v
  WHERE NOT list_contains(p.pl, e.dst)
)""")
    un = "\nUNION ALL\n".join(
        f"SELECT pl, v, hops FROM p{k}" for k in range(1, cutoff + 1)
    )
    parts.append(f""",
allp AS ({un})
SELECT array_to_string(pl, '->') AS path_str, hops
FROM allp WHERE v % {target_mod} = 0""")
    return _materialized("WITH " + "".join(parts))


def bfs_parents_sql(rounds: int = WCC_ROUNDS) -> str:
    """BFS tree in predecessors format: parent = min-id neighbor one level
    closer, NULL at the source."""
    parts = [COPURCHASE_CTE.rstrip(), SOURCE_CTE,
             ",\nd0 AS (SELECT id, CASE WHEN id = (SELECT sid FROM src)"
             " THEN 0 END AS dist FROM verts)"]
    for k in range(1, rounds + 1):
        p = f"d{k-1}"
        parts.append(f""",
d{k} AS (
  SELECT v.id,
         CASE WHEN LEAST(COALESCE(v.dist, 1000000), COALESCE(m.c, 1000000))
                   < 1000000
              THEN LEAST(COALESCE(v.dist, 1000000), COALESCE(m.c, 1000000))
         END AS dist
  FROM {p} v LEFT JOIN (
    SELECT e.dst AS id, MIN(p.dist + 1) AS c
    FROM edges e JOIN {p} p ON e.src = p.id AND p.dist IS NOT NULL
    GROUP BY e.dst
  ) m ON v.id = m.id
)""")
    parts.append(f""",
lev AS (SELECT id, dist FROM d{rounds}),
par AS (
  SELECT e.dst AS id, MIN(e.src) AS parent
  FROM edges e
  JOIN lev ls ON e.src = ls.id
  JOIN lev ld ON e.dst = ld.id
  WHERE ld.dist = ls.dist + 1
  GROUP BY e.dst
)
SELECT l.id, l.dist,
       CASE WHEN l.id = (SELECT sid FROM src) THEN NULL ELSE p.parent END AS parent
FROM lev l LEFT JOIN par p ON l.id = p.id ORDER BY l.id""")
    return _materialized("WITH " + "".join(parts))


# ---------------------------------------------------------------------- #
# FLASH subgraph-counting oracles (apps/flash/subgraph/)
# ---------------------------------------------------------------------- #


def rectangle_sql() -> str:
    """4-cycle count via the diagonal identity (rectangle.h):
    rectangles = Σ_{x<y} C(cn(x,y), 2) / 2."""
    _sql = f"""WITH {COPURCHASE_CTE},
cn AS (
  SELECT e1.dst AS x, e2.dst AS y, count(*) AS p
  FROM edges e1 JOIN edges e2 ON e1.src = e2.src AND e1.dst < e2.dst
  GROUP BY e1.dst, e2.dst
)
SELECT CAST(COALESCE(SUM(p*(p-1)), 0) // 4 AS BIGINT) AS rectangles FROM cn"""
    return _materialized(_sql)


def diamond_sql() -> str:
    """Diamond count = Σ_e C(t_e, 2) over per-edge triangle counts
    (diamond.h)."""
    _sql = f"""WITH {COPURCHASE_CTE}, {TRIANGLES_BODY},
et AS (
  SELECT LEAST(a,b) AS s, GREATEST(a,b) AS t FROM tri
  UNION ALL SELECT LEAST(a,c), GREATEST(a,c) FROM tri
  UNION ALL SELECT LEAST(b,c), GREATEST(b,c) FROM tri
),
etc AS (SELECT s, t, count(*) AS te FROM et GROUP BY s, t)
SELECT CAST(COALESCE(SUM(te*(te-1)), 0) // 2 AS BIGINT) AS diamonds FROM etc"""
    return _materialized(_sql)


def tailed_triangle_sql() -> str:
    """Tailed triangles = Σ_v t_v (d_v − 2) (tailed-triangle.h); deg/tri
    come from TRIANGLES_BODY."""
    _sql = f"""WITH {COPURCHASE_CTE}, {TRIANGLES_BODY},
corners AS (
  SELECT a AS id FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
),
pvt AS (SELECT id, count(*) AS tri FROM corners GROUP BY id)
SELECT CAST(COALESCE(SUM(p.tri*(d.d-2)), 0) AS BIGINT) AS tailed
FROM pvt p JOIN deg d ON p.id = d.id"""
    return _materialized(_sql)


def three_path_sql() -> str:
    """3-edge path count = Σ_(u,v)∈E (d_u−1)(d_v−1) − 3·triangles
    (3-path.h)."""
    _sql = f"""WITH {COPURCHASE_CTE}, {TRIANGLES_BODY},
w AS (SELECT COALESCE(SUM((d1.d-1)*(d2.d-1)), 0) AS w
      FROM pairs p JOIN deg d1 ON p.u = d1.id JOIN deg d2 ON p.v = d2.id),
t AS (SELECT count(*) AS t FROM tri)
SELECT CAST(w.w - 3*t.t AS BIGINT) AS paths3 FROM w, t"""
    return _materialized(_sql)


def kclique4_sql() -> str:
    """4-clique count: all six edges of c1<c2<c3<c4 in the (deg,id)
    orientation order (k-clique.h; oe from TRIANGLES_BODY)."""
    _sql = f"""WITH {COPURCHASE_CTE}, {TRIANGLES_BODY}
SELECT count(*) AS cliques
FROM oe e12
JOIN oe e13 ON e13.u = e12.u
JOIN oe e23 ON e23.u = e12.v AND e23.v = e13.v
JOIN oe e14 ON e14.u = e12.u
JOIN oe e24 ON e24.u = e12.v AND e24.v = e14.v
JOIN oe e34 ON e34.u = e13.v AND e34.v = e14.v"""
    return _materialized(_sql)


def directed_census_sql(kind: str) -> str:
    """Directed triangle census on the partseq graph
    (acyclic-/cyclic-/in-/out-triangle.h)."""
    mutual = """
mutual AS (
  SELECT e.src AS u, e.dst AS v
  FROM edges e JOIN edges r ON r.src = e.dst AND r.dst = e.src
  WHERE e.src < e.dst
)"""
    if kind == "acyclic":
        body = """
SELECT count(*) AS acyclic
FROM edges ab JOIN edges bc ON bc.src = ab.dst
JOIN edges ac ON ac.src = ab.src AND ac.dst = bc.dst"""
        return _materialized(f"WITH {PARTSEQ_CTE.rstrip()}{body}")
    if kind == "cyclic":
        body = """
SELECT count(*) AS cyclic
FROM edges ab JOIN edges bc ON bc.src = ab.dst
JOIN edges ca ON ca.src = bc.dst AND ca.dst = ab.src
WHERE ab.src < ab.dst AND ab.src < bc.dst"""
        return _materialized(f"WITH {PARTSEQ_CTE.rstrip()}{body}")
    if kind == "in":
        body = f""",{mutual}
SELECT count(*) AS in_triangles
FROM mutual m JOIN edges ux ON ux.src = m.u
JOIN edges vx ON vx.src = m.v AND vx.dst = ux.dst"""
        return _materialized(f"WITH {PARTSEQ_CTE.rstrip()}{body}")
    if kind == "out":
        body = f""",{mutual}
SELECT count(*) AS out_triangles
FROM mutual m JOIN edges xu ON xu.dst = m.u
JOIN edges xv ON xv.dst = m.v AND xv.src = xu.src"""
        return _materialized(f"WITH {PARTSEQ_CTE.rstrip()}{body}")
    raise ValueError(kind)


# ---------------------------------------------------------------------- #
# Gremlin DSL oracles (graphscope_spark/gremlin.py — the traversal chains
# lower to exactly these relational twins, the same lowering the
# reference's compiler performs: supported_gremlin_steps.md)
# ---------------------------------------------------------------------- #


def gremlin_khop_sql(mod: int = 50) -> str:
    """g.V().where(id%mod==0).as('a').out().out().groupCount(by 'a')."""
    _sql = f"""WITH {COPURCHASE_CTE},
starts AS (SELECT id FROM verts WHERE id % {mod} = 0)
SELECT s.id AS a, CAST(COUNT(*) AS BIGINT) AS cnt
FROM starts s
JOIN edges e1 ON e1.src = s.id
JOIN edges e2 ON e2.src = e1.dst
GROUP BY s.id ORDER BY a"""
    return _materialized(_sql)


def gremlin_topk_sql(k: int = 20) -> str:
    """g.V().out().groupCount().order().by(count desc, key asc).limit(k) —
    top in-degree; total order on (cnt, key) so the cut is deterministic."""
    _sql = f"""WITH {COPURCHASE_CTE}
SELECT dst AS key, CAST(COUNT(*) AS BIGINT) AS cnt
FROM edges GROUP BY dst ORDER BY cnt DESC, key LIMIT {k}"""
    return _materialized(_sql)


def gremlin_nbr_size_sql(min_size: int = 25) -> str:
    """g.V().has('p_size', gte(min_size)).as('a').out().values('p_size')
    .group().by('a').by(sum) — property filter + property projection."""
    _sql = f"""WITH {COPURCHASE_CTE}
SELECT e.src AS a, CAST(SUM(p2.p_size) AS BIGINT) AS nbr_size_sum
FROM edges e
JOIN part p ON p.p_partkey = e.src AND p.p_size >= {min_size}
JOIN part p2 ON p2.p_partkey = e.dst
GROUP BY e.src ORDER BY a"""
    return _materialized(_sql)


def gremlin_no_out_sql() -> str:
    """g.V().not(out()) on the directed purchase graph — the sink side of
    the bipartite cust→supp edges (every supplier, no customer)."""
    _sql = f"""WITH {PURCHASE_CTE}
SELECT id AS v FROM verts WHERE id NOT IN (SELECT src FROM edges) ORDER BY v"""
    return _materialized(_sql)


def cycle_plus_sql() -> str:
    """Twin of algorithms/subgraph.py::cycle_plus_triangle_count on the
    directed part-sequence graph."""
    _sql = f"""WITH {PARTSEQ_CTE.rstrip()}
SELECT CAST(COUNT(*) AS BIGINT) AS cycle_plus
FROM edges sd
JOIN edges ds ON ds.src = sd.dst AND ds.dst = sd.src
JOIN edges xs ON xs.dst = sd.src
JOIN edges dx ON dx.src = sd.dst AND dx.dst = xs.src"""
    return _materialized(_sql)


def property_project_sql() -> str:
    """Twin of the PropertyGraph customer--knows-->customer projection's
    out-degree (tests/test_property_graph.py fixture shape: same-nation
    pairs, a < b, src % 7 = 0)."""
    _sql = """WITH knows AS (
  SELECT a.c_custkey AS src, b.c_custkey AS dst
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
  WHERE a.c_custkey % 7 = 0
)
SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS out_deg
FROM knows GROUP BY src ORDER BY id"""
    return _materialized(_sql)


def gremlin_match_sql() -> str:
    """Twin of g.match(a→b, b→c, c→a) binding count on the directed
    part-sequence graph (distinct bindings; 3 rotations per 3-cycle)."""
    _sql = f"""WITH {PARTSEQ_CTE.rstrip()}
SELECT CAST(COUNT(*) AS BIGINT) AS bindings FROM (
  SELECT DISTINCT ab.src AS a, ab.dst AS b, bc.dst AS c
  FROM edges ab
  JOIN edges bc ON bc.src = ab.dst
  JOIN edges ca ON ca.src = bc.dst AND ca.dst = ab.src
) t"""
    return _materialized(_sql)


# ---------------------------------------------------------------------- #
# GNN sampling oracles (graphscope_spark/sampling.py twins)
# ---------------------------------------------------------------------- #

def _hash64_concat_sql(*exprs: str) -> str:
    """DuckDB twin of sampling._pick_hash: 60-bit md5 hash of
    '<e1>|<e2>|…' with every part cast to VARCHAR."""
    from graphscope_spark.functions.hashing import hash64_sql
    joined = " || '|' || ".join(f"CAST({e} AS VARCHAR)" for e in exprs)
    return hash64_sql(joined)


def sample_neighbors_sql(fanouts: list[int], seed: int = 42,
                         seed_mod: int = 50) -> str:
    """Twin of sampling.sample_neighbors on the co-purchase graph with
    seeds = vertices where id % seed_mod == 0. Per hop: rank each frontier
    vertex's distinct out-neighbors by (hash, dst), keep the top fanout,
    attach roots, dedup — identical shape to the Spark plan."""
    ctes = [COPURCHASE_CTE.rstrip(),
            f"f0 AS (SELECT id AS root, id FROM verts WHERE id % {seed_mod} = 0)"]
    picks = []
    prev = "f0"
    for hop, k in enumerate(fanouts, start=1):
        h = _hash64_concat_sql(f"'{seed}'", str(hop), "e.src", "e.dst")
        ctes.append(f"""c{hop} AS (
  SELECT e.src, e.dst,
         row_number() OVER (PARTITION BY e.src ORDER BY {h}, e.dst) AS rk
  FROM (SELECT DISTINCT src, dst FROM edges) e
  JOIN (SELECT DISTINCT id FROM {prev}) f ON f.id = e.src
)""")
        ctes.append(f"""p{hop} AS (
  SELECT DISTINCT f.root, {hop} AS hop, c.src, c.dst
  FROM {prev} f JOIN c{hop} c ON f.id = c.src
  WHERE c.rk <= {k}
)""")
        ctes.append(
            f"f{hop} AS (SELECT DISTINCT root, dst AS id FROM p{hop})")
        picks.append(f"SELECT root, hop, src, dst FROM p{hop}")
        prev = f"f{hop}"
    _sql = ("WITH " + ",\n".join(ctes) + "\n"
            + " UNION ALL ".join(picks))
    return _materialized(_sql)


def sample_neighbors_weighted_sql(fanouts: list[int], seed: int = 42,
                                  seed_mod: int = 100) -> str:
    """Twin of sampling.sample_neighbors_weighted on the WEIGHTED
    co-purchase multigraph (weight = co-purchase multiplicity per pair).
    Draw j at vertex v picks the neighbor whose cumulative-weight interval
    contains hash(seed|hop|v|j) mod W(v) — integer-exact in both engines."""
    ctes = [f"""wpairs AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v, CAST(COUNT(*) AS BIGINT) AS w
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
   AND a.l_quantity >= {QMIN} AND b.l_quantity >= {QMIN}
  GROUP BY u, v
)""", """wedges AS (
  SELECT u AS src, v AS dst, w FROM wpairs
  UNION ALL SELECT v AS src, u AS dst, w FROM wpairs
)""", """cum AS (
  SELECT src, dst,
         SUM(w) OVER (PARTITION BY src ORDER BY dst) - w AS lo,
         SUM(w) OVER (PARTITION BY src ORDER BY dst) AS hi,
         SUM(w) OVER (PARTITION BY src) AS tot
  FROM wedges
)""",
        f"f0 AS (SELECT DISTINCT src AS root, src AS id FROM wedges "
        f"WHERE src % {seed_mod} = 0)"]
    picks = []
    prev = "f0"
    for hop, k in enumerate(fanouts, start=1):
        h = _hash64_concat_sql(f"'{seed}'", str(hop), "d.src", "d.j")
        ctes.append(f"""d{hop} AS (
  SELECT f.id AS src, t.j
  FROM (SELECT DISTINCT id FROM {prev}) f
  CROSS JOIN (SELECT UNNEST(range(1, {k + 1})) AS j) t
)""")
        ctes.append(f"""c{hop} AS (
  SELECT DISTINCT d.src, c.dst
  FROM d{hop} d JOIN cum c ON c.src = d.src
  WHERE ({h}) % c.tot >= c.lo AND ({h}) % c.tot < c.hi
)""")
        ctes.append(f"""p{hop} AS (
  SELECT DISTINCT f.root, {hop} AS hop, c.src, c.dst
  FROM {prev} f JOIN c{hop} c ON f.id = c.src
)""")
        ctes.append(
            f"f{hop} AS (SELECT DISTINCT root, dst AS id FROM p{hop})")
        picks.append(f"SELECT root, hop, src, dst FROM p{hop}")
        prev = f"f{hop}"
    _sql = "WITH " + ",\n".join(ctes) + "\n" + " UNION ALL ".join(picks)
    return _materialized(_sql)


def random_walks_sql(walk_length: int, seed: int = 42,
                     start_mod: int = 50) -> str:
    """Twin of sampling.random_walks (walks_per_vertex=1 → walk = start
    id). Adjacency indexed 0..deg-1 in dst order; step t picks neighbor
    hash(seed|walk|t|v) % deg."""
    ctes = [COPURCHASE_CTE.rstrip(), """adj AS (
  SELECT src, dst,
         row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx,
         count(*) OVER (PARTITION BY src) AS deg
  FROM (SELECT DISTINCT src, dst FROM edges) e
)""",
            f"s0 AS (SELECT id AS walk, id AS v FROM verts WHERE id % {start_mod} = 0)"]
    outs = ["SELECT walk, 0 AS step, v FROM s0"]
    for t in range(1, walk_length + 1):
        h = _hash64_concat_sql(f"'{seed}'", "s.walk", str(t), "s.v")
        ctes.append(f"""s{t} AS (
  SELECT s.walk, a.dst AS v
  FROM s{t-1} s JOIN adj a ON s.v = a.src
  WHERE a.idx = ({h}) % a.deg
)""")
        outs.append(f"SELECT walk, {t} AS step, v FROM s{t}")
    _sql = "WITH " + ",\n".join(ctes) + "\n" + " UNION ALL ".join(outs)
    return _materialized(_sql)


def node2vec_sql(walk_length: int = 3, p: float = 2.0, q: float = 0.5,
                 seed: int = 42, start_mod: int = 100) -> str:
    """Twin of sampling.node2vec_walks with DYADIC p/q (1/p and 1/q are
    exact binary fractions, e.g. p=2, q=0.5 → weights 0.5/1.0/2.0):
    cumulative weight sums are then exact in double regardless of order,
    and u = (hash % 2^20)/2^20 · total is one identically-rounded IEEE
    product per candidate set — the inverse-CDF pick is bit-portable.
    Non-dyadic p/q would reintroduce order-dependent float sums; raise
    there rather than gate."""
    inv_p, inv_q = 1.0 / p, 1.0 / q
    if (inv_p * 4).is_integer() is False or (inv_q * 4).is_integer() is False:
        raise ValueError("node2vec_sql requires dyadic 1/p and 1/q")
    ctes = [COPURCHASE_CTE.rstrip(), """ad AS (SELECT DISTINCT src, dst FROM edges)""",
            f"""w0 AS (SELECT id AS walk, id AS v,
             CAST(NULL AS BIGINT) AS prev
      FROM verts WHERE id % {start_mod} = 0)"""]
    outs = ["SELECT walk, 0 AS step, v FROM w0"]
    for t in range(1, walk_length + 1):
        h = _hash64_concat_sql(f"'{seed}'", "walk", str(t), "src")
        if t == 1:
            wexpr = "CAST(1.0 AS DOUBLE)"
        else:
            wexpr = f"""CASE
           WHEN c.dst = c.prev THEN CAST({inv_p!r} AS DOUBLE)
           WHEN EXISTS (SELECT 1 FROM ad e
                        WHERE e.src = c.prev AND e.dst = c.dst)
             THEN CAST(1.0 AS DOUBLE)
           ELSE CAST({inv_q!r} AS DOUBLE) END"""
        ctes.append(f"""c{t} AS (
  SELECT s.walk, s.prev, s.v AS src, a.dst
  FROM w{t-1} s JOIN ad a ON a.src = s.v
)""")
        ctes.append(f"""g{t} AS (
  SELECT c.walk, c.src, c.dst, {wexpr} AS w FROM c{t} c
)""")
        ctes.append(f"""p{t} AS (
  SELECT walk, src, dst,
         SUM(w) OVER (PARTITION BY walk ORDER BY dst) AS cum,
         (({h}) % 1048576) / 1048576.0
           * SUM(w) OVER (PARTITION BY walk) AS u
  FROM g{t}
)""")
        ctes.append(f"""w{t} AS (
  SELECT walk, dst AS v, src AS prev FROM (
    SELECT walk, src, dst,
           row_number() OVER (PARTITION BY walk ORDER BY dst) AS rk
    FROM p{t} WHERE cum > u
  ) WHERE rk = 1
)""")
        outs.append(f"SELECT walk, {t} AS step, v FROM w{t}")
    _sql = "WITH " + ",\n".join(ctes) + "\n" + " UNION ALL ".join(outs)
    return _materialized(_sql)


def negative_sample_sql(tries: int = 5, seed: int = 42,
                        source_mod: int = 10) -> str:
    """Twin of sampling.negative_sample: per (source, try) propose
    hash(seed|src|t) % (max_id+1), keep real non-self non-neighbor ids."""
    h = _hash64_concat_sql(f"'{seed}'", "s.src", "t.t")
    _sql = f"""WITH {COPURCHASE_CTE.rstrip()},
mx AS (SELECT MAX(id) + 1 AS m FROM verts),
src AS (SELECT id AS src FROM verts WHERE id % {source_mod} = 0),
cand AS (
  SELECT DISTINCT s.src, ({h}) % (SELECT m FROM mx) AS neg
  FROM src s CROSS JOIN (SELECT unnest(generate_series(0, {tries - 1})) AS t) t
)
SELECT c.src, c.neg
FROM cand c
WHERE c.src <> c.neg
  AND c.neg IN (SELECT id FROM verts)
  AND NOT EXISTS (SELECT 1 FROM edges e WHERE e.src = c.src AND e.dst = c.neg)"""
    return _materialized(_sql)


def k_core_search_sql(k: int = 3, rounds: int = KCORE_ROUNDS) -> str:
    """Twin of algorithms.cores.k_core_search — (k, size) of the k-core."""
    inner = kcore_sql(k=k, rounds=rounds)
    return f"SELECT {k} AS k, CAST(count(*) AS BIGINT) AS size FROM ({inner}) t"


def random_multi_bfs_sql(k: int = 8, seed: int = 42,
                         rounds: int = WCC_ROUNDS) -> str:
    """Twin of algorithms.paths.random_multi_bfs — batched BFS from the k
    vertices minimizing (hash64(seed|id), id)."""
    from graphscope_spark.functions.hashing import hash64_sql
    h = hash64_sql(f"'{seed}|' || CAST(id AS VARCHAR)")
    pick = f""",
srcpick AS (
  SELECT id FROM (
    SELECT id, row_number() OVER (ORDER BY {h}, id) AS rk FROM verts
  ) t WHERE rk <= {k}
)"""
    _sql = (f"WITH {COPURCHASE_CTE.rstrip()}{pick}"
            f"{_msbfs_cte(rounds, 'WHERE id IN (SELECT id FROM srcpick)')}\n"
            f"SELECT src, id, dist FROM d{rounds}")
    return _materialized(_sql)

def dfs_sql() -> str:
    """Twin of algorithms.dfs.dfs on the partseq graph — preorder ranks.

    DFS is sequential (dfs.h holds one token vertex per superstep), but it
    is DETERMINISTIC: neighbors are tried in ascending id (CSR order), so
    the whole walk is a pure function of the edge set. The twin replays it
    as a single-row recursive-CTE state machine: each iteration either
    pushes the smallest unvisited neighbor of the stack top (emitting its
    rank/parent) or backtracks; ≤ 2·V iterations, state = stack + visited
    lists. Source pick mirrors _q_dfs: max out-degree, min id among ties.
    """
    _sql = f"""WITH RECURSIVE {PARTSEQ_CTE.rstrip()},
adj AS (SELECT src, list_sort(list(DISTINCT dst)) AS nbrs FROM edges GROUP BY src),
src0 AS (
  SELECT src AS id FROM edges GROUP BY src
  ORDER BY count(DISTINCT dst) DESC, src ASC LIMIT 1
),
walk(stack, visited, emit_id, emit_rank, emit_parent, nvis) AS (
  SELECT [s.id], [s.id], s.id, 0, CAST(NULL AS BIGINT), 1 FROM src0 s
  UNION ALL
  SELECT
    CASE WHEN s.nxt IS NULL THEN w.stack[1:len(w.stack)-1]
         ELSE list_append(w.stack, s.nxt) END,
    CASE WHEN s.nxt IS NULL THEN w.visited ELSE list_append(w.visited, s.nxt) END,
    s.nxt,
    CASE WHEN s.nxt IS NULL THEN NULL ELSE w.nvis END,
    CASE WHEN s.nxt IS NULL THEN NULL ELSE w.stack[-1] END,
    CASE WHEN s.nxt IS NULL THEN w.nvis ELSE w.nvis + 1 END
  FROM walk w
  LEFT JOIN adj a ON a.src = w.stack[-1]
  CROSS JOIN LATERAL (
    SELECT list_filter(coalesce(a.nbrs, []), x -> NOT list_contains(w.visited, x))[1] AS nxt
  ) s
  WHERE len(w.stack) > 0
)
SELECT emit_id AS id, CAST(emit_rank AS INT) AS "rank", emit_parent AS parent
FROM walk WHERE emit_id IS NOT NULL"""
    return _materialized(_sql)


def shortest_path_expand_sql(rounds: int = WCC_ROUNDS) -> str:
    """ALL shortest paths min-id → max-reachable-id on the copurchase
    graph, serialized "a->b->c" — the GIE ShortestPathExpand twin.
    Unrolled BFS levels, then the shortest-path DAG (dist advances by
    exactly 1), then ``rounds`` backward prepend steps from the target;
    rows whose head reached the source (dist 0) pass through unchanged."""
    parts = [COPURCHASE_CTE.rstrip(), SOURCE_CTE,
             ",\nd0 AS (SELECT id, CASE WHEN id = (SELECT sid FROM src)"
             " THEN 0 END AS dist FROM verts)"]
    for k in range(1, rounds + 1):
        p = f"d{k-1}"
        parts.append(f""",
d{k} AS (
  SELECT v.id,
         CASE WHEN LEAST(COALESCE(v.dist, 1000000), COALESCE(m.c, 1000000))
                   < 1000000
              THEN LEAST(COALESCE(v.dist, 1000000), COALESCE(m.c, 1000000))
         END AS dist
  FROM {p} v LEFT JOIN (
    SELECT e.dst AS id, MIN(p.dist + 1) AS c
    FROM edges e JOIN {p} p ON e.src = p.id AND p.dist IS NOT NULL
    GROUP BY e.dst
  ) m ON v.id = m.id
)""")
    parts.append(f""",
lev AS (SELECT id, dist FROM d{rounds} WHERE dist IS NOT NULL),
tgt AS (SELECT MAX(id) AS tid FROM lev),
dag AS (
  SELECT e.src, e.dst, ls.dist AS sd
  FROM edges e
  JOIN lev ls ON e.src = ls.id
  JOIN lev ld ON e.dst = ld.id
  WHERE ld.dist = ls.dist + 1
),
p0 AS (
  SELECT [t.tid] AS pl, t.tid AS head,
         (SELECT dist FROM lev WHERE id = t.tid) AS hd
  FROM tgt t
)""")
    for k in range(1, rounds + 1):
        p = f"p{k-1}"
        parts.append(f""",
p{k} AS (
  SELECT list_prepend(d.src, p.pl) AS pl, d.src AS head, d.sd AS hd
  FROM {p} p JOIN dag d ON d.dst = p.head AND p.hd > 0
  UNION ALL
  SELECT pl, head, hd FROM {p} WHERE hd = 0
)""")
    parts.append(f"""
SELECT array_to_string(pl, '->') AS path_str,
       CAST(len(pl) - 1 AS BIGINT) AS hops
FROM p{rounds} WHERE hd = 0""")
    return _materialized("WITH " + "".join(parts))


def gremlin_path_sql(mod: int = 100) -> str:
    """g.V().where(id%mod==0).track_path().out().out().path() — 2-hop
    vertex paths serialized "a->b->c"."""
    _sql = f"""WITH {COPURCHASE_CTE},
starts AS (SELECT id FROM verts WHERE id % {mod} = 0)
SELECT CAST(s.id AS VARCHAR) || '->' || CAST(e1.dst AS VARCHAR)
       || '->' || CAST(e2.dst AS VARCHAR) AS path_str
FROM starts s
JOIN edges e1 ON e1.src = s.id
JOIN edges e2 ON e2.src = e1.dst"""
    return _materialized(_sql)


def cypher_degree_hist_sql(min_deg: int = 10) -> str:
    """MATCH (a)-[]->(b) WITH a, count(b) AS deg WHERE deg > min_deg
    RETURN deg, count(a) AS n — the WITH clause (project/aggregate +
    post-WITH WHERE = HAVING) lowered relationally: per-vertex out-degree
    over the deduplicated directed pair table, then a histogram."""
    _sql = f"""WITH {COPURCHASE_CTE},
deg AS (
  SELECT src AS a, CAST(COUNT(*) AS BIGINT) AS deg
  FROM edges GROUP BY src
)
SELECT deg, CAST(COUNT(*) AS BIGINT) AS n
FROM deg WHERE deg > {min_deg} GROUP BY deg"""
    return _materialized(_sql)


def cypher_multi_with_sql() -> str:
    """MATCH (a)-[]->(b) WITH a, count(b) AS deg WITH deg, count(a) AS n
    RETURN deg, n — chained WITH clauses (degree, then histogram)."""
    _sql = f"""WITH {COPURCHASE_CTE},
deg AS (
  SELECT src AS a, CAST(COUNT(*) AS BIGINT) AS deg
  FROM edges GROUP BY src
)
SELECT deg, CAST(COUNT(*) AS BIGINT) AS n FROM deg GROUP BY deg"""
    return _materialized(_sql)


def cypher_arith_sql(mod: int = 97) -> str:
    """MATCH (a)-[]->(b) RETURN a, (a * 2 + b) % mod AS k — binary
    arithmetic in RETURN terms (cypher.py _term round-5 grammar
    addition), one row per distinct directed pair."""
    _sql = f"""WITH {COPURCHASE_CTE}
SELECT src AS a, CAST((src * 2 + dst) % {mod} AS BIGINT) AS k
FROM edges"""
    return _materialized(_sql)


def cypher_case_sql(hi: int = 20, lo: int = 5) -> str:
    """MATCH (a)-[]->(b) WITH a, count(b) AS deg
    RETURN CASE WHEN deg > hi THEN 'hub' WHEN deg > lo THEN 'mid'
    ELSE 'leaf' END AS cls, count(a) AS n — the searched CASE
    expression (cypher.py _term) lowered to SQL CASE."""
    _sql = f"""WITH {COPURCHASE_CTE},
deg AS (
  SELECT src AS a, CAST(COUNT(*) AS BIGINT) AS deg
  FROM edges GROUP BY src
)
SELECT CASE WHEN deg > {hi} THEN 'hub'
            WHEN deg > {lo} THEN 'mid'
            ELSE 'leaf' END AS cls,
       CAST(COUNT(*) AS BIGINT) AS n
FROM deg GROUP BY 1"""
    return _materialized(_sql)


def cypher_triangle_sql() -> str:
    """MATCH (a)-[]->(b)-[]->(c), (a)-[]->(c) WHERE a < b AND b < c
    RETURN count(*) — each undirected triangle counted once."""
    _sql = f"""WITH {COPURCHASE_CTE}
SELECT CAST(COUNT(*) AS BIGINT) AS n
FROM edges e1
JOIN edges e2 ON e2.src = e1.dst
JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
WHERE e1.src < e1.dst AND e2.src < e2.dst"""
    return _materialized(_sql)


def cypher_multi_match_sql(lim: int = 100) -> str:
    """MATCH (a)-[]->(b) MATCH (b)-[]->(c) WHERE a < lim
    RETURN b AS mid, count(c) AS n2 — chained MATCH clauses join their
    pattern trees on the shared variable b (supported_cypher.md MATCH
    row; cypher.py folds the chain into one conjunctive join tree)."""
    _sql = f"""WITH {COPURCHASE_CTE}
SELECT e1.dst AS mid, CAST(COUNT(*) AS BIGINT) AS n2
FROM edges e1 JOIN edges e2 ON e2.src = e1.dst
WHERE e1.src < {lim}
GROUP BY e1.dst"""
    return _materialized(_sql)


SUPPLIER_CHAIN_CTE = """
r AS (SELECT s_suppkey, s_nationkey,
             ROW_NUMBER() OVER (PARTITION BY s_nationkey
                                ORDER BY s_suppkey) AS rn
      FROM supplier),
we AS (
  SELECT a.s_suppkey AS src, b.s_suppkey AS dst, 1.0 AS w
  FROM r a JOIN r b ON a.s_nationkey = b.s_nationkey AND b.rn = a.rn + 1
  UNION ALL
  SELECT a.s_suppkey AS src, b.s_suppkey AS dst, 2.0 AS w
  FROM r a JOIN r b ON a.s_nationkey = b.s_nationkey AND b.rn = a.rn + 2
),
wboth AS (SELECT src, dst, w FROM we
          UNION ALL SELECT dst AS src, src AS dst, w FROM we),
verts AS (SELECT DISTINCT src AS id FROM wboth)
"""


def betweenness_weighted_sql(relax_rounds: int = 16, max_lev: int = 16,
                             endpoints: bool = False) -> str:
    """Twin of paths.py::betweenness_centrality_weighted on the supplier
    chain+skip graph (all sources, exact): unrolled weighted relaxation,
    shortest-path DAG (dist equality — exact, integer-valued weights),
    DAG-hop levels via unrolled max rounds, σ by ascending level, δ by
    descending level. Rounds must exceed the max weighted-SP hop count =
    largest nation's supplier count − 1 (10-supplier nation at sf0.01
    → 9 hops; 16 is generous)."""
    parts = [SUPPLIER_CHAIN_CTE.rstrip(), """,
nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
d0 AS (SELECT id AS src, id, 0.0 AS dist FROM verts)"""]
    for k in range(1, relax_rounds + 1):
        p = f"d{k-1}"
        parts.append(f""",
rx{k} AS (
  SELECT p.src, e.dst AS id, MIN(p.dist + e.w) AS nd
  FROM {p} p JOIN wboth e ON e.src = p.id
  GROUP BY p.src, e.dst
),
d{k} AS (
  SELECT COALESCE(a.src, b.src) AS src, COALESCE(a.id, b.id) AS id,
         LEAST(COALESCE(a.dist, b.nd), COALESCE(b.nd, a.dist)) AS dist
  FROM {p} a FULL JOIN rx{k} b ON a.src = b.src AND a.id = b.id
)""")
    D = f"d{relax_rounds}"
    parts.append(f""",
dag AS (
  SELECT x.src, x.id AS v, e.dst AS t
  FROM {D} x
  JOIN wboth e ON e.src = x.id
  JOIN {D} y ON y.src = x.src AND y.id = e.dst
  WHERE y.dist = x.dist + e.w
),
lv0 AS (SELECT id AS src, id, 0 AS lev FROM verts)""")
    for k in range(1, max_lev + 1):
        p = f"lv{k-1}"
        parts.append(f""",
lc{k} AS (
  SELECT g.src, g.t AS id, MAX(l.lev) + 1 AS nl
  FROM {p} l JOIN dag g ON g.src = l.src AND g.v = l.id
  GROUP BY g.src, g.t
),
lv{k} AS (
  SELECT COALESCE(a.src, b.src) AS src, COALESCE(a.id, b.id) AS id,
         GREATEST(COALESCE(a.lev, b.nl), COALESCE(b.nl, a.lev)) AS lev
  FROM {p} a FULL JOIN lc{k} b ON a.src = b.src AND a.id = b.id
)""")
    LV = f"lv{max_lev}"
    parts.append(f""",
sa0 AS (SELECT l.src, l.id, 1.0 AS sigma FROM {LV} l WHERE l.lev = 0)""")
    for L in range(1, max_lev + 1):
        p = f"sa{L-1}"
        parts.append(f""",
sa{L} AS (
  SELECT * FROM {p}
  UNION ALL
  SELECT g.src, g.t AS id, SUM(s.sigma) AS sigma
  FROM {p} s
  JOIN dag g ON g.src = s.src AND g.v = s.id
  JOIN {LV} at ON at.src = g.src AND at.id = g.t AND at.lev = {L}
  GROUP BY g.src, g.t
)""")
    SG = f"sa{max_lev}"
    parts.append(f""",
st{max_lev + 1} AS (
  SELECT s.src, s.id, s.sigma, l.lev, 0.0 AS delta
  FROM {SG} s JOIN {LV} l ON l.src = s.src AND l.id = s.id
)""")
    for L in range(max_lev, 0, -1):
        p = f"st{L+1}"
        parts.append(f""",
dc{L} AS (
  SELECT g.src, g.v AS id, SUM((1.0 + w.delta) / w.sigma) AS part
  FROM {p} w JOIN dag g ON g.src = w.src AND g.t = w.id
  WHERE w.lev = {L}
  GROUP BY g.src, g.v
),
st{L} AS (
  SELECT s.src, s.id, s.sigma, s.lev,
         s.delta + s.sigma * COALESCE(c.part, 0.0) AS delta
  FROM {p} s LEFT JOIN dc{L} c ON c.src = s.src AND c.id = s.id
)""")
    ep = "+ 1.0" if endpoints else ""
    src_side = """
  UNION ALL
  SELECT src AS id, CAST(COUNT(*) AS DOUBLE) AS d2 FROM st1
  WHERE lev > 0 GROUP BY src""" if endpoints else ""
    denom = ("(SELECT n FROM nv) * ((SELECT n FROM nv) - 1) / 2.0"
             if endpoints else
             "((SELECT n FROM nv) - 1) * ((SELECT n FROM nv) - 2) / 2.0")
    parts.append(f""",
bc AS (
  SELECT id, SUM(d2) AS b FROM (
    SELECT id, delta {ep} AS d2 FROM st1 WHERE lev > 0{src_side}
  ) u GROUP BY id
)
SELECT v.id,
       ROUND(COALESCE(bc.b, 0.0) * (0.5 / ({denom})),
             {FLOAT_DECIMALS}) AS betweenness
FROM verts v LEFT JOIN bc ON v.id = bc.id ORDER BY v.id""")
    return _materialized("WITH " + "".join(parts))


def closeness_weighted_sql(relax_rounds: int = 16) -> str:
    """Twin of paths.py::closeness_centrality(weight_col=) on the supplier
    chain+skip graph — unrolled weighted relaxation, then the wf_improved
    closeness formula over reached pairs."""
    return _materialized(_weighted_relax_cte(relax_rounds) + f""",
nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
intod AS (
  SELECT id, CAST(COUNT(*) AS DOUBLE) AS r, SUM(dist) AS total
  FROM d{relax_rounds} WHERE dist > 0 GROUP BY id
)
SELECT v.id,
       ROUND(COALESCE((i.r / i.total) * i.r
                      / ((SELECT n FROM nv) - 1), 0.0),
             {FLOAT_DECIMALS}) AS closeness
FROM verts v LEFT JOIN intod i ON v.id = i.id ORDER BY v.id""")


def _weighted_relax_cte(relax_rounds: int) -> str:
    """Shared prefix of the weighted oracles: SUPPLIER_CHAIN_CTE plus
    ``relax_rounds`` unrolled Bellman-Ford relaxations starting from every
    vertex (d0 = all self-pairs at dist 0) — expression-equal to
    paths.py::multi_source_weighted on the same graph."""
    parts = [SUPPLIER_CHAIN_CTE.rstrip(), """,
d0 AS (SELECT id AS src, id, 0.0 AS dist FROM verts)"""]
    for k in range(1, relax_rounds + 1):
        p = f"d{k-1}"
        parts.append(f""",
rx{k} AS (
  SELECT p.src, e.dst AS id, MIN(p.dist + e.w) AS nd
  FROM {p} p JOIN wboth e ON e.src = p.id
  GROUP BY p.src, e.dst
),
d{k} AS (
  SELECT COALESCE(a.src, b.src) AS src, COALESCE(a.id, b.id) AS id,
         LEAST(COALESCE(a.dist, b.nd), COALESCE(b.nd, a.dist)) AS dist
  FROM {p} a FULL JOIN rx{k} b ON a.src = b.src AND a.id = b.id
)""")
    return "WITH " + "".join(parts)


def harmonic_weighted_sql(relax_rounds: int = 16) -> str:
    """Twin of paths.py::harmonic_centrality(weight_col=) on the supplier
    chain+skip graph — H(v) = SUM_s 1/d(s, v) over weighted shortest-path
    distances (the weight branch of flash/centrality/harmonic.h's
    accumulation, exact sources)."""
    return _materialized(_weighted_relax_cte(relax_rounds) + f""",
intoh AS (
  SELECT id, SUM(1.0 / dist) AS h
  FROM d{relax_rounds} WHERE dist > 0 GROUP BY id
)
SELECT v.id, ROUND(COALESCE(i.h, 0.0), {FLOAT_DECIMALS}) AS harmonic
FROM verts v LEFT JOIN intoh i ON v.id = i.id ORDER BY v.id""")


def apsp_weighted_sql(relax_rounds: int = 16) -> str:
    """Twin of paths.py::all_pairs_weighted_shortest_path_length on the
    supplier chain+skip graph: every reached (src, id) pair with its
    weighted distance (integer-valued by construction — exact compare)."""
    return _materialized(_weighted_relax_cte(relax_rounds) + f"""
SELECT src, id, ROUND(dist, {FLOAT_DECIMALS}) AS dist
FROM d{relax_rounds} ORDER BY src, id""")


def ego_network_sql(k: int = 2, seed_mod: int = 50) -> str:
    """Twin of sampling.ego_network on the co-purchase graph with seeds =
    vertices where id % seed_mod == 0: k unrolled reach expansions, then
    the induced-edge join keyed on (seed, endpoint)."""
    ctes = [COPURCHASE_CTE.rstrip(),
            f"r0 AS (SELECT id AS seed, id AS v FROM verts "
            f"WHERE id % {seed_mod} = 0)"]
    prev = "r0"
    for hop in range(1, k + 1):
        ctes.append(f"""r{hop} AS (
  SELECT seed, v FROM {prev}
  UNION
  SELECT f.seed, e.dst AS v
  FROM {prev} f JOIN edges e ON e.src = f.v
)""")
        prev = f"r{hop}"
    return _materialized("WITH " + ",\n".join(ctes) + f"""
SELECT DISTINCT a.seed, e.src, e.dst
FROM (SELECT DISTINCT src, dst FROM edges) e
JOIN {prev} a ON a.v = e.src
JOIN {prev} b ON b.seed = a.seed AND b.v = e.dst
ORDER BY a.seed, e.src, e.dst""")


def link_prediction_sql(top: int = 100, min_cn: int = 1) -> str:
    """Twin of algorithms/link_prediction.py::link_prediction on the
    co-purchase graph: one wedge join computes cn / jaccard / adamic_adar /
    resource_alloc / pref_attach for non-adjacent pairs; top-``top`` by
    (cn DESC, u, v) — an integer-deterministic order, so the cut is exact
    across engines."""
    return _materialized(f"""WITH {COPURCHASE_CTE},
deg AS (SELECT src AS id, count(*) AS d FROM edges GROUP BY src),
wedge AS (
  SELECT e1.dst AS u, e2.dst AS v, e1.src AS w
  FROM edges e1 JOIN edges e2 ON e1.src = e2.src AND e1.dst < e2.dst
),
agg AS (
  SELECT u, v, count(*) AS cn,
         ROUND(SUM(1.0 / ln(dw.d)), 6) AS adamic_adar,
         ROUND(SUM(1.0 / dw.d), 6) AS resource_alloc
  FROM wedge JOIN deg dw ON dw.id = wedge.w
  GROUP BY u, v
  HAVING count(*) >= {min_cn}
),
nonadj AS (
  SELECT a.* FROM agg a
  LEFT JOIN edges e ON e.src = a.u AND e.dst = a.v
  WHERE e.src IS NULL
),
scored AS (
  SELECT n.u, n.v, n.cn,
         ROUND(CAST(n.cn AS DOUBLE) / (du.d + dv.d - n.cn), 6) AS jaccard,
         n.adamic_adar, n.resource_alloc, du.d * dv.d AS pref_attach
  FROM nonadj n
  JOIN deg du ON du.id = n.u
  JOIN deg dv ON dv.id = n.v
)
SELECT * FROM scored ORDER BY cn DESC, u ASC, v ASC LIMIT {top}""")


def ktruss_sql(k: int = 4, sweeps: int = 4) -> str:
    """Twin of algorithms/truss.py::ktruss_sweeps on the co-purchase
    graph — unrolled support-peel sweeps (adjacency wedge join per
    sweep); COPURCHASE_CTE's `pairs` IS the canonical u<v edge set."""
    parts = [COPURCHASE_CTE.rstrip(),
             ",\ne0 AS (SELECT u, v FROM pairs)"]
    for s in range(1, sweeps + 1):
        p = f"e{s - 1}"
        parts.append(f""",
adj{s} AS (
  SELECT u AS x, v AS w FROM {p} UNION ALL SELECT v AS x, u AS w FROM {p}
),
sup{s} AS (
  SELECT e.u, e.v, count(*) AS sup
  FROM {p} e
  JOIN adj{s} a ON a.x = e.u
  JOIN adj{s} b ON b.x = e.v AND b.w = a.w
  GROUP BY e.u, e.v
),
e{s} AS (
  SELECT e.u, e.v FROM {p} e
  LEFT JOIN sup{s} s ON s.u = e.u AND s.v = e.v
  WHERE COALESCE(s.sup, 0) >= {k - 2}
)""")
    parts.append(f"\nSELECT u, v FROM e{sweeps}")
    return _materialized("WITH " + "".join(parts))


def modularity_sql(rounds: int = 10) -> str:
    """Twin of algorithms/misc.py::modularity evaluated on the CDLP
    ``rounds``-round labels (cdlp_sql's unrolled CTEs reused) — exact
    integer terms, one float division at output."""
    parts = list(_cdlp_ctes(rounds))
    parts.append(f""",
asn AS (SELECT id, label FROM l{rounds}),
mm AS (SELECT count(*) // 2 AS m, count(*) AS m2 FROM edges),
intra AS (
  SELECT count(*) AS intra2
  FROM edges e JOIN asn a ON a.id = e.src JOIN asn b ON b.id = e.dst
  WHERE a.label = b.label
),
deg AS (SELECT src AS id, count(*) AS d FROM edges GROUP BY src),
dsq AS (
  SELECT CAST(SUM(dc * dc) AS BIGINT) AS deg_sq_sum FROM (
    SELECT a.label, CAST(SUM(d.d) AS BIGINT) AS dc
    FROM deg d JOIN asn a ON a.id = d.id GROUP BY a.label
  )
)
SELECT CAST(mm.m AS BIGINT) AS m, CAST(intra.intra2 AS BIGINT) AS intra2,
       dsq.deg_sq_sum,
       ROUND((2.0 * mm.m * intra.intra2 - dsq.deg_sq_sum)
             / (4.0 * mm.m * mm.m), 6) AS modularity
FROM mm CROSS JOIN intra CROSS JOIN dsq""")
    return _materialized("WITH " + "".join(parts))


def louvain_sql(passes: int = 2, move_rounds: int = 6) -> str:
    """Twin of algorithms/louvain.py::louvain_fixed on the co-purchase
    graph — the fixed-depth recursion unrolled pass-by-pass and
    round-by-round: per round one community-total aggregate, one
    neighbor-community weight aggregate, gain scores
    k_in − k·Σtot′/2m (own community corrected by −k), the
    min-community tie window, and the parity-gated move; per pass the
    mapping composition and the community contraction. All weights stay
    integer-valued doubles (contraction sums of 1.0), so every SUM is
    exact in any order; the single division by 2m runs on identical
    operands in both engines — bit-identical scores, identical moves."""
    parts = [COPURCHASE_CTE.rstrip(), """,
ep0 AS (SELECT src, dst, CAST(1.0 AS DOUBLE) AS w FROM edges),
m2t AS (SELECT CAST(SUM(w) AS DOUBLE) AS v FROM ep0),
map0 AS (SELECT id, id AS comm FROM verts)"""]
    for p in range(passes):
        parts.append(f""",
deg{p} AS (SELECT src AS id, SUM(w) AS k FROM ep{p} GROUP BY src),
c{p}_0 AS (SELECT DISTINCT src AS id, src AS comm FROM ep{p})""")
        for r in range(move_rounds):
            cp = f"c{p}_{r}"
            parts.append(f""",
ct{p}_{r} AS (
  SELECT c.comm, SUM(d.k) AS tot
  FROM {cp} c JOIN deg{p} d ON d.id = c.id GROUP BY c.comm
),
nb{p}_{r} AS (
  SELECT e.src AS id, c.comm AS ncomm, SUM(e.w) AS k_in
  FROM ep{p} e JOIN {cp} c ON c.id = e.dst
  WHERE e.src <> e.dst GROUP BY e.src, c.comm
),
st{p}_{r} AS (
  SELECT c.id, c.comm,
         COALESCE(o.k_in, 0.0)
           - d.k * (ct.tot - d.k) / (SELECT v FROM m2t) AS stay_score
  FROM {cp} c
  JOIN deg{p} d ON d.id = c.id
  JOIN ct{p}_{r} ct ON ct.comm = c.comm
  LEFT JOIN nb{p}_{r} o ON o.id = c.id AND o.ncomm = c.comm
),
sc{p}_{r} AS (
  SELECT n.id, n.ncomm,
         n.k_in - d.k * ctn.tot / (SELECT v FROM m2t) AS score
  FROM nb{p}_{r} n
  JOIN {cp} c ON c.id = n.id AND c.comm <> n.ncomm
  JOIN deg{p} d ON d.id = n.id
  JOIN ct{p}_{r} ctn ON ctn.comm = n.ncomm
),
bs{p}_{r} AS (
  SELECT id, ncomm AS best_comm, score AS best_score FROM (
    SELECT id, ncomm, score,
           row_number() OVER (PARTITION BY id
                              ORDER BY score DESC, ncomm ASC) AS rn
    FROM sc{p}_{r}
  ) WHERE rn = 1
),
c{p}_{r + 1} AS (
  SELECT s.id,
         CASE WHEN b.best_comm IS NOT NULL
               AND b.best_score > s.stay_score + 1e-12
               AND s.id % 2 = {r % 2}
           THEN b.best_comm ELSE s.comm END AS comm
  FROM st{p}_{r} s
  LEFT JOIN bs{p}_{r} b ON b.id = s.id
)""")
        fin = f"c{p}_{move_rounds}"
        parts.append(f""",
map{p + 1} AS (
  SELECT m.id, r.comm AS comm
  FROM map{p} m JOIN {fin} r ON r.id = m.comm
),
ep{p + 1} AS (
  SELECT cs.comm AS src, cd.comm AS dst, SUM(e.w) AS w
  FROM ep{p} e
  JOIN {fin} cs ON cs.id = e.src
  JOIN {fin} cd ON cd.id = e.dst
  GROUP BY cs.comm, cd.comm
)""")
    parts.append(f"""
SELECT v.id, COALESCE(m.comm, v.id) AS comm
FROM verts v LEFT JOIN map{passes} m ON m.id = v.id""")
    return _materialized("WITH " + "".join(parts))


def ppr_batch_sql(n_seeds: int = 4, rounds: int = 10) -> str:
    """Twin of algorithms/ranking.py::ppr_batch — sparse per-seed
    recursion (damping 0.5), seeds = the n_seeds smallest vertex ids.
    Rank carried in BIGINT pico-units exactly like the Spark side: the
    push is one ROUND(0.5 * rank_u / d) double op on integer inputs,
    all sums BIGINT — bit-identical across engines/partitionings."""
    parts = [COPURCHASE_CTE.rstrip(), f""",
seeds AS (SELECT id AS seed FROM verts ORDER BY id LIMIT {n_seeds}),
deg AS (SELECT src AS id, CAST(count(*) AS DOUBLE) AS d
        FROM edges GROUP BY src),
r0 AS (SELECT seed, seed AS id,
              CAST(1000000000000 AS BIGINT) AS rank_u FROM seeds)"""]
    for k in range(1, rounds + 1):
        p = f"r{k-1}"
        parts.append(f""",
m{k} AS (
  SELECT p.seed, e.dst AS id,
         CAST(SUM(CAST(ROUND(0.5 * p.rank_u / d.d, 0) AS BIGINT))
              AS BIGINT) AS v
  FROM {p} p JOIN deg d ON d.id = p.id JOIN edges e ON e.src = p.id
  GROUP BY p.seed, e.dst
),
r{k} AS (
  SELECT seed, id, CAST(SUM(v) AS BIGINT) AS rank_u FROM (
    SELECT seed, id, v FROM m{k}
    UNION ALL
    SELECT seed, seed AS id, CAST(500000000000 AS BIGINT) AS v FROM seeds
  ) u GROUP BY seed, id
)""")
    parts.append(
        f"\nSELECT seed, id,"
        f" ROUND(CAST(rank_u AS DOUBLE) / 1000000000000.0,"
        f" {FLOAT_DECIMALS}) AS rank"
        f" FROM r{rounds}"
    )
    return _materialized("WITH " + "".join(parts))


def ppr_sweep_sql(rounds: int = 10, max_prefix: int = 200) -> str:
    """Twin of algorithms/ranking.py::ppr_sweep from the smallest vertex
    id — ppr_batch_sql's recursion (1 seed) + rank window + integer
    cut/vol cumsums."""
    parts = [COPURCHASE_CTE.rstrip(), """,
seeds AS (SELECT id AS seed FROM verts ORDER BY id LIMIT 1),
degd AS (SELECT src AS id, CAST(count(*) AS DOUBLE) AS d
         FROM edges GROUP BY src),
r0 AS (SELECT seed, seed AS id,
              CAST(1000000000000 AS BIGINT) AS rank_u FROM seeds)"""]
    for k in range(1, rounds + 1):
        p = f"r{k-1}"
        parts.append(f""",
m{k} AS (
  SELECT p.seed, e.dst AS id,
         CAST(SUM(CAST(ROUND(0.5 * p.rank_u / d.d, 0) AS BIGINT))
              AS BIGINT) AS v
  FROM {p} p JOIN degd d ON d.id = p.id JOIN edges e ON e.src = p.id
  GROUP BY p.seed, e.dst
),
r{k} AS (
  SELECT seed, id, CAST(SUM(v) AS BIGINT) AS rank_u FROM (
    SELECT seed, id, v FROM m{k}
    UNION ALL
    SELECT seed, seed AS id, CAST(500000000000 AS BIGINT) AS v FROM seeds
  ) u GROUP BY seed, id
)""")
    parts.append(f""",
pr AS (SELECT id, ROUND(CAST(rank_u AS DOUBLE) / 1000000000000.0,
                        {FLOAT_DECIMALS}) AS rank FROM r{rounds}),
degi AS (SELECT src AS id, count(*) AS d FROM edges GROUP BY src),
ranked AS (
  SELECT p.id, g.d,
         row_number() OVER (ORDER BY p.rank / g.d DESC, p.id) AS k
  FROM pr p JOIN degi g ON g.id = p.id
  QUALIFY k <= {max_prefix}
),
vol AS (
  SELECT CAST(k AS INT) AS k, id,
         CAST(SUM(d) OVER (ORDER BY k
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS vol
  FROM ranked
),
internal_by_m AS (
  SELECT CAST(GREATEST(s.k, t.k) AS INT) AS k, count(*) AS n
  FROM edges e JOIN ranked s ON s.id = e.src JOIN ranked t ON t.id = e.dst
  GROUP BY 1
),
mtot AS (SELECT count(*) AS m2 FROM edges),
sweep AS (
  SELECT v.k, v.id, v.vol,
         CAST(SUM(COALESCE(i.n, 0)) OVER (ORDER BY v.k
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS internal
  FROM vol v LEFT JOIN internal_by_m i ON i.k = v.k
)
SELECT s.k, s.id, s.vol - s.internal AS cut, s.vol,
       ROUND(CAST(s.vol - s.internal AS DOUBLE)
             / LEAST(s.vol, mtot.m2 - s.vol), 6) AS conductance
FROM sweep s CROSS JOIN mtot
WHERE s.vol < mtot.m2""")
    return _materialized("WITH " + "".join(parts))


def strength_sql() -> str:
    """Twin of algorithms/centrality.py::strength_centrality(mode='out')
    on the weighted co-purchase graph (w = (src+dst) % 10 + 1, the
    sssp-gate weighting). The edge table stores both directions, so the
    out-side sum IS each vertex's undirected incident-weight total —
    integer micro-unit sums."""
    return _materialized(f"""WITH {COPURCHASE_CTE.rstrip()},
we AS (
  SELECT src,
         CAST(ROUND(CAST((src + dst) % 10 + 1 AS DOUBLE) * 1000000.0, 0)
              AS BIGINT) AS w_u
  FROM edges
)
SELECT src AS id,
       ROUND(CAST(SUM(w_u) AS DOUBLE) / 1000000.0, 6) AS strength
FROM we GROUP BY src""")
