"""DuckDB SQL twins for the FLASH matching / measurement / ordering
families (algorithms/matching.py, measurement.py, cores.py, coloring.py).

All of these are deterministic frontier-shrinking fixpoints: every round is
a fixed join/groupBy dataflow and the fixpoint is idempotent (a round on an
empty frontier is a no-op), so a generous FIXED unroll of rounds IS the
fixpoint — the same argument tpch_graphs.kcore_sql already relies on. Round
budgets are sized to the sf0.01 gate graph (measured convergence counts in
the docstrings) with ~2× margin; an insufficient budget surfaces as a hash
mismatch at the gate, never silently.

All run on the co-purchase graph (tpch_graphs.COPURCHASE_CTE: symmetric,
self-loop-free edges), mirroring the Spark gate queries.
"""

from __future__ import annotations

from graphscope_spark.functions.hashing import hash64_sql
from graphscope_spark.tpch_graphs import COPURCHASE_CTE, _materialized

#: struct (cnt, id) encoded as one BIGINT: cnt*ENC + id. Lexicographic
#: (cnt, id) order == numeric order while id < ENC (part keys ≪ 1e9).
_ENC = 1_000_000_000


def mis_sql(rounds: int = 8) -> str:
    """Greedy MIS, priority r = deg·n + id, local minima join each round
    (matching.py::mis / flash mis.h:43-85). sf0.01 converges in 3 rounds."""
    parts = [COPURCHASE_CTE.rstrip(), """,
nv AS (SELECT count(*) AS n FROM verts),
degm AS (SELECT src AS id, count(*) AS d FROM edges GROUP BY src),
act0 AS (
  SELECT v.id, COALESCE(d.d, 0) * (SELECT n FROM nv) + v.id AS r
  FROM verts v LEFT JOIN degm d ON v.id = d.id
)"""]
    for k in range(1, rounds + 1):
        p = f"act{k-1}"
        parts.append(f""",
sel{k} AS (
  SELECT a.id FROM {p} a
  LEFT JOIN (
    SELECT e.dst AS id, MIN(s.r) AS nm
    FROM edges e JOIN {p} s ON e.src = s.id JOIN {p} t ON e.dst = t.id
    GROUP BY e.dst
  ) nb ON a.id = nb.id
  WHERE nb.nm IS NULL OR a.r < nb.nm
),
act{k} AS (
  SELECT a.id, a.r FROM {p} a
  WHERE NOT EXISTS (SELECT 1 FROM sel{k} s WHERE s.id = a.id)
    AND NOT EXISTS (SELECT 1 FROM edges e JOIN sel{k} s ON e.src = s.id
                    WHERE e.dst = a.id)
)""")
    chosen = "\nUNION ALL ".join(f"SELECT id FROM sel{k}" for k in range(1, rounds + 1))
    parts.append(f""",
chosen AS (
{chosen}
)
SELECT v.id, (c.id IS NOT NULL) AS in_mis
FROM verts v LEFT JOIN chosen c ON v.id = c.id ORDER BY v.id""")
    return _materialized("WITH " + "".join(parts))


def mm_sql(rounds: int = 14) -> str:
    """Maximal matching via mutual max-id proposals (matching.py::
    maximal_matching / mm.h:44-80). sf0.01 converges in 7 rounds."""
    parts = [COPURCHASE_CTE.rstrip(), ",\nact0 AS (SELECT id FROM verts)"]
    for k in range(1, rounds + 1):
        p = f"act{k-1}"
        parts.append(f""",
prop{k} AS (
  SELECT e.dst AS id, MAX(e.src) AS p
  FROM edges e JOIN {p} a ON e.src = a.id JOIN {p} b ON e.dst = b.id
  GROUP BY e.dst
),
mut{k} AS (
  SELECT p1.id, p1.p AS mate
  FROM prop{k} p1 JOIN prop{k} p2 ON p1.p = p2.id
  WHERE p2.p = p1.id
),
act{k} AS (
  SELECT a.id FROM {p} a
  WHERE NOT EXISTS (SELECT 1 FROM mut{k} m WHERE m.id = a.id)
)""")
    muts = "\nUNION ALL ".join(f"SELECT id, mate FROM mut{k}" for k in range(1, rounds + 1))
    parts.append(f"\nSELECT id, mate FROM (\n{muts}\n) u ORDER BY id")
    return _materialized("WITH " + "".join(parts))


def mvc_sql(p1_rounds: int = 14, p2_rounds: int = 6) -> str:
    """Greedy vertex cover: degree-threshold halving (threshold at round k
    = max(n >> k, 1) — floor-halving composes) then redundancy refinement
    dropping (removable, not-blocked) vertices (matching.py::
    min_vertex_cover / min-cover.h:41-105). sf0.01: 10 + 3 rounds."""
    parts = [COPURCHASE_CTE.rstrip(), """,
nv AS (SELECT count(*) AS n FROM verts),
liv0 AS (SELECT src AS id, count(*) AS d FROM edges GROUP BY src)"""]
    for k in range(1, p1_rounds + 1):
        p = f"liv{k-1}"
        parts.append(f""",
bat{k} AS (
  SELECT id FROM {p}
  WHERE d >= GREATEST((SELECT n FROM nv) // {2 ** k}, 1)
),
liv{k} AS (
  SELECT id, d FROM (
    SELECT l.id, l.d - COALESCE(ci.c, 0) AS d
    FROM {p} l
    LEFT JOIN (
      SELECT e.dst AS id, count(*) AS c
      FROM edges e JOIN bat{k} b ON e.src = b.id GROUP BY e.dst
    ) ci ON l.id = ci.id
    WHERE NOT EXISTS (SELECT 1 FROM bat{k} b WHERE b.id = l.id)
  ) t WHERE d > 0
)""")
    bats = "\nUNION ".join(f"SELECT id FROM bat{k}" for k in range(1, p1_rounds + 1))
    parts.append(f""",
cov0 AS (
{bats}
)""")
    for j in range(1, p2_rounds + 1):
        c = f"cov{j-1}"
        parts.append(f""",
rem{j} AS (
  SELECT id FROM {c} cv
  WHERE NOT EXISTS (
    SELECT 1 FROM edges e
    WHERE e.src = cv.id
      AND NOT EXISTS (SELECT 1 FROM {c} c2 WHERE c2.id = e.dst)
  )
),
blk{j} AS (
  SELECT DISTINCT e.dst AS id
  FROM edges e JOIN rem{j} r ON e.src = r.id
  WHERE e.src > e.dst
),
cov{j} AS (
  SELECT id FROM {c} cv
  WHERE NOT EXISTS (
    SELECT 1 FROM rem{j} r
    WHERE r.id = cv.id
      AND NOT EXISTS (SELECT 1 FROM blk{j} b WHERE b.id = cv.id)
  )
)""")
    parts.append(f"\nSELECT id FROM cov{p2_rounds} ORDER BY id")
    return _materialized("WITH " + "".join(parts))


def mec_sql(rounds: int = 10) -> str:
    """Edge cover: maximal matching under min-(deg, id) proposals, plus a
    pendant edge from every uncovered non-isolated vertex to its
    min-(deg, id) neighbor (matching.py::min_edge_cover /
    min-edge-cover.h:42-93). sf0.01 matching converges in 5 rounds."""
    parts = [COPURCHASE_CTE.rstrip(), """,
degm AS (SELECT src AS id, count(*) AS d FROM edges GROUP BY src),
act0 AS (SELECT id FROM verts)"""]
    for k in range(1, rounds + 1):
        p = f"act{k-1}"
        parts.append(f""",
prop{k} AS (
  SELECT id, p FROM (
    SELECT e.dst AS id, e.src AS p,
           ROW_NUMBER() OVER (PARTITION BY e.dst ORDER BY d.d, e.src) AS rn
    FROM edges e
    JOIN {p} a ON e.src = a.id JOIN {p} b ON e.dst = b.id
    JOIN degm d ON e.src = d.id
  ) t WHERE rn = 1
),
mut{k} AS (
  SELECT p1.id, p1.p AS mate
  FROM prop{k} p1 JOIN prop{k} p2 ON p1.p = p2.id
  WHERE p2.p = p1.id
),
act{k} AS (
  SELECT a.id FROM {p} a
  WHERE NOT EXISTS (SELECT 1 FROM mut{k} m WHERE m.id = a.id)
)""")
    muts = "\nUNION ALL ".join(f"SELECT id, mate FROM mut{k}" for k in range(1, rounds + 1))
    parts.append(f""",
matched AS (
{muts}
),
pend AS (
  SELECT LEAST(t.id, t.p) AS src, GREATEST(t.id, t.p) AS dst FROM (
    SELECT e.dst AS id, e.src AS p,
           ROW_NUMBER() OVER (PARTITION BY e.dst ORDER BY d.d, e.src) AS rn
    FROM edges e JOIN degm d ON e.src = d.id
    WHERE NOT EXISTS (SELECT 1 FROM matched m WHERE m.id = e.dst)
  ) t WHERE t.rn = 1
)
SELECT DISTINCT src, dst FROM (
  SELECT id AS src, mate AS dst FROM matched WHERE id < mate
  UNION ALL SELECT src, dst FROM pend
) u ORDER BY src, dst""")
    return _materialized("WITH " + "".join(parts))


def _msbfs_from(src_cte: str, rounds: int, pfx: str) -> str:
    """Unrolled multi-source BFS seeded from a computed source CTE —
    the per-sweep building block for diameter_approx / k_center (same
    relaxation as tpch_graphs._msbfs_cte)."""
    parts = [f",\n{pfx}0 AS (SELECT id AS src, id, 0 AS dist FROM {src_cte})"]
    for k in range(1, rounds + 1):
        p = f"{pfx}{k-1}"
        parts.append(f""",
{pfx}{k} AS (
  SELECT src, id, MIN(dist) AS dist FROM (
    SELECT src, id, dist FROM {p}
    UNION ALL
    SELECT p.src, e.dst AS id, p.dist + 1 AS dist
    FROM edges e JOIN {p} p ON e.src = p.id
  ) u GROUP BY src, id
)""")
    return "".join(parts)


def diameter_sql(k: int = 8, seed: int = 42, rounds: int = 40) -> str:
    """Double-sweep diameter/radius approximation (measurement.py::
    diameter_approx / flash/measurement/diameter-approx.h:43-108): BFS from
    k portable-hash-pseudo-random sources, then from the k largest-ecc
    vertices; ecc accumulates across sweeps. 40 unrolled rounds ≫ the
    sf0.01 eccentricities (≤ ~20)."""
    h = hash64_sql(f"CAST(id AS VARCHAR) || ':{seed}'")
    parts = [COPURCHASE_CTE.rstrip(), f""",
src1 AS (SELECT id FROM verts ORDER BY {h}, id LIMIT {k})""",
             _msbfs_from("src1", rounds, "b"), f""",
ecc1 AS (SELECT id, MAX(dist) AS ecc FROM b{rounds} GROUP BY id),
src2 AS (SELECT id FROM ecc1 ORDER BY ecc DESC, id DESC LIMIT {k})""",
             _msbfs_from("src2", rounds, "c"), f""",
eccs AS (
  SELECT id, MAX(ecc) AS ecc FROM (
    SELECT id, ecc FROM ecc1
    UNION ALL SELECT id, MAX(dist) AS ecc FROM c{rounds} GROUP BY id
  ) u GROUP BY id
)
SELECT CAST(MAX(ecc) AS INTEGER) AS diameter,
       CAST(MIN(CASE WHEN ecc > 0 THEN ecc END) AS INTEGER) AS radius
FROM eccs"""]
    return _materialized("WITH " + "".join(parts))


def k_center_sql(k: int = 4, rounds: int = 40) -> str:
    """Greedy farthest-point k-center (measurement.py::k_center /
    flash/measurement/k-center.h:41-77): start at the max-(degree, id)
    vertex, then k−1 times BFS from the farthest vertex (ties → larger id)
    and relax. dis = 2^31−1 for vertices unreachable from every center."""
    inf = (1 << 31) - 1
    parts = [COPURCHASE_CTE.rstrip(), """,
degs AS (
  SELECT v.id, COALESCE(od.c, 0) + COALESCE(idg.c, 0) AS d
  FROM verts v
  LEFT JOIN (SELECT src AS id, count(*) AS c FROM edges GROUP BY src) od
    ON v.id = od.id
  LEFT JOIN (SELECT dst AS id, count(*) AS c FROM edges GROUP BY dst) idg
    ON v.id = idg.id
),
ctr1 AS (SELECT id FROM degs ORDER BY d DESC, id DESC LIMIT 1)""",
             _msbfs_from("ctr1", rounds, "e1_"), f""",
dis1 AS (
  SELECT v.id, COALESCE(m.nd, {inf}) AS dis
  FROM verts v
  LEFT JOIN (SELECT id, MIN(dist) AS nd FROM e1_{rounds} GROUP BY id) m
    ON v.id = m.id
)"""]
    for j in range(2, k + 1):
        parts.append(f""",
ctr{j} AS (SELECT id FROM dis{j-1} ORDER BY dis DESC, id DESC LIMIT 1)""")
        parts.append(_msbfs_from(f"ctr{j}", rounds, f"e{j}_"))
        parts.append(f""",
dis{j} AS (
  SELECT d.id, LEAST(d.dis, COALESCE(m.nd, {inf})) AS dis
  FROM dis{j-1} d
  LEFT JOIN (SELECT id, MIN(dist) AS nd FROM e{j}_{rounds} GROUP BY id) m
    ON d.id = m.id
)""")
    parts.append(f"\nSELECT id, dis FROM dis{k} ORDER BY id")
    return _materialized("WITH " + "".join(parts))


def msf_sql(phases: int = 7, label_rounds: int = 14) -> str:
    """Minimum spanning forest (measurement.py::msf, Borůvka re-expression
    of flash/measurement/msf.h): per phase each component picks its
    min-(w, u, v) crossing edge; chosen clusters contract to their min
    component label via unrolled min-label propagation (cluster diameters
    ≤ 8 at sf0.01, 5 phases — measured). With the composite (w, u, v) key
    totally ordering the edges, the forest is the UNIQUE minimum forest of
    the keyed graph, so the contraction schedule (full-cluster here,
    hook-tree pointer doubling in Spark) cannot change the edge set.
    Weights mirror the gate query: w = (src*7 + dst) % 97 + 1 per directed
    row, canonical (u, v) keeps the min."""
    parts = [COPURCHASE_CTE.rstrip(), """,
canon AS (
  SELECT LEAST(src, dst) AS u, GREATEST(src, dst) AS v,
         MIN(CAST((src*7 + dst) % 97 + 1 AS DOUBLE)) AS w
  FROM edges GROUP BY 1, 2
),
cp0 AS (SELECT id, id AS comp FROM verts)"""]
    for p in range(1, phases + 1):
        parts.append(f""",
ce{p} AS (
  SELECT c.u, c.v, c.w, a.comp AS cu, b.comp AS cv
  FROM canon c
  JOIN cp{p-1} a ON c.u = a.id JOIN cp{p-1} b ON c.v = b.id
  WHERE a.comp <> b.comp
),
ch{p} AS (
  SELECT DISTINCT u, v, w FROM (
    SELECT u, v, w,
           ROW_NUMBER() OVER (PARTITION BY c ORDER BY w, u, v) AS rn
    FROM (
      SELECT cu AS c, u, v, w FROM ce{p}
      UNION ALL SELECT cv AS c, u, v, w FROM ce{p}
    ) t
  ) s WHERE rn = 1
),
cgs{p} AS (
  SELECT x, y FROM (
    SELECT a.comp AS x, b.comp AS y
    FROM ch{p} ch JOIN cp{p-1} a ON ch.u = a.id JOIN cp{p-1} b ON ch.v = b.id
  ) g
  UNION SELECT y, x FROM (
    SELECT a.comp AS x, b.comp AS y
    FROM ch{p} ch JOIN cp{p-1} a ON ch.u = a.id JOIN cp{p-1} b ON ch.v = b.id
  ) g2
),
lb{p}_0 AS (SELECT DISTINCT comp AS c, comp AS l FROM cp{p-1})""")
        for i in range(1, label_rounds + 1):
            parts.append(f""",
lb{p}_{i} AS (
  SELECT c, MIN(l) AS l FROM (
    SELECT c, l FROM lb{p}_{i-1}
    UNION ALL
    SELECT g.x AS c, l1.l FROM cgs{p} g JOIN lb{p}_{i-1} l1 ON g.y = l1.c
  ) t GROUP BY c
)""")
        parts.append(f""",
cp{p} AS (
  SELECT cm.id, lb.l AS comp
  FROM cp{p-1} cm JOIN lb{p}_{label_rounds} lb ON cm.comp = lb.c
)""")
    un = "\nUNION ".join(f"SELECT u, v, w FROM ch{p}" for p in range(1, phases + 1))
    parts.append(f""",
forest AS (
{un}
)
SELECT u AS src, v AS dst, w AS weight FROM forest ORDER BY src, dst""")
    return _materialized("WITH " + "".join(parts))


def _onion_chain(rounds: int) -> list[str]:
    """Shared unroll of the min-degree wavefront peel (cores.py::
    onion_layers / kshell): per round, surviving degrees, the peel level
    k_r = max(k_{r-1}, min surviving degree), peel d ≤ k_r. Produces CTEs
    al{r} (alive), pl{r} (peeled: id, layer=r, core=k) and scalar kk{r}."""
    parts = [""",
al0 AS (SELECT id FROM verts),
kk0 AS (SELECT 0 AS k)"""]
    for r in range(1, rounds + 1):
        parts.append(f""",
dg{r} AS (
  SELECT a.id, COALESCE(d.c, 0) AS d
  FROM al{r-1} a
  LEFT JOIN (
    SELECT e.src AS id, count(*) AS c
    FROM edges e
    JOIN al{r-1} s ON e.src = s.id JOIN al{r-1} t ON e.dst = t.id
    GROUP BY e.src
  ) d ON a.id = d.id
),
kk{r} AS (
  SELECT GREATEST((SELECT k FROM kk{r-1}),
                  COALESCE((SELECT MIN(d) FROM dg{r}),
                           (SELECT k FROM kk{r-1}))) AS k
),
pl{r} AS (
  SELECT id, {r} AS layer, (SELECT k FROM kk{r}) AS core
  FROM dg{r} WHERE d <= (SELECT k FROM kk{r})
),
al{r} AS (
  SELECT id FROM dg{r} WHERE d > (SELECT k FROM kk{r})
)""")
    return parts


def onion_sql(rounds: int = 32) -> str:
    """Onion-layer decomposition (cores.py::onion_layers /
    flash/core/onion-layer-ordering.h:44-100): layer = removal wave, core =
    peel level at removal. sf0.01 completes in 26 waves."""
    parts = [COPURCHASE_CTE.rstrip()] + _onion_chain(rounds)
    un = "\nUNION ALL ".join(
        f"SELECT id, layer, core FROM pl{r}" for r in range(1, rounds + 1)
    )
    parts.append(f"\nSELECT id, layer, core FROM (\n{un}\n) u ORDER BY id")
    return _materialized("WITH " + "".join(parts))


def degeneracy_sql(rounds: int = 32, peel_rounds: int = 6) -> str:
    """Degeneracy ordering (cores.py::degeneracy_ordering /
    flash/core/degeneracy-ordering.h:44-100): dg = degeneracy (final peel
    level of the onion chain), then repeatedly remove every vertex with
    residual degree ≤ dg; rank = removal round (0-based). sf0.01: dg=5,
    2 waves."""
    parts = [COPURCHASE_CTE.rstrip()] + _onion_chain(rounds)
    parts.append(f""",
dgv AS (SELECT (SELECT k FROM kk{rounds}) AS dg),
pa0 AS (SELECT id FROM verts)""")
    for r in range(1, peel_rounds + 1):
        parts.append(f""",
pd{r} AS (
  SELECT a.id, COALESCE(d.c, 0) AS d
  FROM pa{r-1} a
  LEFT JOIN (
    SELECT e.src AS id, count(*) AS c
    FROM edges e
    JOIN pa{r-1} s ON e.src = s.id JOIN pa{r-1} t ON e.dst = t.id
    GROUP BY e.src
  ) d ON a.id = d.id
),
pr{r} AS (
  SELECT id, {r - 1} AS rank FROM pd{r}
  WHERE d <= (SELECT dg FROM dgv)
),
pa{r} AS (
  SELECT id FROM pd{r} WHERE d > (SELECT dg FROM dgv)
)""")
    un = "\nUNION ALL ".join(
        f"SELECT id, rank FROM pr{r}" for r in range(1, peel_rounds + 1)
    )
    parts.append(f"\nSELECT id, rank FROM (\n{un}\n) u ORDER BY id")
    return _materialized("WITH " + "".join(parts))


def densest_sql(rounds: int = 32) -> str:
    """Charikar 2-approx densest subgraph (subgraph.py::
    densest_subgraph_2approx): the max-core subgraph. Reuses the onion
    peel chain — a peeled vertex's ``core`` IS its shell index, so
    keep = vertices whose core equals the final peel level."""
    parts = [COPURCHASE_CTE.rstrip()] + _onion_chain(rounds)
    un = "\nUNION ALL ".join(
        f"SELECT id, core FROM pl{r}" for r in range(1, rounds + 1)
    )
    parts.append(f""",
shellv AS (
{un}
),
keep AS (SELECT id FROM shellv WHERE core = (SELECT k FROM kk{rounds})),
canon AS (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM edges WHERE src <> dst
),
sub AS (
  SELECT c.u, c.v FROM canon c
  JOIN keep a ON c.u = a.id JOIN keep b ON c.v = b.id
)
SELECT CAST((SELECT count(*) FROM sub) AS DOUBLE)
         / (SELECT count(*) FROM keep) AS density,
       (SELECT count(*) FROM keep) AS vertices,
       (SELECT count(*) FROM sub) AS edges""")
    return _materialized("WITH " + "".join(parts))


def color_sql(rounds: int = 12) -> str:
    """Jones–Plassmann greedy coloring fixpoint (coloring.py::color /
    flash/clustering/color.h:43-86): each round every vertex takes the mex
    of its higher-(deg, id)-priority neighbors' current colors. The mex is
    computed relationally: min candidate from {0} ∪ {c+1 : c forbidden}
    not itself forbidden. sf0.01 reaches the fixpoint in 8 rounds."""
    parts = [COPURCHASE_CTE.rstrip(), """,
degm AS (SELECT src AS id, count(*) AS d FROM edges GROUP BY src),
down AS (
  SELECT e.src, e.dst
  FROM edges e
  JOIN degm ds ON e.src = ds.id JOIN degm dd ON e.dst = dd.id
  WHERE ds.d > dd.d OR (ds.d = dd.d AND e.src > e.dst)
),
col0 AS (SELECT id, 0 AS color FROM verts)"""]
    for r in range(1, rounds + 1):
        parts.append(f""",
fb{r} AS (
  SELECT DISTINCT d.dst AS id, c.color AS c
  FROM down d JOIN col{r-1} c ON d.src = c.id
),
mex{r} AS (
  SELECT id, MIN(cand) AS mex FROM (
    SELECT id, 0 AS cand FROM verts
    UNION ALL SELECT id, c + 1 FROM fb{r}
  ) t
  WHERE NOT EXISTS (SELECT 1 FROM fb{r} f WHERE f.id = t.id AND f.c = t.cand)
  GROUP BY id
),
col{r} AS (
  SELECT v.id, COALESCE(m.mex, 0) AS color
  FROM verts v LEFT JOIN mex{r} m ON v.id = m.id
)""")
    parts.append(f"\nSELECT id, color FROM col{rounds} ORDER BY id")
    return _materialized("WITH " + "".join(parts))


def mds_sql(rounds: int = 12) -> str:
    """Greedy dominating set: undecided 2-hop (cnt, id)-maxima join each
    round, cnt = undominated-neighbor count recomputed on the shrunk set
    (matching.py::min_dominating_set / min-dominating-set.h:45-97).
    (cnt, id) is encoded as cnt*1e9 + id (order-preserving for these ids).
    sf0.01 converges in 6 rounds."""
    parts = [COPURCHASE_CTE.rstrip(), """,
und0 AS (
  SELECT v.id, COALESCE(d.c, 0) AS cnt
  FROM verts v
  LEFT JOIN (SELECT src AS id, count(*) AS c FROM edges GROUP BY src) d
    ON v.id = d.id
)"""]
    for k in range(1, rounds + 1):
        u = f"und{k-1}"
        hops = [f"m0_{k} AS (SELECT id, cnt * {_ENC} + id AS m FROM {u})"]
        for h in (1, 2):
            prev = f"m{h-1}_{k}"
            hops.append(f"""m{h}_{k} AS (
  SELECT c.id, GREATEST(c.m, COALESCE(nb.nm, c.m)) AS m
  FROM {prev} c
  LEFT JOIN (
    SELECT e.dst AS id, MAX(s.m) AS nm
    FROM edges e JOIN {prev} s ON e.src = s.id
    JOIN {u} t ON e.dst = t.id
    GROUP BY e.dst
  ) nb ON c.id = nb.id
)""")
        parts.append(",\n" + ",\n".join(hops))
        parts.append(f""",
sel{k} AS (
  SELECT u.id FROM {u} u JOIN m2_{k} m ON u.id = m.id
  WHERE m.m = u.cnt * {_ENC} + u.id
),
rem{k} AS (
  SELECT u.id FROM {u} u
  WHERE NOT EXISTS (SELECT 1 FROM sel{k} s WHERE s.id = u.id)
    AND NOT EXISTS (SELECT 1 FROM edges e JOIN sel{k} s ON e.src = s.id
                    WHERE e.dst = u.id)
),
und{k} AS (
  SELECT r.id, COALESCE(nc.c, 0) AS cnt
  FROM rem{k} r
  LEFT JOIN (
    SELECT e.dst AS id, count(*) AS c
    FROM edges e JOIN rem{k} a ON e.src = a.id JOIN rem{k} b ON e.dst = b.id
    GROUP BY e.dst
  ) nc ON r.id = nc.id
)""")
    sels = "\nUNION ".join(f"SELECT id FROM sel{k}" for k in range(1, rounds + 1))
    parts.append(f"\nSELECT id FROM (\n{sels}\n) u ORDER BY id")
    return _materialized("WITH " + "".join(parts))


# ---------------------------------------------------------------------- #
# Biconnectivity (bcc.h / bridge.h / cut-point.h)
# ---------------------------------------------------------------------- #

#: canonical undirected-edge key: least(u,v)*_EKEY + greatest(u,v).
#: Part keys at every gate SF are ≪ 2^21, so the key fits in 2^42.
_EKEY = 1 << 21


def _bcc_block_ctes(wcc_rounds: int = 24, bfs_rounds: int = 20,
                    closure_rounds: int = 48) -> str:
    """CTE chain ending in ``ek(u, v, key)`` (canonical undirected edges)
    and ``blocks(key, lab)`` — biconnected-component label per edge, with
    ``lab`` = MIN canonical edge key over the block.

    The partition is computed forest-independently of the Spark engine
    (biconnectivity.py uses Tarjan–Vishkin over a BFS forest): biconnected
    components are the transitive closure of "lie on a common fundamental
    cycle w.r.t. ANY spanning tree" (the classical parallel-BCC
    characterization Tarjan–Vishkin itself builds on), so this twin grows
    its own deterministic forest — per-component root = min vertex id,
    BFS levels, parent = min neighbor one level up — derives one
    fundamental cycle per non-tree edge via ancestor chains + LCA level,
    stars each cycle's tree edges to the non-tree edge's key, and closes
    with unrolled min-label rounds. Tree edges on no cycle stay singleton
    blocks (the bridges). Round budgets follow the module-docstring
    convention: generous fixed unrolls ARE the fixpoint; shortfall
    surfaces as a gate hash mismatch, never silently."""
    parts = [COPURCHASE_CTE.rstrip()]
    # components via unrolled min-label (converges to comp = min id)
    parts.append(",\nl0 AS (SELECT id, id AS comp FROM verts)")
    for k in range(1, wcc_rounds + 1):
        p = f"l{k-1}"
        parts.append(f""",
l{k} AS (
  SELECT l.id, LEAST(l.comp, COALESCE(m.c, l.comp)) AS comp
  FROM {p} l LEFT JOIN (
    SELECT e.dst AS id, MIN(p.comp) AS c
    FROM edges e JOIN {p} p ON e.src = p.id GROUP BY e.dst
  ) m ON l.id = m.id
)""")
    # BFS levels from per-component min-id roots
    parts.append(f""",
b0 AS (SELECT DISTINCT comp AS id, 0 AS lvl FROM l{wcc_rounds})""")
    for k in range(1, bfs_rounds + 1):
        parts.append(f""",
b{k} AS (
  SELECT id, lvl FROM b{k-1}
  UNION ALL
  SELECT dst AS id, {k} AS lvl FROM (
    SELECT DISTINCT e.dst
    FROM edges e JOIN b{k-1} f ON e.src = f.id AND f.lvl = {k-1}
    WHERE e.dst NOT IN (SELECT id FROM b{k-1})
  )
)""")
    parts.append(f""",
lv AS (SELECT id, lvl FROM b{bfs_rounds}),
par AS (
  SELECT c.id, MIN(e.src) AS parent
  FROM lv c JOIN edges e ON e.dst = c.id
  JOIN lv p ON p.id = e.src AND p.lvl = c.lvl - 1
  GROUP BY c.id
)""")
    # ancestor chains (v, anc) incl. self, annotated with anc's level
    parts.append(",\na0 AS (SELECT id AS v, id AS anc FROM verts)")
    for k in range(1, bfs_rounds + 1):
        parts.append(f""",
a{k} AS (SELECT a.v, p.parent AS anc FROM a{k-1} a JOIN par p ON p.id = a.anc)""")
    anc_union = "\n  UNION ALL ".join(
        f"SELECT v, anc FROM a{k}" for k in range(bfs_rounds + 1))
    parts.append(f""",
anc AS ({anc_union}),
ancl AS (SELECT anc.v, anc.anc, lv.lvl AS alvl FROM anc JOIN lv ON lv.id = anc.anc),
ek AS (SELECT src AS u, dst AS v, src * {_EKEY} + dst AS key
       FROM edges WHERE src < dst),
nte AS (
  SELECT e.u, e.v, e.key FROM ek e
  WHERE NOT EXISTS (SELECT 1 FROM par t
                    WHERE (t.parent = e.u AND t.id = e.v)
                       OR (t.parent = e.v AND t.id = e.u))
),
lca AS (
  SELECT n.key AS cyc, n.u, n.v, MAX(x.alvl) AS llvl
  FROM nte n
  JOIN ancl x ON x.v = n.u
  JOIN ancl y ON y.v = n.v AND y.anc = x.anc
  GROUP BY n.key, n.u, n.v
),
members AS (
  SELECT c.cyc,
         LEAST(x.anc, p.parent) * {_EKEY} + GREATEST(x.anc, p.parent) AS mkey
  FROM lca c
  JOIN ancl x ON (x.v = c.u OR x.v = c.v) AND x.alvl > c.llvl
  JOIN par p ON p.id = x.anc
),
links AS (
  SELECT cyc AS a, mkey AS b FROM members WHERE cyc <> mkey
  UNION
  SELECT mkey AS a, cyc AS b FROM members WHERE cyc <> mkey
),
c0 AS (SELECT key, key AS lab FROM ek)""")
    for k in range(1, closure_rounds + 1):
        p = f"c{k-1}"
        parts.append(f""",
c{k} AS (
  SELECT c.key, LEAST(c.lab, COALESCE(m.l, c.lab)) AS lab
  FROM {p} c LEFT JOIN (
    SELECT l.b AS key, MIN(p.lab) AS l
    FROM links l JOIN {p} p ON l.a = p.key GROUP BY l.b
  ) m ON c.key = m.key
)""")
    parts.append(f""",
blocks AS (SELECT key, lab FROM c{closure_rounds})""")
    return "".join(parts)


def bcc_sql(**kw) -> str:
    """Twin of biconnectivity.bcc_canonical: (src, dst, block) per
    undirected edge (src < dst), block = min canonical edge key."""
    _sql = f"""WITH {_bcc_block_ctes(**kw)}
SELECT e.u AS src, e.v AS dst, b.lab AS block
FROM ek e JOIN blocks b ON e.key = b.key
ORDER BY src, dst"""
    return _materialized(_sql)


def bridges_sql(**kw) -> str:
    """Twin of biconnectivity.bridges: edges in single-edge blocks."""
    _sql = f"""WITH {_bcc_block_ctes(**kw)},
single AS (SELECT lab FROM blocks GROUP BY lab HAVING count(*) = 1)
SELECT e.u AS src, e.v AS dst
FROM ek e JOIN blocks b ON e.key = b.key
WHERE b.lab IN (SELECT lab FROM single)
ORDER BY src, dst"""
    return _materialized(_sql)


def articulation_points_sql(**kw) -> str:
    """Twin of biconnectivity.articulation_points: vertices incident to
    >= 2 distinct blocks."""
    _sql = f"""WITH {_bcc_block_ctes(**kw)},
inc AS (
  SELECT e.u AS id, b.lab FROM ek e JOIN blocks b ON e.key = b.key
  UNION
  SELECT e.v AS id, b.lab FROM ek e JOIN blocks b ON e.key = b.key
)
SELECT id FROM inc GROUP BY id HAVING count(DISTINCT lab) >= 2
ORDER BY id"""
    return _materialized(_sql)
