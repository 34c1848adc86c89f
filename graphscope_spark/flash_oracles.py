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
