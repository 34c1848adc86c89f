"""DuckDB SQL twins for the north-star corpus path (corpus.py).

``synthesize_repos`` is pure deterministic column arithmetic (spark.range +
printf/sha2/concat_ws) and ``extract_imports`` is a per-language regex — both
are expressible in ANSI-ish SQL, so the whole pipeline
synthesize → sha256 invariant → regex edge extraction → fixed-round PageRank
gets a value-hash oracle instead of the round-1 rows-only check.

Every expression below mirrors corpus.py line-for-line in semantics (NOT in
code): integer division is `//` because DuckDB's CAST(double AS BIGINT)
rounds while Spark's cast truncates; regex multiline is the inline `(?m)`
flag because DuckDB's options argument does not accept `m`; concat_ws skips
NULLs in both engines (verified), which is what drops suppressed import
lines.

The gate runs at a FIXED corpus scale (GATE_N_REPOS × GATE_FILES — the
sf0.01 scale) so the oracle text is sf-independent; scale behaviour is
covered by pytest (tests/test_corpus.py) and the bench/scaling harness.
"""

from __future__ import annotations

import re

FLOAT_DECIMALS = 8


def _materialized(sql: str) -> str:
    """Force CTE materialization (same rationale as tpch_graphs._materialized):
    DuckDB inlines CTEs, and the unrolled PageRank rounds each reference the
    previous round twice — inlining expands the whole synthesize+regex chain
    2^rounds times."""
    return re.sub(r"(\w+) AS \(", r"\1 AS MATERIALIZED (", sql)

#: gate-scale corpus (matches the round-1 sf0.01 sizing of __spark_entry__)
GATE_N_REPOS = 60
GATE_FILES = 12
SEED = 42
N_ORGS = 20

#: per-language import regex — identical to corpus.IMPORT_RE with the
#: multiline flag inlined (RE2 `(?m)` == pandas re.M, verified equivalent
#: on this grammar).
_SQL_IMPORT_RE = {
    "python": r"(?m)^import\s+([A-Za-z_][\w]*)\s*$",
    "java": r"(?m)^import\s+([A-Za-z_][\w]*)\.Main;",
    "go": r'(?m)^import\s+"([A-Za-z_][\w]*)"',
    "rust": r"(?m)^use\s+([A-Za-z_][\w]*)::lib;",
    "js": r"(?m)require\('([A-Za-z_][\w]*)'\)",
}


def _lang_expr(ri: str, fi: str, seed: int) -> str:
    """CASE mirror of element_at(lang_arr, (ri*31+fi*7+seed)%5 + 1)."""
    return (
        f"CASE ({ri}*31 + {fi}*7 + {seed}) % 5 "
        "WHEN 0 THEN 'python' WHEN 1 THEN 'java' WHEN 2 THEN 'go' "
        "WHEN 3 THEN 'rust' ELSE 'js' END"
    )


def _import_line(target: str, n_orgs: int) -> str:
    """Mirror of corpus.synthesize_repos::import_line: NULL-propagating
    per-language import statement for a target repo index expression."""
    mod = f"printf('org%d_repo%d', ({target}) % {n_orgs}, ({target}))"
    return f"""CASE WHEN ({target}) IS NULL THEN NULL ELSE
      CASE lang
        WHEN 'python' THEN printf('import %s', {mod})
        WHEN 'java' THEN printf('import %s.Main;', {mod})
        WHEN 'go' THEN printf('import "%s"', {mod})
        WHEN 'rust' THEN printf('use %s::lib;', {mod})
        ELSE printf('const m = require(''%s'');', {mod})
      END END"""


def repos_cte(
    n_repos: int = GATE_N_REPOS,
    files_per_repo: int = GATE_FILES,
    n_orgs: int = N_ORGS,
    seed: int = SEED,
) -> str:
    """CTE chain ending in ``repos(repo, path, commit, lang, content)`` —
    the DuckDB twin of corpus.synthesize_repos (same blocks / hub / dangling
    / planted-clique construction, same printf templates)."""
    half = n_repos // 2
    ext_case = (
        "CASE lang WHEN 'python' THEN 'py' WHEN 'java' THEN 'java' "
        "WHEN 'go' THEN 'go' WHEN 'rust' THEN 'rs' ELSE 'js' END"
    )
    return f"""idx AS (
  SELECT range // {files_per_repo} AS ri, range % {files_per_repo} AS fi
  FROM range({n_repos * files_per_repo})
),
blk AS (
  SELECT ri, fi,
         CASE WHEN ri >= {half} THEN {half} ELSE 0 END AS bstart,
         {_lang_expr('ri', 'fi', seed)} AS lang
  FROM idx
),
blk2 AS (
  SELECT *,
         CASE WHEN {n_repos} - bstart < {half}
              THEN {n_repos} - bstart ELSE {half} END AS bsize,
         (ri % 10 = 9) AS dangling
  FROM blk
),
tgt AS (
  SELECT *,
         CASE WHEN NOT dangling THEN bstart END AS t_hub,
         CASE WHEN NOT dangling
              THEN bstart + (ri*13 + fi*5 + {seed}) % bsize END AS t_mix,
         CASE WHEN NOT dangling AND fi % 3 = 0
              THEN bstart + (ri - bstart + fi // 3 + 1) % bsize END AS t_nbr,
         CASE WHEN ri - bstart >= 1 AND ri - bstart <= 3
              THEN bstart + (ri - bstart + fi % 2) % 3 + 1 END AS t_cliq
  FROM blk2
),
filetab AS (
  SELECT printf('org%d/repo%d', ri % {n_orgs}, ri) AS repo,
         lang, ri, fi,
         printf('// file %d of %s (seed %d)',
                fi, printf('org%d/repo%d', ri % {n_orgs}, ri), {seed}) AS header,
         {_import_line('t_hub', n_orgs)} AS l_hub,
         {_import_line('t_mix', n_orgs)} AS l_mix,
         {_import_line('t_nbr', n_orgs)} AS l_nbr,
         {_import_line('t_cliq', n_orgs)} AS l_cliq,
         printf('def f_%d():
    return %d
', fi, (ri*1315423911 + fi*2654435761 + {seed}) % 997) AS body
  FROM tgt
),
repos AS (
  SELECT repo,
         printf('src/mod%d/file%d.%s', fi % 4, fi, {ext_case}) AS path,
         substr(sha256(repo || '@' ||
                printf('src/mod%d/file%d.%s', fi % 4, fi, {ext_case})),
                1, 40) AS "commit",
         lang,
         concat_ws(chr(10), header, l_hub, l_mix, l_nbr, l_cliq, body)
           AS content
  FROM filetab
)"""


def _edges_cte(**kw) -> str:
    """repos → distinct (src_repo, dst_repo) via the same per-language regex
    extraction corpus.extract_imports runs (RE2 (?m) == pandas re.M here)."""
    pat_case = "CASE lang " + " ".join(
        f"WHEN '{lg}' THEN '{pat}'" if lg != "js"
        else f"ELSE '{pat}'"
        for lg, pat in (
            (lg, _SQL_IMPORT_RE[lg].replace("'", "''"))
            for lg in ["python", "java", "go", "rust", "js"]
        )
    ) + " END"
    return f"""{repos_cte(**kw)},
mentions AS (
  SELECT repo AS src_repo,
         unnest(regexp_extract_all(content, {pat_case}, 1)) AS module
  FROM repos
),
modmap AS (
  SELECT DISTINCT replace(repo, '/', '_') AS module, repo AS dst_repo
  FROM repos
),
redges AS (
  SELECT DISTINCT m.src_repo, mm.dst_repo
  FROM mentions m JOIN modmap mm USING (module)
  WHERE m.src_repo <> mm.dst_repo
)"""


def repo_sha256_sql(**kw) -> str:
    """Per-row sha256(content) — the north-rule row invariant."""
    return _materialized(
        f"WITH {repos_cte(**kw)}\n"
        "SELECT repo, path, sha256(content) AS sha256 FROM repos "
        "ORDER BY repo, path"
    )


def repo_edges_sql(**kw) -> str:
    return _materialized(
        f"WITH {_edges_cte(**kw)}\n"
        "SELECT src_repo, dst_repo FROM redges ORDER BY src_repo, dst_repo"
    )


def repo_pagerank_sql(rounds: int = 10, alpha: float = 0.85, **kw) -> str:
    """Unrolled fixed-round PageRank (dangling-mass redistribution, same
    update as tpch_graphs.pagerank_sql) over the repo-string edge table;
    vertices = endpoints of the derived edges (corpus.repo_graph's vmap)."""
    parts = [
        _edges_cte(**kw),
        """,
verts AS (SELECT src_repo AS repo FROM redges
          UNION SELECT dst_repo FROM redges),
nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
deg AS (SELECT src_repo AS repo, CAST(count(*) AS DOUBLE) AS outdeg
        FROM redges GROUP BY src_repo),
r0 AS (SELECT repo, 1.0 / (SELECT n FROM nv) AS r FROM verts)""",
    ]
    for k in range(1, rounds + 1):
        p = f"r{k-1}"
        parts.append(f""",
dang{k} AS (
  SELECT COALESCE(SUM(p.r), 0.0) AS s
  FROM {p} p LEFT JOIN deg d ON p.repo = d.repo WHERE d.repo IS NULL
),
r{k} AS (
  SELECT v.repo,
         (1.0 - {alpha}) / (SELECT n FROM nv)
         + {alpha} * ((SELECT s FROM dang{k}) / (SELECT n FROM nv)
                      + COALESCE(m.s, 0.0)) AS r
  FROM verts v
  LEFT JOIN (
    SELECT e.dst_repo AS repo, SUM(p.r / d.outdeg) AS s
    FROM redges e JOIN {p} p ON e.src_repo = p.repo
    JOIN deg d ON p.repo = d.repo
    GROUP BY e.dst_repo
  ) m ON v.repo = m.repo
)""")
    parts.append(
        f"\nSELECT repo, ROUND(r, {FLOAT_DECIMALS}) AS pr"
        f" FROM r{rounds} ORDER BY repo"
    )
    return _materialized("WITH " + "".join(parts))


def repo_file_dedup_sql(**kw) -> str:
    """Twin of corpus.vendor_shared_files + corpus.file_dedup_stats:
    org-shared vendored content planted at src/mod0/file0.*, then exact
    content dedup with the lexicographically-smallest repo:path as the
    canonical keeper per digest group."""
    return _materialized(f"""WITH {repos_cte(**kw)},
vend AS (
  SELECT repo, path,
         CASE WHEN regexp_matches(path, '^src/mod0/file0\\.')
              THEN printf('// vendored license of %s',
                          split_part(repo, '/', 1))
              ELSE content END AS content
  FROM repos
),
f AS (SELECT repo, path, md5(content) AS digest FROM vend),
keep AS (
  SELECT digest, min(repo || ':' || path) AS keeper FROM f GROUP BY digest
)
SELECT f.repo AS repo,
       COUNT(*) AS n_files,
       CAST(SUM(CASE WHEN f.repo || ':' || f.path <> k.keeper
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
FROM f JOIN keep k USING (digest)
GROUP BY f.repo""")
