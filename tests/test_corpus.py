"""Corpus pipeline tests: input_hint schema, determinism, sha256 row
invariant, vectorized extraction parity vs a driver-side pure-Python oracle,
and the planted graph structure (components / dangling / hub / triangles)."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from graphscope_spark import corpus
from graphscope_spark.algorithms import pagerank, wcc

N_REPOS = 60
FILES = 6


def _repos(spark):
    return corpus.synthesize_repos(spark, n_repos=N_REPOS, files_per_repo=FILES)


def test_schema_matches_input_hint(spark):
    df = _repos(spark)
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("repo", "string"), ("path", "string"), ("commit", "string"),
        ("lang", "string"), ("content", "string"),
    ]
    assert df.count() == N_REPOS * FILES


def test_deterministic_across_reruns(spark):
    # decimal cast: ANSI mode raises on long-overflow in SUM
    h = lambda df: df.select(
        F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)"))
    ).first()[0]
    assert h(_repos(spark)) == h(_repos(spark))


def test_sha256_invariant_roundtrip(spark, tmp_path):
    """North rule: per-row sha256(content) equality against the source table
    after a content-carrying stage (parquet write/read roundtrip)."""
    src = _repos(spark)
    before = corpus.content_fingerprints(src)
    path = str(tmp_path / "repos.parquet")
    src.write.mode("overwrite").parquet(path)
    after = corpus.content_fingerprints(spark.read.parquet(path))
    joined = before.alias("a").join(
        after.alias("b"), ["repo", "path"], "full"
    ).filter(
        (F.col("a.sha256") != F.col("b.sha256"))
        | F.col("a.sha256").isNull() | F.col("b.sha256").isNull()
    )
    assert joined.count() == 0
    # and Spark's sha2 agrees with hashlib on the driver
    row = src.orderBy("repo", "path").first()
    expect = hashlib.sha256(row["content"].encode()).hexdigest()
    got = before.filter(
        (F.col("repo") == row["repo"]) & (F.col("path") == row["path"])
    ).first()["sha256"]
    assert got == expect


def test_extraction_matches_python_oracle(spark):
    """Vectorized pandas-UDF extraction == per-row re.findall on the driver."""
    src = _repos(spark)
    got = {
        (r["src_repo"], r["dst_repo"])
        for r in corpus.extract_edges(src).collect()
    }
    mod2repo = {
        row["repo"].replace("/", "_"): row["repo"]
        for row in src.select("repo").distinct().collect()
    }
    expect = set()
    for row in src.collect():
        for m in re.findall(corpus.IMPORT_RE[row["lang"]], row["content"], re.M):
            if m in mod2repo and mod2repo[m] != row["repo"]:
                expect.add((row["repo"], mod2repo[m]))
    assert got == expect
    assert len(expect) > 0


def test_planted_structure(spark):
    g, vertices, repos = corpus.repo_graph(spark, n_repos=N_REPOS, files_per_repo=FILES)
    # two blocks with no cross-block imports → ≥ 2 weak components
    comp = wcc(g.to_undirected()).state
    assert comp.select("comp").distinct().count() >= 2
    # dangling repos exist (ri % 10 == 9 and imported by someone)
    deg = g.degrees
    assert deg.filter((F.col("out_deg") == 0) & (F.col("in_deg") > 0)).count() > 0
    # hub skew: max in-degree far above median
    stats = deg.agg(F.max("in_deg").alias("mx"),
                    F.expr("percentile_approx(in_deg, 0.5)").alias("md")).first()
    assert stats["mx"] >= 3 * max(stats["md"], 1)
    # planted clique repos import each other → triangles exist
    from graphscope_spark.algorithms.triangles import triangle_count
    assert triangle_count(g.to_undirected()) > 0
    # pagerank end-to-end on the derived graph
    pr = pagerank(g, alpha=0.85, max_iter=5).state
    total = pr.agg(F.sum("rank")).first()[0]
    assert abs(total - 1.0) < 1e-6


def test_vendored_file_dedup(spark):
    # 60 repos / 20 orgs → 3 repos per org; vendor_shared_files plants one
    # org-shared file per repo, so each digest group has 3 members: the
    # lexicographically-smallest repo:path keeps it, the other two lose it.
    repos = corpus.vendor_shared_files(
        corpus.synthesize_repos(spark, 60, 12))
    stats = corpus.file_dedup_stats(repos).collect()
    assert len(stats) == 60
    assert all(r["n_files"] == 12 for r in stats)
    removed = sorted(r["n_removed"] for r in stats)
    assert removed.count(0) == 20 and removed.count(1) == 40
    # without the vendor step every file is unique — nothing removed
    clean = corpus.file_dedup_stats(corpus.synthesize_repos(spark, 60, 12))
    assert clean.agg(F.sum("n_removed")).first()[0] == 0
