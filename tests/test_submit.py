"""End-to-end tests of the north rule's deployment contract: the analytics
job ships as ``spark-submit --py-files <zip>`` plus a single entry script.

The entry script is COPIED to a temp dir before submitting and the child
runs with the temp dir as cwd and no PYTHONPATH, so BOTH the driver and the
executor-side (pandas-UDF worker) imports must resolve ``graphscope_spark``
from the zip alone — nothing on disk next to the script, nothing on
sys.path. (The script's own ``sys.path.insert`` of its parent's parent then
points at an empty temp ancestor, not the repo.)

Covered here:
  * pagerank end-to-end through spark-submit, value-checked against an
    in-process rerun of the same job (same synthesize seed, same rounds);
  * output global sort order, checked per part-file in filename order
    (``orderBy`` range-partitions, so the files concatenate sorted);
  * the resume contract at deploy level (full tier): run 1 checkpoints at
    round 5 and stops (the simulated interruption), run 2 ``--resume``s
    from the durable checkpoint to round 10, and the output must equal an
    uninterrupted 10-round submit value-for-value — the spark-submit twin
    of the driver-gated ``pagerank_resume`` query.
"""

import glob
import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


def _build_zip(tmp_path) -> str:
    zpath = str(tmp_path / "gs_spark.zip")
    pkg = os.path.join(REPO, "graphscope_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def _submit(tmp_path, zpath, *job_args, timeout=600):
    # the entry script runs from a COPY outside the repo: the driver can
    # only resolve graphscope_spark from --py-files
    script = str(tmp_path / "run_analytics.py")
    if not os.path.exists(script):
        shutil.copy(os.path.join(REPO, "scripts", "run_analytics.py"), script)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    return subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zpath,
            script,
            *job_args,
        ],
        capture_output=True, text=True, timeout=timeout, env=env,
        cwd=str(tmp_path),  # NOT the repo root: no implicit sys.path rescue
    )


def _job_meta(proc):
    assert proc.returncode == 0, proc.stderr[-3000:]
    meta_lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert meta_lines, proc.stdout[-2000:]
    return json.loads(meta_lines[-1])


def _read_sorted_parts(out_dir):
    """Rows concatenated per part-file in filename order — preserves the
    writer's physical order (a plain spark.read would be free to reorder
    splits, making any sortedness assertion vacuous)."""
    import pyarrow.parquet as pq

    rows = []
    for part in sorted(glob.glob(os.path.join(out_dir, "part-*"))):
        t = pq.read_table(part)
        rows.extend(zip(t.column("repo").to_pylist(),
                        t.column("r").to_pylist()))
    return rows


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_pagerank(tmp_path):
    out_dir = str(tmp_path / "out")
    proc = _submit(
        tmp_path, _build_zip(tmp_path),
        "--synthesize", "100", "--algo", "pagerank",
        "--max-iter", "5", "--output", out_dir,
    )
    meta = _job_meta(proc)
    assert meta["algo"] == "pagerank" and meta["rounds"] == 5

    got = _read_sorted_parts(out_dir)
    assert len(got) > 0
    total = sum(r for _, r in got)
    assert abs(total - 1.0) < 1e-6  # unit PageRank mass
    # oid-sorted output — the reference's engine-CLI output contract —
    # verified against the PHYSICAL row order, not a re-sorted read
    repos = [repo for repo, _ in got]
    assert repos == sorted(repos)

    # value-check against an in-process rerun of the same job (same
    # deterministic synthesize, same rounds)
    sys.path.insert(0, REPO)
    from graphscope_spark import corpus
    from graphscope_spark.algorithms import pagerank
    from graphscope_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("submit_check", cpus=4, shuffle_partitions=4)
    repos_df = corpus.synthesize_repos(spark, n_repos=100)
    g, vmap = corpus.graph_from_repos(repos_df)
    res = pagerank(g, alpha=0.85, max_iter=5)
    want = {
        r["repo"]: r["rank"]
        for r in res.state.join(vmap, "id").select(
            "repo", "rank").collect()
    }
    assert len(want) == len(got)
    for repo, r in got:
        assert abs(want[repo] - r) < 1e-9, repo


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_resume_matches_uninterrupted(tmp_path):
    """Deploy-level resume (full tier): submit 1 checkpoints durably at
    round 5 and exits (the interruption); submit 2 --resume continues to
    round 10 from the checkpoint parquet + lineage; submit 3 runs rounds
    1-10 uninterrupted. Outputs 2 and 3 must match value-for-value."""
    zpath = _build_zip(tmp_path)
    ck = str(tmp_path / "ckpt")
    out_resumed = str(tmp_path / "out_resumed")
    out_full = str(tmp_path / "out_full")

    p1 = _submit(
        tmp_path, zpath,
        "--synthesize", "100", "--algo", "pagerank", "--max-iter", "5",
        "--checkpoint-dir", ck, "--checkpoint-every", "5",
        "--run-id", "deploy", "--output", str(tmp_path / "out_cut"),
    )
    assert _job_meta(p1)["rounds"] == 5
    # the durable round-5 snapshot the resume must start from
    assert glob.glob(os.path.join(ck, "**", "*"), recursive=True)

    p2 = _submit(
        tmp_path, zpath,
        "--synthesize", "100", "--algo", "pagerank", "--max-iter", "10",
        "--checkpoint-dir", ck, "--run-id", "deploy", "--resume",
        "--output", out_resumed,
    )
    meta2 = _job_meta(p2)
    assert meta2["rounds"] == 10

    p3 = _submit(
        tmp_path, zpath,
        "--synthesize", "100", "--algo", "pagerank", "--max-iter", "10",
        "--output", out_full,
    )
    assert _job_meta(p3)["rounds"] == 10

    resumed = _read_sorted_parts(out_resumed)
    full = _read_sorted_parts(out_full)
    assert len(resumed) == len(full) > 0
    for (repo_a, r_a), (repo_b, r_b) in zip(resumed, full):
        assert repo_a == repo_b
        assert abs(r_a - r_b) < 1e-12, repo_a
