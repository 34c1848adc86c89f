#!/usr/bin/env python
"""Two-parallelism scaling benchmark — the sandbox stand-in for the north
rule's N vs 4N executor criterion (scaling efficiency ≥ 0.8).

Runs the SAME PageRank job on the SAME synthetic edge table at local[N] and
local[4N] in separate JVMs (fresh processes, no warm caches shared), reports
edge-updates/sec at both and efficiency = T_small / (4 · T_large) — i.e.
throughput_4N / (4 · throughput_N). Writes BENCH/BASELINE.md.

The input is a deterministic uniform+hub random graph generated JVM-side
(spark.range + xxhash64 — no Python, no files), sized so each superstep does
real shuffle work (the regime where Spark scales; tiny graphs measure only
fixed overhead, which is not what a 1000-executor cluster sees).

Usage: python scripts/scaling_bench.py [--edges 20000000] [--small 8]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from graphscope_spark.session import get_spark
from graphscope_spark.graph import Graph
from graphscope_spark.algorithms import pagerank

cpus = {cpus}
n_edges = {n_edges}
n_vertices = n_edges // 8
rounds = {rounds}
spark = get_spark("scaling_bench", cpus=cpus, shuffle_partitions={parts},
                  extra_conf={{"spark.local.dir": "/dev/shm/spark-tmp",
                               "spark.ui.enabled": "true",
                               "spark.ui.port": "0"}})

# deterministic uniform edges + a 1% hub set absorbing 20% of endpoints —
# the skew shape of real link graphs (AQE skew-join handles the hot keys).
base = spark.range(n_edges)
h = F.xxhash64(F.col("id"))
h2 = F.xxhash64(F.col("id"), F.lit(1))
hub = F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(100)) < 20
edges = base.select(
    F.pmod(h, F.lit(n_vertices)).alias("src"),
    F.when(hub, F.pmod(h2, F.lit(n_vertices // 100 + 1)))
     .otherwise(F.pmod(h2, F.lit(n_vertices))).alias("dst"),
)
g = Graph(edges, directed=True)
g.num_edges; g.num_vertices; g.degrees.count()  # build caches (CSR sort) pre-timer

def stage_task_seconds():
    # sum of completed-stage executorRunTime (ms) via the UI REST API —
    # the per-task time a cluster would bill. Comparing this total across
    # parallelism widths separates "tasks got slower" (shared memory
    # bus / CPU contention — a single-box artifact a real N vs 4N cluster
    # does not have) from "executors sat idle" (plan/scheduler problem).
    import urllib.request
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{{base}}/api/v1/applications/{{app_id}}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    return sum(s.get("executorRunTime", 0) for s in stages) / 1000.0

task_s_before = stage_task_seconds()
t0 = time.monotonic()
res = pagerank(g, alpha=0.85, max_iter=rounds)
# JVM-side noop sink: materializes every row without Python serialization
res.state.write.format("noop").mode("overwrite").save()
wall = time.monotonic() - t0
task_s = stage_task_seconds() - task_s_before
print(json.dumps({{"cpus": cpus, "wall_s": wall,
                   "task_seconds": task_s,
                   "busy_frac": task_s / (wall * cpus),
                   "edge_updates_per_sec": n_edges * rounds / wall}}))
spark.stop()
"""



#: pure-compute control job: same harness, no shuffle — isolates "does the
#: box scale at all" (CPU-bound sha2 chain) from the pagerank number
#: (shuffle/memory-bandwidth-bound). On one box the memory bus is shared
#: by all 32 cores, so pagerank's ceiling is bandwidth, not plan shape;
#: the control's efficiency shows the harness+scheduler overhead alone.
CONTROL_WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from graphscope_spark.session import get_spark
cpus = {cpus}
n = {n_edges}
spark = get_spark("scaling_control", cpus=cpus, shuffle_partitions={parts},
                  extra_conf={{"spark.local.dir": "/dev/shm/spark-tmp"}})
# force `parts` parallel input partitions so both legs run the identical
# task layout (spark.range would otherwise default to `cpus` slices)
df = spark.range(0, n, 1, {parts}).select(
    F.col("id"), F.sha2(F.col("id").cast("string"), 256).alias("h"))
for _ in range(4):
    df = df.select("id", F.sha2(F.concat("h", F.col("id").cast("string")), 256).alias("h"))
t0 = time.monotonic()
df.select(F.max("h")).collect()
wall = time.monotonic() - t0
print(json.dumps({{"cpus": cpus, "wall_s": wall,
                   "edge_updates_per_sec": n * 5 / wall}}))
spark.stop()
"""


def run(cpus: int, n_edges: int, rounds: int, parts: int,
        pin: bool = True, job: str = "pagerank") -> dict:
    tmpl = WORKER if job == "pagerank" else CONTROL_WORKER
    code = tmpl.format(repo=REPO, cpus=cpus, n_edges=n_edges,
                       rounds=rounds, parts=parts)
    env = dict(os.environ)
    env.setdefault("SPARK_DRIVER_MEM", "16g")
    os.makedirs("/dev/shm/spark-tmp", exist_ok=True)
    cmd = [sys.executable, "-c", code]
    if pin:
        # Pin the whole JVM (task threads + GC + shuffle/netty IO) to
        # exactly `cpus` cores. Without this the local[N] leg's GC and IO
        # threads spill onto the other idle cores, inflating small-leg
        # throughput — an N-core cluster node has N cores for EVERYTHING,
        # so the pinned run is the honest N vs 4N proxy.
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(
        cmd, capture_output=True, text=True, check=True, env=env,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=20_000_000)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--small", type=int, default=8)
    ap.add_argument("--trials", type=int, default=2,
                    help="runs per leg; best throughput kept (single-box "
                    "runs show large GC/page-cache variance)")
    ap.add_argument("--no-md", action="store_true",
                    help="print JSON only; don't overwrite BENCH/BASELINE.md")
    ap.add_argument("--job", default="pagerank",
                    choices=["pagerank", "control"],
                    help="control = shuffle-free CPU-bound sha2 chain "
                    "(isolates box/harness scaling from memory-bandwidth)")
    args = ap.parse_args()
    small, large = args.small, args.small * 4
    # identical partition count both runs: the PLAN is identical, only
    # executor-thread parallelism differs — the honest N vs 4N proxy.
    parts = large * 2

    trials = {"small": [], "large": []}
    for _ in range(args.trials):  # interleave legs to spread noise evenly
        trials["small"].append(
            run(small, args.edges, args.rounds, parts, job=args.job))
        trials["large"].append(
            run(large, args.edges, args.rounds, parts, job=args.job))
    r_small = max(trials["small"], key=lambda r: r["edge_updates_per_sec"])
    r_large = max(trials["large"], key=lambda r: r["edge_updates_per_sec"])
    eff = r_large["edge_updates_per_sec"] / (4 * r_small["edge_updates_per_sec"])
    result = {
        "job": args.job,
        "edges": args.edges,
        "rounds": args.rounds,
        "trials": trials,
        "small": r_small,
        "large": r_large,
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result))

    if args.job != "pagerank" or args.no_md:
        return  # control / exploratory runs report on stdout only
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH/BASELINE — two-parallelism scaling evidence

North rule: throughput scaling efficiency ≥ 0.8 from N to 4N executors.
Sandbox proxy (per BASELINE.md): same job, same input, local[{small}] vs
local[{large}], separate JVMs, identical shuffle-partition count ({parts}),
each JVM pinned with ``taskset`` to exactly its executor-thread count of
cores (so the N leg's GC/shuffle-IO threads cannot borrow the idle 4N−N
cores — an N-core cluster node has N cores for everything), best of
{args.trials} interleaved trials per leg (single-box runs carry large
GC/page-cache variance; all trials recorded in the JSON line above),
shuffle dirs on tmpfs.

Job: PageRank, {args.rounds} fixed rounds, {args.edges:,} directed edges
(deterministic uniform + 1%-hub skew graph, generated JVM-side),
{args.edges // 8:,} vertices.

| parallelism | wall (s) | edge-updates/sec |
|---|---|---|
| local[{small}] (N) | {r_small['wall_s']:.1f} | {r_small['edge_updates_per_sec']:,.0f} |
| local[{large}] (4N) | {r_large['wall_s']:.1f} | {r_large['edge_updates_per_sec']:,.0f} |

**Scaling efficiency (throughput_4N / (4 × throughput_N)): {eff:.3f}**

Reference context (BASELINE.md): GraphScope GAE PageRank on com-friendster
does ≈3.0B edge-updates/s on 128 cores (≈23M/core); our per-core number is
Python/JVM-shuffle bound, so the criterion here is the efficiency ratio,
plus the absolute numbers above for the record.
""")


if __name__ == "__main__":
    main()
