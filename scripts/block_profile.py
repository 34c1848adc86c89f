#!/usr/bin/env python
"""Per-stage profile of a pagerank_block run — where do superstep seconds
go? Prints one line per completed stage: tasks, wall-ish duration, total
executor run time, max task, shuffle read/write MB, and the stage name.

Usage: python scripts/block_profile.py --edges 100000000 --cpus 32 \
          --rounds 3 --blocks 64
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=100_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--blocks", type=int, default=0)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from graphscope_spark.algorithms import pagerank_block
    from graphscope_spark.graph import Graph
    from graphscope_spark.session import get_spark

    os.makedirs("/dev/shm/spark-tmp", exist_ok=True)
    spark = get_spark(
        "block_profile", cpus=args.cpus, shuffle_partitions=args.cpus,
        extra_conf={
            "spark.local.dir": "/dev/shm/spark-tmp",
            "spark.ui.enabled": "true",
            "spark.ui.port": "0",
        },
    )

    n_le = args.edges
    nv = n_le // 8
    base = spark.range(n_le)
    h = F.xxhash64(F.col("id"))
    h2 = F.xxhash64(F.col("id"), F.lit(1))
    hub = F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(100)) < 20
    ledges = base.select(
        F.pmod(h, F.lit(nv)).alias("src"),
        F.when(hub, F.pmod(h2, F.lit(nv // 100 + 1)))
        .otherwise(F.pmod(h2, F.lit(nv))).alias("dst"),
    )
    b = args.blocks or args.cpus
    g = Graph(ledges, directed=True, num_partitions=b)
    g.num_edges
    g.degrees.count()

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def stages():
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete"
        ) as r:
            return json.load(r)

    seen = {s["stageId"] for s in stages()}
    t0 = time.monotonic()
    res = pagerank_block(g, alpha=0.85, max_iter=args.rounds, num_blocks=b)
    res.state.write.format("noop").mode("overwrite").save()
    wall = time.monotonic() - t0

    rows = []
    for s in stages():
        if s["stageId"] in seen:
            continue
        dur = 0.0
        if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
            from datetime import datetime

            def ts(x):
                return datetime.strptime(
                    x.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z"
                ).timestamp()

            dur = ts(s["completionTime"]) - ts(s["firstTaskLaunchedTime"])
        rows.append({
            "id": s["stageId"],
            "tasks": s.get("numCompleteTasks", 0),
            "dur_s": round(dur, 2),
            "run_s": round(s.get("executorRunTime", 0) / 1e3, 2),
            "sr_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
            "sw_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
            "name": s.get("name", "")[:60],
        })
    rows.sort(key=lambda r: r["id"])
    for r in rows:
        print(json.dumps(r))
    print(json.dumps({
        "wall_s": round(wall, 2), "edges": n_le, "rounds": args.rounds,
        "blocks": b, "cpus": args.cpus,
        "eups": round(n_le * args.rounds / wall, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
