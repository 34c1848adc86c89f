#!/usr/bin/env python
"""spark-submit entry point — the deployable job of the north rule.

Cluster:
  zip -r gs_spark.zip graphscope_spark/
  spark-submit --master <cluster> --py-files gs_spark.zip \\
      scripts/run_analytics.py --input /data/repos --algo pagerank \\
      --checkpoint-dir s3://bucket/ckpt --output /data/out

Local (this sandbox): spark-submit --master local[32] scripts/run_analytics.py ...

The job: read the repos table (Iceberg via catalog name or Parquet path) →
derive repo→repo edges with the vectorized extractor → run the requested
algorithm with per-superstep durable checkpoints + per-partition lineage →
write (id, value) sorted by id (the reference's engine-CLI output contract,
analytical_engine/test/app_tests.sh:396-414) plus a metrics JSON.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="repos table: parquet path (or Iceberg table name with --iceberg)")
    ap.add_argument("--iceberg", action="store_true",
                    help="treat --input as an Iceberg table name (catalog must be configured on the cluster)")
    ap.add_argument("--synthesize", type=int, default=0,
                    help="synthesize N repos instead of reading --input")
    ap.add_argument("--algo", default="pagerank",
                    choices=["pagerank", "wcc", "cdlp", "triangles"])
    ap.add_argument("--alpha", type=float, default=0.85)
    ap.add_argument("--max-iter", type=int, default=10)
    ap.add_argument("--tol", type=float, default=None)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--checkpoint-every", type=int, default=5)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    spark = SparkSession.builder.appName(f"gs-spark-{args.algo}").getOrCreate()

    from graphscope_spark import corpus
    from graphscope_spark.algorithms import cdlp, pagerank, triangles, wcc

    if args.synthesize:
        repos = corpus.synthesize_repos(spark, n_repos=args.synthesize)
    elif args.iceberg:
        repos = spark.read.table(args.input)
    else:
        repos = spark.read.parquet(args.input)

    # graph_from_repos carries the lineage-cut discipline (eager
    # localCheckpoints after extract / id-map / encode) — rebuilding the
    # assembly inline WITHOUT them re-embeds the pandas-UDF extract plan
    # into every superstep and OOMs the driver (tests/test_submit.py).
    g, vmap = corpus.graph_from_repos(repos)

    kw = dict(checkpoint_dir=args.checkpoint_dir,
              checkpoint_every=args.checkpoint_every,
              run_id=args.run_id, resume=args.resume)
    if args.algo == "pagerank":
        res = pagerank(g, alpha=args.alpha, max_iter=args.max_iter, tol=args.tol, **kw)
        out = res.state.select("id", F.col("rank").alias("r"))
    elif args.algo == "wcc":
        res = wcc(g, **kw)
        out = res.state.select("id", F.col("comp").alias("r"))
    elif args.algo == "cdlp":
        res = cdlp(g, max_iter=args.max_iter, **kw)
        out = res.state.select("id", F.col("label").alias("r"))
    else:
        out = triangles(g).select("id", F.col("tri").alias("r"))
        res = None

    # oid-sorted output, the reference's <oid> <value> contract
    out.join(vmap.withColumnRenamed("id", "id"), "id") \
        .select("repo", "r").orderBy("repo") \
        .write.mode("overwrite").parquet(args.output)

    if res is not None:
        meta = {"algo": args.algo, "rounds": res.rounds, "run_id": res.run_id,
                "metrics": res.metrics}
        print(json.dumps(meta, default=float))
    spark.stop()


if __name__ == "__main__":
    main()
