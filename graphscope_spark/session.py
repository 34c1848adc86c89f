"""SparkSession factory tuned for iterative graph analytics.

Mirrors the execution-level choices of the reference engine
(analytical_engine/core/worker/default_worker.h: one message exchange per
superstep; docs/analytical_engine/performance_tuning.md: partition count =
worker parallelism) in Spark terms: shuffle partitions sized to cores, AQE on
(runtime re-plan = the reference's dense/sparse push-pull switch,
apps/flash/api.h:361-390), skew-join on (hub-vertex salting backstop),
Arrow enabled for the pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "graphscope_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession.

    cpus defaults to $SPARK_GRAFT_CPUS or all cores. On a real cluster the
    same confs apply; only ``master`` changes (spark-submit owns it then,
    or pass ``master=`` explicitly — e.g. ``local-cluster[2,4,1024]`` for
    the separate-executor-JVM tests)."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        # one shuffle partition per core locally; a real cluster wants
        # ~2-3x total executor cores — callers override via argument.
        shuffle_partitions = max(int(cpus), 4)

    builder = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # iterative plan growth: allow deep plans before checkpoint truncation
        .config("spark.sql.analyzer.maxIterations", "250")
        .config("spark.driver.maxResultSize", "4g")
        # Stats sanity for iterative plans: relations with unknown size
        # (LogicalRDD from localCheckpoint — every truncated superstep
        # state) default to Long.MaxValue bytes, and join cardinality
        # estimates MULTIPLY; a loop that joins checkpointed states a few
        # levels deep produces sizeInBytes with millions of digits, and the
        # driver then burns minutes formatting BigIntegers into plan
        # strings (observed: 700 s in BigInteger.pow under
        # Dataset.localCheckpoint). 64 GB is large enough that nothing
        # mis-broadcasts, small enough that estimate products stay tame.
        .config("spark.sql.defaultSizeInBytes", str(64 * 1024**3))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
