"""SparkSession factory tuned for this engine.

Local testing runs on local[N]; the same conf scales to a real cluster
because everything here is about plan quality (AQE, broadcast, Arrow),
not hard-coded sizes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "saurav-nayak-recipe-etl-spark",
              master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    - AQE on: runtime partition coalescing + skew-join handling, which is
      what makes one static conf survive sf0.001 → 100 TB.
    - UTC session timezone so timestamp semantics match the DuckDB oracle.
    - Arrow on for the few mapInPandas/pandas_udf operators.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE coalesce/size the output partitioning of CACHED
        # plans too (off by default): persisted iteration state (the
        # pagerank edge table, the dedup signature/shingle caches)
        # otherwise pins the raw shuffle fan-out — 32 cached
        # partitions of a node-scale table at local[32], re-walked by
        # every downstream job (r15; the BENCH_r14 8-vs-32-core
        # inversions on iterative entries came from exactly this)
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
                "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    return builder.getOrCreate()
