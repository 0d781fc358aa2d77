"""Per-job wall-time attribution for one registered query entry.

Usage: python tools/profile_entry.py <entry_name> [sf_dir]

Runs the entry once (warm) then once measured with the Spark UI
enabled, and dumps every Spark job of the measured run - duration,
description, stage summary - via the UI REST API. This answers
"which of the harness's N jobs costs the time" without guessing.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_UI", "1")

from bench import prepare_multifile  # noqa: E402
from saurav_nayak_recipe_etl_project_spark.registry import QUERIES  # noqa: E402


def get_spark_ui(app_name: str):
    from saurav_nayak_recipe_etl_project_spark.session import get_spark

    import pyspark
    # session.py disables the UI; rebuild with it on for profiling only
    builder_patch = {"spark.ui.enabled": "true",
                     "spark.ui.port": "4049"}
    spark = get_spark(app_name=app_name)
    if spark.conf.get("spark.ui.enabled") == "false":
        spark.stop()
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
        b = (pyspark.sql.SparkSession.builder.appName(app_name)
             .master(f"local[{cpus}]")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
             .config("spark.sql.adaptive.skewJoin.enabled", "true")
             .config("spark.sql.autoBroadcastJoinThreshold",
                     str(64 * 1024 * 1024))
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.sql.parquet.filterPushdown", "true")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
             .config("spark.ui.enabled", "true")
             .config("spark.ui.port", "4049")
             .config("spark.sql.files.maxPartitionBytes",
                     str(128 * 1024 * 1024)))
        spark = b.getOrCreate()
    return spark


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    fn = QUERIES[name]
    spark = get_spark_ui(f"profile_{name}")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = prepare_multifile(spark, sf_dir)

    # warm run (codegen + footers)
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    base = "http://localhost:4049/api/v1"
    app_id = spark.sparkContext.applicationId
    jobs_before = json.load(urllib.request.urlopen(
        f"{base}/applications/{app_id}/jobs?status=succeeded"))
    first_new = max((j["jobId"] for j in jobs_before), default=-1) + 1

    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0

    jobs = json.load(urllib.request.urlopen(
        f"{base}/applications/{app_id}/jobs"))
    rows = []
    for j in jobs:
        if j["jobId"] < first_new:
            continue
        sub = j.get("submissionTime")
        comp = j.get("completionTime")
        if not (sub and comp):
            continue
        # timestamps arrive as '%Y-%m-%dT%H:%M:%S.mmmGMT'
        def ms(s):
            return (time.mktime(time.strptime(s[:19], "%Y-%m-%dT%H:%M:%S"))
                    * 1000 + int(s[20:23]))
        dur = (ms(comp) - ms(sub)) / 1000.0
        rows.append((j["jobId"], dur, j.get("numTasks"),
                     (j.get("description") or j["name"])[:150]))
    rows.sort()
    total = sum(r[1] for r in rows)
    print(f"== {name}: wall {wall:.3f}s, {len(rows)} jobs, "
          f"sum(job durations) {total:.3f}s ==")
    for jid, dur, ntasks, desc in rows:
        print(f"job {jid:4d}  {dur:7.3f}s  tasks={ntasks:<5} {desc}")
    print("-- slowest --")
    for jid, dur, ntasks, desc in sorted(rows, key=lambda r: -r[1])[:12]:
        print(f"job {jid:4d}  {dur:7.3f}s  tasks={ntasks:<5} {desc}")


if __name__ == "__main__":
    main()
