"""One-off larger-SF core-scaling sample (r15, VERDICT item 8).

At sf0.1 every bench entry is scheduler/driver-fixed-cost bound, so
the driver's 8-vs-32-core ratios cannot demonstrate parallelism (the
r14 scaling block read <=1.0 almost everywhere). This runs the
heaviest non-excluded entries on the key-offset 10x corpus — enough
rows that executor compute dominates — at the core count given by
SPARK_GRAFT_CPUS, so two invocations (8 and 32) yield a credible
parallel-scaling ratio.

Usage: SPARK_GRAFT_CPUS=8 python tools/scaling_sample.py out8.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _10X_EXCLUDED, prepare_10x, prepare_multifile  # noqa: E402
from saurav_nayak_recipe_etl_project_spark.registry import QUERIES  # noqa: E402
from saurav_nayak_recipe_etl_project_spark.session import get_spark  # noqa: E402

# heaviest headline entries by the r15 baseline bench on this box,
# minus the documented 10x exclusions
SAMPLE = [
    "stream_dup_pairs", "dedup_stream_lsh_batch", "acid_orders_merge_dv",
    "txsource_mv", "ann_recall_at_k", "corpus_release_pipeline",
    "dedup_clusters_star", "dedup_embedding", "part_pagerank",
    "dedup_lsh_verified",
]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/dev/stdout"
    spark = get_spark(app_name="scaling_sample")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base_dir = prepare_multifile(spark, sf_dir)
    big_dir = prepare_10x(spark, sf_dir)
    iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3"))
    res = {"cpus": int(os.environ.get("SPARK_GRAFT_CPUS",
                                      os.cpu_count() or 4)),
           "iters": iters, "queries_10x": {}}
    for name in SAMPLE:
        if name in _10X_EXCLUDED:
            continue
        fn = QUERIES[name]
        fn(spark, base_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(iters):
            t0 = time.perf_counter()
            fn(spark, big_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        res["queries_10x"][name] = round(min(runs), 3)
        print(f"# {name}: min {min(runs):.3f}s", file=sys.stderr)
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
