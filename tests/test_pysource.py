"""Python DataSource (jsonl_docs): write the documents table out as
JSONL shards through the custom sink's two-phase commit, read it back
through the custom source, and require exact row parity with the
parquet original — plus the structural evidence: one scan task per
shard, deterministic part-names, _SUCCESS marker, no staging
leftovers."""

from __future__ import annotations

import os

from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table
from saurav_nayak_recipe_etl_project_spark.sources.pysource import register


def test_jsonl_roundtrip_and_commit_protocol(spark, sf_dir, tmp_path):
    register(spark)
    docs = load_table(spark, "documents", sf_dir)
    out = str(tmp_path / "shards")

    (docs.repartition(4).write.format("jsonl_docs")
     .option("path", out).mode("overwrite").save())

    files = sorted(os.listdir(out))
    shards = [f for f in files if f.endswith(".jsonl")]
    assert shards == [f"part-{i:05d}.jsonl" for i in range(len(shards))]
    assert 1 <= len(shards) <= 4
    assert "_SUCCESS" in files
    assert not any(f.startswith("_tmp-") for f in files)

    back = spark.read.format("jsonl_docs").option("path", out).load()
    # one scan task per shard file
    assert back.rdd.getNumPartitions() == len(shards)

    key = lambda r: (r["doc_id"], r["text"], r["lang"], r["source"],
                     r["n_chars"])
    assert sorted(map(key, back.collect())) == sorted(
        map(key, docs.collect())
    )
    assert back.schema == docs.schema


def test_jsonl_overwrite_replaces_previous_shards(spark, sf_dir, tmp_path):
    register(spark)
    docs = load_table(spark, "documents", sf_dir).limit(50)
    out = str(tmp_path / "shards2")
    (docs.repartition(4).write.format("jsonl_docs")
     .option("path", out).mode("overwrite").save())
    n_first = len([f for f in os.listdir(out) if f.endswith(".jsonl")])
    # second job with fewer tasks must not leave first-run shards
    (docs.repartition(1).write.format("jsonl_docs")
     .option("path", out).mode("overwrite").save())
    shards = [f for f in os.listdir(out) if f.endswith(".jsonl")]
    assert len(shards) == 1 and n_first > 1
    back = spark.read.format("jsonl_docs").option("path", out).load()
    assert back.count() == 50
