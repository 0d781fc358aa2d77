"""Streaming telemetry recorder: progress events for a stateful query
must land in the recorder with real row counts and state-operator
metrics (RocksDB custom metrics included when that provider runs),
be queryable as a DataFrame, and STOP being recorded once the
context manager detaches the listener."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table
from saurav_nayak_recipe_etl_project_spark.streaming.monitor import recording
from saurav_nayak_recipe_etl_project_spark.streaming.statestore import (
    run_rocksdb_user_stats_stream,
)


def _wait_for(pred, timeout_s=30):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if pred():
            return True
        time.sleep(0.2)
    return pred()


def test_recorder_captures_stateful_progress(spark, sf_dir, tmp_path):
    src = tmp_path / "drops"
    src.mkdir()
    events = load_table(spark, "events", sf_dir)
    stage = tmp_path / "stage"
    events.coalesce(1).write.mode("overwrite").parquet(str(stage))
    part = next(stage.glob("part-*.parquet"))
    part.rename(src / "a.parquet")

    with recording(spark) as rec:
        run_rocksdb_user_stats_stream(
            spark, str(src), str(tmp_path / "ck_mon"), "mon_users"
        )
        # listener events are async on the driver bus
        assert _wait_for(
            lambda: any(r[4] > 0 for r in rec.snapshot())
        ), rec.snapshot()
        rows = rec.snapshot()

    got = {r[4] for r in rows}  # num_input_rows
    n_events = events.count()
    assert n_events in got  # the data-bearing batch saw the full file
    # stateful agg: state rows == distinct users once drained
    n_users = events.select("user_id").distinct().count()
    assert any(r[6] == n_users for r in rows)
    # RocksDB provider evidence in the telemetry itself
    assert any("rocksdb" in r[8].lower() for r in rows if r[4] > 0)

    df = rec.progress_frame(spark)
    assert df.where(F.col("num_input_rows") > 0).count() >= 1
    assert df.schema["batch_id"].dataType.simpleString() == "bigint"

    # detached: a second run must not append to this recorder
    n_before = len(rows)
    (events.limit(5).coalesce(1).write.mode("overwrite")
     .parquet(str(stage)))
    next(stage.glob("part-*.parquet")).rename(src / "b.parquet")
    run_rocksdb_user_stats_stream(
        spark, str(src), str(tmp_path / "ck_mon"), "mon_users"
    )
    time.sleep(1.0)
    assert len(rec.snapshot()) == n_before
