"""Late-data handling: a second file drop with older events must still
be folded into its (pre-watermark) window on the next trigger."""

from __future__ import annotations

import shutil

from saurav_nayak_recipe_etl_project_spark.streaming import events as E


def test_second_drop_updates_windows(spark, sf_dir, tmp_path):
    src = tmp_path / "drops"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    shutil.copy(f"{sf_dir}/events.parquet", src / "a.parquet")
    E.run_windowed_stream(spark, str(src), ckpt, query_name="late_test")
    first = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM late_test").collect()
    }

    # same events again: every window count doubles on the next trigger
    shutil.copy(f"{sf_dir}/events.parquet", src / "b.parquet")
    E.run_windowed_stream(spark, str(src), ckpt, query_name="late_test")
    second = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM late_test").collect()
    }
    assert second == {k: 2 * v for k, v in first.items()}


def _write_single_event(spark, path, ts_str, event_id):
    from pyspark.sql import functions as F
    import glob
    import shutil as sh

    df = spark.createDataFrame(
        [(event_id, ts_str, 1, "view", 1.0, "{}")],
        "event_id long, ts_s string, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    stage = str(path) + "_stage"
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    sh.copy(glob.glob(f"{stage}/part-*.parquet")[0], str(path))


def test_append_mode_emits_only_finalized_windows_and_drops_late(
        spark, sf_dir, tmp_path):
    """Append + watermark: windows appear only once the watermark passes
    them, each exactly once; events older than the watermark vanish."""
    src = tmp_path / "drops"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_append")
    out = str(tmp_path / "out_append")

    def emitted():
        return spark.read.parquet(out).collect()

    shutil.copy(f"{sf_dir}/events.parquet", src / "a.parquet")
    E.run_windowed_stream_append(spark, str(src), ckpt, out)
    first = emitted()

    # a far-future event advances the watermark beyond every window of
    # file A -> the next trigger finalizes and emits ALL of them
    _write_single_event(spark, src / "b.parquet", "2031-01-01 00:00:00", 10**9)
    E.run_windowed_stream_append(spark, str(src), ckpt, out)
    rows = emitted()
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in rows
    }
    # exactly-once: no (window, type) key appears twice in the sink
    assert len(got) == len(rows)
    want = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in E.stream_events_window(spark, sf_dir).collect()
    }
    assert want.items() <= got.items()       # every A-window finalized, correct
    # only the future event's (still-open) window may be missing
    assert len(got) - len(want) <= 1
    # each window emitted exactly once across both triggers
    assert len(first) < len(got)

    # an event far OLDER than the watermark is dropped: no new rows, no
    # count change for its (already-finalized) window
    _write_single_event(spark, src / "c.parquet", "2019-01-01 00:00:00", 10**9 + 1)
    E.run_windowed_stream_append(spark, str(src), ckpt, out)
    after = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in emitted()
    }
    assert ("2019-01-01 00:00:00", "view") not in after
    assert after == got
