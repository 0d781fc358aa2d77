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
