"""foreachBatch upsert: state table converges to one latest row per
user across multiple drops, matching the batch answer."""

from __future__ import annotations

import shutil


from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table
from saurav_nayak_recipe_etl_project_spark.streaming import upsert as U


def test_upsert_converges_to_latest_per_user(spark, sf_dir, tmp_path):
    src = tmp_path / "drops"
    src.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    shutil.copy(f"{sf_dir}/events.parquet", src / "a.parquet")
    U.run_upsert_stream(spark, str(src), ckpt, state)
    # second identical drop must not duplicate state
    shutil.copy(f"{sf_dir}/events.parquet", src / "b.parquet")
    U.run_upsert_stream(spark, str(src), ckpt, state)

    got = spark.read.parquet(state)
    events = load_table(spark, "events", sf_dir)
    want = U.latest_per_key(events, "user_id", "ts", "event_id")

    assert got.count() == events.select("user_id").distinct().count()
    g = {r["user_id"]: r["event_id"] for r in got.collect()}
    w = {r["user_id"]: r["event_id"] for r in want.collect()}
    assert g == w
