"""Stream-stream interval join must reproduce its batch twin when the
stream drains everything (availableNow, generous watermark)."""

from __future__ import annotations

import shutil

from saurav_nayak_recipe_etl_project_spark.streaming import joins as J


def test_stream_join_matches_batch(spark, sf_dir, tmp_path):
    src = tmp_path / "drops"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")

    J.run_attribution_stream(
        spark, str(src), str(tmp_path / "ckpt"), query_name="attr_test"
    )
    got = {
        (r["purchase_id"], r["view_id"]): r["lag_s"]
        for r in spark.sql("SELECT * FROM attr_test").collect()
    }
    want = {
        (r["purchase_id"], r["view_id"]): r["lag_s"]
        for r in J.view_purchase_attribution(spark, sf_dir).collect()
    }
    assert len(want) > 0
    assert got == want
