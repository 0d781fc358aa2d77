"""Stateful sessionization: the streaming operator's completed
sessions must agree with the batch twin (each user's final session
legitimately stays open in state when the stream drains)."""

from __future__ import annotations

import shutil

from saurav_nayak_recipe_etl_project_spark.streaming import sessions as S


def test_stream_sessions_match_batch_completed(spark, sf_dir, tmp_path):
    src = tmp_path / "drops"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")

    S.run_session_stream(
        spark, str(src), str(tmp_path / "ckpt"), query_name="sess_test"
    )
    streamed = spark.sql(
        "SELECT user_id, date_format(session_start, 'yyyy-MM-dd HH:mm:ss') "
        "AS session_start, n_events FROM sess_test"
    ).collect()
    got = {(r["user_id"], r["session_start"]): r["n_events"] for r in streamed}

    batch = S.sessionize_events(spark, sf_dir).collect()
    # last (max session_id) session per user is the one still open
    last = {}
    for r in batch:
        cur = last.get(r["user_id"])
        if cur is None or r["session_id"] > cur["session_id"]:
            last[r["user_id"]] = r
    want = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in batch
        if last[r["user_id"]]["session_id"] != r["session_id"]
    }
    assert got == want
    assert len(got) > 0
