"""G21 — APPEND-mode native session_window: watermark-closed sessions
emit exactly once and equal the batch twin on the closed region; the
still-open tail legitimately stays in state (same watermark contract
as the LEFT OUTER join's null rows)."""

from __future__ import annotations

import datetime as dt
import glob
import shutil

import pyspark.sql.functions as F

from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table
from saurav_nayak_recipe_etl_project_spark.streaming import events as E
from saurav_nayak_recipe_etl_project_spark.streaming.sessions import (
    events_session_window,
)

_WM = dt.timedelta(hours=2)
_MARGIN = dt.timedelta(seconds=1)


def test_append_session_window_emits_closed_sessions(spark, sf_dir,
                                                     tmp_path):
    ev = load_table(spark, "events", sf_dir)
    src = tmp_path / "drops"
    src.mkdir()
    for tag, parity in (("a", 0), ("b", 1)):
        staged = tmp_path / f"stage_{tag}"
        (ev.filter(ev.event_id % 2 == parity)
         .coalesce(1).write.mode("overwrite").parquet(str(staged)))
        part = glob.glob(str(staged / "part-*.parquet"))[0]
        shutil.copy(part, src / f"{tag}.parquet")

    E.run_session_window_stream_append(
        spark, str(src), str(tmp_path / "ck_app"), "sess_append_test"
    )
    got = {
        (r["user_id"], r["session_start_s"]): (
            r["session_end_s"], r["n_events"], r["session_value"])
        for r in spark.sql("SELECT * FROM sess_append_test").collect()
    }
    want = {
        (r["user_id"], r["start_s"]): (r["end_s"], r["n_events"],
                                       r["session_value"])
        for r in events_session_window(spark, sf_dir).select(
            "user_id",
            F.expr("timestampdiff(SECOND, TIMESTAMP '1970-01-01 00:00:00',"
                   " session_start)").cast("long").alias("start_s"),
            F.expr("timestampdiff(SECOND, TIMESTAMP '1970-01-01 00:00:00',"
                   " session_end)").cast("long").alias("end_s"),
            "n_events", "session_value",
        ).collect()
    }
    # every emitted session is a true batch session, emitted once
    assert got and set(got) <= set(want)
    for k, v in got.items():
        assert want[k] == v

    # every session the final watermark STRICTLY closed must have
    # emitted; only the open tail may be missing
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    wm_s = int((max_ts - _WM - dt.datetime(1970, 1, 1)).total_seconds())
    margin_s = int(_MARGIN.total_seconds())
    must_emit = {k for k, v in want.items() if v[0] + margin_s < wm_s}
    assert must_emit, "fixture vacuous: watermark closed nothing"
    missing = must_emit - set(got)
    assert not missing, f"closed sessions never emitted: {missing}"
    # the open tail exists (append mode is not a complete rebuild)
    assert len(got) < len(want)
