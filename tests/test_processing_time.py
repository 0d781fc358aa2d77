"""processingTime-trigger soak: a RESIDENT streaming query (fires on
a wall-clock cadence, the production deployment shape) fed files
while it is live must converge to the batch twin over the full
corpus. Every other streaming test uses availableNow drain-and-stop;
this is the one place the continuous trigger path — repeated empty
micro-batches, file pickup between triggers, caller-owned stop() —
is exercised. Bounded wall cost: ~5-10 s of trigger cadence."""

from __future__ import annotations

import shutil
import time

from saurav_nayak_recipe_etl_project_spark.streaming import events as E


def _rows(spark, name):
    return {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }


def test_processing_time_stream_converges_to_batch(spark, sf_dir, tmp_path):
    src = tmp_path / "drops"
    src.mkdir()
    # first file present BEFORE start; second lands while the query is
    # live, so a later wall-clock trigger must pick it up
    shutil.copy(f"{sf_dir}/events.parquet", src / "a.parquet")

    q = E.run_windowed_stream_continuous(
        spark, str(src), str(tmp_path / "ckpt"), "ev_win_soak"
    )
    try:
        want_half = _rows(spark, "ev_win_soak")  # may still be empty
        deadline = time.time() + 60
        # wait until the first file's counts are in
        while time.time() < deadline:
            if q.lastProgress and q.recentProgress:
                done = sum(p["numInputRows"] for p in q.recentProgress)
                if done > 0 and _rows(spark, "ev_win_soak"):
                    break
            time.sleep(0.25)
        # second delivery while live — the soak part. The expected
        # frame is the batch twin over the DOUBLED corpus (never
        # 2*rounded-sum: rounding doesn't distribute over the double)
        shutil.copy(f"{sf_dir}/events.parquet", src / "b.parquet")
        from saurav_nayak_recipe_etl_project_spark.sources.catalog import (
            load_table,
        )

        ev = load_table(spark, "events", sf_dir)
        want = {
            (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
            for r in E._windowed(ev.unionAll(ev)).collect()
        }
        while time.time() < deadline:
            if _rows(spark, "ev_win_soak") == want:
                break
            time.sleep(0.25)
        assert _rows(spark, "ev_win_soak") == want
        # the query is still ALIVE after convergence (resident, not
        # drained): that's the processingTime contract under test
        assert q.isActive
        del want_half
    finally:
        q.stop()
        q.awaitTermination(30)
