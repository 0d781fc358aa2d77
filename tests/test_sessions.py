"""Stateful sessionization: the streaming operator's completed
sessions must agree with the batch twin (each user's final session
legitimately stays open in state when the stream drains)."""

from __future__ import annotations

import shutil

from saurav_nayak_recipe_etl_project_spark.streaming import sessions as S


def test_sessions_survive_micro_batch_boundaries(spark, sf_dir, tmp_path):
    """Split the events by time into two files and force one file per
    micro-batch: sessions spanning the split must merge via the state
    store, reproducing the same completed sessions as a single batch."""
    from pyspark.sql import functions as F

    from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table

    events = load_table(spark, "events", sf_dir)
    us = F.expr("timestampdiff(MICROSECOND, "
                "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    cut = events.agg(F.expr(
        "percentile(timestampdiff(MICROSECOND, "
        "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts), 0.5)"
    )).collect()[0][0]
    src = tmp_path / "drops"
    src.mkdir()
    for tag, cond in [("a", us <= cut), ("b", us > cut)]:
        half_dir = tmp_path / f"half_{tag}"
        # re-emit with ns ts as long to match the stream reader's schema
        # (exact integer us -> ns; a double round-trip would lose us
        # precision at epoch scale)
        ns = (F.expr("timestampdiff(MICROSECOND, "
                     "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)") * 1000)
        (events.filter(cond)
         .withColumn("ts", ns.cast("long"))
         .coalesce(1).write.parquet(str(half_dir)))
        import glob
        import shutil as sh

        part = glob.glob(f"{half_dir}/part-*.parquet")[0]
        sh.copy(part, src / f"{tag}.parquet")

    S.run_session_stream(
        spark, str(src), str(tmp_path / "ckpt2"), query_name="sess_mb_test",
        max_files_per_trigger=1,
    )
    streamed = spark.sql(
        "SELECT user_id, n_events FROM sess_mb_test"
    ).collect()
    batch = S.sessionize_events(spark, sf_dir).collect()
    last = {}
    for r in batch:
        cur = last.get(r["user_id"])
        if cur is None or r["session_id"] > cur["session_id"]:
            last[r["user_id"]] = r
    want = sorted(
        (r["user_id"], r["n_events"]) for r in batch
        if last[r["user_id"]]["session_id"] != r["session_id"]
    )
    got = sorted((r["user_id"], r["n_events"]) for r in streamed)
    assert got == want and len(got) > 0


def test_native_session_window_agrees_with_lag_cumsum(spark, sf_dir):
    """Two independent sessionization algorithms (built-in
    session_window vs lag+cumsum) must produce the same sessions."""
    from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table

    events = load_table(spark, "events", sf_dir)
    native = sorted(
        (r["user_id"], r["session_start"], r["n_events"])
        for r in S.sessionize_native(events).collect()
    )
    ours = sorted(
        (r["user_id"], r["session_start"], r["n_events"])
        for r in S.sessionize_batch(events).collect()
    )
    assert native == ours


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


def test_exact_boundary_gap_semantics_match_native(spark):
    """Exact-boundary fixture: a gap EXACTLY equal to the session
    duration MERGES in Spark's session_window (empirically: windows
    merge while next.start <= prev.end); one microsecond more splits.
    The lag+cumsum path must agree on both sides of the boundary."""
    from pyspark.sql import functions as F

    events = spark.createDataFrame(
        [
            (1, 1, "2024-01-01 00:00:00.000000"),
            (2, 1, "2024-01-01 00:30:00.000000"),  # gap == 30:00 → merges
            (3, 2, "2024-01-01 00:00:00.000000"),
            (4, 2, "2024-01-01 00:30:00.000001"),  # gap > 30:00 → splits
        ],
        "event_id long, user_id long, ts_s string",
    ).select("event_id", "user_id",
             F.col("ts_s").cast("timestamp_ntz").alias("ts"))
    ours = sorted(
        (r["user_id"], r["session_start"], r["n_events"])
        for r in S.sessionize_batch(events).collect()
    )
    native = sorted(
        (r["user_id"], r["session_start"], r["n_events"])
        for r in S.sessionize_native(events).collect()
    )
    assert ours == native == [
        (1, "2024-01-01 00:00:00", 2),
        (2, "2024-01-01 00:00:00", 1),
        (2, "2024-01-01 00:30:00", 1),
    ]


def test_session_fn_sorts_across_chunks():
    """applyInPandasWithState delivers a group as multiple unordered
    chunks; the state fn must sort the WHOLE group, not per chunk."""
    import pandas as pd

    class FakeState:
        exists = False

        def update(self, v):
            self.value = v

    # two chunks, out of time order: chunk2's event belongs between
    # chunk1's two sessions
    chunk1 = pd.DataFrame({"ts": pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 02:00:00"])})
    chunk2 = pd.DataFrame({"ts": pd.to_datetime(["2024-01-01 00:10:00"])})
    state = FakeState()
    out = list(S._session_fn((1,), iter([chunk1, chunk2]), state))
    assert len(out) == 1
    closed = out[0]
    # one closed session covering 00:00–00:10 with 2 events
    assert closed["n_events"].tolist() == [2]
    assert str(closed["session_end"].iloc[0]) == "2024-01-01 00:10:00"
    # open session in state holds the 02:00 event
    start_ts, last_ts, n = state.value
    assert n == 1 and start_ts == last_ts
