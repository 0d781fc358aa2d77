"""The streaming pipeline must reproduce its batch twin exactly when
fed the same files (availableNow drains everything)."""

from __future__ import annotations

import shutil

from saurav_nayak_recipe_etl_project_spark.streaming import events as E


def test_stream_matches_batch(spark, sf_dir, tmp_path):
    src = tmp_path / "drops"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")

    E.run_windowed_stream(
        spark, str(src), str(tmp_path / "ckpt"), query_name="ev_win_test"
    )
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM ev_win_test").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in E.stream_events_window(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_topk_matches_batch(spark, sf_dir, tmp_path):
    src = tmp_path / "drops"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")
    E.run_topk_stream(spark, str(src), str(tmp_path / "ck2"), "topk_test")
    got = [(r["user_id"], r["n_events"], r["total_value"])
           for r in spark.sql(
               "SELECT * FROM topk_test ORDER BY n_events DESC, user_id"
           ).collect()]
    want = [(r["user_id"], r["n_events"], r["total_value"])
            for r in E.top_event_users(spark, sf_dir).collect()]
    assert got == want and len(got) == 10


def test_stream_dedup_drops_redelivered_events(spark, sf_dir, tmp_path):
    src = tmp_path / "drops"
    src.mkdir()
    # the same file delivered twice = upstream at-least-once redelivery
    shutil.copy(f"{sf_dir}/events.parquet", src / "a.parquet")
    shutil.copy(f"{sf_dir}/events.parquet", src / "b.parquet")
    E.run_dedup_stream(spark, str(src), str(tmp_path / "ckd"), "dedup_stream_test")
    got = spark.sql(
        "SELECT COUNT(*) AS n, COUNT(DISTINCT event_id) AS d FROM dedup_stream_test"
    ).collect()[0]
    want = E.load_table(spark, "events", sf_dir).count()
    assert got["n"] == got["d"] == want


def test_multimodal_plumbing(spark, sf_dir):
    from saurav_nayak_recipe_etl_project_spark.operators import multimodal as M

    import pytest

    out = M.multimodal_meta(spark, sf_dir)
    rows = out.limit(5).collect()
    assert {c for c in out.columns} == {"doc_id", "n_bytes", "mean_byte"}
    assert all(r["n_bytes"] > 0 for r in rows)

    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(NotImplementedError):
        M.decode_image_real(M.attach_blobs(docs))


def test_stream_ohlc_matches_batch_across_micro_batches(spark, sf_dir, tmp_path):
    """The algebraic (min_by/max_by) streaming OHLC must equal the
    window-function batch form even when events arrive in TWO
    micro-batches split by event parity — merge order cannot move
    open/close."""
    from saurav_nayak_recipe_etl_project_spark.plans.temporal import events_ohlc

    ev = E.load_table(spark, "events", sf_dir)
    src = tmp_path / "drops"
    src.mkdir()
    # two drops: even event_ids land first, odds later (a shuffle of
    # time order across batches); flatten Spark's directory output to
    # single files so the stream's footer probe sees real parquet files
    import glob

    for tag, parity in (("a", 0), ("b", 1)):
        staged = tmp_path / f"stage_{tag}"
        (ev.filter(ev.event_id % 2 == parity)
         .coalesce(1).write.mode("overwrite").parquet(str(staged)))
        part = glob.glob(str(staged / "part-*.parquet"))[0]
        shutil.copy(part, src / f"{tag}.parquet")

    E.run_ohlc_stream(spark, str(src), str(tmp_path / "cko"), "ohlc_test")
    got = {
        (r["event_type"], str(r["day"])): (
            r["n_events"], r["open"], r["high"], r["low"], r["close"],
            r["volume"],
        )
        for r in spark.sql("SELECT * FROM ohlc_test").collect()
    }
    want = {
        (r["event_type"], str(r["day"])): (
            r["n_events"], r["open"], r["high"], r["low"], r["close"],
            r["volume"],
        )
        for r in events_ohlc(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_stream_static_enrichment_matches_batch(spark, sf_dir, tmp_path):
    """Stream-static broadcast join: the streamed per-segment rollup
    must equal the same join done in batch; users missing from the dim
    land in 'unknown' instead of being dropped."""
    from pyspark.sql import functions as F

    src = tmp_path / "drops"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")

    ev = E.load_table(spark, "events", sf_dir)
    # static dim covering only half the users -> exercises the
    # left-join 'unknown' path
    user_dim = (
        ev.select("user_id").distinct()
        .where(F.col("user_id") % 2 == 0)
        .withColumn(
            "segment",
            F.when(F.col("user_id") % 4 == 0, "gold").otherwise("silver"),
        )
    )
    E.run_enriched_stream(
        spark, str(src), user_dim, str(tmp_path / "cke"), "enrich_test"
    )
    got = {
        (r["segment"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM enrich_test").collect()
    }
    want = {
        (r["segment"], r["event_type"]): (r["n"], r["sum_value"])
        for r in (
            ev.join(F.broadcast(user_dim), "user_id", "left")
            .groupBy(
                F.coalesce("segment", F.lit("unknown")).alias("segment"),
                "event_type",
            )
            .agg(
                F.count("*").alias("n"),
                F.round(
                    F.sum(F.round(F.col("value") * 100).cast("long"))
                    / F.lit(100.0), 2
                ).alias("sum_value"),
            )
            .collect()
        )
    }
    assert got == want and len(got) > 0
    assert any(seg == "unknown" for seg, _ in got)



def test_stream_sliding_window_matches_batch(spark, sf_dir, tmp_path):
    """Overlapping-window streaming state must merge across
    micro-batches to exactly the batch sliding-window result."""
    import glob

    from saurav_nayak_recipe_etl_project_spark.plans.temporal import (
        events_sliding_window,
    )

    ev = E.load_table(spark, "events", sf_dir)
    src = tmp_path / "drops"
    src.mkdir()
    for tag, parity in (("a", 0), ("b", 1)):
        staged = tmp_path / f"stg_{tag}"
        (ev.filter(ev.event_id % 2 == parity)
         .coalesce(1).write.mode("overwrite").parquet(str(staged)))
        part = glob.glob(str(staged / "part-*.parquet"))[0]
        shutil.copy(part, src / f"{tag}.parquet")

    E.run_sliding_stream(spark, str(src), str(tmp_path / "cks"), "slide_test")
    got = {(r["window_start_s"], r["event_type"]): (r["n"], r["sum_value"])
           for r in spark.sql("SELECT * FROM slide_test").collect()}
    want = {(r["window_start_s"], r["event_type"]): (r["n"], r["sum_value"])
            for r in events_sliding_window(spark, sf_dir).collect()}
    assert got == want and len(got) > 0


def test_stream_session_window_matches_batch_across_micro_batches(
        spark, sf_dir, tmp_path):
    """Streaming native session_window must equal the batch
    session_window aggregation even when events arrive in TWO
    micro-batches split by event parity — a session opened in batch 1
    must EXTEND (not duplicate) when batch 2 lands inside its gap."""
    from saurav_nayak_recipe_etl_project_spark.streaming.sessions import (
        events_session_window,
    )

    ev = E.load_table(spark, "events", sf_dir)
    src = tmp_path / "drops"
    src.mkdir()
    import glob

    for tag, parity in (("a", 0), ("b", 1)):
        staged = tmp_path / f"stage_{tag}"
        (ev.filter(ev.event_id % 2 == parity)
         .coalesce(1).write.mode("overwrite").parquet(str(staged)))
        part = glob.glob(str(staged / "part-*.parquet"))[0]
        shutil.copy(part, src / f"{tag}.parquet")

    E.run_session_window_stream(
        spark, str(src), str(tmp_path / "cksw"), "sess_win_test"
    )
    got = {
        (r["user_id"], r["session_start_s"]): (
            r["session_end_s"], r["n_events"], r["session_value"])
        for r in spark.sql("SELECT * FROM sess_win_test").collect()
    }
    from pyspark.sql import functions as F

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
    assert got == want and len(got) > 0
