"""G19 — stream-stream LEFT OUTER interval join: unmatched views must
emit NULL-purchase rows (the semantics the inner join drops), matched
rows must equal the batch twin exactly, and null emission must respect
the watermark contract — views whose join window the final watermark
never passed legitimately stay in state (a stream has no end-of-data
oracle), so the comparison is watermark-aware, not naive equality."""

from __future__ import annotations

import datetime as dt
import shutil

import pyspark.sql.functions as F

from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table
from saurav_nayak_recipe_etl_project_spark.streaming import joins as J

_WM_DELAY = dt.timedelta(hours=2)
_JOIN_WINDOW = dt.timedelta(hours=1)
_MARGIN = dt.timedelta(seconds=1)


def _assert_outer_semantics(spark, sf_dir, query_name):
    got = spark.sql(f"SELECT * FROM {query_name}").collect()
    want = J.view_purchase_attribution_outer(spark, sf_dir).collect()
    assert want

    g_matched = sorted((r["view_id"], r["purchase_id"]) for r in got
                       if r["purchase_id"] is not None)
    w_matched = sorted((r["view_id"], r["purchase_id"]) for r in want
                       if r["purchase_id"] is not None)
    # inner results emit immediately — exact equality, corpus tail included
    assert g_matched == w_matched and g_matched

    g_nulls = {r["view_id"] for r in got if r["purchase_id"] is None}
    w_nulls = {r["view_id"] for r in want if r["purchase_id"] is None}
    # a stream null row is only ever a true batch null (no false expiry)
    assert g_nulls <= w_nulls

    # every unmatched view whose join window the final watermark
    # STRICTLY passed must have been expired and emitted
    ev = load_table(spark, "events", sf_dir)
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    final_wm = max_ts - _WM_DELAY
    view_ts = {
        r["event_id"]: r["ts"]
        for r in ev.where(F.col("event_type") == "view")
        .select("event_id", "ts").collect()
    }
    must_emit = {
        v for v in w_nulls
        if view_ts[v] + _JOIN_WINDOW + _MARGIN < final_wm
    }
    assert must_emit, "fixture vacuous: no expired unmatched views"
    missing = must_emit - g_nulls
    assert not missing, f"expired unmatched views never emitted: {missing}"
    return g_nulls


def test_outer_stream_join_emits_expired_nulls(spark, sf_dir, tmp_path):
    src = tmp_path / "drops"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")

    J.run_attribution_stream_outer(
        spark, str(src), str(tmp_path / "ckpt"), query_name="attr_outer"
    )
    nulls = _assert_outer_semantics(spark, sf_dir, "attr_outer")
    assert nulls  # the unconverted regime is non-empty


def test_outer_join_expires_state_across_micro_batches(spark, sf_dir,
                                                       tmp_path):
    """Two files forced into separate micro-batches: batch 2's events
    push the watermark far past batch 1's join windows, so batch 1's
    unmatched views expire from state cross-batch. Same watermark-aware
    contract as the single-batch run — expiry changes WHEN rows emit,
    never WHAT emits."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ev = load_table(spark, "events", sf_dir)
    cut = ev.agg(
        F.expr("timestampadd(DAY, 7, min(ts))").alias("c")
    ).collect()[0]["c"]
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    early = ev.where(F.col("ts") < F.lit(cut)).select(*cols).toPandas()
    late = ev.where(F.col("ts") >= F.lit(cut)).select(*cols).toPandas()
    assert len(early) > 0 and len(late) > 0

    # single FILES (the stream source probes footers; a Spark
    # directory-style write is not a file)
    src = tmp_path / "drops"
    src.mkdir()
    pq.write_table(pa.Table.from_pandas(early), str(src / "b1.parquet"))
    pq.write_table(pa.Table.from_pandas(late), str(src / "b2.parquet"))

    J.run_attribution_stream_outer(
        spark, str(src), str(tmp_path / "ckpt2"),
        query_name="attr_outer_2b", max_files_per_trigger=1,
    )
    _assert_outer_semantics(spark, sf_dir, "attr_outer_2b")
