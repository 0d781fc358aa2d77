"""As-of join semantics on controlled data: latest right row
at-or-before each left timestamp, per key; equal-time rows match;
no-prior-row yields null."""

from __future__ import annotations

import datetime as dt

from saurav_nayak_recipe_etl_project_spark.operators.asof import asof_join


def _ts(d, h=0):
    return dt.datetime(2024, 1, d, h)


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(5)), (2, 100, _ts(1)), (3, 200, _ts(9)), (4, 300, _ts(9))],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [(100, _ts(2), 11), (100, _ts(4), 12), (100, _ts(6), 13),
         (200, _ts(9), 21)],
        "user_id long, odate timestamp_ntz, okey long",
    )
    out = {
        r["event_id"]: r["asof_value"]
        for r in asof_join(
            left, right, key="user_id", left_ts="ts", right_ts="odate",
            value="okey",
        ).collect()
    }
    assert out[1] == 12      # latest before Jan 5 is Jan 4
    assert out[2] is None    # nothing at-or-before Jan 1
    assert out[3] == 21      # equal timestamps match (at-or-before)
    assert out[4] is None    # key with no right rows
