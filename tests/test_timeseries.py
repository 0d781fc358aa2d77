"""Semantics tests for event_time_weighted_avg and events_ohlc.

The oracle battery hash-verifies both against DuckDB; these pin the
WEIGHTING and ORDERING semantics on hand-built fixtures where the
right answer is computable by hand.
"""

from __future__ import annotations

import datetime as dt

from saurav_nayak_recipe_etl_project_spark.plans.temporal import (
    event_time_weighted_avg,
    events_ohlc,
)

SCHEMA = "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"


def _write(spark, tmp_path, rows):
    # events.parquet fixtures go through the catalog loader, which
    # probes the timestamp unit from the parquet footer; pyspark
    # writes MICROS, the probe handles that.
    df = spark.createDataFrame(rows, SCHEMA)
    dest = str(tmp_path / "events.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(dest)
    return str(tmp_path)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_twa_weights_by_holding_time(spark, tmp_path):
    # user 1: value 10.0 held 9s, then 20.0 held 1s, then last event
    # (no interval). TWA = (10*9 + 20*1) / 10 = 11.0 — a plain AVG
    # would say 30.0 (and include the danging last value).
    rows = [
        (1, _ts("2024-01-01T00:00:00"), 1, "view", 10.0, "{}"),
        (2, _ts("2024-01-01T00:00:09"), 1, "view", 20.0, "{}"),
        (3, _ts("2024-01-01T00:00:10"), 1, "view", 90.0, "{}"),
    ]
    out = event_time_weighted_avg(spark, _write(spark, tmp_path, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_intervals"] == 2
    assert r["span_us"] == 10_000_000
    assert abs(r["twa_value"] - 11.0) < 1e-12


def test_twa_drops_single_event_and_zero_span_users(spark, tmp_path):
    same = _ts("2024-01-01T00:00:00")
    rows = [
        # user 1: single event -> no interval -> excluded
        (1, same, 1, "view", 10.0, "{}"),
        # user 2: two events at the SAME timestamp -> zero span -> excluded
        (2, same, 2, "view", 10.0, "{}"),
        (3, same, 2, "view", 20.0, "{}"),
        # user 3: a real interval -> kept
        (4, same, 3, "view", 5.0, "{}"),
        (5, _ts("2024-01-01T00:00:02"), 3, "view", 7.0, "{}"),
    ]
    out = event_time_weighted_avg(spark, _write(spark, tmp_path, rows)).collect()
    assert {r["user_id"] for r in out} == {3}
    assert abs(out[0]["twa_value"] - 5.0) < 1e-12


def test_ohlc_open_close_follow_event_time_not_value(spark, tmp_path):
    rows = [
        # one type, one day: open must be the EARLIEST value (3.0),
        # close the LATEST (4.0), regardless of magnitudes between
        (1, _ts("2024-01-01T01:00:00"), 1, "trade", 3.0, "{}"),
        (2, _ts("2024-01-01T02:00:00"), 1, "trade", 99.0, "{}"),
        (3, _ts("2024-01-01T03:00:00"), 1, "trade", 0.5, "{}"),
        (4, _ts("2024-01-01T04:00:00"), 1, "trade", 4.0, "{}"),
        # second day opens its own bar
        (5, _ts("2024-01-02T00:00:00"), 1, "trade", 7.0, "{}"),
    ]
    out = {(r["event_type"], str(r["day"])): r
           for r in events_ohlc(spark, _write(spark, tmp_path, rows)).collect()}
    bar = out[("trade", "2024-01-01")]
    assert bar["open"] == 3.0 and bar["close"] == 4.0
    assert bar["high"] == 99.0 and bar["low"] == 0.5
    assert bar["n_events"] == 4 and abs(bar["volume"] - 106.5) < 1e-9
    assert out[("trade", "2024-01-02")]["open"] == 7.0


def test_ohlc_tie_breaks_on_event_id(spark, tmp_path):
    # two events at the identical timestamp: event_id decides which is
    # "first" — deterministic across partitionings
    same = _ts("2024-01-01T12:00:00")
    rows = [
        (10, same, 1, "tick", 1.0, "{}"),
        (11, same, 1, "tick", 2.0, "{}"),
    ]
    out = events_ohlc(spark, _write(spark, tmp_path, rows)).collect()
    assert len(out) == 1
    assert out[0]["open"] == 1.0 and out[0]["close"] == 2.0


def test_session_top_paths_orders_within_session(spark, tmp_path):
    from saurav_nayak_recipe_etl_project_spark.plans.temporal import (
        session_top_paths,
    )

    base = _ts("2024-01-01T00:00:00")
    rows = [
        # user 1 session: view > click > purchase (+ a 4th event that
        # must NOT appear in the path)
        (1, base, 1, "view", 1.0, "{}"),
        (2, base + dt.timedelta(seconds=10), 1, "click", 1.0, "{}"),
        (3, base + dt.timedelta(seconds=20), 1, "purchase", 1.0, "{}"),
        (4, base + dt.timedelta(seconds=30), 1, "error", 1.0, "{}"),
        # >30min later: a NEW session for the same user, single event
        (5, base + dt.timedelta(seconds=2000), 1, "signup", 1.0, "{}"),
        # user 2: same 3-step path again
        (6, base, 2, "view", 1.0, "{}"),
        (7, base + dt.timedelta(seconds=5), 2, "click", 1.0, "{}"),
        (8, base + dt.timedelta(seconds=9), 2, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet"))
    out = {r["path"]: r for r in
           session_top_paths(spark, str(tmp_path)).collect()}
    assert out["view>click>purchase"]["n_sessions"] == 2
    assert out["view>click>purchase"]["rank"] == 1
    assert out["signup"]["n_sessions"] == 1


def test_km_risk_table_monotone_and_conserving(spark, tmp_path):
    """n_at_risk decreases as t advances, starts at the full cohort,
    and total converted+censored equals the cohort size."""
    from saurav_nayak_recipe_etl_project_spark.plans.temporal import (
        KM_HORIZON_S, km_risk_table,
    )

    base = _ts("2024-01-01T00:00:00")
    rows, eid = [], 0
    for uid in range(12):
        rows.append((eid, base, uid, "view", 1.0, "{}")); eid += 1
        if uid < 5:  # converters at distinct times
            rows.append((eid, base + dt.timedelta(seconds=100 + uid), uid,
                         "purchase", 1.0, "{}")); eid += 1
    df = spark.createDataFrame(rows, SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet"))
    out = sorted(km_risk_table(spark, str(tmp_path)).collect(),
                 key=lambda r: r["t_seconds"])
    assert out[0]["n_at_risk"] == 12
    risks = [r["n_at_risk"] for r in out]
    assert risks == sorted(risks, reverse=True)
    assert sum(r["n_converted"] + r["n_censored"] for r in out) == 12
    # the 7 non-converters are censored at the horizon row
    horizon = [r for r in out if r["t_seconds"] == KM_HORIZON_S]
    assert horizon and horizon[0]["n_censored"] == 7


def test_growth_decomposition_identity_in_cents(spark):
    from saurav_nayak_recipe_etl_project_spark.plans.temporal import (
        revenue_growth_decomposition,
    )

    rows = revenue_growth_decomposition(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert round(r["delta_revenue"] * 100) == (
            round(r["volume_effect"] * 100) + round(r["value_effect"] * 100)
        )
