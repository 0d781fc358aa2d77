"""Semantic pins for the third round-8 continuation batch: sweep-line
concurrency (tie semantics at equal timestamps, midnight splitting),
largest-remainder proration (exact conservation, 1-cent fairness),
and brand audience overlap (Jaccard bounds)."""

from __future__ import annotations

import datetime as dt

from tests.oracle import assert_matches_oracle

from saurav_nayak_recipe_etl_project_spark.registry import ORACLES, QUERIES


def test_new_entries_match_oracles(spark, sf_dir):
    for name in [
        "session_concurrency_peak",
        "order_line_proration",
        "brand_audience_overlap",
    ]:
        assert_matches_oracle(QUERIES[name](spark, sf_dir),
                              ORACLES[name], sf_dir)


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string"
    )
    out = str(tmp_path / "events.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    return str(tmp_path)


def test_concurrency_tie_and_midnight_semantics(spark, tmp_path):
    t = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    rows = [
        # day 1: u1 session [10:00:00.000000, 10:00:00.000000];
        # u2 session starts exactly 1µs later -> NOT concurrent
        # (the -1-before-+1 tie rule at equal marker timestamps)
        (1, t("2024-03-01T10:00:00"), 1, "view", 1.0, "{}"),
        (2, t("2024-03-01T10:00:00.000001"), 2, "view", 1.0, "{}"),
        # day 1: u3 and u4 genuinely overlap [11:00, 11:10] x [11:05]
        (3, t("2024-03-01T11:00:00"), 3, "view", 1.0, "{}"),
        (4, t("2024-03-01T11:10:00"), 3, "view", 1.0, "{}"),
        (5, t("2024-03-01T11:05:00"), 4, "view", 1.0, "{}"),
        # u5 session spans midnight: [23:50 day1, 00:20 day2]
        # (10-min gaps keep it one 30-min-gap session)
        (6, t("2024-03-01T23:50:00"), 5, "view", 1.0, "{}"),
        (7, t("2024-03-02T00:20:00"), 5, "view", 1.0, "{}"),
        # day 2: u6 overlaps the spilled piece at 00:10
        (8, t("2024-03-02T00:10:00"), 6, "view", 1.0, "{}"),
    ]
    d = _write_events(spark, tmp_path, rows)
    got = {
        r["day"].isoformat(): (r["n_sessions"], r["peak_concurrent"])
        for r in QUERIES["session_concurrency_peak"](spark, d).collect()
    }
    # day 1: 5 sessions touch it (u1, u2, u3, u4, u5's first piece);
    # peak 2 from the genuine 11:05 overlap — the 1µs-apart pair at
    # 10:00 must NOT register as concurrent
    assert got["2024-03-01"] == (5, 2)
    # day 2: u5's spilled piece + u6 -> 2 sessions, concurrent at 00:10
    assert got["2024-03-02"] == (2, 2)


def test_proration_conserves_and_is_fair(spark, sf_dir):
    rows = QUERIES["order_line_proration"](spark, sf_dir).collect()
    orders = {
        r["o_orderkey"]: round(r["o_totalprice"] * 100)
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_totalprice")
        .collect()
    }
    by_order: dict = {}
    for r in rows:
        by_order.setdefault(r["l_orderkey"], []).append(r)
    assert by_order
    for ok, lines in by_order.items():
        alloc = sum(r["alloc_cents"] for r in lines)
        total = orders[ok]
        assert alloc == total, f"order {ok}: {alloc} != {total}"
        # fairness: every allocation within 1 cent of the exact share
        sum_cents = sum(r["line_cents"] for r in lines)
        for r in lines:
            exact = total * r["line_cents"] / sum_cents
            assert abs(r["alloc_cents"] - exact) < 1.0 + 1e-9


def test_audience_overlap_bounds(spark, sf_dir):
    rows = QUERIES["brand_audience_overlap"](spark, sf_dir).collect()
    assert rows
    jac = [r["jaccard_ppm"] for r in rows]
    assert jac == sorted(jac, reverse=True)
    for r in rows:
        assert r["brand_a"] < r["brand_b"]
        assert 0 < r["n_both"] <= min(r["n_a"], r["n_b"])
        assert 0 < r["jaccard_ppm"] <= 1_000_000


def test_daily_load_consistent_with_peak(spark, sf_dir):
    from tests.oracle import assert_matches_oracle as amo

    from saurav_nayak_recipe_etl_project_spark.registry import (
        ORACLES as O2,
        QUERIES as Q2,
    )

    amo(Q2["session_daily_load"](spark, sf_dir),
        O2["session_daily_load"], sf_dir)
    load = {r["day"]: r for r in
            Q2["session_daily_load"](spark, sf_dir).collect()}
    peak = {r["day"]: r for r in
            Q2["session_concurrency_peak"](spark, sf_dir).collect()}
    assert set(load) == set(peak) and load
    day_us = 86_400_000_000
    for d, r in load.items():
        p = peak[d]
        assert r["n_sessions"] == p["n_sessions"]
        # the mean of a curve never exceeds its max:
        # load_us <= peak * day_us; and each session piece carries
        # at least 1 microsecond
        assert r["n_sessions"] <= r["load_us"] <= (
            p["peak_concurrent"] * day_us
        )


def test_lead_lag_ccf_shape(spark, sf_dir):
    from tests.oracle import assert_matches_oracle as amo

    from saurav_nayak_recipe_etl_project_spark.registry import (
        ORACLES as O3,
        QUERIES as Q3,
    )

    amo(Q3["view_purchase_lead_lag"](spark, sf_dir),
        O3["view_purchase_lead_lag"], sf_dir)
    rows = {r["lag"]: r for r in
            Q3["view_purchase_lead_lag"](spark, sf_dir).collect()}
    assert set(rows) == set(range(-3, 4))
    for r in rows.values():
        assert -1.0 <= r["corr"] <= 1.0
        assert r["n_days"] > 2
    # shifting by one day costs at most one overlap day per end
    ns = [rows[k]["n_days"] for k in sorted(rows)]
    assert max(ns) - min(ns) <= 2 * 3


def test_acf_bounds(spark, sf_dir):
    from tests.oracle import assert_matches_oracle as amo

    from saurav_nayak_recipe_etl_project_spark.registry import (
        ORACLES as O4,
        QUERIES as Q4,
    )

    amo(Q4["daily_event_acf"](spark, sf_dir),
        O4["daily_event_acf"], sf_dir)
    rows = {r["lag"]: r for r in
            Q4["daily_event_acf"](spark, sf_dir).collect()}
    assert set(rows) == set(range(1, 8))
    for r in rows.values():
        assert -1.0 <= r["acf"] <= 1.0 and r["n_days"] > 2
