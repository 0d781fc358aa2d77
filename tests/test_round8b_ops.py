"""Semantic pins for the round-8 continuation entries (their registry
queries are oracle-verified by the driver gate; these pin properties
the oracle comparison alone can't state): profile metric sanity, the
fuzzy blocking's completeness vs the unblocked oracle, attribution
credit conservation, entropy bounds, and k-core monotonicity."""

from __future__ import annotations

from tests.oracle import assert_matches_oracle

from saurav_nayak_recipe_etl_project_spark.operators.fuzzy import (
    FUZZY_MAX_DIST,
    PART_NAME_FUZZY_ORACLE,
)
from saurav_nayak_recipe_etl_project_spark.registry import ORACLES, QUERIES


def test_new_entries_match_oracles(spark, sf_dir):
    for name in [
        "table_profile_lineitem",
        "part_name_near_collisions",
        "attribution_credit",
        "source_token_entropy",
        "copurchase_kcore",
    ]:
        assert_matches_oracle(QUERIES[name](spark, sf_dir),
                              ORACLES[name], sf_dir)


def test_second_batch_entries_match_oracles(spark, sf_dir):
    for name in [
        "kmv_user_overlap",
        "segment_decayed_value",
        "orderkey_gap_islands",
        "kmv_distinct_users",  # refitted to the two-phase bottom-k
    ]:
        assert_matches_oracle(QUERIES[name](spark, sf_dir),
                              ORACLES[name], sf_dir)


def test_third_batch_entries_match_oracles(spark, sf_dir):
    for name in ["asof_latest_view_30m", "order_value_psi"]:
        assert_matches_oracle(QUERIES[name](spark, sf_dir),
                              ORACLES[name], sf_dir)


def test_asof_tolerance_nulls_stale_matches(spark, sf_dir):
    """The bounded as-of must produce BOTH regimes on the bursty feed
    (all-fresh or all-stale would make the tolerance vacuous), and
    every fresh match must be a real view event of the same user."""
    rows = QUERIES["asof_latest_view_30m"](spark, sf_dir).collect()
    fresh = [r for r in rows if r["last_view_id_30m"] is not None]
    assert 0 < len(fresh) < len(rows)
    ev = {
        (r["event_id"], r["user_id"])
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("event_id", "user_id")
        .collect()
    }
    for r in fresh:
        assert (r["last_view_id_30m"], r["user_id"]) in ev


def test_psi_shares_sum_to_unity(spark, sf_dir):
    rows = QUERIES["order_value_psi"](spark, sf_dir).collect()
    assert len(rows) == 10
    # ppm shares floor-sum to <= 1e6 and close to it
    for col in ("p_ppm", "q_ppm"):
        tot = sum(r[col] for r in rows)
        assert 1_000_000 - 10 <= tot <= 1_000_000 + 10
    # psi is the term sum, and every term is non-negative
    # ((p-q) and ln(p/q) always share a sign — the KL-symmetry
    # property that makes PSI a distance)
    assert {r["psi_pico"] for r in rows} == {sum(r["term_pico"]
                                                for r in rows)}
    for r in rows:
        assert r["term_pico"] >= 0


def test_fourth_batch_entries_match_oracles(spark, sf_dir):
    for name in ["funnel_three_step", "session_bounce_rate"]:
        assert_matches_oracle(QUERIES[name](spark, sf_dir),
                              ORACLES[name], sf_dir)


def test_funnel_three_step_is_monotone(spark, sf_dir):
    r = QUERIES["funnel_three_step"](spark, sf_dir).collect()[0]
    assert r["n_view"] >= r["n_click"] >= r["n_purchase"] > 0
    # windowed strict order genuinely prunes (not a vacuous 100%)
    assert r["n_click"] < r["n_view"]
    assert r["overall_ppm"] <= r["click_ppm"]


def test_bounce_rate_is_consistent(spark, sf_dir):
    rows = QUERIES["session_bounce_rate"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_bounces"] <= r["n_sessions"]
        assert 0 <= r["bounce_ppm"] <= 1_000_000
        # average depth >= 1 by construction (micro units)
        assert r["depth_micro"] >= 1_000_000


def test_brand_triples_matches_oracle_and_bounds(spark, sf_dir):
    assert_matches_oracle(QUERIES["brand_triples"](spark, sf_dir),
                          ORACLES["brand_triples"], sf_dir)
    rows = QUERIES["brand_triples"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["b1"] < r["b2"] < r["b3"]
        # triple support can never exceed any member's solo support
        assert r["n_orders"] <= min(r["n1"], r["n2"], r["n3"])


def test_kmv_overlap_tracks_exact_intersection(spark, sf_dir):
    """At sf0.001 the union is under K: theta = -1 sentinel and both
    estimates are EXACT. (The estimate regime is exercised at sf0.01
    by the driver gate.)"""
    r = QUERIES["kmv_user_overlap"](spark, sf_dir).collect()[0]
    assert r["theta"] == -1
    assert r["est_intersection"] == r["exact_intersection"]
    assert r["est_union"] >= r["est_intersection"]


def test_decayed_value_is_bounded_by_raw(spark, sf_dir):
    for r in QUERIES["segment_decayed_value"](spark, sf_dir).collect():
        # w = exp(-age/tau) <= 1, so decayed never exceeds raw
        assert 0 < r["decayed_cents"] <= r["raw_cents"]


def test_gap_islands_report_is_consistent(spark, sf_dir):
    rows = QUERIES["orderkey_gap_islands"](spark, sf_dir).collect()
    assert rows, "fixture must contain orderkey gaps"
    n_gaps = {r["n_gaps"] for r in rows}
    total = {r["total_missing"] for r in rows}
    assert len(n_gaps) == 1 and len(total) == 1
    assert len(rows) <= 10
    shown = sum(r["gap_len"] for r in rows)
    assert all(r["gap_len"] >= 1 for r in rows)
    assert all(r["gap_start"] <= r["gap_end"] for r in rows)
    assert shown <= total.pop()


def test_table_profile_metrics_are_consistent(spark, sf_dir):
    rows = {r["col_name"]: r
            for r in QUERIES["table_profile_lineitem"](spark, sf_dir)
            .collect()}
    assert len(rows) == 11
    n_rows = {r["n_rows"] for r in rows.values()}
    assert len(n_rows) == 1  # every metric row saw the same scan
    for r in rows.values():
        assert 0 <= r["n_null"] <= r["n_rows"]
        assert 1 <= r["n_distinct"] <= r["n_rows"]
    # string columns profile NULL min/max by design; numerics never do
    for c in ("l_returnflag", "l_linestatus"):
        assert rows[c]["min_i"] is None and rows[c]["max_i"] is None
    for c in ("l_quantity", "l_extendedprice", "l_shipdate"):
        assert rows[c]["min_i"] is not None
        assert rows[c]["min_i"] <= rows[c]["max_i"]


def test_fuzzy_blocking_loses_no_pair(spark, sf_dir):
    """The length-band blocked join must equal the unblocked all-pairs
    oracle (completeness), and every emitted pair must respect the
    canonical order and the distance band."""
    df = QUERIES["part_name_near_collisions"](spark, sf_dir)
    rows = df.collect()
    assert rows, "fixture corpus must contain near-collisions"
    for r in rows:
        assert r["name_a"] < r["name_b"]
        assert 1 <= r["dist"] <= FUZZY_MAX_DIST
    assert_matches_oracle(df, PART_NAME_FUZZY_ORACLE, sf_dir)


def test_attribution_conserves_purchase_cents(spark, sf_dir):
    """First- and last-touch credit are a PARTITION of the purchase
    total (every purchase's cents land on exactly one touch row or the
    dow=-1 unattributed row); linear credit only loses the integer
    floor remainder, bounded by (n_touch - 1) micro-cents/purchase."""
    import pyspark.sql.functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    total_micro = (
        ev.where(F.col("event_type") == "purchase")
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")))
        .collect()[0][0]
    ) * 1_000_000
    out = QUERIES["attribution_credit"](spark, sf_dir).collect()
    per_model = {}
    for r in out:
        per_model[r["model"]] = (
            per_model.get(r["model"], 0) + r["credit_micro"]
        )
    assert per_model["first"] == total_micro
    assert per_model["last"] == total_micro
    n_purchases = ev.where(F.col("event_type") == "purchase").count()
    lost = total_micro - per_model["linear"]
    assert 0 <= lost < n_purchases * 1_000_000


def test_source_entropy_within_uniform_bound(spark, sf_dir):
    """0 <= H <= ln(n_types): unigram entropy is maximized by the
    uniform distribution (micro-unit slack for the rounding)."""
    import math

    for r in QUERIES["source_token_entropy"](spark, sf_dir).collect():
        upper = math.log(r["n_types"]) * 1e6 + 2
        assert 0 <= r["entropy_micro"] <= upper
        assert r["n_types"] <= r["n_tokens"]


def test_kcore_peeling_is_monotone(spark, sf_dir):
    rows = sorted(
        QUERIES["copurchase_kcore"](spark, sf_dir).collect(),
        key=lambda r: r["peel_round"],
    )
    assert [r["peel_round"] for r in rows] == [1, 2, 3]
    for a, b in zip(rows, rows[1:]):
        assert b["n_nodes"] <= a["n_nodes"]
        assert b["n_edges"] <= a["n_edges"]
