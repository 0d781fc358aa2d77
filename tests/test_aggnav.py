"""Aggregate navigator: the routed (summary-table) rollup must equal
the fact-table rollup at every legal grain, read ONLY the summary
files, and refuse illegal grains loudly."""

from __future__ import annotations

import pytest

from saurav_nayak_recipe_etl_project_spark.operators.aggnav import (
    build_daily_order_summary,
    fact_revenue_rollup,
    route_revenue_rollup,
    scan_paths,
)


@pytest.fixture(scope="module")
def summary_path(spark, sf_dir, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("aggnav") / "daily_orders")
    build_daily_order_summary(spark, sf_dir, p)
    return p


@pytest.mark.parametrize("grain", ["day", "month", "year"])
def test_routed_equals_fact(spark, sf_dir, summary_path, grain):
    routed = route_revenue_rollup(spark, summary_path, grain)
    fact = fact_revenue_rollup(spark, sf_dir, grain)
    key = lambda r: r["bucket"]
    assert sorted(map(tuple, routed.collect()), key=lambda t: t[0]) == \
        sorted(map(tuple, fact.collect()), key=lambda t: t[0])
    assert routed.count() > 1


def test_routed_scan_avoids_fact_table(spark, sf_dir, summary_path):
    routed = route_revenue_rollup(spark, summary_path, "month")
    paths = scan_paths(routed)
    assert any(summary_path in p for p in paths)
    assert not any("orders.parquet" in p for p in paths), paths


def test_illegal_grain_raises(spark, summary_path):
    with pytest.raises(ValueError, match="not answerable"):
        route_revenue_rollup(spark, summary_path, "week_of_vendor")


def test_summary_is_calendar_bounded(spark, sf_dir, summary_path):
    """|summary| == |distinct order days| — the frame a 100 TB fact
    table still collapses to."""
    n_days = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .selectExpr("cast(o_orderdate as date) d").distinct().count()
    )
    assert spark.read.parquet(summary_path).count() == n_days
