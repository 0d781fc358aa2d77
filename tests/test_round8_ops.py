"""Edge-semantics tests for the round-8 SQL-surface entries (their
registry queries are oracle-verified by the driver gate; these pin
what the inferred forms must RESOLVE to): GROUP BY ALL == the explicit
GROUP BY, ORDER BY ALL == the explicit left-to-right sort, and
UNPIVOT INCLUDE NULLS really retains the metric-not-applicable rows
the default EXCLUDE NULLS form drops."""

from __future__ import annotations

from saurav_nayak_recipe_etl_project_spark.registry import QUERIES


def test_groupby_all_matches_explicit_grouping(spark, sf_dir):
    inferred = QUERIES["orders_groupby_all"](spark, sf_dir).collect()
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView(
        "t_orders_r8"
    )
    explicit = spark.sql(
        """
        SELECT o_orderstatus AS status, o_orderpriority AS priority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM t_orders_r8
        GROUP BY o_orderstatus, o_orderpriority
        ORDER BY status, priority, n_orders, cents
        """
    ).collect()
    assert inferred == explicit
    assert len(inferred) > 1


def test_orderby_all_is_left_to_right_sorted(spark, sf_dir):
    rows = QUERIES["customer_segments_orderby_all"](spark, sf_dir).collect()
    keys = [tuple(r) for r in rows]
    assert keys == sorted(keys)
    # (region, nation, segment) is a unique key: ALL is a total order
    assert len({k[:3] for k in keys}) == len(keys)


def test_unpivot_include_nulls_keeps_missing_metrics(spark, sf_dir):
    rows = {
        r["metric"]: r
        for r in QUERIES["order_metrics_unpivot_nulls"](spark, sf_dir)
        .collect()
    }
    assert set(rows) == {"returned_cents", "promo_cents", "taxed_cents"}
    n_orders = {r["n_orders"] for r in rows.values()}
    # INCLUDE NULLS: every metric covers every order, missing or not
    assert len(n_orders) == 1
    # the conditional metrics genuinely go missing on some orders —
    # otherwise INCLUDE NULLS is vacuous and the test proves nothing
    assert any(r["n_missing"] > 0 for r in rows.values())
    for r in rows.values():
        assert 0 <= r["n_missing"] < r["n_orders"]
