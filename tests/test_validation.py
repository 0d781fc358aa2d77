"""Validation rules must actually fire: inject dirty rows (mirrors the
reference's rule set in src/data_validation.py) and assert detection."""

from __future__ import annotations

import datetime

from saurav_nayak_recipe_etl_project_spark.operators import validation as V


def _rows(df):
    return {r["record_id"]: r for r in df.collect()}


def test_orders_rules_fire(spark):
    orders = spark.createDataFrame(
        [
            (1, 10, 100.0, "O", "1-URGENT"),       # clean
            (2, 11, -5.0, "O", "5-LOW"),            # bad price
            (3, 12, 50.0, "X", "2-HIGH"),           # bad status
            (4, None, 50.0, "F", "nope"),           # missing fk + bad priority
        ],
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderstatus string, o_orderpriority string",
    )
    got = _rows(V.orders_issues(orders))
    assert got["1"]["status"] == "PASS" and got["1"]["issues"] == "OK"
    assert "Invalid totalprice" in got["2"]["issues"]
    assert "Invalid status" in got["3"]["issues"]
    assert "Missing o_custkey" in got["4"]["issues"]
    assert "Invalid priority" in got["4"]["issues"]


def test_lineitem_orphans_detected(spark):
    lineitem = spark.createDataFrame(
        [
            (1, 1, 1, 5.0, 100.0, 0.1),
            (99, 1, 1, 5.0, 100.0, 0.1),   # orphan order
            (1, 2, 99, 0.0, 100.0, 1.5),   # orphan part + zero qty + bad disc
        ],
        "l_orderkey long, l_linenumber int, l_partkey long, "
        "l_quantity double, l_extendedprice double, l_discount double",
    )
    orders = spark.createDataFrame([(1,)], "o_orderkey long")
    part = spark.createDataFrame([(1,)], "p_partkey long")
    got = _rows(V.lineitem_issues(lineitem, orders, part))
    assert got["1-1"]["status"] == "PASS"
    assert "Links to non-existent order" in got["99-1"]["issues"]
    assert "Links to non-existent part" in got["1-2"]["issues"]
    assert "Zero/Negative quantity" in got["1-2"]["issues"]
    assert "Discount out of range" in got["1-2"]["issues"]


def test_events_domain_and_orphans(spark):
    ts = datetime.datetime(2024, 1, 1)
    events = spark.createDataFrame(
        [(1, ts, 5, "view"), (2, ts, 999, "view"), (3, ts, 5, "hover"),
         (4, None, 5, "click")],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    customer = spark.createDataFrame([(5,)], "c_custkey long")
    got = _rows(V.events_issues(events, customer))
    assert got["1"]["status"] == "PASS"
    assert "Orphaned User ID" in got["2"]["issues"]
    assert "Invalid type" in got["3"]["issues"]
    assert "Missing ts" in got["4"]["issues"]


def test_customer_format_rule(spark):
    customer = spark.createDataFrame(
        [(1, "Customer#000000001", 10.0), (2, "bob", 10.0),
         (3, "Customer#000000003", -4.0)],
        "c_custkey long, c_name string, c_acctbal double",
    )
    got = _rows(V.customer_issues(customer))
    assert got["1"]["status"] == "PASS"
    assert "Invalid name format" in got["2"]["issues"]
    assert "Negative acctbal" in got["3"]["issues"]
