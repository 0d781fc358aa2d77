"""End-to-end ETL: nested JSONL docs → star schema → lake + warehouse,
round-tripping the testdata exactly; corrupt docs quarantined not fatal."""

from __future__ import annotations

from saurav_nayak_recipe_etl_project_spark import etl
from saurav_nayak_recipe_etl_project_spark.sources import sinks
from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table
from saurav_nayak_recipe_etl_project_spark.sources.documents import (
    export_order_documents,
    read_documents,
)


def test_document_etl_roundtrip(spark, sf_dir, tmp_path):
    src = tmp_path / "docs"
    export_order_documents(spark, sf_dir, str(src))

    counts = etl.run_document_etl(
        spark, str(src), str(tmp_path / "lake"), str(tmp_path / "wh")
    )
    n_orders = load_table(spark, "orders", sf_dir).count()
    n_items = load_table(spark, "lineitem", sf_dir).count()
    assert counts["orders"] == n_orders
    assert counts["order_items"] == n_items

    # warehouse truncate-load round-trip
    wh_orders = sinks.read_warehouse_table(spark, str(tmp_path / "wh" / "orders"))
    assert wh_orders.count() == n_orders
    # truncate semantics: second load does not duplicate
    sinks.load_warehouse_table(wh_orders, str(tmp_path / "wh" / "orders2"))
    sinks.load_warehouse_table(wh_orders, str(tmp_path / "wh" / "orders2"))
    assert sinks.read_warehouse_table(
        spark, str(tmp_path / "wh" / "orders2")
    ).count() == n_orders

    # csv lake is readable with headers
    lake = spark.read.option("header", "true").csv(str(tmp_path / "lake" / "orders"))
    assert lake.count() == n_orders
    assert set(lake.columns) == {"order_id", "user_id", "status", "total", "order_date"}


def test_full_star_etl(spark, sf_dir, tmp_path):
    from saurav_nayak_recipe_etl_project_spark.sources.documents import (
        export_interaction_documents,
        export_user_documents,
    )

    export_user_documents(spark, sf_dir, str(tmp_path / "u"))
    export_order_documents(spark, sf_dir, str(tmp_path / "o"))
    export_interaction_documents(spark, sf_dir, str(tmp_path / "i"))
    counts = etl.run_full_star_etl(
        spark, str(tmp_path / "u"), str(tmp_path / "o"), str(tmp_path / "i"),
        str(tmp_path / "lake"), str(tmp_path / "wh"),
    )
    assert counts["users"] == load_table(spark, "customer", sf_dir).count()
    assert counts["orders"] == load_table(spark, "orders", sf_dir).count()
    assert counts["order_items"] == load_table(spark, "lineitem", sf_dir).count()
    assert counts["interactions"] == load_table(spark, "events", sf_dir).count()
    # all four tables land in both tiers
    for t in ("users", "orders", "order_items", "interactions"):
        assert (tmp_path / "lake" / t).exists()
        assert (tmp_path / "wh" / t).exists()


def test_corrupt_documents_quarantined(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"order_id": 1, "user_id": 2, "status": "O", "total": 5.0, '
        '"order_date": "2024-01-01", "items": [{"line": 1, "part_id": 7, '
        '"quantity": 2.0}]}\n'
        "this is not json\n"
    )
    # Spark requires caching before querying _corrupt_record alone
    docs = read_documents(spark, str(p)).cache()
    assert docs.filter(docs._corrupt_record.isNotNull()).count() == 1
    tables = etl.normalize_documents(docs)
    assert tables["orders"].count() == 1
    assert tables["order_items"].count() == 1
