"""Seeder determinism + ETL compatibility; report artifact generation."""

from __future__ import annotations

from saurav_nayak_recipe_etl_project_spark import etl, report
from saurav_nayak_recipe_etl_project_spark.sources import generator


def test_generator_deterministic_and_etl_compatible(spark, tmp_path):
    a = generator.generate_order_documents(spark, n_docs=20).collect()
    b = generator.generate_order_documents(spark, n_docs=20).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))  # fully deterministic
    assert all(1 <= len(r["items"]) <= 8 for r in a)

    src = tmp_path / "seed"
    generator.seed_corpus(spark, str(src), n_docs=20)
    counts = etl.run_document_etl(
        spark, str(src), str(tmp_path / "lake"), str(tmp_path / "wh")
    )
    assert counts["orders"] == 21  # seed doc + 20 synthetic
    assert counts["order_items"] >= 21


def test_report_artifacts(spark, sf_dir, tmp_path):
    path = report.run_report(spark, sf_dir, str(tmp_path / "report"))
    text = open(path).read()
    assert "# Analytics Summary Report" in text
    for name in ("top_parts", "validation_report", "avg_order_value"):
        assert f"## {name}" in text
    assert (tmp_path / "report" / "top_parts").exists()
