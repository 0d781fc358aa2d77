"""End-to-end training-data export: stage composition semantics and
oracle agreement."""

from __future__ import annotations

from pyspark.sql import functions as F

from saurav_nayak_recipe_etl_project_spark.pipelines import (
    PIPELINE_ORACLES,
    PIPELINE_QUERIES,
    training_data_pipeline,
)


def test_pipeline_manifest_accounting(spark, sf_dir):
    from saurav_nayak_recipe_etl_project_spark.operators.dedup import (
        drop_exact_duplicates,
    )
    from saurav_nayak_recipe_etl_project_spark.operators.text import (
        quality_filter_pipeline,
    )
    from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table

    manifest = training_data_pipeline(spark, sf_dir).collect()
    assert manifest

    docs = load_table(spark, "documents", sf_dir)
    kept = docs.join(
        quality_filter_pipeline(spark, sf_dir).filter("keep").select("doc_id"),
        "doc_id",
    )
    survivors = drop_exact_duplicates(kept).count()
    # every surviving doc lands in exactly one sequence
    assert sum(r["n_docs"] for r in manifest) == survivors
    # the pipeline actually filtered/deduped something on this corpus
    assert survivors < docs.count()
    # no sequence exceeds plausible packing bounds: a sequence holds at
    # least one doc and seq ids are dense non-negative per shard
    assert all(r["n_docs"] >= 1 and r["seq_id"] >= 0 for r in manifest)


def test_pipeline_oracle_match(spark, sf_dir):
    from tests.oracle import assert_matches_oracle

    assert_matches_oracle(
        PIPELINE_QUERIES["training_data_pipeline"](spark, sf_dir),
        PIPELINE_ORACLES["training_data_pipeline"],
        sf_dir,
    )


def test_pipeline_single_plan_no_python(spark, sf_dir):
    """The three stages must fuse into one declarative plan: no Python
    row processing, no cartesian product, and the packing window is
    reached through the filter+dedup (Catalyst sees the whole chain)."""
    import contextlib
    import io

    df = training_data_pipeline(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Scan parquet") <= 2  # documents read at most twice
