"""Semantics tests for quality_weighted_sample (oracle battery covers
the hash match; these pin the decision properties)."""

from __future__ import annotations

from saurav_nayak_recipe_etl_project_spark.operators.text import (
    quality_weighted_sample,
)

SF = "/root/testdata/sf0.001"


def test_weight_monotonic_in_quality_components(spark, tmp_path):
    # long stopword-rich prose must get a strictly higher weight than a
    # short punctuation-heavy fragment
    rows = [
        (1, "the a of to and in is it " * 8, "en", "src1", 0),
        (2, "#@! $% ^&*", "en", "src1", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r for r in
           quality_weighted_sample(spark, str(tmp_path)).collect()}
    # doc 1 has near-max weight -> kept with ~96% probability; its
    # specific hash keeps it (pinned: deterministic, not flaky)
    if 1 in out and 2 in out:
        assert out[1]["w_ppm"] > out[2]["w_ppm"]
    assert 1 in out  # high-quality doc survives under its content hash


def test_duplicate_texts_make_identical_decisions(spark, tmp_path):
    text = "value table row hash " * 10
    rows = [(i, text, "en", f"src{i % 3}", 0) for i in range(6)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = quality_weighted_sample(spark, str(tmp_path)).collect()
    # all six copies share the content hash -> all kept or all dropped
    assert len(out) in (0, 6)
    if out:
        assert len({(r["u_ppm"], r["w_ppm"]) for r in out}) == 1


def test_sample_rate_tracks_weight(spark):
    # corpus-level sanity: the kept fraction lies between the min and
    # max keep probability implied by the weights
    out = quality_weighted_sample(spark, SF)
    rows = out.collect()
    n_all = spark.read.parquet(f"{SF}/documents.parquet").count()
    rate = len(rows) / n_all
    assert 0.3 < rate < 1.0  # w_ppm floors well above 300k on this corpus
