"""The streamed per-source token-accounting MV must reproduce the
batch counts exactly across multi-batch ingestion, and feeding it
through the SAME mixture_from_counts rollup must reproduce the F69
batch entry row-for-row (the G22 drift split-of-labor pattern applied
to token accounting).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from saurav_nayak_recipe_etl_project_spark.operators.text import (
    mixture_from_counts,
)
from saurav_nayak_recipe_etl_project_spark.registry import QUERIES
from saurav_nayak_recipe_etl_project_spark.streaming.token_mv import (
    run_source_token_stream,
)


def _split_drops(spark, sf_dir, src):
    """Write the corpus as two disjoint drop files so availableNow +
    maxFilesPerTrigger=1 exercises genuine multi-batch accumulation,
    not a single-batch pass."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = docs.where(F.col("doc_id") % 2 == 0).coalesce(1)
    b = docs.where(F.col("doc_id") % 2 == 1).coalesce(1)
    a.write.parquet(str(src / "drop_a"))
    b.write.parquet(str(src / "drop_b"))
    import glob
    import shutil

    for i, d in enumerate(["drop_a", "drop_b"]):
        part = glob.glob(str(src / d / "part-*.parquet"))[0]
        shutil.copy(part, src / f"{i}.parquet")
        shutil.rmtree(src / d)


def test_token_mv_matches_batch_counts_and_weights(spark, sf_dir,
                                                   tmp_path):
    src = tmp_path / "drops"
    src.mkdir()
    _split_drops(spark, sf_dir, src)
    run_source_token_stream(
        spark, str(src), str(tmp_path / "ckpt"), "token_mv_test",
        max_files_per_trigger=1,
    )
    streamed = spark.sql(
        "SELECT source, n_docs, tokens FROM token_mv_test"
    )
    got_counts = {
        (r["source"], r["n_docs"], r["tokens"])
        for r in streamed.collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want_counts = {
        (r["source"], r["n_docs"], r["tokens"])
        for r in docs.groupBy("source").agg(
            F.count("*").alias("n_docs"),
            F.sum(
                F.size(F.regexp_extract_all(
                    "text", F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), 0
                )).cast("long")
            ).alias("tokens"),
        ).collect()
    }
    assert got_counts == want_counts and len(got_counts) > 1
    # the shared rollup: streamed counts -> identical weight rows
    got = {
        tuple(r) for r in mixture_from_counts(streamed).collect()
    }
    want = {
        tuple(r)
        for r in QUERIES["source_mixture_weights"](
            spark, sf_dir
        ).collect()
    }
    assert got == want
