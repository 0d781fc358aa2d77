"""Streaming MinHash-band dedup: planted near-dups across micro-batches
must be dropped; the stream must agree with the batch twin when files
arrive in doc_id order."""

from __future__ import annotations

from saurav_nayak_recipe_etl_project_spark.streaming import doc_dedup as D

SCHEMA = "doc_id long, lang string, source string, text string"

_BASE = ("the quick brown fox jumps over the lazy dog while the "
         "cat watches from the warm windowsill every single morning")
_OTHER = ("distributed query engines shuffle partitioned data across "
          "executors to evaluate joins and aggregations at scale")

BATCH1 = [
    (1, "en", "web", _BASE),
    (2, "en", "web", _OTHER),
]
# near-dup of doc 1 (one word changed → high jaccard, collides in a
# band deterministically), one exact dup of doc 2, one fresh doc
BATCH2 = [
    (3, "en", "web", _BASE.replace("warm", "cold")),
    (4, "en", "web", _OTHER),
    (5, "en", "web", ("completely different content about cooking "
                      "recipes with fresh vegetables and aromatic "
                      "herbs from the garden simmered slowly")),
]


def _write_batch(spark, rows, path):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(path))
    import glob
    import shutil

    return glob.glob(f"{path}/part-*.parquet")[0], shutil


def test_stream_drops_near_dups_across_batches(spark, tmp_path):
    src = tmp_path / "drops"
    src.mkdir()
    for tag, rows in [("a", BATCH1), ("b", BATCH2)]:
        part, shutil = _write_batch(spark, rows, tmp_path / f"stage_{tag}")
        shutil.copy(part, src / f"{tag}.parquet")

    D.run_doc_dedup_stream(
        spark, str(src), str(tmp_path / "ckpt"),
        str(tmp_path / "state"), str(tmp_path / "out"),
        max_files_per_trigger=1,
    )
    kept = sorted(
        r["doc_id"] for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    # 3 (near-dup of 1) and 4 (exact dup of 2) dropped; 5 fresh kept
    assert kept == [1, 2, 5]


def test_stream_agrees_with_batch_twin(spark, tmp_path):
    src = tmp_path / "drops"
    src.mkdir()
    for tag, rows in [("a", BATCH1), ("b", BATCH2)]:
        part, shutil = _write_batch(spark, rows, tmp_path / f"stage_{tag}")
        shutil.copy(part, src / f"{tag}.parquet")

    D.run_doc_dedup_stream(
        spark, str(src), str(tmp_path / "ckpt"),
        str(tmp_path / "state"), str(tmp_path / "out"),
        max_files_per_trigger=1,
    )
    streamed = sorted(
        r["doc_id"] for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    twin = spark.createDataFrame(BATCH1 + BATCH2, SCHEMA)
    batch_kept = sorted(
        r["doc_id"] for r in D.lsh_band_dedup(twin).filter("kept").collect()
    )
    assert streamed == batch_kept


def test_batch_twin_on_corpus(spark, sf_dir):
    out = D.dedup_stream_lsh_batch(spark, sf_dir)
    rows = out.collect()
    n_docs = len(rows)
    n_kept = sum(r["kept"] for r in rows)
    # the corpus has planted dups, so some docs drop — but most survive
    assert 0 < n_kept < n_docs
