"""Incrementally-maintained quality scorecard (streaming/
scorecard_mv.py): the streamed MV must equal the registered F75 batch
scorecard row-for-row, replay idempotently, and survive a checkpoint
restart on the real readStream path.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from saurav_nayak_recipe_etl_project_spark.registry import QUERIES
from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table
from saurav_nayak_recipe_etl_project_spark.streaming.scorecard_mv import (
    read_scorecard_counts,
    run_scorecard_stream,
    scorecard_from_counts,
    scorecard_process_batch,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_scorecard_equals_batch_entry(spark, sf_dir, tmp_path):
    docs = load_table(spark, "documents", sf_dir)
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    mid = (lo + hi) // 2
    state = str(tmp_path / "state")
    scorecard_process_batch(docs.filter(F.col("doc_id") <= mid), 0, state)
    scorecard_process_batch(docs.filter(F.col("doc_id") > mid), 1, state)
    got = scorecard_from_counts(read_scorecard_counts(spark, state))
    batch = QUERIES["source_quality_scorecard"](spark, sf_dir)
    assert _rows(got) == _rows(batch)


def test_replay_is_idempotent(spark, sf_dir, tmp_path):
    docs = load_table(spark, "documents", sf_dir).limit(200)
    state = str(tmp_path / "state")
    scorecard_process_batch(docs, 0, state)
    once = _rows(read_scorecard_counts(spark, state))
    scorecard_process_batch(docs, 0, state)  # replay overwrites
    assert _rows(read_scorecard_counts(spark, state)) == once


def test_fully_rejected_source_keeps_zero_kept_row(spark, tmp_path):
    """r11 review finding: a source whose EVERY document is flagged
    has no `_kept` count in the MV state, but the F75 report (and the
    verbatim oracle) still carries (source, '_kept', 0) — the rollup
    must synthesize it."""
    from pyspark.sql import Row

    docs = spark.createDataFrame([
        # 'bad' docs: too short -> flagged by the length rule
        Row(doc_id=1, text="x", lang="en", source="bad", n_chars=1),
        Row(doc_id=2, text="y", lang="en", source="bad", n_chars=1),
        Row(doc_id=3,
            text=("many various distinct english words compose this "
                  "entirely unremarkable yet sufficiently long sample "
                  "paragraph about nothing in particular"),
            lang="en", source="ok", n_chars=135),
    ])
    state = str(tmp_path / "state")
    scorecard_process_batch(docs, 0, state)
    got = scorecard_from_counts(read_scorecard_counts(spark, state))
    kept = {r["source"]: (r["n_docs"], r["share_ppm"])
            for r in got.where(F.col("reason") == "_kept").collect()}
    assert kept["bad"] == (0, 0), kept
    assert kept["ok"][0] == 1


def test_real_stream_with_restart(spark, sf_dir, tmp_path):
    docs = load_table(spark, "documents", sf_dir)
    src = str(tmp_path / "drops")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")

    def land(i, df):
        d = str(tmp_path / f"stage_{i}")
        df.coalesce(1).write.parquet(d)
        shutil.copy(glob.glob(f"{d}/part-*.parquet")[0],
                    f"{src}/{i}.parquet")

    land(0, docs.where(F.col("doc_id") % 2 == 0))
    run_scorecard_stream(spark, src, ckpt, state)   # lifetime 1
    land(1, docs.where(F.col("doc_id") % 2 == 1))
    run_scorecard_stream(spark, src, ckpt, state)   # lifetime 2 resumes
    got = scorecard_from_counts(read_scorecard_counts(spark, state))
    assert _rows(got) == _rows(
        QUERIES["source_quality_scorecard"](spark, sf_dir))
