"""Incrementally-maintained clip-calibration stats (streaming/
clipstats_mv.py): the streamed MV must equal the registered F71 batch
readout row-for-row, replay idempotently, survive compaction, and
recover across a checkpoint restart on the real readStream path.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from saurav_nayak_recipe_etl_project_spark.registry import QUERIES
from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table
from saurav_nayak_recipe_etl_project_spark.streaming.clipstats_mv import (
    clip_stats_from_counts,
    clipstats_process_batch,
    compact_clipstats_state,
    read_clipstats_counts,
    run_clipstats_stream,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_clipstats_equals_batch_entry(spark, sf_dir, tmp_path):
    emb = load_table(spark, "embeddings", sf_dir)
    lo, hi = emb.agg(F.min("vec_id"), F.max("vec_id")).first()
    mid = (lo + hi) // 2
    state = str(tmp_path / "state")
    clipstats_process_batch(emb.filter(F.col("vec_id") <= mid), 0, state)
    clipstats_process_batch(emb.filter(F.col("vec_id") > mid), 1, state)
    got = clip_stats_from_counts(read_clipstats_counts(spark, state))
    batch = QUERIES["embedding_dim_clip_stats"](spark, sf_dir)
    assert _rows(got) == _rows(batch)


def test_replay_is_idempotent_and_compaction_invariant(spark, sf_dir,
                                                       tmp_path):
    emb = load_table(spark, "embeddings", sf_dir)
    lo, hi = emb.agg(F.min("vec_id"), F.max("vec_id")).first()
    mid = (lo + hi) // 2
    state = str(tmp_path / "state")
    clipstats_process_batch(emb.filter(F.col("vec_id") <= mid), 0, state)
    clipstats_process_batch(emb.filter(F.col("vec_id") <= mid), 0, state)
    clipstats_process_batch(emb.filter(F.col("vec_id") > mid), 1, state)
    before = _rows(clip_stats_from_counts(
        read_clipstats_counts(spark, state)))
    removed = compact_clipstats_state(spark, state)
    assert removed == 1
    dirs = [d for d in os.listdir(f"{state}/counts")
            if d.startswith("batch_id=")]
    assert dirs == ["batch_id=1"]
    after = _rows(clip_stats_from_counts(
        read_clipstats_counts(spark, state)))
    assert after == before


def test_real_stream_with_restart(spark, sf_dir, tmp_path):
    emb = load_table(spark, "embeddings", sf_dir)
    src = str(tmp_path / "drops")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")

    def land(i, df):
        d = str(tmp_path / f"stage_{i}")
        df.coalesce(1).write.parquet(d)
        shutil.copy(glob.glob(f"{d}/part-*.parquet")[0],
                    f"{src}/{i}.parquet")

    land(0, emb.where(F.col("vec_id") % 2 == 0))
    run_clipstats_stream(spark, src, ckpt, state)   # lifetime 1
    land(1, emb.where(F.col("vec_id") % 2 == 1))
    run_clipstats_stream(spark, src, ckpt, state)   # lifetime 2 resumes
    got = clip_stats_from_counts(read_clipstats_counts(spark, state))
    assert _rows(got) == _rows(
        QUERIES["embedding_dim_clip_stats"](spark, sf_dir))
