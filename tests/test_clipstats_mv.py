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


def test_clip_drift_planted_shift_fires_and_replay_stable(spark, sf_dir,
                                                          tmp_path):
    """The G30 alarm: a batch with a planted +0.25 embedding shift
    must read clearly above the in-distribution batches, the readout
    must be replay-stable, and serving stats stay unaffected."""
    from saurav_nayak_recipe_etl_project_spark.streaming.clipstats_mv import (
        clipstats_drift,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    lo, hi = emb.agg(F.min("vec_id"), F.max("vec_id")).first()
    c1 = lo + (hi - lo) // 3
    c2 = lo + 2 * (hi - lo) // 3
    state = str(tmp_path / "state")
    # two in-distribution batches + one shifted: the corpus mix must
    # be MAJORITY in-distribution for the alarm to single out the
    # shifted batch (a 50/50 split diverges symmetrically — both
    # halves read the same JS vs their own average; measured)
    b0 = emb.filter(F.col("vec_id") <= c1)
    b1 = emb.filter((F.col("vec_id") > c1) & (F.col("vec_id") <= c2))
    shifted = emb.filter(F.col("vec_id") > c2).withColumn(
        "embedding",
        F.transform("embedding", lambda x: x.cast("double") + F.lit(0.25)))
    clipstats_process_batch(b0, 0, state)
    clipstats_process_batch(b1, 1, state)
    clipstats_process_batch(shifted, 2, state)
    d1 = {r["batch_id"]: r["js_micro"]
          for r in clipstats_drift(spark, state).collect()}
    assert d1[2] > 2 * max(d1[0], d1[1]), d1
    # replaying batches reproduces identical partials -> identical
    # drift readout
    clipstats_process_batch(shifted, 2, state)
    clipstats_process_batch(b0, 0, state)
    d2 = {r["batch_id"]: r["js_micro"]
          for r in clipstats_drift(spark, state).collect()}
    assert d2 == d1
