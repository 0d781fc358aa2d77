"""Partitioned IVF vector index: directory pruning is real (probed
scan touches only probed list dirs), incremental adds reproduce the
batch build, replay is idempotent, and new vectors are searchable
without a rebuild."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from saurav_nayak_recipe_etl_project_spark.operators import vector_index as V
from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table


def _emb(spark, sf_dir):
    return load_table(spark, "embeddings", sf_dir)


def test_partitioned_search_scans_only_probed_dirs(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    c = V.train_centroids(emb)
    idx = str(tmp_path / "idx")
    V.build_index(emb, idx, c)
    probe = [0, 3, 7]
    pruned = spark.read.parquet(idx).filter(F.col("list_id").isin(probe))
    touched = {
        r["f"] for r in pruned.select(
            F.input_file_name().alias("f")).distinct().collect()
    }
    all_files = {
        r["f"] for r in spark.read.parquet(idx).select(
            F.input_file_name().alias("f")).distinct().collect()
    }
    assert touched, "probed dirs must contain data"
    assert len(touched) < len(all_files)
    for f in touched:
        assert any(f"list_id={p}/" in f for p in probe), f


def test_incremental_adds_match_batch_build_and_replay_idempotent(
        spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    c = V.train_centroids(emb)
    idx = str(tmp_path / "stream_idx")
    half = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    V._add_batch(spark, half, 0, idx, c)
    V._add_batch(spark, rest, 1, idx, c)
    # replaying batch 1 must overwrite its own partitions, not duplicate
    V._add_batch(spark, rest, 1, idx, c)
    streamed = {
        (r["vec_id"], r["list_id"])
        for r in spark.read.parquet(idx).select("vec_id", "list_id").collect()
    }
    batch = {
        (r["vec_id"], r["list_id"])
        for r in V.assign_lists(emb, c).select("vec_id", "list_id").collect()
    }
    assert streamed == batch


def test_new_vectors_searchable_without_rebuild(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    c = V.train_centroids(emb)
    idx = str(tmp_path / "grow_idx")
    # initial index WITHOUT the corpus tail, then add it incrementally
    head = emb.filter(F.col("vec_id") < 100)
    tail = emb.filter(F.col("vec_id") >= 100)
    V._add_batch(spark, head, 0, idx, c)
    V._add_batch(spark, tail, 1, idx, c)
    e = emb.select("vec_id", V._as_double("embedding").alias("v"))
    q = e.filter(F.col("vec_id") < 2).toPandas()
    q_ids = q["vec_id"].to_numpy()
    q_mat = np.stack(q["v"].to_numpy())
    q_mat = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    hits = V.search_index(spark, idx, q_ids, q_mat, c).collect()
    assert hits
    # the incrementally-added tail is visible to search
    assert any(r["neighbor_id"] >= 100 for r in hits)


def test_registry_gates_green(spark, sf_dir):
    from tests.oracle import assert_matches_oracle

    for name in ("ann_index_stream_batch", "ann_index_partitioned_search"):
        assert_matches_oracle(
            V.VECTOR_INDEX_QUERIES[name](spark, sf_dir),
            V.VECTOR_INDEX_ORACLES[name],
            sf_dir,
        )
