"""Pins for the incrementally-maintained IVF index MV
(streaming/ann_mv.py): streamed index == one-shot batch assignment,
replay idempotency, an INDEPENDENT pure-python re-derivation of the
served search, directory pruning on the probed lists, loudness on an
untrained / undersized quantizer, and the real readStream path.
"""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from saurav_nayak_recipe_etl_project_spark.operators.kmeans import (
    _arrow_assign,
    _seed_matrix,
    _vec_micro,
)
from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table
from saurav_nayak_recipe_etl_project_spark.streaming.ann_mv import (
    ANN_MV_LISTS,
    ANN_MV_NPROBE,
    ANN_MV_QUERIES,
    ANN_MV_TOPK,
    ann_mv_process_batch,
    ann_search_mv,
    read_ann_mv,
    run_ann_index_stream,
)


def _split(emb):
    lo, hi = emb.agg(F.min("vec_id"), F.max("vec_id")).first()
    mid = (lo + hi) // 2
    return (emb.filter(F.col("vec_id") <= mid),
            emb.filter(F.col("vec_id") > mid))


def _postings_set(df):
    return sorted(
        (r["vec_id"], r["list_id"], r["dist2"]) for r in df.collect()
    )


def _search_set(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_index_equals_batch_assignment(spark, sf_dir, tmp_path):
    emb = load_table(spark, "embeddings", sf_dir)
    b0, b1 = _split(emb)
    state = str(tmp_path / "state")
    ann_mv_process_batch(b0, 0, state)
    ann_mv_process_batch(b1, 1, state)
    # one-shot twin: quantizer from the seed half, assign the corpus
    C, cids = _seed_matrix(_vec_micro(b0), ANN_MV_LISTS)
    twin = _arrow_assign(_vec_micro(emb), C, cids).select(
        "vec_id", F.col("cluster").cast("long").alias("list_id"), "dist2"
    )
    got = read_ann_mv(spark, state).select("vec_id", "list_id", "dist2")
    assert _postings_set(got) == _postings_set(twin)


def test_replay_is_idempotent_and_search_stable(spark, sf_dir, tmp_path):
    emb = load_table(spark, "embeddings", sf_dir)
    b0, b1 = _split(emb)
    state = str(tmp_path / "state")
    ann_mv_process_batch(b0, 0, state)
    ann_mv_process_batch(b1, 1, state)
    queries = emb.filter(F.col("vec_id") < ANN_MV_QUERIES)
    once_post = _postings_set(
        read_ann_mv(spark, state).select("vec_id", "list_id", "dist2"))
    once_search = _search_set(ann_search_mv(spark, state, queries))
    # replay BOTH batches out of order: batch 0's replay retrains the
    # quantizer on the same rows (deterministic) and every partition
    # overwrite reproduces identical content
    ann_mv_process_batch(b1, 1, state)
    ann_mv_process_batch(b0, 0, state)
    assert _postings_set(
        read_ann_mv(spark, state).select("vec_id", "list_id", "dist2")
    ) == once_post
    assert _search_set(ann_search_mv(spark, state, queries)) == once_search


def test_search_matches_pure_python_rederivation(spark, sf_dir, tmp_path):
    """Independent oracle: the whole train/assign/probe/rerank path
    recomputed driver-side with hashlib + plain ints — no shared code
    with the module under test except `_vec_micro` (quantization is
    the input contract, not the path under test)."""
    emb = load_table(spark, "embeddings", sf_dir)
    b0, _ = _split(emb)
    state = str(tmp_path / "state")
    ann_mv_process_batch(b0, 0, state)
    ann_mv_process_batch(
        emb.join(b0.select("vec_id"), "vec_id", "left_anti"), 1, state)
    queries = emb.filter(F.col("vec_id") < ANN_MV_QUERIES)
    got = _search_set(ann_search_mv(spark, state, queries))

    vecs = {r["vec_id"]: r["v"] for r in _vec_micro(emb).collect()}
    b0_ids = [r["vec_id"] for r in b0.select("vec_id").collect()]
    seeds = sorted(
        b0_ids, key=lambda i: hashlib.md5(str(i).encode()).hexdigest()
    )[:ANN_MV_LISTS]
    cent = [vecs[i] for i in seeds]  # list c = md5-rank order

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    posting = {
        vid: min(range(ANN_MV_LISTS), key=lambda c: (d2(v, cent[c]), c))
        for vid, v in vecs.items()
    }
    expected = []
    for qid in sorted(vecs):
        if qid >= ANN_MV_QUERIES:
            continue
        probed = sorted(
            range(ANN_MV_LISTS), key=lambda c: (d2(vecs[qid], cent[c]), c)
        )[:ANN_MV_NPROBE]
        cand = [v for v in vecs if posting[v] in probed and v != qid]
        ranked = sorted(cand, key=lambda v: (d2(vecs[qid], vecs[v]), v))
        for rank, nid in enumerate(ranked[:ANN_MV_TOPK], start=1):
            expected.append((qid, rank, nid, d2(vecs[qid], vecs[nid])))
    assert got == sorted(expected)


def test_search_scan_prunes_to_probed_dirs(spark, sf_dir, tmp_path):
    emb = load_table(spark, "embeddings", sf_dir)
    b0, b1 = _split(emb)
    state = str(tmp_path / "state")
    ann_mv_process_batch(b0, 0, state)
    ann_mv_process_batch(b1, 1, state)
    probed = [0, 3]
    files = [
        r["f"] for r in
        read_ann_mv(spark, state, lists=probed)
        .select(F.input_file_name().alias("f")).distinct().collect()
    ]
    assert files, "pruned read returned no files"
    assert all(
        any(f"/list_id={p}/" in f for p in probed) for f in files
    ), files


def test_untrained_quantizer_is_loud(spark, sf_dir, tmp_path):
    emb = load_table(spark, "embeddings", sf_dir)
    state = str(tmp_path / "state")
    with pytest.raises(ValueError, match="quantizer not trained"):
        ann_mv_process_batch(emb, 1, state)  # no batch 0 ever ran


def test_seed_batch_too_small_is_loud(spark, sf_dir, tmp_path):
    emb = load_table(spark, "embeddings", sf_dir).limit(ANN_MV_LISTS - 2)
    state = str(tmp_path / "state")
    with pytest.raises(ValueError, match="needs >= k_lists"):
        ann_mv_process_batch(emb, 0, state)


def test_compaction_preserves_view_and_search(spark, sf_dir, tmp_path):
    emb = load_table(spark, "embeddings", sf_dir)
    b0, b1 = _split(emb)
    state = str(tmp_path / "state")
    ann_mv_process_batch(b0, 0, state)
    ann_mv_process_batch(b1, 1, state)
    queries = emb.filter(F.col("vec_id") < ANN_MV_QUERIES)
    before_post = _postings_set(
        read_ann_mv(spark, state).select("vec_id", "list_id", "dist2"))
    before_search = _search_set(ann_search_mv(spark, state, queries))
    from saurav_nayak_recipe_etl_project_spark.streaming.ann_mv import (
        compact_ann_mv_state,
    )

    removed = compact_ann_mv_state(spark, state)
    assert removed > 0
    assert _postings_set(
        read_ann_mv(spark, state).select("vec_id", "list_id", "dist2")
    ) == before_post
    assert _search_set(ann_search_mv(spark, state, queries)) == before_search
    # the list_id hive layout survives compaction (pruning still works)
    dirs = os.listdir(os.path.join(state, "postings", "batch_id=1"))
    assert any(d.startswith("list_id=") for d in dirs), dirs


def test_stream_restart_recovers_from_checkpoint(spark, sf_dir,
                                                 tmp_path):
    """Two query LIFETIMES over one checkpoint: the first drains drop
    0 (trains the quantizer), the query stops, drop 1 lands, a fresh
    query with the SAME checkpoint resumes — it must process ONLY the
    new file (as batch 1, against the frozen centroids) and land the
    same index as the batch twin."""
    import glob
    import shutil

    emb = load_table(spark, "embeddings", sf_dir)
    b0, b1 = _split(emb)
    src = str(tmp_path / "drops")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")

    def land(i, df):
        d = str(tmp_path / f"stage_{i}")
        df.coalesce(1).write.parquet(d)
        shutil.copy(glob.glob(f"{d}/part-*.parquet")[0],
                    f"{src}/{i}.parquet")

    land(0, b0)
    run_ann_index_stream(spark, src, ckpt, state)   # lifetime 1
    n0 = read_ann_mv(spark, state).count()
    assert n0 == b0.count()
    land(1, b1)
    run_ann_index_stream(spark, src, ckpt, state)   # lifetime 2
    batch_state = str(tmp_path / "batch_state")
    ann_mv_process_batch(b0, 0, batch_state)
    ann_mv_process_batch(b1, 1, batch_state)
    assert _postings_set(
        read_ann_mv(spark, state).select("vec_id", "list_id", "dist2")
    ) == _postings_set(
        read_ann_mv(spark, batch_state).select("vec_id", "list_id",
                                               "dist2"))


def test_real_stream_matches_batch_twin(spark, sf_dir, tmp_path):
    emb = load_table(spark, "embeddings", sf_dir)
    b0, b1 = _split(emb)
    src = str(tmp_path / "drops")
    os.makedirs(src)
    # two flat files, one per micro-batch (maxFilesPerTrigger=1),
    # copied in order so the seed half is batch 0 (the token-MV test's
    # drop-file pattern — FileStreamSource orders by mtime)
    import glob
    import shutil

    for i, part_df in enumerate([b0, b1]):
        d = str(tmp_path / f"stage_{i}")
        part_df.coalesce(1).write.parquet(d)
        shutil.copy(glob.glob(f"{d}/part-*.parquet")[0],
                    f"{src}/{i}.parquet")
    state = str(tmp_path / "state")
    run_ann_index_stream(
        spark, src, str(tmp_path / "ckpt"), state,
        max_files_per_trigger=1,
    )
    batch_state = str(tmp_path / "batch_state")
    ann_mv_process_batch(b0, 0, batch_state)
    ann_mv_process_batch(b1, 1, batch_state)
    assert _postings_set(
        read_ann_mv(spark, state).select("vec_id", "list_id", "dist2")
    ) == _postings_set(
        read_ann_mv(spark, batch_state).select("vec_id", "list_id", "dist2")
    )


def test_drift_alarm_fires_on_shifted_batch(spark, sf_dir, tmp_path):
    """The frozen-quantizer drift loop (r11 verdict item 3): a batch
    drawn from a SHIFTED embedding distribution piles into few posting
    lists, and its occupancy-mix JS divergence from the corpus mix
    jumps far above the in-distribution batches' — while serving the
    seed queries from the index stays exactly as it was before the
    drifted drop extended the candidate set it probes."""
    from saurav_nayak_recipe_etl_project_spark.streaming.ann_mv import (
        ann_mv_drift,
        ann_mv_occupancy,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    first, second = _split(emb)
    state = str(tmp_path / "state")
    ann_mv_process_batch(first, 0, state)
    ann_mv_process_batch(second, 1, state)
    baseline = {r["q_vec_id"]: r["neighbor_id"]
                for r in ann_search_mv(
                    spark, state,
                    emb.filter(F.col("vec_id") < ANN_MV_QUERIES)
                ).filter(F.col("knn_rank") == 1).collect()}
    # planted drift: the same vectors translated far out of the seed
    # distribution (fresh ids so nothing collides)
    hi = emb.agg(F.max("vec_id")).first()[0]
    shifted = second.select(
        (F.col("vec_id") + hi + 1).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(25.0))
        .alias("embedding"),
        "label",
    )
    ann_mv_process_batch(shifted, 2, state)
    ann_mv_process_batch(shifted, 2, state)  # occupancy replay-stable
    occ = {(r["batch_id"], r["list_id"]): r["c"]
           for r in ann_mv_occupancy(spark, state).collect()}
    n_second = second.count()
    assert sum(c for (b, _), c in occ.items() if b == 2) == n_second
    drift = {r["batch_id"]: r["js_micro"]
             for r in ann_mv_drift(spark, state).collect()}
    assert set(drift) == {0, 1, 2}
    # the alarm: the shifted batch's divergence clearly separates from
    # both in-distribution batches' (measured ~4.8x at sf0.001 — the
    # drifted batch is a third of the corpus, which drags the corpus
    # mix toward it and caps the achievable JS)
    assert drift[2] > 3 * max(drift[0], drift[1], 1)
    # serving the seed queries is unchanged: the shifted vectors are
    # far from every query, so the same nearest neighbor wins
    after = {r["q_vec_id"]: r["neighbor_id"]
             for r in ann_search_mv(
                 spark, state,
                 emb.filter(F.col("vec_id") < ANN_MV_QUERIES)
             ).filter(F.col("knn_rank") == 1).collect()}
    assert after == baseline


def test_empty_non_seed_batch_is_harmless(spark, sf_dir, tmp_path):
    """r12 review finding: a zero-row micro-batch (batch_id > 0) must
    be a no-op — the occupancy read-back now carries an explicit
    schema, so the empty postings dir can't crash schema inference."""
    from saurav_nayak_recipe_etl_project_spark.streaming.ann_mv import (
        ann_mv_drift,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    first, second = _split(emb)
    state = str(tmp_path / "state")
    ann_mv_process_batch(first, 0, state)
    ann_mv_process_batch(second.limit(0), 1, state)  # empty drop
    ann_mv_process_batch(second, 2, state)
    # index contents and drift ignore the empty batch entirely
    n = read_ann_mv(spark, state).count()
    assert n == emb.count()
    drift_batches = {r["batch_id"]
                     for r in ann_mv_drift(spark, state).collect()}
    assert drift_batches == {0, 2}


def test_rebuild_clears_drift_and_matches_fresh_build(spark, sf_dir,
                                                      tmp_path):
    """The alarm-to-response loop: after a shifted batch fires the
    drift alarm, rebuild_ann_mv retrains on the current corpus and the
    rebuilt state (a) equals a FRESH one-shot build whose seed batch is
    the whole corpus — postings and served neighbors bit-identical —
    and (b) resets the occupancy history to one batch, clearing the
    alarm by construction."""
    from saurav_nayak_recipe_etl_project_spark.streaming.ann_mv import (
        ann_mv_drift,
        rebuild_ann_mv,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    first, second = _split(emb)
    hi = emb.agg(F.max("vec_id")).first()[0]
    shifted = second.select(
        (F.col("vec_id") + hi + 1).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(25.0))
        .alias("embedding"),
        "label",
    )
    union = emb.unionByName(shifted)

    state = str(tmp_path / "state")
    ann_mv_process_batch(first, 0, state)
    ann_mv_process_batch(second, 1, state)
    ann_mv_process_batch(shifted, 2, state)  # fires the alarm (pinned
    # in test_drift_alarm_fires_on_shifted_batch)
    n = rebuild_ann_mv(spark, state)
    assert n == union.count()
    # the fresh-build twin: one-shot state whose SEED batch is the
    # whole (drifted) corpus
    fresh = str(tmp_path / "fresh")
    ann_mv_process_batch(union, 0, fresh)
    assert _postings_set(
        read_ann_mv(spark, state).select("vec_id", "list_id", "dist2")
    ) == _postings_set(
        read_ann_mv(spark, fresh).select("vec_id", "list_id", "dist2"))
    queries = emb.filter(F.col("vec_id") < ANN_MV_QUERIES)
    assert _search_set(ann_search_mv(spark, state, queries)) == \
        _search_set(ann_search_mv(spark, fresh, queries))
    # alarm cleared: occupancy history is the single rebuilt fold, at
    # the MAX pre-rebuild batch id (batch_id=0 would be silently
    # overwritten by a fresh-checkpoint batch-0 retrain — r12 review)
    drift = ann_mv_drift(spark, state).collect()
    assert [r["batch_id"] for r in drift] == [2]
    assert drift[0]["js_micro"] == 0  # one batch == the corpus mix
    # no leftover generation dirs
    assert not os.path.exists(f"{state}.fold.tmp")
    assert not os.path.exists(f"{state}.fold.old")
