"""Pins for the incrementally-maintained verified-pair MV
(streaming/pair_mv.py): stream == batch twin, replay idempotency,
cross-batch pair discovery, and the bucket-partitioned state layout.
"""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from saurav_nayak_recipe_etl_project_spark.operators.dedup import (
    lsh_verified_pairs,
)
from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table
from saurav_nayak_recipe_etl_project_spark.streaming.pair_mv import (
    compact_pair_mv_state,
    pair_mv_process_batch,
    read_pair_mv,
)


def _pairs_set(df):
    return sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"]) for r in df.collect()
    )


def test_stream_equals_batch_twin_three_batches(spark, sf_dir, tmp_path):
    docs = load_table(spark, "documents", sf_dir)
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    third = (hi - lo) // 3
    state = str(tmp_path / "state")
    cuts = [lo + third, lo + 2 * third, hi]
    prev = lo - 1
    for i, c in enumerate(cuts):
        pair_mv_process_batch(
            docs.filter((F.col("doc_id") > prev) & (F.col("doc_id") <= c)),
            i, state,
        )
        prev = c
    assert _pairs_set(read_pair_mv(spark, state)) == _pairs_set(
        lsh_verified_pairs(docs)
    )


def test_replay_is_idempotent(spark, sf_dir, tmp_path):
    docs = load_table(spark, "documents", sf_dir)
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    mid = (lo + hi) // 2
    state = str(tmp_path / "state")
    b0 = docs.filter(F.col("doc_id") <= mid)
    b1 = docs.filter(F.col("doc_id") > mid)
    pair_mv_process_batch(b0, 0, state)
    pair_mv_process_batch(b1, 1, state)
    once = _pairs_set(read_pair_mv(spark, state))
    # replay BOTH batches out of order — every write must reproduce
    # byte-identical partitions, never duplicate a pair
    pair_mv_process_batch(b1, 1, state)
    pair_mv_process_batch(b0, 0, state)
    assert _pairs_set(read_pair_mv(spark, state)) == once


def test_cross_batch_planted_dup_found(spark, tmp_path):
    base = ("alpha beta gamma delta epsilon zeta eta theta iota "
            "kappa lambda mu nu xi omicron pi rho sigma tau")
    rows0 = [Row(doc_id=1, text=base), Row(doc_id=2, text="totally " * 10)]
    # doc 11 is a near-dup of doc 1 but arrives TWO batches later
    rows1 = [Row(doc_id=5, text="unrelated words here " * 5)]
    rows2 = [Row(doc_id=11, text=base + " upsilon")]
    state = str(tmp_path / "state")
    for i, rows in enumerate([rows0, rows1, rows2]):
        pair_mv_process_batch(spark.createDataFrame(rows), i, state)
    got = _pairs_set(read_pair_mv(spark, state))
    assert any(a == 1 and b == 11 for a, b, _ in got), got
    # and it was discovered in the LATER endpoint's batch partition
    import glob

    files = glob.glob(os.path.join(state, "pairs", "batch_id=2", "*.parquet"))
    assert files, "pair not written to batch 2's partition"


def test_mv_feeds_audit_dashboards(spark, sf_dir, tmp_path):
    """The always-current story end-to-end: the corpus-audit rollups
    (F61 source matrix, F62 split leakage) fed from the maintained MV
    equal the registered entries that recompute the pair set."""
    from saurav_nayak_recipe_etl_project_spark.operators.corpus_audit import (
        _SPLIT,
        dedup_source_matrix,
        pair_label_matrix,
        split_leakage,
    )

    docs = load_table(spark, "documents", sf_dir)
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    mid = (lo + hi) // 2
    state = str(tmp_path / "state")
    pair_mv_process_batch(docs.filter(F.col("doc_id") <= mid), 0, state)
    pair_mv_process_batch(docs.filter(F.col("doc_id") > mid), 1, state)
    mv = read_pair_mv(spark, state)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    assert rows(
        pair_label_matrix(mv, docs.select("doc_id", "source"), "source")
    ) == rows(dedup_source_matrix(spark, sf_dir))
    labels = docs.select("doc_id", F.expr(_SPLIT).alias("split"))
    assert rows(pair_label_matrix(mv, labels, "split")) == rows(
        split_leakage(spark, sf_dir)
    )


def test_real_stream_with_restart_finds_cross_lifetime_dup(spark,
                                                           tmp_path):
    """The real readStream path (run_pair_mv_stream) across TWO query
    lifetimes sharing a checkpoint: drop 0 lands, the query drains and
    stops; a near-dup of a drop-0 doc lands in drop 1; a fresh query
    on the same checkpoint resumes and must discover the CROSS-
    LIFETIME pair from state, in the later batch's partition."""
    import glob
    import os as _os
    import shutil

    from pyspark.sql import Row

    from saurav_nayak_recipe_etl_project_spark.streaming.pair_mv import (
        run_pair_mv_stream,
    )

    base = ("alpha beta gamma delta epsilon zeta eta theta iota "
            "kappa lambda mu nu xi omicron pi rho sigma tau")
    src = str(tmp_path / "drops")
    _os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")

    def land(i, rows):
        df = spark.createDataFrame([
            Row(doc_id=d, text=t, lang="en", source="s", n_chars=len(t))
            for d, t in rows
        ]).coalesce(1)
        d = str(tmp_path / f"stage_{i}")
        df.write.parquet(d)
        shutil.copy(glob.glob(f"{d}/part-*.parquet")[0],
                    f"{src}/{i}.parquet")

    land(0, [(1, base), (2, "totally different words " * 5)])
    run_pair_mv_stream(spark, src, ckpt, state)      # lifetime 1
    assert read_pair_mv(spark, state).count() == 0
    land(1, [(11, base + " upsilon")])
    run_pair_mv_stream(spark, src, ckpt, state)      # lifetime 2
    got = _pairs_set(read_pair_mv(spark, state))
    assert any(a == 1 and b == 11 for a, b, _ in got), got
    files = glob.glob(_os.path.join(state, "pairs", "batch_id=1",
                                    "*.parquet"))
    assert files, "cross-lifetime pair not in the resumed batch's dir"


def test_state_layout_is_bucket_partitioned(spark, sf_dir, tmp_path):
    docs = load_table(spark, "documents", sf_dir).limit(50)
    state = str(tmp_path / "state")
    pair_mv_process_batch(docs, 0, state)
    buckets = [
        d for d in os.listdir(os.path.join(state, "shingles", "batch_id=0"))
        if d.startswith("bucket=")
    ]
    assert buckets, "shingle state not hive-partitioned by bucket"


def test_compaction_preserves_view_and_next_batch(spark, sf_dir, tmp_path):
    docs = load_table(spark, "documents", sf_dir)
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    third = (hi - lo) // 3
    state = str(tmp_path / "state")
    b0 = docs.filter(F.col("doc_id") <= lo + third)
    b1 = docs.filter(
        (F.col("doc_id") > lo + third) & (F.col("doc_id") <= lo + 2 * third)
    )
    b2 = docs.filter(F.col("doc_id") > lo + 2 * third)
    pair_mv_process_batch(b0, 0, state)
    pair_mv_process_batch(b1, 1, state)
    before = _pairs_set(read_pair_mv(spark, state))
    removed = compact_pair_mv_state(spark, state)
    assert removed > 0
    assert _pairs_set(read_pair_mv(spark, state)) == before
    # a batch processed AFTER compaction still sees the full earlier
    # state: the final MV equals the one-shot batch twin
    pair_mv_process_batch(b2, 2, state)
    assert _pairs_set(read_pair_mv(spark, state)) == _pairs_set(
        lsh_verified_pairs(docs)
    )
