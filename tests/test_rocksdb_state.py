"""RocksDB state-store provider: a stateful streaming aggregation on
disk-backed state must (a) survive a stop/restart cycle resuming from
committed RocksDB state, (b) end up value-identical to its batch
twin, and (c) leave RocksDB-format artifacts (zip snapshots /
changelog files) in the checkpoint — the evidence the provider
actually ran, since a silently-ignored conf would fall back to the
in-heap provider and pass (a)+(b) anyway."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table
from saurav_nayak_recipe_etl_project_spark.streaming.statestore import (
    ROCKSDB_CONFS,
    run_rocksdb_user_stats_stream,
)


def _batch_twin(spark, sf_dir):
    return (
        load_table(spark, "events", sf_dir)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .alias("value_cents"),
            F.max(F.round(F.col("value") * 100).cast("long"))
            .alias("max_value_cents"),
        )
    )


def test_rocksdb_state_recovers_across_restart(spark, sf_dir, tmp_path):
    src = tmp_path / "drops"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_rocks")

    # batch 1: first half of the corpus (split the parquet by rows;
    # the file stream wants PLAIN parquet files in the drop dir, so
    # each half is written to staging and its part-file moved in)
    events = load_table(spark, "events", sf_dir)

    def _drop(df, tag):
        stage = tmp_path / f"stage_{tag}"
        df.coalesce(1).write.mode("overwrite").parquet(str(stage))
        part = next(stage.glob("part-*.parquet"))
        shutil.move(str(part), str(src / f"{tag}.parquet"))

    _drop(events.where(F.col("event_id") % 2 == 0), "a")
    run_rocksdb_user_stats_stream(spark, str(src), ckpt, "rocks_users")
    n_first = spark.sql("SELECT COUNT(*) AS n FROM rocks_users").first()["n"]
    assert n_first > 0

    # batch 2: the rest lands; a SECOND invocation restarts the query
    # from the checkpoint — RocksDB state must reload and keep counting
    _drop(events.where(F.col("event_id") % 2 == 1), "b")
    run_rocksdb_user_stats_stream(spark, str(src), ckpt, "rocks_users")

    got = {
        r["user_id"]: (r["n_events"], r["value_cents"], r["max_value_cents"])
        for r in spark.sql("SELECT * FROM rocks_users").collect()
    }
    want = {
        r["user_id"]: (r["n_events"], r["value_cents"], r["max_value_cents"])
        for r in _batch_twin(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0

    # provider evidence: RocksDB checkpoints upload <v>.zip snapshots
    # (+ .changelog deltas when changelog checkpointing kicks in);
    # the in-heap provider writes <v>.delta/<v>.snapshot instead
    state_files = glob.glob(os.path.join(ckpt, "state", "**", "*"),
                            recursive=True)
    names = {os.path.basename(p) for p in state_files}
    assert any(n.endswith(".zip") or n.endswith(".changelog")
               for n in names), sorted(names)[:20]
    assert not any(n.endswith(".delta") for n in names), sorted(names)[:20]

    shutil.rmtree(str(src), ignore_errors=True)


def test_rocksdb_confs_are_scoped(spark):
    """The context manager must not leak the provider into the rest of
    the session — other checkpoints were created with the default
    provider and a sticky override would break THEIR restarts."""
    from saurav_nayak_recipe_etl_project_spark.streaming.statestore import (
        rocksdb_state,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    before = spark.conf.get(key, None)
    with rocksdb_state(spark):
        assert spark.conf.get(key) == ROCKSDB_CONFS[key]
    assert spark.conf.get(key, None) == before
