"""The tx-log DataSource (sources/txsource.py): batch snapshot parity
with read_table (incl. time travel), the version-offset streaming
source (exactly-once across checkpointed restarts, burst-capped
batches, loud on removal commits), and additive-evolution NULL
backfill through the Arrow lane.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from saurav_nayak_recipe_etl_project_spark.sources.txlog import (
    tx_append,
    tx_delete_where,
    read_table,
)
from saurav_nayak_recipe_etl_project_spark.sources.txsource import (
    register_txlog_source,
)
from saurav_nayak_recipe_etl_project_spark.streaming import await_or_raise


def _df(spark, rows, schema="k long, s string"):
    return spark.createDataFrame(rows, schema)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def txsrc(spark):
    register_txlog_source(spark)
    return spark


def test_batch_read_parity_and_time_travel(txsrc, tmp_path):
    spark = txsrc
    t = str(tmp_path / "t")
    tx_append(_df(spark, [(1, "a"), (2, "b")]), t, ["k"])
    tx_append(_df(spark, [(3, "c")]), t, ["k"])
    got = spark.read.format("txlog").option("path", t).load()
    assert _rows(got) == _rows(read_table(spark, t))
    v0 = (spark.read.format("txlog").option("path", t)
          .option("version", 0).load())
    assert _rows(v0) == [(1, "a"), (2, "b")]


def _drain(spark, t, ckpt, out, **opts):
    reader = spark.readStream.format("txlog").option("path", t)
    for k, v in opts.items():
        reader = reader.option(k, v)
    stream = reader.load()
    batches = []

    def sink(df, bid):
        rows = [tuple(r) for r in df.collect()]
        if rows:
            batches.append(rows)
            out.extend(rows)

    await_or_raise(
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    return batches


def test_stream_versions_are_offsets_with_restart(txsrc, tmp_path):
    spark = txsrc
    t, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    tx_append(_df(spark, [(1, "a")]), t, ["k"])
    tx_append(_df(spark, [(2, "b")]), t, ["k"])
    out: list = []
    _drain(spark, t, ckpt, out)
    assert sorted(out) == [(1, "a"), (2, "b")]
    # new commits land; a SECOND query lifetime on the same checkpoint
    # consumes ONLY them — versions are the offsets
    tx_append(_df(spark, [(3, "c")]), t, ["k"])
    out2: list = []
    _drain(spark, t, ckpt, out2)
    assert sorted(out2) == [(3, "c")]
    # nothing new: a third lifetime is an empty drain
    out3: list = []
    _drain(spark, t, ckpt, out3)
    assert out3 == []


def test_stream_burst_cap_bounds_batches(txsrc, tmp_path):
    spark = txsrc
    t, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    tx_append(_df(spark, [(0, "seed")]), t, ["k"])
    out: list = []
    _drain(spark, t, ckpt, out, maxVersionsPerBatch="1")
    # a burst of 3 more commits becomes bounded micro-batches on the
    # resumed query (the first batch of a FRESH query is uncapped by
    # API necessity — this one is a restart, so the cap applies).
    # pyspark 4.1 falls back to SINGLE-batch execution for availableNow
    # on Python sources, so each query lifetime here runs exactly one
    # capped micro-batch — the cap shows up as one-commit-per-lifetime.
    for i in range(1, 4):
        tx_append(_df(spark, [(i, f"r{i}")]), t, ["k"])
    out2: list = []
    for _ in range(3):
        batches = _drain(spark, t, ckpt, out2, maxVersionsPerBatch="1")
        assert len(batches) == 1 and len(batches[0]) == 1
    assert sorted(out2) == [(1, "r1"), (2, "r2"), (3, "r3")]
    # fully drained
    assert _drain(spark, t, ckpt, [], maxVersionsPerBatch="1") == []


def test_stream_removal_commit_is_loud(txsrc, tmp_path):
    spark = txsrc
    t, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    tx_append(_df(spark, [(1, "a"), (2, "b")]), t, ["k"])
    tx_delete_where(spark, t, ("k", "=", 1), ["k"])
    with pytest.raises(Exception, match="tx_changes"):
        _drain(spark, t, ckpt, [])


def test_stream_backfills_pre_evolution_files(txsrc, tmp_path):
    spark = txsrc
    t, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    tx_append(_df(spark, [(1, "a")]), t, ["k"])
    tx_append(_df(spark, [(2, "b", 7)], "k long, s string, extra int"),
              t, ["k"], allow_schema_evolution=True)
    out: list = []
    _drain(spark, t, ckpt, out)
    # the query schema is the evolved one; the pre-evolution file's
    # rows carry NULL for the new column (the mergeSchema contract,
    # through the Arrow lane)
    assert sorted(out) == [(1, "a", None), (2, "b", 7)]


def test_starting_version_skips_history(txsrc, tmp_path):
    spark = txsrc
    t, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    tx_append(_df(spark, [(1, "a")]), t, ["k"])
    tx_append(_df(spark, [(2, "b")]), t, ["k"])
    out: list = []
    _drain(spark, t, ckpt, out, startingVersion="1")
    assert sorted(out) == [(2, "b")]
