"""Type-widening evolution for the log-structured ACID table
(sources/txlog.py) — the Delta/Iceberg lossless-widening contract:
int→bigint and float→double are accepted under the evolution flag,
the committed schema records the WIDE type, and every read path
up-casts narrow-generation files in place (pinned committed-schema
reads — a mergeSchema inference refuses to merge int and bigint
footers). Narrowing and any other type change stay fatal; a source
NARROWER than the table is a plain append (no contract change)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from saurav_nayak_recipe_etl_project_spark.sources.txlog import (
    read_table,
    tx_append,
    tx_changes,
    tx_checkpoint,
    tx_clean_log,
    tx_compact,
    tx_delete_where,
    tx_merge,
    tx_read_incremental,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _types(df):
    return {f.name: f.dataType.simpleString() for f in df.schema.fields}


def test_widening_append_promotes_schema_and_upcasts_old_files(
        spark, tmp_path):
    t = str(tmp_path / "t")
    tx_append(spark.createDataFrame([(1, 1.5)], "k int, x float"),
              t, ["k"])
    tx_append(spark.createDataFrame([(2**40, 2.5)], "k long, x double"),
              t, ["k"], allow_schema_evolution=True)
    got = read_table(spark, t)
    assert _types(got) == {"k": "bigint", "x": "double"}
    assert _rows(got) == [(1, 1.5), (2**40, 2.5)]


def test_widening_requires_evolution_flag(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_append(spark.createDataFrame([(1,)], "k int"), t, ["k"])
    with pytest.raises(ValueError, match="widened types"):
        tx_append(spark.createDataFrame([(2**40,)], "k long"), t, ["k"])


def test_narrow_source_into_wide_table_is_plain_append(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_append(spark.createDataFrame([(2**40,)], "k long"), t, ["k"])
    # int source, NO flag needed: the contract did not change
    tx_append(spark.createDataFrame([(7,)], "k int"), t, ["k"])
    got = read_table(spark, t)
    assert _types(got) == {"k": "bigint"}
    assert _rows(got) == [(7,), (2**40,)]


def test_narrowing_and_other_changes_stay_fatal(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_append(spark.createDataFrame([(1, "a")], "k long, s string"),
              t, ["k"])
    with pytest.raises(ValueError, match="rejected"):
        tx_append(spark.createDataFrame([(2, 3)], "k long, s int"),
                  t, ["k"], allow_schema_evolution=True)


def test_time_travel_reads_the_narrow_contract(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_append(spark.createDataFrame([(1,)], "k int"), t, ["k"])
    tx_append(spark.createDataFrame([(2**40,)], "k long"), t, ["k"],
              allow_schema_evolution=True)
    assert _types(read_table(spark, t, version=0)) == {"k": "int"}
    assert _types(read_table(spark, t, version=1)) == {"k": "bigint"}


def test_merge_and_delete_across_widened_generations(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_append(spark.createDataFrame([(1, 10), (2, 20)],
                                    "k int, v int"), t, ["k"])
    tx_merge(spark, t,
             spark.createDataFrame([(2, 2**40), (3, 30)], "k long, v long"),
             "k", ["k"], allow_schema_evolution=True)
    got = read_table(spark, t)
    assert _types(got) == {"k": "bigint", "v": "bigint"}
    assert _rows(got) == [(1, 10), (2, 2**40), (3, 30)]
    # file-granular delete rewrites a mixed-width survivor set
    tx_delete_where(spark, t, ("k", "=", 2), ["k"])
    assert _rows(read_table(spark, t)) == [(1, 10), (3, 30)]


def test_compact_changes_and_incremental_across_widening(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_append(spark.createDataFrame([(1, 10)], "k int, v int"), t, ["k"])
    tx_append(spark.createDataFrame([(2, 2**40)], "k long, v long"),
              t, ["k"], allow_schema_evolution=True)
    feed, cursor = tx_read_incremental(spark, t, 0)
    assert _types(feed)["v"] == "bigint" and _rows(feed) == [(2, 2**40)]
    ch = tx_changes(spark, t, 0, 1, "k", ["v"])
    assert sorted((r["k"], r["change_type"]) for r in ch.collect()) == [
        (2, "added")]
    tx_compact(spark, t, 1, ["k"])
    got = read_table(spark, t)
    assert _types(got) == {"k": "bigint", "v": "bigint"}
    assert _rows(got) == [(1, 10), (2, 2**40)]


def test_widened_schema_survives_checkpoint_and_clean(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_append(spark.createDataFrame([(1,)], "k int"), t, ["k"])
    tx_append(spark.createDataFrame([(2**40,)], "k long"), t, ["k"],
              allow_schema_evolution=True)
    tx_checkpoint(t)
    tx_clean_log(t)
    got = read_table(spark, t)
    assert _types(got) == {"k": "bigint"}
    assert _rows(got) == [(1,), (2**40,)]
    # post-clean enforcement still resolves the WIDE schema: a fresh
    # int-widening append now needs no flag (narrow source), and a
    # string type change still dies
    tx_append(spark.createDataFrame([(5,)], "k int"), t, ["k"])
    with pytest.raises(ValueError, match="rejected"):
        tx_append(spark.createDataFrame([("x",)], "k string"), t, ["k"],
                  allow_schema_evolution=True)
