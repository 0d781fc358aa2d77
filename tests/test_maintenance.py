"""Warehouse maintenance: SCD2 history semantics, compaction
preserves data while cutting file counts, subject erasure is complete."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from saurav_nayak_recipe_etl_project_spark.operators import maintenance as MT
from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table


def test_scd2_merge_versions_changed_rows(spark):
    current = spark.createDataFrame(
        [
            (1, "GOLD", "2024-01-01", None),
            (2, "SILVER", "2024-01-01", None),
            (3, "BRONZE", "2023-01-01", "2024-01-01"),   # already closed
            (3, "GOLD", "2024-01-01", None),
        ],
        "cust long, tier string, valid_from string, valid_to string",
    )
    updates = spark.createDataFrame(
        [(1, "PLATINUM", "2024-06-01"),   # change → new version
         (2, "SILVER", "2024-06-01")],    # no change → no-op
        "cust long, tier string, effective_date string",
    )
    out = MT.scd2_merge(current, updates, key="cust", attrs=["tier"])
    rows = {(r["cust"], r["tier"], r["valid_to"]) for r in out.collect()}
    assert (1, "GOLD", "2024-06-01") in rows          # closed
    assert (1, "PLATINUM", None) in rows               # new active
    assert (2, "SILVER", None) in rows                 # untouched
    assert (3, "BRONZE", "2024-01-01") in rows         # history kept
    assert (3, "GOLD", None) in rows                   # active w/o update
    assert out.count() == 5


def test_compaction_preserves_rows(spark, sf_dir, tmp_path):
    orders = load_table(spark, "orders", sf_dir)
    path = str(tmp_path / "frag")
    orders.repartition(37).write.parquet(path)
    before = len(glob.glob(f"{path}/*.parquet"))
    n = MT.compact_parquet(spark, path, target_mb=128)
    after = len(glob.glob(f"{path}/*.parquet"))
    assert before == 37 and after == n and n < before
    assert spark.read.parquet(path).count() == orders.count()


def test_forget_subject_is_complete(spark, sf_dir):
    tables = {
        "customer": load_table(spark, "customer", sf_dir),
        "orders": load_table(spark, "orders", sf_dir),
        "events": load_table(spark, "events", sf_dir),
    }
    keys = {"customer": "c_custkey", "orders": "o_custkey", "events": "user_id"}
    out = MT.forget_subject(tables, keys, subject_id=7)
    for name, df in out.items():
        assert df.filter(F.col(keys[name]) == 7).count() == 0
    assert out["customer"].count() == tables["customer"].count() - 1


def test_publish_with_audit_happy_path_and_versioning(spark, tmp_path):
    """Two publishes: readers always resolve the latest audited
    snapshot; version dirs beyond keep_versions are pruned."""
    import os

    from saurav_nayak_recipe_etl_project_spark.operators.maintenance import (
        publish_with_audit,
        read_published,
    )

    t = str(tmp_path / "tbl")
    d1 = spark.range(5).withColumnRenamed("id", "k")
    publish_with_audit(d1, t, audits=[lambda df: df.count() == 5])
    assert read_published(spark, t).count() == 5

    d2 = spark.range(9).withColumnRenamed("id", "k")
    publish_with_audit(d2, t, audits=[lambda df: df.count() == 9],
                       keep_versions=1)
    assert read_published(spark, t).count() == 9
    dirs = [d for d in os.listdir(t) if d.startswith("_v")]
    assert dirs == ["_v2"]  # keep_versions=1 pruned _v1


def test_publish_with_audit_failed_audit_leaves_table_untouched(spark, tmp_path):
    import os

    import pytest

    from saurav_nayak_recipe_etl_project_spark.operators.maintenance import (
        AuditFailure,
        publish_with_audit,
        read_published,
    )

    t = str(tmp_path / "tbl")
    good = spark.range(5).withColumnRenamed("id", "k")
    publish_with_audit(good, t, audits=[lambda df: True])

    def no_empty(df):
        return df.count() > 0

    bad = good.filter("k < 0")  # empty snapshot must be rejected
    with pytest.raises(AuditFailure, match="no_empty"):
        publish_with_audit(bad, t, audits=[no_empty])
    # live pointer still v1, staged dir cleaned up
    assert read_published(spark, t).count() == 5
    assert [d for d in os.listdir(t) if d.startswith("_v")] == ["_v1"]


def test_staged_snapshot_invisible_until_audited(spark, tmp_path):
    """A mid-write / unaudited snapshot lives under _staging and must
    be invisible to BOTH read authorities — published_versions() and
    read_published(version=N) — never just to the CURRENT pointer.
    A staged leftover NEWER than every published version might be a
    concurrent publisher's live write, so the next publish only
    numbers past it; once a published version overtakes it the
    leftover is PROVABLY dead (its rename target is taken) and the
    following publish prunes it instead of leaking a full-size
    snapshot outside keep_versions forever."""
    import os

    from saurav_nayak_recipe_etl_project_spark.operators.maintenance import (
        publish_with_audit,
        published_versions,
        read_published,
    )

    t = str(tmp_path / "tbl")
    d1 = spark.range(5)
    publish_with_audit(d1, t, audits=[lambda df: True])
    assert published_versions(t) == [1]

    # simulate a crashed writer: a half-written staged v2
    stale = os.path.join(t, "_staging", "_v2")
    os.makedirs(stale)
    with open(os.path.join(stale, "part-00000.parquet"), "wb") as fh:
        fh.write(b"not parquet")

    assert published_versions(t) == [1]
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        read_published(spark, t, version=2)

    # staged _v2 > max published (1): might be a live concurrent
    # writer — the next publish skips its number rather than pruning
    publish_with_audit(spark.range(9), t, audits=[lambda df: True],
                       keep_versions=3)
    assert published_versions(t) == [1, 3]
    assert read_published(spark, t).count() == 9
    assert os.path.exists(stale)

    # now v3 > 2: the leftover is provably dead (its rename target
    # is taken) and the following publish prunes it
    publish_with_audit(spark.range(4), t, audits=[lambda df: True],
                       keep_versions=3)
    assert published_versions(t) == [1, 3, 4]
    assert read_published(spark, t).count() == 4
    assert not os.path.exists(stale)


def test_publish_time_travel_reads_retained_versions(spark, tmp_path):
    """Version-pinned reads: with keep_versions=3, both snapshots stay
    readable by number; a pruned or never-published version raises."""
    import pytest

    from saurav_nayak_recipe_etl_project_spark.operators.maintenance import (
        publish_with_audit,
        published_versions,
        read_published,
    )

    t = str(tmp_path / "tbl")
    for n in (4, 9):
        df = spark.range(n).withColumnRenamed("id", "k")
        publish_with_audit(df, t, audits=[lambda d: True], keep_versions=3)
    assert published_versions(t) == [1, 2]
    assert read_published(spark, t).count() == 9           # CURRENT
    assert read_published(spark, t, version=1).count() == 4  # time travel
    with pytest.raises(FileNotFoundError):
        read_published(spark, t, version=7)
