"""Pins for the streaming/catalog robustness fixes: timed-out stream
waits fail loudly, mixed-unit source dirs are rejected, and pre-bucket
doc-dedup state dirs load with a backfilled bucket column."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from saurav_nayak_recipe_etl_project_spark.sources.catalog import event_ts_is_nanos
from saurav_nayak_recipe_etl_project_spark.streaming import await_or_raise


class _FakeQuery:
    def __init__(self, done: bool):
        self._done = done
        self.stopped = False
        self.name = "fake"
        self.id = "fake-id"

    def awaitTermination(self, timeout=None):
        return self._done

    def stop(self):
        self.stopped = True

    def exception(self):
        return None


def test_await_or_raise_passes_on_clean_termination():
    await_or_raise(_FakeQuery(done=True), timeout=1)


def test_await_or_raise_stops_and_raises_on_timeout():
    q = _FakeQuery(done=False)
    with pytest.raises(TimeoutError, match="still running"):
        await_or_raise(q, timeout=1)
    assert q.stopped, "a timed-out query must be stopped, not left writing"


def _write_ts_file(path: str, unit: str) -> None:
    pq.write_table(
        pa.table({"ts": pa.array([1_000_000], type=pa.timestamp(unit))}),
        path,
        # coerce=None keeps the requested unit in the footer (pyarrow
        # defaults would rewrite ns to us under some versions)
        coerce_timestamps=None,
    )


def test_event_ts_unit_probe_single_unit_dirs(tmp_path):
    us_dir = tmp_path / "us"
    ns_dir = tmp_path / "ns"
    us_dir.mkdir()
    ns_dir.mkdir()
    _write_ts_file(str(us_dir / "a.parquet"), "us")
    _write_ts_file(str(us_dir / "b.parquet"), "us")
    _write_ts_file(str(ns_dir / "a.parquet"), "ns")
    assert event_ts_is_nanos(str(us_dir)) is False
    assert event_ts_is_nanos(str(ns_dir)) is True


def test_event_ts_unit_probe_rejects_mixed_dir(tmp_path):
    # A fixed-schema stream cannot read both units from one dir — the
    # probe must fail loudly instead of picking whichever file sorts
    # first and silently misreading the rest (the resurrected-1970 bug
    # shape this gate exists to prevent).
    _write_ts_file(str(tmp_path / "a.parquet"), "us")
    _write_ts_file(str(tmp_path / "b.parquet"), "ns")
    with pytest.raises(ValueError, match="mixed ts storage units"):
        event_ts_is_nanos(str(tmp_path))


def test_legacy_doc_dedup_state_backfills_bucket(spark, tmp_path):
    from saurav_nayak_recipe_etl_project_spark.streaming.doc_dedup import (
        N_STATE_BUCKETS,
        _read_state,
    )

    # Pre-bucket-layout state: batch_id= partitioning only, band data
    # columns, no bucket= subdirs (what a round-4 checkpoint left).
    state_path = str(tmp_path / "state")
    legacy = spark.createDataFrame(
        [(0, 1234567, 0), (1, -987654, 0)],
        "band_id int, band_hash long, batch_id long",
    )
    legacy.write.partitionBy("batch_id").parquet(state_path)
    seen, _fs = _read_state(spark, state_path)
    assert "bucket" in seen.columns
    rows = {(r["band_hash"], r["bucket"]) for r in seen.collect()}
    for band_hash, bucket in rows:
        assert bucket == band_hash % N_STATE_BUCKETS
        assert 0 <= bucket < N_STATE_BUCKETS


def test_bench_canonical_load_gate():
    """The r12 verdict's bench-hygiene rule: runs starting above
    ambient load 2 are non-canonical and excluded from the trend
    instrument unless explicitly forced."""
    from bench import canonical_load_gate

    assert canonical_load_gate(0.5) == (True, True)
    assert canonical_load_gate(2.0) == (True, True)
    assert canonical_load_gate(5.31) == (False, False)
    assert canonical_load_gate(5.31, force=True) == (False, True)


def test_bench_wait_for_idle_budget(monkeypatch):
    """r13 verdict item 5: the bench WAITS (bounded) for ambient load
    to drop under the gate threshold so the one run the driver records
    is canonical; the budget caps the wait on never-idle boxes."""
    import bench

    loads = iter([9.0, 7.0, 1.4])
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (next(loads), 0, 0))
    slept = []
    import time as _time
    monkeypatch.setattr(_time, "sleep", lambda s: slept.append(s))
    got = bench._wait_for_idle(threshold=2.0, max_wait_s=600, poll_s=20)
    assert got == 1.4 and len(slept) == 2
    # budget exhaustion returns the (still-high) load without hanging
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (8.8, 0, 0))
    slept.clear()
    got = bench._wait_for_idle(threshold=2.0, max_wait_s=60, poll_s=20)
    assert got == 8.8 and len(slept) == 3
