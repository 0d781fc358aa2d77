"""Timestamp-storage-unit drift gate (the round-4 break, pinned).

The driver's testdata has historically flipped between parquet
TIMESTAMP(NANOS) (which Spark surfaces as epoch-ns long under
nanosAsLong) and plain timestamp[us]. Batch and stream must read BOTH
identically: same files, same windows, same year — never January 1970.
Feeds the same events stored three ways (ns timestamp, µs timestamp,
raw int64 ns) through the streaming reader and the batch catalog and
requires identical results.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq

from saurav_nayak_recipe_etl_project_spark.sources import catalog as C
from saurav_nayak_recipe_etl_project_spark.streaming import events as E

UNITS = ("ns", "us", "int64ns")


def _write_events(path: str, unit: str, n: int = 240) -> None:
    base = datetime.datetime(2024, 3, 1)
    ts = [base + datetime.timedelta(minutes=97 * i) for i in range(n)]
    if unit == "int64ns":
        ts_arr = pa.array(
            [int(t.timestamp()) * 1_000_000_000 for t in ts], pa.int64()
        )
    else:
        ts_arr = pa.array(ts, type=pa.timestamp(unit))
    table = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": ts_arr,
        "user_id": pa.array([i % 5 for i in range(n)], pa.int64()),
        "event_type": pa.array(
            ["purchase" if i % 3 == 0 else "view" for i in range(n)]
        ),
        "value": pa.array([float(i % 17) for i in range(n)], pa.float64()),
        "props": pa.array(["{}"] * n),
    })
    # version 2.6 preserves TIMESTAMP(NANOS); older versions coerce to µs
    pq.write_table(table, path, version="2.6")


def test_probe_detects_storage_unit(tmp_path):
    for unit, want in [("ns", True), ("us", False), ("int64ns", True)]:
        d = tmp_path / f"probe_{unit}"
        d.mkdir()
        _write_events(str(d / "events.parquet"), unit)
        assert C.event_ts_is_nanos(str(d)) is want
        assert C.event_ts_is_nanos(str(d / "events.parquet")) is want
    empty = tmp_path / "empty"
    empty.mkdir()
    assert C.event_ts_is_nanos(str(empty)) is False


def test_stream_and_batch_agree_across_storage_units(spark, tmp_path):
    stream_results, batch_results = {}, {}
    for unit in UNITS:
        src = tmp_path / unit
        src.mkdir()
        _write_events(str(src / "events.parquet"), unit)

        E.run_windowed_stream(
            spark, str(src), str(tmp_path / f"ck_{unit}"), f"units_{unit}"
        )
        stream_results[unit] = {
            (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
            for r in spark.sql(f"SELECT * FROM units_{unit}").collect()
        }
        batch_results[unit] = {
            (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
            for r in E.stream_events_window(spark, str(src)).collect()
        }

        assert len(stream_results[unit]) > 0
        # the round-4 failure mode: ns µs-misinterpreted → 1970 windows
        assert all(
            ws.startswith("2024-") for ws, _ in stream_results[unit]
        ), f"{unit}: stream windows left the data's year"
        assert stream_results[unit] == batch_results[unit], (
            f"{unit}: stream != batch twin on identical files"
        )

    assert stream_results["ns"] == stream_results["us"] == stream_results["int64ns"]
