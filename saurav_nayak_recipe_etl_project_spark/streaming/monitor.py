"""Streaming observability: a StreamingQueryListener that records
every micro-batch's progress (rows, durations, per-operator state
metrics) into an in-memory log the session can query as a DataFrame.

Why it exists: at production scale the FIRST symptom of a sick
stateful query is in the progress stream — state rows growing without
bound, commit times inflating, watermark stalling — long before the
sink data looks wrong. Spark pushes that telemetry through listener
events; this module is the minimal self-hosted sink for them (the
reference delegates the equivalent to Cloud Functions logging,
cloud_function/main.py).

Driver-side by design: progress events are tiny (one per micro-batch
per query) and arrive on the driver's listener bus — recording them
is O(batches), never O(rows). The recorder keeps a bounded deque so a
weeks-long resident query can't grow driver memory.
"""

from __future__ import annotations

import collections
import json
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

PROGRESS_SCHEMA = (
    "query_id string, run_id string, name string, batch_id long, "
    "num_input_rows long, batch_duration_ms long, "
    "state_rows_total long, state_memory_bytes long, "
    "state_custom_metrics string"
)


class QueryProgressRecorder(StreamingQueryListener):
    """Collects per-micro-batch progress rows; thread-safe, bounded."""

    def __init__(self, max_events: int = 10_000):
        self._events = collections.deque(maxlen=max_events)
        self._lock = threading.Lock()

    # -- listener callbacks (driver listener-bus thread) --
    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        state = p.stateOperators or []
        rows_total = sum(s.numRowsTotal for s in state)
        mem = sum(s.memoryUsedBytes for s in state)
        custom = json.dumps(
            [dict(s.customMetrics) for s in state], sort_keys=True
        )
        row = (
            str(p.id), str(p.runId), p.name,
            int(p.batchId), int(p.numInputRows),
            int(p.batchDuration),
            int(rows_total), int(mem), custom,
        )
        with self._lock:
            self._events.append(row)

    def onQueryTerminated(self, event):
        pass

    def onQueryIdle(self, event):
        pass

    # -- query side --
    def snapshot(self) -> list:
        with self._lock:
            return list(self._events)

    def progress_frame(self, spark: SparkSession) -> DataFrame:
        """The recorded telemetry as a DataFrame — join it against
        job metadata, window it, alert on it like any other table."""
        return spark.createDataFrame(self.snapshot(), PROGRESS_SCHEMA)


class recording:
    """Context manager: attach a recorder for the block, ALWAYS
    detach (a leaked listener would double-record every later test
    or query in the session)."""

    def __init__(self, spark: SparkSession, max_events: int = 10_000):
        self._spark = spark
        self.recorder = QueryProgressRecorder(max_events)

    def __enter__(self) -> QueryProgressRecorder:
        self._spark.streams.addListener(self.recorder)
        return self.recorder

    def __exit__(self, *exc):
        self._spark.streams.removeListener(self.recorder)
        return False
