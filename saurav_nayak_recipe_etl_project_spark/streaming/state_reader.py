"""Streaming state introspection (Spark 4 `statestore` /
`state-metadata` data sources): read a stateful query's checkpoint
state back as a DataFrame — the debugging surface for sick stateful
queries (what keys are resident, how big is each, what did state look
like N batches ago) that otherwise requires killing the query and
spelunking binary delta files.

The reference's event-driven loader is stateless (re-loads on every
trigger, bigquery_loader_function/main.py:20-40); state introspection
is part of the streaming extension surface next to the RocksDB
provider (G16) and the telemetry recorder (G18).

Scale notes: the state source reads the checkpoint's per-partition
store files directly — one task per state partition, no running query
required and no interference with it; `batchId` time travel reads an
older snapshot+delta chain, which is how you diff state across
batches without replaying the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_query_state(spark: SparkSession, checkpoint_dir: str,
                     batch_id: int | None = None,
                     operator_id: int = 0,
                     store_name: str | None = None,
                     flatten: bool = True) -> DataFrame:
    """State rows of a stateful streaming query's checkpoint as a
    DataFrame of (key.*, value.*, partition_id). `batch_id` pins an
    older version (state time travel); default is the latest
    committed batch."""
    r = spark.read.format("statestore").option("operatorId", operator_id)
    if batch_id is not None:
        r = r.option("batchId", batch_id)
    if store_name is not None:
        r = r.option("storeName", store_name)
    df = r.load(checkpoint_dir)
    if not flatten:
        return df
    return df.select("key.*", "value.*", "partition_id")


def read_state_metadata(spark: SparkSession,
                        checkpoint_dir: str) -> DataFrame:
    """Operator-level state metadata for a checkpoint: operator ids /
    names, state store names, partition counts, and the min/max batch
    ids still readable — the catalog you consult before read_query_state."""
    return spark.read.format("state-metadata").load(checkpoint_dir)
