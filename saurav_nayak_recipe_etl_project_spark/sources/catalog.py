"""Table catalog over the driver testdata parquet files.

Mirrors the reference's fixed 5-table star schema catalog
(reference schema/*.json, output/*.csv) generalized to the testdata's
TPC-H-ish schema. Loaders are plain `spark.read.parquet` so Catalyst
keeps full pushdown/pruning ability — no eager caching, no collect.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough (even at 100 TB total scale, dims stay
# orders of magnitude below facts) that broadcast joins are the right
# default physical strategy.
DIM_TABLES = frozenset({"region", "nation", "customer", "supplier", "part"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def event_ts_is_nanos(path: str) -> bool:
    """True when the parquet at `path` (file or directory of files)
    stores `ts` as TIMESTAMP(NANOS) or a raw int64 — either way Spark
    surfaces it as long (under nanosAsLong) holding epoch-nanoseconds.
    One driver-side footer read, O(1) regardless of data volume; this
    is the single source of truth for the storage unit so the batch
    catalog and the streaming reader can never diverge on it."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    def _is_nanos(one: str) -> bool:
        # Classify by what SPARK will surface, not what pyarrow reads:
        # only INT64 TIMESTAMP(NANOS) (and raw int64 epochs) arrive as
        # long under nanosAsLong. Legacy INT96 timestamps read as
        # timestamp[ns] in pyarrow too, but Spark decodes them as
        # proper timestamps — grouping them with ns here would both
        # misclassify the file and falsely flag a µs+INT96 dir as
        # mixed-unit.
        t = pq.read_schema(one).field("ts").type
        if pa.types.is_integer(t):
            return True
        if pa.types.is_timestamp(t) and t.unit == "ns":
            meta_schema = pq.ParquetFile(one).schema
            for i in range(len(meta_schema)):
                col = meta_schema.column(i)
                if col.name == "ts":
                    return col.physical_type != "INT96"
        return False

    if os.path.isdir(path):
        files = sorted(
            glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        )
        if not files:
            # Empty stream source: assume modern µs timestamps (the
            # testdata default); a ns drop into an initially-empty dir
            # is re-probed by callers per run, not cached.
            return False
        # A streaming source gets a FIXED schema from this probe, so a
        # dir holding both units would silently misread whichever unit
        # the probe didn't pick. Footer reads are cheap (metadata-only,
        # driver-side, no row data) — check every file and fail loudly
        # on a mixed-unit source instead of misreading half of it.
        units = {f: _is_nanos(f) for f in files}
        distinct = set(units.values())
        if len(distinct) > 1:
            ns = [f for f, v in units.items() if v]
            us = [f for f, v in units.items() if not v]
            raise ValueError(
                "mixed ts storage units in one source dir (a fixed-schema "
                f"stream cannot read both): ns-unit files e.g. {ns[:3]}, "
                f"µs-unit files e.g. {us[:3]} — split the source by unit "
                "or rewrite one side"
            )
        return distinct.pop()
    return _is_nanos(path)


def normalize_event_ts(df: DataFrame, instant: bool = False) -> DataFrame:
    """Shared batch/stream event-time normalization. Whatever the
    storage unit (`ts` read as epoch-ns long, or a proper µs parquet
    timestamp), emit a timestamp column:

    - instant=False → TIMESTAMP_NTZ, bit-exact vs the DuckDB oracle
      (integer ns→µs division, no floating point).
    - instant=True → TIMESTAMP (instant), required for watermarks;
      with the UTC session timezone (session.py) the two render
      identically, so stream output matches the batch twin.
    """
    from pyspark.sql import functions as F

    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        if instant:
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df.withColumn(
            "ts",
            F.expr("timestampadd(MICROSECOND, ts div 1000, "
                   "TIMESTAMP_NTZ '1970-01-01 00:00:00')"),
        )
    if instant and ts_type == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit-robust events loader: probe-free (reads, then branches on
    the surfaced dtype via normalize_event_ts)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return normalize_event_ts(df)


def load_all(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


# Expected column contracts. The reference lists "Schema Rigidity" as
# a limitation (README §7: silent breakage if the source schema
# drifts); here drift is an explicit, checkable contract instead.
EXPECTED_COLUMNS = {
    "region": ["r_regionkey", "r_name"],
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    "supplier": ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    "part": ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
    "orders": ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
               "o_orderdate", "o_orderpriority"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                 "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"],
    "events": ["event_id", "ts", "user_id", "event_type", "value", "props"],
    "documents": ["doc_id", "text", "lang", "source", "n_chars"],
    "embeddings": ["vec_id", "embedding", "label"],
}


def check_catalog_contracts(spark: SparkSession,
                            sf_dir: str = DEFAULT_SF_DIR) -> dict[str, list[str]]:
    """Schema-drift check: per table, the columns missing vs the
    contract (empty dict == everything matches). Run it at pipeline
    start so drift fails loudly up front, not deep in a query."""
    problems: dict[str, list[str]] = {}
    for name, expected in EXPECTED_COLUMNS.items():
        have = set(load_table(spark, name, sf_dir).columns)
        missing = [c for c in expected if c not in have]
        if missing:
            problems[name] = missing
    return problems


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register all tables as temp views so plans/ can use spark.sql too."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
