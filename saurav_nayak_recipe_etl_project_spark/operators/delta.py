"""Snapshot-delta operators: table diff and CDC-changelog apply.

The reference reloads its warehouse with WRITE_TRUNCATE on every
refresh (bigquery_loader_function/main.py:20-40) — it never knows WHAT
changed. These operators recover that information declaratively:

- table_diff      added / removed / changed rows between two snapshots
                  via one full-outer join on the key, value columns
                  compressed to an md5 over exact integer encodings
                  (never float->string casts, which differ by engine).
- apply_changelog compact an ordered upsert/delete log to final state:
                  one window (latest op per key) — the standard CDC
                  "apply" that turns an event stream back into a table.

Scale notes: both are single-shuffle-on-key plans. table_diff's join is
key-partitioned both sides (co-partition or bucket by key at scale);
the row hash collapses arbitrarily wide rows to one comparison, so the
shuffle carries key+hash, not the full row. apply_changelog's window is
partitioned on the key — skew only if one key dominates the log.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table


def table_diff(current: DataFrame, prior: DataFrame, key: str,
               cols: Sequence[str]) -> DataFrame:
    """Row-level diff of two snapshots on `key`: rows only in `current`
    are `added`, only in `prior` are `removed`, present in both with a
    different value hash are `changed`; unchanged rows are dropped so
    the output scales with the delta, not the table."""
    def hashed(df: DataFrame, out: str) -> DataFrame:
        h = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]))
        return df.select(F.col(key), h.alias(out))

    cur = hashed(current, "cur_h")
    pri = hashed(prior, "pri_h")
    j = cur.join(pri, key, "full_outer")
    change = (
        F.when(F.col("pri_h").isNull(), "added")
        .when(F.col("cur_h").isNull(), "removed")
        .when(F.col("cur_h") != F.col("pri_h"), "changed")
    )
    return (
        j.select(F.col(key), change.alias("change_type"))
        .filter(F.col("change_type").isNotNull())
    )


def apply_changelog(log: DataFrame, key: str, order_cols: Sequence[str],
                    op_col: str, val_col: str) -> DataFrame:
    """Compact an upsert/delete changelog to final state: keep each
    key's latest op by `order_cols`; keys whose last op is a delete
    vanish. Returns (key, final value, n_ops seen)."""
    w = Window.partitionBy(key).orderBy(*[F.desc(c) for c in order_cols])
    ranked = log.withColumn("rn", F.row_number().over(w)).withColumn(
        "n_ops", F.count("*").over(Window.partitionBy(key))
    )
    return (
        ranked.filter((F.col("rn") == 1) & (F.col(op_col) == "upsert"))
        .select(F.col(key), F.col(val_col).alias("final_value"), "n_ops")
    )


# --- registry queries: deterministic snapshot/changelog harnesses ----

def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff `orders` against a simulated prior snapshot: every 97th key
    is missing from prior (-> added), every 13th key carried a price
    10.00 lower (-> changed), and prior holds synthetic retired keys
    every 211th (offset past the key space -> removed). Values hash on
    integer cents so both engines encode identically."""
    orders = load_table(spark, "orders", sf_dir)
    cur = orders.select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    prior = cur.filter(F.col("o_orderkey") % 97 != 0).withColumn(
        "cents",
        F.when(F.col("o_orderkey") % 13 == 0, F.col("cents") - 1000).otherwise(
            F.col("cents")
        ),
    )
    retired = cur.filter(F.col("o_orderkey") % 211 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        F.lit("X").alias("status"),
        F.lit(0).cast("long").alias("cents"),
    )
    return table_diff(cur, prior.unionByName(retired), "o_orderkey",
                      ["status", "cents"])


def cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Treat the event feed as a CDC changelog on user_id — `error`
    events are deletes, everything else upserts `value` — and compact
    it to final per-user state."""
    ev = load_table(spark, "events", sf_dir)
    log = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "error", "delete")
        .otherwise("upsert")
        .alias("op"),
        F.round("value", 4).alias("val"),
    )
    return apply_changelog(log, "user_id", ["ts", "event_id"], "op", "val")


DELTA_QUERIES = {
    "snapshot_diff": snapshot_diff,
    "cdc_apply": cdc_apply,
}

DELTA_ORACLES = {
    "snapshot_diff": """
        WITH cur AS (
          SELECT o_orderkey,
                 md5(concat_ws(chr(31), o_orderstatus,
                     CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR)))
                   AS cur_h
          FROM orders
        ),
        pri_rows AS (
          SELECT o_orderkey, o_orderstatus AS status,
                 CASE WHEN o_orderkey % 13 = 0
                      THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) - 1000
                      ELSE CAST(ROUND(o_totalprice * 100) AS BIGINT) END AS cents
          FROM orders WHERE o_orderkey % 97 <> 0
          UNION ALL
          SELECT o_orderkey + 10000000, 'X', CAST(0 AS BIGINT)
          FROM orders WHERE o_orderkey % 211 = 0
        ),
        pri AS (
          SELECT o_orderkey,
                 md5(concat_ws(chr(31), status, CAST(cents AS VARCHAR))) AS pri_h
          FROM pri_rows
        )
        SELECT COALESCE(cur.o_orderkey, pri.o_orderkey) AS o_orderkey,
          CASE WHEN pri.pri_h IS NULL THEN 'added'
               WHEN cur.cur_h IS NULL THEN 'removed'
               WHEN cur.cur_h <> pri.pri_h THEN 'changed' END AS change_type
        FROM cur FULL JOIN pri ON cur.o_orderkey = pri.o_orderkey
        WHERE (CASE WHEN pri.pri_h IS NULL THEN 'added'
                    WHEN cur.cur_h IS NULL THEN 'removed'
                    WHEN cur.cur_h <> pri.pri_h THEN 'changed' END) IS NOT NULL
    """,
    "cdc_apply": """
        WITH log AS (
          SELECT user_id, ts, event_id,
            CASE WHEN event_type = 'error' THEN 'delete'
                 ELSE 'upsert' END AS op,
            ROUND(value, 4) AS val
          FROM events
        ),
        ranked AS (
          SELECT user_id, op, val,
            ROW_NUMBER() OVER (
              PARTITION BY user_id ORDER BY ts DESC, event_id DESC
            ) AS rn,
            COUNT(*) OVER (PARTITION BY user_id) AS n_ops
          FROM log
        )
        SELECT user_id, val AS final_value, n_ops
        FROM ranked WHERE rn = 1 AND op = 'upsert'
    """,
}
