"""Skew-handling helpers.

AQE's skew-join splitting handles most cases at runtime (enabled in
session.py); `salted_count` is the explicit two-phase fallback for
heavy-hitter aggregations whose single hot key would otherwise pin one
reducer: pre-aggregate on (key, salt), then merge per key. Both
shuffles are tiny after the map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count(df: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """count(*) per key via salted two-phase aggregation — same result
    as a direct groupBy, but the first shuffle spreads each hot key
    over `n_salts` reducers."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    partial = salted.groupBy(key, "_salt").agg(F.count("*").alias("_c"))
    return partial.groupBy(key).agg(F.sum("_c").cast("long").alias("cnt"))
