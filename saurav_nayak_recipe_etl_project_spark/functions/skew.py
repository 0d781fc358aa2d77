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


def salted_join(skewed: DataFrame, other: DataFrame, key: str,
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join where `skewed`'s hot keys would pin single reducers:
    each skewed row gets a random-but-deterministic salt in [0, n),
    the `other` side is REPLICATED across all n salts (explode of a
    literal range — n× the small side, never the big one), and the
    join key becomes (key, salt) — a hot key's rows now land on n
    reducers instead of one.

    Result is row-identical to the plain join (each skewed row meets
    each matching other row exactly once — at its own salt). `how`
    supports inner/left (the skewed side preserved); right/full would
    duplicate unmatched `other` rows across salts and are rejected.
    This is the explicit form of what AQE skew-join does adaptively;
    use it when the skew is known ahead of time (or AQE is off) and
    for deterministic plan shape under test.

    The salt carries a PER-ROW component (position within the scan,
    as salted_count already does), never a content hash: a hot key's
    rows are typically full duplicates, and a content-derived salt
    would give them all the same value — re-concentrating exactly the
    rows the salt exists to spread."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    s = skewed.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()),
               F.lit(n_salts)).cast("int"),
    )
    o = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return s.join(o, [key, "_salt"], how).drop("_salt")
