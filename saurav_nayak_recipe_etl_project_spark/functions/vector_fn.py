"""Vector Column expressions — JVM-side folds over array<double>.

Left-to-right sequential folds in element order: deterministic and
bit-reproducible by any engine that folds the same way (the DuckDB
oracle does), unlike parallel/tree summation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
