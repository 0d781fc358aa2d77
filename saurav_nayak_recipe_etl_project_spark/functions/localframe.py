"""Local-rows → DataFrame through the Arrow lane.

`spark.createDataFrame(list_of_tuples)` parallelizes PICKLED rows, so
every downstream TASK that scans the frame (a write, a union member, a
shuffle map) must deserialize them through a Python worker — measured
at ~6 s per job on the r14 bench box for an 8-row frame, twice per
stream_ann_index run (the quantizer writes). The pandas path converts
driver-side through Arrow into JVM batches instead: the same write job
reads JVM Arrow data and costs ~0.6 s warm (measurements in
OPTIMIZATION_r14.md).

Values are identical: the declared schema is enforced either way, and
columns are built with dtype=object so None stays a NULL (a None in a
float64 numpy column would silently become NaN — a VALUE — under
Arrow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_frame(spark: SparkSession, rows, schema: str) -> DataFrame:
    """DataFrame from a list of tuples + DDL schema, Arrow-converted.

    Drop-in for `spark.createDataFrame(rows, schema)` on SMALL local
    row lists (queries, centroids, audit readouts — anything bounded).
    Falls back to the classic path when pandas/Arrow cannot represent
    the rows (never expected for the primitive/array types used here).
    """
    if not rows:
        return spark.createDataFrame([], schema)
    import pandas as pd
    from pyspark.sql.types import _parse_datatype_string

    st = _parse_datatype_string(schema)
    names = [f.name for f in st.fields]
    pdf = pd.DataFrame({
        n: pd.Series([r[i] for r in rows], dtype=object)
        for i, n in enumerate(names)
    })
    try:
        return spark.createDataFrame(pdf, schema=st)
    except Exception:
        # arrow/pandas rejection (exotic type): classic path, same rows
        return spark.createDataFrame(rows, schema)
