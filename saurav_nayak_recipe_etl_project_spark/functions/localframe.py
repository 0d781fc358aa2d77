"""Local-rows → DataFrame through the Arrow lane.

`spark.createDataFrame(list_of_tuples)` parallelizes PICKLED rows, so
every downstream TASK that scans the frame (a write, a union member, a
shuffle map) must deserialize them through a Python worker — measured
at ~6 s per job on the r14 bench box for an 8-row frame, twice per
stream_ann_index run (the quantizer writes). The pandas path converts
driver-side through Arrow into JVM batches instead: the same write job
reads JVM Arrow data and costs ~0.6 s warm (measurements in
OPTIMIZATION_r14.md).

Values are identical: every row is checked against the declared schema
with PySpark's OWN classic-path verifier (_make_type_verifier) before
the Arrow conversion, so a value that does not fit the declared type
raises the exact classic-path PySparkTypeError instead of being
silently cast (ADVICE r14: the Arrow object-dtype lane truncates
local_frame(spark, [(2.5,)], 'a long') to 2 — and
convertToArrowArraySafely does NOT catch it, because the safe-cast
flag only guards numpy-dtype casts, not the python-object converter).
The rows are bounded by contract, so the O(rows) driver-side check is
free. Columns are built with dtype=object so None stays a NULL (a
None in a float64 numpy column would silently become NaN — a VALUE —
under Arrow).
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

    from pyspark.sql.types import _make_type_verifier

    st = _parse_datatype_string(schema)
    # classic-path type enforcement BEFORE the Arrow conversion: a
    # mistyped value raises the same PySparkTypeError createDataFrame
    # would, instead of Arrow's silent object->int cast (ADVICE r14)
    verify = _make_type_verifier(st)
    for r in rows:
        verify(r)
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
