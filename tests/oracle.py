"""DuckDB cross-check harness mirroring the driver's correctness gate:
run the Spark query and the oracle SQL on the same parquet, then compare
row count, column names, and order-insensitive values."""

from __future__ import annotations

import math

import duckdb


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    try:
        for name in (
            "region nation customer supplier part orders lineitem events "
            "documents embeddings".split()
        ):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
            )
        rel = con.sql(sql)
        return rel.columns, rel.fetchall()
    finally:
        con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def assert_matches_oracle(spark_df, sql: str, sf_dir: str):
    cols, oracle_rows = run_oracle(sql, sf_dir)
    oracle_cols = [c.lower() for c in cols]

    spark_cols = [c.lower() for c in spark_df.columns]
    spark_rows = [tuple(r) for r in spark_df.collect()]

    assert sorted(spark_cols) == sorted(oracle_cols), (
        f"columns differ: spark={spark_cols} oracle={oracle_cols}"
    )
    assert len(spark_rows) == len(oracle_rows), (
        f"row count differs: spark={len(spark_rows)} oracle={len(oracle_rows)}"
    )

    s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
    o_idx = [oracle_cols.index(c) for c in sorted(oracle_cols)]
    s_vals = sorted(tuple(_norm(r[i]) for i in s_idx) for r in spark_rows)
    o_vals = sorted(tuple(_norm(r[i]) for i in o_idx) for r in oracle_rows)
    mism = [
        (a, b) for a, b in zip(s_vals, o_vals) if a != b
    ]
    assert s_vals == o_vals, f"values differ; first mismatches: {mism[:5]}"
