"""Analytics summary report.

Parity with the reference's 'Analytics Summary Report.pdf' + the
validation_report.csv artifact: run the headline analytics + the
validation suite and write one CSV per query plus a markdown summary.
All distributed writes; only the tiny top-N results are collected for
the markdown rendering.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from saurav_nayak_recipe_etl_project_spark.registry import QUERIES
from saurav_nayak_recipe_etl_project_spark.sources.sinks import write_csv_lake

REPORT_QUERIES = [
    "top_parts",
    "avg_order_value",
    "priority_distribution",
    "returned_vs_global",
    "top_open_order_part",
    "parts_in_urgent_orders",
    "top_customers",
    "order_most_lineitems",
    "avg_lineitems_per_order",
    "orders_by_segment",
    "validation_report",
]


def run_report(spark: SparkSession, sf_dir: str, out_dir: str,
               max_rows_inline: int = 25) -> str:
    """Write per-query CSVs + summary.md; returns the summary path."""
    os.makedirs(out_dir, exist_ok=True)
    lines = ["# Analytics Summary Report", ""]
    for name in REPORT_QUERIES:
        df = QUERIES[name](spark, sf_dir)
        write_csv_lake(df, os.path.join(out_dir, name))
        rows = df.limit(max_rows_inline).collect()
        lines += [f"## {name}", "", "| " + " | ".join(df.columns) + " |",
                  "| " + " | ".join("---" for _ in df.columns) + " |"]
        lines += [
            "| " + " | ".join(str(v) for v in r) + " |" for r in rows
        ]
        lines.append("")
    path = os.path.join(out_dir, "summary.md")
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines))
    return path
