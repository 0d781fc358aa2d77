"""Regenerate docs/PLANS.md — formatted physical-plan snapshots of the
headline queries (the pushdown/broadcast/partial-agg evidence).

Usage: python -m saurav_nayak_recipe_etl_project_spark.plans.dump
"""

from __future__ import annotations

import contextlib
import io
import os

HEADLINE = [
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "top_parts",
    "q5_local_supplier_volume",
    # the round-7 distributed two-pass rank shape: every Window node
    # partitioned by the bucket column, broadcast offset join, no
    # Exchange SinglePartition feeding a sort
    "customer_rfm",
]


def main() -> None:
    from saurav_nayak_recipe_etl_project_spark.registry import QUERIES
    from saurav_nayak_recipe_etl_project_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs("docs", exist_ok=True)
    lines = [
        '# Physical plans (sf0.1, `.explain("formatted")`)', "",
        "Generated snapshots showing the plan properties the engine is",
        "built around: parquet filter pushdown, column-pruned ReadSchema,",
        "broadcast hash joins on dims, map-side partial aggregation, and",
        "a single exchange per aggregate. Regenerate with",
        "`python -m saurav_nayak_recipe_etl_project_spark.plans.dump`.", "",
    ]
    for name in HEADLINE:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            QUERIES[name](spark, sf_dir).explain("formatted")
        lines += [f"## {name}", "", "```", buf.getvalue().strip(), "```", ""]
    with open("docs/PLANS.md", "w", encoding="utf-8") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    main()
