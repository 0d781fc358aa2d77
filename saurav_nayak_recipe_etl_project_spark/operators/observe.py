"""Single-pass pipeline metrics via DataFrame.observe.

The operational anti-pattern at 100 TB is the METRICS DOUBLE-SCAN:
write the table, then re-read it (or re-run the plan) to count rows /
nulls / value bounds for the run report. `DataFrame.observe` attaches
accumulator-backed aggregates to a plan node, so the SAME job that
writes the data also delivers the metrics — zero extra scans, exact
values, and (unlike accumulators used directly) no double-counting
under task retries, because observed metrics are tied to completed
query execution, not task attempts.

Reference parity: the reference's validation re-reads its CSVs to
build validation_report.csv (src/data_validation.py:86-94); this is
the one-pass form of that report's counters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def write_with_metrics(df: DataFrame, path: str, metrics: dict,
                       fmt: str = "parquet", mode: str = "overwrite"):
    """Write `df` while collecting `metrics` (name -> aggregate Column)
    in the same job. Returns the metrics dict.

    The write is the ONLY action: the observation rides the job that
    materializes the sink, so a 100 TB export produces its row counts,
    null counts, and value bounds for free. Metric columns must be
    aggregates (the observe contract); they evaluate over exactly the
    rows that reached the sink."""
    obs = Observation()
    observed = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    observed.write.format(fmt).mode(mode).save(path)
    return dict(obs.get)


def standard_quality_metrics(df: DataFrame, required: list[str],
                             bounded: dict | None = None) -> dict:
    """The report counters every load wants: total rows, per-required-
    column null counts, and out-of-bounds counts for (col: (lo, hi))
    ranges — as observe-ready aggregate Columns."""
    m = {"n_rows": F.count(F.lit(1))}
    for c in required:
        m[f"null_{c}"] = F.sum(F.col(c).isNull().cast("long"))
    for c, (lo, hi) in (bounded or {}).items():
        m[f"oob_{c}"] = F.sum(
            (~F.col(c).between(lo, hi)).cast("long")
        )
    return m
