"""Capture .explain("formatted") for headline queries into plans/<round>/ (SPARK_GRAFT_PLANS_DIR, default r15).

Usage:
    python tools/capture_plans.py before [name ...]
    python tools/capture_plans.py after  [name ...]

With no names, captures every bench HEADLINE entry. Plans are captured
against the same multi-file sf0.1 layout the bench times, so scan
nodes (PushedFilters / ReadSchema) match what the bench measures.
Harness entries (streaming MVs, ACID ledgers) execute their side
effects during DataFrame construction; their captured plan is the
final read — the per-phase plan shape for those lives in the harness
notes inside OPTIMIZATION_r14.md.
"""

from __future__ import annotations

import io
import os
import sys
import contextlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, prepare_multifile  # noqa: E402
from saurav_nayak_recipe_etl_project_spark.registry import QUERIES  # noqa: E402
from saurav_nayak_recipe_etl_project_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLANS_DIR", "r15"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_dir = prepare_multifile(spark, sf_dir)
    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            print(f"!! {name}: not registered", file=sys.stderr)
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"ok {name} -> {path}")
        except Exception as exc:  # capture everything; never abort the sweep
            print(f"!! {name}: {exc}", file=sys.stderr)


if __name__ == "__main__":
    main()
