"""Oracle spot-check: run named registry entries (or all) against
their DuckDB oracles at one or more SF dirs.

Usage: python tools/oracle_check.py sf0.001[,sf0.01] name1 name2 ...
       python tools/oracle_check.py sf0.01 ALL
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from saurav_nayak_recipe_etl_project_spark.registry import ORACLES, QUERIES  # noqa: E402
from saurav_nayak_recipe_etl_project_spark.session import get_spark  # noqa: E402
from tests.oracle import assert_matches_oracle  # noqa: E402


def main() -> None:
    sfs = sys.argv[1].split(",")
    names = sys.argv[2:]
    if names == ["ALL"]:
        names = sorted(QUERIES)
    spark = get_spark(app_name="oracle_check")
    spark.sparkContext.setLogLevel("ERROR")
    failed = []
    for sf in sfs:
        sf_dir = f"/root/testdata/{sf}"
        for name in names:
            t0 = time.perf_counter()
            try:
                assert_matches_oracle(
                    QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)
                print(f"ok   {sf} {name} ({time.perf_counter()-t0:.1f}s)",
                      flush=True)
            except Exception:
                failed.append((sf, name))
                print(f"FAIL {sf} {name}", flush=True)
                traceback.print_exc()
    print(f"== {len(failed)} failures ==")
    for sf, name in failed:
        print(f"  {sf} {name}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
