"""Benchmark harness: times every registered query at $SPARK_GRAFT_SF_DIR.

Prints exactly ONE JSON line on stdout:
    {"metric": "total_wall_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

All Spark chatter goes to stderr; a query failure records null for that
query and continues (one bad query must not blank the whole round's
bench data again).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from benchviz_spark.registry import all_queries  # noqa: E402
from benchviz_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    spark = get_spark("benchviz_bench")
    queries = all_queries()
    # Warm the JVM/parquet footers so the first timed query isn't paying
    # session startup.
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()

    timings: dict[str, float | None] = {}
    total = 0.0
    for name in sorted(queries):
        t0 = time.perf_counter()
        try:
            # count() forces full execution of every operator in the plan
            # without materializing result rows on the driver.
            queries[name](spark, SF_DIR).count()
            elapsed = round(time.perf_counter() - t0, 3)
            timings[name] = elapsed
            total += elapsed
        except Exception as exc:  # noqa: BLE001 - record and continue
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)
            timings[name] = None

    print(
        json.dumps(
            {
                "metric": "total_wall_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    main()
