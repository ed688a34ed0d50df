"""A/B a session-level Spark conf change over a named query subset.

Config lives at session-build time, so each arm is its own process/JVM.
This script runs ONE arm: bench-discipline timings (clear_caches before
each row, noop-sink forced evaluation, perf_counter walls) over the
query list, printing one JSON line {name: sec} plus loadavg.

Usage:
  SPARK_GRAFT_AB_CONF='{"spark.sql.join.preferSortMergeJoin":"false"}' \
      python scripts/opt_ab_conf.py q3_shipping_priority q9_... ...

An empty/absent SPARK_GRAFT_AB_CONF is the baseline arm (exact
session.py defaults). Alternate arms A/B/A/B in separate invocations
and compare medians like-for-like (OPTIMIZATION_r15.md methodology).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from benchviz_spark.caching import clear_caches  # noqa: E402
from benchviz_spark.registry import all_queries  # noqa: E402
from benchviz_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    extra = json.loads(os.environ.get("SPARK_GRAFT_AB_CONF", "{}") or "{}")
    names = sys.argv[1:]
    queries = all_queries()
    unknown = [n for n in names if n not in queries]
    if unknown or not names:
        sys.exit(f"unknown or empty query list: {unknown}")
    spark = get_spark("opt_ab_conf", extra_conf=extra)
    # warm codegen/JIT with a representative query OUTSIDE the timed
    # list (ADVICE r15: warming with names[0] flattered that query's
    # absolute wall relative to the rest of the subset); fall back to
    # names[0] only if every candidate is itself being timed
    warm = next(
        (n for n in ("dedup_image_dhash_fingerprints", "q1_pricing_summary")
         if n in queries and n not in names),
        names[0],
    )
    queries[warm](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    clear_caches()
    out: dict[str, float] = {}
    for name in names:
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        clear_caches()
        t0 = time.perf_counter()
        queries[name](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        out[name] = round(time.perf_counter() - t0, 3)
    with open("/proc/loadavg") as fh:
        load = fh.read().split()[0]
    print(json.dumps({"conf": extra, "loadavg_1m": load, "timings": out}))


if __name__ == "__main__":
    main()
