"""Cold-row re-times of named registered queries (bench discipline).

Times each named query with the bench's own cold-row methodology —
clear_caches() + catalog cache drop + untimed GC before every row,
noop sink — in one session, after a representative JIT warm-up. For
like-for-like A/Bs against the committed bench row of the same host.

Usage: python scripts/opt_probe_queries.py <query> [<query> ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchviz_spark.caching import clear_caches  # noqa: E402
from benchviz_spark.registry import all_queries  # noqa: E402
from benchviz_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    queries = all_queries()
    unknown = [n for n in names if n not in queries]
    if unknown or not names:
        sys.exit(f"unknown or empty query list: {unknown}")
    spark = get_spark("opt_probe_queries")
    warm = next(
        n for n in ("dedup_image_dhash_fingerprints", names[0]) if n in queries
    )
    queries[warm](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    out: dict[str, float] = {}
    for name in names:
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        clear_caches()
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        queries[name](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        out[name] = round(time.perf_counter() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        print(f"{name:45s} {out[name]:8.3f}s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
