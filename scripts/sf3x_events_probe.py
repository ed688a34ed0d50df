"""30x probe of the events/time-series family (VERDICT r9 #7).

The 16-query events family is the workload's time-series heart but
carried only 10x scale evidence; this probes its most expensive
members — session windows, gap-fill, interpolation, SCD-2 — at
sf0.1 / 10x / 30x in ONE Spark session, the same triple discipline as
the other sf3x records.

The 30x events table replicates sf0.1 events with the same stride
recipe as scripts/scale_probe.py (event_id/user_id shifted per
replica, timestamps UNCHANGED): the time spine stays fixed while
per-window row density grows 30x — exactly the axis that stresses
session assembly, spine joins, and window state.

Run with SPARK_DRIVER_MEMORY=32g (the 8g default fakes super-linear
ratios at 30x via GCLocker retries; see bench_sf3x_dedup.json
heap_comparison). Prints one JSON object shaped like the other sf3x
records: {query: {"sf0.1": s, "sf1x": s, "sf3x": s, "r10": r,
"r30": r}} plus heap.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHAIN = [
    "events_session_stats",
    "events_gap_filled_hourly",
    "events_interpolated_hourly",
    "events_scd2_tier_intervals",
]

TIERS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1x": os.path.join(REPO, ".scale_probe", "sf1x"),
    "sf3x": os.path.join(REPO, ".scale_probe", "sf3x"),
}
REPLICAS_30X = 30


def _ensure_sf3x_events(spark) -> None:
    out = os.path.join(TIERS["sf3x"], "events.parquet")
    if os.path.isfile(out):
        return
    from pyspark.sql import functions as F

    from benchviz_spark.caching import clear_caches

    clear_caches()  # the sf3x snapshot dir is about to change
    base = spark.read.parquet(os.path.join(TIERS["sf0.1"], "events.parquet"))
    parts = []
    for r in range(REPLICAS_30X):
        parts.append(
            base.withColumn("event_id", F.col("event_id") + F.lit(r * 1_000_000_000))
            .withColumn("user_id", F.col("user_id") + F.lit(r * 10_000_000))
        )
    reps = parts[0]
    for p in parts[1:]:
        reps = reps.unionByName(p)
    tmp = out + ".tmpdir"
    reps.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    os.replace(part, out)
    shutil.rmtree(tmp)
    print(f"built {out}", file=sys.stderr)


def main() -> None:
    from benchviz_spark.caching import clear_caches
    from benchviz_spark.registry import all_queries
    from benchviz_spark.session import get_spark

    spark = get_spark("sf3x_events_probe")
    _ensure_sf3x_events(spark)
    queries = all_queries()
    spark.read.parquet(f"{TIERS['sf0.1']}/events.parquet").count()  # warm
    out: dict[str, dict[str, float]] = {n: {} for n in CHAIN}
    raw: dict[str, dict[str, float]] = {}
    for tier, sf_dir in TIERS.items():
        for name in CHAIN:
            clear_caches()  # cold rows, same discipline as bench.py
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            raw.setdefault(name, {})[tier] = time.perf_counter() - t0
            out[name][tier] = round(raw[name][tier], 2)
            print(f"{tier} {name}: {out[name][tier]}s", file=sys.stderr)
    for name in CHAIN:
        # ratios from UNROUNDED walls (a fast cached row rounds to 0.0
        # and would divide-by-zero or wildly inflate the ratio)
        base = max(raw[name]["sf0.1"], 1e-3)
        out[name]["r10"] = round(raw[name]["sf1x"] / base, 2)
        out[name]["r30"] = round(raw[name]["sf3x"] / base, 2)
    print(
        json.dumps(
            {
                "heap": os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
                "note": (
                    "cold per-query rows (session memo caches cleared "
                    "before each timing); events replicated 30x with the "
                    "scale_probe stride recipe, timestamps unchanged, so "
                    "per-window density grows 30x on a fixed time spine"
                ),
                "queries": out,
            },
            indent=1,
            sort_keys=True,
        )
    )


if __name__ == "__main__":
    main()
