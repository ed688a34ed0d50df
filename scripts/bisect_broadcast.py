"""Bisect the r12 events-family bench regression against the
autoBroadcastJoinThreshold 10m->64m change (VERDICT r12 #1).

The r12 driver run published 8 reproduced flags concentrated in the
events/layout/multimodal families, while no r12 commit touched those
files; the only global plan-affecting change was the broadcast
threshold raise (session.py). The competing explanation is sustained
co-tenant load (15-min loadavg 6.75 during that run).

This probe answers the question mechanically: each flagged query is
timed under BOTH thresholds in ONE session, interleaved
(64m, 10m, 64m, 10m) so slow host drift cancels, with cold memo/Spark
caches before every sample and the loadavg recorded at each sample
moment. `autoBroadcastJoinThreshold` is a runtime SQL conf, so the
A/B needs no session restart and nothing else varies.

Verdict rule: the threshold is causal for a query iff
min(64m samples) >= 1.5 x min(10m samples); otherwise the r12 flags
were environmental for that query.

Writes .benchmarks/bisect_broadcast_r13.json.
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

FLAGGED = [
    "events_funnel_view_click_purchase",
    "events_linear_attribution",
    "events_type_transitions",
    "events_gap_filled_hourly",
    "events_multires_rollup",
    "layout_zorder_events",
    "multimodal_alignment_audit",
    "multimodal_decode_features",
]

THRESHOLDS = {"64m": "64m", "10m": "10m"}
ROUNDS = 2  # samples per threshold per query, interleaved


def _loadavg_1m() -> float | None:
    try:
        with open("/proc/loadavg") as fh:
            return float(fh.read().split()[0])
    except OSError:
        return None


def main() -> None:
    spark = get_spark("bisect_broadcast")
    queries = all_queries()
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()

    results: dict[str, dict] = {}
    for name in FLAGGED:
        fn = queries[name]
        samples: dict[str, list[float]] = {k: [] for k in THRESHOLDS}
        loads: list[float | None] = []
        for _ in range(ROUNDS):
            for label, value in THRESHOLDS.items():
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", value)
                spark.catalog.clearCache()
                spark._jvm.System.gc()
                clear_caches()
                loads.append(_loadavg_1m())
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                samples[label].append(round(time.perf_counter() - t0, 3))
        best64 = min(samples["64m"])
        best10 = min(samples["10m"])
        results[name] = {
            "samples_64m": samples["64m"],
            "samples_10m": samples["10m"],
            "min_64m": best64,
            "min_10m": best10,
            "ratio_64m_over_10m": round(best64 / best10, 3),
            "loadavg_1m_at_samples": loads,
            "threshold_causal": best64 >= 1.5 * best10,
        }
        print(
            f"{name}: 64m={samples['64m']} 10m={samples['10m']} "
            f"ratio={results[name]['ratio_64m_over_10m']}",
            file=sys.stderr,
        )

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
    causal = [n for n, r in results.items() if r["threshold_causal"]]
    record = {
        "sf_dir": SF_DIR,
        "rounds_per_threshold": ROUNDS,
        "queries": results,
        "threshold_causal_queries": causal,
        "verdict": (
            "threshold-causal" if causal else "environmental (load drift)"
        ),
    }
    out = os.path.join(REPO, ".benchmarks", "bisect_broadcast_r13.json")
    with open(out, "w") as fh:
        json.dump(record, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({"causal": causal, "out": out}))


if __name__ == "__main__":
    main()
