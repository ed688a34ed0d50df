"""30x probe of the COMPOSED curation chain (VERDICT r8 #4).

The components are individually probed (curation in
bench_sf3x_decontam.json, the pair detector and clusters in
bench_sf3x_dedup.json); this times their composition — the curated
relation persist point + the shared near-dup pair persist point + the
clusters relation, consumed in the order a curation job runs them:

    curation_pipeline        pays the curated chain (scan + exact-dedup
                             window + split projection)
    curation_cluster_splits  pays pair detection + min-label
                             propagation + the doc_id equi-join
    curation_split_leakage   marginal: re-aggregates the two persisted
                             relations (this row is the r8 #2 fix —
                             before the shared _PAIRS_CACHE it re-ran
                             the 4 s pair detection)

Timings are therefore MARGINAL cost given the session's persist
points, in the listed order — the composition a production run pays,
not three cold starts. Run with SPARK_DRIVER_MEMORY=32g (the 8g
default fakes super-linear ratios at 30x via GCLocker retries; see
bench_sf3x_dedup.json heap_comparison).

Prints one JSON object shaped like the other sf3x records: {query:
{"sf0.1": s, "sf1x": s, "sf3x": s, "r10": r, "r30": r}} plus heap.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHAIN = [
    "curation_pipeline",
    "curation_cluster_splits",
    "curation_split_leakage",
]

TIERS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1x": os.path.join(REPO, ".scale_probe", "sf1x"),
    "sf3x": os.path.join(REPO, ".scale_probe", "sf3x"),
}


def main() -> None:
    from benchviz_spark.registry import all_queries
    from benchviz_spark.session import get_spark

    spark = get_spark("sf3x_curation_probe")
    queries = all_queries()
    spark.read.parquet(f"{TIERS['sf0.1']}/documents.parquet").count()  # warm
    out: dict[str, dict[str, float]] = {n: {} for n in CHAIN}
    raw: dict[str, dict[str, float]] = {}
    for tier, sf_dir in TIERS.items():
        for name in CHAIN:
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
                    "marginal cost per query given the session persist "
                    "points (curated relation, _PAIRS_CACHE, clusters), "
                    "consumed in listed order"
                ),
                "queries": out,
            },
            indent=1,
            sort_keys=True,
        )
    )


if __name__ == "__main__":
    main()
