"""30x probe of the multimodal/image family.

Round 10 added the image-content dedup tier (real-codec decode ->
dHash -> banded Hamming ball); this extends the family's scale
evidence from the 10x paired ratios to the same sf0.1 / 10x / 30x
triple the dedup/knn/decontam/curation/text/events families carry.
The probed chain is decode-BOUND by design — the mapInPandas codec
pass dominates and everything after it moves 8-byte keys — so the
expectation is near-linear ratios for the fingerprint scans and a
duplicate-rate-sized pair join on top.

Run with SPARK_DRIVER_MEMORY=32g (see bench_sf3x_dedup.json
heap_comparison). Prints one JSON object shaped like the other sf3x
records.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHAIN = [
    "dedup_image_dhash_fingerprints",
    "dedup_image_phash_pairs",
    "multimodal_decode_dims",
    "multimodal_resize_stats",
]

TIERS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1x": os.path.join(REPO, ".scale_probe", "sf1x"),
    "sf3x": os.path.join(REPO, ".scale_probe", "sf3x"),
}


def main() -> None:
    from benchviz_spark.caching import clear_caches
    from benchviz_spark.registry import all_queries
    from benchviz_spark.session import get_spark

    spark = get_spark("sf3x_multimodal_probe")
    queries = all_queries()
    spark.read.parquet(f"{TIERS['sf0.1']}/documents.parquet").count()  # warm
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
                    "cold per-query rows; decode-bound chain over the 30x "
                    "documents corpus (same text-rotation replicas as the "
                    "dedup probes)"
                ),
                "queries": out,
            },
            indent=1,
            sort_keys=True,
        )
    )


if __name__ == "__main__":
    main()
