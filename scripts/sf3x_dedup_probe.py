"""30x dedup-family probe at a configurable heap.

Re-times the four dedup-family queries over the same-session
sf0.1 / sf1x / sf3x triple that produced the committed
``.benchmarks/bench_sf3x_dedup.json``, honoring SPARK_DRIVER_MEMORY —
the knob that separates "the algorithm is super-linear" from "a 30x
corpus does not fit an 8 GiB single-JVM heap" (VERDICT r7 #1: the sf3x
stage logged GCLocker retries at the 8g default). Run once at 8g and
once at 32g; a ratio that collapses at 32g is memory pressure a real
cluster sizes away, not algorithmic growth.

Prints one JSON object: {query: {"sf0.1": s, "sf1x": s, "sf3x": s,
"r10": ratio, "r30": ratio}} plus the heap it ran at.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEDUP_QUERIES = [
    "dedup_ngram_jaccard_pairs",
    "dedup_minhash_lsh_pairs",
    "dedup_duplicate_clusters",
    "dedup_cluster_representatives",
]

TIERS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1x": os.path.join(REPO, ".scale_probe", "sf1x"),
    "sf3x": os.path.join(REPO, ".scale_probe", "sf3x"),
}


def main() -> None:
    from benchviz_spark.registry import all_queries
    from benchviz_spark.session import get_spark

    spark = get_spark("sf3x_dedup_probe")
    queries = all_queries()
    # warm: JVM, parquet footers
    spark.read.parquet(f"{TIERS['sf0.1']}/documents.parquet").count()
    out: dict[str, dict[str, float]] = {n: {} for n in DEDUP_QUERIES}
    raw: dict[str, dict[str, float]] = {}
    for tier, sf_dir in TIERS.items():
        for name in DEDUP_QUERIES:
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            raw.setdefault(name, {})[tier] = time.perf_counter() - t0
            out[name][tier] = round(raw[name][tier], 2)
            print(f"{tier} {name}: {out[name][tier]}s", file=sys.stderr)
    for name in DEDUP_QUERIES:
        # ratios from UNROUNDED walls (a fast cached row rounds to 0.0
        # and would divide-by-zero or wildly inflate the ratio)
        base = max(raw[name]["sf0.1"], 1e-3)
        out[name]["r10"] = round(raw[name]["sf1x"] / base, 2)
        out[name]["r30"] = round(raw[name]["sf3x"] / base, 2)
    print(
        json.dumps(
            {
                "heap": os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
                "queries": out,
            },
            indent=1,
            sort_keys=True,
        )
    )


if __name__ == "__main__":
    main()
