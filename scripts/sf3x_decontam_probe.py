"""30x probe for the decontamination + curation families.

The decontam design claim is that the eval side is STRUCTURALLY
bounded (doc_id % EVAL_MOD == 0 AND doc_id < EVAL_CAP), so corpus
growth should cost ~one extra corpus scan per tier and the family
should track linear-or-better at 30x input. The sf3x corpus's shifted
doc_ids (up to ~3e8) exercise the cap for real — only the replica-0
carve is eval. The curation pair additionally measures the shared
curated_documents persist point at scale: the pipeline pays the chain,
the report's row shows the marginal aggregation over the cached
relation.

Same-session sf0.1 / sf1x / sf3x triple; run with
SPARK_DRIVER_MEMORY=32g (the 8 GiB default fakes super-linear tails
at 30x via GCLocker pressure — see bench_sf3x_dedup.json).

Run:  SPARK_DRIVER_MEMORY=32g python scripts/sf3x_decontam_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = [
    "decontam_eval_overlap",
    "decontam_substring_hits_strided",
    "decontam_clean_corpus_strict",
    "curation_pipeline",
    "curation_mixture_report",  # after the pipeline: measures the
    # marginal cost over the shared persisted relation
]

TIERS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1x": os.path.join(REPO, ".scale_probe", "sf1x"),
    "sf3x": os.path.join(REPO, ".scale_probe", "sf3x"),
}


def main() -> None:
    from benchviz_spark.registry import all_queries
    from benchviz_spark.session import get_spark

    spark = get_spark("sf3x_decontam_probe")
    queries = all_queries()
    spark.read.parquet(f"{TIERS['sf0.1']}/documents.parquet").count()
    out: dict[str, dict[str, float]] = {n: {} for n in QUERIES}
    raw: dict[str, dict[str, float]] = {}
    for tier, sf_dir in TIERS.items():
        for name in QUERIES:
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            raw.setdefault(name, {})[tier] = time.perf_counter() - t0
            out[name][tier] = round(raw[name][tier], 2)
            print(f"{tier} {name}: {out[name][tier]}s", file=sys.stderr)
    for name in QUERIES:
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
