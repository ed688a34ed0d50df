"""30x text/BPE-family probe.

The dedup, knn, and decontam/curation families carry committed 30x
records; this adds the text tier — specifically the BPE training +
inference chain, whose scale claim ("the only corpus-scaled work is
the word-count persist point; every merge round is vocab-bounded")
predicts STRONG sub-linearity because the 30x corpus (replicated
documents) grows token COUNT but not vocabulary.

Production order per tier, so rows are marginal cost given the shared
``_word_counts`` persist point:

    text_bpe_merge_pairs     pays the corpus scan + word count
    text_bpe_merges_iter3    vocab-bounded training rounds
    text_bpe_tokenize_docs   one exploded-words join (corpus-scaled,
                             the linear floor of the family)
    curation_token_budget    sources-sized ratios off the same join
    text_tfidf_top_terms     the non-BPE control: a corpus-scaled
                             explode + vocab join with no shared state

Run with SPARK_DRIVER_MEMORY=32g. Prints one JSON object shaped like
the other sf3x records.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHAIN = [
    "text_bpe_merge_pairs",
    "text_bpe_merges_iter3",
    "text_bpe_tokenize_docs",
    "curation_token_budget",
    "text_tfidf_top_terms",
]

TIERS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1x": os.path.join(REPO, ".scale_probe", "sf1x"),
    "sf3x": os.path.join(REPO, ".scale_probe", "sf3x"),
}


def main() -> None:
    from benchviz_spark.registry import all_queries
    from benchviz_spark.session import get_spark

    spark = get_spark("sf3x_text_probe")
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
                    "marginal cost per query given the shared _word_counts "
                    "persist point, consumed in listed order"
                ),
                "queries": out,
            },
            indent=1,
            sort_keys=True,
        )
    )


if __name__ == "__main__":
    main()
