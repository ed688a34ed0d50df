"""Piecewise profile of the near-dup cluster family (guide §1).

The r15 bench's residual cost-centers after the first optimization
sessions are the cluster chains: the multimodal cluster consumers
(mixture report 15.0 s, pipeline 11.2 s, clusters 10.4 s, survivorship
10.0 s in the committed row) and the text-cluster consumers
(representatives 6.2 s, size histogram 5.7 s, survivorship report
5.1 s, duplicate_clusters 4.0 s). Every bench row is cold, so the
per-row cost decomposes into the shared primitives re-run each time.
This script times each primitive separately (cold noop sink from a
cleared-cache state, setJobDescription-labeled) so optimization
effort lands where the seconds are.

Usage: python scripts/opt_profile_clusters.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchviz_spark.caching import clear_caches  # noqa: E402
from benchviz_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, fn, results):
    clear_caches()
    spark.sparkContext.setJobDescription(label)
    t0 = time.perf_counter()
    out = fn()
    sec = round(time.perf_counter() - t0, 3)
    spark.sparkContext.setJobDescription(None)
    print(f"{label:50s} {sec:8.3f}s", file=sys.stderr)
    results[label] = sec
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from benchviz_spark.operators import dedup as D
    from benchviz_spark.operators import curation as C
    from benchviz_spark.sources.tables import load_table

    spark = get_spark("opt_profile_clusters")
    # Warm whole-stage-codegen JIT with a representative heavy query so
    # the first timed row is not charged one-time JIT (OPTIMIZATION §8).
    noop(D.dedup_ngram_jaccard_pairs(spark, SF_DIR))
    clear_caches()

    r: dict[str, float] = {}

    # --- shared primitives, cold each time
    timed(spark, "hashed_shingles(materialize)", lambda: D.hashed_shingled_documents(spark, SF_DIR, materialize=True), r)
    timed(spark, "text_pairs(jaccard) cold", lambda: noop(D.dedup_ngram_jaccard_pairs(spark, SF_DIR)), r)
    timed(spark, "image_pairs(phash) cold", lambda: noop(D.dedup_image_phash_pairs(spark, SF_DIR)), r)
    timed(spark, "audio_pairs cold", lambda: noop(D.dedup_audio_fingerprint_pairs(spark, SF_DIR)), r)
    timed(spark, "mm_pairs(union) cold", lambda: noop(D.dedup_multimodal_pairs(spark, SF_DIR)), r)

    # --- components given warm pairs (loop cost in isolation)
    clear_caches()
    pairs = D.dedup_multimodal_pairs(spark, SF_DIR).select("left_id", "right_id").distinct()
    pairs.count()  # materialize the memoized pair persist
    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    spark.sparkContext.setJobDescription("components(warm mm pairs)")
    t0 = time.perf_counter()
    noop(D.min_label_components(spark, pairs, docs))
    r["components(warm mm pairs)"] = round(time.perf_counter() - t0, 3)
    print(f"{'components(warm mm pairs)':50s} {r['components(warm mm pairs)']:8.3f}s", file=sys.stderr)
    spark.sparkContext.setJobDescription(None)

    # --- full cold rows as the bench times them
    timed(spark, "dedup_duplicate_clusters cold", lambda: noop(D.dedup_duplicate_clusters(spark, SF_DIR)), r)
    timed(spark, "dedup_multimodal_clusters cold", lambda: noop(D.dedup_multimodal_clusters(spark, SF_DIR)), r)
    timed(spark, "dedup_multimodal_survivorship cold", lambda: noop(D.dedup_multimodal_survivorship(spark, SF_DIR)), r)
    timed(spark, "curated_documents cold", lambda: noop(C.curated_documents(spark, SF_DIR)), r)
    timed(spark, "curation_pipeline_multimodal cold", lambda: noop(C.curation_pipeline_multimodal(spark, SF_DIR)), r)
    timed(spark, "curation_mixture_report_multimodal cold", lambda: noop(C.curation_mixture_report_multimodal(spark, SF_DIR)), r)

    # --- increments: consumers given warm upstream memos
    # mixture report with the multimodal-curated persist already built
    spark.sparkContext.setJobDescription("mm_mixture(warm mm curated)")
    t0 = time.perf_counter()
    noop(C.curation_mixture_report_multimodal(spark, SF_DIR))
    r["mm_mixture(warm mm curated)"] = round(time.perf_counter() - t0, 3)
    print(f"{'mm_mixture(warm mm curated)':50s} {r['mm_mixture(warm mm curated)']:8.3f}s", file=sys.stderr)
    spark.sparkContext.setJobDescription(None)

    timed(spark, "dedup_cluster_representatives cold", lambda: noop(D.dedup_cluster_representatives(spark, SF_DIR)), r)
    timed(spark, "dedup_cluster_size_histogram cold", lambda: noop(D.dedup_cluster_size_histogram(spark, SF_DIR)), r)
    timed(spark, "dedup_survivorship_report cold", lambda: noop(D.dedup_survivorship_report(spark, SF_DIR)), r)
    timed(spark, "dedup_semantic_clusters cold", lambda: noop(D.dedup_semantic_clusters(spark, SF_DIR)), r)
    timed(spark, "curation_split_leakage cold", lambda: noop(C.curation_split_leakage(spark, SF_DIR)), r)
    timed(spark, "curation_cluster_splits cold", lambda: noop(C.curation_cluster_splits(spark, SF_DIR)), r)

    print(json.dumps(r, indent=1))


if __name__ == "__main__":
    main()
