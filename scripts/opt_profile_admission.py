"""Profile the admission-index epoch build piece by piece (guide §1).

Times each of the five index tables' materialization separately, then
the index-consuming admission paths, so the r15 optimization round
knows WHERE the 3x-repeated epoch cost actually goes. Every timing is
a cold noop-sink (or the actual saveAsTable the build performs) from a
cleared-cache state, labeled via setJobDescription.

Usage: python scripts/opt_profile_admission.py
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


def timed(spark, label, fn):
    spark.sparkContext.setJobDescription(label)
    t0 = time.perf_counter()
    out = fn()
    sec = round(time.perf_counter() - t0, 3)
    spark.sparkContext.setJobDescription(None)
    print(f"{label:45s} {sec:8.3f}s", file=sys.stderr)
    return sec, out


def main() -> None:
    import shutil
    from urllib.parse import urlparse

    from pyspark.sql import functions as F
    from pyspark.sql import Window as W

    from benchviz_spark.operators.curation import (
        NGRAM,
        _incremental_gated,
        admission_index_names,
        admission_delta_indexed,
        build_admission_index,
        eval_split,
        load_table,
    )
    from benchviz_spark.operators.dedup import (
        _INCR_SEEN_RE,
        band_buckets,
        hashed_shingled_documents,
        shingled_documents,
    )
    from benchviz_spark.operators.relational_ext import bloom_bitmap

    spark = get_spark("opt_profile_admission")
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()

    results: dict[str, float] = {}
    names = admission_index_names("profprefix")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for name in names.values():
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)
    clear_caches()

    docs = load_table(spark, SF_DIR, "documents")

    # --- piece 1: eval grams
    def build_eval():
        ev = (
            shingled_documents(
                spark, SF_DIR, n=NGRAM, docs=docs.filter(eval_split(F.col("doc_id")))
            )
            .filter(F.size("shingles") > 0)
            .select(F.explode("shingles").alias("g"))
            .distinct()
        )
        ev.write.mode("overwrite").saveAsTable(names["eval_grams"])

    results["eval_grams"], _ = timed(spark, "build: eval_grams", build_eval)

    # --- piece 2: curated fps (gates + window + bucketed write)
    def build_fps():
        standing_gated = _incremental_gated(spark, SF_DIR).filter(
            F.col("source").rlike(_INCR_SEEN_RE)
        )
        rn = F.row_number().over(W.partitionBy("fp").orderBy("doc_id"))
        curated = (
            standing_gated.withColumn("rn", rn)
            .filter(F.col("rn") == 1)
            .select("doc_id", "fp")
        )
        curated.write.mode("overwrite").bucketBy(8, "fp").saveAsTable(names["fps"])

    results["fps"], _ = timed(spark, "build: fps (gates+rn)", build_fps)

    curated_ids = spark.table(names["fps"]).select("doc_id")
    standing_docs = docs.join(curated_ids, "doc_id", "left_semi")

    # --- piece 3: band postings
    def build_bands():
        band_buckets(spark, SF_DIR, docs=standing_docs).write.mode(
            "overwrite"
        ).bucketBy(8, "band", "bucket").saveAsTable(names["bands"])

    results["bands"], _ = timed(spark, "build: bands (minhash)", build_bands)

    # --- piece 4: shingle store
    def build_shingles():
        hashed_shingled_documents(spark, SF_DIR, docs=standing_docs).write.mode(
            "overwrite"
        ).bucketBy(8, "doc_id").saveAsTable(names["shingles"])

    results["shingles"], _ = timed(spark, "build: shingles", build_shingles)

    # --- piece 5: bloom bitset
    def build_bloom():
        bloom_bitmap(
            spark.table(names["fps"]).select(F.xxhash64("fp").alias("pk")), "pk"
        ).write.mode("overwrite").saveAsTable(names["bloom"])

    results["bloom"], _ = timed(spark, "build: bloom", build_bloom)

    # --- whole build via the real function (fresh prefix, memo cleared)
    clear_caches()
    results["build_total_real"], _ = timed(
        spark,
        "build_admission_index (real, cold)",
        lambda: build_admission_index(spark, SF_DIR, prefix="profreal"),
    )

    # --- the admission delta consuming an already-built index
    def run_delta():
        admission_delta_indexed(spark, SF_DIR, prefix="profreal").write.format(
            "noop"
        ).mode("overwrite").save()

    results["admission_delta_warm_index"], _ = timed(
        spark, "admission_delta (index present)", run_delta
    )

    print(json.dumps(results, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
