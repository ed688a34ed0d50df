"""Marginal-cost profile of the index-mediated admission PROBE side.

The epoch build is warmed untimed; each probe stage is then timed
incrementally (persist points reused, so each number is the marginal
cost of that tier). Identifies where the ~7.5 s warm-index delta wall
actually goes (guide §1).

Usage: python scripts/opt_profile_admission_probe.py
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


def main() -> None:
    from pyspark.sql import functions as F

    from benchviz_spark.operators.curation import (
        NGRAM,
        THRESHOLD,
        MIN_CHARS,
        admission_index_names,
        admission_delta_indexed,
        build_admission_index,
        eval_split,
        _norm_text,
    )
    from benchviz_spark.operators.dedup import (
        _INCR_SEEN_RE,
        band_buckets,
        hashed_shingled_documents,
        shingled_documents,
    )
    from benchviz_spark.operators.relational_ext import bloom_might_contain
    from benchviz_spark.sources.tables import load_table, spread

    spark = get_spark("opt_profile_admission_probe")
    r: dict[str, float] = {}

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(label, fn):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        out = fn()
        sec = round(time.perf_counter() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        print(f"{label:45s} {sec:8.3f}s", file=sys.stderr)
        r[label] = sec
        return out

    # warm: build the index untimed, plus codegen/python workers
    names = build_admission_index(spark, SF_DIR, prefix="probeprof")
    noop(hashed_shingled_documents(spark, SF_DIR, materialize=True))
    clear_caches()
    # rebuild memo (tables still on disk; build is memoized per app+prefix,
    # clear_caches dropped the memo so rebuild re-registers — time it too)
    timed("build (tables exist, re-run)", lambda: build_admission_index(spark, SF_DIR, prefix="probeprof"))

    docs = load_table(spark, SF_DIR, "documents")
    batch_docs = spread(spark, docs.filter(~F.col("source").rlike(_INCR_SEEN_RE))).persist()
    timed("batch_docs persist", lambda: batch_docs.count())

    # (1) gate chain
    ev = spark.table(names["eval_grams"])
    sh4 = shingled_documents(spark, SF_DIR, n=NGRAM, docs=batch_docs).filter(
        F.size("shingles") > 0
    )
    flagged = (
        sh4.select(
            "doc_id",
            F.size("shingles").cast("long").alias("n_shingles"),
            F.explode("shingles").alias("g"),
        )
        .join(F.broadcast(ev), "g")
        .groupBy("doc_id", "n_shingles")
        .agg(F.count("*").alias("n_contaminated"))
        .filter(F.round(F.col("n_contaminated") / F.col("n_shingles"), 6) >= THRESHOLD)
        .select("doc_id")
    )
    batch = (
        batch_docs.filter((~eval_split(F.col("doc_id"))) & (F.col("n_chars") >= MIN_CHARS))
        .join(flagged, "doc_id", "left_anti")
        .withColumn("fp", F.md5(_norm_text(F.col("text"))))
        .select("doc_id", "lang", "source", "n_chars", "fp")
        .persist()
    )
    timed("(1) gates -> batch persist", lambda: batch.count())

    # (2) exact tier
    bitmap = spark.table(names["bloom"])
    probed = batch.crossJoin(F.broadcast(bitmap)).withColumn(
        "maybe_seen", bloom_might_contain(F.xxhash64("fp"))
    )
    old_fps = spark.table(names["fps"]).select("fp")
    b2 = (
        probed.filter(~F.col("maybe_seen"))
        .unionByName(probed.filter(F.col("maybe_seen")).join(old_fps, "fp", "left_anti"))
        .select("doc_id", "lang", "source", "n_chars")
        .persist()
    )
    timed("(2) bloom+anti -> b2 persist", lambda: b2.count())

    # (3a) batch bands
    bands_batch = band_buckets(spark, SF_DIR, docs=batch_docs).persist()
    timed("(3a) bands_batch persist", lambda: bands_batch.count())

    # (3b) batch hashed shingles
    sh_batch = hashed_shingled_documents(spark, SF_DIR, docs=batch_docs).persist()
    timed("(3b) sh_batch persist", lambda: sh_batch.count())

    # (3c) candidate join + verify
    from benchviz_spark.operators.dedup import jaccard_of

    new_b = bands_batch.join(b2.select("doc_id"), "doc_id", "left_semi")
    old_b = spark.table(names["bands"])
    cand_old = (
        new_b.select(F.col("doc_id").alias("new_id"), "band", "bucket")
        .join(old_b.select(F.col("doc_id").alias("old_id"), "band", "bucket"), ["band", "bucket"])
        .select("new_id", "old_id")
        .distinct()
    )
    left = sh_batch.select(F.col("doc_id").alias("new_id"), F.col("hs").alias("sa"))
    right = spark.table(names["shingles"]).select(F.col("doc_id").alias("old_id"), F.col("hs").alias("sb"))
    drop_vs_old = (
        cand_old.join(left, "new_id")
        .join(right, "old_id")
        .filter(jaccard_of("sa", "sb") >= 0.5)
        .select(F.col("new_id").alias("doc_id"))
        .distinct()
    )
    b3 = b2.join(drop_vs_old, "doc_id", "left_anti")
    timed("(3c) cand+verify+anti -> noop b3", lambda: noop(b3))

    # full delta for reference (fresh scratch persists, warm index)
    clear_caches()
    build_admission_index(spark, SF_DIR, prefix="probeprof")
    timed("full admission_delta (warm index)", lambda: noop(admission_delta_indexed(spark, SF_DIR, prefix="probeprof")))

    print(json.dumps(r, indent=1))


if __name__ == "__main__":
    main()
