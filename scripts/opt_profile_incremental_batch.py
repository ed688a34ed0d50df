"""Marginal-cost profile of the IN-SESSION incremental admission
(`curation_incremental_batch`) — guide §1: measure before touching.

Reconstructs the query body stage by stage, forcing each scratch
persist with a noop sink in dependency order, so each number is the
marginal cost of that tier on top of its persisted predecessors. The
final row is the registered query cold, for reference.

Usage: python scripts/opt_profile_incremental_batch.py [reps]
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


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    from pyspark.sql import functions as F
    from pyspark.sql import Window as W

    from benchviz_spark.operators.curation import (
        _admit_scratch,
        _incremental_gated,
        _with_split,
        curation_incremental_batch,
        jaccard_of,
    )
    from benchviz_spark.operators.dedup import (
        _INCR_SEEN_RE,
        band_buckets,
        min_label_components,
        shingled_documents,
    )
    from benchviz_spark.operators.relational_ext import (
        bloom_bitmap,
        bloom_might_contain,
    )
    from benchviz_spark.sources.tables import spread

    spark = get_spark("opt_profile_incremental_batch")
    out: dict[str, list[float]] = {}

    def timed(label: str, fn) -> None:
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        fn()
        sec = round(time.perf_counter() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        out.setdefault(label, []).append(sec)
        print(f"{label:32s} {sec:8.3f}s", file=sys.stderr, flush=True)

    for rep in range(reps):
        clear_caches()
        sf_dir = SF_DIR

        gated = _admit_scratch(
            spark,
            f"{sf_dir}|prof|gated",
            _incremental_gated(spark, sf_dir).select(
                "doc_id", "lang", "source", "n_chars", "fp"
            ),
        )
        timed("1_gated", lambda: noop(gated))

        old_gated = gated.filter(F.col("source").rlike(_INCR_SEEN_RE))
        rn = F.row_number().over(W.partitionBy("fp").orderBy("doc_id"))
        old_curated = _admit_scratch(
            spark,
            f"{sf_dir}|prof|old_curated",
            old_gated.withColumn("rn", rn)
            .filter(F.col("rn") == 1)
            .select("doc_id", "fp"),
        )
        timed("2_old_curated", lambda: noop(old_curated))

        batch = gated.filter(~F.col("source").rlike(_INCR_SEEN_RE))
        bitmap = bloom_bitmap(
            old_curated.select(F.xxhash64("fp").alias("pk")), "pk"
        )
        probed = batch.crossJoin(F.broadcast(bitmap)).withColumn(
            "maybe_seen", bloom_might_contain(F.xxhash64("fp"))
        )
        old_fps = old_curated.select("fp")
        new_vs_old = probed.filter(~F.col("maybe_seen")).unionByName(
            probed.filter(F.col("maybe_seen")).join(old_fps, "fp", "left_anti")
        )
        b2 = _admit_scratch(
            spark,
            f"{sf_dir}|prof|b2",
            new_vs_old.withColumn("rn", rn)
            .filter(F.col("rn") == 1)
            .select("doc_id", "lang", "source", "n_chars"),
        )
        timed("3_exact_tier_b2", lambda: noop(b2))

        sh3 = _admit_scratch(
            spark,
            f"{sf_dir}|prof|sh3",
            spread(spark, shingled_documents(spark, sf_dir)),
        )
        timed("4_shingle_pass", lambda: noop(sh3.select("doc_id")))
        bands = _admit_scratch(
            spark, f"{sf_dir}|prof|bands", band_buckets(spark, sf_dir, sh=sh3)
        )
        timed("5_bands", lambda: noop(bands))

        new_b = bands.join(b2.select("doc_id"), "doc_id", "left_semi")
        old_b = bands.join(old_curated.select("doc_id"), "doc_id", "left_semi")
        cand_old = (
            new_b.select(F.col("doc_id").alias("new_id"), "band", "bucket")
            .join(
                old_b.select(F.col("doc_id").alias("old_id"), "band", "bucket"),
                ["band", "bucket"],
            )
            .select("new_id", "old_id")
            .distinct()
        )
        sh = _admit_scratch(
            spark,
            f"{sf_dir}|prof|sh",
            sh3.select(
                "doc_id",
                F.array_distinct(
                    F.transform(F.col("shingles"), lambda s: F.xxhash64(s))
                ).alias("hs"),
            ),
        )
        timed("6_hashed_shingles", lambda: noop(sh.select("doc_id")))

        left = sh.select(F.col("doc_id").alias("new_id"), F.col("hs").alias("sa"))
        right = sh.select(F.col("doc_id").alias("old_id"), F.col("hs").alias("sb"))
        jac = jaccard_of("sa", "sb")
        drop_vs_old = (
            cand_old.join(left, "new_id")
            .join(right, "old_id")
            .filter(jac >= 0.5)
            .select(F.col("new_id").alias("doc_id"))
            .distinct()
        )
        b3 = _admit_scratch(
            spark,
            f"{sf_dir}|prof|b3",
            b2.join(drop_vs_old, "doc_id", "left_anti"),
        )
        timed("7_vs_standing_b3", lambda: noop(b3))

        b3_b = bands.join(b3.select("doc_id"), "doc_id", "left_semi")
        cand_nn = (
            b3_b.select(F.col("doc_id").alias("left_id"), "band", "bucket")
            .join(
                b3_b.select(F.col("doc_id").alias("right_id"), "band", "bucket"),
                ["band", "bucket"],
            )
            .filter(F.col("left_id") < F.col("right_id"))
            .select("left_id", "right_id")
            .distinct()
        )
        lshj = sh.select(F.col("doc_id").alias("left_id"), F.col("hs").alias("sa"))
        rshj = sh.select(F.col("doc_id").alias("right_id"), F.col("hs").alias("sb"))
        pairs_nn = (
            cand_nn.join(lshj, "left_id")
            .join(rshj, "right_id")
            .filter(jac >= 0.5)
            .select("left_id", "right_id")
        )
        comp = min_label_components(spark, pairs_nn, b3.select("doc_id"))
        timed("8_components", lambda: noop(comp))

        minima = comp.filter(F.col("doc_id") == F.col("cluster_id")).select(
            "doc_id"
        )
        delta = b3.join(minima, "doc_id", "left_semi")
        final = _with_split(delta).select(
            "doc_id", "lang", "source", "n_chars", "split"
        )
        timed("9_final", lambda: noop(final))

        clear_caches()
        timed(
            "0_registered_cold",
            lambda: noop(curation_incremental_batch(spark, sf_dir)),
        )

    print(json.dumps({k: v for k, v in out.items()}, indent=1))


if __name__ == "__main__":
    main()
