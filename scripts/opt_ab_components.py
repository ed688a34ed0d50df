"""A/B variants of min_label_components' action schedule (guide §1.2).

The cluster-family profiler measured the component loop at ~4.8 s over
the 811-node multimodal dup subgraph with WARM pairs — pure fixed cost
(the committed k=2 unroll already pays one eager localCheckpoint job
PLUS one label-sum job per block). Variants measured here:

  A  committed shape: k=2, eager checkpoint then sum (2 actions/block)
  B  lazy checkpoint: the sum action materializes the checkpoint
     (1 action/block, same fold)
  C  B with k=3 / k=4 (fewer blocks, bigger per-block plans)
  D  B with AQE disabled inside the loop (no per-stage re-planning on
     kB-sized shuffles)

Each variant runs on the deep multimodal graph AND the shallow text
graph (pointer doubling previously lost on shallow graphs; any change
must win or tie on both). 3 runs each, alternating, same session,
warm edges.

Usage: python scripts/opt_ab_components.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from benchviz_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def variant(
    spark: SparkSession,
    pairs: DataFrame,
    docs: DataFrame,
    k: int,
    lazy_ckpt: bool,
    aqe_off: bool,
    grow: int = 1,
    selfloop: bool = False,
) -> DataFrame:
    edges = (
        pairs.union(pairs.select(F.col("right_id"), F.col("left_id")))
        .toDF("src", "dst")
        .localCheckpoint(eager=False)
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint(eager=not lazy_ckpt)
    )
    if selfloop:
        # edges ∪ one self-loop per labeled node: each propagation step
        # is then ONE join + ONE agg referencing the prior labels ONCE,
        # so a k-step unrolled plan grows linearly in k instead of 2^k
        # (the union form references `lab` twice per step — the k=16
        # block of the geometric variant built a 2^16-leaf plan and
        # hung the optimizer).
        edges = edges.union(
            labels.select(F.col("doc_id").alias("src"), F.col("doc_id").alias("dst"))
        ).localCheckpoint(eager=False)

    def label_sum(df: DataFrame) -> int:
        return int(df.agg(F.sum(F.col("label").cast("decimal(38,0)"))).first()[0])

    def propagate(lab: DataFrame) -> DataFrame:
        if selfloop:
            return (
                edges.join(lab, edges.src == lab.doc_id)
                .groupBy(F.col("dst").alias("doc_id"))
                .agg(F.min("label").alias("label"))
                .select(F.col("doc_id"), "label")
            )
        neighbor = edges.join(lab, edges.src == lab.doc_id).select(
            F.col("dst").alias("doc_id"), "label"
        )
        return (
            lab.select("doc_id", "label")
            .union(neighbor)
            .groupBy("doc_id")
            .agg(F.min("label").alias("label"))
        )

    if aqe_off:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        prev_sum = label_sum(labels)
        cur_k = k
        while True:
            for _ in range(cur_k):
                labels = propagate(labels)
            labels = labels.localCheckpoint(eager=not lazy_ckpt)
            cur_sum = label_sum(labels)
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
            cur_k *= grow
    finally:
        if aqe_off:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
    return docs.join(labels, "doc_id", "left").select(
        "doc_id", F.coalesce("label", "doc_id").alias("cluster_id")
    )


VARIANTS = {
    "B_k2_lazy": dict(k=2, lazy_ckpt=True, aqe_off=False),
    "F_k2_self": dict(k=2, lazy_ckpt=True, aqe_off=False, selfloop=True),
    "F_k3_self": dict(k=3, lazy_ckpt=True, aqe_off=False, selfloop=True),
    "F_k4_self": dict(k=4, lazy_ckpt=True, aqe_off=False, selfloop=True),
}


def main() -> None:
    from benchviz_spark.operators import dedup as D
    from benchviz_spark.sources.tables import load_table

    spark = get_spark("opt_ab_components")

    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    mm_pairs = (
        D.dedup_multimodal_pairs(spark, SF_DIR)
        .select("left_id", "right_id")
        .distinct()
        .persist()
    )
    mm_pairs.count()
    text_pairs = (
        D.dedup_ngram_jaccard_pairs(spark, SF_DIR)
        .select("left_id", "right_id")
        .persist()
    )
    text_pairs.count()

    graphs = {"mm": mm_pairs, "text": text_pairs}
    results: dict[str, list[float]] = {}
    baseline_rows: dict[str, list] = {}

    for rep in range(int(os.environ.get("AB_REPS", "3"))):
        for vname, kw in VARIANTS.items():
            for gname, pairs in graphs.items():
                label = f"{vname}/{gname}"
                spark.sparkContext.setJobDescription(label)
                t0 = time.perf_counter()
                out = variant(spark, pairs, docs, **kw)
                out.write.format("noop").mode("overwrite").save()
                sec = round(time.perf_counter() - t0, 3)
                results.setdefault(label, []).append(sec)
                print(f"rep{rep} {label:28s} {sec:7.3f}s", file=sys.stderr)
                # correctness: every variant must equal the committed A
                if rep == 0:
                    rows = sorted(map(tuple, out.collect()))
                    if gname not in baseline_rows:
                        baseline_rows[gname] = rows
                    else:
                        assert rows == baseline_rows[gname], f"{label} differs!"
        spark.sparkContext.setJobDescription(None)

    print("\n== medians ==")
    for label, secs in sorted(results.items()):
        med = sorted(secs)[len(secs) // 2]
        print(f"{label:28s} med {med:7.3f}  {['%.2f' % s for s in secs]}")


if __name__ == "__main__":
    main()
