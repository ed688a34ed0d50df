"""30x probe for similarity_knn_graph (VERDICT r7 #3).

The corpus-wide k-NN graph carries the repo's boldest scale claim —
adaptive bit count => ~linear candidate volume — on a single committed
sf1x timing. This probe measures the same-session sf0.1 / 10x / 30x
triple on HONESTLY scaled embeddings: each replica's vectors are
circularly rotated by the replica index (the embedding analogue of the
dedup probe's text rotation), so replicas are distinct, norm- and
distribution-preserving, and near-orthogonal to each other — NOT 30
identical copies of every vector, which would be the byte-identical
flood the similarity_knn_graph docstring assigns to the exact tier
(and would grow bucket pairs quadratically by construction).

Also records the adaptive bit count B chosen at each scale, so the
committed record shows the mechanism (B grows with log n, occupancy
stays ~target) and not just the wall ratio.

Probe corpora are built once under .scale_probe/knn{10,30}x/
(gitignored; embeddings only — the graph's sole input).

Run:  python scripts/sf3x_knn_probe.py
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = "/root/testdata/sf0.1"
DIM = 64
VEC_STRIDE = 10_000_000

TIERS = {
    "sf0.1": (BASE, 1),
    "knn10x": (os.path.join(REPO, ".scale_probe", "knn10x"), 10),
    "knn30x": (os.path.join(REPO, ".scale_probe", "knn30x"), 30),
}


def build(spark, out_dir: str, replicas: int) -> None:
    from pyspark.sql import functions as F

    out = os.path.join(out_dir, "embeddings.parquet")
    if os.path.isfile(out):
        return
    os.makedirs(out_dir, exist_ok=True)
    base = spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))
    parts = []
    for r in range(replicas):
        rep = base.withColumn("vec_id", F.col("vec_id") + F.lit(r * VEC_STRIDE))
        if r > 0:
            # circular rotation by r: distinct, norm-preserving replicas
            rep = rep.withColumn(
                "embedding",
                F.concat(
                    F.slice("embedding", r + 1, DIM - r),
                    F.slice("embedding", 1, r),
                ),
            )
        parts.append(rep)
    reps = parts[0]
    for p in parts[1:]:
        reps = reps.unionByName(p)
    tmp = out + ".tmpdir"
    reps.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    os.replace(part, out)
    shutil.rmtree(tmp)
    print(f"built {out}", file=sys.stderr)


def main() -> None:
    from benchviz_spark.operators.similarity import (
        KNN_MAX_BITS,
        KNN_TARGET_BUCKET,
        N_BITS,
    )
    from benchviz_spark.registry import all_queries
    from benchviz_spark.session import get_spark

    spark = get_spark("sf3x_knn_probe")
    for sf_dir, replicas in TIERS.values():
        if replicas > 1:
            build(spark, sf_dir, replicas)
    queries = all_queries()
    q = queries["similarity_knn_graph"]
    spark.read.parquet(os.path.join(BASE, "embeddings.parquet")).count()  # warm
    out: dict[str, dict[str, float | int]] = {}
    for tier, (sf_dir, replicas) in TIERS.items():
        n = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).count()
        # the query's own adaptive-bit formula, from the query's own
        # constants — the recorded mechanism column can't diverge
        bits = max(
            N_BITS,
            min(KNN_MAX_BITS, ((n - 1) // KNN_TARGET_BUCKET).bit_length()),
        )
        # min of two fresh executions per tier: the interpreted-HOF
        # re-rank allocates heavily and single runs on this host vary
        # up to 3x on JVM/GC flukes (one session measured the 3x-data
        # 30x tier FASTER than its own 10x leg — 313 s vs 445 s; CPU
        # steal and co-tenant load were ruled out via /proc/stat).
        # Min is the steady-state plan cost; both raw walls stay in
        # the record so the discard is visible.
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            q(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 2))
        wall = min(walls)
        out[tier] = {"n_vectors": n, "bits": bits, "sec": wall, "runs": walls}
        print(f"{tier}: n={n} bits={bits} {wall}s (runs {walls})", file=sys.stderr)
    rec = {
        "heap": os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
        "tiers": out,
        "r10": round(out["knn10x"]["sec"] / out["sf0.1"]["sec"], 2),
        "r30": round(out["knn30x"]["sec"] / out["sf0.1"]["sec"], 2),
    }
    print(json.dumps(rec, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
