"""30x probe for the retrieval/sampling additions (PQ ADC search +
reconstruction monitor, hybrid BM25+cosine RRF, DSIR resampling).

Same honesty rules as the knn probe: embeddings replicate with a
circular rotation (distinct, norm-preserving, near-orthogonal
replicas), documents replicate with the text rotation the dedup probe
uses (same length/language stats, disjoint shingles) — never 30
byte-identical copies. Query sets stay fixed (vec_id/doc_id <
N_QUERIES), so the probe measures a fixed query fan-out against a
growing corpus — the retrieval scale shape that matters.

Probe corpora build once under .scale_probe/ret{10,30}x/ (gitignored).

Run:  python scripts/sf3x_retrieval_probe.py
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
STRIDE = 10_000_000

TIERS = {
    "sf0.1": (BASE, 1),
    "ret10x": (os.path.join(REPO, ".scale_probe", "ret10x"), 10),
    "ret30x": (os.path.join(REPO, ".scale_probe", "ret30x"), 30),
}

QUERIES = [
    "similarity_pq_adc_topk",
    "similarity_pq_reconstruction_error",
    "similarity_hybrid_rrf_topk",
    "sample_importance_dsir",
]


def _write_single(df, out: str) -> None:
    tmp = out + ".tmpdir"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    os.replace(part, out)
    shutil.rmtree(tmp)


def build(spark, out_dir: str, replicas: int) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    emb_out = os.path.join(out_dir, "embeddings.parquet")
    if not os.path.isfile(emb_out):
        base = spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))
        parts = []
        for r in range(replicas):
            rep = base.withColumn("vec_id", F.col("vec_id") + F.lit(r * STRIDE))
            if r > 0:
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
        _write_single(reps, emb_out)
        print(f"built {emb_out}", file=sys.stderr)
    doc_out = os.path.join(out_dir, "documents.parquet")
    if not os.path.isfile(doc_out):
        base = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
        parts = []
        for r in range(replicas):
            rep = base.withColumn("doc_id", F.col("doc_id") + F.lit(r * STRIDE))
            if r > 0:
                rep = rep.withColumn(
                    "text",
                    F.concat(
                        F.expr(f"substr(text, {r + 1})"),
                        F.expr(f"substr(text, 1, {r})"),
                    ),
                )
            parts.append(rep)
        reps = parts[0]
        for p in parts[1:]:
            reps = reps.unionByName(p)
        _write_single(reps, doc_out)
        print(f"built {doc_out}", file=sys.stderr)


def main() -> None:
    from benchviz_spark.caching import clear_caches
    from benchviz_spark.registry import all_queries
    from benchviz_spark.session import get_spark

    spark = get_spark("sf3x_retrieval_probe")
    for sf_dir, replicas in TIERS.values():
        if replicas > 1:
            build(spark, sf_dir, replicas)
    queries = all_queries()
    spark.read.parquet(os.path.join(BASE, "embeddings.parquet")).count()  # warm
    out: dict[str, dict[str, float]] = {name: {} for name in QUERIES}
    for tier, (sf_dir, _) in TIERS.items():
        for name in QUERIES:
            clear_caches()  # cold-row discipline (ADVICE r9)
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = round(time.perf_counter() - t0, 2)
            out[name][tier] = wall
            print(f"{tier} {name}: {wall}s", file=sys.stderr)
    rec = {
        "heap": os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
        "queries": {
            name: {
                **t,
                "r10": round(t["ret10x"] / t["sf0.1"], 2),
                "r30": round(t["ret30x"] / t["sf0.1"], 2),
            }
            for name, t in out.items()
        },
    }
    print(json.dumps(rec, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
