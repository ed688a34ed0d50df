"""Scale probe: time the heaviest registered queries at sf0.1 and at a
10x key-remapped replication of it, to catch constants the sf0.1 bench
can't — anything super-linear gets a plan audit.

The probe corpus is built ONCE under .scale_probe/sf1x/ (gitignored)
from /root/testdata/sf0.1 only — no synthetic rows, just 10 replicas
with disjoint key spaces so entity counts scale the way a real 10x
corpus would:

- every key column shifts by replica * stride (orders/lineitem share
  the order stride; lineitem's part/supp keys shift with part/supplier)
- users/customers multiply (per-user event volume stays constant — the
  realistic growth axis for user-partitioned operators)
- document text ROTATES by the replica index, so replicas are not
  near-duplicates of each other and the pairwise dedup tier sees an
  honestly scaled shingle space rather than 10 exact copies of every
  document (which would grow pair counts quadratically by construction)
- dimension tables (region, nation) stay fixed, like real dimensions
- similarity queries keep vec_id < N_QUERIES as the query set, so the
  probe measures a fixed query fan-out against a 10x corpus — the ANN
  scale shape that matters

Run:  python scripts/scale_probe.py            (build + time + JSON)
      python scripts/scale_probe.py --rebuild  (force corpus rebuild)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_SF = "/root/testdata/sf0.1"
PROBE_DIR = os.path.join(REPO, ".scale_probe", "sf1x")
REPLICAS = 10

# (table, {column: per-replica stride}) — stride 0 keeps the column.
KEYED = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": 10_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "part": {"p_partkey": 10_000_000},
    "orders": {"o_orderkey": 100_000_000, "o_custkey": 10_000_000},
    "lineitem": {
        "l_orderkey": 100_000_000,
        "l_partkey": 10_000_000,
        "l_suppkey": 1_000_000,
    },
    "events": {"event_id": 1_000_000_000, "user_id": 10_000_000},
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 10_000_000},
}

# Heaviest queries from the committed sf0.1 bench plus one
# representative of each major plan shape.
PROBE_QUERIES = [
    "q1_pricing_summary",
    "q9_product_profit_by_nation_year",
    "window_customer_running_spend",
    "events_session_stats",
    "asof_purchase_last_view",
    "basket_part_pair_lift",
    "curation_pipeline",
    "dedup_ngram_jaccard_pairs",
    "dedup_containment_pairs",
    "dedup_duplicate_clusters",
    "dedup_cluster_representatives",
    "sketch_events_daily",
    "graph_pagerank_trade_nations",
    "similarity_ann_lsh_topk",
    "embedding_pca_top_component",
    "text_tfidf_top_terms",
]


def build_corpus(spark) -> None:
    import glob
    import shutil

    from pyspark.sql import functions as F

    from benchviz_spark.caching import clear_caches

    # The snapshot under PROBE_DIR is about to change on disk: any
    # session-memoized relation keyed by this sf_dir (pair relation,
    # clusters, curated corpus, word counts, sketch state) would
    # silently serve rows of the OLD snapshot (ADVICE r9).
    clear_caches()
    os.makedirs(PROBE_DIR, exist_ok=True)
    for table, strides in KEYED.items():
        # single FILE named <table>.parquet, like the real testdata —
        # the streaming source's pathGlobFilter matches leaf file
        # names, so a directory-shaped events.parquet would stream
        # zero rows
        out = os.path.join(PROBE_DIR, f"{table}.parquet")
        if os.path.isfile(out):
            continue
        base = spark.read.parquet(os.path.join(BASE_SF, f"{table}.parquet"))
        if not strides and table in ("region", "nation"):
            reps = base  # fixed dimension
        else:
            parts = []
            for r in range(REPLICAS):
                rep = base
                for col, stride in strides.items():
                    rep = rep.withColumn(col, F.col(col) + F.lit(r * stride))
                if table == "documents" and r > 0:
                    # rotate text by r chars: same length/language stats,
                    # disjoint shingles across replicas
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
        tmp = out + ".tmpdir"
        reps.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        os.replace(part, out)
        shutil.rmtree(tmp)
        print(f"built {table}", file=sys.stderr)


def time_queries(spark, queries, sf_dir: str) -> dict[str, float]:
    timings = {}
    for name in PROBE_QUERIES:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 2)
        print(f"{sf_dir.split('/')[-1]} {name}: {timings[name]}s", file=sys.stderr)
    return timings


def main() -> None:
    from benchviz_spark.registry import all_queries
    from benchviz_spark.session import get_spark

    spark = get_spark("scale_probe")
    if "--rebuild" in sys.argv and os.path.isdir(PROBE_DIR):
        import shutil

        shutil.rmtree(PROBE_DIR)
    build_corpus(spark)
    queries = all_queries()
    # warm: JVM, parquet footers, MLlib classes
    spark.read.parquet(os.path.join(PROBE_DIR, "lineitem.parquet")).count()
    base = time_queries(spark, queries, BASE_SF)
    probe = time_queries(spark, queries, PROBE_DIR)
    report = {
        name: {
            "sf0.1_sec": base[name],
            "sf1x_sec": probe[name],
            "ratio": round(probe[name] / base[name], 2) if base[name] else None,
        }
        for name in PROBE_QUERIES
    }
    print(json.dumps({"replicas": REPLICAS, "queries": report}, indent=1))


if __name__ == "__main__":
    main()
