"""30x probe of the relational core and the graph family.

Every LLM-pipeline family (dedup/knn/decontam/curation/text/events/
multimodal) carries an sf0.1 / 10x / 30x triple; this closes the last
gap — the TPC-H-shaped relational heart (scan+agg, the deep
multi-join profit rollup, the correlated-exists pipeline) and the
graph operators (weighted PageRank over the trade graph, low-id
triangle counting) — over a 30x replica of the star schema built with
the scale_probe stride recipe (keys shifted per replica, fixed
dimensions kept).

Run with SPARK_DRIVER_MEMORY=32g. Prints one JSON object shaped like
the other sf3x records.
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

CHAIN = [
    "q1_pricing_summary",
    "q9_product_profit_by_nation_year",
    "q21_waiting_suppliers",
    "graph_pagerank_trade_nations",
    "graph_triangle_suppliers",
]

TIERS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1x": os.path.join(REPO, ".scale_probe", "sf1x"),
    "sf3x": os.path.join(REPO, ".scale_probe", "sf3x"),
}
REPLICAS_30X = 30

# Same stride recipe as scripts/scale_probe.py KEYED (30 replicas
# instead of 10); region/nation are fixed dimensions.
STRIDES = {
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
}


def _ensure_sf3x_tables(spark) -> None:
    from pyspark.sql import functions as F

    from benchviz_spark.caching import clear_caches

    built = False
    for table, strides in STRIDES.items():
        out = os.path.join(TIERS["sf3x"], f"{table}.parquet")
        if os.path.isfile(out):
            continue
        if not built:
            clear_caches()  # the sf3x snapshot dir is about to change
            built = True
        base = spark.read.parquet(os.path.join(TIERS["sf0.1"], f"{table}.parquet"))
        if not strides:
            reps = base  # fixed dimension
        else:
            parts = []
            for r in range(REPLICAS_30X):
                rep = base
                for col, stride in strides.items():
                    rep = rep.withColumn(col, F.col(col) + F.lit(r * stride))
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
    from benchviz_spark.caching import clear_caches
    from benchviz_spark.registry import all_queries
    from benchviz_spark.session import get_spark

    spark = get_spark("sf3x_relational_probe")
    _ensure_sf3x_tables(spark)
    queries = all_queries()
    spark.read.parquet(f"{TIERS['sf0.1']}/lineitem.parquet").count()  # warm
    out: dict[str, dict[str, float]] = {n: {} for n in CHAIN}
    raw: dict[str, dict[str, float]] = {}
    for tier, sf_dir in TIERS.items():
        for name in CHAIN:
            clear_caches()  # cold rows, same discipline as bench.py
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
                    "cold per-query rows; 30x star-schema replicas via the "
                    "scale_probe stride recipe (fixed dimensions kept, fact "
                    "keys shifted per replica)"
                ),
                "queries": out,
            },
            indent=1,
            sort_keys=True,
        )
    )


if __name__ == "__main__":
    main()
