"""Same-session sf0.1 <-> sf1x probe for NAMED queries, merged into
the committed 10x record.

Round-7 discipline: every new registered query needs an sf1x timing in
.benchmarks/bench_sf1x_full.json plus a paired same-session ratio
(cross-session file ratios are distorted by host-load drift) before
tests/test_scale_guard.py goes green. This script times just the named
queries at sf0.1 and then at .scale_probe/sf1x in ONE Spark session
and merges the rows — existing entries for other queries are left
untouched.

Run:  python scripts/probe_queries_10x.py name1 name2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RECORD = os.path.join(REPO, ".benchmarks", "bench_sf1x_full.json")
SF01 = "/root/testdata/sf0.1"
SF1X = os.path.join(REPO, ".scale_probe", "sf1x")


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: probe_queries_10x.py <query> [<query> ...]")
    from benchviz_spark.registry import all_queries
    from benchviz_spark.session import get_spark

    spark = get_spark("probe_queries_10x")
    queries = all_queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    spark.read.parquet(f"{SF01}/documents.parquet").count()  # warm

    from benchviz_spark.caching import clear_caches

    def run(name: str, sf_dir: str) -> float:
        # same cold-row discipline as bench.py (ADVICE r9): a probe row
        # must never time a cached read another probed query warmed
        clear_caches()
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        sec = round(time.perf_counter() - t0, 2)
        print(f"{sf_dir.split('/')[-1]} {name}: {sec}s", file=sys.stderr)
        return sec

    base = {n: run(n, SF01) for n in names}
    probe = {n: run(n, SF1X) for n in names}

    with open(RECORD) as fh:
        rec = json.load(fh)
    for n in names:
        rec["queries"][n] = probe[n]
        rec["same_session_ratios"][n] = round(probe[n] / base[n], 2)
    rec["n_queries"] = len(rec["queries"])
    with open(RECORD, "w") as fh:
        json.dump(rec, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({n: rec["same_session_ratios"][n] for n in names}))


if __name__ == "__main__":
    main()
