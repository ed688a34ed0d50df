"""Cold re-adjudication of the two surviving bench flags (r14).

- sketch_heavy_hitter_exact x1.8: the one flag that survived r13's
  load-aware adjudication (confirmed by a re-time at loadavg 3.52,
  under the 4.0 gate, inside a driver session whose adjacent
  sketch/stats family re-timed x2.2-x5.2 at loadavg 3.2-6.3). No r13
  commit touched analytics.py. Flagged at sf0.1.
- curation_segment_dedup_corpus x1.9: survived the r14 sf0.01 record
  refresh (re-time 1.504 at loadavg 2.32, inside its own committed
  history spread 0.77-1.57). No r14 commit touched its code.

Discipline (the bisect_broadcast pattern): N cold samples per query in
ONE quiet session, memo + Spark caches cleared before each, loadavg
recorded at every sample. Verdict rule: exonerated iff min(samples)
is within 1.5x of the committed pre-flag history median; a genuine
code regression reproduces in EVERY cold sample.

Writes .benchmarks/flag_readjudication_r14.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from benchviz_spark.caching import clear_caches  # noqa: E402
from benchviz_spark.registry import all_queries  # noqa: E402
from benchviz_spark.session import get_spark  # noqa: E402

# (query, sf_dir it was flagged at, pre-flag history median)
CASES = [
    ("sketch_heavy_hitter_exact", "/root/testdata/sf0.1", 0.466),
    ("curation_segment_dedup_corpus", "/root/testdata/sf0.01", 1.104),
]
SAMPLES = 3


def _loadavg_1m() -> float | None:
    try:
        with open("/proc/loadavg") as fh:
            return float(fh.read().split()[0])
    except OSError:
        return None


def main() -> None:
    spark = get_spark("flag_readjudication_r14")
    queries = all_queries()
    out = {}
    # interleave the two cases so slow host drift hits both equally
    runs = {name: [] for name, _, _ in CASES}
    for _ in range(SAMPLES):
        for name, sf_dir, _ in CASES:
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            clear_caches()
            load = _loadavg_1m()
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs[name].append(
                {"sec": round(time.perf_counter() - t0, 3), "loadavg_1m": load}
            )
    for name, sf_dir, median in CASES:
        best = min(r["sec"] for r in runs[name])
        out[name] = {
            "sf_dir": sf_dir,
            "pre_flag_history_median": median,
            "samples": runs[name],
            "min_sec": best,
            "ratio_vs_history_median": round(best / median, 2),
            "verdict": "exonerated" if best <= 1.5 * median else "reproduced",
        }
        print(name, out[name]["verdict"], "min", best, "vs median", median,
              file=sys.stderr)
    path = os.path.join(REPO, ".benchmarks", "flag_readjudication_r14.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({n: out[n]["verdict"] for n in out} | {"out": path}))


if __name__ == "__main__":
    main()
