"""Phase profile of stream_dedup_admission (guide §1 / VERDICT r15 #4).

With a WARM epoch index (built untimed), times separately:
  1. the eval-gram state collection (collect() vs Arrow toPandas()),
  2. the bloom-bitset literal construction,
  3. the full stream-DataFrame CONSTRUCTION (pure driver-side plan
     build: expression trees + state collection),
  4. the drain itself (run_to_memory, availableNow).

The r15 row still carried ~3.3 s of driver-side plan build inside the
timed query; this pins down which phase owns it before changing code.

Usage: SPARK_GRAFT_CPUS=32 python scripts/opt_profile_stream_admission.py
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
    from benchviz_spark.operators.curation import (
        admission_index_names,
        build_admission_index,
    )
    from benchviz_spark.streaming import windows as sw

    spark = get_spark("opt_profile_stream_admission")
    r: dict[str, float] = {}

    def timed(label, fn):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        out = fn()
        r[label] = round(time.perf_counter() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        print(f"{label:42s} {r[label]:8.3f}s", file=sys.stderr)
        return out

    # warm codegen + build the index untimed
    build_admission_index(spark, SF_DIR)
    names = admission_index_names()

    timed("ev collect() rows", lambda: spark.table(names["eval_grams"]).collect())
    timed("ev toPandas() arrow", lambda: spark.table(names["eval_grams"]).toPandas())
    timed("bloom collect 1 row", lambda: spark.table(names["bloom"]).collect())
    for rep in range(2):
        stream_df = timed(
            f"construct stream df (plan build) #{rep}",
            lambda: sw.stream_dedup_admission(spark, SF_DIR),
        )
        timed(
            f"drain availableNow #{rep}",
            lambda: sw.run_to_memory(
                stream_df, f"prof_stream_adm_{rep}", mode="complete"
            ),
        )
    # the registered query end to end, cold (index rebuilt inside)
    clear_caches()
    from benchviz_spark.registry import all_queries

    q = all_queries()["stream_dedup_admission"]
    timed(
        "registered row, cold",
        lambda: q(spark, SF_DIR).write.format("noop").mode("overwrite").save(),
    )
    print(json.dumps(r, indent=1))


if __name__ == "__main__":
    main()
