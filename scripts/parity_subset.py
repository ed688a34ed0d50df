"""Oracle-check a NAMED SUBSET of registered queries (same rows+schema+
values comparison as scripts/parity_snapshot.py, which runs the whole
registry). The optimization round uses this to prove equivalence for
every query a change touches BEFORE moving on, without paying the
full-registry wall each time.

Usage:  python scripts/parity_subset.py <query> [<query> ...]
        python scripts/parity_subset.py --prefix curation_ stream_dedup
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    from oracle_harness import (
        compare_frames,
        duckdb_connection,
        run_partial_pair,
    )

    from benchviz_spark.caching import clear_caches
    from benchviz_spark.registry import (
        all_oracles,
        all_partial_oracles,
        all_queries,
    )
    from benchviz_spark.session import get_spark

    args = sys.argv[1:]
    queries, oracles = all_queries(), all_oracles()
    partials = all_partial_oracles()
    if args and args[0] == "--prefix":
        names = sorted(
            n for n in queries if any(n.startswith(p) for p in args[1:])
        )
    else:
        names = args
    unknown = [n for n in names if n not in queries]
    if unknown or not names:
        sys.exit(f"unknown or empty query list: {unknown}")

    spark = get_spark("parity_subset")
    con = duckdb_connection(SF_DIR)
    failed = []
    for name in names:
        clear_caches()
        try:
            spark_pdf = queries[name](spark, SF_DIR).toPandas()
            if name in oracles:
                oracle_pdf = con.execute(oracles[name]).fetchdf()
                compare_frames(spark_pdf, oracle_pdf, name)
                status = f"ok ({len(spark_pdf)} rows)"
            elif name in partials:
                masked = run_partial_pair(
                    spark, con, queries[name], partials[name], SF_DIR, name
                )
                status = f"ok-partial (masked={masked})"
            else:
                status = f"no_oracle ({len(spark_pdf)} rows)"
        except Exception as exc:  # noqa: BLE001 - record and continue
            status = f"FAILED: {type(exc).__name__}: {exc}"[:300]
            failed.append(name)
        print(f"{name}: {status}")
    if failed:
        sys.exit(f"{len(failed)} FAILED: {failed}")
    print(f"all {len(names)} green")


if __name__ == "__main__":
    main()
