"""Regenerate PARITY_LOCAL.json: the committed full-registry replica of
the driver's correctness gate.

The driver's own CORRECTNESS_r{N}.json records only the first 50
registered queries; this snapshot runs EVERY registered query against
its DuckDB oracle at sf0.01 (same tables, same rows+schema+values
check as tests/test_oracle_parity.py) so the committed verification
record always matches the registered surface. Queries without an
oracle record their row count and ``"err": "no_oracle"`` exactly like
the driver does.

Run:  python scripts/parity_snapshot.py   (writes PARITY_LOCAL.json)
"""

from __future__ import annotations

import json
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

    from benchviz_spark.registry import (
        all_oracles,
        all_partial_oracles,
        all_queries,
    )
    from benchviz_spark.session import get_spark

    spark = get_spark("parity_snapshot")
    queries, oracles = all_queries(), all_oracles()
    partials = all_partial_oracles()
    con = duckdb_connection(SF_DIR)

    report: dict[str, dict] = {}
    for name, fn in queries.items():
        entry = {
            "rows_match": None,
            "schema_match": None,
            "values_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            spark_pdf = fn(spark, SF_DIR).toPandas()
            entry["spark_rows"] = len(spark_pdf)
            if name in oracles:
                oracle_pdf = con.execute(oracles[name]).fetchdf()
                entry["oracle_rows"] = len(oracle_pdf)
                compare_frames(spark_pdf, oracle_pdf, name)
                entry["rows_match"] = entry["schema_match"] = True
                entry["values_match"] = True
            elif name in partials:
                # Same code path as the pytest gate (ADVICE r10: no
                # inline re-implementation that can drift) — including
                # its strict-subset assertion.
                entry["oracle_rows"] = len(con.execute(partials[name]).fetchdf())
                masked = run_partial_pair(spark, con, fn, partials[name], SF_DIR, name)
                entry["rows_match"] = entry["schema_match"] = True
                entry["values_match"] = True
                entry["masked_cols"] = masked  # estimator columns only
            else:
                entry["err"] = "no_oracle"
        except Exception as exc:  # noqa: BLE001 - record and continue
            entry["err"] = f"{type(exc).__name__}: {exc}"[:500]
        report[name] = entry
        status = entry["err"] or "ok"
        print(f"{name}: {status}", file=sys.stderr)

    # import-time frozen profile, not a live env re-read (ADVICE r14):
    # the snapshot describes the plans/oracles actually registered.
    from benchviz_spark.operators.similarity import active_knn_profile

    out = os.path.join(REPO, "PARITY_LOCAL.json")
    with open(out, "w") as fh:
        json.dump(
            {"sf_dir": SF_DIR, "knn_profile": active_knn_profile(), "queries": report},
            fh,
            indent=1,
        )
        fh.write("\n")
    n_ok = sum(1 for e in report.values() if e["values_match"])
    n_no = sum(1 for e in report.values() if e["err"] == "no_oracle")
    n_bad = len(report) - n_ok - n_no
    print(f"{n_ok} oracle-green, {n_no} rows-only, {n_bad} FAILED -> {out}")
    if n_bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
