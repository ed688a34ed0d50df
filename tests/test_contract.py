"""Driver-contract guards: the exact artifacts the grading driver
consumes must keep their shapes — __spark_entry__'s three functions and
bench.py's one-line JSON output."""

from __future__ import annotations

import importlib
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_spark_entry_contract(spark):
    mod = importlib.import_module("__spark_entry__")
    df = mod.entry(spark)
    assert df.count() > 0
    qs = mod.queries()
    osql = mod.oracle_sql()
    assert len(qs) >= 60
    # every oracle belongs to a registered query
    assert set(osql) <= set(qs)
    # the majority of the surface is oracle-checked
    assert len(osql) / len(qs) > 0.8
    assert all(callable(fn) for fn in qs.values())
    assert all(isinstance(sql, str) and "SELECT" in sql.upper() for sql in osql.values())


def test_entry_runs_flagship_at_smoke_sf(spark):
    mod = importlib.import_module("__spark_entry__")
    df = mod.entry(spark)
    # stable schema: the driver smoke-checks columns across rounds
    assert df.columns[0] == "l_returnflag"


def test_bench_emits_single_json_line():
    """bench.py at sf0.001 (keep CI fast): stdout must be exactly one
    parseable JSON object with the driver's expected keys."""
    env = dict(
        os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001", SPARK_GRAFT_CPUS="4"
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=560,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, out.stdout
    payload = json.loads(lines[0])
    assert payload["unit"] == "sec"
    assert payload["sf"] == 0.001
    assert isinstance(payload["value"], (int, float))
    assert len(payload["queries"]) >= 60
    failed = [k for k, v in payload["queries"].items() if v is None]
    assert not failed, failed


def test_all_query_outputs_are_scalar_typed(spark):
    """The driver's rows-only canonicalizer hashes result cells with
    pandas; array/map/struct cells raise 'unhashable type' and void the
    check (round-1 approx_stats_orders regression). Every registered
    query must therefore resolve to a schema of scalar columns only —
    complex intermediates are fine, the RESULT frame is the contract."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from benchviz_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    offenders = []
    for name, fn in sorted(all_queries().items()):
        for f in fn(spark, sf).schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not offenders, offenders
