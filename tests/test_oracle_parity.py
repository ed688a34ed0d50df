"""Spark-vs-DuckDB parity for every registered query with an oracle —
the local replica of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from benchviz_spark.registry import all_oracles, all_partial_oracles, all_queries
from tests.oracle_harness import duckdb_connection, run_pair, run_partial_pair

QUERIES = all_queries()
ORACLES = all_oracles()
PARTIALS = all_partial_oracles()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


def test_every_oracle_has_a_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, duck, sf_dir):
    run_pair(spark, duck, QUERIES[name], ORACLES[name], sf_dir, name)


@pytest.mark.parametrize("name", sorted(PARTIALS))
def test_partial_oracle_parity(name, spark, duck, sf_dir):
    """Partial oracles hash-check the deterministic column subset; the
    masked (estimator) columns must be a strict non-empty remainder."""
    assert name not in ORACLES
    masked = run_partial_pair(
        spark, duck, QUERIES[name], PARTIALS[name], sf_dir, name
    )
    assert masked


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLES) - set(PARTIALS))
)
def test_rows_only_queries_run(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
