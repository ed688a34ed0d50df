"""Central query registry.

Every operator in SURVEY.md §2 (plus the training-data extensions) is
exposed as a named query: a callable ``(spark, sf_dir) -> DataFrame``
and, when SQL-expressible, a DuckDB oracle SQL string computing the
same result with the same column names. The driver's correctness gate
runs both sides and hash-compares values, so the pairs are kept
together here to make alias drift impossible.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

# Modules that register queries on import.
_QUERY_MODULES = (
    "benchviz_spark.operators.relational",
    "benchviz_spark.operators.relational_ext",
    "benchviz_spark.operators.compare",
    "benchviz_spark.operators.asof",
    "benchviz_spark.operators.dedup",
    "benchviz_spark.operators.similarity",
    "benchviz_spark.operators.text_analysis",
    "benchviz_spark.operators.events",
    "benchviz_spark.operators.multimodal",
    "benchviz_spark.operators.skew",
    "benchviz_spark.operators.sampling",
    "benchviz_spark.pipeline",
)


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as query ``name`` with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as err:
            # Only swallow "this query module isn't built yet"; a missing
            # third-party import *inside* a module must fail loudly or the
            # correctness gate shrinks silently.
            if err.name != mod:
                raise
            continue


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)
