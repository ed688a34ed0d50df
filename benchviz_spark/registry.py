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
    "benchviz_spark.operators.quality",
    "benchviz_spark.operators.decontam",
    "benchviz_spark.operators.analytics",
    "benchviz_spark.operators.graph",
    "benchviz_spark.operators.curation",
    "benchviz_spark.pipeline",
)

# The driver's correctness gate records only the FIRST 50 entries of
# ``queries()`` (registration order), so ordering is part of the external
# contract. This window pins those 50 slots explicitly: every
# training-data-pipeline family (dedup / similarity / text / events /
# multimodal / skew / sampling / bench-log pipeline) plus the compare /
# as-of operators and a representative relational core. Every name here
# must carry a DuckDB oracle so no window slot is wasted on a weaker
# rows-only check. Queries beyond the window remain registered and are
# guarded by the local oracle-parity replica (tests/test_oracle_parity.py).
_WINDOW = (
    # LLM-data-pipeline tier ------------------------------------------------
    "dedup_exact_documents",
    "dedup_ngram_jaccard_pairs",
    "dedup_embedding_blocked_pairs",
    "dedup_duplicate_clusters",
    "similarity_exact_topk",
    "text_token_stats",
    "text_bpe_token_counts",
    "text_term_frequency",
    "text_tfidf_top_terms",
    "text_language_id",
    "text_quality_scores",
    "text_fingerprints",
    "text_pack_sequences",
    "events_tumbling_hourly",
    "events_sliding_hourly_halfhour",
    "events_session_stats",
    "events_purchase_view_pairs",
    "events_multires_rollup",
    "events_daily_delta",
    "events_funnel_view_click_purchase",
    "events_retention_cohorts",
    "events_value_anomalies",
    "multimodal_embedding_stats",
    "multimodal_embedding_normalized_checksum",
    "multimodal_binary_metadata",
    "skew_salted_type_totals",
    "skew_salted_distinct_users",
    "sample_split_documents",
    "sample_stratified_documents",
    "sample_weighted_mix",
    "quality_redact_pii",
    "quality_profile_documents",
    "quality_repetition_metrics",
    "decontam_eval_overlap",
    "bench_log_pipeline",
    # Compare / as-of -------------------------------------------------------
    "compare_event_type_series",
    "explode_user_type_matrix",
    "json_props_extraction",
    "asof_purchase_last_view",
    # Relational core -------------------------------------------------------
    "q1_pricing_summary",
    "q3_top_unshipped_orders",
    "q5_region_revenue",
    "q9_product_profit_by_nation_year",
    "q21_waiting_suppliers",
    "window_top3_orders_per_customer",
    "rollup_lineitem_status",
    "topk_expensive_orders",
    "range_join_price_bands",
    "full_outer_join_daily_type_counts",
    "stats_orders_exact",
)


def _windowed(queries: dict[str, QueryFn]) -> dict[str, QueryFn]:
    """Return ``queries`` re-ordered: window names first, rest stable."""
    missing = [n for n in _WINDOW if n not in queries]
    if missing:
        raise RuntimeError(f"window names not registered: {missing}")
    ordered = {n: queries[n] for n in _WINDOW}
    ordered.update((n, fn) for n, fn in queries.items() if n not in ordered)
    return ordered


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
    return _windowed(dict(_QUERIES))


def all_oracles() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)
