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
    "benchviz_spark.operators.layout",
    "benchviz_spark.pipeline",
)

# The driver's correctness gate records only the FIRST 50 entries of
# ``queries()`` (registration order), so ordering is part of the external
# contract. This window pins those 50 slots explicitly, and ROTATES each
# round so every operator accumulates at least one driver-green row:
# names already driver-green in a prior round's CORRECTNESS_r{N}.json
# yield their slot to oracle-paired queries the driver has never
# checked. Round-4 window = the 17 rows that erred (or hash-failed) in
# r03 and must re-verify after the events-loader fix, plus the 15
# round-3 additions and the remaining never-driver-checked LLM-tier +
# relational queries. Every name here must carry a DuckDB oracle so no
# slot is wasted on a weaker rows-only check. Queries outside the
# window remain registered and guarded by the committed local replica
# (PARITY_LOCAL.json + tests/test_oracle_parity.py).
_WINDOW = (
    # Erred in r03 (events loader) — re-verify first ------------------------
    "events_tumbling_hourly",
    "events_sliding_hourly_halfhour",
    "events_session_stats",
    "events_purchase_view_pairs",
    "events_multires_rollup",
    "events_daily_delta",
    "events_funnel_view_click_purchase",
    "events_retention_cohorts",
    "events_value_anomalies",
    "skew_salted_type_totals",
    "skew_salted_distinct_users",
    "compare_event_type_series",
    "explode_user_type_matrix",
    "json_props_extraction",
    "asof_purchase_last_view",
    "full_outer_join_daily_type_counts",
    "text_pack_sequences",
    # Round-3/4 additions, never driver-checked -----------------------------
    "graph_pagerank_trade_nations",
    "curation_pipeline",
    "dedup_levenshtein_pairs",
    "stats_moments_by_returnflag",
    "stats_zipf_fit",
    "stats_source_term_divergence",
    "stats_winsorized_prices",
    "stats_ks_purchase_vs_click",
    "events_type_transitions",
    "events_latest_user_state",
    "events_rolling_median_daily",
    "events_gap_filled_hourly",
    "events_enriched_user_segment",
    "skew_salted_join_segments",
    "quality_table_fingerprints",
    "quality_length_histogram",
    "window_price_quartiles",
    # Oracle-paired LLM tier, never driver-checked --------------------------
    "multimodal_quantization_error",
    "decontam_clean_corpus",
    "text_unigram_logprob",
    "text_chunk_documents",
    # Family representatives (contract: every family in every window) -------
    "similarity_exact_topk",
    "sample_weighted_mix",
    "bench_log_pipeline",
    # Relational, never driver-checked (+ q1 as the flagship constant) ------
    "q1_pricing_summary",
    "q2_cheapest_part_per_brand",
    "q4_priority_order_counts",
    "q6_forecast_revenue",
    "q7_bilateral_nation_revenue",
    "q13_order_count_distribution",
    "q14_promo_revenue_share",
    "q19_disjunctive_revenue",
    "subquery_above_avg_orders",
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
