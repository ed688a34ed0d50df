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
    "benchviz_spark.streaming.queries",
    "benchviz_spark.pipeline",
)

# The driver's correctness gate records only the FIRST 50 entries of
# ``queries()`` (registration order), so ordering is part of the external
# contract. This window pins those 50 slots explicitly, and ROTATES each
# round so every operator accumulates at least one driver-green row:
# names already driver-green in a prior round's CORRECTNESS_r{N}.json
# yield their slot to oracle-paired queries the driver has never
# checked. Round-5 window = every oracle-paired query the driver has
# never recorded (incl. the newly oracle-paired sketch exact twins,
# centroid dist, the six drained streaming queries, the LSH ANN via
# hyperplane-literal replay, and the operators added this round: BPE
# merge pairs, cluster representatives, incremental bloom dedup,
# embedding dim correlation), the two queries whose
# code changed this round (zipf bucket pin, jaccard prefix epsilon),
# and 11 of the queries last green in r02 (re-green; cube/having/
# setop/groupingsets/count_distinct/left_join/anti_join/
# date_functions/pivot/q8/q11
# yielded their slots to the operators, stream drains, forward as-of,
# and newly oracle-paired LSH ANN added this round, and rotate in r06).
# Every name here must carry a DuckDB oracle so no slot is wasted on a
# weaker rows-only check; the 8 rows-only estimator/stub queries stay
# pytest-bounded by design. Queries outside the window remain
# registered and guarded by the committed local replica
# (PARITY_LOCAL.json + tests/test_oracle_parity.py).
_WINDOW = (
    # Never driver-checked, oracle-paired -----------------------------------
    "text_bpe_merge_pairs",
    "dedup_cluster_representatives",
    "dedup_incremental_new_docs",
    "embedding_dim_correlation",
    "similarity_ann_lsh_topk",
    "asof_purchase_next_click",
    "events_scd2_tier_intervals",
    "basket_part_pair_lift",
    "events_linear_attribution",
    "stream_tumbling_hourly",
    "stream_session_stats",
    "stream_purchase_view_pairs",
    "stream_enriched_user_segment",
    "stream_sliding_hourly_halfhour",
    "stream_dedup_events",
    "sketch_events_daily_exact",
    "sketch_heavy_hitter_exact",
    "similarity_label_centroid_dist",
    "join_bloom_prefilter_building",
    "dedup_containment_pairs",
    "text_rolling_hash",
    "text_bigram_logprob",
    "events_interarrival_stats",
    "sample_temperature_mix",
    "sample_reservoir_per_source",
    "sample_weighted_reservoir_es",
    "quality_gopher_rules",
    "quality_char_entropy",
    "stats_value_gini_by_type",
    "stats_chi2_segment_type",
    "graph_triangle_suppliers",
    "layout_zorder_events",
    # Code changed this round — must re-verify ------------------------------
    "stats_zipf_fit",
    "dedup_ngram_jaccard_pairs",
    # Family representatives (contract: every family in every window) -------
    "multimodal_quantization_error",
    "skew_salted_join_segments",
    "asof_purchase_last_view",
    "compare_event_type_series",
    "bench_log_pipeline",
    # Last green in r02 — re-green (remainder rotates in r06) ---------------
    "q10_return_losses_top20",
    "q12_priority_by_linestatus",
    "q15_top_revenue_supplier",
    "q16_supplier_variety",
    "q17_small_quantity_revenue",
    "q18_bulk_order_customers",
    "q20_bulk_small_part_suppliers",
    "q22_idle_rich_customers",
    "quantiles_exact_by_flag",
    "semi_join_urgent_customers",
    "window_customer_running_spend",
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
