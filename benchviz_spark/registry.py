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
# checked, then to the queries with the OLDEST driver evidence.
# Round-9 window (delivering exactly the rotation the r08 registry
# promised): ALL 28 r05-stale rows lead — after this round no
# registered query's latest driver row is older than r06
# (q10/q12/q15/q16/q17/q18/q20/q22, semi_join_urgent_customers,
# window_customer_running_spend, quantiles_exact_by_flag, the two
# exact sketch twins, stats_chi2/gini/zipf, graph_triangle_suppliers,
# sample_weighted_reservoir_es, sample_temperature_mix,
# similarity_label_centroid_dist, the five streaming twins, and the
# three text scan projections) — then the three queries round 9 added
# (text_bpe_merges_iter3, the iterated-BPE trainer;
# text_bpe_tokenize_docs, its inference side; curation_token_budget,
# the epochs-per-source mixture planner denominated in trained
# tokens: new oracle pairs convert to external evidence immediately;
# note text_bpe_merge_pairs in the stale tier also re-proves the
# shared _word_counts persist point every BPE query now reads), then
# the four queries whose
# registered helper chains changed THIS round
# (dedup_ngram_jaccard_pairs is now the memoized _PAIRS_CACHE persist
# point; dedup_duplicate_clusters and curation_split_leakage both
# consume it instead of re-running pair detection;
# curation_cluster_splits consumes the clusters relation downstream —
# ordered pairs -> clusters -> cluster_splits -> leakage so the
# persist-point costs attribute readably: each query pays only its
# marginal work after the first), then the family representatives the
# contract requires (events/multimodal/skew/bench_log_pipeline/asof/
# compare — every family in every window), and the remaining slots go
# to the OLDEST next tier: r06 rows, operator-style code first
# (q1_pricing_summary and range_join_price_bands yielded their fill
# slots to the round-9 additions and join the r10 list below).
# Every name here carries a DuckDB oracle so no slot is wasted on a
# weaker rows-only check; the only rows-only queries (decode
# mean-luma, the PCA eigensolve, the two sketch estimates) are
# honestly non-SQL-expressible and pytest-bounded. Queries outside the
# window remain registered and guarded by the committed local replica
# (PARITY_LOCAL.json + tests/test_oracle_parity.py). The r10 window
# should rotate to the remaining r06 rows (the registry comment is
# the standing commitment): anti_join_idle_customers,
# basket_part_pair_lift, count_distinct_exact, cube_part_brand_type,
# date_functions_projection, dedup_embedding_blocked_pairs,
# distinct_order_channels, groupingsets_order_stats,
# having_rich_segments, left_join_nation_customer_counts,
# multimodal_embedding_normalized_checksum, pivot_status_by_returnflag,
# q1/q11/q21/q3/q5/q8/q9, quality_profile_documents,
# range_join_price_bands,
# rollup_lineitem_status, sample_stratified_documents,
# scalar_functions_projection, the three setop queries,
# stats_orders_exact, stream_user_profiles, text_bpe_token_counts,
# text_language_id, topk_expensive_orders, unpivot_order_metrics,
# window_top3_orders_per_customer.
_WINDOW = (
    # Last green in r05 — the oldest evidence, all 28 -----------------------
    "graph_triangle_suppliers",
    "q10_return_losses_top20",
    "q12_priority_by_linestatus",
    "q15_top_revenue_supplier",
    "q16_supplier_variety",
    "q17_small_quantity_revenue",
    "q18_bulk_order_customers",
    "q20_bulk_small_part_suppliers",
    "q22_idle_rich_customers",
    "quantiles_exact_by_flag",
    "sample_temperature_mix",
    "sample_weighted_reservoir_es",
    "semi_join_urgent_customers",
    "similarity_label_centroid_dist",
    "sketch_events_daily_exact",
    "sketch_heavy_hitter_exact",
    "stats_chi2_segment_type",
    "stats_value_gini_by_type",
    "stats_zipf_fit",
    "stream_enriched_user_segment",
    "stream_purchase_view_pairs",
    "stream_session_stats",
    "stream_sliding_hourly_halfhour",
    "stream_tumbling_hourly",
    "text_bigram_logprob",
    "text_bpe_merge_pairs",
    "text_rolling_hash",
    "window_customer_running_spend",
    # Oracle-paired, added THIS round (never driver-checked) ---------------
    "text_bpe_merges_iter3",
    "text_bpe_tokenize_docs",
    "curation_token_budget",
    # Registered helper chains changed this round (shared pair persist) ----
    "dedup_ngram_jaccard_pairs",
    "dedup_duplicate_clusters",
    "curation_cluster_splits",
    "curation_split_leakage",
    # Family representatives (contract: every family in every window) ------
    "events_scd2_tier_intervals",
    "multimodal_binary_metadata",
    "skew_salted_join_segments",
    "bench_log_pipeline",
    "asof_purchase_last_view",
    "compare_event_type_series",
    # Oldest next tier (r06), operator-style code first --------------------
    "dedup_exact_documents",
    "decontam_eval_overlap",
    "quality_redact_pii",
    "quality_repetition_metrics",
    "text_tfidf_top_terms",
    "similarity_ann_ivf_topk",
    "sample_split_documents",
    "stream_latest_user_state",
    "multimodal_embedding_stats",
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
