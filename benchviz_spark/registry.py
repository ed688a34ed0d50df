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
# Round-7 window (delivering exactly the rotation the r06 registry
# promised): the 8 oracle-paired queries the driver has never checked
# (the two newly oracle-paired dedup hashes, the two codec-geometry
# queries, boilerplate mining, and the three round-6 decontam tiers),
# the two queries whose registered defaults/helper-chains changed after
# their last green row (dedup_levenshtein_pairs gained the simhash
# block-widening default; decontam_clean_corpus sits on the
# materialize/localCheckpoint-refactored shingle helpers), the four
# r03-stale scan-side text projections, the three family
# representatives whose families have no stale members
# (bench_log_pipeline / compare / as-of — contract: every family in
# every window), and then 33 of the 41 remaining r04 rows, oldest
# evidence first. The 8 r04 rows left out (q2/q4/q6/q7/q13/q14/q19 +
# subquery_above_avg_orders) are the most stable single-shape TPC-H
# SQL, untouched since r04 and re-proven by the committed PARITY_LOCAL
# replica; after this round no registered query's latest driver row is
# older than r04. Every name here carries a DuckDB oracle so no slot
# is wasted on a weaker rows-only check; the only rows-only queries
# (decode mean-luma, the PCA eigensolve, the two sketch estimates) are
# honestly non-SQL-expressible and pytest-bounded. Queries outside the
# window remain registered and guarded by the committed local replica
# (PARITY_LOCAL.json + tests/test_oracle_parity.py). The r08 window
# should lead with the eleven queries round 7 added after this window
# shipped (similarity_range_search, decontam_substring_hits_strided,
# sample_stratified_exact_k, text_ngram_novelty,
# multimodal_resize_stats, stream_quality_gopher_gate,
# asof_purchase_nearest_view, quality_language_consistency,
# curation_mixture_report, embedding_integrity_profile,
# similarity_knn_graph — all
# oracle-paired, none ever driver-checked), then the 8 held-back
# TPC-H rows
# (q2/q4/q6/q7/q13/q14/q19 + subquery_above_avg_orders), then the
# oldest remaining r04/r05 evidence.
_WINDOW = (
    # Oracle-paired, never driver-checked ----------------------------------
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_fingerprints",
    "multimodal_frame_sample",
    "multimodal_decode_dims",
    "text_boilerplate_ngrams",
    "decontam_fuzzy_eval_pairs",
    "decontam_substring_hits",
    "decontam_clean_corpus_strict",
    # Registered defaults / helper chains changed since last green row -----
    "dedup_levenshtein_pairs",
    "decontam_clean_corpus",
    # Last green in r03 ----------------------------------------------------
    "text_term_frequency",
    "text_token_stats",
    "text_fingerprints",
    "text_quality_scores",
    # Family representatives (contract: every family in every window;
    # these families have no stale members) --------------------------------
    "bench_log_pipeline",
    "compare_event_type_series",
    "asof_purchase_next_click",
    # Last green in r04 — oldest evidence first ----------------------------
    "curation_pipeline",
    "events_daily_delta",
    "events_enriched_user_segment",
    "events_funnel_view_click_purchase",
    "events_gap_filled_hourly",
    "events_latest_user_state",
    "events_multires_rollup",
    "events_purchase_view_pairs",
    "events_retention_cohorts",
    "events_rolling_median_daily",
    "events_session_stats",
    "events_sliding_hourly_halfhour",
    "events_tumbling_hourly",
    "events_type_transitions",
    "events_value_anomalies",
    "explode_user_type_matrix",
    "full_outer_join_daily_type_counts",
    "graph_pagerank_trade_nations",
    "json_props_extraction",
    "quality_length_histogram",
    "quality_table_fingerprints",
    "sample_weighted_mix",
    "similarity_exact_topk",
    "skew_salted_distinct_users",
    "skew_salted_type_totals",
    "stats_ks_purchase_vs_click",
    "stats_moments_by_returnflag",
    "stats_source_term_divergence",
    "stats_winsorized_prices",
    "text_chunk_documents",
    "text_pack_sequences",
    "text_unigram_logprob",
    "window_price_quartiles",
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
