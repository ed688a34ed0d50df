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
# Round-6 window (delivering the rotation the r05 registry promised):
# 41 of the 45 queries whose latest driver row was r02/r03 — their
# shared helpers (spread, load_table, oracle harness) have been
# refactored since, so the aging evidence is re-proven current — plus
# the newly oracle-paired similarity_ann_ivf_topk (full DuckDB
# training replay) and the two drained applyInPandasWithState stream
# queries, the two r05-green queries whose code materially changed
# this round (the SCD-2 same-second version-key fix; the basket
# single-pass restructure), and the four family representatives the
# window contract requires (skew/asof/compare/bench_log_pipeline have
# no stale members). The four deferred-to-r07 stale rows are the
# simplest scan-side text projections (term_frequency, token_stats,
# fingerprints, quality_scores), each re-proven by this round's
# regenerated PARITY_LOCAL.json; similarity_ann_lsh_topk's change
# (explicit broadcast filter) is result-identical and plan-asserted,
# so it keeps its r05 row. Every name here must carry a DuckDB oracle
# so no slot is wasted on a weaker rows-only check; after this round's
# md5 rebasings only 4 rows-only queries remain (decode mean-luma, the
# PCA eigensolve, the two sketch estimates), each honestly
# non-SQL-expressible and pytest-bounded. Queries outside the window
# remain registered and guarded by the committed local replica
# (PARITY_LOCAL.json + tests/test_oracle_parity.py). The r07 window
# should lead with the queries that gained oracles or changed results
# after the cutoff (dedup_minhash_lsh_pairs, dedup_simhash_fingerprints,
# multimodal_frame_sample, multimodal_decode_dims,
# text_boilerplate_ngrams, the decontam additions
# (decontam_fuzzy_eval_pairs, decontam_substring_hits,
# decontam_clean_corpus_strict), and the two scale-probe
# block-widening fixes dedup_levenshtein_pairs +
# dedup_embedding_blocked_pairs),
# then the four deferred text queries, then whatever is oldest (r04).
_WINDOW = (
    # Newly oracle-paired this round ----------------------------------------
    "similarity_ann_ivf_topk",
    "stream_user_profiles",
    "stream_latest_user_state",
    # Code changed this round — must re-verify ------------------------------
    "events_scd2_tier_intervals",
    "basket_part_pair_lift",
    # Family representatives (contract: every family in every window) -------
    "skew_salted_join_segments",
    "asof_purchase_last_view",
    "compare_event_type_series",
    "bench_log_pipeline",
    # Last green in r02 — oldest evidence first (approx_stats_orders from
    # the r02 board is deliberately unregistered now: sketches can't
    # hash-match cross-engine; stats_orders_exact is its checkable twin) ----
    "anti_join_idle_customers",
    "count_distinct_exact",
    "cube_part_brand_type",
    "date_functions_projection",
    "distinct_order_channels",
    "groupingsets_order_stats",
    "having_rich_segments",
    "left_join_nation_customer_counts",
    "pivot_status_by_returnflag",
    "q11_nation_balance_concentration",
    "q8_nation_market_share",
    "scalar_functions_projection",
    "setop_active_nations",
    "setop_idle_building_customers",
    "setop_union_all_parties",
    "unpivot_order_metrics",
    # Last green in r03 -----------------------------------------------------
    "decontam_eval_overlap",
    "dedup_duplicate_clusters",
    "dedup_embedding_blocked_pairs",
    "dedup_exact_documents",
    "multimodal_binary_metadata",
    "multimodal_embedding_normalized_checksum",
    "multimodal_embedding_stats",
    "q21_waiting_suppliers",
    "q3_top_unshipped_orders",
    "q5_region_revenue",
    "q9_product_profit_by_nation_year",
    "quality_profile_documents",
    "quality_redact_pii",
    "quality_repetition_metrics",
    "range_join_price_bands",
    "rollup_lineitem_status",
    "sample_split_documents",
    "sample_stratified_documents",
    "stats_orders_exact",
    "text_bpe_token_counts",
    "text_language_id",
    "text_tfidf_top_terms",
    "topk_expensive_orders",
    "window_top3_orders_per_customer",
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
