"""Sketch error envelopes: the approximate aggregates must track their
exact twins within the accuracy the sketch parameters promise."""

from __future__ import annotations

from benchviz_spark.operators.analytics import sketch_events_daily

SF_DIR = "/root/testdata/sf0.01"


def test_hll_distinct_within_rsd_envelope(spark):
    rows = sketch_events_daily(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # 5 sigma on a 2% rsd sketch: generous but still catches a
        # broken register merge or a silently changed rsd
        assert abs(r.approx_users - r.exact_users) <= max(
            5, 0.10 * r.exact_users
        ), (r.day_s, r.approx_users, r.exact_users)


def test_percentile_sketch_tracks_exact_median(spark):
    rows = sketch_events_daily(spark, SF_DIR).collect()
    for r in rows:
        spread_band = 0.15 * abs(r.exact_p50_value) + 1e-6
        assert abs(r.approx_p50_value - r.exact_p50_value) <= spread_band, (
            r.day_s,
            r.approx_p50_value,
            r.exact_p50_value,
        )


def test_cms_never_undercounts_and_bounds_overshoot(spark):
    """Count-Min guarantees: est >= exact always (counters only ever
    add colliding terms), and overshoot <= (e/width)*N with
    probability ~1 - e^-depth (N = total token stream length)."""
    from benchviz_spark.operators.analytics import (
        CMS_WIDTH,
        sketch_heavy_hitter_terms,
    )
    from benchviz_spark.operators.text_analysis import _tokens
    from benchviz_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    rows = sketch_heavy_hitter_terms(spark, SF_DIR).collect()
    assert rows
    n_tokens = (
        load_table(spark, SF_DIR, "documents")
        .select(F.explode(_tokens(F.col("text"))))
        .count()
    )
    bound = (2.718 / CMS_WIDTH) * n_tokens + 1
    for r in rows:
        assert r.est_count >= r.exact_count, (r.term, r.est_count, r.exact_count)
        assert r.est_count - r.exact_count <= bound, (
            r.term,
            r.est_count,
            r.exact_count,
            bound,
        )
