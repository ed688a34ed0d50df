"""Sketch error envelopes: the approximate aggregates must track their
exact twins within the accuracy the sketch parameters promise."""

from __future__ import annotations

from benchviz_spark.operators.analytics import (
    sketch_events_daily,
    sketch_events_daily_exact,
)

SF_DIR = "/root/testdata/sf0.01"


def _sketch_vs_exact_rows(spark):
    """Join the production sketch query with its exact twin on day_s —
    the envelope is a cross-QUERY contract now that the sketch query
    carries no inline exact columns."""
    approx = sketch_events_daily(spark, SF_DIR)
    exact = sketch_events_daily_exact(spark, SF_DIR).withColumnRenamed(
        "n_events", "n_events_exact"
    )
    rows = approx.join(exact, "day_s").collect()
    assert rows
    assert all(r.n_events == r.n_events_exact for r in rows)
    return rows


def test_hll_distinct_within_rsd_envelope(spark):
    for r in _sketch_vs_exact_rows(spark):
        # 5 sigma on a 2% rsd sketch: generous but still catches a
        # broken register merge or a silently changed rsd
        assert abs(r.approx_users - r.exact_users) <= max(
            5, 0.10 * r.exact_users
        ), (r.day_s, r.approx_users, r.exact_users)


def test_percentile_sketch_tracks_exact_median(spark):
    for r in _sketch_vs_exact_rows(spark):
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


def test_bloom_prefilter_no_false_negatives_bounded_fps(spark):
    """Bloom invariants: every true match survives the prefilter (no
    false negatives — the correctness property the exact-join rewrite
    relies on), false positives stay under the m/k design bound, and
    the bitset really is a fixed-size one-row map."""
    from pyspark.sql import functions as F

    from benchviz_spark.operators.relational_ext import (
        _BLOOM_WORDS,
        bloom_bitmap,
        bloom_might_contain,
    )
    from benchviz_spark.sources.tables import load_table

    ev = load_table(spark, SF_DIR, "events")
    dim = (
        load_table(spark, SF_DIR, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    bm = bloom_bitmap(dim, "c_custkey")
    bm_rows = bm.collect()
    assert len(bm_rows) == 1
    assert len(bm_rows[0]["bloom"]) <= _BLOOM_WORDS

    kept = ev.crossJoin(F.broadcast(bm)).filter(
        bloom_might_contain(F.col("user_id"))
    )
    n_total = ev.count()
    n_kept = kept.count()
    n_exact = ev.join(dim, ev.user_id == dim.c_custkey, "leftsemi").count()
    # no false negatives: the kept superset covers every exact match
    assert (
        kept.join(dim, kept.user_id == dim.c_custkey, "leftsemi").count()
        == n_exact
    )
    assert n_kept >= n_exact
    # ~0.1% fp design point; 2% leaves jitter room without hiding breakage
    assert n_kept - n_exact <= max(5, 0.02 * n_total), (n_kept, n_exact)


def test_hll_overlap_tracks_exact_inclusion_exclusion(spark):
    """The mergeable-sketch overlap (per-day HLL state re-aggregated
    into per-type / union estimates, intersection by
    inclusion-exclusion) must track the exact twin within the HLL
    envelope. Inclusion-exclusion AMPLIFIES relative error (three
    estimates combine), so the overlap bound is looser than the
    per-set bound."""
    from benchviz_spark.operators.analytics import (
        sketch_user_overlap,
        sketch_user_overlap_exact,
    )

    approx = sketch_user_overlap(spark, SF_DIR).collect()[0]
    exact = sketch_user_overlap_exact(spark, SF_DIR).collect()[0]
    for side in ("a_users", "b_users", "union_users"):
        e, a = exact[f"exact_{side}"], approx[f"approx_{side}"]
        assert abs(a - e) <= max(3, 0.05 * e), (side, a, e)
    e, a = exact["exact_overlap_users"], approx["approx_overlap_users"]
    assert abs(a - e) <= max(5, 0.15 * max(e, 1)), (a, e)


def test_overlap_reuses_memoized_sketch_state(spark):
    """ADVICE r9: the daily HLL sketch state is memoized per
    (applicationId, sf_dir) — repeated overlap queries must consume the
    SAME lazily-checkpointed relation (no second scan+sketch build),
    and the memo must survive producing identical results."""
    from benchviz_spark.operators.analytics import (
        _DAILY_SKETCH_CACHE,
        _daily_user_sketches,
        sketch_user_overlap,
    )

    key = (spark.sparkContext.applicationId, SF_DIR)
    first = sketch_user_overlap(spark, SF_DIR).collect()
    assert key in _DAILY_SKETCH_CACHE
    state = _daily_user_sketches(spark, SF_DIR)
    assert state is _DAILY_SKETCH_CACHE[key]  # memo hit, not a rebuild
    second = sketch_user_overlap(spark, SF_DIR).collect()
    assert second == first


def test_cache_registry_prunes_dead_apps_and_clears(spark):
    """benchviz_spark.caching invariants: inserting under a new
    applicationId evicts entries of other (stopped) applications, and
    clear_caches() empties every registered memo."""
    from benchviz_spark.caching import clear_caches, memo_put, register_cache

    cache = register_cache({})
    df_old = spark.range(1)
    df_new = spark.range(2)
    memo_put(cache, ("dead-app", "/x"), df_old)
    memo_put(cache, ("live-app", "/x"), df_new)
    assert list(cache) == [("live-app", "/x")]  # dead-app entry pruned
    memo_put(cache, ("live-app", "/y"), df_old)
    assert set(cache) == {("live-app", "/x"), ("live-app", "/y")}
    assert clear_caches() >= 2
    assert not cache


def test_closed_form_hll_tracks_exact_overlap(spark):
    """The md5-register HLL (p=12, rsd ~1.625%) must land within a
    5-sigma envelope of the exact inclusion-exclusion counts — same
    contract as the hll_sketch_agg twin, now over registers the
    oracle replays bit-exactly."""
    from benchviz_spark.operators.analytics import (
        sketch_user_overlap_closed,
        sketch_user_overlap_exact,
    )

    a = sketch_user_overlap_closed(spark, SF_DIR).collect()[0]
    e = sketch_user_overlap_exact(spark, SF_DIR).collect()[0]
    for ax, ex in (
        (a.approx_a_users, e.exact_a_users),
        (a.approx_b_users, e.exact_b_users),
        (a.approx_union_users, e.exact_union_users),
    ):
        assert abs(ax - ex) <= max(5, 0.09 * ex), (ax, ex)
    # overlap inherits three envelopes; bound it loosely but finitely
    assert abs(a.approx_overlap_users - e.exact_overlap_users) <= max(
        10, 0.25 * max(e.exact_overlap_users, 1)
    )
