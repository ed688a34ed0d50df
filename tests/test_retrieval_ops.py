"""Semantic properties of the retrieval/sampling additions the SQL
oracle can't express: the oracle proves Spark == DuckDB on the same
formula; these prove the formula does what the operator claims."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def test_dsir_weights_favor_target_sources(spark):
    """The importance weight must separate the target slice: documents
    FROM the target sources score higher on average than the rest
    (they define the target distribution), and the Gumbel-top-K sample
    overrepresents them relative to their corpus share."""
    from benchviz_spark.operators.sampling import (
        DSIR_TARGET_SOURCES,
        sample_importance_dsir,
    )
    from benchviz_spark.sources.tables import load_table

    sampled = sample_importance_dsir(spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "source").collect()
    tgt = set(DSIR_TARGET_SOURCES)
    corpus_share = sum(1 for r in docs if r.source in tgt) / len(docs)
    sample_share = sum(1 for r in sampled if r.source in tgt) / len(sampled)
    assert sample_share > corpus_share, (sample_share, corpus_share)
    in_w = [r.log_weight for r in sampled if r.source in tgt]
    out_w = [r.log_weight for r in sampled if r.source not in tgt]
    if in_w and out_w:
        assert sum(in_w) / len(in_w) > sum(out_w) / len(out_w)


def test_rrf_fusion_invariants(spark):
    """RRF scores must equal the formula on the emitted ranks, a doc in
    both pools must beat the same-rank single-pool doc, and every
    query must emit exactly RRF_TOPK fused rows with dense ranks."""
    from benchviz_spark.operators.similarity import (
        RRF_K,
        RRF_TOPK,
        similarity_hybrid_rrf_topk,
    )

    rows = similarity_hybrid_rrf_topk(spark, SF_DIR).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q) == 10
    for q, rs in by_q.items():
        assert sorted(x.fused_rank for x in rs) == list(range(1, RRF_TOPK + 1))
        for x in rs:
            expect = 0.0
            if x.lex_rank > 0:
                expect += 1.0 / (RRF_K + x.lex_rank)
            if x.sem_rank > 0:
                expect += 1.0 / (RRF_K + x.sem_rank)
            assert abs(x.rrf_score - round(expect, 6)) < 1e-9
        # ranks strictly follow descending rrf_score (doc_id tiebreak)
        ordered = sorted(rs, key=lambda x: x.fused_rank)
        scores = [x.rrf_score for x in ordered]
        assert scores == sorted(scores, reverse=True)


def test_pq_identical_vectors_share_codes(spark):
    """Two vectors with identical subvectors must encode to identical
    codes (determinism of the argmin tie-break), verified by checking
    the encode path is a pure function: re-running yields the same
    ADC result set."""
    from benchviz_spark.operators.similarity import similarity_pq_adc_topk

    a = {
        (r.query_id, r.neighbor_id): (r.adc_dist, r.rank)
        for r in similarity_pq_adc_topk(spark, SF_DIR).collect()
    }
    b = {
        (r.query_id, r.neighbor_id): (r.adc_dist, r.rank)
        for r in similarity_pq_adc_topk(spark, SF_DIR).collect()
    }
    assert a == b and len(a) == 100


def test_semantic_decontam_flags_are_symmetric_evidence(spark):
    """Every flagged doc's reported max_cosine must be >= the
    threshold, reference a genuine eval-carve id, and doc_id itself
    must NOT be in the eval carve (the gate protects the corpus side)."""
    from benchviz_spark.operators.decontam import (
        EVAL_CAP,
        EVAL_MOD,
        SEM_THRESHOLD,
        decontam_semantic_overlap,
    )

    rows = decontam_semantic_overlap(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.max_cosine >= SEM_THRESHOLD
        assert r.eval_id % EVAL_MOD == 0 and r.eval_id < EVAL_CAP
        assert not (r.doc_id % EVAL_MOD == 0 and r.doc_id < EVAL_CAP)


def test_quality_tiers_partition_the_corpus(spark):
    """Tier cells must partition the curated domain: every doc in
    exactly one tier, all four tiers populated, and mean scores
    monotone q1 < q2 < q3 < q4 when aggregated across sources."""
    from benchviz_spark.operators.curation import curation_quality_tiers
    from benchviz_spark.sources.tables import load_table

    rows = curation_quality_tiers(spark, SF_DIR).collect()
    n_total = sum(r.n_docs for r in rows)
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert n_total == n_docs
    by_tier: dict[str, list] = {}
    for r in rows:
        by_tier.setdefault(r.tier, []).append(r)
    assert set(by_tier) == {"q1", "q2", "q3", "q4"}
    means = {
        t: sum(r.avg_score * r.n_docs for r in rs) / sum(r.n_docs for r in rs)
        for t, rs in by_tier.items()
    }
    assert means["q1"] < means["q2"] < means["q3"] < means["q4"]
