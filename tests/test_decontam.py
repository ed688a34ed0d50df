"""Decontamination carve semantics: the eval split must be bounded by
construction (doc_id % EVAL_MOD == 0 AND doc_id < EVAL_CAP), identical
between the Spark predicate and the DuckDB oracle predicate, and the
corpus side must be its exact complement — this is what makes every
``F.broadcast(ev)`` in operators/decontam.py structurally safe at any
corpus scale (see tests/test_plan_sweep.py's allow-list argument)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from benchviz_spark.operators.decontam import (
    EVAL_CAP,
    EVAL_MOD,
    _corpus_sql,
    _eval_sql,
    eval_split,
)

# doc_ids straddling the cap, including %EVAL_MOD==0 rows on both sides
_IDS = (
    list(range(0, 4 * EVAL_MOD))
    + [EVAL_CAP - EVAL_MOD, EVAL_CAP - 1, EVAL_CAP]
    + [EVAL_CAP + k * EVAL_MOD for k in range(5)]
    + [10 * EVAL_CAP, 10 * EVAL_CAP + EVAL_MOD]
)


def test_eval_carve_is_capped_and_mirrors_oracle(spark):
    df = spark.createDataFrame([(i,) for i in _IDS], "doc_id long")
    got = {
        r.doc_id
        for r in df.filter(eval_split(F.col("doc_id"))).collect()
    }
    # the plain-Python spec
    want = {i for i in _IDS if i % EVAL_MOD == 0 and i < EVAL_CAP}
    assert got == want
    # an id divisible by EVAL_MOD but at/above the cap is NOT eval
    assert EVAL_CAP not in got and 10 * EVAL_CAP not in got
    # DuckDB oracle predicate selects the identical set
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(i,) for i in _IDS])
    oracle = {
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM t WHERE {_eval_sql()}"
        ).fetchall()
    }
    assert oracle == want


def test_corpus_side_is_exact_complement(spark):
    df = spark.createDataFrame([(i,) for i in _IDS], "doc_id long")
    ev = {r.doc_id for r in df.filter(eval_split(F.col("doc_id"))).collect()}
    corpus = {
        r.doc_id for r in df.filter(~eval_split(F.col("doc_id"))).collect()
    }
    assert ev | corpus == set(_IDS)
    assert ev & corpus == set()
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(i,) for i in _IDS])
    oracle_corpus = {
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM t WHERE {_corpus_sql()}"
        ).fetchall()
    }
    assert oracle_corpus == corpus


def test_eval_carve_size_is_corpus_independent(spark):
    """Growing the corpus past the cap must not grow the eval carve:
    the broadcast side is fixed at <= EVAL_CAP / EVAL_MOD rows however
    many documents exist (the 100-TB OOM argument, pinned)."""
    small = [(i,) for i in range(0, EVAL_CAP, EVAL_CAP // 200)]
    # the "100x corpus": same ids plus a vastly larger tail above the cap
    big = small + [(EVAL_CAP + i * 7,) for i in range(5000)]
    n_small = (
        spark.createDataFrame(small, "doc_id long")
        .filter(eval_split(F.col("doc_id")))
        .count()
    )
    n_big = (
        spark.createDataFrame(big, "doc_id long")
        .filter(eval_split(F.col("doc_id")))
        .count()
    )
    assert n_big == n_small
    assert n_big <= EVAL_CAP // EVAL_MOD + 1


def test_substring_stride_detection_guarantee(spark, tmp_path):
    """stride=k must still detect every copied span of length
    >= SUB_LEN + k - 1, at EVERY paste offset (worst case included),
    while stride=1 stays the exact spec the oracle checks."""
    import random

    from benchviz_spark.operators.decontam import (
        SUB_LEN,
        decontam_substring_hits,
    )

    stride = 7
    span_len = SUB_LEN + stride - 1  # the guaranteed-detection minimum
    rng = random.Random(1234)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    span = "".join(rng.choice(alpha) for _ in range(span_len))
    # one eval doc (doc_id 0: % EVAL_MOD == 0, under the cap) carrying
    # the span; corpus docs paste it at every offset in a window of
    # unrelated text, plus one clean corpus doc as a negative.
    rows = [(0, "EVALPREFIX " + span + " EVALSUFFIX")]
    clean_of = lambda n: "".join(rng.choice("0123456789") for _ in range(n))
    offsets = range(0, 2 * stride + 3)
    # corpus ids of the form 11k+1 can never fall in the eval carve
    planted_ids = [EVAL_MOD * i + 1 for i in range(len(list(offsets)))]
    for pid, off in zip(planted_ids, offsets):
        rows.append((pid, clean_of(off) + span + clean_of(60)))
    neg_id = EVAL_MOD * len(planted_ids) + 1
    rows.append((neg_id, clean_of(200)))
    df = spark.createDataFrame(
        [(d, t, "en", "synth", len(t)) for d, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sf_planted")
    df.coalesce(1).write.parquet(sf + "/documents.parquet")
    hits = decontam_substring_hits(spark, sf, stride=stride).collect()
    detected = {r.doc_id for r in hits}
    expected = set(planted_ids)
    assert expected <= detected, expected - detected
    assert neg_id not in detected
    # exact mode detects the same planted docs (sanity: stride only
    # thins corpus offsets, never adds hits)
    exact = {r.doc_id for r in decontam_substring_hits(spark, sf).collect()}
    assert detected <= exact


def test_excise_spans_surgery_invariants(spark):
    """Span excision (r14) must agree with the flag tier on WHICH
    documents are contaminated, and the removal arithmetic must be
    window-consistent: one matched start removes NGRAM tokens, k
    overlapping starts remove between NGRAM and k*NGRAM."""
    from benchviz_spark.operators.decontam import (
        NGRAM,
        decontam_eval_overlap,
        decontam_excise_spans,
    )

    sf = "/root/testdata/sf0.01"
    excised = {r.doc_id: r for r in decontam_excise_spans(spark, sf).collect()}
    flagged = {
        r.doc_id for r in decontam_eval_overlap(spark, sf).collect()
    }
    assert set(excised) == flagged  # same contamination verdict, both tiers
    assert excised  # sf0.01 plants real contamination; empty proves nothing
    for r in excised.values():
        removed = r.n_tokens - r.n_tokens_kept
        assert NGRAM <= removed <= r.n_spans * NGRAM, r
        assert r.n_spans >= 1 and r.n_tokens_kept >= 0, r
