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
