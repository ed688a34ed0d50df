"""Rolling-hash fingerprint: distributed fold equals the sequential
definition, and the hash is order-sensitive (unlike md5-of-set)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from benchviz_spark.operators.text_analysis import _ROLL_B, _ROLL_P, text_rolling_hash

SF_DIR = "/root/testdata/sf0.001"


def _xxhash64_spark(spark, values: list[str]) -> dict[str, int]:
    df = spark.createDataFrame([(v,) for v in values], "t string")
    return {r.t: r.h for r in df.select("t", F.xxhash64("t").alias("h")).collect()}


def _reference_roll(tokens: list[str], xx: dict[str, int]) -> int:
    h = 0
    for t in tokens:
        h = (h * _ROLL_B + (xx[t] % _ROLL_P)) % _ROLL_P
    return h


def test_rolling_hash_matches_sequential_definition(spark):
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(25).collect()
    }
    tokenized = {
        d: re.sub(r"\s+", " ", t).strip().lower().split(" ") for d, t in docs.items()
    }
    vocab = sorted({t for toks in tokenized.values() for t in toks})
    xx = _xxhash64_spark(spark, vocab)
    got = {
        r.doc_id: r.rolling_hash for r in text_rolling_hash(spark, SF_DIR).collect()
    }
    for doc_id, toks in tokenized.items():
        assert got[doc_id] == _reference_roll(toks, xx), doc_id


def test_rolling_hash_is_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta alpha")], "doc_id long, text string"
    )
    toks = F.split(F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))), " ")
    rolled = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(
            acc * _ROLL_B + F.pmod(F.xxhash64(t), F.lit(_ROLL_P)), F.lit(_ROLL_P)
        ),
    )
    a, b = [r.h for r in df.select(rolled.alias("h")).collect()]
    assert a != b
