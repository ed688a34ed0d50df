"""Rolling-hash fingerprint: distributed fold equals the sequential
definition, and the hash is order-sensitive (unlike md5-of-set).

The per-token hash is the 32-bit md5 prefix, so the reference here is
pure Python (hashlib) — no Spark primitive in the loop, making this an
engine-independent pin of the fold semantics (the DuckDB oracle is the
second independent replay)."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from benchviz_spark.operators.text_analysis import _ROLL_B, _ROLL_P, text_rolling_hash

SF_DIR = "/root/testdata/sf0.001"


def _tok_hash(t: str) -> int:
    return int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16) % _ROLL_P


def _reference_roll(tokens: list[str]) -> int:
    h = 0
    for t in tokens:
        h = (h * _ROLL_B + _tok_hash(t)) % _ROLL_P
    return h


def test_rolling_hash_matches_sequential_definition(spark):
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(25).collect()
    }
    tokenized = {
        d: re.sub(r"\s+", " ", t).strip().lower().split(" ") for d, t in docs.items()
    }
    got = {
        r.doc_id: r.rolling_hash for r in text_rolling_hash(spark, SF_DIR).collect()
    }
    for doc_id, toks in tokenized.items():
        assert got[doc_id] == _reference_roll(toks), doc_id


def test_rolling_hash_is_order_sensitive(spark):
    assert _reference_roll(["alpha", "beta"]) != _reference_roll(["beta", "alpha"])
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta alpha")], "doc_id long, text string"
    )
    toks = F.split(F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))), " ")

    def tok_hash(t):
        return F.pmod(
            F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"), F.lit(_ROLL_P)
        )

    rolled = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(acc * _ROLL_B + tok_hash(t), F.lit(_ROLL_P)),
    )
    a, b = [r.h for r in df.select(rolled.alias("h")).collect()]
    assert a != b


def test_ngram_novelty_planted_semantics(spark, tmp_path):
    """First owner of a gram scores it novel; a verbatim repost scores
    0; half-copied text scores in between — pinned on planted docs
    (the DuckDB oracle replays the same formula, so this test is the
    independent check that the formula MEANS novelty)."""
    from benchviz_spark.operators.text_analysis import text_ngram_novelty

    orig = "alpha bravo charlie delta echo foxtrot golf hotel"
    fresh = "india juliett kilo lima mike november oscar papa"
    half = "alpha bravo charlie delta quebec romeo sierra tango"
    rows = [(1, orig), (2, orig), (3, fresh), (4, half)]
    df = spark.createDataFrame(
        [(d, t, "en", "synth", len(t)) for d, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sf_novelty")
    df.coalesce(1).write.parquet(sf + "/documents.parquet")
    got = {r.doc_id: r for r in text_ngram_novelty(spark, sf).collect()}
    assert got[1].novelty == 1.0          # first owner of every gram
    assert got[2].novelty == 0.0          # verbatim repost
    assert got[3].novelty == 1.0          # disjoint vocabulary
    assert 0.0 < got[4].novelty < 1.0     # half-copied
    # counts are distinct 3-grams: 8 tokens -> 6 grams
    assert got[1].n_grams == 6 and got[2].n_novel == 0
