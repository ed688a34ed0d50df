"""Iterated BPE training (text_bpe_merges_iter3): the merge
APPLICATION semantics — greedy leftmost-non-overlapping, back-to-back
occurrences all merge, deterministic tie-break — pinned on planted
text against an independent per-symbol-list Python reference, plus
the Spark/DuckDB oracle agreement on the same planted corpus."""

from __future__ import annotations

import collections

import duckdb

from benchviz_spark.operators.text_analysis import BPE_ITER_ROUNDS
from benchviz_spark.registry import all_oracles, all_queries

QUERY = f"text_bpe_merges_iter{BPE_ITER_ROUNDS}"


def _reference_bpe(texts: list[str], rounds: int) -> list[tuple]:
    """Ground-truth BPE trainer over symbol LISTS (no string-encoding
    tricks): count pairs weighted by word frequency, argmax with
    (-count, 'a b') tie-break, apply greedily left-to-right."""
    words = collections.Counter(w for t in texts for w in t.lower().split())
    vocab = {w: list(w) for w in words}
    out = []
    for r in range(rounds):
        cnt: collections.Counter = collections.Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                cnt[(a, b)] += words[w]
        (a, b), n = sorted(
            cnt.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
        )[0]
        out.append((r + 1, f"{a} {b}", a + b, n))
        for w, syms in vocab.items():
            i, new = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            vocab[w] = new
    return out


# Adversarial corpus, counts chosen by hand:
# - COUNTING includes overlapping adjacent pairs ("aaaa" contributes
#   THREE (a,a) pairs; wc=7 -> round-1 (a,a)=21, the argmax), but
#   APPLICATION is greedy left-to-right non-overlapping
#   (aaaa -> [aa, aa], never [aa, a, a] twice more);
# - back-to-back merges all apply in one round
#   (abababab -> [ab, ab, ab, ab]);
# - round 2 is an exact TIE: (a,b)=14 vs (z,q)=14, and the
#   lexicographic break must pick "a b";
# - word-frequency weighting: pair counts are wc-weighted, never
#   raw-text-position counts.
PLANTED = [
    "aaaa aaaa aaaa aaaa aaaa aaaa",
    "abababab abababab abababab",
    "aaaa abab",
    "zq " * 13 + "zq",
    "single",
]


def _write_planted(spark, tmp_path) -> str:
    sf_dir = str(tmp_path / "planted_sf")
    rows = [
        (i, t, "en", "planted", len(t)) for i, t in enumerate(PLANTED)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def test_merge_application_matches_symbol_list_reference(spark, tmp_path):
    sf_dir = _write_planted(spark, tmp_path)
    got = [
        tuple(r)
        for r in all_queries()[QUERY](spark, sf_dir)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == _reference_bpe(PLANTED, BPE_ITER_ROUNDS)
    # pin the hand-computed plant outcomes (module comment): the
    # overlap-counted round-1 argmax, the tie round won
    # lexicographically, and the deferred loser taking round 3
    assert got[0][1:] == ("a a", "aa", 21)
    assert got[1][1:] == ("a b", "ab", 14)
    assert got[2][1:] == ("z q", "zq", 14)


def test_tokenizer_applies_learned_merges_per_document(spark, tmp_path):
    """text_bpe_tokenize_docs must charge each document the token count
    of its words under the TRAINED segmentation (all merges applied),
    per the same symbol-list reference the trainer is pinned to."""
    sf_dir = _write_planted(spark, tmp_path)

    words = collections.Counter(
        w for t in PLANTED for w in t.lower().split()
    )
    vocab = {w: list(w) for w in words}
    for _, pair, merged, _n in _reference_bpe(PLANTED, BPE_ITER_ROUNDS):
        a, b = pair.split(" ")
        for w, syms in vocab.items():
            i, new = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    new.append(merged)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            vocab[w] = new
    expected = {
        i: (len(t.lower().split()), sum(len(vocab[w]) for w in t.lower().split()))
        for i, t in enumerate(PLANTED)
    }
    got = {
        r.doc_id: (r.n_words, r.n_tokens)
        for r in all_queries()["text_bpe_tokenize_docs"](spark, sf_dir).collect()
    }
    assert got == expected
    # pin the hand-computed compression: each "abababab" (8 chars)
    # segments to [ab, ab, ab, ab] after the round-2 (a,b) merge, so
    # doc 1 (three such words) costs exactly 12 tokens, not 24 chars
    assert got[1] == (3, 12)


def test_token_budget_invariants_on_planted_corpus(spark, tmp_path):
    """curation_token_budget: shares sum to 1, target is uniform, and
    epochs = budget_share * total / (k * n_tokens) exactly (single
    planted source -> epochs == TOKEN_BUDGET_SHARE)."""
    from benchviz_spark.operators.text_analysis import TOKEN_BUDGET_SHARE

    sf_dir = _write_planted(spark, tmp_path)
    rows = all_queries()["curation_token_budget"](spark, sf_dir).collect()
    assert len(rows) == 1  # one planted source
    r = rows[0]
    assert r.token_share == 1.0 and r.target_share == 1.0
    assert r.epochs == round(TOKEN_BUDGET_SHARE, 6)
    # the denominator is the TRAINED token count, not chars or words:
    # must equal the tokenizer query's corpus total
    total = (
        all_queries()["text_bpe_tokenize_docs"](spark, sf_dir)
        .agg({"n_tokens": "sum"})
        .collect()[0][0]
    )
    assert r.n_tokens == total


def test_oracle_replays_the_same_chain_on_planted_text(spark, tmp_path):
    sf_dir = _write_planted(spark, tmp_path)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet/*.parquet'"
    )
    oracle = con.execute(all_oracles()[QUERY]).fetchall()
    got = [
        tuple(r)
        for r in all_queries()[QUERY](spark, sf_dir)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == oracle


def test_pack_trained_composes_tokenizer_counts(spark):
    """text_pack_sequences_trained must pack exactly the tokenizer's
    per-doc counts: same docs, same n_tokens, offsets = per-shard
    prefix sums in doc_id order, seq_id = offset // SEQ_CAPACITY."""
    from benchviz_spark.operators.text_analysis import (
        SEQ_CAPACITY,
        text_bpe_tokenize_docs,
        text_pack_sequences_trained,
    )

    sf = "/root/testdata/sf0.01"
    counts = {r.doc_id: r.n_tokens for r in text_bpe_tokenize_docs(spark, sf).collect()}
    rows = text_pack_sequences_trained(spark, sf).collect()
    assert {r.doc_id for r in rows} == set(counts)
    running: dict[int, int] = {}
    for r in sorted(rows, key=lambda r: r.doc_id):
        assert r.n_tokens == counts[r.doc_id]
        assert r.start_offset == running.get(r.shard, 0)
        assert r.seq_id == r.start_offset // SEQ_CAPACITY
        running[r.shard] = running.get(r.shard, 0) + r.n_tokens
