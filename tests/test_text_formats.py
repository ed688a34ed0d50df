"""JSONL / CSV interchange round-trips (serving/text_formats.py): the
documents table must survive both formats byte-for-value, including
adversarial text (commas, quotes, newlines), and mangled JSONL lines
must be quarantined, not dropped or fatal."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from benchviz_spark.serving.text_formats import (
    CORRUPT_COL,
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
)
from benchviz_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _fingerprint(df):
    """Order-independent value hash over all columns."""
    cols = [F.col(c).cast("string") for c in sorted(df.columns)]
    row_hash = F.md5(F.concat_ws("\x1f", *cols))
    return df.select(
        F.sum(F.conv(F.substring(row_hash, 1, 8), 16, 10).cast("bigint")).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]


def test_jsonl_round_trip_documents(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path)
    back = read_jsonl(spark, path, docs.schema).drop(CORRUPT_COL)
    assert back.columns == docs.columns
    assert _fingerprint(back) == _fingerprint(docs)


def test_csv_round_trip_adversarial_text(spark, tmp_path):
    rows = [
        (1, 'comma, "quote", done', "en", "synth", 21),
        (2, "line one\nline two\r\nline three", "en", "synth", 29),
        (3, '""',  "de", "synth", 2),
        (4, "plain", "fr", "synth", 5),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    path = str(tmp_path / "docs_csv")
    write_csv(df, path)
    back = read_csv(spark, path, df.schema)
    got = {r.doc_id: r.text for r in back.collect()}
    assert got == {d: t for d, t, *_ in rows}


def test_csv_round_trip_documents(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "full_csv")
    write_csv(docs, path)
    back = read_csv(spark, path, docs.schema)
    assert _fingerprint(back) == _fingerprint(docs)


def test_jsonl_corrupt_lines_quarantined(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").limit(5)
    path = str(tmp_path / "mangled")
    write_jsonl(docs, path)
    # append a part file with two mangled lines and one good record
    with open(os.path.join(path, "part-zz-manual.json"), "w") as fh:
        fh.write('{"doc_id": 99999, "text": "ok", "lang": "en", '
                 '"source": "manual", "n_chars": 2}\n')
        fh.write("{not json at all\n")
        fh.write('{"doc_id": "also-bad-type"\n')
    # cache: Spark refuses corrupt-column-only queries on raw JSON
    # scans (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the documented
    # workaround is materializing the parse first
    back = read_jsonl(spark, path, docs.schema).cache()
    bad = back.filter(F.col(CORRUPT_COL).isNotNull())
    good = back.filter(F.col(CORRUPT_COL).isNull())
    assert bad.count() == 2
    assert good.filter(F.col("doc_id") == 99999).count() == 1
    # nothing silently dropped: 5 originals + 3 appended lines
    assert back.count() == 8


def test_bm25_rank_contract(spark, sf_dir):
    """BM25 output: exactly the query set, ranks dense from 1, scores
    non-increasing within a query, and every score positive (Robertson
    idf is positive for df < N)."""
    from collections import defaultdict

    from benchviz_spark.operators.text_analysis import (
        BM25_QUERIES,
        BM25_TOPK,
        text_bm25_topk,
    )

    rows = text_bm25_topk(spark, sf_dir).collect()
    by_q = defaultdict(list)
    for r in rows:
        by_q[r.query_id].append(r)
    assert set(by_q) == set(BM25_QUERIES)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= BM25_TOPK
        assert all(a.score >= b.score for a, b in zip(rs, rs[1:]))
        assert all(r.score > 0 for r in rs)


def test_hashed_classifier_is_pure_function(spark, sf_dir):
    """Same text => same score (the model is a pure function of the
    token stream), scores sit in (0, 1), and the keep flag is exactly
    score >= 0.5."""
    from benchviz_spark.operators.quality import (
        quality_hashed_classifier_score,
    )

    rows = quality_hashed_classifier_score(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.quality_score < 1.0
        assert r.keep == (r.quality_score >= 0.5)
    again = {
        r.doc_id: r.quality_score
        for r in quality_hashed_classifier_score(spark, sf_dir).collect()
    }
    assert all(again[r.doc_id] == r.quality_score for r in rows)
