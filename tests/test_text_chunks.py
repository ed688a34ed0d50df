"""UDTF chunking invariants: chunks respect the token bound, indexes
are contiguous, and joining a document's chunks in order reproduces the
normalized document byte-for-byte (lossless split)."""

from __future__ import annotations

import re

from benchviz_spark.operators.text_analysis import CHUNK_TOKENS, text_chunk_documents

SF_DIR = "/root/testdata/sf0.001"


def test_chunks_reassemble_documents(spark):
    chunks: dict[int, list] = {}
    for r in text_chunk_documents(spark, SF_DIR).collect():
        chunks.setdefault(r.doc_id, []).append(r)
    docs = {
        r.doc_id: re.sub(r"\s+", " ", r.text).strip().lower()
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    assert set(chunks) == set(docs)
    for doc_id, rows in chunks.items():
        rows.sort(key=lambda r: r.chunk_idx)
        assert [r.chunk_idx for r in rows] == list(range(len(rows)))
        assert all(0 < r.n_tokens <= CHUNK_TOKENS for r in rows)
        assert all(r.n_tokens == CHUNK_TOKENS for r in rows[:-1])  # only tail short
        assert " ".join(r.chunk for r in rows) == docs[doc_id]
