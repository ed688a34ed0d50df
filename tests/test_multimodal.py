"""Multimodal plumbing contracts: mapInPandas schema/batch behavior and
decode determinism (the SQL oracle covers the vector/binary queries)."""

from __future__ import annotations

from pyspark.sql import functions as F

from benchviz_spark.operators.multimodal import (
    DECODE_SCHEMA,
    _fake_decode,
    decode_features,
    multimodal_decode_features,
)

SF_DIR = "/root/testdata/sf0.001"


def test_decode_schema_and_rows(spark):
    out = multimodal_decode_features(spark, SF_DIR)
    assert out.schema.simpleString() == (
        "struct<doc_id:bigint,n_bytes:bigint,width:int,height:int,"
        "channels:int,mean_luma:double>"
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert out.count() == docs.count()


def test_decode_deterministic(spark):
    a = multimodal_decode_features(spark, SF_DIR).collect()
    b = multimodal_decode_features(spark, SF_DIR).collect()
    assert a == b


def test_decode_features_match_stub(spark):
    """The distributed decode must agree with the local stub row-by-row
    (i.e. mapInPandas introduces no batch-boundary effects)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20)
    payloads = docs.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    got = {r.doc_id: (r.width, r.height, r.channels, r.mean_luma)
           for r in decode_features(payloads).collect()}
    for row in docs.collect():
        assert got[row.doc_id] == _fake_decode(row.text.encode())


def test_decode_partition_count_preserved(spark):
    """mapInPandas must not repartition: decode parallelism == scan
    parallelism."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(4)
    payloads = docs.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    assert decode_features(payloads).rdd.getNumPartitions() == 4
