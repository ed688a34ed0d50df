"""Deterministic sampling / dataset-split operators over ``documents``.

Training-data-pipeline tier: reproducible train/val/test splits and
per-stratum downsampling. The reference has no analogue (it is a
benchmark-log visualizer); these exist for the engine's 100-TB
LLM-pipeline brief.

Scale design — why hash buckets and not ``df.sample``/``sampleBy``:

- ``sample()`` draws from a per-partition RNG: the selected set changes
  whenever partitioning, row order, or cluster layout changes. A
  training split must be a PURE FUNCTION of the record key so that (a)
  re-runs, backfills, and incremental appends land every document in
  the same split forever, and (b) two pipelines (or two engines — see
  the DuckDB oracles) agree on the split without coordination.
- ``bucket = int(md5(salt || key)[:8], 16) % 100`` is that pure
  function. md5 here is a spreading hash, not crypto; the 8-hex-digit
  prefix (32 bits) is uniform and cheap, and both Spark (``conv``) and
  DuckDB (``::BIGINT`` on a 0x literal) can decode it — which is what
  makes the operator oracle-checkable cross-engine.
- Everything is a narrow per-row projection: no shuffle, no sample
  pre-scan, no driver-side state. At 100 TB the split adds zero stages
  to whatever reads it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from benchviz_spark.registry import query
from benchviz_spark.sources.tables import load_table

# train/val/test cut points on the 0..99 bucket line
TRAIN_UPTO = 80
VAL_UPTO = 90

# per-language keep-rate (percent) for the stratified downsample:
# overrepresented strata are cut hard, scarce ones kept whole — the
# usual language-rebalancing move before pretraining.
STRATUM_RATES = {"en": 25, "de": 60, "fr": 60, "es": 60, "zh": 100}
_DEFAULT_RATE = 50


def hash_bucket(key: Column, salt: str, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets) from md5(salt || key)."""
    hexpfx = F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8)
    return F.pmod(F.conv(hexpfx, 16, 10).cast("bigint"), F.lit(n_buckets))


def _bucket_sql(salt: str, key_expr: str = "doc_id", n_buckets: int = 100) -> str:
    """The DuckDB spelling of hash_bucket, for oracles."""
    return (
        f"(('0x' || substr(md5('{salt}' || {key_expr}::VARCHAR), 1, 8))::BIGINT"
        f" % {n_buckets})"
    )


@query(
    "sample_split_documents",
    oracle=f"""
    SELECT doc_id, lang, bucket,
           CASE WHEN bucket < {TRAIN_UPTO} THEN 'train'
                WHEN bucket < {VAL_UPTO} THEN 'val'
                ELSE 'test' END AS split
    FROM (
      SELECT doc_id, lang, {_bucket_sql('split:')} AS bucket
      FROM documents
    )
    """,
)
def sample_split_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document's train/val/test assignment (80/10/10). Pure
    projection of the key — stable under reruns, appends, and
    repartitioning, and identical across engines (the oracle recomputes
    it independently in DuckDB)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = hash_bucket(F.col("doc_id"), "split:")
    split = (
        F.when(F.col("bucket") < TRAIN_UPTO, "train")
        .when(F.col("bucket") < VAL_UPTO, "val")
        .otherwise("test")
    )
    return docs.select("doc_id", "lang", bucket.alias("bucket")).withColumn(
        "split", split
    )


@query(
    "sample_stratified_documents",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM (
      SELECT doc_id, lang, source, {_bucket_sql('strat:')} AS bucket
      FROM documents
    )
    WHERE bucket < CASE lang
      {' '.join(f"WHEN '{k}' THEN {v}" for k, v in sorted(STRATUM_RATES.items()))}
      ELSE {_DEFAULT_RATE} END
    """,
)
def sample_stratified_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic downsample (sampleBy semantics, but a
    pure key function instead of an RNG): language x keeps
    STRATUM_RATES[x] percent of its documents, chosen by hash bucket so
    the kept set is reproducible. The rate lookup is a CASE expression
    — no join, no per-stratum pass, one narrow scan."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = hash_bucket(F.col("doc_id"), "strat:")
    rate = F.lit(_DEFAULT_RATE)
    for lang_val, pct in sorted(STRATUM_RATES.items()):
        rate = F.when(F.col("lang") == lang_val, pct).otherwise(rate)
    return (
        docs.withColumn("bucket", bucket)
        .filter(F.col("bucket") < rate)
        .select("doc_id", "lang", "source")
    )
