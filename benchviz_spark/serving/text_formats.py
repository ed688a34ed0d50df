"""JSONL / CSV interchange for the document tables (§2.1 source/sink
breadth beside the parquet lake and the per-test JSON tree).

Real pipelines receive corpora as JSON-lines or CSV long before they
become parquet; these helpers make that boundary explicit and testable:

- **Schemas are always passed, never inferred.** Inference is a second
  full read at 100 TB AND a correctness hazard (a column of digit-only
  strings silently becomes BIGINT on the batch where no row disproves
  it, then conflicts with the next batch). The reader takes the exact
  StructType and runs one pass.
- **PERMISSIVE + corrupt-record capture** on the JSONL read: at corpus
  scale some records are always mangled; failing the job on row 3
  billion is not an option, and silently dropping rows is worse. Bad
  rows land in ``_corrupt_record`` for a quarantine filter.
- **CSV writes quote/escape via the standard rules** (quote doubling,
  embedded newlines inside quotes) and the reader sets ``multiLine``
  so round-trips survive adversarial text — document bodies contain
  commas, quotes, and newlines as a matter of course.
- Writers emit a directory of part files (one per partition) — the
  distributed shape; single-file export is a ``coalesce(1)`` away and
  deliberately NOT the default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

CORRUPT_COL = "_corrupt_record"


def write_jsonl(df: DataFrame, path: str) -> None:
    """Write ``df`` as JSON-lines part files (one object per line)."""
    df.write.mode("overwrite").json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """One-pass JSONL read with the given schema; mangled lines are
    kept in ``_corrupt_record`` instead of failing or vanishing."""
    schema_with_corrupt = StructType(schema.fields[:]).add(
        CORRUPT_COL, "string"
    )
    return spark.read.schema(schema_with_corrupt).option(
        "mode", "PERMISSIVE"
    ).option("columnNameOfCorruptRecord", CORRUPT_COL).json(path)


def write_csv(df: DataFrame, path: str) -> None:
    """Write ``df`` as RFC-4180-style CSV part files with a header;
    quoting/escaping handles embedded commas, quotes, and newlines."""
    (
        df.write.mode("overwrite")
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')  # RFC quote-doubling, not backslashes
        .csv(path)
    )


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """One-pass schema'd CSV read; ``multiLine`` so quoted embedded
    newlines (ordinary in document text) parse as one record."""
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", True)
        .csv(path)
    )
