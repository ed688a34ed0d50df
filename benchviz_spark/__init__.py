"""benchviz_spark — a PySpark-native analytics engine.

A from-scratch re-expression of cockroachdb/benchviz's query and
data-processing capabilities (see SURVEY.md) on Apache Spark:

- DataFrame/SQL logical plans, Catalyst physical planning.
- Benchmark-log ingest (text scan -> regex projections -> fact table),
  serving views (per-test JSON, catalog), and the compare feature
  (full outer join on date) — the reference's entire surface.
- A standard relational operator suite over the driver's TPC-H-ish
  tables (joins, aggregations, windows, set ops, top-k, pivot,
  rollup/cube, as-of/range joins).
- Training-data pipeline operators: dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard / embedding-cosine), similarity search,
  text analysis, multimodal binary columns.
- Structured Streaming ingest and event-window analytics.

Everything is built on the public Apache Spark API only.
"""

from benchviz_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
