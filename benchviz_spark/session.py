"""SparkSession factory.

Defaults are tuned for the driver's harness (local[N], single JVM)
but every knob is chosen for cluster-scale behavior first:

- AQE on: runtime partition coalescing, skew-join splitting, and
  join-strategy switching replace hand-tuned shuffle counts at 100 TB.
- Arrow on: every Pandas UDF / toPandas crossing is Arrow-batched.
- shuffle.partitions matches local cores here; on a real cluster the
  AQE coalescer makes the static number mostly irrelevant.
- UTC session timezone so timestamp semantics are stable across the
  Spark/DuckDB oracle boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "benchviz_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the singleton SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default: all cores),
    matching the driver's bench harness contract.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 1)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Size-based broadcast decisions, sized to the executors: the
        # 10 MB default is tuned for small-heap clusters and planted a
        # plan CLIFF inside the knn re-rank's scale probes — the 20k-
        # vector tier broadcast its 5 MB vector relation (no exchange)
        # while the 60k tier (16 MB) fell off to a shuffle join whose
        # pair-relation spill exhausted local disk. 64 MB is still
        # conservative against a 128 GiB executor, and the decision
        # stays AQE's size-measured runtime choice — a corpus-scaled
        # relation exceeds any threshold and shuffles, which is the
        # 100-TB-safe behavior (broadcast HINTS on SF-scaled subtrees
        # remain banned by tests/test_plan_sweep.py).
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        # Parquet vectorized reader + nested-column pruning: scan-side wins
        # that matter far more at 100 TB than at sf0.1.
        .config("spark.sql.parquet.enableVectorizedReader", "true")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        # Keep timestamps as written by the generator (no rebase surprises).
        .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
