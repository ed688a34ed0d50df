"""Storage-layout utilities: partitioned + bucketed materialization.

SURVEY §4's physical-design notes call for partitioning the fact table
by date and bucketing repeated-join tables on their join key. These
helpers materialize that layout and are plan-tested: a join between two
tables bucketed on the same key by the same bucket count runs WITHOUT
any Exchange (shuffle) — at 100 TB that is the difference between a
join that moves nothing and one that moves both tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_fact_partitioned(fact: DataFrame, path: str) -> None:
    """bench_results partitioned by run_date: date-filtered reads prune
    whole directories (the reference's date-dir layout, kept at rest)."""
    fact.write.mode("overwrite").partitionBy("run_date").parquet(path)


def materialize_bucketed_orders(
    spark: SparkSession, sf_dir: str, n_buckets: int = 8
) -> tuple[str, str]:
    """Persist orders and lineitem bucketed by the join key. Returns the
    two table names. Spark only honors bucket metadata through the
    catalog, so these are saveAsTable (location = spark warehouse dir).
    """
    import shutil
    from urllib.parse import urlparse

    from benchviz_spark.sources.tables import load_table

    o_name, l_name = "orders_bucketed", "lineitem_bucketed"
    # a previous session's managed-table location survives the (per
    # session) derby metastore — clear both, or saveAsTable refuses
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for name in (o_name, l_name):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    (
        orders.write.mode("overwrite")
        .bucketBy(n_buckets, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(o_name)
    )
    (
        li.write.mode("overwrite")
        .bucketBy(n_buckets, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(l_name)
    )
    return o_name, l_name


def bucketed_join_revenue(spark: SparkSession, o_name: str, l_name: str) -> DataFrame:
    """orders x lineitem on the bucket key: with matching bucket specs
    this plans as a zero-shuffle sort-merge join (asserted in
    tests/test_lake.py)."""
    from pyspark.sql import functions as F

    orders = spark.table(o_name)
    li = spark.table(l_name)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("gross"),
        )
    )
