"""Storage-layout assertions: bucketed co-located joins shuffle nothing;
partitioned fact reads prune by date."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from benchviz_spark.serving.lake import (
    bucketed_join_revenue,
    materialize_bucketed_orders,
    write_fact_partitioned,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark):
    return materialize_bucketed_orders(spark, SF_DIR)


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    """Both sides bucketed on the join key with equal bucket counts:
    the join must contain NO Exchange before the final aggregation's
    own shuffle — i.e. the join itself moves zero rows. Auto-broadcast
    is disabled for the assertion: at test SF the planner would pick a
    (also shuffle-free) broadcast join and hide the bucketing proof."""
    o_name, l_name = bucketed
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = bucketed_join_revenue(spark, o_name, l_name)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    plan = buf.getvalue()
    join_section = plan.split("HashAggregate")[0]  # plan up to the agg
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange" not in join_section, join_section
    assert "SelectedBucketsCount" in plan


def test_bucketed_join_correct(spark, bucketed):
    o_name, l_name = bucketed
    got = {
        r.o_orderstatus: (r.n_items, r.gross)
        for r in bucketed_join_revenue(spark, o_name, l_name).collect()
    }
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    expected = {
        r.o_orderstatus: (r.n_items, r.gross)
        for r in li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("gross"),
        )
        .collect()
    }
    assert got == expected


def test_partitioned_fact_prunes_by_date(spark, tmp_path):
    from benchviz_spark.pipeline import bench_log_pipeline

    fact = bench_log_pipeline(spark, SF_DIR)
    path = str(tmp_path / "fact_lake")
    write_fact_partitioned(fact, path)
    pruned = spark.read.parquet(path).filter(F.col("run_date") == "2015-01-01")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "run_date" in plan.split("PartitionFilters")[1].splitlines()[0]
    assert pruned.count() == 4  # one date dir's worth of the demo tree
