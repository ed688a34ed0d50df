"""applyInPandasWithState parity: the stateful stream's final profile
per user must equal the batch aggregation (update mode emits one row
per touched user per batch; take the last emit per user)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from benchviz_spark.streaming.stateful import batch_user_profiles, stream_user_profiles
from benchviz_spark.streaming.windows import run_to_memory

SF_DIR = "/root/testdata/sf0.001"


def test_stateful_profiles_match_batch(spark):
    run_to_memory(stream_user_profiles(spark, SF_DIR), "user_profiles_t", mode="update")
    emitted = spark.table("user_profiles_t")
    # latest emit per user = final state (monotone n_events orders emits)
    w = W.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = (
        emitted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    batch = batch_user_profiles(spark, SF_DIR)
    assert batch.count() > 0
    assert final.exceptAll(batch).count() == 0
    assert batch.exceptAll(final).count() == 0


def test_stateful_lww_state_matches_batch(spark):
    """Streaming LWW compaction converges to the batch max_by answer:
    same winner per user under (ts, event_id) total order."""
    from benchviz_spark.operators.events import events_latest_user_state
    from benchviz_spark.streaming.stateful import stream_latest_user_state

    run_to_memory(stream_latest_user_state(spark, SF_DIR), "lww_state_t", mode="update")
    emitted = spark.table("lww_state_t")
    w = W.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = (
        emitted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    batch = events_latest_user_state(spark, SF_DIR)
    assert batch.count() > 0
    assert final.exceptAll(batch).count() == 0
    assert batch.exceptAll(final).count() == 0
