"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY §2.9/§2.10: the arbitrary-state surface beyond built-in window
aggregations).

The operator: per-user running profile — cumulative event count, value
sum, and last-seen timestamp — updated batch-by-batch with explicit
GroupState, emitting the refreshed profile for every user touched in a
micro-batch (update mode). This is the skeleton every custom streaming
accumulator (feature stores, per-key rate limiters, online CDC merge)
drops into; the state payload is the part you'd swap out.

Scale: state lives in the state store partitioned by user_id — the
stream shuffles each micro-batch once by key, state size is O(distinct
users), and the Python hop is Arrow-batched per group-partition, not
per row.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from benchviz_spark.streaming.windows import read_events_stream

PROFILE_SCHEMA = "user_id bigint, n_events bigint, total_value double, last_seen_s bigint"
STATE_SCHEMA = "n bigint, total double, last_s bigint"


def _update_profile(
    key: Tuple[Any, ...], pdfs: Iterator, state: GroupState
) -> Iterator:
    import pandas as pd

    n, total, last_s = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        last_s = max(last_s, int(pdf["ts"].max().timestamp()))
    state.update((n, total, last_s))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 4)],
            "last_seen_s": [last_s],
        }
    )


def stream_user_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-user profile accumulator. No timeout: profiles are
    permanent state (a TTL would use EventTimeTimeout + watermark)."""
    events = read_events_stream(spark, sf_dir)
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            outputStructType=PROFILE_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def batch_user_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin for parity testing."""
    from pyspark.sql import functions as F

    from benchviz_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
        F.unix_timestamp(F.max("ts")).alias("last_seen_s"),
    )
