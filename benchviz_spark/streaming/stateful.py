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


# ---------------------------------------------------------------------------
# Streaming CDC compaction: last-write-wins user state with explicit
# GroupState (the streaming twin of operators/events.py
# events_latest_user_state).
# ---------------------------------------------------------------------------
LWW_SCHEMA = "user_id bigint, n_events bigint, last_ts_s bigint, last_props string"
LWW_STATE_SCHEMA = "n bigint, last_ts_us bigint, last_event_id bigint, last_props string"


def _update_lww(key, pdfs, state: GroupState):
    """Fold each micro-batch into (count, winner) state. The winner is
    ordered by (ts, event_id) — the same total order the batch twin's
    max_by uses — so arrival order across micro-batches is irrelevant:
    LWW state converges to the batch answer under any file split."""
    import pandas as pd

    n, last_us, last_id, last_props = (
        state.get if state.exists else (0, -1, -1, None)
    )
    for pdf in pdfs:
        n += len(pdf)
        # normalize to ns first: Arrow may hand datetime64[ns] or [us]
        # depending on pandas/pyarrow versions; int64-of-ns // 1000 is
        # unambiguous microseconds
        us = (pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000).astype(
            "int64"
        )
        for ts_us, eid, props in zip(us, pdf["event_id"], pdf["props"]):
            if (ts_us, eid) > (last_us, last_id):
                last_us, last_id, last_props = int(ts_us), int(eid), props
    state.update((n, last_us, last_id, last_props))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "last_ts_s": [last_us // 1_000_000],
            "last_props": [last_props],
        }
    )


def stream_latest_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming LWW compaction per user. State is one winner row per
    user (O(distinct users), like every CDC merge); each micro-batch
    shuffles once by user_id and the Python hop is Arrow-batched per
    group. The per-row Python loop inside the group fold is over a
    MICRO-BATCH slice of one user's events — bounded by trigger size,
    not history (history lives compacted in state)."""
    events = read_events_stream(spark, sf_dir)
    return (
        events.select("user_id", "ts", "event_id", "props")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_lww,
            outputStructType=LWW_SCHEMA,
            stateStructType=LWW_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
