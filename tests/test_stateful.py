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


def test_stateful_profiles_resume_from_checkpoint(spark, tmp_path):
    """The GroupState store must survive a stream restart: drain half
    the input, start a NEW query over the same checkpoint after more
    files land, and the final per-user counts must equal the batch
    totals. Equality catches BOTH failure modes — lost state would
    undercount (drain 2 starting from zero), and re-ingesting already-
    processed files would overcount."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from benchviz_spark.sources.tables import load_table
    from benchviz_spark.streaming.stateful import (
        PROFILE_SCHEMA,
        STATE_SCHEMA,
        _update_profile,
    )

    events = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    h1 = events.filter(F.col("event_id") % 2 == 0).drop("event_id")
    h2 = events.filter(F.col("event_id") % 2 == 1).drop("event_id")
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    h1.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    def drain(out_dir: str) -> None:
        # foreachBatch parquet collector: the memory sink refuses
        # checkpoint RECOVERY (not fault-tolerant), and file sinks
        # refuse update mode — foreachBatch supports both.
        stream = (
            spark.readStream.schema(schema)
            .parquet(src)
            .groupBy("user_id")
            .applyInPandasWithState(
                _update_profile,
                outputStructType=PROFILE_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )

        def sink(df, _epoch):
            df.write.mode("append").parquet(out_dir)

        q = (
            stream.writeStream.foreachBatch(sink)
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()

    out1, out2 = str(tmp_path / "out1"), str(tmp_path / "out2")
    drain(out1)
    got1 = {r.user_id: r.n_events for r in spark.read.parquet(out1).collect()}
    exp1 = {
        r.user_id: r.n
        for r in h1.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got1 == exp1

    h2.write.mode("append").parquet(src)
    drain(out2)
    # final state per user = the highest-count emission across drains
    final: dict = {}
    for r in (
        spark.read.parquet(out1).collect() + spark.read.parquet(out2).collect()
    ):
        if r.user_id not in final or r.n_events > final[r.user_id][0]:
            final[r.user_id] = (r.n_events, r.total_value, r.last_seen_s)
    expect = {
        r.user_id: (r.n, r.tv, r.ls)
        for r in events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("tv"),
            F.unix_timestamp(F.max("ts")).alias("ls"),
        )
        .collect()
    }
    assert set(final) == set(expect)
    for uid, (n, tv, ls) in expect.items():
        gn, gtv, gls = final[uid]
        assert gn == n, (uid, gn, n)
        assert abs(gtv - tv) < 1e-6, (uid, gtv, tv)
        assert gls == ls, (uid, gls, ls)


def test_stateful_lww_resume_from_checkpoint(spark, tmp_path):
    """Checkpoint recovery for the LWW/CDC compactor: after a restart
    over the same checkpoint with new files, each user's winner must be
    the (ts, event_id)-max over the FULL input and counts must total —
    catching lost winner state and re-ingestion alike."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from benchviz_spark.sources.tables import load_table
    from benchviz_spark.streaming.stateful import (
        LWW_SCHEMA,
        LWW_STATE_SCHEMA,
        _update_lww,
    )

    events = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "ts", "props"
    )
    h1 = events.filter(F.col("event_id") % 2 == 0)
    h2 = events.filter(F.col("event_id") % 2 == 1)
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    h1.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    def drain(out_dir: str) -> None:
        stream = (
            spark.readStream.schema(schema)
            .parquet(src)
            .groupBy("user_id")
            .applyInPandasWithState(
                _update_lww,
                outputStructType=LWW_SCHEMA,
                stateStructType=LWW_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )

        def sink(df, _epoch):
            df.write.mode("append").parquet(out_dir)

        q = (
            stream.writeStream.foreachBatch(sink)
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()

    out1, out2 = str(tmp_path / "out1"), str(tmp_path / "out2")
    drain(out1)
    h2.write.mode("append").parquet(src)
    drain(out2)

    final: dict = {}
    for r in (
        spark.read.parquet(out1).collect() + spark.read.parquet(out2).collect()
    ):
        if r.user_id not in final or r.n_events > final[r.user_id][0]:
            final[r.user_id] = (r.n_events, r.last_ts_s, r.last_props)
    expect = {
        r.user_id: (r.n, r.ls, r.lp)
        for r in events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.unix_timestamp(F.max("ts")).alias("ls"),
            F.max_by("props", F.struct("ts", "event_id")).alias("lp"),
        )
        .collect()
    }
    assert final == expect
