"""Time-series window operators over the ``events`` table.

The reference's workload is time-series shaped (per-test series ordered
by date, SURVEY §2.5) but computes no windows itself; these operators
are the engine's general time-window surface, expressed as batch
queries so the DuckDB oracle can check them value-for-value. The
streaming module (benchviz_spark/streaming) runs the same window
specs under readStream + watermark — batch/stream parity is tested in
tests/test_streaming.py.

Determinism notes: window starts are emitted as epoch SECONDS (bigint)
— hour/half-hour aligned values are precision-exact in both engines.
Session semantics: a gap >= 30 min starts a new session (Spark's
session_window end bound is exclusive; the oracle's gaps-and-islands
uses >= to match).

Scale: each query is one shuffle (the groupBy on window key); sliding
windows fan each row into exactly window/slide groups scan-side, and
session windows are Spark-native state merging — the oracle's
gaps-and-islands formulation is the relational proof, not the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from benchviz_spark.registry import query
from benchviz_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Tumbling window.
# ---------------------------------------------------------------------------
@query(
    "events_tumbling_hourly",
    oracle="""
    SELECT CAST(floor(epoch(time_bucket(INTERVAL 1 HOUR, ts))) AS BIGINT) AS window_start_s,
           event_type,
           count(*) AS n_events,
           round(sum(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows per event type. `window()` keys the
    shuffle by (hour, type); the identical spec runs unchanged under a
    watermark in the streaming module."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Sliding window (1 h window, 30 min slide -> each event in 2 windows).
# ---------------------------------------------------------------------------
@query(
    "events_sliding_hourly_halfhour",
    oracle="""
    WITH fanned AS (
      SELECT unnest([
               time_bucket(INTERVAL 30 MINUTE, ts),
               time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE
             ]) AS window_start,
             value
      FROM events
    )
    SELECT CAST(floor(epoch(window_start)) AS BIGINT) AS window_start_s,
           count(*) AS n_events,
           round(avg(value), 6) AS avg_value
    FROM fanned GROUP BY 1
    """,
)
def events_sliding_hourly_halfhour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes. Spark's window() does
    the 2x fan-out scan-side; the oracle spells the fan-out with
    unnest — same math, different notation."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "n_events",
            "avg_value",
        )
    )


# ---------------------------------------------------------------------------
# Session window (30-minute inactivity gap per user).
# ---------------------------------------------------------------------------
@query(
    "events_session_stats",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_id
      FROM ordered
    )
    SELECT user_id,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start_s,
           count(*) AS n_events,
           round(sum(value), 4) AS total_value
    FROM sessions GROUP BY user_id, session_id
    """,
)
def events_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions with a 30-minute inactivity gap. Spark's
    session_window merges state natively (and streams under a
    watermark); the oracle proves the same sessionization with
    gaps-and-islands window SQL."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start_s"),
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Interval join: purchase x views of the same user within the prior
# hour (the batch twin of the stream-stream join in streaming/windows).
# ---------------------------------------------------------------------------
@query(
    "events_purchase_view_pairs",
    oracle="""
    SELECT p.event_id AS purchase_id,
           v.event_id AS view_id,
           p.user_id,
           CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_ts_s,
           CAST(floor(epoch(v.ts)) AS BIGINT) AS view_ts_s
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id
     AND v.ts <= p.ts
     AND v.ts >= p.ts - INTERVAL 1 HOUR
    """,
)
def events_purchase_view_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded interval join (every view within the hour before a
    purchase, not just the latest — that one is the as-of join). The
    equi-key (user_id) carries the shuffle; the time-range is a
    residual predicate, so this is a hash join + filter, not a
    nested-loop range join."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    views = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("v_ts"),
    )
    return (
        purchases.join(
            views,
            (F.col("user_id") == F.col("v_user_id"))
            & (F.col("v_ts") <= F.col("p_ts"))
            & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            "purchase_id",
            "view_id",
            "user_id",
            F.unix_timestamp("p_ts").alias("purchase_ts_s"),
            F.unix_timestamp("v_ts").alias("view_ts_s"),
        )
    )


# ---------------------------------------------------------------------------
# Hypertable-style multi-resolution rollup: one pass materializes the
# finest grain; coarser grains fold the finer one, never the raw table.
# ---------------------------------------------------------------------------
@query(
    "events_multires_rollup",
    oracle="""
    WITH hourly AS (
      SELECT time_bucket(INTERVAL 1 HOUR, ts) AS bucket, event_type,
             count(*) AS n, sum(value) AS v
      FROM events GROUP BY 1, 2
    ),
    daily AS (
      SELECT time_bucket(INTERVAL 1 DAY, bucket) AS bucket, event_type,
             sum(n) AS n, sum(v) AS v
      FROM hourly GROUP BY 1, 2
    )
    SELECT resolution, bucket_s, event_type, n_events, total_value FROM (
      SELECT '1h' AS resolution, CAST(floor(epoch(bucket)) AS BIGINT) AS bucket_s,
             event_type, CAST(n AS BIGINT) AS n_events, round(v, 4) AS total_value
      FROM hourly
      UNION ALL
      SELECT '1d', CAST(floor(epoch(bucket)) AS BIGINT), event_type,
             CAST(n AS BIGINT), round(v, 4)
      FROM daily
    )
    """,
)
def events_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable/continuous-aggregate pattern: the 1-hour rollup is
    computed from raw events ONCE; the 1-day tier aggregates the hourly
    tier (24x fewer rows), not the raw table. At 100 TB the hourly tier
    is the only full-scan; every coarser resolution (and any dashboard
    query) reads rollups. The oracle mirrors the same two-tier fold, so
    associativity of the fold is value-checked."""
    events = load_table(spark, sf_dir, "events")
    hourly = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .select(
            F.col("w.start").alias("bucket"), "event_type", "n", "v"
        )
    )
    daily = (
        hourly.groupBy(
            F.date_trunc("day", F.col("bucket")).alias("bucket"), "event_type"
        )
        .agg(F.sum("n").alias("n"), F.sum("v").alias("v"))
    )
    def tier(df: DataFrame, label: str) -> DataFrame:
        return df.select(
            F.lit(label).alias("resolution"),
            F.unix_timestamp("bucket").alias("bucket_s"),
            "event_type",
            F.col("n").cast("long").alias("n_events"),
            F.round("v", 4).alias("total_value"),
        )

    return tier(hourly, "1h").unionByName(tier(daily, "1d"))


# ---------------------------------------------------------------------------
# Day-over-day regression detection (the reference's natural extension:
# SURVEY §2.5 — lag/delta over an ordered series).
# ---------------------------------------------------------------------------
@query(
    "events_daily_delta",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             event_type,
             count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT day, event_type, n,
           CAST(n - lag(n) OVER (PARTITION BY event_type ORDER BY day) AS BIGINT)
             AS delta_vs_prev_day
    FROM daily
    """,
)
def events_daily_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    events = load_table(spark, sf_dir, "events")
    daily = (
        events.groupBy(
            F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("event_type").orderBy("day")
    return daily.select(
        "day",
        "event_type",
        "n",
        (F.col("n") - F.lag("n").over(w)).cast("long").alias("delta_vs_prev_day"),
    )


# ---------------------------------------------------------------------------
# Funnel analysis: staged conversion with ordering constraints.
# ---------------------------------------------------------------------------
@query(
    "events_funnel_view_click_purchase",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS v_ts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS c_ts
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.v_ts
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS p_ts
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.c_ts
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT count(v.user_id) AS viewed,
           count(c.user_id) AS then_clicked,
           count(p.user_id) AS then_purchased
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def events_funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users whose first view precedes a click precedes
    a purchase. Each stage is one aggregation of the (already filtered)
    events scan joined to the previous stage's 1-row-per-user frame;
    every join and aggregation keys on user_id, so each aggregation's
    shuffle doubles as its join alignment — every hash Exchange in the
    plan keys on user_id and none re-partitions on another key
    (asserted in tests/test_plans.py), and identical stage subtrees
    dedupe via ReusedExchange at runtime. No window over the full event
    stream, no per-user event-list collect."""
    events = load_table(spark, sf_dir, "events")

    def first_after(event_type: str, prev: DataFrame | None, prev_ts: str, out_ts: str) -> DataFrame:
        staged = events.filter(F.col("event_type") == event_type)
        if prev is not None:
            staged = staged.join(prev, "user_id").filter(F.col("ts") > F.col(prev_ts))
        return staged.groupBy("user_id").agg(F.min("ts").alias(out_ts))

    v = first_after("view", None, "", "v_ts")
    c = first_after("click", v, "v_ts", "c_ts")
    p = first_after("purchase", c, "c_ts", "p_ts")
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .agg(
            F.count("v_ts").alias("viewed"),
            F.count("c_ts").alias("then_clicked"),
            F.count("p_ts").alias("then_purchased"),
        )
    )


# ---------------------------------------------------------------------------
# Retention cohorts: first-seen day x activity offsets.
# ---------------------------------------------------------------------------
@query(
    "events_retention_cohorts",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, min(CAST(date_trunc('day', ts) AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS active_day
      FROM events
    )
    SELECT cohort_day,
           count(DISTINCT f.user_id) AS cohort_size,
           count(DISTINCT CASE WHEN a.active_day = f.cohort_day + 1
                               THEN f.user_id END) AS retained_d1,
           count(DISTINCT CASE WHEN a.active_day = f.cohort_day + 7
                               THEN f.user_id END) AS retained_d7
    FROM first_seen f JOIN activity a ON f.user_id = a.user_id
    GROUP BY cohort_day
    ORDER BY cohort_day
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort retention: users grouped by first-active day;
    how many returned exactly 1 and 7 days later. The user->cohort map
    and the distinct (user, day) activity set are both 1-row-per-key
    aggregates keyed on user_id — the join between them is
    co-partitioned, and the final rollup shuffles cohort-day rows, not
    events. At 100 TB both intermediates are bounded by |users|, not
    |events|."""
    events = load_table(spark, sf_dir, "events")
    day = F.to_date(F.date_trunc("day", F.col("ts")))
    first_seen = events.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    activity = events.select("user_id", day.alias("active_day")).distinct()
    return (
        first_seen.join(activity, "user_id")
        .groupBy("cohort_day")
        .agg(
            F.countDistinct("user_id").alias("cohort_size"),
            F.countDistinct(
                F.when(
                    F.col("active_day") == F.date_add("cohort_day", 1), F.col("user_id")
                )
            ).alias("retained_d1"),
            F.countDistinct(
                F.when(
                    F.col("active_day") == F.date_add("cohort_day", 7), F.col("user_id")
                )
            ).alias("retained_d7"),
        )
        .orderBy("cohort_day")
    )


# ---------------------------------------------------------------------------
# Rolling z-score anomaly detection over the daily series.
# ---------------------------------------------------------------------------
@query(
    "events_value_anomalies",
    oracle="""
    SELECT day, event_type, daily_total, z
    FROM (
      SELECT day, event_type, daily_total,
             round((daily_total - avg(daily_total) OVER w)
                   / stddev_samp(daily_total) OVER w, 3) AS z
      FROM (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               event_type,
               round(sum(value), 2) AS daily_total
        FROM events GROUP BY 1, 2
      )
      WINDOW w AS (
        PARTITION BY event_type ORDER BY day
        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
      )
    )
    WHERE abs(z) > 1.5
    ORDER BY day, event_type
    """,
)
def events_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days whose per-type total deviates > 1.5 rolling-week sigmas —
    the statistical twin of pipeline.bench_regressions' threshold rule.
    One shuffle keyed event_type for both the daily rollup and the
    7-row frame; the anomaly filter runs on the z-score AFTER rounding
    to 3 places on both engines, so float noise in the windowed
    mean/stddev cannot flip boundary rows between them."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"), "event_type"
    ).agg(F.round(F.sum("value"), 2).alias("daily_total"))
    w = W.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    z = F.round(
        (F.col("daily_total") - F.avg("daily_total").over(w))
        / F.stddev_samp("daily_total").over(w),
        3,
    )
    return (
        daily.withColumn("z", z)
        .filter(F.abs(F.col("z")) > 1.5)
        .orderBy("day", "event_type")
    )


# ---------------------------------------------------------------------------
# Gap filling: densify an hourly series and forward-fill values.
# ---------------------------------------------------------------------------
@query(
    "events_gap_filled_hourly",
    oracle="""
    WITH hourly AS (
      SELECT CAST(floor(epoch(time_bucket(INTERVAL 1 HOUR, ts))) AS BIGINT) AS h,
             event_type, count(*) AS n, round(avg(value), 6) AS av
      FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT event_type, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1),
    spine AS (
      SELECT event_type, unnest(generate_series(h0, h1, 3600)) AS h FROM bounds
    ),
    joined AS (
      SELECT s.event_type, s.h, hourly.n, hourly.av
      FROM spine s LEFT JOIN hourly ON s.event_type = hourly.event_type
                                   AND s.h = hourly.h
    )
    SELECT event_type, h AS hour_ts,
           CAST(coalesce(n, 0) AS BIGINT) AS n_events,
           last_value(av IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_value_ffill
    FROM joined
    """,
)
def events_gap_filled_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densified per-type hourly series: hours with no events appear
    with n_events=0 and the average value carried forward from the last
    observed hour (the resample + ffill of a time-series engine, and
    the gap handling the reference's per-test chart series leaves to
    the browser; generate_benchmark_plot.js:129-180 plots sparse dates
    as-is).

    Scale design: the spine is GENERATED, never stored — per-type
    min/max epoch hours (one map-side-combined agg) explode through
    ``sequence()`` into (type, hour) rows, so the dense grid exists
    only inside the join stage. The spine is types x hours — orders of
    magnitude smaller than the event stream — and carries no broadcast
    hint: AQE broadcasts it while small and shuffle-joins if a decade
    of hours x a wide type dimension ever outgrows the threshold. The
    forward fill is one window over the dense series, partitioned by
    type — state is one row, never the event stream."""
    from pyspark.sql.window import Window as W

    events = load_table(spark, sf_dir, "events")
    hourly = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("av"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("h"), "event_type", "n", "av"
        )
    )
    bounds = hourly.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("h0", "h1", F.lit(3600).cast("long"))).alias("h"),
    )
    joined = spine.join(hourly, ["event_type", "h"], "left")
    w = (
        W.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        "event_type",
        F.col("h").alias("hour_ts"),
        F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        F.last("av", ignorenulls=True).over(w).alias("avg_value_ffill"),
    )


# ---------------------------------------------------------------------------
# Dimension enrichment: events joined to the customer dimension.
# (Batch twin of streaming.windows.stream_enriched_user_events.)
# ---------------------------------------------------------------------------
@query(
    "events_enriched_user_segment",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           e.event_type,
           count(*) AS n_events,
           round(sum(e.value), 4) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def events_enriched_user_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event stream enriched with the customer dimension and rolled up
    per (market segment, event type) — the canonical fact-to-dimension
    enrichment. The dimension join is unhinted: customer grows with SF
    (the round-1 lesson), so AQE broadcasts it while small and falls
    back to a key-partitioned join at scale; the rollup is one
    map-side-combined aggregation whose key space (segments x types) is
    tiny."""
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    return (
        events.join(customer, events.user_id == customer.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Sequence mining: first-order event-type transition matrix.
# ---------------------------------------------------------------------------
@query(
    "events_type_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events
    ),
    t AS (
      SELECT prev_type, event_type, count(*) AS n_transitions
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT prev_type, event_type, n_transitions,
           round(n_transitions::DOUBLE /
                 sum(n_transitions) OVER (PARTITION BY prev_type), 6) AS prob
    FROM t
    """,
)
def events_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    sequence: for every (previous type -> type) pair, the transition
    count and conditional probability. The sequence-mining primitive
    behind session-flow and funnel-drop analysis.

    Scale: the lag window shuffles once on user_id and sorts only
    within each user's slice (per-user history is bounded, corpus-sized
    fan-out is across users — exactly how Spark parallelizes window
    partitions). The transition aggregate then map-side-combines to at
    most |types|^2 rows, and the probability normalization windows over
    that tiny matrix, not the events. One corpus shuffle total."""
    events = load_table(spark, sf_dir, "events")
    seq = events.select(
        "event_type",
        F.lag("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    t = seq.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    total = F.sum("n_transitions").over(W.partitionBy("prev_type"))
    return t.select(
        "prev_type",
        "event_type",
        "n_transitions",
        F.round(F.col("n_transitions").cast("double") / total, 6).alias("prob"),
    )


# ---------------------------------------------------------------------------
# CDC-style last-write-wins state: latest props per user.
# ---------------------------------------------------------------------------
@query(
    "events_latest_user_state",
    oracle="""
    SELECT user_id, n_events, last_ts_s, last_props FROM (
      SELECT user_id, props AS last_props,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n_events,
             CAST(floor(epoch(max(ts) OVER (PARTITION BY user_id))) AS BIGINT)
               AS last_ts_s
      FROM events
    ) WHERE rn = 1
    """,
)
def events_latest_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-write-wins materialized state per user — the CDC/upsert
    compaction every table-maintenance job runs (same semantics as the
    ingest tier's per-file LWW, bench_logs.py:154-168, lifted to the
    user-event stream). (ts, event_id) is a total order, so the winner
    is unique.

    Scale: ``max_by`` keyed on a (ts, event_id) struct is a plain
    aggregate — partial winners combine map-side, so the shuffle moves
    ONE candidate row per (user, partition), never a user's history,
    and no sort happens anywhere (the oracle's row_number window is the
    relational spec, not the plan). This is the aggregate-vs-window
    distinction that matters at 100 TB: compacting 1e9 users'
    histories costs one narrow shuffle of winners."""
    events = load_table(spark, sf_dir, "events")
    order_key = F.struct(F.col("ts"), F.col("event_id"))
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.unix_timestamp(F.max("ts")).alias("last_ts_s"),
        F.max_by("props", order_key).alias("last_props"),
    )


# ---------------------------------------------------------------------------
# Time-range window frame: 7-day rolling median / mean of daily totals.
# ---------------------------------------------------------------------------
@query(
    "events_rolling_median_daily",
    oracle="""
    WITH daily AS (
      SELECT CAST(floor(epoch(time_bucket(INTERVAL 1 DAY, ts))) AS BIGINT) AS day_s,
             event_type,
             round(sum(value), 4) AS daily_total
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, day_s, daily_total,
           round(median(daily_total) OVER w, 6) AS rolling_median_7d,
           round(avg(daily_total) OVER w, 6)    AS rolling_avg_7d,
           CAST(count(*) OVER w AS BIGINT)      AS n_days_in_window
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day_s
                 RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW)
    """,
)
def events_rolling_median_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling median and mean of each event type's daily value
    total — a TIME-RANGE window frame (RANGE BETWEEN 6 days PRECEDING,
    in epoch seconds), not a row-count frame: days missing from the
    series correctly shrink the window rather than silently widening
    it. Median-in-a-moving-window is the robust trendline variant of
    events_daily_delta's lag arithmetic.

    Determinism: daily totals are rounded BEFORE the median so both
    engines interpolate identical doubles. Scale: the frame operates on
    the DAILY aggregate (365 rows/type/year regardless of corpus
    size), so the corpus cost is the one tumbling-window shuffle;
    the range-frame sort is over the tiny rollup."""
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.round(F.sum("value"), 4).alias("daily_total"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("day_s"),
            "event_type",
            "daily_total",
        )
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("day_s")
        .rangeBetween(-6 * 86400, W.currentRow)
    )
    return daily.select(
        "event_type",
        "day_s",
        "daily_total",
        F.round(F.percentile("daily_total", F.lit(0.5)).over(w), 6).alias(
            "rolling_median_7d"
        ),
        F.round(F.avg("daily_total").over(w), 6).alias("rolling_avg_7d"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_days_in_window"),
    )


# ---------------------------------------------------------------------------
# Inter-arrival time statistics: the burstiness/health profile of each
# user's event stream.
# ---------------------------------------------------------------------------
@query(
    "events_interarrival_stats",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             (epoch_us(ts) - lag(epoch_us(ts)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
             )) // 1000000 AS gap_s
      FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT)      AS n_gaps,
           CAST(min(gap_s) AS BIGINT)    AS min_gap_s,
           CAST(max(gap_s) AS BIGINT)    AS max_gap_s,
           round(sum(gap_s)::DOUBLE / count(*), 6) AS avg_gap_s,
           CAST(floor((sum(gap_s * gap_s) - sum(gap_s)::DOUBLE * sum(gap_s) / count(*))
                 / (count(*) - 1)) AS BIGINT) AS var_gap_s
    FROM gaps WHERE gap_s IS NOT NULL
    GROUP BY 1 HAVING count(*) > 1
    """,
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap distribution (count / min / max / mean
    / variance of whole-second gaps): the burstiness profile used for
    bot detection and session-timeout calibration.

    Scale: one shuffle on user_id for the lag window (per-user history
    is bounded; parallelism is across users), then a map-side-combined
    aggregate. Numeric determinism note: gaps are floored to integer
    seconds and the variance is assembled from exact power sums
    ((sum x^2) - (sum x)^2/n)/(n-1) — both engines keep the sum of
    squares exact (Spark decimal(38,0), DuckDB HUGEINT; int64 would
    wrap at scale) until a final two-operand double division — and the
    variance is floored to an integer: at ~1e9 magnitudes, fractional
    decimals sit below double precision, where the two engines'
    rounding implementations legitimately disagree."""
    events = load_table(spark, sf_dir, "events")
    gap_us = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(
        W.partitionBy("user_id").orderBy("ts", "event_id")
    )
    # gaps are non-negative (ordered by ts), so floor == integer div;
    # the division operates on exact int64 values < 2^53
    gaps = events.select(
        "user_id", F.floor(gap_us / 1000000).cast("long").alias("gap_s")
    ).filter(F.col("gap_s").isNotNull())
    n = F.count(F.lit(1))
    sx = F.sum("gap_s")
    # Sum of squares in decimal, not int64: a user with ~1e7-second gaps
    # squares to 1e14 per row, and a few hundred thousand events would
    # silently wrap int64. DuckDB's sum promotes to HUGEINT (exact
    # 128-bit); decimal(38,0) is Spark's exact equivalent, so both
    # engines stay exact until the single final double division.
    sxx = F.sum(
        F.col("gap_s").cast("decimal(19,0)") * F.col("gap_s").cast("decimal(19,0)")
    )
    return (
        gaps.groupBy("user_id")
        .agg(
            n.cast("long").alias("n_gaps"),
            F.min("gap_s").cast("long").alias("min_gap_s"),
            F.max("gap_s").cast("long").alias("max_gap_s"),
            F.round(sx.cast("double") / n, 6).alias("avg_gap_s"),
            F.floor((sxx.cast("double") - sx.cast("double") * sx / n) / (n - F.lit(1)))
            .cast("long")
            .alias("var_gap_s"),
        )
        .filter(F.col("n_gaps") > 1)
    )


# ---------------------------------------------------------------------------
# SCD Type-2 temporal dimension: versioned user tier + per-interval facts.
# ---------------------------------------------------------------------------
SCD_OPEN_END_S = 253402300800  # 9999-12-31T00:00Z: open-interval sentinel


@query(
    "events_scd2_tier_intervals",
    oracle=f"""
    WITH s AS (
      SELECT user_id, ts, event_id,
             CAST(json_extract(props, '$.k') AS INT) AS tier
      FROM events WHERE event_type = 'signup'
    ),
    v AS (
      SELECT user_id, tier,
             ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to
      FROM s
    ),
    p AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT v.user_id,
           v.tier,
           CAST(floor(epoch(v.valid_from)) AS BIGINT) AS valid_from_s,
           CAST(coalesce(floor(epoch(v.valid_to)), {SCD_OPEN_END_S}) AS BIGINT)
             AS valid_to_s,
           CAST(count(p.ts) AS BIGINT) AS n_purchases,
           round(coalesce(sum(p.value), 0), 4) AS purchase_value
    FROM v LEFT JOIN p
      ON p.user_id = v.user_id
     AND p.ts >= v.valid_from
     AND (v.valid_to IS NULL OR p.ts < v.valid_to)
    GROUP BY 1, 2, 3, 4
    """,
)
def events_scd2_tier_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (Type 2) built from the event stream:
    each signup event VERSIONS the user's tier (props.k), opening a
    validity interval that the next signup closes; purchases then roll
    up into the interval that was in force when they happened. This is
    the warehouse temporal-join pattern — fact rows matched to the
    dimension version valid at fact time, never to the current one.

    Interval semantics (explicit, matching the oracle): intervals are
    [valid_from, valid_to) — a purchase at exactly the next version's
    timestamp belongs to the NEW version; the latest version is open
    (valid_to = the year-9999 sentinel); zero-width intervals from
    same-timestamp re-signups survive with zero facts. Versions that
    project to the same (user_id, tier, valid_from_s, valid_to_s) row
    (possible when re-signups land in the same second) merge, summing
    their facts — both sides group by the projected columns.

    Scale: fact->version assignment is NOT the range join the oracle
    spells (|purchases| x versions-per-user pair blowup); it is the
    as-of union + window carry-forward (asof.py mechanics): one shuffle
    on user_id, each purchase picks up the latest preceding version's
    identity in a single ordered pass — signups sort before purchases
    at equal ts (side 0 < 1), encoding the [closed, open) boundary.
    The carried key is the signup's event_id (exact version identity),
    NOT the second-truncated valid_from_s: two same-second signups share
    valid_from_s, and joining facts back on it would double-count every
    purchase into both versions. valid_from_s is derived only for the
    output projection. The per-interval rollup partial-aggregates
    map-side, and the dimension (versions) re-enters only as the left
    side of a versions-sized join to keep purchase-free intervals."""
    events = load_table(spark, sf_dir, "events")
    signups = events.filter(F.col("event_type") == "signup").select(
        "user_id",
        "ts",
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("tier"),
    )
    vw = W.partitionBy("user_id").orderBy("ts", "event_id")
    versions = signups.select(
        "user_id",
        "tier",
        "ts",
        "event_id",
        F.unix_timestamp("ts").alias("valid_from_s"),
        F.coalesce(
            F.unix_timestamp(F.lead("ts").over(vw)), F.lit(SCD_OPEN_END_S)
        ).alias("valid_to_s"),
    )
    v_tagged = versions.select(
        "user_id", "ts", F.lit(0).alias("side"), "event_id",
        F.col("event_id").alias("ver_id"),
        F.lit(None).cast("double").alias("value"),
    )
    p_tagged = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("side"), "event_id",
        F.lit(None).cast("long").alias("ver_id"),
        "value",
    )
    cw = (
        W.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    assigned = (
        v_tagged.unionByName(p_tagged)
        .withColumn("ver", F.last("ver_id", ignorenulls=True).over(cw))
        .filter((F.col("side") == 1) & F.col("ver").isNotNull())
    )
    facts = assigned.groupBy("user_id", F.col("ver").alias("event_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases"),
        F.sum("value").alias("value_sum"),
    )
    return (
        versions.join(facts, ["user_id", "event_id"], "left")
        .groupBy("user_id", "tier", "valid_from_s", "valid_to_s")
        .agg(
            F.sum(F.coalesce("n_purchases", F.lit(0)))
            .cast("long")
            .alias("n_purchases"),
            F.round(
                F.sum(F.coalesce("value_sum", F.lit(0.0))), 4
            ).alias("purchase_value"),
        )
    )


# ---------------------------------------------------------------------------
# Multi-touch (linear) attribution over the purchase<-views 1h window.
# ---------------------------------------------------------------------------
@query(
    "events_linear_attribution",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    ),
    views AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
    ),
    touched AS (
      SELECT p.event_id, p.user_id, p.value,
             count(v.event_id) AS n_touches
      FROM purchases p JOIN views v
        ON v.user_id = p.user_id
       AND v.ts <= p.ts
       AND v.ts >= p.ts - INTERVAL 1 HOUR
      GROUP BY 1, 2, 3
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT)                    AS n_attributed,
           CAST(sum(n_touches) AS BIGINT)              AS n_touches,
           round(sum(value), 4)                        AS attributed_value,
           round(sum(value / n_touches), 4)            AS per_touch_credit
    FROM touched GROUP BY 1
    """,
)
def events_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase's value is split
    equally across the user's views in the preceding hour, rolled up
    per user — the credit-assignment shape marketing pipelines run
    (vs. the single-touch as-of join, which is last-touch attribution).
    ``per_touch_credit`` sums value/n_touches, i.e. the credit one
    touch of that user would receive under equal splitting.

    Scale: the touch join is the same time-bounded interval join as
    events_purchase_view_pairs — per-user, one-hour-bounded fan-out,
    never |purchases| x |all views| — followed by two map-side-combined
    hash aggregations (per-purchase touch counts, then the per-user
    rollup). Purchases with no view in the window drop out (they carry
    no attributable credit), matching the oracle's inner join."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        "value",
    )
    views = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("v_ts"),
    )
    touched = (
        purchases.join(
            views,
            (F.col("user_id") == F.col("v_user_id"))
            & (F.col("v_ts") <= F.col("p_ts"))
            & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        )
        .groupBy("purchase_id", "user_id", "value")
        .agg(F.count(F.lit(1)).alias("n_touches"))
    )
    return touched.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_attributed"),
        F.sum("n_touches").cast("long").alias("n_touches"),
        F.round(F.sum("value"), 4).alias("attributed_value"),
        F.round(F.sum(F.col("value") / F.col("n_touches")), 4).alias(
            "per_touch_credit"
        ),
    )


# ---------------------------------------------------------------------------
# Linear interpolation over the dense hourly grid (the lerp sibling of
# the gap-fill's ffill).
# ---------------------------------------------------------------------------
@query(
    "events_interpolated_hourly",
    oracle="""
    WITH hourly AS (
      SELECT CAST(floor(epoch(time_bucket(INTERVAL 1 HOUR, ts))) AS BIGINT) AS h,
             event_type, count(*) AS n, round(avg(value), 6) AS av
      FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT event_type, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1),
    spine AS (
      SELECT event_type, unnest(generate_series(h0, h1, 3600)) AS h FROM bounds
    ),
    joined AS (
      SELECT s.event_type, s.h, hourly.n, hourly.av
      FROM spine s LEFT JOIN hourly ON s.event_type = hourly.event_type
                                   AND s.h = hourly.h
    ),
    bracketed AS (
      SELECT event_type, h, n, av,
             last_value(av IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_av,
             last_value(CASE WHEN av IS NOT NULL THEN h END IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_h,
             first_value(av IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY h
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_av,
             first_value(CASE WHEN av IS NOT NULL THEN h END IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY h
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_h
      FROM joined
    )
    SELECT event_type, h AS hour_ts,
           CAST(coalesce(n, 0) AS BIGINT) AS n_events,
           round(CASE
             WHEN av IS NOT NULL THEN av
             ELSE prev_av + (next_av - prev_av)
                  * (h - prev_h)::DOUBLE / (next_h - prev_h)
           END, 6) AS avg_value_lerp
    FROM bracketed
    """,
)
def events_interpolated_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The linear-interpolation sibling of ``events_gap_filled_hourly``:
    gap hours get the value lerped between the bracketing observed
    hours instead of the last value carried forward — the resample +
    interpolate of a time-series engine, the right fill when the metric
    is a level (a rate, a gauge) rather than a state. Observed hours
    keep their exact hourly average; the per-type grid is bounded by
    observed hours on both ends, so every gap has both brackets.

    Scale design: identical to the gap-fill — generated spine, one
    left join, windows partitioned by type — plus one backward-looking
    window pair (prev value/hour) and one forward-looking pair
    (next value/hour); all four ride the SAME per-type sort order, so
    Catalyst evaluates them in two Window nodes over one exchange. The
    lerp ratio is integer-hour arithmetic over 6-place-rounded inputs,
    deterministic cross-engine."""
    events = load_table(spark, sf_dir, "events")
    hourly = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("av"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("h"),
            "event_type",
            "n",
            "av",
        )
    )
    bounds = hourly.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("h0", "h1", F.lit(3600).cast("long"))).alias("h"),
    )
    joined = spine.join(hourly, ["event_type", "h"], "left")
    back = (
        W.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fwd = (
        W.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    known_h = F.when(F.col("av").isNotNull(), F.col("h"))
    b = joined.select(
        "event_type",
        "h",
        "n",
        "av",
        F.last("av", ignorenulls=True).over(back).alias("prev_av"),
        F.last(known_h, ignorenulls=True).over(back).alias("prev_h"),
        F.first("av", ignorenulls=True).over(fwd).alias("next_av"),
        F.first(known_h, ignorenulls=True).over(fwd).alias("next_h"),
    )
    # multiply-then-divide, matching the oracle's left-associative
    # `(next-prev) * gap / span` exactly — dividing first is a 1-ULP
    # difference that can flip round(.., 6) at a .xxxxxx5 boundary
    # (observed once at sf0.01)
    lerp = F.col("prev_av") + (F.col("next_av") - F.col("prev_av")) * (
        F.col("h") - F.col("prev_h")
    ).cast("double") / (F.col("next_h") - F.col("prev_h"))
    return b.select(
        "event_type",
        F.col("h").alias("hour_ts"),
        F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        F.round(
            F.when(F.col("av").isNotNull(), F.col("av")).otherwise(lerp), 6
        ).alias("avg_value_lerp"),
    )
