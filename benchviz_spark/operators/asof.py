"""As-of join: for each purchase event, the most recent prior view by
the same user (SURVEY §2.3's required join surface beyond the
reference's own joins).

Spark has no native ASOF JOIN; the scale-correct formulation is
union + ordered window carry-forward:

1. tag both sides and union them,
2. one window per user ordered by (ts, side, event_id) — views sort
   before purchases at equal ts so a ts-tie matches,
3. ``last(view, ignoreNulls)`` carries the latest view downward,
4. keep purchase rows with a carried view.

That is ONE shuffle (the window partitioning) and no join blow-up —
versus the naive range join whose intermediate is |purchases| x
|views-per-user|. The DuckDB oracle *is* the naive pair formulation
(row_number over v.ts <= p.ts), which proves the window plan equals
the quadratic definition.

Tie semantics (explicit, matching the oracle): latest view with
view.ts <= purchase.ts; equal-ts views allowed; among equal-ts views
the greatest event_id wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from benchviz_spark.registry import query
from benchviz_spark.sources.tables import load_table


@query(
    "asof_purchase_last_view",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    ),
    views AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'view'
    )
    SELECT purchase_id, user_id, purchase_ts_s, view_ts_s, view_value FROM (
      SELECT p.event_id AS purchase_id,
             p.user_id,
             CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_ts_s,
             CAST(floor(epoch(v.ts)) AS BIGINT) AS view_ts_s,
             round(v.value, 4) AS view_value,
             row_number() OVER (
               PARTITION BY p.event_id ORDER BY v.ts DESC, v.event_id DESC
             ) AS rn
      FROM purchases p JOIN views v
        ON p.user_id = v.user_id AND v.ts <= p.ts
    ) WHERE rn = 1
    """,
)
def asof_purchase_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase matched to the user's most recent view at-or-before
    it. Window carry-forward plan (one shuffle); purchases with no prior
    view drop out (inner as-of)."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts")
    )
    views = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_event_id"),
        "user_id",
        F.col("ts"),
        F.col("value").alias("view_value_raw"),
    )
    p_tagged = purchases.select(
        "user_id", "ts",
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("tb"),
        "purchase_id",
        F.lit(None).cast("struct<ts_s:bigint,value:double>").alias("view_info"),
    )
    v_tagged = views.select(
        "user_id", "ts",
        F.lit(0).alias("side"),
        F.col("view_event_id").alias("tb"),
        F.lit(None).cast("long").alias("purchase_id"),
        F.struct(
            F.unix_timestamp("ts").alias("ts_s"),
            F.col("view_value_raw").alias("value"),
        ).alias("view_info"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "side", "tb")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = p_tagged.unionByName(v_tagged).withColumn(
        "last_view", F.last("view_info", ignorenulls=True).over(w)
    )
    return (
        carried.filter((F.col("side") == 1) & F.col("last_view").isNotNull())
        .select(
            "purchase_id",
            "user_id",
            F.unix_timestamp("ts").alias("purchase_ts_s"),
            F.col("last_view.ts_s").alias("view_ts_s"),
            F.round(F.col("last_view.value"), 4).alias("view_value"),
        )
    )


@query(
    "asof_purchase_next_click",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'
    )
    SELECT purchase_id, user_id, purchase_ts_s, click_ts_s, click_value FROM (
      SELECT p.event_id AS purchase_id,
             p.user_id,
             CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_ts_s,
             CAST(floor(epoch(c.ts)) AS BIGINT) AS click_ts_s,
             round(c.value, 4) AS click_value,
             row_number() OVER (
               PARTITION BY p.event_id ORDER BY c.ts, c.event_id
             ) AS rn
      FROM purchases p JOIN clicks c
        ON p.user_id = c.user_id AND c.ts > p.ts
    ) WHERE rn = 1
    """,
)
def asof_purchase_next_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each purchase matched to the user's first
    click STRICTLY AFTER it (post-purchase engagement). Same union +
    single-window mechanics as the backward ``asof_purchase_last_view``,
    mirrored: the frame looks from the current row to
    unboundedFollowing and ``first(ignoreNulls)`` picks the earliest
    later click. Tie semantics (explicit, matching the oracle):
    strictly-later clicks only — at equal ts the click sorts BEFORE the
    purchase (side 0 < 1), putting it outside the forward frame — and
    among equal-ts later clicks the smallest event_id wins.

    Scale: one shuffle (the per-user window partitioning), no
    |purchases| x |clicks-per-user| pair blow-up; the DuckDB oracle IS
    the quadratic pair formulation, proving the window plan equal to
    the definition."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_event_id"),
        "user_id",
        F.col("ts"),
        F.col("value").alias("click_value_raw"),
    )
    p_tagged = purchases.select(
        "user_id", "ts",
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("tb"),
        "purchase_id",
        F.lit(None).cast("struct<ts_s:bigint,value:double>").alias("click_info"),
    )
    c_tagged = clicks.select(
        "user_id", "ts",
        F.lit(0).alias("side"),
        F.col("click_event_id").alias("tb"),
        F.lit(None).cast("long").alias("purchase_id"),
        F.struct(
            F.unix_timestamp("ts").alias("ts_s"),
            F.col("click_value_raw").alias("value"),
        ).alias("click_info"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "side", "tb")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    carried = p_tagged.unionByName(c_tagged).withColumn(
        "next_click", F.first("click_info", ignorenulls=True).over(w)
    )
    return (
        carried.filter((F.col("side") == 1) & F.col("next_click").isNotNull())
        .select(
            "purchase_id",
            "user_id",
            F.unix_timestamp("ts").alias("purchase_ts_s"),
            F.col("next_click.ts_s").alias("click_ts_s"),
            F.round(F.col("next_click.value"), 4).alias("click_value"),
        )
    )


@query(
    "asof_purchase_nearest_view",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    views AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'view'
    )
    SELECT purchase_id, user_id, purchase_ts_s, view_ts_s, view_value, direction
    FROM (
      SELECT p.event_id AS purchase_id,
             p.user_id,
             CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_ts_s,
             CAST(floor(epoch(v.ts)) AS BIGINT) AS view_ts_s,
             round(v.value, 4) AS view_value,
             CASE WHEN v.ts <= p.ts THEN 'backward' ELSE 'forward' END AS direction,
             row_number() OVER (
               PARTITION BY p.event_id
               ORDER BY abs(epoch_us(v.ts) - epoch_us(p.ts)),
                        CASE WHEN v.ts <= p.ts THEN 0 ELSE 1 END,
                        CASE WHEN v.ts <= p.ts THEN -v.event_id ELSE v.event_id END
             ) AS rn
      FROM purchases p JOIN views v ON p.user_id = v.user_id
    ) WHERE rn = 1
    """,
)
def asof_purchase_nearest_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join — the third direction beside backward
    (``asof_purchase_last_view``) and forward strict
    (``asof_purchase_next_click``): each purchase matched to the view
    whose timestamp is CLOSEST in either direction (microsecond
    distance). Tie semantics (explicit, matching the oracle): equal
    distance prefers the backward side; among equal-ts backward views
    the greatest event_id wins, among equal-ts forward views the
    smallest. Equal-ts views are backward (distance 0).

    Scale: both directional candidates ride ONE per-user shuffle — the
    backward carry (unboundedPreceding..currentRow, last ignoreNulls)
    and the forward look (currentRow..unboundedFollowing, first
    ignoreNulls) share the same partitioning and sort, so Catalyst
    plans one Exchange + Sort feeding two Window frames; the nearest
    pick is then a scan-side CASE over the two carried structs. No
    |purchases| x |views-per-user| blow-up — the DuckDB oracle IS that
    quadratic formulation, proving the plan equal to the definition."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts")
    )
    views = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_event_id"),
        "user_id",
        F.col("ts"),
        F.col("value").alias("view_value_raw"),
    )
    info_type = "struct<ts_us:bigint,ts_s:bigint,value:double>"
    p_tagged = purchases.select(
        "user_id", "ts",
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("tb"),
        "purchase_id",
        F.lit(None).cast(info_type).alias("view_info"),
    )
    v_tagged = views.select(
        "user_id", "ts",
        F.lit(0).alias("side"),
        F.col("view_event_id").alias("tb"),
        F.lit(None).cast("long").alias("purchase_id"),
        F.struct(
            F.unix_micros("ts").alias("ts_us"),
            F.unix_timestamp("ts").alias("ts_s"),
            F.col("view_value_raw").alias("value"),
        ).alias("view_info"),
    )
    base = W.partitionBy("user_id").orderBy("ts", "side", "tb")
    wb = base.rowsBetween(W.unboundedPreceding, W.currentRow)
    wf = base.rowsBetween(W.currentRow, W.unboundedFollowing)
    carried = (
        p_tagged.unionByName(v_tagged)
        .withColumn("bv", F.last("view_info", ignorenulls=True).over(wb))
        .withColumn("fv", F.first("view_info", ignorenulls=True).over(wf))
    )
    p_us = F.unix_micros("ts")
    bdist = p_us - F.col("bv.ts_us")
    fdist = F.col("fv.ts_us") - p_us
    pick_backward = F.col("fv").isNull() | (
        F.col("bv").isNotNull() & (bdist <= fdist)
    )
    nearest = F.when(pick_backward, F.col("bv")).otherwise(F.col("fv"))
    direction = F.when(pick_backward, "backward").otherwise("forward")
    return (
        carried.filter(
            (F.col("side") == 1)
            & (F.col("bv").isNotNull() | F.col("fv").isNotNull())
        )
        .select(
            "purchase_id",
            "user_id",
            F.unix_timestamp("ts").alias("purchase_ts_s"),
            nearest["ts_s"].alias("view_ts_s"),
            F.round(nearest["value"], 4).alias("view_value"),
            direction.alias("direction"),
        )
    )
