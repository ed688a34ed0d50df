"""Skew-handling patterns, demonstrated with correctness proofs.

``events.event_type`` has 5 distinct values — the canonical skewed
aggregation key: at 100 TB a plain groupBy("event_type") funnels the
whole table through 5 reducers while the rest of the cluster idles.
The fixes shown here:

- Salted two-phase aggregation: append a random-ish salt to the hot
  key, pre-aggregate (key, salt) across many reducers, then combine the
  per-salt partials. The oracle proves the two-phase result equals the
  direct aggregation — salting is a physical rewrite, not a semantic
  one. (AQE's skew handling covers *joins*; skewed aggregations still
  need this rewrite at the query level.)
- High-cardinality stats per hot key (count-distinct) via the same
  two-phase shape: distinct within salt, merge across salts.

The salt is ``pmod(xxhash64(event_id), 16)`` — deterministic (replay-
and test-stable), yet uniform like a random salt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from benchviz_spark.registry import query
from benchviz_spark.sources.tables import load_table

N_SALTS = 16


@query(
    "skew_salted_type_totals",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           round(sum(value), 4) AS total_value,
           round(max(value), 6) AS max_value
    FROM events
    GROUP BY event_type
    """,
)
def skew_salted_type_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over the 5-value hot key. Phase 1
    fans (event_type, salt) over N_SALTS x 5 reducers; phase 2 merges
    N_SALTS partial rows per key — trivially small. The oracle is the
    direct single-phase aggregation: identical result, skew-free plan."""
    events = load_table(spark, sf_dir, "events")
    salted = events.withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(N_SALTS))
    )
    partial = salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum("value").alias("psum"),
        F.max("value").alias("pmax"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n_events"),
        F.round(F.sum("psum"), 4).alias("total_value"),
        F.round(F.max("pmax"), 6).alias("max_value"),
    )


@query(
    "skew_salted_distinct_users",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def skew_salted_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-distinct under a skewed key: phase 1 dedups (type, user)
    pairs — user_id in the grouping key spreads the shuffle uniformly,
    no salt column needed because the high-cardinality column IS the
    salt — phase 2 counts survivors per type."""
    events = load_table(spark, sf_dir, "events")
    pairs = events.select("event_type", "user_id").distinct()
    return pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users")
    )


# ---------------------------------------------------------------------------
# Salted JOIN: replicate the dim across salt values so a hot fact key
# spreads over N_SALTS reducers.
# ---------------------------------------------------------------------------
@query(
    "skew_salted_join_segments",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_spend
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1
    """,
)
def skew_salted_join_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted-JOIN rewrite (the join-side sibling of the salted
    aggregation above): fact rows add a deterministic salt, the dim
    side replicates once per salt value, and the join key widens to
    (key, salt) — a single hot key now lands on N_SALTS reducers
    instead of one. The oracle is the plain join: salting is a
    physical rewrite with identical semantics.

    When to reach for it at 100 TB: AQE's skew-join splitting handles
    sort-merge skew after the fact, but it can't split a hot BUILD side
    nor help when the skewed key's rows must co-locate for a downstream
    stateful op; the query-level rewrite works everywhere. Replication
    cost is |dim| x N_SALTS rows — dims must be small-ish (here 8x
    customer), which is exactly the regime where the hot-fact-key
    problem lives."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    salted_fact = orders.withColumn(
        "salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(N_SALTS // 2))
    )
    replicated_dim = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.explode(F.sequence(F.lit(0), F.lit(N_SALTS // 2 - 1))).alias("salt"),
    )
    return (
        salted_fact.join(
            replicated_dim,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (salted_fact["salt"] == replicated_dim["salt"]),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
        )
    )
