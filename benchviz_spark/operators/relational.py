"""Standard relational operator suite over the driver's TPC-H-ish tables.

This is the engine's general query surface (SURVEY.md §2.2-§2.8): scans
with pushdown, projections, filters, equi/semi/anti/outer joins,
broadcast joins, hash aggregation, rollup/cube, window functions, set
operations, distinct, pivot, top-k, and the scalar-function library.

Cross-engine determinism rules used throughout (Spark vs DuckDB oracle):
- Float aggregates are wrapped in round(): double addition order differs
  between engines (and between Spark partitions), so raw sums differ in
  ULPs. min/max/stored values are exact and stay unrounded.
- Integer sums are cast to BIGINT on both sides (DuckDB widens SUM(BIGINT)
  to HUGEINT).
- Every LIMIT sits on a total order (unique tie-break key), every
  row_number() window has a total order, and collect_list is replaced by
  sort_array(collect_list(...)) — Spark partition order is otherwise
  nondeterministic.

Scale notes (100 TB):
- Dimension joins (region/nation/supplier/part/customer) are explicitly
  broadcast — no shuffle of the fact side.
- Aggregations are expressed as groupBy so Catalyst plans partial
  (map-side) + final HashAggregate; no driver-side collection anywhere.
- Filters are written directly against parquet columns so they reach the
  scan as PushedFilters (asserted in tests/test_plans.py).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from benchviz_spark.registry import query
from benchviz_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Aggregation: filter -> groupBy -> multi-agg (reference A1/A2 family writ
# large; TPC-H Q1 shape). Exercises pushdown + partial aggregation.
# ---------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      round(sum(l_quantity), 2)                                        AS sum_qty,
      round(sum(l_extendedprice), 2)                                   AS sum_base_price,
      round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
      round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
      round(avg(l_quantity), 4)                                        AS avg_qty,
      round(avg(l_extendedprice), 4)                                   AS avg_price,
      round(avg(l_discount), 6)                                        AS avg_disc,
      count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# 3-way join + group + top-k (TPC-H Q3 shape). The orders<->lineitem join
# shuffles on the key both sides already share; join strategy for the
# customer side is left to AQE.
# ---------------------------------------------------------------------------
@query(
    "q3_top_unshipped_orders",
    oracle="""
    SELECT
      l_orderkey,
      round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      o_orderdate,
      o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    # No broadcast hint on customer: it scales with the fact tables
    # (150k rows x SF), so a forced broadcast OOMs a 100-TB cluster. AQE
    # picks broadcast at small SF and shuffle join at scale on its own.
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Star join across 6 tables (TPC-H Q5 shape): tiny dims broadcast,
# SF-scaled tables shuffle-joined, single shuffle for the final agg.
# ---------------------------------------------------------------------------
@query(
    "q5_region_revenue",
    oracle="""
    SELECT
      n_name,
      round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # Broadcast only the genuinely tiny dims (nation: 25 rows, region: 5).
    # customer/supplier scale with SF — forcing them broadcast is a
    # 100x-scale killer; AQE's runtime join-strategy switch handles the
    # small-SF case without the hint.
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


# ---------------------------------------------------------------------------
# Semi / anti joins (EXISTS / NOT EXISTS).
# ---------------------------------------------------------------------------
@query(
    "semi_join_urgent_customers",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    """,
)
def semi_join_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "anti_join_idle_customers",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def anti_join_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


# ---------------------------------------------------------------------------
# Outer join preserving unmatched rows + conditional count.
# ---------------------------------------------------------------------------
@query(
    "left_join_nation_customer_counts",
    oracle="""
    SELECT
      n_nationkey,
      n_name,
      count(c_custkey)                 AS n_customers,
      round(sum(coalesce(c_acctbal, 0)), 2) AS total_acctbal
    FROM nation
    LEFT JOIN customer ON c_nationkey = n_nationkey
    GROUP BY n_nationkey, n_name
    """,
)
def left_join_nation_customer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    return (
        nation.join(cust, nation.n_nationkey == cust.c_nationkey, "left")
        .groupBy("n_nationkey", "n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.round(F.sum(F.coalesce(F.col("c_acctbal"), F.lit(0.0))), 2).alias(
                "total_acctbal"
            ),
        )
    )


@query(
    "full_outer_join_daily_type_counts",
    oracle="""
    WITH views AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n_views
      FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    purchases AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n_purchases
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT
      coalesce(views.day, purchases.day) AS day,
      n_views,
      n_purchases
    FROM views FULL OUTER JOIN purchases ON views.day = purchases.day
    """,
)
def full_outer_join_daily_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's compare-two-series alignment (SURVEY §2.3 J1,
    generate_benchmark_plot.js:129-180) generalized: two per-day series
    full-outer-joined on the date key, nulls where a side is missing."""
    events = load_table(spark, sf_dir, "events")
    day = F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
    views = (
        events.filter(F.col("event_type") == "view")
        .groupBy(day)
        .agg(F.count(F.lit(1)).alias("n_views"))
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(day)
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    joined = views.join(purchases, views.day == purchases.day, "full_outer")
    return joined.select(
        F.coalesce(views.day, purchases.day).alias("day"), "n_views", "n_purchases"
    )


# ---------------------------------------------------------------------------
# Window functions: ranking and moving aggregates (SURVEY §2.5).
# ---------------------------------------------------------------------------
@query(
    "window_top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS BIGINT) AS rn
      FROM orders
    )
    WHERE rn <= 3
    """,
)
def window_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "window_customer_running_spend",
    oracle="""
    SELECT
      o_custkey,
      o_orderkey,
      round(sum(o_totalprice) OVER (
        PARTITION BY o_custkey
        ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ), 2) AS running_spend,
      CAST(lag(o_orderkey) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      ) AS BIGINT) AS prev_orderkey
    FROM orders
    """,
)
def window_customer_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)), 2
        ).alias("running_spend"),
        F.lag("o_orderkey").over(w).cast("long").alias("prev_orderkey"),
    )


# ---------------------------------------------------------------------------
# Rollup / cube / grouping sets (SURVEY §2.4 "not present" -> built-in).
# ---------------------------------------------------------------------------
@query(
    "rollup_lineitem_status",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(GROUPING(l_returnflag) AS INT) + 2 * CAST(GROUPING(l_linestatus) AS INT)
        AS grouping_level,
      count(*) AS n_rows,
      round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_lineitem_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        (
            F.grouping("l_returnflag").cast("int")
            + F.lit(2) * F.grouping("l_linestatus").cast("int")
        ).alias("grouping_level"),
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@query(
    "cube_part_brand_type",
    oracle="""
    SELECT
      p_brand,
      p_type,
      count(*) AS n_parts,
      round(avg(p_retailprice), 4) AS avg_price
    FROM part
    GROUP BY CUBE (p_brand, p_type)
    """,
)
def cube_part_brand_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.cube("p_brand", "p_type").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
    )


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.7).
# ---------------------------------------------------------------------------
@query(
    "setop_active_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_active_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.intersect(supp)


@query(
    "setop_idle_building_customers",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT o_custkey AS custkey FROM orders
    """,
)
def setop_idle_building_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # subtract = EXCEPT DISTINCT (set semantics); exceptAll would keep
    # duplicate-count leftovers.
    cust = load_table(spark, sf_dir, "customer")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    ordered = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey")
    )
    return building.subtract(ordered)


@query(
    "setop_union_all_parties",
    oracle="""
    SELECT party, count(*) AS n FROM (
      SELECT c_name AS party FROM customer
      UNION ALL
      SELECT s_name AS party FROM supplier
    ) GROUP BY party
    """,
)
def setop_union_all_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_name").alias("party"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_name").alias("party"))
    return cust.unionByName(supp).groupBy("party").agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# Distinct / top-k / having.
# ---------------------------------------------------------------------------
@query(
    "distinct_order_channels",
    oracle="""
    SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    """,
)
def distinct_order_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority"
    ).distinct()


@query(
    "topk_expensive_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def topk_expensive_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # orderBy + limit plans as TakeOrderedAndProject: per-partition heap of
    # k, then a k-sized merge on the driver — no global sort at any scale.
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "having_rich_segments",
    oracle="""
    SELECT c_mktsegment, round(avg(c_acctbal), 4) AS avg_bal, count(*) AS n
    FROM customer
    GROUP BY c_mktsegment
    HAVING count(*) > 100
    """,
)
def having_rich_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") > 100)
    )


# ---------------------------------------------------------------------------
# Pivot (wide projection — SURVEY §2.2 F9's chart-series shape).
# ---------------------------------------------------------------------------
@query(
    "pivot_status_by_returnflag",
    oracle="""
    SELECT
      l_returnflag,
      round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END), 2) AS F,
      round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END), 2) AS O
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def pivot_status_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pivoted = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return pivoted.select(
        "l_returnflag",
        F.coalesce(F.col("F"), F.lit(0.0)).alias("F"),
        F.coalesce(F.col("O"), F.lit(0.0)).alias("O"),
    )


# ---------------------------------------------------------------------------
# Unpivot / stack (F9's inverse) — metric name/value long format.
# ---------------------------------------------------------------------------
@query(
    "unpivot_order_metrics",
    oracle="""
    SELECT o_orderkey, metric, value FROM (
      SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS value FROM orders
      UNION ALL
      SELECT o_orderkey, 'custkey' AS metric, CAST(o_custkey AS DOUBLE) AS value FROM orders
    )
    WHERE o_orderkey <= 100
    """,
)
def unpivot_order_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    return orders.select(
        "o_orderkey",
        F.expr(
            "stack(2, 'totalprice', o_totalprice, 'custkey', CAST(o_custkey AS DOUBLE)) "
            "AS (metric, value)"
        ),
    )


# ---------------------------------------------------------------------------
# Scalar function library (SURVEY §2.8): string / regex / date / math /
# conditional, all JVM-side Catalyst expressions.
# ---------------------------------------------------------------------------
@query(
    "scalar_functions_projection",
    oracle="""
    SELECT
      p_partkey,
      upper(p_brand)                              AS brand_upper,
      substr(p_name, 1, 8)                        AS name_prefix,
      length(p_name)                              AS name_len,
      concat(p_brand, ':', p_type)                AS brand_type,
      CASE WHEN p_size >= 25 THEN 'large' ELSE 'small' END AS size_class,
      round(sqrt(p_retailprice), 4)               AS price_sqrt,
      round(ln(p_retailprice + 1), 4)             AS price_ln,
      CAST(floor(p_retailprice) AS BIGINT)        AS price_int,
      abs(p_size - 25)                            AS size_dist,
      regexp_extract(p_brand, '[0-9]+', 0)        AS brand_num
    FROM part
    """,
)
def scalar_functions_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.when(F.col("p_size") >= 25, "large").otherwise("small").alias("size_class"),
        F.round(F.sqrt("p_retailprice"), 4).alias("price_sqrt"),
        F.round(F.log(F.col("p_retailprice") + 1), 4).alias("price_ln"),
        # floor, not a raw cast: DuckDB rounds double->int, Spark truncates.
        F.floor("p_retailprice").cast("long").alias("price_int"),
        F.abs(F.col("p_size") - 25).cast("int").alias("size_dist"),
        F.regexp_extract("p_brand", "[0-9]+", 0).alias("brand_num"),
    )


@query(
    "date_functions_projection",
    oracle="""
    SELECT
      o_orderkey,
      CAST(o_orderdate AS DATE)                       AS order_date,
      CAST(year(o_orderdate) AS INT)                  AS order_year,
      CAST(month(o_orderdate) AS INT)                 AS order_month,
      CAST(dayofweek(o_orderdate) AS INT)             AS order_dow,
      strftime(o_orderdate, '%d-%m-%Y')               AS ddmmyyyy,
      CAST(date_trunc('month', o_orderdate) AS DATE)  AS month_start,
      CAST(o_orderdate + INTERVAL 30 DAY AS DATE)     AS due_date
    FROM orders
    WHERE o_orderkey <= 500
    """,
)
def date_functions_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DD-MM-YYYY round-trip fidelity is a reference requirement
    (SURVEY §2.2 F8, common.js:43-53); strftime/date_format agree on
    %d-%m-%Y / dd-MM-yyyy."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    # DuckDB dayofweek: 0=Sunday..6=Saturday; Spark dayofweek: 1=Sunday..7.
    return orders.select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("order_date"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        (F.dayofweek("o_orderdate") - 1).cast("int").alias("order_dow"),
        F.date_format("o_orderdate", "dd-MM-yyyy").alias("ddmmyyyy"),
        F.to_date(F.date_trunc("month", F.col("o_orderdate"))).alias("month_start"),
        F.to_date(F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
    )


# ---------------------------------------------------------------------------
# Correlated scalar subquery + IN subquery.
# ---------------------------------------------------------------------------
@query(
    "subquery_above_avg_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
      AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
    """,
)
def subquery_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar + IN subqueries, expressed via SQL over per-sf_dir view
    names (a fixed view name would be clobbered if the driver interleaves
    calls for different scale factors)."""
    suffix = re.sub(r"\W", "_", sf_dir).strip("_")
    orders_v, cust_v = f"orders_sq_{suffix}", f"cust_sq_{suffix}"
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(orders_v)
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(cust_v)
    return spark.sql(
        f"""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM {orders_v}
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM {orders_v})
          AND o_custkey IN (
            SELECT c_custkey FROM {cust_v} WHERE c_mktsegment = 'MACHINERY'
          )
        """
    )


# ---------------------------------------------------------------------------
# Range (non-equi) join: price-band dimension built inline on both sides.
# ---------------------------------------------------------------------------
@query(
    "range_join_price_bands",
    oracle="""
    WITH bands(band, lo, hi) AS (
      VALUES ('low', 0.0, 50000.0),
             ('mid', 50000.0, 150000.0),
             ('high', 150000.0, 1000000000.0)
    )
    SELECT band, count(*) AS n_orders, round(sum(o_totalprice), 2) AS band_total
    FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    """,
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("low", 0.0, 50000.0), ("mid", 50000.0, 150000.0), ("high", 150000.0, 1e9)],
        "band string, lo double, hi double",
    )
    # Non-equi join: broadcast the band table so it plans as
    # BroadcastNestedLoopJoin (fact side never shuffles).
    return (
        orders.join(
            F.broadcast(bands),
            (orders.o_totalprice >= bands.lo) & (orders.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("band_total"),
        )
    )


# ---------------------------------------------------------------------------
# Approximate aggregates — exposed, oracle uses the exact equivalent only
# where the approximation is exact (small distinct counts); the genuinely
# approximate ones are rows-only checked via `approx_quantiles_value`.
# ---------------------------------------------------------------------------
@query(
    "count_distinct_exact",
    oracle="""
    SELECT
      count(DISTINCT o_custkey)   AS n_customers,
      count(DISTINCT o_orderstatus) AS n_statuses
    FROM orders
    """,
)
def count_distinct_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
    )


@query(
    "stats_orders_exact",
    oracle="""
    SELECT
      count(DISTINCT o_custkey)                    AS n_customers,
      round(quantile_cont(o_totalprice, 0.50), 4)  AS price_p50,
      round(quantile_cont(o_totalprice, 0.95), 4)  AS price_p95,
      round(quantile_cont(o_totalprice, 0.99), 4)  AS price_p99
    FROM orders
    """,
)
def stats_orders_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact order statistics — the value-checkable twin of
    :func:`approx_stats_orders`. Spark's ``percentile`` and DuckDB's
    ``quantile_cont`` share linear-interpolation semantics, so this twin
    hash-matches where the sketch-based version cannot. At 100 TB the
    approx version is the production path (fixed-size sketches, one
    pass); this exact form is the audit/verification path."""
    orders = load_table(spark, sf_dir, "orders")
    # array-of-fractions form: one value buffer + one sort instead of
    # three independent percentile aggregates (see quantiles_exact_by_flag)
    return (
        orders.agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.expr(
                "percentile(o_totalprice, array(0.50D, 0.95D, 0.99D))"
            ).alias("_q"),
        )
        .select(
            "n_customers",
            F.round(F.element_at("_q", 1), 4).alias("price_p50"),
            F.round(F.element_at("_q", 2), 4).alias("price_p95"),
            F.round(F.element_at("_q", 3), 4).alias("price_p99"),
        )
    )


def approx_stats_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based order statistics (HLL++ count-distinct +
    approx_percentile). Not registered: approx algorithms differ across
    engines, so no cross-engine oracle can hash-match. Accuracy is
    bounded against :func:`stats_orders_exact` in
    tests/test_contract.py instead — the 100-TB production path keeps a
    pytest-verified error envelope rather than a driver row."""
    orders = load_table(spark, sf_dir, "orders")
    quantiles = F.expr("approx_percentile(o_totalprice, array(0.5, 0.95, 0.99))")
    return orders.agg(
        F.approx_count_distinct("o_custkey").alias("approx_customers"),
        quantiles.alias("_q"),
    ).select(
        "approx_customers",
        F.element_at("_q", 1).alias("price_p50"),
        F.element_at("_q", 2).alias("price_p95"),
        F.element_at("_q", 3).alias("price_p99"),
    )
