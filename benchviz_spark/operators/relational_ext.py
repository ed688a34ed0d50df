"""Second- and third-wave relational coverage: with relational.py's
Q1/Q3/Q5 etc., every one of the 22 classic TPC-H query shapes has an
analogue here (adapted to the driver's slimmed schemas — see the
third-wave banner below for how the partsupp-dependent ones map), so a
user of any standard analytic SQL surface finds their query shape.
All oracle-checked.

Plan notes are per-query; the shared rules from relational.py apply
(rounded float aggs, BIGINT counts, total orders under every limit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from benchviz_spark.registry import query
from benchviz_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Q2 shape: correlated "min within group" selection.
# ---------------------------------------------------------------------------
@query(
    "q2_cheapest_part_per_brand",
    oracle="""
    SELECT p_brand, p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_retailprice = (
      SELECT min(p_retailprice) FROM part p2 WHERE p2.p_brand = part.p_brand
    )
    ORDER BY p_brand, p_partkey
    """,
)
def q2_cheapest_part_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-min selection. Implemented as a rank window rather
    than a self-join: one shuffle on p_brand instead of two scans. Ties
    (several parts at the brand minimum) are all kept, like the
    correlated predicate keeps them."""
    part = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand")
    return (
        part.withColumn("min_price", F.min("p_retailprice").over(w))
        .filter(F.col("p_retailprice") == F.col("min_price"))
        .select("p_brand", "p_partkey", "p_name", "p_retailprice")
        .orderBy("p_brand", "p_partkey")
    )


# ---------------------------------------------------------------------------
# Q7 shape: bilateral volumes with a CASE'd dimension.
# ---------------------------------------------------------------------------
@query(
    "q7_bilateral_nation_revenue",
    oracle="""
    SELECT supp_nation, cust_nation, ship_year, round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation,
             n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS ship_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE n1.n_name IN ('NATION_1', 'NATION_2')
        AND n2.n_name IN ('NATION_1', 'NATION_2')
        AND n1.n_name <> n2.n_name
    )
    GROUP BY supp_nation, cust_nation, ship_year
    """,
)
def q7_bilateral_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop star join with both nation roles; the nation filter is
    applied BEFORE the fact joins (dimension-side pruning), and both
    nation copies broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    nations = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    n1 = nations.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nations.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q13 shape: distribution of per-customer order counts (left join keeps
# zero-order customers).
# ---------------------------------------------------------------------------
@query(
    "q13_order_count_distribution",
    oracle="""
    SELECT n_orders, count(*) AS n_customers
    FROM (
      SELECT c_custkey, count(o_orderkey) AS n_orders
      FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      GROUP BY c_custkey
    )
    GROUP BY n_orders
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


# ---------------------------------------------------------------------------
# Q14 shape: conditional-aggregation share.
# ---------------------------------------------------------------------------
@query(
    "q14_promo_revenue_share",
    oracle="""
    SELECT round(
             100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass conditional aggregation — one join, one agg, no
    second scan for the denominator."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(F.lit(100.0) * F.sum(promo) / F.sum(rev), 4).alias(
                "promo_share_pct"
            )
        )
    )


# ---------------------------------------------------------------------------
# Q16 shape: distinct-count per group with a NOT IN exclusion subquery.
# ---------------------------------------------------------------------------
@query(
    "q16_supplier_variety",
    oracle="""
    SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS n_suppliers
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type
    """,
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN compiles to an anti-join against the filtered exclusion
    set. NO broadcast hint on it: the excluded-supplier set is a fixed
    FRACTION of supplier, which scales with SF — the same class of
    100-TB OOM as hinting customer (the round-1 lesson). AQE broadcasts
    it while small and falls back to a shuffled anti-join at scale.
    The distinct-count shuffles (brand, type, suppkey) once."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("n_suppliers"))
    )


# ---------------------------------------------------------------------------
# Q19 shape: disjunction of conjunctive predicates (OR-of-ANDs).
# ---------------------------------------------------------------------------
@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 10)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 20)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic pushdown test: part-side conjuncts (brand, size)
    prune the build side before the join; the residual OR runs post-join.
    Catalyst extracts the common part-only predicate automatically."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & (F.col("l_quantity") >= 10))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(10, 30)
           & (F.col("l_quantity") >= 20))
        | ((F.col("p_brand") == "Brand#20") & F.col("p_size").between(20, 50)
           & (F.col("l_quantity") >= 30))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q4 shape: EXISTS semi-join + count by category.
# ---------------------------------------------------------------------------
@query(
    "q4_priority_order_counts",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def q4_priority_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


# ---------------------------------------------------------------------------
# Q6 shape: pure scan-filter aggregation (the pushdown microbenchmark).
# ---------------------------------------------------------------------------
@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No join at all: every predicate reaches the scan, the agg is one
    map-side partial + one 1-row exchange — the minimal possible plan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


# ---------------------------------------------------------------------------
# Q10 shape: returned-item losses, top customers.
# ---------------------------------------------------------------------------
@query(
    "q10_return_losses_top20",
    oracle="""
    SELECT c_custkey, c_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS lost
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name
    ORDER BY lost DESC, c_custkey
    LIMIT 20
    """,
)
def q10_return_losses_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("lost")
        )
        .orderBy(F.col("lost").desc(), F.col("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q12 shape: join + dual conditional counts.
# ---------------------------------------------------------------------------
@query(
    "q12_priority_by_linestatus",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT)     AS high_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT)     AS low_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY l_linestatus
    """,
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q17 shape: correlated avg subquery against the same fact table.
# ---------------------------------------------------------------------------
@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem
    JOIN (
      SELECT l_partkey AS pk, 0.2 * avg(l_quantity) AS threshold
      FROM lineitem GROUP BY l_partkey
    ) t ON l_partkey = pk
    WHERE l_quantity < threshold
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated per-part average is decorrelated into a
    self-aggregate + join — the plan Catalyst produces for the
    correlated form, written explicitly."""
    li = load_table(spark, sf_dir, "lineitem")
    thresholds = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("threshold")
    )
    return (
        li.join(thresholds, li.l_partkey == thresholds.pk)
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Q18 shape: large-order customers via HAVING subquery.
# ---------------------------------------------------------------------------
@query(
    "q18_bulk_order_customers",
    oracle="""
    SELECT c_custkey, o_orderkey, round(total_qty, 2) AS total_qty
    FROM (
      SELECT o_custkey, o_orderkey, sum(l_quantity) AS total_qty
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY o_custkey, o_orderkey
      HAVING sum(l_quantity) > 150
    ) big
    JOIN customer ON c_custkey = o_custkey
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 50
    """,
)
def q18_bulk_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey", "o_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty_raw"))
        .filter(F.col("total_qty_raw") > 150)
    )
    return (
        big.join(cust, big.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.round("total_qty_raw", 2).alias("total_qty"),
        )
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Exact interpolated quantiles per group (the exact counterpart of
# approx_stats_orders' sketch path).
# ---------------------------------------------------------------------------
@query(
    "quantiles_exact_by_flag",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS price_p25,
           round(quantile_cont(l_extendedprice, 0.50), 4) AS price_p50,
           round(quantile_cont(l_extendedprice, 0.95), 4) AS price_p95
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def quantiles_exact_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (interpolated) per-group quantiles — Spark's percentile()
    and DuckDB's quantile_cont share linear-interpolation semantics, so
    this is value-checkable where approx_percentile is not. Exact
    percentile sorts within each group; at 100 TB you'd reach for the
    approx sketch unless the audit demands exactness — the engine
    offers both."""
    li = load_table(spark, sf_dir, "lineitem")
    # ONE percentile aggregate with an array of fractions: three scalar
    # percentile() calls each keep their own per-group value buffer and
    # sort it independently — the array form buffers and sorts once
    # (measured 3.9 s -> ~1.5 s at sf0.1).
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "percentile(l_extendedprice, array(0.25D, 0.50D, 0.95D))"
            ).alias("ps")
        )
        .select(
            "l_returnflag",
            F.round(F.element_at("ps", 1), 4).alias("price_p25"),
            F.round(F.element_at("ps", 2), 4).alias("price_p50"),
            F.round(F.element_at("ps", 3), 4).alias("price_p95"),
        )
    )


# ---------------------------------------------------------------------------
# Explicit GROUPING SETS (rollup/cube's general form).
# ---------------------------------------------------------------------------
@query(
    "groupingsets_order_stats",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def groupingsets_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-hierarchical grouping sets — the shape rollup/cube can't
    express (two independent single-column sets + grand total). Spark
    plans one Expand + one aggregation, same as rollup."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_gs_v")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders_gs_v
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# ---------------------------------------------------------------------------
# Q22 shape: scalar AVG subquery + NOT EXISTS.
# ---------------------------------------------------------------------------
@query(
    "q22_idle_rich_customers",
    oracle="""
    SELECT c_nationkey, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_bal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers with no URGENT order, by nation:
    scalar subquery (1-row broadcast) + anti-join + aggregation."""
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


# ---------------------------------------------------------------------------
# Third-wave TPC-H shapes: Q8/Q9/Q11/Q15/Q20/Q21 analogues complete the
# 22-query suite. The driver's schema has no partsupp table, so Q9/Q11/
# Q20 keep their defining operator shape (multi-way join + CASE'd share,
# profit by nation x year, HAVING-vs-global-scalar, nested semi-join
# chain with a correlated quantity threshold) over the tables that do
# exist; the plan shapes are what the suite exercises, and each is
# oracle-checked.
# ---------------------------------------------------------------------------
@query(
    "q8_nation_market_share",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      JOIN part     ON l_partkey = p_partkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    )
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: one nation's share of ECONOMY-part revenue sold into AMERICA,
    per order year. Eight-table join; only the genuinely tiny dims
    (nation x2, region) are broadcast-hinted — part, supplier, customer
    all grow with SF, so their join strategy is left to AQE (the q3/q5
    lesson from round 1). The CASE'd conditional share is computed in
    one aggregation pass, not two joins."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    n1 = load_table(spark, sf_dir, "nation").alias("n1")
    n2 = load_table(spark, sf_dir, "nation").alias("n2")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")

    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(region), F.col("n1.n_regionkey") == region.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2.n_nationkey"))
        .join(part, li.l_partkey == part.p_partkey)
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            volume.alias("volume"),
            F.col("n2.n_name").alias("nation"),
        )
    )
    share = F.sum(
        F.when(F.col("nation") == "NATION_5", F.col("volume")).otherwise(F.lit(0.0))
    ) / F.sum("volume")
    return (
        joined.groupBy("o_year")
        .agg(F.round(share, 6).alias("mkt_share"))
        .orderBy("o_year")
    )


@query(
    "q9_product_profit_by_nation_year",
    oracle="""
    SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS amount
      FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN orders   ON l_orderkey = o_orderkey
      WHERE p_name LIKE '%red%'
    )
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9: profit on red-named parts by supplier nation x order year.
    (The reference schema carries no partsupp.ps_supplycost, so profit
    is the discounted revenue — the five-way join + group shape is
    Q9's.) The LIKE filter is evaluated at the part scan, shrinking the
    probe side before any join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


@query(
    "q11_nation_balance_concentration",
    oracle="""
    SELECT n_name, round(sum(s_acctbal), 2) AS total_bal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    HAVING sum(s_acctbal) > (
      SELECT sum(s_acctbal) * 0.04 FROM supplier
    )
    ORDER BY total_bal DESC, n_name
    """,
)
def q11_nation_balance_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11: groups whose share exceeds a fraction of the GLOBAL total —
    the HAVING-against-scalar-subquery shape. (partsupp value -> supplier
    account balance on this schema.) The global total is a 1-row agg
    broadcast into the filter; the grouped agg and the global agg each
    scan supplier once — no self-join of grouped results."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    total = supp.agg((F.sum("s_acctbal") * 0.04).alias("threshold"))
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum("s_acctbal").alias("raw_bal"))
        .join(F.broadcast(total))
        .filter(F.col("raw_bal") > F.col("threshold"))
        .select("n_name", F.round("raw_bal", 2).alias("total_bal"))
        .orderBy(F.col("total_bal").desc(), "n_name")
    )


@query(
    "q15_top_revenue_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: the view-backed argmax. The quarterly revenue "view" is
    built once; its global max is a 1-row broadcast joined back as the
    filter (not a sort of the whole view, not a second scan of
    lineitem). Revenue is rounded BEFORE the max comparison on both
    engines so float summation-order noise cannot split the argmax."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "total_revenue"
            )
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        supp.join(revenue, supp.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q20_bulk_small_part_suppliers",
    oracle="""
    SELECT s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem
      WHERE l_partkey IN (
        SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
      )
      GROUP BY l_suppkey, l_partkey
      HAVING sum(l_quantity) > 100
    )
    ORDER BY s_suppkey
    """,
)
def q20_bulk_small_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20: the nested semi-join chain — suppliers who moved > 100 units
    of any single small-named part. part-IN prunes lineitem first (semi
    join), the (supp, part) agg applies the correlated threshold, and
    the outer IN is a left-semi join into supplier: no step ever
    produces duplicates for distinct() to clean up."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    bulk = (
        li.join(part, li.l_partkey == part.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
        .select("l_suppkey")
    )
    return (
        supp.join(bulk, supp.s_suppkey == bulk.l_suppkey, "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21: suppliers solely responsible for a finished order shipping
    late (> 90 days after order date — this schema has no commit/receipt
    dates, so lateness is anchored to o_orderdate). The EXISTS is a
    left-semi and the NOT EXISTS a left-anti join on l_orderkey with a
    non-equi supplier-mismatch condition; both probe sides are built
    from the already-filtered late-lines frame, so the heavy
    lineitem x lineitem work touches only qualifying orders."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = load_table(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")

    l1 = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(late)
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("s2_suppkey")
    )
    # late lines of ANY supplier within status-F orders, for the anti side
    l3 = l1.select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("s3_suppkey")
    )
    waiting = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("s2_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("o3_orderkey"))
            & (F.col("l_suppkey") != F.col("s3_suppkey")),
            "left_anti",
        )
    )
    return (
        waiting.join(supp, waiting.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


# ---------------------------------------------------------------------------
# Bloom-filter pre-filtered semi join: the 100-TB shuffle reducer.
# ---------------------------------------------------------------------------
BLOOM_BITS = 1 << 16  # m: bitset size
BLOOM_HASHES = 3  # k: probes per key
_BLOOM_WORDS = BLOOM_BITS // 64


def _bloom_positions(key, i: int):
    # xxhash64 is input-TYPE-sensitive: an int and a bigint holding the
    # same value hash differently. Normalize every key to long so the
    # build and probe sides always hash identically — type skew between
    # them would otherwise produce silent false negatives, breaking the
    # no-false-negative contract the exact-join rewrite relies on.
    if not isinstance(key, F.Column):
        key = F.col(key)
    return F.pmod(F.xxhash64(key.cast("long"), F.lit(i)), F.lit(BLOOM_BITS))


def bloom_bitmap(keys: DataFrame, key_col: str) -> DataFrame:
    """One-row DataFrame holding the bloom bitset as a word_idx ->
    64-bit-word map. Fixed size (<= m/64 entries, ~8 KiB here) no
    matter how many keys went in — that is the whole point: the
    build side compresses to a broadcastable constant."""
    positions = keys.select(
        F.explode(
            F.array(
                *[_bloom_positions(F.col(key_col), i) for i in range(BLOOM_HASHES)]
            )
        ).alias("pos")
    )
    words = positions.groupBy(
        (F.col("pos") / 64).cast("int").alias("word_idx")
    ).agg(
        F.bit_or(
            # shiftleft via call_function: the PySpark wrapper insists on a
            # literal shift count, the SQL function takes a column
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
            )
        ).alias("bits")
    )
    return words.agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("word_idx", "bits")))
        ).alias("bloom")
    )


def bloom_might_contain(key) -> F.Column:
    """ALL k probe bits set in the broadcast ``bloom`` map column —
    no false negatives; false positives removed by the exact join
    that follows."""
    hits = [
        (
            F.coalesce(
                F.col("bloom")[(_bloom_positions(key, i) / 64).cast("int")],
                F.lit(0).cast("long"),
            ).bitwiseAND(
                F.call_function(
                    "shiftleft",
                    F.lit(1).cast("long"),
                    (_bloom_positions(key, i) % 64).cast("int"),
                )
            )
            != 0
        )
        for i in range(BLOOM_HASHES)
    ]
    out = hits[0]
    for h in hits[1:]:
        out = out & h
    return out


@query(
    "join_bloom_prefilter_building",
    oracle="""
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(e.value), 4)   AS total_value
    FROM events e
    WHERE EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = e.user_id
                    AND c.c_mktsegment = 'BUILDING')
    GROUP BY 1
    """,
)
def join_bloom_prefilter_building(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event totals for BUILDING-segment customers, with the fact side
    pre-filtered through a Bloom bitset built as plain DataFrame ops
    (k=3 xxhash64 probes into an m=64Ki-bit map aggregated with
    bit_or) before the exact semi join. Bloom filters have no false
    negatives and the semi join removes the false positives, so the
    result is bit-identical to the plain semi join — which is exactly
    what the oracle runs.

    Scale: this is how a selective dim filter reaches a 100-TB fact
    scan without shuffling the fact table first. The bitset is a
    FIXED ~8 KiB one-row map whatever the dimension's size (unlike
    broadcasting the key set itself), the probe is a scan-side
    expression on the fact, and only surviving rows (true matches +
    ~0.1% false positives at these m/k settings) enter the semi
    join's shuffle. Spark's own runtime row-level filtering injects
    the same shape; doing it explicitly makes the plan deterministic
    and the technique reusable against any join."""
    events = load_table(spark, sf_dir, "events")
    building = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    bitmap = bloom_bitmap(building, "c_custkey")
    prefiltered = (
        events.crossJoin(F.broadcast(bitmap))
        .filter(bloom_might_contain(F.col("user_id")))
        .drop("bloom")
    )
    return (
        prefiltered.join(
            building, prefiltered.user_id == building.c_custkey, "leftsemi"
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Market-basket co-occurrence: support + lift over within-order part pairs.
# ---------------------------------------------------------------------------
BASKET_TOP_K = 20


@query(
    "basket_part_pair_lift",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM items),
    part_supp AS (
      SELECT l_partkey, count(*) AS supp FROM items GROUP BY 1
    ),
    pair_supp AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*) AS pair_orders
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT part_a, part_b, CAST(pair_orders AS BIGINT) AS pair_orders,
           round(pair_orders * n.n_orders
                 / (sa.supp::DOUBLE * sb.supp), 6) AS lift
    FROM pair_supp
    JOIN part_supp sa ON sa.l_partkey = part_a
    JOIN part_supp sb ON sb.l_partkey = part_b
    CROSS JOIN n
    ORDER BY pair_orders DESC, part_a, part_b
    LIMIT {BASKET_TOP_K}
    """,
)
def basket_part_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K co-purchased part pairs with association lift
    (N * supp(a,b) / (supp(a) * supp(b))) — the market-basket statistic
    behind recommendation candidate mining, over TPC-H order baskets.

    Scale design: ONE basket pass — lineitem groups straight into
    per-order sorted distinct part arrays (collect_set fuses the
    dedup into the same shuffle), and pairs, part supports, and the
    order count all derive from that basket table, so there is no
    items self-join (which would shuffle the item table twice on
    l_orderkey). Pair blowup per order is basket_size^2 with TPC-H
    baskets capped at 7 lineitems — the intermediate is ~20x the item
    table, never |parts|^2. Part and pair supports are map-side-
    combined hash aggregates; the single-row order count stays INSIDE
    the plan as a broadcast crossJoin (the sampling.py spread pattern)
    rather than a separate collect() job; the shared basket exchange
    is reused across the consuming chains at runtime (ReuseExchange).
    The final top-K lowers to TakeOrdered with (part_a, part_b)
    tie-breaks so both engines cut the same prefix. At real retail
    scale the standard refinement is capping basket size (a 10k-item
    basket contributes 5e7 pairs) — the plan shape is unchanged."""
    baskets = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
    )
    n_orders = baskets.agg(F.count(F.lit(1)).alias("n"))
    part_supp = (
        baskets.select(F.explode("parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("supp"))
    )
    pair_supp = (
        baskets.select(F.explode("parts").alias("part_a"), F.col("parts"))
        .select(
            "part_a",
            F.explode(
                F.filter(F.col("parts"), lambda p: p > F.col("part_a"))
            ).alias("part_b"),
        )
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("pair_orders"))
    )
    sa = part_supp.select(
        F.col("l_partkey").alias("part_a"), F.col("supp").alias("supp_a")
    )
    sb = part_supp.select(
        F.col("l_partkey").alias("part_b"), F.col("supp").alias("supp_b")
    )
    return (
        pair_supp.join(sa, "part_a")
        .join(sb, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            F.col("pair_orders").cast("long").alias("pair_orders"),
            F.round(
                F.col("pair_orders")
                * F.col("n")
                / (F.col("supp_a").cast("double") * F.col("supp_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("pair_orders").desc(), "part_a", "part_b")
        .limit(BASKET_TOP_K)
    )
