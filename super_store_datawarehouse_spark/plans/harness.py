"""Parity harness queries — one per operator family in SURVEY.md §2,
transposed onto the driver's TPC-H-ish tables (FIXTURES.md §F3 mapping).

Each query exists as an idiomatic DataFrame plan (what the engine runs)
plus a DuckDB oracle SQL twin (what the driver verifies against).
Reference provenance is cited per query (file:line into /root/reference).

Scale notes (local[32] tests, 1000-executor design):

- dimension-sized tables (region, nation, part, supplier) join via
  broadcast — no shuffle on the fact side;
- aggregations are expressed so Catalyst plans partial (map-side)
  HashAggregate before the exchange;
- filters sit directly on scan columns so they push into the parquet
  reader (verify: ``PushedFilters`` in ``.explain("formatted")``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from super_store_datawarehouse_spark.functions.exact import cents, money_sum
from super_store_datawarehouse_spark.plans.registry import harness_query
from super_store_datawarehouse_spark.sources.testdata import load_table


# --------------------------------------------------------------------------
# q01 — flagship: top-10 best-selling parts (SURVEY §2 J5+A8+O2)
# Reference: Data_Analysis.ipynb:198-207 (Q1 "top 10 best-selling products":
# Item ⋈ Product, SUM(quantity), ORDER BY DESC LIMIT 10).
# --------------------------------------------------------------------------
@harness_query(
    "q01_top_parts_by_quantity",
    oracle="""
    SELECT p.p_name,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_name
    ORDER BY total_qty DESC, p.p_name
    LIMIT 10
    """,
)
def q01_top_parts_by_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy("p_name")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        )
        .orderBy(F.desc("total_qty"), "p_name")
        .limit(10)
    )


# --------------------------------------------------------------------------
# q02 — pricing summary: grouped multi-aggregate scan (SURVEY §2 A2/A8).
# Reference: the ETL's grouped multi-agg loads (etl.py:710-715, 845-849);
# shape of TPC-H Q1. Partial aggregation (map-side combine) before shuffle.
# --------------------------------------------------------------------------
@harness_query(
    "q02_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_disc_price,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_charge,
           CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_discount,
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q02_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            money_sum("l_extendedprice", "sum_base_price"),
            money_sum(disc_price, "sum_disc_price"),
            money_sum(charge, "sum_charge"),
            money_sum("l_discount", "sum_discount"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# q03 — ROLLUP + GROUPING subtotal row (SURVEY §2 A9).
# Reference: Data_Analysis.ipynb:258-265 — GROUP BY segment WITH ROLLUP,
# IF(GROUPING(segment),'TOTAL',segment). Catalyst-native rollup.
# --------------------------------------------------------------------------
@harness_query(
    "q03_rollup_status",
    oracle="""
    SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'TOTAL' ELSE o_orderstatus END AS status,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_sales,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY ROLLUP(o_orderstatus)
    ORDER BY status
    """,
)
def q03_rollup_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    status = (
        F.when(F.grouping("o_orderstatus") == 1, F.lit("TOTAL"))
        .otherwise(F.col("o_orderstatus"))
        .alias("status")
    )
    return (
        orders.rollup("o_orderstatus")
        .agg(
            status,
            money_sum("o_totalprice", "total_sales"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select("status", "total_sales", "n_orders")
        .orderBy("status")
    )


# --------------------------------------------------------------------------
# q04 — running total per partition, default RANGE frame (SURVEY §2 W2).
# Reference: Data_Analysis.ipynb:389-397 (Q2: SUM(sales) OVER
# (PARTITION BY state ORDER BY full_date)). Pre-aggregating to one row per
# (nation, day) keeps the window ORDER BY unique → deterministic, and
# shrinks the windowed input by ~orders/day before the sort.
# --------------------------------------------------------------------------
@harness_query(
    "q04_running_total_by_nation",
    oracle="""
    WITH daily AS (
      SELECT n.n_name, CAST(o.o_orderdate AS DATE) AS order_date,
             SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS sales_cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name, CAST(o.o_orderdate AS DATE)
    )
    SELECT n_name, order_date,
           CAST(SUM(sales_cents) OVER (PARTITION BY n_name ORDER BY order_date) AS DOUBLE) / 100.0 AS running_sales
    FROM daily
    ORDER BY n_name, order_date
    """,
)
def q04_running_total_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    daily = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", F.col("o_orderdate").cast("date").alias("order_date"))
        .agg(F.sum(cents("o_totalprice")).alias("sales_cents"))
    )
    w = Window.partitionBy("n_name").orderBy("order_date")
    return (
        daily.select(
            "n_name",
            "order_date",
            (F.sum("sales_cents").over(w).cast("double") / 100.0).alias("running_sales"),
        )
        .orderBy("n_name", "order_date")
    )


# --------------------------------------------------------------------------
# q05 — RANK over grouped sums (SURVEY §2 W1).
# Reference: Data_Analysis.ipynb:318-333 (Q6: RANK() OVER (ORDER BY
# total_profit DESC) on a subquery of grouped sums). The unpartitioned
# window runs on the 25-row aggregate, never on the fact table.
# --------------------------------------------------------------------------
@harness_query(
    "q05_rank_nations_by_revenue",
    oracle="""
    WITH agg AS (
      SELECT n.n_name,
             SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS rev_cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name
    )
    SELECT n_name, CAST(rev_cents AS DOUBLE) / 100.0 AS total_revenue,
           CAST(RANK() OVER (ORDER BY rev_cents DESC) AS BIGINT) AS revenue_rank
    FROM agg
    ORDER BY revenue_rank, n_name
    """,
)
def q05_rank_nations_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    agg = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(cents("o_totalprice")).alias("rev_cents"))
    )
    w = Window.orderBy(F.desc("rev_cents"))
    return (
        agg.select(
            "n_name",
            (F.col("rev_cents").cast("double") / 100.0).alias("total_revenue"),
            F.rank().over(w).cast("long").alias("revenue_rank"),
        )
        .orderBy("revenue_rank", "n_name")
    )


# --------------------------------------------------------------------------
# q06 — per-order rollup (SURVEY §2 A4).
# Reference: etl.py:580-639 (load_orders_fact_table: groupby("Order ID"),
# per-group sums + order-level attrs). first() is replaced by a join back
# to the order row — deterministic, unlike pandas' first-row-as-template.
# --------------------------------------------------------------------------
@harness_query(
    "q06_order_rollup",
    oracle="""
    SELECT o.o_orderkey, o.o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_orderstatus
    """,
)
def q06_order_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
        money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
    )
    return orders.join(per_order, orders.o_orderkey == per_order.l_orderkey).select(
        "o_orderkey", "o_orderstatus", "n_lines", "total_qty", "revenue"
    )


# --------------------------------------------------------------------------
# q07 — date-difference aggregation (SURVEY §2 F5 + J7 role analog).
# Reference: Data_Analysis.ipynb:456-465 (Q7: AVG(DATEDIFF(ship, order))
# via the role-playing Calendar self-join); etl.py:953-957 shipping_delay.
# --------------------------------------------------------------------------
@harness_query(
    "q07_shipping_delay_by_priority",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(SUM(date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE))) AS DOUBLE)
             / COUNT(*) AS avg_delay_days,
           COUNT(*) AS n_lines
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def q07_shipping_delay_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            (F.sum(delay).cast("double") / F.count(F.lit(1))).alias("avg_delay_days"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# q08 — duplicate-line merge with quantity-weighted discount
# (SURVEY §2 P5 + A12 + P3).
# Reference: etl.py:57-134 — group order-lines by (Order ID, Product ID);
# for groups of size>1 sum the measures and take the quantity-weighted
# mean of Discount (Σ d·q / Σ q, etl.py:110-112). The reference's
# two-path "only touch dup groups" dance collapses into one groupBy.
# Discounts live on a 0.01 grid, so weighting in integer discount-cents
# keeps both engines bit-exact.
# --------------------------------------------------------------------------
@harness_query(
    "q08_dup_merge_weighted_discount",
    oracle="""
    SELECT l_orderkey, l_partkey,
           CAST(COUNT(*) AS BIGINT) AS n_merged,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS quantity,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sales,
           CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE)
             / CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / 100.0 AS weighted_discount
    FROM lineitem
    GROUP BY l_orderkey, l_partkey
    HAVING COUNT(*) > 1
    """,
)
def q08_dup_merge_weighted_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("long")
    return (
        li.groupBy("l_orderkey", "l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_merged"),
            F.sum(qty).alias("quantity"),
            money_sum("l_extendedprice", "sales"),
            (
                F.sum(cents("l_discount") * qty).cast("double")
                / F.sum(qty).cast("double")
                / 100.0
            ).alias("weighted_discount"),
        )
        .filter(F.col("n_merged") > 1)
    )
