"""Nine dimension builders (SURVEY §2 P1/P4/U1/F12; reference etl.py:137-441).

Membership of every dimension is a projected dropDuplicates over the
(merged) source lines; surrogate keys are row_number over the natural
key (SURVEY §7.3: deterministic and stable across runs, unlike the
reference's insertion-order AUTO_INCREMENT — key *values* may differ
from the reference, which is fine because keys are internal identity;
all correctness comparisons join on natural keys).

Scale note: each dim is ≤ ~2k rows at reference scale, so the global
row_number's single-partition exchange is trivially cheap; for a
100 TB-scale dimension swap in zipWithIndex/monotonically_increasing_id
plus an offset fix-up, keeping the same natural-key ordering contract.

Parent-level lookups (State→Region, Location→State, Product→Category)
replace the reference's read-back-after-insert round-trips
(etl.py:296-297, 321-322, 390-391) with broadcast joins in the same DAG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _sk(*order_cols: str):
    """Surrogate key: 1-based row_number over the natural-key order."""
    return F.row_number().over(Window.orderBy(*order_cols)).cast("long")


def build_calendar_dims(lines: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Calendar + CalendarMonth from the union of order and ship dates.

    Reference: etl.py:163-251 — date domain is set(order)∪set(ship)
    (U1), year ids enumerate sorted years, CalendarMonth rows are the
    distinct (year, month) pairs of that domain in chronological order,
    and Calendar.month_id references them.
    """
    dates = (
        lines.select(F.col("order_date").alias("full_date"))
        .union(lines.select(F.col("ship_date")))
        .distinct()
    )
    cal = dates.select(
        "full_date",
        F.year("full_date").alias("year_number"),
        F.month("full_date").alias("month_number"),
        F.date_format("full_date", "MMMM").alias("month_name"),
        F.dayofmonth("full_date").alias("day_number"),
    ).withColumn("year_id", F.dense_rank().over(Window.orderBy("year_number")))

    months = (
        cal.select("year_id", "year_number", "month_number", "month_name")
        .distinct()
        .withColumn("calendar_month_id", _sk("year_number", "month_number"))
        .select(
            "calendar_month_id",
            F.col("month_number").alias("calendar_month_number"),
            F.col("month_name").alias("calendar_month_name"),
            "year_id",
            "year_number",
        )
    )

    month_keys = months.select(
        F.col("calendar_month_id").alias("month_id"),
        F.col("year_number").alias("_y"),
        F.col("calendar_month_number").alias("_m"),
    )
    calendar = (
        cal.withColumn("calendar_id", _sk("full_date"))
        .join(
            F.broadcast(month_keys),
            (F.col("year_number") == F.col("_y")) & (F.col("month_number") == F.col("_m")),
        )
        .select(
            "calendar_id",
            "full_date",
            "year_id",
            "year_number",
            "month_id",
            "month_number",
            "month_name",
            F.col("day_number").alias("day_id"),
            "day_number",
        )
    )
    return calendar, months


def build_customer_dim(lines: DataFrame) -> DataFrame:
    """Reference: etl.py:255-271 — distinct (code, name, segment)."""
    return (
        lines.select(
            "customer_code",
            "customer_name",
            "segment",
        )
        .distinct()
        .withColumn("customer_id", _sk("customer_code", "customer_name", "segment"))
        .select("customer_id", "customer_code", "customer_name", "segment")
    )


def build_geography_dims(lines: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Region → State → Location chain (reference: etl.py:275-352).

    Level ids (country_id, city_id) mirror the reference's enumerate
    maps (etl.py:137-159) with natural-key ordering instead of
    first-appearance order.
    """
    region = (
        lines.select(F.col("region").alias("region_name"), F.col("country").alias("country_name"))
        .distinct()
        .withColumn("region_id", _sk("region_name"))
        .withColumn(
            "country_id",
            F.dense_rank().over(Window.orderBy("country_name")),
        )
        .select("region_id", "region_name", "country_id", "country_name")
    )

    state = (
        lines.select(
            F.col("state").alias("state_name"),
            F.col("region").alias("region_name"),
            F.col("country").alias("country_name"),
        )
        .distinct()
        .withColumn("state_id", _sk("state_name"))
        .join(F.broadcast(region.select("region_id", "region_name", "country_id")), "region_name")
        .select("state_id", "state_name", "region_id", "region_name", "country_id", "country_name")
    )

    city_ids = (
        lines.select(F.col("city").alias("city_name"), F.col("state").alias("state_name"))
        .distinct()
        .withColumn("city_id", F.row_number().over(Window.orderBy("city_name", "state_name")))
    )

    location = (
        lines.select(
            F.col("postal_code"),
            F.col("city").alias("city_name"),
            F.col("state").alias("state_name"),
            F.col("country").alias("country_name"),
            F.col("region").alias("region_name"),
        )
        .distinct()
        .withColumn("location_id", _sk("postal_code", "city_name", "state_name"))
        .join(
            F.broadcast(
                state.select("state_id", "state_name", "region_id", "country_id")
            ),
            "state_name",
        )
        .join(F.broadcast(city_ids), ["city_name", "state_name"])
        .select(
            "location_id",
            F.col("postal_code").alias("location_code"),
            "country_id",
            "country_name",
            "region_id",
            "region_name",
            "state_id",
            "state_name",
            "city_id",
            "city_name",
            "postal_code",
        )
    )
    return region, state, location


def build_shipping_dim(lines: DataFrame) -> DataFrame:
    """Reference: etl.py:356-369 — distinct ship modes."""
    return (
        lines.select("ship_mode")
        .distinct()
        .withColumn("shipping_id", _sk("ship_mode"))
        .select("shipping_id", "ship_mode")
    )


def build_product_dims(lines: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Category + Product (reference: etl.py:373-420).

    Product membership is the distinct 4-tuple (code, name, category,
    sub-category) — the same Product ID can appear with different names,
    so product_code is NOT unique (1,894 rows vs 1,862 codes on the
    reference CSV; SURVEY §1.4).
    """
    category = (
        lines.select(F.col("category").alias("category_name"))
        .distinct()
        .withColumn("category_id", _sk("category_name"))
        .select("category_id", "category_name")
    )

    sub_ids = (
        lines.select(F.col("sub_category").alias("sub_category_name"))
        .distinct()
        .withColumn(
            "sub_category_id", F.row_number().over(Window.orderBy("sub_category_name"))
        )
    )

    product = (
        lines.select(
            F.col("product_code"),
            F.col("product_name"),
            F.col("category").alias("category_name"),
            F.col("sub_category").alias("sub_category_name"),
        )
        .distinct()
        .withColumn("product_id", _sk("product_code", "product_name"))
        .join(F.broadcast(category), "category_name")
        .join(F.broadcast(sub_ids), "sub_category_name")
        .select(
            "product_id",
            "product_code",
            "product_name",
            "category_id",
            "category_name",
            "sub_category_id",
            "sub_category_name",
        )
    )
    return category, product
