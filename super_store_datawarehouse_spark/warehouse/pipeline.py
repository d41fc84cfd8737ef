"""End-to-end warehouse build: CSV → merge → dims → facts → parquet.

One call materializes the same 15 tables the reference loads into MySQL
(etl.py:1187-1201), as lazy DataFrames keyed by the reference table
names. Dimensions are cached before fact construction: every fact plan
broadcasts dimension key sets, and caching prevents re-deriving each
dim once per fact (6× at reference shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from super_store_datawarehouse_spark.sources.superstore import DEFAULT_CSV_PATH, read_superstore_csv
from super_store_datawarehouse_spark.warehouse import dims, facts
from super_store_datawarehouse_spark.warehouse.ingest import merge_duplicate_order_lines


def build_warehouse(
    spark: SparkSession, csv_path: str = DEFAULT_CSV_PATH, cache: bool = True
) -> dict[str, DataFrame]:
    """Build all 15 warehouse tables as DataFrames (lazy until acted on)."""
    raw = read_superstore_csv(spark, csv_path)
    lines = merge_duplicate_order_lines(raw)
    if cache:
        lines = lines.cache()

    calendar, calendar_month = dims.build_calendar_dims(lines)
    customer = dims.build_customer_dim(lines)
    region, state, location = dims.build_geography_dims(lines)
    shipping = dims.build_shipping_dim(lines)
    category, product = dims.build_product_dims(lines)

    dim_tables = {
        "Calendar": calendar,
        "CalendarMonth": calendar_month,
        "Customer": customer,
        "Region": region,
        "State": state,
        "Location": location,
        "Category": category,
        "Product": product,
        "Shipping": shipping,
    }
    if cache:
        dim_tables = {k: v.cache() for k, v in dim_tables.items()}
        calendar = dim_tables["Calendar"]
        calendar_month = dim_tables["CalendarMonth"]
        customer = dim_tables["Customer"]
        region = dim_tables["Region"]
        state = dim_tables["State"]
        location = dim_tables["Location"]
        category = dim_tables["Category"]
        product = dim_tables["Product"]
        shipping = dim_tables["Shipping"]

    fact_tables = {
        "Item": facts.build_item_fact(lines, customer, product, calendar, location),
        "Orders": facts.build_orders_fact(lines, customer, calendar, location, shipping),
        "OrderM": facts.build_order_m_fact(lines, calendar_month, state),
        "ProductPerformance": facts.build_product_performance_fact(
            lines, category, state, calendar_month
        ),
        "ShippingBehavior": facts.build_shipping_behavior_fact(
            lines, shipping, category, region
        ),
        "ShippingBehaviorS": facts.build_shipping_behavior_s_fact(
            lines, shipping, category, state
        ),
    }
    return {**dim_tables, **fact_tables}


def write_warehouse(
    tables: dict[str, DataFrame], out_dir: str, fmt: str = "parquet"
) -> str:
    """Persist every table columnar (the reference's INSERT sink, S6).

    Set-oriented columnar writes — the reference's 500/50/10/100-row
    commit batching (etl.py:538-541 etc.) has no equivalent cost here.

    ``fmt``: ``"parquet"`` (default), ``"orc"``, or ``"delta"`` — the
    stated production approach is "Spark SQL + DataFrame API over
    Delta/Parquet", so the Delta toggle is first-class. When
    ``fmt="delta"`` and the runtime lacks delta-spark (this sandbox
    does), the write FALLS BACK LOUDLY to parquet — a logged warning
    per call, same layout, weaker isolation — mirroring the Excel/Avro
    gates: capability gated, never silently stubbed. Returns the format
    actually written.
    """
    if fmt == "delta":
        from super_store_datawarehouse_spark.sources.sinks import (
            delta_available,
            write_delta_table,
        )

        if delta_available():
            for name, df in tables.items():
                write_delta_table(df, f"{out_dir}/{name}")
            return "delta"
        import warnings

        warnings.warn(
            "write_warehouse(fmt='delta'): delta-spark is not installed in "
            "this runtime — falling back to plain parquet (same columnar "
            "layout, no transaction log / time travel / MERGE). Install "
            "delta-spark and set the catalog extensions to get ACID tables.",
            RuntimeWarning,
            stacklevel=2,
        )
        fmt = "parquet"
    if fmt not in ("parquet", "orc"):
        raise ValueError(f"write_warehouse: unknown format {fmt!r}")
    for name, df in tables.items():
        df.write.mode("overwrite").format(fmt).save(f"{out_dir}/{name}")
    return fmt


def register_warehouse_views(tables: dict[str, DataFrame]) -> None:
    """Expose all tables to spark.sql under their reference names."""
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
