"""Preprocessing: duplicate order-line merge (SURVEY §2.2 P5 + A12).

Reference: ``etl.py:57-134`` — rows sharing (Order ID, Product ID) are
merged: Quantity/Sales/Profit summed, Discount replaced by the
quantity-weighted mean Σ(d·q)/Σq (``etl.py:110-112``), every other
attribute taken from the group's first row (``etl.py:102``). The
reference routes only count>1 groups through a slow path and concats
them back; one groupBy with min_by-based "first row by original
position" expresses the same thing in a single pass (9,994 → 9,986 rows
on the reference CSV).

"First row" is pinned to the minimum Row ID — the reference relies on
pandas preserving file order, which has no meaning under parallel scan;
min_by gives the identical row deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Attributes carried from the group's first row during the merge.
FIRST_ROW_ATTRS = (
    "order_date",
    "ship_date",
    "ship_mode",
    "customer_code",
    "customer_name",
    "segment",
    "country",
    "city",
    "state",
    "postal_code",
    "region",
    "category",
    "sub_category",
    "product_name",
)


def merge_duplicate_order_lines(lines: DataFrame) -> DataFrame:
    """Collapse duplicate (order_id, product_code) lines into one row."""
    qty = F.col("quantity").cast("double")
    firsts = [F.min_by(c, "row_id").alias(c) for c in FIRST_ROW_ATTRS]
    merged = lines.groupBy("order_id", "product_code").agg(
        F.min("row_id").alias("row_id"),
        *firsts,
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("quantity").alias("quantity"),
        F.sum("sales").alias("sales"),
        F.sum("profit").alias("profit"),
        # quantity-weighted discount; exact passthrough for singleton groups
        # (d·q/q re-rounds in IEEE — don't perturb the 99.9% common case)
        F.min_by("discount", "row_id").alias("first_discount"),
        (F.sum(F.col("discount") * qty) / F.sum(qty)).alias("weighted_discount"),
    )
    return merged.withColumn(
        "discount",
        F.when(F.col("n_lines") == 1, F.col("first_discount")).otherwise(
            F.col("weighted_discount")
        ),
    ).drop("first_discount", "weighted_discount", "n_lines")
