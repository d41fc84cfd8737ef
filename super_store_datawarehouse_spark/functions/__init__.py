"""Expression builders: scalar functions and exact-arithmetic helpers."""

from super_store_datawarehouse_spark.functions.exact import cents, money_avg, money_sum
from super_store_datawarehouse_spark.functions.scalars import lost_value, year_month_label

__all__ = ["cents", "money_sum", "money_avg", "lost_value", "year_month_label"]
