"""Reporting layer: dependency-free SVG charts over query results."""

from super_store_datawarehouse_spark.reporting.svg import (  # noqa: F401
    bar_chart,
    line_chart,
    render_reference_report,
)
