"""Harness registry: named queries with optional DuckDB oracle SQL.

Each entry is ``name -> (builder, oracle_sql | None)`` where ``builder``
takes ``(spark, sf_dir)`` and returns a DataFrame. The driver runs the
Spark DataFrame and the oracle SQL side by side at sf0.01 and compares
row count + schema + order-insensitive value hash, so:

- every computed column is aliased identically on both sides;
- every ORDER BY inside a window / limit / string-agg carries unique
  tie-breaker keys (otherwise two correct engines can legally disagree);
- money aggregation goes through exact integer cents
  (``functions.exact``) so parallel float summation order can't produce
  last-ulp drift between engines (or between Spark reruns under AQE).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]

# name -> (builder, oracle_sql or None for rows-only checks)
HARNESS: dict[str, tuple[Builder, str | None]] = {}


def harness_query(name: str, oracle: str | None = None) -> Callable[[Builder], Builder]:
    """Register a harness query (decorator)."""

    def deco(fn: Builder) -> Builder:
        HARNESS[name] = (fn, oracle)
        return fn

    return deco
