"""Data-quality expectations: a rule report over arbitrary frames.

The Great-Expectations-shaped contract a warehouse load runs before
publishing: each expectation is (name, frame, violation predicate); the
report is one row per expectation with the checked/violating row counts
and a pass flag. Cross-frame rules (FK totality, uniqueness,
inter-column date order) are expressed by preparing the frame first
(left join, group-count) so the predicate stays per-row.

Scale shape: each expectation is one aggregate over its frame — a
map-side partial count + single-row exchange, no wide shuffle beyond
what the preparation (join/groupBy) itself needs; the report union is
|checks| single-row frames. Nothing is collected; the report is a
DataFrame a sink or a circuit-breaker reads.

Extends the reference's load-time hygiene (reference etl.py drops
duplicate order lines and reports unmatched rejects during load) into
an explicit, reusable rule surface; no direct counterpart file.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expectations_report(checks: list[tuple[str, DataFrame, Column]]) -> DataFrame:
    """One report row per (check_name, frame, violation_condition).

    ``n_checked`` counts the frame's rows, ``n_violations`` counts rows
    where the condition is TRUE (NULL condition counts as a violation —
    an expectation that cannot be evaluated on a row is not satisfied
    by it), ``passed`` is ``n_violations == 0``. Output is sorted by
    check name so the report is deterministic.
    """
    if not checks:
        raise ValueError("expectations_report needs at least one check")
    report = None
    for name, df, cond in checks:
        row = df.agg(
            F.count(F.lit(1)).alias("n_checked"),
            # coalesce: SUM over an empty frame is NULL, but an empty
            # frame has zero violations
            F.coalesce(
                F.sum(F.when(F.coalesce(cond, F.lit(True)), 1).otherwise(0)),
                F.lit(0),
            ).alias("n_violations"),
        ).select(
            F.lit(name).alias("check_name"),
            F.col("n_checked").cast("long"),
            F.col("n_violations").cast("long"),
            (F.col("n_violations") == 0).alias("passed"),
        )
        report = row if report is None else report.unionByName(row)
    return report.orderBy("check_name")
