"""Grouped-aggregate pandas UDFs (the PySpark UDAF surface, SURVEY §2.9).

The reference's only aggregation surface is SQL aggregates (MySQL
``Data_Analysis.ipynb`` GROUP BY cells); Spark's native extension point
for *custom* aggregates from Python is the GROUPED_AGG pandas UDF —
Arrow-batched, whole group per call. Spark refuses to mix GROUPED_AGG
UDFs with built-in (JVM) aggregates in one ``agg()``
(INVALID_PANDAS_UDF_PLACEMENT), so companion stats ride along as
further pandas UDAFs in the same pass.

Determinism rule for this codebase: a custom aggregate must be
ORDER-INDEPENDENT (selection/sorting inside, no float accumulation in
arrival order), otherwise reruns under AQE/repartitioning produce
different last-ulp results and the DuckDB twin can't verify it.
Median/MAD are pure selection + one exact midpoint, so they hash-match
cross-engine on integer-cents inputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


def mad_cents_udaf():
    """Median-absolute-deviation over an integer-cents column → double.

    Robust dispersion (the outlier-resistant sibling of stddev) — the
    quality-score spread statistic a data pipeline reports per source.
    np.median is (n-1)·p linear interpolation at p=.5, identical to
    DuckDB ``median`` / Spark ``percentile`` on the same ints; cents
    magnitudes keep every intermediate exact in float64.

    Scale: each group materializes in one Arrow batch on one executor —
    fine for group cardinalities into the tens of millions; beyond that
    use the two-pass SQL formulation (per-group median join) that the
    oracle twin itself demonstrates.
    """

    @pandas_udf("double")
    def mad_cents(v: pd.Series) -> float:
        a = v.to_numpy(dtype=np.float64)
        med = np.median(a)
        return float(np.median(np.abs(a - med)))

    return mad_cents


def count_udaf():
    """Plain COUNT as a GROUPED_AGG pandas UDF, so it can share an
    ``agg()`` with other pandas UDAFs (built-in aggregates can't)."""

    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return int(len(v))

    return n_rows
