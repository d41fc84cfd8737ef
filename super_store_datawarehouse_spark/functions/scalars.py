"""Scalar expression builders mirroring the reference's derived columns.

Reference semantics (SURVEY.md §2.8):

- lost_value (F6): ``sales/(1-discount) - sales`` guarded by ``discount < 1``
  else 0 — the revenue foregone to discounting (reference: ``etl.py:503-509``,
  Facts Dictionary string 159).
- year-month label (F11): ``concat(year, '-', lpad(month, 2, '0'))``
  (reference: client-side ``astype(str)+zfill`` in ``Data_Analysis.ipynb:85``).

All are native Column expressions — Catalyst-optimizable, whole-stage
codegen'd, no Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def lost_value(sales: Column | str, discount: Column | str) -> Column:
    """Revenue lost to discount: sales/(1-discount) - sales, 0 when discount>=1."""
    s = F.col(sales) if isinstance(sales, str) else sales
    d = F.col(discount) if isinstance(discount, str) else discount
    return F.when(d < 1, s / (1 - d) - s).otherwise(F.lit(0.0))


def year_month_label(year: Column | str, month: Column | str) -> Column:
    """'YYYY-MM' label from integer year and month columns."""
    y = F.col(year) if isinstance(year, str) else year
    m = F.col(month) if isinstance(month, str) else month
    return F.concat_ws("-", y.cast("string"), F.lpad(m.cast("string"), 2, "0"))
