"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, sorted
column names, and cell values (rows sorted canonically; exact equality,
with float diffs reported so near-misses are visible before the driver
hashes them).

Usage: python scripts/oracle_check.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

try:  # engine import: resolves via `pip install -e .` / `setup.py develop`
    import super_store_datawarehouse_spark  # noqa: F401
except ImportError:  # raw checkout without an editable install
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
else:
    # __spark_entry__ (the driver-contract adapter) lives at the repo
    # root by contract, outside the installed package — always reachable
    # relative to this script, installed or not.
    if os.path.dirname(os.path.dirname(os.path.abspath(__file__))) not in sys.path:
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from super_store_datawarehouse_spark.session import (
    get_spark,
    release_scoped_caches,
)
from super_store_datawarehouse_spark.sources.testdata import TESTDATA_TABLES

import __spark_entry__ as entrymod


def canon(rows: list[tuple]) -> list[tuple]:
    def key(row: tuple) -> tuple:
        return tuple("\x00None" if v is None else str(v) for v in row)

    return sorted(rows, key=key)


def compare(name: str, spark_rows, duck_rows, cols) -> list[str]:
    problems: list[str] = []
    if len(spark_rows) != len(duck_rows):
        return [f"row count: spark={len(spark_rows)} duckdb={len(duck_rows)}"]
    max_float_diff = 0.0
    n_exact_mismatch = 0
    example = None
    for srow, drow in zip(canon(spark_rows), canon(duck_rows)):
        for c, sv, dv in zip(cols, srow, drow):
            if sv == dv:
                continue
            if isinstance(sv, float) and isinstance(dv, float):
                if math.isnan(sv) and math.isnan(dv):
                    continue
                diff = abs(sv - dv)
                max_float_diff = max(max_float_diff, diff)
                n_exact_mismatch += 1
                if example is None:
                    example = (c, sv, dv)
            else:
                n_exact_mismatch += 1
                if example is None:
                    example = (c, sv, dv)
    if n_exact_mismatch:
        problems.append(
            f"{n_exact_mismatch} cell mismatches, max_float_diff={max_float_diff!r}, "
            f"example={example!r}"
        )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, builder in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = builder(spark, sf_dir)
            spark_cols = sorted(sdf.columns)
            spark_rows = [
                tuple(row[c] for c in spark_cols) for row in sdf.collect()
            ]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        finally:
            # operators register multi-consumer caches via scoped_cache;
            # the action above is their consumption window — release.
            release_scoped_caches()
        if name not in oracles:
            print(f"ok*   {name}: rows-only ({len(spark_rows)} rows, "
                  f"{time.time()-t0:.1f}s) — no oracle")
            continue
        try:
            ddf = con.sql(oracles[name])
            # The driver hashes values after an Arrow round-trip, where
            # DuckDB's 128-bit integers (HUGEINT, e.g. from SUM over any
            # integer column) serialize differently from Spark's int64 —
            # hash-mismatch even when Python-level values compare equal.
            # Catch that class here, before the driver does.
            wide = [
                f"{c}:{t}" for c, t in zip(ddf.columns, ddf.types)
                if "HUGEINT" in str(t).upper()
            ]
            if wide:
                print(f"FAIL  {name}: oracle emits 128-bit ints "
                      f"(CAST to BIGINT): {wide}")
                failures += 1
                continue
            duck_cols_raw = list(ddf.columns)
            duck_order = sorted(range(len(duck_cols_raw)), key=lambda i: duck_cols_raw[i])
            duck_cols = [duck_cols_raw[i] for i in duck_order]
            duck_rows = [tuple(r[i] for i in duck_order) for r in ddf.fetchall()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = []
        if spark_cols != duck_cols:
            problems.append(f"columns: spark={spark_cols} duckdb={duck_cols}")
        else:
            problems = compare(name, spark_rows, duck_rows, spark_cols)
        if problems:
            failures += 1
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"ok    {name}: {len(spark_rows)} rows match ({time.time()-t0:.1f}s)")
    print(f"\n{failures} failures / {len([n for n in qs if not only or n in only])} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
