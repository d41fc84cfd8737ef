"""Warehouse sinks (SURVEY §2.1 S6-S8).

- parquet writer: the set-oriented replacement for the reference's
  batched row INSERTs (etl.py:514-541 etc.).
- Excel export: the reference's ``generate_excel.py`` (one sheet per
  table). xlsx writing needs openpyxl/xlsxwriter, which this container
  lacks — gated behind an import-try with a CSV-per-table fallback so
  the export *capability* stays testable.
- rejects sink: the designed error-file path ("File: Errors.txt" in the
  BPMN diagrams; skip-and-count at etl.py:489-496) as a real table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

# export_tables is a COLLECT-side sink (a workbook is a driver-local
# artifact by nature): every sheet round-trips through toPandas(). The
# reference's largest table is ~10k rows (SURVEY §3.3); this cap is 10x
# that, mirroring reporting/svg.py's MAX_CHART_ROWS — an accidental
# fact-table export should fail loudly at the cap, not OOM the driver.
MAX_EXPORT_ROWS = 100_000


def write_parquet_tables(tables: dict[str, DataFrame], out_dir: str) -> None:
    for name, df in tables.items():
        df.write.mode("overwrite").parquet(os.path.join(out_dir, name))


def _collect_capped(name: str, df: DataFrame):
    """toPandas() bounded by MAX_EXPORT_ROWS, loud on overflow.

    The probe reads cap+1 rows through a limit, so the overflow check
    itself never materializes more than cap+1 rows driver-side.
    """
    pdf = df.limit(MAX_EXPORT_ROWS + 1).toPandas()
    if len(pdf) > MAX_EXPORT_ROWS:
        raise ValueError(
            f"export_tables: table {name!r} exceeds MAX_EXPORT_ROWS="
            f"{MAX_EXPORT_ROWS} — a workbook export is a driver-side "
            "collect and is meant for reference-scale dimension/report "
            "tables. Write large tables with write_parquet_tables / "
            "write_partitioned, or aggregate before exporting."
        )
    return pdf


def export_tables(tables: dict[str, DataFrame], out_path: str) -> str:
    """Export every table to one workbook (sheet per table), as the
    reference's generate_excel.py does — or CSV-per-table when no Excel
    writer library is installed. Collect-side, capped at
    MAX_EXPORT_ROWS per table (loud ValueError beyond).
    """
    try:
        import openpyxl  # noqa: F401

        with_excel = True
    except ImportError:
        try:
            import xlsxwriter  # noqa: F401

            with_excel = True
        except ImportError:
            with_excel = False

    if with_excel:
        import pandas as pd

        with pd.ExcelWriter(out_path) as writer:
            for name, df in tables.items():
                _collect_capped(name, df).to_excel(
                    writer, sheet_name=name[:31], index=False
                )
        return out_path

    # fallback: CSV directory next to the requested path
    out_dir = out_path + ".csvdir"
    os.makedirs(out_dir, exist_ok=True)
    for name, df in tables.items():
        _collect_capped(name, df).to_csv(
            os.path.join(out_dir, f"{name}.csv"), index=False
        )
    return out_dir


def write_rejects(rejects: DataFrame, out_dir: str) -> None:
    """Persist unresolved-key rows (left_anti output) as a rejects table."""
    rejects.write.mode("overwrite").parquet(os.path.join(out_dir, "_rejects"))


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], target_partitions: int | None = None
) -> None:
    """Hive-partitioned parquet write — the 100 TB fact-table layout.

    Partitioning by a date-derived column gives readers partition pruning
    (filters on the partition column never touch non-matching directories
    — visible as PartitionFilters in the scan plan) and dynamic partition
    pruning on joins. Reference-scale tables (≤10k rows) deliberately
    stay unpartitioned in write_parquet_tables: directory-per-value
    layouts below ~100 MB/partition cost more in small files than they
    save in pruning.

    ``target_partitions`` repartitions by the partition columns first so
    each directory gets few, large files instead of one file per task.
    """
    if target_partitions:
        from pyspark.sql import functions as F

        df = df.repartition(target_partitions, *[F.col(c) for c in partition_cols])
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_orc(df: DataFrame, path: str, partition_cols: list[str] | None = None) -> None:
    """ORC sink (Spark-native, zero extra deps). ORC carries the same
    columnar virtues as parquet — column pruning, predicate pushdown via
    min/max stripe stats and bloom indexes — and is the interchange
    format for Hive-lineage warehouses; an engine claiming "switch to
    us" completeness needs both directions.
    """
    w = df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.orc(path)


def read_orc(spark, path: str) -> DataFrame:
    """ORC scan; filters/pruning push down exactly as with parquet
    (verify via PushedFilters in the scan node)."""
    return spark.read.orc(path)


def delta_available() -> bool:
    """True when the delta-spark bindings are importable."""
    try:
        import delta  # noqa: F401
    except ImportError:
        return False
    return True


def write_delta_table(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ACID table sink via Delta Lake when the runtime carries
    delta-spark; parquet is the storage layer either way.

    Delta is the right sink at 100 TB (transactional overwrite,
    concurrent readers, OPTIMIZE/Z-ORDER compaction, time travel); this
    container lacks the package, so the capability is gated rather than
    stubbed silently — callers can branch on ``delta_available()`` and
    fall back to plain parquet + overwrite (same layout, weaker
    isolation).
    """
    if not delta_available():
        raise ImportError(
            "delta-spark not installed: use write_parquet_tables as the "
            "non-transactional fallback"
        )
    df.write.format("delta").mode(mode).save(path)


def merge_into_delta(
    spark, updates: DataFrame, path: str, key_cols: list[str]
) -> None:
    """MERGE (upsert) an update batch into a Delta table — the
    transactional twin of ``operators.cdc.apply_upserts`` (which is the
    engine's format-agnostic latest-wins merge)."""
    if not delta_available():
        raise ImportError("delta-spark not installed: use operators.cdc.apply_upserts")
    from delta.tables import DeltaTable

    target = DeltaTable.forPath(spark, path)
    cond = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
    (
        target.alias("t")
        .merge(updates.alias("s"), cond)
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )


def compact_parquet(
    spark, path: str, target_file_mb: int = 128, sort_by: list[str] | None = None
) -> int:
    """Small-file compaction: rewrite a parquet directory into files of
    roughly ``target_file_mb`` each, returning the new file count.

    Streaming/CDC sinks accrete many tiny files (one+ per microbatch);
    at scale that destroys scan throughput (footer reads + scheduler
    overhead dominate). Rewrite strategy: size the output file count
    from the actual on-disk bytes, then ``coalesce`` (no shuffle) —
    unless ``sort_by`` is given, in which case a ``repartitionByRange``
    + ``sortWithinPartitions`` lays rows out for min/max data skipping
    on the sort key (poor-man's clustering, same idea as OPTIMIZE ...
    ZORDER with one key). Writes to a temp dir then swaps.

    Crash-safety contract: POSIX has no atomic directory swap, so the
    two renames are not one step — but every crash point is now
    mechanically recoverable, and recovery is AUTOMATIC: this function
    (and :func:`recover_compact`, exported for ops/readers) first
    repairs any half-finished swap it finds. The protocol:

    1. write compacted copy to ``<path>__compacting`` (Spark emits
       ``_SUCCESS`` last, so a complete tmp is detectable)
    2. ``rename(path, <path>__old)``
    3. ``rename(tmp, path)``
    4. ``rmtree(old)``

    Crash during 1: live table untouched; stale tmp removed on next run.
    Crash between 2 and 3: live path briefly missing, but tmp is known-
    complete (it carries ``_SUCCESS``; step 2 only runs after the write
    finished) → recovery adopts tmp as the new live. Crash between 3
    and 4: table already live → recovery clears the leftover old copy.
    Concurrent readers can still hit the 2→3 gap (single-writer,
    maintenance-window semantics); for true reader isolation use
    ``sources.translog.txn_compact`` on a manifest-gated table or a full
    table format (Delta/Iceberg).
    """
    import shutil

    recover_compact(path)
    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, round(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    if sort_by:
        out = df.repartitionByRange(n_files, *sort_by).sortWithinPartitions(*sort_by)
    else:
        out = df.coalesce(n_files)
    tmp = path.rstrip("/") + "__compacting"
    out.write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "__old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return sum(
        1 for _, _, fs in os.walk(path) for f in fs if f.endswith(".parquet")
    )


def recover_compact(path: str) -> str | None:
    """Repair a ``compact_parquet`` swap interrupted at any crash point,
    leaving ``path`` a complete, readable table. Idempotent; safe to call
    when no compaction ever ran. Returns a short action string for
    logging, or None if nothing needed repair.

    Decision table (tmp = ``<path>__compacting``, old = ``<path>__old``):

    * live exists → any tmp/old leftovers are strictly redundant copies
      (pre-swap write, or post-swap cleanup crash): delete them.
    * live missing, tmp complete (``_SUCCESS`` present) → the crash hit
      between the two renames; the compacted copy is whole: adopt it.
    * live missing, tmp absent/incomplete, old exists → the crash hit
      mid-write or the tmp shape is untrustworthy: restore old.
    """
    import shutil

    tmp = path.rstrip("/") + "__compacting"
    old = path.rstrip("/") + "__old"
    if os.path.exists(path):
        action = None
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
            action = "removed stale tmp"
        if os.path.exists(old):
            shutil.rmtree(old)
            action = (action + " and old" ) if action else "removed leftover old"
        return action
    if os.path.exists(os.path.join(tmp, "_SUCCESS")):
        os.rename(tmp, path)
        if os.path.exists(old):
            shutil.rmtree(old)
        return "adopted completed compaction"
    if os.path.exists(old):
        os.rename(old, path)
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        return "restored pre-compaction table"
    return None


def write_with_metrics(
    df: DataFrame,
    path: str,
    metrics: dict | None = None,
    mode: str = "overwrite",
) -> dict:
    """Parquet write that returns pipeline metrics from the SAME job
    that wrote the data (``df.observe`` / ``Observation``).

    ``metrics`` maps output names to aggregate Columns (count/sum/min/
    max/null-count style). The accumulator-backed observation rides the
    write job, so at 100 TB you get row counts and checksums WITHOUT
    the second full scan a follow-up ``.count()`` would cost — the
    standard write-audit-publish pattern. Defaults to ``n_rows``.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    if metrics is None:
        metrics = {"n_rows": F.count(F.lit(1))}
    obs = Observation()
    observed = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    observed.write.mode(mode).parquet(path)
    return dict(obs.get)
