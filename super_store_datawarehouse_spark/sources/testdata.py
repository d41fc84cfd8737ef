"""Driver-generated TPC-H-ish parquet tables (see /root/repo/TESTDATA.md).

One parquet file per table under ``{sf_dir}/{name}.parquet``. These are the
inputs for the correctness harness (``__spark_entry__.py``) and ``bench.py``.

At 100 TB these reads stay efficient because everything downstream is
expressed declaratively: Catalyst pushes filters and column pruning into the
parquet scan (verify with ``df.explain`` → ``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Session-level table catalog: the testdata directories are immutable, so
# the unresolved scan plan for a table can be built once per SparkSession
# and reused. Re-running spark.read.parquet per query costs ~100-300 ms of
# file listing + footer reads + py4j round trips — pure fixed overhead on
# every harness/bench invocation (the same reason real deployments read
# through a catalog, not raw paths).
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Columnar scan; schema comes from parquet.

    The events table is written with TIMESTAMP(NANOS), which Spark's
    parquet reader rejects; read nanos as long (runtime-settable legacy
    conf, so this works in any caller's session) and convert to a
    microsecond TimestampType with integer DIV — double arithmetic would
    lose precision above 2^53 ns.
    """
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000").cast("long"))
        )
    else:
        df = spark.read.parquet(path)
    _TABLE_CACHE[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
