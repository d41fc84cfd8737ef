"""Streaming jobs: results must equal their batch equivalents."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_hourly_counts_stream_equals_batch(spark):
    from super_store_datawarehouse_spark.plans.extensions import x10_events_hourly
    from super_store_datawarehouse_spark.streaming.jobs import hourly_counts_stream

    stream_rows = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in hourly_counts_stream(spark, SF_DIR).collect()
    }
    batch_rows = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in x10_events_hourly(spark, SF_DIR).collect()
    }
    assert stream_rows == batch_rows


def test_dedup_stream_preserves_distinct_ids(spark):
    from super_store_datawarehouse_spark.sources.testdata import load_table
    from super_store_datawarehouse_spark.streaming.jobs import dedup_events_stream

    out = dedup_events_stream(spark, SF_DIR)
    n_distinct = (
        load_table(spark, SF_DIR, "events").select("event_id").distinct().count()
    )
    assert out.count() == n_distinct
    assert out.groupBy("event_id").count().filter(F.col("count") > 1).count() == 0


def test_user_running_counts_stream(spark):
    from super_store_datawarehouse_spark.sources.testdata import load_table
    from super_store_datawarehouse_spark.streaming.jobs import user_running_counts_stream

    got = {
        r["user_id"]: r["n_events"]
        for r in user_running_counts_stream(spark, SF_DIR).collect()
    }
    want = {
        r["user_id"]: r["n"]
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
