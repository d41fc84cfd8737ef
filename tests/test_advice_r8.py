"""Round-8 ADVICE regression tests.

1. ``brute_force_topk`` must not evict a CALLER-persisted queries frame:
   its internal pushdown cache-barrier persists/unpersists only when the
   caller had not already persisted (ADVICE r7 #3 — the finally-unpersist
   silently dropped the caller's cache entry).
2. ``_ProgressCounter`` (the ``recentProgress``-cap fix, ADVICE r7 #4)
   counts non-empty batches correctly past the 100-entry cap that
   ``query.recentProgress`` is subject to, and filters by query id.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from super_store_datawarehouse_spark.operators import similarity
from super_store_datawarehouse_spark.sources.testdata import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_brute_force_topk_preserves_caller_cache(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).persist()
    try:
        q.count()  # materialize the caller's cache
        assert q.is_cached
        out = similarity.brute_force_topk(emb, q, k=3)
        assert out.count() > 0
        # the operator's internal barrier must not have evicted it
        assert q.is_cached
    finally:
        q.unpersist()


def test_brute_force_topk_unpersists_own_barrier(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    assert not q.is_cached
    out = similarity.brute_force_topk(emb, q, k=3)
    assert out.count() > 0
    assert not q.is_cached  # its scoped barrier was released


def test_progress_counter_not_capped_at_100(spark):
    """The count derives from the listener stream, not recentProgress:
    feed >100 synthetic progress entries and expect them ALL counted
    (recentProgress would have retained only the last 100)."""
    from super_store_datawarehouse_spark.streaming.jobs import _ProgressCounter

    counter = _ProgressCounter(spark)
    try:
        qid = "11111111-2222-3333-4444-555555555555"
        other = "99999999-8888-7777-6666-555555555555"
        # 150 non-empty + 7 empty batches for our query, 5 for another
        counter._seen.extend((qid, i, 40000) for i in range(150))
        counter._seen.extend((qid, 150 + i, 0) for i in range(7))
        counter._seen.extend((other, i, 123) for i in range(5))

        class _FakeQuery:
            id = qid
            lastProgress = {"id": qid, "batchId": 156}

        assert counter.non_empty_batches(_FakeQuery()) == 150
    finally:
        counter.remove()


def test_sessionize_batch_count_matches_listener(tmp_path, spark):
    """End-to-end: the returned batch count equals the number of staged
    non-empty source files (maxFilesPerTrigger=1 => one batch each)."""
    from super_store_datawarehouse_spark.streaming.jobs import (
        stream_sessionize_to_parquet,
    )

    ev = load_table(spark, SF_DIR, "events")
    src = tmp_path / "src"
    os.makedirs(src, exist_ok=True)
    for i in range(3):
        stage = tmp_path / f"stage_{i}"
        ev.filter(F.col("event_id") % 3 == i).coalesce(
            1
        ).write.parquet(str(stage), mode="overwrite")
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        os.rename(str(stage / part), str(src / f"events_b{i}.parquet"))
    n = stream_sessionize_to_parquet(
        spark,
        str(src),
        str(tmp_path / "out"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    assert n == 3
