"""Round-12 optimization tests.

- VERDICT r11 #7: the streaming sinks' in-state marker read must be an
  O(1)-row slice (the marker columns are constant per publish), not a
  full-state aggregate — while keeping the fresh/0-row/legacy fallbacks
  the sinks rely on for exactly-once and migration.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from super_store_datawarehouse_spark.streaming.jobs import _read_state_meta


def test_state_meta_reads_marker_from_one_row_slice(tmp_path, spark):
    out = str(tmp_path / "state")
    # constant marker columns over a multi-row state (what
    # _publish_state_atomic callers write)
    spark.range(0, 500).select(
        F.col("id").alias("value"),
        F.lit(7).cast("long").alias("applied_batch"),
        F.lit("qid-abc").alias("query_id"),
        F.lit(32).cast("long").alias("k_now"),
    ).write.mode("overwrite").parquet(out)
    state, meta = _read_state_meta(spark, out, extra=(("k_now", 16),))
    assert state is not None and state.count() == 500
    assert meta == {"query_id": "qid-abc", "applied_batch": 7, "k_now": 32}
    # the marker read plans a CollectLimit (O(1)-row slice), never a
    # full-state aggregate
    plan = state.select("applied_batch").limit(1)._jdf.queryExecution().executedPlan().toString()
    assert "CollectLimit" in plan


def test_state_meta_absent_and_zero_row_defaults(tmp_path, spark):
    absent = str(tmp_path / "nope")
    state, meta = _read_state_meta(spark, absent, extra=(("k_now", 16),))
    assert state is None
    assert meta == {"query_id": None, "applied_batch": -1, "k_now": 16}
    # 0-row state with marker columns: defaults, not a crash
    out = str(tmp_path / "zero")
    spark.range(0, 1).filter("id < 0").select(
        F.col("id").alias("value"),
        F.lit(0).cast("long").alias("applied_batch"),
        F.lit("q").alias("query_id"),
    ).write.mode("overwrite").parquet(out)
    state, meta = _read_state_meta(spark, out)
    assert state is not None
    assert meta == {"query_id": None, "applied_batch": -1}


def test_bench_mid_canary_three_point_interpolation():
    """VERDICT r11 #8: a valid mid-run canary anchors the per-query
    host-factor interpolation at the HEADLINE/EXTENDED boundary; an
    aged mid pair (py/jvm divergence ≥ guard) is recorded but refused,
    falling back to the two-point form."""
    import math

    from bench import CANARY_REF_SEC, build_payloads

    timings = {f"q{i:02d}": 1.0 for i in range(24)}
    ext = {f"x{i}": 2.0 for i in range(29)}
    cpu = {k: 0.5 for k in list(timings) + list(ext)}
    line, detail = build_payloads(
        0.1, timings, ext, cpu, cpu, 3.0, 1.4,
        canary_end_sec=6.0, py_canary_end_sec=2.8,
        canary_mid_sec=4.5, py_canary_mid_sec=2.0,
    )
    qhf = detail["queries_host_factor"]
    names = list(qhf)
    assert math.isclose(qhf[names[0]], 3.0 / CANARY_REF_SEC, abs_tol=1e-3)
    # last headline query sits exactly on the mid anchor
    assert math.isclose(qhf[names[23]], 4.5 / CANARY_REF_SEC, abs_tol=1e-3)
    assert math.isclose(qhf[names[-1]], 6.0 / CANARY_REF_SEC, abs_tol=1e-3)
    assert line["canary_mid_sec"] == 4.5 and "canary_mid_valid" not in line
    # aged mid pair: recorded, refused, two-point interpolation kept
    line2, det2 = build_payloads(
        0.1, timings, ext, cpu, cpu, 3.0, 1.4,
        canary_end_sec=6.0, py_canary_end_sec=2.8,
        canary_mid_sec=4.5, py_canary_mid_sec=13.0,
    )
    assert line2["canary_mid_valid"] is False
    q2 = det2["queries_host_factor"]
    n2 = list(q2)
    f0, f1 = 3.0 / CANARY_REF_SEC, 6.0 / CANARY_REF_SEC
    assert math.isclose(q2[n2[23]], f0 + (f1 - f0) * 23 / 52, abs_tol=1e-3)
    # scalar host_factor unchanged by the mid pair (start/end geomean)
    assert line["host_factor"] == line2["host_factor"]


def test_kmeans_fused_update_matches_unfused(spark):
    """Round-12 k-means optimization: the fused assign+partial-sum
    Arrow pass must produce bit-identical centroid updates to the
    unfused assign→JVM-aggregate path (integer sums commute exactly)."""
    import random

    from super_store_datawarehouse_spark.operators.clustering import (
        assign_clusters_np,
        quantize_vec,
        update_centroids,
        updated_centroids_np,
    )

    rng = random.Random(99)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(300)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    qdf = emb.select(
        F.col("vec_id"), quantize_vec(F.col("embedding"), 1000).alias("q")
    )
    seeds = [
        (i, list(r["q"]))
        for i, r in enumerate(qdf.orderBy("vec_id").limit(5).collect())
    ]
    unfused = update_centroids(assign_clusters_np(qdf, seeds), seeds)
    fused = updated_centroids_np(qdf, seeds)
    assert fused == unfused
    # a second round from the updated centroids stays identical too
    assert updated_centroids_np(qdf, fused) == update_centroids(
        assign_clusters_np(qdf, fused), fused
    )


def test_state_meta_legacy_state_without_marker_column(tmp_path, spark):
    out = str(tmp_path / "legacy")
    spark.range(0, 10).select(F.col("id").alias("value")).write.mode(
        "overwrite"
    ).parquet(out)
    state, meta = _read_state_meta(
        spark, out, legacy_reader=lambda: ("old-qid", 3)
    )
    assert state is not None
    assert meta["query_id"] == "old-qid" and meta["applied_batch"] == 3
