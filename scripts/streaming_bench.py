"""Streaming throughput / batch-latency / state-size measurement
(SCALE.md §12, VERDICT r6 #4).

The streaming family carries stream≡batch value oracles and
exactly-once restart proofs (tests/test_streaming.py) but until round 7
had no measured scale point. This script replays a large events table
(sf1 = 1,000,000 rows by default) through four representative jobs as a
file stream of N time-ordered micro-batches (maxFilesPerTrigger=1) and
records, per job:

- sustained throughput (total input rows / wall seconds),
- per-batch latency (mean + max of the query's own progress log),
- state size over the run (peak stateOperators memory for jobs with
  Spark-managed state; final on-disk state bytes for the parquet-state
  sketch sinks), so state GROWTH over >=20 micro-batches is visible.

Jobs: sessionize (session_window stateful agg, native parquet sink),
hourly counts (windowed agg, complete mode), count-min sketch sink,
Bloom-gated dedup — the set VERDICT r6 #4 names.

Usage:
  python scripts/streaming_bench.py [sf_dir] [n_batches] [--json out.json]
  python scripts/streaming_bench.py [sf_dir] --saturation [--json out.json]

``--saturation`` (VERDICT r7 #7) sweeps the TRIGGER SIZE instead of
running the fixed-40k four-job suite: the same events table is staged
at increasing rows-per-batch and replayed through the two heaviest
stateful jobs (sessionize on RocksDB, Bloom dedup). As the trigger
grows, per-batch latency grows; the rows/s curve's plateau is the
single-host rate ceiling (beyond it a real deployment's batches would
fall behind their trigger interval — the backpressure point). A final
sessionize run at a 2× watermark (4 h vs the default 2 h) records how
the open-session state peak scales with the horizon.

Timing discipline: run on an idle host (no concurrent Spark JVMs) —
same contention rule as bench.py.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

try:
    import super_store_datawarehouse_spark  # noqa: F401
except ImportError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from super_store_datawarehouse_spark.session import get_spark  # noqa: E402


def stage_batches(spark, sf_dir: str, staging: str, n_batches: int) -> int:
    """Split the events table into n_batches time-contiguous parquet
    files named so the file stream replays them in event-time order
    (FileStreamSource picks files by modification time; names are for
    humans). Returns total rows staged."""
    from pyspark.sql import Window

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    total = ev.count()
    w = Window.orderBy("ts", "event_id")
    part_dir = os.path.join(staging, "_parts")
    (
        ev.withColumn("__b", F.ntile(n_batches).over(w) - 1)
        .repartition(n_batches, "__b")
        .write.mode("overwrite")
        .partitionBy("__b")
        .parquet(part_dir)
    )
    os.makedirs(os.path.join(staging, "src"), exist_ok=True)
    now = time.time()
    for b in range(n_batches):
        d = os.path.join(part_dir, f"__b={b}")
        parts = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(parts) == 1, f"batch {b}: expected 1 file, got {parts}"
        dst = os.path.join(staging, "src", f"events_{b:04d}.parquet")
        shutil.move(os.path.join(d, parts[0]), dst)
        os.utime(dst, (now + b, now + b))  # replay order = event-time order
    shutil.rmtree(part_dir)
    return total


class _Capture:
    """StreamingQueryListener that keeps every progress JSON."""

    def __init__(self):
        from pyspark.sql.streaming import StreamingQueryListener

        outer = self

        class L(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                outer.progress.append(json.loads(event.progress.json))

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        self.progress: list[dict] = []
        self.listener = L()

    def summarize(self) -> dict:
        rows = [p for p in self.progress if p.get("numInputRows", 0) > 0]
        durs = [p["durationMs"].get("triggerExecution", 0) for p in rows]
        state_rows = []  # per-batch series: the GROWTH curve, not just peak
        state_mem = []
        for p in rows:
            for so in p.get("stateOperators", []) or []:
                state_rows.append(so.get("numRowsTotal", 0))
                state_mem.append(so.get("memoryUsedBytes", 0))
        return {
            "batches": len(rows),
            "input_rows": sum(p["numInputRows"] for p in rows),
            "batch_ms_mean": round(sum(durs) / len(durs), 1) if durs else None,
            "batch_ms_max": max(durs) if durs else None,
            "state_rows_peak": max(state_rows) if state_rows else None,
            "state_mem_peak_bytes": max(state_mem) if state_mem else None,
            "state_rows_series": state_rows or None,
        }


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


_ROCKS = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


DEFAULT_SWEEP = (40_000, 100_000, 250_000, 500_000, 1_000_000)


def saturation(
    spark,
    sf_dir: str,
    json_out: str | None,
    sizes: tuple[int, ...] = DEFAULT_SWEEP,
    with_watermark_point: bool = True,
) -> int:
    """Trigger-size sweep: rows/s + batch latency as the micro-batch
    grows, for the two heaviest stateful jobs; plus the 2× watermark
    state point (SCALE.md §12 extension, VERDICT r7 #7).

    ``sizes`` (``--sizes a,b,c``): the r8 sweep ended at 1M rows/trigger
    — the whole sf1 table in one batch — with throughput still rising;
    VERDICT r8 #7 asks for the actual knee, so the sf10 run sweeps
    1M-4M triggers over the 10M-row table (``--no-watermark-point``
    skips the 40k-trigger watermark comparison, already recorded at
    sf1)."""
    from super_store_datawarehouse_spark.streaming import jobs

    total_rows = spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")
    ).count()
    sweep = []

    def measure(name, fn, state_dir=None):
        cap = _Capture()
        spark.streams.addListener(cap.listener)
        t0 = time.perf_counter()
        fn()
        wall = time.perf_counter() - t0
        time.sleep(2)  # listener events are async; let them drain
        spark.streams.removeListener(cap.listener)
        s = cap.summarize()
        s["wall_s"] = round(wall, 2)
        s["rows_per_s"] = round(s["input_rows"] / wall) if s["input_rows"] else 0
        if state_dir is not None and os.path.isdir(state_dir):
            s["state_disk_bytes"] = dir_bytes(state_dir)
        s.pop("state_rows_series", None)  # keep the sweep JSON compact
        return s

    for size in sizes:
        n = max(1, (total_rows + size - 1) // size)
        staging = tempfile.mkdtemp(prefix=f"stream_sat_{size}_")
        try:
            stage_batches(spark, sf_dir, staging, n)
            src = os.path.join(staging, "src")
            out = lambda nm: os.path.join(staging, nm)  # noqa: E731
            entry = {"rows_per_batch": size, "n_batches": n}
            key = "spark.sql.streaming.stateStore.providerClass"
            prev = spark.conf.get(key, None)
            spark.conf.set(key, _ROCKS)
            try:
                entry["sessionize_rocksdb"] = measure(
                    "sessionize_rocksdb",
                    lambda: jobs.stream_sessionize_to_parquet(
                        spark, src, out("sess"), checkpoint=out("ck_sess")
                    ),
                )
            finally:
                spark.conf.unset(key) if prev is None else spark.conf.set(key, prev)
            entry["bloom_dedup"] = measure(
                "bloom_dedup",
                lambda: jobs.stream_bloom_dedup_to_parquet(
                    spark, src, out("bl_out"), out("bl_state"),
                    m_bits=1 << 16, k_hashes=2, checkpoint=out("ck_bl"),
                ),
                state_dir=out("bl_state"),
            )
            sweep.append(entry)
            print(json.dumps(entry))
        finally:
            shutil.rmtree(staging, ignore_errors=True)

    # 2× watermark state point: same 40k trigger, 4 h horizon vs 2 h
    wm = {}
    if not with_watermark_point:
        line = {
            "metric": "streaming_saturation",
            "sf_dir": sf_dir,
            "rows": total_rows,
            "sweep": sweep,
        }
        print(json.dumps(line))
        if json_out:
            with open(json_out, "w") as fh:
                fh.write(json.dumps(line) + "\n")
        return 0
    staging = tempfile.mkdtemp(prefix="stream_sat_wm_")
    try:
        n = max(1, (total_rows + 39_999) // 40_000)
        stage_batches(spark, sf_dir, staging, n)
        src = os.path.join(staging, "src")
        for label, horizon in (("2 hours", "2 hours"), ("4 hours", "4 hours")):
            s = measure(
                f"sessionize_wm_{label}",
                lambda h=horizon: jobs.stream_sessionize_to_parquet(
                    spark, src,
                    os.path.join(staging, f"s_{label.replace(' ', '')}"),
                    watermark=h,
                    checkpoint=os.path.join(
                        staging, f"ck_{label.replace(' ', '')}"
                    ),
                ),
            )
            wm[label] = {
                "state_rows_peak": s["state_rows_peak"],
                "state_mem_peak_bytes": s["state_mem_peak_bytes"],
                "batch_ms_mean": s["batch_ms_mean"],
            }
            print(json.dumps({label: wm[label]}))
    finally:
        shutil.rmtree(staging, ignore_errors=True)

    line = {
        "metric": "streaming_saturation",
        "sf_dir": sf_dir,
        "rows": total_rows,
        "sweep": sweep,
        "watermark_state": wm,
    }
    print(json.dumps(line))
    if json_out:
        with open(json_out, "w") as fh:
            fh.write(json.dumps(line) + "\n")
    return 0


def main() -> int:
    json_out = None
    argv = sys.argv[1:]
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]  # drop the flag AND its value
    sizes = DEFAULT_SWEEP
    if "--sizes" in argv:
        i = argv.index("--sizes")
        sizes = tuple(int(x) for x in argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2:]  # drop the flag AND its value
    args = [a for a in argv if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/repo/testdata_sf1"
    n_batches = int(args[1]) if len(args) > 1 else 25
    if "--saturation" in sys.argv:
        spark = get_spark("streaming-bench")
        spark.sparkContext.setLogLevel("ERROR")
        return saturation(
            spark, sf_dir, json_out, sizes=sizes,
            with_watermark_point="--no-watermark-point" not in sys.argv,
        )

    spark = get_spark("streaming-bench")
    spark.sparkContext.setLogLevel("ERROR")

    from super_store_datawarehouse_spark.streaming import jobs

    staging = tempfile.mkdtemp(prefix="stream_bench_")
    try:
        total = stage_batches(spark, sf_dir, staging, n_batches)
        src = os.path.join(staging, "src")
        print(f"staged {total} rows into {n_batches} files at {src}")

        results: dict[str, dict] = {}

        only = os.environ.get("STREAM_BENCH_ONLY")

        def run(name, fn, state_dir=None):
            if only and name not in only.split(","):
                return
            cap = _Capture()
            spark.streams.addListener(cap.listener)
            t0 = time.perf_counter()
            fn()
            wall = time.perf_counter() - t0
            time.sleep(2)  # listener events are async; let them drain
            spark.streams.removeListener(cap.listener)
            s = cap.summarize()
            s["wall_s"] = round(wall, 2)
            s["rows_per_s"] = round(s["input_rows"] / wall) if s["input_rows"] else 0
            if state_dir is not None and os.path.isdir(state_dir):
                s["state_disk_bytes"] = dir_bytes(state_dir)
            results[name] = s
            print(f"{name}: {s}")

        out = lambda n: os.path.join(staging, n)  # noqa: E731

        run(
            "sessionize",
            lambda: jobs.stream_sessionize_to_parquet(
                spark, src, out("sessions"),
                checkpoint=out("ck_sess"),
            ),
        )
        # same stateful job on the RocksDB state store — the provider a
        # 100 TB deployment runs (state off-heap/on-disk, bounded JVM
        # pressure); tests already prove correctness on it, this records
        # the throughput/latency cost next to the default HDFS-backed
        # in-memory provider
        rocks = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        key = "spark.sql.streaming.stateStore.providerClass"
        prev = spark.conf.get(key, None)
        spark.conf.set(key, rocks)
        try:
            run(
                "sessionize_rocksdb",
                lambda: jobs.stream_sessionize_to_parquet(
                    spark, src, out("sessions_rocks"),
                    checkpoint=out("ck_sess_rocks"),
                ),
            )
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
        run(
            "hourly_counts",
            lambda: jobs.hourly_counts_to_parquet(spark, src, out("hourly")),
        )
        run(
            "countmin_sink",
            lambda: jobs.stream_countmin_to_parquet(
                spark, src, out("cms"), checkpoint=out("ck_cms")
            ),
            state_dir=out("cms"),
        )
        run(
            "bloom_dedup",
            lambda: jobs.stream_bloom_dedup_to_parquet(
                spark, src, out("bloom_out"), out("bloom_state"),
                m_bits=1 << 16, k_hashes=2, checkpoint=out("ck_bloom"),
            ),
            state_dir=out("bloom_state"),
        )

        line = {
            "metric": "streaming_bench",
            "sf_dir": sf_dir,
            "rows": total,
            "n_batches": n_batches,
            "jobs": results,
        }
        print(json.dumps(line))
        if json_out:
            with open(json_out, "w") as fh:
                fh.write(json.dumps(line) + "\n")
        return 0
    finally:
        shutil.rmtree(staging, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
