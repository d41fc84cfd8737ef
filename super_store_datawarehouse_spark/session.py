"""SparkSession factory.

Defaults are chosen for correctness-vs-oracle and for scale-out behavior:

- ``spark.sql.session.timeZone=UTC``: DuckDB timestamps are UTC-naive;
  pinning the session TZ makes timestamp semantics match the oracle.
- AQE on (coalesce partitions, skew-join handling): at 100 TB the static
  shuffle-partition count is always wrong somewhere; AQE re-plans per stage.
- ``spark.sql.shuffle.partitions`` sized to the local core count for tests;
  on a real cluster this should be ~2-3x total executor cores (AQE coalesces
  down, it does not split up-front partitions).
- broadcast threshold raised: every dimension table in the reference model
  (SURVEY.md §1.4 — largest dim is Product at 1,894 rows) is far below it,
  so all dim joins plan as BroadcastHashJoin with no shuffle.
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "superstore-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the singleton SparkSession with engine defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # InferFiltersFromGenerate adds `size(arr)>0 AND isnotnull(arr)`
        # above every inner explode; filter-pushdown then substitutes the
        # alias, INLINING the whole array-building expression (tokenize +
        # n-gram transform) into the pushed filter — the map-side work
        # triples. Measured 78 s -> 11 s on the repetition-signals explode
        # at sf1. The rule is a pure optimization (prune empty-array rows
        # early) that never wins on this workload — text/embedding arrays
        # are almost never empty — so it is excluded engine-wide. Hot
        # shared operators ALSO use explode_outer + null-filter, which
        # dodges the rule for callers on foreign sessions.
        # reliable checkpoints (checkpoint_cut) are GC'd with their RDDs
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def checkpoint_cut(df):
    """Materialize ``df``, CUT its lineage, and keep the copy on DISK:
    a reliable checkpoint into a session-scoped checkpoint directory
    (local tmp here; HDFS/object storage on a cluster — the deployment
    graph.py's docstring prescribes).

    For ITERATIVE corpus-scale loops (k-core peeling, label
    propagation) this is the scale-safe lineage cut. ``localCheckpoint``
    stores MEMORY_AND_DISK blocks that cannot be released without
    destroying the data, so a loop retains every iteration's full
    working set on the executor heap — the round-10 sf10 sweep OOM'd
    the k-core loop's 4th retained copy of a ~60M-edge frame and took
    the whole local JVM down. Reliable checkpoints live as files: heap
    cost is zero, executor loss cannot replay the chain, and
    ``spark.cleaner.referenceTracking.cleanCheckpoints`` garbage-
    collects them when the RDD goes out of scope. localCheckpoint
    remains the right tool for SINGLE bounded materializations.
    """
    import atexit
    import shutil
    import tempfile

    from pyspark import StorageLevel

    spark = df.sparkSession
    jsc = spark.sparkContext
    if jsc._jsc.sc().getCheckpointDir().isEmpty():
        # a driver-local tmp dir is only a valid checkpoint root when
        # every executor shares the driver's filesystem — i.e. local
        # mode. On a real cluster each executor would write partitions
        # to its OWN /tmp and reads back would lose them; fail loudly
        # at the call site instead (round-10 review finding).
        if not jsc.master.startswith("local"):
            raise RuntimeError(
                "checkpoint_cut: no checkpoint directory configured and "
                f"master {jsc.master!r} is not local — set a shared "
                "(HDFS/object-storage) dir via sc.setCheckpointDir() "
                "before using iterative lineage cuts on a cluster"
            )
        ckdir = tempfile.mkdtemp(prefix="ssdw_ckpt_")
        jsc.setCheckpointDir(ckdir)
        atexit.register(shutil.rmtree, ckdir, ignore_errors=True)
    # Reliable checkpointing runs a SECOND job over the lineage to
    # write the checkpoint files (Spark's documented recomputation).
    # persist(DISK_ONLY)-before-checkpoint was tried for that (round-10
    # review) and REVERTED on measurement: the loops that use this
    # helper cut AFTER a shuffle, so the recompute job skips the
    # already-computed shuffle stages and the persist bought nothing
    # (x202 sf10: 93.5 s plain vs 93.3 s persisted) — while the extra
    # disk-store buffers stacked on x325's declared corpus-scale
    # broadcast and tipped the 128 GiB heap over (fresh-JVM OOM that
    # the plain form does not hit). Callers cutting a deep NON-shuffle
    # lineage should persist at the call site where they can see the
    # trade.
    return df.checkpoint(eager=True)


# ---------------------------------------------------------------------------
# Scoped caching.
#
# Several lazy operators cache() an intermediate frame that feeds two or
# more branches of the plan they return (the shingle frame in the dedup
# family, the postings explode in BM25, the bigram occurrences in the
# LM-surprise filter, the quantized working set in k-means). The cache is
# load-bearing for performance — the dominant tokenize/explode map work
# must run once — but the operator never sees an action, so it has no
# natural point to unpersist. Across a long harness session (311 queries)
# those block-manager entries accumulate until LRU eviction.
#
# scoped_cache() is cache()/persist() plus registration; harness drivers
# (oracle_check, bench, plan_audit, broadcast_audit, and a per-test
# autouse finalizer in tests/conftest.py) call release_scoped_caches()
# after each query's action completes. Frames released this way simply
# recompute if a caller re-executes an old plan — correctness is
# unaffected, only the reuse window.
#
# Concurrency contract: registration and release are lock-guarded, so
# the registry itself cannot corrupt under concurrent drivers — but
# release_scoped_caches() releases EVERY registered frame, including
# ones another in-flight query just registered (that query's plan then
# recomputes instead of reusing its cache; correctness unaffected).
# The drivers above are all single-threaded; a concurrent driver should
# scope its releases to its own frames or accept the recompute.
# ---------------------------------------------------------------------------

_SCOPED_CACHE_LOCK = threading.Lock()
_SCOPED_CACHED_FRAMES: list = []


def scoped_cache(df, storage_level=None):
    """``df.cache()`` (or ``persist(storage_level)``) registered for
    deferred release via :func:`release_scoped_caches`.

    Reach for this ONLY when the shared frame is re-consumed by plans
    whose canonical form differs (so ReuseExchange cannot dedupe them)
    or across actions on REBUILT DataFrame objects (so shuffle-stage
    skipping cannot apply), AND the lineage above the last exchange is
    genuinely expensive. For a shared frame whose plan ends in a
    shuffle (any groupBy/join/distinct output), prefer NO cache: within
    one action Catalyst's ReuseExchange runs the map side once and the
    branches re-read shuffle files; across actions on the same object
    Spark skips already-computed shuffle stages. The in-memory columnar
    cache was measured strictly worse for those shapes on this class of
    host: ~45 us/row build cost and reads that contend under 32-way
    task concurrency (q26 at sf0.1: 23-30 s CPU cached vs 2-5 s with
    exchange reuse; 256k-row synthetic: cache read+groupBy 42 s CPU at
    32 partitions vs 1.1 s at 4 — see BASELINE.md "columnar-cache
    contention").
    """
    df = df.persist(storage_level) if storage_level is not None else df.cache()
    with _SCOPED_CACHE_LOCK:
        _SCOPED_CACHED_FRAMES.append(df)
    return df


def localize(df, max_rows: int = 100_000, on_overflow: str = "raise"):
    """Materialize a SMALL DataFrame to a driver-side LocalRelation.

    The right tool when a bounded result (top-k rows, a frontier
    candidate set, an n²-bounded rollup) is consumed by several
    branches of one plan but its LINEAGE is expensive: a lazy cache
    stampedes (every branch that starts before the first materializes
    re-executes the full lineage), while a LocalRelation is computed
    exactly once and costs nothing to re-read — downstream joins
    against it broadcast trivially and canonicalize stably.

    Guard: refuses to localize more than ``max_rows`` (this is a
    driver-side collect — the same boundedness contract as a broadcast
    join side). Only use where the row bound holds BY CONSTRUCTION —
    or, when the bound is merely EXPECTED (data-dependent, e.g. IVF
    cell occupancy under clustered embeddings), pass
    ``on_overflow="cache"``: instead of raising, the frame falls back
    to an EAGER scoped cache (materialized here via ``count()``, so the
    lineage still runs exactly once and no branch stampedes it), and
    the query keeps its distributed plan at a modest read-path cost
    (ADVICE r8: a hard ValueError at plan-build time is the wrong
    failure mode for a shape that would merely run slower).
    """
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        if on_overflow == "cache":
            cached = scoped_cache(df)
            cached.count()  # eager: one materialization, no stampede
            return cached
        raise ValueError(
            f"localize(): frame exceeds max_rows={max_rows}; "
            "this helper is for results bounded by construction"
        )
    return df.sparkSession.createDataFrame(rows, df.schema)


def release_scoped_caches() -> int:
    """Unpersist every frame registered since the last release.

    Non-blocking; safe to call with no live SparkSession (dead frames
    are skipped). Returns the number of frames released. See the
    concurrency contract above: this releases ALL registered frames,
    whoever registered them.
    """
    n = 0
    while True:
        with _SCOPED_CACHE_LOCK:
            if not _SCOPED_CACHED_FRAMES:
                break
            frame = _SCOPED_CACHED_FRAMES.pop()
        try:
            frame.unpersist(False)
            n += 1
        except Exception:  # session already stopped — nothing to release
            pass
    return n
