"""Custom connectors via the Spark 4 Python Data Source API.

The reference's only ingest surface is a hand-rolled CSV→MySQL loader
(`etl.py:49,477-1115`); this engine's equivalent extension point is
`pyspark.sql.datasource` — a connector written in Python that still
gets real partition parallelism (each `InputPartition` is read by a
separate task) and plugs into `spark.read.format(...)` like any JVM
source.

Two connectors:

- ``eventgen`` — deterministic synthetic event-log *reader*: rows are
  derived from a counter-based splitmix64 hash of the global row index,
  so any (rows, partitions, seed) triple yields identical data on any
  cluster size, with no driver-side materialization and no shared state
  between partitions. This is the load-testing/source-mocking connector
  a 100 TB pipeline uses to soak-test downstream operators.
- ``jsonlpy`` — JSONL *writer*: one file per partition, a commit
  manifest written only when every task reports success (the
  commit/abort protocol is the same two-phase contract JVM sinks use).
"""

from __future__ import annotations

import dataclasses
import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

EVENT_TYPES = ("view", "click", "purchase", "error")
MASK64 = (1 << 64) - 1


def splitmix64(x: int) -> int:
    """Public-domain splitmix64 mix; counter-based so row i's record is
    a pure function of (seed, i)."""
    x = (x + 0x9E3779B97F4A7C15) & MASK64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & MASK64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & MASK64
    return x ^ (x >> 31)


@dataclasses.dataclass
class _Range(InputPartition):
    start: int
    end: int
    seed: int
    t0_us: int
    step_us: int
    n_users: int


class EventGenReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.rows = int(options.get("rows", 1000))
        self.numparts = int(options.get("partitions", 4))
        self.seed = int(options.get("seed", 42))
        self.t0_us = int(options.get("start_us", 1704067200000000))  # 2024-01-01
        self.step_us = int(options.get("step_us", 1000000))
        self.n_users = int(options.get("users", 100))

    def partitions(self) -> list[InputPartition]:
        if self.rows <= 0:
            # one empty range: Spark still schedules a task when the
            # partition list is empty (read(None)), so model "no rows"
            # as a single [0, 0) partition instead
            return [
                _Range(0, 0, self.seed, self.t0_us, self.step_us, self.n_users)
            ]
        per = -(-self.rows // self.numparts)
        return [
            _Range(
                lo,
                min(lo + per, self.rows),
                self.seed,
                self.t0_us,
                self.step_us,
                self.n_users,
            )
            for lo in range(0, self.rows, per)
        ]

    def read(self, part: _Range):
        for i in range(part.start, part.end):
            yield _event_row(part.seed, i, part.t0_us, part.step_us, part.n_users)


def _event_row(seed: int, i: int, t0_us: int, step_us: int, n_users: int):
    """Row i as a pure function of (seed, i) — shared by the batch reader
    and the stream reader so batch ≡ stream by construction."""
    h = splitmix64(seed * 0x100000001 + i)
    return (
        i,
        t0_us + i * step_us + (h >> 48) % step_us,
        h % n_users,
        EVENT_TYPES[(h >> 16) % len(EVENT_TYPES)],
        ((h >> 24) % 100000) / 100.0,
    )


class EventGenStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of eventgen (``SimpleDataSourceStreamReader``).

    The offset is simply the next row counter, so every micro-batch is a
    deterministic [start, end) slice of the same counter-hash stream the
    batch reader produces: ``read`` advances by ``batch_rows`` per
    trigger until the configured ``rows`` cap, and ``readBetweenOffsets``
    replays any committed range bit-identically after a restart — the
    replayability contract Structured Streaming recovery requires, free
    here because rows are pure functions of (seed, i).
    """

    def __init__(self, options: dict) -> None:
        self.rows = int(options.get("rows", 1000))
        self.batch_rows = int(options.get("batch_rows", 100))
        self.seed = int(options.get("seed", 42))
        self.t0_us = int(options.get("start_us", 1704067200000000))
        self.step_us = int(options.get("step_us", 1000000))
        self.n_users = int(options.get("users", 100))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def _slice(self, start: int, end: int):
        # a list_iterator, not a generator: Spark requires an iterator
        # here AND pickles it into the driver-side cache for replays —
        # list iterators pickle (list + position), generators cannot
        return iter(
            [
                _event_row(self.seed, i, self.t0_us, self.step_us, self.n_users)
                for i in range(start, end)
            ]
        )

    def read(self, start: dict):
        s = int(start["i"])
        e = min(s + self.batch_rows, self.rows)
        return self._slice(s, e), {"i": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._slice(int(start["i"]), int(end["i"]))

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: the stream is synthesized, not buffered


class EventGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "eventgen"

    def schema(self) -> str:
        return (
            "event_id bigint, ts_us bigint, user_id bigint, "
            "event_type string, value double"
        )

    def reader(self, schema) -> DataSourceReader:
        return EventGenReader(self.options)

    def simpleStreamReader(self, schema) -> "EventGenStreamReader":
        return EventGenStreamReader(self.options)


@dataclasses.dataclass
class _Committed(WriterCommitMessage):
    tmp: str
    pid: int
    rows: int


class JsonlPyWriter(DataSourceWriter):
    """Two-phase JSONL sink.

    Tasks only ever produce attempt-unique ``_tmp-part-*`` files; nothing
    under the final ``part-*.jsonl`` namespace appears until ``commit()``
    renames the winning attempt of every partition in one driver-side
    pass. So a job that dies mid-write leaves temp litter (cleaned by the
    next commit/abort on the same path) but never a half-visible dataset.
    ``overwrite`` clears previous ``part-*.jsonl`` files during commit, so
    a rewrite with fewer partitions cannot leave stale parts behind; in
    append mode final names carry a job-unique token and the manifest
    accumulates across jobs.
    """

    def __init__(self, options: dict, overwrite: bool) -> None:
        self.path = options["path"]
        self.overwrite = overwrite
        # Driver-side, before pickling to tasks: one token per write job,
        # derived from the options dict id + pid of the driver process —
        # unique enough across jobs on one path without importing uuid's
        # entropy into every task.
        self.job_token = f"{os.getpid():x}-{id(self) & 0xFFFFFF:x}"

    def write(self, iterator) -> _Committed:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        attempt = ctx.taskAttemptId()
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(
            self.path, f"_tmp-part-{pid:05d}-{self.job_token}-a{attempt}.jsonl"
        )
        n = 0
        with open(tmp, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _Committed(tmp=tmp, pid=pid, rows=n)

    def _manifest_path(self) -> str:
        return os.path.join(self.path, "_MANIFEST.json")

    def _clean_tmps(self) -> None:
        """Drop temp files from failed or speculative attempts."""
        if not os.path.isdir(self.path):
            return
        for name in os.listdir(self.path):
            if name.startswith("_tmp-part-"):
                try:
                    os.remove(os.path.join(self.path, name))
                except OSError:
                    pass

    def commit(self, messages) -> None:
        prior_files: list[str] = []
        prior_rows = 0
        if not self.overwrite and os.path.exists(self._manifest_path()):
            with open(self._manifest_path(), encoding="utf-8") as f:
                prior = json.load(f)
            prior_files = [
                p for p in prior.get("files", []) if os.path.exists(p)
            ]
            prior_rows = prior.get("rows", 0)
        if self.overwrite and os.path.isdir(self.path):
            for name in os.listdir(self.path):
                if name.startswith("part-") and name.endswith(".jsonl"):
                    os.remove(os.path.join(self.path, name))
        new_files = []
        new_rows = 0
        for m in messages:
            final = os.path.join(
                self.path, f"part-{m.pid:05d}-{self.job_token}.jsonl"
            )
            os.replace(m.tmp, final)
            new_files.append(final)
            new_rows += m.rows
        self._clean_tmps()
        manifest = {
            "files": sorted(prior_files + new_files),
            "rows": prior_rows + new_rows,
        }
        mtmp = self._manifest_path() + ".tmp"
        with open(mtmp, "w", encoding="utf-8") as f:
            json.dump(manifest, f)
        os.replace(mtmp, self._manifest_path())

    def abort(self, messages) -> None:
        self._clean_tmps()


class JsonlPyDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonlpy"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return JsonlPyWriter(self.options, overwrite)


def register(spark) -> None:
    """Register both connectors on a session (idempotent)."""
    spark.dataSource.register(EventGenDataSource)
    spark.dataSource.register(JsonlPyDataSource)
