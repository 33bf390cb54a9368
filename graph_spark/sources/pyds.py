"""Custom connector via the Python DataSource API (Spark 4).

`SyntheticEventsDataSource` is a deterministic generator with the same
schema as the `events` fixture — the pattern for plugging ANY
Python-reachable system (REST API, proprietary store, message log) into
the engine as a first-class `spark.read.format(...)` source: schema
declared up front, work split into InputPartitions so the scan
parallelizes across executors, rows yielded per partition.

Determinism: every row is a pure function of (seed, event_id) via a
64-bit SplitMix-style hash — re-reads and retried tasks produce
identical data (a correctness requirement: Spark may re-execute
partitions after failures, so a stateful RNG would corrupt results).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)
_TYPES = ("click", "view", "purchase", "scroll")
_BASE_EPOCH = 1_704_067_200  # 2024-01-01 UTC


def _mix(x: int) -> int:
    """SplitMix64 finalizer: deterministic 64-bit avalanche."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


class _SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_parts = int(options.get("n_partitions", 4))
        self.seed = int(options.get("seed", 7))
        self.n_users = int(options.get("n_users", 50))

    def partitions(self):
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition):
        import datetime

        pid = partition.value
        lo = self.n_rows * pid // self.n_parts
        hi = self.n_rows * (pid + 1) // self.n_parts
        for eid in range(lo, hi):
            h = _mix(self.seed * 0x5851F42D4C957F2D + eid)
            ts = datetime.datetime.fromtimestamp(
                _BASE_EPOCH + (h & 0x3FFFFF), tz=datetime.timezone.utc
            ).replace(tzinfo=None)
            yield (
                eid,
                ts,
                (h >> 22) % self.n_users,
                _TYPES[(h >> 40) % len(_TYPES)],
                round(((h >> 8) % 10_000) / 100.0, 2),
                '{"k": %d}' % ((h >> 16) % 100),
            )


class SyntheticEventsDataSource(DataSource):
    """spark.read.format("synthetic_events") after registration."""

    @classmethod
    def name(cls):
        return "synthetic_events"

    def schema(self):
        return _SCHEMA

    def reader(self, schema):
        return _SyntheticEventsReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)


# ---- writer side: transactional JSON-lines sink -----------------------

from dataclasses import dataclass

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


@dataclass
class _StagedFile(WriterCommitMessage):
    staged: str


class _JsonlDirWriter(DataSourceWriter):
    """Each task writes its partition to a uniquely-named staging file;
    the driver's commit() publishes exactly the files named in the
    commit messages (rename into place + manifest) and abort() discards
    staging.  This is the two-phase commit protocol every exactly-once
    Spark sink uses: task retries stage duplicate files, but only the
    attempt whose message reaches commit() is published.

    Deployment contract: staging + publish use filesystem rename, so
    `path` must be on a filesystem ALL executors and the driver share
    (local mode, NFS, fuse-mounted object store).  Porting the pattern
    to a real remote store means replacing write()'s open/write with
    the store's upload-to-temp primitive and commit()'s move with its
    atomic publish (multipart complete, rename, visibility flip) — the
    message/commit/abort protocol stays identical."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_dir sink requires .option('path', ...) or save(path)")
        self.overwrite = overwrite

    def write(self, iterator):
        import json
        import os
        import uuid

        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        name = os.path.join(staging, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(name, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _StagedFile(staged=name)

    def commit(self, messages):
        import os
        import shutil

        if self.overwrite:
            for f in os.listdir(self.path):
                if f.endswith(".jsonl"):
                    os.remove(os.path.join(self.path, f))
        published = []
        for m in messages:
            dst = os.path.join(self.path, os.path.basename(m.staged))
            shutil.move(m.staged, dst)
            published.append(os.path.basename(dst))
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            f.write("\n".join(published))
        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)

    def abort(self, messages):
        import shutil

        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)


class JsonlDirDataSource(DataSource):
    """df.write.format("jsonl_dir").mode(...).save(path) after
    registration — the write-side pattern for wiring any
    Python-reachable sink in with exactly-once publish semantics."""

    @classmethod
    def name(cls):
        return "jsonl_dir"

    def schema(self):
        return _SCHEMA

    def writer(self, schema, overwrite):
        return _JsonlDirWriter(self.options, overwrite)


def register_sink(spark) -> None:
    spark.dataSource.register(JsonlDirDataSource)


# ---- streaming side: micro-batched synthetic stream -------------------

from pyspark.sql.datasource import SimpleDataSourceStreamReader


class _SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked streaming source in pure Python: each micro-batch
    advances the event_id watermark by `rows_per_batch`; rows are the
    same pure function of (seed, event_id) as the batch reader, so
    `readBetweenOffsets` (replay after restart) regenerates identical
    data — the determinism the streaming commit log requires."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.max_rows = int(options.get("max_rows", 1000))
        self.seed = int(options.get("seed", 7))
        self.n_users = int(options.get("n_users", 50))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def _rows(self, lo: int, hi: int):
        import datetime

        for eid in range(lo, hi):
            h = _mix(self.seed * 0x5851F42D4C957F2D + eid)
            ts = datetime.datetime.fromtimestamp(
                _BASE_EPOCH + (h & 0x3FFFFF), tz=datetime.timezone.utc
            ).replace(tzinfo=None)
            yield (
                eid,
                ts,
                (h >> 22) % self.n_users,
                _TYPES[(h >> 40) % len(_TYPES)],
                round(((h >> 8) % 10_000) / 100.0, 2),
                '{"k": %d}' % ((h >> 16) % 100),
            )

    def read(self, start: dict):
        lo = start["next"]
        hi = min(lo + self.rows_per_batch, self.max_rows)
        # iter(list), not a generator: the prefetch cache both pickles
        # this object (generators can't) and calls next() on it when the
        # offset stops advancing (plain lists can't)
        return iter(list(self._rows(lo, hi))), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(list(self._rows(start["next"], end["next"])))

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: data is a pure function of offsets


class SyntheticEventsStreamDataSource(DataSource):
    """spark.readStream.format("synthetic_events_stream") — the pure-
    Python streaming-source pattern (offset log + deterministic replay)
    for wiring any Python-reachable feed in as a Structured Stream."""

    @classmethod
    def name(cls):
        return "synthetic_events_stream"

    def schema(self):
        return _SCHEMA

    def simpleStreamReader(self, schema):
        return _SyntheticEventsStreamReader(self.options)


def register_stream(spark) -> None:
    spark.dataSource.register(SyntheticEventsStreamDataSource)
