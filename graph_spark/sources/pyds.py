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
