"""SparkSession factory for the graph_spark engine.

Pins the session config that every query in this repo assumes:
UTC timezone (cross-engine hash determinism vs the DuckDB oracle),
AQE on (runtime join re-planning + skew handling + shuffle coalesce),
shuffle partitions sized to the local core count (at cluster scale this
is overridden by `spark.sql.shuffle.partitions` tuning / AQE target size).

Scale notes (100 TB design):
- AQE coalescing means we can set shuffle.partitions generously on a real
  cluster and let runtime statistics shrink them.
- `maxPartitionBytes` 128m keeps scan tasks right-sized for wide parquet.
- Arrow enabled: every pandas-UDF operator in this repo is Arrow-batched.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "") or os.cpu_count() or 8)
    except ValueError:
        return os.cpu_count() or 8


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable session config to an existing session.

    Used when the driver hands us a session we didn't build (the
    `__spark_entry__` contract): only runtime-mutable confs here.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # events.parquet stores TIMESTAMP(NANOS); Spark has no ns timestamp —
    # read the raw int64 and truncate to µs in the catalog (matches
    # DuckDB's ns->µs truncation, so cross-engine hashes agree).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(default_parallelism()))
    except Exception:
        pass  # may be fixed by an active query; non-fatal
    try:
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    except Exception:
        pass
    return spark


def get_spark(app_name: str = "graph-spark") -> SparkSession:
    """Build (or reuse) the canonical local session."""
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
    )
    spark = builder.getOrCreate()
    return configure(spark)
