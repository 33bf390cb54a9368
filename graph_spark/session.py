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
import tempfile
import zipfile

from pyspark.sql import SparkSession

# session ids that already received the package zip via addPyFile
_SHIPPED: set = set()


def _ship_package(spark: SparkSession) -> None:
    """Distribute graph_spark to executor python workers.

    mapInPandas/pandas_udf closures reference module-level functions,
    which cloudpickle serializes BY REFERENCE — workers must be able to
    `import graph_spark`.  That holds when the driver's cwd is the repo
    root but breaks from any other cwd (and on a real cluster), so ship
    the package as a zip once per session."""
    key = id(spark)
    if key in _SHIPPED:
        return
    try:
        import graph_spark

        pkg_dir = os.path.dirname(os.path.abspath(graph_spark.__file__))
        zip_path = os.path.join(
            tempfile.gettempdir(), f"graph_spark_pkg_{os.getpid()}_{key}.zip"
        )
        if not os.path.exists(zip_path):
            with zipfile.ZipFile(zip_path, "w") as z:
                for root, _, files in os.walk(pkg_dir):
                    for f in files:
                        if f.endswith(".py"):
                            full = os.path.join(root, f)
                            rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                            z.write(full, rel)
        spark.sparkContext.addPyFile(zip_path)
        _SHIPPED.add(key)
    except Exception:
        pass  # driver-side import still works; only worker closures affected


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
    _ship_package(spark)
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
        # spark.driver.maxResultSize stays at its 1g default: the only
        # bulk driver fetch is graph/algorithms._run_local's toPandas,
        # which routes through the driver ONLY under a bytes-estimate
        # guard (DRIVER_LOCAL_BYTES_LIMIT, 256 MB) — everything larger
        # runs executor-side via mapInPandas, including the XL bench's
        # explicit local=True kernels at 20M edges.
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
    )
    spark = builder.getOrCreate()
    return configure(spark)
