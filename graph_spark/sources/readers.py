"""Schema-pinned source readers (SURVEY.md §2.A).

Schema inference is banned on prod paths: every non-parquet reader takes
an explicit StructType (inference = a full extra pass over 100 TB and
nondeterministic types).  Parquet carries its own schema; everything
else is pinned by the caller.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession, path: str, schema: StructType, header: bool = True, **options
) -> DataFrame:
    return spark.read.options(header=str(header).lower(), **options).csv(path, schema=schema)


def read_json(spark: SparkSession, path: str, schema: StructType, **options) -> DataFrame:
    return spark.read.options(**options).json(path, schema=schema)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_jdbc(
    spark: SparkSession, url: str, table: str, partition_column: str | None = None,
    num_partitions: int = 8, lower_bound=None, upper_bound=None, **options
) -> DataFrame:
    """JDBC connector (no database server ships in this image — smoke
    coverage only).  At scale ALWAYS pass partition_column + bounds:
    without them the whole table funnels through one task."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def delta_available(spark: SparkSession) -> bool:
    """Delta Lake ships as a separate package; gate features on it
    instead of failing at import time."""
    try:
        # py4j resolves missing packages lazily; Class.forName is the
        # reliable classpath probe
        spark._jvm.java.lang.Class.forName("org.apache.spark.sql.delta.DeltaLog")
        return True
    except Exception:
        return False


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    if not delta_available(spark):
        raise NotImplementedError(
            "Delta Lake jars are not on the classpath in this environment; "
            "install delta-spark and use spark.read.format('delta')"
        )
    return spark.read.format("delta").load(path)
