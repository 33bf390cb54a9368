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
        if lower_bound is None or upper_bound is None:
            # str(None) would reach the JDBC relation as the literal
            # "None" and die in a NumberFormatException far from here
            raise ValueError(
                "read_jdbc: partition_column requires lower_bound and "
                "upper_bound (the stride bounds of the partition column)"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_partition_bytes: str | None = None,
) -> DataFrame:
    """Opaque-file ingestion via Spark's built-in `binaryFile` source:
    one row per file with (path, modificationTime, length, content) —
    the front door for the multimodal M-suite, turning a directory of
    images/audio/blobs into a BinaryType column for mapInPandas
    feature/frame/chunk ops (operators/multimodal.py).

    Scale notes: the source parallelizes across FILES (each row's
    content is read by the task that owns it — no single-reader
    funnel), pushes down path-glob filters, and binary content is never
    split, so set spark.sql.files.maxPartitionBytes generously when
    files are large, and prefer many medium files over few huge ones.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if max_partition_bytes:
        reader = reader.option("maxPartitionBytes", max_partition_bytes)
    return reader.load(path)


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


def schema_drift(old: "DataFrame", new: "DataFrame") -> list[dict]:
    """Schema contract check between two table versions: reports added,
    removed, and type-changed columns (by name; nested struct types
    compare by their full simpleString).  Run this BEFORE a union-by-
    name ingest (q59) or an upsert — silent type widening is how a
    100 TB table ends up with a corrupt column nobody can re-read.

    Returns a list of {"column", "change", "old_type", "new_type"}
    dicts, empty when the schemas agree.
    """
    o = {f.name: f.dataType.simpleString() for f in old.schema.fields}
    n = {f.name: f.dataType.simpleString() for f in new.schema.fields}
    out: list[dict] = []
    for col in sorted(set(o) | set(n)):
        if col not in n:
            out.append({"column": col, "change": "removed",
                        "old_type": o[col], "new_type": None})
        elif col not in o:
            out.append({"column": col, "change": "added",
                        "old_type": None, "new_type": n[col]})
        elif o[col] != n[col]:
            out.append({"column": col, "change": "type_changed",
                        "old_type": o[col], "new_type": n[col]})
    return out


def read_text(
    spark: SparkSession,
    path: str,
    whole: bool = False,
    line_sep: str | None = None,
    **options,
) -> DataFrame:
    """Raw text ingestion: one row per line (`value` string), or one row
    per FILE with `whole=True` (wholetext — the raw-corpus ingestion
    mode that feeds the L-suite before any tokenization).  Line mode
    splits on `line_sep` (default \\n) and is splittable/parallel per
    file chunk; whole mode pins a file to a task — fine for document
    corpora where files are MBs, wrong for one giant file (the caller
    shards first).  No schema needed: the schema IS (value string)."""
    # pass through text()'s own kwargs — the reader method re-sets
    # these options itself, so a prior .option() call would be clobbered
    return spark.read.options(**options).text(path, wholetext=whole, lineSep=line_sep)


def rate_stream(spark: SparkSession, rows_per_second: int = 10):
    """The built-in rate micro-benchmark stream source: (timestamp,
    value) rows generated at a fixed rate — the always-available stand
    -in for a Kafka topic when smoke-testing streaming topology and
    sink wiring (Kafka itself needs the external connector jar; the
    transforms are identical either way)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str = "row",
    schema: str | None = None,
) -> DataFrame:
    """Native XML source (built into Spark since 4.0 — no external
    package): one DataFrame row per `row_tag` element.  Pin `schema`
    in production exactly like the csv/json readers — XML schema
    inference is a full extra pass over the data, and inferred types
    can drift between drops."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema:
        reader = reader.schema(schema)
    return reader.load(path)


def write_xml(
    df: DataFrame, path: str, row_tag: str = "row", root_tag: str = "rows"
) -> None:
    df.write.format("xml").option("rowTag", row_tag).option(
        "rootTag", root_tag
    ).mode("overwrite").save(path)


def avro_available(spark: SparkSession) -> bool:
    """Avro ships as the external spark-avro module; gate on the
    classpath probe instead of failing at import (the Delta idiom)."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.avro.AvroFileFormat"
        )
        return True
    except Exception:
        return False


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    if not avro_available(spark):
        raise NotImplementedError(
            "spark-avro jars are not on the classpath in this environment; "
            "deploy org.apache.spark:spark-avro and use "
            "spark.read.format('avro')"
        )
    return spark.read.format("avro").load(path)
