"""Structured Streaming file-replay harness (SURVEY.md §2.E).

Replays the `events` parquet as a file-source stream (drop-in for a
Kafka topic at scale: swap `.format("parquet")` for `.format("kafka")`
plus a from_json projection) and drives a query to completion against a
memory sink.  Used by the S-suite parity tests: streaming result must
equal the batch form of the same transformation.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def stage_replay_dir(spark: SparkSession, sf_dir: str, by: str = "day") -> str:
    """Split events into one parquet file per `by` bucket, written in
    time order, so the file stream replays them as ordered micro-batches."""
    from ..catalog import Catalog

    events = Catalog(spark, sf_dir).table("events")
    out = os.path.join(tempfile.gettempdir(), f"graph_spark_replay_{uuid.uuid4().hex}")
    os.makedirs(out)
    buckets = [r[0] for r in events.select(F.date_trunc(by, "ts").alias("b")).distinct().orderBy("b").collect()]
    for i, b in enumerate(buckets):
        (
            events.filter(F.date_trunc(by, "ts") == F.lit(b))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(out, f"staging_{i:04d}"))
        )
    # flatten: move part files into the root in bucket order
    final = os.path.join(tempfile.gettempdir(), f"graph_spark_stream_{uuid.uuid4().hex}")
    os.makedirs(final)
    for i in range(len(buckets)):
        sdir = os.path.join(out, f"staging_{i:04d}")
        for f in sorted(os.listdir(sdir)):
            if f.endswith(".parquet"):
                dst = os.path.join(final, f"batch_{i:04d}.parquet")
                shutil.copy(os.path.join(sdir, f), dst)
                # Spark's file source orders pending files by modification
                # time; fast sequential copies share an mtime, which
                # scrambles delivery and silently breaks the "ordered
                # micro-batches" contract for order-SENSITIVE consumers
                # (stateful operators).  Stamp strictly increasing mtimes.
                os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    shutil.rmtree(out)
    return final


def run_stream(
    spark: SparkSession,
    replay_dir: str,
    transform: Callable[[DataFrame], DataFrame],
    output_mode: str = "complete",
    max_files_per_trigger: int = 5,
) -> DataFrame:
    """readStream over the replay dir -> transform -> memory sink, driven
    with processAllAvailable.  Returns the final sink table."""
    src = (
        spark.readStream.format("parquet")
        .schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(replay_dir)
    )
    name = f"sink_{uuid.uuid4().hex[:12]}"
    q = (
        transform(src)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", os.path.join(tempfile.gettempdir(), f"ckpt_{name}"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)
