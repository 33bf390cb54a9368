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
    time order, so the file stream replays them as ordered micro-batches.

    ONE partitioned write (repartition on the bucket -> each bucket's
    rows live in exactly one task -> exactly one part file per bucket
    dir), not a filter-and-write job per bucket — the old per-bucket
    loop scanned the whole events table O(buckets) times.  Rows with a
    NULL ts are EXCLUDED explicitly: an event-time replay has no bucket
    for them (the old bucket-equality filter dropped them silently)."""
    from ..catalog import Catalog

    events = Catalog(spark, sf_dir).table("events").filter(F.col("ts").isNotNull())
    out = os.path.join(tempfile.gettempdir(), f"graph_spark_replay_{uuid.uuid4().hex}")
    (
        events.withColumn(
            "__b", F.date_format(F.date_trunc(by, "ts"), "yyyy-MM-dd'T'HH-mm-ss")
        )
        .repartition("__b")
        .write.mode("overwrite")
        .partitionBy("__b")
        .parquet(out)
    )
    # flatten: move part files into the root in bucket order (the
    # yyyy-MM-dd'T'HH-mm-ss dir names sort chronologically)
    final = os.path.join(tempfile.gettempdir(), f"graph_spark_stream_{uuid.uuid4().hex}")
    os.makedirs(final)
    bdirs = sorted(d for d in os.listdir(out) if d.startswith("__b="))
    for i, d in enumerate(bdirs):
        sdir = os.path.join(out, d)
        parts = [f for f in sorted(os.listdir(sdir)) if f.endswith(".parquet")]
        if len(parts) != 1:
            # the single-file invariant is what makes the copy below
            # safe — a second part file would silently clobber the first
            raise RuntimeError(
                f"stage_replay_dir: bucket {d} wrote {len(parts)} part "
                "files, expected exactly 1 (repartition on the bucket "
                "column violated?)"
            )
        dst = os.path.join(final, f"batch_{i:04d}.parquet")
        shutil.copy(os.path.join(sdir, parts[0]), dst)
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
    with processAllAvailable.  Returns the final sink table.

    Lifecycle: the memory-sink table and its checkpoint dir live for
    the SparkSession (the returned DataFrame reads the in-memory
    table); callers that loop many streams in one session can reclaim
    with `spark.catalog.dropTempView(<returned df's sink name>)` after
    asserting, and the ckpt_* tempdirs are OS-tempdir garbage."""
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
