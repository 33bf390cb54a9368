"""Temporal aggregate index analog (SURVEY §4.1/§4.3).

The reference system answers "aggregate of a temporal property over
[a, b)" from a tree of pre-aggregated time buckets instead of scanning
every change-point.  The Spark-native translation: materialize a
per-(entity, bucket) rollup table once; a range query then unions

    - the rollup rows for buckets FULLY covered by [a, b)   (tiny)
    - the grain rows for the partial buckets at both edges  (pruned scan)

and re-aggregates.  With the grain table written time-bucket-partitioned
(`sources/writers.write_time_bucketed`), the partial-bucket scan prunes
to at most two partitions — so query cost is O(entities) + O(two
buckets of grain), independent of the total history length.

Supported decomposable aggregates: sum / count / min / max (avg = sum
over count, recomposed at query time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BUCKET_FMT = {"month": "yyyy-MM", "day": "yyyy-MM-dd", "hour": "yyyy-MM-dd HH"}


def build_rollup(
    grain: DataFrame,
    entity_cols: list[str],
    ts_col: str,
    value_col: str,
    bucket: str = "month",
) -> DataFrame:
    """One-off materialization: per-(entity, bucket) partial aggregates.
    At scale this is written as a table alongside the grain data and
    maintained incrementally per ingested bucket."""
    b = F.date_trunc(bucket, F.col(ts_col)).alias("__bucket")
    return grain.groupBy(*entity_cols, b).agg(
        F.sum(value_col).alias("s"),
        F.count(F.lit(1)).alias("c"),
        F.min(value_col).alias("mn"),
        F.max(value_col).alias("mx"),
    )


def _parse_ts(ts) -> "datetime":
    from datetime import datetime

    if isinstance(ts, datetime):
        return ts
    if isinstance(ts, str):
        for fmt in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d"):
            try:
                return datetime.strptime(ts, fmt)
            except ValueError:
                continue
    raise ValueError(f"unsupported timestamp literal: {ts!r}")


def _bucket_floor(dt, bucket: str):
    if bucket == "month":
        return dt.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if bucket == "day":
        return dt.replace(hour=0, minute=0, second=0, microsecond=0)
    if bucket == "hour":
        return dt.replace(minute=0, second=0, microsecond=0)
    raise ValueError(f"unsupported bucket: {bucket}")


def _bucket_next(dt, bucket: str):
    from datetime import timedelta

    if bucket == "month":
        return dt.replace(year=dt.year + (dt.month // 12), month=dt.month % 12 + 1)
    return dt + (timedelta(days=1) if bucket == "day" else timedelta(hours=1))


def merge_rollup(
    rollup: DataFrame,
    appended_grain: DataFrame,
    entity_cols: list[str],
    ts_col: str,
    value_col: str,
    bucket: str = "month",
) -> DataFrame:
    """INCREMENTAL index maintenance: fold newly-appended grain rows
    into an existing rollup without touching historical grain.

    Every supported aggregate is decomposable (sum / count-as-sum /
    min / max), so re-aggregating ``rollup ∪ partials(append)`` equals
    ``build_rollup(grain ∪ append)`` exactly — pinned by
    tests/test_temporal_index.py.  The plan only shuffles what the
    append touched:

    - the append's partials are append-sized (one map-side-combined
      groupBy over the new rows only);
    - the TOUCHED-bucket set (distinct ``__bucket`` of the append —
      typically 1-2 for an ingest batch) broadcasts, splitting the
      rollup with a broadcast semi/anti join: untouched rows pass
      through with NO shuffle, only touched-bucket rows re-aggregate.

    Cost is O(|append| + |touched-bucket rollup rows|) + one streamed
    pass over the rollup — independent of total grain history, which
    is the point of an index at 100 TB (measured vs full rebuild in
    bench.py bench_temporal_store).  At scale, write the result
    partitioned by ``__bucket``: only touched partitions change, so a
    partition-overwrite (dynamic partitionOverwriteMode) rewrites just
    those directories."""
    partials = build_rollup(appended_grain, entity_cols, ts_col, value_col, bucket)
    touched = F.broadcast(partials.select("__bucket").distinct())
    untouched = rollup.join(touched, "__bucket", "left_anti")
    merged = (
        rollup.join(touched, "__bucket", "left_semi")
        .unionByName(partials)
        .groupBy(*entity_cols, "__bucket")
        .agg(
            F.sum("s").alias("s"),
            F.sum("c").alias("c"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )
    )
    return untouched.unionByName(merged.select(*untouched.columns))


def range_aggregate_indexed(
    grain: DataFrame,
    rollup: DataFrame,
    entity_cols: list[str],
    ts_col: str,
    value_col: str,
    start_ts,
    end_ts,
    bucket: str = "month",
) -> DataFrame:
    """Aggregate `value_col` over [start_ts, end_ts) per entity using the
    rollup for interior buckets and the grain only at the ragged edges.

    The bucket boundaries are computed DRIVER-SIDE from the range
    literals so every filter below is a plain literal comparison —
    Catalyst pushes them into the parquet scans (a `F.when` over column
    expressions here would silently disable pushdown and re-scan the
    full grain at 100 TB; plan-guarded in tests/test_plans.py).

    Returns (entities..., s, c, mn, mx, avg)."""
    start_dt = _parse_ts(start_ts)
    end_dt = _parse_ts(end_ts)
    b_lo = _bucket_floor(start_dt, bucket)
    # interior bucket window: [ceil_bucket(start), floor_bucket(end))
    interior_lo_dt = start_dt if b_lo == start_dt else _bucket_next(b_lo, bucket)
    interior_hi_dt = _bucket_floor(end_dt, bucket)

    start = F.lit(start_dt)
    end = F.lit(end_dt)
    interior_lo = F.lit(interior_lo_dt)
    interior_hi = F.lit(interior_hi_dt)

    full = rollup.filter(
        (F.col("__bucket") >= interior_lo) & (F.col("__bucket") < interior_hi)
    ).select(*entity_cols, "s", "c", "mn", "mx")

    # ragged edges: [start, interior_lo) and [interior_hi, end) — at most
    # two buckets of grain; the ts predicates prune partitions/row groups.
    # When the range spans no full bucket (interior window inverted or
    # empty), the WHOLE range is one edge — without this guard the two
    # edge predicates would overcount across the inversion.
    if interior_lo_dt < interior_hi_dt:
        edge_pred = ((F.col(ts_col) >= start) & (F.col(ts_col) < interior_lo)) | (
            (F.col(ts_col) >= interior_hi) & (F.col(ts_col) < end)
        )
    else:
        edge_pred = (F.col(ts_col) >= start) & (F.col(ts_col) < end)
    edges = grain.filter(edge_pred)
    edge_partials = edges.groupBy(*entity_cols).agg(
        F.sum(value_col).alias("s"),
        F.count(F.lit(1)).alias("c"),
        F.min(value_col).alias("mn"),
        F.max(value_col).alias("mx"),
    )

    return (
        full.unionByName(edge_partials)
        .groupBy(*entity_cols)
        .agg(
            F.sum("s").alias("s"),
            F.sum("c").alias("c"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )
        .withColumn("avg", F.col("s") / F.col("c"))
    )


def interval_to_changepoints(
    writes: DataFrame,
    entity_col: str = "entity_id",
    start_col: str = "t1",
    end_col: str = "t2",
    value_col: str = "value",
) -> DataFrame:
    """Interval write (value over [t1, t2)) -> change-point rows of the
    piecewise model: +value at t1, and at t2 the value reverts to the
    previous change-point's value (NULL sentinel here; a full revert
    requires as-of lookup against the existing history, i.e. one
    asof_join).  This is how the reference's setTemporalProperty(t1, t2,
    v) surface maps onto the immutable long table."""
    starts = writes.select(
        F.col(entity_col).alias("entity_id"),
        F.col(start_col).alias("ts"),
        F.col(value_col).alias("value"),
    )
    ends = writes.select(
        F.col(entity_col).alias("entity_id"),
        F.col(end_col).alias("ts"),
        F.lit(None).cast(starts.schema["value"].dataType).alias("value"),
    )
    return starts.unionByName(ends)
