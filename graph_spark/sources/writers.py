"""Sinks + 100 TB storage-layout utilities (SURVEY.md §2.A, §4.3).

The layout rules these helpers encode:
- Fact/temporal tables are written partitioned by a TIME BUCKET so
  temporal point-reads and range aggregates prune partitions before any
  shuffle (this replaces the reference system's temporal index).
- Join-heavy tables (graph edges) are written BUCKETED on the join key
  so repeated joins are co-located (no shuffle at read time).
- Target file size ~128-512 MB: repartition to a count derived from
  estimated bytes, never default parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_parquet_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_time_bucketed(
    df: DataFrame,
    path: str,
    ts_col: str,
    bucket: str = "month",
    mode: str = "overwrite",
) -> None:
    """Temporal long-table layout: one partition dir per time bucket.
    `value_at(t)` / `range_aggregate(a, b)` predicates on ts then prune
    to the touched buckets at the file-listing level."""
    out = df.withColumn("__bucket", F.date_format(F.date_trunc(bucket, F.col(ts_col)), "yyyy-MM"))
    out.write.mode(mode).partitionBy("__bucket").parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (hash-partitioned files + metastore
    metadata): equi-joins and aggregations on `bucket_col` across two
    tables bucketed the same way run with ZERO shuffle.  This is the
    persisted form of the graph edge view at scale."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name, format="parquet")


def upsert_scd1(
    current: DataFrame,
    updates: DataFrame,
    keys: list[str],
) -> DataFrame:
    """MERGE/upsert without Delta (SURVEY §4.3): latest-wins overwrite.
    anti-join keeps unmatched current rows, union brings in updates.
    Two shuffles on the keys; at scale both sides pre-bucketed on the
    keys makes this shuffle-free."""
    kept = current.join(updates.select(*keys), on=keys, how="left_anti")
    return kept.unionByName(updates)


def upsert_scd2(
    current: DataFrame,
    updates: DataFrame,
    keys: list[str],
    ts_col: str,
    end_col: str = "valid_to",
) -> DataFrame:
    """SCD-2 history-preserving upsert: close out the open row for each
    updated key (set valid_to = new row's ts) and append the new open
    rows.  Implemented as a window over (keys, ts) on the unioned set —
    the idiomatic valid-until-changed pattern on immutable storage."""
    from pyspark.sql import Window

    unioned = current.unionByName(updates, allowMissingColumns=True)
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc())
    return unioned.withColumn(end_col, F.lead(ts_col).over(w))
