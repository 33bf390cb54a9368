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

import threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Serializes in-process writers that toggle session-wide SQL confs
# (write_time_bucketed): the per-write parquet option
# `outputTimestampType` is ignored by Spark 4.1 (verified: INT96 still
# written), so the session conf is the only lever, and two threads of
# one session must not interleave toggle/restore.  Cross-session
# writers are unaffected (SQL confs are per-session).
_SESSION_CONF_LOCK = threading.Lock()

__all__ = [
    "write_parquet_partitioned",
    "write_time_bucketed",
    "write_bucketed_table",
    "upsert_scd1",
    "upsert_scd2",
    "zorder_value",
    "write_zordered",
    "write_xml",
]


def write_xml(
    df: DataFrame, path: str, row_tag: str = "row", root_tag: str = "rows"
) -> None:
    """XML sink (re-exported: the implementation lives beside its reader
    in readers.py so the rowTag contract stays in one file; sinks are
    FOUND here)."""
    from .readers import write_xml as _impl

    _impl(df, path, row_tag=row_tag, root_tag=root_tag)


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
    to the touched buckets at the file-listing level.

    Timestamps are written as TIMESTAMP_MICROS (int64) for THIS write
    regardless of the session default: Spark's Hive-compat INT96
    default carries NO parquet min/max statistics, which would silently
    disable the row-group/footer pruning this layout exists for — the
    int64 physical is what turns a ts predicate into skipped IO (the
    engine's replacement for a temporal index; measured in bench.py
    bench_temporal_store).

    CONCURRENCY (ADVICE r7): the int64 physical is pinned by toggling
    the session-wide conf around this write (the per-write parquet
    option is ignored — verified on Spark 4.1), so a concurrent parquet
    write from ANOTHER thread of the same SparkSession would inherit
    TIMESTAMP_MICROS or race the restore.  In-process callers are
    serialized by _SESSION_CONF_LOCK; writers that must run truly
    concurrently should use a cloned session (``spark.newSession()``
    shares the SparkContext but isolates the SQL conf)."""
    fmts = {"year": "yyyy", "month": "yyyy-MM", "day": "yyyy-MM-dd",
            "hour": "yyyy-MM-dd-HH"}
    if bucket not in fmts:
        raise ValueError(
            f"write_time_bucketed: bucket must be one of {sorted(fmts)}, "
            f"got {bucket!r}"
        )
    spark = df.sparkSession
    key = "spark.sql.parquet.outputTimestampType"
    with _SESSION_CONF_LOCK:
        prev = spark.conf.get(key, "INT96")
        spark.conf.set(key, "TIMESTAMP_MICROS")
        try:
            out = df.withColumn(
                "__bucket",
                F.date_format(F.date_trunc(bucket, F.col(ts_col)), fmts[bucket]),
            )
            out.write.mode(mode).partitionBy("__bucket").parquet(path)
        finally:
            spark.conf.set(key, prev)


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
    the idiomatic valid-until-changed pattern on immutable storage.

    Rows already carrying a non-null `end_col` (closed history, e.g. a
    tombstoned record with no successor) pass through UNTOUCHED: only
    open rows get their valid_to from the lead() — recomputing it for
    everything would retroactively reopen or extend closed spans."""
    from pyspark.sql import Window

    unioned = current.unionByName(updates, allowMissingColumns=True)
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc())
    nxt = F.lead(ts_col).over(w)
    if end_col in unioned.columns:
        return unioned.withColumn(end_col, F.coalesce(F.col(end_col), nxt))
    return unioned.withColumn(end_col, nxt)


def zorder_value(col_a, col_b, bits: int = 16):
    """Interleave the low `bits` bits of two non-negative integral
    columns into one Morton (Z-order) value — built-in bit expressions
    only, unrolled at plan-build time, whole-stage codegen eligible."""
    z = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    for i in range(bits):
        bit_a = F.shiftright(col_a.cast("long"), i).bitwiseAND(one)
        bit_b = F.shiftright(col_b.cast("long"), i).bitwiseAND(one)
        z = z.bitwiseOR(F.shiftleft(bit_a, 2 * i)).bitwiseOR(
            F.shiftleft(bit_b, 2 * i + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet layout: range-partition + sort the data
    by the Morton interleave of two lookup columns, so parquet
    row-group/file min-max stats are SELECTIVE ON BOTH columns at once.

    Single-column sorting makes stats selective on that column only — a
    predicate on the other column matches every file.  The Z-curve
    keeps both dimensions locally contiguous, so a conjunctive point or
    range predicate prunes most files at planning time (the same trick
    Delta/Iceberg OPTIMIZE ZORDER applies).  Cost: one min/max agg
    (broadcast scalars) + one range-exchange + in-partition sort —
    identical shuffle budget to any clustered write.

    Both columns are min-max scaled to the full `bits` width before
    interleaving: with unequal raw domains (a 16-bit orderkey vs an
    11-bit partkey) the wider column's high bits dominate the curve
    and the narrow column gets no file-level selectivity.  Heavily
    skewed domains additionally want rank compression upstream."""
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).first()
    top = (1 << bits) - 1

    def _scaled(c, lo, hi):
        if hi is None or lo is None or hi <= lo:
            return F.lit(0).cast("long")
        return (
            (F.col(c).cast("double") - float(lo)) * top / (float(hi) - float(lo))
        ).cast("long")

    z = zorder_value(_scaled(col_a, lo_a, hi_a), _scaled(col_b, lo_b, hi_b), bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
