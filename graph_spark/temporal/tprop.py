"""Temporal property operators (SURVEY.md §2.D / G07-G10).

Model: a temporal property is a long-format DataFrame
(entity_id, prop, ts, value-or-delta) — one row per change-point,
piecewise semantics recovered with window functions or filtered
aggregates.  This replaces the reference system's temporal index with
storage-layout pruning: at 100 TB the long table is written partitioned
by time bucket (e.g. month), so `value_at` / `range_aggregate` prune
partitions via the ts predicate before any shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def value_at(
    tprop: DataFrame,
    at_ts,
    entity_col: str = "entity_id",
    ts_col: str = "ts",
    value_col: str = "value",
    cumulative: bool = False,
    tiebreak: str | None = None,
) -> DataFrame:
    """Point-read: property value per entity as of `at_ts`.

    cumulative=False  -> piecewise-constant: latest change-point <= t
                         (`tiebreak` column disambiguates same-ts writes).
    cumulative=True   -> delta semantics: sum of deltas <= t.
    The ts filter is pushed to the scan (partition pruning at scale).
    """
    filtered = tprop.filter(F.col(ts_col) <= at_ts)
    if cumulative:
        return filtered.groupBy(entity_col).agg(F.sum(value_col).alias("value"))
    order = [F.col(ts_col).desc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).desc())
    w = Window.partitionBy(entity_col).orderBy(*order)
    return (
        filtered.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(entity_col, F.col(value_col).alias("value"))
    )


def range_aggregate(
    tprop: DataFrame,
    start_ts,
    end_ts,
    group_cols,
    value_col: str,
    aggs: dict | None = None,
) -> DataFrame:
    """Temporal range aggregate: min/max/avg/... of values with
    start <= ts < end, grouped by `group_cols` (the reference system's
    aggregate-over-interval analog; its aggregation index becomes
    parquet min/max pruning + partial aggregation here)."""
    aggs = aggs or {"mn": F.min, "mx": F.max, "avg": F.avg}
    filtered = tprop.filter((F.col("ts") >= start_ts) & (F.col("ts") < end_ts))
    return filtered.groupBy(*group_cols).agg(
        *[fn(value_col).alias(name) for name, fn in aggs.items()]
    )


def time_weighted_avg(
    tprop: DataFrame,
    start_ts,
    end_ts,
    entity_col: str = "entity_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Duration-weighted mean of a piecewise-constant property over
    [start_ts, end_ts) — the temporal-aggregate semantic the reference
    system serves from its aggregation index (TGraph aggregate-over-
    interval, duration-weighted).

    Change-points expand to validity segments with one window shuffle on
    the entity key; each segment is clipped to the query range and
    weighted by its clipped duration in days.  Segments entirely outside
    the range drop out (clipped duration <= 0).  A change-point BEFORE
    start_ts still contributes the in-range prefix of its segment, which
    is what makes this a true piecewise read rather than a filtered agg.

    At 100 TB the long table is time-bucket partitioned; only buckets
    overlapping [start, end) plus the one carrying the last prior
    change-point are read (callers bound the lookback the same way the
    reference bounds its index scan).

    Returns (entity, twa) with twa = round(round(sum(v*days),2)/sum(days), 6):
    the weighted sum is rounded before the division so cross-engine
    summation-order ulp drift cannot flip the final rounding.
    """
    w = Window.partitionBy(entity_col).orderBy(F.col(ts_col).asc())
    seg = tprop.select(
        entity_col,
        F.col(value_col).alias("v"),
        F.col(ts_col).alias("vf"),
        F.lead(ts_col).over(w).alias("vt"),
    )
    s = F.greatest(F.col("vf"), start_ts)
    e = F.least(F.coalesce(F.col("vt"), end_ts), end_ts)
    days = F.datediff(e.cast("date"), s.cast("date"))
    # null-valued rows (unset markers) participate in the lead() above —
    # they TERMINATE the previous value's segment — but carry no weight
    # themselves; filtering them before the expansion would bleed the
    # prior value across the unset span
    clipped = (
        seg.withColumn("days", days)
        .filter(F.col("days") > 0)
        .filter(F.col("v").isNotNull())
    )
    return (
        clipped.groupBy(entity_col)
        .agg(
            F.round(F.sum(F.col("v") * F.col("days")), 2).alias("ws"),
            F.sum("days").alias("wd"),
        )
        .select(
            entity_col,
            F.round(F.col("ws") / F.col("wd"), 6).alias("twa"),
        )
    )


def snapshot(temporal_edges: DataFrame, at_ts, ts_col: str = "ts") -> DataFrame:
    """Graph snapshot: keep only edge events visible at `at_ts`."""
    return temporal_edges.filter(F.col(ts_col) <= at_ts)


def segments(
    tprop: DataFrame,
    entity_col: str = "entity_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Expand change-points into validity segments
    (entity, value, valid_from, valid_to) — valid_to NULL for the open
    segment.  This is the interval-read form of the piecewise-constant
    model (the reference's interval write/read surface): a point-read at
    t is `valid_from <= t AND (valid_to IS NULL OR t < valid_to)`.
    One window shuffle on the entity key."""
    w = Window.partitionBy(entity_col).orderBy(F.col(ts_col).asc())
    return tprop.select(
        entity_col,
        F.col(value_col).alias("value"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
    )


def align(
    tprop: DataFrame,
    props: list,
    entity_col: str = "entity_id",
    prop_col: str = "prop",
    ts_col: str = "ts",
    value_col: str = "value",
    seq_col: str | None = None,
) -> DataFrame:
    """Temporal align-join (the temporal-DB "temporal join"): widen
    several piecewise-constant properties of one entity onto the UNION
    of their change-points, forward-filling each column — at any output
    row, column `p` holds p's latest value <= that row's ts (NULL before
    p's first change-point).

    This is how two temporal properties are combined (ratio, product,
    comparison) without resampling to a fixed grid: the result is still
    a change-point series, exact at every instant.

    Same-ts writes to different props merge into one output row (the
    pre-pivot groupBy); same-ts writes to the SAME prop must be
    disambiguated upstream — OR pass ``seq_col`` and the merge itself
    resolves them last-write-wins inside the SAME aggregation
    (max(struct(seq, wrapped value)) per prop), which is how the
    store's align path avoids a whole separate dedup pass+exchange
    over the log.  The ``seq_col`` path requires ``value_col`` to be an
    ORDERABLE Spark type (the struct comparator inspects the value on
    seq ties) — map-typed values fail at analysis; disambiguate those
    upstream instead.  Cost: one partial-aggregated shuffle on
    (entity, ts) + one window shuffle on entity — at 100 TB both run
    within time-bucket partitions with the standard bucket-edge stitch
    (carry each prop's last value across the bucket boundary).
    """
    sel = tprop.filter(F.col(prop_col).isin(list(props)))

    # STRUCT-wrap each prop's value before the pivot: the forward fill
    # below must distinguish "no change for p at this ts" (null struct,
    # skipped by ignorenulls) from "p UNSET at this ts" (non-null struct
    # carrying a null value, which correctly overwrites the fill) — the
    # same trick values_at_many uses for its as-of fill
    def picked(p):
        wrapped = F.struct(F.col(value_col).alias("v"))
        if seq_col is None:
            return F.max(F.when(F.col(prop_col) == p, wrapped))
        return F.max(
            F.when(F.col(prop_col) == p, F.struct(F.col(seq_col).alias("s"), wrapped.alias("w")))
        ).getField("w")

    merged = sel.groupBy(entity_col, ts_col).agg(
        *[picked(p).alias(f"__d_{p}") for p in props]
    )
    w = (
        Window.partitionBy(entity_col)
        .orderBy(F.col(ts_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return merged.select(
        entity_col,
        ts_col,
        *[
            F.last(f"__d_{p}", ignorenulls=True).over(w).getField("v").alias(p)
            for p in props
        ],
    )


def compact_changepoints(
    tprop: DataFrame,
    entity_col: str = "entity_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Drop change-points whose value equals the previous change-point's
    value — the LSM-compaction analog for piecewise-constant series:
    redundant writes carry no information, so point/range reads over the
    compacted table return identical results with less data.  ONE window
    shuffle on the entity key; at 100 TB run per time-bucket partition
    and stitch bucket edges (last row of bucket b vs first of b+1).

    Comparison is null-safe: NULL is a legal change-point value (the
    unset marker an interval write leaves at its end), so `value !=
    prev` alone would silently drop every unset marker — row_number
    distinguishes "first change-point" from "previous value was NULL".
    """
    w = Window.partitionBy(entity_col).orderBy(F.col(ts_col).asc())
    prev = F.lag(value_col).over(w)
    first = F.row_number().over(w) == 1
    return (
        tprop.withColumn("__keep", first | ~F.col(value_col).eqNullSafe(prev))
        .filter(F.col("__keep"))
        .drop("__keep")
    )
