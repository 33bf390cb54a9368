"""TemporalPropertyStore — the engine's analog of the reference
system's get/setTemporalProperty API (a temporal property database's
write/read surface), over an append-only change-point log.

Model (SURVEY.md §1.2): a property value is a piecewise-constant
function of time.  Writes append change-points; nothing is updated in
place.  A point write (t, v) means "v from t until the next
change-point"; an interval write ([s, e), v) is exactly two
change-points: (s, v) and (e, NULL) — NULL meaning unset-after, so a
later covering write wins naturally.  Reads are the tprop operators:
latest-change-point-<=-t point reads, range aggregates, duration-
weighted averages, segment expansion, compaction.

Same-timestamp conflicts resolve by write sequence (last write wins),
mirroring a transactional store's commit order.  At 100 TB the log is
a time-bucket partitioned table (`sources/writers.write_time_bucketed`)
and each `write_*` call is an append of one bucket-partitioned file
set; reads prune buckets via the ts predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import tprop


class TemporalPropertyStore:
    """Append-only change-point log with TGraph-shaped accessors.

    The log schema is (entity_id, prop, ts, value, seq): `seq` is the
    write-sequence number assigned per write call (commit order).
    """

    def __init__(self, log: DataFrame, next_seq: int = 0):
        self.log = log
        self._next_seq = next_seq

    # ---- construction -------------------------------------------------

    @classmethod
    def empty(cls, spark, value_type: str = "double") -> "TemporalPropertyStore":
        schema = (
            "entity_id long, prop string, ts timestamp, "
            f"value {value_type}, seq long"
        )
        return cls(spark.createDataFrame([], schema))

    @classmethod
    def from_changepoints(
        cls, df: DataFrame, entity_col="entity_id", prop=None,
        ts_col="ts", value_col="value",
    ) -> "TemporalPropertyStore":
        """Bootstrap from an existing long table (one row per change)."""
        log = df.select(
            F.col(entity_col).cast("long").alias("entity_id"),
            (F.lit(prop) if prop is not None else F.col("prop")).alias("prop"),
            F.col(ts_col).alias("ts"),
            F.col(value_col).alias("value"),
            F.lit(0).cast("long").alias("seq"),
        )
        return cls(log, next_seq=1)

    # ---- writes (append-only) -----------------------------------------

    def write_points(
        self, df: DataFrame, entity_col="entity_id", prop=None,
        ts_col="ts", value_col="value",
    ) -> "TemporalPropertyStore":
        """Point writes: value valid from ts until the next change-point
        (the reference's setTemporalProperty(key, t, v))."""
        seq = self._next_seq
        rows = df.select(
            F.col(entity_col).cast("long").alias("entity_id"),
            (F.lit(prop) if prop is not None else F.col("prop")).alias("prop"),
            F.col(ts_col).alias("ts"),
            F.col(value_col).alias("value"),
            F.lit(seq).cast("long").alias("seq"),
        )
        return TemporalPropertyStore(self.log.unionByName(rows), seq + 1)

    def write_intervals(
        self, df: DataFrame, entity_col="entity_id", prop=None,
        start_col="start_ts", end_col="end_ts", value_col="value",
    ) -> "TemporalPropertyStore":
        """Interval writes: value valid on [start, end) — lowered to a
        (start, v) change-point plus an (end, NULL) unset marker, so the
        read path stays the plain piecewise-constant scan."""
        # two sequence slots: ends take `seq`, starts take `seq + 1`,
        # so ABUTTING intervals written in one call ([a,b) then [b,c))
        # resolve deterministically at the shared instant b — the new
        # start beats the old end instead of tying on row_number's
        # arbitrary partition order
        seq = self._next_seq
        ent = F.col(entity_col).cast("long").alias("entity_id")
        pr = (F.lit(prop) if prop is not None else F.col("prop")).alias("prop")
        starts = df.select(
            ent, pr, F.col(start_col).alias("ts"),
            F.col(value_col).alias("value"),
            F.lit(seq + 1).cast("long").alias("seq"),
        )
        ends = df.select(
            ent, pr, F.col(end_col).alias("ts"),
            F.lit(None).cast(dict(self.log.dtypes)["value"]).alias("value"),
            F.lit(seq).cast("long").alias("seq"),
        )
        return TemporalPropertyStore(
            self.log.unionByName(starts).unionByName(ends), seq + 2
        )

    # ---- reads --------------------------------------------------------

    def _prop(self, prop: str | None) -> DataFrame:
        # `is not None`, not truthiness: an empty-string prop name is a
        # legal key and must filter, not silently read the whole log
        return self.log.filter(F.col("prop") == prop) if prop is not None else self.log

    def value_at(self, at_ts, prop: str | None = None) -> DataFrame:
        """getTemporalProperty(key, t): latest change-point <= t per
        entity; same-ts conflicts resolve by write sequence."""
        return tprop.value_at(
            self._prop(prop), at_ts, tiebreak="seq"
        )

    def range_aggregate(self, start_ts, end_ts, prop: str | None = None,
                        aggs: dict | None = None) -> DataFrame:
        # resolve same-ts overwrites (last write wins) BEFORE
        # aggregating — the raw log would double-count a superseded
        # write; unset markers carry no value and drop out after
        return tprop.range_aggregate(
            self._latest_per_ts(prop).filter(F.col("value").isNotNull()),
            start_ts, end_ts, ["entity_id"], "value", aggs,
        )

    def time_weighted_avg(self, start_ts, end_ts, prop: str | None = None) -> DataFrame:
        # NULL unset markers must survive INTO the segment expansion:
        # they terminate the preceding value's segment (dropping them
        # first would bleed the value over the unset span); the operator
        # zero-weights the null segments themselves after the lead()
        return tprop.time_weighted_avg(self._latest_per_ts(prop), start_ts, end_ts)

    def segments(self, prop: str | None = None) -> DataFrame:
        """Validity intervals (entity, value, valid_from, valid_to)."""
        return tprop.segments(self._latest_per_ts(prop))

    def compacted(self, prop: str | None = None) -> DataFrame:
        """Change-point log with redundant writes dropped (LSM-compaction
        analog); point reads over it are identical."""
        return tprop.compact_changepoints(self._latest_per_ts(prop))

    def _latest_per_ts(self, prop: str | None) -> DataFrame:
        """Collapse same-(entity, ts) writes to the latest sequence —
        the merge step an LSM store does on read/compaction.

        max(struct(seq, value)) instead of a row_number window: the
        aggregate is map-side combinable and needs no per-partition
        SORT of the whole log (the window form exchanged AND sorted all
        rows by (entity, prop, ts, seq) first).  Seq ties — undefined
        commit order, previously partition-layout-arbitrary — now
        resolve deterministically to the larger value (nulls-first
        struct ordering), which no oracle-matched query can have
        depended on.

        Requires `value` to be an ORDERABLE Spark type (the struct
        comparator inspects it on seq ties); a map-typed value column
        would fail at analysis where the old row_number form did not —
        acceptable because the store's write path only ever mints
        atomic value columns."""
        return (
            self._prop(prop)
            .groupBy("entity_id", "prop", "ts")
            .agg(F.max(F.struct("seq", "value")).alias("__m"))
            .select(
                "entity_id",
                "prop",
                "ts",
                F.col("__m.value").alias("value"),
                F.col("__m.seq").alias("seq"),
            )
        )

    def write_unsets(
        self, df: DataFrame, entity_col="entity_id", prop=None, ts_col="ts"
    ) -> "TemporalPropertyStore":
        """Explicit unset (delete-from-t-onward): a NULL change-point —
        the property has no value from ts until a later write covers
        it.  The removeTemporalProperty analog, kept append-only."""
        seq = self._next_seq
        rows = df.select(
            F.col(entity_col).cast("long").alias("entity_id"),
            (F.lit(prop) if prop is not None else F.col("prop")).alias("prop"),
            F.col(ts_col).alias("ts"),
            F.lit(None).cast(dict(self.log.dtypes)["value"]).alias("value"),
            F.lit(seq).cast("long").alias("seq"),
        )
        return TemporalPropertyStore(self.log.unionByName(rows), seq + 1)

    def timeline(self, start_ts, end_ts, prop: str | None = None) -> DataFrame:
        """Range read of the piecewise function itself: validity
        segments CLIPPED to [start, end), including the prefix of the
        segment straddling start — the getTemporalProperty(key, range)
        timeline form, not an aggregate.  Returns (entity_id, value,
        valid_from, valid_to) with NULL-valued (unset) spans dropped."""
        seg = tprop.segments(self._latest_per_ts(prop))
        clipped_from = F.greatest(F.col("valid_from"), F.lit(start_ts).cast("timestamp"))
        clipped_to = F.least(
            F.coalesce(F.col("valid_to"), F.lit(end_ts).cast("timestamp")),
            F.lit(end_ts).cast("timestamp"),
        )
        return (
            seg.filter(F.col("value").isNotNull())
            .withColumn("valid_from", clipped_from)
            .withColumn("valid_to", clipped_to)
            .filter(F.col("valid_from") < F.col("valid_to"))
        )

    def values_at_many(self, probes: DataFrame, prop: str | None = None,
                       entity_col="entity_id", ts_col="ts") -> DataFrame:
        """Batch point-read at PER-ROW timestamps: for each probe
        (entity, t), the latest change-point <= t — the as-of join over
        the store, serving a workload of mixed-time lookups in ONE pass
        instead of one value_at() job per timestamp."""
        from ..operators.relational import asof_join

        left = probes.select(
            F.col(entity_col).cast("long").alias("entity_id"),
            F.col(ts_col).alias("__t"),
        )
        # wrap the value in a struct: the as-of fill skips NULLs, and a
        # bare NULL unset marker would wrongly resurrect the previous
        # value — the non-null struct carries the unset through
        right = self._latest_per_ts(prop).select(
            "entity_id", F.col("ts").alias("__rt"), F.struct("value").alias("__v")
        )
        return asof_join(
            left, right, ["entity_id"], "__t", "__rt"
        ).select(
            "entity_id",
            F.col("__t").alias("ts"),
            F.col("asof___v.value").alias("value"),
        )

    def align(self, props: list) -> DataFrame:
        """Widen several properties onto the union of their
        change-points with per-column forward fill (temporal join).

        Same-ts overwrite resolution rides INSIDE align's own pivot
        aggregation (seq_col): one shuffle on (entity, ts) + the fill
        window, instead of a separate full-log dedup pass first."""
        return tprop.align(self.log, props, seq_col="seq")
