"""Temporal aggregate index: rollup + edge-merge must equal direct
aggregation for aligned and ragged ranges."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from graph_spark.catalog import Catalog
from graph_spark.temporal.aggregate_index import (
    build_rollup,
    interval_to_changepoints,
    range_aggregate_indexed,
)

from .conftest import SF_SMOKE


def _direct(grain, start, end):
    return (
        grain.filter((F.col("ts") >= F.lit(start).cast("timestamp")) & (F.col("ts") < F.lit(end).cast("timestamp")))
        .groupBy("entity_id")
        .agg(
            F.sum("value").alias("s"),
            F.count(F.lit(1)).alias("c"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .withColumn("avg", F.col("s") / F.col("c"))
    )


@pytest.mark.parametrize(
    "start,end",
    [
        ("1996-01-01", "1999-01-01"),      # bucket-aligned
        ("1996-01-15", "1998-11-20"),      # ragged both edges
        ("1997-03-01", "1997-03-10"),      # inside one bucket, aligned start
        ("1997-03-05", "1997-03-20"),      # inside one bucket, both ragged
        ("1997-03-05", "1997-04-10"),      # ragged, no full interior bucket
        ("1997-03-05", "1997-03-05"),      # empty unaligned range
    ],
)
def test_indexed_range_agg_equals_direct(spark, start, end):
    o = Catalog(spark, SF_SMOKE).table("orders")
    grain = o.select(
        F.col("o_custkey").alias("entity_id"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_totalprice").alias("value"),
    )
    rollup = build_rollup(grain, ["entity_id"], "ts", "value", bucket="month")
    got = range_aggregate_indexed(grain, rollup, ["entity_id"], "ts", "value", start, end)
    want = _direct(grain, start, end)
    g = {r["entity_id"]: (r["s"], r["c"], r["mn"], r["mx"]) for r in got.collect()}
    w = {r["entity_id"]: (r["s"], r["c"], r["mn"], r["mx"]) for r in want.collect()}
    assert set(g) == set(w)
    for k in w:
        assert g[k][1] == w[k][1], f"count {k}"
        assert abs(g[k][0] - w[k][0]) < 1e-6, f"sum {k}"
        assert g[k][2] == w[k][2] and g[k][3] == w[k][3], f"minmax {k}"


def test_merge_rollup_equals_rebuild(spark):
    """Incremental maintenance contract: merge_rollup(rollup(old),
    append) must equal build_rollup(old ∪ append) EXACTLY — every
    aggregate is decomposable, and untouched buckets pass through
    unchanged (VERDICT r7 item 7)."""
    from graph_spark.temporal.aggregate_index import merge_rollup

    o = Catalog(spark, SF_SMOKE).table("orders")
    grain = o.select(
        F.col("o_custkey").alias("entity_id"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_totalprice").alias("value"),
    )
    old = grain.filter(F.col("ts") < F.lit("1997-06-15").cast("timestamp"))
    # the append straddles a touched bucket (1997-06 has old rows too)
    # and brand-new buckets after it
    append = grain.filter(F.col("ts") >= F.lit("1997-06-15").cast("timestamp"))
    merged = merge_rollup(
        build_rollup(old, ["entity_id"], "ts", "value", bucket="month"),
        append,
        ["entity_id"],
        "ts",
        "value",
        bucket="month",
    )
    want = build_rollup(grain, ["entity_id"], "ts", "value", bucket="month")
    key = lambda r: (r["entity_id"], r["__bucket"])
    g = {key(r): (r["s"], r["c"], r["mn"], r["mx"]) for r in merged.collect()}
    w = {key(r): (r["s"], r["c"], r["mn"], r["mx"]) for r in want.collect()}
    assert set(g) == set(w)
    for k in w:
        assert g[k][1] == w[k][1], f"count {k}"
        assert abs(g[k][0] - w[k][0]) < 1e-6, f"sum {k}"
        assert g[k][2] == w[k][2] and g[k][3] == w[k][3], f"minmax {k}"


def test_interval_writes_to_changepoints(spark):
    t = dt.datetime
    writes = spark.createDataFrame(
        [(1, t(2024, 1, 1), t(2024, 2, 1), 5.0)], ["entity_id", "t1", "t2", "value"]
    )
    cps = sorted(
        ((r["entity_id"], r["ts"], r["value"]) for r in interval_to_changepoints(writes).collect()),
        key=lambda x: x[1],
    )
    assert cps == [(1, t(2024, 1, 1), 5.0), (1, t(2024, 2, 1), None)]


class TestTemporalPropertyStore:
    def _store(self, spark):
        from graph_spark.temporal.store import TemporalPropertyStore

        st = TemporalPropertyStore.empty(spark)
        pts = spark.createDataFrame(
            [(1, "2024-01-01 00:00:00", 10.0), (1, "2024-01-10 00:00:00", 20.0),
             (2, "2024-01-05 00:00:00", 5.0)],
            "entity_id long, ts_s string, value double",
        ).select("entity_id", F.col("ts_s").cast("timestamp").alias("ts"), "value")
        st = st.write_points(pts, prop="speed")
        iv = spark.createDataFrame(
            [(1, "2024-01-03 00:00:00", "2024-01-06 00:00:00", 99.0)],
            "entity_id long, s string, e string, value double",
        ).select(
            "entity_id",
            F.col("s").cast("timestamp").alias("start_ts"),
            F.col("e").cast("timestamp").alias("end_ts"),
            "value",
        )
        return st.write_intervals(iv, prop="speed")

    def test_point_reads_respect_interval_and_sequence(self, spark):
        st = self._store(spark)

        def val(ts, eid):
            rows = {r["entity_id"]: r["value"]
                    for r in st.value_at(F.lit(ts).cast("timestamp"), "speed").collect()}
            return rows.get(eid)

        assert val("2024-01-02 00:00:00", 1) == 10.0   # before interval
        assert val("2024-01-04 00:00:00", 1) == 99.0   # inside interval
        assert val("2024-01-07 00:00:00", 1) is None   # unset marker after end
        assert val("2024-01-11 00:00:00", 1) == 20.0   # later point write wins
        assert val("2024-01-06 00:00:00", 2) == 5.0

    def test_same_ts_last_write_wins(self, spark):
        from graph_spark.temporal.store import TemporalPropertyStore

        st = TemporalPropertyStore.empty(spark)
        t = "2024-01-01 00:00:00"
        mk = lambda v: spark.createDataFrame(
            [(1, t, v)], "entity_id long, ts_s string, value double"
        ).select("entity_id", F.col("ts_s").cast("timestamp").alias("ts"), "value")
        st = st.write_points(mk(1.0), prop="p").write_points(mk(2.0), prop="p")
        got = st.value_at(F.lit("2024-06-01").cast("timestamp"), "p").collect()
        assert got[0]["value"] == 2.0

    def test_segments_and_compaction_preserve_reads(self, spark):
        st = self._store(spark)
        segs = {(r["entity_id"], str(r["valid_from"])): (r["value"], r["valid_to"])
                for r in st.segments("speed").collect()}
        assert segs[(1, "2024-01-03 00:00:00")][0] == 99.0
        # compacted log must give identical point reads
        from graph_spark.temporal import tprop

        compact = st.compacted("speed")
        for ts in ["2024-01-02", "2024-01-04", "2024-01-07", "2024-01-11"]:
            a = {r["entity_id"]: r["value"] for r in st.value_at(
                F.lit(ts).cast("timestamp"), "speed").collect()}
            b = {r["entity_id"]: r["value"] for r in tprop.value_at(
                compact, F.lit(ts).cast("timestamp"), tiebreak="seq").collect()}
            assert a == b, ts


def test_store_timeline_values_at_many_and_unsets(spark):
    """New store surfaces: timeline clipping (straddling segment keeps
    its in-range prefix), per-row-timestamp batch reads (including the
    NULL-unset case the naive as-of fill would resurrect), and align."""
    import datetime as dt

    from graph_spark.temporal.store import TemporalPropertyStore

    T = lambda s: dt.datetime.fromisoformat(s)
    pts = spark.createDataFrame(
        [(1, T("2024-01-01"), 10.0), (1, T("2024-01-10"), 20.0),
         (2, T("2024-01-05"), 5.0)],
        ["entity_id", "ts", "value"],
    )
    st = TemporalPropertyStore.empty(spark).write_points(pts, prop="p")
    st = st.write_unsets(
        spark.createDataFrame([(2, T("2024-01-20"))], ["entity_id", "ts"]), prop="p"
    )

    # timeline over [01-05, 01-15): e1's first segment straddles the start
    tl = {
        (r["entity_id"], r["valid_from"], r["valid_to"]): r["value"]
        for r in st.timeline(T("2024-01-05"), T("2024-01-15"), prop="p").collect()
    }
    assert tl[(1, T("2024-01-05"), T("2024-01-10"))] == 10.0
    assert tl[(1, T("2024-01-10"), T("2024-01-15"))] == 20.0
    assert tl[(2, T("2024-01-05"), T("2024-01-15"))] == 5.0

    probes = spark.createDataFrame(
        [(1, T("2024-01-02")), (1, T("2024-01-12")), (2, T("2024-01-25")),
         (2, T("2024-01-01"))],
        ["entity_id", "ts"],
    )
    got = {(r["entity_id"], r["ts"]): r["value"]
           for r in st.values_at_many(probes, prop="p").collect()}
    assert got[(1, T("2024-01-02"))] == 10.0
    assert got[(1, T("2024-01-12"))] == 20.0
    assert got[(2, T("2024-01-25"))] is None  # unset must NOT resurrect 5.0
    assert got[(2, T("2024-01-01"))] is None  # before first write

    st2 = st.write_points(
        spark.createDataFrame([(1, T("2024-01-03"), 7.0)], ["entity_id", "ts", "value"]),
        prop="q",
    )
    al = {(r["entity_id"], r["ts"]): (r["p"], r["q"]) for r in st2.align(["p", "q"]).collect()}
    assert al[(1, T("2024-01-03"))] == (10.0, 7.0)
    assert al[(1, T("2024-01-10"))] == (20.0, 7.0)


def test_store_read_paths_respect_unsets_and_lww(spark):
    """r7 self-review regressions: (a) time_weighted_avg must stop
    weighting a value at its NULL unset marker, (b) range_aggregate
    must resolve same-ts overwrites (last write wins) before
    aggregating, (c) align must NOT resurrect a value past its unset,
    (d) same-ts writes to DIFFERENT props must both survive the
    per-(entity, prop, ts) collapse, (e) abutting intervals written in
    one call resolve deterministically at the shared instant."""
    import datetime as dt

    from graph_spark.temporal.store import TemporalPropertyStore

    T = lambda s: dt.datetime.fromisoformat(s)

    # (a) value 10 on [01-01, 01-05) then unset; probe window [01-01, 01-11)
    st = TemporalPropertyStore.empty(spark).write_intervals(
        spark.createDataFrame(
            [(1, T("2024-01-01"), T("2024-01-05"), 10.0)],
            ["entity_id", "start_ts", "end_ts", "value"],
        ),
        prop="p",
    )
    twa = st.time_weighted_avg(
        F.lit("2024-01-01").cast("timestamp"), F.lit("2024-01-11").cast("timestamp"), "p"
    ).collect()
    # 4 weighted days of 10.0, 6 unset days carry NO weight -> mean 10.0
    assert twa[0]["twa"] == 10.0

    # (b) same-ts overwrite: range agg sees only the winning write
    mk = lambda v: spark.createDataFrame(
        [(1, T("2024-01-02"), v)], ["entity_id", "ts", "value"]
    )
    st2 = (
        TemporalPropertyStore.empty(spark)
        .write_points(mk(1.0), prop="p")
        .write_points(mk(2.0), prop="p")
    )
    ra = st2.range_aggregate(
        F.lit("2024-01-01").cast("timestamp"), F.lit("2024-02-01").cast("timestamp"), "p"
    ).collect()[0]
    assert (ra["mn"], ra["mx"], ra["avg"]) == (2.0, 2.0, 2.0)

    # (c) align past an unset: p unset at 01-20, q changes at 01-25
    st3 = (
        TemporalPropertyStore.empty(spark)
        .write_points(
            spark.createDataFrame([(1, T("2024-01-01"), 10.0)], ["entity_id", "ts", "value"]),
            prop="p",
        )
        .write_unsets(
            spark.createDataFrame([(1, T("2024-01-20"))], ["entity_id", "ts"]), prop="p"
        )
        .write_points(
            spark.createDataFrame([(1, T("2024-01-25"), 7.0)], ["entity_id", "ts", "value"]),
            prop="q",
        )
    )
    al = {r["ts"]: (r["p"], r["q"]) for r in st3.align(["p", "q"]).collect()}
    assert al[T("2024-01-20")] == (None, None)
    assert al[T("2024-01-25")] == (None, 7.0)  # p must NOT resurrect 10.0

    # (d) same-ts writes to two different props both survive
    st4 = (
        TemporalPropertyStore.empty(spark)
        .write_points(
            spark.createDataFrame([(1, T("2024-01-05"), 1.0)], ["entity_id", "ts", "value"]),
            prop="p",
        )
        .write_points(
            spark.createDataFrame([(1, T("2024-01-05"), 2.0)], ["entity_id", "ts", "value"]),
            prop="q",
        )
    )
    al4 = {r["ts"]: (r["p"], r["q"]) for r in st4.align(["p", "q"]).collect()}
    assert al4[T("2024-01-05")] == (1.0, 2.0)

    # (e) abutting intervals in ONE call: at the boundary the new
    # interval's value wins over the old one's end marker, under any
    # shuffle layout
    st5 = TemporalPropertyStore.empty(spark).write_intervals(
        spark.createDataFrame(
            [(1, T("2024-01-01"), T("2024-01-05"), 5.0),
             (1, T("2024-01-05"), T("2024-01-09"), 7.0)],
            ["entity_id", "start_ts", "end_ts", "value"],
        ),
        prop="p",
    )
    v = st5.value_at(F.lit("2024-01-05").cast("timestamp"), "p").collect()
    assert v[0]["value"] == 7.0


def test_scd2_closed_rows_untouched(spark):
    """upsert_scd2 must not reopen or extend already-closed history."""
    import datetime as dt

    from graph_spark.sources.writers import upsert_scd2

    t = dt.datetime
    cur = spark.createDataFrame(
        [(1, 10.0, t(2024, 1, 1), t(2024, 2, 1))], ["k", "v", "ts", "valid_to"]
    )
    upd = spark.createDataFrame([(1, 20.0, t(2024, 6, 1))], ["k", "v", "ts"])
    rows = {
        (r["k"], r["ts"]): r["valid_to"]
        for r in upsert_scd2(cur, upd, ["k"], "ts").collect()
    }
    assert rows[(1, t(2024, 1, 1))] == t(2024, 2, 1)  # closed row untouched
    assert rows[(1, t(2024, 6, 1))] is None  # new row open


def test_time_bucketed_day_granularity(spark, tmp_path):
    """bucket='day' must produce per-DAY partition dirs, not months."""
    import datetime as dt
    import os

    from graph_spark.sources.writers import write_time_bucketed

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 5), 1.0), (2, dt.datetime(2024, 1, 2, 6), 2.0)],
        ["entity_id", "ts", "value"],
    )
    path = str(tmp_path / "by_day")
    write_time_bucketed(df, path, "ts", bucket="day")
    dirs = sorted(d for d in os.listdir(path) if d.startswith("__bucket="))
    assert dirs == ["__bucket=2024-01-01", "__bucket=2024-01-02"]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bucket must be one of"):
        write_time_bucketed(df, path, "ts", bucket="fortnight")
