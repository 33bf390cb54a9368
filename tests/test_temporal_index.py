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
