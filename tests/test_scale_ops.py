"""Scale-tool operators: salted join correctness under skew, temporal
segments, watermark late-data semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from graph_spark.operators.relational import salted_join
from graph_spark.temporal.tprop import segments, value_at


def test_salted_join_equals_plain_join(spark):
    # 90% of left rows share one hot key
    left = spark.createDataFrame(
        [(0 if i % 10 else i, i) for i in range(2000)], ["k", "lid"]
    )
    right = spark.createDataFrame([(i, f"r{i}") for i in range(50)], ["k", "rv"])
    plain = sorted(map(tuple, left.join(right, "k").select("k", "lid", "rv").collect()))
    salted = sorted(map(tuple, salted_join(left, right, ["k"]).select("k", "lid", "rv").collect()))
    assert salted == plain


def test_salted_join_left_outer(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "lv"])
    right = spark.createDataFrame([(1, "x")], ["k", "rv"])
    rows = {r["k"]: r["rv"] for r in salted_join(left, right, ["k"], how="left").collect()}
    assert rows == {1: "x", 2: None}


def test_temporal_segments_roundtrip(spark):
    t = dt.datetime
    rows = [
        (1, t(2024, 1, 1), 10.0),
        (1, t(2024, 2, 1), 20.0),
        (1, t(2024, 3, 1), 30.0),
        (2, t(2024, 1, 15), 5.0),
    ]
    tp = spark.createDataFrame(rows, ["entity_id", "ts", "value"])
    segs = {(r["entity_id"], r["valid_from"]): (r["value"], r["valid_to"]) for r in segments(tp).collect()}
    assert segs[(1, t(2024, 1, 1))] == (10.0, t(2024, 2, 1))
    assert segs[(1, t(2024, 3, 1))] == (30.0, None)
    # point-read via value_at agrees with segment containment at t
    at = t(2024, 2, 15)
    va = {r["entity_id"]: r["value"] for r in value_at(tp, F.lit(at)).collect()}
    assert va == {1: 20.0, 2: 5.0}


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode aggregation with a watermark must drop an event that
    arrives after the watermark passed its window (real late-data
    semantics, complements the in-order S04 parity check)."""
    t = dt.datetime
    batch1 = [(1, t(2024, 1, 1, 10, 5), 1.0), (2, t(2024, 1, 1, 12, 0), 1.0)]
    # 10:20 is > 1 hour behind the max seen (12:00) => beyond the
    # 10-minute watermark for the 10:00 window; must be dropped
    batch2 = [(3, t(2024, 1, 1, 10, 20), 100.0), (4, t(2024, 1, 1, 13, 0), 1.0)]
    cols = ["event_id", "ts", "value"]
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    spark.createDataFrame(batch1, cols).coalesce(1).write.parquet(str(src_dir / "b1"))

    schema = spark.createDataFrame(batch1, cols).schema
    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(str(src_dir) + "/*")
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.sum("value").alias("v"))
    )
    q = (
        agg.writeStream.format("memory").queryName("late_sink").outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(batch2, cols).coalesce(1).write.parquet(str(src_dir / "b2"))
        q.processAllAvailable()
    finally:
        q.stop()
    out = {r["w"]["start"]: r["v"] for r in spark.table("late_sink").collect()}
    # the 10:00 window was finalized by the watermark after batch1's max
    # (12:00) -> event at 10:20 (value 100) must NOT be counted
    assert out.get(dt.datetime(2024, 1, 1, 10)) == 1.0


def test_approx_sketch_accuracy(spark):
    """q70's accuracy contract: HLL++ cardinality and quantile-summary
    median within 5% relative error of the exact values at sf0.01."""
    from graph_spark.queries.qsuite import QUERIES

    from .conftest import SF_ORACLE

    q70 = next(q for q in QUERIES if q.name == "q70_approx_sketches")
    approx = {r["o_orderpriority"]: r for r in q70.build(spark, SF_ORACLE).collect()}

    from graph_spark.catalog import Catalog

    o = Catalog(spark, SF_ORACLE).table("orders")
    exact = {
        r["o_orderpriority"]: r
        for r in o.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n"),
            F.expr("percentile(o_totalprice, 0.5)").alias("med"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for k, e in exact.items():
        a = approx[k]
        assert abs(a["approx_custs"] - e["n"]) / e["n"] < 0.05, (k, a, e)
        assert abs(a["approx_med"] - e["med"]) / e["med"] < 0.05, (k, a, e)
