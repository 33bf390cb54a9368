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
