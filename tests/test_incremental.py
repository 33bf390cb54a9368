"""Incremental view maintenance: streamed merges must equal the batch
recompute of the graph view, through a real foreachBatch stream."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_spark.catalog import Catalog
from graph_spark.streaming.incremental import (
    IncrementalAggView,
    grain_from_lineitem,
    sales_graph_view,
)

from .conftest import SF_SMOKE


def _final_edges(view):
    cur = view.current()
    return cur.select("src", "dst", "n_items", "weight_raw", "first_ts", "last_ts")


def _assert_edges_equal(got_rows, want_rows):
    """Exact on keys/counts/timestamps; tolerant on the float sum —
    incremental merge reorders double addition (documented ulp drift)."""
    got = {(r["src"], r["dst"]): r for r in got_rows}
    want = {(r["src"], r["dst"]): r for r in want_rows}
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        assert g["n_items"] == w["n_items"], k
        assert g["first_ts"] == w["first_ts"] and g["last_ts"] == w["last_ts"], k
        # 0.005 covers the catalog view's 2-dp rounding of the reference
        # value; the relative term covers merge-order ulp drift
        tol = 0.006 + 1e-9 * abs(w["weight_raw"])
        assert abs(g["weight_raw"] - w["weight_raw"]) < tol, k


def test_incremental_merges_equal_batch(spark, tmp_path):
    """Three manual merge_batch calls over disjoint chunks == one-shot
    batch aggregation (the FIXTURES graph view)."""
    cat = Catalog(spark, SF_SMOKE)
    li, orders = cat.table("lineitem"), cat.table("orders")
    grain = grain_from_lineitem(li, orders)
    view = sales_graph_view(spark, str(tmp_path / "view"))
    for i in range(3):
        view.merge_batch(grain.filter(F.col("src").substr(2, 10).cast("long") % 3 == i), i)
    _assert_edges_equal(
        _final_edges(view).collect(),
        cat.graph_edges()
        .select("src", "dst", "n_items", F.col("weight").alias("weight_raw"), "first_ts", "last_ts")
        .collect(),
    )


def test_incremental_via_real_stream(spark, tmp_path):
    """Drive the merge through writeStream.foreachBatch on a lineitem
    file stream with a stream-static order join."""
    import os

    cat = Catalog(spark, SF_SMOKE)
    li, orders = cat.table("lineitem"), cat.table("orders")
    # stage lineitem as 3 files
    src_dir = str(tmp_path / "src")
    li.withColumn("__b", F.col("l_orderkey") % 3).repartition(3, "__b").drop("__b").write.parquet(src_dir)
    stream = (
        spark.readStream.format("parquet").schema(li.schema)
        .option("maxFilesPerTrigger", 1).load(src_dir)
    )
    view = sales_graph_view(spark, str(tmp_path / "view"))

    def sink(batch_df, batch_id):
        view.merge_batch(grain_from_lineitem(batch_df, orders), batch_id)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    _assert_edges_equal(
        _final_edges(view).collect(),
        cat.graph_edges()
        .select("src", "dst", "n_items", F.col("weight").alias("weight_raw"), "first_ts", "last_ts")
        .collect(),
    )


def test_unmergeable_aggregate_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="not a mergeable"):
        IncrementalAggView(spark, str(tmp_path / "x"), ["k"], {"d": ("avg", "v")})


def test_replayed_batch_id_not_double_counted(spark, tmp_path):
    """foreachBatch is at-least-once: re-delivering an already-applied
    batch_id must be a no-op (exactly-once fold), and new ids keep
    applying."""
    df = spark.createDataFrame([("a", 1.0), ("a", 2.0), ("b", 5.0)], ["k", "v"])
    view = IncrementalAggView(
        spark, str(tmp_path / "v"), ["k"], {"n": ("count", None), "s": ("sum", "v")}
    )
    view.merge_batch(df, 0)
    view.merge_batch(df, 0)  # replay: must be skipped
    got = {r["k"]: (r["n"], r["s"]) for r in view.current().collect()}
    assert got == {"a": (2, 3.0), "b": (1, 5.0)}
    view.merge_batch(df, 1)  # genuinely new batch applies
    got = {r["k"]: (r["n"], r["s"]) for r in view.current().collect()}
    assert got == {"a": (4, 6.0), "b": (2, 10.0)}


def test_manual_fold_preserves_streaming_batch_id(spark, tmp_path):
    """ADVICE r7: a manual fold (batch_id=None) interleaved between
    micro-batches must NOT erase the last recorded streaming batch id —
    a redelivery of the previous micro-batch is still skipped."""
    df = spark.createDataFrame([("a", 1.0)], ["k", "v"])
    view = IncrementalAggView(
        spark, str(tmp_path / "v"), ["k"], {"n": ("count", None), "s": ("sum", "v")}
    )
    view.merge_batch(df, 0)  # streaming batch
    view.merge_batch(df)  # manual fold, no batch id
    view.merge_batch(df, 0)  # redelivery of batch 0: must STILL skip
    got = {r["k"]: (r["n"], r["s"]) for r in view.current().collect()}
    assert got == {"a": (2, 2.0)}, "replay guard erased by manual fold"


def test_version_dirs_monotonic_and_gced(spark, tmp_path):
    """The writer never overwrites a live dir: versions are monotonic
    fresh dirs, current + previous retained, older GC'd."""
    import os

    df = spark.createDataFrame([("a", 1.0)], ["k", "v"])
    view = IncrementalAggView(spark, str(tmp_path / "v"), ["k"], {"s": ("sum", "v")})
    for i in range(4):
        view.merge_batch(df, i)
    dirs = sorted(
        d for d in os.listdir(str(tmp_path / "v")) if d.startswith("v") and d[1:].isdigit()
    )
    assert dirs == ["v2", "v3"]
    assert view.current().collect()[0]["s"] == 4.0


def test_value_column_required_at_construction(spark, tmp_path):
    with pytest.raises(ValueError, match="needs a value column"):
        IncrementalAggView(spark, str(tmp_path / "x"), ["k"], {"s": ("sum", None)})
