"""§2.A sources/sinks + §2.G UDF surface + §4.3 upsert smoke tests."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from graph_spark.catalog import Catalog
from graph_spark.sources import readers, writers

from .conftest import SF_SMOKE


@pytest.fixture()
def tmpdir():
    with tempfile.TemporaryDirectory() as d:
        yield d


def test_csv_json_orc_roundtrip(spark, tmpdir):
    nation = Catalog(spark, SF_SMOKE).table("nation")
    schema = StructType(
        [
            StructField("n_nationkey", LongType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", LongType()),
        ]
    )
    base = nation.select(
        F.col("n_nationkey").cast("long"), "n_name", F.col("n_regionkey").cast("long")
    )
    want = sorted(tuple(r) for r in base.collect())

    csv_path = os.path.join(tmpdir, "csv")
    base.write.option("header", "true").csv(csv_path)
    got = sorted(tuple(r) for r in readers.read_csv(spark, csv_path, schema).collect())
    assert got == want

    json_path = os.path.join(tmpdir, "json")
    base.write.json(json_path)
    got = sorted(tuple(r) for r in readers.read_json(spark, json_path, schema).collect())
    assert got == want

    orc_path = os.path.join(tmpdir, "orc")
    base.write.orc(orc_path)
    got = sorted(tuple(r) for r in readers.read_orc(spark, orc_path).collect())
    assert got == want


def test_binary_file_source_reads_opaque_blobs(spark, tmpdir):
    """binaryFile source: one row per file, exact bytes back, glob
    pushdown filters at the listing — the M-suite's ingestion front
    door (directory of blobs -> BinaryType column)."""
    blob_dir = os.path.join(tmpdir, "blobs")
    os.makedirs(blob_dir)
    payloads = {f"b{i}.bin": bytes([i]) * (10 + i) for i in range(5)}
    for name, data in payloads.items():
        with open(os.path.join(blob_dir, name), "wb") as f:
            f.write(data)
    with open(os.path.join(blob_dir, "skip.txt"), "w") as f:
        f.write("not a blob")

    df = readers.read_binary_files(spark, blob_dir, glob="*.bin")
    rows = df.select("path", "length", "content").collect()
    assert len(rows) == 5
    got = {os.path.basename(r["path"]): bytes(r["content"]) for r in rows}
    assert got == payloads
    assert all(r["length"] == len(bytes(r["content"])) for r in rows)
    # feeds straight into the multimodal feature op
    from graph_spark.operators.multimodal import extract_features

    media = df.select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.lit("blob").alias("media_type"),
        F.col("content").alias("payload"),
    )
    feats = extract_features(media).collect()
    assert len(feats) == 5


def test_partitioned_parquet_sink_prunes(spark, tmpdir):
    orders = Catalog(spark, SF_SMOKE).table("orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = os.path.join(tmpdir, "orders_by_year")
    writers.write_parquet_partitioned(orders, path, ["o_year"])
    back = spark.read.parquet(path)
    df = back.filter(F.col("o_year") == 1997)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "o_year" in plan.split("PartitionFilters")[1][:200], plan
    assert df.count() == orders.filter(F.col("o_year") == 1997).count()


def test_time_bucketed_write(spark, tmpdir):
    tp = Catalog(spark, SF_SMOKE).tprop_spend()
    path = os.path.join(tmpdir, "tprop")
    writers.write_time_bucketed(tp, path, "ts", bucket="month")
    dirs = [d for d in os.listdir(path) if d.startswith("__bucket=")]
    assert len(dirs) > 10  # one dir per month across ~6 years
    back = spark.read.parquet(path)
    assert back.count() == tp.count()


def test_time_bucketed_write_carries_ts_footer_stats(spark, tmpdir):
    """The temporal layout must write ts as int64 µs WITH parquet
    min/max statistics — Spark's Hive-compat INT96 session default
    carries none, which would silently disable the row-group pruning
    the layout exists for (the temporal-index replacement).  The
    session default must also be restored after the write."""
    import glob

    import pyarrow.parquet as pq

    key = "spark.sql.parquet.outputTimestampType"
    before = spark.conf.get(key)
    tp = Catalog(spark, SF_SMOKE).tprop_spend()
    path = os.path.join(tmpdir, "tprop_stats")
    writers.write_time_bucketed(tp, path, "ts", bucket="month")
    assert spark.conf.get(key) == before
    files = glob.glob(f"{path}/__bucket=*/part-*.parquet")
    assert files
    md = pq.ParquetFile(files[0]).metadata
    idx = [md.schema.column(j).name for j in range(md.num_columns)].index("ts")
    col = md.row_group(0).column(idx)
    assert col.physical_type == "INT64"
    assert col.statistics is not None and col.statistics.has_min_max


def test_delta_stub_gated(spark):
    assert readers.delta_available(spark) is False
    with pytest.raises(NotImplementedError):
        readers.read_delta(spark, "/nonexistent")


def test_upsert_scd1(spark):
    cur = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], ["k", "name", "v"])
    upd = spark.createDataFrame([(2, "b2", 9.0), (3, "c", 3.0)], ["k", "name", "v"])
    res = {r["k"]: (r["name"], r["v"]) for r in writers.upsert_scd1(cur, upd, ["k"]).collect()}
    assert res == {1: ("a", 1.0), 2: ("b2", 9.0), 3: ("c", 3.0)}


def test_upsert_scd2_closes_history(spark):
    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    cur = spark.createDataFrame([(1, 10.0, t)], ["k", "v", "ts"])
    upd = spark.createDataFrame([(1, 20.0, dt.datetime(2024, 2, 1))], ["k", "v", "ts"])
    rows = sorted(
        ((r["k"], r["v"], r["valid_to"]) for r in writers.upsert_scd2(cur, upd, ["k"], "ts").collect()),
    )
    assert rows[0] == (1, 10.0, dt.datetime(2024, 2, 1))  # closed-out row
    assert rows[1] == (1, 20.0, None)  # open row


def test_udf_surface(spark):
    from graph_spark.functions.udf_surface import register_all

    register_all(spark)
    Catalog(spark, SF_SMOKE).table("documents").limit(5).createOrReplaceTempView("docs5")
    r = spark.sql(
        "SELECT doc_id, char_entropy(text) AS e, reverse_words(text) AS rw FROM docs5"
    ).collect()
    assert len(r) == 5 and all(row["e"] > 0 for row in r)
    # UDTF (PySpark 4) — table-valued tokenizer
    toks = spark.sql("SELECT * FROM tokenize('hello spark world')").collect()
    assert [(t["term"], t["pos"]) for t in toks] == [("hello", 0), ("spark", 1), ("world", 2)]


def test_jdbc_reader_surface(spark):
    """No DB server in the image: assert the reader builds and fails
    with a driver/connection error, not an API error."""
    with pytest.raises(Exception) as ei:
        readers.read_jdbc(spark, "jdbc:postgresql://localhost:1/none", "t").collect()
    assert "jdbc" in str(ei.value).lower() or "driver" in str(ei.value).lower() or "connection" in str(ei.value).lower()


def test_bucketed_tables_join_without_shuffle(spark):
    """The 100 TB layout claim, proven from the plan: two tables
    bucketed the same way on the join key sort-merge-join with ZERO
    Exchange — the shuffle happened once at write time."""
    from graph_spark.sources import writers

    c = Catalog(spark, SF_SMOKE)
    orders = c.table("orders").select(F.col("o_custkey").alias("k"), "o_totalprice")
    cust = c.table("customer").select(F.col("c_custkey").alias("k"), "c_name")
    writers.write_bucketed_table(orders, "t_orders_bkt", "k", 8)
    writers.write_bucketed_table(cust, "t_cust_bkt", "k", 8)
    try:
        a = spark.table("t_orders_bkt")
        b = spark.table("t_cust_bkt")
        joined = a.hint("merge").join(b, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_bkt")
        spark.sql("DROP TABLE IF EXISTS t_cust_bkt")


def test_python_datasource_deterministic_and_partitioned(spark):
    """Custom Python DataSource connector: declared schema, partitioned
    scan, and bit-identical re-reads (task retry safety)."""
    from graph_spark.sources import pyds

    pyds.register(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("n_rows", 200)
        .option("n_partitions", 5)
        .option("seed", 13)
        .load()
    )
    assert df.rdd.getNumPartitions() == 5
    assert [f.name for f in df.schema.fields] == [
        "event_id", "ts", "user_id", "event_type", "value", "props",
    ]
    rows1 = sorted(tuple(r) for r in df.collect())
    assert len(rows1) == 200
    assert len({r[0] for r in rows1}) == 200  # event_id unique across partitions
    rows2 = sorted(
        tuple(r)
        for r in spark.read.format("synthetic_events")
        .option("n_rows", 200).option("n_partitions", 5).option("seed", 13)
        .load().collect()
    )
    assert rows1 == rows2
    # the source composes with ordinary engine ops
    agg = df.groupBy("event_type").count()
    assert agg.count() >= 2


def test_python_datasource_sink_roundtrip(spark, tmp_path):
    """jsonl_dir writer: staged files publish on commit with a manifest;
    row content round-trips through spark.read.json; overwrite replaces."""
    import json
    import os

    from graph_spark.catalog import Catalog
    from graph_spark.sources.pyds import register_sink

    from .conftest import SF_SMOKE

    register_sink(spark)
    out = str(tmp_path / "sink_out")
    ev = Catalog(spark, SF_SMOKE).table("events").select(
        "event_id", "user_id", "event_type", "value"
    )
    ev.write.format("jsonl_dir").mode("append").option("path", out).save()

    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    assert not os.path.exists(os.path.join(out, "_staging"))
    files = [f for f in os.listdir(out) if f.endswith(".jsonl")]
    manifest = open(os.path.join(out, "_SUCCESS")).read().splitlines()
    assert sorted(files) == sorted(manifest)

    rows = []
    for f in files:
        with open(os.path.join(out, f)) as fh:
            rows += [json.loads(line) for line in fh]
    assert len(rows) == ev.count()
    want = {r["event_id"]: r["value"] for r in ev.collect()}
    got = {r["event_id"]: r["value"] for r in rows}
    assert got == want

    # overwrite mode replaces prior jsonl files
    small = ev.limit(10).coalesce(1)
    small.write.format("jsonl_dir").mode("overwrite").option("path", out).save()
    files2 = [f for f in os.listdir(out) if f.endswith(".jsonl")]
    n2 = sum(1 for f in files2 for _ in open(os.path.join(out, f)))
    assert n2 == 10


def test_python_datasource_stream_reader(spark, tmp_path):
    """Streaming Python DataSource: micro-batches advance the offset,
    total rows hit max_rows, and the streamed rows equal the batch
    reader's rows for the same seed (deterministic replay contract)."""
    from graph_spark.sources.pyds import register, register_stream

    register(spark)
    register_stream(spark)
    src = (
        spark.readStream.format("synthetic_events_stream")
        .option("rows_per_batch", 100)
        .option("max_rows", 500)
        .option("seed", 11)
        .load()
    )
    name = "pyds_stream_sink"
    q = (
        src.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = spark.table(name)
    assert streamed.count() == 500
    batch = (
        spark.read.format("synthetic_events")
        .option("n_rows", 500)
        .option("seed", 11)
        .load()
    )
    s_rows = sorted(tuple(r) for r in streamed.collect())
    b_rows = sorted(tuple(r) for r in batch.collect())
    assert s_rows == b_rows


def test_zorder_layout_prunes_both_columns(spark, tmp_path):
    """Z-order clustering must make per-file min-max stats selective on
    BOTH interleaved columns; single-column sorting is the baseline
    that fails on the second column."""
    import glob

    import pyarrow.parquet as pq

    from graph_spark.catalog import Catalog
    from graph_spark.sources.writers import write_zordered

    li = Catalog(spark, "/root/testdata/sf0.01").table("lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    zdir, sdir = str(tmp_path / "zord"), str(tmp_path / "sing")
    write_zordered(li, zdir, "l_orderkey", "l_partkey", n_files=16)
    (
        li.repartitionByRange(16, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(sdir)
    )

    def admitting_files(d, col, lo, hi):
        n = 0
        for f in glob.glob(f"{d}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            fmin = min(
                md.row_group(i).column(
                    [md.schema.column(j).name for j in range(md.num_columns)].index(col)
                ).statistics.min
                for i in range(md.num_row_groups)
            )
            fmax = max(
                md.row_group(i).column(
                    [md.schema.column(j).name for j in range(md.num_columns)].index(col)
                ).statistics.max
                for i in range(md.num_row_groups)
            )
            if fmin <= hi and fmax >= lo:
                n += 1
        return n

    # a narrow l_partkey range: single-column layout admits every file,
    # the z-ordered layout must prune more than half
    z_hits = admitting_files(zdir, "l_partkey", 100, 150)
    s_hits = admitting_files(sdir, "l_partkey", 100, 150)
    assert s_hits >= 15, s_hits
    assert z_hits <= 8, (z_hits, s_hits)
    # and it must stay selective on the first column too
    z_a = admitting_files(zdir, "l_orderkey", 1000, 2000)
    assert z_a <= 8, z_a
    # correctness: same rows either way
    assert (
        spark.read.parquet(zdir).count() == spark.read.parquet(sdir).count() == li.count()
    )


def test_zorder_degenerate_constant_column(spark, tmp_path):
    """A constant (or null-range) interleave column must not break the
    write: its scaled bits collapse to zero and the layout degrades to
    single-key clustering on the other column."""
    from pyspark.sql import functions as F

    from graph_spark.catalog import Catalog
    from graph_spark.sources.writers import write_zordered

    li = (
        Catalog(spark, "/root/testdata/sf0.001")
        .table("lineitem")
        .select("l_orderkey", F.lit(7).alias("const"))
    )
    out = str(tmp_path / "zc")
    write_zordered(li, out, "l_orderkey", "const", n_files=4)
    assert spark.read.parquet(out).count() == li.count()


def test_schema_drift_report(spark):
    from pyspark.sql import functions as F

    from graph_spark.sources.readers import schema_drift

    old = spark.createDataFrame([(1, "a", 1.0)], ["id", "name", "score"])
    new = old.withColumn("score", F.col("score").cast("float")).withColumn(
        "extra", F.lit(1)
    ).drop("name")
    drift = schema_drift(old, new)
    by_col = {d["column"]: d for d in drift}
    assert by_col["name"]["change"] == "removed"
    assert by_col["extra"]["change"] == "added"
    assert by_col["score"]["change"] == "type_changed"
    assert by_col["score"]["old_type"] == "double" and by_col["score"]["new_type"] == "float"
    assert schema_drift(old, old) == []


def test_read_text_line_and_whole_modes(spark, tmp_path):
    from graph_spark.sources.readers import read_text

    p = tmp_path / "docs"
    p.mkdir()
    (p / "a.txt").write_text("alpha\nbeta\n")
    (p / "b.txt").write_text("gamma\n")
    lines = read_text(spark, str(p))
    assert lines.columns == ["value"]
    assert sorted(r["value"] for r in lines.collect()) == ["alpha", "beta", "gamma"]
    whole = read_text(spark, str(p), whole=True)
    vals = sorted(r["value"] for r in whole.collect())
    assert vals == ["alpha\nbeta\n", "gamma\n"]


def test_rate_stream_produces_rows(spark, tmp_path):
    import time

    from graph_spark.sources.readers import rate_stream

    src = rate_stream(spark, rows_per_second=50)
    assert src.isStreaming and set(src.columns) == {"timestamp", "value"}
    q = (
        src.writeStream.format("memory")
        .queryName("rate_smoke")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 20
        while time.time() < deadline and spark.table("rate_smoke").count() == 0:
            time.sleep(0.5)
        assert spark.table("rate_smoke").count() > 0
    finally:
        q.stop()


def test_xml_roundtrip_and_avro_gate(spark, tmpdir):
    """Native XML (Spark 4 built-in) round-trips with a pinned rowTag;
    Avro is an external module absent here, so the reader must gate
    with NotImplementedError instead of a raw classpath failure."""
    import pytest as _pytest

    from graph_spark.sources.readers import (
        avro_available,
        read_avro,
        read_xml,
        write_xml,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "id long, v string"
    )
    path = os.path.join(tmpdir, "x")
    write_xml(df, path, row_tag="rec", root_tag="recs")
    back = read_xml(spark, path, row_tag="rec")
    assert back.count() == 3
    assert {r.id for r in back.collect()} == {1, 2, 3}
    # pinned schema path
    pinned = read_xml(spark, path, row_tag="rec", schema="id long, v string")
    assert pinned.schema.simpleString() == "struct<id:bigint,v:string>"

    if not avro_available(spark):
        with _pytest.raises(NotImplementedError, match="spark-avro"):
            read_avro(spark, path)
