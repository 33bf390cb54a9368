"""Streaming declared queries S01-S05 (SURVEY.md §2.E), batch-parity form.

The builders use the exact operators Structured Streaming executes
(F.window tumbling/sliding, session logic, dropDuplicates) on the batch
DataFrame; tests/test_streaming.py replays the same transforms through
readStream file-replay and asserts parity, which is the declared
verification protocol (FIXTURES.md §3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..operators.relational import sessionize
from .common import Query, ts_str

_S: list[Query] = []


def _s(name: str, oracle: str | None, note: str = ""):
    def deco(fn):
        _S.append(Query(name, fn, oracle, note))
        return fn

    return deco


def tumbling_hourly(ev: DataFrame) -> DataFrame:
    """The transform shared by batch and streaming forms of S01/S04."""
    return ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v")
    )


@_s(
    "s01_tumbling_window",
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S.%f') AS h,
       event_type, count(*) AS n, round(sum(value),2) AS v
       FROM events GROUP BY 1,2 ORDER BY 1,2""",
)
def s01(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    return (
        tumbling_hourly(ev)
        .select(ts_str(F.col("w.start")).alias("h"), "event_type", "n", "v")
        .orderBy("h", "event_type")
    )


@_s(
    "s02_sliding_window",
    """SELECT strftime(date_trunc('hour', ts)
         + (minute(ts)//15)*INTERVAL '15 minutes' - t.i*INTERVAL '15 minutes',
         '%Y-%m-%d %H:%M:%S.%f') AS ws,
       event_type, count(*) AS n
       FROM events CROSS JOIN (VALUES (0),(1),(2),(3)) t(i)
       GROUP BY 1,2 ORDER BY 1,2""",
)
def s02(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(ts_str(F.col("w.start")).alias("ws"), "event_type", "n")
        .orderBy("ws", "event_type")
    )


@_s(
    "s03_session_window",
    """WITH g AS (SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS flag
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       s AS (SELECT user_id, value,
         sum(flag) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
         FROM g)
       SELECT user_id, session_id, count(*) AS n, round(sum(value),2) AS v
       FROM s GROUP BY 1,2 ORDER BY 1,2""",
    note="streaming form uses F.session_window; parity-tested in tests/test_streaming.py",
)
def s03(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    sess = sessionize(ev, "user_id", "ts", 1800, tiebreak=["event_id"])
    return (
        sess.groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v"))
        .orderBy("user_id", "session_id")
    )


@_s(
    "s04_watermark",
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S.%f') AS h,
       event_type, count(*) AS n, round(sum(value),2) AS v
       FROM events GROUP BY 1,2 ORDER BY 1,2""",
    note="withWatermark(10 min) + in-order replay drops nothing => equals S01",
)
def s04(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events").withWatermark("ts", "10 minutes")
    return (
        tumbling_hourly(ev)
        .select(ts_str(F.col("w.start")).alias("h"), "event_type", "n", "v")
        .orderBy("h", "event_type")
    )


@_s(
    "s05_stream_dedup",
    """SELECT event_type, count(*) AS n FROM events GROUP BY 1 ORDER BY 1""",
    note="duplicated input stream + dropDuplicates(event_id) == batch distinct",
)
def s05(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    doubled = ev.unionAll(ev)
    return (
        doubled.dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


@_s(
    "s06_stream_static_join",
    """SELECT c.c_mktsegment AS seg, count(*) AS n, round(sum(e.value),2) AS v
       FROM events e JOIN customer c ON e.user_id=c.c_custkey
       GROUP BY 1 ORDER BY 1""",
    note="stream-static dim join (events enriched with the customer dim, "
    "broadcast), batch-declared; streaming replay parity in "
    "tests/test_streaming.py",
)
def s06(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    ev = c.table("events").select("user_id", "value")
    cust = c.table("customer").select("c_custkey", "c_mktsegment")
    return (
        ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v"))
        .orderBy("seg")
    )


@_s(
    "s07_stream_stream_join",
    """SELECT p.event_id, count(*)::BIGINT AS n_clicks
       FROM events p JOIN events c
       ON c.user_id=p.user_id AND c.event_type='click'
       AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
       WHERE p.event_type='purchase'
       GROUP BY 1 ORDER BY 1""",
    note="stream-stream interval join (purchases x clicks within the "
    "trailing hour per user), batch-declared; the watermarked two-stream "
    "replay parity — state eviction bounded by watermark + join window — "
    "is tests/test_streaming.py::test_s07",
)
def s07(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    joined = p.join(
        c,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
    )
    return (
        joined.groupBy(F.col("p_event_id").alias("event_id"))
        .agg(F.count(F.lit(1)).alias("n_clicks"))
        .orderBy("event_id")
    )


def windowed_distinct_users(ev: DataFrame) -> DataFrame:
    """S08 transform, valid in BOTH batch and streaming: project to the
    (window, event_type, user) grain, dedup, then count — streaming
    cannot run count(DISTINCT) directly, but dropDuplicates + count is
    its incremental equivalent (state = one row per distinct key)."""
    return (
        ev.select(F.window("ts", "1 hour").alias("w"), "event_type", "user_id")
        .dropDuplicates(["w", "event_type", "user_id"])
        .groupBy("w", "event_type")
        .agg(F.count(F.lit(1)).alias("nu"))
    )


@_s(
    "s08_windowed_distinct",
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S.%f') AS h,
       event_type, count(DISTINCT user_id) AS nu
       FROM events GROUP BY 1,2 ORDER BY 1,2""",
    note="distinct users per hourly window — the streaming-safe spelling "
    "(dedup-then-count) of count(DISTINCT): dropDuplicates state is "
    "mergeable/incremental where a true distinct-agg is not; replay "
    "parity in tests/test_streaming.py.  At scale the exact form is "
    "bounded by watermark state eviction; approx_count_distinct is the "
    "sketch alternative when ±2% is acceptable",
)
def s08(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    return (
        windowed_distinct_users(ev)
        .select(ts_str(F.col("w.start")).alias("h"), "event_type", "nu")
        .orderBy("h", "event_type")
    )


def hourly_ohlc(ev: DataFrame) -> DataFrame:
    """S09 transform, valid in batch and streaming: OHLC candles per
    (hourly window, event_type) in one aggregation pass — min_by/max_by
    are incrementally mergeable, so the candle updates in place as
    micro-batches arrive (deterministic: (event_type, ts) is unique)."""
    return ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
        F.min_by("value", "ts").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", "ts").alias("close"),
        F.count(F.lit(1)).alias("n"),
    )


@_s(
    "s09_stream_ohlc",
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S.%f') AS h,
       event_type, arg_min(value, ts) AS open, max(value) AS high,
       min(value) AS low, arg_max(value, ts) AS close, count(*) AS n
       FROM events GROUP BY 1,2 ORDER BY 1,2""",
    note="streaming OHLC downsampling: min_by/max_by candles per hourly "
    "window — first/last/extremes are all mergeable aggregates, so the "
    "stream form needs no sort and no per-window state beyond one "
    "candle; replay parity in tests/test_streaming.py",
)
def s09(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    return (
        hourly_ohlc(ev)
        .select(
            ts_str(F.col("w.start")).alias("h"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n",
        )
        .orderBy("h", "event_type")
    )


def hourly_value_histogram(ev: DataFrame) -> DataFrame:
    """Shared transform for S10: per-window equi-width value histogram.
    Bucket counts are plain mergeable aggregates, so the streaming form
    carries one counter per (window, bucket) — the monitoring-
    distribution read without quantile state."""
    return ev.groupBy(
        F.window("ts", "1 hour").alias("w"),
        F.floor(F.col("value") / 100.0).cast("int").alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("n"))


@_s(
    "s10_stream_histogram",
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S.%f') AS h,
       CAST(floor(value / 100.0) AS INT) AS bucket, count(*) AS n
       FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    note="streaming histogram: equi-width value buckets per tumbling "
    "window — counts are mergeable, so state is one integer per "
    "(window, bucket) and late data folds in exactly; replay parity "
    "in tests/test_streaming.py",
)
def s10(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    return (
        hourly_value_histogram(ev)
        .select(ts_str(F.col("w.start")).alias("h"), "bucket", "n")
        .orderBy("h", "bucket")
    )


def hourly_checksums(ev: DataFrame) -> DataFrame:
    """Shared transform for S11: per-window row count + commutative
    checksum sum (q79's md5-fold) — the streaming consistency check a
    replayed/exactly-once pipeline reconciles against its batch
    backfill.  Count and sum are mergeable, so state is two integers
    per window."""
    m = F.md5(
        F.concat_ws(
            "|",
            F.col("event_id"),
            F.col("event_type"),
            F.floor(F.col("value") * 100 + 0.5).cast("long"),
        )
    )
    val = None
    for i in range(11):
        d = (F.instr(F.lit("0123456789abcdef"), F.substring(m, i + 1, 1)) - 1).cast(
            "long"
        ) * F.lit(16 ** (10 - i)).cast("long")
        val = d if val is None else val + d
    return (
        ev.withColumn("__v", val)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("__v").alias("checksum"))
    )


@_s(
    "s11_stream_checksum",
    """WITH h AS (SELECT date_trunc('hour', ts) AS h,
         md5(event_id || '|' || event_type || '|'
             || CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS VARCHAR)) AS m
       FROM events),
       v AS (SELECT h,
         (strpos('0123456789abcdef', substring(m, 1, 1)) - 1) * 1099511627776
         + (strpos('0123456789abcdef', substring(m, 2, 1)) - 1) * 68719476736
         + (strpos('0123456789abcdef', substring(m, 3, 1)) - 1) * 4294967296
         + (strpos('0123456789abcdef', substring(m, 4, 1)) - 1) * 268435456
         + (strpos('0123456789abcdef', substring(m, 5, 1)) - 1) * 16777216
         + (strpos('0123456789abcdef', substring(m, 6, 1)) - 1) * 1048576
         + (strpos('0123456789abcdef', substring(m, 7, 1)) - 1) * 65536
         + (strpos('0123456789abcdef', substring(m, 8, 1)) - 1) * 4096
         + (strpos('0123456789abcdef', substring(m, 9, 1)) - 1) * 256
         + (strpos('0123456789abcdef', substring(m, 10, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substring(m, 11, 1)) - 1) AS val
       FROM h)
       SELECT strftime(h, '%Y-%m-%d %H:%M:%S.%f') AS hh, count(*) AS n,
         CAST(sum(val) AS BIGINT) AS checksum
       FROM v GROUP BY 1 ORDER BY 1""",
    note="streaming per-window consistency checksum: q79's commutative "
    "md5-fold as a windowed streaming aggregate — a replayed pipeline "
    "reconciles each window against the batch backfill with two "
    "integers, catching drops/duplicates/corruption that row counts "
    "alone miss; replay parity in tests/test_streaming.py",
)
def s11(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    return (
        hourly_checksums(ev)
        .select(ts_str(F.col("w.start")).alias("hh"), "n", "checksum")
        .orderBy("hh")
    )


def hourly_user_counts(ev: DataFrame) -> DataFrame:
    """Shared transform for S12: per-(window, user) count + exact cent
    sum.  Both aggregates are mergeable, so the streaming form keeps
    two integers per (window, user) — the heavy-hitter CANDIDATE
    state; the top-k rank itself is applied at the sink (foreachBatch
    / the complete-mode output), never inside the stream, because
    rank is not an incremental aggregate."""
    return ev.groupBy(F.window("ts", "1 hour").alias("w"), "user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.floor(F.sum("value") * 100 + 0.5).cast("long").alias("vc"),
    )


@_s(
    "s12_stream_topk",
    """WITH c AS (SELECT date_trunc('hour', ts) AS h, user_id,
         count(*) AS n, CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS vc
       FROM events GROUP BY 1, 2),
       r AS (SELECT h, user_id, n, vc, CAST(row_number() OVER
               (PARTITION BY h ORDER BY n DESC, vc DESC, user_id) AS INT)
               AS rk FROM c)
       SELECT strftime(h, '%Y-%m-%d %H:%M:%S.%f') AS hh, rk, user_id, n, vc
       FROM r WHERE rk <= 3 ORDER BY 1, 2""",
    note="streaming top-k heavy hitters: per-(window,user) mergeable "
    "counters in the stream, row_number rank applied at the SINK on "
    "each complete-mode emission — the split every streaming top-k "
    "needs because rank is not incremental.  Full tie-break "
    "(n, cents, user_id) keeps both engines' podium identical; "
    "replay parity in tests/test_streaming.py",
)
def s12(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).table("events")
    agg = hourly_user_counts(ev)
    w = Window.partitionBy("w").orderBy(
        F.desc("n"), F.desc("vc"), F.col("user_id")
    )
    return (
        agg.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            ts_str(F.col("w.start")).alias("hh"),
            F.col("rk").cast("int").alias("rk"),
            "user_id",
            "n",
            "vc",
        )
        .orderBy("hh", "rk")
    )


def latest_user_state(ev: DataFrame) -> DataFrame:
    """Shared transform for S13: per-user latest-state materialized
    view — max_by/arg_max picks the newest (event_type, value) while
    count/max stay mergeable, so the streaming form maintains one
    small struct per user (the CDC-upsert pattern: a keyed view that
    each micro-batch upserts instead of appends).  Unique (user_id,
    ts) in the fixture makes arg_max deterministic; guarded by
    test_oracle_preconditions."""
    return ev.groupBy("user_id").agg(
        F.max_by("event_type", "ts").alias("last_type"),
        F.floor(F.max_by("value", "ts") * 100 + 0.5).cast("long").alias("last_vc"),
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("n_events"),
    )


@_s(
    "s13_stream_latest_state",
    """SELECT user_id, arg_max(event_type, ts) AS last_type,
       CAST(floor(arg_max(value, ts) * 100 + 0.5) AS BIGINT) AS last_vc,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
       count(*) AS n_events
       FROM events GROUP BY 1 ORDER BY 1""",
    note="streaming latest-state view: the keyed CDC-upsert surface "
    "(one current row per user, newest event wins) maintained with "
    "nothing but mergeable arg_max/max/count state — no sort, no "
    "per-key history.  This is how a 100TB pipeline keeps a serving "
    "table current without reprocessing; replay parity in "
    "tests/test_streaming.py",
)
def s13(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    return (
        latest_user_state(ev)
        .select(
            "user_id",
            "last_type",
            "last_vc",
            ts_str(F.col("last_ts")).alias("last_ts"),
            "n_events",
        )
        .orderBy("user_id")
    )


def hourly_error_rates(ev: DataFrame) -> DataFrame:
    """Shared transform for S14: per-window total and error counters —
    both mergeable, so the stream keeps two integers per window; the
    rate and alert flag are derived at projection time and stay
    correct under late-data merges (a property a pre-computed rate
    would lose)."""
    return ev.groupBy(F.window("ts", "1 hour").alias("w")).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
            "n_errors"
        ),
    )


@_s(
    "s14_stream_error_alert",
    """WITH c AS (SELECT date_trunc('hour', ts) AS h, count(*) AS n_total,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
           AS BIGINT) AS n_errors
       FROM events GROUP BY 1)
       SELECT strftime(h, '%Y-%m-%d %H:%M:%S.%f') AS hh, n_total, n_errors,
         round(CAST(n_errors AS DOUBLE) / n_total, 4) AS err_rate,
         CAST(n_errors * 4 > n_total AS BOOLEAN) AS alert
       FROM c ORDER BY 1""",
    note="streaming SLO alerting: per-window error rate with a "
    "threshold flag (rate > 25%), maintained as two mergeable "
    "counters — the alert predicate is evaluated on INTEGERS "
    "(4*errors > total) so late-arriving data can only flip the flag "
    "consistently in both engines, never through a float boundary; "
    "replay parity in tests/test_streaming.py",
)
def s14(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    return (
        hourly_error_rates(ev)
        .select(
            ts_str(F.col("w.start")).alias("hh"),
            "n_total",
            "n_errors",
            F.round(F.col("n_errors").cast("double") / F.col("n_total"), 4).alias(
                "err_rate"
            ),
            (F.col("n_errors") * 4 > F.col("n_total")).alias("alert"),
        )
        .orderBy("hh")
    )


def native_session_windows(ev: DataFrame) -> DataFrame:
    """Shared transform for S15: Spark's NATIVE session_window operator
    (30-minute gap, per-user) — the engine-managed merging-window
    state path, versus the window-function sessionize (s03) that
    computes the same sessions relationally.  Events exactly at
    prev + gap start a NEW session (windows are half-open)."""
    return ev.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), "user_id"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.floor(F.sum("value") * 100 + 0.5).cast("long").alias("vc"),
    )


@_s(
    "s15_native_session_window",
    """WITH g AS (SELECT user_id, ts, value, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
              THEN 1 ELSE 0 END AS flag
       FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       s AS (SELECT user_id, ts, value,
         sum(flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS sid
       FROM g)
       SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f')
           AS session_start, count(*) AS n,
         CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS vc
       FROM s GROUP BY user_id, sid ORDER BY 1, 2""",
    note="native session_window parity surface: Spark's merging-"
    "session-window operator declared against the relational gap-"
    "and-cumsum oracle — nailing down the half-open boundary (gap "
    "reached EXACTLY => new session, hence >= in the oracle where "
    "s03's strictly-greater rule uses >).  In streaming this is the "
    "state-store path whose per-key state is one mergeable candle "
    "per open session; replay parity in tests/test_streaming.py",
)
def s15(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    return (
        native_session_windows(ev)
        .select(
            "user_id",
            ts_str(F.col("w.start")).alias("session_start"),
            "n",
            "vc",
        )
        .orderBy("user_id", "session_start")
    )


def value_decile_edges(ev: DataFrame) -> DataFrame:
    """Baseline value-decile edges (9 exact integer cent cut points)
    as a single-row DataFrame holding an array column — the static
    side a drift-monitoring stream broadcasts against."""
    from pyspark.sql import Window as W

    cents = ev.select(
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("c"), "event_id"
    )
    t = cents.select(
        "c",
        F.ntile(10).over(W.orderBy("c", "event_id")).cast("int").alias("bin"),
    )
    return (
        t.filter(F.col("bin") < 10)
        .groupBy("bin")
        .agg(F.max("c").alias("edge"))
        .agg(F.sort_array(F.collect_list("edge")).alias("earr"))
    )


def hourly_drift_bins(ev: DataFrame, edges: DataFrame) -> DataFrame:
    """Shared transform for S16: per-window histogram over BASELINE
    decile bins — the live side of a PSI drift monitor (q91).  The
    9-edge baseline broadcasts as one array row; binning is a
    stateless projection and the per-(window, bin) counts are
    mergeable, so the stream carries 10 integers per window."""
    c = F.floor(F.col("value") * 100 + 0.5).cast("long")
    return (
        ev.crossJoin(F.broadcast(edges))
        .withColumn("__c", c)
        .select(
            "ts",
            (1 + F.size(F.expr("filter(earr, x -> x < __c)")))
            .cast("int")
            .alias("bin"),
        )
        .groupBy(F.window("ts", "1 hour").alias("w"), "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@_s(
    "s16_stream_drift_bins",
    """WITH cents AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
         event_id, ts FROM events),
       t1 AS (SELECT c, CAST(ntile(10) OVER (ORDER BY c, event_id) AS INT)
              AS bin FROM cents),
       edges AS (SELECT CAST(max(c) AS BIGINT) AS edge FROM t1
                 WHERE bin < 10 GROUP BY bin),
       b AS (SELECT date_trunc('hour', e.ts) AS h, e.event_id,
         CAST(1 + sum(CASE WHEN ed.edge < CAST(floor(e.value * 100 + 0.5)
           AS BIGINT) THEN 1 ELSE 0 END) AS INT) AS bin
         FROM events e CROSS JOIN edges ed GROUP BY 1, 2)
       SELECT strftime(h, '%Y-%m-%d %H:%M:%S.%f') AS hh, bin, count(*) AS n
       FROM b GROUP BY 1, 2 ORDER BY 1, 2""",
    note="streaming distribution-drift monitor: per-window counts over "
    "the BASELINE's exact decile bins (q91's PSI denominator kept "
    "fresh in real time) — the 9 integer cent edges broadcast as one "
    "array row, binning is stateless, and the per-(window, bin) "
    "counters merge under late data.  A sink-side join against the "
    "baseline shares then yields live PSI per window; replay parity "
    "in tests/test_streaming.py",
)
def s16(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    edges = value_decile_edges(ev)
    return (
        hourly_drift_bins(ev, edges)
        .select(ts_str(F.col("w.start")).alias("hh"), "bin", "n")
        .orderBy("hh", "bin")
    )


def hourly_totals(ev: DataFrame) -> DataFrame:
    """Shared transform for S17: plain mergeable per-window totals;
    the window-over-window delta is applied at the SINK (lag is not
    an incremental aggregate — same split as s12's rank)."""
    return ev.groupBy(F.window("ts", "1 hour").alias("w")).agg(
        F.count(F.lit(1)).alias("n"),
        F.floor(F.sum("value") * 100 + 0.5).cast("long").alias("vc"),
    )


@_s(
    "s17_window_deltas",
    """WITH c AS (SELECT date_trunc('hour', ts) AS h, count(*) AS n,
         CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS vc
       FROM events GROUP BY 1)
       SELECT strftime(h, '%Y-%m-%d %H:%M:%S.%f') AS hh, n, vc,
         CASE WHEN epoch_us(h) - epoch_us(lag(h) OVER (ORDER BY h))
              = 3600000000 THEN n - lag(n) OVER (ORDER BY h) END AS dn,
         CASE WHEN epoch_us(h) - epoch_us(lag(h) OVER (ORDER BY h))
              = 3600000000 THEN vc - lag(vc) OVER (ORDER BY h) END AS dvc
       FROM c ORDER BY 1""",
    note="window-over-window deltas: per-hour totals kept as mergeable "
    "stream state, the lag against the previous window applied at "
    "the sink on the (tiny) per-window output — the rate-of-change "
    "feed behind 'traffic dropped 40% vs last hour' alerts.  Exact "
    "integer counts and cents; adjacent-window gaps (missing hours) "
    "surface as NULL deltas rather than silently comparing across "
    "the gap; replay parity in tests/test_streaming.py",
)
def s17(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = Catalog(spark, sf_dir).table("events")
    t = hourly_totals(ev)
    w = W.orderBy(F.col("w.start"))
    us = F.unix_micros(F.col("w.start"))
    adjacent = (us - F.lag(us).over(w)) == 3_600_000_000
    return (
        t.select(
            ts_str(F.col("w.start")).alias("hh"),
            "n",
            "vc",
            F.when(adjacent, F.col("n") - F.lag("n").over(w)).alias("dn"),
            F.when(adjacent, F.col("vc") - F.lag("vc").over(w)).alias("dvc"),
        )
        .orderBy("hh")
    )


@_s(
    "s18_burn_rate",
    """WITH c AS (SELECT date_trunc('hour', ts) AS h, count(*) AS n,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
           AS BIGINT) AS e FROM events GROUP BY 1),
       w AS (SELECT h, n, e,
         CAST(sum(n) OVER (ORDER BY h ROWS BETWEEN 5 PRECEDING
           AND CURRENT ROW) AS BIGINT) AS n6,
         CAST(sum(e) OVER (ORDER BY h ROWS BETWEEN 5 PRECEDING
           AND CURRENT ROW) AS BIGINT) AS e6 FROM c)
       SELECT strftime(h, '%Y-%m-%d %H:%M:%S.%f') AS hh, n, e, n6, e6,
         CAST(5 * e > n AND 5 * e6 > n6 AS BOOLEAN) AS page
       FROM w ORDER BY 1""",
    note="SRE multi-window burn-rate alert: page only when BOTH the "
    "1-hour and the 6-hour error rates exceed the 20% budget — the "
    "standard fast+slow window pairing that filters blips (short "
    "window alone) and stale pages (long alone).  Stream state is "
    "the two mergeable counters per hour; the 6-hour lookback and "
    "the paging predicate run at the sink over per-window outputs "
    "(like s17's lag), and the predicate is pure integers (5e > n) "
    "so late data can never flip it through a float boundary; "
    "replay parity via the shared hourly counters",
)
def s18(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = Catalog(spark, sf_dir).table("events")
    c = hourly_error_rates(ev).select(
        F.col("w.start").alias("h"),
        F.col("n_total").alias("n"),
        F.col("n_errors").alias("e"),
    )
    win = W.orderBy("h").rowsBetween(-5, 0)
    w = c.select(
        "h",
        "n",
        "e",
        F.sum("n").over(win).alias("n6"),
        F.sum("e").over(win).alias("e6"),
    )
    return w.select(
        ts_str(F.col("h")).alias("hh"),
        "n",
        "e",
        "n6",
        "e6",
        ((5 * F.col("e") > F.col("n")) & (5 * F.col("e6") > F.col("n6"))).alias(
            "page"
        ),
    ).orderBy("hh")


def scd_versions(orders: DataFrame) -> DataFrame:
    """Customer SCD2 version table derived from orders: each order
    opens a new version carrying its priority; valid until the next
    order (open-ended for the latest)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        F.col("o_custkey").alias("vkey"),
        F.col("o_orderpriority").alias("prio"),
        F.col("o_orderdate").alias("vfrom"),
        F.lead("o_orderdate").over(w).alias("vto"),
    )


def scd_enriched_counts(ev: DataFrame, ver: DataFrame) -> DataFrame:
    """Shared transform for S19: stream-static AS-OF enrichment — each
    event joins the SCD2 version valid at its event time (range
    predicate on the static side), then a mergeable count per
    attribute.  The static version table broadcasts; the range
    predicate rides the hash join on the key as a residual."""
    return (
        ev.join(
            F.broadcast(ver),
            (F.col("user_id") == F.col("vkey"))
            & (F.col("ts") >= F.col("vfrom"))
            & (F.col("vto").isNull() | (F.col("ts") < F.col("vto"))),
        )
        .groupBy("prio")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@_s(
    "s19_stream_scd_join",
    """WITH ver AS (SELECT o_custkey, o_orderpriority,
         o_orderdate AS vfrom,
         lead(o_orderdate) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey) AS vto FROM orders),
       j AS (SELECT v.o_orderpriority AS prio FROM events e
         JOIN ver v ON v.o_custkey = e.user_id AND e.ts >= v.vfrom
           AND (v.vto IS NULL OR e.ts < v.vto))
       SELECT prio, count(*) AS n FROM j GROUP BY 1 ORDER BY 1""",
    note="streaming SCD2 as-of enrichment: each event picks the "
    "dimension VERSION valid at its event time (not the current "
    "row — the difference between correct and subtly-wrong stream "
    "enrichment when dimensions change), via a stream-static join "
    "whose static side is the order-derived version table.  "
    "Version intervals partition time per key so each event "
    "matches at most once; the count per attribute stays "
    "mergeable; replay parity in tests/test_streaming.py",
)
def s19(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    ver = scd_versions(c.table("orders"))
    return scd_enriched_counts(c.table("events"), ver).orderBy("prio")


def first_touch_state(ev: DataFrame) -> DataFrame:
    """Shared transform for S20: per-user FIRST event (min_by on the
    unique (ts, event_id) order) — one mergeable struct per user, the
    acquisition-channel complement of s13's latest-state view."""
    return ev.groupBy("user_id").agg(
        F.min_by("event_type", F.struct("ts", "event_id")).alias("first_type"),
        F.min("ts").alias("first_ts"),
    )


@_s(
    "s20_stream_first_touch",
    """WITH f AS (SELECT user_id,
         arg_min(event_type, ts) AS first_type FROM events GROUP BY 1)
       SELECT first_type, count(*) AS n_users FROM f
       GROUP BY 1 ORDER BY 1""",
    note="streaming first-touch acquisition channels: each user's "
    "FIRST event type held as mergeable arg_min state (new events "
    "can only lose to an earlier-timestamped arrival, so late data "
    "folds in correctly), rolled up to users-per-channel at the "
    "sink — q85 answers which touch converts, this answers which "
    "channel acquires.  Unique (user_id, ts) in the fixture keeps "
    "arg_min deterministic (guarded by test_oracle_preconditions); "
    "replay parity in tests/test_streaming.py",
)
def s20(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    return (
        first_touch_state(ev)
        .groupBy("first_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("first_type")
    )


@_s(
    "s21_rate_limit",
    """SELECT user_id, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S.%f') AS h,
       count(*) AS n
       FROM events GROUP BY 1, 2 HAVING count(*) >= 3
       ORDER BY 1, 2""",
    note="windowed rate limiting (batch form of the streaming abuse "
    "gate): per (user, hour) event counts with only over-threshold "
    "rows emitted — in the stream this is s01's tumbling aggregate "
    "in update mode with the threshold filter AFTER the stateful "
    "agg, so the state stays a mergeable count and the sink sees "
    "only violations.  Per-key hourly state expires with the "
    "watermark; the flag itself is stateless",
)
def s21(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .common import ts_str

    ev = Catalog(spark, sf_dir).table("events")
    return (
        ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("hh"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 3)
        .select("user_id", ts_str(F.col("hh")).alias("h"), "n")
        .orderBy("user_id", "h")
    )


@_s(
    "s22_stream_stream_left_join",
    """SELECT p.event_id, count(c.user_id)::BIGINT AS n_clicks
       FROM events p LEFT JOIN events c
       ON c.user_id=p.user_id AND c.event_type='click'
       AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
       WHERE p.event_type='purchase'
       GROUP BY 1 ORDER BY 1""",
    note="stream-stream LEFT OUTER interval join, batch-declared: every "
    "purchase keeps its row, n_clicks=0 when no click landed in the "
    "trailing hour — the attribution query where ABSENCE is the signal "
    "(s07's inner form silently drops exactly the purchases a funnel "
    "analysis cares about).  Streaming-side semantics are the hard "
    "part: a null-extended row can only be emitted once the click "
    "watermark passes the purchase's window upper bound, so emission "
    "lags by watermark+window; tests/test_streaming.py::test_s22 "
    "proves the replay emits exactly the batch matches plus every "
    "null-extension old enough to be closed, and nothing else",
)
def s22(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    joined = p.join(
        c,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "left",
    )
    return (
        joined.groupBy(F.col("p_event_id").alias("event_id"))
        .agg(F.count("c_user").alias("n_clicks"))
        .orderBy("event_id")
    )


@_s(
    "s23_rewindow",
    """WITH w5 AS (SELECT date_trunc('hour', ts)
           + (minute(ts) // 5) * INTERVAL '5 minutes' AS w5s,
         event_type, count(*) AS n
       FROM events GROUP BY 1, 2)
       SELECT strftime(date_trunc('hour', w5s), '%Y-%m-%d %H:%M:%S.%f') AS h,
              event_type, count(*)::BIGINT AS n_windows,
              max(n)::BIGINT AS max_5min, sum(n)::BIGINT AS total
       FROM w5 GROUP BY 1, 2 ORDER BY 1, 2""",
    note="chained windowed aggregation (window-of-windows): 5-minute "
    "tumbling counts re-aggregated into hourly peak + total per event "
    "type — the burst-profile rollup a monitoring pipeline keeps "
    "(max_5min/total is the peak-to-mean burstiness).  Spark side "
    "nests F.window twice — groupBy(window('ts','5 minutes')) then "
    "groupBy(window(w.start,'1 hour')) — which is exactly the shape "
    "Structured Streaming ≥3.5 supports natively on streams (chained "
    "window aggregation over window_time); the declared batch form "
    "is the replay-parity contract, all-integer outputs.  Two "
    "map-side-combined shuffles, the second over the already-"
    "collapsed 5-min frame — at 100 TB the raw stream is touched "
    "once",
)
def s23(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    w5 = ev.groupBy(
        F.window("ts", "5 minutes").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        w5.groupBy(F.window(F.col("w.start"), "1 hour").alias("h"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.max("n").alias("max_5min"),
            F.sum("n").alias("total"),
        )
        .select(
            ts_str(F.col("h.start")).alias("h"),
            "event_type",
            F.col("n_windows").cast("long").alias("n_windows"),
            F.col("max_5min").cast("long").alias("max_5min"),
            F.col("total").cast("long").alias("total"),
        )
        .orderBy("h", "event_type")
    )


@_s(
    "s24_window_anomaly",
    """WITH h AS (SELECT date_trunc('hour', ts) AS hr, event_type,
         count(*) AS c
       FROM events GROUP BY 1, 2),
       w AS (SELECT hr, event_type, c,
         count(*) OVER tw AS n,
         sum(c) OVER tw AS s,
         sum(c * c) OVER tw AS ss
       FROM h
       WINDOW tw AS (PARTITION BY event_type ORDER BY hr
         ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
       SELECT strftime(hr, '%Y-%m-%d %H:%M:%S.%f') AS hr, event_type,
              c::BIGINT AS c, n::BIGINT AS trail_n, s::BIGINT AS trail_sum,
              ss::BIGINT AS trail_sumsq,
              CASE WHEN (n * c - s) * (n * c - s) > 9 * (n * ss - s * s)
                        AND n * c > s
                   THEN 1 ELSE 0 END::INT AS spike
       FROM w WHERE n = 24
       ORDER BY hr, event_type""",
    note="windowed anomaly detection, EXACT INTEGER z-test: hourly "
    "event counts flagged when they sit >3 trailing standard "
    "deviations above the previous-24h mean — the alerting rule "
    "every ops pipeline runs — with the z comparison CROSS-MULTIPLIED "
    "so no float mean/std exists: z > 3 and positive ⇔ "
    "(n*c - s)^2 > 9*(n*ss - s^2) with n*c > s, every operand "
    "BIGINT from window sums.  Batch-parity form of the streaming "
    "twin (5-min micro-batch counts + applyInPandasWithState "
    "carrying the 24-slot ring buffer); declared on the hourly "
    "collapse so the frame is corpus-size-independent after one "
    "map-side-combined shuffle.  Magnitudes: n*ss <= 24*(1e6)^2 ~ "
    "2.4e13 at 1M events/hour — int64-safe far beyond any sf here",
)
def s24(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).table("events")
    h = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hr"), "event_type"
    ).agg(F.count(F.lit(1)).alias("c"))
    tw = Window.partitionBy("event_type").orderBy("hr").rowsBetween(-24, -1)
    w = h.select(
        "hr",
        "event_type",
        "c",
        F.count(F.lit(1)).over(tw).alias("n"),
        F.sum("c").over(tw).alias("s"),
        F.sum(F.col("c") * F.col("c")).over(tw).alias("ss"),
    )
    diff = F.col("n") * F.col("c") - F.col("s")
    var9 = 9 * (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
    return (
        w.filter(F.col("n") == 24)
        .select(
            ts_str(F.col("hr")).alias("hr"),
            "event_type",
            F.col("c").cast("long").alias("c"),
            F.col("n").cast("long").alias("trail_n"),
            F.col("s").cast("long").alias("trail_sum"),
            F.col("ss").cast("long").alias("trail_sumsq"),
            F.when((diff * diff > var9) & (diff > 0), 1)
            .otherwise(0)
            .cast("int")
            .alias("spike"),
        )
        .orderBy("hr", "event_type")
    )


@_s(
    "s25_watermark_late_audit",
    """WITH a AS (SELECT ts, event_id,
                       max(epoch_us(ts)) OVER (ORDER BY event_id
                         ROWS UNBOUNDED PRECEDING) AS wm_us
              FROM events),
       l AS (SELECT ts::DATE AS day,
                    CASE WHEN wm_us - epoch_us(ts) > 1800000000
                         THEN 1 ELSE 0 END AS is_late,
                    (wm_us - epoch_us(ts)) // 1000000 AS late_sec
             FROM a)
       SELECT strftime(day, '%Y-%m-%d') AS day,
              count(*)::BIGINT AS n_events,
              sum(is_late)::BIGINT AS n_late,
              max(CASE WHEN is_late = 1 THEN late_sec ELSE 0 END)::BIGINT
                AS max_late_sec
       FROM l GROUP BY 1 ORDER BY day""",
    note="watermark late-data audit — the sizing question every "
    "streaming deploy answers BEFORE picking withWatermark(delay): "
    "with event_id as the arrival order, the running max event-time "
    "IS the watermark source, and an event is late when it arrives "
    "more than the candidate delay (30 min) behind it — per day: "
    "volume, would-be-dropped count, and worst lateness.  Exact "
    "integer protocol: epoch MICROSECOND carriers (unix_micros / "
    "epoch_us) and integer division to seconds — no timestamp "
    "arithmetic in doubles.  Scale: the running max is one window "
    "over the arrival order, which a real log already has within "
    "each partition (per-partition watermarks are exactly how "
    "Structured Streaming computes this); the day rollup is "
    "map-side-combined.  The streaming twin is the s01-family "
    "watermark config this audit parameterizes",
)
def s25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).table("events")
    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, 0)
    a = ev.select(
        "ts",
        F.unix_micros("ts").alias("ts_us"),
        F.max(F.unix_micros("ts")).over(w).alias("wm_us"),
    )
    l = a.select(
        F.to_date("ts").alias("day"),
        F.when(F.col("wm_us") - F.col("ts_us") > 1_800_000_000, 1)
        .otherwise(0)
        .alias("is_late"),
        F.expr("(wm_us - ts_us) DIV 1000000").alias("late_sec"),
    )
    return (
        l.groupBy(F.col("day").cast("string").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("is_late").cast("long").alias("n_late"),
            F.max(
                F.when(F.col("is_late") == 1, F.col("late_sec")).otherwise(0)
            )
            .cast("long")
            .alias("max_late_sec"),
        )
        .orderBy("day")
    )


@_s(
    "s26_state_size_audit",
    """WITH e AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
       seg AS (
         SELECT user_id, tus,
                CASE WHEN tus - lag(tus) OVER (PARTITION BY user_id
                                               ORDER BY tus)
                          > 1800000000 OR
                          lag(tus) OVER (PARTITION BY user_id
                                         ORDER BY tus) IS NULL
                     THEN 1 ELSE 0 END AS brk
         FROM e),
       runs AS (
         SELECT user_id, tus,
                sum(brk) OVER (PARTITION BY user_id ORDER BY tus
                               ROWS UNBOUNDED PRECEDING) AS run_id
         FROM seg),
       iv AS (SELECT user_id, run_id, min(tus) AS st,
                     max(tus) + 1800000000 AS en
              FROM runs GROUP BY 1, 2),
       pts AS (SELECT st AS t, 1 AS d FROM iv
               UNION ALL SELECT en AS t, -1 AS d FROM iv),
       sweep AS (
         SELECT t, d,
                sum(d) OVER (ORDER BY t, d
                             ROWS UNBOUNDED PRECEDING) AS live
         FROM pts),
       by_day AS (
         SELECT strftime(make_timestamp(t)::DATE, '%Y-%m-%d') AS day,
                max(live) AS peak_state
         FROM sweep GROUP BY 1),
       niv AS (SELECT strftime(make_timestamp(st)::DATE, '%Y-%m-%d')
                        AS day,
                      count(*)::BIGINT AS n_intervals
               FROM iv GROUP BY 1)
       SELECT d.day, d.peak_state::BIGINT AS peak_state,
              COALESCE(n.n_intervals, 0)::BIGINT AS n_intervals
       FROM by_day d LEFT JOIN niv n ON n.day = d.day
       ORDER BY d.day""",
    note="state-store sizing audit — the capacity question a stateful "
    "streaming deploy answers after s25's lateness audit: with a "
    "30-minute state TTL (the dropDuplicates/session-gap horizon), a "
    "key holds a state entry from its first event until 30 min after "
    "its last event of that activity run, so peak concurrent state = "
    "the max of a +1/-1 interval sweep over per-key TTL-coalesced "
    "activity runs (the t03 sessionize split + t45 concurrency sweep "
    "composed into the streaming question neither answers alone).  "
    "Exact protocol: epoch-microsecond integer carriers everywhere; "
    "the sweep orders by (t, delta) so an expiry and an arrival at "
    "the same instant resolve identically in both engines.  Scale: "
    "per-key windows then ONE ordered sweep over 2x|runs| points "
    "(range-partitioned at 100 TB, the q150 regime); the streaming "
    "twin is the state-store metrics Structured Streaming emits, "
    "which this audit predicts offline",
)
def s26(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).table("events")
    e = ev.select("user_id", F.unix_micros("ts").alias("tus"))
    wu = Window.partitionBy("user_id").orderBy("tus")
    seg = e.select(
        "user_id",
        "tus",
        F.when(
            (F.col("tus") - F.lag("tus").over(wu) > 1_800_000_000)
            | F.lag("tus").over(wu).isNull(),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    runs = seg.select(
        "user_id",
        "tus",
        F.sum("brk")
        .over(wu.rowsBetween(Window.unboundedPreceding, 0))
        .alias("run_id"),
    )
    iv = runs.groupBy("user_id", "run_id").agg(
        F.min("tus").alias("st"),
        (F.max("tus") + F.lit(1_800_000_000)).alias("en"),
    )
    pts = iv.select(F.col("st").alias("t"), F.lit(1).alias("d")).unionByName(
        iv.select(F.col("en").alias("t"), F.lit(-1).alias("d"))
    )
    sweep = pts.select(
        "t",
        "d",
        F.sum("d")
        .over(
            Window.orderBy("t", "d").rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .alias("live"),
    )
    day_of = lambda tcol: F.date_format(
        F.timestamp_micros(tcol).cast("date"), "yyyy-MM-dd"
    )
    by_day = sweep.groupBy(day_of(F.col("t")).alias("day")).agg(
        F.max("live").cast("long").alias("peak_state")
    )
    niv = iv.groupBy(day_of(F.col("st")).alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals")
    )
    return (
        by_day.join(niv, "day", "left")
        .select(
            "day",
            "peak_state",
            F.coalesce(F.col("n_intervals"), F.lit(0))
            .cast("long")
            .alias("n_intervals"),
        )
        .orderBy("day")
    )


@_s(
    "s27_stream_stream_full_join",
    """WITH c AS (SELECT user_id, date_trunc('hour', ts) AS h, event_id
                  FROM events WHERE event_type='click'),
       v AS (SELECT user_id, date_trunc('hour', ts) AS h, event_id
             FROM events WHERE event_type='view')
       SELECT coalesce(c.user_id, v.user_id) AS user_id,
              strftime(coalesce(c.h, v.h), '%Y-%m-%d %H:%M:%S.%f') AS h,
              sum(CASE WHEN c.event_id IS NOT NULL AND v.event_id IS NOT NULL
                       THEN 1 ELSE 0 END)::BIGINT AS n_pairs,
              sum(CASE WHEN v.event_id IS NULL THEN 1 ELSE 0 END)::BIGINT
                AS clicks_only,
              sum(CASE WHEN c.event_id IS NULL THEN 1 ELSE 0 END)::BIGINT
                AS views_only
       FROM c FULL JOIN v ON c.user_id = v.user_id AND c.h = v.h
       GROUP BY 1, 2 ORDER BY 1, 2""",
    note="stream-stream FULL OUTER join, batch-declared (completes the "
    "join-type family: s07 inner, s22 left outer): clicks x views "
    "matched on (user, hour-window EQUALITY) - exactly the condition "
    "shape Structured Streaming supports for full-outer stream-stream "
    "joins (window-equality + watermarks, Spark >=3.1), so the batch "
    "plan IS the streaming plan; both orphan directions survive "
    "(clicks_only / views_only), which is the reconciliation query "
    "where EITHER side's absence is signal (instrumentation drift, "
    "lost-event audits).  Streaming emission: an orphan row closes "
    "only when BOTH watermarks pass its window end; "
    "tests/test_streaming.py::test_s27 sandwiches replay emission "
    "against the batch join.  Scale: one shuffle per side on "
    "(user, window); per-row state bounded by the watermark horizon",
)
def s27(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"),
        F.window("ts", "1 hour").alias("cw"),
        F.col("event_id").alias("c_id"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"),
        F.window("ts", "1 hour").alias("vw"),
        F.col("event_id").alias("v_id"),
    )
    j = c.join(
        v, (F.col("cu") == F.col("vu")) & (F.col("cw") == F.col("vw")), "full_outer"
    )
    both = F.col("c_id").isNotNull() & F.col("v_id").isNotNull()
    return (
        j.groupBy(
            F.coalesce("cu", "vu").alias("user_id"),
            ts_str(F.coalesce(F.col("cw.start"), F.col("vw.start"))).alias("h"),
        )
        .agg(
            F.sum(F.when(both, 1).otherwise(0)).alias("n_pairs"),
            F.sum(F.when(F.col("v_id").isNull(), 1).otherwise(0)).alias("clicks_only"),
            F.sum(F.when(F.col("c_id").isNull(), 1).otherwise(0)).alias("views_only"),
        )
        .orderBy("user_id", "h")
    )


QUERIES = list(_S)
