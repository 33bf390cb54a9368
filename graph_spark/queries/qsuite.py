"""Relational declared queries Q01-Q27 + temporal T02-T03 (SURVEY.md §2.B/§2.D).

Each builder is the thin-facade lowering to DataFrame ops — Catalyst owns
the physical strategy (broadcast vs SMJ, pushdown, reorder).  Oracles are
DuckDB SQL with identical column aliases and in-query rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..operators.relational import asof_join, interval_overlap_join, sessionize, topk_per_group
from .common import TS_FMT_DUCK, Query, date_str, ts_str

_Q: list[Query] = []


def _q(name: str, oracle: str | None, note: str = ""):
    def deco(fn):
        _Q.append(Query(name, fn, oracle, note))
        return fn

    return deco


@_q(
    "q01_scan_agg",
    """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty,
       round(sum(l_extendedprice),2) AS sum_base,
       round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc,
       round(avg(l_quantity),4) AS avg_qty, count(*) AS n
       FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'
       GROUP BY 1,2 ORDER BY 1,2""",
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@_q(
    "q02_filter_project",
    """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
       WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 10
       ORDER BY 1,2""",
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    return (
        li.filter((F.col("l_discount").between(0.05, 0.07)) & (F.col("l_quantity") < 10))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    )


@_q(
    "q03_join_agg",
    """SELECT n_name, round(sum(o_totalprice),2) AS rev, count(*) AS n FROM orders
       JOIN customer ON o_custkey=c_custkey JOIN nation ON c_nationkey=n_nationkey
       GROUP BY 1 ORDER BY 1""",
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    return (
        c.table("orders")
        .join(c.table("customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.table("nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"), F.count(F.lit(1)).alias("n"))
        .orderBy("n_name")
    )


@_q(
    "q04_5way_join",
    """SELECT r_name, round(sum(l_extendedprice*(1-l_discount)),2) AS rev FROM lineitem
       JOIN orders ON l_orderkey=o_orderkey JOIN customer ON o_custkey=c_custkey
       JOIN nation ON c_nationkey=n_nationkey JOIN region ON n_regionkey=r_regionkey
       GROUP BY 1 ORDER BY 1""",
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    return (
        c.table("lineitem")
        .join(c.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.table("customer")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.table("nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(c.table("region")), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("rev"))
        .orderBy("r_name")
    )


@_q(
    "q05_left_join",
    """SELECT c_custkey, count(o_orderkey) AS n_orders FROM customer
       LEFT JOIN orders ON o_custkey=c_custkey GROUP BY 1 ORDER BY 1""",
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    return (
        c.table("customer")
        .join(c.table("orders"), F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


@_q(
    "q06_semi_join",
    """SELECT count(*) AS n FROM customer WHERE EXISTS
       (SELECT 1 FROM orders WHERE o_custkey=c_custkey AND o_orderstatus='F')""",
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    return (
        c.table("customer")
        .join(
            c.table("orders").filter(F.col("o_orderstatus") == "F"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_semi",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


@_q(
    "q07_anti_join",
    """SELECT count(*) AS n FROM customer WHERE NOT EXISTS
       (SELECT 1 FROM orders WHERE o_custkey=c_custkey)""",
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    return (
        c.table("customer")
        .join(c.table("orders"), F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@_q(
    "q08_broadcast_join",
    """SELECT p_brand, round(sum(l_quantity),2) AS sum_qty FROM part
       JOIN lineitem ON p_partkey=l_partkey GROUP BY 1 ORDER BY 1""",
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    return (
        c.table("lineitem")
        .join(F.broadcast(c.table("part")), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .orderBy("p_brand")
    )


@_q(
    "q09_nonequi_join",
    """SELECT count(*) AS n, round(avg(date_diff('day', o_orderdate, l_shipdate)),2) AS avg_lag
       FROM lineitem JOIN orders ON l_orderkey=o_orderkey
       AND l_shipdate > o_orderdate + INTERVAL 30 DAY""",
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    li, o = c.table("lineitem"), c.table("orders")
    joined = li.join(
        o,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))), 2).alias("avg_lag"),
    )


@_q(
    "q10_asof_join",
    """SELECT p.event_id, strftime(max(c.ts), '%Y-%m-%d %H:%M:%S.%f') AS last_click
       FROM events p LEFT JOIN events c
       ON c.user_id=p.user_id AND c.event_type='click' AND c.ts<=p.ts
       WHERE p.event_type='purchase' GROUP BY 1 ORDER BY 1""",
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    res = asof_join(purchases, clicks, on=["user_id"], left_ts="ts", right_ts="ts", value_cols=[])
    return res.select("event_id", ts_str(F.col("asof_ts")).alias("last_click")).orderBy("event_id")


@_q(
    "q11_distinct_agg",
    """SELECT l_returnflag, count(DISTINCT l_suppkey) AS ds, count(DISTINCT l_partkey) AS dp
       FROM lineitem GROUP BY 1 ORDER BY 1""",
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_suppkey").alias("ds"), F.countDistinct("l_partkey").alias("dp"))
        .orderBy("l_returnflag")
    )


@_q(
    "q12_rollup",
    """SELECT l_returnflag, l_linestatus, grouping(l_returnflag)::INT AS g1,
       grouping(l_linestatus)::INT AS g2, round(sum(l_quantity),2) AS q
       FROM lineitem GROUP BY ROLLUP(l_returnflag,l_linestatus)
       ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""",
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g1"),
            F.grouping("l_linestatus").cast("int").alias("g2"),
            F.round(F.sum("l_quantity"), 2).alias("q"),
        )
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


@_q(
    "q13_cube",
    """SELECT l_returnflag, l_linestatus, grouping(l_returnflag)::INT AS g1,
       grouping(l_linestatus)::INT AS g2, round(sum(l_quantity),2) AS q
       FROM lineitem GROUP BY CUBE(l_returnflag,l_linestatus)
       ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""",
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g1"),
            F.grouping("l_linestatus").cast("int").alias("g2"),
            F.round(F.sum("l_quantity"), 2).alias("q"),
        )
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


@_q(
    "q14_topk_per_group",
    """SELECT o_custkey, o_orderkey, o_totalprice, rn::INT AS rn FROM
       (SELECT o_custkey, o_orderkey, o_totalprice,
        row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) t WHERE rn<=3 ORDER BY o_custkey, rn""",
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    return (
        topk_per_group(o, ["o_custkey"], [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()], 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    )


@_q(
    "q15_window_running",
    """SELECT event_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id),2) AS run,
       round(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id),2) AS delta
       FROM events ORDER BY event_id""",
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        F.round(F.sum("value").over(w), 2).alias("run"),
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta"),
    ).orderBy("event_id")


@_q(
    "q16_window_frame",
    """SELECT event_id, round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
       ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),4) AS mavg
       FROM events ORDER BY event_id""",
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, 0)
    return ev.select("event_id", F.round(F.avg("value").over(w), 4).alias("mavg")).orderBy("event_id")


@_q(
    "q17_global_topk",
    """SELECT o_orderkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


@_q(
    "q18_set_ops",
    """SELECT 'except' AS op, nk FROM
       (SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey FROM supplier) t1
       UNION ALL
       SELECT 'intersect' AS op, nk FROM
       (SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey FROM supplier) t2
       UNION ALL
       SELECT 'union' AS op, nk FROM
       (SELECT DISTINCT c_nationkey AS nk FROM customer UNION SELECT DISTINCT s_nationkey FROM supplier) t3
       ORDER BY 1, 2""",
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    cu = c.table("customer").select(F.col("c_nationkey").alias("nk"))
    su = c.table("supplier").select(F.col("s_nationkey").alias("nk"))
    ex = cu.distinct().subtract(su.distinct()).select(F.lit("except").alias("op"), "nk")
    it = cu.intersect(su).select(F.lit("intersect").alias("op"), "nk")
    un = cu.union(su).distinct().select(F.lit("union").alias("op"), "nk")
    return ex.unionAll(it).unionAll(un).orderBy("op", "nk")


@_q(
    "q19_distinct",
    """SELECT DISTINCT user_id, event_type FROM events ORDER BY 1,2""",
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    return ev.select("user_id", "event_type").distinct().orderBy("user_id", "event_type")


@_q(
    "q20_pivot",
    """SELECT l_returnflag, round(sum(CASE WHEN l_linestatus='O' THEN l_quantity END),2) AS qty_o,
       round(sum(CASE WHEN l_linestatus='F' THEN l_quantity END),2) AS qty_f
       FROM lineitem GROUP BY 1 ORDER BY 1""",
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnRenamed("O", "qty_o")
        .withColumnRenamed("F", "qty_f")
        .orderBy("l_returnflag")
    )


@_q(
    "q21_string_fns",
    """SELECT p_partkey, upper(p_brand) AS up_brand, substr(p_name,1,5) AS name5,
       length(p_name)::INT AS name_len, p_brand || '-' || p_type AS bt,
       CASE WHEN p_brand LIKE 'Brand#1%' THEN 1 ELSE 0 END AS is_b1,
       regexp_extract(p_type, '[A-Z]+') AS ty
       FROM part ORDER BY p_partkey""",
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = Catalog(spark, sf_dir).table("part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("up_brand"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.length("p_name").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit("-"), F.col("p_type")).alias("bt"),
        F.when(F.col("p_brand").like("Brand#1%"), 1).otherwise(0).alias("is_b1"),
        F.regexp_extract("p_type", "[A-Z]+", 0).alias("ty"),
    ).orderBy("p_partkey")


@_q(
    "q22_date_fns",
    """SELECT o_orderkey, year(o_orderdate)::INT AS y, month(o_orderdate)::INT AS m,
       day(o_orderdate)::INT AS d,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS mstart,
       date_diff('day', o_orderdate, TIMESTAMP '1998-01-01')::INT AS days_to_98
       FROM orders ORDER BY o_orderkey LIMIT 1000""",
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    return (
        o.select(
            "o_orderkey",
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
            F.dayofmonth("o_orderdate").alias("d"),
            F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd").alias("mstart"),
            F.datediff(F.lit("1998-01-01").cast("date"), F.col("o_orderdate")).alias("days_to_98"),
        )
        .orderBy("o_orderkey")
        .limit(1000)
    )


@_q(
    "q23_math_fns",
    """SELECT round(sum(sqrt(l_extendedprice)),2) AS s_sqrt,
       round(sum(ln(l_extendedprice)),2) AS s_ln,
       round(sum(abs(l_discount-0.05)),4) AS s_abs,
       round(sum(pow(l_tax,2)),4) AS s_pow FROM lineitem""",
)
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    return li.agg(
        F.round(F.sum(F.sqrt("l_extendedprice")), 2).alias("s_sqrt"),
        F.round(F.sum(F.log("l_extendedprice")), 2).alias("s_ln"),
        F.round(F.sum(F.abs(F.col("l_discount") - 0.05)), 4).alias("s_abs"),
        F.round(F.sum(F.pow("l_tax", 2)), 4).alias("s_pow"),
    )


@_q(
    "q24_json",
    """SELECT event_type, sum(CAST(json_extract_string(props,'$.k') AS INT))::BIGINT AS sk
       FROM events GROUP BY 1 ORDER BY 1""",
)
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    return (
        ev.groupBy("event_type")
        .agg(F.sum(F.get_json_object("props", "$.k").cast("int")).alias("sk"))
        .orderBy("event_type")
    )


@_q(
    "q25_array_fns",
    """SELECT vec_id, len(embedding)::INT AS sz, round(embedding[1]::DOUBLE,6) AS e1,
       round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'),4) AS s
       FROM embeddings WHERE vec_id<20 ORDER BY vec_id""",
)
def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = Catalog(spark, sf_dir).table("embeddings")
    return (
        em.filter(F.col("vec_id") < 20)
        .select(
            "vec_id",
            F.size("embedding").alias("sz"),
            F.round(F.element_at("embedding", 1).cast("double"), 6).alias("e1"),
            F.round(
                F.aggregate(
                    "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double")
                ),
                4,
            ).alias("s"),
        )
        .orderBy("vec_id")
    )


@_q(
    "q26_corr_subquery",
    """SELECT o_orderkey FROM orders o WHERE o_totalprice >
       2*(SELECT avg(o_totalprice) FROM orders i WHERE i.o_custkey=o.o_custkey)
       ORDER BY 1""",
    note="facade lowers the correlated scalar subquery to a window form",
)
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    w = Window.partitionBy("o_custkey")
    return (
        o.withColumn("cavg", F.avg("o_totalprice").over(w))
        .filter(F.col("o_totalprice") > 2 * F.col("cavg"))
        .select("o_orderkey")
        .orderBy("o_orderkey")
    )


@_q(
    "q27_percentile",
    """SELECT o_orderpriority, round(quantile_cont(o_totalprice, 0.5),4) AS med
       FROM orders GROUP BY 1 ORDER BY 1""",
)
def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("med"))
        .orderBy("o_orderpriority")
    )


@_q(
    "q28_grouping_sets",
    """SELECT l_returnflag, l_linestatus, grouping(l_returnflag)::INT AS g1,
       grouping(l_linestatus)::INT AS g2, round(sum(l_quantity),2) AS q,
       count(*) AS n
       FROM lineitem
       GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
       ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""",
    note="exercises the SQL entry point (spark.sql over a registered view) — "
    "explicit grouping sets beyond rollup/cube",
)
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    li.createOrReplaceTempView("q28_lineitem")
    return spark.sql(
        """SELECT l_returnflag, l_linestatus,
                  CAST(grouping(l_returnflag) AS INT) AS g1,
                  CAST(grouping(l_linestatus) AS INT) AS g2,
                  round(sum(l_quantity), 2) AS q, count(*) AS n
           FROM q28_lineitem
           GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
           ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""
    )


@_q(
    "q29_window_ranks",
    """SELECT o_orderkey,
       rank() OVER w::INT AS rnk,
       dense_rank() OVER w::INT AS drnk,
       ntile(4) OVER w::INT AS quartile,
       round(percent_rank() OVER w, 6) AS prank,
       round(cume_dist() OVER w, 6) AS cdist,
       first_value(o_orderkey) OVER w AS first_in_priority
       FROM orders
       WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
       ORDER BY o_orderkey LIMIT 2000""",
)
def q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            "o_orderkey",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("prank"),
            F.round(F.cume_dist().over(w), 6).alias("cdist"),
            F.first("o_orderkey").over(w).alias("first_in_priority"),
        )
        .orderBy("o_orderkey")
        .limit(2000)
    )


@_q(
    "q30_scalar_fns",
    """SELECT p_partkey,
       reverse(p_name) AS rname,
       split_part(p_type, ' ', 1) AS type_head,
       lpad(p_size::VARCHAR, 4, '0') AS size4,
       translate(p_brand, '#', '-') AS brand_t,
       coalesce(nullif(p_type, 'STANDARD'), '<std>') AS type_or_std,
       CASE WHEN position('PROMO' IN p_type) > 0 THEN 1 ELSE 0 END AS has_promo,
       round(greatest(p_retailprice, 1500.0::DOUBLE), 2) AS price_floor,
       round(least(p_retailprice, 1500.0::DOUBLE), 2) AS price_cap
       FROM part ORDER BY p_partkey""",
)
def q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = Catalog(spark, sf_dir).table("part")
    return p.select(
        "p_partkey",
        F.reverse(F.col("p_name")).alias("rname"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size4"),
        F.translate("p_brand", "#", "-").alias("brand_t"),
        F.coalesce(F.nullif("p_type", F.lit("STANDARD")), F.lit("<std>")).alias("type_or_std"),
        F.when(F.instr("p_type", "PROMO") > 0, 1).otherwise(0).alias("has_promo"),
        F.round(F.greatest("p_retailprice", F.lit(1500.0)), 2).alias("price_floor"),
        F.round(F.least("p_retailprice", F.lit(1500.0)), 2).alias("price_cap"),
    ).orderBy("p_partkey")


@_q(
    "t02_interval_overlap",
    """SELECT a.o_custkey, count(*) AS n_pairs FROM orders a JOIN orders b
       ON a.o_custkey=b.o_custkey AND a.o_orderkey<b.o_orderkey
       AND a.o_orderdate < b.o_orderdate + INTERVAL 30 DAY
       AND b.o_orderdate < a.o_orderdate + INTERVAL 30 DAY
       WHERE a.o_custkey<200 GROUP BY 1 ORDER BY 1""",
)
def t02(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders").filter(F.col("o_custkey") < 200)
    iv = o.withColumn("iv_end", F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
    pairs = interval_overlap_join(iv, ["o_custkey"], "o_orderdate", "iv_end", "o_orderkey")
    return pairs.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_pairs")).orderBy("o_custkey")


@_q(
    "t03_sessionize",
    """WITH g AS (SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS flag
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       s AS (SELECT user_id, value,
         sum(flag) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
         FROM g)
       SELECT user_id, session_id, count(*) AS n, round(sum(value),2) AS v
       FROM s GROUP BY 1,2 ORDER BY 1,2""",
)
def t03(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    sess = sessionize(ev, "user_id", "ts", 1800, tiebreak=["event_id"])
    return (
        sess.groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v"))
        .orderBy("user_id", "session_id")
    )


@_q(
    "t05_resample_ffill",
    """WITH bounds AS (SELECT date_trunc('hour', min(ts)) AS mn,
                             date_trunc('hour', max(ts)) AS mx FROM events),
       spine AS (SELECT u.user_id, g.ts AS h
                 FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 5) u
                 CROSS JOIN (SELECT unnest(generate_series(
                     (SELECT mn FROM bounds), (SELECT mx FROM bounds),
                     INTERVAL 1 HOUR)) AS ts) g),
       hourly AS (SELECT user_id, date_trunc('hour', ts) AS h,
                         round(sum(value), 2) AS v
                  FROM events WHERE user_id < 5 GROUP BY 1, 2)
       SELECT user_id, strftime(h, '%Y-%m-%d %H:%M:%S.%f') AS h,
              coalesce(v, last_value(v IGNORE NULLS) OVER
                (PARTITION BY user_id ORDER BY h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS v_filled
       FROM spine LEFT JOIN hourly USING (user_id, h)
       ORDER BY user_id, h""",
    note="resample to an hourly grid + forward-fill gaps (piecewise-"
    "constant read over a regular spine) — the time-series form of the "
    "temporal point-read",
)
def t05(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("mn"), F.date_trunc("hour", F.max("ts")).alias("mx")
    )
    users = ev.filter(F.col("user_id") < 5).select("user_id").distinct()
    spine = users.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        F.explode(F.sequence(F.col("mn"), F.col("mx"), F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    hourly = (
        ev.filter(F.col("user_id") < 5)
        .groupBy("user_id", F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.round(F.sum("value"), 2).alias("v"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, ["user_id", "h"], "left")
        .withColumn("v_filled", F.coalesce(F.col("v"), F.last("v", ignorenulls=True).over(w)))
        .select("user_id", ts_str(F.col("h")).alias("h"), "v_filled")
        .orderBy("user_id", "h")
    )


@_q(
    "t06_range_frame",
    """SELECT event_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 2) AS v_1h,
       (count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW))::BIGINT AS n_1h
       FROM events ORDER BY event_id""",
    note="event-time RANGE frame (trailing 1 hour per user), ordered on "
    "integer microsecond epoch so both engines use the exact same frame "
    "boundaries",
)
def t06(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        F.round(F.sum("value").over(w), 2).alias("v_1h"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
    ).orderBy("event_id")


@_q(
    "q31_udtf_lateral",
    """SELECT doc_id, count(*) AS n_terms, count(DISTINCT term) AS n_distinct,
       max(pos)::INT AS max_pos FROM (
         SELECT doc_id, l[i] AS term, (i-1)::INT AS pos
         FROM (SELECT doc_id, string_split(text,' ') AS l
               FROM documents WHERE doc_id < 30) d,
         LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) g
         WHERE l[i] <> '')
       GROUP BY 1 ORDER BY 1""",
    note="Python UDTF (tokenize) registered into SQL and applied via "
    "LATERAL join — the table-valued-function surface, oracle = "
    "positional string_split",
)
def q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.udf_surface import register_all

    register_all(spark)
    docs = Catalog(spark, sf_dir).table("documents").filter(F.col("doc_id") < 30)
    docs.createOrReplaceTempView("q31_docs")
    return spark.sql(
        """SELECT d.doc_id, count(*) AS n_terms,
           count(DISTINCT t.term) AS n_distinct, max(t.pos) AS max_pos
           FROM q31_docs d, LATERAL tokenize(d.text) t
           GROUP BY d.doc_id ORDER BY d.doc_id"""
    )


@_q(
    "q32_scd2_history",
    """WITH u AS (SELECT o_custkey, o_orderdate,
                  round(max(o_totalprice),2) AS value
                  FROM orders WHERE o_custkey < 100 GROUP BY 1,2)
       SELECT o_custkey, strftime(o_orderdate,'%Y-%m-%d %H:%M:%S.%f') AS ts,
              value,
              strftime(lead(o_orderdate) OVER
                (PARTITION BY o_custkey ORDER BY o_orderdate),
                '%Y-%m-%d %H:%M:%S.%f') AS valid_to
       FROM u ORDER BY 1, 2""",
    note="SCD-2 history-preserving upsert (MERGE without Delta): every "
    "state update gets valid_to = next update's ts, open row NULL — the "
    "reference's mutable-property writes re-expressed on immutable "
    "storage; per-day max pre-agg keys the history uniquely",
)
def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.writers import upsert_scd2

    o = Catalog(spark, sf_dir).table("orders").filter(F.col("o_custkey") < 100)
    updates = o.groupBy("o_custkey", "o_orderdate").agg(
        F.round(F.max("o_totalprice"), 2).alias("value")
    )
    hist = upsert_scd2(updates.limit(0), updates, ["o_custkey"], "o_orderdate")
    return hist.select(
        "o_custkey",
        ts_str(F.col("o_orderdate")).alias("ts"),
        "value",
        ts_str(F.col("valid_to")).alias("valid_to"),
    ).orderBy("o_custkey", "ts")


@_q(
    "q33_higher_order_fns",
    """SELECT vec_id,
       len(list_filter(embedding, x -> x > 0))::INT AS n_pos,
       round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)*x), 'sum'), 4) AS sumsq,
       (len(list_filter(embedding, x -> abs(x) > 2)) > 0) AS has_big,
       round(list_aggregate(list_transform(embedding,
         x -> CASE WHEN x > 0 THEN CAST(x AS DOUBLE) ELSE 0.0 END), 'sum'), 4) AS pos_sum
       FROM embeddings WHERE vec_id < 100 ORDER BY vec_id""",
    note="higher-order lambda functions over array columns "
    "(filter/transform/exists/aggregate) — stays whole-stage-codegen "
    "JVM-side, no UDF; the scale path for elementwise embedding math",
)
def q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).table("embeddings").filter(F.col("vec_id") < 100)
    return e.select(
        "vec_id",
        F.expr("size(filter(embedding, x -> x > 0))").alias("n_pos"),
        F.round(
            F.expr("aggregate(embedding, 0D, (a, x) -> a + CAST(x AS DOUBLE)*x)"), 4
        ).alias("sumsq"),
        F.expr("exists(embedding, x -> abs(x) > 2)").alias("has_big"),
        F.round(
            F.expr(
                "aggregate(embedding, 0D,"
                " (a, x) -> a + CASE WHEN x > 0 THEN CAST(x AS DOUBLE) ELSE 0D END)"
            ),
            4,
        ).alias("pos_sum"),
    ).orderBy("vec_id")


@_q(
    "q34_filtered_aggs",
    """SELECT l_returnflag,
       (count(*) FILTER (WHERE l_quantity > 25))::BIGINT AS n_big,
       bool_or(l_discount > 0.06) AS any_disc,
       bool_and(l_extendedprice > 1000.0) AS all_big_px,
       round(sum(l_extendedprice) FILTER (WHERE l_linestatus = 'O'), 2) AS open_rev
       FROM lineitem GROUP BY 1 ORDER BY 1""",
    note="conditional aggregation breadth: FILTER-clause aggregates and "
    "boolean reducers (count_if / bool_or / bool_and) — all map-side "
    "combinable partial aggregates, one shuffle",
)
def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("count_if(l_quantity > 25)").alias("n_big"),
            F.expr("bool_or(l_discount > 0.06)").alias("any_disc"),
            F.expr("bool_and(l_extendedprice > 1000.0)").alias("all_big_px"),
            F.round(
                F.expr("sum(l_extendedprice) FILTER (WHERE l_linestatus = 'O')"), 2
            ).alias("open_rev"),
        )
        .orderBy("l_returnflag")
    )


@_q(
    "t07_time_weighted_avg",
    """WITH cp AS (
         SELECT o_custkey AS entity_id, o_orderdate AS ts, max(o_totalprice) AS v
         FROM orders GROUP BY 1,2),
       seg AS (
         SELECT entity_id, v, ts AS vf,
                lead(ts) OVER (PARTITION BY entity_id ORDER BY ts) AS vt
         FROM cp),
       clip AS (
         SELECT entity_id, v,
           date_diff('day',
             greatest(vf, TIMESTAMP '1996-01-01')::DATE,
             least(coalesce(vt, TIMESTAMP '1998-01-01'), TIMESTAMP '1998-01-01')::DATE) AS days
         FROM seg)
       SELECT entity_id, round(round(sum(v*days),2)/sum(days), 6) AS twa
       FROM clip WHERE days > 0 GROUP BY 1 ORDER BY 1""",
    note="duration-weighted mean of a piecewise-constant temporal property "
    "over ['1996-01-01','1998-01-01') — the reference's aggregate-over-"
    "interval semantic; a change-point before the range still contributes "
    "its in-range prefix; weighted sum rounded before the division so "
    "summation-order ulp drift cannot flip the final rounding",
)
def t07(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..temporal.tprop import time_weighted_avg

    o = Catalog(spark, sf_dir).table("orders")
    cp = o.groupBy(
        F.col("o_custkey").alias("entity_id"), F.col("o_orderdate").alias("ts")
    ).agg(F.max("o_totalprice").alias("value"))
    res = time_weighted_avg(
        cp,
        F.lit("1996-01-01").cast("timestamp"),
        F.lit("1998-01-01").cast("timestamp"),
    )
    return res.orderBy("entity_id")


@_q(
    "t09_changepoint_compaction",
    """WITH cp AS (
         SELECT o_custkey AS entity_id, o_orderdate AS ts, max(o_orderstatus) AS value
         FROM orders GROUP BY 1,2),
       lagged AS (
         SELECT entity_id, ts, value,
                lag(value) OVER (PARTITION BY entity_id ORDER BY ts) AS prev
         FROM cp)
       SELECT entity_id, strftime(ts,'%Y-%m-%d %H:%M:%S.%f') AS ts, value
       FROM lagged WHERE prev IS NULL OR value <> prev ORDER BY 1, 2""",
    note="temporal-store compaction: drop change-points equal to their "
    "predecessor (redundant writes) — point/range reads over the "
    "compacted series are identical; the LSM-compaction analog for the "
    "piecewise-constant model, one window shuffle on the entity key",
)
def t09(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..temporal.tprop import compact_changepoints

    o = Catalog(spark, sf_dir).table("orders")
    cp = o.groupBy(
        F.col("o_custkey").alias("entity_id"), F.col("o_orderdate").alias("ts")
    ).agg(F.max("o_orderstatus").alias("value"))
    out = compact_changepoints(cp)
    return out.select("entity_id", ts_str(F.col("ts")).alias("ts"), "value").orderBy(
        "entity_id", "ts"
    )


@_q(
    "q35_unpivot",
    """WITH agg AS (SELECT l_returnflag, round(sum(l_quantity),2) AS sum_qty,
                    round(sum(l_extendedprice),2) AS sum_price
             FROM lineitem GROUP BY 1)
       SELECT l_returnflag, metric, val
       FROM (UNPIVOT agg ON sum_qty, sum_price INTO NAME metric VALUE val)
       ORDER BY 1, 2""",
    note="wide-to-long unpivot (the inverse of q20's pivot) via the "
    "native DataFrame unpivot / UNPIVOT — a metadata-only row "
    "expansion, no shuffle beyond the feeding aggregate",
)
def q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )
    return agg.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price"], "metric", "val"
    ).orderBy("l_returnflag", "metric")


@_q(
    "t11_bucketed_range_join",
    """SELECT c.event_id, count(*)::BIGINT AS n_purchases
       FROM events c JOIN events p
       ON p.event_type='purchase' AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 2 HOUR
       WHERE c.event_type='click' GROUP BY 1 ORDER BY 1""",
    note="UNKEYED point-in-interval join (purchases within 2 h after any "
    "click, across all users): executed as a time-bucket equi-join with "
    "residual range filter — never a nested-loop/cartesian scan; each "
    "2 h interval covers <= 2 buckets",
)
def t11(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import bucketed_range_join

    ev = Catalog(spark, sf_dir).table("events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_event_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOUR")).alias("w_end"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"), F.col("ts").alias("p_ts")
    )
    joined = bucketed_range_join(
        purchases, clicks, point_ts="p_ts", start_col="w_start", end_col="w_end",
        bucket_seconds=7200,
    )
    return (
        joined.groupBy(F.col("c_event_id").alias("event_id"))
        .agg(F.count(F.lit(1)).alias("n_purchases"))
        .orderBy("event_id")
    )


@_q(
    "q36_array_agg",
    """SELECT l_returnflag,
       array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
       array_to_string(list_sort(list(DISTINCT CAST(l_linenumber AS VARCHAR))), ',') AS linenos
       FROM lineitem GROUP BY 1 ORDER BY 1""",
    note="collection aggregation (collect_set -> sort_array -> join): "
    "sorted rendering makes the set deterministic; map-side combinable "
    "since the distinct sets are tiny per group",
)
def q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_set("l_linestatus"))).alias("statuses"),
            F.concat_ws(
                ",", F.sort_array(F.collect_set(F.col("l_linenumber").cast("string")))
            ).alias("linenos"),
        )
        .orderBy("l_returnflag")
    )


@_q(
    "q37_set_ops_all",
    """WITH ia AS (SELECT c_nationkey AS v FROM customer
                  INTERSECT ALL SELECT s_nationkey FROM supplier),
       ea AS (SELECT c_nationkey AS v FROM customer
              EXCEPT ALL SELECT s_nationkey FROM supplier)
       SELECT 'intersect_all' AS op, v, count(*)::BIGINT AS n FROM ia GROUP BY 1,2
       UNION ALL
       SELECT 'except_all' AS op, v, count(*)::BIGINT AS n FROM ea GROUP BY 1,2
       ORDER BY 1, 2""",
    note="bag-semantics set operations (INTERSECT ALL / EXCEPT ALL keep "
    "multiplicities, unlike q18's DISTINCT forms); rendered as "
    "per-value counts for a bounded deterministic output",
)
def q37(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    cn = c.table("customer").select(F.col("c_nationkey").alias("v"))
    sn = c.table("supplier").select(F.col("s_nationkey").alias("v"))
    ia = cn.intersectAll(sn).groupBy("v").agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("intersect_all").alias("op"), "v", "n"
    )
    ea = cn.exceptAll(sn).groupBy("v").agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("except_all").alias("op"), "v", "n"
    )
    return ia.unionAll(ea).orderBy("op", "v")


@_q(
    "q38_posexplode",
    """SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
       round(CAST(unnest(embedding) AS DOUBLE), 6) AS x
       FROM embeddings WHERE vec_id < 5
       ORDER BY vec_id, pos""",
    note="array explosion WITH ordinality (posexplode / "
    "generate_subscripts): the 1->N lateral expansion that underlies "
    "tokenization and frame-sampling operators, position preserved",
)
def q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).table("embeddings").filter(F.col("vec_id") < 5)
    return (
        e.select("vec_id", F.posexplode("embedding").alias("pos", "xf"))
        .select(
            "vec_id",
            "pos",
            F.round(F.col("xf").cast("double"), 6).alias("x"),
        )
        .orderBy("vec_id", "pos")
    )


@_q(
    "q39_window_value_fns",
    """SELECT o_orderkey,
       round(first_value(o_totalprice) OVER w, 2) AS first_px,
       round(last_value(o_totalprice) OVER
         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS final_px,
       round(nth_value(o_totalprice, 2) OVER w, 2) AS second_px
       FROM orders WHERE o_custkey < 200
       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
       ORDER BY o_orderkey""",
    note="window value functions (first_value / last_value over the "
    "full frame / nth_value) with a fully deterministic (date, key) "
    "ordering",
)
def q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders").filter(F.col("o_custkey") < 200)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        F.round(F.first("o_totalprice").over(w), 2).alias("first_px"),
        F.round(F.last("o_totalprice").over(wfull), 2).alias("final_px"),
        F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias("second_px"),
    ).orderBy("o_orderkey")


@_q(
    "t12_asof_tolerance",
    """SELECT p.event_id,
       strftime(max(c.ts), '%Y-%m-%d %H:%M:%S.%f') AS last_click
       FROM events p LEFT JOIN events c
       ON c.user_id=p.user_id AND c.event_type='click'
       AND c.ts<=p.ts AND c.ts > p.ts - INTERVAL 1 DAY
       WHERE p.event_type='purchase' GROUP BY 1 ORDER BY 1""",
    note="as-of join with a staleness tolerance (merge_asof tolerance "
    "semantics): matches older than 1 day are rejected rather than "
    "carried forward — the bounded-lookback form that enables time-"
    "bucket partition pruning at scale",
)
def t12(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr("INTERVAL 1 DAY")),
        "left",
    )
    return (
        joined.groupBy(F.col("p_event_id").alias("event_id"))
        .agg(ts_str(F.max("c_ts")).alias("last_click"))
        .orderBy("event_id")
    )


@_q(
    "q40_calendar_fns",
    """SELECT o_orderkey,
       strftime(last_day(o_orderdate::DATE), '%Y-%m-%d') AS month_end,
       strftime((o_orderdate::DATE + INTERVAL 3 MONTH)::DATE, '%Y-%m-%d') AS plus3mo,
       weekofyear(o_orderdate)::INT AS iso_week,
       (dayofweek(o_orderdate) + 1)::INT AS dow,
       (quarter(o_orderdate))::INT AS qtr
       FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""",
    note="calendar-function breadth: last_day / add_months (calendar-"
    "clamped, Jan 31 + 1 mo = Feb 28 in both engines) / ISO week / "
    "day-of-week (normalized to Spark's 1=Sunday) / quarter",
)
def q40(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders").filter(F.col("o_orderkey") < 2000)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        date_str(F.last_day(d)).alias("month_end"),
        date_str(F.add_months(d, 3)).alias("plus3mo"),
        F.weekofyear(d).alias("iso_week"),
        F.dayofweek(d).alias("dow"),
        F.quarter(d).alias("qtr"),
    ).orderBy("o_orderkey")


@_q(
    "q41_variant_json",
    """SELECT event_type,
       sum(CAST(json_extract_string(props, '$.k') AS INT))::BIGINT AS sk,
       (count(*) FILTER (WHERE CAST(json_extract_string(props, '$.k') AS INT) > 50))::BIGINT AS n_big
       FROM events GROUP BY 1 ORDER BY 1""",
    note="semi-structured access through Spark 4's VARIANT type "
    "(parse_json once -> binary-encoded variant -> typed variant_get), "
    "the parse-once/access-many scale path vs q24's per-access string "
    "parsing; oracle reads the same values via DuckDB JSON",
)
def q41(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    v = ev.select("event_type", F.parse_json("props").alias("vj"))
    k = F.expr("variant_get(vj, '$.k', 'int')")
    return (
        v.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sk"),
            F.expr("count_if(k > 50)").alias("n_big"),
        )
        .orderBy("event_type")
    )


@_q(
    "t10_linear_interpolation",
    """WITH bounds AS (SELECT date_trunc('hour', min(ts)) AS mn,
                             date_trunc('hour', max(ts)) AS mx FROM events),
       spine AS (SELECT u.user_id, g.ts AS h
                 FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 5) u
                 CROSS JOIN (SELECT unnest(generate_series(
                     (SELECT mn FROM bounds), (SELECT mx FROM bounds),
                     INTERVAL 1 HOUR)) AS ts) g),
       hourly AS (SELECT user_id, date_trunc('hour', ts) AS h,
                         round(sum(value), 2) AS v
                  FROM events WHERE user_id < 5 GROUP BY 1, 2),
       j AS (SELECT user_id, h, v,
               last_value(v IGNORE NULLS) OVER wp AS pv,
               last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER wp AS pt,
               first_value(v IGNORE NULLS) OVER wn AS nv,
               first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER wn AS nt
             FROM spine LEFT JOIN hourly USING (user_id, h)
             WINDOW wp AS (PARTITION BY user_id ORDER BY h
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                    wn AS (PARTITION BY user_id ORDER BY h
                           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
       SELECT user_id, strftime(h, '%Y-%m-%d %H:%M:%S.%f') AS h,
              CASE WHEN v IS NOT NULL THEN round(v, 4)
                   WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                     floor((pv + (nv - pv) * date_diff('hour', pt, h)
                            / date_diff('hour', pt, nt)) * 10000 + 0.5) / 10000
                   ELSE NULL END AS vi
       FROM j ORDER BY user_id, h""",
    note="linear-interpolation gap fill on the hourly grid: interior "
    "gaps get pv + (nv-pv)*dt/dn from the bracketing known points "
    "(integer hour arithmetic, one deterministic expression — no "
    "summation-order drift); leading/trailing gaps stay NULL (no "
    "extrapolation); two window passes over one entity-key shuffle",
)
def t10(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("mn"),
        F.date_trunc("hour", F.max("ts")).alias("mx"),
    )
    users = ev.filter(F.col("user_id") < 5).select("user_id").distinct()
    spine = users.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        F.explode(F.sequence(F.col("mn"), F.col("mx"), F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    hourly = (
        ev.filter(F.col("user_id") < 5)
        .groupBy("user_id", F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.round(F.sum("value"), 2).alias("v"))
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    known_ts = F.when(F.col("v").isNotNull(), F.col("h"))
    j = (
        spine.join(hourly, ["user_id", "h"], "left")
        .withColumn("pv", F.last("v", ignorenulls=True).over(wp))
        .withColumn("pt", F.last(known_ts, ignorenulls=True).over(wp))
        .withColumn("nv", F.first("v", ignorenulls=True).over(wn))
        .withColumn("nt", F.first(known_ts, ignorenulls=True).over(wn))
    )
    dh = (F.unix_timestamp("h") - F.unix_timestamp("pt")) / F.lit(3600)
    dn = (F.unix_timestamp("nt") - F.unix_timestamp("pt")) / F.lit(3600)
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * dh / dn
    vi = (
        F.when(F.col("v").isNotNull(), F.round(F.col("v"), 4))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            # floor-form HALF_UP: Spark round() and DuckDB binary round
            # disagree on 4-dp halves of 2-dp inputs
            F.floor(interp * 10000 + F.lit(0.5)) / 10000,
        )
        .otherwise(F.lit(None).cast("double"))
    )
    return (
        j.select("user_id", ts_str(F.col("h")).alias("h"), vi.alias("vi"))
        .orderBy("user_id", "h")
    )


@_q(
    "q42_stat_aggs",
    """SELECT l_returnflag,
       round(stddev_samp(l_quantity), 4) AS sd_qty,
       round(var_samp(l_quantity), 4) AS var_qty,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
       round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qp,
       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 2) AS icept
       FROM lineitem GROUP BY 1 ORDER BY 1""",
    note="statistical aggregate family (stddev/variance/correlation/"
    "covariance/linear regression) — single-pass moment aggregates, "
    "map-side partial merge, one shuffle on the group key; both engines "
    "use sample (n-1) semantics for stddev/var/covar",
)
def q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp(q), 4).alias("sd_qty"),
            F.round(F.var_samp(q), 4).alias("var_qty"),
            F.round(F.corr(q, p), 6).alias("corr_qp"),
            F.round(F.covar_samp(q, p), 2).alias("cov_qp"),
            F.round(F.regr_slope(p, q), 4).alias("slope"),
            F.round(F.regr_intercept(p, q), 2).alias("icept"),
        )
        .orderBy("l_returnflag")
    )


@_q(
    "t13_ohlc",
    """SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       arg_min(value, ts) AS open, max(value) AS high, min(value) AS low,
       arg_max(value, ts) AS close, count(*)::BIGINT AS n,
       round(avg(value), 4) AS avg_v
       FROM events WHERE user_id < 50 GROUP BY 1, 2 ORDER BY 1, 2""",
    note="OHLC downsampling: min_by/max_by (DuckDB arg_min/arg_max) pick "
    "the first/last value per (entity, day) bucket in ONE aggregation "
    "pass — no self-join, no window sort; deterministic because "
    "(user_id, ts) is unique in events (verified at sf0.01)",
)
def t13(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events").filter(F.col("user_id") < 50)
    return (
        ev.groupBy("user_id", date_str(F.date_trunc("day", F.col("ts"))).alias("day"))
        .agg(
            F.min_by("value", "ts").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ts").alias("close"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 4).alias("avg_v"),
        )
        .orderBy("user_id", "day")
    )


@_q(
    "t14_gaps_islands",
    """WITH days AS (SELECT DISTINCT user_id, date_trunc('day', ts)::DATE AS d
                    FROM events),
       grp AS (SELECT user_id, d,
                 d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                          AS INT) AS g
               FROM days),
       streaks AS (SELECT user_id, g, count(*)::BIGINT AS len
                   FROM grp GROUP BY 1, 2)
       SELECT user_id, sum(len)::BIGINT AS n_days, count(*)::BIGINT AS n_streaks,
              max(len)::BIGINT AS max_streak
       FROM streaks GROUP BY 1 ORDER BY 1""",
    note="gaps-and-islands: consecutive-day activity streaks via the "
    "classic day - row_number() group key — one window sort per entity "
    "partition, no self-join; the canonical retention/streak primitive",
)
def t14(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    days = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grp = days.withColumn("g", F.date_sub(F.col("d"), F.row_number().over(w)))
    streaks = grp.groupBy("user_id", "g").agg(F.count(F.lit(1)).alias("len"))
    return (
        streaks.groupBy("user_id")
        .agg(
            F.sum("len").alias("n_days"),
            F.count(F.lit(1)).alias("n_streaks"),
            F.max("len").alias("max_streak"),
        )
        .orderBy("user_id")
    )


@_q(
    "q43_bitwise",
    """SELECT o_orderpriority,
       bit_and(o_custkey)::BIGINT AS band, bit_or(o_custkey)::BIGINT AS bor,
       bit_xor(o_custkey)::BIGINT AS bxor,
       sum(o_orderkey & 255)::BIGINT AS masked,
       sum(CASE WHEN (o_orderkey >> 3) & 1 = 1 THEN 1 ELSE 0 END)::BIGINT AS bit3
       FROM orders GROUP BY 1 ORDER BY 1""",
    note="bitwise aggregate family (bit_and/bit_or/bit_xor) plus "
    "shift/mask scalars — the flag-set / bloom-ish summary primitives; "
    "all integer codegen, map-side combinable",
)
def q43(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.expr("bit_and(o_custkey)").alias("band"),
            F.expr("bit_or(o_custkey)").alias("bor"),
            F.expr("bit_xor(o_custkey)").alias("bxor"),
            F.sum(F.expr("o_orderkey & 255")).alias("masked"),
            F.sum(F.expr("CASE WHEN (o_orderkey >> 3) & 1 = 1 THEN 1 ELSE 0 END")).alias(
                "bit3"
            ),
        )
        .orderBy("o_orderpriority")
    )


@_q(
    "q44_lateral_topk",
    """SELECT c_custkey, t.o_orderkey, t.o_totalprice
       FROM customer, LATERAL (
         SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_custkey = c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
       WHERE c_custkey < 500 ORDER BY 1""",
    note="correlated LATERAL subquery join (top-1 order per customer) — "
    "the SQL-standard form of per-key top-k; Catalyst decorrelates "
    "LATERAL ... LIMIT into a ranked window under the hood, so the "
    "physical plan is one shuffle, not |customer| subquery executions",
)
def q44(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    c.table("customer").createOrReplaceTempView("customer")
    c.table("orders").createOrReplaceTempView("orders")
    return spark.sql(
        """SELECT c_custkey, t.o_orderkey, t.o_totalprice
           FROM customer, LATERAL (
             SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_custkey = c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
           WHERE c_custkey < 500 ORDER BY c_custkey"""
    )


@_q(
    "t15_ema",
    """WITH o AS (SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
       FROM events WHERE user_id < 20),
       p AS (SELECT a.user_id, a.event_id, a.rn,
               sum(b.value * power(0.8, a.rn - b.rn)) AS num
             FROM o a JOIN o b
               ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 20 AND a.rn
             GROUP BY 1, 2, 3)
       SELECT user_id, event_id,
              round(num / ((1 - power(0.8, LEAST(rn, 21))) / 0.2), 4) AS ema
       FROM p ORDER BY 1, 2""",
    note="truncated exponential moving average (alpha=0.2, 21-row "
    "horizon): Spark computes it in ONE window pass — collect_list over "
    "a ROWS frame, then an indexed transform + aggregate fold (no "
    "self-join); the closed-form geometric denominator avoids a second "
    "weight sum; oracle uses the equivalent bounded self-join form",
)
def t15(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events").filter(F.col("user_id") < 20)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, Window.currentRow)
    )
    lst = F.collect_list("value").over(w)
    d = ev.select("user_id", "event_id", lst.alias("lst"))
    n = F.size("lst")
    # weight x_i by 0.8^(n-1-i): most recent row gets weight 1
    num = F.aggregate(
        F.transform(
            F.col("lst"), lambda x, i: x * F.pow(F.lit(0.8), n - 1 - i)
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    den = (F.lit(1.0) - F.pow(F.lit(0.8), n)) / F.lit(0.2)
    return d.select(
        "user_id", "event_id", F.round(num / den, 4).alias("ema")
    ).orderBy("user_id", "event_id")


@_q(
    "t16_interval_coalesce",
    """WITH iv AS (SELECT o_custkey AS c, o_orderdate::DATE AS s,
                          o_orderdate::DATE + 30 AS e
                   FROM orders WHERE o_custkey < 500),
       m AS (SELECT c, s, e, max(e) OVER (PARTITION BY c ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
             FROM iv),
       f AS (SELECT c, s, e,
               CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS newisl
             FROM m),
       g AS (SELECT c, e, sum(newisl) OVER (PARTITION BY c ORDER BY s, e
               ROWS UNBOUNDED PRECEDING) AS isl, s
             FROM f),
       isl AS (SELECT c, isl, min(s) AS st, max(e) AS en FROM g GROUP BY 1, 2)
       SELECT c, count(*)::BIGINT AS n_islands,
              sum(date_diff('day', st, en))::BIGINT AS covered_days,
              max(date_diff('day', st, en))::BIGINT AS max_island
       FROM isl GROUP BY 1 ORDER BY 1""",
    note="interval coalescing (gaps-and-islands over ranges): merge each "
    "customer's overlapping 30-day order windows via the running-max-end "
    "/ new-island-flag / cumulative-sum pattern — one window sort per "
    "entity, no self-join (the naive overlap self-join is quadratic); "
    "the primitive behind SLA coverage, downtime merge, visit stitching",
)
def t16(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders").filter(F.col("o_custkey") < 500)
    iv = o.select(
        F.col("o_custkey").alias("c"),
        F.col("o_orderdate").cast("date").alias("s"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("e"),
    )
    wp = (
        Window.partitionBy("c")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wc = (
        Window.partitionBy("c")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = iv.withColumn("pmax", F.max("e").over(wp))
    f = m.withColumn(
        "newisl",
        F.when(F.col("pmax").isNull() | (F.col("s") > F.col("pmax")), 1).otherwise(0),
    )
    g = f.withColumn("isl", F.sum("newisl").over(wc))
    isl = g.groupBy("c", "isl").agg(F.min("s").alias("st"), F.max("e").alias("en"))
    return (
        isl.groupBy("c")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.sum(F.datediff("en", "st")).alias("covered_days"),
            F.max(F.datediff("en", "st")).alias("max_island"),
        )
        .orderBy("c")
    )


@_q(
    "t17_cohort_retention",
    """WITH firsts AS (SELECT user_id,
         date_trunc('week', min(ts))::DATE AS cohort FROM events GROUP BY 1),
       act AS (SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS wk
               FROM events)
       SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_week,
              (date_diff('day', f.cohort, a.wk) / 7)::BIGINT AS week_offset,
              count(DISTINCT a.user_id)::BIGINT AS active_users
       FROM act a JOIN firsts f USING (user_id)
       GROUP BY 1, 2 ORDER BY 1, 2""",
    note="cohort retention matrix: users bucketed by first-activity ISO "
    "week, counted per week offset — week offsets computed as exact "
    "day-difference/7 between week-truncated dates (both engines "
    "truncate to ISO Monday, so the division is always integral); two "
    "aggregations + one broadcastable first-touch join",
)
def t17(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort")
    )
    act = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    ).distinct()
    return (
        act.join(F.broadcast(firsts), "user_id")
        .groupBy(
            date_str(F.col("cohort")).alias("cohort_week"),
            (F.datediff("wk", "cohort") / 7).cast("long").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


@_q(
    "q45_date_spine",
    """WITH spine AS (SELECT unnest(generate_series(DATE '1996-01-01',
                        DATE '1996-12-31', INTERVAL 1 DAY))::DATE AS d),
       daily AS (SELECT o_orderdate::DATE AS d, count(*) AS n,
                        round(sum(o_totalprice), 2) AS rev
                 FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                   AND o_orderdate < TIMESTAMP '1997-01-01'
                 GROUP BY 1)
       SELECT strftime(spine.d, '%Y-%m-%d') AS d,
              coalesce(n, 0)::BIGINT AS n_orders,
              coalesce(rev, 0.0) AS revenue
       FROM spine LEFT JOIN daily ON daily.d = spine.d
       ORDER BY 1""",
    note="calendar-spine zero-fill: generate the complete 1996 daily "
    "series (F.sequence -> explode, generated distributed — never "
    "collected or ranged on the driver) and left-join daily order "
    "aggregates so silent days surface as explicit zeros — the "
    "time-series completeness primitive; spine side broadcastable",
)
def q45(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1996-01-01").cast("date"),
                F.lit("1996-12-31").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("d")
    )
    daily = (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("rev"),
        )
    )
    return (
        spine.join(daily, "d", "left")
        .select(
            date_str(F.col("d")).alias("d"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_orders"),
            F.coalesce(F.col("rev"), F.lit(0.0)).alias("revenue"),
        )
        .orderBy("d")
    )


@_q(
    "q46_safe_arith",
    """SELECT o_orderkey,
       round(o_totalprice / nullif(o_custkey % 3, 0), 4) AS per_bucket,
       TRY_CAST(substring(o_orderpriority, 1, 1) AS INT) AS prio_num,
       TRY_CAST(o_orderpriority AS INT) AS bad_cast,
       round(100.0 / nullif(o_orderkey % 2, 0), 4) AS odd_inv
       FROM orders WHERE o_orderkey < 3000 ORDER BY 1""",
    note="error-safe arithmetic/cast family (ANSI mode without the "
    "blast radius): try_divide yields NULL on zero denominators, "
    "try_cast yields NULL on malformed input instead of failing the "
    "job — at 100 TB one poison row must not kill a 6-hour pipeline; "
    "oracle spells the same semantics with nullif + TRY_CAST",
)
def q46(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders").filter(F.col("o_orderkey") < 3000)
    return o.select(
        "o_orderkey",
        F.round(F.try_divide(F.col("o_totalprice"), F.col("o_custkey") % 3), 4).alias(
            "per_bucket"
        ),
        F.expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").alias("prio_num"),
        F.expr("try_cast(o_orderpriority AS INT)").alias("bad_cast"),
        F.round(F.try_divide(F.lit(100.0), F.col("o_orderkey") % 2), 4).alias(
            "odd_inv"
        ),
    ).orderBy("o_orderkey")


@_q(
    "q47_conditional_fns",
    """SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'mid'
            ELSE 'high' END AS band,
       round(coalesce(nullif(c_acctbal, 0.0), -1.0), 2) AS bal_or_flag,
       round(least(c_acctbal, 1000.0), 2) AS capped,
       round(greatest(c_acctbal, 0.0), 2) AS floored,
       CAST(c_custkey % 7 AS BIGINT) AS bucket
       FROM customer ORDER BY 1""",
    note="conditional/null-handling scalar family (CASE, coalesce, "
    "nullif, least, greatest) — pure codegen expressions, no shuffle; "
    "the branch-heavy row transform shape of cleaning pipelines",
)
def q47(spark: SparkSession, sf_dir: str) -> DataFrame:
    cst = Catalog(spark, sf_dir).table("customer")
    bal = F.col("c_acctbal")
    return cst.select(
        "c_custkey",
        F.when(bal < 0, "neg").when(bal < 5000, "mid").otherwise("high").alias("band"),
        F.round(F.coalesce(F.nullif(bal, F.lit(0.0)), F.lit(-1.0)), 2).alias("bal_or_flag"),
        F.round(F.least(bal, F.lit(1000.0)), 2).alias("capped"),
        F.round(F.greatest(bal, F.lit(0.0)), 2).alias("floored"),
        (F.col("c_custkey") % 7).cast("long").alias("bucket"),
    ).orderBy("c_custkey")


@_q(
    "q48_grouped_quantiles",
    """SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
       round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
       round(quantile_cont(o_totalprice, 0.90), 4) AS p90
       FROM orders GROUP BY 1 ORDER BY 1""",
    note="exact interpolated quantiles at several points in ONE "
    "aggregation pass (Spark percentile == DuckDB quantile_cont, both "
    "linear interpolation); the data-profiling shape — at 100 TB swap "
    "percentile for percentile_approx (t-digest, mergeable sketch)",
)
def q48(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            *[
                F.round(F.percentile("o_totalprice", F.lit(p)), 4).alias(a)
                for p, a in [(0.25, "p25"), (0.50, "p50"), (0.75, "p75"), (0.90, "p90")]
            ]
        )
        .orderBy("o_orderpriority")
    )


@_q(
    "t18_latest_per_key",
    f"""SELECT user_id, event_type, strftime(ts, '{TS_FMT_DUCK}') AS ts_s,
       event_id, round(value, 2) AS value
       FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
             ORDER BY ts DESC, event_id DESC) AS rn FROM events)
       WHERE rn = 1 ORDER BY user_id, event_type""",
    note="keep-latest-row-per-key compaction (the CDC/upsert read shape; "
    "TGraph 'current value' of a temporal property per entity).  One "
    "shuffle on the key, no join; at scale this is the window form of "
    "SCD1 and pairs with the time-bucketed layout for pruning",
)
def t18(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            ts_str("ts").alias("ts_s"),
            "event_id",
            F.round("value", 2).alias("value"),
        )
        .orderBy("user_id", "event_type")
    )


@_q(
    "t19_time_in_state",
    """WITH seq AS (
       SELECT user_id, event_type,
         date_diff('microsecond', ts,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS dur_us
       FROM events)
       SELECT user_id, event_type, CAST(sum(dur_us) AS BIGINT) AS total_us,
       count(*) AS n
       FROM seq WHERE dur_us IS NOT NULL GROUP BY 1,2 ORDER BY 1,2""",
    note="time-in-state durations: each event opens a state that lasts "
    "until the user's next event (piecewise-constant semantics — the "
    "duration aggregate TGraph's temporal model exists to answer).  "
    "lead() gives interval ends in one window pass; µs integers, no "
    "float time arithmetic",
)
def t19(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dur = F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))
    return (
        ev.withColumn("dur_us", dur)
        .filter(F.col("dur_us").isNotNull())
        .groupBy("user_id", "event_type")
        .agg(
            F.sum("dur_us").cast("long").alias("total_us"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("user_id", "event_type")
    )


@_q(
    "q49_map_fns",
    """WITH m AS (SELECT event_id,
       map(['et','uid'], [event_type, CAST(user_id AS VARCHAR)]) AS mm
       FROM events)
       SELECT event_id, mm['et'][1] AS et, mm['uid'][1] AS uid,
       CAST(cardinality(mm) AS BIGINT) AS n_keys
       FROM m ORDER BY 1""",
    note="MapType construction + key access + cardinality (the dynamic "
    "property-bag shape of a schema-free property graph, §1.2).  "
    "create_map/element_at are codegen expressions; DuckDB map extract "
    "yields a list, unwrapped with [1] to match Spark's scalar",
)
def q49(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    m = ev.select(
        "event_id",
        F.create_map(
            F.lit("et"), F.col("event_type"),
            F.lit("uid"), F.col("user_id").cast("string"),
        ).alias("mm"),
    )
    return m.select(
        "event_id",
        F.element_at("mm", F.lit("et")).alias("et"),
        F.element_at("mm", F.lit("uid")).alias("uid"),
        F.size("mm").cast("long").alias("n_keys"),
    ).orderBy("event_id")


@_q(
    "t20_overlap_duration",
    """WITH o AS (SELECT o_orderkey k, o_custkey c, o_orderdate s,
       o_orderdate + INTERVAL 30 DAY e FROM orders WHERE o_custkey < 200)
       SELECT a.c AS c_custkey, count(*) AS n_pairs,
       CAST(sum(date_diff('day', greatest(a.s,b.s), least(a.e,b.e))) AS BIGINT)
         AS overlap_days
       FROM o a JOIN o b ON a.c=b.c AND a.k<b.k AND a.s < b.e AND b.s < a.e
       GROUP BY 1 ORDER BY 1""",
    note="pairwise interval-intersection DURATION (t02 counts overlaps; "
    "this measures them — the time-in-conflict aggregate).  Equi-join "
    "on the entity key carries the pair join; overlap length is "
    "least(ends)-greatest(starts) in integer days, no float time math",
)
def t20(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        Catalog(spark, sf_dir)
        .table("orders")
        .filter(F.col("o_custkey") < 200)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("c"),
            F.col("o_orderdate").alias("s"),
            (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("e"),
        )
    )
    a, b = o.alias("a"), o.alias("b")
    pairs = a.join(
        b,
        (F.col("a.c") == F.col("b.c"))
        & (F.col("a.k") < F.col("b.k"))
        & (F.col("a.s") < F.col("b.e"))
        & (F.col("b.s") < F.col("a.e")),
    )
    overlap = F.datediff(
        F.least(F.col("a.e"), F.col("b.e")).cast("date"),
        F.greatest(F.col("a.s"), F.col("b.s")).cast("date"),
    )
    return (
        pairs.groupBy(F.col("a.c").alias("c_custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(overlap).cast("long").alias("overlap_days"),
        )
        .orderBy("c_custkey")
    )


@_q(
    "q50_listagg",
    """SELECT c_nationkey,
       string_agg(c_mktsegment, ',' ORDER BY c_mktsegment) AS segs,
       count(*) AS n
       FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer)
       GROUP BY 1 ORDER BY 1""",
    note="ordered string aggregation (LISTAGG WITHIN GROUP == DuckDB "
    "string_agg ORDER BY) through the SQL entry point — deterministic "
    "because the order-by key is total within each group.  Input is "
    "pre-deduped so group payloads stay bounded; at 100 TB cap "
    "list sizes (slice after sort_array) before stringifying",
)
def q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    cst = Catalog(spark, sf_dir).table("customer")
    cst.createOrReplaceTempView("q50_customer")
    return spark.sql(
        """SELECT c_nationkey,
                  listagg(c_mktsegment, ',') WITHIN GROUP (ORDER BY c_mktsegment) AS segs,
                  count(*) AS n
           FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM q50_customer)
           GROUP BY c_nationkey ORDER BY c_nationkey"""
    )


@_q(
    "q51_group_by_all",
    """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS q,
       count(*) AS n
       FROM lineitem GROUP BY ALL ORDER BY 1,2""",
    note="GROUP BY ALL surface (group on every non-aggregate select "
    "item) — identical sugar in Spark 4 and DuckDB, lowered to the "
    "same hash aggregate as an explicit key list",
)
def q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    li.createOrReplaceTempView("q51_lineitem")
    return spark.sql(
        """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS q,
                  count(*) AS n
           FROM q51_lineitem GROUP BY ALL ORDER BY 1,2"""
    )


@_q(
    "t21_event_funnel",
    """WITH f AS (SELECT user_id, event_type, min(ts) AS first_ts FROM events
       WHERE event_type IN ('signup','click','purchase') GROUP BY 1,2),
       p AS (SELECT user_id,
         max(CASE WHEN event_type='signup' THEN first_ts END) AS s_ts,
         max(CASE WHEN event_type='click' THEN first_ts END) AS c_ts,
         max(CASE WHEN event_type='purchase' THEN first_ts END) AS p_ts
         FROM f GROUP BY 1)
       SELECT count(*) AS n_users,
       CAST(count_if(s_ts IS NOT NULL) AS BIGINT) AS has_signup,
       CAST(count_if(s_ts IS NOT NULL AND c_ts > s_ts) AS BIGINT)
         AS signup_then_click,
       CAST(count_if(s_ts IS NOT NULL AND c_ts > s_ts AND p_ts > c_ts) AS BIGINT)
         AS full_funnel
       FROM p""",
    note="ordered-event funnel (signup -> first click after it -> first "
    "purchase after that, per user): two hash aggregations on user_id, "
    "no self-join — the event-sequence analytics shape.  first-touch "
    "times pivot wide via conditional min/max so the ordering "
    "comparison is one row per user",
)
def t21(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    f = (
        ev.filter(F.col("event_type").isin("signup", "click", "purchase"))
        .groupBy("user_id", "event_type")
        .agg(F.min("ts").alias("first_ts"))
    )
    et = F.col("event_type")
    p = f.groupBy("user_id").agg(
        F.max(F.when(et == "signup", F.col("first_ts"))).alias("s_ts"),
        F.max(F.when(et == "click", F.col("first_ts"))).alias("c_ts"),
        F.max(F.when(et == "purchase", F.col("first_ts"))).alias("p_ts"),
    )
    s, c, pp = F.col("s_ts"), F.col("c_ts"), F.col("p_ts")
    return p.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count_if(s.isNotNull()).cast("long").alias("has_signup"),
        F.count_if(s.isNotNull() & (c > s)).cast("long").alias("signup_then_click"),
        F.count_if(s.isNotNull() & (c > s) & (pp > c)).cast("long").alias("full_funnel"),
    )


@_q(
    "t22_dow_hour_heatmap",
    """SELECT dayofweek(ts)::INT AS dow, hour(ts)::INT AS hr,
       count(*) AS n, round(sum(value),2) AS v
       FROM events GROUP BY 1,2 ORDER BY 1,2""",
    note="day-of-week x hour activity matrix (the seasonality heatmap "
    "read).  Calendar-part extraction is codegen; one hash aggregate to "
    "at most 168 cells, so the shuffle payload is constant regardless "
    "of input size.  DuckDB dayofweek is 0=Sunday while Spark's is "
    "1=Sunday — Spark side subtracts 1 to align the declared encoding",
)
def t22(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    return (
        ev.groupBy(
            (F.dayofweek("ts") - 1).cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hr"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v"))
        .orderBy("dow", "hr")
    )


@_q(
    "q52_numeric_range_frame",
    """SELECT p_partkey, p_brand, p_size,
       count(*) OVER (PARTITION BY p_brand ORDER BY p_size
                      RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS n_near,
       CAST(sum(p_size) OVER (PARTITION BY p_brand ORDER BY p_size
                      RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS BIGINT)
         AS sum_near
       FROM part ORDER BY p_partkey""",
    note="numeric RANGE window frame (peers by VALUE distance, not row "
    "count — t06 is the event-time sibling): parts within +/-2 size of "
    "each part in its brand.  One window shuffle; the frame bound scan "
    "is linear two-pointer within each sorted partition",
)
def q52(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = Catalog(spark, sf_dir).table("part")
    w = Window.partitionBy("p_brand").orderBy("p_size").rangeBetween(-2, 2)
    return p.select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.count(F.lit(1)).over(w).alias("n_near"),
        F.sum("p_size").over(w).cast("long").alias("sum_near"),
    ).orderBy("p_partkey")


@_q(
    "q53_winsorize",
    """WITH b AS (SELECT o_orderpriority,
            quantile_cont(o_totalprice, 0.05) AS lo,
            quantile_cont(o_totalprice, 0.95) AS hi
           FROM orders GROUP BY 1)
       SELECT o_orderkey, o.o_orderpriority,
       round(least(greatest(o_totalprice, b.lo), b.hi), 2) AS clipped,
       CAST(o_totalprice < b.lo OR o_totalprice > b.hi AS INT) AS was_outlier
       FROM orders o JOIN b ON o.o_orderpriority=b.o_orderpriority
       ORDER BY 1""",
    note="per-group winsorization (clip to p05/p95) — the outlier "
    "treatment step of feature cleaning.  Group bounds come from one "
    "exact-percentile aggregate and broadcast-join back onto the fact "
    "rows; spelled as agg+join (not a percentile WINDOW) because that "
    "is the portable AND scalable form — the bounds table is tiny while "
    "a windowed percentile would re-sort the facts per group",
)
def q53(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    b = o.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.05)).alias("lo"),
        F.percentile("o_totalprice", F.lit(0.95)).alias("hi"),
    )
    tp = F.col("o_totalprice")
    return (
        o.join(F.broadcast(b), "o_orderpriority")
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round(F.least(F.greatest(tp, F.col("lo")), F.col("hi")), 2).alias(
                "clipped"
            ),
            ((tp < F.col("lo")) | (tp > F.col("hi"))).cast("int").alias("was_outlier"),
        )
        .orderBy("o_orderkey")
    )


@_q(
    "q54_values_lookup_join",
    """WITH wts(event_type, w) AS (VALUES ('click', 1.0), ('view', 0.5),
       ('purchase', 5.0), ('signup', 3.0), ('error', 0.0))
       SELECT user_id, floor(sum(value * w)*100 + 0.5)/100 AS score, count(*) AS n
       FROM events JOIN wts USING (event_type)
       GROUP BY 1 ORDER BY 1""",
    note="inline literal relation (VALUES) as a broadcast lookup dim — "
    "the config-table join every scoring pipeline has.  The five-row "
    "weight table broadcasts; the fact side never shuffles for the join.  "
    "floor-form rounding: the 0.5 weight makes score sums land on exact "
    ".005 boundaries where Spark HALF_UP and DuckDB binary-round differ",
)
def q54(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    wts = spark.createDataFrame(
        [("click", 1.0), ("view", 0.5), ("purchase", 5.0), ("signup", 3.0), ("error", 0.0)],
        "event_type string, w double",
    )
    return (
        ev.join(F.broadcast(wts), "event_type")
        .groupBy("user_id")
        .agg(
            (F.floor(F.sum(F.col("value") * F.col("w")) * 100 + 0.5) / 100).alias(
                "score"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("user_id")
    )


@_q(
    "t23_rolling_wau",
    """WITH du AS (SELECT DISTINCT date_trunc('day', ts)::DATE AS d, user_id
       FROM events),
       days AS (SELECT DISTINCT d FROM du)
       SELECT strftime(days.d, '%Y-%m-%d') AS day,
       count(DISTINCT du.user_id) AS wau, count(*) AS n_user_days
       FROM days JOIN du ON du.d > days.d - 7 AND du.d <= days.d
       GROUP BY days.d ORDER BY days.d""",
    note="rolling 7-day active users per day (the WAU series).  COUNT "
    "DISTINCT cannot ride a window frame, so the scalable spelling is "
    "day-spine x user-day range join then distinct-count — the spine is "
    "tiny (one row per day) and broadcasts; user-days are pre-deduped "
    "so the join fan-out is bounded by 7 x daily-actives",
)
def t23(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    du = ev.select(
        F.date_trunc("day", "ts").cast("date").alias("d"), "user_id"
    ).distinct()
    days = du.select("d").distinct().select(F.col("d").alias("day_d"))
    joined = du.join(
        F.broadcast(days),
        (F.col("d") > F.date_sub(F.col("day_d"), 7)) & (F.col("d") <= F.col("day_d")),
    )
    return (
        joined.groupBy("day_d")
        .agg(
            F.countDistinct("user_id").alias("wau"),
            F.count(F.lit(1)).alias("n_user_days"),
        )
        .select(date_str("day_d").alias("day"), "wau", "n_user_days")
        .orderBy("day")
    )


@_q(
    "q55_decimal_exact",
    """SELECT l_returnflag,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS exact_sum,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS exact_prod_sum
       FROM lineitem GROUP BY 1 ORDER BY 1""",
    note="DecimalType exact money arithmetic: fixed-point sums and "
    "products have ONE right answer (no float summation-order drift), "
    "so results are rendered as strings with no rounding protocol at "
    "all — the financial-aggregation capability.  Spark widens "
    "(18,2)+sum to (28,2) and the product to (38,4) exactly like "
    "DuckDB's (38,x) path; both print scale-faithful strings",
)
def q55(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    ep = F.col("l_extendedprice").cast("decimal(18,2)")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(ep).cast("string").alias("exact_sum"),
            F.sum(ep * qty).cast("string").alias("exact_prod_sum"),
        )
        .orderBy("l_returnflag")
    )


@_q(
    "q56_edit_distance",
    """WITH b(x) AS (SELECT DISTINCT p_brand FROM part)
       SELECT a.x AS b1, c.x AS b2, levenshtein(a.x, c.x)::INT AS dist
       FROM b a JOIN b c ON a.x < c.x ORDER BY 1,2""",
    note="Levenshtein edit distance over the deduped brand vocabulary "
    "(fuzzy entity matching / typo clustering).  The pair join runs on "
    "the DISTINCT value set, never the fact rows — at 100 TB the "
    "vocabulary is orders of magnitude smaller than the corpus, and "
    "blocking (first-char, length band) bounds the quadratic term",
)
def q56(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = Catalog(spark, sf_dir).table("part")
    b = p.select(F.col("p_brand").alias("x")).distinct()
    a, c = b.select(F.col("x").alias("b1")), b.select(F.col("x").alias("b2"))
    return (
        a.join(c, F.col("b1") < F.col("b2"))
        .select("b1", "b2", F.levenshtein("b1", "b2").cast("int").alias("dist"))
        .orderBy("b1", "b2")
    )


@_q(
    "q57_full_outer_join",
    """WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_cust
                 FROM customer GROUP BY 1),
       s AS (SELECT s_nationkey AS nk, count(*) AS n_supp
             FROM supplier GROUP BY 1)
       SELECT coalesce(c.nk, s.nk)::INT AS nationkey,
       coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp,
       CAST(c.nk IS NULL AS INT) AS supp_only, CAST(s.nk IS NULL AS INT) AS cust_only
       FROM c FULL OUTER JOIN s ON c.nk = s.nk
       ORDER BY 1""",
    note="FULL OUTER join (the reconciliation read: rows on either side "
    "survive with NULL-padded partners) — completes the join-type "
    "surface with inner/left/semi/anti/non-equi/asof/range.  Both "
    "inputs pre-aggregate to key grain before the join, so the full "
    "outer runs on two tiny keyed frames, not facts",
)
def q57(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    c = (
        cat.table("customer")
        .groupBy(F.col("c_nationkey").alias("c_nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        cat.table("supplier")
        .groupBy(F.col("s_nationkey").alias("s_nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        c.join(s, c.c_nk == s.s_nk, "full_outer")
        .select(
            F.coalesce("c_nk", "s_nk").cast("int").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
            F.col("c_nk").isNull().cast("int").alias("supp_only"),
            F.col("s_nk").isNull().cast("int").alias("cust_only"),
        )
        .orderBy("nationkey")
    )


@_q(
    "q58_grouped_ols",
    """SELECT o_custkey,
       round(regr_slope(o_totalprice,
             date_diff('day', TIMESTAMP '1995-01-01', o_orderdate)), 4) AS slope,
       round(regr_intercept(o_totalprice,
             date_diff('day', TIMESTAMP '1995-01-01', o_orderdate)), 2) AS icept,
       count(*) AS n
       FROM orders WHERE o_custkey < 100
       GROUP BY 1 HAVING count(*) >= 3 ORDER BY 1""",
    note="grouped-map pandas UDF (applyInPandas) fitting a per-customer "
    "spend trend — the custom-UDAF surface of §2.G pushed through the "
    "oracle gate: the numpy closed-form least squares must equal "
    "DuckDB's regr_slope/regr_intercept.  Arrow-batched per group, one "
    "shuffle on the grouping key; the slow path is justified here "
    "because the per-group logic (arbitrary model fit) is the point",
)
def q58(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    o = (
        Catalog(spark, sf_dir)
        .table("orders")
        .filter(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
            ).alias("x"),
            F.col("o_totalprice").alias("y"),
        )
    )

    def fit(key, pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if len(pdf) < 3:
            return pd.DataFrame(
                {"o_custkey": [], "slope": [], "icept": [], "n": []}
            ).astype({"o_custkey": "int64", "slope": "f8", "icept": "f8", "n": "int64"})
        x = pdf["x"].to_numpy("float64")
        y = pdf["y"].to_numpy("float64")
        mx, my = x.mean(), y.mean()
        var = ((x - mx) ** 2).sum()
        slope = ((x - mx) * (y - my)).sum() / var
        icept = my - slope * mx
        return pd.DataFrame(
            {
                "o_custkey": [key[0]],
                "slope": [float(np.round(slope, 4))],
                "icept": [float(np.round(icept, 2))],
                "n": [len(pdf)],
            }
        )

    return (
        o.groupBy("o_custkey")
        .applyInPandas(fit, "o_custkey long, slope double, icept double, n long")
        .orderBy("o_custkey")
    )


@_q(
    "t24_interarrival_quantiles",
    """WITH seq AS (SELECT event_type,
       date_diff('microsecond',
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS gap_us
       FROM events)
       SELECT event_type,
       CAST(round(quantile_cont(gap_us, 0.5), 0) AS BIGINT) AS p50_us,
       CAST(round(quantile_cont(gap_us, 0.9), 0) AS BIGINT) AS p90_us,
       count(*) AS n
       FROM seq WHERE gap_us IS NOT NULL GROUP BY 1 ORDER BY 1""",
    note="inter-arrival-time quantiles per event type (the latency/"
    "cadence distribution read): lag() gives per-user gaps in one "
    "window pass, then one exact-quantile aggregate; µs integers until "
    "the final interpolated quantile",
)
def t24(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    seq = ev.withColumn("gap_us", gap).filter(F.col("gap_us").isNotNull())
    return (
        seq.groupBy("event_type")
        .agg(
            F.round(F.percentile("gap_us", F.lit(0.5)), 0).cast("long").alias("p50_us"),
            F.round(F.percentile("gap_us", F.lit(0.9)), 0).cast("long").alias("p90_us"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


@_q(
    "q59_union_by_name",
    """WITH u AS (
       SELECT c_custkey AS id, c_name AS name, c_nationkey::INT AS nationkey,
              round(c_acctbal, 2) AS acctbal, c_mktsegment AS segment
       FROM customer WHERE c_custkey < 20
       UNION ALL BY NAME
       SELECT s_suppkey AS id, round(s_acctbal, 2) AS acctbal,
              s_nationkey::INT AS nationkey, s_name AS name
       FROM supplier WHERE s_suppkey < 20)
       SELECT id, name, nationkey, acctbal, coalesce(segment, '<none>') AS segment
       FROM u ORDER BY name""",
    note="schema-evolution-friendly union: columns align by NAME (not "
    "position) and missing columns NULL-fill — Spark "
    "unionByName(allowMissingColumns=True) == DuckDB UNION ALL BY NAME; "
    "the shape every multi-source ingest hits when feeds drift",
)
def q59(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    c = (
        cat.table("customer")
        .filter(F.col("c_custkey") < 20)
        .select(
            F.col("c_custkey").alias("id"),
            F.col("c_name").alias("name"),
            F.col("c_nationkey").cast("int").alias("nationkey"),
            F.round("c_acctbal", 2).alias("acctbal"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    s = (
        cat.table("supplier")
        .filter(F.col("s_suppkey") < 20)
        .select(
            F.col("s_suppkey").alias("id"),
            F.round("s_acctbal", 2).alias("acctbal"),
            F.col("s_nationkey").cast("int").alias("nationkey"),
            F.col("s_name").alias("name"),
        )
    )
    u = c.unionByName(s, allowMissingColumns=True)
    return u.select(
        "id", "name", "nationkey", "acctbal",
        F.coalesce("segment", F.lit("<none>")).alias("segment"),
    ).orderBy("name")


@_q(
    "q60_array_set_ops",
    """WITH segs AS (SELECT c_nationkey::INT AS nk,
       list_sort(list(DISTINCT c_mktsegment)) AS s FROM customer GROUP BY 1)
       SELECT nk, array_to_string(s, ',') AS have,
       coalesce(array_to_string(list_filter(
         ['AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY'],
         x -> NOT list_contains(s, x)), ','), '') AS missing,
       CAST(length(list_intersect(s, ['BUILDING','MACHINERY'])) AS INT) AS n_common
       FROM segs ORDER BY nk""",
    note="array set algebra (intersect / except / contains) over "
    "collected per-group sets — the coverage-gap read ('which segments "
    "does each nation lack').  Arrays render via concat_ws because raw "
    "array formatting differs across engines; the except keeps the "
    "sorted literal's order on both sides",
)
def q60(spark: SparkSession, sf_dir: str) -> DataFrame:
    cst = Catalog(spark, sf_dir).table("customer")
    all5 = F.array(*[F.lit(x) for x in
                     ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]])
    segs = cst.groupBy(F.col("c_nationkey").cast("int").alias("nk")).agg(
        F.sort_array(F.collect_set("c_mktsegment")).alias("s")
    )
    return segs.select(
        "nk",
        F.concat_ws(",", F.col("s")).alias("have"),
        F.concat_ws(",", F.array_except(all5, F.col("s"))).alias("missing"),
        F.size(F.array_intersect(F.col("s"), F.array(F.lit("BUILDING"), F.lit("MACHINERY"))))
        .cast("int")
        .alias("n_common"),
    ).orderBy("nk")


@_q(
    "t25_robust_stats",
    """WITH med AS (SELECT o_orderpriority, median(o_totalprice) AS m
                   FROM orders GROUP BY 1)
       SELECT o.o_orderpriority, round(m.m, 4) AS med,
       round(median(abs(o.o_totalprice - m.m)), 4) AS mad, count(*) AS n
       FROM orders o JOIN med m ON o.o_orderpriority=m.o_orderpriority
       GROUP BY 1, m.m ORDER BY 1""",
    note="robust location/scale stats: median + median-absolute-"
    "deviation per group (outlier-resistant where mean/stddev are not) "
    "— two aggregate passes with a broadcast join of the tiny median "
    "table between them; the nested-median structure cannot fuse into "
    "one pass by construction",
)
def t25(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    med = o.groupBy("o_orderpriority").agg(F.median("o_totalprice").alias("m"))
    return (
        o.join(F.broadcast(med), "o_orderpriority")
        .groupBy("o_orderpriority", "m")
        .agg(
            F.round(F.median(F.abs(F.col("o_totalprice") - F.col("m"))), 4).alias("mad"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "o_orderpriority",
            F.round("m", 4).alias("med"),
            "mad",
            "n",
        )
        .orderBy("o_orderpriority")
    )


@_q(
    "q61_json_roundtrip",
    """SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS k,
       to_json(struct_pack(k := CAST(json_extract_string(props, '$.k') AS INT),
                           et := event_type))::VARCHAR AS rebuilt
       FROM events ORDER BY 1""",
    note="JSON parse -> typed struct -> re-serialize roundtrip "
    "(get_json_object + to_json(struct) == json_extract_string + "
    "to_json(struct_pack)): both engines emit identical compact JSON, "
    "so enrichment pipelines that rewrite payloads are hash-checkable; "
    "all codegen expressions, no UDF",
)
def q61(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select(
        "event_id",
        k.alias("k"),
        F.to_json(F.struct(k.alias("k"), F.col("event_type").alias("et"))).alias(
            "rebuilt"
        ),
    ).orderBy("event_id")


@_q(
    "q62_cross_join_matrix",
    """WITH combos AS (SELECT r_name, seg FROM region
       CROSS JOIN (SELECT DISTINCT c_mktsegment AS seg FROM customer) s),
       cnt AS (SELECT r_name, c_mktsegment AS seg, count(*) AS n
               FROM customer JOIN nation ON c_nationkey=n_nationkey
               JOIN region ON n_regionkey=r_regionkey GROUP BY 1,2)
       SELECT combos.r_name, combos.seg, coalesce(cnt.n, 0) AS n_cust
       FROM combos LEFT JOIN cnt ON combos.r_name=cnt.r_name
         AND combos.seg=cnt.seg
       ORDER BY 1,2""",
    note="explicit CROSS JOIN building the dense (region x segment) "
    "coverage matrix, zero-filled via left join — the report-spine "
    "shape.  Cartesian products are legal ONLY between tiny dimension "
    "sets like this; the facts pre-aggregate before touching the spine",
)
def q62(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    segs = cat.table("customer").select(
        F.col("c_mktsegment").alias("seg")
    ).distinct()
    combos = cat.table("region").select("r_name").crossJoin(segs)
    cnt = (
        cat.table("customer")
        .join(F.broadcast(cat.table("nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(cat.table("region")), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", F.col("c_mktsegment").alias("seg"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        combos.join(cnt, ["r_name", "seg"], "left")
        .select("r_name", "seg", F.coalesce("n", F.lit(0)).alias("n_cust"))
        .orderBy("r_name", "seg")
    )


@_q(
    "t26_asof_forward",
    f"""SELECT p.event_id,
       strftime(min(c.ts), '{TS_FMT_DUCK}') AS next_click
       FROM events p LEFT JOIN events c
       ON c.user_id=p.user_id AND c.event_type='click' AND c.ts > p.ts
       WHERE p.event_type='purchase' GROUP BY 1 ORDER BY 1""",
    note="forward as-of join: per purchase, the user's NEXT click "
    "strictly after it (time-to-next-action) — q10's mirror through "
    "the same single-shuffle tag-and-union operator, with the window "
    "frame flipped to currentRow..following and first(ignorenulls)",
)
def t26(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    p = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    c = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(p, c, ["user_id"], "ts", "ts", value_cols=[], direction="forward")
    return joined.select(
        "event_id", ts_str(F.col("asof_ts")).alias("next_click")
    ).orderBy("event_id")


@_q(
    "t27_yoy_growth",
    """WITH yr AS (SELECT r_name, year(o_orderdate)::INT AS y,
       round(sum(o_totalprice), 2) AS rev
       FROM orders JOIN customer ON o_custkey=c_custkey
       JOIN nation ON c_nationkey=n_nationkey
       JOIN region ON n_regionkey=r_regionkey GROUP BY 1,2)
       SELECT r_name, y, rev,
       round(100.0 * (rev - lag(rev) OVER (PARTITION BY r_name ORDER BY y))
             / lag(rev) OVER (PARTITION BY r_name ORDER BY y), 2) AS yoy_pct
       FROM yr ORDER BY 1,2""",
    note="year-over-year growth per region: aggregate to the (region, "
    "year) series first, then one lag window over the tiny series — "
    "the period-comparison read.  yoy is computed from the ROUNDED "
    "series so the window input is already cross-engine-stable",
)
def t27(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    yr = (
        c.table("orders")
        .join(F.broadcast(c.table("customer")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.table("nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(c.table("region")), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", F.year("o_orderdate").cast("int").alias("y"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    )
    w = Window.partitionBy("r_name").orderBy("y")
    prev = F.lag("rev").over(w)
    return yr.select(
        "r_name", "y", "rev",
        F.round(100.0 * (F.col("rev") - prev) / prev, 2).alias("yoy_pct"),
    ).orderBy("r_name", "y")


@_q(
    "q63_scalar_subquery",
    """SELECT o_orderpriority, round(avg(o_totalprice), 2) AS grp_avg,
       round(avg(o_totalprice) / (SELECT avg(o_totalprice) FROM orders), 4)
         AS ratio
       FROM orders GROUP BY 1 ORDER BY 1""",
    note="UNcorrelated scalar subquery (q26 covers the correlated kind): "
    "the ratio-to-overall read.  Catalyst executes the subquery once "
    "and broadcasts the scalar into the aggregate projection — no "
    "re-evaluation per row, no join",
)
def q63(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    o.createOrReplaceTempView("q63_orders")
    return spark.sql(
        """SELECT o_orderpriority, round(avg(o_totalprice), 2) AS grp_avg,
                  round(avg(o_totalprice) / (SELECT avg(o_totalprice) FROM q63_orders), 4)
                    AS ratio
           FROM q63_orders GROUP BY 1 ORDER BY 1"""
    )


@_q(
    "q64_map_aggregation",
    """WITH cnt AS (SELECT c_nationkey::INT AS nk, c_mktsegment AS seg,
       count(*) AS n FROM customer GROUP BY 1,2),
       m AS (SELECT nk, map_from_entries(list_sort(list(row(seg, n)))) AS mm
             FROM cnt GROUP BY 1)
       SELECT nk,
       coalesce(mm['BUILDING'][1], 0) AS n_building,
       coalesce(mm['MACHINERY'][1], 0) AS n_machinery,
       CAST(cardinality(mm) AS BIGINT) AS n_segs
       FROM m ORDER BY nk""",
    note="aggregate INTO a map (map_from_entries over collected sorted "
    "entries) then key lookups with absent-key defaulting — the "
    "pivot-to-property-bag shape a schema-free store serves; entries "
    "sorted before map build so construction order is deterministic",
)
def q64(spark: SparkSession, sf_dir: str) -> DataFrame:
    cst = Catalog(spark, sf_dir).table("customer")
    cnt = cst.groupBy(
        F.col("c_nationkey").cast("int").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
    ).agg(F.count(F.lit(1)).alias("n"))
    m = cnt.groupBy("nk").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("seg", "n")))
        ).alias("mm")
    )
    return m.select(
        "nk",
        F.coalesce(F.element_at("mm", F.lit("BUILDING")), F.lit(0)).alias("n_building"),
        F.coalesce(F.element_at("mm", F.lit("MACHINERY")), F.lit(0)).alias("n_machinery"),
        F.size("mm").cast("long").alias("n_segs"),
    ).orderBy("nk")


@_q(
    "q65_cumulative_distinct",
    """WITH fs AS (SELECT event_type, user_id,
         min(CAST(date_trunc('day', ts) AS DATE)) AS first_d
         FROM events GROUP BY 1,2),
       per AS (SELECT event_type, first_d AS d, count(*) AS new_users
               FROM fs GROUP BY 1,2)
       SELECT event_type, strftime(d, '%Y-%m-%d') AS day,
         CAST(new_users AS BIGINT) AS new_users,
         CAST(sum(new_users) OVER (PARTITION BY event_type ORDER BY d)
              AS BIGINT) AS cum_users
       FROM per ORDER BY 1, 2""",
    note="cumulative COUNT(DISTINCT) over time without a distinct-over-"
    "window (which neither engine runs distributed): reduce each user "
    "to its FIRST-seen day, then a plain running sum over the tiny "
    "(type, day) series.  At 100 TB the first-seen reduce is one "
    "shuffle on (type, user) with map-side combine; the window runs "
    "on ~type*days rows",
)
def q65(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    fs = ev.groupBy("event_type", "user_id").agg(
        F.min(F.to_date("ts")).alias("d")
    )
    per = fs.groupBy("event_type", "d").agg(F.count(F.lit(1)).alias("new_users"))
    w = Window.partitionBy("event_type").orderBy("d")
    return per.select(
        "event_type",
        date_str(F.col("d")).alias("day"),
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    ).orderBy("event_type", "day")


@_q(
    "q66_leadtime_histogram",
    """WITH lt AS (SELECT date_diff('day', CAST(o_orderdate AS DATE),
         CAST(l_shipdate AS DATE)) AS dd
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
       SELECT CAST(floor(dd / 7.0) AS INT) AS wk_bucket,
         count(*) AS n, CAST(min(dd) AS INT) AS min_dd,
         CAST(max(dd) AS INT) AS max_dd
       FROM lt GROUP BY 1 ORDER BY 1""",
    note="order-to-ship lead-time histogram: day-delta bucketed into "
    "weeks.  The fact-fact join shuffles once on orderkey (both sides "
    "clustered on it in a bucketed layout); the histogram itself is a "
    "map-side-combinable agg on a handful of buckets",
)
def q66(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    dd = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    return (
        c.table("lineitem")
        .join(c.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select(dd.alias("dd"))
        .groupBy(F.floor(F.col("dd") / 7.0).cast("int").alias("wk_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("dd").cast("int").alias("min_dd"),
            F.max("dd").cast("int").alias("max_dd"),
        )
        .orderBy("wk_bucket")
    )


@_q(
    "q67_mode_per_group",
    """WITH cnt AS (SELECT p_brand, p_type, count(*) AS n
         FROM part GROUP BY 1, 2),
       r AS (SELECT *, row_number() OVER (PARTITION BY p_brand
               ORDER BY n DESC, p_type) AS rk FROM cnt)
       SELECT p_brand, p_type AS mode_type, n AS n_mode
       FROM r WHERE rk = 1 ORDER BY 1""",
    note="deterministic MODE(): neither engine's builtin mode() defines "
    "tie order, so both sides spell it as count + row_number with an "
    "explicit (n DESC, value ASC) tie-break.  Two shuffles, both on "
    "low-cardinality brand keys; the window partition is tiny",
)
def q67(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = Catalog(spark, sf_dir).table("part")
    cnt = p.groupBy("p_brand", "p_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("p_brand").orderBy(F.desc("n"), F.asc("p_type"))
    return (
        cnt.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("p_brand", F.col("p_type").alias("mode_type"), F.col("n").alias("n_mode"))
        .orderBy("p_brand")
    )


@_q(
    "t28_rolling_median",
    """WITH d AS (SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
         floor(sum(o_totalprice) * 100 + 0.5) / 100 AS rev
       FROM orders GROUP BY 1),
       w AS (SELECT d, rev, list_sort(list(rev) OVER
               (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
             FROM d)
       SELECT strftime(d, '%Y-%m-%d') AS day, rev,
         arr[CAST((len(arr) + 1) // 2 AS INT)] AS med7
       FROM w ORDER BY 1""",
    note="7-row rolling MEDIAN of daily revenue.  Exact medians over "
    "sliding frames aren't a distributed builtin in either engine, so "
    "both sides collect the (bounded, 7-element) frame and pick the "
    "LOWER median element — no interpolation, so no float-half rounding "
    "hazard.  The window input is the pre-aggregated daily series "
    "(~days rows), never the raw fact table; rev uses the "
    "floor(x*100+0.5)/100 money-rounding convention",
)
def t28(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        (F.floor(F.sum("o_totalprice") * 100 + 0.5) / 100).alias("rev")
    )
    w = Window.orderBy("d").rowsBetween(-6, 0)
    arr = F.array_sort(F.collect_list("rev").over(w))
    return (
        daily.withColumn("arr", arr)
        .select(
            date_str(F.col("d")).alias("day"),
            "rev",
            F.element_at("arr", ((F.size("arr") + 1) / 2).cast("int")).alias("med7"),
        )
        .orderBy("day")
    )


@_q(
    "t29_temporal_align",
    """WITH base AS (SELECT user_id, ts,
         CASE WHEN event_type = 'click' THEN value END AS cv,
         CASE WHEN event_type = 'view' THEN value END AS vv
       FROM events WHERE event_type IN ('click', 'view')),
       al AS (SELECT user_id, ts,
         last_value(cv IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS c,
         last_value(vv IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS v
       FROM base)
       SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS t,
         round(c, 2) AS click_v, round(v, 2) AS view_v
       FROM al ORDER BY 1, 2""",
    note="temporal align-join (the temporal-DB 'temporal join'): two "
    "piecewise-constant properties of one entity widened onto the "
    "UNION of their change-points with per-column forward fill — the "
    "way the reference combines two temporal properties without "
    "resampling.  NULL before a prop's first change-point is "
    "semantics, not a bug.  Relies on the (user_id, ts) uniqueness "
    "precondition (tests/test_declared.py::test_oracle_preconditions); "
    "one combine-shuffle + one window shuffle, both on the entity key",
)
def t29(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..temporal.tprop import align

    ev = Catalog(spark, sf_dir).table("events")
    al = align(
        ev,
        ["click", "view"],
        entity_col="user_id",
        prop_col="event_type",
        ts_col="ts",
        value_col="value",
    )
    return al.select(
        "user_id",
        ts_str(F.col("ts")).alias("t"),
        F.round("click", 2).alias("click_v"),
        F.round("view", 2).alias("view_v"),
    ).orderBy("user_id", "t")


@_q(
    "q68_ntile_bands",
    """WITH t AS (SELECT c_mktsegment, c_custkey, c_acctbal,
         ntile(4) OVER (PARTITION BY c_mktsegment
                        ORDER BY c_acctbal, c_custkey) AS q
       FROM customer)
       SELECT c_mktsegment, q, count(*) AS n,
         round(min(c_acctbal), 2) AS lo, round(max(c_acctbal), 2) AS hi
       FROM t GROUP BY 1, 2 ORDER BY 1, 2""",
    note="ntile quartile banding per segment with explicit total "
    "ordering (acctbal, custkey) — ntile over a tied order is "
    "nondeterministic in both engines, the tie-break is the contract.  "
    "One window shuffle on the segment key, then a tiny band agg",
)
def q68(spark: SparkSession, sf_dir: str) -> DataFrame:
    cst = Catalog(spark, sf_dir).table("customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        cst.withColumn("q", F.ntile(4).over(w))
        .groupBy("c_mktsegment", "q")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("c_acctbal"), 2).alias("lo"),
            F.round(F.max("c_acctbal"), 2).alias("hi"),
        )
        .orderBy("c_mktsegment", "q")
    )


@_q(
    "t30_event_regex",
    """WITH seq AS (SELECT user_id,
         string_agg(left(event_type, 1), '' ORDER BY ts) AS s
       FROM events GROUP BY 1)
       SELECT user_id, length(s) AS seq_len,
         CAST(len(regexp_extract_all(s, 's[^p]*p')) AS BIGINT) AS n_conv
       FROM seq ORDER BY 1""",
    note="sequence-pattern matching over per-entity event timelines: "
    "compress each user's time-ordered event types to a one-char-per-"
    "event string (initials are distinct across the 5 types), then "
    "count signup-then-purchase conversions with a non-overlapping "
    "regex — the MATCH_RECOGNIZE-lite read.  Ordering inside the "
    "aggregate is made deterministic by sorting (ts, initial) structs "
    "before joining; relies on (user_id, ts) uniqueness.  One shuffle "
    "on the user key; the regex runs per user over a short string, "
    "embarrassingly parallel",
)
def t30(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    seq = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("ts"), F.substring("event_type", 1, 1).alias("i"))
                    )
                ),
                lambda s: s["i"],
            ),
            "",
        ).alias("s")
    )
    return seq.select(
        "user_id",
        F.length("s").cast("long").alias("seq_len"),
        F.size(F.regexp_extract_all("s", F.lit("s[^p]*p"), F.lit(0))).cast("long").alias("n_conv"),
    ).orderBy("user_id")


@_q(
    "q69_trimmed_mean_udaf",
    """WITH r AS (SELECT o_orderpriority, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice) AS rn,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
       FROM orders)
       SELECT o_orderpriority,
         round(round(sum(o_totalprice), 2) / count(*), 4) AS trimmed_avg,
         count(*) AS n_kept
       FROM r
       WHERE rn > CAST(floor(n * 0.1) AS BIGINT)
         AND rn <= n - CAST(floor(n * 0.1) AS BIGINT)
       GROUP BY 1 ORDER BY 1""",
    note="custom aggregate through the pandas UDAF extension point: a "
    "Series-to-scalar pandas_udf (10% symmetric trimmed mean) running "
    "inside groupBy().agg() — Arrow ships each group's column as one "
    "batch.  The oracle spells the same trim as rank-bounded "
    "window+filter.  Value-sorted trimming needs no tie-break (ties at "
    "the cut contribute equal sums); the cents-round-before-divide "
    "guard makes the mean cross-engine stable.  No partial agg exists "
    "for custom UDAFs — whole groups ship to one task, so this path "
    "is for moderate group cardinality (see q53 for the builtin "
    "alternative)",
)
def q69(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.udf_surface import pudf_trimmed_mean

    o = Catalog(spark, sf_dir).table("orders")
    # a grouped-agg pandas UDF cannot share an agg() with builtin
    # aggregates (INVALID_PANDAS_UDF_PLACEMENT) — run the builtin count
    # separately and broadcast-join the two tiny per-priority results
    trimmed = o.groupBy("o_orderpriority").agg(
        F.round(pudf_trimmed_mean("o_totalprice"), 4).alias("trimmed_avg")
    )
    n = F.count(F.lit(1))
    kept = o.groupBy("o_orderpriority").agg(
        (n - 2 * F.floor(n * 0.1)).cast("long").alias("n_kept")
    )
    return trimmed.join(F.broadcast(kept), "o_orderpriority").orderBy("o_orderpriority")


@_q(
    "t31_allen_relations",
    """WITH iv AS (SELECT user_id, ts AS s,
         ts + to_seconds(CAST(floor(value * 60) AS BIGINT)) AS e
       FROM events),
       pr AS (SELECT user_id, s, e,
         lead(s) OVER (PARTITION BY user_id ORDER BY s) AS ns,
         lead(e) OVER (PARTITION BY user_id ORDER BY s) AS ne
       FROM iv)
       SELECT CASE WHEN ns > e THEN 'precedes' WHEN ns = e THEN 'meets'
                   WHEN ne <= e THEN 'during' ELSE 'overlaps' END AS rel,
         count(*) AS n
       FROM pr WHERE ns IS NOT NULL GROUP BY 1 ORDER BY 1""",
    note="Allen interval-algebra classification of consecutive per-user "
    "intervals (event start + value-derived duration): precedes / "
    "meets / overlaps / during — the interval-reasoning read over a "
    "temporal store.  Distinct starts collapse Allen's 13 relations "
    "to these 4.  Durations use floor(value*60) whole seconds because "
    "double->int CAST truncates in Spark but rounds in DuckDB.  One "
    "window shuffle on the entity key, then a 4-row combinable agg",
)
def t31(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    iv = ev.select(
        "user_id",
        F.col("ts").alias("s"),
        F.expr("timestampadd(SECOND, CAST(floor(value * 60) AS BIGINT), ts)").alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("s")
    pr = iv.select(
        "s", "e",
        F.lead("s").over(w).alias("ns"),
        F.lead("e").over(w).alias("ne"),
    ).filter(F.col("ns").isNotNull())
    rel = (
        F.when(F.col("ns") > F.col("e"), "precedes")
        .when(F.col("ns") == F.col("e"), "meets")
        .when(F.col("ne") <= F.col("e"), "during")
        .otherwise("overlaps")
    )
    return (
        pr.groupBy(rel.alias("rel"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("rel")
    )


@_q(
    "q70_approx_sketches",
    None,
    note="the 100 TB cardinality/quantile toolkit: "
    "approx_count_distinct (HyperLogLog++, ~1.6 KB of mergeable "
    "registers per group regardless of cardinality) and "
    "approx_percentile (mergeable quantile summaries) — the operators "
    "that replace exact DISTINCT/percentile when the exact forms' "
    "per-group state would not fit.  Rows-only by design: sketch "
    "estimates are engine-specific; the accuracy contract (<5% "
    "relative error vs exact at sf0.01) is enforced by "
    "tests/test_scale_ops.py::test_approx_sketch_accuracy",
)
def q70(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.approx_count_distinct("o_custkey", 0.02).alias("approx_custs"),
            F.round(F.expr("approx_percentile(o_totalprice, 0.5, 10000)"), 2).alias(
                "approx_med"
            ),
        )
        .orderBy("o_orderpriority")
    )


@_q(
    "q71_chi2_independence",
    """WITH ct AS (SELECT c_mktsegment AS seg, o_orderpriority AS pri,
         count(*) AS n
       FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
       tot AS (SELECT sum(n) AS t FROM ct),
       rt AS (SELECT seg, sum(n) AS r FROM ct GROUP BY 1),
       cl AS (SELECT pri, sum(n) AS c FROM ct GROUP BY 1)
       SELECT round(sum(pow(ct.n - rt.r*cl.c/tot.t, 2)
                        / (rt.r*cl.c/tot.t)), 4) AS chi2,
         CAST((SELECT count(*) FROM rt) - 1 AS INT)
           * CAST((SELECT count(*) FROM cl) - 1 AS INT) AS dof,
         CAST(tot.t AS BIGINT) AS n
       FROM ct JOIN rt USING (seg) JOIN cl USING (pri) CROSS JOIN tot
       GROUP BY tot.t""",
    note="chi-squared independence test between two categorical "
    "dimensions (segment x priority), entirely as aggregates: the "
    "contingency table is one combinable groupBy over the fact join, "
    "margins and the total are tiny re-aggregations of it that "
    "broadcast back — the raw table is read ONCE.  The data-drift / "
    "association screen a feature pipeline runs",
)
def q71(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    ct = (
        c.table("orders")
        .join(F.broadcast(c.table("customer")), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("seg"), F.col("o_orderpriority").alias("pri"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rt = ct.groupBy("seg").agg(F.sum("n").alias("r"))
    cl = ct.groupBy("pri").agg(F.sum("n").alias("c"))
    tot = ct.agg(F.sum("n").alias("t"))
    dims = ct.agg(
        ((F.countDistinct("seg") - 1) * (F.countDistinct("pri") - 1))
        .cast("int")
        .alias("dof")
    )
    e = F.col("r") * F.col("c") / F.col("t")
    chi = (
        ct.join(F.broadcast(rt), "seg")
        .join(F.broadcast(cl), "pri")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.round(F.sum(F.pow(F.col("n") - e, 2) / e), 4).alias("chi2"),
            F.sum("n").alias("n_total"),
        )
    )
    return chi.crossJoin(F.broadcast(dims)).select(
        "chi2", "dof", F.col("n_total").alias("n")
    )


@_q(
    "q72_benford_digits",
    """WITH d AS (SELECT CAST(floor(o_totalprice
           / pow(10, floor(log10(o_totalprice)))) AS INT) AS dig
         FROM orders WHERE o_totalprice > 0),
       c AS (SELECT dig, count(*) AS n FROM d GROUP BY 1),
       t AS (SELECT sum(n) AS t FROM c)
       SELECT dig, n, round(n / t.t, 4) AS share,
         round(log10(1.0 + 1.0/dig), 4) AS benford,
         round(abs(n / t.t - log10(1.0 + 1.0/dig)), 4) AS dev
       FROM c CROSS JOIN t ORDER BY dig""",
    note="Benford first-significant-digit audit — the anomaly/fraud "
    "screen over a monetary fact column.  The digit is extracted "
    "arithmetically (floor(x / 10^floor(log10 x))), never via double-"
    "to-string formatting, which differs between engines.  One "
    "9-bucket combinable agg; the grand total broadcasts back",
)
def q72(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders").filter(F.col("o_totalprice") > 0)
    dig = F.floor(
        F.col("o_totalprice") / F.pow(10.0, F.floor(F.log10("o_totalprice")))
    ).cast("int")
    cnt = o.groupBy(dig.alias("dig")).agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.agg(F.sum("n").alias("t"))
    benford = F.log10(1.0 + 1.0 / F.col("dig"))
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "dig",
            "n",
            F.round(F.col("n") / F.col("t"), 4).alias("share"),
            F.round(benford, 4).alias("benford"),
            F.round(F.abs(F.col("n") / F.col("t") - benford), 4).alias("dev"),
        )
        .orderBy("dig")
    )


@_q(
    "t32_burst_detection",
    """WITH b AS (SELECT event_type, date_trunc('hour', ts) AS h,
         count(*) AS n FROM events GROUP BY 1, 2),
       z AS (SELECT event_type, h, n,
         avg(n) OVER w AS mu, stddev_samp(n) OVER w AS sd
         FROM b WINDOW w AS (PARTITION BY event_type ORDER BY h
           ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
       SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S.%f') AS hh, n,
         round((n - mu) / sd, 2) AS zscore
       FROM z WHERE sd > 0 AND (n - mu) / sd > 2.5 ORDER BY 1, 2""",
    note="rate-burst detection: hourly event counts scored against a "
    "trailing 24-hour mean/std frame that EXCLUDES the current row "
    "(so a burst can't suppress its own baseline) — the ops-anomaly "
    "read.  The window runs on the pre-aggregated hourly series, "
    "never raw events; the 2.5-sigma threshold is applied to the "
    "unrounded score (a boundary flip would need both engines' "
    "sequential cumulative sums to diverge across the threshold, "
    "~1e-13 relative)",
)
def t32(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    b = ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("event_type").orderBy("h").rowsBetween(-24, -1)
    z = b.select(
        "event_type", "h", "n",
        F.avg("n").over(w).alias("mu"),
        F.stddev_samp("n").over(w).alias("sd"),
    )
    score = (F.col("n") - F.col("mu")) / F.col("sd")
    return (
        z.filter((F.col("sd") > 0) & (score > 2.5))
        .select(
            "event_type",
            ts_str(F.col("h")).alias("hh"),
            "n",
            F.round(score, 2).alias("zscore"),
        )
        .orderBy("event_type", "hh")
    )


@_q(
    "q73_weighted_median",
    """WITH s AS (SELECT l_returnflag AS rf, l_quantity AS q,
         sum(l_extendedprice) OVER (PARTITION BY l_returnflag
           ORDER BY l_quantity, l_orderkey, l_linenumber) AS cw,
         sum(l_extendedprice) OVER (PARTITION BY l_returnflag) AS tw
       FROM lineitem)
       SELECT rf, min(q) AS wmedian FROM s WHERE cw >= tw / 2
       GROUP BY 1 ORDER BY 1""",
    note="weighted median (value where cumulative weight crosses half "
    "the total) — the robust center when rows carry unequal mass, "
    "which plain median ignores.  Cumulative ordering carries a full "
    "(value, orderkey, linenumber) tie-break so the crossing row is "
    "unique; one window shuffle on the group key",
)
def q73(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    wc = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_quantity", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("l_returnflag")
    s = li.select(
        F.col("l_returnflag").alias("rf"),
        F.col("l_quantity").alias("q"),
        F.sum("l_extendedprice").over(wc).alias("cw"),
        F.sum("l_extendedprice").over(wt).alias("tw"),
    )
    return (
        s.filter(F.col("cw") >= F.col("tw") / 2)
        .groupBy("rf")
        .agg(F.min("q").alias("wmedian"))
        .orderBy("rf")
    )


@_q(
    "q74_join_explosion_audit",
    """WITH k AS (SELECT l_partkey AS pk, count(*) AS n
         FROM lineitem GROUP BY 1)
       SELECT count(*) AS n_keys, CAST(max(n) AS BIGINT) AS max_mult,
         CAST(sum(n*n) AS BIGINT) AS predicted_pairs,
         round(max(n) / avg(n), 2) AS skew_ratio
       FROM k""",
    note="the audit run BEFORE a self-join or fact-fact join at scale: "
    "per-key multiplicities, the exact predicted output size "
    "(sum n^2), and the hot-key skew ratio that decides whether to "
    "salt (SCALE.md) — one combinable count plus a 4-scalar "
    "re-aggregation, costing one scan instead of one blown-up join",
)
def q74(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    k = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    return k.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_mult"),
        F.sum(F.col("n") * F.col("n")).alias("predicted_pairs"),
        F.round(F.max("n") / F.avg("n"), 2).alias("skew_ratio"),
    )


@_q(
    "q75_share_of_parent",
    """WITH n AS (SELECT r_name, n_name,
         floor(sum(o_totalprice) * 100 + 0.5) / 100 AS rev
       FROM orders JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey GROUP BY 1, 2)
       SELECT r_name, n_name, rev,
         round(100.0 * rev / sum(rev) OVER (PARTITION BY r_name), 2)
           AS pct_of_region,
         round(100.0 * rev / sum(rev) OVER (), 2) AS pct_of_total
       FROM n ORDER BY 1, 2""",
    note="ratio-to-parent at two hierarchy levels (nation within "
    "region, region within grand total) — the BI share read.  Both "
    "window totals run over the tiny pre-aggregated (region, nation) "
    "series, and the shares divide ALREADY-ROUNDED revenue so the "
    "ratio is cross-engine stable; dims broadcast, one shuffle total",
)
def q75(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    n = (
        c.table("orders")
        .join(F.broadcast(c.table("customer")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.table("nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(c.table("region")), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg((F.floor(F.sum("o_totalprice") * 100 + 0.5) / 100).alias("rev"))
    )
    wr = Window.partitionBy("r_name")
    wt = Window.partitionBy()
    return n.select(
        "r_name", "n_name", "rev",
        F.round(100.0 * F.col("rev") / F.sum("rev").over(wr), 2).alias("pct_of_region"),
        F.round(100.0 * F.col("rev") / F.sum("rev").over(wt), 2).alias("pct_of_total"),
    ).orderBy("r_name", "n_name")


@_q(
    "t33_cusum_change_detection",
    """WITH d AS (SELECT r_name, CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
         floor(sum(o_totalprice) * 100 + 0.5) / 100 AS rev
       FROM orders JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey GROUP BY 1, 2),
       m AS (SELECT *, avg(rev) OVER (PARTITION BY r_name) AS mu FROM d),
       c AS (SELECT r_name, d, sum(rev - mu) OVER
               (PARTITION BY r_name ORDER BY d) AS cs FROM m),
       f AS (SELECT r_name, d, round(cs - min(cs) OVER
               (PARTITION BY r_name ORDER BY d), 2) AS cusum FROM c)
       SELECT r_name, strftime(d, '%Y-%m-%d') AS day, cusum FROM f
       ORDER BY cusum DESC, r_name, day LIMIT 20""",
    note="one-sided CUSUM control chart per region, via the prefix-sum "
    "identity max(0, S_prev + x) == cs - running_min(cs) — which turns "
    "the inherently recursive CUSUM into two plain windows, the only "
    "way it distributes.  Windows run over the pre-aggregated daily "
    "series; top-20 upward drifts with a rounded-value sort key and "
    "full tie-break",
)
def t33(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    d = (
        c.table("orders")
        .join(F.broadcast(c.table("customer")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.table("nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(c.table("region")), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", F.to_date("o_orderdate").alias("d"))
        .agg((F.floor(F.sum("o_totalprice") * 100 + 0.5) / 100).alias("rev"))
    )
    wp = Window.partitionBy("r_name")
    wo = Window.partitionBy("r_name").orderBy("d")
    m = d.withColumn("mu", F.avg("rev").over(wp))
    cs = m.withColumn("cs", F.sum(F.col("rev") - F.col("mu")).over(wo))
    f = cs.select(
        "r_name",
        date_str(F.col("d")).alias("day"),
        F.round(F.col("cs") - F.min("cs").over(wo), 2).alias("cusum"),
    )
    return f.orderBy(F.desc("cusum"), "r_name", "day").limit(20)


@_q(
    "q76_audience_overlap",
    """WITH m AS (SELECT DISTINCT o_orderpriority AS pri, o_custkey AS c
         FROM orders)
       SELECT a.pri AS p1, b.pri AS p2, count(*) AS n_shared
       FROM m a JOIN m b ON a.c = b.c AND a.pri <= b.pri
       GROUP BY 1, 2 ORDER BY 1, 2""",
    note="audience-overlap matrix: distinct members per group, then a "
    "member-keyed self-join counting shared members for every group "
    "pair (diagonal = audience size).  The join key is the MEMBER, so "
    "cost is sum over members of (groups-per-member choose 2) — "
    "bounded by the group count squared per member, never by group "
    "sizes; the segmentation read behind reach/dedup planning",
)
def q76(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    m = o.select(F.col("o_orderpriority").alias("pri"), F.col("o_custkey").alias("c")).distinct()
    a = m.select(F.col("pri").alias("p1"), "c")
    b = m.select(F.col("pri").alias("p2"), F.col("c").alias("c2"))
    return (
        a.join(b, (F.col("c") == F.col("c2")) & (F.col("p1") <= F.col("p2")))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .orderBy("p1", "p2")
    )


@_q(
    "t34_forecast_backtest",
    """WITH d AS (SELECT r_name, CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
         floor(sum(o_totalprice) * 100 + 0.5) / 100 AS rev
       FROM orders JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey GROUP BY 1, 2),
       f AS (SELECT r_name, rev, lag(rev, 7) OVER
               (PARTITION BY r_name ORDER BY d) AS fc FROM d)
       SELECT r_name, count(*) AS n_eval,
         round(avg(abs(rev - fc)), 2) AS mae,
         round(avg(abs(rev - fc) / rev) * 100, 2) AS mape_pct
       FROM f WHERE fc IS NOT NULL GROUP BY 1 ORDER BY 1""",
    note="forecast backtesting with the seasonal-naive baseline "
    "(predict this day = 7 observations ago), scoring MAE and MAPE "
    "per region — the evaluation harness any forecasting pipeline "
    "needs BEFORE a model earns its keep, and the benchmark a model "
    "must beat.  'Seven observations back' (not calendar days) is "
    "the declared semantic, identical in both engines across date "
    "gaps.  One window + one combinable agg over the pre-aggregated "
    "daily series",
)
def t34(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    d = (
        c.table("orders")
        .join(F.broadcast(c.table("customer")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.table("nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(c.table("region")), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", F.to_date("o_orderdate").alias("d"))
        .agg((F.floor(F.sum("o_totalprice") * 100 + 0.5) / 100).alias("rev"))
    )
    w = Window.partitionBy("r_name").orderBy("d")
    f = d.select("r_name", "rev", F.lag("rev", 7).over(w).alias("fc")).filter(
        F.col("fc").isNotNull()
    )
    err = F.abs(F.col("rev") - F.col("fc"))
    return (
        f.groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.round(F.avg(err), 2).alias("mae"),
            F.round(F.avg(err / F.col("rev")) * 100, 2).alias("mape_pct"),
        )
        .orderBy("r_name")
    )


@_q(
    "t35_scd2_point_in_time",
    """WITH u AS (SELECT o_custkey, o_orderdate,
         round(max(o_totalprice), 2) AS value
       FROM orders WHERE o_custkey < 100 GROUP BY 1, 2),
       h AS (SELECT o_custkey, o_orderdate AS vf, value,
         lead(o_orderdate) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate) AS vt FROM u)
       SELECT o_custkey, value FROM h
       WHERE vf <= TIMESTAMP '1998-06-01'
         AND (vt IS NULL OR TIMESTAMP '1998-06-01' < vt)
       ORDER BY 1""",
    note="point-in-time dimension read over q32's SCD-2 history: the "
    "row whose [valid_from, valid_to) interval contains t — the AS OF "
    "join side of history-preserving upserts, and the reference's "
    "temporal point-read re-expressed over immutable rows.  At scale "
    "the validity filter prunes on the history table's time-bucket "
    "partitioning; entities absent at t (first change after t) "
    "correctly drop out",
)
def t35(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.writers import upsert_scd2

    o = Catalog(spark, sf_dir).table("orders").filter(F.col("o_custkey") < 100)
    updates = o.groupBy("o_custkey", "o_orderdate").agg(
        F.round(F.max("o_totalprice"), 2).alias("value")
    )
    hist = upsert_scd2(updates.limit(0), updates, ["o_custkey"], "o_orderdate")
    t = F.lit("1998-06-01").cast("timestamp")
    return (
        hist.filter(
            (F.col("o_orderdate") <= t)
            & (F.col("valid_to").isNull() | (t < F.col("valid_to")))
        )
        .select("o_custkey", "value")
        .orderBy("o_custkey")
    )


@_q(
    "q77_profile_audit",
    """SELECT 'event_type' AS col, count(*) AS n,
         count(event_type) AS n_nonnull,
         count(DISTINCT event_type) AS n_distinct FROM events
       UNION ALL SELECT 'props', count(*), count(props),
         count(DISTINCT props) FROM events
       UNION ALL SELECT 'user_id', count(*), count(user_id),
         count(DISTINCT user_id) FROM events
       UNION ALL SELECT 'value', count(*), count(value),
         count(DISTINCT value) FROM events
       ORDER BY 1""",
    note="table profiling audit (per-column row/non-null/distinct "
    "counts) — the dbt-test / data-contract read that gates a "
    "pipeline run.  Each column's stats are one combinable agg; at "
    "100 TB the four scans collapse to ONE via a multi-aggregate "
    "projection (Catalyst shares the scan across the UNION branches "
    "when expressed as a single agg — the Spark side does exactly "
    "that and unpivots)",
)
def q77(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    cols = ["event_type", "props", "user_id", "value"]
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.count(c).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
        ]
    wide = ev.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__n, {c}__nn, {c}__nd" for c in cols
    )
    return (
        wide.select(
            F.expr(
                f"stack({len(cols)}, {stack}) AS (col, n, n_nonnull, n_distinct)"
            )
        )
        .orderBy("col")
    )


@_q(
    "q79_table_checksum",
    """WITH h AS (SELECT md5(o_orderkey || '|' || o_orderstatus || '|'
           || CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR)) AS m
         FROM orders),
       v AS (SELECT
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
       SELECT count(*) AS n_rows, CAST(sum(val) AS BIGINT) AS checksum
       FROM v""",
    note="order-independent table checksum: per-row md5 over the "
    "business key + normalized values, folded to an 11-hex-digit int "
    "and SUMMED — commutative, so it's a combinable aggregate needing "
    "no sort, and two replicas compare with one number (the "
    "pt-checksum / replica-consistency read).  Money normalizes to "
    "integer cents before hashing so the hash input is exact text in "
    "both engines.  At trillion-row scale the fold runs modular "
    "per-partition to stay in 64 bits; hierarchical mod-sums compose",
)
def q79(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    m = F.md5(
        F.concat_ws(
            "|",
            F.col("o_orderkey"),
            F.col("o_orderstatus"),
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"),
        )
    )
    val = None
    for i in range(11):
        d = (
            F.instr(F.lit("0123456789abcdef"), F.substring(m, i + 1, 1)) - 1
        ).cast("long") * F.lit(16 ** (10 - i)).cast("long")
        val = d if val is None else val + d
    return o.select(val.alias("val")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("val").cast("long").alias("checksum"),
    )


@_q(
    "q78_inverted_index",
    """WITH tok AS (SELECT DISTINCT t.term, doc_id FROM documents,
         unnest(string_split(text, ' ')) AS t(term) WHERE t.term <> ''),
       post AS (SELECT term, count(*) AS df,
         string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
       FROM tok GROUP BY 1)
       SELECT term, df, postings FROM post WHERE df <= 10
       ORDER BY term""",
    note="inverted-index build (term -> sorted posting list) for the "
    "rare-term tail (df <= 10) — the retrieval-index read.  Postings "
    "are rendered as a canonical comma string so both engines hash "
    "identically; at scale posting lists stay arrays bucketed by "
    "term, and hot head terms (stopwords) are exactly the ones a df "
    "cap excludes here",
)
def q78(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    tok = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .distinct()
    )
    post = tok.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.concat_ws(",", F.sort_array(F.collect_list("doc_id"))).alias("postings"),
    )
    return post.filter(F.col("df") <= 10).select("term", "df", "postings").orderBy("term")


@_q(
    "t36_alert_episodes",
    """WITH b AS (SELECT event_type, date_trunc('hour', ts) AS h,
         count(*) AS n FROM events GROUP BY 1, 2),
       z AS (SELECT event_type, h, n, avg(n) OVER w AS mu,
         stddev_samp(n) OVER w AS sd
         FROM b WINDOW w AS (PARTITION BY event_type ORDER BY h
           ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
       fl AS (SELECT event_type, h, round((n - mu) / sd, 2) AS zs
              FROM z WHERE sd > 0 AND (n - mu) / sd > 2.0),
       isl AS (SELECT *, epoch(h) / 3600 - row_number() OVER
               (PARTITION BY event_type ORDER BY h) AS grp FROM fl)
       SELECT event_type,
         strftime(min(h), '%Y-%m-%d %H:%M:%S.%f') AS ep_start,
         strftime(max(h), '%Y-%m-%d %H:%M:%S.%f') AS ep_end,
         count(*) AS n_hours, max(zs) AS peak_z
       FROM isl GROUP BY event_type, grp ORDER BY 1, 2""",
    note="alert-episode condensation: t32's burst flags merged into "
    "contiguous episodes via gaps-and-islands (hour-index minus "
    "row_number is constant within a run), reporting span + peak "
    "z-score — what a pager actually wants instead of per-hour spam.  "
    "The island key stays exact as a double (hours-since-epoch << "
    "2^52); everything runs on the tiny flagged set",
)
def t36(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    b = ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("event_type").orderBy("h").rowsBetween(-24, -1)
    z = b.select(
        "event_type", "h", "n",
        F.avg("n").over(w).alias("mu"),
        F.stddev_samp("n").over(w).alias("sd"),
    )
    score = (F.col("n") - F.col("mu")) / F.col("sd")
    fl = z.filter((F.col("sd") > 0) & (score > 2.0)).select(
        "event_type", "h", F.round(score, 2).alias("zs")
    )
    wr = Window.partitionBy("event_type").orderBy("h")
    isl = fl.withColumn(
        "grp", F.unix_timestamp("h") / 3600 - F.row_number().over(wr)
    )
    return (
        isl.groupBy("event_type", "grp")
        .agg(
            ts_str(F.min("h")).alias("ep_start"),
            ts_str(F.max("h")).alias("ep_end"),
            F.count(F.lit(1)).alias("n_hours"),
            F.max("zs").alias("peak_z"),
        )
        .select("event_type", "ep_start", "ep_end", "n_hours", "peak_z")
        .orderBy("event_type", "ep_start")
    )


@_q(
    "t37_business_days",
    """WITH lt AS (SELECT o_orderpriority AS pri,
         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d0,
         CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d1
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       bd AS (SELECT pri,
         (d1 // 7 - d0 // 7) * 5
         + least((d1 % 7 + 3) % 7, 4) - least((d0 % 7 + 3) % 7, 4) AS bdays
       FROM lt)
       SELECT pri, count(*) AS n,
         floor(avg(bdays) * 100 + 0.5) / 100 AS avg_bd,
         CAST(min(bdays) AS INT) AS min_bd, CAST(max(bdays) AS INT) AS max_bd
       FROM bd GROUP BY 1 ORDER BY 1""",
    note="business-day (Mon-Fri) lead time per priority, via pure "
    "epoch-day arithmetic: full-weeks*5 plus a clamped weekday "
    "offset — engine day-of-week builtins DISAGREE on week start "
    "(Spark 1=Sunday, DuckDB 0=Sunday), so the weekday comes from "
    "(epoch_day + 3) mod 7 which no dialect can misread.  Spot-"
    "checked Mon->next-Mon == 5.  Stays entirely in codegen integer "
    "math on the joined fact scan",
)
def t37(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    epoch = F.lit("1970-01-01").cast("date")
    lt = (
        c.table("lineitem")
        .join(c.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("o_orderpriority").alias("pri"),
            F.datediff(F.to_date("o_orderdate"), epoch).cast("long").alias("d0"),
            F.datediff(F.to_date("l_shipdate"), epoch).cast("long").alias("d1"),
        )
    )
    bdays = (
        (F.expr("d1 div 7") - F.expr("d0 div 7")) * 5
        + F.least((F.col("d1") % 7 + 3) % 7, F.lit(4).cast("long"))
        - F.least((F.col("d0") % 7 + 3) % 7, F.lit(4).cast("long"))
    )
    return (
        lt.select("pri", bdays.alias("bdays"))
        .groupBy("pri")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.floor(F.avg("bdays") * 100 + 0.5) / 100).alias("avg_bd"),
            F.min("bdays").cast("int").alias("min_bd"),
            F.max("bdays").cast("int").alias("max_bd"),
        )
        .orderBy("pri")
    )


@_q(
    "q80_lift_curve",
    """WITH rev AS (SELECT c_custkey, c_acctbal,
         coalesce(sum(o_totalprice), 0) AS rv
       FROM customer LEFT JOIN orders ON o_custkey = c_custkey GROUP BY 1, 2),
       r AS (SELECT ntile(10) OVER (ORDER BY c_acctbal DESC, c_custkey)
               AS decile, rv FROM rev),
       d AS (SELECT decile, count(*) AS n,
             floor(sum(rv) * 100 + 0.5) / 100 AS drev FROM r GROUP BY 1),
       t AS (SELECT sum(drev) AS tot FROM d)
       SELECT decile, n, drev,
         round(100.0 * sum(drev) OVER (ORDER BY decile) / t.tot, 2)
           AS cum_rev_pct
       FROM d CROSS JOIN t ORDER BY 1""",
    note="cumulative-gains / lift table: customers ranked by a score "
    "(acctbal, explicit tie-break), deciled, with cumulative revenue "
    "share per decile — the model-evaluation read that says whether "
    "the score concentrates value.  A flat ~10%/decile curve (as "
    "here) is itself the finding: balance is a valid test outcome.  "
    "Windows over 10 pre-aggregated rows; revenue floor-guarded "
    "before any division",
)
def q80(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    rev = (
        c.table("customer")
        .join(c.table("orders"), F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)).alias("rv"))
    )
    wd = Window.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    r = rev.select(F.ntile(10).over(wd).alias("decile"), "rv")
    d = r.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"),
        (F.floor(F.sum("rv") * 100 + 0.5) / 100).alias("drev"),
    )
    t = d.agg(F.sum("drev").alias("tot"))
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        d.crossJoin(F.broadcast(t))
        .select(
            "decile", "n", "drev",
            F.round(100.0 * F.sum("drev").over(wc) / F.col("tot"), 2).alias("cum_rev_pct"),
        )
        .orderBy("decile")
    )


@_q(
    "t38_trend_slopes",
    """WITH d AS (SELECT r_name, CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
         CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT) AS rc
       FROM orders JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey GROUP BY 1, 2),
       x AS (SELECT r_name, d, rc,
         CAST(d - DATE '1970-01-01' AS BIGINT) AS xd FROM d),
       s AS (SELECT r_name, d,
         CAST(count(*) OVER w AS BIGINT) AS n,
         CAST(sum(xd) OVER w AS BIGINT) AS sx,
         CAST(sum(rc) OVER w AS BIGINT) AS sy,
         CAST(sum(xd * rc) OVER w AS BIGINT) AS sxy,
         CAST(sum(xd * xd) OVER w AS BIGINT) AS sxx
         FROM x WINDOW w AS (PARTITION BY r_name ORDER BY d
           ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
       sl AS (SELECT r_name, d,
         round(CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0, 4) AS slope
         FROM s WHERE n = 14)
       SELECT r_name, strftime(d, '%Y-%m-%d') AS day, slope FROM sl
       ORDER BY slope DESC, r_name, day LIMIT 10""",
    note="rolling 14-day OLS trend slope (dollars/day) per region, top "
    "upward ramps — the trend-detection read.  All five regression "
    "moments are INTEGER sums (days x revenue-cents), exact in both "
    "engines, so the slope is one division of identical integers — "
    "the naive double formulation loses ~10 digits to cancellation "
    "(n*sxy - sx*sy of near-equal 1e15 terms) and its rounding "
    "diverges cross-engine.  Windows run over the pre-aggregated "
    "daily series",
)
def t38(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    d = (
        c.table("orders")
        .join(F.broadcast(c.table("customer")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.table("nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(c.table("region")), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", F.to_date("o_orderdate").alias("d"))
        .agg(F.floor(F.sum("o_totalprice") * 100 + 0.5).cast("long").alias("rc"))
    )
    x = d.withColumn(
        "xd", F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")).cast("long")
    )
    w = Window.partitionBy("r_name").orderBy("d").rowsBetween(-13, 0)
    s = x.select(
        "r_name", "d",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("xd").over(w).alias("sx"),
        F.sum("rc").over(w).alias("sy"),
        F.sum(F.col("xd") * F.col("rc")).over(w).alias("sxy"),
        F.sum(F.col("xd") * F.col("xd")).over(w).alias("sxx"),
    ).filter(F.col("n") == 14)
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return (
        s.select(
            "r_name",
            date_str(F.col("d")).alias("day"),
            F.round(num / den / 100.0, 4).alias("slope"),
        )
        .orderBy(F.desc("slope"), "r_name", "day")
        .limit(10)
    )


@_q(
    "t39_peak_detection",
    """WITH d AS (SELECT r_name, CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
         CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT) AS rc
       FROM orders JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey GROUP BY 1, 2),
       w AS (SELECT r_name, d, rc,
         lag(rc) OVER pw AS prev, lead(rc) OVER pw AS nxt,
         list_sort(list(rc) OVER (PARTITION BY r_name ORDER BY d
           ROWS BETWEEN 7 PRECEDING AND 7 FOLLOWING)) AS arr
         FROM d WINDOW pw AS (PARTITION BY r_name ORDER BY d)),
       p AS (SELECT r_name, d, rc, arr[CAST((len(arr) + 1) // 2 AS INT)] AS med
         FROM w WHERE prev IS NOT NULL AND nxt IS NOT NULL
           AND rc > prev AND rc > nxt)
       SELECT r_name, strftime(d, '%Y-%m-%d') AS day, rc AS rev_cents,
         med AS med_cents
       FROM p WHERE rc > 2 * med ORDER BY 1, 2""",
    note="prominence-gated peak detection: strict local maxima that "
    "also clear 2x the CENTERED 15-row lower-median baseline — the "
    "spike-mining read that ignores noise peaks.  Every comparison is "
    "exact integer cents, so there is no float rounding anywhere; the "
    "centered frame (7 preceding / 7 following) shows the frame "
    "vocabulary beyond trailing windows.  Runs on the pre-aggregated "
    "daily series",
)
def t39(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    d = (
        c.table("orders")
        .join(F.broadcast(c.table("customer")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.table("nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(c.table("region")), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", F.to_date("o_orderdate").alias("d"))
        .agg(F.floor(F.sum("o_totalprice") * 100 + 0.5).cast("long").alias("rc"))
    )
    pw = Window.partitionBy("r_name").orderBy("d")
    cw = pw.rowsBetween(-7, 7)
    w = d.select(
        "r_name", "d", "rc",
        F.lag("rc").over(pw).alias("prev"),
        F.lead("rc").over(pw).alias("nxt"),
        F.array_sort(F.collect_list("rc").over(cw)).alias("arr"),
    )
    med = F.element_at("arr", ((F.size("arr") + 1) / 2).cast("int"))
    return (
        w.filter(
            F.col("prev").isNotNull()
            & F.col("nxt").isNotNull()
            & (F.col("rc") > F.col("prev"))
            & (F.col("rc") > F.col("nxt"))
        )
        .withColumn("med", med)
        .filter(F.col("rc") > 2 * F.col("med"))
        .select(
            "r_name",
            date_str(F.col("d")).alias("day"),
            F.col("rc").alias("rev_cents"),
            F.col("med").alias("med_cents"),
        )
        .orderBy("r_name", "day")
    )


@_q(
    "q81_integrity_audit",
    """SELECT 'lineitem->orders' AS fk, count(*) AS n_rows,
         count(*) FILTER (WHERE o.o_orderkey IS NULL) AS n_orphans
       FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
       UNION ALL
       SELECT 'lineitem->part', count(*),
         count(*) FILTER (WHERE p.p_partkey IS NULL)
       FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
       UNION ALL
       SELECT 'orders->customer', count(*),
         count(*) FILTER (WHERE c.c_custkey IS NULL)
       FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
       ORDER BY 1""",
    note="referential-integrity audit across three FK edges (orphan "
    "counts via LEFT JOIN + FILTER aggregates) — the constraint check "
    "a lakehouse must run itself since parquet enforces nothing.  "
    "Zero orphans is the expected PASS outcome; the dim sides "
    "broadcast, so each edge costs one scan of its fact side",
)
def q81(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)

    def audit(fact, dim, fk, pk, name):
        j = fact.join(F.broadcast(dim), F.col(fk) == F.col(pk), "left")
        return j.agg(
            F.lit(name).alias("fk"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(F.col(pk).isNull(), 1)).alias("n_orphans"),
        ).select("fk", "n_rows", "n_orphans")

    li, o, p, cst = (
        c.table("lineitem"), c.table("orders"), c.table("part"), c.table("customer")
    )
    return (
        audit(li, o, "l_orderkey", "o_orderkey", "lineitem->orders")
        .unionByName(audit(li, p, "l_partkey", "p_partkey", "lineitem->part"))
        .unionByName(audit(o, cst, "o_custkey", "c_custkey", "orders->customer"))
        .orderBy("fk")
    )


@_q(
    "q82_markov_transitions",
    """WITH s AS (SELECT user_id, event_type, lag(event_type) OVER
         (PARTITION BY user_id ORDER BY ts) AS prev FROM events),
       c AS (SELECT prev, event_type AS curr, count(*) AS n FROM s
             WHERE prev IS NOT NULL GROUP BY 1, 2),
       t AS (SELECT prev, sum(n) AS tot FROM c GROUP BY 1)
       SELECT c.prev, c.curr, c.n, round(c.n / t.tot, 4) AS p
       FROM c JOIN t USING (prev) ORDER BY 1, 2""",
    note="first-order Markov transition matrix over per-user event "
    "sequences (MLE: row-normalized bigram counts) — the behavioral-"
    "model estimation read behind next-event prediction and funnel "
    "simulation.  One window shuffle on the entity key, one "
    "combinable pair count, row totals broadcast back; probabilities "
    "are exact-integer ratios so rounding is engine-stable.  Relies "
    "on (user_id, ts) uniqueness for sequence order",
)
def q82(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    w = Window.partitionBy("user_id").orderBy("ts")
    s = ev.select("event_type", F.lag("event_type").over(w).alias("prev")).filter(
        F.col("prev").isNotNull()
    )
    c = s.groupBy("prev", F.col("event_type").alias("curr")).agg(
        F.count(F.lit(1)).alias("n")
    )
    t = c.groupBy("prev").agg(F.sum("n").alias("tot"))
    return (
        c.join(F.broadcast(t), "prev")
        .select("prev", "curr", "n", F.round(F.col("n") / F.col("tot"), 4).alias("p"))
        .orderBy("prev", "curr")
    )


def _funnel_oracle(k: int = 3) -> str:
    steps = []
    for i in range(1, k + 1):
        steps.append(
            f"""h{i} AS (
  SELECT p.prev AS state,
    sum(CASE WHEN p.curr = 'purchase' THEN p.pr
             ELSE p.pr * coalesce(h.h, 0) END) AS h
  FROM pm p LEFT JOIN h{i-1} h ON h.state = p.curr AND p.curr <> 'purchase'
  GROUP BY 1)"""
        )
    return (
        """WITH s AS (SELECT user_id, event_type, lag(event_type) OVER
    (PARTITION BY user_id ORDER BY ts) AS prev FROM events),
c AS (SELECT prev, event_type AS curr, count(*) AS n FROM s
      WHERE prev IS NOT NULL GROUP BY 1, 2),
t AS (SELECT prev, sum(n) AS tot FROM c GROUP BY 1),
pm AS (SELECT c.prev, c.curr, c.n / t.tot AS pr FROM c JOIN t USING (prev)),
h0 AS (SELECT prev AS state, 0.0 AS h FROM t),\n"""
        + ",\n".join(steps)
        + f"\nSELECT state, round(h, 6) AS p_hit3 FROM h{k} ORDER BY 1"
    )


@_q(
    "q83_absorbing_funnel",
    _funnel_oracle(),
    note="absorbing-state hitting probability: P(reach 'purchase' "
    "within 3 steps | current state), by iterating h <- P*h with the "
    "target absorbing mid-path — q82's estimated Markov chain put to "
    "work as a funnel simulator.  The 5x5 transition matrix "
    "broadcasts; each iteration is one join + one 5-row sum, so k "
    "steps cost k broadcast joins regardless of data size.  "
    "Probabilities stay UNROUNDED exact-ratio doubles through the "
    "iterations, rounded once at the edge",
)
def q83(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    w = Window.partitionBy("user_id").orderBy("ts")
    s = ev.select("event_type", F.lag("event_type").over(w).alias("prev")).filter(
        F.col("prev").isNotNull()
    )
    c = s.groupBy("prev", F.col("event_type").alias("curr")).agg(
        F.count(F.lit(1)).alias("n")
    )
    t = c.groupBy("prev").agg(F.sum("n").alias("tot"))
    pm = c.join(t, "prev").select(
        "prev", "curr", (F.col("n") / F.col("tot")).alias("pr")
    ).localCheckpoint(eager=True)
    h = t.select(F.col("prev").alias("state"), F.lit(0.0).alias("h"))
    for _ in range(3):
        hj = F.broadcast(h.select(F.col("state").alias("hs"), F.col("h").alias("hv")))
        h = (
            pm.join(hj, (F.col("curr") == F.col("hs")) & (F.col("curr") != "purchase"), "left")
            .groupBy(F.col("prev").alias("state"))
            .agg(
                F.sum(
                    F.when(F.col("curr") == "purchase", F.col("pr")).otherwise(
                        F.col("pr") * F.coalesce(F.col("hv"), F.lit(0.0))
                    )
                ).alias("h")
            )
        )
    return h.select("state", F.round("h", 6).alias("p_hit3")).orderBy("state")


@_q(
    "q84_sequence_flows",
    """WITH s AS (SELECT user_id, event_type AS curr,
         lag(event_type) OVER w AS p1, lag(event_type, 2) OVER w AS p2
       FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts))
       SELECT p2, p1, curr, count(*) AS n FROM s WHERE p2 IS NOT NULL
       GROUP BY 1, 2, 3 ORDER BY 4 DESC, 1, 2, 3 LIMIT 25""",
    note="three-step behavioral flows (the Sankey-diagram feed): "
    "per-user event trigrams via two stacked lags in ONE window pass "
    "— no self-joins on position — then a combinable count.  "
    "Extends q82's first-order transitions to second-order context; "
    "top flows with a full tie-break",
)
def q84(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    w = Window.partitionBy("user_id").orderBy("ts")
    s = ev.select(
        F.col("event_type").alias("curr"),
        F.lag("event_type").over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    ).filter(F.col("p2").isNotNull())
    return (
        s.groupBy("p2", "p1", "curr")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "p2", "p1", "curr")
        .limit(25)
    )


@_q(
    "t40_seasonal_index",
    """WITH d AS (SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
         CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT) AS rc
       FROM orders GROUP BY 1),
       x AS (SELECT (CAST(d - DATE '1970-01-01' AS BIGINT) + 3) % 7 AS dow,
             rc FROM d),
       t AS (SELECT CAST(sum(rc) AS BIGINT) AS tot, count(*) AS nd FROM x),
       g AS (SELECT dow, CAST(sum(rc) AS BIGINT) AS s, count(*) AS n
             FROM x GROUP BY 1)
       SELECT CAST(dow AS INT) AS dow, n,
         round((CAST(s AS DOUBLE) / n) / (CAST(t.tot AS DOUBLE) / t.nd), 4)
           AS idx
       FROM g CROSS JOIN t ORDER BY 1""",
    note="day-of-week seasonal index (mean daily revenue per weekday / "
    "overall mean; 0=Monday via the t37 epoch-day formula, immune to "
    "engine week-start disagreement) — the multiplicative "
    "decomposition factor a deseasonalizer divides by.  All moments "
    "are exact integer sums; one double division per output row",
)
def t40(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    d = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.floor(F.sum("o_totalprice") * 100 + 0.5).cast("long").alias("rc")
    )
    x = d.select(
        (
            (F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")).cast("long") + 3)
            % 7
        ).alias("dow"),
        "rc",
    )
    t = x.agg(F.sum("rc").alias("tot"), F.count(F.lit(1)).alias("nd"))
    g = x.groupBy("dow").agg(F.sum("rc").alias("s"), F.count(F.lit(1)).alias("n"))
    return (
        g.crossJoin(F.broadcast(t))
        .select(
            F.col("dow").cast("int").alias("dow"),
            "n",
            F.round(
                (F.col("s").cast("double") / F.col("n"))
                / (F.col("tot").cast("double") / F.col("nd")),
                4,
            ).alias("idx"),
        )
        .orderBy("dow")
    )


@_q(
    "q85_attribution",
    """WITH a AS (SELECT event_type, value,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
       FROM events)
       SELECT channel, count(*) AS n_purchases,
         round(sum(value), 2) AS attributed_value
       FROM a WHERE event_type = 'purchase' AND channel IS NOT NULL
       GROUP BY 1 ORDER BY 1""",
    note="last-touch marketing attribution: each purchase credits the "
    "most recent PRIOR non-purchase event of the same user, via one "
    "ignore-nulls last() over a rows-preceding frame — no self-join "
    "on inequality, no per-user collect.  Single shuffle on user_id "
    "(the window partition) then a combinable groupBy; ties at equal "
    "ts are broken by event_id so both engines pick the same touch",
)
def q85(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.select("event_type", "value", ch.alias("channel"))
        .filter((F.col("event_type") == "purchase") & F.col("channel").isNotNull())
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("attributed_value"),
        )
        .orderBy("channel")
    )


@_q(
    "t41_sax",
    """WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS rc
       FROM events GROUP BY 1),
       m AS (SELECT count(*) AS n, CAST(sum(rc) AS BIGINT) AS s,
             CAST(sum(rc * rc) AS BIGINT) AS ss FROM d),
       z AS (SELECT d, rc,
         (rc - CAST(s AS DOUBLE) / n)
           / sqrt((ss - CAST(s AS DOUBLE) * s / n) / n) AS z
       FROM d CROSS JOIN m)
       SELECT strftime(d, '%Y-%m-%d') AS d, rc, round(z, 4) AS z,
         CASE WHEN z < -0.6745 THEN 'a' WHEN z < 0 THEN 'b'
              WHEN z < 0.6745 THEN 'c' ELSE 'd' END AS sym
       FROM z ORDER BY 1""",
    note="SAX symbolization of the daily revenue series: z-normalize "
    "against global mean/std, then map to a 4-letter alphabet at the "
    "N(0,1) quartile breakpoints (±0.6745, 0) — the discretization "
    "behind symbolic motif/anomaly mining.  Moments come from exact "
    "integer cent sums (sum, sum-of-squares), so both engines feed "
    "bit-identical inputs into one double expression per row; the "
    "two-scalar moment row broadcasts",
)
def t41(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    d = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.floor(F.sum("value") * 100 + 0.5).cast("long").alias("rc")
    )
    m = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rc").alias("s"),
        F.sum(F.col("rc") * F.col("rc")).alias("ss"),
    )
    z = F.col("rc") - F.col("s").cast("double") / F.col("n")
    var = (F.col("ss") - F.col("s").cast("double") * F.col("s") / F.col("n")) / F.col("n")
    zc = z / F.sqrt(var)
    return (
        d.crossJoin(F.broadcast(m))
        .select(
            date_str(F.col("d")).alias("d"),
            "rc",
            F.round(zc, 4).alias("z"),
            F.when(zc < -0.6745, "a")
            .when(zc < 0, "b")
            .when(zc < 0.6745, "c")
            .otherwise("d")
            .alias("sym"),
        )
        .orderBy("d")
    )


@_q(
    "t42_rolling_mad",
    """WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS rc
       FROM events GROUP BY 1),
       w AS (SELECT d, rc, list_sort(list(rc) OVER
               (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
             FROM d),
       m AS (SELECT d, rc, arr,
               arr[CAST((len(arr) + 1) // 2 AS INT)] AS med FROM w),
       s AS (SELECT d, rc, med,
               list_sort(list_transform(arr, a -> abs(a - med))) AS dev
             FROM m)
       SELECT strftime(d, '%Y-%m-%d') AS day, rc, med,
         dev[CAST((len(dev) + 1) // 2 AS INT)] AS mad,
         CAST(abs(rc - med) > 3 * dev[CAST((len(dev) + 1) // 2 AS INT)]
              AND dev[CAST((len(dev) + 1) // 2 AS INT)] > 0 AS BOOLEAN)
           AS is_anomaly
       FROM s ORDER BY 1""",
    note="rolling median-absolute-deviation anomaly flags on daily "
    "revenue cents: 7-row frame, LOWER median and LOWER-median MAD "
    "(both exact BIGINT picks, zero float hazard), flag when "
    "|x - med| > 3*MAD — the robust outlier detector that a mean/ "
    "stddev z-score (t32) gets wrong under the very outliers it "
    "hunts.  Frame is over the pre-aggregated daily series (~days "
    "rows after a single groupBy shuffle), never the raw facts",
)
def t42(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.floor(F.sum("value") * 100 + 0.5).cast("long").alias("rc")
    )
    w = Window.orderBy("d").rowsBetween(-6, 0)
    m = daily.withColumn("arr", F.array_sort(F.collect_list("rc").over(w))).withColumn(
        "med", F.element_at("arr", ((F.size("arr") + 1) / 2).cast("int"))
    )
    s = m.withColumn(
        "dev", F.array_sort(F.expr("transform(arr, a -> abs(a - med))"))
    ).withColumn("mad", F.element_at("dev", ((F.size("dev") + 1) / 2).cast("int")))
    return (
        s.select(
            date_str(F.col("d")).alias("day"),
            "rc",
            "med",
            "mad",
            (
                (F.abs(F.col("rc") - F.col("med")) > 3 * F.col("mad"))
                & (F.col("mad") > 0)
            ).alias("is_anomaly"),
        )
        .orderBy("day")
    )


@_q(
    "t43_acf",
    """WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS x
       FROM events GROUP BY 1),
       s AS (SELECT row_number() OVER (ORDER BY d) AS i, x FROM d),
       g AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS s1,
             CAST(sum(x * x) AS BIGINT) AS q FROM s),
       k AS (SELECT i AS lag FROM generate_series(1, 7) t(i)),
       p AS (SELECT k.lag AS lag, CAST(sum(a.x * b.x) AS BIGINT) AS ak,
             CAST(sum(a.x) AS BIGINT) AS bk, CAST(sum(b.x) AS BIGINT) AS ck,
             count(*) AS m
         FROM k JOIN s a ON a.i > k.lag JOIN s b ON b.i = a.i - k.lag
         GROUP BY 1)
       SELECT CAST(lag AS INT) AS lag, m,
         round((ak - CAST(s1 AS DOUBLE) * (bk + ck) / n
             + CAST(m AS DOUBLE) * s1 * s1 / (CAST(n AS DOUBLE) * n))
           / (q - CAST(s1 AS DOUBLE) * s1 / n), 4) AS acf
       FROM p CROSS JOIN g ORDER BY 1""",
    note="autocorrelation function of daily revenue at lags 1..7 — the "
    "seasonality diagnostic that tells a forecaster (t34/t40) which "
    "period to model.  Every moment (lag products, marginal sums, "
    "sum-of-squares) is an exact BIGINT over integer cents; the mean-"
    "centering algebra runs ONCE per lag in doubles with a textually "
    "identical expression in both engines, so no accumulation-order "
    "noise.  The lagged join is index-aligned on the tiny pre-"
    "aggregated daily series, never the raw facts",
)
def t43(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.floor(F.sum("value") * 100 + 0.5).cast("long").alias("x")
    )
    s = daily.select(F.row_number().over(Window.orderBy("d")).alias("i"), "x")
    g = s.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("q"),
    )
    ks = spark.range(1, 8).select(F.col("id").alias("lag"))
    a = s.select(F.col("i").alias("ai"), F.col("x").alias("ax"))
    b = s.select(F.col("i").alias("bi"), F.col("x").alias("bx"))
    p = (
        ks.join(a, F.col("ai") > F.col("lag"))
        .join(b, F.col("bi") == F.col("ai") - F.col("lag"))
        .groupBy("lag")
        .agg(
            F.sum(F.col("ax") * F.col("bx")).alias("ak"),
            F.sum("ax").alias("bk"),
            F.sum("bx").alias("ck"),
            F.count(F.lit(1)).alias("m"),
        )
    )
    num = (
        F.col("ak")
        - F.col("s1").cast("double") * (F.col("bk") + F.col("ck")) / F.col("n")
        + F.col("m").cast("double")
        * F.col("s1")
        * F.col("s1")
        / (F.col("n").cast("double") * F.col("n"))
    )
    den = F.col("q") - F.col("s1").cast("double") * F.col("s1") / F.col("n")
    return (
        p.crossJoin(F.broadcast(g))
        .select(
            F.col("lag").cast("int").alias("lag"),
            "m",
            F.round(num / den, 4).alias("acf"),
        )
        .orderBy("lag")
    )


@_q(
    "t44_downsample_ltob",
    """WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS x
       FROM events GROUP BY 1),
       s AS (SELECT CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i,
             d, x FROM d),
       nn AS (SELECT count(*) AS n FROM s),
       ar AS (SELECT i, d, x,
         abs((i - lag(i) OVER w) * (lead(x) OVER w - lag(x) OVER w)
           - (lead(i) OVER w - lag(i) OVER w) * (x - lag(x) OVER w)) AS area
         FROM s WINDOW w AS (ORDER BY i)),
       sel AS (SELECT i, d, x, area, row_number() OVER
           (PARTITION BY (i - 1) // 5 ORDER BY area DESC, i) AS rn
         FROM ar WHERE area IS NOT NULL)
       SELECT i, strftime(d, '%Y-%m-%d') AS day, x, area
       FROM sel WHERE rn = 1
       UNION ALL
       SELECT i, strftime(d, '%Y-%m-%d') AS day, x, CAST(NULL AS BIGINT)
       FROM ar CROSS JOIN nn WHERE i = 1 OR i = nn.n
       ORDER BY 1""",
    note="largest-triangle-one-bucket downsampling of the daily series "
    "(5-day buckets): keep the point with max effective triangle area "
    "against its immediate neighbors, plus both endpoints — the "
    "shape-preserving decimation a 100TB dashboard renders instead of "
    "raw points.  Areas are exact BIGINT cross products of (day-index, "
    "cent) integer coordinates, so the per-bucket argmax is bit-stable; "
    "one window pass + one bounded per-bucket rank, all on the pre-"
    "aggregated daily table",
)
def t44(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.floor(F.sum("value") * 100 + 0.5).cast("long").alias("x")
    )
    s = daily.select(
        F.row_number().over(Window.orderBy("d")).cast("long").alias("i"), "d", "x"
    )
    w = Window.orderBy("i")
    area = F.abs(
        (F.col("i") - F.lag("i").over(w))
        * (F.lead("x").over(w) - F.lag("x").over(w))
        - (F.lead("i").over(w) - F.lag("i").over(w))
        * (F.col("x") - F.lag("x").over(w))
    )
    ar = s.withColumn("area", area)
    sel = (
        ar.filter(F.col("area").isNotNull())
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(F.expr("(i - 1) DIV 5")).orderBy(
                    F.desc("area"), "i"
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("i", date_str(F.col("d")).alias("day"), "x", "area")
    )
    nn = ar.agg(F.count(F.lit(1)).alias("n"))
    ends = (
        ar.crossJoin(F.broadcast(nn))
        .filter((F.col("i") == 1) | (F.col("i") == F.col("n")))
        .select(
            "i",
            date_str(F.col("d")).alias("day"),
            "x",
            F.lit(None).cast("long").alias("area"),
        )
    )
    return sel.unionAll(ends).orderBy("i")


_SKEW_ORACLE_TMPL = """k_{tag} AS (SELECT {key} AS k, count(*) AS c
    FROM {table} GROUP BY 1),
  r_{tag} AS (SELECT c, row_number() OVER (ORDER BY c, k) AS r FROM k_{tag}),
  s_{tag} AS (SELECT count(*) AS n, CAST(sum(c) AS BIGINT) AS t,
    CAST(max(c) AS BIGINT) AS mx, CAST(sum(r * c) AS BIGINT) AS rc,
    CAST(sum(c * c) AS BIGINT) AS cc FROM r_{tag}),
  o_{tag} AS (SELECT '{table}.{key}' AS key_name, n AS n_keys,
    t AS total_rows, mx AS max_rows,
    round(CAST(mx AS DOUBLE) / t, 4) AS top1_share,
    round((2 * CAST(rc AS DOUBLE) - (n + 1) * t) / (CAST(n AS DOUBLE) * t), 4)
      AS gini,
    round(sqrt(CAST(n AS DOUBLE) * cc - CAST(t AS DOUBLE) * t) / t, 4) AS cv
    FROM s_{tag})"""


@_q(
    "q87_skew_audit",
    "WITH "
    + ",\n  ".join(
        _SKEW_ORACLE_TMPL.format(tag=tag, table=table, key=key)
        for tag, table, key in (
            ("a", "lineitem", "l_suppkey"),
            ("b", "lineitem", "l_orderkey"),
            ("c", "orders", "o_custkey"),
        )
    )
    + """
  SELECT * FROM o_a UNION ALL SELECT * FROM o_b UNION ALL
  SELECT * FROM o_c ORDER BY 1""",
    note="pre-shuffle skew audit of the three hottest join/groupBy keys: "
    "per-key cardinality, heaviest-key share, Gini coefficient and "
    "coefficient of variation — the numbers that decide between a "
    "plain shuffle, AQE skew-join, or salting BEFORE a 100TB job "
    "launches.  All moments (rank-weighted sums, sums of squares) are "
    "exact BIGINTs from one groupBy + one sort-rank per key; doubles "
    "appear once per audit row.  Cheap relative to the joins it "
    "de-risks: each audit is a single aggregation of the fact table",
)
def q87(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import skew_audit

    c = Catalog(spark, sf_dir)
    li = c.table("lineitem")
    return (
        skew_audit(li, "l_suppkey", "lineitem.l_suppkey")
        .unionAll(skew_audit(li, "l_orderkey", "lineitem.l_orderkey"))
        .unionAll(skew_audit(c.table("orders"), "o_custkey", "orders.o_custkey"))
        .orderBy("key_name")
    )


@_q(
    "t45_concurrency",
    """WITH g AS (SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS flag
       FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       s AS (SELECT user_id, ts,
         sum(flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS sid
       FROM g),
       iv AS (SELECT user_id, sid, epoch_us(min(ts)) AS st,
              epoch_us(max(ts)) AS en FROM s GROUP BY 1, 2),
       pts AS (SELECT st AS t, 1 AS delta FROM iv
         UNION ALL SELECT en, -1 FROM iv),
       runs AS (SELECT t, delta, CAST(sum(delta) OVER
           (ORDER BY t, delta DESC ROWS UNBOUNDED PRECEDING) AS INT) AS conc,
         lead(t) OVER (ORDER BY t, delta DESC) AS nxt FROM pts)
       SELECT conc AS concurrency, count(*) AS n_points,
         CAST(sum(coalesce(nxt - t, 0)) AS BIGINT) AS total_us
       FROM runs GROUP BY 1 ORDER BY 1""",
    note="interval sweep-line: max/histogram of CONCURRENT user "
    "sessions over time — sessions (t03 gap rule) become +1/-1 "
    "boundary events, one global running sum gives the concurrency "
    "level, lead() gives each level's dwell time.  Starts sort before "
    "ends at the same instant (delta descending) so point sessions "
    "never dip the count negative, and everything after the session "
    "groupBy is integer microseconds — no float, no timezone.  The "
    "global ORDER BY t is the one single-partition stage; at scale "
    "it runs on boundary points (2 per session), ~1e-4 of raw rows",
)
def t45(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    from ..operators.relational import sweep_concurrency

    sess = sessionize(ev, "user_id", "ts", 1800, tiebreak=["event_id"])
    iv = sess.groupBy("user_id", "session_id").agg(
        F.unix_micros(F.min("ts")).alias("st"),
        F.unix_micros(F.max("ts")).alias("en"),
    )
    runs = sweep_concurrency(iv, "st", "en")
    return (
        runs.groupBy(F.col("conc").alias("concurrency"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum(F.coalesce(F.col("nxt") - F.col("t"), F.lit(0))).alias("total_us"),
        )
        .orderBy("concurrency")
    )


@_q(
    "q88_write_layout_plan",
    """WITH s AS (SELECT lang, count(*) AS n_docs,
         CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
       FROM documents GROUP BY 1)
       SELECT lang, n_docs, total_bytes,
         CAST((total_bytes + 1048575) // 1048576 AS BIGINT) AS n_files,
         CAST((n_docs + ((total_bytes + 1048575) // 1048576) - 1)
           // ((total_bytes + 1048575) // 1048576) AS BIGINT)
           AS rows_per_file
       FROM s ORDER BY 1""",
    note="partitioned-write layout planner: per output partition "
    "(lang), exact byte budget -> target file count at a 1 MiB unit "
    "(stand-in for the 128 MiB production target) and rows-per-file — "
    "the repartitionByRange/maxRecordsPerFile inputs that keep a "
    "100TB write from emitting either 10M tiny files or 10 "
    "unsplittable ones.  Pure integer ceil-division on one "
    "aggregation pass; pairs with sources/writers.py which consumes "
    "exactly these numbers",
)
def q88(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    s = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.octet_length(F.encode(F.col("text"), "utf-8")).cast("long")).alias(
            "total_bytes"
        ),
    )
    n_files = F.floor((F.col("total_bytes") + 1048575) / 1048576).cast("long")
    return s.select(
        "lang",
        "n_docs",
        "total_bytes",
        n_files.alias("n_files"),
        F.floor((F.col("n_docs") + n_files - 1) / n_files).cast("long").alias(
            "rows_per_file"
        ),
    ).orderBy("lang")


@_q(
    "t46_funnel_latency",
    """WITH su AS (SELECT user_id, min(ts) AS sts FROM events
         WHERE event_type = 'signup' GROUP BY 1),
       pu AS (SELECT s.user_id,
              epoch_us(min(e.ts)) - epoch_us(s.sts) AS lat
         FROM su s JOIN events e ON e.user_id = s.user_id
           AND e.event_type = 'purchase' AND e.ts >= s.sts
         GROUP BY s.user_id, s.sts),
       r AS (SELECT lat, row_number() OVER (ORDER BY lat) AS rn,
             count(*) OVER () AS n FROM pu)
       SELECT (SELECT count(*) FROM su) AS n_signed,
         max(n) AS n_converted,
         round(CAST(max(n) AS DOUBLE) / (SELECT count(*) FROM su), 4)
           AS conv_rate,
         CAST(max(CASE WHEN rn = (n + 3) // 4 THEN lat END) AS BIGINT)
           AS p25_us,
         CAST(max(CASE WHEN rn = (n + 1) // 2 THEN lat END) AS BIGINT)
           AS p50_us,
         CAST(max(CASE WHEN rn = (3 * n + 3) // 4 THEN lat END) AS BIGINT)
           AS p75_us
       FROM r""",
    note="signup->purchase funnel latency: per user, first signup to "
    "first subsequent purchase, with conversion rate and EXACT "
    "element quartiles of the latency distribution (lower-element "
    "picks at ceil(q*n) — integer microseconds, no interpolation, no "
    "approx-percentile nondeterminism).  One semi-join-shaped "
    "aggregation per funnel stage on the user key; the quartile rank "
    "runs over the (converted-users-sized) latency table only",
)
def t46(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    su = ev.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts").alias("sts")
    )
    pu = (
        su.join(
            ev.filter(F.col("event_type") == "purchase").select(
                F.col("user_id").alias("pu_id"), F.col("ts").alias("pts")
            ),
            (F.col("user_id") == F.col("pu_id")) & (F.col("pts") >= F.col("sts")),
        )
        .groupBy("user_id", "sts")
        .agg((F.unix_micros(F.min("pts")) - F.unix_micros(F.col("sts"))).alias("lat"))
    )
    r = pu.select(
        "lat",
        F.row_number().over(Window.orderBy("lat")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    ns = su.agg(F.count(F.lit(1)).alias("n_signed"))
    pick = lambda expr: F.max(F.when(F.col("rn") == expr, F.col("lat"))).cast("long")
    stats = r.agg(
        F.max("n").alias("n_converted"),
        pick(F.floor((F.col("n") + 3) / 4)).alias("p25_us"),
        pick(F.floor((F.col("n") + 1) / 2)).alias("p50_us"),
        pick(F.floor((3 * F.col("n") + 3) / 4)).alias("p75_us"),
    )
    return stats.crossJoin(F.broadcast(ns)).select(
        "n_signed",
        "n_converted",
        F.round(F.col("n_converted").cast("double") / F.col("n_signed"), 4).alias(
            "conv_rate"
        ),
        "p25_us",
        "p50_us",
        "p75_us",
    )


@_q(
    "q89_state_diff",
    """WITH s1 AS (SELECT user_id, arg_max(event_type, ts) AS et,
         CAST(floor(arg_max(value, ts) * 100 + 0.5) AS BIGINT) AS vc
       FROM events WHERE ts < TIMESTAMP '2024-01-15' GROUP BY 1),
       s2 AS (SELECT user_id, arg_max(event_type, ts) AS et,
         CAST(floor(arg_max(value, ts) * 100 + 0.5) AS BIGINT) AS vc
       FROM events WHERE ts < TIMESTAMP '2024-01-30' GROUP BY 1),
       d AS (SELECT s2.user_id,
         CASE WHEN s1.user_id IS NULL THEN 'added'
              WHEN s1.et <> s2.et OR s1.vc <> s2.vc THEN 'changed'
              ELSE 'unchanged' END AS change_type
       FROM s2 LEFT JOIN s1 ON s1.user_id = s2.user_id)
       SELECT change_type, count(*) AS n FROM d GROUP BY 1 ORDER BY 1""",
    note="snapshot reconciliation diff: the s13 latest-state view "
    "materialized at two points in time, outer-joined on the key and "
    "classified added/changed/unchanged — the audit a CDC pipeline "
    "runs to prove an incremental view equals a fresh backfill.  Both "
    "snapshots come from ONE pass shape (arg_max aggregates with a "
    "pushed-down ts filter); the diff join is keyed on user_id, so at "
    "scale it co-partitions with the state views it compares",
)
def q89(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")

    def state(cutoff: str) -> DataFrame:
        return (
            ev.filter(F.col("ts") < F.lit(cutoff).cast("timestamp"))
            .groupBy("user_id")
            .agg(
                F.max_by("event_type", "ts").alias("et"),
                F.floor(F.max_by("value", "ts") * 100 + 0.5).cast("long").alias("vc"),
            )
        )

    s1 = state("2024-01-15").select(
        F.col("user_id").alias("u1"), F.col("et").alias("et1"), F.col("vc").alias("vc1")
    )
    s2 = state("2024-01-30")
    d = s2.join(s1, s2.user_id == s1.u1, "left").select(
        F.when(F.col("u1").isNull(), "added")
        .when(
            (F.col("et1") != F.col("et")) | (F.col("vc1") != F.col("vc")), "changed"
        )
        .otherwise("unchanged")
        .alias("change_type")
    )
    return (
        d.groupBy("change_type").agg(F.count(F.lit(1)).alias("n")).orderBy("change_type")
    )


@_q(
    "t47_seasonal_decompose",
    """WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS rc
       FROM events GROUP BY 1),
       s AS (SELECT d, rc,
         CAST(sum(rc) OVER w AS BIGINT) AS t7, count(*) OVER w AS c7,
         (CAST(d - DATE '1970-01-01' AS BIGINT) + 3) % 7 AS dow
       FROM d WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
       det AS (SELECT d, rc, t7, dow, 7 * rc - t7 AS ds FROM s WHERE c7 = 7),
       se AS (SELECT dow, CAST(sum(ds) AS BIGINT) AS sds, count(*) AS n
              FROM det GROUP BY 1)
       SELECT strftime(det.d, '%Y-%m-%d') AS day, rc,
         round(CAST(t7 AS DOUBLE) / 7, 2) AS trend,
         round(CAST(sds AS DOUBLE) / (7 * n), 2) AS seasonal,
         round(CAST(ds AS DOUBLE) / 7 - CAST(sds AS DOUBLE) / (7 * n), 2)
           AS residual
       FROM det JOIN se ON se.dow = det.dow ORDER BY 1""",
    note="additive seasonal decomposition (trend + day-of-week "
    "seasonal + residual) of daily revenue: centered 7-day moving "
    "trend, per-weekday seasonal component, residual — the classical "
    "decomposition with a determinism twist: the detrended series is "
    "kept as the EXACT integer 7*x - sum7 (no double accumulates "
    "across rows), so the per-dow averages and residuals are single "
    "double expressions over exact moments in both engines.  Edge "
    "days without a full window are excluded (c7 = 7), matching the "
    "textbook centered-MA definition",
)
def t47(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    d = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.floor(F.sum("value") * 100 + 0.5).cast("long").alias("rc")
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    s = d.select(
        "d",
        "rc",
        F.sum("rc").over(w).alias("t7"),
        F.count(F.lit(1)).over(w).alias("c7"),
        (
            (F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")).cast("long") + 3)
            % 7
        ).alias("dow"),
    )
    det = s.filter(F.col("c7") == 7).select(
        "d", "rc", "t7", "dow", (7 * F.col("rc") - F.col("t7")).alias("ds")
    )
    se = det.groupBy("dow").agg(
        F.sum("ds").alias("sds"), F.count(F.lit(1)).alias("n")
    )
    seas = F.col("sds").cast("double") / (7 * F.col("n"))
    return (
        det.join(F.broadcast(se), "dow")
        .select(
            date_str(F.col("d")).alias("day"),
            "rc",
            F.round(F.col("t7").cast("double") / 7, 2).alias("trend"),
            F.round(seas, 2).alias("seasonal"),
            F.round(F.col("ds").cast("double") / 7 - seas, 2).alias("residual"),
        )
        .orderBy("day")
    )


@_q(
    "t48_lateness_profile",
    """WITH a AS (SELECT event_id, epoch_us(ts) AS us,
         max(epoch_us(ts)) OVER (ORDER BY event_id
           ROWS UNBOUNDED PRECEDING) AS mx
       FROM events),
       l AS (SELECT CASE
           WHEN mx - us = 0 THEN 'a_on_time'
           WHEN mx - us <= 60000000 THEN 'b_le_1m'
           WHEN mx - us <= 600000000 THEN 'c_le_10m'
           WHEN mx - us <= 3600000000 THEN 'd_le_1h'
           ELSE 'e_gt_1h' END AS bucket,
         mx - us AS late_us FROM a)
       SELECT bucket, count(*) AS n,
         CAST(max(late_us) AS BIGINT) AS max_late_us
       FROM l GROUP BY 1 ORDER BY 1""",
    note="event-lateness profile: per event, how far behind the "
    "maximum event-time seen so far it arrived (event_id = arrival "
    "order), bucketed into the out-of-orderness histogram that "
    "PICKS THE WATERMARK for s04 — set the delay at the bucket "
    "covering your loss tolerance instead of guessing.  Integer "
    "microsecond arithmetic end-to-end.  Locally one running-max "
    "window; at scale arrival order exists per source partition, so "
    "the same profile runs per Kafka-partition and the histograms "
    "merge by addition",
)
def t48(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    us = F.unix_micros(F.col("ts"))
    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, 0)
    a = ev.select(us.alias("us"), F.max(us).over(w).alias("mx"))
    late = (F.col("mx") - F.col("us")).alias("late_us")
    l = a.select(
        F.when(F.col("mx") - F.col("us") == 0, "a_on_time")
        .when(F.col("mx") - F.col("us") <= 60_000_000, "b_le_1m")
        .when(F.col("mx") - F.col("us") <= 600_000_000, "c_le_10m")
        .when(F.col("mx") - F.col("us") <= 3_600_000_000, "d_le_1h")
        .otherwise("e_gt_1h")
        .alias("bucket"),
        late,
    )
    return (
        l.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.max("late_us").alias("max_late_us"))
        .orderBy("bucket")
    )


@_q(
    "q90_rank_changers",
    """WITH r1 AS (SELECT o_custkey,
         CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT) AS rev
       FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01' GROUP BY 1),
       r2 AS (SELECT o_custkey,
         CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT) AS rev
       FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01' GROUP BY 1),
       k1 AS (SELECT o_custkey, rev,
         CAST(row_number() OVER (ORDER BY rev DESC, o_custkey) AS BIGINT)
           AS rk FROM r1),
       k2 AS (SELECT o_custkey, rev,
         CAST(row_number() OVER (ORDER BY rev DESC, o_custkey) AS BIGINT)
           AS rk FROM r2)
       SELECT k1.o_custkey AS custkey, k1.rk AS rank_early,
         k2.rk AS rank_late, k1.rk - k2.rk AS rank_delta
       FROM k1 JOIN k2 ON k2.o_custkey = k1.o_custkey
       ORDER BY abs(k1.rk - k2.rk) DESC, 1 LIMIT 20""",
    note="leaderboard movement: customer revenue ranks in two periods, "
    "top movers by absolute rank change — the trend-detection read "
    "behind 'rising accounts'.  Revenue is exact integer cents so "
    "ranks are bit-stable; the two period aggregates share one scan "
    "shape with the date predicate pushed to parquet, and the rank "
    "join is keyed on the customer.  The global ranks are the one "
    "sort each — at scale rank within coarse revenue bands first "
    "(band by magnitude, rank within band) to avoid a single-"
    "partition sort",
)
def q90(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")

    def ranked(pred) -> DataFrame:
        return (
            o.filter(pred)
            .groupBy("o_custkey")
            .agg(F.floor(F.sum("o_totalprice") * 100 + 0.5).cast("long").alias("rev"))
            .select(
                "o_custkey",
                F.row_number()
                .over(Window.orderBy(F.desc("rev"), "o_custkey"))
                .cast("long")
                .alias("rk"),
            )
        )

    cut = F.lit("1998-01-01").cast("timestamp")
    k1 = ranked(F.col("o_orderdate") < cut).withColumnsRenamed(
        {"o_custkey": "custkey", "rk": "rank_early"}
    )
    k2 = ranked(F.col("o_orderdate") >= cut).withColumnsRenamed(
        {"o_custkey": "ck2", "rk": "rank_late"}
    )
    return (
        k1.join(k2, F.col("custkey") == F.col("ck2"))
        .select(
            "custkey",
            "rank_early",
            "rank_late",
            (F.col("rank_early") - F.col("rank_late")).alias("rank_delta"),
        )
        .orderBy(F.abs(F.col("rank_delta")).desc(), "custkey")
        .limit(20)
    )


@_q(
    "q91_psi_drift",
    """WITH p1 AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c,
         o_orderkey FROM orders
       WHERE o_orderdate < TIMESTAMP '1998-01-01'),
       t1 AS (SELECT c, CAST(ntile(10) OVER (ORDER BY c, o_orderkey) AS INT)
              AS bin FROM p1),
       edges AS (SELECT bin, CAST(max(c) AS BIGINT) AS edge FROM t1
                 WHERE bin < 10 GROUP BY 1),
       n1 AS (SELECT bin, count(*) AS n1 FROM t1 GROUP BY 1),
       p2 AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c,
         o_orderkey FROM orders
       WHERE o_orderdate >= TIMESTAMP '1998-01-01'),
       b2 AS (SELECT p2.o_orderkey,
         CAST(1 + sum(CASE WHEN e.edge < p2.c THEN 1 ELSE 0 END) AS INT)
           AS bin FROM p2 CROSS JOIN edges e GROUP BY 1),
       n2 AS (SELECT bin, count(*) AS n2 FROM b2 GROUP BY 1),
       tot AS (SELECT (SELECT count(*) FROM p1) AS t1c,
               (SELECT count(*) FROM p2) AS t2c)
       SELECT n1.bin, n1.n1, coalesce(n2.n2, 0) AS n2,
         round((CAST(2 * coalesce(n2.n2, 0) + 1 AS DOUBLE) / (2 * (t2c + 5))
              - CAST(2 * n1.n1 + 1 AS DOUBLE) / (2 * (t1c + 5)))
           * ln((CAST(2 * coalesce(n2.n2, 0) + 1 AS DOUBLE) / (2 * (t2c + 5)))
              / (CAST(2 * n1.n1 + 1 AS DOUBLE) / (2 * (t1c + 5)))), 6)
           AS psi_term
       FROM n1 LEFT JOIN n2 ON n2.bin = n1.bin CROSS JOIN tot
       ORDER BY 1""",
    note="population stability index per decile: order-value "
    "distribution drift between two periods, binned by the FIRST "
    "period's exact decile edges (ntile over integer cents with a "
    "full tie-break) — the ML-monitoring drift metric.  Emitted "
    "per-bin rather than pre-summed so no cross-row double "
    "accumulation exists anywhere; each psi term is one double "
    "expression over exact integer counts with Laplace smoothing "
    "kept integral ((2n+1)/(2(T+5))).  The 9 bin edges broadcast "
    "onto the second period's scan",
)
def q91(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    cut = F.lit("1998-01-01").cast("timestamp")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    p1 = o.filter(F.col("o_orderdate") < cut).select(
        cents.alias("c"), "o_orderkey"
    )
    t1 = p1.select(
        "c",
        F.ntile(10).over(Window.orderBy("c", "o_orderkey")).cast("int").alias("bin"),
    )
    edges = (
        t1.filter(F.col("bin") < 10).groupBy("bin").agg(F.max("c").alias("edge"))
    )
    n1 = t1.groupBy("bin").agg(F.count(F.lit(1)).alias("n1"))
    p2 = o.filter(F.col("o_orderdate") >= cut).select(cents.alias("c"), "o_orderkey")
    b2 = (
        p2.crossJoin(F.broadcast(edges.select("edge")))
        .groupBy("o_orderkey")
        .agg(
            (1 + F.sum(F.when(F.col("edge") < F.col("c"), 1).otherwise(0)))
            .cast("int")
            .alias("bin")
        )
    )
    n2 = b2.groupBy("bin").agg(F.count(F.lit(1)).alias("n2"))
    tot = (
        p1.agg(F.count(F.lit(1)).alias("t1c"))
        .crossJoin(p2.agg(F.count(F.lit(1)).alias("t2c")))
    )
    r1 = (2 * F.col("n1") + 1).cast("double") / (2 * (F.col("t1c") + 5))
    r2 = (2 * F.coalesce(F.col("n2"), F.lit(0)) + 1).cast("double") / (
        2 * (F.col("t2c") + 5)
    )
    return (
        n1.join(n2, "bin", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n1",
            F.coalesce(F.col("n2"), F.lit(0)).alias("n2"),
            F.round((r2 - r1) * F.log(r2 / r1), 6).alias("psi_term"),
        )
        .orderBy("bin")
    )


@_q(
    "t49_order_inversions",
    """WITH a AS (SELECT user_id,
         CASE WHEN ts < lag(ts) OVER (PARTITION BY user_id ORDER BY event_id)
              THEN 1 ELSE 0 END AS inv
       FROM events),
       u AS (SELECT user_id, CAST(sum(inv) AS BIGINT) AS n_inv
             FROM a GROUP BY 1)
       SELECT n_inv, count(*) AS n_users FROM u GROUP BY 1 ORDER BY 1""",
    note="ingestion-order health: per user, count adjacent arrival "
    "pairs (event_id order) whose event-times run backwards, then "
    "histogram users by inversion count — zero inversions everywhere "
    "means arrival order == event order and the t48 lateness profile "
    "is trivially clean; a heavy tail says the watermark must absorb "
    "real disorder.  One windowed pass partitioned by user, integer "
    "flags all the way",
)
def t49(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    a = ev.select(
        "user_id",
        F.when(F.col("ts") < F.lag("ts").over(w), 1).otherwise(0).alias("inv"),
    )
    u = a.groupBy("user_id").agg(F.sum("inv").alias("n_inv"))
    return (
        u.groupBy("n_inv").agg(F.count(F.lit(1)).alias("n_users")).orderBy("n_inv")
    )


@_q(
    "t50_xmr_control",
    """WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS rc
       FROM events GROUP BY 1),
       mr AS (SELECT d, rc,
         abs(rc - lag(rc) OVER (ORDER BY d)) AS mrange FROM d),
       g AS (SELECT count(*) AS n, CAST(sum(rc) AS BIGINT) AS s,
             CAST(sum(mrange) AS BIGINT) AS sm,
             count(mrange) AS nm FROM mr)
       SELECT strftime(d, '%Y-%m-%d') AS day, rc,
         round(CAST(s AS DOUBLE) / n, 2) AS center,
         round(CAST(s AS DOUBLE) / n
           + 2.66 * (CAST(sm AS DOUBLE) / nm), 2) AS ucl,
         round(CAST(s AS DOUBLE) / n
           - 2.66 * (CAST(sm AS DOUBLE) / nm), 2) AS lcl,
         CAST(rc > CAST(s AS DOUBLE) / n + 2.66 * (CAST(sm AS DOUBLE) / nm)
           OR rc < CAST(s AS DOUBLE) / n - 2.66 * (CAST(sm AS DOUBLE) / nm)
           AS BOOLEAN) AS out_of_control
       FROM mr CROSS JOIN g ORDER BY 1""",
    note="XmR (individuals + moving range) control chart on daily "
    "revenue: center line, UCL/LCL at +-2.66 x mean moving range — "
    "the SPC method that detects special-cause variation where "
    "z-scores (t32) assume a distribution and MAD (t42) assumes a "
    "window.  Mean and mean-MR come from exact integer sums; limits "
    "are single double expressions per row against exact rc, so the "
    "flag never wobbles across engines.  The two scalars broadcast "
    "over the daily series",
)
def t50(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    d = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.floor(F.sum("value") * 100 + 0.5).cast("long").alias("rc")
    )
    mr = d.select(
        "d", "rc", F.abs(F.col("rc") - F.lag("rc").over(Window.orderBy("d"))).alias("mrange")
    )
    g = mr.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rc").alias("s"),
        F.sum("mrange").alias("sm"),
        F.count("mrange").alias("nm"),
    )
    center = F.col("s").cast("double") / F.col("n")
    span = 2.66 * (F.col("sm").cast("double") / F.col("nm"))
    return (
        mr.crossJoin(F.broadcast(g))
        .select(
            date_str(F.col("d")).alias("day"),
            "rc",
            F.round(center, 2).alias("center"),
            F.round(center + span, 2).alias("ucl"),
            F.round(center - span, 2).alias("lcl"),
            ((F.col("rc") > center + span) | (F.col("rc") < center - span)).alias(
                "out_of_control"
            ),
        )
        .orderBy("day")
    )


@_q(
    "q93_skyline",
    """WITH c AS (SELECT o_custkey,
         CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT) AS rev,
         count(*) AS cnt FROM orders GROUP BY 1),
       pr AS (SELECT rev, CAST(max(cnt) AS BIGINT) AS emax FROM c GROUP BY 1),
       mr AS (SELECT rev, emax, max(emax) OVER (ORDER BY rev DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m FROM pr)
       SELECT c.o_custkey AS custkey, c.rev, c.cnt AS n_orders
       FROM c JOIN mr ON mr.rev = c.rev
       WHERE NOT (coalesce(mr.m, -1) >= c.cnt OR mr.emax > c.cnt)
       ORDER BY c.rev DESC, c.o_custkey""",
    note="skyline (Pareto frontier) operator: customers not dominated "
    "on (revenue, order count) — the multi-criteria 'best' query "
    "relational engines lack as a primitive.  NOT the O(n^2) "
    "dominance anti-join: a point (r,c) is dominated iff the running "
    "max count over strictly-higher revenues reaches c, or its own "
    "revenue tier's max count exceeds c — two window passes over the "
    "aggregated per-customer table (integer cents, exact), linear "
    "after the one groupBy shuffle.  Tie-safe: equal (rev, cnt) "
    "points are mutually non-dominating and all survive",
)
def q93(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    c = o.groupBy("o_custkey").agg(
        F.floor(F.sum("o_totalprice") * 100 + 0.5).cast("long").alias("rev"),
        F.count(F.lit(1)).alias("cnt"),
    )
    pr = c.groupBy("rev").agg(F.max("cnt").alias("emax"))
    mr = pr.select(
        "rev",
        "emax",
        F.max("emax")
        .over(
            Window.orderBy(F.desc("rev")).rowsBetween(Window.unboundedPreceding, -1)
        )
        .alias("m"),
    )
    return (
        c.join(mr, "rev")
        .filter(
            ~(
                (F.coalesce(F.col("m"), F.lit(-1)) >= F.col("cnt"))
                | (F.col("emax") > F.col("cnt"))
            )
        )
        .select(F.col("o_custkey").alias("custkey"), "rev", F.col("cnt").alias("n_orders"))
        .orderBy(F.desc("rev"), "custkey")
    )


@_q(
    "t51_drawdown",
    """WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS rc
       FROM events GROUP BY 1),
       c AS (SELECT d, rc,
         CAST(sum(rc) OVER w AS BIGINT) AS cum FROM d
         WINDOW w AS (ORDER BY d ROWS UNBOUNDED PRECEDING)),
       p AS (SELECT d, rc, cum,
         CAST(max(cum) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS peak FROM c)
       SELECT strftime(d, '%Y-%m-%d') AS day, cum, peak,
         peak - cum AS drawdown
       FROM p ORDER BY 1""",
    note="drawdown series of cumulative daily revenue: running peak "
    "minus running total, the risk metric whose maximum is 'worst "
    "decline from a high'.  Two stacked prefix windows over the "
    "daily aggregate, exact integer cents end to end — the raw fact "
    "shuffle happens once in the shared daily groupBy, and the "
    "ordered windows run on ~days rows",
)
def t51(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    d = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.floor(F.sum("value") * 100 + 0.5).cast("long").alias("rc")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    p = d.select(
        "d", F.sum("rc").over(w).alias("cum")
    ).withColumn("peak", F.max("cum").over(w))
    return p.select(
        date_str(F.col("d")).alias("day"),
        "cum",
        "peak",
        (F.col("peak") - F.col("cum")).alias("drawdown"),
    ).orderBy("day")


@_q(
    "q94_pseudonym_audit",
    """WITH p AS (SELECT substring(md5(user_id::VARCHAR), 1, 2) AS pseudo,
         user_id FROM events),
       b AS (SELECT pseudo, count(DISTINCT user_id) AS users
             FROM p GROUP BY 1)
       SELECT users AS users_per_pseudo, count(*) AS n_pseudos
       FROM b GROUP BY 1 ORDER BY 1""",
    note="pseudonymization collision audit: deterministic md5-prefix "
    "tokenization of user ids (2 hex chars here to force collisions "
    "at fixture scale; production uses the full digest + salt) and "
    "the histogram of distinct real users per pseudonym — the "
    "k-anonymity / join-integrity trade-off read: buckets with "
    "users_per_pseudo > 1 break joins, buckets == 1 re-identify.  "
    "One groupBy on the token, one distinct-count, all integers",
)
def q94(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    p = ev.select(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 2).alias("pseudo"),
        "user_id",
    )
    b = p.groupBy("pseudo").agg(F.countDistinct("user_id").alias("users"))
    return (
        b.groupBy(F.col("users").alias("users_per_pseudo"))
        .agg(F.count(F.lit(1)).alias("n_pseudos"))
        .orderBy("users_per_pseudo")
    )


@_q(
    "q95_zorder_locality",
    """WITH mx AS (SELECT max(l_orderkey) AS mo, max(l_suppkey) AS ms
         FROM lineitem),
       q AS (SELECT
         CAST(least(3, (l_orderkey * 4) // (mo + 1)) AS BIGINT) AS qx,
         CAST(least(3, (l_suppkey * 4) // (ms + 1)) AS BIGINT) AS qy,
         l_orderkey, l_suppkey
         FROM lineitem CROSS JOIN mx),
       z AS (SELECT (qx % 2) + 2 * (qy % 2) + 4 * ((qx // 2) % 2)
           + 8 * ((qy // 2) % 2) AS zb, l_orderkey, l_suppkey FROM q)
       SELECT CAST(zb AS INT) AS z_bucket, count(*) AS n_rows,
         CAST(min(l_orderkey) AS BIGINT) AS min_ok,
         CAST(max(l_orderkey) AS BIGINT) AS max_ok,
         CAST(min(l_suppkey) AS BIGINT) AS min_sk,
         CAST(max(l_suppkey) AS BIGINT) AS max_sk
       FROM z GROUP BY 1 ORDER BY 1""",
    note="z-order locality audit: interleave 2 quantization bits of "
    "each of two keys into a 16-cell Morton code (pure integer "
    "arithmetic — (q%2) + 2*(q%2)... — no engine-specific bit ops) "
    "and report each cell's min-max envelope on BOTH dimensions: "
    "tight envelopes on both axes are exactly what makes file-level "
    "min-max pruning work for 2-key point/range queries, which a "
    "single-key sort gives on one axis only.  This is the audit for "
    "sources/writers.write_zordered's layout; one pass + two scalar "
    "maxima broadcast",
)
def q95(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    mx = li.agg(
        F.max("l_orderkey").alias("mo"), F.max("l_suppkey").alias("ms")
    )
    q = li.crossJoin(F.broadcast(mx)).select(
        F.least(F.lit(3), F.floor(F.col("l_orderkey") * 4 / (F.col("mo") + 1)))
        .cast("long")
        .alias("qx"),
        F.least(F.lit(3), F.floor(F.col("l_suppkey") * 4 / (F.col("ms") + 1)))
        .cast("long")
        .alias("qy"),
        "l_orderkey",
        "l_suppkey",
    )
    z = q.select(
        (
            (F.col("qx") % 2)
            + 2 * (F.col("qy") % 2)
            + 4 * (F.floor(F.col("qx") / 2) % 2)
            + 8 * (F.floor(F.col("qy") / 2) % 2)
        ).alias("zb"),
        "l_orderkey",
        "l_suppkey",
    )
    return (
        z.groupBy(F.col("zb").cast("int").alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_orderkey").alias("min_ok"),
            F.max("l_orderkey").alias("max_ok"),
            F.min("l_suppkey").alias("min_sk"),
            F.max("l_suppkey").alias("max_sk"),
        )
        .orderBy("z_bucket")
    )


@_q(
    "t53_monotone_runs",
    """WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS rc
       FROM events GROUP BY 1),
       f AS (SELECT d, rc, CASE WHEN lag(rc) OVER (ORDER BY d) IS NULL
           OR rc <= lag(rc) OVER (ORDER BY d) THEN 1 ELSE 0 END AS brk
         FROM d),
       g AS (SELECT d, rc, CAST(sum(brk) OVER (ORDER BY d
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id FROM f),
       r AS (SELECT run_id, strftime(min(d), '%Y-%m-%d') AS start_day,
             strftime(max(d), '%Y-%m-%d') AS end_day,
             count(*) AS len,
             CAST(max(rc) - min(rc) AS BIGINT) AS gain
             FROM g GROUP BY 1)
       SELECT start_day, end_day, len, gain FROM r
       ORDER BY len DESC, start_day LIMIT 5""",
    note="longest strictly-increasing revenue ramps: gaps-and-islands "
    "on the monotonicity flag (break at any non-increase), islands "
    "aggregated to (start, end, length, gain) and top-5 by length — "
    "the 'momentum streak' read that rolling means smear out.  On "
    "the pre-aggregated daily series min(rc)/max(rc) coincide with "
    "the run's endpoints because each run is increasing by "
    "construction; exact cents end to end",
)
def t53(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    d = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.floor(F.sum("value") * 100 + 0.5).cast("long").alias("rc")
    )
    w = Window.orderBy("d")
    f = d.select(
        "d",
        "rc",
        F.when(
            F.lag("rc").over(w).isNull() | (F.col("rc") <= F.lag("rc").over(w)), 1
        )
        .otherwise(0)
        .alias("brk"),
    )
    g = f.withColumn(
        "run_id",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        g.groupBy("run_id")
        .agg(
            date_str(F.min("d")).alias("start_day"),
            date_str(F.max("d")).alias("end_day"),
            F.count(F.lit(1)).alias("len"),
            (F.max("rc") - F.min("rc")).alias("gain"),
        )
        .select("start_day", "end_day", "len", "gain")
        .orderBy(F.desc("len"), "start_day")
        .limit(5)
    )


@_q(
    "q96_largest_remainder",
    """WITH r AS (SELECT n_name,
         CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT) AS rev
       FROM orders JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey GROUP BY 1),
       t AS (SELECT CAST(sum(rev) AS BIGINT) AS tot FROM r),
       a AS (SELECT n_name, rev, (1000000 * rev) // tot AS base,
             (1000000 * rev) % tot AS frac FROM r CROSS JOIN t),
       k AS (SELECT CAST(1000000 - sum(base) AS BIGINT) AS k FROM a),
       rk AS (SELECT n_name, rev, base,
              row_number() OVER (ORDER BY frac DESC, n_name) AS rn FROM a)
       SELECT n_name, rev,
         CAST(base + CASE WHEN rn <= k.k THEN 1 ELSE 0 END AS BIGINT) AS alloc
       FROM rk CROSS JOIN k ORDER BY 1""",
    note="largest-remainder (Hamilton) apportionment: split a fixed "
    "1M-unit budget across nations proportionally to exact revenue "
    "cents so the allocations are integers AND sum to the budget "
    "exactly — the prorating primitive naive round(share) gets "
    "wrong by +-n/2 units.  Pure integer arithmetic: floor shares "
    "via BIGINT division, the leftover k units to the k largest "
    "exact remainders (modulo, not float fractions), full "
    "tie-break.  One small sort over 25 nation rows",
)
def q96(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    r = (
        c.table("orders")
        .join(c.table("customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.table("nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.floor(F.sum("o_totalprice") * 100 + 0.5).cast("long").alias("rev"))
    )
    t = r.agg(F.sum("rev").alias("tot"))
    a = r.crossJoin(F.broadcast(t)).select(
        "n_name",
        "rev",
        F.expr("(1000000 * rev) DIV tot").alias("base"),
        ((1000000 * F.col("rev")) % F.col("tot")).alias("frac"),
    )
    k = a.agg((F.lit(1000000) - F.sum("base")).cast("long").alias("k"))
    rk = a.select(
        "n_name",
        "rev",
        "base",
        F.row_number().over(Window.orderBy(F.desc("frac"), "n_name")).alias("rn"),
    )
    return (
        rk.crossJoin(F.broadcast(k))
        .select(
            "n_name",
            "rev",
            (
                F.col("base")
                + F.when(F.col("rn") <= F.col("k"), 1).otherwise(0)
            ).cast("long").alias("alloc"),
        )
        .orderBy("n_name")
    )


@_q(
    "t54_hazard_curve",
    """WITH ia AS (SELECT least(24,
         (epoch_us(ts) - epoch_us(lag(ts) OVER
            (PARTITION BY user_id ORDER BY ts, event_id)))
           // 3600000000) AS w
       FROM events),
       h AS (SELECT CAST(w AS INT) AS w, count(*) AS n FROM ia
             WHERE w IS NOT NULL GROUP BY 1),
       s AS (SELECT w, n, CAST(sum(n) OVER (ORDER BY w DESC
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS at_risk FROM h)
       SELECT w AS wait_hours, n, at_risk,
         round(CAST(n AS DOUBLE) / at_risk, 4) AS hazard
       FROM s ORDER BY 1""",
    note="discrete-time hazard curve of inter-event waits: for each "
    "whole-hour wait bucket (capped at 24h), the conditional "
    "probability the next event arrives in that hour GIVEN the user "
    "has waited that long — n(w) / sum_{w'>=w} n(w'), the survival-"
    "analysis read behind churn and re-engagement timing that raw "
    "interarrival quantiles (t24) don't answer.  The at-risk "
    "denominators come from one reverse-ordered prefix sum over the "
    "25-row histogram; waits are exact integer microseconds",
)
def t54(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    ia = ev.select(
        F.least(
            F.lit(24).cast("long"),
            F.floor((us - F.lag(us).over(w)) / 3_600_000_000),
        ).alias("w")
    ).filter(F.col("w").isNotNull())
    h = ia.groupBy(F.col("w").cast("int").alias("w")).agg(
        F.count(F.lit(1)).alias("n")
    )
    s = h.withColumn(
        "at_risk",
        F.sum("n").over(
            Window.orderBy(F.desc("w")).rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return s.select(
        F.col("w").alias("wait_hours"),
        "n",
        "at_risk",
        F.round(F.col("n").cast("double") / F.col("at_risk"), 4).alias("hazard"),
    ).orderBy("wait_hours")


@_q(
    "q97_pandas_streaks",
    """WITH o AS (SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS brk
       FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       g AS (SELECT user_id, event_type,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS rid FROM o),
       runs AS (SELECT user_id, event_type, count(*) AS len FROM g
                GROUP BY user_id, rid, event_type),
       best AS (SELECT user_id, len AS max_streak, event_type AS streak_type,
         row_number() OVER (PARTITION BY user_id
           ORDER BY len DESC, event_type) AS rn FROM runs)
       SELECT user_id, max_streak, streak_type FROM best WHERE rn = 1
       ORDER BY 1""",
    note="longest same-type event streak per user, computed through "
    "the Arrow GROUPED-MAP path (applyInPandas: one pandas frame per "
    "user, imperative run-length scan) and oracled by the relational "
    "gaps-and-islands form — the declared proof that the Python "
    "grouped-map surface produces bit-identical results to pure SQL "
    "when its tie rules (max length, then lexicographic type) are "
    "pinned.  One shuffle on the grouping key either way; the "
    "pandas path is the template for per-entity logic SQL can't "
    "express (the m-suite codecs), used here where it CAN be "
    "cross-checked",
)
def q97(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = Catalog(spark, sf_dir).table("events").select(
        "user_id", "event_type", "ts", "event_id"
    )

    def streaks(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        best_len, best_type, cur_len, prev = 0, None, 0, object()
        for t in pdf["event_type"]:
            cur_len = cur_len + 1 if t == prev else 1
            prev = t
            if cur_len > best_len or (cur_len == best_len and t < best_type):
                best_len, best_type = cur_len, t
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "max_streak": [best_len],
                "streak_type": [best_type],
            }
        )

    return (
        ev.groupBy("user_id")
        .applyInPandas(streaks, "user_id long, max_streak long, streak_type string")
        .orderBy("user_id")
    )


@_q(
    "q98_capped_balance",
    """WITH RECURSIVE r AS (SELECT l_suppkey AS k,
         CASE WHEN l_linestatus = 'O'
              THEN CAST(floor(l_quantity + 0.5) AS BIGINT)
              ELSE -CAST(floor(l_quantity + 0.5) AS BIGINT) END AS delta,
         row_number() OVER (PARTITION BY l_suppkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
       FROM lineitem WHERE l_suppkey < 10),
       n AS (SELECT k, CAST(max(rn) AS BIGINT) AS n_rows FROM r GROUP BY 1),
       w(k, rn, bal, clamps) AS (
         SELECT k, rn, greatest(0, delta),
           CASE WHEN delta < 0 THEN 1 ELSE 0 END
         FROM r WHERE rn = 1
         UNION ALL
         SELECT r.k, r.rn, greatest(0, w.bal + r.delta),
           w.clamps + CASE WHEN w.bal + r.delta < 0 THEN 1 ELSE 0 END
         FROM w JOIN r ON r.k = w.k AND r.rn = w.rn + 1)
       SELECT w.k AS suppkey, n.n_rows,
         CAST(w.bal AS BIGINT) AS final_balance,
         CAST(w.clamps AS BIGINT) AS n_clamps
       FROM w JOIN n ON n.k = w.k AND w.rn = n.n_rows
       ORDER BY 1""",
    note="zero-clamped running inventory balance (receipts minus "
    "issues, floored at 0): the per-row recursion max(0, prev + "
    "delta) that NO window function expresses — the documented "
    "boundary where this engine switches to the Arrow grouped-map "
    "path (applyInPandas: one ordered numpy scan per supplier), "
    "while the oracle unrolls the same recurrence as a recursive "
    "CTE.  Deterministic total order (shipdate, orderkey, "
    "linenumber); integer units throughout; one shuffle on the "
    "entity key, per-key state is two integers",
)
def q98(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    li = (
        Catalog(spark, sf_dir)
        .table("lineitem")
        .filter(F.col("l_suppkey") < 10)
        .select(
            F.col("l_suppkey").alias("k"),
            F.when(
                F.col("l_linestatus") == "O",
                F.floor(F.col("l_quantity") + 0.5).cast("long"),
            )
            .otherwise(-F.floor(F.col("l_quantity") + 0.5).cast("long"))
            .alias("delta"),
            "l_shipdate",
            "l_orderkey",
            "l_linenumber",
        )
    )

    def clamped(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["l_shipdate", "l_orderkey", "l_linenumber"])
        bal, clamps = 0, 0
        for d in pdf["delta"]:
            nxt = bal + int(d)
            if nxt < 0:
                clamps += 1
                nxt = 0
            bal = nxt
        return pd.DataFrame(
            {
                "suppkey": [int(pdf["k"].iloc[0])],
                "n_rows": [len(pdf)],
                "final_balance": [bal],
                "n_clamps": [clamps],
            }
        )

    return (
        li.groupBy("k")
        .applyInPandas(
            clamped,
            "suppkey long, n_rows long, final_balance long, n_clamps long",
        )
        .orderBy("suppkey")
    )


@_q(
    "t55_bounce_rate",
    """WITH g AS (SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS flag
       FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       s AS (SELECT user_id, ts,
         sum(flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS sid FROM g),
       iv AS (SELECT user_id, sid,
              CAST(date_trunc('day', min(ts)) AS DATE) AS d,
              count(*) AS n FROM s GROUP BY 1, 2)
       SELECT strftime(d, '%Y-%m-%d') AS day, count(*) AS n_sessions,
         CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS bounces,
         round(CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
           / count(*), 4) AS bounce_rate
       FROM iv GROUP BY 1 ORDER BY 1""",
    note="daily bounce rate: sessions (t03 gap rule, attributed to "
    "their start day) that contain exactly one event, over total "
    "sessions — the engagement-health staple.  Reuses the shared "
    "sessionize shape (one shuffle on the user key); the daily "
    "rollup is a combinable aggregate over the (small) session "
    "table; integers except one ratio per day",
)
def t55(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    sess = sessionize(ev, "user_id", "ts", 1800, tiebreak=["event_id"])
    iv = sess.groupBy("user_id", "session_id").agg(
        F.to_date(F.min("ts")).alias("d"), F.count(F.lit(1)).alias("n")
    )
    return (
        iv.groupBy(date_str(F.col("d")).alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).alias("bounces"),
            F.round(
                F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("bounce_rate"),
        )
        .orderBy("day")
    )


@_q(
    "q99_pattern_vshape",
    """WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS rc
       FROM events GROUP BY 1),
       s AS (SELECT d, CASE
           WHEN lag(rc) OVER w IS NULL THEN 'F'
           WHEN rc > lag(rc) OVER w THEN 'U'
           WHEN rc < lag(rc) OVER w THEN 'D' ELSE 'F' END AS sym
         FROM d WINDOW w AS (ORDER BY d)),
       seq AS (SELECT string_agg(sym, '' ORDER BY d) AS sq FROM s)
       SELECT CAST(length(sq) AS BIGINT) AS n_days,
         CAST((length(sq) - length(regexp_replace(sq, 'DU', '', 'g'))) // 2
           AS BIGINT) AS v_bottoms,
         CAST(len(regexp_extract_all(sq, 'D+U+')) AS BIGINT) AS v_shapes,
         CAST(coalesce(list_max(list_transform(
           regexp_extract_all(sq, 'D+U+'), x -> length(x))), 0) AS BIGINT)
           AS longest_v
       FROM seq""",
    note="row-pattern matching (the MATCH_RECOGNIZE read) without the "
    "clause: encode each day as U/D/F against the previous day, fold "
    "the days into ONE ordered symbol string, and count V-shapes "
    "(D+U+ runs), exact bottoms (DU transitions), and the longest V "
    "by regex over that string — dip-and-recovery detection.  The "
    "symbol fold is an ordered string_agg over the ~30-row daily "
    "series (the raw facts never leave their one groupBy); at scale "
    "the same trick runs per entity key with the fold partitioned",
)
def q99(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    d = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.floor(F.sum("value") * 100 + 0.5).cast("long").alias("rc")
    )
    w = Window.orderBy("d")
    s = d.select(
        "d",
        F.when(F.lag("rc").over(w).isNull(), "F")
        .when(F.col("rc") > F.lag("rc").over(w), "U")
        .when(F.col("rc") < F.lag("rc").over(w), "D")
        .otherwise("F")
        .alias("sym"),
    )
    seq = s.agg(
        F.concat_ws(
            "",
            F.expr("transform(array_sort(collect_list(struct(d, sym))), x -> x.sym)"),
        ).alias("sq")
    )
    return seq.select(
        F.length("sq").cast("long").alias("n_days"),
        F.floor(
            (
                F.length("sq")
                - F.length(F.regexp_replace("sq", "DU", ""))
            )
            / 2
        ).cast("long").alias("v_bottoms"),
        F.size(F.expr("regexp_extract_all(sq, 'D+U+', 0)"))
        .cast("long")
        .alias("v_shapes"),
        F.coalesce(
            F.expr(
                "array_max(transform(regexp_extract_all(sq, 'D+U+', 0),"
                " x -> length(x)))"
            ),
            F.lit(0),
        ).cast("long").alias("longest_v"),
    )


@_q(
    "t56_hour_coverage",
    """WITH b AS (SELECT date_trunc('hour', min(ts)) AS lo,
         date_trunc('hour', max(ts)) AS hi FROM events),
       spine AS (SELECT lo + i * INTERVAL '1 hour' AS h
         FROM b, unnest(generate_series(0,
           CAST((epoch_us(hi) - epoch_us(lo)) // 3600000000 AS BIGINT))) t(i)),
       pres AS (SELECT DISTINCT date_trunc('hour', ts) AS h FROM events),
       mi AS (SELECT s.h FROM spine s LEFT JOIN pres p ON p.h = s.h
              WHERE p.h IS NULL)
       SELECT (SELECT count(*) FROM spine) AS total_hours,
         (SELECT count(*) FROM pres) AS present_hours,
         (SELECT count(*) FROM mi) AS missing_hours,
         round(CAST((SELECT count(*) FROM pres) AS DOUBLE)
           / (SELECT count(*) FROM spine), 4) AS coverage,
         (SELECT strftime(min(h), '%Y-%m-%d %H:%M:%S.%f') FROM mi)
           AS first_missing""",
    note="hour-coverage gap report: a generated hour spine over the "
    "observed range anti-joined against the hours that actually "
    "have events — total/present/missing counts, coverage ratio, "
    "and the first hole.  The ingestion-completeness check that "
    "runs BEFORE anyone trusts a windowed aggregate (an absent "
    "window in s01 is indistinguishable from zero traffic without "
    "it).  Spine size is range/hour (~720 rows/month) regardless "
    "of fact volume; the presence set is one distinct over the "
    "truncated hour",
)
def t56(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    b = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = b.select(
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.floor(
                    (F.unix_micros("hi") - F.unix_micros("lo")) / 3_600_000_000
                ).cast("long"),
            )
        ).alias("i"),
        "lo",
    ).select(
        F.timestamp_micros(
            F.unix_micros("lo") + F.col("i") * 3_600_000_000
        ).alias("h")
    )
    pres = ev.select(F.date_trunc("hour", "ts").alias("h")).distinct()
    mi = spine.join(pres.withColumnRenamed("h", "ph"), spine.h == F.col("ph"), "left").filter(
        F.col("ph").isNull()
    )
    ns = spine.agg(F.count(F.lit(1)).alias("total_hours"))
    np_ = pres.agg(F.count(F.lit(1)).alias("present_hours"))
    nm = mi.agg(
        F.count(F.lit(1)).alias("missing_hours"),
        ts_str(F.min("h")).alias("first_missing"),
    )
    return (
        ns.crossJoin(np_)
        .crossJoin(nm)
        .select(
            "total_hours",
            "present_hours",
            "missing_hours",
            F.round(
                F.col("present_hours").cast("double") / F.col("total_hours"), 4
            ).alias("coverage"),
            "first_missing",
        )
    )


@_q(
    "t57_watermark_whatif",
    """WITH a AS (SELECT epoch_us(ts) AS us,
         max(epoch_us(ts)) OVER (ORDER BY event_id
           ROWS UNBOUNDED PRECEDING) AS mx
       FROM events),
       l AS (SELECT mx - us AS late FROM a),
       n AS (SELECT count(*) AS total FROM l),
       c AS (SELECT d.delay_s, CAST(count(*) FILTER
           (WHERE late > CAST(d.delay_s AS BIGINT) * 1000000) AS BIGINT)
           AS n_dropped
         FROM l CROSS JOIN (VALUES (60), (600), (3600), (14400))
           d(delay_s) GROUP BY 1)
       SELECT CAST(delay_s AS INT) AS delay_s, n_dropped,
         round(CAST(n_dropped AS DOUBLE) / total, 6) AS drop_rate
       FROM c CROSS JOIN n ORDER BY 1""",
    note="watermark what-if: for candidate delays (1m/10m/1h/4h), "
    "exactly how many events would arrive behind the watermark and "
    "be dropped — t48's lateness distribution turned into the "
    "decision table: pick the smallest delay whose drop_rate is "
    "inside the loss budget.  One running-max pass (per source "
    "partition at scale) then a 4-way threshold count; integer "
    "microseconds throughout",
)
def t57(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    us = F.unix_micros(F.col("ts"))
    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, 0)
    l = ev.select((F.max(us).over(w) - us).alias("late"))
    delays = l.sparkSession.createDataFrame(
        [(60,), (600,), (3600,), (14400,)], ["delay_s"]
    )
    n = l.agg(F.count(F.lit(1)).alias("total"))
    c = (
        l.crossJoin(F.broadcast(delays))
        .groupBy("delay_s")
        .agg(
            F.sum(
                F.when(F.col("late") > F.col("delay_s") * 1_000_000, 1).otherwise(0)
            ).alias("n_dropped")
        )
    )
    return (
        c.crossJoin(F.broadcast(n))
        .select(
            F.col("delay_s").cast("int").alias("delay_s"),
            "n_dropped",
            F.round(F.col("n_dropped").cast("double") / F.col("total"), 6).alias(
                "drop_rate"
            ),
        )
        .orderBy("delay_s")
    )


@_q(
    "q100_table_stats",
    """SELECT col, ndv, n_nulls, lo, hi FROM (
         SELECT 'o_custkey' AS col, count(DISTINCT o_custkey) AS ndv,
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nulls,
           CAST(min(o_custkey) AS VARCHAR) AS lo,
           CAST(max(o_custkey) AS VARCHAR) AS hi FROM orders
         UNION ALL
         SELECT 'o_orderstatus', count(DISTINCT o_orderstatus),
           CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
             AS BIGINT),
           min(o_orderstatus), max(o_orderstatus) FROM orders
         UNION ALL
         SELECT 'o_totalprice', count(DISTINCT
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)),
           CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
             AS BIGINT),
           CAST(CAST(min(floor(o_totalprice * 100 + 0.5)) AS BIGINT)
             AS VARCHAR),
           CAST(CAST(max(floor(o_totalprice * 100 + 0.5)) AS BIGINT)
             AS VARCHAR) FROM orders
         UNION ALL
         SELECT 'o_orderpriority', count(DISTINCT o_orderpriority),
           CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
             AS BIGINT),
           min(o_orderpriority), max(o_orderpriority) FROM orders) u
       ORDER BY 1""",
    note="cost-based-optimizer statistics collection (the ANALYZE "
    "TABLE read): exact NDV, null count, and min/max per column of "
    "orders — the numbers Catalyst's CBO and every broadcast/skew "
    "decision in this repo consume.  Money NDV/extrema are taken on "
    "exact integer cents and all extrema render as strings so one "
    "schema carries mixed column types; a single scan computes all "
    "four column blocks (Spark executes the union's aggregates "
    "over one shuffle each, map-side combined)",
)
def q100(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")

    def block(col: str, expr, lo_expr, hi_expr) -> DataFrame:
        return o.agg(
            F.countDistinct(expr).alias("ndv"),
            F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).alias("n_nulls"),
            lo_expr.alias("lo"),
            hi_expr.alias("hi"),
        ).select(F.lit(col).alias("col"), "ndv", "n_nulls", "lo", "hi")

    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    stats = (
        block(
            "o_custkey",
            F.col("o_custkey"),
            F.min("o_custkey").cast("string"),
            F.max("o_custkey").cast("string"),
        )
        .unionAll(
            block(
                "o_orderstatus",
                F.col("o_orderstatus"),
                F.min("o_orderstatus"),
                F.max("o_orderstatus"),
            )
        )
        .unionAll(
            block(
                "o_totalprice",
                cents,
                F.min(cents).cast("string"),
                F.max(cents).cast("string"),
            )
        )
        .unionAll(
            block(
                "o_orderpriority",
                F.col("o_orderpriority"),
                F.min("o_orderpriority"),
                F.max("o_orderpriority"),
            )
        )
    )
    return stats.select("col", "ndv", "n_nulls", "lo", "hi").orderBy("col")


@_q(
    "q101_fk_discovery",
    """WITH pairs AS (
         SELECT 'lineitem.l_suppkey->supplier.s_suppkey' AS cand,
           (SELECT count(DISTINCT l_suppkey) FROM lineitem) AS child_ndv,
           (SELECT count(*) FROM (SELECT DISTINCT l_suppkey FROM lineitem) c
             JOIN (SELECT DISTINCT s_suppkey FROM supplier) p
             ON p.s_suppkey = c.l_suppkey) AS contained
         UNION ALL
         SELECT 'orders.o_custkey->customer.c_custkey',
           (SELECT count(DISTINCT o_custkey) FROM orders),
           (SELECT count(*) FROM (SELECT DISTINCT o_custkey FROM orders) c
             JOIN (SELECT DISTINCT c_custkey FROM customer) p
             ON p.c_custkey = c.o_custkey)
         UNION ALL
         SELECT 'customer.c_nationkey->nation.n_nationkey',
           (SELECT count(DISTINCT c_nationkey) FROM customer),
           (SELECT count(*) FROM (SELECT DISTINCT c_nationkey FROM customer) c
             JOIN (SELECT DISTINCT n_nationkey FROM nation) p
             ON p.n_nationkey = c.c_nationkey)
         UNION ALL
         SELECT 'lineitem.l_suppkey->customer.c_custkey',
           (SELECT count(DISTINCT l_suppkey) FROM lineitem),
           (SELECT count(*) FROM (SELECT DISTINCT l_suppkey FROM lineitem) c
             JOIN (SELECT DISTINCT c_custkey FROM customer) p
             ON p.c_custkey = c.l_suppkey))
       SELECT cand, child_ndv, CAST(contained AS BIGINT) AS contained,
         round(CAST(contained AS DOUBLE) / child_ndv, 4) AS containment,
         CAST(contained = child_ndv AS BOOLEAN) AS is_fk
       FROM pairs ORDER BY 1""",
    note="foreign-key DISCOVERY by inclusion-dependency mining: for "
    "each candidate (child, parent) column pair, the fraction of the "
    "child's distinct values contained in the parent — containment "
    "1.0 proposes an FK, and the deliberate negative control "
    "(l_suppkey vs c_custkey) shows partial containment that a "
    "naive 'values overlap' heuristic would mis-promote.  Each "
    "check is two distinct-projections and one equi-join on the "
    "deduped keys (cost ~ NDV, not row count) — the schema-"
    "inference pass that makes q81's known-FK audit possible on an "
    "undocumented lake",
)
def q101(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)

    def check(name: str, child: DataFrame, ckey: str, parent: DataFrame, pkey: str) -> DataFrame:
        cd = child.select(F.col(ckey).alias("k")).distinct()
        pd_ = parent.select(F.col(pkey).alias("pk")).distinct()
        ndv = cd.agg(F.count(F.lit(1)).alias("child_ndv"))
        cont = cd.join(pd_, cd.k == pd_.pk).agg(
            F.count(F.lit(1)).alias("contained")
        )
        return ndv.crossJoin(cont).select(
            F.lit(name).alias("cand"), "child_ndv", "contained"
        )

    li, su, o, cu, na = (
        c.table("lineitem"),
        c.table("supplier"),
        c.table("orders"),
        c.table("customer"),
        c.table("nation"),
    )
    pairs = (
        check("lineitem.l_suppkey->supplier.s_suppkey", li, "l_suppkey", su, "s_suppkey")
        .unionAll(check("orders.o_custkey->customer.c_custkey", o, "o_custkey", cu, "c_custkey"))
        .unionAll(
            check(
                "customer.c_nationkey->nation.n_nationkey", cu, "c_nationkey", na, "n_nationkey"
            )
        )
        .unionAll(
            check("lineitem.l_suppkey->customer.c_custkey", li, "l_suppkey", cu, "c_custkey")
        )
    )
    return pairs.select(
        "cand",
        "child_ndv",
        "contained",
        F.round(F.col("contained").cast("double") / F.col("child_ndv"), 4).alias(
            "containment"
        ),
        (F.col("contained") == F.col("child_ndv")).alias("is_fk"),
    ).orderBy("cand")


@_q(
    "t59_imputation_backtest",
    """WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS rc
       FROM events GROUP BY 1),
       k AS (SELECT d, rc, CAST(d - DATE '1970-01-01' AS BIGINT) AS ed
             FROM d),
       h AS (SELECT k.rc AS truth, p1.rc AS prev, n1.rc AS nxt, p7.rc AS wk
         FROM k JOIN k p1 ON p1.ed = k.ed - 1
         JOIN k n1 ON n1.ed = k.ed + 1
         JOIN k p7 ON p7.ed = k.ed - 7
         WHERE k.ed % 5 = 0),
       m AS (SELECT 'a_ffill' AS method,
           CAST(sum(abs(2 * truth - 2 * prev)) AS BIGINT) AS s2,
           count(*) AS n FROM h
         UNION ALL SELECT 'b_linear',
           CAST(sum(abs(2 * truth - prev - nxt)) AS BIGINT), count(*) FROM h
         UNION ALL SELECT 'c_seasonal_naive',
           CAST(sum(abs(2 * truth - 2 * wk)) AS BIGINT), count(*) FROM h)
       SELECT method, n, round(CAST(s2 AS DOUBLE) / (2 * n), 2) AS mae_cents
       FROM m ORDER BY 1""",
    note="imputation-strategy backtest: pretend every 5th epoch-day of "
    "the daily series is missing (with its neighbors and day-7 "
    "present) and score forward-fill (t05), midpoint linear "
    "interpolation (t10), and seasonal-naive (t34) against the held-"
    "out truth — the measurement that chooses a gap-fill policy "
    "instead of defaulting to ffill.  All absolute errors are kept "
    "as 2x-scaled exact integers (the midpoint's only denominator), "
    "one double division per method row; the lag/lead/weekly "
    "neighbors come from index-aligned self-joins on the tiny daily "
    "table",
)
def t59(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    d = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.floor(F.sum("value") * 100 + 0.5).cast("long").alias("rc")
    )
    k = d.select(
        "rc",
        F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")).cast("long").alias("ed"),
    ).localCheckpoint(eager=True)

    def shifted(name: str, off: int) -> DataFrame:
        return k.select(
            (F.col("ed") + off).alias("ed_j"), F.col("rc").alias(name)
        )

    h = (
        k.filter(F.col("ed") % 5 == 0)
        .join(shifted("prev", 1), F.col("ed") == F.col("ed_j"))
        .drop("ed_j")
        .join(shifted("nxt", -1), F.col("ed") == F.col("ed_j"))
        .drop("ed_j")
        .join(shifted("wk", 7), F.col("ed") == F.col("ed_j"))
        .drop("ed_j")
        .select(F.col("rc").alias("truth"), "prev", "nxt", "wk")
    )

    def method(name: str, err2) -> DataFrame:
        return h.agg(
            F.sum(err2).alias("s2"), F.count(F.lit(1)).alias("n")
        ).select(F.lit(name).alias("method"), "s2", "n")

    m = (
        method("a_ffill", F.abs(2 * F.col("truth") - 2 * F.col("prev")))
        .unionAll(
            method("b_linear", F.abs(2 * F.col("truth") - F.col("prev") - F.col("nxt")))
        )
        .unionAll(
            method("c_seasonal_naive", F.abs(2 * F.col("truth") - 2 * F.col("wk")))
        )
    )
    return m.select(
        "method",
        "n",
        F.round(F.col("s2").cast("double") / (2 * F.col("n")), 2).alias("mae_cents"),
    ).orderBy("method")


@_q(
    "q102_lorenz_curve",
    """WITH c AS (SELECT o_custkey,
         CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT) AS rev
       FROM orders GROUP BY 1),
       t AS (SELECT c.o_custkey, c.rev,
         CAST(ntile(10) OVER (ORDER BY c.rev, c.o_custkey) AS INT) AS dec
         FROM c),
       g AS (SELECT dec, count(*) AS n_cust,
             CAST(sum(rev) AS BIGINT) AS dec_rev FROM t GROUP BY 1),
       s AS (SELECT dec, n_cust, dec_rev,
             CAST(sum(dec_rev) OVER (ORDER BY dec
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_rev,
             CAST(sum(dec_rev) OVER () AS BIGINT) AS tot FROM g)
       SELECT dec AS decile, n_cust, dec_rev,
         round(CAST(cum_rev AS DOUBLE) / tot, 4) AS cum_share
       FROM s ORDER BY 1""",
    note="Lorenz concentration curve: customers in exact revenue "
    "deciles (ntile over integer cents, full tie-break), cumulative "
    "revenue share per decile — the 'top 10% of accounts carry X% "
    "of revenue' curve whose area complement is q87's Gini, here "
    "as the inspectable 10-point profile rather than one scalar.  "
    "Everything after the per-customer groupBy runs on 10 rows",
)
def q102(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    c = o.groupBy("o_custkey").agg(
        F.floor(F.sum("o_totalprice") * 100 + 0.5).cast("long").alias("rev")
    )
    t = c.select(
        "rev",
        F.ntile(10).over(Window.orderBy("rev", "o_custkey")).cast("int").alias("dec"),
    )
    g = t.groupBy("dec").agg(
        F.count(F.lit(1)).alias("n_cust"), F.sum("rev").alias("dec_rev")
    )
    wcum = Window.orderBy("dec").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    s = g.select(
        "dec",
        "n_cust",
        "dec_rev",
        F.sum("dec_rev").over(wcum).alias("cum_rev"),
        F.sum("dec_rev").over(wall).alias("tot"),
    )
    return s.select(
        F.col("dec").alias("decile"),
        "n_cust",
        "dec_rev",
        F.round(F.col("cum_rev").cast("double") / F.col("tot"), 4).alias("cum_share"),
    ).orderBy("decile")


@_q(
    "q103_ab_test",
    """WITH u AS (SELECT user_id,
         CASE WHEN strpos('0123456789abcdef',
           substring(md5(user_id::VARCHAR), 1, 1)) - 1 < 8
           THEN 'A' ELSE 'B' END AS arm,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
       FROM events GROUP BY 1, 2),
       g AS (SELECT
         CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS nb,
         CAST(sum(CASE WHEN arm = 'A' THEN conv ELSE 0 END) AS BIGINT) AS ca,
         CAST(sum(CASE WHEN arm = 'B' THEN conv ELSE 0 END) AS BIGINT) AS cb
       FROM u)
       SELECT na, nb, ca, cb,
         round(CAST(ca AS DOUBLE) / na, 4) AS rate_a,
         round(CAST(cb AS DOUBLE) / nb, 4) AS rate_b,
         round((CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)
           / nullif(sqrt((CAST(ca + cb AS DOUBLE) / (na + nb))
             * (1 - CAST(ca + cb AS DOUBLE) / (na + nb))
             * (CAST(1 AS DOUBLE) / na + CAST(1 AS DOUBLE) / nb)), 0), 4)
           AS z_stat
       FROM g""",
    note="two-proportion A/B analysis with DETERMINISTIC assignment: "
    "arms by user-id hash parity (the reproducible randomization "
    "unit every experimentation platform uses — re-runs and "
    "engines agree on who saw what), purchase conversion per arm, "
    "and the pooled two-proportion z statistic.  All counts are "
    "exact; the z expression is one fixed-order double formula, so "
    "the statistic is bit-stable, and its denominator is nullif-"
    "guarded for the degenerate all-convert / none-convert pool "
    "(small fixtures hit it; z is NULL, not a crash).  One groupBy "
    "on the user key feeds everything",
)
def q103(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    arm = F.when(
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1),
        )
        - 1
        < 8,
        "A",
    ).otherwise("B")
    u = ev.groupBy("user_id", arm.alias("arm")).agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("conv")
    )
    g = u.agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0)).alias("nb"),
        F.sum(F.when(F.col("arm") == "A", F.col("conv")).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("arm") == "B", F.col("conv")).otherwise(0)).alias("cb"),
    )
    ra = F.col("ca").cast("double") / F.col("na")
    rb = F.col("cb").cast("double") / F.col("nb")
    pp = (F.col("ca") + F.col("cb")).cast("double") / (F.col("na") + F.col("nb"))
    z = (ra - rb) / F.nullif(
        F.sqrt(
            pp
            * (1 - pp)
            * (
                F.lit(1).cast("double") / F.col("na")
                + F.lit(1).cast("double") / F.col("nb")
            )
        ),
        F.lit(0.0),
    )
    return g.select(
        "na",
        "nb",
        "ca",
        "cb",
        F.round(ra, 4).alias("rate_a"),
        F.round(rb, 4).alias("rate_b"),
        F.round(z, 4).alias("z_stat"),
    )


@_q(
    "t60_mix_entropy",
    """WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
         count(*) AS n,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
           AS BIGINT) AS c1,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
           AS BIGINT) AS c2,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS BIGINT) AS c3,
         CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
           AS BIGINT) AS c4,
         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
           AS BIGINT) AS c5
       FROM events GROUP BY 1)
       SELECT strftime(d, '%Y-%m-%d') AS day, n,
         round(-(
           CASE WHEN c1 = 0 THEN 0 ELSE (CAST(c1 AS DOUBLE) / n)
             * log2(CAST(c1 AS DOUBLE) / n) END
           + CASE WHEN c2 = 0 THEN 0 ELSE (CAST(c2 AS DOUBLE) / n)
             * log2(CAST(c2 AS DOUBLE) / n) END
           + CASE WHEN c3 = 0 THEN 0 ELSE (CAST(c3 AS DOUBLE) / n)
             * log2(CAST(c3 AS DOUBLE) / n) END
           + CASE WHEN c4 = 0 THEN 0 ELSE (CAST(c4 AS DOUBLE) / n)
             * log2(CAST(c4 AS DOUBLE) / n) END
           + CASE WHEN c5 = 0 THEN 0 ELSE (CAST(c5 AS DOUBLE) / n)
             * log2(CAST(c5 AS DOUBLE) / n) END), 4) AS entropy
       FROM d ORDER BY 1""",
    note="daily Shannon entropy of the event-type mix: the diversity-"
    "collapse detector (entropy diving means one event type is "
    "swallowing traffic — an outage or a bot — before any single "
    "count alarm fires).  The domain is the five declared event "
    "types, so entropy is an EXPLICIT five-term expression in fixed "
    "order over exact per-type counts — no cross-row double "
    "accumulation, no collect_list; one groupBy produces all five "
    "counters map-side",
)
def t60(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    cnt = lambda t: F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
    d = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("n"),
        cnt("click").alias("c1"),
        cnt("error").alias("c2"),
        cnt("purchase").alias("c3"),
        cnt("signup").alias("c4"),
        cnt("view").alias("c5"),
    )

    def term(c):
        p = F.col(c).cast("double") / F.col("n")
        return F.when(F.col(c) == 0, 0.0).otherwise(p * F.log2(p))

    ent = -(term("c1") + term("c2") + term("c3") + term("c4") + term("c5"))
    return d.select(
        date_str(F.col("d")).alias("day"), "n", F.round(ent, 4).alias("entropy")
    ).orderBy("day")


@_q(
    "t61_binary_segmentation",
    """WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS rc
       FROM events GROUP BY 1),
       s AS (SELECT d, rc,
         CAST(sum(rc) OVER w AS BIGINT) AS s1,
         CAST(sum(rc * rc) OVER w AS BIGINT) AS q1,
         CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS n1
         FROM d WINDOW w AS (ORDER BY d ROWS UNBOUNDED PRECEDING)),
       t AS (SELECT count(*) AS n, CAST(sum(rc) AS BIGINT) AS st,
             CAST(sum(rc * rc) AS BIGINT) AS qt FROM d),
       c AS (SELECT d, n1, n - n1 AS n2,
         (q1 - CAST(s1 AS DOUBLE) * s1 / n1)
           + ((qt - q1) - CAST(st - s1 AS DOUBLE) * (st - s1) / (n - n1))
           AS sse,
         CAST(s1 AS DOUBLE) / n1 AS mean1,
         CAST(st - s1 AS DOUBLE) / (n - n1) AS mean2
         FROM s CROSS JOIN t WHERE n1 < n)
       SELECT strftime(d, '%Y-%m-%d') AS split_day,
         CAST(n1 AS BIGINT) AS n_before, CAST(n2 AS BIGINT) AS n_after,
         round(mean1 / 100, 2) AS mean_before,
         round(mean2 / 100, 2) AS mean_after, round(sse, 2) AS sse
       FROM c ORDER BY sse, split_day LIMIT 1""",
    note="single-changepoint localization by binary segmentation: "
    "the split of the daily series minimizing two-segment SSE, via "
    "prefix sums — every candidate's SSE comes from exact BIGINT "
    "(sum, sum-of-squares, count) prefixes in ONE window pass, so "
    "the argmin scan is O(days) not O(days^2), and both engines "
    "compute identical doubles from identical integers (argmin "
    "tie-broken by day).  Recursing on each side gives full "
    "top-down changepoint trees; t33's CUSUM detects, this "
    "LOCALIZES",
)
def t61(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    d = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.floor(F.sum("value") * 100 + 0.5).cast("long").alias("rc")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    s = d.select(
        "d",
        F.sum("rc").over(w).alias("s1"),
        F.sum(F.col("rc") * F.col("rc")).over(w).alias("q1"),
        F.row_number().over(Window.orderBy("d")).cast("long").alias("n1"),
    )
    t = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rc").alias("st"),
        F.sum(F.col("rc") * F.col("rc")).alias("qt"),
    )
    c = (
        s.crossJoin(F.broadcast(t))
        .filter(F.col("n1") < F.col("n"))
        .select(
            "d",
            "n1",
            (F.col("n") - F.col("n1")).alias("n2"),
            (
                (F.col("q1") - F.col("s1").cast("double") * F.col("s1") / F.col("n1"))
                + (
                    (F.col("qt") - F.col("q1"))
                    - (F.col("st") - F.col("s1")).cast("double")
                    * (F.col("st") - F.col("s1"))
                    / (F.col("n") - F.col("n1"))
                )
            ).alias("sse"),
            (F.col("s1").cast("double") / F.col("n1")).alias("mean1"),
            (
                (F.col("st") - F.col("s1")).cast("double")
                / (F.col("n") - F.col("n1"))
            ).alias("mean2"),
        )
    )
    return (
        c.select(
            date_str(F.col("d")).alias("split_day"),
            F.col("n1").alias("n_before"),
            F.col("n2").alias("n_after"),
            F.round(F.col("mean1") / 100, 2).alias("mean_before"),
            F.round(F.col("mean2") / 100, 2).alias("mean_after"),
            F.round("sse", 2).alias("sse"),
        )
        .orderBy("sse", "split_day")
        .limit(1)
    )


@_q(
    "q104_mix_shift",
    """WITH a AS (SELECT o_orderpriority AS seg, count(*) AS n1,
         CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT) AS rev1
       FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
         AND o_orderdate < TIMESTAMP '1997-01-01' GROUP BY 1),
       b AS (SELECT o_orderpriority AS seg, count(*) AS n2,
         CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT) AS rev2
       FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
         AND o_orderdate < TIMESTAMP '1998-01-01' GROUP BY 1)
       SELECT a.seg, n1, n2, rev1, rev2,
         floor(CAST(2 * (rev2 * n1 - n2 * rev1) + n1 AS DOUBLE)
           / (2 * n1)) / 100 AS rate_effect,
         floor(CAST(2 * ((n2 - n1) * rev1) + n1 AS DOUBLE)
           / (2 * n1)) / 100 AS mix_effect,
         CAST(rev2 - rev1 AS DOUBLE) / 100 AS total_change
       FROM a JOIN b ON b.seg = a.seg ORDER BY 1""",
    note="rate/mix-shift decomposition of year-over-year revenue by "
    "priority segment: per segment, total change splits EXACTLY into "
    "a rate effect (same volume, new average price) and a mix effect "
    "(volume change at old average price) — rate + mix == total by "
    "algebraic identity (rev2 - n2*rev1/n1) + ((n2-n1)*rev1/n1) = "
    "rev2 - rev1 (pre-rounding; each effect then rounds to cents "
    "via the exact-integer floor((2N+D)/(2D)) half-up, immune to "
    "the float half-boundary AND to dialect disagreement on "
    "negative halves).  Two filtered aggregates with pushed-down "
    "date predicates, one keyed join on the 5-row segment table",
)
def q104(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")

    def year(y: int, n: str, r: str) -> DataFrame:
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
            )
            .groupBy(F.col("o_orderpriority").alias("seg"))
            .agg(
                F.count(F.lit(1)).alias(n),
                F.floor(F.sum("o_totalprice") * 100 + 0.5).cast("long").alias(r),
            )
        )

    a = year(1996, "n1", "rev1")
    b = year(1997, "n2", "rev2").withColumnRenamed("seg", "seg2")
    j = a.join(b, F.col("seg2") == F.col("seg"))
    # exact integer round-half-up of the rational N/D cents:
    # floor((2N + D) / (2D)) — no float half-boundary, no dialect
    # disagreement on negative rounding
    rate = (
        F.floor(
            (
                2 * (F.col("rev2") * F.col("n1") - F.col("n2") * F.col("rev1"))
                + F.col("n1")
            ).cast("double")
            / (2 * F.col("n1"))
        )
        / 100
    )
    mix = (
        F.floor(
            (2 * ((F.col("n2") - F.col("n1")) * F.col("rev1")) + F.col("n1")).cast(
                "double"
            )
            / (2 * F.col("n1"))
        )
        / 100
    )
    return j.select(
        "seg",
        "n1",
        "n2",
        "rev1",
        "rev2",
        rate.alias("rate_effect"),
        mix.alias("mix_effect"),
        ((F.col("rev2") - F.col("rev1")).cast("double") / 100).alias("total_change"),
    ).orderBy("seg")


@_q(
    "t62_horizon_wape",
    """WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS x
       FROM events GROUP BY 1),
       s AS (SELECT CAST(d - DATE '1970-01-01' AS BIGINT) AS ed, x FROM d),
       k AS (SELECT i AS h FROM generate_series(1, 7) t(i)),
       p AS (SELECT k.h AS h, CAST(sum(abs(a.x - b.x)) AS BIGINT) AS sae,
             CAST(sum(abs(a.x)) AS BIGINT) AS sax, count(*) AS n
         FROM k JOIN s a ON true JOIN s b ON b.ed = a.ed - k.h
         GROUP BY 1)
       SELECT CAST(h AS INT) AS horizon, n,
         round(CAST(sae AS DOUBLE) / sax, 4) AS wape
       FROM p ORDER BY 1""",
    note="forecast-horizon error curve: WAPE of the naive 'value h "
    "days ago' forecast for horizons 1..7 — the curve that tells an "
    "operator how far ahead the naive baseline stays usable and "
    "which horizon needs a real model (its elbow typically lands on "
    "the t43 ACF's dominant period).  Numerator and denominator are "
    "exact integer cent sums per horizon (WAPE, unlike MAPE, never "
    "divides by a single day's value); the lagged pairs come from "
    "index-aligned self-joins on the tiny daily series",
)
def t62(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    d = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.floor(F.sum("value") * 100 + 0.5).cast("long").alias("x")
    )
    s = d.select(
        F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")).cast("long").alias("ed"),
        "x",
    ).localCheckpoint(eager=True)
    ks = spark.range(1, 8).select(F.col("id").alias("h"))
    a = s.select(F.col("ed").alias("ae"), F.col("x").alias("ax"))
    b = s.select(F.col("ed").alias("be"), F.col("x").alias("bx"))
    p = (
        ks.crossJoin(a)
        .join(b, F.col("be") == F.col("ae") - F.col("h"))
        .groupBy("h")
        .agg(
            F.sum(F.abs(F.col("ax") - F.col("bx"))).alias("sae"),
            F.sum(F.abs(F.col("ax"))).alias("sax"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return p.select(
        F.col("h").cast("int").alias("horizon"),
        "n",
        F.round(F.col("sae").cast("double") / F.col("sax"), 4).alias("wape"),
    ).orderBy("horizon")


@_q(
    "q105_aging_buckets",
    """WITH o AS (SELECT CAST(DATE '1998-08-01'
           - CAST(o_orderdate AS DATE) AS BIGINT) AS age,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS vc
       FROM orders WHERE o_orderstatus = 'O'
         AND o_orderdate < TIMESTAMP '1998-08-01'),
       b AS (SELECT CASE WHEN age <= 180 THEN 'a_0_180'
           WHEN age <= 365 THEN 'b_181_365'
           WHEN age <= 730 THEN 'c_366_730'
           ELSE 'd_over_730' END AS bucket, vc FROM o)
       SELECT bucket, count(*) AS n_orders,
         CAST(sum(vc) AS BIGINT) AS total_cents
       FROM b GROUP BY 1 ORDER BY 1""",
    note="open-order aging report (the receivables-aging staple): "
    "orders still in status 'O' at the reference date, bucketed by "
    "exact integer day age with order counts and cent totals per "
    "band — the working-capital read.  The status+date predicates "
    "push to the parquet scan; ages are date arithmetic on integers "
    "(no timezone, no DST), and the whole report is one combinable "
    "aggregation",
)
def q105(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    base = o.filter(
        (F.col("o_orderstatus") == "O")
        & (F.col("o_orderdate") < F.lit("1998-08-01").cast("timestamp"))
    ).select(
        F.datediff(
            F.lit("1998-08-01").cast("date"), F.to_date("o_orderdate")
        ).cast("long").alias("age"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("vc"),
    )
    bucket = (
        F.when(F.col("age") <= 180, "a_0_180")
        .when(F.col("age") <= 365, "b_181_365")
        .when(F.col("age") <= 730, "c_366_730")
        .otherwise("d_over_730")
    )
    return (
        base.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum("vc").alias("total_cents"))
        .orderBy("bucket")
    )


@_q(
    "q106_new_vs_returning",
    """WITH f AS (SELECT o_custkey, min(o_orderdate) AS first_d
         FROM orders GROUP BY 1),
       m AS (SELECT date_trunc('month', o.o_orderdate) AS mon,
         CASE WHEN date_trunc('month', f.first_d)
              = date_trunc('month', o.o_orderdate)
              THEN 'new' ELSE 'returning' END AS kind,
         CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS vc
         FROM orders o JOIN f ON f.o_custkey = o.o_custkey
         WHERE o.o_orderdate < TIMESTAMP '1997-01-01')
       SELECT strftime(mon, '%Y-%m') AS month, kind, count(*) AS n_orders,
         CAST(sum(vc) AS BIGINT) AS rev_cents
       FROM m GROUP BY 1, 2 ORDER BY 1, 2""",
    note="new-vs-returning revenue split per month (bounded to the "
    "pre-1997 window to keep output stable): an order is 'new' iff "
    "it falls in its customer's first-ever month — the acquisition-"
    "vs-retention revenue mix every growth dashboard leads with, "
    "and the aggregate complement to t17's cohort matrix.  First-"
    "order month is one groupBy min joined back on the customer "
    "key (co-partitioned with the orders it classifies); exact "
    "cents throughout",
)
def q106(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    f = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.min("o_orderdate").alias("first_d")
    )
    m = (
        o.filter(F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        .join(f, F.col("ck") == F.col("o_custkey"))
        .select(
            F.date_trunc("month", "o_orderdate").alias("mon"),
            F.when(
                F.date_trunc("month", F.col("first_d"))
                == F.date_trunc("month", F.col("o_orderdate")),
                "new",
            )
            .otherwise("returning")
            .alias("kind"),
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("vc"),
        )
    )
    return (
        m.groupBy(F.date_format("mon", "yyyy-MM").alias("month"), "kind")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum("vc").alias("rev_cents"))
        .orderBy("month", "kind")
    )


@_q(
    "t63_spike_attribution",
    """WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
         event_type, CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS vc
       FROM events GROUP BY 1, 2),
       t AS (SELECT d, CAST(sum(vc) AS BIGINT) AS tot FROM d GROUP BY 1),
       dd AS (SELECT d, tot, tot - lag(tot) OVER (ORDER BY d) AS delta
              FROM t),
       td AS (SELECT d.d, d.event_type,
              d.vc - lag(d.vc) OVER (PARTITION BY d.event_type ORDER BY d.d)
                AS tdelta FROM d),
       top AS (SELECT d, event_type, tdelta, row_number() OVER
           (PARTITION BY d ORDER BY abs(tdelta) DESC, event_type) AS rn
         FROM td WHERE tdelta IS NOT NULL)
       SELECT strftime(dd.d, '%Y-%m-%d') AS day,
         CAST(dd.delta AS BIGINT) AS delta_cents,
         top.event_type AS top_type,
         CAST(top.tdelta AS BIGINT) AS top_delta,
         round(CAST(top.tdelta AS DOUBLE) / nullif(dd.delta, 0), 4)
           AS share
       FROM dd JOIN top ON top.d = dd.d AND top.rn = 1
       WHERE dd.delta IS NOT NULL ORDER BY 1""",
    note="spike attribution: for each day-over-day revenue swing, the "
    "event type whose own swing contributed most (argmax |type "
    "delta|, full tie-break) and its share — the automatic first "
    "answer to 'what moved the number yesterday', turning a t32/t50 "
    "alarm into a lead.  Per-type deltas share one window pass "
    "partitioned by type; exact cents; note share can exceed 1 or "
    "be negative when types move against each other — that's the "
    "honest decomposition, not a bug",
)
def t63(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    d = ev.groupBy(
        F.to_date("ts").alias("d"), "event_type"
    ).agg(F.floor(F.sum("value") * 100 + 0.5).cast("long").alias("vc"))
    t = d.groupBy("d").agg(F.sum("vc").alias("tot"))
    dd = t.select(
        "d", (F.col("tot") - F.lag("tot").over(Window.orderBy("d"))).alias("delta")
    ).filter(F.col("delta").isNotNull())
    td = d.select(
        "d",
        "event_type",
        (
            F.col("vc")
            - F.lag("vc").over(Window.partitionBy("event_type").orderBy("d"))
        ).alias("tdelta"),
    ).filter(F.col("tdelta").isNotNull())
    top = (
        td.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("d").orderBy(F.abs(F.col("tdelta")).desc(), "event_type")
            ),
        )
        .filter(F.col("rn") == 1)
        .withColumnRenamed("d", "td_d")
    )
    return (
        dd.join(top, F.col("td_d") == F.col("d"))
        .select(
            date_str(F.col("d")).alias("day"),
            F.col("delta").alias("delta_cents"),
            F.col("event_type").alias("top_type"),
            F.col("tdelta").alias("top_delta"),
            F.round(
                F.col("tdelta").cast("double") / F.nullif(F.col("delta"), F.lit(0)), 4
            ).alias("share"),
        )
        .orderBy("day")
    )


@_q(
    "q107_fiscal_ytd",
    """WITH m AS (SELECT date_trunc('month', o_orderdate) AS mon,
         CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT) AS rev
       FROM orders GROUP BY 1),
       f AS (SELECT mon, rev,
         CAST(CASE WHEN month(mon) >= 7 THEN year(mon)
              ELSE year(mon) - 1 END AS INT) AS fy FROM m)
       SELECT strftime(mon, '%Y-%m') AS month, fy, rev,
         CAST(sum(rev) OVER (PARTITION BY fy ORDER BY mon
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fytd_cents
       FROM f ORDER BY 1""",
    note="fiscal year-to-date running revenue with a July 1 reset: the "
    "window partitions on the derived fiscal year (month >= 7 maps "
    "into the NEXT label year's books) so the cumulative sum "
    "restarts exactly at each fiscal boundary — the finance "
    "calendar read a calendar-year YTD silently gets wrong for "
    "half the year.  One month-level aggregate then a partitioned "
    "prefix sum over ~tens of rows; exact cents",
)
def q107(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    m = o.groupBy(F.date_trunc("month", "o_orderdate").alias("mon")).agg(
        F.floor(F.sum("o_totalprice") * 100 + 0.5).cast("long").alias("rev")
    )
    f = m.select(
        "mon",
        "rev",
        F.when(F.month("mon") >= 7, F.year("mon"))
        .otherwise(F.year("mon") - 1)
        .cast("int")
        .alias("fy"),
    )
    w = Window.partitionBy("fy").orderBy("mon").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return f.select(
        F.date_format("mon", "yyyy-MM").alias("month"),
        "fy",
        "rev",
        F.sum("rev").over(w).alias("fytd_cents"),
    ).orderBy("month")


@_q(
    "q108_decile_transitions",
    """WITH r1 AS (SELECT o_custkey,
         CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT) AS rev
       FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01' GROUP BY 1),
       r2 AS (SELECT o_custkey,
         CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT) AS rev
       FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01' GROUP BY 1),
       d1 AS (SELECT o_custkey, CAST(ntile(10) OVER
           (ORDER BY rev, o_custkey) AS INT) AS dec1 FROM r1),
       d2 AS (SELECT o_custkey, CAST(ntile(10) OVER
           (ORDER BY rev, o_custkey) AS INT) AS dec2 FROM r2)
       SELECT dec1 AS from_decile, dec2 AS to_decile, count(*) AS n
       FROM d1 JOIN d2 ON d2.o_custkey = d1.o_custkey
       GROUP BY 1, 2 ORDER BY 1, 2""",
    note="customer revenue-decile transition matrix between two "
    "periods: who moved where, as the full migration matrix — q90's "
    "top movers are its extreme off-diagonal cells, and a heavy "
    "diagonal certifies rank stability (feature-store freshness "
    "arguments live on this).  Deciles use exact integer cents with "
    "full tie-breaks in BOTH periods; customers active in only one "
    "period drop out of the inner join (their row/column margins "
    "are q106's new/churned populations)",
)
def q108(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    cut = F.lit("1998-01-01").cast("timestamp")

    def dec(pred, name: str, key: str) -> DataFrame:
        return (
            o.filter(pred)
            .groupBy("o_custkey")
            .agg(F.floor(F.sum("o_totalprice") * 100 + 0.5).cast("long").alias("rev"))
            .select(
                F.col("o_custkey").alias(key),
                F.ntile(10)
                .over(Window.orderBy("rev", "o_custkey"))
                .cast("int")
                .alias(name),
            )
        )

    d1 = dec(F.col("o_orderdate") < cut, "from_decile", "k1")
    d2 = dec(F.col("o_orderdate") >= cut, "to_decile", "k2")
    return (
        d1.join(d2, F.col("k2") == F.col("k1"))
        .groupBy("from_decile", "to_decile")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("from_decile", "to_decile")
    )


@_q(
    "t64_interrupted_series",
    """WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS y
       FROM events GROUP BY 1),
       s AS (SELECT CAST(d - DATE '1970-01-01' AS BIGINT) AS x, y,
         CASE WHEN d < DATE '2024-01-15' THEN 'a_pre' ELSE 'b_post' END
           AS seg FROM d),
       g AS (SELECT seg, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx FROM s GROUP BY 1)
       SELECT seg, n, round(CAST(sy AS DOUBLE) / n / 100, 2) AS mean_rev,
         round(CAST(n * sxy - sx * sy AS DOUBLE)
           / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) / 100, 4)
           AS slope_per_day
       FROM g ORDER BY 1""",
    note="interrupted time-series analysis around the 2024-01-15 "
    "intervention: per segment (pre/post), mean daily revenue and "
    "the OLS trend slope — the level-shift + slope-change decomposition "
    "that turns t61's 'where did it change' into 'by how much, and "
    "is it a step or a new trajectory'.  The OLS moments (n, Σx, "
    "Σy, Σxy, Σx²) are exact BIGINTs over epoch-day x and cent y "
    "(t38's integer-exact OLS shape), combined once per segment in "
    "doubles; two output rows total",
)
def t64(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    d = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.floor(F.sum("value") * 100 + 0.5).cast("long").alias("y")
    )
    s = d.select(
        F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")).cast("long").alias("x"),
        "y",
        F.when(F.col("d") < F.lit("2024-01-15").cast("date"), "a_pre")
        .otherwise("b_post")
        .alias("seg"),
    )
    g = s.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (
            F.col("n").cast("double") * F.col("sxx")
            - F.col("sx").cast("double") * F.col("sx")
        )
        / 100
    )
    return g.select(
        "seg",
        "n",
        F.round(F.col("sy").cast("double") / F.col("n") / 100, 2).alias("mean_rev"),
        F.round(slope, 4).alias("slope_per_day"),
    ).orderBy("seg")


@_q(
    "q109_relational_division",
    """WITH sr AS (SELECT DISTINCT l.l_suppkey, n.n_regionkey
         FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
         JOIN customer c ON c.c_custkey = o.o_custkey
         JOIN nation n ON n.n_nationkey = c.c_nationkey),
       nr AS (SELECT count(*) AS n_regions FROM region),
       d AS (SELECT l_suppkey, count(*) AS regions_served FROM sr GROUP BY 1)
       SELECT d.l_suppkey AS suppkey,
         CAST(d.regions_served AS BIGINT) AS regions_served
       FROM d CROSS JOIN nr WHERE d.regions_served = nr.n_regions
       ORDER BY 1""",
    note="relational DIVISION (the 'for all' query SQL lacks as a "
    "keyword): suppliers whose customer base spans EVERY region — "
    "divide the supplier-region relationship by the full region "
    "set via the count-equality reduction (distinct pairs, count "
    "per supplier, compare to |divisor|), which is the scalable "
    "plan: one distinct + one groupBy instead of a nested NOT "
    "EXISTS double negation.  The divisor cardinality broadcasts "
    "as one scalar",
)
def q109(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    sr = (
        c.table("lineitem")
        .join(c.table("orders"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c.table("customer"), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(c.table("nation")), F.col("n_nationkey") == F.col("c_nationkey"))
        .select("l_suppkey", "n_regionkey")
        .distinct()
    )
    nr = c.table("region").agg(F.count(F.lit(1)).alias("n_regions"))
    d = sr.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("regions_served"))
    return (
        d.crossJoin(F.broadcast(nr))
        .filter(F.col("regions_served") == F.col("n_regions"))
        .select(F.col("l_suppkey").alias("suppkey"), "regions_served")
        .orderBy("suppkey")
    )


@_q(
    "t65_sampling_error",
    """WITH e AS (SELECT date_trunc('hour', ts) AS h,
         strpos('0123456789abcdef',
           substring(md5(event_id::VARCHAR), 1, 1)) - 1 AS dig
       FROM events),
       c AS (SELECT h, count(*) AS full_n,
         CAST(sum(CASE WHEN dig < 1 THEN 1 ELSE 0 END) AS BIGINT) AS k1,
         CAST(sum(CASE WHEN dig < 4 THEN 1 ELSE 0 END) AS BIGINT) AS k4,
         CAST(sum(CASE WHEN dig < 8 THEN 1 ELSE 0 END) AS BIGINT) AS k8
       FROM e GROUP BY 1),
       m AS (SELECT 'a_p_1_16' AS rate,
           CAST(sum(abs(16 * k1 - 1 * full_n)) AS BIGINT) AS err_s,
           CAST(sum(1 * full_n) AS BIGINT) AS tot_s FROM c
         UNION ALL SELECT 'b_p_4_16',
           CAST(sum(abs(16 * k4 - 4 * full_n)) AS BIGINT),
           CAST(sum(4 * full_n) AS BIGINT) FROM c
         UNION ALL SELECT 'c_p_8_16',
           CAST(sum(abs(16 * k8 - 8 * full_n)) AS BIGINT),
           CAST(sum(8 * full_n) AS BIGINT) FROM c)
       SELECT rate, round(CAST(err_s AS DOUBLE) / tot_s, 4) AS wape
       FROM m ORDER BY 1""",
    note="load-shedding what-if: replay hourly event counts under "
    "deterministic hash sampling at 1/16, 4/16 and 8/16 and report "
    "the weighted absolute error of the inverse-probability-scaled "
    "estimates against truth — the measurement that says which "
    "monitoring dashboards survive which shedding rate.  The md5 "
    "coin is content-keyed (g51's trick on the time axis), errors "
    "stay exact integers via the 16x cross-multiplication, and the "
    "three what-ifs share ONE scan and one groupBy",
)
def t65(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    dig = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 1),
        )
        - 1
    )
    c = ev.select(F.date_trunc("hour", "ts").alias("h"), dig.alias("dig")).groupBy(
        "h"
    ).agg(
        F.count(F.lit(1)).alias("full_n"),
        F.sum(F.when(F.col("dig") < 1, 1).otherwise(0)).alias("k1"),
        F.sum(F.when(F.col("dig") < 4, 1).otherwise(0)).alias("k4"),
        F.sum(F.when(F.col("dig") < 8, 1).otherwise(0)).alias("k8"),
    )

    def m(rate: str, k: str, p: int) -> DataFrame:
        return c.agg(
            F.sum(F.abs(16 * F.col(k) - p * F.col("full_n"))).alias("err_s"),
            F.sum(p * F.col("full_n")).alias("tot_s"),
        ).select(
            F.lit(rate).alias("rate"),
            F.round(F.col("err_s").cast("double") / F.col("tot_s"), 4).alias("wape"),
        )

    return (
        m("a_p_1_16", "k1", 1)
        .unionAll(m("b_p_4_16", "k4", 4))
        .unionAll(m("c_p_8_16", "k8", 8))
        .orderBy("rate")
    )


@_q(
    "q110_hhi",
    """WITH c AS (SELECT n_name, o_custkey,
         CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT) // 100 AS d
       FROM orders JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey GROUP BY 1, 2),
       g AS (SELECT n_name, count(*) AS n_cust,
             CAST(sum(d) AS BIGINT) AS tot,
             CAST(sum(d * d) AS BIGINT) AS sq,
             CAST(max(d) AS BIGINT) AS mx FROM c GROUP BY 1)
       SELECT n_name, n_cust,
         round(CAST(sq AS DOUBLE) / (CAST(tot AS DOUBLE) * tot), 6) AS hhi,
         round(CAST(mx AS DOUBLE) / tot, 4) AS top_share
       FROM g ORDER BY 1""",
    note="Herfindahl-Hirschman concentration index per nation: sum of "
    "squared customer revenue shares, computed as exact integer "
    "whole-dollar moments (sum, sum-of-squares, max — cents would "
    "overflow BIGINT in the squares at sf0.1, dollars leave 3 "
    "orders of headroom) with the share algebra collapsed to "
    "sq/tot^2 so no per-customer division ever happens — the "
    "monopoly-vs-fragmented read on each market, companion to "
    "q102's economy-wide Lorenz curve.  One groupBy per level",
)
def q110(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    base = (
        c.table("orders")
        .join(c.table("customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.table("nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "o_custkey")
        .agg(
            F.expr(
                "CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT) DIV 100"
            ).alias("d")
        )
    )
    g = base.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.sum("d").alias("tot"),
        F.sum(F.col("d") * F.col("d")).alias("sq"),
        F.max("d").alias("mx"),
    )
    return g.select(
        "n_name",
        "n_cust",
        F.round(
            F.col("sq").cast("double") / (F.col("tot").cast("double") * F.col("tot")),
            6,
        ).alias("hhi"),
        F.round(F.col("mx").cast("double") / F.col("tot"), 4).alias("top_share"),
    ).orderBy("n_name")


_CIRC_PI = "3.141592653589793"


def _circ_sql_terms(fn: str) -> str:
    return " + ".join(
        f"c{h} * {fn}({_CIRC_PI} * {h} / 12)" for h in range(24)
    )


@_q(
    "t66_circular_concentration",
    "WITH h AS (SELECT hour(ts) AS hh, count(*) AS n FROM events GROUP BY 1),\n"
    + "       p AS (SELECT "
    + ", ".join(
        f"CAST(coalesce(sum(CASE WHEN hh = {h} THEN n END), 0) AS BIGINT) AS c{h}"
        for h in range(24)
    )
    + ", CAST(sum(n) AS BIGINT) AS tot FROM h)\n"
    + f"""       SELECT tot AS n_events,
         round(sqrt(({_circ_sql_terms('cos')})
             * ({_circ_sql_terms('cos')})
           + ({_circ_sql_terms('sin')})
             * ({_circ_sql_terms('sin')})) / tot, 4) AS mean_resultant,
         round(atan2(({_circ_sql_terms('sin')}),
           ({_circ_sql_terms('cos')})) * 12 / {_CIRC_PI}, 4) AS peak_hour
       FROM p""",
    note="circular statistics on the hour-of-day cycle: mean resultant "
    "length R (0 = uniform around the clock, 1 = all traffic at one "
    "instant) and the circular-mean peak hour via atan2 — the "
    "correct concentration/phase read for a quantity that wraps at "
    "midnight, where linear mean/stddev (t22's heatmap margins) are "
    "meaningless.  The 24 hour-bin counts come from one groupBy; "
    "the trig combination is a FIXED-ORDER generated expression "
    "over those exact integers (no cross-row float accumulation), "
    "identical text in both engines",
)
def t66(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    h = ev.groupBy(F.hour("ts").alias("hh")).agg(F.count(F.lit(1)).alias("n"))
    p = h.agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("hh") == i, F.col("n"))), F.lit(0)
            ).cast("long").alias(f"c{i}")
            for i in range(24)
        ],
        F.sum("n").alias("tot"),
    )
    import math

    def comb(fn) -> F.Column:
        expr = None
        for i in range(24):
            term = F.col(f"c{i}") * F.lit(fn(math.pi * i / 12))
            expr = term if expr is None else expr + term
        return expr

    cc, ss = comb(math.cos), comb(math.sin)
    return p.select(
        F.col("tot").alias("n_events"),
        F.round(F.sqrt(cc * cc + ss * ss) / F.col("tot"), 4).alias("mean_resultant"),
        F.round(F.atan2(ss, cc) * 12 / math.pi, 4).alias("peak_hour"),
    )


@_q(
    "q111_temporal_integrity",
    """WITH j AS (SELECT l_shipdate, o_orderdate FROM lineitem
         JOIN orders ON o_orderkey = l_orderkey)
       SELECT count(*) AS n_lines,
         CAST(sum(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END)
           AS BIGINT) AS shipped_before_order,
         CAST(sum(CASE WHEN l_shipdate >= o_orderdate
             AND epoch_us(l_shipdate) - epoch_us(o_orderdate)
               > 365 * 86400000000 THEN 1 ELSE 0 END) AS BIGINT)
           AS shipped_after_1y,
         round(CAST(sum(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END)
           AS DOUBLE) / count(*), 6) AS violation_rate
       FROM j""",
    note="cross-table TEMPORAL integrity: line items shipped before "
    "their order existed (hard causality violation) or more than a "
    "year after (staleness smell) — the time-axis complement to "
    "q81's key-existence FK audit; event-sourced lakes break this "
    "way silently when backfills mix clocks.  One co-partitioned "
    "join on the order key, integer microsecond comparisons, three "
    "scalars out",
)
def q111(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    j = c.table("lineitem").join(
        c.table("orders"), F.col("o_orderkey") == F.col("l_orderkey")
    )
    before = F.sum(
        F.when(F.col("l_shipdate") < F.col("o_orderdate"), 1).otherwise(0)
    )
    late = F.sum(
        F.when(
            (F.col("l_shipdate") >= F.col("o_orderdate"))
            & (
                F.unix_micros(F.col("l_shipdate"))
                - F.unix_micros(F.col("o_orderdate"))
                > 365 * 86_400_000_000
            ),
            1,
        ).otherwise(0)
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_lines"),
        before.alias("shipped_before_order"),
        late.alias("shipped_after_1y"),
        F.round(before.cast("double") / F.count(F.lit(1)), 6).alias(
            "violation_rate"
        ),
    )


@_q(
    "t67_cron_minutes",
    """WITH m AS (SELECT minute(ts) AS mi, count(*) AS n
         FROM events GROUP BY 1),
       t AS (SELECT CAST(sum(n) AS BIGINT) AS tot, count(*) AS nm FROM m)
       SELECT CAST(mi AS INT) AS minute_of_hour, n,
         round(CAST(60 * n AS DOUBLE) / tot, 4) AS uniformity_ratio
       FROM m CROSS JOIN t
       ORDER BY n DESC, mi LIMIT 10""",
    note="cron-spike detection: the 10 heaviest minutes-of-hour with "
    "their load relative to a uniform clock (ratio 1.0 = organic "
    "traffic; minute 0 at 5x = a scheduled job is hammering the "
    "pipeline) — the operational read that explains periodic "
    "latency cliffs before anyone blames the engine.  The 60-bin "
    "histogram is one groupBy; the uniformity ratio is exact "
    "integers times 60 over the total, one division per row",
)
def t67(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    m = ev.groupBy(F.minute("ts").alias("mi")).agg(F.count(F.lit(1)).alias("n"))
    t = m.agg(F.sum("n").alias("tot"), F.count(F.lit(1)).alias("nm"))
    return (
        m.crossJoin(F.broadcast(t))
        .select(
            F.col("mi").cast("int").alias("minute_of_hour"),
            "n",
            F.round((60 * F.col("n")).cast("double") / F.col("tot"), 4).alias(
                "uniformity_ratio"
            ),
        )
        .orderBy(F.desc("n"), "minute_of_hour")
        .limit(10)
    )


@_q(
    "t68_we_rules",
    """WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS rc
       FROM events GROUP BY 1),
       mr AS (SELECT d, rc, abs(rc - lag(rc) OVER (ORDER BY d)) AS m
              FROM d),
       g AS (SELECT count(*) AS n, CAST(sum(rc) AS BIGINT) AS s,
             CAST(sum(m) AS BIGINT) AS sm, count(m) AS nm FROM mr),
       b AS (SELECT d, rc,
         CAST(s AS DOUBLE) / n AS ce,
         2.66 * (CAST(sm AS DOUBLE) / nm) AS s3 FROM mr CROSS JOIN g),
       f AS (SELECT d, rc,
         CASE WHEN rc > ce THEN 1 ELSE -1 END AS side,
         CASE WHEN rc > ce + s3 OR rc < ce - s3 THEN 1 ELSE 0 END AS r3,
         CASE WHEN rc > ce + s3 * 2 / 3 THEN 1 ELSE 0 END AS hi2,
         CASE WHEN rc < ce - s3 * 2 / 3 THEN 1 ELSE 0 END AS lo2
         FROM b),
       runs AS (SELECT d, rc, side, r3, hi2, lo2,
         CASE WHEN lag(side) OVER w IS NULL OR side <> lag(side) OVER w
              THEN 1 ELSE 0 END AS brk
         FROM f WINDOW w AS (ORDER BY d)),
       rr AS (SELECT d, rc, side, r3, hi2, lo2,
         sum(brk) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS rid
         FROM runs),
       rl AS (SELECT d, rc, side, r3, hi2, lo2,
         row_number() OVER (PARTITION BY rid ORDER BY d) AS runlen FROM rr),
       z AS (SELECT d, rc, side, r3, runlen,
         sum(hi2) OVER (ORDER BY d ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
           AS h3,
         sum(lo2) OVER (ORDER BY d ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
           AS l3 FROM rl)
       SELECT strftime(d, '%Y-%m-%d') AS day, rc, CAST(side AS INT) AS side,
         CAST(r3 = 1 AS BOOLEAN) AS rule_3sigma,
         CAST(h3 >= 2 OR l3 >= 2 AS BOOLEAN) AS rule_2of3,
         CAST(runlen >= 8 AS BOOLEAN) AS rule_8run
       FROM z ORDER BY 1""",
    note="Western Electric run rules over the t50 XmR chart: beyond-"
    "3-sigma points, 2-of-3 consecutive beyond the 2-sigma zone on "
    "the same side, and 8-in-a-row on one side of center — the "
    "rules that catch drifts and shifts long before a single point "
    "escapes the limits.  Center and sigma come from exact integer "
    "moments (one double each); the side runs are gaps-and-islands "
    "on an exact comparison; every rolling flag window runs over "
    "the ~30-row daily series",
)
def t68(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    d = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.floor(F.sum("value") * 100 + 0.5).cast("long").alias("rc")
    )
    wd = Window.orderBy("d")
    mr = d.select("d", "rc", F.abs(F.col("rc") - F.lag("rc").over(wd)).alias("m"))
    g = mr.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rc").alias("s"),
        F.sum("m").alias("sm"),
        F.count("m").alias("nm"),
    )
    b = mr.crossJoin(F.broadcast(g)).select(
        "d",
        "rc",
        (F.col("s").cast("double") / F.col("n")).alias("ce"),
        (2.66 * (F.col("sm").cast("double") / F.col("nm"))).alias("s3"),
    )
    f = b.select(
        "d",
        "rc",
        F.when(F.col("rc") > F.col("ce"), 1).otherwise(-1).alias("side"),
        F.when(
            (F.col("rc") > F.col("ce") + F.col("s3"))
            | (F.col("rc") < F.col("ce") - F.col("s3")),
            1,
        ).otherwise(0).alias("r3"),
        F.when(F.col("rc") > F.col("ce") + F.col("s3") * 2 / 3, 1)
        .otherwise(0)
        .alias("hi2"),
        F.when(F.col("rc") < F.col("ce") - F.col("s3") * 2 / 3, 1)
        .otherwise(0)
        .alias("lo2"),
    )
    runs = f.withColumn(
        "brk",
        F.when(
            F.lag("side").over(wd).isNull()
            | (F.col("side") != F.lag("side").over(wd)),
            1,
        ).otherwise(0),
    )
    rr = runs.withColumn(
        "rid", F.sum("brk").over(wd.rowsBetween(Window.unboundedPreceding, 0))
    )
    rl = rr.withColumn(
        "runlen", F.row_number().over(Window.partitionBy("rid").orderBy("d"))
    )
    z = rl.select(
        "d",
        "rc",
        "side",
        "r3",
        "runlen",
        F.sum("hi2").over(wd.rowsBetween(-2, 0)).alias("h3"),
        F.sum("lo2").over(wd.rowsBetween(-2, 0)).alias("l3"),
    )
    return z.select(
        date_str(F.col("d")).alias("day"),
        "rc",
        F.col("side").cast("int").alias("side"),
        (F.col("r3") == 1).alias("rule_3sigma"),
        ((F.col("h3") >= 2) | (F.col("l3") >= 2)).alias("rule_2of3"),
        (F.col("runlen") >= 8).alias("rule_8run"),
    ).orderBy("day")


@_q(
    "q112_balance_audit",
    """WITH t AS (SELECT doc_id, octet_length(encode(text)) AS nb
         FROM documents),
       r AS (SELECT nb, CAST((row_number() OVER (ORDER BY nb DESC, doc_id)
           - 1) % 8 AS INT) AS worker FROM t),
       w AS (SELECT worker, count(*) AS n_docs,
             CAST(sum(nb) AS BIGINT) AS bytes FROM r GROUP BY 1),
       m AS (SELECT CAST(max(bytes) AS BIGINT) AS mx,
             CAST(sum(bytes) AS BIGINT) AS tot FROM w)
       SELECT worker, n_docs, bytes,
         round(CAST(8 * bytes AS DOUBLE) / tot, 4) AS load_ratio,
         round(CAST(8 * mx AS DOUBLE) / tot, 4) AS straggler_ratio
       FROM w CROSS JOIN m ORDER BY 1""",
    note="static load-balance audit for size-skewed work: documents "
    "dealt to 8 workers in descending-size round-robin (the sorted "
    "deal that approximates LPT scheduling without its sequential "
    "state), then per-worker byte loads against the uniform ideal "
    "and the straggler ratio every worker row shares — "
    "straggler_ratio IS the wall-clock multiplier a naive unsorted "
    "split would hand the slowest task.  One sort-rank over (size, "
    "id), one groupBy; exact bytes",
)
def q112(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    t = d.select(
        "doc_id", F.octet_length(F.encode(F.col("text"), "utf-8")).cast("long").alias("nb")
    )
    r = t.select(
        "nb",
        (
            (F.row_number().over(Window.orderBy(F.desc("nb"), "doc_id")) - 1) % 8
        ).cast("int").alias("worker"),
    )
    w = r.groupBy("worker").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("nb").alias("bytes")
    )
    m = w.agg(F.max("bytes").alias("mx"), F.sum("bytes").alias("tot"))
    return (
        w.crossJoin(F.broadcast(m))
        .select(
            "worker",
            "n_docs",
            "bytes",
            F.round((8 * F.col("bytes")).cast("double") / F.col("tot"), 4).alias(
                "load_ratio"
            ),
            F.round((8 * F.col("mx")).cast("double") / F.col("tot"), 4).alias(
                "straggler_ratio"
            ),
        )
        .orderBy("worker")
    )


@_q(
    "t69_peak_window",
    """WITH c AS (SELECT CAST(epoch_us(date_trunc('hour', ts))
           // 3600000000 AS BIGINT) AS eh, count(*) AS n
         FROM events GROUP BY 1),
       w AS (SELECT a.eh, CAST(sum(b.n) AS BIGINT) AS n4,
             count(*) AS hours_present
         FROM c a JOIN c b ON b.eh BETWEEN a.eh AND a.eh + 3
         GROUP BY 1)
       SELECT strftime(to_timestamp(eh * 3600), '%Y-%m-%d %H:%M:%S.%f')
           AS window_start, CAST(hours_present AS BIGINT) AS hours_present,
         n4 AS n_events
       FROM w ORDER BY n4 DESC, eh LIMIT 1""",
    note="peak sustained load: the busiest 4-consecutive-hour window "
    "(argmax of a rolling epoch-hour-indexed sum, deterministic "
    "tie-break) — the capacity number autoscaling and rate-limit "
    "budgets are provisioned against, where the hourly max alone "
    "underestimates sustained pressure.  Epoch-hour integer "
    "indexing makes 'consecutive' exact across gaps (absent hours "
    "contribute zero by absence, hours_present reports how many "
    "were non-empty); the windowed sum is a bounded-offset "
    "self-join on the tiny hourly table",
)
def t69(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    c = ev.groupBy(
        F.floor(F.unix_micros(F.date_trunc("hour", "ts")) / 3_600_000_000)
        .cast("long")
        .alias("eh")
    ).agg(F.count(F.lit(1)).alias("n")).localCheckpoint(eager=True)
    a = c.select(F.col("eh").alias("ae"))
    b = c.select(F.col("eh").alias("be"), "n")
    w = (
        a.join(b, (F.col("be") >= F.col("ae")) & (F.col("be") <= F.col("ae") + 3))
        .groupBy("ae")
        .agg(F.sum("n").alias("n4"), F.count(F.lit(1)).alias("hours_present"))
    )
    return (
        w.select(
            ts_str(F.timestamp_seconds(F.col("ae") * 3600)).alias("window_start"),
            F.col("hours_present").cast("long").alias("hours_present"),
            F.col("n4").alias("n_events"),
            F.col("ae").alias("__ae"),
        )
        .orderBy(F.desc("n_events"), "__ae")
        .limit(1)
        .drop("__ae")
    )


@_q(
    "q113_topn_other",
    """WITH n AS (SELECT n_name,
         CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT) AS rev,
         count(*) AS n_orders
       FROM orders JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey GROUP BY 1),
       r AS (SELECT n_name, rev, n_orders, row_number() OVER
           (ORDER BY rev DESC, n_name) AS rk FROM n),
       g AS (SELECT CASE WHEN rk <= 5 THEN n_name ELSE 'zz_other' END
           AS label, CAST(sum(rev) AS BIGINT) AS rev,
           CAST(sum(n_orders) AS BIGINT) AS n_orders,
           count(*) AS n_members FROM r GROUP BY 1),
       t AS (SELECT CAST(sum(rev) AS BIGINT) AS tot FROM g)
       SELECT label, n_members, n_orders, rev,
         round(CAST(rev AS DOUBLE) / tot, 4) AS share
       FROM g CROSS JOIN t ORDER BY rev DESC, label""",
    note="top-N-plus-Other rollup: the 5 largest nations by exact "
    "revenue keep their identity, the tail folds into one 'other' "
    "bucket with its member count — the presentation-layer "
    "aggregation every dashboard needs and every ad-hoc query gets "
    "subtly wrong by dropping the tail instead of folding it "
    "(shares then stop summing to 1).  Rank with full tie-break on "
    "exact cents; the fold is one conditional re-group over the "
    "25-row nation aggregate",
)
def q113(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    n = (
        c.table("orders")
        .join(c.table("customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.table("nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.floor(F.sum("o_totalprice") * 100 + 0.5).cast("long").alias("rev"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    r = n.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.desc("rev"), "n_name"))
    )
    g = (
        r.groupBy(
            F.when(F.col("rk") <= 5, F.col("n_name"))
            .otherwise("zz_other")
            .alias("label")
        )
        .agg(
            F.sum("rev").alias("rev"),
            F.sum("n_orders").alias("n_orders"),
            F.count(F.lit(1)).alias("n_members"),
        )
    )
    t = g.agg(F.sum("rev").alias("tot"))
    return (
        g.crossJoin(F.broadcast(t))
        .select(
            "label",
            "n_members",
            "n_orders",
            "rev",
            F.round(F.col("rev").cast("double") / F.col("tot"), 4).alias("share"),
        )
        .orderBy(F.desc("rev"), "label")
    )


@_q(
    "t70_business_hours_share",
    """WITH e AS (SELECT event_type,
         (CAST(CAST(date_trunc('day', ts) AS DATE)
             - DATE '1970-01-01' AS BIGINT) + 3) % 7 AS dow,
         hour(ts) AS hh FROM events),
       f AS (SELECT event_type,
         CASE WHEN dow < 5 AND hh >= 9 AND hh < 17 THEN 1 ELSE 0 END
           AS biz FROM e)
       SELECT event_type, count(*) AS n,
         CAST(sum(biz) AS BIGINT) AS n_business,
         round(CAST(sum(biz) AS DOUBLE) / count(*), 4) AS business_share
       FROM f GROUP BY 1 ORDER BY 1""",
    note="business-hours traffic share per event type (Mon-Fri 9-17 "
    "UTC, weekday via the t37 epoch-day formula that no engine "
    "week-start setting can bend): the organic-vs-automated "
    "signature — human-driven types concentrate in office hours "
    "while bot/batch types flatline across the clock, complementing "
    "t67's minute-level cron spikes at the day scale.  One pass, "
    "integer flags, one ratio per type",
)
def t70(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    dow = (
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).cast("long") + 3
    ) % 7
    biz = F.when(
        (dow < 5) & (F.hour("ts") >= 9) & (F.hour("ts") < 17), 1
    ).otherwise(0)
    return (
        ev.select("event_type", biz.alias("biz"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("biz").alias("n_business"),
            F.round(F.sum("biz").cast("double") / F.count(F.lit(1)), 4).alias(
                "business_share"
            ),
        )
        .orderBy("event_type")
    )


@_q(
    "q114_calendar_dim",
    """WITH d AS (SELECT DATE '1996-01-01' + CAST(i AS INT) AS d
         FROM unnest(generate_series(0, 365)) t(i))
       SELECT strftime(d, '%Y-%m-%d') AS day,
         CAST(year(d) AS INT) AS yr, CAST(month(d) AS INT) AS mo,
         CAST((month(d) + 2) // 3 AS INT) AS qtr,
         CAST((CAST(d - DATE '1970-01-01' AS BIGINT) + 3) % 7 AS INT)
           AS dow,
         CAST((CAST(d - DATE '1970-01-01' AS BIGINT) + 3) % 7 >= 5
           AS BOOLEAN) AS is_weekend,
         CAST(CAST(d - DATE '1996-01-01' AS BIGINT) + 1 AS INT)
           AS day_of_year
       FROM d ORDER BY 1""",
    note="generated calendar dimension for leap-year 1996: the "
    "conformed date table every warehouse join-spines against, "
    "built from a pure sequence (no source scan at all) with "
    "engine-proof attributes — weekday from the epoch-day formula "
    "(0=Monday regardless of locale/week-start settings), quarter "
    "by integer arithmetic, day-of-year by date subtraction.  366 "
    "rows; at scale the same generator emits decades and joins "
    "broadcast",
)
def q114(spark: SparkSession, sf_dir: str) -> DataFrame:
    spine = spark.range(0, 366).select(
        F.date_add(F.lit("1996-01-01").cast("date"), F.col("id").cast("int")).alias("d")
    )
    ed = F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")).cast("long")
    dow = (ed + 3) % 7
    return spine.select(
        date_str(F.col("d")).alias("day"),
        F.year("d").cast("int").alias("yr"),
        F.month("d").cast("int").alias("mo"),
        F.floor((F.month("d") + 2) / 3).cast("int").alias("qtr"),
        dow.cast("int").alias("dow"),
        (dow >= 5).alias("is_weekend"),
        (
            F.datediff(F.col("d"), F.lit("1996-01-01").cast("date")).cast("long") + 1
        ).cast("int").alias("day_of_year"),
    ).orderBy("day")


@_q(
    "t71_taylor_law",
    """WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS rc
       FROM events GROUP BY 1),
       g AS (SELECT (CAST(d - DATE '1970-01-01' AS BIGINT) + 3) % 7 AS dow,
         count(*) AS n, CAST(sum(rc) AS BIGINT) AS s,
         CAST(sum(rc * rc) AS BIGINT) AS ss FROM d GROUP BY 1),
       mv AS (SELECT dow, CAST(s AS DOUBLE) / n AS mean,
         (ss - CAST(s AS DOUBLE) * s / n) / n AS var
         FROM g WHERE n >= 2),
       r AS (SELECT round(regr_slope(ln(var), ln(mean)), 4) AS b,
             count(*) AS n_groups FROM mv WHERE var > 0)
       SELECT b, n_groups,
         CASE WHEN b < 0.5 THEN 'none'
              WHEN b < 1.5 THEN 'sqrt'
              WHEN b < 2.5 THEN 'log'
              ELSE 'inverse' END AS recommended_transform
       FROM r""",
    note="Taylor's power law fit: regress ln(variance) on ln(mean) "
    "across day-of-week groups of daily revenue — the mean-variance "
    "exponent b that picks the variance-stabilizing transform "
    "(b~1 -> sqrt, b~2 -> log) BEFORE anyone runs z-scores or "
    "control charts on heteroscedastic data (t32/t50 implicitly "
    "assume b=0).  Group moments are exact integer sums; ln/regr "
    "run over <= 7 points; the recommendation bands are explicit "
    "CASE cuts on the rounded exponent",
)
def t71(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    d = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.floor(F.sum("value") * 100 + 0.5).cast("long").alias("rc")
    )
    g = d.groupBy(
        (
            (
                F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")).cast("long")
                + 3
            )
            % 7
        ).alias("dow")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rc").alias("s"),
        F.sum(F.col("rc") * F.col("rc")).alias("ss"),
    )
    mv = g.filter(F.col("n") >= 2).select(
        (F.col("s").cast("double") / F.col("n")).alias("mean"),
        (
            (F.col("ss") - F.col("s").cast("double") * F.col("s") / F.col("n"))
            / F.col("n")
        ).alias("var"),
    )
    r = mv.filter(F.col("var") > 0).agg(
        F.round(F.expr("regr_slope(ln(var), ln(mean))"), 4).alias("b"),
        F.count(F.lit(1)).alias("n_groups"),
    )
    return r.select(
        "b",
        "n_groups",
        F.when(F.col("b") < 0.5, "none")
        .when(F.col("b") < 1.5, "sqrt")
        .when(F.col("b") < 2.5, "log")
        .otherwise("inverse")
        .alias("recommended_transform"),
    )


@_q(
    "q115_scd_chain_audit",
    """WITH v AS (SELECT o_custkey AS k, o_orderdate AS vfrom,
         lead(o_orderdate) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey) AS vto FROM orders),
       c AS (SELECT k, vfrom, vto,
         lead(vfrom) OVER (PARTITION BY k ORDER BY vfrom, vto) AS nxt
         FROM v)
       SELECT count(DISTINCT k) AS n_keys, count(*) AS n_versions,
         CAST(sum(CASE WHEN nxt IS NOT NULL AND vto IS NOT NULL
             AND nxt > vto THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
         CAST(sum(CASE WHEN nxt IS NOT NULL AND vto IS NOT NULL
             AND nxt < vto THEN 1 ELSE 0 END) AS BIGINT) AS n_overlaps,
         CAST(sum(CASE WHEN vto IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_open,
         CAST(count(DISTINCT k)
           = sum(CASE WHEN vto IS NULL THEN 1 ELSE 0 END) AS BOOLEAN)
           AS one_open_per_key
       FROM c""",
    note="SCD2 validity-chain integrity audit: per key, successive "
    "versions must tile time with no gaps (next.valid_from > "
    "prev.valid_to), no overlaps (<), and EXACTLY one open row — "
    "the invariants every as-of read (t35, s19) silently assumes "
    "and every hand-rolled MERGE eventually breaks.  On the "
    "lead-derived version table the clean result is a "
    "construction-time proof; pointed at a persisted SCD store it "
    "is the corruption detector.  One window pass per check, "
    "co-partitioned on the key",
)
def q115(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    wv = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    v = o.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("vfrom"),
        F.lead("o_orderdate").over(wv).alias("vto"),
    )
    wc = Window.partitionBy("k").orderBy("vfrom", "vto")
    c = v.withColumn("nxt", F.lead("vfrom").over(wc))
    gaps = F.sum(
        F.when(
            F.col("nxt").isNotNull()
            & F.col("vto").isNotNull()
            & (F.col("nxt") > F.col("vto")),
            1,
        ).otherwise(0)
    )
    overlaps = F.sum(
        F.when(
            F.col("nxt").isNotNull()
            & F.col("vto").isNotNull()
            & (F.col("nxt") < F.col("vto")),
            1,
        ).otherwise(0)
    )
    opens = F.sum(F.when(F.col("vto").isNull(), 1).otherwise(0))
    return c.agg(
        F.countDistinct("k").alias("n_keys"),
        F.count(F.lit(1)).alias("n_versions"),
        gaps.alias("n_gaps"),
        overlaps.alias("n_overlaps"),
        opens.alias("n_open"),
        (F.countDistinct("k") == opens).alias("one_open_per_key"),
    )


@_q(
    "q116_rfm_segments",
    """WITH u AS (SELECT user_id,
         CAST((epoch_us(TIMESTAMP '2024-02-01')
           - epoch_us(max(ts))) // 86400000000 AS BIGINT) AS recency_d,
         count(*) AS freq,
         CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS monetary
       FROM events GROUP BY 1),
       s AS (SELECT user_id,
         CAST(ntile(5) OVER (ORDER BY recency_d DESC, user_id) AS INT) AS r,
         CAST(ntile(5) OVER (ORDER BY freq, user_id) AS INT) AS f,
         CAST(ntile(5) OVER (ORDER BY monetary, user_id) AS INT) AS m
         FROM u)
       SELECT r, f, m, count(*) AS n_users FROM s
       GROUP BY 1, 2, 3 ORDER BY 4 DESC, 1, 2, 3 LIMIT 15""",
    note="RFM segmentation: recency / frequency / monetary quintile "
    "scores per user (5 = most recent, most frequent, highest "
    "spend; recency ranked DESCENDING so larger score = fresher), "
    "top-15 occupied cells — the lifecycle-marketing workhorse "
    "(555 = champions, 1xx = churned).  Integer day recency from "
    "a fixed reference instant, exact cent monetary, ntile with "
    "full tie-breaks in all three dimensions so cell assignment is "
    "engine-stable; one groupBy then three rank passes over the "
    "user table",
)
def q116(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    ref = F.unix_micros(F.lit("2024-02-01").cast("timestamp"))
    u = ev.groupBy("user_id").agg(
        F.floor((ref - F.unix_micros(F.max("ts"))) / 86_400_000_000)
        .cast("long")
        .alias("recency_d"),
        F.count(F.lit(1)).alias("freq"),
        F.floor(F.sum("value") * 100 + 0.5).cast("long").alias("monetary"),
    )
    s = u.select(
        F.ntile(5).over(Window.orderBy(F.desc("recency_d"), "user_id")).cast("int").alias("r"),
        F.ntile(5).over(Window.orderBy("freq", "user_id")).cast("int").alias("f"),
        F.ntile(5).over(Window.orderBy("monetary", "user_id")).cast("int").alias("m"),
    )
    return (
        s.groupBy("r", "f", "m")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.desc("n_users"), "r", "f", "m")
        .limit(15)
    )


@_q(
    "t73_weekend_ttest",
    """WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS rc
       FROM events GROUP BY 1),
       s AS (SELECT rc, CASE WHEN
           (CAST(d - DATE '1970-01-01' AS BIGINT) + 3) % 7 >= 5
           THEN 1 ELSE 0 END AS we FROM d),
       g AS (SELECT
         CAST(sum(CASE WHEN we = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN we = 0 THEN rc ELSE 0 END) AS BIGINT) AS s1,
         CAST(sum(CASE WHEN we = 0 THEN rc * rc ELSE 0 END) AS BIGINT)
           AS q1,
         CAST(sum(CASE WHEN we = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(sum(CASE WHEN we = 1 THEN rc ELSE 0 END) AS BIGINT) AS s2,
         CAST(sum(CASE WHEN we = 1 THEN rc * rc ELSE 0 END) AS BIGINT)
           AS q2 FROM s)
       SELECT n1 AS n_weekday, n2 AS n_weekend,
         round(CAST(s1 AS DOUBLE) / n1 / 100, 2) AS mean_weekday,
         round(CAST(s2 AS DOUBLE) / n2 / 100, 2) AS mean_weekend,
         round((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
           / sqrt((q1 - CAST(s1 AS DOUBLE) * s1 / n1)
               / (CAST(n1 AS DOUBLE) * (n1 - 1))
             + (q2 - CAST(s2 AS DOUBLE) * s2 / n2)
               / (CAST(n2 AS DOUBLE) * (n2 - 1))), 4) AS welch_t
       FROM g""",
    note="weekend-effect two-sample test: weekday vs weekend daily "
    "revenue means with the Welch t statistic (unequal variances — "
    "the correct default) — whether t40's seasonal index reflects "
    "signal or noise.  All six moments (counts, sums, sums of "
    "squares per group) are exact BIGINTs from ONE aggregation "
    "with conditional sums; the t formula is a single fixed-order "
    "double expression, the same determinism discipline as q103's "
    "z.  Epoch-day weekday math, engine-proof",
)
def t73(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    d = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.floor(F.sum("value") * 100 + 0.5).cast("long").alias("rc")
    )
    we = (
        (
            F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")).cast("long")
            + 3
        )
        % 7
        >= 5
    )
    s = d.select("rc", F.when(we, 1).otherwise(0).alias("we"))
    cs = lambda cond, expr: F.sum(F.when(cond, expr).otherwise(0))
    g = s.agg(
        cs(F.col("we") == 0, F.lit(1)).alias("n1"),
        cs(F.col("we") == 0, F.col("rc")).alias("s1"),
        cs(F.col("we") == 0, F.col("rc") * F.col("rc")).alias("q1"),
        cs(F.col("we") == 1, F.lit(1)).alias("n2"),
        cs(F.col("we") == 1, F.col("rc")).alias("s2"),
        cs(F.col("we") == 1, F.col("rc") * F.col("rc")).alias("q2"),
    )
    m1 = F.col("s1").cast("double") / F.col("n1")
    m2 = F.col("s2").cast("double") / F.col("n2")
    v1 = (F.col("q1") - F.col("s1").cast("double") * F.col("s1") / F.col("n1")) / (
        F.col("n1").cast("double") * (F.col("n1") - 1)
    )
    v2 = (F.col("q2") - F.col("s2").cast("double") * F.col("s2") / F.col("n2")) / (
        F.col("n2").cast("double") * (F.col("n2") - 1)
    )
    return g.select(
        F.col("n1").alias("n_weekday"),
        F.col("n2").alias("n_weekend"),
        F.round(m1 / 100, 2).alias("mean_weekday"),
        F.round(m2 / 100, 2).alias("mean_weekend"),
        F.round((m1 - m2) / F.sqrt(v1 + v2), 4).alias("welch_t"),
    )


@_q(
    "q117_moment_profile",
    """WITH c AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
           // 10000 AS d FROM orders),
       g AS (SELECT count(*) AS n, CAST(sum(d) AS BIGINT) AS s1,
             CAST(sum(d * d) AS BIGINT) AS s2,
             CAST(sum(d * d * d) AS BIGINT) AS s3 FROM c),
       m AS (SELECT n, CAST(s1 AS DOUBLE) / n AS m1,
             CAST(s2 AS DOUBLE) / n AS m2,
             CAST(s3 AS DOUBLE) / n AS m3 FROM g)
       SELECT n, round(m1, 2) AS mean_h,
         round(sqrt(m2 - m1 * m1), 2) AS stddev_h,
         round((m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1)
           / nullif(sqrt(m2 - m1 * m1) * (m2 - m1 * m1), 0), 4) AS skewness,
         round(sqrt(m2 - m1 * m1) / m1, 4) AS cv
       FROM m""",
    note="distribution moment profile of order values (in 100-dollar "
    "units so the CUBE power sum stays inside BIGINT at sf1+ — "
    "dollars overflow by sf0.01): mean, stddev, "
    "skewness and coefficient of variation from the first three raw "
    "moments — the shape diagnostics that decide whether downstream "
    "stats assume normality or reach for t71's transform (skewness "
    "near 0 and small cv say the mean is trustworthy; strong right "
    "skew says medians and q102's curve).  Whole-dollar BIGINT "
    "power sums keep the cube exact (cents^3 would overflow); the "
    "moment algebra runs once in fixed-order doubles on one row",
)
def q117(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    c = o.select(
        F.expr(
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DIV 10000"
        ).alias("d")
    )
    g = c.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("d").alias("s1"),
        F.sum(F.col("d") * F.col("d")).alias("s2"),
        F.sum(F.col("d") * F.col("d") * F.col("d")).alias("s3"),
    )
    m1 = F.col("s1").cast("double") / F.col("n")
    m2 = F.col("s2").cast("double") / F.col("n")
    m3 = F.col("s3").cast("double") / F.col("n")
    var = m2 - m1 * m1
    return g.select(
        "n",
        F.round(m1, 2).alias("mean_h"),
        F.round(F.sqrt(var), 2).alias("stddev_h"),
        F.round(
            (m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1)
            / F.nullif(F.sqrt(var) * var, F.lit(0.0)),
            4,
        ).alias("skewness"),
        F.round(F.sqrt(var) / m1, 4).alias("cv"),
    )


@_q(
    "q118_record_linkage",
    """WITH c AS (SELECT c_custkey AS k, c_nationkey AS nk, c_mktsegment AS seg,
            floor(c_acctbal/1000) AS bb, right(c_name, 2) AS ph FROM customer),
       p AS (SELECT CASE WHEN a.bb = b.bb THEN 3 ELSE 0 END
                  + CASE WHEN a.ph = b.ph THEN 2 ELSE 0 END AS score
             FROM c a JOIN c b ON a.nk = b.nk AND a.seg = b.seg AND a.k < b.k)
       SELECT CAST(score AS BIGINT) AS score, CAST(count(*) AS BIGINT) AS n_pairs
       FROM p GROUP BY 1 ORDER BY 1""",
    note="record-linkage scoring with BLOCKING (the Fellegi-Sunter "
    "shape): candidate pairs come from an equi-join on the blocking "
    "key (nation, segment) — never an all-pairs scan — then each pair "
    "scores field agreements (acctbal thousand-bucket +3, name "
    "stem +2) and the score histogram summarizes match quality.  At "
    "100 TB the blocking join IS the feasibility argument: cost is "
    "sum over blocks of k^2, so block keys must be chosen/salted to "
    "bound k (same hub hazard as g23's inverted-index join)",
)
def q118(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).table("customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / 1000).alias("bb"),
        F.expr("right(c_name, 2)").alias("ph"),
    )
    a = c.select(*[F.col(x).alias(f"a_{x}") for x in c.columns])
    b = c.select(*[F.col(x).alias(f"b_{x}") for x in c.columns])
    pairs = a.join(
        b,
        (F.col("a_nk") == F.col("b_nk"))
        & (F.col("a_seg") == F.col("b_seg"))
        & (F.col("a_k") < F.col("b_k")),
    )
    score = (
        F.when(F.col("a_bb") == F.col("b_bb"), 3).otherwise(0)
        + F.when(F.col("a_ph") == F.col("b_ph"), 2).otherwise(0)
    ).cast("bigint")
    return (
        pairs.select(score.alias("score"))
        .groupBy("score")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("score")
    )


@_q(
    "t74_peak_over_threshold",
    """WITH th AS (SELECT event_type, quantile_cont(value, 0.95) AS u
                   FROM events GROUP BY 1),
       ex AS (SELECT e.event_type, th.u, e.value
              FROM events e JOIN th ON e.event_type = th.event_type
              WHERE e.value > th.u)
       SELECT event_type, round(max(u), 4) AS threshold,
              CAST(count(*) AS BIGINT) AS n_exceed,
              round(avg(value - u), 4) AS mean_excess,
              round(max(value - u), 4) AS max_excess
       FROM ex GROUP BY 1 ORDER BY 1""",
    note="peak-over-threshold tail profile (the EVT/GPD preprocessing "
    "step): per-series p95 threshold, then exceedance count, mean "
    "excess (the GPD scale estimator) and max excess.  The threshold "
    "table is one row per event_type — broadcast back onto the fact "
    "scan, so the pass is scan + tiny-dim join + combinable agg; "
    "percentile/quantile_cont interpolation matches cross-engine "
    "(the q27 determinism pattern)",
)
def t74(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    th = ev.groupBy("event_type").agg(F.expr("percentile(value, 0.95)").alias("u"))
    ex = ev.join(F.broadcast(th), "event_type").filter(F.col("value") > F.col("u"))
    return (
        ex.groupBy("event_type")
        .agg(
            F.round(F.max("u"), 4).alias("threshold"),
            F.count(F.lit(1)).alias("n_exceed"),
            F.round(F.avg(F.col("value") - F.col("u")), 4).alias("mean_excess"),
            F.round(F.max(F.col("value") - F.col("u")), 4).alias("max_excess"),
        )
        .orderBy("event_type")
    )


@_q(
    "t75_allen_relations",
    """WITH iv AS (SELECT o_custkey AS k, o_orderkey AS id, o_orderdate AS s,
         o_orderdate + (10 + o_orderkey % 50) * INTERVAL 1 DAY AS e
       FROM orders),
       p AS (SELECT a.s AS sa, a.e AS ea, b.s AS sb, b.e AS eb
             FROM iv a JOIN iv b ON a.k = b.k
             WHERE a.s < b.s OR (a.s = b.s AND a.e < b.e)
                OR (a.s = b.s AND a.e = b.e AND a.id < b.id)),
       cl AS (SELECT CASE
                WHEN sa = sb AND ea = eb THEN 'equals'
                WHEN sa = sb THEN 'starts'
                WHEN ea < sb THEN 'before'
                WHEN ea = sb THEN 'meets'
                WHEN eb < ea THEN 'contains'
                WHEN ea = eb THEN 'finishes'
                ELSE 'overlaps' END AS relation
              FROM p)
       SELECT relation, count(*) AS n FROM cl GROUP BY 1 ORDER BY 1""",
    note="Allen interval-algebra census: every per-customer pair of "
    "order validity intervals (duration varied 10-59d by orderkey so "
    "all seven canonical relations are reachable) classified into "
    "before / meets / overlaps / starts / contains (during^-1) / "
    "finishes / equals under the canonical (start, end, id) pair "
    "ordering that collapses each converse.  The temporal-reasoning "
    "primitive behind conflict detection, interval joins and "
    "coalescing — classified here with pure comparisons on an "
    "EQUI-KEYED pair join (customer key), never an unkeyed interval "
    "cross join; at 100 TB the key join is the same shape as t20's "
    "interval intersection and prunes with the same bucketing",
)
def t75(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    iv = o.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderkey").alias("id"),
        F.col("o_orderdate").alias("s"),
        F.expr(
            "o_orderdate + make_dt_interval(10 + o_orderkey % 50, 0, 0, 0)"
        ).alias("e"),
    )
    a = iv.select("k", F.col("id").alias("ida"), F.col("s").alias("sa"), F.col("e").alias("ea"))
    b = iv.select("k", F.col("id").alias("idb"), F.col("s").alias("sb"), F.col("e").alias("eb"))
    p = a.join(b, "k").filter(
        (F.col("sa") < F.col("sb"))
        | ((F.col("sa") == F.col("sb")) & (F.col("ea") < F.col("eb")))
        | (
            (F.col("sa") == F.col("sb"))
            & (F.col("ea") == F.col("eb"))
            & (F.col("ida") < F.col("idb"))
        )
    )
    rel = (
        F.when((F.col("sa") == F.col("sb")) & (F.col("ea") == F.col("eb")), "equals")
        .when(F.col("sa") == F.col("sb"), "starts")
        .when(F.col("ea") < F.col("sb"), "before")
        .when(F.col("ea") == F.col("sb"), "meets")
        .when(F.col("eb") < F.col("ea"), "contains")
        .when(F.col("ea") == F.col("eb"), "finishes")
        .otherwise("overlaps")
    )
    return (
        p.select(rel.alias("relation"))
        .groupBy("relation")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("relation")
    )


@_q(
    "t76_ewma",
    """WITH RECURSIVE r AS (SELECT user_id AS k, value AS x,
         row_number() OVER (PARTITION BY user_id
           ORDER BY ts, event_id) AS rn
       FROM events WHERE user_id < 200),
       n AS (SELECT k, CAST(max(rn) AS BIGINT) AS n_events FROM r GROUP BY 1),
       w(k, rn, s, mx) AS (
         SELECT k, rn, x, x FROM r WHERE rn = 1
         UNION ALL
         SELECT r.k, r.rn, 0.2 * r.x + 0.8 * w.s,
                greatest(w.mx, 0.2 * r.x + 0.8 * w.s)
         FROM w JOIN r ON r.k = w.k AND r.rn = w.rn + 1)
       SELECT w.k AS user_id, n.n_events,
         round(w.s, 6) AS final_ewma, round(w.mx, 6) AS max_ewma
       FROM w JOIN n ON n.k = w.k AND w.rn = n.n_events
       ORDER BY 1""",
    note="exponentially weighted moving average per user (alpha=0.2) "
    "over the event-time-ordered value stream: the s' = a*x + (1-a)*s "
    "recurrence that no window function expresses without the "
    "numerically explosive (1-a)^-i rewrite — the same documented "
    "Arrow grouped-map boundary as q98, one ordered scan per key via "
    "applyInPandas while the oracle replays the identical recurrence "
    "as a recursive CTE.  BOTH engines evaluate literally "
    "0.2*x + 0.8*s in IEEE double, so the trajectories are bit-"
    "identical, not merely close; state per key is two doubles; one "
    "shuffle on the entity key.  The streaming twin is an "
    "applyInPandasWithState op whose per-batch fold carries (s, mx)",
)
def t76(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = (
        Catalog(spark, sf_dir)
        .table("events")
        .filter(F.col("user_id") < 200)
        .select("user_id", "ts", "event_id", "value")
    )

    def ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        s = mx = None
        for x in pdf["value"]:
            s = float(x) if s is None else 0.2 * float(x) + 0.8 * s
            mx = s if mx is None else max(mx, s)
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [len(pdf)],
                "final_ewma": [s],
                "max_ewma": [mx],
            }
        )

    return (
        ev.groupBy("user_id")
        .applyInPandas(
            ewma, "user_id long, n_events long, final_ewma double, max_ewma double"
        )
        .select(
            "user_id",
            "n_events",
            F.round("final_ewma", 6).alias("final_ewma"),
            F.round("max_ewma", 6).alias("max_ewma"),
        )
        .orderBy("user_id")
    )


@_q(
    "t77_bitemporal_asof",
    """WITH v1 AS (SELECT o_orderkey, o_orderdate AS valid_from,
         o_orderdate + INTERVAL 30 DAY AS valid_to,
         o_orderdate AS tx_from, 1 AS version, o_totalprice AS val
       FROM orders),
       corr AS (SELECT o.o_orderkey, o.o_orderdate AS valid_from,
         o.o_orderdate + INTERVAL 30 DAY AS valid_to,
         min(l.l_shipdate) AS tx_from, 2 AS version,
         o.o_totalprice + 100.00 AS val
       FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       GROUP BY 1, 2, 3, 6),
       allv AS (SELECT * FROM v1 UNION ALL SELECT * FROM corr),
       pick AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey
           ORDER BY version DESC) AS rk
         FROM allv
         WHERE valid_from <= TIMESTAMP '1997-06-15'
           AND valid_to > TIMESTAMP '1997-06-15'
           AND tx_from <= TIMESTAMP '1997-07-01')
       SELECT o_orderkey, version, round(val, 2) AS val
       FROM pick WHERE rk = 1 ORDER BY 1""",
    note="bitemporal AS OF read: rows carry BOTH a valid-time interval "
    "(when the fact was true: [orderdate, +30d)) and a transaction "
    "time (when the system learned it: original booking at v1, a "
    "+100.00 correction transacted at first shipment for v2); the "
    "query answers 'what did we believe on tx=1997-07-01 about what "
    "was true on valid=1997-06-15' — the audit/restatement read that "
    "separates a temporal database from a history table.  Both "
    "filters are pushdown predicates; version selection is one "
    "per-key window (same shape as t18 keep-latest) — at 100 TB the "
    "version table partitions by valid-time bucket so both AS OF "
    "filters prune partitions before the window runs",
)
def t77(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    o = c.table("orders")
    v1 = o.select(
        "o_orderkey",
        F.col("o_orderdate").alias("valid_from"),
        F.expr("o_orderdate + INTERVAL 30 DAYS").alias("valid_to"),
        F.col("o_orderdate").alias("tx_from"),
        F.lit(1).alias("version"),
        F.col("o_totalprice").alias("val"),
    )
    corr = (
        o.join(c.table("lineitem"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.min("l_shipdate").alias("tx_from"))
        .select(
            "o_orderkey",
            F.col("o_orderdate").alias("valid_from"),
            F.expr("o_orderdate + INTERVAL 30 DAYS").alias("valid_to"),
            "tx_from",
            F.lit(2).alias("version"),
            (F.col("o_totalprice") + 100.00).alias("val"),
        )
    )
    allv = v1.unionByName(corr)
    vt = F.lit("1997-06-15").cast("timestamp")
    tt = F.lit("1997-07-01").cast("timestamp")
    w = Window.partitionBy("o_orderkey").orderBy(F.col("version").desc())
    return (
        allv.filter(
            (F.col("valid_from") <= vt) & (F.col("valid_to") > vt) & (F.col("tx_from") <= tt)
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("o_orderkey", "version", F.round("val", 2).alias("val"))
        .orderBy("o_orderkey")
    )


@_q(
    "q119_winsorize",
    """WITH b AS (SELECT l_returnflag AS flag,
         quantile_cont(l_extendedprice, 0.05) AS p05,
         quantile_cont(l_extendedprice, 0.95) AS p95
       FROM lineitem GROUP BY 1),
       w AS (SELECT l.l_returnflag AS flag, l.l_extendedprice AS x,
         least(greatest(l.l_extendedprice, b.p05), b.p95) AS xw,
         CASE WHEN l.l_extendedprice < b.p05 OR l.l_extendedprice > b.p95
              THEN 1 ELSE 0 END AS clipped
       FROM lineitem l JOIN b ON b.flag = l.l_returnflag)
       SELECT flag, count(*) AS n, CAST(sum(clipped) AS BIGINT) AS n_clipped,
              round(avg(x), 4) AS mean_raw, round(avg(xw), 4) AS mean_winsor
       FROM w GROUP BY 1 ORDER BY 1""",
    note="winsorized mean per group: exact p05/p95 fences (Spark "
    "percentile == DuckDB quantile_cont, the q48 equivalence), values "
    "clamped to the fences with least/greatest, raw vs winsorized "
    "mean and the clip count side by side — the robust-aggregate "
    "profile that tells you whether a metric is tail-driven before "
    "you trust its mean.  Two passes over the fact (fence agg, then "
    "clamp agg) with the 6-row fence table broadcast back; at 100 TB "
    "the fence pass becomes percentile_approx (mergeable t-digest) "
    "and the second pass is unchanged",
)
def q119(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    b = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.percentile("l_extendedprice", F.lit(0.05)).alias("p05"),
        F.percentile("l_extendedprice", F.lit(0.95)).alias("p95"),
    )
    w = li.join(
        F.broadcast(b), li.l_returnflag == b.flag
    ).select(
        "flag",
        F.col("l_extendedprice").alias("x"),
        F.least(F.greatest("l_extendedprice", F.col("p05")), F.col("p95")).alias("xw"),
        F.when(
            (F.col("l_extendedprice") < F.col("p05"))
            | (F.col("l_extendedprice") > F.col("p95")),
            1,
        )
        .otherwise(0)
        .alias("clipped"),
    )
    return (
        w.groupBy("flag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("clipped").cast("long").alias("n_clipped"),
            F.round(F.avg("x"), 4).alias("mean_raw"),
            F.round(F.avg("xw"), 4).alias("mean_winsor"),
        )
        .orderBy("flag")
    )


@_q(
    "q120_table_diff",
    """WITH a AS (SELECT o_orderkey AS k, o_totalprice AS v FROM orders),
       b AS (SELECT o_orderkey AS k,
               CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 1.00
                    ELSE o_totalprice END AS v
             FROM orders WHERE o_orderkey % 97 <> 0),
       j AS (SELECT coalesce(a.k, b.k) AS k, a.v AS va, b.v AS vb
             FROM a FULL OUTER JOIN b ON a.k = b.k)
       SELECT count(*) FILTER (WHERE vb IS NULL) AS n_removed,
              count(*) FILTER (WHERE va IS NULL) AS n_added,
              count(*) FILTER (WHERE va IS NOT NULL AND vb IS NOT NULL
                               AND va <> vb) AS n_changed,
              count(*) FILTER (WHERE va = vb) AS n_unchanged
       FROM j""",
    note="table reconciliation diff: FULL OUTER JOIN on the key, then "
    "one conditional-count pass classifies every key as added / "
    "removed / changed / unchanged — the migration-cutover audit "
    "every engine swap (including adopting THIS engine) runs before "
    "flipping traffic.  The candidate 'after' table is derived "
    "deterministically (drop keys %97, +1.00 on keys %89) so the "
    "oracle sees identical inputs.  One co-partitioned join + "
    "map-side-combined counts; at 100 TB both sides bucket by key "
    "and the join is exchange-free, with per-partition sub-counts "
    "rolling up exactly",
)
def q120(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    a = o.select(F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("va"))
    b = (
        o.filter(F.col("o_orderkey") % 97 != 0)
        .select(
            F.col("o_orderkey").alias("k"),
            F.when(F.col("o_orderkey") % 89 == 0, F.col("o_totalprice") + 1.00)
            .otherwise(F.col("o_totalprice"))
            .alias("vb"),
        )
    )
    j = a.join(b, "k", "full_outer")
    return j.agg(
        F.count_if(F.col("vb").isNull()).alias("n_removed"),
        F.count_if(F.col("va").isNull()).alias("n_added"),
        F.count_if(
            F.col("va").isNotNull() & F.col("vb").isNotNull() & (F.col("va") != F.col("vb"))
        ).alias("n_changed"),
        F.count_if(F.col("va") == F.col("vb")).alias("n_unchanged"),
    )


@_q(
    "q121_attribution",
    """WITH p AS (SELECT user_id, ts AS pts, event_id AS pid FROM events
         WHERE event_type = 'purchase'),
       c AS (SELECT user_id, ts AS cts, event_id AS cid FROM events
         WHERE event_type = 'click'),
       path AS (SELECT p.pid, c.cid,
         row_number() OVER (PARTITION BY p.pid ORDER BY c.cts, c.cid) AS rn,
         count(*) OVER (PARTITION BY p.pid) AS k
         FROM p JOIN c ON c.user_id = p.user_id
           AND c.cts <= p.pts AND c.cts > p.pts - INTERVAL 30 DAY),
       cr AS (SELECT pid, cid, k,
         CASE WHEN k = 1 THEN 1.0
              WHEN k = 2 THEN 0.5
              WHEN rn = 1 OR rn = k THEN 0.4
              ELSE 0.2 / (k - 2) END AS credit,
         CASE WHEN rn = 1 THEN 'first'
              WHEN rn = k THEN 'last' ELSE 'middle' END AS role
         FROM path)
       SELECT role, count(*) AS n_touches,
              CAST(count(DISTINCT pid) AS BIGINT) AS n_purchases,
              round(sum(credit), 4) AS credit
       FROM cr GROUP BY 1 ORDER BY 1""",
    note="position-based (U-shaped) marketing attribution: each "
    "purchase distributes one unit of credit over its 30-day click "
    "path — 40% to the first touch, 40% to the last, 20% split "
    "across the middle (collapsing to 1.0 / 0.5+0.5 for paths of "
    "1-2 clicks), so total credit == purchases with a path, an "
    "internal conservation check the query exposes.  The path join "
    "is keyed on user + a bounded time range (partition-prunable), "
    "positions come from one window per purchase; credits are exact "
    "rationals until the final rounding.  Complements s20's "
    "first-touch and t21's conversion funnel",
)
def q121(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"), F.col("event_id").alias("pid")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts"), F.col("event_id").alias("cid")
    )
    path = (
        p.join(
            c,
            (F.col("cu") == F.col("user_id"))
            & (F.col("cts") <= F.col("pts"))
            & (F.col("cts") > F.col("pts") - F.expr("INTERVAL 30 DAYS")),
        )
        .select("pid", "cid", "cts")
    )
    w = Window.partitionBy("pid").orderBy("cts", "cid")
    wk = Window.partitionBy("pid")
    cr = path.select(
        "pid",
        "cid",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wk).alias("k"),
    ).select(
        "pid",
        "cid",
        "k",
        F.when(F.col("k") == 1, 1.0)
        .when(F.col("k") == 2, 0.5)
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("k")), 0.4)
        .otherwise(F.lit(0.2) / (F.col("k") - 2))
        .alias("credit"),
        F.when(F.col("rn") == 1, "first")
        .when(F.col("rn") == F.col("k"), "last")
        .otherwise("middle")
        .alias("role"),
    )
    return (
        cr.groupBy("role")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.countDistinct("pid").alias("n_purchases"),
            F.round(F.sum("credit"), 4).alias("credit"),
        )
        .orderBy("role")
    )


@_q(
    "q122_cumulative_distinct",
    """WITH fs AS (SELECT user_id, min(date_trunc('day', ts)) AS first_day
         FROM events GROUP BY 1),
       nd AS (SELECT first_day, count(*) AS new_users FROM fs GROUP BY 1)
       SELECT strftime(first_day, '%Y-%m-%d') AS day,
              CAST(new_users AS BIGINT) AS new_users,
              CAST(sum(new_users) OVER (ORDER BY first_day) AS BIGINT) AS cum_users
       FROM nd ORDER BY 1""",
    note="cumulative distinct users over time (audience growth curve) "
    "via the first-seen trick: cumulative COUNT(DISTINCT) is not "
    "incrementally mergeable, but 'users whose FIRST event is <= d' "
    "is — one min-per-user groupBy, one tiny per-day rollup, one "
    "cumsum window over ~days rows.  The same rewrite is what makes "
    "the metric maintainable incrementally (new data can only add "
    "first-seen rows) and streaming-safe; at 100 TB the only "
    "fact-sized shuffle is the per-user min, map-side combined",
)
def q122(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    fs = ev.groupBy("user_id").agg(F.min(F.date_trunc("day", "ts")).alias("first_day"))
    nd = fs.groupBy("first_day").agg(F.count(F.lit(1)).alias("new_users"))
    w = Window.orderBy("first_day")
    return nd.select(
        F.date_format("first_day", "yyyy-MM-dd").alias("day"),
        F.col("new_users").cast("long").alias("new_users"),
        F.sum("new_users").over(w).cast("long").alias("cum_users"),
    ).orderBy("day")


_HLL_LZ_SQL = """CASE substring(h, p, 1)
        WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
        WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1
        ELSE 0 END"""


@_q(
    "q123_hll_deterministic",
    f"""WITH hx AS (SELECT md5(CAST(o_custkey AS VARCHAR)) AS m FROM
         (SELECT DISTINCT o_custkey FROM orders)),
       parts AS (SELECT
         (strpos('0123456789abcdef', substring(m, 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substring(m, 2, 1)) - 1) AS reg,
         substring(m, 3, 16) AS h FROM hx),
       pp AS (SELECT reg, h,
         coalesce(list_min(list_filter(list_transform(range(1, 17),
           i -> CASE WHEN substring(h, i::INT, 1) <> '0' THEN i::INT END),
           x -> x IS NOT NULL)), 17) AS p
         FROM parts),
       rho AS (SELECT reg,
         CASE WHEN p = 17 THEN 65
              ELSE 4 * (p - 1) + ({_HLL_LZ_SQL}) + 1 END AS rho
         FROM pp),
       regs AS (SELECT reg, max(rho) AS mj FROM rho GROUP BY 1),
       allr AS (SELECT r.i::INT AS reg, coalesce(regs.mj, 0) AS mj
                FROM range(256) r(i) LEFT JOIN regs ON regs.reg = r.i),
       s AS (SELECT sum(power(2.0, -mj)) AS z,
                    count(*) FILTER (WHERE mj = 0) AS v FROM allr),
       est AS (SELECT 0.7213 / (1 + 1.079 / 256) * 256 * 256 / z AS e_raw, v FROM s),
       fin AS (SELECT CASE WHEN e_raw <= 2.5 * 256 AND v > 0
                 THEN 256 * ln(256.0 / v) ELSE e_raw END AS e FROM est),
       ex AS (SELECT count(DISTINCT o_custkey) AS exact FROM orders)
       SELECT CAST(ex.exact AS BIGINT) AS exact,
              CAST(round(fin.e, 0) AS BIGINT) AS hll_estimate,
              round(abs(fin.e - ex.exact) / ex.exact, 4) AS rel_error
       FROM fin, ex""",
    note="HyperLogLog built from first principles, ORACLE-MATCHED "
    "(unlike q70's native approx_count_distinct, whose register "
    "layout is engine-private): 8-bit register index + "
    "leading-zero rank from md5 hex-digit arithmetic, max-merge per "
    "register, bias-corrected harmonic mean with the linear-counting "
    "small-range branch — every register value is an exact integer, "
    "so both engines land on the identical 256-register table and "
    "the identical estimate.  This is the MERGEABLE cardinality "
    "sketch: at 100 TB each partition max-merges its own 256 "
    "registers (map-side combine) and the driver folds 256 ints per "
    "partition — the mechanism q70 uses, here made auditable.  "
    "Measured rel_error lands within the ~1.04/sqrt(256) = 6.5% "
    "theory bound",
)
def q123(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    hx = o.select("o_custkey").distinct().select(
        F.md5(F.col("o_custkey").cast("string")).alias("m")
    )
    hexpos = lambda c: F.instr(F.lit("0123456789abcdef"), c) - 1  # noqa: E731
    parts = hx.select(
        (hexpos(F.substring("m", 1, 1)) * 16 + hexpos(F.substring("m", 2, 1))).alias(
            "reg"
        ),
        F.substring("m", 3, 16).alias("h"),
    )
    # position of first non-zero hex char in h (1..16), else 17
    p = F.coalesce(
        F.expr(
            "array_min(filter(transform(sequence(1, 16), "
            "i -> CASE WHEN substring(h, i, 1) <> '0' THEN i END), x -> x IS NOT NULL))"
        ),
        F.lit(17),
    )
    digit_lz = F.expr(
        "CASE substring(h, p, 1) "
        "WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2 "
        "WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1 "
        "ELSE 0 END"
    )
    rho = (
        parts.withColumn("p", p)
        .withColumn(
            "rho",
            F.when(F.col("p") == 17, F.lit(65)).otherwise(
                4 * (F.col("p") - 1) + digit_lz + 1
            ),
        )
        .select("reg", "rho")
    )
    regs = rho.groupBy("reg").agg(F.max("rho").alias("mj"))
    allr = (
        spark.range(256)
        .select(F.col("id").cast("int").alias("reg"))
        .join(regs, "reg", "left")
        .select(F.coalesce("mj", F.lit(0)).alias("mj"))
    )
    s = allr.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mj"))).alias("z"),
        F.count_if(F.col("mj") == 0).alias("v"),
    )
    est = s.select(
        (F.lit(0.7213 / (1 + 1.079 / 256)) * 256 * 256 / F.col("z")).alias("e_raw"),
        "v",
    )
    fin = est.select(
        F.when(
            (F.col("e_raw") <= 2.5 * 256) & (F.col("v") > 0),
            F.lit(256.0) * F.log(F.lit(256.0) / F.col("v")),
        )
        .otherwise(F.col("e_raw"))
        .alias("e")
    )
    ex = o.agg(F.countDistinct("o_custkey").alias("exact"))
    return fin.crossJoin(ex).select(
        F.col("exact").cast("long").alias("exact"),
        F.round("e", 0).cast("long").alias("hll_estimate"),
        F.round(F.abs(F.col("e") - F.col("exact")) / F.col("exact"), 4).alias(
            "rel_error"
        ),
    )


@_q(
    "t79_vwap",
    """SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS mon,
       CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS vol,
       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS vwap,
       round(avg(l_extendedprice), 4) AS avg_price
       FROM lineitem GROUP BY 1 ORDER BY 1""",
    note="volume-weighted average price per month beside the naive "
    "mean — the execution-quality benchmark of every trading/pricing "
    "pipeline, and a standing example of a RATIO-OF-SUMS aggregate: "
    "both numerator and denominator are distributive partial sums "
    "(map-side combined, mergeable across partitions), where a "
    "naive avg-of-ratios would be neither mergeable nor correct.  "
    "One scan, one shuffle on the month key",
)
def t79(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    return (
        li.groupBy(F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias("mon"))
        .agg(
            F.sum(F.floor(F.col("l_quantity") + 0.5).cast("long")).cast("long").alias("vol"),
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
                / F.sum("l_quantity"),
                4,
            ).alias("vwap"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        )
        .orderBy("mon")
    )


@_q(
    "t81_kaplan_meier",
    """WITH u AS (SELECT user_id, min(ts) AS t0,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp,
         max(ts) AS tl
       FROM events GROUP BY 1),
       dur AS (SELECT user_id,
         CASE WHEN tp IS NOT NULL THEN date_diff('day', t0, tp)
              ELSE date_diff('day', t0, tl) END AS t,
         CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
         FROM u WHERE tl > t0),
       et AS (SELECT t, count(*) AS d FROM dur WHERE ev = 1 GROUP BY 1),
       risk AS (SELECT et.t, et.d,
         (SELECT count(*) FROM dur WHERE dur.t >= et.t) AS n
         FROM et),
       km AS (SELECT t, n, d,
         exp(sum(ln(1.0 - d * 1.0 / n)) OVER (ORDER BY t)) AS s
         FROM risk WHERE d < n)
       SELECT CAST(t AS BIGINT) AS t_days, CAST(n AS BIGINT) AS n_risk,
              CAST(d AS BIGINT) AS d_events, round(s, 6) AS survival
       FROM km ORDER BY 1""",
    note="Kaplan-Meier survival estimate for time-to-first-purchase: "
    "users who never purchase are right-censored at their last "
    "observed event (their time at risk still counts in n_t — the "
    "thing a naive 'average days to purchase among purchasers' "
    "silently throws away); S(t) = prod(1 - d_t/n_t) computed as "
    "exp of an ORDERED cumulative sum of logs, so the product "
    "order is fixed by the window and both engines fold "
    "identically.  Risk counts and event counts are exact integers "
    "from one per-user min/max pass; the risk-set join is a tiny "
    "per-distinct-time aggregate.  The churn/conversion primitive "
    "of every subscription analytics stack",
)
def t81(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    u = ev.groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("tp"),
        F.max("ts").alias("tl"),
    )
    dur = u.filter(F.col("tl") > F.col("t0")).select(
        "user_id",
        F.when(
            F.col("tp").isNotNull(), F.datediff(F.col("tp"), F.col("t0"))
        )
        .otherwise(F.datediff(F.col("tl"), F.col("t0")))
        .alias("t"),
        F.when(F.col("tp").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    et = dur.filter(F.col("ev") == 1).groupBy("t").agg(F.count(F.lit(1)).alias("d"))
    d_only = dur.select(F.col("t").alias("td"))
    risk = (
        et.join(d_only, F.col("td") >= F.col("t"))
        .groupBy("t", "d")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy("t")
    km = (
        risk.filter(F.col("d") < F.col("n"))
        .withColumn(
            "s", F.exp(F.sum(F.log(1.0 - F.col("d") * 1.0 / F.col("n"))).over(w))
        )
    )
    return km.select(
        F.col("t").cast("long").alias("t_days"),
        F.col("n").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("d_events"),
        F.round("s", 6).alias("survival"),
    ).orderBy("t_days")


@_q(
    "q124_bounce_rate",
    """WITH g AS (SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS flag
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       s AS (SELECT user_id,
         sum(flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
         FROM g),
       per AS (SELECT user_id, session_id, count(*) AS n FROM s GROUP BY 1, 2),
       wk AS (SELECT count(*) AS n_sessions,
              count(*) FILTER (WHERE n = 1) AS n_bounces,
              round(avg(n * 1.0), 4) AS avg_events
              FROM per)
       SELECT CAST(n_sessions AS BIGINT) AS n_sessions,
              CAST(n_bounces AS BIGINT) AS n_bounces,
              round(n_bounces * 1.0 / n_sessions, 6) AS bounce_rate,
              avg_events
       FROM wk""",
    note="session bounce rate: single-event sessions over total "
    "sessions, on exactly t03's 30-minute-gap sessionization (same "
    "flag-cumsum windows, so the session universe is shared across "
    "the two queries by construction) — the first engagement metric "
    "every web/product analytics stack reports, with mean session "
    "depth alongside.  Two windows + two tiny aggregates; the "
    "session assignment is the only fact-sized pass and it is "
    "one partition-local sort per user key",
)
def q124(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import sessionize

    ev = Catalog(spark, sf_dir).table("events")
    sess = sessionize(ev, "user_id", "ts", 1800, tiebreak=["event_id"])
    per = sess.groupBy("user_id", "session_id").agg(F.count(F.lit(1)).alias("n"))
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.count_if(F.col("n") == 1).cast("long").alias("n_bounces"),
        F.round(
            F.count_if(F.col("n") == 1) * 1.0 / F.count(F.lit(1)), 6
        ).alias("bounce_rate"),
        F.round(F.avg(F.col("n") * 1.0), 4).alias("avg_events"),
    )


@_q(
    "q125_grouping_sets",
    """SELECT l_returnflag, l_linestatus, grouping(l_returnflag)::INT AS g1,
       grouping(l_linestatus)::INT AS g2, round(sum(l_quantity),2) AS q,
       count(*)::BIGINT AS n
       FROM lineitem
       GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                               (l_returnflag), (l_linestatus))
       ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3, 4""",
    note="explicit GROUPING SETS beside q12 ROLLUP / q13 CUBE: an "
    "arbitrary set list (here both one-dimension margins plus the "
    "cross, but NOT the grand total — exactly what neither rollup nor "
    "cube expresses), grouping() flags distinguishing structural NULLs. "
    "One Expand+aggregate pass in Spark, not one scan per set",
)
def q125(spark: SparkSession, sf_dir: str) -> DataFrame:
    Catalog(spark, sf_dir).table("lineitem").createOrReplaceTempView("q125_lineitem")
    return spark.sql(
        """SELECT l_returnflag, l_linestatus,
                  CAST(grouping(l_returnflag) AS INT) AS g1,
                  CAST(grouping(l_linestatus) AS INT) AS g2,
                  round(sum(l_quantity), 2) AS q, count(*) AS n
           FROM q125_lineitem
           GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                   (l_returnflag), (l_linestatus))
           ORDER BY l_returnflag ASC NULLS FIRST,
                    l_linestatus ASC NULLS FIRST, g1, g2"""
    )


_ALLEN_CASE = """CASE
  WHEN e1 < s2 THEN '01_precedes'
  WHEN e1 = s2 THEN '02_meets'
  WHEN s1 < s2 AND s2 < e1 AND e1 < e2 THEN '03_overlaps'
  WHEN s1 = s2 AND e1 < e2 THEN '04_starts'
  WHEN s2 < s1 AND e1 < e2 THEN '05_during'
  WHEN s2 < s1 AND e1 = e2 THEN '06_finishes'
  WHEN s1 = s2 AND e1 = e2 THEN '07_equals'
  WHEN e2 < s1 THEN '08_preceded_by'
  WHEN e2 = s1 THEN '09_met_by'
  WHEN s2 < s1 AND s1 < e2 AND e2 < e1 THEN '10_overlapped_by'
  WHEN s1 = s2 AND e2 < e1 THEN '11_started_by'
  WHEN s1 < s2 AND e2 < e1 THEN '12_contains'
  ELSE '13_finished_by' END"""


@_q(
    "q127_allen_relations",
    f"""WITH iv AS (SELECT o_custkey, o_orderkey, o_orderdate AS s,
         o_orderdate + INTERVAL 1 DAY * ((o_orderkey % 30) + 1) AS e
       FROM orders),
       pr AS (SELECT a.s AS s1, a.e AS e1, b.s AS s2, b.e AS e2
              FROM iv a JOIN iv b
              ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey)
       SELECT {_ALLEN_CASE} AS rel, count(*)::BIGINT AS n
       FROM pr GROUP BY 1 ORDER BY 1""",
    note="Allen's interval algebra, the FULL 13-relation form: t75's "
    "census canonicalizes pair order and collapses each converse into "
    "7 relations; here pairs are ordered by orderkey (a label, not a "
    "temporal canon), so the converses (preceded_by/met_by/"
    "overlapped_by/started_by/contains/finished_by) appear as "
    "first-class outcomes — the direction-aware vocabulary a temporal "
    "REASONER needs (\"a caused b\" is not \"b caused a\"), where "
    "t75's collapsed form only answers adjacency.  Mutually exclusive "
    "and jointly exhaustive by the shared CASE ladder; exact "
    "timestamp comparisons; per-customer equi-self-join, one "
    "map-side-combined histogram shuffle",
)
def q127(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    iv = o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").alias("s"),
        F.expr(
            "o_orderdate + make_interval(0, 0, 0, CAST(o_orderkey % 30 + 1 AS INT), 0, 0, 0)"
        ).alias("e"),
    )
    a = iv.select(
        F.col("o_custkey").alias("ck"),
        F.col("o_orderkey").alias("ka"),
        F.col("s").alias("s1"),
        F.col("e").alias("e1"),
    )
    b = iv.select(
        F.col("o_custkey").alias("ck"),
        F.col("o_orderkey").alias("kb"),
        F.col("s").alias("s2"),
        F.col("e").alias("e2"),
    )
    pr = a.join(b, "ck").filter(F.col("ka") < F.col("kb"))
    return (
        pr.select(F.expr(_ALLEN_CASE).alias("rel"))
        .groupBy("rel")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("rel")
    )


@_q(
    "q128_cusum_changepoint",
    """WITH e AS (SELECT user_id, ts, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
       FROM events WHERE user_id < 50),
       t AS (SELECT user_id, sum(cents) AS total, count(*) AS n FROM e GROUP BY 1),
       p AS (SELECT e.user_id, e.ts, e.event_id, t.n, t.total,
         sum(e.cents) OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id
           ROWS UNBOUNDED PRECEDING) AS pref,
         row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS i
       FROM e JOIN t USING (user_id)),
       c AS (SELECT user_id, ts, event_id, i, n,
         n * pref - i * total AS cus
       FROM p)
       SELECT user_id, i::BIGINT AS cp_index,
              strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS cp_ts,
              cus::BIGINT AS cusum_x_n
       FROM c
       QUALIFY row_number() OVER (PARTITION BY user_id
         ORDER BY abs(cus) DESC, i) = 1
       ORDER BY user_id""",
    note="CUSUM changepoint detection per user, EXACT INTEGER form: the "
    "classic statistic is max_i |prefix_i - i*mean|, which drags a "
    "float mean through a sequential sum; multiplying through by n "
    "gives C_i = n*prefix_i - i*total with every term a BIGINT (values "
    "first fixed to half-up cents), so the argmax is exact and "
    "partition-layout-proof — no distributed float mean can reorder "
    "the winner.  One window pass per user over (ts, event_id) total "
    "order + one count/sum aggregate; the level-shift detector a "
    "monitoring pipeline runs per entity, embarrassingly parallel "
    "across users.  Magnitudes: |C_i| <= n * total <= 1e5 events x "
    "1e7 cents — comfortably inside int64 at every sf",
)
def q128(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        Catalog(spark, sf_dir)
        .table("events")
        .filter(F.col("user_id") < 50)
        .select(
            "user_id",
            "ts",
            "event_id",
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
    )
    t = e.groupBy("user_id").agg(
        F.sum("cents").alias("total"), F.count(F.lit(1)).alias("n")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wi = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = (
        e.join(t, "user_id")
        .withColumn("pref", F.sum("cents").over(w))
        .withColumn("i", F.row_number().over(wi))
    )
    c = p.withColumn("cus", F.col("n") * F.col("pref") - F.col("i") * F.col("total"))
    wpick = Window.partitionBy("user_id").orderBy(F.abs(F.col("cus")).desc(), "i")
    return (
        c.withColumn("rn", F.row_number().over(wpick))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("i").cast("long").alias("cp_index"),
            ts_str(F.col("ts")).alias("cp_ts"),
            F.col("cus").cast("long").alias("cusum_x_n"),
        )
        .orderBy("user_id")
    )


@_q(
    "q129_unpivot",
    """WITH m AS (
         SELECT l_returnflag, 'quantity' AS measure, l_quantity AS v FROM lineitem
         UNION ALL
         SELECT l_returnflag, 'extendedprice', l_extendedprice FROM lineitem
         UNION ALL
         SELECT l_returnflag, 'discount', l_discount FROM lineitem
         UNION ALL
         SELECT l_returnflag, 'tax', l_tax FROM lineitem)
       SELECT l_returnflag, measure, count(*)::BIGINT AS n,
              round(sum(v), 2) AS total
       FROM m GROUP BY 1, 2 ORDER BY 1, 2""",
    note="UNPIVOT/melt — the inverse of q20's pivot: four measure "
    "columns become (measure, value) rows, then a long-form aggregate.  "
    "Spark side uses the native DataFrame.unpivot (wide->long without "
    "N self-reads: ONE scan emits all four rows per input via Expand, "
    "exactly like rollup's plan), oracle spells it as the dialect-safe "
    "UNION ALL.  The reshape every metrics store / feature-long-table "
    "pipeline needs; Expand keeps it map-side (no join, no extra "
    "scans), one combine shuffle for the aggregate",
)
def q129(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    long = li.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "v",
    ).withColumn(
        "measure",
        F.when(F.col("measure") == "l_quantity", "quantity")
        .when(F.col("measure") == "l_extendedprice", "extendedprice")
        .when(F.col("measure") == "l_discount", "discount")
        .otherwise("tax"),
    )
    return (
        long.groupBy("l_returnflag", "measure")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 2).alias("total"))
        .orderBy("l_returnflag", "measure")
    )


@_q(
    "q130_mann_kendall",
    """WITH m AS (SELECT o_orderpriority AS prio,
         date_trunc('month', o_orderdate) AS mon, count(*) AS c
       FROM orders GROUP BY 1, 2),
       pairs AS (SELECT a.prio, sign(b.c - a.c) AS sg
                 FROM m a JOIN m b ON a.prio = b.prio AND a.mon < b.mon),
       agg AS (SELECT prio, sum(sg)::BIGINT AS s_stat, count(*)::BIGINT AS n_pairs
               FROM pairs GROUP BY 1),
       nm AS (SELECT prio, count(*)::BIGINT AS n_months FROM m GROUP BY 1)
       SELECT nm.prio, nm.n_months, agg.s_stat,
              round(CAST(agg.s_stat AS DOUBLE) / agg.n_pairs, 4) AS tau
       FROM nm JOIN agg ON nm.prio = agg.prio
       ORDER BY nm.prio""",
    note="Mann-Kendall trend test per order priority over monthly order "
    "counts: S = sum over month pairs i<j of sign(c_j - c_i), the "
    "nonparametric is-this-series-trending statistic monitoring "
    "pipelines run per metric.  EXACT INTEGER S (sum of -1/0/+1) and "
    "exact pair count; Kendall tau = S / (n(n-1)/2) is one division "
    "of two exact ints, rounded 4dp.  The pairwise self-join is "
    "O(months^2) per series but months stays ~84 while rows grow — "
    "the aggregate-then-pair shape means 100 TB of raw orders first "
    "collapses to a tiny per-series frame (one map-side-combined "
    "shuffle), and the quadratic join runs on that; for very long "
    "series the O(n log n) inversion-count form would replace it",
)
def q130(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    m = (
        o.groupBy(
            F.col("o_orderpriority").alias("prio"),
            F.date_trunc("month", F.col("o_orderdate")).alias("mon"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    a = m.alias("a")
    b = m.alias("b")
    pairs = a.join(
        b,
        (F.col("a.prio") == F.col("b.prio")) & (F.col("a.mon") < F.col("b.mon")),
    ).select(
        F.col("a.prio").alias("prio"),
        F.signum(F.col("b.c") - F.col("a.c")).cast("long").alias("sg"),
    )
    agg = pairs.groupBy("prio").agg(
        F.sum("sg").alias("s_stat"), F.count(F.lit(1)).alias("n_pairs")
    )
    nm = m.groupBy("prio").agg(F.count(F.lit(1)).alias("n_months"))
    return (
        nm.join(agg, "prio")
        .select(
            "prio",
            "n_months",
            "s_stat",
            F.round(F.col("s_stat").cast("double") / F.col("n_pairs"), 4).alias("tau"),
        )
        .orderBy("prio")
    )


@_q(
    "q131_ks_two_sample",
    """WITH s AS (SELECT CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         c.c_mktsegment AS seg
       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')),
       cnt AS (SELECT cents,
         sum(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END) AS c1,
         sum(CASE WHEN seg = 'MACHINERY' THEN 1 ELSE 0 END) AS c2
       FROM s GROUP BY 1),
       cum AS (SELECT cents,
         sum(c1) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cum1,
         sum(c2) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cum2
       FROM cnt),
       tot AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM cnt)
       SELECT t.n1::BIGINT AS n1, t.n2::BIGINT AS n2,
              max(abs(t.n2 * c.cum1 - t.n1 * c.cum2))::BIGINT AS d_num,
              round(CAST(max(abs(t.n2 * c.cum1 - t.n1 * c.cum2)) AS DOUBLE)
                    / (t.n1 * t.n2), 6) AS ks_d
       FROM cum c CROSS JOIN tot t
       GROUP BY t.n1, t.n2""",
    note="two-sample Kolmogorov-Smirnov distance between BUILDING and "
    "MACHINERY customers' order totals, EXACT INTEGER carrier: the "
    "ECDF difference |F1(v) - F2(v)| is scaled through by n1*n2, so "
    "the sup is max|n2*cum1(v) - n1*cum2(v)| over the merged support "
    "— every term BIGINT, the argmax layout-proof; KS D itself is one "
    "division of exact ints rounded 6dp.  The distribution-shift gate "
    "a feature pipeline runs between cohorts.  Shape: one groupBy on "
    "value (map-side combined), one global-window cumsum over the "
    "DISTINCT value frame (small after collapse), one max — the raw "
    "join is broadcast (customer dim).  Magnitude: n2*cum1 <= n^2 ~ "
    "1e10 at sf1 — int64-safe through sf1000",
)
def q131(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    o = c.table("orders")
    cust = c.table("customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    s = o.join(F.broadcast(cust), o.o_custkey == cust.c_custkey).select(
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
        F.col("c_mktsegment").alias("seg"),
    )
    cnt = s.groupBy("cents").agg(
        F.sum(F.when(F.col("seg") == "BUILDING", 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("seg") == "MACHINERY", 1).otherwise(0)).alias("c2"),
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = cnt.select(
        "cents",
        F.sum("c1").over(w).alias("cum1"),
        F.sum("c2").over(w).alias("cum2"),
    )
    tot = cnt.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("n1", "n2")
        .agg(
            F.max(F.abs(F.col("n2") * F.col("cum1") - F.col("n1") * F.col("cum2")))
            .alias("d_num"),
            F.round(
                F.max(
                    F.abs(F.col("n2") * F.col("cum1") - F.col("n1") * F.col("cum2"))
                ).cast("double")
                / (F.col("n1") * F.col("n2")),
                6,
            ).alias("ks_d"),
        )
        .select(
            F.col("n1").cast("long").alias("n1"),
            F.col("n2").cast("long").alias("n2"),
            F.col("d_num").cast("long").alias("d_num"),
            "ks_d",
        )
    )


@_q(
    "q132_chi_square",
    """WITH base AS (SELECT c.c_mktsegment AS seg, o.o_orderpriority AS prio
       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
         AND o.o_orderdate < TIMESTAMP '1996-01-01'),
       cell AS (SELECT seg, prio, count(*) AS obs FROM base GROUP BY 1, 2),
       rt AS (SELECT seg, sum(obs) AS r FROM cell GROUP BY 1),
       ct AS (SELECT prio, sum(obs) AS c FROM cell GROUP BY 1),
       n AS (SELECT sum(obs) AS n FROM cell),
       terms AS (SELECT
         CAST(floor(1e6 * CAST((n.n * cell.obs - rt.r * ct.c)
                                * (n.n * cell.obs - rt.r * ct.c) AS DOUBLE)
                        / (n.n * rt.r * ct.c) + 0.5) AS BIGINT) AS t_x1m
       FROM cell JOIN rt ON cell.seg = rt.seg
       JOIN ct ON cell.prio = ct.prio CROSS JOIN n)
       SELECT (SELECT count(*) FROM rt)::BIGINT AS n_rows,
              (SELECT count(*) FROM ct)::BIGINT AS n_cols,
              ((SELECT count(*) FROM rt) - 1)
                * ((SELECT count(*) FROM ct) - 1) AS dof,
              sum(t_x1m)::BIGINT AS chi2_x1m
       FROM terms""",
    note="chi-square independence test of market segment vs order "
    "priority on one order-year, EXACT INTEGER protocol: each cell's "
    "(O-E)^2/E is rewritten as (N*O - r*c)^2 / (N*r*c) — numerator an "
    "exact BIGINT (then exactly representable as double: the year "
    "filter bounds N*O < 2e8 so diff^2 < 2^53 through sf1), one "
    "double division per cell, scaled x1e6 and floored half-up to "
    "BIGINT, then SUMMED AS INTEGERS so accumulation order cannot "
    "drift.  The 'is this categorical feature independent of that "
    "label' screen.  Shape: one broadcast dim join, one cell groupBy "
    "(25 cells), row/col margins from the cell frame — everything "
    "after the first combine is tiny",
)
def q132(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    o = c.table("orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    cust = c.table("customer")
    base = o.join(F.broadcast(cust), o.o_custkey == cust.c_custkey).select(
        F.col("c_mktsegment").alias("seg"), F.col("o_orderpriority").alias("prio")
    )
    cell = base.groupBy("seg", "prio").agg(F.count(F.lit(1)).alias("obs"))
    rt = cell.groupBy("seg").agg(F.sum("obs").alias("r"))
    ct = cell.groupBy("prio").agg(F.sum("obs").alias("c"))
    n = cell.agg(F.sum("obs").alias("n"))
    diff = F.col("n") * F.col("obs") - F.col("r") * F.col("c")
    terms = (
        cell.join(F.broadcast(rt), "seg")
        .join(F.broadcast(ct), "prio")
        .crossJoin(F.broadcast(n))
        .select(
            F.floor(
                F.lit(1e6)
                * (diff * diff).cast("double")
                / (F.col("n") * F.col("r") * F.col("c"))
                + 0.5
            )
            .cast("long")
            .alias("t_x1m")
        )
    )
    nr = rt.agg(F.count(F.lit(1)).alias("n_rows"))
    nc = ct.agg(F.count(F.lit(1)).alias("n_cols"))
    return (
        terms.agg(F.sum("t_x1m").alias("chi2_x1m"))
        .crossJoin(F.broadcast(nr))
        .crossJoin(F.broadcast(nc))
        .select(
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_cols").cast("long").alias("n_cols"),
            ((F.col("n_rows") - 1) * (F.col("n_cols") - 1)).alias("dof"),
            F.col("chi2_x1m").cast("long").alias("chi2_x1m"),
        )
    )


@_q(
    "q133_mann_whitney",
    """WITH s AS (SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS v,
         l_linestatus AS grp FROM lineitem WHERE l_linestatus IN ('O', 'F')),
       cnt AS (SELECT v,
         sum(CASE WHEN grp = 'O' THEN 1 ELSE 0 END) AS c1,
         sum(CASE WHEN grp = 'F' THEN 1 ELSE 0 END) AS c2
       FROM s GROUP BY 1),
       cum AS (SELECT v, c1, c2, c1 + c2 AS c,
         sum(c1 + c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
           - (c1 + c2) AS before
       FROM cnt),
       tot AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM cnt)
       SELECT t.n1::BIGINT AS n1, t.n2::BIGINT AS n2,
              (sum(c.c1 * (2 * c.before + c.c + 1)) - t.n1 * (t.n1 + 1))::BIGINT
                AS u1_x2,
              sum(c.c * c.c * c.c - c.c)::BIGINT AS tie_term
       FROM cum c CROSS JOIN tot t
       GROUP BY t.n1, t.n2""",
    note="Mann-Whitney U rank-sum test ('O' vs 'F' line status over "
    "quantities) — the HYPOTHESIS-TEST framing of the rank-sum "
    "identity l86 uses for ROC AUC: l86 emits the ranking metric, "
    "this emits the test statistic PLUS the tie-correction term "
    "sum(t^3 - t) the variance/z-score needs, over a value-collapsed "
    "frame instead of l86's per-row ranks.  EXACT INTEGER carrier: "
    "average ranks under ties are "
    "half-integers, so everything is carried x2 — for a tie group of "
    "size c starting after `before` items, 2*avg_rank = 2*before + c "
    "+ 1, hence 2*R1 = sum c1*(2*before + c + 1) and U1*2 = 2R1 - "
    "n1(n1+1), all BIGINT; the tie-correction term sum(t^3 - t) for "
    "the variance is emitted as an exact integer too.  The "
    "nonparametric are-these-cohorts-different test run per feature.  "
    "Shape: one value-groupBy collapse (50 distinct quantities), one "
    "window cumsum on the collapsed frame, one aggregate — raw scan "
    "is a single map-side-combined shuffle regardless of row count; "
    "2R1 <= 2n^2 ~ 1e13 at sf1, int64-safe",
)
def q133(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem").filter(
        F.col("l_linestatus").isin("O", "F")
    )
    s = li.select(
        F.floor(F.col("l_quantity") + 0.5).cast("long").alias("v"),
        F.col("l_linestatus").alias("grp"),
    )
    cnt = s.groupBy("v").agg(
        F.sum(F.when(F.col("grp") == "O", 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("grp") == "F", 1).otherwise(0)).alias("c2"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = cnt.select(
        "v",
        "c1",
        "c2",
        (F.col("c1") + F.col("c2")).alias("c"),
        (F.sum(F.col("c1") + F.col("c2")).over(w) - (F.col("c1") + F.col("c2"))).alias(
            "before"
        ),
    )
    tot = cnt.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("n1", "n2")
        .agg(
            (
                F.sum(F.col("c1") * (2 * F.col("before") + F.col("c") + 1))
                - F.col("n1") * (F.col("n1") + 1)
            ).alias("u1_x2"),
            F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c")).alias("tie_term"),
        )
        .select(
            F.col("n1").cast("long").alias("n1"),
            F.col("n2").cast("long").alias("n2"),
            F.col("u1_x2").cast("long").alias("u1_x2"),
            F.col("tie_term").cast("long").alias("tie_term"),
        )
    )


@_q(
    "q134_association_rules",
    """WITH bask AS (SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS item
       FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
       n AS (SELECT count(DISTINCT ok) AS n FROM bask),
       ic AS (SELECT item, count(*) AS c FROM bask GROUP BY 1),
       pr AS (SELECT a.item AS ante, b.item AS cons, count(*) AS cab
              FROM bask a JOIN bask b ON a.ok = b.ok AND a.item <> b.item
              GROUP BY 1, 2 HAVING count(*) >= 20)
       SELECT pr.ante, pr.cons, ca.c::BIGINT AS ca, cb.c::BIGINT AS cb,
              pr.cab::BIGINT AS cab,
              CAST(floor(1e6 * CAST(pr.cab AS DOUBLE) / ca.c + 0.5) AS BIGINT)
                AS conf_x1m,
              CAST(floor(1e6 * CAST(n.n * pr.cab AS DOUBLE) / (ca.c * cb.c) + 0.5)
                AS BIGINT) AS lift_x1m
       FROM pr JOIN ic ca ON ca.item = pr.ante
       JOIN ic cb ON cb.item = pr.cons CROSS JOIN n
       ORDER BY lift_x1m DESC, ante, cons LIMIT 50""",
    note="directed association rules over order baskets of part brands "
    "(Agrawal/Srikant shape): support count, confidence = "
    "supp(A,B)/supp(A) and lift = N*supp(A,B)/(supp(A)*supp(B)), both "
    "carried as floor-half-up x1e6 BIGINTs so ranking and comparison "
    "are layout-proof — g38's co-purchase projection gives the "
    "undirected pair graph, this adds the RULE layer (direction, "
    "min-support pruning, the metrics an item-recommendation / "
    "feature-co-occurrence screen thresholds on).  N*cab <= 2e10 at "
    "sf0.1 — double-exact (< 2^53) through sf100.  Shape: basket "
    "distinct + item counts are map-side combined; the pair join is "
    "quadratic per basket but TPC-H baskets are <=7 items (per-basket "
    "size cap is the 100 TB guard, as g38 documents); pair frame "
    "collapses to |brands|^2 = 600 rows before the metric math",
)
def q134(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    li = c.table("lineitem")
    p = c.table("part")
    bask = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("item"))
        .distinct()
    )
    n_ = bask.select("ok").distinct().count()
    ic = bask.groupBy("item").agg(F.count(F.lit(1)).alias("c"))
    a = bask.alias("a")
    b = bask.alias("b")
    pr = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.item") != F.col("b.item")))
        .groupBy(F.col("a.item").alias("ante"), F.col("b.item").alias("cons"))
        .agg(F.count(F.lit(1)).alias("cab"))
        .filter(F.col("cab") >= 20)
    )
    ca = ic.select(F.col("item").alias("ante"), F.col("c").alias("ca"))
    cb = ic.select(F.col("item").alias("cons"), F.col("c").alias("cb"))
    return (
        pr.join(F.broadcast(ca), "ante")
        .join(F.broadcast(cb), "cons")
        .select(
            "ante",
            "cons",
            F.col("ca").cast("long").alias("ca"),
            F.col("cb").cast("long").alias("cb"),
            F.col("cab").cast("long").alias("cab"),
            F.floor(F.lit(1e6) * F.col("cab").cast("double") / F.col("ca") + 0.5)
            .cast("long")
            .alias("conf_x1m"),
            F.floor(
                F.lit(1e6)
                * (F.lit(n_) * F.col("cab")).cast("double")
                / (F.col("ca") * F.col("cb"))
                + 0.5
            )
            .cast("long")
            .alias("lift_x1m"),
        )
        .orderBy(F.col("lift_x1m").desc(), "ante", "cons")
        .limit(50)
    )


@_q(
    "t82_holt_linear",
    """WITH RECURSIVE r AS (SELECT user_id AS k, value AS x,
         row_number() OVER (PARTITION BY user_id
           ORDER BY ts, event_id) AS rn
       FROM events WHERE user_id < 100),
       n AS (SELECT k, CAST(max(rn) AS BIGINT) AS n_events FROM r GROUP BY 1),
       w(k, rn, l, b) AS (
         SELECT k, rn, x, CAST(0.0 AS DOUBLE) FROM r WHERE rn = 1
         UNION ALL
         SELECT r.k, r.rn,
                0.3 * r.x + 0.7 * (w.l + w.b),
                0.1 * ((0.3 * r.x + 0.7 * (w.l + w.b)) - w.l) + 0.9 * w.b
         FROM w JOIN r ON r.k = w.k AND r.rn = w.rn + 1)
       SELECT w.k AS user_id, n.n_events,
         round(w.l, 6) AS level, round(w.b, 6) AS trend,
         round(w.l + w.b, 6) AS forecast_1
       FROM w JOIN n ON n.k = w.k AND w.rn = n.n_events
       ORDER BY 1""",
    note="Holt double-exponential smoothing per user (alpha=0.3 level, "
    "beta=0.1 trend, b1=0): l' = a*x + (1-a)*(l+b); b' = "
    "beta*(l'-l) + (1-beta)*b — the trend-aware forecaster beside "
    "t76's flat EWMA, emitting the one-step-ahead forecast l+b a "
    "capacity-planning pipeline alerts on.  Same determinism "
    "contract as t76: BOTH engines replay the literal IEEE double "
    "recurrence in identical operation order (applyInPandas ordered "
    "fold vs recursive CTE), so trajectories are bit-identical, "
    "6dp rounding only at the output edge.  State per key is two "
    "doubles; one shuffle on the entity key; embarrassingly "
    "parallel across users at any scale",
)
def t82(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = (
        Catalog(spark, sf_dir)
        .table("events")
        .filter(F.col("user_id") < 100)
        .select("user_id", "ts", "event_id", "value")
    )

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        lvl = b = None
        for x in pdf["value"]:
            if lvl is None:
                lvl, b = float(x), 0.0
            else:
                new_l = 0.3 * float(x) + 0.7 * (lvl + b)
                b = 0.1 * (new_l - lvl) + 0.9 * b
                lvl = new_l
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [len(pdf)],
                "level": [lvl],
                "trend": [b],
            }
        )

    return (
        ev.groupBy("user_id")
        .applyInPandas(holt, "user_id long, n_events long, level double, trend double")
        .select(
            "user_id",
            "n_events",
            F.round("level", 6).alias("level"),
            F.round("trend", 6).alias("trend"),
            F.round(F.col("level") + F.col("trend"), 6).alias("forecast_1"),
        )
        .orderBy("user_id")
    )


def _synthetic_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic integer geometry for the spatial family: customers
    placed on a 10000x10000 grid by md5 of their key (the data has no
    geo columns)."""
    cust = Catalog(spark, sf_dir).table("customer")

    def hv(salt: str):
        return F.conv(
            F.substring(F.md5(F.concat(F.col("c_custkey").cast("string"), F.lit(salt))), 1, 15),
            16,
            10,
        ).cast("long")

    return cust.select(
        F.col("c_custkey").alias("id"),
        (hv(":x") % 10000).alias("x"),
        (hv(":y") % 10000).alias("y"),
    )


@_q(
    "q135_spatial_grid_join",
    """WITH pts AS (SELECT c_custkey AS id,
         ('0x' || substring(md5(c_custkey::VARCHAR || ':x'), 1, 15))::BIGINT
           % 10000 AS x,
         ('0x' || substring(md5(c_custkey::VARCHAR || ':y'), 1, 15))::BIGINT
           % 10000 AS y
       FROM customer),
       a AS (SELECT id, x, y, x // 250 AS cx, y // 250 AS cy FROM pts),
       b AS (SELECT id, x, y, x // 250 + d1.dx AS cx, y // 250 + d2.dy AS cy
             FROM pts
             CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dx) d1
             CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dy) d2),
       pairs AS (SELECT a.id AS a, b.id AS b,
           (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
         FROM a JOIN b ON a.cx = b.cx AND a.cy = b.cy AND a.id < b.id
         WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 10000)
       SELECT a, b, d2::BIGINT AS d2,
              (SELECT count(*) FROM pairs)::BIGINT AS n_pairs
       FROM pairs ORDER BY d2, a, b LIMIT 20""",
    note="distance-radius spatial self-join via grid bucketing — the "
    "scale-safe shape for 'find all point pairs within r': points "
    "land in 250-unit cells (cell >= radius so candidates live in "
    "the 3x3 neighborhood), one side replicates to its 9 neighbor "
    "cells, candidates come from a cell EQUI-JOIN (never a cross "
    "join), exact filter on integer squared distance.  Each "
    "qualifying pair matches in exactly ONE (A-cell, B-replica) "
    "combination so no post-dedup is needed.  Coordinates are "
    "md5-derived integers (deterministic synthetic geometry; the "
    "data has no geo columns), so d2 and the top-20 ordering are "
    "pure BIGINT.  This is the geohash/S2 bucketing pattern: at "
    "100 TB the 9x replication is the constant-factor price that "
    "turns an O(n^2) radius search into a shuffle-bound equi-join, "
    "with cell size tuned to density and AQE absorbing hot cells",
)
def q135(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.spatial import grid_radius_pairs

    pts = _synthetic_points(spark, sf_dir)
    pairs = grid_radius_pairs(pts, cell=250, radius2=10000)
    np_ = pairs.agg(F.count(F.lit(1)).alias("n_pairs"))
    return (
        pairs.crossJoin(F.broadcast(np_))
        .select("a", "b", F.col("d2").cast("long").alias("d2"),
                F.col("n_pairs").cast("long").alias("n_pairs"))
        .orderBy("d2", "a", "b")
        .limit(20)
    )


@_q(
    "q136_spearman",
    """WITH s AS (SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS q,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS p
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1995-01-01'
         AND l_shipdate < TIMESTAMP '1996-01-01'),
       qc AS (SELECT q AS v, count(*) AS c FROM s GROUP BY 1),
       qr AS (SELECT v, 2 * (sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                - c) + c + 1 AS r2 FROM qc),
       pc AS (SELECT p AS v, count(*) AS c FROM s GROUP BY 1),
       pr AS (SELECT v, 2 * (sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                - c) + c + 1 AS r2 FROM pc),
       rk AS (SELECT qr.r2 AS x, pr.r2 AS y FROM s
              JOIN qr ON qr.v = s.q JOIN pr ON pr.v = s.p),
       agg AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
               sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
               FROM rk)
       SELECT n::BIGINT AS n, sx::BIGINT AS sx, sy::BIGINT AS sy,
         round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                      * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
           AS rho
       FROM agg""",
    note="Spearman rank correlation between quantity and extended price "
    "(one ship-year), tie-aware: average ranks are carried x2 as "
    "EXACT BIGINTs via the q133 identity (2*avg_rank = 2*before + c "
    "+ 1 per tied value group), all five power sums are exact "
    "integers, and rho is Pearson-on-ranks evaluated as ONE double "
    "expression over those exact sums — identical operand doubles "
    "and operation order both engines, so the 6dp rounding is "
    "cosmetic.  The monotonic-association screen (vs q40's linear "
    "corr) a feature-selection pass runs per pair.  Shape: two "
    "value-collapse groupBys + windows on the collapsed frames, two "
    "hash joins back (the quantity side broadcasts at 50 rows), one "
    "combine aggregate.  Sxy <= 4n^3: int64-safe to ~1.3M rows — "
    "the year filter keeps n inside that through sf1",
)
def q136(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    s = li.select(
        F.floor(F.col("l_quantity") + 0.5).cast("long").alias("q"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long").alias("p"),
    )

    def rank2(col: str) -> DataFrame:
        cnt = s.groupBy(F.col(col).alias("v")).agg(F.count(F.lit(1)).alias("c"))
        w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
        return cnt.select(
            "v",
            (2 * (F.sum("c").over(w) - F.col("c")) + F.col("c") + 1).alias("r2"),
        )

    qr = rank2("q").select(F.col("v").alias("q"), F.col("r2").alias("x"))
    pr = rank2("p").select(F.col("v").alias("p"), F.col("r2").alias("y"))
    rk = s.join(F.broadcast(qr), "q").join(pr, "p")
    agg = rk.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("sx").cast("long").alias("sx"),
        F.col("sy").cast("long").alias("sy"),
        F.round(
            (nd * F.col("sxy") - sxd * F.col("sy"))
            / F.sqrt(
                (nd * F.col("sxx") - sxd * F.col("sx"))
                * (nd * F.col("syy") - syd * F.col("sy"))
            ),
            6,
        ).alias("rho"),
    )


@_q(
    "q137_moments",
    """WITH s AS (SELECT l_returnflag AS flag,
         CAST(floor(l_quantity + 0.5) AS BIGINT) AS q FROM lineitem),
       agg AS (SELECT flag, count(*) AS n, sum(q) AS s1, sum(q * q) AS s2,
               sum(q * q * q) AS s3, sum(q * q * q * q) AS s4
               FROM s GROUP BY 1)
       SELECT flag, n::BIGINT AS n, s1::BIGINT AS s1, s2::BIGINT AS s2,
              s3::BIGINT AS s3, s4::BIGINT AS s4,
         round(((CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * s3
                 - 3.0 * CAST(n AS DOUBLE) * CAST(s1 AS DOUBLE) * s2
                 + 2.0 * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) * s1)
                / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
               / pow((CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
                     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 1.5), 6)
           AS skewness,
         round(((CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * s4
                 - 4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                   * CAST(s1 AS DOUBLE) * s3
                 + 6.0 * CAST(n AS DOUBLE) * CAST(s1 AS DOUBLE)
                   * CAST(s1 AS DOUBLE) * s2
                 - 3.0 * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                   * CAST(s1 AS DOUBLE) * s1)
                / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                   * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
               / pow((CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
                     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 2.0) - 3.0, 6)
           AS ex_kurtosis
       FROM agg ORDER BY flag""",
    note="exact power sums S1..S4 per return flag (BIGINT — quantities "
    "are <=50 so q^4 sums stay ~1e13/1e15 at sf0.1/sf10) with "
    "skewness and excess kurtosis derived from them in ONE fixed "
    "double expression: m3 = (n^2*S3 - 3n*S1*S2 + 2*S1^3)/n^3, m4 "
    "analogous, both engines consume the SAME exact integers in the "
    "SAME operation order, so the only float work is a handful of "
    "scalar ops per group.  This is the streaming/mergeable moments "
    "pattern (power sums are distributive — partial-aggregate "
    "friendly, the reason Welford isn't needed in a combine tree); "
    "the shape-of-distribution profile a feature store keeps per "
    "column.  One map-side-combined shuffle, 3 output rows",
)
def q137(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    s = li.select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_quantity") + 0.5).cast("long").alias("q"),
    )
    agg = s.groupBy("flag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("s1"),
        F.sum(F.col("q") * F.col("q")).alias("s2"),
        F.sum(F.col("q") * F.col("q") * F.col("q")).alias("s3"),
        F.sum(F.col("q") * F.col("q") * F.col("q") * F.col("q")).alias("s4"),
    )
    nd = F.col("n").cast("double")
    s1d = F.col("s1").cast("double")
    m2 = (nd * F.col("s2") - s1d * F.col("s1")) / (nd * nd)
    m3 = (nd * nd * F.col("s3") - 3.0 * nd * s1d * F.col("s2") + 2.0 * s1d * s1d * F.col("s1")) / (
        nd * nd * nd
    )
    m4 = (
        nd * nd * nd * F.col("s4")
        - 4.0 * nd * nd * s1d * F.col("s3")
        + 6.0 * nd * s1d * s1d * F.col("s2")
        - 3.0 * s1d * s1d * s1d * F.col("s1")
    ) / (nd * nd * nd * nd)
    return agg.select(
        "flag",
        F.col("n").cast("long").alias("n"),
        F.col("s1").cast("long").alias("s1"),
        F.col("s2").cast("long").alias("s2"),
        F.col("s3").cast("long").alias("s3"),
        F.col("s4").cast("long").alias("s4"),
        F.round(m3 / F.pow(m2, 1.5), 6).alias("skewness"),
        F.round(m4 / F.pow(m2, 2.0) - 3.0, 6).alias("ex_kurtosis"),
    ).orderBy("flag")


@_q(
    "q138_boxplot_fences",
    """WITH s AS (SELECT l_returnflag AS flag,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c FROM lineitem),
       vc AS (SELECT flag, c AS v, count(*) AS cnt FROM s GROUP BY 1, 2),
       cum AS (SELECT flag, v, cnt,
         sum(cnt) OVER (PARTITION BY flag ORDER BY v
           ROWS UNBOUNDED PRECEDING) AS cm FROM vc),
       tot AS (SELECT flag, sum(cnt) AS n FROM vc GROUP BY 1),
       qs AS (SELECT c.flag, t.n,
         min(CASE WHEN c.cm >= (t.n + 3) // 4 THEN c.v END) AS q1,
         min(CASE WHEN c.cm >= (t.n + 1) // 2 THEN c.v END) AS med,
         min(CASE WHEN c.cm >= (3 * t.n + 3) // 4 THEN c.v END) AS q3
       FROM cum c JOIN tot t ON t.flag = c.flag GROUP BY 1, 2),
       fl AS (SELECT flag, n, q1, med, q3,
              5 * q1 - 3 * q3 AS lo2, 5 * q3 - 3 * q1 AS hi2 FROM qs)
       SELECT f.flag, f.n::BIGINT AS n, f.q1::BIGINT AS q1_cents,
              f.med::BIGINT AS med_cents, f.q3::BIGINT AS q3_cents,
              sum(CASE WHEN 2 * c.v < f.lo2 THEN c.cnt ELSE 0 END)::BIGINT
                AS n_out_lo,
              sum(CASE WHEN 2 * c.v > f.hi2 THEN c.cnt ELSE 0 END)::BIGINT
                AS n_out_hi
       FROM fl f JOIN vc c ON c.flag = f.flag
       GROUP BY 1, 2, 3, 4, 5 ORDER BY 1""",
    note="boxplot profile with Tukey fences per return flag, fully "
    "EXACT: type-1 quartiles are the k-th order statistics (k = "
    "ceil(p*n) via integer ceilings) read off the value-collapsed "
    "cumulative frame — no interpolation convention to disagree on — "
    "and the 1.5*IQR fences are carried x2 so lo2 = 5*q1 - 3*q3 and "
    "hi2 = 5*q3 - 3*q1 stay BIGINT; outlier census = one conditional "
    "sum over the collapsed frame.  The per-column outlier screen a "
    "data-cleaning pass runs (q27 reports percentiles; this adds the "
    "fence + census layer).  Shape: one map-side-combined value "
    "collapse, windows on the collapsed frame, one join back — "
    "corpus-size-independent after the first shuffle; cents x5 "
    "stays far inside int64",
)
def q138(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    s = li.select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long").alias("c"),
    )
    vc = s.groupBy("flag", F.col("c").alias("v")).agg(F.count(F.lit(1)).alias("cnt"))
    w = (
        Window.partitionBy("flag")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = vc.select("flag", "v", "cnt", F.sum("cnt").over(w).alias("cm"))
    tot = vc.groupBy("flag").agg(F.sum("cnt").alias("n"))
    c2 = cum.join(F.broadcast(tot), "flag")

    def kth(kexpr):
        return F.min(F.when(F.col("cm") >= kexpr, F.col("v")))

    qs = c2.groupBy("flag", "n").agg(
        kth(((F.col("n") + 3) / 4).cast("long")).alias("q1"),
        kth(((F.col("n") + 1) / 2).cast("long")).alias("med"),
        kth(((3 * F.col("n") + 3) / 4).cast("long")).alias("q3"),
    )
    fl = qs.select(
        "flag",
        "n",
        "q1",
        "med",
        "q3",
        (5 * F.col("q1") - 3 * F.col("q3")).alias("lo2"),
        (5 * F.col("q3") - 3 * F.col("q1")).alias("hi2"),
    )
    return (
        F.broadcast(fl)
        .join(vc, "flag")
        .groupBy("flag", "n", "q1", "med", "q3")
        .agg(
            F.sum(F.when(2 * F.col("v") < F.col("lo2"), F.col("cnt")).otherwise(0))
            .alias("n_out_lo"),
            F.sum(F.when(2 * F.col("v") > F.col("hi2"), F.col("cnt")).otherwise(0))
            .alias("n_out_hi"),
        )
        .select(
            "flag",
            F.col("n").cast("long").alias("n"),
            F.col("q1").cast("long").alias("q1_cents"),
            F.col("med").cast("long").alias("med_cents"),
            F.col("q3").cast("long").alias("q3_cents"),
            F.col("n_out_lo").cast("long").alias("n_out_lo"),
            F.col("n_out_hi").cast("long").alias("n_out_hi"),
        )
        .orderBy("flag")
    )


@_q(
    "t83_seasonal_decompose",
    """WITH d AS (SELECT date_trunc('day', o_orderdate) AS day, count(*) AS n
       FROM orders GROUP BY 1),
       w AS (SELECT day, n,
         (dayofweek(day) + 1)::INT AS dow,
         sum(n) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
           AS sum7,
         count(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
           AS w7
       FROM d),
       t AS (SELECT day, n, dow,
         CASE WHEN w7 = 7 THEN sum7 END AS sum7,
         CASE WHEN w7 = 7 THEN 7 * n - sum7 END AS detrend_x7
       FROM w),
       s AS (SELECT dow, count(*) AS c_days,
             sum(detrend_x7) AS s_dow_x7
       FROM t WHERE detrend_x7 IS NOT NULL GROUP BY 1)
       SELECT t.dow, s.c_days::BIGINT AS c_days, s.s_dow_x7::BIGINT AS s_dow_x7,
              round(CAST(s.s_dow_x7 AS DOUBLE) / (7 * s.c_days), 4) AS seasonal,
              count(*)::BIGINT AS n_days, sum(t.n)::BIGINT AS n_orders,
              sum(t.sum7)::BIGINT AS sum_trend_x7
       FROM t JOIN s ON s.dow = t.dow
       GROUP BY 1, 2, 3, 4 ORDER BY 1""",
    note="classical additive seasonal decomposition of the daily order "
    "series, EXACT INTEGER carriers end-to-end: trend is the centered "
    "7-day moving SUM (kept as the integer sum7 rather than a float "
    "mean; edge days with partial windows are NULLed exactly like "
    "statsmodels' two-sided default), the detrended series is carried "
    "x7 (7*n - sum7, BIGINT), and the day-of-week seasonal component "
    "is the exact ratio s_dow_x7 / (7*c_days) — one division at the "
    "output edge, 4dp.  The weekly-seasonality profile a forecasting "
    "pipeline subtracts before anomaly detection (t74 POT, q128 "
    "CUSUM operate on exactly such residuals).  Shape: one "
    "map-side-combined day collapse (365*years rows at ANY sf), one "
    "ordered window over the collapsed frame, one dow aggregate — "
    "corpus-size-independent after the first shuffle",
)
def t83(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    d = o.groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    win = Window.orderBy("day").rowsBetween(-3, 3)
    w = d.select(
        "day",
        "n",
        F.dayofweek("day").cast("int").alias("dow"),
        F.sum("n").over(win).alias("sum7"),
        F.count(F.lit(1)).over(win).alias("w7"),
    )
    t = w.select(
        "day",
        "n",
        "dow",
        F.when(F.col("w7") == 7, F.col("sum7")).alias("sum7"),
        F.when(F.col("w7") == 7, 7 * F.col("n") - F.col("sum7")).alias("detrend_x7"),
    )
    s = (
        t.filter(F.col("detrend_x7").isNotNull())
        .groupBy("dow")
        .agg(
            F.count(F.lit(1)).alias("c_days"),
            F.sum("detrend_x7").alias("s_dow_x7"),
        )
    )
    return (
        t.join(F.broadcast(s), "dow")
        .groupBy(
            "dow",
            F.col("c_days").cast("long").alias("c_days"),
            F.col("s_dow_x7").cast("long").alias("s_dow_x7"),
            F.round(
                F.col("s_dow_x7").cast("double") / (7 * F.col("c_days")), 4
            ).alias("seasonal"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("n").alias("n_orders"),
            F.sum("sum7").alias("sum_trend_x7"),
        )
        .select(
            "dow",
            "c_days",
            "s_dow_x7",
            "seasonal",
            F.col("n_days").cast("long").alias("n_days"),
            F.col("n_orders").cast("long").alias("n_orders"),
            F.col("sum_trend_x7").cast("long").alias("sum_trend_x7"),
        )
        .orderBy("dow")
    )


@_q(
    "q139_wasserstein",
    """WITH s AS (SELECT CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         c.c_mktsegment AS seg
       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')),
       cnt AS (SELECT cents,
         sum(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END) AS c1,
         sum(CASE WHEN seg = 'MACHINERY' THEN 1 ELSE 0 END) AS c2
       FROM s GROUP BY 1),
       cum AS (SELECT cents,
         sum(c1) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cum1,
         sum(c2) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cum2,
         lead(cents) OVER (ORDER BY cents) AS nxt
       FROM cnt),
       tot AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM cnt)
       SELECT t.n1::BIGINT AS n1, t.n2::BIGINT AS n2,
              sum(abs(t.n2 * c.cum1 - t.n1 * c.cum2)
                  * (c.nxt - c.cents))::BIGINT AS w1_num,
              round(CAST(sum(abs(t.n2 * c.cum1 - t.n1 * c.cum2)
                             * (c.nxt - c.cents)) AS DOUBLE)
                    / (t.n1 * t.n2 * 100.0), 4) AS w1_dollars
       FROM cum c CROSS JOIN tot t WHERE c.nxt IS NOT NULL
       GROUP BY t.n1, t.n2""",
    note="1-D Wasserstein-1 (earth-mover) distance between the two "
    "segments' order-total distributions: W1 = integral |F1 - F2| = "
    "sum over support gaps of |ECDF diff| * gap width, carried "
    "through by n1*n2 so the numerator is a pure BIGINT sum "
    "(|n2*cum1 - n1*cum2| * gap, every factor exact) — the metric "
    "that says HOW FAR apart two distributions sit in value units, "
    "where q131's KS only says how much they maximally disagree; "
    "the standard embedding/feature drift magnitude in curation.  "
    "Same collapsed-frame shape as q131: one groupBy on cents, one "
    "window cumsum + lead on the collapsed support, one aggregate.  "
    "Magnitude: |diff| <= n^2 ~ 1e10 at sf1 times gaps summing to "
    "the value range 1e7 — worst case ~1e17, int64-safe with the "
    "price-cap data bound",
)
def q139(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    o = c.table("orders")
    cust = c.table("customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    s = o.join(F.broadcast(cust), o.o_custkey == cust.c_custkey).select(
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
        F.col("c_mktsegment").alias("seg"),
    )
    cnt = s.groupBy("cents").agg(
        F.sum(F.when(F.col("seg") == "BUILDING", 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("seg") == "MACHINERY", 1).otherwise(0)).alias("c2"),
    )
    wcum = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wlead = Window.orderBy("cents")
    cum = cnt.select(
        "cents",
        F.sum("c1").over(wcum).alias("cum1"),
        F.sum("c2").over(wcum).alias("cum2"),
        F.lead("cents").over(wlead).alias("nxt"),
    )
    tot = cnt.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    term = F.abs(F.col("n2") * F.col("cum1") - F.col("n1") * F.col("cum2")) * (
        F.col("nxt") - F.col("cents")
    )
    return (
        cum.filter(F.col("nxt").isNotNull())
        .crossJoin(F.broadcast(tot))
        .groupBy("n1", "n2")
        .agg(
            F.sum(term).alias("w1_num"),
            F.round(
                F.sum(term).cast("double") / (F.col("n1") * F.col("n2") * F.lit(100.0)),
                4,
            ).alias("w1_dollars"),
        )
        .select(
            F.col("n1").cast("long").alias("n1"),
            F.col("n2").cast("long").alias("n2"),
            F.col("w1_num").cast("long").alias("w1_num"),
            "w1_dollars",
        )
    )


@_q(
    "q140_dbscan_grid",
    """WITH RECURSIVE pts AS (SELECT c_custkey AS id,
         ('0x' || substring(md5(c_custkey::VARCHAR || ':x'), 1, 15))::BIGINT
           % 10000 AS x,
         ('0x' || substring(md5(c_custkey::VARCHAR || ':y'), 1, 15))::BIGINT
           % 10000 AS y
       FROM customer),
       a AS (SELECT id, x, y, x // 250 AS cx, y // 250 AS cy FROM pts),
       b AS (SELECT id, x, y, x // 250 + d1.dx AS cx, y // 250 + d2.dy AS cy
             FROM pts
             CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dx) d1
             CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dy) d2),
       pairs AS (SELECT a.id AS pa, b.id AS pb
         FROM a JOIN b ON a.cx = b.cx AND a.cy = b.cy AND a.id < b.id
         WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 62500),
       sym AS (SELECT pa AS xx, pb AS yy FROM pairs
               UNION ALL SELECT pb, pa FROM pairs),
       deg AS (SELECT xx, count(*) AS c FROM sym GROUP BY 1),
       core AS (SELECT xx AS id FROM deg WHERE c >= 3),
       ce AS (SELECT s.xx AS ea, s.yy AS eb FROM sym s
              JOIN core c1 ON c1.id = s.xx JOIN core c2 ON c2.id = s.yy),
       reach(node, r) AS (
         SELECT id, id FROM core
         UNION
         SELECT e.eb, reach.r FROM reach JOIN ce e ON reach.node = e.ea),
       comp AS (SELECT node AS id, min(r) AS cluster FROM reach GROUP BY 1),
       border AS (SELECT s.xx AS id, min(c.cluster) AS cluster
                  FROM sym s JOIN comp c ON c.id = s.yy
                  WHERE s.xx NOT IN (SELECT id FROM core) GROUP BY 1),
       allp AS (SELECT id, cluster, 1 AS is_core FROM comp
                UNION ALL SELECT id, cluster, 0 FROM border)
       SELECT cluster::BIGINT AS cluster, sum(is_core)::BIGINT AS n_core,
              sum(1 - is_core)::BIGINT AS n_border, count(*)::BIGINT AS n_total
       FROM allp GROUP BY 1 ORDER BY 1""",
    note="DBSCAN over the synthetic point cloud, composed entirely "
    "from scale-safe primitives: neighbor pairs from the q135 grid "
    "equi-join (eps=250, cell=radius so the 3x3 neighborhood is "
    "complete), core points = degree >= 3 on the symmetric pair "
    "graph, clusters = distributed connected components over "
    "core-core edges labelled by min core id (the g04 kernel), "
    "border points attach to their smallest adjacent core cluster, "
    "noise drops out.  Every step is integer-exact; the oracle "
    "replays it with a recursive min-label closure.  This is the "
    "density-based clustering a dedup/embedding pipeline runs where "
    "k-means (l35) needs a k: grid join keeps candidate generation "
    "linear, CC is the delta-iterated Pregel kernel — both already "
    "proven at 20M+ edges in BENCH distributed_graph",
)
def q140(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.spatial import dbscan_grid

    pts = _synthetic_points(spark, sf_dir)
    assign = dbscan_grid(pts, cell=250, radius2=62500, min_neighbors=3)
    return (
        assign.groupBy("cluster")
        .agg(
            F.sum("is_core").alias("n_core"),
            F.sum(1 - F.col("is_core")).alias("n_border"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .select(
            F.col("cluster").cast("long").alias("cluster"),
            F.col("n_core").cast("long").alias("n_core"),
            F.col("n_border").cast("long").alias("n_border"),
            F.col("n_total").cast("long").alias("n_total"),
        )
        .orderBy("cluster")
    )


@_q(
    "q141_quantile_normalization",
    """WITH s AS (SELECT event_type AS t,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
       FROM events WHERE event_type IN ('click', 'purchase')),
       vc AS (SELECT t, v, count(*) AS c FROM s GROUP BY 1, 2),
       cum AS (SELECT t, v, c,
         sum(c) OVER (PARTITION BY t ORDER BY v ROWS UNBOUNDED PRECEDING) AS cm
       FROM vc),
       tot AS (SELECT t, sum(c) AS n FROM vc GROUP BY 1),
       dec AS (SELECT unnest(range(1, 11)) AS d),
       typ AS (SELECT c.t, d.d, t.n,
         min(CASE WHEN c.cm >= (d.d * t.n + 9) // 10 THEN c.v END) AS type_value
       FROM cum c JOIN tot t ON t.t = c.t CROSS JOIN dec d GROUP BY 1, 2, 3),
       pc AS (SELECT v, count(*) AS c FROM s GROUP BY 1),
       pcum AS (SELECT v, sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cm
                FROM pc),
       pn AS (SELECT count(*) AS n FROM s),
       ref AS (SELECT d.d,
         min(CASE WHEN p.cm >= (d.d * n.n + 9) // 10 THEN p.v END) AS ref_value
       FROM pcum p CROSS JOIN pn n CROSS JOIN dec d GROUP BY 1)
       SELECT typ.t AS event_type, typ.d::INT AS decile, typ.n::BIGINT AS n,
              typ.type_value::BIGINT AS type_value,
              ref.ref_value::BIGINT AS ref_value
       FROM typ JOIN ref ON ref.d = typ.d
       ORDER BY 1, 2""",
    note="quantile normalization mapping table (the microarray / "
    "batch-effect-removal op adapted to feature pipelines): for each "
    "event type and decile, the type's own type-1 decile value next "
    "to the POOLED reference decile it normalizes to — applying the "
    "map rank-aligns the two cohorts' distributions exactly.  Every "
    "quantile is a k-th order statistic (k = ceil(d*n/10) as integer "
    "ceiling) read off a value-collapsed cumulative frame, so the "
    "whole table is BIGINT-exact — no interpolation convention "
    "drift.  Shape: per-type and pooled value collapses (map-side "
    "combined), windows on collapsed frames, a 10-row decile spine "
    "cross join — corpus-size-independent after the first shuffle",
)
def q141(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    s = ev.select(
        F.col("event_type").alias("t"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("v"),
    )
    vc = s.groupBy("t", "v").agg(F.count(F.lit(1)).alias("c"))
    wt = (
        Window.partitionBy("t")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = vc.select("t", "v", "c", F.sum("c").over(wt).alias("cm"))
    tot = vc.groupBy("t").agg(F.sum("c").alias("n"))
    dec = spark.range(1, 11).select(F.col("id").alias("d"))
    typ = (
        cum.join(F.broadcast(tot), "t")
        .crossJoin(F.broadcast(dec))
        .groupBy("t", "d", "n")
        .agg(
            F.min(
                F.when(
                    F.col("cm") >= ((F.col("d") * F.col("n") + 9) / 10).cast("long"),
                    F.col("v"),
                )
            ).alias("type_value")
        )
    )
    pc = s.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    wp = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pcum = pc.select("v", F.sum("c").over(wp).alias("cm"))
    pn = s.agg(F.count(F.lit(1)).alias("n"))
    ref = (
        pcum.crossJoin(F.broadcast(pn))
        .crossJoin(F.broadcast(dec))
        .groupBy("d")
        .agg(
            F.min(
                F.when(
                    F.col("cm") >= ((F.col("d") * F.col("n") + 9) / 10).cast("long"),
                    F.col("v"),
                )
            ).alias("ref_value")
        )
    )
    return (
        typ.join(F.broadcast(ref), "d")
        .select(
            F.col("t").alias("event_type"),
            F.col("d").cast("int").alias("decile"),
            F.col("n").cast("long").alias("n"),
            F.col("type_value").cast("long").alias("type_value"),
            F.col("ref_value").cast("long").alias("ref_value"),
        )
        .orderBy("event_type", "decile")
    )


@_q(
    "q142_theil_sen",
    """WITH m AS (SELECT o_orderpriority AS prio,
         date_trunc('month', o_orderdate) AS mon, count(*) AS c
       FROM orders GROUP BY 1, 2),
       ix AS (SELECT prio, mon, c,
         row_number() OVER (PARTITION BY prio ORDER BY mon) AS i FROM m),
       sl AS (SELECT a.prio, a.i AS i, b.i AS j,
              b.c - a.c AS dc, b.i - a.i AS di,
              CAST(b.c - a.c AS DOUBLE) / (b.i - a.i) AS slope
         FROM ix a JOIN ix b ON a.prio = b.prio AND a.i < b.i),
       rk AS (SELECT prio, i, j, dc, di, slope,
         row_number() OVER (PARTITION BY prio ORDER BY slope, i, j) AS r,
         count(*) OVER (PARTITION BY prio) AS np
       FROM sl)
       SELECT prio, np::BIGINT AS n_pairs,
              dc::BIGINT AS med_dc, di::BIGINT AS med_di,
              round(slope, 6) AS ts_slope
       FROM rk WHERE r = (np + 1) // 2
       ORDER BY prio""",
    note="Theil-Sen slope per priority series — the robust trend "
    "MAGNITUDE that pairs with q130's Mann-Kendall direction test: "
    "the median of all pairwise slopes (c_j-c_i)/(j-i) over month "
    "indices.  Determinism: each slope is ONE double division of two "
    "small exact ints (identical IEEE both engines), the median is "
    "row_number-selected under the total order (slope, i, j) — equal "
    "slopes order by their exact integer pair ids, so the selected "
    "row is unique and layout-proof; its exact (dc, di) fraction is "
    "emitted alongside the rounded slope.  Same aggregate-then-pair "
    "shape as q130: the corpus collapses to ~84 rows per series "
    "before the O(months^2) join",
)
def q142(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    m = o.groupBy(
        F.col("o_orderpriority").alias("prio"),
        F.date_trunc("month", F.col("o_orderdate")).alias("mon"),
    ).agg(F.count(F.lit(1)).alias("c"))
    wi = Window.partitionBy("prio").orderBy("mon")
    ix = m.select("prio", "mon", "c", F.row_number().over(wi).alias("i"))
    a = ix.alias("a")
    b = ix.alias("b")
    sl = a.join(
        b, (F.col("a.prio") == F.col("b.prio")) & (F.col("a.i") < F.col("b.i"))
    ).select(
        F.col("a.prio").alias("prio"),
        F.col("a.i").alias("i"),
        F.col("b.i").alias("j"),
        (F.col("b.c") - F.col("a.c")).alias("dc"),
        (F.col("b.i") - F.col("a.i")).alias("di"),
        (
            (F.col("b.c") - F.col("a.c")).cast("double")
            / (F.col("b.i") - F.col("a.i"))
        ).alias("slope"),
    )
    wr = Window.partitionBy("prio").orderBy("slope", "i", "j")
    wn = Window.partitionBy("prio")
    rk = sl.select(
        "prio",
        "i",
        "j",
        "dc",
        "di",
        "slope",
        F.row_number().over(wr).alias("r"),
        F.count(F.lit(1)).over(wn).alias("np"),
    )
    return (
        rk.filter(F.col("r") == ((F.col("np") + 1) / 2).cast("long"))
        .select(
            "prio",
            F.col("np").cast("long").alias("n_pairs"),
            F.col("dc").cast("long").alias("med_dc"),
            F.col("di").cast("long").alias("med_di"),
            F.round("slope", 6).alias("ts_slope"),
        )
        .orderBy("prio")
    )


@_q(
    "q143_varint_estimate",
    """WITH cols AS (
         SELECT 'o_orderkey' AS col, o_orderkey AS v,
                row_number() OVER (ORDER BY o_orderkey) AS r FROM orders
         UNION ALL
         SELECT 'o_custkey', o_custkey,
                row_number() OVER (ORDER BY o_orderkey) AS r FROM orders),
       d AS (SELECT col, v,
         v - lag(v) OVER (PARTITION BY col ORDER BY r) AS delta
       FROM cols),
       z AS (SELECT col,
         CASE WHEN delta IS NULL THEN 2 * abs(v)
              WHEN delta >= 0 THEN 2 * delta ELSE -2 * delta - 1 END AS zz,
         CASE WHEN v >= 0 THEN 2 * v ELSE -2 * v - 1 END AS zraw
       FROM d),
       b AS (SELECT col,
         CASE WHEN zz = 0 THEN 1 ELSE (length(bin(zz)) + 6) // 7 END AS dbytes,
         CASE WHEN zraw = 0 THEN 1 ELSE (length(bin(zraw)) + 6) // 7 END AS pbytes
       FROM z)
       SELECT col, count(*)::BIGINT AS n, (8 * count(*))::BIGINT AS raw_bytes,
              sum(pbytes)::BIGINT AS varint_bytes,
              sum(dbytes)::BIGINT AS delta_varint_bytes,
              CAST(floor(1e4 * CAST(sum(dbytes) AS DOUBLE) / (8 * count(*)) + 0.5)
                AS BIGINT) AS ratio_x1e4
       FROM b GROUP BY 1 ORDER BY 1""",
    note="columnar storage planning: estimated bytes for each key "
    "column under plain varint vs delta+zigzag+varint encoding "
    "(Parquet DELTA_BINARY_PACKED / Protobuf-style), computed EXACTLY "
    "— zigzag is integer branch arithmetic, varint width is "
    "ceil(bit_length/7) via the length(bin()) idiom, totals are "
    "integer sums.  Shows the sorted key (o_orderkey: tiny deltas → "
    "1-byte varints) vs the unsorted one (o_custkey: full-width "
    "deltas) — exactly the measurement that decides sort keys and "
    "encodings in a 100 TB lakehouse layout (SCALE.md storage "
    "section).  Shape: one window lag per column over the sort "
    "order, map-side-combined byte sums; at scale runs per row "
    "group, embarrassingly parallel",
)
def q143(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    wr = Window.orderBy("o_orderkey")
    cols = o.select(
        F.lit("o_orderkey").alias("col"),
        F.col("o_orderkey").alias("v"),
        F.row_number().over(wr).alias("r"),
    ).unionByName(
        o.select(
            F.lit("o_custkey").alias("col"),
            F.col("o_custkey").alias("v"),
            F.row_number().over(wr).alias("r"),
        )
    )
    wl = Window.partitionBy("col").orderBy("r")
    d = cols.select("col", "v", (F.col("v") - F.lag("v").over(wl)).alias("delta"))
    zz = (
        F.when(F.col("delta").isNull(), 2 * F.abs(F.col("v")))
        .when(F.col("delta") >= 0, 2 * F.col("delta"))
        .otherwise(-2 * F.col("delta") - 1)
    )
    zraw = F.when(F.col("v") >= 0, 2 * F.col("v")).otherwise(-2 * F.col("v") - 1)
    z = d.select("col", zz.alias("zz"), zraw.alias("zraw"))
    b = z.select(
        "col",
        F.when(F.col("zz") == 0, 1)
        .otherwise(((F.length(F.bin("zz")) + 6) / 7).cast("long"))
        .alias("dbytes"),
        F.when(F.col("zraw") == 0, 1)
        .otherwise(((F.length(F.bin("zraw")) + 6) / 7).cast("long"))
        .alias("pbytes"),
    )
    return (
        b.groupBy("col")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (8 * F.count(F.lit(1))).alias("raw_bytes"),
            F.sum("pbytes").alias("varint_bytes"),
            F.sum("dbytes").alias("delta_varint_bytes"),
        )
        .select(
            "col",
            F.col("n").cast("long").alias("n"),
            F.col("raw_bytes").cast("long").alias("raw_bytes"),
            F.col("varint_bytes").cast("long").alias("varint_bytes"),
            F.col("delta_varint_bytes").cast("long").alias("delta_varint_bytes"),
            F.floor(
                F.lit(1e4)
                * F.col("delta_varint_bytes").cast("double")
                / (8 * F.col("n"))
                + 0.5
            )
            .cast("long")
            .alias("ratio_x1e4"),
        )
        .orderBy("col")
    )


@_q(
    "q144_join_cardinality",
    """WITH a AS (SELECT l_orderkey % 64 AS b, l_orderkey AS k FROM lineitem),
       bb AS (SELECT o_orderkey % 64 AS b, o_orderkey AS k FROM orders),
       ha AS (SELECT b, count(*) AS na, count(DISTINCT k) AS da FROM a GROUP BY 1),
       hb AS (SELECT b, count(*) AS nb, count(DISTINCT k) AS db FROM bb GROUP BY 1),
       est AS (SELECT sum(ha.na * hb.nb) AS upper_bound,
               sum(ha.na * hb.nb // greatest(ha.da, hb.db)) AS est
               FROM ha JOIN hb ON ha.b = hb.b),
       act AS (SELECT count(*) AS actual FROM lineitem l
               JOIN orders o ON l.l_orderkey = o.o_orderkey)
       SELECT 64::BIGINT AS n_buckets, est.upper_bound::BIGINT AS upper_bound,
              est.est::BIGINT AS est, act.actual::BIGINT AS actual,
              CAST(floor(1e4 * CAST(est.est AS DOUBLE) / act.actual + 0.5)
                AS BIGINT) AS ratio_x1e4
       FROM est CROSS JOIN act""",
    note="optimizer-statistics join cardinality estimation, audited "
    "against truth: 64-bucket key histograms on both join sides, "
    "per-bucket estimate na*nb/max(da,db) (the uniform-within-bucket "
    "containment rule every cost-based optimizer applies) summed as "
    "EXACT INTEGERS (floor division per bucket), beside the naive "
    "na*nb upper bound and the actual join count.  This is the "
    "estimate-vs-actual measurement that tells you whether a "
    "100 TB join plan was chosen on good statistics — and the "
    "histogram frames are exactly what ANALYZE TABLE materializes.  "
    "Shape: two map-side-combined histogram groupBys (64 rows each), "
    "one broadcast-sized histogram join; the actual count is the "
    "audit baseline",
)
def q144(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    li = c.table("lineitem")
    o = c.table("orders")
    ha = li.groupBy((F.col("l_orderkey") % 64).alias("b")).agg(
        F.count(F.lit(1)).alias("na"), F.countDistinct("l_orderkey").alias("da")
    )
    hb = o.groupBy((F.col("o_orderkey") % 64).alias("b")).agg(
        F.count(F.lit(1)).alias("nb"), F.countDistinct("o_orderkey").alias("db")
    )
    est = ha.join(hb, "b").agg(
        F.sum(F.col("na") * F.col("nb")).alias("upper_bound"),
        F.sum(
            F.expr("na * nb DIV greatest(da, db)")
        ).alias("est"),
    )
    act = li.join(o, li.l_orderkey == o.o_orderkey).agg(
        F.count(F.lit(1)).alias("actual")
    )
    return (
        est.crossJoin(F.broadcast(act))
        .select(
            F.lit(64).cast("long").alias("n_buckets"),
            F.col("upper_bound").cast("long").alias("upper_bound"),
            F.col("est").cast("long").alias("est"),
            F.col("actual").cast("long").alias("actual"),
            F.floor(
                F.lit(1e4) * F.col("est").cast("double") / F.col("actual") + 0.5
            )
            .cast("long")
            .alias("ratio_x1e4"),
        )
    )


@_q(
    "t84_cross_correlation",
    """WITH b AS (SELECT date_trunc('hour', ts) AS t, event_type FROM events),
       bounds AS (SELECT min(t) AS lo, max(t) AS hi FROM b),
       spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS t
                 FROM bounds),
       x AS (SELECT t, count(*) AS c FROM b WHERE event_type = 'click' GROUP BY 1),
       y AS (SELECT t, count(*) AS c FROM b WHERE event_type = 'purchase' GROUP BY 1),
       dx AS (SELECT s.t, coalesce(x.c, 0) AS x FROM spine s LEFT JOIN x ON s.t = x.t),
       dy AS (SELECT s.t, coalesce(y.c, 0) AS y FROM spine s LEFT JOIN y ON s.t = y.t),
       lags AS (SELECT unnest(range(-6, 7)) AS lag),
       p AS (SELECT l.lag, dx.x, dy.y
             FROM lags l CROSS JOIN dx
             JOIN dy ON dy.t = dx.t + l.lag * INTERVAL 1 HOUR),
       st AS (SELECT lag, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                     sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy
              FROM p GROUP BY 1)
       SELECT CAST(lag AS INT) AS lag, CAST(n AS BIGINT) AS n_pairs,
         round(CAST(n*sxy - sx*sy AS DOUBLE) /
               sqrt(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE)),
               4) AS xcorr
       FROM st ORDER BY 1""",
    note="cross-correlation function between two event-type series "
    "(click vs purchase hourly counts) at lags -6..+6 hours — the "
    "lead/lag discovery primitive behind attribution and causal-delay "
    "analysis (autocorrelation t-queries cover ONE series; this is "
    "the two-series form).  Hourly counts zero-filled over a dense "
    "generated spine so silent hours count as 0 not missing; Pearson "
    "r per lag in pure integer carriers (n*sxy - sx*sy over exact "
    "BIGINT sums, single double division at the end — bit-identical "
    "cross-engine).  At 100 TB the only heavy step is the map-side "
    "combined bucket count; the dense series is |hours| x 1 rows, so "
    "the 13-lag self-join broadcasts",
)
def t84(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    b = ev.select(F.date_trunc("hour", "ts").alias("t"), "event_type")
    spine = b.agg(F.min("t").alias("lo"), F.max("t").alias("hi")).select(
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("t")
    )
    x = b.filter(F.col("event_type") == "click").groupBy("t").agg(
        F.count(F.lit(1)).alias("c")
    )
    y = b.filter(F.col("event_type") == "purchase").groupBy("t").agg(
        F.count(F.lit(1)).alias("c")
    )
    dx = spine.join(x, "t", "left").select("t", F.coalesce("c", F.lit(0)).alias("x"))
    dy = spine.join(y, "t", "left").select("t", F.coalesce("c", F.lit(0)).alias("y"))
    lags = spine.sparkSession.range(-6, 7).select(F.col("id").cast("int").alias("lag"))
    p = (
        dx.crossJoin(F.broadcast(lags))
        .withColumn("t2", F.expr("timestampadd(HOUR, lag, t)"))
        .join(dy.withColumnRenamed("t", "t2"), "t2")
    )
    st = p.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dx2 = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy2 = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return st.select(
        F.col("lag"),
        F.col("n").alias("n_pairs"),
        F.round(
            num.cast("double") / F.sqrt(dx2.cast("double") * dy2.cast("double")), 4
        ).alias("xcorr"),
    ).orderBy("lag")


@_q(
    "q145_isotonic",
    """WITH b AS (
         SELECT (floor(c.c_acctbal/500))::INT AS bucket,
                count(*)::BIGINT AS n,
                sum(floor(o.o_totalprice*100 + 0.5))::BIGINT AS cents
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         GROUP BY 1),
       idx AS MATERIALIZED (
         SELECT bucket, n, cents,
                row_number() OVER (ORDER BY bucket) AS rn,
                sum(n) OVER (ORDER BY bucket) AS cn,
                sum(cents) OVER (ORDER BY bucket) AS cs
         FROM b),
       pr AS MATERIALIZED (
         SELECT i.rn AS i, j.rn AS j,
                (j.cs - i.cs + i.cents) AS num,
                (j.cn - i.cn + i.n) AS den
         FROM idx i JOIN idx j ON i.rn <= j.rn),
       mins AS (SELECT k.rn AS rn, p.i AS i, min(p.num*1.0/p.den) AS mn
                FROM idx k JOIN pr p ON p.i <= k.rn AND p.j >= k.rn
                GROUP BY 1, 2),
       fit AS (SELECT rn, max(mn) AS fv FROM mins GROUP BY 1)
       SELECT i.bucket, i.n,
              floor(i.cents*1.0/i.n + 0.5)/100.0 AS raw_mean,
              floor(f.fv + 0.5)/100.0 AS iso_mean
       FROM idx i JOIN fit f ON f.rn = i.rn
       ORDER BY 1""",
    note="isotonic regression (PAV) of mean order value against the "
    "customer account-balance bucket — the monotone calibration "
    "curve a ranker/score needs before thresholding.  Uses the "
    "minimax identity fitted[k] = max_{i<=k} min_{j>=k} "
    "mean(y[i..j]) over the ~22 aggregated buckets, so the "
    "sequential pool-adjacent-violators loop becomes two grouped "
    "joins on O(buckets^3) tiny triples.  Every interval mean is "
    "one division of identical BIGINT prefix-sum diffs (cents "
    "carrier), so min/max argpools are bit-stable cross-engine; "
    "outputs use the floor(x+0.5) half-up form.  At 100 TB the "
    "bucket aggregation is the only data-sized pass (map-side "
    "combine); the minimax lattice is driver-scale state",
)
def q145(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    b = (
        c.table("orders")
        .join(c.table("customer"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.floor(F.col("c_acctbal") / 500).cast("int").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))).alias("cents"),
        )
    )
    w = Window.orderBy("bucket")
    idx = b.select(
        "bucket",
        "n",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.sum("n").over(w).alias("cn"),
        F.sum("cents").over(w).alias("cs"),
    ).localCheckpoint(eager=True)
    i = idx.select(
        F.col("rn").alias("i"),
        F.col("cs").alias("ics"),
        F.col("cn").alias("icn"),
        F.col("cents").alias("ic"),
        F.col("n").alias("inn"),
    )
    j = idx.select(F.col("rn").alias("j"), F.col("cs").alias("jcs"), F.col("cn").alias("jcn"))
    pr = (
        i.join(j, F.col("i") <= F.col("j"))
        .select(
            "i",
            "j",
            (F.col("jcs") - F.col("ics") + F.col("ic")).alias("num"),
            (F.col("jcn") - F.col("icn") + F.col("inn")).alias("den"),
        )
    )
    k = idx.select(F.col("rn").alias("k"))
    mins = (
        k.join(pr, (F.col("i") <= F.col("k")) & (F.col("j") >= F.col("k")))
        .groupBy("k", "i")
        .agg(F.min(F.col("num").cast("double") / F.col("den")).alias("mn"))
    )
    fit = mins.groupBy("k").agg(F.max("mn").alias("fv"))
    return (
        idx.join(fit, F.col("rn") == F.col("k"))
        .select(
            "bucket",
            "n",
            (F.floor(F.col("cents").cast("double") / F.col("n") + F.lit(0.5)) / 100.0).alias(
                "raw_mean"
            ),
            (F.floor(F.col("fv") + F.lit(0.5)) / 100.0).alias("iso_mean"),
        )
        .orderBy("bucket")
    )


def _dtw_oracle() -> str:
    """Oracle for t85: the DTW lattice unrolled ROW-WISE (the l35/l108
    unrolled-chain idiom).  Row recurrence closed form — with
    m(t) = min(c_prev(t), c_prev(t-1)) and D(j) the row's prefix sum of
    |a_i - b_j|, c(i,j) = D(j) + min_{t<=j}(m(t) - D(t-1)) — turns each
    DP row into one prefix-sum + one running-min window, so 12 rows =
    12 CTEs with no recursion and no driver state."""
    pri_a, pri_b = "1-URGENT", "2-HIGH"

    def series(name: str, pri: str) -> str:
        return f"""{name} AS (
         SELECT s.m, coalesce(t.c, 0)::BIGINT AS v
         FROM (SELECT unnest(range(1, 13)) AS m) s
         LEFT JOIN (SELECT month(o_orderdate) AS m, count(*) AS c
                    FROM orders WHERE year(o_orderdate) = 1995
                      AND o_orderpriority = '{pri}' GROUP BY 1) t
         ON t.m = s.m)"""

    ctes = [
        series("sa", pri_a),
        series("sb", pri_b),
        """lat AS (SELECT a.m AS i, b.m AS j, abs(a.v - b.v)::BIGINT AS d
         FROM sa a CROSS JOIN sb b)""",
        """r1 AS (SELECT j, (sum(d) OVER (ORDER BY j))::BIGINT AS c
         FROM lat WHERE i = 1)""",
    ]
    for i in range(2, 13):
        ctes.append(
            f"""r{i} AS (
         SELECT j, (dsum + mn)::BIGINT AS c FROM (
           SELECT j, sum(d) OVER (ORDER BY j) AS dsum,
                  min(m2 - dp) OVER (ORDER BY j) AS mn
           FROM (
             SELECT l.j, l.d,
                    least(p.c, coalesce(lag(p.c) OVER (ORDER BY p.j), p.c)) AS m2,
                    coalesce(sum(l.d) OVER (ORDER BY l.j
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS dp
             FROM (SELECT j, d FROM lat WHERE i = {i}) l
             JOIN r{i - 1} p ON p.j = l.j) q) q2)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT j::INT AS j, c::BIGINT AS cost FROM r12 ORDER BY j"
    )


@_q(
    "t85_dtw",
    _dtw_oracle(),
    note="dynamic time warping between the 1995 monthly order-count "
    "series of two priorities (URGENT vs HIGH, zero-filled 12-month "
    "spine) — the elastic-alignment distance for series whose shapes "
    "match but timing drifts, where lagged Pearson (t84, the rigid-"
    "shift sibling) underestimates similarity.  The DP is sequential "
    "by nature; here each lattice ROW collapses to closed form "
    "c(i,j) = D(j) + min_t<=j (m(t) - D(t-1)) (D = row prefix sum of "
    "|a_i - b_j|, m = pairwise min of the previous row and its lag), "
    "so the whole 12x12 lattice is 12 chained prefix-sum + running-"
    "min windows — no recursion, no driver loop over cells, exact "
    "BIGINT carriers; the oracle unrolls the identical chain as CTEs. "
    "Output = the final DP row (DTW distance of the full URGENT "
    "series vs each HIGH prefix; j=12 is the classic DTW distance).  "
    "Scale: series collapse first (one map-side-combined count per "
    "month bucket), so the windows run on |buckets| rows no matter "
    "the corpus — the collapse-then-compute family; independently "
    "verified against a brute-force numpy DP in tests",
)
def t85(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = Catalog(spark, sf_dir).table("orders")
    base = orders.filter(F.year("o_orderdate") == 1995)
    spine = spark.range(1, 13).select(F.col("id").cast("int").alias("m"))

    def series(pri: str, out: str) -> DataFrame:
        cnt = (
            base.filter(F.col("o_orderpriority") == pri)
            .groupBy(F.month("o_orderdate").alias("m"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        return spine.join(cnt, "m", "left").select(
            F.col("m").alias(out), F.coalesce("c", F.lit(0)).cast("long").alias("v")
        )

    lat = (
        series("1-URGENT", "i")
        .withColumnRenamed("v", "va")
        .crossJoin(series("2-HIGH", "j").withColumnRenamed("v", "vb"))
        .select("i", "j", F.abs(F.col("va") - F.col("vb")).cast("long").alias("d"))
    )
    wj = Window.orderBy("j")
    prev = lat.filter(F.col("i") == 1).select(
        "j", F.sum("d").over(wj).cast("long").alias("c")
    )
    for i in range(2, 13):
        m2 = prev.select(
            "j",
            F.least(
                F.col("c"), F.coalesce(F.lag("c").over(wj), F.col("c"))
            ).alias("m2"),
        )
        q = (
            lat.filter(F.col("i") == i)
            .select("j", "d")
            .join(m2, "j")
            .select(
                "j",
                "d",
                "m2",
                F.coalesce(
                    F.sum("d").over(
                        wj.rowsBetween(Window.unboundedPreceding, -1)
                    ),
                    F.lit(0),
                ).alias("dp"),
            )
        )
        q2 = q.select(
            "j",
            F.sum("d").over(wj).alias("dsum"),
            F.min(F.col("m2") - F.col("dp")).over(wj).alias("mn"),
        )
        prev = q2.select("j", (F.col("dsum") + F.col("mn")).cast("long").alias("c"))
    return prev.select(
        F.col("j").cast("int").alias("j"), F.col("c").alias("cost")
    ).orderBy("j")


@_q(
    "t86_pettitt",
    """WITH d AS (SELECT ts::DATE AS day,
         sum(floor(value*100 + 0.5))::BIGINT AS x
       FROM events GROUP BY 1),
       r AS (SELECT day, x,
         rank() OVER (ORDER BY x) AS ra,
         rank() OVER (ORDER BY x DESC) AS rd,
         row_number() OVER (ORDER BY day) AS t,
         count(*) OVER () AS n
       FROM d),
       u AS (SELECT day, t, n, sum(rd - ra) OVER (ORDER BY t) AS ut FROM r)
       SELECT strftime(day, '%Y-%m-%d') AS split_day, ut::BIGINT AS u_stat,
              abs(ut)::BIGINT AS abs_u, n::BIGINT AS n_days
       FROM u WHERE t < n
       ORDER BY abs(ut) DESC, day LIMIT 1""",
    note="Pettitt rank-based changepoint test on the daily value "
    "series: the nonparametric sibling of t61's SSE binary "
    "segmentation (robust to outliers that drag means).  The textbook "
    "statistic U_t = sum_{i<=t<j} sgn(x_j - x_i) looks O(n^2)-pairwise, "
    "but its increment telescopes to dU_t = #\\{x_k > x_t\\} - "
    "#\\{x_k < x_t\\} = rank_desc(t) - rank_asc(t) (rank() = 1 + "
    "strictly-better count handles ties exactly), so the full profile "
    "is two rank windows + one prefix sum over the collapsed series — "
    "exact integers end to end, argmax |U| tie-broken by day.  Scale: "
    "collapse-then-compute (one map-side-combined day rollup; windows "
    "touch |days| rows); independently verified against the pairwise "
    "O(n^2) definition in tests",
)
def t86(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("x")
    )
    r = d.select(
        "day",
        F.rank().over(Window.orderBy("x")).alias("ra"),
        F.rank().over(Window.orderBy(F.col("x").desc())).alias("rd"),
        F.row_number().over(Window.orderBy("day")).alias("t"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    u = r.withColumn(
        "ut", F.sum(F.col("rd") - F.col("ra")).over(Window.orderBy("t"))
    )
    return (
        u.filter(F.col("t") < F.col("n"))
        .select(
            F.col("day").cast("string").alias("split_day"),
            F.col("ut").cast("long").alias("u_stat"),
            F.abs("ut").cast("long").alias("abs_u"),
            F.col("n").cast("long").alias("n_days"),
        )
        .orderBy(F.col("abs_u").desc(), "split_day")
        .limit(1)
    )


@_q(
    "q146_cuped",
    """WITH bounds AS (SELECT min(ts) AS lo, max(ts) AS hi FROM events),
       cut AS (SELECT lo + ((epoch_ms(hi) - epoch_ms(lo)) // 2)
                        * INTERVAL 1 MILLISECOND AS c FROM bounds),
       u AS (SELECT user_id,
         CASE WHEN strpos('0123456789abcdef',
           substring(md5(user_id::VARCHAR), 1, 1)) - 1 < 8
           THEN 'A' ELSE 'B' END AS arm,
         sum(CASE WHEN ts < c THEN 1 ELSE 0 END)::BIGINT AS x,
         sum(CASE WHEN ts >= c THEN floor(value*100 + 0.5)::BIGINT
             ELSE 0 END)::BIGINT AS y
       FROM events CROSS JOIN cut GROUP BY 1, 2),
       g AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
                    sum(y)::BIGINT AS sy, sum(x*x)::BIGINT AS sxx,
                    sum(x*y)::BIGINT AS sxy, sum(y*y)::BIGINT AS syy
             FROM u),
       th AS (SELECT n, sx, sy, sxx, sxy, syy,
         CAST(n*sxy - sx*sy AS DOUBLE)
           / nullif(CAST(n*sxx - sx*sx AS DOUBLE), 0) AS theta,
         (CAST(n*sxy - sx*sy AS DOUBLE) * CAST(n*sxy - sx*sy AS DOUBLE))
           / nullif(CAST(n*sxx - sx*sx AS DOUBLE)
                    * CAST(n*syy - sy*sy AS DOUBLE), 0) AS rho2
         FROM g),
       arms AS (SELECT arm, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
                       sum(y)::BIGINT AS sy FROM u GROUP BY 1)
       SELECT a.n AS na, b.n AS nb,
         round((CAST(a.sy AS DOUBLE)/a.n - CAST(b.sy AS DOUBLE)/b.n)/100, 4)
           AS raw_diff,
         round(((CAST(a.sy AS DOUBLE)/a.n
                 - th.theta*(CAST(a.sx AS DOUBLE)/a.n
                             - CAST(th.sx AS DOUBLE)/th.n))
               - (CAST(b.sy AS DOUBLE)/b.n
                 - th.theta*(CAST(b.sx AS DOUBLE)/b.n
                             - CAST(th.sx AS DOUBLE)/th.n)))/100, 4)
           AS cuped_diff,
         round(th.theta/100, 6) AS theta,
         round(th.rho2, 4) AS rho2
       FROM arms a JOIN arms b ON a.arm = 'A' AND b.arm = 'B'
       CROSS JOIN th""",
    note="CUPED variance-reduced experiment readout (the industry-"
    "standard pre-period adjustment q103's raw z-test lacks): users "
    "split into deterministic md5 arms, covariate x = pre-cutoff event "
    "count, metric y = post-cutoff value cents (cutoff = exact "
    "millisecond midpoint of the data span, integer-derived in both "
    "engines), theta = cov(x,y)/var(x) from POOLED exact integer power "
    "sums, adjusted effect = difference of (mean_y - theta*(mean_x - "
    "pooled mean_x)) across arms, rho2 = the variance-reduction "
    "fraction.  Every statistic is a fixed-order double formula over "
    "exact BIGINT sums (the t84/q103 protocol), so cross-engine "
    "bit-stable.  Scale: one groupBy on the user key feeds x, y, and "
    "every moment; the bounds scalar broadcasts",
)
def q146(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    bounds = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
    cut = bounds.select(
        F.expr(
            "timestampadd(MILLISECOND,"
            " (unix_millis(hi) - unix_millis(lo)) DIV 2, lo)"
        ).alias("c")
    )
    arm = F.when(
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 1), 16, 10)
        .cast("int")
        < 8,
        "A",
    ).otherwise("B")
    u = (
        ev.crossJoin(F.broadcast(cut))
        .groupBy("user_id", arm.alias("arm"))
        .agg(
            F.sum(F.when(F.col("ts") < F.col("c"), 1).otherwise(0))
            .cast("long")
            .alias("x"),
            F.sum(
                F.when(
                    F.col("ts") >= F.col("c"),
                    F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("y"),
        )
    )
    g = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    covn = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    varxn = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    varyn = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    th = g.select(
        "n",
        "sx",
        (covn / F.nullif(varxn, F.lit(0.0))).alias("theta"),
        ((covn * covn) / F.nullif(varxn * varyn, F.lit(0.0))).alias("rho2"),
    )
    arms = u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
    )
    a = arms.filter(F.col("arm") == "A").alias("a")
    b = arms.filter(F.col("arm") == "B").alias("b")
    mean = lambda s, nn: F.col(s).cast("double") / F.col(nn)  # noqa: E731
    out = (
        a.crossJoin(b)
        .crossJoin(F.broadcast(th.alias("t")))
        .select(
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
            F.round(
                (
                    F.col("a.sy").cast("double") / F.col("a.n")
                    - F.col("b.sy").cast("double") / F.col("b.n")
                )
                / 100,
                4,
            ).alias("raw_diff"),
            F.round(
                (
                    (
                        F.col("a.sy").cast("double") / F.col("a.n")
                        - F.col("theta")
                        * (
                            F.col("a.sx").cast("double") / F.col("a.n")
                            - F.col("t.sx").cast("double") / F.col("t.n")
                        )
                    )
                    - (
                        F.col("b.sy").cast("double") / F.col("b.n")
                        - F.col("theta")
                        * (
                            F.col("b.sx").cast("double") / F.col("b.n")
                            - F.col("t.sx").cast("double") / F.col("t.n")
                        )
                    )
                )
                / 100,
                4,
            ).alias("cuped_diff"),
            F.round(F.col("theta") / 100, 6).alias("theta"),
            F.round("rho2", 4).alias("rho2"),
        )
    )
    return out


@_q(
    "t87_savgol",
    """WITH d AS (SELECT ts::DATE AS day,
         sum(floor(value*100 + 0.5))::BIGINT AS x
       FROM events GROUP BY 1),
       w AS (SELECT day, x,
         lag(x, 2)  OVER (ORDER BY day) AS m2,
         lag(x, 1)  OVER (ORDER BY day) AS m1,
         lead(x, 1) OVER (ORDER BY day) AS p1,
         lead(x, 2) OVER (ORDER BY day) AS p2
       FROM d)
       SELECT strftime(day, '%Y-%m-%d') AS day,
              x AS raw_cents,
              (-3*m2 + 12*m1 + 17*x + 12*p1 - 3*p2)::BIGINT AS sg_num,
              round((-3*m2 + 12*m1 + 17*x + 12*p1 - 3*p2) / 35.0 / 100, 4)
                AS smooth
       FROM w WHERE m2 IS NOT NULL AND p2 IS NOT NULL
       ORDER BY day""",
    note="Savitzky-Golay smoothing of the daily value series (window 5, "
    "quadratic fit): the least-squares polynomial smoother that "
    "preserves peak heights a moving average flattens.  The quadratic "
    "window-5 kernel is the EXACT rational constant "
    "(-3,12,17,12,-3)/35, so the convolution numerator is a pure "
    "BIGINT lag/lead expression — one window pass over the collapsed "
    "series, one division at the end; interior days only (the classic "
    "edge policy), deterministic in any engine.  Scale: "
    "collapse-then-compute — the day rollup is the only data-sized "
    "shuffle, the five-tap stencil reads |days| rows",
)
def t87(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("x")
    )
    wd = Window.orderBy("day")
    w = d.select(
        "day",
        "x",
        F.lag("x", 2).over(wd).alias("m2"),
        F.lag("x", 1).over(wd).alias("m1"),
        F.lead("x", 1).over(wd).alias("p1"),
        F.lead("x", 2).over(wd).alias("p2"),
    )
    num = (
        -3 * F.col("m2")
        + 12 * F.col("m1")
        + 17 * F.col("x")
        + 12 * F.col("p1")
        - 3 * F.col("p2")
    )
    return (
        w.filter(F.col("m2").isNotNull() & F.col("p2").isNotNull())
        .select(
            F.col("day").cast("string").alias("day"),
            F.col("x").alias("raw_cents"),
            num.cast("long").alias("sg_num"),
            F.round(num / F.lit(35.0) / 100, 4).alias("smooth"),
        )
        .orderBy("day")
    )


@_q(
    "q147_mahalanobis",
    """WITH d AS (SELECT ts::DATE AS day, count(*)::BIGINT AS c,
         sum(floor(value*100 + 0.5))::BIGINT AS v
       FROM events GROUP BY 1),
       g AS (SELECT count(*)::BIGINT AS n, sum(c)::BIGINT AS sc,
                    sum(v)::BIGINT AS sv, sum(c*c)::BIGINT AS scc,
                    sum(c*v)::BIGINT AS scv, sum(v*v)::BIGINT AS svv
             FROM d),
       m AS (SELECT d.day, d.c, d.v, g.n,
         CAST(g.n*d.c - g.sc AS DOUBLE) AS dx,
         CAST(g.n*d.v - g.sv AS DOUBLE) AS dy,
         CAST(g.n*g.scc - g.sc*g.sc AS DOUBLE) AS sxx,
         CAST(g.n*g.scv - g.sc*g.sv AS DOUBLE) AS sxy,
         CAST(g.n*g.svv - g.sv*g.sv AS DOUBLE) AS syy
         FROM d CROSS JOIN g)
       SELECT strftime(day, '%Y-%m-%d') AS day, c AS n_events,
         round(CAST(v AS DOUBLE)/100, 2) AS day_value,
         round((syy*dx*dx - 2*sxy*dx*dy + sxx*dy*dy)
               / nullif(sxx*syy - sxy*sxy, 0) * (n - 1) / n, 4) AS d2
       FROM m ORDER BY d2 DESC, day LIMIT 5""",
    note="Mahalanobis outlier days over the joint (event count, value) "
    "profile: the correlation-aware distance that flags a day whose "
    "COMBINATION is anomalous even when each marginal is in range "
    "(the boxplot/IQR queries are the marginal siblings).  The 2x2 "
    "covariance inverts in closed form, so d^2 = (Syy*dx^2 - "
    "2*Sxy*dx*dy + Sxx*dy^2)/det, every term an n-scaled integer "
    "moment (dx = n*x - sum_x etc.) cast to double ONLY in the final "
    "fixed-order expression — the t84/q103 cross-engine protocol.  The "
    "carrier ratio is the POPULATION-covariance d^2 (the n-scalings "
    "cancel: numerator n^4*Q_pop over denominator n^4*det), so one "
    "(n-1)/n factor converts to the sample-covariance d^2 (r4 ADVICE "
    "fix: the extra /n made it a scaled score).  Top-5 days, ties by "
    "day.  Scale: one day rollup "
    "+ one scalar moment row broadcast back — two map-side-combined "
    "aggregates regardless of corpus size",
)
def q147(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("v"),
    )
    g = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("sc"),
        F.sum("v").cast("long").alias("sv"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("scc"),
        F.sum(F.col("c") * F.col("v")).cast("long").alias("scv"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("svv"),
    )
    m = d.crossJoin(F.broadcast(g)).select(
        "day",
        "c",
        "v",
        "n",
        (F.col("n") * F.col("c") - F.col("sc")).cast("double").alias("dx"),
        (F.col("n") * F.col("v") - F.col("sv")).cast("double").alias("dy"),
        (F.col("n") * F.col("scc") - F.col("sc") * F.col("sc"))
        .cast("double")
        .alias("sxx"),
        (F.col("n") * F.col("scv") - F.col("sc") * F.col("sv"))
        .cast("double")
        .alias("sxy"),
        (F.col("n") * F.col("svv") - F.col("sv") * F.col("sv"))
        .cast("double")
        .alias("syy"),
    )
    d2 = F.round(
        (
            F.col("syy") * F.col("dx") * F.col("dx")
            - 2 * F.col("sxy") * F.col("dx") * F.col("dy")
            + F.col("sxx") * F.col("dy") * F.col("dy")
        )
        / F.nullif(
            F.col("sxx") * F.col("syy") - F.col("sxy") * F.col("sxy"), F.lit(0.0)
        )
        * (F.col("n") - 1)
        / F.col("n"),
        4,
    )
    return (
        m.select(
            F.col("day").cast("string").alias("day"),
            F.col("c").alias("n_events"),
            F.round(F.col("v").cast("double") / 100, 2).alias("day_value"),
            d2.alias("d2"),
        )
        .orderBy(F.col("d2").desc(), "day")
        .limit(5)
    )


_RBO_CASE = (
    "CASE md WHEN 1 THEN 5932493265528 WHEN 2 THEN 3412493265528 "
    "WHEN 3 THEN 2278493265528 WHEN 4 THEN 1598093265528 "
    "WHEN 5 THEN 1138823265528 WHEN 6 THEN 808148865528 "
    "WHEN 7 THEN 560143065528 WHEN 8 THEN 368824305528 "
    "WHEN 9 THEN 218160782028 WHEN 10 THEN 97629963228 END"
)


@_q(
    "q148_rbo",
    f"""WITH r94 AS (
         SELECT o.o_custkey AS c,
                sum(floor(l.l_extendedprice*(1-l.l_discount)*100 + 0.5))::BIGINT
                  AS cents
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         WHERE year(o.o_orderdate) = 1994 GROUP BY 1),
       r95 AS (
         SELECT o.o_custkey AS c,
                sum(floor(l.l_extendedprice*(1-l.l_discount)*100 + 0.5))::BIGINT
                  AS cents
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         WHERE year(o.o_orderdate) = 1995 GROUP BY 1),
       a AS (SELECT c, row_number() OVER (ORDER BY cents DESC, c) AS ra
             FROM r94 QUALIFY ra <= 10),
       b AS (SELECT c, row_number() OVER (ORDER BY cents DESC, c) AS rb
             FROM r95 QUALIFY rb <= 10),
       j AS (SELECT greatest(a.ra, b.rb) AS md FROM a JOIN b USING (c)),
       n AS (SELECT count(*)::BIGINT AS n_common,
                    coalesce(sum({_RBO_CASE}), 0)::BIGINT AS rbo_carrier
             FROM j)
       SELECT n_common, rbo_carrier,
              floor((rbo_carrier / 2.52e13) * 1000000 + 0.5)
                / 1000000 AS rbo
       FROM n""",
    note="rank-biased overlap (RBO@10, p=0.9, truncated/prefix form — "
    "the top-weighted rank-similarity measure search/recsys teams use "
    "where Spearman/Kendall over-weight the tail): 1994-vs-1995 "
    "customer revenue top-10 leaderboards; a customer in both lists "
    "enters every prefix depth d >= max(ra, rb), so RBO's double sum "
    "collapses to one per-customer suffix weight.  Cross-engine float "
    "protocol: p^(d-1)/d terms over the common denominator 10^9*2520 "
    "make every suffix weight an EXACT integer literal (the 10-arm "
    "CASE), so the carrier sum is pure bigint — rbo itself is one "
    "fixed double expression at the end, floor-rounded at 6dp; "
    "identical lists give carrier/D*0.1 = 1-0.9^10 = 0.651322 "
    "(verified closed-form).  Scale: two map-side-combined rollups + "
    "two 10-row global ranks over the per-customer aggregate (the "
    "TakeOrdered shape) + a 10x10-bounded join — corpus size only "
    "touches the first rollup",
)
def q148(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    li, o = c.table("lineitem"), c.table("orders")
    base = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    cents = F.sum(
        F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5)
    ).cast("long")

    def topk(year: int, rcol: str):
        rev = (
            base.filter(F.year("o_orderdate") == year)
            .groupBy(F.col("o_custkey").alias("c"))
            .agg(cents.alias("cents"))
        )
        w = Window.orderBy(F.col("cents").desc(), "c")
        return (
            rev.withColumn(rcol, F.row_number().over(w))
            .filter(F.col(rcol) <= 10)
            .select("c", rcol)
        )

    j = topk(1994, "ra").join(topk(1995, "rb"), "c").select(
        F.greatest("ra", "rb").alias("md")
    )
    n = j.agg(
        F.count(F.lit(1)).cast("long").alias("n_common"),
        F.coalesce(F.sum(F.expr(_RBO_CASE)), F.lit(0)).cast("long").alias("rbo_carrier"),
    )
    return n.select(
        "n_common",
        "rbo_carrier",
        F.expr(
            "floor((rbo_carrier / 2.52e13) * 1000000 + 0.5) / 1000000"
        ).alias("rbo"),
    )


@_q(
    "q149_sprt",
    """WITH d AS (SELECT ts::DATE AS day, count(*)::BIGINT AS n,
                       sum(CASE WHEN value > 50 THEN 1 ELSE 0 END)::BIGINT AS k
               FROM events GROUP BY 1),
       s AS (SELECT day, n, k,
                    sum(k * 251314 + (n - k) * (-167054))
                      OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)::BIGINT
                      AS llr_micro
             FROM d)
       SELECT strftime(day, '%Y-%m-%d') AS day, n, k, llr_micro,
              CASE WHEN llr_micro >= 2944439 THEN 'accept_h1'
                   WHEN llr_micro <= -2944439 THEN 'accept_h0'
                   ELSE 'continue' END AS state
       FROM s ORDER BY day""",
    note="Wald's SPRT (sequential probability ratio test) over the "
    "daily event stream — the always-valid sequential A/B decision "
    "rule the fixed-horizon tests (KS/chi-square/Mann-Whitney in this "
    "suite) cannot give: success = value > 50, H0 p=0.35 vs H1 "
    "p=0.45, alpha = beta = 0.05.  Cross-engine float protocol: the "
    "per-day log-likelihood increment k*ln(p1/p0) + (n-k)*ln(q1/q0) "
    "uses PRE-COMPUTED micro-nat integer literals (251314 / -167054; "
    "decision boundary +-ln(19) = 2944439 micro-nats), so the "
    "cumulative LLR is an exact bigint running sum — no transcendental "
    "evaluated in-engine, no float accumulation at all.  Scale: one "
    "map-side-combined day rollup, then a running sum over the "
    "30-row day frame — corpus size only touches the rollup",
)
def q149(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("value") > 50, 1).otherwise(0)).cast("long").alias("k"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    s = d.withColumn(
        "llr_micro",
        F.sum(F.col("k") * 251314 + (F.col("n") - F.col("k")) * (-167054))
        .over(w)
        .cast("long"),
    )
    return s.select(
        F.col("day").cast("string").alias("day"),
        "n",
        "k",
        "llr_micro",
        F.when(F.col("llr_micro") >= 2944439, "accept_h1")
        .when(F.col("llr_micro") <= -2944439, "accept_h0")
        .otherwise("continue")
        .alias("state"),
    ).orderBy("day")


@_q(
    "q150_consistent_hashing",
    """WITH vn AS (SELECT 's'||s_suppkey AS node,
                        ('0x'||substr(md5('s'||s_suppkey), 1, 15))::BIGINT AS h
               FROM supplier),
       ky AS (SELECT 'c'||c_custkey AS key,
                     ('0x'||substr(md5('c'||c_custkey), 1, 15))::BIGINT AS h
              FROM customer),
       ring AS (SELECT h, node, NULL AS key FROM vn
                UNION ALL SELECT h, NULL, key FROM ky),
       nxt AS (SELECT h, node, key,
                      min(CASE WHEN node IS NOT NULL THEN h END)
                        OVER (ORDER BY h
                              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                        AS owner_h
               FROM ring),
       asg AS (SELECT key,
                      coalesce(owner_h, (SELECT min(h) FROM vn)) AS owner_h
               FROM nxt WHERE key IS NOT NULL)
       SELECT vn.node AS node, count(*)::BIGINT AS n_keys
       FROM asg JOIN vn ON vn.h = asg.owner_h
       GROUP BY 1 ORDER BY n_keys DESC, node LIMIT 20""",
    note="consistent-hashing ring assignment (the shard/cache routing "
    "primitive — how a 1000-node serving tier maps keys to owners "
    "with minimal movement on membership change): suppliers are ring "
    "vnodes at md5 positions, each customer key is owned by the first "
    "vnode clockwise (min vnode hash >= key hash, wrapping to the "
    "global min).  Compiled as ONE ordered pass over the unioned "
    "(hash, type) stream with a conditional min over the following "
    "frame — the as-of-join shape, not a per-key probe join; all "
    "carriers are the repo's md5 15-hex-digit bigints, so both "
    "engines agree bit-for-bit.  Scale: a range-partitioned "
    "sort-merge over |keys|+|vnodes| rows; the top-20 load counts "
    "expose the ring-imbalance that real systems fix with more "
    "vnodes per node (stddev ~ 1/sqrt(vnodes))",
)
def q150(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    h15 = lambda col: F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    vn = c.table("supplier").select(
        F.concat(F.lit("s"), F.col("s_suppkey")).alias("node")
    ).select("node", h15(F.col("node")).alias("h"))
    ky = c.table("customer").select(
        F.concat(F.lit("c"), F.col("c_custkey")).alias("key")
    ).select("key", h15(F.col("key")).alias("h"))
    ring = vn.select("h", "node", F.lit(None).cast("string").alias("key")).unionByName(
        ky.select("h", F.lit(None).cast("string").alias("node"), "key")
    )
    w = Window.orderBy("h").rowsBetween(0, Window.unboundedFollowing)
    nxt = ring.withColumn(
        "owner_h",
        F.min(F.when(F.col("node").isNotNull(), F.col("h"))).over(w),
    )
    min_h = vn.agg(F.min("h").alias("__wrap"))
    asg = (
        nxt.filter(F.col("key").isNotNull())
        .crossJoin(F.broadcast(min_h))
        .select("key", F.coalesce("owner_h", "__wrap").alias("owner_h"))
    )
    return (
        asg.join(vn.select("node", F.col("h").alias("owner_h")), "owner_h")
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
        .orderBy(F.col("n_keys").desc(), "node")
        .limit(20)
    )


@_q(
    "q151_rendezvous_hashing",
    """WITH vn AS (SELECT 's'||s_suppkey AS node FROM supplier),
       ky AS (SELECT 'c'||c_custkey AS key FROM customer),
       sc AS (SELECT ky.key, vn.node,
                     ('0x'||substr(md5(ky.key||'|'||vn.node), 1, 15))::BIGINT
                       AS hv
              FROM ky CROSS JOIN vn),
       own AS (SELECT key, max_by(node, hv) AS node FROM sc GROUP BY 1)
       SELECT node, count(*)::BIGINT AS n_keys
       FROM own GROUP BY 1 ORDER BY n_keys DESC, node LIMIT 20""",
    note="rendezvous (highest-random-weight) hashing — q150's ring's "
    "sibling and the scheme that replaced it in most modern routers "
    "(no vnode imbalance: every key independently ranks ALL nodes, so "
    "loads are multinomial-tight without virtual-node tricks, and "
    "losing a node moves ONLY its own keys): owner = argmax over "
    "nodes of md5(key‖node), via one broadcast crossJoin against the "
    "node list + a max_by per key (exact — md5 carriers are distinct, "
    "so the argmax is unique and engine-stable).  Scale: HRW is "
    "inherently O(|nodes|) per key; the node list broadcasts (it is "
    "the cluster membership, thousands at most) and the per-key "
    "argmax is one map-side-combined aggregate — no shuffle of the "
    "key-node product, only of (key, owner) pairs",
)
def q151(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    vn = c.table("supplier").select(
        F.concat(F.lit("s"), F.col("s_suppkey")).alias("node")
    )
    ky = c.table("customer").select(
        F.concat(F.lit("c"), F.col("c_custkey")).alias("key")
    )
    sc = ky.crossJoin(F.broadcast(vn)).select(
        "key",
        "node",
        F.conv(
            F.substring(F.md5(F.concat_ws("|", "key", "node")), 1, 15), 16, 10
        )
        .cast("long")
        .alias("hv"),
    )
    own = sc.groupBy("key").agg(F.expr("max_by(node, hv)").alias("node"))
    return (
        own.groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
        .orderBy(F.col("n_keys").desc(), "node")
        .limit(20)
    )


def _dtw_band_oracle(n: int = 30, w: int = 3, big: int = 10**15) -> str:
    """Oracle for t88: the Sakoe-Chiba-banded DTW lattice unrolled
    row-wise (t85's closed form, restricted to |i-j| <= w; out-of-band
    cells are the BIG sentinel, which the running min discards wherever
    a finite in-band path exists)."""

    def series(name: str, etype: str) -> str:
        return f"""{name} AS (
         SELECT s.m, coalesce(t.c, 0)::BIGINT AS v
         FROM (SELECT unnest(range(1, {n + 1})) AS m) s
         LEFT JOIN (SELECT day(ts) AS m, count(*) AS c
                    FROM events WHERE event_type = '{etype}' GROUP BY 1) t
         ON t.m = s.m)"""

    ctes = [
        series("sa", "click"),
        series("sb", "view"),
        f"""lat AS MATERIALIZED (SELECT a.m AS i, b.m AS j,
           abs(a.v - b.v)::BIGINT AS d
         FROM sa a CROSS JOIN sb b WHERE abs(a.m - b.m) <= {w})""",
        """r1 AS MATERIALIZED (SELECT j, (sum(d) OVER (ORDER BY j))::BIGINT AS c
         FROM lat WHERE i = 1)""",
    ]
    for i in range(2, n + 1):
        # m(t) = min(c_prev(t), c_prev(t-1)) with out-of-band cells as
        # the BIG sentinel: TWO explicit left joins, because at the
        # band's trailing edge only t-1 exists in the previous row and
        # a lag() over the previous row's own frame would lose that
        # legal diagonal move entirely.  MATERIALIZED is load-bearing:
        # each level references the previous one twice, and DuckDB 1.0
        # would otherwise inline the chain exponentially (the g29
        # lesson).
        ctes.append(
            f"""r{i} AS MATERIALIZED (
         SELECT j, (dsum + mn)::BIGINT AS c FROM (
           SELECT j, sum(d) OVER (ORDER BY j) AS dsum,
                  min(m2 - dp) OVER (ORDER BY j) AS mn
           FROM (
             SELECT l.j, l.d,
                    least(coalesce(p0.c, {big}), coalesce(p1.c, {big})) AS m2,
                    coalesce(sum(l.d) OVER (ORDER BY l.j
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS dp
             FROM (SELECT j, d FROM lat WHERE i = {i}) l
             LEFT JOIN r{i - 1} p0 ON p0.j = l.j
             LEFT JOIN r{i - 1} p1 ON p1.j = l.j - 1) q) q2)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT j::INT AS j, c::BIGINT AS cost FROM r{n} ORDER BY j"
    )


@_q(
    "t88_dtw_band",
    _dtw_band_oracle(),
    note="Sakoe-Chiba-banded DTW (|i-j| <= 3) between the 30-day "
    "click-vs-view daily count series — t85's elastic alignment at "
    "2.5x the series length, with the band constraint every practical "
    "DTW deployment uses (it forbids pathological alignments AND cuts "
    "the lattice from n^2 to ~2wn cells, the knob that makes DTW "
    "feasible on long series).  Same row-collapse closed form as t85 "
    "(c(i,j) = D(j) + min_t<=j(m(t) - D(t-1)), one prefix-sum + one "
    "running-min window per row), with out-of-band predecessor cells "
    "entering as a 10^15 BIG sentinel the running min discards "
    "wherever a finite in-band path exists — exact BIGINT carriers "
    "throughout, no floats; the previous row left-joins so band edges "
    "null-extend to the sentinel identically in both engines.  "
    "30 chained window stages over <= 7-row band frames, lineage "
    "truncated mid-chain; like all of the collapse-then-compute "
    "family the corpus only touches the initial day rollup",
)
def t88(spark: SparkSession, sf_dir: str) -> DataFrame:
    n, w_band, big = 30, 3, 10**15
    ev = Catalog(spark, sf_dir).table("events")
    spine = spark.range(1, n + 1).select(F.col("id").cast("int").alias("m"))

    def series(etype: str, out: str) -> DataFrame:
        cnt = (
            ev.filter(F.col("event_type") == etype)
            .groupBy(F.dayofmonth("ts").alias("m"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        return spine.join(cnt, "m", "left").select(
            F.col("m").alias(out), F.coalesce("c", F.lit(0)).cast("long").alias("v")
        )

    lat = (
        series("click", "i")
        .withColumnRenamed("v", "va")
        .crossJoin(series("view", "j").withColumnRenamed("v", "vb"))
        .filter(F.abs(F.col("i") - F.col("j")) <= w_band)
        .select("i", "j", F.abs(F.col("va") - F.col("vb")).cast("long").alias("d"))
        .coalesce(1)  # ~2wn = 208 cells — one partition, 30 cheap scans
        .localCheckpoint(eager=True)
    )
    wj = Window.orderBy("j")
    prev = lat.filter(F.col("i") == 1).select(
        "j", F.sum("d").over(wj).cast("long").alias("c")
    )
    for i in range(2, n + 1):
        # m(t) = min(c_prev(t), c_prev(t-1)) via TWO left joins: at the
        # band's trailing edge only t-1 exists in the previous row, and
        # a lag() over the previous row's own frame would drop that
        # legal diagonal move (out-of-band cells -> BIG sentinel)
        # m(t) needs prev at BOTH t and t-1, but prev must be referenced
        # exactly ONCE: localCheckpoint copies the origin plan's
        # sizeInBytes into the LogicalRDD, so two references per level
        # SQUARE the stats BigInt — its digit count doubles per level
        # and stats estimation alone goes exponential (measured: level
        # 18 0.85s, 20 3.2s, 22 15.4s...).  One explode into both roles
        # (j carrying c0, j+1 carrying c1) + a 7-row groupBy keeps the
        # stats product linear; the join side is broadcast (each side
        # <= 7 rows — without the hint every level pays a full
        # shuffle-partitions-wide exchange, measured 1024 tasks/level)
        pp = (
            prev.select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col("j").alias("j"),
                            F.col("c").alias("c0"),
                            F.lit(None).cast("long").alias("c1"),
                        ),
                        F.struct(
                            (F.col("j") + 1).alias("j"),
                            F.lit(None).cast("long").alias("c0"),
                            F.col("c").alias("c1"),
                        ),
                    )
                ).alias("r")
            )
            .select("r.j", "r.c0", "r.c1")
            .groupBy("j")
            .agg(F.min("c0").alias("c0"), F.min("c1").alias("c1"))
        )
        q = (
            lat.filter(F.col("i") == i)
            .select("j", "d")
            .join(F.broadcast(pp), "j", "left")
            .select(
                "j",
                "d",
                F.least(
                    F.coalesce("c0", F.lit(big)), F.coalesce("c1", F.lit(big))
                ).alias("m2"),
                F.coalesce(
                    F.sum("d").over(
                        wj.rowsBetween(Window.unboundedPreceding, -1)
                    ),
                    F.lit(0),
                ).alias("dp"),
            )
        )
        q2 = q.select(
            "j",
            F.sum("d").over(wj).alias("dsum"),
            F.min(F.col("m2") - F.col("dp")).over(wj).alias("mn"),
        )
        prev = q2.select("j", (F.col("dsum") + F.col("mn")).cast("long").alias("c"))
        if i < n:
            # checkpoint EVERY level: p0/p1 reference prev twice, so an
            # un-truncated logical plan doubles per level (2^30 tree
            # copies by the last row); 29 eager jobs over <=7-row
            # frames cost ~seconds, the exponential analysis does not
            prev = prev.localCheckpoint(eager=True)
    return prev.select(
        F.col("j").cast("int").alias("j"), F.col("c").alias("cost")
    ).orderBy("j")


@_q(
    "q152_stratified_ips",
    """WITH s AS (
         SELECT l_returnflag AS stratum,
                count(*) AS n,
                sum(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END) AS nt,
                sum(CASE WHEN l_discount >= 0.05
                         THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS sty,
                sum(CASE WHEN l_discount < 0.05
                         THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS scy
         FROM lineitem GROUP BY 1)
       SELECT stratum, n::BIGINT AS n, nt::BIGINT AS n_treated,
              floor(1e4 * (nt::DOUBLE / n) + 0.5) / 1e4 AS propensity,
              floor(1e4 * (sty::DOUBLE / nt - scy::DOUBLE / (n - nt)) + 0.5)
                / 1e4 AS ate
       FROM s ORDER BY stratum""",
    note="stratified inverse-propensity estimate of a treatment "
    "effect (the observational-causal screen behind 'did the "
    "discount move quantity?'): treatment = discount >= 5%, outcome "
    "= quantity, strata = return flag.  Within a stratum the "
    "propensity e_s = n_t/n is constant, so the IPS estimator "
    "sum(TY)/e_s - sum((1-T)Y)/(1-e_s) over n_s collapses EXACTLY to "
    "the within-stratum mean difference — every carrier (counts, "
    "treated/control outcome sums) is an exact BIGINT and the only "
    "doubles are two final divisions floored half-up at 4 dp (the "
    "g10 protocol).  Shape: ONE map-side-combined groupBy over the "
    "fact table, 3 output rows; at 100 TB this is a single scan — "
    "the estimator's cost is the scan, not the statistics",
)
def q152(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    treated = F.col("l_discount") >= 0.05
    qty = F.col("l_quantity").cast("long")
    s = li.groupBy(F.col("l_returnflag").alias("stratum")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(treated, 1).otherwise(0)).alias("nt"),
        F.sum(F.when(treated, qty).otherwise(0)).alias("sty"),
        F.sum(F.when(~treated, qty).otherwise(0)).alias("scy"),
    )
    return s.select(
        "stratum",
        F.col("n").cast("long").alias("n"),
        F.col("nt").cast("long").alias("n_treated"),
        (
            F.floor(F.lit(1e4) * (F.col("nt").cast("double") / F.col("n")) + F.lit(0.5))
            / F.lit(1e4)
        ).alias("propensity"),
        (
            F.floor(
                F.lit(1e4)
                * (
                    F.col("sty").cast("double") / F.col("nt")
                    - F.col("scy").cast("double") / (F.col("n") - F.col("nt"))
                )
                + F.lit(0.5)
            )
            / F.lit(1e4)
        ).alias("ate"),
    ).orderBy("stratum")


@_q(
    "q153_anova",
    """WITH c AS (SELECT o_orderpriority AS grp,
                    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
              FROM orders),
       g AS (SELECT grp, count(*) AS n_g, sum(cents)::BIGINT AS s_g
             FROM c GROUP BY 1),
       tot AS (SELECT sum(n_g)::BIGINT AS n, sum(s_g)::BIGINT AS s,
                      count(*)::BIGINT AS k
               FROM g),
       gm AS (SELECT g.grp, g.n_g, g.s_g,
                     g.s_g::DOUBLE / g.n_g / 100.0 AS md_g,
                     t.s::DOUBLE / t.n / 100.0 AS md,
                     t.n, t.k
              FROM g CROSS JOIN tot t),
       ssb AS (SELECT sum(CAST(floor(100 * n_g * (md_g - md) * (md_g - md)
                                     + 0.5) AS BIGINT))::BIGINT AS ssb_x100,
                      max(n) AS n, max(k) AS k
               FROM gm),
       ssw AS (SELECT sum(CAST(floor(100 * (c.cents / 100.0 - gm.md_g)
                                         * (c.cents / 100.0 - gm.md_g)
                                     + 0.5) AS BIGINT))::BIGINT AS ssw_x100
               FROM c JOIN gm ON c.grp = gm.grp)
       SELECT ssb.k AS k, ssb.n AS n,
              (ssb.k - 1)::BIGINT AS dof_between,
              (ssb.n - ssb.k)::BIGINT AS dof_within,
              ssb.ssb_x100, ssw.ssw_x100,
              floor(1e4 * ((ssb.ssb_x100::DOUBLE / (ssb.k - 1))
                           / (ssw.ssw_x100::DOUBLE / (ssb.n - ssb.k)))
                    + 0.5) / 1e4 AS f_stat
       FROM ssb CROSS JOIN ssw""",
    note="one-way ANOVA F-test of order value across the five order "
    "priorities (the 'does this categorical feature matter for this "
    "continuous outcome' screen, completing the q132 chi-sq / q131 "
    "KS / q133 Mann-Whitney test family).  Float protocol (q132's): "
    "money enters as exact cents BIGINTs; group and grand means are "
    "single textually-identical double divisions of exact carriers; "
    "each between-group term n_g*(m_g-m)^2 and each PER-ROW within "
    "term (x-m_g)^2 is floored half-up to a x100 BIGINT and SUMMED "
    "AS INTEGERS, so no float accumulation order exists anywhere — "
    "ssb/ssw are hash-exact integers, F their one rounded ratio.  "
    "Magnitude bound (the q132 discipline): per-row x100 terms are "
    "~1.4e12, so ssw_x100 stays under 2^63 through sf1 (~2e18); "
    "beyond that, drop the x100 scale (dollars^2 floor) — same "
    "protocol, one fewer digit.  Shape: one groupBy for moments, one "
    "broadcast join of 5 group rows back onto the fact scan for the "
    "within terms — two scans, zero shuffles beyond the 5-row agg; "
    "at 100 TB the per-row term stays in whole-stage codegen",
)
def q153(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    c = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    g = c.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_g"), F.sum("cents").alias("s_g")
    )
    tot = g.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.sum("s_g").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    gm = g.crossJoin(F.broadcast(tot)).select(
        "grp",
        "n_g",
        (F.col("s_g").cast("double") / F.col("n_g") / F.lit(100.0)).alias("md_g"),
        (F.col("s").cast("double") / F.col("n") / F.lit(100.0)).alias("md"),
        "n",
        "k",
    )
    ssb = gm.agg(
        F.sum(
            F.floor(
                F.lit(100)
                * F.col("n_g")
                * (F.col("md_g") - F.col("md"))
                * (F.col("md_g") - F.col("md"))
                + F.lit(0.5)
            ).cast("long")
        )
        .cast("long")
        .alias("ssb_x100"),
        F.max("n").alias("n"),
        F.max("k").alias("k"),
    )
    ssw = (
        c.join(F.broadcast(gm.select("grp", "md_g")), "grp")
        .agg(
            F.sum(
                F.floor(
                    F.lit(100)
                    * (F.col("cents") / F.lit(100.0) - F.col("md_g"))
                    * (F.col("cents") / F.lit(100.0) - F.col("md_g"))
                    + F.lit(0.5)
                ).cast("long")
            )
            .cast("long")
            .alias("ssw_x100")
        )
    )
    return ssb.crossJoin(F.broadcast(ssw)).select(
        F.col("k"),
        F.col("n"),
        (F.col("k") - 1).cast("long").alias("dof_between"),
        (F.col("n") - F.col("k")).cast("long").alias("dof_within"),
        "ssb_x100",
        "ssw_x100",
        (
            F.floor(
                F.lit(1e4)
                * (
                    (F.col("ssb_x100").cast("double") / (F.col("k") - 1))
                    / (F.col("ssw_x100").cast("double") / (F.col("n") - F.col("k")))
                )
                + F.lit(0.5)
            )
            / F.lit(1e4)
        ).alias("f_stat"),
    )


@_q(
    "q154_split_conformal",
    """WITH base AS (
         SELECT o_orderkey AS ok, o_orderpriority AS grp,
                CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
                strpos('0123456789abcdef',
                       substring(md5(o_orderkey::VARCHAR), 1, 1)) - 1 AS h
         FROM orders),
       tr AS (SELECT grp, count(*)::BIGINT AS nt, sum(cents)::BIGINT AS st
              FROM base WHERE h < 8 GROUP BY 1),
       cal AS (SELECT b.grp, b.ok,
                      abs(b.cents * t.nt - t.st)::BIGINT AS score
               FROM base b JOIN tr t ON t.grp = b.grp
               WHERE b.h BETWEEN 8 AND 11),
       kq AS (SELECT grp, count(*)::BIGINT AS n_cal,
                     ((count(*) + 1) * 9 + 9) // 10 AS k
              FROM cal GROUP BY 1),
       qh AS (SELECT c.grp, c.score AS qhat_scaled FROM (
                SELECT grp, score,
                       row_number() OVER (PARTITION BY grp
                                          ORDER BY score, ok) AS rn
                FROM cal) c JOIN kq ON kq.grp = c.grp AND c.rn = kq.k),
       test AS (SELECT b.grp, count(*)::BIGINT AS n_test,
                       sum(CASE WHEN abs(b.cents * t.nt - t.st)
                                     <= q.qhat_scaled
                                THEN 1 ELSE 0 END)::BIGINT AS covered
                FROM base b JOIN tr t ON t.grp = b.grp
                JOIN qh q ON q.grp = b.grp
                WHERE b.h >= 12 GROUP BY 1)
       SELECT t2.grp, tr.nt AS n_train, kq.n_cal, t2.n_test, t2.covered,
              floor(1e2 * (q.qhat_scaled::DOUBLE / tr.nt / 100.0) + 0.5)
                / 1e2 AS qhat_dollars,
              floor(1e4 * (t2.covered::DOUBLE / t2.n_test) + 0.5) / 1e4
                AS coverage
       FROM test t2 JOIN tr ON tr.grp = t2.grp
       JOIN kq ON kq.grp = t2.grp JOIN qh q ON q.grp = t2.grp
       ORDER BY t2.grp""",
    note="split conformal prediction intervals, group-conditional (the "
    "distribution-free uncertainty wrapper modern pipelines put around "
    "ANY point predictor): md5-parity three-way split (8/4/4 train/"
    "cal/test), predictor = train mean per priority, nonconformity = "
    "|y - mean|, q_hat = ceil((n_cal+1)*0.9)-th smallest calibration "
    "score, coverage = share of test rows inside ±q_hat (expected "
    ">= 90%).  EXACT INTEGER protocol throughout: |y - S/n| is carried "
    "as |y*n - S| (scaled by the constant per-group train count), so "
    "scores, the order-statistic selection, the ceil(k) index "
    "(integer // math) and the coverage comparison are ALL bigint "
    "ops — the only doubles are the two display divisions at the "
    "end.  Shape: one groupBy for train moments, one window for the "
    "order statistic (per-group calibration rows), one broadcast "
    "join back for coverage — two scans at any corpus size",
)
def q154(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    base = o.select(
        F.col("o_orderkey").alias("ok"),
        F.col("o_orderpriority").alias("grp"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1), 16, 10)
        .cast("int")
        .alias("h"),
    )
    tr = (
        base.filter(F.col("h") < 8)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("nt"),
            F.sum("cents").cast("long").alias("st"),
        )
    )
    cal = (
        base.filter((F.col("h") >= 8) & (F.col("h") <= 11))
        .join(F.broadcast(tr), "grp")
        .select(
            "grp",
            "ok",
            F.abs(F.col("cents") * F.col("nt") - F.col("st"))
            .cast("long")
            .alias("score"),
        )
    )
    kq = cal.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_cal"),
        F.expr("((count(1) + 1) * 9 + 9) DIV 10").alias("k"),
    )
    w = Window.partitionBy("grp").orderBy("score", "ok")
    qh = (
        cal.withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(kq), "grp")
        .filter(F.col("rn") == F.col("k"))
        .select("grp", F.col("score").alias("qhat_scaled"))
    )
    test = (
        base.filter(F.col("h") >= 12)
        .join(F.broadcast(tr), "grp")
        .join(F.broadcast(qh), "grp")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(
                F.when(
                    F.abs(F.col("cents") * F.col("nt") - F.col("st"))
                    <= F.col("qhat_scaled"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("covered"),
        )
    )
    return (
        test.join(tr.select("grp", F.col("nt").alias("n_train")), "grp")
        .join(kq.select("grp", "n_cal"), "grp")
        .join(qh, "grp")
        .join(tr.select("grp", "nt"), "grp")
        .select(
            "grp",
            "n_train",
            "n_cal",
            "n_test",
            "covered",
            (
                F.floor(
                    F.lit(1e2)
                    * (F.col("qhat_scaled").cast("double") / F.col("nt") / F.lit(100.0))
                    + F.lit(0.5)
                )
                / F.lit(1e2)
            ).alias("qhat_dollars"),
            (
                F.floor(
                    F.lit(1e4) * (F.col("covered").cast("double") / F.col("n_test"))
                    + F.lit(0.5)
                )
                / F.lit(1e4)
            ).alias("coverage"),
        )
        .orderBy("grp")
    )


def _dft_trig(n: int = 32, kmax: int = 6) -> list[tuple[int, int, int, int]]:
    """x1e3-scaled cos/sin literals for an n-point DFT at frequencies
    k=1..kmax, floored half-up — computed ONCE in Python and embedded
    in BOTH engines as literal tables, so no engine evaluates a
    transcendental (the q148 suffix-weight / q149 ln-literal
    protocol).  Rows: (k, t, c, s)."""
    import math

    rows = []
    for k in range(1, kmax + 1):
        for t in range(n):
            ang = 2.0 * math.pi * k * t / n
            rows.append(
                (
                    k,
                    t,
                    math.floor(1000 * math.cos(ang) + 0.5),
                    math.floor(1000 * math.sin(ang) + 0.5),
                )
            )
    return rows


_DFT_N, _DFT_KMAX = 32, 6
_DFT_VALUES = ", ".join(
    f"({k}, {t}, {c}, {s})" for k, t, c, s in _dft_trig(_DFT_N, _DFT_KMAX)
)


@_q(
    "t89_periodogram",
    f"""WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             count(*)::BIGINT AS x
           FROM events GROUP BY 1),
       s AS (SELECT row_number() OVER (ORDER BY d) - 1 AS t, x FROM d),
       trig(k, t, c, sn) AS (SELECT * FROM (VALUES {_DFT_VALUES})
                             v(k, t, c, sn)),
       f AS (SELECT trig.k,
                    sum(s.x * trig.c)::BIGINT AS a,
                    sum(s.x * trig.sn)::BIGINT AS b
             FROM trig JOIN s ON s.t = trig.t
             GROUP BY 1),
       nd AS (SELECT count(*)::BIGINT AS n_days FROM s)
       SELECT f.k::INT AS k, nd.n_days,
              CAST(floor(100.0 * {_DFT_N} / f.k + 0.5) AS BIGINT)
                AS period_days_x100,
              (f.a * f.a + f.b * f.b)::BIGINT AS power_x1m
       FROM f CROSS JOIN nd ORDER BY k""",
    note="periodogram (32-point DFT power at frequencies k=1..6) of "
    "the daily event-count series — the spectral seasonality detector "
    "that complements t43's ACF (a peak at k means a period of 32/k "
    "days).  Float protocol: cos/sin enter BOTH engines as x1e3 "
    "integer literals computed once in Python (no engine evaluates a "
    "transcendental — the q149 ln-literal idiom), so the Fourier "
    "sums A_k, B_k and the power A²+B² (x1e6 scale) are EXACT "
    "BIGINTs end-to-end; days beyond the 32-point window drop "
    "(truncation, declared) and missing days zero-pad by absence.  "
    "Shape: the fact scan collapses to <= 32 daily rows, then a "
    "192-row broadcast literal join + one groupBy — the spectral "
    "pass costs exactly one aggregation of the pre-rolled series at "
    "any corpus size",
)
def t89(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    s = daily.select(
        (F.row_number().over(Window.orderBy("d")) - 1).alias("t"), "x"
    )
    trig = spark.createDataFrame(
        _dft_trig(_DFT_N, _DFT_KMAX), "k int, t int, c long, sn long"
    )
    f = (
        F.broadcast(trig)
        .join(s, "t")
        .groupBy("k")
        .agg(
            F.sum(F.col("x") * F.col("c")).cast("long").alias("a"),
            F.sum(F.col("x") * F.col("sn")).cast("long").alias("b"),
        )
    )
    nd = s.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    return (
        f.crossJoin(F.broadcast(nd))
        .select(
            F.col("k").cast("int").alias("k"),
            "n_days",
            F.floor(F.lit(100.0) * F.lit(_DFT_N) / F.col("k") + F.lit(0.5))
            .cast("long")
            .alias("period_days_x100"),
            (F.col("a") * F.col("a") + F.col("b") * F.col("b"))
            .cast("long")
            .alias("power_x1m"),
        )
        .orderBy("k")
    )


@_q(
    "q156_column_profile",
    """WITH p AS (
         SELECT count(*) AS n,
                sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS nn1,
                count(DISTINCT o_orderkey) AS nd1,
                min(o_orderkey)::VARCHAR AS mn1,
                max(o_orderkey)::VARCHAR AS mx1,
                sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS nn2,
                count(DISTINCT o_custkey) AS nd2,
                min(o_custkey)::VARCHAR AS mn2,
                max(o_custkey)::VARCHAR AS mx2,
                sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
                  AS nn3,
                count(DISTINCT o_orderpriority) AS nd3,
                min(o_orderpriority) AS mn3,
                max(o_orderpriority) AS mx3,
                sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS nn4,
                count(DISTINCT o_orderdate) AS nd4,
                strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S.%f') AS mn4,
                strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S.%f') AS mx4
         FROM orders)
       SELECT col_name, n::BIGINT AS n_rows, n_null::BIGINT AS n_null,
              n_distinct::BIGINT AS n_distinct, min_str, max_str
       FROM (
         SELECT 'o_orderkey' AS col_name, n, nn1 AS n_null, nd1 AS n_distinct,
                mn1 AS min_str, mx1 AS max_str FROM p
         UNION ALL
         SELECT 'o_custkey', n, nn2, nd2, mn2, mx2 FROM p
         UNION ALL
         SELECT 'o_orderpriority', n, nn3, nd3, mn3, mx3 FROM p
         UNION ALL
         SELECT 'o_orderdate', n, nn4, nd4, mn4, mx4 FROM p)
       ORDER BY col_name""",
    note="column data-quality profile (the deequ/dbt-style audit a "
    "pipeline runs before trusting a new drop): per column, row/null/"
    "exact-distinct counts and typed min/max rendered to strings "
    "AFTER aggregation (cast-then-min would sort '10' < '9'); the "
    "timestamp column renders through the shared µs format so both "
    "engines agree byte-for-byte.  ONE aggregation pass computes all "
    "four columns' stats (Catalyst plans the multi-distinct with a "
    "single Expand — still one scan), then a literal struct-array "
    "explode unpivots the 1-row result.  At 100 TB swap "
    "countDistinct for approx_count_distinct per column — same "
    "plan shape minus the Expand",
)
def q156(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph_spark.operators.relational import profile_columns

    o = Catalog(spark, sf_dir).table("orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderpriority",
        ts_str(F.col("o_orderdate")).alias("o_orderdate"),
    )
    return profile_columns(o).orderBy("col_name")


@_q(
    "q155_diff_in_diff",
    """WITH cell AS (
         SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
                  AS treated,
                CASE WHEN o.o_orderdate >= TIMESTAMP '1996-01-01'
                     THEN 1 ELSE 0 END AS post,
                count(*) AS n,
                sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                  AS s
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         GROUP BY 1, 2),
       m AS (SELECT treated, post, n,
                    s::DOUBLE / n / 100.0 AS mean FROM cell)
       SELECT
         sum(CASE WHEN treated = 1 AND post = 0 THEN n END)::BIGINT
           AS n_t_pre,
         sum(CASE WHEN treated = 1 AND post = 1 THEN n END)::BIGINT
           AS n_t_post,
         sum(CASE WHEN treated = 0 AND post = 0 THEN n END)::BIGINT
           AS n_c_pre,
         sum(CASE WHEN treated = 0 AND post = 1 THEN n END)::BIGINT
           AS n_c_post,
         floor(1e2 * max(CASE WHEN treated = 1 AND post = 0 THEN mean END)
               + 0.5) / 1e2 AS m_t_pre,
         floor(1e2 * max(CASE WHEN treated = 1 AND post = 1 THEN mean END)
               + 0.5) / 1e2 AS m_t_post,
         floor(1e2 * max(CASE WHEN treated = 0 AND post = 0 THEN mean END)
               + 0.5) / 1e2 AS m_c_pre,
         floor(1e2 * max(CASE WHEN treated = 0 AND post = 1 THEN mean END)
               + 0.5) / 1e2 AS m_c_post,
         floor(1e2 * (max(CASE WHEN treated = 1 AND post = 1 THEN mean END)
                      - max(CASE WHEN treated = 1 AND post = 0 THEN mean END)
                      - max(CASE WHEN treated = 0 AND post = 1 THEN mean END)
                      + max(CASE WHEN treated = 0 AND post = 0 THEN mean END))
               + 0.5) / 1e2 AS did
       FROM m""",
    note="difference-in-differences estimate (the panel-data causal "
    "design, completing the q146 CUPED / q152 IPS family): treated = "
    "BUILDING-segment customers, event = the 1996-01-01 boundary, "
    "outcome = order value; DiD = (treated post-pre change) minus "
    "(control post-pre change), which nets out both the group level "
    "difference and the common time trend.  Exact protocol: the four "
    "cell sums/counts are BIGINTs from one groupBy; each cell mean is "
    "ONE textually-identical double division; the estimate is a fixed "
    "4-term expression of those means floored half-up at 2 dp — no "
    "aggregation of floats anywhere (the max(CASE) pivots touch "
    "exactly one non-null value each).  Shape: one broadcast dim "
    "join + a 4-cell groupBy — a single scan at any corpus size",
)
def q155(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    o = c.table("orders")
    cust = c.table("customer")
    cell = (
        o.join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
        .groupBy(
            F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias(
                "treated"
            ),
            F.when(
                F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"), 1
            )
            .otherwise(0)
            .alias("post"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("s"),
        )
    )
    m = cell.select(
        "treated",
        "post",
        "n",
        (F.col("s").cast("double") / F.col("n") / F.lit(100.0)).alias("mean"),
    )

    def cn(t, p):
        return F.sum(
            F.when((F.col("treated") == t) & (F.col("post") == p), F.col("n"))
        ).cast("long")

    def cm(t, p):
        return F.max(
            F.when((F.col("treated") == t) & (F.col("post") == p), F.col("mean"))
        )

    def r2(col):
        return F.floor(F.lit(1e2) * col + F.lit(0.5)) / F.lit(1e2)

    return m.agg(
        cn(1, 0).alias("n_t_pre"),
        cn(1, 1).alias("n_t_post"),
        cn(0, 0).alias("n_c_pre"),
        cn(0, 1).alias("n_c_post"),
        r2(cm(1, 0)).alias("m_t_pre"),
        r2(cm(1, 1)).alias("m_t_post"),
        r2(cm(0, 0)).alias("m_c_pre"),
        r2(cm(0, 1)).alias("m_c_post"),
        r2(cm(1, 1) - cm(1, 0) - cm(0, 1) + cm(0, 0)).alias("did"),
    )


@_q(
    "q157_k_anonymity",
    """WITH g AS (SELECT c_mktsegment AS seg, c_nationkey AS nat,
                  CAST(floor(c_acctbal/1000) AS BIGINT) AS band,
                  count(*)::BIGINT AS k,
                  count(DISTINCT CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END)::BIGINT
                    AS l_div
           FROM customer GROUP BY 1, 2, 3),
       b AS (SELECT CASE WHEN k = 1 THEN 'k=1' WHEN k < 5 THEN 'k=2-4'
                         WHEN k < 10 THEN 'k=5-9' ELSE 'k>=10' END AS k_bucket,
                    count(*)::BIGINT AS n_groups, sum(k)::BIGINT AS n_rows,
                    sum(CASE WHEN l_div = 1 THEN 1 ELSE 0 END)::BIGINT
                      AS n_groups_uniform
             FROM g GROUP BY 1)
       SELECT k_bucket, n_groups, n_rows,
              floor(10000.0 * n_rows / sum(n_rows) OVER () + 0.5) / 100
                AS pct_rows,
              n_groups_uniform
       FROM b ORDER BY k_bucket""",
    note="k-anonymity / l-diversity audit (the privacy gate a "
    "training-data release pipeline runs before publishing): quasi-"
    "identifiers = (segment, nation, account-balance band); each QI "
    "group's size k buckets into the re-identification risk bands, "
    "and n_groups_uniform counts groups with NO diversity in the "
    "sensitive bit (negative balance) — the homogeneity-attack "
    "surface l-diversity guards.  All counts are exact integers; the "
    "only doubles are the floor-half-up percentage.  Shape: one "
    "groupBy on the QI tuple then a 4-row rollup — one shuffle at "
    "any corpus size, same as exact dedup",
)
def q157(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = Catalog(spark, sf_dir).table("customer")
    g = cust.groupBy(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").alias("nat"),
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("band"),
    ).agg(
        F.count(F.lit(1)).alias("k"),
        F.countDistinct(
            F.when(F.col("c_acctbal") < 0, 1).otherwise(0)
        ).alias("l_div"),
    )
    b = g.groupBy(
        F.when(F.col("k") == 1, "k=1")
        .when(F.col("k") < 5, "k=2-4")
        .when(F.col("k") < 10, "k=5-9")
        .otherwise("k>=10")
        .alias("k_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("k").alias("n_rows"),
        F.sum(F.when(F.col("l_div") == 1, 1).otherwise(0)).alias(
            "n_groups_uniform"
        ),
    )
    return b.select(
        "k_bucket",
        "n_groups",
        "n_rows",
        (
            F.floor(
                F.lit(10000.0)
                * F.col("n_rows")
                / F.sum("n_rows").over(Window.partitionBy())
                + F.lit(0.5)
            )
            / 100
        ).alias("pct_rows"),
        "n_groups_uniform",
    ).orderBy("k_bucket")


@_q(
    "q158_kruskal_wallis",
    """WITH v AS (SELECT o_orderpriority AS grp,
                  CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents
           FROM orders),
       r AS (SELECT grp,
                    rank() OVER (ORDER BY cents) AS rmin,
                    count(*) OVER (PARTITION BY cents) AS t,
                    count(*) OVER () AS n
             FROM v),
       g AS (SELECT grp, count(*)::BIGINT AS n_j,
                    sum(2*rmin + t - 1)::BIGINT AS carrier, max(n) AS n
             FROM r GROUP BY 1),
       terms AS (SELECT grp, n_j, carrier, n,
                        CAST(floor((carrier/2.0)*(carrier/2.0)/n_j*100.0 + 0.5)
                             AS BIGINT) AS t100
                 FROM g),
       ties AS (SELECT sum(t*t*t - t)::BIGINT AS tsum
                FROM (SELECT count(*)::BIGINT AS t FROM v GROUP BY cents)),
       agg AS (SELECT max(n)::BIGINT AS n, sum(t100)::BIGINT AS st,
                      count(*)::BIGINT AS k FROM terms)
       SELECT a.n, a.k,
              round(12.0 * (a.st / 100.0) / (a.n * (a.n + 1.0))
                    - 3.0 * (a.n + 1.0), 4) AS h,
              round(1.0 - ties.tsum / (a.n * 1.0 * a.n * a.n - a.n), 8)
                AS tie_c,
              round((12.0 * (a.st / 100.0) / (a.n * (a.n + 1.0))
                     - 3.0 * (a.n + 1.0))
                    / (1.0 - ties.tsum / (a.n * 1.0 * a.n * a.n - a.n)), 4)
                AS h_adj
       FROM agg a, ties""",
    note="Kruskal-Wallis rank H test (the nonparametric ANOVA beside "
    "q153's parametric one and q133's two-sample Mann-Whitney): "
    "groups = order priority, values = price ranked on exact cents.  "
    "Exact protocol: the average rank of a tie group is "
    "(rmin + rmax)/2, so TWICE it is the integer 2*rmin + t - 1 — "
    "each group's rank-sum carrier sum(2r) is an exact BIGINT; the "
    "per-group R_j^2/n_j term is ONE textually-fixed double "
    "expression floored half-up at 2dp into a BIGINT so the "
    "cross-group sum is order-free; the tie correction "
    "1 - sum(t^3-t)/(n^3-n) is integer-carried the same way.  H uses "
    "a global rank — one ordered pass (the q150 shape); at 100 TB "
    "rank via range-partitioned sort, everything downstream is "
    "per-group",
)
def q158(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    v = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    r = v.select(
        "grp",
        F.rank().over(Window.orderBy("cents")).alias("rmin"),
        F.count(F.lit(1)).over(Window.partitionBy("cents")).alias("t"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    g = r.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_j"),
        F.sum(2 * F.col("rmin") + F.col("t") - 1).cast("long").alias("carrier"),
        F.max("n").alias("n"),
    )
    terms = g.select(
        "n_j",
        "n",
        F.floor(
            (F.col("carrier") / F.lit(2.0))
            * (F.col("carrier") / F.lit(2.0))
            / F.col("n_j")
            * F.lit(100.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("t100"),
    )
    ties = (
        v.groupBy("cents")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
            .cast("long")
            .alias("tsum")
        )
    )
    agg = terms.agg(
        F.max("n").cast("long").alias("n"),
        F.sum("t100").cast("long").alias("st"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    j = agg.crossJoin(F.broadcast(ties))
    h = (
        F.lit(12.0) * (F.col("st") / F.lit(100.0)) / (F.col("n") * (F.col("n") + F.lit(1.0)))
        - F.lit(3.0) * (F.col("n") + F.lit(1.0))
    )
    tie_c = F.lit(1.0) - F.col("tsum") / (
        F.col("n") * F.lit(1.0) * F.col("n") * F.col("n") - F.col("n")
    )
    return j.select(
        "n",
        "k",
        F.round(h, 4).alias("h"),
        F.round(tie_c, 8).alias("tie_c"),
        F.round(h / tie_c, 4).alias("h_adj"),
    )


@_q(
    "q159_bh_fdr",
    """WITH v AS (SELECT o_orderpriority AS grp,
                  CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)
                  + CASE WHEN o_orderpriority = '1-URGENT'
                         THEN CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)
                              // 10
                         ELSE 0 END AS cents
           FROM orders),
       cum AS (
         SELECT grp, cents,
                count(*) OVER (PARTITION BY grp ORDER BY cents
                               RANGE UNBOUNDED PRECEDING) AS cg,
                count(*) OVER (ORDER BY cents
                               RANGE UNBOUNDED PRECEDING) AS cp,
                count(*) OVER (PARTITION BY grp) AS ng,
                count(*) OVER () AS n
         FROM v),
       d AS (SELECT grp, max(abs(cg * n - cp * ng))::BIGINT AS d_int,
                    max(ng)::BIGINT AS ng, max(n)::BIGINT AS n
             FROM cum GROUP BY 1),
       p AS (SELECT grp, ng, round(d_int / (ng * 1.0 * n), 6) AS d_stat,
                    CASE WHEN 2.0 * exp(-2.0 * (d_int * 1.0 * d_int)
                                        / (ng * 1.0 * n * n)) > 1.0
                         THEN 1.0
                         ELSE 2.0 * exp(-2.0 * (d_int * 1.0 * d_int)
                                        / (ng * 1.0 * n * n)) END AS pval
             FROM d),
       ranked AS (SELECT grp, ng, d_stat, pval,
                         row_number() OVER (ORDER BY pval, grp) AS i,
                         count(*) OVER () AS m
                  FROM p),
       bh AS (SELECT grp, ng, d_stat, pval, i,
                     0.10 * i / m AS thresh,
                     max(CASE WHEN pval <= 0.10 * i / m THEN i ELSE 0 END)
                       OVER () AS i_max
              FROM ranked)
       SELECT grp, ng, d_stat, round(pval, 8) AS pval, i::BIGINT AS i,
              round(thresh, 4) AS bh_thresh,
              CASE WHEN i <= i_max THEN 1 ELSE 0 END AS rejected
       FROM bh ORDER BY i""",
    note="Benjamini-Hochberg FDR step-up — the multiple-testing "
    "control every metrics platform needs once it tests many "
    "segments at once (q103/q155 test ONE hypothesis; this decides "
    "which of m simultaneous ones survive at FDR q=0.10): per-group "
    "KS distance to the pooled distribution carried as the exact "
    "integer max|cg*n - cp*ng|, p-value from the distribution-free "
    "DKW bound min(1, 2*exp(-2*ng*d^2)) (conservative, closed-form — "
    "no inverse-CDF tables), then the step-up: reject all i <= "
    "max{i: p_(i) <= q*i/m} via a windowed running max, which is "
    "exactly how BH differs from a naive per-test cut.  A 10% price "
    "shift is PLANTED on the urgent class (the g112 planted-null "
    "harness) so rejection provably fires: the shifted group AND the "
    "two neighbors its pooled-ECDF drag exposes reject at sf0.01 — "
    "i=3 rejects at p=0.023 <= 0.06 where a Bonferroni 0.02 would "
    "keep it.  Scale: ECDFs are two ordered window passes; "
    "everything after is per-group (m rows)",
)
def q159(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    base_cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    v = o.select(
        F.col("o_orderpriority").alias("grp"),
        (
            base_cents
            + F.when(
                F.col("o_orderpriority") == "1-URGENT",
                (base_cents / 10).cast("long"),
            ).otherwise(F.lit(0))
        ).alias("cents"),
    )
    cum = v.select(
        "grp",
        F.count(F.lit(1))
        .over(Window.partitionBy("grp").orderBy("cents"))
        .alias("cg"),
        F.count(F.lit(1)).over(Window.orderBy("cents")).alias("cp"),
        F.count(F.lit(1)).over(Window.partitionBy("grp")).alias("ng"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    d = cum.groupBy("grp").agg(
        F.max(F.abs(F.col("cg") * F.col("n") - F.col("cp") * F.col("ng")))
        .cast("long")
        .alias("d_int"),
        F.max("ng").cast("long").alias("ng"),
        F.max("n").cast("long").alias("n"),
    )
    raw_p = F.lit(2.0) * F.exp(
        F.lit(-2.0)
        * (F.col("d_int") * F.lit(1.0) * F.col("d_int"))
        / (F.col("ng") * F.lit(1.0) * F.col("n") * F.col("n"))
    )
    p = d.select(
        "grp",
        "ng",
        F.round(
            F.col("d_int") / (F.col("ng") * F.lit(1.0) * F.col("n")), 6
        ).alias("d_stat"),
        F.when(raw_p > 1.0, F.lit(1.0)).otherwise(raw_p).alias("pval"),
    )
    ranked = p.select(
        "grp",
        "ng",
        "d_stat",
        "pval",
        F.row_number().over(Window.orderBy("pval", "grp")).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("m"),
    )
    thresh = F.lit(0.10) * F.col("i") / F.col("m")
    bh = ranked.select(
        "grp",
        "ng",
        "d_stat",
        "pval",
        "i",
        thresh.alias("thresh"),
        F.max(F.when(F.col("pval") <= thresh, F.col("i")).otherwise(0))
        .over(Window.partitionBy())
        .alias("i_max"),
    )
    return bh.select(
        "grp",
        "ng",
        "d_stat",
        F.round("pval", 8).alias("pval"),
        F.col("i").cast("long").alias("i"),
        F.round("thresh", 4).alias("bh_thresh"),
        F.when(F.col("i") <= F.col("i_max"), 1).otherwise(0).alias("rejected"),
    ).orderBy("i")


@_q(
    "q160_association_strength",
    """WITH cells AS (SELECT c_mktsegment AS x, c_nationkey AS y,
                           count(*)::BIGINT AS o
                    FROM customer GROUP BY 1, 2),
       tot AS (SELECT sum(o)::BIGINT AS n FROM cells),
       rt AS (SELECT x, sum(o)::BIGINT AS rx FROM cells GROUP BY 1),
       ct AS (SELECT y, sum(o)::BIGINT AS cy FROM cells GROUP BY 1),
       terms AS (
         SELECT c.x, c.y,
                CAST(floor(((c.o*t.n - r.rx*t2.cy)*1.0
                            *(c.o*t.n - r.rx*t2.cy))
                           / (t.n*1.0*r.rx*t2.cy) * 1000000.0 + 0.5)
                     AS BIGINT) AS chi1e6,
                CAST(floor(-(c.o/(t.n*1.0)) * ln(c.o/(t2.cy*1.0))
                           * 1000000000.0 + 0.5) AS BIGINT) AS hxy1e9,
                t.n
         FROM cells c JOIN rt r USING (x) JOIN ct t2 USING (y)
         CROSS JOIN tot t),
       hx AS (SELECT sum(CAST(floor(-(rx/(t.n*1.0)) * ln(rx/(t.n*1.0))
                                    * 1000000000.0 + 0.5) AS BIGINT)
                        )::BIGINT AS hx1e9
              FROM rt, tot t),
       agg AS (SELECT max(n)::BIGINT AS n,
                      count(DISTINCT x)::BIGINT AS r,
                      count(DISTINCT y)::BIGINT AS c,
                      sum(chi1e6)::BIGINT AS s_chi,
                      sum(hxy1e9)::BIGINT AS s_hxy
               FROM terms)
       SELECT n, r, c,
              round(s_chi/1e6, 4) AS chi2,
              round(sqrt((s_chi/1e6) / (n*1.0*(least(r, c) - 1))), 6)
                AS cramers_v,
              round(hx.hx1e9/1e9, 6) AS h_x,
              round(s_hxy/1e9, 6) AS h_x_given_y,
              round((hx.hx1e9/1e9 - s_hxy/1e9) / (hx.hx1e9/1e9), 6)
                AS theils_u
       FROM agg, hx""",
    note="categorical ASSOCIATION STRENGTH — effect sizes where "
    "q71/q132 stop at the test statistic: Cramer's V = "
    "sqrt(chi2/(n*(min(r,c)-1))) (symmetric, 0..1) and Theil's "
    "uncertainty coefficient U(X|Y) = (H(X) - H(X|Y))/H(X) "
    "(ASYMMETRIC — how much knowing the nation shrinks segment "
    "entropy), over segment x nation.  Exact protocol: each cell's "
    "chi-square term is (o*n - rt*ct)^2/(n*rt*ct) — numerator an "
    "exact BIGINT — floored x1e6; entropy terms -(o/n)*ln(o/ct) "
    "floored x1e9; both integer-summed so the <=125-cell "
    "accumulation is order-free, with single closing divisions.  "
    "Shape: one contingency groupBy + two marginal rollups, "
    "broadcast-joined back — a 125-row problem after the first "
    "shuffle at any corpus size",
)
def q160(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = Catalog(spark, sf_dir).table("customer")
    cells = cust.groupBy(
        F.col("c_mktsegment").alias("x"), F.col("c_nationkey").alias("y")
    ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    tot = cells.agg(F.sum("o").cast("long").alias("n"))
    rt = cells.groupBy("x").agg(F.sum("o").cast("long").alias("rx"))
    ct = cells.groupBy("y").agg(F.sum("o").cast("long").alias("cy"))
    num = F.col("o") * F.col("n") - F.col("rx") * F.col("cy")
    terms = (
        cells.join(F.broadcast(rt), "x")
        .join(F.broadcast(ct), "y")
        .crossJoin(F.broadcast(tot))
        .select(
            "x",
            "y",
            F.floor(
                (num * F.lit(1.0) * num)
                / (F.col("n") * F.lit(1.0) * F.col("rx") * F.col("cy"))
                * F.lit(1000000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("chi1e6"),
            F.floor(
                -(F.col("o") / (F.col("n") * F.lit(1.0)))
                * F.log(F.col("o") / (F.col("cy") * F.lit(1.0)))
                * F.lit(1000000000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("hxy1e9"),
            "n",
        )
    )
    hx = (
        rt.crossJoin(F.broadcast(tot))
        .select(
            F.floor(
                -(F.col("rx") / (F.col("n") * F.lit(1.0)))
                * F.log(F.col("rx") / (F.col("n") * F.lit(1.0)))
                * F.lit(1000000000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("t")
        )
        .agg(F.sum("t").cast("long").alias("hx1e9"))
    )
    agg = terms.agg(
        F.max("n").cast("long").alias("n"),
        F.countDistinct("x").cast("long").alias("r"),
        F.countDistinct("y").cast("long").alias("c"),
        F.sum("chi1e6").cast("long").alias("s_chi"),
        F.sum("hxy1e9").cast("long").alias("s_hxy"),
    )
    j = agg.crossJoin(F.broadcast(hx))
    chi2 = F.col("s_chi") / F.lit(1e6)
    hx_d = F.col("hx1e9") / F.lit(1e9)
    hxy_d = F.col("s_hxy") / F.lit(1e9)
    return j.select(
        "n",
        "r",
        "c",
        F.round(chi2, 4).alias("chi2"),
        F.round(
            F.sqrt(
                chi2 / (F.col("n") * F.lit(1.0) * (F.least("r", "c") - 1))
            ),
            6,
        ).alias("cramers_v"),
        F.round(hx_d, 6).alias("h_x"),
        F.round(hxy_d, 6).alias("h_x_given_y"),
        F.round((hx_d - hxy_d) / hx_d, 6).alias("theils_u"),
    )


@_q(
    "q161_reservoir_ares",
    """WITH it AS (
         SELECT 'o'||o_orderkey AS okey, o_totalprice AS w,
                (('0x'||substr(md5('o'||o_orderkey), 1, 15))::BIGINT
                 % 1000000000000 + 1) / 1000000000000.0 AS u
         FROM orders),
       pri AS (SELECT okey, w, -ln(u) / w AS pri FROM it)
       SELECT okey, w, round(pri * 1e6, 8) AS pri_x1e6
       FROM pri
       QUALIFY row_number() OVER (ORDER BY pri, okey) <= 20
       ORDER BY pri, okey""",
    note="weighted reservoir sampling, A-Res (Efraimidis-Spirakis) — "
    "the one-pass distributed sampler behind every "
    "weight-proportional corpus subsample (DSIR/temperature mixing "
    "pick WHAT to favor; this is HOW you draw it at scale without "
    "a global normalizing pass): each item gets priority "
    "-ln(u)/w (the exponential-race form of u^(1/w), "
    "monotone-identical ordering and numerically tamer), u from the "
    "repo's md5 15-hex-digit bigint carrier so both engines draw "
    "THE SAME deterministic uniforms; the sample is the k smallest "
    "priorities.  Selection uses the raw double (identical in both "
    "engines — one ln, one division); the x1e6 rounding is display "
    "only.  Shape: one map pass + a global top-k (TakeOrdered — "
    "no full sort); merging per-partition top-k heaps is exactly "
    "how A-Res distributes, which is the point of declaring it",
)
def q161(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph_spark.operators.sampling import weighted_reservoir_sample

    o = Catalog(spark, sf_dir).table("orders")
    it = o.select(
        F.concat(F.lit("o"), F.col("o_orderkey").cast("string")).alias(
            "okey"
        ),
        F.col("o_totalprice").alias("w"),
    )
    return (
        weighted_reservoir_sample(it, "okey", "w", k=20)
        .orderBy("pri", "okey")
        .select(
            "okey",
            "w",
            F.round(F.col("pri") * F.lit(1e6), 8).alias("pri_x1e6"),
        )
    )


@_q(
    "q162_huber_location",
    """WITH v AS (SELECT CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS x
               FROM orders),
       st AS (SELECT median(x) AS med, count(*)::BIGINT AS n,
                     sum(x)::BIGINT AS s FROM v),
       md AS (SELECT median(abs(x - st.med)) AS mad FROM v, st),
       kk AS (SELECT 1.345 * (1.4826 * md.mad) AS k FROM md),
       m0 AS (SELECT st.s * 1.0 / st.n AS mu FROM st),
       i1 AS (SELECT sum(w * x)::BIGINT AS swx, sum(w)::BIGINT AS sw FROM
              (SELECT x, CAST(floor((CASE WHEN abs(x - m0.mu) <= kk.k
                                          THEN 1.0
                                          ELSE kk.k / abs(x - m0.mu) END)
                                    * 100000.0 + 0.5) AS BIGINT) AS w
               FROM v, m0, kk) s1),
       m1 AS (SELECT swx * 1.0 / sw AS mu FROM i1),
       i2 AS (SELECT sum(w * x)::BIGINT AS swx, sum(w)::BIGINT AS sw FROM
              (SELECT x, CAST(floor((CASE WHEN abs(x - m1.mu) <= kk.k
                                          THEN 1.0
                                          ELSE kk.k / abs(x - m1.mu) END)
                                    * 100000.0 + 0.5) AS BIGINT) AS w
               FROM v, m1, kk) s2),
       m2 AS (SELECT swx * 1.0 / sw AS mu FROM i2),
       i3 AS (SELECT sum(w * x)::BIGINT AS swx, sum(w)::BIGINT AS sw FROM
              (SELECT x, CAST(floor((CASE WHEN abs(x - m2.mu) <= kk.k
                                          THEN 1.0
                                          ELSE kk.k / abs(x - m2.mu) END)
                                    * 100000.0 + 0.5) AS BIGINT) AS w
               FROM v, m2, kk) s3),
       m3 AS (SELECT swx * 1.0 / sw AS mu FROM i3)
       SELECT st.n, round(st.med / 100.0, 4) AS med,
              round(md.mad / 100.0, 4) AS mad,
              round(kk.k / 100.0, 4) AS k_huber,
              round(m0.mu / 100.0, 4) AS mean,
              round(m1.mu / 100.0, 4) AS mu1,
              round(m2.mu / 100.0, 4) AS mu2,
              round(m3.mu / 100.0, 4) AS mu3
       FROM st, md, kk, m0, m1, m2, m3""",
    note="Huber M-estimator of location via 3 unrolled IRLS rounds — "
    "the between-mean-and-median robust estimator completing the "
    "q119 winsorize / q142 Theil-Sen / t25 MAD family: tuning "
    "k = 1.345 * 1.4826 * MAD (the 95%-efficiency constant on the "
    "MAD-consistent sigma), weights w = min(1, k/|x - mu|), "
    "mu' = sum(w*x)/sum(w).  Exact protocol: cents are BIGINTs; each "
    "round's weights are ONE per-row double expression floored "
    "half-up x1e5 into BIGINTs, so the weighted sums are order-free "
    "integer sums and each round's mu is a single closing division "
    "(textually identical in both engines).  Shape: one aggregate "
    "pass per round over the value column + a broadcast 1-row state "
    "join — 3 fixed rounds, no convergence loop, no driver state",
)
def q162(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    v = o.select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("x")
    )
    st = v.agg(
        F.median("x").alias("med"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    md = (
        v.crossJoin(F.broadcast(st.select("med")))
        .agg(F.median(F.abs(F.col("x") - F.col("med"))).alias("mad"))
    )
    kk = md.select((F.lit(1.345) * (F.lit(1.4826) * F.col("mad"))).alias("k"))
    m0 = st.select((F.col("s") * F.lit(1.0) / F.col("n")).alias("mu"))

    def irls(mu_df: DataFrame) -> DataFrame:
        w = F.floor(
            F.when(
                F.abs(F.col("x") - F.col("mu")) <= F.col("k"), F.lit(1.0)
            ).otherwise(F.col("k") / F.abs(F.col("x") - F.col("mu")))
            * F.lit(100000.0)
            + F.lit(0.5)
        ).cast("long")
        agg = (
            v.crossJoin(F.broadcast(mu_df))
            .crossJoin(F.broadcast(kk))
            .select("x", w.alias("w"))
            .agg(
                F.sum(F.col("w") * F.col("x")).cast("long").alias("swx"),
                F.sum("w").cast("long").alias("sw"),
            )
        )
        return agg.select(
            (F.col("swx") * F.lit(1.0) / F.col("sw")).alias("mu")
        )

    m1 = irls(m0)
    m2 = irls(m1)
    m3 = irls(m2)

    def r4(col, name):
        return F.round(col / F.lit(100.0), 4).alias(name)

    return (
        st.crossJoin(F.broadcast(md))
        .crossJoin(F.broadcast(kk))
        .crossJoin(F.broadcast(m0.select(F.col("mu").alias("mu0"))))
        .crossJoin(F.broadcast(m1.select(F.col("mu").alias("mu1_"))))
        .crossJoin(F.broadcast(m2.select(F.col("mu").alias("mu2_"))))
        .crossJoin(F.broadcast(m3.select(F.col("mu").alias("mu3_"))))
        .select(
            "n",
            r4(F.col("med"), "med"),
            r4(F.col("mad"), "mad"),
            r4(F.col("k"), "k_huber"),
            r4(F.col("mu0"), "mean"),
            r4(F.col("mu1_"), "mu1"),
            r4(F.col("mu2_"), "mu2"),
            r4(F.col("mu3_"), "mu3"),
        )
    )


@_q(
    "q163_jonckheere_trend",
    """WITH v AS (SELECT o_orderpriority AS g,
                  CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)
                  + (CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)
                     * (strpos('12345', substring(o_orderpriority, 1, 1))
                        - 1)) // 40 AS x
           FROM orders),
       vals AS (SELECT DISTINCT x FROM v),
       grps AS (SELECT DISTINCT g FROM v),
       cnt AS (SELECT g, x, count(*)::BIGINT AS c FROM v GROUP BY 1, 2),
       dense AS (
         SELECT gr.g, va.x, COALESCE(c.c, 0)::BIGINT AS eq,
                sum(COALESCE(c.c, 0)) OVER (PARTITION BY gr.g
                                            ORDER BY va.x)::BIGINT AS cum
         FROM grps gr CROSS JOIN vals va
         LEFT JOIN cnt c ON c.g = gr.g AND c.x = va.x),
       u2 AS (
         SELECT sum(j.eq * (2 * i.cum - i.eq))::BIGINT AS jt2
         FROM dense j JOIN dense i ON i.x = j.x AND i.g < j.g
         WHERE j.eq > 0),
       ns AS (SELECT g, count(*)::BIGINT AS n_g FROM v GROUP BY 1),
       tot AS (SELECT sum(n_g)::BIGINT AS n, sum(n_g*n_g)::BIGINT AS sn2,
                      sum(n_g*n_g*(2*n_g + 3))::BIGINT AS sn23 FROM ns)
       SELECT t.n, u2.jt2,
              round(u2.jt2 / 2.0, 1) AS jt,
              round((t.n * t.n - t.sn2) / 4.0, 1) AS e_jt,
              round((t.n * 1.0 * t.n * (2 * t.n + 3) - t.sn23) / 72.0, 1)
                AS var_jt,
              round((u2.jt2 / 2.0 - (t.n * t.n - t.sn2) / 4.0)
                    / sqrt((t.n * 1.0 * t.n * (2 * t.n + 3) - t.sn23)
                           / 72.0), 4) AS z
       FROM u2, tot t""",
    note="Jonckheere-Terpstra ordered-alternative trend test — the "
    "dose-response question q153/q158 cannot answer (they detect ANY "
    "difference; JT detects a MONOTONE one across the ordered "
    "priority classes): JT = sum over class pairs i<j of Mann-"
    "Whitney U_ij, carried exactly as the integer "
    "2U = sum_v eq_j(v)*(2*cum_i(v) - eq_i(v)) over the per-class "
    "dense ECDF lattice (ties get their half-credit with no floats); "
    "null mean (n^2 - sum n_g^2)/4 and variance [n^2(2n+3) - "
    "sum n_g^2(2n_g+3)]/72 from exact integer marginals, z as the "
    "single closing expression.  A 2.5%-per-class price gradient is "
    "PLANTED (the q159 harness discipline) so the test provably "
    "fires: z = 5.05 at sf0.01.  Scale: the dense lattice is "
    "|classes| x |distinct values| — the collapse-then-compute "
    "family; the pairwise-class join is 10 group pairs over the "
    "collapsed frame, never row pairs",
)
def q163(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    v = o.select(
        F.col("o_orderpriority").alias("g"),
        (cents + F.expr(
            "(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)"
            " * (locate(substring(o_orderpriority, 1, 1), '12345') - 1))"
            " DIV 40"
        )).alias("x"),
    )
    vals = v.select("x").distinct()
    grps = v.select("g").distinct()
    cnt = v.groupBy("g", "x").agg(F.count(F.lit(1)).cast("long").alias("c"))
    dense = (
        grps.crossJoin(vals)
        .join(cnt, ["g", "x"], "left")
        .select(
            "g",
            "x",
            F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("eq"),
            F.sum(F.coalesce(F.col("c"), F.lit(0)))
            .over(Window.partitionBy("g").orderBy("x"))
            .cast("long")
            .alias("cum"),
        )
    )
    dj = dense.select(
        F.col("g").alias("gj"), F.col("x"), F.col("eq").alias("eqj")
    ).filter(F.col("eqj") > 0)
    di = dense.select(
        F.col("g").alias("gi"),
        F.col("x"),
        F.col("eq").alias("eqi"),
        F.col("cum").alias("cumi"),
    )
    u2 = (
        dj.join(di, "x")
        .filter(F.col("gi") < F.col("gj"))
        .agg(
            F.sum(F.col("eqj") * (2 * F.col("cumi") - F.col("eqi")))
            .cast("long")
            .alias("jt2")
        )
    )
    ns = v.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("n_g"))
    tot = ns.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.sum(F.col("n_g") * F.col("n_g")).cast("long").alias("sn2"),
        F.sum(F.col("n_g") * F.col("n_g") * (2 * F.col("n_g") + 3))
        .cast("long")
        .alias("sn23"),
    )
    j = u2.crossJoin(F.broadcast(tot))
    jt = F.col("jt2") / F.lit(2.0)
    e_jt = (F.col("n") * F.col("n") - F.col("sn2")) / F.lit(4.0)
    var_jt = (
        F.col("n") * F.lit(1.0) * F.col("n") * (2 * F.col("n") + 3)
        - F.col("sn23")
    ) / F.lit(72.0)
    return j.select(
        "n",
        "jt2",
        F.round(jt, 1).alias("jt"),
        F.round(e_jt, 1).alias("e_jt"),
        F.round(var_jt, 1).alias("var_jt"),
        F.round((jt - e_jt) / F.sqrt(var_jt), 4).alias("z"),
    )


@_q(
    "q164_eb_shrinkage",
    """WITH s AS (SELECT l_suppkey AS sk, count(*)::BIGINT AS n,
                       sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0
                           END)::BIGINT AS k
               FROM lineitem GROUP BY 1),
       sc AS (SELECT sk, n, k,
                     CAST(floor(k / (n * 1.0) * 1000000000.0 + 0.5)
                          AS BIGINT) AS p9,
                     CAST(floor((k / (n * 1.0)) * (k / (n * 1.0))
                                * 1000000000.0 + 0.5) AS BIGINT) AS q9
              FROM s),
       mom AS (SELECT count(*)::BIGINT AS ns, sum(p9)::BIGINT AS sp,
                      sum(q9)::BIGINT AS sq FROM sc),
       prior AS (
         SELECT ns, sp / (ns * 1.0) / 1e9 AS m,
                sq / (ns * 1.0) / 1e9
                  - (sp / (ns * 1.0) / 1e9) * (sp / (ns * 1.0) / 1e9)
                  AS v
         FROM mom),
       ab AS (
         SELECT m,
                CASE WHEN v > 0.0
                      AND m * (1.0 - m) / v - 1.0 > 0.0
                     THEN m * (1.0 - m) / v - 1.0 ELSE 1.0 END AS c
         FROM prior),
       out AS (
         SELECT sc.sk, sc.n, sc.k,
                round(sc.k / (sc.n * 1.0), 6) AS raw_rate,
                round((sc.k + ab.m * ab.c) / (sc.n + ab.c), 6)
                  AS shrunk_rate,
                (sc.k + ab.m * ab.c) / (sc.n + ab.c)
                  - sc.k / (sc.n * 1.0) AS delta_raw
         FROM sc, ab)
       SELECT sk, n, k, raw_rate, shrunk_rate,
              round(delta_raw, 6) AS delta
       FROM out
       QUALIFY row_number() OVER (ORDER BY abs(delta_raw) DESC, sk) <= 15
       ORDER BY abs(delta_raw) DESC, sk""",
    note="empirical-Bayes beta-binomial shrinkage of per-supplier "
    "return rates — the small-sample leaderboard stabilizer (a "
    "3-line supplier with one return is NOT a 33% returner): "
    "method-of-moments prior from the across-supplier mean/variance "
    "of raw rates, each rate and its square floored x1e9 into "
    "BIGINTs so the cross-supplier moment sums are order-free; "
    "prior strength c = m(1-m)/v - 1 (guarded to 1 when the "
    "between-variance underflows), shrunk rate = (k + m*c)/(n + c).  "
    "Output = the 15 biggest raw-vs-shrunk movers, i.e. exactly the "
    "suppliers a naive leaderboard misranks.  Shape: one groupBy to "
    "supplier stats, one 1-row broadcast prior, one ordered top-k",
)
def q164(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    s = li.groupBy(F.col("l_suppkey").alias("sk")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("long")
        .alias("k"),
    )
    p = F.col("k") / (F.col("n") * F.lit(1.0))
    sc = s.select(
        "sk",
        "n",
        "k",
        F.floor(p * F.lit(1000000000.0) + F.lit(0.5))
        .cast("long")
        .alias("p9"),
        F.floor(p * p * F.lit(1000000000.0) + F.lit(0.5))
        .cast("long")
        .alias("q9"),
    )
    mom = sc.agg(
        F.count(F.lit(1)).cast("long").alias("ns"),
        F.sum("p9").cast("long").alias("sp"),
        F.sum("q9").cast("long").alias("sq"),
    )
    m = F.col("sp") / (F.col("ns") * F.lit(1.0)) / F.lit(1e9)
    v = F.col("sq") / (F.col("ns") * F.lit(1.0)) / F.lit(1e9) - m * m
    c_raw = m * (F.lit(1.0) - m) / v - F.lit(1.0)
    ab = mom.select(
        m.alias("m"),
        F.when((v > 0.0) & (c_raw > 0.0), c_raw).otherwise(F.lit(1.0)).alias(
            "c"
        ),
    )
    out = sc.crossJoin(F.broadcast(ab)).select(
        "sk",
        "n",
        "k",
        F.round(F.col("k") / (F.col("n") * F.lit(1.0)), 6).alias("raw_rate"),
        F.round(
            (F.col("k") + F.col("m") * F.col("c")) / (F.col("n") + F.col("c")),
            6,
        ).alias("shrunk_rate"),
        (
            (F.col("k") + F.col("m") * F.col("c")) / (F.col("n") + F.col("c"))
            - F.col("k") / (F.col("n") * F.lit(1.0))
        ).alias("delta_raw"),
    )
    w = Window.orderBy(F.abs(F.col("delta_raw")).desc(), "sk")
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 15)
        .orderBy(F.abs(F.col("delta_raw")).desc(), "sk")
        .select(
            "sk",
            "n",
            "k",
            "raw_rate",
            "shrunk_rate",
            F.round("delta_raw", 6).alias("delta"),
        )
    )


@_q(
    "q165_kendall_tau_b",
    """WITH r AS (SELECT l_suppkey AS sk,
                  sum(CASE WHEN l_shipdate >= TIMESTAMP '1995-01-01'
                            AND l_shipdate < TIMESTAMP '1996-01-01'
                           THEN CAST(floor(l_extendedprice*100 + 0.5)
                                     AS BIGINT) ELSE 0 END)::BIGINT AS x,
                  sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                            AND l_shipdate < TIMESTAMP '1997-01-01'
                           THEN CAST(floor(l_extendedprice*100 + 0.5)
                                     AS BIGINT) ELSE 0 END)::BIGINT AS y
           FROM lineitem GROUP BY 1 HAVING x > 0 AND y > 0),
       p AS (SELECT
               sum(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0
                        THEN 1 ELSE 0 END)::BIGINT AS c,
               sum(CASE WHEN (a.x - b.x) * (a.y - b.y) < 0
                        THEN 1 ELSE 0 END)::BIGINT AS d,
               sum(CASE WHEN a.x = b.x AND a.y <> b.y
                        THEN 1 ELSE 0 END)::BIGINT AS tx,
               sum(CASE WHEN a.y = b.y AND a.x <> b.x
                        THEN 1 ELSE 0 END)::BIGINT AS ty,
               sum(CASE WHEN a.x = b.x AND a.y = b.y
                        THEN 1 ELSE 0 END)::BIGINT AS txy,
               count(*)::BIGINT AS n0
             FROM r a JOIN r b ON a.sk < b.sk)
       SELECT (SELECT count(*) FROM r)::BIGINT AS n,
              c, d, tx, ty, txy, n0,
              round((c - d) / sqrt((n0 - (tx + txy)) * 1.0
                                   * (n0 - (ty + txy))), 6) AS tau_b
       FROM p""",
    note="Kendall's tau-b between two yearly supplier revenue rankings "
    "— the concordance view of rank stability beside Spearman (q136, "
    "moment-based on ranks) and RBO (q148, top-weighted): concordant/"
    "discordant/tied pair counts over exact cent revenues, tau_b = "
    "(C - D)/sqrt((n0 - Tx)(n0 - Ty)) with the tie corrections as "
    "exact integers and ONE closing sqrt.  Shape: the pair census is "
    "a self-join of the COLLAPSED per-supplier frame (|S|^2/2 pairs "
    "— 500k at sf0.1, never row pairs); at larger |S| switch to the "
    "O(S log S) merge-sort inversion count (t49's shape), same "
    "statistic",
)
def q165(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")

    def year_rev(y):
        return (
            F.sum(
                F.when(
                    (F.col("l_shipdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
                    & (
                        F.col("l_shipdate")
                        < F.lit(f"{y + 1}-01-01").cast("timestamp")
                    ),
                    cents,
                ).otherwise(0)
            )
            .cast("long")
        )

    r = (
        li.groupBy(F.col("l_suppkey").alias("sk"))
        .agg(year_rev(1995).alias("x"), year_rev(1996).alias("y"))
        .filter((F.col("x") > 0) & (F.col("y") > 0))
    )
    a = r.select(F.col("sk").alias("ska"), F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = r.select(F.col("sk").alias("skb"), F.col("x").alias("xb"), F.col("y").alias("yb"))
    sgn = (F.col("xa") - F.col("xb")) * (F.col("ya") - F.col("yb"))
    p = (
        a.join(b, F.col("ska") < F.col("skb"))
        .agg(
            F.sum(F.when(sgn > 0, 1).otherwise(0)).cast("long").alias("c"),
            F.sum(F.when(sgn < 0, 1).otherwise(0)).cast("long").alias("d"),
            F.sum(
                F.when(
                    (F.col("xa") == F.col("xb")) & (F.col("ya") != F.col("yb")), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("tx"),
            F.sum(
                F.when(
                    (F.col("ya") == F.col("yb")) & (F.col("xa") != F.col("xb")), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("ty"),
            F.sum(
                F.when(
                    (F.col("xa") == F.col("xb")) & (F.col("ya") == F.col("yb")), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("txy"),
            F.count(F.lit(1)).cast("long").alias("n0"),
        )
    )
    n = r.agg(F.count(F.lit(1)).cast("long").alias("n"))
    tau = (F.col("c") - F.col("d")) / F.sqrt(
        (F.col("n0") - (F.col("tx") + F.col("txy")))
        * F.lit(1.0)
        * (F.col("n0") - (F.col("ty") + F.col("txy")))
    )
    return p.crossJoin(F.broadcast(n)).select(
        "n", "c", "d", "tx", "ty", "txy", "n0", F.round(tau, 6).alias("tau_b")
    )


@_q(
    "q166_inequality_panel",
    """WITH v AS (SELECT c_mktsegment AS seg,
                  CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) + 100000 AS x
           FROM customer),
       st AS (SELECT seg, count(*)::BIGINT AS n, sum(x)::BIGINT AS s
              FROM v GROUP BY 1),
       terms AS (
         SELECT v.seg,
                CAST(floor((v.x / (st.s * 1.0 / st.n))
                           * ln(v.x / (st.s * 1.0 / st.n))
                           * 1000000.0 + 0.5) AS BIGINT) AS t6,
                CAST(floor(ln(v.x * 1.0) * 1000000.0 + 0.5) AS BIGINT)
                  AS l6
         FROM v JOIN st ON st.seg = v.seg),
       agg AS (SELECT seg, sum(t6)::BIGINT AS stt, sum(l6)::BIGINT AS sl,
                      count(*)::BIGINT AS n
               FROM terms GROUP BY 1)
       SELECT a.seg, a.n,
              round((a.stt / 1e6) / a.n, 6) AS theil_t,
              round(1.0 - exp(a.sl / 1e6 / a.n) / (st.s * 1.0 / st.n), 6)
                AS atkinson_1
       FROM agg a JOIN st ON st.seg = a.seg
       ORDER BY a.seg""",
    note="inequality panel per segment: Theil T index (the additively "
    "DECOMPOSABLE inequality measure — the one you can split into "
    "within/between-group parts, which Gini cannot) and the Atkinson "
    "index at aversion 1 (1 - geometric/arithmetic mean ratio), over "
    "balances shifted positive by the fixture's 1000.00 floor — "
    "completing the concentration family beside q102 Lorenz/Gini "
    "and q110 HHI.  Exact protocol: per-row (x/mu)ln(x/mu) and ln(x) "
    "terms floored x1e6 into BIGINTs (the mean mu = s/n is one "
    "division of exact integers, textually identical inside each "
    "term), so both cross-row sums are order-free; Theil is a "
    "closing division and Atkinson one exp.  Shape: two stacked "
    "aggregates with a broadcast stats join between — one data-sized "
    "shuffle at any corpus size",
)
def q166(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = Catalog(spark, sf_dir).table("customer")
    v = cust.select(
        F.col("c_mktsegment").alias("seg"),
        (
            F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long")
            + F.lit(100000)
        ).alias("x"),
    )
    st = v.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    mu = F.col("s") * F.lit(1.0) / F.col("n")
    terms = v.join(F.broadcast(st), "seg").select(
        "seg",
        F.floor(
            (F.col("x") / mu) * F.log(F.col("x") / mu) * F.lit(1000000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("t6"),
        F.floor(F.log(F.col("x") * F.lit(1.0)) * F.lit(1000000.0) + F.lit(0.5))
        .cast("long")
        .alias("l6"),
    )
    agg = terms.groupBy("seg").agg(
        F.sum("t6").cast("long").alias("stt"),
        F.sum("l6").cast("long").alias("sl"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    out = agg.join(F.broadcast(st.select("seg", "s", F.col("n").alias("n2"))), "seg")
    return out.select(
        "seg",
        "n",
        F.round((F.col("stt") / F.lit(1e6)) / F.col("n"), 6).alias("theil_t"),
        F.round(
            F.lit(1.0)
            - F.exp(F.col("sl") / F.lit(1e6) / F.col("n"))
            / (F.col("s") * F.lit(1.0) / F.col("n2")),
            6,
        ).alias("atkinson_1"),
    ).orderBy("seg")


@_q(
    "q167_blocking_audit",
    """WITH base AS (SELECT c_custkey AS k, c_nationkey AS nat,
                          c_acctbal AS bal FROM customer),
       dups AS (SELECT k + 10000000 AS k, nat,
                       bal + ((('0x'||substr(md5('d'||k), 1, 15))::BIGINT
                               % 601) - 300) / 100.0 AS bal
                FROM base),
       uni AS (SELECT k, nat, CAST(floor(bal / 5.0) AS BIGINT) AS band
               FROM base
               UNION ALL
               SELECT k, nat, CAST(floor(bal / 5.0) AS BIGINT) AS band
               FROM dups),
       blocks AS (SELECT nat, band, count(*)::BIGINT AS m FROM uni
                  GROUP BY 1, 2),
       cand AS (SELECT sum(m * (m - 1) / 2)::BIGINT AS c,
                       count(*)::BIGINT AS n_blocks FROM blocks),
       n AS (SELECT count(*)::BIGINT AS nr FROM uni),
       pc AS (SELECT sum(CASE WHEN b.nat = d.nat AND
                                   CAST(floor(b.bal / 5.0) AS BIGINT)
                                   = CAST(floor(d.bal / 5.0) AS BIGINT)
                              THEN 1 ELSE 0 END)::BIGINT AS hit,
                     count(*)::BIGINT AS planted
              FROM base b JOIN dups d ON d.k = b.k + 10000000)
       SELECT n.nr AS n_records, cand.n_blocks, cand.c AS candidates,
              (n.nr * (n.nr - 1) / 2)::BIGINT AS all_pairs,
              round(1.0 - cand.c / (n.nr * (n.nr - 1) / 2.0), 6)
                AS reduction_ratio,
              pc.planted, pc.hit,
              round(pc.hit / (pc.planted * 1.0), 6) AS pair_completeness
       FROM n, cand, pc""",
    note="record-linkage BLOCKING-KEY audit — the eval step q118's "
    "matcher depends on (a bad blocking key either floods the "
    "matcher or loses true pairs before it runs): planted duplicates "
    "= every customer re-keyed with an md5-jittered +/-3.00 balance, "
    "blocking key = (nation, 5.00-balance band); reduction ratio "
    "1 - |candidates|/|all pairs| comes from per-block C(m,2) "
    "ARITHMETIC (candidate pairs are counted, never materialized), "
    "pair completeness from a direct planted-pair key join.  On "
    "this fixture RR 0.9997 at PC 0.70 — the jitter pushes ~30% of "
    "dups across a band boundary, which is exactly the trade-off "
    "the audit exists to expose (fix: adjacent-band OR multi-pass "
    "blocking).  All integers + closing divisions.  Shape: two "
    "groupBys and a key equi-join; nothing quadratic anywhere",
)
def q167(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = Catalog(spark, sf_dir).table("customer")
    base = cust.select(
        F.col("c_custkey").alias("k"),
        F.col("c_nationkey").alias("nat"),
        F.col("c_acctbal").alias("bal"),
    )
    jit = (
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("d"), F.col("k").cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % 601
            - 300
        )
        / F.lit(100.0)
    )
    dups = base.select(
        (F.col("k") + 10000000).alias("k"),
        "nat",
        (F.col("bal") + jit).alias("bal"),
    )
    band = F.floor(F.col("bal") / F.lit(5.0)).cast("long")
    uni = base.select("k", "nat", band.alias("band")).unionByName(
        dups.select("k", "nat", band.alias("band"))
    )
    blocks = uni.groupBy("nat", "band").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    cand = blocks.agg(
        F.sum(F.col("m") * (F.col("m") - 1) / 2).cast("long").alias("c"),
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
    )
    n = uni.agg(F.count(F.lit(1)).cast("long").alias("nr"))
    b = base.select(
        F.col("k"), F.col("nat").alias("natb"), band.alias("bandb")
    )
    d = dups.select(
        (F.col("k") - 10000000).alias("k"),
        F.col("nat").alias("natd"),
        band.alias("bandd"),
    )
    pc = b.join(d, "k").agg(
        F.sum(
            F.when(
                (F.col("natb") == F.col("natd"))
                & (F.col("bandb") == F.col("bandd")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("hit"),
        F.count(F.lit(1)).cast("long").alias("planted"),
    )
    j = n.crossJoin(F.broadcast(cand)).crossJoin(F.broadcast(pc))
    all_pairs = (F.col("nr") * (F.col("nr") - 1) / 2).cast("long")
    return j.select(
        F.col("nr").alias("n_records"),
        "n_blocks",
        F.col("c").alias("candidates"),
        all_pairs.alias("all_pairs"),
        F.round(
            F.lit(1.0)
            - F.col("c") / (F.col("nr") * (F.col("nr") - 1) / F.lit(2.0)),
            6,
        ).alias("reduction_ratio"),
        "planted",
        "hit",
        F.round(F.col("hit") / (F.col("planted") * F.lit(1.0)), 6).alias(
            "pair_completeness"
        ),
    )


@_q(
    "q168_shapley_attribution",
    """WITH u AS (SELECT user_id, date_trunc('week', ts) AS wk,
                  max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)*4
                + max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)*2
                + max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                    AS sid,
                  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS conv
           FROM events GROUP BY 1, 2),
       sub AS (SELECT sid, count(*)::BIGINT AS n, sum(conv)::BIGINT AS k
               FROM u GROUP BY 1),
       piv AS (SELECT
         coalesce(max(CASE WHEN sid = 0 THEN k / (n * 1.0) END), 0.0) AS r0,
         coalesce(max(CASE WHEN sid = 1 THEN k / (n * 1.0) END), 0.0) AS r1,
         coalesce(max(CASE WHEN sid = 2 THEN k / (n * 1.0) END), 0.0) AS r2,
         coalesce(max(CASE WHEN sid = 3 THEN k / (n * 1.0) END), 0.0) AS r3,
         coalesce(max(CASE WHEN sid = 4 THEN k / (n * 1.0) END), 0.0) AS r4,
         coalesce(max(CASE WHEN sid = 5 THEN k / (n * 1.0) END), 0.0) AS r5,
         coalesce(max(CASE WHEN sid = 6 THEN k / (n * 1.0) END), 0.0) AS r6,
         coalesce(max(CASE WHEN sid = 7 THEN k / (n * 1.0) END), 0.0) AS r7,
         sum(n)::BIGINT AS n_journeys
         FROM sub)
       SELECT n_journeys,
         round((r4-r0)/3.0 + (r6-r2)/6.0 + (r5-r1)/6.0 + (r7-r3)/3.0, 6)
           AS phi_view,
         round((r2-r0)/3.0 + (r6-r4)/6.0 + (r3-r1)/6.0 + (r7-r5)/3.0, 6)
           AS phi_click,
         round((r1-r0)/3.0 + (r5-r4)/6.0 + (r3-r2)/6.0 + (r7-r6)/3.0, 6)
           AS phi_signup,
         round(r7 - r0, 6) AS efficiency_check,
         round(r7, 6) AS full_rate, round(r0, 6) AS none_rate
       FROM piv""",
    note="Shapley-value channel attribution (the game-theoretic "
    "data-driven model behind GA4-style attribution — q85/q121 are "
    "the positional heuristics, THIS divides credit axiomatically): "
    "journeys = (user, week), channels = view/click/signup touches, "
    "conversion = purchase; coalition value v(S) = observed "
    "conversion rate of journeys with EXACT touch-set S (the "
    "simplified-Shapley convention, absent subsets valued 0 — "
    "stated, not hidden), and each channel's phi is the closed-form "
    "3-player Shapley sum with weights 1/3, 1/6, 1/3 over its six "
    "marginal contributions.  All v's are single divisions of exact "
    "BIGINTs pivoted by max(CASE); the phis are fixed expressions of "
    "those eight doubles, and the efficiency identity "
    "sum(phi) = v(111) - v(empty) ships as an output column so the "
    "oracle CHECKS the axioms rather than trusting them.  Shape: "
    "one journey groupBy, one 8-row rollup — any corpus size",
)
def q168(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")

    def touch(t):
        return F.max(F.when(F.col("event_type") == t, 1).otherwise(0))

    u = ev.groupBy(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).agg(
        (touch("view") * 4 + touch("click") * 2 + touch("signup")).alias(
            "sid"
        ),
        touch("purchase").alias("conv"),
    )
    sub = u.groupBy("sid").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("conv").cast("long").alias("k"),
    )

    def r(i):
        return F.coalesce(
            F.max(
                F.when(F.col("sid") == i, F.col("k") / (F.col("n") * F.lit(1.0)))
            ),
            F.lit(0.0),
        )

    piv = sub.agg(
        *[r(i).alias(f"r{i}") for i in range(8)],
        F.sum("n").cast("long").alias("n_journeys"),
    )
    c = {i: F.col(f"r{i}") for i in range(8)}
    phi_view = (
        (c[4] - c[0]) / F.lit(3.0)
        + (c[6] - c[2]) / F.lit(6.0)
        + (c[5] - c[1]) / F.lit(6.0)
        + (c[7] - c[3]) / F.lit(3.0)
    )
    phi_click = (
        (c[2] - c[0]) / F.lit(3.0)
        + (c[6] - c[4]) / F.lit(6.0)
        + (c[3] - c[1]) / F.lit(6.0)
        + (c[7] - c[5]) / F.lit(3.0)
    )
    phi_signup = (
        (c[1] - c[0]) / F.lit(3.0)
        + (c[5] - c[4]) / F.lit(6.0)
        + (c[3] - c[2]) / F.lit(6.0)
        + (c[7] - c[6]) / F.lit(3.0)
    )
    return piv.select(
        "n_journeys",
        F.round(phi_view, 6).alias("phi_view"),
        F.round(phi_click, 6).alias("phi_click"),
        F.round(phi_signup, 6).alias("phi_signup"),
        F.round(c[7] - c[0], 6).alias("efficiency_check"),
        F.round(c[7], 6).alias("full_rate"),
        F.round(c[0], 6).alias("none_rate"),
    )


def _daily_order_counts(
    spark: SparkSession, sf_dir: str, lo: str, hi_excl: str, last_day: str
) -> DataFrame:
    """Dense daily order-count series on a date spine (rn, x) — the
    shared input of the t90/t91 sequence estimators.  The spine makes
    zero-order days explicit so both engines fold the SAME sequence."""
    o = Catalog(spark, sf_dir).table("orders")
    cnt = (
        o.filter(
            (F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(hi_excl).cast("timestamp"))
        )
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(lo).cast("date"), F.lit(last_day).cast("date")
            )
        ).alias("day")
    )
    return spine.join(cnt, "day", "left").select(
        F.row_number().over(Window.orderBy("day")).alias("rn"),
        F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("x"),
    )


@_q(
    "t90_holt_winters",
    """WITH RECURSIVE spine AS (
         SELECT day::DATE AS day, row_number() OVER (ORDER BY day) AS rn
         FROM generate_series(DATE '1996-01-01', DATE '1996-06-30',
                              INTERVAL 1 DAY) t(day)),
       x AS (
         SELECT s.rn, COALESCE(c.cnt, 0)::BIGINT AS x
         FROM spine s LEFT JOIN (
           SELECT o_orderdate::DATE AS day, count(*) AS cnt FROM orders
           WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             AND o_orderdate < TIMESTAMP '1996-07-01'
           GROUP BY 1) c ON c.day = s.day),
       seed AS (SELECT sum(x)::BIGINT AS s7 FROM x WHERE rn <= 7),
       init AS (
         SELECT 7 AS rn,
                (SELECT s7 FROM seed)::DOUBLE / 7.0 AS l,
                0.0::DOUBLE AS b,
                (SELECT list(x::DOUBLE - (SELECT s7 FROM seed)::DOUBLE / 7.0
                             ORDER BY rn)
                 FROM x WHERE rn <= 7) AS sl),
       w AS (
         SELECT * FROM init
         UNION ALL
         SELECT r.rn,
                0.3 * (r.x - w.sl[1]) + 0.7 * (w.l + w.b),
                0.1 * ((0.3 * (r.x - w.sl[1]) + 0.7 * (w.l + w.b)) - w.l)
                  + 0.9 * w.b,
                list_concat(w.sl[2:7],
                  [0.2 * (r.x - (0.3 * (r.x - w.sl[1]) + 0.7 * (w.l + w.b)))
                   + 0.8 * w.sl[1]])
         FROM w JOIN x r ON r.rn = w.rn + 1)
       SELECT rn::BIGINT AS n_days, round(l, 6) AS level,
              round(b, 6) AS trend, round(sl[1], 6) AS s_next,
              round(l + b + sl[1], 6) AS forecast_1
       FROM w WHERE rn = (SELECT max(rn) FROM x)""",
    note="Holt-Winters ADDITIVE SEASONAL smoothing (alpha=0.3, "
    "beta=0.1, gamma=0.2, season m=7) over the dense daily order "
    "series — the seasonal member of the t76 EWMA / t82 Holt family: "
    "l' = a(x - s_old) + (1-a)(l+b); b' = beta(l'-l) + (1-beta)b; "
    "s' = gamma(x - l') + (1-gamma)s_old, seeded with l = mean of "
    "the first week (exact integer sum / 7.0), b = 0, s_i = x_i - l.  "
    "Same determinism contract as t82: BOTH engines replay the "
    "literal IEEE recurrence in identical op order — applyInPandas "
    "ordered fold carrying the 7-slot seasonal ring vs a recursive "
    "CTE carrying a LIST column sliced left each step — so the "
    "trajectories are bit-identical; 6dp rounding only at the edge.  "
    "The date spine makes zero-order days explicit, otherwise the "
    "two engines would fold different sequences.  Scale: state is "
    "m+2 doubles per series; embarrassingly parallel across series "
    "keys (here one global series, the fold is 182 steps)",
)
def t90(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    xdf = _daily_order_counts(
        spark, sf_dir, "1996-01-01", "1996-07-01", "1996-06-30"
    )

    def hw(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rn")
        xs = [float(v) for v in pdf["x"]]
        s7 = int(sum(int(v) for v in pdf["x"][:7]))
        l = s7 / 7.0
        sl = [xi - s7 / 7.0 for xi in xs[:7]]
        b = 0.0
        for xv in xs[7:]:
            s_old = sl[0]
            new_l = 0.3 * (xv - s_old) + 0.7 * (l + b)
            new_b = 0.1 * (new_l - l) + 0.9 * b
            new_s = 0.2 * (xv - new_l) + 0.8 * s_old
            sl = sl[1:] + [new_s]
            l, b = new_l, new_b
        return pd.DataFrame(
            {
                "n_days": [len(xs)],
                "level": [l],
                "trend": [b],
                "s_next": [sl[0]],
            }
        )

    return (
        xdf.groupBy(F.lit(1).alias("__g"))
        .applyInPandas(
            lambda pdf: hw(pdf),
            "n_days long, level double, trend double, s_next double",
        )
        .select(
            "n_days",
            F.round("level", 6).alias("level"),
            F.round("trend", 6).alias("trend"),
            F.round("s_next", 6).alias("s_next"),
            F.round(
                F.col("level") + F.col("trend") + F.col("s_next"), 6
            ).alias("forecast_1"),
        )
    )


@_q(
    "t91_hurst_rs",
    """WITH spine AS (
         SELECT day::DATE AS day, row_number() OVER (ORDER BY day) AS rn
         FROM generate_series(DATE '1996-01-01', DATE '1996-12-31',
                              INTERVAL 1 DAY) t(day)),
       x AS (
         SELECT s.rn, COALESCE(c.cnt, 0)::BIGINT AS x
         FROM spine s LEFT JOIN (
           SELECT o_orderdate::DATE AS day, count(*) AS cnt FROM orders
           WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             AND o_orderdate < TIMESTAMP '1997-01-01'
           GROUP BY 1) c ON c.day = s.day),
       sizes AS (SELECT unnest([8, 16, 32, 64]) AS sz),
       rows_b AS (
         SELECT sz, (rn - 1) // sz AS blk, ((rn - 1) % sz) + 1 AS k, x,
                sum(x) OVER (PARTITION BY sz, (rn - 1) // sz
                             ORDER BY rn) AS cx,
                sum(x) OVER (PARTITION BY sz, (rn - 1) // sz) AS sx,
                sum(x*x) OVER (PARTITION BY sz, (rn - 1) // sz) AS sxx
         FROM sizes, x
         WHERE rn <= sz * (366 // sz)),
       bstat AS (
         SELECT sz, blk,
                (max(sz*cx - k*sx) - min(sz*cx - k*sx))::BIGINT AS r_int,
                max(sz*sxx - sx*sx)::BIGINT AS ssq_scaled
         FROM rows_b GROUP BY 1, 2),
       rs AS (
         SELECT sz, CAST(floor(r_int / sqrt(ssq_scaled) * 1000000.0 + 0.5)
                         AS BIGINT) AS rs_x1e6
         FROM bstat WHERE ssq_scaled > 0),
       m AS (
         SELECT sz, count(*)::BIGINT AS n_blocks,
                (sum(rs_x1e6)::DOUBLE / count(*)) / 1000000.0 AS m_rs
         FROM rs GROUP BY 1),
       piv AS (
         SELECT max(CASE WHEN sz = 8 THEN m_rs END) AS m8,
                max(CASE WHEN sz = 16 THEN m_rs END) AS m16,
                max(CASE WHEN sz = 32 THEN m_rs END) AS m32,
                max(CASE WHEN sz = 64 THEN m_rs END) AS m64,
                sum(n_blocks)::BIGINT AS n_blocks
         FROM m)
       SELECT n_blocks, round(m8, 6) AS m8, round(m16, 6) AS m16,
              round(m32, 6) AS m32, round(m64, 6) AS m64,
              round((-1.5*log2(m8) - 0.5*log2(m16) + 0.5*log2(m32)
                     + 1.5*log2(m64)) / 5.0, 4) AS hurst
       FROM piv""",
    note="Hurst exponent by rescaled-range (R/S) analysis over the "
    "dense 1996 daily order series — the long-memory diagnostic "
    "(H=0.5 random walk, H>0.5 persistent) beside t43's ACF and "
    "t71's Taylor law.  Exact protocol: per block of size n, the "
    "mean-adjusted cumulative deviation max-min R and the variance "
    "are carried as the EXACT integers n*cum_k - k*sum and "
    "n*sumsq - sum^2, so R/S = R_int/sqrt(ssq_scaled) is the "
    "block's ONE double op; per-size means are floor-half-up x1e6 "
    "BIGINT sums (order-free); the log2-log2 slope over the fixed "
    "sizes 8..64 is a 4-point closed form on max(CASE)-pivoted "
    "columns, never a float aggregation.  Zero-variance blocks are "
    "excluded in both engines.  Scale: block stats are windowed "
    "partials over (size, block) keys — fully parallel; sizes are "
    "a 4-row broadcast",
)
def t91(spark: SparkSession, sf_dir: str) -> DataFrame:
    xdf = _daily_order_counts(
        spark, sf_dir, "1996-01-01", "1997-01-01", "1996-12-31"
    )
    sizes = spark.range(1).select(
        F.explode(F.array(F.lit(8), F.lit(16), F.lit(32), F.lit(64))).alias("sz")
    )
    rows_b = (
        xdf.crossJoin(F.broadcast(sizes))
        .filter(
            F.col("rn")
            <= F.col("sz") * F.floor(F.lit(366) / F.col("sz")).cast("long")
        )
        .select(
            "sz",
            ((F.col("rn") - 1) / F.col("sz")).cast("long").alias("blk"),
            (((F.col("rn") - 1) % F.col("sz")) + 1).alias("k"),
            "x",
            "rn",
        )
    )
    wb = Window.partitionBy("sz", "blk")
    rows_b = rows_b.select(
        "sz",
        "blk",
        "k",
        "x",
        F.sum("x").over(wb.orderBy("rn")).alias("cx"),
        F.sum("x").over(wb).alias("sx"),
        F.sum(F.col("x") * F.col("x")).over(wb).alias("sxx"),
    )
    bstat = rows_b.groupBy("sz", "blk").agg(
        (
            F.max(F.col("sz") * F.col("cx") - F.col("k") * F.col("sx"))
            - F.min(F.col("sz") * F.col("cx") - F.col("k") * F.col("sx"))
        )
        .cast("long")
        .alias("r_int"),
        F.max(F.col("sz") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("long")
        .alias("ssq_scaled"),
    )
    rs = bstat.filter(F.col("ssq_scaled") > 0).select(
        "sz",
        F.floor(
            F.col("r_int") / F.sqrt(F.col("ssq_scaled")) * F.lit(1000000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("rs_x1e6"),
    )
    m = rs.groupBy("sz").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        (
            (F.sum("rs_x1e6").cast("double") / F.count(F.lit(1)))
            / F.lit(1000000.0)
        ).alias("m_rs"),
    )
    piv = m.agg(
        F.max(F.when(F.col("sz") == 8, F.col("m_rs"))).alias("m8"),
        F.max(F.when(F.col("sz") == 16, F.col("m_rs"))).alias("m16"),
        F.max(F.when(F.col("sz") == 32, F.col("m_rs"))).alias("m32"),
        F.max(F.when(F.col("sz") == 64, F.col("m_rs"))).alias("m64"),
        F.sum("n_blocks").cast("long").alias("n_blocks"),
    )
    hurst = (
        F.lit(-1.5) * F.log2("m8")
        - F.lit(0.5) * F.log2("m16")
        + F.lit(0.5) * F.log2("m32")
        + F.lit(1.5) * F.log2("m64")
    ) / F.lit(5.0)
    return piv.select(
        "n_blocks",
        F.round("m8", 6).alias("m8"),
        F.round("m16", 6).alias("m16"),
        F.round("m32", 6).alias("m32"),
        F.round("m64", 6).alias("m64"),
        F.round(hurst, 4).alias("hurst"),
    )


@_q(
    "t93_forecast_metrics",
    """WITH spine AS (
         SELECT day::DATE AS day, row_number() OVER (ORDER BY day) AS rn
         FROM generate_series(DATE '1996-01-01', DATE '1996-06-30',
                              INTERVAL 1 DAY) t(day)),
       x AS (
         SELECT s.rn, COALESCE(c.cnt, 0)::BIGINT AS x
         FROM spine s LEFT JOIN (
           SELECT o_orderdate::DATE AS day, count(*) AS cnt FROM orders
           WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             AND o_orderdate < TIMESTAMP '1996-07-01' GROUP BY 1) c
         ON c.day = s.day),
       anchor AS (SELECT max(CASE WHEN rn = 150 THEN x END)::BIGINT
                           AS lastv,
                         max(CASE WHEN rn = 1 THEN x END)::BIGINT
                           AS firstv
                  FROM x),
       insample AS (
         SELECT sum(abs(x - lx))::BIGINT AS snum,
                count(*)::BIGINT AS sden
         FROM (SELECT rn, x, lag(x) OVER (ORDER BY rn) AS lx FROM x
               WHERE rn <= 150) s WHERE lx IS NOT NULL),
       test AS (
         SELECT t.rn, t.x,
                a.lastv AS f_naive,
                s7.x AS f_snaive,
                a.lastv + CAST(floor((t.rn - 150) * (a.lastv - a.firstv)
                                     / 149.0) AS BIGINT) AS f_drift
         FROM x t CROSS JOIN anchor a
         JOIN x s7 ON s7.rn = t.rn - 7
         WHERE t.rn > 150),
       err AS (
         SELECT sum(abs(x - f_naive))::BIGINT AS ae_naive,
                sum(abs(x - f_snaive))::BIGINT AS ae_snaive,
                sum(abs(x - f_drift))::BIGINT AS ae_drift,
                sum(CASE WHEN x + f_snaive > 0
                         THEN CAST(floor(2000000.0 * abs(x - f_snaive)
                                         / (x + f_snaive) + 0.5) AS BIGINT)
                         ELSE 0 END)::BIGINT AS sm6,
                count(*)::BIGINT AS h
         FROM test)
       SELECT e.h,
              round(e.ae_naive / (e.h * 1.0), 4) AS mae_naive,
              round(e.ae_snaive / (e.h * 1.0), 4) AS mae_snaive,
              round(e.ae_drift / (e.h * 1.0), 4) AS mae_drift,
              round((e.ae_naive / (e.h * 1.0)) / (i.snum / (i.sden * 1.0)),
                    4) AS mase_naive,
              round((e.ae_snaive / (e.h * 1.0))
                    / (i.snum / (i.sden * 1.0)), 4) AS mase_snaive,
              round(e.sm6 / (e.h * 1.0) / 10000.0, 4) AS smape_snaive_pct
       FROM err e, insample i""",
    note="forecast-accuracy panel on a fixed temporal holdout (train "
    "days 1-150, test 151-182): MAE for the naive / seasonal-naive / "
    "drift benchmarks, MASE (MAE over the in-sample one-step naive "
    "MAE — Hyndman's scale-free standard, the denominator t34/t62 "
    "lack), and sMAPE.  Every carrier is an exact integer: counts "
    "are ints, absolute errors sum as BIGINTs, per-row sMAPE terms "
    "floor half-up x2e6, and the drift forecast uses floor of ONE "
    "double division in BOTH engines (DuckDB // floors while Spark "
    "DIV truncates — they disagree on negative slopes, so neither "
    "is used).  The fixture verdict: seasonal-naive LOSES to naive "
    "(MASE 1.05 vs 0.78) — daily order counts have no real weekly "
    "cycle, exactly what this panel is for.  Shape: collapse to the "
    "daily spine, then scalar aggregates",
)
def t93(spark: SparkSession, sf_dir: str) -> DataFrame:
    xdf = _daily_order_counts(
        spark, sf_dir, "1996-01-01", "1996-07-01", "1996-06-30"
    )
    anchor = xdf.agg(
        F.max(F.when(F.col("rn") == 150, F.col("x"))).cast("long").alias(
            "lastv"
        ),
        F.max(F.when(F.col("rn") == 1, F.col("x"))).cast("long").alias(
            "firstv"
        ),
    )
    w = Window.orderBy("rn")
    ins = (
        xdf.filter(F.col("rn") <= 150)
        .select("x", F.lag("x").over(w).alias("lx"))
        .filter(F.col("lx").isNotNull())
        .agg(
            F.sum(F.abs(F.col("x") - F.col("lx"))).cast("long").alias("snum"),
            F.count(F.lit(1)).cast("long").alias("sden"),
        )
    )
    s7 = xdf.select((F.col("rn") + 7).alias("rn"), F.col("x").alias("f_snaive"))
    test = (
        xdf.filter(F.col("rn") > 150)
        .crossJoin(F.broadcast(anchor))
        .join(s7, "rn")
        .select(
            "x",
            F.col("lastv").alias("f_naive"),
            "f_snaive",
            (
                F.col("lastv")
                + F.floor(
                    (F.col("rn") - 150)
                    * (F.col("lastv") - F.col("firstv"))
                    / F.lit(149.0)
                ).cast("long")
            ).alias("f_drift"),
        )
    )
    err = test.agg(
        F.sum(F.abs(F.col("x") - F.col("f_naive"))).cast("long").alias(
            "ae_naive"
        ),
        F.sum(F.abs(F.col("x") - F.col("f_snaive"))).cast("long").alias(
            "ae_snaive"
        ),
        F.sum(F.abs(F.col("x") - F.col("f_drift"))).cast("long").alias(
            "ae_drift"
        ),
        F.sum(
            F.when(
                F.col("x") + F.col("f_snaive") > 0,
                F.floor(
                    F.lit(2000000.0)
                    * F.abs(F.col("x") - F.col("f_snaive"))
                    / (F.col("x") + F.col("f_snaive"))
                    + F.lit(0.5)
                ).cast("long"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("sm6"),
        F.count(F.lit(1)).cast("long").alias("h"),
    )
    j = err.crossJoin(F.broadcast(ins))
    scale = F.col("snum") / (F.col("sden") * F.lit(1.0))
    return j.select(
        "h",
        F.round(F.col("ae_naive") / (F.col("h") * F.lit(1.0)), 4).alias(
            "mae_naive"
        ),
        F.round(F.col("ae_snaive") / (F.col("h") * F.lit(1.0)), 4).alias(
            "mae_snaive"
        ),
        F.round(F.col("ae_drift") / (F.col("h") * F.lit(1.0)), 4).alias(
            "mae_drift"
        ),
        F.round(
            (F.col("ae_naive") / (F.col("h") * F.lit(1.0))) / scale, 4
        ).alias("mase_naive"),
        F.round(
            (F.col("ae_snaive") / (F.col("h") * F.lit(1.0))) / scale, 4
        ).alias("mase_snaive"),
        F.round(
            F.col("sm6") / (F.col("h") * F.lit(1.0)) / F.lit(10000.0), 4
        ).alias("smape_snaive_pct"),
    )


@_q(
    "t92_seasonal_strength",
    """WITH spine AS (
         SELECT m::DATE AS m, row_number() OVER (ORDER BY m) AS t
         FROM generate_series(DATE '1995-01-01', DATE '1997-12-01',
                              INTERVAL 1 MONTH) g(m)),
       x AS (
         SELECT s.t, ((s.t - 1) % 12) + 1 AS moy,
                COALESCE(c.cnt, 0)::BIGINT AS x
         FROM spine s LEFT JOIN (
           SELECT date_trunc('month', o_orderdate)::DATE AS m,
                  count(*) AS cnt
           FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01'
             AND o_orderdate < TIMESTAMP '1998-01-01' GROUP BY 1) c
         ON c.m = s.m),
       tr AS (
         SELECT t, moy, x,
                (0.5 * lag(x, 6) OVER w
                 + lag(x, 1) OVER w + lag(x, 2) OVER w + lag(x, 3) OVER w
                 + lag(x, 4) OVER w + lag(x, 5) OVER w
                 + lead(x, 1) OVER w + lead(x, 2) OVER w
                 + lead(x, 3) OVER w + lead(x, 4) OVER w
                 + lead(x, 5) OVER w + x
                 + 0.5 * lead(x, 6) OVER w) / 12.0 AS tc
         FROM x WINDOW w AS (ORDER BY t)),
       core AS (SELECT t, moy, x, tc, x - tc AS d FROM tr
                WHERE t BETWEEN 7 AND 30),
       sidx AS (SELECT moy, sum(d) / 2.0 AS s FROM core GROUP BY 1),
       rr AS (SELECT c.d, c.d - si.s AS r, c.x - si.s AS txr
              FROM core c JOIN sidx si ON si.moy = c.moy),
       sc AS (SELECT CAST(floor(d * 1000000.0 + 0.5) AS BIGINT) AS d6,
                     CAST(floor(r * 1000000.0 + 0.5) AS BIGINT) AS r6,
                     CAST(floor(txr * 1000000.0 + 0.5) AS BIGINT) AS t6
              FROM rr),
       v AS (SELECT count(*)::BIGINT AS n,
                    sum(d6)::BIGINT AS sd, sum(d6*d6)::BIGINT AS sdd,
                    sum(r6)::BIGINT AS sr, sum(r6*r6)::BIGINT AS srr,
                    sum(t6)::BIGINT AS st, sum(t6*t6)::BIGINT AS stt
             FROM sc)
       SELECT n,
              round((sdd - sd * 1.0 * sd / n) / n / 1e12, 4)
                AS var_detrended,
              round((srr - sr * 1.0 * sr / n) / n / 1e12, 4) AS var_resid,
              round((stt - st * 1.0 * st / n) / n / 1e12, 4)
                AS var_deseason,
              round(greatest(0.0, 1.0
                    - ((srr - sr * 1.0 * sr / n) / n / 1e12)
                      / ((sdd - sd * 1.0 * sd / n) / n / 1e12)), 4)
                AS f_seasonal,
              round(greatest(0.0, 1.0
                    - ((srr - sr * 1.0 * sr / n) / n / 1e12)
                      / ((stt - st * 1.0 * st / n) / n / 1e12)), 4)
                AS f_trend
       FROM v""",
    note="seasonal / trend STRENGTH diagnostics (Hyndman's F "
    "statistics over a classical decomposition — the one-number "
    "answers to 'is this series worth a seasonal model?', where "
    "t47/t83 output the components themselves): centered 12-month MA "
    "trend (half-weight end terms, 13 lag/lead references in ONE "
    "fixed textual order so both engines fold identical doubles), "
    "detrended D = x - T on the 24 fully-covered core months (each "
    "month-of-year appears EXACTLY twice there, so the seasonal "
    "index sum(D)/2 is a single commutative addition — no float-"
    "order hazard), residual R = D - S, deseasonalized x - S.  "
    "F_seasonal = 1 - Var(R)/Var(D) (D = S + R), F_trend = "
    "1 - Var(R)/Var(x - S); variances run on floor-half-up x1e6 "
    "BIGINT carriers (order-free sums, closing divisions).  Scale: "
    "collapse-then-compute — everything after the monthly rollup is "
    "a 36-row problem",
)
def t92(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    cnt = (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy(
            F.date_trunc("month", F.col("o_orderdate"))
            .cast("date")
            .alias("m")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    spine = spark.range(1).select(
        F.explode(
            F.expr(
                "sequence(to_date('1995-01-01'), to_date('1997-12-01'),"
                " interval 1 month)"
            )
        ).alias("m")
    )
    spine = spine.select(
        "m", F.row_number().over(Window.orderBy("m")).alias("t")
    )
    x = spine.join(cnt, "m", "left").select(
        "t",
        (((F.col("t") - 1) % 12) + 1).alias("moy"),
        F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("x"),
    )
    w = Window.orderBy("t")
    tc = (
        F.lit(0.5) * F.lag("x", 6).over(w)
        + F.lag("x", 1).over(w)
        + F.lag("x", 2).over(w)
        + F.lag("x", 3).over(w)
        + F.lag("x", 4).over(w)
        + F.lag("x", 5).over(w)
        + F.lead("x", 1).over(w)
        + F.lead("x", 2).over(w)
        + F.lead("x", 3).over(w)
        + F.lead("x", 4).over(w)
        + F.lead("x", 5).over(w)
        + F.col("x")
        + F.lit(0.5) * F.lead("x", 6).over(w)
    ) / F.lit(12.0)
    tr = x.select("t", "moy", "x", tc.alias("tc"))
    core = tr.filter((F.col("t") >= 7) & (F.col("t") <= 30)).select(
        "t", "moy", "x", "tc", (F.col("x") - F.col("tc")).alias("d")
    )
    sidx = core.groupBy("moy").agg((F.sum("d") / F.lit(2.0)).alias("s"))
    rr = core.join(F.broadcast(sidx), "moy").select(
        "d",
        (F.col("d") - F.col("s")).alias("r"),
        (F.col("x") - F.col("s")).alias("txr"),
    )

    def c6(col, name):
        return (
            F.floor(col * F.lit(1000000.0) + F.lit(0.5))
            .cast("long")
            .alias(name)
        )

    sc = rr.select(c6(F.col("d"), "d6"), c6(F.col("r"), "r6"), c6(F.col("txr"), "t6"))
    v = sc.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("d6").cast("long").alias("sd"),
        F.sum(F.col("d6") * F.col("d6")).cast("long").alias("sdd"),
        F.sum("r6").cast("long").alias("sr"),
        F.sum(F.col("r6") * F.col("r6")).cast("long").alias("srr"),
        F.sum("t6").cast("long").alias("st"),
        F.sum(F.col("t6") * F.col("t6")).cast("long").alias("stt"),
    )

    def var_of(sq, s):
        return (
            (F.col(sq) - F.col(s) * F.lit(1.0) * F.col(s) / F.col("n"))
            / F.col("n")
            / F.lit(1e12)
        )

    vd, vr, vt = var_of("sdd", "sd"), var_of("srr", "sr"), var_of("stt", "st")
    return v.select(
        "n",
        F.round(vd, 4).alias("var_detrended"),
        F.round(vr, 4).alias("var_resid"),
        F.round(vt, 4).alias("var_deseason"),
        F.round(F.greatest(F.lit(0.0), F.lit(1.0) - vr / vd), 4).alias(
            "f_seasonal"
        ),
        F.round(F.greatest(F.lit(0.0), F.lit(1.0) - vr / vt), 4).alias(
            "f_trend"
        ),
    )


QUERIES = list(_Q)
