"""Graph declared queries G01-G10 (SURVEY.md §2.C).

Spark side: PropertyGraph + join-based supersteps (stationary edges,
broadcast vertex state).  Oracle side: recursive CTEs / unrolled
iteration over the FIXTURES.md graph views, inlined as CTEs because the
driver pre-registers only base tables.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..graph.algorithms import bfs_distances, connected_components, pagerank, triangle_count
from ..graph.property_graph import PropertyGraph
from ..operators.recsys import item_item_cooccurrence
from .common import GRAPH_CTES, Query

_G: list[Query] = []

_CTE_HEAD = re.compile(r"(\b[A-Za-z_][A-Za-z0-9_]*\s+AS)\s*\(")


def _mat(sql: str) -> str:
    """Mark every CTE of a (non-recursive) oracle AS MATERIALIZED.

    DuckDB 1.0 INLINES plain CTEs: in the round-chained simulation
    oracles (Luby MIS, matching/vertex cover, Louvain, power
    iteration, cascades) each round's CTE references the previous
    round's several times, so inlining re-evaluates the chain
    EXPONENTIALLY — g102's 3-round MIS oracle measured 68 s at sf0.01
    vs 0.1 s materialized, g50 71 s vs 0.2 s, results byte-identical
    (verified per query before adoption, r10).  Results are unaffected
    by materialization; only evaluation count changes.  NEVER apply to
    WITH RECURSIVE queries (the keyword is rejected there)."""
    assert "RECURSIVE" not in sql.upper()
    return _CTE_HEAD.sub(r"\1 MATERIALIZED (", sql)


def _g(name: str, oracle: str | None, note: str = ""):
    def deco(fn):
        _G.append(Query(name, fn, oracle, note))
        return fn

    return deco


def _sym_graph(c: Catalog) -> PropertyGraph:
    e = c.graph_edges_sym()
    v = c.graph_nodes().select(F.col("node").alias("id"))
    return PropertyGraph(v, e)


@_g(
    "g01_degree",
    f"""WITH {GRAPH_CTES}
       SELECT src, count(*) AS deg, sum(n_items)::BIGINT AS items
       FROM graph_edges GROUP BY 1 ORDER BY 1""",
)
def g01(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).graph_edges()
    return (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"), F.sum("n_items").alias("items"))
        .orderBy("src")
    )


@_g(
    "g02_khop",
    f"""WITH RECURSIVE {GRAPH_CTES},
       r(node, h) AS (
         SELECT 'c1', 0
         UNION
         SELECT e.dst, r.h+1 FROM r JOIN graph_edges_sym e ON r.node=e.src WHERE r.h<2)
       SELECT count(DISTINCT node) AS n FROM r""",
)
def g02(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _sym_graph(Catalog(spark, sf_dir))
    return bfs_distances(g, "c1", 2).agg(F.count(F.lit(1)).alias("n"))


@_g(
    "g03_bfs",
    f"""WITH RECURSIVE {GRAPH_CTES},
       bfs(node, hops) AS (
         SELECT 'c1', 0
         UNION
         SELECT e.dst, b.hops+1 FROM bfs b JOIN graph_edges_sym e ON b.node=e.src WHERE b.hops<4)
       SELECT node, min(hops)::INT AS d FROM bfs GROUP BY 1 ORDER BY 1""",
)
def g03(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _sym_graph(Catalog(spark, sf_dir))
    return bfs_distances(g, "c1", 4).select("node", F.col("d").cast("int")).orderBy("node")


@_g(
    "g04_connected_components",
    f"""WITH RECURSIVE {GRAPH_CTES},
       ge AS (SELECT src, dst FROM graph_edges WHERE n_items >= 3),
       ges AS (SELECT src, dst FROM ge UNION SELECT dst, src FROM ge),
       nodes AS (SELECT DISTINCT src AS node FROM ges),
       reach(node, r) AS (
         SELECT node, node FROM nodes
         UNION
         SELECT e.dst, reach.r FROM reach JOIN ges e ON reach.node=e.src)
       SELECT node, min(r) AS component FROM reach GROUP BY 1 ORDER BY 1""",
)
def g04(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    ge = c.graph_edges().filter(F.col("n_items") >= 3).select("src", "dst")
    ges = ge.union(ge.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    nodes = ges.select(F.col("src").alias("id")).distinct()
    g = PropertyGraph(nodes, ges)
    return connected_components(g).orderBy("node")


@_g(
    "g05_triangles",
    f"""WITH {GRAPH_CTES},
       ge AS (SELECT src, dst FROM graph_edges WHERE n_items >= 2),
       cos AS (SELECT DISTINCT a.dst AS s1, b.dst AS s2
               FROM ge a JOIN ge b ON a.src=b.src AND a.dst<b.dst)
       SELECT count(*) AS n_triangles
       FROM cos e1 JOIN cos e2 ON e2.s1=e1.s2 JOIN cos e3 ON e3.s1=e1.s1 AND e3.s2=e2.s2""",
)
def g05(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    ge = c.graph_edges().filter(F.col("n_items") >= 2).select("src", "dst")
    a = ge.select(F.col("src").alias("k"), F.col("dst").alias("s1"))
    b = ge.select(F.col("src").alias("k"), F.col("dst").alias("s2"))
    cos = a.join(b, "k").filter(F.col("s1") < F.col("s2")).select("s1", "s2").distinct()
    return triangle_count(cos)


def _pagerank_oracle() -> str:
    """Unrolled 10-iteration PageRank as chained CTEs (DuckDB has no
    aggregation in recursive CTEs; a fixed iteration count unrolls)."""
    iters = []
    prev = "pr0"
    for i in range(1, 11):
        cur = f"pr{i}"
        iters.append(
            f"""{cur} AS (
  SELECT n.node, 0.15::DOUBLE/(SELECT c FROM nv) + 0.85::DOUBLE*coalesce(sum(p.r/od.d),0) AS r
  FROM graph_nodes n
  LEFT JOIN graph_edges_sym e ON e.dst=n.node
  LEFT JOIN {prev} p ON p.node=e.src
  LEFT JOIN outdeg od ON od.src=e.src
  GROUP BY n.node)"""
        )
        prev = cur
    chain = ",\n".join(iters)
    return f"""WITH {GRAPH_CTES},
nv AS (SELECT count(*) AS c FROM graph_nodes),
outdeg AS (SELECT src, count(*) AS d FROM graph_edges_sym GROUP BY 1),
pr0 AS (SELECT node, 1.0::DOUBLE/(SELECT c FROM nv) AS r FROM graph_nodes),
{chain}
SELECT node, round(r, 8) AS r FROM pr10 ORDER BY r DESC, node LIMIT 20"""


@_g("g06_pagerank", _pagerank_oracle())
def g06(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _sym_graph(Catalog(spark, sf_dir))
    ranks = pagerank(g, iterations=10, damping=0.85)
    return (
        ranks.select("node", F.round("rank", 8).alias("r"))
        .orderBy(F.col("r").desc(), F.col("node").asc())
        .limit(20)
    )


@_g(
    "g07_snapshot_degree",
    """SELECT 'c'||o.o_custkey AS src, count(DISTINCT l.l_suppkey) AS deg
       FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey
       WHERE l.l_shipdate <= TIMESTAMP '1998-01-01' GROUP BY 1 ORDER BY 1""",
)
def g07(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    li = (
        c.table("lineitem")
        .filter(F.col("l_shipdate") <= F.lit("1998-01-01").cast("timestamp"))
        .select("l_orderkey", "l_suppkey")
    )
    o = c.table("orders").select("o_orderkey", "o_custkey")
    # broadcast the order->customer map (small vs lineitem); group on the
    # int key and stringify after the aggregate, not before the shuffle
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.countDistinct("l_suppkey").alias("deg"))
        .select(F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"), "deg")
        .orderBy("src")
    )


@_g(
    "g08_temporal_point_read",
    """SELECT o_custkey AS entity_id, round(sum(o_totalprice),2) AS spend
       FROM orders WHERE o_orderdate <= TIMESTAMP '1998-01-01'
       GROUP BY 1 ORDER BY 1""",
)
def g08(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..temporal.tprop import value_at

    c = Catalog(spark, sf_dir)
    tp = c.tprop_spend()
    res = value_at(tp, F.lit("1998-01-01").cast("timestamp"), value_col="delta", cumulative=True)
    return res.select("entity_id", F.round("value", 2).alias("spend")).orderBy("entity_id")


@_g(
    "g09_time_respecting_paths",
    f"""WITH {GRAPH_CTES},
       et AS (SELECT src, dst, first_ts FROM graph_edges
              UNION ALL SELECT dst, src, first_ts FROM graph_edges),
       h1 AS (SELECT dst AS node, first_ts AS t FROM et WHERE src='c1'),
       h2 AS (SELECT e.dst AS node, e.first_ts AS t FROM h1 JOIN et e
              ON e.src=h1.node AND e.first_ts >= h1.t),
       h3 AS (SELECT e.dst AS node, e.first_ts AS t FROM h2 JOIN et e
              ON e.src=h2.node AND e.first_ts >= h2.t),
       allp AS (SELECT node FROM h1 UNION ALL SELECT node FROM h2 UNION ALL SELECT node FROM h3)
       SELECT node, count(*) AS n_paths FROM allp GROUP BY 1 ORDER BY 1""",
)
def g09(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    et = c.graph_edges_ts()
    h1 = et.filter(F.col("src") == "c1").select(F.col("dst").alias("node"), F.col("first_ts").alias("t"))
    e2 = et.alias("e")
    h2 = (
        h1.alias("h")
        .join(e2, (F.col("e.src") == F.col("h.node")) & (F.col("e.first_ts") >= F.col("h.t")))
        .select(F.col("e.dst").alias("node"), F.col("e.first_ts").alias("t"))
    )
    h3 = (
        h2.alias("h")
        .join(e2, (F.col("e.src") == F.col("h.node")) & (F.col("e.first_ts") >= F.col("h.t")))
        .select(F.col("e.dst").alias("node"), F.col("e.first_ts").alias("t"))
    )
    allp = h1.select("node").unionAll(h2.select("node")).unionAll(h3.select("node"))
    return allp.groupBy("node").agg(F.count(F.lit(1)).alias("n_paths")).orderBy("node")


@_g(
    "g10_temporal_range_agg",
    f"""WITH grain AS (
         SELECT 'c'||o.o_custkey AS src, 's'||l.l_suppkey AS dst,
                l.l_extendedprice*(1-l.l_discount) AS rev
         FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey
         WHERE l.l_shipdate >= TIMESTAMP '1996-01-01' AND l.l_shipdate < TIMESTAMP '1999-01-01')
       SELECT src, dst, floor(min(rev)*100 + 0.5::DOUBLE)/100 AS mn,
              floor(max(rev)*100 + 0.5::DOUBLE)/100 AS mx,
              floor(avg(rev)*100 + 0.5::DOUBLE)/100 AS avg_rev
       FROM grain GROUP BY 1,2 ORDER BY 1,2""",
    note="floor-based rounding: 4-decimal revenue values sit exactly on "
    "2-decimal half boundaries, where Spark (shortest-repr HALF_UP) and "
    "DuckDB (binary-value) round() disagree; floor(x*100+.5)/100 is "
    "bit-identical on both engines",
)
def g10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..temporal.tprop import range_aggregate

    c = Catalog(spark, sf_dir)
    li = c.table("lineitem")
    o = c.table("orders").select("o_orderkey", "o_custkey")
    grain = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
            F.col("l_shipdate").alias("ts"),
        )
    )
    res = range_aggregate(
        grain,
        F.lit("1996-01-01").cast("timestamp"),
        F.lit("1999-01-01").cast("timestamp"),
        ["src", "dst"],
        "rev",
        aggs={"mn": F.min, "mx": F.max, "avg_rev": F.avg},
    )

    def r2(c):  # see oracle note: bit-identical half-boundary rounding
        return F.floor(F.col(c) * 100 + F.lit(0.5)) / 100

    return res.select(
        "src", "dst", r2("mn").alias("mn"), r2("mx").alias("mx"), r2("avg_rev").alias("avg_rev")
    ).orderBy("src", "dst")


@_g(
    "g11_temporal_last_value",
    """WITH ranked AS (
         SELECT o_custkey, o_totalprice, o_orderdate,
                row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
         FROM orders WHERE o_orderdate <= TIMESTAMP '1998-01-01')
       SELECT o_custkey AS entity_id, o_totalprice AS last_value
       FROM ranked WHERE rn=1 ORDER BY 1""",
    note="piecewise-constant temporal point-read: latest change-point <= t "
    "(the reference's getTemporalProperty(key, t) semantics; G08 covers the "
    "cumulative variant)",
)
def g11(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..temporal.tprop import value_at

    o = Catalog(spark, sf_dir).table("orders")
    # temporal long table with a deterministic intra-timestamp tiebreak:
    # (ts, orderkey) ordering mirrors the oracle's DESC,DESC row_number
    tp = o.select(
        F.col("o_custkey").alias("entity_id"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("seq"),
        F.col("o_totalprice").alias("value"),
    )
    res = value_at(
        tp,
        F.lit("1998-01-01").cast("timestamp"),
        cumulative=False,
        tiebreak="seq",
    )
    return res.select("entity_id", F.col("value").alias("last_value")).orderBy("entity_id")


@_g(
    "g12_earliest_arrival",
    f"""WITH {GRAPH_CTES},
       et AS (SELECT src, dst, first_ts FROM graph_edges
              UNION ALL SELECT dst, src, first_ts FROM graph_edges),
       a1 AS (SELECT dst AS node, first_ts AS t FROM et WHERE src='c1'),
       a2 AS (SELECT e.dst AS node, e.first_ts AS t FROM a1 JOIN et e
              ON e.src=a1.node AND e.first_ts >= a1.t),
       a3 AS (SELECT e.dst AS node, e.first_ts AS t FROM a2 JOIN et e
              ON e.src=a2.node AND e.first_ts >= a2.t),
       allp AS (SELECT node, t FROM a1 UNION ALL SELECT node, t FROM a2
                UNION ALL SELECT node, t FROM a3)
       SELECT node, strftime(min(t), '%Y-%m-%d %H:%M:%S.%f') AS arrival
       FROM allp GROUP BY 1 ORDER BY 1""",
    note="time-respecting earliest-arrival (<=3 hops) from c1 — the "
    "temporal-traversal core of the reference system. Spark side runs a "
    "min-frontier label-correcting loop, which is lossless vs the "
    "oracle's path enumeration: a smaller arrival admits a superset of "
    "onward edges, so expanding only the per-(node,hop) minimum "
    "preserves every reachable (node, min arrival)",
)
def g12(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.algorithms import earliest_arrival
    from .common import ts_str

    et = Catalog(spark, sf_dir).graph_edges_ts()
    arr = earliest_arrival(et, "c1", max_hops=3)
    return arr.select("node", ts_str(F.col("arrival_ts")).alias("arrival")).orderBy("node")


@_g(
    "g13_snapshot_diff",
    """WITH grain AS (
         SELECT 'c'||o.o_custkey AS src, 's'||l.l_suppkey AS dst, l.l_shipdate AS ts
         FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey),
       agg AS (
         SELECT src, dst,
                sum(CASE WHEN ts <= TIMESTAMP '1997-01-01' THEN 1 ELSE 0 END)::BIGINT AS items_t1,
                sum(CASE WHEN ts <= TIMESTAMP '1999-01-01' THEN 1 ELSE 0 END)::BIGINT AS items_t2
         FROM grain GROUP BY 1,2)
       SELECT src, dst, items_t1, items_t2 FROM agg
       WHERE items_t2 > items_t1 ORDER BY 1,2""",
    note="temporal snapshot diff: edges whose activity changed between "
    "two graph snapshots (t1=1997-01-01, t2=1999-01-01)",
)
def g13(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    li = c.table("lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = c.table("orders").select("o_orderkey", "o_custkey")
    t1 = F.lit("1997-01-01").cast("timestamp")
    t2 = F.lit("1999-01-01").cast("timestamp")
    grain = li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey).select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        F.col("l_shipdate").alias("ts"),
    )
    return (
        grain.groupBy("src", "dst")
        .agg(
            F.sum(F.when(F.col("ts") <= t1, 1).otherwise(0)).alias("items_t1"),
            F.sum(F.when(F.col("ts") <= t2, 1).otherwise(0)).alias("items_t2"),
        )
        .filter(F.col("items_t2") > F.col("items_t1"))
        .orderBy("src", "dst")
    )


def _sssp_oracle(rounds: int = 8) -> str:
    """Unrolled Bellman-Ford relaxation over the thresholded weighted
    symmetric graph (integer weights = n_items, so path sums are exact
    and hash-stable cross-engine)."""
    iters = []
    prev = "d0"
    for i in range(1, rounds + 1):
        cur = f"d{i}"
        iters.append(
            f"""{cur} AS MATERIALIZED (
  SELECT node, min(dist) AS dist FROM (
    SELECT node, dist FROM {prev}
    UNION ALL
    SELECT e.dst AS node, d.dist + e.n_items AS dist
    FROM {prev} d JOIN gesw e ON d.node=e.src) u
  GROUP BY 1)"""
        )
        prev = cur
    chain = ",\n".join(iters)
    return f"""WITH {GRAPH_CTES},
ge AS (SELECT src, dst, n_items FROM graph_edges WHERE n_items >= 3),
gesw AS (SELECT src, dst, n_items FROM ge UNION SELECT dst, src, n_items FROM ge),
d0 AS (SELECT 'c1' AS node, 0::BIGINT AS dist),
{chain}
SELECT node, dist::BIGINT AS dist FROM {prev} ORDER BY node"""


@_g(
    "g14_weighted_sssp",
    _sssp_oracle(),
    note="weighted shortest path from 'c1' (8 relaxation rounds, integer "
    "n_items weights) on the n_items>=3 symmetric subgraph — the Dijkstra "
    "analog the reference's algo layer exposes, as distributed relaxation",
)
def g14(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.algorithms import shortest_paths_weighted

    c = Catalog(spark, sf_dir)
    ge = c.graph_edges().filter(F.col("n_items") >= 3).select("src", "dst", "n_items")
    sym = ge.union(
        ge.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "n_items")
    ).distinct()
    nodes = sym.select(F.col("src").alias("id")).distinct()
    dist = shortest_paths_weighted(PropertyGraph(nodes, sym), "c1", "n_items", max_iter=8)
    return dist.select("node", F.col("dist").cast("long").alias("dist")).orderBy("node")


def _lp_oracle(rounds: int = 5) -> str:
    """Unrolled synchronous label propagation: each round every node
    adopts its in-neighbors' most frequent label (ties -> smallest),
    keeping its own when it has no in-neighbors."""
    iters = []
    prev = "s0"
    for i in range(1, rounds + 1):
        cur = f"s{i}"
        iters.append(
            f"""{cur} AS MATERIALIZED (
  SELECT s.node, coalesce(b.best, s.label) AS label
  FROM {prev} s LEFT JOIN (
    SELECT node, best FROM (
      SELECT node, best, row_number() OVER (PARTITION BY node ORDER BY c DESC, best ASC) AS rn
      FROM (SELECT e.dst AS node, p.label AS best, count(*) AS c
            FROM graph_edges_sym e JOIN {prev} p ON p.node=e.src GROUP BY 1,2) cnt) rk
    WHERE rn=1) b ON b.node=s.node)"""
        )
        prev = cur
    chain = ",\n".join(iters)
    return f"""WITH {GRAPH_CTES},
s0 AS (SELECT node, node AS label FROM graph_nodes),
{chain}
SELECT node, label FROM {prev} ORDER BY node"""


@_g(
    "g15_label_propagation",
    _lp_oracle(),
    note="community detection: 5 synchronous label-propagation rounds, "
    "deterministic (count DESC, label ASC) tie-break",
)
def g15(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.algorithms import label_propagation

    g = _sym_graph(Catalog(spark, sf_dir))
    return label_propagation(g, max_iter=5).orderBy("node")


def _kcore_oracle(k: int = 3, rounds: int = 8) -> str:
    """Unrolled k-core peeling: each round drop nodes with degree < k
    and the edges touching them."""
    iters = []
    prev = "e0"
    for i in range(1, rounds + 1):
        cur = f"e{i}"
        iters.append(
            f"""{cur} AS MATERIALIZED (
  SELECT e.src, e.dst FROM {prev} e
  JOIN (SELECT src FROM {prev} GROUP BY 1 HAVING count(*) >= {k}) ka ON e.src=ka.src
  JOIN (SELECT src FROM {prev} GROUP BY 1 HAVING count(*) >= {k}) kb ON e.dst=kb.src)"""
        )
        prev = cur
    chain = ",\n".join(iters)
    return f"""WITH {GRAPH_CTES},
e0 AS MATERIALIZED (SELECT src, dst FROM graph_edges_sym),
{chain}
SELECT src AS node, count(*)::BIGINT AS degree FROM {prev} GROUP BY 1 ORDER BY 1"""


@_g(
    "g16_kcore",
    _kcore_oracle(),
    note="3-core membership after 8 peel rounds on the symmetric graph",
)
def g16(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.algorithms import k_core

    g = _sym_graph(Catalog(spark, sf_dir))
    return k_core(g, k=3, max_iter=8).orderBy("node")


@_g(
    "g17_scc",
    """WITH RECURSIVE ne AS (
         SELECT 'n'||c.c_nationkey AS src, 'n'||s.s_nationkey AS dst
         FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey
         JOIN customer c ON o.o_custkey=c.c_custkey
         JOIN supplier s ON l.l_suppkey=s.s_suppkey
         GROUP BY 1,2 HAVING count(*) >= 25),
       nodes AS (SELECT src AS node FROM ne UNION SELECT dst FROM ne),
       reach(a, b) AS (
         SELECT src, dst FROM ne
         UNION
         SELECT r.a, e.dst FROM reach r JOIN ne e ON r.b=e.src),
       mutual AS (SELECT r1.a, r1.b FROM reach r1
                  JOIN reach r2 ON r1.a=r2.b AND r1.b=r2.a)
       SELECT n.node, least(n.node, coalesce(min(m.b), n.node)) AS component
       FROM nodes n LEFT JOIN mutual m ON m.a=n.node
       GROUP BY 1 ORDER BY 1""",
    note="strongly connected components of the directed nation trade "
    "graph (customer-nation -> supplier-nation, >=25 shipments); "
    "component = lexicographic min member, oracle via mutual reachability",
)
def g17(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.algorithms import strongly_connected_components

    c = Catalog(spark, sf_dir)
    li = c.table("lineitem").select("l_orderkey", "l_suppkey")
    o = c.table("orders").select("o_orderkey", "o_custkey")
    cu = c.table("customer").select("c_custkey", "c_nationkey")
    su = c.table("supplier").select("s_suppkey", "s_nationkey")
    ne = (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cu), F.col("o_custkey") == cu.c_custkey)
        .join(F.broadcast(su), F.col("l_suppkey") == su.s_suppkey)
        .groupBy(
            F.concat(F.lit("n"), F.col("c_nationkey").cast("string")).alias("src"),
            F.concat(F.lit("n"), F.col("s_nationkey").cast("string")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 25)
        .select("src", "dst")
    )
    nodes = ne.select(F.col("src").alias("id")).union(
        ne.select(F.col("dst").alias("id"))
    ).distinct()
    return strongly_connected_components(PropertyGraph(nodes, ne)).orderBy("node")


@_g(
    "g18_temporal_agg_indexed",
    """SELECT o_custkey AS entity_id, round(sum(o_totalprice),2) AS s,
       count(*)::BIGINT AS c, round(min(o_totalprice),2) AS mn,
       round(max(o_totalprice),2) AS mx,
       floor(round(sum(o_totalprice),2)*10000/count(*) + 0.5)/10000 AS avg
       FROM orders
       WHERE o_orderdate >= TIMESTAMP '1996-03-15'
         AND o_orderdate <  TIMESTAMP '1998-07-10'
       GROUP BY 1 ORDER BY 1""",
    note="temporal aggregate over a ragged range [1996-03-15, 1998-07-10) "
    "answered from the materialized monthly rollup for interior buckets + "
    "grain rows for the two edge buckets (the reference's temporal "
    "aggregate index, as storage-layout pruning); oracle scans the grain "
    "directly — identical result proves index-path equivalence. avg is "
    "derived from the ROUNDED sum in both engines so partial-sum "
    "regrouping drift cannot shift the 4-dp half boundary",
)
def g18(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..temporal.aggregate_index import build_rollup, range_aggregate_indexed

    c = Catalog(spark, sf_dir)
    grain = c.table("orders").select(
        F.col("o_custkey").alias("entity_id"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_totalprice").alias("value"),
    )
    rollup = build_rollup(grain, ["entity_id"], "ts", "value", "month")
    res = range_aggregate_indexed(
        grain, rollup, ["entity_id"], "ts", "value", "1996-03-15", "1998-07-10", "month"
    )
    s2 = F.round(F.col("s"), 2)
    return res.select(
        "entity_id",
        s2.alias("s"),
        F.col("c"),
        F.round("mn", 2).alias("mn"),
        F.round("mx", 2).alias("mx"),
        (F.floor(s2 * 10000 / F.col("c") + F.lit(0.5)) / 10000).alias("avg"),
    ).orderBy("entity_id")


@_g(
    "g19_motif_wedges",
    f"""WITH {GRAPH_CTES},
       ge AS (SELECT src, dst FROM graph_edges WHERE n_items >= 3)
       SELECT e1.dst AS b, count(*)::BIGINT AS n_wedges
       FROM ge e1 JOIN ge e2 ON e1.dst=e2.dst AND e1.src<e2.src
       GROUP BY 1 ORDER BY 1""",
    note="motif matching through find(['a->b','c->b']): ordered "
    "co-purchase wedges per supplier on the n_items>=3 subgraph",
)
def g19(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.motif import find

    c = Catalog(spark, sf_dir)
    ge = c.graph_edges().filter(F.col("n_items") >= 3).select("src", "dst")
    nodes = (
        ge.select(F.col("src").alias("id")).union(ge.select(F.col("dst").alias("id"))).distinct()
    )
    wedges = find(PropertyGraph(nodes, ge), ["a->b", "c->b"]).filter(F.col("a") < F.col("c"))
    return wedges.groupBy("b").agg(F.count(F.lit(1)).alias("n_wedges")).orderBy("b")


@_g(
    "g20_interval_writes",
    """SELECT o_custkey AS entity_id, count(*)::BIGINT AS active
       FROM orders WHERE o_orderdate <= TIMESTAMP '1997-06-15'
         AND o_orderdate + INTERVAL 30 DAY > TIMESTAMP '1997-06-15'
       GROUP BY 1 ORDER BY 1""",
    note="interval temporal writes (the reference's "
    "setTemporalProperty(t1,t2,v) surface): each order is an interval "
    "write valid [o_orderdate, +30d); engine converts intervals to "
    "+1/-1 change-point deltas and answers 'active intervals at t' as a "
    "cumulative point-read; oracle checks interval containment directly",
)
def g20(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..temporal.tprop import value_at

    o = Catalog(spark, sf_dir).table("orders")
    starts = o.select(
        F.col("o_custkey").alias("entity_id"),
        F.col("o_orderdate").alias("ts"),
        F.lit(1).cast("long").alias("delta"),
    )
    ends = o.select(
        F.col("o_custkey").alias("entity_id"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("ts"),
        F.lit(-1).cast("long").alias("delta"),
    )
    deltas = starts.unionByName(ends)
    t = F.lit("1997-06-15").cast("timestamp")
    res = value_at(deltas, t, value_col="delta", cumulative=True)
    return (
        res.filter(F.col("value") > 0)
        .select("entity_id", F.col("value").alias("active"))
        .orderBy("entity_id")
    )


@_g(
    "g22_landmark_closeness",
    f"""WITH RECURSIVE {GRAPH_CTES},
       lms AS (SELECT node FROM graph_nodes WHERE node IN ('c1','c5','c9')),
       bfs(lm, node, hops) AS (
         SELECT node, node, 0 FROM lms
         UNION
         SELECT b.lm, e.dst, b.hops+1 FROM bfs b
         JOIN graph_edges_sym e ON b.node=e.src WHERE b.hops<6),
       dist AS (SELECT lm, node, min(hops) AS d FROM bfs GROUP BY 1,2),
       agg AS (SELECT node, count(*) AS nl, sum(d)::BIGINT AS sumd FROM dist GROUP BY 1)
       SELECT node, sumd,
              round((SELECT count(*) FROM lms)*1.0/sumd, 6) AS closeness
       FROM agg
       WHERE nl = (SELECT count(*) FROM lms) AND sumd > 0 ORDER BY node""",
    note="landmark-approximated closeness centrality: ONE multi-source "
    "frontier loop covers all landmarks (state keyed (landmark, node)), "
    "the scale substitute for per-node exact closeness which needs O(V) "
    "BFS runs; nodes must be reached by every landmark",
)
def g22(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.algorithms import multi_source_bfs

    g = _sym_graph(Catalog(spark, sf_dir))
    dist = multi_source_bfs(g, ["c1", "c5", "c9"], max_hops=6)
    n_lms = dist.select("lm").distinct().count()
    return (
        dist.groupBy("node")
        .agg(F.count(F.lit(1)).alias("nl"), F.sum("d").alias("sumd"))
        .filter((F.col("nl") == n_lms) & (F.col("sumd") > 0))
        .select(
            "node",
            "sumd",
            F.round(F.lit(float(n_lms)) / F.col("sumd"), 6).alias("closeness"),
        )
        .orderBy("node")
    )


@_g(
    "g23_node_similarity",
    f"""WITH {GRAPH_CTES},
       e AS (SELECT DISTINCT src AS cust, dst AS supp FROM graph_edges WHERE n_items >= 2),
       deg AS (SELECT supp, count(*) AS d FROM e GROUP BY 1),
       inter AS (SELECT a.supp AS a, b.supp AS b, count(*) AS common
                 FROM e a JOIN e b ON a.cust=b.cust AND a.supp < b.supp
                 GROUP BY 1,2 HAVING count(*) >= 2)
       SELECT i.a, i.b, i.common::BIGINT AS common,
              round(i.common*1.0/(da.d + db.d - i.common), 6) AS jaccard
       FROM inter i JOIN deg da ON da.supp=i.a JOIN deg db ON db.supp=i.b
       ORDER BY jaccard DESC, i.a, i.b LIMIT 50""",
    note="Jaccard node similarity between suppliers by shared customers "
    "(GDS nodeSimilarity shape): inverted-index self-join on the shared "
    "neighbor key — never a cross join; degree frames broadcast",
)
def g23(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.algorithms import node_similarity_jaccard

    e = Catalog(spark, sf_dir).graph_edges().filter(F.col("n_items") >= 2)
    sim = node_similarity_jaccard(e, left_col="src", right_col="dst", min_common=2)
    return sim.orderBy(F.col("jaccard").desc(), "a", "b").limit(50)


@_g(
    "g24_edge_triangle_support",
    f"""WITH {GRAPH_CTES},
       ge AS (SELECT src, dst FROM graph_edges WHERE n_items >= 2),
       cos AS (SELECT DISTINCT a.dst AS s1, b.dst AS s2
               FROM ge a JOIN ge b ON a.src=b.src AND a.dst<b.dst),
       tri AS (SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
               FROM cos e1 JOIN cos e2 ON e2.s1=e1.s2
               JOIN cos e3 ON e3.s1=e1.s1 AND e3.s2=e2.s2),
       sup AS (SELECT a AS s1, b AS s2 FROM tri
               UNION ALL SELECT b, c FROM tri
               UNION ALL SELECT a, c FROM tri)
       SELECT s1, s2, count(*)::BIGINT AS support
       FROM sup GROUP BY 1,2 ORDER BY 1,2""",
    note="per-edge triangle support on the co-supplier graph — the "
    "k-truss counting kernel (an edge is in a k-truss iff support >= "
    "k-2); same canonical a<b<c self-join as g05, plus a 3-way edge "
    "credit and one combinable groupBy",
)
def g24(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.algorithms import edge_triangle_support

    c = Catalog(spark, sf_dir)
    ge = c.graph_edges().filter(F.col("n_items") >= 2).select("src", "dst")
    a = ge.select(F.col("src").alias("k"), F.col("dst").alias("s1"))
    b = ge.select(F.col("src").alias("k"), F.col("dst").alias("s2"))
    cos = a.join(b, "k").filter(F.col("s1") < F.col("s2")).select("s1", "s2").distinct()
    return edge_triangle_support(cos).orderBy("s1", "s2")


@_g(
    "g25_degree_histogram",
    f"""WITH {GRAPH_CTES},
       deg AS (SELECT src AS node, count(*) AS d FROM graph_edges_sym GROUP BY 1)
       SELECT CAST(floor(ln(d)/ln(2)) AS INT) AS bucket,
              count(*)::BIGINT AS nodes,
              min(d)::BIGINT AS min_deg, max(d)::BIGINT AS max_deg
       FROM deg GROUP BY 1 ORDER BY 1""",
    note="log2-bucketed degree distribution — the power-law summary "
    "that drives skew decisions (salting thresholds, hub capping) at "
    "scale; two combinable aggregations, no joins",
)
def g25(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).graph_edges_sym()
    deg = e.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    return (
        deg.groupBy(
            F.floor(F.log(F.col("d").cast("double")) / F.log(F.lit(2.0)))
            .cast("int")
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("nodes"),
            F.min("d").alias("min_deg"),
            F.max("d").alias("max_deg"),
        )
        .orderBy("bucket")
    )


@_g(
    "g26_recursive_sql_traversal",
    f"""WITH RECURSIVE {GRAPH_CTES},
       r(node, hops) AS (
         SELECT 'c1', 0
         UNION ALL
         SELECT e.dst, r.hops+1 FROM r
         JOIN graph_edges_sym e ON r.node=e.src WHERE r.hops < 3)
       SELECT node, min(hops) AS d, count(*)::BIGINT AS n_paths
       FROM r GROUP BY 1 ORDER BY 1""",
    note="the reference's traversal surface in PURE SQL on BOTH engines: "
    "Spark 4 recursive CTE (UNION ALL path enumeration, hop-bounded) "
    "runs the same statement DuckDB does — no Pregel loop involved; "
    "complements g03's frontier-dedup BFS with exact path counting",
)
def g26(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    c.graph_edges_sym().createOrReplaceTempView("g26_edges_sym")
    return spark.sql(
        """WITH RECURSIVE r(node, hops) AS (
             SELECT 'c1', 0
             UNION ALL
             SELECT e.dst, r.hops + 1 FROM r
             JOIN g26_edges_sym e ON r.node = e.src WHERE r.hops < 3)
           SELECT node, min(hops) AS d, count(*) AS n_paths
           FROM r GROUP BY node ORDER BY node"""
    )


def _ppr_oracle(iters: int = 8) -> str:
    """Unrolled personalized PageRank (teleport restricted to a source
    set); MATERIALIZED per iteration so DuckDB doesn't inline-explode
    the chained LEFT-JOIN aggregates."""
    srcs = "('c1','c5','c9')"
    steps = []
    prev = "pr0"
    for i in range(1, iters + 1):
        cur = f"pr{i}"
        steps.append(
            f"""{cur} AS MATERIALIZED (
  SELECT n.node,
         (CASE WHEN n.node IN {srcs} THEN 0.15::DOUBLE/(SELECT c FROM ns) ELSE 0.0::DOUBLE END)
         + 0.85::DOUBLE*coalesce(sum(p.r/od.d),0) AS r
  FROM graph_nodes n
  LEFT JOIN graph_edges_sym e ON e.dst=n.node
  LEFT JOIN {prev} p ON p.node=e.src
  LEFT JOIN outdeg od ON od.src=e.src
  GROUP BY n.node)"""
        )
        prev = cur
    chain = ",\n".join(steps)
    return f"""WITH {GRAPH_CTES},
ns AS (SELECT count(*) AS c FROM graph_nodes WHERE node IN {srcs}),
outdeg AS (SELECT src, count(*) AS d FROM graph_edges_sym GROUP BY 1),
pr0 AS (SELECT node,
  CASE WHEN node IN {srcs} THEN 1.0::DOUBLE/(SELECT c FROM ns) ELSE 0.0::DOUBLE END AS r
  FROM graph_nodes),
{chain}
SELECT node, round(r, 8) AS r FROM pr{iters} ORDER BY r DESC, node LIMIT 20"""


@_g(
    "g21_personalized_pagerank",
    _ppr_oracle(),
    note="random-walk-with-restart relevance from a 3-node seed set "
    "(teleport mass restricted to the seeds) — the reference's "
    "neighborhood-relevance traversal as a Pregel loop; identical "
    "superstep cost to g06, only the teleport vector differs",
)
def g21(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.algorithms import personalized_pagerank

    g = _sym_graph(Catalog(spark, sf_dir))
    ranks = personalized_pagerank(g, ["c1", "c5", "c9"], iterations=8, damping=0.85)
    return (
        ranks.select("node", F.round("rank", 8).alias("r"))
        .orderBy(F.col("r").desc(), F.col("node").asc())
        .limit(20)
    )


def _hits_oracle(iters: int = 4) -> str:
    steps = ["e AS MATERIALIZED (SELECT DISTINCT src, dst FROM graph_edges)",
             "h0 AS MATERIALIZED (SELECT DISTINCT src AS node, 1.0::DOUBLE AS v FROM e)"]
    prev_h = "h0"
    for i in range(1, iters + 1):
        steps.append(
            f"""a{i}r AS MATERIALIZED (SELECT e.dst AS node, sum(h.v) AS v
  FROM e JOIN {prev_h} h ON h.node=e.src GROUP BY 1)"""
        )
        steps.append(
            f"a{i} AS MATERIALIZED (SELECT node, v/(SELECT sum(v) FROM a{i}r) AS v FROM a{i}r)"
        )
        steps.append(
            f"""h{i}r AS MATERIALIZED (SELECT e.src AS node, sum(a.v) AS v
  FROM e JOIN a{i} a ON a.node=e.dst GROUP BY 1)"""
        )
        steps.append(
            f"h{i} AS MATERIALIZED (SELECT node, v/(SELECT sum(v) FROM h{i}r) AS v FROM h{i}r)"
        )
        prev_h = f"h{i}"
    chain = ",\n".join(steps)
    return f"""WITH {GRAPH_CTES},
{chain},
hb AS (SELECT 'auth' AS role, node, round(v, 6) AS score FROM a{iters}
       UNION ALL
       SELECT 'hub', node, round(v, 6) FROM h{iters})
SELECT role, node, score FROM hb
QUALIFY row_number() OVER (PARTITION BY role ORDER BY score DESC, node) <= 20
ORDER BY role, score DESC, node"""


@_g(
    "g28_hits",
    _hits_oracle(),
    note="HITS hubs & authorities, 4 L1-normalized power iterations — "
    "the mutually-recursive centrality pair (hubs point at good "
    "authorities, authorities are pointed at by good hubs); each "
    "half-step is one join + combinable groupBy over stationary edges, "
    "normalization collects a single scalar; top-20 per role",
)
def g28(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.algorithms import hits
    from pyspark.sql import Window as W

    e = Catalog(spark, sf_dir).graph_edges()
    scored = hits(e, iterations=4).select(
        "role", "node", F.round("score", 6).alias("score")
    )
    w = W.partitionBy("role").orderBy(F.col("score").desc(), F.col("node"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .drop("rn")
        .orderBy("role", F.col("score").desc(), "node")
    )


@_g(
    "g27_adamic_adar",
    f"""WITH {GRAPH_CTES},
       e AS (SELECT DISTINCT src AS cust, dst AS supp FROM graph_edges
             WHERE n_items >= 2),
       deg AS (SELECT cust, count(*) AS d FROM e GROUP BY 1),
       pairs AS (SELECT a.supp AS a, b.supp AS b, a.cust AS z
                 FROM e a JOIN e b ON a.cust=b.cust AND a.supp < b.supp)
       SELECT p.a, p.b, count(*)::BIGINT AS common,
              round(sum(1.0/ln(d.d)), 6) AS aa_score
       FROM pairs p JOIN deg d ON d.cust=p.z AND d.d > 1
       GROUP BY 1, 2 HAVING count(*) >= 2
       ORDER BY aa_score DESC, p.a, p.b LIMIT 50""",
    note="Adamic-Adar link prediction between suppliers: common-customer "
    "neighbors weighted by 1/ln(degree) — rare shared neighbors count "
    "more (GDS linkPrediction.adamicAdar shape); same inverted-index "
    "self-join as g23 (never a cross join), degree frame broadcast, "
    "min_common=2 prunes the pair tail before the aggregate",
)
def g27(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.algorithms import adamic_adar

    e = Catalog(spark, sf_dir).graph_edges().filter(F.col("n_items") >= 2)
    scores = adamic_adar(e, left_col="src", right_col="dst", min_common=2)
    return scores.orderBy(F.col("aa_score").desc(), "a", "b").limit(50)


def _ktruss_oracle(k: int = 4, rounds: int = 3) -> str:
    steps = [
        """ge AS (SELECT src, dst FROM graph_edges WHERE n_items >= 2),
e0 AS MATERIALIZED (SELECT DISTINCT a.dst AS s1, b.dst AS s2
  FROM ge a JOIN ge b ON a.src=b.src AND a.dst<b.dst)"""
    ]
    for r in range(1, rounds + 1):
        p = f"e{r-1}"
        steps.append(
            f"""tri{r} AS MATERIALIZED (SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
  FROM {p} e1 JOIN {p} e2 ON e2.s1=e1.s2
  JOIN {p} e3 ON e3.s1=e1.s1 AND e3.s2=e2.s2)"""
        )
        steps.append(
            f"""sup{r} AS MATERIALIZED (SELECT s1, s2, count(*) AS support FROM (
  SELECT a AS s1, b AS s2 FROM tri{r}
  UNION ALL SELECT b, c FROM tri{r}
  UNION ALL SELECT a, c FROM tri{r}) u
  GROUP BY 1, 2 HAVING count(*) >= {k - 2})"""
        )
        steps.append(f"e{r} AS MATERIALIZED (SELECT s1, s2 FROM sup{r})")
    chain = ",\n".join(steps)
    return f"""WITH {GRAPH_CTES},
{chain}
SELECT s1, s2, support::BIGINT AS support FROM sup{rounds} ORDER BY 1, 2"""


@_g(
    "g29_ktruss",
    _ktruss_oracle(),
    note="4-truss peel on the co-supplier graph: 3 synchronous rounds "
    "of drop-edges-with-support<2 (the dense-cohesion refinement of "
    "g24's counting kernel); round count is part of the declared "
    "semantics so both engines run identical sweeps; per-round "
    "localCheckpoint keeps the iterated plan flat",
)
def g29(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.algorithms import ktruss_peel

    ge = Catalog(spark, sf_dir).graph_edges().filter(F.col("n_items") >= 2)
    a = ge.select(F.col("src").alias("cu"), F.col("dst").alias("s1"))
    b = ge.select(F.col("src").alias("cu"), F.col("dst").alias("s2"))
    cos = (
        a.join(b, "cu")
        .filter(F.col("s1") < F.col("s2"))
        .select("s1", "s2")
        .distinct()
    )
    return ktruss_peel(cos, k=4, rounds=3).orderBy("s1", "s2")


@_g(
    "g30_clustering_coeff",
    f"""WITH {GRAPH_CTES},
       ge AS (SELECT src, dst FROM graph_edges WHERE n_items >= 3),
       cos AS (SELECT DISTINCT a.dst AS s1, b.dst AS s2
               FROM ge a JOIN ge b ON a.src=b.src AND a.dst<b.dst),
       sym AS (SELECT s1, s2 FROM cos UNION SELECT s2, s1 FROM cos),
       deg AS (SELECT s1 AS node, count(*) AS d FROM sym GROUP BY 1),
       wedge AS (SELECT a.s1 AS node, count(*) AS paths
                 FROM sym a JOIN sym b ON a.s2=b.s1 AND b.s2<>a.s1
                 JOIN sym c ON c.s1=a.s1 AND c.s2=b.s2
                 GROUP BY 1)
       SELECT d.node, CAST(d.d AS BIGINT) AS degree,
       CAST(coalesce(w.paths,0)/2 AS BIGINT) AS n_tri,
       round(CASE WHEN d.d < 2 THEN 0.0
             ELSE coalesce(w.paths,0)*1.0/(d.d*(d.d-1)) END, 6) AS cc
       FROM deg d LEFT JOIN wedge w ON d.node=w.node ORDER BY d.node""",
    note="local clustering coefficient per node: closed wedges / "
    "possible wedges on the thresholded co-supplier graph.  The wedge "
    "join is the same a<b<c kernel as g05/g24 with a per-apex groupBy; "
    "at scale the sym edge list is bucketed on s1 so the two hops "
    "co-locate and the count is one shuffle",
)
def g30(spark: SparkSession, sf_dir: str) -> DataFrame:
    ge = Catalog(spark, sf_dir).graph_edges().filter(F.col("n_items") >= 3)
    a = ge.select(F.col("src").alias("cu"), F.col("dst").alias("s1"))
    b = ge.select(F.col("src").alias("cu"), F.col("dst").alias("s2"))
    cos = a.join(b, "cu").filter(F.col("s1") < F.col("s2")).select("s1", "s2").distinct()
    sym = cos.union(cos.select(F.col("s2").alias("s1"), F.col("s1").alias("s2")))
    deg = sym.groupBy(F.col("s1").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    e1 = sym.select(F.col("s1").alias("apex"), F.col("s2").alias("mid"))
    e2 = sym.select(F.col("s1").alias("mid"), F.col("s2").alias("far"))
    closing = sym.select(F.col("s1").alias("apex"), F.col("s2").alias("far"))
    wedge = (
        e1.join(e2, "mid")
        .filter(F.col("far") != F.col("apex"))
        .join(closing, ["apex", "far"])
        .groupBy(F.col("apex").alias("node"))
        .agg(F.count(F.lit(1)).alias("paths"))
    )
    paths = F.coalesce(F.col("paths"), F.lit(0))
    return (
        deg.join(wedge, "node", "left")
        .select(
            "node",
            F.col("d").cast("long").alias("degree"),
            (paths / 2).cast("long").alias("n_tri"),
            F.round(
                F.when(F.col("d") < 2, F.lit(0.0)).otherwise(
                    paths * 1.0 / (F.col("d") * (F.col("d") - 1))
                ),
                6,
            ).alias("cc"),
        )
        .orderBy("node")
    )


@_g(
    "g31_assortativity",
    f"""WITH {GRAPH_CTES},
       deg AS (SELECT src AS node, count(*) AS d FROM graph_edges_sym GROUP BY 1)
       SELECT round(corr(ds.d, dd.d), 4) AS assort, count(*) AS n_edges
       FROM graph_edges_sym e JOIN deg ds ON e.src=ds.node
       JOIN deg dd ON e.dst=dd.node""",
    note="degree assortativity (Pearson corr of endpoint degrees over "
    "directed sym edges — Newman's r).  The degree table is tiny "
    "relative to edges, so both joins broadcast; corr is a single-pass "
    "moment aggregate (no sort), identical sample formula both engines",
)
def g31(spark: SparkSession, sf_dir: str) -> DataFrame:
    sym = Catalog(spark, sf_dir).graph_edges_sym()
    deg = sym.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    ds = deg.select(F.col("node").alias("src"), F.col("d").alias("d_src"))
    dd = deg.select(F.col("node").alias("dst"), F.col("d").alias("d_dst"))
    return (
        sym.join(F.broadcast(ds), "src")
        .join(F.broadcast(dd), "dst")
        .agg(
            F.round(F.corr("d_src", "d_dst"), 4).alias("assort"),
            F.count(F.lit(1)).alias("n_edges"),
        )
    )


@_g(
    "g32_snapshot_series",
    f"""WITH {GRAPH_CTES},
       q AS (SELECT date_trunc('quarter', first_ts) AS qt, count(*) AS born
             FROM graph_edges GROUP BY 1)
       SELECT strftime(qt, '%Y-%m-%d') AS quarter, CAST(born AS BIGINT) AS new_edges,
       CAST(sum(born) OVER (ORDER BY qt) AS BIGINT) AS cum_edges
       FROM q ORDER BY qt""",
    note="graph-evolution time-series: edges born per quarter + the "
    "running graph size — the snapshot-at-every-t generalization of "
    "g07's single snapshot (TGraph's temporal graph view over time).  "
    "Aggregates to ~tens of rows BEFORE the single-partition cumsum "
    "window, so the unpartitioned window is safe at any scale",
)
def g32(spark: SparkSession, sf_dir: str) -> DataFrame:
    ge = Catalog(spark, sf_dir).graph_edges()
    q = ge.groupBy(F.date_trunc("quarter", "first_ts").alias("qt")).agg(
        F.count(F.lit(1)).alias("born")
    )
    w = Window.orderBy("qt")
    return (
        q.select(
            F.date_format("qt", "yyyy-MM-dd").alias("quarter"),
            F.col("born").cast("long").alias("new_edges"),
            F.sum("born").over(w).cast("long").alias("cum_edges"),
        )
        .orderBy("quarter")
    )


def _wpagerank_oracle(iterations: int = 10, weight_sql: str = "n_items::DOUBLE") -> str:
    """Unrolled weighted PageRank (same chained-CTE shape as g06's
    oracle, with contributions split by edge weight / out-weight).
    `weight_sql` is the per-edge weight expression over graph_edges
    columns — n_items for g33, a recency decay for g70."""
    iters = []
    prev = "pr0"
    for i in range(1, iterations + 1):
        cur = f"pr{i}"
        iters.append(
            f"""{cur} AS (
  SELECT n.node, 0.15::DOUBLE/(SELECT c FROM nv)
         + 0.85::DOUBLE*coalesce(sum(p.r*e.w/ow.ws),0) AS r
  FROM graph_nodes n
  LEFT JOIN wsym e ON e.dst=n.node
  LEFT JOIN {prev} p ON p.node=e.src
  LEFT JOIN outw ow ON ow.src=e.src
  GROUP BY n.node)"""
        )
        prev = cur
    chain = ",\n".join(iters)
    return f"""WITH {GRAPH_CTES},
wsym AS (SELECT src, dst, {weight_sql} AS w FROM graph_edges
         UNION ALL SELECT dst, src, {weight_sql} FROM graph_edges),
nv AS (SELECT count(*) AS c FROM graph_nodes),
outw AS (SELECT src, sum(w) AS ws FROM wsym GROUP BY 1),
pr0 AS (SELECT node, 1.0::DOUBLE/(SELECT c FROM nv) AS r FROM graph_nodes),
{chain}
SELECT node, round(r, 6) AS r FROM pr{iterations} ORDER BY r DESC, node LIMIT 20"""


@_g(
    "g33_weighted_pagerank",
    _wpagerank_oracle(),
    note="edge-weighted PageRank (mass split by n_items / out-weight — "
    "the GDS relationshipWeightProperty variant; on the sales graph, "
    "high-volume trading relationships pull rank).  Weights ride the "
    "stationary edge rows, so the superstep cost model is identical to "
    "g06: one dst-combine shuffle per iteration.  Rounded to 6dp — one "
    "fewer digit than g06 because weight-ratio doubles accumulate "
    "cross-engine summation drift over 10 iterations",
)
def g33(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.algorithms import pagerank_weighted

    c = Catalog(spark, sf_dir)
    e = c.graph_edges().select("src", "dst", F.col("n_items").cast("double").alias("weight"))
    wsym = e.unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("weight"))
    )
    v = c.graph_nodes().select(F.col("node").alias("id"))
    ranks = pagerank_weighted(PropertyGraph(v, wsym), iterations=10, damping=0.85)
    return (
        ranks.select("node", F.round("rank", 6).alias("r"))
        .orderBy(F.col("r").desc(), "node")
        .limit(20)
    )


@_g(
    "g34_snapshot_bfs",
    f"""WITH RECURSIVE {GRAPH_CTES},
       snap AS (SELECT src, dst FROM graph_edges
                WHERE first_ts <= TIMESTAMP '1996-06-01'),
       snap_sym AS (SELECT src, dst FROM snap UNION SELECT dst, src FROM snap),
       bfs(node, hops) AS (
         SELECT 'c1', 0
         UNION
         SELECT e.dst, b.hops+1 FROM bfs b JOIN snap_sym e ON b.node=e.src
         WHERE b.hops<3)
       SELECT node, min(hops)::INT AS d FROM bfs GROUP BY 1 ORDER BY 1""",
    note="snapshot traversal: BFS over the graph AS OF t (edges whose "
    "first_ts <= t) — TGraph's snapshot query composed with its "
    "traversal framework.  The time predicate lands on the edge view "
    "BEFORE symmetrization, so the frontier loop runs on the pruned "
    "snapshot; at 100 TB the edge table's time-bucket partitioning "
    "makes the snapshot filter a partition prune, not a scan",
)
def g34(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    snap = (
        c.graph_edges()
        .filter(F.col("first_ts") <= F.lit("1996-06-01").cast("timestamp"))
        .select("src", "dst")
    )
    sym = snap.union(
        snap.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    v = sym.select(F.col("src").alias("id")).distinct()
    g = PropertyGraph(v, sym)
    return bfs_distances(g, "c1", 3).select("node", F.col("d").cast("int")).orderBy("node")


@_g(
    "g35_graph_summary",
    f"""WITH {GRAPH_CTES},
       deg AS (SELECT src, count(*) AS d FROM graph_edges GROUP BY 1)
       SELECT (SELECT count(*) FROM graph_nodes) AS nv,
       (SELECT count(*) FROM graph_edges) AS ne,
       round((SELECT count(*) FROM graph_edges)*1.0 /
         ((SELECT count(*) FROM graph_nodes)
          *((SELECT count(*) FROM graph_nodes)-1)), 6) AS density,
       round((SELECT avg(d) FROM deg), 4) AS avg_out_deg,
       (SELECT max(d) FROM deg)::BIGINT AS max_out_deg""",
    note="one-row graph profile (|V|, |E|, density, degree stats) — the "
    "graph.info() read that drives every planning decision (broadcast "
    "vs shuffle, local-kernel routing, skew salting).  Three tiny "
    "aggregates over the cached edge view; no join touches fact rows",
)
def g35(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    nv = c.graph_nodes().count()
    deg = c.graph_edges().groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    return deg.agg(
        F.lit(nv).cast("long").alias("nv"),
        F.sum("d").cast("long").alias("ne"),
        F.round(F.sum("d") * 1.0 / (nv * (nv - 1)), 6).alias("density"),
        F.round(F.avg("d"), 4).alias("avg_out_deg"),
        F.max("d").cast("long").alias("max_out_deg"),
    )


@_g(
    "g36_cosine_node_similarity",
    f"""WITH {GRAPH_CTES},
       norms AS (SELECT dst, sqrt(sum(weight*weight)) AS nrm
                 FROM graph_edges GROUP BY 1),
       pairs AS (SELECT a.dst AS s1, b.dst AS s2,
                 sum(a.weight*b.weight) AS dot, count(*) AS n_shared
                 FROM graph_edges a JOIN graph_edges b
                 ON a.src=b.src AND a.dst<b.dst GROUP BY 1,2)
       SELECT p.s1, p.s2, p.n_shared, round(p.dot/(na.nrm*nb.nrm), 4) AS cos_sim
       FROM pairs p JOIN norms na ON na.dst=p.s1 JOIN norms nb ON nb.dst=p.s2
       WHERE p.n_shared >= 3 ORDER BY 1,2""",
    note="weighted cosine node similarity (g23's Jaccard with revenue "
    "weights — GDS nodeSimilarity's cosine mode): suppliers as sparse "
    "customer-weight vectors, dot products via the inverted-index "
    "self-join on the shared-customer key, norms broadcast back; 4dp rounding because 150-term money dot products drift past 6dp.  "
    "Never a dense pairwise matrix; cost bounded by per-customer "
    "supplier fan-out",
)
def g36(spark: SparkSession, sf_dir: str) -> DataFrame:
    ge = Catalog(spark, sf_dir).graph_edges().select("src", "dst", "weight")
    norms = ge.groupBy("dst").agg(F.sqrt(F.sum(F.col("weight") * F.col("weight"))).alias("nrm"))
    a = ge.select(F.col("src").alias("cu"), F.col("dst").alias("s1"), F.col("weight").alias("wa"))
    b = ge.select(F.col("src").alias("cu"), F.col("dst").alias("s2"), F.col("weight").alias("wb"))
    pairs = (
        a.join(b, "cu")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(
            F.sum(F.col("wa") * F.col("wb")).alias("dot"),
            F.count(F.lit(1)).alias("n_shared"),
        )
        .filter(F.col("n_shared") >= 3)
    )
    na = norms.select(F.col("dst").alias("s1"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("dst").alias("s2"), F.col("nrm").alias("nb"))
    return (
        pairs.join(F.broadcast(na), "s1")
        .join(F.broadcast(nb), "s2")
        .select(
            "s1", "s2", "n_shared",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 4).alias("cos_sim"),
        )
        .orderBy("s1", "s2")
    )


@_g(
    "g37_time_dependent_arrival",
    f"""WITH {GRAPH_CTES},
       et AS (SELECT src, dst, first_ts, n_items FROM graph_edges
              UNION ALL SELECT dst, src, first_ts, n_items FROM graph_edges),
       a1 AS (SELECT dst AS node, first_ts + n_items*INTERVAL 1 DAY AS t
              FROM et WHERE src='c1'),
       a2 AS (SELECT e.dst AS node, e.first_ts + e.n_items*INTERVAL 1 DAY AS t
              FROM a1 JOIN et e ON e.src=a1.node AND e.first_ts >= a1.t),
       a3 AS (SELECT e.dst AS node, e.first_ts + e.n_items*INTERVAL 1 DAY AS t
              FROM a2 JOIN et e ON e.src=a2.node AND e.first_ts >= a2.t),
       allp AS (SELECT node, t FROM a1 UNION ALL SELECT node, t FROM a2
                UNION ALL SELECT node, t FROM a3)
       SELECT node, strftime(min(t), '%Y-%m-%d %H:%M:%S.%f') AS arrival
       FROM allp GROUP BY 1 ORDER BY 1""",
    note="TIME-DEPENDENT earliest arrival (<=3 hops from c1): crossing "
    "an edge departing at first_ts takes n_items days — the "
    "travel-time-per-edge routing model of the reference's road-network "
    "workload (g12 is the zero-duration special case).  Same lossless "
    "min-frontier loop: feasibility compares departures, and far-end "
    "arrival is independent of near-end arrival",
)
def g37(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.algorithms import earliest_arrival
    from .common import ts_str

    ge = Catalog(spark, sf_dir).graph_edges().select("src", "dst", "first_ts", "n_items")
    et = ge.unionAll(
        ge.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"),
            F.col("first_ts"), F.col("n_items"),
        )
    )
    arr = earliest_arrival(et, "c1", max_hops=3, duration_days_col="n_items")
    return arr.select("node", ts_str(F.col("arrival_ts")).alias("arrival")).orderBy("node")


@_g(
    "g38_copurchase_projection",
    """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
         FROM lineitem),
       pp AS (SELECT a.pk AS p1, b.pk AS p2 FROM op a
              JOIN op b ON a.ok = b.ok AND a.pk < b.pk)
       SELECT p1, p2, count(*) AS n_orders FROM pp GROUP BY 1, 2
       HAVING count(*) >= 2 ORDER BY 3 DESC, 1, 2 LIMIT 100""",
    note="bipartite projection (order–part onto part–part): the "
    "market-basket co-occurrence graph.  The self-join is quadratic in "
    "basket size — safe here because TPC-H baskets are <=7 items; at "
    "100 TB the guard is a per-basket size cap (filter baskets above "
    "k items before the join) plus salting for viral baskets, and the "
    "join shuffles once on the basket key which a bucketed-by-orderkey "
    "layout makes shuffle-free.  Top-100 by support with a total "
    "(n DESC, p1, p2) tie-break",
)
def g38(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    op = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
    # uncapped: TPC-H baskets are <= 7 items; basket_cap is the 100 TB
    # viral-basket lever (operators/recsys, bench_skewed_baskets)
    return (
        item_item_cooccurrence(op, basket_col="ok", item_col="pk", min_cooc=2)
        .select(
            F.col("s1").alias("p1"),
            F.col("s2").alias("p2"),
            F.col("cooc").alias("n_orders"),
        )
        .orderBy(F.desc("n_orders"), "p1", "p2")
        .limit(100)
    )


@_g(
    "g39_betweenness",
    None,
    note="sampled-source betweenness centrality (Brandes-Pich): "
    "dependency sums from the supplier-side nodes only — the "
    "broker/bottleneck read.  Rows-only by design (Brandes is not "
    "SQL-expressible); exactness is covered by "
    "tests/test_properties.py betweenness parity tests against an "
    "independent pair-summation reference, on both the local numpy "
    "kernel and the source-parallel distributed path.  Scale shape: "
    "parallel across sources with the (small, rolled-up) edge list "
    "replicated per task — see algorithms.betweenness_centrality "
    "docstring for why a graph too big to replicate means sampling "
    "landmarks (g22), not exact betweenness",
)
def g39(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.algorithms import betweenness_centrality

    c = Catalog(spark, sf_dir)
    g = _sym_graph(c)
    sources = [
        r[0]
        for r in g.vertices.filter(F.col("id").startswith("s"))
        .select("id")
        .orderBy("id")
        .collect()
    ]
    bc = betweenness_centrality(g, sources=sources)
    return (
        bc.select("node", F.round("bc", 4).alias("bc"))
        .orderBy(F.desc("bc"), "node")
        .limit(50)
    )


def _matching_oracle() -> str:
    """Unrolled 3-round propose-accept matching as chained CTEs (one
    argmax-per-src window, one argmax-per-dst window, and a cumulative
    matched-node exclusion per round)."""
    rounds = []
    for i in (1, 2, 3):
        prev = f"e{i-1}"
        extra = f" UNION SELECT n FROM u{i-1}" if i > 1 else ""
        rounds.append(
            f"""p{i} AS (SELECT src,dst,weight,
    row_number() OVER (PARTITION BY src ORDER BY weight DESC, dst) AS rs FROM {prev}),
a{i} AS (SELECT src,dst,weight,
    row_number() OVER (PARTITION BY dst ORDER BY weight DESC, src) AS rd FROM p{i} WHERE rs=1),
m{i} AS (SELECT src,dst,weight,{i} AS rnd FROM a{i} WHERE rd=1),
u{i} AS (SELECT src AS n FROM m{i} UNION SELECT dst FROM m{i}{extra}),
e{i} AS (SELECT e.* FROM {prev} e WHERE e.src NOT IN (SELECT n FROM u{i})
         AND e.dst NOT IN (SELECT n FROM u{i}))"""
        )
    chain = ",\n".join(rounds)
    final = """
SELECT src, dst, weight, CAST(rnd AS INT) AS rnd
FROM (SELECT * FROM m1 UNION ALL SELECT * FROM m2 UNION ALL SELECT * FROM m3)
ORDER BY src, dst"""
    return (
        f"WITH {GRAPH_CTES},\n"
        "e0 AS (SELECT src,dst,weight FROM graph_edges),\n" + chain + final
    )


def _vertex_cover_oracle() -> str:
    """The g40 matching CTE chain with a cover-summary final select."""
    base = _matching_oracle()
    final_at = base.rindex("\nSELECT src, dst, weight,")
    return base[:final_at] + """
SELECT (SELECT count(*) FROM (SELECT * FROM m1 UNION ALL
          SELECT * FROM m2 UNION ALL SELECT * FROM m3) mm) AS n_matched,
  (SELECT count(*) FROM u3) AS n_cover,
  (SELECT count(*) FROM graph_edges) AS n_edges,
  (SELECT count(*) FROM e3) AS n_uncovered,
  round(1 - CAST((SELECT count(*) FROM e3) AS DOUBLE)
    / (SELECT count(*) FROM graph_edges), 4) AS coverage"""


@_g(
    "g40_maximal_matching",
    _mat(_matching_oracle()),
    note="greedy maximal weighted matching by synchronous propose-"
    "accept rounds (the Pregel matching pattern; deterministic via "
    "weight DESC + node-id tie-breaks) on the customer-supplier sales "
    "graph — the assignment read.  The oracle unrolls the same 3 "
    "rounds as chained CTEs.  Maximal, not maximum: the standard "
    "distributed relaxation (no augmenting paths)",
)
def g40(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.algorithms import maximal_weight_matching

    ge = Catalog(spark, sf_dir).graph_edges().select("src", "dst", "weight")
    m = maximal_weight_matching(ge, rounds=3)
    return m.select("src", "dst", "weight", F.col("rnd").cast("int").alias("rnd")).orderBy(
        "src", "dst"
    )


def _walks_oracle(steps: int = 4) -> str:
    """Unrolled hash-driven walk: per step one equi-join against the
    ranked adjacency with the LCG pick as a join predicate."""
    chain = []
    prev = "w0"
    for i in range(1, steps + 1):
        chain.append(
            f"""w{i} AS (SELECT w.start, w.snid, a.dst AS cur,
       w.path || '>' || a.dst AS path
       FROM {prev} w JOIN num a ON a.src = w.cur
       AND a.rk = (1103515245 * a.nid + 12345 * {i} + 5 * w.snid) % a.deg)"""
        )
        prev = f"w{i}"
    joined = ",\n".join(chain)
    return (
        f"""WITH {GRAPH_CTES},
adj AS (SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS rk,
        count(*) OVER (PARTITION BY src) AS deg FROM graph_edges_sym),
num AS (SELECT src, dst, rk, deg,
        2 * CAST(substr(src, 2) AS BIGINT)
          + CASE WHEN substr(src, 1, 1) = 's' THEN 1 ELSE 0 END AS nid
        FROM adj),
w0 AS (SELECT node AS start,
        2 * CAST(substr(node, 2) AS BIGINT)
          + CASE WHEN substr(node, 1, 1) = 's' THEN 1 ELSE 0 END AS snid,
        node AS cur, node AS path FROM graph_nodes),
{joined}
SELECT start, path FROM w{steps} ORDER BY start"""
    )


@_g(
    "g41_deterministic_walks",
    _walks_oracle(),
    note="graph walk sampling for embedding training (the DeepWalk / "
    "node2vec corpus generator), made reproducible: the next-neighbor "
    "pick is an LCG hash of (current node, step, start node) modulo "
    "degree over a rank-numbered adjacency — so walks are exactly "
    "re-derivable by any engine, task retries can't fork a walk, and "
    "the oracle is 4 unrolled joins.  Per step ONE equi-join of the "
    "|V|-row walker frontier against the stationary ranked adjacency "
    "(the Pregel cost shape); at 100 TB the adjacency is bucketed on "
    "src so every step's join is co-located, and k walks per node "
    "just widens the frontier, not the superstep count",
)
def g41(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    sym = c.graph_edges_sym()
    wr = Window.partitionBy("src").orderBy("dst")
    nid = lambda col: 2 * F.substring(col, 2, 10).cast("long") + F.when(
        F.substring(col, 1, 1) == "s", 1
    ).otherwise(0)
    adj = sym.select(
        "src",
        "dst",
        (F.row_number().over(wr) - 1).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("src")).alias("deg"),
    ).withColumn("nid", nid(F.col("src")))
    w = c.graph_nodes().select(
        F.col("node").alias("start"),
        nid(F.col("node")).alias("snid"),
        F.col("node").alias("cur"),
        F.col("node").alias("path"),
    )
    for i in range(1, 5):
        pick = (1103515245 * F.col("nid") + 12345 * i + 5 * F.col("snid")) % F.col("deg")
        w = (
            w.join(adj, (F.col("src") == F.col("cur")) & (F.col("rk") == pick))
            .select(
                "start",
                "snid",
                F.col("dst").alias("cur"),
                F.concat_ws(">", "path", "dst").alias("path"),
            )
        )
    return w.select("start", "path").orderBy("start")


@_g(
    "g42_temporal_wedges",
    f"""WITH {GRAPH_CTES}
       SELECT a.dst AS supplier, count(*) AS n_wedges
       FROM graph_edges a JOIN graph_edges b
         ON a.dst = b.dst AND b.first_ts >= a.first_ts AND b.src <> a.src
       GROUP BY 1 ORDER BY 1""",
    note="time-respecting wedge motifs c -> s -> c' (the temporal "
    "2-path count per middle node): the second leg must not precede "
    "the first — the temporal-motif read that separates plausible "
    "influence paths from coincidental co-edges.  An inverted-index "
    "self-join on the shared supplier with the time order as a "
    "residual predicate; hub suppliers dominate (fan-out choose 2) — "
    "the g25/q74 skew audits decide capping",
)
def g42(spark: SparkSession, sf_dir: str) -> DataFrame:
    ge = Catalog(spark, sf_dir).graph_edges().select("src", "dst", "first_ts")
    a = ge.alias("a")
    b = ge.alias("b")
    return (
        a.join(
            b,
            (F.col("a.dst") == F.col("b.dst"))
            & (F.col("b.first_ts") >= F.col("a.first_ts"))
            & (F.col("b.src") != F.col("a.src")),
        )
        .groupBy(F.col("a.dst").alias("supplier"))
        .agg(F.count(F.lit(1)).alias("n_wedges"))
        .orderBy("supplier")
    )


@_g(
    "g43_neighborhood_agg",
    f"""WITH {GRAPH_CTES},
       feat AS (SELECT 'c'||c_custkey AS node,
                CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS f FROM customer
                UNION ALL SELECT 's'||s_suppkey,
                CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) FROM supplier),
       h1 AS (SELECT e.src AS node, sum(f.f) AS h1
              FROM graph_edges_sym e JOIN feat f ON f.node = e.dst GROUP BY 1),
       h2 AS (SELECT e.src AS node, sum(h.h1) AS h2
              FROM graph_edges_sym e JOIN h1 h ON h.node = e.dst GROUP BY 1)
       SELECT f.node, f.f AS f_cents, CAST(h1.h1 AS BIGINT) AS h1_cents,
         CAST(h2.h2 AS BIGINT) AS h2_cents
       FROM feat f JOIN h1 ON h1.node = f.node JOIN h2 ON h2.node = f.node
       ORDER BY 1""",
    note="two-round SUM-pooling neighborhood aggregation of a node "
    "feature (account balance) — the GraphSAGE/GNN message-passing "
    "primitive as a declared query: layer h1 = sum of neighbor "
    "features, layer h2 = sum of neighbor h1.  The feature is "
    "converted once to EXACT integer cents (floor(x*100+0.5), works "
    "for negatives) so every layer is integer arithmetic — the "
    "mean-pooling variant stacks float roundings whose half-boundary "
    "cases diverge across engines (observed: avg-of-rounded hit an "
    "exact .005).  Per layer one join + one combinable groupBy on "
    "the stationary edge list — the Pregel superstep cost",
)
def g43(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    cents = lambda col: F.floor(col * 100 + 0.5).cast("long")
    feat = (
        c.table("customer")
        .select(
            F.concat(F.lit("c"), F.col("c_custkey")).alias("node"),
            cents(F.col("c_acctbal")).alias("f"),
        )
        .unionAll(
            c.table("supplier").select(
                F.concat(F.lit("s"), F.col("s_suppkey")).alias("node"),
                cents(F.col("s_acctbal")).alias("f"),
            )
        )
    )
    sym = c.graph_edges_sym()

    def layer(prev: DataFrame, col: str, out: str) -> DataFrame:
        p = prev.select(F.col("node").alias("pn"), F.col(col).alias("pv"))
        return (
            sym.join(F.broadcast(p), F.col("dst") == F.col("pn"))
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("pv").alias(out))
        )

    h1 = layer(feat, "f", "h1")
    h2 = layer(h1, "h1", "h2")
    return (
        feat.select("node", F.col("f").alias("f_cents"))
        .join(h1, "node")
        .join(h2, "node")
        .select("node", "f_cents", F.col("h1").alias("h1_cents"), F.col("h2").alias("h2_cents"))
        .orderBy("node")
    )


@_g(
    "g44_rich_club",
    f"""WITH {GRAPH_CTES},
       deg AS (SELECT src AS node, count(*) AS d FROM graph_edges_sym GROUP BY 1),
       k AS (SELECT CAST(floor(count(*) * 0.1) AS BIGINT) AS k FROM deg),
       top AS (SELECT node FROM (SELECT node, row_number() OVER
               (ORDER BY d DESC, node) AS r FROM deg) t, k WHERE r <= k.k),
       inedges AS (SELECT count(*) AS m FROM graph_edges_sym s
                   JOIN top a ON s.src = a.node JOIN top b ON s.dst = b.node),
       nk AS (SELECT count(*) AS n FROM top)
       SELECT CAST(nk.n AS BIGINT) AS n_club, CAST(inedges.m / 2 AS BIGINT) AS club_edges,
         round(inedges.m / (nk.n * (nk.n - 1.0)), 4) AS density
       FROM inedges CROSS JOIN nk""",
    note="rich-club coefficient: edge density among the top-decile-"
    "degree nodes — do hubs preferentially wire to each other "
    "(infrastructure/influence core) or not.  Degree count + ranked "
    "cut + two broadcast semi-joins of the edge list against the "
    "small club set; the doubled symmetric count halves exactly "
    "(always even), so the output is integer-stable",
)
def g44(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    sym = c.graph_edges_sym()
    deg = sym.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    kcut = deg.agg(F.floor(F.count(F.lit(1)) * 0.1).cast("long").alias("k"))
    ranked = deg.withColumn(
        "r", F.row_number().over(Window.orderBy(F.desc("d"), F.asc("node")))
    )
    top = (
        ranked.crossJoin(F.broadcast(kcut))
        .filter(F.col("r") <= F.col("k"))
        .select("node")
    )
    a = F.broadcast(top.select(F.col("node").alias("an")))
    b = F.broadcast(top.select(F.col("node").alias("bn")))
    m = (
        sym.join(a, sym.src == F.col("an"))
        .join(b, sym.dst == F.col("bn"))
        .agg(F.count(F.lit(1)).alias("m"))
    )
    n = top.agg(F.count(F.lit(1)).alias("n"))
    return m.crossJoin(F.broadcast(n)).select(
        F.col("n").cast("long").alias("n_club"),
        (F.col("m") / 2).cast("long").alias("club_edges"),
        F.round(F.col("m") / (F.col("n") * (F.col("n") - 1.0)), 4).alias("density"),
    )


def _modularity_oracle(rounds: int = 5) -> str:
    """g15's unrolled LPA labels, then Newman modularity of that
    partition: Q = sum_c [L_c/m - (D_c/2m)^2]."""
    lp = _lp_oracle(rounds)
    # strip g15's final SELECT, keep the WITH chain
    with_chain = lp[: lp.rindex("SELECT node, label FROM")].rstrip()
    prev = f"s{rounds}"
    return (
        with_chain
        + f""",
lab AS (SELECT node, label FROM {prev}),
mm AS (SELECT count(*) / 2.0 AS m FROM graph_edges_sym),
deg AS (SELECT src AS node, count(*) AS d FROM graph_edges_sym GROUP BY 1),
dc AS (SELECT l.label, sum(d.d) AS dc FROM lab l JOIN deg d USING (node) GROUP BY 1),
lc AS (SELECT a.label, count(*) / 2.0 AS lc FROM graph_edges_sym e
       JOIN lab a ON a.node = e.src JOIN lab b ON b.node = e.dst
       AND a.label = b.label GROUP BY 1)
SELECT round(sum(coalesce(lc.lc, 0) / mm.m - pow(dc.dc / (2 * mm.m), 2)), 6)
  AS modularity, CAST(count(*) AS BIGINT) AS n_communities
FROM dc LEFT JOIN lc USING (label) CROSS JOIN mm GROUP BY mm.m"""
    )


@_g(
    "g45_modularity",
    _modularity_oracle(),
    note="Newman modularity of the label-propagation partition (g15's "
    "5 rounds): Q = sum_c [within-edges/m - (degree-mass/2m)^2] — the "
    "partition-quality score that tells you whether LPA found real "
    "community structure or noise.  Reuses g15's unrolled-LPA oracle "
    "chain verbatim and appends three aggregates; Spark side scores "
    "the engine's own LPA output with one edge join + two combinable "
    "groupBys",
)
def g45(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.algorithms import label_propagation

    c = Catalog(spark, sf_dir)
    g = _sym_graph(c)
    lab = label_propagation(g, max_iter=5).select("node", "label")
    sym = c.graph_edges_sym()
    m_df = sym.agg((F.count(F.lit(1)) / 2.0).alias("m"))
    deg = sym.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    dc = (
        lab.join(deg, "node")
        .groupBy("label")
        .agg(F.sum("d").alias("dc"))
    )
    la = F.broadcast(lab.select(F.col("node").alias("an"), F.col("label").alias("al")))
    lb = F.broadcast(lab.select(F.col("node").alias("bn"), F.col("label").alias("bl")))
    lc = (
        sym.join(la, sym.src == F.col("an"))
        .join(lb, (sym.dst == F.col("bn")) & (F.col("al") == F.col("bl")))
        .groupBy(F.col("al").alias("label"))
        .agg((F.count(F.lit(1)) / 2.0).alias("lc"))
    )
    per = dc.join(lc, "label", "left").crossJoin(F.broadcast(m_df))
    return per.groupBy("m").agg(
        F.round(
            F.sum(
                F.coalesce(F.col("lc"), F.lit(0.0)) / F.col("m")
                - F.pow(F.col("dc") / (2 * F.col("m")), 2)
            ),
            6,
        ).alias("modularity"),
        F.count(F.lit(1)).alias("n_communities"),
    ).select("modularity", "n_communities")


@_g(
    "g46_boruvka_step",
    """WITH ge AS (
         SELECT 'c'||o.o_custkey AS src, 's'||l.l_suppkey AS dst,
           CAST(floor(sum(l.l_extendedprice*(1-l.l_discount)) * 100 + 0.5)
                AS BIGINT) AS wc
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         GROUP BY 1, 2),
       we AS (SELECT src, dst, wc FROM ge
              UNION ALL SELECT dst, src, wc FROM ge),
       p AS (SELECT src, dst, wc, row_number() OVER (PARTITION BY src
               ORDER BY wc, least(src, dst), greatest(src, dst)) AS rk
             FROM we),
       sel AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b,
               wc FROM p WHERE rk = 1)
       SELECT a, b, wc AS weight_cents FROM sel ORDER BY a, b""",
    note="one Borůvka round on the sales graph: every node selects its "
    "minimum-weight incident edge ((weight, endpoints) tie-break), "
    "selections dedup to canonical pairs — the declared kernel of the "
    "distributed MST.  The full O(log V) loop with component "
    "contraction is `algorithms.minimum_spanning_forest`, property-"
    "tested edge-for-edge against a Kruskal reference on random "
    "distinct-weight graphs (unique-MSF argument).  Per round one "
    "argmin groupBy — never a global edge sort, which is what makes "
    "Borůvka the scale MST and Kruskal the sequential one",
)
def g46(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    ge = (
        c.table("lineitem")
        .join(c.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .agg(
            F.floor(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100 + 0.5
            )
            .cast("long")
            .alias("wc")
        )
    )
    we = ge.unionAll(
        ge.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "wc")
    )
    lo = F.least("src", "dst")
    hi = F.greatest("src", "dst")
    w = Window.partitionBy("src").orderBy("wc", lo, hi)
    return (
        we.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(lo.alias("a"), hi.alias("b"), "wc")
        .distinct()
        .select("a", "b", F.col("wc").alias("weight_cents"))
        .orderBy("a", "b")
    )


def _pr_chain(p: str, nodes: str, edges: str, iters: int = 10) -> str:
    """One unrolled PageRank chain with CTE names prefixed `p` so two
    chains (snapshot + current) can coexist in a single oracle."""
    parts = [
        f"{p}nv AS (SELECT count(*) AS c FROM {nodes})",
        f"{p}outdeg AS (SELECT src, count(*) AS d FROM {edges} GROUP BY 1)",
        f"{p}pr0 AS (SELECT node, 1.0::DOUBLE/(SELECT c FROM {p}nv) AS r FROM {nodes})",
    ]
    prev = f"{p}pr0"
    for i in range(1, iters + 1):
        cur = f"{p}pr{i}"
        parts.append(
            f"""{cur} AS (
  SELECT n.node, 0.15::DOUBLE/(SELECT c FROM {p}nv)
    + 0.85::DOUBLE*coalesce(sum(q.r/od.d),0) AS r
  FROM {nodes} n
  LEFT JOIN {edges} e ON e.dst=n.node
  LEFT JOIN {prev} q ON q.node=e.src
  LEFT JOIN {p}outdeg od ON od.src=e.src
  GROUP BY n.node)"""
        )
        prev = cur
    return ",\n".join(parts)


def _rank_delta_oracle() -> str:
    return f"""WITH {GRAPH_CTES},
snap_e AS (SELECT src, dst FROM graph_edges WHERE first_ts <= TIMESTAMP '1997-01-01'
           UNION SELECT dst, src FROM graph_edges WHERE first_ts <= TIMESTAMP '1997-01-01'),
snap_n AS (SELECT DISTINCT src AS node FROM snap_e),
{_pr_chain("a_", "snap_n", "snap_e")},
{_pr_chain("b_", "graph_nodes", "graph_edges_sym")}
SELECT a.node, round(a.r, 8) AS r_then, round(b.r, 8) AS r_now,
  round(round(b.r, 8) - round(a.r, 8), 8) AS delta
FROM a_pr10 a JOIN b_pr10 b ON a.node = b.node
ORDER BY abs(round(round(b.r, 8) - round(a.r, 8), 8)) DESC, a.node LIMIT 20"""


@_g(
    "g47_pagerank_delta",
    _mat(_rank_delta_oracle()),
    note="temporal rank migration: PageRank on the graph as it stood "
    "at t (edges born by first_ts) vs PageRank now, top movers by "
    "|delta| — the influence-shift read a temporal graph store "
    "exists to answer.  Two independent 10-round Pregel runs over "
    "snapshot-filtered vs full edges (the snapshot filter prunes at "
    "the scan on a time-partitioned edge layout); delta computed "
    "from per-side ROUNDED ranks so the sort key is cross-engine "
    "stable.  Oracle = two prefixed unrolled chains in one WITH",
)
def g47(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    t = F.lit("1997-01-01").cast("timestamp")
    ge = c.graph_edges()
    snap = ge.filter(F.col("first_ts") <= t).select("src", "dst")
    snap_sym = snap.unionByName(
        snap.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    snap_nodes = snap_sym.select(F.col("src").alias("id")).distinct()
    g_then = PropertyGraph(snap_nodes, snap_sym)
    g_now = _sym_graph(c)
    r_then = pagerank(g_then, iterations=10, damping=0.85).select(
        "node", F.round("rank", 8).alias("r_then")
    )
    r_now = pagerank(g_now, iterations=10, damping=0.85).select(
        F.col("node").alias("n2"), F.round("rank", 8).alias("r_now")
    )
    j = r_then.join(r_now, r_then.node == F.col("n2")).select(
        "node", "r_then", "r_now",
        F.round(F.col("r_now") - F.col("r_then"), 8).alias("delta"),
    )
    return j.orderBy(F.abs(F.col("delta")).desc(), F.asc("node")).limit(20)


@_g(
    "g48_katz",
    f"""WITH {GRAPH_CTES},
       p1 AS (SELECT dst AS node, count(*) AS c FROM graph_edges_sym GROUP BY 1),
       p2 AS (SELECT e.dst AS node, CAST(sum(p.c) AS BIGINT) AS c
              FROM graph_edges_sym e JOIN p1 p ON p.node = e.src GROUP BY 1),
       p3 AS (SELECT e.dst AS node, CAST(sum(p.c) AS BIGINT) AS c
              FROM graph_edges_sym e JOIN p2 p ON p.node = e.src GROUP BY 1)
       SELECT p1.node, p1.c AS w1, coalesce(p2.c, 0) AS w2,
         coalesce(p3.c, 0) AS w3,
         round(CAST(100 * p1.c + 10 * coalesce(p2.c, 0)
           + coalesce(p3.c, 0) AS DOUBLE) / 1000, 4) AS katz
       FROM p1 LEFT JOIN p2 ON p2.node = p1.node
         LEFT JOIN p3 ON p3.node = p1.node
       ORDER BY katz DESC, p1.node LIMIT 30""",
    note="truncated Katz centrality (alpha=0.1, walks up to length 3): "
    "three message-passing rounds counting weighted walk arrivals — "
    "each round is ONE shuffle join of the stationary symmetric edge "
    "list against the previous round's per-node walk counts, the same "
    "superstep shape as PageRank but with exact BIGINT walk counts, "
    "so cross-engine determinism is free; the combination "
    "(100*w1+10*w2+w3)/1000 stays integer until one double division "
    "per node at the edge (decimal-literal-free: DuckDB types 0.1 as "
    "DECIMAL and would change the output scale)",
)
def g48(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.algorithms import katz_walk_counts

    e = Catalog(spark, sf_dir).graph_edges_sym()
    out = katz_walk_counts(e, rounds=3)
    return (
        out.select(
            "node", "w1", "w2", "w3",
            F.round(
                (100 * F.col("w1") + 10 * F.col("w2") + F.col("w3")).cast("double")
                / 1000,
                4,
            ).alias("katz"),
        )
        .orderBy(F.desc("katz"), "node")
        .limit(30)
    )


@_g(
    "g49_double_sweep",
    f"""WITH RECURSIVE {GRAPH_CTES},
       b1(node, d) AS (SELECT 'c1', 0 UNION
         SELECT e.dst, b1.d + 1 FROM b1
         JOIN graph_edges_sym e ON b1.node = e.src WHERE b1.d < 12),
       d1 AS (SELECT node, CAST(min(d) AS BIGINT) AS d FROM b1 GROUP BY 1),
       f1 AS (SELECT node, d FROM d1 ORDER BY d DESC, node LIMIT 1),
       b2(node, d) AS (SELECT node, 0 FROM f1 UNION
         SELECT e.dst, b2.d + 1 FROM b2
         JOIN graph_edges_sym e ON b2.node = e.src WHERE b2.d < 12),
       d2 AS (SELECT node, CAST(min(d) AS BIGINT) AS d FROM b2 GROUP BY 1),
       f2 AS (SELECT node, d FROM d2 ORDER BY d DESC, node LIMIT 1)
       SELECT f1.node AS sweep1_node, f1.d AS sweep1_ecc,
         f2.node AS sweep2_node, f2.d AS diameter_lb
       FROM f1 CROSS JOIN f2""",
    note="double-sweep diameter estimation: BFS from an arbitrary seed, "
    "re-BFS from the farthest node found — the eccentricity of that "
    "second sweep is the standard tight diameter LOWER bound at two "
    "BFS costs instead of all-pairs.  Reuses the g03 frontier BFS "
    "(auto-routed local/distributed); ties at max distance break to "
    "the smallest node id so both engines pick the same pivot.  The "
    "only driver-side transfer is ONE (node, ecc) row between sweeps",
)
def g49(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _sym_graph(Catalog(spark, sf_dir))
    d1 = bfs_distances(g, "c1", max_hops=12)
    far1 = d1.orderBy(F.desc("d"), "node").limit(1).collect()[0]
    d2 = bfs_distances(g, far1["node"], max_hops=12)
    far2 = d2.orderBy(F.desc("d"), "node").limit(1)
    return far2.select(
        F.lit(far1["node"]).alias("sweep1_node"),
        F.lit(int(far1["d"])).cast("long").alias("sweep1_ecc"),
        F.col("node").alias("sweep2_node"),
        F.col("d").alias("diameter_lb"),
    )


@_g(
    "g50_vertex_cover",
    _mat(_vertex_cover_oracle()),
    note="2-approximation vertex cover from g40's propose-accept "
    "matching: both endpoints of every matched edge enter the cover — "
    "the classical distributed approximation, plus an honest residual "
    "audit (after 3 synchronous rounds some edges may remain "
    "uncovered; coverage reports exactly how many).  Costs nothing "
    "beyond the matching supersteps: the cover and the residual are "
    "one distinct and two anti-joins on the already-computed match "
    "set, and each anti-join side is the (tiny) cover node list, "
    "broadcast",
)
def g50(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.algorithms import maximal_weight_matching

    ge = Catalog(spark, sf_dir).graph_edges().select("src", "dst", "weight")
    m = maximal_weight_matching(ge, rounds=3).localCheckpoint(eager=True)
    cover = (
        m.select(F.col("src").alias("n"))
        .union(m.select(F.col("dst").alias("n")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    uncov = ge.join(
        F.broadcast(cover.withColumnRenamed("n", "cs")),
        F.col("src") == F.col("cs"),
        "left_anti",
    ).join(
        F.broadcast(cover.withColumnRenamed("n", "cd")),
        F.col("dst") == F.col("cd"),
        "left_anti",
    )
    nm = m.agg(F.count(F.lit(1)).alias("n_matched"))
    nc = cover.agg(F.count(F.lit(1)).alias("n_cover"))
    ne = ge.agg(F.count(F.lit(1)).alias("n_edges"))
    nu = uncov.agg(F.count(F.lit(1)).alias("n_uncovered"))
    return (
        nm.crossJoin(nc)
        .crossJoin(ne)
        .crossJoin(nu)
        .select(
            "n_matched",
            "n_cover",
            "n_edges",
            "n_uncovered",
            F.round(
                1 - F.col("n_uncovered").cast("double") / F.col("n_edges"), 4
            ).alias("coverage"),
        )
    )


@_g(
    "g51_sparsify_audit",
    f"""WITH {GRAPH_CTES},
       k AS (SELECT src, dst,
         CASE WHEN strpos('0123456789abcdef',
           substring(md5(src || '|' || dst), 1, 1)) - 1 < 5
         THEN 1 ELSE 0 END AS keep
       FROM graph_edges_sym),
       deg AS (SELECT src AS node, count(*) AS d,
         CAST(sum(keep) AS BIGINT) AS kd FROM k GROUP BY 1),
       t AS (SELECT CAST(count(*) AS BIGINT) AS n_edges,
         CAST(sum(keep) AS BIGINT) AS n_kept FROM k),
       e AS (SELECT CAST(sum(abs(16 * kd - 5 * d)) AS BIGINT) AS err,
         CAST(sum(d) AS BIGINT) AS sd FROM deg)
       SELECT n_edges, n_kept,
         round(CAST(n_kept AS DOUBLE) / n_edges, 4) AS keep_rate,
         round(CAST(err AS DOUBLE) / (5 * sd), 4) AS degree_err
       FROM t CROSS JOIN e""",
    note="deterministic hash sparsification audit: keep each edge iff "
    "its first md5 hex digit < 5 (p = 5/16, coin fixed by content, "
    "reproducible on any cluster and any partitioning — no rand()), "
    "then measure how well inverse-probability-scaled kept-degrees "
    "reconstruct true degrees (aggregate L1 error on exact integers, "
    "one double division at the edge).  This is the estimator a "
    "100TB graph job runs on the 30% sample BEFORE paying for the "
    "full pass; the audit quantifies what the sample costs in "
    "degree fidelity",
)
def g51(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).graph_edges_sym()
    keep = F.when(
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.md5(F.concat_ws("|", F.col("src"), F.col("dst"))), 1, 1),
        )
        - 1
        < 5,
        1,
    ).otherwise(0)
    k = e.select("src", "dst", keep.alias("keep"))
    deg = k.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("d"), F.sum("keep").alias("kd")
    )
    t = k.agg(
        F.count(F.lit(1)).alias("n_edges"), F.sum("keep").alias("n_kept")
    )
    err = deg.agg(
        F.sum(F.abs(16 * F.col("kd") - 5 * F.col("d"))).alias("err"),
        F.sum("d").alias("sd"),
    )
    return t.crossJoin(err).select(
        "n_edges",
        "n_kept",
        F.round(F.col("n_kept").cast("double") / F.col("n_edges"), 4).alias(
            "keep_rate"
        ),
        F.round(F.col("err").cast("double") / (5 * F.col("sd")), 4).alias(
            "degree_err"
        ),
    )


@_g(
    "g52_wl_refinement",
    f"""WITH {GRAPH_CTES},
       deg AS (SELECT src AS node, CAST(count(*) AS VARCHAR) AS col
               FROM graph_edges_sym GROUP BY 1),
       n1 AS (SELECT e.dst AS node, string_agg(d.col, ',' ORDER BY d.col)
                AS ns
              FROM graph_edges_sym e JOIN deg d ON d.node = e.src GROUP BY 1),
       c1 AS (SELECT n1.node, md5(d.col || '|' || n1.ns) AS col
              FROM n1 JOIN deg d ON d.node = n1.node),
       n2 AS (SELECT e.dst AS node, string_agg(d.col, ',' ORDER BY d.col)
                AS ns
              FROM graph_edges_sym e JOIN c1 d ON d.node = e.src GROUP BY 1),
       c2 AS (SELECT n2.node, md5(d.col || '|' || n2.ns) AS col
              FROM n2 JOIN c1 d ON d.node = n2.node)
       SELECT 0 AS wl_round, count(DISTINCT col) AS n_colors FROM deg
       UNION ALL SELECT 1, count(DISTINCT col) FROM c1
       UNION ALL SELECT 2, count(DISTINCT col) FROM c2
       ORDER BY 1""",
    note="Weisfeiler-Leman color refinement (2 rounds from degree "
    "colors): each node's new color is the md5 of its own color plus "
    "the SORTED multiset of neighbor colors — the isomorphism-"
    "invariant graph fingerprint behind graph-kernel features and "
    "structural-role detection; the distinct-color growth curve "
    "measures structural diversity.  Each round is one message "
    "shuffle (edges join colors) plus a per-node sorted-list "
    "aggregate; colors are content hashes so the refinement is "
    "partitioning-independent and engine-stable",
)
def g52(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).graph_edges_sym()
    deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("string").alias("col")
    )

    def refine(colors: DataFrame) -> DataFrame:
        ns = (
            e.join(colors.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(
                F.array_join(F.array_sort(F.collect_list("col")), ",").alias("ns")
            )
        )
        own = colors.select("node", F.col("col").alias("own"))
        return ns.join(own, "node").select(
            "node", F.md5(F.concat_ws("|", F.col("own"), F.col("ns"))).alias("col")
        )

    c1 = refine(deg)
    c2 = refine(c1)

    def count_colors(df: DataFrame, rnd: int) -> DataFrame:
        return df.agg(F.countDistinct("col").alias("n_colors")).select(
            F.lit(rnd).alias("wl_round"), "n_colors"
        )

    return (
        count_colors(deg, 0)
        .unionAll(count_colors(c1, 1))
        .unionAll(count_colors(c2, 2))
        .orderBy("wl_round")
    )


@_g(
    "g53_percolation",
    f"""WITH RECURSIVE {GRAPH_CTES},
       ge AS (SELECT src, dst FROM graph_edges WHERE n_items >= 3),
       kept AS (SELECT src, dst FROM ge
         WHERE strpos('0123456789abcdef',
           substring(md5(src || '|' || dst), 1, 1)) - 1 < 8),
       full_s AS (SELECT src, dst FROM ge UNION SELECT dst, src FROM ge),
       keep_s AS (SELECT src, dst FROM kept UNION SELECT dst, src FROM kept),
       fn AS (SELECT DISTINCT src AS node FROM full_s),
       kn AS (SELECT DISTINCT src AS node FROM keep_s),
       fr(node, r) AS (SELECT node, node FROM fn
         UNION SELECT e.dst, fr.r FROM fr JOIN full_s e ON fr.node = e.src),
       fc AS (SELECT node, min(r) AS comp FROM fr GROUP BY 1),
       kr(node, r) AS (SELECT node, node FROM kn
         UNION SELECT e.dst, kr.r FROM kr JOIN keep_s e ON kr.node = e.src),
       kc AS (SELECT node, min(r) AS comp FROM kr GROUP BY 1),
       s AS (
         SELECT 'full' AS graph, count(*) AS n_nodes,
           count(DISTINCT comp) AS n_components,
           (SELECT CAST(max(cnt) AS BIGINT) FROM
             (SELECT count(*) AS cnt FROM fc GROUP BY comp) x) AS giant_nodes
         FROM fc
         UNION ALL
         SELECT 'sparse', count(*), count(DISTINCT comp),
           (SELECT CAST(max(cnt) AS BIGINT) FROM
             (SELECT count(*) AS cnt FROM kc GROUP BY comp) y)
         FROM kc)
       SELECT graph, n_nodes, n_components, giant_nodes,
         round(CAST(giant_nodes AS DOUBLE) / n_nodes, 4) AS giant_frac
       FROM s ORDER BY 1""",
    note="bond-percolation robustness audit: connectivity of the "
    "thresholded sales graph before and after deterministic ~50% "
    "edge removal (first md5 hex digit < 8 — content-keyed, so the "
    "'random' removal reproduces on any cluster) — does a giant "
    "component survive half the edges?  The answer calibrates how "
    "aggressively g51-style sparsification can feed the iterative "
    "algorithms.  Both CC runs reuse the g04 kernel (auto local/"
    "distributed); summaries are exact integers with one double "
    "fraction each",
)
def g53(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    ge = c.graph_edges().filter(F.col("n_items") >= 3).select("src", "dst")
    kept = ge.filter(
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.md5(F.concat_ws("|", F.col("src"), F.col("dst"))), 1, 1),
        )
        - 1
        < 8
    )

    def cc_summary(edges: DataFrame, label: str) -> DataFrame:
        sym = edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
        nodes = sym.select(F.col("src").alias("id")).distinct()
        comp = connected_components(PropertyGraph(nodes, sym))
        sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cnt"))
        return (
            comp.agg(F.count(F.lit(1)).alias("n_nodes"))
            .crossJoin(sizes.agg(F.count(F.lit(1)).alias("n_components")))
            .crossJoin(sizes.agg(F.max("cnt").alias("giant_nodes")))
            .select(
                F.lit(label).alias("graph"),
                "n_nodes",
                "n_components",
                "giant_nodes",
                F.round(
                    F.col("giant_nodes").cast("double") / F.col("n_nodes"), 4
                ).alias("giant_frac"),
            )
        )

    return cc_summary(ge, "full").unionAll(cc_summary(kept, "sparse")).orderBy("graph")


@_g(
    "g54_dyad_census",
    """WITH ne AS (
         SELECT 'n'||c.c_nationkey AS src, 'n'||s.s_nationkey AS dst
         FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey
         JOIN customer c ON o.o_custkey=c.c_custkey
         JOIN supplier s ON l.l_suppkey=s.s_suppkey
         GROUP BY 1,2 HAVING count(*) >= 25),
       e AS (SELECT src, dst FROM ne WHERE src <> dst),
       nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       m AS (SELECT a.src, a.dst FROM e a JOIN e b
             ON b.src = a.dst AND b.dst = a.src),
       s AS (SELECT (SELECT count(*) FROM e) AS n_edges,
             (SELECT count(*) FROM m) AS n_mutual_edges,
             (SELECT count(*) FROM nodes) AS n_nodes)
       SELECT n_nodes, n_edges, n_mutual_edges,
         CAST(n_mutual_edges // 2 AS BIGINT) AS mutual_dyads,
         CAST(n_edges - n_mutual_edges AS BIGINT) AS asym_dyads,
         CAST(n_nodes * (n_nodes - 1) // 2
           - n_mutual_edges // 2 - (n_edges - n_mutual_edges) AS BIGINT)
           AS null_dyads,
         round(CAST(n_mutual_edges AS DOUBLE) / n_edges, 4) AS reciprocity
       FROM s""",
    note="dyad census + reciprocity of the directed nation trade graph "
    "(g17's view, self-loops excluded): mutual / asymmetric / null "
    "dyad counts and the fraction of edges that are reciprocated — "
    "the first-order structural signature separating a hierarchy "
    "from a marketplace.  One self-equi-join on the (tiny, "
    "pre-aggregated) edge list for mutuality; everything else is "
    "exact integer identities (null dyads by complement, never "
    "materializing non-edges)",
)
def g54(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    ne = (
        c.table("lineitem")
        .join(c.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c.table("customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.table("supplier")), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.concat(F.lit("n"), F.col("c_nationkey")).alias("src"),
            F.concat(F.lit("n"), F.col("s_nationkey")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 25)
        .select("src", "dst")
    )
    e = ne.filter(F.col("src") != F.col("dst")).localCheckpoint(eager=True)
    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    ).distinct()
    m = e.alias("a").join(
        e.select(F.col("src").alias("bs"), F.col("dst").alias("bd")),
        (F.col("bs") == F.col("dst")) & (F.col("bd") == F.col("src")),
    )
    s = (
        e.agg(F.count(F.lit(1)).alias("n_edges"))
        .crossJoin(m.agg(F.count(F.lit(1)).alias("n_mutual_edges")))
        .crossJoin(nodes.agg(F.count(F.lit(1)).alias("n_nodes")))
    )
    return s.select(
        "n_nodes",
        "n_edges",
        "n_mutual_edges",
        F.floor(F.col("n_mutual_edges") / 2).cast("long").alias("mutual_dyads"),
        (F.col("n_edges") - F.col("n_mutual_edges")).alias("asym_dyads"),
        (
            F.floor(F.col("n_nodes") * (F.col("n_nodes") - 1) / 2)
            - F.floor(F.col("n_mutual_edges") / 2)
            - (F.col("n_edges") - F.col("n_mutual_edges"))
        ).cast("long").alias("null_dyads"),
        F.round(
            F.col("n_mutual_edges").cast("double") / F.col("n_edges"), 4
        ).alias("reciprocity"),
    )


@_g(
    "g55_region_homophily",
    """WITH ne AS (
         SELECT 'n'||c.c_nationkey AS src, 'n'||s.s_nationkey AS dst,
           any_value(cn.n_regionkey) AS rs, any_value(sn.n_regionkey) AS rd
         FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey
         JOIN customer c ON o.o_custkey=c.c_custkey
         JOIN supplier s ON l.l_suppkey=s.s_suppkey
         JOIN nation cn ON cn.n_nationkey = c.c_nationkey
         JOIN nation sn ON sn.n_nationkey = s.s_nationkey
         GROUP BY 1, 2 HAVING count(*) >= 25),
       e AS (SELECT * FROM ne WHERE src <> dst),
       tot AS (SELECT count(*) AS m,
               CAST(sum(CASE WHEN rs = rd THEN 1 ELSE 0 END) AS BIGINT)
                 AS same FROM e),
       degs AS (SELECT r, CAST(sum(c) AS BIGINT) AS outd,
                CAST(sum(c2) AS BIGINT) AS ind FROM (
           SELECT rs AS r, count(*) AS c, 0 AS c2 FROM e GROUP BY 1
           UNION ALL
           SELECT rd, 0, count(*) FROM e GROUP BY 1) u GROUP BY 1),
       exp AS (SELECT CAST(sum(outd * ind) AS BIGINT) AS ei FROM degs)
       SELECT m AS n_edges, same AS same_region,
         round(CAST(same AS DOUBLE) / m, 4) AS observed,
         round(CAST(ei AS DOUBLE) / (CAST(m AS DOUBLE) * m), 4) AS expected,
         round(CAST(same AS DOUBLE) / m
           - CAST(ei AS DOUBLE) / (CAST(m AS DOUBLE) * m), 4) AS homophily
       FROM tot CROSS JOIN exp""",
    note="attribute homophily of the directed nation trade graph: "
    "observed same-REGION edge fraction versus the degree-preserving "
    "null expectation sum(out_r * in_r)/m^2 — the assortative-mixing "
    "read for a categorical attribute (g31 does it for degree, g45 "
    "for discovered communities; this is the given-attribute form).  "
    "Region marginals are exact integer out/in volumes per region "
    "(5 rows); three doubles total at the edge.  The heavy join tree "
    "is the shared g17/g54 trade-view shape with nation/region dims "
    "broadcast",
)
def g55(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    nat = c.table("nation").select("n_nationkey", "n_regionkey")
    ne = (
        c.table("lineitem")
        .join(c.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c.table("customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.table("supplier")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(nat.select(F.col("n_nationkey").alias("ck"), F.col("n_regionkey").alias("rs"))),
            F.col("c_nationkey") == F.col("ck"),
        )
        .join(
            F.broadcast(nat.select(F.col("n_nationkey").alias("sk"), F.col("n_regionkey").alias("rd"))),
            F.col("s_nationkey") == F.col("sk"),
        )
        .groupBy(
            F.concat(F.lit("n"), F.col("c_nationkey")).alias("src"),
            F.concat(F.lit("n"), F.col("s_nationkey")).alias("dst"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.any_value(F.col("rs")).alias("rs"),
            F.any_value(F.col("rd")).alias("rd"),
        )
        .filter(F.col("n") >= 25)
    )
    e = ne.filter(F.col("src") != F.col("dst")).localCheckpoint(eager=True)
    tot = e.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(F.when(F.col("rs") == F.col("rd"), 1).otherwise(0)).alias("same"),
    )
    outd = e.groupBy(F.col("rs").alias("r")).agg(F.count(F.lit(1)).alias("outd"))
    ind = e.groupBy(F.col("rd").alias("r")).agg(F.count(F.lit(1)).alias("ind"))
    degs = (
        outd.join(ind, "r", "full")
        .select(
            F.coalesce("outd", F.lit(0)).alias("outd"),
            F.coalesce("ind", F.lit(0)).alias("ind"),
        )
    )
    exp = degs.agg(F.sum(F.col("outd") * F.col("ind")).alias("ei"))
    obs = F.col("same").cast("double") / F.col("m")
    expv = F.col("ei").cast("double") / (F.col("m").cast("double") * F.col("m"))
    return tot.crossJoin(F.broadcast(exp)).select(
        F.col("m").alias("n_edges"),
        F.col("same").alias("same_region"),
        F.round(obs, 4).alias("observed"),
        F.round(expv, 4).alias("expected"),
        F.round(obs - expv, 4).alias("homophily"),
    )


@_g(
    "g56_bfs_profile",
    f"""WITH RECURSIVE {GRAPH_CTES},
       b(node, d) AS (SELECT 'c1', 0 UNION
         SELECT e.dst, b.d + 1 FROM b
         JOIN graph_edges_sym e ON b.node = e.src WHERE b.d < 12),
       dist AS (SELECT node, CAST(min(d) AS BIGINT) AS d FROM b GROUP BY 1)
       SELECT d AS hop, count(*) AS frontier_width FROM dist
       GROUP BY 1 ORDER BY 1""",
    note="BFS frontier-width profile from the g03 seed: nodes first "
    "reached at each hop — the per-superstep cost curve of every "
    "frontier algorithm in this repo (a width spike at hop k means "
    "superstep k dominates the job; small-world graphs spike at 2-3 "
    "then collapse, which is exactly why the broadcast-frontier "
    "plan in bfs_distances works).  Costs one BFS; the profile is a "
    "groupBy over its output",
)
def g56(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _sym_graph(Catalog(spark, sf_dir))
    return (
        bfs_distances(g, "c1", max_hops=12)
        .groupBy(F.col("d").alias("hop"))
        .agg(F.count(F.lit(1)).alias("frontier_width"))
        .orderBy("hop")
    )


@_g(
    "g57_core_periphery",
    f"""WITH {GRAPH_CTES},
       deg AS (SELECT src AS node, count(*) AS d
               FROM graph_edges_sym GROUP BY 1),
       nn AS (SELECT count(*) AS n FROM deg),
       core AS (SELECT node FROM deg CROSS JOIN nn
         QUALIFY row_number() OVER (ORDER BY d DESC, node) <= (n + 9) // 10),
       cls AS (SELECT CASE WHEN cs.node IS NOT NULL
                 THEN 1 ELSE 0 END + CASE WHEN cd.node IS NOT NULL
                 THEN 1 ELSE 0 END AS n_core
         FROM graph_edges e
         LEFT JOIN core cs ON cs.node = e.src
         LEFT JOIN core cd ON cd.node = e.dst)
       SELECT CAST(sum(CASE WHEN n_core = 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS core_core,
         CAST(sum(CASE WHEN n_core = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS core_periphery,
         CAST(sum(CASE WHEN n_core = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS periphery_periphery,
         round(CAST(sum(CASE WHEN n_core = 0 THEN 1 ELSE 0 END) AS DOUBLE)
           / count(*), 4) AS pp_share
       FROM cls""",
    note="core-periphery edge census: the top-10%-by-degree core "
    "(exact rank, ceil sizing, full tie-break) versus everyone "
    "else, and how the DIRECTED sales edges distribute across "
    "core-core / core-periphery / periphery-periphery — an ideal "
    "hub-and-spoke has pp_share ~ 0 (peripheral actors only "
    "transact through the core).  The core list is |V|/10 nodes "
    "and broadcasts onto the edge scan; counts are exact",
)
def g57(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    deg = c.graph_edges_sym().groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    nn = deg.agg(F.count(F.lit(1)).alias("n"))
    core = (
        deg.crossJoin(F.broadcast(nn))
        .withColumn(
            "rk", F.row_number().over(Window.orderBy(F.desc("d"), "node"))
        )
        .filter(F.col("rk") <= F.floor((F.col("n") + 9) / 10))
        .select("node")
        .localCheckpoint(eager=True)
    )
    e = c.graph_edges().select("src", "dst")
    cls = (
        e.join(
            F.broadcast(core.withColumnRenamed("node", "cs")),
            F.col("src") == F.col("cs"),
            "left",
        )
        .join(
            F.broadcast(core.withColumnRenamed("node", "cd")),
            F.col("dst") == F.col("cd"),
            "left",
        )
        .select(
            (
                F.when(F.col("cs").isNotNull(), 1).otherwise(0)
                + F.when(F.col("cd").isNotNull(), 1).otherwise(0)
            ).alias("n_core")
        )
    )
    cnt = lambda v: F.sum(F.when(F.col("n_core") == v, 1).otherwise(0))
    return cls.agg(
        cnt(2).alias("core_core"),
        cnt(1).alias("core_periphery"),
        cnt(0).alias("periphery_periphery"),
        F.round(cnt(0).cast("double") / F.count(F.lit(1)), 4).alias("pp_share"),
    )


@_g(
    "g58_weight_zipf",
    f"""WITH {GRAPH_CTES},
       w AS (SELECT CAST(floor(weight * 100 + 0.5) AS BIGINT) AS wc
             FROM graph_edges),
       r AS (SELECT wc, row_number() OVER (ORDER BY wc DESC) AS rk FROM w
             QUALIFY row_number() OVER (ORDER BY wc DESC) <= 100)
       SELECT count(*) AS n_top,
         round(regr_slope(ln(CAST(wc AS DOUBLE)), ln(CAST(rk AS DOUBLE))), 4)
           AS tail_slope,
         CAST(max(wc) AS BIGINT) AS max_wc, CAST(min(wc) AS BIGINT) AS min_wc
       FROM r""",
    note="heavy-tail exponent of the edge-weight distribution: OLS "
    "slope of ln(weight) on ln(rank) over the top-100 edges (l34's "
    "Zipf regression pointed at the graph) — slope near -1 says the "
    "sales graph's weight mass is hub-dominated, the quantitative "
    "trigger for salting those hub keys (q87) before a weighted "
    "join.  Weights rank by exact integer cents so the rank order "
    "is engine-stable; regr_slope runs over 100 rows",
)
def g58(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).graph_edges()
    w = e.select(F.floor(F.col("weight") * 100 + 0.5).cast("long").alias("wc"))
    r = (
        w.withColumn("rk", F.row_number().over(Window.orderBy(F.desc("wc"))))
        .filter(F.col("rk") <= 100)
    )
    return r.agg(
        F.count(F.lit(1)).alias("n_top"),
        F.round(
            F.expr("regr_slope(ln(CAST(wc AS DOUBLE)), ln(CAST(rk AS DOUBLE)))"), 4
        ).alias("tail_slope"),
        F.max("wc").alias("max_wc"),
        F.min("wc").alias("min_wc"),
    )


@_g(
    "g59_triad_motifs",
    """WITH ne AS (
         SELECT 'n'||c.c_nationkey AS src, 'n'||s.s_nationkey AS dst
         FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey
         JOIN customer c ON o.o_custkey=c.c_custkey
         JOIN supplier s ON l.l_suppkey=s.s_suppkey
         GROUP BY 1,2 HAVING count(*) >= 25),
       e AS (SELECT src, dst FROM ne WHERE src <> dst),
       cyc AS (SELECT count(*) AS c FROM e a
         JOIN e b ON b.src = a.dst
         JOIN e c2 ON c2.src = b.dst AND c2.dst = a.src
         WHERE a.src < b.src AND a.src < c2.src),
       ff AS (SELECT count(*) AS c FROM e a
         JOIN e b ON b.src = a.dst
         JOIN e c2 ON c2.src = a.src AND c2.dst = b.dst
         WHERE a.dst <> a.src AND b.dst <> a.src)
       SELECT CAST(cyc.c AS BIGINT) AS cycles,
         CAST(ff.c AS BIGINT) AS feed_forward,
         round(CAST(cyc.c AS DOUBLE) / nullif(cyc.c + ff.c, 0), 4)
           AS cycle_share
       FROM cyc CROSS JOIN ff""",
    note="directed triad motifs on the nation trade graph: 3-cycles "
    "(a->b->c->a, counted once via the min-node anchor) versus "
    "feed-forward triangles (a->b->c with shortcut a->c) — the "
    "cycle share separates circular trade from hierarchical "
    "supply chains, structure the undirected triangle count (g05) "
    "cannot see.  Two 3-way self-joins on the tiny pre-aggregated "
    "edge list; at scale this is the same bucketed wedge-join "
    "kernel as the triangle family with direction predicates",
)
def g59(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    ne = (
        c.table("lineitem")
        .join(c.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c.table("customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.table("supplier")), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.concat(F.lit("n"), F.col("c_nationkey")).alias("src"),
            F.concat(F.lit("n"), F.col("s_nationkey")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 25)
        .select("src", "dst")
    )
    e = ne.filter(F.col("src") != F.col("dst")).localCheckpoint(eager=True)
    a = e.select(F.col("src").alias("as_"), F.col("dst").alias("ad"))
    b = e.select(F.col("src").alias("bs"), F.col("dst").alias("bd"))
    c2 = e.select(F.col("src").alias("cs"), F.col("dst").alias("cd"))
    cyc = (
        a.join(b, F.col("bs") == F.col("ad"))
        .join(c2, (F.col("cs") == F.col("bd")) & (F.col("cd") == F.col("as_")))
        .filter((F.col("as_") < F.col("bs")) & (F.col("as_") < F.col("cs")))
        .agg(F.count(F.lit(1)).alias("cycles"))
    )
    ff = (
        a.join(b, F.col("bs") == F.col("ad"))
        .join(c2, (F.col("cs") == F.col("as_")) & (F.col("cd") == F.col("bd")))
        .filter((F.col("ad") != F.col("as_")) & (F.col("bd") != F.col("as_")))
        .agg(F.count(F.lit(1)).alias("feed_forward"))
    )
    return cyc.crossJoin(ff).select(
        "cycles",
        "feed_forward",
        F.round(
            F.col("cycles").cast("double")
            / F.nullif(F.col("cycles") + F.col("feed_forward"), F.lit(0)),
            4,
        ).alias("cycle_share"),
    )


@_g(
    "g60_ego_networks",
    f"""WITH {GRAPH_CTES},
       deg AS (SELECT src AS node, count(*) AS d
               FROM graph_edges_sym GROUP BY 1),
       hubs AS (SELECT node FROM deg
         QUALIFY row_number() OVER (ORDER BY d DESC, node) <= 5),
       nb AS (SELECT h.node AS hub, e.dst AS member
              FROM hubs h JOIN graph_edges_sym e ON e.src = h.node
              UNION SELECT node, node FROM hubs),
       sz AS (SELECT hub, count(*) AS ego_nodes FROM nb GROUP BY 1),
       ee AS (SELECT a.hub, count(*) AS ego_edges
              FROM nb a JOIN graph_edges_sym e ON e.src = a.member
              JOIN nb b ON b.hub = a.hub AND b.member = e.dst
              WHERE e.src < e.dst GROUP BY 1)
       SELECT sz.hub, sz.ego_nodes, coalesce(ee.ego_edges, 0) AS ego_edges,
         round(CAST(coalesce(ee.ego_edges, 0) AS DOUBLE)
           / (CAST(sz.ego_nodes AS DOUBLE) * (sz.ego_nodes - 1) / 2), 4)
           AS density
       FROM sz LEFT JOIN ee ON ee.hub = sz.hub ORDER BY 1""",
    note="ego-network profiles for the top-5 hubs: 1-hop ego size, "
    "edges inside the ego (each undirected edge once via src < dst), "
    "and ego density — the local-structure read behind influence "
    "and fraud triage, bounded to the hubs so it costs 5 "
    "neighborhood joins instead of |V|.  The hub member lists "
    "broadcast onto the symmetric edge scan; counts exact, one "
    "double per hub",
)
def g60(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    es = c.graph_edges_sym()
    deg = es.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    hubs = (
        deg.withColumn("rk", F.row_number().over(Window.orderBy(F.desc("d"), "node")))
        .filter(F.col("rk") <= 5)
        .select("node")
    )
    nb = (
        hubs.join(es, hubs.node == es.src)
        .select(F.col("node").alias("hub"), F.col("dst").alias("member"))
        .union(hubs.select(F.col("node").alias("hub"), F.col("node").alias("member")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sz = nb.groupBy("hub").agg(F.count(F.lit(1)).alias("ego_nodes"))
    a = nb.select("hub", F.col("member").alias("u"))
    b = nb.select(F.col("hub").alias("hub2"), F.col("member").alias("v"))
    ee = (
        F.broadcast(a)
        .join(es, F.col("u") == es.src)
        .join(
            F.broadcast(b),
            (F.col("hub2") == F.col("hub")) & (F.col("v") == F.col("dst")),
        )
        .filter(F.col("src") < F.col("dst"))
        .groupBy("hub")
        .agg(F.count(F.lit(1)).alias("ego_edges"))
    )
    return (
        sz.join(ee, "hub", "left")
        .select(
            "hub",
            "ego_nodes",
            F.coalesce("ego_edges", F.lit(0)).alias("ego_edges"),
            F.round(
                F.coalesce("ego_edges", F.lit(0)).cast("double")
                / (F.col("ego_nodes").cast("double") * (F.col("ego_nodes") - 1) / 2),
                4,
            ).alias("density"),
        )
        .orderBy("hub")
    )


def _degree_discount_oracle(k: int = 5) -> str:
    """Unrolled greedy degree-discount seed selection: per round, one
    discount join against the picked set and one argmax."""
    parts = [
        "pk0 AS (SELECT '' AS node WHERE 1 = 0)",
    ]
    for i in range(1, k + 1):
        parts.append(
            f"""a{i} AS (SELECT g.node, g.d - coalesce(c.cnt, 0) AS adj
  FROM deg g LEFT JOIN (SELECT e.src AS node, count(*) AS cnt
    FROM graph_edges_sym e
    WHERE e.dst IN (SELECT node FROM pk{i - 1}) GROUP BY 1) c
    ON c.node = g.node
  WHERE g.node NOT IN (SELECT node FROM pk{i - 1})),
p{i} AS (SELECT node, CAST(adj AS BIGINT) AS adj FROM a{i}
  ORDER BY adj DESC, node LIMIT 1),
pk{i} AS (SELECT node FROM pk{i - 1} UNION ALL SELECT node FROM p{i})"""
        )
    finals = " UNION ALL ".join(
        f"SELECT {i} AS seed_rank, node, adj FROM p{i}" for i in range(1, k + 1)
    )
    return (
        f"WITH {GRAPH_CTES},\n"
        "deg AS (SELECT src AS node, count(*) AS d FROM graph_edges_sym GROUP BY 1),\n"
        + ",\n".join(parts)
        + f"\nSELECT CAST(seed_rank AS INT) AS seed_rank, node, adj FROM ({finals}) u ORDER BY 1"
    )


@_g(
    "g61_degree_discount",
    _mat(_degree_discount_oracle(5)),
    note="influence-maximization seed selection by greedy degree "
    "discount: pick the highest-degree node, discount every "
    "neighbor's degree by its picked-neighbor count, repeat (5 "
    "seeds, node-id tie-break) — the classic cheap approximation "
    "to greedy influence coverage that avoids picking five hubs "
    "from the same neighborhood.  Inherently sequential in k: each "
    "round is one broadcast of the (tiny) picked set onto the edge "
    "list plus one argmax; the oracle unrolls the same 5 rounds as "
    "chained CTEs",
)
def g61(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    es = c.graph_edges_sym()
    deg = (
        es.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint(eager=True)
    )
    picked: list[str] = []
    rows = []
    for rank in range(1, 6):
        if picked:
            pk = deg.sparkSession.createDataFrame(
                [(p,) for p in picked], ["pnode"]
            )
            disc = (
                es.join(F.broadcast(pk), es.dst == F.col("pnode"))
                .groupBy(F.col("src").alias("node"))
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
            adj = (
                deg.join(disc, "node", "left")
                .filter(~F.col("node").isin(picked))
                .select(
                    "node",
                    (F.col("d") - F.coalesce(F.col("cnt"), F.lit(0))).alias("adj"),
                )
            )
        else:
            adj = deg.select("node", F.col("d").alias("adj"))
        top = adj.orderBy(F.desc("adj"), "node").limit(1).collect()[0]
        picked.append(top["node"])
        rows.append((rank, top["node"], int(top["adj"])))
    return (
        deg.sparkSession.createDataFrame(
            rows, "seed_rank int, node string, adj long"
        ).orderBy("seed_rank")
    )


@_g(
    "g62_wl_graph_similarity",
    f"""WITH {GRAPH_CTES},
       se AS (SELECT src, dst FROM graph_edges
              WHERE first_ts <= TIMESTAMP '1997-01-01'),
       ss AS (SELECT src, dst FROM se UNION SELECT dst, src FROM se),
       dega AS (SELECT src AS node, CAST(count(*) AS VARCHAR) AS col
                FROM graph_edges_sym GROUP BY 1),
       na AS (SELECT e.dst AS node, string_agg(d.col, ',' ORDER BY d.col)
                AS ns FROM graph_edges_sym e
              JOIN dega d ON d.node = e.src GROUP BY 1),
       ca AS (SELECT na.node, md5(d.col || '|' || na.ns) AS col
              FROM na JOIN dega d ON d.node = na.node),
       degb AS (SELECT src AS node, CAST(count(*) AS VARCHAR) AS col
                FROM ss GROUP BY 1),
       nb AS (SELECT e.dst AS node, string_agg(d.col, ',' ORDER BY d.col)
                AS ns FROM ss e JOIN degb d ON d.node = e.src GROUP BY 1),
       cb AS (SELECT nb.node, md5(d.col || '|' || nb.ns) AS col
              FROM nb JOIN degb d ON d.node = nb.node),
       ha AS (SELECT col, count(*) AS c FROM ca GROUP BY 1),
       hb AS (SELECT col, count(*) AS c FROM cb GROUP BY 1),
       j AS (SELECT coalesce(ha.c, 0) AS c1, coalesce(hb.c, 0) AS c2
             FROM ha FULL JOIN hb ON hb.col = ha.col)
       SELECT (SELECT count(*) FROM ha) AS colors_now,
         (SELECT count(*) FROM hb) AS colors_snapshot,
         CAST(sum(CASE WHEN c1 > 0 AND c2 > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS common_colors,
         CAST(sum(least(c1, c2)) AS BIGINT) AS hist_intersection,
         round(CAST(sum(least(c1, c2)) AS DOUBLE)
           / (SELECT count(*) FROM ca), 4) AS overlap_share
       FROM j""",
    note="Weisfeiler-Leman kernel similarity between the CURRENT sales "
    "graph and its 1997 temporal snapshot: one WL refinement round on "
    "each, then the color-histogram intersection — the structural "
    "'how much has the graph's local shape changed' read that edge "
    "diff counts (g13) miss, because WL colors capture neighborhoods, "
    "not single edges.  Colors are content hashes (partition-"
    "independent); histograms are exact; one full-join on the "
    "(small) color domains computes every metric",
)
def g62(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    full = c.graph_edges_sym()
    se = (
        c.graph_edges()
        .filter(F.col("first_ts") <= F.lit("1997-01-01").cast("timestamp"))
        .select("src", "dst")
    )
    snap = se.union(
        se.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()

    def wl1(edges: DataFrame) -> DataFrame:
        deg = edges.groupBy(F.col("src").alias("node")).agg(
            F.count(F.lit(1)).cast("string").alias("col")
        )
        ns = (
            edges.join(deg.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.array_join(F.array_sort(F.collect_list("col")), ",").alias("ns"))
        )
        return (
            ns.join(deg.select("node", F.col("col").alias("own")), "node")
            .select(F.md5(F.concat_ws("|", F.col("own"), F.col("ns"))).alias("col"))
        )

    ha = wl1(full).groupBy("col").agg(F.count(F.lit(1)).alias("c1"))
    hb = wl1(snap).groupBy("col").agg(F.count(F.lit(1)).alias("c2"))
    j = ha.join(hb, "col", "full").select(
        F.coalesce("c1", F.lit(0)).alias("c1"), F.coalesce("c2", F.lit(0)).alias("c2")
    )
    totals = (
        ha.agg(F.count(F.lit(1)).alias("colors_now"))
        .crossJoin(hb.agg(F.count(F.lit(1)).alias("colors_snapshot")))
        .crossJoin(ha.agg(F.sum("c1").alias("n_now")))
    )
    m = j.agg(
        F.sum(F.when((F.col("c1") > 0) & (F.col("c2") > 0), 1).otherwise(0)).alias(
            "common_colors"
        ),
        F.sum(F.least("c1", "c2")).alias("hist_intersection"),
    )
    return m.crossJoin(F.broadcast(totals)).select(
        "colors_now",
        "colors_snapshot",
        "common_colors",
        "hist_intersection",
        F.round(
            F.col("hist_intersection").cast("double") / F.col("n_now"), 4
        ).alias("overlap_share"),
    )


@_g(
    "g63_triadic_closure",
    f"""WITH {GRAPH_CTES},
       old_e AS (SELECT src, dst FROM graph_edges
                 WHERE first_ts <= TIMESTAMP '1997-01-01'),
       old_s AS (SELECT src, dst FROM old_e
                 UNION SELECT dst, src FROM old_e),
       new_e AS (SELECT src, dst FROM graph_edges
                 WHERE first_ts > TIMESTAMP '1997-01-01'),
       closing AS (SELECT DISTINCT n.src, n.dst
         FROM new_e n JOIN old_s a ON a.src = n.src
         JOIN old_s b ON b.src = a.dst AND b.dst = n.dst),
       s AS (SELECT (SELECT count(*) FROM new_e) AS n_new,
             (SELECT count(*) FROM closing) AS n_closing)
       SELECT n_new, n_closing,
         round(CAST(n_closing AS DOUBLE) / nullif(n_new, 0), 4)
           AS closure_rate
       FROM s""",
    note="triadic closure rate of NEW relationships: among customer-"
    "supplier edges first formed after the 1997 snapshot, the "
    "fraction whose endpoints were already connected by a 2-path in "
    "the old graph — the link-formation mechanism test (high rate "
    "means new trade follows existing neighborhoods, the empirical "
    "basis for l27/g27-style link prediction; low means exploration "
    "dominates).  The 2-path check is two equi-joins of the new "
    "edges against the old symmetric adjacency with a distinct on "
    "the (new-edge) pair — never materializing all 2-paths",
)
def g63(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    cut = F.lit("1997-01-01").cast("timestamp")
    ge = c.graph_edges()
    old_e = ge.filter(F.col("first_ts") <= cut).select("src", "dst")
    old_s = old_e.union(
        old_e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    new_e = ge.filter(F.col("first_ts") > cut).select("src", "dst").localCheckpoint(
        eager=True
    )
    a = old_s.select(F.col("src").alias("as_"), F.col("dst").alias("ad"))
    b = old_s.select(F.col("src").alias("bs"), F.col("dst").alias("bd"))
    closing = (
        new_e.join(a, F.col("as_") == F.col("src"))
        .join(b, (F.col("bs") == F.col("ad")) & (F.col("bd") == F.col("dst")))
        .select("src", "dst")
        .distinct()
    )
    s = new_e.agg(F.count(F.lit(1)).alias("n_new")).crossJoin(
        closing.agg(F.count(F.lit(1)).alias("n_closing"))
    )
    return s.select(
        "n_new",
        "n_closing",
        F.round(
            F.col("n_closing").cast("double")
            / F.nullif(F.col("n_new"), F.lit(0)),
            4,
        ).alias("closure_rate"),
    )


@_g(
    "g64_small_world",
    """WITH RECURSIVE ne AS (
         SELECT 'n'||c.c_nationkey AS src, 'n'||s.s_nationkey AS dst
         FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey
         JOIN customer c ON o.o_custkey=c.c_custkey
         JOIN supplier s ON l.l_suppkey=s.s_suppkey
         GROUP BY 1,2 HAVING count(*) >= 25),
       sym AS (SELECT DISTINCT src, dst FROM (
           SELECT src, dst FROM ne WHERE src <> dst
           UNION ALL SELECT dst, src FROM ne WHERE src <> dst) u),
       nodes AS (SELECT DISTINCT src AS node FROM sym),
       deg AS (SELECT src AS node, count(*) AS d FROM sym GROUP BY 1),
       tri AS (SELECT count(*) AS t FROM sym x
         JOIN sym y ON y.src = x.dst AND x.src < x.dst AND y.src < y.dst
         JOIN sym z ON z.src = x.src AND z.dst = y.dst),
       wed AS (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) AS w FROM deg),
       b(node, dd) AS (SELECT (SELECT min(node) FROM nodes), 0
         UNION SELECT e.dst, b.dd + 1 FROM b
         JOIN sym e ON e.src = b.node WHERE b.dd < 10),
       dist AS (SELECT node, CAST(min(dd) AS BIGINT) AS dd FROM b GROUP BY 1),
       l AS (SELECT CAST(sum(dd) AS BIGINT) AS sd, count(*) AS nr
             FROM dist WHERE dd > 0),
       m AS (SELECT (SELECT count(*) FROM nodes) AS v,
             (SELECT count(*) FROM sym) AS m2,
             (SELECT t FROM tri) AS t, (SELECT w FROM wed) AS w,
             (SELECT sd FROM l) AS sd, (SELECT nr FROM l) AS nr)
       SELECT v AS n_nodes, CAST(m2 // 2 AS BIGINT) AS n_edges, t AS triangles,
         round(CAST(3 * t AS DOUBLE) / w, 4) AS clustering,
         round(CAST(sd AS DOUBLE) / nr, 4) AS avg_dist,
         round((CAST(3 * t AS DOUBLE) / w
             / (CAST(m2 AS DOUBLE) / (CAST(v AS DOUBLE) * (v - 1))))
           / ((CAST(sd AS DOUBLE) / nr)
             / (ln(CAST(v AS DOUBLE)) / ln(CAST(m2 AS DOUBLE) / v))), 4)
           AS sigma
       FROM m""",
    note="small-world sigma of the nation trade graph: clustering "
    "ratio (observed transitivity over the random-graph density) "
    "divided by path-length ratio (single-source mean distance over "
    "ln V / ln <k>) — sigma >> 1 is the Watts-Strogatz signature "
    "that justifies frontier BFS designs (g56's width spike-and-"
    "collapse IS this property).  Dialect landmine documented here: "
    "under WITH RECURSIVE, DuckDB 1.0 stops deduplicating UNION in "
    "EVERY CTE of the query, so this symmetric view (whose mutual "
    "nation edges actually collide, unlike the collision-free "
    "bipartite views) dedups via explicit SELECT DISTINCT over "
    "UNION ALL.  Triangles and wedges are exact "
    "integer counts on the symmetric view; the mean distance reuses "
    "the g03 BFS from the lexicographic-min node; every double "
    "appears once in the final row",
)
def g64(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    ne = (
        c.table("lineitem")
        .join(c.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c.table("customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.table("supplier")), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.concat(F.lit("n"), F.col("c_nationkey")).alias("src"),
            F.concat(F.lit("n"), F.col("s_nationkey")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter((F.col("n") >= 25) & (F.col("src") != F.col("dst")))
        .select("src", "dst")
    )
    sym = ne.union(
        ne.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint(eager=True)
    nodes = sym.select(F.col("src").alias("id")).distinct()
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    x = sym.select(F.col("src").alias("xa"), F.col("dst").alias("xb")).filter(
        F.col("xa") < F.col("xb")
    )
    y = sym.select(F.col("src").alias("ya"), F.col("dst").alias("yb")).filter(
        F.col("ya") < F.col("yb")
    )
    z = sym.select(F.col("src").alias("za"), F.col("dst").alias("zb"))
    tri = (
        x.join(y, F.col("ya") == F.col("xb"))
        .join(z, (F.col("za") == F.col("xa")) & (F.col("zb") == F.col("yb")))
        .agg(F.count(F.lit(1)).alias("t"))
    )
    wed = deg.agg(
        F.sum(F.expr("d * (d - 1) DIV 2")).alias("w")
    )
    src0 = nodes.agg(F.min("id")).collect()[0][0]
    dist = bfs_distances(PropertyGraph(nodes, sym), src0, max_hops=10)
    l = dist.filter(F.col("d") > 0).agg(
        F.sum("d").alias("sd"), F.count(F.lit(1)).alias("nr")
    )
    m = (
        nodes.agg(F.count(F.lit(1)).alias("v"))
        .crossJoin(sym.agg(F.count(F.lit(1)).alias("m2")))
        .crossJoin(tri)
        .crossJoin(wed)
        .crossJoin(l)
    )
    cl = (3 * F.col("t")).cast("double") / F.col("w")
    dens = F.col("m2").cast("double") / (F.col("v").cast("double") * (F.col("v") - 1))
    lavg = F.col("sd").cast("double") / F.col("nr")
    lrand = F.log(F.col("v").cast("double")) / F.log(
        F.col("m2").cast("double") / F.col("v")
    )
    return m.select(
        F.col("v").alias("n_nodes"),
        F.floor(F.col("m2") / 2).cast("long").alias("n_edges"),
        F.col("t").alias("triangles"),
        F.round(cl, 4).alias("clustering"),
        F.round(lavg, 4).alias("avg_dist"),
        F.round((cl / dens) / (lavg / lrand), 4).alias("sigma"),
    )


@_g(
    "g65_bowtie",
    """WITH RECURSIVE ne AS (
         SELECT 'n'||c.c_nationkey AS src, 'n'||s.s_nationkey AS dst
         FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey
         JOIN customer c ON o.o_custkey=c.c_custkey
         JOIN supplier s ON l.l_suppkey=s.s_suppkey
         GROUP BY 1,2 HAVING count(*) >= 25),
       e AS (SELECT src, dst FROM ne WHERE src <> dst),
       nodes AS (SELECT DISTINCT node FROM (
         SELECT src AS node FROM e UNION ALL SELECT dst FROM e) u),
       reach(a, b) AS (SELECT src, dst FROM e
         UNION SELECT r.a, x.dst FROM reach r JOIN e x ON x.src = r.b),
       scc AS (SELECT n.node,
         least(n.node, coalesce(min(m.b), n.node)) AS comp
         FROM nodes n LEFT JOIN
           (SELECT r1.a, r1.b FROM reach r1
            JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a) m
           ON m.a = n.node GROUP BY 1),
       core AS (SELECT comp FROM scc GROUP BY comp
         ORDER BY count(*) DESC, comp LIMIT 1),
       cn AS (SELECT node FROM scc WHERE comp = (SELECT comp FROM core)),
       fromc AS (SELECT DISTINCT r.b AS node FROM reach r
         JOIN cn ON cn.node = r.a),
       toc AS (SELECT DISTINCT r.a AS node FROM reach r
         JOIN cn ON cn.node = r.b),
       cls AS (SELECT n.node, CASE
           WHEN cn.node IS NOT NULL THEN 'a_core'
           WHEN tc.node IS NOT NULL AND fc.node IS NULL THEN 'b_in'
           WHEN fc.node IS NOT NULL AND tc.node IS NULL THEN 'c_out'
           WHEN fc.node IS NOT NULL AND tc.node IS NOT NULL THEN 'a_core'
           ELSE 'd_other' END AS cls
         FROM nodes n LEFT JOIN cn ON cn.node = n.node
         LEFT JOIN fromc fc ON fc.node = n.node
         LEFT JOIN toc tc ON tc.node = n.node)
       SELECT cls AS component, count(*) AS n_nodes FROM cls
       GROUP BY 1 ORDER BY 1""",
    note="bow-tie decomposition of the directed nation trade graph: "
    "the giant SCC core, the IN set (reaches the core, unreachable "
    "from it), the OUT set (fed by the core), and the rest — the "
    "macro-structure read (famous from web-graph analysis) that "
    "says which markets originate, intermediate, or terminate "
    "trade flow.  Reachability reuses g17's transitive-closure "
    "machinery on the tiny aggregated graph (nodes reaching AND "
    "reached by the core are mutually connected to it and fold "
    "into the core class); at scale the same classes come from two "
    "multi-source BFS frontiers seeded at the core instead of a "
    "closure",
)
def g65(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.algorithms import multi_source_bfs, strongly_connected_components

    c = Catalog(spark, sf_dir)
    ne = (
        c.table("lineitem")
        .join(c.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c.table("customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.table("supplier")), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.concat(F.lit("n"), F.col("c_nationkey")).alias("src"),
            F.concat(F.lit("n"), F.col("s_nationkey")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter((F.col("n") >= 25) & (F.col("src") != F.col("dst")))
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    nodes = (
        ne.select(F.col("src").alias("id"))
        .union(ne.select(F.col("dst").alias("id")))
        .distinct()
    )
    scc = strongly_connected_components(PropertyGraph(nodes, ne))
    core_comp = (
        scc.groupBy("component")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "component")
        .limit(1)
        .collect()[0]["component"]
    )
    cn = scc.filter(F.col("component") == core_comp).select("node").localCheckpoint(
        eager=True
    )
    seeds = [r["node"] for r in cn.collect()]
    fromc = (
        multi_source_bfs(PropertyGraph(nodes, ne), seeds, max_hops=10)
        .select(F.col("node").alias("fn"))
        .distinct()
    )
    rev = ne.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    toc = (
        multi_source_bfs(PropertyGraph(nodes, rev), seeds, max_hops=10)
        .select(F.col("node").alias("tn"))
        .distinct()
    )
    cls = (
        nodes.join(cn.withColumnRenamed("node", "cnode"), nodes.id == F.col("cnode"), "left")
        .join(F.broadcast(fromc), nodes.id == F.col("fn"), "left")
        .join(F.broadcast(toc), nodes.id == F.col("tn"), "left")
        .select(
            F.when(F.col("cnode").isNotNull(), "a_core")
            .when(F.col("tn").isNotNull() & F.col("fn").isNull(), "b_in")
            .when(F.col("fn").isNotNull() & F.col("tn").isNull(), "c_out")
            .when(F.col("fn").isNotNull() & F.col("tn").isNotNull(), "a_core")
            .otherwise("d_other")
            .alias("cls")
        )
    )
    return (
        cls.groupBy(F.col("cls").alias("component"))
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("component")
    )


@_g(
    "g66_config_model_check",
    """WITH ne AS (
         SELECT 'n'||c.c_nationkey AS src, 'n'||s.s_nationkey AS dst
         FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey
         JOIN customer c ON o.o_custkey=c.c_custkey
         JOIN supplier s ON l.l_suppkey=s.s_suppkey
         GROUP BY 1,2 HAVING count(*) >= 25),
       sym AS (SELECT DISTINCT src, dst FROM (
           SELECT src, dst FROM ne WHERE src <> dst
           UNION ALL SELECT dst, src FROM ne WHERE src <> dst) u),
       deg AS (SELECT src AS node, count(*) AS d FROM sym GROUP BY 1),
       tri AS (SELECT count(*) AS t FROM sym x
         JOIN sym y ON y.src = x.dst AND x.src < x.dst AND y.src < y.dst
         JOIN sym z ON z.src = x.src AND z.dst = y.dst),
       m AS (SELECT count(*) AS v, CAST(sum(d) AS BIGINT) AS s1,
             CAST(sum(d * (d - 1)) AS BIGINT) AS s2 FROM deg)
       SELECT (SELECT t FROM tri) AS triangles,
         round(CAST(s2 AS DOUBLE) * s2 * s2
           / (6 * CAST(s1 AS DOUBLE) * s1 * s1), 4) AS expected_tri,
         round(CAST((SELECT t FROM tri) AS DOUBLE)
           / nullif(CAST(s2 AS DOUBLE) * s2 * s2
             / (6 * CAST(s1 AS DOUBLE) * s1 * s1), 0), 4) AS excess_ratio
       FROM m""",
    note="configuration-model null check: observed triangles versus "
    "the degree-preserving random expectation (sum d(d-1))^3 / "
    "(6 (sum d)^3) — excess_ratio >> 1 means the clustering g64 "
    "measured is genuine structure, not an artifact of the degree "
    "sequence (the null every network claim must beat before it "
    "means anything).  Both moments are exact integer sums over "
    "the degree table; the triangle count reuses the ordered "
    "wedge-join; one row out, doubles only at the edge",
)
def g66(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    ne = (
        c.table("lineitem")
        .join(c.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c.table("customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.table("supplier")), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.concat(F.lit("n"), F.col("c_nationkey")).alias("src"),
            F.concat(F.lit("n"), F.col("s_nationkey")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter((F.col("n") >= 25) & (F.col("src") != F.col("dst")))
        .select("src", "dst")
    )
    sym = ne.union(
        ne.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint(eager=True)
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    x = sym.select(F.col("src").alias("xa"), F.col("dst").alias("xb")).filter(
        F.col("xa") < F.col("xb")
    )
    y = sym.select(F.col("src").alias("ya"), F.col("dst").alias("yb")).filter(
        F.col("ya") < F.col("yb")
    )
    z = sym.select(F.col("src").alias("za"), F.col("dst").alias("zb"))
    tri = (
        x.join(y, F.col("ya") == F.col("xb"))
        .join(z, (F.col("za") == F.col("xa")) & (F.col("zb") == F.col("yb")))
        .agg(F.count(F.lit(1)).alias("t"))
    )
    m = deg.agg(
        F.count(F.lit(1)).alias("v"),
        F.sum("d").alias("s1"),
        F.sum(F.col("d") * (F.col("d") - 1)).alias("s2"),
    )
    exp = (
        F.col("s2").cast("double")
        * F.col("s2")
        * F.col("s2")
        / (6 * F.col("s1").cast("double") * F.col("s1") * F.col("s1"))
    )
    return tri.crossJoin(F.broadcast(m)).select(
        F.col("t").alias("triangles"),
        F.round(exp, 4).alias("expected_tri"),
        F.round(F.col("t").cast("double") / F.nullif(exp, F.lit(0.0)), 4).alias(
            "excess_ratio"
        ),
    )


@_g(
    "g67_adoption_timing",
    f"""WITH {GRAPH_CTES},
       med AS (SELECT first_ts AS m FROM graph_edges
         QUALIFY row_number() OVER (ORDER BY first_ts, src, dst)
           = (count(*) OVER () + 1) // 2),
       pn AS (SELECT src AS node,
         count(*) AS deg,
         CAST(sum(CASE WHEN first_ts <= (SELECT m FROM med)
           THEN 1 ELSE 0 END) AS BIGINT) AS early
         FROM graph_edges GROUP BY 1),
       cls AS (SELECT node, deg, early, CASE
           WHEN 2 * early >= 2 * deg THEN 'a_early'
           WHEN 4 * early >= 3 * deg THEN 'b_mostly_early'
           WHEN 4 * early >= deg THEN 'c_mixed'
           ELSE 'd_late' END AS timing FROM pn)
       SELECT timing, count(*) AS n_nodes,
         CAST(sum(deg) AS BIGINT) AS total_edges
       FROM cls GROUP BY 1 ORDER BY 1""",
    note="relationship-formation timing classes: each customer "
    "classified by what fraction of its supplier edges existed by "
    "the corpus-median first_ts — early adopters (all edges early), "
    "mostly-early, mixed, late entrants — the customer-lifecycle "
    "segmentation that snapshot-diff counts (g13) aggregate away.  "
    "The median edge timestamp is one rank pick (exact, tie-broken); "
    "class cuts are integer cross-multiplications (2e >= 2d, 4e >= "
    "3d, 4e >= d), so no float thresholds anywhere",
)
def g67(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    ge = c.graph_edges().select("src", "dst", "first_ts").localCheckpoint(eager=True)
    n_edges = ge.count()
    med = (
        ge.withColumn(
            "rn",
            F.row_number().over(Window.orderBy("first_ts", "src", "dst")),
        )
        .filter(F.col("rn") == (n_edges + 1) // 2)
        .select(F.col("first_ts").alias("m"))
    )
    pn = (
        ge.crossJoin(F.broadcast(med))
        .groupBy(F.col("src").alias("node"))
        .agg(
            F.count(F.lit(1)).alias("deg"),
            F.sum(
                F.when(F.col("first_ts") <= F.col("m"), 1).otherwise(0)
            ).alias("early"),
        )
    )
    timing = (
        F.when(2 * F.col("early") >= 2 * F.col("deg"), "a_early")
        .when(4 * F.col("early") >= 3 * F.col("deg"), "b_mostly_early")
        .when(4 * F.col("early") >= F.col("deg"), "c_mixed")
        .otherwise("d_late")
    )
    return (
        pn.groupBy(timing.alias("timing"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("deg").alias("total_edges"),
        )
        .orderBy("timing")
    )


@_g(
    "g68_edge_persistence",
    """WITH e AS (SELECT 'c'||o.o_custkey AS src, 's'||l.l_suppkey AS dst,
         count(*) AS n_items,
         CAST(floor(sum(l.l_extendedprice * (1 - l.l_discount)) * 100 + 0.5)
           AS BIGINT) AS wc,
         epoch_us(max(l.l_shipdate)) - epoch_us(min(l.l_shipdate)) AS span_us
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         GROUP BY 1, 2),
       c AS (SELECT CASE
           WHEN span_us < 30 * 86400000000 THEN 'a_transient'
           WHEN span_us < 365 * 86400000000 THEN 'b_medium'
           ELSE 'c_persistent' END AS persistence,
         wc, n_items FROM e),
       t AS (SELECT CAST(sum(wc) AS BIGINT) AS tot FROM c)
       SELECT persistence, count(*) AS n_edges,
         CAST(sum(n_items) AS BIGINT) AS n_items,
         CAST(sum(wc) AS BIGINT) AS weight_cents,
         round(CAST(sum(wc) AS DOUBLE) / t.tot, 4) AS weight_share
       FROM c CROSS JOIN t GROUP BY 1, t.tot ORDER BY 1""",
    note="relationship persistence classes: customer-supplier edges "
    "bucketed by their active span (last_ts - first_ts): one-shot "
    "transactions, medium engagements, persistent (1y+) "
    "relationships — with the revenue share each class carries, "
    "the 'is our revenue relationship-based or spot-based' read "
    "that every temporal edge list supports for free and static "
    "graph views erase.  Edge revenue uses the floor-cents "
    "convention on the UNROUNDED sum (the view's HALF_UP 2-dp "
    "weight hits half-cent dialect divergence when totalled over "
    "every edge); integer microsecond spans; one pass over the "
    "aggregated edges",
)
def g68(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    e = (
        c.table("lineitem")
        .join(c.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.floor(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100
                + 0.5
            ).cast("long").alias("wc"),
            (
                F.unix_micros(F.max("l_shipdate"))
                - F.unix_micros(F.min("l_shipdate"))
            ).alias("span_us"),
        )
        .select("n_items", "wc", "span_us")
    )
    cls = (
        F.when(F.col("span_us") < 30 * 86_400_000_000, "a_transient")
        .when(F.col("span_us") < 365 * 86_400_000_000, "b_medium")
        .otherwise("c_persistent")
    )
    c = e.select(cls.alias("persistence"), "wc", "n_items")
    t = c.agg(F.sum("wc").alias("tot"))
    return (
        c.groupBy("persistence")
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.sum("n_items").alias("n_items"),
            F.sum("wc").alias("weight_cents"),
        )
        .crossJoin(F.broadcast(t))
        .select(
            "persistence",
            "n_edges",
            "n_items",
            "weight_cents",
            F.round(F.col("weight_cents").cast("double") / F.col("tot"), 4).alias(
                "weight_share"
            ),
        )
        .orderBy("persistence")
    )


@_g(
    "g69_effective_diameter",
    f"""WITH RECURSIVE {GRAPH_CTES},
       lms AS (SELECT node FROM graph_nodes WHERE node IN ('c1','c5','c9')),
       bfs(lm, node, hops) AS (
         SELECT node, node, 0 FROM lms
         UNION
         SELECT b.lm, e.dst, b.hops+1 FROM bfs b
         JOIN graph_edges_sym e ON b.node=e.src WHERE b.hops<6),
       dist AS (SELECT lm, node, min(hops) AS d FROM bfs GROUP BY 1,2),
       hist AS (SELECT d, count(*) AS n_pairs FROM dist GROUP BY 1),
       tot AS (SELECT count(*) AS t FROM dist)
       SELECT CAST(h.d AS BIGINT) AS d, CAST(h.n_pairs AS BIGINT) AS n_pairs,
              round(sum(h.n_pairs) OVER (ORDER BY h.d) * 1.0 / tot.t, 4) AS cum_share
       FROM hist h CROSS JOIN tot ORDER BY d""",
    note="hop-distance distribution from fixed landmarks + cumulative "
    "share — the effective-diameter estimator (smallest d whose "
    "cum_share >= 0.9, read off the curve; ANF/HyperANF's sampled "
    "form).  Same ONE multi-source frontier loop as g22 (state keyed "
    "(landmark, node)), so k landmarks cost one BFS; exact pairwise "
    "diameter needs O(V) sweeps and is off the table at scale — "
    "landmark sampling is the honest estimator, refined by adding "
    "landmarks (cost linear, parallel)",
)
def g69(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..graph.algorithms import multi_source_bfs

    g = _sym_graph(Catalog(spark, sf_dir))
    dist = multi_source_bfs(g, ["c1", "c5", "c9"], max_hops=6)
    hist = dist.groupBy("d").agg(F.count(F.lit(1)).alias("n_pairs"))
    tot = dist.agg(F.count(F.lit(1)).alias("t"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return (
        hist.crossJoin(F.broadcast(tot))
        .withColumn("cum_share", F.round(F.sum("n_pairs").over(w) / F.col("t"), 4))
        .select(F.col("d").cast("bigint").alias("d"), "n_pairs", "cum_share")
        .orderBy("d")
    )


@_g(
    "g70_temporal_pagerank",
    _wpagerank_oracle(
        weight_sql="1.0/(1.0 + greatest(date_diff('day', first_ts, TIMESTAMP '1998-12-01'), 0)/365.0)"
    ),
    note="TEMPORAL PageRank: edge weight = recency decay "
    "1/(1 + age_years) of the relationship's first trade, so rank "
    "mass flows preferentially along RECENT relationships — the "
    "time-decayed centrality a temporal property graph owes its "
    "users (stale hubs fade without deleting history).  The decay is "
    "computed from the stationary edge's first_ts column at plan "
    "time, so the superstep cost model is byte-identical to g33/g06: "
    "one dst-combine shuffle per iteration; changing the reference "
    "date or half-life re-plans a projection, never re-shuffles",
)
def g70(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.algorithms import pagerank_weighted

    c = Catalog(spark, sf_dir)
    e = c.graph_edges().select(
        "src",
        "dst",
        (
            F.lit(1.0)
            / (
                F.lit(1.0)
                + F.greatest(
                    F.datediff(F.lit("1998-12-01"), F.col("first_ts")), F.lit(0)
                )
                / F.lit(365.0)
            )
        ).alias("weight"),
    )
    wsym = e.unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("weight"))
    )
    v = c.graph_nodes().select(F.col("node").alias("id"))
    ranks = pagerank_weighted(PropertyGraph(v, wsym), iterations=10, damping=0.85)
    return (
        ranks.select("node", F.round("rank", 6).alias("r"))
        .orderBy(F.col("r").desc(), "node")
        .limit(20)
    )


@_g(
    "g71_harmonic_centrality",
    f"""WITH RECURSIVE {GRAPH_CTES},
       lms AS (SELECT node FROM graph_nodes WHERE node IN ('c2','c7','s3')),
       bfs(lm, node, hops) AS (
         SELECT node, node, 0 FROM lms
         UNION
         SELECT b.lm, e.dst, b.hops+1 FROM bfs b
         JOIN graph_edges_sym e ON b.node=e.src WHERE b.hops<5),
       dist AS (SELECT lm, node, min(hops) AS d FROM bfs GROUP BY 1,2),
       agg AS (SELECT node, count(*) AS n_lm, sum(60 // d) AS hx60
               FROM dist WHERE d >= 1 GROUP BY 1)
       SELECT node, CAST(n_lm AS BIGINT) AS n_lm,
              round(CAST(hx60 AS DOUBLE) / 60.0, 6) AS harmonic
       FROM agg ORDER BY harmonic DESC, node""",
    note="landmark harmonic centrality: sum of 1/d over landmark "
    "distances (Boldi-Vigna's recommended centrality for disconnected "
    "graphs — unreached landmarks contribute 0 instead of poisoning "
    "the sum like closeness does).  Same ONE multi-source frontier "
    "loop as g22 (state keyed (landmark, node), k landmarks = one "
    "BFS's superstep count).  Reciprocal distances are summed as "
    "exact integers x60 (lcm of 1..5) so the two engines cannot "
    "diverge on float summation order, then divided once at the end",
)
def g71(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.algorithms import multi_source_bfs

    g = _sym_graph(Catalog(spark, sf_dir))
    dist = multi_source_bfs(g, ["c2", "c7", "s3"], max_hops=5)
    return (
        dist.filter(F.col("d") >= 1)
        .groupBy("node")
        .agg(
            F.count(F.lit(1)).alias("n_lm"),
            F.sum(F.expr("60 div d")).alias("hx60"),
        )
        .select(
            "node",
            "n_lm",
            F.round(F.col("hx60").cast("double") / 60.0, 6).alias("harmonic"),
        )
        .orderBy(F.col("harmonic").desc(), "node")
    )


_TRADE_SYM_CTES = """ne AS (
         SELECT 'n'||c.c_nationkey AS src, 'n'||s.s_nationkey AS dst
         FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey
         JOIN customer c ON o.o_custkey=c.c_custkey
         JOIN supplier s ON l.l_suppkey=s.s_suppkey
         GROUP BY 1,2 HAVING count(*) >= 150),
       es AS (SELECT DISTINCT src, dst FROM (
         SELECT src, dst FROM ne WHERE src<>dst
         UNION ALL SELECT dst, src FROM ne WHERE src<>dst))"""


@_g(
    "g72_local_bridges",
    f"""WITH {_TRADE_SYM_CTES},
       pairs AS (SELECT src AS u, dst AS v FROM es WHERE src < dst),
       cn AS (SELECT p.u, p.v, count(*) AS c
              FROM pairs p
              JOIN es a ON a.src = p.u
              JOIN es b ON b.src = p.v AND b.dst = a.dst
              WHERE a.dst <> p.u AND a.dst <> p.v
              GROUP BY 1, 2)
       SELECT p.u, p.v, CAST(coalesce(cn.c, 0) AS BIGINT) AS common_nbrs,
              CASE WHEN cn.c IS NULL THEN 1 ELSE 0 END AS is_local_bridge
       FROM pairs p LEFT JOIN cn ON cn.u = p.u AND cn.v = p.v
       ORDER BY 1, 2""",
    note="local bridges (Easley-Kleinberg): an edge whose endpoints "
    "share NO common neighbor — its removal pushes the endpoints to "
    "distance > 2, the classic weak-tie / information-brokerage "
    "signal.  Computed on the symmetrized nation trade graph "
    "(>=150 shipments, sparse enough to have bridges).  Shape is the "
    "triangle-counting inverted-index join: adjacency self-joined on "
    "the shared-neighbor key, NEVER per-pair neighborhood "
    "intersection lists; at 100 TB the adjacency is bucketed on src "
    "so both probes are co-located, and the per-pair count is a "
    "map-side-combined groupBy",
)
def g72(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    ne = (
        c.table("lineitem")
        .join(c.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.table("customer")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.table("supplier")), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.concat(F.lit("n"), F.col("c_nationkey")).alias("src"),
            F.concat(F.lit("n"), F.col("s_nationkey")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter((F.col("n") >= 150) & (F.col("src") != F.col("dst")))
        .select("src", "dst")
    )
    es = (
        ne.unionAll(ne.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    pairs = es.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    a = es.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    b = es.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    cn = (
        pairs.join(a, "u")
        .join(b, ["v", "w"])
        .filter((F.col("w") != F.col("u")) & (F.col("w") != F.col("v")))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        pairs.join(cn, ["u", "v"], "left")
        .select(
            "u",
            "v",
            F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("common_nbrs"),
            F.when(F.col("c").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_local_bridge"),
        )
        .orderBy("u", "v")
    )


def _katz_oracle(iters: int = 6, alpha: float = 0.005, topn: int = 25) -> str:
    parts = ["k0 AS (SELECT node, 1.0::DOUBLE AS x FROM graph_nodes)"]
    for i in range(1, iters + 1):
        parts.append(
            f"""k{i} AS (SELECT n.node,
       1.0::DOUBLE + {alpha}::DOUBLE * coalesce(sum(p.x), 0) AS x
       FROM graph_nodes n LEFT JOIN graph_edges_sym e ON e.dst = n.node
       LEFT JOIN k{i - 1} p ON p.node = e.src GROUP BY 1)"""
        )
    chain = ",\n".join(parts)
    return (
        f"WITH {GRAPH_CTES},\n{chain}\n"
        f"SELECT node, round(x, 6) AS katz FROM k{iters} "
        f"ORDER BY katz DESC, node LIMIT {topn}"
    )


@_g(
    "g73_katz",
    _katz_oracle(),
    note="truncated Katz centrality (6 rounds, alpha=0.005, beta=1): "
    "x <- 1 + alpha*A^T x counts alpha-discounted walks of every "
    "length ending at the node — the influence semantic PageRank's "
    "degree normalization deliberately discards.  Complements "
    "g48_katz (exact-integer walk counts, horizon 3) with the "
    "iterated-recurrence operator form: deeper horizon, auto-routed "
    "local/distributed paths, reference-parity-tested.  Distributed "
    "superstep is pagerank's minus the out-degree join: ONE dst-"
    "combine shuffle per round over stationary pre-partitioned "
    "edges, x broadcast; small graphs auto-route to the numpy "
    "kernel (parity-shared routing with g06).  Oracle unrolls the "
    "same 6 rounds; both engines order by the ROUNDED score so "
    "last-bit float drift cannot reorder the top-k cut",
)
def g73(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.algorithms import katz_centrality

    g = _sym_graph(Catalog(spark, sf_dir))
    return (
        katz_centrality(g, iterations=6, alpha=0.005)
        .select("node", F.round("katz", 6).alias("katz"))
        .orderBy(F.col("katz").desc(), "node")
        .limit(25)
    )


@_g(
    "g74_temporal_motifs",
    """WITH ne AS (
         SELECT 'n'||c.c_nationkey AS src, 'n'||s.s_nationkey AS dst,
                min(l.l_shipdate) AS t
         FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey
         JOIN customer c ON o.o_custkey=c.c_custkey
         JOIN supplier s ON l.l_suppkey=s.s_suppkey
         GROUP BY 1,2 HAVING count(*) >= 25),
       e AS (SELECT src, dst, t FROM ne WHERE src <> dst)
       SELECT count(*) AS n_motifs,
              round(avg(date_diff('day', e1.t, e3.t)), 2) AS avg_span_days
       FROM e e1 JOIN e e2 ON e2.src = e1.dst
       JOIN e e3 ON e3.src = e2.dst AND e3.dst = e1.src
       WHERE e1.t < e2.t AND e2.t < e3.t
         AND date_diff('day', e1.t, e3.t) <= 90
         AND e1.src < e2.src AND e1.src < e2.dst""",
    note="temporal motif counting (Paranjape-Benson-Leskovec): "
    "time-ordered cyclic trade triangles a->b->c->a whose first-trade "
    "timestamps strictly increase within a 90-day window, "
    "canonicalized to the rotation starting at the smallest node so "
    "each cycle counts once.  The delta-window + ordering constraints "
    "ride the same two equi-joins static triangle counting uses — "
    "time is a filter on the joined rows, not a new join; at 100 TB "
    "the edge list is bucketed on src and the window predicate "
    "prunes before the second join fans out",
)
def g74(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    ne = (
        c.table("lineitem")
        .join(c.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.table("customer")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.table("supplier")), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.concat(F.lit("n"), F.col("c_nationkey")).alias("src"),
            F.concat(F.lit("n"), F.col("s_nationkey")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.min("l_shipdate").alias("t"))
        .filter((F.col("n") >= 25) & (F.col("src") != F.col("dst")))
        .select("src", "dst", "t")
        .localCheckpoint(eager=True)
    )
    e1 = ne.select(F.col("src").alias("a"), F.col("dst").alias("b"), F.col("t").alias("t1"))
    e2 = ne.select(F.col("src").alias("b"), F.col("dst").alias("cn"), F.col("t").alias("t2"))
    e3 = ne.select(F.col("src").alias("cn"), F.col("dst").alias("a"), F.col("t").alias("t3"))
    m = (
        e1.join(e2, "b")
        .join(e3, ["cn", "a"])
        .filter(
            (F.col("t1") < F.col("t2"))
            & (F.col("t2") < F.col("t3"))
            & (F.datediff("t3", "t1") <= 90)
            & (F.col("a") < F.col("b"))
            & (F.col("a") < F.col("cn"))
        )
    )
    return m.agg(
        F.count(F.lit(1)).alias("n_motifs"),
        F.round(F.avg(F.datediff("t3", "t1")), 2).alias("avg_span_days"),
    )


@_g(
    "g75_bipartite_check",
    f"""WITH RECURSIVE {_TRADE_SYM_CTES},
       nodes AS (SELECT DISTINCT src AS node FROM es),
       reach(a, b) AS (
         SELECT node, node FROM nodes
         UNION
         SELECT r.a, e.dst FROM reach r JOIN es e ON r.b = e.src),
       comp AS (SELECT a AS node, min(b) AS root FROM reach GROUP BY 1),
       bfs(root, node, hops) AS (
         SELECT root, root, 0 FROM (SELECT DISTINCT root FROM comp) r
         UNION
         SELECT b.root, e.dst, b.hops+1 FROM bfs b
         JOIN es e ON b.node = e.src WHERE b.hops < 10),
       lvl AS (SELECT root, node, min(hops) % 2 AS par FROM bfs GROUP BY 1, 2),
       oe AS (SELECT c.root, count(*) AS n_odd
              FROM es e JOIN comp c ON c.node = e.src
              JOIN lvl la ON la.root = c.root AND la.node = e.src
              JOIN lvl lb ON lb.root = c.root AND lb.node = e.dst
              WHERE e.src < e.dst AND la.par = lb.par
              GROUP BY 1),
       sz AS (SELECT root, count(*) AS n_nodes FROM comp GROUP BY 1),
       ec AS (SELECT c.root, count(*) AS n_edges
              FROM es e JOIN comp c ON c.node = e.src WHERE e.src < e.dst
              GROUP BY 1)
       SELECT s.root AS component, s.n_nodes, ec.n_edges,
              CAST(coalesce(oe.n_odd, 0) AS BIGINT) AS n_odd_edges,
              CASE WHEN oe.n_odd IS NULL THEN 1 ELSE 0 END AS is_bipartite
       FROM sz s JOIN ec ON ec.root = s.root
       LEFT JOIN oe ON oe.root = s.root ORDER BY 1""",
    note="per-component bipartiteness (BFS 2-coloring): a component "
    "is bipartite iff no edge joins two nodes of equal BFS-level "
    "parity from the component root — the odd-cycle certificate.  "
    "Runs on the symmetrized >=150-shipment nation trade graph "
    "(dense trade triangles make this genuinely non-bipartite, "
    "unlike the c->s view which is bipartite by construction).  "
    "Engine path REUSES connected_components for roots then ONE "
    "multi-source BFS keyed (root, node) — same superstep budget as "
    "g22; the parity join is two broadcast lookups on the (tiny) "
    "level table.  n_nodes/n_edges counted per component to make "
    "the certificate auditable",
)
def g75(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.algorithms import connected_components, multi_source_bfs

    c = Catalog(spark, sf_dir)
    ne = (
        c.table("lineitem")
        .join(c.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.table("customer")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.table("supplier")), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.concat(F.lit("n"), F.col("c_nationkey")).alias("src"),
            F.concat(F.lit("n"), F.col("s_nationkey")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter((F.col("n") >= 150) & (F.col("src") != F.col("dst")))
        .select("src", "dst")
    )
    es = (
        ne.unionAll(ne.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = es.select(F.col("src").alias("id")).distinct()
    g = PropertyGraph(nodes, es)
    comp = connected_components(g).select("node", F.col("component").alias("root"))
    roots = [r["root"] for r in comp.select("root").distinct().collect()]
    lvl = (
        multi_source_bfs(g, roots, max_hops=10)
        .select(F.col("lm").alias("root"), "node", (F.col("d") % 2).alias("par"))
        .localCheckpoint(eager=True)
    )
    e_half = es.filter(F.col("src") < F.col("dst"))
    ec = (
        e_half.join(comp.withColumnRenamed("node", "src"), "src")
        .groupBy("root")
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )
    la = lvl.select("root", F.col("node").alias("src"), F.col("par").alias("pa"))
    lb = lvl.select("root", F.col("node").alias("dst"), F.col("par").alias("pb"))
    oe = (
        e_half.join(comp.withColumnRenamed("node", "src"), "src")
        .join(F.broadcast(la), ["root", "src"])
        .join(F.broadcast(lb), ["root", "dst"])
        .filter(F.col("pa") == F.col("pb"))
        .groupBy("root")
        .agg(F.count(F.lit(1)).alias("n_odd"))
    )
    sz = comp.groupBy("root").agg(F.count(F.lit(1)).alias("n_nodes"))
    return (
        sz.join(ec, "root")
        .join(oe, "root", "left")
        .select(
            F.col("root").alias("component"),
            "n_nodes",
            "n_edges",
            F.coalesce("n_odd", F.lit(0)).cast("long").alias("n_odd_edges"),
            F.when(F.col("n_odd").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_bipartite"),
        )
        .orderBy("component")
    )


def _louvain_oracle(rounds: int = 3) -> str:
    parts = [
        """deg AS (SELECT src AS node, count(*) AS k FROM graph_edges_sym GROUP BY 1),
mm AS (SELECT count(*) AS m2 FROM graph_edges_sym),
c0 AS (SELECT node, node AS comm FROM graph_nodes)"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(
            f"""sig{r} AS (SELECT c.comm, sum(d.k) AS sigma
       FROM c{p} c JOIN deg d ON d.node = c.node GROUP BY 1),
evc{r} AS (SELECT e.src AS v, c.comm, count(*) AS evc
       FROM graph_edges_sym e JOIN c{p} c ON c.node = e.dst GROUP BY 1, 2),
cand{r} AS (SELECT v, comm, max(evc) AS evc FROM (
       SELECT v, comm, evc FROM evc{r}
       UNION ALL SELECT node, comm, 0 FROM c{p}) GROUP BY 1, 2),
sc{r} AS (SELECT a.v, a.comm,
       mm.m2 * a.evc - d.k * (sig{r}.sigma -
         CASE WHEN cur.comm = a.comm THEN d.k ELSE 0 END) AS s
       FROM cand{r} a
       JOIN deg d ON d.node = a.v
       JOIN sig{r} ON sig{r}.comm = a.comm
       JOIN c{p} cur ON cur.node = a.v
       CROSS JOIN mm),
c{r} AS (SELECT v AS node, comm FROM (
       SELECT v, comm, row_number() OVER (PARTITION BY v ORDER BY s DESC, comm) AS rk
       FROM sc{r}) WHERE rk = 1)"""
        )
    chain = ",\n".join(parts)
    return f"""WITH {GRAPH_CTES},
{chain},
ein AS (SELECT a.comm, count(*) AS ih
       FROM graph_edges_sym e
       JOIN c{rounds} a ON a.node = e.src
       JOIN c{rounds} b ON b.node = e.dst AND b.comm = a.comm
       GROUP BY 1)
SELECT c.comm AS community, count(*) AS n_nodes,
       CAST(coalesce(max(ein.ih), 0) AS BIGINT) AS internal_halfedges
FROM c{rounds} c LEFT JOIN ein ON ein.comm = c.comm
GROUP BY 1 ORDER BY 1"""


@_g(
    "g76_louvain_rounds",
    _mat(_louvain_oracle()),
    note="community detection beyond label propagation: 3 synchronous "
    "Louvain local-moving rounds where every node simultaneously "
    "moves to the neighbor community with the best modularity gain.  "
    "The gain comparison is the EXACT INTEGER "
    "m2*e_vc - k_v*(sigma_c - k_v*[v in c]) (deltaQ with constant "
    "terms dropped), tie-broken on the smallest community id — no "
    "floats anywhere, so engine, numpy kernel, python reference "
    "(parity test) and this unrolled SQL oracle land on bit-"
    "identical partitions.  Synchronous scheduling is what makes "
    "the phase distributable (classic Louvain is sequential); per "
    "round the engine pays ONE (v, neighbor-community) combine "
    "shuffle over stationary src-partitioned edges, with community "
    "sizes broadcast — the LPA cost model with a weighted argmax",
)
def g76(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.algorithms import louvain_local_rounds

    c = Catalog(spark, sf_dir)
    g = _sym_graph(c)
    comm = louvain_local_rounds(g, rounds=3).localCheckpoint(eager=True)
    e = c.graph_edges_sym()
    a = comm.select(F.col("node").alias("src"), F.col("comm").alias("ca"))
    b = comm.select(F.col("node").alias("dst"), F.col("comm").alias("cb"))
    ein = (
        e.join(a, "src")
        .join(b, "dst")
        .filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("comm"))
        .agg(F.count(F.lit(1)).alias("ih"))
    )
    return (
        comm.groupBy("comm")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .join(ein, "comm", "left")
        .select(
            F.col("comm").alias("community"),
            "n_nodes",
            F.coalesce("ih", F.lit(0)).cast("long").alias("internal_halfedges"),
        )
        .orderBy("community")
    )


@_g(
    "g77_eccentricity",
    f"""WITH RECURSIVE {_TRADE_SYM_CTES},
       nodes AS (SELECT DISTINCT src AS node FROM es),
       bfs(lm, node, hops) AS (
         SELECT node, node, 0 FROM nodes
         UNION
         SELECT b.lm, e.dst, b.hops+1 FROM bfs b
         JOIN es e ON b.node = e.src WHERE b.hops < 12),
       dist AS (SELECT lm, node, min(hops) AS d FROM bfs GROUP BY 1, 2),
       reach AS (SELECT lm, count(*) AS nr, max(d) AS ecc FROM dist GROUP BY 1),
       nn AS (SELECT count(*) AS n FROM nodes),
       full_ecc AS (SELECT lm, ecc FROM reach CROSS JOIN nn WHERE nr = nn.n),
       lims AS (SELECT min(ecc) AS radius, max(ecc) AS diameter FROM full_ecc)
       SELECT f.lm AS node, CAST(f.ecc AS BIGINT) AS ecc,
              CAST(l.radius AS BIGINT) AS radius,
              CAST(l.diameter AS BIGINT) AS diameter,
              CASE WHEN f.ecc = l.radius THEN 1 ELSE 0 END AS is_center
       FROM full_ecc f CROSS JOIN lims l ORDER BY 1""",
    note="exact eccentricity / radius / diameter / center of the "
    "symmetrized nation trade graph: ONE multi-source BFS from EVERY "
    "node — exact all-pairs eccentricity is only sane on a rolled-up "
    "view (V supersteps of V-sourced state = V^2 frontier rows), "
    "which is precisely what the nation-level aggregation provides "
    "from 100 TB of shipments; at larger V the engine's g49 double-"
    "sweep bound or g22 landmark sampling is the honest substitute.  "
    "Nodes not reaching the whole component are excluded (same rule "
    "as g22's closeness) so ecc is well-defined",
)
def g77(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.algorithms import multi_source_bfs

    c = Catalog(spark, sf_dir)
    ne = (
        c.table("lineitem")
        .join(c.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.table("customer")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.table("supplier")), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.concat(F.lit("n"), F.col("c_nationkey")).alias("src"),
            F.concat(F.lit("n"), F.col("s_nationkey")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter((F.col("n") >= 150) & (F.col("src") != F.col("dst")))
        .select("src", "dst")
    )
    es = (
        ne.unionAll(ne.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = [r["src"] for r in es.select("src").distinct().collect()]
    g = PropertyGraph(es.select(F.col("src").alias("id")).distinct(), es)
    dist = multi_source_bfs(g, nodes, max_hops=12)
    reach = dist.groupBy("lm").agg(
        F.count(F.lit(1)).alias("nr"), F.max("d").alias("ecc")
    )
    nn = len(nodes)
    full_ecc = reach.filter(F.col("nr") == nn).select("lm", "ecc").localCheckpoint(
        eager=True
    )
    lims = full_ecc.agg(
        F.min("ecc").alias("radius"), F.max("ecc").alias("diameter")
    )
    return (
        full_ecc.crossJoin(F.broadcast(lims))
        .select(
            F.col("lm").alias("node"),
            F.col("ecc").cast("long").alias("ecc"),
            F.col("radius").cast("long").alias("radius"),
            F.col("diameter").cast("long").alias("diameter"),
            F.when(F.col("ecc") == F.col("radius"), F.lit(1)).otherwise(F.lit(0)).alias(
                "is_center"
            ),
        )
        .orderBy("node")
    )


@_g(
    "g78_bridges",
    f"""WITH RECURSIVE {_TRADE_SYM_CTES},
       eh AS (SELECT src AS u, dst AS v FROM es WHERE src < dst),
       r(u, v, node) AS (
         SELECT u, v, u FROM eh
         UNION
         SELECT r.u, r.v, e.dst FROM r JOIN es e ON e.src = r.node
         WHERE NOT ((e.src = r.u AND e.dst = r.v)
                 OR (e.src = r.v AND e.dst = r.u))),
       hit AS (SELECT DISTINCT u, v FROM r WHERE node = v)
       SELECT eh.u, eh.v,
              CASE WHEN hit.u IS NULL THEN 1 ELSE 0 END AS is_bridge
       FROM eh LEFT JOIN hit ON hit.u = eh.u AND hit.v = eh.v
       ORDER BY 1, 2""",
    note="exact bridges (cut edges): an edge is a bridge iff its "
    "endpoints are disconnected once it is removed — tested by |E| "
    "SIMULTANEOUS BFS instances keyed by the excluded edge, all "
    "riding one frontier loop (state (edge, node), the multi-source "
    "pattern g22/g71/g75 use with a composite key).  Exact bridge "
    "testing at this granularity is for rolled-up views (|E| "
    "concurrent frontiers = |E|x|V| state ceiling — hundreds here); "
    "at raw-graph scale the honest substitutes are g72's local "
    "bridges (zero common neighbor, one join) or chain "
    "decomposition.  Every true bridge is necessarily a g72 local "
    "bridge — the two queries cross-certify.  Oracle replays the "
    "same excluded-edge reachability as one recursive CTE",
)
def g78(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    ne = (
        c.table("lineitem")
        .join(c.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.table("customer")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.table("supplier")), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.concat(F.lit("n"), F.col("c_nationkey")).alias("src"),
            F.concat(F.lit("n"), F.col("s_nationkey")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter((F.col("n") >= 150) & (F.col("src") != F.col("dst")))
        .select("src", "dst")
    )
    es = (
        ne.unionAll(ne.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    eh = es.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    visited = eh.select("u", "v", F.col("u").alias("node")).localCheckpoint(eager=True)
    frontier = visited
    # run to FIXPOINT (the oracle's recursive CTE does): visited grows
    # monotonically and is bounded by |edges|x|nodes|, so the empty-
    # frontier break below always fires; a fixed round count could
    # falsely label an edge a bridge when a detour exceeds the horizon
    while True:
        nxt = (
            frontier.join(es, frontier.node == es.src)
            .filter(
                ~(
                    ((F.col("src") == F.col("u")) & (F.col("dst") == F.col("v")))
                    | ((F.col("src") == F.col("v")) & (F.col("dst") == F.col("u")))
                )
            )
            .select("u", "v", F.col("dst").alias("node"))
            .distinct()
        )
        vis = visited.select(
            F.col("u").alias("vu"), F.col("v").alias("vv"), F.col("node").alias("vn")
        )
        frontier = nxt.join(
            vis,
            (nxt.u == vis.vu) & (nxt.v == vis.vv) & (nxt.node == vis.vn),
            "left_anti",
        ).localCheckpoint(eager=True)
        if not frontier.take(1):
            break
        visited = visited.unionByName(frontier).localCheckpoint(eager=True)
    hit = visited.filter(F.col("node") == F.col("v")).select("u", "v").distinct()
    return (
        eh.join(hit.withColumn("reached", F.lit(1)), ["u", "v"], "left")
        .select(
            "u",
            "v",
            F.when(F.col("reached").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_bridge"),
        )
        .orderBy("u", "v")
    )


@_g(
    "g79_incremental_cc",
    f"""WITH RECURSIVE {GRAPH_CTES},
       ge AS (SELECT src, dst FROM graph_edges
              WHERE n_items >= 3 AND first_ts <= TIMESTAMP '1998-01-01'),
       ges AS (SELECT src, dst FROM ge UNION SELECT dst, src FROM ge),
       nodes AS (SELECT DISTINCT src AS node FROM ges),
       reach(node, r) AS (
         SELECT node, node FROM nodes
         UNION
         SELECT e.dst, reach.r FROM reach JOIN ges e ON reach.node=e.src)
       SELECT node, min(r) AS component FROM reach GROUP BY 1 ORDER BY 1""",
    note="incremental connected components over the EVOLVING graph: "
    "the engine labels the graph as of 1996-06-01, then absorbs the "
    "edges born in (1996-06-01, 1998-01-01] through "
    "incremental_components — old edges are NEVER re-read; new edges "
    "contract onto the component graph (one tiny CC on <= one node "
    "per touched component) and labels re-map by broadcast.  The "
    "oracle computes the 1998-01-01 snapshot DIRECTLY, so a hash "
    "match proves incremental == full recompute, the maintenance "
    "guarantee an evolving temporal graph store owes its users.  "
    "min-label composition is associative, which is why the "
    "contraction is lossless; the same machinery is parity-tested "
    "on random edge splits in test_properties",
)
def g79(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.algorithms import connected_components, incremental_components

    c = Catalog(spark, sf_dir)
    t0 = F.lit("1996-06-01").cast("timestamp")
    t1 = F.lit("1998-01-01").cast("timestamp")
    base = c.graph_edges().filter(F.col("n_items") >= 3)
    ge_old = base.filter(F.col("first_ts") <= t0).select("src", "dst")
    ges_old = ge_old.union(
        ge_old.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    labels0 = connected_components(
        PropertyGraph(ges_old.select(F.col("src").alias("id")).distinct(), ges_old)
    )
    ge_new = base.filter((F.col("first_ts") > t0) & (F.col("first_ts") <= t1)).select(
        "src", "dst"
    )
    ges_new = ge_new.union(
        ge_new.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    return incremental_components(labels0, ges_new).orderBy("node")


def _simrank_oracle(iters: int = 3, c: float = 0.8) -> str:
    parts = [
        """ne AS (
         SELECT 'n'||cu.c_nationkey AS src, 'n'||su.s_nationkey AS dst
         FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey
         JOIN customer cu ON o.o_custkey=cu.c_custkey
         JOIN supplier su ON l.l_suppkey=su.s_suppkey
         GROUP BY 1,2 HAVING count(*) >= 25),
e AS (SELECT src, dst FROM ne WHERE src <> dst),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
inn AS (SELECT dst AS v, src AS u FROM e),
innd AS (SELECT v, count(*) AS d FROM inn GROUP BY 1),
s0 AS (SELECT node AS a, node AS b, 1.0::DOUBLE AS s FROM nodes)"""
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"""t{k} AS (SELECT ia.v AS a, ib.v AS b,
       {c}::DOUBLE / (da.d * db.d) * sum(s.s) AS s
       FROM inn ia JOIN inn ib ON ia.v <> ib.v
       JOIN s{k - 1} s ON s.a = ia.u AND s.b = ib.u
       JOIN innd da ON da.v = ia.v JOIN innd db ON db.v = ib.v
       GROUP BY ia.v, ib.v, da.d, db.d),
s{k} AS (SELECT a, b, s FROM t{k}
       UNION ALL SELECT node, node, 1.0::DOUBLE FROM nodes)"""
        )
    chain = ",\n".join(parts)
    return (
        f"WITH {chain}\n"
        f"SELECT a, b, round(s, 6) AS simrank FROM s{iters} WHERE a < b\n"
        f"ORDER BY 1, 2"
    )


@_g(
    "g80_simrank",
    _simrank_oracle(),
    note="SimRank (Jeh-Widom 2002): two nodes are similar when their "
    "IN-neighbors are similar — s(a,b) = C/(|I(a)||I(b)|) * sum "
    "s(i,j), C=0.8, 3 iterations, diagonal pinned at 1.  Exact "
    "SimRank carries O(V^2) pair state, so it is declared ONLY for "
    "rolled-up views (the 25-node nation trade graph here; at raw "
    "scale the honest substitutes are the random-walk-sampled "
    "estimator or g23's one-hop Jaccard).  The pair-state iteration "
    "is two in-neighbor joins + one groupBy per round — the same "
    "join pattern as the triangle family, just keyed on node PAIRS; "
    "oracle unrolls the identical 3 rounds",
)
def g80(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    ne = (
        c.table("lineitem")
        .join(c.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.table("customer")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.table("supplier")), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.concat(F.lit("n"), F.col("c_nationkey")).alias("src"),
            F.concat(F.lit("n"), F.col("s_nationkey")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter((F.col("n") >= 25) & (F.col("src") != F.col("dst")))
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    nodes = ne.select(F.col("src").alias("node")).union(
        ne.select(F.col("dst").alias("node"))
    ).distinct()
    inn = ne.select(F.col("dst").alias("v"), F.col("src").alias("u"))
    innd = inn.groupBy("v").agg(F.count(F.lit(1)).alias("d"))
    s = nodes.select(
        F.col("node").alias("a"), F.col("node").alias("b"), F.lit(1.0).alias("s")
    ).localCheckpoint(eager=True)
    diag = nodes.select(
        F.col("node").alias("a"), F.col("node").alias("b"), F.lit(1.0).alias("s")
    )
    ia = inn.select(F.col("v").alias("va"), F.col("u").alias("ua"))
    ib = inn.select(F.col("v").alias("vb"), F.col("u").alias("ub"))
    da = innd.select(F.col("v").alias("va"), F.col("d").alias("da"))
    db = innd.select(F.col("v").alias("vb"), F.col("d").alias("db"))
    for _ in range(3):
        sp = s.select(F.col("a").alias("ua"), F.col("b").alias("ub"), "s")
        t = (
            ia.join(ib, ia.va != ib.vb)
            .join(sp, ["ua", "ub"])
            .join(F.broadcast(da), "va")
            .join(F.broadcast(db), "vb")
            .groupBy("va", "vb", "da", "db")
            .agg(
                (F.lit(0.8) / (F.col("da") * F.col("db")) * F.sum("s")).alias("s")
            )
            .select(F.col("va").alias("a"), F.col("vb").alias("b"), "s")
        )
        s = t.unionByName(diag).localCheckpoint(eager=True)
    return (
        s.filter(F.col("a") < F.col("b"))
        .select("a", "b", F.round("s", 6).alias("simrank"))
        .orderBy("a", "b")
    )


def _eigenvector_oracle(iters: int = 6) -> str:
    parts = ["x0 AS (SELECT node, 1.0::DOUBLE AS x FROM graph_nodes)"]
    for i in range(1, iters + 1):
        parts.append(
            f"""r{i} AS (SELECT n.node, coalesce(sum(p.x), 0)::DOUBLE AS raw
       FROM graph_nodes n LEFT JOIN graph_edges_sym e ON e.dst = n.node
       LEFT JOIN x{i - 1} p ON p.node = e.src GROUP BY 1),
m{i} AS (SELECT max(raw) AS m FROM r{i}),
x{i} AS (SELECT node, raw / m.m AS x FROM r{i} CROSS JOIN m{i} m)"""
        )
    chain = ",\n".join(parts)
    return (
        f"WITH {GRAPH_CTES},\n{chain}\n"
        f"SELECT node, round(x, 6) AS score FROM x{iters} "
        f"ORDER BY score DESC, node LIMIT 25"
    )


@_g(
    "g81_eigenvector",
    _mat(_eigenvector_oracle()),
    note="eigenvector centrality by power iteration (6 rounds, "
    "max-normalized): x <- A^T x / max(A^T x) — a node matters when "
    "its neighbors matter, WITHOUT PageRank's out-degree split or "
    "Katz's additive floor; the max-normalization (instead of the "
    "L2 norm) keeps the per-round scaling a single exact comparison "
    "so distributed float reduction order cannot perturb it.  Same "
    "superstep budget as g73: one dst-combine shuffle per round, "
    "x broadcast; both engines order by the ROUNDED score",
)
def g81(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    es = c.graph_edges_sym().select("src", "dst").localCheckpoint(eager=True)
    nodes = c.graph_nodes().select("node")
    x = nodes.select("node", F.lit(1.0).alias("x")).localCheckpoint(eager=True)
    for _ in range(6):
        xs = F.broadcast(x.select(F.col("node").alias("csrc"), F.col("x").alias("xv")))
        raw = (
            es.join(xs, es.src == F.col("csrc"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("xv").alias("acc"))
        )
        r = nodes.join(raw, "node", "left").select(
            "node", F.coalesce("acc", F.lit(0.0)).alias("raw")
        )
        m = r.agg(F.max("raw").alias("m"))
        x = (
            r.crossJoin(F.broadcast(m))
            .select("node", (F.col("raw") / F.col("m")).alias("x"))
            .localCheckpoint(eager=True)
        )
    return (
        x.select("node", F.round("x", 6).alias("score"))
        .orderBy(F.col("score").desc(), "node")
        .limit(25)
    )


@_g(
    "g82_conductance",
    _mat(
        _louvain_oracle(rounds=3).replace(
        """ein AS (SELECT a.comm, count(*) AS ih
       FROM graph_edges_sym e
       JOIN c3 a ON a.node = e.src
       JOIN c3 b ON b.node = e.dst AND b.comm = a.comm
       GROUP BY 1)
SELECT c.comm AS community, count(*) AS n_nodes,
       CAST(coalesce(max(ein.ih), 0) AS BIGINT) AS internal_halfedges
FROM c3 c LEFT JOIN ein ON ein.comm = c.comm
GROUP BY 1 ORDER BY 1""",
        """deg2 AS (SELECT src AS node, count(*) AS k FROM graph_edges_sym GROUP BY 1),
vol AS (SELECT c.comm, sum(d.k) AS vol FROM c3 c
       JOIN deg2 d ON d.node = c.node GROUP BY 1),
cut AS (SELECT a.comm, count(*) AS cut
       FROM graph_edges_sym e
       JOIN c3 a ON a.node = e.src
       JOIN c3 b ON b.node = e.dst AND b.comm <> a.comm
       GROUP BY 1),
m2 AS (SELECT count(*) AS m2 FROM graph_edges_sym)
SELECT v.comm AS community, CAST(v.vol AS BIGINT) AS volume,
       CAST(coalesce(cut.cut, 0) AS BIGINT) AS cut_edges,
       round(coalesce(cut.cut, 0) * 1.0
             / least(v.vol, m2.m2 - v.vol), 6) AS conductance
FROM vol v LEFT JOIN cut ON cut.comm = v.comm CROSS JOIN m2
WHERE least(v.vol, m2.m2 - v.vol) > 0
ORDER BY 1""",
    )),
    note="per-community conductance of the g76 Louvain partition: "
    "phi(C) = cut(C) / min(vol(C), 2m - vol(C)) — the community-"
    "quality certificate (low conductance = few escape edges "
    "relative to internal mass) that turns 'we found communities' "
    "into a measurable claim; the Louvain rounds are re-derived "
    "identically (exact integer gains) and the conductance "
    "numerators/denominators stay exact integers until one final "
    "division.  Cost on top of the partition: one degree groupBy, "
    "one cross-community edge count (the same broadcast-labels join "
    "the partition itself used), both map-side combined",
)
def g82(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.algorithms import louvain_local_rounds

    c = Catalog(spark, sf_dir)
    g = _sym_graph(c)
    comm = louvain_local_rounds(g, rounds=3).localCheckpoint(eager=True)
    es = c.graph_edges_sym()
    deg = es.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("k"))
    m2 = es.count()
    vol = (
        comm.join(deg, "node")
        .groupBy("comm")
        .agg(F.sum("k").alias("volume"))
    )
    a = comm.select(F.col("node").alias("src"), F.col("comm").alias("ca"))
    b = comm.select(F.col("node").alias("dst"), F.col("comm").alias("cb"))
    cut = (
        es.join(F.broadcast(a), "src")
        .join(F.broadcast(b), "dst")
        .filter(F.col("ca") != F.col("cb"))
        .groupBy(F.col("ca").alias("comm"))
        .agg(F.count(F.lit(1)).alias("cut_edges"))
    )
    return (
        vol.join(cut, "comm", "left")
        .select(
            F.col("comm").alias("community"),
            F.col("volume").cast("long").alias("volume"),
            F.coalesce("cut_edges", F.lit(0)).cast("long").alias("cut_edges"),
            F.round(
                F.coalesce("cut_edges", F.lit(0))
                * 1.0
                / F.least(F.col("volume"), F.lit(m2) - F.col("volume")),
                6,
            ).alias("conductance"),
        )
        .filter(F.least(F.col("volume"), F.lit(m2) - F.col("volume")) > 0)
        .orderBy("community")
    )


@_g(
    "g83_sliding_window_degree",
    """WITH ev AS (SELECT 'c'||o.o_custkey AS src, 's'||l.l_suppkey AS dst,
         l.l_shipdate AS ts
       FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey),
       snaps AS (SELECT unnest([TIMESTAMP '1996-07-01', TIMESTAMP '1997-01-01',
                TIMESTAMP '1997-07-01', TIMESTAMP '1998-01-01']) AS t),
       act AS (SELECT s.t, e.src, e.dst FROM ev e JOIN snaps s
               ON e.ts > s.t - INTERVAL 90 DAY AND e.ts <= s.t
               GROUP BY 1, 2, 3),
       d AS (SELECT t, src, count(*) AS deg FROM act GROUP BY 1, 2)
       SELECT strftime(t, '%Y-%m-%d') AS snap, count(*) AS n_active,
              CAST(sum(deg) AS BIGINT) AS total_deg,
              CAST(max(deg) AS BIGINT) AS max_deg,
              round(avg(deg), 4) AS avg_deg
       FROM d GROUP BY 1 ORDER BY 1""",
    note="trailing-window temporal degree: the graph 'as of t' defined "
    "by a sliding 90-day activity window (not all history) at four "
    "snapshot times — the windowed-snapshot materialization a "
    "temporal graph serves for 'who is CURRENTLY connected' "
    "queries, where relationships expire by inactivity instead of "
    "deletion.  The window predicate rides the snapshot equi-join "
    "as a range filter (4 snapshot rows broadcast onto the fact "
    "scan); distinct-pair degree then per-snapshot profile, both "
    "map-side combined; at 100 TB the fact is partition-pruned to "
    "the union of windows before anything shuffles",
)
def g83(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    ev = (
        c.table("lineitem")
        .join(c.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
            F.col("l_shipdate").alias("ts"),
        )
    )
    snaps = c.spark.createDataFrame(
        [("1996-07-01",), ("1997-01-01",), ("1997-07-01",), ("1998-01-01",)], ["ds"]
    ).select(F.col("ds").cast("timestamp").alias("t"))
    act = (
        ev.join(
            F.broadcast(snaps),
            (ev.ts > F.col("t") - F.expr("INTERVAL 90 DAYS")) & (ev.ts <= F.col("t")),
        )
        .select("t", "src", "dst")
        .distinct()
    )
    d = act.groupBy("t", "src").agg(F.count(F.lit(1)).alias("deg"))
    return (
        d.groupBy(F.date_format("t", "yyyy-MM-dd").alias("snap"))
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.sum("deg").cast("long").alias("total_deg"),
            F.max("deg").cast("long").alias("max_deg"),
            F.round(F.avg("deg"), 4).alias("avg_deg"),
        )
        .orderBy("snap")
    )


@_g(
    "g84_edge_burstiness",
    """WITH ev AS (SELECT 'c'||o.o_custkey AS src, 's'||l.l_suppkey AS dst,
         date_diff('day', DATE '1970-01-01', l.l_shipdate::DATE) AS d
       FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey),
       de AS (SELECT DISTINCT src, dst, d FROM ev),
       gaps AS (SELECT src, dst,
                d - lag(d) OVER (PARTITION BY src, dst ORDER BY d) AS gap
                FROM de),
       st AS (SELECT src, dst, count(*) AS n_gaps,
              CAST(sum(gap) AS BIGINT) AS sg,
              CAST(sum(gap * gap) AS BIGINT) AS sg2
              FROM gaps WHERE gap IS NOT NULL
              GROUP BY 1, 2 HAVING count(*) >= 5),
       mb AS (SELECT src, dst, n_gaps,
              sg * 1.0 / n_gaps AS mu,
              sqrt(greatest(sg2 * 1.0 / n_gaps - (sg * 1.0 / n_gaps)
                   * (sg * 1.0 / n_gaps), 0)) AS sigma
              FROM st)
       SELECT src, dst, n_gaps, round(mu, 4) AS mean_gap_days,
              round(sigma, 4) AS std_gap_days,
              round((sigma - mu) / (sigma + mu), 4) AS burstiness
       FROM mb WHERE sigma + mu > 0
       ORDER BY burstiness DESC, src, dst LIMIT 50""",
    note="relationship burstiness (Goh-Barabasi): per edge with >= 5 "
    "distinct shipment days, inter-event gap mean/std and "
    "B = (sigma - mu)/(sigma + mu) in [-1, 1] — bursty trading "
    "(B -> 1) vs metronome replenishment (B -> -1), the temporal "
    "texture of an edge that a static weight erases.  Gaps come "
    "from one lag() window per edge partition; moments are kept as "
    "EXACT INTEGER day sums (sum, sum of squares) until the final "
    "two divisions, so distributed reduction order cannot flip a "
    "value — the same discipline as the daily-series family.  "
    "Population sigma, computed from the integer moments in both "
    "engines identically",
)
def g84(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    ev = (
        c.table("lineitem")
        .join(c.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
            F.datediff(F.col("l_shipdate").cast("date"), F.lit("1970-01-01")).alias("d"),
        )
        .distinct()
    )
    w = Window.partitionBy("src", "dst").orderBy("d")
    gaps = ev.select(
        "src", "dst", (F.col("d") - F.lag("d").over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    st = (
        gaps.groupBy("src", "dst")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("gap").cast("long").alias("sg"),
            F.sum(F.col("gap") * F.col("gap")).cast("long").alias("sg2"),
        )
        .filter(F.col("n_gaps") >= 5)
    )
    mu = F.col("sg") * 1.0 / F.col("n_gaps")
    sigma = F.sqrt(F.greatest(F.col("sg2") * 1.0 / F.col("n_gaps") - mu * mu, F.lit(0.0)))
    mb = st.select("src", "dst", "n_gaps", mu.alias("mu"), sigma.alias("sigma"))
    return (
        mb.filter((F.col("sigma") + F.col("mu")) > 0)
        .select(
            "src",
            "dst",
            "n_gaps",
            F.round("mu", 4).alias("mean_gap_days"),
            F.round("sigma", 4).alias("std_gap_days"),
            F.round(
                (F.col("sigma") - F.col("mu")) / (F.col("sigma") + F.col("mu")), 4
            ).alias("burstiness"),
        )
        .orderBy(F.col("burstiness").desc(), "src", "dst")
        .limit(50)
    )


@_g(
    "g85_wedge_sampling",
    f"""WITH {GRAPH_CTES},
       ge AS (SELECT src, dst FROM graph_edges WHERE n_items >= 2),
       cos AS (SELECT DISTINCT a.dst AS s1, b.dst AS s2
               FROM ge a JOIN ge b ON a.src=b.src AND a.dst<b.dst),
       adj AS (SELECT s1 AS u, s2 AS v FROM cos
               UNION ALL SELECT s2, s1 FROM cos),
       wed AS (SELECT l.u AS apex, l.v AS a, r.v AS c
               FROM adj l JOIN adj r ON l.u = r.u AND l.v < r.v),
       samp AS (SELECT apex, a, c,
                (strpos('0123456789abcdef', substring(md5(apex||'|'||a||'|'||c), 1, 1)) - 1)
                  AS coin
                FROM wed),
       sw AS (SELECT apex, a, c FROM samp WHERE coin = 0),
       closed AS (SELECT count(*) AS n_closed FROM sw
                  JOIN cos ON cos.s1 = least(sw.a, sw.c)
                         AND cos.s2 = greatest(sw.a, sw.c)),
       tw AS (SELECT count(*) AS n_wedges FROM wed),
       ts2 AS (SELECT count(*) AS n_sampled FROM sw),
       ex AS (SELECT count(*) AS n_triangles
              FROM cos e1 JOIN cos e2 ON e2.s1=e1.s2
              JOIN cos e3 ON e3.s1=e1.s1 AND e3.s2=e2.s2)
       SELECT tw.n_wedges, ts2.n_sampled, closed.n_closed,
              CAST(round(tw.n_wedges * (closed.n_closed * 1.0 / ts2.n_sampled) / 3, 0)
                   AS BIGINT) AS est_triangles,
              ex.n_triangles AS exact_triangles
       FROM tw, ts2, closed, ex""",
    note="wedge-sampling triangle estimation (Seshadhri et al.) — THE "
    "at-scale triangle algorithm: enumerate wedges (2-paths), keep a "
    "deterministic 1/16 md5-coin sample, test only sampled wedges "
    "for closure, estimate triangles = wedges * closed_fraction / 3; "
    "the exact 3-way-join count rides along so the estimate is "
    "auditable in the same row.  The coin is a hash of the wedge "
    "key, not rand(), so the 'sample' reproduces bit-identically on "
    "any engine and any partitioning; at 100 TB the closure probe "
    "shrinks from |wedges| joins (the g05 cost) to |wedges|/16 — "
    "and the sampling rate dials accuracy against cost with a "
    "known variance bound",
)
def g85(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    ge = c.graph_edges().filter(F.col("n_items") >= 2).select("src", "dst")
    a = ge.select(F.col("src").alias("k"), F.col("dst").alias("s1"))
    b = ge.select(F.col("src").alias("k"), F.col("dst").alias("s2"))
    cos = (
        a.join(b, "k")
        .filter(F.col("s1") < F.col("s2"))
        .select("s1", "s2")
        .distinct()
        .localCheckpoint(eager=True)
    )
    adj = cos.select(F.col("s1").alias("u"), F.col("s2").alias("v")).unionAll(
        cos.select(F.col("s2").alias("u"), F.col("s1").alias("v"))
    )
    led = adj.select(F.col("u").alias("apex"), F.col("v").alias("a"))
    red = adj.select(F.col("u").alias("apex"), F.col("v").alias("cc"))
    wed = led.join(red, "apex").filter(F.col("a") < F.col("cc"))
    coin = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(
                F.md5(F.concat_ws("|", "apex", "a", "cc")), 1, 1
            ),
        )
        - 1
    )
    sw = wed.withColumn("coin", coin).filter(F.col("coin") == 0).localCheckpoint(
        eager=True
    )
    closed = sw.join(
        cos,
        (cos.s1 == F.least("a", "cc")) & (cos.s2 == F.greatest("a", "cc")),
    ).agg(F.count(F.lit(1)).alias("n_closed"))
    tw = wed.agg(F.count(F.lit(1)).alias("n_wedges"))
    ns = sw.agg(F.count(F.lit(1)).alias("n_sampled"))
    e1 = cos.select(F.col("s1").alias("x"), F.col("s2").alias("y"))
    e2 = cos.select(F.col("s1").alias("y"), F.col("s2").alias("z"))
    e3 = cos.select(F.col("s1").alias("x"), F.col("s2").alias("z"))
    ex = e1.join(e2, "y").join(e3, ["x", "z"]).agg(
        F.count(F.lit(1)).alias("exact_triangles")
    )
    return (
        tw.crossJoin(ns)
        .crossJoin(closed)
        .crossJoin(ex)
        .select(
            "n_wedges",
            "n_sampled",
            "n_closed",
            F.round(
                F.col("n_wedges")
                * (F.col("n_closed") * 1.0 / F.col("n_sampled"))
                / 3,
                0,
            )
            .cast("long")
            .alias("est_triangles"),
            "exact_triangles",
        )
    )


@_g(
    "g86_degree_gini",
    f"""WITH {GRAPH_CTES},
       deg AS (SELECT src AS node, count(*) AS k FROM graph_edges_sym GROUP BY 1),
       rk AS (SELECT k, row_number() OVER (ORDER BY k, node) AS i FROM deg),
       s AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS sk,
                    CAST(sum(i * k) AS BIGINT) AS sik FROM rk)
       SELECT CAST(n AS BIGINT) AS n_nodes, sk AS total_degree,
              round(2.0 * sik / (n * sk) - (n + 1.0) / n, 6) AS gini
       FROM s""",
    note="Gini coefficient of the degree distribution — the "
    "inequality summary behind every 'is this graph scale-free "
    "enough to need salting' decision (g25's log-bins show the "
    "shape; this is the single-number version feeding the skew "
    "playbook).  Computed by the rank formula "
    "G = 2*sum(i*k_i)/(n*sum(k)) - (n+1)/n over degrees sorted "
    "(k, node) — rank sums stay EXACT INTEGERS until one final "
    "division, so the value is partition-invariant by construction; "
    "one degree groupBy + one global sort of the (small) degree "
    "table",
)
def g86(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    deg = c.graph_edges_sym().groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("k")
    )
    w = Window.orderBy("k", "node")
    rk = deg.select("k", F.row_number().over(w).alias("i"))
    s = rk.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").cast("long").alias("sk"),
        F.sum(F.col("i") * F.col("k")).cast("long").alias("sik"),
    )
    return s.select(
        F.col("n").cast("long").alias("n_nodes"),
        F.col("sk").alias("total_degree"),
        F.round(
            2.0 * F.col("sik") / (F.col("n") * F.col("sk"))
            - (F.col("n") + 1.0) / F.col("n"),
            6,
        ).alias("gini"),
    )


@_g(
    "g87_knn_degree_curve",
    f"""WITH {GRAPH_CTES},
       deg AS (SELECT src AS node, count(*) AS k FROM graph_edges_sym GROUP BY 1),
       nb AS (SELECT e.src AS node, CAST(sum(dd.k) AS BIGINT) AS snk
              FROM graph_edges_sym e JOIN deg dd ON dd.node = e.dst
              GROUP BY 1),
       pern AS (SELECT d.node, d.k, nb.snk * 1.0 / d.k AS knn
                FROM deg d JOIN nb ON nb.node = d.node),
       byk AS (SELECT k, count(*) AS n_nodes, round(avg(knn), 4) AS knn_k
               FROM pern GROUP BY 1)
       SELECT CAST(k AS BIGINT) AS degree, CAST(n_nodes AS BIGINT) AS n_nodes,
              knn_k FROM byk WHERE n_nodes >= 5 ORDER BY 1""",
    note="average-nearest-neighbor-degree curve knn(k) (Pastor-"
    "Satorras et al.): for each degree class, the mean degree of "
    "members' neighbors — the CURVE form of g31's single-number "
    "assortativity (rising = assortative core, falling = "
    "disassortative hub-and-spoke, the shape that decides whether "
    "hub-salting or degree-bucketing is the right skew defence).  "
    "Neighbor-degree sums stay exact integers (one broadcast degree "
    "join over stationary edges, one groupBy); classes under 5 "
    "nodes suppressed for a stable curve",
)
def g87(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    es = c.graph_edges_sym()
    deg = es.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("k"))
    dd = deg.select(F.col("node").alias("dst"), F.col("k").alias("kd"))
    nb = (
        es.join(F.broadcast(dd), "dst")
        .groupBy(F.col("src").alias("node"))
        .agg(F.sum("kd").cast("long").alias("snk"))
    )
    pern = deg.join(nb, "node").select(
        "k", (F.col("snk") * 1.0 / F.col("k")).alias("knn")
    )
    return (
        pern.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_nodes"), F.round(F.avg("knn"), 4).alias("knn_k"))
        .filter(F.col("n_nodes") >= 5)
        .select(
            F.col("k").cast("long").alias("degree"),
            F.col("n_nodes").cast("long").alias("n_nodes"),
            "knn_k",
        )
        .orderBy("degree")
    )


@_g(
    "g88_relationship_entropy",
    f"""WITH {GRAPH_CTES},
       tot AS (SELECT src, CAST(sum(n_items) AS BIGINT) AS ti, count(*) AS deg
               FROM graph_edges GROUP BY 1),
       ent AS (SELECT e.src,
               -sum((e.n_items * 1.0 / t.ti) * ln(e.n_items * 1.0 / t.ti)) AS h
               FROM graph_edges e JOIN tot t ON t.src = e.src
               GROUP BY 1),
       res AS (SELECT t.src, t.deg, t.ti, round(ent.h, 4) AS entropy,
               CASE WHEN t.deg > 1
                    THEN round(ent.h / ln(t.deg * 1.0), 4) ELSE 0.0 END AS evenness
               FROM tot t JOIN ent ON ent.src = t.src)
       SELECT src, CAST(deg AS BIGINT) AS deg, ti AS total_items,
              entropy, evenness
       FROM res WHERE deg >= 5
       ORDER BY evenness, src LIMIT 50""",
    note="relationship diversification per customer: Shannon entropy "
    "of item-share across suppliers and its normalized evenness "
    "H/ln(deg) — evenness near 0 = single-supplier dependency "
    "(concentration risk, the per-node form of q110's HHI), near 1 "
    "= evenly spread.  Item counts are exact integers; shares and "
    "the entropy fold are per-node sums over <= deg terms (map-side "
    "combined groupBy over the stationary edge view), so the "
    "reduction is tiny and the 4dp rounding sits far above float "
    "drift.  The lowest-evenness list IS the procurement-risk "
    "report",
)
def g88(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    ge = c.graph_edges().select("src", "n_items")
    tot = ge.groupBy("src").agg(
        F.sum("n_items").cast("long").alias("ti"), F.count(F.lit(1)).alias("deg")
    )
    share = F.col("n_items") * 1.0 / F.col("ti")
    ent = (
        ge.join(tot, "src")
        .groupBy("src")
        .agg((-F.sum(share * F.log(share))).alias("h"))
    )
    return (
        tot.join(ent, "src")
        .filter(F.col("deg") >= 5)
        .select(
            "src",
            F.col("deg").cast("long").alias("deg"),
            F.col("ti").alias("total_items"),
            F.round("h", 4).alias("entropy"),
            F.when(
                F.col("deg") > 1, F.round(F.col("h") / F.log(F.col("deg") * 1.0), 4)
            )
            .otherwise(0.0)
            .alias("evenness"),
        )
        .orderBy("evenness", "src")
        .limit(50)
    )


def cypher_graph(c: Catalog):
    """The CypherGraph binding every declared Cypher query (and
    Engine.cypher) runs against: the FIXTURES §2 sales property graph
    as the default/:BUYS relationship (directed customer->supplier
    rollup with n_items/weight/first_ts/last_ts edge properties),
    plus the nation trade graph (>=150 shipments, the g72 view) as
    :TRADE (directed, self-loops kept — exactly the oracle ne CTE)
    and :TRADE_SYM (symmetric closure, self-loops dropped — the
    oracle es CTE).  Labels are id-prefix predicates, matching the
    node-id encoding the views fix ('c*'/'s*'/'n*')."""
    from ..graph.cypher import CypherGraph

    edges = c.graph_edges()
    verts = c.graph_nodes().select(F.col("node").alias("id"))
    rollup = (
        c.table("lineitem")
        .join(c.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.table("customer")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.table("supplier")), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.concat(F.lit("n"), F.col("c_nationkey")).alias("src"),
            F.concat(F.lit("n"), F.col("s_nationkey")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 150)
    )
    ne = rollup.select("src", "dst")
    # :TRADE_W — same lanes with the g111 integer cost (busy lanes are
    # cheap); the weighted-shortestPath relationship
    ne_w = rollup.select("src", "dst", F.expr("1000000 DIV n").alias("w"))
    ne_nl = ne.filter(F.col("src") != F.col("dst"))
    es = ne_nl.unionAll(
        ne_nl.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    return CypherGraph(
        PropertyGraph(verts, edges),
        labels={
            "Customer": lambda col: col.startswith("c"),
            "Supplier": lambda col: col.startswith("s"),
            "Nation": lambda col: col.startswith("n"),
        },
        rel_types={
            "BUYS": edges,
            # the BUYS relation partitioned by basket size into two
            # relationship TYPES (the usual graph-modeling move when a
            # property would otherwise be filtered everywhere): BULK =
            # the g04 threshold n_items >= 3, SMALL = the rest.  Same
            # property columns on both, so -[:BUYS_SMALL|BUYS_BULK]->
            # unions back to BUYS with every property intact.
            "BUYS_BULK": edges.filter(F.col("n_items") >= 3),
            "BUYS_SMALL": edges.filter(F.col("n_items") < 3),
            "TRADE": ne,
            "TRADE_SYM": es,
            "TRADE_W": ne_w,
        },
    )


def _cy(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    from ..graph.cypher import cypher

    return cypher(cypher_graph(Catalog(spark, sf_dir)), query)


@_g(
    "g89_cypher_copurchase",
    f"""WITH {GRAPH_CTES},
       pairs AS (
         SELECT e.dst AS supplier, e.weight + f.weight AS w
         FROM graph_edges e JOIN graph_edges f ON e.dst = f.dst
         WHERE e.n_items >= 3 AND f.n_items >= 3 AND e.src < f.src)
       SELECT supplier, count(*)::BIGINT AS n_pairs,
              floor(sum(w)*100 + 0.5)/100 AS vol
       FROM pairs GROUP BY 1 ORDER BY n_pairs DESC, supplier LIMIT 20""",
    note="the declarative Cypher surface (VERDICT r02's one absent user "
    "surface): co-purchase fan-in compiled from a MATCH string — two "
    ":BUYS legs into a shared :Supplier, edge-property predicates pushed "
    "below the join, implicit Cypher GROUP BY from the aggregate RETURN "
    "items.  The compiler emits the same pushdown-join-agg DataFrame "
    "plan a hand-written query would (no UDFs, no driver loops); the "
    "oracle is the equivalent SQL self-join",
)
def g89(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH (a:Customer)-[e:BUYS]->(s:Supplier)<-[f:BUYS]-(b:Customer)
           WHERE e.n_items >= 3 AND f.n_items >= 3 AND a.node < b.node
           RETURN s.node AS supplier, count(*) AS n_pairs,
                  floor(sum(e.weight + f.weight) * 100 + 0.5) / 100 AS vol
           ORDER BY n_pairs DESC, supplier LIMIT 20""",
    )


@_g(
    "g90_cypher_filter_project",
    f"""WITH {GRAPH_CTES}
       SELECT src AS customer, dst AS supplier, n_items::BIGINT AS n_items,
              weight
       FROM graph_edges WHERE n_items >= 4 AND weight > 100000
       ORDER BY weight DESC, customer, supplier LIMIT 30""",
    note="Cypher single-pattern scan: label + edge-property predicates "
    "compile to filters on the edge view scan (predicate pushdown is "
    "Catalyst's, the compiler just declares); RETURN projects bound "
    "edge properties.  Oracle is the direct view scan",
)
def g90(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH (c:Customer)-[e:BUYS]->(s:Supplier)
           WHERE e.n_items >= 4 AND e.weight > 100000
           RETURN c.node AS customer, s.node AS supplier,
                  e.n_items AS n_items, e.weight AS weight
           ORDER BY weight DESC, customer, supplier LIMIT 30""",
    )


@_g(
    "g91_cypher_varlen_reach",
    """WITH ne AS (
         SELECT 'n'||c.c_nationkey AS src, 'n'||s.s_nationkey AS dst
         FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey
         JOIN customer c ON o.o_custkey=c.c_custkey
         JOIN supplier s ON l.l_suppkey=s.s_suppkey
         GROUP BY 1,2 HAVING count(*) >= 150),
       h2 AS (SELECT a.src, b.dst FROM ne a JOIN ne b ON a.dst = b.src),
       h3 AS (SELECT a.src, b.dst FROM h2 a JOIN ne b ON a.dst = b.src),
       r AS (SELECT DISTINCT src, dst FROM (
         SELECT src, dst FROM ne UNION ALL SELECT src, dst FROM h2
         UNION ALL SELECT src, dst FROM h3))
       SELECT src, dst FROM r WHERE src <> dst ORDER BY 1, 2""",
    note="Cypher bounded variable-length pattern -[*1..3]-> on the "
    "directed nation trade graph: the compiler expands to a UNION of "
    "1/2/3-hop join chains + DISTINCT endpoint dedup — a fixed-depth "
    "join tree Catalyst plans as ordinary equi-joins, never an "
    "iterative driver loop (the cap is 6; deeper traversal routes to "
    "graph.algorithms.bfs_distances).  Oracle unrolls the same three "
    "chains explicitly",
)
def g91(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH (a:Nation)-[:TRADE*1..3]->(b:Nation)
           WHERE a.node <> b.node
           RETURN a.node AS src, b.node AS dst
           ORDER BY src, dst""",
    )


@_g(
    "g92_cypher_triangles",
    f"""WITH {_TRADE_SYM_CTES}
       SELECT a.src AS na, a.dst AS nb, b.dst AS nc
       FROM es a JOIN es b ON a.dst = b.src
       JOIN es c ON b.dst = c.src AND c.dst = a.src
       WHERE a.src < a.dst AND b.src < b.dst
       ORDER BY 1, 2, 3""",
    note="Cypher closed-triangle pattern (a)->(b)->(c)->(a) on the "
    "symmetric trade graph: the cyclic pattern's last leg shares BOTH "
    "endpoints with earlier legs, so the compiler joins it on the two "
    "bound variables at once; ordering predicates keep one canonical "
    "rotation per triangle, the standard distributed triangle "
    "enumeration shape",
)
def g92(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH (a)-[:TRADE_SYM]->(b)-[:TRADE_SYM]->(c)-[:TRADE_SYM]->(a)
           WHERE a.node < b.node AND b.node < c.node
           RETURN a.node AS na, b.node AS nb, c.node AS nc
           ORDER BY na, nb, nc""",
    )


@_g(
    "g93_cypher_implicit_groupby",
    f"""WITH {GRAPH_CTES}
       SELECT dst AS supplier, count(*)::BIGINT AS n_customers,
              sum(n_items)::BIGINT AS items,
              max(n_items)::BIGINT AS max_items,
              floor(sum(n_items)*1e4/count(*) + 0.5)/1e4 AS avg_items
       FROM graph_edges GROUP BY 1
       ORDER BY items DESC, supplier LIMIT 25""",
    note="Cypher implicit aggregation: RETURN mixes a plain item with "
    "aggregates, so the compiler groups by the non-aggregate items "
    "exactly as Cypher semantics dictate (no GROUP BY clause exists in "
    "the language); proves the agg/grouping classification and the "
    "RETURN-order restoration.  Aggregates over n_items (exact "
    "integers) — the view's money weight is round(sum,2) in both "
    "engines, which DIVERGES by a cent on 83 of 48.5k sf0.01 edges "
    "(4-dp half boundaries, all n_items<=2), so an all-edge weight "
    "sum is not oracle-stable; g89/g90 sum weight safely behind their "
    "n_items>=3 predicates (zero divergent edges survive)",
)
def g93(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH (c:Customer)-[e:BUYS]->(s:Supplier)
           RETURN s.node AS supplier, count(*) AS n_customers,
                  sum(e.n_items) AS items, max(e.n_items) AS max_items,
                  floor(sum(e.n_items) * 1e4 / count(*) + 0.5) / 1e4
                    AS avg_items
           ORDER BY items DESC, supplier LIMIT 25""",
    )


@_g(
    "g98_articulation_points",
    f"""WITH RECURSIVE {_TRADE_SYM_CTES},
       nodes AS (SELECT DISTINCT src AS v FROM es),
       r(a, node) AS (
         SELECT v, v FROM nodes
         UNION
         SELECT r.a, e.dst FROM r JOIN es e ON e.src = r.node),
       comp AS (SELECT a AS v, min(node) AS lbl FROM r GROUP BY 1),
       csize AS (SELECT lbl, count(*) AS n FROM comp GROUP BY 1),
       seed AS (SELECT c1.v AS x, min(c2.v) AS s
                FROM comp c1 JOIN comp c2 ON c1.lbl = c2.lbl AND c2.v <> c1.v
                GROUP BY 1),
       rx(x, node) AS (
         SELECT x, s FROM seed
         UNION
         SELECT rx.x, e.dst FROM rx JOIN es e ON e.src = rx.node
         WHERE e.src <> rx.x AND e.dst <> rx.x),
       reach AS (SELECT x, count(DISTINCT node) AS k FROM rx GROUP BY 1)
       SELECT c.v AS node,
              CASE WHEN cs.n - 1 > coalesce(reach.k, 0) THEN 1 ELSE 0 END
                AS is_cut
       FROM comp c JOIN csize cs ON cs.lbl = c.lbl
       LEFT JOIN reach ON reach.x = c.v
       ORDER BY 1""",
    note="exact articulation points (cut vertices), the vertex dual of "
    "g78's bridges: x is a cut vertex iff the rest of its component is "
    "no longer mutually reachable once every edge touching x is "
    "removed — tested by |V| SIMULTANEOUS excluded-vertex BFS "
    "instances riding one frontier loop to fixpoint (state (x, node), "
    "seeded at the min remaining node of x's component), then "
    "reached-count vs component-size-minus-one.  Same state-ceiling "
    "caveat as g78: exact at rolled-up-view scale; at raw scale the "
    "honest substitute is biconnected-component decomposition.  "
    "Endpoints of g78 bridges with degree > 1 are necessarily cut "
    "vertices — the two queries cross-certify (tested).  Oracle "
    "replays the same excluded-vertex reachability as recursive CTEs",
)
def g98(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.algorithms import connected_components

    c = Catalog(spark, sf_dir)
    ne = (
        c.table("lineitem")
        .join(c.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.table("customer")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.table("supplier")), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.concat(F.lit("n"), F.col("c_nationkey")).alias("src"),
            F.concat(F.lit("n"), F.col("s_nationkey")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter((F.col("n") >= 150) & (F.col("src") != F.col("dst")))
        .select("src", "dst")
    )
    es = (
        ne.unionAll(ne.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    comp = connected_components(
        PropertyGraph(es.select(F.col("src").alias("id")).distinct(), es)
    ).localCheckpoint(eager=True)
    csize = comp.groupBy("component").agg(F.count(F.lit(1)).alias("n"))
    c2 = comp.select(F.col("node").alias("o"), F.col("component").alias("c2"))
    seed = (
        comp.join(c2, (F.col("component") == F.col("c2")) & (F.col("o") != F.col("node")))
        .groupBy(F.col("node").alias("x"))
        .agg(F.min("o").alias("s"))
    )
    visited = seed.select("x", F.col("s").alias("node")).localCheckpoint(eager=True)
    frontier = visited
    # fixpoint loop, one frontier for ALL |V| excluded-vertex instances
    while True:
        nxt = (
            frontier.join(es, frontier.node == es.src)
            .filter((F.col("src") != F.col("x")) & (F.col("dst") != F.col("x")))
            .select("x", F.col("dst").alias("node"))
            .distinct()
        )
        vis = visited.select(F.col("x").alias("vx"), F.col("node").alias("vn"))
        frontier = nxt.join(
            vis, (nxt.x == vis.vx) & (nxt.node == vis.vn), "left_anti"
        ).localCheckpoint(eager=True)
        if not frontier.take(1):
            break
        visited = visited.unionByName(frontier).localCheckpoint(eager=True)
    reach = visited.groupBy("x").agg(F.count(F.lit(1)).alias("k"))
    return (
        comp.join(csize, "component")
        .join(reach, F.col("node") == F.col("x"), "left")
        .select(
            "node",
            F.when(F.col("n") - 1 > F.coalesce(F.col("k"), F.lit(0)), F.lit(1))
            .otherwise(F.lit(0))
            .alias("is_cut"),
        )
        .orderBy("node")
    )


@_g(
    "g99_rich_club",
    f"""WITH {_TRADE_SYM_CTES},
       deg AS (SELECT src AS v, count(*) AS d FROM es GROUP BY 1),
       eh AS (SELECT e.src AS u, e.dst AS w FROM es e WHERE e.src < e.dst),
       emin AS (SELECT least(du.d, dw.d) AS m
                FROM eh JOIN deg du ON du.v = eh.u
                JOIN deg dw ON dw.v = eh.w),
       ks AS (SELECT DISTINCT d AS k FROM deg),
       nk AS (SELECT ks.k, count(*) AS n FROM ks
              JOIN deg ON deg.d > ks.k GROUP BY 1),
       ek AS (SELECT ks.k, count(m) AS e FROM ks
              LEFT JOIN emin ON emin.m > ks.k GROUP BY 1)
       SELECT nk.k::BIGINT AS k, nk.n::BIGINT AS n_nodes,
              coalesce(ek.e, 0)::BIGINT AS n_edges,
              floor(coalesce(ek.e, 0)*2e4/(nk.n*(nk.n - 1)) + 0.5)/1e4
                AS phi
       FROM nk LEFT JOIN ek ON ek.k = nk.k
       WHERE nk.n >= 2 ORDER BY 1""",
    note="rich-club coefficient phi(k) = 2*E_k / (N_k*(N_k-1)) on the "
    "symmetric trade graph, evaluated at every distinct degree value k "
    "(N_k = nodes with degree > k, E_k = undirected edges between "
    "them): do high-degree trade hubs preferentially connect to each "
    "other?  Computed WITHOUT per-k subgraphs: each undirected edge "
    "carries min(deg(u), deg(w)) once, then E_k is a suffix count via "
    "a non-equi join against the (tiny, broadcast) k spine, N_k "
    "likewise from the degree histogram — two small joins instead of "
    "max-degree subgraph rebuilds.  At raw scale the spine stays tiny "
    "(distinct degree values), the edge pass stays single; exact "
    "integer counts, floor-form 4-dp ratio",
)
def g99(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    ne = (
        c.table("lineitem")
        .join(c.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.table("customer")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.table("supplier")), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.concat(F.lit("n"), F.col("c_nationkey")).alias("src"),
            F.concat(F.lit("n"), F.col("s_nationkey")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter((F.col("n") >= 150) & (F.col("src") != F.col("dst")))
        .select("src", "dst")
    )
    es = (
        ne.unionAll(ne.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = es.groupBy(F.col("src").alias("v")).agg(F.count(F.lit(1)).alias("d"))
    eh = es.filter(F.col("src") < F.col("dst"))
    du = deg.select(F.col("v").alias("u"), F.col("d").alias("du"))
    dw = deg.select(F.col("v").alias("w"), F.col("d").alias("dw"))
    emin = (
        eh.select(F.col("src").alias("u"), F.col("dst").alias("w"))
        .join(F.broadcast(du), "u")
        .join(F.broadcast(dw), "w")
        .select(F.least("du", "dw").alias("m"))
    )
    ks = deg.select(F.col("d").alias("k")).distinct()
    nk = (
        F.broadcast(ks)
        .join(deg, deg.d > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ek = (
        F.broadcast(ks)
        .join(emin, emin.m > F.col("k"), "left")
        .groupBy("k")
        .agg(F.count("m").alias("e"))
    )
    return (
        nk.join(ek, "k", "left")
        .filter(F.col("n") >= 2)
        .select(
            F.col("k").cast("long").alias("k"),
            F.col("n").cast("long").alias("n_nodes"),
            F.coalesce(F.col("e"), F.lit(0)).cast("long").alias("n_edges"),
            (
                F.floor(
                    F.coalesce(F.col("e"), F.lit(0)) * 2e4 / (F.col("n") * (F.col("n") - 1))
                    + 0.5
                )
                / 1e4
            ).alias("phi"),
        )
        .orderBy("k")
    )


@_g(
    "g94_cypher_optional_match",
    f"""WITH {GRAPH_CTES},
       base AS (SELECT src AS customer, dst AS supplier FROM graph_edges
                WHERE n_items >= 4)
       SELECT b.customer, b.supplier,
              count(f.n_items)::BIGINT AS n_heavy_peers
       FROM base b LEFT JOIN graph_edges f
         ON f.dst = b.supplier AND f.n_items >= 3 AND f.src <> b.customer
       GROUP BY 1, 2 ORDER BY 1, 2""",
    note="Cypher OPTIONAL MATCH compiled to a LEFT OUTER join: for every "
    ">=4-item purchase edge, count the supplier's OTHER >=3-item "
    "customers — suppliers with none keep their row (null-extended, "
    "count skips nulls, exactly openCypher aggregation semantics).  The "
    "optional block's WHERE references the outer variable c, so it "
    "rides the join condition (failing rows null-extend rather than "
    "drop) — the semantic distinction a naive post-join filter gets "
    "wrong",
)
def g94(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH (c:Customer)-[e:BUYS]->(s:Supplier) WHERE e.n_items >= 4
           OPTIONAL MATCH (s)<-[f:BUYS]-(o:Customer)
             WHERE f.n_items >= 3 AND o.node <> c.node
           RETURN c.node AS customer, s.node AS supplier,
                  count(f.n_items) AS n_heavy_peers
           ORDER BY customer, supplier""",
    )


@_g(
    "g95_cypher_property_map",
    f"""WITH {GRAPH_CTES}
       SELECT dst AS supplier FROM graph_edges
       WHERE src = 'c1' AND n_items = 2 ORDER BY 1""",
    note="Cypher inline property maps: (c {node: 'c1'}) pins the node "
    "id and [e:BUYS {n_items: 2}] pins an edge property, both compiled "
    "to equality filters attached to the pattern leg before any join "
    "(Catalyst sees them at the scan).  The Neo4j-style shorthand for "
    "the most common point-lookup pattern",
)
def g95(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH (c:Customer {node: 'c1'})-[e:BUYS {n_items: 2}]->(s:Supplier)
           RETURN s.node AS supplier ORDER BY supplier""",
    )


@_g(
    "g96_cypher_with_having",
    f"""WITH {GRAPH_CTES}
       SELECT dst AS supplier, count(*)::BIGINT AS n_customers,
              sum(n_items)::BIGINT AS items
       FROM graph_edges GROUP BY 1 HAVING count(*) >= 520 ORDER BY 1""",
    note="Cypher WITH stage + WHERE over the aggregate = HAVING: the "
    "compiler projects/aggregates mid-query, filters the PROJECTED "
    "rows, and RETURN operates on the WITH aliases.  Compiles to the "
    "same agg+filter plan the SQL HAVING produces (the filter sits "
    "above the partial/final aggregate, after map-side combine)",
)
def g96(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH (c:Customer)-[e:BUYS]->(s:Supplier)
           WITH s.node AS supplier, count(*) AS n_customers,
                sum(e.n_items) AS items
           WHERE n_customers >= 520
           RETURN supplier, n_customers, items ORDER BY supplier""",
    )


@_g(
    "g97_cypher_with_reagg",
    f"""WITH {GRAPH_CTES},
       per_c AS (SELECT src, count(*) AS n_suppliers FROM graph_edges
                 GROUP BY 1)
       SELECT n_suppliers::BIGINT AS n_suppliers,
              count(*)::BIGINT AS n_customers
       FROM per_c GROUP BY 1 ORDER BY 1""",
    note="Cypher two-level aggregation through WITH: per-customer "
    "supplier counts re-aggregated into the degree distribution — the "
    "canonical 'aggregate of an aggregate' Cypher pipeline, two "
    "map-side-combined shuffles, no driver round-trip between stages",
)
def g97(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH (c:Customer)-[e:BUYS]->(s:Supplier)
           WITH c.node AS customer, count(*) AS n_suppliers
           RETURN n_suppliers, count(*) AS n_customers
           ORDER BY n_suppliers""",
    )


@_g(
    "g100_hits",
    f"""WITH {GRAPH_CTES},
       a1 AS (SELECT dst AS node, count(*)::BIGINT AS s FROM graph_edges GROUP BY 1),
       h1 AS (SELECT e.src AS node, sum(a.s)::BIGINT AS s
              FROM graph_edges e JOIN a1 a ON a.node = e.dst GROUP BY 1),
       a2 AS (SELECT e.dst AS node, sum(h.s)::BIGINT AS s
              FROM graph_edges e JOIN h1 h ON h.node = e.src GROUP BY 1),
       h2 AS (SELECT e.src AS node, sum(a.s)::BIGINT AS s
              FROM graph_edges e JOIN a2 a ON a.node = e.dst GROUP BY 1),
       u AS (SELECT 'auth' AS side, a2.node, a1.s AS s1, a2.s AS s2
             FROM a2 JOIN a1 USING (node)
             UNION ALL
             SELECT 'hub', h2.node, h1.s, h2.s FROM h2 JOIN h1 USING (node))
       SELECT side, node, s1, s2 FROM u
       QUALIFY row_number() OVER (PARTITION BY side ORDER BY s2 DESC, node) <= 15
       ORDER BY side, s2 DESC, node""",
    note="HITS hubs & authorities (Kleinberg) on the directed bipartite "
    "purchase graph: a <- A^T h, h <- A a, two full alternating rounds "
    "kept UN-normalized so every score is an exact BIGINT walk count "
    "(a2(s) = #(c->s' -> c' -> s) 3-step alternating paths into s) — "
    "float normalization order can never perturb the top-15 cut.  "
    "Distinct from g81 eigenvector (sym graph, single score) and g73 "
    "Katz (additive floor): HITS alternates DIRECTION, so hubs are "
    "customers who buy from well-bought suppliers and authorities are "
    "suppliers bought by well-connected customers.  Each half-round is "
    "one broadcast of the |V|-sized score table into the stationary "
    "edge list + one map-side-combined shuffle — the rolled-up-view "
    "regime every other G-iteration uses",
)
def g100(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.algorithms import hits_counts

    c = Catalog(spark, sf_dir)
    scores = hits_counts(c.graph_edges().select("src", "dst"), rounds=2)
    w = Window.partitionBy("side").orderBy(F.col("s2").desc(), "node")
    return (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 15)
        .select(
            "side",
            "node",
            F.col("s1").cast("long").alias("s1"),
            F.col("s2").cast("long").alias("s2"),
        )
        .orderBy("side", F.col("s2").desc(), "node")
    )


def _cascade_oracle(rounds: int = 4) -> str:
    parts = [
        """deg AS (SELECT src AS node, count(*) AS d FROM graph_edges_sym GROUP BY 1),
act0 AS (SELECT node, 0 AS r FROM graph_nodes
         WHERE substring(md5(node), 1, 1) = '0')"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""new{i} AS (SELECT x.node, {i} AS r FROM (
    SELECT e.dst AS node, count(*) AS na FROM graph_edges_sym e
    JOIN act{i - 1} a ON a.node = e.src
    WHERE e.dst NOT IN (SELECT node FROM act{i - 1}) GROUP BY 1) x
  JOIN deg ON deg.node = x.node WHERE 2 * x.na >= deg.d),
act{i} AS (SELECT * FROM act{i - 1} UNION ALL SELECT * FROM new{i})"""
        )
    chain = ",\n".join(parts)
    return (
        f"WITH {GRAPH_CTES},\n{chain}\n"
        f"SELECT r, substring(node, 1, 1) AS side, count(*)::BIGINT AS n "
        f"FROM act{rounds} GROUP BY 1, 2 ORDER BY 1, 2"
    )


@_g(
    "g101_threshold_cascade",
    _mat(_cascade_oracle()),
    note="linear-threshold influence cascade (Granovetter/Kempe) on the "
    "sym graph, 4 synchronous rounds: seeds are the deterministic "
    "md5-first-hex-digit='0' 1/16 slice of nodes; an inactive node "
    "activates when at least HALF its neighbors are active, checked as "
    "the exact integer comparison 2*|N(v) ∩ active| >= deg(v) — no "
    "float threshold to disagree on.  BOTH engines run exactly 4 "
    "rounds (declared horizon, not a fixpoint race — the g78 lesson).  "
    "Per round: one shuffle (active-neighbor count per node) + one "
    "broadcast anti-join against the active set; the diffusion / "
    "viral-adoption primitive the G-suite lacked",
)
def g101(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.algorithms import threshold_cascade

    c = Catalog(spark, sf_dir)
    seeds = c.graph_nodes().filter(F.substring(F.md5("node"), 1, 1) == "0")
    act = threshold_cascade(c.graph_edges_sym(), seeds, rounds=4)
    return (
        act.groupBy("r", F.substring("node", 1, 1).alias("side"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("r", "side")
    )


def _mis_oracle(rounds: int = 3) -> str:
    parts = [
        """und0 AS (SELECT node, md5(node) AS p FROM graph_nodes),
mis0 AS (SELECT node FROM graph_nodes WHERE false)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""nm{i} AS (SELECT e.src AS node, min(u2.p) AS mn
  FROM graph_edges_sym e
  JOIN und{i - 1} u1 ON u1.node = e.src
  JOIN und{i - 1} u2 ON u2.node = e.dst GROUP BY 1),
win{i} AS (SELECT u.node FROM und{i - 1} u LEFT JOIN nm{i} n ON n.node = u.node
  WHERE n.mn IS NULL OR u.p < n.mn),
out{i} AS (SELECT DISTINCT e.dst AS node FROM graph_edges_sym e
  JOIN win{i} w ON w.node = e.src
  JOIN und{i - 1} u ON u.node = e.dst),
mis{i} AS (SELECT node FROM mis{i - 1} UNION ALL SELECT node FROM win{i}),
und{i} AS (SELECT node, p FROM und{i - 1}
  WHERE node NOT IN (SELECT node FROM win{i})
    AND node NOT IN (SELECT node FROM out{i}))"""
        )
    chain = ",\n".join(parts)
    return (
        f"WITH {GRAPH_CTES},\n{chain}\n"
        f"""SELECT n.node,
       CASE WHEN n.node IN (SELECT node FROM mis{rounds}) THEN 'mis'
            WHEN n.node IN (SELECT node FROM und{rounds}) THEN 'undecided'
            ELSE 'out' END AS status
FROM graph_nodes n ORDER BY 1"""
    )


@_g(
    "g102_luby_mis",
    _mat(_mis_oracle()),
    note="Luby-style maximal-independent-set rounds on the sym graph "
    "with a FIXED deterministic priority p(v) = md5(v): per round, an "
    "undecided node joins the MIS when its priority beats every "
    "undecided neighbor's (adjacent winners are impossible — strict "
    "order), its neighbors drop out, 3 declared rounds in both engines "
    "(undecided survivors are reported as such, so a fixed horizon "
    "cannot diverge).  The symmetry-breaking primitive behind parallel "
    "coloring/matching/scheduling; hex-string priorities compare "
    "identically in Spark and DuckDB and are tie-free on distinct "
    "nodes.  Per round: one min-combine shuffle over edges with both "
    "endpoints undecided + two broadcast anti-joins",
)
def g102(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.algorithms import luby_mis

    c = Catalog(spark, sf_dir)
    return luby_mis(c.graph_nodes(), c.graph_edges_sym(), rounds=3).orderBy("node")


@_g(
    "g104_resource_allocation",
    f"""WITH {GRAPH_CTES},
       e AS (SELECT DISTINCT src AS cust, dst AS supp FROM graph_edges
             WHERE n_items >= 2),
       deg AS (SELECT cust, count(*) AS d FROM e GROUP BY 1),
       pairs AS (SELECT a.supp AS a, b.supp AS b, a.cust AS z
                 FROM e a JOIN e b ON a.cust = b.cust AND a.supp < b.supp)
       SELECT p.a, p.b, count(*)::BIGINT AS common,
              sum(1000000000000 // d.d)::BIGINT AS ra_x1e12
       FROM pairs p JOIN deg d ON d.cust = p.z
       GROUP BY 1, 2 HAVING count(*) >= 2
       ORDER BY ra_x1e12 DESC, p.a, p.b LIMIT 50""",
    note="resource-allocation link-prediction index between suppliers "
    "(Zhou/Lu/Zhang): sum over common customers z of 1/deg(z) — the "
    "stronger-decay sibling of g27's Adamic-Adar (1/d vs 1/ln d), "
    "empirically the best of the local similarity indices on dense "
    "graphs.  EXACT INTEGER form: each term is the integer division "
    "1e12 DIV deg(z), so the sum and the top-50 ordering are BIGINT "
    "— no float accumulation anywhere, unlike AA whose ln() forces "
    "6dp rounding.  Same inverted-index self-join shape as g23/g27 "
    "(candidates only from shared-neighbor equi-join, never a cross "
    "join), degree frame broadcast; hub customers fan out the pair "
    "join, which is exactly the skew AQE handles (SCALE.md graph "
    "family)",
)
def g104(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        Catalog(spark, sf_dir)
        .graph_edges()
        .filter(F.col("n_items") >= 2)
        .select(F.col("src").alias("cust"), F.col("dst").alias("supp"))
        .distinct()
    )
    deg = e.groupBy("cust").agg(F.count(F.lit(1)).alias("d"))
    a = e.alias("a")
    b = e.alias("b")
    pairs = a.join(
        b, (F.col("a.cust") == F.col("b.cust")) & (F.col("a.supp") < F.col("b.supp"))
    ).select(
        F.col("a.supp").alias("a"), F.col("b.supp").alias("b"), F.col("a.cust").alias("z")
    )
    return (
        pairs.join(F.broadcast(deg), pairs.z == deg.cust)
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.sum(F.expr("1000000000000 DIV d")).alias("ra_x1e12"),
        )
        .filter(F.col("common") >= 2)
        .select(
            "a",
            "b",
            F.col("common").cast("long").alias("common"),
            F.col("ra_x1e12").cast("long").alias("ra_x1e12"),
        )
        .orderBy(F.col("ra_x1e12").desc(), "a", "b")
        .limit(50)
    )


@_g(
    "g105_cypher_shortest_path",
    f"""WITH RECURSIVE {_TRADE_SYM_CTES},
       r(a, b, len) AS (
         SELECT src, dst, 1 FROM es
         UNION
         SELECT r.a, e.dst, r.len + 1 FROM r JOIN es e ON e.src = r.b
         WHERE r.len < 6)
       SELECT a AS src_nation, b AS dst_nation, min(len)::INT AS hops
       FROM r GROUP BY 1, 2 ORDER BY 1, 2""",
    note="Cypher shortestPath() — the one openCypher verb the subset "
    "previously refused: `MATCH p = shortestPath((a:Nation)-"
    "[:TRADE_SYM*]->(b:Nation)) RETURN a, b, length(p)` compiles to "
    "a multi-source semi-naive BFS (seed set = filter-pushed "
    "sources, per-level distinct + anti-join against reached pairs — "
    "first reach IS the shortest length, the g03 kernel shape with "
    "per-level lineage truncation), binding length(p)/p.len to the "
    "hop count.  Bare * defaults to 1..6; explicit *min..max "
    "supported; combinable with further MATCH blocks via shared "
    "endpoints.  Oracle: bounded recursive closure + min(len).  "
    "All-pairs here because the nation graph is 25 nodes; an "
    "anchored {node: lit} source prunes the seed frame to one row "
    "BEFORE the walk — the pushdown that makes this shape usable on "
    "big graphs",
)
def g105(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH p = shortestPath((a:Nation)-[:TRADE_SYM*]->(b:Nation))
           RETURN a AS src_nation, b AS dst_nation, length(p) AS hops
           ORDER BY src_nation, dst_nation""",
    )


@_g(
    "g106_bowtie_structure",
    """WITH RECURSIVE ne AS (
         SELECT 'n'||c.c_nationkey AS src, 'n'||s.s_nationkey AS dst
         FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey
         JOIN customer c ON o.o_custkey=c.c_custkey
         JOIN supplier s ON l.l_suppkey=s.s_suppkey
         GROUP BY 1,2 HAVING count(*) >= 150),
       nodes AS (SELECT DISTINCT node FROM (
         SELECT src AS node FROM ne UNION ALL SELECT dst FROM ne)),
       reach(a, b) AS (
         SELECT src, dst FROM ne
         UNION
         SELECT r.a, e.dst FROM reach r JOIN ne e ON r.b = e.src),
       mutual AS (SELECT r1.a, r1.b FROM reach r1
                  JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a),
       comp AS (SELECT n.node,
                least(n.node, coalesce(min(m.b), n.node)) AS lbl
                FROM nodes n LEFT JOIN mutual m ON m.a = n.node GROUP BY 1),
       core AS (SELECT lbl FROM (SELECT lbl, count(*) AS c FROM comp
                GROUP BY 1 ORDER BY c DESC, lbl LIMIT 1)),
       core_nodes AS (SELECT node FROM comp WHERE lbl = (SELECT lbl FROM core)),
       to_core AS (SELECT DISTINCT r.a AS node FROM reach r
                   WHERE r.b IN (SELECT node FROM core_nodes)),
       from_core AS (SELECT DISTINCT r.b AS node FROM reach r
                     WHERE r.a IN (SELECT node FROM core_nodes))
       SELECT n.node,
         CASE WHEN n.node IN (SELECT node FROM core_nodes) THEN 'core'
              WHEN n.node IN (SELECT node FROM to_core) THEN 'in'
              WHEN n.node IN (SELECT node FROM from_core) THEN 'out'
              ELSE 'other' END AS cls
       FROM nodes n ORDER BY n.node""",
    note="Broder bow-tie decomposition of the directed nation trade "
    "graph (the classic web-graph macrostructure census): CORE = "
    "largest SCC (ties to min label), IN = reaches the core without "
    "belonging, OUT = reached from the core, OTHER = tendrils/"
    "disconnected.  Spark side composes three proven kernels: the "
    "FW-BW SCC (g17), a component-size argmax (exact integer, tie on "
    "label), and two membership frontier closures (forward and "
    "transposed BFS from the core set — fixpoint loops over distinct "
    "frontiers, the g03 shape).  Oracle = recursive closure + mutual "
    "reachability.  The structure read that tells you whether a "
    "supply/link graph is one navigable continent or fractured — at "
    "scale each piece is the already-benchmarked distributed kernel",
)
def g106(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.algorithms import strongly_connected_components

    c = Catalog(spark, sf_dir)
    li = c.table("lineitem").select("l_orderkey", "l_suppkey")
    o = c.table("orders").select("o_orderkey", "o_custkey")
    cu = c.table("customer").select("c_custkey", "c_nationkey")
    su = c.table("supplier").select("s_suppkey", "s_nationkey")
    ne = (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cu), F.col("o_custkey") == cu.c_custkey)
        .join(F.broadcast(su), F.col("l_suppkey") == su.s_suppkey)
        .groupBy(
            F.concat(F.lit("n"), F.col("c_nationkey").cast("string")).alias("src"),
            F.concat(F.lit("n"), F.col("s_nationkey").cast("string")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 150)
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    nodes = (
        ne.select(F.col("src").alias("id"))
        .union(ne.select(F.col("dst").alias("id")))
        .distinct()
    )
    if not ne.take(1):  # sf0.001's trade graph has no >=150 pair
        return spark.createDataFrame([], "node string, cls string")
    comp = strongly_connected_components(PropertyGraph(nodes, ne))
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("c"))
    core_lbl = sizes.orderBy(F.col("c").desc(), "component").take(1)[0]["component"]
    core = comp.filter(F.col("component") == core_lbl).select(
        F.col("node").alias("id")
    )

    def closure(edges: DataFrame, seed: DataFrame) -> DataFrame:
        """Nodes with a >=1-hop path INTO the seed set along `edges`
        (pass transposed edges for reached-from)."""
        reached = seed.localCheckpoint(eager=True)
        frontier = reached
        while True:
            nxt = (
                edges.join(frontier, edges.dst == frontier.id)
                .select(F.col("src").alias("id"))
                .distinct()
                .join(reached, "id", "left_anti")
                .localCheckpoint(eager=True)
            )
            if not nxt.take(1):
                return reached
            reached = reached.unionByName(nxt).localCheckpoint(eager=True)
            frontier = nxt

    to_core = closure(ne, core)
    from_core = closure(ne.select(F.col("dst").alias("src"), F.col("src").alias("dst")), core)
    cls = (
        nodes.join(core.withColumn("__c", F.lit(1)), "id", "left")
        .join(to_core.select("id").withColumn("__i", F.lit(1)), "id", "left")
        .join(from_core.select("id").withColumn("__o", F.lit(1)), "id", "left")
        .select(
            F.col("id").alias("node"),
            F.when(F.col("__c").isNotNull(), "core")
            .when(F.col("__i").isNotNull(), "in")
            .when(F.col("__o").isNotNull(), "out")
            .otherwise("other")
            .alias("cls"),
        )
    )
    return cls.orderBy("node")


@_g(
    "g107_negative_sampling",
    f"""WITH {GRAPH_CTES},
       e AS (SELECT DISTINCT src, dst FROM graph_edges WHERE n_items >= 2),
       srcs AS (SELECT DISTINCT src FROM e),
       dsts AS (SELECT DISTINCT dst FROM e),
       db AS (SELECT dst,
         ('0x' || substring(md5(dst::VARCHAR), 1, 15))::BIGINT AS hd
         FROM dsts),
       db2 AS (SELECT dst, hd, hd % 64 AS b FROM db),
       rkb AS (SELECT dst, b,
         row_number() OVER (PARTITION BY b ORDER BY hd, dst) AS rb
         FROM db2),
       offs AS (SELECT b, count(*) AS c FROM db2 GROUP BY 1),
       offs2 AS (SELECT b, coalesce(sum(c) OVER (ORDER BY b
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
         FROM offs),
       grank AS (SELECT r.dst, (o.off + r.rb)::BIGINT AS grank
         FROM rkb r JOIN offs2 o ON r.b = o.b),
       nn AS (SELECT count(*) AS n FROM dsts),
       probes AS (SELECT s.src,
         ('0x' || substring(md5(s.src || '#' || t.i), 1, 15))::BIGINT AS hp
         FROM srcs s CROSS JOIN generate_series(0, 7) AS t(i)),
       cand AS (SELECT DISTINCT p.src, g.dst
         FROM probes p CROSS JOIN nn
         JOIN grank g ON g.grank = (p.hp % nn.n) + 1),
       neg AS (SELECT c.src, c.dst FROM cand c
         WHERE NOT EXISTS (SELECT 1 FROM e
                           WHERE e.src = c.src AND e.dst = c.dst)),
       rk AS (SELECT src, dst,
         ('0x' || substring(md5(src || '|' || dst), 1, 15))::BIGINT AS hv,
         row_number() OVER (PARTITION BY src ORDER BY
           ('0x' || substring(md5(src || '|' || dst), 1, 15))::BIGINT,
           dst) AS r
         FROM neg)
       SELECT src, dst AS neg, r::INT AS neg_rank, hv
       FROM rk WHERE r <= 3 ORDER BY src, neg_rank""",
    note="deterministic negative sampling for link-prediction training "
    "data: up to 3 non-edges per customer from a BOUNDED O(|src|*m) "
    "probe pool — every dst gets a global md5 rank (row_number within "
    "a 64-way hash bucket + broadcast cumulative offsets, so NO "
    "single-partition global sort over |dst|), every src emits m=8 "
    "probes md5(src||'#'||i) % n_dst that equi-join dst ranks; "
    "candidates that are real edges anti-join away, survivors rank "
    "per src by md5(src||dst).  The r3 shape enumerated |src|x|dst| "
    "then kept 13% — a 10^12-pair scan on a 10^6x10^6 rolled-up "
    "graph; this one materializes exactly 8 rows per src no matter "
    "how large the dst side grows.  NO RNG: md5 order is the "
    "l18/l77 reproducibility idiom; probes that collide or hit a "
    "real edge simply drop, identically in both engines.  All "
    "integer carriers, layout-proof",
)
def g107(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import bounded_negative_samples

    e = (
        Catalog(spark, sf_dir)
        .graph_edges()
        .filter(F.col("n_items") >= 2)
        .select("src", "dst")
        .distinct()
    )
    return bounded_negative_samples(e, k=3, m=8, buckets=64).orderBy(
        "src", "neg_rank"
    )


@_g(
    "g108_simrank",
    f"""WITH {GRAPH_CTES},
       e AS (SELECT DISTINCT src AS c, dst AS s FROM graph_edges
             WHERE n_items >= 3),
       dc AS (SELECT c, count(*) AS d FROM e GROUP BY 1),
       ds AS (SELECT s, count(*) AS d FROM e GROUP BY 1),
       sp AS (SELECT a.s AS s1, b.s AS s2, count(*) AS i
              FROM e a JOIN e b ON a.c = b.c AND a.s < b.s GROUP BY 1, 2),
       s1sym AS (
         SELECT sp.s1, sp.s2,
           CAST(floor(1e6 * 0.8 * sp.i / (d1.d * d2.d) + 0.5) AS BIGINT) AS v
         FROM sp JOIN ds d1 ON d1.s = sp.s1 JOIN ds d2 ON d2.s = sp.s2
         UNION ALL
         SELECT sp.s2, sp.s1,
           CAST(floor(1e6 * 0.8 * sp.i / (d1.d * d2.d) + 0.5) AS BIGINT)
         FROM sp JOIN ds d1 ON d1.s = sp.s1 JOIN ds d2 ON d2.s = sp.s2
         UNION ALL
         SELECT s, s, 1000000 FROM ds),
       sub AS (SELECT c, s FROM e
               WHERE CAST(substring(c, 2) AS BIGINT) < 300),
       pair2 AS (SELECT ea.c AS a, eb.c AS b, sum(m.v) AS num
         FROM sub ea JOIN s1sym m ON m.s1 = ea.s
         JOIN sub eb ON eb.s = m.s2 AND ea.c < eb.c
         GROUP BY 1, 2),
       res AS (SELECT p.a, p.b, p.num,
         0.8 * p.num / (1e6 * da.d * db.d) AS s2_raw
         FROM pair2 p JOIN dc da ON da.c = p.a JOIN dc db ON db.c = p.b)
       SELECT a, b, num::BIGINT AS num, round(s2_raw, 6) AS simrank2
       FROM res
       QUALIFY row_number() OVER (ORDER BY s2_raw DESC, a, b) <= 20
       ORDER BY s2_raw DESC, a, b""",
    note="bipartite SimRank at CUSTOMER scale — g80 is its sibling and "
    "runs exact 3-round SimRank on the 25-node nation rollup with "
    "full O(V^2) float pair state; this entry is what replaces that "
    "shape when V is thousands+: candidates only from shared-"
    "neighbor equi-joins, output anchored to a source set, and the "
    "float iteration hazard removed by an integer carrier.  "
    "SimRank (Jeh & Widom) after 2 bipartite iterations, C=0.8: "
    "supplier-pair similarities s1 from shared customers (iteration "
    "1 collapses to C·|common|/(d·d') because s0 is the identity), "
    "then customer pairs via the 3-hop a—s—s'—b join against the s1 "
    "frame + its diagonal — RECURSIVE structural similarity the "
    "one-hop indices (g27 AA, g104 RA) cannot express ('my suppliers "
    "are SIMILAR to yours' vs 'the same as yours').  Determinism is "
    "the l92/l93 protocol: s1 is floored x1e6 to BIGINT, so the "
    "iteration-2 sum is an INTEGER sum and the final score one fixed "
    "double expression; top-20 ordered on that single-expression "
    "value with (a,b) ties.  Scale: candidate pairs only from "
    "shared-neighbor equi-joins (never cross), output side capped "
    "to an anchor customer set; per-iteration cost is degree-bounded "
    "exactly like the benchmarked triangle/k-truss joins",
)
def g108(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        Catalog(spark, sf_dir)
        .graph_edges()
        .filter(F.col("n_items") >= 3)
        .select(F.col("src").alias("c"), F.col("dst").alias("s"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    dc = e.groupBy("c").agg(F.count(F.lit(1)).alias("d"))
    ds = e.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
    a = e.alias("a")
    b = e.alias("b")
    sp = (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    d1 = ds.select(F.col("s").alias("s1"), F.col("d").alias("d1"))
    d2 = ds.select(F.col("s").alias("s2"), F.col("d").alias("d2"))
    spv = (
        sp.join(F.broadcast(d1), "s1")
        .join(F.broadcast(d2), "s2")
        .select(
            "s1",
            "s2",
            F.floor(F.lit(1e6) * 0.8 * F.col("i") / (F.col("d1") * F.col("d2")) + 0.5)
            .cast("long")
            .alias("v"),
        )
    )
    s1sym = (
        spv.unionByName(
            spv.select(F.col("s2").alias("s1"), F.col("s1").alias("s2"), "v")
        )
        .unionByName(
            ds.select(F.col("s").alias("s1"), F.col("s").alias("s2"), F.lit(1000000).cast("long").alias("v"))
        )
    )
    sub = e.filter(F.substring("c", 2, 20).cast("long") < 300)
    ea = sub.select(F.col("c").alias("pa"), F.col("s").alias("s1"))
    eb = sub.select(F.col("c").alias("pb"), F.col("s").alias("s2"))
    pair2 = (
        ea.join(s1sym, "s1")
        .join(eb, "s2")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy(F.col("pa").alias("a"), F.col("pb").alias("b"))
        .agg(F.sum("v").alias("num"))
    )
    da = dc.select(F.col("c").alias("a"), F.col("d").alias("da"))
    db = dc.select(F.col("c").alias("b"), F.col("d").alias("db"))
    res = (
        pair2.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .select(
            "a",
            "b",
            "num",
            (0.8 * F.col("num") / (F.lit(1e6) * F.col("da") * F.col("db"))).alias(
                "s2_raw"
            ),
        )
    )
    w = Window.orderBy(F.col("s2_raw").desc(), "a", "b")
    return (
        res.select("a", "b", "num", "s2_raw", F.row_number().over(w).alias("r"))
        .filter(F.col("r") <= 20)
        .orderBy("r")
        .select(
            "a",
            "b",
            F.col("num").cast("long").alias("num"),
            F.round("s2_raw", 6).alias("simrank2"),
        )
    )


@_g(
    "g109_scc_condensation",
    """WITH RECURSIVE ne AS (
         SELECT 'n'||c.c_nationkey AS src, 'n'||s.s_nationkey AS dst
         FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey
         JOIN customer c ON o.o_custkey=c.c_custkey
         JOIN supplier s ON l.l_suppkey=s.s_suppkey
         GROUP BY 1,2 HAVING count(*) >= 25),
       nodes AS (SELECT DISTINCT node FROM (
         SELECT src AS node FROM ne UNION ALL SELECT dst FROM ne)),
       reach(a, b) AS (
         SELECT src, dst FROM ne
         UNION
         SELECT r.a, e.dst FROM reach r JOIN ne e ON r.b = e.src),
       mutual AS (SELECT r1.a, r1.b FROM reach r1
                  JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a),
       comp AS (SELECT n.node,
                least(n.node, coalesce(min(m.b), n.node)) AS lbl
                FROM nodes n LEFT JOIN mutual m ON m.a = n.node GROUP BY 1),
       ce AS (SELECT DISTINCT ca.lbl AS cs, cb.lbl AS cd
              FROM ne JOIN comp ca ON ca.node = ne.src
              JOIN comp cb ON cb.node = ne.dst
              WHERE ca.lbl <> cb.lbl),
       lp(c, len) AS (
         SELECT lbl, 0 FROM (SELECT DISTINCT lbl FROM comp)
         UNION
         SELECT e.cd, lp.len + 1 FROM lp JOIN ce e ON e.cs = lp.c),
       lvl AS (SELECT c, max(len) AS level FROM lp GROUP BY 1),
       sz AS (SELECT lbl, count(*) AS n_members FROM comp GROUP BY 1),
       odeg AS (SELECT cs, count(*) AS d FROM ce GROUP BY 1)
       SELECT sz.lbl AS component, sz.n_members::BIGINT AS n_members,
              lvl.level::INT AS level,
              coalesce(odeg.d, 0)::BIGINT AS out_degree
       FROM sz JOIN lvl ON lvl.c = sz.lbl
       LEFT JOIN odeg ON odeg.cs = sz.lbl
       ORDER BY 1""",
    note="SCC condensation of the dense nation trade graph: collapse "
    "each strongly connected component to a supernode, keep distinct "
    "cross-component edges (the condensation is a DAG by "
    "construction), and topologically stratify it — level = longest "
    "path from any source component, the schedule depth a staged "
    "settlement/dependency pipeline would execute in.  Spark side: "
    "the FW-BW SCC kernel (g17), one distinct component-edge rollup, "
    "then a longest-path frontier loop (each round relaxes one DAG "
    "level; terminates because the condensation is acyclic).  Oracle "
    "replays it as a recursive path-length closure + max.  The "
    "coarsen-then-analyze pattern that makes billion-edge cyclic "
    "graphs tractable: all downstream analysis runs on |components| "
    "rows",
)
def g109(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.algorithms import strongly_connected_components

    c = Catalog(spark, sf_dir)
    li = c.table("lineitem").select("l_orderkey", "l_suppkey")
    o = c.table("orders").select("o_orderkey", "o_custkey")
    cu = c.table("customer").select("c_custkey", "c_nationkey")
    su = c.table("supplier").select("s_suppkey", "s_nationkey")
    ne = (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cu), F.col("o_custkey") == cu.c_custkey)
        .join(F.broadcast(su), F.col("l_suppkey") == su.s_suppkey)
        .groupBy(
            F.concat(F.lit("n"), F.col("c_nationkey").cast("string")).alias("src"),
            F.concat(F.lit("n"), F.col("s_nationkey").cast("string")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 25)
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    nodes = (
        ne.select(F.col("src").alias("id"))
        .union(ne.select(F.col("dst").alias("id")))
        .distinct()
    )
    comp = strongly_connected_components(PropertyGraph(nodes, ne)).select(
        F.col("node"), F.col("component").alias("lbl")
    )
    ca = comp.select(F.col("node").alias("src"), F.col("lbl").alias("cs"))
    cb = comp.select(F.col("node").alias("dst"), F.col("lbl").alias("cd"))
    ce = (
        ne.join(F.broadcast(ca), "src")
        .join(F.broadcast(cb), "dst")
        .filter(F.col("cs") != F.col("cd"))
        .select("cs", "cd")
        .distinct()
        .localCheckpoint(eager=True)
    )
    # longest-path stratification: frontier relaxation over the DAG
    lvl = comp.select(F.col("lbl").alias("c")).distinct().select(
        "c", F.lit(0).alias("level")
    )
    frontier = lvl
    depth = 0
    while True:
        depth += 1
        nxt = (
            frontier.join(ce, frontier.c == ce.cs)
            .select(F.col("cd").alias("c"), F.lit(depth).alias("level"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        if not nxt.take(1):
            break
        lvl = lvl.unionByName(nxt)
        frontier = nxt
    level = lvl.groupBy("c").agg(F.max("level").alias("level"))
    sz = comp.groupBy("lbl").agg(F.count(F.lit(1)).alias("n_members"))
    odeg = ce.groupBy("cs").agg(F.count(F.lit(1)).alias("d"))
    return (
        sz.join(level, sz.lbl == level.c)
        .join(odeg, sz.lbl == odeg.cs, "left")
        .select(
            F.col("lbl").alias("component"),
            F.col("n_members").cast("long").alias("n_members"),
            F.col("level").cast("int").alias("level"),
            F.coalesce("d", F.lit(0)).cast("long").alias("out_degree"),
        )
        .orderBy("component")
    )


@_g(
    "g110_h_index",
    f"""WITH {GRAPH_CTES},
       r AS (SELECT dst AS supplier, n_items,
         row_number() OVER (PARTITION BY dst
           ORDER BY n_items DESC, src) AS rn
       FROM graph_edges),
       h AS (SELECT supplier,
         coalesce(max(CASE WHEN n_items >= rn THEN rn END), 0) AS h_index,
         count(*) AS n_customers, sum(n_items) AS total_items
       FROM r GROUP BY 1)
       SELECT supplier, h_index::BIGINT AS h_index,
              n_customers::BIGINT AS n_customers,
              total_items::BIGINT AS total_items
       FROM h ORDER BY h_index DESC, supplier LIMIT 40""",
    note="Hirsch h-index per supplier over its customer item counts: "
    "the largest h such that h customers each account for >= h items "
    "— the robust breadth-AND-depth centrality bibliometrics uses "
    "(immune to one whale customer or a long tail of one-item "
    "relationships, the two failure modes of g01's raw degree and "
    "q's revenue sums; distinct from the Herfindahl concentration "
    "index, which measures the opposite — dependence).  EXACT "
    "INTEGERS throughout: h = max(rn where n_items >= rn) under the "
    "(n_items DESC, src) total order.  One partitioned window + one "
    "aggregate over the edge rollup — the same per-entity ranked-"
    "prefix shape as q14, corpus-size-independent after the rollup",
)
def g110(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).graph_edges()
    w = Window.partitionBy("dst").orderBy(F.col("n_items").desc(), "src")
    r = e.select(
        F.col("dst").alias("supplier"),
        "n_items",
        F.row_number().over(w).alias("rn"),
    )
    return (
        r.groupBy("supplier")
        .agg(
            F.coalesce(
                F.max(F.when(F.col("n_items") >= F.col("rn"), F.col("rn"))), F.lit(0)
            ).alias("h_index"),
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("n_items").alias("total_items"),
        )
        .select(
            "supplier",
            F.col("h_index").cast("long").alias("h_index"),
            F.col("n_customers").cast("long").alias("n_customers"),
            F.col("total_items").cast("long").alias("total_items"),
        )
        .orderBy(F.col("h_index").desc(), "supplier")
        .limit(40)
    )


@_g(
    "g111_k_shortest_paths",
    """WITH RECURSIVE ne AS MATERIALIZED (
         SELECT 'n'||c.c_nationkey AS src, 'n'||s.s_nationkey AS dst,
                1000000 // count(*) AS w
         FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey
         JOIN customer c ON o.o_custkey=c.c_custkey
         JOIN supplier s ON l.l_suppkey=s.s_suppkey
         GROUP BY 1,2 HAVING count(*) >= 25),
       p(endn, path, cost, hops) AS (
         SELECT e.dst, ['n11', e.dst], e.w, 1 FROM ne e WHERE e.src = 'n11'
         UNION ALL
         SELECT e.dst, list_append(p.path, e.dst), p.cost + e.w, p.hops + 1
         FROM p JOIN ne e ON e.src = p.endn
         WHERE p.hops < 3 AND p.endn <> 'n18'
           AND NOT list_contains(p.path, e.dst))
       SELECT array_to_string(path, '>') AS path, CAST(hops AS INT) AS hops,
              CAST(cost AS BIGINT) AS cost
       FROM p WHERE endn = 'n18'
       ORDER BY cost, path LIMIT 8""",
    note="k-shortest loopless paths (k=8) n11 -> n18 on the directed "
    "nation trade graph (>=25 shipments), edge cost 1000000 DIV "
    "n_shipments so busy lanes are cheap — the alternative-routing "
    "primitive Yen's algorithm answers; here as bounded-horizon "
    "(3 hops, declared in BOTH engines per the g78 lesson) loopless "
    "path enumeration with total (cost, path) tie order.  Engine is "
    "semi-naive frontier expansion: per hop one broadcast hash join "
    "against the tiny edge table, loop edges cut by array_contains, "
    "paths ending at the target leave the frontier.  Costs are exact "
    "integer carriers.  At 100 TB-graph scale the same loop takes a "
    "per-(end,hop) top-k cost prune (Yen's dominance) to bound the "
    "frontier; exhaustive expansion here keeps the oracle exact",
)
def g111(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    li = c.table("lineitem").select("l_orderkey", "l_suppkey")
    o = c.table("orders").select("o_orderkey", "o_custkey")
    cu = c.table("customer").select("c_custkey", "c_nationkey")
    su = c.table("supplier").select("s_suppkey", "s_nationkey")
    src, dst = "n11", "n18"
    ne = (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cu), F.col("o_custkey") == cu.c_custkey)
        .join(F.broadcast(su), F.col("l_suppkey") == su.s_suppkey)
        .groupBy(
            F.concat(F.lit("n"), F.col("c_nationkey").cast("string")).alias("src"),
            F.concat(F.lit("n"), F.col("s_nationkey").cast("string")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 25)
        .select("src", "dst", F.expr("1000000 DIV n").alias("w"))
    )
    frontier = ne.filter(F.col("src") == src).select(
        F.array(F.lit(src), F.col("dst")).alias("path"),
        F.col("dst").alias("endn"),
        F.col("w").alias("cost"),
        F.lit(1).alias("hops"),
    )
    done = frontier.filter(F.col("endn") == dst)
    for h in (2, 3):
        frontier = (
            frontier.filter(F.col("endn") != dst)
            .join(F.broadcast(ne), F.col("endn") == F.col("src"))
            .filter(~F.array_contains(F.col("path"), F.col("dst")))
            .select(
                F.concat(F.col("path"), F.array(F.col("dst"))).alias("path"),
                F.col("dst").alias("endn"),
                (F.col("cost") + F.col("w")).alias("cost"),
                F.lit(h).alias("hops"),
            )
        )
        done = done.unionAll(frontier.filter(F.col("endn") == dst))
    return (
        done.select(
            F.array_join("path", ">").alias("path"),
            F.col("hops").cast("int").alias("hops"),
            F.col("cost").cast("long").alias("cost"),
        )
        .orderBy("cost", "path")
        .limit(8)
    )


@_g(
    "g112_rewiring_null",
    f"""WITH {GRAPH_CTES},
       e AS MATERIALIZED (SELECT src, dst FROM graph_edges),
       r AS MATERIALIZED (
         SELECT src, dst,
                row_number() OVER (ORDER BY md5(src || '|' || dst), src, dst) AS rn
         FROM e),
       pairs AS MATERIALIZED (
         SELECT a.src AS a_s, a.dst AS a_d, c.src AS c_s, c.dst AS c_d,
                (a.rn + 1) // 2 AS pid
         FROM r a JOIN r c ON c.rn = a.rn + 1
         WHERE a.rn % 2 = 1),
       valid AS MATERIALIZED (
         SELECT * FROM pairs p
         WHERE NOT (p.a_s = p.c_s AND p.c_d = p.a_d)
           AND NOT EXISTS (SELECT 1 FROM e WHERE e.src=p.a_s AND e.dst=p.c_d)
           AND NOT EXISTS (SELECT 1 FROM e WHERE e.src=p.c_s AND e.dst=p.a_d)),
       prop AS MATERIALIZED (
         SELECT pid, a_s AS src, c_d AS dst FROM valid
         UNION ALL SELECT pid, c_s, a_d FROM valid),
       dupc AS (SELECT src, dst, count(*) AS c FROM prop GROUP BY 1, 2),
       comm AS MATERIALIZED (
         SELECT p.pid FROM prop p JOIN dupc d ON p.src=d.src AND p.dst=d.dst
         GROUP BY 1 HAVING max(d.c) = 1),
       fin AS MATERIALIZED (
         SELECT p.src, p.dst FROM prop p JOIN comm USING (pid)
         UNION ALL
         SELECT r.src, r.dst FROM r
         WHERE NOT EXISTS (SELECT 1 FROM comm WHERE comm.pid = (r.rn + 1) // 2)),
       b1 AS (SELECT coalesce(sum(w*(w-1)//2), 0)::BIGINT AS bf FROM (
              SELECT a.src AS c1, b.src AS c2, count(*) AS w
              FROM e a JOIN e b ON a.dst=b.dst AND a.src < b.src
              GROUP BY 1, 2) z),
       b2 AS (SELECT coalesce(sum(w*(w-1)//2), 0)::BIGINT AS bf FROM (
              SELECT a.src AS c1, b.src AS c2, count(*) AS w
              FROM fin a JOIN fin b ON a.dst=b.dst AND a.src < b.src
              GROUP BY 1, 2) z),
       od AS (SELECT src, count(*) AS c FROM e GROUP BY 1),
       nd AS (SELECT src, count(*) AS c FROM fin GROUP BY 1),
       idg AS (SELECT dst, count(*) AS c FROM e GROUP BY 1),
       ind AS (SELECT dst, count(*) AS c FROM fin GROUP BY 1),
       ddo AS (SELECT coalesce(sum(abs(coalesce(o.c,0)-coalesce(n.c,0))),0)::BIGINT AS d
               FROM od o FULL JOIN nd n ON o.src=n.src),
       ddi AS (SELECT coalesce(sum(abs(coalesce(o.c,0)-coalesce(n.c,0))),0)::BIGINT AS d
               FROM idg o FULL JOIN ind n ON o.dst=n.dst)
       SELECT (SELECT count(*) FROM e)::BIGINT AS n_edges,
              (SELECT count(*) FROM comm)::BIGINT AS n_swapped_pairs,
              (SELECT bf FROM b1) AS bf_obs,
              (SELECT bf FROM b2) AS bf_null,
              (SELECT d FROM ddo) + (SELECT d FROM ddi) AS deg_diff""",
    note="degree-preserving rewiring null model for motif "
    "significance: one deterministic parallel round of double-edge "
    "swaps on the bipartite customer->supplier graph (FIXTURES "
    "graph_edges view), then the butterfly (2x2 biclique) count of "
    "the rewired graph beside the observed count — the bipartite "
    "configuration-model baseline that says whether co-purchasing "
    "is structural or a pure degree artifact.  RNG-free: edges rank "
    "by content md5 (the l18/g107 idiom), consecutive ranks pair "
    "up, pair (c1->s1, c2->s2) proposes (c1->s2, c2->s1); a "
    "proposal commits only if neither new edge exists in the "
    "original graph or is proposed by any other pair "
    "(multiplicity-1 filter) — committed swaps preserve every "
    "customer out-degree and supplier in-degree EXACTLY, proven "
    "in-query by the deg_diff=0 column.  Butterflies via the "
    "supplier wedge join + sum C(w,2), all integer.  At scale the "
    "global md5 rank becomes a per-hash-bucket rank (pairing "
    "within md5 buckets is equally valid and shuffle-local); the "
    "swap round is two anti-joins plus a groupBy on |E|",
)
def g112(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    e = c.graph_edges().select("src", "dst").localCheckpoint(eager=True)
    # checkpointed: r is referenced three times (a, cpart, keep) and
    # Spark re-plans each reference as its own subtree, re-running the
    # global ranking window per reference (r10: ~1 s off this builder
    # together with the `valid` checkpoint; the remaining wall is the
    # butterfly wedge joins themselves, run once per side.  Rows
    # identical — materialization only)
    r = e.select(
        "src",
        "dst",
        F.row_number()
        .over(
            Window.orderBy(
                F.md5(F.concat_ws("|", F.col("src"), F.col("dst"))), F.col("src"), F.col("dst")
            )
        )
        .alias("rn"),
    ).localCheckpoint(eager=True)
    a = r.filter(F.col("rn") % 2 == 1).select(
        F.col("src").alias("a_s"), F.col("dst").alias("a_d"), "rn"
    )
    cpart = r.select(
        F.col("src").alias("c_s"), F.col("dst").alias("c_d"), F.col("rn").alias("rn2")
    )
    pairs = (
        a.join(cpart, F.col("rn2") == F.col("rn") + 1)
        .withColumn("pid", F.expr("(rn + 1) DIV 2"))
        .select("pid", "a_s", "a_d", "c_s", "c_d")
    )
    valid = (
        pairs.filter(~((F.col("a_s") == F.col("c_s")) & (F.col("c_d") == F.col("a_d"))))
        .join(
            e.select(F.col("src").alias("a_s"), F.col("dst").alias("c_d")),
            ["a_s", "c_d"],
            "left_anti",
        )
        .join(
            e.select(F.col("src").alias("c_s"), F.col("dst").alias("a_d")),
            ["c_s", "a_d"],
            "left_anti",
        )
    ).localCheckpoint(eager=True)  # prop unions it twice, then dupc/comm/fin re-reference prop
    prop = valid.select("pid", F.col("a_s").alias("src"), F.col("c_d").alias("dst")).unionAll(
        valid.select("pid", F.col("c_s").alias("src"), F.col("a_d").alias("dst"))
    )
    dupc = prop.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("cdup"))
    comm = (
        prop.join(dupc, ["src", "dst"])
        .groupBy("pid")
        .agg(F.max("cdup").alias("mx"))
        .filter(F.col("mx") == 1)
        .select("pid")
    )
    keep = (
        r.withColumn("pid", F.expr("(rn + 1) DIV 2"))
        .join(comm, "pid", "left_anti")
        .select("src", "dst")
    )
    fin = prop.join(comm, "pid").select("src", "dst").unionAll(keep).localCheckpoint(eager=True)

    def _butterflies(edges: DataFrame) -> DataFrame:
        aa = edges.select(F.col("src").alias("c1"), F.col("dst").alias("s"))
        bb = edges.select(F.col("src").alias("c2"), F.col("dst").alias("s"))
        return (
            aa.join(bb, "s")
            .filter(F.col("c1") < F.col("c2"))
            .groupBy("c1", "c2")
            .agg(F.count(F.lit(1)).alias("w"))
            .agg(
                F.coalesce(F.sum(F.expr("w * (w - 1) DIV 2")), F.lit(0)).alias("bf")
            )
        )

    def _deg_diff(col: str) -> DataFrame:
        do = e.groupBy(col).agg(F.count(F.lit(1)).alias("oc"))
        dn = fin.groupBy(col).agg(F.count(F.lit(1)).alias("nc"))
        return do.join(dn, col, "full_outer").agg(
            F.coalesce(
                F.sum(
                    F.abs(
                        F.coalesce(F.col("oc"), F.lit(0)) - F.coalesce(F.col("nc"), F.lit(0))
                    )
                ),
                F.lit(0),
            ).alias("d")
        )

    return (
        e.agg(F.count(F.lit(1)).alias("n_edges"))
        .crossJoin(comm.agg(F.count(F.lit(1)).alias("n_swapped_pairs")))
        .crossJoin(_butterflies(e).select(F.col("bf").alias("bf_obs")))
        .crossJoin(_butterflies(fin).select(F.col("bf").alias("bf_null")))
        .crossJoin(_deg_diff("src").select(F.col("d").alias("ddo")))
        .crossJoin(_deg_diff("dst").select(F.col("d").alias("ddi")))
        .select(
            "n_edges",
            "n_swapped_pairs",
            "bf_obs",
            "bf_null",
            (F.col("ddo") + F.col("ddi")).alias("deg_diff"),
        )
    )


@_g(
    "g113_cypher_multi_with",
    f"""WITH {GRAPH_CTES},
       agg AS (SELECT dst AS s, count(*) AS n_cust,
                      sum(n_items)::BIGINT AS ti
               FROM graph_edges GROUP BY 1 HAVING count(*) >= 2),
       b AS (SELECT s, ti // n_cust AS ipc FROM agg)
       SELECT ipc, count(*)::BIGINT AS n_suppliers
       FROM b GROUP BY 1 ORDER BY ipc""",
    note="chained WITH stages (the r3 verdict's top Cypher gap — real "
    "Cypher workloads stack WITH...WITH...RETURN): stage 1 aggregates "
    "per supplier with a HAVING (WITH..WHERE filters the PROJECTED "
    "rows), stage 2 derives integer items-per-customer from the stage-1 "
    "aliases, RETURN re-aggregates into the ipc histogram — three "
    "stacked groupBy/projection stages from one declarative string, "
    "each WITH's aliases becoming the next stage's variable scope.  "
    "Compiles to exactly the stacked-agg DataFrame plan a hand-written "
    "query would produce; integer carriers (DIV) throughout",
)
def g113(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH (c:Customer)-[e:BUYS]->(s:Supplier)
           WITH s, count(*) AS n_cust, sum(e.n_items) AS ti WHERE n_cust >= 2
           WITH s, ti DIV n_cust AS ipc
           RETURN ipc, count(*) AS n_suppliers
           ORDER BY ipc""",
    )


@_g(
    "g114_cypher_with_chain_agg",
    f"""WITH {GRAPH_CTES},
       d1 AS (SELECT src, count(*) AS deg FROM graph_edges
              WHERE n_items >= 2 GROUP BY 1),
       d2 AS (SELECT deg, count(*) AS n_cust FROM d1
              GROUP BY 1 HAVING count(*) >= 2)
       SELECT count(*)::BIGINT AS n_degree_classes,
              sum(n_cust)::BIGINT AS covered,
              max(deg)::BIGINT AS max_deg FROM d2""",
    note="two aggregate WITH stages then an all-aggregate RETURN: "
    "per-customer degree (>=2-item edges) -> degree histogram with "
    "HAVING -> global summary of the surviving classes.  Exercises the "
    "agg->agg->agg chain (each WITH rebinds the scope to its aliases; "
    "the final RETURN has no grouping keys so it compiles to a global "
    "aggregate, 1 row even when empty — both engines agree on "
    "count=0/sum=NULL/max=NULL semantics).  Sibling g113 covers the "
    "project-between-aggs shape",
)
def g114(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH (c:Customer)-[e:BUYS]->(s:Supplier) WHERE e.n_items >= 2
           WITH c, count(*) AS deg
           WITH deg, count(*) AS n_cust WHERE n_cust >= 2
           RETURN count(*) AS n_degree_classes, sum(n_cust) AS covered,
                  max(deg) AS max_deg""",
    )


@_g(
    "g115_cypher_weighted_path",
    """WITH RECURSIVE
       ne AS MATERIALIZED (
         SELECT 'n'||c.c_nationkey AS src, 'n'||s.s_nationkey AS dst,
                1000000 // count(*) AS w
         FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey
         JOIN customer c ON o.o_custkey=c.c_custkey
         JOIN supplier s ON l.l_suppkey=s.s_suppkey
         GROUP BY 1,2 HAVING count(*) >= 150),
       p(endn, path, cost, hops) AS (
         SELECT e.dst, ['n11', e.dst], e.w, 1 FROM ne e
         WHERE e.src = 'n11' AND e.dst <> 'n11'
         UNION ALL
         SELECT e.dst, list_append(p.path, e.dst), p.cost + e.w, p.hops + 1
         FROM p JOIN ne e ON e.src = p.endn
         WHERE p.hops < 6 AND NOT list_contains(p.path, e.dst))
       SELECT endn AS dest, CAST(min(cost) AS BIGINT) AS cost
       FROM p GROUP BY 1 ORDER BY cost, dest""",
    note="weighted shortestPath in Cypher (r3 verdict item 6): "
    "{cost: 'w'} on the var-length edge names the weight property; the "
    "compiler lowers onto the Bellman-Ford SSSP kernel with the hop "
    "bound (bare * = 6) as the round count — after h simultaneous "
    "relaxation rounds tentative distances are EXACTLY the <=h-hop "
    "minima, and with non-negative integer weights the <=h-hop walk "
    "minimum equals the <=h-hop loopless-path minimum, so the "
    "enumeration oracle (g111's protocol: hop-capped recursive CTE, "
    "min cost per destination) agrees hash-exactly.  Edge cost is the "
    "g111 integer carrier 1000000 DIV n_shipments on the >=150 "
    "nation-lane graph (:TRADE_W); kernel auto-routes local/"
    "distributed, parity-tested both ways in test_properties",
)
def g115(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH p = shortestPath((a:Nation {node: 'n11'})-[:TRADE_W* {cost: 'w'}]->(b:Nation))
           RETURN b.node AS dest, CAST(p.cost AS BIGINT) AS cost
           ORDER BY cost, dest""",
    )


@_g(
    "g117_itemitem_recs",
    f"""WITH {GRAPH_CTES},
       e AS (SELECT DISTINCT src, dst FROM graph_edges WHERE n_items >= 2),
       cp AS (SELECT a.dst AS s1, b.dst AS s2, count(*) AS cooc
              FROM e a JOIN e b ON a.src = b.src AND a.dst < b.dst
              GROUP BY 1, 2 HAVING count(*) >= 2),
       sym AS (SELECT s1, s2, cooc FROM cp
               UNION ALL SELECT s2, s1, cooc FROM cp),
       sc AS (SELECT e.src AS customer, sym.s2 AS cand,
                     sum(sym.cooc) AS score
              FROM e JOIN sym ON sym.s1 = e.dst GROUP BY 1, 2),
       neg AS (SELECT sc.customer, sc.cand, sc.score FROM sc
               WHERE NOT EXISTS (SELECT 1 FROM e
                                 WHERE e.src = sc.customer
                                   AND e.dst = sc.cand)),
       rk AS (SELECT customer, cand, score,
                row_number() OVER (PARTITION BY customer
                                   ORDER BY score DESC, cand) AS rnk
              FROM neg)
       SELECT customer, cand AS rec, score::BIGINT AS score,
              rnk::INT AS rnk
       FROM rk WHERE rnk <= 3 ORDER BY customer, rnk""",
    note="item-item neighborhood recommendations (the classic "
    "Amazon-style CF pipeline, missing output of the association "
    "family: g38 builds the co-occurrence projection and q134 scores "
    "rules, but nothing RECOMMENDED): supplier-supplier co-occurrence "
    "counts (>=2 shared customers on >=2-item edges), each customer's "
    "candidate score = sum of co-occurrence weights from their owned "
    "suppliers, owned items anti-joined away, top-3 per customer "
    "under the exact-integer (score DESC, cand) total order — no "
    "cosine floats, so ranking is bit-stable cross-engine.  Scale: "
    "the item-item projection shuffles on the customer key (per-"
    "customer degree caps + salting are the viral-basket guard, as "
    "g38 documents), the scoring pass is one equi-join on the owned "
    "supplier + one map-side-combined sum, and the similarity matrix "
    "is |items|^2-bounded, NOT |users|^2 — the reason item-item "
    "beats user-user at web scale",
)
def g117(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        Catalog(spark, sf_dir)
        .graph_edges()
        .filter(F.col("n_items") >= 2)
        .select("src", "dst")
        .distinct()
    )
    # uncapped here (rolled-up baskets are small); basket_cap is the
    # viral-basket guard the scale note documents — see operators/recsys
    cp = item_item_cooccurrence(e, min_cooc=2, basket_cap=None)
    sym = cp.unionAll(
        cp.select(F.col("s2").alias("s1"), F.col("s1").alias("s2"), "cooc")
    )
    sc = (
        e.join(sym, e.dst == sym.s1)
        .groupBy(F.col("src").alias("customer"), F.col("s2").alias("cand"))
        .agg(F.sum("cooc").alias("score"))
    )
    neg = sc.join(
        e.select(F.col("src").alias("customer"), F.col("dst").alias("cand")),
        ["customer", "cand"],
        "left_anti",
    )
    w = Window.partitionBy("customer").orderBy(F.col("score").desc(), "cand")
    return (
        neg.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "customer",
            F.col("cand").alias("rec"),
            F.col("score").cast("long").alias("score"),
            F.col("rnk").cast("int").alias("rnk"),
        )
        .orderBy("customer", "rnk")
    )


@_g(
    "g118_cypher_match_after_with",
    f"""WITH {GRAPH_CTES},
       hub AS (SELECT dst AS s, count(*) AS n_cust FROM graph_edges
               GROUP BY 1 HAVING count(*) >= 3),
       j AS (SELECT h.s, h.n_cust, e.n_items FROM hub h
             JOIN graph_edges e ON e.dst = h.s AND e.n_items >= 4)
       SELECT s AS supplier, n_cust,
              count(*)::BIGINT AS heavy_buyers,
              sum(n_items)::BIGINT AS items
       FROM j GROUP BY 1, 2
       ORDER BY heavy_buyers DESC, supplier LIMIT 20""",
    note="MATCH after WITH (the Neo4j aggregate-then-expand idiom, the "
    "natural follow-on to g113/g114's WITH chains): stage 1 aggregates "
    "suppliers to fan-in hubs (HAVING >= 3 customers), then a SECOND "
    "MATCH re-expands each hub's >=4-item edges, anchored on the "
    "carried `s` alias — compiled as groupBy -> filter -> equi-join "
    "with the new block's WHERE riding the join condition, exactly "
    "the plan a hand-written hub-and-spoke query produces.  The WITH "
    "alias is a node id string, so the anchor join is a plain key "
    "equi-join Catalyst can broadcast when the hub set is small — at "
    "100 TB the aggregate side SHRINKS the join input (hubs << "
    "edges), which is the whole point of the idiom",
)
def g118(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH (c:Customer)-[e:BUYS]->(s:Supplier)
           WITH s, count(*) AS n_cust WHERE n_cust >= 3
           MATCH (s)<-[f:BUYS]-(b:Customer) WHERE f.n_items >= 4
           RETURN s AS supplier, n_cust, count(*) AS heavy_buyers,
                  sum(f.n_items) AS items
           ORDER BY heavy_buyers DESC, supplier LIMIT 20""",
    )


@_g(
    "g119_cypher_unwind",
    f"""WITH {GRAPH_CTES},
       hub AS (SELECT dst AS s, count(*) AS n_cust FROM graph_edges
               WHERE n_items >= 3 GROUP BY 1 HAVING count(*) >= 3),
       m AS (SELECT e.src AS b, e.dst AS s FROM graph_edges e
             JOIN hub h ON h.s = e.dst WHERE e.n_items >= 3)
       SELECT count(DISTINCT b)::BIGINT AS distinct_buyers,
              count(*)::BIGINT AS memberships,
              count(DISTINCT s)::BIGINT AS n_hubs
       FROM m""",
    note="UNWIND (collect-then-re-expand, the last refused read "
    "clause): suppliers with >=3 heavy buyers collect their buyer "
    "lists in a WITH, UNWIND explodes the lists back to one row per "
    "membership, RETURN re-aggregates to hub-audience reach (distinct "
    "buyers vs memberships vs hubs).  collect_list keeps duplicates, "
    "so the UNWIND round-trip reproduces the join rows exactly — the "
    "oracle proves it against the plain join.  Compiles to "
    "groupBy(collect_list) -> explode -> aggregate; at scale the "
    "collect_list per supplier is bounded by the hub's degree (the "
    "same per-key bound every collect-based query in this suite "
    "documents), and explode is a narrow generator, not a shuffle",
)
def g119(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH (c:Customer)-[e:BUYS]->(s:Supplier) WHERE e.n_items >= 3
           WITH s, collect_list(c.node) AS buyers, count(*) AS n_cust
             WHERE n_cust >= 3
           UNWIND buyers AS b
           RETURN count(DISTINCT b) AS distinct_buyers,
                  count(*) AS memberships, count(DISTINCT s) AS n_hubs""",
    )


@_g(
    "g120_cypher_all_shortest",
    """WITH RECURSIVE
       ne AS MATERIALIZED (
         SELECT 'n'||c.c_nationkey AS src, 'n'||s.s_nationkey AS dst
         FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey
         JOIN customer c ON o.o_custkey=c.c_custkey
         JOIN supplier s ON l.l_suppkey=s.s_suppkey
         GROUP BY 1,2 HAVING count(*) >= 150),
       e AS (SELECT src, dst FROM ne WHERE src <> dst),
       p(a, endn, path, hops) AS (
         SELECT e.src, e.dst, [e.src, e.dst], 1 FROM e WHERE e.src = 'n11'
         UNION ALL
         SELECT p.a, e.dst, list_append(p.path, e.dst), p.hops + 1
         FROM p JOIN e ON e.src = p.endn
         WHERE p.hops < 4 AND NOT list_contains(p.path, e.dst)),
       mh AS (SELECT a, endn AS b, min(hops) AS len FROM p GROUP BY 1, 2),
       cnt AS (SELECT p.a, p.endn AS b, m.len, count(*) AS n_paths
               FROM p JOIN mh m ON m.a = p.a AND m.b = p.endn
                              AND p.hops = m.len
               GROUP BY 1, 2, 3)
       SELECT a, b, len::INT AS len, n_paths::BIGINT AS n_paths
       FROM cnt ORDER BY len, b""",
    note="allShortestPaths in Cypher (the counting sibling of g105's "
    "shortestPath): Brandes' sigma forward pass — the BFS frontier "
    "carries per-(seed, node) path counts, each level SUMS predecessor "
    "counts per landing node in one map-side-combined groupBy, and "
    "first-reach anti-joins pin counts to the shortest level.  A "
    "minimal-length walk can never revisit a node (a revisit implies "
    "a shorter walk), so every counted walk is simple and the "
    "loopless-enumeration oracle (hop cap 4, declared in BOTH engines "
    "per the g78/g111 lesson; self-loop lanes dropped) agrees "
    "count-exactly, not just reachability-exactly.  From n11 on the "
    ">=150 nation lanes; binds p.len and p.cnt.  At 10^9-edge scale "
    "the frontier rows are (seed, node, count) triples — the exact "
    "state Brandes betweenness already shuffles, nothing path-shaped "
    "is ever materialized",
)
def g120(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH p = allShortestPaths((a:Nation {node: 'n11'})-[:TRADE*1..4]->(b:Nation))
           RETURN a, b, length(p) AS len, p.cnt AS n_paths
           ORDER BY len, b""",
    ).select("a", "b", F.col("len").cast("int").alias("len"), "n_paths")


@_g(
    "g121_cypher_exists",
    f"""WITH {GRAPH_CTES},
       sel AS (SELECT e.dst AS supplier, e.n_items FROM graph_edges e
               WHERE e.n_items >= 2
                 AND EXISTS (SELECT 1 FROM graph_edges f
                             WHERE f.dst = e.dst AND f.n_items = 4))
       SELECT supplier, count(*)::BIGINT AS n_cust,
              sum(n_items)::BIGINT AS items
       FROM sel GROUP BY 1 ORDER BY n_cust DESC, supplier LIMIT 15""",
    note="Cypher EXISTS pattern predicate (r4 verdict's top missing "
    "user surface): WHERE EXISTS { (s)<-[:BUYS {n_items: 4}]-(x) } "
    "keeps suppliers having at least one exactly-4-item basket, "
    "compiled to a LEFT-SEMI join on the shared variable (the q06 "
    "shape — Catalyst plans a hash semi join, the existential x never "
    "enters the scope, and the inline property map is pushed to the "
    "edge scan BELOW the semi join).  At 100 TB the semi join's build "
    "side is the FILTERED edge set (n_items=4 rows only), so the "
    "predicate shrinks the shuffle rather than riding after it; the "
    "plan guard in test_cypher pins LeftSemi + no-cartesian",
)
def g121(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH (c:Customer)-[e:BUYS]->(s:Supplier)
           WHERE e.n_items >= 2 AND EXISTS { (s)<-[:BUYS {n_items: 4}]-(x:Customer) }
           RETURN s AS supplier, count(*) AS n_cust, sum(e.n_items) AS items
           ORDER BY n_cust DESC, supplier LIMIT 15""",
    )


@_g(
    "g122_cypher_not_pattern",
    """WITH ne AS (
         SELECT 'n'||c.c_nationkey AS src, 'n'||s.s_nationkey AS dst
         FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey
         JOIN customer c ON o.o_custkey=c.c_custkey
         JOIN supplier s ON l.l_suppkey=s.s_suppkey
         GROUP BY 1,2 HAVING count(*) >= 150)
       SELECT a.src AS src, count(*)::BIGINT AS n_oneway
       FROM ne a WHERE a.src <> a.dst
         AND NOT EXISTS (SELECT 1 FROM ne b
                         WHERE b.src = a.dst AND b.dst = a.src)
       GROUP BY 1 ORDER BY n_oneway DESC, src""",
    note="Cypher NOT pattern predicate (the anti-join idiom, the other "
    "half of the r4 verdict ask): WHERE NOT (b)-[:TRADE]->(a) counts "
    "each nation's one-way export lanes (>=150-shipment lanes with no "
    "reverse lane), compiled to a LEFT-ANTI join on BOTH bound "
    "variables — the q07 shape, never a cartesian (plan-guarded).  "
    "75 of the 91 sf0.01 lanes are one-way, so the result exercises "
    "real asymmetry, not an empty edge case.  Scale: the anti join "
    "probes the 25x25-bounded nation rollup; on a raw 10^9-edge graph "
    "the same lowering is one shuffled hash anti join on (src, dst) — "
    "exactly what a hand-written reciprocity query does",
)
def g122(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH (a:Nation)-[:TRADE]->(b:Nation)
           WHERE a.node <> b.node AND NOT (b)-[:TRADE]->(a)
           RETURN a AS src, count(*) AS n_oneway
           ORDER BY n_oneway DESC, src""",
    )


@_g(
    "g123_cypher_case",
    f"""WITH {GRAPH_CTES}
       SELECT CASE WHEN n_items >= 3 THEN 'heavy'
                   WHEN n_items = 2 THEN 'mid'
                   ELSE 'light' END AS band,
              count(*)::BIGINT AS n_edges, sum(n_items)::BIGINT AS items
       FROM graph_edges GROUP BY 1 ORDER BY band""",
    note="Cypher CASE expression passthrough (r4 verdict item 4, now "
    "declared, not just unit-tested): a CASE WHEN over an edge "
    "property works as RETURN item AND as the implicit Cypher group "
    "key — the compiler rewrites e.n_items inside the expression and "
    "hands the rest to Spark SQL verbatim, so the full expression "
    "surface (CASE, coalesce, arithmetic, array functions) is the "
    "SQL engine's, not a reimplementation.  One map-side-combined "
    "hash aggregate over the rolled-up edge view; the banding "
    "expression is codegen'd into the scan stage",
)
def g123(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH (c:Customer)-[e:BUYS]->(s:Supplier)
           RETURN CASE WHEN e.n_items >= 3 THEN 'heavy'
                       WHEN e.n_items = 2 THEN 'mid'
                       ELSE 'light' END AS band,
                  count(*) AS n_edges, sum(e.n_items) AS items
           ORDER BY band""",
    )


@_g(
    "g124_als_rank1",
    f"""WITH {GRAPH_CTES},
       u AS (SELECT src,
                    (2000000 * sum(n_items) + count(*)) // (2 * count(*))
                      AS u6
             FROM graph_edges GROUP BY 1),
       v AS (SELECT e.dst AS supplier,
                    sum(e.n_items * u.u6)::BIGINT AS num,
                    sum(u.u6 * u.u6)::BIGINT AS den,
                    count(*)::BIGINT AS n_raters
             FROM graph_edges e JOIN u ON u.src = e.src GROUP BY 1)
       SELECT supplier,
              floor((1e6 * num / den) * 10000 + 0.5) / 10000
                AS v_factor,
              n_raters
       FROM v ORDER BY v_factor DESC, supplier LIMIT 25""",
    note="rank-1 ALS (alternating least squares, the matrix-"
    "factorization gap in the CF family: g117 recommends from "
    "co-occurrence, THIS learns latent factors): with uniform v=1 "
    "init, the closed-form u-step is u_c = sum_s(r_cs*v_s)/sum_s(v_s^2) "
    "= sum(r)/deg per customer, and the v-step is v_s = "
    "sum_c(r_cs*u_c)/sum_c(u_c^2).  Cross-engine float protocol: the "
    "u-step is materialized as the EXACT micro-scaled integer "
    "u6 = round(1e6*sum(r)/deg) via pure bigint arithmetic "
    "((2e6*sr+deg) DIV (2*deg)), so the v-step's numerator and "
    "denominator are exact integer sums with no float ordering "
    "hazard, and v = 1e6*num/den is ONE fixed double expression "
    "floor-rounded at 4dp (the pre-rounded-iteration-inputs idiom "
    "every iterative float query here uses).  Scale: two map-side-"
    "combined aggregates and one equi-join per half-step — the exact "
    "shuffle shape of distributed ALS at any rank, where each step is "
    "a groupBy over ratings joined with the broadcast other-side "
    "factors; rank-k adds a k-vector payload, not a new topology",
)
def g124(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).graph_edges()
    u = e.groupBy("src").agg(
        F.expr("(2000000 * sum(n_items) + count(*)) DIV (2 * count(*))").alias("u6")
    )
    v = (
        e.join(u, "src")
        .groupBy(F.col("dst").alias("supplier"))
        .agg(
            F.sum(F.col("n_items") * F.col("u6")).cast("long").alias("num"),
            F.sum(F.col("u6") * F.col("u6")).cast("long").alias("den"),
            F.count(F.lit(1)).cast("long").alias("n_raters"),
        )
    )
    return (
        v.select(
            "supplier",
            F.expr(
                "floor((1e6 * num / den) * 10000 + 0.5) / 10000"
            ).alias("v_factor"),
            "n_raters",
        )
        .orderBy(F.col("v_factor").desc(), "supplier")
        .limit(25)
    )


@_g(
    "g125_cypher_not_varlen",
    """WITH ne AS (
         SELECT 'n'||c.c_nationkey AS src, 'n'||s.s_nationkey AS dst
         FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey
         JOIN customer c ON o.o_custkey=c.c_custkey
         JOIN supplier s ON l.l_suppkey=s.s_suppkey
         GROUP BY 1,2 HAVING count(*) >= 150),
       r2 AS (SELECT src, dst FROM ne UNION
              SELECT a.src, b.dst FROM ne a JOIN ne b ON a.dst = b.src)
       SELECT e.src AS src, count(*)::BIGINT AS n_unreturned
       FROM ne e WHERE e.src <> e.dst
         AND NOT EXISTS (SELECT 1 FROM r2
                         WHERE r2.src = e.dst AND r2.dst = e.src)
       GROUP BY 1 ORDER BY n_unreturned DESC, src""",
    note="NOT pattern predicate over a VAR-LENGTH pattern — "
    "NOT (b)-[:TRADE*1..2]->(a) counts each nation's export lanes "
    "with no return route within two hops (g122's one-hop reciprocity "
    "hardened to reachability): the anti-join's build side is the "
    "semi-naive <=2-hop DISTINCT reach-pair set (_varlen_leg — per-"
    "hop dedup keeps it |V|^2-bounded, never path-multiset), then the "
    "same left-anti lowering as g122 on both bound variables.  68 of "
    "the 91 sf0.01 lanes are unreturned at 2 hops vs 75 at 1 hop — "
    "the query actually distinguishes the radii.  At scale the reach "
    "set is one extra self-join of the rolled-up edge list before "
    "the anti join; hop cap declared in BOTH engines (the g78 "
    "lesson)",
)
def g125(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH (a:Nation)-[:TRADE]->(b:Nation)
           WHERE a.node <> b.node AND NOT (b)-[:TRADE*1..2]->(a)
           RETURN a AS src, count(*) AS n_unreturned
           ORDER BY n_unreturned DESC, src""",
    )


@_g(
    "g126_cypher_list_literal",
    f"""WITH {GRAPH_CTES}
       SELECT dst AS supplier, count(*)::BIGINT AS n_edges,
              sum(n_items)::BIGINT AS items
       FROM graph_edges WHERE n_items IN (3, 5, 7)
       GROUP BY 1 ORDER BY n_edges DESC, supplier LIMIT 15""",
    note="Cypher bracket list literal (the one expression gap the r5 "
    "g123 sweep documented): WHERE e.n_items IN [3, 5, 7] — the "
    "compiler rewrites [..] to a SQL value list after IN (and to "
    "array(..) in other expression positions, subscripts untouched) "
    "with a quote-aware nesting-safe scanner, so Catalyst sees a "
    "plain In predicate it pushes below the aggregate.  Scale: the "
    "IN filter rides the edge rollup's map side; nothing new "
    "materializes",
)
def g126(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH (c:Customer)-[e:BUYS]->(s:Supplier)
           WHERE e.n_items IN [3, 5, 7]
           RETURN s AS supplier, count(*) AS n_edges, sum(e.n_items) AS items
           ORDER BY n_edges DESC, supplier LIMIT 15""",
    )


@_g(
    "g127_cypher_exists_or",
    f"""WITH {GRAPH_CTES},
       sel AS (SELECT e.dst AS supplier, e.n_items FROM graph_edges e
               WHERE e.n_items >= 2
                 AND (EXISTS (SELECT 1 FROM graph_edges f
                              WHERE f.dst = e.dst AND f.n_items = 5)
                      OR EXISTS (SELECT 1 FROM graph_edges g2
                                 WHERE g2.src = e.src AND g2.n_items = 6)))
       SELECT supplier, count(*)::BIGINT AS n_cust,
              sum(n_items)::BIGINT AS items
       FROM sel GROUP BY 1 ORDER BY n_cust DESC, supplier LIMIT 15""",
    note="disjunction of Cypher pattern predicates (refused until this "
    "round): EXISTS { (s)<-[:BUYS {n_items: 5}]-(x) } OR "
    "EXISTS { (c)-[:BUYS {n_items: 6}]->(y) }.  A semi-join chain "
    "would INTERSECT the branches, so each branch lowers to a LEFT "
    "join against the DISTINCT shared-key set of its subpattern "
    "(property map pushed to the edge scan below it), contributing a "
    "null/not-null existence flag; the flags are ORed in ONE filter "
    "and dropped.  Distinct build keys keep the left joins from "
    "duplicating scope rows — the duplicate-preservation property "
    "test pins that.  At 100 TB each flag join's build side is the "
    "FILTERED n_items=k edge set, far smaller than the scope",
)
def g127(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH (c:Customer)-[e:BUYS]->(s:Supplier)
           WHERE e.n_items >= 2 AND
                 (EXISTS { (s)<-[:BUYS {n_items: 5}]-(x:Customer) } OR
                  EXISTS { (c)-[:BUYS {n_items: 6}]->(y:Supplier) })
           RETURN s AS supplier, count(*) AS n_cust, sum(e.n_items) AS items
           ORDER BY n_cust DESC, supplier LIMIT 15""",
    )


@_g(
    "g128_slope_one",
    f"""WITH {GRAPH_CTES},
       r AS (SELECT src AS u, dst AS i, n_items AS rt FROM graph_edges),
       dev AS (SELECT a.i AS j, b.i AS i,
                      sum(a.rt - b.rt)::BIGINT AS dnum,
                      count(*)::BIGINT AS c
               FROM r a JOIN r b ON a.u = b.u AND a.i <> b.i
               GROUP BY 1, 2 HAVING count(*) >= 3),
       pred AS (SELECT r.u, d.j,
                       sum(d.dnum + r.rt * d.c)::BIGINT AS pnum,
                       sum(d.c)::BIGINT AS pden
                FROM r JOIN dev d ON d.i = r.i
                WHERE NOT EXISTS (SELECT 1 FROM r r2
                                  WHERE r2.u = r.u AND r2.i = d.j)
                GROUP BY 1, 2)
       SELECT u AS customer, j AS supplier,
              (pnum * 10000 // pden)::BIGINT AS pred_x1e4,
              ((pnum * 10000 // pden)::DOUBLE / 1e4) AS pred
       FROM pred WHERE pnum > 0
       ORDER BY pred_x1e4 DESC, customer, supplier LIMIT 20""",
    note="weighted Slope One rating prediction (the CF family's "
    "PREDICTION step — g38/g117 generate neighbors, THIS scores "
    "unrated items): implicit rating = per-edge n_items; item-item "
    "deviation dev(j,i) = sum(r_uj - r_ui)/|co-raters| over users "
    "rating both (>= 3 co-raters), and the weighted prediction for "
    "an unrated (u, j) is sum_i(dnum_ji + r_ui * c_ji) / sum_i c_ji "
    "— the deviation-times-count algebra keeps EVERY carrier an "
    "exact BIGINT; the only division is the final one, done as "
    "exact integer x1e4 truncation (pnum > 0 filtered first so "
    "DuckDB // and Spark DIV agree), which also makes the top-20 "
    "ORDER BY tie-exact.  Shape: the deviation matrix is the g38 "
    "user-keyed self-join (C(deg,2) per user — basket_cap applies "
    "under skew, operators/recsys.py); prediction is one "
    "item-keyed join + anti-join on rated pairs.  At 100 TB dev "
    "rows are bounded by item-pair co-rating support (>= 3), far "
    "below users x items",
)
def g128(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    r = c.graph_edges().select(
        F.col("src").alias("u"), F.col("dst").alias("i"), F.col("n_items").alias("rt")
    )
    b = r.select(F.col("u"), F.col("i").alias("i2"), F.col("rt").alias("rt2"))
    dev = (
        r.join(b, "u")
        .filter(F.col("i") != F.col("i2"))
        .groupBy(F.col("i").alias("j"), F.col("i2").alias("i"))
        .agg(
            F.sum(F.col("rt") - F.col("rt2")).cast("long").alias("dnum"),
            F.count(F.lit(1)).cast("long").alias("c"),
        )
        .filter(F.col("c") >= 3)
    )
    # NOTE the self-join above reads (rt of the FIRST leg) - (rt of the
    # second): dev(j=i_first, i=i_second) must subtract rating-of-j
    # minus rating-of-i, i.e. a.rt - b.rt with j = a.i — the first
    # leg's rt is the j-side rating.
    rated = r.select("u", F.col("i").alias("j"))
    pred = (
        r.join(dev, "i")
        .join(rated, ["u", "j"], "left_anti")
        .groupBy("u", "j")
        .agg(
            F.sum(F.col("dnum") + F.col("rt") * F.col("c")).cast("long").alias("pnum"),
            F.sum("c").cast("long").alias("pden"),
        )
        .filter(F.col("pnum") > 0)
    )
    return (
        pred.select(
            F.col("u").alias("customer"),
            F.col("j").alias("supplier"),
            F.expr("pnum * 10000 DIV pden").cast("long").alias("pred_x1e4"),
            (F.expr("pnum * 10000 DIV pden").cast("double") / F.lit(1e4)).alias(
                "pred"
            ),
        )
        .orderBy(F.col("pred_x1e4").desc(), "customer", "supplier")
        .limit(20)
    )


@_g(
    "g129_cypher_optional_exists",
    f"""WITH {GRAPH_CTES},
       base AS (SELECT src AS c, dst AS s FROM graph_edges
                WHERE n_items >= 4),
       opt AS (SELECT e.dst AS s, e.src AS d FROM graph_edges e
               WHERE e.n_items >= 4
                 AND EXISTS (SELECT 1 FROM graph_edges g2
                             WHERE g2.src = e.src AND g2.n_items = 5))
       SELECT b.s AS supplier, count(*)::BIGINT AS n_pairs,
              count(o.d)::BIGINT AS n_matched
       FROM base b LEFT JOIN opt o ON o.s = b.s
       GROUP BY 1 ORDER BY n_pairs DESC, supplier LIMIT 15""",
    note="pattern predicate inside an OPTIONAL MATCH WHERE (refused "
    "until this round — the r5 verdict's carry-forward Cypher gap): "
    "openCypher says the WHERE decides whether the optional pattern "
    "MATCHED, so failing rows null-extend instead of disappearing — "
    "the compiler applies the EXISTS semi-join to the OPTIONAL-SIDE "
    "frame BEFORE the null-extending left join, while the scalar "
    "conjunct (f.n_items >= 4) still rides the join condition.  "
    "count(d) vs count(*) exposes exactly which rows null-extended, "
    "so the oracle pair pins the null-extension semantics, not just "
    "row counts.  Scale: the semi join's build side is the filtered "
    "n_items=5 edge set; everything keys on supplier — no new "
    "shuffle shape beyond g121's",
)
def g129(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH (c:Customer)-[e:BUYS]->(s:Supplier) WHERE e.n_items >= 4
           OPTIONAL MATCH (s)<-[f:BUYS]-(d:Customer)
           WHERE f.n_items >= 4 AND
                 EXISTS { (d)-[:BUYS {n_items: 5}]->(s2:Supplier) }
           RETURN s AS supplier, count(*) AS n_pairs, count(d) AS n_matched
           ORDER BY n_pairs DESC, supplier LIMIT 15""",
    )


@_g(
    "g130_cypher_rel_type_union",
    f"""WITH {GRAPH_CTES}
       SELECT dst AS supplier, count(*)::BIGINT AS n_edges,
              sum(n_items)::BIGINT AS items
       FROM graph_edges WHERE n_items >= 2
       GROUP BY 1 ORDER BY n_edges DESC, supplier LIMIT 15""",
    note="relationship-type disjunction -[e:BUYS_SMALL|BUYS_BULK]-> "
    "(new compiler production this round): the leg is the UNION ALL "
    "of the two type frames on their common property columns — "
    "distinct relationships, so no dedup — and e.n_items / the "
    "aggregate read across the union.  The types partition BUYS at "
    "the g04 bulk threshold and the predicate n_items >= 2 spans the "
    "boundary, so the result reconstructs the full relation ONLY if "
    "both branches are actually scanned (a one-type plan loses the "
    "n_items = 2 rows).  Scale: two filtered scans of the same edge "
    "rollup unioned before the aggregate — Catalyst pushes the "
    "predicate into each branch; no new shuffle shape",
)
def g130(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH (c:Customer)-[e:BUYS_SMALL|BUYS_BULK]->(s:Supplier)
           WHERE e.n_items >= 2
           RETURN s AS supplier, count(*) AS n_edges, sum(e.n_items) AS items
           ORDER BY n_edges DESC, supplier LIMIT 15""",
    )


@_g(
    "g131_cypher_string_ops",
    f"""WITH {GRAPH_CTES}
       SELECT src AS customer, dst AS supplier, n_items::BIGINT AS n_items
       FROM graph_edges
       WHERE src LIKE 'c1%' AND dst LIKE '%7' AND src NOT LIKE '%9%'
         AND n_items >= 2
       ORDER BY 1, 2 LIMIT 40""",
    note="Cypher string comparison operators (new compiler production "
    "this round): c.node STARTS WITH 'c1' / s.node ENDS WITH '7' / "
    "NOT c.node CONTAINS '9' rewrite quote-aware to the Spark "
    "startswith/endswith/contains functions before expression "
    "lowering, so Catalyst sees StartsWith/EndsWith/Contains "
    "predicates it pushes to the edge-rollup scan like any LIKE.  "
    "The oracle is the same three predicates as SQL LIKE patterns.  "
    "Scale: pure per-row predicates — they ride the rollup's map "
    "side, nothing materializes",
)
def g131(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH (c:Customer)-[e:BUYS]->(s:Supplier)
           WHERE c.node STARTS WITH 'c1' AND s.node ENDS WITH '7'
             AND NOT c.node CONTAINS '9' AND e.n_items >= 2
           RETURN c.node AS customer, s.node AS supplier,
                  e.n_items AS n_items
           ORDER BY customer, supplier LIMIT 40""",
    )


@_g(
    "g132_cypher_undirected",
    """WITH ne AS (
         SELECT 'n'||c.c_nationkey AS src, 'n'||s.s_nationkey AS dst
         FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey
         JOIN customer c ON o.o_custkey=c.c_custkey
         JOIN supplier s ON l.l_suppkey=s.s_suppkey
         GROUP BY 1,2 HAVING count(*) >= 150)
       SELECT least(src, dst) AS na, greatest(src, dst) AS nb,
              count(*)::BIGINT AS n_lanes
       FROM ne WHERE src <> dst
       GROUP BY 1, 2 ORDER BY n_lanes DESC, na, nb LIMIT 20""",
    note="undirected pattern -[e:TRADE]- (new compiler production this "
    "round; openCypher semantics — each relationship matches in BOTH "
    "orientations, so the leg is the union of the two orientation "
    "projections with self-loops contributed once): with a.node < "
    "b.node each directed lane lands on exactly one unordered pair, "
    "so n_lanes = 2 flags mutual trade and the self-lanes drop.  The "
    "oracle is the least/greatest rollup of the directed view.  "
    "Scale: the orientation union doubles the edge scan, not the "
    "shuffle — the groupBy keys on the unordered pair either way",
)
def g132(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH (a:Nation)-[e:TRADE]-(b:Nation)
           WHERE a.node < b.node
           RETURN a.node AS na, b.node AS nb, count(*) AS n_lanes
           ORDER BY n_lanes DESC, na, nb LIMIT 20""",
    )


@_g(
    "g133_cypher_collect",
    f"""WITH {GRAPH_CTES},
       b AS (SELECT dst AS supplier, src FROM graph_edges
             WHERE n_items >= 4)
       SELECT supplier, count(*)::BIGINT AS n_buyers,
              min(src) AS first_buyer, count(*)::BIGINT AS n_in_list
       FROM b GROUP BY 1 HAVING count(*) >= 3
       ORDER BY n_buyers DESC, supplier LIMIT 10""",
    note="Cypher collect() (new compiler production this round): "
    "rewritten to the DETERMINISTIC sort_array(collect_list(..)), so "
    "buyers[0] is provably min(src) and size(buyers) the count — "
    "which is exactly what the oracle checks, pinning the sort "
    "determinism rather than trusting it.  The WITH stage carries "
    "the list through a HAVING filter before RETURN subscripts it.  "
    "Scale: collect_list bounds per-key state by group fan-in — the "
    "usual caveat (cap with slice() for unbounded keys) noted; the "
    "n_items >= 4 leg keeps groups small here",
)
def g133(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH (c:Customer)-[e:BUYS]->(s:Supplier)
           WHERE e.n_items >= 4
           WITH s, collect(c.node) AS buyers, count(*) AS n_buyers
           WHERE n_buyers >= 3
           RETURN s AS supplier, n_buyers, buyers[0] AS first_buyer,
                  size(buyers) AS n_in_list
           ORDER BY n_buyers DESC, supplier LIMIT 10""",
    )


@_g(
    "g134_cypher_undirected_varlen",
    """WITH ne AS (
         SELECT 'n'||c.c_nationkey AS src, 'n'||s.s_nationkey AS dst
         FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey
         JOIN customer c ON o.o_custkey=c.c_custkey
         JOIN supplier s ON l.l_suppkey=s.s_suppkey
         GROUP BY 1,2 HAVING count(*) >= 150),
       sym AS (SELECT src, dst FROM ne UNION SELECT dst, src FROM ne),
       r1 AS (SELECT dst AS b FROM sym WHERE src = 'n5'),
       r2 AS (SELECT s2.dst AS b FROM sym s1
              JOIN sym s2 ON s2.src = s1.dst WHERE s1.src = 'n5')
       SELECT DISTINCT b AS nation
       FROM (SELECT b FROM r1 UNION ALL SELECT b FROM r2)
       ORDER BY 1""",
    note="undirected VAR-LENGTH pattern -[:TRADE*1..2]- (composing the "
    "two round-6b compiler productions): the walk runs over the "
    "symmetric closure with the existing per-hop distinct-pair "
    "semantics, anchored at n5 (one export lane at sf0.01, so the "
    "undirected reach is visibly larger than the directed one — "
    "imports count).  The oracle builds the closure with a plain "
    "UNION (safe: no WITH RECURSIVE in this query, so UNION still "
    "dedups — the g64 landmine documented in CLAUDE.md is about "
    "recursive queries).  Scale: one extra orientation union before "
    "the same two bounded join hops",
)
def g134(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH (a:Nation {node: 'n5'})-[:TRADE*1..2]-(b:Nation)
           RETURN b AS nation ORDER BY nation""",
    )


@_g(
    "g135_cypher_pagination",
    f"""WITH {GRAPH_CTES}
       SELECT dst AS supplier, count(*)::BIGINT AS n_cust,
              sum(n_items)::BIGINT AS items
       FROM graph_edges GROUP BY 1
       ORDER BY n_cust DESC, supplier LIMIT 10 OFFSET 10""",
    note="Cypher SKIP pagination (the supported-but-never-declared "
    "corner of the RETURN tail): page 2 of the supplier fan-in "
    "leaderboard via ORDER BY .. SKIP 10 LIMIT 10 against the SQL "
    "OFFSET form.  Deterministic only because the ORDER BY is total "
    "(count then id) — the same protocol every top-k query here "
    "pins.  Scale: Spark lowers SKIP+LIMIT to limit(skip+n) then a "
    "driver-side tail cut of 10 rows — constant memory; never "
    "paginate without a total order",
)
def g135(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH (c:Customer)-[e:BUYS]->(s:Supplier)
           RETURN s AS supplier, count(*) AS n_cust,
                  sum(e.n_items) AS items
           ORDER BY n_cust DESC, supplier SKIP 10 LIMIT 10""",
    )


@_g(
    "g136_cypher_union",
    f"""WITH {GRAPH_CTES}
       SELECT src AS customer FROM graph_edges WHERE n_items >= 5
       UNION
       SELECT src AS customer FROM (
         SELECT src, count(*) AS deg FROM graph_edges GROUP BY 1) d
       WHERE deg >= 4""",
    note="Cypher UNION between complete subqueries (new compiler "
    "production): big-basket buyers OR high-degree buyers, two "
    "MATCH..RETURN segments compiled independently and combined with "
    "a deduplicating union — the overlap between the branches is "
    "what UNION (vs UNION ALL) removes, which the oracle's SQL UNION "
    "checks exactly.  No post-union ORDER BY (undefined in Cypher; "
    "the driver compare canonicalizes row order).  Scale: two "
    "independent subplans + one distinct on the narrow output — no "
    "cross-branch join ever",
)
def g136(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH (c:Customer)-[e:BUYS]->(s:Supplier)
           WHERE e.n_items >= 5
           RETURN c.node AS customer
           UNION
           MATCH (c2:Customer)-[f:BUYS]->(s2:Supplier)
           WITH c2, count(*) AS deg WHERE deg >= 4
           RETURN c2.node AS customer""",
    )


_TRADE_CTE = """ne AS (
         SELECT 'n'||c.c_nationkey AS src, 'n'||s.s_nationkey AS dst
         FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey
         JOIN customer c ON o.o_custkey=c.c_custkey
         JOIN supplier s ON l.l_suppkey=s.s_suppkey
         GROUP BY 1,2 HAVING count(*) >= 150)"""


@_g(
    "g137_cypher_path_nodes",
    f"""WITH {_TRADE_CTE},
       w1 AS (SELECT src AS a, dst AS b, [src, dst] AS path, 1 AS len FROM ne),
       w2 AS (SELECT w.a, e.dst AS b, list_append(w.path, e.dst) AS path, 2 AS len
              FROM w1 w JOIN ne e ON e.src = w.b),
       w3 AS (SELECT w.a, e.dst AS b, list_append(w.path, e.dst) AS path, 3 AS len
              FROM w2 w JOIN ne e ON e.src = w.b),
       allw AS (SELECT * FROM w1 UNION ALL SELECT * FROM w2
                UNION ALL SELECT * FROM w3),
       sp AS (SELECT a, b, min(len) AS mlen FROM allw GROUP BY 1, 2),
       best AS (SELECT w.a, w.b, s.mlen, min(w.path) AS via
                FROM allw w JOIN sp s
                  ON s.a = w.a AND s.b = w.b AND s.mlen = w.len
                GROUP BY 1, 2, 3)
       SELECT a AS src_nation, b AS dst_nation, mlen::INT AS hops,
              array_to_string(via, '>') AS via
       FROM best ORDER BY 1, 2""",
    note="Cypher NAMED PATH surface (VERDICT r06 item 2): nodes(p) on "
    "a shortestPath binding returns the node array of ONE "
    "representative path, pinned to the LEXICOGRAPHICALLY SMALLEST "
    "shortest path — the BFS frontier carries a per-(a,b) min-path "
    "array, and the greedy per-level min IS the global minimum "
    "because every prefix of the global lex-min path is itself the "
    "lex-min shortest path to its endpoint (a smaller prefix would "
    "splice into a smaller path).  Deterministic under any "
    "partitioning: min() is associative/commutative, so this is a "
    "tie-hazard protocol the oracle pins independently by FULL walk "
    "enumeration (3 unrolled levels, min(len) then min(path)) — "
    "feasible only because the oracle graph is 25 nodes; the Spark "
    "side never enumerates, its frontier stays one row per pair with "
    "a bounded array column (the map-side-combinable min replaces "
    "the distinct).  Scale: same BFS shape as g03/g105 + O(hops) "
    "array payload.  DECLARED-OUTPUT PROTOCOL (VERDICT r07 item 1): "
    "the path renders as a '>'-joined STRING in both engines — the "
    "driver canonicalizer hashes scalar cells only, so an array "
    "column in a declared schema is a protocol violation (the r7 "
    "driver-red); tests/test_declared.py guards every registry "
    "entry's schema atomic-only",
)
def g137(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH p = shortestPath((a:Nation)-[:TRADE*1..3]->(b:Nation))
           RETURN a AS src_nation, b AS dst_nation, length(p) AS hops,
                  array_join(nodes(p), '>') AS via
           ORDER BY src_nation, dst_nation""",
    )


@_g(
    "g138_cypher_undirected_sp",
    f"""WITH RECURSIVE {_TRADE_SYM_CTES},
       r(a, b, len) AS (
         SELECT src, dst, 1 FROM es
         UNION
         SELECT r.a, e.dst, r.len + 1 FROM r JOIN es e ON e.src = r.b
         WHERE r.len < 6)
       SELECT a AS src_nation, b AS dst_nation, min(len)::INT AS hops
       FROM r WHERE a <> b GROUP BY 1, 2 ORDER BY 1, 2""",
    note="undirected shortestPath (VERDICT r06 item 3, refusal "
    "removed): `-[:TRADE*]-` composes the symmetric closure INSIDE "
    "the lowering (distinct union of both orientations, self-loops "
    "dropped — the es-view convention) instead of requiring the "
    "pre-built :TRADE_SYM relationship, so the compiled plan on "
    ":TRADE must equal g105's plan on :TRADE_SYM minus the a==b "
    "rows: BFS trail semantics exclude the level-2 seed backtrack "
    "a-x-a (one undirected relationship used twice); every other "
    "BFS path is node-distinct hence relationship-distinct.  Oracle "
    "= the g105 recursive closure with a <> b.  Scale: one extra "
    "union+distinct of the edge frame before the same semi-naive "
    "BFS; the closure is built once, not per level",
)
def g138(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH p = shortestPath((a:Nation)-[:TRADE*]-(b:Nation))
           RETURN a AS src_nation, b AS dst_nation, length(p) AS hops
           ORDER BY src_nation, dst_nation""",
    )


@_g(
    "g139_cypher_path_enum",
    f"""WITH {_TRADE_CTE},
       w1 AS (SELECT src AS a, dst AS b, [src, dst] AS path FROM ne),
       w2 AS (SELECT w.a, e.dst AS b, list_append(w.path, e.dst) AS path
              FROM w1 w JOIN ne e ON e.src = w.b
              WHERE NOT (w.a = w.b AND w.b = e.dst)),
       allw AS (SELECT a, b, path FROM w1 UNION ALL SELECT a, b, path FROM w2)
       SELECT a AS src_nation, b AS dst_nation,
              count(*)::BIGINT AS n_paths,
              min(array_to_string(path, '>')) AS lex_first
       FROM allw GROUP BY 1, 2 ORDER BY 1, 2""",
    note="GENERAL named-path binding outside shortestPath (VERDICT "
    "r06 item 2's second half): `p = (a)-[:TRADE*1..2]->(b)` "
    "enumerates one row PER PATH with openCypher trail semantics — "
    "the only ≤2-hop relationship reuse is a self-loop taken twice, "
    "filtered on both engines (Spark: array_distinct on the "
    "consecutive-pair list; oracle: the w2 WHERE).  Aggregated to "
    "per-pair path counts + the lex-first path string so the result "
    "stays bounded while still pinning the full enumeration.  "
    "Scale: path enumeration is inherently output-sized (deg^k) — "
    "the hop bound caps the join-chain depth and the label/anchor "
    "filter is pushed below the first join; the pair-distinct "
    "_varlen_leg remains the default when no path variable is bound",
)
def g139(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH p = (a:Nation)-[:TRADE*1..2]->(b:Nation)
           RETURN a AS src_nation, b AS dst_nation, count(*) AS n_paths,
                  min(array_join(nodes(p), '>')) AS lex_first
           ORDER BY src_nation, dst_nation""",
    )


@_g(
    "g142_cypher_allsp_enum",
    f"""WITH {_TRADE_CTE},
       w1 AS (SELECT src AS a, dst AS b, [src, dst] AS path, 1 AS len FROM ne),
       w2 AS (SELECT w.a, e.dst AS b, list_append(w.path, e.dst) AS path, 2 AS len
              FROM w1 w JOIN ne e ON e.src = w.b),
       w3 AS (SELECT w.a, e.dst AS b, list_append(w.path, e.dst) AS path, 3 AS len
              FROM w2 w JOIN ne e ON e.src = w.b),
       allw AS (SELECT * FROM w1 UNION ALL SELECT * FROM w2
                UNION ALL SELECT * FROM w3),
       sp AS (SELECT a, b, min(len) AS mlen FROM allw
              WHERE a <> b GROUP BY 1, 2)
       SELECT w.a AS src_nation, w.b AS dst_nation, s.mlen::INT AS hops,
              array_to_string(w.path, '>') AS path
       FROM allw w JOIN sp s
         ON s.a = w.a AND s.b = w.b AND s.mlen = w.len
       ORDER BY 1, 2, 4""",
    note="allShortestPaths ENUMERATION (VERDICT r07 item 6 — the "
    "documented refusal lifted): nodes(p) on an allShortestPaths "
    "binding returns one row PER distinct shortest path, '>'-joined "
    "per the driver protocol.  The BFS frontier carries one row per "
    "path (first-reach anti-join guarantees every kept row is a "
    "simple path at its pair's minimal level; the prefix property "
    "guarantees completeness), guarded by ALLSP_ENUM_FRONTIER_LIMIT "
    "per level — above it the lowering refuses with a pointer to the "
    "one-row-per-pair counting form (g120).  Oracle = FULL walk "
    "enumeration (3 unrolled levels) keeping every min-length walk — "
    "min-length walks are exactly the simple shortest paths (a "
    "revisit would cut to a shorter walk).  Scale: output-sized by "
    "nature; the guard is the honest contract",
)
def g142(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH p = allShortestPaths((a:Nation)-[:TRADE*1..3]->(b:Nation))
           RETURN a AS src_nation, b AS dst_nation, length(p) AS hops,
                  array_join(nodes(p), '>') AS path
           ORDER BY src_nation, dst_nation, path""",
    )


@_g(
    "g140_cypher_count_subquery",
    f"""WITH {GRAPH_CTES},
       fan AS (SELECT dst, count(*) AS s_fanin FROM graph_edges GROUP BY 1)
       SELECT e.src AS customer, e.dst AS supplier,
              f.s_fanin::BIGINT AS s_fanin
       FROM graph_edges e JOIN fan f ON f.dst = e.dst
       WHERE e.n_items >= 3
       ORDER BY s_fanin DESC, customer, supplier LIMIT 20""",
    note="Cypher COUNT subquery (VERDICT r07 item 5): "
    "`count { (s)<-[:BUYS]-(x) }` as a RETURN expression — lowered to "
    "ONE pre-aggregate over the subpattern grouped on the shared "
    "variable s + ONE left join onto the scope (coalesce 0), never "
    "re-expanding scope rows; the existential x stays inside the "
    "subquery.  Scale: the pre-aggregate is a map-side-combinable "
    "count on the (small) edge rollup, the join a hash join on the "
    "supplier key — same shape as the hand-written g94 degree join.  "
    "Full-tiebreak ORDER (edge keys unique) keeps LIMIT deterministic",
)
def g140(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH (c:Customer)-[e:BUYS]->(s:Supplier)
           WHERE e.n_items >= 3
           RETURN c.node AS customer, s.node AS supplier,
                  count { (s)<-[:BUYS]-(x:Customer) } AS s_fanin
           ORDER BY s_fanin DESC, customer, supplier LIMIT 20""",
    )


@_g(
    "g141_cypher_call_subquery",
    f"""WITH {GRAPH_CTES},
       m AS (SELECT max(n_items) AS mx FROM graph_edges)
       SELECT e.src AS customer, e.dst AS supplier,
              e.n_items::BIGINT AS n_items
       FROM graph_edges e, m WHERE e.n_items = m.mx
       ORDER BY 1, 2""",
    note="Cypher CALL subquery (VERDICT r07 item 5): an UNCORRELATED "
    "`CALL { MATCH .. RETURN max(..) AS mx }` computes a global "
    "threshold once; the following MATCH shares no variable with the "
    "one-row scalar scope, so the compiler cross-joins against it "
    "(the broadcast-threshold idiom — Spark broadcasts the single "
    "aggregate row, the 'cross' join is an appended literal, not a "
    "blowup) and the WHERE filters on it.  Position is honored (a "
    "CALL after an aggregating WITH is NOT hoisted); oracle is the "
    "classic scalar-subquery max filter",
)
def g141(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """CALL { MATCH (x:Customer)-[g:BUYS]->(y:Supplier)
                 RETURN max(g.n_items) AS mx }
           MATCH (c:Customer)-[e:BUYS]->(s:Supplier) WHERE e.n_items = mx
           RETURN c.node AS customer, s.node AS supplier,
                  e.n_items AS n_items
           ORDER BY customer, supplier""",
    )


@_g(
    "g143_cypher_with_topk_expand",
    f"""WITH {GRAPH_CTES},
       fan AS (SELECT dst AS supplier, count(*) AS fanin
               FROM graph_edges GROUP BY 1
               ORDER BY fanin DESC, supplier LIMIT 10)
       SELECT f.supplier, f.fanin::BIGINT AS fanin,
              count(*)::BIGINT AS n_cust,
              sum(e.n_items)::BIGINT AS items
       FROM fan f JOIN graph_edges e ON e.dst = f.supplier
       GROUP BY 1, 2 ORDER BY 1""",
    note="WITH ORDER BY/LIMIT mid-query (r8): the aggregate -> top-k "
    "-> EXPAND idiom — rank suppliers by fan-in, keep the top 10 "
    "(full tiebreak on the supplier key, so the cut is "
    "deterministic), then a SECOND MATCH anchors on the survivors "
    "and re-aggregates their baskets.  Spark plans the stage cut as "
    "TakeOrdered (no global sort survives into the expand join) and "
    "the expand join's build side is 10 rows — the idiom gets "
    "CHEAPER at scale because the cut happens before the re-join.  "
    "ORDER BY without SKIP/LIMIT in a WITH stage is refused as plan "
    "tax (unobservable order)",
)
def g143(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH (c:Customer)-[e:BUYS]->(s:Supplier)
           WITH s, count(*) AS fanin ORDER BY fanin DESC, s LIMIT 10
           MATCH (c2:Customer)-[f:BUYS]->(s)
           RETURN s AS supplier, fanin, count(*) AS n_cust,
                  sum(f.n_items) AS items
           ORDER BY supplier""",
    )


@_g(
    "g144_cypher_correlated_call",
    f"""WITH {GRAPH_CTES},
       cust AS (SELECT DISTINCT src FROM graph_edges),
       agg AS (SELECT src, count(*) AS bulk_deg, sum(n_items) AS bulk_items
               FROM graph_edges WHERE n_items >= 3 GROUP BY 1)
       SELECT c.src AS customer,
              coalesce(a.bulk_deg, 0)::BIGINT AS bulk_deg,
              coalesce(a.bulk_items, 0)::BIGINT AS bulk_items
       FROM cust c LEFT JOIN agg a ON a.src = c.src
       ORDER BY bulk_deg, customer LIMIT 25""",
    note="CORRELATED CALL subquery (VERDICT r08 item 3 — the Neo4j-5 "
    "scope-importing form): `CALL { WITH c MATCH .. RETURN agg }` is "
    "lowered set-at-a-time, never per-row — the body compiles once "
    "with the imported variable as an implicit grouping key and the "
    "pre-aggregate LEFT-joins onto the scope (the count{} shape: one "
    "map-side-combinable aggregate + one hash join at any scope "
    "size).  Zero-match customers keep Neo4j identities (count 0, "
    "sum 0) — the ASC order surfaces exactly those fill rows, so the "
    "oracle pins the left-join semantics, not just the happy path.  "
    "Non-aggregating correlated bodies are refused (row-multiplying; "
    "pointer to OPTIONAL MATCH)",
)
def g144(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH (c:Customer)-[e:BUYS]->(s:Supplier)
           WITH DISTINCT c
           CALL { WITH c
                  MATCH (c)-[f:BUYS]->(x:Supplier) WHERE f.n_items >= 3
                  RETURN count(*) AS bulk_deg, sum(f.n_items) AS bulk_items }
           RETURN c AS customer, bulk_deg, bulk_items
           ORDER BY bulk_deg, customer LIMIT 25""",
    )


@_g(
    "g145_cypher_count_subquery_order_by",
    f"""WITH {GRAPH_CTES},
       bulk AS (SELECT DISTINCT dst FROM graph_edges WHERE n_items >= 3),
       fan AS (SELECT dst, count(*) AS fanin FROM graph_edges GROUP BY 1)
       SELECT b.dst AS s FROM bulk b JOIN fan f ON f.dst = b.dst
       ORDER BY f.fanin DESC, s LIMIT 15""",
    note="count { .. } as an ORDER BY sort key (VERDICT r08 item 6 — "
    "refusal lifted): the pre-aggregate joins onto the PROJECTED "
    "frame on the returned alias, the sort runs on the coalesced "
    "count, and the helper column is projected away — with LIMIT the "
    "whole tail plans as TakeOrderedAndProject, so the un-returned "
    "sort key costs one hash join and no global sort.  Subpatterns "
    "sharing no variable with the RETURN items stay refused",
)
def g145(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cy(
        spark,
        sf_dir,
        """MATCH (c:Customer)-[e:BUYS]->(s:Supplier)
           WHERE e.n_items >= 3
           RETURN DISTINCT s
           ORDER BY count { (s)<-[:BUYS]-(x:Customer) } DESC, s LIMIT 15""",
    )


QUERIES = list(_G)
