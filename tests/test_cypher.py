"""Cypher-subset compiler tests (graph_spark/graph/cypher.py): grammar
errors raise before any job runs, compiled plans match hand-written
DataFrame results, and the plan shape carries no cartesian products.
The fixture-graph end-to-end forms are the declared g89-g93 queries
(oracle-gated in test_declared.py); these tests pin the compiler
itself on a tiny in-memory graph."""

import pytest
from pyspark.sql import functions as F

from graph_spark.graph.cypher import (
    CypherGraph,
    _parse_patterns,
    _rewrite,
    _split_top_level,
    cypher,
)
from graph_spark.graph.property_graph import PropertyGraph


@pytest.fixture(scope="module")
def tiny(spark):
    """Directed weighted diamond + tail: a->b, a->c, b->d, c->d, d->e."""
    edges = spark.createDataFrame(
        [
            ("a", "b", 1, 10.0),
            ("a", "c", 2, 20.0),
            ("b", "d", 3, 30.0),
            ("c", "d", 4, 40.0),
            ("d", "e", 5, 50.0),
        ],
        ["src", "dst", "n_items", "weight"],
    )
    verts = spark.createDataFrame([(x,) for x in "abcde"], ["id"])
    return CypherGraph(
        PropertyGraph(verts, edges),
        labels={"Early": lambda c: c < F.lit("c"), "Any": lambda c: c.isNotNull()},
        rel_types={"E": edges},
    )


# ------------------------------------------------------------- parsing


def test_parse_single_chain():
    t = _parse_patterns("(a:L)-[e:T]->(b)")
    assert len(t) == 1
    left, edge, right = t[0]
    assert (left.var, left.label) == ("a", "L")
    assert (edge.var, edge.etype, edge.reverse) == ("e", "T", False)
    assert right.var == "b" and right.label is None


def test_parse_reverse_and_varlen():
    t = _parse_patterns("(a)<-[e]-(b)-[*2..4]->(c)")
    assert t[0][1].reverse is True
    assert (t[1][1].min_len, t[1][1].max_len) == (2, 4)


def test_parse_multi_pattern_comma():
    t = _parse_patterns("(a)-[]->(b), (b)-[]->(c)")
    assert len(t) == 2
    assert t[1][0].var == "b"


def test_parse_errors():
    with pytest.raises(ValueError, match="expected"):
        _parse_patterns("(a)-[e:T")
    with pytest.raises(ValueError, match="at least one edge"):
        _parse_patterns("(a)")
    with pytest.raises(ValueError, match="cannot bind an edge"):
        _parse_patterns("(a)-[e*1..2]->(b)")
    with pytest.raises(ValueError, match="capped at 6"):
        _parse_patterns("(a)-[*1..9]->(b)")
    with pytest.raises(ValueError, match="1 <= min <= max"):
        _parse_patterns("(a)-[*3..2]->(b)")


def test_rewrite_props():
    out = _rewrite("e.n_items >= 3 AND a.node < b.node", {"a", "b"}, {"e"})
    assert out == "e__n_items >= 3 AND a < b"
    with pytest.raises(ValueError, match="no property"):
        _rewrite("a.age > 1", {"a"}, set())
    # quoted literals are never rewritten
    assert (
        _rewrite("a.node <> 'a.node' AND b.node <> \"e.x\"", {"a", "b"}, {"e"})
        == "a <> 'a.node' AND b <> \"e.x\""
    )


def test_bracket_list_literals():
    from graph_spark.graph.cypher import _bracket_lists_to_array

    assert _bracket_lists_to_array("[1, 2, 3]") == "array(1, 2, 3)"
    # after IN the bracket list becomes a plain SQL value list
    assert _bracket_lists_to_array("x IN ['a','b']") == "x IN ('a','b')"
    # subscripts stay subscripts; a literal can itself be subscripted
    assert _bracket_lists_to_array("arr[0]") == "arr[0]"
    assert _bracket_lists_to_array("[1,2][0]") == "array(1,2)[0]"
    # nesting and quoted brackets
    assert _bracket_lists_to_array("[[1],[2]]") == "array(array(1),array(2))"
    assert _bracket_lists_to_array("'[1]' = s") == "'[1]' = s"
    # via _rewrite (the expression entry point)
    assert _rewrite("a.node IN ['a', 'b']", {"a"}, set()) == "a IN ('a', 'b')"


def test_bracket_list_in_where_and_return(tiny):
    got = cypher(
        tiny,
        "MATCH (x)-[e:E]->(y) WHERE x.node IN ['a', 'b'] "
        "RETURN x, y, size([1,2,3]) AS n ORDER BY x, y",
    ).collect()
    assert [(r.x, r.y, r.n) for r in got] == [
        ("a", "b", 3), ("a", "c", 3), ("b", "d", 3),
    ]


def test_split_top_level_respects_parens_and_quotes():
    assert _split_top_level("a, f(x, y), 'p,q'") == ["a", "f(x, y)", "'p,q'"]


# ------------------------------------------------------ compiled plans


def test_unsupported_clauses_refused(tiny):
    for q in (
        "MATCH (a)-[]->(b) CREATE (c) RETURN a",
        "MATCH (a)-[]->(b) SET a.x = 1 RETURN a",
        "MATCH (a)-[]->(b) MERGE (c) RETURN a",
    ):
        with pytest.raises(ValueError, match="not supported"):
            cypher(tiny, q)
    # clauses after RETURN are refused (RETURN must be last)
    with pytest.raises(ValueError, match="RETURN"):
        cypher(tiny, "MATCH (a)-[]->(b) RETURN a UNWIND x AS y")
    # a query CANNOT start with OPTIONAL MATCH (needs a required scope)
    with pytest.raises(ValueError, match="expected MATCH"):
        cypher(tiny, "OPTIONAL MATCH (a)-[]->(b) RETURN a")


def test_multi_with_chain(tiny):
    """WITH..WITH..RETURN chains: each stage's aliases are the next
    stage's scope; agg -> agg -> plain projection."""
    rows = cypher(
        tiny,
        """MATCH (u)-[e]->(v)
           WITH v.node AS v, count(*) AS indeg WHERE indeg >= 2
           WITH indeg, count(*) AS n
           RETURN indeg, n""",
    ).collect()
    assert [(r.indeg, r.n) for r in rows] == [(2, 1)]


def test_multi_with_project_between_aggs(tiny):
    """Non-aggregate WITH between two aggregates (the g113 shape)."""
    rows = cypher(
        tiny,
        """MATCH (u)-[e]->(v)
           WITH u, sum(e.n_items) AS ti
           WITH u, ti * 2 AS t2
           RETURN sum(t2) AS total""",
    ).collect()
    # n_items total = 1+2+3+4+5 = 15, doubled = 30
    assert rows[0].total == 30


def test_with_stage_having(tiny):
    # WITH + WHERE on the aggregate = Cypher's HAVING
    rows = cypher(
        tiny,
        """MATCH (u)-[e]->(v)
           WITH v.node AS v, count(*) AS indeg WHERE indeg >= 2
           RETURN v, indeg ORDER BY v""",
    ).collect()
    assert [(r.v, r.indeg) for r in rows] == [("d", 2)]


def test_with_stage_reaggregation(tiny):
    rows = cypher(
        tiny,
        """MATCH (u)-[e]->(v)
           WITH u.node AS u, count(*) AS outdeg
           RETURN max(outdeg) AS mx, count(*) AS n_nodes""",
    ).collect()
    assert [(r.mx, r.n_nodes) for r in rows] == [(2, 4)]


def test_with_distinct(tiny):
    rows = cypher(
        tiny,
        """MATCH (u)-[e]->(v) WITH DISTINCT v.node AS t
           RETURN count(*) AS n""",
    ).collect()
    assert rows[0].n == 4


def test_disconnected_pattern_refused(tiny):
    with pytest.raises(ValueError, match="disconnected"):
        cypher(tiny, "MATCH (a)-[]->(b), (c)-[]->(d) RETURN a, c")


def test_unknown_label_and_type(tiny):
    with pytest.raises(ValueError, match="unknown label"):
        cypher(tiny, "MATCH (a:Nope)-[]->(b) RETURN a")
    with pytest.raises(ValueError, match="unknown relationship type"):
        cypher(tiny, "MATCH (a)-[:NOPE]->(b) RETURN a")


def test_label_conflict(tiny):
    with pytest.raises(ValueError, match="two labels"):
        cypher(tiny, "MATCH (a:Early)-[]->(b), (a:Any)-[]->(c) RETURN a")


def test_simple_match_where_return(tiny):
    rows = cypher(
        tiny,
        """MATCH (u)-[e:E]->(v) WHERE e.n_items >= 3
           RETURN u.node AS u, v.node AS v, e.weight AS w ORDER BY w""",
    ).collect()
    assert [(r.u, r.v, r.w) for r in rows] == [
        ("b", "d", 30.0),
        ("c", "d", 40.0),
        ("d", "e", 50.0),
    ]


def test_reverse_edge_and_shared_join(tiny):
    # fan-in at d: (b)-[..]->(d)<-[..]-(c)
    rows = cypher(
        tiny,
        """MATCH (x)-[e]->(m)<-[f]-(y) WHERE x.node < y.node
           RETURN x.node AS x, m.node AS m, y.node AS y,
                  e.weight + f.weight AS tot""",
    ).collect()
    assert [(r.x, r.m, r.y, r.tot) for r in rows] == [("b", "d", "c", 70.0)]


def test_label_filter_applied(tiny):
    rows = cypher(
        tiny, "MATCH (u:Early)-[]->(v) RETURN u.node AS u, v.node AS v ORDER BY u, v"
    ).collect()
    assert [(r.u, r.v) for r in rows] == [
        ("a", "b"),
        ("a", "c"),
        ("b", "d"),
    ]


def test_implicit_groupby_and_order(tiny):
    rows = cypher(
        tiny,
        """MATCH (u)-[e]->(v)
           RETURN u.node AS u, count(*) AS n, sum(e.weight) AS w
           ORDER BY n DESC, u""",
    ).collect()
    assert [(r.u, r.n, r.w) for r in rows] == [
        ("a", 2, 30.0),
        ("b", 1, 30.0),
        ("c", 1, 40.0),
        ("d", 1, 50.0),
    ]


def test_varlen_union_of_chains(tiny):
    rows = cypher(
        tiny,
        """MATCH (u)-[*1..3]->(v) WHERE u.node = 'a'
           RETURN u.node AS u, v.node AS v ORDER BY v""",
    ).collect()
    # 1 hop: b, c; 2 hops: d (x2 deduped); 3 hops: e
    assert [(r.u, r.v) for r in rows] == [
        ("a", "b"),
        ("a", "c"),
        ("a", "d"),
        ("a", "e"),
    ]


def test_distinct_and_limit(tiny):
    rows = cypher(
        tiny,
        "MATCH (u)-[*1..2]->(v) RETURN DISTINCT v.node AS v ORDER BY v LIMIT 3",
    ).collect()
    assert [r.v for r in rows] == ["b", "c", "d"]


def test_skip_and_limit(tiny):
    rows = cypher(
        tiny,
        "MATCH (u)-[e]->(v) RETURN v.node AS v ORDER BY e.weight SKIP 2 LIMIT 2",
    ).collect()
    # weights 10,20,30,40,50 -> targets b,c,d,d,e; skip 2 -> d,d
    assert [r.v for r in rows] == ["d", "d"]


def test_self_loop_pattern(spark):
    """(x)-[]->(x) must match self-loops, not die on duplicate column
    names (the :TRADE binding keeps self-loops, so this is reachable)."""
    edges = spark.createDataFrame(
        [("a", "a"), ("a", "b"), ("b", "b"), ("b", "c")], ["src", "dst"]
    )
    verts = edges.select(F.col("src").alias("id")).union(edges.select("dst")).distinct()
    g = PropertyGraph(verts, edges)
    rows = cypher(g, "MATCH (x)-[]->(x) RETURN x.node AS x ORDER BY x").collect()
    assert [r.x for r in rows] == ["a", "b"]
    # self-loop leg chained to a normal leg
    rows = cypher(
        g,
        """MATCH (x)-[]->(x)-[]->(y) WHERE x.node <> y.node
           RETURN x.node AS x, y.node AS y ORDER BY x, y""",
    ).collect()
    assert [(r.x, r.y) for r in rows] == [("a", "b"), ("b", "c")]


def test_triangle_like_cycle_join(spark):
    # 3-cycle graph: the closing leg must join on BOTH bound endpoints
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")], ["src", "dst"]
    )
    verts = edges.select(F.col("src").alias("id")).distinct()
    rows = cypher(
        PropertyGraph(verts, edges),
        """MATCH (x)-[]->(y)-[]->(z)-[]->(x)
           RETURN x.node AS x, y.node AS y, z.node AS z ORDER BY x, y, z""",
    ).collect()
    assert [(r.x, r.y, r.z) for r in rows] == [
        ("a", "b", "c"),
        ("b", "c", "a"),
        ("c", "a", "b"),
    ]


def test_no_cartesian_in_plan(tiny):
    df = cypher(
        tiny,
        """MATCH (x)-[e]->(m)<-[f]-(y) WHERE x.node < y.node
           RETURN m.node AS m, count(*) AS n""",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_property_map_node_and_edge(tiny):
    rows = cypher(
        tiny,
        "MATCH (u {node: 'a'})-[e:E {n_items: 2}]->(v) RETURN v.node AS v",
    ).collect()
    assert [r.v for r in rows] == ["c"]
    with pytest.raises(ValueError, match="no property"):
        cypher(tiny, "MATCH (u {age: 3})-[]->(v) RETURN v")
    with pytest.raises(ValueError, match="no property"):
        cypher(tiny, "MATCH (u)-[e {missing: 3}]->(v) RETURN v")
    with pytest.raises(ValueError, match="variable-length"):
        cypher(tiny, "MATCH (u)-[*1..2 {n_items: 2}]->(v) RETURN v")


def test_optional_match_null_extends(tiny):
    # every node's outgoing heavy edge (weight >= 40): a/b have none
    rows = cypher(
        tiny,
        """MATCH (u)-[e]->(v)
           OPTIONAL MATCH (v)-[f]->(w) WHERE f.weight >= 40
           RETURN u.node AS u, v.node AS v, w.node AS w ORDER BY u, v, w""",
    ).collect()
    assert [(r.u, r.v, r.w) for r in rows] == [
        ("a", "b", None),          # b->d is 30, filtered -> null-extended
        ("a", "c", "d"),           # c->d 40 passes
        ("b", "d", "e"),
        ("c", "d", "e"),
        ("d", "e", None),          # e has no out-edges
    ]


def test_optional_match_where_outer_reference(tiny):
    # WHERE in the optional block references the OUTER variable u:
    # rows failing it null-extend instead of dropping
    rows = cypher(
        tiny,
        """MATCH (u)-[e]->(v)
           OPTIONAL MATCH (v)-[f]->(w) WHERE u.node = 'a'
           RETURN u.node AS u, v.node AS v, w.node AS w ORDER BY u, v, w""",
    ).collect()
    got = [(r.u, r.v, r.w) for r in rows]
    assert ("a", "b", "d") in got and ("b", "d", None) in got


def test_optional_match_count_semantics(tiny):
    # count(f.weight) skips nulls, count(*) counts the row
    rows = cypher(
        tiny,
        """MATCH (u)-[e]->(v)
           OPTIONAL MATCH (v)-[f]->(w) WHERE f.weight >= 40
           RETURN v.node AS v, count(*) AS n_rows, count(f.weight) AS n_heavy
           ORDER BY v""",
    ).collect()
    assert [(r.v, r.n_rows, r.n_heavy) for r in rows] == [
        ("b", 1, 0),
        ("c", 1, 1),  # c->d weight 40 passes the >= 40 cut
        ("d", 2, 2),
        ("e", 1, 0),
    ]


def test_optional_match_disconnected_refused(tiny):
    with pytest.raises(ValueError, match="shares no variable"):
        cypher(
            tiny,
            "MATCH (u)-[]->(v) OPTIONAL MATCH (x)-[]->(y) RETURN u, x",
        )


def test_sequential_match_inner_joins(tiny):
    # second MATCH is an INNER join: rows without a continuation drop
    # (contrast with test_optional_match_null_extends)
    rows = cypher(
        tiny,
        """MATCH (u)-[e]->(v)
           MATCH (v)-[f]->(w) WHERE f.weight >= 40
           RETURN u.node AS u, v.node AS v, w.node AS w ORDER BY u, v, w""",
    ).collect()
    assert [(r.u, r.v, r.w) for r in rows] == [
        ("a", "c", "d"),
        ("b", "d", "e"),
        ("c", "d", "e"),
    ]


def test_edge_var_reuse_refused(tiny):
    with pytest.raises(ValueError, match="bound twice"):
        cypher(tiny, "MATCH (a)-[e]->(b), (b)-[e]->(c) RETURN a")


def test_engine_cypher_matches_handwritten(spark):
    """Engine.cypher on the fixture graph == the hand-written DataFrame
    (the g89 co-purchase shape, sf0.001)."""
    from graph_spark.catalog import Catalog
    from graph_spark.engine import Engine

    eng = Engine(spark, "/root/testdata/sf0.001")
    got = eng.cypher(
        """MATCH (a:Customer)-[e:BUYS]->(s:Supplier)<-[f:BUYS]-(b:Customer)
           WHERE e.n_items >= 3 AND f.n_items >= 3 AND a.node < b.node
           RETURN s.node AS supplier, count(*) AS n_pairs
           ORDER BY n_pairs DESC, supplier"""
    ).collect()
    e = Catalog(spark, "/root/testdata/sf0.001").graph_edges().filter(
        F.col("n_items") >= 3
    )
    l, r = e.alias("l"), e.alias("r")
    want = (
        l.join(r, (F.col("l.dst") == F.col("r.dst")) & (F.col("l.src") < F.col("r.src")))
        .groupBy(F.col("l.dst").alias("supplier"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy(F.desc("n_pairs"), "supplier")
        .collect()
    )
    assert [tuple(x) for x in got] == [tuple(x) for x in want]


def test_engine_cypher_trade_self_loop(spark):
    """The :TRADE binding keeps self-loops by design — the self-loop
    pattern must compile and match them end-to-end (was
    AMBIGUOUS_REFERENCE before the aliasing fix)."""
    from graph_spark.engine import Engine

    eng = Engine(spark, "/root/testdata/sf0.001")
    rows = eng.cypher(
        "MATCH (a:Nation)-[:TRADE]->(a) RETURN a.node AS a ORDER BY a"
    ).collect()
    # nations trade with themselves in TPC-H-ish data; result is the
    # (possibly empty) set of self-trading nations, not an exception
    assert all(r.a.startswith("n") for r in rows)


def test_shortest_path_basic(tiny):
    """Diamond: a reaches d in 2 hops (two routes), e in 3; first-reach
    level is the shortest length."""
    df = cypher(
        tiny,
        "MATCH p = shortestPath((a {node: 'a'})-[*]->(b)) "
        "RETURN b, length(p) AS hops ORDER BY hops, b",
    )
    assert [tuple(r) for r in df.collect()] == [
        ("b", 1),
        ("c", 1),
        ("d", 2),
        ("e", 3),
    ]


def test_shortest_path_min_bound_and_plen_alias(tiny):
    """*2..3 drops the 1-hop rows; p.len is the same column as
    length(p)."""
    df = cypher(
        tiny,
        "MATCH p = shortestPath((a {node: 'a'})-[:E*2..3]->(b)) "
        "RETURN b, p.len AS hops ORDER BY hops, b",
    )
    assert [tuple(r) for r in df.collect()] == [("d", 2), ("e", 3)]


def test_shortest_path_joins_with_second_block(tiny):
    """shortestPath frame participates in later MATCH joins via shared
    endpoints."""
    df = cypher(
        tiny,
        "MATCH p = shortestPath((a {node: 'a'})-[*]->(b)) "
        "MATCH (b)-[e]->(c) "
        "RETURN b, length(p) AS hops, c ORDER BY b, c",
    )
    rows = [tuple(r) for r in df.collect()]
    assert ("b", 1, "d") in rows and ("d", 2, "e") in rows


def test_shortest_path_two_patterns_refused(tiny):
    with pytest.raises(ValueError, match="exactly one"):
        cypher(
            tiny,
            "MATCH p = shortestPath((a)-[]->(b), (b)-[]->(c)) RETURN a",
        )


def test_shortest_path_reverse_direction(tiny):
    """<-[*]- walks the transposed graph: who reaches d, and in how
    many hops."""
    df = cypher(
        tiny,
        "MATCH p = shortestPath((a {node: 'd'})<-[*]-(b)) "
        "RETURN b, length(p) AS hops ORDER BY hops, b",
    )
    assert [tuple(r) for r in df.collect()] == [
        ("b", 1),
        ("c", 1),
        ("a", 2),
    ]


# ------------------------------------------------- weighted shortestPath


def test_weighted_shortest_path_basic(tiny):
    """{cost: 'weight'} minimizes total edge weight: d via b (10+30=40)
    beats d via c (20+40=60)."""
    df = cypher(
        tiny,
        "MATCH p = shortestPath((a {node: 'a'})-[:E* {cost: 'weight'}]->(b)) "
        "RETURN b, CAST(p.cost AS BIGINT) AS cost ORDER BY cost, b",
    )
    assert [tuple(r) for r in df.collect()] == [
        ("b", 10),
        ("c", 20),
        ("d", 40),
        ("e", 90),
    ]


def test_weighted_shortest_path_hop_bound(tiny):
    """*1..2 bounds the relaxation rounds: e (3 hops) is unreachable."""
    df = cypher(
        tiny,
        "MATCH p = shortestPath((a {node: 'a'})-[:E*1..2 {cost: 'n_items'}]->(b)) "
        "RETURN b, CAST(p.cost AS BIGINT) AS cost ORDER BY cost, b",
    )
    assert [tuple(r) for r in df.collect()] == [("b", 1), ("c", 2), ("d", 4)]


def test_weighted_shortest_path_refusals(tiny):
    with pytest.raises(ValueError, match="anchored source"):
        cypher(
            tiny,
            "MATCH p = shortestPath((a)-[:E* {cost: 'weight'}]->(b)) RETURN b",
        )
    with pytest.raises(ValueError, match="cost"):
        cypher(
            tiny,
            "MATCH p = shortestPath((a {node: 'a'})-[:E* {w: 'weight'}]->(b)) RETURN b",
        )
    with pytest.raises(ValueError, match="\\*1\\.\\.max"):
        cypher(
            tiny,
            "MATCH p = shortestPath((a {node: 'a'})-[:E*2..3 {cost: 'weight'}]->(b)) RETURN b",
        )
    with pytest.raises(ValueError, match="no\\s+property 'nope'"):
        cypher(
            tiny,
            "MATCH p = shortestPath((a {node: 'a'})-[:E* {cost: 'nope'}]->(b)) RETURN b",
        )
    # property maps on var-length edges OUTSIDE shortestPath still refuse
    with pytest.raises(ValueError, match="only supported inside shortestPath"):
        cypher(tiny, "MATCH (a)-[*1..2 {cost: 'weight'}]->(b) RETURN a, b")


def test_weighted_shortest_path_kernel_parity(spark):
    """The g115 cypher string and a direct shortest_paths_weighted call
    on the same :TRADE_W edges agree (both kernel routes)."""
    from graph_spark.catalog import Catalog
    from graph_spark.graph.algorithms import shortest_paths_weighted
    from graph_spark.graph.property_graph import PropertyGraph
    from graph_spark.queries.gsuite import QUERIES, cypher_graph

    from .conftest import SF_SMOKE

    g115 = next(q for q in QUERIES if q.name == "g115_cypher_weighted_path")
    got = {(r.dest, r.cost) for r in g115.build(spark, SF_SMOKE).collect()}

    ne_w = cypher_graph(Catalog(spark, SF_SMOKE)).rel_types["TRADE_W"]
    verts = (
        ne_w.select(F.col("src").alias("id"))
        .unionByName(ne_w.select(F.col("dst").alias("id")))
        .distinct()
    )
    pg = PropertyGraph(verts, ne_w)
    for local in (True, False):
        dist = shortest_paths_weighted(pg, "n11", "w", max_iter=6, local=local)
        want = {
            (r.node, int(r.dist)) for r in dist.collect() if r.node != "n11"
        }
        assert got == want, f"local={local}"


# --------------------------------------------------- MATCH after WITH


def test_match_after_with(tiny):
    """The aggregate-then-expand idiom: WITH aliases anchor the next
    MATCH block."""
    rows = cypher(
        tiny,
        """MATCH (u)-[e]->(v)
           WITH v.node AS hub, count(*) AS indeg WHERE indeg >= 2
           MATCH (hub)-[f]->(w)
           RETURN hub, indeg, w.node AS w""",
    ).collect()
    assert [(r.hub, r.indeg, r.w) for r in rows] == [("d", 2, "e")]


def test_optional_match_after_with(tiny):
    """OPTIONAL MATCH after WITH null-extends hubs with no expansion."""
    rows = cypher(
        tiny,
        """MATCH (u)-[e]->(v)
           WITH v.node AS hub, count(*) AS indeg
           OPTIONAL MATCH (hub)-[f]->(w)
           RETURN hub, w.node AS w ORDER BY hub, w""",
    ).collect()
    got = [(r.hub, r.w) for r in rows]
    assert ("e", None) in got and ("d", "e") in got


def test_match_after_with_disconnected_refused(tiny):
    with pytest.raises(ValueError, match="shares no variable"):
        cypher(
            tiny,
            """MATCH (u)-[e]->(v)
               WITH v.node AS hub, count(*) AS indeg
               MATCH (x)-[f]->(y)
               RETURN hub, x""",
        )


def test_multiple_return_refused(tiny):
    with pytest.raises(ValueError, match="RETURN"):
        cypher(tiny, "MATCH (a)-[]->(b) RETURN a RETURN b")


# --------------------------------------------------------------- UNWIND


def test_unwind_collected_list(tiny):
    """collect-then-re-expand: collect_list in WITH, UNWIND back to
    rows, re-aggregate."""
    rows = cypher(
        tiny,
        """MATCH (u)-[e]->(v)
           WITH u.node AS src, collect_list(v.node) AS outs
           UNWIND outs AS o
           RETURN src, count(*) AS n, min(o) AS first_out
           ORDER BY src""",
    ).collect()
    assert [(r.src, r.n, r.first_out) for r in rows] == [
        ("a", 2, "b"),
        ("b", 1, "d"),
        ("c", 1, "d"),
        ("d", 1, "e"),
    ]


def test_unwind_literal_array_with_where(tiny):
    rows = cypher(
        tiny,
        """MATCH (u)-[e]->(v) WHERE u.node = 'a'
           UNWIND array(1, 2, 3) AS k WHERE k >= 2
           RETURN v.node AS v, k ORDER BY v, k""",
    ).collect()
    assert [(r.v, r.k) for r in rows] == [
        ("b", 2),
        ("b", 3),
        ("c", 2),
        ("c", 3),
    ]


def test_unwind_bad_syntax_refused(tiny):
    with pytest.raises(ValueError, match="UNWIND"):
        cypher(tiny, "MATCH (a)-[]->(b) UNWIND 1, 2 RETURN a")


def test_all_shortest_paths_counts(tiny):
    """Diamond: two distinct shortest routes a->d and a->e."""
    df = cypher(
        tiny,
        "MATCH p = allShortestPaths((a {node: 'a'})-[*]->(b)) "
        "RETURN b, length(p) AS hops, p.cnt AS n_paths ORDER BY hops, b",
    )
    assert [tuple(r) for r in df.collect()] == [
        ("b", 1, 1),
        ("c", 1, 1),
        ("d", 2, 2),
        ("e", 3, 2),
    ]


def test_all_shortest_paths_weighted_refused(tiny):
    with pytest.raises(ValueError, match="cost"):
        cypher(
            tiny,
            "MATCH p = allShortestPaths((a {node: 'a'})-[:E* {cost: 'weight'}]->(b)) RETURN b",
        )


# -------------------------------------------- pattern predicates (r5)


def test_exists_pattern_semi_join(tiny):
    """EXISTS { (y)-[:E]->(z) } keeps only pairs whose far endpoint has
    an outgoing edge; z is existential and never enters the scope."""
    df = cypher(
        tiny,
        "MATCH (x)-[:E]->(y) WHERE EXISTS { (y)-[:E]->(z) } "
        "RETURN x, y ORDER BY x, y",
    )
    assert [tuple(r) for r in df.collect()] == [
        ("a", "b"),
        ("a", "c"),
        ("b", "d"),
        ("c", "d"),
    ]
    assert df.columns == ["x", "y"]


def test_not_pattern_anti_join(tiny):
    """NOT (y)-[:E]->(z): the bare negated-pattern sugar is an anti
    join — only d->e survives (e has no outgoing edge)."""
    df = cypher(
        tiny,
        "MATCH (x)-[:E]->(y) WHERE NOT (y)-[:E]->(z) RETURN x, y",
    )
    assert [tuple(r) for r in df.collect()] == [("d", "e")]


def test_not_exists_matches_bare_not(tiny):
    a = cypher(
        tiny,
        "MATCH (x)-[:E]->(y) WHERE NOT EXISTS { (y)-[:E]->(z) } RETURN x, y",
    ).collect()
    b = cypher(
        tiny, "MATCH (x)-[:E]->(y) WHERE NOT (y)-[:E]->(z) RETURN x, y"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bare_positive_pattern_predicate(tiny):
    """A bare (y)-[:E]->(z) conjunct is EXISTS sugar."""
    a = cypher(
        tiny, "MATCH (x)-[:E]->(y) WHERE (y)-[:E]->(z) RETURN x, y"
    ).collect()
    b = cypher(
        tiny, "MATCH (x)-[:E]->(y) WHERE EXISTS { (y)-[:E]->(z) } RETURN x, y"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_exists_with_property_map_and_mixed_conjuncts(tiny):
    """Pattern predicates compose with plain boolean conjuncts, and the
    inline property map filters the existential edge (only d has an
    outgoing n_items=5 edge)."""
    df = cypher(
        tiny,
        "MATCH (x)-[e:E]->(y) WHERE e.n_items >= 2 "
        "AND EXISTS { (y)-[:E {n_items: 5}]->(w) } AND x.node <> 'zzz' "
        "RETURN x, y ORDER BY x",
    )
    assert [tuple(r) for r in df.collect()] == [("b", "d"), ("c", "d")]


def test_exists_paren_delimited(tiny):
    df = cypher(
        tiny,
        "MATCH (x)-[:E]->(y) WHERE EXISTS ((y)-[:E]->(z)) RETURN x, y",
    )
    assert len(df.collect()) == 4


def test_exists_both_endpoints_bound(tiny):
    """NOT (x)-[:E]->(y) with BOTH variables bound anti-joins the
    matched pair itself — empty by construction."""
    df = cypher(
        tiny, "MATCH (x)-[:E]->(y) WHERE NOT (x)-[:E]->(y) RETURN x, y"
    )
    assert df.collect() == []


def test_exists_plan_is_semi_anti_no_cartesian(tiny):
    semi = cypher(
        tiny, "MATCH (x)-[:E]->(y) WHERE EXISTS { (y)-[:E]->(z) } RETURN x, y"
    )
    anti = cypher(
        tiny, "MATCH (x)-[:E]->(y) WHERE NOT (y)-[:E]->(z) RETURN x, y"
    )
    ps = semi._jdf.queryExecution().executedPlan().toString()
    pa = anti._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in ps and "LeftAnti" in pa
    for p in (ps, pa):
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p


def test_exists_no_shared_variable_refused(tiny):
    with pytest.raises(ValueError, match="shares no variable"):
        cypher(
            tiny,
            "MATCH (x)-[:E]->(y) WHERE EXISTS { (p)-[:E]->(q) } RETURN x",
        )


def test_exists_or_scalar(tiny):
    """Scalar OR pattern predicate: rows where x='a' (a->b, a->c) union
    rows whose far endpoint has an outgoing edge (a->b, a->c, b->d,
    c->d)."""
    got = cypher(
        tiny,
        "MATCH (x)-[:E]->(y) WHERE x.node = 'a' OR "
        "EXISTS { (y)-[:E]->(z) } RETURN x ORDER BY x",
    ).collect()
    assert [r.x for r in got] == ["a", "a", "b", "c"]


def test_exists_or_not_pattern(tiny):
    """OR of a positive EXISTS and a negated bare pattern: y has an
    outgoing edge OR x has no incoming edge."""
    got = cypher(
        tiny,
        "MATCH (x)-[:E]->(y) WHERE EXISTS { (y)-[:E]->(z) } OR "
        "NOT (x)<-[:E]-(w) RETURN x, y ORDER BY x, y",
    ).collect()
    assert [(r.x, r.y) for r in got] == [
        ("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"),
    ]


def test_exists_or_group_as_conjunct(tiny):
    """A parenthesized OR of pattern predicates works as one AND
    conjunct next to scalar conjuncts."""
    got = cypher(
        tiny,
        "MATCH (x)-[:E]->(y) WHERE x.node <> 'c' AND "
        "(EXISTS { (y)-[:E]->(z) } OR y.node = 'e') "
        "RETURN x, y ORDER BY x, y",
    ).collect()
    assert [(r.x, r.y) for r in got] == [
        ("a", "b"), ("a", "c"), ("b", "d"), ("d", "e"),
    ]


def test_exists_or_preserves_duplicate_rows(tiny):
    """The existence-flag lowering must not collapse legitimately
    duplicated scope rows (a union/distinct lowering would)."""
    got = cypher(
        tiny,
        "MATCH (x)-[:E]->(y) WHERE EXISTS { (x)-[:E]->(w) } OR "
        "x.node = 'zz' RETURN x ORDER BY x",
    ).collect()
    # every edge's source has an outgoing edge; a emits TWO rows
    assert [r.x for r in got] == ["a", "a", "b", "c", "d"]


def test_exists_or_mixed_and_refused(tiny):
    """A disjunct that ANDs a pattern with a scalar has no flag
    lowering — refused with a cypher-level message."""
    with pytest.raises(ValueError, match="OR disjunct"):
        cypher(
            tiny,
            "MATCH (x)-[:E]->(y) WHERE EXISTS { (y)-[:E]->(z) } OR "
            "(x.node = 'a' AND EXISTS { (x)-[:E]->(w) }) RETURN x",
        )


def test_undirected_bare_pattern_under_or_lowers(tiny):
    """An undirected bare pattern under OR lowers through the same
    existence-flag machinery as the directed forms (this was a refusal
    before undirected patterns were supported).  Every node in the
    diamond has SOME undirected neighbor, so only the x='a' disjunct
    keeps rows."""
    got = cypher(
        tiny,
        "MATCH (x)-[:E]->(y) WHERE x.node = 'a' OR "
        "NOT (y)-[:E]-(z) RETURN x ORDER BY x",
    ).collect()
    assert [r.x for r in got] == ["a", "a"]


def test_truncated_bare_pattern_under_or_refused(tiny):
    """A disjunct that LOOKS like a pattern but cannot parse must raise
    the clean cypher refusal, not an opaque Spark SQL parse error."""
    with pytest.raises(ValueError, match="cypher"):
        cypher(
            tiny,
            "MATCH (x)-[:E]->(y) WHERE x.node = 'a' OR "
            "NOT -[:E]->(z) RETURN x",
        )


def test_exists_in_optional_match_where(tiny):
    """A pattern predicate in an OPTIONAL MATCH WHERE decides whether
    the optional pattern MATCHED (openCypher): failing rows null-extend
    instead of disappearing — the semi-join applies to the optional
    side BEFORE the left join."""
    got = cypher(
        tiny,
        "MATCH (x)-[:E]->(y) OPTIONAL MATCH (y)-[:E]->(z) "
        "WHERE EXISTS { (z)-[:E]->(w) } RETURN x, y, z ORDER BY x, y",
    ).collect()
    assert [(r.x, r.y, r.z) for r in got] == [
        ("a", "b", "d"),
        ("a", "c", "d"),
        ("b", "d", None),  # (d)->(e) exists but e has no outgoing edge
        ("c", "d", None),
        ("d", "e", None),
    ]


def test_not_pattern_in_optional_match_where(tiny):
    """NOT pattern predicate on the optional side: keep only optional
    rows whose far endpoint has NO outgoing edge."""
    got = cypher(
        tiny,
        "MATCH (x)-[:E]->(y) OPTIONAL MATCH (y)-[:E]->(z) "
        "WHERE NOT (z)-[:E]->(w) RETURN x, y, z ORDER BY x, y",
    ).collect()
    assert [(r.x, r.y, r.z) for r in got] == [
        ("a", "b", None),
        ("a", "c", None),
        ("b", "d", "e"),
        ("c", "d", "e"),
        ("d", "e", None),
    ]


def test_outer_only_var_in_optional_exists_refused(tiny):
    """A pattern predicate referencing only OUTER variables has no
    column on the optional side — clean refusal, not a Spark error."""
    with pytest.raises(ValueError, match="cypher"):
        cypher(
            tiny,
            "MATCH (x)-[:E]->(y) OPTIONAL MATCH (y)-[:E]->(z) "
            "WHERE EXISTS { (q)-[:E]->(x2) } RETURN x, y, z",
        )


def test_exists_in_with_where(tiny):
    """Pattern predicates work in a WITH stage's WHERE: aggregate then
    keep only far endpoints that still have an outgoing edge."""
    df = cypher(
        tiny,
        "MATCH (x)-[:E]->(y) WITH y, count(*) AS fanin "
        "WHERE EXISTS { (y)-[:E]->(z) } RETURN y, fanin ORDER BY y",
    )
    assert [tuple(r) for r in df.collect()] == [("b", 1), ("c", 1), ("d", 2)]


def test_boolean_not_still_works(tiny):
    """A boolean NOT (..) conjunct must NOT be mistaken for a pattern."""
    df = cypher(
        tiny,
        "MATCH (x)-[e:E]->(y) WHERE NOT (e.n_items > 2) RETURN x, y ORDER BY x, y",
    )
    assert [tuple(r) for r in df.collect()] == [("a", "b"), ("a", "c")]


# ------------------------------------ expression passthrough sweep (r5)


def test_case_expression_in_return(tiny):
    """CASE WHEN passes through to Spark SQL, including as an implicit
    group key."""
    df = cypher(
        tiny,
        "MATCH (x)-[e:E]->(y) "
        "RETURN CASE WHEN e.n_items >= 3 THEN 'big' ELSE 'small' END AS band, "
        "count(*) AS n ORDER BY band",
    )
    assert [tuple(r) for r in df.collect()] == [("big", 3), ("small", 2)]


def test_case_expression_in_where(tiny):
    df = cypher(
        tiny,
        "MATCH (x)-[e:E]->(y) "
        "WHERE CASE WHEN x.node = 'a' THEN e.n_items = 1 ELSE false END "
        "RETURN x, y",
    )
    assert [tuple(r) for r in df.collect()] == [("a", "b")]


def test_coalesce_over_optional_match(tiny):
    df = cypher(
        tiny,
        "MATCH (x)-[:E]->(y) OPTIONAL MATCH (y)-[f:E]->(z) "
        "RETURN x, y, coalesce(f.n_items, -1) AS nxt ORDER BY x, y, nxt",
    )
    rows = [tuple(r) for r in df.collect()]
    assert ("d", "e", -1) in rows  # null-extended row coalesces
    assert ("a", "b", 3) in rows


def test_arithmetic_on_bound_columns(tiny):
    df = cypher(
        tiny,
        "MATCH (x)-[e:E]->(y) RETURN x, e.n_items * 10 + 1 AS v ORDER BY v LIMIT 2",
    )
    assert [tuple(r) for r in df.collect()] == [("a", 11), ("a", 21)]


def test_array_literal_and_functions_pass_through(tiny):
    """Spark SQL list syntax (array(..), array_contains) passes through;
    Cypher bracket literals are not rewritten — write array() instead."""
    df = cypher(
        tiny,
        "MATCH (x)-[e:E]->(y) WHERE array_contains(array(1, 5), e.n_items) "
        "RETURN x, y, array('t', x) AS tags ORDER BY x",
    )
    rows = [(r.x, r.y, list(r.tags)) for r in df.collect()]
    assert rows == [("a", "b", ["t", "a"]), ("d", "e", ["t", "d"])]


def test_unwind_bracket_literal(tiny):
    got = cypher(
        tiny,
        "MATCH (x)-[:E]->(y) WHERE x.node = 'a' "
        "UNWIND [10, 20] AS k RETURN y, k ORDER BY y, k",
    ).collect()
    assert [(r.y, r.k) for r in got] == [("b", 10), ("b", 20), ("c", 10), ("c", 20)]


def test_exists_or_plan_is_flag_left_joins_no_cartesian(tiny):
    """The OR lowering must plan as existence-flag LEFT joins (one per
    pattern branch) — never a cartesian or nested-loop shape."""
    df = cypher(
        tiny,
        "MATCH (x)-[:E]->(y) WHERE EXISTS { (y)-[:E]->(z) } OR "
        "EXISTS { (x)<-[:E]-(w) } RETURN x, y",
    )
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    ex = df._jdf.queryExecution().executedPlan().toString()
    assert opt.count("Join LeftOuter") == 2
    assert "CartesianProduct" not in ex
    assert "BroadcastNestedLoopJoin" not in ex


def test_exists_or_with_varlen_branch(tiny):
    """OR lowering composes with var-length patterns in a branch:
    x reaches e within 2 hops OR x has no incoming edge."""
    got = cypher(
        tiny,
        "MATCH (x)-[:E]->(y) WHERE EXISTS { (y)-[:E*1..2]->(z:Any) } OR "
        "NOT (x)<-[:E]-(w) RETURN x, y ORDER BY x, y",
    ).collect()
    # y with 1-2 hop out-reach: b, c (->d->e), d (->e); plus x=a rows
    assert [(r.x, r.y) for r in got] == [
        ("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"),
    ]


# ------------------------------------- round-6b: types / direction / strings


def test_rel_type_union_matches_both_types(spark):
    """-[e:EA|EB]-> is the UNION ALL of the type frames on common
    columns: a predicate spanning the partition boundary sees rows
    from BOTH types, with properties intact across the union."""
    edges = spark.createDataFrame(
        [("a", "b", 1, 10.0), ("a", "c", 2, 20.0), ("b", "d", 3, 30.0)],
        ["src", "dst", "n_items", "weight"],
    )
    verts = spark.createDataFrame([(x,) for x in "abcd"], ["id"])
    cg = CypherGraph(
        PropertyGraph(verts, edges),
        rel_types={
            "EA": edges.filter("n_items < 3"),
            "EB": edges.filter("n_items >= 3"),
        },
    )
    got = cypher(
        cg,
        "MATCH (x)-[e:EA|EB]->(y) WHERE e.n_items >= 2 "
        "RETURN x, y, e.n_items AS n ORDER BY x, y",
    ).collect()
    assert [(r.x, r.y, r.n) for r in got] == [("a", "c", 2), ("b", "d", 3)]


def test_rel_type_union_common_columns_only(spark):
    """A property present on only one type of the disjunction cannot be
    referenced — the union restricts to common columns."""
    e1 = spark.createDataFrame([("a", "b", 1)], ["src", "dst", "n_items"])
    e2 = spark.createDataFrame(
        [("b", "c", 2, "x")], ["src", "dst", "n_items", "extra"]
    )
    verts = spark.createDataFrame([(x,) for x in "abc"], ["id"])
    cg = CypherGraph(
        PropertyGraph(verts, e1), rel_types={"E1": e1, "E2": e2}
    )
    # common property works across the union
    got = cypher(
        cg, "MATCH (x)-[e:E1|E2]->(y) RETURN x, e.n_items AS n ORDER BY x"
    ).collect()
    assert [(r.x, r.n) for r in got] == [("a", 1), ("b", 2)]
    # one-type-only property is refused at the edge-property check
    with pytest.raises(Exception, match="extra"):
        cypher(
            cg,
            "MATCH (x)-[e:E1|E2 {extra: 'x'}]->(y) RETURN x",
        )


def test_undirected_one_hop_matches_both_orientations(tiny):
    """-[e:E]- matches each relationship in both orientations: d's
    undirected neighborhood is b, c (in) and e (out)."""
    got = cypher(
        tiny,
        "MATCH (x {node: 'd'})-[e:E]-(y) RETURN y ORDER BY y",
    ).collect()
    assert [r.y for r in got] == ["b", "c", "e"]


def test_undirected_varlen_walks_symmetric_closure(tiny):
    """-[:E*1..2]- reaches over the symmetric closure with distinct
    endpoint-pair semantics: from e, 1 hop reaches d, 2 hops add b, c
    and e itself (e-d-e)."""
    got = cypher(
        tiny,
        "MATCH (x {node: 'e'})-[:E*1..2]-(y) RETURN y ORDER BY y",
    ).collect()
    assert [r.y for r in got] == ["b", "c", "d", "e"]


def test_undirected_self_loop_matches_once(spark):
    """A self-loop relationship contributes ONE undirected match (its
    two orientations coincide)."""
    edges = spark.createDataFrame(
        [("a", "a", 1), ("a", "b", 2)], ["src", "dst", "n_items"]
    )
    verts = spark.createDataFrame([("a",), ("b",)], ["id"])
    cg = CypherGraph(PropertyGraph(verts, edges), rel_types={"E": edges})
    got = cypher(
        cg, "MATCH (x {node: 'a'})-[e:E]-(y) RETURN y ORDER BY y"
    ).collect()
    assert [r.y for r in got] == ["a", "b"]


def test_undirected_shortest_path_from_source_a(tiny):
    """Undirected shortestPath (previously refused): distances over
    the symmetric closure from the other end of the diamond."""
    got = cypher(
        tiny,
        "MATCH p = shortestPath((a {node: 'a'})-[:E*]-(b)) "
        "RETURN b, length(p) AS l ORDER BY b",
    ).collect()
    assert [(r.b, r.l) for r in got] == [("b", 1), ("c", 1), ("d", 2), ("e", 3)]


def test_string_operators_rewrite_and_filter(tiny):
    got = cypher(
        tiny,
        "MATCH (x)-[e:E]->(y) WHERE y.node STARTS WITH 'd' "
        "OR x.node ENDS WITH 'd' RETURN x, y ORDER BY x, y",
    ).collect()
    assert [(r.x, r.y) for r in got] == [("b", "d"), ("c", "d"), ("d", "e")]


def test_string_operator_contains_not(tiny):
    got = cypher(
        tiny,
        "MATCH (x)-[e:E]->(y) WHERE NOT x.node CONTAINS 'a' "
        "AND y.node CONTAINS 'd' RETURN x ORDER BY x",
    ).collect()
    assert [r.x for r in got] == ["b", "c"]


def test_starts_with_inside_with_stage_where(tiny):
    """The WITH of STARTS WITH must not be taken for a clause keyword
    even inside a WITH stage's WHERE (the clause-splitter skip)."""
    got = cypher(
        tiny,
        "MATCH (x)-[e:E]->(y) WITH x, count(*) AS deg "
        "WHERE x.node STARTS WITH 'a' RETURN x, deg",
    ).collect()
    assert [(r.x, r.deg) for r in got] == [("a", 2)]


def test_string_literal_containing_operator_untouched(tiny):
    """A literal containing ' STARTS WITH ' must survive rewriting."""
    got = cypher(
        tiny,
        "MATCH (x)-[e:E]->(y) WHERE x.node = 'a' "
        "RETURN x, 'p STARTS WITH q' AS tag ORDER BY y LIMIT 1",
    ).collect()
    assert [(r.x, r.tag) for r in got] == [("a", "p STARTS WITH q")]


def test_collect_rewrite_unit():
    from graph_spark.graph.cypher import _collect_rewrite

    assert _collect_rewrite("collect(c.node)") == "sort_array(collect_list(c.node))"
    assert (
        _collect_rewrite("collect(DISTINCT x)") == "sort_array(collect_set(x))"
    )
    # explicit collect_list passes through; quoted text untouched
    assert _collect_rewrite("collect_list(x)") == "collect_list(x)"
    assert _collect_rewrite("'collect(x)' = s") == "'collect(x)' = s"
    # nested parens inside the argument
    assert (
        _collect_rewrite("size(collect(coalesce(a, b)))")
        == "size(sort_array(collect_list(coalesce(a, b))))"
    )


def test_collect_is_deterministic_sorted(tiny):
    got = cypher(
        tiny,
        "MATCH (x)-[e:E]->(y) WITH y, collect(x.node) AS srcs "
        "RETURN y, srcs[0] AS first_src, size(srcs) AS n "
        "ORDER BY y",
    ).collect()
    assert [(r.y, r.first_src, r.n) for r in got] == [
        ("b", "a", 1), ("c", "a", 1), ("d", "b", 2), ("e", "d", 1),
    ]


def test_collect_distinct_then_unwind(tiny):
    got = cypher(
        tiny,
        "MATCH (x)-[e:E]->(y) WITH collect(DISTINCT y.node) AS ts "
        "UNWIND ts AS t RETURN t ORDER BY t",
    ).collect()
    assert [r.t for r in got] == ["b", "c", "d", "e"]


def test_union_dedups_and_union_all_keeps(tiny):
    q1 = "MATCH (x)-[e:E]->(y) WHERE e.n_items >= 4 RETURN x AS node"
    q2 = "MATCH (x)-[e:E]->(y) WHERE e.n_items >= 3 RETURN x AS node"
    got = sorted(
        r.node for r in cypher(tiny, f"{q1} UNION {q2}").collect()
    )
    assert got == ["b", "c", "d"]  # c,d overlap deduped
    got_all = sorted(
        r.node for r in cypher(tiny, f"{q1} UNION ALL {q2}").collect()
    )
    assert got_all == ["b", "c", "c", "d", "d"]


def test_union_mismatched_columns_refused(tiny):
    with pytest.raises(ValueError, match="same column names"):
        cypher(
            tiny,
            "MATCH (x)-[e:E]->(y) RETURN x AS a UNION "
            "MATCH (x)-[e:E]->(y) RETURN x AS b",
        )


def test_union_mixed_forms_refused(tiny):
    with pytest.raises(ValueError, match="mixing UNION"):
        cypher(
            tiny,
            "MATCH (x)-[]->(y) RETURN x UNION "
            "MATCH (x)-[]->(y) RETURN x UNION ALL "
            "MATCH (x)-[]->(y) RETURN x",
        )


def test_union_as_identifier_not_split(tiny):
    """`AS union` (alias) and `x.union` (property access) are
    identifiers, not set operators — the splitter must leave them."""
    from graph_spark.graph.cypher import _split_union

    segs, _ = _split_union(
        "MATCH (x)-[e:E]->(y) RETURN x AS union ORDER BY y"
    )
    assert len(segs) == 1
    segs, _ = _split_union("MATCH (x)-[e:E]->(y) RETURN e.union AS u")
    assert len(segs) == 1
    # a real set operator still splits
    segs, all_mode = _split_union(
        "MATCH (x) RETURN x UNION ALL MATCH (y) RETURN y AS x"
    )
    assert len(segs) == 2 and all_mode
    # end-to-end: the alias form runs
    got = cypher(
        tiny,
        "MATCH (x)-[e:E]->(y) WHERE x.node = 'a' "
        "RETURN x AS union ORDER BY y LIMIT 1",
    ).collect()
    assert [r.union for r in got] == ["a"]


def test_union_keyword_in_string_literal_not_split(tiny):
    got = cypher(
        tiny,
        "MATCH (x)-[e:E]->(y) WHERE x.node = 'a' "
        "RETURN x, 'UNION ALL' AS tag ORDER BY y LIMIT 1",
    ).collect()
    assert [(r.x, r.tag) for r in got] == [("a", "UNION ALL")]


# ------------------------------------------- named paths (round 7)


def test_shortest_path_nodes_and_relationships(tiny):
    """nodes(p) binds the LEXICOGRAPHICALLY SMALLEST shortest path
    (a->d has two 2-hop paths; a,b,d < a,c,d); relationships(p)
    derives 'src->dst' pair strings from it."""
    got = cypher(
        tiny,
        "MATCH p = shortestPath((a {node: 'a'})-[:E*]->(b)) "
        "RETURN b, nodes(p) AS ns, relationships(p) AS rs, "
        "length(p) AS hops ORDER BY b",
    ).collect()
    assert [(r.b, r.ns, r.rs, r.hops) for r in got] == [
        ("b", ["a", "b"], ["a->b"], 1),
        ("c", ["a", "c"], ["a->c"], 1),
        ("d", ["a", "b", "d"], ["a->b", "b->d"], 2),
        ("e", ["a", "b", "d", "e"], ["a->b", "b->d", "d->e"], 3),
    ]


def test_shortest_path_undirected(tiny):
    """Undirected shortestPath walks the symmetric closure; the
    level-2 seed backtrack (e-d-e over ONE undirected relationship)
    is excluded per openCypher trail semantics."""
    got = cypher(
        tiny,
        "MATCH p = shortestPath((a {node: 'e'})-[:E*]-(b)) "
        "RETURN b, length(p) AS hops, nodes(p) AS ns ORDER BY b",
    ).collect()
    assert [(r.b, r.hops, r.ns) for r in got] == [
        ("a", 3, ["e", "d", "b", "a"]),
        ("b", 2, ["e", "d", "b"]),
        ("c", 2, ["e", "d", "c"]),
        ("d", 1, ["e", "d"]),
    ]


def test_all_shortest_paths_undirected(tiny):
    got = cypher(
        tiny,
        "MATCH p = allShortestPaths((a {node: 'a'})-[:E*]-(b)) "
        "RETURN b, p.len AS hops, p.cnt AS cnt ORDER BY b",
    ).collect()
    assert [(r.b, r.hops, r.cnt) for r in got] == [
        ("b", 1, 1),
        ("c", 1, 1),
        ("d", 2, 2),
        ("e", 3, 2),
    ]


def test_weighted_shortest_path_undirected(tiny):
    """Undirected weighted: relax over both orientations (e->a best
    is e-d(5)+d-b(3)+b-a(1) = 9 on n_items)."""
    got = cypher(
        tiny,
        "MATCH p = shortestPath((a {node: 'e'})-[:E* {cost: 'n_items'}]-(b)) "
        "RETURN b, p.cost AS cost ORDER BY b",
    ).collect()
    assert [(r.b, r.cost) for r in got] == [
        ("a", 9.0),
        ("b", 8.0),
        ("c", 9.0),
        ("d", 5.0),
    ]


def test_named_path_enumeration(tiny):
    """General path binding: one row per path, trail semantics."""
    got = cypher(
        tiny,
        "MATCH p = (a {node: 'a'})-[:E*1..3]->(b) "
        "RETURN nodes(p) AS ns, length(p) AS hops ORDER BY hops, ns",
    ).collect()
    assert [(r.ns, r.hops) for r in got] == [
        (["a", "b"], 1),
        (["a", "c"], 1),
        (["a", "b", "d"], 2),
        (["a", "c", "d"], 2),
        (["a", "b", "d", "e"], 3),
        (["a", "c", "d", "e"], 3),
    ]


def test_named_path_undirected_trail_semantics(tiny):
    """Undirected 2-hop paths from a: a-b-a / a-c-a reuse their one
    undirected relationship and must be filtered; a-b-d and a-c-d
    stay."""
    got = cypher(
        tiny,
        "MATCH p = (a {node: 'a'})-[:E*2..2]-(b) "
        "RETURN nodes(p) AS ns ORDER BY ns",
    ).collect()
    assert [r.ns for r in got] == [["a", "b", "d"], ["a", "c", "d"]]


def test_named_path_single_hop_and_where(tiny):
    got = cypher(
        tiny,
        "MATCH p = (a)-[:E]->(b) WHERE size(nodes(p)) = 2 AND b.node = 'd' "
        "RETURN a, relationships(p) AS rs ORDER BY a",
    ).collect()
    assert [(r.a, r.rs) for r in got] == [("b", ["b->d"]), ("c", ["c->d"])]


def test_path_nodes_refusals(tiny):
    # nodes(p) on allShortestPaths is no longer refused (r8: it
    # switches to enumeration — see test_allshortest_nodes_enumeration)
    with pytest.raises(ValueError, match="WEIGHTED"):
        cypher(
            tiny,
            "MATCH p = shortestPath((a {node: 'a'})-[:E* {cost: 'n_items'}]->(b)) "
            "RETURN relationships(p)",
        )
    with pytest.raises(ValueError, match="named path"):
        cypher(
            tiny,
            "MATCH p = (a)-[:E]->(b), (b)-[:E]->(c) RETURN nodes(p)",
        )


def test_head_last_over_path_accessors(tiny):
    """openCypher endpoint idiom: head(nodes(p)) / last(nodes(p)) /
    last(relationships(p)) rewrite to element_at — but ONLY in the
    composite form, so Spark's last() aggregate stays reachable."""
    got = cypher(
        tiny,
        "MATCH p = shortestPath((a {node: 'a'})-[:E*]->(b)) "
        "WHERE last(nodes(p)) = 'e' "
        "RETURN head(nodes(p)) AS first_n, last(nodes(p)) AS last_n, "
        "last(relationships(p)) AS last_r",
    ).collect()
    assert [(r.first_n, r.last_n, r.last_r) for r in got] == [("a", "e", "d->e")]
    # the plain aggregate form still passes through to Spark
    agg = cypher(
        tiny,
        "MATCH (x)-[e:E]->(y) RETURN max(e.n_items) AS mx",
    ).collect()
    assert agg[0].mx == 5


def test_union_alias_referenced_later_not_split(tiny):
    """A column aliased `union` stays usable downstream (ORDER BY) —
    a real set-operator UNION must be followed by a new MATCH."""
    got = cypher(
        tiny,
        "MATCH (x)-[e:E]->(y) WHERE x.node = 'a' "
        "RETURN x AS union, y ORDER BY union, y LIMIT 1",
    ).collect()
    assert [(r.union, r.y) for r in got] == [("a", "b")]


def test_nodes_in_string_literal_does_not_flip_want_nodes(tiny):
    """A literal mentioning 'nodes(p)' must not trip the
    allShortestPaths refusal (or make a BFS carry unused arrays)."""
    got = cypher(
        tiny,
        "MATCH p = allShortestPaths((a {node: 'a'})-[:E*]->(b)) "
        "RETURN b, p.cnt AS cnt, 'no nodes(p) here' AS note ORDER BY b",
    ).collect()
    assert [(r.b, r.cnt, r.note) for r in got] == [
        ("b", 1, "no nodes(p) here"),
        ("c", 1, "no nodes(p) here"),
        ("d", 2, "no nodes(p) here"),
        ("e", 2, "no nodes(p) here"),
    ]


# ----------------------------------------- r7 self-review regressions


def test_bracket_list_with_commas_in_return_item(tiny):
    """A top-level list literal in a RETURN item must not be split at
    its commas (the item splitter tracks bracket depth)."""
    got = cypher(
        tiny,
        "MATCH (x)-[e:E]->(y) WHERE x.node = 'a' "
        "RETURN x, [1, 2, 3] AS xs ORDER BY y LIMIT 1",
    ).collect()
    assert [(r.x, list(r.xs)) for r in got] == [("a", [1, 2, 3])]


def test_unsupported_keywords_in_literals_allowed(tiny):
    """SET/CALL/DELETE as words inside string literals are data, not
    clauses — and the same for clause keywords as property names."""
    got = cypher(
        tiny,
        "MATCH (a)-[e:E]->(b) WHERE a.node <> 'SET-5' "
        "RETURN b, 'CALL me' AS note ORDER BY b LIMIT 1",
    ).collect()
    assert [(r.b, r.note) for r in got] == [("b", "CALL me")]


def test_clause_keyword_as_alias_and_literal_order_by(tiny):
    """`AS match` is an alias, not a clause boundary; an ' ORDER BY '
    inside a string literal must not be taken for the RETURN tail."""
    got = cypher(
        tiny,
        "MATCH (a)-[e:E]->(b) WHERE a.node = 'a' "
        "RETURN a AS match, 'x ORDER BY y' AS s ORDER BY b LIMIT 1",
    ).collect()
    assert [(r.match, r.s) for r in got] == [("a", "x ORDER BY y")]


def test_shadowing_alias_referenced_later_refused(tiny):
    """ADVICE r7: an alias that shadows a clause keyword (`AS match`)
    is legal in terminal position, but a LATER bare occurrence of that
    name is ambiguous (alias reference vs clause boundary) — refuse
    with a clear error instead of mis-parsing."""
    with pytest.raises(ValueError, match="shadows"):
        cypher(
            tiny,
            "MATCH (a)-[e:E]->(b) WITH a AS match WHERE match = 'a' "
            "RETURN match",
        )
    # terminal alias position stays legal (pinned by
    # test_clause_keyword_as_alias_and_literal_order_by)


def test_subscript_arithmetic_not_taken_for_pattern(tiny):
    """xs[0]-xs[1] is scalar arithmetic, not a relationship pattern —
    it must reach the plain-filter path, not the pattern refusal."""
    got = cypher(
        tiny,
        "MATCH (u)-[e:E]->(v) WITH u, collect(e.n_items) AS xs "
        "WHERE size(xs) >= 2 AND xs[1]-xs[0] > 0 "
        "RETURN u, xs[1]-xs[0] AS spread ORDER BY u",
    ).collect()
    assert [(r.u, r.spread) for r in got] == [("a", 1)]


def test_union_segment_order_by_refused(tiny):
    with pytest.raises(ValueError, match="ORDER BY inside UNION"):
        cypher(
            tiny,
            "MATCH (x)-[]->(y) RETURN x UNION "
            "MATCH (x)-[]->(y) RETURN x ORDER BY x",
        )


def test_unwind_redeclaration_refused(tiny):
    with pytest.raises(ValueError, match="already declared"):
        cypher(
            tiny,
            "MATCH (a)-[e]->(b) WITH b, collect(a.node) AS xs "
            "UNWIND xs AS b RETURN b",
        )


def test_path_functions_case_insensitive(tiny):
    got = cypher(
        tiny,
        "MATCH p = shortestPath((a {node: 'a'})-[:E*]->(b)) "
        "RETURN b, NODES(p) AS ns, LENGTH(p) AS hops ORDER BY b LIMIT 1",
    ).collect()
    assert [(r.b, r.ns, r.hops) for r in got] == [("b", ["a", "b"], 1)]


# -------------------------------------------- count{} / CALL{} subqueries


def test_count_subquery_in_return(tiny):
    """count { (a)-[:E]->() } is a per-row expression, lowered to a
    pre-aggregate + left join (never re-expanding the scope)."""
    got = cypher(
        tiny,
        "MATCH (a)-[e:E]->(b) WITH DISTINCT a "
        "RETURN a, count { (a)-[:E]->() } AS deg ORDER BY a",
    ).collect()
    assert [(r.a, r.deg) for r in got] == [("a", 2), ("b", 1), ("c", 1), ("d", 1)]


def test_count_subquery_zero_for_no_match(tiny):
    """Rows whose subpattern has no match count 0, not null, and are
    kept (the left-join + coalesce contract)."""
    got = cypher(
        tiny,
        "MATCH (x)-[e:E]->(y) WITH DISTINCT y "
        "RETURN y, count { (y)-[:E]->() } AS outdeg ORDER BY y",
    ).collect()
    assert [(r.y, r.outdeg) for r in got] == [
        ("b", 1), ("c", 1), ("d", 1), ("e", 0)]


def test_count_subquery_in_where(tiny):
    got = cypher(
        tiny,
        "MATCH (a)-[e:E]->(b) WHERE count { (a)-[:E]->() } >= 2 "
        "RETURN DISTINCT a",
    ).collect()
    assert sorted(r.a for r in got) == ["a"]


def test_count_subquery_inner_where(tiny):
    got = cypher(
        tiny,
        "MATCH (x)-[e:E]->(y) WITH DISTINCT x RETURN x, "
        "count { (x)-[f:E]->(z) WHERE f.weight > 15.0 } AS big ORDER BY x",
    ).collect()
    assert [(r.x, r.big) for r in got] == [("a", 1), ("b", 1), ("c", 1), ("d", 1)]


def test_count_subquery_in_later_match_where(tiny):
    """count{} in a non-first MATCH block's WHERE applies after the
    anchored join (equivalent for inner MATCH)."""
    got = cypher(
        tiny,
        "MATCH (a)-[e:E]->(b) MATCH (b)-[f:E]->(c) "
        "WHERE count { (b)-[:E]->() } >= 1 "
        "RETURN DISTINCT a, b, c ORDER BY a, b, c",
    ).collect()
    assert [(r.a, r.b, r.c) for r in got] == [
        ("a", "b", "d"), ("a", "c", "d"), ("b", "d", "e"), ("c", "d", "e")]


def test_count_subquery_uncorrelated_refused(tiny):
    with pytest.raises(ValueError, match="shares no variable"):
        cypher(tiny, "MATCH (a)-[e:E]->(b) RETURN count { (q)-[:E]->(w) } AS c")


def test_count_subquery_in_optional_match_where_refused(tiny):
    with pytest.raises(ValueError, match="OPTIONAL MATCH WHERE"):
        cypher(
            tiny,
            "MATCH (a)-[e:E]->(b) OPTIONAL MATCH (b)-[f:E]->(c) "
            "WHERE count { (c)-[:E]->() } > 0 RETURN a, b, c",
        )


def test_call_subquery_first_threshold_idiom(tiny):
    """CALL-first: compute a global aggregate, broadcast it into the
    following MATCH's WHERE (the cross join is one scalar row)."""
    got = cypher(
        tiny,
        "CALL { MATCH (u)-[g:E]->(v) RETURN max(g.weight) AS mx } "
        "MATCH (s)-[h:E]->(t) WHERE h.weight = mx RETURN s, t",
    ).collect()
    assert [(r.s, r.t) for r in got] == [("d", "e")]


def test_call_subquery_mid_query_position_honored(tiny):
    """CALL after an aggregating WITH must NOT be hoisted above it —
    the count reflects pre-CALL cardinality."""
    got = cypher(
        tiny,
        "MATCH (s)-[h:E]->(t) WITH count(*) AS n "
        "CALL { MATCH (u)-[g:E]->(v) RETURN max(g.weight) AS mx } "
        "RETURN n, mx",
    ).collect()
    assert [(r.n, r.mx) for r in got] == [(5, 50.0)]


def test_call_subquery_alias_anchors_next_match(tiny):
    """A CALL alias that is a node id anchors a following MATCH (the
    MATCH-after-WITH machinery): nested CALLs compile recursively."""
    got = cypher(
        tiny,
        "CALL { CALL { MATCH (u)-[g:E]->(v) RETURN max(g.weight) AS mx } "
        "MATCH (s)-[h:E]->(t) WHERE h.weight = mx RETURN s AS hub } "
        "MATCH (hub)-[k:E]->(w) RETURN hub, w",
    ).collect()
    assert [(r.hub, r.w) for r in got] == [("d", "e")]


def test_call_procedure_refused(tiny):
    with pytest.raises(ValueError, match="CALL procedures"):
        cypher(tiny, "MATCH (a)-[e:E]->(b) CALL db.labels() RETURN a")


def test_call_in_transactions_refused(tiny):
    with pytest.raises(ValueError, match="IN TRANSACTIONS"):
        cypher(
            tiny,
            "CALL { MATCH (u)-[g:E]->(v) RETURN u } IN TRANSACTIONS RETURN u",
        )


def test_call_alias_collision_refused(tiny):
    with pytest.raises(ValueError, match="collides"):
        cypher(
            tiny,
            "CALL { MATCH (u)-[g:E]->(v) RETURN max(g.weight) AS e } "
            "MATCH (a)-[e:E]->(b) RETURN a",
        )


def test_call_keyword_in_string_literal_untouched(tiny):
    got = cypher(
        tiny,
        "MATCH (a)-[e:E]->(b) WHERE a.node = 'a' "
        "RETURN b, 'CALL { x }' AS s ORDER BY b LIMIT 1",
    ).collect()
    assert [(r.b, r.s) for r in got] == [("b", "CALL { x }")]


# ------------------------------------- allShortestPaths enumeration


def test_allshortest_nodes_enumeration(tiny):
    """nodes(p) on allShortestPaths enumerates one row per distinct
    shortest path (the r7 refusal, lifted)."""
    got = cypher(
        tiny,
        "MATCH p = allShortestPaths((a {node: 'a'})-[:E*1..3]->(d {node: 'd'})) "
        "RETURN a, d, length(p) AS hops, array_join(nodes(p), '>') AS path "
        "ORDER BY path",
    ).collect()
    assert [(r.hops, r.path) for r in got] == [(2, "a>b>d"), (2, "a>c>d")]


def test_allshortest_enum_count_parity(tiny):
    """Enumerated row multiplicity per pair == the counting form's
    p.cnt (Brandes sigma) — the two lowerings must agree exactly."""
    cnt = cypher(
        tiny,
        "MATCH p = allShortestPaths((a)-[:E*1..4]->(b)) "
        "RETURN a, b, p.cnt AS cnt ORDER BY a, b",
    ).collect()
    enum = cypher(
        tiny,
        "MATCH p = allShortestPaths((a)-[:E*1..4]->(b)) "
        "RETURN a, b, count(nodes(p)) AS cnt ORDER BY a, b",
    ).collect()
    assert [(r.a, r.b, r.cnt) for r in cnt] == [(r.a, r.b, r.cnt) for r in enum]


def test_allshortest_enum_relationships(tiny):
    got = cypher(
        tiny,
        "MATCH p = allShortestPaths((a {node: 'a'})-[:E*1..3]->(d {node: 'd'})) "
        "RETURN array_join(relationships(p), '|') AS rels ORDER BY rels",
    ).collect()
    assert [r.rels for r in got] == ["a->b|b->d", "a->c|c->d"]


def test_allshortest_enum_limit_guard(tiny, monkeypatch):
    """Above ALLSP_ENUM_FRONTIER_LIMIT the enumeration refuses with a
    pointer to the counting form (enumeration is output-sized)."""
    import graph_spark.graph.cypher as cy

    monkeypatch.setattr(cy, "ALLSP_ENUM_FRONTIER_LIMIT", 1)
    with pytest.raises(ValueError, match="counting form"):
        cypher(
            tiny,
            "MATCH p = allShortestPaths((a)-[:E*1..4]->(b)) "
            "RETURN a, b, array_join(nodes(p), '>') AS path",
        )


def test_optional_match_shortest_path_null_extends(tiny):
    """shortestPath inside OPTIONAL MATCH (VERDICT r07 margin item):
    sources with no path to the anchored target null-extend instead of
    disappearing, and nodes(p) is null on those rows."""
    got = cypher(
        tiny,
        "MATCH (a)-[x:E]->(m) WITH DISTINCT a "
        "OPTIONAL MATCH p = shortestPath((a)-[:E*1..4]->(b {node: 'b'})) "
        "RETURN a, b, length(p) AS hops, array_join(nodes(p), '>') AS path "
        "ORDER BY a",
    ).collect()
    assert [(r.a, r.b, r.hops, r.path) for r in got] == [
        ("a", "b", 1, "a>b"),
        ("b", None, None, None),
        ("c", None, None, None),
        ("d", None, None, None),
    ]


def test_count_subquery_in_order_by(tiny):
    """r9 (VERDICT r8 item 6 — refusal lifted): count { .. } as a sort
    key joins the pre-aggregate onto the PROJECTED frame, sorts, and
    drops the helper column; with LIMIT the pair still plans as
    TakeOrdered."""
    got = cypher(
        tiny,
        "MATCH (a)-[e:E]->(b) RETURN DISTINCT a "
        "ORDER BY count { (a)-[:E]->() } DESC, a LIMIT 2",
    ).collect()
    assert [r.a for r in got] == ["a", "b"]
    assert got[0].asDict().keys() == {"a"}  # helper column dropped
    # unreturned-variable subpattern still refused (shares no variable
    # with the projected frame)
    with pytest.raises(ValueError, match="shares no variable"):
        cypher(
            tiny,
            "MATCH (a)-[e:E]->(b) RETURN DISTINCT b "
            "ORDER BY count { (a)-[:E]->() }",
        )


def test_exists_inner_where(tiny):
    """EXISTS { pattern WHERE .. } (r8): the inner WHERE filters the
    subpattern BEFORE the semi/anti join — symmetric with count{}."""
    got = cypher(
        tiny,
        "MATCH (a)-[e:E]->(b) "
        "WHERE EXISTS { (a)-[f:E]->(x) WHERE f.weight > 15.0 } "
        "RETURN DISTINCT a ORDER BY a",
    ).collect()
    assert [r.a for r in got] == ["a", "b", "c", "d"]
    got = cypher(
        tiny,
        "MATCH (a)-[e:E]->(b) "
        "WHERE NOT EXISTS { (a)-[f:E]->(x) WHERE f.weight > 35.0 } "
        "RETURN DISTINCT a ORDER BY a",
    ).collect()
    assert [r.a for r in got] == ["a", "b"]


def test_exists_inner_where_under_or(tiny):
    got = cypher(
        tiny,
        "MATCH (a)-[e:E]->(b) "
        "WHERE EXISTS { (a)-[f:E]->(x) WHERE f.weight > 35.0 } "
        "OR e.weight < 15.0 RETURN DISTINCT a ORDER BY a",
    ).collect()
    assert [r.a for r in got] == ["a", "c", "d"]


def test_exists_and_count_match_spelling(tiny):
    """The Neo4j full-subquery spelling — EXISTS { MATCH .. WHERE .. }
    and count { MATCH .. } — normalizes to the pattern form; the inner
    MATCH is not taken for a clause boundary (brace-depth-aware
    splitter), and a RETURN inside is refused with a clear error."""
    got = cypher(
        tiny,
        "MATCH (a)-[e:E]->(b) "
        "WHERE EXISTS { MATCH (a)-[f:E]->(x) WHERE f.weight > 15.0 } "
        "RETURN DISTINCT a ORDER BY a",
    ).collect()
    assert [r.a for r in got] == ["a", "b", "c", "d"]
    got = cypher(
        tiny,
        "MATCH (a)-[e:E]->(b) WITH DISTINCT a "
        "RETURN a, count { MATCH (a)-[:E]->() } AS deg ORDER BY a",
    ).collect()
    assert [(r.a, r.deg) for r in got] == [("a", 2), ("b", 1), ("c", 1), ("d", 1)]
    with pytest.raises(ValueError, match="RETURN inside"):
        cypher(
            tiny,
            "MATCH (a)-[e:E]->(b) "
            "WHERE EXISTS { MATCH (a)-[f:E]->(x) RETURN x } RETURN a",
        )


def test_count_subquery_varlen_refused(tiny):
    """count{} over a var-length edge would count PAIRS (the
    pair-distinct leg) where openCypher counts PATHS — refused with a
    pointer instead of a silently-different number."""
    with pytest.raises(ValueError, match="PATHS"):
        cypher(
            tiny,
            "MATCH (a)-[e:E]->(b) "
            "RETURN a, count { (a)-[:E*1..2]->(x) } AS n",
        )


# ------------------------------------------ WITH ORDER BY / SKIP / LIMIT


def test_with_order_by_limit_then_expand(tiny):
    """The aggregate → top-k → expand idiom: WITH .. ORDER BY .. LIMIT
    cuts the frame before the next MATCH anchors on the survivors."""
    got = cypher(
        tiny,
        "MATCH (a)-[e:E]->(b) WITH b, count(*) AS fanin "
        "ORDER BY fanin DESC, b LIMIT 2 "
        "MATCH (b)-[f:E]->(c) RETURN b, fanin, c ORDER BY b",
    ).collect()
    assert [(r.b, r.fanin, r.c) for r in got] == [("b", 1, "d"), ("d", 2, "e")]


def test_with_skip_limit_pagination(tiny):
    got = cypher(
        tiny,
        "MATCH (a)-[e:E]->(b) WITH b, count(*) AS fanin "
        "ORDER BY fanin DESC, b SKIP 1 LIMIT 2 RETURN b, fanin ORDER BY b",
    ).collect()
    assert [(r.b, r.fanin) for r in got] == [("b", 1), ("c", 1)]


def test_with_where_after_limit_neo4j_order(tiny):
    """Neo4j's grammar puts WHERE after LIMIT in a WITH stage; clauses
    apply in textual order."""
    got = cypher(
        tiny,
        "MATCH (a)-[e:E]->(b) WITH b, count(*) AS fanin "
        "ORDER BY fanin DESC, b LIMIT 3 WHERE fanin >= 2 RETURN b, fanin",
    ).collect()
    assert [(r.b, r.fanin) for r in got] == [("d", 2)]


def test_with_order_by_without_cut_refused(tiny):
    with pytest.raises(ValueError, match="SKIP or"):
        cypher(
            tiny,
            "MATCH (a)-[e:E]->(b) WITH b, count(*) AS n ORDER BY n RETURN b",
        )


def test_with_stage_where_inside_count_brace_not_split(tiny):
    """A WHERE inside a count{} body must not be taken for the stage's
    own WHERE (bracket-aware stage-op scanner)."""
    got = cypher(
        tiny,
        "MATCH (a)-[e:E]->(b) WITH DISTINCT a "
        "WITH a, count { (a)-[f:E]->(x) WHERE f.weight > 15.0 } AS big "
        "WHERE big >= 1 RETURN a, big ORDER BY a",
    ).collect()
    assert [(r.a, r.big) for r in got] == [
        ("a", 1), ("b", 1), ("c", 1), ("d", 1)]


def test_with_stage_alias_named_limit_not_split(tiny):
    """`AS limit` is an alias, not a stage operator (AS-precede guard
    in the stage-op scanner)."""
    got = cypher(
        tiny,
        "MATCH (a)-[e:E]->(b) WITH b, count(*) AS limit "
        "RETURN b, limit ORDER BY b",
    ).collect()
    assert [(r.b, r.limit) for r in got] == [
        ("b", 1), ("c", 1), ("d", 2), ("e", 1)]


# --------------------------------------------------- star projection


def test_return_star_expands_scope(tiny):
    """RETURN *: node vars as themselves, edge vars as their property
    columns."""
    got = cypher(tiny, "MATCH (a)-[e:E]->(b) RETURN * ORDER BY a, b").collect()
    assert len(got) == 5
    assert sorted(got[0].asDict().keys()) == ["a", "b", "e__n_items", "e__weight"]


def test_with_star_keeps_edge_scope(tiny):
    """WITH *, expr AS x: the star carries the whole scope, so e.weight
    stays addressable after the stage."""
    got = cypher(
        tiny,
        "MATCH (a)-[e:E]->(b) WITH *, e.weight * 2 AS w2 WHERE w2 > 30.0 "
        "RETURN a, b, e.weight AS w, w2 ORDER BY a, b",
    ).collect()
    assert [(r.a, r.b, r.w, r.w2) for r in got] == [
        ("a", "c", 20.0, 40.0),
        ("b", "d", 30.0, 60.0),
        ("c", "d", 40.0, 80.0),
        ("d", "e", 50.0, 100.0),
    ]


def test_star_duplicate_alias_refused(tiny):
    with pytest.raises(ValueError, match="duplicate output name"):
        cypher(tiny, "MATCH (a)-[e:E]->(b) WITH *, a RETURN a")


# -------------------------------------------------- r8 advice fixes


def test_stage_op_shadowing_alias_clear_error(tiny):
    """ADVICE r8: an alias named after a STAGE operator (`AS limit`)
    is legal at definition, but a later bare reference inside the same
    WITH stage must raise the explicit shadow refusal, not a misleading
    'LIMIT takes an integer literal' / empty-WHERE error."""
    with pytest.raises(ValueError, match="shadows the stage operator"):
        cypher(
            tiny,
            "MATCH (a)-[e:E]->(b) WITH b, count(*) AS limit "
            "WHERE limit > 2 RETURN b",
        )
    # definition-only use stays legal (pinned by
    # test_with_stage_alias_named_limit_not_split)


def test_literal_call_placeholder_refused(tiny):
    """ADVICE r8: a literal `CALL __c0` token with no braced subquery
    must get the clear ValueError, not an IndexError."""
    with pytest.raises(ValueError, match="braced subquery"):
        cypher(tiny, "MATCH (a)-[e:E]->(b) CALL __c0 RETURN a")
    with pytest.raises(ValueError, match="braced subquery"):
        # index beyond the extracted count
        cypher(
            tiny,
            "MATCH (a)-[e:E]->(b) "
            "CALL { MATCH (x)-[:E]->(y) RETURN count(*) AS n } "
            "CALL __c7 RETURN a, n",
        )


@pytest.fixture(scope="module")
def mutual(spark):
    """Path with mutual edges: a<->b, b<->c (4 directed rows)."""
    edges = spark.createDataFrame(
        [("a", "b", 1, 1.0), ("b", "a", 1, 1.0),
         ("b", "c", 1, 1.0), ("c", "b", 1, 1.0)],
        ["src", "dst", "n_items", "weight"],
    )
    verts = spark.createDataFrame([(x,) for x in "abc"], ["id"])
    return CypherGraph(
        PropertyGraph(verts, edges), labels={}, rel_types={"E": edges}
    )


def test_allsp_enum_mutual_edges_frontier_guard_honest(mutual, monkeypatch):
    """ADVICE r8: back-to-start (a==b) walks on mutual edges must be
    dropped from the enumeration frontier BEFORE the limit check —
    they never reach the output and every extension is anti-joined
    away, so keeping them only inflates the guard.  With the limit
    monkeypatched to 2, the old code's level-2 frontier (2 genuine
    paths + 4 back-to-start rows like [a,b,a]) would spuriously refuse;
    the fixed frontier holds exactly the 2 genuine paths and the query
    completes with the exact path set."""
    from graph_spark.graph import cypher as cy_mod

    monkeypatch.setattr(cy_mod, "ALLSP_ENUM_FRONTIER_LIMIT", 2)
    got = cypher(
        mutual,
        "MATCH p = allShortestPaths((x)-[:E*1..4]->(y)) "
        "RETURN x, y, nodes(p) AS ns ORDER BY x, y",
    ).collect()
    paths = sorted((r.x, r.y, tuple(r.ns)) for r in got)
    assert paths == [
        ("a", "b", ("a", "b")),
        ("a", "c", ("a", "b", "c")),
        ("b", "a", ("b", "a")),
        ("b", "c", ("b", "c")),
        ("c", "a", ("c", "b", "a")),
        ("c", "b", ("c", "b")),
    ]


# ------------------------------------------- r9 correlated CALL { WITH .. }


def test_correlated_call_aggregates(tiny):
    """CALL { WITH b MATCH .. RETURN agg .. }: the pre-aggregate joins
    per imported key; zero-match rows get Neo4j identities (count 0,
    sum 0)."""
    got = cypher(
        tiny,
        "MATCH (a)-[e:E]->(b) WITH DISTINCT b "
        "CALL { WITH b MATCH (b)-[f:E]->(x) "
        "RETURN count(*) AS outdeg, sum(f.weight) AS w } "
        "RETURN b, outdeg, w ORDER BY b",
    ).collect()
    assert [(r.b, r.outdeg, r.w) for r in got] == [
        ("b", 1, 30.0), ("c", 1, 40.0), ("d", 1, 50.0), ("e", 0, 0.0)]


def test_correlated_call_collect_fill(tiny):
    got = cypher(
        tiny,
        "MATCH (a)-[e:E]->(b) WITH DISTINCT b "
        "CALL { WITH b MATCH (b)-[f:E]->(x) RETURN collect(x) AS outs } "
        "RETURN b, size(outs) AS n_outs ORDER BY b",
    ).collect()
    assert [(r.b, r.n_outs) for r in got] == [
        ("b", 1), ("c", 1), ("d", 1), ("e", 0)]


def test_correlated_call_multi_import(tiny):
    """Two imported variables group the pre-aggregate on both keys."""
    got = cypher(
        tiny,
        "MATCH (a)-[e:E]->(b) "
        "CALL { WITH a, b MATCH (a)-[f:E]->(b) "
        "RETURN sum(f.n_items) AS tot } "
        "RETURN a, b, tot ORDER BY a, b",
    ).collect()
    assert [(r.a, r.b, r.tot) for r in got] == [
        ("a", "b", 1), ("a", "c", 2), ("b", "d", 3),
        ("c", "d", 4), ("d", "e", 5)]


def test_correlated_call_scope_continues(tiny):
    """The CALL result aliases join the scope mid-query: a later WHERE
    and RETURN can reference them."""
    got = cypher(
        tiny,
        "MATCH (a)-[e:E]->(b) WITH DISTINCT a "
        "CALL { WITH a MATCH (a)-[f:E]->(x) RETURN count(*) AS deg } "
        "RETURN a, deg ORDER BY deg DESC, a LIMIT 1",
    ).collect()
    assert [(r.a, r.deg) for r in got] == [("a", 2)]


def test_correlated_call_refusals(tiny):
    base = "MATCH (a)-[e:E]->(b) "
    with pytest.raises(ValueError, match="only\\s+aggregates"):
        cypher(tiny, base + "CALL { WITH a MATCH (a)-[:E]->(x) "
               "RETURN x AS xx } RETURN a, xx")
    with pytest.raises(ValueError, match="not\\s+bound in the outer"):
        cypher(tiny, base + "CALL { WITH zz MATCH (zz)-[:E]->(x) "
               "RETURN count(*) AS n } RETURN a, n")
    with pytest.raises(ValueError, match="edge/path"):
        cypher(tiny, base + "CALL { WITH e MATCH (x)-[e2:E]->(y) "
               "RETURN count(*) AS n } RETURN a, n")
    with pytest.raises(ValueError, match="bare variable names"):
        cypher(tiny, base + "CALL { WITH a.node AS k MATCH (x)-[:E]->(y) "
               "RETURN count(*) AS n } RETURN a, n")
    with pytest.raises(ValueError, match="takes no WHERE"):
        cypher(tiny, base + "CALL { WITH a WHERE a = 'a' "
               "MATCH (a)-[:E]->(x) RETURN count(*) AS n } RETURN a, n")
    with pytest.raises(ValueError, match="top-k-then-expand"):
        cypher(tiny, base + "CALL { WITH a MATCH (a)-[f:E]->(x) "
               "RETURN count(*) AS n ORDER BY n LIMIT 1 } RETURN a, n")
    with pytest.raises(ValueError, match="preceding MATCH"):
        cypher(tiny, "CALL { WITH a MATCH (a)-[:E]->(x) "
               "RETURN count(*) AS n } RETURN n")
    with pytest.raises(ValueError, match="must be bound"):
        # value-only correlation: import never appears in a pattern
        cypher(tiny, base + "WITH a, e.weight AS lim "
               "CALL { WITH lim MATCH (x)-[f:E]->(y) "
               "RETURN count(*) AS n } RETURN a, n")


def test_count_subquery_in_with_stage_order_by(tiny):
    """count { .. } as a WITH-stage sort key (r9, symmetric with the
    RETURN tail): the pre-aggregate joins onto the projected stage
    frame, the helper drops after the sort, and the stage's LIMIT cut
    feeds the downstream scope."""
    got = cypher(
        tiny,
        "MATCH (x)-[e:E]->(y) WITH DISTINCT x "
        "ORDER BY count { (x)-[:E]->() } DESC, x LIMIT 1 "
        "MATCH (x)-[f:E]->(z) RETURN x, z ORDER BY z",
    ).collect()
    assert [(r.x, r.z) for r in got] == [("a", "b"), ("a", "c")]


def test_correlated_call_body_with_intermediate_stage(tiny):
    """A correlated CALL body may use its own WITH stages as long as
    the imported variable is carried to the RETURN scope."""
    got = cypher(
        tiny,
        "MATCH (a)-[e:E]->(b) WITH DISTINCT a "
        "CALL { WITH a MATCH (a)-[f:E]->(x) WITH a, f.weight * 2 AS w2 "
        "RETURN sum(w2) AS dbl } "
        "RETURN a, dbl ORDER BY a",
    ).collect()
    assert [(r.a, r.dbl) for r in got] == [
        ("a", 60.0), ("b", 60.0), ("c", 80.0), ("d", 100.0)]


def test_nested_uncorrelated_call_inside_correlated_body(tiny):
    """An uncorrelated CALL (global threshold) nests inside a
    correlated body: the inner broadcast scalar joins the body scope,
    the outer pre-aggregate still keys on the import."""
    got = cypher(
        tiny,
        "MATCH (a)-[e:E]->(b) WITH DISTINCT a "
        "CALL { WITH a MATCH (a)-[f:E]->(x) "
        "CALL { MATCH (y)-[g:E]->(z) RETURN max(g.weight) AS mx } "
        "RETURN sum(f.weight) / max(mx) AS frac } "
        "RETURN a, frac ORDER BY a",
    ).collect()
    assert [(r.a, r.frac) for r in got] == [
        ("a", 0.6), ("b", 0.6), ("c", 0.8), ("d", 1.0)]


# ------------------------------------------ r9 leading WITH / UNWIND


def test_leading_with_parameterization(tiny):
    """`WITH 'a' AS target MATCH ..` (the Neo4j parameterization
    idiom): literal aliases project from a one-row seed and enter the
    scope as CALL-style scalars — the following MATCH cross-joins the
    broadcast one-row frame, and WHERE anchors on the parameter."""
    got = cypher(
        tiny,
        "WITH 'a' AS target MATCH (x)-[e:E]->(y) "
        "WHERE x = target RETURN y ORDER BY y",
    ).collect()
    assert [r.y for r in got] == ["b", "c"]
    got = cypher(
        tiny,
        "WITH 15.0 AS lo, 45.0 AS hi MATCH (x)-[e:E]->(y) "
        "WHERE e.weight >= lo AND e.weight <= hi "
        "RETURN count(*) AS n",
    ).collect()
    assert got[0].n == 3


def test_leading_unwind_parameter_list(tiny):
    """`UNWIND [..] AS t MATCH ..`: the exploded literal list drives
    per-value lookups (each value cross-joins then filters)."""
    got = cypher(
        tiny,
        "UNWIND ['a', 'd'] AS t MATCH (x)-[e:E]->(y) "
        "WHERE x = t RETURN t, y ORDER BY t, y",
    ).collect()
    assert [(r.t, r.y) for r in got] == [("a", "b"), ("a", "c"), ("d", "e")]
