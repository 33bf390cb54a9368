"""Hypothesis property tests (SURVEY §5.4): operator laws checked over
generated micro-data.  Kept to a handful of examples per property so the
Spark round-trips stay fast; the seeded-random tests in
test_properties.py cover the graph-algorithm equivalences."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from graph_spark.operators.relational import asof_join, sessionize

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),                       # user
        st.integers(min_value=0, max_value=10_000),                  # seconds offset
        st.floats(min_value=0, max_value=100, allow_nan=False),     # value
    ),
    min_size=1,
    max_size=40,
)


def _mk_events(spark, rows):
    base = dt.datetime(2024, 1, 1)
    data = [
        (u, base + dt.timedelta(seconds=s), float(v), i)
        for i, (u, s, v) in enumerate(rows)
    ]
    return spark.createDataFrame(data, ["user_id", "ts", "value", "event_id"])


@given(rows=events_strategy)
@SET
def test_sessionize_reference(spark, rows):
    """session ids must match a straightforward python sessionizer."""
    df = _mk_events(spark, rows)
    got = {
        r["event_id"]: r["session_id"]
        for r in sessionize(df, "user_id", "ts", gap_seconds=600, tiebreak=["event_id"]).collect()
    }
    by_user: dict[int, list] = {}
    base = dt.datetime(2024, 1, 1)
    for i, (u, s, v) in enumerate(rows):
        by_user.setdefault(u, []).append((base + dt.timedelta(seconds=s), i))
    want = {}
    for u, evs in by_user.items():
        evs.sort()
        sid = 0
        prev = None
        for ts, i in evs:
            if prev is None or (ts - prev).total_seconds() > 600:
                sid += 1
            want[i] = sid
            prev = ts
    assert got == want


@given(
    left=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 1000)), min_size=1, max_size=20),
    right=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 1000)), min_size=0, max_size=20),
)
@SET
def test_asof_join_reference(spark, left, right):
    """as-of result must equal the quadratic python definition:
    max(right.ts) with same key and right.ts <= left.ts."""
    base = dt.datetime(2024, 1, 1)
    ldf = spark.createDataFrame(
        [(k, base + dt.timedelta(seconds=s), i) for i, (k, s) in enumerate(left)],
        ["k", "ts", "lid"],
    )
    rdf = spark.createDataFrame(
        [(k, base + dt.timedelta(seconds=s)) for k, s in right], ["k", "ts"]
    ) if right else spark.createDataFrame([], "k int, ts timestamp")
    got = {
        r["lid"]: r["asof_ts"]
        for r in asof_join(ldf, rdf, ["k"], "ts", "ts", value_cols=[]).collect()
    }
    for i, (k, s) in enumerate(left):
        lts = base + dt.timedelta(seconds=s)
        cands = [base + dt.timedelta(seconds=rs) for rk, rs in right if rk == k and rs <= s]
        want = max(cands) if cands else None
        assert got[i] == want, f"lid={i}"


@given(vals=st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=1, max_size=30))
@SET
def test_groupby_sum_matches_python(spark, vals):
    df = spark.createDataFrame([(float(v),) for v in vals], ["v"])
    got = df.agg(F.sum("v").alias("s")).collect()[0]["s"]
    assert abs(got - sum(vals)) <= 1e-6 * max(1.0, abs(sum(vals)))


edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),   # src node
        st.integers(min_value=0, max_value=7),   # dst node
    ),
    min_size=1,
    max_size=25,
)


@given(edges=edges_strategy, lo=st.integers(1, 2), span=st.integers(0, 2))
@SET
def test_cypher_varlen_matches_python_reach(spark, edges, lo, span):
    """Cypher -[*lo..hi]-> endpoint pairs must equal plain python
    bounded reachability on the same random digraph (exercises the
    per-hop-distinct union-of-chains expansion)."""
    from graph_spark.graph.cypher import cypher
    from graph_spark.graph.property_graph import PropertyGraph

    hi = lo + span
    e = spark.createDataFrame(
        [(f"n{a}", f"n{b}") for a, b in set(edges)], ["src", "dst"]
    )
    v = (
        e.select(F.col("src").alias("id"))
        .union(e.select("dst"))
        .distinct()
    )
    got = {
        (r.a, r.b)
        for r in cypher(
            PropertyGraph(v, e),
            f"MATCH (a)-[*{lo}..{hi}]->(b) RETURN a.node AS a, b.node AS b",
        ).collect()
    }
    adj: dict[str, set[str]] = {}
    for a, b in set(edges):
        adj.setdefault(f"n{a}", set()).add(f"n{b}")
    # pairs[k] = set of (u, w) reachable in exactly k hops
    cur = {(u, w) for u, ws in adj.items() for w in ws}
    want: set = set()
    for k in range(1, hi + 1):
        if k >= lo:
            want |= cur
        cur = {(u, x) for (u, w) in cur for x in adj.get(w, ())}
    assert got == want


@given(edges=edges_strategy, cut=st.integers(0, 7))
@SET
def test_cypher_optional_match_matches_python_left_join(spark, edges, cut):
    """OPTIONAL MATCH (u)-[]->(v) OPTIONAL-extended by (v)-[]->(w) with
    a WHERE on the optional side must equal the python left join with
    the predicate folded into the join (openCypher null-extension)."""
    from graph_spark.graph.cypher import cypher
    from graph_spark.graph.property_graph import PropertyGraph

    es = sorted({(f"n{a}", f"n{b}") for a, b in edges if a != b})
    if not es:
        return
    e = spark.createDataFrame(es, ["src", "dst"])
    v = e.select(F.col("src").alias("id")).union(e.select("dst")).distinct()
    got = sorted(
        (r.u, r.v, r.w)
        for r in cypher(
            PropertyGraph(v, e),
            f"""MATCH (u)-[]->(v)
                OPTIONAL MATCH (v)-[]->(w) WHERE w.node > 'n{cut}'
                RETURN u.node AS u, v.node AS v, w.node AS w""",
        ).collect()
    )
    want = []
    for u, vv in es:
        ext = [w for (s, w) in es if s == vv and w > f"n{cut}"]
        if ext:
            want.extend((u, vv, w) for w in ext)
        else:
            want.append((u, vv, None))
    assert got == sorted(want, key=lambda t: (t[0], t[1], t[2] or ""))
