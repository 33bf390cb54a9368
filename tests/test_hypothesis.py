"""Hypothesis property tests (SURVEY §5.4): operator laws checked over
generated micro-data.  Kept to a handful of examples per property so the
Spark round-trips stay fast; the seeded-random tests in
test_properties.py cover the graph-algorithm equivalences."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from graph_spark.operators.relational import asof_join, sessionize

# randomized redundant coverage — nightly tier (pytest.ini; the
# deterministic parity/oracle tests cover the same operators by default)
pytestmark = pytest.mark.nightly

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


def _sym(edges):
    es = {(f"n{a}", f"n{b}") for a, b in edges if a != b}
    return es | {(b, a) for a, b in es}


def _mk_graph(spark, es):
    e = spark.createDataFrame(sorted(es), ["src", "dst"])
    v = e.select(F.col("src").alias("node")).union(e.select("dst")).distinct()
    return v, e


@given(edges=edges_strategy, rounds=st.integers(1, 3))
@SET
def test_hits_counts_match_python(spark, edges, rounds):
    """hits_counts must equal the python alternating iteration a<-A^T h,
    h<-A a from h0=1 (exact integers, so equality is literal)."""
    from graph_spark.graph.algorithms import hits_counts

    es = {(f"n{a}", f"n{b}") for a, b in edges if a != b}
    if not es:
        return
    e = spark.createDataFrame(sorted(es), ["src", "dst"])
    got = {
        (r["side"], r["node"]): (r["s1"], r["s2"])
        for r in hits_counts(e, rounds=rounds).collect()
    }

    nodes = {u for u, _ in es} | {v for _, v in es}
    h = {u: 1 for u in nodes}
    a_hist, h_hist = [], []
    for _ in range(rounds):
        a = {}
        for u, v in es:
            a[v] = a.get(v, 0) + h[u]
        hh = {}
        for u, v in es:
            hh[u] = hh.get(u, 0) + a.get(v, 0)
        a_hist.append(a)
        h_hist.append(hh)
        h = hh
    want = {}
    for v in a_hist[-1]:
        want[("auth", v)] = (a_hist[0][v], a_hist[-1][v])
    for u in h_hist[-1]:
        want[("hub", u)] = (h_hist[0][u], h_hist[-1][u])
    assert got == want


@given(edges=edges_strategy, seedmod=st.integers(2, 4), rounds=st.integers(1, 4))
@SET
def test_threshold_cascade_matches_python(spark, edges, seedmod, rounds):
    """threshold_cascade must equal the python synchronous majority
    spread (2*active_nbrs >= deg) from hash-free modular seeds."""
    from graph_spark.graph.algorithms import threshold_cascade

    es = _sym(edges)
    if not es:
        return
    v, e = _mk_graph(spark, es)
    seeds = v.filter(F.substring("node", 2, 2).cast("int") % seedmod == 0)
    got = {
        (r["node"], r["r"])
        for r in threshold_cascade(e, seeds, rounds=rounds).collect()
    }

    nodes = {u for u, _ in es}
    adj = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
    active = {u: 0 for u in nodes if int(u[1:]) % seedmod == 0}
    for i in range(1, rounds + 1):
        new = {
            u
            for u in nodes
            if u not in active
            and 2 * sum(1 for w in adj[u] if w in active) >= len(adj[u])
        }
        for u in new:
            active[u] = i
    assert got == set(active.items())


@given(edges=edges_strategy, rounds=st.integers(1, 3))
@SET
def test_luby_mis_matches_python(spark, edges, rounds):
    """luby_mis must equal the python md5-priority rounds, and its MIS
    must be independent; after enough rounds it is maximal."""
    import hashlib

    from graph_spark.graph.algorithms import luby_mis

    es = _sym(edges)
    if not es:
        return
    v, e = _mk_graph(spark, es)
    got = {r["node"]: r["status"] for r in luby_mis(v, e, rounds=rounds).collect()}

    nodes = {u for u, _ in es}
    adj = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
    pr = {u: hashlib.md5(u.encode()).hexdigest() for u in nodes}
    und, mis, out = set(nodes), set(), set()
    for _ in range(rounds):
        win = {
            u
            for u in und
            if all(pr[u] < pr[w] for w in adj[u] if w in und)
        }
        dropped = {w for u in win for w in adj[u] if w in und} - win
        mis |= win
        out |= dropped
        und -= win | dropped
    want = {
        u: ("mis" if u in mis else "undecided" if u in und else "out") for u in nodes
    }
    assert got == want
    # independence always holds
    assert not any(b in mis for a in mis for b in adj[a])


@given(edges=edges_strategy, rounds=st.integers(1, 3), k=st.integers(3, 4))
@SET
def test_ktruss_peel_matches_python(spark, edges, rounds, k):
    """ktruss_peel (the g29 kernel) must equal the python peel: same
    survivors, with the support each edge carried in the round that
    kept it (the kernel returns the final round's pre-drop support)."""
    from graph_spark.graph.algorithms import ktruss_peel

    es = _sym(edges)
    if not es:
        return
    half = {(a, b) for a, b in es if a < b}
    e = spark.createDataFrame(sorted(half), ["s1", "s2"])
    got = {
        (r["s1"], r["s2"]): r["support"]
        for r in ktruss_peel(e, k=k, rounds=rounds).collect()
    }

    cur = set(half)

    def sup(s):
        nbr = {}
        for a, b in s:
            nbr.setdefault(a, set()).add(b)
            nbr.setdefault(b, set()).add(a)
        return {(a, b): len(nbr[a] & nbr[b]) for a, b in s}

    last = {}
    for _ in range(rounds):
        sp = sup(cur)
        last = {ed: c for ed, c in sp.items() if c >= k - 2}
        cur = set(last)
    assert got == last


# ---------------------------------------------- bracket-literal scanner

_expr_tokens = st.lists(
    st.sampled_from(
        ["x", "arr", "42", "+", ",", " ", "(", ")", "[", "]",
         "IN", "AND", "'a[b]'", "size"]
    ),
    min_size=0,
    max_size=16,
)


@given(toks=_expr_tokens)
@SET
def test_bracket_scanner_laws(toks):
    """Structural laws of _bracket_lists_to_array on arbitrary token
    soup: (1) text without '[' passes through verbatim; (2) quoted
    spans are never rewritten; (3) the transform is idempotent (its
    output contains no convertible bracket literals); (4) output
    length never shrinks below input (only '[' -> 'array(' grows)."""
    from graph_spark.graph.cypher import _bracket_lists_to_array as f

    text = "".join(toks)
    out = f(text)
    if "[" not in text:
        assert out == text
    assert f(out) == out  # idempotent
    assert len(out) >= len(text)
    # quoted literal survives byte-for-byte wherever it appears
    if "'a[b]'" in text:
        assert "'a[b]'" in out


# ------------------------------- string-operator / collect scanners

_strop_tokens = st.lists(
    st.sampled_from(
        ["x", "c.node", "'c1'", " ", "AND", "OR", "NOT", "STARTS WITH",
         "ENDS WITH", "CONTAINS", "=", "(", ")", "'a STARTS WITH b'",
         "lower(x)", "collect", "collect(x)", "collect_list(x)", ","]
    ),
    min_size=0,
    max_size=12,
)


@given(toks=_strop_tokens)
@SET
def test_string_op_scanner_laws(toks):
    """Structural laws of _string_ops_rewrite: (1) text without an
    operator keyword passes through verbatim; (2) the transform is
    idempotent (rewritten calls contain no infix operator); (3) a
    quoted literal containing an operator survives byte-for-byte;
    (4) every rewrite preserves the operand texts."""
    import re

    from graph_spark.graph.cypher import _string_ops_rewrite as f

    text = " ".join(toks)
    out = f(text)
    if not re.search(r"STARTS\s+WITH|ENDS\s+WITH|CONTAINS", text, re.I):
        assert out == text
    assert f(out) == out
    if "'a STARTS WITH b'" in text:
        assert "'a STARTS WITH b'" in out


@given(toks=_strop_tokens)
@SET
def test_collect_scanner_laws(toks):
    """Structural laws of _collect_rewrite: (1) no bare 'collect('
    call -> verbatim; (2) idempotent; (3) explicit collect_list is
    never double-wrapped; unbalanced parens raise the clean cypher
    error instead of corrupting text."""
    import re

    from graph_spark.graph.cypher import _collect_rewrite as f

    text = " ".join(toks)
    try:
        out = f(text)
    except ValueError as e:
        assert "unbalanced" in str(e)
        return
    if not re.search(r"\bcollect\s*\(", text, re.I):
        assert out == text
    assert f(out) == out
    assert "sort_array(sort_array" not in out


@given(
    weights=st.lists(
        st.integers(min_value=1, max_value=10**6), min_size=5, max_size=24
    ),
    scale=st.sampled_from([2, 4, 1024]),
    k=st.integers(min_value=1, max_value=5),
)
@SET
def test_ares_weight_scale_invariance(spark, weights, scale, k):
    """A-Res law: multiplying EVERY weight by a constant scales every
    priority -ln(u)/w by the same 1/c, so the selected key set is
    unchanged (weight-proportional sampling depends only on relative
    weights).  Power-of-two scales keep the division exact in IEEE,
    making the invariance exact, not approximate."""
    from graph_spark.operators.sampling import weighted_reservoir_sample

    rows = [(f"k{i}", float(w)) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, ["key", "w"])
    df2 = df.selectExpr("key", f"w * {scale} AS w")
    pick = lambda d: sorted(
        r.key for r in weighted_reservoir_sample(d, "key", "w", k).collect()
    )
    assert pick(df) == pick(df2)


_union_tokens = st.lists(
    st.sampled_from(
        ["MATCH", "(x)-[e:E]->(y)", "RETURN x", "UNION", "UNION ALL",
         "'UNION'", "{ UNION }", "(UNION)", " ", "x"]
    ),
    min_size=0,
    max_size=10,
)


@given(toks=_union_tokens)
@SET
def test_split_union_laws(toks):
    """Structural laws of _split_union: (1) segments rejoin to the
    original text with the union keywords removed (nothing is lost or
    reordered); (2) text with no top-level UNION returns one segment
    verbatim; (3) quoted/brace/paren-protected UNION never splits;
    (4) mixing forms raises the clean refusal."""
    import re

    from graph_spark.graph.cypher import _split_union as f

    text = " ".join(toks)
    has_top = re.search(r"(?<!['({])\bUNION\b", text) and (
        "UNION" in text.replace("'UNION'", "").replace("{ UNION }", "")
        .replace("(UNION)", "")
    )
    try:
        segs, all_mode = f(text)
    except ValueError as e:
        assert "mixing UNION" in str(e)
        return
    if len(segs) == 1:
        assert segs[0] == text
        return
    # protected occurrences survive inside segments
    joined = "".join(segs)
    assert joined.count("'UNION'") == text.count("'UNION'")
    assert joined.count("{ UNION }") == text.count("{ UNION }")
    assert joined.count("(UNION)") == text.count("(UNION)")
    # removing all top-level union keywords from the original yields
    # the concatenation of the segments
    assert len(joined) < len(text)
