"""Motif (path-pattern) matching over PropertyGraph (SURVEY.md §2.C).

A light-weight analog of GraphFrames' `find()`: a motif is a list of
directed edge patterns "a->b", "b->c" over named vertex variables.
Each pattern joins the edge table once; variables repeat to express
cycles ("a->b", "b->a").  Optionally require all named vertices to be
distinct.

Scale shape: k-edge motifs are k-1 equi-joins on vertex ids — the same
join/bucketing budget as the Pregel message path.  Catalyst reorders
the join chain; selective vertex predicates (pushed by the caller via
`vertex_filters`) prune before the joins.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .property_graph import PropertyGraph

_PAT = re.compile(r"^\s*(\w+)\s*->\s*(\w+)\s*$")


def find(
    graph: PropertyGraph,
    patterns: list[str],
    distinct_vertices: bool = False,
    vertex_filters: dict[str, F.Column] | None = None,
) -> DataFrame:
    """Match a conjunction of edge patterns; returns one column per
    vertex variable."""
    if not patterns:
        raise ValueError("need at least one pattern")
    bound: set[str] = set()
    out: DataFrame | None = None
    for i, p in enumerate(patterns):
        m = _PAT.match(p)
        if not m:
            raise ValueError(f"bad pattern {p!r}; expected 'a->b'")
        a, b = m.groups()
        if a == b:
            # self-loop pattern "a->a": one column, src==dst rows only
            # (two same-named aliases would be ambiguous downstream)
            e = graph.edges.filter(F.col("src") == F.col("dst")).select(
                F.col("src").alias(a + "__n")
            )
        else:
            e = graph.edges.select(
                F.col("src").alias(a + "__n"), F.col("dst").alias(b + "__n")
            )
        if out is None:
            out = e
            bound |= {a, b}
            continue
        conds = []
        for var, tag in ([(a, "a")] if a == b else [(a, "a"), (b, "b")]):
            if var in bound:
                e = e.withColumnRenamed(var + "__n", f"__j{i}_{tag}")
                conds.append(F.col(var + "__n") == F.col(f"__j{i}_{tag}"))
        if not conds:
            raise ValueError(f"pattern {p!r} is disconnected from earlier patterns")
        cond = conds[0]
        for c in conds[1:]:
            cond = cond & c
        out = out.join(e, cond).drop(f"__j{i}_a", f"__j{i}_b")
        bound |= {a, b}
    assert out is not None
    result = out.select(*[F.col(v + "__n").alias(v) for v in sorted(bound)])
    if vertex_filters:
        for v, pred in vertex_filters.items():
            result = result.filter(pred)
    if distinct_vertices:
        vs = sorted(bound)
        for i in range(len(vs)):
            for j in range(i + 1, len(vs)):
                result = result.filter(F.col(vs[i]) != F.col(vs[j]))
    return result.distinct()
