"""t2 oracle gate: every declared query must match DuckDB at sf0.01.

One parametrized test per declared query; rows-only queries (no oracle)
just assert they execute and return a stable schema.
"""

from __future__ import annotations

import pytest

from graph_spark.queries.registry import all_queries

from .conftest import SF_ORACLE, compare_query

QUERIES = all_queries()


@pytest.mark.parametrize("query", QUERIES, ids=[q.name for q in QUERIES])
def test_declared_query_matches_oracle(spark, duck, query):
    ok, detail = compare_query(spark, duck, query, SF_ORACLE)
    assert ok, f"{query.name}: {detail}"
