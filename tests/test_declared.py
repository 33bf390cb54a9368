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


def test_oracle_preconditions(spark):
    """Data-shape assumptions baked into declared oracles, re-checked so
    a driver data regeneration that breaks them fails loudly here
    instead of as a silent hash mismatch:
    - l27's DuckDB series bound (4096) must exceed every text length;
    - t13/s09 min_by/max_by determinism needs unique (user_id, ts) and
      (event_type, ts);
    - l28 pack assignment needs doc_id unique within each language."""
    from pyspark.sql import functions as F

    from graph_spark.catalog import Catalog

    c = Catalog(spark, SF_ORACLE)
    docs = c.table("documents")
    assert docs.agg(F.max(F.length("text"))).first()[0] < 4096

    ev = c.table("events")
    for keys in (["user_id", "ts"], ["event_type", "ts"]):
        dups = ev.groupBy(*keys).count().filter(F.col("count") > 1).count()
        assert dups == 0, f"duplicate {keys} break arg_min/arg_max determinism"

    dup_docs = docs.groupBy("lang", "doc_id").count().filter(F.col("count") > 1).count()
    assert dup_docs == 0

    # m11's oracle walks CHARACTERS while the engine walks BYTES —
    # equal only while the corpus stays ASCII
    non_ascii = docs.filter(F.length(F.encode("text", "utf-8")) != F.length("text")).count()
    assert non_ascii == 0, "non-ASCII text breaks m11's byte==codepoint assumption"


def test_registry_rotation_prefix_is_fresh():
    """The driver samples the first 50 registry entries per round; the
    registry rotates prior-round driver-verified names (CORRECTNESS_r*
    artifacts at repo root) to the back so each round verifies fresh
    queries.  Assert the prefix is disjoint from the verified set and
    the rotation is a pure permutation (no query gained/lost/renamed)."""
    from graph_spark.queries.registry import _driver_verified_names, all_queries

    qs = all_queries()
    names = [q.name for q in qs]
    assert len(names) == len(set(names)), "duplicate names after rotation"
    verified = _driver_verified_names()
    if not verified:
        return  # fresh checkout: nothing to rotate
    window = min(50, max(0, len(names) - len(verified)))
    assert not (set(names[:window]) & verified), (
        "rotated prefix still contains driver-verified names"
    )
