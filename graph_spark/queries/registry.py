"""Aggregated declared-query registry (the t2 contract surface)."""

from __future__ import annotations

from . import gsuite, lsuite, qsuite, ssuite
from .common import Query


def all_queries() -> list[Query]:
    """All declared queries, INTERLEAVED round-robin across the four
    suites (q, g, s, l) so that any prefix of the registry — e.g. a
    driver that correctness-checks only the first N entries per round —
    samples relational, graph, streaming and LLM-pipeline operators
    alike instead of exhausting the q-suite first."""
    from itertools import chain, zip_longest

    suites = [qsuite.QUERIES, gsuite.QUERIES, ssuite.QUERIES, lsuite.QUERIES]
    return [q for q in chain.from_iterable(zip_longest(*suites)) if q is not None]


def by_name() -> dict[str, Query]:
    out = {}
    for q in all_queries():
        if q.name in out:
            raise ValueError(f"duplicate declared query name {q.name}")
        out[q.name] = q
    return out
