"""Aggregated declared-query registry (the t2 contract surface)."""

from __future__ import annotations

from . import gsuite, lsuite, qsuite, ssuite
from .common import Query


def all_queries() -> list[Query]:
    return [*qsuite.QUERIES, *gsuite.QUERIES, *ssuite.QUERIES, *lsuite.QUERIES]


def by_name() -> dict[str, Query]:
    out = {}
    for q in all_queries():
        if q.name in out:
            raise ValueError(f"duplicate declared query name {q.name}")
        out[q.name] = q
    return out
