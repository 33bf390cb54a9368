"""Shared helpers for the declared-query registry.

Canonicalization (SURVEY.md §2): UTC session, timestamps rendered as
strings with explicit microsecond format in BOTH engines, doubles
rounded in-query, every query ends in a total ORDER BY.  Integer sums
are cast to BIGINT on the oracle side (DuckDB widens int sums to
HUGEINT) so schemas line up with Spark's LongType.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Spark / DuckDB timestamp-to-string formats (µs, zero-padded, identical).
TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"
DATE_FMT_SPARK = "yyyy-MM-dd"
DATE_FMT_DUCK = "%Y-%m-%d"


def ts_str(col) -> F.Column:
    return F.date_format(col, TS_FMT_SPARK)


def date_str(col) -> F.Column:
    return F.date_format(col, DATE_FMT_SPARK)


@dataclass(frozen=True)
class Query:
    """One declared query: Spark builder + (optional) DuckDB oracle."""

    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # None => non-SQL-expressible, rows-only check
    note: str = ""


# DuckDB CTE block for the normative graph views (FIXTURES.md §2).  The
# driver pre-registers only base tables, so every G-oracle inlines these.
GRAPH_CTES = """graph_edges AS (
  SELECT 'c'||o.o_custkey AS src, 's'||l.l_suppkey AS dst,
         count(*) AS n_items,
         round(sum(l.l_extendedprice*(1-l.l_discount)),2) AS weight,
         min(l.l_shipdate) AS first_ts, max(l.l_shipdate) AS last_ts
  FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey GROUP BY 1,2),
graph_nodes AS (
  SELECT DISTINCT src AS node FROM graph_edges
  UNION SELECT DISTINCT dst FROM graph_edges),
graph_edges_sym AS (
  SELECT src,dst FROM graph_edges UNION SELECT dst,src FROM graph_edges)"""
