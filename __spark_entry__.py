"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship query (Q04 5-way join) on sf0.001.
queries()     -> every declared operator from SURVEY.md §2 (Q/G/T/S/L
                 suites), one callable per name.
oracle_sql()  -> matching DuckDB SQL with identical column aliases;
                 approximate operators (LSH ANN) are intentionally
                 omitted -> rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from graph_spark.queries.registry import driver_ordered_queries
from graph_spark.session import configure


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from graph_spark.queries.qsuite import QUERIES as Q

    configure(spark)
    q04 = next(q for q in Q if q.name == "q04_5way_join")
    return q04.build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for q in driver_ordered_queries():

        def make(qq):
            def run(spark: SparkSession, sf_dir: str) -> DataFrame:
                configure(spark)
                return qq.build(spark, sf_dir)

            return run

        out[q.name] = make(q)
    return out


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in driver_ordered_queries() if q.oracle is not None}
