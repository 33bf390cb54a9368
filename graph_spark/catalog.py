"""Table catalog over the driver-generated parquet test data.

Loads the ten base tables from an `sf_dir` and derives the normative
graph / temporal views declared in FIXTURES.md §2.  Derived views that
feed iterative algorithms (graph_edges / graph_edges_sym) are cached per
(session, sf_dir) because the G-suite reuses them across many queries —
the cache is an engine materialized-view analog, not a test shortcut.

Scale notes: at 100 TB the graph view would be a bucketed table written
once (`write.bucketBy(dst)`), not an in-memory cache; `cache_graph_views`
is the local stand-in for that materialization.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import configure

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# (session id, sf_dir) -> {view_name: cached DataFrame}
_VIEW_CACHE: dict = {}


class Catalog:
    """Base tables + derived views for one scale-factor directory."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        configure(spark)
        self.spark = spark
        self.sf_dir = sf_dir

    def table(self, name: str) -> DataFrame:
        if name not in TABLES:
            raise KeyError(f"unknown table {name!r}; have {TABLES}")
        views = _VIEW_CACHE.get(self._cache_key(), {})
        cached = views.get(f"table:{name}")
        if cached is not None:
            return cached
        return self._load_table(name)

    def _load_table(self, name: str) -> DataFrame:
        df = self.spark.read.parquet(os.path.join(self.sf_dir, f"{name}.parquet"))
        if name == "events" and dict(df.dtypes).get("ts") == "bigint":
            # parquet TIMESTAMP(NANOS) surfaced as int64 via
            # spark.sql.legacy.parquet.nanosAsLong; truncate to µs
            # exactly like DuckDB does when reading the same file.
            # integer division: `/` would go through double and lose
            # precision on 19-digit nanosecond values (off-by-1µs bugs)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        # Parquet files written without isAdjustedToUTC surface as
        # TIMESTAMP_NTZ; the engine contract is TimestampType (session
        # pinned UTC, so the cast is value-identity) — ltz-only functions
        # (unix_micros, window, watermark) reject NTZ inputs otherwise.
        for col, dtype in df.dtypes:
            if dtype == "timestamp_ntz":
                df = df.withColumn(col, F.col(col).cast("timestamp"))
        return df

    def cache_tables(self, names: tuple = TABLES) -> None:
        """Pin base tables in Spark's in-memory columnar cache (the
        engine's buffer pool): repeated queries skip parquet decode.
        At cluster scale this is `CACHE TABLE` / Alluxio territory —
        here it is a per-session opt-in (bench + interactive use)."""
        views = _VIEW_CACHE.setdefault(self._cache_key(), {})
        for name in names:
            key = f"table:{name}"
            if key not in views:
                df = self._load_table(name).persist()
                df.count()  # materialize eagerly
                views[key] = df

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return self.table(name)
        raise AttributeError(name)

    # ---- derived graph views (FIXTURES.md §2, normative) ----

    def _cache_key(self) -> tuple:
        return (id(self.spark), self.sf_dir)

    def _cached(self, name: str, build) -> DataFrame:
        views = _VIEW_CACHE.setdefault(self._cache_key(), {})
        if name not in views:
            df = build()
            # Small relative to the fact tables (one row per distinct
            # (customer, supplier) pair); cache pays for itself after the
            # second G-query in a session.
            views[name] = df.persist()
        return views[name]

    def graph_edges(self) -> DataFrame:
        """Bipartite customer->supplier sales graph (FIXTURES.md §2)."""

        def build() -> DataFrame:
            li = self.table("lineitem").select(
                "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"
            )
            o = self.table("orders").select("o_orderkey", "o_custkey")
            return (
                li.join(o, li.l_orderkey == o.o_orderkey)
                .groupBy(
                    F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
                    F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
                )
                .agg(
                    F.count(F.lit(1)).alias("n_items"),
                    F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                        "weight"
                    ),
                    F.min("l_shipdate").alias("first_ts"),
                    F.max("l_shipdate").alias("last_ts"),
                )
            )

        return self._cached("graph_edges", build)

    def graph_nodes(self) -> DataFrame:
        def build() -> DataFrame:
            e = self.graph_edges()
            return e.select(F.col("src").alias("node")).union(
                e.select(F.col("dst").alias("node"))
            ).distinct()

        return self._cached("graph_nodes", build)

    def graph_edges_sym(self) -> DataFrame:
        """Undirected edge set: distinct union of both directions."""

        def build() -> DataFrame:
            e = self.graph_edges().select("src", "dst")
            return e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()

        return self._cached("graph_edges_sym", build)

    def graph_edges_ts(self) -> DataFrame:
        """Both directions of graph_edges carrying first_ts (G09 input).

        UNION ALL (not distinct): each physical edge is traversable in
        either direction with its own timestamp.
        """

        def build() -> DataFrame:
            e = self.graph_edges().select("src", "dst", "first_ts")
            rev = e.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("first_ts")
            )
            return e.unionAll(rev)

        return self._cached("graph_edges_ts", build)

    def tprop_spend(self) -> DataFrame:
        """Temporal property long table: one change-point per order."""
        o = self.table("orders")
        return o.select(
            F.col("o_custkey").alias("entity_id"),
            F.lit("spend").alias("prop"),
            F.col("o_orderdate").alias("ts"),
            F.col("o_totalprice").alias("delta"),
        )

    def unpersist_all(self) -> None:
        views = _VIEW_CACHE.pop(self._cache_key(), {})
        for df in views.values():
            try:
                df.unpersist()
            except Exception:
                pass
