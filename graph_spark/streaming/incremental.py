"""Incremental maintenance of materialized aggregate views.

The graph view (FIXTURES.md §2) is an aggregate over the sales facts;
at 100 TB you cannot recompute it per update.  This module maintains
such views incrementally: each micro-batch's partial aggregates merge
into the stored state through re-aggregation of mergeable functions
(count/sum -> sum, min -> min, max -> max).

Storage is a version-flipped parquet directory (v0/v1 + META pointer):
readers always see a complete version; the writer never overwrites the
directory being read.  At scale the same merge runs against a Delta /
Iceberg table with MERGE INTO, or a bucketed table rewritten only in
the affected key buckets; the version flip is the dependency-free
stand-in with identical semantics.

Wire it to a stream with `writeStream.foreachBatch(view.merge_batch)`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# aggregate name -> (partial expr builder, merge expr builder)
_MERGEABLE = {
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


class IncrementalAggView:
    """Maintains `SELECT keys..., agg(value)... GROUP BY keys` under
    appends.  agg_spec: {out_col: (fn_name, value_col)} with fn_name in
    count/sum/min/max."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        agg_spec: dict[str, tuple[str, str | None]],
    ):
        for out, (fn, _) in agg_spec.items():
            if fn not in _MERGEABLE:
                raise ValueError(f"{out}: {fn} is not a mergeable aggregate")
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        self.agg_spec = dict(agg_spec)
        os.makedirs(path, exist_ok=True)

    # -- version bookkeeping ------------------------------------------
    def _meta_path(self) -> str:
        return os.path.join(self.path, "META")

    def _current_version(self) -> int | None:
        try:
            with open(self._meta_path()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def current(self) -> DataFrame | None:
        v = self._current_version()
        if v is None:
            return None
        return self.spark.read.parquet(os.path.join(self.path, f"v{v}"))

    # -- aggregation ----------------------------------------------------
    def _partials(self, df: DataFrame) -> DataFrame:
        aggs = [
            _MERGEABLE[fn][0](col).alias(out) if col else _MERGEABLE[fn][0](None).alias(out)
            for out, (fn, col) in self.agg_spec.items()
        ]
        return df.groupBy(*self.key_cols).agg(*aggs)

    def _merge(self, state: DataFrame, partials: DataFrame) -> DataFrame:
        merged = state.unionByName(partials)
        aggs = [
            _MERGEABLE[fn][1](out).alias(out) for out, (fn, _) in self.agg_spec.items()
        ]
        return merged.groupBy(*self.key_cols).agg(*aggs)

    def merge_batch(self, batch_df: DataFrame, batch_id: int | None = None) -> None:
        """foreachBatch hook: fold one micro-batch into the view."""
        partials = self._partials(batch_df)
        cur = self.current()
        new_state = partials if cur is None else self._merge(cur, partials)
        v = self._current_version()
        nxt = 0 if v is None else 1 - v
        out_dir = os.path.join(self.path, f"v{nxt}")
        new_state.write.mode("overwrite").parquet(out_dir)
        tmp = self._meta_path() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(nxt))
        os.replace(tmp, self._meta_path())  # atomic pointer flip


def sales_graph_view(spark: SparkSession, path: str) -> IncrementalAggView:
    """The FIXTURES.md graph_edges view as an incrementally-maintained
    table.  Feed it (lineitem ⋈ orders) grain batches with columns
    src, dst, rev, l_shipdate."""
    return IncrementalAggView(
        spark,
        path,
        key_cols=["src", "dst"],
        agg_spec={
            "n_items": ("count", None),
            "weight_raw": ("sum", "rev"),
            "first_ts": ("min", "l_shipdate"),
            "last_ts": ("max", "l_shipdate"),
        },
    )


def grain_from_lineitem(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Stream-static enrichment producing the graph grain: a streaming
    lineitem batch joined to the static order->customer map."""
    o = orders.select("o_orderkey", "o_custkey")
    return lineitem.join(F.broadcast(o), lineitem.l_orderkey == o.o_orderkey).select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        F.col("l_shipdate"),
    )
