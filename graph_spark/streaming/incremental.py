"""Incremental maintenance of materialized aggregate views.

The graph view (FIXTURES.md §2) is an aggregate over the sales facts;
at 100 TB you cannot recompute it per update.  This module maintains
such views incrementally: each micro-batch's partial aggregates merge
into the stored state through re-aggregation of mergeable functions
(count/sum -> sum, min -> min, max -> max).

Storage is a MONOTONIC sequence of parquet version dirs (v0, v1, ...)
plus a META pointer "version last_applied_batch_id": the writer always
writes a FRESH directory (never overwrites one in place), flips the
pointer atomically, then garbage-collects versions older than the
previous one — so a reader holding the prior version survives one
flip, and the retention window (2 versions) is the documented bound,
not an accident of timing.  At scale the same merge runs against a
Delta / Iceberg table with MERGE INTO (whose snapshot retention plays
exactly this role), or a bucketed table rewritten only in the affected
key buckets.

Exactly-once under foreachBatch's at-least-once replay: merge_batch
records the batch_id it applied in META and SKIPS a batch whose id is
<= the recorded one, so a replayed micro-batch (failure after write,
before the streaming checkpoint commit) cannot double-count.

Wire it to a stream with `writeStream.foreachBatch(view.merge_batch)`.
"""

from __future__ import annotations

import os
import shutil

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
    count/sum/min/max; every function except count requires a value
    column (validated here, not mid-stream)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        agg_spec: dict[str, tuple[str, str | None]],
    ):
        for out, (fn, col) in agg_spec.items():
            if fn not in _MERGEABLE:
                raise ValueError(f"{out}: {fn} is not a mergeable aggregate")
            if fn != "count" and not col:
                raise ValueError(
                    f"{out}: {fn} needs a value column (only count takes None)"
                )
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        self.agg_spec = dict(agg_spec)
        os.makedirs(path, exist_ok=True)

    # -- version bookkeeping ------------------------------------------
    def _meta_path(self) -> str:
        return os.path.join(self.path, "META")

    def _read_meta(self) -> tuple[int | None, int | None]:
        """(current version, last applied batch_id) from ONE read —
        merge_batch derives everything from a single snapshot so two
        META reads can never disagree mid-merge."""
        try:
            with open(self._meta_path()) as f:
                toks = f.read().split()
        except FileNotFoundError:
            return None, None
        version = int(toks[0])
        last_bid = int(toks[1]) if len(toks) > 1 else None
        return version, last_bid

    def _current_version(self) -> int | None:
        return self._read_meta()[0]

    def current(self) -> DataFrame | None:
        v = self._current_version()
        if v is None:
            return None
        return self.spark.read.parquet(os.path.join(self.path, f"v{v}"))

    # -- aggregation ----------------------------------------------------
    def _partials(self, df: DataFrame) -> DataFrame:
        aggs = [
            _MERGEABLE[fn][0](col).alias(out)
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
        """foreachBatch hook: fold one micro-batch into the view.

        Idempotent on batch_id: foreachBatch is at-least-once (a batch
        is re-delivered if the driver dies after this hook but before
        the streaming checkpoint commits), so a batch whose id was
        already recorded in META is skipped instead of double-counted.
        Pass batch_id=None only for non-streaming (manual) folds, which
        forgo that protection for THEMSELVES but must not erase it for
        the stream: a manual fold interleaved between micro-batches
        preserves the last recorded streaming batch id, so a redelivery
        of the previous micro-batch is still skipped (ADVICE r7)."""
        v, last_bid = self._read_meta()
        if batch_id is not None and last_bid is not None and batch_id <= last_bid:
            return  # replayed micro-batch: already folded into v
        partials = self._partials(batch_df)
        cur = (
            None
            if v is None
            else self.spark.read.parquet(os.path.join(self.path, f"v{v}"))
        )
        new_state = partials if cur is None else self._merge(cur, partials)
        nxt = 0 if v is None else v + 1
        new_state.write.mode("overwrite").parquet(os.path.join(self.path, f"v{nxt}"))
        tmp = self._meta_path() + ".tmp"
        with open(tmp, "w") as f:
            keep_bid = (
                batch_id
                if batch_id is not None
                else (last_bid if last_bid is not None else -1)
            )
            f.write(f"{nxt} {keep_bid}")
        os.replace(tmp, self._meta_path())  # atomic pointer flip
        # retain v{nxt} and v{nxt-1}; GC anything older (a reader that
        # grabbed the previous version before the flip still completes)
        for d in os.listdir(self.path):
            if d.startswith("v") and d[1:].isdigit() and int(d[1:]) < nxt - 1:
                shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)


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
