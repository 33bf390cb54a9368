"""Fluent traversal API — the engine's TraversalDescription analog
(the reference system's traversal framework surface: expanders,
evaluators, a time parameter).

    eng.traverse("c1").max_hops(3).run()                    # hop BFS
    eng.traverse("c1").at_time(t).run()                     # snapshot-at-t BFS
    eng.traverse("c1").time_respecting().run()              # earliest arrival
    eng.traverse("c1").min_items(2).directed().run()        # filtered expander

Each setter returns a new immutable description; `run()` lowers to the
join-based frontier loops in `graph.algorithms` over the catalog's
cached edge views.  The declarative lowering is the point: a traversal
description is a *plan*, so the same description runs on the pruned
snapshot view (filter before symmetrization -> partition prune at 100
TB) without the caller re-deriving edge tables.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import algorithms
from .property_graph import PropertyGraph


@dataclass(frozen=True)
class TraversalDescription:
    catalog: object
    source: str
    _max_hops: int = 3
    _at_time: Optional[object] = None
    _min_items: Optional[int] = None
    _directed: bool = False
    _time_respecting: bool = False

    # ---- fluent setters (immutable copies) ----------------------------

    def max_hops(self, n: int) -> "TraversalDescription":
        return replace(self, _max_hops=n)

    def at_time(self, t) -> "TraversalDescription":
        """Traverse the graph AS OF t: only edges with first_ts <= t."""
        return replace(self, _at_time=t)

    def min_items(self, n: int) -> "TraversalDescription":
        """Expander filter: only relationships with n_items >= n."""
        return replace(self, _min_items=n)

    def directed(self) -> "TraversalDescription":
        return replace(self, _directed=True)

    def time_respecting(self) -> "TraversalDescription":
        """Successive edges must not go back in time; run() then returns
        (node, arrival_ts) instead of (node, d)."""
        return replace(self, _time_respecting=True)

    # ---- execution ----------------------------------------------------

    def _edges(self, with_ts: bool) -> DataFrame:
        cols = ["src", "dst", "first_ts"] if with_ts else ["src", "dst"]
        e = self.catalog.graph_edges()
        if self._min_items is not None:
            e = e.filter(F.col("n_items") >= self._min_items)
        if self._at_time is not None:
            e = e.filter(F.col("first_ts") <= self._at_time)
        e = e.select(*cols)
        if self._directed:
            return e
        rev = e.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"),
            *([F.col("first_ts")] if with_ts else []),
        )
        both = e.unionAll(rev)
        # hop BFS dedups frontier nodes anyway; the timestamped variant
        # must keep both directions' distinct timestamps (UNION ALL)
        return both if with_ts else both.distinct()

    def run(self) -> DataFrame:
        if self._time_respecting:
            return algorithms.earliest_arrival(
                self._edges(with_ts=True), self.source, self._max_hops
            )
        edges = self._edges(with_ts=False)
        verts = edges.select(F.col("src").alias("id")).distinct()
        return algorithms.bfs_distances(
            PropertyGraph(verts, edges), self.source, self._max_hops
        )
