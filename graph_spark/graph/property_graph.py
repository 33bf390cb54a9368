"""DataFrame-native property graph with a Pregel-style iteration core.

Capability parity target: the graph/traversal surface of the reference
temporal-graph system (SURVEY.md §2.C) — degree, k-hop, BFS, connected
components, PageRank, triangles, time-respecting traversal — rebuilt on
Spark DataFrames (GraphX has no Python API and GraphFrames is absent).

Scale design (the part that matters at 100 TB):
- Edges are the big table and they NEVER move after an optional initial
  repartition: each superstep broadcasts the (small) vertex-state frame
  to the edge partitions, aggregates messages by dst, and joins back.
  With |V| << |E| (the common case) this makes a superstep one shuffle
  (the groupBy(dst) message combine) instead of three.
- When vertex state outgrows broadcast (huge V), set broadcast_state=False
  and the same code degrades to shuffle joins; pre-partitioning edges and
  state on the same key keeps those joins co-located.
- Lineage is truncated with localCheckpoint every `checkpoint_every`
  supersteps — unbounded iterative lineage is THE failure mode of
  DataFrame loops (re-plan cost grows superlinearly).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class PropertyGraph:
    """vertices: DataFrame with an `id` column (+ properties)
    edges: DataFrame with `src`, `dst` columns (+ properties)."""

    def __init__(self, vertices: DataFrame, edges: DataFrame):
        if "id" not in vertices.columns:
            raise ValueError("vertices needs an 'id' column")
        for c in ("src", "dst"):
            if c not in edges.columns:
                raise ValueError(f"edges needs a '{c}' column")
        self.vertices = vertices
        self.edges = edges

    # ---- core primitive -------------------------------------------------

    def aggregate_messages(
        self,
        state: DataFrame,
        msg_expr,
        agg_exprs,
        broadcast_state: bool = True,
    ) -> DataFrame:
        """One message round: join vertex `state` (id, ...) onto edge
        sources, emit `msg_expr` per edge, combine per dst with
        `agg_exprs` (list of aggregate Columns).

        Returns DataFrame(id, <agg columns>).  Map-side combine happens
        automatically in the groupBy (partial aggregation before the
        shuffle), so the shuffle carries combined partials, not raw
        messages.
        """
        st = F.broadcast(state) if broadcast_state else state
        joined = self.edges.join(st, self.edges.src == st.id, "inner")
        msgs = joined.select(F.col("dst").alias("id"), msg_expr.alias("msg"))
        return msgs.groupBy("id").agg(*agg_exprs)

    def pregel(
        self,
        initial_state: DataFrame,
        step: Callable[["PropertyGraph", DataFrame, int], DataFrame],
        max_iter: int,
        converged: Callable[[DataFrame, DataFrame], bool] | None = None,
        checkpoint_every: int = 1,
    ) -> DataFrame:
        """Generic superstep loop.  `step(graph, state, i)` returns the
        next state; `converged(prev, new)` (optional) stops early — it is
        the only driver-side action per iteration, so convergence checks
        cost exactly one job."""
        state = initial_state.localCheckpoint(eager=True)
        for i in range(max_iter):
            new_state = step(self, state, i)
            if (i + 1) % checkpoint_every == 0 or converged is not None:
                new_state = new_state.localCheckpoint(eager=True)
            if converged is not None and converged(state, new_state):
                return new_state
            state = new_state
        return state

    # ---- views ----------------------------------------------------------

    def subgraph(self, vertex_pred=None, edge_pred=None) -> "PropertyGraph":
        """Induced subgraph (the filterVertices/filterEdges analog):
        optional predicates on vertices and/or edges; edges are then
        restricted to surviving endpoints via two left-semi joins
        (broadcastable — the filtered vertex id set is small relative to
        edges, and no edge columns are duplicated or shuffled)."""
        v = self.vertices.filter(vertex_pred) if vertex_pred is not None else self.vertices
        e = self.edges.filter(edge_pred) if edge_pred is not None else self.edges
        if vertex_pred is not None:
            ids = F.broadcast(v.select("id"))
            e = e.join(
                ids.withColumnRenamed("id", "src"), "src", "left_semi"
            ).join(ids.withColumnRenamed("id", "dst"), "dst", "left_semi")
            e = e.select(*self.edges.columns)
        return PropertyGraph(v, e)

    # ---- degree helpers -------------------------------------------------

    def out_degrees(self) -> DataFrame:
        return self.edges.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("out_degree"))

    def in_degrees(self) -> DataFrame:
        return self.edges.groupBy(F.col("dst").alias("id")).agg(F.count(F.lit(1)).alias("in_degree"))
