"""Grid-bucketed spatial operators (SURVEY.md §2 round-3 wave).

The scale-safe shape for radius search: cell size >= radius means every
qualifying pair lives in the 3x3 cell neighborhood, so candidates come
from a cell EQUI-join (one side replicated to its 9 neighbor cells) and
the exact integer squared-distance filter runs only on candidates —
the geohash/S2 bucketing pattern.  At 100 TB the 9x replication is the
constant-factor price that turns an O(n^2) radius search into a
shuffle-bound equi-join; AQE absorbs hot cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_radius_pairs(points: DataFrame, cell: int, radius2: int) -> DataFrame:
    """All pairs (a < b) of `points` (id, x, y — integer coords) within
    sqrt(radius2), via `cell`-sized grid bucketing.  Requires
    cell*cell >= radius2 so the 3x3 neighborhood is complete.  Each
    qualifying pair matches in exactly ONE (A-cell, B-replica)
    combination — no post-dedup.  Returns (a, b, d2)."""
    if cell * cell < radius2:
        raise ValueError(f"cell {cell} too small for radius^2 {radius2}")
    a = points.select(
        "id",
        "x",
        "y",
        (F.col("x") / cell).cast("long").alias("cx"),
        (F.col("y") / cell).cast("long").alias("cy"),
    ).alias("a")
    off = F.array(F.lit(-1), F.lit(0), F.lit(1))
    b = (
        points.withColumn("dx", F.explode(off))
        .withColumn("dy", F.explode(off))
        .select(
            "id",
            "x",
            "y",
            ((F.col("x") / cell).cast("long") + F.col("dx")).alias("cx"),
            ((F.col("y") / cell).cast("long") + F.col("dy")).alias("cy"),
        )
        .alias("b")
    )
    d2 = (F.col("a.x") - F.col("b.x")) * (F.col("a.x") - F.col("b.x")) + (
        F.col("a.y") - F.col("b.y")
    ) * (F.col("a.y") - F.col("b.y"))
    return (
        a.join(
            b,
            (F.col("a.cx") == F.col("b.cx"))
            & (F.col("a.cy") == F.col("b.cy"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .filter(d2 <= radius2)
        .select(F.col("a.id").alias("a"), F.col("b.id").alias("b"), d2.alias("d2"))
    )


def dbscan_grid(points: DataFrame, cell: int, radius2: int, min_neighbors: int):
    """DBSCAN on integer-coordinate points: grid-join neighbor pairs,
    core = points with >= min_neighbors neighbors within the radius,
    clusters = connected components over core-core edges (labelled by
    the minimum core id), border points attach to the smallest
    adjacent core cluster.  Returns (assign, cores) where assign has
    (id, cluster, is_core)."""
    from ..graph.algorithms import connected_components
    from ..graph.property_graph import PropertyGraph

    pairs = grid_radius_pairs(points, cell, radius2).select("a", "b")
    sym = pairs.unionByName(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    core = deg.filter(F.col("deg") >= min_neighbors).select(F.col("a").alias("id"))
    ce = (
        sym.join(core.select(F.col("id").alias("a")), "a")
        .join(core.select(F.col("id").alias("b")), "b")
        .select("a", "b")
    )
    nodes = core.select(F.col("id").cast("string").alias("id"))
    edges = ce.select(
        F.col("a").cast("string").alias("src"), F.col("b").cast("string").alias("dst")
    )
    cc = connected_components(PropertyGraph(nodes, edges))
    num = cc.select(
        F.col("node").cast("long").alias("id"), F.col("component").alias("comp_str")
    )
    relabel = num.groupBy("comp_str").agg(F.min("id").alias("cluster"))
    linked = num.join(F.broadcast(relabel), "comp_str").select(
        "id", "cluster", F.lit(1).alias("is_core")
    )
    # the CC kernel only labels nodes that carry edges — cores with no
    # core neighbor are singleton clusters of themselves
    singles = (
        core.select(F.col("id").cast("long").alias("id"))
        .join(linked.select("id"), "id", "left_anti")
        .select("id", F.col("id").alias("cluster"), F.lit(1).alias("is_core"))
    )
    core_assign = linked.unionByName(singles)
    border = (
        sym.join(core_assign.select(F.col("id").alias("b"), "cluster"), "b")
        .join(core_assign.select(F.col("id").alias("a")), "a", "left_anti")
        .groupBy(F.col("a").alias("id"))
        .agg(F.min("cluster").alias("cluster"))
        .select("id", "cluster", F.lit(0).alias("is_core"))
    )
    return core_assign.unionByName(border)
