"""Graph algorithms over PropertyGraph (SURVEY.md §2.C).

All are join-based supersteps with stationary edges (see
property_graph.py scale notes).  Float-producing algorithms (PageRank,
Dijkstra) round only at the output edge, as declared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .property_graph import PropertyGraph


def bfs_distances(graph: PropertyGraph, source: str, max_hops: int) -> DataFrame:
    """Min hop-distance (<= max_hops) from `source` to every reachable
    node, source included at distance 0.  Frontier-style: per superstep,
    broadcast the frontier onto the edges, subtract already-visited.
    Returns DataFrame(node, d).
    """
    spark = graph.edges.sparkSession
    visited = spark.createDataFrame([(source, 0)], ["node", "d"]).localCheckpoint(eager=True)
    frontier = visited
    for hop in range(1, max_hops + 1):
        fr = F.broadcast(frontier.select("node"))
        nxt = (
            graph.edges.join(fr, graph.edges.src == fr.node, "inner")
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        frontier = (
            nxt.join(F.broadcast(visited.select(F.col("node").alias("vn"))),
                     nxt.node == F.col("vn"), "left_anti")
            .withColumn("d", F.lit(hop))
            .localCheckpoint(eager=True)
        )
        if not frontier.take(1):
            break
        visited = visited.unionByName(frontier).localCheckpoint(eager=True)
    return visited


def k_hop_count(graph: PropertyGraph, source: str, k: int) -> int:
    """Count of distinct nodes reachable within k hops (excluding none —
    source counts if reachable per BFS semantics including distance 0)."""
    return bfs_distances(graph, source, k).count()


def connected_components(graph: PropertyGraph, max_iter: int = 50) -> DataFrame:
    """Min-id label propagation to fixpoint over (assumed symmetric)
    edges.  Returns DataFrame(node, component) where component is the
    lexicographically smallest reachable node id."""
    nodes = (
        graph.edges.select(F.col("src").alias("node"))
        .union(graph.edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    state = nodes.select("node", F.col("node").alias("component")).localCheckpoint(eager=True)
    for _ in range(max_iter):
        st = F.broadcast(state)
        msgs = (
            graph.edges.join(st, graph.edges.src == st.node, "inner")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new_state = (
            state.join(msgs.withColumnRenamed("node", "mnode"),
                       state.node == F.col("mnode"), "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_min"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_state.alias("n")
            .join(state.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.component") != F.col("o.component"))
            .take(1)
        )
        state = new_state
        if not changed:
            break
    return state


def pagerank(
    graph: PropertyGraph,
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Classic PageRank, uniform init 1/|V|, damping default 0.85,
    contributions along `edges` split by out-degree.  Nodes with no
    in-edges get the teleport term only.  Returns DataFrame(node, rank).

    Superstep cost: ONE shuffle (message combine by dst).  Rank and
    out-degree frames are broadcast to the stationary edges.
    """
    nodes = (
        graph.edges.select(F.col("src").alias("node"))
        .union(graph.edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    nv = nodes.count()
    outdeg = graph.edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    ).persist()
    rank = nodes.withColumn("rank", F.lit(1.0 / nv)).localCheckpoint(eager=True)

    edges = graph.edges.select("src", "dst")
    for i in range(iterations):
        contrib_src = F.broadcast(
            rank.join(outdeg, "node").select(
                F.col("node").alias("csrc"), (F.col("rank") / F.col("deg")).alias("w")
            )
        )
        msgs = (
            edges.join(contrib_src, edges.src == F.col("csrc"), "inner")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("w").alias("acc"))
        )
        rank = (
            nodes.join(msgs, "node", "left")
            .select(
                "node",
                (F.lit((1.0 - damping) / nv) + F.lit(damping) * F.coalesce(F.col("acc"), F.lit(0.0))).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    nodes.unpersist()
    outdeg.unpersist()
    return rank


def triangle_count(edges_undirected_pairs: DataFrame) -> DataFrame:
    """Count triangles in an undirected simple graph given as canonical
    pairs (s1 < s2, one row per edge).  Standard a<b<c three-way
    self-join; at scale, pre-filter to the canonical orientation halves
    every join input (done here by construction).
    Returns a 1-row DataFrame(n_triangles)."""
    e1 = edges_undirected_pairs.select(F.col("s1").alias("a"), F.col("s2").alias("b"))
    e2 = edges_undirected_pairs.select(F.col("s1").alias("b2"), F.col("s2").alias("c2"))
    e3 = edges_undirected_pairs.select(F.col("s1").alias("a3"), F.col("s2").alias("c3"))
    tri = (
        e1.join(e2, e1.b == e2.b2, "inner")
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c2") == F.col("c3")), "inner")
    )
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))


def shortest_paths_weighted(
    graph: PropertyGraph, source: str, weight_col: str, max_iter: int = 20
) -> DataFrame:
    """Bellman-Ford style relaxation (Dijkstra analog on Spark: no
    priority queue across partitions, so iterate relaxations to
    fixpoint).  Returns DataFrame(node, dist).  Not hash-declared
    (float path sums); python-oracle tested."""
    spark = graph.edges.sparkSession
    dist = spark.createDataFrame([(source, 0.0)], ["node", "dist"]).localCheckpoint(eager=True)
    for _ in range(max_iter):
        dd = F.broadcast(dist)
        cand = (
            graph.edges.join(dd, graph.edges.src == dd.node, "inner")
            .select(F.col("dst").alias("node"), (F.col("dist") + F.col(weight_col)).alias("dist"))
        )
        new_dist = (
            dist.unionByName(cand)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
        same = (
            new_dist.alias("n")
            .join(dist.alias("o"), F.col("n.node") == F.col("o.node"), "left")
            .filter(F.col("o.dist").isNull() | (F.col("n.dist") < F.col("o.dist")))
            .take(1)
        )
        prev_count = dist.count()
        dist = new_dist
        if not same and new_dist.count() == prev_count:
            break
    return dist


def label_propagation(graph: PropertyGraph, max_iter: int = 10) -> DataFrame:
    """Community detection: each node adopts the most frequent label of
    its in-neighbors each round (ties -> smallest label).  Deterministic
    variant; python-oracle tested only (not hash-declared)."""
    nodes = (
        graph.edges.select(F.col("src").alias("node"))
        .union(graph.edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    state = nodes.select("node", F.col("node").alias("label")).localCheckpoint(eager=True)
    for _ in range(max_iter):
        st = F.broadcast(state)
        counts = (
            graph.edges.join(st, graph.edges.src == st.node, "inner")
            .groupBy(F.col("dst").alias("node"), F.col("label"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        from pyspark.sql import Window

        w = Window.partitionBy("node").orderBy(F.col("c").desc(), F.col("label").asc())
        best = counts.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).select(
            F.col("node").alias("bnode"), F.col("label").alias("best_label")
        )
        state = (
            state.join(best, state.node == F.col("bnode"), "left")
            .select("node", F.coalesce(F.col("best_label"), F.col("label")).alias("label"))
            .localCheckpoint(eager=True)
        )
    return state
