"""Graph algorithms over PropertyGraph (SURVEY.md §2.C).

All are join-based supersteps with stationary edges (see
property_graph.py scale notes).  Float-producing algorithms (PageRank,
Dijkstra) round only at the output edge, as declared.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .property_graph import PropertyGraph

# Below this many edges the driver-side superstep loop costs more than
# the work: route to a single-group applyInPandas (numpy) kernel — the
# SURVEY §4.3 "small-graph fallback".  Above it, the distributed
# broadcast-Pregel path runs (the one that scales to 100 TB).  The
# fallback moves ONE already-aggregated edge list to one task, never a
# fact table.
LOCAL_EDGE_THRESHOLD = 5_000_000

# Exact betweenness replicates the (rolled-up) edge list to every task
# and collects it once on the driver — sane for aggregated graph views,
# a driver-memory wall beyond this many edges.  Past it the honest
# substitute is sampled landmark closeness (multi_source_bfs / g22),
# not exact betweenness; the guard raises instead of OOMing.
BETWEENNESS_REPLICATE_EDGE_LIMIT = 50_000_000

# Per-superstep vertex-state broadcast is only sane while the whole
# state vector fits comfortably in every executor: at ~64 bytes/row
# (short string id + a double + a long) this limit is ~256 MB of
# broadcast per superstep.  Above it the Pregel kernels switch to the
# dual-layout SHUFFLE-STATE path: state stays hash-partitioned on node,
# joins a second src-partitioned edge copy co-partitioned with it
# (zero-exchange sort-merge join), and the dst message combine becomes
# the superstep's one shuffle — nothing |V|-sized ever moves to one
# place, so a billion-vertex graph costs one |E| shuffle per superstep
# instead of an impossible tens-of-GB broadcast.
VERTEX_STATE_BROADCAST_LIMIT = 4_000_000


def _use_broadcast_state(nv: int, broadcast_state: bool | None) -> bool:
    """Route a Pregel kernel's superstep join: explicit override wins,
    else broadcast only while the vertex state is broadcast-sized."""
    if broadcast_state is not None:
        return bool(broadcast_state)
    return nv <= VERTEX_STATE_BROADCAST_LIMIT


def _attach_contributions(edges: DataFrame, contrib: DataFrame, broadcast: bool) -> DataFrame:
    """The ONE superstep join every Pregel kernel here shares: attach
    per-source messages (`contrib`, columns src + payload) to the
    stationary pre-partitioned edge copy.

    broadcast=True (small |V|): contrib is broadcast onto the
    dst-partitioned edges, so the following dst combine needs no
    exchange — the whole superstep costs zero shuffles of |E| data.
    broadcast=False (the >VERTEX_STATE_BROADCAST_LIMIT path): contrib
    arrives hash-partitioned on node==src (state is pre-partitioned on
    node and Spark's projections are alias-aware), edges are
    pre-partitioned on src with the same partition count, so the join
    is a zero-exchange sort-merge join; the dst combine is then the
    superstep's single (map-side combined) shuffle.
    """
    rhs = F.broadcast(contrib) if broadcast else contrib
    return edges.join(rhs, "src")


# edge-count memo keyed by the underlying DataFrame object: the catalog
# hands out the same cached edge frame across queries, so the routing
# count() job runs once per session instead of once per algorithm call.
# Values hold a WEAK ref to the frame — a live weakref proves the id has
# not been recycled; once the frame is garbage-collected its entry is
# dead and gets purged on the next lookup, so a long-lived session never
# accumulates routed edge frames.
_COUNT_MEMO: dict[int, tuple] = {}


def _edge_count(graph: PropertyGraph) -> int:
    key = id(graph.edges)
    hit = _COUNT_MEMO.get(key)
    if hit is not None and hit[0]() is not None:
        return hit[1]
    for k in [k for k, (ref, _) in _COUNT_MEMO.items() if ref() is None]:
        del _COUNT_MEMO[k]
    cnt = graph.edges.count()
    _COUNT_MEMO[key] = (weakref.ref(graph.edges), cnt)
    return cnt


def _factorize_edges(pdf):
    """Hash-based node-id assignment (pd.factorize beats np.unique on
    object arrays by ~10x).  Returns (nodes, src_codes, dst_codes)."""
    import pandas as pd

    codes, nodes = pd.factorize(
        pd.concat([pdf["src"], pdf["dst"]], ignore_index=True), sort=False
    )
    return nodes.to_numpy(), codes[: len(pdf)], codes[len(pdf):]


def _local_pagerank_pdf(pdf, iterations: float, damping: float):
    """numpy PageRank kernel over one pandas edge list (src, dst)."""
    import numpy as np
    import pandas as pd

    nodes, src, dst = _factorize_edges(pdf)
    n = len(nodes)
    deg = np.bincount(src, minlength=n).astype("float64")
    rank = np.full(n, 1.0 / n)
    for _ in range(int(iterations)):
        contrib = np.where(deg > 0, rank / np.maximum(deg, 1), 0.0)
        acc = np.bincount(dst, weights=contrib[src], minlength=n)
        rank = (1.0 - damping) / n + damping * acc
    return pd.DataFrame({"node": nodes, "rank": rank})


def _local_bfs_pdf(pdf, source: str, max_hops: int):
    import numpy as np
    import pandas as pd

    nodes, src, dst = _factorize_edges(pdf)
    n = len(nodes)
    hits_src = np.nonzero(nodes == source)[0]
    if len(hits_src) == 0:
        return pd.DataFrame({"node": [source], "d": [0]})
    sid = int(hits_src[0])
    dist = np.full(n, -1, dtype="int64")
    dist[sid] = 0
    frontier = np.zeros(n, dtype=bool)
    frontier[sid] = True
    for hop in range(1, max_hops + 1):
        hits = frontier[src]
        nxt = np.zeros(n, dtype=bool)
        nxt[dst[hits]] = True
        nxt &= dist < 0
        if not nxt.any():
            break
        dist[nxt] = hop
        frontier = nxt
    mask = dist >= 0
    return pd.DataFrame({"node": nodes[mask], "d": dist[mask]})


def _local_cc_pdf(pdf):
    """Min-label propagation; integer codes ordered lexicographically so
    int-min == string-min."""
    import numpy as np
    import pandas as pd

    nodes, src, dst = _factorize_edges(pdf)
    n = len(nodes)
    # relabel so that smaller int == lexicographically smaller node id
    order = np.argsort(nodes)
    rank_of = np.empty(n, dtype="int64")
    rank_of[order] = np.arange(n)
    src = rank_of[src]
    dst = rank_of[dst]
    nodes = nodes[order]
    label = np.arange(n)
    while True:
        new = label.copy()
        np.minimum.at(new, dst, label[src])
        if (new == label).all():
            break
        label = new
    return pd.DataFrame({"node": nodes, "component": nodes[label]})


def _local_kcore_pdf(pdf, k: int, max_iter: int):
    """numpy k-core peel: same round semantics as the distributed loop
    (degree over current edges by src, keep deg>=k, filter both ends)."""
    import numpy as np
    import pandas as pd

    nodes, src, dst = _factorize_edges(pdf)
    n = len(nodes)
    src = np.asarray(src)
    dst = np.asarray(dst)
    alive = np.ones(len(src), dtype=bool)
    for _ in range(max_iter):
        deg = np.bincount(src[alive], minlength=n)
        keep = deg >= k
        new_alive = alive & keep[src] & keep[dst]
        if int(new_alive.sum()) == int(alive.sum()):
            break
        alive = new_alive
    deg = np.bincount(src[alive], minlength=n)
    mask = deg > 0
    return pd.DataFrame({"node": nodes[mask], "degree": deg[mask].astype("int64")})


def _local_lp_pdf(pdf, max_iter: int):
    """Synchronous label propagation, ties -> lexicographically smallest
    label (matches the distributed row_number tie-break)."""
    import numpy as np
    import pandas as pd

    nodes, src, dst = _factorize_edges(pdf)
    n = len(nodes)
    order = np.argsort(nodes)
    rank_of = np.empty(n, dtype="int64")
    rank_of[order] = np.arange(n)
    label = np.arange(n)
    for _ in range(max_iter):
        t = pd.DataFrame({"d": dst, "lab": label[src]})
        cnt = t.groupby(["d", "lab"], sort=False).size().reset_index(name="c")
        cnt["r"] = rank_of[cnt["lab"].to_numpy()]
        cnt = cnt.sort_values(["d", "c", "r"], ascending=[True, False, True])
        best = cnt.drop_duplicates("d", keep="first")
        new_label = label.copy()
        new_label[best["d"].to_numpy()] = best["lab"].to_numpy()
        if (new_label == label).all():
            break
        label = new_label
    return pd.DataFrame({"node": nodes, "label": nodes[label]})


def _local_sssp_pdf(pdf, source: str, weight_col: str, max_iter: int):
    """numpy Bellman-Ford: one simultaneous relaxation sweep per round,
    identical to the distributed union+min round."""
    import numpy as np
    import pandas as pd

    nodes, src, dst = _factorize_edges(pdf)
    w = pdf[weight_col].to_numpy(dtype="float64")
    n = len(nodes)
    hits = np.nonzero(nodes == source)[0]
    if len(hits) == 0:
        return pd.DataFrame({"node": [source], "dist": [0.0]})
    dist = np.full(n, np.inf)
    dist[int(hits[0])] = 0.0
    for _ in range(max_iter):
        new = dist.copy()
        np.minimum.at(new, dst, dist[src] + w)
        if np.array_equal(new, dist):
            break
        dist = new
    mask = np.isfinite(dist)
    return pd.DataFrame({"node": nodes[mask], "dist": dist[mask]})


# Below this edge count the local kernel runs in the DRIVER python
# process (Arrow toPandas in, createDataFrame out): r9 measured the old
# coalesce(1)+mapInPandas form paying 0.81 s of boundary per gate
# G-query (serial single-task read of the cached partitions + the
# JVM->python-worker->JVM double hop) where the driver path costs
# ~0.3 s.  ABOVE it, the executor-side mapInPandas form stays: there
# the result itself is millions of rows, and keeping it distributed
# (no createDataFrame re-serialization, no driver collect of 10M+ edge
# rows) measured faster at the 5M/20M bench sizes (cc_local 12 s
# driver-executor vs 18 s driver-side).  Every auto-routed declared
# query sits far below this line (the graph views are ~15k edges).
DRIVER_LOCAL_EDGE_LIMIT = 1_000_000

# Byte budget for the driver-side toPandas route, kept comfortably
# under spark.driver.maxResultSize's 1g DEFAULT (the repo session no
# longer overrides it): the edge count alone is a weak proxy when node
# ids are strings, so the route is taken only when
# rows x estimated-row-width also fits this budget.
DRIVER_LOCAL_BYTES_LIMIT = 256 * 1024 * 1024

# conservative per-column byte estimates for the route decision
_COL_WIDTH_DEFAULT = 16
_COL_WIDTHS = {"bigint": 8, "int": 4, "double": 8, "float": 4, "string": 64}


def _run_local(
    graph: PropertyGraph, kernel, schema: str, cols: tuple = ("src", "dst")
) -> DataFrame:
    """Run a numpy kernel over the (small) edge list in one python
    process: the driver below DRIVER_LOCAL_EDGE_LIMIT edges AND
    DRIVER_LOCAL_BYTES_LIMIT estimated bytes, else one executor task
    via coalesce(1)+mapInPandas (narrow read of the cached edge view,
    no shuffle).

    NOTE the driver route is EAGER AT BUILD TIME: constructing the
    returned DataFrame executes the kernel via toPandas and yields a
    LocalRelation snapshot (plans collapse accordingly; errors and
    cost surface at build, and the result does not reflect later
    changes to a mutable edge frame).  Harmless for the immutable
    parquet-backed views every declared query uses."""
    n_edges = _edge_count(graph)
    dtypes = dict(graph.edges.dtypes)
    est_bytes = n_edges * sum(
        _COL_WIDTHS.get(dtypes.get(c, ""), _COL_WIDTH_DEFAULT) for c in cols
    )
    if n_edges <= DRIVER_LOCAL_EDGE_LIMIT and est_bytes <= DRIVER_LOCAL_BYTES_LIMIT:
        pdf = graph.edges.select(*cols).toPandas()
        spark = graph.edges.sparkSession
        if not len(pdf):
            return spark.createDataFrame([], schema)
        return spark.createDataFrame(kernel(pdf), schema=schema)

    import pandas as pd

    def run(batches):
        parts = list(batches)
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        if len(pdf):
            yield kernel(pdf)

    return graph.edges.select(*cols).coalesce(1).mapInPandas(run, schema=schema)


def bfs_distances(
    graph: PropertyGraph, source: str, max_hops: int, local: bool | None = None
) -> DataFrame:
    """Min hop-distance (<= max_hops) from `source` to every reachable
    node, source included at distance 0.  Frontier-style: per superstep,
    broadcast the frontier onto the edges, subtract already-visited.
    Returns DataFrame(node, d).

    local=None auto-routes small graphs to the numpy kernel (identical
    semantics, one task); the distributed loop is the 100 TB path.
    """
    if local is None:
        local = _edge_count(graph) < LOCAL_EDGE_THRESHOLD
    if local:
        return _run_local(
            graph, lambda pdf: _local_bfs_pdf(pdf, source, max_hops), "node string, d long"
        )
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


def _local_multi_bfs_pdf(pdf, sources, max_hops: int):
    """numpy multi-source BFS kernel: one adjacency build, one BFS per
    landmark over it."""
    import numpy as np
    import pandas as pd

    nodes, src, dst = _factorize_edges(pdf)
    n = len(nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    order = np.argsort(src, kind="stable")
    s_sorted, d_sorted = src[order], dst[order]
    starts = np.searchsorted(s_sorted, np.arange(n + 1))
    out_lm, out_node, out_d = [], [], []
    for lm in sources:
        if lm not in idx:
            # absent-landmark convention: report the landmark itself at
            # distance 0 (matches the distributed seed and
            # bfs_distances' documented behavior on both paths)
            out_lm.append(lm)
            out_node.append(lm)
            out_d.append(0)
            continue
        dist = np.full(n, -1, dtype="int64")
        dist[idx[lm]] = 0
        frontier = [idx[lm]]
        for hop in range(1, max_hops + 1):
            nxt = []
            for u in frontier:
                for v in d_sorted[starts[u]:starts[u + 1]]:
                    if dist[v] < 0:
                        dist[v] = hop
                        nxt.append(v)
            if not nxt:
                break
            frontier = nxt
        reached = np.flatnonzero(dist >= 0)
        out_lm.extend([lm] * len(reached))
        out_node.extend(nodes[reached])
        out_d.extend(dist[reached])
    return pd.DataFrame({"lm": out_lm, "node": out_node, "d": out_d})


def multi_source_bfs(
    graph: PropertyGraph, sources: list, max_hops: int, local: bool | None = None
) -> DataFrame:
    """Hop distances from EVERY landmark in `sources` in one frontier
    loop: state is keyed (lm, node), so k landmarks cost the same
    superstep count as one BFS — the landmark-sampling basis for
    closeness/eccentricity at scale, where per-node exact centrality
    (O(V) BFS runs) is infeasible.  Returns DataFrame(lm, node, d).
    """
    if local is None:
        local = _edge_count(graph) < LOCAL_EDGE_THRESHOLD
    if local:
        return _run_local(
            graph,
            lambda pdf: _local_multi_bfs_pdf(pdf, sources, max_hops),
            "lm string, node string, d long",
        )
    spark = graph.edges.sparkSession
    visited = spark.createDataFrame(
        [(s, s, 0) for s in sources], ["lm", "node", "d"]
    ).localCheckpoint(eager=True)
    frontier = visited
    for hop in range(1, max_hops + 1):
        fr = F.broadcast(frontier.select("lm", "node"))
        nxt = (
            graph.edges.join(fr, graph.edges.src == fr.node, "inner")
            .select("lm", F.col("dst").alias("node"))
            .distinct()
        )
        frontier = (
            nxt.join(
                F.broadcast(
                    visited.select(F.col("lm").alias("vlm"), F.col("node").alias("vn"))
                ),
                (nxt.lm == F.col("vlm")) & (nxt.node == F.col("vn")),
                "left_anti",
            )
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


def connected_components(
    graph: PropertyGraph,
    max_iter: int = 50,
    local: bool | None = None,
    broadcast_state: bool | None = None,
) -> DataFrame:
    """Min-id label propagation to fixpoint over (assumed symmetric)
    edges.  Returns DataFrame(node, component) where component is the
    lexicographically smallest reachable node id.

    broadcast_state=None auto-picks the superstep join layout (see
    :func:`pagerank` / :func:`_attach_contributions`): above
    VERTEX_STATE_BROADCAST_LIMIT vertices the delta set joins an
    src-partitioned edge copy instead of broadcasting, so the
    first rounds (delta == |V|) never broadcast the state vector.
    """
    if local is None:
        local = _edge_count(graph) < LOCAL_EDGE_THRESHOLD
    if local:
        return _run_local(graph, _local_cc_pdf, "node string, component string")
    spark = graph.edges.sparkSession
    nodes = (
        graph.edges.select(F.col("src").alias("node"))
        .union(graph.edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()  # read 2-3x below (layout count + state init)
    )
    bcast = _use_broadcast_state(nodes.count(), broadcast_state)
    # see pagerank: the edge layout is keyed by the superstep mode —
    # dst pre-partitioning makes the per-round combine exchange-free
    # under the broadcast join; src pre-partitioning co-partitions the
    # edges with the (node-keyed) delta for the shuffle-state join
    edges = (
        graph.edges.select("src", "dst")
        .repartition(spark.sparkContext.defaultParallelism, "dst" if bcast else "src")
        .persist()
    )
    state = (
        nodes.select("node", F.col("node").alias("component"))
        .repartition(spark.sparkContext.defaultParallelism, "node")
        .localCheckpoint(eager=True)
    )
    nodes.unpersist()
    # Delta propagation: a node's label only decreases, and a neighbor's
    # new minimum can only arrive from a node whose label CHANGED last
    # round — so only the delta set sends messages.  Round 1 everyone is
    # a delta; after the first couple of rounds the delta (and its
    # broadcast) collapses to the still-converging fringe, so late
    # rounds cost almost nothing even on diameter-bound graphs.
    delta = state
    for _ in range(max_iter):
        msgs = (
            _attach_contributions(edges, delta.withColumnRenamed("node", "src"), bcast)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        # keep old + new side by side in ONE checkpointed frame so the
        # delta extraction is a cheap filter on it, not a second
        # state-vs-state sort-merge join per round
        step = (
            state.join(msgs.withColumnRenamed("node", "mnode"),
                       state.node == F.col("mnode"), "left")
            .select(
                "node",
                F.col("component").alias("old_component"),
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_min"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        delta = step.filter(F.col("component") != F.col("old_component")).select(
            "node", "component"
        )
        state = step.select("node", "component")
        if not delta.take(1):
            break
    edges.unpersist()
    return state


def pagerank(
    graph: PropertyGraph,
    iterations: int = 10,
    damping: float = 0.85,
    local: bool | None = None,
    broadcast_state: bool | None = None,
) -> DataFrame:
    """Classic PageRank, uniform init 1/|V|, damping default 0.85,
    contributions along `edges` split by out-degree.  Nodes with no
    in-edges get the teleport term only.  Returns DataFrame(node, rank).

    Distributed superstep cost: ONE shuffle (message combine by dst).
    broadcast_state=None auto-picks the superstep join layout: rank
    broadcast onto dst-partitioned edges while |V| <=
    VERTEX_STATE_BROADCAST_LIMIT, else the shuffle-state layout
    (state co-partitioned with an src-partitioned edge copy — see
    :func:`_attach_contributions`) so billion-vertex graphs never
    broadcast the state vector.  Small graphs auto-route to the numpy
    kernel (local=None).
    """
    if local is None:
        local = _edge_count(graph) < LOCAL_EDGE_THRESHOLD
    if local:
        return _run_local(
            graph,
            lambda pdf: _local_pagerank_pdf(pdf, iterations, damping),
            "node string, rank double",
        )
    spark0 = graph.edges.sparkSession
    nodes = (
        graph.edges.select(F.col("src").alias("node"))
        .union(graph.edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()  # read 2-3x below (layout count + state init)
    )
    nv = nodes.count()
    if nv == 0:
        return spark0.createDataFrame([], "node string, rank double")

    # Pre-partition edges ONCE, keyed by the superstep layout: broadcast
    # mode keys on dst (the broadcast join preserves it, so the
    # per-superstep groupBy(dst) combine needs no exchange); shuffle
    # mode keys on src (co-partitioned with state, so the contribution
    # join needs no exchange and the dst combine is the one shuffle).
    # State CARRIES the out-degree (one init join instead of a
    # rank-x-outdeg sort-merge join per superstep) and is pre-partitioned
    # on node, the same key the message combine emits, so the
    # state-update join is exchange-free too — measured 3.2x
    # (38 s -> 12 s) for 10 iterations on a 5M-edge synthetic graph.
    bcast = _use_broadcast_state(nv, broadcast_state)
    spark = graph.edges.sparkSession
    n_part = spark.sparkContext.defaultParallelism
    edges = (
        graph.edges.select("src", "dst")
        .repartition(n_part, "dst" if bcast else "src")
        .persist()
    )
    edges.count()
    outdeg = graph.edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    state = (
        nodes.join(outdeg, "node", "left")
        .select(
            "node",
            F.coalesce("deg", F.lit(0)).alias("deg"),
            F.lit(1.0 / nv).alias("rank"),
        )
        .repartition(n_part, "node")
        .localCheckpoint(eager=True)
    )
    nodes.unpersist()
    for _ in range(iterations):
        contrib = state.filter(F.col("deg") > 0).select(
            F.col("node").alias("src"), (F.col("rank") / F.col("deg")).alias("w")
        )
        msgs = (
            _attach_contributions(edges, contrib, bcast)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("w").alias("acc"))
        )
        state = (
            state.join(msgs, "node", "left")
            .select(
                "node",
                "deg",
                (F.lit((1.0 - damping) / nv) + F.lit(damping) * F.coalesce(F.col("acc"), F.lit(0.0))).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    edges.unpersist()
    return state.select("node", "rank")


def _local_ppr_pdf(pdf, sources, iterations: int, damping: float):
    """numpy personalized-PageRank kernel over one pandas edge list."""
    import numpy as np
    import pandas as pd

    nodes, src, dst = _factorize_edges(pdf)
    n = len(nodes)
    deg = np.bincount(src, minlength=n).astype("float64")
    is_src = np.isin(nodes, np.asarray(list(sources), dtype=object))
    ns = int(is_src.sum())
    if ns == 0:
        return pd.DataFrame({"node": nodes, "rank": np.zeros(n)})
    tele = np.where(is_src, 1.0 / ns, 0.0)
    rank = tele.copy()
    for _ in range(int(iterations)):
        contrib = np.where(deg > 0, rank / np.maximum(deg, 1), 0.0)
        acc = np.bincount(dst, weights=contrib[src], minlength=n)
        rank = (1.0 - damping) * tele + damping * acc
    return pd.DataFrame({"node": nodes, "rank": rank})


def _local_wpagerank_pdf(pdf, iterations: int, damping: float):
    """numpy weighted-PageRank kernel over one pandas (src, dst, weight)
    edge list: contributions split proportionally to edge weight."""
    import numpy as np
    import pandas as pd

    nodes, src, dst = _factorize_edges(pdf)
    n = len(nodes)
    w = pdf["weight"].to_numpy(dtype="float64")
    wout = np.bincount(src, weights=w, minlength=n)
    rank = np.full(n, 1.0 / n)
    for _ in range(int(iterations)):
        per_w = np.where(wout > 0, rank / np.where(wout > 0, wout, 1.0), 0.0)
        acc = np.bincount(dst, weights=per_w[src] * w, minlength=n)
        rank = (1.0 - damping) / n + damping * acc
    return pd.DataFrame({"node": nodes, "rank": rank})


def pagerank_weighted(
    graph: PropertyGraph,
    iterations: int = 10,
    damping: float = 0.85,
    weight_col: str = "weight",
    local: bool | None = None,
    broadcast_state: bool | None = None,
) -> DataFrame:
    """PageRank with edge-weight-proportional mass distribution (the
    Neo4j GDS `relationshipWeightProperty` variant): a node's rank is
    split across out-edges as weight/sum(out-weights) instead of 1/deg.
    Uniform init 1/|V|; teleport (1-d)/|V|.  Returns (node, rank).

    Superstep cost model is IDENTICAL to `pagerank` — one message
    combine on dst over stationary pre-partitioned edges, rank and
    out-weight frames broadcast — weights ride the edge rows that never
    move, so the weighted variant is free at 100 TB relative to the
    unweighted one.  Small graphs auto-route to the numpy kernel.
    """
    edges3 = graph.edges.select("src", "dst", F.col(weight_col).cast("double").alias("weight"))
    if local is None:
        local = _edge_count(graph) < LOCAL_EDGE_THRESHOLD
    if local:
        return _run_local(
            PropertyGraph(graph.vertices, edges3),
            lambda pdf: _local_wpagerank_pdf(pdf, iterations, damping),
            "node string, rank double",
            cols=("src", "dst", "weight"),
        )
    nodes = (
        edges3.select(F.col("src").alias("node"))
        .union(edges3.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    nv = nodes.count()
    spark = edges3.sparkSession
    if nv == 0:
        nodes.unpersist()
        return spark.createDataFrame([], "node string, rank double")
    n_part = spark.sparkContext.defaultParallelism
    bcast = _use_broadcast_state(nv, broadcast_state)
    edges = edges3.repartition(n_part, "dst" if bcast else "src").persist()
    edges.count()
    # state carries out-weight; see `pagerank` for the superstep layout
    outw = edges3.groupBy(F.col("src").alias("node")).agg(F.sum("weight").alias("ws"))
    state = (
        nodes.join(outw, "node", "left")
        .select(
            "node",
            F.coalesce("ws", F.lit(0.0)).alias("ws"),
            F.lit(1.0 / nv).alias("rank"),
        )
        .repartition(n_part, "node")
        .localCheckpoint(eager=True)
    )
    nodes.unpersist()
    for _ in range(iterations):
        per_w = state.filter(F.col("ws") > 0).select(
            F.col("node").alias("src"), (F.col("rank") / F.col("ws")).alias("pw")
        )
        msgs = (
            _attach_contributions(edges, per_w, bcast)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("pw") * F.col("weight")).alias("acc"))
        )
        state = (
            state.join(msgs, "node", "left")
            .select(
                "node",
                "ws",
                (
                    F.lit((1.0 - damping) / nv)
                    + F.lit(damping) * F.coalesce(F.col("acc"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    edges.unpersist()
    return state.select("node", "rank")


def incremental_components(labels: DataFrame, new_edges: DataFrame) -> DataFrame:
    """Incremental connected components: given `labels` (node,
    component) from a previous run — components labelled by their
    lexicographically smallest member, the `connected_components`
    invariant — and a batch of `new_edges` (src, dst, assumed
    symmetric), produce the labels of the UNION graph without touching
    the old edges.

    The classic contraction argument: a new edge can only merge whole
    existing components, so it suffices to (1) self-label endpoints
    never seen before, (2) project new edges onto the component graph
    (comp(u), comp(v)) — a tiny graph, one distinct pair per touched
    component pair, (3) run plain CC on that contracted graph, and
    (4) re-map.  min-label composition is associative (min over merged
    groups == min over all members), so the result is IDENTICAL to a
    full recompute — proven by the g79 oracle and the property test,
    never assumed.

    Scale shape: the old edge set (the 100 TB part) is NEVER read; the
    cost is two broadcast label lookups on the delta plus a CC on a
    graph with at most one node per touched component.  This is the
    evolving-graph maintenance path: label once, absorb edge batches.
    """
    lab = labels.select("node", "component")
    ends = (
        new_edges.select(F.col("src").alias("node"))
        .union(new_edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    fresh = ends.join(lab, "node", "left_anti").select(
        "node", F.col("node").alias("component")
    )
    lab_all = lab.unionByName(fresh).localCheckpoint(eager=True)
    la = lab_all.select(F.col("node").alias("src"), F.col("component").alias("ca"))
    lb = lab_all.select(F.col("node").alias("dst"), F.col("component").alias("cb"))
    ce = (
        new_edges.join(la, "src")
        .join(lb, "dst")
        .filter(F.col("ca") != F.col("cb"))
        .select("ca", "cb")
        .distinct()
    )
    ce_sym = ce.union(ce.select(F.col("cb").alias("ca"), F.col("ca").alias("cb")))
    if not ce_sym.take(1):
        return lab_all
    cg = connected_components(
        PropertyGraph(
            ce_sym.select(F.col("ca").alias("id")).distinct(),
            ce_sym.select(F.col("ca").alias("src"), F.col("cb").alias("dst")),
        )
    ).select(F.col("node").alias("component"), F.col("component").alias("root"))
    return lab_all.join(F.broadcast(cg), "component", "left").select(
        "node", F.coalesce("root", F.col("component")).alias("component")
    )


def _local_katz_pdf(pdf, iterations: int, alpha: float):
    """numpy Katz kernel over one pandas edge list: x <- 1 + alpha*A^T x."""
    import numpy as np
    import pandas as pd

    nodes, src, dst = _factorize_edges(pdf)
    n = len(nodes)
    x = np.ones(n)
    for _ in range(int(iterations)):
        acc = np.bincount(dst, weights=x[src], minlength=n)
        x = 1.0 + alpha * acc
    return pd.DataFrame({"node": nodes, "katz": x})


def katz_centrality(
    graph: PropertyGraph,
    iterations: int = 6,
    alpha: float = 0.005,
    local: bool | None = None,
    broadcast_state: bool | None = None,
) -> DataFrame:
    """Truncated Katz centrality: x = sum_{k<=T} alpha^k (A^T)^k 1,
    computed as T rounds of x <- 1 + alpha * A^T x (beta = 1).  Unlike
    PageRank there is no out-degree normalization — a node is central
    for being reachable by MANY short walks, the bibliometric /
    influence-count semantic.  alpha must stay below 1/lambda_max for
    the untruncated series to converge; the truncated form is always
    finite and is what both engines compute.  Returns (node, katz).

    Distributed superstep cost is pagerank's minus the degree join:
    ONE message combine on dst over stationary pre-partitioned edges,
    the x-vector broadcast.  Small graphs auto-route to numpy.
    """
    if local is None:
        local = _edge_count(graph) < LOCAL_EDGE_THRESHOLD
    if local:
        return _run_local(
            graph,
            lambda pdf: _local_katz_pdf(pdf, iterations, alpha),
            "node string, katz double",
        )
    spark = graph.edges.sparkSession
    nodes = (
        graph.edges.select(F.col("src").alias("node"))
        .union(graph.edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()  # read 2-3x below (layout count + state init)
    )
    n_part = spark.sparkContext.defaultParallelism
    bcast = _use_broadcast_state(nodes.count(), broadcast_state)
    edges = (
        graph.edges.select("src", "dst")
        .repartition(n_part, "dst" if bcast else "src")
        .persist()
    )
    edges.count()
    state = (
        nodes.select("node", F.lit(1.0).alias("katz"))
        .repartition(n_part, "node")
        .localCheckpoint(eager=True)
    )
    nodes.unpersist()
    for _ in range(iterations):
        xs = state.select(F.col("node").alias("src"), F.col("katz").alias("x"))
        msgs = (
            _attach_contributions(edges, xs, bcast)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("x").alias("acc"))
        )
        state = (
            state.join(msgs, "node", "left")
            .select(
                "node",
                (F.lit(1.0) + F.lit(alpha) * F.coalesce(F.col("acc"), F.lit(0.0))).alias(
                    "katz"
                ),
            )
            .localCheckpoint(eager=True)
        )
    edges.unpersist()
    return state.select("node", "katz")


def _local_louvain_pdf(pdf, rounds: int):
    """numpy synchronous local-moving kernel; integer scores, community
    ids relabelled so int-min == lexicographic string-min (the CC-kernel
    trick), so tie-breaks match the SQL oracle exactly."""
    import numpy as np
    import pandas as pd

    nodes, src0, dst0 = _factorize_edges(pdf)
    n = len(nodes)
    order = np.argsort(nodes)
    rank_of = np.empty(n, dtype="int64")
    rank_of[order] = np.arange(n)
    snodes = nodes[order]  # snodes[rank] = node string
    src = rank_of[src0]
    dst = rank_of[dst0]
    m2 = len(src)
    k = np.bincount(src, minlength=n).astype("int64")
    comm = np.arange(n, dtype="int64")
    for _ in range(int(rounds)):
        sigma = np.bincount(comm, weights=k, minlength=n).astype("int64")
        # per-(v, neighbor community) edge counts
        key = src * n + comm[dst]
        uk, evc = np.unique(key, return_counts=True)
        v = uk // n
        c = uk % n
        # ensure own community is always a candidate (evc contribution 0)
        own_key = np.arange(n, dtype="int64") * n + comm
        extra = np.setdiff1d(own_key, uk, assume_unique=False)
        v = np.concatenate([v, extra // n])
        c = np.concatenate([c, extra % n])
        evc = np.concatenate([evc.astype("int64"), np.zeros(len(extra), dtype="int64")])
        sig_ex = sigma[c] - np.where(comm[v] == c, k[v], 0)
        score = m2 * evc - k[v] * sig_ex
        # argmax per v, tie-break smallest community id
        sel = np.lexsort((c, -score, v))  # sort by v, then -score, then c
        v_s, c_s = v[sel], c[sel]
        first = np.ones(len(v_s), dtype=bool)
        first[1:] = v_s[1:] != v_s[:-1]
        comm = comm.copy()
        comm[v_s[first]] = c_s[first]
    return pd.DataFrame({"node": snodes[np.arange(n)], "comm": snodes[comm]})


def louvain_local_rounds(
    graph: PropertyGraph, rounds: int = 3, local: bool | None = None
) -> DataFrame:
    """Synchronous Louvain local-moving phase, made exactly reproducible:
    every node simultaneously moves to the neighboring community with
    the highest modularity gain, where the gain comparison is the EXACT
    INTEGER m2*e_vc - k_v*(sigma_c - k_v*[v in c]) (all constant terms
    of deltaQ dropped, m2 = |directed sym edges|), tie-broken on the
    lexicographically smallest community id.  No floats anywhere, so
    any engine — including the unrolled SQL oracle — lands on
    bit-identical partitions.  Community ids are node ids (init: own).

    The synchronous schedule is the distributed-friendly variant
    (classic Louvain is inherently sequential); a fixed round count
    keeps it deterministic — label oscillation is possible and
    harmless for the declared semantics.  Per round, distributed:
    ONE shuffle for the (v, neighbor-community) message combine over
    stationary edges, community sizes broadcast.  Small graphs
    auto-route to the numpy kernel.  Returns DataFrame(node, comm).
    """
    if local is None:
        local = _edge_count(graph) < LOCAL_EDGE_THRESHOLD
    if local:
        return _run_local(
            graph,
            lambda pdf: _local_louvain_pdf(pdf, rounds),
            "node string, comm string",
        )
    spark = graph.edges.sparkSession
    n_part = spark.sparkContext.defaultParallelism
    edges = graph.edges.select("src", "dst").repartition(n_part, "src").persist()
    m2 = edges.count()
    deg = edges.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("k"))
    comm = deg.select("node", F.col("node").alias("comm")).localCheckpoint(eager=True)
    for _ in range(rounds):
        cm = F.broadcast(comm)
        sig = F.broadcast(
            comm.join(deg, "node").groupBy("comm").agg(F.sum("k").alias("s"))
        )
        evc = (
            edges.join(
                cm.select(F.col("node").alias("dst"), F.col("comm").alias("ncomm")),
                "dst",
            )
            .groupBy(F.col("src").alias("v"), F.col("ncomm").alias("comm"))
            .agg(F.count(F.lit(1)).cast("long").alias("evc"))
        )
        own = comm.select(
            F.col("node").alias("v"), "comm", F.lit(0).cast("long").alias("evc")
        )
        cand = (
            evc.unionByName(own)
            .groupBy("v", "comm")
            .agg(F.max("evc").alias("evc"))
        )
        cur = cm.select(F.col("node").alias("v"), F.col("comm").alias("cur_comm"))
        dv = F.broadcast(deg.select(F.col("node").alias("v"), F.col("k").alias("kv")))
        sc = (
            cand.join(dv, "v")
            .join(cur, "v")
            .join(sig.withColumnRenamed("s", "sigma"), "comm")
            .select(
                "v",
                "comm",
                (
                    F.lit(m2) * F.col("evc")
                    - F.col("kv")
                    * (
                        F.col("sigma")
                        - F.when(F.col("cur_comm") == F.col("comm"), F.col("kv")).otherwise(
                            F.lit(0)
                        )
                    )
                ).alias("s"),
            )
        )
        w = Window.partitionBy("v").orderBy(F.col("s").desc(), F.col("comm"))
        comm = (
            sc.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select(F.col("v").alias("node"), "comm")
            .localCheckpoint(eager=True)
        )
    edges.unpersist()
    return comm


def personalized_pagerank(
    graph: PropertyGraph,
    sources: list,
    iterations: int = 10,
    damping: float = 0.85,
    local: bool | None = None,
    broadcast_state: bool | None = None,
) -> DataFrame:
    """Personalized PageRank: teleport mass restricted to `sources`
    (uniform 1/|S| init and reset).  Same superstep shape as `pagerank`
    — ONE shuffle per iteration (message combine on dst over edges
    pre-partitioned by dst), rank/out-degree broadcast — so the 100 TB
    cost model is identical; only the teleport vector changes.
    Returns DataFrame(node, rank).
    """
    if local is None:
        local = _edge_count(graph) < LOCAL_EDGE_THRESHOLD
    if local:
        return _run_local(
            graph,
            lambda pdf: _local_ppr_pdf(pdf, sources, iterations, damping),
            "node string, rank double",
        )
    nodes = (
        graph.edges.select(F.col("src").alias("node"))
        .union(graph.edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()  # read 2-3x below (layout count + state init)
    )
    src_set = [str(s) for s in sources]
    ns = nodes.filter(F.col("node").isin(src_set)).count()
    spark = graph.edges.sparkSession
    if ns == 0:
        # no seed present in the graph: zero teleport mass everywhere
        # (materialize before unpersisting the frame the plan reads)
        out = nodes.select("node", F.lit(0.0).alias("rank")).localCheckpoint(
            eager=True
        )
        nodes.unpersist()
        return out
    tele = F.when(F.col("node").isin(src_set), F.lit(1.0 / ns)).otherwise(F.lit(0.0))
    n_part = spark.sparkContext.defaultParallelism
    bcast = _use_broadcast_state(nodes.count(), broadcast_state)
    edges = (
        graph.edges.select("src", "dst")
        .repartition(n_part, "dst" if bcast else "src")
        .persist()
    )
    edges.count()
    # state carries out-degree; see `pagerank` for the superstep layout
    outdeg = graph.edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    state = (
        nodes.join(outdeg, "node", "left")
        .select("node", F.coalesce("deg", F.lit(0)).alias("deg"), tele.alias("rank"))
        .repartition(n_part, "node")
        .localCheckpoint(eager=True)
    )
    nodes.unpersist()
    for _ in range(iterations):
        contrib = state.filter((F.col("deg") > 0) & (F.col("rank") != 0)).select(
            F.col("node").alias("src"), (F.col("rank") / F.col("deg")).alias("w")
        )
        msgs = (
            _attach_contributions(edges, contrib, bcast)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("w").alias("acc"))
        )
        state = (
            state.join(msgs, "node", "left")
            .select(
                "node",
                "deg",
                (
                    F.lit(1.0 - damping) * tele
                    + F.lit(damping) * F.coalesce(F.col("acc"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    edges.unpersist()
    return state.select("node", "rank")


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


def edge_triangle_support(edges_undirected_pairs: DataFrame) -> DataFrame:
    """Per-edge triangle support (the k-truss counting kernel): for each
    canonical edge (s1 < s2), how many triangles contain it.  Same
    a<b<c three-way self-join as triangle_count, then each triangle
    credits its three edges via UNION ALL + groupBy — all equi-joins on
    edge endpoints, map-side combinable.  Edges in no triangle are
    absent (support 0).  Returns (s1, s2, support).
    """
    e1 = edges_undirected_pairs.select(F.col("s1").alias("a"), F.col("s2").alias("b"))
    e2 = edges_undirected_pairs.select(F.col("s1").alias("b2"), F.col("s2").alias("c2"))
    e3 = edges_undirected_pairs.select(F.col("s1").alias("a3"), F.col("s2").alias("c3"))
    tri = (
        e1.join(e2, e1.b == e2.b2, "inner")
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c2") == F.col("c3")), "inner")
        .select("a", "b", F.col("c2").alias("c"))
    )
    sup = (
        tri.select(F.col("a").alias("s1"), F.col("b").alias("s2"))
        .unionAll(tri.select(F.col("b").alias("s1"), F.col("c").alias("s2")))
        .unionAll(tri.select(F.col("a").alias("s1"), F.col("c").alias("s2")))
    )
    return sup.groupBy("s1", "s2").agg(F.count(F.lit(1)).alias("support"))


def shortest_paths_weighted(
    graph: PropertyGraph,
    source: str,
    weight_col: str,
    max_iter: int = 20,
    local: bool | None = None,
) -> DataFrame:
    """Bellman-Ford style relaxation (Dijkstra analog on Spark: no
    priority queue across partitions, so iterate relaxations to
    fixpoint).  Returns DataFrame(node, dist).  Hash-declared with
    integer weights (g14); small graphs auto-route to the numpy kernel
    with identical per-round semantics."""
    if local is None:
        local = _edge_count(graph) < LOCAL_EDGE_THRESHOLD
    if local:
        return _run_local(
            graph,
            lambda pdf: _local_sssp_pdf(pdf, source, weight_col, max_iter),
            "node string, dist double",
            cols=("src", "dst", weight_col),
        )
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
        dist = new_dist
        # `same` is empty only when NO node improved and none is new (a
        # new node has o.dist NULL and lands in the probe), so the old
        # prev/new count() comparison was two redundant full-scan jobs
        # per relaxation round
        if not same:
            break
    return dist


def shortest_paths_delta_stepping(
    graph: PropertyGraph,
    source: str,
    weight_col: str,
    delta: float,
    max_outer: int = 200,
    max_inner: int = 100,
) -> DataFrame:
    """Delta-stepping SSSP (Meyer & Sanders): tentative distances are
    processed in buckets of width `delta`; LIGHT edges (w <= delta)
    relax in an inner fixpoint within the current bucket, HEAVY edges
    relax once after the bucket settles.  Non-negative weights only.
    Returns DataFrame(node, dist) — identical values to
    :func:`shortest_paths_weighted` (both are exact SSSP).

    This is the documented upgrade path over the Bellman-Ford rounds of
    `shortest_paths_weighted` for LARGE-DIAMETER weighted graphs (road
    networks — the reference system's home turf): Bellman-Ford needs
    diameter-in-hops rounds over ALL edges; delta-stepping's inner
    loops touch only the frontier's light edges, and heavy edges relax
    once per bucket instead of once per round.  Each inner step is the
    standard superstep (broadcast frontier onto stationary edges + one
    min-combine); the bucket index is the only scalar the driver sees.
    """
    spark = graph.edges.sparkSession
    w = F.col(weight_col).cast("double")
    edges = graph.edges.select("src", "dst", w.alias("w")).localCheckpoint(eager=True)
    edges_l = edges.filter(F.col("w") <= delta).localCheckpoint(eager=True)
    edges_h = edges.filter(F.col("w") > delta).localCheckpoint(eager=True)
    dist = spark.createDataFrame([(source, 0.0)], ["node", "dist"]).localCheckpoint(eager=True)
    bucket = F.floor(F.col("dist") / F.lit(float(delta)))

    def relax(frontier: DataFrame, e: DataFrame, cur: DataFrame) -> DataFrame:
        fr = F.broadcast(frontier.select(F.col("node").alias("fsrc"), F.col("dist").alias("fd")))
        cand = e.join(fr, e.src == F.col("fsrc")).select(
            F.col("dst").alias("node"), (F.col("fd") + F.col("w")).alias("dist")
        )
        return (
            cur.unionByName(cand)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )

    b_floor = 0
    for _ in range(max_outer):
        nxt = (
            dist.filter(bucket >= b_floor).agg(F.min(bucket).alias("b")).collect()[0]["b"]
        )
        if nxt is None:
            break
        b = int(nxt)
        frontier = dist.filter(bucket == b)
        for _ in range(max_inner):
            new_dist = relax(frontier, edges_l, dist)
            # nodes whose distance improved INTO or WITHIN bucket b keep
            # relaxing; improvements into later buckets wait their turn
            changed = (
                new_dist.alias("n")
                .join(dist.alias("o"), F.col("n.node") == F.col("o.node"), "left")
                .filter(F.col("o.dist").isNull() | (F.col("n.dist") < F.col("o.dist")))
                .select(F.col("n.node").alias("node"), F.col("n.dist").alias("dist"))
            )
            frontier = changed.filter(bucket == b).localCheckpoint(eager=True)
            dist = new_dist
            if not frontier.take(1):
                break
        settled = dist.filter(bucket == b)
        dist = relax(settled, edges_h, dist)
        b_floor = b + 1
    return dist


def k_core(
    graph: PropertyGraph, k: int, max_iter: int = 100, local: bool | None = None
) -> DataFrame:
    """k-core decomposition membership: iteratively peel nodes with
    degree < k over (assumed symmetric) edges until stable.  Returns
    DataFrame(node, degree) for the surviving core.

    Each round: degree count (one shuffle) + semi-join edge filter;
    rounds <= peel depth.  At 100 TB the edge table shrinks
    monotonically, so persist-and-replace per round keeps lineage and
    scan size bounded.  Small graphs auto-route to the numpy kernel."""
    if local is None:
        local = _edge_count(graph) < LOCAL_EDGE_THRESHOLD
    if local:
        return _run_local(
            graph,
            lambda pdf: _local_kcore_pdf(pdf, k, max_iter),
            "node string, degree long",
        )
    edges = graph.edges.select("src", "dst").localCheckpoint(eager=True)
    for _ in range(max_iter):
        deg = edges.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("degree"))
        keep = deg.filter(F.col("degree") >= k).select("node").localCheckpoint(eager=True)
        n_before = edges.count()
        kb = F.broadcast(keep)
        edges = (
            edges.join(kb, edges.src == kb.node, "left_semi")
            .join(kb, edges.dst == kb.node, "left_semi")
            .localCheckpoint(eager=True)
        )
        if edges.count() == n_before:
            break
    return edges.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("degree"))


def _kosaraju_pdf(pdf):
    """Single-task Kosaraju SCC kernel over one pandas (src, dst) edge
    list.  Component label = lexicographic min member id."""
    import pandas as pd

    nodes, src, dst = _factorize_edges(pdf)
    n = len(nodes)
    fwd: list[list[int]] = [[] for _ in range(n)]
    rev: list[list[int]] = [[] for _ in range(n)]
    for a, b in zip(src, dst):
        fwd[a].append(b)
        rev[b].append(a)
    # iterative Kosaraju: order pass on fwd, assign pass on rev
    visited = [False] * n
    order: list[int] = []
    for s in range(n):
        if visited[s]:
            continue
        stack = [(s, 0)]
        visited[s] = True
        while stack:
            u, i = stack.pop()
            if i < len(fwd[u]):
                stack.append((u, i + 1))
                v = fwd[u][i]
                if not visited[v]:
                    visited[v] = True
                    stack.append((v, 0))
            else:
                order.append(u)
    comp = [-1] * n
    for s in reversed(order):
        if comp[s] != -1:
            continue
        comp[s] = s
        stack2 = [s]
        while stack2:
            u = stack2.pop()
            for v in rev[u]:
                if comp[v] == -1:
                    comp[v] = s
                    stack2.append(v)
    groups: dict[int, list[int]] = {}
    for i, c in enumerate(comp):
        groups.setdefault(c, []).append(i)
    label = {}
    for members in groups.values():
        rep = min(nodes[m] for m in members)
        for m in members:
            label[m] = rep
    return pd.DataFrame({"node": list(nodes), "component": [label[i] for i in range(n)]})


def _scc_reach(ein: DataFrame, pivots: DataFrame, max_inner: int, reverse: bool) -> DataFrame:
    """Multi-source reachability from each partition's pivot, constrained
    to that partition's (same-part) edges.  One frontier loop covers ALL
    partitions simultaneously — state is keyed (part, node), so the
    superstep count is the max BFS depth over partitions, not the sum.
    `reverse=True` walks edges backward.  Returns (part, node).

    `max_inner` is a superstep HORIZON, not a convergence proof: a
    partition whose diameter exceeds it yields an incomplete reach set
    (and thus over-split SCCs).  The default (60) covers the measured
    synthetic/fixture graphs; graphs suspected of >60-hop directed
    diameters should raise max_iter on strongly_connected_components
    or use the local Kosaraju route."""
    a, b = ("dst", "src") if reverse else ("src", "dst")
    visited = pivots.select("part", "node").localCheckpoint(eager=True)
    frontier = visited
    for _ in range(max_inner):
        # frontier/visited are |V|-bounded state; broadcast them so the
        # (checkpointed, stationary) edge frame never re-shuffles per
        # superstep — the bfs_distances layout.  Remaining superstep
        # cost is the frontier-dedup combine (distinct), which is
        # map-side partial; measured 35.4 s -> 32.5 s on the 5M-edge
        # bench graph (the dedup shuffle, not the join, dominates)
        nxt = (
            ein.join(F.broadcast(frontier.withColumnRenamed("node", a)), ["part", a])
            .select("part", F.col(b).alias("node"))
            .distinct()
        )
        frontier = nxt.join(
            F.broadcast(visited), ["part", "node"], "left_anti"
        ).localCheckpoint(eager=True)
        if not frontier.take(1):
            break
        visited = visited.unionByName(frontier).localCheckpoint(eager=True)
    return visited


def _scc_fwbw(graph: PropertyGraph, max_rounds: int, max_inner: int) -> DataFrame:
    """Distributed SCC: trimming + forward-backward decomposition with a
    pivot per partition, all partitions processed in parallel each round
    (the FW-BW-Trim algorithm of McLendon et al.; the standard
    distributed SCC — Kosaraju/Tarjan DFS orders don't parallelize).

    Invariants: every SCC lies entirely inside one partition (partitions
    are refined only along reachability boundaries), so cross-partition
    edges are dropped permanently; the pivot is the partition's min node
    id and belongs to the SCC it extracts, so component labels are the
    lexicographic min member — byte-identical to the Kosaraju kernel.

    Per round: trim (in/out-degree-0 nodes are singleton SCCs — peels
    DAG-like regions in bulk), then two multi-source frontier loops
    (forward + backward reach of every pivot at once), then a 4-way
    partition split.  Random digraphs finish in 2-3 rounds (trim +
    giant-SCC pivot); adversarial SCC-chains still converge because
    trim collapses inter-SCC DAG structure.  If rounds run out, the
    (by-then small) residue is finished by the single-task kernel."""
    spark = graph.edges.sparkSession
    e = graph.edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    part = nodes.select("node", F.lit("r").alias("part")).localCheckpoint(eager=True)
    act = e
    assigned: list[DataFrame] = []

    def same_part_edges() -> DataFrame:
        p1 = F.broadcast(part.select(F.col("node").alias("src"), F.col("part").alias("p1")))
        p2 = F.broadcast(part.select(F.col("node").alias("dst"), F.col("part").alias("p2")))
        return (
            act.join(p1, "src")
            .join(p2, "dst")
            .filter(F.col("p1") == F.col("p2"))
            .select("src", "dst", F.col("p1").alias("part"))
            .localCheckpoint(eager=True)
        )

    for _ in range(max_rounds):
        if not part.take(1):
            break
        ein = same_part_edges()
        # -- trim: a node with no in- or no out-edge in its partition is
        # a singleton SCC; peel to fixpoint (kills DAG regions in bulk)
        while True:
            both = (
                ein.select(F.col("src").alias("node"))
                .distinct()
                .join(ein.select(F.col("dst").alias("node")).distinct(), "node")
            )
            trivial = part.join(both, "node", "left_anti").localCheckpoint(eager=True)
            if not trivial.take(1):
                break
            assigned.append(trivial.select("node", F.col("node").alias("component")))
            part = part.join(trivial.select("node"), "node", "left_anti").localCheckpoint(
                eager=True
            )
            ein = (
                ein.join(
                    F.broadcast(trivial.select(F.col("node").alias("src"))), "src", "left_anti"
                )
                .join(
                    F.broadcast(trivial.select(F.col("node").alias("dst"))), "dst", "left_anti"
                )
                .localCheckpoint(eager=True)
            )
        if not part.take(1):
            break
        # -- pivot per partition + simultaneous FW / BW reach
        pivots = part.groupBy("part").agg(F.min("node").alias("node")).localCheckpoint(eager=True)
        reach_f = _scc_reach(ein, pivots, max_inner, reverse=False)
        reach_b = _scc_reach(ein, pivots, max_inner, reverse=True)
        scc = reach_f.join(reach_b, ["part", "node"]).localCheckpoint(eager=True)
        assigned.append(
            scc.join(pivots.select("part", F.col("node").alias("component")), "part").select(
                "node", "component"
            )
        )
        # -- 4-way split of the remainder: (F only | B only | neither)
        part = (
            part.join(scc, ["part", "node"], "left_anti")
            .join(reach_f.withColumn("__f", F.lit(1)), ["part", "node"], "left")
            .join(reach_b.withColumn("__b", F.lit(1)), ["part", "node"], "left")
            .select(
                "node",
                F.concat(
                    F.col("part"),
                    F.when(F.col("__f") == 1, F.lit("F"))
                    .when(F.col("__b") == 1, F.lit("B"))
                    .otherwise(F.lit("N")),
                ).alias("part"),
            )
            .localCheckpoint(eager=True)
        )
        act = ein.select("src", "dst")
    if part.take(1):
        # residue after max_rounds: same-part edges only (cross-part
        # edges can't be in an SCC), finished by the single-task kernel
        residue = same_part_edges().select("src", "dst")
        leftover = _run_local(
            PropertyGraph(part.select(F.col("node").alias("id")), residue),
            _kosaraju_pdf,
            "node string, component string",
        )
        assigned.append(leftover)
    if not assigned:
        return spark.createDataFrame([], "node string, component string")
    out = assigned[0]
    for df in assigned[1:]:
        out = out.unionByName(df)
    return out


def _local_coreness_pdf(pdf, max_k: int):
    """numpy full core decomposition by increasing-k peel: round k peels
    to the k-core; survivors' coreness is bumped to k.  Same per-round
    semantics as the distributed loop."""
    import numpy as np
    import pandas as pd

    nodes, src, dst = _factorize_edges(pdf)
    n = len(nodes)
    src = np.asarray(src)
    dst = np.asarray(dst)
    alive = np.ones(len(src), dtype=bool)
    core = np.zeros(n, dtype="int64")
    k = 1
    while alive.any() and k <= max_k:
        while True:
            deg = np.bincount(src[alive], minlength=n)
            keep = deg >= k
            new_alive = alive & keep[src] & keep[dst]
            if int(new_alive.sum()) == int(alive.sum()):
                break
            alive = new_alive
        deg = np.bincount(src[alive], minlength=n)
        core[deg > 0] = k
        k += 1
    mask = core > 0
    return pd.DataFrame({"node": nodes[mask], "coreness": core[mask]})


def core_decomposition(
    graph: PropertyGraph, max_k: int = 1000, local: bool | None = None
) -> DataFrame:
    """Full k-core decomposition over (assumed symmetric) edges:
    coreness(v) = the largest k such that v survives the k-core peel.
    Returns DataFrame(node, coreness) for every node with an edge.

    Generalizes :func:`k_core` (fixed k membership) the way a user of a
    graph engine expects — one call yields every core level.  The
    distributed loop peels k = 1, 2, ... on a monotonically shrinking
    checkpointed edge table (each peel round is a degree combine + two
    broadcast semi-joins, exactly k_core's shape); survivors of round k
    emit (node, k) and the final coreness is a max-combine over rounds.
    Total rounds = degeneracy of the graph — small on real-world
    graphs (the quantity itself is the output).  Small graphs
    auto-route to the numpy kernel; both paths are parity-tested
    against an independent Batagelj-Zaversnik min-degree peel."""
    if local is None:
        local = _edge_count(graph) < LOCAL_EDGE_THRESHOLD
    if local:
        return _run_local(
            graph, lambda pdf: _local_coreness_pdf(pdf, max_k), "node string, coreness long"
        )
    spark = graph.edges.sparkSession
    edges = graph.edges.select("src", "dst").localCheckpoint(eager=True)
    levels: list[DataFrame] = []
    k = 1
    while k <= max_k and edges.take(1):
        while True:
            deg = edges.groupBy(F.col("src").alias("node")).agg(
                F.count(F.lit(1)).alias("degree")
            )
            keep = deg.filter(F.col("degree") >= k).select("node").localCheckpoint(eager=True)
            n_before = edges.count()
            kb = F.broadcast(keep)
            edges = (
                edges.join(kb, edges.src == kb.node, "left_semi")
                .join(kb, edges.dst == kb.node, "left_semi")
                .localCheckpoint(eager=True)
            )
            if edges.count() == n_before:
                break
        survivors = edges.select(F.col("src").alias("node")).distinct()
        levels.append(survivors.withColumn("coreness", F.lit(k).cast("long")))
        k += 1
    if not levels:
        return spark.createDataFrame([], "node string, coreness long")
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.groupBy("node").agg(F.max("coreness").alias("coreness"))


def strongly_connected_components(
    graph: PropertyGraph,
    local: bool | None = None,
    max_rounds: int = 20,
    max_inner: int = 60,
) -> DataFrame:
    """SCC over DIRECTED edges.  Small graphs auto-route to a
    single-task Kosaraju kernel; above LOCAL_EDGE_THRESHOLD the
    distributed FW-BW-Trim decomposition (:func:`_scc_fwbw`) runs.
    Returns DataFrame(node, component) with component = lexicographic
    min member id on both paths (parity-tested)."""
    if local is None:
        local = _edge_count(graph) < LOCAL_EDGE_THRESHOLD
    if local:
        return _run_local(graph, _kosaraju_pdf, "node string, component string")
    return _scc_fwbw(graph, max_rounds, max_inner)


def label_propagation(
    graph: PropertyGraph,
    max_iter: int = 10,
    local: bool | None = None,
    broadcast_state: bool | None = None,
) -> DataFrame:
    """Community detection: each node adopts the most frequent label of
    its in-neighbors each round (ties -> smallest label).  Deterministic
    synchronous variant, hash-declared (g15); small graphs auto-route to
    the numpy kernel.  broadcast_state follows the shared Pregel layout
    rule (:func:`_attach_contributions`): above
    VERTEX_STATE_BROADCAST_LIMIT vertices the label vector joins an
    src-partitioned edge copy instead of broadcasting."""
    if local is None:
        local = _edge_count(graph) < LOCAL_EDGE_THRESHOLD
    if local:
        return _run_local(
            graph, lambda pdf: _local_lp_pdf(pdf, max_iter), "node string, label string"
        )
    spark = graph.edges.sparkSession
    n_part = spark.sparkContext.defaultParallelism
    nodes = (
        graph.edges.select(F.col("src").alias("node"))
        .union(graph.edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()  # read 2-3x below (layout count + state init)
    )
    bcast = _use_broadcast_state(nodes.count(), broadcast_state)
    edges = (
        graph.edges.select("src", "dst")
        .repartition(n_part, "dst" if bcast else "src")
        .persist()
    )
    edges.count()
    state = (
        nodes.select("node", F.col("node").alias("label"))
        .repartition(n_part, "node")
        .localCheckpoint(eager=True)
    )
    nodes.unpersist()
    for _ in range(max_iter):
        counts = (
            _attach_contributions(edges, state.withColumnRenamed("node", "src"), bcast)
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
    edges.unpersist()
    return state


def node_similarity_jaccard(
    bipartite_edges: DataFrame,
    left_col: str = "src",
    right_col: str = "dst",
    min_common: int = 1,
) -> DataFrame:
    """Jaccard similarity between right-side nodes of a bipartite edge
    set, by shared left-side neighbors (Neo4j GDS nodeSimilarity shape).

    Candidate pairs come from the self-equi-join on the shared neighbor
    key — an inverted-index join, never a cross join — so at 100 TB the
    cost is sum over neighbors of (fan-out choose 2); skewed hub
    neighbors are the hazard and should be capped/salted upstream.
    Degrees join back via broadcast (|right nodes| << |edges|).
    Returns (a, b, common, jaccard), a < b.
    """
    e = bipartite_edges.select(
        F.col(left_col).alias("nb"), F.col(right_col).alias("node")
    ).distinct()
    deg = e.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    a = e.select(F.col("nb"), F.col("node").alias("a"))
    b = e.select(F.col("nb"), F.col("node").alias("b"))
    inter = (
        a.join(b, "nb")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
        .filter(F.col("common") >= min_common)
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    return (
        inter.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .select(
            "a",
            "b",
            "common",
            F.round(
                F.col("common") / (F.col("da") + F.col("db") - F.col("common")), 6
            ).alias("jaccard"),
        )
    )


def adamic_adar(
    bipartite_edges: DataFrame,
    left_col: str = "src",
    right_col: str = "dst",
    min_common: int = 1,
) -> DataFrame:
    """Adamic-Adar link prediction between right-side nodes of a
    bipartite edge set: sum over shared left-side neighbors z of
    1/ln(deg(z)) (Neo4j GDS linkPrediction.adamicAdar shape).

    Same inverted-index self-join as :func:`node_similarity_jaccard` —
    candidate pairs enumerate per shared neighbor, never a cross join.
    The difference is WHERE the degree applies: AA weights each shared
    NEIGHBOR by its own rarity (1/ln of the neighbor's fan-out), so the
    neighbor-degree frame joins on the shared key BEFORE the pair
    aggregate.  Degree-1 neighbors are dropped (ln 1 = 0).  At scale the
    degree frame is tiny (one row per left node after distinct) and
    broadcastable; hub neighbors dominate pair fan-out and should be
    capped upstream, which also improves score quality (a hub's AA
    weight ~ 1/ln(huge) ≈ 0 anyway).
    Returns (a, b, common, aa_score), a < b, aa_score rounded 6dp.
    """
    e = bipartite_edges.select(
        F.col(left_col).alias("nb"), F.col(right_col).alias("node")
    ).distinct()
    deg = (
        e.groupBy("nb")
        .agg(F.count(F.lit(1)).alias("d"))
        .filter(F.col("d") > 1)
        .withColumn("w", F.lit(1.0) / F.log(F.col("d")))
    )
    a = e.select(F.col("nb"), F.col("node").alias("a"))
    b = e.select(F.col("nb"), F.col("node").alias("b"))
    return (
        a.join(b, "nb")
        .filter(F.col("a") < F.col("b"))
        .join(F.broadcast(deg.select("nb", "w")), "nb")
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.round(F.sum("w"), 6).alias("aa_score"),
        )
        .filter(F.col("common") >= min_common)
    )


def hits(
    edges: DataFrame,
    iterations: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """HITS hubs & authorities on a directed edge set, L1-normalized
    each half-step (Kleinberg 1999; Neo4j GDS alpha.hits shape).

    auth(n) = sum of hub over in-neighbors; hub(n) = sum of auth over
    out-neighbors; each vector rescaled to sum 1 so scores are
    comparable ratios.  Each half-step is one equi-join + one combinable
    groupBy — the same stationary-edges superstep cost as PageRank, but
    with NO teleport, so mass concentrates on the dominant bipartite
    core.  The normalization constant is a single scalar agg collected
    per half-step (driver sees one double, never data).  Returns
    (role 'hub'|'auth', node, score) un-truncated; callers rank/limit.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).distinct()
    hub = e.select("src").distinct().select(
        F.col("src").alias("node"), F.lit(1.0).alias("v")
    )
    auth = None
    for _ in range(iterations):
        raw_a = (
            e.join(hub.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum("v").alias("v"))
            .select(F.col("dst").alias("node"), "v")
        )
        za = raw_a.agg(F.sum("v")).collect()[0][0]
        auth = raw_a.select("node", (F.col("v") / F.lit(za)).alias("v")).localCheckpoint()
        raw_h = (
            e.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src")
            .agg(F.sum("v").alias("v"))
            .select(F.col("src").alias("node"), "v")
        )
        zh = raw_h.agg(F.sum("v")).collect()[0][0]
        hub = raw_h.select("node", (F.col("v") / F.lit(zh)).alias("v")).localCheckpoint()
    return hub.select(F.lit("hub").alias("role"), "node", F.col("v").alias("score")).unionAll(
        auth.select(F.lit("auth").alias("role"), "node", F.col("v").alias("score"))
    )


def ktruss_peel(
    edges_undirected_pairs: DataFrame, k: int = 4, rounds: int = 3
) -> DataFrame:
    """Bounded k-truss peel: `rounds` synchronous rounds of "drop every
    edge whose triangle support < k-2" over canonical undirected edges
    (s1 < s2).  Each round is one :func:`edge_triangle_support` pass
    (three equi-joins + a combinable groupBy) followed by a semi-join
    filter; localCheckpoint truncates the per-round lineage so the plan
    doesn't nest.  The round count is part of the declared semantics
    (both engines run exactly `rounds` sweeps whether or not a fixpoint
    is reached) — at scale the loop converges in O(max coreness) rounds
    and the support pass dominates, same cost shape as g24.
    Returns the surviving (s1, s2, support) after the final round.
    """
    e = edges_undirected_pairs.select("s1", "s2").distinct()
    sup = None
    for _ in range(rounds):
        sup = edge_triangle_support(e).filter(F.col("support") >= k - 2)
        e = sup.select("s1", "s2").localCheckpoint()
    return sup


def earliest_arrival(
    edges_ts: DataFrame, source: str, max_hops: int = 3,
    ts_col: str = "first_ts", duration_days_col: str | None = None,
) -> DataFrame:
    """Time-respecting earliest-arrival over a timestamped edge list
    (src, dst, ts): successive edges must not go back in time.  Runs a
    min-frontier label-correcting loop — lossless vs full path
    enumeration because a smaller arrival admits a superset of onward
    edges, so expanding only the per-node minimum preserves every
    reachable (node, min arrival).  Returns (node, arrival_ts).

    duration_days_col (optional) makes the traversal TIME-DEPENDENT:
    crossing an edge departing at `ts` lands at `ts + duration` days —
    the road-network routing model (travel time per edge) the reference
    system was built for.  Feasibility still compares the DEPARTURE
    time against the current arrival, and arrival at the far end does
    not depend on how early the walker reached the near end, so the
    per-node-min expansion stays lossless.

    One broadcast join + one combine per hop; the frontier is |V|-sized
    while the timestamped edges stay stationary (the Pregel cost model).
    """
    if duration_days_col is None:
        arrive = F.col(ts_col)
        e_arrive = F.col(f"e.{ts_col}")
    else:
        arrive = F.expr(f"timestampadd(DAY, {duration_days_col}, {ts_col})")
        e_arrive = F.expr(f"timestampadd(DAY, e.{duration_days_col}, e.{ts_col})")
    frontier = (
        edges_ts.filter(F.col("src") == source)
        .groupBy(F.col("dst").alias("node"))
        .agg(F.min(arrive).alias("t"))
        .localCheckpoint(eager=True)
    )
    found = [frontier]
    e = edges_ts.alias("e")
    for _ in range(max_hops - 1):
        fr = F.broadcast(frontier.alias("f"))
        frontier = (
            e.join(
                fr,
                (F.col("e.src") == F.col("f.node"))
                & (F.col(f"e.{ts_col}") >= F.col("f.t")),
            )
            .groupBy(F.col("e.dst").alias("node"))
            .agg(F.min(e_arrive).alias("t"))
            .localCheckpoint(eager=True)
        )
        found.append(frontier)
    allf = found[0]
    for f in found[1:]:
        allf = allf.unionByName(f)
    return allf.groupBy("node").agg(F.min("t").alias("arrival_ts"))


def _brandes_partial(nodes, src, dst, source_ids):
    """Vectorized Brandes dependency accumulation for one batch of
    sources over a symmetric (undirected) edge array.  Per source: a
    level-synchronous BFS computing shortest-path counts sigma, then a
    backward per-level sweep accumulating dependencies — every step is
    an edge-array mask + np.add.at, no per-node Python loops.  Returns
    the UNSCALED dependency sum (pair-double-counting not yet halved)."""
    import numpy as np

    n = len(nodes)
    bc = np.zeros(n, dtype="float64")
    for s in source_ids:
        dist = np.full(n, -1, dtype="int64")
        sigma = np.zeros(n, dtype="float64")
        dist[s] = 0
        sigma[s] = 1.0
        level = 0
        while True:
            mask = dist[src] == level
            if not mask.any():
                break
            md = dst[mask]
            undiscovered = dist[md] < 0
            if undiscovered.any():
                dist[md[undiscovered]] = level + 1
            on_next = dist[md] == level + 1
            if not on_next.any():
                break
            np.add.at(sigma, md[on_next], sigma[src[mask][on_next]])
            level += 1
        delta = np.zeros(n, dtype="float64")
        for lev in range(level, 0, -1):
            mask = (dist[src] == lev - 1) & (dist[dst] == lev)
            if not mask.any():
                continue
            ms, md = src[mask], dst[mask]
            np.add.at(delta, ms, (sigma[ms] / sigma[md]) * (1.0 + delta[md]))
        delta[s] = 0.0
        bc += delta
    return bc


def _local_betweenness_pdf(pdf, sources, normalized: bool):
    import numpy as np
    import pandas as pd

    nodes, src, dst = _factorize_edges(pdf)
    n = len(nodes)
    if sources is None:
        source_ids = range(n)
    else:
        idx = {v: i for i, v in enumerate(nodes)}
        source_ids = [idx[s] for s in sources if s in idx]
    bc = _brandes_partial(nodes, src, dst, source_ids) / 2.0
    if normalized and n > 2:
        bc /= (n - 1) * (n - 2) / 2.0
    return pd.DataFrame({"node": nodes, "bc": bc})


def betweenness_centrality(
    graph: PropertyGraph,
    sources: list | None = None,
    normalized: bool = False,
    local: bool | None = None,
    source_batches: int = 32,
) -> DataFrame:
    """Betweenness centrality (Brandes) over an undirected graph given
    as symmetric edge pairs.  `sources=None` is exact (one sweep per
    vertex — O(V·E), only sane on small graphs); passing a sampled
    source list is the scale form (Brandes-Pich sampling: bc restricted
    to dependencies of the sampled sources; unbiased up to the n/k
    rescale, which is left to the caller so sampled values stay
    reproducible).  Returns DataFrame(node, bc).

    Scale shape: betweenness parallelizes across SOURCES, not within a
    sweep — the distributed path replicates the (aggregated, small)
    edge list to every task and partitions the source list, then sums
    per-task partial dependencies with one groupBy.  This rides the
    same regime every other graph op here exploits: the graph is a
    distinct-pairs rollup orders of magnitude smaller than the facts
    (SCALE.md) — 100 TB of facts, a few-GB graph.  A graph too big to
    replicate needs distributed per-level frontier joins for EVERY
    source (V supersteps per source) — at that point sampled landmark
    closeness (g22) is the honest substitute, not exact betweenness.
    """
    if local is None:
        local = _edge_count(graph) < LOCAL_EDGE_THRESHOLD
    if local:
        return _run_local(
            graph,
            lambda pdf: _local_betweenness_pdf(pdf, sources, normalized),
            "node string, bc double",
        )
    import pandas as pd

    ne = _edge_count(graph)
    if ne > BETWEENNESS_REPLICATE_EDGE_LIMIT:
        raise ValueError(
            f"betweenness_centrality replicates the edge list to every task and "
            f"collects it on the driver once; {ne} edges exceeds the "
            f"{BETWEENNESS_REPLICATE_EDGE_LIMIT}-edge replication limit. Exact "
            "betweenness is infeasible at this scale — use sampled landmark "
            "closeness instead (multi_source_bfs, the g22 shape)."
        )
    spark = graph.edges.sparkSession
    edges_pdf = graph.edges.select("src", "dst").toPandas()
    b_edges = spark.sparkContext.broadcast(edges_pdf)
    if sources is None:
        sources = [r[0] for r in graph.vertices.select("id").collect()]
    # normalization basis = EDGE-ENDPOINT node count, the same basis the
    # local kernel's _factorize_edges sees — graph.vertices.count()
    # would diverge 6x on a 10-vertex/5-endpoint graph purely by which
    # auto-route fired; skipped entirely when not normalizing
    n_total = (
        graph.edges.select(F.col("src").alias("id"))
        .unionByName(graph.edges.select(F.col("dst").alias("id")))
        .distinct()
        .count()
        if normalized
        else 0
    )
    src_df = spark.createDataFrame(
        [(s,) for s in sources], ["source"]
    ).repartition(min(source_batches, max(1, len(sources))))

    def run(batches):
        import pandas as _pd

        batch_sources = []
        for b in batches:
            batch_sources.extend(b["source"].tolist())
        if not batch_sources:
            return
        pdf = b_edges.value
        nodes, srca, dsta = _factorize_edges(pdf)
        idx = {v: i for i, v in enumerate(nodes)}
        ids = [idx[s] for s in batch_sources if s in idx]
        part = _brandes_partial(nodes, srca, dsta, ids)
        yield _pd.DataFrame({"node": nodes, "bc": part})

    partial = src_df.mapInPandas(run, schema="node string, bc double")
    out = partial.groupBy("node").agg((F.sum("bc") / 2.0).alias("bc"))
    if normalized and n_total > 2:
        out = out.select(
            "node", (F.col("bc") / ((n_total - 1) * (n_total - 2) / 2.0)).alias("bc")
        )
    # materialize before dropping the broadcast the plan depends on,
    # then release the (up to 50M-row) pandas edge list from executors
    out = out.localCheckpoint(eager=True)
    b_edges.unpersist()
    return out


def maximal_weight_matching(
    edges: DataFrame,
    rounds: int = 3,
    weight_col: str = "weight",
) -> DataFrame:
    """Greedy maximal weighted matching via synchronous propose-accept
    rounds (the Pregel matching pattern): each round, every unmatched
    src proposes to its best available neighbor (weight DESC, dst ASC
    tie-break) and every dst accepts its best proposal (weight DESC,
    src ASC) — accepted pairs leave the graph.  Deterministic given the
    tie-breaks; a maximal (not maximum) matching, the standard
    distributed relaxation.

    CONTRACT: edges must be BIPARTITE-ORIENTED — no node may appear on
    both the src and dst side (the fixture's c->s graphs satisfy this
    by id-prefix construction).  Acceptance is per-dst only, so a node
    proposing as src while accepting as dst in the same round would
    otherwise enter two matched pairs; a general-graph matching needs
    handshake (mutual-best) acceptance — not implemented here.

    Per round: two window shuffles (argmax per src, argmax per dst) and
    two broadcast anti-joins against the (small, <=|V|/2 per round)
    matched-node set; edges never move otherwise.  localCheckpoint per
    round truncates the iterative lineage.  Returns
    DataFrame(src, dst, <weight_col>, rnd).
    """
    remaining = edges.select("src", "dst", weight_col)
    matched = None
    for i in range(1, rounds + 1):
        ws = Window.partitionBy("src").orderBy(F.desc(weight_col), F.asc("dst"))
        wd = Window.partitionBy("dst").orderBy(F.desc(weight_col), F.asc("src"))
        prop = remaining.withColumn("__rs", F.row_number().over(ws)).filter(
            F.col("__rs") == 1
        )
        acc = (
            prop.withColumn("__rd", F.row_number().over(wd))
            .filter(F.col("__rd") == 1)
            .select("src", "dst", weight_col)
            .withColumn("rnd", F.lit(i))
            .localCheckpoint(eager=True)
        )
        matched = acc if matched is None else matched.unionByName(acc)
        used = F.broadcast(
            acc.select(F.col("src").alias("n"))
            .unionByName(acc.select(F.col("dst").alias("n")))
            .distinct()
        )
        remaining = (
            remaining.join(used, remaining.src == used.n, "left_anti")
            .join(used, remaining.dst == used.n, "left_anti")
            .localCheckpoint(eager=True)
        )
        if not remaining.take(1):
            break
    return matched


def minimum_spanning_forest(
    edges: DataFrame,
    weight_col: str = "weight",
    max_rounds: int = 30,
) -> DataFrame:
    """Borůvka minimum spanning forest over an undirected graph given
    as SYMMETRIC weighted pairs (src, dst, w).  Per round every
    component selects its minimum outgoing edge (ties broken on
    (w, min_end, max_end) so the choice is deterministic even with
    duplicate weights), selected edges join the forest, and components
    merge.  O(log V) rounds — the distributed MST algorithm, vs
    Kruskal's inherently sequential global edge sort.

    Per round: one broadcast join to label endpoints with their
    component, one argmin groupBy per component, and a component
    relabel via connected_components over the (tiny) forest — edges
    stay stationary throughout.  Returns the forest as canonical
    (src < dst) edges: DataFrame(src, dst, <weight_col>).

    Merging is only GUARANTEED to halve the component count per round
    (pathological pairings), so max_rounds defaults to 30 (≥ log2 of
    any feasible node count; completed forests exit early on the
    crossing-edge probe, so unused headroom costs nothing) and the
    function RAISES if crossing edges survive the horizon — silently
    returning a non-spanning forest was the r7-review failure mode.
    """
    e = edges.select("src", "dst", F.col(weight_col).alias("w"))
    spark = e.sparkSession
    nodes = e.select(F.col("src").alias("node")).distinct()
    comp = nodes.select("node", F.col("node").alias("comp")).localCheckpoint(eager=True)
    forest = None
    lo = F.least("src", "dst")
    hi = F.greatest("src", "dst")
    spanned = False
    for _ in range(max_rounds):
        ca = F.broadcast(comp.select(F.col("node").alias("an"), F.col("comp").alias("ac")))
        cb = F.broadcast(comp.select(F.col("node").alias("bn"), F.col("comp").alias("bc")))
        crossing = (
            e.join(ca, e.src == F.col("an"))
            .join(cb, e.dst == F.col("bn"))
            .filter(F.col("ac") != F.col("bc"))
        )
        if not crossing.take(1):
            spanned = True
            break
        pick = (
            crossing.groupBy("ac")
            .agg(F.min(F.struct(F.col("w"), lo.alias("lo"), hi.alias("hi"))).alias("m"))
            .select(
                F.col("m.lo").alias("src"), F.col("m.hi").alias("dst"), F.col("m.w").alias("w")
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        forest = pick if forest is None else forest.unionByName(pick).distinct()
        forest = forest.localCheckpoint(eager=True)
        sym_forest = forest.select("src", "dst").unionByName(
            forest.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        cc = connected_components(
            PropertyGraph(nodes.select(F.col("node").alias("id")), sym_forest)
        )
        comp = (
            nodes.join(
                cc.withColumnRenamed("node", "n"), nodes.node == F.col("n"), "left"
            )
            .select("node", F.coalesce("component", "node").alias("comp"))
            .localCheckpoint(eager=True)
        )
    if not spanned:
        # recompute with the FINAL labels (the in-loop frame is one
        # merge behind): crossing edges here mean a non-spanning forest
        ca = F.broadcast(comp.select(F.col("node").alias("an"), F.col("comp").alias("ac")))
        cb = F.broadcast(comp.select(F.col("node").alias("bn"), F.col("comp").alias("bc")))
        left_over = (
            e.join(ca, e.src == F.col("an"))
            .join(cb, e.dst == F.col("bn"))
            .filter(F.col("ac") != F.col("bc"))
        )
        if left_over.take(1):
            raise RuntimeError(
                f"minimum_spanning_forest: crossing edges remain after "
                f"{max_rounds} rounds — the forest does not span yet; raise "
                "max_rounds (components only provably halve per round)"
            )
    if forest is None:
        return spark.createDataFrame([], "src string, dst string, w double").withColumnRenamed(
            "w", weight_col
        )
    return forest.select("src", "dst", F.col("w").alias(weight_col))


def katz_walk_counts(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """Per-node counts of incoming walks of length 1..`rounds` over a
    directed edge list (src, dst): returns (node, w1..w{rounds}).

    Each round is ONE shuffle join of the stationary edge list against
    the previous round's per-node counts — the PageRank superstep
    shape, but with exact BIGINT walk counts so truncated Katz
    centrality (sum alpha^l * w_l) is cross-engine deterministic.
    """
    p = edges.groupBy(F.col("dst").alias("node")).agg(F.count(F.lit(1)).alias("c"))
    walks = [p]
    for _ in range(rounds - 1):
        p = (
            edges.join(p.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("c"))
        )
        walks.append(p)
    out = walks[0].select("node", F.col("c").alias("w1"))
    for i, w in enumerate(walks[1:], start=2):
        out = out.join(
            w.select("node", F.col("c").alias(f"w{i}")), "node", "left"
        ).withColumn(f"w{i}", F.coalesce(F.col(f"w{i}"), F.lit(0)))
    return out


def hits_counts(edges: DataFrame, rounds: int = 2) -> DataFrame:
    """HITS hubs & authorities (Kleinberg) kept UN-normalized so every
    score is an exact BIGINT alternating-walk count: a <- A^T h,
    h <- A a from h0 = 1.  Returns (side, node, s1, s2) with s1/s2 the
    scores after round 1 / round `rounds` — nodes with out-edges get a
    hub row, nodes with in-edges an auth row.

    Each half-round is one broadcast of the node-sized score table
    into the stationary edge list + one map-side-combined shuffle
    (the g06 superstep shape).  Magnitude grows like (d_in d_out)^r;
    2 rounds stays far inside int64 for any realistic degree profile.
    """
    e = edges.select("src", "dst")
    a_scores, h_scores = [], []
    a = e.groupBy(F.col("dst").alias("node")).agg(F.count(F.lit(1)).alias("s"))
    for _ in range(rounds):
        a_scores.append(a)
        h = (
            e.join(F.broadcast(a.withColumnRenamed("node", "dst")), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("s").alias("s"))
        )
        h_scores.append(h)
        a = (
            e.join(F.broadcast(h.withColumnRenamed("node", "src")), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("s").alias("s"))
        )
    # s1 = first-round score, s2 = final-round score, both exact ints
    # (a_scores[-1]/h_scores[-1] are the round-`rounds` scores; the
    # trailing `a` assignment is an unused lazy plan)
    if rounds == 1:
        auth = a_scores[0].select("node", F.col("s").alias("s1"), F.col("s").alias("s2"))
        hub = h_scores[0].select("node", F.col("s").alias("s1"), F.col("s").alias("s2"))
    else:
        auth = a_scores[-1].withColumnRenamed("s", "s2").join(
            a_scores[0].withColumnRenamed("s", "s1"), "node"
        )
        hub = h_scores[-1].withColumnRenamed("s", "s2").join(
            h_scores[0].withColumnRenamed("s", "s1"), "node"
        )
    return auth.select(F.lit("auth").alias("side"), "node", "s1", "s2").unionByName(
        hub.select(F.lit("hub").alias("side"), "node", "s1", "s2")
    )


def threshold_cascade(
    edges_sym: DataFrame, seeds: DataFrame, rounds: int = 4
) -> DataFrame:
    """Linear-threshold cascade (Granovetter/Kempe), theta = 1/2 as the
    exact integer test 2*|N(v) ∩ active| >= deg(v); `rounds`
    synchronous rounds (a declared horizon, not a fixpoint race).
    `seeds` is a (node) DataFrame.  Returns (node, r) = activation
    round for every node active after the horizon.  Takes no node
    frame: only nodes with symmetric edges can activate (activation
    needs a degree), so a vertex list would be dead input.

    Per round: one shuffle (active-neighbor counts) + broadcast
    anti-join against the active set; active-set size is bounded by
    |V| of the (rolled-up) graph.
    """
    deg = edges_sym.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    act = seeds.select("node", F.lit(0).alias("r")).localCheckpoint(eager=True)
    for i in range(1, rounds + 1):
        na = (
            edges_sym.join(
                F.broadcast(act.select(F.col("node").alias("src"))), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.count(F.lit(1)).alias("na"))
        )
        new = (
            na.join(act, "node", "left_anti")
            .join(F.broadcast(deg), "node")
            .filter(2 * F.col("na") >= F.col("d"))
            .select("node", F.lit(i).alias("r"))
        )
        act = act.unionByName(new).localCheckpoint(eager=True)
    return act


def luby_mis(nodes: DataFrame, edges_sym: DataFrame, rounds: int = 3) -> DataFrame:
    """Luby-style MIS rounds under the FIXED deterministic priority
    p(v) = md5(v): per round an undecided node joins the MIS when its
    priority beats every undecided neighbor's (strict order makes
    adjacent winners impossible), its neighbors drop out.  Returns
    (node, status) with status in {'mis','out','undecided'} after
    `rounds` — survivors are reported, so a fixed horizon is honest.

    Per round: one min-combine shuffle over both-endpoints-undecided
    edges + two broadcast anti-joins.
    """
    und = nodes.select("node", F.md5("node").alias("p")).localCheckpoint(eager=True)
    mis = None
    for _ in range(rounds):
        usrc = und.select(F.col("node").alias("src"), F.col("p").alias("psrc"))
        udst = und.select(F.col("node").alias("dst"), F.col("p").alias("pdst"))
        eu = edges_sym.join(F.broadcast(usrc), "src").join(F.broadcast(udst), "dst")
        nbrmin = eu.groupBy(F.col("src").alias("node")).agg(F.min("pdst").alias("mn"))
        win = (
            und.join(nbrmin, "node", "left")
            .filter(F.col("mn").isNull() | (F.col("p") < F.col("mn")))
            .select("node")
            .localCheckpoint(eager=True)
        )
        out = (
            eu.join(F.broadcast(win.withColumnRenamed("node", "src")), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        mis = win if mis is None else mis.unionByName(win)
        und = (
            und.join(win, "node", "left_anti")
            .join(out, "node", "left_anti")
            .localCheckpoint(eager=True)
        )
    mis = mis.localCheckpoint(eager=True)
    return (
        nodes.join(mis.withColumn("m", F.lit(1)), "node", "left")
        .join(und.select("node").withColumn("u", F.lit(1)), "node", "left")
        .select(
            "node",
            F.when(F.col("m") == 1, "mis")
            .when(F.col("u") == 1, "undecided")
            .otherwise("out")
            .alias("status"),
        )
    )
