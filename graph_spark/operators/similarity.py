"""Embedding similarity search (SURVEY.md §2.F L03 + ANN scale path).

Brute-force cosine top-k is the exact baseline (all math in float64 via
higher-order functions — JVM-side, no Python in the loop).  The scale
path is random-hyperplane LSH: bucket vectors by sign-pattern, probe
only same-bucket candidates (recall-tested against brute force, not
hash-declared).

At 100 TB: norms are precomputed once (column write), probes are the
small side and get broadcast; brute force over the full corpus is the
fallback only when the probe set is tiny.  An IVF-style variant is the
same join with kmeans-assigned buckets instead of hyperplane signs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# kmeans/IVF/PQ keep the k x dim centroid table as driver-side state
# between iterations (it IS the index — the MLlib pattern: only the
# k-row table moves, the vectors never leave the executors).  That is
# sane while k*dim doubles stay a few MB; past this product the
# per-iteration collect()/broadcast becomes a driver-memory and
# broadcast wall, and the honest scale path is a sharded/hierarchical
# codebook (coarse quantizer first), not a bigger collect — so the
# guard raises instead of OOMing, mirroring
# BETWEENNESS_REPLICATE_EDGE_LIMIT in graph/algorithms.py.
CENTROID_STATE_LIMIT = 2_097_152  # k * dim doubles (~16 MB)


def _guard_centroid_state(k: int, dim: int, where: str) -> None:
    if k * dim > CENTROID_STATE_LIMIT:
        raise ValueError(
            f"{where} holds k x dim = {k} x {dim} = {k * dim} centroid doubles "
            f"as driver-side state per iteration; the limit is "
            f"CENTROID_STATE_LIMIT = {CENTROID_STATE_LIMIT}. At this scale use a "
            "hierarchical codebook (coarse IVF cells, then per-cell PQ) or "
            "reduce k — a bigger collect is a driver OOM, not an index."
        )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("__norm", _norm(F.col(vec_col)))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    probes: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each probe against the corpus.
    Probes broadcast to the stationary corpus; per-pair work is a fused
    zip_with/aggregate (whole-stage codegen, float64).  Self-pairs
    (same id) excluded.  Returns (vec_id, nb, sim) with rank ties broken
    by neighbor id."""
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("nb"), F.col(vec_col).alias("__cv"), F.col("__norm").alias("__cn")
    )
    p = with_norm(probes, vec_col).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__pv"), F.col("__norm").alias("__pn")
    )
    pairs = c.join(F.broadcast(p), F.col("nb") != F.col("vec_id"))
    sims = pairs.select(
        "vec_id",
        "nb",
        (_dot(F.col("__pv"), F.col("__cv")) / (F.col("__pn") * F.col("__cn"))).alias("sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("nb").asc())
    return sims.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k).drop("__rn")


def neardup_pairs_cosine(
    df: DataFrame, threshold: float, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """All pairs (a < b) with cosine >= threshold.  Quadratic form for
    declared correctness; the LSH variant below is the scale path."""
    a = with_norm(df, vec_col).select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("__av"), F.col("__norm").alias("__an")
    )
    b = with_norm(df, vec_col).select(
        F.col(id_col).alias("b"), F.col(vec_col).alias("__bv"), F.col("__norm").alias("__bn")
    )
    pairs = a.join(b, F.col("a") < F.col("b"))
    return (
        pairs.select(
            "a", "b", (_dot(F.col("__av"), F.col("__bv")) / (F.col("__an") * F.col("__bn"))).alias("sim")
        )
        .filter(F.col("sim") >= threshold)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (LCG-seeded; no
    numpy RNG so the bucketing is reproducible everywhere)."""
    state = seed
    planes = []
    for _ in range(n_planes):
        vals = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            # map to (-1, 1)
            vals.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
        n = math.sqrt(sum(v * v for v in vals)) or 1.0
        planes.append([v / n for v in vals])
    return planes


def lsh_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 4,
    n_tables: int = 8,
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Multi-table random-hyperplane LSH: `n_tables` independent
    signatures of `n_planes` sign bits each (OR-amplification — one
    table of many planes has vanishing recall on mid-similarity
    neighbors; the union of several short-signature tables recovers it).
    Output: one row per (input row, table) with columns `t`, `bucket`.
    """
    all_planes = _hyperplanes(dim, n_planes * n_tables, seed)
    table_cols = []
    for t in range(n_tables):
        bits = []
        for pl in all_planes[t * n_planes : (t + 1) * n_planes]:
            arr = F.array(*[F.lit(v) for v in pl])
            bits.append(F.when(_dot(F.col(vec_col), arr) >= 0, F.lit("1")).otherwise(F.lit("0")))
        table_cols.append(F.struct(F.lit(t).alias("t"), F.concat(*bits).alias("bucket")))
    return df.withColumn("__tb", F.explode(F.array(*table_cols))).select(
        *df.columns, F.col("__tb.t").alias("t"), F.col("__tb.bucket").alias("bucket")
    )


def ivf_centroids(
    df: DataFrame,
    n_clusters: int,
    dim: int,
    iterations: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Lloyd's kmeans, for IVF index build.

    Init: deterministic — the `n_clusters` vectors with the smallest
    ids (reproducible without RNG), fetched via orderBy+limit
    (TakeOrdered: a parallel per-partition top-k merge, NOT a global
    window sort — the old row_number() over Window.orderBy(id) funneled
    the ENTIRE corpus through one task).  Each iteration: assignment is
    the compiled argmin projection of :func:`_assign_clusters` (zero
    shuffles), then means are recomputed via posexplode + (cluster, dim)
    map-side combine — the same one-shuffle aggregation shape as the
    declared l14 query — and collected (n_clusters x dim doubles, the
    CENTROID_STATE_LIMIT-guarded MLlib pattern kmeans_lloyd already
    uses: only the k-row table ever moves).
    Returns DataFrame(cluster, centroid array<double>).
    """
    _guard_centroid_state(n_clusters, dim, "ivf_centroids")
    seed_rows = (
        df.select(
            F.col(id_col).alias("__id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("c"),
        )
        .orderBy("__id")
        .limit(n_clusters)
        .collect()
    )
    # cluster i = vector with the i-th smallest id (== the old
    # row_number(Window.orderBy(id)) - 1 numbering)
    cents = [(i, list(r["c"])) for i, r in enumerate(seed_rows)]
    spark = df.sparkSession
    for _ in range(iterations):
        assigned = _assign_clusters_lit(df, cents, vec_col)
        ex = assigned.select("cluster", F.posexplode(vec_col).alias("i", "x")).withColumn(
            "x", F.col("x").cast("double")
        )
        means = (
            ex.groupBy("cluster", "i")
            .agg(F.avg("x").alias("mx"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("i", "mx"))).alias("pairs"))
            .select(
                "cluster",
                F.transform(F.col("pairs"), lambda s: s.getField("mx")).alias("centroid"),
            )
        )
        cents = [(int(r["cluster"]), list(r["centroid"])) for r in means.collect()]
    return spark.createDataFrame(cents, "cluster INT, centroid ARRAY<DOUBLE>")


# Literal budget for the compiled argmin assignment: k x dim F.lit()
# doubles per projection.  Past a few thousand terms the py4j
# per-operator construction cost and janino's 64KB method limit make
# the compiled form pathological (r9 measured 15.4 s of plan BUILD plus
# a codegen failure at ~1,536 literal terms in the flat-expansion
# experiment), while CENTROID_STATE_LIMIT alone would admit ~2M terms.
# Above this budget assignment falls back to the broadcast crossJoin
# form (identical pick semantics, pinned by
# test_ivf_assignment_join_fallback_parity).
LIT_ASSIGN_TERM_LIMIT = 10_000


def _assign_clusters_join(df: DataFrame, cents: list, vec_col: str) -> DataFrame:
    """Broadcast crossJoin nearest-centroid assignment — the fallback
    when the centroid table is too large to compile into literals.
    Pick order identical to :func:`_assign_clusters_lit`: minimal
    (coalesce(-sim, +inf), cluster), i.e. highest sim wins, ties and
    the all-null case fall to the lowest cluster id.  Each row keeps
    its identity via a synthetic row id (the id's VALUE never affects
    the picked cluster, so layout-dependence of
    monotonically_increasing_id cannot leak into results)."""
    from pyspark.sql import Window

    spark = df.sparkSession
    cdf = F.broadcast(
        spark.createDataFrame(sorted(cents), "cluster INT, centroid ARRAY<DOUBLE>")
    )
    v = with_norm(df, vec_col).withColumn("__rid", F.monotonically_increasing_id())
    cn = F.sqrt(F.aggregate(F.col("centroid"), F.lit(0.0), lambda a, x: a + x * x))
    sim = _dot(F.col(vec_col), F.col("centroid")) / (F.col("__norm") * cn)
    w = Window.partitionBy("__rid").orderBy("__p", "cluster")
    return (
        v.crossJoin(cdf)
        .withColumn("__p", F.coalesce(-sim, F.lit(float("inf"))))
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .drop("__p", "__r", "__rid", "__norm", "centroid")
    )


def _assign_clusters_lit(df: DataFrame, cents: list, vec_col: str) -> DataFrame:
    """Nearest-centroid assignment by cosine with the centroid table
    compiled into ONE argmin projection: array_min over k
    (priority, cluster) structs, priority = -sim (NULL mapped to +inf —
    defensive for non-ANSI sessions where divide-by-zero yields NULL;
    under the default ANSI divide a zero-norm vector raises, exactly as
    the old form did).  Pick order is EXACTLY the old crossJoin +
    row_number(desc(__sim) nulls-last, asc(cluster)) form — highest sim wins, ties and the
    all-null case fall to the lowest cluster id — but with zero
    shuffles and zero row expansion, where the old shape materialized
    k copies of every vector and ranked them through a full window
    exchange+sort (the dominant cost of the 4M-vector IVF bench)."""
    if not cents:
        # empty centroid table (empty corpus): the old crossJoin form
        # produced zero rows — keep that, with the cluster column typed
        return df.filter(F.lit(False)).withColumn("cluster", F.lit(0))
    if len(cents) * len(cents[0][1]) > LIT_ASSIGN_TERM_LIMIT:
        return _assign_clusters_join(df, cents, vec_col)
    inf = float("inf")
    cands = []
    for cl, cvec in sorted(cents):
        cn = math.sqrt(sum(x * x for x in cvec)) or 0.0
        arr = F.array(*[F.lit(float(x)) for x in cvec])
        sim = _dot(F.col(vec_col), arr) / (F.col("__norm") * F.lit(cn))
        cands.append(
            F.struct(F.coalesce(-sim, F.lit(inf)).alias("p"), F.lit(int(cl)).alias("cluster"))
        )
    return (
        with_norm(df, vec_col)
        .withColumn("cluster", F.array_min(F.array(*cands)).getField("cluster"))
        .drop("__norm")
    )


def _assign_clusters(df: DataFrame, centroids: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """Nearest-centroid assignment by cosine; the (small, guarded)
    centroid table is collected and compiled into the argmin projection
    of :func:`_assign_clusters_lit`."""
    cents = [(int(r["cluster"]), list(r["centroid"])) for r in centroids.collect()]
    return _assign_clusters_lit(df, cents, vec_col)


def cosine_topk_ivf(
    corpus: DataFrame,
    probes: DataFrame,
    k: int,
    dim: int,
    n_clusters: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF ANN: corpus vectors assigned to kmeans cells once (index
    build); each probe scores only the `nprobe` nearest cells' members.

    Same scale shape as LSH: candidate generation is an equi-join on
    the cell id; the centroid table (n_clusters rows) is the only thing
    broadcast.  Recall grows with nprobe (nprobe == n_clusters ==
    brute force)."""
    from pyspark.sql import Window

    # ivf_centroids returns a k-row LocalRelation (centroids are
    # driver-side state between iterations — the guarded MLlib
    # pattern), so referencing it from two subtrees re-embeds nothing
    cents = ivf_centroids(
        corpus, n_clusters, dim, vec_col=vec_col, id_col=id_col
    )
    corpus_cells = _assign_clusters(corpus, cents, vec_col, id_col).select(
        F.col(id_col).alias("nb"), F.col("cluster").alias("cell")
    )
    # top-nprobe cells per probe
    c = F.broadcast(cents)
    pv = with_norm(probes, vec_col)
    cn = F.sqrt(F.aggregate(F.col("centroid"), F.lit(0.0), lambda a, x: a + x * x))
    sim = _dot(F.col(vec_col), F.col("centroid")) / (F.col("__norm") * cn)
    w = Window.partitionBy(id_col).orderBy(F.desc("__sim"), F.asc("cluster"))
    probe_cells = (
        pv.crossJoin(c)
        .withColumn("__sim", sim)
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= nprobe)
        .select(F.col(id_col).alias("vec_id"), F.col("cluster").alias("cell"))
    )
    # no pair-distinct needed (unlike LSH's multi-table join): each
    # corpus vector lives in exactly ONE cell and probe_cells is
    # distinct on (vec_id, cell), so the cell equi-join emits every
    # (vec_id, nb) pair at most once — the old .distinct() was a full
    # extra shuffle of the candidate set for nothing
    cand = (
        corpus_cells.join(F.broadcast(probe_cells), "cell")
        .filter(F.col("nb") != F.col("vec_id"))
        .select("vec_id", "nb")
    )
    cv = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("nb"), F.col(vec_col).alias("__cv"), F.col("__norm").alias("__cn")
    )
    pvv = with_norm(probes, vec_col).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__pv"), F.col("__norm").alias("__pn")
    )
    sims = (
        cand.join(cv, "nb")
        .join(F.broadcast(pvv), "vec_id")
        .select(
            "vec_id", "nb",
            (_dot(F.col("__pv"), F.col("__cv")) / (F.col("__pn") * F.col("__cn"))).alias("sim"),
        )
    )
    w2 = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("nb").asc())
    return sims.withColumn("__rn", F.row_number().over(w2)).filter(F.col("__rn") <= k).drop("__rn")


def cosine_topk_lsh(
    corpus: DataFrame,
    probes: DataFrame,
    k: int,
    dim: int,
    n_planes: int = 4,
    n_tables: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
) -> DataFrame:
    """ANN top-k: candidates = corpus vectors sharing any table's bucket
    with the probe, scored exactly, top-k per probe.  Candidate
    generation is an equi-join on (t, bucket) + pair distinct — the plan
    that survives a billion-vector corpus (no crossJoin anywhere).
    Recall < 1.0 by construction; recall-tested vs brute force."""
    c = lsh_buckets(corpus, dim, n_planes, n_tables, vec_col, seed).select(
        F.col(id_col).alias("nb"), "t", "bucket"
    )
    p = lsh_buckets(probes, dim, n_planes, n_tables, vec_col, seed).select(
        F.col(id_col).alias("vec_id"), "t", "bucket"
    )
    cand = (
        c.join(F.broadcast(p), on=["t", "bucket"])
        .filter(F.col("nb") != F.col("vec_id"))
        .select("vec_id", "nb")
        .distinct()
    )
    cv = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("nb"), F.col(vec_col).alias("__cv"), F.col("__norm").alias("__cn")
    )
    pv = with_norm(probes, vec_col).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__pv"), F.col("__norm").alias("__pn")
    )
    sims = (
        cand.join(cv, "nb")
        .join(F.broadcast(pv), "vec_id")
        .select(
            "vec_id",
            "nb",
            (_dot(F.col("__pv"), F.col("__cv")) / (F.col("__pn") * F.col("__cn"))).alias("sim"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("nb").asc())
    return sims.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k).drop("__rn")


def kmeans_lloyd(
    emb: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    with_all_dists: bool = False,
) -> DataFrame:
    """Distributed Lloyd's k-means over an embedding column: assignment
    is a broadcast cross-join against the k centroids with a
    fold-expression squared distance (stays in codegen, no UDF);
    centroid update is posexplode -> (cid, dim) avg.  Centroids are
    driver-side state between iterations (k x dim doubles — the MLlib
    pattern; only the k-row table ever moves, the vectors never
    shuffle except the dim-partial agg).

    Deterministic: seeds are the k lowest-id vectors, assignment
    tie-breaks on (dist, cid) via a struct-min.  Runs `iters`
    assignments with `iters - 1` updates in between (the final
    assignment is what's summarized).  Returns
    DataFrame(vec_id, v, cid, dist) for the last assignment; with
    `with_all_dists=True` returns (assignment, all_dists) where
    all_dists is the final iteration's FULL (vec_id, cid, dist)
    point-to-centroid table (k rows per point — what silhouette /
    soft-assignment diagnostics consume without refitting).
    """
    spark = emb.sparkSession
    e = emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("v"),
    )
    # measure dim from ONE row BEFORE the k-row seed collect, so the
    # guard actually prevents the driver OOM it exists to prevent
    probe = e.select(F.size("v").alias("d")).first()
    _guard_centroid_state(k, probe["d"] if probe else 1, "kmeans_lloyd")
    seeds = e.orderBy("vec_id").limit(k).collect()
    centroids = [(i, r["v"]) for i, r in enumerate(seeds)]
    assigned = None
    for it in range(iters):
        cdf = F.broadcast(
            spark.createDataFrame(centroids, "cid INT, c ARRAY<DOUBLE>")
        )
        sqdist = F.aggregate(
            F.zip_with("v", "c", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        d = e.crossJoin(cdf).withColumn("dist", sqdist)
        assigned = (
            d.groupBy("vec_id", "v")
            .agg(F.min(F.struct("dist", "cid")).alias("m"))
            .select("vec_id", "v", F.col("m.cid").alias("cid"), F.col("m.dist").alias("dist"))
        )
        if it < iters - 1:
            new = (
                assigned.select("cid", F.posexplode("v").alias("dim", "x"))
                .groupBy("cid", "dim")
                .agg(F.avg("x").alias("av"))
                .groupBy("cid")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("dim", "av"))),
                        lambda s: s["av"],
                    ).alias("c")
                )
            )
            centroids = [(r["cid"], r["c"]) for r in new.collect()]
    if with_all_dists:
        return assigned, d.select("vec_id", "cid", "dist")
    return assigned


def knn_label_vote(
    df: DataFrame,
    k: int = 5,
    scale: int = 1000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Leave-one-out k-NN label vote per vector: (id, label, pred).

    Distances are EXACT integer squared-L2 over `scale`-quantized
    vectors, so neighbor ranking and vote outcomes are bit-stable
    under any reduction order — the float-cosine nondeterminism that
    plagues distributed brute-force kNN is gone by construction.

    This is the O(n^2) evaluation harness (all-pairs); at corpus scale
    feed the same vote stage from LSH/IVF candidate buckets
    (`cosine_topk_lsh` / `cosine_topk_ivf`) instead of the full join.
    """
    q = df.select(
        F.col(id_col).alias("__id"),
        F.col(label_col).alias("__lbl"),
        F.expr(
            f"transform({vec_col}, x -> CAST(floor(x * {scale} + 0.5) AS BIGINT))"
        ).alias("__qv"),
    )
    a = q.select(
        F.col("__id").alias("va"), F.col("__lbl").alias("la"), F.col("__qv").alias("qa")
    )
    b = q.select(
        F.col("__id").alias("vb"), F.col("__lbl").alias("lb"), F.col("__qv").alias("qb")
    )
    d = a.join(b, F.col("va") != F.col("vb")).select(
        "va",
        "la",
        "vb",
        "lb",
        F.expr(
            "aggregate(zip_with(qa, qb, (x, y) -> (x - y) * (x - y)),"
            " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        ).alias("d2"),
    )
    nn = (
        d.withColumn(
            "rk", F.row_number().over(Window.partitionBy("va").orderBy("d2", "vb"))
        )
        .filter(F.col("rk") <= k)
        .select("va", "la", "lb")
    )
    votes = nn.groupBy("va", "la", "lb").agg(F.count(F.lit(1)).alias("c"))
    return (
        votes.withColumn(
            "r",
            F.row_number().over(Window.partitionBy("va").orderBy(F.desc("c"), "lb")),
        )
        .filter(F.col("r") == 1)
        .select(
            F.col("va").alias(id_col),
            F.col("la").alias(label_col),
            F.col("lb").alias("pred"),
        )
    )


def pq_codebooks(
    emb: DataFrame,
    n_sub: int = 4,
    sub_dim: int = 16,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Train product-quantization codebooks: one independent Lloyd run
    (kmeans_lloyd — deterministic lowest-id seeds, (dist, cid)
    tie-break) per contiguous sub_dim slice.  Returns
    (codes, codebooks): codes = DataFrame(vec_id, subspace, cid),
    codebooks = list of (subspace, cid, centroid list) rows — k*n_sub
    tiny rows, driver-side by design (they ARE the index)."""
    _guard_centroid_state(n_sub * k, sub_dim, "pq_codebooks")
    codes = None
    books = []
    for sp in range(n_sub):
        sub = emb.select(
            F.col(id_col).alias("vec_id"),
            F.slice(vec_col, sp * sub_dim + 1, sub_dim).alias("sub"),
        )
        assigned = kmeans_lloyd(sub, k=k, iters=iters, vec_col="sub").localCheckpoint(
            eager=True
        )
        part = assigned.select("vec_id", F.lit(sp).alias("subspace"), "cid")
        codes = part if codes is None else codes.unionByName(part)
        # recover the final centroids: mean of members per cell
        cents = (
            assigned.select("cid", F.posexplode("v").alias("dim", "x"))
            .groupBy("cid", "dim")
            .agg(F.avg("x").alias("av"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "av"))),
                    lambda s: s["av"],
                ).alias("c")
            )
        )
        books.extend((sp, int(r["cid"]), list(r["c"])) for r in cents.collect())
    return codes, books


def pq_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    n_sub: int = 4,
    sub_dim: int = 16,
    n_cells: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ asymmetric-distance top-k (Jegou et al. ADC): corpus vectors
    are stored ONLY as n_sub byte codes; a probe computes one lookup
    table per subspace (distance from its slice to each of the
    n_cells codebook entries — k*n_sub doubles, broadcast), and a
    candidate's estimated squared L2 distance is the SUM of its codes'
    LUT entries.  The 100 TB shape: codes are ~64x smaller than the
    vectors, the scan never touches raw embeddings, and scoring is an
    equi-join of exploded codes against the broadcast LUT + one
    map-side-combined sum — no distance math per candidate at all.

    Returns (vec_id probe, nb, est_d2) top-k per probe by estimated
    distance (ties broken on nb).  Estimated distance is biased by
    quantization error — recall vs brute force is the measured,
    documented trade (see tests).

    The ranking key is floor(est_d2*1e9 + 0.5) (output values stay
    exact): codebook centroids are float means whose accumulation
    order differs between a distributed and a sequential engine by
    last-bit drift, so near-equal estimates would otherwise reorder
    across engines right at the cut; quantizing the sort key turns
    near-ties into exact ties broken deterministically on nb.  The
    floor form (not round) because Spark round is HALF_UP on the
    decimal repr while DuckDB rounds the binary value - they disagree
    exactly at the boundaries this key exists to neutralize.
    """
    spark = corpus.sparkSession
    codes, books = pq_codebooks(
        corpus, n_sub=n_sub, sub_dim=sub_dim, k=n_cells, iters=iters,
        id_col=id_col, vec_col=vec_col,
    )
    bdf = spark.createDataFrame(
        books, "subspace INT, cid INT, c ARRAY<DOUBLE>"
    )
    pv = probes.select(
        F.col(id_col).alias("probe"), F.col(vec_col).alias("pvec")
    )
    lut = (
        pv.crossJoin(F.broadcast(bdf))
        .select(
            "probe",
            "subspace",
            "cid",
            F.aggregate(
                F.zip_with(
                    F.slice("pvec", F.col("subspace") * sub_dim + 1, sub_dim),
                    "c",
                    lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d"),
        )
    )
    est = (
        codes.join(F.broadcast(lut), ["subspace", "cid"])
        .groupBy("probe", F.col("vec_id").alias("nb"))
        .agg(F.sum("d").alias("est_d2"))
        .filter(F.col("probe") != F.col("nb"))
    )
    w = Window.partitionBy("probe").orderBy(
        F.floor(F.col("est_d2") * 1e9 + 0.5), "nb"
    )
    return (
        est.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
        .select(F.col("probe").alias(id_col), "nb", "est_d2")
    )


def pq_topk_rerank(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    shortlist: int = 50,
    n_sub: int = 8,
    sub_dim: int = 8,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ ADC with exact re-ranking (the production IVF-PQ read path):
    the code-only ADC pass shortlists `shortlist` candidates per probe
    (never touching raw vectors), then ONLY the shortlist rows join
    back to their raw embeddings for exact L2 — per probe that is
    `shortlist` exact distances instead of |corpus|.  Recall is set by
    the shortlist depth (quantization error just has to keep a true
    neighbor inside the shortlist, not rank it exactly); cost stays
    sub-linear in corpus size.  Returns (vec_id probe, nb, d2) exact
    top-k per probe."""
    short = pq_topk(
        corpus, probes, k=shortlist, n_sub=n_sub, sub_dim=sub_dim,
        n_cells=n_cells, id_col=id_col, vec_col=vec_col,
    ).select(F.col(id_col).alias("probe"), "nb")
    cv = corpus.select(F.col(id_col).alias("nb"), F.col(vec_col).alias("bv"))
    pv = probes.select(F.col(id_col).alias("probe"), F.col(vec_col).alias("pv"))
    exact = (
        short.join(cv, "nb")
        .join(F.broadcast(pv), "probe")
        .select(
            "probe",
            "nb",
            F.aggregate(
                F.zip_with(
                    "pv", "bv",
                    lambda x, y: (x.cast("double") - y.cast("double"))
                    * (x.cast("double") - y.cast("double")),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d2"),
        )
    )
    w = Window.partitionBy("probe").orderBy("d2", "nb")
    return (
        exact.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
        .select(F.col("probe").alias(id_col), "nb", "d2")
    )


def jl_sign_matrix(dim: int, out_dim: int, seed: int = 7) -> list[list[int]]:
    """Deterministic ±1 Johnson-Lindenstrauss sign matrix, seeded by
    md5 of ``"jl|{seed}|{d}|{j}"`` (first hex digit parity) so ANY SQL
    engine with md5 can reproduce every entry bit-for-bit — the same
    cross-engine contract as the minhash/LSH md5 carriers.  Returned
    as ``signs[j][d]``."""
    import hashlib

    out: list[list[int]] = []
    for j in range(out_dim):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"jl|{seed}|{d}|{j}".encode()).hexdigest()
            row.append(1 if int(h[0], 16) % 2 == 0 else -1)
        out.append(row)
    return out


def random_projection(
    df: DataFrame,
    dim: int,
    out_dim: int = 16,
    vec_col: str = "embedding",
    out_col: str = "proj",
    seed: int = 7,
    quantize: int | None = None,
) -> DataFrame:
    """Signed random projection (Johnson-Lindenstrauss): appends
    ``out_col`` = array of ``out_dim`` components y_j = sum_d s_dj x_d
    with ±1 signs from :func:`jl_sign_matrix`.  For ±1 entries
    E[||ya - yb||^2] = out_dim * ||xa - xb||^2, so pairwise distances
    survive the dim -> out_dim reduction up to the JL concentration
    bound — the cheap front-end that cuts ANN scoring cost ~dim/out_dim
    while keeping neighbor order approximately intact.

    With ``quantize=q`` the input is first quantized to integer
    milli-units (floor(x*q + 0.5) as BIGINT) and every projection
    carrier stays an EXACT integer — the cross-engine-hash-safe mode
    the declared pair uses.

    Scale shape: one per-row higher-order-function pass (out_dim
    zip_with/aggregate folds inside whole-stage codegen), zero
    shuffles, no UDF; the sign matrix is dim x out_dim literals
    compiled into the plan."""
    if quantize:
        base = F.expr(
            f"transform({vec_col}, x -> CAST(floor(x * {quantize} + 0.5) AS BIGINT))"
        )
        init = F.lit(0).cast("long")
    else:
        base = F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))")
        init = F.lit(0.0)
    signs = jl_sign_matrix(dim, out_dim, seed)
    comps = []
    for j in range(out_dim):
        arr = F.array(*[F.lit(s) for s in signs[j]])
        zipped = F.zip_with(base, arr, lambda x, s: x * s)
        comps.append(F.aggregate(zipped, init, lambda acc, v: acc + v))
    return df.withColumn(out_col, F.array(*comps))
