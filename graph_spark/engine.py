"""User-facing facade: the API surface a reference-system user switches to.

    from graph_spark import Engine
    eng = Engine(spark, "/root/testdata/sf0.1")
    eng.table("lineitem").filter(...)          # DataFrame passthrough
    eng.sql("SELECT ...")                      # same Catalyst pipeline
    g = eng.graph()                            # PropertyGraph over sales graph
    eng.pagerank(iterations=10)                # analytics
    eng.temporal_value_at("1998-01-01")        # temporal property point-read
    eng.asof_join(l, r, ...)                   # operator library
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import DEFAULT_SF_DIR, TABLES, Catalog
from .graph import algorithms
from .graph.property_graph import PropertyGraph
from .operators import relational
from .temporal import tprop


class Engine:
    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.catalog = Catalog(spark, sf_dir)
        self._views_registered = False

    # -- relational ------------------------------------------------------
    def table(self, name: str) -> DataFrame:
        return self.catalog.table(name)

    def sql(self, query: str) -> DataFrame:
        if not self._views_registered:
            for t in TABLES:
                self.catalog.table(t).createOrReplaceTempView(t)
            self.catalog.graph_edges().createOrReplaceTempView("graph_edges")
            self.catalog.graph_nodes().createOrReplaceTempView("graph_nodes")
            self.catalog.graph_edges_sym().createOrReplaceTempView("graph_edges_sym")
            self._views_registered = True
        return self.spark.sql(query)

    asof_join = staticmethod(relational.asof_join)
    topk_per_group = staticmethod(relational.topk_per_group)
    sessionize = staticmethod(relational.sessionize)
    interval_overlap_join = staticmethod(relational.interval_overlap_join)

    def register_udfs(self) -> None:
        from .functions.udf_surface import register_all

        register_all(self.spark)

    # -- graph -----------------------------------------------------------
    def graph(self, symmetric: bool = True) -> PropertyGraph:
        from pyspark.sql import functions as F

        edges = self.catalog.graph_edges_sym() if symmetric else self.catalog.graph_edges()
        verts = self.catalog.graph_nodes().select(F.col("node").alias("id"))
        return PropertyGraph(verts, edges)

    def traverse(self, source: str):
        """Fluent traversal description (TraversalDescription analog):
        .max_hops(n).at_time(t).min_items(k).time_respecting().run()"""
        from .graph.traversal import TraversalDescription

        return TraversalDescription(self.catalog, source)

    def pagerank(self, iterations: int = 10, damping: float = 0.85) -> DataFrame:
        return algorithms.pagerank(self.graph(), iterations, damping)

    def pagerank_weighted(
        self, iterations: int = 10, damping: float = 0.85, weight_col: str = "n_items"
    ) -> DataFrame:
        """Edge-weighted PageRank over the symmetrized sales graph."""
        from pyspark.sql import functions as F

        e = self.catalog.graph_edges().select(
            "src", "dst", F.col(weight_col).cast("double").alias("weight")
        )
        wsym = e.unionAll(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("weight"))
        )
        v = self.catalog.graph_nodes().select(F.col("node").alias("id"))
        return algorithms.pagerank_weighted(
            PropertyGraph(v, wsym), iterations, damping
        )

    def bfs(self, source: str, max_hops: int) -> DataFrame:
        return algorithms.bfs_distances(self.graph(), source, max_hops)

    def connected_components(self) -> DataFrame:
        return algorithms.connected_components(self.graph())

    def k_core(self, k: int) -> DataFrame:
        return algorithms.k_core(self.graph(), k)

    def core_decomposition(self) -> DataFrame:
        """Coreness per node (every k-core level in one call)."""
        return algorithms.core_decomposition(self.graph())

    def shortest_paths_delta_stepping(
        self, source: str, weight_col: str = "n_items", delta: float = 4.0
    ) -> DataFrame:
        """Bucketed SSSP for large-diameter weighted graphs (weights
        from the directed edge view, symmetrized with the weight kept)."""
        from pyspark.sql import functions as F

        e = self.catalog.graph_edges().select("src", "dst", weight_col)
        wsym = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), F.col(weight_col))
        )
        verts = self.catalog.graph_nodes().select(F.col("node").alias("id"))
        return algorithms.shortest_paths_delta_stepping(
            PropertyGraph(verts, wsym), source, weight_col, delta
        )

    def strongly_connected_components(self) -> DataFrame:
        return algorithms.strongly_connected_components(self.graph(symmetric=False))

    def earliest_arrival(self, source: str, max_hops: int = 3) -> DataFrame:
        from pyspark.sql import functions as F

        from .queries.gsuite import QUERIES as _GQ

        g12 = next(q for q in _GQ if q.name == "g12_earliest_arrival")
        return g12.build(self.spark, self.catalog.sf_dir)

    def label_propagation(self, max_iter: int = 10) -> DataFrame:
        return algorithms.label_propagation(self.graph(), max_iter)

    def motif(self, patterns: list[str], **kw) -> DataFrame:
        from .graph.motif import find

        return find(self.graph(), patterns, **kw)

    def cypher(self, query: str) -> DataFrame:
        """Cypher-subset declarative pattern queries (MATCH .. WHERE ..
        RETURN .. ORDER BY .. LIMIT) over the sales property graph.
        Labels: :Customer / :Supplier / :Nation (id-prefix predicates);
        relationship types: :BUYS (directed customer->supplier rollup,
        properties n_items / weight / first_ts / last_ts — also the
        default for untyped edges), :TRADE (directed nation trade graph,
        >=150 shipments), :TRADE_SYM (its symmetric closure, self-loops
        dropped).  See graph_spark.graph.cypher for the exact grammar."""
        from .graph.cypher import cypher as _cypher
        from .queries.gsuite import cypher_graph

        return _cypher(cypher_graph(self.catalog), query)

    def shortest_paths(self, source: str, weight_col: str = "n_items") -> DataFrame:
        from .graph import algorithms

        return algorithms.shortest_paths_weighted(
            self.graph(symmetric=False), source, weight_col
        )

    def personalized_pagerank(
        self, sources: list, iterations: int = 10, damping: float = 0.85
    ) -> DataFrame:
        return algorithms.personalized_pagerank(self.graph(), sources, iterations, damping)

    def landmark_distances(self, landmarks: list, max_hops: int = 6) -> DataFrame:
        """Hop distances from every landmark in one frontier loop
        (DataFrame(lm, node, d)) — basis for closeness/eccentricity."""
        return algorithms.multi_source_bfs(self.graph(), landmarks, max_hops)

    def betweenness(self, sources: list | None = None, normalized: bool = False) -> DataFrame:
        """Brandes betweenness centrality; `sources` samples the sweeps
        (Brandes-Pich) — None is exact and only sane on small graphs."""
        return algorithms.betweenness_centrality(
            self.graph(), sources=sources, normalized=normalized
        )

    def maximal_matching(self, rounds: int = 3) -> DataFrame:
        """Greedy maximal weighted matching (propose-accept rounds) on
        the sales graph."""
        return algorithms.maximal_weight_matching(
            self.catalog.graph_edges().select("src", "dst", "weight"), rounds=rounds
        )

    def walks(self) -> DataFrame:
        """Deterministic 4-step hash-driven walks from every node (the
        DeepWalk corpus generator, g41)."""
        from .queries.gsuite import QUERIES

        q = next(q for q in QUERIES if q.name == "g41_deterministic_walks")
        return q.build(self.spark, self.catalog.sf_dir)

    def copurchase_graph(self) -> DataFrame:
        """Market-basket part-part co-occurrence projection (g38)."""
        from .queries.gsuite import QUERIES

        q = next(q for q in QUERIES if q.name == "g38_copurchase_projection")
        return q.build(self.spark, self.catalog.sf_dir)

    def spanning_forest(self, max_rounds: int = 8) -> DataFrame:
        """Borůvka minimum spanning forest of the (symmetrized) sales
        graph weighted by trade volume."""
        from pyspark.sql import functions as F

        ge = self.catalog.graph_edges().select("src", "dst", "weight")
        sym = ge.unionAll(
            ge.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        )
        return algorithms.minimum_spanning_forest(sym, max_rounds=max_rounds)

    def node_similarity(self, min_common: int = 2, min_items: int = 2) -> DataFrame:
        """Jaccard similarity between suppliers by shared customers."""
        from pyspark.sql import functions as F

        e = self.catalog.graph_edges().filter(F.col("n_items") >= min_items)
        return algorithms.node_similarity_jaccard(e, min_common=min_common)

    def clustering_coefficient(self, min_items: int = 3) -> DataFrame:
        """Local clustering coefficient on the co-supplier graph (g30)."""
        from .queries.gsuite import QUERIES

        q = next(q for q in QUERIES if q.name == "g30_clustering_coeff")
        return q.build(self.spark, self.catalog.sf_dir)

    def assortativity(self) -> DataFrame:
        """Degree assortativity (Newman's r) over the sym graph (g31)."""
        from .queries.gsuite import QUERIES

        q = next(q for q in QUERIES if q.name == "g31_assortativity")
        return q.build(self.spark, self.catalog.sf_dir)

    def articulation_points(self) -> DataFrame:
        """Exact cut vertices of the symmetric trade graph (g98)."""
        from .queries.gsuite import QUERIES

        q = next(q for q in QUERIES if q.name == "g98_articulation_points")
        return q.build(self.spark, self.catalog.sf_dir)

    def hits(self) -> DataFrame:
        """HITS hubs & authorities, exact integer walk counts (g100)."""
        from .queries.gsuite import QUERIES

        q = next(q for q in QUERIES if q.name == "g100_hits")
        return q.build(self.spark, self.catalog.sf_dir)

    def threshold_cascade(self) -> DataFrame:
        """Linear-threshold influence cascade, 4 rounds (g101)."""
        from .queries.gsuite import QUERIES

        q = next(q for q in QUERIES if q.name == "g101_threshold_cascade")
        return q.build(self.spark, self.catalog.sf_dir)

    def luby_mis(self) -> DataFrame:
        """Maximal-independent-set rounds, fixed md5 priority (g102)."""
        from .queries.gsuite import QUERIES

        q = next(q for q in QUERIES if q.name == "g102_luby_mis")
        return q.build(self.spark, self.catalog.sf_dir)

    def textrank(self) -> DataFrame:
        """TextRank keywords over the word co-occurrence graph (l81)."""
        from .queries.lsuite import QUERIES

        q = next(q for q in QUERIES if q.name == "l81_textrank")
        return q.build(self.spark, self.catalog.sf_dir)

    def bpe_merges(self) -> DataFrame:
        """First 5 BPE tokenizer merges on the corpus vocab (l83)."""
        from .queries.lsuite import QUERIES

        q = next(q for q in QUERIES if q.name == "l83_bpe_merges")
        return q.build(self.spark, self.catalog.sf_dir)

    def rich_club(self) -> DataFrame:
        """Rich-club coefficient phi(k) at every distinct degree (g99)."""
        from .queries.gsuite import QUERIES

        q = next(q for q in QUERIES if q.name == "g99_rich_club")
        return q.build(self.spark, self.catalog.sf_dir)

    def dsir_scores(self, target_pred, n_buckets: int = 64) -> DataFrame:
        """DSIR importance weights of the raw documents slice against
        the `target_pred` slice (l76 semantics; operators/text.py)."""
        from .operators.text import dsir_scores

        return dsir_scores(
            self.table("documents"), target_pred, n_buckets=n_buckets
        )

    def snapshot_series(self) -> DataFrame:
        """Edges born per quarter + running graph size (g32)."""
        from .queries.gsuite import QUERIES

        q = next(q for q in QUERIES if q.name == "g32_snapshot_series")
        return q.build(self.spark, self.catalog.sf_dir)

    # -- temporal --------------------------------------------------------
    def temporal_value_at(self, at_ts, cumulative: bool = True) -> DataFrame:
        return tprop.value_at(
            self.catalog.tprop_spend(), at_ts, value_col="delta", cumulative=cumulative
        )

    def range_join(
        self, points: DataFrame, intervals: DataFrame,
        point_ts: str, start_col: str, end_col: str, bucket_seconds: int = 7200,
    ) -> DataFrame:
        """Unkeyed point-in-interval join via time-bucket equi-join."""
        from .operators.relational import bucketed_range_join

        return bucketed_range_join(
            points, intervals, point_ts, start_col, end_col, bucket_seconds
        )

    def temporal_time_weighted_avg(self, start_ts, end_ts) -> DataFrame:
        """Duration-weighted mean of the per-customer order-value series
        over [start, end) — the aggregate-over-interval read."""
        from pyspark.sql import functions as F

        o = self.catalog.table("orders")
        cp = o.groupBy(
            F.col("o_custkey").alias("entity_id"), F.col("o_orderdate").alias("ts")
        ).agg(F.max("o_totalprice").alias("value"))
        return tprop.time_weighted_avg(cp, start_ts, end_ts)

    def temporal_store(self, value_type: str = "double"):
        """Empty TemporalPropertyStore — the get/setTemporalProperty
        surface: append point/interval writes, read at t / over ranges."""
        from .temporal.store import TemporalPropertyStore

        return TemporalPropertyStore.empty(self.spark, value_type)

    def temporal_compact(
        self, tp: DataFrame, entity_col: str = "entity_id",
        ts_col: str = "ts", value_col: str = "value",
    ) -> DataFrame:
        """Drop redundant change-points (value == predecessor)."""
        return tprop.compact_changepoints(tp, entity_col, ts_col, value_col)

    def temporal_range_rollup(self, bucket: str = "month"):
        """Materialize the temporal aggregate index over customer spend."""
        from pyspark.sql import functions as F

        from .temporal.aggregate_index import build_rollup

        grain = self.catalog.tprop_spend().select(
            "entity_id", "ts", F.col("delta").alias("value")
        )
        return build_rollup(grain, ["entity_id"], "ts", "value", bucket)

    def temporal_rollup_merge(
        self, rollup: DataFrame, appended_grain: DataFrame, bucket: str = "month"
    ) -> DataFrame:
        """Fold appended grain rows (entity_id, ts, value) into an
        existing aggregate-index rollup — incremental maintenance
        (merge ≡ rebuild; only touched buckets shuffle)."""
        from .temporal.aggregate_index import merge_rollup

        return merge_rollup(
            rollup, appended_grain, ["entity_id"], "ts", "value", bucket
        )

    def temporal_align(self, tp: DataFrame, props: list, **kw) -> DataFrame:
        """Widen several piecewise-constant properties onto the union of
        their change-points with per-column forward fill (the temporal
        join)."""
        return tprop.align(tp, props, **kw)

    # -- LLM-data pipeline ----------------------------------------------
    def kmeans(self, emb: DataFrame, k: int = 8, iters: int = 3, **kw) -> DataFrame:
        """Distributed Lloyd's k-means over an embedding column; returns
        the final assignment (vec_id, v, cid, dist)."""
        from .operators.similarity import kmeans_lloyd

        return kmeans_lloyd(emb, k=k, iters=iters, **kw)

    def write_zordered(self, df: DataFrame, path: str, col_a: str, col_b: str, n_files: int, **kw) -> None:
        """Z-order-clustered parquet write (two-key min-max pruning)."""
        from .sources.writers import write_zordered

        write_zordered(df, path, col_a, col_b, n_files, **kw)

    def dedup_exact(self, df: DataFrame, text_col: str = "text") -> DataFrame:
        from .operators.dedup import exact_dedup_groups

        return exact_dedup_groups(df, text_col)

    def dedup_candidates(self, df: DataFrame, **kw) -> DataFrame:
        from .operators.dedup import minhash_lsh_candidates

        return minhash_lsh_candidates(df, **kw)

    # Above this corpus size, ann=None auto-routes to LSH: brute force
    # scores |corpus| x |probes| pairs — exact and fine for evaluation
    # corpora, a non-starter at datalake scale.  Mirrors the graph ops'
    # LOCAL_EDGE_THRESHOLD routing (count memoized the same way).
    SIMILARITY_BRUTE_THRESHOLD = 100_000

    def similar_topk(
        self,
        corpus: DataFrame,
        probes: DataFrame,
        k: int,
        ann: str | None = None,
        vec_col: str = "embedding",
        **kw,
    ) -> DataFrame:
        """Top-k cosine neighbors per probe.  ann: 'brute' | 'lsh' |
        'ivf' | None (auto: brute force below SIMILARITY_BRUTE_THRESHOLD
        corpus rows, LSH candidate-join above — no all-pairs plan ever
        reaches a large corpus)."""
        from .operators import similarity

        if ann is None:
            n = corpus.count()
            ann = "brute" if n < self.SIMILARITY_BRUTE_THRESHOLD else "lsh"
        if ann in ("lsh", "ivf") and "dim" not in kw:
            first = corpus.select(vec_col).head(1)
            kw["dim"] = len(first[0][0]) if first else 0
        if ann == "lsh":
            return similarity.cosine_topk_lsh(corpus, probes, k, vec_col=vec_col, **kw)
        if ann == "ivf":
            return similarity.cosine_topk_ivf(corpus, probes, k, vec_col=vec_col, **kw)
        return similarity.cosine_topk_bruteforce(corpus, probes, k, vec_col=vec_col)

    def text_quality(self, df: DataFrame, text_col: str = "text") -> DataFrame:
        from .operators.text import quality_features

        return quality_features(df, text_col)

    def fuzzy_match(self, df: DataFrame, col: str, max_distance: int = 2) -> DataFrame:
        """Edit-distance near-match pairs over the column's DISTINCT
        values via length-band blocking (recall exactly 1.0)."""
        from .operators.dedup import fuzzy_match_pairs

        return fuzzy_match_pairs(df, col, max_distance)

    def dedup_simhash(self, df: DataFrame, max_distance: int = 2, **kw) -> DataFrame:
        """SimHash near-dup pairs via LSH banding + exact hamming."""
        from .operators.dedup import simhash_hamming_pairs

        return simhash_hamming_pairs(df, max_distance=max_distance, **kw)

    def window_chunks(self, media: DataFrame, window_bytes: int = 64, hop: int = 32) -> DataFrame:
        """Overlapping byte-window chunking (audio STFT-hop shape)."""
        from .operators.multimodal import window_chunks

        return window_chunks(media, window_bytes=window_bytes, hop=hop)

    def pack_sequences(self, df: DataFrame, budget: int = 512, **kw) -> DataFrame:
        """Token-budget sequence packing (context-window fill)."""
        from .operators.text import pack_sequences

        return pack_sequences(df, budget=budget, **kw)

    def surprisal(self, df: DataFrame, **kw) -> DataFrame:
        """Per-doc mean corpus-unigram surprisal (perplexity proxy)."""
        from .operators.text import unigram_surprisal

        return unigram_surprisal(df, **kw)

    # -- multimodal ------------------------------------------------------
    def to_media(self, df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
        from .operators.multimodal import to_media_table

        return to_media_table(df, text_col, id_col)

    def media_features(self, media: DataFrame) -> DataFrame:
        from .operators.multimodal import extract_features

        return extract_features(media)

    def frame_sample(self, media: DataFrame, frame_bytes: int = 64, every: int = 2) -> DataFrame:
        from .operators.multimodal import sample_frames

        return sample_frames(media, frame_bytes, every)

    # -- approximate aggregates (exposed, not hash-declared: §2.B) -------
    @staticmethod
    def approx_count_distinct(df: DataFrame, col: str, rsd: float = 0.05) -> DataFrame:
        from pyspark.sql import functions as F

        return df.agg(F.approx_count_distinct(col, rsd).alias(f"approx_distinct_{col}"))

    @staticmethod
    def approx_quantiles(df: DataFrame, col: str, probs: list[float], rel_err: float = 0.01):
        return df.approxQuantile(col, probs, rel_err)

    @staticmethod
    def sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
        return df.sample(fraction=fraction, seed=seed)

    # -- scale tooling & curation ops (this session's additions) --------
    @staticmethod
    def skew_audit(df: DataFrame, key: str, name: str | None = None) -> DataFrame:
        """Pre-shuffle skew audit for a join/groupBy key (q87 shape)."""
        from .operators.relational import skew_audit

        return skew_audit(df, key, name)

    @staticmethod
    def sweep_concurrency(intervals: DataFrame, start_col: str = "st", end_col: str = "en") -> DataFrame:
        """Sweep-line concurrency over integer-time intervals (t45 shape)."""
        from .operators.relational import sweep_concurrency

        return sweep_concurrency(intervals, start_col, end_col)

    @staticmethod
    def bm25(df: DataFrame, k1: float = 1.2, b: float = 0.75, **kw) -> DataFrame:
        """BM25 term-salience scores per (doc, term) (l41 shape)."""
        from .operators.text import bm25_scores

        return bm25_scores(df, k1=k1, b=b, **kw)

    @staticmethod
    def knn_classify(emb: DataFrame, k: int = 5, **kw) -> DataFrame:
        """Leave-one-out k-NN label vote over quantized embeddings (l42)."""
        from .operators.similarity import knn_label_vote

        return knn_label_vote(emb, k=k, **kw)

    def katz(self, rounds: int = 3) -> DataFrame:
        """Truncated Katz walk counts on the symmetric sales graph (g48)."""
        from .graph.algorithms import katz_walk_counts

        return katz_walk_counts(self.catalog.graph_edges_sym(), rounds=rounds)

    def katz_centrality(self, iterations: int = 6, alpha: float = 0.005) -> DataFrame:
        """Iterated truncated Katz x <- 1 + alpha*A^T x on the symmetric
        sales graph (g73); auto-routed local/distributed."""
        from .graph.algorithms import katz_centrality

        return katz_centrality(self.graph(), iterations=iterations, alpha=alpha)

    def louvain(self, rounds: int = 3) -> DataFrame:
        """Synchronous Louvain local-moving rounds with exact-integer
        modularity gains (g76); returns (node, comm)."""
        from .graph.algorithms import louvain_local_rounds

        return louvain_local_rounds(self.graph(), rounds=rounds)

    def harmonic_centrality(self, landmarks: list, max_hops: int = 5) -> DataFrame:
        """Landmark harmonic centrality (g71): sum of 1/d over landmark
        distances via ONE multi-source BFS; reciprocals are EXACT for
        every distance by accumulating `scale div d` integers with
        scale = lcm(1..max_hops) (60 at the default max_hops=5, so the
        declared g71 values are unchanged), returns (node, n_lm,
        harmonic)."""
        import math

        from .graph.algorithms import multi_source_bfs

        # lcm(1..max_hops) makes scale div d exact for EVERY reachable
        # d; a fixed 60 under-counted d >= 7 (floor(60/7)/60 != 1/7)
        scale = math.lcm(*range(1, max_hops + 1))
        dist = multi_source_bfs(self.graph(), landmarks, max_hops=max_hops)
        return (
            dist.filter(F.col("d") >= 1)
            .groupBy("node")
            .agg(
                F.count(F.lit(1)).alias("n_lm"),
                F.sum(F.expr(f"{scale} div d")).alias("hxs"),
            )
            .select(
                "node",
                "n_lm",
                F.round(F.col("hxs").cast("double") / float(scale), 6).alias("harmonic"),
            )
        )

    def semdedup(self, emb: DataFrame, k: int = 8, iters: int = 2, tau: float = 0.3) -> DataFrame:
        """SemDeDup (l66): kmeans cells then within-cell cosine pairs;
        returns per-cell (cluster_id, n, n_dup_pairs, n_removed,
        keep_ratio)."""
        from .operators.similarity import kmeans_lloyd

        assigned = kmeans_lloyd(emb, k=k, iters=iters)
        dot = lambda u, w: F.aggregate(  # noqa: E731
            F.zip_with(u, w, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )
        nrmed = assigned.select("cid", "vec_id", "v", F.sqrt(dot("v", "v")).alias("nrm"))
        a = nrmed.select("cid", F.col("vec_id").alias("va"), F.col("v").alias("av"), F.col("nrm").alias("na"))
        b = nrmed.select("cid", F.col("vec_id").alias("vb"), F.col("v").alias("bv"), F.col("nrm").alias("nb"))
        dups = (
            a.join(b, "cid")
            .filter(F.col("va") < F.col("vb"))
            .withColumn("sim", dot("av", "bv") / (F.col("na") * F.col("nb")))
            .filter(F.col("sim") >= tau)
        )
        rem = dups.groupBy("cid").agg(
            F.countDistinct("vb").alias("n_removed"),
            F.count(F.lit(1)).alias("n_dup_pairs"),
        )
        tot = nrmed.groupBy("cid").agg(F.count(F.lit(1)).alias("n"))
        return tot.join(rem, "cid", "left").select(
            F.col("cid").cast("int").alias("cluster_id"),
            "n",
            F.coalesce("n_dup_pairs", F.lit(0)).cast("long").alias("n_dup_pairs"),
            F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
            F.round((F.col("n") - F.coalesce("n_removed", F.lit(0))) * 1.0 / F.col("n"), 4).alias("keep_ratio"),
        )

    def substring_spans(self, docs: DataFrame, n: int = 8) -> DataFrame:
        """Exact-substring shared spans across documents (l67): n-token
        gram equi-join + gaps-and-islands merge; returns
        (da, db, n_spans, max_span, n_grams)."""
        from pyspark.sql import Window as W

        toks = docs.select("doc_id", F.split("text", " ").alias("l"))
        g = toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"CASE WHEN size(l) >= {n} THEN "
                    f"transform(sequence(1, size(l) - {n - 1}), "
                    f"i -> struct(i AS i, concat_ws(' ', slice(l, i, {n})) AS gram)) "
                    "ELSE array() END"
                )
            ).alias("s"),
        ).select("doc_id", F.col("s.i").alias("i"), F.col("s.gram").alias("gram"))
        a = g.select(F.col("doc_id").alias("da"), F.col("i").alias("ia"), "gram")
        b = g.select(F.col("doc_id").alias("db"), F.col("i").alias("ib"), "gram")
        m = a.join(b, "gram").filter(F.col("da") < F.col("db")).select("da", "db", "ia", "ib")
        w = W.partitionBy("da", "db", F.col("ia") - F.col("ib")).orderBy("ia")
        runs = m.select(
            "da", "db",
            (F.col("ia") - F.col("ib")).alias("diag"),
            (F.col("ia") - F.row_number().over(w)).alias("isl"),
        )
        spans = runs.groupBy("da", "db", "diag", "isl").agg(
            (F.count(F.lit(1)) + (n - 1)).alias("span_tokens")
        )
        return spans.groupBy("da", "db").agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.max("span_tokens").alias("max_span"),
            F.sum(F.col("span_tokens") - (n - 1)).alias("n_grams"),
        )

    def product_quantize(self, emb: DataFrame, n_sub: int = 4, sub_dim: int = 16, k: int = 8, iters: int = 2) -> DataFrame:
        """Product-quantization code assignment (l69): per-subspace
        Lloyd codebooks; returns (vec_id, subspace, cid, dist)."""
        from .operators.similarity import kmeans_lloyd

        outs = []
        for sp in range(n_sub):
            sub = emb.select("vec_id", F.slice("embedding", sp * sub_dim + 1, sub_dim).alias("sub"))
            assigned = kmeans_lloyd(sub, k=k, iters=iters, vec_col="sub")
            outs.append(assigned.select("vec_id", F.lit(sp).alias("subspace"), "cid", "dist"))
        res = outs[0]
        for o in outs[1:]:
            res = res.unionByName(o)
        return res

    def incremental_components(self, labels: DataFrame, new_edges: DataFrame) -> DataFrame:
        """Absorb a batch of new (symmetric) edges into existing CC
        labels without re-reading old edges (g79)."""
        from .graph.algorithms import incremental_components

        return incremental_components(labels, new_edges)

    def ewma(self, df: DataFrame, alpha: float = 0.2, key: str = "user_id",
             ts_col: str = "ts", id_col: str = "event_id", value_col: str = "value") -> DataFrame:
        """Per-key EWMA recurrence via the Arrow grouped-map path (t76);
        returns (key, n_events, final_ewma, max_ewma)."""
        import pandas as pd

        def fold(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values([ts_col, id_col])
            s = mx = None
            for x in pdf[value_col]:
                s = float(x) if s is None else alpha * float(x) + (1.0 - alpha) * s
                mx = s if mx is None else max(mx, s)
            return pd.DataFrame(
                {key: [pdf[key].iloc[0]], "n_events": [len(pdf)],
                 "final_ewma": [s], "max_ewma": [mx]}
            )

        return df.groupBy(key).applyInPandas(
            fold, f"{key} long, n_events long, final_ewma double, max_ewma double"
        )

    def weighted_sample(self, df: DataFrame, key_col: str,
                        weight_col: str, k: int, by: tuple = ()) -> DataFrame:
        """A-Res weighted reservoir sample (deterministic md5 uniforms;
        q161's operator form); `by` gives a per-group reservoir."""
        from .operators.sampling import weighted_reservoir_sample

        return weighted_reservoir_sample(df, key_col, weight_col, k, by=by)

    def holt_winters(self, df: DataFrame, value_col: str = "x",
                     order_cols: tuple = ("rn",), key_cols: tuple = (),
                     alpha: float = 0.3, beta: float = 0.1,
                     gamma: float = 0.2, season: int = 7) -> DataFrame:
        """Per-key additive Holt-Winters triple smoothing (the t90
        recurrence as a reusable operator); returns one row per key
        with (n_obs, level, trend, s_next, forecast_1)."""
        from .temporal.smoothing import holt_winters

        return holt_winters(
            df, value_col=value_col, order_cols=order_cols,
            key_cols=key_cols, alpha=alpha, beta=beta, gamma=gamma,
            season=season,
        )

    def pq_search(self, corpus: DataFrame, probes: DataFrame, k: int = 5,
                  shortlist: int = 150, **kw) -> DataFrame:
        """IVF-PQ read path (l72): ADC shortlist over byte codes, exact
        re-rank on the shortlist only; returns (vec_id, nb, d2)."""
        from .operators.similarity import pq_topk_rerank

        return pq_topk_rerank(corpus, probes, k=k, shortlist=shortlist, **kw)

    @staticmethod
    def plan_audit(df: DataFrame) -> dict:
        """Structured physical-plan audit — the pre-flight check that a
        query is scale-shaped BEFORE it runs on the big cluster.
        Returns counts of the plan facts the test-suite's plan guards
        assert one by one: shuffles (Exchange), broadcast vs sort-merge
        joins, cartesian products / broadcast nested loops (the
        red flags), whole-stage-codegen spans, and whether any parquet
        scan carries pushed filters.
        """
        plan = df._jdf.queryExecution().executedPlan().toString()
        # count true shuffle exchanges only: a plan line whose operator
        # token IS "Exchange" (hash/range/single partitioning).  A bare
        # substring count would also match BroadcastExchange rows (not
        # a shuffle) and ReusedExchange rows (the whole point is that
        # the shuffle is NOT re-executed), over-reporting the audit.
        n_shuffles = 0
        for line in plan.splitlines():
            op = line.lstrip(" +-:*(0123456789)")
            if op.startswith("Exchange "):
                n_shuffles += 1
        return {
            "n_exchanges": n_shuffles,
            "n_broadcast_joins": plan.count("BroadcastHashJoin"),
            "n_sortmerge_joins": plan.count("SortMergeJoin"),
            "n_cartesian": plan.count("CartesianProduct"),
            "n_bcast_nested_loop": plan.count("BroadcastNestedLoopJoin"),
            "n_codegen_spans": plan.count("WholeStageCodegen"),
            "has_pushed_filters": "PushedFilters: [" in plan
            and "PushedFilters: []" not in plan,
        }

    # ---- round-3 session additions: spatial / sampling / similarity ----

    def spatial_pairs(self, points: DataFrame, cell: int, radius2: int) -> DataFrame:
        """Radius self-join via grid bucketing (q135): all (a, b, d2)
        pairs within sqrt(radius2); requires cell^2 >= radius2."""
        from .operators.spatial import grid_radius_pairs

        return grid_radius_pairs(points, cell, radius2)

    def dbscan(self, points: DataFrame, cell: int, radius2: int,
               min_neighbors: int = 3) -> DataFrame:
        """Grid-composed DBSCAN (q140): (id, cluster, is_core) — noise
        points are absent from the result."""
        from .operators.spatial import dbscan_grid

        return dbscan_grid(points, cell, radius2, min_neighbors)

    def negative_samples(self, k: int = 3, min_items: int = 2,
                         m: int = 8, buckets: int = 64) -> DataFrame:
        """Deterministic md5-ranked non-edges per customer (g107):
        bounded O(|src|*m) probe pool (md5(src‖i) % n_dst equi-joined
        against globally md5-ranked dsts), anti-joined against real
        edges, top-k by md5(src‖dst) — RNG-free training negatives
        whose candidate volume is independent of |dst|."""
        from .operators.sampling import bounded_negative_samples

        e = (
            self.catalog.graph_edges()
            .filter(F.col("n_items") >= min_items)
            .select("src", "dst")
            .distinct()
        )
        return bounded_negative_samples(e, k=k, m=m, buckets=buckets)

    # ---- round-4 session additions: exact-join / rec / eval surfaces ----

    def prefix_filter_pairs(
        self, df: DataFrame, tau_num: int = 1, tau_den: int = 2, n: int = 2, **kw
    ) -> DataFrame:
        """EXACT Jaccard >= tau_num/tau_den self-join via lossless
        prefix filtering (l110): (a, b, inter_n, union_n).  The
        deterministic complement to the probabilistic LSH candidates
        of :meth:`dedup_candidates`."""
        from .operators.dedup import prefix_filter_jaccard_pairs

        return prefix_filter_jaccard_pairs(df, tau_num, tau_den, n, **kw)

    def item_item_recs(self) -> DataFrame:
        """Top-3 item-item CF recommendations per customer (g117):
        co-occurrence-weighted scores, owned items excluded."""
        from .queries.gsuite import QUERIES

        q = next(q for q in QUERIES if q.name == "g117_itemitem_recs")
        return q.build(self.spark, self.catalog.sf_dir)

    def cooccurrence_pairs(
        self,
        edges: DataFrame | None = None,
        basket_col: str = "src",
        item_col: str = "dst",
        min_cooc: int = 2,
        basket_cap: int | None = None,
    ) -> DataFrame:
        """Item-item co-occurrence projection (s1 < s2, cooc) with the
        viral-basket degree cap (operators/recsys.py): basket_cap=k
        bounds every basket's contribution to C(k,2) pairs — the 100 TB
        skew guard; None reproduces g38/g117's exact uncapped counts.
        Defaults to the sales property graph's (customer, supplier)
        edges when no frame is given."""
        from .operators.recsys import item_item_cooccurrence

        e = edges if edges is not None else self.catalog.graph_edges()
        return item_item_cooccurrence(
            e, basket_col=basket_col, item_col=item_col,
            min_cooc=min_cooc, basket_cap=basket_cap,
        )

    def dtw_profile(self) -> DataFrame:
        """DTW distance profile between the 1995 URGENT/HIGH monthly
        order series (t85): final DP row, exact integer costs."""
        from .queries.qsuite import QUERIES

        q = next(q for q in QUERIES if q.name == "t85_dtw")
        return q.build(self.spark, self.catalog.sf_dir)

    def bleu_components(self) -> DataFrame:
        """BLEU-2 clipped-overlap integer components between same-lang
        adjacent doc pairs (l109)."""
        from .queries.lsuite import QUERIES

        q = next(q for q in QUERIES if q.name == "l109_bleu_overlap")
        return q.build(self.spark, self.catalog.sf_dir)

    def skipgram_pairs(self) -> DataFrame:
        """Top skip-gram (center, context, distance) training pairs at
        window +1/+2 (l111)."""
        from .queries.lsuite import QUERIES

        q = next(q for q in QUERIES if q.name == "l111_skipgram_pairs")
        return q.build(self.spark, self.catalog.sf_dir)

    def ahash(self, media: DataFrame, cells: int = 64) -> DataFrame:
        """Perceptual average-hash bands over opaque payloads (m11):
        (doc_id, n_bytes, b0..b3) — near-dup search is a band
        equi-join."""
        from .operators.multimodal import perceptual_ahash

        return perceptual_ahash(media, cells)

    def span_dedup(
        self,
        docs: DataFrame,
        n: int = 5,
        max_gram_freq: int | None = None,
    ) -> DataFrame:
        """Verbatim repeated-span pairs (l112/l114): positional n-gram
        self-join + per-diagonal run merge; returns (doc_a, doc_b,
        shared_grams, max_run_tokens).  `max_gram_freq` drops
        stop-grams before the join (the 100 TB skew cap)."""
        from .operators.dedup import ngram_span_pairs

        return ngram_span_pairs(docs, n=n, max_gram_freq=max_gram_freq)

    def project_embeddings(
        self,
        emb: DataFrame,
        dim: int,
        out_dim: int = 16,
        quantize: int | None = None,
    ) -> DataFrame:
        """Johnson-Lindenstrauss signed random projection (l116):
        appends a `proj` array column; md5-seeded ±1 signs, one
        codegen pass, zero shuffle."""
        from .operators.similarity import random_projection

        return random_projection(emb, dim=dim, out_dim=out_dim, quantize=quantize)

    def profile(self, df: DataFrame, columns: list | None = None) -> DataFrame:
        """Column data-quality profile (q156): one aggregation pass ->
        (col_name, n_rows, n_null, n_distinct, min_str, max_str)."""
        from .operators.relational import profile_columns

        return profile_columns(df, columns)
