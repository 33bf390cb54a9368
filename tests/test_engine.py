"""Facade smoke (SURVEY §3.2): every Engine entry point wires to a real
operator and returns sane shapes at sf0.001.  Correctness depth lives in
the oracle suite; this guards the user-facing API surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_spark.engine import Engine

from .conftest import SF_SMOKE


def test_engine_surface(spark):
    eng = Engine(spark, SF_SMOKE)

    assert eng.table("lineitem").count() > 0
    assert eng.sql("SELECT count(*) AS n FROM orders").collect()[0]["n"] > 0
    assert eng.sql("SELECT count(*) AS n FROM graph_edges").collect()[0]["n"] > 0

    g = eng.graph()
    assert {"src", "dst"} <= set(g.edges.columns)

    pr = eng.pagerank(iterations=3).collect()
    assert len(pr) > 0 and abs(sum(r["rank"] for r in pr) - 1.0) < 0.2

    assert eng.bfs("c1", 2).count() > 0
    assert eng.connected_components().count() > 0
    assert eng.k_core(2).count() >= 0
    assert eng.label_propagation(max_iter=2).count() > 0
    assert eng.strongly_connected_components().count() > 0
    assert eng.shortest_paths("c1").count() > 0

    tv = eng.temporal_value_at(F.lit("1998-01-01").cast("timestamp"))
    assert tv.count() > 0

    docs = eng.table("documents")
    assert eng.dedup_exact(docs).count() >= 0
    assert eng.text_quality(docs.limit(50)).count() == 50

    emb = eng.table("embeddings")
    probes = emb.filter(F.col("vec_id") < 3)
    topk = eng.similar_topk(emb, probes, k=2)
    assert topk.count() == 3 * 2

    media = eng.to_media(docs.limit(10))
    assert eng.media_features(media).count() == 10
    frames = eng.frame_sample(media, frame_bytes=64, every=1)
    assert frames.count() >= 10

    acd = eng.approx_count_distinct(eng.table("orders"), "o_custkey").collect()[0][0]
    assert acd > 0


def test_engine_round1_additions(spark):
    from pyspark.sql import functions as F

    from graph_spark.engine import Engine

    from .conftest import SF_SMOKE

    eng = Engine(spark, SF_SMOKE)

    ppr = eng.personalized_pagerank(["c1"], iterations=3).collect()
    assert len(ppr) > 0 and abs(sum(r["rank"] for r in ppr) - 1.0) < 0.2

    lmd = eng.landmark_distances(["c1", "c5"], max_hops=3)
    assert lmd.select("lm").distinct().count() <= 2 and lmd.count() > 0

    assert eng.node_similarity(min_common=1, min_items=1).count() > 0

    twa = eng.temporal_time_weighted_avg(
        F.lit("1996-01-01").cast("timestamp"), F.lit("1998-01-01").cast("timestamp")
    )
    assert twa.count() > 0

    series = eng.table("orders").groupBy(
        F.col("o_custkey").alias("entity_id"), F.col("o_orderdate").alias("ts")
    ).agg(F.max("o_orderstatus").alias("value"))
    assert eng.temporal_compact(series).count() <= series.count()

    docs = eng.table("documents")
    assert eng.dedup_simhash(docs, max_distance=3).count() >= 0
    # beyond the pigeonhole recall bound the banding is refused (r7)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_bands - 1"):
        eng.dedup_simhash(docs, max_distance=64)


def test_engine_new_surfaces(spark):
    from graph_spark.engine import Engine

    from .conftest import SF_SMOKE

    eng = Engine(spark, SF_SMOKE)

    cc = eng.clustering_coefficient().collect()
    assert cc and all(0.0 <= r["cc"] <= 1.0 for r in cc)

    a = eng.assortativity().collect()
    assert len(a) == 1 and -1.0 <= a[0]["assort"] <= 1.0

    series = eng.snapshot_series().collect()
    cums = [r["cum_edges"] for r in series]
    assert cums == sorted(cums) and cums[-1] == sum(r["new_edges"] for r in series)

    docs = eng.table("documents")
    packed = eng.pack_sequences(docs, budget=256)
    assert packed.filter(packed.pack_id < 0).count() == 0 and packed.count() == docs.count()

    s = eng.surprisal(docs)
    assert s.count() == docs.count()
    assert s.filter(s.surprisal <= 0).count() == 0


def test_engine_round_continuation_surfaces(spark):
    """Facade coverage for the newest operators: betweenness, matching,
    walks, temporal align, k-means, co-purchase projection."""
    from pyspark.sql import functions as F

    from graph_spark.engine import Engine

    from .conftest import SF_SMOKE

    eng = Engine(spark, SF_SMOKE)

    bc = eng.betweenness(sources=["c1"]).collect()
    assert bc and all(r["bc"] >= 0.0 for r in bc)

    m = eng.maximal_matching().collect()
    nodes = [n for r in m for n in (r["src"], r["dst"])]
    assert m and len(nodes) == len(set(nodes))

    w = eng.walks().collect()
    assert w and all(r["path"].startswith(r["start"]) for r in w)

    tp = eng.table("events").selectExpr(
        "user_id AS entity_id", "event_type AS prop", "ts", "value"
    )
    al = eng.temporal_align(tp, ["click", "view"])
    assert {"click", "view"} <= set(al.columns)

    km = eng.kmeans(eng.table("embeddings"), k=4, iters=2)
    assert km.select("cid").distinct().count() <= 4
    assert km.count() == eng.table("embeddings").count()

    cp = eng.copurchase_graph().collect()
    assert all(r["p1"] < r["p2"] for r in cp)


def test_engine_scale_tooling_surfaces(spark):
    from pyspark.sql import functions as F

    eng = Engine(spark, SF_SMOKE)

    sa = eng.skew_audit(eng.table("lineitem"), "l_suppkey").collect()
    assert len(sa) == 1 and sa[0]["key_name"] == "l_suppkey"
    assert 0.0 <= sa[0]["gini"] <= 1.0 and sa[0]["top1_share"] > 0

    iv = spark.createDataFrame(
        [(0, 10), (5, 15), (20, 20)], ["st", "en"]
    )
    runs = eng.sweep_concurrency(iv).collect()
    assert max(r["conc"] for r in runs) == 2  # [0,10] overlaps [5,15]
    assert min(r["conc"] for r in runs) >= 0  # point interval never dips

    bm = eng.bm25(eng.table("documents"))
    assert {"doc_id", "term", "tf", "bm25"} <= set(bm.columns)
    assert bm.filter(F.col("bm25") < 0).count() == 0

    kc = eng.knn_classify(eng.table("embeddings").limit(30), k=3)
    assert kc.count() == 30 and {"vec_id", "label", "pred"} <= set(kc.columns)

    kz = eng.katz().collect()
    assert kz and all(r["w1"] > 0 and r["w2"] >= 0 for r in kz)


def test_engine_round3b_surfaces(spark):
    """Facade coverage + cross-certification for HITS, the threshold
    cascade, Luby MIS, TextRank, and BPE merges."""
    eng = Engine(spark, SF_SMOKE)

    h = eng.hits().collect()
    assert h and {r["side"] for r in h} == {"hub", "auth"}
    # authorities are suppliers, hubs are customers (bipartite direction)
    assert all(r["node"][0] == ("s" if r["side"] == "auth" else "c") for r in h)

    casc = eng.threshold_cascade().collect()
    assert casc and min(r["r"] for r in casc) == 0  # seeds present
    assert all(0 <= r["r"] <= 4 for r in casc)

    mis = eng.luby_mis().collect()
    status = {r["node"]: r["status"] for r in mis}
    assert set(status.values()) <= {"mis", "out", "undecided"}
    # independence cross-check: no sym edge joins two MIS members
    es = eng.catalog.graph_edges_sym().collect()
    assert not any(
        status.get(e["src"]) == "mis" and status.get(e["dst"]) == "mis" for e in es
    )

    tr = eng.textrank().collect()
    assert tr and all(r["score"] > 0 for r in tr)

    bpe = eng.bpe_merges().collect()
    assert [r["rank"] for r in bpe] == [1, 2, 3, 4, 5]
    # merge counts are non-increasing only within a round's choice being
    # max — but each merged token must concatenate its pair
    assert all(r["merged"] == r["u"] + r["v"] for r in bpe)


def test_engine_sql_text_matches_dataframe_builders(spark):
    """Dual API surface: the same declared queries, written as SQL text
    against Engine.sql's registered views, must return exactly the
    DataFrame builders' rows."""
    from pyspark.sql import functions as F

    from graph_spark.queries.registry import by_name

    eng = Engine(spark, SF_SMOKE)
    reg = by_name()

    sql_q01 = """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
               round(avg(l_quantity), 4) AS avg_qty, count(*) AS n
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        GROUP BY 1, 2 ORDER BY 1, 2"""
    a = eng.sql(sql_q01).collect()
    b = reg["q01_scan_agg"].build(spark, SF_SMOKE).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]

    sql_g01 = """
        SELECT src, count(*) AS deg, sum(n_items) AS items
        FROM graph_edges GROUP BY 1 ORDER BY 1"""
    ga = eng.sql(sql_g01).collect()
    gb = reg["g01_degree"].build(spark, SF_SMOKE).collect()
    assert [tuple(r) for r in ga] == [tuple(r) for r in gb]


def test_operator_edge_cases(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StructField, StructType

    from graph_spark.operators.relational import skew_audit, sweep_concurrency

    empty = spark.createDataFrame(
        [], StructType([StructField("st", LongType()), StructField("en", LongType())])
    )
    assert sweep_concurrency(empty).count() == 0

    one = spark.createDataFrame([(5,)], ["k"])
    a = skew_audit(one, "k").collect()[0]
    assert a["n_keys"] == 1 and a["gini"] == 0.0 and a["top1_share"] == 1.0


def test_engine_spatial_and_sampling_surfaces(spark):
    """Round-3 facade additions: spatial_pairs/dbscan/negative_samples/
    ahash delegate to the declared-query operators and return the
    documented schemas."""
    from pyspark.sql import functions as F

    from graph_spark.engine import Engine

    eng = Engine(spark, SF_SMOKE)
    pts = spark.range(60).select(
        "id", (F.col("id") * 37 % 400).alias("x"), (F.col("id") * 91 % 400).alias("y")
    )
    pairs = eng.spatial_pairs(pts, cell=100, radius2=10000)
    assert pairs.columns == ["a", "b", "d2"]
    assert pairs.filter(F.col("d2") > 10000).count() == 0

    assign = eng.dbscan(pts, cell=100, radius2=10000, min_neighbors=2)
    assert set(assign.columns) == {"id", "cluster", "is_core"}
    # every member's cluster label is a core point's id
    cores = {r["id"] for r in assign.filter(F.col("is_core") == 1).collect()}
    assert {r["cluster"] for r in assign.collect()} <= cores

    neg = eng.negative_samples(k=2)
    assert neg.columns == ["src", "neg", "neg_rank", "hv"]
    assert neg.groupBy("src").count().agg(F.max("count")).first()[0] <= 2
    # negatives are genuinely non-edges
    e = eng.catalog.graph_edges().filter(F.col("n_items") >= 2).select(
        F.col("src"), F.col("dst").alias("neg")
    )
    assert neg.join(e, ["src", "neg"], "inner").count() == 0

    media = eng.to_media(eng.catalog.table("documents").limit(10))
    h = eng.ahash(media)
    assert h.columns == ["doc_id", "n_bytes", "b0", "b1", "b2", "b3"]
    for c in ("b0", "b1", "b2", "b3"):
        row = h.agg(F.min(c), F.max(c)).first()
        assert 0 <= row[0] and row[1] < 65536


def test_engine_round4_surfaces(spark):
    """Round-4 facade additions: prefix_filter_pairs / item_item_recs /
    dtw_profile / bleu_components / skipgram_pairs delegate to the
    declared operators and return the documented schemas."""
    from pyspark.sql import functions as F

    from graph_spark.engine import Engine

    eng = Engine(spark, SF_SMOKE)

    docs = eng.table("documents").limit(60)
    pairs = eng.prefix_filter_pairs(docs, tau_num=1, tau_den=2)
    assert pairs.columns == ["a", "b", "inter_n", "union_n"]
    # every verified pair really meets the threshold
    assert pairs.filter(2 * F.col("inter_n") < F.col("union_n")).count() == 0

    recs = eng.item_item_recs()
    assert recs.columns == ["customer", "rec", "score", "rnk"]
    assert recs.groupBy("customer").count().agg(F.max("count")).first()[0] <= 3

    dtw = eng.dtw_profile()
    assert dtw.columns == ["j", "cost"] and dtw.count() == 12

    bleu = eng.bleu_components()
    assert bleu.columns == ["a", "b", "len_c", "len_r", "clip1", "clip2"]
    # clipped counts can never exceed the candidate's gram totals
    bad = bleu.filter(
        (F.col("clip1") > F.col("len_c"))
        | (F.col("clip2") > F.greatest(F.col("len_c") - 1, F.lit(0)))
    )
    assert bad.count() == 0

    sg = eng.skipgram_pairs()
    assert sg.columns == ["w1", "w2", "d", "cnt"] and sg.count() <= 25


def test_engine_cooccurrence_pairs_cap(spark):
    """Facade exposure of the capped projection: capped ⊆ uncapped on
    the fixture graph, and the cap parameter reaches the operator."""
    from pyspark.sql import functions as F

    from graph_spark.engine import Engine

    from .conftest import SF_SMOKE

    e = Engine(spark, SF_SMOKE)
    un = e.cooccurrence_pairs(min_cooc=1)
    cap = e.cooccurrence_pairs(min_cooc=1, basket_cap=2)
    un_keys = {(r.s1, r.s2) for r in un.collect()}
    cap_rows = cap.collect()
    assert {(r.s1, r.s2) for r in cap_rows} <= un_keys
    assert cap.columns == ["s1", "s2", "cooc"]


def test_engine_round6_facades(spark):
    """span_dedup / project_embeddings / profile facades route to the
    round-6 operators and return the documented shapes."""
    from graph_spark.engine import Engine

    eng = Engine(spark, SF_SMOKE)
    docs = spark.createDataFrame(
        [(1, "a b c d e f x"), (2, "z a b c d e f")],
        "doc_id long, text string",
    )
    sd = eng.span_dedup(docs, n=5).collect()
    assert [(r.doc_a, r.doc_b, r.max_run_tokens) for r in sd] == [(1, 2, 6)]

    emb = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0])], "vec_id long, embedding array<double>"
    )
    pr = eng.project_embeddings(emb, dim=4, out_dim=5).collect()[0]
    assert len(pr.proj) == 5

    prof = eng.profile(docs).collect()
    assert sorted(r.col_name for r in prof) == ["doc_id", "text"]
    assert all(r.n_rows == 2 and r.n_null == 0 for r in prof)


def test_holt_winters_operator_matches_reference(spark):
    """The generic per-key Holt-Winters operator folds the exact
    recurrence the docstring states (checked against an inline python
    reference), drops keys shorter than season+1, and works keyless."""
    from graph_spark.temporal.smoothing import holt_winters

    series = {
        "a": [3, 1, 4, 1, 5, 9, 2, 6],
        "b": [2, 7, 1, 8, 2, 8],
        "short": [1, 2, 3],  # < season+1 -> dropped
    }
    rows = [
        (k, i + 1, v)
        for k, xs in series.items()
        for i, v in enumerate(xs)
    ]
    df = spark.createDataFrame(rows, ["k", "rn", "x"])
    got = {
        r.k: r
        for r in holt_winters(
            df, value_col="x", order_cols=("rn",), key_cols=("k",),
            alpha=0.3, beta=0.1, gamma=0.2, season=3,
        ).collect()
    }
    assert set(got) == {"a", "b"}

    def ref(xs, a=0.3, be=0.1, g=0.2, m=3):
        s = 0.0
        for v in xs[:m]:
            s += float(v)
        lvl = s / float(m)
        sl = [float(v) - s / float(m) for v in xs[:m]]
        b = 0.0
        for xv in xs[m:]:
            so = sl[0]
            nl = a * (xv - so) + (1.0 - a) * (lvl + b)
            nb = be * (nl - lvl) + (1.0 - be) * b
            ns = g * (xv - nl) + (1.0 - g) * so
            sl = sl[1:] + [ns]
            lvl, b = nl, nb
        return lvl, b, sl[0]

    for k in ("a", "b"):
        lvl, b, s_next = ref(series[k])
        assert got[k].n_obs == len(series[k])
        assert got[k].level == lvl
        assert got[k].trend == b
        assert got[k].s_next == s_next
        assert got[k].forecast_1 == lvl + b + s_next

    # keyless (global series) mode: one row, no __g column
    g1 = holt_winters(
        df.filter(df.k == "a").select("rn", "x"),
        value_col="x", order_cols=("rn",), season=3,
    )
    assert g1.columns == [
        "n_obs", "level", "trend", "s_next", "forecast_1"
    ]
    assert g1.count() == 1


def test_engine_holt_winters_facade(spark):
    from graph_spark.engine import Engine

    from .conftest import SF_SMOKE

    eng = Engine(spark, SF_SMOKE)
    ev = eng.catalog.table("events").filter("user_id < 5").select(
        "user_id", "ts", "event_id", "value"
    )
    out = eng.holt_winters(
        ev, value_col="value", order_cols=("ts", "event_id"),
        key_cols=("user_id",), season=4,
    )
    rows = out.collect()
    assert rows and all(r.forecast_1 is not None for r in rows)


def test_engine_round8_facades(spark):
    """temporal_rollup_merge routes to merge_rollup; Engine.cypher runs
    the r8 count{}/CALL subquery surface end-to-end."""
    from pyspark.sql import functions as F

    from graph_spark.engine import Engine

    eng = Engine(spark, SF_SMOKE)
    grain = eng.catalog.tprop_spend().select(
        "entity_id", "ts", F.col("delta").alias("value")
    )
    cut = F.lit("1997-01-01").cast("timestamp")
    merged = eng.temporal_rollup_merge(
        _rollup_of(eng, grain.filter(F.col("ts") < cut)),
        grain.filter(F.col("ts") >= cut),
    )
    assert merged.count() == eng.temporal_range_rollup().count()

    got = eng.cypher(
        "MATCH (c:Customer)-[e:BUYS]->(s:Supplier) WITH DISTINCT s "
        "RETURN s, count { (s)<-[:BUYS]-(x:Customer) } AS fanin "
        "ORDER BY fanin DESC, s LIMIT 3"
    ).collect()
    assert len(got) == 3 and all(r.fanin >= 1 for r in got)


def _rollup_of(eng, grain):
    from graph_spark.temporal.aggregate_index import build_rollup

    return build_rollup(grain, ["entity_id"], "ts", "value", "month")
