"""LLM-data-pipeline declared queries L01-L13 + M01 (SURVEY.md §2.F).

Dedup (exact / minhash / simhash / n-gram Jaccard / embedding cosine),
similarity search (brute force + LSH), text analysis (tf-idf, stats,
lang-ID heuristic, quality, token counts, fingerprints), multimodal
plumbing.  Oracles reproduce every hash bit in DuckDB SQL; the two
approximate operators (LSH ANN) are rows-only by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..operators.dedup import (
    exact_dedup_groups,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from ..operators.multimodal import extract_features, to_media_table
from ..operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    neardup_pairs_cosine,
)
from ..operators.text import (
    doc_fingerprint,
    quality_features,
    stopword_ratio,
    tf_idf_top_terms,
    token_stats,
)
from .common import Query

_L: list[Query] = []


def _l(name: str, oracle: str | None, note: str = ""):
    def deco(fn):
        _L.append(Query(name, fn, oracle, note))
        return fn

    return deco


# Distinct non-empty whitespace tokens, reused by several oracles.
_TOK_CTE = """tok AS (
  SELECT DISTINCT doc_id, t.term FROM documents,
  unnest(string_split(text, ' ')) AS t(term) WHERE t.term <> '')"""


@_l(
    "l01_exact_dedup",
    """WITH g AS (SELECT md5(text) AS hash, count(*) AS cnt FROM documents GROUP BY 1)
       SELECT hash, cnt FROM g WHERE cnt > 1
       UNION ALL SELECT '__total__', count(*) FROM g
       ORDER BY 1""",
)
def l01(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    g = exact_dedup_groups(docs)
    dupes = g.filter(F.col("cnt") > 1).select("hash", "cnt")
    total = g.agg(F.count(F.lit(1)).alias("cnt")).select(F.lit("__total__").alias("hash"), "cnt")
    return dupes.unionAll(total).orderBy("hash")


@_l(
    "l02_minhash",
    """WITH tok AS (
         SELECT DISTINCT doc_id, t.term FROM documents,
         unnest(string_split(text, ' ')) AS t(term)
         WHERE doc_id < 20 AND t.term <> ''),
       h AS (SELECT doc_id, r.i::INT AS i, md5(r.i::VARCHAR || ':' || term) AS hv
             FROM tok CROSS JOIN range(16) r(i))
       SELECT doc_id, i, min(hv) AS sig FROM h GROUP BY 1,2 ORDER BY 1,2""",
)
def l02(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents").filter(F.col("doc_id") < 20)
    return minhash_signatures(docs, k=16).orderBy("doc_id", "i")


@_l(
    "l03_cosine_topk",
    """WITH norms AS (
         SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM
         (SELECT vec_id, unnest(embedding)::DOUBLE AS x FROM embeddings) u GROUP BY 1),
       up AS (SELECT a.vec_id AS va, b.vec_id AS vb,
              unnest(a.embedding)::DOUBLE AS xa, unnest(b.embedding)::DOUBLE AS xb
              FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
              WHERE a.vec_id < 10),
       dots AS (SELECT va, vb, sum(xa*xb) AS dot FROM up GROUP BY 1,2),
       sims AS (SELECT va AS vec_id, vb AS nb,
                dot/(na.nrm*nb2.nrm) AS sim_raw,
                round(dot/(na.nrm*nb2.nrm), 6) AS sim
                FROM dots JOIN norms na ON na.vec_id=va JOIN norms nb2 ON nb2.vec_id=vb)
       SELECT vec_id, nb, sim FROM sims
       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sim_raw DESC, nb) <= 5
       ORDER BY vec_id, sim DESC, nb""",
)
def l03(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = Catalog(spark, sf_dir).table("embeddings")
    probes = em.filter(F.col("vec_id") < 10)
    res = cosine_topk_bruteforce(em, probes, k=5)
    return res.select("vec_id", "nb", F.round("sim", 6).alias("sim")).orderBy(
        "vec_id", F.col("sim").desc(), "nb"
    )


@_l(
    "l04_tfidf",
    """WITH tok AS (
         SELECT doc_id, lang, t.term FROM documents,
         unnest(string_split(text, ' ')) AS t(term) WHERE t.term <> ''),
       tf AS (SELECT lang, term, count(*) AS tf FROM tok GROUP BY 1,2),
       idf AS (SELECT term,
               ln((SELECT count(DISTINCT doc_id) FROM tok)::DOUBLE / count(DISTINCT doc_id)) AS idf
               FROM tok GROUP BY 1)
       SELECT lang, term, round(tf*idf, 6) AS w FROM tf JOIN idf USING (term)
       QUALIFY row_number() OVER (PARTITION BY lang ORDER BY tf*idf DESC, term) <= 3
       ORDER BY lang, w DESC, term""",
)
def l04(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    res = tf_idf_top_terms(docs, group_col="lang", top_n=3)
    return res.select("lang", "term", F.round("w", 6).alias("w")).orderBy(
        "lang", F.col("w").desc(), "term"
    )


@_l(
    "l05_text_stats",
    """SELECT lang, source, count(*) AS docs, round(avg(n_chars),2) AS avg_chars,
       sum(len(list_filter(string_split(text,' '), x -> x <> '')))::BIGINT AS n_tokens
       FROM documents GROUP BY 1,2 ORDER BY 1,2""",
)
def l05(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = token_stats(Catalog(spark, sf_dir).table("documents"))
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
        .orderBy("lang", "source")
    )


@_l(
    "l06_simhash",
    """WITH tok AS (
         SELECT DISTINCT doc_id, t.term FROM documents,
         unnest(string_split(text, ' ')) AS t(term)
         WHERE doc_id < 50 AND t.term <> ''),
       th AS (SELECT doc_id, md5(term) AS h FROM tok),
       digits AS (SELECT doc_id, i.i AS di,
                  strpos('0123456789abcdef', substring(h, (i.i+1)::INT, 1)) - 1 AS dv
                  FROM th CROSS JOIN range(16) i(i)),
       bits AS (SELECT doc_id, di, b.bi,
                CAST(floor(dv / power(2, b.bi)) AS BIGINT) % 2 AS bit
                FROM digits CROSS JOIN range(4) b(bi)),
       maj AS (SELECT doc_id, di, bi,
               CASE WHEN sum(bit*2 - 1) > 0 THEN 1 ELSE 0 END AS mbit
               FROM bits GROUP BY 1,2,3),
       dvals AS (SELECT doc_id, di, sum(mbit * CAST(power(2, bi) AS BIGINT))::BIGINT AS dval
                 FROM maj GROUP BY 1,2),
       halves AS (SELECT doc_id, CASE WHEN di < 8 THEN 1 ELSE 0 END AS half,
                  sum(dval * CAST(power(2, 4*(7 - di % 8)) AS BIGINT))::BIGINT AS hv
                  FROM dvals GROUP BY 1,2),
       hx AS (SELECT doc_id, half, lpad(lower(to_hex(hv)), 8, '0') AS hs FROM halves)
       SELECT doc_id, max(CASE WHEN half=1 THEN hs END) || max(CASE WHEN half=0 THEN hs END) AS simhash
       FROM hx GROUP BY 1 ORDER BY 1""",
)
def l06(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents").filter(F.col("doc_id") < 50)
    return simhash_signatures(docs).orderBy("doc_id")


@_l(
    "l07_ngram_jaccard",
    """WITH docs AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS l
                    FROM documents WHERE doc_id < 30),
       sh AS (SELECT DISTINCT doc_id, s[1] || ' ' || s[2] AS shingle
              FROM (SELECT doc_id, unnest(list_zip(l, l[2:])) AS s FROM docs) z
              WHERE s[2] IS NOT NULL),
       sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
       inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
                 FROM sh a JOIN sh b ON a.shingle=b.shingle AND a.doc_id<b.doc_id
                 GROUP BY 1,2)
       SELECT a, b, round(i::DOUBLE/(sa.sz + sb.sz - i), 6) AS j
       FROM inter JOIN sizes sa ON sa.doc_id=a JOIN sizes sb ON sb.doc_id=b
       ORDER BY 1,2""",
)
def l07(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents").filter(F.col("doc_id") < 30)
    res = ngram_jaccard_pairs(docs, n=2)
    return res.select("a", "b", F.round("jaccard", 6).alias("j")).orderBy("a", "b")


@_l(
    "l08_lang_stats",
    """WITH t AS (SELECT lang, list_filter(string_split(text,' '), x -> x <> '') AS toks
                 FROM documents),
       r AS (SELECT lang, CASE WHEN len(toks) > 0 THEN
               len(list_filter(toks, x -> list_contains(
                 ['the','a','of','and','to','in','is','on','for','with'], x)))::DOUBLE / len(toks)
             ELSE 0.0 END AS sr FROM t)
       SELECT lang, count(*) AS docs, round(avg(sr),4) AS avg_stop
       FROM r GROUP BY 1 ORDER BY 1""",
)
def l08(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = stopword_ratio(Catalog(spark, sf_dir).table("documents"))
    return (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("docs"), F.round(F.avg("stopword_ratio"), 4).alias("avg_stop"))
        .orderBy("lang")
    )


@_l(
    "l09_quality",
    """WITH q AS (SELECT doc_id,
         len(list_filter(string_split(text,' '), x -> x <> '')) AS nt,
         length(replace(text, ' ', '')) AS tc,
         length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS na,
         length(text) AS lc
       FROM documents WHERE doc_id < 50),
       f AS (SELECT doc_id, nt,
         CASE WHEN nt > 0 THEN tc::DOUBLE / nt ELSE 0.0 END AS atl,
         CASE WHEN lc > 0 THEN na::DOUBLE / lc ELSE 0.0 END AS nar
       FROM q)
       SELECT doc_id, nt::INT AS n_tokens, round(atl, 4) AS avg_token_len,
         round(nar, 6) AS non_alnum_ratio,
         round(least(nt::DOUBLE/100, 1.0::DOUBLE)*0.5::DOUBLE
               + least(atl/8, 1.0::DOUBLE)*0.3::DOUBLE
               + (1 - least(nar*5, 1.0::DOUBLE))*0.2::DOUBLE, 6) AS quality_score
       FROM f ORDER BY doc_id""",
)
def l09(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = quality_features(Catalog(spark, sf_dir).table("documents").filter(F.col("doc_id") < 50))
    return docs.select(
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.round("avg_token_len", 4).alias("avg_token_len"),
        F.round("non_alnum_ratio", 6).alias("non_alnum_ratio"),
        F.round("quality_score", 6).alias("quality_score"),
    ).orderBy("doc_id")


@_l(
    "l10_token_counts",
    """SELECT source,
       sum(len(list_filter(string_split(text,' '), x -> x <> '')))::BIGINT AS n_tokens,
       sum(ceil(length(text)/4)::BIGINT)::BIGINT AS est_bpe_tokens
       FROM documents GROUP BY 1 ORDER BY 1""",
)
def l10(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = token_stats(Catalog(spark, sf_dir).table("documents"))
    return (
        docs.groupBy("source")
        .agg(
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.sum("est_bpe_tokens").cast("long").alias("est_bpe_tokens"),
        )
        .orderBy("source")
    )


@_l(
    "l11_fingerprint",
    """WITH docs AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS l
                    FROM documents WHERE doc_id < 100),
       sh AS (SELECT DISTINCT doc_id, s[1] || ' ' || s[2] AS shingle
              FROM (SELECT doc_id, unnest(list_zip(l, l[2:])) AS s FROM docs) z
              WHERE s[2] IS NOT NULL)
       SELECT doc_id, min(md5(shingle)) AS fingerprint, count(*) AS n_shingles
       FROM sh GROUP BY 1 ORDER BY 1""",
)
def l11(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents").filter(F.col("doc_id") < 100)
    return doc_fingerprint(docs, n=2).orderBy("doc_id")


@_l(
    "l12_ann_lsh",
    None,
    note="approximate by construction (LSH prefilter); recall vs brute force tested in pytest",
)
def l12(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = Catalog(spark, sf_dir).table("embeddings")
    probes = em.filter(F.col("vec_id") < 10)
    res = cosine_topk_lsh(em, probes, k=5, dim=64, n_planes=4, n_tables=24)
    return res.select("vec_id", "nb", F.round("sim", 6).alias("sim")).orderBy(
        "vec_id", F.col("sim").desc(), "nb"
    )


@_l(
    "l17_ann_ivf",
    None,
    note="IVF ANN (kmeans cells + nprobe search); approximate by construction, recall-tested in pytest",
)
def l17(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cosine_topk_ivf

    em = Catalog(spark, sf_dir).table("embeddings")
    probes = em.filter(F.col("vec_id") < 10)
    res = cosine_topk_ivf(em, probes, k=5, dim=64, n_clusters=16, nprobe=10)
    return res.select("vec_id", "nb", F.round("sim", 6).alias("sim")).orderBy(
        "vec_id", F.col("sim").desc(), "nb"
    )


@_l(
    "l13_embed_neardup",
    """WITH norms AS (
         SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM
         (SELECT vec_id, unnest(embedding)::DOUBLE AS x FROM embeddings WHERE vec_id < 100) u
         GROUP BY 1),
       up AS (SELECT a.vec_id AS va, b.vec_id AS vb,
              unnest(a.embedding)::DOUBLE AS xa, unnest(b.embedding)::DOUBLE AS xb
              FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
              WHERE a.vec_id < 100 AND b.vec_id < 100),
       dots AS (SELECT va, vb, sum(xa*xb) AS dot FROM up GROUP BY 1,2)
       SELECT va AS a, vb AS b, round(dot/(na.nrm*nb2.nrm), 6) AS sim
       FROM dots JOIN norms na ON na.vec_id=va JOIN norms nb2 ON nb2.vec_id=vb
       WHERE dot/(na.nrm*nb2.nrm) >= 0.25
       ORDER BY 1,2""",
)
def l13(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = Catalog(spark, sf_dir).table("embeddings").filter(F.col("vec_id") < 100)
    res = neardup_pairs_cosine(em, threshold=0.25)
    return res.select("a", "b", F.round("sim", 6).alias("sim")).orderBy("a", "b")


@_l(
    "l14_label_centroids",
    """WITH u AS (SELECT label, u.i AS i, u.x::DOUBLE AS x FROM embeddings,
         (SELECT unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i) u),
       m AS (SELECT label, i, avg(x) AS mx FROM u GROUP BY 1,2)
       SELECT label, (SELECT count(*) FROM embeddings e WHERE e.label=m.label) AS n,
              round(sqrt(sum(mx*mx)), 6) AS centroid_norm
       FROM m GROUP BY label ORDER BY label""",
    note="per-label mean-embedding norm: the aggregation step of IVF/kmeans bucketing",
)
def l14(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = Catalog(spark, sf_dir).table("embeddings")
    # posexplode -> per-(label, dim) mean -> norm of the mean vector.
    # At scale this is the centroid computation of an IVF index build:
    # one shuffle on (label, dim), map-side combined.
    ex = em.select("label", F.posexplode("embedding").alias("i", "x")).withColumn(
        "x", F.col("x").cast("double")
    )
    m = ex.groupBy("label", "i").agg(F.avg("x").alias("mx"))
    counts = em.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    return (
        m.groupBy("label")
        .agg(F.round(F.sqrt(F.sum(F.col("mx") * F.col("mx"))), 6).alias("centroid_norm"))
        .join(F.broadcast(counts), "label")
        .select("label", "n", "centroid_norm")
        .orderBy("label")
    )


@_l(
    "l15_canonical_dedup",
    """WITH c AS (SELECT md5(lower(regexp_replace(trim(text), ' +', ' ', 'g'))) AS h
                 FROM documents)
       SELECT count(*) AS docs, count(DISTINCT h) AS distinct_canonical FROM c""",
    note="canonicalization (trim/lower/space-collapse) before exact dedup",
)
def l15(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    canon = F.md5(F.lower(F.regexp_replace(F.trim(F.col("text")), " +", " ")))
    return docs.select(canon.alias("h")).agg(
        F.count(F.lit(1)).alias("docs"), F.countDistinct("h").alias("distinct_canonical")
    )


@_l(
    "l16_regex_tokens",
    """SELECT lang,
       sum(len(regexp_extract_all(text, '[a-zA-Z0-9]+')))::BIGINT AS word_tokens,
       sum(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')))::BIGINT AS punct_tokens
       FROM documents GROUP BY 1 ORDER BY 1""",
    note="BPE-ish regex tokenization: word pieces + punctuation marks",
)
def l16(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.sum(F.size(F.regexp_extract_all("text", F.lit("[a-zA-Z0-9]+"), 0)))
            .cast("long")
            .alias("word_tokens"),
            F.sum(F.size(F.regexp_extract_all("text", F.lit("[^a-zA-Z0-9 ]"), 0)))
            .cast("long")
            .alias("punct_tokens"),
        )
        .orderBy("lang")
    )


@_l(
    "l18_hash_split",
    """WITH s AS (SELECT CASE
         WHEN strpos('0123456789abcdef', substring(md5(doc_id::VARCHAR), 1, 1)) - 1 < 13 THEN 'train'
         WHEN strpos('0123456789abcdef', substring(md5(doc_id::VARCHAR), 1, 1)) - 1 < 15 THEN 'valid'
         ELSE 'test' END AS split, n_chars
       FROM documents)
       SELECT split, count(*) AS docs, sum(n_chars)::BIGINT AS chars
       FROM s GROUP BY 1 ORDER BY 1""",
    note="deterministic train/valid/test assignment by id hash — the "
    "reproducible split every training pipeline needs; no RNG, stable "
    "under re-runs and engine changes",
)
def l18(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1), 16, 10).cast("int")
    )
    split = (
        F.when(bucket < 13, "train").when(bucket < 15, "valid").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("docs"), F.sum("n_chars").cast("long").alias("chars"))
        .orderBy("split")
    )


@_l(
    "l19_dedup_clusters",
    """WITH RECURSIVE docs AS (
         SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS l
         FROM documents WHERE doc_id < 100),
       sh AS (SELECT DISTINCT doc_id, s[1] || ' ' || s[2] AS shingle
              FROM (SELECT doc_id, unnest(list_zip(l, l[2:])) AS s FROM docs) z
              WHERE s[2] IS NOT NULL),
       sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
       inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
                 FROM sh a JOIN sh b ON a.shingle=b.shingle AND a.doc_id<b.doc_id
                 GROUP BY 1,2),
       pairs AS (SELECT a, b FROM inter
                 JOIN sizes sa ON sa.doc_id=a JOIN sizes sb ON sb.doc_id=b
                 WHERE i::DOUBLE/(sa.sz + sb.sz - i) >= 0.12),
       sym AS (SELECT a AS x, b AS y FROM pairs UNION SELECT b, a FROM pairs),
       nodes AS (SELECT DISTINCT x AS node FROM sym),
       reach(node, r) AS (
         SELECT node, node FROM nodes
         UNION
         SELECT e.y, reach.r FROM reach JOIN sym e ON reach.node=e.x)
       SELECT node AS doc_id, min(r)::BIGINT AS cluster FROM reach
       GROUP BY 1 ORDER BY 1""",
    note="end-to-end near-dup clustering: shingle-Jaccard candidate "
    "pairs (>= 0.12) closed into clusters via connected components — "
    "the dedup and graph layers composed",
)
def l19(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.algorithms import connected_components
    from ..graph.property_graph import PropertyGraph

    docs = Catalog(spark, sf_dir).table("documents").filter(F.col("doc_id") < 100)
    pairs = ngram_jaccard_pairs(docs, n=2).filter(F.col("jaccard") >= 0.12).select("a", "b")
    sym = pairs.union(pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    edges = sym.select(
        F.col("a").cast("string").alias("src"), F.col("b").cast("string").alias("dst")
    )
    nodes = edges.select(F.col("src").alias("id")).distinct()
    cc = connected_components(PropertyGraph(nodes, edges))
    # numeric doc ids: string-min != numeric-min, so relabel clusters by
    # the numeric minimum member
    num = cc.select(
        F.col("node").cast("long").alias("doc_id"), F.col("component").alias("comp_str")
    )
    relabel = num.groupBy("comp_str").agg(F.min("doc_id").alias("cluster"))
    return (
        num.join(F.broadcast(relabel), "comp_str")
        .select("doc_id", "cluster")
        .orderBy("doc_id")
    )


@_l(
    "m01_multimodal_features",
    """SELECT doc_id, 'text/plain' AS media_type,
       octet_length(encode(text))::BIGINT AS n_bytes, md5(text) AS checksum
       FROM documents ORDER BY doc_id""",
    note="payload plumbing via mapInPandas; codec step stubbed (no image libs in container)",
)
def m01(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    media = to_media_table(docs)
    return extract_features(media).select("doc_id", "media_type", "n_bytes", "checksum").orderBy(
        "doc_id"
    )


@_l(
    "m02_frame_sample",
    """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 50),
       fr AS (SELECT doc_id,
                     unnest(generate_series(0, (length(text)-1)//64)) AS frame_idx,
                     text
              FROM d),
       cut AS (SELECT doc_id, frame_idx,
                      substring(text, frame_idx*64 + 1, 64) AS frame
               FROM fr WHERE frame_idx % 2 = 0)
       SELECT doc_id, frame_idx::BIGINT AS frame_idx,
              length(frame)::BIGINT AS n_bytes, md5(frame) AS checksum
       FROM cut ORDER BY doc_id, frame_idx""",
    note="video-style frame sampling plumbing: payload split into 64-byte "
    "frames, every 2nd kept, one output row per frame via mapInPandas "
    "(codec step stubbed; ASCII fixture makes byte==char chunks "
    "SQL-reproducible)",
)
def m02(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import sample_frames

    docs = Catalog(spark, sf_dir).table("documents").filter(F.col("doc_id") < 50)
    media = to_media_table(docs)
    return sample_frames(media, frame_bytes=64, every=2).orderBy("doc_id", "frame_idx")


@_l(
    "l20_simhash_hamming",
    """WITH tok AS (
         SELECT DISTINCT doc_id, t.term FROM documents,
         unnest(string_split(text, ' ')) AS t(term) WHERE t.term <> ''),
       th AS (SELECT doc_id, md5(term) AS h FROM tok),
       digits AS (SELECT doc_id, i.i AS di,
                  strpos('0123456789abcdef', substring(h, (i.i+1)::INT, 1)) - 1 AS dv
                  FROM th CROSS JOIN range(16) i(i)),
       bits AS (SELECT doc_id, di, b.bi,
                CAST(floor(dv / power(2, b.bi)) AS BIGINT) % 2 AS bit
                FROM digits CROSS JOIN range(4) b(bi)),
       maj AS (SELECT doc_id, di, bi,
               CASE WHEN sum(bit*2 - 1) > 0 THEN 1 ELSE 0 END AS mbit
               FROM bits GROUP BY 1,2,3),
       dvals AS (SELECT doc_id, di, sum(mbit * CAST(power(2, bi) AS BIGINT))::BIGINT AS dval
                 FROM maj GROUP BY 1,2),
       halves AS (SELECT doc_id, CASE WHEN di < 8 THEN 1 ELSE 0 END AS half,
                  sum(dval * CAST(power(2, 4*(7 - di % 8)) AS BIGINT))::BIGINT AS hv
                  FROM dvals GROUP BY 1,2),
       hx AS (SELECT doc_id, half, lpad(lower(to_hex(hv)), 8, '0') AS hs FROM halves),
       sigs AS MATERIALIZED (
         SELECT doc_id, max(CASE WHEN half=1 THEN hs END) || max(CASE WHEN half=0 THEN hs END) AS sim
         FROM hx GROUP BY 1),
       bands AS (SELECT doc_id, b.b AS band, substring(sim, (b.b*4+1)::INT, 4) AS bk
                 FROM sigs CROSS JOIN range(4) b(b)),
       cand AS (SELECT DISTINCT a.doc_id i, b.doc_id j FROM bands a JOIN bands b
                ON a.band=b.band AND a.bk=b.bk AND a.doc_id<b.doc_id),
       dig AS (SELECT doc_id, i.i AS di,
               strpos('0123456789abcdef', substring(sim, (i.i+1)::INT, 1)) - 1 AS dv
               FROM sigs CROSS JOIN range(16) i(i)),
       ham AS (SELECT c.i, c.j, sum(bit_count(xor(a.dv, b.dv)))::BIGINT AS hd
               FROM cand c JOIN dig a ON a.doc_id=c.i JOIN dig b ON b.doc_id=c.j AND b.di=a.di
               GROUP BY 1,2)
       SELECT i, j, hd FROM ham WHERE hd <= 2 ORDER BY 1, 2""",
    note="SimHash LSH banding (4x16-bit bands, equi-join on band key — "
    "never a cross join) + exact hamming filter on candidates; "
    "pigeonhole guarantees full recall at distance <= 3",
)
def l20(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import simhash_hamming_pairs

    docs = Catalog(spark, sf_dir).table("documents")
    return simhash_hamming_pairs(docs, max_distance=2).orderBy("i", "j")


@_l(
    "l21_embed_quantize",
    """SELECT vec_id,
       round(CAST(list_min(embedding) AS DOUBLE), 6) AS mn,
       round(CAST(list_max(embedding) AS DOUBLE), 6) AS mx,
       list_aggregate(list_transform(embedding,
         x -> CAST(floor((CAST(x AS DOUBLE) - CAST(list_min(embedding) AS DOUBLE))
              * 255.0 / (CAST(list_max(embedding) AS DOUBLE) - CAST(list_min(embedding) AS DOUBLE))
              + 0.5) AS BIGINT)), 'sum')::BIGINT AS qsum
       FROM embeddings
       WHERE vec_id < 100 AND list_max(embedding) > list_min(embedding)
       ORDER BY vec_id""",
    note="int8 scalar quantization of embeddings (per-vector min/max "
    "range, floor(x*255/range + 0.5) codes — the HALF_UP-stable rounding "
    "form): the memory-compression path that makes ANN shards 4x "
    "smaller at 100 TB; qsum checksums all 128 codes per vector",
)
def l21(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).table("embeddings").filter(F.col("vec_id") < 100)
    mn = F.expr("CAST(array_min(embedding) AS DOUBLE)")
    mx = F.expr("CAST(array_max(embedding) AS DOUBLE)")
    qsum = F.expr(
        "aggregate(transform(embedding,"
        " x -> CAST(floor((CAST(x AS DOUBLE) - CAST(array_min(embedding) AS DOUBLE))"
        " * 255.0 / (CAST(array_max(embedding) AS DOUBLE) - CAST(array_min(embedding) AS DOUBLE))"
        " + 0.5) AS BIGINT)), 0L, (a, x) -> a + x)"
    )
    return (
        e.filter(mx > mn)
        .select(
            "vec_id",
            F.round(mn, 6).alias("mn"),
            F.round(mx, 6).alias("mx"),
            qsum.alias("qsum"),
        )
        .orderBy("vec_id")
    )


@_l(
    "l22_quality_quartiles",
    """WITH ranked AS (SELECT lang, doc_id, length(text) AS n,
         ntile(4) OVER (PARTITION BY lang ORDER BY length(text), doc_id) AS q
         FROM documents)
       SELECT lang, q::INT AS quartile, count(*)::BIGINT AS docs,
              floor(avg(n)*100 + 0.5)/100 AS avg_len
       FROM ranked GROUP BY 1,2 ORDER BY 1,2""",
    note="per-language length-quartile bucketing (ntile with a doc_id "
    "tie-break for determinism) — the data-mixing / sampling-weight "
    "shape for corpus curation; floor-form rounding on the int-ratio "
    "average",
)
def l22(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = Catalog(spark, sf_dir).table("documents")
    w = Window.partitionBy("lang").orderBy(F.length("text"), F.col("doc_id"))
    ranked = docs.select(
        "lang", "doc_id", F.length("text").alias("n"), F.ntile(4).over(w).alias("quartile")
    )
    return (
        ranked.groupBy("lang", "quartile")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            (F.floor(F.avg("n") * 100 + F.lit(0.5)) / 100).alias("avg_len"),
        )
        .orderBy("lang", "quartile")
    )


@_l(
    "l23_repetition_ratio",
    """WITH tok AS (SELECT doc_id, t.term FROM documents,
         unnest(string_split(text, ' ')) AS t(term)
         WHERE doc_id < 200 AND t.term <> ''),
       cnt AS (SELECT doc_id, term, count(*) AS c FROM tok GROUP BY 1,2),
       agg AS (SELECT doc_id, sum(c)::BIGINT AS n_terms, max(c)::BIGINT AS top_c
               FROM cnt GROUP BY 1)
       SELECT doc_id, n_terms, top_c,
              floor(top_c*10000.0/n_terms + 0.5)/10000 AS rep_ratio
       FROM agg ORDER BY doc_id""",
    note="Gopher-style repetition quality signal: share of the most "
    "frequent token per document (ratio of ints, floor-form rounding) — "
    "high values flag boilerplate/spam for corpus filtering",
)
def l23(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import tokens

    docs = Catalog(spark, sf_dir).table("documents").filter(F.col("doc_id") < 200)
    cnt = tokens(docs).groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("c"))
    agg = cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_terms"), F.max("c").alias("top_c")
    )
    return agg.select(
        "doc_id",
        "n_terms",
        "top_c",
        (F.floor(F.col("top_c") * 10000.0 / F.col("n_terms") + F.lit(0.5)) / 10000).alias(
            "rep_ratio"
        ),
    ).orderBy("doc_id")


@_l(
    "l24_regex_scrub",
    """SELECT event_type,
       sum(len(regexp_extract_all(props, '[0-9]+')))::BIGINT AS n_runs,
       sum(length(props)
           - length(regexp_replace(props, '[0-9]+', '#', 'g')))::BIGINT
         AS delta_chars,
       count(DISTINCT regexp_replace(props, '[0-9]+', '#', 'g'))::BIGINT
         AS n_shapes
       FROM events GROUP BY 1 ORDER BY 1""",
    note="regex PII-scrub shape over the JSON payload: detect numeric "
    "runs (regexp_extract_all), redact them (global regexp_replace), "
    "and count the distinct redacted 'shapes' — all JVM-side codegen "
    "regex, no UDF; the masked-cardinality column is the standard "
    "pre-anonymization structure check in training-data pipelines",
)
def l24(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    masked = F.regexp_replace(F.col("props"), "[0-9]+", "#")
    return (
        ev.groupBy("event_type")
        .agg(
            F.sum(F.size(F.expr("regexp_extract_all(props, '[0-9]+', 0)"))).alias(
                "n_runs"
            ),
            F.sum(F.length("props") - F.length(masked)).alias("delta_chars"),
            F.countDistinct(masked).alias("n_shapes"),
        )
        .orderBy("event_type")
    )


@_l(
    "l25_stratified_sample",
    """WITH s AS (SELECT lang, n_chars,
         (strpos('0123456789abcdef', substring(md5(doc_id::VARCHAR), 1, 1)) - 1) * 16
         + strpos('0123456789abcdef', substring(md5(doc_id::VARCHAR), 2, 1)) - 1 AS b
       FROM documents),
       r AS (SELECT lang, n_chars,
               b < CASE lang WHEN 'en' THEN 128 WHEN 'zh' THEN 192 ELSE 256 END AS keep
             FROM s)
       SELECT lang, count(*)::BIGINT AS total,
              (count(*) FILTER (WHERE keep))::BIGINT AS kept,
              coalesce(sum(n_chars) FILTER (WHERE keep), 0)::BIGINT AS kept_chars
       FROM r GROUP BY 1 ORDER BY 1""",
    note="deterministic stratified down-sampling for data mixing: "
    "per-language keep rates (en 50%, zh 75%, rest 100%) applied via an "
    "id-hash uniform in [0,256) — no RNG, identical sample under "
    "re-runs, engine changes, and partitioning changes; the language-"
    "rebalancing primitive of every multilingual pretraining mix",
)
def l25(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10
    ).cast("int")
    thr = (
        F.when(F.col("lang") == "en", 128)
        .when(F.col("lang") == "zh", 192)
        .otherwise(256)
    )
    r = docs.select("lang", "n_chars", (bucket < thr).alias("keep"))
    return (
        r.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.count_if(F.col("keep")).alias("kept"),
            F.coalesce(F.sum(F.when(F.col("keep"), F.col("n_chars"))), F.lit(0)).alias(
                "kept_chars"
            ),
        )
        .orderBy("lang")
    )


@_l(
    "l26_contamination",
    """WITH d AS (SELECT doc_id, lang,
         CASE WHEN strpos('0123456789abcdef',
                substring(md5(doc_id::VARCHAR), 1, 1)) - 1 < 13 THEN 'train'
              WHEN strpos('0123456789abcdef',
                substring(md5(doc_id::VARCHAR), 1, 1)) - 1 < 15 THEN 'valid'
              ELSE 'test' END AS split,
         list_filter(string_split(text, ' '), x -> x <> '') AS l
       FROM documents),
       g AS (SELECT doc_id, lang, split, array_to_string(l[t.i:t.i+4], ' ') AS gram
             FROM d, UNNEST(generate_series(1, greatest(len(l) - 4, 0))) AS t(i)),
       train_g AS (SELECT DISTINCT gram FROM g WHERE split = 'train'),
       test_doc AS (SELECT DISTINCT doc_id, lang FROM g WHERE split = 'test'),
       contam AS (SELECT DISTINCT t.doc_id FROM g t
                  JOIN train_g USING (gram) WHERE t.split = 'test')
       SELECT lang, count(*)::BIGINT AS n_test,
              (count(*) FILTER (WHERE doc_id IN (SELECT doc_id FROM contam)))::BIGINT
                AS n_contaminated
       FROM test_doc GROUP BY 1 ORDER BY 1""",
    note="train/test contamination check: a test doc is contaminated if "
    "it shares any 5-gram word shingle with the train split (splits = "
    "l18's deterministic id-hash rule) — distinct-shingle semi-join, "
    "the eval-integrity gate every pretraining pipeline needs; shingle "
    "tables stay (gram, doc) pairs, never materialized per-doc lists",
)
def l26(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1), 16, 10
    ).cast("int")
    split = F.when(bucket < 13, "train").when(bucket < 15, "valid").otherwise("test")
    d = docs.select(
        "doc_id",
        "lang",
        split.alias("split"),
        F.expr("filter(split(text, ' '), x -> x <> '')").alias("l"),
    )
    g = d.select(
        "doc_id",
        "lang",
        "split",
        F.explode(
            F.expr(
                "CASE WHEN size(l) >= 5 THEN transform(sequence(1, size(l)-4),"
                " i -> array_join(slice(l, i, 5), ' ')) ELSE array() END"
            )
        ).alias("gram"),
    )
    train_g = g.filter(F.col("split") == "train").select("gram").distinct()
    test_g = g.filter(F.col("split") == "test")
    contam = (
        test_g.join(train_g, "gram", "left_semi").select("doc_id").distinct()
        .withColumn("c", F.lit(1))
    )
    test_doc = test_g.select("doc_id", "lang").distinct()
    return (
        test_doc.join(contam, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.count_if(F.col("c").isNotNull()).alias("n_contaminated"),
        )
        .orderBy("lang")
    )


@_l(
    "l27_char_trigrams",
    """WITH grams AS (
       SELECT d.lang, substring(d.text, CAST(t.i AS INT), 3) AS g
       FROM documents d JOIN generate_series(1, 4096) t(i)
         ON t.i <= length(d.text) - 2),
       cnt AS (SELECT lang, g, count(*) AS n FROM grams GROUP BY 1,2)
       SELECT lang, g, CAST(n AS BIGINT) AS n FROM cnt
       QUALIFY row_number() OVER (PARTITION BY lang ORDER BY n DESC, g) <= 5
       ORDER BY lang, n DESC, g""",
    note="character-trigram profile per language (the n-gram language-ID "
    "/ boilerplate-detection basis).  Spark side expands per row with a "
    "sequence+transform lambda (no UDF, no crossJoin); oracle cannot "
    "lateral-correlate generate_series so it bounds the series at 4096 "
    "(> max n_chars at every sf, re-check in FIXTURES.md) and filters",
)
def l27(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    grams = d.select(
        "lang",
        F.explode(
            F.expr(
                "CASE WHEN length(text) >= 3 THEN transform(sequence(1, length(text)-2),"
                " i -> substring(text, i, 3)) ELSE array() END"
            )
        ).alias("g"),
    )
    cnt = grams.groupBy("lang", "g").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("g"))
    return (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("lang", "g", "n")
        .orderBy("lang", F.col("n").desc(), "g")
    )


@_l(
    "l28_sequence_pack",
    """WITH toks AS (
       SELECT doc_id, lang,
         length(text) - length(replace(text, ' ', '')) + 1 AS n_tok
       FROM documents),
       packed AS (
       SELECT doc_id, lang, n_tok,
         CAST(floor((sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id) - 1)
              / 512) AS BIGINT) AS pack_id
       FROM toks)
       SELECT lang, pack_id, count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS pack_tokens
       FROM packed GROUP BY 1,2 ORDER BY 1,2""",
    note="token-budget sequence packing: docs are assigned to 512-token "
    "packs by running token count per language (deterministic doc_id "
    "order) — the context-window packing step of a pretraining mix.  "
    "One window pass + one groupBy; at 100 TB partition by lang and "
    "date-bucket so the cumsum window never sees a monster partition",
)
def l28(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import pack_sequences

    d = Catalog(spark, sf_dir).table("documents")
    packed = pack_sequences(d, budget=512)
    return (
        packed.groupBy("lang", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("pack_tokens"),
        )
        .orderBy("lang", "pack_id")
    )


@_l(
    "l29_unigram_surprisal",
    """WITH tok AS (SELECT doc_id, lang, unnest(string_split(text,' ')) AS term
       FROM documents),
       tf AS (SELECT term, count(*) AS c FROM tok WHERE term<>'' GROUP BY 1),
       n AS (SELECT count(*) AS total FROM tok WHERE term<>''),
       s AS (SELECT t.doc_id, t.lang,
             round(avg(-ln(tf.c*1.0/(SELECT total FROM n))),4) AS surprisal
             FROM tok t JOIN tf ON t.term=tf.term WHERE t.term<>'' GROUP BY 1,2)
       SELECT doc_id, lang, surprisal FROM s WHERE doc_id < 50 ORDER BY doc_id""",
    note="corpus-unigram surprisal per document (mean -ln p(term)) — the "
    "cheap perplexity proxy for quality filtering: low = repetitive "
    "boilerplate, high = rare-token noise.  One explode + one term-freq "
    "aggregate + one equi-join back; the corpus total is a driver-side "
    "scalar (aggregate, not data).  At 100 TB the tf table is the "
    "shared artifact: compute once, broadcast-join per shard",
)
def l29(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import unigram_surprisal

    d = Catalog(spark, sf_dir).table("documents")
    s = unigram_surprisal(d)
    return (
        s.join(d.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", F.round("surprisal", 4).alias("surprisal"))
        .filter(F.col("doc_id") < 50)
        .orderBy("doc_id")
    )


@_l(
    "m03_window_chunks",
    """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 50),
       wi AS (SELECT doc_id,
                     unnest(generate_series(0, (length(text)-1)//32)) AS win_idx,
                     text FROM d),
       cut AS (SELECT doc_id, win_idx,
                      substring(text, win_idx*32 + 1, 64) AS win FROM wi)
       SELECT doc_id, win_idx::BIGINT AS win_idx,
              length(win)::BIGINT AS n_bytes, md5(win) AS checksum
       FROM cut ORDER BY doc_id, win_idx""",
    note="audio-style overlapping window chunking (64-byte windows, "
    "32-byte hop — the STFT frame shape): 1->N mapInPandas over the "
    "pruned (id, payload) projection, codec/FFT step stubbed, chunk "
    "checksums keep the plumbing oracle-checkable (ASCII fixture makes "
    "byte==char reproducible in SQL)",
)
def m03(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import window_chunks

    docs = Catalog(spark, sf_dir).table("documents").filter(F.col("doc_id") < 50)
    media = to_media_table(docs)
    return window_chunks(media, window_bytes=64, hop=32).orderBy("doc_id", "win_idx")


@_l(
    "l30_minhash_calibration",
    """WITH tok AS (SELECT DISTINCT d.doc_id, t.term FROM documents d,
         unnest(string_split(d.text,' ')) AS t(term)
         WHERE t.term<>'' AND d.doc_id < 12),
       sigs AS (SELECT doc_id, i.i AS i, min(md5(i.i || ':' || term)) AS sig
                FROM tok CROSS JOIN range(16) i(i) GROUP BY 1,2),
       est AS (SELECT a.doc_id AS i, b.doc_id AS j,
               round(sum(CASE WHEN a.sig=b.sig THEN 1 ELSE 0 END)/16.0, 4) AS est_j
               FROM sigs a JOIN sigs b ON a.i=b.i AND a.doc_id<b.doc_id
               GROUP BY 1,2),
       nt AS (SELECT doc_id, count(*) AS c FROM tok GROUP BY 1),
       tj AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS inter
              FROM tok a JOIN tok b ON a.term=b.term AND a.doc_id<b.doc_id
              GROUP BY 1,2)
       SELECT e.i, e.j, e.est_j,
       round(coalesce(t.inter*1.0/(na.c + nb.c - t.inter), 0.0), 4) AS true_j
       FROM est e
       JOIN nt na ON na.doc_id=e.i JOIN nt nb ON nb.doc_id=e.j
       LEFT JOIN tj t ON t.i=e.i AND t.j=e.j
       ORDER BY 1,2""",
    note="MinHash estimator calibration: k=16 signature-collision rate "
    "(l02's exact md5 scheme) side-by-side with true token-set Jaccard "
    "for every pair in a 12-doc probe — the query a pipeline owner runs "
    "to pick k and the LSH banding threshold.  True Jaccard comes from "
    "an inverted-index pair join (|intersection| via term equi-join, "
    "union by inclusion-exclusion), never a quadratic set comparison",
)
def l30(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_signatures, tokens

    d = Catalog(spark, sf_dir).table("documents").filter(F.col("doc_id") < 12)
    tok = tokens(d).distinct()
    sigs = minhash_signatures(d, k=16)
    a = sigs.select(F.col("doc_id").alias("i"), F.col("i").alias("idx"), F.col("sig").alias("sa"))
    b = sigs.select(F.col("doc_id").alias("j"), F.col("i").alias("idx"), F.col("sig").alias("sb"))
    est = (
        a.join(b, "idx")
        .filter(F.col("i") < F.col("j"))
        .groupBy("i", "j")
        .agg(
            F.round(
                F.sum(F.when(F.col("sa") == F.col("sb"), 1).otherwise(0)) / 16.0, 4
            ).alias("est_j")
        )
    )
    nt = tok.groupBy(F.col("doc_id").alias("d")).agg(F.count(F.lit(1)).alias("c"))
    ta = tok.select(F.col("doc_id").alias("i"), "term")
    tb = tok.select(F.col("doc_id").alias("j"), "term")
    tj = (
        ta.join(tb, "term")
        .filter(F.col("i") < F.col("j"))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = nt.select(F.col("d").alias("i"), F.col("c").alias("ca"))
    nb = nt.select(F.col("d").alias("j"), F.col("c").alias("cb"))
    return (
        est.join(na, "i")
        .join(nb, "j")
        .join(tj, ["i", "j"], "left")
        .select(
            "i",
            "j",
            "est_j",
            F.round(
                F.coalesce(
                    F.col("inter") * 1.0 / (F.col("ca") + F.col("cb") - F.col("inter")),
                    F.lit(0.0),
                ),
                4,
            ).alias("true_j"),
        )
        .orderBy("i", "j")
    )


@_l(
    "l31_dedup_keep_rate",
    """SELECT lang, source, count(*) AS total,
       count(DISTINCT md5(text)) AS kept,
       round(count(DISTINCT md5(text))*1.0/count(*), 4) AS keep_rate
       FROM documents GROUP BY 1,2 ORDER BY 1,2""",
    note="exact-dedup keep rate per (lang, source) — the dashboard read "
    "that decides which sources are worth crawling.  One distinct-agg "
    "pass; at 100 TB the md5 goes through a first-stage partial "
    "distinct before the (lang, source) combine",
)
def l31(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    kept = F.countDistinct(F.md5("text"))
    return (
        d.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("total"),
            kept.alias("kept"),
            F.round(kept * 1.0 / F.count(F.lit(1)), 4).alias("keep_rate"),
        )
        .orderBy("lang", "source")
    )


@_l(
    "l32_pack_efficiency",
    """WITH toks AS (SELECT doc_id, lang,
       length(text) - length(replace(text,' ','')) + 1 AS n_tok FROM documents),
       packed AS (SELECT lang, n_tok,
       CAST(floor((sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id) - 1)
            / 512) AS BIGINT) AS pack_id FROM toks),
       packs AS (SELECT lang, pack_id, sum(n_tok) AS tok FROM packed GROUP BY 1,2)
       SELECT lang, count(*) AS n_packs,
       round(avg(tok/512.0), 4) AS avg_fill,
       CAST(min(tok) AS BIGINT) AS min_tok, CAST(max(tok) AS BIGINT) AS max_tok
       FROM packs GROUP BY 1 ORDER BY 1""",
    note="packing-efficiency audit over l28's packs: average fill rate "
    "against the 512-token budget plus min/max pack sizes per language "
    "— the waste metric that decides whether to re-order or split "
    "documents before packing",
)
def l32(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import pack_sequences

    d = Catalog(spark, sf_dir).table("documents")
    packs = (
        pack_sequences(d, budget=512)
        .groupBy("lang", "pack_id")
        .agg(F.sum("n_tok").alias("tok"))
    )
    return (
        packs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_packs"),
            F.round(F.avg(F.col("tok") / 512.0), 4).alias("avg_fill"),
            F.min("tok").cast("long").alias("min_tok"),
            F.max("tok").cast("long").alias("max_tok"),
        )
        .orderBy("lang")
    )


_LETTERS = "abcdefghijklmnopqrstuvwxyz"


@_l(
    "l33_char_entropy",
    f"""WITH letters AS (SELECT unnest([{", ".join("'" + ch + "'" for ch in _LETTERS)}]) AS ch),
       cnt AS (SELECT doc_id, lang, ch,
         length(text) - length(replace(text, ch, '')) AS c
         FROM documents CROSS JOIN letters),
       tot AS (SELECT doc_id, sum(c) AS t FROM cnt GROUP BY 1),
       ent AS (SELECT cnt.doc_id, cnt.lang,
         round(-sum(CASE WHEN c > 0 THEN (c / t) * log2(c / t) ELSE 0 END), 4) AS h
         FROM cnt JOIN tot ON cnt.doc_id = tot.doc_id GROUP BY 1, 2)
       SELECT lang, round(avg(h), 4) AS avg_entropy, count(*) AS n_docs
       FROM ent GROUP BY 1 ORDER BY 1""",
    note="per-document Shannon entropy over the letter distribution, "
    "averaged per language — the gibberish / low-diversity filter a "
    "pretraining pipeline runs.  Letter counts come from the "
    "length-minus-replace trick so the whole thing stays in "
    "whole-stage codegen (no explode of the text into characters, no "
    "UDF); the 26-term entropy fold is a fixed-order F.aggregate over "
    "a literal array, so summation order is deterministic.  Per-doc "
    "work is embarrassingly parallel — no shuffle until the final "
    "per-lang avg over one row per doc",
)
def l33(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    letters = F.array(*[F.lit(ch) for ch in _LETTERS])
    cnts = F.transform(
        letters,
        lambda ch: F.length("text") - F.length(F.replace(F.col("text"), ch, F.lit(""))),
    )
    d = d.withColumn("cnts", cnts).withColumn(
        "t", F.aggregate("cnts", F.lit(0), lambda a, c: a + c).cast("double")
    )
    ent = F.round(
        -F.aggregate(
            F.filter("cnts", lambda c: c > 0),
            F.lit(0.0),
            lambda acc, c: acc + (c / F.col("t")) * F.log2(c / F.col("t")),
        ),
        4,
    )
    return (
        d.select("lang", ent.alias("h"))
        .groupBy("lang")
        .agg(
            F.round(F.avg("h"), 4).alias("avg_entropy"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy("lang")
    )


@_l(
    "l34_zipf_slope",
    """WITH w AS (SELECT lang, unnest(string_split(text, ' ')) AS term
         FROM documents),
       cnt AS (SELECT lang, term, count(*) AS n FROM w
               WHERE term <> '' GROUP BY 1, 2),
       rk AS (SELECT lang, n, row_number() OVER
                (PARTITION BY lang ORDER BY n DESC, term) AS r FROM cnt)
       SELECT lang, round(regr_slope(ln(n), ln(r)), 4) AS zipf_slope,
         count(*) AS n_terms
       FROM rk WHERE r <= 100 GROUP BY 1 ORDER BY 1""",
    note="Zipf rank-frequency slope per language: OLS of ln(freq) on "
    "ln(rank) over the top-100 terms — the corpus-health diagnostic "
    "(natural text sits near -1; word-soup or boilerplate-heavy "
    "corpora flatten).  Term counting is the standard two-level "
    "map-side-combined agg; ranking windows over the tiny per-lang "
    "vocabulary; regr_slope is a builtin single-pass aggregate in "
    "both engines",
)
def l34(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    terms = d.select("lang", F.explode(F.split("text", " ")).alias("term")).filter(
        F.col("term") != ""
    )
    cnt = terms.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("term"))
    rk = cnt.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= 100)
    return (
        rk.groupBy("lang")
        .agg(
            F.round(F.expr("regr_slope(ln(n), ln(r))"), 4).alias("zipf_slope"),
            F.count(F.lit(1)).alias("n_terms"),
        )
        .orderBy("lang")
    )


def _kmeans_chain(k: int = 8, iters: int = 3, dim: int = 64) -> tuple[str, str]:
    """Unrolled Lloyd iterations as a CTE chain: per iteration one
    cross-join argmin (row_number tie-broken on (dist, cid)) and one
    unnest-by-dimension centroid mean, mirroring the operator's update
    schedule exactly (`iters` assignments, `iters - 1` updates).
    Returns (cte_block, final_assignment_cte_name); the chain also
    exposes `e(vec_id, v)` for downstream vector math."""
    diff = f"list_transform(range(1, {dim + 1}), j -> e.v[j] - i.c[j])"
    parts = [
        f"""init AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
       embedding::DOUBLE[] AS c FROM embeddings ORDER BY vec_id LIMIT {k}),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)"""
    ]
    prev_c = "init"
    for it in range(1, iters + 1):
        parts.append(
            f"""d{it} AS (SELECT e.vec_id, i.cid,
       list_inner_product({diff}, {diff}) AS dist
       FROM e CROSS JOIN {prev_c} i),
s{it} AS (SELECT vec_id, cid, dist FROM (SELECT *, row_number() OVER
       (PARTITION BY vec_id ORDER BY dist, cid) AS rk FROM d{it}) WHERE rk = 1)"""
        )
        if it < iters:
            parts.append(
                f"""c{it} AS (SELECT cid, list(av ORDER BY dim) AS c FROM (
       SELECT s.cid, j.j AS dim, avg(e.v[j.j]) AS av
       FROM s{it} s JOIN e ON e.vec_id = s.vec_id
       CROSS JOIN (SELECT unnest(range(1, {dim + 1})) AS j) j
       GROUP BY 1, 2) GROUP BY 1)"""
            )
            prev_c = f"c{it}"
    return ",\n".join(parts), f"s{iters}"


def _kmeans_oracle(k: int = 8, iters: int = 3, dim: int = 64) -> str:
    chain, final = _kmeans_chain(k, iters, dim)
    return (
        f"WITH {chain}\n"
        f"SELECT CAST(cid AS INT) AS cluster_id, count(*) AS n, round(sum(dist), 2) AS inertia\n"
        f"FROM {final} GROUP BY 1 ORDER BY 1"
    )


@_l(
    "l35_kmeans",
    _kmeans_oracle(),
    note="distributed Lloyd's k-means over the embedding column "
    "(k=8, 3 assignment rounds, deterministic lowest-id seeds and "
    "(dist, cid) tie-break): broadcast cross-join + codegen fold for "
    "squared distance, posexplode dimension-mean for the update — "
    "the IVF training step as a first-class op.  The oracle unrolls "
    "the same schedule in SQL (argmin via row_number, unnest-mean).  "
    "Cross-engine float drift is ~1e-13 on squared distances (both "
    "engines fold in double) — far from any assignment tie, and "
    "inertia is rounded at 2dp, so the hash match is stable",
)
def l35(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import kmeans_lloyd

    emb = Catalog(spark, sf_dir).table("embeddings")
    assigned = kmeans_lloyd(emb, k=8, iters=3)
    return (
        assigned.groupBy(F.col("cid").cast("int").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("dist"), 2).alias("inertia"),
        )
        .orderBy("cluster_id")
    )


@_l(
    "l36_bigram_perplexity",
    """WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS l
         FROM documents),
       bg AS (SELECT doc_id, lang, l[i] AS w1, l[i+1] AS w2
              FROM d, unnest(range(1, len(l))) t(i)),
       c12 AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2),
       c1 AS (SELECT w1, count(*) AS c FROM bg GROUP BY 1),
       v AS (SELECT count(DISTINCT w1) AS v FROM
             (SELECT w1 FROM bg UNION ALL SELECT w2 FROM bg)),
       sc AS (SELECT b.doc_id, b.lang,
               -log2((c12.c + 1.0) / (c1.c + v.v)) AS bits
              FROM bg b JOIN c12 ON b.w1 = c12.w1 AND b.w2 = c12.w2
              JOIN c1 ON b.w1 = c1.w1 CROSS JOIN v),
       pd AS (SELECT doc_id, lang, round(avg(bits), 4) AS h
              FROM sc GROUP BY 1, 2)
       SELECT lang, round(avg(h), 4) AS avg_bits, count(*) AS n_docs
       FROM pd GROUP BY 1 ORDER BY 1""",
    note="bigram language-model perplexity (Laplace-smoothed, bits per "
    "bigram) per language — the classic model-based pretraining "
    "quality filter, self-trained on the corpus being scored.  "
    "Bigrams come from a transform-over-slice expression (no "
    "self-join on position); the model 'training' is two combinable "
    "counts.  At 100 TB the unigram table broadcasts, the bigram "
    "count join shuffles on w1 — bucket the token stream by w1 to "
    "co-locate it; Laplace smoothing keeps unseen pairs finite so "
    "scoring a HELD-OUT doc against this model is the same join",
)
def l36(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    d = docs.select("doc_id", "lang", F.split("text", " ").alias("l"))
    bg = d.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(slice(l, 1, size(l) - 1),"
                " (w, i) -> struct(w AS w1, element_at(l, i + 2) AS w2))"
            )
        ).alias("p"),
    ).select("doc_id", "lang", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    v = bg.select(F.col("w1").alias("w")).unionAll(
        bg.select(F.col("w2").alias("w"))
    ).agg(F.countDistinct("w").alias("v"))
    sc = (
        bg.join(c12, ["w1", "w2"])
        .join(F.broadcast(c1), "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            "lang",
            (-F.log2((F.col("c12") + 1.0) / (F.col("c1") + F.col("v")))).alias("bits"),
        )
    )
    pd_ = sc.groupBy("doc_id", "lang").agg(F.round(F.avg("bits"), 4).alias("h"))
    return (
        pd_.groupBy("lang")
        .agg(F.round(F.avg("h"), 4).alias("avg_bits"), F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang")
    )


@_l(
    "l37_mixing_rates",
    """WITH tok AS (SELECT lang, sum(len(string_split(text, ' '))) AS tokens
         FROM documents GROUP BY 1),
       tot AS (SELECT sum(tokens) AS t FROM tok),
       tgt AS (SELECT lang, CAST(target AS DOUBLE) AS target FROM (VALUES
         ('en', 0.4), ('de', 0.15), ('es', 0.15), ('fr', 0.15), ('zh', 0.15))
         v(lang, target)),
       j AS (SELECT tok.lang, tokens, tokens / tot.t AS share, tgt.target
             FROM tok CROSS JOIN tot JOIN tgt USING (lang))
       SELECT lang, CAST(tokens AS BIGINT) AS tokens, round(share, 4) AS share,
         target, round(least(1.0, target / share), 4) AS sample_rate
       FROM j ORDER BY 1""",
    note="training-data mixture planning: per-language token counts vs "
    "a target mix, yielding per-language downsampling rates "
    "(min(1, target/actual) — over-represented sources get sampled "
    "down, under-represented keep everything; upsampling is a "
    "separate epoch-weighting decision).  One combinable token count, "
    "scalar total broadcast back, 5-row literal target join — the "
    "whole mixture plan costs one corpus scan",
)
def l37(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    tok = d.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " "))).alias("tokens")
    )
    tot = tok.agg(F.sum("tokens").alias("t"))
    tgt = d.sparkSession.createDataFrame(
        [("en", 0.4), ("de", 0.15), ("es", 0.15), ("fr", 0.15), ("zh", 0.15)],
        ["lang", "target"],
    )
    share = F.col("tokens") / F.col("t")
    return (
        tok.crossJoin(F.broadcast(tot))
        .join(F.broadcast(tgt), "lang")
        .select(
            "lang",
            F.col("tokens").cast("long").alias("tokens"),
            F.round(share, 4).alias("share"),
            "target",
            F.round(F.least(F.lit(1.0), F.col("target") / share), 4).alias("sample_rate"),
        )
        .orderBy("lang")
    )


def _coverage_oracle(k: int = 5) -> str:
    """Unrolled greedy max-coverage: per step, the doc adding the most
    uncovered trigrams (ties -> lowest doc_id) joins the set."""
    steps = []
    for i in range(1, k + 1):
        cov = f"(SELECT g3 FROM cov{i-1})" if i > 1 else "(SELECT NULL AS g3 WHERE false)"
        carry = f"UNION SELECT g3 FROM cov{i-1}" if i > 1 else ""
        steps.append(
            f"""gain{i} AS (SELECT doc_id, count(*) AS g FROM tok
  WHERE g3 NOT IN {cov} GROUP BY 1),
pick{i} AS (SELECT doc_id, g FROM gain{i} ORDER BY g DESC, doc_id LIMIT 1),
cov{i} AS (SELECT DISTINCT g3 FROM tok
  WHERE doc_id IN (SELECT doc_id FROM pick{i}) {carry})"""
        )
        # noqa: trailing space intentional in carry-less branch
    unions = "".join(
        f" UNION ALL SELECT {i}, doc_id, g FROM pick{i}" for i in range(2, k + 1)
    )
    return (
        """WITH tok AS (SELECT DISTINCT doc_id, substring(text, i.i, 3) AS g3
  FROM documents, unnest(range(1, length(text) - 1)) i(i)
  WHERE length(text) >= 3),\n"""
        + ",\n".join(steps)
        + "\nSELECT CAST(1 AS INT) AS step, doc_id, g AS new_grams FROM pick1"
        + unions
        + " ORDER BY 1"
    )


@_l(
    "l38_greedy_coverage",
    _coverage_oracle(),
    note="greedy max-coverage exemplar selection (facility-location "
    "submodular curation): pick 5 docs maximizing NEW character-"
    "trigram coverage at each step — the diverse-subset read a data-"
    "curation pipeline runs to seed eval sets.  Greedy selection is "
    "inherently sequential in k, but each step's marginal-gain "
    "computation is fully distributed (anti-join vs the covered set "
    "+ combinable count); k is small by design (1-1/e guarantee).  "
    "Marginal gains decrease monotonically — the submodularity "
    "signature (203/49/35/24/18 at sf0.01)",
)
def l38(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents").filter(F.length("text") >= 3)
    tok = (
        d.select(
            "doc_id",
            F.expr("explode(sequence(1, length(text) - 2))").alias("i"),
            "text",
        )
        .select("doc_id", F.expr("substring(text, i, 3)").alias("g3"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    covered = None
    out = []
    for step in range(1, 6):
        remaining = (
            tok
            if covered is None
            else tok.join(F.broadcast(covered), "g3", "left_anti")
        )
        best = (
            remaining.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("g"))
            .orderBy(F.desc("g"), F.asc("doc_id"))
            .limit(1)
            .collect()
        )[0]
        out.append((step, best["doc_id"], best["g"]))
        new_cov = tok.filter(F.col("doc_id") == best["doc_id"]).select("g3")
        covered = (
            new_cov
            if covered is None
            else covered.unionByName(new_cov).distinct()
        ).localCheckpoint(eager=True)
    return (
        d.sparkSession.createDataFrame(out, "step int, doc_id long, new_grams long")
        .orderBy("step")
    )


@_l(
    "m04_av_align",
    """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 50),
       vf AS (SELECT doc_id, fi AS frame_idx, fi * 64 AS v_off FROM
         (SELECT doc_id, unnest(generate_series(0, (length(text)-1)//64)) AS fi,
                 text FROM d) x WHERE fi % 2 = 0),
       aw AS (SELECT doc_id, wi AS win_idx, wi * 36 AS a_off FROM
         (SELECT doc_id, unnest(generate_series(0, (length(text)-1)//36)) AS wi
          FROM d) y)
       SELECT v.doc_id, CAST(v.frame_idx AS BIGINT) AS frame_idx,
         CAST(v.v_off AS BIGINT) AS v_off,
         CAST(max(a.win_idx) AS BIGINT) AS win_idx,
         CAST(v.v_off - max(a.a_off) AS BIGINT) AS lag_bytes
       FROM vf v JOIN aw a ON a.doc_id = v.doc_id AND a.a_off <= v.v_off
       GROUP BY v.doc_id, v.frame_idx, v.v_off ORDER BY 1, 2""",
    note="cross-modal stream alignment: every sampled video frame "
    "paired with the latest audio window at-or-before its byte offset "
    "(offsets stand in for media timestamps) — the A/V sync read, "
    "expressed as the SAME as-of join the temporal layer uses "
    "(`operators.relational.asof_join`: single shuffle, no range "
    "cross join).  Mismatched rates (64-byte frames every 2nd vs "
    "36-byte hop) make the lag nontrivial; the oracle's "
    "max-per-group form is the correlated spelling of as-of",
)
def m04(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import sample_frames, window_chunks
    from ..operators.relational import asof_join

    docs = Catalog(spark, sf_dir).table("documents").filter(F.col("doc_id") < 50)
    media = to_media_table(docs)
    vf = sample_frames(media, frame_bytes=64, every=2).select(
        "doc_id", "frame_idx", (F.col("frame_idx") * 64).alias("v_off")
    )
    aw = window_chunks(media, window_bytes=64, hop=36).select(
        "doc_id", F.col("win_idx").alias("aw_idx"), (F.col("win_idx") * 36).alias("a_off")
    )
    al = asof_join(vf, aw, ["doc_id"], "v_off", "a_off")
    return al.select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.col("v_off").cast("long").alias("v_off"),
        F.col("asof_aw_idx").cast("long").alias("win_idx"),
        (F.col("v_off") - F.col("asof_a_off")).cast("long").alias("lag_bytes"),
    ).orderBy("doc_id", "frame_idx")


@_l(
    "l39_feature_hashing",
    """WITH tok AS (SELECT doc_id, t.term FROM documents,
         unnest(string_split(text, ' ')) t(term)
       WHERE doc_id < 30 AND t.term <> ''),
       h AS (SELECT doc_id,
         (strpos('0123456789abcdef', substring(md5(term), 1, 1)) - 1) % 8 AS dim,
         CASE WHEN (strpos('0123456789abcdef', substring(md5(term), 2, 1)) - 1)
                % 2 = 0 THEN 1 ELSE -1 END AS sgn
       FROM tok)
       SELECT doc_id, CAST(dim AS INT) AS dim, CAST(sum(sgn) AS BIGINT) AS val
       FROM h GROUP BY 1, 2 ORDER BY 1, 2""",
    note="the hashing-trick vectorizer (signed feature hashing, "
    "Weinberger et al.): term -> md5-derived bucket in a fixed 8-dim "
    "space with a +-1 sign hash, summed per (doc, dim) — the "
    "vocabulary-free text vectorizer that needs NO fitted dictionary, "
    "which is what makes it the streaming/100 TB path (any executor "
    "can hash independently; no vocab broadcast, no OOV).  Signed "
    "sums are exact integers; md5-digit arithmetic keeps the hash "
    "SQL-reproducible",
)
def l39(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents").filter(F.col("doc_id") < 30)
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term")).filter(
        F.col("term") != ""
    )
    m = F.md5("term")
    digit = lambda i: F.instr(F.lit("0123456789abcdef"), F.substring(m, i, 1)) - 1
    h = tok.select(
        "doc_id",
        (digit(1) % 8).cast("int").alias("dim"),
        F.when(digit(2) % 2 == 0, 1).otherwise(-1).alias("sgn"),
    )
    return (
        h.groupBy("doc_id", "dim")
        .agg(F.sum("sgn").cast("long").alias("val"))
        .orderBy("doc_id", "dim")
    )


@_l(
    "l40_containment",
    """WITH docs AS (SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS l
       FROM documents WHERE doc_id < 40),
       sh AS (SELECT DISTINCT doc_id, s[1] || ' ' || s[2] AS shingle
         FROM (SELECT doc_id, unnest(list_zip(l, l[2:])) AS s FROM docs) z
         WHERE s[2] IS NOT NULL),
       sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
       inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
         FROM sh a JOIN sh b ON a.shingle = b.shingle
           AND a.doc_id <> b.doc_id GROUP BY 1, 2)
       SELECT i.a, i.b, i.i AS n_shared,
         round(i.i / sa.sz, 4) AS containment
       FROM inter i JOIN sz sa ON sa.doc_id = i.a
       ORDER BY containment DESC, i.a, i.b LIMIT 50""",
    note="asymmetric CONTAINMENT similarity |A∩B|/|A| over bigram "
    "shingles — the sub-document duplication signal Jaccard (l07) "
    "washes out: a short doc fully copied into a long one scores "
    "containment 1.0 but tiny Jaccard.  Same inverted-index "
    "candidate join as every dedup op (never all-pairs); exact "
    "integer ratio so ordering and rounding are engine-stable",
)
def l40(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents").filter(F.col("doc_id") < 40)
    toks = d.select("doc_id", F.split("text", " ").alias("l")).select(
        "doc_id", F.expr("filter(l, x -> x <> '')").alias("l")
    )
    sh = (
        toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(slice(l, 1, size(l) - 1),"
                    " (w, i) -> concat(w, ' ', element_at(l, i + 2)))"
                )
            ).alias("shingle"),
        )
        .distinct()
    )
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("a"), "shingle")
    b = sh.select(F.col("doc_id").alias("b"), F.col("shingle").alias("sh2"))
    inter = (
        a.join(b, (F.col("shingle") == F.col("sh2")) & (F.col("a") != F.col("b")))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        inter.join(F.broadcast(sz.select(F.col("doc_id").alias("a"), "sz")), "a")
        .select(
            "a", "b", "n_shared",
            F.round(F.col("n_shared") / F.col("sz"), 4).alias("containment"),
        )
        .orderBy(F.desc("containment"), "a", "b")
        .limit(50)
    )


@_l(
    "l41_bm25",
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
         FROM documents),
       tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
         WHERE term <> '' GROUP BY 1, 2),
       dl AS (SELECT doc_id, count(*) AS dl FROM tok
         WHERE term <> '' GROUP BY 1),
       df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       st AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl)
       SELECT t.doc_id, t.term,
         round(ln(1 + (st.n - df.df + 0.5) / (df.df + 0.5))
           * t.tf * 2.2
           / (t.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)), 4) AS bm25
       FROM tf t JOIN dl ON dl.doc_id = t.doc_id
         JOIN df ON df.term = t.term CROSS JOIN st
       ORDER BY 3 DESC, 1, 2 LIMIT 25""",
    note="BM25 (k1=1.2, b=0.75) term salience — tf-idf (l04) with "
    "saturating tf and document-length normalization, the ranking "
    "function behind retrieval-based data curation.  One tokenize "
    "pass feeds tf/dl; the (n, avgdl) scalars broadcast while the "
    "df join stays a shuffle join keyed on term (vocabulary is NOT "
    "broadcastable at corpus scale — AQE may still elect broadcast "
    "when it measures small).  Ordering "
    "is on the ROUNDED score with a full tie-break, so an ulp of "
    "cross-engine ln() disagreement cannot reorder the top-k",
)
def l41(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import bm25_scores

    d = Catalog(spark, sf_dir).table("documents")
    return (
        bm25_scores(d, k1=1.2, b=0.75)
        .select("doc_id", "term", F.round("bm25", 4).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id", "term")
        .limit(25)
    )


@_l(
    "l42_knn_classify",
    """WITH q AS (SELECT vec_id, label,
         list_transform(embedding, x -> CAST(floor(x * 1000 + 0.5) AS BIGINT))
           AS qv FROM embeddings),
       up AS (SELECT a.vec_id AS va, a.label AS la, b.vec_id AS vb,
         b.label AS lb, unnest(a.qv) AS xa, unnest(b.qv) AS xb
         FROM q a JOIN q b ON b.vec_id <> a.vec_id),
       d AS (SELECT va, la, vb, lb,
         CAST(sum((xa - xb) * (xa - xb)) AS BIGINT) AS d2
         FROM up GROUP BY 1, 2, 3, 4),
       nn AS (SELECT va, la, lb FROM d
         QUALIFY row_number() OVER (PARTITION BY va ORDER BY d2, vb) <= 5),
       votes AS (SELECT va, la, lb, count(*) AS c FROM nn GROUP BY 1, 2, 3),
       pred AS (SELECT va, la, lb AS pred FROM votes
         QUALIFY row_number() OVER (PARTITION BY va ORDER BY c DESC, lb) = 1)
       SELECT CAST(la AS INT) AS label, count(*) AS n,
         CAST(sum(CASE WHEN pred = la THEN 1 ELSE 0 END) AS BIGINT)
           AS n_correct,
         round(CAST(sum(CASE WHEN pred = la THEN 1 ELSE 0 END) AS DOUBLE)
           / count(*), 4) AS acc
       FROM pred GROUP BY 1 ORDER BY 1""",
    note="5-NN label-vote classification with leave-one-out accuracy "
    "per class — the embedding-quality probe a curation pipeline runs "
    "before trusting clusters.  Distances are EXACT integer squared-L2 "
    "over 3-decimal-quantized vectors (l21's quantization put to "
    "work), so neighbor ranking and vote outcomes are bit-stable "
    "across engines — no cosine ulp hazard.  This is the brute-force "
    "O(n^2) evaluation harness: at corpus scale the candidate pairs "
    "come from l12/l17's LSH/IVF buckets instead, same vote stage",
)
def l42(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import knn_label_vote

    em = Catalog(spark, sf_dir).table("embeddings")
    pred = knn_label_vote(em, k=5, scale=1000)
    correct = F.sum(F.when(F.col("pred") == F.col("label"), 1).otherwise(0))
    return (
        pred.groupBy(F.col("label").cast("int").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            correct.cast("long").alias("n_correct"),
            F.round(correct.cast("double") / F.count(F.lit(1)), 4).alias("acc"),
        )
        .orderBy("label")
    )


@_l(
    "l43_vocab_coverage",
    """WITH tok AS (SELECT doc_id, lang,
         unnest(string_split(text, ' ')) AS term FROM documents),
       tf AS (SELECT term, count(*) AS c FROM tok WHERE term <> ''
         GROUP BY 1),
       vocab AS (SELECT term FROM tf
         QUALIFY row_number() OVER (ORDER BY c DESC, term) <= 1000),
       j AS (SELECT t.lang, CASE WHEN v.term IS NULL THEN 1 ELSE 0 END
           AS oov FROM tok t LEFT JOIN vocab v ON v.term = t.term
         WHERE t.term <> '')
       SELECT lang, count(*) AS total_tokens,
         CAST(sum(oov) AS BIGINT) AS oov_tokens,
         round(CAST(sum(oov) AS DOUBLE) / count(*), 4) AS oov_rate
       FROM j GROUP BY 1 ORDER BY 1""",
    note="tokenizer vocabulary coverage: build the top-1000 corpus "
    "vocabulary (frequency-ranked, term tie-break) and report the "
    "out-of-vocabulary token rate per language — the go/no-go check "
    "before committing a fixed vocab to a training run.  The vocab "
    "is top-K-bounded, so the coverage join broadcasts it against "
    "the token stream: one tokenize pass, one term groupBy, one "
    "broadcast join, no all-corpus shuffle on the probe side",
)
def l43(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    tok = d.select(
        "lang", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = tok.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    vocab = (
        tf.withColumn("rk", F.row_number().over(Window.orderBy(F.desc("c"), "term")))
        .filter(F.col("rk") <= 1000)
        .select(F.col("term").alias("vterm"))
    )
    j = tok.join(
        F.broadcast(vocab), F.col("term") == F.col("vterm"), "left"
    ).select("lang", F.when(F.col("vterm").isNull(), 1).otherwise(0).alias("oov"))
    return (
        j.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("total_tokens"),
            F.sum("oov").alias("oov_tokens"),
            F.round(F.sum("oov").cast("double") / F.count(F.lit(1)), 4).alias(
                "oov_rate"
            ),
        )
        .orderBy("lang")
    )


@_l(
    "l44_survivorship",
    """WITH RECURSIVE docs AS (
         SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS l
         FROM documents WHERE doc_id < 100),
       sh AS (SELECT DISTINCT doc_id, s[1] || ' ' || s[2] AS shingle
              FROM (SELECT doc_id, unnest(list_zip(l, l[2:])) AS s FROM docs) z
              WHERE s[2] IS NOT NULL),
       sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
       inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
                 FROM sh a JOIN sh b ON a.shingle=b.shingle AND a.doc_id<b.doc_id
                 GROUP BY 1,2),
       pairs AS (SELECT a, b FROM inter
                 JOIN sizes sa ON sa.doc_id=a JOIN sizes sb ON sb.doc_id=b
                 WHERE i::DOUBLE/(sa.sz + sb.sz - i) >= 0.12),
       sym AS (SELECT a AS x, b AS y FROM pairs UNION SELECT b, a FROM pairs),
       nodes AS (SELECT DISTINCT x AS node FROM sym),
       reach(node, r) AS (
         SELECT node, node FROM nodes
         UNION
         SELECT e.y, reach.r FROM reach JOIN sym e ON reach.node=e.x),
       cl AS (SELECT node AS doc_id, min(r)::BIGINT AS cluster FROM reach
              GROUP BY 1),
       j AS (SELECT c.cluster, c.doc_id, d.n_chars FROM cl c
             JOIN documents d ON d.doc_id = c.doc_id),
       srt AS (SELECT cluster, doc_id, n_chars, row_number() OVER
                 (PARTITION BY cluster ORDER BY n_chars DESC, doc_id) AS rn
               FROM j),
       agg AS (SELECT cluster, count(*) AS n_members,
               CAST(sum(n_chars) AS BIGINT) AS total_chars FROM j GROUP BY 1)
       SELECT a.cluster, s.doc_id AS survivor, a.n_members, a.total_chars,
         CAST(a.total_chars - s.n_chars AS BIGINT) AS dropped_chars
       FROM agg a JOIN srt s ON s.cluster = a.cluster AND s.rn = 1
       ORDER BY 1""",
    note="dedup survivorship: l19's near-dup clusters resolved to ONE "
    "canonical document each (longest text wins, doc_id tie-break) "
    "with exact kept/dropped char accounting — the final pipeline "
    "step that turns 'these are duplicates' into 'keep this, drop "
    "that'.  Cluster ids come from the same CC relabeling as l19; "
    "the survivor pick is one bounded per-cluster rank over the "
    "(small) cluster-member table",
)
def l44(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.algorithms import connected_components
    from ..graph.property_graph import PropertyGraph

    docs = Catalog(spark, sf_dir).table("documents").filter(F.col("doc_id") < 100)
    pairs = ngram_jaccard_pairs(docs, n=2).filter(F.col("jaccard") >= 0.12).select("a", "b")
    sym = pairs.union(pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    edges = sym.select(
        F.col("a").cast("string").alias("src"), F.col("b").cast("string").alias("dst")
    )
    nodes = edges.select(F.col("src").alias("id")).distinct()
    cc = connected_components(PropertyGraph(nodes, edges))
    num = cc.select(
        F.col("node").cast("long").alias("doc_id"), F.col("component").alias("comp_str")
    )
    relabel = num.groupBy("comp_str").agg(F.min("doc_id").alias("cluster"))
    cl = num.join(F.broadcast(relabel), "comp_str").select("doc_id", "cluster")
    j = cl.join(docs.select("doc_id", "n_chars"), "doc_id")
    srt = j.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("cluster").orderBy(F.desc("n_chars"), "doc_id")
        ),
    )
    agg = j.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members"), F.sum("n_chars").alias("total_chars")
    )
    return (
        agg.join(
            srt.filter(F.col("rn") == 1).select(
                "cluster", F.col("doc_id").alias("survivor"), F.col("n_chars").alias("sc")
            ),
            "cluster",
        )
        .select(
            "cluster",
            "survivor",
            "n_members",
            "total_chars",
            (F.col("total_chars") - F.col("sc")).alias("dropped_chars"),
        )
        .orderBy("cluster")
    )


@_l(
    "l45_lsh_eval",
    """WITH tok AS (SELECT DISTINCT d.doc_id, t.term FROM documents d,
         unnest(string_split(d.text,' ')) AS t(term)
         WHERE t.term<>'' AND d.doc_id < 60),
       sigs AS (SELECT doc_id, i.i AS i, min(md5(i.i || ':' || term)) AS sig
                FROM tok CROSS JOIN range(16) i(i) GROUP BY 1,2),
       bands AS (SELECT doc_id, i // 4 AS band,
                 string_agg(sig, ',' ORDER BY i) AS bkey
                 FROM sigs GROUP BY 1,2),
       cand AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
                FROM bands a JOIN bands b ON a.band=b.band AND a.bkey=b.bkey
                  AND a.doc_id < b.doc_id),
       nt AS (SELECT doc_id, count(*) AS c FROM tok GROUP BY 1),
       tj AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS inter
              FROM tok a JOIN tok b ON a.term=b.term AND a.doc_id<b.doc_id
              GROUP BY 1,2),
       truth AS (SELECT t.i, t.j FROM tj t
                 JOIN nt na ON na.doc_id=t.i JOIN nt nb ON nb.doc_id=t.j
                 WHERE 10 * t.inter >= 3 * (na.c + nb.c - t.inter)),
       m AS (SELECT CASE WHEN c.i IS NOT NULL AND tr.i IS NOT NULL THEN 'tp'
                  WHEN c.i IS NOT NULL THEN 'fp' ELSE 'fn' END AS cls
             FROM cand c FULL JOIN truth tr ON tr.i=c.i AND tr.j=c.j)
       SELECT CAST(count(*) FILTER (WHERE cls = 'tp') AS BIGINT) AS tp,
         CAST(count(*) FILTER (WHERE cls = 'fp') AS BIGINT) AS fp,
         CAST(count(*) FILTER (WHERE cls = 'fn') AS BIGINT) AS fn,
         round(CAST(count(*) FILTER (WHERE cls = 'tp') AS DOUBLE)
           / nullif(count(*) FILTER (WHERE cls IN ('tp','fp')), 0), 4) AS prec,
         round(CAST(count(*) FILTER (WHERE cls = 'tp') AS DOUBLE)
           / nullif(count(*) FILTER (WHERE cls IN ('tp','fn')), 0), 4) AS recall
       FROM m""",
    note="LSH banding precision/recall evaluation: 16 minhash "
    "signatures in 4 bands of 4 (candidates = any full-band "
    "collision) scored against EXACT Jaccard >= 0.3 ground truth — "
    "the measurement that justifies every 'recall-tested' ANN claim "
    "in this repo with an oracle-checked number.  The threshold test "
    "is pure integers (10*inter >= 3*union), candidates come from "
    "the band-bucket join and truth from the inverted-index join: "
    "both are equi-joins, no quadratic scan anywhere",
)
def l45(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_signatures, tokens

    d = Catalog(spark, sf_dir).table("documents").filter(F.col("doc_id") < 60)
    tok = tokens(d).distinct()
    sigs = minhash_signatures(d, k=16)
    bands = (
        sigs.groupBy("doc_id", F.floor(F.col("i") / 4).alias("band"))
        .agg(
            F.array_join(
                F.expr("transform(array_sort(collect_list(struct(i, sig))), x -> x.sig)"),
                ",",
            ).alias("bkey")
        )
    )
    ba = bands.select(F.col("doc_id").alias("i"), "band", "bkey")
    bb = bands.select(F.col("doc_id").alias("j"), F.col("band").alias("b2"), F.col("bkey").alias("k2"))
    cand = (
        ba.join(bb, (F.col("band") == F.col("b2")) & (F.col("bkey") == F.col("k2")) & (F.col("i") < F.col("j")))
        .select("i", "j")
        .distinct()
    )
    nt = tok.groupBy(F.col("doc_id").alias("d")).agg(F.count(F.lit(1)).alias("c"))
    ta = tok.select(F.col("doc_id").alias("i"), "term")
    tb = tok.select(F.col("doc_id").alias("j"), "term")
    tj = (
        ta.join(tb, "term")
        .filter(F.col("i") < F.col("j"))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    truth = (
        tj.join(nt.select(F.col("d").alias("i"), F.col("c").alias("ca")), "i")
        .join(nt.select(F.col("d").alias("j"), F.col("c").alias("cb")), "j")
        .filter(10 * F.col("inter") >= 3 * (F.col("ca") + F.col("cb") - F.col("inter")))
        .select("i", "j")
    )
    m = cand.withColumn("c", F.lit(1)).join(
        truth.withColumn("t", F.lit(1)), ["i", "j"], "full"
    ).select(
        F.when(F.col("c").isNotNull() & F.col("t").isNotNull(), "tp")
        .when(F.col("c").isNotNull(), "fp")
        .otherwise("fn")
        .alias("cls")
    )
    cnt = lambda *cl: F.sum(F.when(F.col("cls").isin(*cl), 1).otherwise(0))
    return m.agg(
        cnt("tp").alias("tp"),
        cnt("fp").alias("fp"),
        cnt("fn").alias("fn"),
        F.round(
            cnt("tp").cast("double") / F.nullif(cnt("tp", "fp"), F.lit(0)), 4
        ).alias("prec"),
        F.round(
            cnt("tp").cast("double") / F.nullif(cnt("tp", "fn"), F.lit(0)), 4
        ).alias("recall"),
    )


@_l(
    "m05_batch_plan",
    """WITH m AS (SELECT source, octet_length(encode(text)) AS nb
         FROM documents)
       SELECT source, count(*) AS n_rows,
         CAST(sum(nb) AS BIGINT) AS total_bytes,
         CAST(max(nb) AS BIGINT) AS max_bytes,
         CAST(greatest(1, (65536 * count(*)) // sum(nb)) AS BIGINT)
           AS rec_batch_rows
       FROM m GROUP BY 1 ORDER BY 1""",
    note="Arrow batch-size planner for multimodal UDF stages: per "
    "media source, payload-size stats and the recommended "
    "maxRecordsPerBatch so one Arrow batch lands near 64 KiB (the "
    "m01/m02 mapInPandas operators inherit this instead of a global "
    "guess — oversized batches OOM the Python worker on image-heavy "
    "sources, undersized ones drown in per-batch overhead).  The "
    "recommendation is pure integer arithmetic (65536*n // bytes), "
    "one aggregation pass over (source, length) — payloads "
    "themselves never move",
)
def m05(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    m = d.select(
        "source", F.octet_length(F.encode(F.col("text"), "utf-8")).cast("long").alias("nb")
    )
    return (
        m.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("nb").alias("total_bytes"),
            F.max("nb").alias("max_bytes"),
            F.greatest(
                F.lit(1).cast("long"),
                F.floor(65536 * F.count(F.lit(1)) / F.sum("nb")).cast("long"),
            ).alias("rec_batch_rows"),
        )
        .orderBy("source")
    )


@_l(
    "l47_langid_confusion",
    """WITH tri AS (SELECT doc_id, lang, substring(text, i, 3) AS g
       FROM (SELECT doc_id, lang, text,
               unnest(generate_series(1, length(text) - 2)) AS i
             FROM documents WHERE length(text) >= 3) u),
       prof AS (SELECT lang, g, count(*) AS c FROM tri
         WHERE doc_id % 2 = 0 GROUP BY 1, 2
         QUALIFY row_number() OVER (PARTITION BY lang ORDER BY c DESC, g)
           <= 20),
       test AS (SELECT DISTINCT doc_id, lang, g FROM tri WHERE doc_id % 2 = 1),
       hits AS (SELECT t.doc_id, t.lang AS actual, p.lang AS cand,
         count(*) AS h
         FROM test t JOIN prof p ON p.g = t.g GROUP BY 1, 2, 3),
       pred AS (SELECT doc_id, actual, cand AS predicted FROM hits
         QUALIFY row_number() OVER (PARTITION BY doc_id
           ORDER BY h DESC, cand) = 1)
       SELECT actual, predicted, count(*) AS n FROM pred
       GROUP BY 1, 2 ORDER BY 1, 2""",
    note="character-trigram language identification (Cavnar-Trenkle "
    "shape): train top-20 trigram profiles per language on even "
    "doc_ids, classify odd doc_ids by distinct-trigram profile hits "
    "(argmax with a full tie-break), report the confusion matrix — "
    "the held-out EVALUATION of the langid heuristic, not just its "
    "features.  Everything is integer counts; the profile table is "
    "5 langs x 20 trigrams so the classification join broadcasts it "
    "against the test trigram stream",
)
def l47(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents").filter(F.length("text") >= 3)
    tri = d.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, length(text) - 2),"
                " i -> substring(text, i, 3))"
            )
        ).alias("g"),
    )
    prof = (
        tri.filter(F.col("doc_id") % 2 == 0)
        .groupBy("lang", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("lang").orderBy(F.desc("c"), "g")
            ),
        )
        .filter(F.col("rk") <= 20)
        .select(F.col("lang").alias("cand"), F.col("g").alias("pg"))
    )
    test = tri.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", F.col("lang").alias("actual"), "g"
    ).distinct()
    hits = (
        test.join(F.broadcast(prof), F.col("g") == F.col("pg"))
        .groupBy("doc_id", "actual", "cand")
        .agg(F.count(F.lit(1)).alias("h"))
    )
    pred = (
        hits.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.desc("h"), "cand")
            ),
        )
        .filter(F.col("rk") == 1)
        .select("actual", F.col("cand").alias("predicted"))
    )
    return (
        pred.groupBy("actual", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("actual", "predicted")
    )


@_l(
    "l48_corpus_card",
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
         FROM documents),
       tk AS (SELECT count(*) AS total_tokens,
              count(DISTINCT term) AS distinct_tokens
              FROM tok WHERE term <> ''),
       dup AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS dup_docs
               FROM (SELECT count(*) AS c FROM documents
                     GROUP BY text) g WHERE c > 1),
       base AS (SELECT count(*) AS n_docs,
                count(DISTINCT lang) AS n_langs,
                count(DISTINCT source) AS n_sources FROM documents)
       SELECT n_docs, n_langs, n_sources, total_tokens, distinct_tokens,
         dup_docs, round(CAST(dup_docs AS DOUBLE) / n_docs, 4) AS dup_rate
       FROM base CROSS JOIN tk CROSS JOIN dup""",
    note="one-row dataset card: corpus size, language/source "
    "diversity, token volume and vocabulary, and the exact-duplicate "
    "footprint — the summary block every curated-dataset release "
    "ships.  Three independent aggregation passes (docs, tokens, "
    "dup groups) joined as scalars; at 100 TB each pass is a single "
    "map-side-combinable aggregate and the duplicate pass groups on "
    "a text hash rather than raw text",
)
def l48(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    tok = d.select(F.explode(F.split("text", " ")).alias("term")).filter(
        F.col("term") != ""
    )
    tk = tok.agg(
        F.count(F.lit(1)).alias("total_tokens"),
        F.countDistinct("term").alias("distinct_tokens"),
    )
    dup = (
        d.groupBy("text")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("dup_docs"))
    )
    base = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
    )
    return (
        base.crossJoin(F.broadcast(tk))
        .crossJoin(F.broadcast(dup))
        .select(
            "n_docs",
            "n_langs",
            "n_sources",
            "total_tokens",
            "distinct_tokens",
            "dup_docs",
            F.round(F.col("dup_docs").cast("double") / F.col("n_docs"), 4).alias(
                "dup_rate"
            ),
        )
    )


@_l(
    "l49_split_leakage",
    """WITH docs AS (SELECT doc_id,
         list_filter(string_split(text,' '), x -> x <> '') AS l
       FROM documents WHERE doc_id < 100),
       sh AS (SELECT DISTINCT doc_id, s[1] || ' ' || s[2] AS shingle
              FROM (SELECT doc_id, unnest(list_zip(l, l[2:])) AS s FROM docs) z
              WHERE s[2] IS NOT NULL),
       sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
       inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
                 FROM sh a JOIN sh b ON a.shingle=b.shingle AND a.doc_id<b.doc_id
                 GROUP BY 1,2),
       pairs AS (SELECT a, b FROM inter
                 JOIN sizes sa ON sa.doc_id=a JOIN sizes sb ON sb.doc_id=b
                 WHERE i::DOUBLE/(sa.sz + sb.sz - i) >= 0.12),
       sp AS (SELECT doc_id, CASE
         WHEN strpos('0123456789abcdef',
           substring(md5(doc_id::VARCHAR), 1, 1)) - 1 < 13 THEN 'train'
         WHEN strpos('0123456789abcdef',
           substring(md5(doc_id::VARCHAR), 1, 1)) - 1 < 15 THEN 'valid'
         ELSE 'test' END AS split FROM documents WHERE doc_id < 100),
       cls AS (SELECT least(pa.split, pb.split) AS sa,
               greatest(pa.split, pb.split) AS sb
               FROM pairs JOIN sp pa ON pa.doc_id = pairs.a
                 JOIN sp pb ON pb.doc_id = pairs.b)
       SELECT sa, sb, count(*) AS n_pairs FROM cls
       GROUP BY 1, 2 ORDER BY 1, 2""",
    note="train/test leakage audit: l19's near-duplicate pairs "
    "classified by which l18 hash-split sides they straddle — any "
    "row with sa <> sb is a near-duplicate leaking across the split, "
    "the contamination that silently inflates eval scores.  The "
    "pair set comes from the inverted-index candidate join (never "
    "all-pairs); split labels are the deterministic md5 rule, so the "
    "audit reproduces bit-for-bit on any cluster",
)
def l49(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents").filter(F.col("doc_id") < 100)
    pairs = (
        ngram_jaccard_pairs(docs, n=2).filter(F.col("jaccard") >= 0.12).select("a", "b")
    )
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1), 16, 10
    ).cast("int")
    sp = docs.select(
        "doc_id",
        F.when(bucket < 13, "train").when(bucket < 15, "valid").otherwise("test").alias("split"),
    )
    pa = sp.select(F.col("doc_id").alias("a"), F.col("split").alias("spl_a"))
    pb = sp.select(F.col("doc_id").alias("b"), F.col("split").alias("spl_b"))
    cls = (
        pairs.join(F.broadcast(pa), "a")
        .join(F.broadcast(pb), "b")
        .select(
            F.least("spl_a", "spl_b").alias("sa"),
            F.greatest("spl_a", "spl_b").alias("sb"),
        )
    )
    return (
        cls.groupBy("sa", "sb").agg(F.count(F.lit(1)).alias("n_pairs")).orderBy("sa", "sb")
    )


@_l(
    "l50_novelty_curve",
    """WITH docs AS (SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS l
       FROM documents),
       sh AS (SELECT DISTINCT doc_id, s[1] || ' ' || s[2] AS shingle
              FROM (SELECT doc_id, unnest(list_zip(l, l[2:])) AS s FROM docs) z
              WHERE s[2] IS NOT NULL),
       fo AS (SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY 1),
       per AS (SELECT sh.doc_id, count(*) AS n_shingles,
         CAST(sum(CASE WHEN fo.first_doc = sh.doc_id THEN 1 ELSE 0 END)
           AS BIGINT) AS n_new
         FROM sh JOIN fo ON fo.shingle = sh.shingle GROUP BY 1)
       SELECT doc_id, n_shingles, n_new,
         round(CAST(n_new AS DOUBLE) / n_shingles, 4) AS novelty
       FROM per ORDER BY 1""",
    note="corpus novelty curve: per document (in ingestion order), the "
    "fraction of its bigram shingles never seen in any earlier "
    "document — the redundancy-growth diagnostic that tells a "
    "curation pipeline when additional data stops adding "
    "information (novelty tending to 0 = the corpus is saturating). "
    " First-occurrence is one groupBy min over the inverted index; "
    "no per-document history state, no quadratic comparisons",
)
def l50(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    toks = d.select("doc_id", F.split("text", " ").alias("l")).select(
        "doc_id", F.expr("filter(l, x -> x <> '')").alias("l")
    )
    sh = (
        toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(slice(l, 1, size(l) - 1),"
                    " (w, i) -> concat(w, ' ', element_at(l, i + 2)))"
                )
            ).alias("shingle"),
        )
        .distinct()
    )
    fo = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    per = (
        sh.join(fo, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_new"),
        )
    )
    return per.select(
        "doc_id",
        "n_shingles",
        "n_new",
        F.round(F.col("n_new").cast("double") / F.col("n_shingles"), 4).alias(
            "novelty"
        ),
    ).orderBy("doc_id")


@_l(
    "m06_scene_cuts",
    """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 50),
       wi AS (SELECT doc_id,
                unnest(generate_series(0, (length(text) - 1) // 64)) AS fi,
                text FROM d),
       fr AS (SELECT doc_id, fi,
              md5(substring(text, fi * 64 + 1, 64)) AS cs FROM wi),
       c AS (SELECT doc_id, fi,
         CASE WHEN lag(cs) OVER w IS NOT NULL AND cs <> lag(cs) OVER w
              THEN 1 ELSE 0 END AS cut
         FROM fr WINDOW w AS (PARTITION BY doc_id ORDER BY fi))
       SELECT doc_id, count(*) AS n_frames, CAST(sum(cut) AS BIGINT) AS n_cuts
       FROM c GROUP BY 1 ORDER BY 1""",
    note="scene-cut detection over the m02 frame stream: a cut is a "
    "frame whose (stubbed-codec) content signature differs from its "
    "predecessor — the shot-boundary pass a video curation pipeline "
    "runs right after frame sampling, here over every frame "
    "(every=1) so the lag compares adjacent frames.  The cut test "
    "is one lag window partitioned by doc over the mapInPandas "
    "output; frame signatures are deterministic chunk checksums so "
    "the oracle reproduces them in SQL (ASCII fixture: byte==char)",
)
def m06(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import sample_frames

    docs = Catalog(spark, sf_dir).table("documents").filter(F.col("doc_id") < 50)
    fr = sample_frames(to_media_table(docs), frame_bytes=64, every=1)
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    c = fr.select(
        "doc_id",
        F.when(
            F.lag("checksum").over(w).isNotNull()
            & (F.col("checksum") != F.lag("checksum").over(w)),
            1,
        )
        .otherwise(0)
        .alias("cut"),
    )
    return (
        c.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_frames"), F.sum("cut").alias("n_cuts"))
        .orderBy("doc_id")
    )


@_l(
    "l51_jaccard_histogram",
    """WITH docs AS (SELECT doc_id,
         list_filter(string_split(text,' '), x -> x <> '') AS l
       FROM documents WHERE doc_id < 100),
       sh AS (SELECT DISTINCT doc_id, s[1] || ' ' || s[2] AS shingle
              FROM (SELECT doc_id, unnest(list_zip(l, l[2:])) AS s FROM docs) z
              WHERE s[2] IS NOT NULL),
       sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
       inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
                 FROM sh a JOIN sh b ON a.shingle=b.shingle AND a.doc_id<b.doc_id
                 GROUP BY 1,2),
       j AS (SELECT CAST(least(9,
           (10 * i) // (sa.sz + sb.sz - i)) AS INT) AS decile
         FROM inter JOIN sizes sa ON sa.doc_id=a JOIN sizes sb ON sb.doc_id=b)
       SELECT decile, count(*) AS n_pairs FROM j GROUP BY 1 ORDER BY 1""",
    note="candidate-pair Jaccard histogram: every inverted-index "
    "candidate pair bucketed by similarity decile (integer "
    "arithmetic: 10*inter // union, capped at 9) — the threshold-"
    "sweep that picks the dedup cut-off (l19's 0.12, l45's 0.3) "
    "from the actual similarity mass instead of folklore.  Pairs "
    "with zero shared shingles never appear (by construction of the "
    "candidate join), which is exactly the population a threshold "
    "decision concerns",
)
def l51(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import word_shingles

    docs = Catalog(spark, sf_dir).table("documents").filter(F.col("doc_id") < 100)
    sh = word_shingles(docs, 2)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("a"), "shingle")
    b = sh.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    # decile via INTEGER floor-division (10*i) div union so a ratio that
    # lands exactly on a decile boundary can't straddle a double ulp
    j = (
        inter.join(
            F.broadcast(sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sza"))),
            "a",
        )
        .join(
            F.broadcast(sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("szb"))),
            "b",
        )
        .select(
            F.least(
                F.lit(9).cast("long"),
                F.expr("(10 * i) DIV (sza + szb - i)"),
            )
            .cast("int")
            .alias("decile")
        )
    )
    return (
        j.groupBy("decile").agg(F.count(F.lit(1)).alias("n_pairs")).orderBy("decile")
    )


@_l(
    "l52_bpe_pairs",
    """WITH w AS (SELECT unnest(string_split(text, ' ')) AS word
         FROM documents),
       p AS (SELECT substring(word, i, 2) AS pair
         FROM (SELECT word, unnest(generate_series(1, length(word) - 1))
                 AS i FROM w WHERE length(word) >= 2) u)
       SELECT pair, count(*) AS n FROM p GROUP BY 1
       ORDER BY 2 DESC, 1 LIMIT 20""",
    note="the first BPE training step: corpus-wide adjacent character-"
    "pair frequencies within words, top-20 merge candidates with a "
    "full tie-break — run iteratively (merge the winner, re-count) "
    "this IS byte-pair-encoding vocabulary learning; one step is "
    "declared here because each merge is the same single "
    "explode+groupBy shape.  Pair extraction is a per-word "
    "character slide (bounded by word length), counts combine "
    "map-side; no joins at all",
)
def l52(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    w = d.select(F.explode(F.split("text", " ")).alias("word")).filter(
        F.length("word") >= 2
    )
    p = w.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1),"
                " i -> substring(word, i, 2))"
            )
        ).alias("pair")
    )
    return (
        p.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(20)
    )


@_l(
    "l53_boilerplate_prefixes",
    """WITH p AS (SELECT doc_id, lang,
         array_to_string(list_filter(string_split(text, ' '),
           x -> x <> '')[1:5], ' ') AS prefix
       FROM documents),
       g AS (SELECT prefix, count(*) AS n_docs,
             count(DISTINCT lang) AS n_langs FROM p GROUP BY 1)
       SELECT prefix, n_docs, n_langs FROM g WHERE n_docs >= 2
       ORDER BY n_docs DESC, prefix LIMIT 25""",
    note="boilerplate template detection: documents sharing an "
    "identical 5-word prefix (the header/license/scaffold signature "
    "that exact dedup misses because the bodies differ) — the "
    "prefix-group histogram a curation pipeline feeds into "
    "template stripping.  One groupBy on the short prefix key; no "
    "pairwise comparisons, and the prefix doubles as the shard key "
    "if template removal runs as a follow-up join",
)
def l53(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    p = d.select(
        "lang",
        F.array_join(
            F.expr("slice(filter(split(text, ' '), x -> x <> ''), 1, 5)"), " "
        ).alias("prefix"),
    )
    return (
        p.groupBy("prefix")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_docs"), "prefix")
        .limit(25)
    )


@_l(
    "l54_lsh_cost_plan",
    """WITH tok AS (SELECT DISTINCT d.doc_id, t.term FROM documents d,
         unnest(string_split(d.text,' ')) AS t(term)
         WHERE t.term<>'' AND d.doc_id < 60),
       sigs AS (SELECT doc_id, i.i AS i, min(md5(i.i || ':' || term)) AS sig
                FROM tok CROSS JOIN range(16) i(i) GROUP BY 1,2),
       bands AS (SELECT doc_id, i // 4 AS band,
                 string_agg(sig, ',' ORDER BY i) AS bkey
                 FROM sigs GROUP BY 1,2),
       occ AS (SELECT band, bkey, count(*) AS sz FROM bands GROUP BY 1, 2)
       SELECT CAST(band AS INT) AS band, count(*) AS n_buckets,
         CAST(max(sz) AS BIGINT) AS max_bucket,
         CAST(sum(sz * (sz - 1) // 2) AS BIGINT) AS est_pairs
       FROM occ GROUP BY 1 ORDER BY 1""",
    note="LSH join-cost planner: per band, the bucket-occupancy "
    "profile and the EXACT candidate-pair count sum C(sz,2) the "
    "band-bucket join will emit — computed from one aggregation "
    "over the signatures, BEFORE paying for the pair join.  This "
    "is how a 100TB dedup decides its band/row configuration (and "
    "whether a hot bucket needs salting) from a number, not an "
    "OOM; the same arithmetic powers l45's candidate set",
)
def l54(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_signatures

    d = Catalog(spark, sf_dir).table("documents").filter(F.col("doc_id") < 60)
    sigs = minhash_signatures(d, k=16)
    bands = (
        sigs.groupBy("doc_id", F.floor(F.col("i") / 4).alias("band"))
        .agg(
            F.array_join(
                F.expr("transform(array_sort(collect_list(struct(i, sig))), x -> x.sig)"),
                ",",
            ).alias("bkey")
        )
    )
    occ = bands.groupBy("band", "bkey").agg(F.count(F.lit(1)).alias("sz"))
    return (
        occ.groupBy(F.col("band").cast("int").alias("band"))
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("sz").alias("max_bucket"),
            F.sum(F.expr("sz * (sz - 1) DIV 2")).alias("est_pairs"),
        )
        .orderBy("band")
    )


@_l(
    "m07_magic_router",
    """WITH m AS (SELECT source, substring(text, 1, 1) AS b0,
         octet_length(encode(text)) AS nb FROM documents),
       r AS (SELECT source, CASE
           WHEN b0 BETWEEN '0' AND '9' THEN 'numeric'
           WHEN lower(b0) BETWEEN 'a' AND 'z' THEN 'alpha'
           ELSE 'other' END AS route, nb FROM m)
       SELECT source, route, count(*) AS n_payloads,
         CAST(sum(nb) AS BIGINT) AS total_bytes
       FROM r GROUP BY 1, 2 ORDER BY 1, 2""",
    note="magic-byte routing: dispatch each opaque payload to a codec "
    "pipeline by inspecting its LEADING byte only (the real "
    "decoder's magic-number sniff, here a deterministic char-class "
    "stand-in) and report the per-(source, route) volume matrix "
    "that sizes each downstream mapInPandas stage.  The router "
    "reads one byte per payload — no decode, no full-payload "
    "materialization — which is the property that makes routing "
    "100TB of media cheap",
)
def m07(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    b0 = F.substring(F.col("text"), 1, 1)
    r = d.select(
        "source",
        F.when(b0.between("0", "9"), "numeric")
        .when(F.lower(b0).between("a", "z"), "alpha")
        .otherwise("other")
        .alias("route"),
        F.octet_length(F.encode(F.col("text"), "utf-8")).cast("long").alias("nb"),
    )
    return (
        r.groupBy("source", "route")
        .agg(
            F.count(F.lit(1)).alias("n_payloads"),
            F.sum("nb").alias("total_bytes"),
        )
        .orderBy("source", "route")
    )


_HEXFOLD_DUCK = " + ".join(
    f"(strpos('0123456789abcdef', substring(h, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
    for i in range(8)
)


@_l(
    "l55_weighted_sample",
    f"""WITH h AS (SELECT doc_id, n_chars,
         md5('ws:' || doc_id::VARCHAR) AS h FROM documents),
       u AS (SELECT doc_id, n_chars,
         ({_HEXFOLD_DUCK} + 1) / 4294967296.0 AS u FROM h),
       s AS (SELECT doc_id, n_chars, ln(u) / n_chars AS score FROM u),
       r AS (SELECT doc_id, n_chars, round(score * 1000000, 4) AS skey
             FROM s)
       SELECT doc_id, n_chars, skey FROM r
       ORDER BY skey DESC, doc_id LIMIT 50""",
    note="deterministic weighted sampling without replacement "
    "(Efraimidis-Spirakis with a CONTENT HASH as the uniform draw "
    "instead of rand()): key = ln(u)/weight, keep the top-k keys — "
    "longer documents proportionally likelier, yet the sample "
    "reproduces bit-for-bit on any cluster, any partitioning, any "
    "rerun, which rand()-based reservoir sampling cannot promise.  "
    "u comes from an exact integer fold of 8 md5 hex digits, so "
    "both engines feed identical doubles into one ln(); ranking is "
    "on the (scaled, rounded) key with a doc_id tie-break.  "
    "Distributed cost: one map pass + a global top-k "
    "(TakeOrderedAndProject, no full sort)",
)
def l55(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    md5 = F.md5(F.concat(F.lit("ws:"), F.col("doc_id").cast("string")))
    fold = None
    for i in range(8):
        digit = (
            F.instr(F.lit("0123456789abcdef"), F.substring(md5, i + 1, 1)) - 1
        ).cast("long") * F.lit(16 ** (7 - i)).cast("long")
        fold = digit if fold is None else fold + digit
    u = (fold + 1) / F.lit(4294967296.0)
    score = F.log(u) / F.col("n_chars")
    return (
        d.select(
            "doc_id",
            "n_chars",
            F.round(score * 1000000, 4).alias("skey"),
        )
        .orderBy(F.desc("skey"), "doc_id")
        .limit(50)
    )


@_l(
    "l56_centroid_drift",
    """WITH q AS (SELECT vec_id, label, vec_id % 2 AS half,
         list_transform(embedding, x -> CAST(floor(x * 1000 + 0.5) AS BIGINT))
           AS qv FROM embeddings),
       e AS (SELECT label, half, i.i AS dim,
         CAST(sum(list_extract(qv, i.i + 1)) AS BIGINT) AS s
         FROM q CROSS JOIN range(64) i(i) GROUP BY 1, 2, 3),
       n AS (SELECT label, half, count(*) AS c FROM q GROUP BY 1, 2),
       p AS (SELECT e1.label, e1.dim, e1.s AS s1, e2.s AS s2,
         n1.c AS n1, n2.c AS n2
         FROM e e1 JOIN e e2 ON e2.label = e1.label AND e2.dim = e1.dim
           AND e1.half = 0 AND e2.half = 1
         JOIN n n1 ON n1.label = e1.label AND n1.half = 0
         JOIN n n2 ON n2.label = e1.label AND n2.half = 1),
       agg AS (SELECT label, CAST(max(n1) AS BIGINT) AS n1,
         CAST(max(n2) AS BIGINT) AS n2,
         CAST(sum((s1 * n2 - s2 * n1) * (s1 * n2 - s2 * n1)) AS BIGINT)
           AS num FROM p GROUP BY 1)
       SELECT CAST(label AS INT) AS label, n1, n2,
         round(sqrt(CAST(num AS DOUBLE)) / (n1 * n2 * 1000), 6) AS drift
       FROM agg ORDER BY 1""",
    note="embedding centroid drift per label between two corpus halves "
    "(even/odd vec_id standing in for two pipeline snapshots): L2 "
    "distance between the half-centroids, the embedding-space "
    "companion to q91's PSI that catches encoder or preprocessing "
    "regressions before a model consumes the vectors.  The whole "
    "computation stays EXACT integers — quantized per-dim sums, "
    "cross-multiplied difference (s1*n2 - s2*n1) to clear both "
    "denominators — with one sqrt+division per label at the edge; "
    "per-dim sums shuffle once on (label, half, dim)",
)
def l56(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = Catalog(spark, sf_dir).table("embeddings")
    q = em.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.expr(
            "transform(embedding, x -> CAST(floor(x * 1000 + 0.5) AS BIGINT))"
        ).alias("qv"),
    )
    e = (
        q.select("label", "half", F.posexplode("qv").alias("dim", "v"))
        .groupBy("label", "half", "dim")
        .agg(F.sum("v").alias("s"))
    )
    n = q.groupBy("label", "half").agg(F.count(F.lit(1)).alias("c"))
    e1 = e.filter(F.col("half") == 0).select("label", "dim", F.col("s").alias("s1"))
    e2 = e.filter(F.col("half") == 1).select(
        F.col("label").alias("l2"), F.col("dim").alias("d2"), F.col("s").alias("s2")
    )
    n1 = n.filter(F.col("half") == 0).select(
        F.col("label").alias("ln1"), F.col("c").alias("n1")
    )
    n2 = n.filter(F.col("half") == 1).select(
        F.col("label").alias("ln2"), F.col("c").alias("n2")
    )
    p = (
        e1.join(e2, (F.col("l2") == F.col("label")) & (F.col("d2") == F.col("dim")))
        .join(F.broadcast(n1), F.col("ln1") == F.col("label"))
        .join(F.broadcast(n2), F.col("ln2") == F.col("label"))
    )
    diff = F.col("s1") * F.col("n2") - F.col("s2") * F.col("n1")
    agg = p.groupBy("label").agg(
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.sum(diff * diff).alias("num"),
    )
    return agg.select(
        F.col("label").cast("int").alias("label"),
        "n1",
        "n2",
        F.round(
            F.sqrt(F.col("num").cast("double"))
            / (F.col("n1") * F.col("n2") * 1000),
            6,
        ).alias("drift"),
    ).orderBy("label")


@_l(
    "l57_token_budget",
    """WITH t AS (SELECT doc_id,
         CAST((length(text) + 3) // 4 AS BIGINT) AS toks FROM documents),
       c AS (SELECT doc_id, toks, CAST(sum(toks) OVER
           (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         FROM t),
       fit AS (SELECT count(*) AS n_fit, CAST(max(cum) AS BIGINT) AS used
               FROM c WHERE cum <= 100000),
       nxt AS (SELECT min(doc_id) AS first_excluded FROM c
               WHERE cum > 100000)
       SELECT n_fit, used, CAST(100000 - used AS BIGINT) AS budget_left,
         first_excluded
       FROM fit CROSS JOIN nxt""",
    note="token-budget capacity forecast: walk the corpus in ingestion "
    "order under the l10 BPE-budget estimate (ceil(chars/4)) and "
    "report exactly how many documents fit a 100k-token budget, the "
    "tokens consumed, the remainder, and the first document that "
    "does not fit — the pre-flight answer to 'will this slice fill "
    "the context/training budget'.  One prefix-sum window over the "
    "(doc, tokens) projection; all integers.  At scale the cumsum "
    "partitions by (shard key) and budgets apply per shard (l28's "
    "packing consumes the same arithmetic)",
)
def l57(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    t = d.select(
        "doc_id", F.floor((F.length("text") + 3) / 4).cast("long").alias("toks")
    )
    c = t.select(
        "doc_id",
        "toks",
        F.sum("toks")
        .over(Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
    )
    fit = c.filter(F.col("cum") <= 100000).agg(
        F.count(F.lit(1)).alias("n_fit"), F.max("cum").alias("used")
    )
    nxt = c.filter(F.col("cum") > 100000).agg(
        F.min("doc_id").alias("first_excluded")
    )
    return fit.crossJoin(F.broadcast(nxt)).select(
        "n_fit",
        "used",
        (F.lit(100000) - F.col("used")).cast("long").alias("budget_left"),
        "first_excluded",
    )


@_l(
    "m08_merkle_manifest",
    """WITH leaf AS (SELECT source, doc_id, md5(text) AS h
         FROM documents),
       root AS (SELECT source, count(*) AS n_docs,
         md5(string_agg(substring(h, 1, 16), '' ORDER BY doc_id))
           AS root_hash FROM leaf GROUP BY 1)
       SELECT source, n_docs, root_hash FROM root ORDER BY 1""",
    note="tamper-evident dataset manifest: per source, a two-level "
    "Merkle-style digest (leaf = content md5, root = md5 of the "
    "doc_id-ordered leaf-prefix concatenation) — the release "
    "artifact that lets any consumer verify a 100TB shard without "
    "re-reading it: one changed byte in one document flips the "
    "source's root.  Leaves are one map pass; the ordered fold is "
    "per-source (bounded) and the manifest is |sources| rows.  "
    "q79's commutative checksum trades order-sensitivity for "
    "mergeability; this trades the other way for cryptographic "
    "structure",
)
def m08(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    leaf = d.select("source", "doc_id", F.md5(F.col("text")).alias("h"))
    return (
        leaf.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.md5(
                F.concat_ws(
                    "",
                    F.expr(
                        "transform(array_sort(collect_list(struct(doc_id, substring(h, 1, 16) AS hp))), x -> x.hp)"
                    ),
                ).cast("binary")
            ).alias("root_hash"),
        )
        .orderBy("source")
    )


@_l(
    "l58_curation_funnel",
    """WITH t AS (SELECT doc_id, lang, n_chars,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS toks,
         len(list_distinct(list_filter(string_split(text, ' '),
           x -> x <> ''))) AS utoks
       FROM documents),
       f AS (SELECT doc_id,
         CASE WHEN n_chars >= 100 THEN 1 ELSE 0 END AS s1,
         CASE WHEN n_chars >= 100 AND toks >= 20 THEN 1 ELSE 0 END AS s2,
         CASE WHEN n_chars >= 100 AND toks >= 20
              AND 10 * utoks >= 3 * toks THEN 1 ELSE 0 END AS s3,
         CASE WHEN n_chars >= 100 AND toks >= 20
              AND 10 * utoks >= 3 * toks
              AND lang IN ('en', 'de', 'fr') THEN 1 ELSE 0 END AS s4
       FROM t),
       m AS (SELECT count(*) AS n0, CAST(sum(s1) AS BIGINT) AS n1,
             CAST(sum(s2) AS BIGINT) AS n2, CAST(sum(s3) AS BIGINT) AS n3,
             CAST(sum(s4) AS BIGINT) AS n4 FROM f)
       SELECT stage, n_remaining, lag_n - n_remaining AS n_dropped FROM (
         SELECT 'a_all' AS stage, n0 AS n_remaining, n0 AS lag_n FROM m
         UNION ALL SELECT 'b_min_length', n1, n0 FROM m
         UNION ALL SELECT 'c_min_tokens', n2, n1 FROM m
         UNION ALL SELECT 'd_diversity', n3, n2 FROM m
         UNION ALL SELECT 'e_lang_allowlist', n4, n3 FROM m) u
       ORDER BY 1""",
    note="curation eligibility funnel: documents surviving each "
    "successive quality gate (min length -> min tokens -> distinct-"
    "token diversity >= 0.3, integer-compared -> language "
    "allowlist) with per-stage drop counts — the one-look answer to "
    "'which filter is eating my corpus', composing the L-suite's "
    "individual signals into the pipeline they actually form.  One "
    "tokenize pass computes every gate flag; the funnel itself is "
    "five scalars",
)
def l58(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    toks = F.expr("filter(split(text, ' '), x -> x <> '')")
    t = d.select(
        "lang",
        "n_chars",
        F.size(toks).alias("toks"),
        F.size(F.array_distinct(toks)).alias("utoks"),
    )
    s1 = F.col("n_chars") >= 100
    s2 = s1 & (F.col("toks") >= 20)
    s3 = s2 & (10 * F.col("utoks") >= 3 * F.col("toks"))
    s4 = s3 & F.col("lang").isin("en", "de", "fr")
    flag = lambda c: F.sum(F.when(c, 1).otherwise(0))
    m = t.agg(
        F.count(F.lit(1)).alias("n0"),
        flag(s1).alias("n1"),
        flag(s2).alias("n2"),
        flag(s3).alias("n3"),
        flag(s4).alias("n4"),
    )
    rows = [
        ("a_all", "n0", "n0"),
        ("b_min_length", "n1", "n0"),
        ("c_min_tokens", "n2", "n1"),
        ("d_diversity", "n3", "n2"),
        ("e_lang_allowlist", "n4", "n3"),
    ]
    out = None
    for stage, cur, prev in rows:
        r = m.select(
            F.lit(stage).alias("stage"),
            F.col(cur).alias("n_remaining"),
            (F.col(prev) - F.col(cur)).alias("n_dropped"),
        )
        out = r if out is None else out.unionAll(r)
    return out.orderBy("stage")


@_l(
    "l59_signed_projection",
    """WITH q AS (SELECT vec_id,
         list_transform(embedding, x -> CAST(floor(x * 1000 + 0.5) AS BIGINT))
           AS qv FROM embeddings),
       e AS (SELECT vec_id, i.i AS d, list_extract(qv, i.i + 1) AS val
             FROM q CROSS JOIN range(64) i(i)),
       c AS (SELECT p.i AS p, d.i AS d,
         CASE WHEN strpos('0123456789abcdef',
             substring(md5(p.i || ':' || d.i), 1, 1)) - 1 < 8
           THEN 1 ELSE -1 END AS coef
         FROM range(16) p(i) CROSS JOIN range(64) d(i)),
       dots AS (SELECT e.vec_id, c.p,
         CAST(sum(c.coef * e.val) AS BIGINT) AS dot
         FROM e JOIN c ON c.d = e.d GROUP BY 1, 2),
       sigs AS (SELECT vec_id, CAST(sum(
           (CASE WHEN dot > 0 THEN 1 ELSE 0 END) * (1 << p)) AS BIGINT)
           AS sig FROM dots GROUP BY 1)
       SELECT sig, count(*) AS n FROM sigs GROUP BY 1
       ORDER BY n DESC, sig LIMIT 20""",
    note="sign-random-projection signatures made ORACLE-CHECKABLE: 16 "
    "pseudo-random +-1 hyperplanes derived from content hashes "
    "(md5(plane:dim) digit), dotted against 3-decimal-quantized "
    "vectors in EXACT integer arithmetic, sign bits packed into a "
    "16-bit bucket id — the same hyperplane-LSH family as the "
    "rows-only l12 ANN, but with every bit reproducible in SQL, so "
    "the bucket histogram (the ANN index's load profile) is hash-"
    "verified.  The 1024-row coefficient table broadcasts; one "
    "shuffle on (vec, plane)",
)
def l59(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = Catalog(spark, sf_dir).table("embeddings")
    q = em.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CAST(floor(x * 1000 + 0.5) AS BIGINT))"
        ).alias("qv"),
    )
    e = q.select("vec_id", F.posexplode("qv").alias("d", "val"))
    planes = spark.range(16).select(F.col("id").alias("p"))
    dims = spark.range(64).select(F.col("id").alias("cd"))
    coef = planes.crossJoin(dims).select(
        "p",
        "cd",
        F.when(
            F.instr(
                F.lit("0123456789abcdef"),
                F.substring(
                    F.md5(F.concat_ws(":", F.col("p"), F.col("cd"))), 1, 1
                ),
            )
            - 1
            < 8,
            1,
        )
        .otherwise(-1)
        .alias("coef"),
    )
    dots = (
        e.join(F.broadcast(coef), F.col("cd") == F.col("d"))
        .groupBy("vec_id", "p")
        .agg(F.sum(F.col("coef") * F.col("val")).alias("dot"))
    )
    sigs = dots.groupBy("vec_id").agg(
        F.sum(
            F.when(F.col("dot") > 0, 1).otherwise(0) * F.expr("shiftleft(1, p)")
        ).cast("long").alias("sig")
    )
    return (
        sigs.groupBy("sig")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "sig")
        .limit(20)
    )


@_l(
    "l60_corpus_diff",
    """WITH tok AS (SELECT doc_id % 2 AS half,
         unnest(string_split(text, ' ')) AS term FROM documents),
       f AS (SELECT term,
         CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b
         FROM tok WHERE term <> '' GROUP BY 1),
       t AS (SELECT CAST(sum(a) AS BIGINT) AS ta,
             CAST(sum(b) AS BIGINT) AS tb FROM f),
       lo AS (SELECT term, a, b,
         round(ln((CAST(2 * a + 1 AS DOUBLE) / (2 * (ta + 1)))
           / (CAST(2 * b + 1 AS DOUBLE) / (2 * (tb + 1)))), 4) AS log_odds
         FROM f CROSS JOIN t)
       SELECT term, a AS n_half0, b AS n_half1, log_odds FROM lo
       ORDER BY abs(log_odds) DESC, term LIMIT 20""",
    note="corpus-diff by smoothed log-odds: the 20 terms whose "
    "frequency shifts most between the two corpus halves (even/odd "
    "doc_id standing in for 'before/after a pipeline change') — the "
    "token-level diagnosis behind l56's centroid drift and q91's "
    "PSI: WHICH vocabulary moved, not just how much.  Laplace "
    "smoothing is kept integral ((2k+1)/(2(T+1))) so both engines "
    "feed identical doubles into one ln per term; ranking is on "
    "the ROUNDED score with a term tie-break",
)
def l60(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    tok = d.select(
        (F.col("doc_id") % 2).alias("half"),
        F.explode(F.split("text", " ")).alias("term"),
    ).filter(F.col("term") != "")
    f = tok.groupBy("term").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("a"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("b"),
    )
    t = f.agg(F.sum("a").alias("ta"), F.sum("b").alias("tb"))
    lo = f.crossJoin(F.broadcast(t)).select(
        "term",
        "a",
        "b",
        F.round(
            F.log(
                ((2 * F.col("a") + 1).cast("double") / (2 * (F.col("ta") + 1)))
                / ((2 * F.col("b") + 1).cast("double") / (2 * (F.col("tb") + 1)))
            ),
            4,
        ).alias("log_odds"),
    )
    return (
        lo.select(
            "term", F.col("a").alias("n_half0"), F.col("b").alias("n_half1"), "log_odds"
        )
        .orderBy(F.abs(F.col("log_odds")).desc(), "term")
        .limit(20)
    )


@_l(
    "m09_pyramid_plan",
    """WITH m AS (SELECT source, doc_id, octet_length(encode(text)) AS nb
         FROM documents),
       lv AS (SELECT source, doc_id, nb, unnest(generate_series(0, 20)) AS k
              FROM m),
       keep AS (SELECT source, doc_id, k,
         CAST((nb + (1 << k) - 1) // (1 << k) AS BIGINT) AS lb
         FROM lv WHERE k = 0
           OR (nb + (1 << k) - 1) // (1 << k) >= 64),
       per AS (SELECT source, doc_id,
         CAST(sum(lb) AS BIGINT) AS pyr,
         CAST(max(CASE WHEN k = 0 THEN lb END) AS BIGINT) AS base,
         count(*) AS n_levels FROM keep GROUP BY 1, 2)
       SELECT source, count(*) AS n_docs,
         CAST(sum(base) AS BIGINT) AS base_bytes,
         CAST(sum(pyr) AS BIGINT) AS pyramid_bytes,
         CAST(max(n_levels) AS BIGINT) AS max_levels,
         round(CAST(sum(pyr) AS DOUBLE) / sum(base), 4) AS overhead
       FROM per GROUP BY 1 ORDER BY 1""",
    note="thumbnail/mip pyramid storage planner: per payload, the "
    "halving-resolution level chain down to a 64-byte floor (level "
    "bytes = ceil(n / 2^k), exact integer shift arithmetic), rolled "
    "up per source into base vs pyramid bytes and the storage "
    "overhead ratio — the capacity answer (geometric series says "
    "~2x; the exact plan says precisely, including the floor "
    "cutoff) a media lake needs BEFORE materializing derived "
    "assets.  Level expansion is a bounded 21-way explode pruned "
    "immediately; codec stubs never run",
)
def m09(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    m = d.select(
        "source",
        "doc_id",
        F.octet_length(F.encode(F.col("text"), "utf-8")).cast("long").alias("nb"),
    )
    lv = m.select(
        "source", "doc_id", "nb", F.explode(F.sequence(F.lit(0), F.lit(20))).alias("k")
    )
    lb = F.expr("(nb + shiftleft(1, k) - 1) DIV shiftleft(1, k)")
    keep = lv.select("source", "doc_id", "k", lb.alias("lb")).filter(
        (F.col("k") == 0) | (F.col("lb") >= 64)
    )
    per = keep.groupBy("source", "doc_id").agg(
        F.sum("lb").alias("pyr"),
        F.max(F.when(F.col("k") == 0, F.col("lb"))).alias("base"),
        F.count(F.lit(1)).alias("n_levels"),
    )
    return (
        per.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("base").alias("base_bytes"),
            F.sum("pyr").alias("pyramid_bytes"),
            F.max("n_levels").alias("max_levels"),
            F.round(
                F.sum("pyr").cast("double") / F.sum("base"), 4
            ).alias("overhead"),
        )
        .orderBy("source")
    )


@_l(
    "l61_window_dedup_recall",
    """WITH docs AS (SELECT doc_id,
         list_filter(string_split(text,' '), x -> x <> '') AS l
       FROM documents),
       sh AS (SELECT DISTINCT doc_id, s[1] || ' ' || s[2] AS shingle
              FROM (SELECT doc_id, unnest(list_zip(l, l[2:])) AS s FROM docs) z
              WHERE s[2] IS NOT NULL),
       sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
       inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
                 FROM sh a JOIN sh b ON a.shingle=b.shingle AND a.doc_id<b.doc_id
                 GROUP BY 1,2),
       pairs AS (SELECT a, b FROM inter
                 JOIN sizes sa ON sa.doc_id=a JOIN sizes sb ON sb.doc_id=b
                 WHERE 100 * i >= 12 * (sa.sz + sb.sz - i)),
       m AS (SELECT count(*) AS total,
             CAST(sum(CASE WHEN b - a <= 50 THEN 1 ELSE 0 END) AS BIGINT)
               AS in_window FROM pairs)
       SELECT total AS n_dup_pairs, in_window AS n_within_50,
         round(CAST(in_window AS DOUBLE) / nullif(total, 0), 4)
           AS window_recall
       FROM m""",
    note="bounded-memory dedup recall: of all near-duplicate pairs "
    "(shingle Jaccard >= 0.12, integer-compared), how many fall "
    "within 50 documents of each other in ingestion order — the "
    "recall a STREAMING dedup filter with a 50-doc trailing buffer "
    "would achieve, measured before anyone commits to bounded "
    "state.  High recall means duplicates cluster temporally "
    "(typical of crawl bursts) and the cheap filter suffices; low "
    "means only the full l19-style join catches them.  Same "
    "inverted-index candidates as every dedup op",
)
def l61(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import word_shingles

    d = Catalog(spark, sf_dir).table("documents")
    sh = word_shingles(d, 2)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("a"), "shingle")
    b = sh.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    pairs = (
        inter.join(
            F.broadcast(sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sza"))),
            "a",
        )
        .join(
            F.broadcast(sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("szb"))),
            "b",
        )
        .filter(
            100 * F.col("i") >= 12 * (F.col("sza") + F.col("szb") - F.col("i"))
        )
    )
    m = pairs.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(F.col("b") - F.col("a") <= 50, 1).otherwise(0)).alias(
            "in_window"
        ),
    )
    return m.select(
        F.col("total").alias("n_dup_pairs"),
        F.col("in_window").alias("n_within_50"),
        F.round(
            F.col("in_window").cast("double") / F.nullif(F.col("total"), F.lit(0)),
            4,
        ).alias("window_recall"),
    )


@_l(
    "l62_truncation_loss",
    """WITH t AS (SELECT CAST((length(text) + 3) // 4 AS BIGINT) AS toks
         FROM documents),
       c AS (SELECT l.lim, count(*) AS n_docs,
         CAST(sum(CASE WHEN toks > l.lim THEN 1 ELSE 0 END) AS BIGINT)
           AS n_truncated,
         CAST(sum(toks) AS BIGINT) AS total_toks,
         CAST(sum(CASE WHEN toks > l.lim THEN toks - l.lim ELSE 0 END)
           AS BIGINT) AS lost_toks
         FROM t CROSS JOIN (VALUES (128), (512), (2048)) l(lim)
         GROUP BY 1)
       SELECT CAST(lim AS INT) AS context_limit, n_truncated,
         lost_toks,
         round(CAST(lost_toks AS DOUBLE) / total_toks, 4) AS loss_share
       FROM c ORDER BY 1""",
    note="context-window truncation loss: for candidate limits "
    "(128/512/2048 tokens under the l10 budget estimate), how many "
    "documents get cut and what fraction of corpus tokens falls off "
    "the end — the picks-the-max-seq-len table that balances "
    "padding waste (limit too high, see l32 pack efficiency) "
    "against information loss (too low).  One scan, three what-ifs "
    "via a 3-row broadcast, exact integer token arithmetic",
)
def l62(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    t = d.select(
        F.floor((F.length("text") + 3) / 4).cast("long").alias("toks")
    )
    lims = spark.createDataFrame([(128,), (512,), (2048,)], ["lim"])
    c = (
        t.crossJoin(F.broadcast(lims))
        .groupBy("lim")
        .agg(
            F.sum(F.when(F.col("toks") > F.col("lim"), 1).otherwise(0)).alias(
                "n_truncated"
            ),
            F.sum("toks").alias("total_toks"),
            F.sum(
                F.when(
                    F.col("toks") > F.col("lim"), F.col("toks") - F.col("lim")
                ).otherwise(0)
            ).alias("lost_toks"),
        )
    )
    return c.select(
        F.col("lim").cast("int").alias("context_limit"),
        "n_truncated",
        "lost_toks",
        F.round(F.col("lost_toks").cast("double") / F.col("total_toks"), 4).alias(
            "loss_share"
        ),
    ).orderBy("context_limit")


@_l(
    "l63_lsh_recall_curve",
    """WITH tok AS (SELECT DISTINCT d.doc_id, t.term FROM documents d,
         unnest(string_split(d.text,' ')) AS t(term)
         WHERE t.term<>'' AND d.doc_id < 60),
       sigs AS (SELECT doc_id, i.i AS i, min(md5(i.i || ':' || term)) AS sig
                FROM tok CROSS JOIN range(16) i(i) GROUP BY 1,2),
       cfg AS (SELECT unnest([2,4,8]) AS r),
       bands AS (SELECT s.doc_id, c.r, s.i // c.r AS band,
                 string_agg(s.sig, ',' ORDER BY s.i) AS bkey
                 FROM sigs s CROSS JOIN cfg c GROUP BY 1,2,3),
       cand AS (SELECT DISTINCT a.r, a.doc_id AS i, b.doc_id AS j
                FROM bands a JOIN bands b ON a.r=b.r AND a.band=b.band
                  AND a.bkey=b.bkey AND a.doc_id < b.doc_id),
       nt AS (SELECT doc_id, count(*) AS c FROM tok GROUP BY 1),
       tj AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS inter
              FROM tok a JOIN tok b ON a.term=b.term AND a.doc_id<b.doc_id
              GROUP BY 1,2),
       truth AS (SELECT t.i, t.j FROM tj t
                 JOIN nt na ON na.doc_id=t.i JOIN nt nb ON nb.doc_id=t.j
                 WHERE 10 * t.inter >= 3 * (na.c + nb.c - t.inter)),
       ntr AS (SELECT count(*) AS ntv FROM truth),
       per AS (SELECT c.r, count(*) AS n_cand,
                 count(*) FILTER (WHERE tr.i IS NOT NULL) AS tp
               FROM cand c LEFT JOIN truth tr ON tr.i=c.i AND tr.j=c.j
               GROUP BY 1)
       SELECT CAST(16 // p.r AS BIGINT) AS n_bands,
              CAST(p.r AS BIGINT) AS rows_per_band,
              CAST(p.n_cand AS BIGINT) AS n_cand,
              CAST(p.tp AS BIGINT) AS tp,
              round(CAST(p.tp AS DOUBLE) / nullif(ntr.ntv, 0), 4) AS recall
       FROM per p CROSS JOIN ntr
       ORDER BY rows_per_band""",
    note="recall-vs-COST curve for MinHash-LSH banding: ONE query "
    "sweeps three band configurations (8x2 / 4x4 / 2x8 over the same "
    "16 signatures) and reports candidate volume (the cost driver — "
    "every candidate is an exact-verify pair) against recall of the "
    "exact Jaccard>=0.3 truth set.  The sweep is a tiny cross join "
    "against a 3-row config table, so the signature pass runs ONCE "
    "for all curve points — this is how banding parameters get "
    "chosen BEFORE a corpus-scale dedup run (l45 evaluates one "
    "point; l54 estimates cost without running; this measures both "
    "axes).  More rows/band -> fewer, higher-precision candidates",
)
def l63(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_signatures, tokens

    d = Catalog(spark, sf_dir).table("documents").filter(F.col("doc_id") < 60)
    tok = tokens(d).distinct()
    sigs = minhash_signatures(d, k=16)
    cfg = spark.range(1).select(
        F.explode(F.array(F.lit(2), F.lit(4), F.lit(8))).alias("r")
    )
    bands = (
        sigs.crossJoin(F.broadcast(cfg))
        .groupBy("doc_id", "r", F.floor(F.col("i") / F.col("r")).alias("band"))
        .agg(
            F.array_join(
                F.expr("transform(array_sort(collect_list(struct(i, sig))), x -> x.sig)"),
                ",",
            ).alias("bkey")
        )
    )
    ba = bands.select("r", F.col("doc_id").alias("i"), "band", "bkey")
    bb = bands.select(
        F.col("r").alias("r2"),
        F.col("doc_id").alias("j"),
        F.col("band").alias("b2"),
        F.col("bkey").alias("k2"),
    )
    cand = (
        ba.join(
            bb,
            (F.col("r") == F.col("r2"))
            & (F.col("band") == F.col("b2"))
            & (F.col("bkey") == F.col("k2"))
            & (F.col("i") < F.col("j")),
        )
        .select("r", "i", "j")
        .distinct()
    )
    nt = tok.groupBy(F.col("doc_id").alias("d")).agg(F.count(F.lit(1)).alias("c"))
    ta = tok.select(F.col("doc_id").alias("i"), "term")
    tb = tok.select(F.col("doc_id").alias("j"), "term")
    tj = (
        ta.join(tb, "term")
        .filter(F.col("i") < F.col("j"))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    truth = (
        tj.join(nt.select(F.col("d").alias("i"), F.col("c").alias("ca")), "i")
        .join(nt.select(F.col("d").alias("j"), F.col("c").alias("cb")), "j")
        .filter(10 * F.col("inter") >= 3 * (F.col("ca") + F.col("cb") - F.col("inter")))
        .select("i", "j")
    )
    per = (
        cand.join(truth.withColumn("t", F.lit(1)), ["i", "j"], "left")
        .groupBy("r")
        .agg(
            F.count(F.lit(1)).alias("n_cand"),
            F.sum(F.when(F.col("t").isNotNull(), 1).otherwise(0)).alias("tp"),
        )
    )
    ntr = truth.agg(F.count(F.lit(1)).alias("ntv"))
    return (
        per.crossJoin(F.broadcast(ntr))
        .select(
            (F.lit(16) / F.col("r")).cast("bigint").alias("n_bands"),
            F.col("r").cast("bigint").alias("rows_per_band"),
            F.col("n_cand"),
            F.col("tp"),
            F.round(
                F.col("tp").cast("double") / F.nullif(F.col("ntv"), F.lit(0)), 4
            ).alias("recall"),
        )
        .orderBy("rows_per_band")
    )


@_l(
    "l64_dup_ngram_share",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l
                     FROM documents WHERE doc_id < 200),
       g AS (SELECT DISTINCT doc_id,
               array_to_string(l[i : i+4], ' ') AS gram
             FROM (SELECT doc_id, l,
                     unnest(generate_series(1, len(l) - 4)) AS i
                   FROM toks) u),
       dc AS (SELECT gram, count(DISTINCT doc_id) AS nd FROM g GROUP BY 1),
       per AS (SELECT g.doc_id, count(*) AS n_grams,
               count(*) FILTER (WHERE dc.nd >= 2) AS dup_grams
               FROM g JOIN dc USING (gram) GROUP BY 1)
       SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
              CAST(dup_grams AS BIGINT) AS dup_grams,
              round(CAST(dup_grams AS DOUBLE) / n_grams, 4) AS dup_share
       FROM per ORDER BY doc_id""",
    note="per-document duplicated-5-gram share — the memorization-risk "
    "metric: which documents are mostly made of n-grams that occur in "
    "OTHER documents (boilerplate, templated spam, near-dups that "
    "survived doc-level dedup).  Shape is explode-to-grams -> gram "
    "frequency groupBy (map-side combined) -> join back — the "
    "inverted-index pattern; at corpus scale the gram table is the "
    "big intermediate, so hash grams to 64-bit (xxhash) and bucket "
    "the join key; no all-pairs anywhere",
)
def l64(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents").filter(F.col("doc_id") < 200)
    toks = d.select("doc_id", F.split("text", " ").alias("l"))
    g = (
        toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    "CASE WHEN size(l) >= 5 THEN "
                    "transform(sequence(0, size(l) - 5), i -> concat_ws(' ', slice(l, i + 1, 5))) "
                    "ELSE array() END"
                )
            ).alias("gram"),
        )
        .distinct()
    )
    dc = g.groupBy("gram").agg(F.countDistinct("doc_id").alias("nd"))
    per = (
        g.join(dc, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0)).alias("dup_grams"),
        )
    )
    return per.select(
        "doc_id",
        "n_grams",
        "dup_grams",
        F.round(F.col("dup_grams").cast("double") / F.col("n_grams"), 4).alias("dup_share"),
    ).orderBy("doc_id")


@_l(
    "l65_tokenizer_fertility",
    """WITH t AS (SELECT lang,
         len(regexp_extract_all(text, '[a-zA-Z]{1,4}|[0-9]|[^a-zA-Z0-9 ]')) AS pieces,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS words
       FROM documents)
       SELECT lang, sum(pieces)::BIGINT AS pieces, sum(words)::BIGINT AS words,
              round(sum(pieces)::DOUBLE / sum(words), 4) AS fertility
       FROM t GROUP BY 1 ORDER BY 1""",
    note="tokenizer FERTILITY per language: subword pieces (BPE-ish "
    "greedy <=4-letter chunks + digits + punctuation) per whitespace "
    "word — the metric that prices a tokenizer against a corpus "
    "(fertility ~1 = efficient; >2 = the language pays double context "
    "budget).  Drives mixing/packing decisions together with l37/l28; "
    "pure codegen regex over the scan, no UDF, one combinable groupBy",
)
def l65(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    pieces = F.size(
        F.regexp_extract_all("text", F.lit("[a-zA-Z]{1,4}|[0-9]|[^a-zA-Z0-9 ]"), 0)
    )
    words = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    return (
        docs.select("lang", pieces.alias("p"), words.alias("w"))
        .groupBy("lang")
        .agg(
            F.sum("p").cast("bigint").alias("pieces"),
            F.sum("w").cast("bigint").alias("words"),
            F.round(F.sum("p").cast("double") / F.sum("w"), 4).alias("fertility"),
        )
        .orderBy("lang")
    )


def _semdedup_oracle(k: int = 8, iters: int = 2, dim: int = 64, tau: float = 0.3) -> str:
    chain, final = _kmeans_chain(k, iters, dim)
    return f"""WITH {chain},
nrm AS (SELECT vec_id, sqrt(list_inner_product(v, v)) AS nrm FROM e),
p AS (SELECT a.cid, a.vec_id AS va, b.vec_id AS vb,
        list_inner_product(ea.v, eb.v) / (na.nrm * nb.nrm) AS sim
      FROM {final} a JOIN {final} b ON a.cid = b.cid AND a.vec_id < b.vec_id
      JOIN e ea ON ea.vec_id = a.vec_id JOIN e eb ON eb.vec_id = b.vec_id
      JOIN nrm na ON na.vec_id = a.vec_id JOIN nrm nb ON nb.vec_id = b.vec_id),
dups AS (SELECT cid, va, vb FROM p WHERE sim >= {tau}),
rem AS (SELECT cid, count(DISTINCT vb) AS n_removed, count(*) AS n_dup_pairs
        FROM dups GROUP BY 1),
tot AS (SELECT cid, count(*) AS n FROM {final} GROUP BY 1)
SELECT CAST(t.cid AS INT) AS cluster_id, t.n,
       CAST(coalesce(r.n_dup_pairs, 0) AS BIGINT) AS n_dup_pairs,
       CAST(coalesce(r.n_removed, 0) AS BIGINT) AS n_removed,
       round((t.n - coalesce(r.n_removed, 0)) * 1.0 / t.n, 4) AS keep_ratio
FROM tot t LEFT JOIN rem r ON r.cid = t.cid ORDER BY 1"""


@_l(
    "l66_semdedup",
    _semdedup_oracle(),
    note="SemDeDup (Abbas et al. 2023): embedding-space semantic "
    "deduplication — k-means cells first, then cosine pairs ONLY "
    "within a cell, remove every vector that duplicates (sim >= 0.3, "
    "calibrated to the synthetic corpus) a lower-id vector in its "
    "cell.  The cell partition turns the O(n^2) corpus pair scan "
    "into k independent within-cell scans — the same candidate-"
    "pruning role the LSH band plays for MinHash; at 100 TB the "
    "cells come from the IVF index (kmeans_lloyd), the corpus is "
    "hash-partitioned by cid so the self-join is co-located, and "
    "per-cell cost is bounded by balancing k with corpus size "
    "(cells >> sqrt(n)).  Oracle unrolls the identical kmeans "
    "schedule then replays the within-cell pair math in SQL",
)
def l66(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import kmeans_lloyd

    emb = Catalog(spark, sf_dir).table("embeddings")
    assigned = kmeans_lloyd(emb, k=8, iters=2)
    dot = lambda u, w: F.aggregate(  # noqa: E731
        F.zip_with(u, w, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    nrmed = assigned.select(
        "cid", "vec_id", "v", F.sqrt(dot("v", "v")).alias("nrm")
    ).localCheckpoint(eager=True)
    a = nrmed.select(
        "cid",
        F.col("vec_id").alias("va"),
        F.col("v").alias("av"),
        F.col("nrm").alias("na"),
    )
    b = nrmed.select(
        "cid",
        F.col("vec_id").alias("vb"),
        F.col("v").alias("bv"),
        F.col("nrm").alias("nb"),
    )
    p = (
        a.join(b, "cid")
        .filter(F.col("va") < F.col("vb"))
        .withColumn("sim", dot("av", "bv") / (F.col("na") * F.col("nb")))
    )
    dups = p.filter(F.col("sim") >= 0.3)
    rem = dups.groupBy("cid").agg(
        F.countDistinct("vb").alias("n_removed"),
        F.count(F.lit(1)).alias("n_dup_pairs"),
    )
    tot = nrmed.groupBy("cid").agg(F.count(F.lit(1)).alias("n"))
    return (
        tot.join(rem, "cid", "left")
        .select(
            F.col("cid").cast("int").alias("cluster_id"),
            "n",
            F.coalesce("n_dup_pairs", F.lit(0)).cast("long").alias("n_dup_pairs"),
            F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
            F.round(
                (F.col("n") - F.coalesce("n_removed", F.lit(0))) * 1.0 / F.col("n"), 4
            ).alias("keep_ratio"),
        )
        .orderBy("cluster_id")
    )


@_l(
    "l67_substring_spans",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
       g AS (SELECT doc_id, i, array_to_string(l[i : i+7], ' ') AS gram
             FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - 7)) AS i
                   FROM toks) u),
       m AS (SELECT a.doc_id AS da, b.doc_id AS db, a.i AS ia, b.i AS ib
             FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id),
       runs AS (SELECT da, db, ia - ib AS diag,
                ia - row_number() OVER (PARTITION BY da, db, ia - ib ORDER BY ia) AS isl
                FROM m),
       spans AS (SELECT da, db, count(*) + 7 AS span_tokens
                 FROM runs GROUP BY da, db, diag, isl)
       SELECT da, db, CAST(count(*) AS BIGINT) AS n_spans,
              CAST(max(span_tokens) AS BIGINT) AS max_span,
              CAST(sum(span_tokens - 7) AS BIGINT) AS n_grams
       FROM spans GROUP BY 1, 2 ORDER BY 1, 2""",
    note="exact-substring duplicate spans (the Lee et al. 2022 "
    "'Deduplicating Training Data Makes Language Models Better' "
    "suffix-array semantic, re-expressed relationally): 8-token "
    "grams with positions, equi-joined across documents on the gram "
    "key, then consecutive matched positions merged into maximal "
    "shared spans with the gaps-and-islands trick on the (pos_a - "
    "pos_b) diagonal — two window functions, no suffix array, no "
    "all-pairs.  At 100 TB the gram key is xxhash64'd (8B instead "
    "of the string), the join is the inverted-index shape bucketed "
    "on the gram hash, and hot boilerplate grams are capped by a "
    "posting-length filter exactly like the MinHash band join",
)
def l67(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    toks = d.select("doc_id", F.split("text", " ").alias("l"))
    g = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(l) >= 8 THEN "
                "transform(sequence(1, size(l) - 7), "
                "i -> struct(i AS i, concat_ws(' ', slice(l, i, 8)) AS gram)) "
                "ELSE array() END"
            )
        ).alias("s"),
    ).select("doc_id", F.col("s.i").alias("i"), F.col("s.gram").alias("gram"))
    a = g.select(F.col("doc_id").alias("da"), F.col("i").alias("ia"), "gram")
    b = g.select(F.col("doc_id").alias("db"), F.col("i").alias("ib"), "gram")
    m = a.join(b, "gram").filter(F.col("da") < F.col("db")).select("da", "db", "ia", "ib")
    w = Window.partitionBy("da", "db", F.col("ia") - F.col("ib")).orderBy("ia")
    runs = m.select(
        "da",
        "db",
        (F.col("ia") - F.col("ib")).alias("diag"),
        (F.col("ia") - F.row_number().over(w)).alias("isl"),
    )
    spans = runs.groupBy("da", "db", "diag", "isl").agg(
        (F.count(F.lit(1)) + 7).alias("span_tokens")
    )
    return (
        spans.groupBy("da", "db")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.max("span_tokens").alias("max_span"),
            F.sum(F.col("span_tokens") - 7).alias("n_grams"),
        )
        .orderBy("da", "db")
    )


@_l(
    "l68_zipf_slope",
    """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
       tf AS (SELECT term, count(*) AS c FROM tok WHERE term <> '' GROUP BY 1),
       rk AS (SELECT term, c,
              row_number() OVER (ORDER BY c DESC, term) AS r FROM tf),
       top AS (SELECT ln(r::DOUBLE) AS lx, ln(c::DOUBLE) AS ly
               FROM rk WHERE r <= 100)
       SELECT CAST((SELECT count(*) FROM tf) AS BIGINT) AS n_terms,
              round(regr_slope(ly, lx), 4) AS slope,
              round(regr_intercept(ly, lx), 4) AS intercept,
              round(regr_r2(ly, lx), 4) AS r2
       FROM top""",
    note="Zipf-law fit of the corpus unigram distribution: OLS of "
    "ln(freq) on ln(rank) over the top-100 ranks (slope ~ -1 for "
    "natural text; a flat slope flags synthetic/templated corpora, a "
    "cliff flags boilerplate floods — a standard corpus-health gate "
    "before pretraining).  One explode -> groupBy for term counts "
    "(map-side combined), one 100-row window for ranks, and the "
    "regression is a built-in distributive aggregate in BOTH engines "
    "(regr_slope/intercept/r2) — sufficient statistics only, nothing "
    "driver-side; at 100 TB the term table is the only shuffle and "
    "it's the inverted-index build every other text op already pays",
)
def l68(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    tok = d.select(F.explode(F.split("text", " ")).alias("term")).filter(
        F.col("term") != ""
    )
    tf = tok.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    rk = tf.withColumn(
        "r", F.row_number().over(Window.orderBy(F.col("c").desc(), "term"))
    )
    top = rk.filter(F.col("r") <= 100).select(
        F.log(F.col("r").cast("double")).alias("lx"),
        F.log(F.col("c").cast("double")).alias("ly"),
    )
    n_terms = tf.agg(F.count(F.lit(1)).alias("n_terms"))
    fit = top.agg(
        F.round(F.expr("regr_slope(ly, lx)"), 4).alias("slope"),
        F.round(F.expr("regr_intercept(ly, lx)"), 4).alias("intercept"),
        F.round(F.expr("regr_r2(ly, lx)"), 4).alias("r2"),
    )
    return n_terms.crossJoin(fit).select("n_terms", "slope", "intercept", "r2")


def _pq_oracle(
    n_sub: int = 4, sub_dim: int = 16, k: int = 8, iters: int = 2
) -> str:
    """Per-subspace unrolled Lloyd chains (the l35 schedule applied to
    each 16-dim slice) + a UNION ALL of the per-subspace code
    assignment summaries — product quantization's codebook build."""
    parts = []
    finals = []
    for sp in range(n_sub):
        lo = sp * sub_dim + 1
        hi = (sp + 1) * sub_dim
        diff = f"list_transform(range(1, {sub_dim + 1}), j -> e.v[j] - i.c[j])"
        parts.append(
            f"""e{sp} AS (SELECT vec_id,
       list_transform(range({lo}, {hi + 1}), j -> embedding[j]::DOUBLE) AS v
       FROM embeddings),
init{sp} AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS c
       FROM e{sp} ORDER BY vec_id LIMIT {k})"""
        )
        prev = f"init{sp}"
        for it in range(1, iters + 1):
            parts.append(
                f"""d{sp}_{it} AS (SELECT e.vec_id, i.cid,
       list_inner_product({diff}, {diff}) AS dist
       FROM e{sp} e CROSS JOIN {prev} i),
s{sp}_{it} AS (SELECT vec_id, cid, dist FROM (SELECT *, row_number() OVER
       (PARTITION BY vec_id ORDER BY dist, cid) AS rk FROM d{sp}_{it}) WHERE rk = 1)"""
            )
            if it < iters:
                parts.append(
                    f"""c{sp}_{it} AS (SELECT cid, list(av ORDER BY dim) AS c FROM (
       SELECT s.cid, j.j AS dim, avg(e.v[j.j]) AS av
       FROM s{sp}_{it} s JOIN e{sp} e ON e.vec_id = s.vec_id
       CROSS JOIN (SELECT unnest(range(1, {sub_dim + 1})) AS j) j
       GROUP BY 1, 2) GROUP BY 1)"""
                )
                prev = f"c{sp}_{it}"
        finals.append(
            f"SELECT {sp} AS subspace, CAST(cid AS INT) AS cid, count(*) AS n,\n"
            f"round(sum(dist), 2) AS inertia FROM s{sp}_{iters} GROUP BY 1, 2"
        )
    chain = ",\n".join(parts)
    union = "\nUNION ALL ".join(finals)
    return f"WITH {chain}\nSELECT * FROM ({union}) ORDER BY 1, 2"


@_l(
    "l69_product_quantization",
    _pq_oracle(),
    note="product quantization codebook build (Jegou et al., the "
    "billion-scale ANN memory workhorse): the 64-dim embedding is "
    "split into 4 independent 16-dim subspaces, each gets its own "
    "k=8 Lloyd codebook (2 rounds, deterministic lowest-id seeds "
    "and (dist, cid) tie-break — the l35 schedule), and a vector's "
    "code is the concatenation of its per-subspace cell ids: 4 "
    "bytes instead of 256, an asymmetric-distance-ready 64x "
    "compression.  Each subspace trains INDEPENDENTLY — at 100 TB "
    "that is 4 parallel l35-shaped jobs over sliced columns (slice "
    "pushes into the scan projection; only k-row codebooks ever "
    "reach the driver), and code assignment is the same broadcast "
    "cross-join + codegen fold as IVF.  Oracle unrolls all four "
    "chains and unions the per-subspace assignment summaries",
)
def l69(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import kmeans_lloyd

    emb = Catalog(spark, sf_dir).table("embeddings")
    outs = []
    for sp in range(4):
        sub = emb.select(
            "vec_id", F.slice("embedding", sp * 16 + 1, 16).alias("sub")
        )
        assigned = kmeans_lloyd(sub, k=8, iters=2, vec_col="sub")
        outs.append(
            assigned.groupBy(F.col("cid").cast("int").alias("cid"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("dist"), 2).alias("inertia"),
            )
            .select(F.lit(sp).alias("subspace"), "cid", "n", "inertia")
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.orderBy("subspace", "cid")


@_l(
    "l70_kneser_ney",
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
       bg AS (SELECT l[i] AS w1, l[i+1] AS w2
              FROM d, unnest(range(1, len(l))) t(i)
              WHERE l[i] <> '' AND l[i+1] <> ''),
       tb AS (SELECT count(*) AS n_bigram_types FROM
              (SELECT DISTINCT w1, w2 FROM bg)),
       cont AS (SELECT w2 AS term, count(DISTINCT w1) AS cont_cnt FROM bg GROUP BY 1),
       fol AS (SELECT w1 AS term, count(*) AS c1,
               count(DISTINCT w2) AS n_follow FROM bg GROUP BY 1)
       SELECT c.term, CAST(f.c1 AS BIGINT) AS c1,
              CAST(f.n_follow AS BIGINT) AS n_follow,
              CAST(c.cont_cnt AS BIGINT) AS cont_cnt,
              round(c.cont_cnt * 1.0 / tb.n_bigram_types, 6) AS p_cont,
              round(0.75 * f.n_follow / f.c1, 6) AS lambda
       FROM cont c JOIN fol f ON f.term = c.term CROSS JOIN tb
       ORDER BY cont_cnt DESC, c.term LIMIT 20""",
    note="Kneser-Ney smoothing component tables: per-term continuation "
    "count N1+(.w) (in how many DISTINCT left contexts does w appear "
    "— the insight that 'Francisco' is frequent but not versatile), "
    "continuation probability N1+(.w)/|distinct bigrams|, and the "
    "backoff weight lambda(w) = D*N1+(w.)/c(w) with the standard "
    "D=0.75 — everything an interpolated-KN bigram LM needs beyond "
    "raw counts.  Three groupBy passes over the exploded bigram "
    "stream (distinct-counting is the same shuffle shape as q11), "
    "exact integers until two final divisions; at 100 TB the bigram "
    "stream is hashed and the distinct counts become "
    "approx_count_distinct under a declared error budget",
)
def l70(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    toks = d.select(F.split("text", " ").alias("l"))
    bg = toks.select(
        F.explode(
            F.expr(
                "CASE WHEN size(l) >= 2 THEN "
                "transform(sequence(1, size(l) - 1), "
                "i -> struct(l[i-1] AS w1, l[i] AS w2)) "
                "ELSE array() END"
            )
        ).alias("b")
    ).select("b.w1", "b.w2").filter((F.col("w1") != "") & (F.col("w2") != ""))
    tb = bg.select("w1", "w2").distinct().agg(
        F.count(F.lit(1)).alias("n_bigram_types")
    )
    cont = bg.groupBy(F.col("w2").alias("term")).agg(
        F.countDistinct("w1").alias("cont_cnt")
    )
    fol = bg.groupBy(F.col("w1").alias("term")).agg(
        F.count(F.lit(1)).alias("c1"), F.countDistinct("w2").alias("n_follow")
    )
    return (
        cont.join(fol, "term")
        .crossJoin(F.broadcast(tb))
        .select(
            "term",
            "c1",
            "n_follow",
            "cont_cnt",
            F.round(F.col("cont_cnt") * 1.0 / F.col("n_bigram_types"), 6).alias("p_cont"),
            F.round(0.75 * F.col("n_follow") / F.col("c1"), 6).alias("lambda"),
        )
        .orderBy(F.col("cont_cnt").desc(), "term")
        .limit(20)
    )


@_l(
    "l71_unigram_kl",
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
         FROM documents),
       t2 AS (SELECT doc_id % 2 AS half, term FROM tok WHERE term <> ''),
       cp AS (SELECT term, count(*) AS c FROM t2 WHERE half = 0 GROUP BY 1),
       cq AS (SELECT term, count(*) AS c FROM t2 WHERE half = 1 GROUP BY 1),
       vocab AS (SELECT term FROM cp UNION SELECT term FROM cq),
       tots AS (SELECT (SELECT count(*) FROM t2 WHERE half = 0) AS np,
                       (SELECT count(*) FROM t2 WHERE half = 1) AS nq,
                       (SELECT count(*) FROM vocab) AS v),
       probs AS (SELECT v.term,
         (coalesce(cp.c, 0) + 1.0) / (t.np + t.v) AS p,
         (coalesce(cq.c, 0) + 1.0) / (t.nq + t.v) AS q
       FROM vocab v LEFT JOIN cp ON cp.term = v.term
       LEFT JOIN cq ON cq.term = v.term CROSS JOIN tots t)
       SELECT (SELECT v FROM tots)::BIGINT AS vocab,
              (SELECT np FROM tots)::BIGINT AS n_even,
              (SELECT nq FROM tots)::BIGINT AS n_odd,
              round(sum(p * ln(p / q)), 6) AS kl_pq,
              round(sum(q * ln(q / p)), 6) AS kl_qp
       FROM probs""",
    note="corpus drift as unigram KL divergence: the even-doc half is "
    "the reference distribution P, the odd half the candidate Q, "
    "add-one smoothing over the union vocabulary so no term "
    "zero-divides; KL(P||Q) and KL(Q||P) reported together (the "
    "asymmetry itself is diagnostic — new-batch-invents-words vs "
    "new-batch-drops-words).  The standard pre-training gate for "
    "'does this crawl batch look like the corpus we curated'.  Two "
    "term-count groupBys + a vocab outer join, all map-side "
    "combined; the KL sums are single distributive aggregates — at "
    "100 TB this runs per (source, date) cell as one shuffle",
)
def l71(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    tok = d.select(
        (F.col("doc_id") % 2).alias("half"),
        F.explode(F.split("text", " ")).alias("term"),
    ).filter(F.col("term") != "")
    cp = tok.filter(F.col("half") == 0).groupBy("term").agg(F.count(F.lit(1)).alias("c_p"))
    cq = tok.filter(F.col("half") == 1).groupBy("term").agg(F.count(F.lit(1)).alias("c_q"))
    vocab = cp.select("term").union(cq.select("term")).distinct()
    np_ = tok.filter(F.col("half") == 0).count()
    nq_ = tok.filter(F.col("half") == 1).count()
    v_ = vocab.count()
    probs = (
        vocab.join(cp, "term", "left")
        .join(cq, "term", "left")
        .select(
            ((F.coalesce("c_p", F.lit(0)) + 1.0) / F.lit(float(np_ + v_))).alias("p"),
            ((F.coalesce("c_q", F.lit(0)) + 1.0) / F.lit(float(nq_ + v_))).alias("q"),
        )
    )
    return probs.agg(
        F.lit(v_).cast("long").alias("vocab"),
        F.lit(np_).cast("long").alias("n_even"),
        F.lit(nq_).cast("long").alias("n_odd"),
        F.round(F.sum(F.col("p") * F.log(F.col("p") / F.col("q"))), 6).alias("kl_pq"),
        F.round(F.sum(F.col("q") * F.log(F.col("q") / F.col("p"))), 6).alias("kl_qp"),
    )


def _pq_adc_oracle(
    n_sub: int = 8,
    sub_dim: int = 8,
    k_cells: int = 16,
    shortlist: int = 150,
    topk: int = 5,
    n_probes: int = 10,
) -> str:
    """Unrolled PQ-ADC read path: per-subspace Lloyd chains (2
    assignment rounds), codebook = member means of the FINAL
    assignment (exactly pq_codebooks' recovery), probe LUTs, additive
    code distances, shortlist, exact re-rank."""
    parts = []
    code_sel = []
    lut_sel = []
    for sp in range(n_sub):
        lo = sp * sub_dim + 1
        hi = (sp + 1) * sub_dim
        diff = f"list_transform(range(1, {sub_dim + 1}), j -> e.v[j] - i.c[j])"
        parts.append(
            f"""e{sp} AS (SELECT vec_id,
       list_transform(range({lo}, {hi + 1}), j -> embedding[j]::DOUBLE) AS v
       FROM embeddings),
init{sp} AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS c
       FROM e{sp} ORDER BY vec_id LIMIT {k_cells})"""
        )
        prev = f"init{sp}"
        for it in (1, 2):
            parts.append(
                f"""d{sp}_{it} AS (SELECT e.vec_id, i.cid,
       list_inner_product({diff}, {diff}) AS dist
       FROM e{sp} e CROSS JOIN {prev} i),
s{sp}_{it} AS (SELECT vec_id, cid, dist FROM (SELECT *, row_number() OVER
       (PARTITION BY vec_id ORDER BY dist, cid) AS rk FROM d{sp}_{it}) WHERE rk = 1)"""
            )
            if it == 1:
                parts.append(
                    f"""c{sp}_1 AS (SELECT cid, list(av ORDER BY dim) AS c FROM (
       SELECT s.cid, j.j AS dim, avg(e.v[j.j]) AS av
       FROM s{sp}_1 s JOIN e{sp} e ON e.vec_id = s.vec_id
       CROSS JOIN (SELECT unnest(range(1, {sub_dim + 1})) AS j) j
       GROUP BY 1, 2) GROUP BY 1)"""
                )
                prev = f"c{sp}_1"
        # codebook consistent with the FINAL assignment (pq_codebooks)
        parts.append(
            f"""b{sp} AS (SELECT cid, list(av ORDER BY dim) AS c FROM (
       SELECT s.cid, j.j AS dim, avg(e.v[j.j]) AS av
       FROM s{sp}_2 s JOIN e{sp} e ON e.vec_id = s.vec_id
       CROSS JOIN (SELECT unnest(range(1, {sub_dim + 1})) AS j) j
       GROUP BY 1, 2) GROUP BY 1)"""
        )
        code_sel.append(f"SELECT {sp} AS sp, vec_id, cid FROM s{sp}_2")
        lut_sel.append(
            f"""SELECT p.vec_id AS probe, {sp} AS sp, i.cid,
       list_inner_product(
         list_transform(range(1, {sub_dim + 1}), j -> e.v[j] - i.c[j]),
         list_transform(range(1, {sub_dim + 1}), j -> e.v[j] - i.c[j])) AS d
       FROM (SELECT vec_id FROM embeddings WHERE vec_id < {n_probes}) p
       JOIN e{sp} e ON e.vec_id = p.vec_id CROSS JOIN b{sp} i"""
        )
    parts.append("codes AS (" + "\nUNION ALL ".join(code_sel) + ")")
    parts.append("lut AS (" + "\nUNION ALL ".join(lut_sel) + ")")
    parts.append(
        f"""est AS (SELECT l.probe, co.vec_id AS nb, sum(l.d) AS est
       FROM codes co JOIN lut l ON l.sp = co.sp AND l.cid = co.cid
       WHERE co.vec_id <> l.probe
       GROUP BY 1, 2),
short AS (SELECT probe, nb FROM (SELECT *, row_number() OVER
       (PARTITION BY probe ORDER BY floor(est*1e9 + 0.5), nb) AS rk FROM est)
       WHERE rk <= {shortlist}),
ev AS (SELECT vec_id, list_transform(range(1, 65), j -> embedding[j]::DOUBLE) AS v
       FROM embeddings),
ex AS (SELECT s.probe, s.nb,
       list_inner_product(
         list_transform(range(1, 65), j -> pv.v[j] - bv.v[j]),
         list_transform(range(1, 65), j -> pv.v[j] - bv.v[j])) AS d2
       FROM short s JOIN ev pv ON pv.vec_id = s.probe
       JOIN ev bv ON bv.vec_id = s.nb)"""
    )
    chain = ",\n".join(parts)
    return (
        f"WITH {chain}\n"
        f"SELECT probe AS vec_id, nb, round(d2, 6) AS d2 FROM (\n"
        f"  SELECT *, row_number() OVER (PARTITION BY probe ORDER BY d2, nb) AS rk\n"
        f"  FROM ex) WHERE rk <= {topk} ORDER BY 1, 3, 2"
    )


@_l(
    "l72_ann_pq_rerank",
    _pq_adc_oracle(),
    note="the full IVF-PQ read path (Jegou et al. ADC + exact re-rank), "
    "oracle-matched: 8 independent 8-dim Lloyd codebooks (2 rounds, "
    "lowest-id seeds), codes = final cell assignments, probe LUTs = "
    "squared distances to the member-mean codebooks, candidate score "
    "= SUM of 8 LUT lookups (no vector math per candidate), "
    "shortlist 150 by estimated distance, then exact L2 ONLY on the "
    "shortlist.  Codebook means are float sums whose accumulation "
    "order is engine-dependent, so the shortlist cut ranks on "
    "floor(est*1e9 + 0.5) in BOTH engines (near-ties become exact ties "
    "broken on nb); the partition-invariance test monitors the "
    "residual last-bit risk.  "
    "Measured recall@5 vs brute force on this corpus: ADC-only 0.32, "
    "+rerank = 0.94 at shortlist 150 (synthetic near-random vectors "
    "are PQ's worst case; clustered real embeddings need far "
    "shallower shortlists).  At 100 TB codes are ~64x smaller than "
    "vectors, the scan never touches raw embeddings, scoring is an "
    "equi-join against a broadcast LUT + map-side-combined sum, and "
    "only |probes| x shortlist rows ever join back to raw vectors",
)
def l72(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import pq_topk_rerank

    emb = Catalog(spark, sf_dir).table("embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    res = pq_topk_rerank(
        emb, probes, k=5, shortlist=150, n_sub=8, sub_dim=8, n_cells=16
    )
    return res.select(
        "vec_id", "nb", F.round("d2", 6).alias("d2")
    ).orderBy("vec_id", "d2", "nb")


@_l(
    "m10_compress_ratio",
    None,
    note="zlib compressibility per payload (rows-only: no SQL engine "
    "ships zlib; determinism and planted-payload ordering are "
    "pinned by unit tests instead): the CCNet/RefinedWeb quality "
    "signal — templated/repetitive payloads compress hard, natural "
    "text sits mid-range, random/encrypted payloads approach 1.0.  "
    "Arrow-batched mapInPandas over the column-pruned (id, payload) "
    "projection; 4 scalars out per payload so the bytes never leave "
    "the task",
)
def m10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import compress_ratio

    media = to_media_table(Catalog(spark, sf_dir).table("documents"))
    return (
        compress_ratio(media)
        .orderBy("ratio", "doc_id")
        .limit(20)
    )


@_l(
    "l73_ngram_novelty",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
       g AS (SELECT doc_id % 2 AS half, doc_id,
               array_to_string(l[i : i+7], ' ') AS gram
             FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - 7)) AS i
                   FROM toks) u),
       ref AS (SELECT DISTINCT gram FROM g WHERE half = 0),
       cand AS (SELECT doc_id, gram FROM g WHERE half = 1),
       per AS (SELECT c.doc_id, count(*) AS n_grams,
               count(*) FILTER (WHERE r.gram IS NULL) AS novel
               FROM cand c LEFT JOIN ref r ON r.gram = c.gram
               GROUP BY 1)
       SELECT CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_grams) AS BIGINT) AS n_grams,
              CAST(sum(novel) AS BIGINT) AS n_novel,
              round(sum(novel) * 1.0 / sum(n_grams), 6) AS novelty_rate,
              round(avg(novel * 1.0 / n_grams), 6) AS mean_doc_novelty
       FROM per""",
    note="8-gram novelty rate of a candidate batch (odd docs) against "
    "the reference corpus (even docs): the complement of l25's "
    "contamination and l64's duplicated-gram share — a LOW novelty "
    "rate flags a crawl batch that is mostly re-crawl (no training "
    "value), a suspiciously HIGH one flags drift or spam.  One "
    "anti-join-shaped LEFT JOIN on the gram key (at 100 TB: "
    "xxhash64 the gram, bucket both sides, and the reference side "
    "is the same posting table the dedup family already builds)",
)
def l73(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    toks = d.select("doc_id", F.split("text", " ").alias("l"))
    g = toks.select(
        (F.col("doc_id") % 2).alias("half"),
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(l) >= 8 THEN "
                "transform(sequence(1, size(l) - 7), i -> concat_ws(' ', slice(l, i, 8))) "
                "ELSE array() END"
            )
        ).alias("gram"),
    )
    ref = g.filter(F.col("half") == 0).select("gram").distinct().withColumn(
        "seen", F.lit(1)
    )
    cand = g.filter(F.col("half") == 1).select("doc_id", "gram")
    per = (
        cand.join(ref, "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count_if(F.col("seen").isNull()).alias("novel"),
        )
    )
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_grams").cast("long").alias("n_grams"),
        F.sum("novel").cast("long").alias("n_novel"),
        F.round(F.sum("novel") * 1.0 / F.sum("n_grams"), 6).alias("novelty_rate"),
        F.round(F.avg(F.col("novel") * 1.0 / F.col("n_grams")), 6).alias(
            "mean_doc_novelty"
        ),
    )


@_l(
    "l74_containment",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l
                     FROM documents WHERE doc_id < 300),
       sh AS (SELECT DISTINCT doc_id,
               array_to_string(l[i : i+2], ' ') AS s
             FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - 2)) AS i
                   FROM toks) u),
       sz AS (SELECT doc_id, count(*) AS ns FROM sh GROUP BY 1),
       inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
                 FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
                 GROUP BY 1, 2),
       cont AS (SELECT i.da, i.db, i.c,
                round(i.c * 1.0 / za.ns, 6) AS containment,
                round(i.c * 1.0 / (za.ns + zb.ns - i.c), 6) AS jaccard
                FROM inter i JOIN sz za ON za.doc_id = i.da
                JOIN sz zb ON zb.doc_id = i.db)
       SELECT da, db, CAST(c AS BIGINT) AS n_common, containment, jaccard
       FROM cont WHERE containment >= 0.5
       ORDER BY containment DESC, da, db LIMIT 50""",
    note="shingle CONTAINMENT (Broder's asymmetric resemblance): "
    "|S(A) n S(B)| / |S(A)| — the quote/subset detector that "
    "symmetric Jaccard structurally misses (a 50-token excerpt "
    "inside a 5000-token page has Jaccard ~0.01 but containment "
    "~1.0), reported beside Jaccard so the asymmetry is visible.  "
    "Candidates come ONLY from the shared-shingle inverted-index "
    "join (l07's shape); at 100 TB the estimator form replaces "
    "exact intersection with MinHash-bottom-k sketches and the "
    "same containment algebra, posting-capped on hot shingles",
)
def l74(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents").filter(F.col("doc_id") < 300)
    toks = d.select("doc_id", F.split("text", " ").alias("l"))
    sh = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(l) >= 3 THEN "
                "transform(sequence(1, size(l) - 2), i -> concat_ws(' ', slice(l, i, 3))) "
                "ELSE array() END"
            )
        ).alias("s"),
    ).distinct()
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("ns"))
    a = sh.select(F.col("doc_id").alias("da"), "s")
    b = sh.select(F.col("doc_id").alias("db"), "s")
    inter = (
        a.join(b, "s")
        .filter(F.col("da") != F.col("db"))
        .groupBy("da", "db")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    za = sz.select(F.col("doc_id").alias("da"), F.col("ns").alias("nsa"))
    zb = sz.select(F.col("doc_id").alias("db"), F.col("ns").alias("nsb"))
    return (
        inter.join(F.broadcast(za), "da")
        .join(F.broadcast(zb), "db")
        .select(
            "da",
            "db",
            F.col("c").cast("long").alias("n_common"),
            F.round(F.col("c") * 1.0 / F.col("nsa"), 6).alias("containment"),
            F.round(
                F.col("c") * 1.0 / (F.col("nsa") + F.col("nsb") - F.col("c")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("containment") >= 0.5)
        .orderBy(F.col("containment").desc(), "da", "db")
        .limit(50)
    )


@_l(
    "l75_heaps_law",
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
         FROM documents),
       t2 AS (SELECT doc_id, term FROM tok WHERE term <> ''),
       firstd AS (SELECT term, min(doc_id) AS fd FROM t2 GROUP BY 1),
       ntok AS (SELECT doc_id, count(*) AS nt FROM t2 GROUP BY 1),
       cps AS (SELECT unnest([50, 100, 150, 200, 250, 300, 350, 400, 450, 500]) AS cp),
       pts AS (SELECT cp,
         (SELECT CAST(sum(nt) AS BIGINT) FROM ntok WHERE doc_id < cp) AS tokens,
         (SELECT count(*) FROM firstd WHERE fd < cp) AS vocab
         FROM cps),
       valid AS (SELECT cp, tokens, CAST(vocab AS BIGINT) AS vocab,
                 ln(tokens * 1.0) AS lx, ln(vocab * 1.0) AS ly
                 FROM pts WHERE tokens > 0 AND vocab > 0)
       SELECT CAST(count(*) AS BIGINT) AS n_points,
              round(regr_slope(ly, lx), 4) AS heaps_beta,
              round(exp(regr_intercept(ly, lx)), 4) AS heaps_k,
              round(regr_r2(ly, lx), 4) AS r2
       FROM valid""",
    note="Heaps'-law fit — vocabulary growth V = K * n^beta over "
    "cumulative token checkpoints (the dual of l68's Zipf fit; "
    "natural text sits at beta ~ 0.4-0.6, templated corpora "
    "flatten, OCR noise inflates): checkpoint vocab counts come "
    "from the same mergeable FIRST-SEEN rewrite as q122 (a term's "
    "first doc is a min, so vocab-at-checkpoint is a count over "
    "first-seen, never a re-scan), and the fit is the distributive "
    "regr_* aggregate.  The growth-curve form answers 'is this "
    "crawl batch still adding words' before training pays for it",
)
def l75(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    t2 = d.select("doc_id", F.explode(F.split("text", " ")).alias("term")).filter(
        F.col("term") != ""
    )
    firstd = t2.groupBy("term").agg(F.min("doc_id").alias("fd"))
    ntok = t2.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nt"))
    cps = spark.createDataFrame([(c,) for c in range(50, 501, 50)], ["cp"])
    tokens = (
        ntok.join(F.broadcast(cps), ntok.doc_id < cps.cp)
        .groupBy("cp")
        .agg(F.sum("nt").cast("long").alias("tokens"))
    )
    vocab = (
        firstd.join(F.broadcast(cps), firstd.fd < cps.cp)
        .groupBy("cp")
        .agg(F.count(F.lit(1)).cast("long").alias("vocab"))
    )
    valid = (
        tokens.join(vocab, "cp")
        .filter((F.col("tokens") > 0) & (F.col("vocab") > 0))
        .select(
            F.log(F.col("tokens") * 1.0).alias("lx"),
            F.log(F.col("vocab") * 1.0).alias("ly"),
        )
    )
    return valid.agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.round(F.expr("regr_slope(ly, lx)"), 4).alias("heaps_beta"),
        F.round(F.exp(F.expr("regr_intercept(ly, lx)")), 4).alias("heaps_k"),
        F.round(F.expr("regr_r2(ly, lx)"), 4).alias("r2"),
    )


@_l(
    "l76_dsir",
    """WITH tok AS (SELECT doc_id, lang = 'en' AS is_target, t.term
         FROM documents, unnest(string_split(text, ' ')) AS t(term)
         WHERE t.term <> ''),
       b AS (SELECT doc_id, is_target,
         ((strpos('0123456789abcdef', substring(md5(term), 1, 1)) - 1) * 16
        + (strpos('0123456789abcdef', substring(md5(term), 2, 1)) - 1)) % 64
           AS bucket
         FROM tok),
       cnt AS (SELECT bucket,
         sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS t,
         sum(CASE WHEN is_target THEN 0 ELSE 1 END) AS r
         FROM b GROUP BY 1),
       tot AS (SELECT sum(t) AS tt, sum(r) AS rt FROM cnt),
       w AS (SELECT bucket,
         ln((t + 1)::DOUBLE / (tt + 64)) - ln((r + 1)::DOUBLE / (rt + 64)) AS w
         FROM cnt, tot)
       SELECT doc_id, count(*)::BIGINT AS n_terms, round(sum(w), 6) AS logw
       FROM b JOIN w USING (bucket) WHERE NOT is_target
       GROUP BY 1 ORDER BY 1""",
    note="DSIR importance weights (Xie et al. 2023, data selection via "
    "importance resampling): hashed bag-of-words models (md5 -> 64 "
    "buckets, vocabulary-free) of the TARGET slice (lang='en') and the "
    "raw remainder; every raw doc scores sum_t[log p_target(b(t)) - "
    "log p_raw(b(t))] with Laplace smoothing — the resampling weight "
    "that makes a raw crawl look like the target corpus.  Scale shape: "
    "one linear tokenize+hash scan, two 64-row bucket tables "
    "(broadcast), one map-side-combined per-doc sum — per-term state "
    "never materializes",
)
def l76(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import dsir_scores

    docs = Catalog(spark, sf_dir).table("documents")
    return (
        dsir_scores(docs, F.col("lang") == "en", n_buckets=64)
        .select("doc_id", "n_terms", F.round("logw", 6).alias("logw"))
        .orderBy("doc_id")
    )


@_l(
    "l78_ccnet_buckets",
    """WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS l
         FROM documents),
       bg AS (SELECT doc_id, lang, l[i] AS w1, l[i+1] AS w2
              FROM d, unnest(range(1, len(l))) t(i)),
       c12 AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2),
       c1 AS (SELECT w1, count(*) AS c FROM bg GROUP BY 1),
       v AS (SELECT count(DISTINCT w1) AS v FROM
             (SELECT w1 FROM bg UNION ALL SELECT w2 FROM bg)),
       sc AS (SELECT b.doc_id, b.lang,
               -log2((c12.c + 1.0) / (c1.c + v.v)) AS bits
              FROM bg b JOIN c12 ON b.w1 = c12.w1 AND b.w2 = c12.w2
              JOIN c1 ON b.w1 = c1.w1 CROSS JOIN v),
       pd AS (SELECT doc_id, lang, round(avg(bits), 4) AS h
              FROM sc GROUP BY 1, 2),
       tl AS (SELECT lang, doc_id, h,
               ntile(3) OVER (PARTITION BY lang ORDER BY h, doc_id) AS tile
              FROM pd)
       SELECT lang,
              CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                   ELSE 'tail' END AS bucket,
              count(*)::BIGINT AS n_docs, round(avg(h), 4) AS avg_bits,
              round(min(h), 4) AS min_bits, round(max(h), 4) AS max_bits
       FROM tl GROUP BY 1, 2 ORDER BY 1, min(h), bucket""",
    note="CCNet-style perplexity bucketing (Wenzek et al.): per-language "
    "head/middle/tail terciles of the l36 per-doc bigram-LM bits — the "
    "published CommonCrawl curation recipe keeps head+middle and drops "
    "the tail.  Per-doc bits ride the shared bigram-count model; the "
    "tercile is one ntile window per language (ordered on the 4-dp "
    "rounded score + doc_id so the cut is engine-stable).  At 100 TB "
    "the window partitions by language — bounded fan-in, no global "
    "sort",
)
def l78(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    d = docs.select("doc_id", "lang", F.split("text", " ").alias("l"))
    bg = d.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(slice(l, 1, size(l) - 1),"
                " (w, i) -> struct(w AS w1, element_at(l, i + 2) AS w2))"
            )
        ).alias("p"),
    ).select("doc_id", "lang", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    v = bg.select(F.col("w1").alias("w")).unionAll(
        bg.select(F.col("w2").alias("w"))
    ).agg(F.countDistinct("w").alias("v"))
    sc = (
        bg.join(c12, ["w1", "w2"])
        .join(F.broadcast(c1), "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            "lang",
            (-F.log2((F.col("c12") + 1.0) / (F.col("c1") + F.col("v")))).alias("bits"),
        )
    )
    pd_ = sc.groupBy("doc_id", "lang").agg(F.round(F.avg("bits"), 4).alias("h"))
    w = Window.partitionBy("lang").orderBy("h", "doc_id")
    tl = pd_.withColumn("tile", F.ntile(3).over(w))
    return (
        tl.groupBy(
            "lang",
            F.when(F.col("tile") == 1, "head")
            .when(F.col("tile") == 2, "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("h"), 4).alias("avg_bits"),
            F.round(F.min("h"), 4).alias("min_bits"),
            F.round(F.max("h"), 4).alias("max_bits"),
        )
        .orderBy("lang", F.col("min_bits"), "bucket")
    )


@_l(
    "l79_temperature_mixing",
    """WITH tok AS (SELECT lang, sum(len(string_split(text, ' '))) AS tokens
         FROM documents GROUP BY 1),
       tot AS (SELECT sum(tokens) AS t FROM tok),
       sh AS (SELECT lang, tokens, tokens / tot.t AS share
              FROM tok CROSS JOIN tot),
       pw AS (SELECT lang, tokens, share, pow(share, 0.3) AS p FROM sh),
       z AS (SELECT sum(p) AS z FROM pw)
       SELECT lang, CAST(tokens AS BIGINT) AS tokens,
              round(share, 4) AS share, round(p / z.z, 4) AS q,
              round((p / z.z) / share, 4) AS boost
       FROM pw CROSS JOIN z ORDER BY 1""",
    note="temperature-scaled multilingual sampling (the XLM-R / mT5 "
    "alpha=0.3 recipe): q_l proportional to share_l^alpha renormalized "
    "— low-resource languages get boosted (boost > 1), high-resource "
    "damped, smoothly between proportional (alpha=1) and uniform "
    "(alpha=0).  Complements l37's fixed-target plan; one corpus scan, "
    "two scalar broadcasts",
)
def l79(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    tok = docs.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " "))).alias("tokens")
    )
    tot = tok.agg(F.sum("tokens").alias("t"))
    sh = tok.crossJoin(F.broadcast(tot)).select(
        "lang", "tokens", (F.col("tokens") / F.col("t")).alias("share")
    )
    pw = sh.withColumn("p", F.pow("share", F.lit(0.3)))
    z = pw.agg(F.sum("p").alias("z"))
    return (
        pw.crossJoin(F.broadcast(z))
        .select(
            "lang",
            F.col("tokens").cast("long").alias("tokens"),
            F.round("share", 4).alias("share"),
            F.round(F.col("p") / F.col("z"), 4).alias("q"),
            F.round((F.col("p") / F.col("z")) / F.col("share"), 4).alias("boost"),
        )
        .orderBy("lang")
    )


@_l(
    "l77_dsir_resample",
    """WITH tok AS (SELECT doc_id, lang = 'en' AS is_target, t.term
         FROM documents, unnest(string_split(text, ' ')) AS t(term)
         WHERE t.term <> ''),
       b AS (SELECT doc_id, is_target,
         ((strpos('0123456789abcdef', substring(md5(term), 1, 1)) - 1) * 16
        + (strpos('0123456789abcdef', substring(md5(term), 2, 1)) - 1)) % 64
           AS bucket
         FROM tok),
       cnt AS (SELECT bucket,
         sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS t,
         sum(CASE WHEN is_target THEN 0 ELSE 1 END) AS r
         FROM b GROUP BY 1),
       tot AS (SELECT sum(t) AS tt, sum(r) AS rt FROM cnt),
       w AS (SELECT bucket,
         ln((t + 1)::DOUBLE / (tt + 64)) - ln((r + 1)::DOUBLE / (rt + 64)) AS w
         FROM cnt, tot),
       scored AS (SELECT doc_id, sum(w) AS logw
         FROM b JOIN w USING (bucket) WHERE NOT is_target GROUP BY 1),
       keyed AS (SELECT doc_id, logw,
         logw + (-ln(-ln((('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                          + 0.5) / 4294967296.0))) AS key
         FROM scored),
       ranked AS (SELECT row_number() OVER (ORDER BY key DESC, doc_id) AS rank,
                         doc_id, logw FROM keyed)
       SELECT rank::BIGINT AS rank, doc_id, round(logw, 6) AS logw
       FROM ranked WHERE rank <= 50 ORDER BY rank""",
    note="the DSIR SELECTION step (Gumbel-top-k importance resampling): "
    "sampling-without-replacement by the l76 importance weights equals "
    "taking the top-m of logw + Gumbel(0,1) (the Gumbel-max trick); "
    "the Gumbel draw is SEEDED from md5(doc_id) — u = (first 8 md5 hex "
    "chars + 0.5)/2^32, g = -ln(-ln(u)) — so the sample is exactly "
    "reproducible across engines, partitionings and reruns (the "
    "auditable-sampling property a training-data pipeline needs).  "
    "Global top-m by key is a TakeOrdered, not a full sort, at scale",
)
def l77(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import dsir_resample

    docs = Catalog(spark, sf_dir).table("documents")
    return dsir_resample(docs, F.col("lang") == "en", m=50, n_buckets=64).select(
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("logw", 6).alias("logw"),
    )


@_l(
    "l80_bloom_decontam",
    """WITH d AS (SELECT doc_id, lang,
         CASE WHEN strpos('0123456789abcdef',
                substring(md5(doc_id::VARCHAR), 1, 1)) - 1 < 13 THEN 'train'
              WHEN strpos('0123456789abcdef',
                substring(md5(doc_id::VARCHAR), 1, 1)) - 1 < 15 THEN 'valid'
              ELSE 'test' END AS split,
         list_filter(string_split(text, ' '), x -> x <> '') AS l
       FROM documents),
       g AS (SELECT doc_id, lang, split, array_to_string(l[t.i:t.i+4], ' ') AS gram
             FROM d, UNNEST(generate_series(1, greatest(len(l) - 4, 0))) AS t(i)),
       pos AS (SELECT doc_id, lang, split, gram, j.j,
               ('0x' || substring(md5(j.j::VARCHAR || ':' || gram), 1, 15))::BIGINT
                 % 65536 AS pos
               FROM g CROSS JOIN range(3) j(j)),
       bloom AS (SELECT DISTINCT pos FROM pos WHERE split = 'test'),
       hits AS (SELECT p.doc_id, p.gram FROM pos p JOIN bloom b USING (pos)
                WHERE p.split = 'train' GROUP BY 1, 2 HAVING count(DISTINCT p.j) = 3),
       flagged AS (SELECT DISTINCT doc_id FROM hits),
       truec AS (SELECT DISTINCT t.doc_id FROM g t
                 JOIN (SELECT DISTINCT gram FROM g WHERE split = 'test') r
                 USING (gram) WHERE t.split = 'train'),
       train_doc AS (SELECT DISTINCT doc_id, lang FROM g WHERE split = 'train')
       SELECT lang, count(*)::BIGINT AS n_train,
              (count(*) FILTER (WHERE doc_id IN (SELECT doc_id FROM flagged)))::BIGINT
                AS n_flagged,
              (count(*) FILTER (WHERE doc_id IN (SELECT doc_id FROM truec)))::BIGINT
                AS n_true
       FROM train_doc GROUP BY 1 ORDER BY 1""",
    note="Bloom-filter decontamination — the SKETCH path beside l26's "
    "exact semi-join: the test split's 5-gram shingles are folded into "
    "a 65536-position / 3-hash Bloom bit set (positions are md5-derived "
    "integers, so both engines build the IDENTICAL filter, false "
    "positives included); a train doc is flagged when any of its "
    "shingles finds all 3 bits set.  n_flagged >= n_true by "
    "construction (bloom supersets exact) and the gap IS the measured "
    "false-positive cost.  The 100 TB story: the bit set is bounded at "
    "m=65536 rows (one broadcast table) no matter how large the eval "
    "corpus grows, where l26's distinct-gram table grows linearly — "
    "this is the constant-state membership gate production "
    "decontamination uses (e.g. Brown et al. GPT-3 appendix C)",
)
def l80(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1), 16, 10
    ).cast("int")
    split = F.when(bucket < 13, "train").when(bucket < 15, "valid").otherwise("test")
    d = docs.select(
        "doc_id",
        "lang",
        split.alias("split"),
        F.expr("filter(split(text, ' '), x -> x <> '')").alias("l"),
    )
    g = d.select(
        "doc_id",
        "lang",
        "split",
        F.explode(
            F.expr(
                "CASE WHEN size(l) >= 5 THEN transform(sequence(1, size(l)-4),"
                " i -> array_join(slice(l, i, 5), ' ')) ELSE array() END"
            )
        ).alias("gram"),
    ).filter(F.col("split") != "valid")
    pos = g.select(
        "doc_id",
        "lang",
        "split",
        "gram",
        F.explode(F.sequence(F.lit(0), F.lit(2))).alias("j"),
    ).withColumn(
        "pos",
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("j").cast("string"), F.lit(":"), F.col("gram"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 65536,
    )
    bloom = pos.filter(F.col("split") == "test").select("pos").distinct()
    hits = (
        pos.filter(F.col("split") == "train")
        .join(F.broadcast(bloom), "pos", "left_semi")
        .groupBy("doc_id", "gram")
        .agg(F.countDistinct("j").alias("nj"))
        .filter(F.col("nj") == 3)
    )
    flagged = hits.select("doc_id").distinct().withColumn("f", F.lit(1))
    test_g = g.filter(F.col("split") == "test").select("gram").distinct()
    truec = (
        g.filter(F.col("split") == "train")
        .join(test_g, "gram", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("t", F.lit(1))
    )
    train_doc = g.filter(F.col("split") == "train").select("doc_id", "lang").distinct()
    return (
        train_doc.join(flagged, "doc_id", "left")
        .join(truec, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.count_if(F.col("f").isNotNull()).alias("n_flagged"),
            F.count_if(F.col("t").isNotNull()).alias("n_true"),
        )
        .orderBy("lang")
    )


def _textrank_oracle(iters: int = 4) -> str:
    parts = [
        """tok AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
       FROM documents WHERE lang = 'en'),
adj AS (SELECT l[t.i] AS u, l[t.i+1] AS v FROM tok,
        UNNEST(generate_series(1, greatest(len(l) - 1, 0))) AS t(i)
        WHERE l[t.i] <> l[t.i+1]),
cw AS (SELECT least(u, v) AS a, greatest(u, v) AS b, count(*) AS w
       FROM adj GROUP BY 1, 2),
wedge AS (SELECT a AS u, b AS v, w FROM cw UNION ALL SELECT b, a, w FROM cw),
wdeg AS (SELECT u, sum(w) AS wd FROM wedge GROUP BY 1),
r0 AS (SELECT u AS node, 1.0::DOUBLE AS r FROM wdeg)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""r{i} AS (SELECT e.v AS node,
        0.15 + 0.85 * sum(e.w * p.r / d.wd) AS r
      FROM wedge e JOIN r{i - 1} p ON p.node = e.u
      JOIN wdeg d ON d.u = e.u GROUP BY 1)"""
        )
    chain = ",\n".join(parts)
    return (
        f"WITH {chain}\n"
        f"SELECT node AS word, round(r, 6) AS score FROM r{iters} "
        f"ORDER BY score DESC, word LIMIT 20"
    )


@_l(
    "l81_textrank",
    _textrank_oracle(),
    note="TextRank keyword extraction (Mihalcea & Tarau): weighted "
    "PageRank over the word co-occurrence graph (adjacent-token pairs "
    "in 'en' docs, undirected, weight = pair frequency, self-pairs "
    "dropped), 4 declared rounds of r <- 0.15 + 0.85*sum(w/wdeg * r).  "
    "The graph-over-text synthesis: the L-suite's corpus feeds the "
    "G-suite's iteration kernel shape — one map-side-combined shuffle "
    "per round over a stationary weighted edge list, rank broadcast.  "
    "Edge weights and degrees are exact integers, so the only float is "
    "the rank itself (g06's proven rounding protocol, 6 dp)",
)
def l81(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents").filter(F.col("lang") == "en")
    tok = docs.select(F.expr("filter(split(text, ' '), x -> x <> '')").alias("l"))
    adj = tok.select(
        F.explode(
            F.expr(
                "CASE WHEN size(l) >= 2 THEN transform(sequence(1, size(l)-1),"
                " i -> struct(l[i-1] AS u, l[i] AS v)) ELSE array() END"
            )
        ).alias("p")
    ).select("p.u", "p.v").filter(F.col("u") != F.col("v"))
    cw = (
        adj.groupBy(
            F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    wedge = cw.select(F.col("a").alias("u"), F.col("b").alias("v"), "w").unionAll(
        cw.select(F.col("b").alias("u"), F.col("a").alias("v"), "w")
    ).localCheckpoint(eager=True)
    wdeg = wedge.groupBy("u").agg(F.sum("w").alias("wd"))
    ew = wedge.join(F.broadcast(wdeg), "u").select(
        "u", "v", (F.col("w") / F.col("wd")).alias("share")
    ).localCheckpoint(eager=True)
    r = wdeg.select(F.col("u").alias("node"), F.lit(1.0).alias("r"))
    for _ in range(4):
        r = (
            ew.join(F.broadcast(r.withColumnRenamed("node", "u")), "u")
            .groupBy(F.col("v").alias("node"))
            .agg((F.lit(0.15) + F.lit(0.85) * F.sum(F.col("share") * F.col("r"))).alias("r"))
        )
    return (
        r.select(F.col("node").alias("word"), F.round("r", 6).alias("score"))
        .orderBy(F.col("score").desc(), "word")
        .limit(20)
    )


@_l(
    "l82_pmi_collocations",
    """WITH tok AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
         FROM documents),
       adj AS (SELECT l[t.i] AS u, l[t.i+1] AS v FROM tok,
               UNNEST(generate_series(1, greatest(len(l) - 1, 0))) AS t(i)),
       c2 AS (SELECT u, v, count(*) AS c12 FROM adj GROUP BY 1, 2),
       cu AS (SELECT u, count(*) AS c1 FROM adj GROUP BY 1),
       cv AS (SELECT v, count(*) AS c2v FROM adj GROUP BY 1),
       n AS (SELECT count(*) AS n FROM adj)
       SELECT p.u AS w1, p.v AS w2, p.c12::BIGINT AS c12,
              round(ln(p.c12::DOUBLE * n.n / (cu.c1 * cv.c2v)), 6) AS pmi
       FROM c2 p JOIN cu USING (u) JOIN cv USING (v) CROSS JOIN n
       WHERE p.c12 >= 50
       ORDER BY pmi DESC, w1, w2 LIMIT 25""",
    note="PMI collocation mining (Church & Hanks): pointwise mutual "
    "information of adjacent-token bigrams, PMI = ln(c12*N / (c1*c2)) "
    "with DIRECTED position-aware marginals (c1 = left-slot count, c2 "
    "= right-slot count — the standard bigram contingency), min-count "
    "50 screens the unstable low-frequency tail.  Every operand inside "
    "ln() is an exact integer, so both engines evaluate the identical "
    "double — the collocation/phrase-mining primitive under word2vec's "
    "SGNS objective (its implicit matrix IS shifted PMI)",
)
def l82(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    tok = docs.select(F.expr("filter(split(text, ' '), x -> x <> '')").alias("l"))
    adj = tok.select(
        F.explode(
            F.expr(
                "CASE WHEN size(l) >= 2 THEN transform(sequence(1, size(l)-1),"
                " i -> struct(l[i-1] AS u, l[i] AS v)) ELSE array() END"
            )
        ).alias("p")
    ).select("p.u", "p.v").localCheckpoint(eager=True)
    c2 = adj.groupBy("u", "v").agg(F.count(F.lit(1)).alias("c12"))
    cu = adj.groupBy("u").agg(F.count(F.lit(1)).alias("c1"))
    cv = adj.groupBy("v").agg(F.count(F.lit(1)).alias("c2v"))
    n = adj.agg(F.count(F.lit(1)).alias("n"))
    return (
        c2.filter(F.col("c12") >= 50)
        .join(F.broadcast(cu), "u")
        .join(F.broadcast(cv), "v")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("u").alias("w1"),
            F.col("v").alias("w2"),
            F.col("c12").cast("long").alias("c12"),
            F.round(
                F.log(F.col("c12").cast("double") * F.col("n") / (F.col("c1") * F.col("c2v"))),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(25)
    )


def _bpe_oracle(rounds: int = 5) -> str:
    parts = [
        """w0 AS (SELECT w, count(*) AS f,
       ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS s
  FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
        FROM documents WHERE lang = 'en') GROUP BY 1)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""l{i} AS (SELECT f, list_filter(string_split(s, ' '), x -> x <> '') AS l
  FROM w{i - 1}),
p{i} AS (SELECT l[t.i] AS u, l[t.i+1] AS v, sum(f) AS c FROM l{i},
  UNNEST(generate_series(1, greatest(len(l) - 1, 0))) AS t(i) GROUP BY 1, 2),
b{i} AS (SELECT u, v, c FROM p{i} ORDER BY c DESC, u, v LIMIT 1),
w{i} AS (SELECT w, f,
  replace(replace(replace(replace(s,
    ' '||b.u||' '||b.v||' ', ' '||b.u||b.v||' '),
    ' '||b.u||' '||b.v||' ', ' '||b.u||b.v||' '),
    ' '||b.u||' '||b.v||' ', ' '||b.u||b.v||' '),
    ' '||b.u||' '||b.v||' ', ' '||b.u||b.v||' ') AS s
  FROM w{i - 1} CROSS JOIN b{i} b)"""
        )
    chain = ",\n".join(parts)
    unions = " UNION ALL ".join(
        f"SELECT {i} AS rank, u, v, u||v AS merged, c::BIGINT AS c FROM b{i}"
        for i in range(1, rounds + 1)
    )
    return f"WITH {chain}\nSELECT * FROM ({unions}) ORDER BY rank"


def _bpe_train(spark: SparkSession, sf_dir: str, rounds: int = 5):
    """Shared BPE trainer for l83/l91: returns (merges, states) where
    merges = [(rank, u, v, merged, count)] and states[i] is the
    (w, f, s) word table BEFORE merge i+1 (states[rounds] = final).
    The argmax pair per round is a 1-row driver scalar; everything
    else is vocabulary-sized distributed work."""
    docs = Catalog(spark, sf_dir).table("documents").filter(F.col("lang") == "en")
    cur = (
        docs.select(
            F.explode(F.expr("filter(split(text, ' '), x -> x <> '')")).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
        .withColumn(
            "s", F.concat(F.lit(" "), F.regexp_replace("w", "(.)", "$1 "))
        )
        .localCheckpoint(eager=True)
    )
    merges, states = [], [cur]
    for rank in range(1, rounds + 1):
        syms = cur.select(
            "f", F.expr("filter(split(s, ' '), x -> x <> '')").alias("l")
        )
        pairs = (
            syms.select(
                "f",
                F.explode(
                    F.expr(
                        "CASE WHEN size(l) >= 2 THEN transform(sequence(1, size(l)-1),"
                        " i -> struct(l[i-1] AS u, l[i] AS v)) ELSE array() END"
                    )
                ).alias("p"),
            )
            .groupBy("p.u", "p.v")
            .agg(F.sum("f").alias("c"))
        )
        best = pairs.orderBy(F.col("c").desc(), "u", "v").limit(1).collect()[0]
        merges.append((rank, best["u"], best["v"], best["u"] + best["v"], int(best["c"])))
        pat = F.lit(f" {best['u']} {best['v']} ")
        rep = F.lit(f" {best['u']}{best['v']} ")
        col = F.col("s")
        for _ in range(4):
            col = F.replace(col, pat, rep)
        cur = cur.withColumn("s", col).localCheckpoint(eager=True)
        states.append(cur)
    return merges, states


@_l(
    "l83_bpe_merges",
    _bpe_oracle(),
    note="BPE tokenizer training (Sennrich et al.), first 5 merges on "
    "the 'en' token vocabulary: words become space-delimited symbol "
    "strings, each round counts adjacent symbol pairs weighted by word "
    "frequency (exact integers), merges the most frequent pair (ties "
    "-> lexicographically smallest), and rewrites every word.  The "
    "rewrite is leftmost-sequential literal replace applied 4 times — "
    "a fixpoint for any <=16 chained occurrences, reproducing "
    "canonical greedy BPE segmentation, and replace() semantics are "
    "identical in Spark and DuckDB.  The merge pair per round is a "
    "driver-side scalar (one row — the kmeans-centroid class of "
    "control value); pair counting is one map-side-combined shuffle "
    "over the VOCABULARY (not the corpus), which is why BPE training "
    "scales: 100 TB of text still yields a bounded (word, freq) table",
)
def l83(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges, _ = _bpe_train(spark, sf_dir, rounds=5)
    return spark.createDataFrame(
        merges, "rank int, u string, v string, merged string, c long"
    ).orderBy("rank")


@_l(
    "l84_countmin",
    """WITH tok AS (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
         FROM documents),
       tc AS (SELECT w, count(*) AS true_c FROM tok GROUP BY 1),
       pos AS (SELECT w, true_c, j.j,
               ('0x' || substring(md5(j.j::VARCHAR || ':' || w), 1, 15))::BIGINT
                 % 1024 AS pos
               FROM tc CROSS JOIN range(4) j(j)),
       cms AS (SELECT j, pos, sum(true_c) AS cell FROM pos GROUP BY 1, 2),
       est AS (SELECT p.w, p.true_c, min(c.cell) AS est_c
               FROM pos p JOIN cms c ON c.j = p.j AND c.pos = p.pos
               GROUP BY 1, 2)
       SELECT w, true_c::BIGINT AS true_c, est_c::BIGINT AS est_c,
              (est_c - true_c)::BIGINT AS overcount
       FROM est ORDER BY true_c DESC, w LIMIT 20""",
    note="count-min sketch (Cormode & Muthukrishnan), depth 4 x width "
    "1024 with md5-derived row hashes: every token's count folds into "
    "4 counter cells, a point estimate is the MIN over its 4 cells, "
    "and est >= true always (one-sided error — the overcount column "
    "is the collision cost, identical in both engines because the "
    "hash positions are).  The frequency-estimation dual of l80's "
    "membership Bloom: 4096 counters of bounded state summarize an "
    "unbounded token stream, mergeable across partitions by cell-wise "
    "sum — the sketch that answers heavy-hitter queries at 100 TB "
    "without a full groupBy of the corpus",
)
def l84(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    tc = (
        docs.select(
            F.explode(F.expr("filter(split(text, ' '), x -> x <> '')")).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("true_c"))
    )
    pos = tc.select(
        "w",
        "true_c",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("j"),
    ).withColumn(
        "pos",
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("j").cast("string"), F.lit(":"), F.col("w"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 1024,
    ).localCheckpoint(eager=True)
    cms = pos.groupBy("j", "pos").agg(F.sum("true_c").alias("cell"))
    return (
        pos.join(F.broadcast(cms), ["j", "pos"])
        .groupBy("w", "true_c")
        .agg(F.min("cell").alias("est_c"))
        .select(
            "w",
            F.col("true_c").cast("long").alias("true_c"),
            F.col("est_c").cast("long").alias("est_c"),
            (F.col("est_c") - F.col("true_c")).cast("long").alias("overcount"),
        )
        .orderBy(F.col("true_c").desc(), "w")
        .limit(20)
    )


@_l(
    "l85_hyperloglog",
    """WITH tok AS (SELECT DISTINCT lang,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
       FROM documents),
       h AS (SELECT lang, w,
             ('0x' || substring(md5(w), 1, 15))::BIGINT AS hv FROM tok),
       rb AS (SELECT lang, hv % 64 AS b,
              CASE WHEN hv // 64 = 0 THEN 55
                   ELSE 55 - length(bin(hv // 64)) END AS rho
              FROM h),
       reg AS (SELECT lang, b, max(rho) AS r FROM rb GROUP BY 1, 2),
       s AS (SELECT lang, sum(CAST(power(2, 55 - r) AS BIGINT)) AS si,
             count(*) AS m_used FROM reg GROUP BY 1),
       ex AS (SELECT lang, count(DISTINCT w) AS exact_d FROM tok GROUP BY 1)
       SELECT e.lang, e.exact_d::BIGINT AS exact_d,
              round(0.709 * 64 * 64 * power(2.0, 55)
                    / (s.si + (64 - s.m_used) * CAST(power(2, 55) AS BIGINT)), 4)
                AS hll_est
       FROM ex e JOIN s USING (lang) ORDER BY 1""",
    note="GROUPED HyperLogLog, the hardened sibling of q123's global "
    "256-register build: one m=64 register set PER LANGUAGE (the "
    "sketch-per-group shape real pipelines ship), and the harmonic "
    "mean computed over the EXACT integer sum of 2^(55-rho) — q123 "
    "sums power(2.0,-mj) in floating point, which is reduction-order-"
    "sensitive in principle; here no float accumulation exists "
    "anywhere, so the estimate is bit-identical under any "
    "partitioning (asserted by the shuffle-partition invariance "
    "test).  rho = 55 - bitlength(54-bit md5 tail), registers are 64 "
    "mergeable BIGINT maxes per group",
)
def l85(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    tok = (
        docs.select(
            "lang",
            F.explode(F.expr("filter(split(text, ' '), x -> x <> '')")).alias("w"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    h = tok.withColumn(
        "hv", F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("long")
    )
    # hv is up to 2^60: the tail split MUST be integer division (a
    # float floor(hv/64) loses bits above 2^53)
    rb = h.select(
        "lang",
        (F.col("hv") % 64).alias("b"),
        F.when(F.expr("hv DIV 64") == 0, F.lit(55))
        .otherwise(55 - F.length(F.bin(F.expr("hv DIV 64"))))
        .alias("rho"),
    )
    reg = rb.groupBy("lang", "b").agg(F.max("rho").alias("r"))
    s = reg.groupBy("lang").agg(
        F.sum(F.pow(F.lit(2.0), 55 - F.col("r")).cast("long")).alias("si"),
        F.count(F.lit(1)).alias("m_used"),
    )
    ex = tok.groupBy("lang").agg(F.countDistinct("w").alias("exact_d"))
    two55 = 2**55
    return (
        ex.join(s, "lang")
        .select(
            "lang",
            F.col("exact_d").cast("long").alias("exact_d"),
            F.round(
                F.lit(0.709 * 64 * 64 * float(two55))
                / (F.col("si") + (64 - F.col("m_used")) * F.lit(two55)),
                4,
            ).alias("hll_est"),
        )
        .orderBy("lang")
    )


@_l(
    "l86_auc",
    """WITH d AS (SELECT source, n_chars,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
       r AS (SELECT source, n_chars, y,
         rank() OVER (PARTITION BY source ORDER BY n_chars) AS mn,
         count(*) OVER (PARTITION BY source, n_chars) AS tied
       FROM d),
       a AS (SELECT source,
         sum(CASE WHEN y = 1 THEN 2 * (mn - 1) + tied + 1 ELSE 0 END) AS r2,
         sum(y) AS np, sum(1 - y) AS nn
       FROM r GROUP BY 1)
       SELECT source, np::BIGINT AS n_pos, nn::BIGINT AS n_neg,
              round((r2 - np * (np + 1))::DOUBLE / (2.0 * np * nn), 6) AS auc
       FROM a WHERE np > 0 AND nn > 0 ORDER BY 1""",
    note="exact tie-aware ROC AUC per source group: does document "
    "length separate English from the rest?  Mann-Whitney rank-sum "
    "form with average ranks, carried in HALF-RANK integer units "
    "(2r = 2*(min_rank-1) + tied + 1) so the whole statistic is exact "
    "integer arithmetic until one final division — no float rank "
    "averaging to diverge between engines.  The model-evaluation "
    "primitive a data-curation pipeline runs to validate that a "
    "quality/language signal actually ranks (one window + one "
    "aggregate, both map-side-combinable after the sort)",
)
def l86(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents").select(
        "source",
        "n_chars",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    wr = Window.partitionBy("source").orderBy("n_chars")
    wt = Window.partitionBy("source", "n_chars")
    r = d.select(
        "source",
        "y",
        F.rank().over(wr).alias("mn"),
        F.count(F.lit(1)).over(wt).alias("tied"),
    )
    return (
        r.groupBy("source")
        .agg(
            F.sum(
                F.when(F.col("y") == 1, 2 * (F.col("mn") - 1) + F.col("tied") + 1).otherwise(0)
            ).alias("r2"),
            F.sum("y").alias("np"),
            F.sum(1 - F.col("y")).alias("nn"),
        )
        .filter((F.col("np") > 0) & (F.col("nn") > 0))
        .select(
            "source",
            F.col("np").cast("long").alias("n_pos"),
            F.col("nn").cast("long").alias("n_neg"),
            F.round(
                (F.col("r2") - F.col("np") * (F.col("np") + 1)).cast("double")
                / (2.0 * F.col("np") * F.col("nn")),
                6,
            ).alias("auc"),
        )
        .orderBy("source")
    )


@_l(
    "l87_rrf_fusion",
    """WITH dw AS (SELECT doc_id, n_chars,
         len(list_distinct(list_filter(string_split(text, ' '), x -> x <> '')))
           AS n_distinct
       FROM documents),
       r AS (SELECT doc_id,
         row_number() OVER (ORDER BY n_chars DESC, doc_id) AS ra,
         row_number() OVER (ORDER BY n_distinct DESC, doc_id) AS rb
       FROM dw)
       SELECT doc_id, ra::BIGINT AS rank_len, rb::BIGINT AS rank_lex,
              round(1.0 / (60 + ra) + 1.0 / (60 + rb), 6) AS rrf
       FROM r ORDER BY rrf DESC, doc_id LIMIT 20""",
    note="reciprocal-rank fusion (Cormack et al., k=60) of two retrieval "
    "rankings — document length and lexical diversity (distinct-token "
    "count): rrf = 1/(60+r_a) + 1/(60+r_b).  Ranks are deterministic "
    "integers (row_number with doc_id tiebreak), so the two-term float "
    "sum has a FIXED evaluation order and both engines produce the "
    "identical double before the 6-dp round.  The standard zero-tuning "
    "way to combine BM25-style and embedding-style rankings in a "
    "retrieval/curation stack — fusion happens on ranks alone, so at "
    "scale each ranking is an independent top-k job and the fusion "
    "join touches only the shortlists",
)
def l87(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    dw = docs.select(
        "doc_id",
        "n_chars",
        F.size(F.array_distinct(F.expr("filter(split(text, ' '), x -> x <> '')"))).alias(
            "n_distinct"
        ),
    )
    wa = Window.orderBy(F.col("n_chars").desc(), "doc_id")
    wb = Window.orderBy(F.col("n_distinct").desc(), "doc_id")
    r = dw.select(
        "doc_id",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wb).alias("rb"),
    )
    return (
        r.select(
            "doc_id",
            F.col("ra").cast("long").alias("rank_len"),
            F.col("rb").cast("long").alias("rank_lex"),
            F.round(1.0 / (60 + F.col("ra")) + 1.0 / (60 + F.col("rb")), 6).alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(20)
    )


@_l(
    "l88_good_turing",
    """WITH tok AS (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
         FROM documents),
       wc AS (SELECT w, count(*) AS r FROM tok GROUP BY 1),
       ff AS (SELECT r, count(*) AS n_r FROM wc GROUP BY 1),
       nx AS (SELECT f.r, f.n_r, g.n_r AS n_r1
              FROM ff f LEFT JOIN ff g ON g.r = f.r + 1)
       SELECT r::BIGINT AS r, n_r::BIGINT AS n_r,
              round((r + 1) * n_r1 * 1.0 / n_r, 6) AS r_star
       FROM nx ORDER BY r LIMIT 15""",
    note="Good-Turing frequency smoothing: the frequency-of-frequencies "
    "table N_r and the Turing estimate r* = (r+1) N_{r+1} / N_r — how "
    "much probability mass observed-r-times events actually deserve, "
    "and (at r=1) the unseen-mass estimate N_1/N that every smoothed "
    "LM (incl. l70's Kneser-Ney) is calibrated against.  Two exact "
    "integer aggregations + one self-join on r; r* is a single "
    "integer-operand division (NULL where N_{r+1}=0, faithfully the "
    "undefined case).  At 100 TB the wc table is the vocabulary and "
    "ff collapses it to ~hundreds of rows — the whole estimate rides "
    "one map-side-combined shuffle chain",
)
def l88(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    wc = (
        docs.select(
            F.explode(F.expr("filter(split(text, ' '), x -> x <> '')")).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("r"))
    )
    ff = wc.groupBy("r").agg(F.count(F.lit(1)).alias("n_r"))
    nx = ff.alias("f").join(
        ff.select((F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r1")).alias("g"),
        "r",
        "left",
    )
    return (
        nx.select(
            F.col("r").cast("long").alias("r"),
            F.col("n_r").cast("long").alias("n_r"),
            F.round((F.col("r") + 1) * F.col("n_r1") * 1.0 / F.col("n_r"), 6).alias(
                "r_star"
            ),
        )
        .orderBy("r")
        .limit(15)
    )


@_l(
    "l90_cdc_chunking",
    """WITH d AS (SELECT doc_id, lang, text, length(text) AS n FROM documents),
       pos AS (SELECT doc_id, t.i FROM d,
               UNNEST(generate_series(2, greatest(n - 7, 1))) AS t(i)
               WHERE ('0x' || substring(md5(substring(text, t.i::INT, 8)), 1, 15))::BIGINT
                     % 64 = 0),
       starts AS (SELECT doc_id, 1 AS s FROM d
                  UNION ALL SELECT doc_id, i FROM pos),
       seg AS (SELECT doc_id, s,
               lead(s) OVER (PARTITION BY doc_id ORDER BY s) AS nxt
               FROM (SELECT DISTINCT doc_id, s FROM starts)),
       ch AS (SELECT d.doc_id, d.lang,
              substring(d.text, seg.s::INT,
                        (coalesce(seg.nxt, d.n + 1) - seg.s)::INT) AS chunk
              FROM seg JOIN d USING (doc_id)),
       hashes AS (SELECT lang, md5(chunk) AS h, length(chunk) AS len FROM ch
                  WHERE chunk <> '')
       SELECT lang, count(*)::BIGINT AS n_chunks,
              count(DISTINCT h)::BIGINT AS n_distinct,
              sum(len)::BIGINT AS total_bytes,
              round(1.0 - count(DISTINCT h) * 1.0 / count(*), 4) AS dup_ratio
       FROM hashes GROUP BY 1 ORDER BY 1""",
    note="content-defined chunking (the LBFS/FastCDC storage-dedup "
    "primitive): a chunk boundary opens wherever the md5 of the local "
    "8-byte window lands in a 1/64 hash slice, so boundaries are a "
    "function of CONTENT — an insertion reshuffles only the chunks it "
    "touches, which is why CDC dedup survives edits where the M-suite's "
    "fixed-offset window_chunks cannot.  Chunk identity is md5 of the "
    "variable-length segment; dup_ratio is the storage the chunk store "
    "saves.  Position explosion is bounded by the text length (l27's "
    "generate_series protocol); everything downstream is "
    "(doc, boundary) rows, one window lead per doc, one global "
    "hash groupBy — no quadratic anything",
)
def l90(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    d = docs.select("doc_id", "lang", "text", F.length("text").alias("n"))
    pos = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "filter(transform(sequence(2, greatest(n - 7, 1)), i -> "
                "CASE WHEN CAST(conv(substring(md5(substring(text, i, 8)), 1, 15), 16, 10)"
                " AS BIGINT) % 64 = 0 THEN i END), x -> x IS NOT NULL)"
            )
        ).alias("s"),
    )
    starts = d.select("doc_id", F.lit(1).alias("s")).unionByName(pos).distinct()
    wl = Window.partitionBy("doc_id").orderBy("s")
    seg = starts.withColumn("nxt", F.lead("s").over(wl))
    ch = seg.join(d, "doc_id").select(
        "doc_id",
        "lang",
        F.expr(
            "substring(text, s, CAST(coalesce(nxt, n + 1) - s AS INT))"
        ).alias("chunk"),
    )
    hashes = ch.filter(F.col("chunk") != "").select(
        "lang", F.md5("chunk").alias("h"), F.length("chunk").alias("len")
    )
    return (
        hashes.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct("h").alias("n_distinct"),
            F.sum("len").cast("long").alias("total_bytes"),
            F.round(
                1.0 - F.countDistinct("h") * 1.0 / F.count(F.lit(1)), 4
            ).alias("dup_ratio"),
        )
        .orderBy("lang")
    )


def _bpe_curve_oracle(rounds: int = 5) -> str:
    # reuse the exact merge chain of _bpe_oracle, then measure every
    # state w0..w{rounds}
    chain = _bpe_oracle(rounds)
    chain = chain[: chain.index("\nSELECT")]  # keep the WITH ... CTE block
    stats = []
    for i in range(0, rounds + 1):
        stats.append(
            f"""st{i} AS (SELECT {i} AS rank, count(DISTINCT t.sym) AS vocab,
  (SELECT sum(f * len(list_filter(string_split(s, ' '), x -> x <> '')))
   FROM w{i}) AS corpus_tokens
  FROM (SELECT unnest(list_filter(string_split(s, ' '), x -> x <> '')) AS sym
        FROM w{i}) t)"""
        )
    unions = " UNION ALL ".join(f"SELECT * FROM st{i}" for i in range(0, rounds + 1))
    return (
        chain
        + ",\n"
        + ",\n".join(stats)
        + f"\nSELECT rank, vocab::BIGINT AS vocab, corpus_tokens::BIGINT AS corpus_tokens"
        f" FROM ({unions}) ORDER BY rank"
    )


@_l(
    "l91_bpe_compression_curve",
    _bpe_curve_oracle(),
    note="the BPE effectiveness metric l83's merge list implies: after "
    "each of the 5 merges, the symbol-vocabulary size and the total "
    "corpus token count (sum of word_freq x symbols_per_word) — the "
    "compression curve a tokenizer team actually reads (tokens fall, "
    "vocab grows, the knee picks the merge budget).  Replays the "
    "IDENTICAL merge chain as l83 (same argmax pairs, same 4-pass "
    "rewrite) and measures every intermediate state; all counts are "
    "exact integers over the vocabulary table",
)
def l91(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, states = _bpe_train(spark, sf_dir, rounds=5)
    rows = []
    for i, st in enumerate(states):
        agg = st.select(
            "f", F.expr("filter(split(s, ' '), x -> x <> '')").alias("l")
        ).agg(
            F.sum(F.col("f") * F.size("l")).alias("corpus_tokens"),
        ).collect()[0]
        vocab = (
            st.select(F.explode(F.expr("filter(split(s, ' '), x -> x <> '')")).alias("sym"))
            .agg(F.countDistinct("sym").alias("v"))
            .collect()[0]["v"]
        )
        rows.append((i, int(vocab), int(agg["corpus_tokens"])))
    return spark.createDataFrame(
        rows, "rank int, vocab long, corpus_tokens long"
    ).orderBy("rank")


def _pca_oracle(iters: int = 5, dim: int = 64) -> str:
    parts = [
        f"""px AS (SELECT vec_id, i.i AS j,
  embedding[(i.i + 1)::INT]::DOUBLE AS xj
  FROM embeddings CROSS JOIN range({dim}) i(i)),
g AS MATERIALIZED (SELECT a.j AS j, b.j AS k, round(sum(a.xj * b.xj), 6) AS g
  FROM px a JOIN px b USING (vec_id) GROUP BY 1, 2),
v0 AS (SELECT i.i AS j, 1.0::DOUBLE AS v FROM range({dim}) i(i))"""
    ]
    for r in range(1, iters + 1):
        parts.append(
            f"""gv{r} AS (SELECT g.j, sum(g.g * p.v) AS s
  FROM g JOIN v{r - 1} p ON p.j = g.k GROUP BY 1),
m{r} AS (SELECT max(abs(s)) AS m FROM gv{r}),
v{r} AS (SELECT j, s / m.m AS v FROM gv{r} CROSS JOIN m{r} m)"""
        )
    chain = ",\n".join(parts)
    return (
        f"WITH {chain}\n"
        f"SELECT j::BIGINT AS dim, round(v, 5) AS loading FROM v{iters} ORDER BY 1"
    )


@_l(
    "l92_pca_power_iteration",
    _pca_oracle(),
    note="top principal direction of the embedding cloud by power "
    "iteration on the second-moment (Gram) matrix: G = X^T X built "
    "ONCE by a posexplode pair aggregate and ROUNDED AT 6dp BEFORE "
    "iterating — the rounding is the cross-engine determinism "
    "protocol (both engines then iterate identical 64x64 inputs "
    "through identically-shaped expressions, so the 1e-15 reduction-"
    "order drift cannot compound across rounds), 5 rounds of "
    "v <- Gv / max|Gv| (g81's max-normalization trick: one exact "
    "comparison, no L2 norm float).  The dimensionality-reduction / "
    "whitening first step the embedding suite lacked (kmeans/IVF/PQ "
    "quantize; this DECORRELATES).  At scale: G is a dim^2 aggregate "
    "(one map-side-combined shuffle over the corpus, 4096 cells "
    "regardless of row count) and each iteration touches only the "
    "4096-cell G — corpus size never enters the loop",
)
def l92(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Catalog(spark, sf_dir).table("embeddings")
    px = emb.select("vec_id", F.posexplode("embedding").alias("j", "xj")).withColumn(
        "xj", F.col("xj").cast("double")
    )
    g = (
        px.alias("a")
        .join(px.alias("b"), "vec_id")
        .groupBy(F.col("a.j").alias("j"), F.col("b.j").alias("k"))
        .agg(F.round(F.sum(F.col("a.xj") * F.col("b.xj")), 6).alias("g"))
        .localCheckpoint(eager=True)
    )
    v = (
        emb.sparkSession.range(64)
        .select(F.col("id").cast("long").alias("j"), F.lit(1.0).alias("v"))
    )
    for _ in range(5):
        gv = (
            g.join(F.broadcast(v.select(F.col("j").alias("k"), "v")), "k")
            .groupBy("j")
            .agg(F.sum(F.col("g") * F.col("v")).alias("s"))
        )
        m = gv.agg(F.max(F.abs(F.col("s"))).alias("m"))
        v = gv.crossJoin(F.broadcast(m)).select(
            "j", (F.col("s") / F.col("m")).alias("v")
        )
    return v.select(
        F.col("j").cast("long").alias("dim"), F.round("v", 5).alias("loading")
    ).orderBy("dim")


def _logreg_oracle(iters: int = 3) -> str:
    parts = [
        """f AS (SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
  1.0::DOUBLE AS x0, (n_chars / 1000.0)::DOUBLE AS x1,
  (len(list_filter(string_split(text, ' '), x -> x <> '')) / 100.0)::DOUBLE AS x2
  FROM documents),
n AS (SELECT count(*) AS n FROM f),
w0 AS (SELECT 0.0::DOUBLE AS a, 0.0::DOUBLE AS b, 0.0::DOUBLE AS c)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""g{i} AS (SELECT
  round(sum((1.0 / (1.0 + exp(-(w.a * x0 + w.b * x1 + w.c * x2))) - y) * x0), 6) AS ga,
  round(sum((1.0 / (1.0 + exp(-(w.a * x0 + w.b * x1 + w.c * x2))) - y) * x1), 6) AS gb,
  round(sum((1.0 / (1.0 + exp(-(w.a * x0 + w.b * x1 + w.c * x2))) - y) * x2), 6) AS gc
  FROM f CROSS JOIN w{i - 1} w),
w{i} AS (SELECT floor((w.a - 0.5 * g.ga / n.n) * 1e6 + 0.5) / 1e6 AS a,
                floor((w.b - 0.5 * g.gb / n.n) * 1e6 + 0.5) / 1e6 AS b,
                floor((w.c - 0.5 * g.gc / n.n) * 1e6 + 0.5) / 1e6 AS c
  FROM w{i - 1} w CROSS JOIN g{i} g CROSS JOIN n)"""
        )
    unions = " UNION ALL ".join(
        f"SELECT {i} AS step, a AS w_bias, b AS w_len, c AS w_tokens FROM w{i}"
        for i in range(1, iters + 1)
    )
    return "WITH " + ",\n".join(parts) + f"\nSELECT * FROM ({unions}) ORDER BY step"


def _logreg_chain(iters: int = 3) -> str:
    """The WITH-chain of _logreg_oracle without the final SELECT, for
    oracles that consume the trained w{iters} (l94 calibration)."""
    full = _logreg_oracle(iters)
    return full[: full.rindex("\nSELECT")]


def _logreg_fit(spark: SparkSession, sf_dir: str, iters: int = 3):
    """Shared trainer for l93/l94: returns (features_df, per-step rows,
    final weights).  Weights use the floor-form half-up at 6dp —
    identical to the oracle's floor((x)*1e6+0.5)/1e6 on the same
    double (python round() is banker's and could flip a boundary)."""
    import math

    docs = Catalog(spark, sf_dir).table("documents")
    f = docs.select(
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
        F.lit(1.0).alias("x0"),
        (F.col("n_chars") / 1000.0).cast("double").alias("x1"),
        (
            F.size(F.expr("filter(split(text, ' '), x -> x <> '')")) / 100.0
        ).cast("double").alias("x2"),
    ).localCheckpoint(eager=True)
    n = f.count()
    w = [0.0, 0.0, 0.0]
    rows = []
    for step in range(1, iters + 1):
        z = F.lit(w[0]) * F.col("x0") + F.lit(w[1]) * F.col("x1") + F.lit(w[2]) * F.col("x2")
        p = 1.0 / (1.0 + F.exp(-z))
        g = f.agg(
            F.round(F.sum((p - F.col("y")) * F.col("x0")), 6).alias("ga"),
            F.round(F.sum((p - F.col("y")) * F.col("x1")), 6).alias("gb"),
            F.round(F.sum((p - F.col("y")) * F.col("x2")), 6).alias("gc"),
        ).collect()[0]
        w = [
            math.floor((w[0] - 0.5 * g["ga"] / n) * 1e6 + 0.5) / 1e6,
            math.floor((w[1] - 0.5 * g["gb"] / n) * 1e6 + 0.5) / 1e6,
            math.floor((w[2] - 0.5 * g["gc"] / n) * 1e6 + 0.5) / 1e6,
        ]
        rows.append((step, w[0], w[1], w[2]))
    return f, rows, w



@_l(
    "l93_logreg_gd",
    _logreg_oracle(),
    note="in-engine MODEL TRAINING: a quality/language classifier "
    "(the CCNet / FineWeb pipeline step) fit by 3 full-batch "
    "gradient-descent rounds of logistic regression on two document "
    "features (scaled length, scaled token count).  Determinism is "
    "l92's protocol applied to learning: the gradient is a rounded "
    "6-dp aggregate and the weights are re-rounded after every "
    "step, so both engines enter each round with bit-identical "
    "weights and the per-row sigmoid ulp noise (JVM Math.exp vs "
    "libm exp) is absorbed before it can compound.  At scale each "
    "round is ONE map-side-combined aggregate over the corpus "
    "(3 partial sums), weights are a 3-float driver scalar — "
    "full-batch GD is embarrassingly data-parallel, which is why "
    "in-warehouse training of shallow models works at 100 TB",
)
def l93(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, rows, _ = _logreg_fit(spark, sf_dir, iters=3)
    return spark.createDataFrame(
        rows, "step int, w_bias double, w_len double, w_tokens double"
    ).orderBy("step")


@_l(
    "l94_calibration",
    _logreg_chain()
    + """,
pred AS (SELECT y, 1.0 / (1.0 + exp(-(w.a * x0 + w.b * x1 + w.c * x2))) AS p
  FROM f CROSS JOIN w3 w),
bi AS (SELECT least(CAST(floor(p * 10) AS INT), 9) AS bin, y, p FROM pred)
SELECT bin, count(*)::BIGINT AS n, round(avg(p), 4) AS mean_pred,
       round(avg(y), 4) AS obs_rate,
       round(avg((p - y) * (p - y)), 6) AS brier
FROM bi GROUP BY 1 ORDER BY 1""",
    note="classifier calibration — the reliability diagram + per-bin "
    "Brier score for l93's trained quality classifier: predictions "
    "from the SAME deterministic 3-step weights are bucketed into 10 "
    "fixed probability bins; a calibrated model has mean_pred ~ "
    "obs_rate per bin, and the gap is exactly what temperature "
    "scaling would fix before the score gates a data pipeline.  "
    "obs_rate is an exact integer ratio; mean_pred/brier are "
    "4/6dp-rounded bin aggregates (suite float protocol).  One "
    "scan + one combine aggregate at any corpus size",
)
def l94(spark: SparkSession, sf_dir: str) -> DataFrame:
    f, _, w = _logreg_fit(spark, sf_dir, iters=3)
    z = F.lit(w[0]) * F.col("x0") + F.lit(w[1]) * F.col("x1") + F.lit(w[2]) * F.col("x2")
    p = 1.0 / (1.0 + F.exp(-z))
    bi = f.select(
        "y",
        p.alias("p"),
        F.least(F.floor(p * 10).cast("int"), F.lit(9)).alias("bin"),
    )
    return (
        bi.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("p"), 4).alias("mean_pred"),
            F.round(F.avg("y"), 4).alias("obs_rate"),
            F.round(F.avg((F.col("p") - F.col("y")) * (F.col("p") - F.col("y"))), 6).alias(
                "brier"
            ),
        )
        .orderBy("bin")
    )


@_l(
    "l95_js_source_drift",
    """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS term
         FROM documents),
       t2 AS (SELECT source, term FROM tok WHERE term <> ''),
       sc AS (SELECT source, term, count(*) AS c FROM t2 GROUP BY 1, 2),
       corp AS (SELECT term, count(*) AS ct FROM t2 GROUP BY 1),
       v AS (SELECT count(*) AS v FROM corp),
       n AS (SELECT sum(ct) AS n FROM corp),
       st AS (SELECT source, sum(c) AS ns FROM sc GROUP BY 1),
       grid AS (SELECT st.source, st.ns, corp.term, corp.ct,
                       coalesce(sc.c, 0) AS c
                FROM st CROSS JOIN corp
                LEFT JOIN sc ON sc.source = st.source AND sc.term = corp.term),
       probs AS (SELECT source, ns,
         (c + 1.0) / (ns + v.v) AS p,
         (ct + 1.0) / (n.n + v.v) AS q
       FROM grid CROSS JOIN v CROSS JOIN n)
       SELECT source, ns::BIGINT AS n_tokens,
              round(sum(0.5 * p * ln(2 * p / (p + q))
                        + 0.5 * q * ln(2 * q / (p + q))), 6) AS js
       FROM probs GROUP BY 1, 2
       ORDER BY js DESC, source""",
    note="per-source Jensen-Shannon divergence against the whole-corpus "
    "unigram distribution — the symmetric, bounded ([0, ln2]) "
    "complement to l71's KL and q91/l89's PSI: rank WHICH crawl "
    "source drifts furthest from the curated mix (the "
    "downweight-this-source signal in mixture tuning).  Add-one "
    "smoothing over the corpus vocabulary; the vocab x sources grid "
    "is the explicit support union so no term zero-divides.  Shape: "
    "two token groupBys (map-side combined), a broadcast-sized "
    "source-totals frame crossed with the vocab frame, one LEFT join "
    "back to per-source counts, one distributive sum per source — at "
    "100 TB the corpus collapses to (vocab x sources) rows before "
    "any float math; float accumulation guarded by 6dp rounding on a "
    "sum of terms all <= ln2 (l71's proven idiom)",
)
def l95(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    tok = d.select(
        "source", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    sc = tok.groupBy("source", "term").agg(F.count(F.lit(1)).alias("c"))
    corp = tok.groupBy("term").agg(F.count(F.lit(1)).alias("ct"))
    v_ = corp.count()
    n_ = tok.count()
    st = sc.groupBy("source").agg(F.sum("c").alias("ns"))
    grid = (
        F.broadcast(st)
        .crossJoin(corp)
        .join(sc, ["source", "term"], "left")
        .select(
            "source",
            "ns",
            "ct",
            F.coalesce("c", F.lit(0)).alias("c"),
        )
    )
    probs = grid.select(
        "source",
        "ns",
        ((F.col("c") + 1.0) / (F.col("ns") + F.lit(float(v_)))).alias("p"),
        ((F.col("ct") + 1.0) / F.lit(float(n_ + v_))).alias("q"),
    )
    js_term = 0.5 * F.col("p") * F.log(2 * F.col("p") / (F.col("p") + F.col("q"))) + (
        0.5 * F.col("q") * F.log(2 * F.col("q") / (F.col("p") + F.col("q")))
    )
    return (
        probs.groupBy("source", "ns")
        .agg(F.round(F.sum(js_term), 6).alias("js"))
        .select(
            "source", F.col("ns").cast("long").alias("n_tokens"), "js"
        )
        .orderBy(F.col("js").desc(), "source")
    )


@_l(
    "l96_readability_bands",
    """WITH f AS (SELECT doc_id,
         len(regexp_extract_all(text, '[^ ]+')) AS words,
         greatest(len(regexp_extract_all(text, '[.!?]+')),
                  (len(regexp_extract_all(text, '[^ ]+')) + 14) // 15,
                  1) AS sents,
         len(regexp_extract_all(lower(text), '[aeiouy]+')) AS sylls
       FROM documents),
       sc AS (SELECT doc_id, words, sents, sylls,
         206.835 - 1.015 * (CAST(words AS DOUBLE) / sents)
                 - 84.6 * (CAST(sylls AS DOUBLE) / words) AS score
       FROM f WHERE words > 0)
       SELECT CASE WHEN score >= 70 THEN 'easy'
                   WHEN score >= 50 THEN 'medium'
                   WHEN score >= 30 THEN 'difficult'
                   ELSE 'very_difficult' END AS band,
              count(*)::BIGINT AS n_docs,
              sum(words)::BIGINT AS words, sum(sents)::BIGINT AS sents,
              sum(sylls)::BIGINT AS sylls,
              round(avg(score), 4) AS avg_score
       FROM sc GROUP BY 1 ORDER BY 1""",
    note="Flesch reading-ease banding over the corpus — the classic "
    "readability quality gate (easy/medium/difficult shares tell a "
    "curation pipeline whether a source is textbook-like or "
    "legalese).  Counts are regex-exact integers in BOTH engines "
    "(words = non-space runs, syllables = vowel-group runs, the "
    "standard no-dictionary approximation); this synthetic corpus "
    "has no sentence punctuation, so sentence count falls back to "
    "15-token pseudo-sentences — greatest(punct_runs, ceil(w/15), 1) "
    "is declared for real text too, via an exact integer ceiling.  "
    "The score is the same double expression in identical operation "
    "order both sides; band edges are far from reachable float "
    "values, avg guarded at 4dp.  Shape: pure per-row map + one "
    "combine aggregate — embarrassingly parallel, no shuffle before "
    "the 4-row band collapse",
)
def l96(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    words = F.size(F.expr("regexp_extract_all(text, '[^ ]+', 0)"))
    punct = F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)"))
    sylls = F.size(F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
    f = d.select(
        "doc_id",
        words.cast("long").alias("words"),
        F.greatest(
            punct.cast("long"),
            ((words.cast("long") + 14) / 15).cast("long"),
            F.lit(1),
        ).alias("sents"),
        sylls.cast("long").alias("sylls"),
    ).filter(F.col("words") > 0)
    score = (
        F.lit(206.835)
        - 1.015 * (F.col("words").cast("double") / F.col("sents"))
        - 84.6 * (F.col("sylls").cast("double") / F.col("words"))
    )
    sc = f.withColumn("score", score)
    band = (
        F.when(F.col("score") >= 70, "easy")
        .when(F.col("score") >= 50, "medium")
        .when(F.col("score") >= 30, "difficult")
        .otherwise("very_difficult")
    )
    return (
        sc.groupBy(band.alias("band"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("words").alias("words"),
            F.sum("sents").alias("sents"),
            F.sum("sylls").alias("sylls"),
            F.round(F.avg("score"), 4).alias("avg_score"),
        )
        .orderBy("band")
    )


@_l(
    "l97_stump_gain_curve",
    """WITH f AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS v
       FROM documents),
       vc AS (SELECT v, count(*) AS c, sum(y) AS pos FROM f GROUP BY 1),
       cum AS (SELECT v,
         sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS nl,
         sum(pos) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS pl
       FROM vc),
       tot AS (SELECT sum(c) AS n, sum(pos) AS pos FROM vc),
       g AS (SELECT cum.v, cum.nl, cum.pl, t.n, t.pos,
             t.n - cum.nl AS nr, t.pos - cum.pl AS pr
             FROM cum CROSS JOIN tot t)
       SELECT v AS threshold, nl::BIGINT AS n_left, pl::BIGINT AS pos_left,
         round((
           (CASE WHEN pos <= 0 OR pos >= n THEN 0.0
                 ELSE -(pos * ln(CAST(pos AS DOUBLE) / n)
                        + (n - pos) * ln(CAST(n - pos AS DOUBLE) / n)) END)
           - (CASE WHEN pl <= 0 OR pl >= nl THEN 0.0
                   ELSE -(pl * ln(CAST(pl AS DOUBLE) / nl)
                          + (nl - pl) * ln(CAST(nl - pl AS DOUBLE) / nl)) END)
           - (CASE WHEN pr <= 0 OR pr >= nr THEN 0.0
                   ELSE -(pr * ln(CAST(pr AS DOUBLE) / nr)
                          + (nr - pr) * ln(CAST(nr - pr AS DOUBLE) / nr)) END)
         ) / n, 6) AS gain
       FROM g ORDER BY threshold""",
    note="decision-stump TRAINING curve: information gain of the split "
    "'token_count <= t' against the is-English label, for EVERY "
    "candidate threshold — the third member of the in-engine "
    "shallow-model family (l93 logistic GD, l94 calibration); a "
    "gradient-boosting or feature-binning pipeline evaluates exactly "
    "this frame per feature.  All counts are exact integers from ONE "
    "value-collapse + cumulative window (the q133 shape); entropy "
    "terms are computed per threshold as one fixed double expression "
    "over those exact ints with 0*ln0 handled by identical CASE "
    "guards, 6dp-rounded — the l71 float idiom.  Output is ordered "
    "by THRESHOLD, not by gain, so no float argmax hazard exists; "
    "the caller takes the max over the (rounded, tie-broken) curve.  "
    "Shape: one map-side-combined groupBy to ~200 rows, window + "
    "scalar math on the collapsed frame — corpus-size-independent "
    "after the first shuffle",
)
def l97(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    f = d.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        F.size(F.expr("filter(split(text, ' '), x -> x <> '')")).cast("long").alias("v"),
    )
    vc = f.groupBy("v").agg(F.count(F.lit(1)).alias("c"), F.sum("y").alias("pos"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = vc.select(
        "v", F.sum("c").over(w).alias("nl"), F.sum("pos").over(w).alias("pl")
    )
    tot = vc.agg(F.sum("c").alias("n"), F.sum("pos").alias("pos"))
    g = cum.crossJoin(F.broadcast(tot)).select(
        "v",
        "nl",
        "pl",
        "n",
        "pos",
        (F.col("n") - F.col("nl")).alias("nr"),
        (F.col("pos") - F.col("pl")).alias("pr"),
    )

    def went(m: str, k: str):
        md = F.col(m).cast("double")
        kd = F.col(k).cast("double")
        return F.when((F.col(m) <= 0) | (F.col(m) >= F.col(k)), F.lit(0.0)).otherwise(
            -(
                F.col(m) * F.log(md / kd)
                + (F.col(k) - F.col(m)) * F.log((kd - md) / kd)
            )
        )

    return g.select(
        F.col("v").alias("threshold"),
        F.col("nl").cast("long").alias("n_left"),
        F.col("pl").cast("long").alias("pos_left"),
        F.round(
            (went("pos", "n") - went("pl", "nl") - went("pr", "nr")) / F.col("n"), 6
        ).alias("gain"),
    ).orderBy("threshold")


@_l(
    "l98_sorted_neighborhood",
    """WITH k AS (SELECT doc_id, substring(text, 1, 16) AS sk, n_chars
         FROM documents),
       o AS (SELECT doc_id, sk, n_chars,
         lead(doc_id, 1) OVER (ORDER BY sk, doc_id) AS d1,
         lead(sk, 1) OVER (ORDER BY sk, doc_id) AS sk1,
         lead(n_chars, 1) OVER (ORDER BY sk, doc_id) AS nc1,
         lead(doc_id, 2) OVER (ORDER BY sk, doc_id) AS d2,
         lead(sk, 2) OVER (ORDER BY sk, doc_id) AS sk2,
         lead(n_chars, 2) OVER (ORDER BY sk, doc_id) AS nc2
       FROM k),
       cand AS (
         SELECT doc_id AS a, d1 AS b, sk, sk1 AS skb, n_chars, nc1 AS ncb,
                1 AS offs FROM o WHERE d1 IS NOT NULL
         UNION ALL
         SELECT doc_id, d2, sk, sk2, n_chars, nc2, 2 FROM o
         WHERE d2 IS NOT NULL)
       SELECT a, b, offs::INT AS offs,
              abs(n_chars - ncb)::BIGINT AS len_diff,
              CASE WHEN substring(sk, 1, 8) = substring(skb, 1, 8)
                   THEN 1 ELSE 0 END::INT AS key8_match
       FROM cand
       WHERE substring(sk, 1, 4) = substring(skb, 1, 4)
       ORDER BY a, b""",
    note="sorted-neighborhood blocking (Hernandez & Stolfo) — the "
    "third dedup candidate generator beside MinHash-LSH (l02) and "
    "SimHash (l06): sort the corpus on a blocking key (here the "
    "16-char text prefix), slide a w=3 window down the sorted order, "
    "and emit only neighbor pairs agreeing on a 4-char prefix, with "
    "the 8-char agreement flag and length gap as the cheap "
    "comparison features.  Everything is exact: the sort is totally "
    "ordered by (key, doc_id), candidates are lead(1..2) window "
    "pulls, outputs are integers.  At 100 TB this is the "
    "repartitionByRange + per-partition window shape (Spark's window "
    "over a global ORDER BY range-partitions then sorts; only the "
    "w-1 boundary rows per partition need the cross-partition "
    "carry), and the candidate count is exactly (w-1)*n — linear, "
    "no quadratic blowup on skewed blocks, the property LSH banding "
    "cannot promise on hot buckets",
)
def l98(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    k = d.select(
        "doc_id", F.substring("text", 1, 16).alias("sk"), "n_chars"
    )
    w = Window.orderBy("sk", "doc_id")
    o = k.select(
        "doc_id",
        "sk",
        "n_chars",
        F.lead("doc_id", 1).over(w).alias("d1"),
        F.lead("sk", 1).over(w).alias("sk1"),
        F.lead("n_chars", 1).over(w).alias("nc1"),
        F.lead("doc_id", 2).over(w).alias("d2"),
        F.lead("sk", 2).over(w).alias("sk2"),
        F.lead("n_chars", 2).over(w).alias("nc2"),
    )
    c1 = o.filter(F.col("d1").isNotNull()).select(
        F.col("doc_id").alias("a"),
        F.col("d1").alias("b"),
        "sk",
        F.col("sk1").alias("skb"),
        "n_chars",
        F.col("nc1").alias("ncb"),
        F.lit(1).alias("offs"),
    )
    c2 = o.filter(F.col("d2").isNotNull()).select(
        F.col("doc_id").alias("a"),
        F.col("d2").alias("b"),
        "sk",
        F.col("sk2").alias("skb"),
        "n_chars",
        F.col("nc2").alias("ncb"),
        F.lit(2).alias("offs"),
    )
    cand = c1.unionByName(c2)
    return (
        cand.filter(F.substring("sk", 1, 4) == F.substring("skb", 1, 4))
        .select(
            "a",
            "b",
            F.col("offs").cast("int").alias("offs"),
            F.abs(F.col("n_chars") - F.col("ncb")).cast("long").alias("len_diff"),
            (F.substring("sk", 1, 8) == F.substring("skb", 1, 8))
            .cast("int")
            .alias("key8_match"),
        )
        .orderBy("a", "b")
    )


@_l(
    "m11_perceptual_ahash",
    """WITH d AS (SELECT doc_id, text, n_chars FROM documents
         WHERE doc_id < 100 AND n_chars >= 64),
       b AS (SELECT doc_id, n_chars,
         ord(substring(text, i + 1, 1)) AS byte,
         (i * 64) // n_chars AS cell
       FROM d CROSS JOIN (SELECT unnest(range(0, 4096)) AS i) r
       WHERE i < n_chars),
       cells AS (SELECT doc_id, n_chars, cell, sum(byte) AS cs,
                 count(*) AS cc FROM b GROUP BY 1, 2, 3),
       tot AS (SELECT doc_id, sum(cs) AS total FROM cells GROUP BY 1),
       bits AS (SELECT c.doc_id, c.n_chars, c.cell,
         CASE WHEN c.cs * c.n_chars >= t.total * c.cc THEN 1 ELSE 0 END AS bit
       FROM cells c JOIN tot t USING (doc_id))
       SELECT doc_id, n_chars::BIGINT AS n_bytes,
         sum(CASE WHEN cell < 16 THEN bit * (1 << cell) ELSE 0 END)::BIGINT AS b0,
         sum(CASE WHEN cell >= 16 AND cell < 32
                  THEN bit * (1 << (cell - 16)) ELSE 0 END)::BIGINT AS b1,
         sum(CASE WHEN cell >= 32 AND cell < 48
                  THEN bit * (1 << (cell - 32)) ELSE 0 END)::BIGINT AS b2,
         sum(CASE WHEN cell >= 48 THEN bit * (1 << (cell - 48)) ELSE 0 END)::BIGINT
           AS b3
       FROM bits GROUP BY 1, 2 ORDER BY doc_id""",
    note="perceptual average-hash over the opaque payload (the 1-D "
    "analogue of the decode->8x8-downsample->mean-threshold image "
    "aHash): 64 equal-share byte cells, each cell's mean vs the "
    "global mean CROSS-MULTIPLIED so every comparison is exact "
    "integer (cs*len >= total*cc), bits packed into four 16-bit "
    "bands — the pigeonhole layout where any pair within Hamming 16 "
    "must agree on >=1 band, making near-dup search a band equi-join "
    "(l06's SimHash contract, but computed on raw media bytes via "
    "the mapInPandas multimodal path instead of token features).  "
    "Spark side is Arrow-batched numpy bincount per payload; oracle "
    "replays the identical integer arithmetic per character (ASCII "
    "corpus: byte == codepoint, asserted in test preconditions).  "
    "Payloads die inside the task; only 6 scalars per doc survive",
)
def m11(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import perceptual_ahash

    docs = (
        Catalog(spark, sf_dir)
        .table("documents")
        .filter((F.col("doc_id") < 100) & (F.col("n_chars") >= 64))
    )
    media = to_media_table(docs)
    return perceptual_ahash(media).orderBy("doc_id")


@_l(
    "l99_greedy_generation",
    """WITH RECURSIVE tok AS (SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS l
       FROM documents),
       bg AS (SELECT w1, w2, count(*) AS c FROM (
         SELECT s[1] AS w1, s[2] AS w2
         FROM (SELECT unnest(list_zip(l, l[2:])) AS s FROM tok) z
         WHERE s[2] IS NOT NULL) GROUP BY 1, 2),
       uni AS (SELECT w1 AS w, sum(c) AS c FROM bg GROUP BY 1),
       seed AS (SELECT w FROM uni ORDER BY c DESC, w LIMIT 1),
       gen(step, w, cnt) AS (
         SELECT 0, (SELECT w FROM seed), CAST(NULL AS BIGINT)
         UNION ALL
         SELECT g.step + 1,
           (SELECT b.w2 FROM bg b WHERE b.w1 = g.w
            ORDER BY b.c DESC, b.w2 LIMIT 1),
           (SELECT b.c FROM bg b WHERE b.w1 = g.w
            ORDER BY b.c DESC, b.w2 LIMIT 1)
         FROM gen g WHERE g.step < 8 AND g.w IS NOT NULL)
       SELECT step::INT AS step, w AS word, cnt::BIGINT AS bigram_count
       FROM gen WHERE w IS NOT NULL ORDER BY step""",
    note="greedy bigram-LM text generation IN-ENGINE: start from the "
    "corpus's most frequent token and repeatedly append the "
    "argmax-count continuation (ties broken lexicographically), 8 "
    "steps — the deterministic decode loop that proves the l82/l88 "
    "n-gram statistics compose into an actual language-model read "
    "path (greedy decode = temperature-0 sampling, fully "
    "reproducible; the same chain an in-warehouse data-synthesis or "
    "autocomplete-suggestion job would run).  All decisions are "
    "integer-count argmaxes with total tie order, so both engines "
    "walk the identical chain.  Shape: ONE corpus-wide bigram "
    "groupBy (map-side combined); the 8-step walk touches only the "
    "per-prefix top row — driver-side control flow over a "
    "broadcast-sized frontier, the l93 training-loop discipline "
    "applied to decoding",
)
def l99(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    tok = d.select(
        F.expr("filter(split(text, ' '), x -> x <> '')").alias("l")
    )
    bg = (
        tok.select(
            F.explode(
                F.expr("zip_with(l, slice(l, 2, size(l)), (a, b) -> named_struct('w1', a, 'w2', b))")
            ).alias("s")
        )
        .filter(F.col("s.w2").isNotNull())
        .groupBy(F.col("s.w1").alias("w1"), F.col("s.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    seed = (
        bg.groupBy("w1").agg(F.sum("c").alias("c"))
        .orderBy(F.col("c").desc(), "w1")
        .limit(1)
        .collect()[0]["w1"]
    )
    rows = [(0, seed, None)]
    cur = seed
    for step in range(1, 9):
        nxt = (
            bg.filter(F.col("w1") == cur)
            .orderBy(F.col("c").desc(), "w2")
            .limit(1)
            .collect()
        )
        if not nxt:
            break
        cur = nxt[0]["w2"]
        rows.append((step, cur, nxt[0]["c"]))
    return spark.createDataFrame(
        rows, "step int, word string, bigram_count bigint"
    ).orderBy("step")


@_l(
    "l100_subsample_ci",
    """WITH b AS (SELECT unnest(range(0, 16)) AS b),
       mem AS (SELECT b.b, d.doc_id, d.n_chars
         FROM documents d CROSS JOIN b
         WHERE strpos('0123456789abcdef',
                 substring(md5(d.doc_id::VARCHAR || ':' || b.b::VARCHAR), 1, 1))
               - 1 < 8),
       per AS (SELECT b, count(*) AS n, sum(n_chars) AS s,
               CAST(floor(1e3 * CAST(sum(n_chars) AS DOUBLE) / count(*) + 0.5)
                    AS BIGINT) AS m_x1k
             FROM mem GROUP BY 1),
       rk AS (SELECT m_x1k, row_number() OVER (ORDER BY m_x1k, b) AS r FROM per)
       SELECT (SELECT count(*) FROM per)::BIGINT AS n_resamples,
              sum(per.n)::BIGINT AS total_draws,
              round(CAST(sum(per.m_x1k) AS DOUBLE) / (16 * 1e3), 6) AS mean_of_means,
              round(sqrt((16.0 * sum(per.m_x1k * per.m_x1k)
                          - CAST(sum(per.m_x1k) AS DOUBLE) * sum(per.m_x1k))
                         / (16.0 * 15.0)) / 1e3, 6) AS sd_of_means,
              (SELECT m_x1k FROM rk WHERE r = 2)::BIGINT AS ci_lo_x1k,
              (SELECT m_x1k FROM rk WHERE r = 15)::BIGINT AS ci_hi_x1k
       FROM per""",
    note="subsampling confidence interval for the mean document length "
    "— resampling inference IN-ENGINE: 16 deterministic half-samples "
    "(md5(doc_id, b) bucket test — no RNG, the l18 split idiom), "
    "each sample's mean carried as an integer milli-char m_x1k = "
    "floor(1e3*s/n+.5) so the across-sample sum/sumsq/sd and the "
    "percentile CI (2nd/15th order statistics, exact integer "
    "selection) are ALL layout-proof — a float mean per sample would "
    "make the 16-row aggregate order-sensitive; the integer carrier "
    "kills that.  This is the error-bar machinery for any corpus "
    "statistic where the analytic variance is unavailable.  Shape: "
    "16x corpus replication via a broadcast spine (at 100 TB you'd "
    "push the 16 membership bits into ONE pass — grouping sets / "
    "Expand — same cost class as q12's rollup), then 16-row scalar "
    "math",
)
def l100(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents").select("doc_id", "n_chars")
    b = spark.range(0, 16).select(F.col("id").alias("b"))
    mem = (
        d.crossJoin(F.broadcast(b))
        .filter(
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("doc_id").cast("string"),
                                F.lit(":"),
                                F.col("b").cast("string"),
                            )
                        ),
                        1,
                        1,
                    ),
                    16,
                    10,
                ).cast("int")
            )
            < 8
        )
        .select("b", "n_chars")
    )
    per = mem.groupBy("b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("s"),
    ).select(
        "b",
        "n",
        "s",
        F.floor(F.lit(1e3) * F.col("s").cast("double") / F.col("n") + 0.5)
        .cast("long")
        .alias("m_x1k"),
    )
    w = Window.orderBy("m_x1k", "b")
    rk = per.select("m_x1k", F.row_number().over(w).alias("r"))
    lo = rk.filter(F.col("r") == 2).select(F.col("m_x1k").alias("ci_lo_x1k"))
    hi = rk.filter(F.col("r") == 15).select(F.col("m_x1k").alias("ci_hi_x1k"))
    agg = per.agg(
        F.count(F.lit(1)).alias("n_resamples"),
        F.sum("n").alias("total_draws"),
        F.sum("m_x1k").alias("sm"),
        F.sum(F.col("m_x1k") * F.col("m_x1k")).alias("smm"),
    )
    return (
        agg.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            F.col("n_resamples").cast("long").alias("n_resamples"),
            F.col("total_draws").cast("long").alias("total_draws"),
            F.round(F.col("sm").cast("double") / (16 * F.lit(1e3)), 6).alias(
                "mean_of_means"
            ),
            F.round(
                F.sqrt(
                    (16.0 * F.col("smm") - F.col("sm").cast("double") * F.col("sm"))
                    / (16.0 * 15.0)
                )
                / F.lit(1e3),
                6,
            ).alias("sd_of_means"),
            F.col("ci_lo_x1k").cast("long").alias("ci_lo_x1k"),
            F.col("ci_hi_x1k").cast("long").alias("ci_hi_x1k"),
        )
    )


@_l(
    "l101_feature_hashing",
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
         FROM documents WHERE doc_id < 50),
       t2 AS (SELECT doc_id, w,
         ('0x' || substring(md5(w), 1, 15))::BIGINT AS h
       FROM tok WHERE w <> ''),
       sgn AS (SELECT doc_id, w, h % 16 AS bucket,
               CASE WHEN h % 32 < 16 THEN 1 ELSE -1 END AS sg
       FROM t2),
       vec AS (SELECT doc_id, bucket, sum(sg) AS val
               FROM sgn GROUP BY 1, 2),
       voc AS (SELECT bucket, count(DISTINCT w) AS bucket_vocab
               FROM sgn GROUP BY 1)
       SELECT v.doc_id, v.bucket::INT AS bucket, v.val::BIGINT AS val,
              voc.bucket_vocab::BIGINT AS bucket_vocab
       FROM vec v JOIN voc USING (bucket)
       ORDER BY v.doc_id, v.bucket""",
    note="the hashing trick (Weinberger et al. / HashingVectorizer): "
    "tokens land in 16 signed buckets by md5 (sign bit from the next "
    "hash bit, so collisions cancel in expectation), giving each doc "
    "a fixed-width feature vector with NO vocabulary state — the "
    "vectorizer that feeds l93's logistic classifier when the vocab "
    "is unbounded; bucket_vocab exposes the collision load per "
    "dimension.  All-integer (hash, bucket, signed sum), "
    "vocabulary-free by construction.  Shape: one token explode + "
    "one (doc, bucket) groupBy, map-side combined; the 16-row vocab "
    "census is a distinct-combine — at 100 TB this is strictly "
    "cheaper than tf-idf because no global vocabulary join exists",
)
def l101(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents").filter(F.col("doc_id") < 50)
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    t2 = tok.select(
        "doc_id",
        "w",
        F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("long").alias("h"),
    )
    sgn = t2.select(
        "doc_id",
        "w",
        (F.col("h") % 16).alias("bucket"),
        F.when((F.col("h") % 32) < 16, 1).otherwise(-1).alias("sg"),
    )
    vec = sgn.groupBy("doc_id", "bucket").agg(F.sum("sg").alias("val"))
    voc = sgn.groupBy("bucket").agg(F.countDistinct("w").alias("bucket_vocab"))
    return (
        vec.join(F.broadcast(voc), "bucket")
        .select(
            "doc_id",
            F.col("bucket").cast("int").alias("bucket"),
            F.col("val").cast("long").alias("val"),
            F.col("bucket_vocab").cast("long").alias("bucket_vocab"),
        )
        .orderBy("doc_id", "bucket")
    )


@_l(
    "l102_log2_quantile_sketch",
    """WITH s AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
       FROM orders WHERE o_totalprice > 0),
       bk AS (SELECT length(bin(c)) - 1 AS bucket, count(*) AS cnt
              FROM s GROUP BY 1),
       cum AS (SELECT bucket, cnt,
         sum(cnt) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cm
       FROM bk),
       n AS (SELECT sum(cnt) AS n FROM bk),
       est AS (SELECT
         (SELECT min(bucket) FROM cum CROSS JOIN n
            WHERE cm >= (50 * n.n + 99) // 100) AS b50,
         (SELECT min(bucket) FROM cum CROSS JOIN n
            WHERE cm >= (95 * n.n + 99) // 100) AS b95,
         (SELECT min(bucket) FROM cum CROSS JOIN n
            WHERE cm >= (99 * n.n + 99) // 100) AS b99),
       ex AS (SELECT
         (SELECT min(c) FROM (SELECT c, row_number() OVER (ORDER BY c) AS r
            FROM s) q CROSS JOIN n WHERE r >= (50 * n.n + 99) // 100) AS e50,
         (SELECT min(c) FROM (SELECT c, row_number() OVER (ORDER BY c) AS r
            FROM s) q CROSS JOIN n WHERE r >= (95 * n.n + 99) // 100) AS e95,
         (SELECT min(c) FROM (SELECT c, row_number() OVER (ORDER BY c) AS r
            FROM s) q CROSS JOIN n WHERE r >= (99 * n.n + 99) // 100) AS e99)
       SELECT (SELECT count(*) FROM bk)::BIGINT AS n_buckets,
              (SELECT n FROM n)::BIGINT AS n,
              (1::BIGINT << est.b50)::BIGINT AS p50_lo,
              (1::BIGINT << est.b95)::BIGINT AS p95_lo,
              (1::BIGINT << est.b99)::BIGINT AS p99_lo,
              ex.e50::BIGINT AS p50_exact, ex.e95::BIGINT AS p95_exact,
              ex.e99::BIGINT AS p99_exact
       FROM est CROSS JOIN ex""",
    note="mergeable log2 quantile sketch (DDSketch with gamma=2, the "
    "coarsest relative-error setting — chosen because the bucket "
    "index floor(log2(v)) = bit_length-1 is PURE INTEGER arithmetic, "
    "the l85 length(bin()) idiom, so the sketch is exact-reproducible "
    "with no transcendental anywhere): ~30 buckets summarize any "
    "positive-value distribution, buckets merge by addition "
    "(combine-tree / cross-partition / cross-day friendly — the "
    "fourth mergeable-state sketch beside l84 CMS, l85 HLL, l80 "
    "Bloom), and each quantile estimate is the bucket lower bound "
    "2^b, guaranteed within 2x of the exact order statistic — which "
    "this query also computes inline for the accuracy audit.  "
    "Shape: one map-side-combined bucket groupBy vs one exact sort "
    "— the sketch path never materializes the sorted data",
)
def l102(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders").filter(F.col("o_totalprice") > 0)
    s = o.select(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("c"))
    bk = s.groupBy(
        (F.length(F.bin("c")) - 1).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = bk.select("bucket", "cnt", F.sum("cnt").over(w).alias("cm")).localCheckpoint(
        eager=True
    )
    n_ = s.count()

    def kq(p: int) -> int:
        return (p * n_ + 99) // 100

    def best(cm_df, col, k):
        return cm_df.filter(F.col("cm") >= k).agg(F.min(col)).first()[0]

    b50, b95, b99 = (best(cum, "bucket", kq(p)) for p in (50, 95, 99))
    wr = Window.orderBy("c")
    ranked = s.select("c", F.row_number().over(wr).alias("r"))
    e50, e95, e99 = (
        ranked.filter(F.col("r") >= kq(p)).agg(F.min("c")).first()[0]
        for p in (50, 95, 99)
    )
    nb = bk.count()
    return spark.createDataFrame(
        [
            (
                nb,
                n_,
                1 << b50,
                1 << b95,
                1 << b99,
                e50,
                e95,
                e99,
            )
        ],
        "n_buckets bigint, n bigint, p50_lo bigint, p95_lo bigint, p99_lo bigint,"
        " p50_exact bigint, p95_exact bigint, p99_exact bigint",
    )


@_l(
    "l103_triplet_mining",
    """WITH cells AS (SELECT vec_id,
         CASE WHEN embedding[1] > 0 THEN 2 ELSE 0 END
         + CASE WHEN embedding[2] > 0 THEN 1 ELSE 0 END AS cell
       FROM embeddings),
       up AS (SELECT a.vec_id AS va, b.vec_id AS vb,
              unnest(a.embedding)::DOUBLE AS xa,
              unnest(b.embedding)::DOUBLE AS xb
              FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
              WHERE a.vec_id < 20),
       d2 AS (SELECT va, vb, sum((xa - xb) * (xa - xb)) AS d2 FROM up GROUP BY 1, 2),
       lab AS (SELECT d.va, d.vb, d.d2,
               CASE WHEN ca.cell = cb.cell THEN 1 ELSE 0 END AS same_cell
               FROM d2 d JOIN cells ca ON ca.vec_id = d.va
               JOIN cells cb ON cb.vec_id = d.vb),
       pick AS (SELECT va, vb, d2, same_cell,
               row_number() OVER (PARTITION BY va, same_cell
                 ORDER BY d2, vb) AS r
               FROM lab)
       SELECT va AS anchor,
              min(CASE WHEN same_cell = 1 THEN vb END)::BIGINT AS pos_id,
              min(CASE WHEN same_cell = 0 THEN vb END)::BIGINT AS neg_id,
              round(min(CASE WHEN same_cell = 1 THEN d2 END), 6) AS pos_d2,
              round(min(CASE WHEN same_cell = 0 THEN d2 END), 6) AS neg_d2,
              round(min(CASE WHEN same_cell = 0 THEN d2 END)
                    - min(CASE WHEN same_cell = 1 THEN d2 END), 6) AS margin
       FROM pick WHERE r = 1 GROUP BY 1 ORDER BY 1""",
    note="contrastive triplet mining for embedding-model training: per "
    "anchor, the nearest SAME-cell vector (positive) and the nearest "
    "DIFFERENT-cell vector (hard negative, the semi-hard mining rule "
    "of FaceNet/SimCSE pipelines) with the margin the loss would see "
    "— the (anchor, pos, neg) file a contrastive trainer consumes.  "
    "Cells are a deterministic sign quantization of the first two "
    "dims (stand-in for l66's kmeans cells, keeping the oracle "
    "single-stage); distances argmin under (d2, id) total order "
    "with the l03 raw-value-order + 6dp-output idiom.  Shape: "
    "anchor-set x corpus is the brute-force BASELINE declared for "
    "correctness — the scale path swaps in the LSH/IVF candidate "
    "generators (l12/l17) exactly as Engine.similar_topk routes",
)
def l103(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = Catalog(spark, sf_dir).table("embeddings")
    cells = em.select(
        "vec_id",
        (
            F.when(F.col("embedding")[0] > 0, 2).otherwise(0)
            + F.when(F.col("embedding")[1] > 0, 1).otherwise(0)
        ).alias("cell"),
    )
    a = em.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("va"), F.col("embedding").alias("ea")
    )
    b = em.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"))
    pairs = a.join(b, F.col("vb") != F.col("va"))
    d2 = pairs.select(
        "va",
        "vb",
        F.aggregate(
            F.zip_with(
                "ea",
                "eb",
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("d2"),
    )
    ca = cells.select(F.col("vec_id").alias("va"), F.col("cell").alias("cell_a"))
    cb = cells.select(F.col("vec_id").alias("vb"), F.col("cell").alias("cell_b"))
    lab = (
        d2.join(F.broadcast(ca), "va")
        .join(F.broadcast(cb), "vb")
        .select(
            "va",
            "vb",
            "d2",
            (F.col("cell_a") == F.col("cell_b")).cast("int").alias("same_cell"),
        )
    )
    w = Window.partitionBy("va", "same_cell").orderBy("d2", "vb")
    pick = lab.select("va", "vb", "d2", "same_cell", F.row_number().over(w).alias("r"))
    return (
        pick.filter(F.col("r") == 1)
        .groupBy(F.col("va").alias("anchor"))
        .agg(
            F.min(F.when(F.col("same_cell") == 1, F.col("vb"))).alias("pos_id"),
            F.min(F.when(F.col("same_cell") == 0, F.col("vb"))).alias("neg_id"),
            F.round(F.min(F.when(F.col("same_cell") == 1, F.col("d2"))), 6).alias(
                "pos_d2"
            ),
            F.round(F.min(F.when(F.col("same_cell") == 0, F.col("d2"))), 6).alias(
                "neg_d2"
            ),
            F.round(
                F.min(F.when(F.col("same_cell") == 0, F.col("d2")))
                - F.min(F.when(F.col("same_cell") == 1, F.col("d2"))),
                6,
            ).alias("margin"),
        )
        .select(
            "anchor",
            F.col("pos_id").cast("long").alias("pos_id"),
            F.col("neg_id").cast("long").alias("neg_id"),
            "pos_d2",
            "neg_d2",
            "margin",
        )
        .orderBy("anchor")
    )


@_l(
    "l104_naive_bayes",
    """WITH tok AS (SELECT doc_id,
         CASE WHEN lang = 'en' THEN 'en' ELSE 'other' END AS cls,
         unnest(string_split(text, ' ')) AS term
       FROM documents),
       t2 AS (SELECT doc_id, cls, term FROM tok WHERE term <> ''),
       cw AS (SELECT cls, term, count(*) AS c FROM t2 GROUP BY 1, 2),
       ct AS (SELECT cls, sum(c) AS n FROM cw GROUP BY 1),
       v AS (SELECT count(DISTINCT term) AS v FROM t2),
       pri AS (SELECT cls, count(DISTINCT doc_id) AS docs FROM t2 GROUP BY 1),
       nd AS (SELECT count(DISTINCT doc_id) AS nd FROM t2),
       dt AS (SELECT doc_id, term, count(*) AS k FROM t2
              WHERE doc_id < 30 GROUP BY 1, 2),
       sc AS (SELECT d.doc_id, c.cls,
         sum(d.k * ln((coalesce(cw.c, 0) + 1.0) / (c.n + v.v))) AS ll
       FROM dt d CROSS JOIN ct c CROSS JOIN v
       LEFT JOIN cw ON cw.cls = c.cls AND cw.term = d.term
       GROUP BY 1, 2),
       full_sc AS (SELECT s.doc_id, s.cls,
         s.ll + ln(CAST(p.docs AS DOUBLE) / nd.nd) AS score
       FROM sc s JOIN pri p ON p.cls = s.cls CROSS JOIN nd)
       SELECT doc_id,
         round(min(CASE WHEN cls = 'en' THEN score END), 6) AS score_en,
         round(min(CASE WHEN cls = 'other' THEN score END), 6) AS score_other,
         round(min(CASE WHEN cls = 'en' THEN score END)
               - min(CASE WHEN cls = 'other' THEN score END), 6) AS margin
       FROM full_sc GROUP BY 1 ORDER BY 1""",
    note="multinomial Naive Bayes language scorer — the fourth "
    "in-engine shallow model (l93 logistic GD, l97 stump, l94 "
    "calibration): add-one-smoothed per-class token likelihoods + "
    "log prior, scored over 30 docs against the corpus-trained "
    "counts (in-corpus scoring declared as such; a holdout split "
    "is l18 composed in front).  Training IS two groupBys — the "
    "reason NB is the classic first classifier at warehouse scale: "
    "no iterations, counts merge map-side, the model is a "
    "(class, term) frame joined back at score time.  Scores are "
    "per-class log-likelihood sums rounded 6dp with the l71 float "
    "idiom, margin emitted instead of an argmax class (threshold "
    "belongs to the caller, no float argmax hazard)",
)
def l104(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    tok = d.select(
        "doc_id",
        F.when(F.col("lang") == "en", "en").otherwise("other").alias("cls"),
        F.explode(F.split("text", " ")).alias("term"),
    ).filter(F.col("term") != "")
    cw = tok.groupBy("cls", "term").agg(F.count(F.lit(1)).alias("c"))
    ct = cw.groupBy("cls").agg(F.sum("c").alias("n"))
    v_ = tok.select("term").distinct().count()
    pri = tok.groupBy("cls").agg(F.countDistinct("doc_id").alias("docs"))
    nd_ = tok.select("doc_id").distinct().count()
    dt = (
        tok.filter(F.col("doc_id") < 30)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    sc = (
        dt.crossJoin(F.broadcast(ct))
        .join(cw, ["cls", "term"], "left")
        .select(
            "doc_id",
            "cls",
            (
                F.col("k")
                * F.log(
                    (F.coalesce("c", F.lit(0)) + 1.0) / (F.col("n") + F.lit(float(v_)))
                )
            ).alias("term_ll"),
        )
        .groupBy("doc_id", "cls")
        .agg(F.sum("term_ll").alias("ll"))
    )
    full_sc = sc.join(F.broadcast(pri), "cls").select(
        "doc_id",
        "cls",
        (F.col("ll") + F.log(F.col("docs").cast("double") / F.lit(float(nd_)))).alias(
            "score"
        ),
    )
    return (
        full_sc.groupBy("doc_id")
        .agg(
            F.round(F.min(F.when(F.col("cls") == "en", F.col("score"))), 6).alias(
                "score_en"
            ),
            F.round(F.min(F.when(F.col("cls") == "other", F.col("score"))), 6).alias(
                "score_other"
            ),
            F.round(
                F.min(F.when(F.col("cls") == "en", F.col("score")))
                - F.min(F.when(F.col("cls") == "other", F.col("score"))),
                6,
            ).alias("margin"),
        )
        .orderBy("doc_id")
    )


@_l(
    "l105_winnowing",
    """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 80),
       pos AS (SELECT doc_id, i,
         ('0x' || substring(md5(substring(text, i::INT, 8)), 1, 15))::BIGINT
           % 1099511627776 AS hv
       FROM d CROSS JOIN (SELECT unnest(range(1, 4090)) AS i) r
       WHERE i + 7 <= length(text)),
       ky AS (SELECT doc_id, i, hv * 4096 + (4095 - i) AS k FROM pos),
       ng AS (SELECT doc_id, count(*) AS n_grams FROM ky GROUP BY 1),
       wm AS (SELECT k.doc_id, k.i,
         min(k.k) OVER (PARTITION BY k.doc_id ORDER BY k.i
           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wk
       FROM ky k),
       fps AS (SELECT DISTINCT w.doc_id, w.wk FROM wm w
               JOIN ng ON ng.doc_id = w.doc_id
               WHERE w.i + 3 <= ng.n_grams),
       fcount AS (SELECT doc_id, count(*) AS n_fps FROM fps GROUP BY 1),
       fh AS (SELECT DISTINCT doc_id, wk // 4096 AS h FROM fps),
       sh AS (SELECT a.doc_id, count(DISTINCT a.h) AS n_shared
              FROM fh a JOIN fh b ON a.h = b.h AND b.doc_id <> a.doc_id
              GROUP BY 1)
       SELECT ng.doc_id, ng.n_grams::BIGINT AS n_grams,
              fcount.n_fps::BIGINT AS n_fps,
              coalesce(sh.n_shared, 0)::BIGINT AS n_shared
       FROM ng JOIN fcount ON fcount.doc_id = ng.doc_id
       LEFT JOIN sh ON sh.doc_id = ng.doc_id
       ORDER BY ng.doc_id""",
    note="winnowing fingerprints (Schleimer/Wilkerson/Aiken — the MOSS "
    "plagiarism detector): every w=4 window of 8-gram hashes "
    "contributes its minimum, guaranteeing any match of length >= "
    "k+w-1 shares a fingerprint — position-robust local dedup that "
    "neither fixed chunks (m03) nor content-defined boundaries (l90) "
    "provide.  The rightmost-tie rule is encoded INTO the integer "
    "key (hv40*4096 + (4095-pos)), so window mins, the fingerprint "
    "set, and the cross-doc share census are all exact BIGINT "
    "operations — no arg_min tie ambiguity.  Shape: per-doc "
    "window-min over the gram frame (one partition window), "
    "fingerprint density ~2/(w+1) of grams, cross-doc sharing is an "
    "inverted-index equi-join on the 40-bit hash — at 100 TB the "
    "fingerprint table IS the dedup index, ~40x smaller than the "
    "gram table",
)
def l105(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents").filter(F.col("doc_id") < 80)
    pos = (
        d.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(1), F.length("text") - 7)).alias("i"),
        )
        .select(
            "doc_id",
            "i",
            (
                F.conv(
                    F.substring(F.md5(F.expr("substring(text, i, 8)")), 1, 15), 16, 10
                ).cast("long")
                % F.lit(1099511627776)
            ).alias("hv"),
        )
    )
    ky = pos.select(
        "doc_id", "i", (F.col("hv") * 4096 + (4095 - F.col("i"))).alias("k")
    )
    ng = ky.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    wwin = (
        Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, 3)
    )
    wm = ky.select("doc_id", "i", F.min("k").over(wwin).alias("wk"))
    fps = (
        wm.join(F.broadcast(ng), "doc_id")
        .filter(F.col("i") + 3 <= F.col("n_grams"))
        .select("doc_id", "wk")
        .distinct()
    )
    fcount = fps.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fps"))
    fh = fps.select("doc_id", (F.col("wk") / 4096).cast("long").alias("h")).distinct()
    a = fh.alias("a")
    b = fh.alias("b")
    sh = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("b.doc_id") != F.col("a.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_id"))
        .agg(F.countDistinct(F.col("a.h")).alias("n_shared"))
    )
    return (
        ng.join(fcount, "doc_id")
        .join(sh, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("n_fps").cast("long").alias("n_fps"),
            F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared"),
        )
        .orderBy("doc_id")
    )


@_l(
    "l107_text_contrastive",
    """WITH docs AS (SELECT doc_id,
         list_filter(string_split(text,' '), x -> x <> '') AS l FROM documents),
       sh AS (SELECT DISTINCT doc_id, s[1] || ' ' || s[2] AS shingle
              FROM (SELECT doc_id, unnest(list_zip(l, l[2:])) AS s FROM docs) z
              WHERE s[2] IS NOT NULL),
       sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
       inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
                 FROM sh a JOIN sh b ON a.shingle = b.shingle
                   AND a.doc_id <> b.doc_id
                 GROUP BY 1, 2),
       j AS MATERIALIZED (SELECT a, b, i::DOUBLE/(sa.sz + sb.sz - i) AS jac
            FROM inter JOIN sizes sa ON sa.doc_id = a
            JOIN sizes sb ON sb.doc_id = b),
       pos AS (SELECT a, b, jac, row_number() OVER
                 (PARTITION BY a ORDER BY jac DESC, b) AS rk
               FROM j WHERE jac >= 0.5),
       neg AS (SELECT a, b, jac, row_number() OVER
                 (PARTITION BY a ORDER BY jac DESC, b) AS rk
               FROM j WHERE jac < 0.5)
       SELECT p.a AS anchor, p.b AS pos, n.b AS neg,
              round(p.jac, 4) AS j_pos, round(n.jac, 4) AS j_neg
       FROM pos p JOIN neg n ON p.a = n.a
       WHERE p.rk = 1 AND n.rk = 1 ORDER BY 1""",
    note="contrastive pair mining on RAW TEXT (l103 is the embedding "
    "sibling, cited both ways): per anchor the positive is its "
    "highest-Jaccard bigram-shingle neighbor >= 0.5 (a true near-dup) "
    "and the hard negative is the highest-Jaccard neighbor BELOW the "
    "threshold — lexically close but non-duplicate, exactly the pair "
    "a text-embedding trainer wants.  Candidates come from the "
    "shingle inverted-index equi-join (never |docs|^2); Jaccard is a "
    "ratio of exact ints so cross-engine argmax ordering is "
    "bit-stable, ties broken on partner id.  At 100 TB the same "
    "shape runs off MinHash-LSH candidates instead of raw shingle "
    "co-occurrence (swap ngram_jaccard_pairs for the l02 banding)",
)
def l107(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    p = ngram_jaccard_pairs(docs, n=2)
    sym = p.unionAll(
        p.select(F.col("b").alias("a"), F.col("a").alias("b"), "jaccard")
    )
    w = Window.partitionBy("a").orderBy(F.desc("jaccard"), F.asc("b"))
    pos = (
        sym.filter(F.col("jaccard") >= 0.5)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
    )
    neg = (
        sym.filter(F.col("jaccard") < 0.5)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
    )
    return (
        pos.select(
            F.col("a").alias("anchor"),
            F.col("b").alias("pos"),
            F.round("jaccard", 4).alias("j_pos"),
        )
        .join(
            neg.select(
                F.col("a").alias("anchor"),
                F.col("b").alias("neg"),
                F.round("jaccard", 4).alias("j_neg"),
            ),
            "anchor",
        )
        .select("anchor", "pos", "neg", "j_pos", "j_neg")
        .orderBy("anchor")
    )


def _silhouette_oracle(k: int = 8, iters: int = 3, dim: int = 64) -> str:
    chain, final = _kmeans_chain(k, iters, dim)
    return f"""WITH {chain},
asn AS MATERIALIZED (SELECT vec_id, cid, sqrt(dist) AS a FROM {final}),
ad AS MATERIALIZED (SELECT vec_id, cid, dist FROM d{iters}),
b AS (SELECT d.vec_id, sqrt(min(d.dist)) AS b
      FROM ad d JOIN asn ON d.vec_id = asn.vec_id AND d.cid <> asn.cid
      GROUP BY 1),
s AS (SELECT asn.vec_id, asn.cid, (b.b - asn.a) / greatest(asn.a, b.b) AS s
      FROM asn JOIN b ON asn.vec_id = b.vec_id)
SELECT CAST(cid AS INT) AS cluster_id, count(*) AS n,
       round(avg(s), 4) AS avg_silhouette, round(min(s), 4) AS min_silhouette
FROM s GROUP BY 1 ORDER BY 1"""


@_l(
    "l106_silhouette",
    _silhouette_oracle(),
    note="simplified silhouette score per k-means cluster (the l35 "
    "fit, k=8/3 rounds): a = Euclidean distance to the OWN final "
    "centroid, b = min distance to any other centroid, s = "
    "(b-a)/max(a,b) — the standard clustering-quality diagnostic in "
    "its medoid-free form, which is the ONLY form that scales: full "
    "silhouette is all-pairs O(n^2) point-point distances, the "
    "simplified form is n x k point-centroid distances off the SAME "
    "broadcast cross-join the assignment already does (kmeans_lloyd "
    "with_all_dists=True reuses the final iteration's distance table "
    "— zero extra passes over the vectors).  Oracle extends the l35 "
    "unrolled-Lloyd chain; sqrt/min/greatest over identical doubles "
    "are bit-identical, avg(s) rounded 4dp (l35-precedent drift "
    "~1e-13 on centroid means, far from any half boundary)",
)
def l106(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import kmeans_lloyd

    emb = Catalog(spark, sf_dir).table("embeddings")
    assigned, alld = kmeans_lloyd(emb, k=8, iters=3, with_all_dists=True)
    a = assigned.select("vec_id", "cid", F.sqrt("dist").alias("a"))
    b = (
        alld.join(a.select("vec_id", F.col("cid").alias("own"), "a"), "vec_id")
        .filter(F.col("cid") != F.col("own"))
        .groupBy("vec_id")
        .agg(F.sqrt(F.min("dist")).alias("b"), F.first("a").alias("a"), F.first("own").alias("own"))
    )
    s = b.withColumn("s", (F.col("b") - F.col("a")) / F.greatest("a", "b"))
    return (
        s.groupBy(F.col("own").cast("int").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("s"), 4).alias("avg_silhouette"),
            F.round(F.min("s"), 4).alias("min_silhouette"),
        )
        .orderBy("cluster_id")
    )


def _huffman_chain(k: int = 16) -> str:
    """Unrolled k-1-step Huffman merge chain (kmeans-chain precedent).

    State rows (sym, freq, depth, grp): grp identifies the current
    tree group (id = lexicographic min member symbol), its frequency
    is the exact integer sum of member leaf frequencies.  Each step
    merges the two smallest groups under the total order (freq, grp)
    and increments every member leaf's depth.
    """
    parts = [
        f"""toks AS (
         SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS sym
         FROM documents),
       m0 AS MATERIALIZED (
         SELECT sym, freq, 0 AS depth, sym AS grp FROM (
           SELECT sym, count(*)::BIGINT AS freq,
                  row_number() OVER (ORDER BY count(*) DESC, sym) AS rk
           FROM toks GROUP BY sym) t
         WHERE rk <= {k})"""
    ]
    for s in range(1, k):
        parts.append(
            f"""p{s} AS MATERIALIZED (
         SELECT grp, row_number() OVER (ORDER BY sum(freq), grp) AS rk
         FROM m{s - 1} GROUP BY grp),
       m{s} AS MATERIALIZED (
         SELECT m.sym, m.freq,
                m.depth + CASE WHEN p.rk <= 2 THEN 1 ELSE 0 END AS depth,
                CASE WHEN p.rk <= 2
                     THEN (SELECT min(grp) FROM p{s} WHERE rk <= 2)
                     ELSE m.grp END AS grp
         FROM m{s - 1} m JOIN p{s} p ON m.grp = p.grp)"""
        )
    return ",\n       ".join(parts)


@_l(
    "l108_huffman",
    f"""WITH {_huffman_chain(16)}
       SELECT sym, freq, depth::INT AS code_len
       FROM m15 ORDER BY sym""",
    note="optimal prefix-code lengths (Huffman) for the 16 most "
    "frequent corpus tokens — the vocabulary-compression / "
    "tokenizer-design measurement (expected bits/token under the "
    "optimal code vs the flat 4-bit encoding).  The data-sized pass "
    "is the distributed token count (map-side combined groupBy, the "
    "real work at 100 TB); the 15-merge tree on k=16 symbols is "
    "O(k log k) driver-scale control state exactly like l35's k "
    "centroids, computed in Python from the collected (sym, freq) "
    "pairs.  Determinism: merges follow the total order (group "
    "freq, group id) with group id = lexicographic min member "
    "symbol, ASCII-ordered identically in Python and DuckDB; all "
    "frequencies exact BIGINTs.  Oracle unrolls the 15 merges as a "
    "MATERIALIZED CTE chain (kmeans-chain precedent)",
)
def l108(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    top = (
        docs.select(F.explode(F.split("text", " ")).alias("sym"))
        .filter(F.col("sym") != "")
        .groupBy("sym")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("sym"))
        .limit(16)
        .collect()
    )
    leaves = [(r["sym"], int(r["freq"])) for r in top]
    grp = {s: s for s, _ in leaves}
    depth = {s: 0 for s, _ in leaves}
    for _ in range(len(leaves) - 1):
        gf: dict[str, int] = {}
        for s, f_ in leaves:
            gf[grp[s]] = gf.get(grp[s], 0) + f_
        order = sorted(gf.items(), key=lambda kv: (kv[1], kv[0]))
        g1, g2 = order[0][0], order[1][0]
        ng = min(g1, g2)
        for s, _f in leaves:
            if grp[s] in (g1, g2):
                depth[s] += 1
                grp[s] = ng
    rows = [(s, f_, depth[s]) for s, f_ in leaves]
    return spark.createDataFrame(rows, "sym string, freq bigint, code_len int").orderBy("sym")


@_l(
    "l109_bleu_overlap",
    """WITH docs AS (SELECT doc_id, lang,
         list_filter(string_split(text, ' '), x -> x <> '') AS l
       FROM documents),
       prs AS (SELECT doc_id AS a,
         lead(doc_id) OVER (PARTITION BY lang ORDER BY doc_id) AS b
       FROM docs),
       pp AS (SELECT a, b FROM prs WHERE b IS NOT NULL),
       uni AS (SELECT doc_id, t.term, count(*) AS c
               FROM docs, unnest(l) AS t(term) GROUP BY 1, 2),
       lens AS (SELECT doc_id, len(l)::BIGINT AS n FROM docs),
       big AS (SELECT doc_id, s[1] || ' ' || s[2] AS g, count(*) AS c
               FROM (SELECT doc_id, unnest(list_zip(l, l[2:])) AS s
                     FROM docs) z
               WHERE s[2] IS NOT NULL GROUP BY 1, 2),
       c1 AS (SELECT p.a, p.b, sum(least(x.c, y.c)) AS clip1
              FROM pp p JOIN uni x ON x.doc_id = p.a
              JOIN uni y ON y.doc_id = p.b AND y.term = x.term
              GROUP BY 1, 2),
       c2 AS (SELECT p.a, p.b, sum(least(x.c, y.c)) AS clip2
              FROM pp p JOIN big x ON x.doc_id = p.a
              JOIN big y ON y.doc_id = p.b AND y.g = x.g
              GROUP BY 1, 2)
       SELECT p.a, p.b, la.n AS len_c, lb.n AS len_r,
              coalesce(c1.clip1, 0)::BIGINT AS clip1,
              coalesce(c2.clip2, 0)::BIGINT AS clip2
       FROM pp p JOIN lens la ON la.doc_id = p.a
       JOIN lens lb ON lb.doc_id = p.b
       LEFT JOIN c1 ON c1.a = p.a AND c1.b = p.b
       LEFT JOIN c2 ON c2.a = p.a AND c2.b = p.b
       ORDER BY p.a""",
    note="BLEU-2 clipped-overlap components between same-lang adjacent "
    "doc pairs (the self-BLEU corpus-diversity probe: high overlap "
    "between UNRELATED same-language docs means a templated/duplicated "
    "corpus — the generation-eval metric run at corpus scale).  "
    "Modified n-gram precision numerators are MULTISET intersections "
    "(sum of min(count_cand, count_ref) per gram, n = 1 and 2 — NOT "
    "the distinct-set containment l40 computes), with candidate/"
    "reference lengths for the brevity penalty; all columns exact "
    "integers per the cross-engine float protocol, so BLEU-2 = "
    "bp * sqrt(clip1/len_c * clip2/(len_c-1)) is one arithmetic step "
    "away in either engine.  Scale: two explode+groupBy count tables "
    "+ candidate-bounded equi-joins — pair count is corpus-linear "
    "(one pair per doc via lead), never quadratic",
)
def l109(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        Catalog(spark, sf_dir)
        .table("documents")
        .select(
            "doc_id",
            "lang",
            F.filter(F.split(F.col("text"), " "), lambda x: x != "").alias("l"),
        )
    )
    w = Window.partitionBy("lang").orderBy("doc_id")
    pp = (
        docs.select(
            F.col("doc_id").alias("a"), F.lead("doc_id").over(w).alias("b")
        )
        .filter(F.col("b").isNotNull())
    )
    uni = (
        docs.select("doc_id", F.explode("l").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    lens = docs.select("doc_id", F.size("l").cast("long").alias("n"))
    bigr = (
        docs.select(
            "doc_id",
            F.explode(
                F.expr(
                    "CASE WHEN size(l) >= 2 THEN transform(sequence(1, size(l) - 1), "
                    "i -> concat(element_at(l, i), ' ', element_at(l, i + 1))) "
                    "ELSE array() END"
                )
            ).alias("g"),
        )
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )

    def clip(cnt: DataFrame, key: str, out: str) -> DataFrame:
        x = cnt.select(F.col("doc_id").alias("a"), key, F.col("c").alias("ca"))
        y = cnt.select(F.col("doc_id").alias("b"), key, F.col("c").alias("cb"))
        return (
            pp.join(x, "a")
            .join(y, ["b", key])
            .groupBy("a", "b")
            .agg(F.sum(F.least("ca", "cb")).alias(out))
        )

    out = (
        pp.join(lens.select(F.col("doc_id").alias("a"), F.col("n").alias("len_c")), "a")
        .join(lens.select(F.col("doc_id").alias("b"), F.col("n").alias("len_r")), "b")
        .join(clip(uni, "term", "c1"), ["a", "b"], "left")
        .join(clip(bigr, "g", "c2"), ["a", "b"], "left")
        .select(
            "a",
            "b",
            "len_c",
            "len_r",
            F.coalesce("c1", F.lit(0)).cast("long").alias("clip1"),
            F.coalesce("c2", F.lit(0)).cast("long").alias("clip2"),
        )
        .orderBy("a")
    )
    return out


@_l(
    "l110_prefix_filter_join",
    """WITH docs AS (SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS l
       FROM documents),
       sh AS (SELECT DISTINCT doc_id, s[1] || ' ' || s[2] AS shingle
              FROM (SELECT doc_id, unnest(list_zip(l, l[2:])) AS s
                    FROM docs) z
              WHERE s[2] IS NOT NULL),
       sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       dfq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1),
       rk AS (SELECT s.doc_id, s.shingle,
                row_number() OVER (PARTITION BY s.doc_id
                                   ORDER BY d.df, s.shingle) AS rn
              FROM sh s JOIN dfq d ON s.shingle = d.shingle),
       pre AS (SELECT r.doc_id, r.shingle
               FROM rk r JOIN sz ON sz.doc_id = r.doc_id
               WHERE r.rn <= sz.n - (sz.n + 1) // 2 + 1),
       cand AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
                FROM pre a JOIN pre b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
       inter AS (SELECT c.a, c.b, count(*) AS i
                 FROM cand c JOIN sh x ON x.doc_id = c.a
                 JOIN sh y ON y.doc_id = c.b AND y.shingle = x.shingle
                 GROUP BY 1, 2)
       SELECT a, b, i::BIGINT AS inter_n,
              (sa.n + sb.n - i)::BIGINT AS union_n
       FROM inter JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
       WHERE 2 * i >= (sa.n + sb.n - i)
       ORDER BY a, b""",
    note="prefix-filtered set-similarity self-join (the PPJoin family): "
    "bigram shingles ranked rarest-first by global document frequency; "
    "each doc indexes ONLY its first n - ceil(tau*n) + 1 shingles "
    "(tau = 0.5), and candidate pairs come from the prefix equi-join "
    "alone.  LOSSLESS by the prefix-filter theorem: two sets with "
    "Jaccard >= tau must share a token within those prefixes under any "
    "common total order, so the verified output (exact integer "
    "intersection/union, 2i >= u <=> J >= 0.5) EQUALS the full "
    "inverted-index join l07 would produce — the declared result pins "
    "that equality.  This is the canonical index-shrinking lever at "
    "100 TB: index volume drops by ~tau*|tokens| and, on Zipfian real "
    "corpora where common shingles dominate, candidate pairs drop "
    "superlinearly (rare-prefix buckets are small by construction).  "
    "The rarest-first order also makes the hot buckets the SMALLEST "
    "ones — the opposite of the skew a naive token join suffers",
)
def l110(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import prefix_filter_jaccard_pairs

    docs = Catalog(spark, sf_dir).table("documents")
    return prefix_filter_jaccard_pairs(docs, tau_num=1, tau_den=2, n=2).orderBy(
        "a", "b"
    )


@_l(
    "l111_skipgram_pairs",
    """WITH docs AS (SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS l
       FROM documents),
       pos AS (SELECT doc_id, unnest(l) AS term,
                      generate_subscripts(l, 1) AS p
               FROM docs),
       sg AS (SELECT term AS w1,
                lead(term, 1) OVER (PARTITION BY doc_id ORDER BY p) AS n1,
                lead(term, 2) OVER (PARTITION BY doc_id ORDER BY p) AS n2
              FROM pos),
       prs AS (SELECT w1, n1 AS w2, 1 AS d FROM sg WHERE n1 IS NOT NULL
               UNION ALL
               SELECT w1, n2, 2 FROM sg WHERE n2 IS NOT NULL)
       SELECT w1, w2, d::INT AS d, count(*)::BIGINT AS cnt
       FROM prs GROUP BY 1, 2, 3
       ORDER BY cnt DESC, w1, w2, d LIMIT 25""",
    note="skip-gram training-pair extraction (the word2vec/embedding "
    "data op): directional (center, context, distance) pairs at window "
    "+1/+2 via positional lead over each doc's token sequence, "
    "aggregated to (w1, w2, d) counts — the co-occurrence corpus every "
    "embedding trainer consumes.  Sibling l82 scores ADJACENT-bigram "
    "collocations with PMI (window 1, statistical score); this emits "
    "the raw multi-distance pair counts (window 2, training carrier) — "
    "kept separate because the carrier genuinely differs (positional "
    "lead-k multiset vs distinct-bigram marginals).  Scale: one "
    "posexplode + two window leads partitioned by doc (sequences "
    "never cross docs, so partitions are bounded by doc length) + one "
    "map-side-combined count shuffle on (w1, w2, d)",
)
def l111(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    pos = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(F.split(F.col("text"), " "), lambda x: x != "")
        ).alias("p", "term"),
    )
    w = Window.partitionBy("doc_id").orderBy("p")
    sg = pos.select(
        F.col("term").alias("w1"),
        F.lead("term", 1).over(w).alias("n1"),
        F.lead("term", 2).over(w).alias("n2"),
    )
    prs = sg.filter(F.col("n1").isNotNull()).select(
        "w1", F.col("n1").alias("w2"), F.lit(1).alias("d")
    ).unionAll(
        sg.filter(F.col("n2").isNotNull()).select(
            "w1", F.col("n2").alias("w2"), F.lit(2).alias("d")
        )
    )
    return (
        prs.groupBy("w1", "w2", F.col("d").cast("int").alias("d"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "w1", "w2", "d")
        .limit(25)
    )


@_l(
    "l112_ngram_span_dedup",
    """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
                FROM documents),
       p AS (SELECT doc_id, unnest(toks) AS tok,
                    generate_subscripts(toks, 1) AS pos,
                    len(toks) AS nt FROM t),
       g AS (SELECT a.doc_id, a.pos,
                    string_agg(b.tok, ' ' ORDER BY b.pos) AS gram
             FROM p a JOIN p b ON a.doc_id = b.doc_id
                             AND b.pos BETWEEN a.pos AND a.pos + 4
             WHERE a.pos <= a.nt - 4
             GROUP BY 1, 2),
       m AS (SELECT a.doc_id AS da, b.doc_id AS db,
                    a.pos AS pa, b.pos AS pb
             FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id),
       runs AS (SELECT da, db, pa - pb AS diag,
                       pa - row_number() OVER (PARTITION BY da, db, pa - pb
                                               ORDER BY pa) AS grp
                FROM m),
       isl AS (SELECT da, db, diag, grp, count(*) AS run_grams
               FROM runs GROUP BY 1, 2, 3, 4)
       SELECT da AS doc_a, db AS doc_b,
              sum(run_grams)::BIGINT AS shared_grams,
              (max(run_grams) + 4)::BIGINT AS max_run_tokens
       FROM isl GROUP BY 1, 2
       ORDER BY shared_grams DESC, doc_a, doc_b LIMIT 25""",
    note="exact repeated-span detection across documents (the "
    "suffix-array substring-dedup idea from the published training-"
    "data dedup literature, approximated at fixed 5-token-gram "
    "granularity — a run of r consecutive matching grams IS a "
    "repeated span of r+4 tokens, so max_run_tokens reports the "
    "longest verbatim overlap per doc pair and shared_grams its "
    "total bulk; MinHash (l02) answers 'similar', THIS answers "
    "'copied verbatim, how long'): positional 5-grams self-joined on "
    "the gram, matches grouped per (pair, diagonal pa-pb), and "
    "consecutive-position islands found with the pa - row_number() "
    "gaps-and-islands trick — every carrier an exact integer, no "
    "floats anywhere.  Scale: the gram equi-join is the l07 inverted-"
    "index shape (shuffle keyed on the gram hash, stop-gram skew "
    "capped the same way); islands are one window over the match "
    "pairs, and match volume — not corpus volume — bounds the cost, "
    "exactly like the suffix-array method's LCP pass",
)
def l112(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph_spark.operators.dedup import ngram_span_pairs

    docs = Catalog(spark, sf_dir).table("documents")
    return (
        ngram_span_pairs(docs, n=5)
        .orderBy(F.col("shared_grams").desc(), "doc_a", "doc_b")
        .limit(25)
    )


@_l(
    "l113_span_coverage",
    """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
                FROM documents),
       p AS (SELECT doc_id, unnest(toks) AS tok,
                    generate_subscripts(toks, 1) AS pos,
                    len(toks) AS nt FROM t),
       g AS (SELECT a.doc_id, a.pos,
                    string_agg(b.tok, ' ' ORDER BY b.pos) AS gram
             FROM p a JOIN p b ON a.doc_id = b.doc_id
                             AND b.pos BETWEEN a.pos AND a.pos + 4
             WHERE a.pos <= a.nt - 4
             GROUP BY 1, 2),
       m AS (SELECT a.doc_id AS da, b.doc_id AS db,
                    a.pos AS pa, b.pos AS pb
             FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id <> b.doc_id),
       iv AS (SELECT DISTINCT da AS doc_id, pa AS s FROM m),
       fl AS (SELECT doc_id, s, s + 4 AS e,
                     CASE WHEN s > coalesce(max(s + 4) OVER (
                            PARTITION BY doc_id ORDER BY s
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                          -1) + 1 THEN 1 ELSE 0 END AS flag
              FROM iv),
       isl AS (SELECT doc_id, s, e,
                      sum(flag) OVER (PARTITION BY doc_id ORDER BY s
                        ROWS UNBOUNDED PRECEDING) AS island
               FROM fl),
       cov AS (SELECT doc_id, island,
                      max(e) - min(s) + 1 AS covered
               FROM isl GROUP BY 1, 2),
       per_doc AS (SELECT doc_id, sum(covered)::BIGINT AS covered_tokens
                   FROM cov GROUP BY 1),
       nt AS (SELECT doc_id, len(string_split(lower(text), ' '))::BIGINT
                       AS n_tokens
              FROM documents)
       SELECT d.doc_id, d.covered_tokens, nt.n_tokens,
              floor(1e4 * d.covered_tokens / nt.n_tokens + 0.5) / 100
                AS coverage_pct
       FROM per_doc d JOIN nt ON nt.doc_id = d.doc_id
       ORDER BY d.covered_tokens DESC, d.doc_id LIMIT 15""",
    note="per-document repeated-span coverage (the DEDUP POLICY signal "
    "l112's pair report feeds: a doc whose tokens are mostly covered "
    "by spans appearing verbatim in OTHER docs is a removal candidate "
    "— the doc-level summary the published substring-dedup pipelines "
    "threshold on): every cross-doc matching 5-gram contributes the "
    "interval [pos, pos+4]; per doc, overlapping/adjacent intervals "
    "merge via the running-max gaps-and-islands flag (new island when "
    "s > cum-max(e) + 1), and coverage = union length over token "
    "count.  All integer carriers; the one ratio is a closing "
    "fixed double expression.  Scale: the gram join is l112's; the "
    "interval union is one window partitioned by doc (bounded by "
    "per-doc match count), and the DISTINCT start-set keeps multi-"
    "partner repeats from double-counting",
)
def l113(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    t = docs.select("doc_id", F.split(F.lower("text"), " ").alias("toks"))
    g = t.select(
        "doc_id",
        F.posexplode(
            # Same short-doc guard as l112 (no 5-gram under 5 tokens).
            F.expr(
                "CASE WHEN size(toks) >= 5 THEN "
                "transform(sequence(1, size(toks) - 4), "
                "p -> concat_ws(' ', slice(toks, p, 5))) "
                "ELSE array() END"
            )
        ).alias("p0", "gram"),
    ).select("doc_id", (F.col("p0") + 1).alias("pos"), "gram")
    a = g.select(F.col("doc_id").alias("da"), F.col("pos").alias("pa"), "gram")
    b = g.select(F.col("doc_id").alias("db"), F.col("pos").alias("pb"), "gram")
    iv = (
        a.join(b, "gram")
        .filter(F.col("da") != F.col("db"))
        .select(F.col("da").alias("doc_id"), F.col("pa").alias("s"))
        .distinct()
    )
    wprev = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    fl = iv.select(
        "doc_id",
        "s",
        (F.col("s") + 4).alias("e"),
        F.when(
            F.col("s") > F.coalesce(F.max(F.col("s") + 4).over(wprev), F.lit(-1)) + 1,
            1,
        )
        .otherwise(0)
        .alias("flag"),
    )
    wcum = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    isl = fl.withColumn("island", F.sum("flag").over(wcum))
    cov = isl.groupBy("doc_id", "island").agg(
        (F.max("e") - F.min("s") + 1).alias("covered")
    )
    per_doc = cov.groupBy("doc_id").agg(
        F.sum("covered").cast("long").alias("covered_tokens")
    )
    nt = t.select("doc_id", F.size("toks").cast("long").alias("n_tokens"))
    return (
        per_doc.join(nt, "doc_id")
        .select(
            "doc_id",
            "covered_tokens",
            "n_tokens",
            F.expr(
                "floor(1e4 * covered_tokens / n_tokens + 0.5) / 100"
            ).alias("coverage_pct"),
        )
        .orderBy(F.col("covered_tokens").desc(), "doc_id")
        .limit(15)
    )


@_l(
    "m12_magic_byte_sniffer",
    """WITH media AS (SELECT doc_id, encode(text) AS payload,
                           octet_length(encode(text))::BIGINT AS n_bytes
                    FROM documents)
       SELECT substr(hex(payload), 1, 4) AS magic_hex,
              count(*)::BIGINT AS n_blobs,
              sum(n_bytes)::BIGINT AS total_bytes
       FROM media GROUP BY 1
       ORDER BY n_blobs DESC, magic_hex LIMIT 15""",
    note="magic-byte format sniffing over the opaque BINARY payload "
    "column — the first thing a data-lake ingest does to a blob "
    "(dispatch by leading bytes: FFD8 jpeg, 8950 png, 'PK' zip...): "
    "group payloads by the hex of their first two bytes, count and "
    "size per magic.  On this fixture payloads are utf-8 text bytes "
    "(codec libs are absent, per the multimodal stub contract), so "
    "the magics are leading characters — but the OPERATIONS under "
    "test are the real ones: binary substring and hex round-trip "
    "identically in both engines, proving the byte-slicing path the "
    "format dispatcher needs.  One map-side-combined aggregate over "
    "the pruned (payload, n_bytes) projection; at 100 TB the scan "
    "reads 2 bytes per blob after parquet column pruning, and the "
    "group key has format-count cardinality",
)
def m12(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    media = to_media_table(docs)
    return (
        # hex-then-slice (not blob-substring-then-hex): DuckDB 1.0 has
        # no BLOB substring, and 4 hex chars == the leading 2 bytes
        media.groupBy(
            F.substring(F.hex("payload"), 1, 4).alias("magic_hex")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_blobs"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
        )
        .orderBy(F.col("n_blobs").desc(), "magic_hex")
        .limit(15)
    )


@_l(
    "l114_span_dedup_capped",
    """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
                FROM documents),
       p AS (SELECT doc_id, unnest(toks) AS tok,
                    generate_subscripts(toks, 1) AS pos,
                    len(toks) AS nt FROM t),
       g AS (SELECT a.doc_id, a.pos,
                    string_agg(b.tok, ' ' ORDER BY b.pos) AS gram
             FROM p a JOIN p b ON a.doc_id = b.doc_id
                             AND b.pos BETWEEN a.pos AND a.pos + 4
             WHERE a.pos <= a.nt - 4
             GROUP BY 1, 2),
       keep AS (SELECT gram FROM g GROUP BY gram
                HAVING count(DISTINCT doc_id) <= 2),
       m AS (SELECT a.doc_id AS da, b.doc_id AS db,
                    a.pos AS pa, b.pos AS pb
             FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
             JOIN keep k ON k.gram = a.gram),
       runs AS (SELECT da, db, pa - pb AS diag,
                       pa - row_number() OVER (PARTITION BY da, db, pa - pb
                                               ORDER BY pa) AS grp
                FROM m),
       isl AS (SELECT da, db, diag, grp, count(*) AS run_grams
               FROM runs GROUP BY 1, 2, 3, 4)
       SELECT da AS doc_a, db AS doc_b,
              sum(run_grams)::BIGINT AS shared_grams,
              (max(run_grams) + 4)::BIGINT AS max_run_tokens
       FROM isl GROUP BY 1, 2
       ORDER BY shared_grams DESC, doc_a, doc_b LIMIT 25""",
    note="l112's span dedup with the STOP-GRAM cap engaged "
    "(max_gram_freq=2): grams appearing in more than 2 documents are "
    "dropped BEFORE the self-join.  This is the guard that makes the "
    "positional-gram join survive skew at 100 TB — a boilerplate gram "
    "in f documents contributes O(f^2) match rows while carrying no "
    "dedup signal (it cannot distinguish WHICH doc copied which), the "
    "exact analogue of l07's stop-shingle cap and the l02 band-hash "
    "occupancy rule.  The cap is a document-frequency groupBy + "
    "semi-join shaped filter upstream of the only shuffle-heavy "
    "stage; the declared pair proves capped semantics match exactly "
    "(not just approximately) between engines.  Sibling: l112 "
    "(uncapped oracle semantics)",
)
def l114(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph_spark.operators.dedup import ngram_span_pairs

    docs = Catalog(spark, sf_dir).table("documents")
    return (
        ngram_span_pairs(docs, n=5, max_gram_freq=2)
        .orderBy(F.col("shared_grams").desc(), "doc_a", "doc_b")
        .limit(25)
    )


@_l(
    "l115_ranking_metrics",
    """WITH fh AS (SELECT user_id, event_type, count(*) AS cnt FROM events
                 WHERE ts < TIMESTAMP '2024-01-16' GROUP BY 1, 2),
       sh AS (SELECT user_id, event_type, count(*) AS cnt FROM events
              WHERE ts >= TIMESTAMP '2024-01-16' GROUP BY 1, 2),
       pred AS (SELECT user_id, event_type,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY cnt DESC, event_type)
                         AS prnk
                FROM fh),
       rel AS (SELECT user_id, event_type FROM (
                 SELECT user_id, event_type,
                        row_number() OVER (PARTITION BY user_id
                                           ORDER BY cnt DESC, event_type)
                          AS trnk
                 FROM sh) WHERE trnk <= 2),
       hits AS (SELECT p.user_id, p.prnk
                FROM pred p JOIN rel r
                  ON p.user_id = r.user_id AND p.event_type = r.event_type),
       users AS (SELECT DISTINCT user_id FROM sh),
       pu AS (SELECT u.user_id,
                CAST(floor(1e6 * coalesce(sum(CASE WHEN h.prnk <= 2
                                               THEN 1 ELSE 0 END), 0)
                           / 2.0 + 0.5) AS BIGINT) AS p2_x1m,
                CAST(floor(1e6 * coalesce(1.0 / min(h.prnk), 0.0) + 0.5)
                     AS BIGINT) AS mrr_x1m,
                CAST(floor(1e6 * coalesce(sum(CASE WHEN h.prnk = 1 THEN 1.0
                                               WHEN h.prnk = 2 THEN 0.63093
                                               ELSE 0.0 END), 0.0)
                           / 1.63093 + 0.5) AS BIGINT) AS ndcg_x1m
              FROM users u LEFT JOIN hits h ON h.user_id = u.user_id
              GROUP BY 1)
       SELECT count(*)::BIGINT AS n_users,
              floor(1e4 * (sum(p2_x1m)::DOUBLE / count(*) / 1e6) + 0.5)
                / 1e4 AS p_at_2,
              floor(1e4 * (sum(mrr_x1m)::DOUBLE / count(*) / 1e6) + 0.5)
                / 1e4 AS mrr,
              floor(1e4 * (sum(ndcg_x1m)::DOUBLE / count(*) / 1e6) + 0.5)
                / 1e4 AS ndcg_at_2
       FROM pu""",
    note="offline ranking-quality metrics with a TEMPORAL HOLDOUT (the "
    "recsys/retrieval eval loop a training pipeline runs after every "
    "model refresh): each user's event types ranked by first-half "
    "count (the 'model'), relevance = top-2 types by second-half "
    "count (the future), scored with Precision@2, MRR (1/rank of the "
    "first relevant type), and NDCG@2.  Float protocol: the DCG "
    "discounts are PRE-ROUNDED LITERALS (1, 0.63093 = 1/log2(3) at "
    "6 dp) so no engine evaluates a transcendental; per-user metrics "
    "are exact rationals floored to x1e6 BIGINT carriers and SUMMED "
    "AS INTEGERS (the q132 protocol), so accumulation order cannot "
    "drift.  Shape: two count groupBys + two row_number windows + "
    "one broadcastable hits join; per-user state is <= |event types| "
    "rows, so the whole eval is map-side at any corpus size",
)
def l115(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    split = F.lit("2024-01-16").cast("timestamp")
    fh = (
        ev.filter(F.col("ts") < split)
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    sh = (
        ev.filter(F.col("ts") >= split)
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("user_id").orderBy(F.col("cnt").desc(), "event_type")
    pred = fh.select("user_id", "event_type", F.row_number().over(w).alias("prnk"))
    rel = (
        sh.select("user_id", "event_type", F.row_number().over(w).alias("trnk"))
        .filter(F.col("trnk") <= 2)
        .select("user_id", "event_type")
    )
    hits = pred.join(rel, ["user_id", "event_type"]).select("user_id", "prnk")
    users = sh.select("user_id").distinct()
    pu = (
        users.join(hits, "user_id", "left")
        .groupBy("user_id")
        .agg(
            F.floor(
                F.lit(1e6)
                * F.coalesce(
                    F.sum(F.when(F.col("prnk") <= 2, 1).otherwise(0)), F.lit(0)
                )
                / F.lit(2.0)
                + F.lit(0.5)
            ).alias("p2_x1m"),
            F.floor(
                F.lit(1e6)
                * F.coalesce(F.lit(1.0) / F.min("prnk"), F.lit(0.0))
                + F.lit(0.5)
            ).alias("mrr_x1m"),
            F.floor(
                F.lit(1e6)
                * F.coalesce(
                    F.sum(
                        F.when(F.col("prnk") == 1, F.lit(1.0))
                        .when(F.col("prnk") == 2, F.lit(0.63093))
                        .otherwise(F.lit(0.0))
                    ),
                    F.lit(0.0),
                )
                / F.lit(1.63093)
                + F.lit(0.5)
            ).alias("ndcg_x1m"),
        )
    )
    return pu.agg(
        F.count(F.lit(1)).alias("n_users"),
        (
            F.floor(
                F.lit(1e4)
                * (F.sum("p2_x1m").cast("double") / F.count(F.lit(1)) / F.lit(1e6))
                + F.lit(0.5)
            )
            / F.lit(1e4)
        ).alias("p_at_2"),
        (
            F.floor(
                F.lit(1e4)
                * (F.sum("mrr_x1m").cast("double") / F.count(F.lit(1)) / F.lit(1e6))
                + F.lit(0.5)
            )
            / F.lit(1e4)
        ).alias("mrr"),
        (
            F.floor(
                F.lit(1e4)
                * (F.sum("ndcg_x1m").cast("double") / F.count(F.lit(1)) / F.lit(1e6))
                + F.lit(0.5)
            )
            / F.lit(1e4)
        ).alias("ndcg_at_2"),
    )


@_l(
    "l116_random_projection",
    """WITH q AS (SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(floor(x * 1000 + 0.5) AS BIGINT)) AS xq
           FROM embeddings),
       u AS (SELECT vec_id, unnest(xq) AS x,
                    generate_subscripts(xq, 1) AS d FROM q),
       pr AS (SELECT u.vec_id, t.j,
                sum(u.x * (1 - 2 * ((strpos('0123456789abcdef',
                       substring(md5('jl|7|' || (u.d - 1)::VARCHAR || '|'
                                     || t.j::VARCHAR), 1, 1)) - 1) % 2)))
                  ::BIGINT AS y
              FROM u CROSS JOIN range(16) t(j)
              GROUP BY 1, 2),
       dy AS (SELECT a.vec_id AS va,
                     sum((a.y - b.y) * (a.y - b.y))::BIGINT AS dy2
              FROM pr a JOIN pr b ON b.vec_id = a.vec_id + 1 AND a.j = b.j
              WHERE a.vec_id % 2 = 0 GROUP BY 1),
       dx AS (SELECT a.vec_id AS va,
                     sum((a.x - b.x) * (a.x - b.x))::BIGINT AS dx2
              FROM u a JOIN u b ON b.vec_id = a.vec_id + 1 AND a.d = b.d
              WHERE a.vec_id % 2 = 0 GROUP BY 1),
       rx AS (SELECT dy.va,
                CAST(floor(1e6 * (dy.dy2::DOUBLE / (16 * dx.dx2)) + 0.5)
                     AS BIGINT) AS ratio_x1m
              FROM dy JOIN dx ON dx.va = dy.va WHERE dx.dx2 > 0)
       SELECT count(*)::BIGINT AS n_pairs,
              min(ratio_x1m)::BIGINT AS min_ratio_x1m,
              max(ratio_x1m)::BIGINT AS max_ratio_x1m,
              floor(1e4 * (sum(ratio_x1m)::DOUBLE / count(*) / 1e6) + 0.5)
                / 1e4 AS avg_ratio,
              sum(CASE WHEN ratio_x1m BETWEEN 500000 AND 2000000
                       THEN 1 ELSE 0 END)::BIGINT AS n_within_2x
       FROM rx""",
    note="Johnson-Lindenstrauss signed random projection 64 -> 16 dims "
    "with a measured distortion audit (the cheap ANN front-end: score "
    "in 16 dims, re-rank survivors in 64 — the same shrink-then-rerank "
    "shape as l72's IVF-PQ): ±1 signs come from md5 hex-digit parity "
    "(jl_sign_matrix, operators/similarity.py) so both engines build "
    "the IDENTICAL matrix; inputs are quantized to integer milli-units "
    "first, so projections, pairwise squared distances (consecutive-id "
    "pairs) and their x1e6 distortion ratios dy2/(16*dx2) are EXACT "
    "BIGINT carriers with one final division each — hash-exact, no "
    "float accumulation anywhere.  E[ratio] = 1 for ±1 entries; "
    "n_within_2x reports the JL concentration the reduction actually "
    "achieves.  Shape: the projection is out_dim zip_with/aggregate "
    "folds per row inside whole-stage codegen (zero shuffle, no UDF); "
    "the audit joins are id-equi-joins on consecutive ids",
)
def l116(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph_spark.operators.similarity import random_projection

    em = Catalog(spark, sf_dir).table("embeddings")
    pr = random_projection(em, dim=64, out_dim=16, quantize=1000).select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CAST(floor(x * 1000 + 0.5) AS BIGINT))"
        ).alias("xq"),
        "proj",
    )
    a = pr.filter(F.col("vec_id") % 2 == 0)
    b = pr.select(
        (F.col("vec_id") - 1).alias("vec_id"),
        F.col("xq").alias("xqb"),
        F.col("proj").alias("projb"),
    )
    sq = lambda u, v: F.aggregate(  # noqa: E731
        F.zip_with(F.col(u), F.col(v), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    pairs = a.join(b, "vec_id").select(
        "vec_id",
        sq("proj", "projb").alias("dy2"),
        sq("xq", "xqb").alias("dx2"),
    )
    rx = pairs.filter(F.col("dx2") > 0).select(
        F.floor(
            F.lit(1e6) * (F.col("dy2").cast("double") / (16 * F.col("dx2")))
            + F.lit(0.5)
        ).alias("ratio_x1m")
    )
    return rx.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("ratio_x1m").cast("long").alias("min_ratio_x1m"),
        F.max("ratio_x1m").cast("long").alias("max_ratio_x1m"),
        (
            F.floor(
                F.lit(1e4)
                * (F.sum("ratio_x1m").cast("double") / F.count(F.lit(1)) / F.lit(1e6))
                + F.lit(0.5)
            )
            / F.lit(1e4)
        ).alias("avg_ratio"),
        F.sum(
            F.when(
                (F.col("ratio_x1m") >= 500000) & (F.col("ratio_x1m") <= 2000000), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_within_2x"),
    )


@_l(
    "l117_text_triplets",
    """WITH t AS (SELECT doc_id, lang,
                       string_split(lower(text), ' ') AS toks
              FROM documents),
       sh AS (SELECT DISTINCT a.doc_id, a.lang,
                     a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
              FROM (SELECT doc_id, lang, unnest(toks) AS tok,
                           generate_subscripts(toks, 1) AS p,
                           len(toks) AS nt FROM t) a
              JOIN (SELECT doc_id, unnest(toks) AS tok,
                           generate_subscripts(toks, 1) AS p FROM t) b
                ON b.doc_id = a.doc_id AND b.p = a.p + 1
              JOIN (SELECT doc_id, unnest(toks) AS tok,
                           generate_subscripts(toks, 1) AS p FROM t) c
                ON c.doc_id = a.doc_id AND c.p = a.p + 2),
       sz AS (SELECT doc_id, lang, count(*)::BIGINT AS n_sh
              FROM sh GROUP BY 1, 2),
       inter AS (SELECT a.doc_id AS va, b.doc_id AS vb,
                        count(*)::BIGINT AS i
                 FROM sh a JOIN sh b
                   ON b.shingle = a.shingle AND b.doc_id <> a.doc_id
                 WHERE a.doc_id < 15 GROUP BY 1, 2),
       pos AS (SELECT va, vb AS pos_id, jx AS pos_jx_x1m FROM (
                 SELECT n.va, n.vb,
                        (n.i * 1000000) // (sa.n_sh + sb.n_sh - n.i) AS jx,
                        row_number() OVER (PARTITION BY n.va
                          ORDER BY (n.i * 1000000)
                                   // (sa.n_sh + sb.n_sh - n.i) DESC, n.vb)
                          AS rn
                 FROM inter n
                 JOIN sz sa ON sa.doc_id = n.va
                 JOIN sz sb ON sb.doc_id = n.vb) p WHERE rn = 1),
       neg AS (SELECT va, vb AS neg_id FROM (
                 SELECT a.doc_id AS va, s.doc_id AS vb,
                        row_number() OVER (PARTITION BY a.doc_id
                          ORDER BY md5(a.doc_id::VARCHAR || '|'
                                       || s.doc_id::VARCHAR), s.doc_id)
                          AS rn
                 FROM sz a JOIN sz s
                   ON s.lang = a.lang AND s.doc_id <> a.doc_id
                 WHERE a.doc_id < 15
                   AND NOT EXISTS (SELECT 1 FROM inter n
                                   WHERE n.va = a.doc_id
                                     AND n.vb = s.doc_id)) q
               WHERE rn = 1)
       SELECT p.va AS anchor, p.pos_id, p.pos_jx_x1m::BIGINT AS pos_jx_x1m,
              n2.neg_id
       FROM pos p JOIN neg n2 ON n2.va = p.va
       ORDER BY anchor""",
    note="contrastive triplet mining ON TEXT (l103's embedding sibling "
    "— same (anchor, pos, neg) trainer file, different carrier "
    "algebra): positive = the highest word-3-gram-Jaccard document "
    "per anchor, found through the l07 shingle inverted index — "
    "candidates come ONLY from the shingle equi-join, never an "
    "all-pairs text comparison; negative = an md5-selected same-LANG "
    "document sharing ZERO shingles (in-batch hard-ish negative: "
    "same language keeps it non-trivial, the anti-join keeps it "
    "actually negative, the anchor-salted md5 keeps the choice "
    "deterministic and spread).  Jaccard ordering is EXACT: "
    "(i * 1e6) // (na + nb - i) integer division, so the per-anchor "
    "argmax has no float tie hazard.  Scale: inverted-index join + "
    "one anti-join keyed on (lang, no-overlap) per anchor — the "
    "anchor set bounds the probe side, stop-shingle caps (l07) bound "
    "the index side",
)
def l117(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    t = docs.select(
        "doc_id", "lang", F.split(F.lower("text"), " ").alias("toks")
    )
    sh = t.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "CASE WHEN size(toks) >= 3 THEN array_distinct("
                "transform(sequence(1, size(toks) - 2), "
                "p -> concat_ws(' ', slice(toks, p, 3)))) "
                "ELSE array() END"
            )
        ).alias("shingle"),
    )
    sz = sh.groupBy("doc_id", "lang").agg(F.count(F.lit(1)).cast("long").alias("n_sh"))
    a = sh.filter(F.col("doc_id") < 15).select(
        F.col("doc_id").alias("va"), "shingle"
    )
    b = sh.select(F.col("doc_id").alias("vb"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("vb") != F.col("va"))
        .groupBy("va", "vb")
        .agg(F.count(F.lit(1)).cast("long").alias("i"))
    )
    sza = sz.select(F.col("doc_id").alias("va"), F.col("n_sh").alias("na"))
    szb = sz.select(F.col("doc_id").alias("vb"), F.col("n_sh").alias("nb"))
    scored = (
        inter.join(F.broadcast(sza), "va")
        .join(F.broadcast(szb), "vb")
        .select(
            "va",
            "vb",
            F.expr("(i * 1000000) DIV (na + nb - i)").alias("jx"),
        )
    )
    wpos = Window.partitionBy("va").orderBy(F.col("jx").desc(), "vb")
    pos = (
        scored.withColumn("rn", F.row_number().over(wpos))
        .filter(F.col("rn") == 1)
        .select("va", F.col("vb").alias("pos_id"), F.col("jx").alias("pos_jx_x1m"))
    )
    anchors = sz.filter(F.col("doc_id") < 15).select(
        F.col("doc_id").alias("va"), F.col("lang").alias("la")
    )
    cands = sz.select(F.col("doc_id").alias("vb"), F.col("lang").alias("lb"))
    negpool = (
        anchors.join(cands, F.col("la") == F.col("lb"))
        .filter(F.col("vb") != F.col("va"))
        .join(inter, ["va", "vb"], "left_anti")
    )
    wneg = Window.partitionBy("va").orderBy(
        F.md5(
            F.concat(
                F.col("va").cast("string"), F.lit("|"), F.col("vb").cast("string")
            )
        ),
        "vb",
    )
    neg = (
        negpool.withColumn("rn", F.row_number().over(wneg))
        .filter(F.col("rn") == 1)
        .select("va", F.col("vb").alias("neg_id"))
    )
    return (
        pos.join(neg, "va")
        .select(
            F.col("va").alias("anchor"),
            "pos_id",
            F.col("pos_jx_x1m").cast("long").alias("pos_jx_x1m"),
            "neg_id",
        )
        .orderBy("anchor")
    )


@_l(
    "l118_cohens_kappa",
    """WITH r AS (SELECT doc_id,
                CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS ra,
                CASE WHEN len(list_filter(string_split(text, ' '),
                                          x -> x <> '')) >= 55
                     THEN 1 ELSE 0 END AS rb
           FROM documents),
       c AS (SELECT count(*)::BIGINT AS n,
                    sum(CASE WHEN ra = 1 AND rb = 1 THEN 1 ELSE 0 END)::BIGINT AS a,
                    sum(CASE WHEN ra = 1 AND rb = 0 THEN 1 ELSE 0 END)::BIGINT AS b,
                    sum(CASE WHEN ra = 0 AND rb = 1 THEN 1 ELSE 0 END)::BIGINT AS cc,
                    sum(CASE WHEN ra = 0 AND rb = 0 THEN 1 ELSE 0 END)::BIGINT AS d
             FROM r)
       SELECT n, a, b, cc, d,
              round((a + d) / (n * 1.0), 6) AS po,
              round(((a + b) * 1.0 * (a + cc) + (cc + d) * 1.0 * (b + d))
                    / (n * 1.0 * n), 6) AS pe,
              round(((a + d) / (n * 1.0)
                     - ((a + b) * 1.0 * (a + cc) + (cc + d) * 1.0 * (b + d))
                       / (n * 1.0 * n))
                    / (1.0 - ((a + b) * 1.0 * (a + cc)
                              + (cc + d) * 1.0 * (b + d)) / (n * 1.0 * n)),
                    6) AS kappa
       FROM c""",
    note="Cohen's kappa inter-rater agreement — the labeling-QC "
    "statistic a training-data annotation pipeline gates on before "
    "trusting weak labels: rater A = char-length band (>= 300), "
    "rater B = token-count band (>= 55), two deterministic cheap "
    "classifiers whose chance-corrected agreement kappa = "
    "(po - pe) / (1 - pe) measures how much signal survives beyond "
    "marginal coincidence.  The 2x2 confusion cells are exact "
    "BIGINTs from one aggregate; po/pe/kappa are fixed closing "
    "expressions over those five integers (DuckDB re-inlines "
    "textually; the doubles are equal because the inputs are).  "
    "Shape: one scan, one 1-row aggregate at any corpus size",
)
def l118(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    r = docs.select(
        F.when(F.col("n_chars") >= 300, 1).otherwise(0).alias("ra"),
        F.when(
            F.size(
                F.filter(
                    F.split(F.col("text"), " "), lambda x: x != F.lit("")
                )
            )
            >= 55,
            1,
        )
        .otherwise(0)
        .alias("rb"),
    )
    c = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when((F.col("ra") == 1) & (F.col("rb") == 1), 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when((F.col("ra") == 1) & (F.col("rb") == 0), 1).otherwise(0))
        .cast("long")
        .alias("b"),
        F.sum(F.when((F.col("ra") == 0) & (F.col("rb") == 1), 1).otherwise(0))
        .cast("long")
        .alias("cc"),
        F.sum(F.when((F.col("ra") == 0) & (F.col("rb") == 0), 1).otherwise(0))
        .cast("long")
        .alias("d"),
    )
    po = (F.col("a") + F.col("d")) / (F.col("n") * F.lit(1.0))
    pe = (
        (F.col("a") + F.col("b")) * F.lit(1.0) * (F.col("a") + F.col("cc"))
        + (F.col("cc") + F.col("d")) * F.lit(1.0) * (F.col("b") + F.col("d"))
    ) / (F.col("n") * F.lit(1.0) * F.col("n"))
    return c.select(
        "n",
        "a",
        "b",
        "cc",
        "d",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round((po - pe) / (F.lit(1.0) - pe), 6).alias("kappa"),
    )


@_l(
    "l119_matryoshka_audit",
    """WITH norms AS (
         SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM
         (SELECT vec_id, unnest(embedding)::DOUBLE AS x FROM embeddings) u
         GROUP BY 1),
       pnorms AS (
         SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM
         (SELECT vec_id, unnest(embedding[1:32])::DOUBLE AS x
          FROM embeddings) u GROUP BY 1),
       upf AS (SELECT a.vec_id AS va, b.vec_id AS vb,
                      unnest(a.embedding)::DOUBLE AS xa,
                      unnest(b.embedding)::DOUBLE AS xb
               FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
               WHERE a.vec_id < 20),
       upp AS (SELECT a.vec_id AS va, b.vec_id AS vb,
                      unnest(a.embedding[1:32])::DOUBLE AS xa,
                      unnest(b.embedding[1:32])::DOUBLE AS xb
               FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
               WHERE a.vec_id < 20),
       sf AS (SELECT va, vb, sum(xa*xb) AS dot FROM upf GROUP BY 1,2),
       sp AS (SELECT va, vb, sum(xa*xb) AS dot FROM upp GROUP BY 1,2),
       topf AS (SELECT va AS vec_id, vb AS nb_full,
                       round(dot/(na.nrm*nb2.nrm), 6) AS sim_full
                FROM sf JOIN norms na ON na.vec_id = va
                        JOIN norms nb2 ON nb2.vec_id = vb
                QUALIFY row_number() OVER (PARTITION BY va
                  ORDER BY dot/(na.nrm*nb2.nrm) DESC, vb) = 1),
       topp AS (SELECT va AS vec_id, vb AS nb_pre,
                       round(dot/(na.nrm*nb2.nrm), 6) AS sim_pre
                FROM sp JOIN pnorms na ON na.vec_id = va
                        JOIN pnorms nb2 ON nb2.vec_id = vb
                QUALIFY row_number() OVER (PARTITION BY va
                  ORDER BY dot/(na.nrm*nb2.nrm) DESC, vb) = 1)
       SELECT f.vec_id, f.nb_full, f.sim_full, p.nb_pre, p.sim_pre,
              CASE WHEN f.nb_full = p.nb_pre THEN 1 ELSE 0 END AS agree
       FROM topf f JOIN topp p ON p.vec_id = f.vec_id
       ORDER BY f.vec_id""",
    note="matryoshka truncation audit — the retrieval-quality check "
    "run before shipping prefix-truncated embeddings (half the "
    "storage/FLOPs if the top-1 neighbor survives): per probe, the "
    "exact top-1 cosine neighbor under the FULL 64 dims vs the "
    "first-32-dim PREFIX, with the agreement flag.  Both sides reuse "
    "the l03 brute-force protocol (zip_with dot, norm join, "
    "row_number tie-broken on raw sim then id); the prefix side is "
    "the same operator over slice(embedding, 1, 32).  Scale: probes "
    "broadcast against the stationary corpus, identical to l03 — "
    "and the audit itself is the cheap gate you run on a sample "
    "BEFORE re-indexing a trillion-vector store",
)
def l119(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = Catalog(spark, sf_dir).table("embeddings")
    probes = em.filter(F.col("vec_id") < 20)
    pre = em.select("vec_id", F.slice("embedding", 1, 32).alias("embedding"))
    pre_probes = pre.filter(F.col("vec_id") < 20)
    topf = cosine_topk_bruteforce(em, probes, k=1).select(
        "vec_id",
        F.col("nb").alias("nb_full"),
        F.round("sim", 6).alias("sim_full"),
    )
    topp = cosine_topk_bruteforce(pre, pre_probes, k=1).select(
        "vec_id",
        F.col("nb").alias("nb_pre"),
        F.round("sim", 6).alias("sim_pre"),
    )
    return (
        topf.join(topp, "vec_id")
        .select(
            "vec_id",
            "nb_full",
            "sim_full",
            "nb_pre",
            "sim_pre",
            F.when(F.col("nb_full") == F.col("nb_pre"), 1)
            .otherwise(0)
            .alias("agree"),
        )
        .orderBy("vec_id")
    )


@_l(
    "l120_yule_k",
    """WITH tok AS (
         SELECT doc_id, lang, t.term FROM documents,
         unnest(string_split(lower(text), ' ')) AS t(term)
         WHERE t.term <> ''),
       tf AS (SELECT doc_id, lang, term, count(*)::BIGINT AS c
              FROM tok GROUP BY 1, 2, 3),
       per_doc AS (
         SELECT doc_id, lang,
                sum(c)::BIGINT AS m1,
                sum(c*c)::BIGINT AS m2,
                count(*)::BIGINT AS types
         FROM tf GROUP BY 1, 2),
       scaled AS (
         SELECT lang,
                CAST(floor(10000.0 * (m2 - m1) / (m1 * 1.0 * m1) * 100.0
                           + 0.5) AS BIGINT) AS k100,
                CAST(floor(types / (m1 * 1.0) * 1000000.0 + 0.5) AS BIGINT)
                  AS ttr1e6
         FROM per_doc WHERE m1 > 0)
       SELECT lang, count(*)::BIGINT AS n_docs,
              round((sum(k100)::DOUBLE / count(*)) / 100.0, 4) AS mean_yule_k,
              round((sum(ttr1e6)::DOUBLE / count(*)) / 1000000.0, 6)
                AS mean_ttr
       FROM scaled GROUP BY 1 ORDER BY 1""",
    note="lexical diversity per language: Yule's K = 1e4*(m2 - m1)/m1^2 "
    "(m1 = tokens, m2 = sum of squared type frequencies — repetition-"
    "heavy text scores high) and type-token ratio, the vocabulary-"
    "richness quality signals beside l23's repetition ratio and l33's "
    "entropy.  Exact protocol: m1/m2/types are exact integers per "
    "doc; each doc's K and TTR are ONE fixed double expression "
    "floored half-up into scaled BIGINTs, so the per-language means "
    "are order-free integer sums with a single closing division.  "
    "Shape: explode -> two stacked groupBys (term, then doc), both "
    "map-side combinable; per-language rollup is tiny",
)
def l120(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    tok = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("term"),
    ).filter(F.col("term") != "")
    tf = tok.groupBy("doc_id", "lang", "term").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    per_doc = tf.groupBy("doc_id", "lang").agg(
        F.sum("c").cast("long").alias("m1"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("m2"),
        F.count(F.lit(1)).cast("long").alias("types"),
    )
    scaled = per_doc.filter(F.col("m1") > 0).select(
        "lang",
        F.floor(
            F.lit(10000.0)
            * (F.col("m2") - F.col("m1"))
            / (F.col("m1") * F.lit(1.0) * F.col("m1"))
            * F.lit(100.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("k100"),
        F.floor(
            F.col("types") / (F.col("m1") * F.lit(1.0)) * F.lit(1000000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("ttr1e6"),
    )
    return (
        scaled.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(
                (F.sum("k100").cast("double") / F.count(F.lit(1)))
                / F.lit(100.0),
                4,
            ).alias("mean_yule_k"),
            F.round(
                (F.sum("ttr1e6").cast("double") / F.count(F.lit(1)))
                / F.lit(1000000.0),
                6,
            ).alias("mean_ttr"),
        )
        .orderBy("lang")
    )


@_l(
    "l121_stupid_backoff",
    """WITH tok AS (
         SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w,
                generate_subscripts(string_split(lower(text), ' '), 1) AS pos
         FROM documents),
       tk AS (SELECT * FROM tok WHERE w <> ''),
       uni AS (SELECT w, count(*)::BIGINT AS cu FROM tk GROUP BY 1),
       tot AS (SELECT sum(cu)::BIGINT AS t FROM uni),
       bi AS (SELECT a.w AS w1, b.w AS w2, count(*)::BIGINT AS cb
              FROM tk a JOIN tk b
                ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
              GROUP BY 1, 2),
       ctx AS (SELECT w AS w1, cu AS c1 FROM uni
               ORDER BY cu DESC, w LIMIT 5),
       cand AS (SELECT DISTINCT w2, cu FROM (
                  (SELECT w AS w2, cu FROM uni ORDER BY cu DESC, w LIMIT 10)
                  UNION ALL
                  (SELECT w AS w2, cu FROM uni ORDER BY cu ASC, w LIMIT 10))),
       scored AS (
         SELECT c.w1, d.w2,
                CASE WHEN b.cb IS NOT NULL
                     THEN b.cb / (c.c1 * 1.0)
                     ELSE 0.4 * (d.cu / (tot.t * 1.0)) END AS score,
                CASE WHEN b.cb IS NOT NULL THEN 0 ELSE 1 END AS backoff
         FROM ctx c CROSS JOIN cand d CROSS JOIN tot
         LEFT JOIN bi b ON b.w1 = c.w1 AND b.w2 = d.w2
         WHERE c.w1 <> d.w2)
       SELECT w1, w2, round(score, 8) AS score, backoff
       FROM scored
       QUALIFY row_number() OVER (PARTITION BY w1, backoff
                                  ORDER BY score DESC, w2) <= 3
       ORDER BY w1, backoff, score DESC, w2""",
    note="stupid backoff next-word scoring (the web-scale LM smoothing "
    "that needs NO discount mass — completing the n-gram LM family "
    "beside l36 bigram perplexity, l70 Kneser-Ney, l88 Good-Turing): "
    "score(w2|w1) = c(w1 w2)/c(w1) when the bigram exists, else "
    "0.4 * c(w2)/T.  Contexts = top-5 unigrams; candidates = top-10 "
    "UNION bottom-10 (count-then-alpha cuts) so rare words force the "
    "backoff branch, and the top-3 is ranked PER BRANCH (w1, "
    "backoff) so both paths surface in the output.  Each score is "
    "ONE division of exact integer counts "
    "(the backoff branch one multiply more) — identical doubles, "
    "ranking tie-broken on candidate.  Shape: the bigram table is a "
    "positional self-join keyed on (doc, pos) — linear in corpus "
    "size; contexts x candidates is a 100-row broadcast against the "
    "bigram table, the same probe-bounded shape as l42",
)
def l121(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    tk = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), " ")).alias("pos0", "w"),
    ).filter(F.col("w") != "")
    tk = tk.select("doc_id", (F.col("pos0") + 1).alias("pos"), "w")
    uni = tk.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("cu"))
    tot = uni.agg(F.sum("cu").cast("long").alias("t"))
    b = tk.select("doc_id", "pos", F.col("w").alias("w2b"))
    bi = (
        tk.alias("a")
        .join(
            b.alias("b"),
            (F.col("b.doc_id") == F.col("a.doc_id"))
            & (F.col("b.pos") == F.col("a.pos") + 1),
        )
        .groupBy(F.col("a.w").alias("w1"), F.col("b.w2b").alias("w2"))
        .agg(F.count(F.lit(1)).cast("long").alias("cb"))
    )
    ctx = (
        uni.orderBy(F.col("cu").desc(), "w")
        .limit(5)
        .select(F.col("w").alias("w1"), F.col("cu").alias("c1"))
    )
    top10 = (
        uni.orderBy(F.col("cu").desc(), "w")
        .limit(10)
        .select(F.col("w").alias("w2"), "cu")
    )
    bot10 = (
        uni.orderBy(F.col("cu").asc(), "w")
        .limit(10)
        .select(F.col("w").alias("w2"), "cu")
    )
    cand = top10.unionByName(bot10).distinct()
    scored = (
        ctx.crossJoin(F.broadcast(cand))
        .crossJoin(F.broadcast(tot))
        .join(bi, ["w1", "w2"], "left")
        .filter(F.col("w1") != F.col("w2"))
        .select(
            "w1",
            "w2",
            F.when(
                F.col("cb").isNotNull(),
                F.col("cb") / (F.col("c1") * F.lit(1.0)),
            )
            .otherwise(
                F.lit(0.4) * (F.col("cu") / (F.col("t") * F.lit(1.0)))
            )
            .alias("score"),
            F.when(F.col("cb").isNotNull(), 0).otherwise(1).alias("backoff"),
        )
    )
    w = Window.partitionBy("w1", "backoff").orderBy(
        F.col("score").desc(), "w2"
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 3)
        .drop("__rn")
        .select("w1", "w2", F.round("score", 8).alias("score"), "backoff")
        .orderBy("w1", "backoff", F.col("score").desc(), "w2")
    )


@_l(
    "l122_embedding_decontam",
    """WITH split AS (
         SELECT vec_id, embedding,
                CASE WHEN strpos('0123456789abcdef',
                       substring(md5(vec_id::VARCHAR), 1, 1)) - 1 < 13
                     THEN 'train' ELSE 'eval' END AS split
         FROM embeddings),
       tr AS (SELECT vec_id, embedding FROM split WHERE split = 'train'),
       ev AS (SELECT vec_id, embedding FROM split
              WHERE split = 'eval' AND vec_id < 100),
       probes AS (
         SELECT e.vec_id,
                CASE WHEN e.vec_id % 5 = 0 AND t.embedding IS NOT NULL
                     THEN t.embedding ELSE e.embedding END AS embedding,
                CASE WHEN e.vec_id % 5 = 0 AND t.embedding IS NOT NULL
                     THEN 1 ELSE 0 END AS planted
         FROM ev e LEFT JOIN tr t ON t.vec_id = e.vec_id - 1),
       tnorm AS (
         SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM
         (SELECT vec_id, unnest(embedding)::DOUBLE AS x FROM tr) u
         GROUP BY 1),
       pnorm AS (
         SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM
         (SELECT vec_id, unnest(embedding)::DOUBLE AS x FROM probes) u
         GROUP BY 1),
       up AS (SELECT p.vec_id AS ev_id, t.vec_id AS tr_id,
                     unnest(p.embedding)::DOUBLE AS xa,
                     unnest(t.embedding)::DOUBLE AS xb
              FROM probes p JOIN tr t ON t.vec_id <> p.vec_id),
       dots AS (SELECT ev_id, tr_id, sum(xa*xb) AS dot FROM up GROUP BY 1,2),
       top1 AS (SELECT ev_id, tr_id AS nb_train,
                       dot/(pn.nrm*tn.nrm) AS sim_raw
                FROM dots JOIN pnorm pn ON pn.vec_id = ev_id
                          JOIN tnorm tn ON tn.vec_id = tr_id
                QUALIFY row_number() OVER (PARTITION BY ev_id
                  ORDER BY dot/(pn.nrm*tn.nrm) DESC, tr_id) = 1)
       SELECT t.ev_id AS eval_id, t.nb_train,
              round(t.sim_raw, 6) AS sim, p.planted,
              CASE WHEN t.sim_raw >= 0.999 THEN 1 ELSE 0 END
                AS contaminated
       FROM top1 t JOIN probes p ON p.vec_id = t.ev_id
       ORDER BY eval_id""",
    note="embedding-space decontamination audit — the semantic "
    "companion to l26/l80's n-gram text decontamination (paraphrased "
    "leakage has no shared n-grams but cosine ~1): md5-split "
    "train/eval (the l18 convention), per-eval-probe exact top-1 "
    "train neighbor (the l03 brute-force protocol), contaminated = "
    "sim >= 0.999.  Duplicates are PLANTED (eval ids divisible by 5 "
    "take their train predecessor's embedding, flagged as ground "
    "truth) so the oracle pair proves the detector flags EXACTLY the "
    "planted rows and no others — same harness discipline as "
    "q159/g112.  Scale: probes broadcast against the stationary "
    "train corpus for the declared exact form; the l12/l17 LSH/IVF "
    "routes are the 100 TB candidate generators with this as their "
    "verification sample",
)
def l122(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = Catalog(spark, sf_dir).table("embeddings")
    bucket = F.conv(
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 1), 16, 10
    ).cast("int")
    split = em.select(
        "vec_id",
        "embedding",
        F.when(bucket < 13, "train").otherwise("eval").alias("split"),
    )
    tr = split.filter(F.col("split") == "train").select("vec_id", "embedding")
    ev = split.filter(
        (F.col("split") == "eval") & (F.col("vec_id") < 100)
    ).select("vec_id", "embedding")
    donor = tr.select(
        (F.col("vec_id") + 1).alias("vec_id"),
        F.col("embedding").alias("__demb"),
    )
    probes = ev.join(donor, "vec_id", "left").select(
        "vec_id",
        F.when(
            (F.col("vec_id") % 5 == 0) & F.col("__demb").isNotNull(),
            F.col("__demb"),
        )
        .otherwise(F.col("embedding"))
        .alias("embedding"),
        F.when(
            (F.col("vec_id") % 5 == 0) & F.col("__demb").isNotNull(), 1
        )
        .otherwise(0)
        .alias("planted"),
    )
    top1 = cosine_topk_bruteforce(
        tr, probes.select("vec_id", "embedding"), k=1
    )
    return (
        top1.join(probes.select("vec_id", "planted"), "vec_id")
        .select(
            F.col("vec_id").alias("eval_id"),
            F.col("nb").alias("nb_train"),
            F.round("sim", 6).alias("sim"),
            "planted",
            F.when(F.col("sim") >= 0.999, 1).otherwise(0).alias(
                "contaminated"
            ),
        )
        .orderBy("eval_id")
    )


@_l(
    "l124_krippendorff_alpha",
    """WITH r AS (SELECT doc_id,
                (CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END
                 + CASE WHEN len(list_filter(string_split(text, ' '),
                                             x -> x <> '')) >= 55
                        THEN 1 ELSE 0 END
                 + CASE WHEN lower(text) LIKE '%the%' THEN 1 ELSE 0 END)
                  AS k
           FROM documents),
       c AS (SELECT count(*)::BIGINT AS n,
                    sum(k)::BIGINT AS t_ones,
                    sum(2 * k * (3 - k))::BIGINT AS o_dis
             FROM r)
       SELECT n, t_ones, o_dis,
              round(o_dis / (n * 6.0), 6) AS d_o,
              round(2.0 * t_ones * (3 * n - t_ones)
                    / (3.0 * n * (3 * n - 1)), 6) AS d_e,
              round(1.0 - (o_dis / (n * 6.0))
                    / (2.0 * t_ones * (3 * n - t_ones)
                       / (3.0 * n * (3 * n - 1))), 6) AS alpha
       FROM c""",
    note="Krippendorff's alpha (nominal, 3 raters, complete data) — "
    "the agreement coefficient that generalizes l118's two-rater "
    "kappa to rater ensembles, the LLM-as-judge ensemble QC "
    "statistic: raters = char-band / token-band / contains-'the', "
    "each unit's disagreeing ordered pairs = 2k(3-k) for k positive "
    "votes, D_o = sum/(n*m*(m-1)); D_e from the pooled value "
    "coincidences 2*T*(N-T)/(N*(N-1)) with N = 3n; alpha = "
    "1 - D_o/D_e.  Every carrier is an exact BIGINT from ONE "
    "aggregate; the three ratios are closing doubles.  Shape: one "
    "scan, one row — any corpus size",
)
def l124(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    k = (
        F.when(F.col("n_chars") >= 300, 1).otherwise(0)
        + F.when(
            F.size(
                F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
            )
            >= 55,
            1,
        ).otherwise(0)
        + F.when(F.lower(F.col("text")).like("%the%"), 1).otherwise(0)
    )
    c = docs.select(k.alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("k").cast("long").alias("t_ones"),
        F.sum(2 * F.col("k") * (3 - F.col("k"))).cast("long").alias("o_dis"),
    )
    d_o = F.col("o_dis") / (F.col("n") * F.lit(6.0))
    d_e = (
        F.lit(2.0)
        * F.col("t_ones")
        * (3 * F.col("n") - F.col("t_ones"))
        / (F.lit(3.0) * F.col("n") * (3 * F.col("n") - 1))
    )
    return c.select(
        "n",
        "t_ones",
        "o_dis",
        F.round(d_o, 6).alias("d_o"),
        F.round(d_e, 6).alias("d_e"),
        F.round(F.lit(1.0) - d_o / d_e, 6).alias("alpha"),
    )


_ROUGE_LA, _ROUGE_LB = 12, 24


def _rouge_oracle(la: int = _ROUGE_LA, lb: int = _ROUGE_LB) -> str:
    """Unrolled LCS row-recurrence as chained CTEs (the t85/t88 DP
    idiom): row i of the lattice collapses to ONE lag + running-max
    window because LCS rows are nondecreasing in j —
    N[j] = max(P[j], max_{t<=j}(P[t-1] + eq(i,t)))."""
    head = f"""WITH pairs AS (SELECT i AS da, i + 1 AS db
               FROM range(0, 20, 2) t(i)),
       tokraw AS (
         SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term,
                generate_subscripts(string_split(lower(text), ' '), 1)
                  AS pos
         FROM documents WHERE doc_id < 20),
       tok AS (
         SELECT doc_id, term,
                row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS p
         FROM tokraw WHERE term <> ''),
       la AS (SELECT p.da AS pair, least(count(*), {la})::BIGINT AS n
              FROM pairs p JOIN tok t ON t.doc_id = p.da GROUP BY 1),
       lb AS (SELECT p.da AS pair, least(count(*), {lb})::BIGINT AS n
              FROM pairs p JOIN tok t ON t.doc_id = p.db GROUP BY 1),
       ta AS (SELECT p.da AS pair, i.i AS i,
                     coalesce(t.term, chr(1) || 'a' || i.i) AS term
              FROM pairs p CROSS JOIN range(1, {la} + 1) i(i)
              LEFT JOIN tok t ON t.doc_id = p.da AND t.p = i.i),
       tb AS (SELECT p.da AS pair, j.j AS j,
                     coalesce(t.term, chr(1) || 'b' || j.j) AS term
              FROM pairs p CROSS JOIN range(1, {lb} + 1) j(j)
              LEFT JOIN tok t ON t.doc_id = p.db AND t.p = j.j),
       eqt AS (SELECT a.pair, a.i, b.j,
                      CASE WHEN a.term = b.term THEN 1 ELSE 0 END AS eq
               FROM ta a JOIN tb b ON b.pair = a.pair),
       c1 AS (SELECT pair, j,
                     max(eq) OVER (PARTITION BY pair ORDER BY j) AS c
              FROM eqt WHERE i = 1)"""
    ctes = [head]
    for i in range(2, la + 1):
        ctes.append(f"""
       c{i} AS (
         SELECT pair, j,
                greatest(c, max(term) OVER (PARTITION BY pair
                                            ORDER BY j)) AS c
         FROM (
           SELECT e.pair, e.j, p.c,
                  coalesce(lag(p.c) OVER (PARTITION BY e.pair
                                          ORDER BY e.j), 0) + e.eq AS term
           FROM eqt e JOIN c{i-1} p ON p.pair = e.pair AND p.j = e.j
           WHERE e.i = {i}) s)""")
    tail = f"""
       SELECT p.da, p.db, la.n AS la, lb.n AS lb, c.c::BIGINT AS lcs,
              round(2.0 * c.c / (la.n + lb.n), 6) AS rouge_f
       FROM pairs p
       JOIN la ON la.pair = p.da JOIN lb ON lb.pair = p.da
       JOIN c{la} c ON c.pair = p.da AND c.j = {lb}
       ORDER BY p.da"""
    return ",".join(ctes) + tail


@_l(
    "l123_rouge_l",
    _rouge_oracle(),
    note="ROUGE-L between candidate/reference document pairs — the "
    "summarization-eval metric beside l109's BLEU (n-gram precision) "
    "and l115's ranking metrics: F = 2*LCS/(la+lb) over the longest "
    "common token SUBSEQUENCE.  The LCS lattice is sequential by "
    "nature, but each ROW collapses to closed form "
    "N[j] = max(P[j], runmax(P[t-1] + eq(i,t))) because LCS rows are "
    "nondecreasing — so 12 candidate tokens unroll to 12 chained "
    "lag+running-max windows over all pairs AT ONCE (the t85 DTW "
    "row-collapse idiom; no recursion, no per-cell driver loop), "
    "exact integer carriers throughout.  Docs pad to the fixed "
    "12x24 lattice with per-side sentinel tokens that never match, "
    "leaving LCS unchanged while keeping every pair on one spine.  "
    "Brute-force python-DP parity is pinned in tests.  Scale: the "
    "window chain partitions by pair — a million pairs run the same "
    "12 stages; lattice width is the token CAP, not doc length",
)
def l123(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents").filter(
        F.col("doc_id") < 20
    )
    tokraw = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), " ")).alias(
            "pos", "term"
        ),
    ).filter(F.col("term") != "")
    tok = tokraw.select(
        "doc_id",
        "term",
        F.row_number()
        .over(Window.partitionBy("doc_id").orderBy("pos"))
        .alias("p"),
    )
    pairs = spark.range(0, 20, 2).select(
        F.col("id").alias("da"), (F.col("id") + 1).alias("db")
    )
    la = (
        pairs.join(tok, pairs.da == tok.doc_id)
        .groupBy(F.col("da").alias("pair"))
        .agg(F.least(F.count(F.lit(1)), F.lit(_ROUGE_LA)).cast("long").alias("n"))
    )
    lb = (
        pairs.join(tok, pairs.db == tok.doc_id)
        .groupBy(F.col("da").alias("pair"))
        .agg(F.least(F.count(F.lit(1)), F.lit(_ROUGE_LB)).cast("long").alias("n"))
    )
    ii = spark.range(1, _ROUGE_LA + 1).select(F.col("id").alias("i"))
    jj = spark.range(1, _ROUGE_LB + 1).select(F.col("id").alias("j"))
    ta = (
        pairs.crossJoin(F.broadcast(ii))
        .join(
            tok,
            (pairs.da == tok.doc_id) & (F.col("i") == F.col("p")),
            "left",
        )
        .select(
            F.col("da").alias("pair"),
            "i",
            F.coalesce(
                F.col("term"),
                F.concat(F.lit("\x01a"), F.col("i").cast("string")),
            ).alias("term"),
        )
    )
    tb = (
        pairs.crossJoin(F.broadcast(jj))
        .join(
            tok,
            (pairs.db == tok.doc_id) & (F.col("j") == F.col("p")),
            "left",
        )
        .select(
            F.col("da").alias("pair"),
            "j",
            F.coalesce(
                F.col("term"),
                F.concat(F.lit("\x01b"), F.col("j").cast("string")),
            ).alias("term"),
        )
    )
    eqt = (
        ta.withColumnRenamed("term", "ta")
        .join(tb.withColumnRenamed("term", "tb"), "pair")
        .select(
            "pair",
            "i",
            "j",
            F.when(F.col("ta") == F.col("tb"), 1).otherwise(0).alias("eq"),
        )
    )
    from graph_spark.operators.text import lcs_window_chain

    c = lcs_window_chain(eqt, _ROUGE_LA)
    out = (
        pairs.join(la.withColumnRenamed("n", "la"), pairs.da == la.pair)
        .drop("pair")
        .join(lb.withColumnRenamed("n", "lb"), pairs.da == lb.pair)
        .drop("pair")
        .join(
            c.filter(F.col("j") == _ROUGE_LB).select(
                F.col("pair"), F.col("c").cast("long").alias("lcs")
            ),
            pairs.da == F.col("pair"),
        )
        .drop("pair")
    )
    return out.select(
        "da",
        "db",
        "la",
        "lb",
        "lcs",
        F.round(
            F.lit(2.0) * F.col("lcs") / (F.col("la") + F.col("lb")), 6
        ).alias("rouge_f"),
    ).orderBy("da")


@_l(
    "l125_chao1_vocab",
    """WITH tok AS (
         SELECT lang, unnest(string_split(lower(text), ' ')) AS term
         FROM documents),
       tf AS (SELECT lang, term, count(*)::BIGINT AS c FROM tok
              WHERE term <> '' GROUP BY 1, 2),
       s AS (SELECT lang, count(*)::BIGINT AS d,
                    sum(c)::BIGINT AS n,
                    sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS f1,
                    sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)::BIGINT AS f2
             FROM tf GROUP BY 1)
       SELECT lang, d, n, f1, f2,
              round(d + CASE WHEN f2 > 0
                             THEN f1 * 1.0 * f1 / (2.0 * f2)
                             ELSE f1 * 1.0 * (f1 - 1) / 2.0 END, 2)
                AS chao1,
              round(1.0 - f1 * 1.0 / n, 6) AS coverage
       FROM s ORDER BY lang""",
    note="Chao1 vocabulary-richness estimator per language — how many "
    "types the corpus has NOT yet seen (the collector's-curve "
    "question beside l75 Heaps' law, which fits growth, and l88 "
    "Good-Turing, which reallocates probability): chao1 = D + "
    "f1^2/(2 f2) from the singleton/doubleton counts, with the "
    "bias-corrected f1(f1-1)/2 fallback when no doubletons exist, "
    "plus Turing sample coverage 1 - f1/N.  All carriers are exact "
    "BIGINTs from two stacked map-side-combinable groupBys; the "
    "estimator is one closing expression.  The ops question it "
    "answers at 100 TB: is more crawling still buying vocabulary, "
    "or has the corpus saturated?",
)
def l125(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    tok = docs.select(
        "lang", F.explode(F.split(F.lower(F.col("text")), " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = tok.groupBy("lang", "term").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    s = tf.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("d"),
        F.sum("c").cast("long").alias("n"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
        .cast("long")
        .alias("f2"),
    )
    chao1 = F.col("d") + F.when(
        F.col("f2") > 0,
        F.col("f1") * F.lit(1.0) * F.col("f1") / (F.lit(2.0) * F.col("f2")),
    ).otherwise(
        F.col("f1") * F.lit(1.0) * (F.col("f1") - 1) / F.lit(2.0)
    )
    return s.select(
        "lang",
        "d",
        "n",
        "f1",
        "f2",
        F.round(chao1, 2).alias("chao1"),
        F.round(F.lit(1.0) - F.col("f1") * F.lit(1.0) / F.col("n"), 6).alias(
            "coverage"
        ),
    ).orderBy("lang")


@_l(
    "l126_unimax_allocation",
    """WITH sup AS (SELECT lang || '/' || source AS corpus,
                    sum(len(list_filter(string_split(text,' '),
                                        x -> x <> '')))::BIGINT AS s
             FROM documents GROUP BY 1),
       tot AS (SELECT sum(s)::BIGINT AS t, count(*)::BIGINT AS nc
               FROM sup),
       caps AS (SELECT corpus, s, 3 * s AS cap,
                       row_number() OVER (ORDER BY 3 * s, corpus) AS k
                FROM sup),
       pre AS (SELECT c.*, t.t, t.nc,
                      COALESCE(sum(c.cap) OVER (ORDER BY c.k
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0)::BIGINT AS p_before
               FROM caps c CROSS JOIN tot t),
       flag AS (SELECT *,
                       CASE WHEN cap * (nc - k + 1) <= (2 * t - p_before)
                            THEN k ELSE 0 END AS kflag
                FROM pre),
       kstar AS (SELECT max(kflag)::BIGINT AS ks FROM flag),
       pk AS (SELECT COALESCE(sum(cap), 0)::BIGINT AS pks
              FROM flag, kstar WHERE k <= ks)
       SELECT f.corpus, f.s, f.cap, f.k,
              CASE WHEN f.k <= kstar.ks THEN f.cap
                   ELSE CAST(floor((2.0 * f.t - pk.pks)
                                   / (f.nc - kstar.ks)) AS BIGINT)
              END AS alloc,
              round(CASE WHEN f.k <= kstar.ks THEN f.cap
                         ELSE CAST(floor((2.0 * f.t - pk.pks)
                                         / (f.nc - kstar.ks)) AS BIGINT)
                    END / (f.s * 1.0), 4) AS epochs
       FROM flag f, kstar, pk
       ORDER BY f.k""",
    note="UniMax-style training-budget allocation (the published "
    "water-filling that replaced temperature mixing for mT5-class "
    "multilingual training — l79's temperature is the heuristic, "
    "THIS is the constrained-optimal form): budget = 2x total "
    "tokens, per-corpus cap = 3 epochs; corpora ascending by cap "
    "take their cap while cap <= remaining/(remaining corpora), the "
    "rest split the leftover equally — on this fixture 49 small "
    "corpora cap at 3.0 epochs and the large English shards fall to "
    "0.79, which is exactly the oversampling-protection the method "
    "exists for.  Exact protocol: supplies/caps/prefix sums are "
    "BIGINTs, the capped-prefix boundary k* is an integer window "
    "argmax, the equal share ONE floored division.  Shape: one "
    "token-count groupBy, then windows over the |corpora|-row frame "
    "— the allocation itself is collapse-then-compute",
)
def l126(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    sup = (
        docs.select(
            F.concat_ws("/", "lang", "source").alias("corpus"),
            F.size(
                F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
            ).alias("nt"),
        )
        .groupBy("corpus")
        .agg(F.sum("nt").cast("long").alias("s"))
    )
    tot = sup.agg(
        F.sum("s").cast("long").alias("t"),
        F.count(F.lit(1)).cast("long").alias("nc"),
    )
    caps = sup.select(
        "corpus",
        "s",
        (3 * F.col("s")).alias("cap"),
        F.row_number()
        .over(Window.orderBy(3 * F.col("s"), "corpus"))
        .alias("k"),
    )
    wk = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    pre = caps.crossJoin(F.broadcast(tot)).select(
        "corpus",
        "s",
        "cap",
        "k",
        "t",
        "nc",
        F.coalesce(F.sum("cap").over(wk), F.lit(0))
        .cast("long")
        .alias("p_before"),
    )
    flag = pre.select(
        "*",
        F.when(
            F.col("cap") * (F.col("nc") - F.col("k") + 1)
            <= (2 * F.col("t") - F.col("p_before")),
            F.col("k"),
        )
        .otherwise(0)
        .alias("kflag"),
    )
    kstar = flag.agg(F.max("kflag").cast("long").alias("ks"))
    pk = (
        flag.crossJoin(F.broadcast(kstar))
        .filter(F.col("k") <= F.col("ks"))
        .agg(F.coalesce(F.sum("cap"), F.lit(0)).cast("long").alias("pks"))
    )
    j = flag.crossJoin(F.broadcast(kstar)).crossJoin(F.broadcast(pk))
    share = F.floor(
        (F.lit(2.0) * F.col("t") - F.col("pks")) / (F.col("nc") - F.col("ks"))
    ).cast("long")
    alloc = F.when(F.col("k") <= F.col("ks"), F.col("cap")).otherwise(share)
    return (
        j.select(
            "corpus",
            "s",
            "cap",
            "k",
            alloc.alias("alloc"),
            F.round(alloc / (F.col("s") * F.lit(1.0)), 4).alias("epochs"),
        )
        .orderBy("k")
    )


@_l(
    "m13_byte_entropy",
    """WITH media AS (SELECT doc_id, source, encode(text) AS payload,
                           octet_length(encode(text))::BIGINT AS n_bytes
                    FROM documents),
       bytes AS (
         SELECT m.source,
                substr(hex(m.payload), (2*i.i + 1)::INT, 2) AS byte_hex
         FROM media m CROSS JOIN range(4096) i(i)
         WHERE i.i < m.n_bytes),
       hist AS (SELECT source, byte_hex, count(*)::BIGINT AS c
                FROM bytes GROUP BY 1, 2),
       tot AS (SELECT source, sum(c)::BIGINT AS t,
                      count(*)::BIGINT AS n_distinct
               FROM hist GROUP BY 1)
       SELECT h.source, max(t.t) AS n_bytes, max(t.n_distinct) AS n_distinct,
              round(-sum((h.c / (t.t * 1.0)) * log2(h.c / (t.t * 1.0))), 4)
                AS entropy_bits,
              round(-sum((h.c / (t.t * 1.0)) * log2(h.c / (t.t * 1.0)))
                    / 8.0, 4) AS density
       FROM hist h JOIN tot t ON t.source = h.source
       GROUP BY 1 ORDER BY 1""",
    note="byte-level Shannon entropy of the opaque BINARY payload per "
    "source — the cheap is-it-already-compressed/encrypted detector "
    "an ingest pipeline runs before wasting codec CPU (entropy near "
    "8 bits/byte = incompressible; text sits near 4.2): bytes via "
    "hex-pair slicing (the m12 protocol — DuckDB 1.0 has no BLOB "
    "substring), histogram per source, entropy over <= 256 buckets "
    "with the l33 sum-of-p-log2-p protocol (4dp edge rounding).  "
    "The range(4096) explode bound is a fixture-size cap, stated "
    "honestly: payloads here are < 4 KB; at 100 TB you histogram "
    "bytes inside mapInPandas (one pass, no explode) and feed the "
    "same 256-bucket rollup.  Sibling: m10 measures ACTUAL zlib "
    "ratio (rows-only); this is its exact, oracle-checkable proxy",
)
def m13(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    media = to_media_table(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    # the 4096 cap mirrors the oracle's range(4096) bound — payloads
    # here are < 4 KB, but a regenerated fixture with longer docs must
    # not silently diverge (the l112 short-doc lesson, other direction)
    bytes_ = media.select(
        "source",
        F.explode(
            F.expr(
                "CASE WHEN n_bytes >= 1 THEN "
                "transform(sequence(1, least(int(n_bytes), 4096)),"
                " i -> substring(hex(payload), 2*i - 1, 2)) "
                "ELSE array() END"
            )
        ).alias("byte_hex"),
    )
    hist = bytes_.groupBy("source", "byte_hex").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = hist.groupBy("source").agg(
        F.sum("c").cast("long").alias("t"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
    )
    p = F.col("c") / (F.col("t") * F.lit(1.0))
    return (
        hist.join(tot, "source")
        .groupBy("source")
        .agg(
            F.max("t").alias("n_bytes"),
            F.max("n_distinct").alias("n_distinct"),
            F.round(-F.sum(p * F.log2(p)), 4).alias("entropy_bits"),
            F.round(-F.sum(p * F.log2(p)) / F.lit(8.0), 4).alias("density"),
        )
        .orderBy("source")
    )


@_l(
    "m14_byte_run_lengths",
    """WITH media AS (SELECT doc_id, source, encode(text) AS payload,
                           octet_length(encode(text))::BIGINT AS n_bytes
                    FROM documents),
       b AS (SELECT doc_id, source,
                    substr(hex(payload), (2*i.i + 1)::INT, 2) AS byte_hex,
                    i.i AS pos
             FROM media CROSS JOIN range(4096) i(i)
             WHERE i.i < n_bytes),
       runs AS (SELECT doc_id, source, byte_hex,
                       pos - row_number() OVER (PARTITION BY doc_id,
                                                byte_hex ORDER BY pos)
                         AS grp
                FROM b),
       rl AS (SELECT doc_id, source, byte_hex, count(*)::BIGINT AS len
              FROM runs GROUP BY doc_id, source, byte_hex, grp)
       SELECT source,
              max(len)::BIGINT AS max_run,
              sum(CASE WHEN len >= 4 THEN 1 ELSE 0 END)::BIGINT
                AS n_runs_ge4,
              count(DISTINCT CASE WHEN len >= 4 THEN doc_id END)::BIGINT
                AS n_docs_ge4
       FROM rl GROUP BY 1 ORDER BY 1""",
    note="longest repeated-byte run per source over the opaque BINARY "
    "payload — the padding/corruption/stuck-sensor detector an "
    "ingest runs beside m12's magic sniffing and m13's entropy "
    "(a blob that is 90% 0x00 runs is padding, not data): hex-pair "
    "bytes (the m12 protocol) -> per-(doc, byte) gaps-and-islands "
    "run groups (pos - row_number, the t14 idiom on byte streams) "
    "-> run-length rollup.  All integers end to end.  The 4096 cap "
    "mirrors m13's fixture bound.  Scale: runs partition by "
    "(doc, byte) — embarrassingly parallel; at 100 TB the same "
    "rollup rides mapInPandas over raw bytes, one pass",
)
def m14(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    media = to_media_table(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    b = media.select(
        "doc_id",
        "source",
        F.posexplode(
            F.expr(
                "CASE WHEN n_bytes >= 1 THEN "
                "transform(sequence(1, least(int(n_bytes), 4096)),"
                " i -> substring(hex(payload), 2*i - 1, 2)) "
                "ELSE array() END"
            )
        ).alias("pos0", "byte_hex"),
    ).select("doc_id", "source", "byte_hex", F.col("pos0").alias("pos"))
    runs = b.select(
        "doc_id",
        "source",
        "byte_hex",
        (
            F.col("pos")
            - F.row_number().over(
                Window.partitionBy("doc_id", "byte_hex").orderBy("pos")
            )
        ).alias("grp"),
    )
    rl = runs.groupBy("doc_id", "source", "byte_hex", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("len")
    )
    return (
        rl.groupBy("source")
        .agg(
            F.max("len").cast("long").alias("max_run"),
            F.sum(F.when(F.col("len") >= 4, 1).otherwise(0))
            .cast("long")
            .alias("n_runs_ge4"),
            F.countDistinct(
                F.when(F.col("len") >= 4, F.col("doc_id"))
            )
            .cast("long")
            .alias("n_docs_ge4"),
        )
        .orderBy("source")
    )


QUERIES = list(_L)
