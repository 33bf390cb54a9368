"""Text-analysis operators for training-data pipelines (SURVEY.md §2.F).

Language-ID heuristic, quality scoring, token counting, tf-idf,
document fingerprinting.  Everything is built from JVM-side column
functions (split / regexp / aggregate) — no Python UDF in any hot path —
so each operator is one or two shuffles regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import word_shingles

# Tiny English stopword list used by the language-ID heuristic.  Kept
# deliberately small + frozen: it is part of declared query semantics.
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_tokens (non-empty whitespace tokens) and est_bpe_tokens
    (chars/4 ceiling — the standard BPE budget heuristic)."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    return df.withColumn("n_tokens", F.size(toks)).withColumn(
        "est_bpe_tokens", F.ceil(F.length(F.col(text_col)) / 4).cast("long")
    )


def stopword_ratio(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fraction of tokens that are English stopwords (language-ID
    heuristic basis)."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    stop = F.filter(toks, lambda x: x.isin(*EN_STOPWORDS))
    return df.withColumn(
        "stopword_ratio",
        F.when(F.size(toks) > 0, F.size(stop) / F.size(toks)).otherwise(F.lit(0.0)),
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality features: token count, mean token length,
    non-alphanumeric character ratio, and a composite score.  The score
    formula is frozen (declared semantics), not a tuned model."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    n_toks = F.size(toks)
    tok_chars = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    non_alnum = F.length(F.regexp_replace(F.col(text_col), "[a-zA-Z0-9 ]", ""))
    out = (
        df.withColumn("n_tokens", n_toks)
        .withColumn(
            "avg_token_len",
            F.when(n_toks > 0, tok_chars.cast("double") / n_toks).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "non_alnum_ratio",
            F.when(
                F.length(F.col(text_col)) > 0,
                non_alnum.cast("double") / F.length(F.col(text_col)),
            ).otherwise(F.lit(0.0)),
        )
    )
    score = (
        F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0)) * 0.5
        + F.least(F.col("avg_token_len") / F.lit(8.0), F.lit(1.0)) * 0.3
        + (1 - F.least(F.col("non_alnum_ratio") * 5, F.lit(1.0))) * 0.2
    )
    return out.withColumn("quality_score", score)


def tf_idf_top_terms(
    df: DataFrame,
    group_col: str = "lang",
    top_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per group: top-n terms by tf * ln(N / df) where N = corpus docs
    with >= 1 token, df = docs containing the term, tf = term count
    within the group.  Ties broken by term.  Returns (group, term, w, rn).
    """
    tok = df.select(id_col, group_col, F.explode(F.split(F.col(text_col), " ")).alias("term")).filter(
        F.col("term") != ""
    )
    tf = tok.groupBy(group_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # corpus doc count as a broadcast 1-row scalar (the CALL-idiom
    # append), NOT a driver-side count() action: the old form ran an
    # extra eager job per call and evaluated the tokenize pipeline a
    # third time
    nd = tok.agg(F.countDistinct(id_col).cast("double").alias("__nd"))
    idf = (
        tok.groupBy("term")
        .agg(F.countDistinct(id_col).alias("__df"))
        .crossJoin(F.broadcast(nd))
        .select("term", F.log(F.col("__nd") / F.col("__df")).alias("idf"))
    )
    w = Window.partitionBy(group_col).orderBy(F.col("w").desc(), F.col("term").asc())
    return (
        tf.join(F.broadcast(idf), "term")
        .withColumn("w", F.col("tf") * F.col("idf"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_n)
    )


def doc_fingerprint(df: DataFrame, n: int = 2, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Winnowing-style fingerprint: min md5 over word n-gram shingles
    (one representative hash per doc) + distinct shingle count.
    Returns (id, fingerprint, n_shingles)."""
    sh = word_shingles(df, n, text_col, id_col)
    return sh.groupBy(id_col).agg(
        F.min(F.md5(F.col("shingle"))).alias("fingerprint"),
        F.count(F.lit(1)).alias("n_shingles"),
    )


def pack_sequences(
    df: DataFrame,
    budget: int = 512,
    text_col: str = "text",
    part_col: str = "lang",
    order_col: str = "doc_id",
) -> DataFrame:
    """Token-budget sequence packing: assign each document to a pack of
    ~`budget` tokens by running token count within `part_col`, ordered
    deterministically by `order_col` (the context-window packing step of
    a pretraining data mix).  Adds (n_tok, pack_id).

    One window shuffle on the partition column.  At 100 TB sub-partition
    by (part, time bucket) so no single cumsum partition is unbounded —
    pack ids then only need to be unique within a bucket.
    """
    toks = df.withColumn(
        "n_tok",
        F.size(F.expr(f"filter(split({text_col}, ' '), x -> x != '')")),
    )
    w = Window.partitionBy(part_col).orderBy(order_col)
    return toks.withColumn(
        "pack_id", F.floor((F.sum("n_tok").over(w) - 1) / budget).cast("long")
    )


def unigram_surprisal(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Mean corpus-unigram surprisal (-ln p(term)) per document — the
    cheap perplexity proxy for quality filtering: low = repetitive
    boilerplate, high = rare-token noise.

    One explode + one term-frequency aggregate + one equi-join back.
    The corpus grand total rides as a broadcast 1-row scalar (the same
    CALL-idiom append the r9 tf-idf fix used), NOT a driver-side
    count() action: the old form ran an extra eager job re-evaluating
    the tokenize pipeline on every call (r9 verdict item 4).  At scale
    the tf table is the reusable artifact: compute it once over the
    corpus, broadcast-join it per shard.
    """
    tok = df.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = tok.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    tot = tok.agg(F.count(F.lit(1)).cast("double").alias("__tot"))
    return (
        tok.join(tf, "term")
        .crossJoin(F.broadcast(tot))
        .groupBy(id_col)
        .agg(F.avg(-F.log(F.col("c") * 1.0 / F.col("__tot"))).alias("surprisal"))
    )


def bm25_scores(
    df: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 term-salience scores per (doc, term): tf-idf with saturating
    term frequency and document-length normalization — the retrieval
    ranking function.  Returns (doc_id, term, tf, bm25) with bm25
    unrounded.

    One tokenize pass feeds tf and doc-length; the corpus scalars
    (N, avgdl) broadcast; the df join is a shuffle join keyed on term
    (the vocabulary is NOT broadcastable at corpus scale — AQE may
    still elect broadcast when it measures small).
    """
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    st = dl.agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl"))
    idf = F.log(1 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    score = idf * F.col("tf") * (k1 + 1) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(dl, "doc_id")
        .join(dfreq, "term")
        .crossJoin(F.broadcast(st))
        .select("doc_id", "term", "tf", score.alias("bm25"))
    )


def dsir_scores(
    df: DataFrame,
    target_pred,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, Data Selection via
    Importance Resampling): fit hashed bag-of-words models of a TARGET
    slice (``target_pred`` over the input rows) and the RAW remainder,
    then score every raw document by its log importance ratio
    sum_t [ log p_target(bucket(t)) - log p_raw(bucket(t)) ] with
    Laplace-smoothed bucket probabilities.  High scores = documents
    that look like the target distribution; DSIR then resamples the
    raw pool by these weights to build a target-like corpus.

    Scale shape: terms hash to ``n_buckets`` via md5 (vocabulary-free,
    one linear scan), the two bucket tables are ``n_buckets`` rows
    (broadcast), and the per-doc score is one map-side-combined
    groupBy — nothing materializes per-term state.  Returns
    DataFrame(doc_id, n_terms, logw) for the raw (non-target) rows.
    """
    # the bucket hash reads TWO md5 hex chars (0-255): n_buckets must
    # divide 256 or buckets past 255 stay permanently empty while the
    # Laplace denominators still assume them live (biased weights)
    if not (1 <= n_buckets <= 256 and 256 % n_buckets == 0):
        raise ValueError(
            f"dsir_scores: n_buckets={n_buckets} must be a divisor of 256 "
            "(bucket = first two md5 hex chars mod n_buckets); widen the "
            "hash prefix before asking for more buckets"
        )
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        target_pred.alias("is_target"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    b = tok.withColumn(
        "bucket",
        (F.conv(F.substring(F.md5("term"), 1, 2), 16, 10).cast("int") % n_buckets),
    )
    cnt = b.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("t"),
        F.sum(F.when(F.col("is_target"), 0).otherwise(1)).alias("r"),
    )
    tot = cnt.agg(F.sum("t").alias("tt"), F.sum("r").alias("rt"))
    w = cnt.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            F.log((F.col("t") + 1) / (F.col("tt") + n_buckets))
            - F.log((F.col("r") + 1) / (F.col("rt") + n_buckets))
        ).alias("w"),
    )
    return (
        b.filter(~F.col("is_target"))
        .join(F.broadcast(w), "bucket")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_terms"), F.sum("w").alias("logw"))
    )


def dsir_resample(
    df: DataFrame,
    target_pred,
    m: int,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The DSIR selection step: Gumbel-top-k importance resampling of
    the raw pool by the :func:`dsir_scores` log weights.  Sampling
    without replacement by weight == taking the top-m of
    ``logw + Gumbel(0,1)`` (the Gumbel-max trick); the Gumbel noise is
    SEEDED from md5(doc_id) so the draw is deterministic and
    reproducible across engines and partitionings — u = (first 8 md5
    hex chars + 0.5) / 2^32, g = -ln(-ln(u)).  Returns
    DataFrame(rank, doc_id, logw) of the m selected documents.
    """
    scored = dsir_scores(df, target_pred, n_buckets, text_col, id_col)
    v = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    u = (v + F.lit(0.5)) / F.lit(4294967296.0)
    key = F.col("logw") + (-F.log(-F.log(u)))
    # top-m via orderBy+limit (TakeOrdered: per-partition heaps merged
    # on the driver) — an unpartitioned row_number window would drag
    # the ENTIRE scored corpus through one task; rank is assigned on
    # the m survivors only (bounded single-partition window)
    survivors = (
        scored.withColumn("__key", key)
        .orderBy(F.col("__key").desc(), F.col("doc_id").asc())
        .limit(m)
    )
    w = Window.orderBy(F.col("__key").desc(), F.col("doc_id").asc())
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .select("rank", "doc_id", "logw")
        .orderBy("rank")
    )


def lcs_window_chain(eqt: DataFrame, la: int) -> DataFrame:
    """Longest-common-subsequence lengths for MANY (candidate,
    reference) pairs at once, as ``la`` chained window stages over an
    equality lattice ``eqt(pair, i, j, eq)`` (i = candidate position
    1..la, j = reference position, eq = tokens match).

    Row-collapse identity (LCS rows are nondecreasing in j):
    ``N[j] = max(P[j], max_{t<=j}(P[t-1] + eq(i, t)))`` — so each DP
    row is ONE lag + running-max window partitioned by pair, never a
    per-cell loop.  Returns (pair, j, c) for the final row; ``c`` at
    the last reference position is LCS(pair).  The l123 declared query
    pins this against a DuckDB oracle and a brute-force python DP.

    Scale: every stage is a window over (pair, j) — a million pairs
    run the same ``la`` stages; the lattice is bounded by the token
    CAPS, not document length (pad with non-matching sentinels; the
    lattice must be COMPLETE — every (i, j) in 1..la x 1..lb present
    once per pair — which both callers guarantee by construction).

    r9 shape: the lattice is first pivoted to ONE row per (pair, j),
    so every DP stage is a pair of window expressions over the SAME
    (pair, j) sort — after the single window exchange, Spark stacks all
    ``2*la`` Window operators on one sorted layout with no further
    exchange and no joins.  The old form re-joined (and therefore
    RE-COMPUTED) the caller's eqt pipeline once per stage: 12 joins,
    274 Exchange nodes in l123's physical plan, 12 evaluations of the
    upstream lattice build (plan diff in
    plans/r09/l123_rouge_l_{before,after}.txt).

    r10 shape: the pivot collects only the MATCHED candidate positions
    per (pair, j) — ``collect_list(when(eq = 1, i))`` drops the nulls —
    instead of an la-element (i, eq) struct array, and each DP stage
    reads ``eq(i, j)`` back as an array_contains membership test.  The
    eq lattice is overwhelmingly sparse (a position matches at most a
    few reference tokens), so the pivot's shuffle ships the match list,
    not the lattice: at the 400k-pair bench shape that is ~2.4M ints in
    place of 115M structs (~50x fewer aggregate bytes), the dominant
    cost of the r9 form (pivot noop 19.5 s of the 31 s total —
    decomposition in OPTIMIZATION_r10.md).  `eq` must be 0/1 (both
    callers construct it as a match literal; the docstring contract).
    """
    wpj = Window.partitionBy("pair").orderBy("j")
    lat = eqt.groupBy("pair", "j").agg(
        F.collect_list(F.when(F.col("eq") == 1, F.col("i"))).alias("__mi")
    )

    def eq_at(i: int):
        return F.when(F.array_contains("__mi", F.lit(i)), 1).otherwise(0)

    c = lat.select("pair", "j", "__mi", F.max(eq_at(1)).over(wpj).alias("c"))
    for i in range(2, la + 1):
        step = c.select(
            "pair",
            "j",
            "__mi",
            "c",
            (F.coalesce(F.lag("c").over(wpj), F.lit(0)) + eq_at(i)).alias("term"),
        )
        c = step.select(
            "pair",
            "j",
            "__mi",
            F.greatest(F.col("c"), F.max("term").over(wpj)).alias("c"),
        )
    return c.select("pair", "j", "c")
