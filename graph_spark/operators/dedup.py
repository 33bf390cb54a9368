"""Deduplication operators for training-data pipelines (SURVEY.md §2.F).

Exact (hash groupBy), MinHash (+LSH banding), SimHash, n-gram Jaccard.
All deterministic: hash functions are md5 of explicit strings so a SQL
oracle can reproduce every signature bit.

Scale shape: MinHash signatures/band hashes are per-row higher-order
functions (zero shuffles); everything else is explode -> groupBy
(map-side combined) or a banding equi-join.  Nothing crossJoins the
corpus; candidate pairs always come from a bucket/band/shingle join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tokens(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens, empties dropped: (id, term)."""
    return (
        df.select(id_col, F.explode(F.split(F.col(text_col), " ")).alias("term"))
        .filter(F.col("term") != "")
    )


def exact_dedup_groups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """md5(text) -> group counts.  Returns (hash, cnt) for all groups."""
    return df.groupBy(F.md5(F.col(text_col)).alias("hash")).agg(F.count(F.lit(1)).alias("cnt"))


def minhash_signature_array(
    df: DataFrame, k: int = 16, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, sigs) with sigs = the k MinHash values as an array, computed
    ENTIRELY per-row with higher-order functions: distinct tokens via
    array_distinct on the split array, then for each permutation i the
    string-min of md5(i || ':' || token) over the doc's tokens.

    This is the zero-shuffle signature path: the old row-exploded form
    (tokens().distinct() -> explode k -> groupBy(id, i) min) shuffled
    |tokens| rows once and |tokens|·k rows again — measured 326 s at 2M
    docs where this linear codegen scan + the band join take ~40 s.
    Same md5 count, no exchange until the caller's band join.  Docs with
    zero tokens produce no row (matching the old explode semantics)."""
    toks = F.array_distinct(
        F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    )
    sigs = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.array_min(
            F.transform(
                F.col("__toks"),
                lambda t: F.md5(F.concat(i.cast("string"), F.lit(":"), t)),
            )
        ),
    )
    return (
        df.select(F.col(id_col), toks.alias("__toks"))
        .filter(F.size("__toks") > 0)
        .select(id_col, sigs.alias("sigs"))
    )


def minhash_signatures(df: DataFrame, k: int = 16, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """k-permutation MinHash over whitespace tokens.

    sig_i(doc) = min over tokens of md5(i || ':' || token) — string-min of
    hex digests, a valid uniform hash family, exactly reproducible in any
    engine with md5.  Returns (id, i, sig).
    """
    arr = minhash_signature_array(df, k, text_col, id_col)
    return arr.select(
        id_col, F.posexplode("sigs").alias("i", "sig")
    )


def _minhash_band_hashes(
    df: DataFrame, k: int, bands: int, text_col: str, id_col: str
) -> DataFrame:
    """(id, band, bh) band-hash rows: the k signatures grouped into
    `bands` bands, each hashed as md5(concat_ws('|', sorted
    ["ii:sig", ...])) — byte-identical to the value the original
    groupBy(id, band)+collect_list form produced, derived per-row."""
    if bands < 1 or k % bands != 0:
        raise ValueError(
            f"minhash band hashing: bands ({bands}) must divide k ({k}) "
            "— a remainder silently drops trailing signature positions"
        )
    rows_per_band = k // bands
    arr = minhash_signature_array(df, k, text_col, id_col)
    band_strs = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda bnd: F.md5(
            F.concat_ws(
                "|",
                F.array_sort(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(rows_per_band - 1)),
                        lambda j: F.concat_ws(
                            ":",
                            F.lpad(
                                (bnd * rows_per_band + j).cast("string"), 2, "0"
                            ),
                            F.element_at(
                                F.col("sigs"), bnd * rows_per_band + j + 1
                            ),
                        ),
                    )
                ),
            )
        ),
    )
    return arr.select(id_col, F.posexplode(band_strs).alias("band", "bh"))


def _cap_bucket_occupancy(
    band_hash: DataFrame, cap: int, keys: tuple = ("band", "bh")
) -> DataFrame:
    """Drop every bucket (grouped by `keys`) with more than `cap`
    members BEFORE any of it is collected, using a count window over
    the SAME exchange the bucket aggregation needs — one extra sort,
    zero extra shuffles, and (critically) zero re-computation of the
    upstream signature pipeline.  A join- or aggregate-based count
    would reference the signature subtree a second time, and Spark
    plans each reference as its own subtree (no ReusedExchange fires,
    even under AQE — re-verified r10: the split form measured 2.3x
    slower because signatures ran 3x).  The window buffers one bucket
    at a time in a spillable row array, so a degenerate bucket costs
    disk, not an executor OOM."""
    w = Window.partitionBy(*keys)
    return (
        band_hash.withColumn("__n", F.count(F.lit(1)).over(w))
        .filter(F.col("__n") <= cap)
        .drop("__n")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    k: int = 16,
    bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """LSH banding: group the k signature values into `bands` bands,
    hash each band, equi-join on (band, band_hash) to emit candidate
    near-duplicate pairs (a < b).  This is the scale path: candidate
    generation is a shuffle on band hashes, never a crossJoin.

    `bands` must divide `k`: a remainder would silently drop the
    trailing signature positions from every band key (changing the
    effective k), and bands > k would build empty bands.

    Band hashes are derived per-row from the signature array (the same
    `md5(concat_ws('|', sorted ["ii:sig", ...]))` value the old
    groupBy(id, band)+collect_list form produced, byte-identical).

    Candidate pairs come from ONE groupBy on (band, band_hash) that
    collects each bucket's (sorted) doc ids and enumerates its ordered
    pairs — NOT a self-join: Spark plans a self-join's two sides as two
    separate subtrees (no ReusedExchange fires for the alias pair,
    verified in the r9 plans), so the 16-md5s-per-token signature scan
    ran TWICE and paid two exchanges.  The bucket form computes
    signatures once and shuffles once; measured at 2M docs interleaved
    with contention controls: 60.0 -> 30.0 s, pair set equal.

    Pair enumeration STREAMS (r10): each bucket row is posexploded to
    one row per member, which emits only that member's later partners
    — so no row ever materializes the C(n,2) pair array the r9 form
    built in place (a 100k-member duplicate cluster would have been
    ~5e9 structs in ONE row).  Peak per-row footprint is now O(bucket)
    — the id list itself — and the streamed form also measures ~15-20%
    FASTER at 400k docs (7.2 -> 5.9 s interleaved A/B): two pipelined
    generates beat building and flattening the nested pair array.

    ``max_bucket_size`` is the structural skew guard for degenerate
    corpora (boilerplate-heavy crawls where one band hash owns millions
    of ids): buckets with more members are DROPPED before collection
    (the ``max_gram_freq`` pattern of :func:`ngram_span_pairs`) via a
    count window on the same exchange — see :func:`_cap_bucket_occupancy`.
    A dropped bucket loses its candidate pairs, so the declared
    oracle-paired queries run uncapped (default None); audit what a cap
    would drop with :func:`lsh_bucket_occupancy`.  Near-dup clusters
    far above any sane cap are better served by exact_dedup_groups
    first (verbatim duplicates share ALL bands by construction)."""
    band_hash = _minhash_band_hashes(df, k, bands, text_col, id_col)
    if max_bucket_size is not None:
        band_hash = _cap_bucket_occupancy(band_hash, max_bucket_size)
    buckets = band_hash.groupBy("band", "bh").agg(
        F.array_sort(F.collect_list(id_col)).alias("ids")
    )
    # ordered pairs within the sorted bucket == the a < b join output;
    # streamed: one generated row per member, pairing only with LATER
    # members, so no row holds the whole C(n,2) pair set
    return (
        buckets.filter(F.size("ids") >= 2)
        .select("ids", F.posexplode("ids").alias("__i", "a"))
        .select(
            "a",
            F.explode(
                F.slice(F.col("ids"), F.col("__i") + 2, F.size("ids"))
            ).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))  # duplicate input ids guard (join used strict <)
        .distinct()
    )


def lsh_bucket_occupancy(
    df: DataFrame,
    k: int = 16,
    bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Audit companion to :func:`minhash_lsh_candidates`: per-bucket
    occupancy (band, bh, n_ids) so a caller can size — and count the
    casualties of — ``max_bucket_size`` before capping a production
    corpus (``occ.filter(n_ids > cap)`` is exactly the dropped set)."""
    return (
        _minhash_band_hashes(df, k, bands, text_col, id_col)
        .groupBy("band", "bh")
        .agg(F.count(F.lit(1)).alias("n_ids"))
    )


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    tau_num: int = 1,
    tau_den: int = 2,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT Jaccard >= tau self-join via prefix filtering (PPJoin
    family), tau = tau_num/tau_den as an exact rational so the
    threshold compare stays integer (`tau_den*i >= tau_num*union`).

    Shingles (word n-grams) are ranked rarest-first by global document
    frequency; each doc indexes only its first
    |d| - ceil(tau*|d|) + 1 shingles, and candidates come from the
    prefix equi-join alone — LOSSLESS by the prefix-filter theorem
    (two sets with J >= tau must overlap inside those prefixes under
    any shared total order).  Returns (a, b, inter_n, union_n) for all
    verified pairs.  The scale lever vs a full inverted index: index
    volume drops ~tau*|shingles| and the rare-first order makes hot
    buckets the SMALLEST ones."""
    sh = word_shingles(df, n, text_col, id_col)
    sz = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    dfq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    from pyspark.sql import Window

    rk = sh.join(dfq, "shingle").withColumn(
        "rn",
        F.row_number().over(Window.partitionBy(id_col).orderBy("df", "shingle")),
    )
    # prefix length: n - ceil(tau*n) + 1, all-integer ceil
    plen = F.expr(
        f"n - ((CAST({tau_num} AS BIGINT) * n + {tau_den} - 1) DIV {tau_den}) + 1"
    )
    pre = rk.join(sz, id_col).filter(F.col("rn") <= plen).select(id_col, "shingle")
    a = pre.select(F.col(id_col).alias("a"), "shingle")
    b = pre.select(F.col(id_col).alias("b"), "shingle")
    cand = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    x = sh.select(F.col(id_col).alias("a"), "shingle")
    y = sh.select(F.col(id_col).alias("b"), "shingle")
    inter = (
        cand.join(x, "a")
        .join(y, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    return (
        inter.join(sz.select(F.col(id_col).alias("a"), F.col("n").alias("na")), "a")
        .join(sz.select(F.col(id_col).alias("b"), F.col("n").alias("nb")), "b")
        .withColumn("union_n", (F.col("na") + F.col("nb") - F.col("i")).cast("long"))
        .filter(tau_den * F.col("i") >= tau_num * F.col("union_n"))
        .select("a", "b", F.col("i").cast("long").alias("inter_n"), "union_n")
    )


def simhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over distinct whitespace tokens, emitted as a
    16-hex-char lowercase string.

    Bit source: the 16 hex digits of md5(token), 4 bits per digit.  For
    each of the 64 bit positions, sum +1/-1 over the doc's tokens;
    positive sum -> bit 1 (ties -> 0).  The signature is assembled as two
    32-bit halves to stay clear of signed-long edge cases.  Exactly
    reproducible in SQL.  Returns (id, simhash).

    Implementation note (r9 optimization round): a per-row
    higher-order-function rewrite (64 aggregate folds over the token
    array — the minhash_signature_array move) was tried, produced
    byte-identical signatures (tests/test_operators.py
    test_simhash_matches_python_reference pins that), and measured 2x
    SLOWER at 200k docs (3.4-5.3 s vs 1.6-2.9 s): Spark's higher-order
    functions evaluate interpreted, and 64 folds x |tokens| loses to
    four codegen'd hash aggregations even counting their shuffles.
    The exploded form stays.
    """
    tok = tokens(df, text_col, id_col).distinct().withColumn("h", F.md5(F.col("term")))
    digits = (
        tok.select(id_col, F.explode(F.sequence(F.lit(0), F.lit(15))).alias("di"), "h")
        .withColumn("dv", F.conv(F.expr("substring(h, di + 1, 1)"), 16, 10).cast("int"))
    )
    bits = (
        digits.select(id_col, "di", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("bi"), "dv")
        .withColumn("bit", (F.floor(F.col("dv") / F.pow(F.lit(2.0), F.col("bi"))) % 2).cast("int"))
        .withColumn("sgn", F.col("bit") * 2 - 1)
    )
    maj = (
        bits.groupBy(id_col, "di", "bi")
        .agg(F.sum("sgn").alias("s"))
        .withColumn("mbit", (F.col("s") > 0).cast("int"))
    )
    digit_vals = (
        maj.groupBy(id_col, "di")
        .agg(F.sum(F.col("mbit") * F.pow(F.lit(2.0), F.col("bi")).cast("int")).alias("dval"))
    )
    # two 32-bit halves: di 0..7 -> high, 8..15 -> low; weight 16^(7 - di%8)
    halves = digit_vals.withColumn("half", (F.col("di") < 8).cast("int")).withColumn(
        "contrib",
        (F.col("dval") * F.pow(F.lit(2.0), (F.lit(4) * (F.lit(7) - F.col("di") % 8)).cast("double"))).cast("long"),
    )
    half_vals = halves.groupBy(id_col, "half").agg(F.sum("contrib").alias("hv"))
    hexstr = F.lower(F.lpad(F.hex(F.col("hv")), 8, "0"))
    return (
        half_vals.withColumn("hx", hexstr)
        .groupBy(id_col)
        .agg(
            F.concat(
                F.max(F.when(F.col("half") == 1, F.col("hx"))),
                F.max(F.when(F.col("half") == 0, F.col("hx"))),
            ).alias("simhash")
        )
    )


def word_shingles(df: DataFrame, n: int = 2, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Distinct word n-gram shingles per doc: (id, shingle).  Docs with
    fewer than n tokens produce no shingles."""
    arr = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    idxs = F.when(F.size(arr) >= n, F.sequence(F.lit(0), F.size(arr) - n)).otherwise(
        F.array().cast("array<int>")
    )
    sh = F.transform(idxs, lambda i: F.concat_ws(" ", *[F.element_at(arr, (i + j + 1)) for j in range(n)]))
    return df.select(id_col, F.explode(sh).alias("shingle")).distinct()


def ngram_jaccard_pairs(df: DataFrame, n: int = 2, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Pairwise Jaccard over distinct word n-gram shingles for all pairs
    (a < b) sharing at least one shingle.  Candidate pairs come from the
    shingle equi-join (inverted-index pattern), so cost is bounded by
    shingle co-occurrence, not |docs|^2."""
    sh = word_shingles(df, n, text_col, id_col)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col(id_col).alias("a"), "shingle")
    b = sh.select(F.col(id_col).alias("b"), "shingle")
    inter = (
        a.join(b, "shingle").filter(F.col("a") < F.col("b"))
        .groupBy("a", "b").agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("szb"))
    # NO broadcast hint on the size tables: they are one row PER DOC
    # (linear in corpus size), so forcing a broadcast would ship the
    # whole doc list to every executor at the 2M-doc scale this module
    # benches — AQE elects a broadcast by itself when the corpus is
    # genuinely small
    return (
        inter.join(sa, "a").join(sb, "b")
        .withColumn("jaccard", F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")))
        .select("a", "b", "jaccard")
    )


def simhash_hamming_pairs(
    df: DataFrame,
    max_distance: int = 2,
    n_bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """SimHash near-dup candidate pairs within `max_distance` hamming bits.

    LSH banding over the 64-bit signature: the 16-hex-char signature is
    split into `n_bands` equal substrings; docs sharing ANY band become
    candidates via an equi-join on (band, band_key) — never a cross
    join, so at 100 TB the cost is bounded by bucket collision sizes
    (band width tunes recall vs bucket size; 4x16-bit bands guarantee
    recall 1.0 for distance <= 3 by pigeonhole).  Exact hamming is then
    computed digit-wise (bit_count of 4-bit xor, summed over the 16 hex
    digits) on candidates only.  Returns (i, j, hd), i < j.

    Recall 1.0 REQUIRES max_distance <= n_bands - 1 (pigeonhole: at
    distance d, some band is untouched only when d < n_bands) and
    n_bands dividing the 16 hex digits — both validated, because a
    violation is a silent recall hole, not an error.

    ``max_bucket_size`` is the same structural skew guard as
    :func:`minhash_lsh_candidates` (buckets above the cap DROPPED
    before collection via a count window on the same exchange —
    declared oracle-paired queries run uncapped), and pair enumeration
    streams the same way: no row ever materializes a bucket's full
    C(n,2) pair set.
    """
    if 16 % n_bands != 0:
        raise ValueError(
            f"simhash_hamming_pairs: n_bands ({n_bands}) must divide the "
            "16-hex-digit signature (1/2/4/8/16)"
        )
    if max_distance > n_bands - 1:
        raise ValueError(
            f"simhash_hamming_pairs: max_distance ({max_distance}) > "
            f"n_bands - 1 ({n_bands - 1}) loses pairs silently — a pair "
            "can differ in every band; raise n_bands to keep recall 1.0"
        )
    band_w = 16 // n_bands
    sig = simhash_signatures(df, text_col, id_col)
    bands = (
        sig.select(
            F.col(id_col),
            F.col("simhash"),
            F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
        )
        .withColumn("bk", F.expr(f"substring(simhash, band*{band_w} + 1, {band_w})"))
    )
    # same bucket-collect pair enumeration as minhash_lsh_candidates
    # (a self-join would recompute the 4-shuffle signature pipeline for
    # both sides — no ReusedExchange fires for an alias self-join);
    # streamed per-member like minhash (no in-row C(n,2) pair array)
    if max_bucket_size is not None:
        bands = _cap_bucket_occupancy(bands, max_bucket_size, keys=("band", "bk"))
    buckets = bands.groupBy("band", "bk").agg(
        F.array_sort(F.collect_list(F.struct(F.col(id_col).alias("i"), "simhash"))).alias(
            "ms"
        )
    )
    cand = (
        buckets.filter(F.size("ms") >= 2)
        .select("ms", F.posexplode("ms").alias("__i", "x"))
        .select(
            "x",
            F.explode(
                F.slice(F.col("ms"), F.col("__i") + 2, F.size("ms"))
            ).alias("y"),
        )
        .select(
            F.col("x.i").alias("i"),
            F.col("y.i").alias("j"),
            F.col("x.simhash").alias("sa"),
            F.col("y.simhash").alias("sb"),
        )
        .filter(F.col("i") != F.col("j"))
        .distinct()
    )
    dig = cand.select(
        "i", "j", F.explode(F.sequence(F.lit(1), F.lit(16))).alias("di"), "sa", "sb"
    )
    ham = dig.select(
        "i",
        "j",
        F.expr(
            "bit_count((instr('0123456789abcdef', substring(sa, di, 1)) - 1)"
            " ^ (instr('0123456789abcdef', substring(sb, di, 1)) - 1))"
        ).alias("hb"),
    )
    return (
        ham.groupBy("i", "j")
        .agg(F.sum("hb").alias("hd"))
        .filter(F.col("hd") <= max_distance)
    )


def fuzzy_match_pairs(
    df: DataFrame, col: str, max_distance: int = 2
) -> DataFrame:
    """Edit-distance near-match pairs with length-band blocking: each
    value emits candidate length buckets len-d..len+d, equi-joined
    against the other side's actual length, then exact levenshtein
    filters.  |len(a)-len(b)| <= d is NECESSARY for edit distance <= d,
    so the blocking loses nothing — recall is exactly 1.0 while the
    quadratic term shrinks to per-length-bucket cross products (the
    entity-resolution candidate generator at vocabulary scale).

    Returns (a, b, dist) with a < b canonical orientation over the
    DISTINCT value set of `col`.
    """
    vals = df.select(F.col(col).alias("v")).distinct()
    left = vals.select(
        "v",
        F.explode(
            F.sequence(
                F.length("v") - max_distance, F.length("v") + max_distance
            )
        ).alias("lb"),
    )
    right = vals.select(F.col("v").alias("w"), F.length("v").alias("lb"))
    return (
        left.join(right, "lb")
        .filter(F.col("v") < F.col("w"))
        .withColumn("dist", F.levenshtein("v", "w"))
        .filter(F.col("dist") <= max_distance)
        .select(F.col("v").alias("a"), F.col("w").alias("b"), F.col("dist").cast("int").alias("dist"))
    )  # vals is distinct and each (v, w) pair joins on one length band


def positional_ngrams(
    df: DataFrame, n: int = 5, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Positional word n-grams: (doc_id, pos, gram) with 1-based pos.

    A doc shorter than n tokens emits no grams (guarded: without the
    CASE, sequence(1, size-n+1) descends and slice(toks, 0, n) throws).
    One per-row codegen pass — no shuffle, no UDF.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        # filter '' like tokens()/word_shingles: runs of spaces must not
        # mint phantom tokens that shift positions and pad spans
        F.expr(f"filter(split(lower({text_col}), ' '), x -> x != '')").alias(
            "toks"
        ),
    )
    gram_expr = (
        f"CASE WHEN size(toks) >= {n} THEN "
        f"transform(sequence(1, size(toks) - {n - 1}), "
        f"p -> concat_ws(' ', slice(toks, p, {n}))) "
        "ELSE array() END"
    )
    return toks.select(
        "doc_id", F.posexplode(F.expr(gram_expr)).alias("p0", "gram")
    ).select("doc_id", (F.col("p0") + 1).alias("pos"), "gram")


def ngram_span_pairs(
    df: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_gram_freq: int | None = None,
) -> DataFrame:
    """Verbatim repeated-span detection (the substring-dedup primitive
    behind declared query l112): positional n-grams self-joined on the
    gram, matches grouped per (pair, diagonal pa-pb), and consecutive
    runs found with the pos - row_number() gaps-and-islands trick.  A
    run of r consecutive matching grams IS a shared verbatim span of
    r + n - 1 tokens.

    Returns (doc_a, doc_b, shared_grams, max_run_tokens) with
    doc_a < doc_b, every carrier an exact integer.

    Scale: the gram equi-join is the inverted-index shape — shuffle
    keyed on the gram, match volume (not corpus volume) bounds the
    cost.  ``max_gram_freq`` drops stop-grams appearing in more than
    that many documents BEFORE the join (each contributes O(freq^2)
    pairs while carrying no dedup signal — the l07 skew cap); the
    declared oracle-paired query runs uncapped.
    """
    g = positional_ngrams(df, n=n, text_col=text_col, id_col=id_col)
    if max_gram_freq is not None:
        from pyspark.sql import Window

        keep = (
            g.groupBy("gram")
            .agg(F.countDistinct("doc_id").alias("df_"))
            .filter(F.col("df_") <= max_gram_freq)
            .select("gram")
        )
        g = g.join(keep, "gram")
    a = g.select(F.col("doc_id").alias("da"), F.col("pos").alias("pa"), "gram")
    b = g.select(F.col("doc_id").alias("db"), F.col("pos").alias("pb"), "gram")
    m = (
        a.join(b, "gram")
        .filter(F.col("da") < F.col("db"))
        .select("da", "db", "pa", "pb")
    )
    from pyspark.sql import Window

    wdiag = Window.partitionBy("da", "db", F.col("pa") - F.col("pb")).orderBy("pa")
    runs = m.withColumn("grp", F.col("pa") - F.row_number().over(wdiag))
    isl = runs.groupBy("da", "db", F.col("pa") - F.col("pb"), "grp").agg(
        F.count(F.lit(1)).alias("run_grams")
    )
    return isl.groupBy("da", "db").agg(
        F.sum("run_grams").cast("long").alias("shared_grams"),
        (F.max("run_grams") + n - 1).cast("long").alias("max_run_tokens"),
    ).select(
        F.col("da").alias("doc_a"),
        F.col("db").alias("doc_b"),
        "shared_grams",
        "max_run_tokens",
    )
