"""Operator unit tests: edge-case semantics that the declared-suite
oracle runs don't isolate (as-of ties, session boundaries, LSH recall,
dedup candidate soundness, multimodal plumbing)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from graph_spark.catalog import Catalog
from graph_spark.operators.dedup import (
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_signatures,
    word_shingles,
)
from graph_spark.operators.relational import asof_join, sessionize
from graph_spark.operators.similarity import cosine_topk_bruteforce, cosine_topk_lsh

from .conftest import SF_SMOKE


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_tie_and_miss(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "p1"), (1, _ts("2024-01-01T09:00:00"), "p0"),
         (2, _ts("2024-01-01T10:00:00"), "p2")],
        ["uid", "ts", "pid"],
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), 100.0), (1, _ts("2024-01-01T08:00:00"), 50.0)],
        ["uid", "ts", "val"],
    )
    res = {
        r["pid"]: (r["asof_ts"], r["asof_val"])
        for r in asof_join(left, right, ["uid"], "ts", "ts", ["val"]).collect()
    }
    # tie: right row at exactly left.ts counts (<=)
    assert res["p1"] == (_ts("2024-01-01T10:00:00"), 100.0)
    # earlier left row sees only the earlier right row
    assert res["p0"] == (_ts("2024-01-01T08:00:00"), 50.0)
    # no right rows for uid=2 -> NULLs, row preserved (LEFT semantics)
    assert res["p2"] == (None, None)


def test_asof_forward_strict_and_miss(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "p1"), (1, _ts("2024-01-01T12:00:00"), "p2"),
         (2, _ts("2024-01-01T10:00:00"), "p3")],
        ["uid", "ts", "pid"],
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), 100.0), (1, _ts("2024-01-01T11:00:00"), 50.0)],
        ["uid", "ts", "val"],
    )
    res = {
        r["pid"]: (r["asof_ts"], r["asof_val"])
        for r in asof_join(
            left, right, ["uid"], "ts", "ts", ["val"], direction="forward"
        ).collect()
    }
    # strict: the right row at exactly left.ts does NOT match; next one does
    assert res["p1"] == (_ts("2024-01-01T11:00:00"), 50.0)
    # nothing after the last left row -> NULLs, row preserved
    assert res["p2"] == (None, None)
    assert res["p3"] == (None, None)


def test_asof_forward_backward_random_reference(spark):
    """Both directions against a brute-force python reference on random
    integer-timestamp data (seeded)."""
    import datetime as _dt
    import random

    rng = random.Random(17)
    base = _ts("2024-01-01T00:00:00")
    mk = lambda s: base + _dt.timedelta(seconds=s)
    lrows = [(rng.randrange(4), mk(rng.randrange(1000)), i) for i in range(60)]
    rrows = [(rng.randrange(4), mk(rng.randrange(1000)), float(i)) for i in range(60)]
    left = spark.createDataFrame(lrows, ["uid", "ts", "pid"])
    right = spark.createDataFrame(rrows, ["uid", "ts", "val"])

    def ref(direction):
        out = {}
        for uid, lts, pid in lrows:
            cands = [(rts, v) for (ruid, rts, v) in rrows if ruid == uid and (
                rts <= lts if direction == "backward" else rts > lts)]
            if not cands:
                out[pid] = (None, None)
            elif direction == "backward":
                out[pid] = max(cands, key=lambda c: (c[0], c[1]))
            else:
                out[pid] = min(cands, key=lambda c: (c[0], -c[1]))
        return out

    for direction in ("backward", "forward"):
        got = {
            r["pid"]: (r["asof_ts"], r["asof_val"])
            for r in asof_join(
                left, right, ["uid"], "ts", "ts", ["val"], direction=direction
            ).collect()
        }
        want = ref(direction)
        for pid, (wts, _) in want.items():
            assert got[pid][0] == wts, (direction, pid, got[pid], want[pid])


def test_sessionize_boundary_exact_gap(spark):
    base = _ts("2024-01-01T00:00:00")
    rows = [
        (1, base, 1),
        (1, base + dt.timedelta(minutes=30), 2),          # gap == 30min -> same session
        (1, base + dt.timedelta(minutes=60, seconds=1), 3),  # gap > 30min -> new session
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id"])
    res = {r["event_id"]: r["session_id"] for r in sessionize(df, "user_id", "ts", 1800, ["event_id"]).collect()}
    assert res == {1: 1, 2: 1, 3: 2}


def test_minhash_lsh_candidates_catch_duplicates(spark):
    """A doc and its near-copy must share at least one LSH band."""
    texts = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (1, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
        (2, "completely different words about spark engines and parquet columnar files"),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    cands = {(r["a"], r["b"]) for r in minhash_lsh_candidates(df, k=16, bands=8).collect()}
    assert (0, 1) in cands
    assert (0, 2) not in cands and (1, 2) not in cands


def test_lsh_bucket_cap_degenerate_corpus(spark):
    """Structural skew guard (r9 verdict item 2): a degenerate corpus
    with one hot bucket (60 verbatim-duplicate docs share EVERY band)
    must (a) return the exact uncapped pair set when the cap clears the
    occupancy, (b) drop only the hot bucket's pairs when capped below
    it — the normal near-dup pair survives — and (c) be auditable via
    lsh_bucket_occupancy.  Enumeration itself streams (one generated
    row per bucket member), so no row ever holds a bucket's C(n,2)
    pair array regardless of the cap."""
    from graph_spark.operators.dedup import lsh_bucket_occupancy

    rows = [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(60)]
    rows += [
        (100, "totally different text about columnar parquet files and engines"),
        (101, "totally different text about columnar parquet files and engines"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = {(r["a"], r["b"]) for r in minhash_lsh_candidates(df, k=16, bands=8).collect()}
    assert len(uncapped) == 60 * 59 // 2 + 1  # hot-cluster pairs + the planted pair
    # cap above occupancy: pair set byte-identical
    same = {
        (r["a"], r["b"])
        for r in minhash_lsh_candidates(df, k=16, bands=8, max_bucket_size=64).collect()
    }
    assert same == uncapped
    # cap below the hot bucket: exactly its pairs drop, nothing else
    capped = {
        (r["a"], r["b"])
        for r in minhash_lsh_candidates(df, k=16, bands=8, max_bucket_size=10).collect()
    }
    assert capped == {(100, 101)}
    # the audit frame names what a cap of 10 would drop
    hot = lsh_bucket_occupancy(df, k=16, bands=8).filter(F.col("n_ids") > 10).collect()
    assert hot and all(r["n_ids"] == 60 for r in hot)
    # simhash shares the guard: identical docs collapse to one signature
    from graph_spark.operators.dedup import simhash_hamming_pairs

    sim_capped = {
        (r["i"], r["j"])
        for r in simhash_hamming_pairs(df, max_distance=0, max_bucket_size=10).collect()
    }
    assert sim_capped == {(100, 101)}


def test_simhash_similar_docs_closer(spark):
    texts = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "alpha beta gamma delta epsilon zeta eta iota"),   # 1 token differs
        (2, "one two three four five six seven eight"),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    sigs = {r["doc_id"]: int(r["simhash"], 16) for r in simhash_signatures(df).collect()}

    def ham(a, b):
        return bin(a ^ b).count("1")

    assert ham(sigs[0], sigs[1]) < ham(sigs[0], sigs[2])
    assert len(f"{sigs[0]:016x}") == 16


def test_simhash_matches_python_reference(spark):
    """Byte-exact pin of the r9 per-row simhash rewrite against an
    independent pure-Python implementation of the documented formula
    (md5 hex digits -> 4 bits each, per-bit +/-1 majority over DISTINCT
    tokens, ties -> 0, hi||lo hex assembly)."""
    import hashlib

    texts = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "x"),
        (2, "dup dup dup unique"),  # distinct-token dedup must apply
        (3, "  spaced   out   tokens "),
        (4, "a b a b c"),
    ]

    def ref(text):
        toks = sorted({t for t in text.split(" ") if t})
        n = len(toks)
        bits = []
        for pos in range(64):
            di, bi = pos // 4, pos % 4
            c = sum(
                (int(hashlib.md5(t.encode()).hexdigest()[di], 16) >> bi) & 1
                for t in toks
            )
            bits.append(1 if 2 * c > n else 0)
        val = 0
        for di in range(16):
            dv = sum(bits[di * 4 + bi] << bi for bi in range(4))
            val |= dv << (4 * (15 - di))
        return f"{val:016x}"

    df = spark.createDataFrame(texts, ["doc_id", "text"])
    got = {r["doc_id"]: r["simhash"] for r in simhash_signatures(df).collect()}
    assert got == {i: ref(t) for i, t in texts}


def test_word_shingles_short_docs(spark):
    df = spark.createDataFrame(
        [(0, "only"), (1, ""), (2, "two words"), (3, "a b c")], ["doc_id", "text"]
    )
    res = {}
    for r in word_shingles(df, n=2).collect():
        res.setdefault(r["doc_id"], set()).add(r["shingle"])
    assert 0 not in res and 1 not in res  # <2 tokens -> no shingles
    assert res[2] == {"two words"}
    assert res[3] == {"a b", "b c"}


def test_lsh_recall_vs_bruteforce(spark):
    """ANN recall at the SURVEY §2.F level: multi-table LSH top-5 must
    recover >=90% of exact top-5 (4 planes x 24 tables — the parameter
    sweep recorded in SCALE.md measured 1.00 on this fixture; 0.9
    leaves margin for fixture regeneration)."""
    em = Catalog(spark, SF_SMOKE).table("embeddings")
    probes = em.filter(F.col("vec_id") < 20)
    exact = {}
    for r in cosine_topk_bruteforce(em, probes, 5).collect():
        exact.setdefault(r["vec_id"], set()).add(r["nb"])
    approx = {}
    for r in cosine_topk_lsh(em, probes, 5, dim=64, n_planes=4, n_tables=24).collect():
        approx.setdefault(r["vec_id"], set()).add(r["nb"])
    hits = sum(len(exact[v] & approx.get(v, set())) for v in exact)
    total = sum(len(exact[v]) for v in exact)
    assert hits / total >= 0.9, f"recall {hits}/{total}"


def test_ivf_assignment_argmin_semantics(spark):
    """The r9 argmin-projection cluster assignment must keep the old
    crossJoin+row_number pick order: highest cosine wins, exact ties
    fall to the LOWEST cluster id.  (Zero-norm vectors raise under the
    session's ANSI divide — exactly as the old form did.)"""
    from graph_spark.operators.similarity import _assign_clusters_lit

    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),   # clear winner c0
            (1, [0.0, 1.0]),   # clear winner c1
            (3, [1.0, 1.0]),   # exactly equidistant from c0 and c1 -> tie -> cluster 0
        ],
        ["vec_id", "embedding"],
    )
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    got = {
        r["vec_id"]: r["cluster"]
        for r in _assign_clusters_lit(df, cents, "embedding").collect()
    }
    assert got == {0: 0, 1: 1, 3: 0}


def test_ivf_assignment_join_fallback_parity(spark):
    """Above LIT_ASSIGN_TERM_LIMIT (k x dim literal doubles) assignment
    falls back to the broadcast crossJoin form — r10 guard against the
    measured py4j/janino pathology of huge literal trees.  The fallback
    must pick identically to the compiled argmin (highest sim, ties and
    all-null to the lowest cluster id), including on duplicate rows."""
    import graph_spark.operators.similarity as sim

    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.0, 1.0]),
            (3, [1.0, 1.0]),   # exact tie -> cluster 0
            (3, [1.0, 1.0]),   # duplicate row must survive both forms
        ],
        ["vec_id", "embedding"],
    )
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    lit_rows = sorted(
        (r["vec_id"], r["cluster"])
        for r in sim._assign_clusters_lit(df, cents, "embedding").collect()
    )
    join_rows = sorted(
        (r["vec_id"], r["cluster"])
        for r in sim._assign_clusters_join(df, cents, "embedding").collect()
    )
    assert join_rows == lit_rows == [(0, 0), (1, 1), (3, 0), (3, 0)]
    # the routing threshold actually engages the fallback
    big_dim = sim.LIT_ASSIGN_TERM_LIMIT + 1
    assert len(cents) * 2 <= sim.LIT_ASSIGN_TERM_LIMIT  # small case stays lit
    routed = sim._assign_clusters_lit(
        spark.createDataFrame([(0, [1.0] * big_dim)], ["vec_id", "embedding"]),
        [(0, [1.0] * big_dim)],
        "embedding",
    )
    assert [r["cluster"] for r in routed.collect()] == [0]


def test_ivf_recall_vs_bruteforce(spark):
    """IVF ANN recall at nprobe=10/16 cells must beat 90% of exact
    top-5 (sweep measured 0.96 on this fixture)."""
    from graph_spark.operators.similarity import cosine_topk_ivf

    em = Catalog(spark, SF_SMOKE).table("embeddings")
    probes = em.filter(F.col("vec_id") < 20)
    exact = {}
    for r in cosine_topk_bruteforce(em, probes, 5).collect():
        exact.setdefault(r["vec_id"], set()).add(r["nb"])
    approx = {}
    for r in cosine_topk_ivf(em, probes, 5, dim=64, n_clusters=16, nprobe=10).collect():
        approx.setdefault(r["vec_id"], set()).add(r["nb"])
    hits = sum(len(exact[v] & approx.get(v, set())) for v in exact)
    total = sum(len(exact[v]) for v in exact)
    assert hits / total >= 0.9, f"recall {hits}/{total}"


def test_ivf_full_probe_equals_bruteforce(spark):
    """nprobe == n_clusters degenerates to exact search."""
    from graph_spark.operators.similarity import cosine_topk_ivf

    em = Catalog(spark, SF_SMOKE).table("embeddings").filter(F.col("vec_id") < 120)
    probes = em.filter(F.col("vec_id") < 5)
    exact = sorted(
        (r["vec_id"], r["nb"]) for r in cosine_topk_bruteforce(em, probes, 5).collect()
    )
    full = sorted(
        (r["vec_id"], r["nb"])
        for r in cosine_topk_ivf(em, probes, 5, dim=64, n_clusters=8, nprobe=8).collect()
    )
    assert exact == full


def test_multimodal_feature_plumbing(spark):
    from graph_spark.operators.multimodal import extract_features, to_media_table

    docs = Catalog(spark, SF_SMOKE).table("documents").limit(20)
    feats = extract_features(to_media_table(docs))
    rows = feats.collect()
    assert len(rows) == 20
    assert set(feats.columns) == {"doc_id", "media_type", "n_bytes", "checksum"}
    assert all(len(r["checksum"]) == 32 for r in rows)
    # checksum must equal md5 of the utf-8 text (deterministic stand-in)
    import hashlib

    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in rows:
        assert r["checksum"] == hashlib.md5(texts[r["doc_id"]].encode()).hexdigest()


def test_ngram_jaccard_identical_docs(spark):
    df = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b c d"), (2, "x y z w")], ["doc_id", "text"]
    )
    res = {(r["a"], r["b"]): r["jaccard"] for r in ngram_jaccard_pairs(df, 2).collect()}
    assert res[(0, 1)] == 1.0
    assert (0, 2) not in res  # no shared shingles -> no candidate pair


def test_minhash_signature_count(spark):
    df = spark.createDataFrame([(0, "a b c"), (1, "d e")], ["doc_id", "text"])
    sigs = minhash_signatures(df, k=8).collect()
    assert len(sigs) == 16  # 2 docs x 8 perms
    assert all(len(r["sig"]) == 32 for r in sigs)


def test_frame_sampling_shapes(spark):
    """sample_frames: 1 row -> ceil(n/64/every) rows; empty payload -> 0
    rows; every=1 keeps all frames and re-concatenation of the frames
    covers the payload."""
    import hashlib

    from graph_spark.operators.multimodal import sample_frames

    rows = [(1, b"a" * 130), (2, b""), (3, b"xyz")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = sample_frames(df, frame_bytes=64, every=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: frames 0,1,2 (64+64+2 bytes) -> sampled idx 0,2
    assert [r["frame_idx"] for r in sorted(by_doc[1], key=lambda r: r["frame_idx"])] == [0, 2]
    assert sorted(r["n_bytes"] for r in by_doc[1]) == [2, 64]
    assert 2 not in by_doc  # empty payload contributes no frames
    assert [(r["frame_idx"], r["n_bytes"]) for r in by_doc[3]] == [(0, 3)]
    assert by_doc[3][0]["checksum"] == hashlib.md5(b"xyz").hexdigest()
    # every=1: full coverage
    full = sample_frames(df, frame_bytes=64, every=1).collect()
    assert sum(r["n_bytes"] for r in full if r["doc_id"] == 1) == 130


def test_window_chunks_overlap_coverage(spark):
    """window_chunks: windows start every `hop` bytes and overlap by
    window-hop; empty payload -> 0 rows; every byte is covered by at
    least one window; final window may be short."""
    import hashlib

    from graph_spark.operators.multimodal import window_chunks

    rows = [(1, b"a" * 100), (2, b""), (3, b"xyz")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = window_chunks(df, window_bytes=64, hop=32).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1 (100 bytes): windows at 0, 32, 64, 96 -> sizes 64, 64, 36, 4
    d1 = sorted(by_doc[1], key=lambda r: r["win_idx"])
    assert [r["win_idx"] for r in d1] == [0, 1, 2, 3]
    assert [r["n_bytes"] for r in d1] == [64, 64, 36, 4]
    assert 2 not in by_doc
    assert [(r["win_idx"], r["n_bytes"]) for r in by_doc[3]] == [(0, 3)]
    assert by_doc[3][0]["checksum"] == hashlib.md5(b"xyz").hexdigest()


def test_simhash_hamming_pairs_identical_and_disjoint(spark):
    """Identical token sets -> hamming 0 pair; disjoint-vocabulary doc
    stays out at a tight threshold; i<j canonical orientation."""
    from graph_spark.operators.dedup import simhash_hamming_pairs

    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),  # same tokens -> same signature
        (3, "zq xw vv uu tt ss rr qq pp oo nn mm"),  # disjoint vocab
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["i"], r["j"]): r["hd"] for r in simhash_hamming_pairs(df, max_distance=0).collect()}
    assert out == {(1, 2): 0}
    # distance-3 recall guarantee: with 4 bands one band must be clean
    near = simhash_hamming_pairs(df, max_distance=3).collect()
    assert all(r["i"] < r["j"] for r in near)
    # beyond the pigeonhole bound the banding LOSES pairs silently —
    # refused (r7 self-review), as is a band width not dividing 16 hex
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_bands - 1"):
        simhash_hamming_pairs(df, max_distance=64)
    with _pytest.raises(ValueError, match="must divide"):
        simhash_hamming_pairs(df, max_distance=2, n_bands=3)


def test_time_weighted_avg_prefix_segment(spark):
    """A change-point BEFORE the range start still contributes its
    in-range prefix; constant series -> twa equals the constant."""
    from pyspark.sql import functions as F

    from graph_spark.temporal.tprop import time_weighted_avg

    rows = [
        # entity 1: value 10.0 from 1995, jumps to 20.0 mid-range
        (1, "1995-06-01", 10.0),
        (1, "1996-07-01", 20.0),
        # entity 2: single pre-range change-point, constant inside
        (2, "1995-01-01", 7.5),
    ]
    df = spark.createDataFrame(rows, "entity_id long, ts string, value double").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    res = {
        r["entity_id"]: r["twa"]
        for r in time_weighted_avg(
            df,
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1997-01-01").cast("timestamp"),
        ).collect()
    }
    # entity 1: 182 days at 10.0 (Jan 1..Jul 1) + 184 days at 20.0
    assert abs(res[1] - (182 * 10.0 + 184 * 20.0) / 366) < 1e-6
    assert abs(res[2] - 7.5) < 1e-9


def test_bucketed_range_join_degenerate_intervals(spark):
    """Zero- and negative-length intervals match nothing (and must not
    trip the descending-sequence hazard in the bucket expansion)."""
    from pyspark.sql import functions as F

    from graph_spark.operators.relational import bucketed_range_join

    p = spark.createDataFrame([(1, 1000)], "pid long, p_ts long").withColumn(
        "p_ts", F.timestamp_seconds("p_ts")
    )
    iv = (
        spark.createDataFrame(
            [(1, 1000, 1000), (2, 2000, 500), (3, 900, 1100)], "iid long, s long, e long"
        )
        .withColumn("s", F.timestamp_seconds("s"))
        .withColumn("e", F.timestamp_seconds("e"))
    )
    got = sorted(r["iid"] for r in bucketed_range_join(p, iv, "p_ts", "s", "e", 600).collect())
    assert got == [3]


def test_time_weighted_avg_matches_daily_expansion(spark):
    """twa == plain mean over the per-day expansion of the piecewise
    series clipped to the range (the O(range-span) brute force the
    operator avoids), on seeded random change-point tables."""
    import datetime
    import random as _random

    from pyspark.sql import functions as F

    from graph_spark.temporal.tprop import time_weighted_avg

    rng = _random.Random(99)
    base = datetime.date(1995, 1, 1)
    rows = []
    for ent in range(8):
        day = 0
        for _ in range(rng.randrange(1, 12)):
            rows.append((ent, str(base + datetime.timedelta(days=day)), round(rng.uniform(1, 100), 2)))
            day += rng.randrange(1, 400)
    df = spark.createDataFrame(rows, "entity_id long, ts string, value double").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    start, end = datetime.date(1995, 6, 1), datetime.date(1997, 6, 1)
    # brute force: value in effect for every day in [start, end)
    by_ent = {}
    for ent, ts, v in rows:
        by_ent.setdefault(ent, []).append((datetime.date.fromisoformat(ts), v))
    want = {}
    for ent, cps in by_ent.items():
        cps.sort()
        vals = []
        d = start
        while d < end:
            cur = None
            for cd, cv in cps:
                if cd <= d:
                    cur = cv
            if cur is not None:
                vals.append(cur)
            d += datetime.timedelta(days=1)
        if vals:
            want[ent] = sum(vals) / len(vals)
    got = {
        r["entity_id"]: r["twa"]
        for r in time_weighted_avg(
            df,
            F.lit(str(start)).cast("timestamp"),
            F.lit(str(end)).cast("timestamp"),
        ).collect()
    }
    assert got.keys() == want.keys()
    for ent in want:
        assert abs(got[ent] - want[ent]) < 1e-4, ent


def test_fuzzy_match_pairs_full_recall(spark):
    """Length-band blocked fuzzy matcher must find EXACTLY the pairs a
    brute-force pairwise levenshtein finds (recall == precision == 1)."""
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    from graph_spark.operators.dedup import fuzzy_match_pairs

    words = ["spark", "spork", "sparkle", "shark", "park", "graph",
             "graphs", "graf", "table", "cable", "stable", "sable", "x", "xy"]
    df = spark.createDataFrame([(w,) for w in words], ["name"])
    got = {(r["a"], r["b"]): r["dist"]
           for r in fuzzy_match_pairs(df, "name", max_distance=2).collect()}
    want = {}
    for a, b in itertools.combinations(sorted(words), 2):
        d = lev(a, b)
        if d <= 2:
            want[(a, b)] = d
    assert got == want


def test_pq_rerank_recall_vs_bruteforce(spark):
    """PQ ADC + exact re-rank recall: shortlist 150 must recover >=90%
    of exact L2 top-5 (measured 0.94 on this fixture at 10 probes —
    synthetic near-random vectors are PQ's worst case; the shortlist
    depth is the recall knob and is documented in SCALE.md)."""
    from pyspark.sql import Window

    from graph_spark.operators.similarity import pq_topk_rerank

    em = Catalog(spark, SF_SMOKE).table("embeddings")
    probes = em.filter(F.col("vec_id") < 20)
    a = probes.select(F.col("vec_id").alias("p"), F.col("embedding").alias("pv"))
    b = em.select(F.col("vec_id").alias("nb"), F.col("embedding").alias("bv"))
    d2 = F.aggregate(
        F.zip_with(
            "pv", "bv",
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("p").orderBy("d2", "nb")
    ex = (
        a.crossJoin(b)
        .filter(F.col("p") != F.col("nb"))
        .select("p", "nb", d2.alias("d2"))
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= 5)
    )
    exact = {}
    for r in ex.collect():
        exact.setdefault(r["p"], set()).add(r["nb"])
    approx = {}
    for r in pq_topk_rerank(em, probes, k=5, shortlist=150).collect():
        approx.setdefault(r["vec_id"], set()).add(r["nb"])
    hits = sum(len(exact[v] & approx.get(v, set())) for v in exact)
    total = sum(len(exact[v]) for v in exact)
    assert hits / total >= 0.9, f"recall {hits}/{total}"


def test_compress_ratio_orders_planted_payloads(spark):
    """zlib compressibility must rank planted payloads correctly:
    repetitive << natural-ish << random bytes; and be deterministic
    across invocations (fixed level, no timestamps in the stream)."""
    import os
    import random as _random

    from graph_spark.operators.multimodal import compress_ratio

    rng = _random.Random(7)
    rows = [
        (1, bytearray(b"ab" * 500)),                       # repetitive
        (2, bytearray(" ".join(f"w{rng.randrange(50)}" for _ in range(200)).encode())),
        (3, bytearray(bytes(rng.randrange(256) for _ in range(1000)))),  # random
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r["ratio"] for r in compress_ratio(df).collect()}
    assert out[1] < out[2] < out[3], out
    assert out[3] > 0.9 and out[1] < 0.1, out
    again = {r["doc_id"]: r["ratio"] for r in compress_ratio(df).collect()}
    assert out == again


def test_t85_dtw_matches_bruteforce_dp(spark):
    """t85's row-unrolled closed form (c(i,j) = D(j) + running-min of
    m(t) - D(t-1)) must equal the textbook O(n^2) cell-by-cell DTW
    recurrence — an INDEPENDENT implementation, so a shared
    misconception between the engine and its oracle can't hide."""
    import numpy as np
    from pyspark.sql import functions as F

    from graph_spark.catalog import Catalog
    from graph_spark.queries.qsuite import QUERIES

    from .conftest import SF_SMOKE

    t85 = next(q for q in QUERIES if q.name == "t85_dtw")
    got = {r.j: r.cost for r in t85.build(spark, SF_SMOKE).collect()}

    orders = Catalog(spark, SF_SMOKE).table("orders").filter(
        F.year("o_orderdate") == 1995
    )

    def series(pri):
        rows = dict(
            orders.filter(F.col("o_orderpriority") == pri)
            .groupBy(F.month("o_orderdate").alias("m"))
            .count()
            .collect()
        )
        return np.array([rows.get(m, 0) for m in range(1, 13)], dtype=np.int64)

    a, b = series("1-URGENT"), series("2-HIGH")
    n = 12
    c = np.full((n + 1, n + 1), np.iinfo(np.int64).max // 4, dtype=np.int64)
    c[0, 0] = 0
    for i in range(1, n + 1):
        for j in range(1, n + 1):
            c[i, j] = abs(a[i - 1] - b[j - 1]) + min(
                c[i - 1, j], c[i, j - 1], c[i - 1, j - 1]
            )
    want = {j: int(c[n, j]) for j in range(1, n + 1)}
    assert got == want


def test_t86_pettitt_matches_pairwise_definition(spark):
    """t86's rank-increment identity (dU_t = rank_desc - rank_asc) must
    equal the textbook pairwise U_t = sum_{i<=t<j} sgn(x_j - x_i) — an
    independent O(n^2) implementation over the same daily series."""
    import numpy as np
    from pyspark.sql import functions as F

    from graph_spark.catalog import Catalog
    from graph_spark.queries.qsuite import QUERIES

    from .conftest import SF_SMOKE

    t86 = next(q for q in QUERIES if q.name == "t86_pettitt")
    got = t86.build(spark, SF_SMOKE).collect()[0]

    d = (
        Catalog(spark, SF_SMOKE)
        .table("events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("x")
        )
        .orderBy("day")
        .collect()
    )
    days = [str(r.day) for r in d]
    x = np.array([r.x for r in d], dtype=np.int64)
    n = len(x)
    best = None
    for t in range(1, n):  # split after index t-1 (1-based t < n)
        u = int(np.sign(x[t:][None, :] - x[:t][:, None]).sum())
        key = (-abs(u), days[t - 1])
        if best is None or key < best[0]:
            best = (key, days[t - 1], u)
    assert (got.split_day, got.u_stat, got.abs_u, got.n_days) == (
        best[1],
        best[2],
        abs(best[2]),
        n,
    )


# ----------------------------------------------- basket cap (recsys, r5)


def _skewed_baskets(spark):
    """One viral basket (20 items), one normal (4), one singleton."""
    rows = (
        [("b0", f"i{k:03d}") for k in range(20)]
        + [("b1", f"i{k:03d}") for k in (0, 1, 2, 3)]
        + [("b2", "i000")]
    )
    return spark.createDataFrame(rows, ["src", "dst"])


def test_basket_cap_bounds_pair_contribution(spark):
    """With cap k every basket contributes at most C(k,2) pairs: the
    viral 20-item basket's 190 uncapped pairs collapse to 10."""
    from graph_spark.operators.recsys import item_item_cooccurrence

    e = _skewed_baskets(spark).filter(F.col("src") == "b0")
    un = item_item_cooccurrence(e, min_cooc=1)
    cap = item_item_cooccurrence(e, min_cooc=1, basket_cap=5)
    assert un.count() == 190  # C(20,2)
    assert cap.count() == 10  # C(5,2)


def test_basket_cap_output_subset_of_uncapped(spark):
    """Capped pairs ⊆ uncapped pairs with pointwise-smaller counts —
    the containment downstream ranking reasons about."""
    from graph_spark.operators.recsys import item_item_cooccurrence

    e = _skewed_baskets(spark)
    un = {(r.s1, r.s2): r.cooc for r in item_item_cooccurrence(e, min_cooc=1).collect()}
    cap = {
        (r.s1, r.s2): r.cooc
        for r in item_item_cooccurrence(e, min_cooc=1, basket_cap=3).collect()
    }
    assert set(cap) <= set(un)
    assert all(cap[k] <= un[k] for k in cap)


def test_basket_cap_is_partition_invariant(spark):
    """The md5-ordered cap selection must not depend on the shuffle
    layout (the 1000-executor knob)."""
    from graph_spark.operators.recsys import item_item_cooccurrence

    e = _skewed_baskets(spark)

    def rows():
        return sorted(
            tuple(r)
            for r in item_item_cooccurrence(e, min_cooc=1, basket_cap=4).collect()
        )

    base = rows()
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        alt = rows()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == alt


def test_basket_cap_validates(spark):
    from graph_spark.operators.recsys import basket_cap_items

    with pytest.raises(ValueError, match=">= 1"):
        basket_cap_items(_skewed_baskets(spark), "src", "dst", 0)


def test_t88_dtw_band_matches_bruteforce_dp(spark):
    """t88's banded row-unrolled form must equal the textbook DTW
    recurrence restricted to the |i-j| <= 3 band (out-of-band cells
    infinite) — an independent cell-by-cell implementation, so a band-
    edge mistake shared between engine and oracle can't hide (the lag
    pitfall: at the band's trailing edge only the diagonal predecessor
    exists)."""
    import numpy as np
    from pyspark.sql import functions as F

    from graph_spark.catalog import Catalog
    from graph_spark.queries.qsuite import QUERIES

    from .conftest import SF_SMOKE

    t88 = next(q for q in QUERIES if q.name == "t88_dtw_band")
    got = {r.j: r.cost for r in t88.build(spark, SF_SMOKE).collect()}

    ev = Catalog(spark, SF_SMOKE).table("events")

    def series(et):
        rows = dict(
            ev.filter(F.col("event_type") == et)
            .groupBy(F.dayofmonth("ts").alias("m"))
            .count()
            .collect()
        )
        return np.array([rows.get(m, 0) for m in range(1, 31)], dtype=np.int64)

    a, b = series("click"), series("view")
    n, w = 30, 3
    inf = np.iinfo(np.int64).max // 4
    c = np.full((n + 1, n + 1), inf, dtype=np.int64)
    c[0, 0] = 0
    for i in range(1, n + 1):
        for j in range(1, n + 1):
            if abs(i - j) > w:
                continue
            c[i, j] = abs(a[i - 1] - b[j - 1]) + min(
                c[i - 1, j], c[i, j - 1], c[i - 1, j - 1]
            )
    want = {j: int(c[n, j]) for j in range(1, n + 1) if abs(n - j) <= w}
    assert got == want


# ------------------------------------------------- n-gram span dedup


def test_ngram_span_pairs_planted_span(spark):
    """A 7-token verbatim span shared by two docs = a 3-gram run of
    5-grams => max_run_tokens 7; short docs (<5 tokens) emit no grams
    and must not throw (the descending-sequence slice hazard)."""
    from graph_spark.operators.dedup import ngram_span_pairs

    span = "the quick brown fox jumps over fences"
    docs = spark.createDataFrame(
        [
            (1, "u1a u1b u1c " + span + " u1d u1e"),
            (2, "u2a " + span + " u2b u2c u2d u2e"),
            (3, "tiny doc"),          # 2 tokens: no 5-gram, no error
            (4, "one two three four"),  # 4 tokens: same
        ],
        "doc_id long, text string",
    )
    rows = ngram_span_pairs(docs, n=5).collect()
    assert [(r.doc_a, r.doc_b, r.shared_grams, r.max_run_tokens) for r in rows] == [
        (1, 2, 3, 7)
    ]


def test_ngram_span_pairs_stop_gram_cap(spark):
    """A gram in more docs than max_gram_freq is dropped BEFORE the
    join; pair-specific grams survive."""
    from graph_spark.operators.dedup import ngram_span_pairs

    boiler = "w1 w2 w3 w4 w5"
    docs = spark.createDataFrame(
        [(i, boiler + f" u{i}a u{i}b") for i in range(6)]
        + [(10, "p q r s t uu"), (11, "p q r s t vv")],
        "doc_id long, text string",
    )
    uncapped = ngram_span_pairs(docs, n=5).collect()
    capped = ngram_span_pairs(docs, n=5, max_gram_freq=2).collect()
    # uncapped: C(6,2)=15 boilerplate pairs + the planted (10, 11)
    assert len(uncapped) == 16
    assert [(r.doc_a, r.doc_b) for r in capped] == [(10, 11)]
    # capped output is a subset of uncapped
    ukeys = {(r.doc_a, r.doc_b, r.shared_grams, r.max_run_tokens) for r in uncapped}
    assert all(
        (r.doc_a, r.doc_b, r.shared_grams, r.max_run_tokens) in ukeys for r in capped
    )


# ------------------------------------------------- JL random projection


def test_random_projection_matches_sign_matrix(spark):
    """Each projected component equals the hand-computed signed sum,
    and the quantized mode yields exact integers."""
    from graph_spark.operators.similarity import jl_sign_matrix, random_projection

    vec = [0.5, -1.25, 2.0, 0.125]
    df = spark.createDataFrame([(1, vec)], "vec_id long, embedding array<double>")
    signs = jl_sign_matrix(dim=4, out_dim=3)
    got = random_projection(df, dim=4, out_dim=3).collect()[0].proj
    exp = [sum(s * x for s, x in zip(row, vec)) for row in signs]
    assert got == pytest.approx(exp)
    gotq = random_projection(df, dim=4, out_dim=3, quantize=1000).collect()[0].proj
    import math

    xq = [math.floor(x * 1000 + 0.5) for x in vec]
    expq = [sum(s * x for s, x in zip(row, xq)) for row in signs]
    assert list(gotq) == expq


def test_random_projection_preserves_distance_in_expectation(spark):
    """For ±1 signs E||ya-yb||^2 = out_dim * ||xa-xb||^2; with
    out_dim=32 the measured ratio concentrates near 1."""
    from graph_spark.operators.similarity import random_projection

    n, dim, k = 40, 24, 32
    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {dim - 1}), "
            "d -> (pmod(xxhash64(id, d), 2001) - 1000) / 1000.0)"
        ).alias("embedding"),
    )
    pr = random_projection(df, dim=dim, out_dim=k)
    a = pr.filter(F.col("vec_id") % 2 == 0).select(
        (F.col("vec_id") + 1).alias("vec_id"),
        F.col("embedding").alias("ea"),
        F.col("proj").alias("pa"),
    )
    b = pr.filter(F.col("vec_id") % 2 == 1)
    sq = (
        lambda u, v: F.aggregate(  # noqa: E731
            F.zip_with(F.col(u), F.col(v), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
    )
    rows = (
        a.join(b, "vec_id")
        .select(
            (sq("pa", "proj") / (F.lit(k) * sq("ea", "embedding"))).alias("ratio")
        )
        .collect()
    )
    ratios = [r.ratio for r in rows]
    assert len(ratios) == 20
    avg = sum(ratios) / len(ratios)
    assert 0.6 < avg < 1.4
    assert all(0.1 < r < 3.5 for r in ratios)


def test_l123_rouge_lcs_matches_bruteforce_dp(spark):
    """The 12-stage window-chain LCS (row-collapse idiom) must equal
    the textbook O(n*m) python DP on the same truncated token lists."""
    from graph_spark.queries.registry import by_name

    from .conftest import SF_SMOKE

    got = {
        r.da: r.lcs
        for r in by_name()["l123_rouge_l"].build(spark, SF_SMOKE).collect()
    }
    from graph_spark.catalog import Catalog

    docs = {
        r.doc_id: [w for w in r.text.lower().split(" ") if w]
        for r in Catalog(spark, SF_SMOKE)
        .table("documents")
        .filter("doc_id < 20")
        .select("doc_id", "text")
        .collect()
    }

    def lcs(a, b):
        prev = [0] * (len(b) + 1)
        for i in range(1, len(a) + 1):
            cur = [0] * (len(b) + 1)
            for j in range(1, len(b) + 1):
                cur[j] = max(
                    prev[j], cur[j - 1], prev[j - 1] + (a[i - 1] == b[j - 1])
                )
            prev = cur
        return prev[len(b)]

    for da in range(0, 20, 2):
        want = lcs(docs[da][:12], docs[da + 1][:24])
        assert got[da] == want, (da, got[da], want)
